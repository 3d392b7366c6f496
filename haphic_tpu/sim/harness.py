"""Simulation/evaluation harness tools — functional equivalents of the
reference's `simulation/` scripts (SURVEY.md §2 #34, §4). Exposed via
``haphic sim <cmd>``; each maps to one reference script (named in the
docstring). These are host-side text/format tools; the compute-heavy
evaluation (weighted LIS etc.) lives in sim/evaluate.py.
"""

from __future__ import annotations

import collections
import os
import random
import sys
from typing import Dict, Iterable, List, Optional, Sequence, TextIO, Tuple

from haphic_tpu.io.fasta import iter_fasta, revcomp


# ---------------------------------------------------------------------------
# Competitor adapters (simulation/convert_*.py)

def _write_tour(prefix: str, ordering: Sequence[str]) -> str:
    path = '{}.tour'.format(prefix)
    with open(path, 'w') as f:
        f.write('>INIT\n')
        f.write('{}\n'.format(' '.join(ordering)))
    return path


def convert_agp_to_tour(agp: str, prefix: str) -> str:
    """YaHS/SALSA2 AGP → .tour (simulation/convert_agp_to_tour.py)."""
    ordering = []
    with open(agp) as f:
        for line in f:
            if line.startswith('#') or not line.strip():
                continue
            cols = line.split()
            if cols[4] == 'W':
                ordering.append(cols[5] + cols[8])
    return _write_tour(prefix, ordering)


def convert_assembly_to_tour(assembly: str, prefix: str) -> str:
    """3D-DNA .assembly → .tour (simulation/convert_assembly_to_tour.py)."""
    name_of = {}
    ordering = []
    with open(assembly) as f:
        for line in f:
            cols = line.split()
            if line.startswith('>'):
                name_of[cols[1]] = cols[0][1:]
            else:
                for tok in cols:
                    if tok.startswith('-'):
                        ordering.append(name_of[tok[1:]] + '-')
                    else:
                        ordering.append(name_of[tok] + '+')
    return _write_tour(prefix, ordering)


def convert_agp_to_groups(agp: str, outdir: str = '.') -> List[str]:
    """YaHS/SALSA AGP → per-scaffold group files with contigs renamed
    `<ctg>_seg<N>` per appearance (simulation/convert_agp_to_groups.py).
    Groups with <2 contigs are skipped."""
    groups: 'collections.OrderedDict[str, List[Tuple[str, int]]]' = \
        collections.OrderedDict()
    seg_count: Dict[str, int] = collections.defaultdict(int)
    with open(agp) as f:
        for line in f:
            if not line.strip():
                continue
            cols = line.split()
            if cols[4] != 'W':
                continue
            seg_count[cols[5]] += 1
            seg = '{}_seg{}'.format(cols[5], seg_count[cols[5]])
            groups.setdefault(cols[0], []).append(
                (seg, int(cols[7]) - int(cols[6]) + 1))
    written = []
    n = 0
    for segs in groups.values():
        if len(segs) < 2:
            continue
        n += 1
        path = os.path.join(outdir, 'group{}.txt'.format(n))
        with open(path, 'w') as fo:
            for seg, length in segs:
                fo.write('{}\tNA\t{}\n'.format(seg, length))
        written.append(path)
    return written


def convert_assembly_to_groups(assembly: str, outdir: str = '.'
                               ) -> List[str]:
    """3D-DNA final .assembly → group files; only fragments whose name
    starts with 'Chr' are indexed, groups with <2 members skipped
    (simulation/convert_assembly_to_groups.py)."""
    frag_of: Dict[str, Tuple[str, int]] = {}
    written = []
    n = 0
    with open(assembly) as f:
        for line in f:
            if not line.strip():
                continue
            cols = line.split()
            if line.startswith('>Chr'):
                frag_of[cols[1]] = (cols[0][1:], int(cols[2]))
            elif not line.startswith('>'):
                if len(cols) < 2:
                    continue
                n += 1
                path = os.path.join(outdir, 'group{}.txt'.format(n))
                with open(path, 'w') as fo:
                    for tok in cols:
                        num = tok.strip('-')
                        if num in frag_of:
                            frag, length = frag_of[num]
                            fo.write('{}\tNA\t{}\n'.format(frag, length))
                written.append(path)
    return written


def convert_lachesis_result_to_groups(clusters: str, fasta: str,
                                      outdir: str = '.') -> List[str]:
    """LACHESIS clusters.by_name.txt (one group per line, contig names
    space-separated) → HapHiC-style group files with lengths from the
    FASTA; <2-contig lines skipped
    (simulation/convert_lachesis_result_to_groups.py)."""
    lengths = {name: len(seq) for name, seq in iter_fasta(fasta)}
    written = []
    n = 0
    with open(clusters) as f:
        for line in f:
            if not line.strip() or line.startswith('#'):
                continue
            ctgs = line.split()
            if len(ctgs) < 2:
                continue
            n += 1
            path = os.path.join(outdir, 'group{}.txt'.format(n))
            with open(path, 'w') as fo:
                for ctg in ctgs:
                    fo.write('{}\tNA\t{}\n'.format(ctg, lengths[ctg]))
            written.append(path)
    return written


def convert_lachesis_ordering_to_tour(fasta: str, prefix: str,
                                      ordering_files: Sequence[str]
                                      ) -> Optional[str]:
    """LACHESIS group*.ordering files (cols: index, contig, orient 0/1)
    → one concatenated .tour restricted to contigs present in the FASTA;
    files sorted by group number; nothing written for <2 entries
    (simulation/convert_lachesis_ordering_to_tour.py)."""
    known = {name for name, _seq in iter_fasta(fasta)}
    ordering = []
    for path in sorted(
            ordering_files,
            key=lambda x: int(os.path.basename(x).split('.')[0]
                              .replace('group', ''))):
        with open(path) as f:
            for line in f:
                if not line.strip() or line.startswith('#'):
                    continue
                cols = line.split()
                if cols[1] in known:
                    ordering.append(
                        cols[1] + ('+' if cols[2] == '0' else '-'))
    if len(ordering) > 1:
        return _write_tour(prefix, ordering)
    return None


# ---------------------------------------------------------------------------
# Group-file and score statistics

def sim_group_files(fasta: str, outdir: str = '.') -> List[str]:
    """One group file per `<group>_...` name prefix, contigs sorted by
    descending length, GATC RE counts (simulation/sim_group_files.py)."""
    per_group: 'collections.OrderedDict[str, List[Tuple[str, int, int]]]' \
        = collections.OrderedDict()
    for name, seq in iter_fasta(fasta):
        seq = seq.upper()
        per_group.setdefault(name.split('_')[0], []).append(
            (name, seq.count('GATC'), len(seq)))
    written = []
    for group, rows in per_group.items():
        path = os.path.join(outdir, 'group_{}.txt'.format(group))
        with open(path, 'w') as fo:
            fo.write('#Contig\tRECounts\tLength\n')
            for name, re_sites, length in sorted(rows, key=lambda r: r[2],
                                                 reverse=True):
                fo.write('{}\t{}\t{}\n'.format(name, re_sites, length))
        written.append(path)
    return written


def score_statistics(tour: str, chrom: str, n50: str, program: str,
                     each_iteration: bool = False,
                     out: TextIO = sys.stdout,
                     err: TextIO = sys.stderr) -> None:
    """GA score per >GA checkpoint of a .tour file
    (simulation/score_statistics.py; checkpoints every 500 gens)."""
    start_score = ''
    score = ''
    ngen = 0
    with open(tour) as f:
        for line in f:
            if line.startswith('>GA') and not line.startswith('>GA2-0'):
                score = line.strip().split('-')[-1]
                if not start_score:
                    start_score = score
                if each_iteration:
                    err.write('{}\t{}\t{}\t{}\t{}\n'.format(
                        program, chrom, n50, ngen, score))
                ngen += 500
    out.write('{}\t{}\t{}\t{}\n'.format(program, chrom, n50, score))
    if program == 'HapHiC':
        out.write('{}_presort\t{}\t{}\t{}\n'.format(program, chrom, n50,
                                                    start_score))


def result_statistics(fasta: str, groups: Sequence[str],
                      excluded_chrs: Iterable[str] = ('Chr4', 'Chr8'),
                      out: TextIO = sys.stdout,
                      err: TextIO = sys.stderr) -> Dict[str, float]:
    """Anchoring/contamination metrics over truth-encoded group files
    (simulation/result_statistics.py). Contig ids are
    `<Chr>_<hap>_...`; 'collapsed'/'chimeric' contigs are skipped and
    `excluded_chrs` replicates the paper's Chr4/Chr8 exclusion."""
    excluded = set(excluded_chrs)
    total_len = 0
    for name, seq in iter_fasta(fasta):
        if 'collapsed' in name or 'chimeric' in name:
            continue
        total_len += len(seq)

    anchored_len: Dict[str, int] = collections.defaultdict(int)
    largest: Dict[str, int] = collections.defaultdict(int)
    homo_err = nonhomo_err = 0
    ex_anchored = ex_homo = ex_nonhomo = 0
    for group in groups:
        rows = []
        with open(group) as f:
            for line in f:
                if line.strip() and not line.startswith('#'):
                    rows.append(line)
        if len(rows) < 2:
            err.write('group file {} is skipped because of {} contig '
                      'inside\n'.format(group, len(rows)))
            continue
        per_chr: Dict[str, int] = collections.defaultdict(int)
        ex_group_len = 0
        for line in rows:
            if 'collapsed' in line or 'chimeric' in line:
                continue
            cols = line.split()
            source = '_'.join(cols[0].split('_')[:2])
            length = int(cols[2])
            per_chr[source] += length
            anchored_len[source] += length
            if source.split('_')[0] not in excluded:
                ex_group_len += length
        if not per_chr:
            continue
        ranked = sorted(per_chr.items(), key=lambda x: x[1])
        dominant = ranked[-1][0]
        for source, length in ranked:
            largest[source] = max(largest[source], length)
            if source != dominant:
                if source.split('_')[0] == dominant.split('_')[0]:
                    homo_err += length
                else:
                    nonhomo_err += length
        if dominant.split('_')[0] in excluded:
            continue
        ex_anchored += ex_group_len
        for source, length in ranked:
            if source.split('_')[0] in excluded or source == dominant:
                continue
            if source.split('_')[0] == dominant.split('_')[0]:
                ex_homo += length
            else:
                ex_nonhomo += length

    anchored = sum(anchored_len.values())
    contiguity = sum(largest[c] / anchored_len[c] for c in largest) / \
        len(anchored_len)
    ex_chrs = [c for c in anchored_len if c.split('_')[0] not in excluded]
    ex_contiguity = sum(largest[c] / anchored_len[c] for c in largest
                        if c.split('_')[0] not in excluded) / len(ex_chrs)
    stats = {
        'Contiguity': contiguity,
        'Inter_homo_error_rate': homo_err / anchored * 100,
        'Inter_nonhomo_error_rate': nonhomo_err / anchored * 100,
        'Chr4_8_excluded_contiguity': ex_contiguity,
        'Chr4_8_excluded_inter_homo_error_rate':
            ex_homo / ex_anchored * 100 if ex_anchored else 0.0,
        'Chr4_8_excluded_inter_nonhomo_error_rate':
            ex_nonhomo / ex_anchored * 100 if ex_anchored else 0.0,
        'Ngroups': len(groups),
        'Anchoring rate': anchored / total_len * 100,
    }
    for key, val in stats.items():
        if 'rate' in key.lower():
            out.write('{}\t{}%\n'.format(key, val))
        else:
            out.write('{}\t{}\n'.format(key, val))
    return stats


def link_statistics(fasta: str, bam: str, tag: str, outdir: str = '.'
                    ) -> str:
    """Per-contig intra-chrom / inter-homolog / inter-nonhomolog Hi-C
    link composition from inter-contig read1 records
    (simulation/link_statistics.py; truth-encoded `<Chr>_<hap>_...`
    contig ids). Uses the built-in BAM reader instead of pysam."""
    from haphic_tpu.io.bam import _PyBam
    counts: Dict[str, List[int]] = {}
    for name, _seq in iter_fasta(fasta):
        counts[name] = [0, 0, 0]
    reader = _PyBam(bam)
    names = reader.ref_names
    for chunk in reader.records(1 << 16):
        ref, _pos, mref, _mpos, flag, _mapq = chunk
        for r, mr, fl in zip(ref.tolist(), mref.tolist(), flag.tolist()):
            if not fl & 0x40 or r == mr or r < 0 or mr < 0:
                continue
            a, b = names[r], names[mr]
            pa, pb = a.split('_'), b.split('_')
            if pa[0] == pb[0]:
                idx = 1 if pa[1] != pb[1] else 0
            else:
                idx = 2
            counts[a][idx] += 1
            counts[b][idx] += 1
    path = os.path.join(outdir, '{}_HiC_links.txt'.format(tag))
    with open(path, 'w') as fo:
        for ctg, c in counts.items():
            fo.write('{}\t{}\t{}\t{}\t{}\t{}\n'.format(
                ctg, c[0], c[1], c[2], sum(c), tag))
    return path


# ---------------------------------------------------------------------------
# FASTA / input manipulation

def shuffle_fasta(fasta: str, seed: int = 12345, offset: int = 0,
                  outdir: str = '.') -> str:
    """Shuffle record order, byte-preserving sequence lines
    (simulation/shuffle_fasta.py; seeded with seed+offset)."""
    order: List[str] = []
    chunks: Dict[str, List[str]] = {}
    with open(fasta) as f:
        cur = None
        for line in f:
            if not line.strip():
                continue
            if line.startswith('>'):
                cur = line.split()[0][1:]
                order.append(cur)
                chunks[cur] = []
            else:
                chunks[cur].append(line)
    rng = random.Random()
    rng.seed(seed + offset)
    rng.shuffle(order)
    out = os.path.join(outdir, 'shuffled_' + os.path.basename(fasta))
    with open(out, 'w') as fo:
        for name in order:
            fo.write('>{}\n'.format(name))
            fo.writelines(chunks[name])
    return out


def split_fasta(fasta: str, bin_size: Optional[int] = None,
                seed: int = 12345, out: TextIO = sys.stdout) -> None:
    """Split sequences at N runs into `<ID>_ctg<N>[_bin<M>]` pieces and
    reverse-complement a seeded Bernoulli(0.5) subset, appending `_+`or
    `_-` to the id (simulation/split_fasta.py — same scipy RNG so the
    orientation assignment is reproducible)."""
    import scipy.stats

    pieces: List[Tuple[str, str, int]] = []
    for name, seq in iter_fasta(fasta):
        seq = seq.replace('n', 'N')
        n = 0
        for ctg in seq.split('N'):
            if not ctg:
                continue
            n += 1
            if bin_size:
                size = bin_size * 1000
                for m in range(len(ctg) // size + 1):
                    sub = ctg[m * size:(m + 1) * size]
                    pieces.append(('{}_ctg{}_bin{}'.format(name, n, m + 1),
                                   sub, len(sub)))
            else:
                pieces.append(('{}_ctg{}'.format(name, n), ctg, len(ctg)))

    flips = scipy.stats.bernoulli.rvs(0.5, size=len(pieces),
                                      random_state=seed).tolist()
    for flip, (name, seq, length) in zip(flips, pieces):
        if flip:
            name += '_-'
            seq = revcomp(seq)
        else:
            name += '_+'
        out.write('>{}\n'.format(name))
        for x in range(length // 60 + 1):
            out.write(seq[x * 60:(x + 1) * 60] + '\n')


def sample_mnd(mnd: str, npairs: int, proportion: float,
               seed: int = 12345, out: TextIO = sys.stdout) -> int:
    """Seeded subsample of a merged_nodups.txt by line number
    (simulation/sample_mnd.py — same stdlib RNG for identical picks)."""
    rng = random.Random()
    rng.seed(seed)
    picked = set(rng.sample(range(npairs), int(npairs * proportion)))
    kept = 0
    with open(mnd) as f:
        for n, line in enumerate(f):
            if n in picked:
                out.write(line)
                kept += 1
    return kept


def sort_agp(agp: str, chr_ordering: Sequence[str],
             out: TextIO = sys.stdout) -> None:
    """Reorder AGP groups by their dominant source chromosome (top-10
    longest truth-encoded contigs vote), appending unmatched groups
    (simulation/sort_agp.py)."""
    group_ctgs: Dict[str, List[Tuple[str, int]]] = collections.defaultdict(
        list)
    group_lines: 'collections.OrderedDict[str, List[str]]' = \
        collections.OrderedDict()
    chrs = set(chr_ordering)
    with open(agp) as f:
        for line in f:
            if not line.strip():
                continue
            cols = line.split()
            group_lines.setdefault(cols[0], []).append(line)
            if cols[4] != 'W':
                continue
            source = cols[5].rsplit('_', 2)[0]
            if source in chrs:
                group_ctgs[cols[0]].append((cols[5], int(cols[7])))

    chr_to_groups: Dict[str, List[str]] = collections.defaultdict(list)
    for group, ctgs in group_ctgs.items():
        ranked = sorted(ctgs, key=lambda x: x[1], reverse=True)
        if len(ranked) < 10:
            continue
        votes: Dict[str, int] = collections.defaultdict(int)
        for ctg, length in ranked[:10]:
            votes[ctg.rsplit('_', 2)[0]] += length
        best = sorted(votes.items(), key=lambda x: x[1], reverse=True)[0][0]
        chr_to_groups[best].append(group)

    emitted = set()
    for chrom in chr_ordering:
        for group in chr_to_groups[chrom]:
            emitted.add(group)
            out.writelines(group_lines[group])
    for group, lines in group_lines.items():
        if group not in emitted:
            out.writelines(lines)
