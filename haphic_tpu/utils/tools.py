"""Aux utilities — functional equivalents of the reference's utils/
scripts (SURVEY.md §2 #33). Each is exposed both as a function and via
``haphic-tpu util <name>``.

Covered (reference file in parentheses):
  mock_agp        (utils/mock_agp_file.py)       FASTA → trivial AGP
  groups_to_clusters (utils/groups_to_clusters.py)
  combine_groups  (utils/combine_groups.py)
  convert_gfa_ids (utils/convert_gfa_ids.py)     GFA ids → post-curation
  gfa_depth_to_bedgraph (utils/gfa_depth_to_bedGraph.py)
  find_telomeres  (utils/find_telomeres.py)
  fasta_count_N   (utils/fasta_count_N.py)
  fastq_length_filtering (utils/fastq_length_filtering.py)
  reverse_bed     (utils/reverse_bed.py)
  split_clm       (simulation/split_clm.py — also assign.split_clm_file)
"""

from __future__ import annotations

import collections
import gzip
import re
import sys
from typing import Dict, Iterable, List, Optional, Sequence, TextIO

from haphic_tpu.io.fasta import iter_fasta, revcomp


def mock_agp(fasta: str, out: TextIO = sys.stdout) -> None:
    """FASTA → one-line-per-contig AGP (for `haphic plot` on contigs)."""
    for name, seq in iter_fasta(fasta):
        L = len(seq)
        out.write('{0}\t1\t{1}\t1\tW\t{0}\t1\t{1}\t+\n'.format(name, L))


def groups_to_clusters(group_files: Sequence[str],
                       out: TextIO = sys.stdout) -> None:
    out.write('#Group\tnContigs\tContigs\n')
    for n, path in enumerate(group_files, 1):
        ctgs = []
        with open(path) as f:
            for line in f:
                if line.strip() and not line.startswith('#'):
                    ctgs.append(line.split()[0])
        out.write('group{}\t{}\t{}\n'.format(n, len(ctgs), ' '.join(ctgs)))


def combine_groups(list_file: str, out: TextIO = sys.stdout) -> None:
    """Group files listed in ``list_file`` → one clusters.txt, group
    name = file basename before the first dot."""
    group_dict: Dict[str, List[str]] = collections.defaultdict(list)
    with open(list_file) as f:
        for line in f:
            gf = line.strip()
            if not gf:
                continue
            with open(gf) as fin:
                for l in fin:
                    if l.strip() and not l.startswith('#'):
                        group_dict[gf.split('.')[0]].append(l.split()[0])
    out.write('#Group\tnContigs\tContigs\n')
    for g, ctgs in group_dict.items():
        out.write('{}\t{}\t{}\n'.format(g, len(ctgs), ' '.join(ctgs)))


def convert_gfa_ids(gfa: str, liftover_agp: str,
                    out: TextIO = sys.stdout) -> None:
    """Rename GFA segment ids using a liftover AGP (post-curation):
    contigs split into several fragments get '_'-joined new ids."""
    id_map: Dict[str, List] = collections.defaultdict(list)
    with open(liftover_agp) as f:
        for line in f:
            if line.startswith('#') or not line.strip():
                continue
            cols = line.split()
            if cols[4] == 'W':
                id_map[cols[5]].append((cols[0], int(cols[6])))

    def new_id(old: str) -> str:
        assert old in id_map, old
        frags = sorted(id_map[old], key=lambda x: x[1])
        return '_'.join(c for c, _ in frags) if len(frags) > 1 \
            else frags[0][0]

    opener = gzip.open if gfa.endswith('.gz') else open
    with opener(gfa, 'rt') as f:
        for line in f:
            if not line.strip():
                continue
            cols = line.rstrip('\n').split('\t')
            if cols[0] == 'S':
                cols[1] = new_id(cols[1])
            elif cols[0] == 'L' and len(cols) >= 4:
                cols[1] = new_id(cols[1])
                cols[3] = new_id(cols[3])
            elif cols[0] == 'A' and len(cols) >= 2:
                cols[1] = new_id(cols[1])
            out.write('\t'.join(cols) + '\n')


def gfa_depth_to_bedgraph(gfas: Sequence[str], agp: str,
                          depth_tag: str = 'rd', scale: float = 1.0,
                          out: TextIO = sys.stdout) -> None:
    """Per-contig GFA read depth → bedGraph over scaffold coordinates."""
    pat = re.compile(r'.+{}:[if]:([\d.]+)'.format(depth_tag))
    depth: Dict[str, int] = {}
    for gfa in gfas:
        opener = gzip.open if gfa.endswith('.gz') else open
        with opener(gfa, 'rt') as f:
            for line in f:
                if not line.startswith('S\t'):
                    continue
                seg = line.split()[1]
                m = pat.match(line)
                if not m:
                    raise RuntimeError(
                        'Cannot find the read depth for segment '
                        '{}'.format(seg))
                depth[seg] = int(float(m.groups()[0])) + 1
    with open(agp) as f:
        for line in f:
            if line.startswith('#') or not line.strip():
                continue
            cols = line.split()
            if cols[4] != 'W':
                continue
            d = depth.get(cols[5].rsplit(':', 1)[0], depth.get(cols[5]))
            if d is None:
                continue
            out.write('{}\t{}\t{}\t{}\n'.format(
                cols[0], int(cols[1]) - 1, cols[2], d * scale))


def find_telomeres(genome: str, repeat: str = 'CCCTAAA',
                   contigs: Optional[Sequence[str]] = None,
                   out: TextIO = sys.stdout) -> None:
    """Tandem-telomere-repeat scan (parity: utils/find_telomeres.py)."""
    fwd2 = repeat * 2
    rev2 = revcomp(repeat) * 2
    rev2_rev = rev2[::-1]
    out.write('Seq_ID\tSeq_len\tNumber_of_{0}/{1}\tNumber_of_{0}/{1}'
              '_per_Mb\tLeftmost_{0}_pos\tRightmost_{1}_pos\t'
              'Leftmost_relative_pos\tRightmost_relative_pos\n'
              .format(fwd2, rev2))
    wanted = set(contigs) if contigs else None
    for name, seq in iter_fasta(genome):
        if wanted is not None and name not in wanted:
            continue
        seq = seq.upper()
        L = len(seq)
        n = seq.count(fwd2) + seq.count(rev2)
        if fwd2 in seq:
            sp = seq.index(fwd2) + 1
            rsp = '{:.4f}'.format(sp / L)
        else:
            sp, rsp = 'NA', 'NA'
        if rev2 in seq:
            ep = L - (seq[::-1].index(rev2_rev) + 1)
            rep = '{:.4f}'.format(ep / L)
        else:
            ep, rep = 'NA', 'NA'
        out.write('{}\t{}\t{}\t{:.4f}\t{}\t{}\t{}\t{}\n'.format(
            name, L, n, n / L * 1e6, sp, ep, rsp, rep))


def fasta_count_N(fasta: str, out: TextIO = sys.stdout) -> int:
    """Count N-runs; returns the total number of Ns."""
    count: Dict[str, int] = collections.defaultdict(int)
    with open(fasta) as f:
        for line in f:
            s = line.strip()
            if s and not line.startswith('>'):
                for ns in re.findall(r'N+', s):
                    count[ns] += 1
    total = sum(len(ns) * num for ns, num in count.items())
    out.write('{}\n'.format(dict(count)))
    out.write('total_Ns: {}\n'.format(total))
    return total


def fastq_length_filtering(out_fq: str, in_fqs: Sequence[str],
                           length: int = 50000) -> int:
    """Keep reads >= length; gzipped in/out. Returns #kept."""
    kept = 0
    with gzip.open(out_fq, 'wb') as fout:
        for in_fq in in_fqs:
            opener = gzip.open if in_fq.endswith('.gz') else \
                (lambda p, m: open(p, 'rb'))
            with opener(in_fq, 'rb') as f:
                while True:
                    l1 = f.readline()
                    if not l1:
                        break
                    l2 = f.readline()
                    l3 = f.readline()
                    l4 = f.readline()
                    if len(l2.rstrip()) >= length:
                        fout.write(l1 + l2 + l3 + l4)
                        kept += 1
    return kept


def reverse_bed(bed: str, genome: str, out: TextIO = sys.stdout) -> None:
    """Mirror BED intervals (and strands) for reverse-complemented
    sequences (parity: utils/reverse_bed.py)."""
    lens: Dict[str, int] = {n: len(s) for n, s in iter_fasta(genome)}

    def flip(sym: str) -> str:
        return {'+': '-', '-': '+', '.': '.'}[sym]

    with open(bed) as f:
        for line in f:
            if not line.strip():
                continue
            cols = line.rstrip('\n').split('\t')
            L = lens[cols[0]]
            start, end = int(cols[1]), int(cols[2])
            cols[1], cols[2] = str(L - end), str(L - start)
            if len(cols) >= 6 and cols[5] in '+-.':
                cols[5] = flip(cols[5])
            out.write('\t'.join(cols) + '\n')
