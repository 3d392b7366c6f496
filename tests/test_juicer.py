"""Juicebox round-trip tests: pre → (simulated review) → post."""

import random

import numpy as np
import pytest

from haphic_tpu.io.fasta import iter_fasta, read_fasta, revcomp
from haphic_tpu.post.juicer import (AssemblySpace, juicer_post, juicer_pre,
                                    parse_review_assembly,
                                    write_assembly_files)
from haphic_tpu.post.plot import parse_agp

from . import util


@pytest.fixture()
def scaffolded(tmp_path):
    rng = random.Random(7)
    ctgs = util.random_genome(rng, n_ctg=6, min_len=2000, max_len=6000)
    fa = tmp_path / 'ctgs.fa'
    util.write_genome(str(fa), ctgs)
    names = list(ctgs)
    from haphic_tpu.build.scaffolds import build_final_scaffolds
    asm = read_fasta(str(fa))
    tours = {'g1': [(names[0], '+'), (names[1], '-')],
             'g2': [(names[2], '+'), (names[3], '+')]}
    fa_out, agp, raw = build_final_scaffolds(
        tours, asm, corrected_ctgs=set(), outdir=str(tmp_path))
    # pairs hitting known positions
    recs = []
    for k in range(500):
        a, b = rng.choice(names[:4]), rng.choice(names[:4])
        recs.append(('r{}'.format(k), a,
                     rng.randrange(1, len(ctgs[a]) + 1), b,
                     rng.randrange(1, len(ctgs[b]) + 1)))
    pairs = tmp_path / 'hic.pairs'
    util.write_pairs(str(pairs), recs)
    return tmp_path, str(fa), ctgs, names, raw, str(pairs), tours


def test_pre_outputs(scaffolded, caplog):
    tmp, fa, ctgs, names, raw_agp, pairs, tours = scaffolded
    import logging
    with caplog.at_level(logging.INFO):
        txt = juicer_pre(raw_agp, pairs, outdir=str(tmp))
    agp = parse_agp(raw_agp)
    space = AssemblySpace(agp)
    assert any('PRE_C_SIZE: assembly {}'.format(space.total) in m
               for m in caplog.messages)
    lines = open(txt).read().splitlines()
    assert lines
    for line in lines[:50]:
        cols = line.split()
        assert cols[1] == cols[5] == 'assembly'
        assert 1 <= int(cols[2]) <= int(cols[6]) <= space.total
    # .assembly lists every AGP contig once (incl. unanchored objects)
    frags, tours_out = parse_review_assembly(
        str(tmp / 'out_JBAT.assembly'))
    agp_ctgs = set(agp.ctg_names)
    assert {n for n, _ in frags} == agp_ctgs
    # 2 scaffolds + 2 unanchored single-contig objects
    assert len(tours_out) == 4


def test_assembly_coordinates_respect_orientation(scaffolded):
    tmp, fa, ctgs, names, raw_agp, pairs, tours = scaffolded
    agp = parse_agp(raw_agp)
    space = AssemblySpace(agp)
    # g1 = names[0] '+', names[1] '-'
    c0 = agp.ctg_id[names[0]]
    c1 = agp.ctg_id[names[1]]
    l0, l1 = len(ctgs[names[0]]), len(ctgs[names[1]])
    # start of c0 maps to assembly pos 1
    assert space.map_positions(np.asarray([c0]), np.asarray([1]))[0] == 1
    # c1 is reversed: its LAST base comes right after c0 + gap
    got = space.map_positions(np.asarray([c1]), np.asarray([l1]))[0]
    assert got == l0 + 100 + 1


def test_post_round_trip_identity(scaffolded):
    tmp, fa, ctgs, names, raw_agp, pairs, tours = scaffolded
    juicer_pre(raw_agp, pairs, outdir=str(tmp))
    agp_path = juicer_post(str(tmp / 'out_JBAT.assembly'),
                           str(tmp / 'out_JBAT.liftover.agp'),
                           contigs_fasta=fa, outdir=str(tmp))
    # unedited review reproduces the scaffold sequences
    final = {n: s for n, s in iter_fasta(str(tmp / 'out_JBAT.FINAL.fa'))}
    g1 = ctgs[names[0]] + 'N' * 100 + revcomp(ctgs[names[1]])
    g2 = ctgs[names[2]] + 'N' * 100 + ctgs[names[3]]
    vals = set(final.values())
    assert {g1, g2} <= vals
    # unanchored contigs ride through as their own scaffolds
    assert ctgs[names[4]] in vals and ctgs[names[5]] in vals


def test_post_with_edits(scaffolded):
    tmp, fa, ctgs, names, raw_agp, pairs, tours = scaffolded
    juicer_pre(raw_agp, pairs, outdir=str(tmp))
    frags, tours_out = parse_review_assembly(
        str(tmp / 'out_JBAT.assembly'))
    # edit: flip scaffold 2's first fragment and merge both scaffolds
    merged = tours_out[0] + [-tours_out[1][0], tours_out[1][1]]
    review = tmp / 'review.assembly'
    with open(review, 'w') as f:
        for fid, (n, l) in enumerate(frags, 1):
            f.write('>{} {} {}\n'.format(n, fid, l))
        f.write(' '.join(str(x) for x in merged) + '\n')
    juicer_post(str(review), str(tmp / 'out_JBAT.liftover.agp'),
                contigs_fasta=fa, outdir=str(tmp),
                out_prefix='edited')
    final = {n: s for n, s in iter_fasta(str(tmp / 'edited.fa'))}
    assert len(final) == 1
    expected = (ctgs[names[0]] + 'N' * 100 + revcomp(ctgs[names[1]])
                + 'N' * 100 + revcomp(ctgs[names[2]])
                + 'N' * 100 + ctgs[names[3]])
    assert list(final.values())[0] == expected


def test_post_with_fragment_split(scaffolded):
    tmp, fa, ctgs, names, raw_agp, pairs, tours = scaffolded
    juicer_pre(raw_agp, pairs, outdir=str(tmp))
    frags, tours_out = parse_review_assembly(
        str(tmp / 'out_JBAT.assembly'))
    # split the first fragment (names[0], '+') into two JBAT pieces and
    # drop the second piece as debris
    n0, l0 = frags[0]
    cut = l0 // 3
    review = tmp / 'review2.assembly'
    with open(review, 'w') as f:
        f.write('>{}:::fragment_1 1 {}\n'.format(n0, cut))
        f.write('>{}:::fragment_2:::debris 2 {}\n'.format(n0, l0 - cut))
        fid = 3
        id_map = {}
        for (n, l) in frags[1:]:
            f.write('>{} {} {}\n'.format(n, fid, l))
            id_map[n] = fid
            fid += 1
        # scaffold: first piece + old partner; debris on its own line
        f.write('1 -{}\n'.format(id_map[names[1]]))
        f.write('2\n')
    juicer_post(str(review), str(tmp / 'out_JBAT.liftover.agp'),
                contigs_fasta=fa, outdir=str(tmp), out_prefix='split')
    final = {n: s for n, s in iter_fasta(str(tmp / 'split.fa'))}
    s1 = ctgs[names[0]][:cut] + 'N' * 100 + revcomp(ctgs[names[1]])
    debris = ctgs[names[0]][cut:]
    assert s1 in final.values()
    assert debris in final.values()


NATIVE_JUICER = __import__('os').path.join(
    __import__('os').path.dirname(__import__('os').path.dirname(
        __import__('os').path.abspath(__file__))), 'native', 'juicer')


@pytest.mark.skipif(not __import__('os').path.exists(NATIVE_JUICER),
                    reason='native juicer not built')
def test_native_juicer_matches_python(scaffolded):
    """The C++ juicer writes byte-identical pre/post artifacts."""
    import os
    import subprocess

    tmp, fa, ctgs, names, raw_agp, pairs, tours = scaffolded
    py_dir = tmp / 'py'
    c_dir = tmp / 'c'
    py_dir.mkdir()
    c_dir.mkdir()
    juicer_pre(raw_agp, pairs, outdir=str(py_dir))
    r = subprocess.run(
        [NATIVE_JUICER, 'pre', '-a', '-q', '1',
         '-o', str(c_dir / 'out_JBAT'), pairs, raw_agp],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert 'PRE_C_SIZE: assembly' in r.stderr
    for name in ('out_JBAT.txt', 'out_JBAT.assembly',
                 'out_JBAT.liftover.agp'):
        assert (c_dir / name).read_bytes() == \
            (py_dir / name).read_bytes(), name

    # post: identity review round-trip must reproduce the Python AGP+FA
    juicer_post(str(py_dir / 'out_JBAT.assembly'),
                str(py_dir / 'out_JBAT.liftover.agp'),
                contigs_fasta=fa, outdir=str(py_dir))
    r = subprocess.run(
        [NATIVE_JUICER, 'post', '-o', str(c_dir / 'out_JBAT.FINAL'),
         str(c_dir / 'out_JBAT.assembly'),
         str(c_dir / 'out_JBAT.liftover.agp'), fa],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert (c_dir / 'out_JBAT.FINAL.agp').read_bytes() == \
        (py_dir / 'out_JBAT.FINAL.agp').read_bytes()
    assert (c_dir / 'out_JBAT.FINAL.fa').read_bytes() == \
        (py_dir / 'out_JBAT.FINAL.fa').read_bytes()


def test_pre_pa5_and_bed_match_pairs(scaffolded, tmp_path):
    """The PA5 and BED input modes (reference utils/juicer pre surface:
    BED|BAM|BIN|PA5) must produce the identical short-format output as
    the .pairs mode for the same read pairs."""
    tmp, fa, ctgs, names, raw_agp, pairs, tours = scaffolded
    base = juicer_pre(raw_agp, pairs, outdir=str(tmp),
                      out_prefix='from_pairs')
    # rewrite the pairs as .pa5 (read ctg1 pos1 ctg2 pos2) and as
    # bamtobed-style BED (two consecutive per-mate lines, + strand:
    # 5' position = start+1 = the pairs position)
    pa5 = tmp_path / 'links.pa5'
    bed = tmp_path / 'links.bed'
    with open(pairs) as f, open(pa5, 'w') as f5, open(bed, 'w') as fb:
        for line in f:
            if line.startswith('#'):
                continue
            r, a, pa_, b, pb_ = line.split()[:5]
            f5.write('\t'.join([r, a, pa_, b, pb_]) + '\n')
            fb.write('{}\t{}\t{}\t{}/1\t60\t+\n'.format(
                a, int(pa_) - 1, int(pa_) + 49, r))
            fb.write('{}\t{}\t{}\t{}/2\t60\t+\n'.format(
                b, int(pb_) - 1, int(pb_) + 49, r))
    got5 = juicer_pre(raw_agp, str(pa5), outdir=str(tmp),
                      out_prefix='from_pa5')
    gotb = juicer_pre(raw_agp, str(bed), outdir=str(tmp),
                      out_prefix='from_bed')
    want = open(base).read()
    assert open(got5).read() == want and len(want) > 0
    assert open(gotb).read() == want


def test_pre_bed_minus_strand_uses_end(scaffolded, tmp_path):
    """BED '-'-strand records map through their 5' end (the interval
    end), not the interval start."""
    tmp, fa, ctgs, names, raw_agp, pairs, tours = scaffolded
    bed = tmp_path / 'one.bed'
    with open(bed, 'w') as f:
        f.write('{}\t10\t60\tr0/1\t60\t-\n'.format(names[0]))
        f.write('{}\t5\t55\tr0/2\t60\t+\n'.format(names[1]))
    eq = tmp_path / 'one.pairs'
    with open(eq, 'w') as f:
        f.write('## pairs format v1.0\n')
        f.write('r0\t{}\t60\t{}\t6\t+\t+\n'.format(names[0], names[1]))
    got = juicer_pre(raw_agp, str(bed), outdir=str(tmp),
                     out_prefix='bed_minus')
    want = juicer_pre(raw_agp, str(eq), outdir=str(tmp),
                      out_prefix='pairs_minus')
    assert open(got).read() == open(want).read() != ''


def test_pre_bin_is_rejected_with_guidance(scaffolded, tmp_path):
    tmp, fa, ctgs, names, raw_agp, pairs, tours = scaffolded
    binf = tmp_path / 'links.bin'
    binf.write_bytes(b'\x00' * 16)
    with pytest.raises(RuntimeError, match='not supported'):
        juicer_pre(raw_agp, str(binf), outdir=str(tmp))
    # --file-type overrides the extension, as in the reference binary
    with pytest.raises(RuntimeError, match='not supported'):
        juicer_pre(raw_agp, pairs, outdir=str(tmp), file_type='bin')


def test_pre_unknown_extension_rejected(scaffolded, tmp_path):
    tmp, fa, ctgs, names, raw_agp, pairs, tours = scaffolded
    odd = tmp_path / 'links.dat'
    odd.write_text('x\n')
    with pytest.raises(RuntimeError, match='unknown link file format'):
        juicer_pre(raw_agp, str(odd), outdir=str(tmp))
