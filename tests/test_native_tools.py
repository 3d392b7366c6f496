"""Tests for the native filter_bam and agp_to_fasta executables."""

import os
import random
import struct
import subprocess

import numpy as np
import pytest

from . import bamutil
from . import util

NATIVE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'native')


def _tool(name):
    path = os.path.join(NATIVE, name)
    if not os.path.exists(path):
        subprocess.run(['make', '-C', NATIVE], check=True,
                       capture_output=True)
    return path if os.path.exists(path) else None


def _pair(refs, rng, name, mapq1, mapq2, nm1=0, nm2=0, dup=False):
    r1, r2 = rng.randrange(len(refs)), rng.randrange(len(refs))
    p1, p2 = rng.randrange(1000), rng.randrange(1000)
    fl1 = 0x1 | 0x40 | (0x400 if dup else 0)
    fl2 = 0x1 | 0x80 | (0x400 if dup else 0)
    return [bamutil.bam_record(r1, p1, r2, p2, fl1, mapq=mapq1,
                               name=name, nm=nm1),
            bamutil.bam_record(r2, p2, r1, p1, fl2, mapq=mapq2,
                               name=name, nm=nm2)]


def test_filter_bam(tmp_path):
    tool = _tool('filter_bam')
    if tool is None:
        pytest.skip('native toolchain unavailable')
    rng = random.Random(0)
    refs = ['c1', 'c2']
    recs, expected = [], set()
    # pass: both mapq >= 10, NM < 3
    recs += _pair(refs, rng, b'keep1', 30, 20, 1, 2)
    expected.add('keep1')
    # fail mapq
    recs += _pair(refs, rng, b'lowq', 5, 40)
    # fail NM
    recs += _pair(refs, rng, b'highnm', 30, 30, nm1=5)
    # duplicate pair removed with --remove_dup
    recs += _pair(refs, rng, b'dup1', 30, 30, dup=True)
    # singleton (only one record)
    recs.append(bamutil.bam_record(0, 1, 1, 2, 0x1 | 0x40,
                                   mapq=50, name=b'solo'))
    recs += _pair(refs, rng, b'keep2', 10, 10)
    expected.add('keep2')
    bam = tmp_path / 'in.bam'
    bamutil.write_bam(str(bam), refs, [100000, 100000], recs)
    out = tmp_path / 'out.bam'
    res = subprocess.run(
        [tool, str(bam), '10', '--nm', '3', '--remove_dup',
         '--remove_singletons', '-o', str(out)],
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr

    from haphic_tpu.io.bam import open_detail_bam
    got = {q for q, *_ in open_detail_bam(str(out)).detail_records()}
    assert got == expected
    # record count: two per kept pair
    n = sum(1 for _ in open_detail_bam(str(out)).detail_records())
    assert n == 2 * len(expected)


def test_filter_bam_single_end_mode(tmp_path):
    tool = _tool('filter_bam')
    if tool is None:
        pytest.skip('native toolchain unavailable')
    rng = random.Random(1)
    refs = ['c1']
    recs = _pair(refs, rng, b'mixed', 40, 2)
    bam = tmp_path / 'in.bam'
    bamutil.write_bam(str(bam), refs, [100000], recs)
    out1 = tmp_path / 'strict.bam'
    out2 = tmp_path / 'loose.bam'
    subprocess.run([tool, str(bam), '10', '-o', str(out1)], check=True,
                   capture_output=True)
    subprocess.run([tool, str(bam), '10', '--single_end_mapq_filtering',
                    '-o', str(out2)], check=True, capture_output=True)
    from haphic_tpu.io.bam import open_detail_bam
    assert sum(1 for _ in open_detail_bam(str(out1)).detail_records()) == 0
    assert sum(1 for _ in open_detail_bam(str(out2)).detail_records()) == 2


def test_agp_to_fasta_matches_builder(tmp_path):
    tool = _tool('agp_to_fasta')
    if tool is None:
        pytest.skip('native toolchain unavailable')
    import io
    rng = random.Random(3)
    ctgs = util.random_genome(rng, n_ctg=8, min_len=200, max_len=900)
    fa = tmp_path / 'ctgs.fa'
    util.write_genome(str(fa), ctgs)

    from haphic_tpu.build.scaffolds import build_final_scaffolds
    from haphic_tpu.io.fasta import read_fasta
    asm = read_fasta(str(fa))
    names = list(ctgs)
    tours = {'g1': [(names[0], '+'), (names[1], '-'), (names[2], '+')],
             'g2': [(names[3], '-'), (names[4], '+')]}
    fa_out, agp, raw = build_final_scaffolds(
        tours, asm, corrected_ctgs=set(), outdir=str(tmp_path))

    res = subprocess.run([tool, agp, str(fa)], capture_output=True,
                         text=True)
    assert res.returncode == 0, res.stderr
    assert res.stdout == open(fa_out).read()


def test_agp_to_fasta_validates(tmp_path):
    tool = _tool('agp_to_fasta')
    if tool is None:
        pytest.skip('native toolchain unavailable')
    fa = tmp_path / 'c.fa'
    fa.write_text('>c1\nACGTACGT\n')
    agp = tmp_path / 'bad.agp'
    # object coordinates not contiguous
    agp.write_text('s1\t1\t8\t1\tW\tc1\t1\t8\t+\n'
                   's1\t10\t17\t2\tW\tc1\t1\t8\t+\n')
    res = subprocess.run([tool, str(agp), str(fa)], capture_output=True,
                         text=True)
    assert res.returncode != 0
    assert 'validation' in res.stderr
