"""Parity tests: assembly correction vs the reference implementation."""

import random
import types
from array import array
from collections import defaultdict

import numpy as np
import pytest

from haphic_tpu.core import correct as corr
from haphic_tpu.io.fasta import read_fasta
from haphic_tpu.io.pairs import AlignChunk

from . import refbridge
from . import util


def _sim_reads(seed, chimera_at=60000):
    """One chimeric contig (junction at ``chimera_at``) + two normal
    contigs; intra-contig read pairs with short separations that never
    cross the junction."""
    rng = random.Random(seed)
    ctgs = {
        'chim': ''.join(rng.choice('ATCG') for _ in range(100000)),
        'norm1': ''.join(rng.choice('ATCG') for _ in range(80000)),
        'norm2': ''.join(rng.choice('ATCG') for _ in range(60000)),
    }
    recs = []
    for name, L in (('chim', 100000), ('norm1', 80000), ('norm2', 60000)):
        for _ in range(4000):
            if name == 'chim':
                # dead zone around the junction -> zero-coverage valley
                if rng.random() < 0.6:
                    lo_lim, hi_lim = 0, chimera_at - 2001
                else:
                    lo_lim, hi_lim = chimera_at + 2000, L - 1
            else:
                lo_lim, hi_lim = 0, L - 1
            a = rng.randrange(lo_lim, hi_lim)
            b = min(a + rng.randrange(1, 4000), hi_lim)
            recs.append((name, a, b))       # 0-based
    return ctgs, recs


def _ref_inputs(ctgs, recs, resolution=500):
    fa_dict = {c: [s, len(s), 10] for c, s in ctgs.items()}
    cov = {c: np.zeros(len(s) // resolution + 1, np.int64)
           for c, s in ctgs.items()}
    links = defaultdict(lambda: array('l'))
    for c, a, b in recs:
        cov[c][a // resolution: b // resolution + 1] += 1
        links[c].extend((a, b))
    return fa_dict, cov, links


def _our_chunks(ctgs, recs, asm):
    ref = np.asarray([asm.name2id[c] for c, _, __ in recs], np.int32)
    pos = np.asarray([a for _, a, __ in recs], np.int64)
    mpos = np.asarray([b for _, __, b in recs], np.int64)
    return [AlignChunk(ref=ref, pos=pos, mref=ref.copy(), mpos=mpos)]


def _mk_asm(tmp_path, ctgs):
    fa = tmp_path / 'asm.fa'
    util.write_genome(str(fa), ctgs)
    return read_fasta(str(fa))


@pytest.mark.parametrize('seed', [0, 1])
def test_detect_break_points_parity(seed, tmp_path):
    ref = refbridge.load('HapHiC_cluster')
    ctgs, recs = _sim_reads(seed)
    fa_dict, cov, links = _ref_inputs(ctgs, recs)
    args = types.SimpleNamespace(correct_resolution=500,
                                 median_cov_ratio=0.2,
                                 min_region_cutoff=5000,
                                 region_len_ratio=0.1)
    expected = ref.detect_break_points(cov, fa_dict, args)

    asm = _mk_asm(tmp_path, ctgs)
    state = corr.accumulate_coverage(_our_chunks(ctgs, recs, asm),
                                     asm.names, asm.lengths, 500)
    lengths = {c: asm.length_of(c) for c in asm.names}
    got = corr.detect_break_points(state, lengths)
    got_named = {c: v for c, v in got.items()}
    assert set(got_named) == set(expected)
    for c in expected:
        assert [(p, cv) for p, cv in got_named[c]] == \
            [(p, cv) for p, cv in expected[c]]


@pytest.mark.parametrize('nrounds', [1, 2])
def test_correct_assembly_parity(tmp_path, monkeypatch, nrounds):
    ref = refbridge.load('HapHiC_cluster')
    ctgs, recs = _sim_reads(3)
    fa_dict, cov, links = _ref_inputs(ctgs, recs)
    fa_path = tmp_path / 'asm.fa'
    util.write_genome(str(fa_path), ctgs)
    args = types.SimpleNamespace(correct_resolution=500,
                                 median_cov_ratio=0.2,
                                 min_region_cutoff=5000,
                                 region_len_ratio=0.1,
                                 correct_nrounds=nrounds, RE='GATC',
                                 quick_view=False, gfa=None,
                                 fasta=str(fa_path))
    refdir = tmp_path / 'ref'
    refdir.mkdir()
    monkeypatch.chdir(refdir)
    nbroken, pos_dict, frag_dict = ref.correct_assembly(
        cov, links, fa_dict, {}, args)
    monkeypatch.chdir(tmp_path)

    asm = _mk_asm(tmp_path, ctgs)
    ourdir = tmp_path / 'ours'
    ourdir.mkdir()
    res = corr.correct_assembly(asm, _our_chunks(ctgs, recs, asm),
                                str(ourdir), correct_nrounds=nrounds)

    assert res.n_broken == nbroken
    # identical fragment sets and sequences
    assert set(res.asm.names) == set(fa_dict.keys())
    for c in fa_dict:
        assert res.asm.seq_of(c) == fa_dict[c][0]
    # identical final fragment layout bookkeeping
    for src in pos_dict:
        assert res.remapper is not None
    # corrected_ctgs.txt parity (same set)
    ref_list = {l.strip() for l in open(refdir / 'corrected_ctgs.txt')
                if l.strip()}
    got_list = {l.strip() for l in open(res.list_path) if l.strip()}
    assert got_list == ref_list


def test_remapper_roundtrip(tmp_path):
    ctgs, recs = _sim_reads(5)
    asm = _mk_asm(tmp_path, ctgs)
    res = corr.correct_assembly(asm, _our_chunks(ctgs, recs, asm),
                                str(tmp_path), correct_nrounds=1)
    assert res.n_broken >= 1 and res.remapper is not None
    rm = res.remapper
    # a position inside the second fragment of the chimera maps there
    chim_frags = sorted(c for c in res.asm.names if c.startswith('chim:'))
    assert len(chim_frags) >= 2
    chunk = AlignChunk(ref=np.asarray([asm.name2id['chim']], np.int32),
                       pos=np.asarray([70000], np.int64),
                       mref=np.asarray([asm.name2id['norm1']], np.int32),
                       mpos=np.asarray([100], np.int64))
    out = rm.remap(chunk)
    name = rm.new_names[out.ref[0]]
    raw, rng_ = name.rsplit(':', 1)
    s, e = map(int, rng_.split('-'))
    assert raw == 'chim' and s <= 70001 <= e
    assert out.pos[0] == 70000 - (s - 1)
    # untouched contig passes through
    assert rm.new_names[out.mref[0]] == 'norm1'
    assert out.mpos[0] == 100
