"""Parity tests: fragment filtering vs the reference filter_fragments."""

import random

import numpy as np
import pytest

from haphic_tpu.core.contacts import COO
from haphic_tpu.core.filter import (Param, filter_fragments,
                                    normalize_by_nlinks)
from haphic_tpu.core.fragments import Fragments
from haphic_tpu.io.fasta import Assembly

from . import refbridge


def _make_frags(n, lengths, re_sites):
    names = ['ctg{:03d}'.format(i) for i in range(n)]
    asm = Assembly(names=names, name2id={c: i for i, c in enumerate(names)},
                   lengths=np.asarray(lengths, dtype=np.int64),
                   re_sites=np.asarray(re_sites, dtype=np.int64),
                   seqs=None,
                   input_order={c: i for i, c in enumerate(names)})
    m = n
    return Fragments(
        asm=asm,
        ctg_of_frag=np.arange(n, dtype=np.int32),
        bin_no=np.ones(m, dtype=np.int32),
        frag_start=np.zeros(m, dtype=np.int64),
        frag_len=np.asarray(lengths, dtype=np.int64),
        frag_re=np.asarray(re_sites, dtype=np.int64),
        frag_offset=np.arange(n + 1, dtype=np.int64),
        split_ctg=np.zeros(n, dtype=bool),
        nx_mask=np.ones(m, dtype=bool),
        bin_size=0)


def _tie_free_inputs(seed, n=24):
    """Distinct RE counts, distinct positive pairwise links so reference
    set-iteration tie orders cannot affect the result."""
    rng = random.Random(seed)
    lengths = [rng.randrange(5000, 50000) for _ in range(n)]
    re_sites = rng.sample(range(30, 30 + 10 * n), n)      # distinct, > cutoff
    weights = rng.sample(range(1, 1 + 2 * n * n), n * (n - 1) // 2)
    ii, jj, ww = [], [], []
    k = 0
    for i in range(n):
        for j in range(i + 1, n):
            ii.append(i)
            jj.append(j)
            ww.append(weights[k])
            k += 1
    flank = COO(i=np.asarray(ii), j=np.asarray(jj),
                w=np.asarray(ww, dtype=np.float64))
    frag_links = np.zeros(n, dtype=np.int64)
    np.add.at(frag_links, flank.i, flank.w.astype(np.int64))
    np.add.at(frag_links, flank.j, flank.w.astype(np.int64))
    return _make_frags(n, lengths, re_sites), flank, frag_links


def _ref_filter(frags, flank, frag_links, read_depth=None, **kw):
    ref = refbridge.load('HapHiC_cluster')
    names = frags.asm.names
    nx = set(names)
    re_dict = {c: int(r) for c, r in zip(names, frags.frag_re)}
    link_dict = {c: int(l) for c, l in zip(names, frag_links) if l}
    flank_dict = {(names[i], names[j]): float(w)
                  for i, j, w in zip(flank.i, flank.j, flank.w)}
    depth_dict = None
    if read_depth is not None:
        depth_dict = {c: (0, float(d)) for c, d in zip(names, read_depth)}
    return ref.filter_fragments(
        nx, re_dict, kw.get('RE_site_cutoff', 25), link_dict,
        kw.get('density_lower', '0.2X'), kw.get('density_upper', '1.9X'),
        kw.get('topN', 10), kw.get('rank_sum_upper', '1.5X'),
        kw.get('rank_sum_hard_cutoff', 0), flank_dict,
        depth_dict, kw.get('read_depth_upper', '1.5X'),
        kw.get('whitelist', None))


@pytest.mark.parametrize('seed', [1, 2, 3])
def test_filter_parity(seed):
    frags, flank, frag_links = _tie_free_inputs(seed)
    expected = _ref_filter(frags, flank, frag_links)
    got = filter_fragments(frags, flank, frag_links)
    got_names = {frags.asm.names[i] for i in got.kept_ids}
    assert got_names == expected


@pytest.mark.parametrize('mode', [
    dict(density_lower='0.1', density_upper='0.9'),
    dict(rank_sum_upper='0.8'),
    dict(RE_site_cutoff=100),
    dict(rank_sum_hard_cutoff=500),
])
def test_filter_parity_modes(mode):
    frags, flank, frag_links = _tie_free_inputs(7)
    expected = _ref_filter(frags, flank, frag_links, **mode)
    got = filter_fragments(frags, flank, frag_links, **mode)
    got_names = {frags.asm.names[i] for i in got.kept_ids}
    assert got_names == expected


def test_filter_parity_read_depth():
    rng = random.Random(9)
    frags, flank, frag_links = _tie_free_inputs(9)
    depth = np.asarray(rng.sample(range(10, 200), len(frags)), dtype=float)
    depth[3] = 1000.0  # clear outlier
    expected = _ref_filter(frags, flank, frag_links, read_depth=depth)
    got = filter_fragments(frags, flank, frag_links, read_depth=depth)
    got_names = {frags.asm.names[i] for i in got.kept_ids}
    assert got_names == expected


def test_whitelist_readd():
    frags, flank, frag_links = _tie_free_inputs(4)
    wl = {frags.asm.names[0], frags.asm.names[5]}
    got = filter_fragments(frags, flank, frag_links,
                           density_lower='0.4', density_upper='0.6',
                           whitelist=wl)
    got_names = {frags.asm.names[i] for i in got.kept_ids}
    assert wl <= got_names


def test_param_modes():
    assert Param.parse('--x', '0.2X') == Param(0.2, True)
    assert Param.parse('--x', '0.2') == Param(0.2, False)
    with pytest.raises(RuntimeError):
        Param.parse('--x', '1.5')       # fraction out of range
    with pytest.raises(RuntimeError):
        Param.parse('--x', 'abc')


def test_normalize_by_nlinks_parity():
    frags, flank, frag_links = _tie_free_inputs(12)
    ref = refbridge.load('HapHiC_cluster')
    names = frags.asm.names
    flank_dict = {(names[i], names[j]): float(w)
                  for i, j, w in zip(flank.i, flank.j, flank.w)}
    link_dict = {c: int(l) for c, l in zip(names, frag_links)}
    ref.normalize_by_nlinks(flank_dict, link_dict)
    got = normalize_by_nlinks(flank, frag_links.astype(np.float64))
    for i, j, w in zip(got.i, got.j, got.w):
        assert abs(flank_dict[(names[i], names[j])] - w) < 1e-9


def test_rank_sum_sparse_equals_dense():
    """The O(nnz log nnz) rank/top machinery must match the dense
    nf²-argsort formulation exactly — including rows with fewer than
    topN neighbors (zero-fill) and rank queries of unlinked pairs."""
    import numpy as np
    from haphic_tpu.core import filter as fmod
    rng = np.random.default_rng(0)
    for trial in range(4):
        nf = int(rng.integers(30, 300))
        nnz = int(rng.integers(nf // 2, nf * 12))
        ii = rng.integers(0, nf, nnz)
        jj = rng.integers(0, nf, nnz)
        sel = ii < jj
        ii, jj = ii[sel], jj[sel]
        ww = rng.integers(1, 50, len(ii)).astype(np.float64)
        mat = np.zeros((nf, nf))
        np.add.at(mat, (ii, jj), ww)
        np.add.at(mat, (jj, ii), ww)
        for topN in (3, 10, 25):
            td, rd = fmod._topn_ranks_dense(mat, topN)
            ts, rs = fmod._topn_ranks_sparse(ii, jj, ww, nf, topN)
            assert np.array_equal(td, ts), (trial, topN)
            qx = rng.integers(0, nf, 400)
            qy = rng.integers(0, nf, 400)
            assert np.array_equal(rd(qx, qy), rs(qx, qy)), (trial, topN)
