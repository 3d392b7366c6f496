"""Parity tests for allelic/concentrated link pruning vs the reference."""

import random
import types
from array import array

import numpy as np
import pytest

from haphic_tpu.core import prune
from haphic_tpu.core.contacts import COO, CoordPairs
from haphic_tpu.core.fragments import Fragments
from haphic_tpu.io.fasta import Assembly

from . import refbridge


def _make_asm(names, lengths):
    snames = sorted(names)
    return Assembly(names=snames,
                    name2id={c: i for i, c in enumerate(snames)},
                    lengths=np.asarray([lengths[names.index(c)]
                                        for c in snames], np.int64),
                    re_sites=np.full(len(names), 10, np.int64),
                    seqs=None,
                    input_order={c: i for i, c in enumerate(names)})


def _make_frags(asm):
    n = len(asm)
    return Fragments(asm=asm, ctg_of_frag=np.arange(n, dtype=np.int32),
                     bin_no=np.ones(n, np.int32),
                     frag_start=np.zeros(n, np.int64),
                     frag_len=asm.lengths.copy(),
                     frag_re=asm.re_sites.copy(),
                     frag_offset=np.arange(n + 1, dtype=np.int64),
                     split_ctg=np.zeros(n, bool),
                     nx_mask=np.ones(n, bool), bin_size=0)


def _coords_from_records(records, asm, max_read_pairs):
    """records: list of (id_i, id_j, ci, cj) with id_i < id_j."""
    n = len(asm)
    keys = np.asarray([a * n + b for a, b, _, _ in records], np.int64)
    ci = np.asarray([r[2] for r in records], np.int64)
    cj = np.asarray([r[3] for r in records], np.int64)
    order = np.argsort(keys, kind='stable')
    keys, ci, cj = keys[order], ci[order], cj[order]
    upk, starts, total = np.unique(keys, return_index=True,
                                   return_counts=True)
    rank = np.arange(len(keys)) - np.repeat(starts, total)
    keep = rank < max_read_pairs
    keys, ci, cj = keys[keep], ci[keep], cj[keep]
    upk2, starts2, cnt2 = np.unique(keys, return_index=True,
                                    return_counts=True)
    return CoordPairs(pair_i=(keys // n), pair_j=(keys % n), ci=ci, cj=cj,
                      total_counts_i=upk, total_counts=total,
                      starts=starts2, counts=cnt2,
                      upair_i=(upk // n), upair_j=(upk % n))


def _sim_diploid(seed, n_alleles=4, n_other=4, n_coords=60):
    """Allelic pairs (aX_1, aX_2) share diagonal coords; others random."""
    rng = random.Random(seed)
    names, lengths = [], []
    for i in range(n_alleles):
        for h in (1, 2):
            names.append('a{}_{}'.format(i, h))
            lengths.append(rng.randrange(200000, 400000, 1000))
    for i in range(n_other):
        names.append('x{}'.format(i))
        lengths.append(rng.randrange(200000, 400000, 1000))
    asm = _make_asm(names, lengths)
    records = []
    for i in range(n_alleles):
        a = asm.name2id['a{}_1'.format(i)]
        b = asm.name2id['a{}_2'.format(i)]
        a, b = min(a, b), max(a, b)
        L = min(asm.lengths[a], asm.lengths[b])
        for _ in range(n_coords):
            x = rng.randrange(1, L)
            records.append((a, b, x, min(x + rng.randrange(0, 500), L)))
    ids = list(range(len(asm)))
    for _ in range(len(asm) * len(asm) * 3):
        i, j = rng.sample(ids, 2)
        i, j = min(i, j), max(i, j)
        records.append((i, j, rng.randrange(1, asm.lengths[i] + 1),
                        rng.randrange(1, asm.lengths[j] + 1)))
    return asm, records


def _full_coo(records, n):
    keys = np.asarray([a * n + b for a, b, _, _ in records], np.int64)
    uk, cnt = np.unique(keys, return_counts=True)
    return COO(i=uk // n, j=uk % n, w=cnt.astype(np.float64))


def test_concordance_ratio_parity():
    ref = refbridge.load('HapHiC_cluster')
    asm, records = _sim_diploid(0)
    coords = _coords_from_records(records, asm, max_read_pairs=200)
    got = prune.concordance_ratios(coords, asm.lengths, nwindows=50)
    for t in range(len(coords.upair_i)):
        a, b = int(coords.upair_i[t]), int(coords.upair_j[t])
        s, c = int(coords.starts[t]), int(coords.counts[t])
        coord_list = []
        for k in range(s, s + c):
            coord_list.extend([int(coords.ci[k]), int(coords.cj[k])])
        shorter = min(int(asm.lengths[a]), int(asm.lengths[b]))
        expected = ref.cal_concordance_ratio(coord_list, shorter, 50)
        assert got[t] == pytest.approx(expected)


def test_concentration_ratio_parity():
    ref = refbridge.load('HapHiC_cluster')
    rng = random.Random(5)
    # one concentrated pair, one diffuse pair
    recs = []
    for _ in range(100):
        recs.append((0, 1, 50000 + rng.randrange(0, 3000), rng.randrange(1, 300000)))
    for _ in range(100):
        recs.append((0, 2, rng.randrange(1, 300000), rng.randrange(1, 300000)))
    asm = _make_asm(['c0', 'c1', 'c2'], [300000, 300000, 300000])
    coords = _coords_from_records(recs, asm, 200)
    got = prune.concentration_adj_ratios(coords)
    for t in range(len(coords.upair_i)):
        s, c = int(coords.starts[t]), int(coords.counts[t])
        coord_list = []
        for k in range(s, s + c):
            coord_list.extend([int(coords.ci[k]), int(coords.cj[k])])
        expected = ref.cal_concentration_adj_ratio(coord_list)
        assert got[t] == pytest.approx(expected)


def test_concentration_ratio_knob():
    """--concentration_ratio tunes the bins-vs-median multiplier the
    reference hardcodes to 10 (HapHiC_cluster.py:448-449): lowering it
    marks more bins concentrated, so adj ratios can only drop; an
    enormous cutoff disables the adjustment entirely (ratio 1.0)."""
    rng = random.Random(5)
    recs = []
    for _ in range(100):
        recs.append((0, 1, 50000 + rng.randrange(0, 3000),
                     rng.randrange(1, 300000)))
    asm = _make_asm(['c0', 'c1'], [300000, 300000])
    coords = _coords_from_records(recs, asm, 200)
    default = prune.concentration_adj_ratios(coords)
    same = prune.concentration_adj_ratios(coords, concentration_ratio=10.0)
    loose = prune.concentration_adj_ratios(coords, concentration_ratio=2.0)
    off = prune.concentration_adj_ratios(coords, concentration_ratio=1e9)
    assert np.array_equal(default, same)
    assert (loose <= default + 1e-12).all()
    assert (off == 1.0).all()
    assert loose[0] < off[0]


@pytest.mark.parametrize('ploidy', [2, 4])
def test_remove_allelic_parity(ploidy):
    ref = refbridge.load('HapHiC_cluster')
    asm, records = _sim_diploid(ploidy + 10)
    n = len(asm)
    frags = _make_frags(asm)
    coords = _coords_from_records(records, asm, 200)
    full = _full_coo(records, n)
    flank = COO(i=full.i.copy(), j=full.j.copy(), w=full.w.copy())
    filtered = np.arange(n)

    # ---- reference path
    fa_dict = {c: [None, int(asm.lengths[asm.name2id[c]]), 10]
               for c in asm.names}
    full_link_dict = {(asm.names[a], asm.names[b]): int(w)
                      for a, b, w in zip(full.i, full.j, full.w)}
    flank_link_dict = dict(full_link_dict)
    ctg_coord_dict = {}
    for t in range(len(coords.upair_i)):
        a, b = int(coords.upair_i[t]), int(coords.upair_j[t])
        s, c = int(coords.starts[t]), int(coords.counts[t])
        arr = array('l')
        for k in range(s, s + c):
            arr.extend([int(coords.ci[k]), int(coords.cj[k])])
        ctg_coord_dict[(asm.names[a], asm.names[b])] = arr
    args = types.SimpleNamespace(remove_allelic_links=ploidy,
                                 min_read_pairs=20,
                                 concordance_ratio_cutoff=0.2, nwindows=50)
    remaining = ref.remove_allelic_HiC_links(
        fa_dict, ctg_coord_dict, full_link_dict, args,
        flank_link_dict=flank_link_dict,
        filtered_frags={c for c in asm.names})

    # ---- our path
    res = prune.remove_allelic_links(asm, frags, full, flank, coords,
                                     filtered, ploidy)
    got_full = {(asm.names[a], asm.names[b])
                for a, b in zip(res.full.i, res.full.j)}
    assert got_full == set(full_link_dict.keys())
    got_flank = {(asm.names[a], asm.names[b])
                 for a, b in zip(res.flank.i, res.flank.j)}
    assert got_flank == set(flank_link_dict.keys())
    assert {asm.names[f] for f in res.filtered_ids} == remaining
    assert res.n_allelic_pairs >= 4   # the built-in allelic pairs


def test_reduce_inter_hap():
    asm = _make_asm(['h1a', 'h1b', 'h2a', 'h2b'], [1000] * 4)
    frags = _make_frags(asm)
    hap = np.asarray([0, 0, 1, 1])[np.argsort([0, 1, 2, 3])]
    hap = np.asarray([0, 0, 1, 1])
    flank = COO(i=np.asarray([0, 0, 2]), j=np.asarray([1, 2, 3]),
                w=np.asarray([10.0, 8.0, 6.0]))
    out = prune.reduce_inter_hap_links_frag(flank, frags, hap, 1.0)
    # (0,2) is inter-hap -> weight 0 -> dropped
    assert list(zip(out.i, out.j)) == [(0, 1), (2, 3)]
    out2 = prune.reduce_inter_hap_links_frag(flank, frags, hap, 0.5)
    assert out2.w.tolist() == [10.0, 4.0, 6.0]


def test_remove_allelic_verbose_log(caplog):
    """--verbose emits `<ctg1> <ctg2> links=N concordance_ratio=R`
    per evaluated pair (parity: :582,592-593), the contract consumed
    by `haphic sim allelic_contig_statistics`."""
    import logging as _logging

    asm, records = _sim_diploid(12)
    n = len(asm)
    frags = _make_frags(asm)
    coords = _coords_from_records(records, asm, 200)
    full = _full_coo(records, n)
    flank = COO(i=full.i.copy(), j=full.j.copy(), w=full.w.copy())
    with caplog.at_level(_logging.DEBUG, logger='haphic_tpu.core.prune'):
        prune.remove_allelic_links(asm, frags, full, flank, coords,
                                   np.arange(n), 2)
    lines = [r.getMessage() for r in caplog.records
             if 'concordance_ratio=' in r.getMessage()]
    assert len(lines) == len(coords.upair_i)
    cols = lines[0].split()
    assert cols[2].startswith('links=') and \
        cols[3].startswith('concordance_ratio=')
