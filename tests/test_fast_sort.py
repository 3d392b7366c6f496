"""Parity + functional tests for fast sorting (vs reference fast_sort)."""

import random
import types

import numpy as np
import pytest

from haphic_tpu.core.contacts import COO
from haphic_tpu.order.fast_sort import (fast_sort, make_group_data,
                                        paths_to_tour, write_tour)

from . import refbridge


def _sim_group(seed, n_ctg=10, decay=30000.0, with_noise=True):
    """A true linear order of contigs with distance-decaying end-to-end
    Hi-C links. Returns (names, lengths, HT_link_dict, true_tour)."""
    rng = random.Random(seed)
    names = ['ctg{:02d}'.format(i) for i in range(n_ctg)]
    lengths = rng.sample(range(50000, 250000, 1000), n_ctg)
    order = list(range(n_ctg))
    rng.shuffle(order)
    oris = [rng.choice('+-') for _ in range(n_ctg)]

    # genomic coordinate of each HT end point
    end_pos = {}
    offset = 0
    for c in order:
        L = lengths[c]
        h, t = (offset, offset + L) if oris[c] == '+' else (offset + L, offset)
        end_pos[names[c] + '_H'] = h
        end_pos[names[c] + '_T'] = t
        offset += L

    ht_dict = {}
    for i in range(n_ctg):
        for j in range(i + 1, n_ctg):
            a, b = sorted([names[i], names[j]])
            for sa in ('_H', '_T'):
                for sb in ('_H', '_T'):
                    d = abs(end_pos[a + sa] - end_pos[b + sb])
                    links = int(2000.0 / (1.0 + d / decay))
                    if with_noise:
                        links += rng.randrange(0, 3)
                    if links > 0:
                        ht_dict[(a + sa, b + sb)] = links

    true_tour = [(names[c], oris[c]) for c in order]
    return names, lengths, ht_dict, true_tour


def _ref_fast_sort(names, lengths, ht_dict, **kw):
    ref = refbridge.load('HapHiC_sort')
    fa_dict = {c: l for c, l in zip(names, lengths)}
    ctg_info_list = sorted(fa_dict.items(), key=lambda x: x[1], reverse=True)
    ctgs = [c for c, _ in ctg_info_list]
    sub_HT_dict, HT_index_dict = ref.get_sub_HT_dict(ctgs, ht_dict)
    args = types.SimpleNamespace(
        confidence_cutoff=kw.get('confidence_cutoff', 1.0),
        density_cal_method=kw.get('density_cal_method', 'multiplication'),
        flanking_region=kw.get('flanking_region_kbp', 0))
    out, only_one = ref.fast_sort(
        args, fa_dict, (ctg_info_list, ctgs, sub_HT_dict, HT_index_dict), 'g1')
    tour = []
    for path in out:
        for HT in path[::2]:
            ctg, tag = HT.rsplit('_', 1)
            tour.append((ctg, '+' if tag == 'H' else '-'))
    return tour


def _our_fast_sort(names, lengths, ht_dict, **kw):
    lengths_all = np.asarray(lengths, dtype=np.int64)
    name2id = {c: i for i, c in enumerate(names)}
    ii, jj, ww = [], [], []
    for (a, b), w in ht_dict.items():
        ca, sa = a.rsplit('_', 1)
        cb, sb = b.rsplit('_', 1)
        ii.append(name2id[ca] * 2 + (sa == 'T'))
        jj.append(name2id[cb] * 2 + (sb == 'T'))
        ww.append(w)
    ht = COO(i=np.asarray(ii), j=np.asarray(jj), w=np.asarray(ww, float))
    group = make_group_data(np.arange(len(names)), lengths_all, ht)
    paths = fast_sort(group, **kw)
    return paths_to_tour(paths, group.ctg_ids, names)


def _canonical(tour, n_paths_hint=None):
    """Direction-normalize a tour for comparison (a whole path emitted
    reversed+flipped is the same scaffold)."""
    return min(tuple(tour),
               tuple(((c, '+' if o == '-' else '-') for c, o in tour[::-1])))


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4])
def test_fast_sort_parity(seed):
    names, lengths, ht_dict, _ = _sim_group(seed)
    expected = _ref_fast_sort(names, lengths, ht_dict)
    got = _our_fast_sort(names, lengths, ht_dict)
    assert got == expected


@pytest.mark.parametrize('method', ['sum', 'geometric_mean'])
def test_fast_sort_parity_density_methods(method):
    names, lengths, ht_dict, _ = _sim_group(11)
    expected = _ref_fast_sort(names, lengths, ht_dict,
                              density_cal_method=method)
    got = _our_fast_sort(names, lengths, ht_dict, density_cal_method=method)
    assert got == expected


def test_fast_sort_parity_flanking():
    names, lengths, ht_dict, _ = _sim_group(21, n_ctg=12)
    expected = _ref_fast_sort(names, lengths, ht_dict, flanking_region_kbp=100)
    got = _our_fast_sort(names, lengths, ht_dict, flanking_region_kbp=100)
    assert got == expected


@pytest.mark.parametrize('seed', [5, 6])
def test_fast_sort_recovers_true_order(seed):
    names, lengths, ht_dict, true_tour = _sim_group(seed, with_noise=False)
    got = _our_fast_sort(names, lengths, ht_dict)
    assert _canonical(got) == _canonical(true_tour)


def test_single_contig_group():
    lengths_all = np.asarray([1000], dtype=np.int64)
    ht = COO(i=np.zeros(0, np.int64), j=np.zeros(0, np.int64),
             w=np.zeros(0))
    group = make_group_data([0], lengths_all, ht)
    paths = fast_sort(group)
    assert paths_to_tour(paths, group.ctg_ids, ['only']) == [('only', '+')]


def test_write_tour(tmp_path):
    p = tmp_path / 'g1.tour'
    write_tour(str(p), [('a', '+'), ('b', '-')])
    assert p.read_text() == '>INIT\na+ b-\n'
