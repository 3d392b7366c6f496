"""Parity tests: reassignment engine vs scripts/HapHiC_reassign.py."""

import random

import numpy as np
import pytest

from haphic_tpu.assign.reassign import (ReassignParams, Groups, reassign,
                                        split_clm_file)
from haphic_tpu.core.contacts import COO
from haphic_tpu.io.fasta import Assembly

from . import refbridge


def _make_asm(names, lengths, re_sites):
    order = {c: i for i, c in enumerate(names)}
    snames = sorted(names)
    return Assembly(names=snames,
                    name2id={c: i for i, c in enumerate(snames)},
                    lengths=np.asarray([lengths[names.index(c)]
                                        for c in snames], dtype=np.int64),
                    re_sites=np.asarray([re_sites[names.index(c)]
                                         for c in snames], dtype=np.int64),
                    seqs=None, input_order=order)


def _scenario(seed, nchr=3, per=6):
    """Chromosome-structured links; two contigs start unclustered, one
    starts in the wrong group. All weights/lengths distinct."""
    rng = random.Random(seed)
    names, lengths, re_sites, chrom = [], [], [], []
    lens = rng.sample(range(100000, 400000, 111), nchr * per)
    res = rng.sample(range(100, 2000), nchr * per)
    for c in range(nchr):
        for i in range(per):
            names.append('c{}x{}'.format(c, i))
            lengths.append(lens[c * per + i])
            re_sites.append(res[c * per + i] + 1)     # +1 pseudo-count
            chrom.append(c)
    n = len(names)
    weights = iter(rng.sample(range(1, 100000), n * n))
    link = {}
    for i in range(n):
        for j in range(i + 1, n):
            a, b = sorted([names[i], names[j]])
            if chrom[i] == chrom[j]:
                link[(a, b)] = 500 + next(weights) % 400
            elif rng.random() < 0.5:
                link[(a, b)] = 1 + next(weights) % 12
    # make every value unique to kill tie ambiguity
    for k, (key, v) in enumerate(sorted(link.items())):
        link[key] = v + k * 0.001

    clusters = {}
    for c in range(nchr):
        clusters['cl{}'.format(c)] = [names[c * per + i] for i in range(per)]
    # unclustered: last contig of chrom 0 and 1; misassigned: first of 2
    clusters['cl0'].remove(names[per - 1])
    clusters['cl1'].remove(names[2 * per - 1])
    mis = names[2 * per]
    clusters['cl2'].remove(mis)
    clusters['cl0'].append(mis)
    return names, lengths, re_sites, link, clusters, chrom


def _run_reference(names, lengths, re_sites, link, clusters, p, nrounds=5,
                   rescue=True):
    ref = refbridge.load('HapHiC_reassign')
    fa_dict = {c: [None, l, r] for c, l, r in zip(names, lengths, re_sites)}
    RE_site_dict = {c: r for c, r in zip(names, re_sites)}
    full_link_dict = dict(link)

    ctg_group_dict, group_RE_dict = {}, {}
    for g, ctgs in clusters.items():
        if p.min_group_len and \
                sum(fa_dict[c][1] for c in ctgs) / 1e6 < p.min_group_len:
            continue
        group_RE_dict[g] = 1
        for c in ctgs:
            ctg_group_dict[c] = g
            group_RE_dict[g] += RE_site_dict[c] - 1
    grouped = ref.add_ungrouped_ctgs(fa_dict, ctg_group_dict)
    cgl, linked = ref.parse_link_dict(full_link_dict, ctg_group_dict,
                                      normalize_by_nlinks=False)
    sorted_ctg_list = sorted([(c, fa_dict[c][1]) for c in fa_dict],
                             key=lambda x: x[1], reverse=True)
    last = None
    for r in range(nrounds):
        ref.run_reassignment(
            sorted_ctg_list, cgl, ctg_group_dict, full_link_dict, linked,
            fa_dict, RE_site_dict, None, group_RE_dict, p.max_ctg_len,
            p.min_RE_sites, p.min_links, p.min_link_density,
            p.min_density_ratio, p.ambiguous_cutoff, p.min_group_len,
            set(), r + 1)
        if r > 0 and last == ctg_group_dict:
            break
        last = ctg_group_dict.copy()
    if rescue:
        ref.run_reassignment(
            sorted_ctg_list, cgl, ctg_group_dict, full_link_dict, linked,
            fa_dict, RE_site_dict, None, group_RE_dict, p.max_ctg_len,
            p.min_RE_sites, p.min_links, p.min_link_density,
            p.min_density_ratio, p.ambiguous_cutoff, p.min_group_len,
            set(), 0)
    parts = {}
    for c, g in ctg_group_dict.items():
        parts.setdefault(g, set()).add(c)
    ungrouped = parts.pop('ungrouped', set())
    return {frozenset(v) for v in parts.values()}, ungrouped


def _run_ours(names, lengths, re_sites, link, clusters, p):
    asm = _make_asm(names, lengths, re_sites)
    ii, jj, ww = [], [], []
    for (a, b), w in link.items():
        ii.append(asm.name2id[a])
        jj.append(asm.name2id[b])
        ww.append(w)
    full = COO(i=np.asarray(ii), j=np.asarray(jj), w=np.asarray(ww))
    init = [[asm.name2id[c] for c in ctgs]
            for _, ctgs in sorted(clusters.items())]
    res = reassign(asm, full, init, params=p)
    parts = {frozenset(asm.names[c] for c in m) for m in res.groups.members}
    ungrouped = {asm.names[c] for c in range(len(asm))
                 if res.groups.ctg_group[c] == -1}
    return parts, ungrouped, res


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_reassign_parity(seed):
    names, lengths, re_sites, link, clusters, chrom = _scenario(seed)
    p = ReassignParams(min_group_len=0, min_RE_sites=5, min_links=5,
                       min_density_ratio=1.5, ambiguous_cutoff=0.9)
    exp_parts, exp_ung = _run_reference(names, lengths, re_sites, link,
                                        clusters, p)
    got_parts, got_ung, _ = _run_ours(names, lengths, re_sites, link,
                                      clusters, p)
    assert got_parts == exp_parts
    assert got_ung == exp_ung


def test_reassign_parity_with_dismissal():
    names, lengths, re_sites, link, clusters, chrom = _scenario(4)
    # a tiny fourth group that must be dismissed (min_group_len in Mbp)
    p = ReassignParams(min_group_len=1.0, min_RE_sites=5, min_links=5,
                       min_density_ratio=1.5, ambiguous_cutoff=0.9)
    clusters['cl_small'] = [clusters['cl0'].pop()]
    exp_parts, exp_ung = _run_reference(names, lengths, re_sites, link,
                                        clusters, p)
    got_parts, got_ung, _ = _run_ours(names, lengths, re_sites, link,
                                      clusters, p)
    assert got_parts == exp_parts
    assert got_ung == exp_ung


def test_reassign_recovers_structure():
    names, lengths, re_sites, link, clusters, chrom = _scenario(7)
    p = ReassignParams(min_group_len=0, min_RE_sites=5, min_links=5,
                       min_density_ratio=1.2, ambiguous_cutoff=0.95)
    got_parts, got_ung, res = _run_ours(names, lengths, re_sites, link,
                                        clusters, p)
    true = {}
    for nme, c in zip(names, chrom):
        true.setdefault(c, set()).add(nme)
    assert got_parts == {frozenset(v) for v in true.values()}
    assert not got_ung
    # group naming convention
    assert all(n.startswith('group') and n.endswith('bp')
               for n in res.groups.names)


def test_ahc_merges_groups():
    names, lengths, re_sites, link, clusters, chrom = _scenario(3)
    # split cl0 into two halves -> 4 groups, AHC should merge back to 3
    half = clusters['cl0'][:3]
    clusters['cl0'] = clusters['cl0'][3:]
    clusters['cl0b'] = half
    # max_ctg_len=0 disables reassignment moves so only AHC can merge
    p = ReassignParams(min_group_len=0, min_RE_sites=5, min_links=5,
                       min_density_ratio=1.2, ambiguous_cutoff=0.95,
                       reassign_nrounds=1, no_additional_rescue=True,
                       max_ctg_len=0, nclusters=3)
    got_parts, got_ung, res = _run_ours(names, lengths, re_sites, link,
                                        clusters, p)
    assert res.hc_applied
    assert len(res.groups.names) == 3
    # the two chrom-0 sub-groups must have been merged by AHC
    merged = next(part for part in got_parts if half[0] in part)
    assert set(clusters['cl0']) | set(half) <= merged


def test_split_clm_file(tmp_path):
    names = ['a', 'b', 'c', 'd']
    asm = _make_asm(names, [100, 200, 300, 400], [2, 3, 4, 5])
    groups = Groups(
        members=[[asm.name2id['a'], asm.name2id['b']],
                 [asm.name2id['c'], asm.name2id['d']]],
        names=['group1_300bp', 'group2_700bp'], lengths=[300, 700],
        ctg_group=np.asarray([0, 0, 1, 1]))
    clm = tmp_path / 'paired_links.clm'
    clm.write_text('a+ b+\t2\t10 10\n'
                   'a+ c-\t2\t20 20\n'
                   'c- d+\t4\t5 5 7 7\n')
    outdir = tmp_path / 'split_clms'
    split_clm_file(str(clm), groups, asm, str(outdir))
    assert (outdir / 'group1_300bp.clm').read_text() == 'a+ b+\t2\t10 10\n'
    assert (outdir / 'group2_700bp.clm').read_text() == 'c- d+\t4\t5 5 7 7\n'
