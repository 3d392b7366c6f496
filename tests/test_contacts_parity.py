"""Parity tests: vectorized ingest vs the reference implementation.

The reference's parse_alignments / stat_fragments / output_clm are
imported (see refbridge) and run on the same simulated data; outputs
must match exactly.
"""

import os
import random
from types import SimpleNamespace

import numpy as np
import pytest

from tests import refbridge
from tests.util import random_genome, random_pairs, write_genome, write_pairs

from haphic_tpu.core.contacts import aggregate
from haphic_tpu.core.fragments import build_fragments
from haphic_tpu.io.fasta import read_fasta
from haphic_tpu.io.links import full_link_dict, ht_link_dict, write_clm
from haphic_tpu.io.pairs import PairsReader

ref_cluster = refbridge.load('HapHiC_cluster')


def _args(flank=0, remove_allelic=0, remove_concentrated=False,
          max_read_pairs=200, nwindows=50):
    return SimpleNamespace(
        flank=flank, remove_allelic_links=remove_allelic,
        remove_concentrated_links=remove_concentrated,
        max_read_pairs=max_read_pairs, min_read_pairs=20, nwindows=nwindows)


def _setup(tmp_path, rng, n_ctg=10, n_pairs=4000):
    ctgs = random_genome(rng, n_ctg=n_ctg)
    fa = tmp_path / 'asm.fa'
    prs = tmp_path / 'hic.pairs'
    write_genome(str(fa), ctgs)
    recs = random_pairs(rng, ctgs, n_pairs=n_pairs)
    write_pairs(str(prs), recs)
    return ctgs, str(fa), str(prs), recs


def _ref_gen(recs, inter_only, fa_dict):
    for rid, a, pa, b, pb in recs:
        if inter_only and a == b:
            continue
        yield a, b, pa - 1, pb - 1


@pytest.mark.parametrize('flank', [0, 3])
def test_parse_alignments_for_ctgs_parity(tmp_path, flank):
    rng = random.Random(7)
    ctgs, fa, prs, recs = _setup(tmp_path, rng)

    # --- reference ---
    fa_dict = ref_cluster.parse_fasta(fa)
    args = _args(flank=flank)
    ctg_len_dict = {c: v[1] for c, v in fa_dict.items()}
    nx_set = set(fa_dict)  # Nx=100 keeps everything
    (r_full, r_flank, r_ht, r_clm, r_ctglink, _r_coord) = \
        ref_cluster.parse_alignments_for_ctgs(
            _ref_gen(recs, True, fa_dict), fa_dict, args, ctg_len_dict,
            nx_set, 'int32', 'int32')

    # --- ours ---
    asm = read_fasta(fa)
    frags = build_fragments(asm, nchrs=1, flank_kbp=flank, Nx=100, bin_size_kbp=0)
    os.chdir(tmp_path)
    ld = aggregate(PairsReader(prs, asm.names), frags, flank_kbp=flank)

    assert full_link_dict(ld, asm.names) == dict(r_full)
    assert ht_link_dict(ld, asm.names) == dict(r_ht)

    mine_flank = {(frags.name_of(i), frags.name_of(j)): int(w)
                  for i, j, w in zip(ld.flank.i, ld.flank.j, ld.flank.w)}
    assert mine_flank == dict(r_flank)

    mine_ctglink = {frags.name_of(i): int(v)
                    for i, v in enumerate(ld.frag_links) if v}
    assert mine_ctglink == dict(r_ctglink)

    # CLM byte parity
    os.makedirs(tmp_path / 'ref', exist_ok=True)
    os.chdir(tmp_path / 'ref')
    ref_cluster.output_clm(r_clm)
    ref_bytes = open('paired_links.clm', 'rb').read()
    os.chdir(tmp_path)
    write_clm(ld.clm, asm.names, 'mine.clm')
    assert open('mine.clm', 'rb').read() == ref_bytes


@pytest.mark.parametrize('bin_size_kbp', [5, 8])
def test_parse_alignments_bins_parity(tmp_path, bin_size_kbp):
    rng = random.Random(11)
    ctgs, fa, prs, recs = _setup(tmp_path, rng, n_ctg=8, n_pairs=6000)

    fa_dict = ref_cluster.parse_fasta(fa)
    args = _args(flank=2)
    (sorted_frag_list, bin_set, bin_size, frag_len_dict, nx_set,
     RE_site_dict, split_ctg_set) = ref_cluster.stat_fragments(
        fa_dict, 'GATC', {}, set(), nchrs=2, flank=2, Nx=100,
        bin_size=bin_size_kbp)

    (r_full, r_flank, r_ht, r_clm, r_fraglink, _coord, _p2f) = \
        ref_cluster.parse_alignments(
            _ref_gen(recs, False, fa_dict), fa_dict, args, bin_size,
            frag_len_dict, nx_set, split_ctg_set, 'int32', 'int32')

    asm = read_fasta(fa)
    frags = build_fragments(asm, nchrs=2, flank_kbp=2, Nx=100,
                            bin_size_kbp=bin_size_kbp)

    # fragment table parity
    assert frags.bin_size == bin_size
    assert set(frags.names) == set(frag_len_dict)
    assert {f: int(l) for f, l in zip(frags.names, frags.frag_len)} == frag_len_dict
    assert {f: int(r) for f, r in zip(frags.names, frags.frag_re)} == RE_site_dict
    assert {frags.names[i] for i in np.nonzero(frags.nx_mask)[0]} == nx_set
    assert {asm.names[c] for c in np.nonzero(frags.split_ctg)[0]} == split_ctg_set

    os.chdir(tmp_path)
    ld = aggregate(PairsReader(prs, asm.names), frags, flank_kbp=2)

    assert full_link_dict(ld, asm.names) == dict(r_full)
    assert ht_link_dict(ld, asm.names) == dict(r_ht)

    mine_flank = {}
    for i, j, w in zip(ld.flank.i, ld.flank.j, ld.flank.w):
        mine_flank[(frags.name_of(i), frags.name_of(j))] = int(w)
    # reference keys may be in string-sorted order; canonicalize both
    canon = lambda d: {tuple(sorted(k)): v for k, v in d.items()}
    assert canon(mine_flank) == canon(dict(r_flank))

    mine_fraglink = {frags.name_of(i): int(v)
                     for i, v in enumerate(ld.frag_links) if v}
    assert mine_fraglink == dict(r_fraglink)

    # CLM byte parity
    os.makedirs(tmp_path / 'ref2', exist_ok=True)
    os.chdir(tmp_path / 'ref2')
    ref_cluster.output_clm(r_clm)
    ref_bytes = open('paired_links.clm', 'rb').read()
    os.chdir(tmp_path)
    write_clm(ld.clm, asm.names, 'mine2.clm')
    assert open('mine2.clm', 'rb').read() == ref_bytes


def test_nx_parity(tmp_path):
    """Nx < 100 path: the seeded-shuffle subset must match exactly."""
    rng = random.Random(3)
    ctgs = random_genome(rng, n_ctg=30, min_len=1000, max_len=9000)
    fa = tmp_path / 'a.fa'
    write_genome(str(fa), ctgs)

    fa_dict = ref_cluster.parse_fasta(str(fa))
    out = ref_cluster.stat_fragments(fa_dict, 'GATC', {}, set(),
                                     nchrs=3, flank=0, Nx=80, bin_size=0)
    nx_set = out[4]

    asm = read_fasta(str(fa))
    frags = build_fragments(asm, nchrs=3, flank_kbp=0, Nx=80, bin_size_kbp=0)
    mine = {frags.names[i] for i in np.nonzero(frags.nx_mask)[0]}
    assert mine == nx_set
