"""Sharded-ingest merge parity: N strided shards must reproduce the
single-host aggregate exactly — link counts, CLM byte output, coord
sampling (haphic_tpu/parallel/ingest.py)."""

import numpy as np
import pytest

from haphic_tpu.core.contacts import aggregate
from haphic_tpu.core.fragments import build_fragments
from haphic_tpu.io.fasta import Assembly
from haphic_tpu.io.links import write_clm
from haphic_tpu.io.pairs import AlignChunk
from haphic_tpu.parallel.ingest import aggregate_shard, merge_link_data


@pytest.fixture(scope='module')
def sim():
    rng = np.random.default_rng(3)
    n_ctg = 10
    names = ['ctg%02d' % t for t in range(n_ctg)]
    lengths = rng.integers(30000, 120000, size=n_ctg).astype(np.int64)
    asm = Assembly(names=names,
                   name2id={c: t for t, c in enumerate(names)},
                   lengths=lengths,
                   re_sites=np.ones(n_ctg, np.int64), seqs=None,
                   input_order={c: t for t, c in enumerate(names)})
    frags = build_fragments(asm, nchrs=2, Nx=100, bin_size_kbp=0,
                            flank_kbp=0)

    def chunks():
        r = np.random.default_rng(5)
        for _ in range(17):          # deliberately not divisible by 4
            sz = int(r.integers(50, 400))
            ref = r.integers(0, n_ctg, sz).astype(np.int32)
            mref = r.integers(0, n_ctg, sz).astype(np.int32)
            pos = r.integers(0, lengths[ref] - 1).astype(np.int64)
            mpos = r.integers(0, lengths[mref] - 1).astype(np.int64)
            yield AlignChunk(ref=ref, mref=mref, pos=pos, mpos=mpos)

    return asm, frags, chunks


@pytest.mark.parametrize('n_shards', [1, 3, 4])
def test_shard_merge_equals_single_host(sim, n_shards):
    asm, frags, chunks = sim
    single = aggregate(chunks(), frags, need_coords=True, keep_clm=True,
                       max_read_pairs=5)
    parts = [aggregate_shard(chunks(), frags, n_shards, h,
                             need_coords=True, max_read_pairs=5)
             for h in range(n_shards)]
    merged = merge_link_data(parts, max_read_pairs=5)

    for field in ('full', 'flank', 'ht'):
        a, b = getattr(single, field), getattr(merged, field)
        assert np.array_equal(a.i, b.i), field
        assert np.array_equal(a.j, b.j), field
        assert np.array_equal(a.w, b.w), field
    assert np.array_equal(single.frag_links, merged.frag_links)

    # CLM records identical per pair (orientation distances as multiset)
    key_s = single.clm.pair_i * len(asm) + single.clm.pair_j
    key_m = merged.clm.pair_i * len(asm) + merged.clm.pair_j
    assert np.array_equal(key_s, key_m)
    for c in range(4):
        o_s = np.lexsort((single.clm.d[c], key_s))
        o_m = np.lexsort((merged.clm.d[c], key_m))
        assert np.array_equal(single.clm.d[c][o_s], merged.clm.d[c][o_m])

    # coords: per-pair totals identical; sampled records identical (the
    # cap keeps the first max_read_pairs in true stream order)
    assert np.array_equal(single.coords.total_counts,
                          merged.coords.total_counts)
    assert np.array_equal(single.coords.ci, merged.coords.ci)
    assert np.array_equal(single.coords.cj, merged.coords.cj)


def test_exchange_pack_roundtrip_includes_coords(sim):
    """The DCN exchange must ship EVERY shard's coords and
    ctg-pair→frag map (not duplicate the local shard's): pack each
    shard, simulate the allgather, unpack, merge — the result must
    equal merging the original parts directly, and match the
    single-host aggregate (ADVICE r2: coords were previously
    duplicated nproc times and other shards' records dropped)."""
    from haphic_tpu.parallel.ingest import (_pack_link_data,
                                            _unpack_link_data)
    asm, frags, chunks = sim
    n_shards = 3
    parts = [aggregate_shard(chunks(), frags, n_shards, h,
                             need_coords=True, max_read_pairs=5,
                             track_ctg_pair_to_frag=True)
             for h in range(n_shards)]
    packed = [_pack_link_data(p) for p in parts]
    assert len({len(a) for a in packed}) == 1
    # simulated allgather: gathered[t][p] = process p's t-th array
    gathered = [[packed[p][t] for p in range(n_shards)]
                for t in range(len(packed[0]))]
    rebuilt = [_unpack_link_data(gathered, p, parts[0])
               for p in range(n_shards)]
    via_exchange = merge_link_data(rebuilt, max_read_pairs=5)
    direct = merge_link_data(parts, max_read_pairs=5)
    single = aggregate(chunks(), frags, need_coords=True, keep_clm=True,
                       max_read_pairs=5, track_ctg_pair_to_frag=True)
    for merged in (via_exchange, direct):
        assert np.array_equal(single.coords.total_counts,
                              merged.coords.total_counts)
        assert np.array_equal(single.coords.ci, merged.coords.ci)
        assert np.array_equal(single.coords.cj, merged.coords.cj)
        assert np.array_equal(single.coords.pair_i, merged.coords.pair_i)
        assert np.array_equal(single.ctg_pair_to_frag.i,
                              merged.ctg_pair_to_frag.i)
        assert np.array_equal(single.ctg_pair_to_frag.j,
                              merged.ctg_pair_to_frag.j)
        assert np.array_equal(single.full.w, merged.full.w)


def test_compaction_parity(sim, tmp_path):
    """Bounded-memory mode (compact_bytes=1 forces a compaction after
    every chunk: count-run collapse + coord cap + CLM spill) must be
    byte-identical to the unbounded path."""
    asm, frags, chunks = sim
    base = aggregate(chunks(), frags, need_coords=True, keep_clm=True,
                     max_read_pairs=5)
    tight = aggregate(chunks(), frags, need_coords=True, keep_clm=True,
                      max_read_pairs=5, compact_bytes=1)
    for field in ('full', 'flank', 'ht'):
        a, b = getattr(base, field), getattr(tight, field)
        assert np.array_equal(a.i, b.i) and np.array_equal(a.w, b.w)
    assert np.array_equal(base.frag_links, tight.frag_links)
    assert np.array_equal(base.coords.total_counts,
                          tight.coords.total_counts)
    assert np.array_equal(base.coords.ci, tight.coords.ci)
    assert np.array_equal(base.coords.cj, tight.coords.cj)
    p1, p2 = tmp_path / 'a.clm', tmp_path / 'b.clm'
    write_clm(base.clm, asm.names, str(p1))
    write_clm(tight.clm, asm.names, str(p2))
    assert p1.read_bytes() == p2.read_bytes()


def test_clm_file_byte_identical_across_shard_counts(sim, tmp_path):
    asm, frags, chunks = sim
    outs = []
    for n_shards in (1, 4):
        parts = [aggregate_shard(chunks(), frags, n_shards, h)
                 for h in range(n_shards)]
        merged = merge_link_data(parts)
        p = tmp_path / 'clm_{}.clm'.format(n_shards)
        write_clm(merged.clm, asm.names, str(p), min_read_pairs=2)
        outs.append(p.read_bytes())
    assert outs[0] == outs[1]

    # and identical to the unsharded aggregate's CLM
    single = aggregate(chunks(), frags, keep_clm=True)
    p = tmp_path / 'clm_single.clm'
    write_clm(single.clm, asm.names, str(p), min_read_pairs=2)
    assert p.read_bytes() == outs[0]
