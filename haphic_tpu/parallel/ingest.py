"""Multi-host sharded alignment ingest.

The reference parses all read pairs in one Python process
(scripts/HapHiC_cluster.py:1596-1752, htslib decoder threads only). The
TPU-native execution model for N hosts:

  1. every host streams the SAME alignment file but consumes only the
     chunks whose global ordinal ≡ its process index (mod N) —
     deterministic, seek-free sharding that works for pairs, bgzipped
     pairs and BAM readers alike;
  2. each host aggregates its shard with the vectorized
     LinkAccumulator (haphic_tpu/core/contacts.py), passing the chunk
     ordinal so CLM/coord insertion-order keys are globally exact;
  3. the per-host partial link tensors are exchanged once over DCN
     (jax.experimental.multihost_utils allgather of the COO arrays —
     O(nnz), nothing scales with read count) and merged on every host
     with `merge_link_data`, which reproduces the single-host result:
     COO counts and CLM byte order exactly; coord-pair sampling keeps
     the first max_read_pairs per pair in true stream order.

Downstream stages (MCL sweep, GA) then shard their own axes over the
global mesh (haphic_tpu/parallel/mesh.py, cluster/sparse_mcl.py).

Use `init_distributed()` (parallel/mesh.py) before any jax call on
multi-host pods.
"""

from __future__ import annotations

import logging
from typing import Iterable, Iterator, List, Optional, Tuple

import numpy as np

from haphic_tpu.core.contacts import (CLMData, COO, CoordPairs,
                                      LinkAccumulator, LinkData)
from haphic_tpu.core.fragments import Fragments
from haphic_tpu.io.pairs import AlignChunk

logger = logging.getLogger(__name__)


def strided_chunks(chunks: Iterable[AlignChunk], n_shards: int,
                   shard_id: int) -> Iterator[Tuple[int, AlignChunk]]:
    """(global ordinal, chunk) for this shard of the stream."""
    for seq, chunk in enumerate(chunks):
        if seq % n_shards == shard_id:
            yield seq, chunk


def aggregate_shard(chunks: Iterable[AlignChunk], frags: Fragments,
                    n_shards: int, shard_id: int, flank_kbp: int = 0,
                    need_coords: bool = False, max_read_pairs: int = 200,
                    keep_clm: bool = True,
                    track_ctg_pair_to_frag: bool = False) -> LinkData:
    """One host's share of the alignment pass."""
    acc = LinkAccumulator(frags, flank_kbp=flank_kbp,
                          need_coords=need_coords,
                          max_read_pairs=max_read_pairs, keep_clm=keep_clm)
    acc.track_ctg_pair_to_frag = track_ctg_pair_to_frag
    for seq, chunk in strided_chunks(chunks, n_shards, shard_id):
        acc.consume(chunk, seq=seq)
    return acc.finalize()


def _merge_coo(parts: List[COO], stride: int) -> COO:
    keys = np.concatenate([p.i * stride + p.j for p in parts]) \
        if parts else np.zeros(0, np.int64)
    w = np.concatenate([p.w for p in parts]) if parts else np.zeros(0)
    order = np.argsort(keys, kind='stable')
    keys, w = keys[order], w[order]
    uk, start = np.unique(keys, return_index=True)
    sw = np.add.reduceat(w, start) if len(w) else w
    return COO(i=uk // stride, j=uk % stride, w=sw)


def _merge_clm(parts: List[CLMData], n: int) -> Optional[CLMData]:
    parts = [p for p in parts if p is not None]
    if not parts:
        return None
    keys = np.concatenate([p.pair_i * n + p.pair_j for p in parts])
    d = np.concatenate([p.d for p in parts], axis=1)
    order = np.argsort(keys, kind='stable')
    keys, d = keys[order], d[:, order]
    # first-seen = min global order key per pair across shards
    uk_list = np.concatenate([p.u_keys for p in parts])
    uf_list = np.concatenate([p.u_first_seen for p in parts])
    o2 = np.lexsort((uf_list, uk_list))
    uk_list, uf_list = uk_list[o2], uf_list[o2]
    uk, first = np.unique(uk_list, return_index=True)
    return CLMData(pair_i=(keys // n).astype(np.int64),
                   pair_j=(keys % n).astype(np.int64), d=d,
                   u_keys=uk, u_first_seen=uf_list[first])


def _merge_coords(parts: List[CoordPairs], n: int,
                  max_read_pairs: int) -> Optional[CoordPairs]:
    parts = [p for p in parts if p is not None]
    if not parts:
        return None
    ckey = np.concatenate([p.pair_i * n + p.pair_j for p in parts])
    cci = np.concatenate([p.ci for p in parts])
    ccj = np.concatenate([p.cj for p in parts])
    have_okey = all(p.okey is not None for p in parts)
    if have_okey:
        okey = np.concatenate([p.okey for p in parts])
        order = np.lexsort((okey, ckey))
        okey = okey[order]
    else:
        order = np.argsort(ckey, kind='stable')
        okey = None
    ckey, cci, ccj = ckey[order], cci[order], ccj[order]

    # true totals (pre-cap) per pair, summed across shards
    tkey = np.concatenate([p.total_counts_i for p in parts])
    tcnt = np.concatenate([p.total_counts for p in parts])
    o2 = np.argsort(tkey, kind='stable')
    tkey, tcnt = tkey[o2], tcnt[o2]
    upk, tstart = np.unique(tkey, return_index=True)
    total = np.add.reduceat(tcnt, tstart) if len(tcnt) else tcnt

    # re-apply the per-pair cap in global stream order
    _, starts, counts = np.unique(ckey, return_index=True,
                                  return_counts=True)
    rank = np.arange(len(ckey)) - np.repeat(starts, counts)
    keep = rank < max_read_pairs
    ckey, cci, ccj = ckey[keep], cci[keep], ccj[keep]
    if okey is not None:
        okey = okey[keep]
    upk2, starts2, cnt2 = np.unique(ckey, return_index=True,
                                    return_counts=True)
    assert np.array_equal(upk, upk2)
    return CoordPairs(pair_i=(ckey // n).astype(np.int64),
                      pair_j=(ckey % n).astype(np.int64),
                      ci=cci, cj=ccj,
                      total_counts_i=upk, total_counts=total,
                      starts=starts2, counts=cnt2,
                      upair_i=(upk // n).astype(np.int64),
                      upair_j=(upk % n).astype(np.int64),
                      okey=okey)


def merge_link_data(parts: List[LinkData],
                    max_read_pairs: int = 200) -> LinkData:
    """Merge per-shard LinkData into the single-host-equivalent result."""
    assert parts
    n = parts[0].n_ctg
    m = parts[0].n_frag
    full = _merge_coo([p.full for p in parts], n)
    flank = _merge_coo([p.flank for p in parts], m)
    ht = _merge_coo([p.ht for p in parts], 2 * n)
    frag_links = np.sum([p.frag_links for p in parts], axis=0)
    clm = _merge_clm([p.clm for p in parts], n)
    coords = _merge_coords([p.coords for p in parts], n, max_read_pairs)
    p2f_parts = [p.ctg_pair_to_frag for p in parts
                 if p.ctg_pair_to_frag is not None]
    p2f = None
    if p2f_parts:
        pf = np.unique(np.concatenate(
            [np.stack([p.i, p.j], axis=1) for p in p2f_parts], axis=0),
            axis=0)
        p2f = COO(i=pf[:, 0], j=pf[:, 1], w=np.ones(len(pf)))
    return LinkData(n_ctg=n, n_frag=m, full=full, flank=flank,
                    frag_links=frag_links, ht=ht, clm=clm, coords=coords,
                    ctg_pair_to_frag=p2f)


# ---------------------------------------------------------------------------
# cross-host exchange
# ---------------------------------------------------------------------------


def _allgather_ragged(arrays: List[np.ndarray]) -> List[List[np.ndarray]]:
    """Allgather variable-length 1-D/2-D arrays across processes over
    DCN. Returns, per input array, the list of every process's copy.
    Single-process: identity."""
    import jax
    if jax.process_count() == 1:
        return [[a] for a in arrays]
    from jax.experimental import multihost_utils as mh
    out: List[List[np.ndarray]] = []
    for a in arrays:
        lead = np.asarray([a.shape[-1]], np.int64)
        sizes = np.asarray(mh.process_allgather(lead)).reshape(-1)
        mx = int(sizes.max())
        pad = [(0, 0)] * (a.ndim - 1) + [(0, mx - a.shape[-1])]
        gathered = np.asarray(mh.process_allgather(np.pad(a, pad)))
        out.append([gathered[p][..., :int(sizes[p])]
                    for p in range(len(sizes))])
    return out


def _pack_link_data(local: LinkData) -> List[np.ndarray]:
    """Flatten one shard's LinkData into the array list that rides the
    DCN allgather. Inverse: _unpack_link_data."""
    def coo_arrays(c: COO):
        return [c.i.astype(np.int64), c.j.astype(np.int64),
                c.w.astype(np.float64)]

    arrays = (coo_arrays(local.full) + coo_arrays(local.flank)
              + coo_arrays(local.ht) + [local.frag_links])
    if local.clm is not None:
        arrays += [local.clm.pair_i, local.clm.pair_j, local.clm.d,
                   local.clm.u_keys, local.clm.u_first_seen]
    if local.coords is not None:
        c = local.coords
        # okey (global stream-order key) is required to re-apply the
        # per-pair cap in true file order after the merge; sharded
        # ingest records it whenever the shard consumed any chunk — a
        # shard whose stride got zero chunks has empty records and an
        # empty key array stands in
        okey = c.okey
        if okey is None and len(c.ci) == 0:
            okey = np.zeros(0, np.int64)
        assert okey is not None, \
            'coords exchange requires stream-order keys (okey)'
        arrays += [c.pair_i.astype(np.int64), c.pair_j.astype(np.int64),
                   c.ci.astype(np.int64), c.cj.astype(np.int64),
                   okey.astype(np.int64),
                   c.total_counts_i.astype(np.int64),
                   c.total_counts.astype(np.int64)]
    if local.ctg_pair_to_frag is not None:
        arrays += [local.ctg_pair_to_frag.i.astype(np.int64),
                   local.ctg_pair_to_frag.j.astype(np.int64)]
    return arrays


def _unpack_link_data(gathered: List[List[np.ndarray]], p: int,
                      local: LinkData) -> LinkData:
    """Rebuild process p's LinkData from the gathered array lists."""
    t = 0

    def take():
        nonlocal t
        v = gathered[t][p]
        t += 1
        return v

    full = COO(take(), take(), take())
    flank = COO(take(), take(), take())
    ht = COO(take(), take(), take())
    fl = take()
    clm = None
    if local.clm is not None:
        clm = CLMData(pair_i=take(), pair_j=take(), d=take(),
                      u_keys=take(), u_first_seen=take())
    coords = None
    if local.coords is not None:
        pi, pj, ci, cj, okey, tci, tc = (take(), take(), take(), take(),
                                         take(), take(), take())
        coords = CoordPairs(pair_i=pi, pair_j=pj, ci=ci, cj=cj,
                            total_counts_i=tci, total_counts=tc,
                            starts=None, counts=None,
                            upair_i=None, upair_j=None, okey=okey)
    p2f = None
    if local.ctg_pair_to_frag is not None:
        i, j = take(), take()
        p2f = COO(i=i, j=j, w=np.ones(len(i)))
    return LinkData(n_ctg=local.n_ctg, n_frag=local.n_frag,
                    full=full, flank=flank, frag_links=fl,
                    ht=ht, clm=clm, coords=coords,
                    ctg_pair_to_frag=p2f)


def exchange_link_data(local: LinkData,
                       max_read_pairs: int = 200) -> LinkData:
    """Allgather every shard's partial LinkData over DCN and merge.
    Each host ends up with the identical, complete link tensors —
    including coord pairs (allelic/concentrated pruning evidence,
    reference record_coord_pairs scripts/HapHiC_cluster.py:454-471)
    and the ctg-pair→frag-pair map, which previously rode along from
    the local shard only."""
    import jax
    nproc = jax.process_count()
    if nproc == 1:
        return local
    gathered = _allgather_ragged(_pack_link_data(local))
    parts = [_unpack_link_data(gathered, p, local) for p in range(nproc)]
    return merge_link_data(parts, max_read_pairs=max_read_pairs)


def distributed_aggregate(chunks: Iterable[AlignChunk], frags: Fragments,
                          flank_kbp: int = 0, need_coords: bool = False,
                          max_read_pairs: int = 200, keep_clm: bool = True,
                          track_ctg_pair_to_frag: bool = False) -> LinkData:
    """Multi-host alignment pass: shard by process index, aggregate
    locally, exchange + merge globally. Drop-in replacement for
    core.contacts.aggregate on pods."""
    import jax
    nproc = jax.process_count()
    pid = jax.process_index()
    local = aggregate_shard(chunks, frags, nproc, pid,
                            flank_kbp=flank_kbp, need_coords=need_coords,
                            max_read_pairs=max_read_pairs,
                            keep_clm=keep_clm,
                            track_ctg_pair_to_frag=track_ctg_pair_to_frag)
    if nproc == 1:
        return local
    return exchange_link_data(local, max_read_pairs=max_read_pairs)
