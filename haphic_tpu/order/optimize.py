"""Tour optimization: the TPU-native replacement for the bundled
`allhic optimize` Go binary (invoked at scripts/HapHiC_sort.py:618-642;
the binary itself is a stripped large blob in the reference repo).

The objective is reconstructed from the CLM file semantics
(scripts/HapHiC_cluster.py:376-401): a CLM record stores, for one read
pair spanning contigs a and b (a < b by name) and each of the four
orientation combinations, the distance the read pair would span if the
two contigs were placed adjacently in that orientation:

    d(+,+) = len_a - p_a + p_b          d(-,+) = p_a + p_b
    d(+,-) = len_a - p_a + len_b - p_b  d(-,-) = p_a + len_b - p_b

For a full tour the implied genomic separation of the read pair is
``d[combo] + G`` where G is the total length of contigs strictly between
a and b, and combo is the orientation pair as seen with a first —
placing b first is equivalent to complementing both orientations
(combo -> 3 - combo). The tour score is

    score(tour) = sum_r 1 / max(d[combo_r] + G_r, 1)

i.e. links act as springs with inverse-distance energy; maximizing the
score pulls strongly linked contigs together, the same objective family
ALLHiC's GA optimizes. Scores are comparable only within one group.

TPU design (this is hot loop 3 of the reference, run per group):
  * scoring is fully batched: a (npop, k) population of permutations and
    orientations is scored in one jit call; the R CLM records stream
    through a lax.scan in fixed-size chunks so memory stays
    O(npop * chunk) while the arithmetic (gathers + reciprocal + sum)
    vectorizes on the VPU;
  * the evolutionary loop is a jit-compiled lax.fori_loop running
    ``log_every`` generations per device round-trip: mutation (swap /
    segment inversion / block rotation / orientation flip) is pure index
    arithmetic on iota masks — no dynamic shapes;
  * groups are independent (reference uses a process pool); the driver
    batches same-size groups and vmaps when there are many chromosomes.

The `.tour` file output keeps the reference format: '>INIT' line after
fast sort, '>GA<gen>-<score>' checkpoint headers every `log_every`
generations, final ordering on the last line
(parity: scripts/HapHiC_sort.py:440-453, simulation/score_statistics.py:5-18).
"""

from __future__ import annotations

import ctypes
import functools
import logging
import os

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:      # pallas optional: the XLA score path remains
    pl = None
    pltpu = None

logger = logging.getLogger(__name__)

CHUNK = 1 << 14          # max CLM records per scan step
MIN_CHUNK = 1 << 9       # smallest padded chunk (shape-bucketing floor)

# Work (npop * ngen * total CLM records) below which the native C++ GA
# (native/tour_ga.cpp) beats the device path. Measured on the v5e
# tunnel backend (round 3, after rewriting the score AND the
# mutate/crossover/selection gathers as one-hot matmuls / sorts): the
# device GA sustains ~7.6e8 record-evaluations/s hot vs the native
# kernel's ~2.8e8/s on 2 host threads — ~2.7x per chip, and it shards
# over meshes with zero collectives (optimize_tours(mesh=...)). What
# the device pays up front is one XLA compile per bucket shape
# (~20-40 s warm cache, worse cold on the tunnel): break-even is
# work ≈ compile / (1/2.8e8 - 1/7.6e8) ≈ 1e10. Below that, native;
# above, device.
NATIVE_MAX_WORK = float(os.environ.get('HAPHIC_GA_NATIVE_MAX_WORK', 1e10))

_native = None
_native_checked = False


def _load_native():
    from haphic_tpu.utils.nativelib import load_shared
    lib = load_shared('libtourga.so', ['tour_ga.cpp'])
    if lib is None:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.tour_ga_run.restype = ctypes.c_int
    lib.tour_ga_run.argtypes = [
        ctypes.c_int, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), i32p, i32p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
        i32p, i32p, ctypes.c_int,
        i32p, i32p, ctypes.POINTER(ctypes.c_double),
        i32p, ctypes.POINTER(ctypes.c_double)]
    return lib


def native_lib():
    global _native, _native_checked
    if not _native_checked:
        _native = _load_native()
        _native_checked = True
    return _native


def _optimize_native(problem: 'TourProblem', npop: int, ngen: int,
                     mutprob: float, seed: int, hot_start, log_every: int,
                     xoprob: float = 0.3, nthreads: int = 0) -> 'GAResult':
    """One group on the native C++ GA kernel (small-problem path)."""
    lib = native_lib()
    k = problem.k
    if hot_start is not None:
        init_order = np.ascontiguousarray(hot_start[0], dtype=np.int32)
        init_ori = np.ascontiguousarray(hot_start[1], dtype=np.int32)
        shuffle = 0
    else:
        init_order = np.arange(k, dtype=np.int32)
        init_ori = np.zeros(k, dtype=np.int32)
        shuffle = 1
    lengths = np.ascontiguousarray(problem.lengths, dtype=np.int64)
    pa = np.ascontiguousarray(problem.pair_a, dtype=np.int32)
    pb = np.ascontiguousarray(problem.pair_b, dtype=np.int32)
    d = np.ascontiguousarray(problem.d, dtype=np.float32)
    w = np.ascontiguousarray(problem.w, dtype=np.float32)
    out_order = np.empty(k, dtype=np.int32)
    out_ori = np.empty(k, dtype=np.int32)
    out_score = ctypes.c_double()
    nh = ngen // max(log_every, 1) + 2
    hist_gen = np.empty(nh, dtype=np.int32)
    hist_score = np.empty(nh, dtype=np.float64)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    n = lib.tour_ga_run(
        k, problem.n_records,
        ptr(lengths, ctypes.c_int64), ptr(pa, ctypes.c_int32),
        ptr(pb, ctypes.c_int32), ptr(d, ctypes.c_float),
        ptr(w, ctypes.c_float),
        npop, ngen, mutprob, xoprob, seed, max(log_every, 1), nthreads,
        ptr(init_order, ctypes.c_int32), ptr(init_ori, ctypes.c_int32),
        shuffle,
        ptr(out_order, ctypes.c_int32), ptr(out_ori, ctypes.c_int32),
        ctypes.byref(out_score),
        ptr(hist_gen, ctypes.c_int32),
        ptr(hist_score, ctypes.c_double))
    history = [(int(hist_gen[i]), float(hist_score[i])) for i in range(n)]
    return GAResult(order=out_order, ori=out_ori,
                    score=float(out_score.value), history=history)


def _effective_chunk(n_records: int, chunk: int = CHUNK) -> int:
    """Scan-chunk size adapted to the group's record count. Groups with
    few CLM records must not pad to the maximum chunk: the score scan
    does O(npop * chunk) gather work per generation, so a 300-record
    group padded to 16384 wastes ~50x compute (measured 92 s for a
    5-contig group's 5000 generations on the v5e — pure padding)."""
    return min(chunk, _bucket(max(n_records, 1), MIN_CHUNK))


@dataclass
class TourProblem:
    """Per-group scoring data, record-level.

    lengths: int64[k] contig lengths (local order = group order)
    pair_a/pair_b: int32[R] local contig indices (a < b)
    d: float32[4, R] orientation-combination distances
    w: float32[R] record weights (collapsed duplicate counts)
    """
    lengths: np.ndarray
    pair_a: np.ndarray
    pair_b: np.ndarray
    d: np.ndarray
    w: np.ndarray

    @property
    def k(self) -> int:
        return len(self.lengths)

    @property
    def n_records(self) -> int:
        return len(self.pair_a)


def build_problem(ctg_ids: Sequence[int], lengths_all: np.ndarray,
                  clm_pair_i: np.ndarray, clm_pair_j: np.ndarray,
                  clm_d: np.ndarray) -> TourProblem:
    """Select the CLM records of one group and relabel to local ids.

    ``ctg_ids`` must be the group's contig ordering used everywhere else
    (fast_sort.GroupOrderData.ctg_ids). Duplicate records (same pair and
    identical distance 4-tuple) are collapsed into weights.
    """
    ctg_ids = np.asarray(ctg_ids, dtype=np.int64)
    n_all = int(lengths_all.shape[0])
    lookup = np.full(n_all, -1, dtype=np.int64)
    lookup[ctg_ids] = np.arange(len(ctg_ids))
    a = lookup[clm_pair_i]
    b = lookup[clm_pair_j]
    sel = (a >= 0) & (b >= 0)
    a, b = a[sel], b[sel]
    d = clm_d[:, sel]
    # collapse duplicates
    rec = np.concatenate([a[None], b[None], d], axis=0)
    uniq, inv, cnt = np.unique(rec.T, axis=0, return_inverse=True,
                               return_counts=True)
    return TourProblem(
        lengths=lengths_all[ctg_ids].astype(np.int64),
        pair_a=uniq[:, 0].astype(np.int32),
        pair_b=uniq[:, 1].astype(np.int32),
        d=uniq[:, 2:6].T.astype(np.float32),
        w=cnt.astype(np.float32))


def _bucket(n: int, base: int) -> int:
    """Round up to base * 2^k — bounds the number of distinct compiled
    shapes to O(log n) across groups of different sizes."""
    out = base
    while out < n:
        out *= 2
    return out


def _record_bucket(n: int, chunk: int) -> int:
    """Padded record count for bucketing. Small groups round to the
    next power of two (few distinct compiled shapes); past 8192
    records the rounding switches to quarter-octave steps (m/8 of the
    next power of two, m in 5..8) — a pure power-of-two pad costs up
    to 2x score work per generation (the score scan is O(npop * Rp)),
    measured as ~45% of the round-3 device GA at R=16.8k padded to
    32768."""
    p = _bucket(max(n, 1), MIN_CHUNK)
    if p <= max(chunk, 8192):
        return p
    q = p // 8
    return -(-n // q) * q


def _divisor_chunk(Rp: int, c: int) -> int:
    """Largest scan chunk <= c that divides Rp (Rp itself when c
    covers it): quarter-octave buckets are m * 2^k, so a power-of-two
    divisor always exists down to MIN_CHUNK."""
    if c >= Rp:
        return Rp
    d = MIN_CHUNK
    while d * 2 <= c and Rp % (d * 2) == 0:
        d *= 2
    return d


def _pad_records(p: TourProblem, chunk: int):
    R = p.n_records
    Rp = _record_bucket(max(R, 1), chunk)
    pad = Rp - R
    pa = np.pad(p.pair_a, (0, pad))
    pb = np.pad(p.pair_b, (0, pad))
    d = np.pad(p.d, ((0, 0), (0, pad)))
    w = np.pad(p.w, (0, pad))          # zero weight => no contribution
    return pa, pb, d, w, Rp


@functools.partial(jax.jit, static_argnames=('chunk',))
def _score_population(order, ori, lengths, pa, pb, d, w, chunk: int):
    """Score a population of tours.

    order: int32 (P, k) — contig local id at each tour slot
    ori:   int32 (P, k) — orientation bit at each slot (1 = '-')
    Returns float32 (P,) scores.

    TPU notes (measured on v5e at 8 groups x 100 pop x 16k records):
      * the per-contig tables are gathered per record through ONE-HOT
        MATMULS on the MXU — the three tables (slot, start, orientation)
        stack into a (3P, k) operand so each record side costs a single
        (3P, k) @ (k, chunk) matmul. Per-element gather HLOs for the
        same access pattern cost ~2x more; the original
        cd[combo, iota] 2-D gather alone cost 180 ms/generation (~90%
        of the round-2 device GA), vs ~9 ms for this whole function.
      * Precision.HIGHEST keeps the matmul inputs f32: slot ids and
        orientations must stay exact (they feed comparisons), and
        one-hot rows sum exactly one product so results are exact for
        ints < 2^24.
      * the orientation-combination distance is a 4-way masked select.
    """
    P, k = order.shape
    lengths = lengths.astype(jnp.float32)
    L_at_slot = lengths[order]                         # (P, k)
    starts = jnp.cumsum(L_at_slot, axis=1) - L_at_slot  # (P, k) slot offsets
    # invert the permutation: pos_of[p, c] = slot of contig c (argsort
    # of a permutation = its inverse; avoids a TPU scatter)
    pos_of = jnp.argsort(order, axis=1).astype(jnp.int32)
    start_of = jnp.take_along_axis(starts, pos_of, axis=1)  # (P, k) by contig
    ori_of = jnp.take_along_axis(ori, pos_of, axis=1)       # (P, k) by contig
    T = jnp.concatenate([pos_of.astype(jnp.float32), start_of,
                         ori_of.astype(jnp.float32)], axis=0)  # (3P, k)

    nchunks = pa.shape[0] // chunk

    def body(carry, xs):
        cpa, cpb, cd, cw = xs                          # (chunk,), (4, chunk)
        oh_a = jax.nn.one_hot(cpa, k, dtype=jnp.float32)   # (chunk, k)
        oh_b = jax.nn.one_hot(cpb, k, dtype=jnp.float32)
        # HIGHEST is required: at HIGH (3-pass bf16) the gathered
        # start offsets pick up absolute errors of hundreds of bp,
        # which destroys the contributions of adjacent-pair records
        # (gap ~0, 1/max(gap,1)) — the records that drive ordering
        # quality (measured: 3.5% total-score drift vs the exact
        # oracle, concentrated on gap<500 records)
        ga = jnp.dot(T, oh_a.T, precision=lax.Precision.HIGHEST)
        gb = jnp.dot(T, oh_b.T, precision=lax.Precision.HIGHEST)
        pos_a, sa, oa = ga[:P], ga[P:2 * P], ga[2 * P:]    # (P, chunk)
        pos_b, sb, ob = gb[:P], gb[P:2 * P], gb[2 * P:]
        pos_a = jnp.round(pos_a)
        pos_b = jnp.round(pos_b)
        la = lengths[cpa][None, :]
        lb = lengths[cpb][None, :]
        a_first = pos_a < pos_b
        gap = jnp.where(a_first, sb - (sa + la), sa - (sb + lb))
        combo = jnp.round(2.0 * oa + ob).astype(jnp.int32)
        combo = jnp.where(a_first, combo, 3 - combo)   # (P, chunk)
        dval = (jnp.where(combo == 0, cd[0][None, :], 0.0)
                + jnp.where(combo == 1, cd[1][None, :], 0.0)
                + jnp.where(combo == 2, cd[2][None, :], 0.0)
                + jnp.where(combo == 3, cd[3][None, :], 0.0))
        dist = jnp.maximum(gap + dval, 1.0)
        contrib = (cw[None, :] / dist).sum(axis=1)
        return carry + contrib, None

    xs = (pa.reshape(nchunks, chunk), pb.reshape(nchunks, chunk),
          d.reshape(4, nchunks, chunk).transpose(1, 0, 2),
          w.reshape(nchunks, chunk))
    total, _ = lax.scan(body, jnp.zeros((P,), jnp.float32), xs)
    return total


_SCORE_BLK = 1024


def _use_pallas() -> bool:
    """Pallas score kernel on real TPU backends; interpret-mode
    elsewhere is slower than the matmul formulation, so CPU runs keep
    the XLA path. HAPHIC_NO_PALLAS=1 forces the XLA path."""
    if os.environ.get('HAPHIC_NO_PALLAS'):
        return False
    return jax.default_backend() not in ('cpu',)


def _score_kernel(t_ref, pa_ref, pb_ref, d_ref, w_ref, o_ref):
    """One (group, record-block) grid step of the tour score.

    The tour tables live in VMEM for the whole block: rows of t_ref
    are [pos_of (Pp) | start_of (Pp) | ori_of (Pp) | lengths (1)] by
    contig column. The per-record gather is a one-hot matmul on the
    MXU whose operands and results never leave VMEM — the XLA
    formulation of the same math streamed ~0.5 GB of one-hot and
    gather intermediates through HBM per generation, which dominated
    the device GA (measured 13.4 ms/score at G=8, P=100, R=32k; this
    kernel's HBM traffic is the record block itself, ~28 bytes/record).

    Record blocks come tiled as (8, 128) = 1024 records (the Mosaic
    minimum f32 tile); the 8 sublane rows ride the matmul batch
    dimension and the per-row partial scores accumulate into an
    (8, P) output summed outside."""
    T = t_ref[0]                       # (rows, k) = (3*Pp+8, k)
    rows = T.shape[0]
    Pp = (rows - 8) // 3
    k = T.shape[1]
    cpa = pa_ref[0, 0]                 # (8, b8)
    cpb = pb_ref[0, 0]
    cd = d_ref[0, :, 0]                # (4, 8, b8)
    cw = w_ref[0, 0]                   # (8, b8)
    b8 = cpa.shape[1]
    kcol = lax.broadcasted_iota(jnp.int32, (8, k, b8), 1)
    oh_a = (kcol == cpa[:, None, :]).astype(jnp.float32)   # (8, k, 128)
    oh_b = (kcol == cpb[:, None, :]).astype(jnp.float32)
    dims = (((1,), (1,)), ((), ()))    # T (rows,k) x oh (8,k,128)
    # HIGHEST: the MXU default quantizes operands to bf16, which
    # mangles the gathered start offsets by hundreds of bp — exactly
    # the adjacent-pair records (gap ~0) that drive ordering quality
    ga = lax.dot_general(T, oh_a, dimension_numbers=dims,
                         precision=lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
    gb = lax.dot_general(T, oh_b, dimension_numbers=dims,
                         precision=lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
    # ga: (rows, 8, 128)
    pos_a = jnp.round(ga[0:Pp])                            # (Pp, 8, 128)
    sa = ga[Pp:2 * Pp]
    oa = ga[2 * Pp:3 * Pp]
    la = ga[3 * Pp:3 * Pp + 1]                             # (1, 8, 128)
    pos_b = jnp.round(gb[0:Pp])
    sb = gb[Pp:2 * Pp]
    ob = gb[2 * Pp:3 * Pp]
    lb = gb[3 * Pp:3 * Pp + 1]
    a_first = pos_a < pos_b
    gap = jnp.where(a_first, sb - (sa + la), sa - (sb + lb))
    ca = jnp.round(oa)
    cb = jnp.round(ob)
    # d[combo] with combo = 2*ca+cb (a first) or its complement,
    # as fused arithmetic instead of a gather
    d0, d1, d2, d3 = cd[0], cd[1], cd[2], cd[3]            # (8, 128)
    swap = jnp.where(a_first, 0.0, 1.0)
    ca2 = ca + swap - 2.0 * ca * swap  # ca XOR swap
    cb2 = cb + swap - 2.0 * cb * swap
    dval = (d0[None] * (1 - ca2) * (1 - cb2)
            + d1[None] * (1 - ca2) * cb2
            + d2[None] * ca2 * (1 - cb2)
            + d3[None] * ca2 * cb2)
    dist = jnp.maximum(gap + dval, 1.0)
    contrib = (cw[None] / dist).sum(axis=2)                # (Pp, 8)
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    o_ref[0] = o_ref[0] + contrib.T                        # (8, Pp)


def _build_tables(order, ori, lengths):
    """Per-contig tour tables for the score kernel, stacked (G, rows,
    k): rows = [slot of contig (Pp) | start offset (Pp) |
    orientation (Pp) | contig length (1) | zero padding (7)]."""
    G, P, k = order.shape
    Lf = lengths.astype(jnp.float32)                       # (G, k)
    L_slot = jax.vmap(lambda Lg, og: Lg[og])(Lf, order)    # (G, P, k)
    starts = jnp.cumsum(L_slot, axis=2) - L_slot
    pos_of = jnp.argsort(order, axis=2).astype(jnp.int32)  # (G, P, k)
    start_of = jnp.take_along_axis(starts, pos_of, axis=2)
    ori_of = jnp.take_along_axis(ori, pos_of, axis=2)
    T = jnp.concatenate([
        pos_of.astype(jnp.float32), start_of,
        ori_of.astype(jnp.float32),
        Lf[:, None, :],
        jnp.zeros((G, 7, k), jnp.float32)], axis=1)        # (G, 3P+8, k)
    return T


@functools.partial(jax.jit, static_argnames=('blk', 'interpret'))
def _score_stacked_pallas(order, ori, lengths, pa, pb, d, w,
                          blk: int = _SCORE_BLK,
                          interpret: bool = False):
    """(G, P) scores via the Pallas kernel, grid (G, R/blk). Records
    must pad to a multiple of 1024 (they pad to >= MIN_CHUNK=512 and
    power-of-two/quarter-octave sizes, so any Rp >= 1024 qualifies;
    smaller problems take the XLA path)."""
    G, P, k = order.shape
    R = pa.shape[1]
    blk = min(blk, R)
    while R % blk:
        blk //= 2
    nblk = R // blk
    b8 = blk // 8
    T = _build_tables(order, ori, lengths)
    rows = T.shape[1]
    pa5 = pa.reshape(G, nblk, 8, b8)
    pb5 = pb.reshape(G, nblk, 8, b8)
    d5 = d.reshape(G, 4, nblk, 8, b8)
    w5 = w.reshape(G, nblk, 8, b8)
    out = pl.pallas_call(
        _score_kernel,
        out_shape=jax.ShapeDtypeStruct((G, 8, P), jnp.float32),
        grid=(G, nblk),
        in_specs=[
            pl.BlockSpec((1, rows, k), lambda g, r: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, b8), lambda g, r: (g, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, b8), lambda g, r: (g, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 1, 8, b8), lambda g, r: (g, 0, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, b8), lambda g, r: (g, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, P), lambda g, r: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(T, pa5, pb5, d5, w5)
    return out.sum(axis=1)


def _take_rows(vals, idx):
    """vals[idx] for a row block — as a one-hot matmul on the MXU.
    TPU gather HLOs on small (P, k) tensors cost milliseconds each
    (they dominated the evolve loop: ~22 of 25 ms/generation across
    mutate/crossover/selection); a (m, n) one-hot times (n, ...) is
    microseconds. Exact for integer values < 2^24 (one-hot rows select
    exactly one product; Precision.HIGHEST keeps f32 operands)."""
    oh = jax.nn.one_hot(idx, vals.shape[0], dtype=jnp.float32)
    flat = vals.reshape(vals.shape[0], -1).astype(jnp.float32)
    out = jnp.dot(oh, flat, precision=lax.Precision.HIGHEST)
    return out.reshape(idx.shape[0], *vals.shape[1:]).astype(vals.dtype)


def _take_along(vals, idx):
    """out[p, i] = vals[p, idx[p, i]] — batched one-hot einsum twin of
    take_along_axis (see _take_rows for why)."""
    oh = jax.nn.one_hot(idx, vals.shape[1], dtype=jnp.float32)
    out = jnp.einsum('pij,pj->pi', oh, vals.astype(jnp.float32),
                     precision=lax.Precision.HIGHEST)
    return out.astype(vals.dtype)


def _sample_moves(key, P, k, mutprob, local_frac=0.5):
    """Sample one mutation per individual: (do, op, i, j, t) with
    op in {0 swap, 1 inversion of [i,j], 2 rotation of [i,t) by j-i,
    3 orientation flip of [i,j]}. A ``local_frac`` share of the moves
    is local (geometric span, mean ~4): near-optimal tours need small
    repairs far more often than global rearrangements."""
    keys = jax.random.split(key, 7)
    do = jax.random.uniform(keys[0], (P,)) < mutprob
    op = jax.random.randint(keys[1], (P,), 0, 4)
    e1 = jax.random.randint(keys[2], (P,), 0, k)
    e2 = jax.random.randint(keys[3], (P,), 0, k)
    e3 = jax.random.randint(keys[4], (P,), 0, k)
    i = jnp.minimum(e1, e2)
    j = jnp.maximum(e1, e2)
    local = jax.random.uniform(keys[5], (P,)) < local_frac
    span = 1 + jnp.floor(
        jnp.log(1.0 - jax.random.uniform(keys[6], (P,)))
        / jnp.log(0.75)).astype(jnp.int32)
    j_local = jnp.minimum(e1 + span, k - 1)
    i = jnp.where(local, e1, i)
    j = jnp.where(local, jnp.maximum(j_local, e1), j)
    e3 = jnp.where(local, j, e3)
    t = jnp.maximum(j, e3)
    return do, op, i, j, t


def _move_src(do, op, i, j, t, k):
    """Slot-level source indices of one move: new[idx] = old[src[idx]],
    plus the orientation-flip mask (inversion and op 3 flip the span).
    Pure index arithmetic on iota masks — no dynamic shapes."""
    P = do.shape[0]
    idx = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), (P, k))
    ii = i[:, None]
    jj = j[:, None]
    tt = t[:, None]

    # swap i <-> j
    src_swap = jnp.where(idx == ii, jj, jnp.where(idx == jj, ii, idx))

    # inversion of [i, j]
    in_span = (idx >= ii) & (idx <= jj)
    src_inv = jnp.where(in_span, ii + jj - idx, idx)

    # block rotation of [i, t) by (j - i): requires i <= j <= t
    span = jnp.maximum(tt - ii, 1)
    in_rot = (idx >= ii) & (idx < tt)
    src_rot = jnp.where(in_rot, ii + (idx - ii + (jj - ii)) % span, idx)

    src = jnp.where(op[:, None] == 0, src_swap,
                    jnp.where(op[:, None] == 1, src_inv,
                              jnp.where(op[:, None] == 2, src_rot, idx)))
    src = jnp.where(do[:, None], src, idx)
    flip = do[:, None] & in_span & ((op[:, None] == 1) | (op[:, None] == 3))
    return src, flip


def _permute_tables(stacked, src):
    """new[p, c, idx] = stacked[p, c, src[p, idx]] as a one-hot matmul
    (see _take_rows for why gathers are avoided). Values must be exact
    in f32 (ints < 2^24, or lengths already rounded to f32)."""
    oh = jax.nn.one_hot(src, stacked.shape[2], dtype=jnp.float32)
    return jnp.einsum('pij,pcj->pci', oh, stacked.astype(jnp.float32),
                      precision=lax.Precision.HIGHEST)


def _mutate(key, order, ori, mutprob):
    """One mutation per individual (see _sample_moves), applied with
    probability ``mutprob`` (else identity)."""
    P, k = order.shape
    do, op, i, j, t = _sample_moves(key, P, k, mutprob)
    src, flip = _move_src(do, op, i, j, t, k)
    both = jnp.stack([order, ori], axis=1)             # (P, 2, k)
    g = _permute_tables(both, src).astype(order.dtype)
    new_order, new_ori = g[:, 0], g[:, 1]
    new_ori = jnp.where(flip, 1 - new_ori, new_ori)
    return new_order, new_ori


def _ox_crossover(key, order, ori, xoprob):
    """Order crossover (OX1), vectorized over the population.

    Each individual crosses with a uniformly chosen partner: the child
    keeps this individual's genes on a random slot span [i, j] and fills
    the remaining slots with the partner's other genes in partner order
    (orientations travel with their source gene). Pure gather/scatter +
    cumsum ranking — no dynamic shapes.
    """
    P, k = order.shape
    keys = jax.random.split(key, 4)
    do = jax.random.uniform(keys[0], (P,)) < xoprob
    partner = jax.random.randint(keys[1], (P,), 0, P)
    e1 = jax.random.randint(keys[2], (P,), 0, k)
    e2 = jax.random.randint(keys[3], (P,), 0, k)
    i = jnp.minimum(e1, e2)[:, None]
    j = jnp.maximum(e1, e2)[:, None]
    idx = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), (P, k))
    in_span = (idx >= i) & (idx <= j)

    # every gather/scatter here runs as argsort / one-hot matmul /
    # sort-compaction — TPU gather-scatter HLOs at these shapes cost
    # milliseconds each (see _take_rows)
    pos_a = jnp.argsort(order, axis=-1).astype(jnp.int32)
    bboth = _take_rows(jnp.stack([order, ori], axis=1), partner)
    b_order, b_ori = bboth[:, 0], bboth[:, 1]
    pos_in_a = _take_along(pos_a, b_order)
    keep = ~((pos_in_a >= i) & (pos_in_a <= j))        # partner genes
    b_rank = jnp.cumsum(keep, axis=1) - keep           # outside A's span
    slot_rank = jnp.cumsum(~in_span, axis=1) - (~in_span)
    buf_idx = jnp.where(keep, b_rank, k).astype(jnp.int32)
    # compact the kept partner genes to the front (ascending b_rank)
    _, so, sr = lax.sort((buf_idx, b_order, b_ori), num_keys=1)
    fill = _take_along(so, slot_rank)
    fillo = _take_along(sr, slot_rank)
    child = jnp.where(in_span, order, fill)
    child_ori = jnp.where(in_span, ori, fillo)
    child = jnp.where(do[:, None], child, order)
    child_ori = jnp.where(do[:, None], child_ori, ori)
    return child, child_ori


# ---------------------------------------------------------------------------
# Delta-scored evolution (round-5): the score of a mutated tour is
# recomputed from CACHED per-record endpoint state updated in closed
# form, never by re-gathering the per-contig tables through one-hot
# matmuls. Every mutation op (swap / inversion / rotation / flip)
# permutes only the slots inside its span and PRESERVES THE TOTAL SPAN
# LENGTH, so slots outside the span keep their start offsets — the new
# (slot, start, orientation) of a record endpoint is pure arithmetic on
# its old cached values plus five per-individual scalars read from the
# slot-start table. This turns the per-generation cost from
# O(P * k * R) MXU gather-matmul FLOPs into O(P * R) VPU elementwise
# work bounded by HBM traffic over the caches (measured: the full
# rescore was ~90% of the round-4 device GA at k=256).
#
# The population becomes P independent greedy hill climbers between
# sync points (mutate -> delta rescore -> accept iff not worse); each
# log_every window opens with ONE full-scored (mu+lambda) generation —
# OX crossover, full rescore, top-P selection — which mixes rows,
# restores selection pressure, and rebuilds the caches from scratch
# (bounding f32 drift of the incrementally-updated start offsets).
# Matches the role of allhic's GA at scripts/HapHiC_sort.py:618-642.
# ---------------------------------------------------------------------------


def _contrib_from_cache(posA, sA, oA, posB, sB, oB, la, lb, d, w):
    """Per-record score contributions from cached endpoint state.
    posA/posB int32 (P, R) slots; sA/sB INT32 (P, R) start offsets
    (exact bp — f32 offsets carry ulp ~64 bp at chromosome scale,
    and that rounding noise on adjacent-pair records is larger than
    real long-range score deltas, which sent the delta hill climb
    chasing phantoms: measured hot-start Spearman 0.54 at k=1000
    with f32 caches, 1.0 with exact int32); oA/oB int32 (P, R)
    orientations; la/lb int32 (R,) contig lengths; d f32 (4, R);
    w f32 (R,). Same arithmetic as _score_population's scan body
    (gap + orientation-combination distance, inverse) — the gap is
    exact, only the final f32 conversion rounds, and only on
    large-gap records whose contributions are negligible."""
    a_first = posA < posB
    gap = jnp.where(a_first, sB - (sA + la[None, :]),
                    sA - (sB + lb[None, :])).astype(jnp.float32)
    combo = 2 * oA + oB
    combo = jnp.where(a_first, combo, 3 - combo)
    dval = (jnp.where(combo == 0, d[0][None, :], 0.0)
            + jnp.where(combo == 1, d[1][None, :], 0.0)
            + jnp.where(combo == 2, d[2][None, :], 0.0)
            + jnp.where(combo == 3, d[3][None, :], 0.0))
    dist = jnp.maximum(gap + dval, 1.0)
    return w[None, :] / dist


def _build_caches(order, ori, lengths, pa, pb):
    """Per-record endpoint caches + slot tables from the population.
    Returns (L_slot (P,k) int32, startsx (P,k+1) int32 slot starts
    with a total-length sentinel, posA, sA, oA, posB, sB, oB — all
    coordinates EXACT int32, see _contrib_from_cache). One gather
    pass per window — the cost the delta generations avoid."""
    P, k = order.shape
    Li = lengths.astype(jnp.int32)
    L_slot = Li[order]                                   # (P, k)
    startsx = jnp.concatenate(
        [jnp.zeros((P, 1), jnp.int32), jnp.cumsum(L_slot, axis=1)],
        axis=1)                                          # (P, k+1)
    pos_of = jnp.argsort(order, axis=1).astype(jnp.int32)
    start_of = jnp.take_along_axis(startsx[:, :k], pos_of, axis=1)
    ori_of = jnp.take_along_axis(ori, pos_of, axis=1)
    posA = jnp.take(pos_of, pa, axis=1)
    posB = jnp.take(pos_of, pb, axis=1)
    sA = jnp.take(start_of, pa, axis=1)
    sB = jnp.take(start_of, pb, axis=1)
    oA = jnp.take(ori_of, pa, axis=1)
    oB = jnp.take(ori_of, pb, axis=1)
    return L_slot, startsx, posA, sA, oA, posB, sB, oB


def _endpoint_update(pos, s, o, le, do, op, i, j, t, Sx, Sy, Lx, Ly, Et):
    """Closed-form update of one record endpoint under one move.

    pos/s/o: cached slot / start / orientation (P, R); le (R,) f32 the
    endpoint contig's length. Scalars (P,): Sx/Sy = starts of slots
    i/j, Lx/Ly = lengths at slots i/j, Et = start of slot t (total
    span end for rotation). Derivations (all moves preserve the span's
    total length, so slots outside are untouched):
      swap i<->j: slot i keeps start Sx (now holds contig Y); contig X
        lands at start Sy + Ly - Lx; middle slots shift by Ly - Lx.
      inversion [i,j]: slot of contig c -> i + j - pos; its start ->
        Sx + (Sy + Ly) - s - len(c); orientation flips.
      rotation [i,t) by r=j-i: block A=[i,j) (length W = Sy - Sx)
        moves right by t - j and +(Et - Sy); block B=[j,t) moves left
        by j - i and -W.
      flip [i,j]: orientation flips in the span.
    """
    i_ = i[:, None]
    j_ = j[:, None]
    t_ = t[:, None]
    Sx_ = Sx[:, None]
    Sy_ = Sy[:, None]
    dL = (Ly - Lx)[:, None]
    Ej_ = (Sy + Ly)[:, None]
    Et_ = Et[:, None]
    op_ = op[:, None]
    le_ = le[None, :]

    is_i = pos == i_
    is_j = pos == j_
    mid = (pos > i_) & (pos < j_)
    in_ij = (pos >= i_) & (pos <= j_)
    in_rot = (pos >= i_) & (pos < t_)
    in_a = (pos >= i_) & (pos < j_)

    # swap
    pos_sw = jnp.where(is_i, j_, jnp.where(is_j, i_, pos))
    s_sw = jnp.where(is_i, Sy_ + dL,
                     jnp.where(is_j, Sx_, jnp.where(mid, s + dL, s)))
    # inversion
    pos_inv = jnp.where(in_ij, i_ + j_ - pos, pos)
    s_inv = jnp.where(in_ij, Sx_ + Ej_ - s - le_, s)
    o_inv = jnp.where(in_ij, 1 - o, o)
    # rotation
    pos_rot = jnp.where(in_a, pos + (t_ - j_),
                        jnp.where(in_rot, pos - (j_ - i_), pos))
    s_rot = jnp.where(in_a, s + (Et_ - Sy_),
                      jnp.where(in_rot, s - (Sy_ - Sx_), s))
    # flip
    o_flip = jnp.where(in_ij, 1 - o, o)

    pos_n = jnp.where(op_ == 0, pos_sw,
                      jnp.where(op_ == 1, pos_inv,
                                jnp.where(op_ == 2, pos_rot, pos)))
    s_n = jnp.where(op_ == 0, s_sw,
                    jnp.where(op_ == 1, s_inv,
                              jnp.where(op_ == 2, s_rot, s)))
    o_n = jnp.where(op_ == 1, o_inv,
                    jnp.where(op_ == 3, o_flip, o))
    keep = ~do[:, None]
    return (jnp.where(keep, pos, pos_n),
            jnp.where(keep, s, s_n),
            jnp.where(keep, o, o_n))


def _move_scalars(startsx, i, j, t):
    """(Sx, Sy, Lx, Ly, Et) per individual, read from the int32
    slot-start table through one stacked one-hot matmul. A plain f32
    matmul would round coordinates past 2^24 and TPU point-gather
    HLOs at these shapes carry fixed ~ms costs (see _take_rows), so
    the int32 table rides the MXU as two exact 12-bit halves
    (each < 2^18 for group totals < 2^30) recombined after the
    einsum."""
    idxs = jnp.stack([i, i + 1, j, j + 1, t], axis=1)      # (P, 5)
    oh = jax.nn.one_hot(idxs, startsx.shape[1], dtype=jnp.float32)
    halves = jnp.stack([(startsx >> 12).astype(jnp.float32),
                        (startsx & 0xfff).astype(jnp.float32)], axis=1)
    vals = jnp.einsum('psk,pck->pcs', oh, halves,
                      precision=lax.Precision.HIGHEST)    # (P, 2, 5)
    v = (jnp.round(vals[:, 0]).astype(jnp.int32) << 12) \
        + jnp.round(vals[:, 1]).astype(jnp.int32)
    Sx, Sxe, Sy, Sye, Et = (v[:, 0], v[:, 1], v[:, 2], v[:, 3],
                            v[:, 4])
    return Sx, Sy, Sxe - Sx, Sye - Sy, Et


# delta windows interleave one full-scored (mu+lambda) + OX-crossover
# generation every GA_SYNC_EVERY generations: crossover recombines
# whole blocks across rows — the move class that fixes GLOBAL
# arrangement, which single-move hill climbing plateaus on (measured
# at k=200 hot, ngen=5000: sync 500 -> Spearman 0.88 / score 0.1602;
# sync 50 -> 0.97 / 0.1736; sync 25 -> 1.0 / 0.1767, beating the
# all-full-scored native GA's 0.1743) — and the rebuilt caches bound
# the f32 drift of incrementally-updated start offsets.
GA_SYNC_EVERY = int(os.environ.get('HAPHIC_GA_SYNC_EVERY', 25))
# share of delta-generation moves drawn with a local (geometric) span
_DELTA_LOCAL_FRAC = float(os.environ.get('HAPHIC_GA_DELTA_LOCAL', 0.5))
# minimum relative gain for a greedy move to be accepted
_DELTA_MIN_GAIN = float(os.environ.get('HAPHIC_GA_DELTA_MIN_GAIN', 0.0))
# additional per-slot-of-span relative gain requirement (see dgen)
_DELTA_SPAN_GAIN = float(os.environ.get('HAPHIC_GA_DELTA_SPAN_GAIN',
                                        2e-6))


def _evolve_delta_impl(key, order, ori, lengths, pa, pb, d, w, mutprob,
                       chunk: int, ngen: int, xoprob: float = 0.3):
    """One window: repeating cycles of [1 full-scored (mu+lambda)
    generation (crossover + selection + cache rebuild) + cycle-1
    delta-scored greedy generations]; returns (order, ori, scores)
    sorted best-first."""
    P, k = order.shape
    Li = lengths.astype(jnp.int32)
    la = Li[pa]
    lb = Li[pb]

    def dgen(n, state):
        (key, order, ori, L_slot, startsx,
         posA, sA, oA, posB, sB, oB, scores) = state
        key, km = jax.random.split(key)
        # always mutate: rejection handles bad moves, so an identity
        # generation would only waste the cache traffic
        do, op, i, j, t = _sample_moves(km, P, k, 1.1,
                                        local_frac=_DELTA_LOCAL_FRAC)
        Sx, Sy, Lx, Ly, Et = _move_scalars(startsx, i, j, t)
        posA2, sA2, oA2 = _endpoint_update(
            posA, sA, oA, la, do, op, i, j, t, Sx, Sy, Lx, Ly, Et)
        posB2, sB2, oB2 = _endpoint_update(
            posB, sB, oB, lb, do, op, i, j, t, Sx, Sy, Lx, Ly, Et)
        # score the move as an explicit DELTA: unaffected records have
        # bit-identical cached state, so their (new - old) contribution
        # is exactly 0.0 and the sum's noise floor is set by the few
        # affected records — comparing two full f32 sums instead hides
        # real ~1e-6 long-range losses under ~sqrt(R)*ulp reduction
        # noise, which turns near-neutral block moves into an accepted
        # random walk that scrambles global order (measured: hot-start
        # Spearman collapsed to 0.007 at k=200 with full-sum >=
        # acceptance; the strict-delta rule restores it)
        old_c = _contrib_from_cache(posA, sA, oA, posB, sB, oB,
                                    la, lb, d, w)
        new_c = _contrib_from_cache(posA2, sA2, oA2, posB2, sB2, oB2,
                                    la, lb, d, w)
        delta = (new_c - old_c).sum(axis=1)
        # span-proportional acceptance threshold: a large inversion or
        # rotation is score-NEUTRAL in its interior (internal pair
        # contributions are exactly invariant), so an ordering-wrecking
        # macro move rides on an epsilon boundary gain — and its exact
        # reverting span is almost never re-proposed (P ~ 1/(4k^2) per
        # row-generation). Charging each move ~spanlen * 2e-6 of the
        # current score rejects those while local repairs (span ~4,
        # gains >= 1e-4 of score) pass untouched.
        spanv = jnp.where(op == 2, t - i, j - i).astype(jnp.float32)
        thr = scores * (_DELTA_MIN_GAIN + _DELTA_SPAN_GAIN * spanv)
        acc = delta > thr
        new_scores = scores + delta
        a_ = acc[:, None]
        # slot tables follow the same move; int32 lengths ride the
        # f32 one-hot permute as two exact 12-bit half channels (a
        # direct f32 channel would round lengths past 2^24, and a
        # per-generation Li[order] gather HLO costs ~ms, see
        # _take_rows) and the start table is one int cumsum away
        src, flip = _move_src(do, op, i, j, t, k)
        tabs = jnp.stack([order.astype(jnp.float32),
                          ori.astype(jnp.float32),
                          (L_slot >> 12).astype(jnp.float32),
                          (L_slot & 0xfff).astype(jnp.float32)], axis=1)
        g = _permute_tables(tabs, src)
        order2 = g[:, 0].astype(jnp.int32)
        ori2 = g[:, 1].astype(jnp.int32)
        ori2 = jnp.where(flip, 1 - ori2, ori2)
        L2 = (jnp.round(g[:, 2]).astype(jnp.int32) << 12) \
            + jnp.round(g[:, 3]).astype(jnp.int32)
        order = jnp.where(a_, order2, order)
        ori = jnp.where(a_, ori2, ori)
        L_slot = jnp.where(a_, L2, L_slot)
        startsx = jnp.concatenate(
            [jnp.zeros((P, 1), jnp.int32),
             jnp.cumsum(L_slot, axis=1)], axis=1)
        posA = jnp.where(a_, posA2, posA)
        sA = jnp.where(a_, sA2, sA)
        oA = jnp.where(a_, oA2, oA)
        posB = jnp.where(a_, posB2, posB)
        sB = jnp.where(a_, sB2, sB)
        oB = jnp.where(a_, oB2, oB)
        scores = jnp.where(acc, new_scores, scores)
        return (key, order, ori, L_slot, startsx,
                posA, sA, oA, posB, sB, oB, scores)

    n_cycles = max(1, ngen // max(GA_SYNC_EVERY, 2))
    per = ngen // n_cycles                   # gens per cycle (>= 2)
    rem = ngen - n_cycles * per              # trailing delta gens

    # elitist re-seed: each cycle's full generation sorts rows
    # best-first; the bottom half restarts from the incumbent. Rows
    # that wandered off for many greedy generations are culled before
    # their macro-rearrangements compound — without this, thousands of
    # independently-accepted (strictly improving!) block moves diffuse
    # the global arrangement the weak long-range score tail cannot
    # anchor (measured at k=1000 hot, ngen=5000: none -> Spearman
    # 0.66; all-rows reset -> 0.66, no diversity; HALF -> 0.9997 with
    # a better score as well). Overridable via HAPHIC_GA_RESET.
    reset = os.environ.get('HAPHIC_GA_RESET', 'half')

    def scores_of(order, ori):
        """Row scores + caches rebuilt from slot tables — O(P*R)
        gathers + elementwise work, NO _score_population matmuls: at
        chromosome scale (k=2048, R~600k) one full matmul rescore
        costs ~1.5e15 MXU FLOPs (~50 s), which would make even
        1-in-25 sync generations dominate the window."""
        caches = _build_caches(order, ori, lengths, pa, pb)
        sc = _contrib_from_cache(*caches[2:], la, lb, d, w).sum(axis=1)
        return caches, sc

    def cycle(state, _):
        key, order, ori = state[0], state[1], state[2]
        key, k1, k2 = jax.random.split(key, 3)
        # parent scores recomputed from caches (the incrementally
        # delta-updated carry can lag the fresh offspring sums by
        # ~ulp, which would bias tie-breaking at selection)
        _, scores = scores_of(order, ori)
        off_order, off_ori = _ox_crossover(k1, order, ori, xoprob)
        off_order, off_ori = _mutate(k2, off_order, off_ori, mutprob)
        _, off_scores = scores_of(off_order, off_ori)
        all_order = jnp.concatenate([order, off_order], axis=0)
        all_ori = jnp.concatenate([ori, off_ori], axis=0)
        all_scores = jnp.concatenate([scores, off_scores], axis=0)
        # stable top_k: ties favor parents, so neutral rearrangements
        # do not drift in through the sync generation either
        top_scores, top = lax.top_k(all_scores, P)
        g = _take_rows(jnp.stack([all_order, all_ori], axis=1), top)
        order, ori = g[:, 0], g[:, 1]
        if reset != 'none':
            h = 1 if reset == 'all' else P // 2
            order = jnp.concatenate(
                [order[:h], jnp.broadcast_to(order[0], (P - h, k))])
            ori = jnp.concatenate(
                [ori[:h], jnp.broadcast_to(ori[0], (P - h, k))])
        (L_slot, startsx, posA, sA, oA, posB, sB, oB), scores = \
            scores_of(order, ori)
        state = (key, order, ori, L_slot, startsx,
                 posA, sA, oA, posB, sB, oB, scores)
        return lax.fori_loop(0, per - 1, dgen, state), None

    L_slot, startsx, posA, sA, oA, posB, sB, oB = _build_caches(
        order, ori, lengths, pa, pb)
    scores = _contrib_from_cache(posA, sA, oA, posB, sB, oB,
                                 la, lb, d, w).sum(axis=1)
    state = (key, order, ori, L_slot, startsx,
             posA, sA, oA, posB, sB, oB, scores)
    state, _ = lax.scan(cycle, state, None, length=n_cycles)
    state = lax.fori_loop(0, rem, dgen, state)
    order, ori, scores = state[1], state[2], state[11]
    top_scores, top = lax.top_k(scores, P)
    g = _take_rows(jnp.stack([order, ori], axis=1), top)
    return g[:, 0], g[:, 1], top_scores


@functools.partial(jax.jit, static_argnames=('chunk', 'ngen'))
def _evolve_delta_batched(keys, order, ori, lengths, pa, pb, d, w,
                          mutprob, chunk: int, ngen: int):
    """Group-batched delta window (vmapped twin of _evolve_batched)."""
    def one(k_, o_, r_, L_, a_, b_, d_, w_):
        return _evolve_delta_impl(k_, o_, r_, L_, a_, b_, d_, w_,
                                  mutprob, chunk, ngen)
    return jax.vmap(one)(keys, order, ori, lengths, pa, pb, d, w)


def _use_delta() -> bool:
    """Delta-scored windows are the device default; HAPHIC_GA_NO_DELTA
    with a truthy value falls back to full rescoring every generation
    (A/B lever for quality studies)."""
    return os.environ.get('HAPHIC_GA_NO_DELTA', '') in ('', '0')


def _delta_applicable(problems) -> bool:
    """The delta path keeps coordinates in exact int32; intermediates
    are bounded by 2x the group's total length, so groups past 2^30 bp
    (1.07 Gbp — larger than any published chromosome-scale Hi-C group
    the reference reports) fall back to the full-rescore window."""
    if not _use_delta():
        return False
    return all(int(p.lengths.sum()) < (1 << 30)
               for p in problems if p.k > 1)


def _evolve_impl(key, order, ori, lengths, pa, pb, d, w, mutprob,
                 chunk: int, ngen: int, xoprob: float = 0.3):
    """Run `ngen` generations of (mu + lambda) evolution.

    Population layout: row 0..P-1. Each generation:
      parents = current population (sorted best-first)
      offspring = OX-crossover then mutation of parents
      next population = best P of parents + offspring
    Row 0 is always the incumbent best, so the score is monotone.
    """
    P = order.shape[0]

    def gen(n, state):
        key, order, ori, scores = state
        key, k1, k2 = jax.random.split(key, 3)
        off_order, off_ori = _ox_crossover(k1, order, ori, xoprob)
        off_order, off_ori = _mutate(k2, off_order, off_ori, mutprob)
        off_scores = _score_population(off_order, off_ori, lengths,
                                       pa, pb, d, w, chunk)
        all_order = jnp.concatenate([order, off_order], axis=0)
        all_ori = jnp.concatenate([ori, off_ori], axis=0)
        all_scores = jnp.concatenate([scores, off_scores], axis=0)
        # top_k is stable on ties (same as argsort(-scores)); the row
        # selection runs as a one-hot matmul (see _take_rows)
        top_scores, top = lax.top_k(all_scores, P)
        g = _take_rows(jnp.stack([all_order, all_ori], axis=1), top)
        return (key, g[:, 0], g[:, 1], top_scores)

    scores = _score_population(order, ori, lengths, pa, pb, d, w, chunk)
    state = (key, order, ori, scores)
    state = lax.fori_loop(0, ngen, gen, state)
    _, order, ori, scores = state
    return order, ori, scores


_evolve = functools.partial(jax.jit, static_argnames=('chunk', 'ngen'))(
    _evolve_impl)

_evolve_delta = functools.partial(
    jax.jit, static_argnames=('chunk', 'ngen'))(_evolve_delta_impl)

@functools.partial(jax.jit, static_argnames=('chunk', 'ngen'))
def _evolve_batched(keys, order, ori, lengths, pa, pb, d, w, mutprob,
                    chunk: int, ngen: int):
    """Group-batched evolution: identical per-group computation vmapped
    over a leading group axis — one compile + one dispatch for a whole
    bucket of same-shape groups (replaces the reference's process pool,
    scripts/HapHiC_sort.py:932-956). Shapes: keys (G, 2) PRNG keys,
    order/ori (G, P, k), lengths (G, k), pa/pb/w (G, R), d (G, 4, R)."""
    def one(k_, o_, r_, L_, a_, b_, d_, w_):
        return _evolve_impl(k_, o_, r_, L_, a_, b_, d_, w_, mutprob,
                            chunk, ngen)
    return jax.vmap(one)(keys, order, ori, lengths, pa, pb, d, w)


@dataclass
class GAResult:
    order: np.ndarray        # int32[k] best tour (local contig ids)
    ori: np.ndarray          # int32[k]
    score: float
    history: List[Tuple[int, float]]   # (generation, best score)


def optimize_tour(problem: TourProblem, npop: int = 100, ngen: int = 5000,
                  mutprob: float = 0.2, seed: int = 42,
                  hot_start: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                  log_every: int = 500, skip_ga: bool = False,
                  chunk: int = CHUNK, backend: str = 'auto') -> GAResult:
    """Evolve tours for one group. ``hot_start`` is (order, ori) from
    fast sorting (`--resume` semantics, scripts/HapHiC_sort.py:631-632).

    ``backend``: 'device' forces the batched TPU GA, 'native' the C++
    kernel, 'auto' picks by problem size (see NATIVE_MAX_WORK).
    """
    k = problem.k
    if k <= 1:
        order = np.zeros(max(k, 1), dtype=np.int32)[:k]
        return GAResult(order=order, ori=np.zeros_like(order), score=0.0,
                        history=[])
    work = float(npop) * (0 if skip_ga else ngen) * max(problem.n_records, 1)
    if backend == 'native' or (backend == 'auto' and work < NATIVE_MAX_WORK
                               and native_lib() is not None):
        return _optimize_native(problem, npop, 0 if skip_ga else ngen,
                                mutprob, seed, hot_start, log_every)
    # pad the contig axis with zero-length dummies: they never appear in
    # a CLM record and add zero length, so any position they take in a
    # tour is score-neutral — this buckets compiled shapes across groups
    k_pad = _bucket(k, 8)
    chunk = _effective_chunk(problem.n_records, chunk)
    lengths_padded = np.zeros(k_pad, dtype=np.int64)
    lengths_padded[:k] = problem.lengths
    pa, pb, d, w, Rp = _pad_records(problem, chunk)
    # largest memory-safe chunk: one scan step is markedly faster than
    # many (see optimize_tours); must divide the record pad
    cap = 1 << (max(int(4e8) // max(npop, 1),
                    MIN_CHUNK).bit_length() - 1)
    chunk = _divisor_chunk(Rp, max(chunk, cap))
    lengths = jnp.asarray(lengths_padded)
    pa, pb = jnp.asarray(pa), jnp.asarray(pb)
    d, w = jnp.asarray(d), jnp.asarray(w)

    key = jax.random.PRNGKey(seed)
    if hot_start is not None:
        base_order = np.concatenate([
            np.asarray(hot_start[0], dtype=np.int32),
            np.arange(k, k_pad, dtype=np.int32)])
        base_ori = np.concatenate([
            np.asarray(hot_start[1], dtype=np.int32),
            np.zeros(k_pad - k, dtype=np.int32)])
    else:
        base_order = np.arange(k_pad, dtype=np.int32)
        base_ori = np.zeros(k_pad, dtype=np.int32)

    order = jnp.broadcast_to(jnp.asarray(base_order),
                             (npop, k_pad)).astype(jnp.int32)
    ori = jnp.broadcast_to(jnp.asarray(base_ori),
                           (npop, k_pad)).astype(jnp.int32)
    if hot_start is None:
        # diversify all but row 0 with one shuffle each
        key, k0 = jax.random.split(key)
        perm = jax.random.permutation(
            k0, jnp.broadcast_to(jnp.arange(k_pad, dtype=jnp.int32),
                                 (npop, k_pad)),
            axis=1, independent=True)
        order = order.at[1:].set(perm[1:])

    scores = _score_population(order, ori, lengths, pa, pb, d, w, chunk)
    best0 = float(jnp.max(scores))
    history: List[Tuple[int, float]] = [(0, best0)]
    def strip(o, r):
        o = np.asarray(o)
        r = np.asarray(r)
        real = o < k
        return o[real], r[real]

    if skip_ga:
        b = int(jnp.argmax(scores))
        o, r = strip(order[b], ori[b])
        return GAResult(order=o, ori=r, score=best0, history=history)

    evolve = _evolve_delta if _delta_applicable([problem]) else _evolve
    done = 0
    # no host sync between windows (see optimize_tours): keep each
    # window's best as a device scalar, fetch after the last window
    window_best: List[Tuple[int, object]] = []
    while done < ngen:
        step = min(log_every, ngen - done)
        key, kg = jax.random.split(key)
        order, ori, scores = evolve(kg, order, ori, lengths, pa, pb, d, w,
                                    mutprob, chunk, step)
        done += step
        window_best.append((done, scores[0]))
    for gen_done, best_j in window_best:
        best = float(best_j)
        history.append((gen_done, best))
        logger.debug('GA generation %d: best score %.6f', gen_done, best)

    o, r = strip(order[0], ori[0])
    return GAResult(order=o, ori=r, score=float(scores[0]), history=history)


@functools.partial(jax.jit, static_argnames=('chunk',))
def _score_batched(order, ori, lengths, pa, pb, d, w, chunk: int):
    def one(o_, r_, L_, a_, b_, d_, w_):
        return _score_population(o_, r_, L_, a_, b_, d_, w_, chunk)
    return jax.vmap(one)(order, ori, lengths, pa, pb, d, w)


def _initial_population(problem: TourProblem, k_pad: int, npop: int,
                        hot_start, key) -> Tuple[np.ndarray, np.ndarray]:
    k = problem.k
    if hot_start is not None:
        base_order = np.concatenate([
            np.asarray(hot_start[0], dtype=np.int32),
            np.arange(k, k_pad, dtype=np.int32)])
        base_ori = np.concatenate([
            np.asarray(hot_start[1], dtype=np.int32),
            np.zeros(k_pad - k, dtype=np.int32)])
    else:
        base_order = np.arange(k_pad, dtype=np.int32)
        base_ori = np.zeros(k_pad, dtype=np.int32)
    order = np.broadcast_to(base_order, (npop, k_pad)).copy()
    ori = np.broadcast_to(base_ori, (npop, k_pad)).copy()
    if hot_start is None:
        perm = jax.random.permutation(
            key, jnp.broadcast_to(jnp.arange(k_pad, dtype=jnp.int32),
                                  (npop, k_pad)),
            axis=1, independent=True)
        order[1:] = np.asarray(perm)[1:]
    return order, ori


def optimize_tours(problems: Sequence[TourProblem], npop: int = 100,
                   ngen: int = 5000, mutprob: float = 0.2, seed: int = 42,
                   hot_starts: Optional[Sequence] = None,
                   log_every: int = 500, skip_ga: bool = False,
                   chunk: int = CHUNK, backend: str = 'auto',
                   mesh=None, axis_name: str = 'data'
                   ) -> List[GAResult]:
    """Evolve every group at once: groups are bucketed by padded shape
    (k_pad, R_pad) and each bucket runs as ONE vmapped jit call per
    log_every window — ≤ O(log) distinct compiles across arbitrarily
    many chromosomes, versus the reference's per-group allhic
    subprocesses fanned out on a process pool
    (scripts/HapHiC_sort.py:932-956).

    Small workloads (npop * ngen * total records < NATIVE_MAX_WORK)
    dispatch to the native C++ kernel instead: at that size a
    fresh-process XLA compile costs more than the whole evolution
    (backend='auto'; force with 'device'/'native').

    With ``mesh``, each bucket's group axis is sharded across the
    devices (groups are fully independent — zero collectives, the mesh
    equivalent of the reference's process pool): buckets pad G to a
    multiple of the mesh size with zero-record dummy groups."""
    results: List[Optional[GAResult]] = [None] * len(problems)
    hot_starts = list(hot_starts) if hot_starts is not None \
        else [None] * len(problems)

    total_records = sum(p.n_records for p in problems if p.k > 1)
    work = float(npop) * (0 if skip_ga else ngen) * max(total_records, 1)
    use_native = backend == 'native' or (
        backend == 'auto' and work < NATIVE_MAX_WORK
        and native_lib() is not None)
    if use_native:
        for gi, p in enumerate(problems):
            if p.k <= 1:
                order = np.zeros(max(p.k, 1), dtype=np.int32)[:p.k]
                results[gi] = GAResult(order=order,
                                       ori=np.zeros_like(order),
                                       score=0.0, history=[])
            else:
                results[gi] = _optimize_native(
                    p, npop, 0 if skip_ga else ngen, mutprob, seed,
                    hot_starts[gi], log_every)
        return results

    buckets: dict = {}
    for gi, p in enumerate(problems):
        if p.k <= 1:
            order = np.zeros(max(p.k, 1), dtype=np.int32)[:p.k]
            results[gi] = GAResult(order=order, ori=np.zeros_like(order),
                                   score=0.0, history=[])
            continue
        k_pad = _bucket(p.k, 8)
        c_eff = _effective_chunk(p.n_records, chunk)
        _, _, _, _, Rp = _pad_records(p, c_eff)
        buckets.setdefault((k_pad, Rp, c_eff), []).append(gi)

    # split buckets so the delta caches fit in HBM: the window keeps
    # ~7 persistent (npop, Rp) int32/f32 arrays per group plus about
    # as much transient (the rejected-candidate twins), so a batch of
    # G groups costs ~56 * G * npop * Rp bytes; chromosome-scale
    # groups (k=2048, R~600k+) run one or two per dispatch while toy
    # buckets keep the full vmap batch.
    mem_budget = float(os.environ.get('HAPHIC_GA_MEM_BUDGET', 8e9))
    split = []
    for key3, idxs in sorted(buckets.items()):
        _, Rp_, _ = key3
        g_max = max(1, int(mem_budget / (56.0 * npop * max(Rp_, 1))))
        for s0 in range(0, len(idxs), g_max):
            split.append((key3, idxs[s0:s0 + g_max]))

    for (k_pad, Rp, c_eff), idxs in split:
        G = len(idxs)
        Gp = G
        if mesh is not None:
            nd = int(mesh.devices.size)
            Gp = -(-G // nd) * nd          # pad with dummy groups
        # scan overhead is real: scoring R=262k records in one step is
        # 2.8x faster than 16 chunked steps (52.5 -> 18.9 ms/gen
        # measured on v5e). Run the largest chunk the memory budget
        # allows that divides the bucket's record pad (intermediates
        # scale with G*npop*chunk).
        max_elems = int(4e8)
        cap = 1 << (max(max_elems // max(Gp * npop, 1),
                        MIN_CHUNK).bit_length() - 1)
        c_run = _divisor_chunk(Rp, max(c_eff, cap))
        lengths = np.zeros((Gp, k_pad), dtype=np.int64)
        pa = np.zeros((Gp, Rp), dtype=np.int32)
        pb = np.zeros((Gp, Rp), dtype=np.int32)
        d = np.zeros((Gp, 4, Rp), dtype=np.float32)
        w = np.zeros((Gp, Rp), dtype=np.float32)
        order = np.zeros((Gp, npop, k_pad), dtype=np.int32)
        ori = np.zeros((Gp, npop, k_pad), dtype=np.int32)
        order[:] = np.arange(k_pad, dtype=np.int32)
        key = jax.random.PRNGKey(seed)
        init_keys = jax.random.split(key, G + 1)
        key = init_keys[0]
        for t, gi in enumerate(idxs):
            p = problems[gi]
            lengths[t, :p.k] = p.lengths
            pa_t, pb_t, d_t, w_t, _ = _pad_records(p, c_eff)
            pa[t], pb[t], d[t], w[t] = pa_t, pb_t, d_t, w_t
            order[t], ori[t] = _initial_population(
                p, k_pad, npop, hot_starts[gi], init_keys[t + 1])

        def place(x):
            if mesh is None:
                return jnp.asarray(x)
            from jax.sharding import NamedSharding, PartitionSpec as P
            spec = P(axis_name, *([None] * (x.ndim - 1)))
            return jax.device_put(jnp.asarray(x),
                                  NamedSharding(mesh, spec))

        def fetch(*arrays):
            """Host copies of possibly-mesh-sharded arrays (on a
            multi-process mesh a plain np.asarray of a sharded array
            raises; replicate first)."""
            if mesh is None:
                return [np.asarray(a) for a in arrays]
            from haphic_tpu.parallel.mesh import host_fetch
            return host_fetch(mesh, *arrays)

        lengths_j = place(lengths)
        pa_j, pb_j = place(pa), place(pb)
        d_j, w_j = place(d), place(w)
        order_j, ori_j = place(order), place(ori)
        scores = _score_batched(order_j, ori_j, lengths_j, pa_j, pb_j,
                                d_j, w_j, c_run)
        best0 = fetch(jnp.max(scores, axis=1))[0]
        histories: List[List[Tuple[int, float]]] = \
            [[(0, float(b))] for b in best0]

        if skip_ga:
            bsel, order_h, ori_h = fetch(jnp.argmax(scores, axis=1),
                                         order_j, ori_j)
            for t, gi in enumerate(idxs):
                p = problems[gi]
                o = order_h[t, bsel[t]]
                r = ori_h[t, bsel[t]]
                real = o < p.k
                results[gi] = GAResult(order=o[real], ori=r[real],
                                       score=float(best0[t]),
                                       history=histories[t])
            continue

        evolve_b = _evolve_delta_batched \
            if _delta_applicable(problems) else _evolve_batched
        done = 0
        # windows are enqueued back to back WITHOUT a host sync in
        # between: fetching each window's best score immediately would
        # stall the dispatch pipeline for a device->host round trip
        # per window (material when the chip sits behind a network
        # tunnel); the per-window device arrays are kept and fetched
        # once after the last window, so the history is identical
        window_best: List[Tuple[int, object]] = []
        while done < ngen:
            step = min(log_every, ngen - done)
            key, kg = jax.random.split(key)
            gen_keys = jax.random.split(kg, Gp)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                gen_keys = jax.device_put(
                    gen_keys, NamedSharding(mesh, P(axis_name, None)))
            order_j, ori_j, scores = evolve_b(
                gen_keys, order_j, ori_j, lengths_j, pa_j, pb_j, d_j, w_j,
                mutprob, c_run, step)
            done += step
            window_best.append((done, scores[:, 0]))

        for gen_done, best_j in window_best:
            best = fetch(best_j)[0]
            for t in range(G):
                histories[t].append((gen_done, float(best[t])))
            logger.debug('GA generation %d: bucket (k=%d, R=%d) best %s',
                         gen_done, k_pad, Rp, best)

        order_h, ori_h, final = fetch(order_j, ori_j, scores[:, 0])
        for t, gi in enumerate(idxs):
            p = problems[gi]
            o, r = order_h[t, 0], ori_h[t, 0]
            real = o < p.k
            results[gi] = GAResult(order=o[real], ori=r[real],
                                   score=float(final[t]),
                                   history=histories[t])
    return results


def result_to_tour(res: GAResult, ctg_ids: np.ndarray, names: List[str]
                   ) -> List[Tuple[str, str]]:
    return [(names[int(ctg_ids[c])], '-' if o else '+')
            for c, o in zip(res.order.tolist(), res.ori.tolist())]


def write_ga_tour(path: str, res: GAResult, tour: List[Tuple[str, str]],
                  init_tour: Optional[List[Tuple[str, str]]] = None) -> None:
    """Reference-format .tour file with GA checkpoint headers."""
    with open(path, 'w') as f:
        f.write('>INIT\n')
        if init_tour is not None:
            f.write('{}\n'.format(' '.join(c + o for c, o in init_tour)))
        for gen, score in res.history[1:]:
            f.write('>GA{}-{:.5f}\n'.format(gen, score))
        f.write('{}\n'.format(' '.join(c + o for c, o in tour)))
