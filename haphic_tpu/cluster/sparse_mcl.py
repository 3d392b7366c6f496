"""Sparse Markov clustering on TPU — the scale path past dense n².

The reference clusters up to ~262k fragments (Ginkgo,
reference README.md:317) with scipy CSC + MKL SpGEMM
(scripts/HapHiC_cluster.py:2017-2062); a dense (B, n, n) formulation is
~274 GB per matrix at that n. Dynamic-sparsity CSR does not fit XLA's
static-shape model, so this module uses a *fixed top-K per column* ELL
layout — the "selection pruning" strategy of HipMCL (Azad et al.,
"HipMCL: a high-performance parallel implementation of the Markov
clustering algorithm", and the pre-exascale follow-up
arxiv.org/pdf/2002.10083) — which bounds every shape statically:

    idx: int32 (n+1, K)   row ids of the ≤K entries of each column,
                          sorted ascending, sentinel n for padding
    val: f32   (n+1, K)   matching values (0 at sentinels)

Row n is an always-empty padding row so gathers through sentinel ids
are self-neutralizing. Memory is O(n·K) — 262k fragments at K=128 is
~270 MB per inflation instead of ~274 GB dense.

One MCL iteration per column j (all vectorized, no dynamic shapes):
  expand   gather the K columns referenced by column j -> (K, K)
           candidate (row, val·val) products
  dedupe   lax.sort by row id + segmented run-sum (cumsum/cummax trick)
  inflate  val^inflation, exact column L1 normalization (pre-cap, so
           the normalizer sees the full expanded column)
  cap      lax.top_k K largest entries — the only approximation vs the
           reference; exact when K ≥ the column's true support
  prune    threshold + keep-column-max + renormalize
           (reference prune semantics, scripts/HapHiC_cluster.py:1987)
  converge numpy.allclose semantics via a 2K sorted merge of old/new

The inflation sweep is batched on a leading axis with per-inflation
freeze masks, and columns stream through a lax.scan in fixed chunks so
peak memory stays O(B · chunk · K²).
"""

from __future__ import annotations

import functools
import logging
import time
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

logger = logging.getLogger(__name__)

DEFAULT_K = 128


# ---------------------------------------------------------------------------
# per-column kernels (vmapped over columns, then over inflations)
# ---------------------------------------------------------------------------


def _dedupe_sorted(ci: jnp.ndarray, cv: jnp.ndarray, n: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Segment-sum runs of equal ids in an id-sorted candidate list.
    Non-last members of each run become sentinels (id n, value 0)."""
    s = jnp.cumsum(cv)
    nxt = jnp.concatenate([ci[1:], jnp.full((1,), n + 1, ci.dtype)])
    is_last = ci != nxt
    z = jnp.where(is_last, s, 0.0)
    prev = jnp.concatenate([jnp.zeros((1,), s.dtype), z[:-1]])
    prev_end = lax.cummax(prev, axis=0)      # s is nondecreasing (cv >= 0)
    run = s - prev_end
    real = is_last & (ci < n)
    return jnp.where(real, ci, n), jnp.where(real, run, 0.0)


def _inflate_cap_prune(didx: jnp.ndarray, dval: jnp.ndarray, infl,
                       pruning, n: int, K: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """inflate -> exact colnorm -> top-K cap -> threshold+keep-max ->
    renormalize -> sort by row id. Works on any deduped candidate list
    (K² after expansion, K for the no-expand first iteration)."""
    p = jnp.where(dval > 0,
                  jnp.exp(infl * jnp.log(jnp.where(dval > 0, dval, 1.0))),
                  0.0)
    tot = p.sum()
    p = p * jnp.where(tot > 0, 1.0 / tot, 0.0)
    if p.shape[0] > K:
        tv, tpos = lax.top_k(p, K)
        ti = didx[tpos]
    else:
        tv, ti = p, didx
    mx = tv.max()
    keep = (tv >= pruning) | ((tv == mx) & (tv > 0))
    tv = jnp.where(keep, tv, 0.0)
    t2 = tv.sum()
    tv = tv * jnp.where(t2 > 0, 1.0 / t2, 0.0)
    ti = jnp.where(tv > 0, ti, n).astype(jnp.int32)
    ti, tv = lax.sort((ti, tv), num_keys=1)
    return ti, tv


def _expand_col(A_idx: jnp.ndarray, A_val: jnp.ndarray,
                col_idx: jnp.ndarray, col_val: jnp.ndarray,
                n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Candidates of (A @ A)[:, j]: the K referenced columns of A scaled
    by this column's values, flattened and deduped. Shapes (K²,)."""
    gi = A_idx[col_idx].reshape(-1)                      # (K*K,)
    gv = (A_val[col_idx] * col_val[:, None]).reshape(-1)
    ci, cv = lax.sort((gi, gv), num_keys=1)
    return _dedupe_sorted(ci, cv, n)


def _col_allclose_stat(old_idx, old_val, new_idx, new_val, n,
                       rtol=1e-5):
    """max over rows of |new - old| - rtol·|old| for one column pair
    (numpy.allclose semantics of the dense path, b = old)."""
    ci = jnp.concatenate([old_idx, new_idx])
    dv = jnp.concatenate([-old_val, new_val])
    ov = jnp.concatenate([old_val, jnp.zeros_like(new_val)])
    ci, dv, ov = lax.sort((ci, dv, ov), num_keys=1)
    s_d = jnp.cumsum(dv)
    s_o = jnp.cumsum(ov)
    nxt = jnp.concatenate([ci[1:], jnp.full((1,), n + 1, ci.dtype)])
    is_last = ci != nxt
    zd = jnp.where(is_last, s_d, 0.0)
    zo = jnp.where(is_last, s_o, 0.0)
    # cumsum of ov is nondecreasing; dv cumsum is not -> recover run sums
    # by differencing consecutive last positions via a gather-free scan:
    prev_o = jnp.concatenate([jnp.zeros((1,), s_o.dtype), zo[:-1]])
    o_run = s_o - lax.cummax(prev_o, axis=0)
    # for dv, propagate "last seen run-end cumsum" with an associative
    # scan over (value at last positions, carry forward):
    idx_pos = jnp.where(is_last, jnp.arange(ci.shape[0]), -1)
    prev_last = jnp.concatenate(
        [jnp.full((1,), -1, idx_pos.dtype), lax.cummax(idx_pos, axis=0)[:-1]])
    d_prev = jnp.where(prev_last >= 0, s_d[jnp.maximum(prev_last, 0)], 0.0)
    d_run = s_d - d_prev
    stat = jnp.abs(d_run) - rtol * o_run
    return jnp.max(jnp.where(is_last & (ci < n), stat, -jnp.inf))


# ---------------------------------------------------------------------------
# batched sweep kernel
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=('n', 'K'))
def _first_iteration(idx0, val0, inflations, n: int, K: int, pruning):
    """Iteration 0: inflate + prune only, per inflation (the sweep
    pre-expands once, reference scripts/HapHiC_cluster.py:2144-2149).
    Returns (B, N, K) idx/val, N = idx0.shape[0] (≥ n+1; rows past n are
    sentinel padding, e.g. to a mesh-divisible column count)."""
    infl = inflations.astype(jnp.float32)
    i0, v0 = jax.vmap(
        lambda f: jax.vmap(
            lambda ci, cv: _inflate_cap_prune(ci, cv, f, pruning, n, K)
        )(idx0, val0))(infl)
    i0 = i0.at[:, n].set(n)
    v0 = v0.at[:, n].set(0.0)
    return i0, v0


def _sweep_cols(A_i, A_v, C_i, C_v, infl, n: int, K: int, chunk: int,
                pruning, expansion: int, vary_axis=None):
    """Expand→inflate→cap→prune for a block of columns C against the
    full matrix A, streaming the columns through a lax.scan in fixed
    chunks. A_i/A_v: (B, N, K) per-inflation matrices; C_i/C_v:
    (B, M, K) the columns to process (the whole matrix, or one mesh
    shard of it). Returns (new_i, new_v, stat) with stat the
    per-inflation max allclose statistic over these columns. The math
    is per-column, so processing a shard yields bitwise-identical
    results to processing the same columns in the full run."""
    B, M = C_i.shape[0], C_i.shape[1]
    nchunks = -(-M // chunk)
    M_pad = nchunks * chunk
    if M_pad != M:
        pad = ((0, 0), (0, M_pad - M), (0, 0))
        C_i = jnp.pad(C_i, pad, constant_values=n)
        C_v = jnp.pad(C_v, pad)
    cb_i = C_i.reshape(B, nchunks, chunk, K).transpose(1, 0, 2, 3)
    cb_v = C_v.reshape(B, nchunks, chunk, K).transpose(1, 0, 2, 3)

    def step(carry, xs):
        c_i, c_v = xs                            # (B, chunk, K)

        def per_b(a_i, a_v, ci, cv, f):
            def per_col(ci_row, cv_row):
                di, dv = _expand_col(a_i, a_v, ci_row, cv_row, n)
                for _ in range(expansion - 2):
                    # higher expansion powers: re-expand the deduped
                    # column (entries beyond K² fold through the cap)
                    di, dv = _inflate_cap_prune(
                        di, dv, jnp.float32(1.0), 0.0, n, K)
                    di, dv = _expand_col(a_i, a_v, di, dv, n)
                return _inflate_cap_prune(di, dv, f, pruning, n, K)

            ni, nv = jax.vmap(per_col)(ci, cv)
            stat = jax.vmap(
                lambda oi, ov, qi, qv: _col_allclose_stat(
                    oi, ov, qi, qv, n))(ci, cv, ni, nv)
            return ni, nv, jnp.max(stat)

        ni, nv, stat = jax.vmap(per_b)(A_i, A_v, c_i, c_v, infl)
        return jnp.maximum(carry, stat), (ni, nv)

    stat0 = jnp.full((B,), -jnp.inf)
    if vary_axis is not None:
        # under shard_map the scan carry must carry the same
        # varying-manual-axes type as the per-step stat output
        stat0 = lax.pcast(stat0, (vary_axis,), to='varying')
    maxstat, (ys_i, ys_v) = lax.scan(step, stat0, (cb_i, cb_v))
    new_i = ys_i.transpose(1, 0, 2, 3).reshape(B, M_pad, K)[:, :M]
    new_v = ys_v.transpose(1, 0, 2, 3).reshape(B, M_pad, K)[:, :M]
    return new_i, new_v, maxstat


@functools.partial(jax.jit,
                   static_argnames=('n', 'K', 'chunk', 'expansion'))
def _sweep_step(idx, val, inflations, active, n: int, K: int,
                chunk: int, pruning, expansion: int):
    """One MCL iteration for the whole inflation batch on one device.
    Returns (new_idx, new_val, stat, max_nnz) where stat is the
    per-inflation allclose statistic vs the input (≤1e-8 ⇒ converged).
    Frozen inflations (active=False) pass through unchanged.

    Kept as a standalone jitted step — the convergence loop runs on
    the host — so one compile serves every inflation chunk and
    iteration count. The column axis may be padded beyond n+1
    (idx.shape[1] = N ≥ n+1): padding columns hold sentinels only and
    compute empty results — self-neutralizing by construction."""
    infl = inflations.astype(jnp.float32)
    new_idx, new_val, maxstat = _sweep_cols(
        idx, val, idx, val, infl, n, K, chunk, pruning, expansion)
    new_idx = new_idx.at[:, n].set(n)
    new_val = new_val.at[:, n].set(0.0)
    keep = active[:, None, None]
    new_idx = jnp.where(keep, new_idx, idx)
    new_val = jnp.where(keep, new_val, val)
    # widest column support across the batch — the host loop shrinks K
    # (and recompiles small) once supports collapse, because iteration
    # cost is O(K²) and MCL columns concentrate fast
    max_nnz = jnp.max(jnp.sum(new_val > 0, axis=-1))
    return new_idx, new_val, maxstat, max_nnz


_SHARDED_STEP_CACHE = {}


def _sharded_sweep_step(mesh, axis_name: str, n: int, K: int, chunk: int,
                        expansion: int, pruning: float):
    """The multi-device twin of _sweep_step, built with shard_map: each
    device holds its shard of the (B, N, K) column axis, all-gathers
    the matrices once per iteration (O(n·K) bytes over ICI/DCN — a
    1:K communication:compute ratio), runs the identical per-column
    kernel on its local columns, and pmax-reduces the convergence
    statistic. Explicit SPMD rather than GSPMD auto-partitioning: the
    per-column math is exactly _sweep_cols, so sharded and unsharded
    runs produce bitwise-identical iterates (tests pin this)."""
    key = (id(mesh), axis_name, n, K, chunk, expansion, float(pruning))
    fn = _SHARDED_STEP_CACHE.get(key)
    if fn is not None:
        return fn
    from jax.sharding import PartitionSpec as P
    shard_map = jax.shard_map
    spec = P(None, axis_name, None)

    def body(idx_l, val_l, inflations, active):
        A_i = lax.all_gather(idx_l, axis_name, axis=1, tiled=True)
        A_v = lax.all_gather(val_l, axis_name, axis=1, tiled=True)
        infl = inflations.astype(jnp.float32)
        ni, nv, stat = _sweep_cols(
            A_i, A_v, idx_l, val_l, infl, n, K, chunk, pruning,
            expansion, vary_axis=axis_name)
        # column n (the sentinel) computes its own empty result, so no
        # explicit reset is needed; padding rows beyond n likewise
        stat = lax.pmax(stat, axis_name)
        keep = active[:, None, None]
        ni = jnp.where(keep, ni, idx_l)
        nv = jnp.where(keep, nv, val_l)
        max_nnz = lax.pmax(jnp.max(jnp.sum(nv > 0, axis=-1)), axis_name)
        return ni, nv, stat, max_nnz

    fn = jax.jit(shard_map(body, mesh=mesh,
                           in_specs=(spec, spec, P(), P()),
                           out_specs=(spec, spec, P(), P())))
    _SHARDED_STEP_CACHE[key] = fn
    return fn


def _run_sweep_batch(idx0, val0, infl, n: int, K: int, chunk: int,
                     max_iter: int, pruning: float, expansion: int,
                     mesh=None, axis_name: str = 'data',
                     adapt_K: bool = True):
    """Host convergence loop for one inflation batch. With ``mesh``
    each step runs as an explicit shard_map SPMD program: the column
    axis stays sharded across devices, A is all-gathered for the
    column gathers, per-column work and outputs stay sharded.

    With ``adapt_K`` the working K shrinks to the next power of two
    over the actual widest column support whenever that halves —
    iteration cost is O(K²), and supports collapse rapidly as MCL
    concentrates, so the long convergence tail runs at a fraction of
    the initial width (entries are idx-sorted with sentinels last, so
    shrinking is a pure slice). At most three shrink levels run (each
    is a fresh XLA compile, ~30 s on the tunnel backend, so unbounded
    level-by-level shrinking would make cold runs compile-bound; the
    K=16 floor matters — the convergence tail at a K=32 floor measured
    ~45 s slower per 32k sweep)."""
    B = infl.shape[0]
    K_full = K
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P(None, axis_name, None))
    idx, val = _first_iteration(idx0, val0, infl, n, K, float(pruning))
    if sharding is not None:
        idx = jax.device_put(idx, sharding)
        val = jax.device_put(val, sharding)
    active = np.ones(B, dtype=bool)
    conv_at = np.full(B, max_iter, dtype=np.int32)
    n_shrinks = 0
    t0 = time.time()
    for it in range(1, max_iter):
        cur_chunk = min(chunk, _auto_chunk(B, K, n))
        if mesh is not None:
            # the scan streams each device's LOCAL columns: don't pad a
            # small shard up to a global-sized chunk
            local_m = idx.shape[1] // int(mesh.shape[axis_name])
            cur_chunk = min(cur_chunk, max(8, local_m))
            step_fn = _sharded_sweep_step(mesh, axis_name, n, K,
                                          cur_chunk, expansion,
                                          float(pruning))
            idx, val, stat, max_nnz = step_fn(
                idx, val, infl, jnp.asarray(active))
        else:
            idx, val, stat, max_nnz = _sweep_step(
                idx, val, infl, jnp.asarray(active),
                n, K, cur_chunk, float(pruning), expansion)
        stat_h = np.asarray(stat)
        if it >= 2:
            newly = active & (stat_h <= 1e-8)
            conv_at[newly] = it + 1
            active &= ~newly
        if not active.any():
            break
        if adapt_K and K > 16 and n_shrinks < 3:
            nz = int(max_nnz)
            newK = max(16, 1 << max(nz - 1, 1).bit_length())
            if newK <= K // 2:
                logger.info('sparse MCL: support collapsed to %d, '
                            'shrinking K %d -> %d', nz, K, newK)
                K = newK
                n_shrinks += 1
                idx = idx[:, :, :K]
                val = val[:, :, :K]
                if sharding is not None:
                    idx = jax.device_put(idx, sharding)
                    val = jax.device_put(val, sharding)
    logger.info('sparse MCL batch inflations=%s: %s iterations in %.1fs',
                np.asarray(infl).round(2).tolist(), conv_at.tolist(),
                time.time() - t0)
    # pad back to the caller's K so batches stack uniformly
    if K < K_full:
        pad = K_full - K
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad)),
                      constant_values=n)
        val = jnp.pad(val, ((0, 0), (0, 0), (0, pad)))
    if mesh is not None:
        # sharded iterates can span non-addressable devices in a
        # multi-process mesh: replicate before fetching (the GA path's
        # host_fetch pattern, parallel/mesh.py:106)
        from haphic_tpu.parallel.mesh import host_fetch
        idx, val = host_fetch(mesh, idx, val)
    return (np.asarray(idx), np.asarray(val), conv_at,
            np.logical_not(active))


@functools.partial(jax.jit, static_argnames=('n', 'K', 'chunk'))
def _pre_expand(base_i, base_v, cur_i, cur_v, n: int, K: int, chunk: int):
    """One exact-normalization left-multiply by the base matrix:
    C ← A @ C capped at top-K (inflation 1, no threshold). Iterating
    this from C = A yields A^e for any expansion e — squaring the
    iterate would instead give A^(2^(e-1))."""
    n1 = cur_i.shape[0]
    nchunks = -(-n1 // chunk)
    n_pad = nchunks * chunk
    col_ids = jnp.minimum(jnp.arange(n_pad, dtype=jnp.int32), n)
    col_blocks = col_ids.reshape(nchunks, chunk)

    def step(_, cols):
        def per_col(ci_row, cv_row):
            di, dv = _expand_col(base_i, base_v, ci_row, cv_row, n)
            return _inflate_cap_prune(di, dv, jnp.float32(1.0), 0.0, n, K)
        ni, nv = jax.vmap(per_col)(cur_i[cols], cur_v[cols])
        return _, (ni, nv)

    _, (ys_i, ys_v) = lax.scan(step, 0, col_blocks)
    pi = ys_i.reshape(n_pad, K)[:n1]
    pv = ys_v.reshape(n_pad, K)[:n1]
    pi = pi.at[n].set(n)
    pv = pv.at[n].set(0.0)
    return pi, pv


# ---------------------------------------------------------------------------
# host wrappers
# ---------------------------------------------------------------------------


def coo_to_ell(i: np.ndarray, j: np.ndarray, w: np.ndarray, n: int,
               K: int, add_self_loops: bool = True
               ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Symmetric COO (upper or mixed triangle) -> column-normalized ELL
    (n+1, K). Columns with more than K entries keep the K largest
    (logged). Mirrors dict_to_matrix(add_self_loops=True) + the sweep's
    initial L1 normalization (scripts/HapHiC_cluster.py:310-373,2143).

    Returns (idx, val, overflow) where overflow is the number of input
    columns wider than K (0 ⇒ the ELL layout is exact)."""
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    w = np.asarray(w, dtype=np.float64)
    off = (i != j)
    rows = np.concatenate([i, j[off]])
    cols = np.concatenate([j, i[off]])
    vals = np.concatenate([w, w[off]])
    if add_self_loops:
        rows = np.concatenate([rows, np.arange(n)])
        cols = np.concatenate([cols, np.arange(n)])
        vals = np.concatenate([vals, np.ones(n)])
    # collapse duplicates
    key = cols * (n + 1) + rows
    order = np.argsort(key, kind='stable')
    key, rows, vals = key[order], rows[order], vals[order]
    uk, start = np.unique(key, return_index=True)
    seg = np.add.reduceat(vals, start) if len(vals) else vals[:0]
    rows = rows[start]
    cols = (uk // (n + 1)).astype(np.int64)

    # column L1 normalization
    colsum = np.zeros(n, dtype=np.float64)
    np.add.at(colsum, cols, seg)
    seg = seg / np.where(colsum[cols] > 0, colsum[cols], 1.0)

    counts = np.zeros(n + 1, dtype=np.int64)
    np.add.at(counts, cols, 1)
    overflow = int((counts > K).sum())
    if overflow:
        logger.info('sparse MCL: %d/%d columns exceed K=%d entries; '
                    'keeping the K largest per column', overflow, n, K)
    col_start = np.zeros(n + 2, dtype=np.int64)
    np.cumsum(counts, out=col_start[1:])

    # per-column top-K (vectorized): rank entries by value within column
    order2 = np.lexsort((-seg, cols))
    c2, r2, v2 = cols[order2], rows[order2], seg[order2]
    rank = np.arange(len(c2)) - col_start[c2]
    keep = rank < K
    c2, r2, v2 = c2[keep], r2[keep], v2[keep]
    if overflow:
        ksum = np.zeros(n, dtype=np.float64)
        np.add.at(ksum, c2, v2)
        ov = counts[c2] > K
        v2 = np.where(ov, v2 / np.where(ksum[c2] > 0, ksum[c2], 1.0), v2)

    # place in ascending row order per column
    order3 = np.lexsort((r2, c2))
    c3, r3, v3 = c2[order3], r2[order3], v2[order3]
    kept_counts = np.zeros(n + 1, dtype=np.int64)
    np.add.at(kept_counts, c3, 1)
    kept_start = np.zeros(n + 2, dtype=np.int64)
    np.cumsum(kept_counts, out=kept_start[1:])
    slot = np.arange(len(c3)) - kept_start[c3]

    idx = np.full((n + 1, K), n, dtype=np.int32)
    val = np.zeros((n + 1, K), dtype=np.float32)
    idx[c3, slot] = r3
    val[c3, slot] = v3
    return idx, val, overflow


@dataclass
class SparseMCLResult:
    idx: np.ndarray          # (B, n+1, K)
    val: np.ndarray
    n: int
    n_iters: np.ndarray      # (B,)
    converged: np.ndarray    # (B,)
    K: int = 0               # top-K cap used (selection pruning width)
    overflow_cols: int = 0   # columns of the INPUT matrix wider than K

    def csr(self, b: int):
        """Final matrix of inflation b as scipy CSR (rows x cols)."""
        from scipy.sparse import coo_matrix
        idx = self.idx[b, :self.n].ravel()
        cols = np.repeat(np.arange(self.n), self.idx.shape[-1])
        vals = self.val[b, :self.n].ravel()
        keep = (idx < self.n) & (vals > 0)
        return coo_matrix((vals[keep], (idx[keep], cols[keep])),
                          shape=(self.n, self.n)).tocsr()

    def interpret(self, b: int) -> Optional[list]:
        """Cluster extraction, parity with the dense interpret_result
        (scripts/HapHiC_cluster.py:2065-2095)."""
        csr = self.csr(b)
        m = self.n
        diag = csr.diagonal() != 0
        attractors = np.nonzero(diag)[0]
        clusters = set()
        for a in attractors:
            row = csr.getrow(a)
            clusters.add(tuple(np.sort(row.indices[row.data != 0]).tolist()))
        seen = set()
        for cluster in clusters:
            for node in cluster:
                if node in seen:
                    return None
                seen.add(node)
        if len(seen) != m:
            return None
        return sorted(clusters)


def _auto_chunk(B: int, K: int, n: int, budget_bytes: int = 2 << 30) -> int:
    per_col = B * K * K * 8          # candidate idx+val per column
    c = max(1, budget_bytes // max(per_col, 1))
    # keep the lane dimension friendly, and never pad columns beyond
    # the next power of two over the real count
    n_cap = 1 << max(3, (n + 1 - 1).bit_length())
    # 2048-column chunks balance step count against per-step compile
    # size (measured on the tunnel: 7 s to compile at 1024, 25 s at 4096)
    return int(min(2048, n_cap, max(8, 1 << (int(c).bit_length() - 1))))


def run_mcl_sparse(i: np.ndarray, j: np.ndarray, w: np.ndarray, n: int,
                   inflations: Sequence[float], K: int = DEFAULT_K,
                   expansion: int = 2, max_iter: int = 200,
                   pruning: float = 1e-4, add_self_loops: bool = True,
                   inflation_batch: int = 0, chunk: int = 0,
                   mesh=None, axis_name: str = 'data') -> SparseMCLResult:
    """Sparse MCL inflation sweep over a symmetric COO link matrix.

    ``K`` bounds the per-column support (selection pruning). With
    K ≥ max column support of every iterate the result is exact; smaller
    K approximates (validated against the dense path in tests).

    With ``mesh``, every (B, N, K) iterate is sharded over the mesh on
    the *column* axis (N = n+1 padded up to a mesh-divisible count with
    self-neutralizing sentinel rows) and each iteration runs as an
    explicit shard_map program: the per-column expand/dedupe/prune work
    divides across devices while the gathers of referenced columns
    all-gather A over ICI/DCN — O(n·K) bytes per device per iteration,
    a 1:K communication:compute ratio. Sharded iterates are bitwise
    equal to the meshless run (pinned by tests).
    """
    if K > n:
        K = max(1, n)
    infl = np.asarray(inflations, dtype=np.float32)
    B = len(infl)
    idx0, val0, overflow_cols = coo_to_ell(i, j, w, n, K,
                                           add_self_loops=add_self_loops)

    # Small independent inflation batches beat one lockstep batch:
    # every iteration costs O(batch · n · K²), and a batch stops as
    # soon as ITS inflations converge — low inflations run 3-4x more
    # iterations than high ones, so lockstepping all 20 pays the
    # slowest straggler on the full width (measured ~2x total waste).
    # Memory also favors small batches (~4 live (B, n, K) buffers).
    if not inflation_batch:
        per = 4 * (n + 1) * K * 8
        inflation_batch = max(1, min(B, 4, int((6 << 30) // max(per, 1))))
    chunk = chunk or _auto_chunk(min(B, inflation_batch), K, n)

    if mesh is not None:
        # the sharded column axis must divide by the mesh extent: pad
        # with sentinel rows (idx=n, val=0), which every kernel treats
        # as empty columns — self-neutralizing end to end
        n_dev = int(mesh.shape[axis_name])
        pad_rows = (-(n + 1)) % n_dev
        if pad_rows:
            idx0 = np.concatenate(
                [idx0, np.full((pad_rows, K), n, np.int32)])
            val0 = np.concatenate(
                [val0, np.zeros((pad_rows, K), np.float32)])

    idx0_j = jnp.asarray(idx0)
    val0_j = jnp.asarray(val0)
    base_i, base_v = idx0_j, val0_j
    for _ in range(expansion - 1):
        idx0_j, val0_j = _pre_expand(base_i, base_v, idx0_j, val0_j,
                                     n, K, chunk)

    out_idx = np.empty((B, n + 1, K), dtype=np.int32)
    out_val = np.empty((B, n + 1, K), dtype=np.float32)
    iters = np.empty((B,), dtype=np.int32)
    conv = np.empty((B,), dtype=bool)
    for s in range(0, B, inflation_batch):
        e = min(B, s + inflation_batch)
        # pad the last chunk to the full batch so one compiled step
        # serves every chunk
        bpad = inflation_batch - (e - s)
        infl_c = np.pad(infl[s:e], (0, bpad), mode='edge') \
            if bpad else infl[s:e]
        ii, vv, it, cc = _run_sweep_batch(
            idx0_j, val0_j, jnp.asarray(infl_c), n, K, chunk,
            max_iter, pruning, expansion, mesh=mesh, axis_name=axis_name)
        out_idx[s:e] = ii[:e - s, :n + 1]
        out_val[s:e] = vv[:e - s, :n + 1]
        iters[s:e] = it[:e - s]
        conv[s:e] = cc[:e - s]
    return SparseMCLResult(idx=out_idx, val=out_val, n=n, n_iters=iters,
                           converged=conv, K=K,
                           overflow_cols=overflow_cols)
