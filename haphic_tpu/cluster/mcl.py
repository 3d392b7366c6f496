"""Markov clustering on TPU.

The reference's MCL (scripts/HapHiC_cluster.py:1987-2062) runs one
inflation at a time over a scipy CSC matrix with MKL SpGEMM. Here the
whole inflation sweep is *batched on the leading axis* and executed as a
single jit-compiled `lax.while_loop`:

    expand  — batched dense matmul on the MXU
    inflate — element-wise power, fused with the column L1-normalise
    prune   — threshold + keep-the-column-argmax + column L1-normalise
    converge— numpy.allclose semantics (|a-b| <= atol + rtol*|b|),
              per-inflation freeze masks

Matrices are padded to multiples of 128 (MXU tile) and kept float32 in
HBM; the expansion matmul defaults to precision='high' (3-pass bf16 on
the MXU, fp32-class accuracy) — measured ~20x faster than
'highest' (6-pass fp32 emulation) on TPU with >=99.9% identical cluster
membership on block-structured link matrices; pass precision='highest'
for bit-level fp32 reproduction.
Zero (padding) columns stay identically zero through every step because
the normaliser guards division by zero, so padding never leaks into real
columns.

Semantics parity notes (vs reference `mcl`):
  * iteration 0 skips expansion (the sweep pre-expands once, reference
    lines :2144-2149);
  * prune restores the per-column argmax entry of the *post-inflation*
    matrix before re-normalising (reference lines :2009-2013);
  * convergence is only checked from the third iteration (n > 1) with
    numpy.allclose defaults rtol=1e-5, atol=1e-8 (reference line :2051).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

MXU_TILE = 128


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    m = x.shape[-1]
    if m == n:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [(0, n - m), (0, n - m)]
    return np.pad(x, pad)


def _colnorm(m: jnp.ndarray) -> jnp.ndarray:
    s = jnp.sum(m, axis=-2, keepdims=True)
    return m * jnp.where(s > 0, 1.0 / s, 0.0)


def _matpower(m: jnp.ndarray, e: int, precision) -> jnp.ndarray:
    out = m
    for _ in range(e - 1):
        out = jnp.matmul(out, m, precision=precision,
                         preferred_element_type=jnp.float32)
    return out


def _prune(m: jnp.ndarray, pruning: float) -> jnp.ndarray:
    # keep entries >= pruning, and always the per-column argmax entry
    argmax_rows = jnp.argmax(m, axis=-2)                       # (..., n)
    rows = lax.broadcasted_iota(jnp.int32, m.shape, m.ndim - 2)
    is_max = rows == argmax_rows[..., None, :].astype(jnp.int32)
    kept = jnp.where((m >= pruning) | is_max, m, 0.0)
    return _colnorm(kept)


def _allclose(a: jnp.ndarray, b: jnp.ndarray,
              rtol: float = 1e-5, atol: float = 1e-8) -> jnp.ndarray:
    d = jnp.abs(a - b) - rtol * jnp.abs(b)
    return jnp.max(d, axis=(-2, -1)) <= atol


@functools.partial(jax.jit, static_argnames=('expansion', 'max_iter', 'precision'))
def _mcl_batched(pre_expanded: jnp.ndarray, inflations: jnp.ndarray,
                 expansion: int, max_iter: int, pruning: float,
                 precision: str) -> tuple:
    """Run MCL for a batch of inflations from the pre-expanded matrix.

    pre_expanded: (n, n) column-normalised and expanded once
    inflations:   (B,)
    Returns (final (B,n,n), n_iters (B,), converged (B,))
    """
    B = inflations.shape[0]
    n = pre_expanded.shape[-1]
    infl = inflations[:, None, None].astype(jnp.float32)

    def inflate(m):
        # 0**p = 0; power on strictly positive entries only for stability
        p = jnp.where(m > 0, jnp.exp(infl * jnp.log(jnp.where(m > 0, m, 1.0))), 0.0)
        return _colnorm(p)

    m0 = jnp.broadcast_to(pre_expanded[None], (B, n, n))
    # iteration 0: inflate + prune only
    m0 = _prune(inflate(m0), pruning)

    def cond(state):
        it, m, last, active, conv_at = state
        return jnp.logical_and(it < max_iter, jnp.any(active))

    def body(state):
        it, m, last, active, conv_at = state
        e = _matpower(m, expansion, precision)
        new = _prune(inflate(e), pruning)
        # convergence check only from the third iteration (n > 1)
        conv = jnp.logical_and(it >= 2, _allclose(new, m))
        newly = jnp.logical_and(active, conv)
        conv_at = jnp.where(newly, it + 1, conv_at)
        out = jnp.where(active[:, None, None], new, m)
        active = jnp.logical_and(active, jnp.logical_not(conv))
        return it + 1, out, m, active, conv_at

    it0 = jnp.array(1, jnp.int32)
    active0 = jnp.ones((B,), bool)
    conv_at0 = jnp.full((B,), max_iter, jnp.int32)
    it, m, last, active, conv_at = lax.while_loop(
        cond, body, (it0, m0, m0, active0, conv_at0))
    return m, conv_at, jnp.logical_not(active)


@dataclass
class MCLResult:
    matrices: np.ndarray      # (B, m, m) final matrices (unpadded)
    n_iters: np.ndarray       # (B,)
    converged: np.ndarray     # (B,)


# Below this n the COO->device densify (an extra scatter compile on
# the critical path) loses to a plain host dense build + upload.
COO_DENSIFY_MIN_N = int(os.environ.get('HAPHIC_COO_DENSIFY_MIN_N', 8192))

# Below this n the XLA compile time (tens of seconds per fresh process on
# the tunnel TPU backend) dwarfs the compute; plain numpy finishes the
# whole sweep in < ~2 s. Overridable for tests / power users.
DEVICE_MIN_N = int(os.environ.get('HAPHIC_DEVICE_MIN_N', 1024))


def _run_mcl_numpy(a: np.ndarray, inflations: np.ndarray, expansion: int,
                   max_iter: int, pruning: float) -> MCLResult:
    """Small-problem fallback: identical semantics to `_mcl_batched`, in
    numpy (fp32), serial over inflations. No XLA compile cost."""
    m = a.shape[0]

    def colnorm(x):
        s = x.sum(axis=0, keepdims=True)
        with np.errstate(divide='ignore'):
            inv = np.where(s > 0, 1.0 / s, 0.0)
        return x * inv

    def prune(x):
        argmax_rows = np.argmax(x, axis=0)
        keep = x >= pruning
        keep[argmax_rows, np.arange(x.shape[1])] = True
        return colnorm(np.where(keep, x, 0.0))

    def inflate(x, infl):
        with np.errstate(divide='ignore'):
            p = np.where(x > 0, np.exp(
                infl * np.log(np.where(x > 0, x, 1.0))), 0.0)
        return colnorm(p)

    pre = colnorm(a.astype(np.float32))
    pre = np.linalg.matrix_power(pre, expansion)

    B = len(inflations)
    mats = np.empty((B, m, m), dtype=np.float32)
    iters = np.empty((B,), dtype=np.int32)
    conv = np.empty((B,), dtype=bool)
    for b, infl in enumerate(inflations):
        mat = prune(inflate(pre, float(infl)))
        it, done = max_iter, False
        for i in range(1, max_iter):
            new = prune(inflate(
                np.linalg.matrix_power(mat, expansion), float(infl)))
            if i >= 2:
                d = np.abs(new - mat) - 1e-5 * np.abs(mat)
                if d.max() <= 1e-8:
                    mat, it, done = new, i + 1, True
                    break
            mat = new
        mats[b], iters[b], conv[b] = mat, it, done
    return MCLResult(matrices=mats, n_iters=iters, converged=conv)


def _bucket_pad(m: int) -> int:
    """Pad n to the MXU tile, then up to a power-of-two size class so
    different problem sizes reuse the same compiled executable (fresh
    compiles cost tens of seconds on the tunnel TPU backend)."""
    n = max(MXU_TILE, ((m + MXU_TILE - 1) // MXU_TILE) * MXU_TILE)
    p = 1 << (n - 1).bit_length()
    # at most 2x memory waste; cap the rounding at 8192 past which HBM
    # headroom matters more than compile reuse
    return p if p <= 8192 else n


@functools.partial(jax.jit, static_argnames=('n', 'm'))
def _densify_coo(ci, cj, cw, n: int, m: int):
    """Symmetric dense adjacency with self loops, built ON DEVICE from
    the upper-triangle COO: the host->device upload becomes O(nnz)
    (~12 MB at n=16384) instead of the n^2 f32 matrix (1 GB, which
    cost ~10-15 s of every hot sweep over the tunnel link). Twin of
    sweep.build_adjacency (reference dict_to_matrix with self loops);
    n is the padded size, m the real fragment count (pad rows stay
    zero, diag included)."""
    a = jnp.zeros((n, n), jnp.float32)
    cw = cw.astype(jnp.float32)
    a = a.at[ci, cj].add(cw)
    a = a.at[cj, ci].add(cw)
    d = jnp.arange(m)
    return a.at[d, d].add(1.0)


def _coo_to_dense_np(ci, cj, cw, m):
    """Host twin of _densify_coo (for the numpy small-n path)."""
    a = np.zeros((m, m), np.float32)
    np.add.at(a, (ci, cj), cw.astype(np.float32))
    np.add.at(a, (cj, ci), cw.astype(np.float32))
    np.fill_diagonal(a, a.diagonal() + 1.0)
    return a


def run_mcl(adjacency: np.ndarray, inflations: Sequence[float],
            expansion: int = 2, max_iter: int = 200, pruning: float = 1e-4,
            precision: str = 'high',
            batch_bytes_budget: int = 6 << 30,
            device_min_n: Optional[int] = None) -> MCLResult:
    """Run the full inflation sweep, auto-chunking the batch to fit HBM.

    ``adjacency`` is the dense symmetric link matrix *with self loops*
    (reference dict_to_matrix(add_self_loops=True),
    scripts/HapHiC_cluster.py:2934).

    Problems smaller than ``device_min_n`` (default env
    HAPHIC_DEVICE_MIN_N or 1024) run in numpy on the host: at that size
    a fresh-process XLA compile costs orders of magnitude more than the
    whole sweep.
    """
    m = adjacency.shape[0]
    min_n = DEVICE_MIN_N if device_min_n is None else device_min_n
    if m < min_n:
        return _run_mcl_numpy(adjacency, np.asarray(inflations, np.float32),
                              expansion, max_iter, pruning)
    n = _bucket_pad(m)
    a = _pad_to(adjacency.astype(np.float32), n)

    # pre-normalise + pre-expand once (reference lines :2143-2149)
    p = jnp.asarray(a)
    p = _colnorm(p)
    p = _matpower(p, expansion, precision)

    infl = np.asarray(inflations, dtype=np.float32)
    B = len(infl)
    # ~4 live (B,n,n) buffers in the loop
    per = 4 * n * n * 4
    chunk = max(1, min(B, int(batch_bytes_budget // max(per, 1))))

    mats = np.empty((B, m, m), dtype=np.float32)
    iters = np.empty((B,), dtype=np.int32)
    conv = np.empty((B,), dtype=bool)
    for s in range(0, B, chunk):
        e = min(B, s + chunk)
        mm, ii, cc = _mcl_batched(p, jnp.asarray(infl[s:e]), expansion,
                                  max_iter, float(pruning), precision)
        mats[s:e] = np.asarray(mm)[:, :m, :m]
        iters[s:e] = np.asarray(ii)
        conv[s:e] = np.asarray(cc)
    return MCLResult(matrices=mats, n_iters=iters, converged=conv)


@jax.jit
def _pack_nz(m: jnp.ndarray) -> jnp.ndarray:
    """Nonzero structure of (B, n, n) matrices as a packed bitmask
    (B, n, n/8), big-endian bit order (numpy.unpackbits default).
    Cluster interpretation only needs the nonzero pattern, and the
    final matrices are 32x larger — on the tunnel TPU backend the
    (20, 2048, 2048) f32 transfer alone cost ~10 s of a 16 s sweep."""
    B, n = m.shape[0], m.shape[-1]
    nz = (m != 0).reshape(B, n, n // 8, 8).astype(jnp.int32)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return (nz * weights).sum(axis=-1).astype(jnp.uint8)


def run_mcl_partitions(adjacency: Optional[np.ndarray],
                       inflations: Sequence[float],
                       expansion: int = 2, max_iter: int = 200,
                       pruning: float = 1e-4, precision: str = 'high',
                       device_min_n: Optional[int] = None,
                       coo=None):
    """Inflation sweep returning per-inflation cluster partitions
    (lists as interpret_result) plus (n_iters, converged) — without
    ever transferring the dense (B, n, n) result to the host: only the
    packed nonzero bitmask crosses the wire.

    ``coo``: optional (ci, cj, cw, m) upper-triangle links — the
    matrix is then densified ON DEVICE (see _densify_coo) and
    ``adjacency`` may be None."""
    if coo is not None:
        ci, cj, cw, m = coo
        m = int(m)
    else:
        m = adjacency.shape[0]
    min_n = DEVICE_MIN_N if device_min_n is None else device_min_n
    if m < min_n:
        if coo is not None:
            adjacency = _coo_to_dense_np(ci, cj, cw, m)
        res = _run_mcl_numpy(adjacency,
                             np.asarray(inflations, np.float32),
                             expansion, max_iter, pruning)
        parts = [interpret_result(res.matrices[b])
                 for b in range(len(res.n_iters))]
        return parts, res.n_iters, res.converged
    n = _bucket_pad(m)
    if coo is not None and m < COO_DENSIFY_MIN_N:
        # below this size the dense host build + upload is ~free
        # (16 MB at n=2048) while the device scatter program is one
        # more compile on the critical path — densify on the host
        adjacency = _coo_to_dense_np(ci, cj, cw, m)
        coo = None
    if coo is not None:
        # pad the COO to power-of-two nnz with zero-weight (0, 0)
        # entries: the scatter executable's shape would otherwise ride
        # the data-dependent nnz and recompile every dataset (~18 s
        # measured at n=2048)
        nnz = len(ci)
        cap = 1 << max(int(np.ceil(np.log2(max(nnz, 1)))), 10)
        ci = np.pad(np.asarray(ci, np.int32), (0, cap - nnz))
        cj = np.pad(np.asarray(cj, np.int32), (0, cap - nnz))
        cw = np.pad(np.asarray(cw, np.float32), (0, cap - nnz))
        a = _densify_coo(jnp.asarray(ci), jnp.asarray(cj),
                         jnp.asarray(cw), n, m)
    else:
        a = jnp.asarray(_pad_to(adjacency.astype(np.float32), n))
    p = _colnorm(a)
    p = _matpower(p, expansion, precision)
    infl = np.asarray(inflations, dtype=np.float32)
    B = len(infl)
    per = 4 * n * n * 4
    chunk = max(1, min(B, int((6 << 30) // max(per, 1))))
    # Dispatch EVERY chunk's while-loop + bitmask pack before fetching
    # anything: JAX dispatch is async, so the device streams through
    # the whole sweep while the host fetches and interprets earlier
    # inflations. The serialized fetch-then-dispatch loop cost ~3 s of
    # host/transfer time per inflation at n=16384 (~40% of the sweep).
    # Only the packed (n, n/8) bitmasks accumulate on device (n²/8
    # bytes each); the (chunk, n, n) result matrices die at their pack.
    pending = []
    for s in range(0, B, chunk):
        e = min(B, s + chunk)
        mm, ii, cc = _mcl_batched(p, jnp.asarray(infl[s:e]), expansion,
                                  max_iter, float(pruning), precision)
        pending.append((s, e, _pack_nz(mm), ii, cc))
    parts = []
    iters = np.empty((B,), dtype=np.int32)
    conv = np.empty((B,), dtype=bool)
    for s, e, packed_dev, ii, cc in pending:
        packed = np.asarray(packed_dev)
        iters[s:e] = np.asarray(ii)
        conv[s:e] = np.asarray(cc)
        for b in range(e - s):
            nz = np.unpackbits(packed[b], axis=-1)[:m, :m]
            parts.append(interpret_result(nz))
    return parts, iters, conv


def interpret_result(matrix: np.ndarray, tol: float = 0.0
                     ) -> Optional[list]:
    """Extract clusters from a converged MCL matrix.

    Attractors are rows with a non-zero diagonal; each attractor's
    cluster is the set of columns with non-zero entries in its row.
    Returns None when the clusters do not form an exact partition
    (parity: scripts/HapHiC_cluster.py:2065-2095).
    """
    m = matrix.shape[0]
    nz = matrix > tol if tol else matrix != 0
    attractors = np.nonzero(np.diagonal(nz))[0]
    clusters = set()
    for a in attractors:
        clusters.add(tuple(np.nonzero(nz[a])[0].tolist()))
    seen = set()
    for cluster in clusters:
        for node in cluster:
            if node in seen:
                return None
            seen.add(node)
    if len(seen) != m:
        return None
    return sorted(clusters)
