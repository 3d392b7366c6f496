"""Sparse (ELL top-K) MCL vs the dense path.

The sparse engine must reproduce the dense partitions exactly when K
covers the true column support, and still recover the same clusters
with a tight K on chromosome-like block matrices (selection pruning).
"""

import numpy as np
import pytest

from haphic_tpu.cluster import mcl as mcl_mod
from haphic_tpu.cluster import sparse_mcl as sp


def _block_matrix(n=96, n_blocks=4, seed=0, noise=4):
    rng = np.random.default_rng(seed)
    m = np.zeros((n, n), dtype=np.float64)
    block = n // n_blocks
    for b in range(n_blocks):
        lo, hi = b * block, min(n, (b + 1) * block)
        size = hi - lo
        w = rng.integers(5, 60, size=(size, size)).astype(np.float64)
        mask = rng.random((size, size)) < 0.5
        blk = np.triu(w * mask, 1)
        m[lo:hi, lo:hi] += blk + blk.T
    for _ in range(noise * n):
        i, j = rng.integers(0, n, size=2)
        if i != j:
            m[i, j] += 1
            m[j, i] += 1
    return m


def _to_coo(m):
    i, j = np.nonzero(np.triu(m))
    return i, j, m[i, j]


def test_coo_to_ell_reconstructs_normalized_matrix():
    m = _block_matrix(n=32, n_blocks=2, seed=1)
    i, j, w = _to_coo(m)
    n = m.shape[0]
    idx, val, _ = sp.coo_to_ell(i, j, w, n, K=n)
    dense = np.zeros((n, n), dtype=np.float64)
    for c in range(n):
        sel = idx[c] < n
        dense[idx[c][sel], c] = val[c][sel]
    withloops = m + np.eye(n)
    expected = withloops / withloops.sum(axis=0, keepdims=True)
    np.testing.assert_allclose(dense, expected, rtol=1e-5, atol=1e-7)


def _partitions(res_dense, res_sparse, inflations):
    for b in range(len(inflations)):
        dense_part = mcl_mod.interpret_result(res_dense.matrices[b])
        sparse_part = res_sparse.interpret(b)
        yield b, dense_part, sparse_part


@pytest.mark.parametrize('K_mode', ['exact', 'capped'])
def test_sparse_matches_dense_partitions(K_mode):
    m = _block_matrix(n=96, n_blocks=4, seed=2)
    n = m.shape[0]
    i, j, w = _to_coo(m)
    inflations = [1.2, 1.5, 2.0, 2.8]
    K = n if K_mode == 'exact' else 48
    dense = mcl_mod.run_mcl(m.astype(np.float32), inflations, max_iter=80)
    sparse = sp.run_mcl_sparse(i, j, w, n, inflations, K=K, max_iter=80)
    n_match = 0
    for b, dp, spart in _partitions(dense, sparse, inflations):
        if dp is None:
            continue
        assert spart is not None, (b, K_mode)
        if dp == spart:
            n_match += 1
    assert n_match >= 3, 'partitions diverged in %d/4 inflations' % (
        4 - n_match)


def test_sparse_convergence_flags():
    m = _block_matrix(n=64, n_blocks=2, seed=3)
    i, j, w = _to_coo(m)
    res = sp.run_mcl_sparse(i, j, w, m.shape[0], [1.5], K=64, max_iter=120)
    assert bool(res.converged[0])
    assert int(res.n_iters[0]) < 120


def test_run_clustering_sparse_backend_matches_dense():
    """sweep.run_clustering(mcl_backend='sparse') produces the same
    cluster sets + recommendation as the dense backend."""
    from haphic_tpu.cluster import sweep as sweep_mod
    from haphic_tpu.core.contacts import COO
    from haphic_tpu.core.fragments import build_fragments
    from haphic_tpu.io.fasta import Assembly

    m = _block_matrix(n=60, n_blocks=3, seed=5)
    n = m.shape[0]
    names = ['c%02d' % t for t in range(n)]
    asm = Assembly(names=names,
                   name2id={c: t for t, c in enumerate(names)},
                   lengths=np.full(n, 50000, np.int64),
                   re_sites=np.ones(n, np.int64), seqs=None,
                   input_order={c: t for t, c in enumerate(names)})
    frags = build_fragments(asm, nchrs=3, Nx=100, bin_size_kbp=0,
                            flank_kbp=0)
    i, j, w = _to_coo(m)
    flank = COO(i=i, j=j, w=w)
    kept = np.arange(n)
    kw = dict(max_iter=80, min_inflation=1.2, max_inflation=2.0,
              write_files=False)
    dense = sweep_mod.run_clustering(flank, kept, frags, 3,
                                     mcl_backend='dense', **kw)
    sparse = sweep_mod.run_clustering(flank, kept, frags, 3,
                                      mcl_backend='sparse', sparse_K=n,
                                      **kw)
    d = {cs.inflation: cs.clusters for cs in dense.cluster_sets}
    s = {cs.inflation: cs.clusters for cs in sparse.cluster_sets}
    assert d == s
    assert dense.recommended_inflation == sparse.recommended_inflation


def _ell_to_dense(idx, val, n):
    out = np.zeros((n, n), dtype=np.float64)
    for c in range(n):
        sel = idx[c] < n
        out[idx[c][sel], c] = val[c][sel]
    return out


def test_pre_expand_matrix_power():
    """_pre_expand iterated e-1 times from the base must equal the
    column-normalized A^e (K = n, so no cap). Guards against the
    squaring bug where e pre-expansions produced A^(2^(e-1))."""
    import jax.numpy as jnp
    m = _block_matrix(n=24, n_blocks=2, seed=7)
    n = m.shape[0]
    i, j, w = _to_coo(m)
    idx, val, _ = sp.coo_to_ell(i, j, w, n, K=n)
    base = _ell_to_dense(idx, val, n)
    cur_i, cur_v = jnp.asarray(idx), jnp.asarray(val)
    expected = base.copy()
    for e in range(2, 5):
        cur_i, cur_v = sp._pre_expand(jnp.asarray(idx), jnp.asarray(val),
                                      cur_i, cur_v, n, n, 8)
        expected = base @ expected
        got = _ell_to_dense(np.asarray(cur_i), np.asarray(cur_v), n)
        np.testing.assert_allclose(got, expected, rtol=2e-3, atol=1e-6), e


@pytest.mark.parametrize('n', [33, 49, 96])
def test_sparse_mesh_matches_meshless(n):
    """run_mcl_sparse(mesh=...) must work for ANY fragment count — the
    column axis is padded to the mesh extent with sentinel rows — and
    reproduce the meshless partitions (MULTICHIP_r02 regression: every
    n with (n+1) % 8 != 0 used to raise in device_put).

    The matrix is noise-free blocks: the sharded executable lowers
    differently than the unsharded one (ulp-level rounding), and MCL's
    winner-take-all dynamics can amplify 1-ulp differences into
    different attractors on near-critical inputs — on well-separated
    blocks the partition is stable and must match exactly."""
    import jax
    from haphic_tpu.parallel.mesh import make_mesh
    if jax.device_count() < 8:
        pytest.skip('needs 8 (virtual) devices')
    mesh = make_mesh(8)
    m = _block_matrix(n=n, n_blocks=3, seed=11, noise=0)
    i, j, w = _to_coo(m)
    inflations = [1.3, 2.0]
    plain = sp.run_mcl_sparse(i, j, w, n, inflations, K=32, max_iter=60)
    meshed = sp.run_mcl_sparse(i, j, w, n, inflations, K=32, max_iter=60,
                               mesh=mesh)
    assert meshed.idx.shape == plain.idx.shape == (2, n + 1, 32)
    for b in range(len(inflations)):
        part = plain.interpret(b)
        assert part is not None
        assert meshed.interpret(b) == part
        np.testing.assert_allclose(
            _ell_to_dense(plain.idx[b], plain.val[b], n),
            _ell_to_dense(meshed.idx[b], meshed.val[b], n),
            rtol=1e-3, atol=1e-5)


def test_sparse_expansion_power_3():
    m = _block_matrix(n=48, n_blocks=2, seed=4)
    i, j, w = _to_coo(m)
    n = m.shape[0]
    dense = mcl_mod.run_mcl(m.astype(np.float32), [1.6], expansion=3,
                            max_iter=80)
    sparse = sp.run_mcl_sparse(i, j, w, n, [1.6], K=n, expansion=3,
                               max_iter=80)
    dp = mcl_mod.interpret_result(dense.matrices[0])
    assert dp is not None
    assert sparse.interpret(0) == dp


@pytest.mark.slow
def test_sparse_scale_truth_recovery():
    """Pipeline-scale quality pin for the sparse ELL engine: at n=8192
    with selection pruning genuinely active (K=64 < the ~90-wide
    column supports), the 64 true 128-contig blocks must be recovered
    exactly at some swept inflation. A dense oracle is computationally
    infeasible at this n; ground truth stands in for it. Blocks are
    compact (clique-like link radius) — MCL legitimately segments
    long locality chains, so chain-shaped blocks would not be a valid
    truth target."""
    n, blocks = 8192, 64
    per = n // blocks
    rng = np.random.default_rng(42)
    ii, jj, ww = [], [], []
    for b in range(blocks):
        lo = b * per
        nnz = per * 48
        a = rng.integers(0, per, nnz)
        off = rng.geometric(1 / 16.0, nnz)
        c = a + off
        sel = c < per
        ii.append(a[sel] + lo)
        jj.append(c[sel] + lo)
        ww.append(rng.integers(2, 40, sel.sum()).astype(np.float64))
    i, j, w = map(np.concatenate, (ii, jj, ww))

    # low inflations: high ones legitimately over-split compact blocks
    # (verified against the same construction at n=1024 where inflation
    # <=1.4 recovers blocks exactly and 2.0 fragments them)
    inflations = [1.1, 1.2, 1.4]
    res = sp.run_mcl_sparse(i, j, w, n, inflations, K=64, max_iter=40)
    assert res.overflow_cols > 0, 'selection pruning was not exercised'
    truth = sorted(tuple(range(b * per, (b + 1) * per))
                   for b in range(blocks))
    recovered = False
    for b in range(len(inflations)):
        part = res.interpret(b)
        if part is not None and sorted(part) == truth:
            recovered = True
            break
    assert recovered, 'no inflation recovered the 64 true blocks'
