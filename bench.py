#!/usr/bin/env python3
"""Benchmark: batched MCL inflation sweep on device vs the reference's
serial scipy/CSC CPU formulation.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The workload mirrors HapHiC's clustering hot loop (hot loop 2,
SURVEY.md §3.1): a 20-inflation Markov-clustering sweep over an n x n
fragment link matrix. The CPU baseline reproduces the reference's
algorithm (scipy CSC SpGEMM + sklearn normalize, serial inflations,
scripts/HapHiC_cluster.py:1987-2062) without MKL (sparse_dot_mkl is not
installed here, as is the common case); the device path is this repo's
jit-compiled batched sweep.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   '.jax_cache'))

import numpy as np

N = int(os.environ.get('BENCH_N', 2048))
N_INFLATIONS = 20
MAX_ITER = int(os.environ.get('BENCH_MAX_ITER', 60))
PRUNING = 1e-4


def make_matrix(n, n_blocks=24, seed=0):
    """Block-structured symmetric link matrix (chromosome-like)."""
    rng = np.random.default_rng(seed)
    m = np.zeros((n, n), dtype=np.float32)
    block = n // n_blocks
    for b in range(n_blocks):
        lo = b * block
        hi = min(n, lo + block)
        size = hi - lo
        w = rng.integers(1, 60, size=(size, size)).astype(np.float32)
        mask = rng.random((size, size)) < 0.25
        blk = np.triu(w * mask, 1)
        m[lo:hi, lo:hi] += blk + blk.T
    # sparse inter-block noise
    k = n * 4
    ii = rng.integers(0, n, size=k)
    jj = rng.integers(0, n, size=k)
    vv = rng.integers(1, 4, size=k).astype(np.float32)
    sel = ii != jj
    np.add.at(m, (ii[sel], jj[sel]), vv[sel])
    np.add.at(m, (jj[sel], ii[sel]), vv[sel])
    np.fill_diagonal(m, 1.0)
    return m


def cpu_reference_sweep(mat, inflations, max_iter, pruning):
    """Serial scipy-CSC MCL sweep, the reference formulation."""
    from scipy.sparse import csc_matrix, dok_matrix
    from sklearn.preprocessing import normalize

    def prune(matrix):
        if matrix.nnz / matrix.shape[0] ** 2 < 0.05:
            pruned = dok_matrix(matrix.shape, dtype=np.float32)
            boolm = matrix >= pruning
            pruned[boolm] = matrix[boolm]
            pruned = pruned.tocsc()
        else:
            pruned = matrix.toarray()
            pruned[pruned < pruning] = 0
            pruned = csc_matrix(pruned)
        ncols = matrix.shape[1]
        cols = np.arange(ncols)
        rows = np.asarray(matrix.argmax(axis=0)).reshape(ncols)
        pruned[rows, cols] = matrix[rows, cols]
        return normalize(pruned, norm='l1', axis=0)

    base = normalize(csc_matrix(mat), norm='l1', axis=0)
    base = base @ base
    for inflation in inflations:
        matrix = base.copy()
        last = None
        for it in range(max_iter):
            if it != 0:
                matrix = matrix @ matrix
            matrix = normalize(matrix.power(inflation), norm='l1', axis=0)
            matrix = prune(matrix)
            if it > 1:
                d = np.abs(matrix - last) - 1e-5 * abs(last)
                if d.max() <= 1e-8:
                    break
            last = matrix.copy()


def main():
    from haphic_tpu.cluster.mcl import run_mcl

    mat = make_matrix(N)
    inflations = [round(1.1 + 0.1 * i, 2) for i in range(N_INFLATIONS)]

    # device path (includes compile on first call; time the second)
    run_mcl(mat, inflations[:2], max_iter=4, pruning=PRUNING)  # warm compile
    t0 = time.time()
    res = run_mcl(mat, inflations, max_iter=MAX_ITER, pruning=PRUNING)
    device_s = time.time() - t0

    # CPU baseline on a subset, extrapolated linearly over inflations
    n_cpu = 4
    t0 = time.time()
    cpu_reference_sweep(mat, inflations[:n_cpu], MAX_ITER, PRUNING)
    cpu_s = (time.time() - t0) * (N_INFLATIONS / n_cpu)

    speedup = cpu_s / device_s
    iters_total = int(res.n_iters.sum())
    print(json.dumps({
        'metric': 'mcl_sweep_speedup_vs_cpu_n{}'.format(N),
        'value': round(speedup, 3),
        'unit': 'x (cpu_s={:.1f}, device_s={:.1f}, iters={})'.format(
            cpu_s, device_s, iters_total),
        'vs_baseline': round(speedup, 3),
    }))


if __name__ == '__main__':
    main()
