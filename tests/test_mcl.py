"""Parity + functional tests for the TPU MCL engine and inflation sweep."""

import random

import numpy as np
import pytest

from haphic_tpu.cluster import mcl as mcl_mod
from haphic_tpu.cluster import sweep as sweep_mod

from . import refbridge
from . import util


def _random_block_matrix(rng, n_blocks=3, block=8, noise=0.02):
    """Random symmetric block-diagonal-ish link matrix with self loops."""
    n = n_blocks * block
    m = np.zeros((n, n), dtype=np.float32)
    for b in range(n_blocks):
        lo = b * block
        for i in range(lo, lo + block):
            for j in range(i + 1, lo + block):
                if rng.random() < 0.7:
                    w = rng.randrange(5, 60)
                    m[i, j] = m[j, i] = w
    # sprinkle inter-block noise
    for _ in range(int(noise * n * n)):
        i, j = rng.randrange(n), rng.randrange(n)
        if i != j:
            w = rng.randrange(1, 4)
            m[i, j] = m[j, i] = w
    np.fill_diagonal(m, 1.0)
    return m


def _ref_partitions(matrix, inflations, expansion=2, max_iter=200,
                    pruning=1e-4):
    """Run the reference's dense MCL per inflation; return partitions."""
    ref = refbridge.load('HapHiC_cluster')
    from sklearn.preprocessing import normalize
    pre = normalize(matrix.astype(np.float64), norm='l1', axis=0)
    pre = np.linalg.matrix_power(pre, expansion)
    out = []
    for infl in inflations:
        res = ref.mcl(pre.copy(), expansion, float(infl), max_iter,
                      pruning, dense_matrix=True)
        clusters = ref.interpret_result(res, dense_matrix=True)
        out.append(None if clusters is None
                   else {frozenset(c) for c in clusters})
    return out


@pytest.mark.parametrize('seed', [0, 7])
def test_mcl_partition_parity_vs_reference(seed):
    rng = random.Random(seed)
    mat = _random_block_matrix(rng)
    inflations = [1.1, 1.5, 2.0, 3.0]
    expected = _ref_partitions(mat, inflations)

    res = mcl_mod.run_mcl(mat, inflations)
    assert res.converged.all()
    for b, exp in enumerate(expected):
        got = mcl_mod.interpret_result(res.matrices[b])
        got = None if got is None else {frozenset(c) for c in got}
        assert got == exp, 'inflation {} mismatch'.format(inflations[b])


def test_mcl_recovers_blocks():
    rng = random.Random(3)
    mat = _random_block_matrix(rng, n_blocks=4, block=10, noise=0.0)
    res = mcl_mod.run_mcl(mat, [2.0])
    clusters = mcl_mod.interpret_result(res.matrices[0])
    assert clusters is not None
    parts = {frozenset(c) for c in clusters}
    expected = {frozenset(range(b * 10, (b + 1) * 10)) for b in range(4)}
    assert parts == expected


def test_mcl_padding_does_not_leak():
    """Non-multiple-of-128 sizes must give the same result as exact."""
    rng = random.Random(11)
    mat = _random_block_matrix(rng, n_blocks=2, block=9)
    res = mcl_mod.run_mcl(mat, [1.8])
    clusters = mcl_mod.interpret_result(res.matrices[0])
    assert clusters is not None
    covered = sorted(i for c in clusters for i in c)
    assert covered == list(range(mat.shape[0]))


def test_inflation_values_decimal_stepping():
    vals = sweep_mod.inflation_values(1.1, 3.0, 0.1)
    assert [str(v) for v in vals[:3]] == ['1.1', '1.2', '1.3']
    assert str(vals[-1]) == '3.0'
    assert len(vals) == 20


def test_run_clustering_end_to_end(tmp_path):
    """Clustered sim genome -> ingest -> MCL sweep recovers chromosomes."""
    from haphic_tpu.io.fasta import read_fasta
    from haphic_tpu.io.pairs import PairsReader
    from haphic_tpu.core.fragments import build_fragments
    from haphic_tpu.core.contacts import aggregate

    rng = random.Random(5)
    ctgs, recs, chrom_of = util.clustered_genome_and_pairs(
        rng, nchrs=3, ctgs_per_chr=5, n_pairs=20000)
    fa = tmp_path / 'asm.fa'
    pr = tmp_path / 'hic.pairs'
    util.write_genome(str(fa), ctgs)
    util.write_pairs(str(pr), recs)

    asm = read_fasta(str(fa))
    frags = build_fragments(asm)
    links = aggregate(PairsReader(str(pr), asm.names), frags)

    filtered = np.nonzero(frags.nx_mask)[0]
    out = tmp_path / 'out'
    out.mkdir()
    res = sweep_mod.run_clustering(
        links.flank, filtered, frags, nchrs=3, outdir=str(out))

    assert res.recommended_inflation is not None
    best = next(cs for cs in res.cluster_sets
                if cs.inflation == res.recommended_inflation)
    # main groups must reproduce the chromosome partition
    main = [set(ctgs_) for ctgs_, _ in best.clusters[:3]]
    expected = {}
    for name, c in chrom_of.items():
        expected.setdefault(c, set()).add(name)
    assert {frozenset(s) for s in main} == \
        {frozenset(s) for s in expected.values()}
    # files written in the reference's byte format
    d = out / 'inflation_{}'.format(res.recommended_inflation)
    cl = d / 'mcl_inflation_{}.clusters.txt'.format(res.recommended_inflation)
    assert cl.exists()
    first = cl.read_text().splitlines()
    assert first[0] == '#Group\tnContigs\tContigs'
    assert first[1].startswith('group1_')


def test_run_mcl_partitions_matches_matrices_path():
    """The packed-bitmask partitions path must produce exactly the
    partitions of interpret_result over the full result matrices."""
    import numpy as np
    from haphic_tpu.cluster.mcl import (interpret_result, run_mcl,
                                        run_mcl_partitions)
    rng = np.random.default_rng(3)
    n, blocks = 96, 4
    m = np.zeros((n, n), dtype=np.float32)
    per = n // blocks
    for b in range(blocks):
        lo = b * per
        w = rng.integers(1, 50, (per, per)).astype(np.float32)
        blk = np.triu(w * (rng.random((per, per)) < 0.5), 1)
        m[lo:lo + per, lo:lo + per] += blk + blk.T
    np.fill_diagonal(m, 1.0)
    inflations = [1.3, 1.8, 2.4]
    res = run_mcl(m, inflations, max_iter=60, device_min_n=0)
    parts, iters, conv = run_mcl_partitions(m, inflations, max_iter=60,
                                            device_min_n=0)
    assert np.array_equal(iters, res.n_iters)
    for b in range(len(inflations)):
        assert parts[b] == interpret_result(res.matrices[b]), b


def test_densify_coo_matches_host_build():
    """The on-device COO densify must equal sweep.build_adjacency's
    host dense build (same scatter-add + self-loop semantics),
    including duplicate COO entries."""
    import numpy as np
    from haphic_tpu.cluster.mcl import _densify_coo
    from haphic_tpu.cluster.sweep import build_adjacency
    from haphic_tpu.core.contacts import COO
    rng = np.random.default_rng(3)
    m, nnz = 37, 400
    i = rng.integers(0, m, nnz)
    j = rng.integers(0, m, nnz)
    lo, hi = np.minimum(i, j), np.maximum(i, j)
    keep = lo != hi
    lo, hi = lo[keep], hi[keep]
    w = rng.integers(1, 9, keep.sum()).astype(np.float64)
    flank = COO(i=lo, j=hi, w=w)
    ids = np.arange(m)
    want, _ = build_adjacency(flank, ids, m)
    got = np.asarray(_densify_coo(lo, hi, w, 64, m))
    assert np.array_equal(got[:m, :m], want)
    assert not got[m:].any() and not got[:, m:].any()
