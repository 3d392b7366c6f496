"""Tests for the TPU tour optimizer (allhic replacement)."""

import random

import numpy as np
import pytest

from haphic_tpu.order import optimize as opt


def _random_problem(seed, k=6, R=200):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(10000, 100000, size=k)
    a = rng.integers(0, k - 1, size=R)
    b = a + rng.integers(1, k - np.maximum(a, 1), size=R).clip(1)
    b = np.minimum(b, k - 1)
    keep = a < b
    a, b = a[keep], b[keep]
    pa = rng.integers(0, lengths[a])
    pb = rng.integers(0, lengths[b])
    d = np.stack([
        lengths[a] - pa + pb,
        lengths[a] - pa + lengths[b] - pb,
        pa + pb,
        pa + lengths[b] - pb,
    ]).astype(np.float32)
    return opt.TourProblem(lengths=lengths.astype(np.int64),
                           pair_a=a.astype(np.int32),
                           pair_b=b.astype(np.int32),
                           d=d, w=np.ones(len(a), np.float32))


def _brute_score(problem, order, ori):
    k = problem.k
    pos = {int(c): i for i, c in enumerate(order)}
    starts = np.cumsum([0] + [problem.lengths[c] for c in order[:-1]])
    start_of = {int(c): starts[i] for i, c in enumerate(order)}
    ori_of = {int(c): int(ori[pos[c]]) for c in order}
    total = 0.0
    for r in range(problem.n_records):
        a, b = int(problem.pair_a[r]), int(problem.pair_b[r])
        if pos[a] < pos[b]:
            gap = start_of[b] - (start_of[a] + problem.lengths[a])
            combo = 2 * ori_of[a] + ori_of[b]
        else:
            gap = start_of[a] - (start_of[b] + problem.lengths[b])
            combo = 3 - (2 * ori_of[a] + ori_of[b])
        dist = max(float(problem.d[combo, r]) + gap, 1.0)
        total += float(problem.w[r]) / dist
    return total


@pytest.mark.parametrize('seed', [0, 1])
def test_score_matches_bruteforce(seed):
    import jax.numpy as jnp
    problem = _random_problem(seed)
    rng = np.random.default_rng(seed + 100)
    P = 4
    orders = np.stack([rng.permutation(problem.k) for _ in range(P)]
                      ).astype(np.int32)
    oris = rng.integers(0, 2, size=(P, problem.k)).astype(np.int32)
    pa, pb, d, w, _ = opt._pad_records(problem, 64)
    got = np.asarray(opt._score_population(
        jnp.asarray(orders), jnp.asarray(oris),
        jnp.asarray(problem.lengths), jnp.asarray(pa), jnp.asarray(pb),
        jnp.asarray(d), jnp.asarray(w), 64))
    for p in range(P):
        expected = _brute_score(problem, orders[p], oris[p])
        assert got[p] == pytest.approx(expected, rel=1e-4)


def _sim_chromosome_problem(seed, k=8, n_pairs=4000, decay=40000.0):
    """Contigs tiled on a chromosome in a random order/orientation;
    read pairs sampled with exponential-decay separation."""
    rng = np.random.default_rng(seed)
    lengths = rng.integers(40000, 120000, size=k).astype(np.int64)
    true_order = rng.permutation(k)
    true_ori = rng.integers(0, 2, size=k)

    starts = np.cumsum(np.concatenate([[0], lengths[true_order][:-1]]))
    start_of = np.zeros(k, np.int64)
    start_of[true_order] = starts

    def genome_pos(c, p):
        # position p (0-based) within contig c -> chromosome coordinate
        if true_ori[c] == 0:
            return start_of[c] + p
        return start_of[c] + lengths[c] - 1 - p

    recs_a, recs_b, recs_d = [], [], []
    total_len = int(lengths.sum())
    for _ in range(n_pairs):
        x = rng.integers(0, total_len)
        sep = int(rng.exponential(decay)) + 1
        y = x + sep
        if y >= total_len:
            continue
        # locate contigs
        ca = int(np.searchsorted(starts, x, side='right')) - 1
        cb = int(np.searchsorted(starts, y, side='right')) - 1
        ca, cb = int(true_order[ca]), int(true_order[cb])
        if ca == cb:
            continue
        pa_ = x - start_of[ca] if true_ori[ca] == 0 \
            else start_of[ca] + lengths[ca] - 1 - x
        pb_ = y - start_of[cb] if true_ori[cb] == 0 \
            else start_of[cb] + lengths[cb] - 1 - y
        a, b, pa2, pb2 = (ca, cb, pa_, pb_) if ca < cb else (cb, ca, pb_, pa_)
        recs_a.append(a)
        recs_b.append(b)
        recs_d.append([lengths[a] - pa2 + pb2,
                       lengths[a] - pa2 + lengths[b] - pb2,
                       pa2 + pb2,
                       pa2 + lengths[b] - pb2])
    problem = opt.TourProblem(
        lengths=lengths,
        pair_a=np.asarray(recs_a, np.int32),
        pair_b=np.asarray(recs_b, np.int32),
        d=np.asarray(recs_d, np.float32).T,
        w=np.ones(len(recs_a), np.float32))
    return problem, true_order, true_ori


def _canonical_tour(order, ori):
    fwd = tuple(zip(order.tolist(), ori.tolist()))
    rev = tuple((c, 1 - o) for c, o in fwd[::-1])
    return min(fwd, rev)


@pytest.mark.parametrize('seed', [3])
@pytest.mark.parametrize('backend', ['native', 'device'])
def test_ga_recovers_true_order(seed, backend):
    if backend == 'native' and opt.native_lib() is None:
        pytest.skip('native kernel unavailable')
    problem, true_order, true_ori = _sim_chromosome_problem(seed)
    res = opt.optimize_tour(problem, npop=32, ngen=600, seed=1,
                            log_every=200, chunk=1024, backend=backend)
    # monotone improvement
    scores = [s for _, s in res.history]
    assert all(b >= a - 1e-6 for a, b in zip(scores, scores[1:]))
    true_score = _brute_score(problem, true_order,
                              true_ori[true_order])
    # GA should reach (or beat: finite sampling) the truth's score
    assert res.score >= 0.95 * true_score
    got = _canonical_tour(res.order, res.ori)
    want = _canonical_tour(true_order, true_ori[true_order])
    assert got == want


@pytest.mark.parametrize('backend', ['native', 'device'])
def test_hot_start_and_skip_ga(backend):
    if backend == 'native' and opt.native_lib() is None:
        pytest.skip('native kernel unavailable')
    problem, true_order, true_ori = _sim_chromosome_problem(5)
    hot = (true_order.astype(np.int32),
           true_ori[true_order].astype(np.int32))
    res = opt.optimize_tour(problem, npop=8, skip_ga=True, hot_start=hot,
                            chunk=1024, backend=backend)
    assert res.score == pytest.approx(
        _brute_score(problem, true_order, true_ori[true_order]), rel=1e-4)
    assert np.array_equal(res.order, hot[0])


def test_delta_endpoint_update_matches_rebuild():
    """The closed-form per-record cache update (delta GA) must equal
    the caches rebuilt from the mutated slot tables — exactly, for
    every move type, composed over many generations (lengths are small
    enough that every f32 sum is exact, so any mismatch is a formula
    bug, not rounding)."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    P, k, R = 16, 32, 300
    lengths = jnp.asarray(rng.integers(16, 4096, size=k), jnp.int32)
    a = rng.integers(0, k - 1, size=R)
    b = a + rng.integers(1, k - np.maximum(a, 1), size=R).clip(1)
    b = np.minimum(b, k - 1)
    pa = jnp.asarray(a, jnp.int32)
    pb = jnp.asarray(b, jnp.int32)
    order = jnp.asarray(
        np.stack([rng.permutation(k) for _ in range(P)]), jnp.int32)
    ori = jnp.asarray(rng.integers(0, 2, size=(P, k)), jnp.int32)

    Lf = lengths.astype(jnp.float32)
    la, lb = Lf[pa], Lf[pb]
    L_slot, startsx, posA, sA, oA, posB, sB, oB = opt._build_caches(
        order, ori, lengths, pa, pb)
    key = jax.random.PRNGKey(7)
    for gen in range(40):
        key, km = jax.random.split(key)
        do, op, i, j, t = opt._sample_moves(km, P, k, 0.9)
        Sx, Sy, Lx, Ly, Et = opt._move_scalars(startsx, i, j, t)
        posA, sA, oA = opt._endpoint_update(
            posA, sA, oA, la, do, op, i, j, t, Sx, Sy, Lx, Ly, Et)
        posB, sB, oB = opt._endpoint_update(
            posB, sB, oB, lb, do, op, i, j, t, Sx, Sy, Lx, Ly, Et)
        src, flip = opt._move_src(do, op, i, j, t, k)
        tabs = jnp.stack([order.astype(jnp.float32),
                          ori.astype(jnp.float32)], axis=1)
        g = opt._permute_tables(tabs, src)
        order = g[:, 0].astype(jnp.int32)
        ori = g[:, 1].astype(jnp.int32)
        ori = jnp.where(flip, 1 - ori, ori)
        (L_slot, startsx, posA_r, sA_r, oA_r,
         posB_r, sB_r, oB_r) = opt._build_caches(
            order, ori, lengths, pa, pb)
        for got, want, name in [
                (posA, posA_r, 'posA'), (posB, posB_r, 'posB'),
                (oA, oA_r, 'oA'), (oB, oB_r, 'oB'),
                (sA, sA_r, 'sA'), (sB, sB_r, 'sB')]:
            assert np.array_equal(np.asarray(got), np.asarray(want)), \
                'gen {}: {} diverged from table rebuild'.format(gen, name)


def test_delta_window_matches_full_quality():
    """The delta-scored device window must reach the same tour as the
    full-rescore window on the order-recovery problem (quality guard
    for the round-5 inner-loop redesign)."""
    problem, true_order, true_ori = _sim_chromosome_problem(3)
    res = opt.optimize_tour(problem, npop=32, ngen=600, seed=1,
                            log_every=200, chunk=1024, backend='device')
    scores = [s for _, s in res.history]
    assert all(b >= a - 1e-6 for a, b in zip(scores, scores[1:]))
    got = _canonical_tour(res.order, res.ori)
    want = _canonical_tour(true_order, true_ori[true_order])
    assert got == want


def test_tour_file_format(tmp_path):
    problem, true_order, true_ori = _sim_chromosome_problem(7)
    res = opt.optimize_tour(problem, npop=8, ngen=100, log_every=50,
                            chunk=1024)
    names = ['c{}'.format(i) for i in range(problem.k)]
    tour = opt.result_to_tour(res, np.arange(problem.k), names)
    p = tmp_path / 'group1.tour'
    opt.write_ga_tour(str(p), res, tour)
    lines = p.read_text().splitlines()
    assert lines[0] == '>INIT'
    ga_lines = [l for l in lines if l.startswith('>GA')]
    assert len(ga_lines) == 2 and ga_lines[0].startswith('>GA50-')
    # final line holds every contig exactly once with orientation
    final = lines[-1].split()
    assert sorted(x[:-1] for x in final) == sorted(names)
    assert all(x[-1] in '+-' for x in final)


def test_optimize_tours_group_sharded_over_mesh():
    """Group-axis mesh sharding (the reference process-pool equivalent)
    recovers each group's true order; G=3 pads to the 8-device mesh."""
    from haphic_tpu.parallel.mesh import make_mesh
    problems, truths = [], []
    for seed in (3, 11, 4):
        problem, true_order, true_ori = _sim_chromosome_problem(seed, k=8)
        problems.append(problem)
        truths.append((true_order, true_ori))
    mesh = make_mesh()
    results = opt.optimize_tours(problems, npop=32, ngen=600, seed=1,
                                 log_every=300, chunk=1024,
                                 backend='device', mesh=mesh)
    for res, (true_order, true_ori) in zip(results, truths):
        got = _canonical_tour(res.order, res.ori)
        want = _canonical_tour(true_order, true_ori[true_order])
        assert got == want


def test_ox_crossover_is_valid_permutation():
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    P, k = 16, 12
    order = np.stack([rng.permutation(k) for _ in range(P)]).astype(np.int32)
    ori = rng.integers(0, 2, size=(P, k)).astype(np.int32)
    child, child_ori = opt._ox_crossover(
        jax.random.PRNGKey(0), jnp.asarray(order), jnp.asarray(ori),
        xoprob=1.0)
    child = np.asarray(child)
    child_ori = np.asarray(child_ori)
    for p in range(P):
        assert sorted(child[p].tolist()) == list(range(k)), p
        assert set(child_ori[p].tolist()) <= {0, 1}


@pytest.mark.parametrize('backend', ['native', 'device'])
def test_optimize_tours_batched_matches_quality(backend):
    """Batched multi-group GA: each group recovers its true order, and
    bucketing mixes different (k, R) shapes correctly."""
    if backend == 'native' and opt.native_lib() is None:
        pytest.skip('native kernel unavailable')
    problems, truths = [], []
    for seed, k in ((3, 8), (11, 8), (4, 5)):
        problem, true_order, true_ori = _sim_chromosome_problem(seed, k=k)
        problems.append(problem)
        truths.append((true_order, true_ori))
    # one single-contig group exercises the trivial path
    problems.append(opt.TourProblem(
        lengths=np.asarray([5000], np.int64),
        pair_a=np.zeros(0, np.int32), pair_b=np.zeros(0, np.int32),
        d=np.zeros((4, 0), np.float32), w=np.zeros(0, np.float32)))
    results = opt.optimize_tours(problems, npop=32, ngen=600, seed=1,
                                 log_every=200, chunk=1024, backend=backend)
    assert len(results) == 4
    assert results[3].order.tolist() == [0]
    for res, problem, (true_order, true_ori) in zip(results, problems,
                                                    truths):
        scores = [s for _, s in res.history]
        assert all(b >= a - 1e-6 for a, b in zip(scores, scores[1:]))
        true_score = _brute_score(problem, true_order,
                                  true_ori[true_order])
        assert res.score >= 0.95 * true_score
        got = _canonical_tour(res.order, res.ori)
        want = _canonical_tour(true_order, true_ori[true_order])
        assert got == want


def test_pallas_score_matches_xla():
    """The Pallas score kernel (VMEM-resident tour tables, on-chip
    one-hot matmuls) must reproduce the XLA scorer bit-for-bit-ish
    (HIGHEST-precision selection on both paths). Runs in interpret
    mode on CPU; the real-TPU path is exercised by the bench."""
    import jax.numpy as jnp
    rng = np.random.default_rng(9)
    G, P, k, R = 2, 6, 32, 1024
    lengths = rng.integers(1000, 500000, (G, k)).astype(np.int64)
    pa = rng.integers(0, k, (G, R)).astype(np.int32)
    pb = rng.integers(0, k, (G, R)).astype(np.int32)
    sel = pa == pb
    pb[sel] = (pb[sel] + 1) % k
    d = rng.integers(1, 100000, (G, 4, R)).astype(np.float32)
    w = rng.random((G, R)).astype(np.float32)
    order = np.stack([np.stack([rng.permutation(k).astype(np.int32)
                                for _ in range(P)]) for _ in range(G)])
    ori = rng.integers(0, 2, (G, P, k)).astype(np.int32)
    args = [jnp.asarray(x) for x in (order, ori, lengths, pa, pb, d, w)]
    ref = np.asarray(opt._score_batched(*args, R))
    got = np.asarray(opt._score_stacked_pallas(*args, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
