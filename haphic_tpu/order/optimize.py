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

import functools
import logging
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

logger = logging.getLogger(__name__)

CHUNK = 1 << 14          # CLM records per scan step


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


def _pad_records(p: TourProblem, chunk: int):
    R = p.n_records
    # power-of-two number of chunks so the scan length is bucketed too
    Rp = _bucket(max(R, 1), chunk)
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
    """
    P, k = order.shape
    lengths = lengths.astype(jnp.float32)
    L_at_slot = lengths[order]                         # (P, k)
    starts = jnp.cumsum(L_at_slot, axis=1) - L_at_slot  # (P, k) slot offsets
    # invert the permutation: pos_of[p, c] = slot of contig c
    pos_of = jnp.zeros((P, k), jnp.int32)
    pos_of = pos_of.at[jnp.arange(P)[:, None], order].set(
        jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), (P, k)))
    start_of = jnp.take_along_axis(starts, pos_of, axis=1)  # (P, k) by contig
    ori_of = jnp.take_along_axis(ori, pos_of, axis=1)       # (P, k) by contig

    nchunks = pa.shape[0] // chunk

    def body(carry, xs):
        cpa, cpb, cd, cw = xs                          # (chunk,), (4, chunk)
        pos_a = pos_of[:, cpa]                         # (P, chunk)
        pos_b = pos_of[:, cpb]
        sa = start_of[:, cpa]
        sb = start_of[:, cpb]
        la = lengths[cpa][None, :]
        lb = lengths[cpb][None, :]
        a_first = pos_a < pos_b
        gap = jnp.where(a_first, sb - (sa + la), sa - (sb + lb))
        oa = ori_of[:, cpa]
        ob = ori_of[:, cpb]
        combo = 2 * oa + ob
        combo = jnp.where(a_first, combo, 3 - combo)   # (P, chunk)
        dval = cd[combo, jnp.arange(cd.shape[1])[None, :]]  # (P, chunk)
        dist = jnp.maximum(gap + dval, 1.0)
        contrib = (cw[None, :] / dist).sum(axis=1)
        return carry + contrib, None

    xs = (pa.reshape(nchunks, chunk), pb.reshape(nchunks, chunk),
          d.reshape(4, nchunks, chunk).transpose(1, 0, 2),
          w.reshape(nchunks, chunk))
    total, _ = lax.scan(body, jnp.zeros((P,), jnp.float32), xs)
    return total


def _mutate(key, order, ori, mutprob):
    """One mutation per individual: swap / segment inversion / block
    rotation / segment orientation flip, chosen uniformly; applied with
    probability ``mutprob`` (else identity)."""
    P, k = order.shape
    keys = jax.random.split(key, 5)
    do = jax.random.uniform(keys[0], (P,)) < mutprob
    op = jax.random.randint(keys[1], (P,), 0, 4)
    e1 = jax.random.randint(keys[2], (P,), 0, k)
    e2 = jax.random.randint(keys[3], (P,), 0, k)
    e3 = jax.random.randint(keys[4], (P,), 0, k)
    i = jnp.minimum(e1, e2)
    j = jnp.maximum(e1, e2)
    idx = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), (P, k))
    ii = i[:, None]
    jj = j[:, None]

    # swap i <-> j
    src_swap = jnp.where(idx == ii, jj, jnp.where(idx == jj, ii, idx))

    # inversion of [i, j]
    in_span = (idx >= ii) & (idx <= jj)
    src_inv = jnp.where(in_span, ii + jj - idx, idx)

    # block rotation of [i, t) by (j - i): requires i <= j <= t
    t = jnp.maximum(j, e3)[:, None]
    span = jnp.maximum(t - ii, 1)
    in_rot = (idx >= ii) & (idx < t)
    src_rot = jnp.where(in_rot, ii + (idx - ii + (jj - ii)) % span, idx)

    src = jnp.where(op[:, None] == 0, src_swap,
                    jnp.where(op[:, None] == 1, src_inv,
                              jnp.where(op[:, None] == 2, src_rot, idx)))
    rows = jnp.arange(P)[:, None]
    new_order = order[rows, src]
    new_ori = ori[rows, src]
    # inversion flips orientations in the span; op 3 flips span only
    flip = ((op[:, None] == 1) & in_span) | ((op[:, None] == 3) & in_span)
    new_ori = jnp.where(flip, 1 - new_ori, new_ori)

    keep = ~do
    new_order = jnp.where(keep[:, None], order, new_order)
    new_ori = jnp.where(keep[:, None], ori, new_ori)
    return new_order, new_ori


@functools.partial(jax.jit, static_argnames=('chunk', 'ngen'))
def _evolve(key, order, ori, lengths, pa, pb, d, w, mutprob,
            chunk: int, ngen: int):
    """Run `ngen` generations of (mu + lambda) evolution.

    Population layout: row 0..P-1. Each generation:
      parents = current population (sorted best-first)
      offspring = mutated parents
      next population = best P of parents + offspring
    """
    P = order.shape[0]

    def gen(n, state):
        key, order, ori, scores = state
        key, k1 = jax.random.split(key)
        off_order, off_ori = _mutate(k1, order, ori, mutprob)
        off_scores = _score_population(off_order, off_ori, lengths,
                                       pa, pb, d, w, chunk)
        all_order = jnp.concatenate([order, off_order], axis=0)
        all_ori = jnp.concatenate([ori, off_ori], axis=0)
        all_scores = jnp.concatenate([scores, off_scores], axis=0)
        top = jnp.argsort(-all_scores)[:P]
        return (key, all_order[top], all_ori[top], all_scores[top])

    scores = _score_population(order, ori, lengths, pa, pb, d, w, chunk)
    state = (key, order, ori, scores)
    state = lax.fori_loop(0, ngen, gen, state)
    _, order, ori, scores = state
    return order, ori, scores


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
                  chunk: int = CHUNK) -> GAResult:
    """Evolve tours for one group. ``hot_start`` is (order, ori) from
    fast sorting (`--resume` semantics, scripts/HapHiC_sort.py:631-632).
    """
    k = problem.k
    if k <= 1:
        order = np.zeros(max(k, 1), dtype=np.int32)[:k]
        return GAResult(order=order, ori=np.zeros_like(order), score=0.0,
                        history=[])
    # pad the contig axis with zero-length dummies: they never appear in
    # a CLM record and add zero length, so any position they take in a
    # tour is score-neutral — this buckets compiled shapes across groups
    k_pad = _bucket(k, 8)
    lengths_padded = np.zeros(k_pad, dtype=np.int64)
    lengths_padded[:k] = problem.lengths
    pa, pb, d, w, _ = _pad_records(problem, chunk)
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

    done = 0
    while done < ngen:
        step = min(log_every, ngen - done)
        key, kg = jax.random.split(key)
        order, ori, scores = _evolve(kg, order, ori, lengths, pa, pb, d, w,
                                     mutprob, chunk, step)
        done += step
        best = float(scores[0])
        history.append((done, best))
        logger.debug('GA generation %d: best score %.6f', done, best)

    o, r = strip(order[0], ori[0])
    return GAResult(order=o, ori=r, score=float(scores[0]), history=history)


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
