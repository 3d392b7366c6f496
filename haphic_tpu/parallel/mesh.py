"""Device-mesh sharding for the two hot kernels.

The reference's only parallelism is a process pool over chromosome
groups plus MKL threads inside one SpGEMM (SURVEY.md §2.3). The
TPU-native equivalents implemented here:

  * MCL sweep — the inflation batch is the data-parallel axis: each
    device runs the full while-loop on its shard of the (B, n, n)
    stack, no cross-device traffic at all (the reference runs the
    sweep serially);
  * MCL at scale — for fragment counts where one (n, n) matrix busts a
    single chip's HBM, the matrix is 2-D sharded over the mesh and the
    expansion matmul's partial products ride ICI collectives inserted
    by XLA (see mcl_sharded_matrix);
  * tour optimization — population-parallel evolution: each device
    evolves its population shard; selection is a global top-P which XLA
    lowers to an all-gather of the (P,) score vector only (orders of
    magnitude smaller than the population itself).

Everything goes through jit + NamedSharding: we annotate placements and
let XLA insert psum/all-gather, per the scaling-book recipe.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_distributed_initialized = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize the JAX distributed runtime for multi-host execution.

    The 4-host execution model (BASELINE.md / SURVEY §2.3): every host
    runs the same `haphic` invocation; `jax.distributed.initialize`
    (auto-configured on TPU pods, or explicit via arguments /
    JAX_COORDINATOR_ADDRESS-style env) joins them into one runtime whose
    `jax.devices()` spans all chips. Ingest shards the alignment stream
    by process index and allreduces link tensors over DCN
    (parallel/ingest.py); the MCL sweep shards inflations or matrix
    columns over the global mesh (cluster/sparse_mcl.py, mesh=...); the
    sort stage shards group buckets. Collectives between co-located
    chips ride ICI; only ingest merge and cross-host matrix gathers
    touch DCN.

    Returns the process count. Safe to call multiple times; a no-op in
    single-process runs with no coordinator configured.
    """
    global _distributed_initialized
    import logging
    import os
    have_cfg = (coordinator_address
                or os.environ.get('JAX_COORDINATOR_ADDRESS')
                or os.environ.get('COORDINATOR_ADDRESS'))
    if not _distributed_initialized and have_cfg:
        kw = {}
        if coordinator_address:
            kw['coordinator_address'] = coordinator_address
        if num_processes is not None:
            kw['num_processes'] = num_processes
        if process_id is not None:
            kw['process_id'] = process_id
        try:
            jax.distributed.initialize(**kw)
            _distributed_initialized = True
        except Exception as e:     # misconfigured env must not kill runs
            logging.getLogger(__name__).warning(
                'jax.distributed.initialize failed (%s); continuing '
                'single-process', e)
    return jax.process_count()


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = 'data') -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def make_mesh_2d(rows: int, cols: int,
                 axis_names: Tuple[str, str] = ('x', 'y')) -> Mesh:
    devs = np.asarray(jax.devices()[:rows * cols]).reshape(rows, cols)
    return Mesh(devs, axis_names)


def shard_batch(mesh: Mesh, x, axis_name: str = 'data'):
    """Place ``x`` with its leading axis split across the mesh."""
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def host_fetch(mesh: Mesh, *arrays):
    """np.asarray for arrays that may be sharded across processes:
    replicate over the mesh (XLA all-gather) first — fetching a value
    that spans non-addressable devices raises otherwise."""
    rep = NamedSharding(mesh, P())
    outs = jax.jit(lambda *xs: xs,
                   out_shardings=tuple(rep for _ in arrays))(*arrays)
    return [np.asarray(o) for o in outs]


def mcl_sweep_sharded_partitions(mesh: Mesh, adjacency: np.ndarray,
                                 inflations, axis_name: str = 'data',
                                 expansion: int = 2, max_iter: int = 200,
                                 pruning: float = 1e-4,
                                 precision: str = 'high'):
    """Inflation-sharded dense sweep returning per-inflation cluster
    partitions (multi-process safe): the (B, n, n) results never leave
    the devices — only the packed nonzero bitmask is replicated and
    fetched. Returns (partitions, n_iters, converged)."""
    from haphic_tpu.cluster import mcl as mcl_mod

    n_dev = mesh.devices.size
    infl = np.asarray(inflations, dtype=np.float32)
    B = len(infl)
    pad = (-B) % n_dev
    infl_p = np.pad(infl, (0, pad), constant_values=infl[-1] if B else 1.0)
    m = adjacency.shape[0]
    n = max(mcl_mod.MXU_TILE,
            ((m + mcl_mod.MXU_TILE - 1) // mcl_mod.MXU_TILE)
            * mcl_mod.MXU_TILE)
    a = mcl_mod._pad_to(adjacency.astype(np.float32), n)
    with mesh:
        precision = precision or 'high'
        pre = mcl_mod._colnorm(jnp.asarray(a))
        pre = mcl_mod._matpower(pre, expansion, precision)
        pre = replicate(mesh, pre)
        infl_s = shard_batch(mesh, jnp.asarray(infl_p), axis_name)
        mats, iters, conv = mcl_mod._mcl_batched(
            pre, infl_s, expansion, max_iter, float(pruning), precision)
        packed = mcl_mod._pack_nz(mats)
        packed, iters, conv = host_fetch(mesh, packed, iters, conv)
    parts = []
    for b in range(B):
        nz = np.unpackbits(packed[b], axis=-1)[:m, :m]
        parts.append(mcl_mod.interpret_result(nz))
    return parts, iters[:B], conv[:B]


def mcl_sweep_sharded(mesh: Mesh, adjacency: np.ndarray,
                      inflations, axis_name: str = 'data', **kw):
    """Inflation-parallel MCL sweep: the (B, n, n) stack is sharded on
    the inflation axis; every device runs the identical while-loop on
    its shard (fully independent — zero collectives).

    Returns full result MATRICES — single-process only (fetching them
    raises on a multi-process mesh) and heavy on the wire; the
    production pipeline path is mcl_sweep_sharded_partitions, which
    ships only the packed nonzero bitmask."""
    from haphic_tpu.cluster import mcl as mcl_mod

    n_dev = mesh.devices.size
    infl = np.asarray(inflations, dtype=np.float32)
    B = len(infl)
    pad = (-B) % n_dev
    infl_p = np.pad(infl, (0, pad), constant_values=infl[-1] if B else 1.0)

    m = adjacency.shape[0]
    n = max(mcl_mod.MXU_TILE,
            ((m + mcl_mod.MXU_TILE - 1) // mcl_mod.MXU_TILE)
            * mcl_mod.MXU_TILE)
    a = mcl_mod._pad_to(adjacency.astype(np.float32), n)
    with mesh:
        # precision='high' (3-pass bf16) is the measured-fast default on
        # TPU, same as the single-chip path (cluster/mcl.py docstring);
        # 'highest' (6-pass fp32 emulation) is ~20x slower.
        precision = kw.get('precision', 'high')
        pre = mcl_mod._colnorm(jnp.asarray(a))
        pre = mcl_mod._matpower(pre, kw.get('expansion', 2), precision)
        pre = replicate(mesh, pre)
        infl_s = shard_batch(mesh, jnp.asarray(infl_p), axis_name)
        mats, iters, conv = mcl_mod._mcl_batched(
            pre, infl_s, kw.get('expansion', 2), kw.get('max_iter', 200),
            float(kw.get('pruning', 1e-4)), precision)
        mats = np.asarray(mats)[:B, :m, :m]
        return mcl_mod.MCLResult(matrices=mats,
                                 n_iters=np.asarray(iters)[:B],
                                 converged=np.asarray(conv)[:B])


def mcl_sharded_matrix(mesh: Mesh, adjacency: np.ndarray, inflation: float,
                       axis_name: str = 'data', expansion: int = 2,
                       max_iter: int = 200, pruning: float = 1e-4,
                       precision: str = 'high'):
    """Single-inflation MCL with the (n, n) matrix row-sharded across
    the mesh — for fragment counts too large for one chip's HBM. The
    expansion matmul contracts over the sharded row axis, which XLA
    lowers to all-gather/psum over ICI."""
    from haphic_tpu.cluster import mcl as mcl_mod

    n_dev = mesh.devices.size
    m = adjacency.shape[0]
    tile = mcl_mod.MXU_TILE * n_dev
    n = max(tile, ((m + tile - 1) // tile) * tile)
    a = mcl_mod._pad_to(adjacency.astype(np.float32), n)
    with mesh:
        x = jax.device_put(jnp.asarray(a),
                           NamedSharding(mesh, P(axis_name, None)))
        pre = mcl_mod._colnorm(x)
        pre = mcl_mod._matpower(pre, expansion, precision)
        mats, iters, conv = mcl_mod._mcl_batched(
            pre, jnp.asarray([inflation], jnp.float32), expansion,
            max_iter, pruning, precision)
        return np.asarray(mats)[0, :m, :m]


def evolve_sharded(mesh: Mesh, problem, npop: int, ngen: int,
                   mutprob: float = 0.2, seed: int = 42,
                   axis_name: str = 'data', chunk: int = 1 << 12):
    """Population-parallel GA step: population rows sharded across the
    mesh, CLM records replicated. Returns host arrays of the evolved
    population (best-first)."""
    from haphic_tpu.order import optimize as opt

    k_pad = opt._bucket(problem.k, 8)
    lengths = np.zeros(k_pad, dtype=np.int64)
    lengths[:problem.k] = problem.lengths
    pa, pb, d, w, _ = opt._pad_records(problem, chunk)
    base = np.arange(k_pad, dtype=np.int32)
    order = np.broadcast_to(base, (npop, k_pad)).copy()
    ori = np.zeros((npop, k_pad), dtype=np.int32)

    with mesh:
        order_s = shard_batch(mesh, jnp.asarray(order), axis_name)
        ori_s = shard_batch(mesh, jnp.asarray(ori), axis_name)
        rep = lambda x: replicate(mesh, jnp.asarray(x))
        o, r, s = opt._evolve(jax.random.PRNGKey(seed), order_s, ori_s,
                              rep(lengths), rep(pa), rep(pb), rep(d),
                              rep(w), mutprob, chunk, ngen)
        return np.asarray(o), np.asarray(r), np.asarray(s)
