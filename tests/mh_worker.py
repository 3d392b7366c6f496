"""Worker for the multi-process pipeline test: one JAX process of an
N-process distributed run over localhost (CPU backend, 2 virtual
devices per process). Usage:

    python mh_worker.py <pid> <nproc> <port> <workdir> [mode]

mode 'pipeline' (default) runs the full pipeline; mode 'sparse' runs
run_mcl_sparse over the global mesh (exercising the replicate-before-
fetch of sharded iterates that span non-addressable devices) and
saves the final iterates for comparison against a meshless run.
"""

import os
import sys


def main():
    pid, nproc, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else 'pipeline'
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_force_host_platform_device_count=2')
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(
        coordinator_address='127.0.0.1:{}'.format(port),
        num_processes=nproc, process_id=pid)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.chdir(workdir)
    if mode == 'sparse':
        run_sparse(pid)
        print('WORKER_OK', pid)
        return
    from haphic_tpu.assign.reassign import ReassignParams
    from haphic_tpu.pipeline import PipelineConfig, run_pipeline
    cfg = PipelineConfig(
        Nx=100, RE_site_cutoff=0, density_lower='0', density_upper='1',
        rank_sum_upper='1', flank=0, ngen=50, npop=16,
        remove_allelic_links=2,
        reassign=ReassignParams(min_group_len=0, min_RE_sites=0,
                                min_links=1))
    run_pipeline('asm.fa', 'hic.pairs', nchrs=3, cfg=cfg,
                 outdir='out_p{}'.format(pid))
    print('WORKER_OK', pid)


def run_sparse(pid: int):
    """Sparse MCL over the global 2-process mesh; the end-of-batch
    fetch must replicate sharded iterates before np.asarray."""
    import numpy as np
    from haphic_tpu.cluster.sparse_mcl import run_mcl_sparse
    from haphic_tpu.parallel.mesh import make_mesh
    rng = np.random.default_rng(5)
    n = 96
    i = rng.integers(0, n, 700)
    off = rng.integers(1, 6, 700)
    j = np.minimum(i + off, n - 1)
    w = rng.integers(1, 20, 700).astype(np.float64)
    mesh = make_mesh()
    res = run_mcl_sparse(i, j, w, n, [1.2, 2.0], K=32, max_iter=60,
                         mesh=mesh)
    np.savez('sparse_p{}.npz'.format(pid), idx=res.idx, val=res.val,
             iters=res.n_iters)


if __name__ == '__main__':
    main()
