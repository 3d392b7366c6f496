"""Worker for the multi-process pipeline test: one JAX process of an
N-process distributed run over localhost (CPU backend, 2 virtual
devices per process). Usage:

    python mh_worker.py <pid> <nproc> <port> <workdir>
"""

import os
import sys


def main():
    pid, nproc, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
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


if __name__ == '__main__':
    main()
