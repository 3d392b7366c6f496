"""True multi-process execution of the full pipeline.

Two JAX processes join a distributed runtime over localhost (the
CPU-backend stand-in for a multi-host TPU pod), each consuming its
stride of the alignment stream, exchanging link tensors over the
collective backend, and running the mesh-sharded cluster + sort
stages. The scaffolds they build must be byte-identical to each other
AND to a plain single-process run — the SPMD-consistency contract of
the 4-host execution model (BASELINE.md; SURVEY.md §2.3).
"""

import os
import socket
import subprocess
import sys

import pytest

from . import util

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sparse_mcl_matches_single(tmp_path):
    """run_mcl_sparse on a 2-process/4-device mesh: the end-of-batch
    fetch of sharded iterates must replicate first (it would raise on
    non-addressable shards otherwise), and the fetched iterates must
    be bitwise-identical to a meshless single-process run."""
    import numpy as np
    from haphic_tpu.cluster.sparse_mcl import run_mcl_sparse
    rng = np.random.default_rng(5)
    n = 96
    i = rng.integers(0, n, 700)
    off = rng.integers(1, 6, 700)
    j = np.minimum(i + off, n - 1)
    w = rng.integers(1, 20, 700).astype(np.float64)
    ref = run_mcl_sparse(i, j, w, n, [1.2, 2.0], K=32, max_iter=60)

    port = _free_port()
    env = dict(os.environ)
    env.pop('HAPHIC_JAX_CACHE_DIR', None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, 'tests', 'mh_worker.py'),
         str(p), '2', str(port), str(tmp_path), 'sparse'],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for p in range(2)]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    for pid in range(2):
        got = np.load(str(tmp_path / 'sparse_p{}.npz'.format(pid)))
        np.testing.assert_array_equal(got['idx'], ref.idx)
        np.testing.assert_array_equal(got['val'], ref.val)
        np.testing.assert_array_equal(got['iters'], ref.n_iters)


@pytest.mark.slow
def test_two_process_pipeline_matches_single(tmp_path):
    import random
    rng = random.Random(12345)
    ctgs, recs, _ = util.clustered_genome_and_pairs(
        rng, nchrs=3, ctgs_per_chr=5, ctg_len=8000, n_pairs=24000)
    util.write_genome(str(tmp_path / 'asm.fa'), ctgs)
    util.write_pairs(str(tmp_path / 'hic.pairs'), recs)

    # single-process oracle (in-process, meshless)
    from haphic_tpu.assign.reassign import ReassignParams
    from haphic_tpu.pipeline import PipelineConfig, run_pipeline
    cfg = PipelineConfig(
        Nx=100, RE_site_cutoff=0, density_lower='0', density_upper='1',
        rank_sum_upper='1', flank=0, ngen=50, npop=16,
        remove_allelic_links=2,
        reassign=ReassignParams(min_group_len=0, min_RE_sites=0,
                                min_links=1))
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        run_pipeline('asm.fa', 'hic.pairs', nchrs=3, cfg=cfg,
                     outdir='out_single')
    finally:
        os.chdir(cwd)

    port = _free_port()
    env = dict(os.environ)
    env.pop('HAPHIC_JAX_CACHE_DIR', None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, 'tests', 'mh_worker.py'),
         str(p), '2', str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for p in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    single = (tmp_path / 'out_single' / '04.build'
              / 'scaffolds.agp').read_bytes()
    for pid in range(2):
        agp = (tmp_path / 'out_p{}'.format(pid) / '04.build'
               / 'scaffolds.agp').read_bytes()
        assert agp == single, 'process {} diverged'.format(pid)
        raw = (tmp_path / 'out_p{}'.format(pid) / '04.build'
               / 'scaffolds.raw.agp').read_bytes()
        sraw = (tmp_path / 'out_single' / '04.build'
                / 'scaffolds.raw.agp').read_bytes()
        assert raw == sraw
