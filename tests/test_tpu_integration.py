"""On-device end-to-end integration test.

Skipped by default (the suite pins JAX to CPU, conftest.py); run with

    HAPHIC_TEST_TPU=1 python -m pytest tests/test_tpu_integration.py -q

to execute the README quick start against the real accelerator and
assert it completes in production-acceptable wall time. This guards the
round-1 headline defect: every stage compiled fresh per process and the
15-contig toy took >7 minutes on the TPU (fixed by dispatching
below-device-scale problems to numpy/native kernels —
haphic_tpu/cluster/mcl.py run_mcl, haphic_tpu/order/optimize.py
optimize_tours).
"""

import os
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get('HAPHIC_TEST_TPU'),
    reason='device integration test; set HAPHIC_TEST_TPU=1')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_quick_start_wall_time(tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(REPO, 'tests', 'make_sim.py'),
         str(tmp_path)], check=True)
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)   # let jax pick the real device
    t0 = time.time()
    subprocess.run(
        [sys.executable, os.path.join(REPO, 'haphic'), 'pipeline',
         'asm.fa', 'hic.pairs', '3', '--outdir', 'out',
         '--Nx', '100', '--RE_site_cutoff', '0', '--density_lower', '0',
         '--density_upper', '1', '--rank_sum_upper', '1', '--flank', '0',
         '--min_group_len', '0', '--min_RE_sites', '0',
         '--min_links', '1'],
        cwd=str(tmp_path), env=env, check=True, timeout=600)
    elapsed = time.time() - t0
    agp = tmp_path / 'out' / '04.build' / 'scaffolds.agp'
    assert agp.exists()
    lines = agp.read_text().splitlines()
    ctgs = {f.split('\t')[5] for f in lines if '\tW\t' in f}
    assert len(ctgs) == 15          # every toy contig anchored
    assert elapsed < 60, 'quick start took {:.1f}s on device'.format(elapsed)
