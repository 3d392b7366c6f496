"""Chained full-pipeline conformance vs the reference (VERDICT r3 §4).

Runs the reference's OWN cluster → reassign → sort(--skip_allhic) →
build chain (each stage driven through its standalone CLI via
refbridge, exactly as scripts/HapHiC_pipeline.py:484-532 chains them)
on a seeded simulation, then our run_pipeline(skip_allhic=True) on the
identical input, and asserts the final scaffolds are BYTE-IDENTICAL:
scaffolds.raw.agp (the BASELINE.json correctness target), the
SALSA-style scaffolds.agp, and scaffolds.fa. Per-stage parity tests
cannot see cross-stage drift; this one can.
"""

import os
import subprocess
import sys

from . import refbridge

CLUSTER_FLAGS = ['--Nx', '100', '--RE_site_cutoff', '0',
                 '--density_lower', '0', '--density_upper', '1',
                 '--rank_sum_upper', '1', '--flank', '0']
REASSIGN_FLAGS = ['--min_group_len', '0', '--min_RE_sites', '0',
                  '--min_links', '1']


def test_full_pipeline_agp_matches_reference(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run([sys.executable,
                    os.path.join(repo, 'tests', 'make_sim.py'),
                    str(tmp_path)], check=True, capture_output=True)
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        os.makedirs('ref_out')
        refbridge.run_reference_pipeline(
            'asm.fa', 'hic.pairs', 3, 'ref_out',
            cluster_flags=CLUSTER_FLAGS, reassign_flags=REASSIGN_FLAGS)

        from haphic_tpu.assign.reassign import ReassignParams
        from haphic_tpu.pipeline import PipelineConfig, run_pipeline
        cfg = PipelineConfig(
            Nx=100, RE_site_cutoff=0, density_lower='0',
            density_upper='1', rank_sum_upper='1', flank=0,
            skip_allhic=True,
            reassign=ReassignParams(min_group_len=0, min_RE_sites=0,
                                    min_links=1))
        run_pipeline('asm.fa', 'hic.pairs', nchrs=3, cfg=cfg,
                     outdir='our_out')

        for f in ('scaffolds.raw.agp', 'scaffolds.agp', 'scaffolds.fa'):
            ref = open(os.path.join('ref_out', '04.build', f), 'rb').read()
            ours = open(os.path.join('our_out', '04.build', f),
                        'rb').read()
            assert ref == ours, '{} diverged from the reference'.format(f)
        assert len(ref) > 0
    finally:
        os.chdir(cwd)
