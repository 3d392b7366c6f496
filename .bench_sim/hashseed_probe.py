#!/usr/bin/env python3
"""Hash-seed determinism probe (VERDICT r4 item 3 evidence).

Runs either the reference 4-stage pipeline (via tests/refbridge) or
our run_pipeline on the given sim in THIS process — the parent launches
it under different PYTHONHASHSEED values — and prints one JSON line
with the md5 of every final artifact, so reference-vs-our and
seed-vs-seed byte stability can be established from real runs.

Usage: hashseed_probe.py {ref|ours} <fa> <pairs> <nchrs> <workdir>
"""

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))

CLUSTER_FLAGS = ['--Nx', '100', '--RE_site_cutoff', '0',
                 '--density_lower', '0', '--density_upper', '1',
                 '--rank_sum_upper', '1', '--flank', '0']
REASSIGN_FLAGS = ['--min_group_len', '0', '--min_RE_sites', '0',
                  '--min_links', '1']


def md5(path):
    h = hashlib.md5()
    with open(path, 'rb') as f:
        for blk in iter(lambda: f.read(1 << 20), b''):
            h.update(blk)
    return h.hexdigest()


def main():
    mode, fa, pairs, nchrs, workdir = sys.argv[1:6]
    fa = os.path.abspath(fa)
    pairs = os.path.abspath(pairs)
    os.makedirs(workdir, exist_ok=True)
    if mode == 'ref':
        import refbridge
        refbridge.run_reference_pipeline(
            fa, pairs, int(nchrs), workdir,
            cluster_flags=CLUSTER_FLAGS, reassign_flags=REASSIGN_FLAGS)
    else:
        from haphic_tpu.assign.reassign import ReassignParams
        from haphic_tpu.pipeline import PipelineConfig, run_pipeline
        cfg = PipelineConfig(
            Nx=100, RE_site_cutoff=0, density_lower='0',
            density_upper='1', rank_sum_upper='1', flank=0,
            skip_allhic=True,
            reassign=ReassignParams(min_group_len=0, min_RE_sites=0,
                                    min_links=1))
        run_pipeline(fa, pairs, nchrs=int(nchrs), cfg=cfg,
                     outdir=workdir)
    out = {'mode': mode,
           'hashseed': os.environ.get('PYTHONHASHSEED', 'random')}
    for f in ('scaffolds.raw.agp', 'scaffolds.agp', 'scaffolds.fa'):
        out[f] = md5(os.path.join(workdir, '04.build', f))
    print(json.dumps(out))


if __name__ == '__main__':
    main()
