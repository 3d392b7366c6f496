#!/usr/bin/env python3
"""One-time reference-chain baseline measurement (auditable protocol).

This is the protocol script behind the long CPU baselines cached in
bench_baselines.json (`cluster_e2e_big_ref`, `pipeline_e2e_16k_ref`):
it runs the reference's OWN 4-stage chain (cluster -> reassign ->
sort --skip_allhic -> build, driven in-process through each stage's
standalone CLI exactly as scripts/HapHiC_pipeline.py:484-532 chains
them) on the cached 16k-fragment / 10M-pair simulation with the same
flags bench.py passes to both sides, times every stage, and records
the result JSON. Run under a pinned interpreter hash seed so the
measurement is reproducible bit-for-bit where the reference is
deterministic:

    PYTHONHASHSEED=0 JAX_PLATFORMS=cpu \
        python .bench_sim/measure_chain.py [--stage cluster|full] \
        [--out out.json]

The resulting entry is merged into bench_baselines.json by hand or by
`--commit`; bench.py treats these entries as one-time measurements it
can never re-verify inside its 540 s budget (the full chain costs
~4 h on this host), which is why the protocol, host, and date ride
along in the cache entry.
"""

import argparse
import json
import os
import platform
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))

import bench  # noqa: E402
import refbridge  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--stage', choices=['cluster', 'full'],
                    default='full')
    ap.add_argument('--out', default=None)
    ap.add_argument('--commit', action='store_true',
                    help='merge the result into bench_baselines.json')
    args = ap.parse_args()

    fa, pairs = bench.make_sim(None, bench.SIM_BIG)
    params = dict(bench.SIM_BIG)
    params['inflation'] = list(bench.BIG_INFLATION)
    params['skip_allhic'] = True

    workdir = tempfile.mkdtemp(prefix='haphic_chain16k_')
    stage_times = {}
    t0 = time.time()
    try:
        if args.stage == 'full':
            refbridge.run_reference_pipeline(
                fa, pairs, bench.SIM_BIG['nchrs'], workdir,
                cluster_flags=bench.CLUSTER_FLAGS + bench.BIG_FLAGS,
                reassign_flags=bench.REASSIGN_FLAGS,
                stage_times=stage_times)
        else:
            raise SystemExit('cluster-only: use bench.py cluster_e2e_16k')
        total = time.time() - t0
        raw = os.path.join(workdir, '04.build', 'scaffolds.raw.agp')
        entry = {
            'secs': round(total, 2),
            'stage_secs': stage_times,
            'params': params,
            'raw_agp_md5': bench._md5(raw),
            'raw_agp_partition': bench._agp_partition_md5(raw),
            'measured': time.strftime('%Y-%m-%d'),
            'protocol': '.bench_sim/measure_chain.py --stage full',
            'hashseed': os.environ.get('PYTHONHASHSEED', 'random'),
            'host': platform.node(),
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    out = json.dumps({'pipeline_e2e_16k_ref': entry}, indent=1)
    if args.out:
        with open(args.out, 'w') as f:
            f.write(out + '\n')
    print(out)
    if args.commit:
        cache = bench._load_cache()
        cache['pipeline_e2e_16k_ref'] = entry
        bench._save_cache(cache)


if __name__ == '__main__':
    main()
