#!/usr/bin/env python3
"""Write a small simulated assembly + Hi-C pairs file into a directory
(default: cwd) for ad-hoc end-to-end drives of the CLI:

    python /root/repo/tests/make_sim.py . [nchrs] [ctgs_per_chr]
    /root/repo/haphic pipeline asm.fa hic.pairs <nchrs> --outdir out
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests import util


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else '.'
    nchrs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ctgs_per_chr = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    rng = random.Random(12345)
    ctgs, recs, chrom_of = util.clustered_genome_and_pairs(
        rng, nchrs=nchrs, ctgs_per_chr=ctgs_per_chr, ctg_len=8000,
        n_pairs=8000 * nchrs * ctgs_per_chr // 5)
    util.write_genome(os.path.join(outdir, 'asm.fa'), ctgs)
    util.write_pairs(os.path.join(outdir, 'hic.pairs'), recs)
    print('wrote {}/asm.fa ({} contigs, {} chromosomes) and '
          '{}/hic.pairs ({} pairs)'.format(
              outdir, len(ctgs), nchrs, outdir, len(recs)))


if __name__ == '__main__':
    main()
