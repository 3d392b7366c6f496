"""Shared helpers for tests: tiny simulated assemblies + pairs files."""

import random

import numpy as np

BASES = 'ATCG'


def random_genome(rng, n_ctg=8, min_len=2000, max_len=20000):
    """Random contigs with GATC sites sprinkled in."""
    ctgs = {}
    for i in range(n_ctg):
        L = rng.randrange(min_len, max_len)
        seq = ''.join(rng.choice(BASES) for _ in range(L))
        ctgs['ctg{}'.format(i + 1)] = seq
    return ctgs


def write_genome(path, ctgs, width=70):
    with open(path, 'w') as f:
        for name, seq in ctgs.items():
            f.write('>{}\n'.format(name))
            for i in range(0, len(seq), width):
                f.write(seq[i:i + width] + '\n')


def random_pairs(rng, ctgs, n_pairs=2000, intra_frac=0.3):
    """Random Hi-C pairs records: (readid, ref, pos1based, mref, mpos)."""
    names = list(ctgs)
    recs = []
    for k in range(n_pairs):
        if rng.random() < intra_frac:
            a = b = rng.choice(names)
        else:
            a, b = rng.choice(names), rng.choice(names)
        pa = rng.randrange(1, len(ctgs[a]) + 1)
        pb = rng.randrange(1, len(ctgs[b]) + 1)
        recs.append(('read{}'.format(k), a, pa, b, pb))
    return recs


def write_pairs(path, recs):
    with open(path, 'w') as f:
        f.write('## pairs format v1.0\n')
        f.write('#columns: readID chrom1 position1 chrom2 position2 strand1 strand2\n')
        for rid, a, pa, b, pb in recs:
            f.write('{}\t{}\t{}\t{}\t{}\t+\t-\n'.format(rid, a, pa, b, pb))


def clustered_genome_and_pairs(rng, nchrs=3, ctgs_per_chr=6, ctg_len=6000,
                               n_pairs=30000, noise=0.02):
    """Contigs grouped into `nchrs` chromosomes; Hi-C pairs mostly
    intra-chromosome with distance-decaying contact positions, so MCL
    should recover the chromosome grouping."""
    ctgs = {}
    chrom_of = {}
    order = []
    for c in range(nchrs):
        for i in range(ctgs_per_chr):
            name = 'chr{}_ctg{}'.format(c + 1, i + 1)
            seq = ''.join(rng.choice(BASES) for _ in range(ctg_len))
            ctgs[name] = seq
            chrom_of[name] = c
            order.append(name)

    names = list(ctgs)
    recs = []
    for k in range(n_pairs):
        if rng.random() < noise:
            a, b = rng.choice(names), rng.choice(names)
        else:
            c = rng.randrange(nchrs)
            # prefer adjacent contigs on the same chromosome
            i = rng.randrange(ctgs_per_chr)
            j = min(max(i + int(rng.gauss(0, 1.2)), 0), ctgs_per_chr - 1)
            a = 'chr{}_ctg{}'.format(c + 1, i + 1)
            b = 'chr{}_ctg{}'.format(c + 1, j + 1)
        pa = rng.randrange(1, len(ctgs[a]) + 1)
        pb = rng.randrange(1, len(ctgs[b]) + 1)
        recs.append(('read{}'.format(k), a, pa, b, pb))
    return ctgs, recs, chrom_of
