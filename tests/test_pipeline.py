"""End-to-end pipeline test on a simulated clustered genome."""

import os
import random

import numpy as np
import pytest

from haphic_tpu.pipeline import PipelineConfig, run_pipeline

from . import util


@pytest.fixture(scope='module')
def sim(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('pipe')
    rng = random.Random(13)
    ctgs, recs, chrom_of = util.clustered_genome_and_pairs(
        rng, nchrs=3, ctgs_per_chr=5, ctg_len=8000, n_pairs=30000)
    fa = tmp / 'asm.fa'
    pr = tmp / 'hic.pairs'
    util.write_genome(str(fa), ctgs)
    util.write_pairs(str(pr), recs)
    return tmp, str(fa), str(pr), chrom_of


def test_pipeline_end_to_end(sim):
    tmp, fa, pairs, chrom_of = sim
    out = tmp / 'run1'
    cfg = PipelineConfig(
        Nx=100, RE_site_cutoff=0,
        density_lower='0', density_upper='1',
        rank_sum_upper='1',
        ngen=200, npop=16, flank=0)
    cfg.reassign.min_group_len = 0
    cfg.reassign.min_RE_sites = 0
    cfg.reassign.min_links = 1
    res = run_pipeline(fa, pairs, nchrs=3, cfg=cfg, outdir=str(out))

    # stage artifacts in the reference layout
    assert (out / '01.cluster' / 'HT_links.pkl').exists()
    assert (out / '01.cluster' / 'paired_links.clm').exists()
    assert (out / '01.cluster' / 'full_links.pkl').exists()
    assert (out / '02.reassign' / 'final_groups' /
            'final_clusters.txt').exists()
    assert (out / '02.reassign' / 'split_clms').is_dir()
    assert (out / '03.sort' / 'final_tours').is_dir()
    fa_out, agp, raw = res.scaffold_files
    assert os.path.exists(fa_out) and os.path.exists(agp) \
        and os.path.exists(raw)

    # recommendation is a value, not a regexed log line
    assert res.cluster.sweep.recommended_inflation is not None

    # each chromosome becomes exactly one scaffold with all its contigs
    groups = {}
    for gname, tour in res.sort.tours.items():
        members = {c for c, _ in tour}
        chroms = {chrom_of[c] for c in members}
        assert len(chroms) == 1, 'mixed chromosomes in one group'
        groups[chroms.pop()] = members
    expected = {}
    for name, c in chrom_of.items():
        expected.setdefault(c, set()).add(name)
    assert groups == expected

    # AGP sanity: every contig appears exactly once across scaffolds
    seen = []
    for line in open(agp):
        cols = line.split('\t')
        if cols[4] == 'W':
            seen.append(cols[5])
    assert sorted(seen) == sorted(chrom_of)

    # scaffold FASTA holds 3 scaffolds whose lengths match the AGP
    from haphic_tpu.io.fasta import iter_fasta
    scaf_lens = {name: len(seq) for name, seq in iter_fasta(fa_out)}
    assert len(scaf_lens) == 3
    agp_ends = {}
    for line in open(agp):
        cols = line.split('\t')
        agp_ends[cols[0]] = int(cols[2])
    assert scaf_lens == agp_ends


def test_pipeline_quick_view_steps(sim):
    tmp, fa, pairs, chrom_of = sim
    out = tmp / 'run2'
    cfg = PipelineConfig(Nx=100, steps='1')
    res = run_pipeline(fa, pairs, nchrs=3, cfg=cfg, outdir=str(out))
    assert res.reassign is None and res.sort is None
    assert (out / '01.cluster' / 'HT_links.pkl').exists()
