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


def test_pipeline_quick_view_mode(sim):
    """--quick_view: cluster exits after HT_links.pkl, reassign mocks a
    single all-contig group, sort skips the GA (reference
    scripts/HapHiC_cluster.py:2884-2887, HapHiC_reassign.py:787-818,
    HapHiC_sort.py:869-870)."""
    tmp, fa, pairs, chrom_of = sim
    out = tmp / 'run_qv'
    cfg = PipelineConfig(quick_view=True)
    res = run_pipeline(fa, pairs, nchrs=3, cfg=cfg, outdir=str(out))

    # cluster stage stops at HT_links.pkl: no clm, no clustering outputs
    assert (out / '01.cluster' / 'HT_links.pkl').exists()
    assert not (out / '01.cluster' / 'paired_links.clm').exists()
    assert not (out / '01.cluster' / 'full_links.pkl').exists()
    assert res.cluster.sweep is None

    # reassign mocks one group holding every contig (no GFA)
    clusters = (out / '02.reassign' / 'final_groups' /
                'final_clusters.txt').read_text().splitlines()
    assert len(clusters) == 2             # header + one group
    gname, nctg, ctgs = clusters[1].split('\t')
    assert int(nctg) == len(chrom_of)
    assert set(ctgs.split()) == set(chrom_of)
    assert (out / '02.reassign' / 'final_groups' /
            '{}.txt'.format(gname)).exists()
    assert not (out / '02.reassign' / 'split_clms').exists()

    # sort ran fast sort only (skip_allhic forced): no .tour GA history
    tours = list((out / '03.sort' / 'final_tours').glob('*.tour'))
    assert len(tours) == 1
    body = tours[0].read_text()
    assert '>GA' not in body

    # build still emits scaffolds covering every contig
    _, agp, _ = res.scaffold_files
    seen = [l.split('\t')[5] for l in open(agp) if '\tW\t' in l]
    assert sorted(seen) == sorted(chrom_of)


def test_pipeline_quick_view_per_hap_groups(sim):
    """With >1 GFA, quick view mocks one group per haplotype
    (reference scripts/HapHiC_reassign.py:798-814)."""
    tmp, fa, pairs, chrom_of = sim
    names = sorted(chrom_of)
    half = len(names) // 2
    gfas = []
    for h, sub in enumerate((names[:half], names[half:])):
        p = tmp / 'hap{}.gfa'.format(h)
        with open(p, 'w') as f:
            for name in sub:
                f.write('S\t{}\t*\tLN:i:8000\trd:i:30\n'.format(name))
        gfas.append(str(p))
    out = tmp / 'run_qv_hap'
    cfg = PipelineConfig(quick_view=True, gfa=','.join(gfas))
    run_pipeline(fa, pairs, nchrs=3, cfg=cfg, outdir=str(out))
    clusters = (out / '02.reassign' / 'final_groups' /
                'final_clusters.txt').read_text().splitlines()
    assert len(clusters) == 3             # header + two haplotype groups
    got = [set(l.split('\t')[2].split()) for l in clusters[1:]]
    assert got == [set(names[:half]), set(names[half:])]
