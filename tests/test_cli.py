"""CLI integration: run every stage standalone on the previous stage's
reference-format artifacts (the file-level contract users rely on)."""

import glob
import os
import random

import pytest

from haphic_tpu.cli import main

from . import util


@pytest.fixture(scope='module')
def staged(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('cli')
    rng = random.Random(23)
    ctgs, recs, chrom_of = util.clustered_genome_and_pairs(
        rng, nchrs=2, ctgs_per_chr=4, ctg_len=8000, n_pairs=16000)
    fa = tmp / 'asm.fa'
    pairs = tmp / 'hic.pairs'
    util.write_genome(str(fa), ctgs)
    util.write_pairs(str(pairs), recs)
    return tmp, str(fa), str(pairs), chrom_of


def test_staged_cli(staged):
    tmp, fa, pairs, chrom_of = staged
    c_dir = str(tmp / '01.cluster')
    r_dir = str(tmp / '02.reassign')
    s_dir = str(tmp / '03.sort')
    b_dir = str(tmp / '04.build')
    os.makedirs(r_dir)
    os.makedirs(s_dir)
    os.makedirs(b_dir)

    # 1) cluster
    assert main(['cluster', fa, pairs, '2', '--outdir', c_dir,
                 '--Nx', '100', '--RE_site_cutoff', '0',
                 '--density_lower', '0', '--density_upper', '1',
                 '--rank_sum_upper', '1', '--flank', '0']) == 0
    assert os.path.exists(os.path.join(c_dir, 'full_links.pkl'))
    clusters = glob.glob(os.path.join(c_dir, 'inflation_*',
                                      '*.clusters.txt'))
    assert clusters

    # 2) reassign from the pickle + a recommended clusters file
    assert main(['reassign', fa,
                 os.path.join(c_dir, 'full_links.pkl'),
                 sorted(clusters)[0],
                 os.path.join(c_dir, 'paired_links.clm'),
                 '--outdir', r_dir, '--min_group_len', '0',
                 '--min_RE_sites', '0', '--min_links', '1']) == 0
    groups = glob.glob(os.path.join(r_dir, 'final_groups', 'group*.txt'))
    assert groups
    assert os.path.isdir(os.path.join(r_dir, 'split_clms'))

    # 3) sort
    assert main(['sort', fa, os.path.join(c_dir, 'HT_links.pkl'),
                 os.path.join(r_dir, 'split_clms'), *sorted(groups),
                 '--outdir', s_dir, '--ngen', '200', '--npop', '16']) == 0
    tours = glob.glob(os.path.join(s_dir, 'final_tours', '*.tour'))
    assert len(tours) == len(groups)

    # 4) build
    assert main(['build', fa, fa, pairs, *sorted(tours),
                 '--outdir', b_dir]) == 0
    agp = os.path.join(b_dir, 'scaffolds.agp')
    assert os.path.exists(agp)
    seen = [l.split('\t')[5] for l in open(agp)
            if l.split('\t')[4] == 'W']
    assert sorted(seen) == sorted(chrom_of)
    assert os.path.exists(os.path.join(b_dir, 'juicebox.sh'))


def test_check_command():
    assert main(['check']) == 0
