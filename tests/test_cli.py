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


def _write_toy_clm(path, names, lengths, rng, n_pairs=200):
    """Adjacent-contig read pairs for the true order names[0..k-1], all
    '+' orientation; CLM line format: scripts/HapHiC_cluster.py:376-392."""
    with open(path, 'w') as f:
        for i in range(len(names) - 1):
            a, b = names[i], names[i + 1]
            la, lb = lengths[i], lengths[i + 1]
            for _ in range(n_pairs):
                pa = rng.randrange(la // 2, la)
                pb = rng.randrange(0, lb // 2)
                d = {'++': la - pa + pb, '+-': la - pa + lb - pb,
                     '-+': pa + pb, '--': pa + lb - pb}
                for combo, dist in d.items():
                    f.write('{}{} {}{}\t2\t{} {}\n'.format(
                        a, combo[0], b, combo[1], dist, dist))


def test_allhic_command(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = random.Random(7)
    names = ['ctgA', 'ctgB', 'ctgC', 'ctgD']
    lengths = [30000, 40000, 25000, 35000]
    group = tmp_path / 'group1.txt'
    with open(group, 'w') as f:
        f.write('#Contig\tRECounts\tLength\n')
        # shuffled input order: the GA must recover the chain
        for i in (2, 0, 3, 1):
            f.write('{}\t{}\t{}\n'.format(names[i], 10, lengths[i]))
    clm = tmp_path / 'group1.clm'
    _write_toy_clm(str(clm), names, lengths, rng)

    assert main(['allhic', str(group), str(clm),
                 '--ngen', '600', '--npop', '32', '--seed', '42']) == 0
    assert os.path.exists('group1.tour')
    lines = [l for l in open('group1.tour') if l.strip()]
    assert any(l.startswith('>GA') for l in lines)
    tour = [t[:-1] for t in lines[-1].split()]
    assert tour == names or tour == names[::-1]

    # --resume renames the existing tour to .tour.sav and hot-starts
    assert main(['allhic', str(group), str(clm), '--resume', '--skipGA',
                 '--seed', '1']) == 0
    assert os.path.exists('group1.tour.sav')
    tour2 = [t[:-1] for t in
             [l for l in open('group1.tour') if l.strip()][-1].split()]
    assert tour2 == tour
