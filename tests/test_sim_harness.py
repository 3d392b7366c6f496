"""sim/harness.py — converters, statistics, and input-manipulation
tools, parity-checked against the reference simulation scripts
(tests/refbridge.py) where they are importable."""

import io
import os
import random

import pytest

from haphic_tpu.sim import harness as h

from . import refbridge


# ---------------------------------------------------------------------------
# converters

AGP = """scaffold_1\t1\t100\t1\tW\tctgA\t1\t100\t+
scaffold_1\t101\t300\t2\tU\t200\tscaffold\tyes\tproximity_ligation
scaffold_1\t301\t400\t3\tW\tctgB\t1\t100\t-
scaffold_2\t1\t50\t1\tW\tctgC\t1\t50\t+
scaffold_2\t51\t120\t2\tW\tctgA\t120\t189\t+
scaffold_3\t1\t70\t1\tW\tctgD\t1\t70\t-
"""

ASSEMBLY = """>ctgA 1 100
>ctgB 2 100
>ctgC 3 50
1 -2
3
"""


def test_convert_agp_to_tour(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / 'x.agp').write_text(AGP)
    h.convert_agp_to_tour('x.agp', 'out')
    ref = refbridge.load('convert_agp_to_tour')
    assert [l + '\n' for l in
            ('>INIT', ' '.join(ref.parse_agp('x.agp')))] == \
        list(open('out.tour'))


def test_convert_assembly_to_tour(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / 'g.assembly').write_text(ASSEMBLY)
    h.convert_assembly_to_tour('g.assembly', 'out')
    ref = refbridge.load('convert_assembly_to_tour')
    assert open('out.tour').read().splitlines()[1].split() == \
        ref.parse_assembly('g.assembly')
    assert open('out.tour').read().splitlines()[1] == 'ctgA+ ctgB- ctgC+'


def test_convert_agp_to_groups(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / 'x.agp').write_text(AGP)
    written = h.convert_agp_to_groups('x.agp')
    # scaffold_3 has one contig -> skipped; ctgA appears twice -> seg1/2
    assert [os.path.basename(p) for p in written] == ['group1.txt',
                                                      'group2.txt']
    assert open('group1.txt').read() == \
        'ctgA_seg1\tNA\t100\nctgB_seg1\tNA\t100\n'
    assert open('group2.txt').read() == \
        'ctgC_seg1\tNA\t50\nctgA_seg2\tNA\t70\n'


def test_convert_assembly_to_groups(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / 'g.assembly').write_text(
        '>Chr1_f1 1 100\n>Chr1_f2 2 60\n>debris 3 10\n1 -2\n3\n1 2\n')
    written = h.convert_assembly_to_groups('g.assembly')
    assert len(written) == 2
    assert open(written[0]).read() == \
        'Chr1_f1\tNA\t100\nChr1_f2\tNA\t60\n'


def test_convert_lachesis(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    fa = tmp_path / 'ctgs.fa'
    fa.write_text('>c1\nACGT\n>c2\nACGTAC\n>c3\nAC\n')
    (tmp_path / 'clusters.by_name.txt').write_text(
        '#comment\nc1 c2\nc3\n')
    written = h.convert_lachesis_result_to_groups(
        'clusters.by_name.txt', str(fa))
    assert len(written) == 1
    assert open(written[0]).read() == 'c1\tNA\t4\nc2\tNA\t6\n'

    (tmp_path / 'group0.ordering').write_text('#h\n0\tc2\t1\n1\tc1\t0\n')
    (tmp_path / 'group1.ordering').write_text('0\tc3\t0\n0\tcX\t0\n')
    out = h.convert_lachesis_ordering_to_tour(
        str(fa), 'lach', ['group1.ordering', 'group0.ordering'])
    assert open(out).read().splitlines()[1] == 'c2- c1+ c3+'


# ---------------------------------------------------------------------------
# statistics

def test_sim_group_files(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    fa = tmp_path / 'g.fa'
    fa.write_text('>g1_a\ngatcGATC\n>g1_b\nGATCGATCGATC\n>g2_a\nAAAA\n')
    written = h.sim_group_files(str(fa))
    assert sorted(os.path.basename(p) for p in written) == \
        ['group_g1.txt', 'group_g2.txt']
    # sorted by descending length, GATC counted case-insensitively
    assert open('group_g1.txt').read() == (
        '#Contig\tRECounts\tLength\n'
        'g1_b\t3\t12\ng1_a\t2\t8\n')


def test_score_statistics(tmp_path):
    tour = tmp_path / 'g.tour'
    tour.write_text('>INIT\na+ b-\n>GA500-1.25\na+ b-\n'
                    '>GA1000-2.50\nb- a+\n')
    out, err = io.StringIO(), io.StringIO()
    h.score_statistics(str(tour), 'Chr1', '1M', 'HapHiC',
                       each_iteration=True, out=out, err=err)
    assert out.getvalue() == ('HapHiC\tChr1\t1M\t2.50\n'
                              'HapHiC_presort\tChr1\t1M\t1.25\n')
    assert err.getvalue() == ('HapHiC\tChr1\t1M\t0\t1.25\n'
                              'HapHiC\tChr1\t1M\t500\t2.50\n')


def _truth_fasta_and_groups(tmp_path):
    fa = tmp_path / 'ctgs.fa'
    recs = []
    # Chr1_hap1/hap2, Chr4_hap1 contigs + one chimeric (ignored)
    for name, ln in [('Chr1_hap1_c1', 100), ('Chr1_hap1_c2', 50),
                     ('Chr1_hap2_c1', 80), ('Chr4_hap1_c1', 60),
                     ('chimeric_1', 40)]:
        recs.append('>{}\n{}\n'.format(name, 'A' * ln))
    fa.write_text(''.join(recs))
    g1 = tmp_path / 'g1.txt'
    g1.write_text('Chr1_hap1_c1\tNA\t100\nChr1_hap1_c2\tNA\t50\n'
                  'Chr1_hap2_c1\tNA\t80\n')
    g2 = tmp_path / 'g2.txt'
    g2.write_text('Chr4_hap1_c1\tNA\t60\nchimeric_1\tNA\t40\n')
    return str(fa), [str(g1), str(g2)]


def test_result_statistics_parity(tmp_path, monkeypatch, capsys):
    fa, groups = _truth_fasta_and_groups(tmp_path)
    ref = refbridge.load('result_statistics')
    fa_len = ref.parse_fasta(fa)
    (n_groups, anchored, homo, nonhomo, ex_anchored, ex_homo,
     ex_nonhomo, largest) = ref.parse_groups(groups)
    capsys.readouterr()
    total = sum(fa_len.values())
    anchored_sum = sum(anchored.values())

    out = io.StringIO()
    stats = h.result_statistics(fa, groups, out=out, err=io.StringIO())
    assert stats['Ngroups'] == n_groups
    assert stats['Anchoring rate'] == pytest.approx(
        anchored_sum / total * 100)
    assert stats['Inter_homo_error_rate'] == pytest.approx(
        homo / anchored_sum * 100)
    assert stats['Inter_nonhomo_error_rate'] == pytest.approx(
        nonhomo / anchored_sum * 100)


def test_link_statistics(tmp_path):
    from . import bamutil
    fa = tmp_path / 'ctgs.fa'
    fa.write_text('>Chr1_hap1_c1\nAAAA\n>Chr1_hap2_c1\nAAAA\n'
                  '>Chr2_hap1_c1\nAAAA\n')
    names = ['Chr1_hap1_c1', 'Chr1_hap2_c1', 'Chr2_hap1_c1']
    bam = tmp_path / 'x.bam'
    # read1 inter-contig records: homo (0-1), nonhomo (0-2), intra-chrom
    # impossible here (needs same chr+hap different ctg), plus a read2
    # record that must be ignored
    recs = [bamutil.bam_record(0, 1, 1, 1, 0x40 | 0x1, name=b'p1'),
            bamutil.bam_record(0, 1, 2, 1, 0x40 | 0x1, name=b'p2'),
            bamutil.bam_record(1, 1, 2, 1, 0x80 | 0x1, name=b'p2')]
    bamutil.write_bam(str(bam), names, [4, 4, 4], recs)
    path = h.link_statistics(str(fa), str(bam), 'tag0',
                             outdir=str(tmp_path))
    rows = {l.split('\t')[0]: l.split('\t') for l in
            open(path).read().splitlines()}
    assert rows['Chr1_hap1_c1'][1:5] == ['0', '1', '1', '2']
    assert rows['Chr1_hap2_c1'][1:5] == ['0', '1', '0', '1']
    assert rows['Chr2_hap1_c1'][1:5] == ['0', '0', '1', '1']


# ---------------------------------------------------------------------------
# input manipulation

def test_shuffle_fasta_parity(tmp_path, monkeypatch):
    fa = tmp_path / 'in.fa'
    fa.write_text(''.join('>{}\n{}\n'.format(i, 'ACGT' * (i + 1))
                          for i in range(8)))
    monkeypatch.chdir(tmp_path)
    out = h.shuffle_fasta(str(fa), seed=7, offset=2)
    # same shuffle as the reference's random.seed(seed+offset)
    ids = [l[1:] for l in open(out).read().splitlines()
           if l.startswith('>')]
    rng = random.Random()
    rng.seed(9)
    expect = [str(i) for i in range(8)]
    rng.shuffle(expect)
    assert ids == expect
    assert sorted(ids) == [str(i) for i in range(8)]


def test_split_fasta_parity(tmp_path, capsys):
    ref = refbridge.load('split_fasta')
    fa = tmp_path / 'in.fa'
    fa.write_text('>s1\nACGTACGTAC\nNNN\nGGGGCCCC\n>s2\nTTTTTTTT\n')
    pieces = ref.split_fasta(str(fa), None)
    oris = ref.get_orientation(len(pieces), 3)
    expected_lines = []
    for n, (name, seq, ln) in enumerate(pieces):
        if oris[n]:
            expected_lines.append('>{}_-'.format(name))
            seq = ref.revcom(seq)
        else:
            expected_lines.append('>{}_+'.format(name))
        for x in range(ln // 60 + 1):
            expected_lines.append(seq[x * 60:(x + 1) * 60])
    out = io.StringIO()
    h.split_fasta(str(fa), bin_size=None, seed=3, out=out)
    assert out.getvalue().splitlines() == expected_lines


def test_sample_mnd(tmp_path):
    mnd = tmp_path / 'm.txt'
    mnd.write_text(''.join('line{}\n'.format(i) for i in range(100)))
    out = io.StringIO()
    kept = h.sample_mnd(str(mnd), 100, 0.2, seed=5, out=out)
    assert kept == 20
    rng = random.Random()
    rng.seed(5)
    picked = sorted(rng.sample(range(100), 20))
    assert out.getvalue().splitlines() == \
        ['line{}'.format(i) for i in picked]


def test_sort_agp(tmp_path, capsys):
    # groups need >=10 W lines to vote; build two groups of 10 contigs
    lines = []
    for g, chrom in [('groupA', 'Chr2_hap1'), ('groupB', 'Chr1_hap1')]:
        for i in range(10):
            lines.append('{}\t1\t100\t{}\tW\t{}_ctg{}_x\t1\t100\t+\n'
                         .format(g, i + 1, chrom, i))
    agp = tmp_path / 'x.agp'
    agp.write_text(''.join(lines))
    out = io.StringIO()
    h.sort_agp(str(agp), ['Chr1_hap1', 'Chr2_hap1'], out=out)
    got = [l.split('\t')[0] for l in out.getvalue().splitlines()]
    assert got[:10] == ['groupB'] * 10 and got[10:] == ['groupA'] * 10
