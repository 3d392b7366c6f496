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


# ---------------------------------------------------------------------------
# error simulators + correction evaluation

def test_sim_switch_errors_parity(tmp_path, monkeypatch):
    ref = refbridge.load('sim_switch_errors')
    fa = tmp_path / 'template.fa'
    fa.write_text('>Chr1_t\nACGTACGTAC\n>Chr2_t\nGGGGCCCC\n')
    allele = tmp_path / 'allele_info.txt'
    allele.write_text(
        'Number\tChrom\tRef_coord\tRef_base\thap_1\thap_2\n'
        '1\tChr1_t\t2\tC\tC\tT\n'
        '2\tChr1_t\t5\tA\tG\tA\n'
        '3\tChr2_t\t3\tG\tG\t-\n'
        '4\tChr2_t\t6\tC\tA\tC\n')

    ref_dir = tmp_path / 'ref'
    ref_dir.mkdir()
    monkeypatch.chdir(ref_dir)
    seqs = ref.parse_fasta(str(fa))
    allele_list, ploidy = ref.parse_allele(str(allele))
    ref.simulate_switch_error(allele_list, ploidy, 0.5, 7)
    ref.output_fasta(str(fa), seqs, allele_list, ploidy)

    our_dir = tmp_path / 'ours'
    our_dir.mkdir()
    monkeypatch.chdir(our_dir)
    h.sim_switch_errors(str(fa), str(allele), rate=0.5, seed=7)

    for name in ('template_hap1.fa', 'template_hap2.fa',
                 'new_allele_info.txt'):
        assert (our_dir / name).read_text() == \
            (ref_dir / name).read_text(), name


def test_sim_for_reassignment_parity(tmp_path, monkeypatch):
    ref = refbridge.load('sim_for_reassignment')
    import argparse
    fa = tmp_path / 'ctgs.fa'
    recs = []
    for chrom in ('Chr1', 'Chr2'):
        for hap in (1, 2):
            for i in range(5):
                recs.append('>{}_{}_c{}\n{}\n'.format(
                    chrom, hap, i, 'A' * (10 + i)))
    fa.write_text(''.join(recs))

    for error_type, ratio in [('inter_homo', 0.4),
                              ('inter_nonhomo', 0.4),
                              ('anchoring_rate', 0.2),
                              ('contiguity', 0.5)]:
        ref_dir = tmp_path / ('ref_' + error_type)
        ref_dir.mkdir()
        monkeypatch.chdir(ref_dir)
        src, fd = ref.parse_fasta(str(fa))
        if error_type != 'contiguity':
            new = ref.simulate_errors(src, ratio, error_type, 11)
        else:
            new = ref.simulate_contiguity(src, ratio, error_type, 11)
        ref.output_clusters(new, fd, error_type, ratio, True)

        our_dir = tmp_path / ('our_' + error_type)
        our_dir.mkdir()
        monkeypatch.chdir(our_dir)
        h.sim_for_reassignment(str(fa), ratio, error_type=error_type,
                               seed=11, output_groups=True)
        ref_files = sorted(p.name for p in ref_dir.iterdir())
        our_files = sorted(p.name for p in our_dir.iterdir())
        assert our_files == ref_files, error_type
        for name in ref_files:
            assert (our_dir / name).read_text() == \
                (ref_dir / name).read_text(), (error_type, name)


def test_get_haphic_break_points(tmp_path):
    raw = tmp_path / 'raw.fa'
    raw.write_text('>ctg1\nAAAA\n>chimeric_inter_homo_x\nCCCC\n')
    cor = tmp_path / 'cor.fa'
    cor.write_text('>ctg1\nAAAA\n'
                   '>chimeric_inter_homo_x_break1\nCC\n'
                   '>chimeric_inter_homo_x_break2\nCC\n')
    out = io.StringIO()
    h.get_haphic_break_points(str(raw), str(cor), '1M', out=out)
    lines = sorted(out.getvalue().splitlines())
    assert 'HapHiC\t1M\tchimeric_inter_homo_x\tInter_homo\t1\t2' in lines
    assert 'HapHiC\t1M\tctg1\tNon_chimeric\t0\tNA' in lines


def test_extract_corrected_ctgs(tmp_path, capsys):
    fa = tmp_path / 'raw.fa'
    fa.write_text('>c1\nAACCGGTT\n>c2\nTTTT\n')
    # yahs: raw coords in AGP
    agp = tmp_path / 'y.agp'
    agp.write_text('s1\t1\t4\t1\tW\tc1\t1\t4\t+\n'
                   's1\t5\t8\t2\tW\tc1\t5\t8\t+\n'
                   's2\t1\t4\t1\tW\tc2\t1\t4\t-\n')
    out = io.StringIO()
    h.extract_corrected_ctgs_from_yahs_agp(str(agp), str(fa), out=out)
    assert out.getvalue() == ('>c1_1_4\nAACC\n>c1_5_8\nGGTT\n'
                              '>c2_1_4\nTTTT\n')
    # salsa: split contigs renamed c1_0/c1_1 with local coords
    agp2 = tmp_path / 's.agp'
    agp2.write_text('s1\t1\t4\t1\tW\tc1_0\t1\t4\t+\n'
                    's2\t1\t4\t1\tW\tc1_1\t1\t4\t+\n')
    out = io.StringIO()
    h.extract_corrected_ctgs_from_salsa_agp(str(agp2), str(fa), out=out)
    assert out.getvalue() == '>c1_1_4\nAACC\n>c1_5_8\nGGTT\n'
    # 3d-dna: :::fragment records with lengths
    asm = tmp_path / 'g.assembly'
    asm.write_text('>c1:::fragment_1 1 4\n>c1:::fragment_2 2 4\n'
                   '>hic_gap_1 3 100\n1 2\n')
    out = io.StringIO()
    h.extract_corrected_ctgs_from_3d_dna_assembly(str(asm), str(fa),
                                                  out=out)
    assert out.getvalue() == '>c1_1_4\nAACC\n>c1_5_8\nGGTT\n'


def test_summarize_correction_parity(tmp_path, monkeypatch):
    ref = refbridge.load('summarize_correction')
    # truth-encoded chimeric ids: field 7 (idx 6) holds the length of
    # the first source fragment when the id ends with '0'
    cid = 'Chr1_1_chimeric_inter_homo_1_100_2000_x_y_z_a_b_3000_0'
    stat = tmp_path / 'correction_stat.txt'
    stat.write_text(
        'HapHiC\t1M\t{}\tInter_homo\t1\t950\n'.format(cid) +
        'HapHiC\t1M\tctgA\tNon_chimeric\t0\tNA\n' +
        'YaHS\t1M\t{}\tInter_nonhomo\t0\tNA\n'.format(cid))
    ref_dir = tmp_path / 'ref'
    our_dir = tmp_path / 'ours'
    ref_dir.mkdir()
    our_dir.mkdir()
    monkeypatch.chdir(ref_dir)
    sd, bd = ref.parse_stat(str(stat))
    ref.output_summary(sd, bd)
    monkeypatch.chdir(our_dir)
    h.summarize_correction(str(stat))
    assert sorted((our_dir / 'summary.txt').read_text().splitlines()) \
        == sorted((ref_dir / 'summary.txt').read_text().splitlines())
    assert (our_dir / 'break_point_distance.txt').read_text() == \
        (ref_dir / 'break_point_distance.txt').read_text()


def test_competitor_break_points(tmp_path):
    raw = tmp_path / 'raw.fa'
    raw.write_text('>chimeric_inner_chrom_1\n' + 'A' * 10 + '\n'
                   '>ctgB\nCCCC\n')
    # YaHS: raw names + raw coords
    agp = tmp_path / 'y.agp'
    agp.write_text(
        's1\t1\t6\t1\tW\tchimeric_inner_chrom_1\t1\t6\t+\n'
        's2\t1\t4\t1\tW\tchimeric_inner_chrom_1\t7\t10\t+\n'
        's2\t5\t8\t2\tW\tctgB\t1\t4\t+\n')
    out = io.StringIO()
    h.get_yahs_break_points(str(raw), str(agp), '1M', out=out)
    assert out.getvalue() == (
        'YaHS\t1M\tchimeric_inner_chrom_1\tIntra_chrom\t1\t6\n'
        'YaHS\t1M\tctgB\tNon_chimeric\t0\tNA\n')
    # SALSA: fragments ctg_0/ctg_1 with local coords
    agp2 = tmp_path / 's.agp'
    agp2.write_text(
        's1\t1\t6\t1\tW\tchimeric_inner_chrom_1_0\t1\t6\t+\n'
        's2\t1\t4\t1\tW\tchimeric_inner_chrom_1_1\t1\t4\t+\n')
    out = io.StringIO()
    h.get_salsa_break_points(str(raw), str(agp2), '1M', out=out)
    assert out.getvalue().splitlines()[0] == \
        'SALSA2\t1M\tchimeric_inner_chrom_1\tIntra_chrom\t1\t6'
    # 3D-DNA: interior debris fragment midpoint
    asm = tmp_path / 'g.assembly'
    asm.write_text('>chimeric_inner_chrom_1:::fragment_1 1 4\n'
                   '>chimeric_inner_chrom_1:::fragment_2:::debris 2 2\n'
                   '>chimeric_inner_chrom_1:::fragment_3 3 4\n'
                   '>ctgB 4 4\n1 3\n4\n')
    out = io.StringIO()
    h.get_3d_dna_break_points(str(raw), str(asm), '1M', out=out)
    row = out.getvalue().splitlines()[0].split('\t')
    assert row[:5] == ['3D-DNA', '1M', 'chimeric_inner_chrom_1',
                       'Intra_chrom', '1']
    assert row[5] == '5'    # midpoint of debris span (5,7)
    # ALLHiC: fragments renamed ctg_start_end
    cor = tmp_path / 'cor.fa'
    cor.write_text('>chimeric_inner_chrom_1_1_6\nAAAAAA\n'
                   '>chimeric_inner_chrom_1_7_10\nAAAA\n>ctgB\nCCCC\n')
    out = io.StringIO()
    h.get_allhic_break_points(str(raw), str(cor), '1M', out=out)
    assert out.getvalue().splitlines()[0] == \
        'ALLHiC\t1M\tchimeric_inner_chrom_1\tIntra_chrom\t1\t6'


def test_sim_collapsed_regions(tmp_path, monkeypatch):
    import random as _r
    rng = _r.Random(3)
    monkeypatch.chdir(tmp_path)
    # 2 template chromosomes x 4 haplotypes with a small allele table
    chrlen = 3000
    fa = tmp_path / 'template.fa'
    seqs = {}
    recs = []
    for cid in ('Chr1_t', 'Chr2_t'):
        s = ''.join(rng.choice('ACGT') for _ in range(chrlen))
        seqs[cid] = s
        recs.append('>{}\n{}\n'.format(cid, s))
    fa.write_text(''.join(recs))
    allele = tmp_path / 'allele_info.txt'
    rows = ['Number\tChrom\tRef_coord\tRef_base\th1\th2\th3\th4\n']
    n = 0
    for cid in seqs:
        for pos in range(50, chrlen, 97):
            n += 1
            ref = seqs[cid][pos - 1]
            alts = [c for c in 'ACGT' if c != ref]
            rows.append('{}\t{}\t{}\t{}\t{}\t{}\t{}\t{}\n'.format(
                n, cid, pos, ref, ref, alts[0], ref, alts[1]))
    allele.write_text(''.join(rows))

    col, tmp = h.sim_collapsed_regions(str(fa), str(allele),
                                       collapsed_len=400,
                                       collapsed_ratio=0.2, seed=9)
    col_ids = [l[1:] for l in open(col).read().splitlines()
               if l.startswith('>')]
    assert any('collapsed_ctg' in i for i in col_ids)
    # truth encoding: father, haps, lo, hi, [kind...], n, orient
    for cid in col_ids:
        parts = cid.split('_')
        assert parts[0] in ('Chr1', 'Chr2')
        assert parts[-1] in '+-'
        assert int(parts[2]) <= int(parts[3])
    # template genome: 4 haplotypes per chromosome, full length
    # (alleles may delete bases, so allow a small deficit)
    tmp_ids = [l[1:] for l in open(tmp).read().splitlines()
               if l.startswith('>')]
    assert sorted(tmp_ids) == sorted(
        '{}_{}'.format(c, p) for c in ('Chr1', 'Chr2')
        for p in (1, 2, 3, 4))
    from haphic_tpu.io.fasta import iter_fasta
    for name, seq in iter_fasta(tmp):
        assert abs(len(seq) - chrlen) < 64
    # collapsed genome conserves each haplotype's sequence once per
    # non-collapsed region and once total per collapsed region
    total_col = sum(len(s) for _n, s in iter_fasta(col))
    total_tmp = sum(len(s) for _n, s in iter_fasta(tmp))
    assert total_col < total_tmp


def test_generic_result_statistics(tmp_path):
    fa = tmp_path / 'ctgs.fa'
    fa.write_text('>Chr1_1_c1\n' + 'A' * 100 + '\n'
                  '>Chr1_2_c1\n' + 'A' * 80 + '\n'
                  '>scaff_x\n' + 'A' * 20 + '\n')
    g1 = tmp_path / 'g1.txt'
    g1.write_text('Chr1_1_c1\tNA\t100\nChr1_2_c1\tNA\t80\n'
                  'scaff_x\tNA\t20\n')
    out = io.StringIO()
    stats = h.generic_result_statistics(str(fa), r'Chr\d+_\d+',
                                        [str(g1)], out=out,
                                        err=io.StringIO())
    # scaff_x counts toward anchoring but not toward truth sources
    assert stats['Anchoring rate'] == pytest.approx(100.0)
    assert stats['Inter_homo_error_rate'] == pytest.approx(
        80 / 200 * 100)
    assert stats['Contiguity'] == pytest.approx(1.0)


def test_draw_tour_file_ccc(tmp_path):
    fa = tmp_path / 'ref.fa'
    fa.write_text('>Chr1_x\n' + 'A' * 200 + '\n')
    tour = tmp_path / 'g1.tour'
    # perfect forward ordering: CCC == 1
    tour.write_text('>INIT\nChr1_1_1_100_+_100+ Chr1_2_101_200_+_100+\n')
    out = io.StringIO()
    lines, ccc = h.draw_tour_file(str(fa), str(tour), 'HapHiC', '1M',
                                  ccc=True, plot=False, out=out)
    assert ccc == pytest.approx(1.0)
    assert out.getvalue() == 'g1\tHapHiC\t1M\t1.0\n'
    # reversed second contig lowers the CCC
    tour.write_text('>INIT\nChr1_1_1_100_+_100+ Chr1_2_101_200_+_100-\n')
    _l, ccc2 = h.draw_tour_file(str(fa), str(tour), 'HapHiC', '1M',
                                ccc=True, plot=False, out=io.StringIO())
    assert ccc2 < ccc


def test_small_analysis_tools(tmp_path):
    # add_allele_tag
    table = tmp_path / 'Allele.ctg.table'
    table.write_text('Chr1\t100\tChr1_1_c1\tChr1_2_c1\n')
    cor = tmp_path / 'correlation.txt'
    cor.write_text('Chr1_1_c1\tChr1_2_c1\tx\tx\t0.5\tx\t0.3\n'
                   'Chr1_1_c1\tChr2_1_c1\tx\tx\t0.9\tx\t0.7\n')
    out = io.StringIO()
    h.add_allele_tag(str(cor), str(table), out=out)
    lines = out.getvalue().splitlines()
    assert lines[0].endswith('0.3\tTrue')
    assert lines[1].endswith('0.7\tFalse')

    # allele_statistics
    ai = tmp_path / 'allele_info.txt'
    ai.write_text('Number\tChrom\tRef\tRefB\th1\th2\th3\th4\n'
                  '1\tChr1_1\t5\tA\tA\tG\tA\tT\n'
                  '2\tChr2_1\t9\tC\tC\tC\tC\tC\n')
    p = h.allele_statistics(str(ai), 'stats', outdir=str(tmp_path))
    rows = open(p).read().splitlines()
    assert len(rows) == 1          # stops at first non-Chr1_1 row
    cols = rows[0].split('\t')
    # h1-h2: A/G transition; h1-h4: A/T transversion; h2-h3: G/A
    assert cols[8] == 'SNP_transition'
    assert cols[10] == 'SNP_transversion'

    # density_statistics
    dens = tmp_path / 'link_density.txt'
    dens.write_text('t0\tChr1_12_5_9_collapsed\t1.5\n'
                    't0\tChr1_1_c\t0.5\n')
    out = io.StringIO()
    h.density_statistics(str(dens), out=out)
    assert out.getvalue() == 't0\t1.5\tnhap2\nt0\t0.5\tnhap1\n'

    # get_paf_alignments (fwd + rev coordinate conventions)
    paf = tmp_path / 'a.paf'
    paf.write_text('q\t100\t10\t50\t+\ts\t200\t30\t70\t40\t40\t60\n'
                   'q\t100\t10\t50\t-\ts\t200\t30\t70\t40\t40\t60\n')
    out = io.StringIO()
    h.get_paf_alignments([str(paf)], out=out)
    lines = out.getvalue().splitlines()
    assert lines[0] == 'q_s\t100\t200\talignment_1\t11\t30'
    assert lines[1] == 'q_s\t100\t200\talignment_1\t50\t70'
    assert lines[2] == 'q_s\t100\t200\talignment_2\t50\t30'
    assert lines[3] == 'q_s\t100\t200\talignment_2\t11\t70'

    # interpret_switch_errors
    ai2 = tmp_path / 'new_allele_info.txt'
    ai2.write_text('Number\tChrom\tRef\tRefB\th1\th2\th3\th4\n'
                   '1\tChr1_1\t5\tA\tG\tA\tA\tT\n'
                   '2\tChr2_1\t9\tC\tC\tC\tC\tC\n')
    out = io.StringIO()
    h.interpret_switch_errors(str(ai), str(ai2), out=out)
    assert out.getvalue() == 'hap1<->hap2\n'

    # split_mnd
    mnd = tmp_path / 'm.mnd'
    mnd.write_text('0 Chr1_a 5 0 0 Chr1_b 9 1\n'
                   '0 Chr1_a 5 0 0 Chr2_b 9 1\n'
                   '0 Chr2_a 2 0 0 Chr2_c 3 1\n')
    written = h.split_mnd(str(mnd), ['Chr1', 'Chr2'],
                          outdir=str(tmp_path))
    assert open(written[0]).read().count('\n') == 1
    assert open(written[1]).read().count('\n') == 1

    # filter_fastq_len
    fq = tmp_path / 'r.fq'
    fq.write_text('@a\nACGTACGT\n+\nIIIIIIII\n@b\nACG\n+\nIII\n')
    outp = tmp_path / 'out.fq.gz'
    kept = h.filter_fastq_len([str(fq)], len_cutoff=5,
                              out_path=str(outp))
    assert kept == 1


def test_roc_statistics(tmp_path):
    fa = tmp_path / 'ctgs.fa'
    fa.write_text('>ctg_inter_homo_chimeric_1\nAAAA\n'
                  '>good_1_x\nCCCC\n>good_1_y\nGGGG\n')
    log = tmp_path / 'cluster.log'
    # ranked worst-last: chimera has the highest rank sum
    log.write_text(
        'ts [rank sum filtering] Fragment good_1_x, rank sum=1\n'
        'ts [rank sum filtering] Fragment good_1_y, rank sum=2\n'
        'ts [rank sum filtering] Fragment ctg_inter_homo_chimeric_1, '
        'rank sum=9\n')
    roc = h.chimeric_contig_statistics(str(fa), str(log), '1M',
                                       outdir=str(tmp_path))
    rows = [l.split('\t') for l in open(roc).read().splitlines()
            if l.split('\t')[2] == 'inter_homo']
    # some cutoff achieves TPR=1 with FPR<1
    assert any(float(r[4]) == 1.0 and float(r[5]) < 1.0 for r in rows)
    assert (tmp_path / 'rank_sum.txt').exists()

    fa2 = tmp_path / 'col.fa'
    fa2.write_text('>Chr1_12_1_9_collapsed\nAAAA\n>Chr1_1_c\nCC\n')
    log2 = tmp_path / 'cluster2.log'
    log2.write_text(
        'ts [link density filtering] Fragment Chr1_1_c, density=0.5\n'
        'ts [link density filtering] Fragment Chr1_12_1_9_collapsed, '
        'density=2.5\n')
    roc2 = h.collapsed_contig_statistics(str(fa2), str(log2), 't0',
                                         outdir=str(tmp_path))
    rows = [l.split('\t') for l in open(roc2).read().splitlines()
            if l.split('\t')[2] == 'two_hap_collapsed']
    assert any(float(r[4]) == 1.0 and float(r[5]) < 1.0 for r in rows)


def test_synteny_tools(tmp_path):
    bed = tmp_path / 'genes.bed'
    bed.write_text('Chr02\t100\t200\tg1\t0\t+\n'
                   'Chr02\t300\t400\tg2\t0\t+\n'
                   'Chr01\t10\t20\tg0\t0\t+\n')
    simple = tmp_path / 'x.anchors.simple'
    simple.write_text('g*g1\tg2\tg1\tg2\t0\t-\n')
    inv, trans, invtr = h.extract_SVs_from_simple(
        str(simple), str(bed), outdir=str(tmp_path))
    assert open(inv).read() == 'Chr02\t100\t400\tINV1\t0\t+\n'
    assert open(trans).read() == '' and open(invtr).read() == ''

    # filter_orthologous_anchors: in-order anchors pass through,
    # out-of-order subject gets starred as translocation
    bed1 = tmp_path / 'a.bed'
    bed1.write_text('c1\t1\t2\ta1\t0\t+\nc1\t3\t4\ta2\t0\t+\n'
                    'c1\t5\t6\ta3\t0\t+\n')
    bed2 = tmp_path / 'b.bed'
    bed2.write_text('d1\t1\t2\tb1\t0\t+\nd1\t3\t4\tb2\t0\t+\n'
                    'd1\t5\t6\tb3\t0\t+\n')
    anchors = tmp_path / 'x.simple'
    anchors.write_text('a1\ta1\tb1\tb1\t0\t+\n'
                       'a2\ta2\tb3\tb3\t0\t+\n'
                       'a3\ta3\tb2\tb2\t0\t+\n')
    out = io.StringIO()
    h.filter_orthologous_anchors(str(anchors), str(bed1), str(bed2),
                                 ['c1'], ['d1'], out=out)
    lines = out.getvalue().splitlines()
    assert lines[0] == 'a1\ta1\tb1\tb1\t0\t+'
    assert lines[1] == 'a2\ta2\tb3\tb3\t0\t+'
    assert lines[2].startswith('b*')


def test_mock_delta_roundtrip(tmp_path):
    rng = random.Random(13)
    chr1 = ''.join(rng.choice('ACGT') for _ in range(120))
    ref = tmp_path / 'ref.fa'
    ref.write_text('>Chr1\n{}\n'.format(chr1))
    from haphic_tpu.io.fasta import revcomp
    # two truth-encoded contigs; second stored reverse-complemented
    query = tmp_path / 'scaffolds.fa'
    query.write_text('>scaffold_1\n{}\n'.format(
        chr1[:60] + 'N' * 10 + chr1[60:]))
    agp = tmp_path / 'q.agp'
    agp.write_text(
        'scaffold_1\t1\t60\t1\tW\tChr1_ctg1_+\t1\t60\t+\n'
        'scaffold_1\t61\t70\t2\tU\t10\tscaffold\tyes\t'
        'proximity_ligation\n'
        'scaffold_1\t71\t130\t3\tW\tChr1_ctg2_-\t1\t60\t-\n')
    delta = h.mock_delta(str(agp), str(query), str(ref),
                         outdir=str(tmp_path))
    # collinear contigs merge into a single alignment block
    blocks = [l for l in open(delta) if l.startswith('>')]
    assert len(blocks) == 1
    # validate_mock_delta asserts sequence identity of every block
    out = io.StringIO()
    h.validate_mock_delta(str(tmp_path / 'ref.chrs.nogaps.fa'),
                          str(tmp_path / 'scaffolds.chrs.nogaps.fa'),
                          delta, out=out)
    assert out.getvalue() == 'Check Passed...\n'


def test_haplotype_kmers(tmp_path):
    rng = random.Random(21)
    h1 = ''.join(rng.choice('ACGT') for _ in range(300))
    # hap2 diverges in the middle third
    h2 = h1[:100] + ''.join(rng.choice('ACGT')
                            for _ in range(100)) + h1[200:]
    ref = tmp_path / 'ref.fa'
    ref.write_text('>Chr1_1\n{}\n>Chr1_2\n{}\n'.format(h1, h2))
    asm = tmp_path / 'asm.fa'
    asm.write_text('>ctgA\n{}\n'.format(h2[80:220]))
    out = h.haplotype_kmers(str(ref), str(asm), kmer_size=21,
                            bin_size=1000, outdir=str(tmp_path))
    rows = [l.split('\t') for l in open(out[0]).read().splitlines()]
    assert rows and rows[0][0] == 'ctgA'
    # the contig covers hap2's divergent region -> primary source hap2
    assert rows[0][3] == 'hap2'
    assert 0 < float(rows[0][4]) <= 1


# ---------------------------------------------------------------------------
# round-1 gap closure: the four remaining reference scripts


def test_allelic_contig_statistics(tmp_path):
    a1 = 'Chr1_1_1_1_10000_+_10000'     # hap1, 1..10000
    a2 = 'Chr1_2_1_1_10000_+_10000'     # hap2, full overlap with a1
    b1 = 'Chr1_1_2_10001_20000_+_10000'  # same hap as a1 (intra-chrom)
    log = tmp_path / 'cluster.log'
    log.write_text(
        '2026-01-01 00:00:00 <prune> [remove_allelic_links] '
        '{} {} links=30 concordance_ratio=0.8\n'.format(a1, a2) +
        '2026-01-01 00:00:00 <prune> [remove_allelic_links] '
        '{} {} links=25 concordance_ratio=0.6\n'.format(a1, b1) +
        # below link cutoff -> ignored in the ROC
        '2026-01-01 00:00:00 <prune> [remove_allelic_links] '
        '{} {} links=3 concordance_ratio=0.9\n'.format(a2, b1))
    table = tmp_path / 'Allele.ctg.table'
    table.write_text('Chr1\tgene1\t{}\t{}\n'.format(a1, a2))
    cr, roc = h.allelic_contig_statistics(
        str(log), str(table), '1M', outdir=str(tmp_path))

    rows = [l.split('\t') for l in open(cr).read().splitlines()]
    assert len(rows) == 3
    by_pair = {(r[1], r[2]): r for r in rows}
    assert by_pair[(a1, a2)][3] == 'Inter_homo'
    assert by_pair[(a1, a2)][5] == '(90, 100]'
    assert by_pair[(a1, b1)][3] == 'Intra_chrom'
    assert by_pair[(a1, b1)][5] == '0'
    assert by_pair[(a1, a2)][8] == 'True'

    roc_rows = [l.split('\t') for l in open(roc).read().splitlines()]
    assert roc_rows[0] == ['HapHiC', '1M', '1', '0', '0']
    by_param = {r[2]: (float(r[3]), float(r[4])) for r in roc_rows
                if r[0] == 'HapHiC'}
    # cutoff 0.5: both pairs detected -> TPR=1, FPR=1
    assert by_param['0.5'] == (1.0, 1.0)
    # cutoff 0.7: only the true allelic pair survives
    assert by_param['0.7'] == (1.0, 0.0)
    # ALLHiC row: the allele table marks exactly the true pair
    allhic = [r for r in roc_rows if r[0] == 'ALLHiC'][0]
    assert (float(allhic[3]), float(allhic[4])) == (1.0, 0.0)


def _discordant_fixture(tmp_path):
    from .bamutil import bam_record, write_bam
    ctga = 'C_1_1_1_100_+_100'
    ctgb = 'C_1_2_101_200_+_100'
    # truth written fully reversed: the majority-orientation flip must
    # normalize it back to ctgA(+), ctgB(+)
    (tmp_path / 'truth.agp').write_text(
        's1\t1\t100\t1\tW\t{}\t1\t100\t-\n'.format(ctgb) +
        's1\t101\t200\t2\tU\t100\tscaffold\tyes\tproximity_ligation\n'
        's1\t201\t300\t3\tW\t{}\t1\t100\t-\n'.format(ctga))
    (tmp_path / 'good.agp').write_text(
        's1\t1\t100\t1\tW\t{}\t1\t100\t+\n'.format(ctga) +
        's1\t101\t200\t2\tU\t100\tscaffold\tyes\tproximity_ligation\n'
        's1\t201\t300\t3\tW\t{}\t1\t100\t+\n'.format(ctgb))
    (tmp_path / 'bad.agp').write_text(
        'sA\t1\t100\t1\tW\t{}\t1\t100\t+\n'.format(ctga) +
        'sB\t1\t100\t1\tW\t{}\t1\t100\t+\n'.format(ctgb))
    bam = tmp_path / 'hic.bam'
    recs = [bam_record(0, 10, 0, 50, 0x40 | 0x1) for _ in range(3)]
    recs += [bam_record(0, 20, 1, 30, 0x40 | 0x1) for _ in range(2)]
    write_bam(str(bam), [ctga, ctgb], [100, 100], recs)
    return bam


def test_get_discordant_hic_links(tmp_path):
    import io as _io
    bam = _discordant_fixture(tmp_path)
    out = _io.StringIO()
    stat, summary = h.get_discordant_hic_links(
        str(tmp_path / 'truth.agp'),
        [('Good', str(tmp_path / 'good.agp')),
         ('Bad', str(tmp_path / 'bad.agp'))],
        str(bam), bin_size=100, outdir=str(tmp_path), out=out)

    rows = [l.split('\t') for l in open(stat).read().splitlines()]
    truth = {(r[0], r[1], r[2], r[3]): (int(r[4]), r[5]) for r in rows
             if r[6] == 'Truth'}
    # 3 same-bin pairs + 2 adjacent-bin pairs, all intra under truth
    assert truth[('s1', '0', 's1', '0')] == (3, 'intra')
    assert truth[('s1', '0', 's1', '1')] == (2, 'intra')
    good = {k: v for k, v in
            ((tuple(r[:4]), (int(r[4]), r[5])) for r in rows)
            if any(r[6] == 'Good' and tuple(r[:4]) == k for r in rows)}
    assert good == truth

    text = open(summary).read()
    assert text == out.getvalue()
    blocks = text.split('######')
    good_block = blocks[blocks.index(' Good ') + 1]
    bad_block = blocks[blocks.index(' Bad ') + 1]
    assert 'differential intra-scaffold Hi-C links: 0 ' in good_block
    assert 'differential inter-scaffold Hi-C links: 0 ' in good_block
    # Bad splits the cross-contig pairs into inter-scaffold links the
    # truth never has
    assert 'differential inter-scaffold Hi-C links: 2 ' in bad_block


def test_correction_analysis(tmp_path):
    from .bamutil import bam_record, write_bam
    raw = tmp_path / 'raw.fa'
    raw.write_text('>ctgX\n{}\n>hapA_chr1\n{}\n>hapB_chr1\n{}\n'.format(
        'A' * 30000, 'C' * 1000, 'G' * 1000))
    anno = tmp_path / 'anno.txt'
    anno.write_text('chimeric:\nctgX\nnonchimeric:\n')
    # AutoHiC-style part naming
    (tmp_path / 't1.agp').write_text(
        's1\t1\t15000\t1\tW\tctgX_break1\t1\t15000\t+\n'
        's1\t15001\t30000\t2\tW\tctgX_break2\t1\t15000\t+\n')
    # ALLHiC-style part naming
    (tmp_path / 't2.agp').write_text(
        's1\t1\t15000\t1\tW\tctgX_1_15000\t1\t15000\t+\n'
        's1\t15001\t30000\t2\tW\tctgX_15001_30000\t1\t15000\t+\n')
    bam = tmp_path / 'hic.bam'
    recs = [bam_record(0, 1000, 0, 12000, 0x40 | 0x1),
            bam_record(0, 5000, 1, 10, 0x40 | 0x1),
            bam_record(0, 25000, 2, 10, 0x40 | 0x1)]
    write_bam(str(bam), ['ctgX', 'hapA_chr1', 'hapB_chr1'],
              [30000, 1000, 1000], recs)

    table, venn = h.correction_analysis(
        str(raw), str(bam), str(anno),
        [('AutoHiC', str(tmp_path / 't1.agp')),
         ('ALLHiC', str(tmp_path / 't2.agp'))],
        ['hapA', 'hapB'], outdir=str(tmp_path))

    rows = [l.split('\t') for l in open(table).read().splitlines()]
    cov = {int(r[1]): int(r[4]) for r in rows
           if r[5] == 'Spanning_coverage'}
    # intra pair spans bins 0-1 at 10 kb resolution
    assert cov[1] == 1 and cov[10001] == 1 and cov[20001] == 0
    bps = [(r[6], int(r[1])) for r in rows if r[5] == 'Breakpoint']
    assert sorted(bps) == [('ALLHiC', 15000), ('AutoHiC', 15000)]
    hap1 = [r for r in rows if r[6] == 'Hap1' and int(r[1]) == 1]
    assert len(hap1) == 1  # the hapA link lands in ctgX bin 0

    venn_rows = open(venn).read().splitlines()
    assert venn_rows[0] == 'Contig\tType\tAutoHiC\tALLHiC'
    assert venn_rows[1] == 'ctgX\tchimeric\tyes\tyes'


def test_mock_delta_chrs_only_reference_parity(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = random.Random(7)
    chr1 = ''.join(rng.choice('ACGT') for _ in range(120))
    un = ''.join(rng.choice('ACGT') for _ in range(40))
    (tmp_path / 'ref.fa').write_text(
        '>Chr1\n{}\n>Un\n{}\n'.format(chr1, un))
    (tmp_path / 'scaffolds.fa').write_text(
        '>scaffold_1\n{}\n>scaffold_2\n{}\n'.format(
            chr1[:60] + 'N' * 10 + un + chr1[60:], chr1[:30]))
    (tmp_path / 'q.agp').write_text(
        'scaffold_1\t1\t60\t1\tW\tChr1_ctg1_+\t1\t60\t+\n'
        'scaffold_1\t61\t70\t2\tU\t10\tscaffold\tyes\t'
        'proximity_ligation\n'
        'scaffold_1\t71\t110\t3\tW\tUn_ctg1_+\t1\t40\t+\n'
        'scaffold_1\t111\t170\t4\tW\tChr1_ctg2_-\t1\t60\t-\n'
        # single-contig scaffold -> dropped entirely
        'scaffold_2\t1\t30\t1\tW\tChr1_ctg3_+\t1\t30\t+\n')

    ref_mod = refbridge.load('mock_delta_chrs_only')
    (alignments_dict, ref_chrom_dict, scaffold_set,
     ref_chrom_set) = ref_mod.parse_agp('q.agp', 'Chr')
    ref_chrs, ref_lens = ref_mod.parse_fasta('ref.fa', ref_chrom_set)
    query_chrs, query_lens = ref_mod.parse_fasta('scaffolds.fa',
                                                 scaffold_set)
    ref_mod.mock_delta_file(alignments_dict, ref_chrom_dict, ref_lens,
                            query_lens, scaffold_set, ref_chrom_set,
                            ref_chrs, query_chrs)
    expected = open('mock.delta').read()
    os.remove('mock.delta')

    ours = h.mock_delta_chrs_only('q.agp', 'scaffolds.fa', 'ref.fa',
                                  'Chr')
    assert open(ours).read() == expected
    # Un and scaffold_2 never reach the no-gap FASTAs
    assert '>Un' not in open('ref.chrs.nogaps.fa').read()
    assert '>scaffold_2' not in open('scaffolds.chrs.nogaps.fa').read()
