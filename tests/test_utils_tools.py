"""Tests for the aux utilities (haphic_tpu.utils.tools)."""

import gzip
import io
import random

from haphic_tpu.utils import tools

from . import util


def test_mock_agp(tmp_path):
    fa = tmp_path / 'a.fa'
    fa.write_text('>c1\nACGT\nAC\n>c2\nGGG\n')
    buf = io.StringIO()
    tools.mock_agp(str(fa), out=buf)
    assert buf.getvalue() == ('c1\t1\t6\t1\tW\tc1\t1\t6\t+\n'
                              'c2\t1\t3\t1\tW\tc2\t1\t3\t+\n')


def test_groups_to_clusters(tmp_path):
    g1 = tmp_path / 'g1.txt'
    g1.write_text('#Contig\tRECounts\tLength\na\t2\t10\nb\t3\t20\n')
    g2 = tmp_path / 'g2.txt'
    g2.write_text('c\t1\t5\n')
    buf = io.StringIO()
    tools.groups_to_clusters([str(g1), str(g2)], out=buf)
    lines = buf.getvalue().splitlines()
    assert lines[0] == '#Group\tnContigs\tContigs'
    assert lines[1] == 'group1\t2\ta b'
    assert lines[2] == 'group2\t1\tc'


def test_convert_gfa_ids(tmp_path):
    gfa = tmp_path / 'a.gfa'
    gfa.write_text('S\tutg1\t*\tLN:i:100\trd:i:5\n'
                   'L\tutg1\t+\tutg2\t-\t0M\n'
                   'S\tutg2\t*\tLN:i:50\trd:i:9\n')
    lift = tmp_path / 'lift.agp'
    lift.write_text('n1\t1\t60\t1\tW\tutg1\t1\t60\t+\n'
                    'n2\t1\t40\t1\tW\tutg1\t61\t100\t+\n'
                    'n3\t1\t50\t1\tW\tutg2\t1\t50\t+\n')
    buf = io.StringIO()
    tools.convert_gfa_ids(str(gfa), str(lift), out=buf)
    lines = buf.getvalue().splitlines()
    assert lines[0].split('\t')[1] == 'n1_n2'
    assert lines[1].split('\t')[1] == 'n1_n2'
    assert lines[1].split('\t')[3] == 'n3'


def test_gfa_depth_to_bedgraph(tmp_path):
    gfa = tmp_path / 'a.gfa'
    gfa.write_text('S\tc1\t*\tLN:i:100\trd:i:4\n'
                   'S\tc2\t*\tLN:i:50\trd:i:9\n')
    agp = tmp_path / 's.agp'
    agp.write_text('s1\t1\t100\t1\tW\tc1\t1\t100\t+\n'
                   's1\t101\t200\t2\tU\t100\tscaffold\tyes\tx\n'
                   's1\t201\t250\t3\tW\tc2\t1\t50\t+\n')
    buf = io.StringIO()
    tools.gfa_depth_to_bedgraph([str(gfa)], str(agp), out=buf)
    lines = buf.getvalue().splitlines()
    assert lines[0] == 's1\t0\t100\t5.0'
    assert lines[1] == 's1\t200\t250\t10.0'


def test_find_telomeres(tmp_path):
    rng = random.Random(0)
    mid = ''.join(rng.choice('ATCG') for _ in range(500))
    seq = 'CCCTAAA' * 10 + mid + 'TTTAGGG' * 10
    fa = tmp_path / 'g.fa'
    fa.write_text('>chr1\n{}\n>chr2\n{}\n'.format(seq, mid))
    buf = io.StringIO()
    tools.find_telomeres(str(fa), out=buf)
    lines = buf.getvalue().splitlines()
    c1 = lines[1].split('\t')
    assert c1[0] == 'chr1' and int(c1[2]) > 0
    assert c1[4] == '1'                       # leftmost fwd repeat at 1
    c2 = lines[2].split('\t')
    assert c2[2] == '0' and c2[4] == 'NA'


def test_fasta_count_N(tmp_path):
    fa = tmp_path / 'n.fa'
    fa.write_text('>c\nACGTNNNNACGT\nNNACG\n')
    buf = io.StringIO()
    total = tools.fasta_count_N(str(fa), out=buf)
    assert total == 6


def test_fastq_length_filtering(tmp_path):
    in_fq = tmp_path / 'in.fq.gz'
    with gzip.open(in_fq, 'wt') as f:
        f.write('@r1\nACGTACGT\n+\nIIIIIIII\n')
        f.write('@r2\nACG\n+\nIII\n')
    out_fq = tmp_path / 'out.fq.gz'
    kept = tools.fastq_length_filtering(str(out_fq), [str(in_fq)],
                                        length=5)
    assert kept == 1
    with gzip.open(out_fq, 'rt') as f:
        assert f.readline().strip() == '@r1'


def test_reverse_bed(tmp_path):
    fa = tmp_path / 'g.fa'
    fa.write_text('>c1\n' + 'A' * 100 + '\n')
    bed = tmp_path / 'x.bed'
    bed.write_text('c1\t10\t20\tfeat\t0\t+\n')
    buf = io.StringIO()
    tools.reverse_bed(str(bed), str(fa), out=buf)
    assert buf.getvalue() == 'c1\t80\t90\tfeat\t0\t-\n'


def _paf_line(q, ql, qs, qe, strand, r, rl, rs, re_, mapq=60, de=0.01):
    matches = int((re_ - rs) * 0.97)
    return ('{}\t{}\t{}\t{}\t{}\t{}\t{}\t{}\t{}\t{}\t{}\t{}\t'
            'tp:A:P\tde:f:{}\n'.format(q, ql, qs, qe, strand, r, rl,
                                       rs, re_, matches, re_ - rs,
                                       mapq, de))


def _make_chain_paf(path):
    rng = random.Random(5)
    lines = []
    # qA: collinear forward chain against chr1 (3 pieces) + noise hit
    for i in range(3):
        lines.append(_paf_line('qA', 900000, 100000 * i + 5000,
                               100000 * i + 85000, '+', 'chr1', 2000000,
                               500000 + 100000 * i,
                               500000 + 100000 * i + 80000))
    lines.append(_paf_line('qA', 900000, 700000, 715000, '+', 'chr2',
                           1500000, 10000, 25000))
    # qB: reverse chain against chr2 (3 pieces)
    for i in range(3):
        lines.append(_paf_line('qB', 600000, 400000 - 120000 * i,
                               400000 - 120000 * i + 90000, '-', 'chr2',
                               1500000, 300000 + 120000 * i,
                               300000 + 120000 * i + 88000))
    # filtered: low mapq, short alignment, short query, no de tag
    lines.append(_paf_line('qA', 900000, 0, 50000, '+', 'chr1', 2000000,
                           0, 48000, mapq=0))
    lines.append(_paf_line('qB', 600000, 0, 9000, '+', 'chr2', 1500000,
                           0, 8000))
    lines.append(_paf_line('tiny', 50000, 0, 40000, '+', 'chr1',
                           2000000, 0, 39000))
    lines.append('qA\t900000\t0\t70000\t+\tchr1\t2000000\t900000\t'
                 '968000\t66000\t68000\t60\ttp:A:P\n')
    rng.shuffle(lines)
    with open(path, 'w') as f:
        f.writelines(lines)


def test_global_chaining_parity(tmp_path, monkeypatch, capsys):
    """Same chained PAF lines and pair table as the reference script."""
    import argparse
    import sys as _sys

    from . import refbridge
    ref = refbridge.load('global_chaining')

    paf = tmp_path / 'aln.paf'
    _make_chain_paf(str(paf))

    ref_dir = tmp_path / 'ref'
    our_dir = tmp_path / 'ours'
    ref_dir.mkdir()
    our_dir.mkdir()

    ref_args = argparse.Namespace(
        mapq=1, min_len=100000, min_aln_len=10000, div='de',
        min_identity=90, min_cov_ratio=0.1, min_sb_ratio=0.2,
        perform_clustering=True)
    monkeypatch.chdir(ref_dir)
    qa, ql, rl = ref.parse_paf(str(paf), ref_args.mapq, ref_args.min_len,
                               ref_args.min_aln_len, ref_args.div)
    chained, pair_lines, G = ref.chain_alignments(qa, ql, rl, ref_args)
    ref.filter_paf(str(paf), chained)
    ref.perform_clustering(str(paf), pair_lines, G)
    ref_table = capsys.readouterr().err

    monkeypatch.chdir(our_dir)
    buf = io.StringIO()
    tools.global_chaining(str(paf), mapq=1, min_cov_ratio=0.1,
                          perform_clustering=True, out=buf)

    assert (our_dir / 'all_chained.paf').read_text() == \
        (ref_dir / 'all_chained.paf').read_text()
    assert sorted(l for l in buf.getvalue().splitlines()[1:]) == \
        sorted(l for l in ref_table.splitlines()[1:])
    ref_clusters = sorted(p.name for p in ref_dir.glob('cluster*'))
    our_clusters = sorted(p.name for p in our_dir.glob('cluster*'))
    assert len(our_clusters) == len(ref_clusters)
    ref_content = sorted((p.read_text() for p in ref_dir.glob('cluster*')))
    our_content = sorted((p.read_text() for p in our_dir.glob('cluster*')))
    assert our_content == ref_content


def test_prepare_clusters(tmp_path, monkeypatch):
    d = tmp_path / 'wrk' / 'sampleX' / '03.rescue'
    d.mkdir(parents=True)
    (d / 'group1.txt').write_text('#h\nctg1\t1\t100\nctg2\t1\t100\n')
    (d / 'group2.txt').write_text('ctg3\t1\t100\n')
    (d / 'other.txt').write_text('ctg9\t1\t100\n')
    monkeypatch.chdir(tmp_path)
    tools.prepare_clusters(str(tmp_path / 'wrk'))
    lines = (tmp_path / 'user-prepared.clusters.txt').read_text(
        ).splitlines()
    assert lines[0].startswith('#Group')
    body = dict((l.split('\t')[0], l.split('\t')[2]) for l in lines[1:])
    assert body == {'sampleX_group1': 'ctg1 ctg2',
                    'sampleX_group2': 'ctg3'}


def test_mock_blast(tmp_path, monkeypatch):
    fa = tmp_path / 'ref.fa'
    fa.write_text('>Chr1_hap1\n' + 'A' * 500 + '\n')
    tour = tmp_path / 'groupX.tour'
    # truth-encoded ids: <chr>_<n>_<start>_<end>_<orient>_<len±>
    tour.write_text('>INIT\nChr1_1_1_200_+_200+ Chr1_2_201_500_+_300+\n')
    monkeypatch.chdir(tmp_path)
    cmd = tools.mock_blast(str(fa), str(tour))
    assert 'jcvi.graphics.blastplot' in cmd
    blast = (tmp_path / 'blast_groupX_Chr1.out').read_text().splitlines()
    assert len(blast) == 2
    c0 = blast[0].split('\t')
    assert c0[0] == 'groupX' and c0[1] == 'Chr1'
    assert (c0[6], c0[7], c0[8], c0[9]) == ('1', '200', '1', '200')
    assert (tmp_path / 'query.sizes').read_text() == 'groupX\t500\n'
    assert (tmp_path / 'subject.sizes').read_text() == 'Chr1\t500\n'


def test_remove_singletons(tmp_path):
    from . import bamutil
    bam = tmp_path / 'pairs.bam'
    recs = [
        ('r1', 0x40 | 0x1, 0, 100), ('r1', 0x80 | 0x1, 1, 200),
        ('r2', 0x40 | 0x1, 0, 300), ('r2', 0x80 | 0x1 | 0x4, -1, 0),
        ('r3', 0x40 | 0x1, 1, 50), ('r3', 0x80 | 0x1, 1, 400),
        ('r3', 0x80 | 0x1 | 0x800, 0, 10),
    ]
    bamutil.write_bam(
        str(bam), ['ctgA', 'ctgB'], [1000, 1000],
        [bamutil.bam_record(r, p, -1, 0, f, name=n.encode())
         for n, f, r, p in recs])
    buf = io.StringIO()
    kept = tools.remove_singletons(str(bam), out=buf)
    assert kept == 2
    assert buf.getvalue().split() == ['r1', 'r3']
