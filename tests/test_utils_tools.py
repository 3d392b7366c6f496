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
