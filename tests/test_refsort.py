"""Refsort parity test vs scripts/HapHiC_refsort.py."""

import io
import types

import pytest

from haphic_tpu.post.refsort import run_refsort

from . import refbridge


def _scenario(tmp_path):
    # g1 = a(+) b(-) maps forward to ref1; g2 = c(+) d(+) maps reversed
    # to ref2; g3 is a long solo contig; g4 a short solo (skipped).
    agp_rows = [
        'g1\t1\t100000\t1\tW\ta\t1\t100000\t+',
        'g1\t100001\t100100\t2\tU\t100\tscaffold\tyes\tproximity_ligation',
        'g1\t100101\t180000\t3\tW\tb\t1\t79900\t-',
        'g2\t1\t90000\t1\tW\tc\t1\t90000\t+',
        'g2\t90001\t90100\t2\tU\t100\tscaffold\tyes\tproximity_ligation',
        'g2\t90101\t150000\t3\tW\td\t1\t59900\t+',
        'g3\t1\t20000000\t1\tW\te\t1\t20000000\t+',
        'g4\t1\t5000\t1\tW\tf\t1\t5000\t+',
    ]
    agp = tmp_path / 's.agp'
    agp.write_text('\n'.join(agp_rows) + '\n')

    paf_rows = []

    def aln(ctg, qlen, qs, qe, strand, ref, ts, te):
        paf_rows.append('\t'.join(map(str, [
            ctg, qlen, qs, qe, strand, ref, 50000000, ts, te,
            qe - qs, qe - qs, 60])))

    # g1 forward on ref1: a then b; b is '-' in AGP so its alignment
    # strand '-' makes ctg_orient*orient = +1
    aln('a', 100000, 1000, 60000, '+', 'ref1', 101000, 160000)
    aln('b', 79900, 5000, 70000, '-', 'ref1', 190000, 255000)
    # g2 reversed on ref2
    aln('c', 90000, 1000, 80000, '-', 'ref2', 400000, 479000)
    aln('d', 59900, 2000, 50000, '-', 'ref2', 300000, 348000)
    # g3 solo long contig on ref1
    aln('e', 20000000, 100000, 900000, '+', 'ref1', 1000000, 1800000)
    paf = tmp_path / 'aln.paf'
    paf.write_text('\n'.join(paf_rows) + '\n')
    return str(agp), str(paf)


def _run_reference(agp, paf, capsys):
    ref = refbridge.load('HapHiC_refsort')
    args = types.SimpleNamespace(ref_order=None, keep_original_ids=False,
                                 max_width=60)
    ctg_group_dict, group_agp_lines, group_len_dict, one_ctg_groups = \
        ref.parse_agp(agp, 10)
    group_ref_dict = ref.parse_paf(paf, ctg_group_dict, 5000)
    ref.alignment_check(group_len_dict, group_ref_dict, one_ctg_groups,
                        5000)
    capsys.readouterr()
    ref.order_and_orient_groups(ctg_group_dict, group_ref_dict,
                                group_agp_lines, group_len_dict,
                                one_ctg_groups, args)
    return capsys.readouterr().out


def test_refsort_parity(tmp_path, capsys):
    agp, paf = _scenario(tmp_path)
    expected = _run_reference(agp, paf, capsys)
    buf = io.StringIO()
    run_refsort(agp, paf, out=buf)
    assert buf.getvalue() == expected
    # sanity on content: g2 renamed reversed, g1 forward
    text = buf.getvalue()
    assert 'g1:ref1:+' in text
    assert 'g2:ref2:-' in text
    assert 'g3:ref1:+' in text
    # short solo group keeps original lines
    assert 'g4\t1\t5000' in text


def test_refsort_fasta_roundtrip(tmp_path):
    agp, paf = _scenario(tmp_path)
    # synthesize contig FASTA
    import random
    from . import util
    rng = random.Random(0)
    lens = {'a': 100000, 'b': 79900, 'c': 90000, 'd': 59900,
            'e': 20000000, 'f': 5000}
    # keep e modest to stay fast, adjust AGP accordingly? instead trim e
    lens['e'] = 200000
    agp_text = open(agp).read().replace('20000000', '200000')
    open(agp, 'w').write(agp_text)
    paf_text = open(paf).read().replace('20000000', '200000') \
        .replace('900000', '190000').replace('1800000', '1090000')
    open(paf, 'w').write(paf_text)
    ctgs = {n: ''.join(rng.choice('ATCG') for _ in range(L))
            for n, L in lens.items()}
    fa = tmp_path / 'ctgs.fa'
    util.write_genome(str(fa), ctgs)
    out_fa = tmp_path / 'sorted.fa'
    buf = io.StringIO()
    run_refsort(agp, paf, fasta=str(fa), fasta_out=str(out_fa), out=buf)
    from haphic_tpu.io.fasta import iter_fasta, revcomp
    got = {n: s for n, s in iter_fasta(str(out_fa))}
    assert 'g1:ref1:+' in got and 'g2:ref2:-' in got
    # forward scaffold sequence = a + Ns + revcomp(b)
    expected_g1 = ctgs['a'] + 'N' * 100 + revcomp(ctgs['b'])
    assert got['g1:ref1:+'] == expected_g1
    # reversed scaffold = revcomp(full g2 sequence)
    g2_seq = ctgs['c'] + 'N' * 100 + ctgs['d']
    assert got['g2:ref2:-'] == revcomp(g2_seq)
