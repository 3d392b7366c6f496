import numpy as np
import pytest

from haphic_tpu.io.fasta import (count_RE_sites, expand_RE_sites, parse_RE,
                                 read_fasta, revcomp, write_fasta)


def test_expand_RE_sites_no_N():
    assert expand_RE_sites(['GATC']) == ['GATC']


def test_expand_RE_sites_one_N():
    assert sorted(expand_RE_sites(['GANTC'])) == sorted(
        ['GAATC', 'GATTC', 'GACTC', 'GAGTC'])


def test_expand_RE_sites_two_N():
    out = expand_RE_sites(['NN'])
    assert len(out) == 16
    assert all('N' not in s for s in out)


def test_parse_RE_multi():
    sites = parse_RE('GATC, GANTC')
    assert 'GATC' in sites and 'GAATC' in sites and len(sites) == 5


def test_count_RE_sites():
    assert count_RE_sites('GATCGATC', 'GATC') == 2
    assert count_RE_sites('gatc'.upper(), 'GATC') == 1
    assert count_RE_sites('AAAA', 'GATC') == 0
    # Arima two-enzyme
    assert count_RE_sites('GATCGAATC', 'GATC,GANTC') == 2


def test_revcomp():
    assert revcomp('ATCG') == 'CGAT'
    assert revcomp('AaNnt') == 'anNtT'


def test_read_fasta(tmp_path):
    fa = tmp_path / 'x.fa'
    fa.write_text('>ctg2 extra comment\nGATCgatc\nAAAA\n>ctg1\nTTTT\n')
    asm = read_fasta(str(fa))
    # names sorted lexicographically
    assert asm.names == ['ctg1', 'ctg2']
    assert asm.length_of('ctg2') == 12
    assert asm.length_of('ctg1') == 4
    # +1 pseudo-count like the reference
    assert asm.re_of('ctg2') == 3
    assert asm.re_of('ctg1') == 1
    # uppercased by default
    assert asm.seq_of('ctg2') == 'GATCGATCAAAA'
    # input order preserved
    assert asm.names_by_input_order() == ['ctg2', 'ctg1']
    assert asm.pos_int_type() == 'int32'
    assert asm.dist_int_type() == 'int32'


def test_write_fasta_wrap(tmp_path):
    p = tmp_path / 'o.fa'
    write_fasta(str(p), [('s', 'A' * 130)], max_width=60)
    lines = p.read_text().splitlines()
    assert lines[0] == '>s'
    assert [len(l) for l in lines[1:]] == [60, 60, 10]


def test_int_types():
    from haphic_tpu.io.fasta import Assembly
    asm = Assembly(names=['a', 'b'], name2id={'a': 0, 'b': 1},
                   lengths=np.array([2 ** 31 - 10, 100]),
                   re_sites=np.array([1, 1]))
    assert asm.pos_int_type() == 'int32'
    assert asm.dist_int_type() == 'int64'
