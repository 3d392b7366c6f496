"""Edge cases of the .pairs block tokenizer and the prefetch thread,
plus native/pairs_reader.cpp parity with the Python paths."""

import gzip
import threading
import time

import numpy as np
import pytest

from haphic_tpu.io.pairs import PairsReader, _native_pairs, prefetch


def _collect(reader):
    refs, poss, mrefs, mposs = [], [], [], []
    for c in reader:
        refs.append(c.ref)
        poss.append(c.pos)
        mrefs.append(c.mref)
        mposs.append(c.mpos)
    return (np.concatenate(refs), np.concatenate(poss),
            np.concatenate(mrefs), np.concatenate(mposs))


def test_whitespace_only_lines_are_skipped(tmp_path):
    p = tmp_path / 'x.pairs'
    p.write_text('## pairs format v1.0\n'
                 'r1\tctgA\t10\tctgB\t20\t+\t+\n'
                 '   \n'
                 'r2\tctgB\t5\tctgA\t7\t+\t+\n'
                 '\t\t\n'
                 'r3\tctgA\t1\tctgA\t2\t+\t+\n')
    ref, pos, mref, mpos = _collect(PairsReader(str(p), ['ctgA', 'ctgB']))
    assert len(ref) == 3
    np.testing.assert_array_equal(ref, [0, 1, 0])
    np.testing.assert_array_equal(pos, [9, 4, 0])
    np.testing.assert_array_equal(mref, [1, 0, 0])
    np.testing.assert_array_equal(mpos, [19, 6, 1])


def test_mixed_column_width_block_not_misparsed(tmp_path):
    """A block mixing 6- and 8-column rows whose total token count
    happens to be divisible by the first row's width must not be
    stride-sliced into wrong positions."""
    p = tmp_path / 'x.pairs'
    # first line 6 cols, second 8, third 4 -> total 18 = 3*6 tokens:
    # the naive total-count check would stride-slice this block
    p.write_text('r1\tctgA\t10\tctgB\t20\t+\n'
                 'r2\tctgB\t5\tctgA\t7\t+\t+\tUU\tx\n'
                 'r3\tctgA\t1\tctgA\n')
    ref, pos, mref, mpos = _collect(PairsReader(str(p), ['ctgA', 'ctgB']))
    # r3 (4 cols) is dropped by the validating parser; r1/r2 parse right
    np.testing.assert_array_equal(ref, [0, 1])
    np.testing.assert_array_equal(pos, [9, 4])
    np.testing.assert_array_equal(mref, [1, 0])
    np.testing.assert_array_equal(mpos, [19, 6])


def test_prefetch_releases_producer_on_early_exit():
    closed = []

    def gen():
        try:
            for k in range(1000):
                yield k
        finally:
            closed.append(True)

    n_before = threading.active_count()
    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()                       # consumer abandons iteration
    for _ in range(50):              # producer should wind down fast
        if closed and threading.active_count() <= n_before:
            break
        time.sleep(0.05)
    assert closed, 'producer never closed the wrapped generator'


def test_prefetch_normal_completion():
    assert list(prefetch(iter(range(10)), depth=2)) == list(range(10))


def _messy_pairs_text():
    return ('## pairs format v1.0\n'
            '#columns: readID chr1 pos1 chr2 pos2 strand1 strand2\n'
            'r1\tctgA\t10\tctgB\t20\t+\t+\n'
            '   \n'
            'r2 ctgB 5 ctgA 7 + +\n'          # space-separated
            'r3\tunknown\t3\tctgA\t4\t+\t+\n'  # unknown contig -> -1
            '# stray comment mid-file\n'
            'r4\tctgA\t1\tctgA\t2\t-\t-\n'
            'r5\tctgB\t9\tctgB')               # short line: skipped


def _expected():
    return ([0, 1, -1, 0], [9, 4, 2, 0], [1, 0, 0, 0], [19, 6, 3, 1])


def _collect_arrays(reader):
    rs, ps, ms, qs = [], [], [], []
    for c in reader:
        rs.append(c.ref)
        ps.append(c.pos)
        ms.append(c.mref)
        qs.append(c.mpos)
    return [np.concatenate(x) for x in (rs, ps, ms, qs)]


@pytest.mark.parametrize('suffix', ['.pairs', '.pairs.gz'])
def test_native_reader_parity(tmp_path, suffix, monkeypatch):
    if _native_pairs() is None:
        pytest.skip('native pairs reader unavailable')
    p = tmp_path / ('x' + suffix)
    if suffix.endswith('.gz'):
        with gzip.open(str(p), 'wt') as f:
            f.write(_messy_pairs_text())
    else:
        p.write_text(_messy_pairs_text())
    names = ['ctgA', 'ctgB']
    got_native = _collect_arrays(PairsReader(str(p), names))
    monkeypatch.setenv('HAPHIC_NO_NATIVE_PAIRS', '1')
    got_py = _collect_arrays(PairsReader(str(p), names))
    for a, b, exp in zip(got_native, got_py, _expected()):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, exp)


def test_native_reader_random_parity(tmp_path, monkeypatch):
    """Large random file: native and Python block tokenizer must agree
    element-for-element (chunk boundaries land mid-file)."""
    if _native_pairs() is None:
        pytest.skip('native pairs reader unavailable')
    rng = np.random.default_rng(0)
    names = sorted('c{}'.format(i) for i in range(40))
    n = 30000
    an = np.asarray(names)
    lines = ['## header']
    a = rng.integers(0, 40, n)
    b = rng.integers(0, 40, n)
    pa = rng.integers(1, 10**9, n)
    pb = rng.integers(1, 10**9, n)
    for k in range(n):
        lines.append('r{}\t{}\t{}\t{}\t{}\t+\t-'.format(
            k, an[a[k]], pa[k], an[b[k]], pb[k]))
    (tmp_path / 'big.pairs').write_text('\n'.join(lines) + '\n')
    rd = PairsReader(str(tmp_path / 'big.pairs'), names,
                     chunk_lines=7001)
    got_native = _collect_arrays(rd)
    monkeypatch.setenv('HAPHIC_NO_NATIVE_PAIRS', '1')
    got_py = _collect_arrays(PairsReader(str(tmp_path / 'big.pairs'),
                                         names, chunk_lines=7001))
    for x, y in zip(got_native, got_py):
        np.testing.assert_array_equal(x, y)
