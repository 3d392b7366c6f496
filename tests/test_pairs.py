"""Edge cases of the .pairs block tokenizer and the prefetch thread."""

import threading
import time

import numpy as np

from haphic_tpu.io.pairs import PairsReader, prefetch


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
