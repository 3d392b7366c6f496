"""Ultra-long read integration tests."""

import numpy as np
import pytest

from haphic_tpu.core.contacts import COO
from haphic_tpu.core.ul import (boost_flank_and_full, boost_ht_links,
                                parse_ul_alignments, path_ctg_set)

from . import bamutil


def _ul_bam(tmp_path, n_reads=3):
    """Reads spanning junctions of the true path A+ -> B- -> C+.

    Each read has a primary on one contig end and a supplementary on
    the adjacent contig's facing end.
    """
    names = ['A', 'B', 'C']
    lens = [50000, 40000, 60000]
    recs = []
    rid = 0

    def read(primary, supp):
        nonlocal rid
        rid += 1
        name = 'ul{}'.format(rid).encode()
        recs.append(bamutil.bam_record(
            primary[0], primary[1], -1, -1, primary[2], mapq=60,
            name=name, cigar=primary[3], tags=[(b'AS', 1000)]))
        recs.append(bamutil.bam_record(
            supp[0], supp[1], -1, -1, supp[2] | 0x800, mapq=60,
            name=name, cigar=supp[3], tags=[(b'AS', 900)]))

    # NOTE: CIGARs are stored in SEQ orientation; a reverse-strand
    # record occupying read interval [20000, 40000) therefore has its
    # soft clip on the RIGHT of the aligned block, and vice versa.
    for _ in range(n_reads):
        # junction A_T -> B_T (B is '-'): read starts at A's tail (fwd,
        # read [0, 20000)), continues into B's tail (reverse,
        # read [20000, 40000)).
        read((0, 50000 - 20000, 0, [('M', 20000), ('S', 20000)]),
             (1, 40000 - 20000, 16, [('M', 20000), ('S', 20000)]))
        # junction B_H -> C_H: primary on B head (reverse,
        # read [0, 20000)), supplementary on C head (fwd,
        # read [20000, 40000)).
        read((1, 0, 16, [('S', 20000), ('M', 20000)]),
             (2, 0, 0, [('S', 20000), ('M', 20000)]))
    path = tmp_path / 'ul.bam'
    bamutil.write_bam(str(path), names, lens, recs)
    return str(path), names, np.asarray(lens, np.int64)


def test_parse_ul_paths(tmp_path):
    bam, names, lens = _ul_bam(tmp_path)
    paths = parse_ul_alignments(bam, names, lens, min_ul_support=2,
                                min_ul_alignment_length=10000,
                                max_distance_to_end=100)
    assert len(paths) == 1
    path = paths[0]
    assert len(path) == 6
    # expected HT chain: A_H A_T B_T B_H C_H C_T (ids 2c+tail)
    expected = [0, 1, 3, 2, 4, 5]
    assert path == expected or path == expected[::-1]
    assert path_ctg_set(paths) == {0, 1, 2}


def test_min_support_filter(tmp_path):
    bam, names, lens = _ul_bam(tmp_path, n_reads=1)
    paths = parse_ul_alignments(bam, names, lens, min_ul_support=2)
    assert paths == []


def test_boost_links(tmp_path):
    bam, names, lens = _ul_bam(tmp_path)
    paths = parse_ul_alignments(bam, names, lens, min_ul_support=2)

    # HT COO: A_T-B_T pair should double; A_H-B_H should not
    ht = COO(i=np.asarray([1, 0]), j=np.asarray([3, 2]),
             w=np.asarray([10.0, 7.0]))
    out = boost_ht_links(paths, ht, 3)
    assert out.w.tolist() == [20.0, 7.0]

    from haphic_tpu.core.fragments import Fragments
    from haphic_tpu.io.fasta import Assembly
    asm = Assembly(names=names, name2id={c: i for i, c in enumerate(names)},
                   lengths=lens, re_sites=np.ones(3, np.int64),
                   seqs=None, input_order={c: i for i, c in
                                           enumerate(names)})
    frags = Fragments(asm=asm, ctg_of_frag=np.arange(3, dtype=np.int32),
                      bin_no=np.ones(3, np.int32),
                      frag_start=np.zeros(3, np.int64),
                      frag_len=lens.copy(), frag_re=np.ones(3, np.int64),
                      frag_offset=np.arange(4, dtype=np.int64),
                      split_ctg=np.zeros(3, bool),
                      nx_mask=np.ones(3, bool), bin_size=0)
    full = COO(i=np.asarray([0, 0]), j=np.asarray([1, 2]),
               w=np.asarray([5.0, 3.0]))
    flank = COO(i=np.asarray([0, 0]), j=np.asarray([1, 2]),
                w=np.asarray([4.0, 2.0]))
    new_flank, new_full = boost_flank_and_full(paths, flank, full, frags)
    # A-B adjacent -> full doubled; A-C not adjacent but same path ->
    # only flank doubled
    assert new_full.w.tolist() == [10.0, 3.0]
    assert new_flank.w.tolist() == [8.0, 4.0]
