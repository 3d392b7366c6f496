"""BAM reader tests: native (C++) and pure-Python paths must agree."""

import random

import numpy as np
import pytest

from haphic_tpu.io.bam import FLAG_PAIRED, FLAG_READ1, BamReader, native_lib

from . import bamutil


def _fixture(tmp_path, seed=0, n=5000, so='queryname'):
    rng = random.Random(seed)
    ref_names = ['ctgB', 'ctgA', 'ctgC']      # deliberately unsorted
    ref_lens = [100000, 80000, 60000]
    recs = []
    truth = []
    for k in range(n):
        r1 = rng.randrange(3)
        r2 = rng.randrange(3)
        p1 = rng.randrange(0, ref_lens[r1])
        p2 = rng.randrange(0, ref_lens[r2])
        flag = FLAG_PAIRED | (FLAG_READ1 if k % 2 == 0 else 0x80)
        name = 'read{}'.format(k).encode()
        recs.append(bamutil.bam_record(r1, p1, r2, p2, flag, mapq=30,
                                       name=name, nm=k % 5))
        if flag & FLAG_READ1:
            truth.append((ref_names[r1], p1, ref_names[r2], p2))
    path = tmp_path / 'test.bam'
    bamutil.write_bam(str(path), ref_names, ref_lens, recs, so=so)
    return str(path), sorted(ref_names), truth


def _collect(reader, names):
    out = []
    for chunk in reader:
        for a, p, b, q in zip(chunk.ref, chunk.pos, chunk.mref, chunk.mpos):
            out.append((names[a], int(p), names[b], int(q)))
    return out


def test_python_reader(tmp_path):
    path, names, truth = _fixture(tmp_path)
    got = _collect(BamReader(path, names, use_native=False,
                             chunk_records=700), names)
    assert got == truth


def test_native_reader(tmp_path):
    if native_lib() is None:
        pytest.skip('native BAM reader not built')
    path, names, truth = _fixture(tmp_path, seed=1)
    got = _collect(BamReader(path, names, use_native=True,
                             chunk_records=700, threads=3), names)
    assert got == truth


def test_native_matches_python(tmp_path):
    if native_lib() is None:
        pytest.skip('native BAM reader not built')
    path, names, truth = _fixture(tmp_path, seed=2, n=20000)
    a = _collect(BamReader(path, names, use_native=True), names)
    b = _collect(BamReader(path, names, use_native=False), names)
    assert a == b == truth


def test_coordinate_sorted_rejected(tmp_path):
    path, names, _ = _fixture(tmp_path, so='coordinate')
    with pytest.raises(RuntimeError):
        list(BamReader(path, names, use_native=False))
    if native_lib() is not None:
        with pytest.raises(RuntimeError):
            list(BamReader(path, names, use_native=True))


def test_unknown_contigs_skipped(tmp_path):
    path, names, truth = _fixture(tmp_path, seed=3)
    # drop one contig from the assembly: records touching it vanish
    sub = [n for n in names if n != 'ctgC']
    got = _collect(BamReader(path, sub, use_native=False), sub)
    expected = [t for t in truth if t[0] != 'ctgC' and t[2] != 'ctgC']
    assert got == expected


def test_cram_is_rejected_with_conversion_hint(tmp_path):
    """CRAM decoding needs htslib's reference-backed codec; the error
    must say how to convert (reference reads CRAM via pysam,
    HapHiC_cluster.py:2862)."""
    import pytest
    from haphic_tpu.io.bam import BamReader
    p = tmp_path / 'aln.cram'
    p.write_bytes(b'CRAM')
    with pytest.raises(RuntimeError, match='samtools view -b'):
        BamReader(str(p), ['ctg1'])
