"""Byte-parity tests for scaffold building vs the reference builder."""

import os
import random
import types

import pytest

from haphic_tpu.build.scaffolds import (build_final_scaffolds,
                                        parse_corrected_ctgs, parse_tours)
from haphic_tpu.io.fasta import read_fasta

from . import refbridge
from . import util


def _setup(tmp_path, seed=0, corrected=False):
    rng = random.Random(seed)
    ctgs = util.random_genome(rng, n_ctg=10, min_len=300, max_len=900)
    if corrected:
        # rename two contigs as corrected fragments of a raw contig
        items = list(ctgs.items())
        (n1, s1), (n2, s2) = items[0], items[1]
        del ctgs[n1], ctgs[n2]
        ctgs[n1 + ':1-{}'.format(len(s1))] = s1
        ctgs[n2 + ':51-{}'.format(50 + len(s2))] = s2
        corrected_names = [n1 + ':1-{}'.format(len(s1)),
                           n2 + ':51-{}'.format(50 + len(s2))]
    else:
        corrected_names = []
    fa = tmp_path / 'asm.fa'
    util.write_genome(str(fa), ctgs)

    names = list(ctgs)
    rng.shuffle(names)
    anchored = names[:7]
    tour_files = []
    for g, chunk in enumerate([anchored[:4], anchored[4:]], 1):
        tf = tmp_path / 'group{}_{}bp.tour'.format(
            g, sum(len(ctgs[c]) for c in chunk))
        with open(tf, 'w') as f:
            f.write('>INIT\n')
            f.write(' '.join(c + rng.choice('+-') for c in chunk) + '\n')
        tour_files.append(str(tf))

    cpath = None
    if corrected_names:
        cpath = tmp_path / 'corrected_ctgs.txt'
        cpath.write_text('\n'.join(corrected_names) + '\n')
    return fa, tour_files, (str(cpath) if cpath else None)


def _run_reference(tmp_path, fa, tour_files, corrected, monkeypatch, **kw):
    ref = refbridge.load('HapHiC_build')
    refc = refbridge.load('HapHiC_cluster')
    outdir = tmp_path / 'ref_out'
    outdir.mkdir()
    monkeypatch.chdir(outdir)
    fa_dict = refc.parse_fasta(str(fa))
    tour_dict, output_ctgs = ref.parse_tours(tour_files, fa_dict)
    corrected_set = ref.parse_corrected_ctgs(corrected)
    args = types.SimpleNamespace(
        prefix='scaffolds', Ns=kw.get('Ns', 100),
        max_width=kw.get('max_width', 60),
        sort_by_input=kw.get('sort_by_input', False))
    ref.build_final_scaffolds(tour_dict, fa_dict, output_ctgs,
                              corrected_set, args)
    monkeypatch.chdir(tmp_path)
    return outdir


def _run_ours(tmp_path, fa, tour_files, corrected, **kw):
    outdir = tmp_path / 'our_out'
    outdir.mkdir()
    asm = read_fasta(str(fa))
    tours = parse_tours(tour_files, set(asm.names))
    corrected_set = parse_corrected_ctgs(corrected)
    build_final_scaffolds(tours, asm, corrected_set, outdir=str(outdir), **kw)
    return outdir


@pytest.mark.parametrize('corrected', [False, True])
def test_build_byte_parity(tmp_path, monkeypatch, corrected):
    fa, tour_files, cpath = _setup(tmp_path, seed=3, corrected=corrected)
    ref_dir = _run_reference(tmp_path, fa, tour_files, cpath, monkeypatch)
    our_dir = _run_ours(tmp_path, fa, tour_files, cpath)
    for fn in ('scaffolds.fa', 'scaffolds.agp', 'scaffolds.raw.agp'):
        assert (our_dir / fn).read_bytes() == (ref_dir / fn).read_bytes(), fn


def test_build_byte_parity_options(tmp_path, monkeypatch):
    fa, tour_files, cpath = _setup(tmp_path, seed=8)
    kw = dict(Ns=500, max_width=80, sort_by_input=True)
    ref_dir = _run_reference(tmp_path, fa, tour_files, cpath, monkeypatch, **kw)
    our_dir = _run_ours(tmp_path, fa, tour_files, cpath, **kw)
    for fn in ('scaffolds.fa', 'scaffolds.agp', 'scaffolds.raw.agp'):
        assert (our_dir / fn).read_bytes() == (ref_dir / fn).read_bytes(), fn


def test_parse_tours_errors(tmp_path):
    fa, tour_files, _ = _setup(tmp_path, seed=1)
    asm = read_fasta(str(fa))
    with pytest.raises(RuntimeError):
        parse_tours(tour_files, {'nope'})
    # duplicate contig across tours
    dup = tmp_path / 'group9_1bp.tour'
    first = open(tour_files[0]).read().splitlines()[-1].split()[0]
    dup.write_text('>INIT\n{}\n'.format(first))
    with pytest.raises(RuntimeError):
        parse_tours(tour_files + [str(dup)], set(asm.names))
