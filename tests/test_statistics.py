"""Byte parity of clustering statistics files vs the reference."""

import random
from decimal import Decimal

import numpy as np

from haphic_tpu.cluster.statistics import output_statistics
from haphic_tpu.cluster.sweep import ClusterSet
from haphic_tpu.core.contacts import COO
from haphic_tpu.io.fasta import Assembly

from . import refbridge


def _scenario(seed=0, n=18):
    rng = random.Random(seed)
    names = ['c{:02d}'.format(i) for i in range(n)]
    lengths = rng.sample(range(50000, 300000, 7), n)
    res = rng.sample(range(50, 900), n)
    link = {}
    weights = iter(rng.sample(range(1, 50000), n * n))
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < 0.7:
                link[(names[i], names[j])] = next(weights)
    groups = [names[:6], names[6:12], names[12:16]]   # 2 left ungrouped
    return names, lengths, res, link, groups


def test_statistics_byte_parity(tmp_path, monkeypatch):
    ref_cluster = refbridge.load('HapHiC_cluster')
    names, lengths, res, link, groups = _scenario()
    fa_dict = {c: [None, l, r] for c, l, r in zip(names, lengths, res)}
    result_clusters = [(list(g), sum(lengths[names.index(c)] for c in g))
                       for g in groups]
    refdir = tmp_path / 'ref'
    refdir.mkdir()
    (refdir / 'inflation_1.5').mkdir()
    monkeypatch.chdir(refdir)
    ref_cluster.output_statistics(
        fa_dict, dict(link), [(Decimal('1.5'), result_clusters)])
    monkeypatch.chdir(tmp_path)

    asm = Assembly(
        names=sorted(names),
        name2id={c: i for i, c in enumerate(sorted(names))},
        lengths=np.asarray([lengths[names.index(c)]
                            for c in sorted(names)], np.int64),
        re_sites=np.asarray([res[names.index(c)]
                             for c in sorted(names)], np.int64),
        seqs=None, input_order={c: i for i, c in enumerate(names)})
    ii = [asm.name2id[a] for (a, b) in link]
    jj = [asm.name2id[b] for (a, b) in link]
    ww = list(link.values())
    full = COO(i=np.asarray(ii), j=np.asarray(jj),
               w=np.asarray(ww, float))
    cs = ClusterSet(inflation=Decimal('1.5'),
                    clusters=[(list(g), sum(lengths[names.index(c)]
                                            for c in g))
                              for g in groups])
    ourdir = tmp_path / 'ours'
    ourdir.mkdir()
    output_statistics(asm, full, [cs], outdir=str(ourdir), draw=False)

    for fn in ('RE_site_threshold_statistics.txt',
               'Link_threshold_statistics.txt',
               'Link_density_threshold_statistics.txt',
               'Link_density_ratio_threshold_statistics.txt'):
        got = (ourdir / 'inflation_1.5' / fn).read_text()
        exp = (refdir / 'inflation_1.5' / fn).read_text()
        assert got == exp, fn
