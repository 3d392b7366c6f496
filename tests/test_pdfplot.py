"""The built-in statistics.pdf writer (haphic_tpu/cluster/_pdfplot.py)
— the default renderer replacing matplotlib on the cluster stage's
critical tail (reference figure: scripts/HapHiC_cluster.py
draw_statistics_plots)."""

import os
import re
import zlib

import numpy as np
import pytest

from haphic_tpu.cluster._pdfplot import PANELS, FastStatDrawer


def _panel_data(n=500):
    rng = np.random.RandomState(0)
    out = []
    for _, _, xmax in PANELS:
        x = np.linspace(0, xmax, n)
        y1 = np.sort(rng.rand(n)) * 50
        y2 = 90 + np.sort(rng.rand(n)) * 10
        out.append((x, y1, y2))
    return out


def _load(path):
    raw = open(path, 'rb').read()
    # slice exactly /Length bytes: a non-greedy regex to 'endstream'
    # truncates streams whose Flate bytes happen to contain it
    m = re.search(rb'/Length (\d+)[^>]*>>\s*stream\n', raw)
    start = m.end()
    data = raw[start:start + int(m.group(1))]
    return raw, zlib.decompress(data).decode('latin1')


def test_valid_pdf_structure(tmp_path):
    d = FastStatDrawer()
    d.save(str(tmp_path), _panel_data())
    raw, content = _load(str(tmp_path / 'statistics.pdf'))
    assert raw.startswith(b'%PDF-1.4')
    assert raw.rstrip().endswith(b'%%EOF')
    # xref offsets must point at their objects (viewers rely on this)
    xref = raw[raw.rindex(b'\nxref') + 1:].split(b'\n')
    nobj = int(xref[1].split()[1])
    offs = [int(l.split()[0]) for l in xref[3:3 + nobj - 1]]
    for i, off in enumerate(offs, 1):
        assert raw[off:off + 10].startswith(
            '{} 0 obj'.format(i).encode())
    startxref = int(raw[raw.rindex(b'startxref') + 9:].split()[0])
    assert raw[startxref:startxref + 4] == b'xref'
    # balanced text/state operators in the content stream
    assert content.count('BT') == content.count('ET')
    assert len(re.findall(r'(?:^|\s)q(?:\s|$)', content)) == \
        len(re.findall(r'(?:^|\s)Q(?:\s|$)', content))


def test_curves_and_labels_present(tmp_path):
    d = FastStatDrawer()
    data = _panel_data(n=123)
    d.save(str(tmp_path), data)
    _, content = _load(str(tmp_path / 'statistics.pdf'))
    # 4 panels x 2 curves, each clipped (q ... W n ... S Q)
    assert content.count('W n') == 8
    # every panel title and axis label is drawn (PDF escapes parens)
    unescaped = content.replace(r'\(', '(').replace(r'\)', ')')
    for title, xlabel, _ in PANELS:
        assert title in unescaped
        assert xlabel in unescaped
    assert 'Number of contigs filtered out' in content
    assert 'Length of remaining contigs' in content
    # each curve carries all its points (1 moveto + n-1 linetos)
    assert content.count(' l\n') + content.count(' l\nS') >= 8 * 121


def test_empty_curve_and_escaping(tmp_path):
    d = FastStatDrawer()
    data = _panel_data(n=0)
    d.save(str(tmp_path), data)   # must not crash on empty input
    raw, content = _load(str(tmp_path / 'statistics.pdf'))
    assert content.count('W n') == 0    # no curves drawn
    assert b'%%EOF' in raw


def test_overwrite_is_atomic(tmp_path):
    d = FastStatDrawer()
    d.save(str(tmp_path), _panel_data(50))
    first = os.path.getsize(tmp_path / 'statistics.pdf')
    d.save(str(tmp_path), _panel_data(500))
    assert os.path.getsize(tmp_path / 'statistics.pdf') > first
    assert not os.path.exists(str(tmp_path / 'statistics.pdf.tmp'))


def test_output_statistics_uses_fast_drawer(tmp_path, monkeypatch):
    """The pipeline-facing entry point renders statistics.pdf inline
    with the fast writer (no matplotlib import, wait() is a no-op)."""
    import random
    from decimal import Decimal

    from haphic_tpu.cluster.statistics import output_statistics
    from haphic_tpu.cluster.sweep import ClusterSet
    from haphic_tpu.core.contacts import COO
    from haphic_tpu.io.fasta import Assembly

    monkeypatch.delenv('HAPHIC_STATS_MPL', raising=False)
    rng = random.Random(1)
    n = 12
    names = ['c{:02d}'.format(i) for i in range(n)]
    lengths = rng.sample(range(50000, 300000, 7), n)
    res = rng.sample(range(50, 900), n)
    asm = Assembly(
        names=names, name2id={c: i for i, c in enumerate(names)},
        lengths=np.asarray(lengths, np.int64),
        re_sites=np.asarray(res, np.int64),
        seqs=None, input_order={c: i for i, c in enumerate(names)})
    ii, jj, ww = [], [], []
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < 0.7:
                ii.append(i)
                jj.append(j)
                ww.append(rng.randint(1, 5000))
    full = COO(i=np.asarray(ii), j=np.asarray(jj),
               w=np.asarray(ww, float))
    groups = [names[:4], names[4:8], names[8:11]]
    cluster_sets = [
        ClusterSet(inflation=Decimal(s),
                   clusters=[(list(g), sum(lengths[names.index(c)]
                                           for c in g))
                             for g in groups])
        for s in ('1.2', '1.5')]
    for cs in cluster_sets:
        (tmp_path / 'inflation_{}'.format(cs.inflation)).mkdir()
    wait = output_statistics(asm, full, cluster_sets, str(tmp_path),
                             background=True)
    wait()
    for cs in cluster_sets:
        pdf = tmp_path / 'inflation_{}'.format(cs.inflation) / \
            'statistics.pdf'
        assert pdf.exists() and pdf.stat().st_size > 1000
