"""Per-inflation threshold statistics for the reassignment step.

Byte-compatible re-implementation of output_statistics
(scripts/HapHiC_cluster.py:2245-2478): for every inflation's clusters it
writes cumulative filter-threshold curves — RE sites, best-group links,
best-group link density, and best/average density ratio — as
``inflation_*/{name}_statistics.txt`` plus a 4-panel ``statistics.pdf``.
"""

from __future__ import annotations

import logging
import os
from collections import OrderedDict
from typing import Dict, List, Tuple

import numpy as np

from haphic_tpu.core.contacts import COO
from haphic_tpu.io.fasta import Assembly

logger = logging.getLogger(__name__)


def _generate_axes(sorted_list, lengths: Dict[str, int], total_n: int,
                   total_len: int):
    """(parity: :2281-2301) cumulative (#filtered, remaining length)
    per distinct threshold value, ascending."""
    n_at = OrderedDict({0: 0})
    len_at = OrderedDict({0: 0})
    last = 0
    for ctg, value in sorted_list:
        if value in n_at:
            n_at[value] += 1
            len_at[value] += lengths[ctg]
        else:
            n_at[value] = n_at[last] + 1
            len_at[value] = len_at[last] + lengths[ctg]
            last = value
    x, y1, y2 = [], [], []
    for k, v in n_at.items():
        x.append(k)
        y1.append(v / total_n * 100)
        y2.append((total_len - len_at[k]) / total_len * 100)
    return x, y1, y2


def _write_result(x, y1, y2, title: str, outdir: str) -> None:
    with open(os.path.join(outdir,
                           '{}_statistics.txt'.format(title)), 'w') as f:
        f.write('{}\tFiltered_ctg_n\tRest_ctg_len\n'.format(title))
        for n, value in enumerate(x):
            f.write('>{}\t{}\t{}\n'.format(value, y1[n], y2[n]))


def _link_density(max_group, current_group, links, group_re, ctg_re):
    if max_group == current_group:
        return links / group_re
    return links / (group_re + ctg_re - 1)


def output_statistics(asm: Assembly, full: COO, cluster_sets,
                      outdir: str = '.', draw: bool = True) -> None:
    """``cluster_sets``: list of sweep.ClusterSet; writes into
    ``outdir``/inflation_*/ (created by the sweep)."""
    logger.info('Making some statistics for the next HapHiC '
                'reassignment step...')
    names_in_order = asm.names_by_input_order()
    lengths = {c: asm.length_of(c) for c in asm.names}
    re_sites = {c: asm.re_of(c) for c in asm.names}
    total_n = len(asm)
    total_len = asm.total_len

    re_list = sorted(((c, re_sites[c]) for c in names_in_order),
                     key=lambda x: x[1])
    x_re, y1_re, y2_re = _generate_axes(re_list, lengths, total_n,
                                        total_len)

    # name-keyed full link dict (insertion: ascending pair ids)
    link_items = [((asm.names[int(a)], asm.names[int(b)]),
                   int(w) if float(w).is_integer() else float(w))
                  for a, b, w in zip(full.i, full.j, full.w)]

    for cs in cluster_sets:
        d = os.path.join(outdir, 'inflation_{}'.format(cs.inflation))
        os.makedirs(d, exist_ok=True)
        _write_result(x_re, y1_re, y2_re, 'RE_site_threshold', d)

        ctg_group: Dict[str, object] = {}
        group_re: Dict[int, float] = {}
        for n, (ctgs, _) in enumerate(cs.clusters):
            group_re[n] = 1
            for ctg in ctgs:
                ctg_group[ctg] = n
                group_re[n] += re_sites[ctg] - 1
        for c in asm.names:
            ctg_group.setdefault(c, 'ungrouped')

        group_links: Dict[str, Dict[int, float]] = {}
        for (ci, cj), w in link_items:
            gi, gj = ctg_group[ci], ctg_group[cj]
            if gj != 'ungrouped':
                group_links.setdefault(ci, {})
                group_links[ci][gj] = group_links[ci].get(gj, 0) + w
            if gi != 'ungrouped':
                group_links.setdefault(cj, {})
                group_links[cj][gi] = group_links[cj].get(gi, 0) + w

        link_list, density_list, ratio_list = [], [], []
        for ctg in names_in_order:
            gl = group_links.get(ctg)
            if not gl:
                link_list.append((ctg, 0))
                density_list.append((ctg, 0))
                ratio_list.append((ctg, 0))
                continue
            ranked = sorted(gl.items(), key=lambda x: x[1], reverse=True)
            max_group, max_links = ranked[0]
            link_list.append((ctg, max_links))
            cur = ctg_group[ctg]
            dmax = _link_density(max_group, cur, max_links,
                                 group_re[max_group], re_sites[ctg])
            density_list.append((ctg, dmax))
            if len(group_re) > 1:
                other = sum(_link_density(g, cur, l, group_re[g],
                                          re_sites[ctg])
                            for g, l in ranked[1:])
                avg_other = other / (len(group_re) - 1)
            else:
                avg_other = 0
            ratio_list.append((ctg, dmax / avg_other if avg_other
                               else 1000000))

        link_list.sort(key=lambda x: x[1])
        density_list.sort(key=lambda x: x[1])
        ratio_list.sort(key=lambda x: x[1])
        axes_link = _generate_axes(link_list, lengths, total_n, total_len)
        axes_density = _generate_axes(density_list, lengths, total_n,
                                      total_len)
        axes_ratio = _generate_axes(ratio_list, lengths, total_n,
                                    total_len)
        _write_result(*axes_link, 'Link_threshold', d)
        _write_result(*axes_density, 'Link_density_threshold', d)
        _write_result(*axes_ratio, 'Link_density_ratio_threshold', d)

        if draw:
            _draw(d, (x_re, y1_re, y2_re), axes_link, axes_density,
                  axes_ratio)


def _draw(outdir, axes_re, axes_link, axes_density, axes_ratio) -> None:
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
    except ImportError:
        logger.warning('matplotlib is not installed, statistical plots '
                       'are skipped')
        return
    fig = plt.figure(figsize=(8, 7))
    panels = [
        (axes_re, 'RE site threshold', 'Number of RE sites', 500),
        (axes_link, 'Hi-C link threshold',
         'Number of links to the best group', 500),
        (axes_density, 'Link density threshold',
         'Link density to the best group', 0.001),
        (axes_ratio, 'Link density ratio threshold',
         'Link density ratio (best/average)', 20),
    ]
    for n, ((x, y1, y2), title, xlabel, xmax) in enumerate(panels, 1):
        ax1 = fig.add_subplot(2, 2, n)
        ax1.plot(x, y1, 'b')
        ax1.tick_params(axis='y', colors='b')
        ax1.set_xlim([0, xmax])
        ax1.set_ylim([0, 50])
        ax1.set_ylabel('Number of contigs filtered out (%)', color='b')
        ax1.set_title(title)
        ax1.set_xlabel(xlabel)
        ax2 = ax1.twinx()
        ax2.plot(x, y2, 'r')
        ax2.tick_params(axis='y', colors='r')
        ax2.set_ylim([90, 100])
        ax2.set_ylabel('Length of remaining contigs (%)', color='r')
    fig.tight_layout(w_pad=1, h_pad=1)
    fig.savefig(os.path.join(outdir, 'statistics.pdf'))
    plt.close(fig)
