"""Contact-map plotting: AGP-indexed binning, KR balancing, heatmaps.

Re-implements `haphic plot` (scripts/HapHiC_plot.py) with columnar
machinery:

  * the AGP is compiled into sorted per-contig segment arrays; mapping
    an alignment (ctg, pos) to its scaffold bin is one vectorized
    searchsorted over a combined (ctg, pos) key — replacing the
    reference's per-read interval-tree probing (:41-103, :153-245);
  * accumulation is a scatter-add over whole alignment chunks;
  * Knight-Ruiz balancing (`kr_balance`) follows the published
    inner-outer CG iteration the reference ports (:291-404) and is
    validated against it;
  * the pickle cache carries the AGP md5 + binning params
    (:248-288) so re-plots skip the alignment pass.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
from dataclasses import dataclass, field
from math import ceil
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


# ---------------- AGP indexing --------------------------------------

@dataclass
class AgpIndex:
    """Columnar AGP W-line table for coordinate lifting."""
    ctg_names: List[str]
    ctg_id: Dict[str, int]
    # segments sorted by (ctg, raw_start); coordinates 1-based inclusive
    seg_key: np.ndarray          # ctg_id * KEY + raw_start
    seg_ctg: np.ndarray
    seg_raw_start: np.ndarray
    seg_raw_end: np.ndarray
    seg_group: np.ndarray        # group index
    seg_group_start: np.ndarray  # 1-based scaffold coordinate
    seg_fwd: np.ndarray          # bool
    group_names: List[str]
    group_sizes: np.ndarray      # scaffold length (max group_end)
    KEY: int

    def n_groups(self) -> int:
        return len(self.group_names)


def parse_agp(path: str) -> AgpIndex:
    ctg_id: Dict[str, int] = {}
    ctg_names: List[str] = []
    group_idx: Dict[str, int] = {}
    group_names: List[str] = []
    group_sizes: List[int] = []
    rows = []
    with open(path) as f:
        for line in f:
            if line.startswith('#') or not line.strip():
                continue
            cols = line.split()
            if cols[4] != 'W':
                continue
            group = cols[0]
            if group not in group_idx:
                group_idx[group] = len(group_names)
                group_names.append(group)
                group_sizes.append(0)
            g = group_idx[group]
            group_sizes[g] = max(group_sizes[g], int(cols[2]))
            ctg = cols[5]
            if ctg not in ctg_id:
                ctg_id[ctg] = len(ctg_names)
                ctg_names.append(ctg)
            rows.append((ctg_id[ctg], int(cols[6]), int(cols[7]), g,
                         int(cols[1]), cols[8] == '+'))
    rows.sort()
    seg_ctg = np.asarray([r[0] for r in rows], np.int64)
    seg_raw_start = np.asarray([r[1] for r in rows], np.int64)
    seg_raw_end = np.asarray([r[2] for r in rows], np.int64)
    seg_group = np.asarray([r[3] for r in rows], np.int64)
    seg_group_start = np.asarray([r[4] for r in rows], np.int64)
    seg_fwd = np.asarray([r[5] for r in rows], bool)
    KEY = int(max(seg_raw_end.max() if len(rows) else 1, 1)) + 2
    seg_key = seg_ctg * KEY + seg_raw_start
    return AgpIndex(ctg_names=ctg_names, ctg_id=ctg_id, seg_key=seg_key,
                    seg_ctg=seg_ctg, seg_raw_start=seg_raw_start,
                    seg_raw_end=seg_raw_end, seg_group=seg_group,
                    seg_group_start=seg_group_start, seg_fwd=seg_fwd,
                    group_names=group_names,
                    group_sizes=np.asarray(group_sizes, np.int64), KEY=KEY)


@dataclass
class BinIndex:
    agp: AgpIndex
    bin_size: int
    sel_groups: List[int]              # selected group indices, in order
    group_nbins: np.ndarray            # per selected group
    group_bin_offset: np.ndarray       # aligned with agp group index (-1 off)
    total_bins: int

    @property
    def group_names(self) -> List[str]:
        return [self.agp.group_names[g] for g in self.sel_groups]

    @property
    def group_sizes(self) -> np.ndarray:
        return self.agp.group_sizes[self.sel_groups]


def build_bins(agp: AgpIndex, bin_size: int, min_len_mbp: float = 0,
               specified: Optional[Sequence[str]] = None) -> BinIndex:
    """Group-bin layout (parity: generate_contact_matrix, :106-150).
    ``bin_size`` in bp."""
    if specified:
        sel = []
        for g in specified:
            if g not in agp.group_names:
                raise RuntimeError(
                    'Cannot find {} in the input AGP file'.format(g))
            sel.append(agp.group_names.index(g))
    else:
        min_len = min_len_mbp * 1e6
        sel = [g for g in range(agp.n_groups())
               if agp.group_sizes[g] >= min_len]
    offsets = np.full(agp.n_groups(), -1, np.int64)
    nbins = []
    total = 0
    for g in sel:
        nb = int(agp.group_sizes[g]) // bin_size + 1
        offsets[g] = total
        nbins.append(nb)
        total += nb
    return BinIndex(agp=agp, bin_size=bin_size, sel_groups=sel,
                    group_nbins=np.asarray(nbins, np.int64),
                    group_bin_offset=offsets, total_bins=total)


def map_to_bins(bi: BinIndex, ctg: np.ndarray, pos: np.ndarray
                ) -> np.ndarray:
    """Vectorized (agp ctg id, 1-based pos) → total bin id (-1 = drop)."""
    agp = bi.agp
    key = ctg * agp.KEY + pos
    idx = np.searchsorted(agp.seg_key, key, side='right') - 1
    idx = np.clip(idx, 0, max(len(agp.seg_key) - 1, 0))
    ok = (len(agp.seg_key) > 0) & (agp.seg_ctg[idx] == ctg) & \
        (pos >= agp.seg_raw_start[idx]) & (pos <= agp.seg_raw_end[idx])
    fwd = agp.seg_fwd[idx]
    gpos = np.where(
        fwd,
        agp.seg_group_start[idx] + (pos - agp.seg_raw_start[idx]),
        agp.seg_group_start[idx] + (agp.seg_raw_end[idx] - pos))
    g = agp.seg_group[idx]
    off = bi.group_bin_offset[g]
    ok &= off >= 0
    out = off + (gpos - 1) // bi.bin_size
    return np.where(ok, out, -1)


def accumulate_contacts(bi: BinIndex, chunks) -> np.ndarray:
    """Scatter-add alignment chunks into the (total_bins, total_bins)
    matrix. Chunks carry 0-based positions (io.pairs/io.bam); the AGP
    mapping is 1-based."""
    m = np.zeros((bi.total_bins, bi.total_bins), np.int64)
    remap = np.full(len(bi.agp.ctg_names), -1, np.int64)
    for chunk in chunks:
        # chunk ref ids are assembly ids; we need AGP ctg ids — the
        # caller pre-aligns them (see run_plot) so ref is already an
        # AGP ctg id here
        bi1 = map_to_bins(bi, chunk.ref.astype(np.int64), chunk.pos + 1)
        bi2 = map_to_bins(bi, chunk.mref.astype(np.int64), chunk.mpos + 1)
        ok = (bi1 >= 0) & (bi2 >= 0)
        np.add.at(m, (bi1[ok], bi2[ok]), 1)
    return m


def symmetrize(m: np.ndarray) -> np.ndarray:
    """total = m + m.T with the diagonal counted once
    (parity: scripts/HapHiC_plot.py:854-856)."""
    d = m.diagonal().copy()
    out = m + m.T
    np.fill_diagonal(out, d)
    return out


# ---------------- Knight-Ruiz balancing -----------------------------

def kr_balance(A: np.ndarray, tol: float = 1e-6, delta: float = 0.1,
               Delta: float = 3.0, max_outer: int = 1000,
               max_inner: int = 10000) -> np.ndarray:
    """KR scaling vector x such that diag(x) A diag(x) is doubly
    stochastic — inner-outer conjugate-gradient Newton iteration from
    Knight & Ruiz (2013), the algorithm the reference ports (:291-404).
    Raises RuntimeError when the matrix is too sparse to converge."""
    n = A.shape[0]
    e = np.ones(n)
    x = e.copy()
    g, etamax = 0.9, 0.1
    eta = etamax
    stop_tol = tol * 0.5
    rt = tol ** 2
    v = x * (A @ x)
    rk = 1 - v
    rho_km1 = rk @ rk
    rout = rold = rho_km1
    err = ('KR balancing did not converge within the outer-iteration '
           'limit — the contact matrix is likely too sparse for KR; '
           'rerun with --normalization log10 or none.')
    nn = 0
    while rout > rt:
        nn += 1
        if nn > max_outer:
            raise RuntimeError(err)
        k = 0
        mm = 0
        y = e.copy()
        innertol = max(eta ** 2 * rout, rt)
        rho_km2 = rho_km1
        while rho_km1 > innertol:
            mm += 1
            if mm > max_inner:
                raise RuntimeError(err)
            k += 1
            if k == 1:
                Z = rk / v
                p = Z
                rho_km1 = rk @ Z
            else:
                beta = rho_km1 / rho_km2
                p = Z + beta * p
            w = x * (A @ (x * p)) + v * p
            alpha = rho_km1 / (p @ w)
            ap = alpha * p
            ynew = y + ap
            if ynew.min() <= delta:
                if delta == 0:
                    break
                ind = ap < 0
                gamma = ((delta - y[ind]) / ap[ind]).min()
                y = y + gamma * ap
                break
            if ynew.max() >= Delta:
                ind = ynew > Delta
                gamma = ((Delta - y[ind]) / ap[ind]).min()
                y = y + gamma * ap
                break
            y = ynew
            rk = rk - alpha * w
            rho_km2 = rho_km1
            Z = rk / v
            rho_km1 = rk @ Z
        x = x * y
        v = x * (A @ x)
        rk = 1 - v
        rho_km1 = rk @ rk
        rout = rho_km1
        rat = rout / rold
        rold = rout
        res_norm = np.sqrt(rout)
        eta_o = eta
        eta = g * rat
        if g * eta_o ** 2 > 0.1:
            eta = max(eta, g * eta_o ** 2)
        eta = max(min(eta, etamax), stop_tol / res_norm)
    return x


def normalize_matrix(contact: np.ndarray, bi: BinIndex,
                     normalization: str = 'KR', vmax_coef: float = 5.0,
                     manual_vmax: float = -1.0
                     ) -> Tuple[np.ndarray, float]:
    """KR (intra per scaffold + global inter), log10, or none
    (parity: :407-504)."""
    nbins = bi.group_nbins
    starts = np.concatenate([[0], np.cumsum(nbins)])

    if normalization == 'KR':
        zero = contact == 0
        m = contact.astype(np.float64) + 1e-5
        out = np.empty_like(m)
        x = kr_balance(m)
        out[:] = m * np.outer(x, x)
        nondiag = []
        for t in range(len(nbins)):
            s, e = int(starts[t]), int(starts[t + 1])
            sub = m[s:e, s:e]
            xg = kr_balance(sub)
            blk = sub * np.outer(xg, xg)
            out[s:e, s:e] = blk
            mask = ~np.eye(e - s, dtype=bool)
            nondiag.append(blk[mask])
        out[zero] = 0
        vmax = (np.median(np.concatenate(nondiag)) * vmax_coef
                if manual_vmax < 0 else manual_vmax)
        return out, float(vmax)

    if normalization == 'log10':
        out = np.log10(contact + 1)
    else:
        out = contact.astype(np.float64)
    nondiag = []
    for t in range(len(nbins)):
        s, e = int(starts[t]), int(starts[t + 1])
        sub = out[s:e, s:e]
        mask = ~np.eye(e - s, dtype=bool)
        nondiag.append(sub[mask])
    vmax = (np.median(np.concatenate(nondiag)) * vmax_coef
            if manual_vmax < 0 else manual_vmax)
    return out, float(vmax)


# ---------------- drawing -------------------------------------------

def _get_cmap(name: str):
    import matplotlib
    from matplotlib.colors import LinearSegmentedColormap
    if name == 'whitered':
        return LinearSegmentedColormap.from_list(
            'whitered', ['white', '#ff0000'])
    return matplotlib.colormaps.get_cmap(name)


def draw_heatmap(matrix: np.ndarray, bi: BinIndex, vmax: float,
                 out_path: str, cmap: str = 'whitered',
                 origin: str = 'bottom_left', border_style: str = 'grid',
                 figsize_cm: Tuple[float, float] = (15.0, 15.0),
                 title: str = 'Hi-C contact map',
                 normalization: str = 'KR') -> str:
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(figsize_cm[0] / 2.54,
                                    figsize_cm[1] / 2.54), dpi=300)
    n = matrix.shape[0]
    edges = np.cumsum(bi.group_nbins) - 0.5
    centers = np.cumsum(bi.group_nbins) - bi.group_nbins / 2
    im = ax.imshow(matrix, cmap=_get_cmap(cmap), vmin=0,
                   vmax=max(vmax, 1e-12),
                   origin='lower' if origin == 'bottom_left' else 'upper',
                   interpolation='none')
    ax.set_yticks(centers)
    ax.set_yticklabels(bi.group_names, size=6)
    ax.set_xticks([])
    if border_style == 'grid':
        for edge in edges[:-1]:
            ax.axvline(edge, color='grey', lw=0.3, ls=(0, (5, 5)))
            ax.axhline(edge, color='grey', lw=0.3, ls=(0, (5, 5)))
    else:
        last = -0.5
        for edge in edges:
            for f in (ax.vlines, ax.hlines):
                f([last, edge], last, edge, color='grey', lw=0.4)
            last = edge
    ax.set_title('{} (bin size: {} Kb)'.format(title,
                                               bi.bin_size // 1000),
                 fontsize=8)
    cb = fig.colorbar(im, shrink=0.5)
    cb.set_label({'KR': 'KR normalized counts',
                  'log10': 'Log$_{10}$(counts+1)'}.get(normalization,
                                                       'Counts'),
                 fontsize=7)
    fig.savefig(out_path, bbox_inches='tight')
    plt.close(fig)
    return out_path


def draw_separate_heatmaps(matrix: np.ndarray, bi: BinIndex, vmax: float,
                           outdir: str, **kw) -> List[str]:
    """One heatmap per scaffold (parity: draw_separate_heatmaps,
    :676-715)."""
    os.makedirs(outdir, exist_ok=True)
    starts = np.concatenate([[0], np.cumsum(bi.group_nbins)])
    paths = []
    for t, name in enumerate(bi.group_names):
        s, e = int(starts[t]), int(starts[t + 1])
        sub_bi = BinIndex(agp=bi.agp, bin_size=bi.bin_size,
                          sel_groups=[bi.sel_groups[t]],
                          group_nbins=bi.group_nbins[t:t + 1],
                          group_bin_offset=bi.group_bin_offset,
                          total_bins=e - s)
        p = os.path.join(outdir, '{}.pdf'.format(name))
        draw_heatmap(matrix[s:e, s:e], sub_bi, vmax, p,
                     title='{} contact map'.format(name), **kw)
        paths.append(p)
    return paths


# ---------------- cache + orchestration -----------------------------

def _md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, 'rb') as f:
        for blk in iter(lambda: f.read(1 << 20), b''):
            h.update(blk)
    return h.hexdigest()


def save_cache(path: str, matrix: np.ndarray, agp: str,
               params: Tuple) -> None:
    with open(path, 'wb') as f:
        pickle.dump((matrix, params, _md5(agp)), f)


def load_cache(path: str, agp: str, params: Tuple) -> Optional[np.ndarray]:
    with open(path, 'rb') as f:
        matrix, old_params, agp_md5 = pickle.load(f)[:3]
    if agp_md5 != _md5(agp):
        raise RuntimeError(
            'The AGP file used to generate {} is different from the '
            'input AGP file {}'.format(path, agp))
    if tuple(old_params) != tuple(params):
        raise RuntimeError(
            'The input parameters are not consistent with those used '
            'to generate {}'.format(path))
    return matrix


def run_plot(agp: str, alignments: str, outdir: str = '.',
             bin_size_kbp: int = 500, min_len_mbp: float = 0,
             specified_scaffolds: Optional[str] = None,
             normalization: str = 'KR', vmax_coef: float = 5.0,
             manual_vmax: float = -1.0, cmap: str = 'whitered',
             origin: str = 'bottom_left', border_style: str = 'grid',
             separate_plots: bool = False, threads: int = 4,
             out_name: str = 'contact_map.pdf') -> str:
    os.makedirs(outdir, exist_ok=True)
    bin_size = bin_size_kbp * 1000
    agp_index = parse_agp(agp)
    bi = build_bins(agp_index, bin_size, min_len_mbp,
                    specified_scaffolds.split(',')
                    if specified_scaffolds else None)
    params = (bin_size, min_len_mbp, specified_scaffolds)
    cache = os.path.join(outdir, 'contact_matrix.pkl')

    if alignments.endswith('.pkl'):
        matrix = load_cache(alignments, agp, params)
    else:
        # readers resolve names against a sorted table; remap their ids
        # onto the AGP's contig ids afterwards
        names = sorted(agp_index.ctg_names)
        remap = np.asarray([agp_index.ctg_id[c] for c in names], np.int64)
        if alignments.endswith('.bam'):
            from haphic_tpu.io.bam import BamReader
            reader = BamReader(alignments, names, threads=threads)
        else:
            from haphic_tpu.io.pairs import PairsReader
            reader = PairsReader(alignments, names)

        def remapped():
            from haphic_tpu.io.pairs import AlignChunk
            for c in reader:
                ok = (c.ref >= 0) & (c.mref >= 0)
                yield AlignChunk(ref=remap[c.ref[ok]], pos=c.pos[ok],
                                 mref=remap[c.mref[ok]], mpos=c.mpos[ok])

        raw = accumulate_contacts(bi, remapped())
        matrix = symmetrize(raw)
        save_cache(cache, matrix, agp, params)

    norm, vmax = normalize_matrix(matrix, bi, normalization, vmax_coef,
                                  manual_vmax)
    out_path = os.path.join(outdir, out_name)
    draw_heatmap(norm, bi, vmax, out_path, cmap=cmap, origin=origin,
                 border_style=border_style, normalization=normalization)
    if separate_plots:
        draw_separate_heatmaps(norm, bi, vmax,
                               os.path.join(outdir, 'separate_plots'),
                               cmap=cmap, origin=origin,
                               border_style=border_style,
                               normalization=normalization)
    return out_path
