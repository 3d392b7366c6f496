"""Vectorized Hi-C link aggregation.

Replaces the reference's per-read Python dict updates
(parse_alignments / parse_alignments_for_ctgs,
scripts/HapHiC_cluster.py:1596-1752) with columnar numpy segment
reductions over alignment chunks. One pass over the data produces:

  * full links      — inter-contig pair counts (→ full_links.pkl)
  * flank links     — fragment-pair counts gated by the Nx subset and the
                      flanking-region rule (→ the MCL adjacency matrix)
  * per-fragment link totals (→ density filtering)
  * HT links        — contig half (head/tail) pair counts (→ HT_links.pkl
                      and fast sorting)
  * CLM records     — the 4 orientation distances per read pair
                      (→ paired_links.clm and the tour optimizer)
  * coord pairs     — first `max_read_pairs` coordinate pairs per contig
                      pair (→ allelic / concentrated link detection)

Pair canonicalisation: contig ids are assigned in lexicographic name
order (see haphic_tpu.io.fasta), so the reference's name-sort of each
read pair (scripts/HapHiC_cluster.py:1629,1707) is an integer min/max.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from haphic_tpu.core.fragments import Fragments
from haphic_tpu.io.pairs import AlignChunk


def is_flank(coord: np.ndarray, length: np.ndarray, flank_bp: int) -> np.ndarray:
    """Vectorized flanking-region test
    (parity: scripts/HapHiC_cluster.py:299-307). 1-based coords."""
    if not flank_bp:
        return np.ones(coord.shape, dtype=bool)
    return (coord <= flank_bp) | (coord > length - flank_bp)


@dataclass
class COO:
    """Symmetric pair counts stored once with i <= j (canonical order)."""
    i: np.ndarray
    j: np.ndarray
    w: np.ndarray

    def as_dict(self, name_of) -> Dict[Tuple[str, str], float]:
        out: Dict[Tuple[str, str], float] = {}
        for a, b, c in zip(self.i.tolist(), self.j.tolist(), self.w.tolist()):
            out[(name_of(a), name_of(b))] = int(c) if float(c).is_integer() else c
        return out


@dataclass
class CLMData:
    """Raveled CLM records: for each kept read pair, its contig-pair id
    and the four orientation distances (reference semantics,
    scripts/HapHiC_cluster.py:395-401, 0-based coords):

        d[0] (+ +) = len_i - p_i + p_j
        d[1] (+ -) = len_i - p_i + len_j - p_j
        d[2] (- +) = p_i + p_j
        d[3] (- -) = p_i + len_j - p_j
    """
    pair_i: np.ndarray      # int32[R] contig id (name-first)
    pair_j: np.ndarray      # int32[R]
    d: np.ndarray           # int64[4, R]
    # first occurrence position of each unique pair in the original
    # alignment stream — the reference's clm_dict iterates pairs in
    # insertion order (scripts/HapHiC_cluster.py:383), which we reproduce
    # for byte-identical CLM output:
    u_keys: np.ndarray = None       # int64[P] unique pair keys (sorted)
    u_first_seen: np.ndarray = None  # int64[P]

    def __len__(self) -> int:
        return self.pair_i.shape[0]


@dataclass
class CoordPairs:
    """First `max_read_pairs` (coord_i, coord_j) per contig pair, in file
    order — parity with record_coord_pairs
    (scripts/HapHiC_cluster.py:454-471). 1-based coords."""
    pair_i: np.ndarray
    pair_j: np.ndarray
    ci: np.ndarray
    cj: np.ndarray
    total_counts_i: np.ndarray  # unique pair table (aligned with boundaries)
    total_counts: np.ndarray    # total observed read pairs per unique pair
    # boundaries into the (sorted) record arrays per unique pair:
    starts: np.ndarray
    counts: np.ndarray
    upair_i: np.ndarray
    upair_j: np.ndarray


@dataclass
class LinkData:
    n_ctg: int
    n_frag: int
    full: COO                       # inter-contig counts
    flank: COO                      # fragment-pair counts (MCL input)
    frag_links: np.ndarray          # int64[n_frag]
    ht: COO                         # HT node ids = ctg*2 + is_tail
    clm: Optional[CLMData] = None
    coords: Optional[CoordPairs] = None
    ctg_pair_to_frag: Optional[COO] = None  # (ctg pair key → frag pair key) map


class LinkAccumulator:
    """Streaming accumulator over :class:`AlignChunk`s.

    Parameters mirror the reference CLI:
      flank_kbp          --flank (kbp)
      need_coords        remove_allelic_links or remove_concentrated_links
      max_read_pairs     --max_read_pairs
      track_ctg_pair_to_frag  bins + remove_allelic_links
    """

    def __init__(self, frags: Fragments, flank_kbp: int = 0,
                 need_coords: bool = False, max_read_pairs: int = 200,
                 keep_clm: bool = True):
        self.frags = frags
        self.asm = frags.asm
        self.flank_bp = flank_kbp * 1000
        self.need_coords = need_coords
        self.max_read_pairs = max_read_pairs
        self.keep_clm = keep_clm
        self._full: List[np.ndarray] = []        # int64 keys
        self._flank: List[np.ndarray] = []       # int64 frag keys
        self._ht: List[np.ndarray] = []          # int64 HT keys
        self._clm_key: List[np.ndarray] = []
        self._clm_d: List[np.ndarray] = []
        self._coord_key: List[np.ndarray] = []
        self._coord_ci: List[np.ndarray] = []
        self._coord_cj: List[np.ndarray] = []
        self._pair_frag: List[np.ndarray] = []   # stacked (ctgkey, fragkey)
        self.track_ctg_pair_to_frag = False

    def consume(self, chunk: AlignChunk) -> None:
        asm, frags = self.asm, self.frags
        n = len(asm)
        ref, mref = chunk.ref, chunk.mref
        pos, mpos = chunk.pos, chunk.mpos

        valid = (ref >= 0) & (mref >= 0)
        if frags.any_split:
            # skip intra-contig links on unsplit contigs (reference
            # line :1699)
            valid &= (ref != mref) | frags.split_ctg[np.clip(ref, 0, n - 1)]
        else:
            valid &= ref != mref
        if not valid.any():
            return
        ref, mref = ref[valid], mref[valid]
        pos, mpos = pos[valid], mpos[valid]

        # name-sort of the two endpoints (1-based coords)
        ci1, cj1 = ref.astype(np.int64), mref.astype(np.int64)
        pi1, pj1 = pos + 1, mpos + 1
        swap = (ci1 > cj1) | ((ci1 == cj1) & (pi1 > pj1))
        ci = np.where(swap, cj1, ci1)
        cj = np.where(swap, ci1, cj1)
        pi = np.where(swap, pj1, pi1)
        pj = np.where(swap, pi1, pj1)

        len_i = asm.lengths[ci]
        len_j = asm.lengths[cj]

        # fragment conversion + flank gating
        fi = frags.frag_of(ci, pi)
        fj = frags.frag_of(cj, pj)
        fci = frags.coord_in_frag(ci, pi)
        fcj = frags.coord_in_frag(cj, pj)
        frag_ok = fi != fj
        # canonical frag order (numeric id; symmetric use only)
        lo = np.minimum(fi, fj)
        hi = np.maximum(fi, fj)
        fc_lo = np.where(fi <= fj, fci, fcj)
        fc_hi = np.where(fi <= fj, fcj, fci)
        flank_sel = (frag_ok
                     & frags.nx_mask[np.clip(fi, 0, len(frags) - 1)]
                     & frags.nx_mask[np.clip(fj, 0, len(frags) - 1)]
                     & is_flank(fc_lo, frags.frag_len[lo], self.flank_bp)
                     & is_flank(fc_hi, frags.frag_len[hi], self.flank_bp))
        m = len(frags)
        self._flank.append((lo[flank_sel] * m + hi[flank_sel]).astype(np.int64))

        if self.track_ctg_pair_to_frag:
            sel = frag_ok & (ci != cj)
            pf = np.stack([(ci[sel] * n + cj[sel]).astype(np.int64),
                           (lo[sel] * m + hi[sel]).astype(np.int64)], axis=1)
            self._pair_frag.append(np.unique(pf, axis=0))

        # inter-contig statistics only (reference line :1736)
        inter = (ci != cj) & frag_ok
        ci, cj, pi, pj = ci[inter], cj[inter], pi[inter], pj[inter]
        len_i, len_j = len_i[inter], len_j[inter]
        key = ci * n + cj
        self._full.append(key)

        if self.keep_clm:
            p0i, p0j = pi - 1, pj - 1
            d = np.stack([
                len_i - p0i + p0j,
                len_i - p0i + len_j - p0j,
                p0i + p0j,
                p0i + len_j - p0j,
            ]).astype(np.int64)
            self._clm_key.append(key)
            self._clm_d.append(d)

        # HT halves: tail when coord*2 > len (reference :404-416)
        hti = ci * 2 + (pi * 2 > len_i)
        htj = cj * 2 + (pj * 2 > len_j)
        self._ht.append(hti * (2 * n) + htj)

        if self.need_coords:
            self._coord_key.append(key)
            self._coord_ci.append(pi)
            self._coord_cj.append(pj)

    # ---- finalization ----

    def finalize(self) -> LinkData:
        asm, frags = self.asm, self.frags
        n, m = len(asm), len(frags)

        def cat(lst, dtype=np.int64):
            if not lst:
                return np.zeros(0, dtype=dtype)
            return np.concatenate(lst)

        full_keys = cat(self._full)
        uk, cnt = np.unique(full_keys, return_counts=True)
        full = COO(i=uk // n, j=uk % n, w=cnt.astype(np.float64))

        flank_keys = cat(self._flank)
        ufk, fcnt = np.unique(flank_keys, return_counts=True)
        flank = COO(i=ufk // m, j=ufk % m, w=fcnt.astype(np.float64))
        frag_links = np.zeros(m, dtype=np.int64)
        np.add.at(frag_links, flank.i, fcnt)
        np.add.at(frag_links, flank.j, fcnt)

        ht_keys = cat(self._ht)
        uhk, hcnt = np.unique(ht_keys, return_counts=True)
        ht = COO(i=uhk // (2 * n), j=uhk % (2 * n), w=hcnt.astype(np.float64))

        clm = None
        if self.keep_clm:
            clm_keys = cat(self._clm_key)
            d = (np.concatenate(self._clm_d, axis=1)
                 if self._clm_d else np.zeros((4, 0), dtype=np.int64))
            u_keys, u_first = np.unique(clm_keys, return_index=True)
            order = np.argsort(clm_keys, kind='stable')
            clm_keys = clm_keys[order]
            d = d[:, order]
            clm = CLMData(pair_i=(clm_keys // n).astype(np.int64),
                          pair_j=(clm_keys % n).astype(np.int64), d=d,
                          u_keys=u_keys, u_first_seen=u_first)

        coords = None
        if self.need_coords:
            ckey = cat(self._coord_key)
            cci = cat(self._coord_ci)
            ccj = cat(self._coord_cj)
            order = np.argsort(ckey, kind='stable')
            ckey, cci, ccj = ckey[order], cci[order], ccj[order]
            upk, starts, total = np.unique(ckey, return_index=True,
                                           return_counts=True)
            # rank within each pair, keep the first max_read_pairs
            rank = np.arange(len(ckey)) - np.repeat(starts, total)
            keep = rank < self.max_read_pairs
            ckey, cci, ccj = ckey[keep], cci[keep], ccj[keep]
            upk2, starts2, cnt2 = np.unique(ckey, return_index=True,
                                            return_counts=True)
            assert np.array_equal(upk, upk2)
            coords = CoordPairs(
                pair_i=(ckey // n).astype(np.int64),
                pair_j=(ckey % n).astype(np.int64),
                ci=cci, cj=ccj,
                total_counts_i=upk, total_counts=total,
                starts=starts2, counts=cnt2,
                upair_i=(upk // n).astype(np.int64),
                upair_j=(upk % n).astype(np.int64))

        p2f = None
        if self.track_ctg_pair_to_frag and self._pair_frag:
            pf = np.unique(np.concatenate(self._pair_frag, axis=0), axis=0)
            p2f = COO(i=pf[:, 0], j=pf[:, 1], w=np.ones(len(pf)))

        self._full = self._flank = self._ht = None  # free
        self._clm_key = self._clm_d = None
        self._coord_key = self._coord_ci = self._coord_cj = None

        return LinkData(n_ctg=n, n_frag=m, full=full, flank=flank,
                        frag_links=frag_links, ht=ht, clm=clm,
                        coords=coords, ctg_pair_to_frag=p2f)


def aggregate(chunks: Iterable[AlignChunk], frags: Fragments,
              flank_kbp: int = 0, need_coords: bool = False,
              max_read_pairs: int = 200, keep_clm: bool = True,
              track_ctg_pair_to_frag: bool = False) -> LinkData:
    acc = LinkAccumulator(frags, flank_kbp=flank_kbp, need_coords=need_coords,
                          max_read_pairs=max_read_pairs, keep_clm=keep_clm)
    acc.track_ctg_pair_to_frag = track_ctg_pair_to_frag
    for chunk in chunks:
        acc.consume(chunk)
    return acc.finalize()
