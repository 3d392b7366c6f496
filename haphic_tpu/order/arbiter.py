"""Choose between the fast-sort tour and the GA-optimized tour.

Parity with compare_fast_sort_and_allhic (scripts/HapHiC_sort.py:645-724):
weighted longest-increasing-subsequence agreement between the two tours,
tried over every rotation of the fast-sort tour; the GA tour wins when
the group is highly fragmented (group_len / longest > 50) or when the
tours agree (LIS length ratio >= 0.9).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

Tour = List[Tuple[str, str]]


def _find_lis(compare: Sequence[int], weight: Dict[int, int],
              forward: bool) -> int:
    """Max-weight increasing subsequence over the signed order list
    (parity: scripts/HapHiC_sort.py:648-674)."""
    if forward:
        orders = [o for o in compare if o > 0]
    else:
        orders = [o for o in compare if o < 0]
    if not orders:
        return 0
    dp = [0] * len(orders)
    best = 0
    for i in range(len(orders)):
        dp[i] = weight[orders[i]]
        for j in range(i):
            if orders[i] > orders[j] and dp[i] < dp[j] + weight[orders[i]]:
                dp[i] = dp[j] + weight[orders[i]]
        if dp[i] >= dp[best]:
            best = i
    return dp[best]


def choose_fast_sort(fast_tour: Tour, ga_tour: Tour,
                     lengths: Dict[str, int]) -> bool:
    """True → keep the fast-sort tour; False → keep the GA tour."""
    ctgs = [c for c, _ in fast_tour]
    oris = [o for c, o in fast_tour]
    ctg_lens = [lengths[c] for c in ctgs]
    group_len = sum(ctg_lens)
    if group_len / max(ctg_lens) > 50:
        return False

    ga_index = {c: i for i, (c, _) in enumerate(ga_tour)}
    ga_ori = {c: o for c, o in ga_tour}

    for _ in range(max(len(ctgs) - 1, 1)):
        compare, weight = [], {}
        for i, c in enumerate(ctgs):
            j = ga_index[c]
            signed = (j + 1) if oris[i] == ga_ori[c] else -(j + 1)
            compare.append(signed)
            weight[signed] = lengths[c]
        max_sum = max(_find_lis(compare, weight, True),
                      _find_lis(compare, weight, False))
        if max_sum / group_len >= 0.9:
            return False
        ctgs = ctgs[1:] + [ctgs[0]]
        oris = oris[1:] + [oris[0]]
    return True
