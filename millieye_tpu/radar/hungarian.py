"""Minimum-cost assignment (Hungarian) for cluster association.

The cost matrices here are tiny (tracked clusters x new clusters, both
single digits), so this runs on the host. A native C++ backend
(millieye_tpu.native) is preferred when built; scipy's C++
linear_sum_assignment is the fallback (the reference uses scipy directly,
tracking.py:85).
"""
from __future__ import annotations

import numpy as np


def assign(cost):
    """cost [n, m] -> (row_idx, col_idx) minimizing total cost."""
    cost = np.asarray(cost, np.float64)
    if cost.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    n, m = cost.shape
    # tiny matrices (the tracker's usual 1-3 tracks) solve exactly in a
    # few numpy ops — the ctypes/scipy round trip alone costs ~160 us
    # per call (tracker_profile.py)
    if n == 1:
        return (np.zeros(1, np.int64),
                np.array([int(cost[0].argmin())], np.int64))
    if m == 1:
        return (np.array([int(cost[:, 0].argmin())], np.int64),
                np.zeros(1, np.int64))
    if n <= 4 and m <= 4:
        from itertools import permutations
        rows = np.arange(min(n, m), dtype=np.int64)
        best, best_cols = np.inf, None
        if n <= m:
            for cols in permutations(range(m), n):
                tot = cost[rows, cols].sum()
                if tot < best:
                    best, best_cols = tot, cols
            return rows, np.asarray(best_cols, np.int64)
        for rsel in permutations(range(n), m):
            tot = cost[rsel, rows].sum()
            if tot < best:
                best, best_cols = tot, rsel
        order = np.argsort(best_cols)
        return (np.asarray(best_cols, np.int64)[order],
                rows[order])
    try:
        from millieye_tpu.native import hungarian_native
        return hungarian_native(cost)
    except Exception:
        from scipy.optimize import linear_sum_assignment
        r, c = linear_sum_assignment(cost)
        return np.asarray(r, np.int64), np.asarray(c, np.int64)
