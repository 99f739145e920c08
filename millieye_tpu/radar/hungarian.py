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
    try:
        from millieye_tpu.native import hungarian_native
        return hungarian_native(cost)
    except Exception:
        from scipy.optimize import linear_sum_assignment
        r, c = linear_sum_assignment(cost)
        return np.asarray(r, np.int64), np.asarray(c, np.int64)
