"""Linear sum assignment front-end.

Prefers the native C++ solver (``nerfstyle_tpu/native/hungarian.cpp``); falls
back to scipy if the native build is unavailable.  Same return convention as
``scipy.optimize.linear_sum_assignment`` for the square/rectangular costs the
semantic style matching produces (reference call site: loss.py:183).
"""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np


def linear_sum_assignment(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal-cost row->col assignment.

    Args:
        cost: [n, m] cost matrix (non-finite entries are sanitized).

    Returns:
        (row_indices, col_indices) like scipy.
    """
    cost = np.asarray(cost, dtype=np.float64)
    assert cost.ndim == 2
    cost = np.nan_to_num(cost, posinf=1e18, neginf=-1e18)

    transposed = cost.shape[0] > cost.shape[1]
    work = cost.T if transposed else cost
    n, m = work.shape

    from ..native import ensure_built

    lib = ensure_built()
    if lib is not None:
        work_c = np.ascontiguousarray(work)
        out = np.empty(n, dtype=np.int32)
        rc = lib.nerfstyle_lsa(
            work_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            np.int32(n),
            np.int32(m),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc == 0:
            rows = np.arange(n)
            if transposed:
                order = np.argsort(out)
                return out[order], rows[order]
            return rows, out.astype(np.int64)

    # Fallback: scipy
    from scipy.optimize import linear_sum_assignment as _scipy_lsa

    return _scipy_lsa(cost)
