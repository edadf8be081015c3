"""Half-away-from-zero rounding, matching DuckDB's ``round()``.

Python's ``round`` and ``np.round`` use banker's rounding (half to
even); DuckDB rounds half away from zero. Oracle-facing outputs that
round ratios of small integers (jaccard, tf ratios, quality scores) hit
exact .5 decimal boundaries (e.g. 105/128 = 0.8203125), so the engine
must round exactly like the SQL oracle.
"""

from __future__ import annotations

import math

import numpy as np


def round_half_up(x, decimals: int = 6):
    """Scalar or ndarray; half away from zero like DuckDB round()."""
    f = 10.0**decimals
    if isinstance(x, np.ndarray):
        return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f
    return math.copysign(math.floor(abs(x) * f + 0.5) / f, x)
