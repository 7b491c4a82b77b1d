"""Numpy-space money helpers, importable WITHOUT a SparkSession
(functions/amounts.py needs one at import for its pandas_udf DDL)."""

from __future__ import annotations

import numpy as np


def half_up_cents_np(v):
    """value→integer-cents in numpy space, half-up AWAY FROM ZERO —
    the numpy twin of ``driver_queries.cents`` / F.round HALF_UP
    (pandas ``.round()`` is banker's half-to-even and plain
    ``floor(x*100+0.5)`` rounds toward +inf on negatives; both diverge
    from the DuckDB oracle's round() on exact half-cents).
    Single-sourced here so batch grouped-map and streaming stateful
    aggregation can never fork.  Returns float64 WITH NaN preserved —
    callers decide the NULL policy before any int cast (int-casting a
    NaN silently yields INT64_MIN garbage)."""
    return np.copysign(np.floor(np.abs(v) * 100 + 0.5), v)
