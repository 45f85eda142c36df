"""The ONE engine-wide cents conversion.

Every query that turns a double into exact integer cents must round the
same way as the DuckDB oracle's ``round()`` — half AWAY from zero.  Both
``pyarrow.compute.round`` and ``numpy.round`` default to banker's
half-to-even, which silently diverges from the oracle on any value whose
``x*100`` lands exactly on ``.5`` in float64 (e.g. 0.125).  Nothing else in
the repo may call a rounding kernel for cents — import these.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def cents_arrow(col) -> pa.Array:
    """double Arrow column -> int64 cents, half away from zero
    (DuckDB mirror: ``CAST(round(x*100) AS BIGINT)``)."""
    return pc.cast(
        pc.round(pc.multiply(col, 100.0), round_mode="half_towards_infinity"),
        pa.int64(),
    )


def cents_np(v: np.ndarray) -> np.ndarray:
    """double numpy array -> int64 cents, half away from zero."""
    x = np.asarray(v, dtype=np.float64) * 100.0
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def trunc_div_np(a: np.ndarray, b) -> np.ndarray:
    """Integer division TRUNCATING toward zero, matching DuckDB's ``//``
    (verified: DuckDB ``(-7)//2 = -3``; numpy ``//`` floors to -4).  Use
    this whenever the numerator can be negative; plain ``//`` is fine for
    provably non-negative values."""
    a = np.asarray(a)
    return (np.sign(a) * (np.abs(a) // b)).astype(np.int64)
