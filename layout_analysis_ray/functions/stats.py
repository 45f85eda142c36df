"""Moment-based statistics: exact integer mean/variance partials and the
3-sigma outlier flag built on them.

The classic (n, sum, sum-of-squares) partial pattern: each batch reduces to
one moment row per group, the tiny per-group moments merge on the driver in
arbitrary-precision Python ints (sum-of-squares exceeds int64 around 10^19
— per-BATCH partials stay int64-safe, only the merge needs big ints), and
the per-row predicate is decomposed into two precomputed int64 CENTS bounds
so the full-table flagging pass is a vectorized compare, sqrt-free and
float-free:

    |v*n - s1| > sqrt(9*(n*s2 - s1^2))
        <=>  v >= hi_ge  or  v <= lo_le          (v, n, s1, s2 integers)

with hi_ge = (s1 + r + n) // n and lo_le = (s1 - r - 1) // n for
r = isqrt(9*(n*s2 - s1^2)) — exact because for integer v and D:
v^2 > D <=> |v| > isqrt(D).  The SQL oracle states the same predicate in
HUGEINT squares; both sides are exact, so the hash matches bit-for-bit.

No reference analogue (the reference has no statistics; SURVEY §2.5) —
this is the data-quality/anomaly member of the beyond-reference families.
"""

from __future__ import annotations

from math import isqrt

import numpy as np
import pyarrow as pa

from .numeric import cents_arrow


def _moment_partials(sf_dir: str):
    """One (event_type, n, s1, s2) row per (batch, type) — int64-safe for
    batches up to ~10^10 cents^2 per row x 10^5 rows."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        # NULL event_type rows can never be flagged (SQL's USING join drops
        # the NULL group) — exclude them here so factorize never emits -1
        batch = batch.filter(pc.is_valid(batch["event_type"]))
        c = cents_arrow(batch["value"]).to_numpy(zero_copy_only=False)
        types = batch["event_type"].to_numpy(zero_copy_only=False)
        if len(c):
            # exactness guard: |c| and len*c^2 must fit int64 for the
            # integer moment sums (the SQL oracle uses HUGEINT; graduating
            # the partials to Python ints is the fix if this ever trips)
            amax = int(np.abs(c).max())
            if amax > 3_000_000_000 or len(c) * amax * amax > (1 << 62):
                raise ValueError(
                    "moment partial would overflow int64: "
                    f"max |cents|={amax}, rows={len(c)}"
                )
        codes, uniq = pd.factorize(types)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        # integer sums via add.at (float64 bincount weights lose exactness
        # above 2^53)
        s1 = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s1, codes, c)
        s2 = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s2, codes, c * c)
        return pa.table(
            {
                "event_type": pa.array([str(u) for u in uniq], pa.string()),
                "n": pa.array(n, pa.int64()),
                "s1": pa.array(s1, pa.int64()),
                "s2": pa.array(s2, pa.int64()),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow")


_LIMB = 1 << 31  # split radix: limb sums stay far inside int64 (see below)


def _split_limbs(batch: pa.Table) -> pa.Table:
    """(n, s1, s2) partial rows -> limb-split (n, s1_hi, s1_lo, s2_hi,
    s2_lo) so the DISTRIBUTED sum can never overflow int64: each limb is
    < 2^31 per partial row, so even 2^20 blocks x any group count keeps
    every limb sum under 2^51.  The driver reassembles exact values in
    Python big ints from ONE row per group."""
    s1 = batch["s1"].to_numpy(zero_copy_only=False).astype(np.int64)
    s2 = batch["s2"].to_numpy(zero_copy_only=False).astype(np.int64)
    # s1 can be negative; divmod-style split keeps lo in [0, LIMB)
    return pa.table(
        {
            "event_type": batch["event_type"],
            "n": batch["n"],
            "s1_hi": pa.array(s1 // _LIMB, pa.int64()),
            "s1_lo": pa.array(s1 % _LIMB, pa.int64()),
            "s2_hi": pa.array(s2 // _LIMB, pa.int64()),
            "s2_lo": pa.array(s2 % _LIMB, pa.int64()),
        }
    )


def _merged_moments(sf_dir: str) -> dict[str, tuple[int, int, int]]:
    """Exact per-group (n, s1, s2): the moment partials merge in a
    DISTRIBUTED limb-split sum (map-side combined), and the driver only
    ever sees the final one-row-per-group table — never the per-(block x
    group) partial rows (VERDICT r3 finding 3)."""
    from .core import partial_then_global

    limbs = partial_then_global(
        _moment_partials(sf_dir).map_batches(
            _split_limbs, batch_format="pyarrow"
        ),
        ["event_type"],
        ["n", "s1_hi", "s1_lo", "s2_hi", "s2_lo"],
    )
    merged: dict[str, tuple[int, int, int]] = {}
    for row in limbs.take_all():  # one row per event type
        merged[row["event_type"]] = (
            int(row["n"]),
            int(row["s1_hi"]) * _LIMB + int(row["s1_lo"]),
            int(row["s2_hi"]) * _LIMB + int(row["s2_lo"]),
        )
    return merged


def events_value_outliers(sf_dir: str):
    """Rows whose value is more than 3 population-sigma from their event
    type's mean — exact integer arithmetic end-to-end (see module
    docstring).  Two passes: a moment-partial aggregate distributed-merged
    to one row per group (``_merged_moments``), then a map-only flagging
    scan against the broadcast per-type bounds."""
    import ray
    import ray.data as rd

    from .schema import ensure_schema

    merged = _merged_moments(sf_dir)
    types = sorted(merged)
    lo_le = np.empty(len(types), dtype=np.int64)
    hi_ge = np.empty(len(types), dtype=np.int64)
    for i, t in enumerate(types):
        n, s1, s2 = merged[t]
        r = isqrt(9 * (n * s2 - s1 * s1))
        lo_le[i] = (s1 - r - 1) // n
        hi_ge[i] = (s1 + r + n) // n
    bounds_ref = ray.put((pa.array(types, pa.string()), lo_le, hi_ge))

    def flag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ta, lo, hi = ray.get(bounds_ref)
        idx = pc.index_in(batch["event_type"], value_set=ta)
        known = np.asarray(pc.is_valid(idx).to_numpy(zero_copy_only=False))
        gi = np.asarray(pc.fill_null(idx, 0).to_numpy(zero_copy_only=False)).astype(
            np.int64
        )
        c = cents_arrow(batch["value"]).to_numpy(zero_copy_only=False)
        if len(ta) == 0:  # empty corpus: nothing can be flagged
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "value_cents": pa.array([], pa.int64()),
                }
            )
        # `known` guards NULL types (and any type unseen by the moment
        # pass) from being compared against group 0's bounds
        keep = known & ((c <= lo[gi]) | (c >= hi[gi]))
        out = batch.filter(pa.array(keep))
        return pa.table(
            {
                "event_id": out["event_id"],
                "event_type": out["event_type"],
                "value_cents": cents_arrow(out["value"]),
            }
        )

    flagged = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    ).map_batches(flag, batch_format="pyarrow")
    return ensure_schema(
        flagged,
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("event_type", pa.string()),
                ("value_cents", pa.int64()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# Grouped bivariate moments: value vs hour-of-day covariance / trend
# ---------------------------------------------------------------------------

def _trunc_div(a: int, b: int) -> int:
    """Exact integer division truncating toward zero over Python big ints
    — DuckDB's `//` semantics (Python's `//` floors, which diverges on
    negative numerators)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def events_value_hour_cov_by_type(sf_dir: str) -> pa.Table:
    """Per event_type, the exact-integer covariance (and regression
    slope) between value cents and hour-of-day — the diurnal-pattern
    probe of the moments family.  Same scale shape as the outlier flag:
    one (n, Σx, Σy, Σxy, Σy²) row per (batch, type), limb-split
    DISTRIBUTED merge, and the driver only sees one final row per group
    (bounded by the type count), reassembled in Python big ints.

    cov_ppm  = (n·Σxy − Σx·Σy) · 10⁶ trunc-div n²
    slope_ppm = (n·Σxy − Σx·Σy) · 10⁶ trunc-div (n·Σy² − (Σy)²), NULL
    when every event of the type lands in one hour.  Trunc (not floor)
    division matches DuckDB `//` on signed values.  NULL event_type rows
    are excluded (the oracle's WHERE clause drops the NULL group).
    """
    import pandas as pd
    import ray.data as rd

    from .core import partial_then_global

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value", "ts"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_valid(batch["event_type"]))
        c = cents_arrow(batch["value"]).to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        us = ts.astype("datetime64[us]").astype(np.int64)
        # FLOOR division then %24 is the calendar hour for any epoch sign
        # (DuckDB hour(ts)); trunc-div would be wrong pre-1970 here
        hour = (us // 3_600_000_000) % 24
        types = batch["event_type"].to_numpy(zero_copy_only=False)
        if len(c):
            amax = int(np.abs(c).max())
            # per-batch Σ|x·y| bound: rows · amax · 23 must fit int64
            if amax > 3_000_000_000 or len(c) * amax * 23 > (1 << 62):
                raise ValueError(
                    "bivariate partial would overflow int64: "
                    f"max |cents|={amax}, rows={len(c)}"
                )
        codes, uniq = pd.factorize(types)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        # integer sums via add.at (float64 bincount weights lose exactness
        # above 2^53)
        sx = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sx, codes, c)
        sy = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sy, codes, hour)
        sxy = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sxy, codes, c * hour)
        syy = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(syy, codes, hour * hour)
        return pa.table(
            {
                "event_type": pa.array(uniq, pa.string()),
                "n": pa.array(n, pa.int64()),
                "sx_hi": pa.array(sx // _LIMB, pa.int64()),
                "sx_lo": pa.array(sx % _LIMB, pa.int64()),
                "sy": pa.array(sy, pa.int64()),
                "sxy_hi": pa.array(sxy // _LIMB, pa.int64()),
                "sxy_lo": pa.array(sxy % _LIMB, pa.int64()),
                "syy": pa.array(syy, pa.int64()),
            }
        )

    limbs = partial_then_global(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        ["n", "sx_hi", "sx_lo", "sy", "sxy_hi", "sxy_lo", "syy"],
    )
    rows = []
    for row in limbs.take_all():  # one row per event type (driver-bounded)
        n = int(row["n"])
        sx = int(row["sx_hi"]) * _LIMB + int(row["sx_lo"])
        sy = int(row["sy"])
        sxy = int(row["sxy_hi"]) * _LIMB + int(row["sxy_lo"])
        syy = int(row["syy"])
        num = n * sxy - sx * sy
        den = n * syy - sy * sy
        rows.append(
            {
                "event_type": row["event_type"],
                "n": n,
                "cov_ppm": _trunc_div(num * 1_000_000, n * n),
                "slope_ppm": (
                    None if den == 0 else _trunc_div(num * 1_000_000, den)
                ),
            }
        )
    rows.sort(key=lambda r: r["event_type"])
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("event_type", pa.string()),
                ("n", pa.int64()),
                ("cov_ppm", pa.int64()),
                ("slope_ppm", pa.int64()),
            ]
        ),
    )


_BENFORD_SCHEMA = pa.schema([("digit", pa.int64()), ("n", pa.int64())])


def events_benford_first_digit(sf_dir: str):
    """Benford's-law probe: distribution of the leading decimal digit of
    positive value cents — the classic forged-data / unit-mix smoke test
    a data-quality suite runs next to ``documents_assertions``.

    Scale shape: map-only digit extraction (a <=19-step vectorized
    divide-down, no string formatting, no float log10 whose boundary
    error would misbin exact powers of ten) folding to per-batch digit
    partials; the exchange is nine rows per block.  Returned typed
    (nine-row bounded)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def prep(batch: pa.Table) -> pa.Table:
        c = cents_arrow(batch["value"]).to_numpy(zero_copy_only=False)
        c = c[c > 0].copy()
        while (c >= 10).any():
            big = c >= 10
            c[big] //= 10
        d, n = np.unique(c, return_counts=True)
        return pa.table(
            {
                "digit": pa.array(d.astype(np.int64)),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    from .core import partial_then_global

    rows = sorted(
        partial_then_global(
            ds.map_batches(prep, batch_format="pyarrow"), ["digit"], ["n"]
        ).take_all(),
        key=lambda r: r["digit"],
    )
    if not rows:
        return _BENFORD_SCHEMA.empty_table()
    return pa.table(
        {
            "digit": pa.array([r["digit"] for r in rows], pa.int64()),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
        }
    )
