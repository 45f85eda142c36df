"""Exact integer 3-sigma outlier flagging (functions/stats.py)."""

from __future__ import annotations

from math import isqrt

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**6), max_value=10**6), min_size=1, max_size=60
    )
)
def test_bound_decomposition_matches_square_predicate(vals):
    """For every v: (v*n - s1)^2 > 9*(n*s2 - s1^2)  <=>  v<=lo_le or
    v>=hi_ge — the sqrt-free per-row form must match the HUGEINT-square
    oracle form exactly, including boundary values."""
    n = len(vals)
    s1 = sum(vals)
    s2 = sum(v * v for v in vals)
    r = isqrt(9 * (n * s2 - s1 * s1))
    lo_le = (s1 - r - 1) // n
    hi_ge = (s1 + r + n) // n
    probe = set(vals) | {lo_le, lo_le + 1, hi_ge - 1, hi_ge, s1 // n}
    for v in probe:
        exact = (v * n - s1) ** 2 > 9 * (n * s2 - s1 * s1)
        via_bounds = v <= lo_le or v >= hi_ge
        assert exact == via_bounds, (v, n, s1, s2, r)


def test_outliers_match_duckdb_with_negatives(ray_session, tmp_path):
    """End-to-end vs DuckDB on a corpus with negative values (refund-style)
    and a single-row group (zero variance, never flagged)."""
    import duckdb
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.stats import events_value_outliers

    rng = np.random.default_rng(5)
    n = 4000
    vals = np.concatenate(
        [rng.normal(50, 10, n - 20), rng.normal(-400, 5, 19), [7.0]]
    )
    types = np.array(["a"] * (n - 1) + ["solo"])
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))

    got = (
        events_value_outliers(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(
            f"""
        WITH c AS (SELECT event_id, event_type,
                          CAST(round(value*100) AS BIGINT) AS vc
                   FROM read_parquet('{tmp_path}/events.parquet')),
        s AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) n,
                     SUM(CAST(vc AS HUGEINT)) s1,
                     SUM(CAST(vc AS HUGEINT)*CAST(vc AS HUGEINT)) s2
              FROM c GROUP BY 1)
        SELECT c.event_id, c.event_type, c.vc AS value_cents
        FROM c JOIN s USING (event_type)
        WHERE (CAST(c.vc AS HUGEINT)*s.n - s.s1)
            * (CAST(c.vc AS HUGEINT)*s.n - s.s1)
            > 9*(s.n*s.s2 - s.s1*s.s1)
        ORDER BY event_id
        """
        )
        .df()
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0  # the -400 cluster must be flagged
    assert (got["event_id"].to_numpy() == exp["event_id"].to_numpy()).all()
    assert (got["value_cents"].to_numpy() == exp["value_cents"].to_numpy()).all()


def test_outliers_null_type_and_overflow_guard(ray_session, tmp_path):
    """NULL event_type rows are ignored (as SQL's USING join does) and a
    value beyond the exact-int64 moment range raises instead of silently
    wrapping."""
    import pyarrow.parquet as pq
    import pytest
    import ray

    from layout_analysis_ray.functions.stats import events_value_outliers

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "event_type": pa.array(["a", "a", None, "a"], pa.string()),
            "value": pa.array([1.0, 1.0, 999.0, 100.0], pa.float64()),
        }
    )
    d1 = tmp_path / "nulls"
    d1.mkdir()
    pq.write_table(t, str(d1 / "events.parquet"))
    got = events_value_outliers(str(d1)).to_pandas()
    # (empty to_pandas frames are column-less — documented Ray limit)
    flagged = set(got["event_id"]) if len(got) else set()
    assert 3 not in flagged  # the NULL-type row never flags

    d2 = tmp_path / "huge"
    d2.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "event_type": pa.array(["a", "a"], pa.string()),
                "value": pa.array([1.0, 40_000_000.5], pa.float64()),
            }
        ),
        str(d2 / "events.parquet"),
    )
    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        events_value_outliers(str(d2))


def test_merged_moments_limb_split_exact(ray_session, tmp_path):
    """The distributed limb-split merge must equal the exact Python-int
    sum of the per-batch moments, including negative s1 and s2 values near
    the int64 partial guard."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.stats import (
        _merged_moments,
        _moment_partials,
    )

    rng = np.random.default_rng(9)
    vals = np.round(
        rng.normal(0, 5e4, 4000), 2
    )  # +/- cents sized inside the batch int64 guard; many batches
    types = rng.choice(["a", "b", "c"], 4000)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(4000), pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        tmp_path / "events.parquet",
        row_group_size=257,  # force many partial rows per group
    )
    got = _merged_moments(str(tmp_path))
    want: dict = {}
    for row in _moment_partials(str(tmp_path)).take_all():
        m = want.setdefault(row["event_type"], [0, 0, 0])
        m[0] += int(row["n"])
        m[1] += int(row["s1"])
        m[2] += int(row["s2"])
    assert got == {k: tuple(v) for k, v in want.items()}
    assert set(got) == {"a", "b", "c"}
