"""Exact distributed order statistics (histogram narrowing) vs numpy."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _mk(arr):
    import ray.data as rd

    return lambda: rd.from_arrow(pa.table({"v": pa.array(arr, pa.int64())}))


def test_kth_smallest_adversarial(ray_session):
    """Ties, negatives, and a 1e12-wide domain (forces 3 narrowing passes)."""
    from layout_analysis_ray.functions.quantiles import kth_smallest

    rng = np.random.default_rng(7)
    arr = np.concatenate(
        [np.full(1000, 5), rng.integers(-50, 50, 3000), np.full(10, 10**12)]
    ).astype(np.int64)
    sv = np.sort(arr)
    ranks = [1, 2, len(arr) // 2, len(arr) - 1, len(arr)]
    got = kth_smallest(_mk(arr), ranks)
    assert got == {k: int(sv[k - 1]) for k in ranks}


def test_kth_smallest_constant_column(ray_session):
    from layout_analysis_ray.functions.quantiles import kth_smallest

    got = kth_smallest(_mk(np.full(100, 42, dtype=np.int64)), [1, 50, 100])
    assert got == {1: 42, 50: 42, 100: 42}


def test_kth_smallest_rank_bounds(ray_session):
    from layout_analysis_ray.functions.quantiles import kth_smallest

    with pytest.raises(ValueError):
        kth_smallest(_mk(np.arange(10)), [0])
    with pytest.raises(ValueError):
        kth_smallest(_mk(np.arange(10)), [11])


def test_quantiles_match_numpy_sf0001(ray_session):
    """End-to-end query vs a full in-memory sort at sf0.001."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.quantiles import (
        DEFAULT_QS_PPM,
        lineitem_price_quantiles,
    )

    sf = "/root/testdata/sf0.001"
    got = lineitem_price_quantiles(sf).to_pandas()
    col = pq.read_table(f"{sf}/lineitem.parquet", columns=["l_extendedprice"])[
        "l_extendedprice"
    ]
    v = np.sort(pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64()).to_numpy())
    n = len(v)
    exp = {q: int(v[(q * n + 999_999) // 1_000_000 - 1]) for q in DEFAULT_QS_PPM}
    assert dict(zip(got["q_ppm"], got["value_cents"])) == exp
