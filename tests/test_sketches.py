"""Sketch accuracy gates: HLL within ~3% of exact distinct; CMS top-k
contains the true heavy hitters with upper-bound counts."""

from __future__ import annotations

import duckdb
import numpy as np

SF = "/root/testdata/sf0.01"


def test_hll_partial_merge_associative():
    from layout_analysis_ray.functions.sketches import (
        _hash64,
        _hll_estimate,
        _hll_partial,
    )

    vals = [f"u{i}" for i in range(10_000)]
    whole = _hll_partial(_hash64(np.asarray(vals, dtype=object)))
    a = _hll_partial(_hash64(np.asarray(vals[:6000], dtype=object)))
    b = _hll_partial(_hash64(np.asarray(vals[4000:], dtype=object)))
    merged = np.maximum(a, b)
    assert (merged == whole).all()  # overlap-safe associative merge
    est = _hll_estimate(whole)
    assert abs(est - 10_000) / 10_000 < 0.05


def test_approx_distinct_users_vs_exact(ray_session):
    from layout_analysis_ray.functions.sketches import approx_distinct_users

    got = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_users(SF).take_all()
    }
    exact = dict(
        duckdb.sql(
            f"SELECT event_type, COUNT(DISTINCT user_id) FROM "
            f"read_parquet('{SF}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    assert set(got) == set(exact)
    for t, e in exact.items():
        assert abs(got[t] - e) / max(1, e) < 0.05, (t, got[t], e)


def test_heavy_hitters_vs_exact(ray_session):
    from layout_analysis_ray.functions.sketches import heavy_hitter_tokens

    got = heavy_hitter_tokens(SF, top_k=10).take_all()
    exact = duckdb.sql(
        f"""
        SELECT tok, COUNT(*) AS n FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
          FROM read_parquet('{SF}/documents.parquet'))
        GROUP BY 1 ORDER BY n DESC, tok LIMIT 10
        """
    ).fetchall()
    true_top = {t for t, _ in exact}
    got_top = {r["token"] for r in got}
    # CMS top-k must contain at least 8 of the true top-10, estimates are
    # upper bounds of the true counts
    assert len(true_top & got_top) >= 8
    exact_counts = dict(exact)
    for r in got:
        if r["token"] in exact_counts:
            assert r["est_count"] >= exact_counts[r["token"]]


def test_heavy_hitters_empty_corpus(ray_session, tmp_path):
    """An all-empty-text corpus produces no sketch rows; the query must
    return an empty (token, est_count) table, not IndexError."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.sketches import heavy_hitter_tokens

    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["", ""], pa.string())}),
        tmp_path / "documents.parquet",
    )
    out = heavy_hitter_tokens(str(tmp_path), top_k=5).take_all()
    assert out == []


def test_quantile_sketch_vs_exact(ray_session):
    """One-pass DDSketch quantiles within the documented relative error of
    the exact 3-scan values (+1 cent rounding slack)."""
    from layout_analysis_ray.functions.quantiles import events_value_quantiles
    from layout_analysis_ray.functions.sketches import (
        DDS_EPS,
        approx_value_quantiles,
    )

    sf = "/root/testdata/sf0.001"
    exact = dict(
        zip(*(lambda t: (t["q_ppm"].to_pylist(), t["value_cents"].to_pylist()))(
            events_value_quantiles(sf)
        ))
    )
    approx = dict(
        zip(*(lambda t: (t["q_ppm"].to_pylist(), t["approx_cents"].to_pylist()))(
            approx_value_quantiles(sf)
        ))
    )
    assert set(approx) == set(exact)
    for q, ev in exact.items():
        assert abs(approx[q] - ev) <= DDS_EPS * ev + 1, (q, approx[q], ev)


def test_quantile_sketch_merge_invariance(ray_session):
    """The partial+tree merge must be batching-invariant: the merged
    histogram of many small partials equals one whole-array partial."""
    import numpy as np

    from layout_analysis_ray.functions.sketches import _dds_partial, _dds_quantiles

    rng = np.random.default_rng(3)
    c = rng.integers(0, 10**7, 20_000).astype(np.int64)
    whole = _dds_partial(c)
    chunks = sum(_dds_partial(ch) for ch in np.array_split(c, 37))
    assert (whole == chunks).all()
    # sanity: median estimate within eps of true median
    true_med = int(np.sort(c)[(len(c) + 1) // 2 - 1])
    est = _dds_quantiles(whole, [500_000])[500_000]
    assert abs(est - true_med) <= 0.011 * true_med + 1


def test_quantile_sketch_negative_values(ray_session):
    """Mirrored negative bins keep the relative-error bound for
    refund-style data (and the zero slot stays exact)."""
    import numpy as np

    from layout_analysis_ray.functions.sketches import (
        _dds_partial,
        _dds_quantiles,
    )

    rng = np.random.default_rng(9)
    c = np.concatenate(
        [rng.integers(-(10**6), -1, 5000), np.zeros(100, np.int64),
         rng.integers(1, 10**6, 5000)]
    ).astype(np.int64)
    hist = _dds_partial(c)
    assert hist.sum() == len(c)
    sv = np.sort(c)
    for q in (100_000, 250_000, 500_000, 750_000, 900_000):
        k = (q * len(c) + 999_999) // 1_000_000
        true = int(sv[k - 1])
        est = _dds_quantiles(hist, [q])[q]
        assert abs(est - true) <= 0.011 * abs(true) + 1, (q, est, true)
