"""Source-composition operators: the per-source cap must be a
deterministic prefix (k=3 results are exactly the rank<=3 slice of
k=10), and the scorecard must reconcile with direct recomputation."""

import pandas as pd

SF = "/root/testdata/sf0.001"


def _sorted(df):
    return df.sort_values(["source", "rank"]).reset_index(drop=True)


def test_cap_is_deterministic_prefix(ray_session):
    from layout_analysis_ray.functions.domains import cap_docs_per_source

    ten = _sorted(cap_docs_per_source(SF, k=10).to_pandas())
    three = _sorted(cap_docs_per_source(SF, k=3).to_pandas())
    pd.testing.assert_frame_equal(
        three, _sorted(ten[ten["rank"] <= 3])
    )
    assert (ten.groupby("source")["rank"].max() <= 10).all()
    # rerun identical (hash order is process-independent)
    again = _sorted(cap_docs_per_source(SF, k=10).to_pandas())
    pd.testing.assert_frame_equal(again, ten)


def test_scorecard_totals_reconcile(ray_session):
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.domains import source_quality_report

    rep = source_quality_report(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["source"])
    n = docs.num_rows
    assert rep["n_docs"].sum() == n
    assert (rep["n_unique"] <= rep["n_docs"]).all()
    assert (rep["n_en"] <= rep["n_docs"]).all()
    assert rep["source"].is_unique


def test_source_unique_sketch_accuracy(ray_session):
    """The grouped-HLL scale path must track the exact scorecard's
    n_unique within the sketch's error bound on every source."""
    from layout_analysis_ray.functions.domains import source_quality_report
    from layout_analysis_ray.functions.sketches import source_unique_sketch

    exact = source_quality_report(SF).to_pandas().set_index("source")["n_unique"]
    approx = (
        source_unique_sketch(SF).to_pandas().set_index("source")["approx_unique"]
    )
    assert set(exact.index) == set(approx.index)
    for s in exact.index:
        lo, hi = exact[s] * 0.9 - 2, exact[s] * 1.1 + 2
        assert lo <= approx[s] <= hi, (s, exact[s], approx[s])
