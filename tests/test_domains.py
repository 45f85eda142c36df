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


def test_domain_mix_rates_and_determinism(ray_session):
    """Every kept row must satisfy the exact integer hash predicate for
    its source's rate; a full-rate source keeps everything; reruns and
    custom rate maps behave."""
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.domains import (
        MIX_DEFAULT_PPM,
        MIX_KEEP_PPM,
        domain_mix_sample,
    )
    from layout_analysis_ray.functions.sampling import HASH_DENOM
    from layout_analysis_ray.functions.hashing import id_hash_u32

    out = domain_mix_sample(SF).to_pandas()
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    rate = docs["source"].map(MIX_KEEP_PPM).fillna(MIX_DEFAULT_PPM)
    keep = id_hash_u32(docs["doc_id"].to_numpy()) * 1_000_000 < (
        rate.to_numpy().astype("int64") * HASH_DENOM
    )
    want = docs[keep].sort_values("doc_id").reset_index(drop=True)
    got = out.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # ppm=1e6 keeps all of src0
    n_src0 = (docs["source"] == "src0").sum()
    assert (got["source"] == "src0").sum() == n_src0
    # custom map: zero rate for src0 drops it entirely, rerun-stable
    none = domain_mix_sample(SF, keep_ppm={"src0": 0}).to_pandas()
    assert (none["source"] == "src0").sum() == 0


def test_repetition_stats_planted(ray_session, tmp_path):
    """Planted docs pin the ppm arithmetic and the keep thresholds: an
    all-one-token doc is top_ppm=1e6/no-keep, an all-distinct doc is
    dup_ppm=0/keep, an empty doc vanishes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.text import repetition_stats

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        "spam spam spam spam",       # top 1e6, dup 750k
                        "one two three four five",   # top 200k, dup 0
                        "",                           # dropped
                        "aa aa bb",                   # top 666666, dup 333333
                    ],
                    pa.string(),
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = (
        repetition_stats(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 4]
    assert out["top_token_ppm"].tolist() == [1_000_000, 200_000, 666_666]
    assert out["dup_token_ppm"].tolist() == [750_000, 0, 333_333]
    assert out["keep"].tolist() == [0, 1, 0]


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


def test_domain_mix_repeat_fractional_and_batch_invariant(ray_session, tmp_path):
    """Upsampling: floor copies for everyone, the fractional extra copy
    decided by the id-hash predicate — and the emitted multiset must not
    depend on batch boundaries (row_group_size=1 forces many batches)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.domains import domain_mix_repeat
    from layout_analysis_ray.functions.hashing import id_hash_u32
    from layout_analysis_ray.functions.sampling import HASH_DENOM

    rows = [
        {"doc_id": i, "text": "x", "lang": "en", "source": "s", "n_chars": 1}
        for i in range(1, 41)
    ]
    t = pa.Table.from_pylist(rows)
    pq.write_table(t, str(tmp_path / "documents.parquet"), row_group_size=1)

    rates = {"s": 2_500_000}  # 2.5x
    got = (
        domain_mix_repeat(str(tmp_path), repeat_ppm=rates)
        .to_pandas()
        .sort_values(["doc_id", "copy_idx"])
        .reset_index(drop=True)
    )
    ids = np.arange(1, 41, dtype=np.int64)
    extra = id_hash_u32(ids) * 1_000_000 < 500_000 * HASH_DENOM
    exp_copies = 2 + extra.astype(int)
    counts = got.groupby("doc_id").size()
    assert counts.reindex(ids).to_numpy().tolist() == exp_copies.tolist()
    # copy_idx is 1..n per doc
    assert (
        got.groupby("doc_id")["copy_idx"].max().to_numpy() == exp_copies
    ).all()
    assert (got.groupby("doc_id")["copy_idx"].min() == 1).all()
    # some docs must actually differ (2 vs 3) for the test to bite
    assert 0 < extra.sum() < 40


def test_corpus_token_budget_cut_branches(ray_session):
    """Both cutoff branches: a budget below the corpus token mass triggers
    the weighted narrowing (fill >= budget, overshoot < one quality
    level's mass); a budget above it falls back to keep-everything with
    cutoff == global min quality."""
    import duckdb

    from layout_analysis_ray.functions.domains import corpus_token_budget_cut

    sf = "/root/testdata/sf0.001"
    total, minq = duckdb.sql(f"""
        WITH qc AS (
          SELECT len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
            len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                w -> w IN ('the','a','and','of','to','in','is','on','for','with'))) AS n_stop,
            length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
            length(text) AS n_chars
          FROM read_parquet('{sf}/documents.parquet')),
        q AS (SELECT n_tokens,
            (4 * least(n_tokens * 10000, 1000000)
             + 3 * (CASE WHEN n_tokens > 0 THEN (n_stop * 1000000) // n_tokens ELSE 0 END)
             + 3 * (CASE WHEN n_chars > 0 THEN (n_alpha * 1000000) // n_chars ELSE 0 END)) // 10
              AS quality_ppm FROM qc)
        SELECT SUM(n_tokens), MIN(quality_ppm) FROM q
    """).fetchone()

    # narrowing branch: budget below the corpus mass
    row = corpus_token_budget_cut(sf, budget_tokens=5_000).to_pylist()[0]
    assert row["tokens_kept"] >= 5_000
    assert row["cutoff_quality_ppm"] > minq
    # greedy-fill tightness: dropping the cutoff level must dip below budget
    tighter = duckdb.sql(f"""
        WITH qc AS (
          SELECT len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
            len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                w -> w IN ('the','a','and','of','to','in','is','on','for','with'))) AS n_stop,
            length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
            length(text) AS n_chars
          FROM read_parquet('{sf}/documents.parquet')),
        q AS (SELECT n_tokens,
            (4 * least(n_tokens * 10000, 1000000)
             + 3 * (CASE WHEN n_tokens > 0 THEN (n_stop * 1000000) // n_tokens ELSE 0 END)
             + 3 * (CASE WHEN n_chars > 0 THEN (n_alpha * 1000000) // n_chars ELSE 0 END)) // 10
              AS quality_ppm FROM qc)
        SELECT SUM(n_tokens) FROM q WHERE quality_ppm > {row['cutoff_quality_ppm']}
    """).fetchone()[0]
    assert (tighter or 0) < 5_000

    # keep-all branch: budget above the corpus mass
    row2 = corpus_token_budget_cut(sf, budget_tokens=int(total) + 1).to_pylist()[0]
    assert row2["cutoff_quality_ppm"] == minq
    assert row2["tokens_kept"] == int(total)
    assert row2["n_docs_kept"] == 500


def test_corpus_token_budget_cut_boundary_and_empty(ray_session, tmp_path):
    """budget == total tokens takes the NARROWING branch (cum >= B is
    satisfiable) and must match the oracle exactly even with zero-token
    docs below the cut; an empty corpus returns the oracle's
    ungrouped-aggregate shape — one (NULL, 0, NULL) row."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.domains import corpus_token_budget_cut

    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["the quick brown fox", "of to in", "!!!"]),
                "lang": pa.array(["en"] * 3),
                "source": pa.array(["s"] * 3),
                "n_chars": pa.array([19, 8, 3], pa.int64()),
            }
        ),
        f"{sf}/documents.parquet",
    )
    total = 7  # 4 + 3 + 0 tokens
    row = corpus_token_budget_cut(sf, budget_tokens=total).to_pylist()[0]
    exp = duckdb.sql(f"""
        WITH qc AS (
          SELECT len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
            len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                w -> w IN ('the','a','and','of','to','in','is','on','for','with'))) AS n_stop,
            length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
            length(text) AS n_chars
          FROM read_parquet('{sf}/documents.parquet')),
        q AS (SELECT n_tokens,
            (4 * least(n_tokens * 10000, 1000000)
             + 3 * (CASE WHEN n_tokens > 0 THEN (n_stop * 1000000) // n_tokens ELSE 0 END)
             + 3 * (CASE WHEN n_chars > 0 THEN (n_alpha * 1000000) // n_chars ELSE 0 END)) // 10
              AS quality_ppm FROM qc),
        lv AS (SELECT quality_ppm, SUM(n_tokens) AS tok FROM q GROUP BY quality_ppm),
        cum AS (SELECT quality_ppm, SUM(tok) OVER (ORDER BY quality_ppm DESC) AS c FROM lv),
        cut AS (SELECT coalesce(MAX(quality_ppm) FILTER (WHERE c >= {total}),
                                (SELECT MIN(quality_ppm) FROM q)) AS cq FROM cum)
        SELECT CAST((SELECT cq FROM cut) AS BIGINT) AS cutoff_quality_ppm,
               CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
               CAST(SUM(q.n_tokens) AS BIGINT) AS tokens_kept
        FROM q WHERE q.quality_ppm >= (SELECT cq FROM cut)
    """).df().to_dict("records")[0]
    assert row == {k: int(v) for k, v in exp.items()}
    # the zero-token doc ('!!!', quality 0) sits below the cut: kept < 3
    assert row["n_docs_kept"] < 3

    # empty corpus: one typed (NULL, 0, NULL) row
    sfe = str(tmp_path / "sfe")
    (tmp_path / "sfe").mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        ),
        f"{sfe}/documents.parquet",
    )
    erow = corpus_token_budget_cut(sfe).to_pylist()
    assert erow == [
        {"cutoff_quality_ppm": None, "n_docs_kept": 0, "tokens_kept": None}
    ]
