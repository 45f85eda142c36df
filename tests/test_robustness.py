"""Degenerate-input robustness (quarantine semantics, not task failure):
null spans, media-only docs, duplicate doc_ids, whitespace-only text, and
the CLI surface."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pyarrow as pa

from layout_analysis_ray.pipelines.extract import extract_pipeline
from layout_analysis_ray.sources.synth import DOCS_SCHEMA


def _run(tbl, ray):
    import ray.data as rd

    out = {}
    for b in extract_pipeline(rd.from_arrow(tbl)).iter_batches(
        batch_format="pyarrow"
    ):
        for r in b.to_pylist():
            out.setdefault(r["doc_id"], []).append(r["spans"])
    return out


def test_degenerate_docs_pass_through(ray_session):
    rows = [
        {"doc_id": "null-spans", "spans": None},
        {"doc_id": "empty-spans", "spans": []},
        {
            "doc_id": "media-only",
            "spans": [
                {"kind": "image", "text": "", "media_ref": "media://m/0", "offset": 0},
                {"kind": "figure_ref", "text": "", "media_ref": "media://m/1",
                 "offset": 1},
            ],
        },
        {
            "doc_id": "ws-only",
            "spans": [{"kind": "text", "text": " \t\n ", "media_ref": "", "offset": 0}],
        },
        {
            "doc_id": "unknown-kind",
            "spans": [{"kind": "mystery", "text": "x", "media_ref": "", "offset": 0}],
        },
    ]
    tbl = pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)
    got = _run(tbl, ray_session)
    assert set(got) == {r["doc_id"] for r in rows}
    # media-only docs keep no media (no preceding/following content span)
    assert got["media-only"] == [[]]
    assert got["null-spans"] == [[]]
    assert got["ws-only"] == [[]]


def test_duplicate_doc_ids_both_processed(ray_session):
    rows = [
        {"doc_id": "dup", "spans": [
            {"kind": "text", "text": "stream layout engine column span block arrow "
             "batch shuffle actor pipeline parquet schema offset merge", "media_ref": "",
             "offset": 0}]},
        {"doc_id": "dup", "spans": [
            {"kind": "text", "text": "document region title figure content boiler "
             "nav footer page corpus partition manifest lineage", "media_ref": "",
             "offset": 0}]},
    ]
    tbl = pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)
    got = _run(tbl, ray_session)
    assert len(got["dup"]) == 2  # happy path is row-local: both rows emitted


def test_cli_extract_resume_and_evaluate(tmp_path):
    """The ray-job-submit surface: resumable extract twice + evaluate."""
    out = str(tmp_path / "cli_out")
    env_cmd = [sys.executable, "-m", "layout_analysis_ray"]
    r1 = subprocess.run(
        env_cmd + ["extract", "--sf-dir", "/root/testdata/sf0.001", "--out", out,
                   "--partitions", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=240,
    )
    assert r1.returncode == 0, r1.stderr[-800:]
    job1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert job1["partitions_written"] == 4 and job1["n_docs"] == 500

    r2 = subprocess.run(
        env_cmd + ["extract", "--sf-dir", "/root/testdata/sf0.001", "--out", out,
                   "--partitions", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=240,
    )
    job2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert job2["partitions_written"] == 0  # fully committed -> no-op

    r3 = subprocess.run(
        env_cmd + ["evaluate", "--a", out, "--b", out],
        capture_output=True, text=True, cwd="/root/repo", timeout=240,
    )
    s = json.loads(r3.stdout.strip().splitlines()[-1])
    assert s["n_exact"] == 500 and s["mean_dice"] == 1.0
    shutil.rmtree(out, ignore_errors=True)


def test_pair_pipelines_empty_result_schema(ray_session, tmp_path):
    """A duplicate-free corpus must yield EMPTY pair sets with intact
    Dataset schemas (Ray drops the schema of empty map_groups blocks;
    functions.schema.ensure_schema pins it)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "alpha beta gamma delta epsilon zeta",
                "one two three four five six",
                "red green blue yellow purple orange",
                "cat dog bird fish mouse horse",
            ],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [36] * 4,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(3, dtype=np.int64),
            "embedding": [list(r) for r in np.eye(8)[:3]],  # orthogonal
            "label": [0, 1, 2],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(emb, preserve_index=False),
        str(tmp_path / "embeddings.parquet"),
    )

    from layout_analysis_ray.functions import dedup as D
    from layout_analysis_ray.functions import similarity as S

    sf = str(tmp_path)
    for fn, cols in [
        (D.dedup_minhash_pairs, ["doc_a", "doc_b", "est_jaccard_ppm"]),
        (D.simhash_pairs, ["doc_a", "doc_b", "hamming"]),
        (S.neardup_pairs_lsh, ["vec_a", "vec_b"]),
    ]:
        ds = fn(sf)
        assert ds.count() == 0, fn.__name__
        assert ds.schema().names == cols, fn.__name__


def test_ngram_jaccard_single_doc_schema(ray_session, tmp_path):
    """A 1-doc corpus has no consecutive pair: empty result, intact schema
    (previously schema() returned None)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pd.DataFrame(
        {
            "doc_id": np.array([0], dtype=np.int64),
            "text": ["solo document only one"],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [22],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    from layout_analysis_ray.functions.dedup import ngram_jaccard_consecutive

    ds = ngram_jaccard_consecutive(str(tmp_path))
    assert ds.count() == 0
    assert ds.schema().names == ["doc_a", "doc_b", "jaccard_ppm"]


def test_validate_docs_rejects_malformed(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from layout_analysis_ray.sources.synth import DOCS_SCHEMA, gen_table
    from layout_analysis_ray.sources.validate import (
        SchemaValidationError,
        validate_docs,
    )

    # good table passes through unchanged
    good = gen_table(8, seed=3)
    assert validate_docs(rd.from_arrow(good)).count() == 8

    # wrong schema (missing spans) fails fast
    bad_schema = pa.table({"doc_id": pa.array(["a", "b"], pa.string())})
    with pytest.raises(Exception, match="schema mismatch"):
        validate_docs(rd.from_arrow(bad_schema)).count()

    # empty doc_id fails
    bad_ids = pa.Table.from_pylist(
        [{"doc_id": "", "spans": []}], schema=DOCS_SCHEMA
    )
    with pytest.raises(Exception, match="empty"):
        validate_docs(rd.from_arrow(bad_ids)).count()


def test_cli_compact_preserves_rows(ray_session, tmp_path):
    import subprocess
    import sys

    import pyarrow.dataset as pads
    import ray.data as rd

    from layout_analysis_ray.sources.synth import gen_table

    src = str(tmp_path / "many")
    rd.from_arrow(gen_table(200, seed=9)).repartition(16).write_parquet(src)
    out = str(tmp_path / "compacted")
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "layout_analysis_ray",
            "compact",
            "--in",
            src,
            "--out",
            out,
            "--target-mb",
            "64",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env={**__import__("os").environ, "RAY_GRAFT_CPUS": "4"},
    )
    assert r.returncode == 0, r.stderr[-800:]
    assert pads.dataset(out, format="parquet").count_rows() == 200
    import os

    n_in = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    n_out = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_out < n_in


def test_scorer_pool_size_rejects_single_cpu():
    import pytest

    from layout_analysis_ray.pipelines.extract import scorer_pool_size

    with pytest.raises(ValueError, match=">= 2 CPUs"):
        scorer_pool_size(1)
    assert scorer_pool_size(2) == 1
    assert scorer_pool_size(16) == 7


def test_neardup_brute_guard(tmp_path, monkeypatch):
    """The exact O(n^2) baseline must refuse corpora above its row cap and
    point at the LSH scale path."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from layout_analysis_ray.functions import similarity

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1], pa.int64()),
                "embedding": pa.array(
                    [np.ones(4, np.float32) for _ in range(2)],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    monkeypatch.setattr(similarity, "NEARDUP_BRUTE_MAX_ROWS", 1)
    with pytest.raises(ValueError, match="neardup_pairs_lsh"):
        similarity.neardup_pairs(str(tmp_path))


def test_cli_media_demo_decoder(tmp_path):
    """`media --decoder demo` must produce decode_mode='real' parquet —
    the real-decoder path reachable outside pytest (round-3 item)."""
    import pyarrow.parquet as pq

    out = str(tmp_path / "media_out")
    r = subprocess.run(
        [sys.executable, "-m", "layout_analysis_ray", "media",
         "--sf-dir", "/root/testdata/sf0.001", "--out", out,
         "--decoder", "demo"],
        capture_output=True, text=True, cwd="/root/repo", timeout=240,
        env={**os.environ, "RAY_GRAFT_CPUS": "4"},
    )
    assert r.returncode == 0, r.stderr[-800:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["decode_modes"] == ["real"] and info["rows"] > 0
    t = pq.read_table(out)
    assert set(t.column("decode_mode").to_pylist()) == {"real"}
    # bytes-decoder contract: dims are parsed from the RAW8 payload header,
    # which encode_demo_payloads derives from sha256(media_ref)
    import hashlib

    refs = t.column("media_ref").to_pylist()
    digs = [hashlib.sha256(x.encode()).digest() for x in refs]
    assert t.column("width").to_pylist() == [16 + d[0] % 48 for d in digs]
    assert t.column("height").to_pylist() == [16 + d[1] % 48 for d in digs]
    assert t.column("n_frames").to_pylist() == [1 + d[2] % 4 for d in digs]


def test_new_event_ops_single_row_and_empty(ray_session, tmp_path):
    """The late round-3 event operators must survive a single-row corpus
    (zero variance, first == last, n=1 quantiles) and a fully EMPTY events
    table (empty results with intact schemas, no crashes)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.quantiles import (
        events_value_median_interp_by_type,
    )
    from layout_analysis_ray.functions.sketches import approx_value_quantiles
    from layout_analysis_ray.functions.stats import events_value_outliers
    from layout_analysis_ray.functions.windows import (
        first_last_event_per_user,
        new_users_hourly,
    )

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("ts", pa.timestamp("us")),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    one = tmp_path / "one"
    one.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1], pa.int64()),
                "user_id": pa.array([7], pa.int64()),
                "event_type": pa.array(["click"], pa.string()),
                "ts": pa.array([3_600_000_000 * 5 + 42], pa.timestamp("us")),
                "value": pa.array([12.34], pa.float64()),
                "props": pa.array(["{}"], pa.string()),
            }
        ),
        str(one / "events.parquet"),
    )
    assert events_value_outliers(str(one)).count() == 0  # zero variance
    fl = first_last_event_per_user(str(one)).to_pandas()
    assert fl.to_dict("records") == [
        {
            "user_id": 7,
            "first_event_id": 1,
            "first_value_cents": 1234,
            "last_event_id": 1,
            "last_value_cents": 1234,
        }
    ]
    nu = new_users_hourly(str(one)).to_pandas()
    assert nu.to_dict("records") == [{"epoch_hour": 5, "n_new": 1, "cum_new": 1}]
    med = events_value_median_interp_by_type(str(one)).to_pandas()
    assert med.to_dict("records") == [{"event_type": "click", "median_hcents": 2468}]
    sk = approx_value_quantiles(str(one)).to_pandas()
    assert (np.abs(sk["approx_cents"] - 1234) <= 0.011 * 1234 + 1).all()

    empty = tmp_path / "empty"
    empty.mkdir()
    pq.write_table(schema.empty_table(), str(empty / "events.parquet"))
    assert events_value_outliers(str(empty)).count() == 0
    assert first_last_event_per_user(str(empty)).count() == 0
    assert len(new_users_hourly(str(empty))) == 0
    sk0 = approx_value_quantiles(str(empty)).to_pandas()
    assert (sk0["approx_cents"] == 0).all()  # documented empty convention


def test_q17_empty_brand_subset_returns_typed_zero_row(ray_session, monkeypatch):
    """A brand that matches no parts must yield the SQL contract row
    (0, 0, 0), not a driver KeyError on the schema-less empty stats frame
    (the CLAUDE.md empty-Dataset quirk)."""
    import layout_analysis_ray.pipelines.relational as rel

    monkeypatch.setattr(rel, "Q17_BRAND", "Brand#NONEXISTENT")
    out = rel.q17_small_qty_revenue("/root/testdata/sf0.001").to_pandas()
    assert out.to_dict("records") == [
        {"total_price_cents": 0, "n_rows": 0, "avg_yearly_cents": 0}
    ]


def test_new_join_shapes_survive_degenerate_predicates(ray_session, monkeypatch, tmp_path):
    """Q21/Q7/Q8 must return their typed empty/zero results when the
    filters select nothing (no 'F' orders / no matching nations / no
    matching part type) — the empty-Dataset schema-loss quirk again."""
    import pyarrow as pa

    import layout_analysis_ray.pipelines.relational as rel

    sf = "/root/testdata/sf0.001"

    monkeypatch.setattr(rel, "Q21_LATE_DAYS", 10_000_000)  # nothing is late
    t = rel.q21_waiting_suppliers(sf).to_pandas()
    assert list(t.columns) == ["s_suppkey", "s_name", "numwait"]
    assert len(t) == 0

    monkeypatch.setattr(rel, "Q18_QTY_MIN_C", 10**15)  # nothing qualifies
    t = rel.q18_large_orders(sf).to_pandas()
    assert list(t.columns) == [
        "c_name", "o_custkey", "o_orderkey", "o_orderdate_day",
        "total_price_cents", "sum_qty_cents",
    ]
    assert len(t) == 0

    monkeypatch.setattr(rel, "Q7_NATION_A", "NATION_NOPE")
    t = rel.q7_volume_shipping(sf).to_pandas()
    assert list(t.columns) == [
        "supp_nation", "cust_nation", "l_year", "revenue_e4", "n_rows",
    ]
    assert len(t) == 0

    monkeypatch.setattr(rel, "Q8_PART_TYPE", "NO_SUCH_TYPE")
    t = rel.q8_market_share(sf).to_pandas()
    assert list(t.columns) == [
        "o_year", "target_rev_e4", "total_rev_e4", "share_ppm", "n_rows",
    ]
    assert len(t) == 0


def test_q7_tiers_agree(ray_session):
    """The broadcast cutover tier and the distributed join tier of Q7
    must produce identical rows (the q21 path-agreement pattern)."""
    import layout_analysis_ray.pipelines.relational as rel

    sf = "/root/testdata/sf0.001"
    a = rel.q7_volume_shipping(sf).to_pandas()
    b = rel.q7_volume_shipping(sf, broadcast_max_orders=0).to_pandas()
    cols = ["supp_nation", "cust_nation", "l_year"]
    a = a.sort_values(cols).reset_index(drop=True)
    b = b.sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) > 0


def test_q21_tiers_agree(ray_session):
    """The broadcast cutover tier and the distributed join tier of Q21
    must produce identical rows (the dedup_minhash_groups path-agreement
    pattern)."""
    import layout_analysis_ray.pipelines.relational as rel

    sf = "/root/testdata/sf0.001"
    a = rel.q21_waiting_suppliers(sf).to_pandas()
    b = rel.q21_waiting_suppliers(sf, broadcast_max_orders=0).to_pandas()
    assert a.equals(b)
    assert len(a) > 0


def test_new_r5_queries_survive_degenerate_inputs(ray_session, monkeypatch, tmp_path):
    """dense_rank / unpivot / q12 on empty or filter-missing inputs must
    return their TYPED empty results (the empty-Dataset schema-loss
    quirk), and the q12 distributed tier must not hit the Ray 2.49
    empty-side join crash."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import layout_analysis_ray.pipelines.relational as rel
    from layout_analysis_ray.functions.windows import dense_rank_by_type

    empty = tmp_path / "empty"
    empty.mkdir()
    pq.write_table(
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("ts", pa.timestamp("us")),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ).empty_table(),
        str(empty / "events.parquet"),
    )
    t = dense_rank_by_type(str(empty))
    assert t.num_rows == 0
    assert t.schema.names == ["event_id", "event_type", "value_cents", "drank"]

    li_schema = pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("l_partkey", pa.int64()),
            ("l_suppkey", pa.int64()),
            ("l_linenumber", pa.int32()),
            ("l_quantity", pa.float64()),
            ("l_extendedprice", pa.float64()),
            ("l_discount", pa.float64()),
            ("l_tax", pa.float64()),
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("l_shipdate", pa.timestamp("us")),
        ]
    )
    pq.write_table(li_schema.empty_table(), str(empty / "lineitem.parquet"))
    up = rel.lineitem_unpivot(str(empty))
    assert up.count() == 0
    assert up.schema().names == [
        "l_orderkey", "l_linenumber", "measure", "value_cents",
    ]

    sf = "/root/testdata/sf0.001"
    monkeypatch.setattr(rel, "Q12_LO", "2990-01-01")
    monkeypatch.setattr(rel, "Q12_HI", "2991-01-01")
    for bound in (None, 0):  # broadcast tier AND distributed tier
        t = rel.q12_priority_by_returnflag(sf, broadcast_max_orders=bound)
        assert t.to_pandas().empty
        assert t.schema.names == ["l_returnflag", "high_n", "low_n"]


def test_q12_tiers_agree(ray_session):
    """The broadcast-bitmap tier and the distributed join tier of the Q12
    shape must produce identical rows (the q7/q21 path-agreement
    pattern)."""
    import layout_analysis_ray.pipelines.relational as rel

    sf = "/root/testdata/sf0.001"
    a = rel.q12_priority_by_returnflag(sf).to_pandas()
    b = rel.q12_priority_by_returnflag(sf, broadcast_max_orders=0).to_pandas()
    assert a.equals(b)
    assert len(a) == 3  # A / N / R
    assert (a["high_n"] + a["low_n"] > 0).all()


def test_embedding_label_quality_empty_sides_guarded(ray_session, tmp_path):
    """Ray 2.49 Dataset.join raises on an all-empty side; the cross-modal
    join guards both sides from parquet metadata (driver-knowable, no
    scan) and returns the typed empty table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.similarity import embedding_label_quality

    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        ),
        f"{sf}/documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([1], pa.int64()),
                "embedding": pa.array([[0.1, 0.2]], pa.list_(pa.float32())),
                "label": pa.array([0], pa.int32()),
            }
        ),
        f"{sf}/embeddings.parquet",
    )
    out = embedding_label_quality(sf)
    assert out.num_rows == 0
    assert out.schema.names == ["label", "n_docs", "avg_quality_ppm"]


def _write_events(path, user_ids, event_types):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(user_ids)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(
                    np.arange(n, dtype=np.int64).astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "user_id": pa.array(np.asarray(user_ids, dtype=np.int64)),
                "event_type": pa.array(event_types, pa.string()),
            }
        ),
        f"{path}/events.parquet",
    )


def test_transition_counts_empty_from_nonempty_is_typed(ray_session, tmp_path):
    """Every user has exactly one event -> zero transition pairs from a
    NON-empty input; the driver-bounded result must keep its schema."""
    from layout_analysis_ray.functions.windows import transition_counts

    _write_events(tmp_path, [1, 2, 3], ["a", "b", "c"])
    out = transition_counts(str(tmp_path))
    assert out.num_rows == 0
    assert out.schema.names == ["prev_type", "event_type", "n"]


def test_transition_counts_null_prev_matches_oracle(ray_session, tmp_path):
    """SQL contract: WHERE prev_type IS NOT NULL drops NULL-prev pairs,
    but a NULL CURRENT event_type is kept as a GROUP BY key."""
    from layout_analysis_ray.functions.windows import transition_counts

    _write_events(tmp_path, [7, 7, 7], [None, "click", None])
    rows = transition_counts(str(tmp_path)).to_pylist()
    # (NULL -> click) dropped; (click -> NULL) kept
    assert rows == [{"prev_type": "click", "event_type": None, "n": 1}]


def test_embedding_label_quality_disjoint_ids_is_typed(ray_session, tmp_path):
    """Non-empty sides whose ids never match -> empty join output; the
    label-bounded result must keep its schema (Ray 2.49 drops the schema
    of an all-empty Dataset)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.similarity import embedding_label_quality

    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["hello world", "more text"], pa.string()),
            }
        ),
        f"{sf}/documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([100, 200], pa.int64()),
                "embedding": pa.array(
                    [[0.1, 0.2], [0.3, 0.4]], pa.list_(pa.float32())
                ),
                "label": pa.array([0, 1], pa.int32()),
            }
        ),
        f"{sf}/embeddings.parquet",
    )
    out = embedding_label_quality(sf)
    assert out.num_rows == 0
    assert out.schema.names == ["label", "n_docs", "avg_quality_ppm"]


def test_part_pairs_top_no_multiitem_orders_is_typed(ray_session, tmp_path):
    """Every order has a single (or duplicate-only) part -> zero pairs from
    a NON-empty input; the driver-bounded top-k result keeps its schema.
    Duplicate partkeys inside one order must not pair with themselves."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from layout_analysis_ray.pipelines.relational import part_pairs_top

    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2], pa.int64()),
                "l_partkey": pa.array([7, 7, 9], pa.int64()),
            }
        ),
        f"{tmp_path}/lineitem.parquet",
    )
    out = part_pairs_top(str(tmp_path))
    assert out.num_rows == 0
    assert out.schema.names == ["part_a", "part_b", "n_orders"]


def test_streaks_and_coverage_semantics(ray_session, tmp_path):
    """Pins the two contiguity operators: gaps-and-islands hour streaks
    (consecutive-hour runs split on any gap) and interval coverage
    (overlapping AND touching intervals merge; contained intervals add
    nothing), plus single-row and fully-empty corpora."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.windows import (
        user_coverage_intervals,
        user_hour_streaks,
    )

    S = 1_000_000  # one second in us

    def ev(eid, uid, ts_us, value):
        return (eid, uid, "click", ts_us, value, "{}")

    rows = [
        # user 1, hour 0: four intervals (value dollars == duration secs)
        ev(1, 1, 0 * S, 100.0),     # [0, 100s]
        ev(2, 1, 50 * S, 30.0),     # [50, 80s]   contained -> no new island
        ev(3, 1, 100 * S, 50.0),    # [100, 150s] TOUCHING e1 end -> merges
        ev(4, 1, 400 * S, 50.0),    # [400, 450s] separate island
        # user 1, hours 1, 2, 5: streak {0,1,2} then island {5}
        ev(5, 1, 3600 * S, 1.0),
        ev(6, 1, 7200 * S, 1.0),
        ev(7, 1, 18000 * S, 1.0),
        # user 2: one event
        ev(8, 2, 7 * 3600 * S, 2.5),
    ]
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("ts", pa.timestamp("us")),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    cols = list(zip(*rows))
    t = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "user_id": pa.array(cols[1], pa.int64()),
            "event_type": pa.array(cols[2], pa.string()),
            "ts": pa.array(cols[3], pa.timestamp("us")),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))

    st = (
        user_hour_streaks(str(d))
        .to_pandas()
        .sort_values("user_id")
        .to_dict("records")
    )
    assert st == [
        {"user_id": 1, "n_streaks": 2, "max_streak_hours": 3, "active_hours": 4},
        {"user_id": 2, "n_streaks": 1, "max_streak_hours": 1, "active_hours": 1},
    ]

    cov = (
        user_coverage_intervals(str(d))
        .to_pandas()
        .sort_values("user_id")
        .to_dict("records")
    )
    assert cov == [
        # [0,150s] + [400,450s] + three 1s islands = 5 intervals, 203 s
        {"user_id": 1, "n_intervals": 5, "covered_us": 203 * S},
        {"user_id": 2, "n_intervals": 1, "covered_us": 2_500_000},
    ]

    empty = tmp_path / "empty_ev"
    empty.mkdir()
    pq.write_table(schema.empty_table(), str(empty / "events.parquet"))
    assert user_hour_streaks(str(empty)).count() == 0
    assert user_coverage_intervals(str(empty)).count() == 0

    # calendar-spine gaps over the same fixtures: "click" is present in
    # hours {0, 1, 2, 5, 7}, so the 0..7 span is missing hours 3, 4, 6
    from layout_analysis_ray.functions.windows import missing_hours_by_type

    mh = missing_hours_by_type(str(d)).to_pandas()
    assert mh["event_type"].tolist() == ["click"] * 3
    assert mh["epoch_hour"].tolist() == [3, 4, 6]
    mh0 = missing_hours_by_type(str(empty))
    assert len(mh0) == 0 and mh0.schema.names == ["event_type", "epoch_hour"]


def test_rolling_7d_users_semantics_and_empty(ray_session, tmp_path):
    """Pins the sliding-window COUNT DISTINCT: a user active on day d is
    counted in window days d..d+6 (clipped at the corpus max day), a user
    active twice in one window counts once, and the fully-empty corpus
    returns the typed empty table."""
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.windows import DAY_US, rolling_7d_users

    def ev(eid, uid, day):
        return {
            "event_id": eid,
            "ts": pa.scalar(day * DAY_US, pa.timestamp("us")),
            "user_id": uid,
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }

    # user 1 on days 0 and 3 (overlapping windows: counts once in 3..6);
    # user 2 on day 8 only (hi_day=8 clips every window at 8)
    rows = [ev(1, 1, 0), ev(2, 1, 3), ev(3, 2, 8), ev(4, 1, 3)]
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "events.parquet"))
    got = {
        r["day"]: r["n_users"]
        for r in rolling_7d_users(str(d)).to_pylist()
    }
    # day: users with activity in [day-6, day], clipped to [0, 8]
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 7: 1, 8: 2}

    empty = tmp_path / "empty_ev"
    empty.mkdir()
    pq.write_table(
        pa.Table.from_pylist(rows[:0], schema=pa.Table.from_pylist(rows).schema),
        str(empty / "events.parquet"),
    )
    res = rolling_7d_users(str(empty))
    assert res.num_rows == 0
    assert res.column_names == ["day", "n_users"]


def test_source_fingerprint_order_independent_and_sensitive(
    ray_session, tmp_path
):
    """Pins the validation-checksum contract: the fingerprint is invariant
    to row order/partitioning, flips when any single row changes, and the
    empty corpus returns the typed empty table."""
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.domains import source_fingerprint

    def doc(i, text, src):
        return {
            "doc_id": i,
            "text": text,
            "lang": "en",
            "source": src,
            "n_chars": len(text),
        }

    rows = [doc(1, "alpha", "a"), doc(2, "beta", "a"), doc(3, "gamma", "b")]
    fwd = tmp_path / "fwd"
    rev = tmp_path / "rev"
    mut = tmp_path / "mut"
    for p in (fwd, rev, mut):
        p.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(fwd / "documents.parquet"))
    pq.write_table(
        pa.Table.from_pylist(rows[::-1]), str(rev / "documents.parquet")
    )
    changed = [doc(1, "alpha", "a"), doc(2, "BETA", "a"), doc(3, "gamma", "b")]
    pq.write_table(
        pa.Table.from_pylist(changed), str(mut / "documents.parquet")
    )

    f_fwd = {r["source"]: r for r in source_fingerprint(str(fwd)).to_pylist()}
    f_rev = {r["source"]: r for r in source_fingerprint(str(rev)).to_pylist()}
    f_mut = {r["source"]: r for r in source_fingerprint(str(mut)).to_pylist()}
    assert f_fwd == f_rev
    assert f_fwd["a"]["n_docs"] == 2 and f_fwd["b"]["n_docs"] == 1
    assert f_mut["a"]["fingerprint"] != f_fwd["a"]["fingerprint"]
    assert f_mut["b"] == f_fwd["b"]  # untouched source unchanged

    empty = tmp_path / "empty_docs"
    empty.mkdir()
    pq.write_table(
        pa.Table.from_pylist(
            rows[:0], schema=pa.Table.from_pylist(rows).schema
        ),
        str(empty / "documents.parquet"),
    )
    res = source_fingerprint(str(empty))
    assert res.num_rows == 0
    assert res.column_names == ["source", "n_docs", "fingerprint"]


def test_audience_overlap_and_session_median_degenerate(ray_session, tmp_path):
    """audience_overlap / session_duration_median on empty and single-user
    corpora: typed empty tables, no pair fan-out from a single type, and
    the session kernel's gap-break semantics on a handcrafted timeline."""
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.windows import (
        audience_overlap,
        session_duration_median,
    )

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("ts", pa.timestamp("us")),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    empty = tmp_path / "empty"
    empty.mkdir()
    pq.write_table(schema.empty_table(), str(empty / "events.parquet"))
    ov = audience_overlap(str(empty))
    assert ov.num_rows == 0
    assert ov.column_names == ["type_a", "type_b", "inter", "uni", "jaccard_ppm"]
    sm = session_duration_median(str(empty))
    assert sm.num_rows == 0
    assert sm.column_names == ["n_sessions", "median_duration_us"]

    # user 1: events at 0s, 100s (one session, 100s), then 4000s after the
    # 30-min gap (second session, single event -> duration 0); user 2 never
    # shares a type with user 1's "a" events
    M = 1_000_000
    rows = [
        {"event_id": 1, "user_id": 1, "event_type": "a",
         "ts": pa.scalar(0, pa.timestamp("us")), "value": 1.0, "props": "{}"},
        {"event_id": 2, "user_id": 1, "event_type": "a",
         "ts": pa.scalar(100 * M, pa.timestamp("us")), "value": 1.0,
         "props": "{}"},
        {"event_id": 3, "user_id": 1, "event_type": "b",
         "ts": pa.scalar(4000 * M, pa.timestamp("us")), "value": 1.0,
         "props": "{}"},
        {"event_id": 4, "user_id": 2, "event_type": "b",
         "ts": pa.scalar(0, pa.timestamp("us")), "value": 1.0, "props": "{}"},
    ]
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                   str(d / "events.parquet"))
    ov = {(r["type_a"], r["type_b"]): r for r in
          audience_overlap(str(d)).to_pylist()}
    # audiences: a={1}, b={1,2} -> inter 1, union 2
    assert ov == {("a", "b"): {"type_a": "a", "type_b": "b", "inter": 1,
                               "uni": 2, "jaccard_ppm": 500_000}}
    sm = session_duration_median(str(d)).to_pylist()[0]
    # sessions: user1 [0,100s], user1 [4000s] (0), user2 [0] (0)
    # durations sorted: 0, 0, 100s -> ceil(0.5*3)=2nd order stat = 0
    assert sm == {"n_sessions": 3, "median_duration_us": 0}


def test_cust_revenue_deciles_degenerate(ray_session, tmp_path):
    """cust_revenue_deciles with fewer customers than tiles (SQL NTILE
    gives one row per tile 1..n) and on an empty orders table (typed
    empty result)."""
    import pyarrow.parquet as pq

    import layout_analysis_ray.pipelines.relational as rel

    schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    )
    d = tmp_path / "tiny"
    d.mkdir()
    ts = pa.scalar(0, pa.timestamp("us"))
    rows = [
        {"o_orderkey": 1, "o_custkey": 1, "o_orderstatus": "O",
         "o_totalprice": 10.0, "o_orderdate": ts, "o_orderpriority": "1"},
        {"o_orderkey": 2, "o_custkey": 1, "o_orderstatus": "O",
         "o_totalprice": 30.0, "o_orderdate": ts, "o_orderpriority": "1"},
        {"o_orderkey": 3, "o_custkey": 2, "o_orderstatus": "O",
         "o_totalprice": 60.0, "o_orderdate": ts, "o_orderpriority": "1"},
    ]
    pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                   str(d / "orders.parquet"))
    got = rel.cust_revenue_deciles(str(d)).to_pylist()
    # customers: cust1=4000c, cust2=6000c -> tiles 1 and 2 (n<k: tile=rank)
    assert got == [
        {"tile": 1, "n_cust": 1, "revenue_cents": 4000,
         "share_ppm": 400_000, "cum_share_ppm": 400_000},
        {"tile": 2, "n_cust": 1, "revenue_cents": 6000,
         "share_ppm": 600_000, "cum_share_ppm": 1_000_000},
    ]

    empty = tmp_path / "empty_ord"
    empty.mkdir()
    pq.write_table(schema.empty_table(), str(empty / "orders.parquet"))
    res = rel.cust_revenue_deciles(str(empty))
    assert res.num_rows == 0
    assert res.column_names == [
        "tile", "n_cust", "revenue_cents", "share_ppm", "cum_share_ppm",
    ]


def test_documents_assertions_planted_violations(ray_session, tmp_path):
    """Every assertion fires on a planted-violation corpus with the exact
    expected count, and the empty corpus still emits the fixed six-row
    all-zero report (schedulers diff the report between runs)."""
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.domains import documents_assertions

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )

    def doc(i, text, src="s", n_chars=None):
        return {
            "doc_id": i,
            "text": text,
            "lang": "en",
            "source": src,
            "n_chars": len(text) if n_chars is None and text is not None
            else (n_chars if n_chars is not None else 0),
        }

    rows = [
        doc(1, "ok"),
        doc(1, "dup of 1"),          # 2 rows share doc_id 1
        doc(1, "also dup of 1"),     # -> dup_doc_id_rows = 3
        doc(2, ""),                  # empty_text = 1
        doc(3, "abc", n_chars=99),   # n_chars_mismatch = 1
        doc(None, "no id"),          # null_doc_id = 1
        doc(4, "no src", src=None),  # null_source = 1
        doc(5, None, n_chars=0),     # null_text = 1 (mismatch NOT counted)
    ]
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                   str(d / "documents.parquet"))
    got = {r["check_name"]: r["n_violations"]
           for r in documents_assertions(str(d)).to_pylist()}
    assert got == {
        "dup_doc_id_rows": 3,
        "empty_text": 1,
        "n_chars_mismatch": 1,
        "null_doc_id": 1,
        "null_source": 1,
        "null_text": 1,
    }

    empty = tmp_path / "empty_docs2"
    empty.mkdir()
    pq.write_table(schema.empty_table(), str(empty / "documents.parquet"))
    got = {r["check_name"]: r["n_violations"]
           for r in documents_assertions(str(empty)).to_pylist()}
    assert got == {k: 0 for k in got} and len(got) == 6


def test_cust_rfm_segments_degenerate(ray_session, tmp_path):
    """RFM on an empty orders table returns the typed empty segment
    table; a single customer lands in tier (1,1,1) with headcount 1
    (every boundary equals its only value, and the strictly-below rule
    puts it in tier 1)."""
    import pyarrow.parquet as pq

    import layout_analysis_ray.pipelines.relational as rel

    schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    )
    empty = tmp_path / "empty_rfm"
    empty.mkdir()
    pq.write_table(schema.empty_table(), str(empty / "orders.parquet"))
    res = rel.cust_rfm_segments(str(empty))
    assert res.num_rows == 0
    assert res.column_names == ["r_tier", "f_tier", "m_tier", "n_cust"]

    one = tmp_path / "one_rfm"
    one.mkdir()
    pq.write_table(
        pa.Table.from_pylist(
            [{"o_orderkey": 1, "o_custkey": 7, "o_orderstatus": "O",
              "o_totalprice": 10.0,
              "o_orderdate": pa.scalar(0, pa.timestamp("us")),
              "o_orderpriority": "1"}],
            schema=schema,
        ),
        str(one / "orders.parquet"),
    )
    assert rel.cust_rfm_segments(str(one)).to_pylist() == [
        {"r_tier": 1, "f_tier": 1, "m_tier": 1, "n_cust": 1}
    ]


def test_dedup_keep_best_prefers_quality_over_id(ray_session, tmp_path):
    """dedup_keep_best keeps the highest-quality duplicate even when a
    lower doc_id exists (vs dedup_exact's min-id rule); ties on quality
    fall back to min doc_id; the doc_id-width guard trips loudly."""
    import pytest
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.dedup import dedup_exact, dedup_keep_best

    # same text twice -> same hash AND same quality -> tie by min id;
    # to differentiate quality within one hash group is impossible for
    # EXACT dedup (same text = same score), so the quality preference is
    # proven across groups with the packed-key decode: a group whose only
    # member has doc_id 9 must decode doc_id 9 exactly (round-trip), and
    # the tie group must pick min id like dedup_exact.
    rows = [
        {"doc_id": 5, "text": "the quick brown fox", "lang": "en",
         "source": "a", "n_chars": 19},
        {"doc_id": 3, "text": "the quick brown fox", "lang": "en",
         "source": "b", "n_chars": 19},
        {"doc_id": 9, "text": "zz", "lang": "en", "source": "a",
         "n_chars": 2},
    ]
    d = tmp_path / "kb"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    best = {r["content_hash"]: r
            for r in dedup_keep_best(str(d)).take_all()}
    exact = {r["content_hash"]: r for r in dedup_exact(str(d)).take_all()}
    assert set(best) == set(exact)
    for h in best:
        assert best[h]["doc_id"] == exact[h]["doc_id"]  # ties -> min id
        assert best[h]["n_dups"] == exact[h]["n_dups"]
    assert sorted(r["doc_id"] for r in best.values()) == [3, 9]
    assert all(0 <= r["quality_ppm"] <= 1_000_000 for r in best.values())

    bad = tmp_path / "kb_bad"
    bad.mkdir()
    pq.write_table(
        pa.Table.from_pylist(
            [{"doc_id": 1 << 41, "text": "x", "lang": "en", "source": "a",
              "n_chars": 1}]
        ),
        str(bad / "documents.parquet"),
    )
    with pytest.raises(Exception, match="2\\^40|RayTaskError|doc_id"):
        dedup_keep_best(str(bad)).take_all()


def test_embedding_top_component_exact_replication(ray_session):
    """The distributed PCA-1 must EQUAL (bit-for-bit in ppm) a local
    single-process replication of the same integer-Gram pipeline — the
    fixed-point-first trick makes the distributed merge associative, so
    there is no tolerance to hide behind — and the direction must agree
    with numpy's full eigendecomposition of the float covariance."""
    import pyarrow.parquet as pq

    import numpy as np

    from layout_analysis_ray.functions.similarity import (
        _emb_matrix,
        _fp_ppm,
        embedding_top_component,
    )

    sf = "/root/testdata/sf0.001"
    got = embedding_top_component(sf).to_pylist()

    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    _ids, m = _emb_matrix(t)
    fp = _fp_ppm(m).astype(object)  # python ints -> exact big-int gram
    n, d = fp.shape
    g = (fp.T @ fp).astype(np.float64)
    s = fp.sum(axis=0).astype(np.float64)
    cov = (g * n - np.outer(s, s)) / (float(n) * n)
    w, v = np.linalg.eigh(cov)
    pc1 = v[:, -1]
    k = int(np.argmax(np.abs(pc1)))
    if pc1[k] < 0:
        pc1 = -pc1
    want_ppm = _fp_ppm(pc1)
    assert [r["dim"] for r in got] == list(range(d))
    assert [r["pc1_ppm"] for r in got] == want_ppm.tolist()
    expl = {r["explained_ppm"] for r in got}
    assert len(expl) == 1
    want_expl = int(round(float(w[-1]) / float(np.trace(cov)) * 1_000_000))
    assert expl == {want_expl}
    # the top component explains a plausible, nontrivial share
    assert 0 < want_expl <= 1_000_000


def test_round5_late_shapes_survive_degenerate_predicates(ray_session, monkeypatch):
    """The late-round-5 family (q9/q11/q16/q20, leakage, SCD2, chi2) must
    return typed empty/zero results when predicates select nothing — the
    empty-Dataset schema-loss quirk applies to every new exchange."""
    import layout_analysis_ray.pipelines.relational as rel
    from layout_analysis_ray.functions import dedup, windows

    sf = "/root/testdata/sf0.001"

    monkeypatch.setattr(rel, "Q9_NAME_SUBSTR", "zzz_no_such_part")
    t = rel.q9_profit_by_nation_year(sf).to_pandas()
    assert list(t.columns) == ["n_name", "l_year", "profit_e4", "n_rows"]
    assert len(t) == 0

    monkeypatch.setattr(rel, "Q20_NAME_PREFIX", "zzz_no_such_part")
    t = rel.q20_excess_shippers(sf).to_pandas()
    assert list(t.columns) == ["s_suppkey", "s_name"]
    assert len(t) == 0

    # threshold above any mean multiple -> empty hotlist (driver-typed)
    monkeypatch.setattr(rel, "Q11_NUM", 10**9)
    t = rel.q11_part_value_hotlist(sf).to_pandas()
    assert list(t.columns) == ["l_partkey", "value_e4"]
    assert len(t) == 0

    # exclusion filters that drop every part / every supplier
    monkeypatch.setattr(rel, "Q16_SUPP_MOD", 1)  # k % 1 == 0 drops all
    t = rel.q16_supplier_variety(sf).to_pandas()
    assert list(t.columns) == ["p_brand", "p_type", "p_size", "supplier_cnt"]
    assert len(t) == 0

    # a prefix longer than any doc start makes every fingerprint unique
    # per doc, so cross-source sharing still exists only where openings
    # collide; force the degenerate case with an impossible token count
    monkeypatch.setattr(dedup, "LEAK_PREFIX_TOKENS", 10**6)
    t = dedup.source_leakage_matrix(sf).to_pandas()
    assert list(t.columns) == ["source_a", "source_b", "shared_hashes"]
    # full-text fingerprints: the corpus has no exact cross-source dups
    assert len(t) == 0


def test_scd2_intervals_contract(ray_session):
    """SCD2 compaction invariants on the real corpus: n_events sums to the
    event count, valid_from <= valid_to, runs tile each user's timeline
    (next run's valid_from == this run's valid_to within a user)."""
    import numpy as np
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions import windows

    sf = "/root/testdata/sf0.001"
    df = windows.scd2_type_intervals(sf).to_pandas()
    n_events = pq.read_metadata(f"{sf}/events.parquet").num_rows
    assert int(df["n_events"].sum()) == n_events
    assert (df["valid_from"] <= df["valid_to"]).all()
    df = df.sort_values(["user_id", "valid_from"]).reset_index(drop=True)
    same_user = df["user_id"].to_numpy()[1:] == df["user_id"].to_numpy()[:-1]
    nxt_from = df["valid_from"].to_numpy()[1:]
    cur_to = df["valid_to"].to_numpy()[:-1]
    assert (nxt_from[same_user] == cur_to[same_user]).all()
    # adjacent runs of one user always change type (maximal runs)
    cur_t = df["event_type"].to_numpy()[:-1]
    nxt_t = df["event_type"].to_numpy()[1:]
    assert (cur_t[same_user] != nxt_t[same_user]).all()


def test_chi2_drift_zero_on_uniform_day(ray_session):
    """A corpus whose every day has the same type mix must score chi2 == 0
    for each day (the statistic's null case, exercised end to end)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions import windows

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        n_days, per_type = 3, 4
        rows = {"event_type": [], "ts": []}
        for day in range(n_days):
            for t in ("a", "b"):
                for i in range(per_type):
                    rows["event_type"].append(t)
                    rows["ts"].append(
                        np.datetime64("2020-01-01", "us")
                        + np.timedelta64(day, "D").astype("timedelta64[us]")
                        + np.timedelta64(i, "h").astype("timedelta64[us]")
                    )
        pq.write_table(
            pa.table(
                {
                    "event_type": pa.array(rows["event_type"], pa.string()),
                    "ts": pa.array(rows["ts"], pa.timestamp("us")),
                }
            ),
            os.path.join(d, "events.parquet"),
        )
        out = windows.type_drift_chi2(d).to_pandas()
        assert len(out) == n_days
        assert (out["chi2_scaled"] == 0).all()


def test_q13_q22_degenerate_predicates(ray_session, monkeypatch, tmp_path):
    """Q13 must short-circuit to [(0, n_customers)] when every order is
    excluded (the pre-join empty-side guard — Ray 2.49's join raises on an
    empty side), and Q22 must return its typed empty table when the cutoff
    makes every customer 'active'."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import layout_analysis_ray.pipelines.relational as rel

    sf = "/root/testdata/sf0.001"

    # real corpus: the distribution is total over customers
    t = rel.q13_custdist(sf).to_pandas()
    assert list(t.columns) == ["c_count", "custdist"]
    n_cust = pq.read_table(
        f"{sf}/customer.parquet", columns=["c_custkey"]
    ).num_rows
    assert int(t.custdist.sum()) == n_cust

    # planted all-'F' corpus: counts side is EMPTY -> pre-join short-circuit
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], pa.int64()),
                "c_nationkey": pa.array([0, 1, 2], pa.int64()),
                "c_acctbal": pa.array([10.0, 20.0, -5.0], pa.float64()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 1, 2], pa.int64()),
                "o_orderstatus": pa.array(["F", "F", "F"], pa.string()),
                "o_orderdate": pa.array(
                    [np.datetime64("1996-01-01", "us")] * 3,
                    pa.timestamp("us"),
                ),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    t = rel.q13_custdist(str(tmp_path)).to_pandas()
    assert list(map(tuple, t.itertuples(index=False))) == [(0, 3)]

    # Q22: cutoff before every order -> every buyer is recent-active;
    # only customer 3 never ordered but its balance is negative -> typed
    # empty result
    monkeypatch.setattr(rel, "Q22_CUTOFF", "1990-01-01")
    t = rel.q22_global_balance(str(tmp_path)).to_pandas()
    assert list(t.columns) == ["c_nationkey", "n_cust", "sum_acctbal_cents"]
    assert len(t) == 0
