"""Unit gates for the round-4 ranking/collocation text operators that the
sf0.001 parity gate can't fully exercise: the fixture has 500 docs (500 % 4
== 0), so the SQL-NTILE remainder branch (first n % k tiles take one extra
row) never runs there.  These tests use a 7-doc fixture (7 % 4 == 3) and
compare bit-for-bit against DuckDB's own window functions."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def uneven_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("uneven")
    texts = [
        "the cat sat",
        "the cat ran",
        "a dog sat",
        "",
        "one",
        "the cat sat on the mat",
        "cat the cat",
    ]
    rows = [
        {
            "doc_id": i + 1,
            "text": t,
            "lang": "en",
            "source": f"src{i % 3}",
            "n_chars": len(t) if i != 5 else len(texts[0]),  # force a tie
        }
        for i, t in enumerate(texts)
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.sql(sql).df()


def test_ntile_remainder_branch_matches_duckdb(ray_session, uneven_dir):
    from layout_analysis_ray.functions.text import ntile_by_chars

    got = (
        ntile_by_chars(uneven_dir)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    exp = _duck(
        uneven_dir,
        """
        SELECT doc_id, n_chars,
               CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rank,
               CAST(ntile(4) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS tile
        FROM documents ORDER BY rank
        """,
    )
    # 7 rows, 4 tiles -> tile sizes 2,2,2,1 (remainder branch live)
    assert sorted(np.bincount(got["tile"])[1:].tolist(), reverse=True) == [2, 2, 2, 1]
    for c in ("doc_id", "n_chars", "rank", "tile"):
        assert got[c].tolist() == exp[c].tolist(), c


def test_ntile_fewer_rows_than_tiles(ray_session, tmp_path):
    """q == 0 degenerate: every row is its own tile (SQL NTILE semantics)."""
    from layout_analysis_ray.functions.text import ntile_by_chars

    rows = [
        {"doc_id": i, "text": "x", "lang": "en", "source": "s", "n_chars": i}
        for i in range(1, 3)
    ]
    pq.write_table(
        pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet")
    )
    got = ntile_by_chars(str(tmp_path)).to_pandas().sort_values("rank")
    assert got["tile"].tolist() == [1, 2]


def test_bigram_top_counts_adjacent_pairs_only(ray_session, uneven_dir):
    """The zero-copy slice kernel must not join tokens across document
    boundaries, and empty / 1-token docs contribute nothing."""
    from layout_analysis_ray.functions.text import bigram_top

    got = bigram_top(uneven_dir).to_pandas()
    exp = _duck(
        uneven_dir,
        """
        WITH t AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token,
                 generate_subscripts(
                   regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
          FROM documents),
        b AS (
          SELECT a.token || ' ' || c.token AS bigram, COUNT(*) AS n
          FROM t a JOIN t c ON a.doc_id = c.doc_id AND c.pos = a.pos + 1
          GROUP BY 1),
        r AS (SELECT bigram, n,
                     row_number() OVER (ORDER BY n DESC, bigram) AS rank
              FROM b)
        SELECT bigram, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank
        FROM r WHERE rank <= 10 ORDER BY rank
        """,
    )
    got = got.sort_values("rank").reset_index(drop=True)
    assert got["bigram"].tolist() == exp["bigram"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    # cross-doc pair "sat the" (doc1 end -> doc2 start) must be absent
    assert "sat the" not in set(got["bigram"])


def test_source_jaccard_symmetric_bounds(ray_session, uneven_dir):
    from layout_analysis_ray.functions.text import source_token_jaccard

    got = source_token_jaccard(uneven_dir).to_pandas()
    # pairs are canonical (src_a < src_b), ppm in [0, 1e6]
    assert (got["src_a"] < got["src_b"]).all()
    assert ((got["jaccard_ppm"] >= 0) & (got["jaccard_ppm"] <= 1_000_000)).all()
    assert (got["inter"] <= got["uni"]).all()


def test_q6_sum_over_empty_emits_one_zero_row(ray_session, tmp_path):
    """SQL's SUM-over-empty contract: q6 must return exactly one (0, 0)
    row when no lineitem survives the filters (the seed-row path)."""
    import pandas as pd

    from layout_analysis_ray.pipelines.relational import q6_forecast_revenue

    t = pa.Table.from_pylist(
        [
            {
                "l_shipdate": pd.Timestamp("1999-06-01"),  # outside the year
                "l_discount": 0.06,
                "l_quantity": 10.0,
                "l_extendedprice": 1000.0,
            }
        ]
    )
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    got = q6_forecast_revenue(str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert got["revenue_e4"].iloc[0] == 0 and got["n_rows"].iloc[0] == 0


def test_oov_rate_excludes_zero_token_docs(ray_session, tmp_path):
    """Docs with no tokens emit no row (the oracle's unnest-then-group
    contract), and OOV counting matches a hand computation."""
    from layout_analysis_ray.functions.text import oov_rate

    rows = [
        {"doc_id": 1, "text": "aa aa bb", "lang": "en", "source": "s", "n_chars": 8},
        {"doc_id": 2, "text": "", "lang": "en", "source": "s", "n_chars": 0},
        {"doc_id": 3, "text": "aa zz", "lang": "en", "source": "s", "n_chars": 5},
    ]
    pq.write_table(
        pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet")
    )
    got = (
        oov_rate(str(tmp_path), vocab_top_n=1)  # vocab == {aa}
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [1, 3]  # doc 2 has no tokens
    assert got["n_tokens"].tolist() == [3, 2]
    assert got["n_oov"].tolist() == [1, 1]  # bb / zz are OOV
    assert got["oov_ppm"].tolist() == [333333, 500000]


def test_degenerate_corpora_keep_typed_schemas(ray_session, tmp_path):
    """A fully-empty Ray Dataset loses its schema in to_pandas/take_all
    (Ray skips map UDFs on empty blocks), so the operators whose results
    are driver-bounded return typed pyarrow Tables — the driver's
    column-name comparison must see the oracle's columns even when the
    result is empty."""
    from layout_analysis_ray.functions.text import (
        bigram_top,
        ntile_by_chars,
        oov_rate,
        source_token_jaccard,
    )

    single = tmp_path / "single"
    single.mkdir()
    pq.write_table(
        pa.Table.from_pylist(
            [{"doc_id": 1, "text": "aa", "lang": "en", "source": "s", "n_chars": 2}]
        ),
        str(single / "documents.parquet"),
    )
    empty = tmp_path / "empty"
    empty.mkdir()
    pq.write_table(
        pa.Table.from_pylist(
            [],
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("text", pa.string()),
                    ("lang", pa.string()),
                    ("source", pa.string()),
                    ("n_chars", pa.int64()),
                ]
            ),
        ),
        str(empty / "documents.parquet"),
    )

    def cols(res):
        # pa.Table and ray Dataset both expose to_pandas
        return res.to_pandas().columns.tolist()

    assert cols(source_token_jaccard(str(single))) == [
        "src_a", "src_b", "inter", "uni", "jaccard_ppm",
    ]
    assert cols(bigram_top(str(single))) == ["bigram", "n", "rank"]
    assert cols(ntile_by_chars(str(empty))) == [
        "doc_id", "n_chars", "rank", "tile",
    ]
    assert cols(oov_rate(str(empty))) == [
        "doc_id", "n_tokens", "n_oov", "oov_ppm",
    ]


def test_percent_rank_single_row_partition_and_ties(ray_session, tmp_path):
    """SQL PERCENT_RANK: single-row partitions score 0; equal values are
    ordered by event_id (the unique (value_cents, event_id) sort key)."""
    import pandas as pd

    from layout_analysis_ray.functions.windows import percent_rank_by_type

    rows = [
        {"event_id": 1, "ts": pd.Timestamp("2024-01-01"), "user_id": 1,
         "event_type": "solo", "value": 5.0, "props": "{}"},
        {"event_id": 2, "ts": pd.Timestamp("2024-01-01"), "user_id": 1,
         "event_type": "duo", "value": 1.0, "props": "{}"},
        {"event_id": 3, "ts": pd.Timestamp("2024-01-01"), "user_id": 1,
         "event_type": "duo", "value": 1.0, "props": "{}"},  # tie on value
        {"event_id": 4, "ts": pd.Timestamp("2024-01-01"), "user_id": 1,
         "event_type": "duo", "value": 9.0, "props": "{}"},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "events.parquet"))
    got = (
        percent_rank_by_type(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got.loc[got["event_type"] == "solo", "prank_ppm"].tolist() == [0]
    duo = got[got["event_type"] == "duo"]
    # tie broken by event_id: ranks 1,2 for the two 1.0 rows, 3 for 9.0
    assert duo.set_index("event_id")["rank"].to_dict() == {2: 1, 3: 2, 4: 3}
    assert duo.set_index("event_id")["prank_ppm"].to_dict() == {
        2: 0, 3: 500000, 4: 1000000,
    }


def test_vocab_freq_spectrum_empty_corpus_typed(ray_session, tmp_path):
    from layout_analysis_ray.functions.text import vocab_freq_spectrum

    pq.write_table(
        pa.Table.from_pylist(
            [],
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("text", pa.string()),
                    ("lang", pa.string()),
                    ("source", pa.string()),
                    ("n_chars", pa.int64()),
                ]
            ),
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = vocab_freq_spectrum(str(tmp_path)).to_pandas()
    assert got.columns.tolist() == ["occurrences", "n_tokens"]
    assert len(got) == 0


def test_bucket_rank_offsets_stitch_and_driver_bound(ray_session):
    """The rank-offset stitch (VERDICT r4 finding 1): the driver dict holds
    ONE entry per nonempty ranking partition — never per distinct value —
    and the prefix sums are exclusive starts within each part.  Negative
    buckets must sort before positive ones (floor-division bucketing keeps
    value order; trunc would not)."""
    import ray.data as rd

    from layout_analysis_ray.functions.core import bucket_rank_offsets

    agg = rd.from_arrow(
        pa.table(
            {
                "part": ["a", "a", "a", "b", "b"],
                "bucket": [2, -1, 0, 5, -3],
                "cnt": [4, 2, 3, 1, 7],
            }
        )
    )
    offsets, totals = bucket_rank_offsets(agg, ["part"], "bucket")
    # one driver entry per (part, bucket) partition row, nothing per value
    assert len(offsets) == 5
    assert offsets == {
        ("a", -1): 0,
        ("a", 0): 2,
        ("a", 2): 5,
        ("b", -3): 0,
        ("b", 5): 7,
    }
    assert totals == {("a",): 9, ("b",): 8}


def test_bucket_rank_offsets_no_parts_and_empty(ray_session):
    import ray.data as rd

    from layout_analysis_ray.functions.core import bucket_rank_offsets

    agg = rd.from_arrow(pa.table({"bucket": [3, 1], "cnt": [2, 5]}))
    offsets, totals = bucket_rank_offsets(agg, [], "bucket")
    assert offsets == {(1,): 0, (3,): 5}
    assert totals == {(): 7}
    empty = rd.from_arrow(
        pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    )
    assert bucket_rank_offsets(empty, [], "bucket") == ({}, {})


def test_cume_dist_degenerate_and_tie_semantics(ray_session, tmp_path):
    """cume_dist: all-tied partition -> every row 1e6 ppm; empty events ->
    typed empty table (the ranking-family degenerate contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.windows import cume_dist_by_type

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
    tied = tmp_path / "tied"
    tied.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "user_id": pa.array([1, 1, 1], pa.int64()),
                "event_type": pa.array(["a", "a", "a"], pa.string()),
                "ts": pa.array([0, 1, 2], pa.timestamp("us")),
                "value": pa.array([5.0, 5.0, 5.0], pa.float64()),
                "props": pa.array(["{}"] * 3, pa.string()),
            }
        ),
        str(tied / "events.parquet"),
    )
    out = cume_dist_by_type(str(tied)).to_pandas()
    assert out["cume_ppm"].tolist() == [1_000_000] * 3

    empty = tmp_path / "empty"
    empty.mkdir()
    pq.write_table(schema.empty_table(), str(empty / "events.parquet"))
    t = cume_dist_by_type(str(empty))
    assert t.num_rows == 0
    assert t.schema.names == ["event_id", "event_type", "value_cents", "cume_ppm"]
