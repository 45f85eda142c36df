"""Pattern scrubbing (PII stats / redaction) and the new grouped
bivariate-moment + MAD operators: planted-data semantic gates (the
synthetic corpus is PII-free, so the fixture oracle rows are all-zero
there) plus exactness checks against DuckDB on adversarial values."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_pii_stats_planted(ray_session, tmp_path):
    from layout_analysis_ray.functions.text import pii_stats

    sf = _write_docs(
        tmp_path,
        [
            (1, "contact bob@example.com or alice@corp.co.uk today"),
            (2, "server at 10.0.0.1 and 192.168.1.255, ssn 123-45-6789"),
            (3, "clean text with no identifiers at all"),
            (4, None),
            (5, "edge: not-an-ip 1234.5.6.7890 still matches inner bytes"),
        ],
    )
    out = pii_stats(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, ["n_email", "n_ipv4", "n_ssn"]].tolist() == [2, 0, 0]
    assert out.loc[1, ["n_email", "n_ipv4", "n_ssn"]].tolist() == [0, 2, 1]
    assert out.loc[2, "n_total"] == 0 and out.loc[3, "n_total"] == 0
    # engine counts must equal DuckDB's RE2 counts on the same patterns
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.execute(
        r"""SELECT doc_id,
            len(regexp_extract_all(coalesce(text,''),
              '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS n_email
            FROM documents ORDER BY doc_id"""
    ).df()
    assert out["n_email"].tolist() == want["n_email"].astype(int).tolist()


def test_redact_planted(ray_session, tmp_path):
    from layout_analysis_ray.functions.text import redact_pattern

    sf = _write_docs(
        tmp_path,
        [
            (1, "the customer saw spark fly"),
            (2, "customers are not redacted (no word boundary match)"),
            (3, None),
        ],
    )
    out = (
        redact_pattern(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out.loc[0, "text_redacted"] == "the [REDACTED] saw [REDACTED] fly"
    assert out.loc[0, "n_hits"] == 2
    assert out.loc[1, "n_hits"] == 0
    assert "customers" in out.loc[1, "text_redacted"]
    assert out.loc[2, "text_redacted"] == "" and out.loc[2, "n_hits"] == 0


def _write_events(tmp_path, rows):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


def test_hour_cov_exact_and_trunc_division(ray_session, tmp_path):
    """Negative covariance must trunc-div toward zero (DuckDB //), and a
    single-hour group yields NULL slope."""
    from layout_analysis_ray.functions.stats import events_value_hour_cov_by_type

    ts = pd.Timestamp
    sf = _write_events(
        tmp_path,
        [
            # 'down': value falls as hour rises -> negative cov
            (ts("2024-01-01 01:00"), "down", 10.0),
            (ts("2024-01-01 05:00"), "down", 2.0),
            (ts("2024-01-01 23:30"), "down", -4.0),
            # 'flat': all in one hour -> den 0 -> NULL slope
            (ts("2024-01-01 07:01"), "flat", 1.0),
            (ts("2024-01-01 07:59"), "flat", 99.0),
            (None if False else ts("2024-01-02 07:30"), "flat", -5.0),
        ],
    )
    out = events_value_hour_cov_by_type(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.execute(
        """WITH v AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS x,
                             CAST(hour(ts) AS BIGINT) AS y
                      FROM events WHERE event_type IS NOT NULL),
           m AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                        SUM(x*y) AS sxy, SUM(y*y) AS syy FROM v GROUP BY 1)
           SELECT event_type, CAST(n AS BIGINT) AS n,
             CAST((n*sxy - sx*sy) * 1000000 // (n*n) AS BIGINT) AS cov_ppm,
             CASE WHEN n*syy - sy*sy = 0 THEN NULL
                  ELSE CAST((n*sxy - sx*sy) * 1000000 // (n*syy - sy*sy)
                            AS BIGINT) END AS slope_ppm
           FROM m ORDER BY event_type"""
    ).df()
    got = out.sort_values("event_type").reset_index(drop=True)
    want = want.sort_values("event_type").reset_index(drop=True)
    assert got["cov_ppm"].tolist() == want["cov_ppm"].astype(int).tolist()
    assert got.loc[got["event_type"] == "down", "cov_ppm"].iloc[0] < 0
    assert pd.isna(got.loc[got["event_type"] == "flat", "slope_ppm"]).all()
    pd.testing.assert_series_equal(
        got["slope_ppm"], want["slope_ppm"].astype("float64").astype(got["slope_ppm"].dtype),
        check_names=False,
    )


def test_mad_even_count_lower_middle(ray_session, tmp_path):
    """Even-count groups take the LOWER middle (exact-rank convention),
    both for the median and for the MAD."""
    from layout_analysis_ray.functions.quantiles import events_value_mad_by_type

    ts = pd.Timestamp("2024-01-01")
    sf = _write_events(
        tmp_path,
        [(ts, "a", v) for v in (1.0, 2.0, 7.0, 50.0)]  # med=2.00
        # |c-200|: 100,0,500,4800 -> sorted 0,100,500,4800 -> mad=100
        + [(ts, "b", 5.0)],  # singleton: med=500, mad=0
    )
    out = events_value_mad_by_type(sf).to_pandas().set_index("event_type")
    assert out.loc["a", "median_cents"] == 200
    assert out.loc["a", "mad_cents"] == 100
    assert out.loc["b", "median_cents"] == 500
    assert out.loc["b", "mad_cents"] == 0


def test_lm_quality_bruteforce(ray_session, tmp_path):
    """Byte-bigram LM score vs a dict-based brute force on a corpus with
    empty, 1-char, repeated-pattern and unique-gibberish docs — including
    the model-training pass (pair counts must not cross doc boundaries)."""
    from layout_analysis_ray.functions.text import lm_quality

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat"),
        (3, ""),
        (4, "x"),
        (5, "qzqzqzqz"),
        (6, "the mat on the cat"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = (
        lm_quality(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    big: dict[tuple[str, str], int] = {}
    pre: dict[str, int] = {}
    for _id, t in rows:
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            pre[a] = pre.get(a, 0) + 1
    exp = []
    for _id, t in rows:
        if len(t) < 2:
            continue
        ps = [big[(a, b)] * 1_000_000 // pre[a] for a, b in zip(t, t[1:])]
        exp.append((_id, len(ps), sum(ps) // len(ps)))
    assert list(map(tuple, got.itertuples(index=False))) == exp


def test_lm_quality_flags_gibberish(ray_session):
    """Semantic gate on the real corpus: a doc of uniform-random characters
    must score far below the corpus median (the filter's whole point)."""
    import pyarrow.parquet as pq_

    from layout_analysis_ray.functions.text import lm_bigram_model, _byte_pairs

    sf = "/root/testdata/sf0.001"
    p_ppm = lm_bigram_model(sf)

    def score(text: str) -> int:
        codes, _s, _n = _byte_pairs(pa.array([text], pa.string()))
        return int(p_ppm[codes].sum() // len(codes))

    texts = pq_.read_table(f"{sf}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    corpus_scores = sorted(score(t) for t in texts if len(t) >= 2)
    median = corpus_scores[len(corpus_scores) // 2]
    rng = np.random.default_rng(5)
    gibberish = "".join(chr(c) for c in rng.integers(33, 127, 400))
    assert score(gibberish) < median // 5


def test_chunk_documents_bruteforce(ray_session, tmp_path):
    """Overlapping token windows vs a per-doc Python brute force: exact
    starts/lengths/hashes, including a 0-token doc (no chunks), a doc
    shorter than one window, one exactly at a stride boundary, and one
    spanning several windows."""
    import hashlib
    import re

    from layout_analysis_ray.functions.text import (
        CHUNK_STRIDE,
        CHUNK_TOKS,
        chunk_documents,
    )

    rows = [
        (1, "  ...  "),
        (2, "one two three"),
        (3, " ".join(f"tok{i}" for i in range(CHUNK_STRIDE))),
        (4, " ".join(f"w{i % 7}x{i}" for i in range(3 * CHUNK_STRIDE + 5))),
    ]
    sf = _write_docs(tmp_path, rows)
    got = (
        chunk_documents(sf)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    exp = []
    for _id, t in rows:
        toks = re.findall("[a-z0-9]+", t.lower())
        s = 0
        while s < len(toks):
            w = toks[s : s + CHUNK_TOKS]
            exp.append(
                (
                    _id,
                    s // CHUNK_STRIDE,
                    s,
                    len(w),
                    hashlib.md5(" ".join(w).encode()).hexdigest(),
                )
            )
            s += CHUNK_STRIDE
    assert list(map(tuple, got.itertuples(index=False))) == exp
    # overlap invariant: consecutive chunks of doc 4 share CHUNK_TOKS -
    # CHUNK_STRIDE token positions
    d4 = got[got.doc_id == 4]
    assert len(d4) == 4 and d4.n_toks.iloc[0] == CHUNK_TOKS


def test_lm_ppl_buckets_planted(ray_session, tmp_path):
    """CCNet split on a planted two-lang corpus: per-lang exact tercile
    boundaries with the value-boundary tie convention (every doc tied on
    a boundary value shares the lower bucket)."""
    import pyarrow.parquet as pq_

    from layout_analysis_ray.functions.text import lm_ppl_buckets

    rows = []
    # lang A: 6 clean english-ish docs + 3 gibberish ones
    for i, t in enumerate(
        ["the cat sat on the mat", "the mat sat on the cat",
         "the cat and the mat", "a cat sat", "the cat sat", "a mat on a cat",
         "zqxj vwpk qzqz", "xjzq wkpv zzqq", "qqzz jxqv pkwv"]
    ):
        rows.append((i, t, "en"))
    # lang B: 4 identical docs -> all scores tie -> b1 == b2 == score ->
    # every doc is 'tail' (nothing strictly above a boundary)
    for i in range(4):
        rows.append((100 + i, "bon jour bon jour", "fr"))
    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = lm_ppl_buckets(str(tmp_path)).to_pandas()
    fr = got[got.lang == "fr"]
    assert len(fr) == 4 and set(fr.bucket) == {"tail"}
    en = got[got.lang == "en"].sort_values("lm_score_ppm")
    # gibberish docs must land in tail, the cleanest docs in head
    gib = en[en.doc_id.isin([6, 7, 8])]
    assert set(gib.bucket) == {"tail"}
    assert "head" in set(en.bucket)
    # value-boundary convention: bucket is monotone in score
    order = {"tail": 0, "middle": 1, "head": 2}
    tiers = en.bucket.map(order).to_numpy()
    assert (np.diff(tiers) >= 0).all()


def test_hashed_features_bruteforce(ray_session, tmp_path):
    """Hashing-trick featurizer vs a per-doc Python brute force, including
    bucket collisions (counts add) and an empty doc (no rows)."""
    import hashlib

    from layout_analysis_ray.functions.text import (
        FEATURE_HASH_DIM,
        hashed_features,
    )

    rows = [(1, "the cat the cat sat"), (2, ""), (3, "a b c a")]
    sf = _write_docs(tmp_path, rows)
    got = (
        hashed_features(sf)
        .to_pandas()
        .sort_values(["doc_id", "feat_idx"])
        .reset_index(drop=True)
    )

    def bucket(w):
        return (
            int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big") >> 4
        ) % FEATURE_HASH_DIM

    exp = {}
    for _id, t in rows:
        for w in t.split():
            k = (_id, bucket(w))
            exp[k] = exp.get(k, 0) + 1
    assert (
        sorted(map(tuple, got.itertuples(index=False)))
        == sorted((d, f, c) for (d, f), c in exp.items())
    )
    # total feature mass == total tokens
    assert got.cnt.sum() == sum(len(t.split()) for _, t in rows)


def test_corpus_filter_funnel_planted(ray_session, tmp_path):
    """Funnel on a planted corpus: an untokenizable doc drops at stage 1,
    a hyper-repetitive doc at stage 2, and exact duplicates collapse to
    one class at stage 3."""
    from layout_analysis_ray.pipelines.corpus import (
        corpus_filter_funnel_gopher,
    )

    rows = [
        (1, "  !!!  "),                      # no tokens -> drops at s1
        (2, "spam " * 50),                   # top-token 100% -> drops at s2
        (3, "the quick brown fox jumps"),
        (4, "the quick brown fox jumps"),    # exact dup of 3
        (5, "a different clean document with many more unique words"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = corpus_filter_funnel_gopher(sf).to_pandas()
    assert list(map(tuple, got.itertuples(index=False))) == [
        (0, 5),
        (1, 4),
        (2, 3),
        (3, 2),
    ]


def test_chunk_and_features_empty_corpus_schemas(ray_session, tmp_path):
    """An all-punctuation corpus yields ZERO chunks / features but the
    Dataset schemas survive (the map UDF runs on non-empty input blocks
    and returns typed empty tables)."""
    from layout_analysis_ray.functions.text import (
        chunk_documents,
        hashed_features,
    )

    sf = _write_docs(tmp_path, [(1, " .!? "), (2, "---")])
    ds = chunk_documents(sf)
    assert ds.count() == 0
    assert ds.schema().names == [
        "doc_id", "chunk_idx", "start_tok", "n_toks", "chunk_hash",
    ]
    ds = hashed_features(sf)
    assert ds.count() == 0
    assert ds.schema().names == ["doc_id", "feat_idx", "cnt"]
