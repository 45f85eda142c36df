"""Line-level global dedup (C4-style): both tiers must agree with each
other and with planted first-occurrence semantics, and degenerate corpora
must keep the typed output schema."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _norm(df):
    return df.sort_values("doc_id").reset_index(drop=True)


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


def test_dedup_lines_tiers_agree(ray_session):
    from layout_analysis_ray.functions.dedup import dedup_lines

    broad = _norm(dedup_lines(SF).to_pandas())
    dist = _norm(dedup_lines(SF, broadcast_max_chunks=-1).to_pandas())
    pd.testing.assert_frame_equal(broad, dist)
    assert len(broad) == 500
    # the corpus genuinely contains repeated 16-token chunks
    assert (broad["n_kept"] < broad["n_chunks"]).any()
    assert (broad["n_kept"] == broad["n_chunks"]).any()


def test_dedup_lines_planted(ray_session, tmp_path):
    """First-occurrence-wins over planted chunks: an exact-copy doc is
    fully deduped (kept row with empty text), a doc sharing only its
    first chunk keeps the rest, short docs are their own chunk, and
    empty docs emit nothing."""
    from layout_analysis_ray.functions.dedup import dedup_lines

    a = " ".join(f"a{i}" for i in range(16))
    b = " ".join(f"b{i}" for i in range(16))
    sf = _write_docs(
        tmp_path,
        [
            (1, a),
            (2, a + " " + b),  # chunk a duplicates doc 1 -> keeps only b
            (3, a),  # full duplicate of doc 1 -> n_kept 0, text ''
            (4, "tiny doc"),  # single short chunk, unique -> kept
            (5, ""),  # zero tokens -> no output row
        ],
    )
    for kw in ({}, {"broadcast_max_chunks": -1}):
        out = _norm(dedup_lines(sf, **kw).to_pandas())
        assert list(out["doc_id"]) == [1, 2, 3, 4], kw
        assert list(out["n_chunks"]) == [1, 2, 1, 1], kw
        assert list(out["n_kept"]) == [1, 1, 0, 1], kw
        assert list(out["text_clean"]) == [a, b, "", "tiny doc"], kw


def test_dedup_lines_degenerate_keeps_schema(ray_session, tmp_path):
    from layout_analysis_ray.functions.dedup import dedup_lines

    sf = _write_docs(tmp_path, [(1, ""), (2, None), (3, "   ")])
    for kw in ({}, {"broadcast_max_chunks": -1}):
        out = dedup_lines(sf, **kw).to_pandas()
        assert len(out) == 0, kw
        assert list(out.columns) == ["doc_id", "n_chunks", "n_kept", "text_clean"], kw
        assert out["doc_id"].dtype == "int64" and out["text_clean"].dtype == object, kw


def test_dedup_lines_pack_guard(ray_session, tmp_path):
    """doc_id outside the packing range must fail loudly, not silently
    collide."""
    from layout_analysis_ray.functions.dedup import dedup_lines

    sf = _write_docs(tmp_path, [(1 << 43, "alpha beta")])
    with pytest.raises(Exception):
        dedup_lines(sf).to_pandas()


def test_dedup_editdistance_tiers_agree_and_degenerate(ray_session, tmp_path):
    """Broadcast pre-filter tier and full-shuffle fallback must produce
    identical pair sets; an empty corpus returns the typed empty table."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.dedup import dedup_editdistance_pairs

    sf = "/root/testdata/sf0.001"
    cols = ["doc_a", "doc_b", "edit_dist"]
    a = dedup_editdistance_pairs(sf).to_pandas().sort_values(cols).reset_index(drop=True)
    b = (
        dedup_editdistance_pairs(sf, broadcast_max_keys=0)
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(a) == 8  # planted near-dup pairs at sf0.001
    assert (a["doc_a"] < a["doc_b"]).all()

    empty = tmp_path / "empty"
    empty.mkdir()
    pq.write_table(
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ).empty_table(),
        str(empty / "documents.parquet"),
    )
    out = dedup_editdistance_pairs(str(empty))
    assert out.count() == 0
    assert out.schema().names == cols


def test_corpus_filter_funnel_shape_and_empty(ray_session, tmp_path):
    """Funnel counts are monotone non-increasing through the cascade and
    an empty corpus yields the typed 5-row zero report."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from layout_analysis_ray.pipelines.corpus import (
        FUNNEL_STAGES,
        corpus_filter_funnel,
    )

    t = corpus_filter_funnel("/root/testdata/sf0.001").to_pandas()
    assert list(t["stage"]) == list(FUNNEL_STAGES)
    n = t["n_docs"].tolist()
    assert n[0] == 500 and all(a >= b for a, b in zip(n, n[1:]))
    assert n[4] > 0  # some unique survivors

    empty = tmp_path / "empty"
    empty.mkdir()
    pq.write_table(
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ).empty_table(),
        str(empty / "documents.parquet"),
    )
    t0 = corpus_filter_funnel(str(empty)).to_pandas()
    assert list(t0["stage"]) == list(FUNNEL_STAGES)
    assert t0["n_docs"].tolist() == [0, 0, 0, 0, 0]


def _norm_spans(df):
    return df.sort_values(["doc_id", "span_start"]).reset_index(drop=True)


def test_dedup_substring_spans_tiers_agree(ray_session):
    from layout_analysis_ray.functions.dedup import dedup_substring_spans

    broad = _norm_spans(dedup_substring_spans(SF).to_pandas())
    dist = _norm_spans(
        dedup_substring_spans(SF, broadcast_max_keys=-1).to_pandas()
    )
    pd.testing.assert_frame_equal(broad, dist)
    # the corpus genuinely contains cross-doc repeated 5-grams
    assert len(broad) > 0
    assert (broad["span_end"] >= broad["span_start"] + 4).all()


def test_dedup_substring_spans_planted(ray_session, tmp_path):
    """Planted duplicate substrings: a 5-gram shared by two docs marks
    exactly its covered token range in both; overlapping hot grams merge
    into one maximal span; a within-doc-only repeat is NOT hot (distinct
    doc count, not occurrences); unique docs emit nothing."""
    from layout_analysis_ray.functions.dedup import dedup_substring_spans

    shared = "alpha beta gamma delta epsilon"  # 5 tokens, in docs 1+2
    sf = _write_docs(
        tmp_path,
        [
            # tokens 1-3 unique, 4-8 shared -> span [4, 8]
            (1, "one two three " + shared),
            # 6 shared tokens: grams at pos 1 and 2 overlap -> span [1, 6]
            (2, shared + " zeta unique2 tail2"),
            (3, "totally different words with no overlap at all"),
            # the same 5-gram twice WITHIN one doc only: 1 distinct doc
            (4, "x1 x2 x3 x4 x5 pad x1 x2 x3 x4 x5"),
            (5, ""),
        ],
    )
    # doc 2's shared run is 5 tokens + "zeta"? no — only the 5 planted
    # tokens repeat, so its span is [1, 5]
    for kw in ({}, {"broadcast_max_keys": -1}):
        out = _norm_spans(dedup_substring_spans(sf, **kw).to_pandas())
        assert list(out["doc_id"]) == [1, 2], kw
        assert list(out["span_start"]) == [4, 1], kw
        assert list(out["span_end"]) == [8, 5], kw


def test_dedup_substring_spans_degenerate_keeps_schema(ray_session, tmp_path):
    from layout_analysis_ray.functions.dedup import dedup_substring_spans

    sf = _write_docs(tmp_path, [(1, "short text"), (2, "")])
    for kw in ({}, {"broadcast_max_keys": -1}):
        t = dedup_substring_spans(sf, **kw).to_pandas()
        assert list(t.columns) == ["doc_id", "span_start", "span_end"], kw
        assert len(t) == 0, kw


def test_doc_dup_span_stats_tiers_and_consistency(ray_session):
    """Both tiers agree; stats are consistent with dedup_substring_spans
    (per-doc dup_tokens == total covered span length); docs without dup
    spans appear with dup_tokens 0."""
    from layout_analysis_ray.functions.dedup import (
        dedup_substring_spans,
        doc_dup_span_stats,
    )

    broad = _norm(doc_dup_span_stats(SF).to_pandas())
    dist = _norm(doc_dup_span_stats(SF, broadcast_max_keys=-1).to_pandas())
    pd.testing.assert_frame_equal(broad, dist)
    assert (broad["dup_tokens"] <= broad["n_tokens"]).all()
    assert (broad["dup_tokens"] == 0).any() and (broad["dup_tokens"] > 0).any()

    spans = dedup_substring_spans(SF).to_pandas()
    spans["len"] = spans["span_end"] - spans["span_start"] + 1
    per_doc = spans.groupby("doc_id")["len"].sum()
    got = broad.set_index("doc_id")["dup_tokens"]
    assert (got.loc[per_doc.index] == per_doc).all()
    assert (got.drop(per_doc.index) == 0).all()


def test_doc_dup_span_stats_degenerate_keeps_schema(ray_session, tmp_path):
    """Zero-token corpora (empty / NULL / punctuation-only texts) emit no
    rows but keep the typed schema in both tiers."""
    from layout_analysis_ray.functions.dedup import doc_dup_span_stats

    sf = _write_docs(tmp_path, [(1, ""), (2, None), (3, "!!! ???")])
    for kw in ({}, {"broadcast_max_keys": -1}):
        t = doc_dup_span_stats(sf, **kw).to_pandas()
        assert list(t.columns) == [
            "doc_id",
            "n_tokens",
            "dup_tokens",
            "dup_ppm",
        ], kw
        assert len(t) == 0, kw
