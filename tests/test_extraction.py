"""Correctness gate: exact span-sequence equality engine vs oracle.

The Ray Data pipeline must reproduce the single-process oracle's output
(kind, text, media_ref, offset) for every document — strictly stronger than
the reference's Dice-tolerance evaluation (SURVEY.md §5).
"""

import pyarrow as pa
import pytest

from layout_analysis_ray import oracle
from layout_analysis_ray.pipelines.extract import explode_batch, extract_pipeline
from layout_analysis_ray.sources import synth
from layout_analysis_ray.stages.assemble import assemble_batch
from layout_analysis_ray.stages.score import SpanScorer

N_DOCS = 200


def _as_tuples(rows):
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in rows
    }


def _check_equal(golden: dict, got: dict):
    assert set(golden) == set(got)
    for doc_id, exp in golden.items():
        assert got[doc_id] == exp, f"span mismatch for {doc_id}"


def test_local_batch_matches_oracle():
    """The stage functions are pure: verify them without Ray first."""
    t = synth.gen_table(N_DOCS)
    out = assemble_batch(SpanScorer()(t))
    _check_equal(oracle.extract_table(t.to_pylist()), _as_tuples(out.to_pylist()))


def test_ray_pipeline_matches_oracle(ray_session):
    import ray.data as rd

    t = synth.gen_table(N_DOCS)
    ds = rd.from_arrow(t).repartition(8)  # force multi-block execution
    out = extract_pipeline(ds, batch_size=16, concurrency=2)
    got = _as_tuples(out.take_all())
    _check_equal(oracle.extract_table(t.to_pylist()), got)


def test_batching_invariance():
    """Same output regardless of how docs are batched together."""
    t = synth.gen_table(48)
    whole = _as_tuples(assemble_batch(SpanScorer()(t)).to_pylist())
    scorer = SpanScorer()
    pieces = []
    for lo in range(0, 48, 7):
        piece = t.slice(lo, 7)
        pieces.extend(assemble_batch(scorer(piece)).to_pylist())
    _check_equal(whole, _as_tuples(pieces))


def test_derived_from_testdata_matches_oracle(ray_session):
    docs = synth.docs_from_parquet("/root/testdata/sf0.001")
    raw_rows = docs.take_all()
    out = extract_pipeline(synth.docs_from_parquet("/root/testdata/sf0.001"))
    _check_equal(oracle.extract_table(raw_rows), _as_tuples(out.take_all()))


def test_unsorted_span_input():
    """Engine must sort spans by offset before assembly, like the oracle."""
    rows = synth.gen_rows(16)
    for r in rows:
        r["spans"] = list(reversed(r["spans"]))
    t = pa.Table.from_pylist(rows, schema=synth.DOCS_SCHEMA)
    out = assemble_batch(SpanScorer()(t))
    _check_equal(oracle.extract_table(rows), _as_tuples(out.to_pylist()))


def test_explode_schema():
    t = synth.gen_table(8)
    out = explode_batch(assemble_batch(SpanScorer()(t)))
    assert out.column_names == ["doc_id", "kind", "text", "media_ref", "offset"]
    kinds = set(out.column("kind").to_pylist())
    assert kinds <= {"title", "paragraph", "table", "figure", "image", "error"}


def test_poison_doc_quarantined():
    rows = [
        {
            "doc_id": "poison-1",
            "spans": [
                {"kind": "pdf_block", "text": '{"x0":0,"y0":0,"x1":500,"y1":500,"text":"ok"}', "media_ref": "", "offset": 0},
                {"kind": "pdf_block", "text": "not json at all", "media_ref": "", "offset": 1},
            ],
        }
    ]
    t = pa.Table.from_pylist(rows, schema=synth.DOCS_SCHEMA)
    out = assemble_batch(SpanScorer()(t)).to_pylist()
    assert len(out[0]["spans"]) == 1
    sp = out[0]["spans"][0]
    assert sp["kind"] == "error"
    assert "span_offset=1" in sp["text"]
    assert _as_tuples(out) == _as_tuples(
        [{"doc_id": "poison-1", "spans": [
            {"kind": k, "text": txt, "media_ref": m, "offset": o}
            for (k, txt, m, o) in oracle.extract_doc(rows[0]["spans"])]}]
    )


def test_empty_doc():
    rows = [{"doc_id": "empty", "spans": []}]
    t = pa.Table.from_pylist(rows, schema=synth.DOCS_SCHEMA)
    out = assemble_batch(SpanScorer()(t)).to_pylist()
    assert out[0]["spans"] == []
