"""Property-based oracle equivalence: for ANY random document (arbitrary
kinds, texts, offsets, media interleavings, malformed pdf payloads), the
batch engine path (SpanScorer -> assemble_batch, no Ray) must equal the
single-process oracle span for span.

This generalizes the fixture-family tests: hypothesis explores pathological
interleavings and payloads the families don't cover (empty texts, html
fragments, offset gaps/permutations, unicode, whitespace runs)."""

from __future__ import annotations

import json

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from layout_analysis_ray import oracle
from layout_analysis_ray.sources.synth import DOCS_SCHEMA
from layout_analysis_ray.stages.assemble import assemble_batch
from layout_analysis_ray.stages.score import SpanScorer

_WORDS = ["stream", "layout", "engine", "Privacy", "the", "Copyright", "ü€", ""]

_text = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30).map(" ".join)

_html_bits = st.sampled_from(
    [
        "<p>{}</p>",
        "<h1>{}</h1>",
        "<h2>{}</h2>",
        "<div class='nav'><a href='/'>{}</a></a></div>",
        "<hr/>",
        "<table><tr><td>{}</td></tr></table>",
        "{}",
        "<a href='#'>{}</a> {}",
        "< broken <tag {}",
    ]
)


@st.composite
def _html_text(draw):
    tpl = draw(_html_bits)
    words = draw(_text)
    return tpl.replace("{}", words)


@st.composite
def _pdf_payload(draw):
    if draw(st.booleans()):
        # well-formed block
        x0 = draw(st.floats(0, 1000, allow_nan=False))
        y0 = draw(st.floats(0, 1000, allow_nan=False))
        w = draw(st.floats(1, 1500, allow_nan=False))
        h = draw(st.floats(1, 1500, allow_nan=False))
        return json.dumps(
            {"x0": x0, "y0": y0, "x1": x0 + w, "y1": y0 + h, "text": draw(_text)}
        )
    # malformed (poison path)
    return draw(st.sampled_from(['{"x0": 1', "not json", '{"x0": 1, "y0": 2}', ""]))


@st.composite
def _span(draw, offset):
    kind = draw(
        st.sampled_from(["html", "text", "pdf_block", "image", "figure_ref"])
    )
    if kind in ("image", "figure_ref"):
        return {
            "kind": kind,
            "text": "",
            "media_ref": f"media://h/{draw(st.integers(0, 9))}",
            "offset": offset,
        }
    if kind == "pdf_block":
        return {"kind": kind, "text": draw(_pdf_payload()), "media_ref": "",
                "offset": offset}
    if kind == "html":
        return {"kind": kind, "text": draw(_html_text()), "media_ref": "",
                "offset": offset}
    return {"kind": kind, "text": draw(_text), "media_ref": "", "offset": offset}


@st.composite
def _doc(draw, idx=0):
    n = draw(st.integers(0, 12))
    # offsets: strictly increasing but with random gaps, then shuffled in
    # storage order (the engine must sort by offset itself)
    offs = sorted(draw(st.sets(st.integers(0, 100), min_size=n, max_size=n)))
    spans = [draw(_span(o)) for o in offs]
    perm = draw(st.permutations(range(len(spans))))
    return {"doc_id": f"prop-{idx}", "spans": [spans[i] for i in perm]}


def _engine(rows) -> dict:
    tbl = pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)
    out = assemble_batch(SpanScorer()(tbl))
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in out.to_pylist()
    }


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_engine_matches_oracle_on_random_docs(data):
    rows = [data.draw(_doc(i)) for i in range(data.draw(st.integers(1, 6)))]
    # make doc_ids unique (hypothesis may draw same idx template)
    for i, r in enumerate(rows):
        r["doc_id"] = f"prop-{i}"
    got = _engine(rows)
    for r in rows:
        want = oracle.extract_doc(r["spans"])
        assert got[r["doc_id"]] == want, (r["spans"], got[r["doc_id"]], want)


def _engine_skew(rows, max_spans=4) -> dict:
    """Simulate the skew pipeline without Ray: chunk -> score -> per-doc
    reassemble -> assemble.  max_spans=4 forces chunking on most docs."""
    import pyarrow.compute as pc

    from layout_analysis_ray.stages.skew import (
        reassemble_chunks,
        split_giant_batch,
    )

    tbl = pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)
    chunks = split_giant_batch(tbl, max_spans=max_spans)
    scored = SpanScorer()(chunks)
    merged = []
    for doc_id in set(scored.column("doc_id").to_pylist()):
        grp = scored.filter(pc.equal(scored.column("doc_id"), doc_id))
        merged.append(reassemble_chunks(grp))
    out = assemble_batch(pa.concat_tables(merged))
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in out.to_pylist()
    }


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_skew_path_matches_oracle_on_random_docs(data):
    rows = [data.draw(_doc(i)) for i in range(data.draw(st.integers(1, 4)))]
    for i, r in enumerate(rows):
        r["doc_id"] = f"prop-{i}"
    got = _engine_skew(rows)
    for r in rows:
        assert got[r["doc_id"]] == oracle.extract_doc(r["spans"])
