"""Skew path: giant-doc chunk -> score -> salted-groupby reassembly must be
span-for-span identical to the happy (no-shuffle) path."""

from __future__ import annotations

import pyarrow as pa

from layout_analysis_ray.pipelines.extract import extract_pipeline
from layout_analysis_ray.sources.synth import DOCS_SCHEMA, gen_rows
from layout_analysis_ray.stages.skew import (
    extract_pipeline_skew,
    split_giant_batch,
)


def _giant_doc(doc_id: str, n_spans: int) -> dict:
    spans = []
    for i in range(n_spans):
        if i % 50 == 0:
            spans.append(
                {"kind": "html", "text": f"<h1>section {i}</h1>", "media_ref": "",
                 "offset": i}
            )
        elif i % 13 == 0:
            spans.append(
                {"kind": "image", "text": "", "media_ref": f"media://{doc_id}/{i}",
                 "offset": i}
            )
        else:
            spans.append(
                {"kind": "html",
                 "text": f"<p>stream layout engine span block {i} arrow batch "
                         f"shuffle actor pipeline parquet schema offset</p>",
                 "media_ref": "", "offset": i}
            )
    return {"doc_id": doc_id, "spans": spans}


def _corpus() -> pa.Table:
    rows = gen_rows(48)
    rows.append(_giant_doc("doc-giant-00", 5000))
    rows.append(_giant_doc("doc-giant-01", 3333))
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def _canon(ds) -> dict:
    out = {}
    for b in ds.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            out[r["doc_id"]] = tuple(
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in r["spans"]
            )
    return out


def test_split_preserves_everything():
    tbl = _corpus()
    chunks = split_giant_batch(tbl, max_spans=512)
    # every chunk of a small doc is whole; giant docs are split
    n_by_doc: dict[str, int] = {}
    for r in chunks.to_pylist():
        n_by_doc[r["doc_id"]] = n_by_doc.get(r["doc_id"], 0) + len(r["spans"])
    want = {r["doc_id"]: len(r["spans"]) for r in tbl.to_pylist()}
    assert n_by_doc == want
    giant = [r for r in chunks.to_pylist() if r["doc_id"] == "doc-giant-00"]
    assert len(giant) == 10  # 5000 / 512 -> 10 chunks
    assert all(r["n_chunks"] == 10 for r in giant)


def test_skew_pipeline_matches_happy_path(ray_session):
    import ray.data as rd

    tbl = _corpus()
    happy = _canon(extract_pipeline(rd.from_arrow(tbl)))
    skew = _canon(
        extract_pipeline_skew(rd.from_arrow(tbl), max_spans=512, concurrency=(1, 2))
    )
    assert skew == happy
    assert "doc-giant-00" in skew and len(skew["doc-giant-00"]) > 100
