"""Skew machinery: giant-document splitting + salted groupby reassembly.

SURVEY.md §4 / §7.2 step 5 and the north rule's "skewed documents (giant
PDFs, media-heavy pages) handled by size-aware repartitioning and salted
groupby-aggregate shuffles keyed on doc_id".

The happy-path pipeline (``pipelines.extract.extract_pipeline``) keeps each
document inside one row and needs no shuffle; a single huge row simply
becomes its own task (``batch_size`` is a max, not a min).  That breaks down
when one document's spans exceed a worker's heap.  This variant:

1. ``split_giant_batch`` — documents with more than ``max_spans`` spans are
   exploded into chunk rows ``(doc_id, chunk_id, n_chunks, spans-slice)``;
   the chunk_id acts as the *salt*, spreading one hot doc_id across many
   blocks/tasks.
2. The stateful scorer runs chunk-parallel (scoring is span-local, so chunk
   boundaries cannot change any score — verified by the equality test).
3. ``groupby("doc_id").map_groups(reassemble)`` — the one shuffle, keyed on
   doc_id, merges the salted chunks back (chunk_id order) with their score
   columns still span-aligned.
4. Block formation/ordering (``assemble_batch``) then sees whole documents
   again, so the output is span-for-span identical to the happy path.

The reference has no analogue (it is single-process, one file per doc —
``/root/reference/src/detect_paragraphs.py:75-89``); this is pure
scale-out design.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .assemble import assemble_batch
from .score import SpanScorer

DEFAULT_MAX_SPANS = 2048


def split_giant_batch(batch: pa.Table, *, max_spans: int) -> pa.Table:
    """Doc rows -> chunk rows (doc_id, chunk_id, n_chunks, spans)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    lengths = np.asarray(
        pc.fill_null(pc.list_value_length(spans), 0).to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    ids = batch.column("doc_id").to_pylist()

    out_ids: list[str] = []
    out_chunk: list[int] = []
    out_nchunks: list[int] = []
    out_spans: list = []
    for r, (doc_id, n) in enumerate(zip(ids, lengths)):
        row_spans = spans[r]
        if n <= max_spans:
            out_ids.append(doc_id)
            out_chunk.append(0)
            out_nchunks.append(1)
            out_spans.append(row_spans.as_py() if row_spans.is_valid else [])
            continue
        vals = row_spans.values
        n_chunks = int((n + max_spans - 1) // max_spans)
        for c in range(n_chunks):
            lo = c * max_spans
            hi = min(int(n), lo + max_spans)
            out_ids.append(doc_id)
            out_chunk.append(c)
            out_nchunks.append(n_chunks)
            out_spans.append(vals.slice(lo, hi - lo).to_pylist())
    return pa.table(
        {
            "doc_id": pa.array(out_ids, pa.string()),
            "chunk_id": pa.array(out_chunk, pa.int32()),
            "n_chunks": pa.array(out_nchunks, pa.int32()),
            "spans": pa.array(out_spans, type=batch.schema.field("spans").type),
        }
    )


def _concat_list_column(col: pa.ChunkedArray | pa.Array) -> list:
    """All rows' list values concatenated (rows already in chunk order)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.list_flatten(col)


def reassemble_chunks(group: pa.Table) -> pa.Table:
    """map_groups fn: chunk rows of ONE doc_id -> one merged doc row.

    Concatenates ``spans`` and every ``span_*`` score column in chunk_id
    order, so scores stay positionally aligned with their spans.
    """
    group = group.sort_by("chunk_id")
    doc_id = group.column("doc_id")[0].as_py()
    names = []
    arrays = []
    for name in group.column_names:
        if name in ("doc_id", "chunk_id", "n_chunks"):
            continue
        flat = _concat_list_column(group.column(name))
        offsets = pa.array([0, len(flat)], pa.int32())
        names.append(name)
        arrays.append(pa.ListArray.from_arrays(offsets, flat))
    tbl = pa.table(
        {"doc_id": pa.array([doc_id], pa.string()), **dict(zip(names, arrays))}
    )
    return tbl


def extract_pipeline_skew(
    docs,
    *,
    max_spans: int = DEFAULT_MAX_SPANS,
    batch_size: int = 512,
    concurrency=(1, 8),
):
    """Skew-robust extraction: identical output to ``extract_pipeline``, but
    no single task ever holds more than ``max_spans`` spans of one document
    during the heavy scoring stage."""
    chunks = docs.map_batches(
        functools.partial(split_giant_batch, max_spans=max_spans),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    scored = chunks.map_batches(
        SpanScorer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    merged = scored.groupby("doc_id").map_groups(
        reassemble_chunks, batch_format="pyarrow"
    )
    return merged.map_batches(
        assemble_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
