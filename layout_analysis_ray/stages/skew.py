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
    """Doc rows -> chunk rows (doc_id, chunk_id, n_chunks, spans).

    Non-giant rows (the overwhelming majority) pass through as a zero-copy
    Arrow ``filter`` — no Python materialization.  Only the giant minority is
    exploded, and that via ``ListArray`` offset surgery over the flattened
    values (``take`` + vectorized chunk offsets), never ``to_pylist``.
    Null span lists ride through untouched (the scorer treats null == []).
    """
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    doc_ids = batch.column("doc_id")
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    lengths = np.asarray(
        pc.fill_null(pc.list_value_length(spans), 0).to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    giant = lengths > max_spans

    # --- zero-copy passthrough for the non-giant rows --------------------
    small_mask = pa.array(~giant)
    small_ids = doc_ids.filter(small_mask)
    small_spans = spans.filter(small_mask)
    n_small = len(small_ids)
    small_tbl = pa.table(
        {
            "doc_id": small_ids,
            "chunk_id": pa.nulls(n_small, pa.int32()).fill_null(0),
            "n_chunks": pa.nulls(n_small, pa.int32()).fill_null(1),
            "spans": small_spans,
        }
    )
    g_idx = np.nonzero(giant)[0]
    if not g_idx.size:
        return small_tbl

    # --- explode giants via offset surgery (no per-span Python) ----------
    giant_spans = spans.take(pa.array(g_idx))
    flat = pc.list_flatten(giant_spans)  # values of giant rows, contiguous
    glens = lengths[g_idx]
    nch = (glens + max_spans - 1) // max_spans
    total_chunks = int(nch.sum())
    row_rep = np.repeat(np.arange(g_idx.size), nch)
    chunk_in_row = (
        np.arange(total_chunks) - np.repeat(np.cumsum(nch) - nch, nch)
    ).astype(np.int64)
    row_base = np.concatenate([[0], np.cumsum(glens)[:-1]])
    starts = row_base[row_rep] + chunk_in_row * max_spans
    # consecutive chunks tile the flat values exactly: chunk i's end is
    # chunk i+1's start (row ends meet the next row's base), so the offsets
    # vector is just `starts` plus the final end.
    offsets = np.append(starts, len(flat))
    giant_tbl = pa.table(
        {
            "doc_id": doc_ids.take(pa.array(g_idx[row_rep])),
            "chunk_id": pa.array(chunk_in_row, pa.int32()),
            "n_chunks": pa.array(nch[row_rep], pa.int32()),
            "spans": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), flat
            ).cast(batch.schema.field("spans").type),
        }
    )
    return pa.concat_tables([small_tbl, giant_tbl]).combine_chunks()


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
