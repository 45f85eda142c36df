"""Ingest-time schema validation (SURVEY.md §1.2: the reference's implicit
filename/tuple conventions made explicit and CHECKED).

``validate_docs`` is a passthrough ``map_batches`` stage: it streams, costs
one cheap per-batch check, and fails FAST with a precise message instead of
letting a malformed table produce garbage three stages later (the reference
would silently mis-join on filename conventions,
``/root/reference/src/detect_paragraphs_separators.py:73-74``).
"""

from __future__ import annotations

import pyarrow as pa

from .synth import DOCS_SCHEMA


class SchemaValidationError(ValueError):
    pass


def _check_batch(batch: pa.Table) -> pa.Table:
    if batch.schema != DOCS_SCHEMA:
        raise SchemaValidationError(
            f"docs table schema mismatch:\n  got      {batch.schema}\n"
            f"  expected {DOCS_SCHEMA}"
        )
    if batch.column("doc_id").null_count:
        raise SchemaValidationError("doc_id contains nulls")
    ids = batch.column("doc_id")
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    import pyarrow.compute as pc

    if pc.any(pc.equal(ids, "")).as_py():
        raise SchemaValidationError("doc_id contains empty strings")
    return batch


def validate_docs(ds):
    """Passthrough stage raising ``SchemaValidationError`` on the first
    malformed batch (exact schema, non-null / non-empty doc_id)."""
    return ds.map_batches(_check_batch, batch_format="pyarrow")
