"""The flagship extraction pipeline (SURVEY.md §7.1).

    read (Lance/Parquet, doc-grain)
      -> map_batches(SpanScorer, concurrency=...)   # stateful actor pool
      -> map_batches(assemble_batch)                # stateless block/order/emit
      [-> explode to span grain | write with lineage manifests]

Everything streams: no stage materializes the dataset, ordering is per-doc
(computed inside the map fns), and the happy path needs **no shuffle at all**
because each document's spans live in one row (SURVEY.md §7.1).  Batch format
is pyarrow end-to-end (zero-copy from the object store).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.assemble import assemble_batch
from ..stages.score import SpanScorer

# Default knobs; callers override per deployment.  batch_size is rows (docs):
# ~512 docs x ~10 spans x ~200 B ≈ 1 MiB per batch — small enough that
# media-heavy skew can't blow a worker heap, large enough to amortize
# per-batch overhead.  concurrency bounds the scorer actor pool.
DEFAULT_BATCH_SIZE = 512
DEFAULT_CONCURRENCY = (1, 8)


def scorer_pool_size(num_cpus: int) -> int:
    """Scorer actor count for a node with ``num_cpus``: ~7/16 of the CPUs
    (round-2 sweep at 16 CPUs: pool 7 -> 118k docs/s vs 101k@5 / 107k@9 /
    75k@11; at 32 CPUs pool 14 beats 12), always leaving headroom so task
    ops never starve (a pool == num_cpus deadlocks the pipeline).

    Raises on ``num_cpus <= 1``: a single-CPU session cannot host the actor
    pool AND the read/assemble/write tasks — the max(1, ...) clamp would
    otherwise silently return a pool equal to the CPU count, the exact
    deadlock this function exists to prevent."""
    if num_cpus <= 1:
        raise ValueError(
            "extract needs >= 2 CPUs: a 1-CPU session cannot run the scorer "
            "actor pool alongside read/assemble/write tasks (deadlock)"
        )
    return max(1, min(round(num_cpus * 7 / 16), num_cpus - 1))


def extract_pipeline(
    docs,
    *,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency=DEFAULT_CONCURRENCY,
    order_strategy: str = "xycut",
    model_weights: str | None = None,
):
    """docs: Ray Dataset of (doc_id, spans) -> Dataset of extracted (doc_id, spans).

    ``order_strategy`` selects the pluggable block-ordering strategy
    (``stages.strategies`` registry) — the §2.10 swap surface; "xycut" is
    the conformance default the oracle pins.  ``model_weights`` swaps the
    heuristic html content rule for a logistic model loaded once per scorer
    actor (see ``SpanScorer``)."""
    import functools

    from ..stages.strategies import get_strategy

    kwargs = {}
    if model_weights is not None:
        kwargs["fn_constructor_kwargs"] = {"model_weights": model_weights}
    scored = docs.map_batches(
        SpanScorer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        **kwargs,
    )
    return scored.map_batches(
        functools.partial(assemble_batch, order_fn=get_strategy(order_strategy)),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def explode_batch(batch: pa.Table) -> pa.Table:
    """Doc-grain (doc_id, spans) -> span-grain (doc_id, kind, text, media_ref, offset)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    lengths = pc.fill_null(pc.list_value_length(spans), 0)
    doc_id = pc.list_parent_indices(spans)
    ids = batch.column("doc_id").combine_chunks() if isinstance(
        batch.column("doc_id"), pa.ChunkedArray
    ) else batch.column("doc_id")
    flat = pc.list_flatten(spans)
    return pa.table(
        {
            "doc_id": ids.take(doc_id),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
        }
    )


def explode(ds):
    return ds.map_batches(explode_batch, batch_format="pyarrow", zero_copy_batch=True)
