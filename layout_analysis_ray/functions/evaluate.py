"""Extraction evaluation metrics (test-harness parity with the reference).

Reference analogues:
- ``best_dice`` / ``symmetric_best_dice`` over rasterized regions
  (``/root/reference/src/HelperMethods.py:69-92``) -> span-multiset dice per
  document (empty-vs-empty = 1, empty-vs-nonempty = 0, matching the
  reference's conventions at ``HelperMethods.py:71-75``).
- ``pixel_accuracy`` (``/root/reference/src/HelperMethods.py:48-51``) ->
  positional span accuracy (equal spans at equal positions / max length).
- corpus mean accuracy (``/root/reference/src/evaluate_results.py:61-84``,
  ``HelperMethods.py:167-186``) -> ``Mean`` aggregate over the per-doc rows.

Ray-native shape: tag the two sides, union, one coarse doc-hash shuffle
(~64 partitions), per-doc metrics computed for a whole partition in one
call (no driver-side loops, no per-doc map_groups call), then a tiny
``Mean`` aggregate.  Unmatched doc_ids score 0 (the reference's semi-join
silently DROPS them — ``HelperMethods.py:176-177``; we keep them visible
instead, strictly stricter).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa


def _span_key(s: dict) -> tuple:
    return (s["kind"], s["text"], s["media_ref"])


def _dice(a: list[dict], b: list[dict]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    ca, cb = Counter(map(_span_key, a)), Counter(map(_span_key, b))
    inter = sum((ca & cb).values())
    return 2.0 * inter / (len(a) + len(b))


def _positional_accuracy(a: list[dict], b: list[dict]) -> float:
    if not a and not b:
        return 1.0
    n = max(len(a), len(b))
    eq = sum(
        1
        for x, y in zip(a, b)
        if _span_key(x) == _span_key(y) and x["offset"] == y["offset"]
    )
    return eq / n


def _eval_part(part: pa.Table) -> pa.Table:
    """Per-doc metrics for every doc in one coarse partition (doc-grain
    Python is inherent to the span-multiset metrics; what this avoids is
    one map_groups interpreter call per document)."""
    sides: dict[str, list] = {}
    for r in part.to_pylist():
        ab = sides.setdefault(r["doc_id"], [[], []])
        ab[0 if r["side"] == "a" else 1] = r["spans"] or []
    ids, dices, poss, exacts = [], [], [], []
    for doc_id in sorted(sides):
        a, b = sides[doc_id]
        ids.append(doc_id)
        dices.append(_dice(a, b))
        poss.append(_positional_accuracy(a, b))
        exacts.append(
            len(a) == len(b)
            and all(
                _span_key(x) == _span_key(y) and x["offset"] == y["offset"]
                for x, y in zip(a, b)
            )
        )
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "dice": pa.array(dices, pa.float64()),
            "positional_accuracy": pa.array(poss, pa.float64()),
            "exact": pa.array(exacts),
        }
    )


def evaluate_extraction(ds_a, ds_b):
    """Per-doc (dice, positional_accuracy, exact) between two doc-grain
    datasets ``(doc_id, spans)``."""

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "side", pa.array([side] * batch.num_rows, pa.string())
            )

        fn.__name__ = f"tag_{side}"
        return fn

    def add_part(batch: pa.Table) -> pa.Table:
        import zlib

        return batch.append_column(
            "__dpart",
            pa.array(
                [zlib.crc32(d.encode()) % 64 for d in batch["doc_id"].to_pylist()],
                pa.int64(),
            ),
        )

    both = (
        ds_a.map_batches(tag("a"), batch_format="pyarrow")
        .union(ds_b.map_batches(tag("b"), batch_format="pyarrow"))
        .map_batches(add_part, batch_format="pyarrow")
    )
    return both.groupby("__dpart").map_groups(
        lambda g: _eval_part(g.drop_columns(["__dpart"])), batch_format="pyarrow"
    )


def corpus_summary(eval_ds) -> dict:
    """Corpus roll-up (the reference's ``acc.txt`` mean —
    ``evaluate_results.py:82-84``)."""
    from ray.data.aggregate import Count, Mean, Sum

    row = eval_ds.aggregate(
        Mean("dice"),
        Mean("positional_accuracy"),
        Sum("exact"),
        Count(),
    )
    return {
        "mean_dice": row["mean(dice)"],
        "mean_positional_accuracy": row["mean(positional_accuracy)"],
        "n_exact": int(row["sum(exact)"]),
        "n_docs": int(row["count()"]),
    }


def eval_skew_vs_happy(sf_dir: str):
    """Distributed self-check: the skew pipeline vs the happy path must be
    exactly equal doc-for-doc (dice 1.0 everywhere)."""
    from ..pipelines.extract import extract_pipeline
    from ..sources.synth import docs_from_parquet
    from ..stages.skew import extract_pipeline_skew

    a = extract_pipeline(docs_from_parquet(sf_dir))
    b = extract_pipeline_skew(docs_from_parquet(sf_dir))
    return evaluate_extraction(a, b)
