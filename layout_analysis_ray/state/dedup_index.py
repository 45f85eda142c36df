"""Shared mutable dedup index: hash-sharded set actors for INCREMENTAL
exact dedup across pipeline runs.

This is the engine's one deliberate use of raw ``@ray.remote`` actors
(custom-operator tier (c)): every batch dedup in the engine is a
``groupby(content_hash)`` aggregate, but "which hashes did any PREVIOUS
ingest see" is state that must outlive a Dataset execution and be
consulted mid-stream by every task — a shared mutable index the Dataset
API cannot express.  Reference analogue: the processed-page ledger the
reference keeps between runs (``/root/reference/src/DocumentAnalyzer.py``
skip-existing loop), generalized to content identity.

Design for 100 TB:

- The index is ``num_shards`` actors, each owning a disjoint slice of
  hash space (deterministic ``pd.util.hash_array`` routing — never
  Python ``hash()``).  Membership is a Python set per shard: C-level
  lookups, one actor call per (shard, batch), thousands of hashes per
  call.  At 10^10 unique docs and 256 shards each shard holds ~40M
  32-byte keys (~2.5 GB) — size ``num_shards`` to the corpus, the
  routing is stable for any count.
- Shards take ``num_cpus=0``: they are memory residents that answer
  sub-millisecond set probes; reserving cores would starve the map
  stages (CLAUDE.md actor-pool headroom invariant).
- Correctness under concurrency: ``ingest`` FIRST collapses the
  increment to one row per hash (the same Min/Count aggregate as
  ``dedup_exact``), so each hash reaches its shard exactly once and
  ``check_and_add`` (atomic per actor call) cannot race with itself.
  Keeper choice is therefore MIN doc_id within the increment —
  deterministic, oracle-matched.
- Idempotent under replay: the shards record the EPOCH (ingest number)
  a hash was first admitted, and a probe answers "first admitted in the
  caller's epoch?".  A Ray task retry after a lost worker, or a second
  consumption of the lazy Dataset ``ingest`` returns, re-probes the same
  (hash, epoch) pairs and gets the identical verdicts instead of
  silently dropping every row (set semantics would answer False on
  replay).  Costs a dict value per key (~8 bytes over a plain set).
  Increments must still be drained sequentially — epoch N's verdicts
  are only stable once no epoch<N work is in flight.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_SHARDS = 8


class _IndexShard:
    """One hash-space slice: content-hash hex string -> first epoch."""

    def __init__(self) -> None:
        self._seen: dict[str, int] = {}

    def check_and_add(self, hashes: list[str], epoch: int) -> list[bool]:
        """For each hash: True when first admitted in ``epoch`` (now or
        by an earlier replay of the same epoch).  Atomic per call (actor
        method calls serialize); first epoch wins, so replaying a lost
        task or re-consuming an ingest Dataset repeats the verdicts."""
        seen = self._seen
        return [seen.setdefault(h, epoch) == epoch for h in hashes]

    def size(self) -> int:
        return len(self._seen)


def _shard_of(hashes: np.ndarray, num_shards: int) -> np.ndarray:
    """Deterministic, process-independent shard routing (pandas C hash —
    the engine-wide 'never Python hash()' rule)."""
    return (pd.util.hash_array(hashes) % num_shards).astype(np.int64)


class DedupIndex:
    """Sharded membership index with an incremental-ingest operator.

    ``ingest(ds)`` takes a Dataset bearing ``(doc_id, text)``, keeps the
    min-doc_id representative of each content hash WITHIN the increment,
    drops every hash any earlier ingest recorded, records the survivors,
    and returns them as ``(content_hash, doc_id, n_dups)`` — n_dups
    counts occurrences inside this increment.  The index lives in the
    shard actors, so a second ``ingest`` on the same ``DedupIndex`` sees
    everything the first one admitted.
    """

    def __init__(self, num_shards: int = DEFAULT_SHARDS) -> None:
        import ray

        self._num_shards = num_shards
        self._epoch = 0
        shard_cls = ray.remote(_IndexShard)
        self._shards = [
            shard_cls.options(num_cpus=0).remote() for _ in range(num_shards)
        ]

    def sizes(self) -> list[int]:
        import ray

        return ray.get([s.size.remote() for s in self._shards])

    def ingest(self, ds):
        """Increment dedup (one shuffle, same shape as ``dedup_exact``)
        then a streaming check-and-add against the shared shards."""
        from ray.data.aggregate import Count, Min

        from ..functions.dedup import exact_hash_batch

        handles = list(self._shards)
        nsh = self._num_shards
        self._epoch += 1
        epoch = self._epoch

        agg = (
            ds.map_batches(exact_hash_batch, batch_format="pyarrow")
            .groupby("content_hash")
            .aggregate(Min("doc_id"), Count())
        )

        def check(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            import ray

            h = batch["content_hash"].to_numpy(zero_copy_only=False)
            n = len(h)
            out = pa.table(
                {
                    "content_hash": batch["content_hash"],
                    "doc_id": pc.cast(batch["min(doc_id)"], pa.int64()),
                    "n_dups": pc.cast(batch["count()"], pa.int64()),
                }
            )
            if n == 0:
                return out
            shard = _shard_of(h, nsh)
            order = np.argsort(shard, kind="stable")
            bounds = np.searchsorted(shard[order], np.arange(nsh + 1))
            refs, spans = [], []
            for s in range(nsh):
                lo, hi = bounds[s], bounds[s + 1]
                if lo == hi:
                    continue
                idx = order[lo:hi]
                refs.append(
                    handles[s].check_and_add.remote(h[idx].tolist(), epoch)
                )
                spans.append(idx)
            keep = np.zeros(n, dtype=bool)
            for idx, new_mask in zip(spans, ray.get(refs)):
                keep[idx] = new_mask
            return out.filter(pa.array(keep))

        return agg.map_batches(check, batch_format="pyarrow")


def dedup_incremental_ingest(sf_dir: str, num_shards: int = DEFAULT_SHARDS):
    """Two-increment demonstration over the documents table: 'day 1' is
    the docs whose id-hash bucket digit is < 8 (the ``split_hash_buckets``
    convention), 'day 2' the rest.  Day 1 builds the index; the returned
    Dataset is day 2's ingest — rows whose content no earlier increment
    saw, keeper = min doc_id within day 2.  SQL-oracle-matched."""
    import pyarrow.compute as pc

    from ..functions.dedup import _read_docs
    from ..functions.hashing import id_bucket_digit

    def day_filter(first_half: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            digit = id_bucket_digit(ids)
            mask = digit < 8 if first_half else digit >= 8
            return batch.filter(pa.array(mask))

        return f

    index = DedupIndex(num_shards)
    day1 = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        day_filter(True), batch_format="pyarrow"
    )
    # drain increment 1 fully before increment 2 begins (at 100 TB this
    # is "yesterday's run"); count() is the cheapest full consume
    index.ingest(day1).count()

    day2 = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        day_filter(False), batch_format="pyarrow"
    )
    return index.ingest(day2)
