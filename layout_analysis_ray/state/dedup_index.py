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


class NearDupIndex:
    """Band-sharded membership actors for INCREMENTAL near-dup
    (MinHash-LSH) dedup across ingests — the near-dup sibling of
    :class:`DedupIndex` (VERDICT r4 item 6): a pretraining crawl ingests
    day by day, and a new document must be dropped when it is a NEAR
    duplicate of anything any earlier increment admitted.

    ``ingest(ds)`` runs three stages:

    1. ONE corpus scan computes MinHash signatures and materializes a
       slim (doc_id, sig-bytes) table — band keys are cheap integer
       mixes of the signature, so later stages re-derive them from sig
       bytes instead of re-tokenizing the corpus (the dedup_lines
       triple-scan lesson, ADVICE r4).
    2. Intra-increment clustering: verified LSH pairs
       (``minhash_pairs_from_bands``) -> ``connected_components`` ->
       only each cluster's min-doc_id representative continues — the
       deterministic within-increment keeper choice, like the exact
       index's min-doc_id pre-group.
    3. Cross-increment probe+record: a representative keeps iff NONE of
       its band keys was recorded by an EARLIER epoch.  The shard
       verdict ("first admitted in the caller's epoch", ``setdefault``)
       makes this order-independent without any pre-group: two same-epoch
       docs that collide on an unverified band key both get True, so the
       outcome never depends on task order, only on (key, first epoch) —
       and replaying a task repeats its verdicts, exactly like the exact
       index.  A REJECTED representative's remaining keys stay recorded
       on purpose: the match extends the earlier cluster's band set,
       as a transitive union across increments would.

    Semantics note: WITHIN an increment matching is verified
    (signature-agreement >= the Jaccard threshold); ACROSS increments a
    single band-key collision counts as a match (C4-style membership —
    the index keeps 16 int64 keys per doc, not signatures).  Slightly
    more aggressive than batch LSH at the increment boundary; a
    one-increment ingest is EXACTLY the batch ``dedup_minhash_groups``
    keep set (pytest-pinned).

    Scale shape: shard state is one int64 key + epoch per admitted band
    (~16 x 16 B per unique doc; ``num_shards`` is the capacity knob).
    The intra-increment drop set (cluster non-representatives +
    band-key lists of this increment's survivors) rides ``ray.put`` —
    bounded by the increment's duplicate count, not the corpus; size
    increments accordingly.  Increments drain sequentially, like the
    exact index.
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
        import ray
        import pyarrow.compute as pc

        from ..functions.dedup import (
            MINHASH_PERMS,
            _band_hashes,
            _sig_binary_array,
            band_rows_from_sigs,
            minhash_pairs_from_bands,
            minhash_sigs_col,
        )
        from ..functions.graph import connected_components
        from ..functions.schema import ensure_schema

        handles = list(self._shards)
        nsh = self._num_shards
        self._epoch += 1
        epoch = self._epoch

        def sig_rows(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            sigs = minhash_sigs_col(batch["text"])
            return pa.table(
                {
                    "doc_id": pa.array(ids),
                    "sig": _sig_binary_array(sigs),
                }
            )

        def _sig_matrix(batch: pa.Table) -> np.ndarray:
            col = batch["sig"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = np.frombuffer(b"".join(col.to_pylist()), dtype="<u8")
            return flat.reshape(batch.num_rows, MINHASH_PERMS).astype(
                np.int64
            )

        # the ONE tokenize+hash pass; everything downstream re-derives
        # band keys from the 8 x PERMS sig bytes
        sig_tab = ds.map_batches(sig_rows, batch_format="pyarrow").materialize()

        def to_band_rows(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return band_rows_from_sigs(ids, _sig_matrix(batch))

        pairs = minhash_pairs_from_bands(
            sig_tab.map_batches(to_band_rows, batch_format="pyarrow")
        )
        cc = connected_components(pairs)
        dropped = cc.map_batches(
            lambda b: b.filter(pc.not_equal(b["node"], b["comp"])).select(
                ["node"]
            ),
            batch_format="pyarrow",
        ).to_pandas()
        drop_ref = ray.put(
            np.sort(dropped["node"].to_numpy(dtype=np.int64))
            if len(dropped)
            else np.empty(0, np.int64)
        )

        def probe(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            drops = ray.get(drop_ref)
            if len(drops):
                pos = np.minimum(
                    np.searchsorted(drops, ids), len(drops) - 1
                )
                rep = drops[pos] != ids
            else:
                rep = np.ones(len(ids), dtype=bool)
            batch = batch.filter(pa.array(rep))
            n = batch.num_rows
            if n == 0:
                return pa.table({"doc_id": pa.array([], pa.int64())})
            ids = ids[rep]
            keys = _band_hashes(_sig_matrix(batch)).reshape(-1)
            docix = np.repeat(np.arange(n, dtype=np.int64), keys.size // n)
            shard = _shard_of(keys, nsh)
            order = np.argsort(shard, kind="stable")
            bounds = np.searchsorted(shard[order], np.arange(nsh + 1))
            refs, spans = [], []
            for s in range(nsh):
                lo, hi = bounds[s], bounds[s + 1]
                if lo == hi:
                    continue
                idx = order[lo:hi]
                refs.append(
                    handles[s].check_and_add.remote(keys[idx].tolist(), epoch)
                )
                spans.append(idx)
            fresh = np.zeros(keys.size, dtype=bool)
            for idx, new_mask in zip(spans, ray.get(refs)):
                fresh[idx] = new_mask
            # doc survives iff EVERY band key is first-admitted this epoch
            stale_per_doc = np.bincount(docix[~fresh], minlength=n)
            return pa.table({"doc_id": pa.array(ids[stale_per_doc == 0])})

        return ensure_schema(
            sig_tab.map_batches(probe, batch_format="pyarrow"),
            pa.schema([("doc_id", pa.int64())]),
        )


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


def dedup_neardup_incremental_ingest(
    sf_dir: str, num_shards: int = DEFAULT_SHARDS
):
    """Two-increment NEAR-dup demonstration over the documents table
    (same day-1 / day-2 id-bucket split as the exact variant): day 1
    builds the band index; the returned Dataset is day 2's survivors —
    docs that are neither intra-day-2 near-dup non-representatives nor
    LSH near-dups of anything day 1 admitted.  Not SQL-expressible
    (stateful actors + LSH); pytest-gated by batch-equivalence,
    cross-increment planted-near-dup, shard-invariance and replay
    tests."""
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

    index = NearDupIndex(num_shards)
    day1 = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        day_filter(True), batch_format="pyarrow"
    )
    index.ingest(day1).count()

    day2 = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        day_filter(False), batch_format="pyarrow"
    )
    return index.ingest(day2)
