"""Sampling / splitting operators (reference T3-T5, S8/A4 analogues).

All sampling here is DETERMINISTIC — driven by md5(doc_id), not RNG state —
so results are identical across runs, parallelism levels and node counts
(the property the reference lacks: its train/test split uses ``random.random``
per book, ``/root/reference/src/prepare_data/split_dataset.py:9-19``, and its
batch sampling uses global numpy RNG, ``src/train_detector.py:139-145``).

- ``train_test_split_hash``: 2/3-1/3 split by hash threshold (T5 analogue).
- ``weighted_sample``: importance-style deterministic thinning — keep a doc
  when hash-uniform(doc_id) < n_chars / max_chars (T4 analogue; the
  reference samples half of each batch weighted by a scores file,
  ``src/train_detector.py:139-143``).
- ``importance_weights``: the scores-file pipeline (S8 writer + A4
  inverse-score normalization, ``src/prepare_data/prepare_data.py:164-178``):
  per-doc score -> global sum (tiny aggregate) -> normalized probability.
  Two-pass, but pass 2 only broadcasts one scalar.

Everything is SQL-expressible, so all three carry DuckDB oracles in
``__ray_entry__.oracle_sql`` with bit-exact integer arithmetic.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HASH_DENOM = 16**8  # first 8 hex digits of md5 -> uniform in [0, 1)


def _read_docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def _hash_u32(ids) -> np.ndarray:
    from .hashing import id_hash_u32

    return id_hash_u32(np.asarray(ids, dtype=np.int64))


def train_test_split_hash(sf_dir: str, test_denom: int = 3):
    """(doc_id, split) — 'test' when md5-uniform < 1/test_denom else 'train'."""

    def fn(batch: pa.Table) -> pa.Table:
        h = _hash_u32(batch.column("doc_id").to_pylist())
        is_test = h * test_denom < HASH_DENOM
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "split": pc.if_else(
                    pa.array(is_test), pa.scalar("test"), pa.scalar("train")
                ),
            }
        )

    return _read_docs(sf_dir, ["doc_id"]).map_batches(fn, batch_format="pyarrow")


def weighted_sample(sf_dir: str, max_chars: int = 20000):
    """Deterministic weighted thinning: P(keep) = n_chars / max_chars."""

    def fn(batch: pa.Table) -> pa.Table:
        h = _hash_u32(batch.column("doc_id").to_pylist())
        w = np.asarray(batch.column("n_chars").to_numpy(zero_copy_only=False))
        keep = h * max_chars < w.astype(np.int64) * HASH_DENOM
        return batch.select(["doc_id", "n_chars"]).filter(pa.array(keep))

    return _read_docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        fn, batch_format="pyarrow"
    )


def stratified_sample_by_lang(sf_dir: str, n_per_key: int = 10):
    """Deterministic stratified sample: the ``n_per_key`` docs per language
    with the smallest md5(doc_id) — a hash-ordered per-stratum head, so the
    sample is identical across runs, batch sizes and node counts.

    Scale shape: each batch keeps at most n_per_key rows PER STRATUM IN THE
    BATCH (a partial selection — the md5 head of a union is the head of the
    union of per-batch md5 heads), so the shuffle moves <= n_per_key x
    strata-per-batch rows regardless of input size; the final per-stratum
    merge is one tiny map_groups over n_per_key-row groups.
    """

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        from .hashing import md5_hex_of_ids

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "lang": batch.column("lang").to_pylist(),
                "doc_id": ids,
                "h": md5_hex_of_ids(ids).to_pylist(),
            }
        )
        top = df.sort_values(["lang", "h", "doc_id"]).groupby("lang").head(n_per_key)
        return pa.Table.from_pandas(top, preserve_index=False)

    def add_part(batch: pa.Table) -> pa.Table:
        # coarse stratum-hash partition: one merge call per partition even
        # at millions of strata (crc32 of the stratum value, deterministic)
        import zlib

        langs = batch.column("lang").to_pylist()
        return batch.append_column(
            "__spart",
            pa.array([zlib.crc32(s.encode()) % 64 for s in langs], pa.int64()),
        )

    def merge_part(g) -> "pa.Table":
        top = (
            g.sort_values(["lang", "h", "doc_id"]).groupby("lang").head(n_per_key)
        )
        rn = top.groupby("lang").cumcount().to_numpy() + 1
        import pandas as pd

        return pd.DataFrame(
            {
                "lang": top["lang"].to_numpy(),
                "doc_id": top["doc_id"].to_numpy(),
                "rn": rn.astype(np.int64),
            }
        )

    return (
        _read_docs(sf_dir, ["doc_id", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__spart")
        .map_groups(
            lambda g: merge_part(g.drop(columns="__spart")), batch_format="pandas"
        )
    )


def importance_weights(sf_dir: str):
    """(doc_id, score, prob_ppm) — score = n_chars, prob normalized to the
    corpus sum in ppm (integer floor division for bit-exact SQL parity)."""
    docs = _read_docs(sf_dir, ["doc_id", "n_chars"])
    total = docs.sum("n_chars")  # tiny global aggregate, broadcast as scalar

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n_chars"), pa.int64())
        prob = pc.divide(pc.multiply(n, 1_000_000), total)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score": n,
                "prob_ppm": prob,
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


SAMPLE_EXACT_K = 100


def sample_exact_k(sf_dir: str, k: int = SAMPLE_EXACT_K):
    """Deterministic EXACT-SIZE sample: the k documents whose
    md5(doc_id-as-string) sorts first, with their 1-based sample rank —
    the 'give me exactly K rows, stable across runs and cluster shapes'
    companion to the rate-based hash splits (T3/T5 family).

    Scale shape: per-block partial bottom-k by (md5_hex, doc_id) — at
    most k rows per block cross the single merge, never the table.  The
    md5 hex STRING is the sort key on both sides (lexicographic hex ==
    the oracle's ORDER BY md5(...)); doc_id breaks md5 ties (collisions
    only, astronomically rare, deterministic either way)."""
    import ray.data as rd

    from .hashing import md5_hex_of_ids
    from .core import partial_topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def keyed(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "h": md5_hex_of_ids(ids),
            }
        )

    out = partial_topk(
        ds.map_batches(keyed, batch_format="pyarrow"),
        ["h", "doc_id"],
        [True, True],
        k,
        rank_col="sample_rank",
    )
    return out.map_batches(
        lambda b: b.select(["doc_id", "sample_rank"]), batch_format="pyarrow"
    )
