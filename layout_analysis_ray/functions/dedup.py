"""Deduplication operators over the ``documents`` table.

The large-scale dedup family (exact, MinHash-LSH, SimHash, n-gram Jaccard);
the embedding-cosine variant lives in ``similarity.py``.  Patterns follow the
Ray guide: content hash in a vectorized ``map_batches``, then
``groupby(hash)`` keeps one row per group (hash-partitioned exact dedup);
MinHash explodes to (band, band_hash, doc_id) rows and groupbys on the band
key so only signature rows shuffle, never documents.

Determinism: md5-based hashing everywhere (no Python ``hash()``), fixed
MinHash permutation seeds, integer ppm similarity values.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import _tokens

MINHASH_PERMS = 64
MINHASH_BANDS = 16  # x 4 rows/band
MINHASH_PRIME = (1 << 61) - 1
MINHASH_JACCARD_PPM = 500_000  # signature-estimated threshold

_rng = np.random.default_rng(20240817)
_A = _rng.integers(1, MINHASH_PRIME, size=MINHASH_PERMS, dtype=np.int64)
_B = _rng.integers(0, MINHASH_PRIME, size=MINHASH_PERMS, dtype=np.int64)


def _read_docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _shingles(text: str) -> list[str]:
    toks = _tokens(text or "")
    if len(toks) < 3:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)]


def _shingle_ints(text: str) -> np.ndarray:
    vals = {
        int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") >> 3
        for s in _shingles(text)
    }
    return np.fromiter(vals, dtype=np.int64, count=len(vals))


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_hash_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    hs = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return pa.table({"doc_id": pa.array(ids), "content_hash": pa.array(hs, pa.string())})


def dedup_exact(sf_dir: str):
    """Keep the min doc_id per content hash; emit (content_hash, keeper
    doc_id, n_dups).  groupby(content_hash) is the one shuffle; it moves
    (hash, id) pairs, not documents."""
    ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        exact_hash_batch, batch_format="pyarrow"
    )

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "content_hash": [g["content_hash"].iloc[0]],
                "doc_id": [int(g["doc_id"].min())],
                "n_dups": [len(g)],
            }
        )

    return ds.groupby("content_hash").map_groups(first, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------

def minhash_sig(text: str) -> np.ndarray:
    x = _shingle_ints(text)
    if x.size == 0:
        return np.full(MINHASH_PERMS, MINHASH_PRIME, dtype=np.int64)
    # (A * x + B) mod p, min per permutation — vectorized [perms, shingles]
    vals = (x[None, :].astype(object) * _A[:, None] + _B[:, None]) % MINHASH_PRIME
    return np.array(vals.min(axis=1).tolist(), dtype=np.int64)


def minhash_bands_batch(batch: pa.Table) -> pa.Table:
    """doc -> one row per LSH band: (band_id, band_hash, doc_id)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    band_id, band_hash, doc_id, sigs = [], [], [], []
    for i, t in zip(ids, texts):
        sig = minhash_sig(t)
        sig_hex = sig.astype(np.uint64).tobytes().hex()
        for b in range(MINHASH_BANDS):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            band_id.append(b)
            band_hash.append(hashlib.md5(chunk.tobytes()).hexdigest())
            doc_id.append(int(i))
            sigs.append(sig_hex)
    return pa.table(
        {
            "band_id": pa.array(band_id, pa.int32()),
            "band_hash": pa.array(band_hash, pa.string()),
            "doc_id": pa.array(doc_id, pa.int64()),
            "sig": pa.array(sigs, pa.string()),
        }
    )


def dedup_minhash_pairs(sf_dir: str):
    """MinHash-LSH candidate pairs verified by signature-estimated Jaccard
    >= 0.5 -> (doc_a, doc_b, est_jaccard_ppm), deduped across bands.

    Scale shape: shingle->minhash per batch (no shuffle), explode to band
    rows, ``groupby(band_id, band_hash)`` (the only shuffle — signature rows
    are ~100x smaller than documents), pairwise verify inside each bucket,
    then a final exact-dedup groupby on the pair key.
    """
    ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        minhash_bands_batch, batch_format="pyarrow"
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_j = [], [], []
        if len(g) > 1:
            g = g.sort_values("doc_id").drop_duplicates("doc_id")
            ids = g["doc_id"].to_numpy()
            sigs = [
                np.frombuffer(bytes.fromhex(s), dtype=np.uint64).astype(np.int64)
                for s in g["sig"]
            ]
            for i, j in itertools.combinations(range(len(ids)), 2):
                est = int(
                    (np.count_nonzero(sigs[i] == sigs[j]) * 1_000_000)
                    // MINHASH_PERMS
                )
                if est >= MINHASH_JACCARD_PPM:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_j.append(est)
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "est_jaccard_ppm": out_j})

    pairs = ds.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )

    def depair(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(depair, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over the token multiset: bit b (MSB-first over the
    first 8 md5 digest bytes) is set when more token hashes have that bit
    set than clear."""
    toks = _tokens(text or "")
    if not toks:
        return 0
    dig = np.frombuffer(
        b"".join(hashlib.md5(t.encode()).digest()[:8] for t in toks), dtype=np.uint8
    ).reshape(len(toks), 8)
    bits = np.unpackbits(dig, axis=1).astype(np.int64)
    acc = bits.sum(axis=0) * 2 - len(toks)
    return int("".join("1" if a > 0 else "0" for a in acc), 2)


def simhash_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    hs = [f"{simhash64(t):016x}" for t in texts]
    prefix = [h[:4] for h in hs]  # 16-bit hamming bucket
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "simhash": pa.array(hs, pa.string()),
            "bucket16": pa.array(prefix, pa.string()),
        }
    )


def dedup_simhash(sf_dir: str):
    """(doc_id, simhash hex, 16-bit bucket) — near-dup candidates share a
    bucket; downstream pairing mirrors the MinHash band pattern."""
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (SQL-checkable variant over consecutive doc pairs)
# ---------------------------------------------------------------------------

def ngram_jaccard_consecutive(sf_dir: str):
    """Jaccard (ppm, floor) between distinct 3-gram shingle sets of doc i and
    doc i+1 — a fully SQL-mirrorable slice of n-gram near-dedup (the all-pairs
    variant is gated by MinHash candidates above).  Broadcast-free: consecutive
    doc ids co-locate via groupby on pair_id = doc_id // 2 is NOT used; this
    simply shifts the table by joining on doc_id+1 through a broadcast of
    (doc_id -> shingle set) for the small synthetic corpus; at scale this is
    a sort-merge self-join on doc_id.
    """
    import ray

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    shingle_map = {}
    for b in docs.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for i, t in zip(
            b["doc_id"].to_numpy(zero_copy_only=False), b["text"].to_pylist()
        ):
            shingle_map[int(i)] = frozenset(_shingles(t))
    ref = ray.put(shingle_map)

    def pair(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        a_out, b_out, j_out = [], [], []
        for i in ids:
            i = int(i)
            if i + 1 in m:
                sa, sb = m[i], m[i + 1]
                inter = len(sa & sb)
                union = len(sa) + len(sb) - inter
                j_out.append((inter * 1_000_000) // union if union else 0)
                a_out.append(i)
                b_out.append(i + 1)
        return pa.table(
            {
                "doc_a": pa.array(a_out, pa.int64()),
                "doc_b": pa.array(b_out, pa.int64()),
                "jaccard_ppm": pa.array(j_out, pa.int64()),
            }
        )

    return docs.map_batches(pair, batch_format="pyarrow")
