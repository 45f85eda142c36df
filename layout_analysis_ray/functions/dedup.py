"""Deduplication operators over the ``documents`` table.

The large-scale dedup family (exact, MinHash-LSH, SimHash, n-gram Jaccard);
the embedding-cosine variant lives in ``similarity.py``.  Patterns follow the
Ray guide: content hash in a vectorized ``map_batches``, then a native
``groupby(hash)`` aggregate keeps one row per group (hash-partitioned exact
dedup); MinHash explodes each doc to one row per LSH band — band key plus
raw signature bytes, never the document — and pairing AND verification
happen inside the band buckets, so only the small verified pair set is
ever exchanged again.

Determinism: md5-based hashing everywhere (no Python ``hash()``), fixed
MinHash permutation seeds, integer ppm similarity values.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import _tokens

MINHASH_PERMS = 64
MINHASH_BANDS = 16  # x 4 rows/band
# 31-bit Mersenne prime: a*x + b stays within int64 (a, x < 2^31), so the
# permutation sweep is pure vectorized integer numpy — no bignum objects.
MINHASH_PRIME = (1 << 31) - 1
MINHASH_JACCARD_PPM = 500_000  # signature-estimated threshold
# perms per numpy sweep: bounds the [chunk, n_shingles] temp; 2 keeps the
# temp inside L2 and measured ~40% faster than 8 on this box
_PERM_CHUNK = 2

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
    """Distinct shingles -> int64 in [1, p-1], vectorized (pandas hash_array
    is a deterministic, process-independent C hash)."""
    sh = _shingles(text)
    if not sh:
        return np.empty(0, dtype=np.int64)
    h = pd.util.hash_array(np.asarray(sh, dtype=object))
    return np.unique((h % (MINHASH_PRIME - 1)).astype(np.int64) + 1)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_hash_batch(batch: pa.Table) -> pa.Table:
    from .hashing import md5_hex

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "content_hash": md5_hex(batch["text"]),
        }
    )


def dedup_exact(sf_dir: str):
    """Keep the min doc_id per content hash; emit (content_hash, keeper
    doc_id, n_dups).  groupby(content_hash) is the one shuffle; it moves
    (hash, id) pairs, not documents.  The reduce is a NATIVE aggregate
    (Min + Count with map-side partial combining) — ``map_groups`` here
    would cost one Python call per unique document, i.e. billions of
    interpreter round trips on a web corpus."""
    from ray.data.aggregate import Count, Min

    ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        exact_hash_batch, batch_format="pyarrow"
    )
    agg = ds.groupby("content_hash").aggregate(Min("doc_id"), Count())

    def rename(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "content_hash": batch["content_hash"],
                "doc_id": pc.cast(batch["min(doc_id)"], pa.int64()),
                "n_dups": pc.cast(batch["count()"], pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------

def minhash_sig(text: str) -> np.ndarray:
    return minhash_sigs([text])[0]


def minhash_sigs(texts: list[str]) -> np.ndarray:
    return minhash_sigs_col(pa.array(texts, pa.string()))


def minhash_sigs_col(col) -> np.ndarray:
    """[n_docs, PERMS] signatures from an Arrow string column, fully
    vectorized: Arrow shingle build (``text.flat_shingles`` — no per-doc
    tokenize loop, no per-shingle ``join``), ONE ``pd.util.hash_array``
    call over every shingle of the batch, then per-doc segment-min
    (``np.minimum.reduceat``) of (A*x + B) mod p.  Perms are processed in
    chunks to bound the temporary.

    Duplicate shingles are NOT removed before the sweep — min is
    duplicate-insensitive, so values are bit-identical to hashing each
    doc's distinct shingle set separately (``_shingle_ints``; equality
    pinned by ``tests/test_dedup.py``)."""
    from .text import flat_shingles

    seg, sh, ntok = flat_shingles(col)
    return minhash_sigs_from_shingles(seg, sh, len(ntok))


def minhash_sigs_from_shingles(
    seg: np.ndarray, sh: pa.Array, n: int
) -> np.ndarray:
    """The (A*x + B) mod p segment-min sweep over a pre-built shingle set
    (``text.shingles_from_tokens`` output) — the entry point for fused
    scans that already tokenized the batch."""
    out = np.full((n, MINHASH_PERMS), MINHASH_PRIME, dtype=np.int64)
    if not len(seg):
        return out
    h = pd.util.hash_array(sh.to_numpy(zero_copy_only=False))
    x = (h % (MINHASH_PRIME - 1)).astype(np.int64) + 1  # in [1, 2^31)
    order = np.argsort(seg, kind="stable")
    seg, x = seg[order], x[order]
    lens = np.bincount(seg, minlength=n)
    nz = np.nonzero(lens)[0]
    starts = np.zeros(nz.size, dtype=np.int64)
    np.cumsum(lens[nz][:-1], out=starts[1:])
    for c0 in range(0, MINHASH_PERMS, _PERM_CHUNK):
        a = _A[c0 : c0 + _PERM_CHUNK, None]
        b = _B[c0 : c0 + _PERM_CHUNK, None]
        vals = (x[None, :] * a + b) % MINHASH_PRIME
        out[nz, c0 : c0 + _PERM_CHUNK] = np.minimum.reduceat(vals, starts, axis=1).T
    return out


# deterministic int64 band mix (vectorized Horner with wraparound)
_BAND_MIX = np.int64(1_000_003)


def _band_hashes(sigs: np.ndarray) -> np.ndarray:
    """[n, BANDS] int64 band keys (band_id mixed in, so one flat key)."""
    n = sigs.shape[0]
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    with np.errstate(over="ignore"):
        bands = sigs.reshape(n, MINHASH_BANDS, rows_per_band)
        bh = np.arange(MINHASH_BANDS, dtype=np.int64)[None, :].repeat(n, axis=0)
        for r in range(rows_per_band):
            bh = bh * _BAND_MIX + bands[:, :, r]  # int64 wraparound, per-band
    return bh


def minhash_bands_batch(batch: pa.Table) -> pa.Table:
    """doc -> one row per LSH band: (band_id, band_hash, doc_id, sig).

    (Unit-test surface; the pairs pipeline below uses the slimmer
    (band_key, doc_id) shape so signatures never enter the shuffle.)"""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    n = batch.num_rows
    sigs = minhash_sigs_col(batch["text"])  # [n, perms]
    bh = _band_hashes(sigs)
    sig_hex = [s.astype(np.uint64).tobytes().hex() for s in sigs]
    return pa.table(
        {
            "band_id": pa.array(
                np.tile(np.arange(MINHASH_BANDS, dtype=np.int32), n), pa.int32()
            ),
            "band_hash": pa.array(bh.reshape(-1), pa.int64()),
            "doc_id": pa.array(np.repeat(ids.astype(np.int64), MINHASH_BANDS)),
            "sig": pa.array(np.repeat(np.asarray(sig_hex, dtype=object), MINHASH_BANDS)),
        }
    )


PAIR_PARTITIONS = 64


def dedup_pair_rows(ds, cols: tuple[str, str], num_partitions: int = 64):
    """Distributed row dedup on an (int64, int64) pair key.

    groupby(cols).map_groups(head) costs one Python call PER PAIR — on a
    candidate-pair set that is hundreds of thousands of interpreter round
    trips.  Instead: hash-partition on a mixed pair key (~num_partitions
    coarse groups), one pandas ``drop_duplicates`` per partition."""
    a_col, b_col = cols

    def add_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__ppart", pa.array([], pa.int64()))
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        key = a * np.uint64(0x9E3779B97F4A7C15) ^ b
        key ^= key >> np.uint64(29)
        return batch.append_column(
            "__ppart", pa.array((key % np.uint64(num_partitions)).astype(np.int64))
        )

    def drop(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates([a_col, b_col]).drop(columns="__ppart")

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__ppart")
        .map_groups(drop, batch_format="pandas")
    )


def dedup_minhash_pairs(sf_dir: str):
    """MinHash-LSH candidate pairs verified by signature-estimated Jaccard
    >= 0.5 -> (doc_a, doc_b, est_jaccard_ppm), deduped across bands.

    Fully distributed with the verify FUSED into the band stage — nothing
    ever lands on the driver, and only TWO exchanges run end to end:

    1. ONE shingle->minhash corpus pass emits, per doc, one row per LSH
       band carrying (part, band_key, doc_id, raw signature bytes) — the
       signature rides WITH its band row, so verification never joins back
       to a signature table;
    2. coarse hash partitions (band_key % 64) pair same-key buckets and
       apply the signature-agreement estimate IN the bucket (vectorized
       per-pair equality count), so only pairs that already pass the
       threshold leave the stage;
    3. cross-band dedup of the (verified, small) pair set via the
       distributed pair dedup — est values are identical from every band,
       so keep-first is deterministic.

    Scale tradeoff vs the previous join-based verify (signature table +
    two bucketed hash joins): the band shuffle grows from ~20 B to
    ~BANDS x SIG_BYTES per doc (~8 KB), but the per-candidate-pair cost
    drops from ~3 KB (pair rows carrying hex signatures through two join
    exchanges) to zero.  On a high-duplication corpus — the case near-dedup
    exists for — candidate pairs exceed docs and the fused shape ships
    fewer bytes; it also removes three exchanges and the materialized
    signature table.  Per-bucket work is quadratic in bucket occupancy
    (standard LSH caveat); rows-per-band is the knob.
    """

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sigs = minhash_sigs_col(batch["text"])  # [n, perms]
        return band_rows_from_sigs(ids, sigs)

    bands = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        band_rows, batch_format="pyarrow"
    )
    return minhash_pairs_from_bands(bands)


def _sig_binary_array(sigs: np.ndarray) -> pa.Array:
    """[n, PERMS] int64 signature matrix -> binary() array of the raw
    little-endian uint64 rows, built from ONE buffer (no per-row tobytes)."""
    n = sigs.shape[0]
    sig_bytes = 8 * MINHASH_PERMS
    # binary() offsets are int32; a batch whose signature payload would
    # exceed 2 GiB must fail LOUDLY (np.arange would silently wrap
    # negative and corrupt every downstream pair) — at default Ray block
    # sizes this is unreachable, but a hand-tuned huge block isn't.
    if (n + 1) * sig_bytes > np.iinfo(np.int32).max:
        raise ValueError(
            f"signature batch too large for binary() offsets "
            f"({n} rows x {sig_bytes} B); lower the block/batch size"
        )
    buf = pa.py_buffer(np.ascontiguousarray(sigs.astype("<u8")).tobytes())
    offs = pa.py_buffer(
        np.arange(0, (n + 1) * sig_bytes, sig_bytes, dtype=np.int32).tobytes()
    )
    return pa.Array.from_buffers(pa.binary(), n, [None, offs, buf])


def bands_from_sig_column(batch: pa.Table) -> pa.Table:
    """Inverse of ``_sig_binary_array``: explode a (doc_id, sig) table's
    stored raw signatures back into slim LSH band rows.  Guards the
    hand-parse: empty blocks (zero-length arrays carry no buffers) and
    non-``binary()`` sig columns (a large_binary's int64 offsets would be
    silently misread as int32) are handled explicitly."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    arr = batch["sig"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return band_rows_from_sigs(
            np.empty(0, np.int64), np.empty((0, MINHASH_PERMS), np.int64)
        )
    if arr.type != pa.binary():
        raise TypeError(f"sig column must be binary(), got {arr.type}")
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    sigs = (
        data[offs[0] : offs[-1]]
        .view("<u8")
        .reshape(len(arr), MINHASH_PERMS)
        .astype(np.int64)
    )
    return band_rows_from_sigs(ids, sigs)


def band_rows_from_sigs(ids: np.ndarray, sigs: np.ndarray) -> pa.Table:
    """doc -> one slim LSH band row per band: (part, band_key, doc_id, raw
    signature bytes).  Shared by the standalone pairs pipeline and fused
    scans that computed ``sigs`` alongside other per-doc columns."""
    n = len(ids)
    bh = _band_hashes(sigs).reshape(-1)
    rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), MINHASH_BANDS))
    return pa.table(
        {
            "part": pa.array((bh % PAIR_PARTITIONS).astype(np.int32), pa.int32()),
            "band_key": pa.array(bh, pa.int64()),
            "doc_id": pa.array(np.repeat(ids.astype(np.int64), MINHASH_BANDS)),
            "sig": _sig_binary_array(sigs).take(rep),
        }
    )


def minhash_pairs_from_bands(bands):
    """Verified near-dup pairs from a band-row Dataset (the shape
    ``band_rows_from_sigs`` emits): coarse band-key hash partitions, pair +
    signature-agreement verify INSIDE each bucket, cross-band pair dedup."""

    def verified_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """All buckets of the partition paired + verified in ONE set of
        numpy passes (the per-band-key Python groupby loop was this
        pipeline's hottest stage — 24.9 of 25.9 s of UDF time at sf0.1).
        Pair values are identical to the per-bucket triu path: buckets
        sort by (band_key, doc_id), so within-bucket pair (left, right)
        always has doc_a < doc_b."""
        empty = pd.DataFrame(
            {
                "doc_a": np.empty(0, np.int64),
                "doc_b": np.empty(0, np.int64),
                "est_jaccard_ppm": np.empty(0, np.int64),
            }
        )
        if not len(g):
            return empty
        key = g["band_key"].to_numpy().astype(np.int64)
        ids = g["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, key))
        key, ids = key[order], ids[order]
        sigs_obj = g["sig"].to_numpy()[order]
        # distinct (band_key, doc_id): a doc can hit one bucket via
        # several bands of equal hash
        first = np.ones(len(g), dtype=bool)
        first[1:] = (key[1:] != key[:-1]) | (ids[1:] != ids[:-1])
        key, ids, sigs_obj = key[first], ids[first], sigs_obj[first]
        n = len(key)
        if n == 0:
            return empty
        # local index within bucket == number of earlier rows this row
        # pairs with (as the RIGHT member)
        bucket_start = np.ones(n, dtype=bool)
        bucket_start[1:] = key[1:] != key[:-1]
        starts = np.nonzero(bucket_start)[0]
        local = np.arange(n) - np.repeat(starts, np.diff(np.append(starts, n)))
        total = int(local.sum())
        if total == 0:
            return empty
        right = np.repeat(np.arange(n), local)
        excl = np.cumsum(local) - local
        left = np.arange(total) - np.repeat(excl, local) + np.repeat(
            np.arange(n) - local, local
        )
        sig = np.frombuffer(b"".join(sigs_obj), dtype=np.uint64).reshape(n, -1)
        est = (
            (sig[left] == sig[right]).sum(axis=1) * 1_000_000
        ) // MINHASH_PERMS
        keep = est >= MINHASH_JACCARD_PPM
        return pd.DataFrame(
            {
                "doc_a": ids[left[keep]],
                "doc_b": ids[right[keep]],
                "est_jaccard_ppm": est[keep].astype(np.int64),
            }
        ).drop_duplicates(["doc_a", "doc_b"])

    pairs = bands.groupby("part").map_groups(verified_pairs, batch_format="pandas")
    from .schema import ensure_schema

    return ensure_schema(
        dedup_pair_rows(pairs, ("doc_a", "doc_b")),
        pa.schema(
            [
                ("doc_a", pa.int64()),
                ("doc_b", pa.int64()),
                ("est_jaccard_ppm", pa.int64()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over the token multiset: bit b (MSB-first over the
    first 8 md5 digest bytes) is set when more token hashes have that bit
    set than clear."""
    return int(simhash64_batch([text])[0])


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """uint64 SimHash per text, batch-vectorized: md5 runs once per UNIQUE
    token in the batch (factorize), bit tallies are weighted segment sums
    (``np.add.reduceat`` over parent-sorted occurrences) — bit-identical to
    the per-doc definition above without one digest per token occurrence."""
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    toks_per_doc = [_tokens(t or "") for t in texts]
    lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    nz = np.nonzero(lens)[0]
    if nz.size == 0:
        return out
    flat = np.asarray(
        [w for i in nz for w in toks_per_doc[i]], dtype=object
    )
    codes, uniques = pd.factorize(flat)
    dig = np.frombuffer(
        b"".join(hashlib.md5(str(u).encode()).digest()[:8] for u in uniques),
        dtype=np.uint8,
    ).reshape(len(uniques), 8)
    # per-unique-token ±1 bit contributions, gathered per occurrence
    bits_pm1 = np.unpackbits(dig, axis=1).astype(np.int64) * 2 - 1
    starts = np.zeros(nz.size, dtype=np.int64)
    np.cumsum(lens[nz][:-1], out=starts[1:])
    acc = np.add.reduceat(bits_pm1[codes], starts, axis=0)
    packed = np.packbits(acc > 0, axis=1)  # MSB-first per byte, b0..b7
    out[nz] = packed.view(">u8").reshape(-1).astype(np.uint64)
    return out


def simhash_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    sims = simhash64_batch(texts)
    hs = [f"{s:016x}" for s in sims]
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


SIMHASH_HAM_MAX = 3
SIMHASH_BANDS4 = 4  # 4 x 16-bit bands: a pair within hamming<=3 of 64 bits
# must agree exactly on >=1 band (pigeonhole), so banding finds ALL such pairs


def simhash_pairs(sf_dir: str):
    """All pairs with simhash hamming distance <= 3 -> (doc_a, doc_b,
    hamming).  Exhaustive by the pigeonhole principle: 4 disjoint 16-bit
    bands, 3 differing bits can corrupt at most 3 bands.  Same scale shape
    as MinHash pairs: only (band, band_val, doc_id, sim) rows shuffle,
    pairing happens per coarse partition with an inner pandas groupby."""

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        sims = simhash64_batch(texts)
        n = len(ids)
        bands = np.empty((n, SIMHASH_BANDS4), dtype=np.int64)
        for b in range(SIMHASH_BANDS4):
            bands[:, b] = ((sims >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(
                np.int64
            )
        band_ids = np.tile(np.arange(SIMHASH_BANDS4, dtype=np.int32), n)
        key = bands.reshape(-1) * SIMHASH_BANDS4 + band_ids
        return pa.table(
            {
                "part": pa.array((key % PAIR_PARTITIONS).astype(np.int32), pa.int32()),
                "band_key": pa.array(key, pa.int64()),
                "doc_id": pa.array(np.repeat(ids, SIMHASH_BANDS4)),
                "sim": pa.array(
                    np.repeat(sims.astype(np.int64), SIMHASH_BANDS4), pa.int64()
                ),
            }
        )

    bands = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        band_rows, batch_format="pyarrow"
    )

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        for _, grp in g.groupby("band_key", sort=False):
            grp = grp.drop_duplicates("doc_id")
            if len(grp) < 2:
                continue
            ids = grp["doc_id"].to_numpy()
            sims = grp["sim"].to_numpy().astype(np.uint64)
            order = np.argsort(ids)
            ids, sims = ids[order], sims[order]
            # vectorized hamming over all in-bucket pairs: XOR then byte-wise
            # popcount via unpackbits — no per-pair Python bin() loop, so a
            # hot bucket (e.g. the all-empty-doc simhash) stays numpy-bound
            ia, ib = np.triu_indices(len(ids), k=1)
            x = sims[ia] ^ sims[ib]
            ham = (
                np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1)
                .sum(axis=1)
                .astype(np.int64)
            )
            keep = ham <= SIMHASH_HAM_MAX
            out_a.append(ids[ia[keep]].astype(np.int64))
            out_b.append(ids[ib[keep]].astype(np.int64))
            out_h.append(ham[keep])
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a) if out_a else np.empty(0, np.int64),
                "doc_b": np.concatenate(out_b) if out_b else np.empty(0, np.int64),
                "hamming": np.concatenate(out_h) if out_h else np.empty(0, np.int64),
            }
        ).drop_duplicates(["doc_a", "doc_b"])

    pairs = bands.groupby("part").map_groups(partition_pairs, batch_format="pandas")
    from .schema import ensure_schema

    return ensure_schema(
        dedup_pair_rows(pairs, ("doc_a", "doc_b")),
        pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]
        ),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (SQL-checkable variant over consecutive doc pairs)
# ---------------------------------------------------------------------------

def ngram_jaccard_consecutive(sf_dir: str, materialize_sides: bool = False):
    """Jaccard (ppm, floor) between distinct 3-gram shingle sets of doc i and
    doc i+1 — a fully SQL-mirrorable slice of n-gram near-dedup (the
    all-pairs variant is gated by MinHash candidates above).

    Scale shape: a hash-partition self-join (``Dataset.join``) of the
    shingle-set table with itself on (doc_id) = (doc_id - 1); shingle sets
    are hashed to 64-bit ints at build time (ONE ``pd.util.hash_array``
    call per batch) and travel as packed little-endian binary blobs —
    scalar join payloads, ~8 bytes/shingle instead of the raw strings.
    Post-join the jaccard is one vectorized lexsort/bincount kernel per
    partition — no per-pair Python sets.  64-bit hashing keeps collision
    odds negligible (a 31-bit space would visibly corrupt counts at SF>=1).
    Nothing is ever materialized on the driver.

    The join consumes the shingle table twice, so the lazy plan runs the
    tokenize+hash scan once PER SIDE.  ``materialize_sides=True`` pins
    the slim packed table instead (the dedup_lines trade: spillable
    bytes for a scan) — but an interleaved A/B at sf0.1/32 CPUs measured
    the barrier it introduces as a net LOSS (~3.34 s vs ~3.18 s,
    BASELINE.md round-5 notes): both recomputed sides stream
    concurrently INTO the join, so the duplicate scan hides behind the
    join's own exchange.  Default stays False; flip it when the
    tokenize pass, not the exchange, dominates (very long documents)."""

    def shingle_rows(batch: pa.Table) -> pa.Table:
        from .text import flat_shingles

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        seg, sh, _ntok = flat_shingles(batch["text"])
        n = batch.num_rows
        counts = np.zeros(n, dtype=np.int64)
        if len(seg):
            h = pd.util.hash_array(sh.to_numpy(zero_copy_only=False))  # uint64
            order = np.lexsort((h, seg))
            s, v = seg[order], h[order]
            keep = np.ones(s.size, dtype=bool)
            keep[1:] = (s[1:] != s[:-1]) | (v[1:] != v[:-1])
            s, v = s[keep], v[keep]  # per-doc sorted distinct hashes
            counts = np.bincount(s, minlength=n)
            buf = v.astype("<u8").tobytes()
        else:
            buf = b""
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        sets = [buf[offs[i] * 8 : offs[i + 1] * 8] for i in range(n)]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "sh": pa.array(sets, pa.binary()),
            }
        )

    docs = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        shingle_rows, batch_format="pyarrow"
    )
    if materialize_sides:
        docs = docs.materialize()

    def as_left(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_a": batch["doc_id"],
                "sh_a": batch["sh"],
            }
        )

    def as_right(batch: pa.Table) -> pa.Table:
        # right side keyed by doc_id - 1 so it lines up with its predecessor
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "prev_id": pa.array(ids - 1),
                "doc_b": batch["doc_id"],
                "sh_b": batch["sh"],
            }
        )

    joined = docs.map_batches(as_left, batch_format="pyarrow").join(
        docs.map_batches(as_right, batch_format="pyarrow"),
        "inner",
        num_partitions=16,
        on=("doc_a",),
        right_on=("prev_id",),
    )

    def jaccard(batch: pa.Table) -> pa.Table:
        """Vectorized set intersection over every pair in the batch: both
        sides are sorted-distinct hash lists, so a single lexsort of
        (pair, value) over the concatenation makes intersections exactly
        the adjacent duplicates — one bincount, no Python per pair."""
        sh_a = batch["sh_a"].combine_chunks() if isinstance(
            batch["sh_a"], pa.ChunkedArray
        ) else batch["sh_a"]
        sh_b = batch["sh_b"].combine_chunks() if isinstance(
            batch["sh_b"], pa.ChunkedArray
        ) else batch["sh_b"]
        n = len(sh_a)
        a_bufs = sh_a.to_pylist()  # one bytes object per row (not per shingle)
        b_bufs = sh_b.to_pylist()
        len_a = np.fromiter((len(x) // 8 for x in a_bufs), np.int64, n)
        len_b = np.fromiter((len(x) // 8 for x in b_bufs), np.int64, n)
        va = np.frombuffer(b"".join(a_bufs), dtype="<u8")
        vb = np.frombuffer(b"".join(b_bufs), dtype="<u8")
        seg = np.concatenate(
            [np.repeat(np.arange(n, dtype=np.int64), len_a),
             np.repeat(np.arange(n, dtype=np.int64), len_b)]
        )
        vals = np.concatenate([va, vb])
        order = np.lexsort((vals, seg))
        s, v = seg[order], vals[order]
        dup = np.zeros(s.size, dtype=bool)
        if s.size > 1:
            dup[1:] = (s[1:] == s[:-1]) & (v[1:] == v[:-1])
        inter = np.bincount(s[dup], minlength=n) if s.size else np.zeros(n, np.int64)
        union = len_a + len_b - inter
        out = np.where(union > 0, (inter * 1_000_000) // np.maximum(union, 1), 0)
        return pa.table(
            {
                "doc_a": batch["doc_a"],
                "doc_b": batch["doc_b"],
                "jaccard_ppm": pa.array(out),
            }
        )

    from .schema import ensure_schema

    return ensure_schema(
        joined.map_batches(jaccard, batch_format="pyarrow"),
        pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard_ppm", pa.int64())]
        ),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (training-data hygiene)
# ---------------------------------------------------------------------------

# eval split: docs whose id-hash bucket digit is >= 14 (2/16 of the corpus
# plays the held-out benchmark) — the split_hash_buckets convention,
# mirrored verbatim in the SQL oracle
DECON_EVAL_MIN_DIGIT = 14
DECON_PARTS = 64
# broadcast cutover: when the eval split yields at most this many
# (doc, key) rows, its distinct key set rides the object store
# (<= 128 MB as int64) and contamination is counted map-side with zero
# shuffle; above it, the distributed partition path runs.
DECON_BROADCAST_MAX_KEYS = 16_000_000


def _decon_doc_keys(batch: pa.Table, keep: np.ndarray | None = None):
    """Distinct (segment, 60-bit shingle key) pairs for (a subset of) a
    batch.  Returns ``(ids, seg, key)`` with seg indexing into ``ids``.
    A doc lives in exactly one batch, so batch-level dedup IS global
    per-doc dedup."""
    import pyarrow.compute as pc

    from .hashing import str_hash_u60
    from .text import flat_shingles

    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    text_col = batch["text"]
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    if keep is not None:
        ids = ids[keep]
        text_col = text_col.filter(pa.array(keep))
    seg, sh, _nt = flat_shingles(pc.fill_null(text_col, ""))
    key = str_hash_u60(sh)
    order = np.lexsort((key, seg))
    seg, key = seg[order], key[order]
    first = np.ones(len(seg), dtype=bool)
    first[1:] = (seg[1:] != seg[:-1]) | (key[1:] != key[:-1])
    return ids, seg[first], key[first]


def decontaminate_ngrams(
    sf_dir: str, broadcast_max_keys: int = DECON_BROADCAST_MAX_KEYS
):
    """Benchmark contamination scan: for every TRAINING doc, how many
    distinct word-3-gram shingles it shares with the held-out eval split
    (docs with id-hash digit >= ``DECON_EVAL_MIN_DIGIT``).  The
    decontamination pass every pretraining pipeline runs before training:
    docs with n_shared > 0 would be dropped or flagged.

    Scale shape — two tiers, chosen by the MEASURED eval-side volume
    (held-out benchmarks are tiny next to a training corpus, so the
    fast tier is the normal one):

    - broadcast tier (eval rows <= ``broadcast_max_keys``): the
      cutover probe is a STREAMING count of per-doc-distinct eval key
      rows (nothing pinned — a huge eval split costs one cheap scan to
      detect, never an object-store flood); under the cutover the
      eval-key scan re-executes and the driver uniques the rows
      (bounded by the cutover) into one sorted int64 array, ``ray.put``
      once; a pass over training docs counts searchsorted hits per doc
      map-side.  ZERO shuffle.
    - distributed tier (huge eval split): distinct (shingle-key, doc_id,
      is_eval) rows — the key is the 60-bit md5 prefix of the shingle
      STRING (8 B/row; both engine and oracle group by the SAME key
      function, so prefix collisions cannot diverge them) — one coarse
      key-hash partition, one lexsort + segment-max kernel per
      PARTITION, a native Count per doc.  Nothing document-sized
      shuffles and no side is ever held whole anywhere.

    Both tiers are equality-tested against each other and the SQL
    oracle (``tests/test_dedup_index.py``).
    """
    import ray

    from .hashing import id_bucket_digit

    def eval_keys(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = id_bucket_digit(ids) >= DECON_EVAL_MIN_DIGIT
        if not mask.any():
            return pa.table({"key": pa.array([], pa.int64())})
        _ids, _seg, key = _decon_doc_keys(batch, mask)
        return pa.table({"key": pa.array(key, pa.int64())})

    keys_ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        eval_keys, batch_format="pyarrow"
    )
    # streaming probe: counts rows without pinning them; the collection
    # below re-executes the (small by decision) eval-key scan
    if keys_ds.count() <= broadcast_max_keys:
        parts = [
            b["key"].to_numpy(zero_copy_only=False)
            for b in keys_ds.iter_batches(batch_format="pyarrow")
        ]
        ek = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        ek_ref = ray.put(ek)

        def score(batch: pa.Table) -> pa.Table:
            ek = ray.get(ek_ref)  # zero-copy view of the shared array
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            mask = id_bucket_digit(ids) < DECON_EVAL_MIN_DIGIT
            empty = pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_shared": pa.array([], pa.int64()),
                }
            )
            if not mask.any():
                return empty
            sub_ids, seg, key = _decon_doc_keys(batch, mask)
            if len(key) == 0 or len(ek) == 0:
                return empty
            pos = np.searchsorted(ek, key)
            hit = (pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)] == key)
            n_shared = np.bincount(seg[hit], minlength=len(sub_ids))
            nz = n_shared > 0
            return pa.table(
                {
                    "doc_id": pa.array(sub_ids[nz], pa.int64()),
                    "n_shared": pa.array(n_shared[nz], pa.int64()),
                }
            )

        from .schema import ensure_schema

        return ensure_schema(
            _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
                score, batch_format="pyarrow"
            ),
            pa.schema([("doc_id", pa.int64()), ("n_shared", pa.int64())]),
        )

    return _decontaminate_distributed(sf_dir)


def _decontaminate_distributed(sf_dir: str):
    """Distributed tier of ``decontaminate_ngrams`` — see its docstring."""
    from ray.data.aggregate import Count

    from .hashing import id_bucket_digit

    def rows(batch: pa.Table) -> pa.Table:
        ids, seg, key = _decon_doc_keys(batch)
        digit = id_bucket_digit(ids)
        return pa.table(
            {
                "part": pa.array(key % DECON_PARTS, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "doc_id": pa.array(ids[seg], pa.int64()),
                "is_eval": pa.array(
                    (digit[seg] >= DECON_EVAL_MIN_DIGIT).astype(np.int64)
                ),
            }
        )

    def match(g: pd.DataFrame) -> pd.DataFrame:
        """All shingle keys of the partition matched in one numpy pass:
        segment-max of is_eval per key, keep training rows of segments
        containing any eval row."""
        key = g["key"].to_numpy()
        ev = g["is_eval"].to_numpy()
        doc = g["doc_id"].to_numpy()
        order = np.argsort(key, kind="stable")
        key, ev, doc = key[order], ev[order], doc[order]
        starts = np.ones(len(key), dtype=bool)
        starts[1:] = key[1:] != key[:-1]
        idx = np.nonzero(starts)[0]
        has_eval = np.maximum.reduceat(ev, idx) if len(key) else ev
        seg_of = np.cumsum(starts) - 1
        keep = (ev == 0) & (has_eval[seg_of] == 1)
        return pd.DataFrame({"doc_id": doc[keep]})

    hits = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(match, batch_format="pandas")
    )
    agg = hits.groupby("doc_id").aggregate(Count())

    def rename(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_shared": pc.cast(batch["count()"], pa.int64()),
            }
        )

    from .schema import ensure_schema

    return ensure_schema(
        agg.map_batches(rename, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("n_shared", pa.int64())]),
    )


# ---------------------------------------------------------------------------
# Per-source duplication rate
# ---------------------------------------------------------------------------

def dedup_rate_by_source(sf_dir: str):
    """Per-source exact-duplicate rate: n_docs, n_unique (distinct content
    hashes) and the duplicate share in ppm — the per-provenance dedup
    report a corpus-curation pass reads to decide which sources to
    down-weight before training.

    Scale shape: first exchange carries (source, content_hash) count
    partials — one row per distinct (source, hash) per block, map-side
    combined; the second aggregation runs over those already-deduped rows
    (one per distinct pair globally), so its input is duplication-bounded,
    not corpus-bounded.  Content hashing reuses the vectorized md5 kernel
    (`hashing.md5_hex`); ppm is exact integer floor division on both the
    Ray and DuckDB sides."""
    from .core import partial_then_global
    from .hashing import md5_hex
    from .schema import ensure_schema

    docs = _read_docs(sf_dir, ["source", "text"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "content_hash": md5_hex(b["text"]),
                "n_docs": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )

    pair_counts = partial_then_global(
        docs.map_batches(prep, batch_format="pyarrow"),
        ["source", "content_hash"],
        ["n_docs"],
    )

    def per_source_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "n_docs": b["n_docs"],
                "n_unique": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )

    agg = partial_then_global(
        pair_counts.map_batches(per_source_partial, batch_format="pyarrow"),
        ["source"],
        ["n_docs", "n_unique"],
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b["n_docs"].to_numpy(zero_copy_only=False)
        u = b["n_unique"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": b["source"],
                "n_docs": b["n_docs"],
                "n_unique": b["n_unique"],
                "dup_ppm": pa.array((n - u) * 1_000_000 // n, pa.int64()),
            }
        )

    return ensure_schema(
        agg.map_batches(finish, batch_format="pyarrow").sort("source"),
        pa.schema(
            [
                ("source", pa.string()),
                ("n_docs", pa.int64()),
                ("n_unique", pa.int64()),
                ("dup_ppm", pa.int64()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# Line-level global dedup (C4 / RefinedWeb-style)
# ---------------------------------------------------------------------------

# "line" granularity: this corpus representation is a single space-joined
# token stream (no newlines), so a line is a fixed run of LINE_CHUNK_TOKENS
# tokens — the same role newline-delimited lines play in C4's "discard every
# duplicated three-sentence span but the first occurrence" pass.
LINE_CHUNK_TOKENS = 16
# packed global chunk coordinate: doc_id * CAP + chunk_idx.  Min over the
# packed value IS lexicographic min over (doc_id, chunk_idx) because
# chunk_idx < CAP; the guards below keep the packing collision-free.
LINE_PACK_CAP = 1 << 20  # docs up to 16.7M tokens; doc_id < 2^43
# broadcast cutover: when the corpus yields at most this many chunk rows,
# the winner coordinate set rides the object store as one sorted int64
# array (<= 128 MB) and the keep decision is made map-side with ZERO text
# shuffle; above it the distributed two-exchange tier runs.
LINE_BROADCAST_MAX_CHUNKS = 16_000_000
LINE_PARTS = 64

_LINE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_chunks", pa.int64()),
        ("n_kept", pa.int64()),
        ("text_clean", pa.string()),
    ]
)


def _guard_i32_offsets(n_flat: int, where: str) -> None:
    """int32 ListArray offsets overflow (loudly, via pyarrow) once a
    kernel input holds > 2^31 flat elements — reachable only when a
    coarse partition of the distributed tier grows that large.  Raise a
    clear error naming the knob instead of an opaque offset overflow."""
    if n_flat > np.iinfo(np.int32).max:
        raise ValueError(
            f"{where} holds {n_flat} flat elements, overflowing int32 "
            "list offsets; raise LINE_PARTS (or lower the block size) so "
            "partitions shrink"
        )


def _line_chunks(batch: pa.Table):
    """Fixed-size token chunks for every doc of a batch, fully vectorized.

    Returns ``(ids, chunk_parent, chunk_idx, chunks)``: ``ids`` is the
    batch's doc_id column (all rows, including zero-token docs);
    ``chunk_parent[i]`` indexes into ``ids``; ``chunks`` is an Arrow
    string array of space-joined LINE_CHUNK_TOKENS-token runs (the last
    chunk of a doc may be shorter).  Token set and join separator mirror
    the oracle's regexp_extract_all + array_to_string exactly.
    """
    import pyarrow.compute as pc

    from .text import _flat_tokens_arrow

    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    parent, flat, n_rows = _flat_tokens_arrow(batch["text"])
    if len(parent) == 0:
        return (
            ids,
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            pa.array([], pa.string()),
        )
    counts = np.bincount(parent, minlength=n_rows)
    starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(len(parent), dtype=np.int64) - starts[parent]
    is_start = pos % LINE_CHUNK_TOKENS == 0
    offsets = np.append(np.nonzero(is_start)[0], len(parent))
    _guard_i32_offsets(len(parent), "_line_chunks token batch")
    lists = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), flat.combine_chunks()
        if isinstance(flat, pa.ChunkedArray) else flat
    )
    chunks = pc.binary_join(lists, " ")
    chunk_parent = parent[offsets[:-1]]
    chunk_idx = pos[offsets[:-1]] // LINE_CHUNK_TOKENS
    if chunk_idx.size and chunk_idx.max() >= LINE_PACK_CAP:
        raise ValueError(
            f"doc with >= {LINE_PACK_CAP * LINE_CHUNK_TOKENS} tokens "
            "overflows the packed chunk coordinate; raise LINE_PACK_CAP"
        )
    bad = ids[(ids < 0) | (ids >= 1 << 43)]
    if bad.size:
        raise ValueError(f"doc_id {bad[0]} outside [0, 2^43) packing range")
    return ids, chunk_parent, chunk_idx, chunks


def dedup_lines(sf_dir: str, broadcast_max_chunks: int = LINE_BROADCAST_MAX_CHUNKS):
    """Global line-level dedup: every LINE_CHUNK_TOKENS-token chunk keeps
    only its first occurrence corpus-wide (first = lexicographic min
    (doc_id, chunk_idx)); docs are reassembled from their surviving
    chunks in order.  The C4 / RefinedWeb "remove duplicated lines
    across the corpus" pass (chunk identity = md5 of the chunk text,
    the same partition function the SQL oracle uses).

    Emits one row per doc with >= 1 token: (doc_id, n_chunks, n_kept,
    text_clean) — text_clean is '' when every chunk of the doc appeared
    earlier in the corpus.

    Scale shape — two equality-pinned tiers chosen by a MEASURED
    map-only probe of the corpus chunk count:

    - broadcast tier: one groupby over 40-byte (hash, packed) rows picks
      winners; the winning PACKED COORDINATES alone (8 B each, bounded
      by the cutover) ride the object store, and a second map-only scan
      re-chunks each doc and keeps chunks whose own coordinate is in the
      winner set — document text NEVER shuffles.
    - distributed tier (``_dedup_lines_distributed``): two coarse-hash
      exchanges with vectorized per-partition kernels (winner-pick by
      chunk-hash part, then reassembly by doc part with per-doc marker
      rows so fully-deduped docs still emit).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    from .hashing import md5_hex
    from .schema import ensure_schema

    def chunk_rows(batch: pa.Table) -> pa.Table:
        ids, cp, ci, chunks = _line_chunks(batch)
        return pa.table(
            {
                "content_hash": md5_hex(chunks),
                "packed": pa.array(
                    ids[cp] * LINE_PACK_CAP + ci, pa.int64()
                ),
            }
        )

    # ONE tokenize+md5 scan: the 40-byte chunk rows are materialized, so
    # the count probe is block metadata and the winners groupby reuses
    # the same blocks (ADVICE r4: the probe + groupby used to re-run the
    # chunk scan).  Above the cutover the materialized slim rows are a
    # transient the object store frees (spilling if it must) before the
    # distributed tier re-derives what it needs — the probe itself was
    # always a full scan, so this costs bytes, not passes.
    rows = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(chunk_rows, batch_format="pyarrow")
        .materialize()
    )
    n_chunk_rows = rows.count()
    if n_chunk_rows == 0:
        # typed empty short-circuit (a fully-empty Ray Dataset loses its
        # schema in to_pandas/take_all; pa.Table keeps it)
        return _LINE_SCHEMA.empty_table()
    if n_chunk_rows > broadcast_max_chunks:
        return _dedup_lines_distributed(sf_dir)

    winners = rows.groupby("content_hash").aggregate(Min("packed"))
    parts = [
        b["min(packed)"].to_numpy(zero_copy_only=False)
        for b in winners.iter_batches(batch_format="pyarrow")
    ]
    keep = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    keep_ref = ray.put(keep)

    def rebuild(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = ray.get(keep_ref)  # zero-copy view of the shared array
        ids, cp, ci, chunks = _line_chunks(batch)
        packed = ids[cp] * LINE_PACK_CAP + ci
        pos = np.searchsorted(keep, packed)
        hit = np.zeros(len(packed), dtype=bool)
        if len(keep):
            inb = pos < len(keep)
            hit[inb] = keep[pos[inb]] == packed[inb]
        n_chunks = np.bincount(cp, minlength=len(ids))
        n_kept = np.bincount(cp[hit], minlength=len(ids))
        kept_parent = cp[hit]
        # per-doc ordered join of surviving chunks (chunk rows are
        # already in (doc, chunk_idx) order within the batch)
        doc_off = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(n_kept, out=doc_off[1:])
        _guard_i32_offsets(int(doc_off[-1]), "dedup_lines rebuild batch")
        lists = pa.ListArray.from_arrays(
            pa.array(doc_off, pa.int32()), chunks.filter(pa.array(hit))
        )
        text_clean = pc.binary_join(lists, " ")
        has_tokens = n_chunks > 0
        del kept_parent
        return pa.table(
            {
                "doc_id": pa.array(ids[has_tokens], pa.int64()),
                "n_chunks": pa.array(n_chunks[has_tokens], pa.int64()),
                "n_kept": pa.array(n_kept[has_tokens], pa.int64()),
                "text_clean": pc.take(
                    text_clean, pa.array(np.nonzero(has_tokens)[0])
                ),
            }
        )

    return ensure_schema(
        _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
            rebuild, batch_format="pyarrow"
        ),
        _LINE_SCHEMA,
    )


def _dedup_lines_distributed(sf_dir: str):
    """Distributed tier of ``dedup_lines`` — see its docstring.

    Exchange 1 partitions chunk rows by a coarse hash of the chunk text
    (full md5 identity is re-derived VECTORIZED inside each partition, so
    the 60-bit partitioning prefix can collide without diverging from the
    oracle); a per-partition sort picks each hash's first occurrence.
    Exchange 2 regroups surviving chunks by doc part and joins them in
    chunk order; one marker row per doc (emitted from a map-only scan of
    the same corpus) guarantees fully-deduped docs still produce a row.
    Document text crosses the wire exactly twice, both times as part of
    a coarse-partition exchange — never per-group, never via the driver.
    """
    import pyarrow.compute as pc

    from .hashing import md5_hex, str_hash_u60
    from .schema import ensure_schema

    def chunk_rows(batch: pa.Table) -> pa.Table:
        ids, cp, ci, chunks = _line_chunks(batch)
        return pa.table(
            {
                "hpart": pa.array(
                    str_hash_u60(chunks) % LINE_PARTS, pa.int64()
                ),
                "packed": pa.array(ids[cp] * LINE_PACK_CAP + ci, pa.int64()),
                "chunk": chunks,
            }
        )

    def pick_winners(g: pa.Table) -> pa.Table:
        h = md5_hex(g["chunk"])
        order = pc.sort_indices(
            pa.table({"h": h, "p": g["packed"]}),
            sort_keys=[("h", "ascending"), ("p", "ascending")],
        )
        h_s = h.take(order)
        packed = g["packed"].take(order)
        n = len(h_s)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = pc.not_equal(
                h_s.slice(1), h_s.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        win = pa.array(np.nonzero(first)[0])
        p = packed.take(win).to_numpy(zero_copy_only=False)
        doc_id = p // LINE_PACK_CAP
        return pa.table(
            {
                "docpart": pa.array(doc_id % LINE_PARTS, pa.int64()),
                "doc_id": pa.array(doc_id, pa.int64()),
                "chunk_idx": pa.array(p % LINE_PACK_CAP, pa.int64()),
                "chunk": g["chunk"].take(order).take(win),
                "n_chunks": pa.array(np.zeros(len(p), np.int64), pa.int64()),
            }
        )

    kept = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(chunk_rows, batch_format="pyarrow")
        .groupby("hpart")
        .map_groups(pick_winners, batch_format="pyarrow")
    )

    def markers(batch: pa.Table) -> pa.Table:
        ids, cp, _ci, _chunks = _line_chunks(batch)
        n_chunks = np.bincount(cp, minlength=len(ids))
        has = n_chunks > 0
        ids = ids[has]
        return pa.table(
            {
                "docpart": pa.array(ids % LINE_PARTS, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_idx": pa.array(np.full(len(ids), -1), pa.int64()),
                "chunk": pa.array([""] * len(ids), pa.string()),
                "n_chunks": pa.array(n_chunks[has], pa.int64()),
            }
        )

    marker_ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        markers, batch_format="pyarrow"
    )

    def reassemble(g: pa.Table) -> pa.Table:
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        ci = g["chunk_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ci, doc))
        doc, ci = doc[order], ci[order]
        chunks = g["chunk"].take(pa.array(order))
        nch = g["n_chunks"].to_numpy(zero_copy_only=False)[order]
        starts = np.ones(len(doc), dtype=bool)
        starts[1:] = doc[1:] != doc[:-1]
        seg_of = np.cumsum(starts) - 1
        n_docs = int(seg_of[-1]) + 1 if len(doc) else 0
        is_marker = ci < 0  # sorts first within each doc segment
        doc_ids = doc[starts]
        n_chunks = np.bincount(seg_of, weights=nch, minlength=n_docs).astype(
            np.int64
        )
        n_kept = np.bincount(
            seg_of[~is_marker], minlength=n_docs
        ).astype(np.int64)
        keep_mask = ~is_marker
        off = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(n_kept, out=off[1:])
        _guard_i32_offsets(int(off[-1]), "dedup_lines reassemble partition")
        if isinstance(chunks, pa.ChunkedArray):
            chunks = chunks.combine_chunks()
        lists = pa.ListArray.from_arrays(
            pa.array(off, pa.int32()), chunks.filter(pa.array(keep_mask))
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_chunks": pa.array(n_chunks, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
                "text_clean": pc.binary_join(lists, " "),
            }
        )

    out = (
        kept.union(marker_ds)
        .groupby("docpart")
        .map_groups(reassemble, batch_format="pyarrow")
    )
    return ensure_schema(out, _LINE_SCHEMA)


# ---------------------------------------------------------------------------
# Character-level near-dup: banded edit-distance pairs (typo-grade dups)
# ---------------------------------------------------------------------------

EDITDIST_MAX = 8  # emit pairs with levenshtein <= this (UTF-8 bytes)
EDITDIST_PREFIX = 8  # blocking: exact first-N-chars + same lang
EDITDIST_PARTS = 64
EDITDIST_BROADCAST_MAX_KEYS = 8_000_000  # ~16 B/key broadcast bound


def banded_edit_distances(a_texts, b_texts, k: int = EDITDIST_MAX) -> np.ndarray:
    """Exact Levenshtein distance over UTF-8 BYTES for every (a, b) pair,
    clamped to ``k + 1`` when the true distance exceeds ``k`` (Ukkonen's
    band) — byte semantics match DuckDB's ``levenshtein``.

    Vectorized ACROSS pairs: the DP walks ``max_len`` rows x ``2k+1``
    band positions in Python, but every cell update is one numpy op over
    ALL pairs at once, so the Python iteration count is independent of
    the pair count (the part_pairs_top amortization pattern)."""
    P = len(a_texts)
    out = np.full(P, k + 1, dtype=np.int64)
    if P == 0:
        return out
    INF = np.int32(k + 1)
    A, B = [], []
    m = np.empty(P, dtype=np.int64)
    n = np.empty(P, dtype=np.int64)
    for i, (a, b) in enumerate(zip(a_texts, b_texts)):
        ab, bb = (a or "").encode("utf-8"), (b or "").encode("utf-8")
        if len(ab) > len(bb):
            ab, bb = bb, ab  # distance is symmetric; keep m <= n
        A.append(ab)
        B.append(bb)
        m[i], n[i] = len(ab), len(bb)
    live = (n - m) <= k  # length gap alone already exceeds the band
    out[(m == 0) & (n <= k)] = n[(m == 0) & (n <= k)]
    mmax = int(m.max())
    if mmax == 0 or not live.any():
        return out
    nmax = int(n.max())
    # padded byte matrices with DISTINCT pads so padding never matches
    Amat = np.full((P, mmax), -1, dtype=np.int16)
    Bmat = np.full((P, nmax), -2, dtype=np.int16)
    for i in range(P):
        if m[i]:
            Amat[i, : m[i]] = np.frombuffer(A[i], dtype=np.uint8)
        if n[i]:
            Bmat[i, : n[i]] = np.frombuffer(B[i], dtype=np.uint8)
    w = 2 * k + 1  # band position b <-> column j = i + b - k
    dp = np.full((P, w), INF, dtype=np.int32)
    for b in range(k, w):  # row 0: D[0][j] = j for j <= min(k, n)
        j = b - k
        dp[:, b] = np.where(j <= n, np.int32(j), INF)
    for i in range(1, mmax + 1):
        ai = Amat[:, i - 1]
        new = np.full((P, w), INF, dtype=np.int32)
        for b in range(w):
            j = i + b - k
            if j < 0 or j > nmax:
                continue
            # D[i-1][j-1] is band b of the previous row; D[i-1][j] is
            # band b+1; D[i][j-1] is band b-1 of THIS row (sequential in
            # b — the band is only 2k+1 wide, so this inner loop is 17
            # numpy ops, not a per-pair loop)
            if j >= 1:
                diag = dp[:, b] + (ai != Bmat[:, j - 1]).astype(np.int32)
            else:
                diag = np.full(P, INF, dtype=np.int32)
            up = dp[:, b + 1] + 1 if b + 1 < w else np.full(P, INF, np.int32)
            left = new[:, b - 1] + 1 if b >= 1 else np.full(P, INF, np.int32)
            v = np.minimum(np.minimum(diag, up), np.minimum(left, INF))
            new[:, b] = np.where(j <= n, v, INF)
        dp = new
        done = live & (m == i)
        if done.any():
            bidx = (n - i + k).astype(np.int64)  # band index of j = n
            ok = done & (bidx >= 0) & (bidx < w)
            out[ok] = dp[ok, bidx[ok]].astype(np.int64)
    return out


def _editdist_key_hash(lang, pfx) -> np.ndarray:
    """Deterministic uint64 of the (lang, pfx) blocking key, process- and
    ARRAY-CONTEXT-independent.

    The two parts are hashed separately and mixed — never joined with a
    separator — because (a) a separator that can occur in ``pfx`` would
    alias distinct keys, and (b) pandas ``hash_array``'s default
    categorize=True path silently corrupts hashes of strings with
    EMBEDDED NUL bytes (same string hashes differently across arrays,
    distinct strings collide); ``categorize=False`` uses the stable
    elementwise sip-hash path, which is value-identical for NUL-free
    input (fuzz-verified, tests/test_hashing.py)."""
    hl = pd.util.hash_array(np.asarray(list(lang), dtype=object), categorize=False)
    hp = pd.util.hash_array(np.asarray(list(pfx), dtype=object), categorize=False)
    h = hl * np.uint64(0x9E3779B97F4A7C15) ^ hp
    h ^= h >> np.uint64(29)
    return h * np.uint64(0xBF58476D1CE4E5B9)


def dedup_editdistance_pairs(sf_dir: str, broadcast_max_keys: int | None = None):
    """Character-level near-duplicate pairs: documents whose UTF-8-byte
    Levenshtein distance is <= ``EDITDIST_MAX`` — the typo/boilerplate-
    edit grade of duplication that token-level MinHash under-weighs.
    Blocking (both the engine and the SQL oracle, identically): same
    ``lang`` and same first ``EDITDIST_PREFIX`` characters; like any
    LSH-style banding, edits INSIDE the prefix move a pair out of scope
    (documented recall tradeoff, the simhash-banding precedent).

    Scale shape (the dedup_lines measured-cutover pattern):
    1. (lang, pfx, cnt) count partials -> tiny global groupby -> keys
       with cnt > 1 are the only blocks that can pair.  A streaming
       count probes that key set; under ``EDITDIST_BROADCAST_MAX_KEYS``
       the keys broadcast as ONE sorted uint64 hash array and the doc
       scan drops singleton-block docs MAP-SIDE — only docs inside
       multi-member blocks (the near-dup candidates, a vanishing
       fraction) ever ride the exchange.  Above the bound the filter is
       skipped and every doc shuffles once (documented fallback).
    2. ONE coarse key-hash exchange (``EDITDIST_PARTS``); inside each
       partition the kernel expands within-block pairs with repeat/
       offset arithmetic (no Python pair loop), prunes on byte-length
       gap, and runs ONE banded DP vectorized across all of the
       partition's pairs (`banded_edit_distances`).

    In-block pairing is quadratic in block size — blocks are exact
    (lang, 8-char-prefix) collisions, so a hot block means genuinely
    duplicated content (the simhash hot-bucket caveat applies)."""
    import pyarrow.compute as pc
    import ray

    from .core import partial_then_global as _partial_then_global
    from .schema import ensure_schema

    if broadcast_max_keys is None:
        broadcast_max_keys = EDITDIST_BROADCAST_MAX_KEYS

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.is_valid(batch["lang"]), pc.is_valid(batch["text"])
            )
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": batch["text"],
                "lang": batch["lang"],
                "pfx": pc.utf8_slice_codeunits(batch["text"], 0, EDITDIST_PREFIX),
            }
        )

    def docs():
        return _read_docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
            prep, batch_format="pyarrow"
        )

    def key_counts(batch: pa.Table) -> pa.Table:
        t = pa.table({"lang": batch["lang"], "pfx": batch["pfx"]})
        g = t.group_by(["lang", "pfx"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "pfx": g["pfx"],
                "cnt": pc.cast(g["count_all"], pa.int64()),
            }
        )

    multi = _partial_then_global(
        docs().map_batches(key_counts, batch_format="pyarrow"),
        ["lang", "pfx"],
        ["cnt"],
    ).map_batches(
        lambda b: b.filter(pc.greater(b["cnt"], pa.scalar(1, pa.int64()))),
        batch_format="pyarrow",
    )

    candidates = docs()
    n_multi = multi.count()  # streaming probe, nothing pinned yet
    if n_multi <= broadcast_max_keys:
        mk = multi.to_pandas()
        key_hashes = (
            np.sort(_editdist_key_hash(mk["lang"], mk["pfx"]))
            if len(mk)
            else np.empty(0, dtype=np.uint64)
        )
        keys_ref = ray.put(key_hashes)

        def keep_multi(b: pa.Table) -> pa.Table:
            kh = ray.get(keys_ref)
            if b.num_rows == 0 or len(kh) == 0:
                return b.slice(0, 0)
            h = _editdist_key_hash(
                b["lang"].to_pylist(), b["pfx"].to_pylist()
            )
            idx = np.minimum(np.searchsorted(kh, h), len(kh) - 1)
            return b.filter(pa.array(kh[idx] == h))

        candidates = candidates.map_batches(keep_multi, batch_format="pyarrow")

    def add_part(b: pa.Table) -> pa.Table:
        h = _editdist_key_hash(b["lang"].to_pylist(), b["pfx"].to_pylist())
        return b.append_column(
            "__part", pa.array((h % EDITDIST_PARTS).astype(np.int64))
        )

    def pairs_kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "pfx", "doc_id"]).reset_index(drop=True)
        codes, _ = pd.factorize(g["lang"] + "\x00" + g["pfx"], sort=False)
        counts = np.bincount(codes)
        starts = np.cumsum(counts) - counts
        pos = np.arange(len(g)) - starts[codes]
        second = np.repeat(np.arange(len(g)), pos)
        if len(second) == 0:
            return pd.DataFrame(
                {
                    "doc_a": np.empty(0, np.int64),
                    "doc_b": np.empty(0, np.int64),
                    "edit_dist": np.empty(0, np.int64),
                }
            )
        offsets = np.concatenate(([0], np.cumsum(pos)))
        first = np.arange(len(second)) - offsets[second] + starts[codes][second]
        texts = g["text"].to_numpy()
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        # byte-length gap > k cannot be within k edits: prune before the DP
        blen = np.fromiter(
            (len(t.encode("utf-8")) for t in texts), np.int64, len(texts)
        )
        keep = np.abs(blen[first] - blen[second]) <= EDITDIST_MAX
        first, second = first[keep], second[keep]
        d = banded_edit_distances(
            list(texts[first]), list(texts[second]), EDITDIST_MAX
        )
        hit = d <= EDITDIST_MAX
        return pd.DataFrame(
            {
                "doc_a": ids[first[hit]],  # block-sorted by doc_id: a < b
                "doc_b": ids[second[hit]],
                "edit_dist": d[hit],
            }
        )

    schema = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("edit_dist", pa.int64()),
        ]
    )
    return ensure_schema(
        candidates.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pairs_kernel, batch_format="pandas"),
        schema,
    )


KEEP_BEST_DOCID_BITS = 40
_KB_MASK = (1 << KEEP_BEST_DOCID_BITS) - 1


def dedup_keep_best(sf_dir: str):
    """Exact dedup that keeps the HIGHEST-QUALITY duplicate per content
    hash (ties by min doc_id) — what a curation pipeline actually wants:
    identical text can carry different metadata/provenance, and the
    keeper should be the best-scored copy, not the first-seen one.

    Scale shape: one fused scan computes hash + quality per batch (the
    ``corpus_clean_keep`` kernels) and packs (quality_ppm, doc_id) into
    ONE int64 argmax key — quality_ppm * 2^40 + (2^40 - 1 - doc_id) —
    so the whole reduce is a NATIVE map-side-combined Max + Count, no
    ``map_groups`` (one Python call per unique document would be
    billions of interpreter round trips on a web corpus).  The exchange
    moves (hash, key) pairs, never text.  Loud guard: doc_id must fit
    KEEP_BEST_DOCID_BITS (2^40; re-pack with a wider field if a corpus
    exceeds it)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max

    from .hashing import md5_hex
    from .text import normalized_flat_tokens, quality_from_tokens

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def prep(batch: pa.Table) -> pa.Table:
        parent, toks, n, text_col = normalized_flat_tokens(batch["text"])
        qual = quality_from_tokens(parent, toks, n, text_col)["quality_ppm"]
        qual = np.asarray(qual, dtype=np.int64)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(did) and (did.min() < 0 or did.max() > _KB_MASK):
            raise ValueError(
                "dedup_keep_best: doc_id outside [0, 2^40) breaks the "
                "packed argmax key — widen KEEP_BEST_DOCID_BITS"
            )
        key = (qual << KEEP_BEST_DOCID_BITS) + (_KB_MASK - did)
        t = pa.table(
            {
                "content_hash": md5_hex(batch["text"]),
                "key": pa.array(key, pa.int64()),
                "n": pa.array(np.ones(n, dtype=np.int64)),
            }
        )
        out = t.group_by(["content_hash"]).aggregate(
            [("key", "max"), ("n", "sum")]
        )
        return out.rename_columns(["content_hash", "key", "n"])

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Max("key", alias_name="key"), Sum("n", alias_name="n"))
    )

    def decode(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "content_hash": batch["content_hash"],
                "doc_id": pa.array(
                    _KB_MASK - (key & _KB_MASK), pa.int64()
                ),
                "quality_ppm": pa.array(
                    key >> KEEP_BEST_DOCID_BITS, pa.int64()
                ),
                "n_dups": pc.cast(batch["n"], pa.int64()),
            }
        )

    return agg.map_batches(decode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Cross-source template-leakage matrix: shared opening fingerprints
# ---------------------------------------------------------------------------

LEAK_PARTITIONS = 64
LEAK_PREFIX_TOKENS = 5

_LEAK_SCHEMA = pa.schema(
    [
        ("source_a", pa.string()),
        ("source_b", pa.string()),
        ("shared_hashes", pa.int64()),
    ]
)


def opening_fingerprint(text_col, prefix_tokens: int | None = None) -> pa.Array:
    """md5 of each doc's first ``prefix_tokens`` (default
    ``LEAK_PREFIX_TOKENS``) tokens joined by a space — value-identical to
    the oracle's ``md5(array_to_string(list_slice(toks, 1, 5), ' '))``.
    Fully vectorized: one RE2 tokenize pass, per-row positional clip via
    ``maximum.accumulate``, Arrow ``binary_join``, the shared vectorized
    md5 kernel.  Shared by the leakage matrix and the prefix-containment
    pairer so the bucket function lives once.

    Callers that build Ray UDF closures must read the module constant
    DRIVER-side and pass it explicitly: a bare global read inside the
    closure resolves in the WORKER's import of this module, where a
    driver-side monkeypatch/override is invisible."""
    import pyarrow.compute as pc

    from .hashing import md5_hex
    from .text import _flat_tokens_arrow

    if prefix_tokens is None:
        prefix_tokens = LEAK_PREFIX_TOKENS
    parent, flat, n_rows = _flat_tokens_arrow(text_col)
    counts = np.bincount(parent, minlength=n_rows)
    kept = np.minimum(counts, prefix_tokens)
    pos = np.arange(len(parent), dtype=np.int64)
    if len(parent):
        first = np.zeros(len(parent), dtype=np.int64)
        new = np.empty(len(parent), dtype=bool)
        new[0] = True
        new[1:] = parent[1:] != parent[:-1]
        first[new] = pos[new]
        pos = pos - np.maximum.accumulate(first)
    head = flat.filter(pa.array(pos < prefix_tokens))
    offsets = np.concatenate(([0], np.cumsum(kept))).astype(np.int32)
    prefix = pc.binary_join(pa.ListArray.from_arrays(pa.array(offsets), head), " ")
    return md5_hex(prefix)


def source_leakage_matrix(sf_dir: str):
    """Cross-source template-leakage audit: for every unordered source pair
    (a < b), the number of DISTINCT opening fingerprints (md5 of the first
    5 tokens) present in BOTH — boilerplate/template text that leaks across
    provenances is the classic train/eval contamination vector (the corpus
    has no EXACT cross-source dups, so the fingerprint is the doc's opening
    shingle; the hash function is shared with the oracle's
    ``md5(array_to_string(list_slice(toks, 1, 5), ' '))``).  Pairs with
    zero overlap are omitted (the oracle's inner self-join).

    Scale shape: each batch tokenizes once (the shared RE2 kernel), folds
    to its DISTINCT (fingerprint, source) pairs, and coarse-partitions on
    a vectorized digest-of-the-digest int64 — identity stays the FULL hex
    string, the int only routes.  Per partition, one vectorized kernel
    (sort, dedup, segment on hash change, basket-style repeat/offset pair
    expansion — source fan-out per hash is |sources|-bounded) folds to
    (source_a, source_b, n) partials; the final reduce is
    |sources|^2-bounded and returns a typed driver-side table (empty-safe
    per the Ray 2.49 empty-Dataset schema quirk)."""
    import pandas as pd

    from .core import coarse_int_partition, partial_then_global
    from .hashing import md5_hex, str_hash_u60
    from .text import _flat_tokens_arrow

    docs = _read_docs(sf_dir, ["source", "text"])
    # driver-time read so an override is captured by value in the closure
    # (a worker-side global read would miss it — see opening_fingerprint)
    prefix_tokens = LEAK_PREFIX_TOKENS

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "content_hash": opening_fingerprint(b["text"], prefix_tokens),
                "source": b["source"],
            }
        ).group_by(["content_hash", "source"]).aggregate([])
        pref = str_hash_u60(t["content_hash"])
        return t.append_column(
            "__hpart", pa.array(coarse_int_partition(pref, LEAK_PARTITIONS))
        )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["content_hash", "source"]).sort_values(
            ["content_hash", "source"]
        )
        n = len(g)
        empty = pd.DataFrame(
            {
                "source_a": pd.Series([], dtype=object),
                "source_b": pd.Series([], dtype=object),
                "shared_hashes": pd.Series([], dtype=np.int64),
            }
        )
        if n == 0:
            return empty
        h = g["content_hash"].to_numpy()
        s = g["source"].to_numpy()
        new_h = np.empty(n, dtype=bool)
        new_h[0] = True
        new_h[1:] = h[1:] != h[:-1]
        grp = np.cumsum(new_h) - 1
        starts = np.flatnonzero(new_h)
        sizes = np.diff(np.append(starts, n))
        local = np.arange(n, dtype=np.int64) - starts[grp]
        fan = sizes[grp] - 1 - local  # pair forward within the hash segment
        total = int(fan.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n, dtype=np.int64), fan)
        off0 = np.concatenate(([0], np.cumsum(fan)[:-1]))
        b_idx = np.arange(total, dtype=np.int64) - np.repeat(off0, fan) + a_idx + 1
        out = (
            pd.DataFrame({"source_a": s[a_idx], "source_b": s[b_idx]})
            .groupby(["source_a", "source_b"], sort=False)
            .size()
            .reset_index(name="shared_hashes")
        )
        out["shared_hashes"] = out["shared_hashes"].astype(np.int64)
        return out

    rows = partial_then_global(
        docs.map_batches(prep, batch_format="pyarrow")
        .groupby("__hpart")
        .map_groups(kernel, batch_format="pandas"),
        ["source_a", "source_b"],
        ["shared_hashes"],
    ).take_all()
    if not rows:
        return _LEAK_SCHEMA.empty_table()
    rows = sorted((r["source_a"], r["source_b"], int(r["shared_hashes"])) for r in rows)
    return pa.table(
        {
            "source_a": pa.array([r[0] for r in rows], pa.string()),
            "source_b": pa.array([r[1] for r in rows], pa.string()),
            "shared_hashes": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Prefix-containment dedup: doc A is a strict prefix of doc B
# ---------------------------------------------------------------------------

_PREFIX_PAIRS_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64())]
)


def dedup_prefix_containment_pairs(sf_dir: str):
    """Truncation-duplicate detection: pairs (doc_a, doc_b) where doc_a's
    FULL text is a strict prefix of doc_b's (the classic crawl artifact —
    the same page captured once truncated, once whole).  Candidate
    generation is the shared ``opening_fingerprint`` bucket (docs sharing
    their first-5-token opening), so the contract — mirrored EXACTLY by
    the oracle's join on the same fingerprint — is containment WITHIN
    opening-collision buckets; a prefix shorter than the fingerprint
    window is out of scope by construction (documented recall bound, the
    standard LSH-style candidate trade).

    Scale shape: ONE exchange routed by a digest-of-fingerprint int64;
    texts ship only for bucket members (collision-bounded, the
    editdistance-pairs cost class).  Per partition: sort by (fingerprint,
    byte length, doc_id), basket-style forward pair expansion within each
    bucket (quadratic ONLY in bucket size — the standard LSH bound), then
    a per-pair ``startswith`` check on strictly-shorter texts.  The pair
    table is collision-bounded and returns typed from the driver."""
    import pandas as pd

    from .core import coarse_int_partition
    from .hashing import str_hash_u60

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    prefix_tokens = LEAK_PREFIX_TOKENS  # driver-time read (see leakage matrix)

    def prep(b: pa.Table) -> pa.Table:
        h = opening_fingerprint(b["text"], prefix_tokens)
        return pa.table(
            {
                "h": h,
                "doc_id": b["doc_id"],
                "text": b["text"],
                "__hpart": pa.array(
                    coarse_int_partition(str_hash_u60(h), LEAK_PARTITIONS)
                ),
            }
        )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_a": pd.Series([], dtype=np.int64),
             "doc_b": pd.Series([], dtype=np.int64)}
        )
        n = len(g)
        if n == 0:
            return empty
        g = g.assign(__len=g["text"].str.len()).sort_values(
            ["h", "__len", "doc_id"]
        )
        h = g["h"].to_numpy()
        txt = g["text"].to_numpy()
        ln = g["__len"].to_numpy()
        ids = g["doc_id"].to_numpy()
        new_h = np.empty(n, dtype=bool)
        new_h[0] = True
        new_h[1:] = h[1:] != h[:-1]
        grp = np.cumsum(new_h) - 1
        starts = np.flatnonzero(new_h)
        sizes = np.diff(np.append(starts, n))
        local = np.arange(n, dtype=np.int64) - starts[grp]
        fan = sizes[grp] - 1 - local
        total = int(fan.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n, dtype=np.int64), fan)
        off0 = np.concatenate(([0], np.cumsum(fan)[:-1]))
        b_idx = np.arange(total, dtype=np.int64) - np.repeat(off0, fan) + a_idx + 1
        # strict-prefix check: strictly shorter AND startswith (bucket
        # pairs only — the quadratic is bucket-bounded, not corpus)
        keep = ln[a_idx] < ln[b_idx]
        a_idx, b_idx = a_idx[keep], b_idx[keep]
        hit = np.fromiter(
            (tb.startswith(ta) for ta, tb in zip(txt[a_idx], txt[b_idx])),
            dtype=bool,
            count=len(a_idx),
        )
        return pd.DataFrame(
            {
                "doc_a": ids[a_idx[hit]].astype(np.int64),
                "doc_b": ids[b_idx[hit]].astype(np.int64),
            }
        )

    rows = (
        docs.map_batches(prep, batch_format="pyarrow")
        .groupby("__hpart")
        .map_groups(kernel, batch_format="pandas")
        .take_all()
    )
    if not rows:
        return _PREFIX_PAIRS_SCHEMA.empty_table()
    rows = sorted((int(r["doc_a"]), int(r["doc_b"])) for r in rows)
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Duplicate-substring spans: global dup-span detection (Lee et al. 2022)
# ---------------------------------------------------------------------------

SUBSTR_K = 5  # gram width in tokens
SUBSTR_MIN_DOCS = 2  # a gram is "hot" iff it appears in >= this many docs
# under this many total per-doc-distinct gram rows, the driver folds the
# hot set itself and broadcasts one sorted int64 array (8 B/row); above it
# the fully distributed key-partition tier runs
SUBSTR_BROADCAST_MAX_KEYS = 16_000_000
SUBSTR_PARTS = 64

_SUBSTR_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("span_start", pa.int64()),
        ("span_end", pa.int64()),
    ]
)


def _gram_pos_rows(batch: pa.Table, k: int):
    """Every k-token gram occurrence of a batch with its 1-based token
    position.  Returns ``(ids, seg, pos, key, ntok)`` — ``seg`` indexes
    into ``ids``, ``key`` is the 60-bit md5 of the gram STRING (the
    oracle groups by the same function, so collisions cannot diverge the
    two sides), ``ntok`` is the per-row token count (all rows, even those
    too short for a gram).  Rows arrive sorted by (seg, pos) by
    construction: the flat token array is in document order."""
    import pyarrow.compute as pc

    from .hashing import str_hash_u60
    from .text import _flat_tokens_arrow

    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    parent, flat, n_rows = _flat_tokens_arrow(batch["text"])
    counts = np.bincount(parent, minlength=n_rows).astype(np.int64)
    m = len(flat)
    empty = (
        ids,
        np.empty(0, np.int64),
        np.empty(0, np.int64),
        np.empty(0, np.int64),
        counts,
    )
    if m < k:
        return empty
    w = m - k + 1
    valid = parent[:w] == parent[k - 1 :]
    if not valid.any():
        return empty
    grams = pc.binary_join_element_wise(
        *(flat.slice(i, w) for i in range(k)), " "
    ).filter(pa.array(valid))
    idx = np.flatnonzero(valid)
    seg = parent[idx]
    row_start = np.concatenate(([0], np.cumsum(counts)[:-1]))
    pos = (idx - row_start[seg] + 1).astype(np.int64)
    return ids, seg, pos, str_hash_u60(grams), counts


def _merge_islands(doc: np.ndarray, pos: np.ndarray, k: int):
    """Maximal covered token spans from (doc, pos) gram hits SORTED by
    (doc, pos), each hit covering [pos, pos+k-1].  Two hits belong to one
    span iff their covered ranges overlap or touch (pos step <= k).
    Returns ``(doc, span_start, span_end)`` per island."""
    n = len(pos)
    if n == 0:
        e = np.empty(0, np.int64)
        return e, e, e
    brk = np.ones(n, dtype=bool)
    brk[1:] = (doc[1:] != doc[:-1]) | (pos[1:] - pos[:-1] > k)
    si = np.flatnonzero(brk)
    ei = np.append(si[1:], n) - 1
    return doc[si], pos[si], pos[ei] + k - 1


def dedup_substring_spans(
    sf_dir: str, broadcast_max_keys: int = SUBSTR_BROADCAST_MAX_KEYS
):
    """Global duplicate-substring detection (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" ExactSubstr
    pass, re-expressed over word k-grams): a token position is DUPLICATED
    if it is covered by a ``SUBSTR_K``-gram occurring in at least
    ``SUBSTR_MIN_DOCS`` distinct documents; the result is each document's
    maximal duplicated spans as 1-based token ranges
    ``(doc_id, span_start, span_end)`` — the spans a curation pass cuts
    out of the training text.

    Scale shape — two tiers, chosen by a MEASURED streaming probe of the
    per-doc-distinct gram-key volume (mirrors ``decontaminate_ngrams``):

    - broadcast tier: keys stream to the driver (8 B/row, bounded by the
      probe), one ``np.unique(return_counts)`` folds the hot set (grams
      repeated across >= MIN_DOCS docs — a tiny fraction of the corpus),
      ``ray.put`` once; a second pass re-derives gram positions per batch,
      marks hits by searchsorted and island-merges MAP-SIDE (a doc lives
      wholly in one batch).  ZERO shuffle.
    - distributed tier: (key, doc_id, pos) rows — 24 B/gram, text never
      shuffles — one coarse key-hash exchange, per-partition lexsort
      kernel keeps rows of hot keys (distinct-doc counts are exact:
      a key's rows are co-partitioned), then one doc-hash exchange and a
      vectorized per-partition island merge.

    Tiers are equality-pinned against each other and the SQL oracle
    (tests/test_dedup_lines.py)."""
    import ray

    from .schema import ensure_schema

    k = SUBSTR_K  # driver-time read

    # streaming probe: counts rows without pinning them; the collection
    # inside the helper re-executes the scan only when the volume is
    # known-bounded
    hot = _substr_hot_keys(sf_dir, k, SUBSTR_MIN_DOCS, broadcast_max_keys)
    if hot is None:
        return _substring_spans_distributed(sf_dir)
    if len(hot) == 0:
        # typed empty short-circuit (a fully-empty Ray Dataset loses its
        # schema in to_pandas/take_all; pa.Table keeps it)
        return _SUBSTR_SCHEMA.empty_table()
    hot_ref = ray.put(hot)

    def spans(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)  # zero-copy view of the shared array
        ids, seg, pos, key, _ntok = _gram_pos_rows(batch, k)
        if len(key) == 0:
            return _SUBSTR_SCHEMA.empty_table()
        p = np.searchsorted(hot, key)
        m = (p < len(hot)) & (hot[np.minimum(p, len(hot) - 1)] == key)
        if not m.any():
            return _SUBSTR_SCHEMA.empty_table()
        # (seg, pos) are sorted by construction; islands merge map-side
        d, s, e = _merge_islands(ids[seg[m]], pos[m], k)
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "span_start": pa.array(s, pa.int64()),
                "span_end": pa.array(e, pa.int64()),
            }
        )

    return ensure_schema(
        _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
            spans, batch_format="pyarrow"
        ),
        _SUBSTR_SCHEMA,
    )


def _substr_hot_keys(
    sf_dir: str, k: int, min_docs: int, broadcast_max_keys: int
):
    """Hot-key discovery for the broadcast tiers of the duplicate-substring
    family.  Streams a count probe of the per-doc-distinct gram-key rows;
    over the cutover returns ``None`` (caller takes the distributed tier),
    otherwise collects the rows (8 B each, probe-bounded), folds them with
    one ``np.unique(return_counts)`` and returns the SORTED int64 array of
    keys occurring in >= ``min_docs`` distinct docs."""

    def pair_keys(batch: pa.Table) -> pa.Table:
        # distinct (doc, key) per batch — a doc lives in one batch, so
        # batch-level distinct IS global per-doc distinct
        ids, seg, pos, key, _ntok = _gram_pos_rows(batch, k)
        if len(key) == 0:
            return pa.table({"key": pa.array([], pa.int64())})
        order = np.lexsort((key, seg))
        s2, k2 = seg[order], key[order]
        first = np.ones(len(s2), dtype=bool)
        first[1:] = (s2[1:] != s2[:-1]) | (k2[1:] != k2[:-1])
        return pa.table({"key": pa.array(k2[first], pa.int64())})

    keys_ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        pair_keys, batch_format="pyarrow"
    )
    if keys_ds.count() > broadcast_max_keys:
        return None
    parts = [
        b["key"].to_numpy(zero_copy_only=False)
        for b in keys_ds.iter_batches(batch_format="pyarrow")
    ]
    allk = np.concatenate(parts) if parts else np.empty(0, np.int64)
    uk, cnt = np.unique(allk, return_counts=True)
    return uk[cnt >= min_docs]


def _substring_spans_distributed(sf_dir: str):
    """Distributed tier of ``dedup_substring_spans`` — see its docstring."""
    from .core import coarse_int_partition
    from .schema import ensure_schema

    k, min_docs = SUBSTR_K, SUBSTR_MIN_DOCS

    def rows(batch: pa.Table) -> pa.Table:
        ids, seg, pos, key, _ntok = _gram_pos_rows(batch, k)
        return pa.table(
            {
                "part": pa.array(coarse_int_partition(key, SUBSTR_PARTS)),
                "key": pa.array(key, pa.int64()),
                "doc_id": pa.array(ids[seg], pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    def hot_hits(g: pd.DataFrame) -> pd.DataFrame:
        """Keep gram occurrences whose key lives in >= min_docs distinct
        docs — exact within the partition (a key's rows co-partition)."""
        key = g["key"].to_numpy()
        doc = g["doc_id"].to_numpy()
        pos = g["pos"].to_numpy()
        order = np.lexsort((doc, key))
        k2, d2 = key[order], doc[order]
        new_key = np.ones(len(k2), dtype=bool)
        new_key[1:] = k2[1:] != k2[:-1]
        new_pair = np.ones(len(k2), dtype=bool)
        new_pair[1:] = new_key[1:] | (d2[1:] != d2[:-1])
        seg_of = np.cumsum(new_key) - 1
        ndocs = np.bincount(seg_of[new_pair], minlength=int(seg_of[-1]) + 1)
        keep = (ndocs >= min_docs)[seg_of]
        d_keep = d2[keep]
        p_keep = pos[order][keep]
        return pd.DataFrame(
            {
                "dpart": coarse_int_partition(d_keep, SUBSTR_PARTS),
                "doc_id": d_keep,
                "pos": p_keep,
            }
        )

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        doc = g["doc_id"].to_numpy()
        pos = g["pos"].to_numpy()
        order = np.lexsort((pos, doc))
        d, s, e = _merge_islands(doc[order], pos[order], k)
        return pd.DataFrame(
            {
                "doc_id": d.astype(np.int64),
                "span_start": s.astype(np.int64),
                "span_end": e.astype(np.int64),
            }
        )

    # hits = duplicated-gram occurrences only — bounded by the corpus dup
    # rate, so pinning them is cheap; the count probe lets an all-unique
    # corpus short-circuit typed instead of losing the schema in the
    # fully-empty second exchange
    hits = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(hot_hits, batch_format="pandas")
        .materialize()
    )
    if hits.count() == 0:
        return _SUBSTR_SCHEMA.empty_table()
    ds = hits.groupby("dpart").map_groups(islands, batch_format="pandas")
    return ensure_schema(ds, _SUBSTR_SCHEMA)


_DUPSTATS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("dup_tokens", pa.int64()),
        ("dup_ppm", pa.int64()),
    ]
)


def doc_dup_span_stats(
    sf_dir: str, broadcast_max_keys: int = SUBSTR_BROADCAST_MAX_KEYS
):
    """Per-document duplicated-token share: for every doc with >= 1 token,
    how many of its token positions are covered by a cross-doc-duplicated
    ``SUBSTR_K``-gram (the ``dedup_substring_spans`` criterion) and the
    integer-ppm share — the per-doc boilerplate metric a curation pass
    thresholds on before cutting or down-weighting.

    Output: (doc_id, n_tokens, dup_tokens, dup_ppm) with
    dup_ppm = dup_tokens * 1e6 // n_tokens.

    Scale shape mirrors ``dedup_substring_spans``: broadcast tier marks
    hits and sums island lengths MAP-SIDE (zero shuffle); distributed
    tier reuses the two-exchange hit pipeline plus one marker row per doc
    (pos = -n_tokens, the ``dedup_lines`` marker idiom) unioned before
    the doc-hash exchange so zero-dup docs still emit.  Tiers and the
    SQL oracle are equality-pinned (tests/test_dedup_lines.py)."""
    import ray

    from .schema import ensure_schema

    k = SUBSTR_K

    hot = _substr_hot_keys(sf_dir, k, SUBSTR_MIN_DOCS, broadcast_max_keys)
    if hot is None:
        return _dup_span_stats_distributed(sf_dir)
    hot_ref = ray.put(hot)

    def stats(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)  # zero-copy view of the shared array
        ids, seg, pos, key, ntok = _gram_pos_rows(batch, k)
        dup = np.zeros(len(ids), dtype=np.int64)
        if len(key) and len(hot):
            p = np.searchsorted(hot, key)
            m = (p < len(hot)) & (hot[np.minimum(p, len(hot) - 1)] == key)
            if m.any():
                # seg values are row indices, so islands land per row
                d, s, e = _merge_islands(seg[m], pos[m], k)
                np.add.at(dup, d, e - s + 1)
        keep = ntok >= 1
        n_t = ntok[keep]
        dd = dup[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "n_tokens": pa.array(n_t, pa.int64()),
                "dup_tokens": pa.array(dd, pa.int64()),
                "dup_ppm": pa.array(dd * 1_000_000 // n_t, pa.int64()),
            }
        )

    # materialize the slim result (32 B/doc, spillable — the dedup_lines
    # trade: bytes for a typed-empty guard without a second stats pass)
    ds = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(stats, batch_format="pyarrow")
        .materialize()
    )
    if ds.count() == 0:
        # typed empty short-circuit (a fully-empty Ray Dataset loses its
        # schema in to_pandas/take_all; pa.Table keeps it)
        return _DUPSTATS_SCHEMA.empty_table()
    return ensure_schema(ds, _DUPSTATS_SCHEMA)


def _dup_span_stats_distributed(sf_dir: str):
    """Distributed tier of ``doc_dup_span_stats`` — see its docstring."""
    from .core import coarse_int_partition
    from .schema import ensure_schema

    k, min_docs = SUBSTR_K, SUBSTR_MIN_DOCS

    def rows(batch: pa.Table) -> pa.Table:
        ids, seg, pos, key, _ntok = _gram_pos_rows(batch, k)
        return pa.table(
            {
                "part": pa.array(coarse_int_partition(key, SUBSTR_PARTS)),
                "key": pa.array(key, pa.int64()),
                "doc_id": pa.array(ids[seg], pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    def hot_hits(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy()
        doc = g["doc_id"].to_numpy()
        pos = g["pos"].to_numpy()
        order = np.lexsort((doc, key))
        k2, d2 = key[order], doc[order]
        new_key = np.ones(len(k2), dtype=bool)
        new_key[1:] = k2[1:] != k2[:-1]
        new_pair = np.ones(len(k2), dtype=bool)
        new_pair[1:] = new_key[1:] | (d2[1:] != d2[:-1])
        seg_of = np.cumsum(new_key) - 1
        ndocs = np.bincount(seg_of[new_pair], minlength=int(seg_of[-1]) + 1)
        keep = (ndocs >= min_docs)[seg_of]
        d_keep = d2[keep]
        return pd.DataFrame(
            {
                "dpart": coarse_int_partition(d_keep, SUBSTR_PARTS),
                "doc_id": d_keep,
                "pos": pos[order][keep],
            }
        )

    def markers(batch: pa.Table) -> pa.Table:
        # one row per doc with >= 1 token, pos = -n_tokens (hit rows are
        # always >= 1, so the sign separates the streams after the union)
        ids, _seg, _pos, _key, ntok = _gram_pos_rows(batch, k)
        keep = ntok >= 1
        ids, ntok = ids[keep], ntok[keep]
        return pa.table(
            {
                "dpart": pa.array(coarse_int_partition(ids, SUBSTR_PARTS)),
                "doc_id": pa.array(ids, pa.int64()),
                "pos": pa.array(-ntok, pa.int64()),
            }
        )

    hits = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(hot_hits, batch_format="pandas")
        .map_batches(
            lambda b: b.select(["dpart", "doc_id", "pos"]),
            batch_format="pyarrow",
        )
    )
    marker_ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        markers, batch_format="pyarrow"
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        doc = g["doc_id"].to_numpy()
        pos = g["pos"].to_numpy()
        is_mark = pos <= 0
        morder = np.argsort(doc[is_mark], kind="stable")
        mdoc = doc[is_mark][morder]
        ntok = -pos[is_mark][morder]
        hdoc = doc[~is_mark]
        hpos = pos[~is_mark]
        dup = np.zeros(len(mdoc), dtype=np.int64)
        if len(hdoc):
            order = np.lexsort((hpos, hdoc))
            d, s, e = _merge_islands(hdoc[order], hpos[order], k)
            # every hit doc has >= k tokens, hence exactly one marker row
            np.add.at(dup, np.searchsorted(mdoc, d), e - s + 1)
        return pd.DataFrame(
            {
                "doc_id": mdoc,
                "n_tokens": ntok,
                "dup_tokens": dup,
                "dup_ppm": dup * 1_000_000 // ntok,
            }
        )

    ds = (
        marker_ds.union(hits)
        .groupby("dpart")
        .map_groups(kernel, batch_format="pandas")
        .materialize()  # slim per-doc rows; typed-empty guard as above
    )
    if ds.count() == 0:
        return _DUPSTATS_SCHEMA.empty_table()
    return ensure_schema(ds, _DUPSTATS_SCHEMA)
