"""Similarity search over the ``embeddings`` table (list<float> column).

- Brute-force cosine top-k: the baseline — a broadcast query matrix
  (``ray.put`` once) against every batch, numpy float64 matmul, per-batch
  partial top-k, then a tiny per-query merge.  No shuffle of the corpus.
- LSH-bucketed variant: random-hyperplane signatures bucket the corpus; only
  same-bucket candidates are scored — the scale path when the corpus no
  longer fits a per-batch scan.
- Embedding-cosine near-dup pairs (threshold) — the dedup family member.

All cosines are computed in float64 to match DuckDB's DOUBLE arithmetic in
the oracle SQL; outputs carry ranks/ids only (no floats) so value-hash
comparison is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

KNN_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
NEARDUP_COS_PPM = 300_000  # cosine >= 0.30
# hard cap for the exact O(n^2) near-dup baseline (corpus matrix broadcast):
# ~1M x 64 float32 ≈ 256 MiB per worker heap; beyond this use the LSH path
NEARDUP_BRUTE_MAX_ROWS = 1_000_000
# Tuned offline on the synthetic embeddings (near-random vectors, the
# hardest case for hyperplane LSH): 8 planes / Hamming radius 3 gives
# ~0.6 recall@5 while scanning ~38% of the corpus.  Clustered real-world
# embeddings do far better at tighter radii.
LSH_PLANES = 8
LSH_HAM_RADIUS = 3
_POPCNT = np.array([bin(i).count("1") for i in range(1 << LSH_PLANES)], dtype=np.int64)

_rng = np.random.default_rng(20240818)


def _read_emb(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    emb = batch["embedding"]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    import pyarrow.compute as pc

    flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // max(1, len(ids))
    return ids, flat.reshape(len(ids), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _load_queries(sf_dir: str):
    """The query matrix: embeddings with vec_id < N_QUERIES (tiny)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids, m = _emb_matrix(t)
    sel = ids < N_QUERIES
    order = np.argsort(ids[sel])
    return ids[sel][order], m[sel][order]


def knn_brute(sf_dir: str):
    """Top-K cosine neighbors per query vector -> (query_id, neighbor_id,
    rank).  Per-batch partial top-K, then groupby(query_id) merges partials
    (K rows per query per block shuffle — not the corpus)."""
    import ray

    qids, qm = _load_queries(sf_dir)
    q_ref = ray.put((qids, _normalize(qm)))

    def score(batch: pa.Table) -> pa.Table:
        qi, qn = ray.get(q_ref)
        ids, m = _emb_matrix(batch)
        sims = _normalize(m) @ qn.T  # [n, q]
        out_q, out_n, out_s = [], [], []
        for c in range(len(qi)):
            col = sims[:, c]
            mask = ids != qi[c]
            cand = np.nonzero(mask)[0]
            if cand.size == 0:
                continue
            take = min(KNN_K, cand.size)
            # partial top-k by (sim desc, vec_id asc)
            ordk = cand[np.lexsort((ids[cand], -col[cand]))][:take]
            out_q.extend([int(qi[c])] * len(ordk))
            out_n.extend(int(ids[i]) for i in ordk)
            out_s.extend(float(col[i]) for i in ordk)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = _read_emb(sf_dir).map_batches(score, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(KNN_K)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"],
                "neighbor_id": g["neighbor_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def neardup_pairs(sf_dir: str):
    """All pairs (a < b) with cosine >= 0.30 -> (vec_a, vec_b).

    EXACT baseline: the corpus matrix is broadcast once and each batch
    scores its rows against ids > own id only, so every pair is emitted
    exactly once.  O(n^2) compute with O(corpus) per-worker memory — only
    viable while the corpus matrix fits a worker heap.  The scale shape is
    ``neardup_pairs_lsh`` below (banded hyperplane LSH; no corpus-sized
    broadcast, recall-gated in tests).  Guard-railed: refuses corpora above
    ``NEARDUP_BRUTE_MAX_ROWS`` so nobody silently ``ray.put``s a
    billion-vector matrix — use the LSH path there."""
    import pyarrow.parquet as pq
    import ray

    meta = pq.read_metadata(f"{sf_dir}/embeddings.parquet")
    if meta.num_rows > NEARDUP_BRUTE_MAX_ROWS:
        raise ValueError(
            f"embedding_neardup_pairs is the exact O(n^2) baseline and is "
            f"capped at {NEARDUP_BRUTE_MAX_ROWS} vectors (corpus has "
            f"{meta.num_rows}); use embedding_neardup_pairs_lsh, the scale "
            f"path, instead"
        )
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_ids, all_m = _emb_matrix(t)
    order = np.argsort(all_ids)
    ref = ray.put((all_ids[order], _normalize(all_m[order])))

    def score(batch: pa.Table) -> pa.Table:
        aids, an = ray.get(ref)
        ids, m = _emb_matrix(batch)
        sims = _normalize(m) @ an.T
        thresh = NEARDUP_COS_PPM / 1_000_000.0
        mask = (sims >= thresh) & (aids[None, :] > ids[:, None])
        r, c = np.nonzero(mask)  # row-major: same emit order as a row loop
        return pa.table(
            {
                "vec_a": pa.array(ids[r].astype(np.int64)),
                "vec_b": pa.array(aids[c].astype(np.int64)),
            }
        )

    return _read_emb(sf_dir).map_batches(score, batch_format="pyarrow")


# Banded LSH for near-dup pairs: T independent tables of k hyperplanes.
# For cosine >= 0.30 (theta ~= 72.5deg, per-plane agree p ~= 0.597) this
# gives ~0.80 expected recall on near-random vectors (the synthetic
# worst case); clustered real embeddings do much better.  Pair recall vs
# the exact baseline is pytest-gated, so the tradeoff stays visible.
NEARDUP_LSH_TABLES = 12
NEARDUP_LSH_PLANES = 4
NEARDUP_PAIR_PARTITIONS = 64  # coarse hash partitions for bucket pairing


def neardup_pairs_lsh(sf_dir: str):
    """Near-dup pairs via banded hyperplane LSH -> (vec_a, vec_b), every
    emitted pair exact-cosine-verified >= 0.30.  Fully distributed — the
    scale shape for ``neardup_pairs`` (which broadcasts the whole corpus):

    1. per batch: T band codes per vector (T tables x k planes,
       deterministic seed), emitting (part, band_key, vec_id, normalized
       embedding bytes) rows — the embedding rides WITH its band row, so
       verification never needs a join back to the corpus;
    2. coarse hash partitions (band_key % 64) pair and VERIFY same-code
       vectors in one map_groups: a per-bucket gram matrix (BLAS) applies
       the exact cosine threshold at candidate-generation time, so only
       verified pairs ever leave the stage;
    3. cross-table dedup of the (small) verified pair set via the
       distributed pair dedup.

    Shuffle volume is n x T embedding rows — independent of the candidate
    count — vs (pairs x 2) embedding copies for a join-based verify; the
    fused shape wins whenever buckets average >2 occupants, and removes
    three exchanges (pair dedup before verify + two embedding joins).

    Per-bucket pairing is quadratic in bucket size (gram matrix) — the
    standard LSH caveat; k (planes/table) is the knob that bounds bucket
    occupancy, and a bucket must fit one worker.
    """

    def band_rows(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        mn = _normalize(m)
        rng = np.random.default_rng(20240819)
        planes = rng.standard_normal(
            (m.shape[1], NEARDUP_LSH_TABLES * NEARDUP_LSH_PLANES)
        )
        bits = (mn @ planes) > 0
        codes = bits.reshape(len(ids), NEARDUP_LSH_TABLES, NEARDUP_LSH_PLANES) @ (
            1 << np.arange(NEARDUP_LSH_PLANES)
        )  # [n, T]
        table_idx = np.tile(np.arange(NEARDUP_LSH_TABLES, dtype=np.int64), len(ids))
        band_key = codes.reshape(-1).astype(np.int64) * NEARDUP_LSH_TABLES + table_idx
        emb_bytes = [row.tobytes() for row in mn]
        return pa.table(
            {
                "part": pa.array(
                    (band_key % NEARDUP_PAIR_PARTITIONS).astype(np.int32), pa.int32()
                ),
                "band_key": pa.array(band_key, pa.int64()),
                "vec_id": pa.array(
                    np.repeat(ids.astype(np.int64), NEARDUP_LSH_TABLES)
                ),
                "emb": pa.array(
                    [emb_bytes[i] for i in range(len(ids)) for _ in range(NEARDUP_LSH_TABLES)],
                    pa.binary(),
                ),
            }
        )

    bands = _read_emb(sf_dir).map_batches(band_rows, batch_format="pyarrow")

    thresh = NEARDUP_COS_PPM / 1_000_000.0

    def verified_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby("band_key", sort=False):
            grp = grp.drop_duplicates("vec_id")
            if len(grp) < 2:
                continue
            ids = grp["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            emb = grp["emb"].to_numpy()[order]
            mn = np.frombuffer(b"".join(emb), dtype=np.float64).reshape(len(ids), -1)
            iu = np.triu_indices(len(ids), k=1)
            keep = (mn @ mn.T)[iu] >= thresh
            out_a.append(ids[iu[0][keep]].astype(np.int64))
            out_b.append(ids[iu[1][keep]].astype(np.int64))
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a) if out_a else np.empty(0, np.int64),
                "vec_b": np.concatenate(out_b) if out_b else np.empty(0, np.int64),
            }
        ).drop_duplicates()

    pairs = bands.groupby("part").map_groups(verified_pairs, batch_format="pandas")
    from .dedup import dedup_pair_rows
    from .schema import ensure_schema

    return ensure_schema(
        dedup_pair_rows(pairs, ("vec_a", "vec_b")),
        pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())]),
    )


def lsh_buckets(sf_dir: str):
    """Random-hyperplane LSH: (vec_id, bucket) + per-bucket counts — the
    scale path for ANN: same-bucket candidates only.  Deterministic planes
    (fixed seed, dimension inferred from the first batch)."""
    def bucketize(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        rng = np.random.default_rng(20240818)
        planes = rng.standard_normal((m.shape[1], LSH_PLANES))
        bits = (m @ planes) > 0
        vals = bits @ (1 << np.arange(LSH_PLANES))
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "bucket": pa.array(vals.astype(np.int64)),
            }
        )

    return _read_emb(sf_dir).map_batches(bucketize, batch_format="pyarrow")


IVF_CLUSTERS = 8
IVF_NPROBE = 4
IVF_ITERS = 2
# 2^28 fixed-point scale for Lloyd partial sums: |sum per dim per cluster|
# <= corpus rows, so int64 holds ~2^35 rows per cluster before overflow
_IVF_FIX = float(1 << 28)


def _ivf_centroids(sf_dir: str) -> np.ndarray:
    """Deterministic mini-kmeans over the corpus, Ray-native: centroids are
    broadcast, each batch emits per-centroid partial sums (C x dim + counts),
    the driver reduces the tiny partials and updates — Lloyd iterations with
    no shuffle of the corpus (the pre-aggregate-inside-map_batches pattern)."""
    import ray

    ids0, m0 = _load_queries(sf_dir)  # reuse: any deterministic seed rows
    # seed centroids: first IVF_CLUSTERS query vectors padded by jitter
    rng = np.random.default_rng(7)
    cents = _normalize(
        np.concatenate(
            [m0, rng.standard_normal((max(0, IVF_CLUSTERS - len(m0)), m0.shape[1]))]
        )[:IVF_CLUSTERS]
    )
    ds = _read_emb(sf_dir)
    for _ in range(IVF_ITERS):
        ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            _, m = _emb_matrix(batch)
            mn = _normalize(m)
            assign = np.argmax(mn @ c.T, axis=1)
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            np.add.at(sums, assign, mn)
            np.add.at(counts, assign, 1)
            # fixed-point partials: integer addition is associative, so the
            # merged centroids are deterministic regardless of the order the
            # partial rows arrive in (float += would drift with scheduling)
            q = np.round(sums * _IVF_FIX).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(c)), pa.int64()),
                    "count": pa.array(counts),
                    "sum_fix": pa.array(list(q), pa.list_(pa.int64())),
                }
            )

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums_fix = np.zeros(cents.shape, dtype=np.int64)
        counts = np.zeros(len(cents), dtype=np.int64)
        for r in rows:
            sums_fix[r["cluster"]] += np.asarray(r["sum_fix"], dtype=np.int64)
            counts[r["cluster"]] += r["count"]
        nonzero = counts > 0
        sums = sums_fix.astype(np.float64) / _IVF_FIX
        cents[nonzero] = _normalize(sums[nonzero] / counts[nonzero, None])
    return cents


def ivf_assign(sf_dir: str):
    """(vec_id, cluster) — IVF coarse quantization of the corpus."""
    import ray

    cents = _ivf_centroids(sf_dir)
    ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        ids, m = _emb_matrix(batch)
        a = np.argmax(_normalize(m) @ c.T, axis=1)
        return pa.table(
            {"vec_id": pa.array(ids), "cluster": pa.array(a.astype(np.int64))}
        )

    return _read_emb(sf_dir).map_batches(assign, batch_format="pyarrow")


def knn_ivf(sf_dir: str, nprobe: int = IVF_NPROBE):
    """IVF ANN top-K: each query probes its ``nprobe`` nearest clusters; only
    vectors assigned to those clusters are cosine-scored.  With
    ``nprobe == IVF_CLUSTERS`` this degrades to an exact scan (asserted equal
    to knn_brute in tests); smaller nprobe trades recall for scan fraction."""
    import ray

    cents = _ivf_centroids(sf_dir)
    qids, qm = _load_queries(sf_dir)
    qn = _normalize(qm)
    probes = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]
    ref = ray.put((qids, qn, probes, cents))

    def score(batch: pa.Table) -> pa.Table:
        qi, qnorm, qprobe, c = ray.get(ref)
        ids, m = _emb_matrix(batch)
        mn = _normalize(m)
        assign = np.argmax(mn @ c.T, axis=1)
        out_q, out_n, out_s = [], [], []
        for k in range(len(qi)):
            cand = np.nonzero(np.isin(assign, qprobe[k]) & (ids != qi[k]))[0]
            if cand.size == 0:
                continue
            sims = mn[cand] @ qnorm[k]
            take = min(KNN_K, cand.size)
            ordk = cand[np.lexsort((ids[cand], -sims))][:take]
            out_q.extend([int(qi[k])] * len(ordk))
            out_n.extend(int(ids[i]) for i in ordk)
            out_s.extend(float(mn[i] @ qnorm[k]) for i in ordk)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = _read_emb(sf_dir).map_batches(score, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(KNN_K)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"],
                "neighbor_id": g["neighbor_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def knn_lsh(sf_dir: str):
    """ANN top-K via hyperplane LSH: candidates = corpus rows whose bucket
    code is within LSH_HAM_RADIUS bits of the query's code; only candidates
    are cosine-scored.  Returns (query_id, neighbor_id, rank) like knn_brute;
    recall vs brute is asserted in tests (approximate by design, so it is
    not a driver-checked query)."""
    import ray

    qids, qm = _load_queries(sf_dir)
    qn = _normalize(qm)
    rng = np.random.default_rng(20240818)
    planes = rng.standard_normal((qm.shape[1], LSH_PLANES))
    qbuck = ((qn @ planes) > 0) @ (1 << np.arange(LSH_PLANES))
    ref = ray.put((qids, qn, qbuck))

    def score(batch: pa.Table) -> pa.Table:
        qi, qnorm, qb = ray.get(ref)
        ids, m = _emb_matrix(batch)
        mn = _normalize(m)
        bits = (mn @ planes) > 0
        buck = bits @ (1 << np.arange(LSH_PLANES))
        out_q, out_n, out_s = [], [], []
        for c in range(len(qi)):
            # candidates: bucket codes within LSH_HAM_RADIUS bits
            ham = _POPCNT[np.bitwise_xor(buck.astype(np.int64), int(qb[c]))]
            cand = np.nonzero((ham <= LSH_HAM_RADIUS) & (ids != qi[c]))[0]
            if cand.size == 0:
                continue
            sims = mn[cand] @ qnorm[c]
            take = min(KNN_K, cand.size)
            ordk = cand[np.lexsort((ids[cand], -sims))][:take]
            sims_sorted = mn[ordk] @ qnorm[c]
            out_q.extend([int(qi[c])] * len(ordk))
            out_n.extend(int(ids[i]) for i in ordk)
            out_s.extend(float(s) for s in sims_sorted)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = _read_emb(sf_dir).map_batches(score, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(KNN_K)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"],
                "neighbor_id": g["neighbor_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# Label-centroid embedding eval (nearest-class-mean classification)
# ---------------------------------------------------------------------------

CENT_FP = 1_000_000  # fixed-point ppm scale (the engine-wide convention)


def _fp_ppm(m: np.ndarray) -> np.ndarray:
    """float matrix -> int64 fixed-point ppm, half away from zero — the
    `numeric.cents_np` convention at 10^6 scale, mirrored by the oracle's
    `CAST(round(e * 1000000) AS BIGINT)` (DuckDB round = half away)."""
    x = np.asarray(m, dtype=np.float64) * CENT_FP
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def label_centroids(sf_dir: str):
    """Per-label mean embedding in exact fixed-point integers:
    (label, dim, centroid_fp) rows, centroid_fp = trunc(sum_fp / n).

    Float sums are order-dependent; converting every element to int64 ppm
    FIRST makes the sum associative — any partial order merges to the
    same bits, so the result is hash-stable and SQL-oracle-matched.
    Shape: per-batch (label, dim, sum, n) partials (labels x dims rows
    per batch, input-size-independent) -> native Sum groupby."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .numeric import trunc_div_np
    from .schema import ensure_schema

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        _, m = _emb_matrix(batch)
        fp = _fp_ppm(m)
        labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        k, d = len(uniq), fp.shape[1] if len(fp) else 0
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, inv, fp)
        cnt = np.bincount(inv, minlength=k).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                "s": pa.array(sums.reshape(-1), pa.int64()),
                "n": pa.array(np.repeat(cnt, d), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s"), Sum("n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        s = batch["sum(s)"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
        import pyarrow.compute as pc

        return pa.table(
            {
                "label": pc.cast(batch["label"], pa.int64()),
                "dim": pc.cast(batch["dim"], pa.int64()),
                # sums can be negative: trunc division (DuckDB //)
                "centroid_fp": pa.array(trunc_div_np(s, n), pa.int64()),
            }
        )

    return ensure_schema(
        agg.map_batches(finish, batch_format="pyarrow"),
        pa.schema(
            [
                ("label", pa.int64()),
                ("dim", pa.int64()),
                ("centroid_fp", pa.int64()),
            ]
        ),
    )


def centroid_confusion(sf_dir: str):
    """Nearest-centroid classification confusion matrix: assign every
    vector to the label whose centroid has the max integer dot product
    (ties -> smaller label), report (label_true, label_pred, n).

    Scale: centroids (labels x dims int64, KBs) broadcast via ``ray.put``;
    the assign pass is one int64 matmul per batch (exact — |dot| <=
    dims x ppm^2 ~ 6e13 << 2^63); counts partial-combine in the groupby."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    from .schema import ensure_schema

    cent = (
        label_centroids(sf_dir)
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    labels = np.sort(cent["label"].unique())
    d = int(cent["dim"].max()) + 1
    C = cent["centroid_fp"].to_numpy().reshape(len(labels), d)
    handle = ray.put((labels, C))

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )

    def assign(batch: pa.Table) -> pa.Table:
        lab, C = ray.get(handle)
        _, m = _emb_matrix(batch)
        fp = _fp_ppm(m)
        dots = fp @ C.T  # int64 exact
        pred = lab[np.argmax(dots, axis=1)]  # argmax: first (smallest) label wins ties
        return pa.table(
            {
                "label_true": pa.array(
                    batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "label_pred": pa.array(pred.astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["label_true", "label_pred"])
        .aggregate(Count())
    )

    def rename(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "label_true": pc.cast(batch["label_true"], pa.int64()),
                "label_pred": pc.cast(batch["label_pred"], pa.int64()),
                "n": pc.cast(batch["count()"], pa.int64()),
            }
        )

    return ensure_schema(
        agg.map_batches(rename, batch_format="pyarrow"),
        pa.schema(
            [
                ("label_true", pa.int64()),
                ("label_pred", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
    )


def embedding_label_quality(sf_dir: str):
    """Cross-modal fact-fact join: documents (text quality) x embeddings
    (label) on vec_id == doc_id, rolled up to per-label doc count and
    integer mean quality — the "how good is the text behind each
    embedding cluster" eval a curation loop runs after clustering.

    Scale shape: BOTH sides are corpus-sized, so this is a hash-partition
    ``Dataset.join`` — each side is shrunk map-side to a narrow table
    first (docs -> (doc_id, quality_ppm), embeddings -> (vec_id, label));
    the label rollup runs as per-batch partials after the join.  Empty
    inputs are guarded from parquet METADATA (driver-knowable, no scan)
    because Ray 2.49's join raises when either side delivers zero rows."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from .core import partial_then_global
    from .text import normalized_flat_tokens, quality_from_tokens

    schema = pa.schema(
        [
            ("label", pa.int64()),
            ("n_docs", pa.int64()),
            ("avg_quality_ppm", pa.int64()),
        ]
    )
    n_docs_meta = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_emb_meta = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    if n_docs_meta == 0 or n_emb_meta == 0:
        return schema.empty_table()

    def doc_prep(batch: pa.Table) -> pa.Table:
        parent, toks, n, text_col = normalized_flat_tokens(batch["text"])
        q = quality_from_tokens(parent, toks, n, text_col)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "quality_ppm": pa.array(
                    np.asarray(q["quality_ppm"], dtype=np.int64)
                ),
            }
        )

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(doc_prep, batch_format="pyarrow")

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    ).map_batches(
        lambda b: pa.table(
            {
                "vec_id": pc.cast(b["vec_id"], pa.int64()),
                "label": pc.cast(b["label"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    joined = emb.join(
        docs,
        "inner",
        num_partitions=16,
        on=("vec_id",),
        right_on=("doc_id",),
    )

    def to_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "label": b["label"],
                "sum_q": b["quality_ppm"],
                "n_docs": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )

    agg = partial_then_global(
        joined.map_batches(to_partial, batch_format="pyarrow"),
        ["label"],
        ["sum_q", "n_docs"],
    )

    # the result is driver-bounded (label cardinality) and can be
    # legitimately EMPTY from non-empty inputs (disjoint ids); an
    # all-empty Dataset loses its schema in to_pandas/take_all, so the
    # bounded result is a typed pa.Table (CLAUDE.md invariant)
    rows = agg.take_all()
    rows.sort(key=lambda r: int(r["label"]))
    return pa.Table.from_pylist(
        [
            {
                "label": int(r["label"]),
                "n_docs": int(r["n_docs"]),
                # quality is non-negative: // == trunc here
                "avg_quality_ppm": int(r["sum_q"]) // int(r["n_docs"]),
            }
            for r in rows
        ],
        schema=schema,
    )


_GRAM_LIMB = 1 << 31


def embedding_top_component(sf_dir: str):
    """First principal component of the embedding table — the
    distributed-linear-algebra member of the similarity family (drift
    monitoring / whitening prep reads this): exact covariance via a
    DISTRIBUTED integer Gram matrix, eigendecomposition on the driver's
    d x d result.

    Scale shape: the label_centroids trick lifted to second moments —
    every element is converted to int64 fixed-point ppm FIRST, so the
    per-batch Gram partial ``fp.T @ fp`` and column sums are exact
    integers and the cross-block merge is associative (float sums are
    order-dependent; integer sums make the result partition-invariant,
    bit-for-bit).  Partials travel as d^2 + d + 1 rows of 31-bit limbs
    (one guard bounds rows x maxfp^2 per batch); the driver reconstructs
    the exact integer moments in Python big ints, forms the covariance
    in float64 ONCE, and runs ``eigh`` on the d x d matrix.  Sign
    convention: the largest-|component| entry is made positive (first
    index on ties).  Output is d rows (dim, pc1_ppm, explained_ppm) —
    driver-bounded, typed.  Not SQL-expressible (eig); gated by the
    exact-replication pytest."""
    import pyarrow.compute as pc  # noqa: F401

    from .core import partial_then_global

    ds = _read_emb(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        fp = _fp_ppm(m)
        n, d = fp.shape if fp.ndim == 2 else (0, 0)
        if n == 0:
            return pa.schema(
                [
                    ("i", pa.int64()),
                    ("j", pa.int64()),
                    ("hi", pa.int64()),
                    ("lo", pa.int64()),
                ]
            ).empty_table()
        amax = int(np.abs(fp).max())
        if amax > 2_000_000 or n * amax * amax > (1 << 62):
            raise ValueError(
                "gram partial would overflow int64: "
                f"max |fp|={amax}, rows={n} — shrink batches"
            )
        g = fp.T @ fp  # exact int64 (guarded)
        s = fp.sum(axis=0)
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        vals = np.concatenate([g.ravel(), s, [np.int64(n)]])
        i = np.concatenate([ii.ravel(), np.arange(d), [-1]]).astype(np.int64)
        j = np.concatenate(
            [jj.ravel(), np.full(d, -1), [-1]]
        ).astype(np.int64)
        # signed 31-bit limb split (floor division keeps lo non-negative)
        return pa.table(
            {
                "i": pa.array(i),
                "j": pa.array(j),
                "hi": pa.array(vals // _GRAM_LIMB, pa.int64()),
                "lo": pa.array(vals % _GRAM_LIMB, pa.int64()),
            }
        )

    rows = partial_then_global(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["i", "j"],
        ["hi", "lo"],
    ).take_all()  # d^2 + d + 1 rows — driver-bounded
    out_schema = pa.schema(
        [
            ("dim", pa.int64()),
            ("pc1_ppm", pa.int64()),
            ("explained_ppm", pa.int64()),
        ]
    )
    if not rows:
        return out_schema.empty_table()
    vals = {
        (int(r["i"]), int(r["j"])): int(r["hi"]) * _GRAM_LIMB + int(r["lo"])
        for r in rows
    }
    n = vals[(-1, -1)]
    d = max(i for i, _ in vals) + 1
    g = np.array(
        [[float(vals[(i, j)]) for j in range(d)] for i in range(d)]
    )
    s = np.array([float(vals[(i, -1)]) for i in range(d)])
    cov = (g * n - np.outer(s, s)) / (float(n) * n)
    w, v = np.linalg.eigh(cov)
    pc1 = v[:, -1]
    k = int(np.argmax(np.abs(pc1)))
    if pc1[k] < 0:
        pc1 = -pc1
    tr = float(np.trace(cov))
    explained = int(round(float(w[-1]) / tr * 1_000_000)) if tr > 0 else 0
    return pa.table(
        {
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "pc1_ppm": pa.array(_fp_ppm(pc1), pa.int64()),
            "explained_ppm": pa.array(
                np.full(d, explained, dtype=np.int64)
            ),
        }
    )


NORM_Q_PPMS = (10_000, 500_000, 990_000)  # p01 / median / p99

_NORM_Q_SCHEMA = pa.schema(
    [("q_ppm", pa.int64()), ("sqnorm_fp", pa.int64())]
)


def embedding_norm_quantiles(sf_dir: str):
    """Embedding-hygiene report: exact p01 / median / p99 of the SQUARED
    L2 norm across the table — catches the all-zero rows, the unscaled
    outliers and the mixed-normalization batches that poison ANN
    recall.  Squared (not rooted) keeps everything exact int64: every
    element goes to fixed-point ppm first, so ``sqnorm_fp`` = sum of
    squared ppm elements // 10^6 (units of ppm) is associative and the
    quantiles come from the shared ``kth_smallest`` histogram-narrowing
    scans — no sort, no floats anywhere.

    Scale shape: map-only row reduction (one row per vector) feeding
    <= log_B(range) streaming scans; the result is three typed rows."""
    from .quantiles import _min_max_count, _pin, kth_smallest

    def make_ds():
        def prep(batch: pa.Table) -> pa.Table:
            _ids, m = _emb_matrix(batch)
            fp = _fp_ppm(m)
            if fp.size and int(np.abs(fp).max()) > 2_000_000:
                raise ValueError(
                    "embedding element exceeds 2x ppm scale — rescale "
                    "before embedding_norm_quantiles"
                )
            sq = (fp * fp).sum(axis=1) // 1_000_000
            return pa.table({"v": pa.array(sq.astype(np.int64))})

        return _read_emb(sf_dir).map_batches(prep, batch_format="pyarrow")

    # pin the 8 B/row sqnorm column once: without it every narrowing pass
    # re-decodes the WIDE embedding list column and redoes the fixed-point
    # square — the costliest re-derive of any narrowing consumer
    pinned = _pin(make_ds)
    stats = _min_max_count(pinned)
    n = stats[2]
    if n == 0:
        return _NORM_Q_SCHEMA.empty_table()
    ranks = {q: (q * n + 999_999) // 1_000_000 for q in NORM_Q_PPMS}
    vals = kth_smallest(pinned, sorted(set(ranks.values())), _stats=stats)
    return pa.table(
        {
            "q_ppm": pa.array(list(NORM_Q_PPMS), pa.int64()),
            "sqnorm_fp": pa.array(
                [vals[ranks[q]] for q in NORM_Q_PPMS], pa.int64()
            ),
        }
    )
