"""Sketch operators: approximate distinct (HyperLogLog) and heavy hitters
(count-min).  The reference has no sketches (SURVEY.md §2.5); these are the
scale-path additions for cardinality/frequency questions that exact
groupbys answer too expensively at 10^12 rows.

Shape: each batch computes a PARTIAL sketch (numpy), emits it as one small
binary row; partials merge associatively in a tiny groupby — the shuffle
moves kilobytes per batch regardless of input size.  Tests gate the
estimates against exact answers on the synthetic tables (HLL within ~3%
at 2^12 registers; CMS exact for true heavy hitters)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

HLL_P = 12  # 2^12 registers -> ~1.6% standard error
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)

CMS_W = 2048
CMS_D = 4
_CMS_SEEDS = np.array([0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F], dtype=np.uint64)


def _hash64(values) -> np.ndarray:
    """Deterministic 64-bit hashes (pandas hash_array, fixed key)."""
    return pd.util.hash_array(np.asarray(values, dtype=object))


def _hll_partial(h: np.ndarray) -> np.ndarray:
    """uint8[HLL_M] register array for one batch of 64-bit hashes."""
    reg = np.zeros(HLL_M, dtype=np.uint8)
    if h.size == 0:
        return reg
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = h << np.uint64(HLL_P)
    # rank = position of leftmost 1-bit in the remaining 64-P bits, +1
    nz = rest != 0
    rank = np.full(h.shape, 64 - HLL_P + 1, dtype=np.uint8)
    # np.log2-free leading-zero count via string of comparisons is slow;
    # use 64-bit float trick: for x != 0, lz = 63 - floor(log2(x))
    xf = rest[nz].astype(np.float64)
    lz = (63 - np.floor(np.log2(xf))).astype(np.uint8)
    rank[nz] = lz + 1
    np.maximum.at(reg, idx, rank)
    return reg


def _hll_estimate(reg: np.ndarray) -> int:
    inv = np.power(2.0, -reg.astype(np.float64))
    raw = _ALPHA * HLL_M * HLL_M / inv.sum()
    zeros = int((reg == 0).sum())
    if raw <= 2.5 * HLL_M and zeros:
        raw = HLL_M * np.log(HLL_M / zeros)  # linear counting, small range
    return int(round(raw))


def approx_distinct_users(sf_dir: str):
    """(event_type, approx_users) via partial-HLL merge: one uint8[4096]
    sketch row per (batch, type), merged with elementwise max in a small
    groupby."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        types = batch["event_type"].to_numpy(zero_copy_only=False)
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        out_t, out_r = [], []
        for t in np.unique(types):
            h = _hash64(users[types == t])
            out_t.append(str(t))
            out_r.append(_hll_partial(h).tobytes())
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "reg": pa.array(out_r, pa.binary()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        reg = np.zeros(HLL_M, dtype=np.uint8)
        for b in g["reg"]:
            np.maximum(reg, np.frombuffer(b, dtype=np.uint8), out=reg)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "approx_users": [_hll_estimate(reg)],
            }
        )

    return partials.groupby("event_type").map_groups(merge, batch_format="pandas")


def _cms_partial(h: np.ndarray, values: np.ndarray) -> np.ndarray:
    """int64[CMS_D, CMS_W] counts for one batch (count of occurrences)."""
    tbl = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for d in range(CMS_D):
        idx = ((h * _CMS_SEEDS[d]) >> np.uint64(40)).astype(np.int64) % CMS_W
        np.add.at(tbl[d], idx, values)
    return tbl


CMS_MERGE_FANIN = 64  # level-1 merge partitions (tree merge)


def _cms_point_est(sketch: np.ndarray, toks: np.ndarray) -> np.ndarray:
    """CMS point estimates (min over rows) for a token array."""
    h = _hash64(toks)
    est = np.full(len(toks), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(CMS_D):
        idx = ((h * _CMS_SEEDS[d]) >> np.uint64(40)).astype(np.int64) % CMS_W
        est = np.minimum(est, sketch[d, idx])
    return est


def heavy_hitter_tokens(sf_dir: str, top_k: int = 20):
    """Top-k document tokens by total occurrences, fully distributed:

    1. per batch: exact local token counts -> one CMS partial row
       (d x w ints) + the batch's local top candidate tokens;
    2. CMS partials merge associatively in a TWO-LEVEL groupby tree
       (crc32(payload) % 64 level-1 partitions, then one 64-row final
       merge) — no per-batch sketch row ever reaches the driver, unlike a
       take_all() of millions of 64 KiB partials at 10^12 rows;
    3. candidate tokens dedup in a distributed groupby, are scored against
       the broadcast merged sketch in map_batches, and the global top-k is
       a distributed sort+limit.  Candidate union ∪ CMS upper bounds make
       the true top-k exact when candidates cover it (holds for zipfy
       corpora); the sketch bounds the error for the rest.

    The only driver materializations are the single merged sketch row
    (64 KiB, the final aggregate) and the top-k result.
    """
    import zlib

    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    from .text import _flat_tokens

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        # exact local token counts, vectorized: one Arrow RE2 tokenizer pass
        # for the whole batch, factorize (C hash table) + bincount — no
        # Python Counter loop over tokens
        _, flat_toks, _ = _flat_tokens(batch["text"])
        codes, uniques = pd.factorize(flat_toks)
        toks = np.asarray(uniques, dtype=object)
        counts = np.bincount(codes, minlength=len(toks)).astype(np.int64)
        sketch = _cms_partial(_hash64(toks), counts) if len(toks) else np.zeros(
            (CMS_D, CMS_W), dtype=np.int64
        )
        order = np.argsort(-counts, kind="stable")[: 4 * top_k]
        payloads = [sketch.tobytes()] + [str(toks[i]).encode() for i in order]
        return pa.table(
            {
                "kind": pa.array(["sketch"] + ["cand"] * len(order), pa.string()),
                # deterministic level-1 merge partition (content-derived, so
                # no dependence on batch order or process identity)
                "mpart": pa.array(
                    [zlib.crc32(p) % CMS_MERGE_FANIN for p in payloads], pa.int64()
                ),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()

    def merge_rows(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(CMS_D * CMS_W, dtype=np.int64)
        for b in g["payload"]:
            acc += np.frombuffer(b, dtype=np.int64)
        return pd.DataFrame({"mpart": [0], "payload": [acc.tobytes()]})

    sketch_parts = parts.map_batches(
        lambda b: b.filter(
            pa.array(b["kind"].to_numpy(zero_copy_only=False) == "sketch")
        ).select(["mpart", "payload"]),
        batch_format="pyarrow",
    )
    lvl1 = sketch_parts.groupby("mpart").map_groups(merge_rows, batch_format="pandas")
    lvl2 = lvl1.groupby("mpart").map_groups(merge_rows, batch_format="pandas")
    merged_row = lvl2.take_all()  # exactly one 64 KiB row: the final aggregate
    if merged_row:
        sketch = np.frombuffer(merged_row[0]["payload"], dtype=np.int64).reshape(
            CMS_D, CMS_W
        )
    else:  # empty / all-empty-text corpus: no sketch rows at all
        sketch = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    sketch_ref = ray.put(sketch)

    cands = parts.map_batches(
        lambda b: pa.table(
            {
                "token": pa.array(
                    [
                        p.decode()
                        for p in b.filter(
                            pa.array(b["kind"].to_numpy(zero_copy_only=False) == "cand")
                        )["payload"].to_pylist()
                    ],
                    pa.string(),
                )
            }
        ),
        batch_format="pyarrow",
    ).groupby("token").aggregate(Count())
    # native aggregate dedup: map_groups(head) here would cost one Python
    # call per unique candidate token
    cands = cands.map_batches(
        lambda b: b.select(["token"]), batch_format="pyarrow"
    )

    def score(batch: pa.Table) -> pa.Table:
        toks = np.asarray(batch["token"].to_pylist(), dtype=object)
        if not len(toks):
            return pa.table(
                {"token": pa.array([], pa.string()), "est_count": pa.array([], pa.int64())}
            )
        est = _cms_point_est(ray.get(sketch_ref), toks)
        return pa.table(
            {"token": batch["token"], "est_count": pa.array(est, pa.int64())}
        )

    return (
        cands.map_batches(score, batch_format="pyarrow")
        .sort(["est_count", "token"], descending=[True, False])
        .limit(top_k)
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (DDSketch-style log-gamma histogram)
# ---------------------------------------------------------------------------
# Relative-error quantiles in ONE streaming pass: each batch bins its cents
# values into a fixed int64[DDS_NBINS] log-gamma histogram (bin i holds
# v in (gamma^(i-1), gamma^i], so any value in a bin is within
# (gamma-1)/(gamma+1) ~ DDS_EPS of the bin's midpoint estimate), partials
# merge by vector ADD through the same two-level crc32 groupby tree as the
# CMS — the driver only ever sees one ~16 KiB merged histogram.  The exact
# siblings (functions/quantiles.py) need ~3 full scans; this needs one, at
# the cost of a bounded relative error.  Cf. DDSketch (Masson et al.,
# VLDB 2019) — public algorithm; reference repo has no sketches (SURVEY §2.5).

DDS_EPS = 0.01
DDS_GAMMA = (1 + DDS_EPS) / (1 - DDS_EPS)
_DDS_LOG_G = np.log(DDS_GAMMA)
DDS_NBINS = 2048  # gamma^2048 ~ 4e17 cents; larger values saturate the top bin


def _dds_partial(c: np.ndarray) -> np.ndarray:
    """int64[2*DDS_NBINS + 1] histogram: slot 0 counts exact zeros, slots
    1..DDS_NBINS the positive log-gamma bins, slots DDS_NBINS+1.. the
    MIRRORED negative bins (binned on |v|) — refund-style negative values
    keep the same relative-error bound as positives."""
    out = np.zeros(2 * DDS_NBINS + 1, dtype=np.int64)
    out[0] = int((c == 0).sum())
    for sign, base in ((1, 1), (-1, DDS_NBINS + 1)):
        sel = c * sign
        sel = sel[sel > 0]
        if len(sel):
            idx = np.ceil(np.log(sel.astype(np.float64)) / _DDS_LOG_G).astype(
                np.int64
            )
            np.clip(idx, 0, DDS_NBINS - 1, out=idx)
            out[base : base + DDS_NBINS] += np.bincount(idx, minlength=DDS_NBINS)
    return out


def _dds_bin_estimate(kbin: int) -> int:
    """Midpoint estimate of log bin k (>= 1 cent)."""
    g = DDS_GAMMA**kbin
    return max(1, int(round(2.0 * g / (DDS_GAMMA + 1.0))))


def _dds_quantiles(hist: np.ndarray, qs_ppm) -> dict[int, int]:
    """{q_ppm: approx_cents} with the same ceil-rank convention as the
    exact quantiles (rank k = ceil(q*n)), bin midpoint estimates, values
    ordered most-negative -> zero -> most-positive."""
    n = int(hist.sum())
    if n == 0:
        return {int(q): 0 for q in qs_ppm}
    neg_desc = hist[DDS_NBINS + 1 :][::-1]  # |v| bin DDS_NBINS-1 .. 0
    ordered = np.concatenate([neg_desc, hist[:1], hist[1 : DDS_NBINS + 1]])
    cum = np.cumsum(ordered)
    out = {}
    for q in qs_ppm:
        k = (int(q) * n + 999_999) // 1_000_000
        b = int(np.searchsorted(cum, k))
        if b < DDS_NBINS:
            out[int(q)] = -_dds_bin_estimate(DDS_NBINS - 1 - b)
        elif b == DDS_NBINS:
            out[int(q)] = 0
        else:
            out[int(q)] = _dds_bin_estimate(b - DDS_NBINS - 1)
    return out


SKETCH_QS_PPM = (250_000, 500_000, 750_000, 900_000)


def approx_value_quantiles(sf_dir: str, qs_ppm=SKETCH_QS_PPM):
    """(q_ppm, approx_cents) quantiles of events.value from ONE streaming
    pass — the sketch sibling of ``quantiles.events_value_quantiles``
    (exact, ~3 scans).  Partial histograms merge associatively through the
    two-level groupby tree; estimates are within ~DDS_EPS relative error
    (pytest-gated against the exact values)."""
    import zlib

    import ray.data as rd

    from .numeric import cents_arrow

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(batch: pa.Table) -> pa.Table:
        c = cents_arrow(batch["value"]).to_numpy(zero_copy_only=False)
        payload = _dds_partial(c).tobytes()
        return pa.table(
            {
                "mpart": pa.array(
                    [zlib.crc32(payload) % CMS_MERGE_FANIN], pa.int64()
                ),
                "payload": pa.array([payload], pa.binary()),
            }
        )

    def merge_rows(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(2 * DDS_NBINS + 1, dtype=np.int64)
        for b in g["payload"]:
            acc += np.frombuffer(b, dtype=np.int64)
        return pd.DataFrame({"mpart": [0], "payload": [acc.tobytes()]})

    lvl1 = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("mpart")
        .map_groups(merge_rows, batch_format="pandas")
    )
    merged = lvl1.groupby("mpart").map_groups(
        merge_rows, batch_format="pandas"
    ).take_all()
    hist = (
        np.frombuffer(merged[0]["payload"], dtype=np.int64)
        if merged
        else np.zeros(2 * DDS_NBINS + 1, dtype=np.int64)
    )
    est = _dds_quantiles(hist, qs_ppm)
    return pa.table(
        {
            "q_ppm": pa.array(sorted(est), pa.int64()),
            "approx_cents": pa.array([est[q] for q in sorted(est)], pa.int64()),
        }
    )


def source_unique_sketch(sf_dir: str):
    """(source, approx_unique) — the HLL scale path for
    ``domains.source_quality_report``'s exact ``n_unique``: that exact
    count needs a distinct (source, hash) PAIR-grain shuffle (row-
    proportional); this moves one uint8[4096] register row per
    (batch, source) instead, merged by elementwise max.  Accuracy-gated
    against the exact scorecard in pytest (~1.6% std error at 2^12
    registers)."""
    import ray.data as rd

    from .hashing import md5_hex

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        sources = batch["source"].to_numpy(zero_copy_only=False)
        hashes = md5_hex(batch["text"]).to_numpy(zero_copy_only=False)
        out_s, out_r = [], []
        for s in np.unique(sources):
            h = _hash64(hashes[sources == s])
            out_s.append(str(s))
            out_r.append(_hll_partial(h).tobytes())
        return pa.table(
            {
                "source": pa.array(out_s, pa.string()),
                "reg": pa.array(out_r, pa.binary()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        reg = np.zeros(HLL_M, dtype=np.uint8)
        for b in g["reg"]:
            np.maximum(reg, np.frombuffer(b, dtype=np.uint8), out=reg)
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "approx_unique": [_hll_estimate(reg)],
            }
        )

    return partials.groupby("source").map_groups(merge, batch_format="pandas")
