"""Source-level corpus composition operators (domain scorecard +
domain balancing) over the ``documents`` table's ``source`` column.

Both are standard pretraining-mix plumbing: the scorecard is what a
corpus curator reads to decide per-domain inclusion, the cap is the
deterministic downsampler that enforces it.  Reference analogue: the
per-collection loops of ``/root/reference/src/DocumentAnalyzer.py``
(process one source directory at a time), lifted to corpus grain.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _read_docs

CAP_PER_SOURCE = 10

# Domain-reweighting keep rates in ppm (the DoReMi/Pile-style target-mix
# downsampler): sources not named keep MIX_DEFAULT_PPM.  Mirrored as
# literals in the domain_mix_sample oracle SQL.
MIX_KEEP_PPM = {"src0": 1_000_000, "src1": 500_000, "src2": 250_000}
MIX_DEFAULT_PPM = 125_000


def source_quality_report(sf_dir: str):
    """Per-source scorecard: (source, n_docs, n_unique, avg_quality_ppm,
    n_en) — document count, exact distinct content hashes, integer mean
    quality, predicted-English count.

    Scale shape: ONE corpus read computes hash + quality + lang per
    batch (the ``corpus_clean_keep`` kernels); the first exchange is at
    distinct (source, content_hash) PAIR grain (required for an exact
    distinct count — the only row-proportional shuffle, map-side
    combined), the second collapses pairs to one row per source.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from .hashing import md5_hex
    from .text import lang_from_tokens, normalized_flat_tokens, quality_from_tokens

    def prep(batch: pa.Table) -> pa.Table:
        parent, toks, n, text_col = normalized_flat_tokens(batch["text"])
        lang = lang_from_tokens(parent, toks, n)
        qual = quality_from_tokens(parent, toks, n, text_col)["quality_ppm"]
        return pa.table(
            {
                "source": batch["source"],
                "content_hash": md5_hex(batch["text"]),
                "quality_ppm": pa.array(qual, pa.int64()),
                "is_en": pa.array((lang == "en").astype(np.int64), pa.int64()),
            }
        )

    pairs = (
        _read_docs(sf_dir, ["doc_id", "text", "source"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["source", "content_hash"])
        .aggregate(Sum("quality_ppm"), Count(), Sum("is_en"))
    )

    per_source = pairs.groupby("source").aggregate(
        Sum("count()"), Count(), Sum("sum(quality_ppm)"), Sum("sum(is_en)")
    )

    def finish(batch: pa.Table) -> pa.Table:
        n_docs = batch["sum(count())"].to_numpy(zero_copy_only=False).astype(np.int64)
        sum_q = (
            batch["sum(sum(quality_ppm))"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "source": batch["source"],
                "n_docs": pa.array(n_docs, pa.int64()),
                "n_unique": pc.cast(batch["count()"], pa.int64()),
                # both operands non-negative: // == trunc == floor here
                "avg_quality_ppm": pa.array(sum_q // n_docs, pa.int64()),
                "n_en": pc.cast(batch["sum(sum(is_en))"], pa.int64()),
            }
        )

    from .schema import ensure_schema

    return ensure_schema(
        per_source.map_batches(finish, batch_format="pyarrow"),
        pa.schema(
            [
                ("source", pa.string()),
                ("n_docs", pa.int64()),
                ("n_unique", pa.int64()),
                ("avg_quality_ppm", pa.int64()),
                ("n_en", pa.int64()),
            ]
        ),
    )



def _source_rate_ppm(batch: pa.Table, rates: dict, default: int):
    """(ids, ppm) for a batch: int64 doc ids plus each row's source rate in
    ppm (dict lookup with a default).  The per-batch id/rate extraction
    convention of BOTH mix operators lives here exactly once — it is
    oracle-pinned on each side."""
    import numpy as np

    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ppm = (
        batch["source"]
        .to_pandas()
        .map(rates)
        .fillna(default)
        .to_numpy()
        .astype(np.int64)
    )
    return ids, ppm


def domain_mix_sample(sf_dir: str, keep_ppm: dict | None = None):
    """Domain reweighting: keep each doc with its source's target rate,
    decided by the deterministic id-hash u32 (keep iff
    ``hash_u32 * 10^6 < rate_ppm * 2^32``, exact integer compare) — so a
    rerun, a different batch size, or a different node count keeps the
    identical doc set, and each source converges to its target fraction.

    Scale shape: map-only over a two-column pruned read; the rate table
    is a tiny dict captured in the task closure (broadcast once per
    worker, never per batch), zero shuffle at any scale.
    """
    from .hashing import id_hash_u32
    from .sampling import HASH_DENOM
    from .schema import ensure_schema

    rates = dict(MIX_KEEP_PPM if keep_ppm is None else keep_ppm)

    def prep(batch: pa.Table) -> pa.Table:
        ids, ppm = _source_rate_ppm(batch, rates, MIX_DEFAULT_PPM)
        keep = id_hash_u32(ids) * 1_000_000 < ppm * HASH_DENOM
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "source": batch["source"],
            }
        ).filter(pa.array(keep))

    return ensure_schema(
        _read_docs(sf_dir, ["doc_id", "source"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        pa.schema([("doc_id", pa.int64()), ("source", pa.string())]),
    )


def cap_docs_per_source(sf_dir: str, k: int = CAP_PER_SOURCE):
    """Domain balancing: keep at most ``k`` docs per source, chosen by
    the deterministic id-hash order (md5-u32, doc_id) — a uniform,
    process-independent per-source sample that any rerun reproduces.
    Output (source, doc_id, rank), rank 1..k within source.

    Scale: per-block grouped partial bottom-k first (the global per-key
    bottom-k is contained in the union of per-block ones), so the final
    exchange moves <= k x sources x blocks rows, never the corpus —
    the ``top_orders_per_segment`` pattern with an ascending hash key.
    """
    from .hashing import id_hash_u32
    from .schema import ensure_schema

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": batch["source"],
                "doc_id": pa.array(ids, pa.int64()),
                "hu": pa.array(id_hash_u32(ids), pa.int64()),
            }
        )

    def block_bottomk(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["source", "hu", "doc_id"])
        return pa.Table.from_pandas(
            df.groupby("source", sort=False).head(k), preserve_index=False
        )

    def src_bottomk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["hu", "doc_id"]).head(k).reset_index(drop=True)
        return pd.DataFrame(
            {
                "source": g["source"],
                "doc_id": g["doc_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    ds = _read_docs(sf_dir, ["doc_id", "source"]).map_batches(
        prep, batch_format="pyarrow"
    )
    return ensure_schema(
        ds.map_batches(block_bottomk, batch_format="pyarrow")
        .groupby("source")
        .map_groups(src_bottomk, batch_format="pandas"),
        pa.schema(
            [
                ("source", pa.string()),
                ("doc_id", pa.int64()),
                ("rank", pa.int64()),
            ]
        ),
    )


# Upsampling rates in ppm-of-copies (the >1x counterpart of MIX_KEEP_PPM:
# e.g. 3_000_000 = every doc 3x, 1_500_000 = 1x plus a deterministic half
# of the docs get a 2nd copy).  Mirrored as literals in the
# domain_mix_repeat oracle SQL.
MIX_REPEAT_PPM = {"src0": 3_000_000, "src1": 1_500_000}
MIX_REPEAT_DEFAULT_PPM = 1_000_000


def domain_mix_repeat(sf_dir: str, repeat_ppm: dict | None = None):
    """Domain upsampling: emit each doc ``floor(rate)`` times plus one
    more copy iff the deterministic id-hash u32 falls under the
    fractional part (``hash_u32 * 10^6 < (rate_ppm % 10^6) * 2^32``,
    exact integers) — the epoch-mix expansion a pretraining run uses to
    repeat high-value domains (e.g. Wikipedia 3x) while streaming.  A
    rerun, a different batch size, or a different node count emits the
    identical (doc_id, copy_idx) multiset.

    Scale shape: map-only over a two-column pruned read; the rate table
    rides the task closure; copies are materialized per batch with one
    ``np.repeat`` + arange-offset kernel (no Python loop), zero shuffle.
    Output (doc_id, source, copy_idx), copy_idx 1..n_copies.
    """
    import numpy as np

    from .hashing import id_hash_u32
    from .sampling import HASH_DENOM
    from .schema import ensure_schema

    rates = dict(MIX_REPEAT_PPM if repeat_ppm is None else repeat_ppm)

    _schema = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()), ("copy_idx", pa.int64())]
    )

    def expand(batch: pa.Table) -> pa.Table:
        ids, ppm = _source_rate_ppm(batch, rates, MIX_REPEAT_DEFAULT_PPM)
        extra = id_hash_u32(ids) * 1_000_000 < (ppm % 1_000_000) * HASH_DENOM
        n_copies = ppm // 1_000_000 + extra.astype(np.int64)
        total = int(n_copies.sum())
        if total == 0:
            return _schema.empty_table()
        row_idx = np.repeat(np.arange(len(ids), dtype=np.int64), n_copies)
        offsets = np.cumsum(n_copies) - n_copies
        copy_idx = np.arange(total, dtype=np.int64) - offsets[row_idx] + 1
        src = batch["source"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[row_idx], pa.int64()),
                "source": pa.array(src[row_idx], pa.string()),
                "copy_idx": pa.array(copy_idx, pa.int64()),
            }
        )

    return ensure_schema(
        _read_docs(sf_dir, ["doc_id", "source"]).map_batches(
            expand, batch_format="pyarrow"
        ),
        _schema,
    )


# Adaptive per-source quality floor: the keep threshold is each source's
# own lower-quartile quality (ppm), not a global constant — the
# CCNet/RefinedWeb-style per-domain filtering rule where noisy domains
# get stricter absolute floors automatically.
FLOOR_Q_PPM = 250_000


def source_quality_floor_keep(sf_dir: str, q_ppm: int = FLOOR_Q_PPM):
    """Per-source adaptive quality floor: for every source, the exact
    q-quantile (default lower quartile) of its docs' quality_ppm, plus how
    many docs clear their OWN source's floor.

    Scale shape: the corpus is tokenized ONCE into a 16-byte (source,
    quality) narrow table, materialized; the per-group exact quantile runs
    the shared histogram-narrowing kernel over that narrow table (all
    sources advance per pass, ~log_B(range) passes, no row sort); the keep
    count is one more narrow-table pass with the per-source thresholds in
    the map closure (source-count-bounded — swap to ``ray.put`` above
    ~10^5 sources).  Result is source-bounded, returned as a typed
    ``pa.Table`` (empty-corpus safe)."""
    from .core import partial_then_global
    from .quantiles import grouped_quantile
    from .text import normalized_flat_tokens, quality_from_tokens

    def prep(batch: pa.Table) -> pa.Table:
        parent, toks, n, text_col = normalized_flat_tokens(batch["text"])
        qual = quality_from_tokens(parent, toks, n, text_col)["quality_ppm"]
        return pa.table(
            {
                "g": batch["source"],
                "v": pa.array(qual, pa.int64()),
            }
        )

    narrow = (
        _read_docs(sf_dir, ["source", "text"])
        .map_batches(prep, batch_format="pyarrow")
        .materialize()
    )

    schema = pa.schema(
        [
            ("source", pa.string()),
            ("n_docs", pa.int64()),
            ("threshold_ppm", pa.int64()),
            ("n_keep", pa.int64()),
        ]
    )

    # {source: (threshold, n_docs)}; empty corpus -> no groups
    stats = grouped_quantile(lambda: narrow, q_ppm, return_counts=True)
    if not stats:
        return schema.empty_table()
    thresholds = {g: int(v) for g, (v, _n) in stats.items()}

    def keep_partial(b: pa.Table) -> pa.Table:
        s = pd.Series(b["g"].to_numpy(zero_copy_only=False))
        thr = s.map(thresholds).to_numpy(dtype=np.int64)
        v = b["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "g": b["g"],
                "n_keep": pa.array((v >= thr).astype(np.int64)),
            }
        )

    keep_rows = {
        r["g"]: int(r["n_keep"])
        for r in partial_then_global(
            narrow.map_batches(keep_partial, batch_format="pyarrow"),
            ["g"],
            ["n_keep"],
        ).take_all()
    }

    sources = sorted(stats)
    return pa.table(
        {
            "source": pa.array(sources, pa.string()),
            "n_docs": pa.array([int(stats[g][1]) for g in sources], pa.int64()),
            "threshold_ppm": pa.array([thresholds[g] for g in sources], pa.int64()),
            "n_keep": pa.array([keep_rows.get(g, 0) for g in sources], pa.int64()),
        }
    )


# default global token budget for the budget-cut selection (a constant so
# the DuckDB oracle states the same number)
TOKEN_BUDGET = 10_000


def corpus_token_budget_cut(sf_dir: str, budget_tokens: int = TOKEN_BUDGET):
    """Token-budget quality cut — the data-mixing selection rule: find the
    HIGHEST quality cutoff whose docs carry at least ``budget_tokens``
    tokens, then keep every doc at or above it.  (Greedy fill of a global
    token budget from the top of the quality distribution; the cut
    overshoots the budget by less than one quality level's token mass.)

    Scale shape: corpus tokenized ONCE into a materialized 17-byte
    (g=const int64, v=-quality, w=n_tokens) narrow table; ONE grouped
    Min/Max/Sum stats pass decides the branch AND seeds the narrowing
    (``_stats_rows``); the cutoff is the WEIGHTED histogram-narrowing
    kernel with the absolute token budget as the rank target (quality
    negated so "smallest v whose cumulative weight reaches B" is
    "highest quality keeping >= B tokens"); the keep stats are one more
    narrow-table pass collapsing each block to a single (n, tok)
    partial.  No sort, no shuffle of rows; result is one typed row —
    on an EMPTY corpus that row is (NULL, 0, NULL), the oracle's
    ungrouped-aggregate shape."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from .core import partial_then_global
    from .quantiles import grouped_quantile
    from .text import normalized_flat_tokens, quality_from_tokens

    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")

    def prep(batch: pa.Table) -> pa.Table:
        parent, toks, n, text_col = normalized_flat_tokens(batch["text"])
        q = quality_from_tokens(parent, toks, n, text_col)
        return pa.table(
            {
                # constant group key as int64 zeros: 8 B/row and no
                # per-row Python-object build (vs a constant string col)
                "g": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
                "v": pa.array(-np.asarray(q["quality_ppm"], dtype=np.int64)),
                "w": pa.array(np.asarray(q["n_tokens"], dtype=np.int64)),
            }
        )

    narrow = (
        _read_docs(sf_dir, ["text"])
        .map_batches(prep, batch_format="pyarrow")
        .materialize()
    )

    schema = pa.schema(
        [
            ("cutoff_quality_ppm", pa.int64()),
            ("n_docs_kept", pa.int64()),
            ("tokens_kept", pa.int64()),
        ]
    )
    # one stats pass serves branch choice, fallback cutoff AND the
    # narrowing kernel's seed (weighted stats = Min/Max/Sum(w))
    stats_rows = (
        narrow.groupby("g").aggregate(Min("v"), Max("v"), Sum("w"), Count()).take_all()
    )
    if not stats_rows:
        # oracle shape on an empty corpus: the ungrouped aggregate still
        # emits one row — (NULL, 0, NULL)
        return pa.Table.from_pylist(
            [{"cutoff_quality_ppm": None, "n_docs_kept": 0, "tokens_kept": None}],
            schema=schema,
        )
    total_tokens = int(stats_rows[0]["sum(w)"])
    if budget_tokens > total_tokens:
        # budget exceeds the corpus: keep everything — cutoff is the global
        # min quality (oracle's COALESCE fallback), matched exactly; at
        # budget == total the narrowing branch below agrees with the
        # oracle's `cum >= B` filter (strictly `>` here, pinned by test)
        cutoff = -int(stats_rows[0]["max(v)"])
    else:
        cut = grouped_quantile(
            lambda: narrow,
            0,
            rank_fn=lambda _w: budget_tokens,
            weighted=True,
            _stats_rows=stats_rows,
        )
        cutoff = -int(cut[0])

    def keep_partial(b: pa.Table) -> pa.Table:
        v = b["v"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        m = v <= -cutoff
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "n": pa.array([int(m.sum())], pa.int64()),
                "tok": pa.array([int(w[m].sum())], pa.int64()),
            }
        )

    rows = partial_then_global(
        narrow.map_batches(keep_partial, batch_format="pyarrow"), ["g"], ["n", "tok"]
    ).take_all()
    r = rows[0]
    return pa.Table.from_pylist(
        [
            {
                "cutoff_quality_ppm": cutoff,
                "n_docs_kept": int(r["n"]),
                "tokens_kept": int(r["tok"]),
            }
        ],
        schema=schema,
    )


def source_token_weighted_median_quality(sf_dir: str):
    """Per-source TOKEN-weighted median quality: the smallest quality_ppm
    whose cumulative token mass reaches half the source's total tokens —
    the curation metric that answers "what quality does the median TOKEN
    (not the median doc) of this domain have", which is what a mixing
    recipe actually samples.  Multi-group exercise of the weighted
    narrowing kernel (all sources advance per pass).

    Scale shape: tokenize once into a materialized (source, quality,
    n_tokens) narrow table; weighted grouped histogram narrowing; a
    source whose docs carry zero tokens resolves to its min quality
    (the SQL ``cum >= 0`` contract, handled inside the kernel)."""
    from .quantiles import grouped_quantile
    from .text import normalized_flat_tokens, quality_from_tokens

    def prep(batch: pa.Table) -> pa.Table:
        parent, toks, n, text_col = normalized_flat_tokens(batch["text"])
        q = quality_from_tokens(parent, toks, n, text_col)
        return pa.table(
            {
                "g": batch["source"],
                "v": pa.array(np.asarray(q["quality_ppm"], dtype=np.int64)),
                "w": pa.array(np.asarray(q["n_tokens"], dtype=np.int64)),
            }
        )

    narrow = (
        _read_docs(sf_dir, ["source", "text"])
        .map_batches(prep, batch_format="pyarrow")
        .materialize()
    )

    med = grouped_quantile(
        lambda: narrow, 500_000, weighted=True, return_counts=True
    )
    keys = sorted(med)
    return pa.table(
        {
            "source": pa.array(keys, pa.string()),
            "wmedian_quality_ppm": pa.array(
                [int(med[k][0]) for k in keys], pa.int64()
            ),
            "n_tokens": pa.array([int(med[k][1]) for k in keys], pa.int64()),
        }
    )


_FP_MOD = 1 << 63
_FP_MASK20 = (1 << 20) - 1

_FINGERPRINT_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("n_docs", pa.int64()),
        ("fingerprint", pa.int64()),
    ]
)


def source_fingerprint(sf_dir: str):
    """Order-independent per-source table checksum — the replication /
    migration validation staple: every row reduces to a 60-bit digest of
    its full content, and a source's fingerprint is the SUM of its row
    digests mod 2^63.  Insensitive to row order, partitioning and
    blocking, so two independently produced copies of the table (original
    vs re-encoded, pre- vs post-migration) compare with one tiny
    exchange; any single changed/dropped/duplicated row flips it.

    Scale shape: map-only vectorized hashing (one DuckDB-over-Arrow md5
    pass per batch, ``functions/hashing.py``); per-batch digest sums are
    carried as THREE 20-bit limbs so the int64 Sum exchange stays exact
    to ~2^43 rows (digest < 2^60; per-limb per-batch sum <= rows x 2^20);
    one partial+global exchange over |sources| rows; the mod-2^63 fold
    happens once on the driver in Python big ints.  Result is
    driver-bounded (|sources|) and returned typed."""
    import pyarrow.compute as pc

    from .core import partial_then_global
    from .hashing import md5_hex, str_hash_u60

    ds = _read_docs(sf_dir, ["doc_id", "text", "lang", "source", "n_chars"])

    def prep(batch: pa.Table) -> pa.Table:
        src = pc.fill_null(batch["source"], "")
        row_str = pc.binary_join_element_wise(
            pc.cast(batch["doc_id"], pa.string()),
            pc.fill_null(batch["lang"], ""),
            src,
            pc.cast(batch["n_chars"], pa.string()),
            md5_hex(batch["text"]),
            "|",
        )
        d = str_hash_u60(row_str)
        codes, uniq = pd.factorize(src.to_numpy(zero_copy_only=False))
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        limbs = []
        for shift in (0, 20, 40):
            part = (d >> shift) & _FP_MASK20
            s = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(s, codes, part)
            limbs.append(s)
        return pa.table(
            {
                "source": pa.array(uniq, pa.string()),
                "n": pa.array(n, pa.int64()),
                "fp_l0": pa.array(limbs[0], pa.int64()),
                "fp_l1": pa.array(limbs[1], pa.int64()),
                "fp_l2": pa.array(limbs[2], pa.int64()),
            }
        )

    agg = partial_then_global(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["source"],
        ["n", "fp_l0", "fp_l1", "fp_l2"],
    )
    rows = []
    for row in agg.take_all():  # one row per source (driver-bounded)
        total = (
            int(row["fp_l0"])
            + (int(row["fp_l1"]) << 20)
            + (int(row["fp_l2"]) << 40)
        )
        rows.append(
            {
                "source": row["source"],
                "n_docs": int(row["n"]),
                "fingerprint": total % _FP_MOD,
            }
        )
    rows.sort(key=lambda r: r["source"])
    if not rows:
        return _FINGERPRINT_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=_FINGERPRINT_SCHEMA)


_ASSERT_CHECKS = (
    "dup_doc_id_rows",
    "empty_text",
    "n_chars_mismatch",
    "null_doc_id",
    "null_source",
    "null_text",
)
_ASSERT_SCHEMA = pa.schema(
    [("check_name", pa.string()), ("n_violations", pa.int64())]
)
_DUP_KIND = 1


def documents_assertions(sf_dir: str):
    """Row-level data-quality assertions over the documents table — the
    dbt-test / expectation-suite staple: six constraint checks (primary
    key not null + unique, text/source not null, text non-empty, the
    n_chars column consistent with length(text)) reduced to one
    violation count per check.  The fixed six-row report is always
    emitted (zeroes included) so a scheduler can diff runs.

    Scale shape: ONE fused corpus scan computes every map-only counter
    per batch AND the (doc_id, count) partials the uniqueness check
    needs (tagged rows sharing a (kind, key, n) schema); the only
    row-proportional exchange is the id-grain dedup groupby, whose
    output folds DISTRIBUTED to one duplicate-rows partial per block —
    the driver sees six rows."""
    import pyarrow.compute as pc

    from .core import partial_then_global

    ds = _read_docs(sf_dir, ["doc_id", "text", "source", "n_chars"])

    def prep(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        valid_text = pc.is_valid(text)
        n_null_text = batch.num_rows - pc.sum(valid_text).as_py()
        n_empty = pc.sum(
            pc.and_(valid_text, pc.equal(pc.fill_null(text, "\x00"), ""))
        ).as_py()
        mlen = pc.utf8_length(pc.fill_null(text, ""))
        n_mismatch = pc.sum(
            pc.and_(valid_text, pc.not_equal(mlen, batch["n_chars"]))
        ).as_py()
        n_null_id = batch.num_rows - pc.sum(pc.is_valid(batch["doc_id"])).as_py()
        n_null_src = (
            batch.num_rows - pc.sum(pc.is_valid(batch["source"])).as_py()
        )
        counters = {
            "empty_text": n_empty,
            "n_chars_mismatch": n_mismatch,
            "null_doc_id": n_null_id,
            "null_source": n_null_src,
            "null_text": n_null_text,
        }
        ids = batch["doc_id"].drop_null().to_numpy(zero_copy_only=False)
        u, c = np.unique(ids, return_counts=True)
        kind = np.concatenate(
            [
                np.zeros(len(counters), dtype=np.int64),
                np.full(len(u), _DUP_KIND, dtype=np.int64),
            ]
        )
        key = np.concatenate(
            [
                np.array(
                    [_ASSERT_CHECKS.index(k) for k in counters], dtype=np.int64
                ),
                u.astype(np.int64),
            ]
        )
        n = np.concatenate(
            [
                np.array(list(counters.values()), dtype=np.int64),
                c.astype(np.int64),
            ]
        )
        return pa.table(
            {
                "kind": pa.array(kind),
                "key": pa.array(key),
                "n": pa.array(n),
            }
        )

    agg = partial_then_global(
        ds.map_batches(prep, batch_format="pyarrow"), ["kind", "key"], ["n"]
    )

    def fold(batch: pa.Table) -> pa.Table:
        kind = batch["kind"].to_numpy(zero_copy_only=False)
        key = batch["key"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        dup_mask = kind == _DUP_KIND
        dup_rows = int(n[dup_mask & (n > 1)].sum())
        keep = ~dup_mask
        return pa.table(
            {
                "key": pa.array(
                    np.concatenate([key[keep], [0]]).astype(np.int64)
                ),
                "n": pa.array(
                    np.concatenate([n[keep], [dup_rows]]).astype(np.int64)
                ),
            }
        )

    final = partial_then_global(
        agg.map_batches(fold, batch_format="pyarrow"), ["key"], ["n"]
    )
    got = {int(r["key"]): int(r["n"]) for r in final.take_all()}
    return pa.table(
        {
            "check_name": pa.array(list(_ASSERT_CHECKS), pa.string()),
            "n_violations": pa.array(
                [got.get(i, 0) for i in range(len(_ASSERT_CHECKS))], pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# Language-mix impurity per source (Gini)
# ---------------------------------------------------------------------------

_NULL_LANG_SENTINEL = "\x00null"

_GINI_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("n_docs", pa.int64()),
        ("n_langs", pa.int64()),
        ("gini_ppm", pa.int64()),
    ]
)


def source_lang_gini(sf_dir: str):
    """Language-mix impurity per source: Gini impurity
    ``1 - sum((n_lang / n)^2)`` in exact ppm integers — the one-number
    "is this domain monolingual" probe a curator reads next to the
    scorecard (0 = pure, -> 1 = uniform mix).

    Scale shape: one pruned scan reduces the corpus to (source, lang)
    PAIR-grain count partials map-side; the exchange moves one row per
    pair per block and the global pair table is domain-bounded
    (|sources| x |langs|), so the squared-count fold runs on the driver
    in unbounded Python ints (n^2 * 1e6 would overflow int64 past ~3e6
    docs per pair).  NULL langs ride the exchange as the engine's
    sentinel (Ray's sort-shuffle cannot move a None key) and count as
    their own language, matching SQL GROUP BY NULL semantics.  Returned
    typed (empty-corpus safe)."""
    import pyarrow.compute as pc

    from .core import partial_then_global

    ds = _read_docs(sf_dir, ["source", "lang"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": batch["source"],
                "lang": pc.fill_null(batch["lang"], _NULL_LANG_SENTINEL),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    pairs = partial_then_global(
        ds.map_batches(prep, batch_format="pyarrow"), ["source", "lang"], ["n"]
    ).take_all()

    per_src: dict[str, list[int]] = {}
    for r in pairs:
        tot_ss = per_src.setdefault(r["source"], [0, 0, 0])
        n = int(r["n"])
        tot_ss[0] += n
        tot_ss[1] += n * n
        tot_ss[2] += 1

    srcs = sorted(per_src)
    return pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "n_docs": pa.array([per_src[s][0] for s in srcs], pa.int64()),
            "n_langs": pa.array([per_src[s][2] for s in srcs], pa.int64()),
            "gini_ppm": pa.array(
                [
                    (per_src[s][0] ** 2 - per_src[s][1])
                    * 1_000_000
                    // per_src[s][0] ** 2
                    for s in srcs
                ],
                pa.int64(),
            ),
        },
        schema=_GINI_SCHEMA,
    )
