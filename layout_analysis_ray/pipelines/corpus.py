"""LLM training-data corpus pipelines: the cleaning chain and sequence
packing.

These compose the text-analysis kernels (``functions/text.py``) and the
exact-dedup reduce (``functions/dedup.py``) into the end-to-end shapes a
pretraining data pipeline actually runs:

- ``corpus_clean_keep``: language filter -> quality filter -> exact dedup
  keep-one, in ONE streaming pass over the corpus plus one partial-combined
  groupby over (hash, id) pairs.  Nothing document-sized ever shuffles.
- ``pack_sequences``: concat-and-chunk packing — documents are laid out in
  deterministic partition order and split into fixed token-budget context
  windows; each doc gets its (window, offset) coordinate.  One coarse
  hash-partition exchange of (id, n_tokens) pairs, cumsum inside.

Both are oracle-checked against DuckDB SQL in ``__ray_entry__.py`` (the
whole chain is SQL-expressible, which pins every intermediate semantic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import id_bucket_digit, md5_hex

# cleaning thresholds — mirrored verbatim in the oracle SQL
CLEAN_LANG = "en"
CLEAN_MIN_QUALITY_PPM = 500_000

# packing constants — mirrored verbatim in the oracle SQL
PACK_BUDGET_TOKENS = 2048
PACK_PARTS = 16  # first hex digit of md5(doc_id), as split_hash_buckets
# engine-internal parallelism knob (NOT part of the output semantics):
# target docs per pack kernel call; subpartition count is derived as
# ceil(n_docs / this), keeping each doc_id-sort + cumsum bounded while
# coordinates stay invariant (see _pack_triples)
PACK_DOCS_PER_TASK = 4_000_000


def _read_docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def corpus_clean_keep(sf_dir: str):
    """The canonical cleaning chain: keep docs whose predicted language is
    ``CLEAN_LANG`` and quality >= ``CLEAN_MIN_QUALITY_PPM``, then exact-dedup
    the survivors keeping the min doc_id per content hash.

    Shape: one map computes lang + quality + md5 per batch (three
    vectorized kernels over the same Arrow batch — the corpus is read
    ONCE); survivors emit only (content_hash, doc_id) pairs; the reduce is
    the native Min+Count aggregate with map-side combining.  Output:
    (content_hash, doc_id, n_dups, quality_ppm of the keeper).
    """
    from ray.data.aggregate import Count, Min

    from ..functions.text import lang_id_batch, quality_batch

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def prep(batch: pa.Table) -> pa.Table:
        lang = lang_id_batch(batch)["lang_pred"]
        qual = quality_batch(batch)["quality_ppm"]
        keep = pc.and_(
            pc.equal(lang, CLEAN_LANG),
            pc.greater_equal(qual, pa.scalar(CLEAN_MIN_QUALITY_PPM, pa.int64())),
        )
        kept = batch.filter(keep)
        kept_q = pc.filter(qual, keep)
        return pa.table(
            {
                "content_hash": md5_hex(kept["text"]),
                "doc_id": kept["doc_id"],
                "quality_ppm": kept_q,
            }
        )

    pairs = ds.map_batches(prep, batch_format="pyarrow")
    agg = pairs.groupby("content_hash").aggregate(
        Min("doc_id"), Count(), Min("quality_ppm")
    )
    # quality is a function of text, so min-over-group == the keeper's value

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "content_hash": batch["content_hash"],
                "doc_id": pc.cast(batch["min(doc_id)"], pa.int64()),
                "n_dups": pc.cast(batch["count()"], pa.int64()),
                "quality_ppm": pc.cast(batch["min(quality_ppm)"], pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def _doc_id_span(sf_dir: str):
    """(min_id, max_id, n_docs) of the documents table from parquet
    row-group statistics — NO scan.  None when stats are absent."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/documents.parquet")
    md = pf.metadata
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    try:
        ci = names.index("doc_id")
    except ValueError:
        return None
    lo, hi = None, None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        return None
    return int(lo), int(hi), md.num_rows


def _doc_id_span_scan(sf_dir: str):
    """(min_id, max_id, n_docs) via a doc_id-only column scan — the
    fallback when row-group statistics are absent but the caller
    explicitly asked for subpartitioning (one narrow int64 column read,
    never the text)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/documents.parquet")
    if "doc_id" not in pf.schema_arrow.names:
        return None
    lo, hi, n = None, None, 0
    for rb in pf.iter_batches(columns=["doc_id"]):
        ids = rb.column(0).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            continue
        b_lo, b_hi = int(ids.min()), int(ids.max())
        lo = b_lo if lo is None else min(lo, b_lo)
        hi = b_hi if hi is None else max(hi, b_hi)
        n += len(ids)
    if lo is None:
        return None
    return lo, hi, n


def _sub_assigner(sf_dir: str, n_subparts: int | None):
    """(nsub, ids -> sub) for doc_id-RANGE subpartitions within a pack
    part.  ``sub`` is monotone in doc_id, so the (part, sub) two-level
    layout preserves the part-wide doc_id order exactly and the packed
    coordinates are invariant to nsub (property-tested).  nsub defaults to
    ceil(n_docs / PACK_DOCS_PER_TASK) via parquet metadata; missing stats
    degrade to nsub=1 (always correct, single kernel call per part) —
    unless the caller EXPLICITLY requested n_subparts > 1, in which case
    the id span comes from a doc_id-only column scan rather than
    silently discarding the knob."""
    span = _doc_id_span(sf_dir)
    if span is None and n_subparts is not None and int(n_subparts) > 1:
        span = _doc_id_span_scan(sf_dir)
    if span is None:
        return 1, (lambda ids: np.zeros(len(ids), dtype=np.int64))
    lo, hi, n_docs = span
    if n_subparts is not None:
        nsub = max(1, int(n_subparts))
    else:
        nsub = max(1, -(-n_docs // PACK_DOCS_PER_TASK))
    if nsub <= 1 or hi <= lo:
        return 1, (lambda ids: np.zeros(len(ids), dtype=np.int64))
    # chunk-width division (not rel*nsub//width) so arbitrary int64 id
    # ranges can never overflow; still monotone in doc_id
    chunk = -(-(hi - lo + 1) // nsub)

    def assign(ids) -> np.ndarray:
        rel = np.clip(np.asarray(ids, dtype=np.int64) - lo, 0, hi - lo)
        return rel // chunk

    return nsub, assign


def _token_triples(sf_dir: str, assign):
    """(part, sub, doc_id, n_tokens) rows — 32 bytes/doc regardless of
    document size.  Shared by both packing variants."""
    from ..functions.text import token_stats_batch

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def prep(batch: pa.Table) -> pa.Table:
        n_tok = token_stats_batch(batch)["n_tokens"]
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array(id_bucket_digit(ids), pa.int64()),
                "sub": pa.array(assign(ids), pa.int64()),
                "doc_id": batch["doc_id"],
                "n_tokens": n_tok,
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


_PACK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("part", pa.int64()),
        ("seq_id", pa.int64()),
        ("seq_offset", pa.int64()),
    ]
)


def _pack_triples(
    triples, nsub: int, global_offsets: bool, with_n_tokens: bool = False
):
    """Two-level offset-stitched packing over a (part, sub, doc_id,
    n_tokens) Dataset.

    Phase 1 reduces the triples to one (part, sub, total_tokens) row per
    NONEMPTY subpartition; the driver prefix-sums that (tiny,
    subpartition-count-sized) list into exclusive start offsets — within
    each part for per-part window ids, across everything in (part, sub)
    order for corpus-global ids — broadcast via ``ray.put``.  Phase 2 is
    an independent per-(part, sub) doc_id-sort + cumsum shifted by the
    subpartition's offset.  Because ``sub`` is monotone in doc_id, the
    stitched coordinates equal the single-kernel part-wide cumsum for
    EVERY nsub (property-tested at nsub 1/5/4096), so the kernel-call
    size is a pure parallelism knob: 10^10 docs pack with ~2.5k
    subpartition kernels of PACK_DOCS_PER_TASK docs each instead of 16
    625M-doc sorts.

    Single-subpartition per-part ids skip phase 1 entirely (offset 0)."""
    import ray

    from ..functions.core import partial_then_global
    from ..functions.schema import ensure_schema

    two_level = global_offsets or nsub > 1
    off_ref = None
    if two_level:
        triples = triples.materialize()
        totals = (
            partial_then_global(triples, ["part", "sub"], ["n_tokens"])
            .to_pandas()
            .sort_values(["part", "sub"])
        )
        tok = totals["n_tokens"].to_numpy().astype(np.int64)
        gstart = np.cumsum(tok) - tok
        if global_offsets:
            base = gstart
        else:
            parts = totals["part"].to_numpy()
            first = np.searchsorted(parts, parts, side="left")
            base = gstart - gstart[first]
        off_ref = ray.put(
            {
                (int(p), int(s)): int(b)
                for p, s, b in zip(totals["part"], totals["sub"], base)
            }
        )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        off = (
            ray.get(off_ref)[(int(g["part"].iloc[0]), int(g["sub"].iloc[0]))]
            if off_ref is not None
            else 0
        )
        g = g.sort_values("doc_id")
        n_tok = g["n_tokens"].to_numpy().astype(np.int64)
        before = off + np.cumsum(n_tok) - n_tok
        out = {
            "doc_id": g["doc_id"].to_numpy(),
            "part": g["part"].to_numpy(),
            "seq_id": before // PACK_BUDGET_TOKENS,
            "seq_offset": before % PACK_BUDGET_TOKENS,
        }
        if with_n_tokens:
            out["n_tokens"] = n_tok
        return pd.DataFrame(out)

    schema = (
        _PACK_SCHEMA.append(pa.field("n_tokens", pa.int64()))
        if with_n_tokens
        else _PACK_SCHEMA
    )
    return ensure_schema(
        triples.groupby(["part", "sub"]).map_groups(
            kernel, batch_format="pandas"
        ),
        schema,
    )


def pack_sequences(sf_dir: str, n_subparts: int | None = None):
    """Concat-and-chunk sequence packing: within each of ``PACK_PARTS``
    deterministic partitions (first md5 hex digit of doc_id — the
    ``split_hash_buckets`` convention), documents are concatenated in
    doc_id order and chunked into ``PACK_BUDGET_TOKENS``-token context
    windows.  Each doc's coordinate is (seq_id, seq_offset) of its FIRST
    token; docs straddle window boundaries exactly as a pretraining
    dataloader packs them.

    Scale shape: the exchange moves (part, sub, doc_id, n_tokens) rows —
    32 bytes/doc regardless of document size; parallelism inside a part
    comes from doc_id-range subpartitions stitched by ``_pack_triples``
    (coordinates invariant to ``n_subparts``, which defaults to
    ceil(n_docs / PACK_DOCS_PER_TASK))."""
    nsub, assign = _sub_assigner(sf_dir, n_subparts)
    return _pack_triples(
        _token_triples(sf_dir, assign), nsub, global_offsets=False
    )


def pack_sequences_global(sf_dir: str, n_subparts: int | None = None):
    """Sequence packing with GLOBAL window coordinates — documents laid out
    in (part, doc_id) order across ALL partitions, windows numbered
    corpus-wide.  Same two-level offset stitch as :func:`pack_sequences`
    with the driver prefix running across all (part, sub) rows instead of
    resetting per part; driver state stays one row per nonempty
    subpartition."""
    nsub, assign = _sub_assigner(sf_dir, n_subparts)
    return _pack_triples(
        _token_triples(sf_dir, assign), nsub, global_offsets=True
    )


def corpus_prepare(sf_dir: str, n_subparts: int | None = None):
    """The END-TO-END pretraining corpus prep, all stages composed:

        clean (lang + quality) -> exact-dedup keep-one
            -> MinHash-LSH near-dup CLUSTER filter
            -> concat-and-chunk sequence packing of the final keepers.

    Cluster-filter semantics match the SEQUENTIAL pipeline: the kept
    representative of each near-dup cluster is the min doc_id among the
    CLEAN SURVIVORS of that cluster (not the raw-corpus representative —
    if a cluster's raw min-id doc fails the lang/quality filter, the
    cluster's content survives through its lowest-id clean member rather
    than vanishing).

    Output: (doc_id, part, seq_id, seq_offset) for exactly the documents a
    pretraining run would tokenize, with their context-window coordinates.

    Scale shape — ONE fused corpus scan, tokenized ONCE, and no
    corpus-sized broadcast: lang, quality, content hash, token count AND
    the MinHash signature all come out of the same tokenize of the same
    batch, emitted as one ~600-byte row per doc (id, hash, counts, clean
    flag, 512-byte raw signature).  That narrow table is materialized
    once (spillable; 1000x smaller than re-reading + re-tokenizing the
    corpus for the near-dup pass, which is what the unfused composition
    did) and feeds BOTH sides: the exact-dedup hash groupby consumes the
    clean rows (n_tokens is a function of the text, so every member of an
    exact-dup group shares it and the native Min aggregate carries the
    winner's count; the winner's pack partition is md5(doc_id) computed
    after the reduce), and the LSH band explosion re-derives band rows
    from the stored signatures.  The near-dup filter is a per-doc_id
    groupby of tagged rows — one 24-byte row per CLEAN KEEPER plus the
    pair-graph-sized cluster rows, map-side combined — followed by a
    coarse comp-hash partition that re-picks representatives vectorized
    (the ``top_event_per_user`` pattern).  Winners flow into the shared
    pack kernel.  Not SQL-expressible (MinHash banding) — golden-pinned
    and invariant-tested instead.
    """
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    narrow = ds.map_batches(
        corpus_prep_batch, batch_format="pyarrow"
    ).materialize()
    return _prepare_from_narrow(narrow, sf_dir, n_subparts)


def corpus_prep_batch(batch: pa.Table) -> pa.Table:
    """Fused clean + hash + token-count + minhash pass: the corpus is
    read ONCE and tokenized ONCE.  Map-only and doc-independent, so it
    is also the unit of CHECKPOINTING in ``corpus_prepare_resumable``."""
    import pyarrow.compute as pc

    from ..functions.dedup import (
        _sig_binary_array,
        minhash_sigs_from_shingles,
    )
    from ..functions.text import (
        _flat_tokens_arrow,
        lang_from_tokens,
        quality_from_tokens,
        shingles_from_tokens,
    )

    text_col = batch["text"]
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    text_col = pc.fill_null(text_col, "")
    parent, flat, n = _flat_tokens_arrow(text_col)
    toks = flat.to_numpy(zero_copy_only=False)
    lang = lang_from_tokens(parent, toks, n)
    q = quality_from_tokens(parent, toks, n, text_col)
    keep = (lang == np.asarray(CLEAN_LANG, dtype=object)) & (
        q["quality_ppm"] >= CLEAN_MIN_QUALITY_PPM
    )
    seg, sh, _nt = shingles_from_tokens(parent, flat, n)
    sigs = minhash_sigs_from_shingles(seg, sh, n)
    # content_hash is only ever read for clean rows (clean_pairs
    # below) — hash the kept slice and scatter via a null-masked
    # take, skipping the md5 pass over unclean text entirely
    keep_mask = pa.array(keep)
    kept_hash = md5_hex(text_col.filter(keep_mask))
    pos = np.cumsum(keep) - 1
    scatter = pa.array(np.where(keep, pos, 0), pa.int64(), mask=~keep)
    return pa.table(
        {
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "content_hash": kept_hash.take(scatter),
            "n_tokens": pa.array(q["n_tokens"].astype(np.int64)),
            "is_clean": pa.array(keep.astype(np.int64)),
            "sig": _sig_binary_array(sigs),
        }
    )


def _prepare_from_narrow(narrow, sf_dir: str, n_subparts: int | None):
    """The global tail of ``corpus_prepare``: exact dedup + near-dup
    cluster filter + pack, over an already-computed narrow table
    (in-memory materialized or re-read from checkpointed fragments)."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    from ..functions.dedup import (
        bands_from_sig_column,
        minhash_pairs_from_bands,
    )
    from ..functions.graph import dedup_minhash_groups

    pairs = minhash_pairs_from_bands(
        narrow.map_batches(bands_from_sig_column, batch_format="pyarrow")
    )

    def clean_pairs(batch: pa.Table) -> pa.Table:
        out = batch.filter(
            pc.equal(batch["is_clean"], pa.scalar(1, pa.int64()))
        )
        return out.select(["content_hash", "doc_id", "n_tokens"])

    winners = (
        narrow.map_batches(clean_pairs, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("doc_id"), Min("n_tokens"))
    )

    def to_keeper(batch: pa.Table) -> pa.Table:
        ids = batch["min(doc_id)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(id_bucket_digit(ids), pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pc.cast(batch["min(n_tokens)"], pa.int64()),
                "is_keep": pa.array(np.ones(len(ids), dtype=np.int64)),
                "comp": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            }
        )

    keepers = winners.map_batches(to_keeper, batch_format="pyarrow")
    clusters = dedup_minhash_groups(sf_dir, pairs=pairs).map_batches(
        lambda b: pa.table(
            {
                "part": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "n_tokens": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                "is_keep": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                "comp": pc.cast(b["comp"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    merged = (
        keepers.union(clusters)
        .groupby("doc_id")
        .aggregate(Max("part"), Sum("n_tokens"), Max("is_keep"), Max("comp"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        """Clean survivors only, with a comp-hash partition key for the
        representative pick (comp == -1: cluster-free, kept as-is)."""
        out = batch.filter(
            pc.equal(batch["max(is_keep)"], pa.scalar(1, pa.int64()))
        )
        comp = out["max(comp)"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = comp.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        cpart = np.where(
            comp < 0, -1, (key % np.uint64(64)).astype(np.int64)
        ).astype(np.int64)
        return pa.table(
            {
                "part": pc.cast(out["max(part)"], pa.int64()),
                "doc_id": pc.cast(out["doc_id"], pa.int64()),
                "n_tokens": pc.cast(out["sum(n_tokens)"], pa.int64()),
                "comp": pa.array(comp, pa.int64()),
                "__cpart": pa.array(cpart, pa.int64()),
            }
        )

    survivors = merged.map_batches(finalize, batch_format="pyarrow")

    def pick_reps(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized min-doc-per-comp (one coarse partition = many comps;
        the __cpart == -1 partition is the cluster-free passthrough)."""
        g = g.sort_values(["comp", "doc_id"], kind="mergesort")
        if int(g["__cpart"].iloc[0]) < 0:
            win = np.ones(len(g), dtype=bool)
        else:
            comp = g["comp"].to_numpy()
            win = np.empty(len(g), dtype=bool)
            win[0] = True
            win[1:] = comp[1:] != comp[:-1]
        kept = g[win]
        return pd.DataFrame(
            {
                "part": kept["part"].to_numpy(),
                "doc_id": kept["doc_id"].to_numpy(),
                "n_tokens": kept["n_tokens"].to_numpy(),
            }
        )

    reps = survivors.groupby("__cpart").map_groups(
        pick_reps, batch_format="pandas"
    )

    nsub, assign = _sub_assigner(sf_dir, n_subparts)

    def add_sub(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pc.cast(batch["part"], pa.int64()),
                "sub": pa.array(assign(ids), pa.int64()),
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_tokens": pc.cast(batch["n_tokens"], pa.int64()),
            }
        )

    # the survivor set is a subset of the corpus id range, so the corpus
    # _sub_assigner stays monotone over it — coordinates remain
    # nsub-invariant (property-tested)
    return _pack_triples(
        reps.map_batches(add_sub, batch_format="pyarrow"),
        nsub,
        global_offsets=False,
    )


def corpus_prepare_resumable(
    sf_dir: str,
    out_dir: str,
    *,
    num_partitions: int = 64,
    n_subparts: int | None = None,
) -> dict:
    """Checkpointed ``corpus_prepare``: a killed run resumes without
    re-tokenizing finished partitions.

    Stage 1 (the expensive part — the fused tokenize/clean/hash/minhash
    scan, typically >90% of wall time) writes the narrow table through
    ``resumable_write``: committed partitions are filtered out BEFORE the
    scan on a rerun, so their COMPUTE is skipped, not just their write.
    Stage 2 (global dedup + cluster filter + pack — exchanges over
    ~600-byte rows, no text) re-runs from the committed narrow fragments;
    its output lands via a second ``resumable_write`` so rewriting also
    skips committed packed partitions.  The global stage cannot be
    input-partitioned (dedup and packing are corpus-wide by definition) —
    checkpointing the scan boundary is exactly the split a 100-TB run
    needs, because stage 2's input is ~1000x smaller than the corpus.

    Completeness is verified between stages: the committed narrow
    manifests must account for every input row (parquet METADATA count,
    no scan) before stage 2 may run — a partial stage-1 output can never
    silently drop documents from the packed result.
    """
    import os

    import pyarrow.parquet as pq

    from ..state.checkpoint import read_manifests, read_output, resumable_write

    narrow_dir = os.path.join(out_dir, "narrow")
    packed_dir = os.path.join(out_dir, "packed")

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    stage1 = resumable_write(
        docs,
        narrow_dir,
        num_partitions=num_partitions,
        pipeline=lambda ds: ds.map_batches(
            corpus_prep_batch, batch_format="pyarrow"
        ),
    )

    total = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    committed = sum(m["n_docs"] for m in read_manifests(narrow_dir))
    if committed != total:
        raise RuntimeError(
            f"narrow checkpoint incomplete: {committed}/{total} docs "
            f"committed under {narrow_dir}; rerun to resume"
        )

    packed = _prepare_from_narrow(read_output(narrow_dir), sf_dir, n_subparts)
    stage2 = resumable_write(
        packed, packed_dir, num_partitions=num_partitions
    )
    return {
        "out_dir": out_dir,
        "narrow": stage1,
        "packed": stage2,
        "n_docs_input": total,
    }


# ---------------------------------------------------------------------------
# Filter-cascade funnel: cumulative survivor counts per cleaning stage
# ---------------------------------------------------------------------------

FUNNEL_MIN_CHARS = 64
FUNNEL_STAGES = ("all", "min_chars", "lang_en", "quality", "unique")


def corpus_filter_funnel(sf_dir: str):
    """Observability for the cleaning cascade: how many docs survive each
    stage CUMULATIVELY — all -> n_chars >= FUNNEL_MIN_CHARS -> predicted
    lang == CLEAN_LANG -> quality >= CLEAN_MIN_QUALITY_PPM -> distinct
    content (the keeper count an exact dedup would retain).  The standard
    per-stage rejection report a pretraining pipeline publishes before
    committing a recipe.

    Scale shape: ONE corpus scan computes every stage mask per batch
    (the corpus_clean_keep fused-kernel pattern); each batch emits its
    map-side-UNIQUE survivor hashes plus one 32-byte counter row (hash
    sentinel "", unreachable: real hashes are 32 hex chars).  One
    hash-keyed exchange merges duplicates across batches; a tiny
    partial+global fold then reduces that to ONE row — the driver sees
    five typed rows, never corpus-proportional data."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..functions.core import partial_then_global as _partial_then_global
    from ..functions.hashing import md5_hex
    from ..functions.text import lang_id_batch, quality_batch

    # doc_id rides only because lang_id_batch's output schema carries it
    ds = _read_docs(sf_dir, ["doc_id", "text", "n_chars"])

    def prep(batch: pa.Table) -> pa.Table:
        lang = lang_id_batch(batch)["lang_pred"]
        qual = quality_batch(batch)["quality_ppm"]
        m_min = pc.greater_equal(
            batch["n_chars"], pa.scalar(FUNNEL_MIN_CHARS, pa.int64())
        )
        m_lang = pc.and_(m_min, pc.equal(lang, CLEAN_LANG))
        m_qual = pc.and_(
            m_lang,
            pc.greater_equal(
                qual, pa.scalar(CLEAN_MIN_QUALITY_PPM, pa.int64())
            ),
        )
        uniq = pc.unique(md5_hex(batch.filter(m_qual)["text"]))
        zeros = np.zeros(len(uniq), dtype=np.int64)

        def _n(mask) -> int:
            return int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)

        return pa.table(
            {
                "content_hash": pa.concat_arrays(
                    [uniq.combine_chunks() if isinstance(uniq, pa.ChunkedArray) else uniq,
                     pa.array([""], pa.string())]
                ),
                "n_all": pa.array(
                    np.concatenate([zeros, [batch.num_rows]]), pa.int64()
                ),
                "n_min": pa.array(np.concatenate([zeros, [_n(m_min)]]), pa.int64()),
                "n_lang": pa.array(np.concatenate([zeros, [_n(m_lang)]]), pa.int64()),
                "n_qual": pa.array(np.concatenate([zeros, [_n(m_qual)]]), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Sum("n_all"), Sum("n_min"), Sum("n_lang"), Sum("n_qual"))
    )

    def fold(batch: pa.Table) -> pa.Table:
        ctr = pc.equal(batch["content_hash"], "")
        n_ctr_rows = pc.sum(pc.cast(ctr, pa.int64())).as_py() or 0

        def _s(col) -> int:
            return int(
                pc.sum(pc.filter(batch[col], ctr)).as_py() or 0
            )

        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "n_all": pa.array([_s("sum(n_all)")], pa.int64()),
                "n_min": pa.array([_s("sum(n_min)")], pa.int64()),
                "n_lang": pa.array([_s("sum(n_lang)")], pa.int64()),
                "n_qual": pa.array([_s("sum(n_qual)")], pa.int64()),
                "n_unique": pa.array(
                    [batch.num_rows - n_ctr_rows], pa.int64()
                ),
            }
        )

    rows = _partial_then_global(
        agg.map_batches(fold, batch_format="pyarrow"),
        ["k"],
        ["n_all", "n_min", "n_lang", "n_qual", "n_unique"],
    ).take_all()
    tot = rows[0] if rows else {}
    counts = [
        int(tot.get("n_all", 0) or 0),
        int(tot.get("n_min", 0) or 0),
        int(tot.get("n_lang", 0) or 0),
        int(tot.get("n_qual", 0) or 0),
        int(tot.get("n_unique", 0) or 0),
    ]
    # driver-bounded 5 rows; typed per the empty-schema invariant
    return pa.table(
        {
            "stage_idx": pa.array(range(len(FUNNEL_STAGES)), pa.int64()),
            "stage": pa.array(list(FUNNEL_STAGES), pa.string()),
            "n_docs": pa.array(counts, pa.int64()),
        }
    )


_FUNNEL_GOPHER_SCHEMA = pa.schema(
    [("stage", pa.int64()), ("n_docs", pa.int64())]
)


def corpus_filter_funnel_gopher(sf_dir: str):
    """The dataset-card retention funnel: how many documents survive each
    successive curation stage —
        stage 0  all documents
        stage 1  tokenizable (>= 1 token)
        stage 2  Gopher repetition keep (shared ``repetition_ppms``
                 kernel — the SAME thresholds as doc_repetition_stats)
        stage 3  exact-content dedup applied to stage-2 survivors
                 (distinct md5(text); each duplicate class survives once)

    Scale shape: ONE fused scan computes every flag and emits (a) three
    int64 count partials per batch and (b) batch-deduped md5 rows for
    stage-2 survivors only; the counts fold through a native Sum and the
    dedup is one distinct-hash-grain exchange counted without the text
    ever shuffling.  The result is 4 driver-bounded rows (typed table
    per the empty-schema invariant)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.text import repetition_ppms

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def flags(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n_tok, _dup, _top, keep = repetition_ppms(text)
        s2 = keep.astype(bool)
        hashes = pc.unique(
            md5_hex(pc.fill_null(text, "")).filter(pa.array(s2))
            if s2.any()
            else pa.array([], pa.string())
        )
        counts = pa.table(
            {
                "kind": pa.array([0, 1, 2], pa.int64()),
                "h": pa.array(["", "", ""], pa.string()),
                "n": pa.array(
                    [batch.num_rows, int((n_tok > 0).sum()), int(s2.sum())],
                    pa.int64(),
                ),
            }
        )
        hrows = pa.table(
            {
                "kind": pa.array(np.full(len(hashes), 3, dtype=np.int64)),
                "h": pc.cast(hashes, pa.string()),
                "n": pa.array(np.ones(len(hashes), dtype=np.int64)),
            }
        )
        return pa.concat_tables([counts, hrows])

    if docs.count() == 0:  # parquet-metadata count; also guards the
        # empty-Dataset groupby quirk (CLAUDE.md) in the distinct stage
        return pa.table(
            {
                "stage": pa.array([0, 1, 2, 3], pa.int64()),
                "n_docs": pa.array([0, 0, 0, 0], pa.int64()),
            },
            schema=_FUNNEL_GOPHER_SCHEMA,
        )
    # materialized once (narrow: 3 count rows + batch-deduped 33 B hash
    # rows per block, distributed) so the two consumers share the scan
    part = docs.map_batches(flags, batch_format="pyarrow").materialize()

    count_rows = (
        part.map_batches(
            lambda b: b.filter(pc.less(b["kind"], 3)), batch_format="pyarrow"
        )
        .groupby("kind")
        .aggregate(Sum("n"))
        .take_all()
    )  # exactly 3 driver rows
    counts = {0: 0, 1: 0, 2: 0}
    for r in count_rows:
        counts[int(r["kind"])] = int(r["sum(n)"])
    # distinct survivors: group at hash grain DISTRIBUTED, the driver
    # sees only the group count (never the hashes).  No stage-2
    # survivors -> skip the groupby (empty-Dataset quirk, CLAUDE.md)
    counts[3] = (
        part.map_batches(
            lambda b: b.filter(pc.equal(b["kind"], 3)), batch_format="pyarrow"
        )
        .groupby("h")
        .count()
        .count()
        if counts[2]
        else 0
    )
    return pa.table(
        {
            "stage": pa.array(sorted(counts), pa.int64()),
            "n_docs": pa.array([counts[k] for k in sorted(counts)], pa.int64()),
        },
        schema=_FUNNEL_GOPHER_SCHEMA,
    )


_FRAG_SCHEMA = pa.schema(
    [
        ("n_docs", pa.int64()),
        ("n_split", pa.int64()),
        ("split_ppm", pa.int64()),
        ("max_windows", pa.int64()),
    ]
)


def pack_fragmentation_report(sf_dir: str, n_subparts: int | None = None):
    """Packing-quality report: how many documents the concat-and-chunk
    layout SPLITS across context-window boundaries (a split doc loses
    cross-boundary attention; every pretraining team tracks this before
    committing a budget).  For a doc starting at in-window offset ``o``
    with ``n`` tokens, windows spanned = (o + n - 1) // BUDGET + 1;
    zero-token docs occupy no window and are excluded.  Reports
    (n_docs, n_split, split_ppm, max_windows) — one typed row.

    Scale shape: the ``pack_sequences`` offset stitch (32 B/doc rows,
    subpartition kernels) with n_tokens riding along, folded map-side to
    (count, split-count, max) partials — one <= blocks-row exchange."""
    from ray.data.aggregate import Max, Sum

    nsub, assign = _sub_assigner(sf_dir, n_subparts)
    packed = _pack_triples(
        _token_triples(sf_dir, assign), nsub, global_offsets=False,
        with_n_tokens=True,
    )

    def partial(b: pa.Table) -> pa.Table:
        nt = b["n_tokens"].to_numpy(zero_copy_only=False)
        off = b["seq_offset"].to_numpy(zero_copy_only=False)
        m = nt > 0
        w = (off[m] + nt[m] - 1) // PACK_BUDGET_TOKENS + 1
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "n_docs": pa.array([int(m.sum())], pa.int64()),
                "n_split": pa.array([int((w >= 2).sum())], pa.int64()),
                "max_windows": pa.array(
                    [int(w.max()) if len(w) else 0], pa.int64()
                ),
            }
        )

    rows = (
        packed.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n_docs"), Sum("n_split"), Max("max_windows"))
        .take_all()
    )
    if not rows or not int(rows[0]["sum(n_docs)"] or 0):
        return _FRAG_SCHEMA.empty_table()
    n_docs = int(rows[0]["sum(n_docs)"])
    n_split = int(rows[0]["sum(n_split)"])
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_split": pa.array([n_split], pa.int64()),
            "split_ppm": pa.array([n_split * 1_000_000 // n_docs], pa.int64()),
            "max_windows": pa.array(
                [int(rows[0]["max(max_windows)"])], pa.int64()
            ),
        },
        schema=_FRAG_SCHEMA,
    )
