"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline operators (language ID, quality scoring,
token counting, fingerprinting).  Each has a matching DuckDB oracle in
``__ray_entry__.py``; to keep the value-hash comparison exact, every derived
ratio is an integer (ppm = parts-per-million, floor division) and every hash
is md5 hex — identical in Python and DuckDB.

All stages are stateless ``map_batches`` transforms.  Tokenization is
vectorized: one Arrow RE2 pass splits every text in the batch into a
flattened token array with parent-row indices (``_flat_tokens``), and the
per-doc statistics fall out of ``np.bincount`` / factorized-code lookups —
no Python loop over rows or tokens in token_stats / lang_id / quality.
``fingerprint`` alone keeps a per-shingle loop because its value IS an md5
digest (the DuckDB oracle mirrors ``md5(...)`` exactly); the cost there is
the digest, not the loop.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[a-z0-9]+"
_token = re.compile(TOKEN_RE)

# Sentinel standing in for a NULL lang through Ray shuffles (Ray's
# sort-based groupby can't compare None to str); decoded back to NULL in
# the final stage.  Real lang codes never contain a NUL byte.
_NULL_LANG = "\x00"

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")

LANG_MARKERS = (
    ("en", ("the", "and", "of")),
    ("es", ("el", "la", "los")),
    ("de", ("der", "und", "das")),
    ("fr", ("le", "les", "des")),
)


def _read_docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _tokens(text: str) -> list[str]:
    return _token.findall(text.lower())


def _flat_tokens_arrow(col) -> tuple[np.ndarray, pa.Array, int]:
    """Vectorized tokenizer for a whole batch column, tokens kept as an
    Arrow array (no Python string materialization).

    One RE2 pass replaces every non-token run with a single space, then a
    plain split yields a ListArray of tokens; we flatten it and return
    ``(parent_row_idx, token_array, n_rows)``.  Token set is identical to
    ``re.findall('[a-z0-9]+', text.lower())`` per row (empty/null texts
    contribute zero tokens).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    cleaned = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(col), "[^a-z0-9]+", " "), " "
    )
    lists = pc.split_pattern(cleaned, " ")
    flat = lists.flatten()
    counts = np.diff(lists.offsets.to_numpy())
    parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    return parent[keep], flat.filter(pa.array(keep)), len(counts)


def _flat_tokens(col) -> tuple[np.ndarray, np.ndarray, int]:
    """``_flat_tokens_arrow`` with tokens materialized as numpy object
    strings (for consumers that factorize / isin over them)."""
    parent, flat, n = _flat_tokens_arrow(col)
    return parent, flat.to_numpy(zero_copy_only=False), n


def normalized_flat_tokens(text_col):
    """The shared quality-prep preamble: normalize the batch's text column
    (chunks combined, NULL -> '' — the oracle's ``COALESCE(text, '')``)
    and run the ONE tokenizer pass every quality-scoring prep starts
    from.  Returns ``(parent, toks, n_rows, text_col)``.  Lives here
    exactly once so the oracle-pinned quality path cannot fork between
    its call sites (source_quality_report / source_quality_floor_keep /
    corpus_token_budget_cut)."""
    import pyarrow.compute as pc

    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    text_col = pc.fill_null(text_col, "")
    parent, toks, n = _flat_tokens(text_col)
    return parent, toks, n, text_col


def flat_shingles(col) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """``shingles_from_tokens`` over a fresh tokenize of ``col`` — see that
    function for the contract."""
    parent, flat, n = _flat_tokens_arrow(col)
    return shingles_from_tokens(parent, flat, n)


def ngrams_from_tokens(
    parent: np.ndarray, flat: pa.Array, n: int
) -> tuple[np.ndarray, pa.Array]:
    """Consecutive word n-grams for a whole batch from a pre-tokenized
    ``_flat_tokens_arrow`` output — n zero-copy slices of the flat token
    array joined element-wise, kept only where all n tokens share a parent
    row (no cross-document joins).  Returns ``(seg, ngrams)``: ``seg[i]``
    is the parent row of ``ngrams[i]``.  No short-row fallback — rows with
    fewer than n tokens yield nothing (``shingles_from_tokens`` layers the
    reference's 1-2-token fallback on top of this)."""
    m = len(flat)
    if m < n:
        return np.empty(0, dtype=np.int64), pa.array([], pa.string())
    w = m - n + 1
    grams = pc.binary_join_element_wise(
        *(flat.slice(i, w) for i in range(n)), " "
    )
    valid = parent[:w] == parent[n - 1 :]
    return parent[:w][valid], grams.filter(pa.array(valid))


def shingles_from_tokens(
    parent: np.ndarray, flat: pa.Array, n: int
) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Word-3-gram shingles for a whole batch, built entirely with Arrow
    kernels from a pre-tokenized batch (``_flat_tokens_arrow`` output) — no
    per-document Python loop, no per-shingle ``join``.

    Returns ``(seg, shingles, n_tokens_per_row)``: ``seg[i]`` is the parent
    row of ``shingles[i]``.  Per-row shingle MULTISET is identical to the
    per-doc reference (``dedup._shingles``): rows with >= 3 tokens yield one
    ``"t0 t1 t2"`` string per consecutive triple (3-grams built by joining
    three zero-copy slices of the flat token array, kept only where all
    three tokens share a parent row); rows with 1-2 tokens yield ONE
    fallback shingle (the space-joined token list); rows with 0 tokens
    yield none.  Order within a row is NOT the reference's scan order
    (fallbacks are appended last) — every consumer reduces per-row
    (min / distinct-set), so order never matters.
    """
    m = len(flat)
    ntok = (
        np.bincount(parent, minlength=n) if m else np.zeros(n, dtype=np.int64)
    )
    seg_parts: list[np.ndarray] = []
    sh_parts: list[pa.Array] = []
    if m >= 3:
        tri_seg, tri = ngrams_from_tokens(parent, flat, 3)
        seg_parts.append(tri_seg)
        sh_parts.append(tri)
    small = np.nonzero((ntok >= 1) & (ntok <= 2))[0]
    if small.size:
        starts = (np.cumsum(ntok) - ntok)[small]
        first = flat.take(pa.array(starts))
        two = ntok[small] == 2
        if two.any():
            second = flat.take(pa.array(np.minimum(starts + 1, m - 1)))
            fb = pc.if_else(
                pa.array(two),
                pc.binary_join_element_wise(first, second, " "),
                first,
            )
        else:
            fb = first
        seg_parts.append(small)
        sh_parts.append(fb)
    if not seg_parts:
        return np.empty(0, dtype=np.int64), pa.array([], pa.string()), ntok
    shingles = pa.concat_arrays(
        [
            c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            for c in sh_parts
        ]
    )
    return np.concatenate(seg_parts), shingles, ntok


def token_stats_batch(batch: pa.Table) -> pa.Table:
    import pandas as pd

    parent, toks, n = _flat_tokens(batch["text"])
    n_tok = np.bincount(parent, minlength=n)
    # distinct tokens per doc: factorize once (C hash table), then unique
    # (row, token_code) pairs via a single int64 sort — no per-row sets.
    codes, uniques = pd.factorize(toks)
    pair_ids = parent * np.int64(len(uniques) + 1) + codes
    uniq_parent = parent[np.unique(pair_ids, return_index=True)[1]]
    n_uniq = np.bincount(uniq_parent, minlength=n)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_uniq_tokens": pa.array(n_uniq, pa.int64()),
        }
    )


def token_stats(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        token_stats_batch, batch_format="pyarrow"
    )


# Gopher-style repetition thresholds (Rae et al. 2021 drop docs whose most
# frequent word exceeds ~20% of tokens); the dup bound is the engine's own.
# Mirrored as literals in the doc_repetition_stats oracle SQL.
REP_TOP_TOKEN_MAX_PPM = 200_000
REP_DUP_TOKEN_MAX_PPM = 600_000


def repetition_ppms(text_col):
    """The Gopher repetition kernel for a whole batch column — lives here
    exactly once (``repetition_batch`` AND ``corpus_filter_funnel`` call
    it, so the filter semantics cannot fork).  Returns per-row
    ``(n_tok, dup_ppm, top_ppm, keep)``; zero-token rows get ppms 0 and
    keep 0 (callers decide whether to drop them).  Vectorized: one
    factorize over the flat tokens, unique (row, code) pairs with counts
    via one int64 sort, per-row max by ``np.maximum.at``."""
    import pandas as pd

    parent, toks, n = _flat_tokens(text_col)
    n_tok = np.bincount(parent, minlength=n).astype(np.int64)
    codes, uniques = pd.factorize(toks)
    stride = np.int64(len(uniques) + 1)
    pair_ids = parent * stride + codes
    upair, ucount = np.unique(pair_ids, return_counts=True)
    uparent = (upair // stride).astype(np.int64)
    n_uniq = np.bincount(uparent, minlength=n).astype(np.int64)
    top = np.zeros(n, dtype=np.int64)
    np.maximum.at(top, uparent, ucount)
    nz = np.maximum(n_tok, 1)
    # all operands non-negative: // is floor == trunc — oracle-safe
    dup_ppm = (n_tok - n_uniq) * 1_000_000 // nz
    top_ppm = top * 1_000_000 // nz
    keep = (
        (top_ppm <= REP_TOP_TOKEN_MAX_PPM)
        & (dup_ppm <= REP_DUP_TOKEN_MAX_PPM)
        & (n_tok > 0)
    ).astype(np.int64)
    return n_tok, dup_ppm, top_ppm, keep


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Within-doc repetition stats in exact integer ppm:

    - dup_token_ppm = (tokens - distinct tokens) / tokens
    - top_token_ppm = occurrences of the most frequent token / tokens
    - keep = 1 when both are at or under the Gopher-style bounds

    Docs with zero tokens are dropped (the oracle's unnest GROUP BY has no
    row for them; an empty doc is no-keep by definition).  Kernel shared
    with the funnel report via ``repetition_ppms``."""
    n_tok, dup_ppm, top_ppm, keep = repetition_ppms(batch["text"])
    has = n_tok > 0
    return pa.table(
        {
            "doc_id": pc.cast(batch["doc_id"], pa.int64()).filter(
                pa.array(has)
            ),
            "dup_token_ppm": pa.array(dup_ppm[has], pa.int64()),
            "top_token_ppm": pa.array(top_ppm[has], pa.int64()),
            "keep": pa.array(keep[has], pa.int64()),
        }
    )


def repetition_stats(sf_dir: str):
    """Gopher-style repetition filter stats per document — a map-only
    scan (every statistic is within-doc), zero shuffle at any scale."""
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        repetition_batch, batch_format="pyarrow"
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Marker-token language ID: argmax of per-language marker counts with
    first-listed-language precedence on ties; 'und' when all counts are 0.

    Vectorized: factorize the flattened tokens once, test the (tiny) unique
    vocabulary against each language's marker set, and bincount matches by
    parent row — ``np.argmax`` along the language axis picks the first max,
    which is exactly the reference's strict-``>`` scan order.
    """
    parent, toks, n = _flat_tokens(batch["text"])
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(
                lang_from_tokens(parent, toks, n), pa.string()
            ),
        }
    )


def lang_from_tokens(parent: np.ndarray, toks: np.ndarray, n: int) -> np.ndarray:
    """``lang_id_batch`` kernel over a pre-tokenized batch (so fused scans
    tokenize once); returns an object array of lang codes."""
    import pandas as pd

    codes, uniques = pd.factorize(toks)
    counts = np.zeros((n, len(LANG_MARKERS)), dtype=np.int64)
    uniq = np.asarray(uniques, dtype=object)
    for j, (_, markers) in enumerate(LANG_MARKERS):
        hit = np.isin(uniq, np.array(markers, dtype=object))[codes]
        if hit.any():
            counts[:, j] = np.bincount(parent[hit], minlength=n)
    langs = np.array([lang for lang, _ in LANG_MARKERS] + ["und"], dtype=object)
    best = np.where(counts.max(axis=1) > 0, counts.argmax(axis=1), len(LANG_MARKERS))
    return langs[best]


def lang_id(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        lang_id_batch, batch_format="pyarrow"
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality components in exact integer ppm:

    - stop_ppm  = stopword tokens / tokens
    - alpha_ppm = [a-z] chars (of lowercased text) / total chars
    - quality_ppm = (4*min(n_tokens/100,1) + 3*stop + 3*alpha) / 10
    """
    text_col = batch["text"]
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    text_col = pc.fill_null(text_col, "")
    parent, toks, n = _flat_tokens(text_col)
    q = quality_from_tokens(parent, toks, n, text_col)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(q["n_tokens"], pa.int64()),
            "stop_ppm": pa.array(q["stop_ppm"], pa.int64()),
            "alpha_ppm": pa.array(q["alpha_ppm"], pa.int64()),
            "quality_ppm": pa.array(q["quality_ppm"], pa.int64()),
        }
    )


def quality_from_tokens(
    parent: np.ndarray, toks: np.ndarray, n: int, text_col: pa.Array
) -> dict:
    """``quality_batch`` kernel over a pre-tokenized batch (so fused scans
    tokenize once); ``text_col`` must be the null-filled text array the
    tokens came from (char-level ratios still need it)."""
    import pandas as pd

    n_tok = np.bincount(parent, minlength=n)
    codes, uniques = pd.factorize(toks)
    stop_hit = np.isin(np.asarray(uniques, dtype=object), np.array(STOPWORDS, dtype=object))[codes]
    n_stop = np.bincount(parent[stop_hit], minlength=n) if stop_hit.any() else np.zeros(n, np.int64)
    n_alpha = pc.count_substring_regex(pc.utf8_lower(text_col), "[a-z]").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    n_chars = pc.utf8_length(text_col).to_numpy(zero_copy_only=False).astype(np.int64)
    stop_ppm = np.where(n_tok > 0, (n_stop * 1_000_000) // np.maximum(n_tok, 1), 0)
    alpha_ppm = np.where(n_chars > 0, (n_alpha * 1_000_000) // np.maximum(n_chars, 1), 0)
    len_ppm = np.minimum(n_tok * 10_000, 1_000_000)
    qual_ppm = (4 * len_ppm + 3 * stop_ppm + 3 * alpha_ppm) // 10
    return {
        "n_tokens": n_tok,
        "stop_ppm": stop_ppm,
        "alpha_ppm": alpha_ppm,
        "quality_ppm": qual_ppm,
    }


def quality(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pyarrow"
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint: min md5 over word 3-gram shingles (docs with
    <3 tokens fall back to md5 of the space-joined token list; 0 tokens
    -> md5('')).  The min-hash of shingles is the SURVEY 'document
    fingerprinting (rolling hash)' operator in a form DuckDB can mirror
    exactly.

    Vectorized: Arrow shingle build (``flat_shingles``) + one md5 pass per
    batch (``hashing.md5_hex``) + per-doc min via a pandas groupby — no
    per-document Python loop.  Values bit-identical to the per-doc path
    (pinned by the SQL oracle)."""
    import pandas as pd

    from .hashing import md5_hex

    seg, sh, ntok = flat_shingles(batch["text"])
    n = len(ntok)
    fps = np.full(n, hashlib.md5(b"").hexdigest(), dtype=object)
    if len(seg):
        hexes = md5_hex(sh).to_numpy(zero_copy_only=False)
        mins = pd.Series(hexes).groupby(seg).min()
        fps[mins.index.to_numpy()] = mins.to_numpy()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_shingles": pa.array(np.maximum(ntok - 2, 0).astype(np.int64)),
            "fingerprint": pa.array(fps, pa.string()),
        }
    )


def fingerprint(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    )


def html_visible_stats(sf_dir: str):
    """The boilerplate-strip scoring kernel applied to documents.text,
    SQL-checkable: visible length after tag strip + whitespace collapse
    (validates the extraction engine's core string kernel against DuckDB)."""
    import pyarrow.compute as pc

    from .. import conformance as C

    def stats(batch: pa.Table) -> pa.Table:
        raw = batch["text"]
        stripped = pc.replace_substring_regex(raw, C.RE_TAG, " ")
        vis = pc.utf8_trim(
            pc.replace_substring_regex(stripped, C.RE_WS, " "), C.WS_CHARS
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "raw_len": pc.cast(pc.utf8_length(raw), pa.int64()),
                "visible_len": pc.cast(pc.utf8_length(vis), pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


def top_tokens_by_lang(sf_dir: str, k: int = 5):
    """Top-k tokens per language by corpus frequency (the per-language
    vocabulary head a training-data pipeline reports): (lang, token, n,
    rank), ties broken (n DESC, token ASC).

    Scale shape: per-batch exact (lang, token) counts (one RE2 tokenizer
    pass + factorize/bincount), one partial+global groupby over the count
    partials — the exchange moves one row per (block, lang, token), never
    token instances — then per-lang top-k via block-level partial selection
    and a tiny per-lang merge (same pattern as mode_value_by_type)."""
    import pandas as pd

    from .core import partial_then_global as _partial_then_global

    _schema = pa.schema(
        [("lang", pa.string()), ("token", pa.string()), ("n", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        parent, toks, _n = _flat_tokens(batch["text"])
        if not len(toks):
            return _schema.empty_table()
        langs = np.asarray(
            batch["lang"].to_numpy(zero_copy_only=False), dtype=object
        )
        tcodes, tuniq = pd.factorize(toks)
        # use_na_sentinel=False: a NULL lang is an ordinary group (as the
        # oracle's GROUP BY lang), not a -1 code that poisons bincount
        lcodes, luniq = pd.factorize(langs[parent], use_na_sentinel=False)
        # NULL lang is an ordinary group (as the oracle's GROUP BY lang), but
        # Ray's sort-based groupby raises on None string keys — encode NULL
        # as a NUL-byte sentinel through the shuffles, decoded at the end
        # (real lang codes never contain "\x00").
        luniq = np.array(
            [x if isinstance(x, str) else _NULL_LANG for x in luniq],
            dtype=object,
        )
        comp = lcodes.astype(np.int64) * np.int64(len(tuniq)) + tcodes
        binc = np.bincount(comp)
        nz = np.nonzero(binc)[0]
        return pa.table(
            {
                "lang": pa.array(
                    np.asarray(luniq, dtype=object)[nz // len(tuniq)], pa.string()
                ),
                "token": pa.array(
                    np.asarray(tuniq, dtype=object)[nz % len(tuniq)], pa.string()
                ),
                "n": pa.array(binc[nz].astype(np.int64)),
            }
        )

    counts = _partial_then_global(
        _read_docs(sf_dir, ["lang", "text"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["lang", "token"],
        ["n"],
    )

    def block_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["lang", "n", "token"], ascending=[True, False, True]
        )
        # dropna=False: keep the NULL-lang group (the oracle's GROUP BY lang
        # keeps NULLs; pandas groupby drops NaN keys by default).
        return pa.Table.from_pandas(
            df.groupby("lang", sort=False, dropna=False).head(k),
            preserve_index=False,
        )

    def lang_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "token"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    from .schema import ensure_schema

    def decode_null_lang(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lang = pc.if_else(
            pc.equal(b["lang"], _NULL_LANG),
            pa.scalar(None, pa.string()),
            b["lang"],
        )
        return b.set_column(b.schema.get_field_index("lang"), "lang", lang)

    return ensure_schema(
        counts.map_batches(block_topk, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(lang_topk, batch_format="pandas")
        .map_batches(decode_null_lang, batch_format="pyarrow"),
        pa.schema(
            [
                ("lang", pa.string()),
                ("token", pa.string()),
                ("n", pa.int64()),
                ("rank", pa.int64()),
            ]
        ),
    )


TFIDF_TOP_K = 3


def tfidf_top_terms(sf_dir: str, k: int = TFIDF_TOP_K):
    """Per-document top-k terms by TF-IDF — the classic IR keyword extractor,
    in exact integer arithmetic so the DuckDB oracle hashes bit-for-bit:
    ``idf_ppm = (N * 1_000_000) // df`` (df = docs containing the term) and
    ``score = tf * idf_ppm``; ties broken (score DESC, term ASC).

    Scale shape: pass 1 builds the document-frequency table from per-batch
    (token, df) partials (tokens deduped per doc inside the batch, so the
    exchange moves one row per distinct (block, token), never token
    instances); the vocabulary table is broadcast once via ``ray.put``
    (vocab-sized — graduate to a shuffle join on token above ~10^8 distinct
    terms). Pass 2 is MAP-ONLY: each doc's tf, score and top-k live entirely
    inside its own row, so no exchange of per-doc term rows at all."""
    import pandas as pd
    import ray
    import ray.data as rd

    from .core import partial_then_global as _partial_then_global
    from .schema import ensure_schema

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata count: no scan

    def df_partial(batch: pa.Table) -> pa.Table:
        parent, toks, _n = _flat_tokens(batch["text"])
        if not len(toks):
            return pa.schema([("token", pa.string()), ("df", pa.int64())]).empty_table()
        tcodes, tuniq = pd.factorize(toks)
        # dedupe (doc, token) within the batch: df counts documents
        comp = np.unique(parent * np.int64(len(tuniq)) + tcodes)
        binc = np.bincount(comp % len(tuniq), minlength=len(tuniq))
        return pa.table(
            {
                "token": pa.array(np.asarray(tuniq, dtype=object), pa.string()),
                "df": pa.array(binc.astype(np.int64)),
            }
        )

    df_table = (
        _partial_then_global(
            docs.map_batches(df_partial, batch_format="pyarrow"), ["token"], ["df"]
        )
        .to_pandas()
        .sort_values("token")
    )
    vocab = np.asarray(df_table["token"].to_numpy(), dtype=object)
    idf_ppm = (np.int64(n_docs) * 1_000_000) // df_table["df"].to_numpy().astype(
        np.int64
    )
    vocab_ref = ray.put((vocab, idf_ppm))

    def score_batch(batch: pa.Table) -> pa.Table:
        v, idf = ray.get(vocab_ref)
        parent, toks, _n = _flat_tokens(batch["text"])
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if not len(toks):
            return _TFIDF_SCHEMA.empty_table()
        tcodes, tuniq = pd.factorize(toks)
        comp, tf = np.unique(
            parent * np.int64(len(tuniq)) + tcodes, return_counts=True
        )
        doc_idx = comp // len(tuniq)
        term = np.asarray(tuniq, dtype=object)[comp % len(tuniq)]
        score = tf.astype(np.int64) * idf[np.searchsorted(v, term)]
        df = pd.DataFrame(
            {
                "doc_id": ids[doc_idx],
                "term": term,
                "tf": tf.astype(np.int64),
                "score": score,
            }
        ).sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True]
        )
        g = df.groupby("doc_id", sort=False)
        df = df.assign(rank=(g.cumcount() + 1).astype(np.int64))
        return pa.Table.from_pandas(df[df["rank"] <= k], preserve_index=False)

    return ensure_schema(
        docs.map_batches(score_batch, batch_format="pyarrow"), _TFIDF_SCHEMA
    )


_TFIDF_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("term", pa.string()),
        ("tf", pa.int64()),
        ("score", pa.int64()),
        ("rank", pa.int64()),
    ]
)


LENGTH_HIST_BIN = 200


def lang_confusion(sf_dir: str):
    """Language-ID confusion matrix: (lang_true, lang_pred, n) — the
    labeled ``lang`` column against the n-gram heuristic's prediction.
    The eval every classifier stage ships with; cardinality is
    langs x langs, so the exchange is partial-combined count rows."""
    from ray.data.aggregate import Count

    from .schema import ensure_schema

    def prep(batch: pa.Table) -> pa.Table:
        pred = lang_id_batch(batch)["lang_pred"]
        return pa.table({"lang_true": batch["lang"], "lang_pred": pred})

    agg = (
        _read_docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["lang_true", "lang_pred"])
        .aggregate(Count())
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang_true": batch["lang_true"],
                "lang_pred": batch["lang_pred"],
                "n": pc.cast(batch["count()"], pa.int64()),
            }
        )

    return ensure_schema(
        agg.map_batches(rename, batch_format="pyarrow"),
        pa.schema(
            [
                ("lang_true", pa.string()),
                ("lang_pred", pa.string()),
                ("n", pa.int64()),
            ]
        ),
    )


def doc_length_histogram(sf_dir: str):
    """(bin, n) histogram of document character lengths in
    ``LENGTH_HIST_BIN``-char bins — reads ONLY the pre-computed ``n_chars``
    int column (column pruning: the text never leaves storage)."""
    from ray.data.aggregate import Count

    from .schema import ensure_schema

    def prep(batch: pa.Table) -> pa.Table:
        n_chars = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        # n_chars >= 0, so // is floor == trunc — oracle-safe
        return pa.table({"bin": pa.array(n_chars // LENGTH_HIST_BIN, pa.int64())})

    agg = (
        _read_docs(sf_dir, ["n_chars"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Count())
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bin": pc.cast(batch["bin"], pa.int64()),
                "n": pc.cast(batch["count()"], pa.int64()),
            }
        )

    return ensure_schema(
        agg.map_batches(rename, batch_format="pyarrow"),
        pa.schema([("bin", pa.int64()), ("n", pa.int64())]),
    )


BIGRAM_TOP_K = 10


def bigram_top(sf_dir: str, k: int = BIGRAM_TOP_K):
    """Global top-k adjacent-token bigrams by corpus frequency — the
    collocation head a pretraining pipeline inspects (and the 2-gram
    sibling of the 3-gram shingle kernel used by MinHash dedup).

    Scale shape: one RE2 tokenizer pass per batch; bigrams come from
    ``ngrams_from_tokens`` (n=2: two zero-copy slices of the flat token
    array, same-parent mask — shared with the MinHash shingle kernel);
    per-batch factorize/bincount partials, one partial+global groupby
    over (bigram, n) rows, then ``partial_topk`` — the exchange never
    moves bigram instances, only per-block distinct counts.
    """
    from .core import partial_then_global as _partial_then_global
    from .core import partial_topk as _partial_topk

    _schema = pa.schema([("bigram", pa.string()), ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        parent, flat, _n = _flat_tokens_arrow(batch["text"])
        _seg, pair = ngrams_from_tokens(parent, flat, 2)
        if not len(pair):
            return _schema.empty_table()
        codes, uniq = pd.factorize(pair.to_numpy(zero_copy_only=False))
        binc = np.bincount(codes)
        return pa.table(
            {
                "bigram": pa.array(np.asarray(uniq, dtype=object), pa.string()),
                "n": pa.array(binc.astype(np.int64)),
            }
        )

    counts = _partial_then_global(
        _read_docs(sf_dir, ["text"]).map_batches(partial, batch_format="pyarrow"),
        ["bigram"],
        ["n"],
    )

    # the top-k RESULT is k rows by definition: materialize it as a TYPED
    # pyarrow.Table (a fully-empty Ray Dataset loses its schema in
    # to_pandas/take_all, so a bigram-less corpus would otherwise yield a
    # column-less frame; pa.Table keeps the schema even at 0 rows)
    out_schema = pa.schema(
        [("bigram", pa.string()), ("n", pa.int64()), ("rank", pa.int64())]
    )
    rows = _partial_topk(
        counts, ["n", "bigram"], [False, True], k, rank_col="rank"
    ).take_all()
    return pa.Table.from_pylist(rows, schema=out_schema)


def source_token_jaccard(sf_dir: str):
    """Pairwise Jaccard similarity between the distinct-token vocabularies
    of every two sources — the source-level set-similarity join a corpus
    curator uses to spot mirrored / scraped-twice domains.

    Scale shape: ONE exchange total.  Per-batch distinct (source, token)
    pairs are hash-bucketed by token (crc32(token) % 64) and shuffled
    once; every copy of a (source, token) pair lands in the same bucket,
    so the bucket kernel global-dedups for free, emits the bucket's slice
    of per-source vocabulary sizes (tagged rows sharing the pair schema),
    and generates one (src_a, src_b) row per co-occurring source pair
    (src_a < src_b) — the classic inverted-index similarity join, so
    fan-out per token is |sources containing it| choose 2, never
    all-pairs over the corpus.  The kernel is vectorized across every
    token in the bucket: one lexsort, segment boundaries via np.unique,
    one triu-template broadcast per distinct SEGMENT SIZE (bounded by
    source cardinality, never token count).  Output is bounded by
    source-pair count, so it is materialized as a TYPED pyarrow.Table
    (a fully-empty Ray Dataset loses its schema in to_pandas/take_all).
    Partitioning assumption: the number of co-occurring sources per token
    is modest (true for domain-level grouping; salt hot tokens if a token
    spans millions of sources).

    ``jaccard_ppm`` is exact integer: ``inter * 1_000_000 // union``
    (non-negative, so floor == trunc — oracle-safe).
    """
    import pandas as pd

    from .core import partial_then_global as _partial_then_global

    _pair_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("source", pa.string()),
            ("token", pa.string()),
        ]
    )

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        import zlib

        parent, toks, _n = _flat_tokens(batch["text"])
        if not len(toks):
            return _pair_schema.empty_table()
        src = np.asarray(
            batch["source"].to_numpy(zero_copy_only=False), dtype=object
        )[parent]
        df = pd.DataFrame({"source": src, "token": toks}).drop_duplicates()
        bucket = np.fromiter(
            (zlib.crc32(t.encode()) % 64 for t in df["token"].to_numpy()),
            dtype=np.int64,
            count=len(df),
        )
        df.insert(0, "bucket", bucket)
        return pa.Table.from_pandas(df, preserve_index=False).cast(_pair_schema)

    # sentinel tag for the per-source vocabulary-size rows that ride the
    # same (src_a, src_b, inter) schema as the pair rows ("\x00" cannot
    # collide with a real source name)
    _SIZE_TAG = "\x00size"

    _EMPTY_PAIRS = pd.DataFrame(
        {
            "src_a": pd.array([], dtype="string"),
            "src_b": pd.array([], dtype="string"),
            "inter": pd.array([], dtype="int64"),
        }
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # every copy of a (source, token) pair is in THIS bucket: dedup
        # here is global dedup
        g = g.drop_duplicates(["source", "token"])
        tok = g["token"].to_numpy()
        src = g["source"].to_numpy()
        # this bucket's slice of the per-source vocabulary sizes
        size_counts = pd.Series(src).value_counts()
        sizes_df = pd.DataFrame(
            {
                "src_a": np.full(len(size_counts), _SIZE_TAG, dtype=object),
                "src_b": size_counts.index.to_numpy(dtype=object),
                "inter": size_counts.to_numpy(dtype=np.int64),
            }
        )
        order = np.lexsort((src, tok))
        tok, src = tok[order], src[order]
        _, starts, counts = np.unique(tok, return_index=True, return_counts=True)
        out_a, out_b = [], []
        for s in np.unique(counts):
            if s < 2:
                continue
            ia, ib = np.triu_indices(int(s), 1)
            st = starts[counts == s]
            out_a.append(src[(st[:, None] + ia[None, :]).ravel()])
            out_b.append(src[(st[:, None] + ib[None, :]).ravel()])
        if not out_a:
            return sizes_df if len(sizes_df) else _EMPTY_PAIRS
        a = np.concatenate(out_a)
        bb = np.concatenate(out_b)
        df = pd.DataFrame({"src_a": a, "src_b": bb})
        # in-bucket partial combine: one row per distinct pair per bucket
        pairs_df = (
            df.groupby(["src_a", "src_b"], sort=False)
            .size()
            .rename("inter")
            .reset_index()
        )
        return pd.concat([sizes_df, pairs_df], ignore_index=True)

    inter = _partial_then_global(
        _read_docs(sf_dir, ["source", "text"])
        .map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas"),
        ["src_a", "src_b"],
        ["inter"],
    )

    rows = inter.take_all()
    sizes = {
        r["src_b"]: r["inter"] for r in rows if r["src_a"] == _SIZE_TAG
    }
    out_schema = pa.schema(
        [
            ("src_a", pa.string()),
            ("src_b", pa.string()),
            ("inter", pa.int64()),
            ("uni", pa.int64()),
            ("jaccard_ppm", pa.int64()),
        ]
    )
    out = []
    for r in rows:
        if r["src_a"] == _SIZE_TAG:
            continue
        it = r["inter"]
        uni = sizes[r["src_a"]] + sizes[r["src_b"]] - it
        out.append(
            {
                "src_a": r["src_a"],
                "src_b": r["src_b"],
                "inter": it,
                "uni": uni,
                "jaccard_ppm": it * 1_000_000 // uni,
            }
        )
    return pa.Table.from_pylist(out, schema=out_schema)


NTILE_TILES = 4
NTILE_CHARS_BUCKET = 64  # coarse ranking-bucket width (chars)


def ntile_by_chars(sf_dir: str, tiles: int = NTILE_TILES):
    """Exact global rank and ntile bucket of every document ordered by
    (n_chars, doc_id) — SQL's ``row_number()`` / ``ntile(k)`` window over
    the whole corpus, WITHOUT a global row sort.

    Scale shape: the ``bucket_rank_offsets`` offset stitch — the ranking
    pass groups by ``n_chars // NTILE_CHARS_BUCKET`` (coarse floor
    buckets) and the only thing the driver materializes is one (bucket,
    count) row per nonempty ranking partition; prefix-summed exclusive
    starts ride the task closure.  Each bucket kernel lexsorts its own
    docs by (n_chars, doc_id) and adds its start — exact global
    row_number with no per-value state anywhere.  Partitioning
    assumption: no single bucket dominates the corpus (shrink
    NTILE_CHARS_BUCKET if one does).

    Tile assignment matches SQL NTILE exactly: with n rows and k tiles,
    the first n % k tiles take ceil(n/k) rows.  Reads ONLY the
    pre-computed ``n_chars`` column.
    """
    import pandas as pd

    from .core import bucket_rank_offsets as _bucket_rank_offsets
    from .core import partial_then_global as _partial_then_global
    from .schema import ensure_schema

    def bucket_counts(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        import pandas as _pd

        codes, uniq = _pd.factorize(v // NTILE_CHARS_BUCKET)
        return pa.table(
            {
                "bucket": pa.array(uniq.astype(np.int64)),
                "cnt": pa.array(np.bincount(codes).astype(np.int64)),
            }
        )

    # histogram pass scans ONLY n_chars; the ranking pass re-reads with
    # doc_id (two pruned scans beat dragging doc_id through the first)
    offsets, totals = _bucket_rank_offsets(
        _partial_then_global(
            _read_docs(sf_dir, ["n_chars"]).map_batches(
                bucket_counts, batch_format="pyarrow"
            ),
            ["bucket"],
            ["cnt"],
        ),
        [],
        "bucket",
    )
    n_total = totals.get((), 0)
    _out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_chars", pa.int64()),
            ("rank", pa.int64()),
            ("tile", pa.int64()),
        ]
    )
    if n_total == 0:
        # typed empty short-circuit (a fully-empty Ray Dataset loses its
        # schema in to_pandas/take_all; pa.Table keeps it)
        return _out_schema.empty_table()
    q, r = divmod(n_total, tiles)

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_chars": pa.array(v),
                "bucket": pa.array(v // NTILE_CHARS_BUCKET),
            }
        )

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        nc = g["n_chars"].to_numpy(dtype=np.int64)
        did = g["doc_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((did, nc))
        nc_s, did_s = nc[order], did[order]
        base = offsets[(int(g["bucket"].iloc[0]),)]
        rank = base + np.arange(1, len(g) + 1, dtype=np.int64)
        if q == 0:
            tile = rank
        else:
            head = (q + 1) * r
            tile = np.where(
                rank <= head,
                (rank - 1) // (q + 1) + 1,
                r + (rank - 1 - head) // q + 1,
            ).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": did_s,
                "n_chars": nc_s,
                "rank": rank,
                "tile": tile,
            }
        )

    return ensure_schema(
        _read_docs(sf_dir, ["doc_id", "n_chars"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank_group, batch_format="pandas"),
        _out_schema,
    )


def _token_counts(sf_dir: str):
    """Exact global (token, n) corpus frequency table as a Dataset — one
    row per DISTINCT token, never token instances: per-batch
    factorize/bincount partials over a text-only pruned scan, then one
    keyed groupby.  Shared pass 1 of ``oov_rate`` and
    ``vocab_freq_spectrum`` (the token-count convention lives here
    exactly once)."""
    from .core import partial_then_global as _partial_then_global

    _cnt_schema = pa.schema([("token", pa.string()), ("n", pa.int64())])

    def count_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        _parent, toks, _n = _flat_tokens(batch["text"])
        if not len(toks):
            return _cnt_schema.empty_table()
        codes, uniq = pd.factorize(toks)
        return pa.table(
            {
                "token": pa.array(np.asarray(uniq, dtype=object), pa.string()),
                "n": pa.array(np.bincount(codes).astype(np.int64)),
            }
        )

    return _partial_then_global(
        _read_docs(sf_dir, ["text"]).map_batches(
            count_partial, batch_format="pyarrow"
        ),
        ["token"],
        ["n"],
    )


OOV_VOCAB_TOP_N = 16


def oov_rate(sf_dir: str, vocab_top_n: int = OOV_VOCAB_TOP_N):
    """Per-document out-of-vocabulary rate against the corpus's own top-N
    token vocabulary — the tokenizer-coverage check a pretraining pipeline
    runs before committing to a vocab (docs full of OOV tokens are noise
    or wrong-language candidates).

    Two passes.  Pass 1 builds the vocabulary: per-batch token-count
    partials, one keyed groupby, then per-block partial top-N and a single
    tiny merge (ties broken n DESC, token ASC) — the full distinct-token
    table is never pulled to the driver.  Pass 2 is map-only: the N-row
    vocabulary rides the task closure and each batch counts membership
    with one Arrow ``is_in`` pass.  Docs with zero tokens emit no row
    (matching SQL's unnest-then-group contract).

    ``oov_ppm`` is exact integer: ``n_oov * 1_000_000 // n_tokens``.
    """
    from .core import partial_topk as _partial_topk
    from .schema import ensure_schema

    # vocab pass scans ONLY text; the scoring pass re-reads with doc_id
    counts = _token_counts(sf_dir)
    vocab_rows = _partial_topk(
        counts, ["n", "token"], [False, True], vocab_top_n
    ).take_all()
    _out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("n_oov", pa.int64()),
            ("oov_ppm", pa.int64()),
        ]
    )
    if not vocab_rows:
        # empty vocab <=> zero tokens anywhere <=> zero output rows; short-
        # circuit with a TYPED empty pa.Table (a fully-empty Ray Dataset
        # loses its schema in to_pandas/take_all)
        return _out_schema.empty_table()
    vocab = pa.array(sorted(r["token"] for r in vocab_rows), pa.string())
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        parent, toks_arr, _n = _flat_tokens_arrow(batch["text"])
        if not len(toks_arr):
            return _out_schema.empty_table()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        oov = pc.invert(pc.is_in(toks_arr, value_set=vocab)).to_numpy(
            zero_copy_only=False
        )
        n_rows = len(ids)
        n_tok = np.bincount(parent, minlength=n_rows).astype(np.int64)
        n_oov = np.bincount(parent, weights=oov, minlength=n_rows).astype(np.int64)
        has = n_tok > 0
        ppm = np.zeros(n_rows, dtype=np.int64)
        ppm[has] = n_oov[has] * np.int64(1_000_000) // n_tok[has]
        return pa.table(
            {
                "doc_id": pa.array(ids[has]),
                "n_tokens": pa.array(n_tok[has]),
                "n_oov": pa.array(n_oov[has]),
                "oov_ppm": pa.array(ppm[has]),
            }
        )

    return ensure_schema(
        docs.map_batches(score, batch_format="pyarrow"), _out_schema
    )


def vocab_freq_spectrum(sf_dir: str):
    """Frequency-of-frequencies of the corpus vocabulary: for each
    occurrence count, how many distinct tokens occur exactly that often —
    the Zipf spectrum a tokenizer-fit / Good-Turing smoothing step reads.

    Scale shape: the shared ``_token_counts`` pass (one row per distinct
    token, never token instances), then a second tiny groupby over the
    counts themselves.  The spectrum is distinct-frequency-bounded
    (~O(sqrt corpus tokens) by Zipf's law), so it is materialized as a
    TYPED pyarrow.Table — a fully-empty Ray Dataset loses its schema in
    to_pandas/take_all, same contract as its ranking siblings."""
    from ray.data.aggregate import Count

    spectrum = (
        _token_counts(sf_dir)
        .map_batches(
            lambda b: pa.table({"occurrences": pc.cast(b["n"], pa.int64())}),
            batch_format="pyarrow",
        )
        .groupby("occurrences")
        .aggregate(Count())
    )

    out_schema = pa.schema(
        [("occurrences", pa.int64()), ("n_tokens", pa.int64())]
    )
    rows = [
        {"occurrences": r["occurrences"], "n_tokens": r["count()"]}
        for r in spectrum.take_all()
    ]
    return pa.Table.from_pylist(rows, schema=out_schema)



# ---------------------------------------------------------------------------
# Sentence segmentation statistics
# ---------------------------------------------------------------------------

SENTENCE_SPLIT_RE = r"[.!?]+"
# explicit trim set shared with the DuckDB oracle: Arrow's
# utf8_trim_whitespace and DuckDB's bare trim() disagree on the charset
# (Unicode whitespace vs ' ' only), so both sides trim exactly these
_SENT_TRIM_CHARS = " \t\n\r"


def doc_sentence_stats(sf_dir: str):
    """Per-document sentence statistics: number of non-blank sentences
    (split on terminal-punctuation runs) and the character length of the
    longest trimmed sentence — the sentence-level quality signals (run-on
    detection, segment-length caps) a pretraining cleaning pass reads.

    Map-only and fully vectorized: one RE2 ``split_pattern_regex`` pass
    per batch produces a flattened segment array with parent-row offsets;
    counts and maxima fall out of ``np.bincount`` / ``np.maximum.at`` over
    the parent indices — no Python loop over rows or segments.  Docs with
    zero sentences keep a row with zeros (SQL COALESCE contract)."""
    from .schema import ensure_schema

    _out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_sentences", pa.int64()),
            ("max_sentence_chars", pa.int64()),
        ]
    )

    def stats(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        segs = pc.split_pattern_regex(batch["text"], pattern=SENTENCE_SPLIT_RE)
        segs = segs.combine_chunks() if isinstance(segs, pa.ChunkedArray) else segs
        lens = segs.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
        flat = pc.utf8_trim(segs.flatten(), characters=_SENT_TRIM_CHARS)
        seg_chars = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        nonblank = seg_chars > 0
        n_sent = np.bincount(parent[nonblank], minlength=n_rows).astype(np.int64)
        max_chars = np.zeros(n_rows, dtype=np.int64)
        np.maximum.at(max_chars, parent[nonblank], seg_chars[nonblank])
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_sentences": pa.array(n_sent),
                "max_sentence_chars": pa.array(max_chars),
            }
        )

    return ensure_schema(
        _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
            stats, batch_format="pyarrow"
        ),
        _out_schema,
    )


# ---------------------------------------------------------------------------
# Pattern scrubbing: PII-style hit stats and denylist redaction
# ---------------------------------------------------------------------------

# named RE2 patterns (pyarrow and DuckDB both run RE2, so the two sides
# can share the literal pattern strings); the synthetic corpus contains
# no PII, so the planted-text pytest is the semantic gate and the SQL
# oracle pins the all-zero fixture behavior
PII_PATTERNS = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}
# denylist that genuinely hits the fixture corpus (the oracle's
# non-degenerate redaction check); one alternation = one RE2 pass
REDACT_TERMS_PATTERN = r"\b(customer|spark)\b"
REDACT_SENTINEL = "[REDACTED]"


def pattern_hit_stats(sf_dir: str, patterns: dict[str, str] | None = None):
    """Per-doc match counts for a set of named RE2 patterns — the scrub
    census a pipeline runs before deciding redaction policy.  One
    vectorized ``count_substring_regex`` pass per pattern per batch
    (patterns are compiled once per task by Arrow), map-only, zero
    shuffle."""
    pats = PII_PATTERNS if patterns is None else patterns

    def stats(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"], "")
        cols = {"doc_id": batch["doc_id"]}
        total = np.zeros(len(batch), dtype=np.int64)
        for name, pat in pats.items():
            n = pc.count_substring_regex(text, pat).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            cols[f"n_{name}"] = pa.array(n, pa.int64())
            total += n
        cols["n_total"] = pa.array(total, pa.int64())
        return pa.table(cols)

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


def pii_stats(sf_dir: str):
    return pattern_hit_stats(sf_dir, PII_PATTERNS)


def redact_pattern(
    sf_dir: str,
    pattern: str = REDACT_TERMS_PATTERN,
    sentinel: str = REDACT_SENTINEL,
):
    """Denylist / PII redaction: every match of one RE2 alternation is
    replaced by a fixed sentinel; emits (doc_id, n_hits, text_redacted).
    Map-only, zero shuffle; NULL text redacts to '' (the oracle's
    COALESCE)."""

    def redact(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"], "")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_hits": pc.cast(
                    pc.count_substring_regex(text, pattern), pa.int64()
                ),
                "text_redacted": pc.replace_substring_regex(
                    text, pattern, sentinel
                ),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        redact, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# LM-based quality scoring (CCNet-style perplexity filter, exact integers)
# ---------------------------------------------------------------------------

def _utf8_bytes_and_offsets(col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy view of a string column as (uint8 byte buffer slice,
    per-row int64 offsets RELATIVE to that slice).  NULLs are treated as
    empty strings (caller fills them first)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty(0, np.uint8), np.zeros(1, np.int64)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data[offs[0] : offs[-1]], offs - offs[0]


def _byte_pairs(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All within-doc adjacent byte pairs of a string column, encoded as
    one int32 code a*256+b per pair, plus the per-doc transition spans.

    Returns (codes, start, n_trans): ``codes`` is the flat pair-code array
    with CROSS-doc pairs already removed by construction of the offsets,
    ``start[i]``/``n_trans[i]`` delimit doc i's slice of ``codes``.
    """
    d, off = _utf8_bytes_and_offsets(col)
    n_docs = len(off) - 1
    if len(d) < 2:
        return (
            np.empty(0, np.int32),
            np.zeros(n_docs, np.int64),
            np.zeros(n_docs, np.int64),
        )
    pairs = d[:-1].astype(np.int32) * 256 + d[1:]
    # doc i's transitions live at global positions off[i] .. off[i+1]-2;
    # position off[i+1]-1 (its last byte) pairs with the NEXT doc's first
    # byte and must not count.  Compact those holes away so reduceat-style
    # spans stay contiguous.
    n_trans = np.maximum(off[1:] - off[:-1] - 1, 0)
    keep = np.ones(len(pairs), dtype=bool)
    ends = off[1:] - 1
    keep[ends[(ends >= 0) & (ends < len(pairs))]] = False
    codes = pairs[keep]
    start = np.concatenate([[0], np.cumsum(n_trans)[:-1]])
    return codes, start, n_trans


def lm_bigram_model(sf_dir: str) -> np.ndarray:
    """Train a corpus-wide byte-bigram transition model: one distributed
    counting pass (constant-size 65536-bin histogram partials, native Sum
    merge, the driver sees <= 65536 rows regardless of corpus size) folded
    into the integer transition-probability table
        p_ppm[a*256+b] = count(a,b) * 10^6 // count(a,*)
    computed with exact arbitrary-precision Python ints (count * 10^6 can
    pass int64 at 100 TB; there are only <= 65536 divisions)."""
    import ray.data as rd  # noqa: F401 — symmetry with siblings
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        codes, _s, _n = _byte_pairs(pc.fill_null(batch["text"], ""))
        if not len(codes):
            return pa.table(
                {"bin": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        binc = np.bincount(codes, minlength=65536)
        nz = np.nonzero(binc)[0]
        return pa.table(
            {
                "bin": pa.array(nz.astype(np.int64)),
                "cnt": pa.array(binc[nz].astype(np.int64)),
            }
        )

    rows = (
        _read_docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("cnt"))
        .take_all()
    )
    big = [0] * 65536
    for r in rows:
        big[int(r["bin"])] = int(r["sum(cnt)"])
    prefix = [0] * 256
    for code, c in enumerate(big):
        prefix[code >> 8] += c
    p_ppm = np.zeros(65536, dtype=np.int64)
    for code, c in enumerate(big):
        if c:
            p_ppm[code] = c * 1_000_000 // prefix[code >> 8]
    return p_ppm


def lm_quality(sf_dir: str):
    """CCNet-style LM quality score per document, exact integer ppm: train
    the byte-bigram model on the corpus itself (``lm_bigram_model``), then
    score every doc by its MEAN transition probability
        lm_score_ppm = (sum over transitions of p_ppm[pair]) // n_trans.
    Low scores flag gibberish / boilerplate / wrong-charset docs exactly
    like a perplexity filter (monotone transform of it under this model),
    but every value is an integer so the DuckDB oracle hashes bit-for-bit.

    Scale shape: pass 1 is map-only with CONSTANT 65536-bin partials and a
    constant-size driver fold; pass 2 broadcasts the 512 KiB p_ppm table
    via one ``ray.put`` and is map-only — zero row shuffles end to end.
    Per-doc sums stay under int64 (n_trans * 10^6 < 2^63 for any doc under
    ~9e12 bytes).  Byte-level == char-level on ASCII corpora (what the
    oracle asserts); non-UTF-8-single-byte text still scores
    deterministically, just over UTF-8 bytes.  Docs with < 2 bytes have no
    transitions and are excluded (the oracle's generate_series is empty).
    """
    import ray

    p_ref = ray.put(lm_bigram_model(sf_dir))

    def score(batch: pa.Table) -> pa.Table:
        p_ppm = ray.get(p_ref)
        codes, start, n_trans = _byte_pairs(pc.fill_null(batch["text"], ""))
        csum = np.concatenate([[0], np.cumsum(p_ppm[codes])])
        doc_sum = csum[start + n_trans] - csum[start]
        keep = n_trans > 0
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()).filter(
                    pa.array(keep)
                ),
                "n_trans": pa.array(n_trans[keep], pa.int64()),
                "lm_score_ppm": pa.array(
                    doc_sum[keep] // n_trans[keep], pa.int64()
                ),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Fixed-size overlapping token-window chunking (RAG / context-window prep)
# ---------------------------------------------------------------------------

# window of CHUNK_TOKS tokens every CHUNK_STRIDE tokens (the 25%-overlap
# convention); mirrored as literals in the doc_chunks oracle SQL
CHUNK_TOKS = 64
CHUNK_STRIDE = 48


def chunk_batch(
    batch: pa.Table, chunk_toks: int = CHUNK_TOKS, stride: int = CHUNK_STRIDE
) -> pa.Table:
    """Overlapping token-window chunks for every doc in the batch:
    chunk i covers tokens [i*stride, min(i*stride + chunk_toks, n_toks)),
    one chunk per start < n_toks (zero-token docs yield nothing), plus
    the md5 of the space-joined chunk tokens (the downstream dedup /
    embedding key).

    Fully vectorized: one tokenizer pass, repeat/offset arithmetic for the
    flat take indices (tokens duplicate ~chunk/stride x across overlapping
    windows), ONE ``pc.binary_join`` for all chunk strings, one vectorized
    md5 pass (``hashing.md5_hex``)."""
    from .hashing import md5_hex

    parent, flat, n_rows = _flat_tokens_arrow(batch["text"])
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("chunk_idx", pa.int64()),
            ("start_tok", pa.int64()),
            ("n_toks", pa.int64()),
            ("chunk_hash", pa.string()),
        ]
    )
    ntok = np.bincount(parent, minlength=n_rows).astype(np.int64)
    n_chunks = -(-ntok // stride)  # ceil; 0 chunks for 0-token docs
    total = int(n_chunks.sum())
    if total == 0:
        return out_schema.empty_table()
    doc_start = np.concatenate([[0], np.cumsum(ntok)[:-1]])
    chunk0 = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    crow = np.repeat(np.arange(n_rows, dtype=np.int64), n_chunks)
    cidx = np.arange(total, dtype=np.int64) - np.repeat(chunk0, n_chunks)
    cstart = cidx * stride
    clen = np.minimum(chunk_toks, ntok[crow] - cstart)
    toff = np.concatenate([[0], np.cumsum(clen)])
    take = (
        np.arange(toff[-1], dtype=np.int64)
        - np.repeat(toff[:-1], clen)
        + np.repeat(doc_start[crow] + cstart, clen)
    )
    lists = pa.ListArray.from_arrays(
        pa.array(toff, pa.int32()), flat.take(pa.array(take))
    )
    return pa.table(
        {
            "doc_id": pc.take(pc.cast(batch["doc_id"], pa.int64()), pa.array(crow)),
            "chunk_idx": pa.array(cidx, pa.int64()),
            "start_tok": pa.array(cstart, pa.int64()),
            "n_toks": pa.array(clen, pa.int64()),
            "chunk_hash": pc.cast(md5_hex(pc.binary_join(lists, " ")), pa.string()),
        }
    )


def chunk_documents(sf_dir: str):
    """Context-window chunking of the corpus — map-only, zero shuffle; the
    only expansion is the bounded ~chunk/stride token duplication inside
    each batch (chunks never cross docs, docs never cross batches)."""
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        chunk_batch, batch_format="pyarrow"
    )


# CCNet bucket cut points (head/middle/tail thirds per language),
# engine-wide exact-rank convention; mirrored as literals in the oracle
LM_Q1_PPM = 333_334
LM_Q2_PPM = 666_667


def lm_bigram_models_by_lang(sf_dir: str) -> dict:
    """Per-LANGUAGE byte-bigram transition models (the CCNet convention —
    one KenLM per language; a global model would bias whole languages
    into the tail bucket).  Same constant-size machinery as
    ``lm_bigram_model``: partials are (lang, bin, cnt) rows bounded by
    lang-alphabet x 65536 regardless of corpus size, merged by native
    Sum; NULL-lang docs are excluded.  Returns {lang: int64[65536] p_ppm}.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["lang"]))
        langs = batch["lang"]
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        uniq = pc.unique(langs)
        out_g, out_b, out_c = [], [], []
        for lang in uniq.to_pylist():  # <= lang-alphabet iterations
            sel = batch.filter(pc.equal(langs, lang))
            codes, _s, _n = _byte_pairs(pc.fill_null(sel["text"], ""))
            if not len(codes):
                continue
            binc = np.bincount(codes, minlength=65536)
            nz = np.nonzero(binc)[0]
            out_g.append(np.full(len(nz), lang, dtype=object))
            out_b.append(nz.astype(np.int64))
            out_c.append(binc[nz].astype(np.int64))
        if not out_g:
            return pa.table(
                {
                    "g": pa.array([], pa.string()),
                    "bin": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "g": pa.array(np.concatenate(out_g), pa.string()),
                "bin": pa.array(np.concatenate(out_b)),
                "cnt": pa.array(np.concatenate(out_c)),
            }
        )

    rows = (
        _read_docs(sf_dir, ["text", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["g", "bin"])
        .aggregate(Sum("cnt"))
        .take_all()
    )
    big: dict[str, list] = {}
    for r in rows:
        big.setdefault(r["g"], [0] * 65536)[int(r["bin"])] = int(r["sum(cnt)"])
    models = {}
    for lang, counts in big.items():
        prefix = [0] * 256
        for code, c in enumerate(counts):
            prefix[code >> 8] += c
        p = np.zeros(65536, dtype=np.int64)
        for code, c in enumerate(counts):
            if c:
                p[code] = c * 1_000_000 // prefix[code >> 8]
        models[lang] = p
    return models


def lm_ppl_buckets(sf_dir: str):
    """The full CCNet curation split: every doc bucketed head / middle /
    tail WITHIN ITS LANGUAGE by LM quality score under ITS LANGUAGE'S
    model (high mean transition probability == low perplexity == head),
    cut at the language's exact tercile boundaries — the value-boundary
    convention (ties share a bucket), not positional NTILE.

    Scale shape: one per-lang model pass (``lm_bigram_models_by_lang``,
    partials bounded by lang-alphabet x 65536), one scoring pass
    materialized as a ~24 B/doc (doc_id, lang, score) narrow table (the
    model dict ships once via ``ray.put``; the inner loop is over langs
    PRESENT IN THE BATCH, each scored vectorized), BOTH tercile
    boundaries of every language resolved in ONE shared
    ``grouped_quantile_multi`` narrowing over that table, and a map-only
    assignment against the broadcast per-lang cut pairs.  No row ever
    shuffles.  NULL-lang docs and docs with < 2 bytes (no transitions)
    are excluded (oracle mirrors both)."""
    import ray

    from .quantiles import grouped_quantile_multi

    p_ref = ray.put(lm_bigram_models_by_lang(sf_dir))

    def score(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["lang"]))
        models = ray.get(p_ref)
        codes, start, n_trans = _byte_pairs(pc.fill_null(batch["text"], ""))
        langs_col = batch["lang"]
        if isinstance(langs_col, pa.ChunkedArray):
            langs_col = langs_col.combine_chunks()
        doc_sum = np.zeros(len(n_trans), dtype=np.int64)
        for lang in pc.unique(langs_col).to_pylist():
            p_ppm = models.get(lang)
            if p_ppm is None:  # pragma: no cover — model pass saw every lang
                continue
            csum = np.concatenate([[0], np.cumsum(p_ppm[codes])])
            m = np.asarray(
                pc.equal(langs_col, lang).to_numpy(zero_copy_only=False)
            )
            doc_sum[m] = (csum[start + n_trans] - csum[start])[m]
        keep = n_trans > 0
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()).filter(
                    pa.array(keep)
                ),
                "g": langs_col.filter(pa.array(keep)),
                "v": pa.array(doc_sum[keep] // n_trans[keep], pa.int64()),
            }
        )

    scored = (
        _read_docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(score, batch_format="pyarrow")
        .materialize()
    )
    by_label, _ = grouped_quantile_multi(
        lambda: scored,
        {
            "b1": lambda n: (LM_Q1_PPM * n + 999_999) // 1_000_000,
            "b2": lambda n: (LM_Q2_PPM * n + 999_999) // 1_000_000,
        },
    )
    b1, b2 = by_label["b1"], by_label["b2"]
    langs = sorted(b1)
    lang_arr = pa.array(langs, pa.string())
    b1_arr = np.array([b1[g] for g in langs], dtype=np.int64)
    b2_arr = np.array([b2[g] for g in langs], dtype=np.int64)
    buckets = np.array(["tail", "middle", "head"], dtype=object)

    def assign(batch: pa.Table) -> pa.Table:
        gi = np.asarray(
            pc.fill_null(
                pc.index_in(batch["g"], value_set=lang_arr), 0
            ).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        v = batch["v"].to_numpy(zero_copy_only=False)
        tier = (v > b1_arr[gi]).astype(np.int64) + (v > b2_arr[gi])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["g"],
                "lm_score_ppm": batch["v"],
                "bucket": pa.array(buckets[tier], pa.string()),
            }
        )

    return scored.map_batches(assign, batch_format="pyarrow")


# hashing-trick feature space size; mirrored as a literal in the oracle
FEATURE_HASH_DIM = 1024


def hashed_features(sf_dir: str, dim: int = FEATURE_HASH_DIM):
    """Hashing-trick bag-of-words featurization (Weinberger et al.): every
    token lands in bucket ``md5-u60(token) % dim`` and the doc's sparse
    feature vector is the per-bucket count — the classic fixed-width
    vectorizer a downstream classifier/quality model trains on, emitted
    as (doc_id, feat_idx, cnt) sparse rows.

    Map-only, zero shuffle (docs never cross batches): one vectorized
    tokenize, ONE md5 pass (``hashing.str_hash_u60``, the engine-wide
    string-key convention), and one np.unique over packed
    (row, bucket) codes per batch."""
    from .hashing import str_hash_u60

    def featurize(batch: pa.Table) -> pa.Table:
        parent, flat, _n = _flat_tokens_arrow(batch["text"])
        ids = pc.cast(batch["doc_id"], pa.int64())
        if not len(parent):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "feat_idx": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        bucket = str_hash_u60(flat) % dim
        comp = parent * np.int64(dim) + bucket
        uniq, cnt = np.unique(comp, return_counts=True)
        return pa.table(
            {
                "doc_id": pc.take(ids, pa.array(uniq // dim)),
                "feat_idx": pa.array(uniq % dim, pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        featurize, batch_format="pyarrow"
    )
