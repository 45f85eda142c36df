"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline operators (language ID, quality scoring,
token counting, fingerprinting).  Each has a matching DuckDB oracle in
``__ray_entry__.py``; to keep the value-hash comparison exact, every derived
ratio is an integer (ppm = parts-per-million, floor division) and every hash
is md5 hex — identical in Python and DuckDB.

All stages are stateless ``map_batches`` transforms; the per-doc token loop
runs over ~25-token synthetic docs and is dominated by the Arrow read.  The
tokenizer regex is compiled once per actor via the callable-class pattern
when used in the hot pipeline.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

TOKEN_RE = r"[a-z0-9]+"
_token = re.compile(TOKEN_RE)

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


def token_stats_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    n_tok = np.empty(len(texts), dtype=np.int64)
    n_uniq = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = _tokens(t or "")
        n_tok[i] = len(toks)
        n_uniq[i] = len(set(toks))
    return pa.table(
        {"doc_id": pa.array(ids), "n_tokens": pa.array(n_tok), "n_uniq_tokens": pa.array(n_uniq)}
    )


def token_stats(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        token_stats_batch, batch_format="pyarrow"
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Marker-token language ID: argmax of per-language marker counts with
    first-listed-language precedence on ties; 'und' when all counts are 0."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    preds = []
    for t in texts:
        toks = _tokens(t or "")
        best_lang, best_n = "und", 0
        for lang, markers in LANG_MARKERS:
            n = sum(1 for w in toks if w in markers)
            if n > best_n:
                best_lang, best_n = lang, n
        preds.append(best_lang)
    return pa.table({"doc_id": pa.array(ids), "lang_pred": pa.array(preds, pa.string())})


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
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    stops = set(STOPWORDS)
    n_tok = np.empty(len(texts), dtype=np.int64)
    stop_ppm = np.empty(len(texts), dtype=np.int64)
    alpha_ppm = np.empty(len(texts), dtype=np.int64)
    qual_ppm = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        toks = _tokens(t)
        nt = len(toks)
        ns = sum(1 for w in toks if w in stops)
        low = t.lower()
        na = sum(1 for ch in low if "a" <= ch <= "z")
        nc = len(t)
        n_tok[i] = nt
        stop_ppm[i] = (ns * 1_000_000) // nt if nt else 0
        alpha_ppm[i] = (na * 1_000_000) // nc if nc else 0
        len_ppm = min(nt * 10_000, 1_000_000)
        qual_ppm[i] = (4 * len_ppm + 3 * stop_ppm[i] + 3 * alpha_ppm[i]) // 10
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(n_tok),
            "stop_ppm": pa.array(stop_ppm),
            "alpha_ppm": pa.array(alpha_ppm),
            "quality_ppm": pa.array(qual_ppm),
        }
    )


def quality(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pyarrow"
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint: min md5 over word 3-gram shingles (docs with
    <3 tokens fall back to md5 of the space-joined token list).  The min-hash
    of shingles is the SURVEY 'document fingerprinting (rolling hash)'
    operator in a form DuckDB can mirror exactly."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    fps, n_shingles = [], np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = _tokens(t or "")
        if len(toks) < 3:
            n_shingles[i] = 0
            fps.append(hashlib.md5(" ".join(toks).encode()).hexdigest())
            continue
        hs = [
            hashlib.md5(" ".join(toks[j : j + 3]).encode()).hexdigest()
            for j in range(len(toks) - 2)
        ]
        n_shingles[i] = len(hs)
        fps.append(min(hs))
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "n_shingles": pa.array(n_shingles),
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
