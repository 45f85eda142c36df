"""Deterministic synthetic interleaved-document generator.

Produces the BASELINE.json ``input_hint`` table shape::

    doc_id: string
    spans:  list<struct<kind: string, text: string, media_ref: string, offset: int32>>

Two entry points:

- :func:`gen_table` — pure pyarrow table from (n_docs, seed); used by pytest.
- :func:`docs_from_parquet` — a Ray ``map_batches`` stage that derives the
  interleaved table deterministically from a ``documents.parquet`` of the
  driver's testdata (doc_id:int64, text:string); the same doc_id always
  produces the same spans, independent of batching/parallelism.

Fixture families follow FIXTURES.md; each document's family is
``doc_idx % len(FAMILIES)`` and its content is drawn from
``np.random.default_rng([seed, doc_idx])`` so generation is reproducible and
embarrassingly parallel (no shared RNG state across docs).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

SEED = 42

FAMILIES = (
    "html_boiler",
    "pdf_blocks",
    "interleaved_media",
    "small_nested",
    "vertical_merge",
    "empty_edge",
    "poison",
    "text_flow",
)

_VOCAB = (
    "stream layout engine column span block arrow batch shuffle actor "
    "pipeline parquet schema offset merge filter window table index vector "
    "document region title figure content boiler nav footer page corpus "
    "partition manifest lineage replica quorum ledger branch segment token"
).split()

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOCS_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))]
)


def _sent(rng: np.random.Generator, words: list[str], lo: int, hi: int) -> str:
    n = int(rng.integers(lo, hi + 1))
    idx = rng.integers(0, len(words), size=n)
    return " ".join(words[i] for i in idx)


def _pdf(x0, y0, x1, y1, text) -> str:
    return json.dumps(
        {"x0": float(x0), "y0": float(y0), "x1": float(x1), "y1": float(y1), "text": text}
    )


def _html_boiler(rng, words, doc_id):
    spans = []
    spans.append(
        '<div class="nav"><a href="/">%s</a> <a href="/a">%s</a> '
        '<a href="/b">%s</a></div>'
        % (words[0], words[1 % len(words)], words[2 % len(words)])
    )
    spans.append(f"<h1>{_sent(rng, words, 3, 6)}</h1>")
    n_par = int(rng.integers(2, 5))
    for i in range(n_par):
        spans.append(f"<p>{_sent(rng, words, 15, 30)}</p>")
        if i == 0 and rng.random() < 0.5:
            spans.append("<hr/>")
    if rng.random() < 0.5:
        spans.append(f'<div class="ad"><a href="#">{_sent(rng, words, 1, 3)}</a></div>')
    spans.append(
        '<div class="footer">Copyright 2024 <a href="/tos">Terms of Service</a></div>'
    )
    return [("html", s, "") for s in spans]


def _pdf_blocks(rng, words, doc_id):
    blocks = [ _pdf(200, 80, 1500, 160, _sent(rng, words, 3, 7)) ]
    for cx0, cx1 in ((100, 800), (900, 1600)):
        y = 250.0
        for _ in range(int(rng.integers(2, 5))):
            h = float(rng.integers(150, 300))
            if rng.random() < 0.2:
                txt = "%s | %s | %s\n%s | %s | %s" % tuple(
                    words[int(i)] for i in rng.integers(0, len(words), 6)
                )
            else:
                txt = _sent(rng, words, 10, 25)
            blocks.append(_pdf(cx0, y, cx1, y + h, txt))
            y += h + float(rng.integers(40, 80))
    order = rng.permutation(len(blocks))
    spans = [("pdf_block", blocks[i], "") for i in order]
    return spans


def _interleaved_media(rng, words, doc_id):
    spans = []
    if rng.random() < 0.5:
        spans.append(("image", "", f"media://{doc_id}/lead"))
    for k in range(int(rng.integers(2, 5))):
        spans.append(("text", _sent(rng, words, 20, 40), ""))
        spans.append(("image", "", f"media://{doc_id}/{k}"))
    # boilerplate footer followed by an image: that image must be dropped
    spans.append(("text", "Copyright 2024 all rights reserved", ""))
    spans.append(("figure_ref", "", f"media://{doc_id}/tail"))
    return spans


def _small_nested(rng, words, doc_id):
    blocks = [
        _pdf(100, 100, 1500, 400, _sent(rng, words, 15, 25)),       # big, survives
        _pdf(300, 150, 600, 300, _sent(rng, words, 5, 10)),          # nested -> drop
        _pdf(100, 500, 160, 900, _sent(rng, words, 2, 4)),           # thin -> drop
        _pdf(100, 1000, 1500, 1015, _sent(rng, words, 2, 4)),        # short -> drop
        _pdf(100, 1200, 1500, 1600, _sent(rng, words, 15, 25)),      # survives
    ]
    order = rng.permutation(len(blocks))
    return [("pdf_block", blocks[i], "") for i in order]


def _vertical_merge(rng, words, doc_id):
    # Vertically stacked, x-aligned blocks with small y-gaps: merge_blocks
    # (D2) fuses them; the flagship path (D1 only) keeps them separate.
    blocks = []
    y = 200.0
    for _ in range(int(rng.integers(3, 6))):
        h = float(rng.integers(120, 220))
        blocks.append(_pdf(300, y, 1300, y + h, _sent(rng, words, 10, 20)))
        y += h + float(rng.integers(20, 90))  # gap < 100 -> mergeable
    blocks.append(_pdf(300, y + 300, 1300, y + 500, _sent(rng, words, 10, 20)))
    return [("pdf_block", b, "") for b in blocks]


def _empty_edge(rng, words, doc_id, variant):
    if variant == 0:
        return []
    if variant == 1:
        return [
            ("html", '<div><a href="/">%s</a></div>' % words[0], ""),
            ("text", "subscribe to our newsletter", ""),
        ]
    return [("text", _sent(rng, words, 20, 30), "")]


def _poison(rng, words, doc_id):
    blocks = [
        ("pdf_block", _pdf(100, 100, 1500, 400, _sent(rng, words, 10, 20)), ""),
        ("pdf_block", '{"x0": 10, "oops": true', ""),  # malformed JSON
        ("pdf_block", _pdf(100, 500, 1500, 900, _sent(rng, words, 10, 20)), ""),
    ]
    return blocks


def _text_flow(rng, words, doc_id):
    spans = [("text", _sent(rng, words, 20, 40), "")]
    spans.append(("text", "-----", ""))
    spans.append(("text", _sent(rng, words, 20, 40), ""))
    if rng.random() < 0.5:
        spans.append(
            ("text", "%s | %s | %s\n%s | %s | %s" % tuple(
                words[int(i)] for i in rng.integers(0, len(words), 6)), "")
        )
    spans.append(("text", "Visit our privacy policy page", ""))
    spans.append(("text", _sent(rng, words, 20, 40), ""))
    return spans


def make_spans(doc_idx: int, doc_id: str, words: list[str], seed: int = SEED):
    """Deterministic spans for one document -> list of span dicts."""
    rng = np.random.default_rng([seed, doc_idx])
    fam = FAMILIES[doc_idx % len(FAMILIES)]
    if not words:
        words = list(_VOCAB)
    if fam == "html_boiler":
        triples = _html_boiler(rng, words, doc_id)
    elif fam == "pdf_blocks":
        triples = _pdf_blocks(rng, words, doc_id)
    elif fam == "interleaved_media":
        triples = _interleaved_media(rng, words, doc_id)
    elif fam == "small_nested":
        triples = _small_nested(rng, words, doc_id)
    elif fam == "vertical_merge":
        triples = _vertical_merge(rng, words, doc_id)
    elif fam == "empty_edge":
        triples = _empty_edge(rng, words, doc_id, (doc_idx // len(FAMILIES)) % 3)
    elif fam == "poison":
        triples = _poison(rng, words, doc_id)
    else:
        triples = _text_flow(rng, words, doc_id)
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(triples)
    ]


def gen_rows(n_docs: int, seed: int = SEED) -> list[dict]:
    return [
        {
            "doc_id": f"doc-{i:08d}",
            "spans": make_spans(i, f"doc-{i:08d}", list(_VOCAB), seed),
        }
        for i in range(n_docs)
    ]


def gen_table(n_docs: int, seed: int = SEED) -> pa.Table:
    rows = gen_rows(n_docs, seed)
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def spans_batch_from_documents(
    batch: pa.Table, seed: int = SEED, replicate: int = 1, n_base: int = 0
) -> pa.Table:
    """map_batches fn: (doc_id:int64, text) -> interleaved (doc_id, spans).

    ``replicate > 1`` deterministically expands each source doc into
    ``replicate`` distinct documents (fresh doc_ids, shifted family/rng
    index), used to scale the bench corpus (FIXTURES.md sizes) without
    external data."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    rows = []
    for i, txt in zip(ids, texts):
        words = (txt or "").split() or list(_VOCAB)
        for r in range(replicate):
            idx = int(i) + r * n_base
            doc_id = f"doc-{idx:08d}"
            rows.append(
                {"doc_id": doc_id, "spans": make_spans(idx, doc_id, words, seed)}
            )
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def docs_from_parquet(
    sf_dir: str,
    seed: int = SEED,
    replicate: int = 1,
    num_blocks: int | None = None,
):
    """Ray Dataset of interleaved docs derived from {sf_dir}/documents.parquet.

    Column-pruned read (doc_id, text only); derivation is a stateless
    per-batch transform, so it streams and scales with the read.
    ``num_blocks`` splits the (single-file) read so the pipeline can use all
    cores — Ray's default block split follows file count, which is 1 here.
    """
    from .io_lance import read_table

    n_base = 0
    if replicate > 1:
        import pyarrow.parquet as pq

        n_base = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=num_blocks,
    )
    return ds.map_batches(
        lambda b: spans_batch_from_documents(b, seed, replicate, n_base),
        batch_format="pyarrow",
        batch_size=256,
    )
