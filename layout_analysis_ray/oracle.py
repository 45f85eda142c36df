"""Single-process oracle: the reference extraction semantics over one document.

This is the analogue of the reference's per-page chain
``load_img -> get_probability_mask -> get_segmentation_map -> label_clustering
-> get_coordinates -> paragraphs_postprocessing``
(``/root/reference/src/DocumentAnalyzer.py:31-42``) re-expressed over
interleaved span documents, written as plain per-document Python with no Ray,
no Arrow and no vectorization.  The Ray Data engine
(``layout_analysis_ray.pipelines.extract``) must produce *exactly* this output
for every document (span-sequence equality on (kind, text, media_ref, offset));
``tests/test_extraction.py`` enforces it.

Scoring scalar functions and the quirky block algorithms live in
``conformance.py`` (shared, frozen); the document assembly flow here is an
independent straightforward implementation.
"""

from __future__ import annotations

from . import conformance as C


def _label_span(kind: str, text: str) -> tuple[int, bool, bool, str]:
    """-> (label, heading_hint, tabular_hint, visible_text) for non-media spans."""
    if kind == C.KIND_HTML:
        label, heading, visible = C.label_html_span(text)
        return label, heading, C.has_table_tag(text), visible
    if kind == C.KIND_TEXT:
        label, heading, visible = C.label_text_span(text)
        return label, heading, C.is_tabular_text(text), visible
    raise AssertionError(f"unexpected kind {kind}")


def _media_out_kind(kind: str) -> str:
    return C.OUT_IMAGE if kind == C.KIND_IMAGE else C.OUT_FIGURE


def _extract_flow(spans: list[dict]) -> list[tuple]:
    """Flow path (html/text docs): 1-D block formation.

    Consecutive CONTENT spans form a block (the 1-D connected-components
    analogue of ``label_clustering``, /root/reference/src/DocumentAnalyzer.py:111-115);
    BOUNDARY and BOILER spans close the current block (class-2 suppression +
    background, ``:63,113``); heading spans form their own single-span block.
    Media spans close the current block and, when kept (nearest preceding
    non-media span is CONTENT; if none precedes, nearest following non-media
    span is CONTENT), emit in place as their own block.
    """
    ordered = sorted(spans, key=lambda s: s["offset"])
    non_media = [s for s in ordered if s["kind"] not in C.MEDIA_KINDS]
    labels: dict[int, tuple] = {}
    for s in non_media:
        labels[s["offset"]] = _label_span(s["kind"], s["text"])

    def media_kept(offset: int) -> bool:
        prev = [s for s in non_media if s["offset"] < offset]
        if prev:
            return labels[prev[-1]["offset"]][0] == C.LABEL_CONTENT
        nxt = [s for s in non_media if s["offset"] > offset]
        if nxt:
            return labels[nxt[0]["offset"]][0] == C.LABEL_CONTENT
        return False

    blocks: list[tuple] = []  # (block_kind, text, media_ref)
    cur_texts: list[str] = []
    cur_tabular = False

    def close() -> None:
        nonlocal cur_texts, cur_tabular
        if cur_texts:
            kind = C.OUT_TABLE if cur_tabular else C.OUT_PARAGRAPH
            blocks.append((kind, "\n".join(cur_texts), ""))
        cur_texts = []
        cur_tabular = False

    for s in ordered:
        if s["kind"] in C.MEDIA_KINDS:
            close()
            if media_kept(s["offset"]):
                blocks.append((_media_out_kind(s["kind"]), "", s["media_ref"]))
            continue
        label, heading, tabular, visible = labels[s["offset"]]
        if label == C.LABEL_CONTENT:
            if heading:
                close()
                blocks.append((C.OUT_TITLE, visible, ""))
            else:
                cur_texts.append(visible)
                cur_tabular = cur_tabular or tabular
        else:  # BOUNDARY or BOILER
            close()
    close()

    return [(k, t, m, i) for i, (k, t, m) in enumerate(blocks)]


def _extract_pdf(spans: list[dict]) -> list[tuple]:
    """PDF path: parse blocks -> postprocess (D1) -> XY-cut order -> classify.

    Non-pdf_block text/html spans in a pdf doc are dropped.  Media spans are
    kept iff at least one block survives postprocessing, and emit after all
    ordered blocks in source-offset order.  Any malformed pdf_block poisons
    the whole document into a single 'error' span.
    """
    ordered = sorted(spans, key=lambda s: s["offset"])
    pdf_spans = [s for s in ordered if s["kind"] == C.KIND_PDF_BLOCK]
    parsed = []
    for s in pdf_spans:
        try:
            x0, y0, x1, y1, text = C.parse_pdf_block(s["text"])
        except ValueError:
            return [(C.OUT_ERROR, C.poison_error_text(s["offset"]), "", 0)]
        parsed.append(((x0, y0, x1, y1), text))

    rects = [p[0] for p in parsed]
    page_w = max((r[2] for r in rects), default=0.0)
    page_h = max((r[3] for r in rects), default=0.0)

    keep = C.postprocess_rects(rects)
    order = C.xycut_order([rects[i] for i in keep])

    out: list[tuple] = []
    for pos in order:
        i = keep[pos]
        rect, text = parsed[i]
        kind = C.classify_pdf_block(rect, text, page_w, page_h)
        out.append((kind, C.collapse_ws(text), ""))

    if out:
        for s in ordered:
            if s["kind"] in C.MEDIA_KINDS:
                out.append((_media_out_kind(s["kind"]), "", s["media_ref"]))

    return [(k, t, m, i) for i, (k, t, m) in enumerate(out)]


def extract_doc(spans: list[dict]) -> list[tuple]:
    """Extract one document -> ordered [(kind, text, media_ref, offset)].

    ``spans`` is a list of dicts with keys kind/text/media_ref/offset.
    A doc is a pdf doc iff it contains any ``pdf_block`` span.
    """
    spans = [s for s in (spans or []) if s is not None]
    if any(s["kind"] == C.KIND_PDF_BLOCK for s in spans):
        return _extract_pdf(spans)
    return _extract_flow(spans)


def extract_table(rows: list[dict]) -> dict[str, list[tuple]]:
    """Oracle over a list of {doc_id, spans} rows -> {doc_id: span list}."""
    return {r["doc_id"]: extract_doc(r["spans"]) for r in rows}
