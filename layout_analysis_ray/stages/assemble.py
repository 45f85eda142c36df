"""Per-document block formation, ordering and emission (stateless stage).

Analogue of the reference chain ``label_clustering -> get_coordinates ->
paragraphs_postprocessing`` plus the separator-based reading order
(``/root/reference/src/DocumentAnalyzer.py:111-115,77-103``,
``/root/reference/src/Postprocessing.py:30-57``,
``/root/reference/src/SeparatorHelperMethods.py:62-74``), generalized to spans:

- flow docs (html/text): 1-D connected components over the span sequence —
  consecutive CONTENT spans form a block, BOUNDARY/BOILER spans close it;
- pdf docs: bbox postprocess (shared ``conformance.postprocess_rects``) then
  XY-cut reading order (shared ``conformance.xycut_order``);
- poison docs emit a single 'error' span (quarantine instead of task failure,
  SURVEY.md §4 "retries").

Consumes the score columns added by ``SpanScorer``; emits doc-grain rows with
re-segmented, re-ordered output spans ``(kind, text, media_ref, offset)``.
The per-block work is a Python loop, but blocks per document are tiny (tens);
all string-heavy work happened vectorized in the scorer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import conformance as C
from ..sources.synth import DOCS_SCHEMA


def _flat_np(col, dtype=None) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    v = pc.list_flatten(col)
    out = np.asarray(v.to_numpy(zero_copy_only=False))
    return out if dtype is None else out.astype(dtype)


def _flat_list(col) -> list:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.list_flatten(col).to_pylist()


def _media_out_kind(is_image: bool) -> str:
    return C.OUT_IMAGE if is_image else C.OUT_FIGURE


def assemble_batch(batch: pa.Table, *, order_fn=None) -> pa.Table:
    """order_fn: ``rects -> permutation`` block-ordering strategy (defaults
    to the conformance XY-cut; see ``stages.strategies`` for the registry)."""
    if order_fn is None:
        order_fn = C.xycut_order
    kind_col = batch.column("span_kind")
    if isinstance(kind_col, pa.ChunkedArray):
        kind_col = kind_col.combine_chunks()
    lengths = np.asarray(
        pc.fill_null(pc.list_value_length(kind_col), 0).to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    doc_offs = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=doc_offs[1:])

    kind_arr = pc.list_flatten(kind_col)
    src_off = _flat_np(batch.column("span_offset"))

    label = _flat_np(batch.column("span_label"))
    heading = _flat_np(batch.column("span_heading"))
    tabular = _flat_np(batch.column("span_tabular"))
    err = _flat_np(batch.column("span_err"))
    visible = _flat_list(batch.column("span_visible"))
    bx0 = _flat_np(batch.column("span_x0"))
    by0 = _flat_np(batch.column("span_y0"))
    bx1 = _flat_np(batch.column("span_x1"))
    by1 = _flat_np(batch.column("span_y1"))

    n_docs = batch.num_rows
    is_media_kind = np.asarray(
        pc.is_in(kind_arr, value_set=pa.array(sorted(C.MEDIA_KINDS))).to_numpy(
            zero_copy_only=False
        )
    )
    is_pdf_kind = np.asarray(
        pc.equal(kind_arr, C.KIND_PDF_BLOCK).to_numpy(zero_copy_only=False)
    )
    is_image_kind = np.asarray(
        pc.equal(kind_arr, C.KIND_IMAGE).to_numpy(zero_copy_only=False)
    )
    # only the media SUBSET of kind/media_ref strings crosses into Python —
    # the full columns stay Arrow (bandwidth: media spans are a minority)
    midx = np.nonzero(is_media_kind)[0]
    media_arr = pc.list_flatten(
        batch.column("span_media").combine_chunks()
        if isinstance(batch.column("span_media"), pa.ChunkedArray)
        else batch.column("span_media")
    )
    media_refs = np.empty(len(is_media_kind), dtype=object)
    if midx.size:
        media_refs[midx] = media_arr.take(pa.array(midx)).to_pylist()

    # Columnar emission: accumulate flat span columns + per-doc lengths and
    # build the list<struct> column directly (no per-span dicts, no
    # from_pylist re-inspection) — this stage is ~45% of pipeline CPU.
    #
    # Hot-loop mechanics: (a) per-doc offset sortedness is checked batch-wide
    # once, so the common already-ordered doc iterates a plain ``range`` with
    # no per-doc argsort/arange allocation; (b) the per-span flag arrays are
    # converted to Python lists once per batch — list indexing in a tight
    # Python loop is several times faster than numpy scalar indexing.
    # doc d is pre-sorted iff every within-doc adjacent offset pair is
    # nondecreasing; position lo of each doc compares against the PREVIOUS
    # doc's last span, so it is forced True before the segment AND.
    # reduceat runs over NON-EMPTY doc starts only and the results scatter
    # back — clamping empty-doc starts into range instead would SPLIT the
    # preceding doc's segment and drop its last span from the reduction
    # (caught by the engine-vs-oracle property test: a trailing empty doc
    # made a malformed-pdf doc lose its error flag).
    nonempty = lengths > 0
    ne_starts = doc_offs[:-1][nonempty]
    doc_sorted = np.ones(n_docs, dtype=bool)
    if ne_starts.size:
        nondecreasing = np.ones(len(src_off), dtype=bool)
        nondecreasing[1:] = src_off[1:] >= src_off[:-1]
        nondecreasing[ne_starts] = True
        doc_sorted[nonempty] = np.logical_and.reduceat(nondecreasing, ne_starts)

    label_l = label.tolist()
    heading_l = heading.tolist()
    tabular_l = tabular.tolist()
    err_l = err.tolist()
    is_media_l = is_media_kind.tolist()
    is_image_l = is_image_kind.tolist()
    src_off_l = src_off.tolist()
    any_pdf_doc = np.zeros(n_docs, dtype=bool)
    if ne_starts.size:
        any_pdf_doc[nonempty] = np.logical_or.reduceat(is_pdf_kind, ne_starts)

    out_kind: list[str] = []
    out_text: list[str] = []
    out_media: list[str] = []
    doc_lens = np.empty(n_docs, dtype=np.int32)
    for d in range(n_docs):
        lo, hi = int(doc_offs[d]), int(doc_offs[d + 1])
        if doc_sorted[d]:
            idx = range(lo, hi)
        else:
            idx = (lo + np.argsort(src_off[lo:hi], kind="stable")).tolist()

        if any_pdf_doc[d]:
            pdf_idx = [i for i in idx if is_pdf_kind[i]]
            out = _assemble_pdf(
                idx, pdf_idx, is_image_l, media_refs, visible, src_off_l,
                err_l, tabular_l, bx0, by0, bx1, by1, is_media_l, order_fn,
            )
        else:
            out = _assemble_flow(
                idx, is_image_l, media_refs, visible, label_l, heading_l,
                tabular_l, is_media_l,
            )
        doc_lens[d] = len(out)
        for k, t, m in out:
            out_kind.append(k)
            out_text.append(t)
            out_media.append(m)

    list_offs = np.zeros(n_docs + 1, dtype=np.int32)
    np.cumsum(doc_lens, out=list_offs[1:])
    offset_vals = (
        np.arange(int(list_offs[-1]), dtype=np.int32) - list_offs[:-1].repeat(doc_lens)
    )
    struct = pa.StructArray.from_arrays(
        [
            pa.array(out_kind, pa.string()),
            pa.array(out_text, pa.string()),
            pa.array(out_media, pa.string()),
            pa.array(offset_vals, pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans_col = pa.ListArray.from_arrays(pa.array(list_offs, pa.int32()), struct)
    ids_col = batch.column("doc_id")
    if isinstance(ids_col, pa.ChunkedArray):
        ids_col = ids_col.combine_chunks()
    return pa.Table.from_arrays([ids_col, spans_col], schema=DOCS_SCHEMA)


def _assemble_flow(idx, is_image_kind, media_refs, visible, label, heading,
                   tabular, is_media_kind):
    blocks: list[tuple] = []
    cur: list[str] = []
    cur_tab = False

    def close():
        nonlocal cur, cur_tab
        if cur:
            blocks.append(
                (C.OUT_TABLE if cur_tab else C.OUT_PARAGRAPH, "\n".join(cur), "")
            )
        cur = []
        cur_tab = False

    # Media keep rule: nearest preceding non-media span must be CONTENT;
    # a media span with no preceding non-media span uses the nearest
    # following one.  One forward pass.
    kept_media: dict[int, bool] = {}
    last_non_media = None
    pending: list[int] = []
    for i in idx:
        if is_media_kind[i]:
            if last_non_media is not None:
                kept_media[i] = label[last_non_media] == C.LABEL_CONTENT
            else:
                pending.append(i)
        else:
            for m in pending:
                kept_media[m] = label[i] == C.LABEL_CONTENT
            pending = []
            last_non_media = i
    for m in pending:  # doc with only media spans
        kept_media[m] = False

    for i in idx:
        if is_media_kind[i]:
            close()
            if kept_media[i]:
                blocks.append((_media_out_kind(is_image_kind[i]), "", media_refs[i]))
            continue
        if label[i] == C.LABEL_CONTENT:
            if heading[i]:
                close()
                blocks.append((C.OUT_TITLE, visible[i], ""))
            else:
                cur.append(visible[i])
                cur_tab = cur_tab or bool(tabular[i])
        else:
            close()
    close()
    return blocks


def _assemble_pdf(idx, pdf_idx, is_image_kind, media_refs, visible, src_off,
                  err, tabular, bx0, by0, bx1, by1, is_media_kind, order_fn):
    for i in pdf_idx:  # pdf_idx follows offset order: first malformed wins
        if err[i]:
            return [(C.OUT_ERROR, C.poison_error_text(int(src_off[i])), "")]

    rects = [(bx0[i], by0[i], bx1[i], by1[i]) for i in pdf_idx]
    page_w = max((r[2] for r in rects), default=0.0)
    page_h = max((r[3] for r in rects), default=0.0)
    keep = C.postprocess_rects(rects)
    order = order_fn([rects[i] for i in keep])

    out = []
    for pos in order:
        i = pdf_idx[keep[pos]]
        rect = rects[keep[pos]]
        vis = visible[i]  # pre-collapsed by the scorer (vectorized)
        if (
            len(vis) < C.TITLE_MAX_LEN
            and rect[1] < C.TITLE_TOP_FRAC * page_h
            and (rect[2] - rect[0]) >= C.TITLE_MIN_WIDTH_FRAC * page_w
        ):
            kind = C.OUT_TITLE
        elif tabular[i]:
            kind = C.OUT_TABLE
        else:
            kind = C.OUT_PARAGRAPH
        out.append((kind, vis, ""))

    if out:
        for i in idx:
            if is_media_kind[i]:
                out.append((_media_out_kind(is_image_kind[i]), "", media_refs[i]))
    return out
