"""SpanScorer: the stateful scoring stage (actor pool).

Analogue of the reference's per-document U-Net inference
(``get_probability_mask``, ``/root/reference/src/DocumentAnalyzer.py:44-50``),
which pathologically re-opened a TF session and restored the checkpoint for
*every document*.  Here the "model" (regex kernels + thresholds from
``conformance.py``) is loaded once per actor in ``__init__`` and applied to
whole Arrow batches vectorized with ``pyarrow.compute`` — the headline
architectural win of the Ray Data design (SURVEY.md §4).

Input:  doc-grain batches ``(doc_id, spans)``.
Output: the same batch plus parallel per-span list columns:
``span_label`` (int8: 0 boiler / 1 content / 2 boundary), ``span_heading``,
``span_tabular``, ``span_err`` (bool), ``span_visible`` (string),
``span_x0/y0/x1/y1`` (float64, pdf blocks only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import conformance as C

_EMPTY = pa.scalar("", type=pa.string())


def _collapse(arr: pa.Array) -> pa.Array:
    out = pc.replace_substring_regex(arr, C.RE_WS, " ")
    return pc.utf8_trim(out, C.WS_CHARS)


def _np(arr) -> np.ndarray:
    return np.asarray(arr.to_numpy(zero_copy_only=False))


class SpanScorer:
    """Callable class for ``map_batches(..., concurrency=N)``.

    ``init_count`` is a per-process counter used by tests to prove
    once-per-actor initialization (SURVEY.md §7.2 step 4).

    ``model_weights``: optional path to an ``.npz`` with ``W`` (float64[3])
    and ``b`` (float64) — a logistic content scorer over the html span
    features ``[link_density, vis_len, text_density]`` that REPLACES the
    heuristic boiler rule for non-heading html spans.  This is the real-model
    swap point mirroring the reference's U-Net checkpoint restore
    (``/root/reference/src/UnetModel.py:38-54``): weights load once per
    actor in ``__init__`` and score whole batches vectorized; the heuristic
    kernel set stays the default (and the conformance-oracle-pinned path).
    """

    init_count = 0

    def __init__(self, model_weights: str | None = None) -> None:
        SpanScorer.init_count += 1
        # Once-per-actor "model load": python-side kernels for the small
        # non-vectorizable paths (pdf JSON parse, multi-line tabular test).
        self._parse_pdf = C.parse_pdf_block
        self._is_tabular = C.is_tabular_text
        self._model: tuple[np.ndarray, float] | None = None
        if model_weights is not None:
            w = np.load(model_weights)
            self._model = (w["W"].astype(np.float64).reshape(3), float(w["b"]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()

        lengths = _np(pc.fill_null(pc.list_value_length(spans), 0)).astype(np.int64)
        offs = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offs[1:])
        flat = pc.list_flatten(spans)
        n = len(flat)

        kind = flat.field("kind")
        raw = flat.field("text")

        is_html = _np(pc.equal(kind, C.KIND_HTML))
        is_text = _np(pc.equal(kind, C.KIND_TEXT))
        is_pdf = _np(pc.equal(kind, C.KIND_PDF_BLOCK))

        label = np.zeros(n, dtype=np.int8)  # default LABEL_BOILER
        head_out = np.zeros(n, dtype=bool)
        tab_out = np.zeros(n, dtype=bool)
        err = np.zeros(n, dtype=bool)
        x0 = np.zeros(n, dtype=np.float64)
        y0 = np.zeros(n, dtype=np.float64)
        x1 = np.zeros(n, dtype=np.float64)
        y1 = np.zeros(n, dtype=np.float64)

        # visible text, all spans; html/text subsets filled below
        vis_arr = pc.fill_null(pa.nulls(n, pa.string()), "")

        # --- html kernels on the html subset only (Arrow RE2) ------------
        # Running each regex over just its kind's spans (instead of the whole
        # batch) cuts scorer CPU ~40% on mixed corpora.
        ih = np.nonzero(is_html)[0]
        if ih.size:
            raw_h = raw.take(pa.array(ih))
            vis_h = _collapse(pc.replace_substring_regex(raw_h, C.RE_TAG, " "))
            no_anchor = pc.replace_substring_regex(raw_h, C.RE_ANCHOR, " ")
            vis_no_anchor = _collapse(
                pc.replace_substring_regex(no_anchor, C.RE_TAG, " ")
            )
            raw_len = _np(pc.utf8_length(raw_h)).astype(np.float64)
            vis_len = _np(pc.utf8_length(vis_h)).astype(np.float64)
            link_len = np.maximum(
                0.0, vis_len - _np(pc.utf8_length(vis_no_anchor)).astype(np.float64)
            )
            heading = _np(pc.match_substring_regex(raw_h, C.RE_HEADING))
            hr = _np(pc.match_substring_regex(raw_h, C.RE_HR))
            table_tag = _np(pc.match_substring_regex(raw_h, C.RE_TABLE_TAG))

            # labels (conformance.label_html_span, vectorized)
            nonempty = vis_len > 0
            link_density = link_len / np.maximum(1.0, vis_len)
            text_density = vis_len / np.maximum(1.0, raw_len)
            if self._model is not None:
                # model branch: linear content score, boiler iff score < 0
                W, b0 = self._model
                feats = np.stack([link_density, vis_len, text_density], axis=1)
                html_boiler = feats @ W + b0 < 0.0
            else:
                html_boiler = (
                    (link_density > C.LINK_DENSITY_MAX)
                    | (vis_len < C.MIN_TEXT_LEN)
                    | (text_density < C.TEXT_DENSITY_MIN)
                )
            label[ih[~nonempty & hr]] = C.LABEL_BOUNDARY
            mh = nonempty & heading
            label[ih[mh]] = C.LABEL_CONTENT
            head_out[ih[mh]] = True
            label[ih[nonempty & ~heading & ~html_boiler]] = C.LABEL_CONTENT
            tab_out[ih[table_tag]] = True
            vis_arr = pc.replace_with_mask(vis_arr, pa.array(is_html), vis_h)

        # --- text kernels on the text subset only -------------------------
        it = np.nonzero(is_text)[0]
        if it.size:
            raw_t = raw.take(pa.array(it))
            vis_t = _collapse(raw_t)
            vis_len_t = _np(pc.utf8_length(vis_t)).astype(np.float64)
            rule = _np(pc.match_substring_regex(vis_t, C.RE_RULE))
            boiler_kw = _np(pc.match_substring_regex(raw_t, C.RE_BOILER))
            has_nl = _np(pc.match_substring(raw_t, "\n"))

            nonempty = vis_len_t > 0
            label[it[nonempty & rule]] = C.LABEL_BOUNDARY
            text_boiler = (vis_len_t < C.BOILER_TEXT_MAX_LEN) & boiler_kw
            label[it[nonempty & ~rule & ~text_boiler]] = C.LABEL_CONTENT
            vis_arr = pc.replace_with_mask(vis_arr, pa.array(is_text), vis_t)

            # multi-line plain-text spans: tabular test is per-line analysis
            cand = np.nonzero(has_nl)[0]
            if cand.size:
                texts = raw_t.take(pa.array(cand)).to_pylist()
                for i, t in zip(it[cand], texts):
                    tab_out[i] = self._is_tabular(t)

        # pdf blocks: JSON parse (python; per-span payloads are small).
        # Only the pdf SUBSET round-trips through Python — the full-batch
        # visible array stays Arrow (no to_pylist of n strings).
        pidx = np.nonzero(is_pdf)[0]
        if pidx.size:
            label[pidx] = C.LABEL_CONTENT
            payloads = raw.take(pa.array(pidx)).to_pylist()
            btexts = []
            for i, payload in zip(pidx, payloads):
                try:
                    bx0, by0, bx1, by1, btext = self._parse_pdf(payload)
                except ValueError:
                    err[i] = True
                    btexts.append("")
                    continue
                x0[i], y0[i], x1[i], y1[i] = bx0, by0, bx1, by1
                tab_out[i] = self._is_tabular(btext)
                btexts.append(btext)
            # pre-collapse pdf block text vectorized (Arrow RE2) so the
            # assembly stage never runs per-block Python regex
            vis_pdf = _collapse(pa.array(btexts, type=pa.string()))
            vis_arr = pc.replace_with_mask(vis_arr, pa.array(is_pdf), vis_pdf)

        po = pa.array(offs, type=pa.int32())

        def lst(values: pa.Array | np.ndarray, typ=None) -> pa.ListArray:
            if isinstance(values, np.ndarray):
                values = pa.array(values, type=typ)
            return pa.ListArray.from_arrays(po, values)

        # Slim output: the raw span text does NOT cross the stage boundary —
        # everything downstream needs is the visible text + flags.  This
        # roughly halves the scored-intermediate bytes through the object
        # store (the memory-bandwidth hot path at high parallelism).
        cols = {
            "doc_id": batch.column("doc_id"),
            "span_kind": lst(kind),
            "span_media": lst(flat.field("media_ref")),
            "span_offset": lst(flat.field("offset")),
            "span_label": lst(label, pa.int8()),
            "span_heading": lst(head_out, pa.bool_()),
            "span_tabular": lst(tab_out, pa.bool_()),
            "span_err": lst(err, pa.bool_()),
            "span_visible": lst(vis_arr),
            "span_x0": lst(x0, pa.float64()),
            "span_y0": lst(y0, pa.float64()),
            "span_x1": lst(x1, pa.float64()),
            "span_y1": lst(y1, pa.float64()),
        }
        # passthrough for any extra grouping columns (skew path: chunk_id...)
        for name in batch.column_names:
            if name not in ("doc_id", "spans"):
                cols[name] = batch.column(name)
        return pa.table(cols)
