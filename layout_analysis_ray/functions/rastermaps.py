"""Raster map kernels + raster best-dice evaluation — closes the last
implementable SURVEY §2 rows: M9 (`get_img_coords` debug overlay), G10
(`get_separator_img`), G12 (`get_maps` polygon rasterization) and M10
(`get_baseline_median`, implemented as the WORKING stat the reference's
dead code intended).

Reference analogues (behavior derived, no code copied):

- ``overlay_rects`` — M9 ``get_img_coords``
  (``/root/reference/src/HelperMethods.py:21-32``; a second copy with
  width 15 at ``src/evaluate_results.py:34-45``): copy the image, draw
  each rect as a CLOSED polyline of width 4 into a label plane, then
  paint every labeled pixel into the copy.  The reference paints RGB
  green; planes here are single-channel RAW8, so the marker is a pixel
  VALUE (255 by default) — documented deviation.  The reference's
  per-pixel double ``for`` loop is a boolean mask store here.
- ``separator_img`` — G10 ``get_separator_img``
  (``src/SeparatorHelperMethods.py:55-59``) exactly:
  ``img[:, separator] = value`` per separator column.
- ``get_maps`` / ``polygon_mask`` — G12 ``get_maps``
  (``src/HelperMethods.py:95-113``): rasterize each polygon to a binary
  {0,1} map on a (height, width) canvas.  The reference feeds in-memory
  ``(y, x)`` tuples to ``PIL.ImageDraw.polygon`` which interprets them
  as ``(x, y)`` — every polygon is drawn TRANSPOSED and clipped to the
  canvas (a real quirk: on non-square pages pixels beyond the swapped
  axis are lost).  ``swap_axes=True`` (the default) reproduces that
  contract; both dice sides rasterize identically either way, which is
  the invariant G11 relies on.  PIL is not installed in this sandbox,
  so the fill kernel is an even-odd scanline + 1-px outline in numpy —
  PIL's exact edge rule can differ by <=1 px on slanted edges
  (documented deviation; irrelevant for the rectangular regions the
  engine emits).
- ``best_dice_ppm`` / ``symmetric_best_dice_ppm`` — G11 ``best_dice`` /
  ``symmetric_best_dice`` (``src/HelperMethods.py:69-92``) over raster
  maps, in EXACT integer arithmetic (parts-per-million, fractions
  ordered by cross-multiplication — process-independent, goldenable).
  Empty-list conventions preserved (``:71-75``); one guard added: two
  all-zero maps define dice 0 instead of the reference's
  ZeroDivisionError (documented deviation).
- ``baseline_median_x2`` — M10 ``get_baseline_median``
  (``src/detect_paragraphs.py:44-55``): median of the FIRST digit group
  of each ``TextLine@custom="heights:..."`` attribute.  Dead code in the
  reference (missing ``re``/``statistics`` imports); implemented here as
  the working stat, returning 2x the median so even-count medians stay
  exact integers.

Scale shape: every kernel is per-image numpy over small planes inside
``map_batches`` at document grain — the per-region Python iteration
mirrors the reference's per-rect loop and is bounded by regions-per-doc
(<=~20), never by corpus size; distribution comes from the Dataset.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa

_HEIGHTS_RE = re.compile(r"<TextLine[^>]*\bcustom=\"heights:([^\"]*)\"")
_DIGITS_RE = re.compile(r"\d+")

PPM = 1_000_000


# --------------------------------------------------------------------------
# drawing kernels
# --------------------------------------------------------------------------


def polyline_mask(
    h: int, w: int, pts, width: int = 4, out: np.ndarray | None = None
) -> np.ndarray:
    """Binary mask of a polyline through ``pts`` (``(x, y)`` canvas order,
    matching ImageDraw's argument convention) stamped with a square brush
    of side ``width`` (pixel offsets ``-(width//2) .. (width-1)//2`` in
    both axes — a deterministic stand-in for PIL's width semantics).
    Out-of-canvas samples are clipped away, like PIL."""
    mask = out if out is not None else np.zeros((h, w), dtype=np.uint8)
    p = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    if len(p) == 0:
        return mask
    segs = []
    for i in range(len(p) - 1):
        (x0, y0), (x1, y1) = p[i], p[i + 1]
        n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
        t = np.linspace(0.0, 1.0, n)
        segs.append(
            np.stack([x0 + t * (x1 - x0), y0 + t * (y1 - y0)], axis=1)
        )
    if len(p) == 1:
        segs.append(p[:1])
    samples = np.rint(np.concatenate(segs)).astype(np.int64)
    lo, hi = -(width // 2), (width - 1) // 2
    offs = np.arange(lo, hi + 1)
    ox, oy = np.meshgrid(offs, offs)
    xx = (samples[:, 0][:, None] + ox.ravel()[None, :]).ravel()
    yy = (samples[:, 1][:, None] + oy.ravel()[None, :]).ravel()
    ok = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
    mask[yy[ok], xx[ok]] = 1
    return mask


def polygon_mask(h: int, w: int, poly) -> np.ndarray:
    """Binary {0,1} mask of one filled polygon (``(x, y)`` canvas order):
    even-odd scanline fill (half-open crossing rule, fill between ceil of
    the left crossing and floor of the right) plus a 1-px outline so
    boundary pixels are included, closing the loop like PIL's polygon.
    Fewer than 3 points degenerates to the outline alone."""
    p = np.asarray(poly, dtype=np.float64).reshape(-1, 2)
    mask = np.zeros((h, w), dtype=np.uint8)
    if len(p) == 0:
        return mask
    closed = np.vstack([p, p[:1]])
    polyline_mask(h, w, closed, width=1, out=mask)
    if len(p) < 3:
        return mask
    x0, y0 = p[:, 0], p[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    ys = np.arange(h, dtype=np.float64)[:, None]  # [h, n_edges] broadcast
    cross = (y0[None, :] <= ys) != (y1[None, :] <= ys)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (ys - y0[None, :]) / (y1[None, :] - y0[None, :])
        xs = x0[None, :] + t * (x1[None, :] - x0[None, :])
    xs = np.where(cross, xs, np.inf)
    xs.sort(axis=1)  # crossings first (finite), pad inf
    n_cross = cross.sum(axis=1)
    # fill between consecutive crossing pairs via a row-wise diff array
    diff = np.zeros((h, w + 1), dtype=np.int32)
    max_pairs = int(n_cross.max()) // 2 if len(n_cross) else 0
    for k in range(max_pairs):
        has = n_cross >= 2 * (k + 1)
        xl = np.where(has, xs[:, 2 * k], 0.0)
        xr = np.where(has, xs[:, 2 * k + 1], -1.0)
        left = np.ceil(xl).astype(np.int64)
        right = np.floor(xr).astype(np.int64)
        left = np.clip(left, 0, w)
        right = np.clip(right, -1, w - 1)
        ok = has & (left <= right)
        rows = np.nonzero(ok)[0]
        np.add.at(diff, (rows, left[ok]), 1)
        np.add.at(diff, (rows, right[ok] + 1), -1)
    mask |= (np.cumsum(diff[:, :-1], axis=1) > 0).astype(np.uint8)
    return mask


def overlay_rects(
    plane: np.ndarray, rects, width: int = 4, value: int = 255
) -> np.ndarray:
    """M9 ``get_img_coords``: copy ``plane``, draw each rect (a list of
    in-memory ``(y, x)`` corners) as a CLOSED width-``width`` polyline
    into a label mask — points handed to the draw kernel in the
    reference's swapped ``(x=y, y=x)`` order, the same axis-swap quirk as
    ``get_maps`` — then paint every labeled pixel to ``value``."""
    h, w = plane.shape
    label = np.zeros((h, w), dtype=np.uint8)
    for rect in rects:
        closed = list(rect) + list(rect[:1])
        polyline_mask(h, w, np.asarray(closed, np.float64), width, out=label)
    res = plane.copy()
    res[label == 1] = value
    return res


def separator_img(img: np.ndarray, separators, value: int) -> np.ndarray:
    """G10 ``get_separator_img`` exactly: stamp whole columns, in place,
    and return the image (``SeparatorHelperMethods.py:55-59``)."""
    for separator in separators:
        img[:, separator] = value
    return img


def get_maps(
    coordinates,
    ground_truth_coordinates,
    image_width: int,
    image_height: int,
    swap_axes: bool = True,
):
    """G12: rasterize both coordinate lists to binary maps of shape
    ``(image_height, image_width)``.  Returns ``(ground_truth_maps,
    results_maps)`` — note the reference's own argument/return crossing:
    the FIRST argument produces the SECOND return element
    (``HelperMethods.py:95-113``; harmless because G11's symmetric dice
    is order-insensitive, preserved verbatim here).  ``swap_axes``
    reproduces the (y, x)-into-ImageDraw transpose-and-clip quirk."""

    def rasterize(polys):
        out = []
        for poly in polys:
            p = np.asarray(poly, dtype=np.float64).reshape(-1, 2)
            if swap_axes:
                canvas = p  # (y, x) read as (x, y): transpose by NOT swapping
            else:
                canvas = p[:, ::-1]
            out.append(polygon_mask(image_height, image_width, canvas))
        return out

    return rasterize(ground_truth_coordinates), rasterize(coordinates)


# --------------------------------------------------------------------------
# dice over raster maps (G11 over G12), exact integer ppm
# --------------------------------------------------------------------------


def best_dice_ppm(a: list[np.ndarray], b: list[np.ndarray]) -> int:
    """Reference ``best_dice`` (``HelperMethods.py:69-92``) in exact
    integer ppm: for each map in ``a`` the best dice against ``b``
    (fractions ordered by cross-multiplication), floored to ppm, then the
    floor-mean.  Empty conventions preserved: both empty -> 1.0, ``a``
    empty -> 0; two all-zero maps score 0 (reference: ZeroDivisionError,
    documented deviation)."""
    if len(a) == 0:
        return PPM if len(b) == 0 else 0
    sums_b = [int(bj.sum()) for bj in b]
    total = 0
    for ai in a:
        sa = int(ai.sum())
        best_num, best_den = 0, 1  # dice as fraction 2e/(sa+sb)
        for bj, sb in zip(b, sums_b):
            den = sa + sb
            if den == 0:
                continue
            num = 2 * int((ai & bj).sum())
            if num * best_den > best_num * den:
                best_num, best_den = num, den
        total += (best_num * PPM) // best_den
    return total // len(a)


def symmetric_best_dice_ppm(ground_truth, result) -> int:
    """``min`` of both directions (``HelperMethods.py:91-92``)."""
    return min(best_dice_ppm(ground_truth, result), best_dice_ppm(result, ground_truth))


# --------------------------------------------------------------------------
# span-geometry + sidecar-XML helpers
# --------------------------------------------------------------------------


def spans_to_region_coords(
    spans: list[dict], width: int, height: int
) -> list[list[tuple[int, int]]]:
    """Content-dependent region rectangles for raster evaluation: spans
    (sorted by offset) stack top-to-bottom with per-span band height
    ``1 + len(payload) // 4`` rows, full width, wrapping at ``height``.
    Unlike S5's uniform export bands this geometry shifts when span
    ORDER or CONTENT shifts, so the raster dice discriminates strategy
    differences.  Corners in in-memory ``(y, x)`` order (the reference's
    convention)."""
    coords = []
    y = 0
    for s in sorted(spans, key=lambda s: s["offset"]):
        payload = s["text"] or s["media_ref"]
        band = 1 + len(payload) // 4
        y0 = y % height
        y1 = min(y0 + band, height - 1)
        coords.append([(y0, 0), (y0, width - 1), (y1, width - 1), (y1, 0)])
        y += band
    return coords


def baseline_median_x2(xml: str) -> int:
    """M10 as a working stat: 2x the median of each TextLine's first
    ``heights`` digit group (2x keeps even-count medians exact
    integers); 0 when no heights are present, like the reference's
    fallback (``detect_paragraphs.py:51-55``)."""
    hs = []
    for attr in _HEIGHTS_RE.findall(xml):
        digits = _DIGITS_RE.findall(attr)
        if digits:
            hs.append(int(digits[0]))
    if not hs:
        return 0
    hs.sort()
    n = len(hs)
    return 2 * hs[n // 2] if n % 2 else hs[n // 2 - 1] + hs[n // 2]


# --------------------------------------------------------------------------
# pipelines
# --------------------------------------------------------------------------

OVERLAY_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_regions", pa.int32()),
        ("marked_px", pa.int64()),
        ("overlay_crc32", pa.int64()),
        ("n_sep_cols", pa.int32()),
        ("baseline_median_x2", pa.int64()),
    ]
)

DICE_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("raster_dice_ppm", pa.int64())]
)

# fixed raster-eval canvas: small planes keep the per-doc kernels cheap
# while still exercising the swap-axes clipping quirk (width != height)
DICE_W, DICE_H = 48, 64


class OverlayRenderer:
    """map_batches actor (M9 + G10 + M10 in one doc-grain pass): decode
    the doc's first media payload to a RAW8 plane, draw the doc's span
    regions as closed rect outlines (M9), stamp planted separator
    columns (G10), and compute the sidecar baseline-height median (M10).
    Deterministic end to end — golden-pinned."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        from ..stages.media import encode_demo_payloads, parse_raw8
        from .pagexml import doc_to_page_xml

        from ..stages.raster import _planted_baselines

        ids, refs = [], []
        widths, heights, nregs, marked, crcs, nseps, med2 = (
            [], [], [], [], [], [], []
        )
        for row in batch.to_pylist():
            spans = row["spans"] or []
            media = [s["media_ref"] for s in spans if s["media_ref"]]
            if not media:
                continue
            ref = media[0]
            payload = encode_demo_payloads([ref])[0]
            w, h, _f, plane = parse_raw8(payload)
            rects = spans_to_region_coords(spans, w, h)
            overlay = overlay_rects(plane, rects)
            dig = hashlib.sha256(ref.encode()).digest()
            seps = sorted({dig[4] % w, dig[5] % w})
            separator_img(overlay, seps, 255)
            lines, _ = _planted_baselines(ref, w, h)
            line_heights = [8 + dig[6 + j % 8] % 24 for j in range(len(lines))]
            xml = doc_to_page_xml(
                row["doc_id"], [], width=w, height=h,
                baselines=lines, line_heights=line_heights,
            )
            ids.append(row["doc_id"])
            refs.append(ref)
            widths.append(w)
            heights.append(h)
            nregs.append(len(rects))
            marked.append(int((overlay != plane).sum()))
            crcs.append(zlib.crc32(overlay.tobytes()))
            nseps.append(len(seps))
            med2.append(baseline_median_x2(xml))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "media_ref": pa.array(refs, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_regions": pa.array(nregs, pa.int32()),
                "marked_px": pa.array(marked, pa.int64()),
                "overlay_crc32": pa.array(crcs, pa.int64()),
                "n_sep_cols": pa.array(nseps, pa.int32()),
                "baseline_median_x2": pa.array(med2, pa.int64()),
            },
            schema=OVERLAY_SCHEMA,
        )


def media_overlay(sf_dir: str, *, concurrency=(1, 4), batch_size: int = 128):
    """M9/G10/M10 composite: extraction -> docs with media -> actor-pool
    overlay render.  Doc-grain, streaming; one row per doc that has at
    least one media span."""
    from ..pipelines.extract import extract_pipeline
    from ..sources.synth import docs_from_parquet

    docs = extract_pipeline(docs_from_parquet(sf_dir))
    return docs.map_batches(
        OverlayRenderer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def _dice_part(part: pa.Table) -> pa.Table:
    """Per-doc symmetric raster best-dice for one coarse partition (same
    two-sided union shape as ``evaluate.evaluate_extraction``)."""
    sides: dict[str, list] = {}
    for r in part.to_pylist():
        ab = sides.setdefault(r["doc_id"], [[], []])
        ab[0 if r["side"] == "a" else 1] = r["spans"] or []
    ids, vals = [], []
    for doc_id in sorted(sides):
        a, b = sides[doc_id]
        ca = spans_to_region_coords(a, DICE_W, DICE_H)
        cb = spans_to_region_coords(b, DICE_W, DICE_H)
        ma, mb = get_maps(ca, cb, DICE_W, DICE_H)
        # get_maps returns (maps(b), maps(a)) — the reference's own
        # arg/return crossing; symmetric dice is order-insensitive
        ids.append(doc_id)
        vals.append(symmetric_best_dice_ppm(ma, mb))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "raster_dice_ppm": pa.array(vals, pa.int64()),
        },
        schema=DICE_SCHEMA,
    )


def eval_raster_dice(sf_dir: str):
    """G11-over-G12 as a distributed evaluation: happy-path extraction vs
    the flood-order strategy, per-doc symmetric best dice over rasterized
    content-dependent region maps.  Docs where the strategies agree score
    1.0 (1_000_000 ppm); docs whose span order differs score below it."""
    from ..pipelines.extract import extract_pipeline
    from ..sources.synth import docs_from_parquet

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "side", pa.array([side] * batch.num_rows, pa.string())
            )

        fn.__name__ = f"tag_{side}"
        return fn

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__dpart",
            pa.array(
                [
                    zlib.crc32(d.encode()) % 64
                    for d in batch["doc_id"].to_pylist()
                ],
                pa.int64(),
            ),
        )

    a = extract_pipeline(docs_from_parquet(sf_dir))
    b = extract_pipeline(docs_from_parquet(sf_dir), order_strategy="flood")
    both = (
        a.map_batches(tag("a"), batch_format="pyarrow")
        .union(b.map_batches(tag("b"), batch_format="pyarrow"))
        .map_batches(add_part, batch_format="pyarrow")
    )
    return both.groupby("__dpart").map_groups(
        lambda g: _dice_part(g.drop_columns(["__dpart"])),
        batch_format="pyarrow",
    )
