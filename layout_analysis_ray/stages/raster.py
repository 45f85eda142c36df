"""Raster skew estimation / correction over decoded media planes — the
span-free, pixels-in-memory analogue of the reference's separator
preprocessing (closes SURVEY A2/G5/G8 for raster users):

- :func:`estimate_skew` — per-baseline (length, angle) from the polyline
  ENDPOINTS, sort by length desc, keep the top HALF, mean angle — the
  reference's exact algorithm including its quirks
  (``/root/reference/src/SeparatorHelperMethods.py:20-41``): a single
  baseline yields 0 survivors (``[0:int(1/2)]``) and hence angle 0;
  horizontal-endpoint lines contribute ``(0, 0)``.  One deliberate
  deviation, documented: vertical-endpoint lines (dx == 0) also
  contribute ``(0, 0)`` instead of raising ZeroDivisionError.
- :func:`rotate_plane` — G5's ``ndimage.rotate(img, angle,
  reshape=False)`` re-expressed as a vectorized numpy inverse-map with
  NEAREST-NEIGHBOR sampling (scipy is not in this environment; the
  resampling kernel differs from scipy's spline, the geometry does not):
  CCW by ``deg`` in (row, col) coordinates, pinned to ``np.rot90`` at
  90 degrees on odd squares, zero fill outside the source.
- :func:`rotate_points` — G8's ``rotate_line``
  (``SeparatorHelperMethods.py:77-81``): map (y, x) points into the
  rotated plane's coordinates with the same center/convention, so a
  baseline rotated by the NEGATED estimated angle lands where
  ``rotate_plane`` moved its pixels.

The :func:`media_deskew` pipeline composes them with the real-bytes
media path: sidecar PAGE-XML baselines (parsed by
``functions.pagexml.page_xml_baselines``, the reference's axis-swap
contract) -> A2 angle -> G5 plane rotation of the decoded RAW8 payload
-> G8 baseline normalization.  Deterministic end to end, golden-pinned.
"""

from __future__ import annotations

import math
import zlib

import numpy as np
import pyarrow as pa

SKEW_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("skew_mdeg", pa.int64()),  # estimated angle, millidegrees
        ("unskew_mdeg", pa.int64()),  # the G5 return convention: -angle
        ("n_baselines", pa.int32()),
        ("plane_crc32", pa.int64()),  # rotated first-frame plane checksum
        ("line0_y", pa.int64()),  # first baseline's first point, deskewed
        ("line0_x", pa.int64()),
    ]
)


def estimate_skew(lines: list[list[tuple[int, int]]]) -> float:
    """Mean endpoint angle (degrees) of the longest half of the baselines
    — reference ``rotate_data`` lines 20-41 exactly (see module doc)."""
    info = []
    for line in lines:
        (y0, x0), (y1, x1) = line[0], line[-1]
        if y1 != y0 and x1 != x0:
            rotation = math.degrees(math.atan((y1 - y0) / (x1 - x0)))
            length = math.hypot(y1 - y0, x1 - x0)
            info.append((length, rotation))
        else:
            info.append((0.0, 0.0))
    info.sort(key=lambda t: t[0], reverse=True)
    info = info[: int(len(info) / 2)]
    if not info:
        return 0.0
    return sum(r for _, r in info) / len(info)


def rotate_plane(img: np.ndarray, deg: float) -> np.ndarray:
    """Rotate a [h, w] plane CCW by ``deg`` about its center (row/col
    coordinates, y down), nearest-neighbor, same shape (reshape=False),
    zero fill — the G5 geometry with a deterministic numpy kernel."""
    h, w = img.shape
    if h == 0 or w == 0 or deg == 0.0:
        return img.copy()
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    t = np.deg2rad(deg)
    yy, xx = np.mgrid[0:h, 0:w]
    dy, dx = yy - cy, xx - cx
    sy = cy + dy * np.cos(t) + dx * np.sin(t)
    sx = cx - dy * np.sin(t) + dx * np.cos(t)
    syi = np.rint(sy).astype(np.int64)
    sxi = np.rint(sx).astype(np.int64)
    ok = (syi >= 0) & (syi < h) & (sxi >= 0) & (sxi < w)
    out = np.zeros_like(img)
    out[ok] = img[syi[ok], sxi[ok]]
    return out


def rotate_points(
    points: np.ndarray, deg: float, shape: tuple[int, int]
) -> np.ndarray:
    """Map [n, 2] (y, x) points into the frame produced by
    ``rotate_plane(img, deg)`` — a pixel at p lands at
    ``rotate_points(p, deg, img.shape)`` (G8's rotate_line).

    Deliberate deviation, documented: the reference's ``rotate_line``
    rotates about the ORIGIN via cv2 (``SeparatorHelperMethods.py:77-81``)
    while its raster rotation is about the image CENTER — an internal
    inconsistency (the two differ by a translation).  This engine keeps
    points and pixels in one center-based convention; consistency is
    pinned by a bright-pixel tracking test."""
    h, w = shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    t = np.deg2rad(deg)
    p = np.asarray(points, dtype=np.float64)
    dy, dx = p[:, 0] - cy, p[:, 1] - cx
    # forward map = inverse of rotate_plane's source lookup
    ny = cy + dy * np.cos(t) - dx * np.sin(t)
    nx = cx + dy * np.sin(t) + dx * np.cos(t)
    return np.stack([ny, nx], axis=1)


def _planted_baselines(ref: str, w: int, h: int):
    """Deterministic sidecar baselines with a PLANTED skew angle derived
    from sha256(ref): k lines of varying length at the planted angle,
    plus one short horizontal distractor (dropped by the top-half
    filter).  Returns (lines as (y, x) points, planted angle degrees)."""
    import hashlib

    dig = hashlib.sha256(ref.encode()).digest()
    angle = (dig[3] % 21) - 10  # integer degrees in [-10, 10]
    slope = math.tan(math.radians(angle))
    lines = []
    for j in range(3):
        x0 = 2 + j
        x1 = max(x0 + 4, w - 2 - j)
        y0 = 4 + 3 * j
        y1 = int(round(y0 + (x1 - x0) * slope))
        lines.append([(y0, x0), (y1, x1)])
    lines.append([(2, 1), (2, 3)])  # short horizontal distractor
    return lines, float(angle)


class MediaDeskewer:
    """map_batches actor: RAW8 payload + sidecar PAGE-XML -> deskewed
    plane facts.  Parses baselines from the XML (axis-swap contract),
    estimates the A2 angle, rotates the decoded first-frame plane by it
    (G5: the reference rotates by the +estimate and reports the negated
    angle), and normalizes the first baseline point with G8."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.pagexml import page_xml_baselines

        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("media_bytes").to_pylist()
        xmls = batch.column("sidecar_xml").to_pylist()
        n = len(refs)
        width = np.empty(n, np.int32)
        height = np.empty(n, np.int32)
        skew = np.empty(n, np.int64)
        nlines = np.empty(n, np.int32)
        crc = np.empty(n, np.int64)
        l0y = np.empty(n, np.int64)
        l0x = np.empty(n, np.int64)
        from .media import parse_raw8

        for i, (p, xml) in enumerate(zip(payloads, xmls)):
            try:
                w, h, _f, plane = parse_raw8(p)
                lines = page_xml_baselines(xml)
            except Exception:
                # poison payload/sidecar: quarantine as a marked row
                # (width/height/n_baselines == -1, the extract_error_docs
                # pattern) instead of failing the whole task
                width[i] = height[i] = nlines[i] = -1
                skew[i] = crc[i] = l0y[i] = l0x[i] = 0
                continue
            ang = estimate_skew(lines)
            rotated = rotate_plane(plane, ang)
            # +ang: points ride the same rotation as the plane, so the
            # first baseline point is reported IN the deskewed frame
            pt = rotate_points(
                np.asarray(lines[0][:1], dtype=np.float64), ang, (h, w)
            )[0] if lines else (0.0, 0.0)
            width[i], height[i] = w, h
            skew[i] = round(ang * 1000)
            nlines[i] = len(lines)
            crc[i] = zlib.crc32(rotated.tobytes())
            l0y[i], l0x[i] = round(pt[0]), round(pt[1])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_ref": batch.column("media_ref"),
                "width": pa.array(width, pa.int32()),
                "height": pa.array(height, pa.int32()),
                "skew_mdeg": pa.array(skew, pa.int64()),
                "unskew_mdeg": pa.array(-skew, pa.int64()),
                "n_baselines": pa.array(nlines, pa.int32()),
                "plane_crc32": pa.array(crc, pa.int64()),
                "line0_y": pa.array(l0y, pa.int64()),
                "line0_x": pa.array(l0x, pa.int64()),
            },
            schema=SKEW_SCHEMA,
        )


def media_deskew(sf_dir: str, *, concurrency=(1, 4), batch_size: int = 256):
    """The raster normalization pipeline: media spans -> RAW8 payload
    fetch + deterministic sidecar PAGE-XML (planted-skew baselines) ->
    actor-pool A2/G5/G8 deskew.  Small batch_size for the same
    bytes-not-rows reason as ``media_features``."""
    import pyarrow.compute as pc

    from ..functions.pagexml import doc_to_page_xml
    from ..pipelines.extract import explode, extract_pipeline
    from ..sources.synth import docs_from_parquet
    from .media import encode_demo_payloads

    spans = explode(extract_pipeline(docs_from_parquet(sf_dir)))
    media = spans.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("media_ref"), "")),
        batch_format="pyarrow",
    )

    def fetch(b: pa.Table) -> pa.Table:
        refs = b.column("media_ref").to_pylist()
        ids = b.column("doc_id").to_pylist()
        payloads = encode_demo_payloads(refs)
        xmls = []
        from .media import parse_raw8

        for i, (r, p) in enumerate(zip(refs, payloads)):
            w, h, _f, _plane = parse_raw8(p)
            lines, _ = _planted_baselines(r, w, h)
            xmls.append(
                doc_to_page_xml(ids[i], [], width=w, height=h, baselines=lines)
            )
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "media_ref": b.column("media_ref"),
                "media_bytes": pa.array(payloads, pa.binary()),
                "sidecar_xml": pa.array(xmls, pa.string()),
            }
        )

    return media.map_batches(fetch, batch_format="pyarrow").map_batches(
        MediaDeskewer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
