"""Frozen conformance spec for the extraction engine.

This module is the single source of truth for every constant, threshold and
scalar predicate the extraction pipeline uses.  Both the single-process oracle
(``layout_analysis_ray.oracle``) and the Ray Data engine import from here so
they cannot drift (SURVEY.md §7.3).

The semantics re-derive the *behavior* of the reference
(ChengQikai/Layout-analysis) generalized from per-pixel page rasters to
per-span interleaved documents:

- 3-class span labels mirror the reference's pixel classes
  (``/root/reference/src/prepare_data/prepare_data.py:92,117-120``):
  0 = boilerplate (background), 1 = content (paragraph body),
  2 = boundary (edge / separator).
- ``argmax``-style labeling mirrors ``get_segmentation_map``
  (``/root/reference/src/DocumentAnalyzer.py:52-59``).
- Boundary suppression before block formation mirrors the class-2 -> 0
  ``putmask`` (``/root/reference/src/DocumentAnalyzer.py:63,113``).
- Block postprocessing thresholds (width < 75, height < 25, +-10px
  containment tolerance) come from ``/root/reference/src/Postprocessing.py:20-27``.
- Vertical-merge thresholds (y-gap < 100, x-overlap > 0.7, size-ratio > 0.6,
  both-axis overlap > 0.8) come from
  ``/root/reference/src/prepare_data/merge_vertical_paragraphs.py:7-19``.

Known deliberate deviation: the reference's ``merge_paragraphs`` computes
``np.amin(rect)`` *before* its ``rect is None`` check
(``merge_vertical_paragraphs.py:27-31,84-85``), which raises on any rect that
an earlier iteration nulled out.  We implement the evident intent (skip None
first) while preserving every other quirk, including the pass-2
``break``-not-``continue`` at ``:94`` and the restart-inner-scan
(``index2 = 0``) at ``:57,68``.
"""

from __future__ import annotations

import json
import re

# ---------------------------------------------------------------------------
# Kind vocabulary
# ---------------------------------------------------------------------------

# Input span kinds (FIXTURES.md).
KIND_HTML = "html"
KIND_TEXT = "text"
KIND_PDF_BLOCK = "pdf_block"
KIND_IMAGE = "image"
KIND_FIGURE_REF = "figure_ref"
INPUT_KINDS = (KIND_HTML, KIND_TEXT, KIND_PDF_BLOCK, KIND_IMAGE, KIND_FIGURE_REF)
MEDIA_KINDS = (KIND_IMAGE, KIND_FIGURE_REF)

# Output span kinds.
OUT_TITLE = "title"
OUT_PARAGRAPH = "paragraph"
OUT_TABLE = "table"
OUT_FIGURE = "figure"
OUT_IMAGE = "image"
OUT_ERROR = "error"
OUTPUT_KINDS = (OUT_TITLE, OUT_PARAGRAPH, OUT_TABLE, OUT_FIGURE, OUT_IMAGE, OUT_ERROR)

# 3-class span labels (reference pixel classes generalized).
LABEL_BOILER = 0   # background
LABEL_CONTENT = 1  # paragraph body
LABEL_BOUNDARY = 2 # edge / separator

# ---------------------------------------------------------------------------
# Scoring thresholds (frozen)
# ---------------------------------------------------------------------------

LINK_DENSITY_MAX = 1.0 / 3.0   # html span is boilerplate above this
MIN_TEXT_LEN = 25              # min visible chars for a non-heading html span
TEXT_DENSITY_MIN = 0.2         # visible/raw ratio below which html is chrome
BOILER_TEXT_MAX_LEN = 80       # plain-text boilerplate only when shorter than this

# Postprocessing thresholds (reference Postprocessing.py:20-27).
MIN_BLOCK_WIDTH = 75
MIN_BLOCK_HEIGHT = 25
INSIDE_TOLERANCE = 10

# Vertical-merge thresholds (reference merge_vertical_paragraphs.py).
MERGE_Y_THRESHOLD = 100
MERGE_X_OVERLAP = 0.7
MERGE_SIZE_RATIO = 0.6
MERGE_BOTH_OVERLAP = 0.8

# XY-cut thresholds (pixel units of the synthetic pdf page space).
XCUT_GAP = 30    # min horizontal gap that splits columns within a band
WIDE_FRAC = 0.6  # a block wider than this fraction of the group is a band
                 # separator (title rows, full-width paragraphs)

# PDF title heuristic.
TITLE_MAX_LEN = 80
TITLE_TOP_FRAC = 0.2
TITLE_MIN_WIDTH_FRAC = 0.5

# ---------------------------------------------------------------------------
# Regex spec (ASCII whitespace on purpose: python-re and RE2 must agree)
# ---------------------------------------------------------------------------

WS_CHARS = " \t\r\n\f\v"
RE_WS = r"[ \t\r\n\f\v]+"
RE_TAG = r"<[^>]*>"
RE_ANCHOR = r"(?is)<a\b[^>]*>.*?</a>"
RE_HEADING = r"(?is)^[ \t\r\n\f\v]*<h[123][ \t\r\n\f\v>]"
RE_HR = r"(?is)<hr\b"
RE_TABLE_TAG = r"(?is)<table\b"
RE_RULE = r"^[-=_*]{3,}$"  # applied to the ws-collapsed text
RE_BOILER = (
    r"(?i)\b(copyright|all rights reserved|cookie|subscribe|newsletter|"
    r"terms of service|privacy policy)\b"
)

_ws = re.compile(RE_WS)
_tag = re.compile(RE_TAG)
_anchor = re.compile(RE_ANCHOR)
_heading = re.compile(RE_HEADING)
_hr = re.compile(RE_HR)
_table_tag = re.compile(RE_TABLE_TAG)
_rule = re.compile(RE_RULE)
_boiler = re.compile(RE_BOILER)


def collapse_ws(s: str) -> str:
    """Collapse runs of ASCII whitespace to single spaces and trim."""
    return _ws.sub(" ", s).strip(WS_CHARS)


def html_visible(raw: str) -> str:
    """Visible text of an html fragment: tags removed, whitespace collapsed."""
    return collapse_ws(_tag.sub(" ", raw))


def html_link_text_len(raw: str) -> int:
    """Total visible length contributed by <a> elements."""
    without = _anchor.sub(" ", raw)
    return max(0, len(html_visible(raw)) - len(html_visible(without)))


def is_heading_html(raw: str) -> bool:
    return _heading.match(raw) is not None


def is_hr_html(raw: str) -> bool:
    return _hr.search(raw) is not None


def has_table_tag(raw: str) -> bool:
    return _table_tag.search(raw) is not None


def is_rule_text(text: str) -> bool:
    return _rule.match(collapse_ws(text)) is not None


def matches_boiler(text: str) -> bool:
    return _boiler.search(text) is not None


def is_tabular_text(raw: str) -> bool:
    """>=2 non-empty lines, >=50% of them with >=2 '|' or >=2 tab chars."""
    # fast path (same result): impossible without a newline AND >=2 marks
    if "\n" not in raw or (raw.count("|") < 2 and raw.count("\t") < 2):
        return False
    lines = [ln for ln in raw.split("\n") if collapse_ws(ln)]
    if len(lines) < 2:
        return False
    tab = sum(1 for ln in lines if ln.count("|") >= 2 or ln.count("\t") >= 2)
    return tab * 2 >= len(lines)


# ---------------------------------------------------------------------------
# Span label assignment (the "segmentation map" analogue)
# ---------------------------------------------------------------------------

def label_html_span(raw: str) -> tuple[int, bool, str]:
    """-> (label, heading_hint, visible_text)."""
    visible = html_visible(raw)
    if not visible:
        if is_hr_html(raw):
            return LABEL_BOUNDARY, False, visible
        return LABEL_BOILER, False, visible
    if is_heading_html(raw):
        return LABEL_CONTENT, True, visible
    link_len = html_link_text_len(raw)
    link_density = link_len / max(1, len(visible))
    text_density = len(visible) / max(1, len(raw))
    if (
        link_density > LINK_DENSITY_MAX
        or len(visible) < MIN_TEXT_LEN
        or text_density < TEXT_DENSITY_MIN
    ):
        return LABEL_BOILER, False, visible
    return LABEL_CONTENT, False, visible


def label_text_span(raw: str) -> tuple[int, bool, str]:
    visible = collapse_ws(raw)
    if not visible:
        return LABEL_BOILER, False, visible
    if is_rule_text(raw):
        return LABEL_BOUNDARY, False, visible
    if len(visible) < BOILER_TEXT_MAX_LEN and matches_boiler(raw):
        return LABEL_BOILER, False, visible
    return LABEL_CONTENT, False, visible


# ---------------------------------------------------------------------------
# pdf_block payload
# ---------------------------------------------------------------------------

PDF_KEYS = ("x0", "y0", "x1", "y1", "text")


def parse_pdf_block(raw: str):
    """Parse a pdf_block JSON payload -> (x0, y0, x1, y1, text).

    Raises ValueError on any malformed payload (poison-doc path).
    """
    try:
        obj = json.loads(raw)
    except Exception as exc:  # noqa: BLE001 - any parse failure is poison
        raise ValueError(f"bad json: {exc}") from None
    if not isinstance(obj, dict):
        raise ValueError("not an object")
    for k in PDF_KEYS:
        if k not in obj:
            raise ValueError(f"missing key {k}")
    try:
        x0, y0, x1, y1 = (float(obj[k]) for k in PDF_KEYS[:4])
    except (TypeError, ValueError):
        raise ValueError("non-numeric bbox") from None
    if not isinstance(obj["text"], str):
        raise ValueError("text not a string")
    if x1 < x0 or y1 < y0:
        raise ValueError("inverted bbox")
    return x0, y0, x1, y1, obj["text"]


def poison_error_text(span_offset: int) -> str:
    return f"pdf_block_parse_error:span_offset={span_offset}"


# ---------------------------------------------------------------------------
# Geometry predicates (reference Postprocessing.py semantics, (x, y) points)
# ---------------------------------------------------------------------------

def overlap_1d(min1: float, max1: float, min2: float, max2: float) -> float:
    """Reference ``overlap`` (Postprocessing.py:15-17): intersection over the
    shorter interval.  Division by zero on degenerate intervals is the
    caller's problem, as in the reference."""
    min_length = min(max1 - min1, max2 - min2)
    return max(0.0, min(max1, max2) - max(min1, min2)) / min_length


def is_inside(
    min_x, max_x, min_y, max_y, min_x1, max_x1, min_y1, max_y1
) -> bool:
    """Reference ``is_inside`` (Postprocessing.py:20-21): rect1 inside rect2
    with a +-10px tolerance, strict inequalities exactly as written."""
    return (
        min_x + INSIDE_TOLERANCE > min_x1
        and max_x < max_x1 + INSIDE_TOLERANCE
        and min_y + INSIDE_TOLERANCE > min_y1
        and max_y < max_y1 + INSIDE_TOLERANCE
    )


def is_small(min_x, max_x, min_y, max_y) -> bool:
    """Reference ``is_small`` (Postprocessing.py:24-27)."""
    height = max_y - min_y
    width = max_x - min_x
    return width < MIN_BLOCK_WIDTH or height < MIN_BLOCK_HEIGHT


def is_almost_same_size(min1, max1, min2, max2) -> bool:
    """Reference ``is_almost_same_size`` (merge_vertical_paragraphs.py:15-19)."""
    first_len = max1 - min1
    second_len = max2 - min2
    return max(first_len, second_len) * MERGE_SIZE_RATIO < min(first_len, second_len)


# ---------------------------------------------------------------------------
# Block algorithms shared verbatim by oracle and engine.
#
# These operate on plain (x0, y0, x1, y1) tuples and are deliberately the
# *only* implementation of the quirky reference control flow, so the oracle
# and the Ray engine cannot diverge on them (SURVEY.md §7.3).  Their inputs
# are per-document and tiny (tens of blocks), so sharing costs nothing.
# ---------------------------------------------------------------------------

def postprocess_rects(rects: list) -> list[int]:
    """Reference ``paragraphs_postprocessing`` (Postprocessing.py:30-57) over
    (x0, y0, x1, y1) rects.  Returns the list of *surviving indices* in input
    order, preserving the exact pairwise-scan control flow:

    - outer loop stops before the last rect (``range(len - 1)``), so a
      trailing small rect with nothing after it survives;
    - a small/inside rect1 is only dropped when a live rect2 exists after it;
    - ``erased -> continue`` in the reference is a no-op and is omitted.
    """
    coords: list = list(rects)
    n = len(coords)
    for i in range(n - 1):
        r1 = coords[i]
        if r1 is None:
            continue
        for j in range(i + 1, n):
            r2 = coords[j]
            if r2 is None:
                continue
            if is_small(r1[0], r1[2], r1[1], r1[3]) or is_inside(
                r1[0], r1[2], r1[1], r1[3], r2[0], r2[2], r2[1], r2[3]
            ):
                coords[i] = None
                break
            elif is_small(r2[0], r2[2], r2[1], r2[3]) or is_inside(
                r2[0], r2[2], r2[1], r2[3], r1[0], r1[2], r1[1], r1[3]
            ):
                coords[j] = None
    return [i for i in range(n) if coords[i] is not None]


def merge_rects(rects: list) -> list[tuple]:
    """Reference ``merge_paragraphs`` (merge_vertical_paragraphs.py:22-98)
    over (x0, y0, x1, y1) rects.  Returns
    ``[(x0, y0, x1, y1, [member_input_indices]), ...]``.

    Preserved quirks: restart-inner-scan (``index2 = 0``) after every merge;
    pass-2 containment uses *strict* inequalities with no tolerance; pass-2
    ``if erased: break`` aborts the outer scan entirely (reference ``:94``).
    Deviation (documented in the module docstring): None entries are skipped
    before their bbox is computed; the reference would raise.
    """
    coords: list = [list(r) for r in rects]
    members: list = [[i] for i in range(len(rects))]
    merged: list = []  # (rect, member_indices)

    for i1 in range(len(coords)):
        r1 = coords[i1]
        if r1 is None:
            continue
        mem = members[i1]
        i2 = 0
        while i2 < len(coords):
            if i2 == i1:
                i2 += 1
                continue
            r2 = coords[i2]
            if r2 is None:
                i2 += 1
                continue
            near_y = (
                abs(r1[1] - r2[3]) < MERGE_Y_THRESHOLD
                or abs(r1[3] - r2[1]) < MERGE_Y_THRESHOLD
            )
            if (
                near_y
                and overlap_1d(r1[0], r1[2], r2[0], r2[2]) > MERGE_X_OVERLAP
                and is_almost_same_size(r1[0], r1[2], r2[0], r2[2])
            ) or (
                overlap_1d(r1[0], r1[2], r2[0], r2[2]) > MERGE_BOTH_OVERLAP
                and overlap_1d(r1[1], r1[3], r2[1], r2[3]) > MERGE_BOTH_OVERLAP
            ):
                coords[i2] = None
                mem = mem + members[i2]
                r1 = [
                    min(r1[0], r2[0]),
                    min(r1[1], r2[1]),
                    max(r1[2], r2[2]),
                    max(r1[3], r2[3]),
                ]
                i2 = 0
            else:
                i2 += 1
        merged.append((r1, mem))

    # Pass 2: containment cleanup with the reference's break quirk.
    rects2: list = [m[0] for m in merged]
    n = len(rects2)
    erased_outer = False
    for i in range(n - 1):
        if erased_outer:
            break
        r1 = rects2[i]
        if r1 is None:
            continue
        for j in range(i + 1, n):
            r2 = rects2[j]
            if r2 is None:
                continue
            if r1[0] > r2[0] and r1[2] < r2[2] and r1[1] > r2[1] and r1[3] < r2[3]:
                rects2[i] = None
                erased_outer = True
                break
            elif r2[0] > r1[0] and r2[2] < r1[2] and r2[1] > r1[1] and r2[3] < r1[3]:
                rects2[j] = None

    return [
        (tuple(rects2[i]), merged[i][1])
        for i in range(n)
        if rects2[i] is not None
    ]


def _axis_gaps(intervals: list, min_gap: float) -> list[float]:
    """Midpoints of gaps >= min_gap between the merged coverage intervals."""
    ivs = sorted(intervals)
    gaps = []
    cur_end = ivs[0][1]
    for s, e in ivs[1:]:
        if s - cur_end >= min_gap:
            gaps.append((s + cur_end) / 2.0)
        cur_end = max(cur_end, e)
    return gaps


def xycut_order(rects: list) -> list[int]:
    """XY-cut reading order over (x0, y0, x1, y1) rects -> index permutation.

    Analogue of the reference's vertical-separator split + component emission
    (``/root/reference/src/SeparatorHelperMethods.py:62-74`` separator columns
    + ``/root/reference/src/DocumentAnalyzer.py:111-115`` label order),
    specialized to column-major reading order:

    1. Blocks wider than ``WIDE_FRAC`` x the group width (title rows,
       full-width paragraphs) are horizontal band separators; sorted by
       (y0, x0, index) they partition the y-range into bands.
    2. Narrow blocks are assigned to the band below the last wide block whose
       y-center is <= their own y-center.
    3. Emission: band 0 (above all wide blocks), wide block 0, band 1, ... —
       within a band, x-gaps >= XCUT_GAP split columns, read left -> right,
       each column top -> bottom by (y0, x0, index).
    """
    n = len(rects)
    if n == 0:
        return []
    gx0 = min(r[0] for r in rects)
    gx1 = max(r[2] for r in rects)
    wide_min = WIDE_FRAC * (gx1 - gx0)

    wide = [i for i in range(n) if (rects[i][2] - rects[i][0]) > wide_min]
    narrow = [i for i in range(n) if i not in set(wide)]
    wide.sort(key=lambda i: (rects[i][1], rects[i][0], i))
    wide_centers = [(rects[i][1] + rects[i][3]) / 2.0 for i in wide]

    bands: list[list[int]] = [[] for _ in range(len(wide) + 1)]
    for i in narrow:
        center = (rects[i][1] + rects[i][3]) / 2.0
        g = sum(1 for wc in wide_centers if center >= wc)
        bands[g].append(i)

    def emit_band(idx: list[int]) -> list[int]:
        if len(idx) <= 1:
            return list(idx)
        gaps = _axis_gaps([(rects[i][0], rects[i][2]) for i in idx], XCUT_GAP)
        cols: list[list[int]] = [[] for _ in range(len(gaps) + 1)]
        for i in idx:
            center = (rects[i][0] + rects[i][2]) / 2.0
            cols[sum(1 for cut in gaps if center > cut)].append(i)
        out: list[int] = []
        for col in cols:
            out.extend(sorted(col, key=lambda i: (rects[i][1], rects[i][0], i)))
        return out

    out: list[int] = []
    for b in range(len(wide) + 1):
        out.extend(emit_band(bands[b]))
        if b < len(wide):
            out.append(wide[b])
    return out


def classify_pdf_block(rect, text: str, page_w: float, page_h: float) -> str:
    """Region kind for an ordered pdf block (title/table/paragraph)."""
    visible = collapse_ws(text)
    if (
        len(visible) < TITLE_MAX_LEN
        and rect[1] < TITLE_TOP_FRAC * page_h
        and (rect[2] - rect[0]) >= TITLE_MIN_WIDTH_FRAC * page_w
    ):
        return OUT_TITLE
    if is_tabular_text(text):
        return OUT_TABLE
    return OUT_PARAGRAPH
