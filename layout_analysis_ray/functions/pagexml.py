"""PAGE-XML 2013 (PcGts) sidecar export / parse — reference S3/S4/S5 parity.

The reference emits one PAGE-XML file per document with ``TextRegion`` ids
``r1..rN`` in emission order and points serialized as ``"y,x"`` pairs
(writer ``/root/reference/src/HelperMethods.py:142-157``, point order
``:152``), and reads them back swapping the axes again (``:116-139`` regions,
``:35-45`` baselines) — the round-trip is consistent, and ours matches that
contract.  In the engine the Lance/Parquet span table is the primary output
(SURVEY.md §2.1 S5); this module is the compatibility sink/source: a
``map_batches`` stage producing an ``xml`` string column, one PcGts document
per row, and the inverse parser — no files, no driver loops.
"""

from __future__ import annotations

import re

import pyarrow as pa

XMLNS = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15"

_REGION_RE = re.compile(
    r"<TextRegion[^>]*>.*?<Coords\s+points=\"([^\"]*)\"", re.S
)
_KIND_RE = re.compile(r'<TextRegion[^>]*\btype="([^"]*)"')
_TEXT_RE = re.compile(r"<Unicode>(.*?)</Unicode>", re.S)
_BASELINE_RE = re.compile(r'<Baseline\s+points="([^"]*)"')


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _unesc(s: str) -> str:
    return (
        s.replace("&quot;", '"').replace("&gt;", ">").replace("&lt;", "<")
        .replace("&amp;", "&")
    )


def doc_to_page_xml(doc_id: str, spans: list[dict], width: int = 2000,
                    height: int = 3000,
                    baselines: list[list[tuple[int, int]]] | None = None,
                    line_heights: list[int] | None = None) -> str:
    """Serialize one extracted document to a PcGts string.

    Spans have no raster geometry in the flow path, so each span's rectangle
    is a synthetic full-width band stacked by ``offset`` — what matters for
    parity is the structure: region ids ``r{i+1}`` in emission order
    (HelperMethods.py:147-150), ``"y,x"`` corner serialization (``:152``).

    ``baselines`` (optional): polylines of in-memory ``(y, x)`` points,
    serialized ``"x,y"`` on disk inside ``TextLine/Baseline`` elements —
    the same axis-swap contract as the reference's baseline reader
    (``get_line_coords``, HelperMethods.py:35-45), so a sidecar XML user
    round-trips them losslessly.
    """
    out = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        f'<PcGts xmlns="{XMLNS}">',
        f'<Page imageFilename="{_esc(doc_id)}" imageWidth="{width}" '
        f'imageHeight="{height}">',
    ]
    band = max(1, height // max(1, len(spans)))
    for i, s in enumerate(sorted(spans, key=lambda s: s["offset"])):
        y0, y1 = i * band, (i + 1) * band
        corners = [(y0, 0), (y0, width), (y1, width), (y1, 0)]
        pts = " ".join(f"{y},{x}" for (y, x) in corners)
        payload = s["text"] if s["text"] else s["media_ref"]
        out.append(
            f'<TextRegion id="r{i + 1}" type="{_esc(s["kind"])}">'
            f'<Coords points="{pts}"/>'
            f"<TextEquiv><Unicode>{_esc(payload)}</Unicode></TextEquiv>"
            f"</TextRegion>"
        )
    for j, line in enumerate(baselines or []):
        pts = " ".join(f"{x},{y}" for (y, x) in line)
        # optional per-line height metadata, the reference's TextLine
        # custom="heights:h,0" convention read by get_baseline_median
        # (src/detect_paragraphs.py:44-55 — first digit group wins)
        custom = (
            f' custom="heights:{line_heights[j]},0"'
            if line_heights is not None and j < len(line_heights)
            else ""
        )
        out.append(
            f'<TextLine id="l{j + 1}"{custom}>'
            f'<Baseline points="{pts}"/></TextLine>'
        )
    out.append("</Page></PcGts>")
    return "\n".join(out)


def page_xml_baselines(xml: str) -> list[list[tuple[int, int]]]:
    """Baseline polylines as in-memory ``(y, x)`` point lists — the regex
    analogue of the reference's ``get_line_coords`` (HelperMethods.py:35-45),
    which iterates every ``Baseline`` element regardless of nesting and
    swaps ``"x,y"`` disk points to ``(y, x)``."""
    lines = []
    for pts in _BASELINE_RE.findall(xml):
        line = []
        for p in pts.split(" "):
            if not p:
                continue
            x, y = p.split(",")
            line.append((int(y), int(x)))
        lines.append(line)
    return lines


def page_xml_to_spans(xml: str) -> list[dict]:
    """Inverse of :func:`doc_to_page_xml` (parser analogue of
    ``get_coordinates_from_xml``, HelperMethods.py:116-139): returns spans in
    region-id order with offsets re-derived from emission order."""
    kinds = _KIND_RE.findall(xml)
    texts = [_unesc(t) for t in _TEXT_RE.findall(xml)]
    spans = []
    for i, (k, t) in enumerate(zip(kinds, texts)):
        is_media = k in ("image", "figure")
        spans.append(
            {
                "kind": k,
                "text": "" if is_media else t,
                "media_ref": t if is_media else "",
                "offset": i,
            }
        )
    return spans


def xml_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    spans = batch.column("spans").to_pylist()
    xmls = [doc_to_page_xml(i, s or []) for i, s in zip(ids, spans)]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "xml": pa.array(xmls, pa.string()),
            "n_regions": pa.array([len(s or []) for s in spans], pa.int64()),
        }
    )


def page_xml_export(sf_dir: str):
    """Extraction -> one PcGts string per document."""
    from ..pipelines.extract import extract_pipeline
    from ..sources.synth import docs_from_parquet

    return extract_pipeline(docs_from_parquet(sf_dir)).map_batches(
        xml_batch, batch_format="pyarrow"
    )
