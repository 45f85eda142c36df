"""Unit tests for the quirk-exact block algorithms (SURVEY.md §2.7, §7.3)."""

from layout_analysis_ray import conformance as C


# --- postprocess_rects (reference Postprocessing.py:30-57) -----------------

def test_postprocess_drops_small():
    rects = [(0, 0, 50, 500), (100, 0, 400, 400)]  # first is thin (w<75)
    assert C.postprocess_rects(rects) == [1]


def test_postprocess_drops_nested_with_tolerance():
    outer = (0, 0, 1000, 1000)
    inner = (-5, -5, 1004, 1004)  # inside outer only thanks to the +-10 tolerance
    # Containment is mutual within the tolerance, and the rect1-inside-rect2
    # branch is checked first, so the FIRST rect is dropped in either order.
    assert C.postprocess_rects([inner, outer]) == [1]
    assert C.postprocess_rects([outer, inner]) == [1]
    # Strictly nested without tolerance help: inner always dropped.
    inner2 = (200, 200, 800, 800)
    assert C.postprocess_rects([outer, inner2]) == [0]


def test_postprocess_trailing_small_survives():
    # The outer loop is range(len-1): a small rect in last position is never
    # examined as rect1 and survives if nothing drops it as rect2 — except
    # the small-rect2 branch drops it.  A small rect alone survives.
    assert C.postprocess_rects([(0, 0, 10, 10)]) == [0]
    # Small rect first, nothing after it that is live -> dropped via rect1
    # branch when a live rect2 exists.
    assert C.postprocess_rects([(0, 0, 10, 10), (100, 100, 900, 900)]) == [1]
    # Small rect LAST: dropped by the rect2 branch of the first rect's scan.
    assert C.postprocess_rects([(100, 100, 900, 900), (0, 0, 10, 10)]) == [0]


def test_postprocess_two_small_rects():
    # rect1 small -> dropped (live rect2 exists); rect2 then has nothing
    # after it -> survives.  Quirk preserved from the reference scan order.
    assert C.postprocess_rects([(0, 0, 10, 10), (20, 20, 40, 40)]) == [1]


# --- merge_rects (reference merge_vertical_paragraphs.py:22-98) ------------

def test_merge_vertical_stack():
    a = (100, 0, 500, 100)
    b = (100, 150, 500, 260)   # y-gap 50 < 100, same x-range
    c = (100, 1000, 500, 1100)  # far below: not merged
    out = C.merge_rects([a, b, c])
    assert len(out) == 2
    assert out[0][0] == (100, 0, 500, 260)
    assert sorted(out[0][1]) == [0, 1]
    assert out[1][0] == c


def test_merge_requires_similar_width():
    a = (100, 0, 500, 100)
    b = (100, 150, 1500, 260)  # x-overlap of shorter = 1.0 but width ratio < 0.6
    out = C.merge_rects([a, b])
    assert len(out) == 2


def test_merge_both_axis_overlap():
    a = (100, 100, 500, 500)
    b = (120, 120, 520, 520)  # >0.8 overlap both axes
    out = C.merge_rects([a, b])
    assert len(out) == 1
    assert out[0][0] == (100, 100, 520, 520)


def _straddler_group(ox, oy):
    """a1 straddles the gap between a2 and a3; a2+a3 merge into a union that
    strictly contains a1, but a1 itself merges with neither individually
    (width ratio blocks branch 1, y-overlap blocks branch 2).  Pass 1 appends
    a1 before the union exists -> pass 2 must containment-drop it."""
    a1 = (200 + ox, 190 + oy, 300 + ox, 270 + oy)
    a2 = (100 + ox, 100 + oy, 500 + ox, 200 + oy)
    a3 = (100 + ox, 260 + oy, 500 + ox, 360 + oy)
    union = (100 + ox, 100 + oy, 500 + ox, 360 + oy)
    return [a1, a2, a3], a1, union


def test_merge_pass2_containment():
    rects, a1, union = _straddler_group(0, 0)
    out = C.merge_rects(rects)
    assert [o[0] for o in out] == [union]


def test_merge_pass2_break_quirk():
    # Pass 2 aborts the outer scan after the first contained rect1
    # (reference merge_vertical_paragraphs.py:94 `break`): a second
    # contained rect further down the list is NOT cleaned up.
    ra, a1, union_a = _straddler_group(0, 0)
    rb, b1, union_b = _straddler_group(5000, 5000)
    out = C.merge_rects(ra + rb)
    rects = [o[0] for o in out]
    assert a1 not in rects           # first straddler dropped in pass 2
    assert b1 in rects               # second survives thanks to the break
    assert union_a in rects and union_b in rects


def test_merge_restart_inner_scan():
    # a merges with b; restart (index2=0) lets the grown rect then absorb c,
    # which was not mergeable with a alone (y-gap from a is >= 100).
    a = (100, 0, 500, 100)
    b = (100, 150, 500, 250)
    c = (100, 320, 500, 420)   # gap to b' bottom = 70 < 100 after merge
    out = C.merge_rects([a, b, c])
    assert len(out) == 1
    assert out[0][0] == (100, 0, 500, 420)


# --- xycut_order -----------------------------------------------------------

def test_xycut_title_then_columns():
    title = (200, 80, 1500, 160)
    l1 = (100, 250, 800, 500)
    l2 = (100, 600, 800, 900)
    r1 = (900, 250, 1600, 500)
    r2 = (900, 600, 1600, 900)
    # shuffled input order
    rects = [r2, l1, title, r1, l2]
    order = C.xycut_order(rects)
    assert [rects[i] for i in order] == [title, l1, l2, r1, r2]


def test_xycut_no_gaps_raster_order():
    a = (0, 0, 100, 100)
    b = (50, 50, 150, 150)  # overlapping: no cut; sort by (y0, x0)
    rects = [b, a]
    assert [rects[i] for i in C.xycut_order(rects)] == [a, b]


def test_xycut_single():
    assert C.xycut_order([(0, 0, 10, 10)]) == [0]
    assert C.xycut_order([]) == []


# --- scalar predicates -----------------------------------------------------

def test_overlap_1d():
    assert C.overlap_1d(0, 10, 5, 15) == 0.5
    assert C.overlap_1d(0, 10, 20, 30) == 0.0
    assert C.overlap_1d(0, 100, 10, 20) == 1.0


def test_is_inside_tolerance():
    assert C.is_inside(0, 10, 0, 10, 0, 10, 0, 10)          # self, via tolerance
    assert C.is_inside(-5, 105, -5, 105, 0, 100, 0, 100)    # slightly larger ok
    assert not C.is_inside(-15, 10, 0, 10, 0, 100, 0, 100)  # beyond tolerance


def test_is_small():
    assert C.is_small(0, 74, 0, 100)
    assert C.is_small(0, 100, 0, 24)
    assert not C.is_small(0, 75, 0, 25)


def test_cluster_order_same_set_different_order():
    from layout_analysis_ray.stages.strategies import cluster_order, get_strategy
    from layout_analysis_ray.conformance import xycut_order

    # two close columns (gap 80 <= CLUSTER_EPS) + a far-away footer block
    rects = [
        (100, 200, 700, 400),   # left col top
        (100, 500, 700, 700),   # left col bottom
        (780, 200, 1400, 400),  # right col top
        (780, 500, 1400, 700),  # right col bottom
        (100, 2000, 1500, 2200),  # distant wide footer
    ]
    xy = xycut_order(rects)
    cl = cluster_order(rects)
    assert sorted(xy) == sorted(cl) == list(range(5))  # same block set
    # cluster strategy: the 4 near blocks form one cluster read in raster
    # order (row-major); the footer is its own cluster last.  xycut reads
    # the same 4 column-major — the orders differ, the sets do not.
    assert cl == [0, 2, 1, 3, 4]
    assert xy[:4] == [0, 1, 2, 3]
    assert get_strategy("xycut") is xycut_order
    import pytest
    with pytest.raises(ValueError):
        get_strategy("nope")


def test_flood_order_same_set_basin_growth():
    from layout_analysis_ray.stages.strategies import flood_order

    rects = [
        (100, 200, 700, 400),   # left col top (seed: raster-first)
        (100, 500, 700, 700),   # left col bottom (gap 100 from seed)
        (780, 200, 1400, 400),  # right col top (gap 80 from seed)
        (780, 500, 1400, 700),  # right col bottom
        (100, 2000, 1500, 2200),  # distant footer: own basin
    ]
    fl = flood_order(rects)
    assert sorted(fl) == list(range(5))  # same block set
    # basin grows nearest-first from the seed: right-top (80) before
    # left-bottom (100); the footer exceeds FLOOD_EPS and seeds basin 2
    assert fl == [0, 2, 1, 3, 4]
    assert flood_order([]) == []
    # far-apart singles: each its own basin, raster order
    singles = [(0, 900, 10, 910), (0, 0, 10, 10), (900, 450, 910, 460)]
    assert flood_order(singles) == [1, 2, 0]


def test_pipeline_order_strategy_param(ray_session):
    import ray.data as rd

    from layout_analysis_ray.pipelines.extract import extract_pipeline
    from layout_analysis_ray.sources.synth import gen_table

    tbl = gen_table(32)
    a = {r["doc_id"]: tuple((s["kind"], s["text"]) for s in r["spans"])
         for b in extract_pipeline(rd.from_arrow(tbl)).iter_batches(batch_format="pyarrow")
         for r in b.to_pylist()}
    c = {r["doc_id"]: tuple((s["kind"], s["text"]) for s in r["spans"])
         for b in extract_pipeline(rd.from_arrow(tbl), order_strategy="cluster").iter_batches(batch_format="pyarrow")
         for r in b.to_pylist()}
    assert set(a) == set(c)
    # same span multiset per doc (order may differ for pdf docs)
    for d in a:
        assert sorted(a[d]) == sorted(c[d])


def test_assemble_handles_unsorted_span_order(ray_session):
    """The batch-wide sortedness fast path must not change results when
    spans arrive OUT of source order (fixtures always emit sorted offsets,
    so this exercises the argsort branch explicitly)."""
    import numpy as np
    import pyarrow as pa

    from layout_analysis_ray.sources.synth import gen_table
    from layout_analysis_ray.stages.assemble import assemble_batch
    from layout_analysis_ray.stages.score import SpanScorer

    t = gen_table(48, seed=7)
    rng = np.random.default_rng(3)

    # permute spans WITHIN each doc (offsets keep their values)
    rows = t.to_pylist()
    shuffled = []
    for r in rows:
        spans = list(r["spans"] or [])
        perm = rng.permutation(len(spans))
        shuffled.append({"doc_id": r["doc_id"], "spans": [spans[i] for i in perm]})
    t_shuf = pa.Table.from_pylist(shuffled, schema=t.schema)

    scorer = SpanScorer()
    out_sorted = assemble_batch(scorer(t)).to_pylist()
    out_shuf = assemble_batch(scorer(t_shuf)).to_pylist()
    assert out_sorted == out_shuf


def test_assemble_trailing_empty_doc_preserves_last_span(ray_session):
    """Regression: a TRAILING empty doc must not corrupt the preceding
    doc's batch-wide segment reductions (the clamped-reduceat bug dropped
    the last span from sortedness/any-pdf checks, so a malformed pdf span
    in last position lost its error flag)."""
    import pyarrow as pa

    from layout_analysis_ray import oracle
    from layout_analysis_ray.sources.synth import DOCS_SCHEMA
    from layout_analysis_ray.stages.assemble import assemble_batch
    from layout_analysis_ray.stages.score import SpanScorer

    rows = [
        {
            "doc_id": "d0",
            "spans": [
                {"kind": "html", "text": "<p></p>", "media_ref": "", "offset": 0},
                {"kind": "text", "text": "", "media_ref": "", "offset": 1},
                {"kind": "pdf_block", "text": '{"x0": 1', "media_ref": "", "offset": 2},
            ],
        },
        {"doc_id": "d1", "spans": []},
    ]
    t = pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)
    out = assemble_batch(SpanScorer()(t)).to_pylist()
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in out
    }
    for r in rows:
        assert got[r["doc_id"]] == oracle.extract_doc(r["spans"])
