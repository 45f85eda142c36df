"""Raster map family (functions/rastermaps.py): M9 overlay, G10
separator stamping, G12 polygon rasterization with the axis-swap/clip
quirk, G11 exact-integer best dice, M10 baseline median, and the two
end-to-end pipelines (media_overlay, eval_raster_dice)."""

import numpy as np
import pytest

from layout_analysis_ray.functions.rastermaps import (
    PPM,
    baseline_median_x2,
    best_dice_ppm,
    eval_raster_dice,
    get_maps,
    media_overlay,
    overlay_rects,
    polygon_mask,
    polyline_mask,
    separator_img,
    spans_to_region_coords,
    symmetric_best_dice_ppm,
)

SF = "/root/testdata/sf0.001"


# --- kernels ---------------------------------------------------------------


def test_polygon_mask_rect_exact():
    # x in [2,5], y in [3,6] inclusive -> 4x4 = 16 px, boundary included
    m = polygon_mask(10, 10, [(2, 3), (5, 3), (5, 6), (2, 6)])
    assert m.sum() == 16
    assert m[3, 2] == 1 and m[6, 5] == 1
    assert m[2, 2] == 0 and m[7, 5] == 0


def test_polygon_mask_vs_naive_point_in_polygon():
    # convex + concave shapes checked against a naive even-odd ray cast
    shapes = [
        [(1, 1), (15, 1), (8, 12)],  # triangle
        [(1, 1), (15, 1), (15, 15), (8, 8), (1, 15)],  # concave chevron
    ]
    for poly in shapes:
        m = polygon_mask(18, 18, poly)
        p = np.array(poly, float)
        x0, y0 = p[:, 0], p[:, 1]
        x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
        for yy in range(18):
            for xx in range(18):
                cross = (y0 <= yy) != (y1 <= yy)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xs = x0 + (yy - y0) / (y1 - y0) * (x1 - x0)
                inside = (np.sum(cross & (xs > xx)) % 2) == 1
                if inside:  # interior must be filled (outline adds more)
                    assert m[yy, xx] == 1, (poly, yy, xx)


def test_polygon_mask_degenerate():
    assert polygon_mask(5, 5, []).sum() == 0
    assert polygon_mask(5, 5, [(2, 2)]).sum() == 1
    assert polygon_mask(5, 5, [(0, 0), (4, 4)]).sum() == 5  # line


def test_polyline_brush_width():
    # width-4 square brush: offsets -2..+1 -> 4x4 block for one point
    assert polyline_mask(10, 10, [(5, 5)], width=4).sum() == 16
    # clipping at the canvas edge loses pixels, like PIL
    assert polyline_mask(10, 10, [(0, 0)], width=4).sum() == 4


def test_separator_img_exact():
    img = np.zeros((4, 6), np.uint8)
    out = separator_img(img, [1, 3], 9)
    assert out is img  # in-place, returns the image (reference contract)
    assert (img[:, 1] == 9).all() and (img[:, 3] == 9).all()
    assert img.sum() == 9 * 8


def test_overlay_rects_marks_outline_only():
    plane = np.arange(100, dtype=np.uint8).reshape(10, 10)
    ov = overlay_rects(plane, [[(1, 1), (1, 8), (8, 8), (8, 1)]])
    changed = ov != plane
    assert changed.sum() > 0
    assert (ov[changed] == 255).all()
    # interior pixel far from the width-4 outline is untouched
    assert ov[5, 5] == plane[5, 5]
    # input plane not mutated (get_img_coords copies)
    assert plane[1, 1] == 11


def test_get_maps_swap_axes_quirk():
    # rect with y up to 50 on a 40-wide/20-tall canvas: swapped drawing
    # clips (the reference's transpose-and-clip quirk); natural drawing
    # clips differently — both deterministic
    poly = [(0, 0), (0, 15), (50, 15), (50, 0)]
    gt, res = get_maps([poly], [poly], 40, 20)
    assert res[0].shape == (20, 40)
    # arg/return crossing: first arg -> second return (reference quirk)
    assert (gt[0] == res[0]).all()
    swapped_px = res[0].sum()
    _, res_nat = get_maps([poly], [], 40, 20, swap_axes=False)
    assert res_nat[0].sum() != swapped_px


def test_best_dice_reference_conventions():
    one = np.zeros((4, 4), np.uint8)
    one[1:3, 1:3] = 1
    half = np.zeros((4, 4), np.uint8)
    half[1:3, 1:2] = 1
    assert best_dice_ppm([], []) == PPM
    assert best_dice_ppm([], [one]) == 0
    assert best_dice_ppm([one], []) == 0
    assert best_dice_ppm([one], [one]) == PPM
    assert best_dice_ppm([one], [half]) == 666_666  # 2*2/(4+2), floored
    # two all-zero maps: guarded 0 (reference raises ZeroDivisionError)
    z = np.zeros((4, 4), np.uint8)
    assert best_dice_ppm([z], [z]) == 0
    # asymmetry: every a-map picks its best b-map
    assert best_dice_ppm([one, half], [one]) != best_dice_ppm(
        [one], [one, half]
    )
    assert symmetric_best_dice_ppm([one], [half]) == 666_666


def test_spans_to_region_coords_order_and_content_sensitive():
    s = [
        {"kind": "t", "text": "abcdefgh", "media_ref": "", "offset": 0},
        {"kind": "p", "text": "xy", "media_ref": "", "offset": 1},
    ]
    swapped = [dict(s[0], offset=1), dict(s[1], offset=0)]
    assert spans_to_region_coords(s, 48, 64) != spans_to_region_coords(
        swapped, 48, 64
    )
    grown = [dict(s[0], text="abcdefgh" * 3), s[1]]
    assert spans_to_region_coords(s, 48, 64) != spans_to_region_coords(
        grown, 48, 64
    )


def test_baseline_median_x2_reference_semantics():
    # first digit group of each heights attr; 2x keeps even medians exact
    xml = (
        '<TextLine custom="heights:12,0"/>'
        '<TextLine custom="heights:20,7"/>'
        '<TextLine custom="heights:16,3"/>'
    )
    assert baseline_median_x2(xml) == 32
    even = (
        '<TextLine custom="heights:12,0"/>'
        '<TextLine custom="heights:20,7"/>'
    )
    assert baseline_median_x2(even) == 32  # even count: 12+20
    assert baseline_median_x2("<Page/>") == 0  # reference fallback 0


def test_planted_perturbation_lowers_dice():
    a = [
        {"kind": "t", "text": "hello world", "media_ref": "", "offset": 0},
        {"kind": "p", "text": "lorem ipsum dolor", "media_ref": "", "offset": 1},
    ]
    b = list(a)
    ca = spans_to_region_coords(a, 48, 64)
    cb = spans_to_region_coords(b, 48, 64)
    ma, mb = get_maps(ca, cb, 48, 64)
    assert symmetric_best_dice_ppm(ma, mb) == PPM
    # drop a span on one side -> dice falls below 1.0
    cb2 = spans_to_region_coords(b[:1], 48, 64)
    ma2, mb2 = get_maps(ca, cb2, 48, 64)
    assert symmetric_best_dice_ppm(ma2, mb2) < PPM


# --- pipelines -------------------------------------------------------------


@pytest.fixture(scope="module")
def overlay_df():
    return media_overlay(SF).to_pandas()


def test_media_overlay_schema_and_invariants(overlay_df):
    df = overlay_df
    assert len(df) > 0
    assert df.doc_id.is_unique
    assert (df.marked_px > 0).all()  # every doc draws something
    assert (df.baseline_median_x2 > 0).all()  # planted heights present
    assert (df.n_sep_cols.isin([1, 2])).all()  # two planted cols, may equal
    assert (df.marked_px <= df.width.astype("int64") * df.height).all()


def test_media_overlay_deterministic(overlay_df):
    again = media_overlay(SF).to_pandas()
    a = overlay_df.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_eval_raster_dice_discriminates():
    df = eval_raster_dice(SF).to_pandas()
    assert len(df) == 500  # every sf0.001 doc scored
    assert (df.raster_dice_ppm <= PPM).all()
    assert (df.raster_dice_ppm >= 0).all()
    # strategies agree on most docs, differ on some — both sides present
    assert (df.raster_dice_ppm == PPM).sum() > 100
    assert (df.raster_dice_ppm < PPM).sum() > 50
