"""Raster skew family (stages/raster.py): A2 estimate quirks, G5 plane
rotation geometry, G8 point/pixel consistency, and the end-to-end
media_deskew pipeline recovering planted angles."""

import math

import numpy as np

from layout_analysis_ray.stages.raster import (
    _planted_baselines,
    estimate_skew,
    media_deskew,
    rotate_plane,
    rotate_points,
)


def test_estimate_skew_reference_quirks():
    # single baseline: top-half filter keeps int(1/2)=0 lines -> angle 0
    assert estimate_skew([[(0, 0), (10, 10)]]) == 0.0
    # empty input
    assert estimate_skew([]) == 0.0
    # horizontal endpoints contribute (0, 0); vertical endpoints are the
    # documented deviation (reference would divide by zero)
    assert estimate_skew([[(5, 0), (5, 9)], [(0, 3), (9, 3)]]) == 0.0
    # two equal lines at 45 deg: top half keeps ONE, mean = 45
    lines = [[(0, 0), (10, 10)], [(0, 0), (10, 10)]]
    assert estimate_skew(lines) == 45.0
    # the long line dominates: 4 lines, top half = 2 longest
    lines = [
        [(0, 0), (20, 20)],  # 45 deg, long
        [(0, 0), (18, 18)],  # 45 deg, long
        [(0, 0), (1, 10)],  # shallow, short
        [(2, 2), (2, 4)],  # horizontal stub
    ]
    assert estimate_skew(lines) == 45.0


def test_rotate_plane_pinned_geometry():
    img = np.arange(25, dtype=np.uint8).reshape(5, 5)
    assert np.array_equal(rotate_plane(img, 0.0), img)
    assert np.array_equal(rotate_plane(img, 90.0), np.rot90(img))
    assert np.array_equal(rotate_plane(img, -90.0), np.rot90(img, -1))
    assert np.array_equal(rotate_plane(img, 180.0), np.rot90(img, 2))
    # shape preserved (reshape=False) and fill is 0 outside the source
    r = rotate_plane(img, 45.0)
    assert r.shape == img.shape and r.dtype == img.dtype


def test_rotate_points_tracks_pixels():
    """A bright pixel's coordinates under rotate_points must land on the
    bright pixel in the rotated plane (center-based self-consistency)."""
    for deg in (17.0, -33.0, 90.0):
        img = np.zeros((21, 31), dtype=np.uint8)
        y, x = 4, 24
        # a 2x2 block: single pixels can vanish under nearest-neighbor
        # inverse sampling (not surjective), a block cannot
        img[y : y + 2, x : x + 2] = 255
        rot = rotate_plane(img, deg)
        ny, nx = rotate_points(np.array([[y + 0.5, x + 0.5]]), deg, img.shape)[0]
        assert rot[int(round(ny)), int(round(nx))] == 255, deg


def test_rotate_points_straightens_planted_slope():
    """Rotating by the estimated angle makes a planted-slope baseline
    horizontal — the deskew contract."""
    theta = 7.0
    slope = math.tan(math.radians(theta))
    lines = [
        [(10, 2), (10 + round(30 * slope), 32)],
        [(20, 2), (20 + round(30 * slope), 32)],
    ]
    ang = estimate_skew(lines)
    assert abs(ang - theta) < 1.0
    pts = np.asarray(lines[0], dtype=np.float64)
    out = rotate_points(pts, ang, (64, 64))
    assert abs(out[0, 0] - out[1, 0]) < 1e-6  # same y after deskew


def test_media_deskew_recovers_planted_angles(ray_session):
    rows = media_deskew(
        "/root/testdata/sf0.001", concurrency=(1, 2)
    ).take_all()
    assert len(rows) > 100
    import hashlib

    errs = []
    for r in rows:
        dig = hashlib.sha256(r["media_ref"].encode()).digest()
        planted = (dig[3] % 21) - 10
        err = abs(r["skew_mdeg"] / 1000.0 - planted)
        errs.append(err)
        # endpoint rounding on 16-px-wide planes quantizes the slope by up
        # to atan(0.5/12) ~ 2.4 deg per line — envelope accordingly
        assert err < 2.5, r["media_ref"]
        assert r["unskew_mdeg"] == -r["skew_mdeg"]
        assert r["n_baselines"] == 4  # 3 planted + 1 distractor
        assert r["width"] >= 16 and r["height"] >= 16
    assert sum(errs) / len(errs) < 1.0  # quantization noise, no bias


def test_planted_baselines_distractor_is_dropped():
    lines, angle = _planted_baselines("img://x", 60, 60)
    assert len(lines) == 4
    assert abs(estimate_skew(lines) - angle) < 1.5
