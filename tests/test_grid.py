"""Unit + property tests for the pure tile-grid core (SURVEY.md §2.7, §7.1).

Goldens are hand-computed from the reference formulas (file:line cited in
gdal_drivers_ray/grid.py docstrings).
"""

import math

import numpy as np
import pytest
from hypothesis import given, strategies as st

from gdal_drivers_ray import grid
from gdal_drivers_ray.grid import Extents


# --- extents <-> geotransform (solid.cpp:334-347) ---

def test_extents_to_gt_roundtrip():
    e = Extents(10.0, 20.0, 110.0, 220.0)
    gt = grid.extents_to_gt(e, 100, 200)
    assert gt == (10.0, 1.0, 0.0, 220.0, 0.0, -1.0)
    back = grid.gt_to_extents(gt, 100, 200)
    assert back == e


def test_gt_resolution_and_orthogonal():
    gt = (0.0, 2.0, 0.0, 0.0, 0.0, -3.0)
    assert grid.gt_resolution(gt) == (2.0, 3.0)
    assert grid.is_orthogonal(gt)
    assert not grid.is_orthogonal((0, 2, 0.5, 0, 0, -3))


def test_raster_extents_corners():
    gt = (100.0, 1.0, 0.0, 50.0, 0.0, -0.5)
    e = grid.raster_extents(gt, 10, 20)
    assert e == Extents(100.0, 40.0, 110.0, 50.0)


# --- align (blender.cpp:416-429) ---

def test_align_extents_snaps_outward():
    e = Extents(0.3, 0.2, 9.7, 9.9)
    a = grid.align_extents(e, (0.0, 0.0), (1.0, 1.0))
    assert a == Extents(0.0, 0.0, 10.0, 10.0)


def test_align_extents_idempotent():
    e = Extents(0.25, -3.5, 7.75, 2.5)
    a = grid.align_extents(e, (0.25, 0.5), (0.25, 0.5))
    assert grid.align_extents(a, (0.25, 0.5), (0.25, 0.5)) == a


@given(st.floats(-1e6, 1e6), st.floats(-1e6, 1e6),
       st.floats(0.1, 100), st.floats(0.1, 100))
def test_align_idempotence_property(llx, lly, w, h):
    e = Extents(llx, lly, llx + w, lly + h)
    a = grid.align_extents(e, (0.0, 0.0), (1.0, 1.0))
    assert grid.align_extents(a, (0.0, 0.0), (1.0, 1.0)) == a


# --- rounding (blender.cpp:452-454 std::round = half away from zero) ---

@pytest.mark.parametrize("v,want", [(0.5, 1), (1.5, 2), (2.5, 3), (-0.5, -1),
                                    (-1.5, -2), (0.49, 0), (-0.49, 0)])
def test_round_half_away(v, want):
    assert grid.round_half_away(v) == want


# --- Locator (blender.cpp:226-238) ---

def test_locator_basic():
    loc = grid.locate((256, 256, 256, 256), (200, 300, 500, 100))
    assert loc.roi == (256, 300, 256, 100)
    assert loc.local == (56, 0, 256, 100)
    assert loc.view == (0, 44, 256, 100)


def test_locator_disjoint_is_none():
    assert grid.locate((0, 0, 256, 256), (300, 300, 10, 10)) is None
    # touching edge = empty intersection
    assert grid.locate((0, 0, 256, 256), (256, 0, 10, 10)) is None


# --- LOD pyramids (solid.cpp:352-369, mask.cpp:199-211) ---

def test_overview_sizes_halving():
    # 1000x600: halve -> 500x300 (500 >= 256 -> keep), halve -> 250x150
    # (both < 256 -> stop); reference keeps while either dim >= tileSize
    assert grid.overview_sizes(1000, 600) == [(500, 300)]
    assert grid.overview_sizes(2048, 2048) == [(1024, 1024), (512, 512), (256, 256)]
    # round-half-away halving: 1001 -> 501 (round(500.5) = 501)
    assert grid.overview_sizes(1001, 100)[0] == (501, 50)


def test_level_size_shift():
    assert grid.level_size(4096, 4096, 3, 4) == (2048, 2048)
    assert grid.level_size(4096, 4096, 4, 4) == (4096, 4096)


def test_tile_pixel_window():
    # mask.cpp:225-233: tile (x, y) at tail t covers [x*256<<t, ...)
    assert grid.tile_pixel_window(2, 1, 2) == (2048, 1024, 1024, 1024)


def test_num_tiles_ceil():
    assert grid.num_tiles(512, 512) == (2, 2)
    assert grid.num_tiles(513, 255) == (3, 1)


# --- morton / cell ids ---

def test_morton_roundtrip_vec():
    xs = np.array([0, 1, 2, 12345, (1 << 29) - 1], dtype=np.uint64)
    ys = np.array([0, 1, 3, 54321, (1 << 29) - 1], dtype=np.uint64)
    m = grid.morton2(xs, ys)
    rx, ry = grid.unmorton2(m)
    assert (rx == xs).all() and (ry == ys).all()


def test_morton_locality_order():
    # quadrant order: (0,0) < (1,0) < (0,1) < (1,1)
    vals = [int(grid.morton2(x, y)) for x, y in [(0, 0), (1, 0), (0, 1), (1, 1)]]
    assert vals == [0, 1, 2, 3]


def test_cell_parent():
    cid = grid.cell_id(3, 5, 6)
    parent = grid.cell_parent(cid)
    assert parent == grid.cell_id(2, 2, 3)


def test_pack_unpack_zxy():
    z, y, x = grid.unpack_zxy(grid.pack_zxy(7, 100, 200))
    assert (int(z), int(x), int(y)) == (7, 100, 200)


def test_tile_of_points_edges():
    e = Extents(0.0, 0.0, 1024.0, 1024.0)
    tx, ty = grid.tile_of_points([0.0, 1023.9, 512.0], [1023.9, 0.0, 512.0], e, 2)
    # top-left world corner -> tile (0, 0); bottom-right -> (3, 3)
    assert list(tx) == [0, 3, 2]
    assert list(ty) == [0, 3, 2]
    # far-edge clamp
    tx, ty = grid.tile_of_points([1024.0], [0.0], e, 2)
    assert (int(tx[0]), int(ty[0])) == (3, 3)


# --- TMS flip + key parse (detail/mbtiles.cpp:63-155) ---

def test_tms_flip_involution():
    z = np.array([3, 3, 5])
    r = np.array([0, 7, 13])
    assert (grid.tms_flip(z, grid.tms_flip(z, r)) == r).all()


@pytest.mark.parametrize("key,want", [
    ("14-8936-5722", (14, 8936, 5722)),
    ("0-0-0", (0, 0, 0)),
    ("1-01-0", None),       # leading zero on multi-digit
    ("1-+1-0", None),       # sign
    ("1--1-0", None),
    ("1-2", None),
    ("1-2-3-4", None),
    ("a-2-3", None),
    ("1-2-", None),
])
def test_parse_tile_key_strict(key, want):
    assert grid.parse_tile_key(key) == want


def test_tile_key_bounds():
    assert grid.tile_key_in_bounds(3, 7, 7)
    assert not grid.tile_key_in_bounds(3, 8, 0)


# --- zigzag + commands (mvt.cpp:171-179, 241-244) ---

@given(st.integers(-(2 ** 31), 2 ** 31 - 1))
def test_zigzag_roundtrip(v):
    assert int(grid.unzigzag(grid.zigzag(v))) == v


def test_zigzag_known_values():
    assert [int(grid.zigzag(v)) for v in (0, -1, 1, -2, 2)] == [0, 1, 2, 3, 4]


def test_command_codec():
    raw = grid.command_pack(grid.CMD_MOVE_TO, 5)
    t, c = grid.command_unpack(raw)
    assert (int(t), int(c)) == (1, 5)


# --- MVT trafo + winding (mvt.cpp:62-93, 388) ---

def test_mvt_trafo_with_extents():
    sx, sy, shx, shy = grid.mvt_trafo(4096, Extents(0, 0, 100, 200))
    assert (sx, sy, shx, shy) == (100 / 4096, -200 / 4096, 0.0, 200.0)
    # local (0,0) -> world upper-left
    assert (0 * sx + shx, 0 * sy + shy) == (0.0, 200.0)
    # local (4096,4096) -> world lower-right
    assert (4096 * sx + shx, 4096 * sy + shy) == (100.0, 0.0)


def test_mvt_trafo_normalized():
    sx, sy, shx, shy = grid.mvt_trafo(4096, None)
    assert (sx, sy, shx, shy) == (1 / 4096, -1 / 4096, 0.0, 1.0)


def test_winding():
    # counter-clockwise square (y-up): positive area
    assert not grid.is_clockwise([0, 1, 1, 0], [0, 0, 1, 1])
    assert grid.is_clockwise([0, 0, 1, 1], [0, 1, 1, 0])


@given(st.integers(0, 7))
def test_winding_rotation_invariance(k):
    xs = np.array([0, 2, 3, 2, 0, -1, -2, -1], dtype=float)
    ys = np.array([0, 0, 1, 3, 4, 3, 2, 1], dtype=float)
    assert grid.is_clockwise(np.roll(xs, k), np.roll(ys, k)) == grid.is_clockwise(xs, ys)


# --- blend weights (blender.cpp:590-624) ---

def test_blend_weights_no_overlap_containment():
    w = grid.blend_weights((0, 0, 4, 4), (1.0, 1.0, 2.0, 2.0), (0, 0))
    want = np.zeros((4, 4))
    want[1:3, 1:3] = 1.0  # pixel centers 1.5, 2.5 inside [1, 3)
    assert (w == want).all()


def test_blend_weights_overlap_matches_bruteforce():
    roi = (3, 5, 6, 4)
    valid = (2.5, 4.25, 5.0, 3.5)
    overlap = (2, 3)
    got = grid.blend_weights(roi, valid, overlap)
    # brute force per-pixel rect intersection, as the reference loops do
    kernel_area = 4.0 * overlap[0] * overlap[1]
    for j in range(roi[3]):
        for i in range(roi[2]):
            kx = roi[0] + i + 0.5 - overlap[0]
            ky = roi[1] + j + 0.5 - overlap[1]
            ix = max(0.0, min(valid[0] + valid[2], kx + 2 * overlap[0]) - max(valid[0], kx))
            iy = max(0.0, min(valid[1] + valid[3], ky + 2 * overlap[1]) - max(valid[1], ky))
            assert got[j, i] == pytest.approx(ix * iy / kernel_area)


def test_blend_weights_full_inside_is_one():
    w = grid.blend_weights((10, 10, 2, 2), (0.0, 0.0, 100.0, 100.0), (3, 3))
    assert np.allclose(w, 1.0)


def test_blend_weights_one_axis_zero_overlap():
    """An anisotropic resolution can round ONE overlap axis to 0: weights
    must be the ramp x membership limit, never NaN/inf."""
    import numpy as np

    from gdal_drivers_ray.grid import blend_weights

    w = blend_weights((0, 0, 4, 4), (0.5, 0.5, 3.0, 3.0), (0, 2))
    assert np.isfinite(w).all()
    assert (w >= 0).all() and (w <= 1).all()
    # x axis is pure membership (0.5 <= cx < 3.5), y axis ramps
    assert w[1, 0] == w[1, 1] and w[1, 0] > 0


def test_parse_tile_key_rejects_unicode_digits():
    from gdal_drivers_ray.grid import parse_tile_key

    assert parse_tile_key("5-²-3") is None      # superscript 2
    assert parse_tile_key("٥-1-2") is None      # Arabic-Indic five
    assert parse_tile_key("5-2-3") == (5, 2, 3)
