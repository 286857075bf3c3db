"""LOD pyramid builder vs the NumPy downsample oracle (M2)."""

import numpy as np
import ray.data

from gdal_drivers_ray.grid import TILE
from gdal_drivers_ray.stages import pyramid as P


def _tiles_from_array(arr, lod, dtype="uint8"):
    ny, nx = arr.shape
    rows = []
    for ty in range(-(-ny // TILE)):
        for tx in range(-(-nx // TILE)):
            vw = min(TILE, nx - tx * TILE)
            vh = min(TILE, ny - ty * TILE)
            block = np.zeros((TILE, TILE), dtype=np.dtype(dtype))
            block[:vh, :vw] = arr[ty * TILE:ty * TILE + vh,
                                  tx * TILE:tx * TILE + vw]
            rows.append({"lod": lod, "band": 0, "tile_x": tx, "tile_y": ty,
                         "valid_w": vw, "valid_h": vh, "dtype": dtype,
                         "px": block.tobytes()})
    return ray.data.from_items(rows)


def _level_array(rows, lod, shape, dtype):
    out = np.zeros(shape, dtype=np.dtype(dtype))
    for r in rows:
        if r["lod"] != lod:
            continue
        a = np.frombuffer(r["px"], dtype=np.dtype(dtype)).reshape(TILE, TILE)
        tx, ty, vw, vh = r["tile_x"], r["tile_y"], r["valid_w"], r["valid_h"]
        out[ty * TILE:ty * TILE + vh, tx * TILE:tx * TILE + vw] = a[:vh, :vw]
    return out


def test_pyramid_matches_oracle(ray_session):
    rng = np.random.default_rng(5)
    base = rng.integers(0, 255, (1024, 1024), dtype=np.uint8)
    base_lod = 2  # 4x4 tiles of 256
    ds = P.build_pyramid(_tiles_from_array(base, base_lod), base_lod,
                         top_lod=0)
    rows = ds.take_all()
    want = P.pyramid_oracle(base, 2)
    got1 = _level_array(rows, 1, (512, 512), "uint8")
    got0 = _level_array(rows, 0, (256, 256), "uint8")
    np.testing.assert_array_equal(got1, want[1])
    np.testing.assert_array_equal(got0, want[2])
    # level tile counts shrink 4x
    assert sum(r["lod"] == 2 for r in rows) == 16
    assert sum(r["lod"] == 1 for r in rows) == 4
    assert sum(r["lod"] == 0 for r in rows) == 1


def test_pyramid_sparse_children_fill(ray_session):
    # only one child of the 2x2 present: the parent's other quadrants are
    # the fill value downsampled (i.e., fill itself)
    base = np.full((256, 256), 100, dtype=np.uint8)
    ds = ray.data.from_items([{
        "lod": 1, "band": 0, "tile_x": 0, "tile_y": 0,
        "valid_w": 256, "valid_h": 256, "dtype": "uint8",
        "px": base.tobytes()}])
    out = P.build_pyramid(ds, 1, top_lod=0, fill=0.0).take_all()
    parents = [r for r in out if r["lod"] == 0]
    assert len(parents) == 1
    a = np.frombuffer(parents[0]["px"], dtype=np.uint8).reshape(TILE, TILE)
    assert (a[:128, :128] == 100).all()
    assert (a[128:, :] == 0).all() and (a[:128, 128:] == 0).all()


def test_downsample2_truncates_like_reference():
    a = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    # mean 1.5 -> truncate to 1 (convertTo semantics)
    assert P.downsample2(a)[0, 0] == 1
