"""Public batch API — the engine's counterpart of the reference's Python
bindings (python/gdaldriversmodule.cpp:249-276: BlendingDataset(config)
.read(type, withMask) / .warp(extents, srs, size, ...)).

`read_raster` is the S15 sink (gdaldriversmodule.cpp:126-158 readDataset):
materialize a (small) tile Dataset into one ndarray (+validity mask). It is
deliberately a SINK for small results — e.g. one warped region, a test
golden — not a pipeline stage; 100 TB rasters stay as tile Datasets.

`warp` re-exports the S16 stage (stages/warp.py) so the common flow reads:

    tiles = open_dataset(conf)                      # registry probe
    out = warp(tiles, src_grid, dst_grid, "bilinear")
    arr, mask = read_raster(out, dst_grid, nodata=0.0)
"""

from __future__ import annotations

import numpy as np
import ray.data

from .grid import TILE
from .registry import open_dataset  # noqa: F401  (re-export)
from .sources.mbtiles import (  # noqa: F401  (archive I/O re-exports)
    lookup_mbtiles, lookup_mbtiles_sharded, merge_mbtiles,
    write_mbtiles_shards)
from .stages.warp import RasterGrid, transform_points, warp_tiles  # noqa: F401

warp = warp_tiles


def read_images(path: str, **kwargs) -> ray.data.Dataset:
    """Input-table reader seam (BASELINE input_hint names a Lance table of
    image+caption rows). Dispatch is by PATH, not by what happens to be
    importable: a `.lance` dataset goes through `ray.data.read_lance`
    (raising a clear ImportError when the lance package is absent — this
    container ships parquet only, never a silent parquet fallback on a
    Lance path), anything else reads as parquet. Every pipeline that
    opens the input table goes through here, so swapping the storage
    format is a path change, not a code change."""
    if str(path).rstrip("/").endswith(".lance"):
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise ImportError(
                f"{path!r} is a Lance dataset but the `lance` package is "
                "not installed in this environment; install pylance or "
                "point read_images at the parquet mirror") from e
        return ray.data.read_lance(path, **kwargs)
    return ray.data.read_parquet(path, **kwargs)


def to_rasterio(tiles: ray.data.Dataset, grid: RasterGrid, path: str, *,
                band: int = 0, nodata: float = 0.0):
    """S17 interop sink: assemble a (small) tile Dataset and write a
    GeoTIFF through rasterio — the engine analog of the reference's
    rasterio handoff (python/gdaldriversmodule.cpp:87-124, incl. its
    version guard: a missing/old rasterio raises ImportError, it never
    half-writes)."""
    try:
        import rasterio
        from rasterio.transform import from_bounds
    except ImportError as e:
        raise ImportError("rasterio is not available in this environment; "
                          "to_rasterio is the optional S17 interop sink") \
            from e
    arr = read_raster(tiles, grid, band=band, nodata=nodata)
    e = grid.extents
    with rasterio.open(
            path, "w", driver="GTiff", height=grid.ny, width=grid.nx,
            count=1, dtype="float64", nodata=nodata,
            crs=grid.srs if grid.srs != "local" else None,
            transform=from_bounds(e.llx, e.lly, e.urx, e.ury,
                                  grid.nx, grid.ny)) as dst:
        dst.write(arr, 1)
    return path


def open_gdal(path: str):
    """S17 interop source: open a path through osgeo.gdal when present
    (gdaldriversmodule.cpp:87-103 openGdal, version-guarded)."""
    try:
        from osgeo import gdal
    except ImportError as e:
        raise ImportError("osgeo/gdal is not available in this "
                          "environment; open_gdal is the optional S17 "
                          "interop source") from e
    return gdal.Open(path)


def read_raster(tiles: ray.data.Dataset, grid: RasterGrid, *,
                band: int = 0, nodata: float = 0.0,
                with_mask: bool = False):
    """Assemble a TILE_SCHEMA Dataset into a full (ny, nx) float64 ndarray.

    Tiles absent from the dataset read as `nodata` (mask 0). Only rows of
    `band` at lod 0 are read; the pull is column-pruned before take."""
    from .stages.warp import _np_dtype

    out = np.full((grid.ny, grid.nx), nodata, dtype=np.float64)
    mask = np.zeros((grid.ny, grid.nx), dtype=np.uint8)

    cols = [c for c in ("lod", "band", "tile_x", "tile_y", "valid_w",
                        "valid_h", "dtype", "px")
            if c in tiles.schema().names]
    for r in tiles.select_columns(cols).take_all():
        if r.get("band", 0) != band or r.get("lod", 0) != 0:
            continue
        a = np.frombuffer(r["px"], dtype=_np_dtype(r["dtype"]))
        a = a.reshape(TILE, TILE).astype(np.float64)
        tx, ty = r["tile_x"], r["tile_y"]
        vw = min(r.get("valid_w", TILE), grid.nx - tx * TILE)
        vh = min(r.get("valid_h", TILE), grid.ny - ty * TILE)
        if vw <= 0 or vh <= 0:
            continue
        out[ty * TILE:ty * TILE + vh, tx * TILE:tx * TILE + vw] = a[:vh, :vw]
        mask[ty * TILE:ty * TILE + vh, tx * TILE:tx * TILE + vw] = 1
    if with_mask:
        return out, mask
    return out
