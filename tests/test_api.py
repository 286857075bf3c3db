"""Public API facade: open -> warp -> read (S15/S16 parity surface)."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_drivers_ray import api
from gdal_drivers_ray.grid import Extents
from gdal_drivers_ray.sources import solid


def test_open_warp_read_flow(ray_session):
    spec = solid.SolidSpec(srs="EPSG:4326", size=(512, 512),
                           extents=Extents(-60.0, -30.0, 60.0, 30.0),
                           bands=[solid.Band(9.0, "Byte")])
    tiles = api.open_dataset(solid.write_config(spec),
                             include_overviews=False)
    sg = api.RasterGrid(spec.extents, "EPSG:4326", 512, 512)

    mx0, mx1 = api.transform_points([-60.0, 60.0], [0.0, 0.0],
                                    "EPSG:4326", "EPSG:3857")[0]
    my0, my1 = api.transform_points([0.0, 0.0], [-30.0, 30.0],
                                    "EPSG:4326", "EPSG:3857")[1]
    dg = api.RasterGrid(Extents(float(mx0), float(my0),
                                float(mx1), float(my1)),
                        "EPSG:3857", 300, 300)
    out = api.warp(tiles, sg, dg, resampling="nearest", nodata=-1.0)
    arr, mask = api.read_raster(out, dg, nodata=-1.0, with_mask=True)
    # the whole target grid lies inside the source: fully valid, constant 9
    assert mask.all()
    np.testing.assert_array_equal(arr, np.full((300, 300), 9.0))


def test_read_raster_fills_missing_with_nodata(ray_session):
    spec = solid.SolidSpec(srs="local", size=(512, 256),
                           extents=Extents(0, 0, 512, 256),
                           bands=[solid.Band(5.0, "Byte")])
    tiles = api.open_dataset(solid.write_config(spec),
                             include_overviews=False)
    # grid larger than the data: right half missing -> nodata, mask 0
    g = api.RasterGrid(Extents(0, 0, 1024, 256), "local", 1024, 256)
    arr, mask = api.read_raster(tiles, g, nodata=-9.0, with_mask=True)
    assert (arr[:, :512] == 5.0).all() and mask[:, :512].all()
    assert (arr[:, 512:] == -9.0).all() and not mask[:, 512:].any()


def test_read_images_seam_falls_back_to_parquet(ray_session, tmp_path):
    """S17/read_lance seam: without the lance package the reader transparently
    opens parquet; pipelines depend only on the seam, not the format."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gdal_drivers_ray.api import read_images

    p = str(tmp_path / "imgs.parquet")
    pq.write_table(pa.table({"image_id": ["a", "b"],
                             "caption": ["x", "y"]}), p)
    ds = read_images(p)
    assert ds.count() == 2
    assert set(ds.schema().names) == {"image_id", "caption"}


def test_interop_sinks_guard_missing_libs(ray_session):
    """gdal/rasterio are absent in this container: the S17 interop surface
    must fail with a clear ImportError (the reference's version-guard
    behavior), never a half-written file. When the libs exist, these calls
    perform the real handoff."""
    import pytest

    from gdal_drivers_ray import api

    try:
        import rasterio  # noqa: F401
        has_rasterio = True
    except ImportError:
        has_rasterio = False
    try:
        from osgeo import gdal  # noqa: F401
        has_gdal = True
    except ImportError:
        has_gdal = False

    if not has_rasterio:
        import ray.data
        tiles = ray.data.from_items([])
        with pytest.raises(ImportError, match="rasterio"):
            api.to_rasterio(tiles, api.RasterGrid(
                extents=None, srs="local", nx=1, ny=1), "/tmp/x.tif")
    if not has_gdal:
        with pytest.raises(ImportError, match="gdal"):
            api.open_gdal("/tmp/nonexistent.tif")


def test_read_images_lance_dispatch_contract(ray_session, monkeypatch,
                                             tmp_path):
    """The input_hint names a Lance table; this contract pins the seam:
    a .lance path MUST reach ray.data.read_lance (never a silent parquet
    fallback), a parquet path must not. The container lacks the lance
    package, so the read_lance leg is exercised through an injected stub
    module — the dispatch logic is identical either way."""
    import sys
    import types

    import pyarrow.parquet as pq
    import ray.data

    from gdal_drivers_ray import api

    # parquet path: real read, no lance involvement
    p = tmp_path / "imgs"
    p.mkdir()
    pq.write_table(pa.table({"image_id": ["a"], "w": [1]}),
                   p / "part-0.parquet")
    assert api.read_images(str(p)).count() == 1

    # .lance path without the package: loud ImportError, no fallback
    if "lance" not in sys.modules:
        with pytest.raises(ImportError, match="[Ll]ance"):
            api.read_images("/tmp/nonexistent/images.lance")

    # .lance path with (stub) package present: must call read_lance
    calls = {}
    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))
    monkeypatch.setattr(ray.data, "read_lance",
                        lambda path, **kw: calls.setdefault("path", path),
                        raising=False)
    api.read_images("/tmp/x/images.lance")
    assert calls["path"] == "/tmp/x/images.lance"
