"""Driver registry + probing open (register.cpp:37-47, mvt.cpp:821-829)."""

import numpy as np
import pytest
import ray.data

from gdal_drivers_ray import registry as R
from gdal_drivers_ray.grid import Extents
from gdal_drivers_ray.sources import mask as mask_mod
from gdal_drivers_ray.sources import mvt as mvt_mod
from gdal_drivers_ray.sources import solid as solid_mod
from gdal_drivers_ray.sources import tilestore


def test_builtin_order_and_replace_semantics():
    names = [d.name for d in R.drivers()]
    assert names[:4] == ["solid", "mask", "blender", "mvt"]
    with pytest.raises(ValueError):
        R.register_driver("solid", lambda s: False, lambda s: None)
    # replace=True swaps (mvt.cpp:821-829), deregister restores builtins
    R.register_driver("solid", lambda s: False, lambda s: None, replace=True)
    assert R._DRIVERS["solid"].description == ""
    R.deregister_driver("solid")
    R.register_builtins()
    assert [d.name for d in R.drivers()][-1] == "solid"  # re-added at end


def test_probe_unknown_raises():
    with pytest.raises(R.UnknownFormat):
        R.open_dataset("no driver claims this string")
    with pytest.raises(R.UnknownFormat):
        R.open_dataset("x", driver="nope")


def test_open_solid_by_probe(ray_session):
    spec = solid_mod.SolidSpec(srs="local", size=(512, 512),
                               extents=Extents(0, 0, 512, 512),
                               bands=[solid_mod.Band(7.0, "Byte")])
    conf = solid_mod.write_config(spec)
    ds = R.open_dataset(conf, include_overviews=False)
    rows = ds.take_all()
    assert len(rows) == 4  # 2x2 tiles of 256
    a = np.frombuffer(rows[0]["px"], dtype=np.uint8)
    assert (a == 7).all()


def test_open_mask_by_magic(ray_session):
    arr = np.zeros((512, 512), dtype=bool)
    arr[:128, :300] = True
    m = mask_mod.mask_from_array(arr, "local", Extents(0, 0, 512, 512))
    buf = mask_mod.serialize(m)
    ds = R.open_dataset(buf)
    assert ds.count() > 0


def test_open_mvt_router(ray_session, tmp_path):
    # point feature: MoveTo x1 -> [cmd(1,1)=9, zz(10)=20, zz(20)=40]
    tile = mvt_mod.encode_tile([{
        "name": "roads", "extent": 4096,
        "keys": ["k"], "values": [(1, "v")],
        "features": [{"id": 1, "type": 1, "tags": [0, 0],
                      "geometry": [9, 20, 40]}],
    }])
    store = str(tmp_path / "store.parquet")
    # store rows are (zoom, col, row) with TMS row addressing: the lookup
    # flips the request row (mbtiles.cpp:155): request 3-2-1 -> store row 6
    tilestore.write_store(store, [(3, 2, (1 << 3) - 1 - 1, tile)])
    ds = R.open_dataset(f"mvt:{store}/3-2-1")
    rows = ds.take_all()
    assert len(rows) == 1
    assert rows[0]["layer"] == "roads"
    with pytest.raises(ValueError):
        R.open_dataset("mvt:/tmp/x.parquet/bad-key-xx")


def test_open_remote_mvt_with_injected_fetcher(ray_session):
    """S10 (mvt.cpp:699-730): remote .mvt URLs open through an injected
    transport; 200 decodes, 404 is an open failure, transport/HTTP errors
    raise, and the identify sniff follows the reference's rules."""
    tile = mvt_mod.encode_tile([{
        "name": "roads", "extent": 4096,
        "keys": ["k"], "values": [(1, "v")],
        "features": [{"id": 7, "type": 1, "tags": [0, 0],
                      "geometry": [9, 20, 40]}],
    }])

    served = {"https://tiles.example/3-2-1.mvt": tile}

    def fetcher(path):
        if path in served:
            return 200, served[path]
        return 404, b""

    ds = R.open_dataset("https://tiles.example/3-2-1.mvt", fetcher=fetcher)
    rows = ds.take_all()
    assert len(rows) == 1 and rows[0]["fid"] == 7

    with pytest.raises(FileNotFoundError):
        R.open_dataset("https://tiles.example/9-9-9.mvt", fetcher=fetcher)
    with pytest.raises(ValueError, match="fetcher"):
        R.open_dataset("https://tiles.example/3-2-1.mvt")
    with pytest.raises(IOError):
        R.open_dataset("http://x/.vector.pbf",
                       fetcher=lambda p: (500, b"boom"))
    # sniff rules: remote prefix + .mvt/.vector.pbf only
    assert not R._mvt_identify("https://tiles.example/3-2-1.png")
    assert R._mvt_identify("HTTP://T/x.Vector.PBF")
    assert not R._mvt_identify("/local/path/x.mvt")


def test_open_images_table_by_probe(ray_session):
    from gdal_drivers_ray import fixtures

    path = fixtures.images_path_for("/root/testdata/sf0.001")
    ds = R.open_dataset(path)
    rows = ds.take(3)
    assert {"cell", "phash", "mean_px"} <= set(rows[0].keys())


def test_register_replace_moves_to_probe_end():
    """replace=True is deregister-then-register: the replacement probes
    LAST (mvt.cpp semantics), not from the old slot."""
    from gdal_drivers_ray import registry as R

    order0 = list(R._ORDER)
    try:
        first = order0[0]
        drv = R._DRIVERS[first]
        R.register_driver(first, drv.identify, drv.open, replace=True)
        assert R._ORDER[-1] == first
        assert sorted(R._ORDER) == sorted(order0)
    finally:
        R._ORDER[:] = order0
