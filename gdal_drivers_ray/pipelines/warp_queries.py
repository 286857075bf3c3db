"""Warp / reprojection queries.

`merc_transform` is the SQL-checked surface for the SRS point-transform math
(the kernel inside the warp stage's transformer, public spherical-Mercator
formulas); `warp_tiles` runs the full tile-keyed warp shuffle (binary pixels
-> rows-only check; pixel parity is covered by tests/test_warp.py against
the NumPy oracle).

Reference: python warp sink gdaldriversmodule.cpp:182-204; SRS holder
detail/srsholder.hpp:54-61.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..grid import TILE, Extents
from ..sources import solid
from ..stages import warp as W


def q_merc_transform(sf_dir: str) -> ray.data.Dataset:
    """Deterministic lon/lat derived from customer keys -> EPSG:3857 meters
    (integer-rounded so the value-hash compare is exact)."""
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])

    def tx(b: pa.Table) -> pa.Table:
        ck = b["c_custkey"].to_numpy()
        lon = ((ck * 17) % 360).astype(np.float64) - 180.0 + 0.5
        lat = ((ck * 23) % 160).astype(np.float64) - 80.0 + 0.25
        mx, my = W.transform_points(lon, lat, "EPSG:4326", "EPSG:3857")
        return pa.table({
            "c_custkey": b["c_custkey"],
            "merc_x_m": pa.array(np.floor(mx).astype(np.int64)),
            "merc_y_m": pa.array(np.floor(my).astype(np.int64)),
        })

    return cust.map_batches(tx, batch_format="pyarrow")


SQL_MERC_TRANSFORM = """
WITH pts AS (
  SELECT c_custkey,
         CAST((c_custkey * 17) % 360 AS DOUBLE) - 180.0 + 0.5 AS lon,
         CAST((c_custkey * 23) % 160 AS DOUBLE) - 80.0 + 0.25 AS lat
  FROM customer
)
SELECT c_custkey,
       CAST(floor(6378137.0 * radians(lon)) AS BIGINT) AS merc_x_m,
       CAST(floor(6378137.0 * ln(tan(pi() / 4.0 + radians(lat) / 2.0)))
            AS BIGINT) AS merc_y_m
FROM pts
"""


def q_warp_tiles(sf_dir: str) -> ray.data.Dataset:
    """Full warp pipeline: a deterministic lat/lon solid raster (2 bands
    collapsed to 1) reprojected to Web Mercator; per-tile valid counts +
    integer pixel checksum. Rows-only check (binary pixels); exact pixel
    parity vs the NumPy oracle is tested in tests/test_warp.py."""
    sg_extents = Extents(-180.0, -80.0, 180.0, 80.0)
    sg = W.RasterGrid(sg_extents, "EPSG:4326", 1024, 512)
    spec = solid.SolidSpec(srs="EPSG:4326", size=(1024, 512),
                           extents=sg_extents,
                           bands=[solid.Band(37.0, "Byte")])
    tiles = solid.solid_dataset(spec, include_overviews=False)

    my0, my1 = W.transform_points(np.array([0.0, 0.0]),
                                  np.array([-80.0, 80.0]),
                                  "EPSG:4326", "EPSG:3857")[1]
    m = np.pi * 6378137.0
    dg = W.RasterGrid(Extents(-m, float(my0), m, float(my1)), "EPSG:3857",
                      768, 768)
    out = W.warp_tiles(tiles, sg, dg, resampling="nearest", nodata=-1.0)

    def stats(b: pa.Table) -> pa.Table:
        sums, valid = [], []
        for px in b["px"].to_pylist():
            a = np.frombuffer(px, dtype=np.float64).reshape(TILE, TILE)
            ok = a >= 0
            valid.append(int(ok.sum()))
            sums.append(int(a[ok].sum()))
        return pa.table({"tile_x": b["tile_x"], "tile_y": b["tile_y"],
                         "valid_n": pa.array(valid, type=pa.int64()),
                         "px_sum": pa.array(sums, type=pa.int64())})

    return out.map_batches(stats, batch_format="pyarrow")


def _sql_warp_tiles() -> str:
    """Whole-raster NumPy warp (stages.warp.warp_oracle — ONE 768x768
    sample pass, no tiling, no cover join, no groupby shuffle) of the same
    fixture -> per-tile valid counts + checksums as a VALUES table. The
    tile-keyed shuffle plan under test must agree exactly."""
    sg_extents = Extents(-180.0, -80.0, 180.0, 80.0)
    sg = W.RasterGrid(sg_extents, "EPSG:4326", 1024, 512)
    my0, my1 = W.transform_points(np.array([0.0, 0.0]),
                                  np.array([-80.0, 80.0]),
                                  "EPSG:4326", "EPSG:3857")[1]
    m = np.pi * 6378137.0
    dg = W.RasterGrid(Extents(-m, float(my0), m, float(my1)), "EPSG:3857",
                      768, 768)
    src = np.full((512, 1024), 37.0)
    out = W.warp_oracle(src, sg, dg, resampling="nearest", nodata=-1.0)
    rows = []
    for ty in range(3):
        for tx in range(3):
            t = out[ty * 256:(ty + 1) * 256, tx * 256:(tx + 1) * 256]
            ok = t >= 0
            rows.append(f"({tx}, {ty}, {int(ok.sum())}, "
                        f"{int(t[ok].sum())})")
    values = ",\n    ".join(rows)
    return f"""
SELECT CAST(tile_x AS INTEGER) AS tile_x, CAST(tile_y AS INTEGER) AS tile_y,
       CAST(valid_n AS BIGINT) AS valid_n, CAST(px_sum AS BIGINT) AS px_sum
FROM (VALUES {values}) t(tile_x, tile_y, valid_n, px_sum)
"""


SQL_WARP_TILES = _sql_warp_tiles()

def q_utm_transform(sf_dir: str) -> ray.data.Dataset:
    """Deterministic lon/lat inside UTM zone 33 derived from customer keys
    -> EPSG:32633 meters through the engine's real transformer path
    (projections.tmerc_forward via warp.get_transformer). Integer-floored
    so the value-hash compare is exact; the DuckDB twin recomputes the
    Snyder series in SQL with the IDENTICAL constants."""
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])

    def tx(b: pa.Table) -> pa.Table:
        ck = b["c_custkey"].to_numpy()
        lon = 12.0 + ((ck * 29) % 6000).astype(np.float64) / 1000.0
        lat = ((ck * 31) % 15000).astype(np.float64) / 100.0 - 75.0
        ux, uy = W.transform_points(lon, lat, "EPSG:4326", "EPSG:32633")
        return pa.table({
            "c_custkey": b["c_custkey"],
            "utm_e_m": pa.array(np.floor(ux).astype(np.int64)),
            "utm_n_m": pa.array(np.floor(uy).astype(np.int64)),
        })

    return cust.map_batches(tx, batch_format="pyarrow")


def _sql_utm_transform() -> str:
    """DuckDB twin of the zone-33 Transverse Mercator forward: the Snyder
    series (projections.tmerc_forward) transcribed to SQL with the module's
    own constants embedded, mirroring the numpy expression structure."""
    from .. import projections as P

    return f"""
WITH pts AS (
  SELECT c_custkey,
         radians(12.0 + CAST((c_custkey * 29) % 6000 AS DOUBLE) / 1000.0)
             AS lon,
         radians(CAST((c_custkey * 31) % 15000 AS DOUBLE) / 100.0 - 75.0)
             AS lat
  FROM customer
), terms AS (
  SELECT c_custkey, lat,
         {P.A!r} / sqrt(1.0 - {P.E2!r} * sin(lat) * sin(lat)) AS nn,
         tan(lat) * tan(lat) AS t,
         {P.EP2!r} * cos(lat) * cos(lat) AS c,
         (lon - radians(15.0)) * cos(lat) AS aa,
         {P.A!r} * ({P.M_C0!r} * lat - {P.M_C2!r} * sin(2.0 * lat)
                    + {P.M_C4!r} * sin(4.0 * lat)
                    - {P.M_C6!r} * sin(6.0 * lat)) AS m
  FROM pts
)
SELECT c_custkey,
       CAST(floor(500000.0 + 0.9996 * nn *
            (aa + (1.0 - t + c) * pow(aa, 3) / 6.0
                + (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * {P.EP2!r})
                  * pow(aa, 5) / 120.0)) AS BIGINT) AS utm_e_m,
       CAST(floor(0.9996 * (m + nn * tan(lat) *
            (aa * aa / 2.0
             + (5.0 - t + 9.0 * c + 4.0 * c * c) * pow(aa, 4) / 24.0
             + (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * {P.EP2!r})
               * pow(aa, 6) / 720.0))) AS BIGINT) AS utm_n_m
FROM terms
"""


SQL_UTM_TRANSFORM = _sql_utm_transform()

# the classic CONUS Lambert cone (the public "US NA 2SP" parameter set)
_LCC_SRS = ("+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96 "
            "+x_0=0 +y_0=0 +datum=WGS84")


def q_lcc_transform(sf_dir: str) -> ray.data.Dataset:
    """Deterministic CONUS-box lon/lat from customer keys -> Lambert
    Conformal Conic 2SP meters through the engine's transformer
    (projections.lcc_forward resolved from the proj4 spelling). Floored
    to integer meters; the DuckDB twin recomputes Snyder 15-1..15-4 with
    the module's constants."""
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])

    def tx(b: pa.Table) -> pa.Table:
        ck = b["c_custkey"].to_numpy()
        lon = -120.0 + ((ck * 37) % 4800).astype(np.float64) / 100.0
        lat = 24.0 + ((ck * 41) % 2500).astype(np.float64) / 100.0
        lx, ly = W.transform_points(lon, lat, "EPSG:4326", _LCC_SRS)
        return pa.table({
            "c_custkey": b["c_custkey"],
            "lcc_x_m": pa.array(np.floor(lx).astype(np.int64)),
            "lcc_y_m": pa.array(np.floor(ly).astype(np.int64)),
        })

    return cust.map_batches(tx, batch_format="pyarrow")


def _sql_lcc_transform() -> str:
    """DuckDB twin of the LCC 2SP forward. The cone constants (n, F,
    rho0) are scalars of the projection, precomputed HERE with the same
    Python/NumPy code path the engine uses and embedded as literals; the
    per-row part (t(lat), rho, theta) is recomputed in SQL."""
    import math

    from .. import projections as P

    l1, l2, l0 = map(math.radians, (33.0, 45.0, 39.0))
    m1 = float(P._lcc_m(np.float64(l1)))
    m2 = float(P._lcc_m(np.float64(l2)))
    t1 = float(P._lcc_t(np.float64(l1)))
    t2 = float(P._lcc_t(np.float64(l2)))
    t0 = float(P._lcc_t(np.float64(l0)))
    n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    f_ = m1 / (n * t1 ** n)
    rho0 = P.A * f_ * t0 ** n
    af = P.A * f_      # one literal: DuckDB would DECIMAL-overflow A * f

    return f"""
WITH pts AS (
  SELECT c_custkey,
         radians(-120.0 + CAST((c_custkey * 37) % 4800 AS DOUBLE) / 100.0)
             AS lon,
         radians(24.0 + CAST((c_custkey * 41) % 2500 AS DOUBLE) / 100.0)
             AS lat
  FROM customer
), terms AS (
  SELECT c_custkey,
         {af!r} * pow(
             tan(pi() / 4.0 - lat / 2.0)
             / pow((1.0 - {P.E!r} * sin(lat)) / (1.0 + {P.E!r} * sin(lat)),
                   {P.E!r} / 2.0),
             {n!r}) AS rho,
         {n!r} * (lon - radians(-96.0)) AS th
  FROM pts
)
SELECT c_custkey,
       CAST(floor(rho * sin(th)) AS BIGINT) AS lcc_x_m,
       CAST(floor({rho0!r} - rho * cos(th)) AS BIGINT) AS lcc_y_m
FROM terms
"""


SQL_LCC_TRANSFORM = _sql_lcc_transform()


def _utm_fixture_grids():
    """Shared src (lat/lon) and dst (UTM zone 33) grids for the UTM warp
    query and its whole-raster oracle."""
    sg_extents = Extents(9.0, 40.0, 21.0, 52.0)
    sg = W.RasterGrid(sg_extents, "EPSG:4326", 1024, 1024)
    ux, uy = W.transform_points(np.array([9.0, 21.0, 9.0, 21.0, 15.0]),
                                np.array([40.0, 40.0, 52.0, 52.0, 40.0]),
                                "EPSG:4326", "EPSG:32633")
    dg = W.RasterGrid(Extents(float(ux.min()), float(uy.min()),
                              float(ux.max()), float(uy.max())),
                      "EPSG:32633", 768, 768)
    return sg, dg


def q_warp_utm_tiles(sf_dir: str) -> ray.data.Dataset:
    """Full tile-keyed warp shuffle onto a CURVED-graticule target (UTM
    zone 33 via the projections engine): per-tile valid counts + integer
    checksums, hash-checked against the whole-raster NumPy oracle. The
    cover join must over-approximate curved tile footprints (the 3x3
    stencil) or tiles go missing and counts drift."""
    sg, dg = _utm_fixture_grids()
    spec = solid.SolidSpec(srs="EPSG:4326", size=(1024, 1024),
                           extents=sg.extents,
                           bands=[solid.Band(73.0, "Byte")])
    tiles = solid.solid_dataset(spec, include_overviews=False)
    out = W.warp_tiles(tiles, sg, dg, resampling="bilinear", nodata=-1.0)

    def stats(b: pa.Table) -> pa.Table:
        sums, valid = [], []
        for px in b["px"].to_pylist():
            a = np.frombuffer(px, dtype=np.float64).reshape(TILE, TILE)
            ok = a >= 0
            valid.append(int(ok.sum()))
            sums.append(int(np.floor(a[ok]).sum()))
        return pa.table({"tile_x": b["tile_x"], "tile_y": b["tile_y"],
                         "valid_n": pa.array(valid, type=pa.int64()),
                         "px_sum": pa.array(sums, type=pa.int64())})

    return out.map_batches(stats, batch_format="pyarrow", batch_size=None)


def _sql_warp_utm_tiles() -> str:
    """Whole-raster NumPy warp of the same fixture (warp_oracle: ONE
    768x768 sample pass — no tiling, no cover join, no shuffle) -> VALUES
    table the tiled plan must reproduce exactly."""
    sg, dg = _utm_fixture_grids()
    src = np.full((1024, 1024), 73.0)
    out = W.warp_oracle(src, sg, dg, resampling="bilinear", nodata=-1.0)
    rows = []
    for ty in range(3):
        for tx in range(3):
            t = out[ty * 256:(ty + 1) * 256, tx * 256:(tx + 1) * 256]
            ok = t >= 0
            rows.append(f"({tx}, {ty}, {int(ok.sum())}, "
                        f"{int(np.floor(t[ok]).sum())})")
    values = ",\n    ".join(rows)
    return f"""
SELECT CAST(tile_x AS INTEGER) AS tile_x, CAST(tile_y AS INTEGER) AS tile_y,
       CAST(valid_n AS BIGINT) AS valid_n, CAST(px_sum AS BIGINT) AS px_sum
FROM (VALUES {values}) t(tile_x, tile_y, valid_n, px_sum)
"""


SQL_WARP_UTM_TILES = _sql_warp_utm_tiles()


def _varying_raster(nx: int, ny: int) -> np.ndarray:
    """Deterministic integer-valued test raster (values 0..250): varies in
    both axes plus a non-separable term so interpolation kernels are
    genuinely exercised (a constant raster is a fixed point of every
    normalized kernel)."""
    iy, ix = np.mgrid[0:ny, 0:nx]
    return ((3 * ix + 5 * iy + (ix * iy) % 7) % 251).astype(np.float64)


def _tiles_of(arr: np.ndarray, dtype: str = "Byte") -> ray.data.Dataset:
    """TILE_SCHEMA rows (lod/band/tile_x/tile_y/valid_w/valid_h/dtype/px)
    from a full-raster array, edge tiles padded to TILE and trimmed by
    valid_w/valid_h — the same layout solid_dataset emits."""
    npdt = {"Byte": np.uint8}.get(dtype, dtype)
    ny, nx = arr.shape
    rows = {k: [] for k in ("lod", "band", "tile_x", "tile_y",
                            "valid_w", "valid_h", "dtype", "px")}
    for ty in range(-(-ny // TILE)):
        for tx in range(-(-nx // TILE)):
            vw = min(TILE, nx - tx * TILE)
            vh = min(TILE, ny - ty * TILE)
            block = np.zeros((TILE, TILE), dtype=npdt)
            block[:vh, :vw] = arr[ty * TILE:ty * TILE + vh,
                                  tx * TILE:tx * TILE + vw].astype(npdt)
            rows["lod"].append(0)
            rows["band"].append(0)
            rows["tile_x"].append(tx)
            rows["tile_y"].append(ty)
            rows["valid_w"].append(vw)
            rows["valid_h"].append(vh)
            rows["dtype"].append(dtype)
            rows["px"].append(block.tobytes())
    return ray.data.from_arrow(pa.table({
        "lod": pa.array(rows["lod"], type=pa.int32()),
        "band": pa.array(rows["band"], type=pa.int32()),
        "tile_x": pa.array(rows["tile_x"], type=pa.int32()),
        "tile_y": pa.array(rows["tile_y"], type=pa.int32()),
        "valid_w": pa.array(rows["valid_w"], type=pa.int32()),
        "valid_h": pa.array(rows["valid_h"], type=pa.int32()),
        "dtype": pa.array(rows["dtype"]),
        "px": pa.array(rows["px"], type=pa.large_binary()),
    }))


def _tile_stats(out: ray.data.Dataset) -> ray.data.Dataset:
    """Per-tile valid count + integer floor-checksum of a warped dataset."""

    def stats(b: pa.Table) -> pa.Table:
        sums, valid = [], []
        for px in b["px"].to_pylist():
            a = np.frombuffer(px, dtype=np.float64).reshape(TILE, TILE)
            ok = a >= 0
            valid.append(int(ok.sum()))
            sums.append(int(np.floor(a[ok]).sum()))
        return pa.table({"tile_x": b["tile_x"], "tile_y": b["tile_y"],
                         "valid_n": pa.array(valid, type=pa.int64()),
                         "px_sum": pa.array(sums, type=pa.int64())})

    return out.map_batches(stats, batch_format="pyarrow", batch_size=None)


def _oracle_tile_stats_sql(out: np.ndarray, n_tx: int, n_ty: int) -> str:
    """Whole-raster NumPy warp result -> per-tile VALUES oracle."""
    rows = []
    for ty in range(n_ty):
        for tx in range(n_tx):
            t = out[ty * TILE:(ty + 1) * TILE, tx * TILE:(tx + 1) * TILE]
            ok = t >= 0
            rows.append(f"({tx}, {ty}, {int(ok.sum())}, "
                        f"{int(np.floor(t[ok]).sum())})")
    values = ",\n    ".join(rows)
    return f"""
SELECT CAST(tile_x AS INTEGER) AS tile_x, CAST(tile_y AS INTEGER) AS tile_y,
       CAST(valid_n AS BIGINT) AS valid_n, CAST(px_sum AS BIGINT) AS px_sum
FROM (VALUES {values}) t(tile_x, tile_y, valid_n, px_sum)
"""


def _cubic_fixture_grids():
    sg = W.RasterGrid(Extents(-180.0, -80.0, 180.0, 80.0),
                      "EPSG:4326", 1024, 512)
    my0, my1 = W.transform_points(np.array([0.0, 0.0]),
                                  np.array([-80.0, 80.0]),
                                  "EPSG:4326", "EPSG:3857")[1]
    m = np.pi * 6378137.0
    dg = W.RasterGrid(Extents(-m, float(my0), m, float(my1)), "EPSG:3857",
                      768, 768)
    return sg, dg


def q_warp_cubic(sf_dir: str) -> ray.data.Dataset:
    """Tile-keyed warp shuffle with the 4x4 Keys cubic kernel (a=-0.5, the
    reference's Resampling::cubic, gdaldriversmodule.cpp:189) over a
    VARYING integer raster: per-tile valid counts + floor checksums,
    hash-checked against the whole-raster oracle. Exercises the wider
    cover pad (3 src px) and the seam-straddling 4x4 stencil."""
    sg, dg = _cubic_fixture_grids()
    tiles = _tiles_of(_varying_raster(sg.nx, sg.ny))
    out = W.warp_tiles(tiles, sg, dg, resampling="cubic", nodata=-1.0)
    return _tile_stats(out)


def _sql_warp_cubic() -> str:
    sg, dg = _cubic_fixture_grids()
    out = W.warp_oracle(_varying_raster(sg.nx, sg.ny), sg, dg,
                        resampling="cubic", nodata=-1.0)
    return _oracle_tile_stats_sql(out, 3, 3)


SQL_WARP_CUBIC = _sql_warp_cubic()


def _average_fixture_grids():
    e = Extents(0.0, 0.0, 1024.0, 1024.0)
    return (W.RasterGrid(e, "local", 1024, 1024),
            W.RasterGrid(e, "local", 512, 512))


def q_warp_average(sf_dir: str) -> ray.data.Dataset:
    """Tile-keyed warp shuffle with the 'average' downsample kernel
    (Resampling::average): exact 2x downsample of a varying integer
    raster; footprints are exact 2x2 blocks so the mean is exactly
    representable and the floor checksum is bit-stable. Parity with the
    pyramid path's 2x2 box filter is pinned in tests/test_warp.py."""
    sg, dg = _average_fixture_grids()
    tiles = _tiles_of(_varying_raster(sg.nx, sg.ny))
    out = W.warp_tiles(tiles, sg, dg, resampling="average", nodata=-1.0)
    return _tile_stats(out)


def _sql_warp_average() -> str:
    sg, dg = _average_fixture_grids()
    out = W.warp_oracle(_varying_raster(sg.nx, sg.ny), sg, dg,
                        resampling="average", nodata=-1.0)
    return _oracle_tile_stats_sql(out, 2, 2)


SQL_WARP_AVERAGE = _sql_warp_average()


def q_warp_lanczos(sf_dir: str) -> ray.data.Dataset:
    """Tile-keyed warp shuffle with the Lanczos-3 windowed-sinc kernel
    (Resampling::lanczos of the reference's geo::GeoDataset surface,
    gdaldriversmodule.cpp:189) over the same curved 4326->3857 fixture as
    `warp_cubic`: exercises the widest cover pad (4 src px) and the
    seam-straddling 6x6 stencil. Checksums floor to integers, so the
    hash compare pins every output pixel."""
    sg, dg = _cubic_fixture_grids()
    tiles = _tiles_of(_varying_raster(sg.nx, sg.ny))
    out = W.warp_tiles(tiles, sg, dg, resampling="lanczos", nodata=-1.0)
    return _tile_stats(out)


def _sql_warp_lanczos() -> str:
    sg, dg = _cubic_fixture_grids()
    out = W.warp_oracle(_varying_raster(sg.nx, sg.ny), sg, dg,
                        resampling="lanczos", nodata=-1.0)
    return _oracle_tile_stats_sql(out, 3, 3)


SQL_WARP_LANCZOS = _sql_warp_lanczos()


def q_warp_mode(sf_dir: str) -> ray.data.Dataset:
    """Tile-keyed warp shuffle with the 'mode' footprint kernel
    (Resampling::mode): 4x downsample of a varying integer raster, so
    each dst pixel reduces a 4x4 member block and ties are real (values
    repeat mod 251). Ties resolve to the smallest value — deterministic
    on both the tiled path and the whole-raster oracle."""
    sg, _ = _average_fixture_grids()
    dg = W.RasterGrid(sg.extents, "local", 256, 256)
    tiles = _tiles_of(_varying_raster(sg.nx, sg.ny))
    out = W.warp_tiles(tiles, sg, dg, resampling="mode", nodata=-1.0)
    return _tile_stats(out)


def _sql_warp_mode() -> str:
    sg, _ = _average_fixture_grids()
    dg = W.RasterGrid(sg.extents, "local", 256, 256)
    out = W.warp_oracle(_varying_raster(sg.nx, sg.ny), sg, dg,
                        resampling="mode", nodata=-1.0)
    return _oracle_tile_stats_sql(out, 1, 1)


SQL_WARP_MODE = _sql_warp_mode()


def q_focal_sum(sf_dir: str) -> ray.data.Dataset:
    """3x3 focal sum over a tiled varying raster via the halo exchange
    (stages/focal.py): each tile ships only its 1-px border strips to
    the 8 neighbors; per-tile integer checksums are hash-checked
    against the whole-raster stencil."""
    from ..stages import focal as F

    nx, ny = 770, 520          # ragged edge tiles in both axes
    tiles = _tiles_of(_varying_raster(nx, ny))
    out = F.focal_sum3(tiles, nx=nx, ny=ny, nodata=-1.0)
    return _tile_stats(out)


def _sql_focal_sum() -> str:
    from ..stages import focal as F

    nx, ny = 770, 520
    out = F.focal_sum3_oracle(_varying_raster(nx, ny), nodata=-1.0)
    return _oracle_tile_stats_sql(out, -(-nx // TILE), -(-ny // TILE))


SQL_FOCAL_SUM = _sql_focal_sum()


def q_raster_cc(sf_dir: str) -> ray.data.Dataset:
    """Connected components of a thresholded tiled raster (region
    labeling across tile seams): local run-min labeling, seam-group
    equivalence edges, distributed min-label propagation, per-component
    exact pixel counts (stages/cc.py)."""
    from ..stages.cc import raster_cc

    nx, ny = 770, 520
    tiles = _tiles_of(_varying_raster(nx, ny))
    return raster_cc(tiles, nx=nx, ny=ny, threshold=140.0)


def _sql_raster_cc() -> str:
    from ..stages.cc import raster_cc_oracle

    comp = raster_cc_oracle(_varying_raster(770, 520), 140.0)
    values = ",\n    ".join(f"({k}, {v})" for k, v in sorted(comp.items()))
    return f"""
SELECT CAST(component AS BIGINT) AS component, CAST(n_px AS BIGINT) AS n_px
FROM (VALUES {values}) t(component, n_px)
"""


SQL_RASTER_CC = _sql_raster_cc()
