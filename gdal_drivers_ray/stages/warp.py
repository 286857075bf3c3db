"""Reproject + resample ("warp") as a Ray Data shuffle stage.

Engine counterpart of the reference's Python ``warp`` sink
(/root/reference/gdal-drivers/python/gdaldriversmodule.cpp:182-204): reproject
a tiled raster onto a target (extents, srs, size) grid with a chosen
resampling kernel and nodata fill. The reference does this single-threaded
through GDAL's in-memory warper; here it is a tile-keyed shuffle:

    src tiles --flat_map--> (dst_tile_key, src tile)        [cover join, J1-style]
             --groupby(dst tile).map_groups(resample)-->    dst tiles

SRS state (the transformer) mirrors the reference's once-parsed SRS holder
(/root/reference/gdal-drivers/detail/srsholder.hpp:54-61, T6 in SURVEY §2.3):
transformers are built once per worker process via an lru_cache, never per
batch. No projection library ships in this container, so the transforms are
implemented from the public formulas: the spherical-Mercator pair
(EPSG:3857 <-> 4326) here, and the ellipsoidal family — UTM / Transverse
Mercator and Lambert Conformal Conic on WGS84 for any EPSG / proj4 / WKT
spelling — in gdal_drivers_ray.projections (Snyder, USGS PP 1395), composed
through a lon/lat hub.

Scale notes (100 TB):
- the shuffle key is the *dst* tile id; pixel payloads move exactly once;
- the cover join is computed from tile extents (a 3x3 sample stencil per
  tile bounds curved-graticule projections at tile scale), no pixel reads;
- resample math is vectorized NumPy over the whole 256x256 block;
- accumulation is float64 regardless of storage dtype, matching the
  reference blender's compute dtype (blender.cpp:223).

Parity semantics: output pixels match the pure-NumPy full-raster oracle
(`warp_oracle`) exactly; samples whose stencil leaves the source raster (or
touches a missing tile) get `nodata`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..grid import TILE, Extents

_R = 6378137.0  # WGS84 / spherical-Mercator radius (public EPSG:3857 definition)

SUPPORTED_SRS = ("local", "EPSG:4326", "EPSG:3857",
                 "EPSG:32601-32660 (UTM north)", "EPSG:32701-32760 (south)",
                 "+proj=tmerc/lcc/utm (WGS84)",
                 "WKT Transverse_Mercator / Lambert_Conformal_Conic_2SP")

# dtype tags: numpy names or the reference's GDAL names (solid.cpp:408-440)
_GDAL_DTYPES = {"Byte": np.uint8, "UInt16": np.uint16, "Int16": np.int16,
                "UInt32": np.uint32, "Int32": np.int32,
                "Float32": np.float32, "Float64": np.float64}


def _np_dtype(tag: str) -> np.dtype:
    return np.dtype(_GDAL_DTYPES.get(tag, tag))


def _ll_to_merc(xs: np.ndarray, ys: np.ndarray):
    return (_R * np.radians(xs),
            _R * np.log(np.tan(np.pi / 4.0 + np.radians(ys) / 2.0)))


def _merc_to_ll(xs: np.ndarray, ys: np.ndarray):
    return (np.degrees(xs / _R),
            np.degrees(2.0 * np.arctan(np.exp(ys / _R)) - np.pi / 2.0))


@lru_cache(maxsize=16)
def get_transformer(src_srs: str, dst_srs: str):
    """Vectorized (xs, ys) -> (xs', ys') transform, cached per worker process.

    The cache IS the warm state: every map_groups call in the same worker
    reuses the same compiled closure (ref srsholder.hpp:54-61 pattern).

    SRS arguments accept ANY spelling the reference accepts — WKT, proj4,
    'EPSG:nnnn', bare code (srsholder.hpp delegates to geo::SrsDefinition;
    here gdal_drivers_ray.srs does the parse/normalize). Transform paths:
    the spherical-Mercator pair keeps its original closed forms (their
    exact expression order is pinned by SQL oracles); every other pair
    resolves both sides to a pure-NumPy ProjDef (projections.py: UTM /
    Transverse Mercator / Lambert Conformal Conic on WGS84) and composes
    through the lon/lat hub: src.inverse -> dst.forward. A VALID CRS
    outside that table raises 'no transform path' with its canonical
    name; an INVALID string raises the parse error.
    """
    from ..projections import projection_of
    from ..srs import resolve_srs

    src_c = resolve_srs(src_srs)
    dst_c = resolve_srs(dst_srs)
    if src_c == dst_c:
        return lambda xs, ys: (np.asarray(xs, dtype=np.float64),
                               np.asarray(ys, dtype=np.float64))
    if (src_c, dst_c) == ("EPSG:4326", "EPSG:3857"):
        return _ll_to_merc
    if (src_c, dst_c) == ("EPSG:3857", "EPSG:4326"):
        return _merc_to_ll

    src_p = projection_of(src_srs)    # raises 'no transform path' on
    dst_p = projection_of(dst_srs)    # unsupported-but-valid CRSs

    def via_lonlat(xs, ys):
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        if src_p.kind == "merc_sph":
            lon, lat = _merc_to_ll(xs, ys)
        else:
            lon, lat = src_p.inverse(xs, ys)
        if dst_p.kind == "merc_sph":
            return _ll_to_merc(lon, lat)
        return dst_p.forward(lon, lat)

    return via_lonlat


def transform_points(xs, ys, src_srs: str, dst_srs: str):
    """Public scalar/array point transform (used by the SQL-checked query)."""
    return get_transformer(src_srs, dst_srs)(np.asarray(xs, dtype=np.float64),
                                             np.asarray(ys, dtype=np.float64))


@dataclass(frozen=True)
class RasterGrid:
    """A georeferenced raster grid: extents + SRS + pixel size.

    The (extents, size) pair defines the north-up geotransform exactly as the
    reference derives it (solid.cpp:334-347)."""

    extents: Extents
    srs: str
    nx: int
    ny: int

    @property
    def res(self) -> tuple[float, float]:
        return (self.extents.width / self.nx, self.extents.height / self.ny)

    def pixel_centers_world(self, ix: np.ndarray, iy: np.ndarray):
        rx, ry = self.res
        return (self.extents.llx + (ix + 0.5) * rx,
                self.extents.ury - (iy + 0.5) * ry)

    def world_to_pixelf(self, wx: np.ndarray, wy: np.ndarray):
        rx, ry = self.res
        return ((wx - self.extents.llx) / rx,
                (self.extents.ury - wy) / ry)

    def pixel_corners_world(self, cx: np.ndarray, cy: np.ndarray):
        """World coords of pixel CORNERS (cx in 0..nx, cy in 0..ny)."""
        rx, ry = self.res
        return (self.extents.llx + cx * rx, self.extents.ury - cy * ry)

    def n_tiles(self) -> tuple[int, int]:
        return (-(-self.nx // TILE), -(-self.ny // TILE))


# per-kernel src-px padding for the cover join: how far a dst pixel's
# stencil can reach from its sample point (bilinear 1.5, cubic 2.5,
# lanczos 3.5; +0.5 slack). Also the up-front "supported resampling"
# whitelist, matching the reference's geo::GeoDataset::Resampling surface
# the Python warp exposes (gdaldriversmodule.cpp:189, :263):
# nearest/bilinear/cubic/lanczos for sampling, average/min/max/mode for
# downsampling (footprint kernels).
_COVER_PAD = {"nearest": 2.0, "bilinear": 2.0, "cubic": 3.0, "lanczos": 4.0,
              "average": 2.0, "minimum": 2.0, "maximum": 2.0, "mode": 2.0}

# kernels whose unit of work is the dst pixel's src-space FOOTPRINT rect
# (downsampling family) rather than a point stencil
_FOOTPRINT_KERNELS = ("average", "minimum", "maximum", "mode")


def _cubic_weights(f: np.ndarray):
    """Keys cubic-convolution weights, a = -0.5 (the classic 4-tap kernel
    GDAL's 'cubic' uses), for taps at offsets {-1, 0, +1, +2} from
    floor(s); f = frac(s) in [0, 1). Weights sum to 1."""
    a = -0.5
    t = 1.0 + f
    wm1 = ((a * t - 5.0 * a) * t + 8.0 * a) * t - 4.0 * a
    w0 = ((a + 2.0) * f - (a + 3.0)) * f * f + 1.0
    t = 1.0 - f
    w1 = ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0
    t = 2.0 - f
    w2 = ((a * t - 5.0 * a) * t + 8.0 * a) * t - 4.0 * a
    return wm1, w0, w1, w2


def _lanczos_weights(f: np.ndarray):
    """Lanczos-3 windowed-sinc weights (GDAL's 'lanczos', a = 3: 6 taps at
    offsets {-2..+3} from floor(s)); f = frac(s) in [0, 1). Normalized to
    sum to 1 (the raw windowed sinc doesn't, and an unnormalized kernel
    would shift constant rasters)."""
    ws = []
    for i in range(-2, 4):
        d = f - i
        x = np.pi * d
        # L(d) = sinc(d) * sinc(d/3), L(0) = 1; d = 0 only when f = 0, i = 0
        with np.errstate(invalid="ignore", divide="ignore"):
            w = np.where(d == 0.0, 1.0,
                         3.0 * np.sin(x) * np.sin(x / 3.0) / (x * x))
        ws.append(w)
    tot = np.add.reduce(ws)
    return [w / tot for w in ws]


def _footprints(dst_grid: RasterGrid, src_grid: RasterGrid,
                x_off: int, y_off: int, vw: int, vh: int):
    """Src-pixel-space footprint rects of the dst pixels in the window
    [x_off, x_off+vw) x [y_off, y_off+vh): transform the (vh+1, vw+1) grid
    of dst pixel CORNERS (exact for monotone transforms, the same
    over-approximation contract as the cover join's 3x3 stencil) and take
    per-pixel min/max of the 4 surrounding corners (handles axis flips)."""
    iy, ix = np.mgrid[0:vh + 1, 0:vw + 1]
    cwx, cwy = dst_grid.pixel_corners_world(
        (ix + x_off).astype(np.float64), (iy + y_off).astype(np.float64))
    tr = get_transformer(dst_grid.srs, src_grid.srs)
    sxw, syw = tr(cwx, cwy)
    pcx, pcy = src_grid.world_to_pixelf(sxw, syw)
    q = (pcx[:-1, :-1], pcx[:-1, 1:], pcx[1:, :-1], pcx[1:, 1:])
    fx0 = np.minimum.reduce(q)
    fx1 = np.maximum.reduce(q)
    q = (pcy[:-1, :-1], pcy[:-1, 1:], pcy[1:, :-1], pcy[1:, 1:])
    fy0 = np.minimum.reduce(q)
    fy1 = np.maximum.reduce(q)
    return fx0, fx1, fy0, fy1


def _footprint_rects(patch: np.ndarray, off_x: int, off_y: int,
                     fx0: np.ndarray, fx1: np.ndarray,
                     fy0: np.ndarray, fy1: np.ndarray,
                     nx: int, ny: int):
    """Shared membership rule of the footprint-kernel family
    (average / minimum / maximum / mode): a src pixel belongs to a dst
    pixel iff its CENTER falls in the dst pixel's footprint rect. Returns
    patch-local half-open member rects (lx0, lx1, ly0, ly1) and the
    validity mask: footprint inside the raster AND inside the patch AND
    >=1 member AND no missing member pixel. A footprint too small to
    cover any center (upsampling) degrades to the pixel containing the
    footprint center, matching GDAL's at-least-one-source-pixel behavior.

    Missing-member detection is an integral image over the patch NaN
    mask: O(patch + dst px), no per-pixel footprint loops.
    """
    ph, pw = patch.shape
    # pixel x covered iff x+0.5 in [fx0, fx1)  ->  x in [ceil(fx0-0.5), ...)
    ix0 = np.ceil(fx0 - 0.5).astype(np.int64)
    ix1 = np.ceil(fx1 - 0.5).astype(np.int64)   # exclusive
    iy0 = np.ceil(fy0 - 0.5).astype(np.int64)
    iy1 = np.ceil(fy1 - 0.5).astype(np.int64)
    # degenerate (empty) footprint -> the pixel containing the center
    cx = np.floor((fx0 + fx1) / 2.0).astype(np.int64)
    cy = np.floor((fy0 + fy1) / 2.0).astype(np.int64)
    degx = ix1 <= ix0
    ix0 = np.where(degx, cx, ix0)
    ix1 = np.where(degx, cx + 1, ix1)
    degy = iy1 <= iy0
    iy0 = np.where(degy, cy, iy0)
    iy1 = np.where(degy, cy + 1, iy1)
    ok = (ix0 >= 0) & (ix1 <= nx) & (iy0 >= 0) & (iy1 <= ny)
    lx0 = ix0 - off_x
    lx1 = ix1 - off_x
    ly0 = iy0 - off_y
    ly1 = iy1 - off_y
    ok &= (lx0 >= 0) & (lx1 <= pw) & (ly0 >= 0) & (ly1 <= ph)
    lx0 = np.clip(lx0, 0, pw); lx1 = np.clip(lx1, 0, pw)
    ly0 = np.clip(ly0, 0, ph); ly1 = np.clip(ly1, 0, ph)
    sm = np.zeros((ph + 1, pw + 1), dtype=np.int64)
    sm[1:, 1:] = np.isnan(patch).astype(np.int64) \
        .cumsum(axis=0).cumsum(axis=1)
    nmiss = sm[ly1, lx1] - sm[ly0, lx1] - sm[ly1, lx0] + sm[ly0, lx0]
    cnt = (lx1 - lx0) * (ly1 - ly0)
    ok &= (nmiss == 0) & (cnt > 0)
    return lx0, lx1, ly0, ly1, ok


def _sample_footprint(patch: np.ndarray, off_x: int, off_y: int,
                      fx0: np.ndarray, fx1: np.ndarray,
                      fy0: np.ndarray, fy1: np.ndarray,
                      nx: int, ny: int, kernel: str,
                      nodata: float) -> np.ndarray:
    """Footprint-kernel resampling (the reference's downsample surface,
    geo::GeoDataset::Resampling of gdaldriversmodule.cpp:189): reduce the
    member src pixels of each dst pixel's footprint rect.

    average: mean, via integral images — O(patch + dst px); sums are
    EXACT (hence parity-safe across different patch windows) for
    integer-valued rasters below 2^53.
    minimum / maximum: extrema via a gathered (kh x kw) window sweep —
    O(dst px * max footprint area), vectorized per tap offset.
    mode: most frequent member value; ties resolve to the SMALLEST value
    (deterministic; GDAL leaves tie order unspecified). Sorted-run
    counting over the gathered window matrix.
    """
    lx0, lx1, ly0, ly1, ok = _footprint_rects(
        patch, off_x, off_y, fx0, fx1, fy0, fy1, nx, ny)
    out = np.full(fx0.shape, nodata, dtype=np.float64)
    ph, pw = patch.shape
    if kernel == "average":
        sv = np.zeros((ph + 1, pw + 1), dtype=np.float64)
        sv[1:, 1:] = np.where(np.isnan(patch), 0.0, patch) \
            .cumsum(axis=0).cumsum(axis=1)
        s = sv[ly1, lx1] - sv[ly0, lx1] - sv[ly1, lx0] + sv[ly0, lx0]
        cnt = (lx1 - lx0) * (ly1 - ly0)
        out[ok] = s[ok] / np.maximum(cnt[ok], 1)
        return out
    if not ok.any():
        return out
    kw = int((lx1 - lx0)[ok].max())
    kh = int((ly1 - ly0)[ok].max())
    if kernel in ("minimum", "maximum"):
        red = np.fmin if kernel == "minimum" else np.fmax
        acc = np.full(fx0.shape, np.nan, dtype=np.float64)
        for dy in range(kh):
            yy = ly0 + dy
            rowin = yy < ly1
            for dx in range(kw):
                xx = lx0 + dx
                m = rowin & (xx < lx1)
                v = patch[np.clip(yy, 0, ph - 1), np.clip(xx, 0, pw - 1)]
                acc = np.where(m, red(acc, v), acc)
        # ok guarantees >=1 member and no missing member, so acc is finite
        out[ok] = acc[ok]
        return out
    if kernel != "mode":
        raise ValueError(f"unknown footprint kernel {kernel!r}")
    # gather the member window into (n_ok, kh*kw), non-members = NaN
    # (NaN sorts last, so member runs come first in each sorted row)
    olx0 = lx0[ok]; olx1 = lx1[ok]; oly0 = ly0[ok]; oly1 = ly1[ok]
    n = olx0.shape[0]
    vals = np.full((n, kh * kw), np.nan, dtype=np.float64)
    for dy in range(kh):
        yy = oly0 + dy
        rowin = yy < oly1
        for dx in range(kw):
            xx = olx0 + dx
            m = rowin & (xx < olx1)
            v = patch[np.clip(yy, 0, ph - 1), np.clip(xx, 0, pw - 1)]
            vals[:, dy * kw + dx] = np.where(m, v, np.nan)
    s = np.sort(vals, axis=1)
    k = s.shape[1]
    idx = np.arange(k, dtype=np.int64)
    start = np.ones(s.shape, dtype=bool)
    start[:, 1:] = s[:, 1:] != s[:, :-1]
    # run start index at each position (last j with start True up to here)
    left = np.maximum.accumulate(np.where(start, idx, -1), axis=1)
    # run end (exclusive): next start position, computed on the reverse
    endr = np.empty(s.shape, dtype=np.int64)
    endr[:, :-1] = np.where(start[:, 1:], idx[:-1] + 1, -1)
    endr[:, -1] = k
    right = np.minimum.accumulate(
        np.where(endr >= 0, endr, k)[:, ::-1], axis=1)[:, ::-1]
    counts = np.where(np.isnan(s), 0, right - left)
    # argmax hits the FIRST max-count run = the smallest value (ascending)
    pick = counts.argmax(axis=1)
    out[ok] = s[np.arange(n), pick]
    return out


def _sample(patch: np.ndarray, off_x: int, off_y: int,
            pfx: np.ndarray, pfy: np.ndarray, nx: int, ny: int,
            resampling: str, nodata: float) -> np.ndarray:
    """Sample `patch` (a window of the src raster starting at global pixel
    (off_x, off_y), NaN = missing) at float src-pixel coords (pfx, pfy).

    nearest: value of the pixel containing the point; valid iff inside raster.
    bilinear: 4-tap interpolation at pixel centers; valid iff the whole
    stencil is inside the raster and fully present. Invalid -> nodata.
    cubic: 4x4 Keys (a=-0.5) convolution at pixel centers; valid iff the
    whole 4x4 stencil is inside the raster and fully present.
    """
    out = np.full(pfx.shape, nodata, dtype=np.float64)
    ph, pw = patch.shape
    if resampling == "nearest":
        ix = np.floor(pfx).astype(np.int64)
        iy = np.floor(pfy).astype(np.int64)
        ok = (pfx >= 0) & (pfx < nx) & (pfy >= 0) & (pfy < ny)
        lx = ix - off_x
        ly = iy - off_y
        ok &= (lx >= 0) & (lx < pw) & (ly >= 0) & (ly < ph)
        v = patch[np.clip(ly, 0, ph - 1), np.clip(lx, 0, pw - 1)]
        ok &= ~np.isnan(v)
        out[ok] = v[ok]
        return out
    if resampling in ("cubic", "lanczos"):
        # separable convolution: cubic = 4 taps at {-1..+2}, lanczos-3 =
        # 6 taps at {-2..+3}; valid iff the whole stencil is inside the
        # raster and fully present (any NaN tap poisons the sum)
        t0 = -1 if resampling == "cubic" else -2
        wfn = _cubic_weights if resampling == "cubic" else _lanczos_weights
        ntap = 4 if resampling == "cubic" else 6
        t1 = t0 + ntap - 1
        if pw < ntap or ph < ntap:    # no stencil fits -> all nodata
            return out
        sx = pfx - 0.5
        sy = pfy - 0.5
        x0 = np.floor(sx).astype(np.int64)
        y0 = np.floor(sy).astype(np.int64)
        fx = sx - x0
        fy = sy - y0
        ok = (x0 + t0 >= 0) & (x0 + t1 <= nx - 1) \
            & (y0 + t0 >= 0) & (y0 + t1 <= ny - 1)
        lx = x0 - off_x
        ly = y0 - off_y
        ok &= (lx + t0 >= 0) & (lx + t1 <= pw - 1) \
            & (ly + t0 >= 0) & (ly + t1 <= ph - 1)
        lxc = np.clip(lx, -t0, max(pw - 1 - t1, -t0))
        lyc = np.clip(ly, -t0, max(ph - 1 - t1, -t0))
        wxs = wfn(fx)
        wys = wfn(fy)
        acc = np.zeros(pfx.shape, dtype=np.float64)
        for j in range(ntap):
            row = np.zeros(pfx.shape, dtype=np.float64)
            for i in range(ntap):
                row += patch[lyc + (j + t0), lxc + (i + t0)] * wxs[i]
            acc += row * wys[j]
        ok &= ~np.isnan(acc)        # any NaN tap poisons the sum
        out[ok] = acc[ok]
        return out
    if resampling != "bilinear":
        raise ValueError(f"unknown resampling {resampling!r}")
    sx = pfx - 0.5
    sy = pfy - 0.5
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0
    ok = (x0 >= 0) & (x0 + 1 <= nx - 1) & (y0 >= 0) & (y0 + 1 <= ny - 1)
    lx = x0 - off_x
    ly = y0 - off_y
    ok &= (lx >= 0) & (lx + 1 <= pw - 1) & (ly >= 0) & (ly + 1 <= ph - 1)
    lxc = np.clip(lx, 0, pw - 2)
    lyc = np.clip(ly, 0, ph - 2)
    v00 = patch[lyc, lxc]
    v01 = patch[lyc, lxc + 1]
    v10 = patch[lyc + 1, lxc]
    v11 = patch[lyc + 1, lxc + 1]
    v = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
         + v10 * (1 - fx) * fy + v11 * fx * fy)
    ok &= ~np.isnan(v00) & ~np.isnan(v01) & ~np.isnan(v10) & ~np.isnan(v11)
    out[ok] = v[ok]
    return out


def warp_oracle(src: np.ndarray, src_grid: RasterGrid, dst_grid: RasterGrid,
                resampling: str = "bilinear", nodata: float = 0.0) -> np.ndarray:
    """Pure-NumPy full-raster warp: the parity oracle for `warp_tiles`."""
    assert src.shape == (src_grid.ny, src_grid.nx)
    if resampling in _FOOTPRINT_KERNELS:
        fx0, fx1, fy0, fy1 = _footprints(dst_grid, src_grid, 0, 0,
                                         dst_grid.nx, dst_grid.ny)
        return _sample_footprint(src.astype(np.float64), 0, 0,
                                 fx0, fx1, fy0, fy1,
                                 src_grid.nx, src_grid.ny, resampling, nodata)
    tr = get_transformer(dst_grid.srs, src_grid.srs)
    iy, ix = np.mgrid[0:dst_grid.ny, 0:dst_grid.nx]
    wx, wy = dst_grid.pixel_centers_world(ix.astype(np.float64),
                                          iy.astype(np.float64))
    sxw, syw = tr(wx, wy)
    pfx, pfy = src_grid.world_to_pixelf(sxw, syw)
    return _sample(src.astype(np.float64), 0, 0, pfx, pfy,
                   src_grid.nx, src_grid.ny, resampling, nodata)


def _cover_flat_map(src_grid: RasterGrid, dst_grid: RasterGrid,
                    pad_px: float = 2.0):
    """Batch fn: src tile rows -> one row per (dst_tx, dst_ty) the tile may
    feed. Transforms a 3x3 sample grid per tile (corners + edge midpoints
    + center): corners alone bound only axis-separable monotone
    projections (the Mercator pair); Transverse Mercator / LCC bend the
    tile edges, and the midpoints recover a bounding box for any
    projection whose curvature is mild at tile scale (true within each
    projection's validity zone). One vectorized transform per batch —
    tile EXTENTS only, never pixels."""
    tr = get_transformer(src_grid.srs, dst_grid.srs)
    ntx, nty = dst_grid.n_tiles()

    def fn(b: pa.Table) -> pa.Table:
        # normalize the group-key columns: a band-less tileset warps as
        # band 0, and OVERVIEW rows (lod > 0) are dropped — their tile
        # coords are in overview units, not level-0 pixels, so warping
        # them with base-level math would corrupt output (warp the base
        # level, rebuild overviews after — the gdalwarp discipline)
        if "lod" in b.column_names:
            import pyarrow.compute as pc
            b = b.filter(pc.equal(b["lod"].cast(pa.int64()), 0))
        if "band" not in b.column_names:
            b = b.append_column(
                "band", pa.array(np.zeros(b.num_rows, np.int32)))
        if b.num_rows == 0:
            return b.append_column(
                "dst_tx", pa.array([], pa.int32())).append_column(
                "dst_ty", pa.array([], pa.int32()))
        txs = b["tile_x"].to_numpy().astype(np.int64)
        tys = b["tile_y"].to_numpy().astype(np.int64)
        n = b.num_rows
        w = src_grid.extents
        rx, ry = src_grid.res
        # src tile extents padded by the kernel's stencil reach
        # (_COVER_PAD src px) so stencils that straddle a tile seam still
        # find the neighbor tile in the group; clamped to the raster
        # (edge tiles' 256-block footprint can reach past the extents /
        # outside the projection domain). Pure affine math — vectorized
        # over the batch, no per-tile Python.
        x0 = np.maximum(w.llx + (txs * TILE - pad_px) * rx, w.llx)
        x1 = np.minimum(w.llx + ((txs + 1) * TILE + pad_px) * rx, w.urx)
        y1 = np.minimum(w.ury - (tys * TILE - pad_px) * ry, w.ury)
        y0 = np.maximum(w.ury - ((tys + 1) * TILE + pad_px) * ry, w.lly)
        xm, ym = (x0 + x1) / 2.0, (y0 + y1) / 2.0
        # 9 sample points per tile, all tiles in ONE transform call
        sx = np.stack([x0, xm, x1, x0, xm, x1, x0, xm, x1], axis=1)
        sy = np.stack([y0, y0, y0, ym, ym, ym, y1, y1, y1], axis=1)
        wx, wy = tr(sx.ravel(), sy.ravel())
        pfx, pfy = dst_grid.world_to_pixelf(wx, wy)
        pfx = pfx.reshape(n, 9); pfy = pfy.reshape(n, 9)
        tx0 = np.maximum(0, np.floor(pfx.min(axis=1) / TILE).astype(np.int64))
        tx1 = np.minimum(ntx - 1,
                         np.floor(pfx.max(axis=1) / TILE).astype(np.int64))
        ty0 = np.maximum(0, np.floor(pfy.min(axis=1) / TILE).astype(np.int64))
        ty1 = np.minimum(nty - 1,
                         np.floor(pfy.max(axis=1) / TILE).astype(np.int64))
        # expand each tile to its (dst_tx, dst_ty) cover, vectorized;
        # counts clamp at 0 so a tile mapping entirely outside the dst
        # grid is dropped (the vectortile cover() drop semantics)
        nxt = np.maximum(tx1 - tx0 + 1, 0)
        nyt = np.maximum(ty1 - ty0 + 1, 0)
        cnt = nxt * nyt
        idx = np.repeat(np.arange(n, dtype=np.int64), cnt)
        starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        off = np.arange(int(cnt.sum()), dtype=np.int64) \
            - np.repeat(starts, cnt)
        nx_safe = np.maximum(nxt, 1)
        dx = tx0[idx] + off % nx_safe[idx]
        dy = ty0[idx] + off // nx_safe[idx]
        t = b.take(pa.array(idx))
        return t.append_column("dst_tx", pa.array(dx.astype(np.int32))) \
                .append_column("dst_ty", pa.array(dy.astype(np.int32)))

    return fn


def _resample_group(src_grid: RasterGrid, dst_grid: RasterGrid,
                    resampling: str, nodata: float):
    """map_groups fn: all src tiles feeding one dst tile -> the dst tile."""

    def fn(g: pa.Table) -> pa.Table:
        tx = int(g["dst_tx"][0].as_py())
        ty = int(g["dst_ty"][0].as_py())
        # global src-pixel bbox needed by this group = bbox of member tiles
        stx = g["tile_x"].to_numpy()
        sty = g["tile_y"].to_numpy()
        gx0 = int(stx.min()) * TILE
        gy0 = int(sty.min()) * TILE
        gx1 = min((int(stx.max()) + 1) * TILE, src_grid.nx)
        gy1 = min((int(sty.max()) + 1) * TILE, src_grid.ny)
        patch = np.full((gy1 - gy0, gx1 - gx0), np.nan, dtype=np.float64)
        for i in range(g.num_rows):
            vw = int(g["valid_w"][i].as_py())
            vh = int(g["valid_h"][i].as_py())
            dt = g["dtype"][i].as_py()
            arr = np.frombuffer(g["px"][i].as_py(), dtype=_np_dtype(dt))
            arr = arr.reshape(TILE, TILE)[:vh, :vw].astype(np.float64)
            ox = int(stx[i]) * TILE - gx0
            oy = int(sty[i]) * TILE - gy0
            patch[oy:oy + vh, ox:ox + vw] = arr

        vw = min(TILE, dst_grid.nx - tx * TILE)
        vh = min(TILE, dst_grid.ny - ty * TILE)
        if resampling in _FOOTPRINT_KERNELS:
            fx0, fx1, fy0, fy1 = _footprints(dst_grid, src_grid,
                                             tx * TILE, ty * TILE, vw, vh)
            vals = _sample_footprint(patch, gx0, gy0, fx0, fx1, fy0, fy1,
                                     src_grid.nx, src_grid.ny,
                                     resampling, nodata)
        else:
            iy, ix = np.mgrid[0:vh, 0:vw]
            wx, wy = dst_grid.pixel_centers_world(
                (ix + tx * TILE).astype(np.float64),
                (iy + ty * TILE).astype(np.float64))
            tr = get_transformer(dst_grid.srs, src_grid.srs)
            sxw, syw = tr(wx, wy)
            pfx, pfy = src_grid.world_to_pixelf(sxw, syw)
            vals = _sample(patch, gx0, gy0, pfx, pfy,
                           src_grid.nx, src_grid.ny, resampling, nodata)
        block = np.full((TILE, TILE), nodata, dtype=np.float64)
        block[:vh, :vw] = vals
        return pa.table({
            "lod": pa.array([0], type=pa.int32()),
            "band": pa.array([int(g["band"][0].as_py())
                              if "band" in g.column_names else 0],
                             type=pa.int32()),
            "tile_x": pa.array([tx], type=pa.int32()),
            "tile_y": pa.array([ty], type=pa.int32()),
            "valid_w": pa.array([vw], type=pa.int32()),
            "valid_h": pa.array([vh], type=pa.int32()),
            "dtype": pa.array(["float64"]),
            "px": pa.array([block.tobytes()], type=pa.large_binary()),
        })

    return fn


def warp_tiles(tiles: "ray.data.Dataset", src_grid: RasterGrid,
               dst_grid: RasterGrid, resampling: str = "bilinear",
               nodata: float = 0.0) -> "ray.data.Dataset":
    """Warp a TILE_SCHEMA dataset from src_grid to dst_grid.

    Emits one row per dst tile that at least one src tile may feed (dst tiles
    with no source coverage are absent — compose with `solid` to backfill
    pure-nodata tiles when a full raster is required). Pixels match
    `warp_oracle` exactly on covered tiles.
    """
    if resampling not in _COVER_PAD:
        raise ValueError(
            f"unknown resampling {resampling!r}; "
            f"supported: {sorted(_COVER_PAD)}")
    get_transformer(src_grid.srs, dst_grid.srs)  # validate pair up-front
    covered = tiles.map_batches(
        _cover_flat_map(src_grid, dst_grid, pad_px=_COVER_PAD[resampling]),
        batch_format="pyarrow")
    # band is part of the group key: a multi-band tileset has one row per
    # band at the same (tile_x, tile_y), and merging bands into one patch
    # would mix their pixels nondeterministically (the focal/CC band-
    # namespacing rule). Overviews are dropped in the cover map.
    return covered.groupby(["band", "dst_tx", "dst_ty"]).map_groups(
        _resample_group(src_grid, dst_grid, resampling, nodata),
        batch_format="pyarrow")
