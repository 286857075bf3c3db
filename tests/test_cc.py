"""Raster connected components: local labeling kernel + distributed
seam stitching vs the whole-raster oracle."""

import numpy as np
import ray.data

from gdal_drivers_ray.grid import TILE
from gdal_drivers_ray.stages.cc import (label_mask, raster_cc,
                                        raster_cc_oracle)


def _tiles(src):
    ny, nx = src.shape
    rows = []
    for ty in range(-(-ny // TILE)):
        for tx in range(-(-nx // TILE)):
            vw = min(TILE, nx - tx * TILE)
            vh = min(TILE, ny - ty * TILE)
            blk = np.zeros((TILE, TILE))
            blk[:vh, :vw] = src[ty * TILE:ty * TILE + vh,
                                tx * TILE:tx * TILE + vw]
            rows.append({"lod": 0, "band": 0, "tile_x": tx, "tile_y": ty,
                         "valid_w": vw, "valid_h": vh, "dtype": "float64",
                         "px": blk.tobytes()})
    return ray.data.from_items(rows)


def test_label_mask_spiral():
    """A spiral needs many propagation rounds — the run-min fixpoint
    must still label it as ONE component."""
    n = 21
    m = np.zeros((n, n), bool)
    m[0, :] = True; m[:, -1] = True; m[-1, :] = True
    m[2:, 0] = True; m[2, :n - 2] = True; m[2:n - 2, n - 3] = True
    g = (np.arange(n * n).reshape(n, n)).astype(np.int64)
    lab = label_mask(m, g)
    assert len(np.unique(lab[m])) == 1
    assert lab[m].min() == g[m].min()


def test_raster_cc_matches_oracle_random(ray_session):
    rng = np.random.default_rng(13)
    src = rng.integers(0, 2, (300, 520)).astype(np.float64) * 200.0
    got = raster_cc(_tiles(src).repartition(4), nx=520, ny=300,
                    threshold=100.0).to_pandas()
    want = raster_cc_oracle(src, 100.0)
    gd = dict(zip(got["component"].astype(int), got["n_px"].astype(int)))
    assert gd == want


def test_raster_cc_component_spanning_four_tiles(ray_session):
    """A plus-shaped component crossing both seams around (256, 256)
    resolves to one label = its min pixel id."""
    src = np.zeros((520, 520))
    src[250:262, 200:320] = 255.0     # horizontal bar across x-seam 256
    src[200:320, 250:262] = 255.0     # vertical bar across y-seam 256
    got = raster_cc(_tiles(src), nx=520, ny=520,
                    threshold=100.0).to_pandas()
    assert len(got) == 1
    assert int(got["component"].iloc[0]) == 200 * 520 + 250
    assert int(got["n_px"].iloc[0]) == int((src >= 100.0).sum())


def test_dp_keep_mask_properties():
    """DP invariants: endpoints always kept; tol=0 keeps every
    non-collinear vertex; huge tol keeps only endpoints; collinear runs
    always drop; result is reconstruction-accurate within tol."""
    from gdal_drivers_ray.stages.simplify import dp_keep_mask

    # straight line -> endpoints only at any tol
    xs = np.arange(50, dtype=np.int64) * 3
    ys = np.arange(50, dtype=np.int64) * 2
    k = dp_keep_mask(xs, ys, 0)
    assert k.sum() == 2 and k[0] and k[-1]
    # one kink at index 25 with offset 10 -> kept for tol < 10, dropped
    # for tol >= 10
    ys2 = ys.copy(); ys2[25] += 10
    assert dp_keep_mask(xs, ys2, 3)[25]
    assert not dp_keep_mask(xs, ys2, 12)[25]
    # zigzag: tol=0 keeps everything
    zz = np.array([0, 1, 0, 1, 0, 1], dtype=np.int64)
    assert dp_keep_mask(np.arange(6, dtype=np.int64), zz, 0).all()
    # closed ring (a == b endpoints) doesn't crash and keeps the far point
    cx = np.array([0, 10, 10, 0, 0], dtype=np.int64)
    cy = np.array([0, 0, 10, 10, 0], dtype=np.int64)
    kk = dp_keep_mask(cx, cy, 2)
    assert kk[0] and kk[-1] and kk.sum() >= 4
    # max perpendicular error of the simplified chain is <= tol
    rng = np.random.default_rng(5)
    xs3 = np.cumsum(rng.integers(1, 4, 80)).astype(np.int64)
    ys3 = rng.integers(0, 30, 80).astype(np.int64)
    tol = 5
    keep = dp_keep_mask(xs3, ys3, tol)
    ki = np.flatnonzero(keep)
    for a, b in zip(ki[:-1], ki[1:]):
        dx, dy = xs3[b] - xs3[a], ys3[b] - ys3[a]
        for j in range(a + 1, b):
            cross = (xs3[j] - xs3[a]) * dy - (ys3[j] - ys3[a]) * dx
            assert cross * cross <= tol * tol * (dx * dx + dy * dy)


def test_kmeans_distributed_bit_equals_oracle(ray_session):
    """Distributed Lloyd == straight-line oracle BIT-FOR-BIT on any
    block layout (exact quantized sums + fixed-order score loop)."""
    import pyarrow as pa
    from gdal_drivers_ray.stages.kmeans import kmeans_fit, kmeans_fit_oracle

    rng = np.random.default_rng(3)
    n, dim, k = 300, 16, 5
    vecs = rng.normal(size=(n, dim))
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64())),
    })
    for parts in (2, 9):
        c, cnt = kmeans_fit(ray.data.from_arrow(t).repartition(parts),
                            k=k, n_iter=3)
        co, cnto = kmeans_fit_oracle(vecs, k=k, n_iter=3)
        assert np.array_equal(c, co)
        assert np.array_equal(cnt, cnto)
    assert cnt.sum() == n


def test_focal_multiband_separated_and_no_phantoms(ray_session):
    """Two bands of the same tile grid stay separate through the halo
    exchange, and a sparse tileset emits NO phantom tiles."""
    from gdal_drivers_ray.stages.focal import focal_sum3, focal_sum3_oracle

    ny = nx = 300
    src0 = np.full((ny, nx), 1.0)
    src1 = np.full((ny, nx), 10.0)
    rows = []
    for band, src in ((0, src0), (1, src1)):
        for ty in range(-(-ny // TILE)):
            for tx in range(-(-nx // TILE)):
                if band == 1 and (tx, ty) == (1, 1):
                    continue                  # sparse: band 1 misses a tile
                vw = min(TILE, nx - tx * TILE)
                vh = min(TILE, ny - ty * TILE)
                blk = np.zeros((TILE, TILE))
                blk[:vh, :vw] = src[ty * TILE:ty * TILE + vh,
                                    tx * TILE:tx * TILE + vw]
                rows.append({"lod": 0, "band": band, "tile_x": tx,
                             "tile_y": ty, "valid_w": vw, "valid_h": vh,
                             "dtype": "float64", "px": blk.tobytes()})
    out = focal_sum3(ray.data.from_items(rows).repartition(5),
                     nx=nx, ny=ny, nodata=-1.0).to_pandas()
    # band 0: full 2x2 tile grid present in the output; band 1: 3 tiles
    assert len(out[out["band"] == 0]) == 4
    assert len(out[out["band"] == 1]) == 3      # no phantom (1,1)
    # interior values never mix bands: 9*1 for band 0, 9*10 for band 1
    for _, r in out.iterrows():
        a = np.frombuffer(r["px"], dtype=np.float64).reshape(TILE, TILE)
        vals = a[(a != -1.0)]
        want = 9.0 if r["band"] == 0 else 90.0
        assert (vals == want).all()


def test_raster_cc_multiband_no_merge(ray_session):
    """The same mask in two bands yields two DISJOINT component sets
    (band-namespaced gids + band-keyed seams)."""
    src = np.zeros((300, 300))
    src[100:150, 100:150] = 255.0
    rows = []
    for band in (0, 1):
        for ty in range(2):
            for tx in range(2):
                vw = min(TILE, 300 - tx * TILE)
                vh = min(TILE, 300 - ty * TILE)
                blk = np.zeros((TILE, TILE))
                blk[:vh, :vw] = src[ty * TILE:ty * TILE + vh,
                                    tx * TILE:tx * TILE + vw]
                rows.append({"lod": 0, "band": band, "tile_x": tx,
                             "tile_y": ty, "valid_w": vw, "valid_h": vh,
                             "dtype": "float64", "px": blk.tobytes()})
    out = raster_cc(ray.data.from_items(rows), nx=300, ny=300,
                    threshold=100.0).to_pandas()
    assert len(out) == 2                          # one component PER BAND
    assert sorted(out["n_px"]) == [2500, 2500]
    comps = sorted(out["component"].astype(int))
    assert comps[0] == 100 * 300 + 100            # band 0 namespace
    assert comps[1] == 1 * 300 * 300 + 100 * 300 + 100   # band 1


def test_kmeans_is_actually_lloyd():
    """Algorithmic-intent pins the shared-kernel oracle cannot give
    (the dot-product-metric bug hash-PASSED): (1) assignment is truly
    nearest-centroid under Euclidean distance, including against a
    large-norm decoy centroid; (2) Lloyd inertia is non-increasing
    across iterations."""
    from gdal_drivers_ray.stages.kmeans import (_Q, _neg_dist2, _quantize,
                                                kmeans_fit_oracle)

    # (1) large-norm decoy: points near the small centroid must NOT be
    # stolen by the far, big-norm one (a raw dot-product argmax steals)
    vq = _quantize(np.array([[0.2, 0.0], [0.1, 0.1]]))
    cent = np.array([[0.15, 0.05], [10.0, 10.0]])
    assign = np.argmax(_neg_dist2(vq, cent), axis=1)
    assert (assign == 0).all()
    # exhaustive: random points/centroids, compare to brute-force argmin
    rng = np.random.default_rng(2)
    v = rng.normal(size=(200, 8))
    c = rng.normal(size=(6, 8)) * rng.uniform(0.1, 5.0, (6, 1))
    got = np.argmax(_neg_dist2(_quantize(v), c), axis=1)
    vquant = _quantize(v).astype(np.float64) / _Q
    d2 = ((vquant[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    assert (got == np.argmin(d2, axis=1)).all()

    # (2) monotone inertia over the oracle's iterations
    vecs = rng.normal(size=(300, 8))
    vquant = _quantize(vecs).astype(np.float64) / _Q
    prev = np.inf
    for it in range(1, 6):
        cent, _ = kmeans_fit_oracle(vecs, k=4, n_iter=it)
        d2 = ((vquant[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        inertia = d2.min(axis=1).sum()
        assert inertia <= prev + 1e-9
        prev = inertia


def test_dp_exact_for_large_coordinates():
    """The squared cross product wraps int64 from |coord| ~ 2^15 — the
    exact (object-int) escalation must keep far-off vertices."""
    import numpy as np

    from gdal_drivers_ray.stages.simplify import dp_keep_mask

    xs = np.array([-32767, 0, 32767], dtype=np.int64)
    ys = np.array([-32767, 32767, -32767], dtype=np.int64)
    keep = dp_keep_mask(xs, ys, tol=1)
    assert keep.tolist() == [True, True, True]  # wrapped math dropped [1]
    # and far beyond the old bound, against a straight-line baseline
    big = 1 << 40
    xs = np.array([-big, 0, big], dtype=np.int64)
    ys = np.array([-big, big, -big], dtype=np.int64)
    assert dp_keep_mask(xs, ys, tol=1).tolist() == [True, True, True]


def test_pyramid_multiband(ray_session):
    """Each band rolls up independently: a 2-band constant tileset keeps
    both bands per parent cell (cell-only grouping mixed them)."""
    import numpy as np
    import ray.data

    from gdal_drivers_ray.sources import solid
    from gdal_drivers_ray.stages.pyramid import build_pyramid

    world = solid.Extents(0.0, 0.0, 1024.0, 1024.0)
    spec = solid.SolidSpec(srs="local", size=(1024, 1024), extents=world,
                           bands=[solid.Band(30.0, "Byte"),
                                  solid.Band(200.0, "Byte")])
    tiles = solid.solid_dataset(spec, include_overviews=False)
    out = build_pyramid(tiles, base_lod=2, top_lod=1).to_pandas()
    lvl1 = out[out["lod"] == 1]
    # 2x2 parents x 2 bands
    assert len(lvl1) == 8
    assert sorted(lvl1["band"].unique().tolist()) == [0, 1]
    for _, r in lvl1.iterrows():
        px = np.frombuffer(r["px"], dtype=np.uint8).reshape(256, 256)
        want = 30 if r["band"] == 0 else 200
        assert (px[:r["valid_h"], :r["valid_w"]] == want).all()
