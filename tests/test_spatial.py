"""PIP (ray-cast + cell prefilter) and k-ring kNN vs brute-force oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gdal_drivers_ray.grid import Extents
from gdal_drivers_ray.stages import spatial

WORLD = Extents(0.0, 0.0, 100.0, 100.0)


def winding_inside(x, y, ring):
    """Independent oracle: nonzero winding number (differs from the engine's
    even-odd only for self-intersecting rings, which we don't generate)."""
    rx, ry = ring[:, 0], ring[:, 1]
    if rx[0] == rx[-1] and ry[0] == ry[-1]:
        rx, ry = rx[:-1], ry[:-1]
    wn = 0
    for i in range(len(rx)):
        x1, y1 = rx[i], ry[i]
        x2, y2 = rx[(i + 1) % len(rx)], ry[(i + 1) % len(rx)]
        if y1 <= y < y2 and (x2 - x1) * (y - y1) - (x - x1) * (y2 - y1) > 0:
            wn += 1
        elif y2 <= y < y1 and (x2 - x1) * (y - y1) - (x - x1) * (y2 - y1) < 0:
            wn -= 1
    return wn != 0


def test_ray_cast_triangle_analytic():
    tri = np.array([(0, 0), (10, 0), (0, 10)], dtype=float)
    rng = np.random.default_rng(0)
    xs = rng.uniform(-2, 12, 500)
    ys = rng.uniform(-2, 12, 500)
    got = spatial.points_in_ring(xs, ys, tri)
    want = (xs > 0) & (ys > 0) & (xs + ys < 10)
    # skip points ON the boundary (edge conventions differ)
    off_edge = (np.abs(xs) > 1e-9) & (np.abs(ys) > 1e-9) & \
               (np.abs(xs + ys - 10) > 1e-9)
    assert (got[off_edge] == want[off_edge]).all()


def test_polygon_with_hole():
    outer = np.array([(0, 0), (20, 0), (20, 20), (0, 20)], dtype=float)
    hole = np.array([(5, 5), (15, 5), (15, 15), (5, 15)], dtype=float)
    xs = np.array([1.0, 10.0, 7.0, 25.0])
    ys = np.array([1.0, 10.0, 4.0, 10.0])
    got = spatial.point_in_polygon(xs, ys, [outer, hole])
    assert list(got) == [True, False, True, False]


def test_ray_cast_vs_winding_random_polygon():
    rng = np.random.default_rng(5)
    # star-shaped (non-convex, non-self-intersecting) polygon around (50,50)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 12))
    rad = rng.uniform(10, 40, 12)
    ring = np.stack([50 + rad * np.cos(ang), 50 + rad * np.sin(ang)], axis=1)
    xs = rng.uniform(0, 100, 1000)
    ys = rng.uniform(0, 100, 1000)
    got = spatial.points_in_ring(xs, ys, ring)
    want = np.array([winding_inside(x, y, ring) for x, y in zip(xs, ys)])
    assert (got == want).mean() > 0.999   # boundary-epsilon disagreements only


def test_pip_join_with_prefilter(ray_session):
    import ray.data
    rng = np.random.default_rng(7)
    polys = []
    for pid in range(6):
        cx, cy = rng.uniform(15, 85, 2)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 8))
        rad = rng.uniform(4, 12, 8)
        ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        polys.append((pid, [ring]))
    n = 2000
    xs = rng.uniform(0, 100, n)
    ys = rng.uniform(0, 100, n)
    pts = ray.data.from_arrow(pa.table({
        "point_id": pa.array(range(n), pa.int64()),
        "x": pa.array(xs), "y": pa.array(ys)}))
    got = spatial.pip_join(pts, polys, WORLD, lod=4).take_all()
    got_set = {(r["point_id"], r["poly_id"]) for r in got}
    want = set()
    for pid, rings in polys:
        hit = spatial.point_in_polygon(xs, ys, rings)
        want |= {(int(i), pid) for i in np.where(hit)[0]}
    assert got_set == want
    assert len(want) > 50


def test_pip_join_shuffle_matches_broadcast(ray_session):
    """Both-sides-large PIP (cell cogroup) returns exactly the broadcast
    plan's (point, polygon) matches."""
    import ray.data
    rng = np.random.default_rng(31)
    polys = []
    for pid in range(6):
        cx, cy = rng.uniform(15, 85, 2)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 8))
        rad = rng.uniform(4, 12, 8)
        ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)],
                        axis=1)
        polys.append((pid, [ring]))
    n = 3000
    xs = rng.uniform(0, 100, n)
    ys = rng.uniform(0, 100, n)
    pts = ray.data.from_arrow(pa.table({
        "point_id": pa.array(range(n), pa.int64()),
        "x": pa.array(xs), "y": pa.array(ys)}))
    want = {(r["point_id"], r["poly_id"]) for r in
            spatial.pip_join(pts, polys, WORLD, lod=4).take_all()}
    poly_ds = ray.data.from_arrow(pa.table({
        "poly_id": pa.array([p for p, _ in polys], pa.int64()),
        "rings": pa.array([spatial.pack_rings(r) for _, r in polys],
                          pa.large_binary())}))
    got = {(r["point_id"], r["poly_id"]) for r in
           spatial.pip_join_shuffle(pts, poly_ds, WORLD, lod=4,
                                    num_partitions=8).take_all()}
    assert got == want
    assert len(want) > 50


def test_pack_rings_round_trip():
    rings = [np.array([[0.0, 1.0], [2.0, 3.0], [4.0, 5.0]]),
             np.array([[9.0, 8.0], [7.0, 6.0]])]
    back = spatial.unpack_rings(spatial.pack_rings(rings))
    assert len(back) == 2
    np.testing.assert_array_equal(back[0], rings[0])
    np.testing.assert_array_equal(back[1], rings[1])


def test_knn_kring_matches_bruteforce(ray_session):
    import ray.data
    rng = np.random.default_rng(11)
    n = 3000
    xs = rng.uniform(0, 100, n)
    ys = rng.uniform(0, 100, n)
    pts = ray.data.from_arrow(pa.table({
        "point_id": pa.array(range(n), pa.int64()),
        "x": pa.array(xs), "y": pa.array(ys)}))
    queries = pd.DataFrame({"query_id": np.arange(8, dtype=np.int64),
                            "x": rng.uniform(0, 100, 8),
                            "y": rng.uniform(0, 100, 8)})
    k = 7
    got = spatial.knn_kring(pts, queries, k=k, world=WORLD, lod=5)
    for _, q in queries.iterrows():
        d = np.hypot(xs - q.x, ys - q.y)
        order = np.lexsort((np.arange(n), d))[:k]
        want = list(order)
        g = got[got["query_id"] == q.query_id].sort_values("rank")
        assert list(g["neighbor_id"]) == want, q.query_id
        np.testing.assert_allclose(np.sort(g["dist"]), np.sort(d[order]))


def test_knn_kring_query_outside_cloud(ray_session):
    import ray.data
    # all points clustered in one corner; query far away must still find k
    xs = np.linspace(1, 5, 50)
    ys = np.linspace(1, 5, 50)
    pts = ray.data.from_arrow(pa.table({
        "point_id": pa.array(range(50), pa.int64()),
        "x": pa.array(xs), "y": pa.array(ys)}))
    queries = pd.DataFrame({"query_id": np.array([0], dtype=np.int64),
                            "x": [95.0], "y": [95.0]})
    got = spatial.knn_kring(pts, queries, k=3, world=WORLD, lod=5)
    assert list(got["neighbor_id"]) == [49, 48, 47]


def test_knn_kring_large_pointset(ray_session):
    """Distributed-plan stress: 200k points across many blocks. The point
    payload must stream (only the per-cell count table and the tiny partial
    top-k rows ever leave the tasks) and still match brute force exactly."""
    import ray.data
    rng = np.random.default_rng(23)
    n = 200_000
    xs = rng.uniform(0, 100, n)
    ys = rng.uniform(0, 100, n)
    pts = ray.data.from_arrow(pa.table({
        "point_id": pa.array(range(n), pa.int64()),
        "x": pa.array(xs), "y": pa.array(ys)})).repartition(16)
    queries = pd.DataFrame({"query_id": np.arange(5, dtype=np.int64),
                            "x": rng.uniform(0, 100, 5),
                            "y": rng.uniform(0, 100, 5)})
    k = 9
    got = spatial.knn_kring(pts, queries, k=k, world=WORLD, lod=6)
    assert len(got) == 5 * k
    for _, q in queries.iterrows():
        d = np.hypot(xs - q.x, ys - q.y)
        want = list(np.lexsort((np.arange(n), d))[:k])
        g = got[got["query_id"] == q.query_id].sort_values("rank")
        assert list(g["neighbor_id"]) == want, q.query_id


def test_asof_join_semantics(ray_session):
    """AS-OF: latest right <= left time per key; ties -> max tie_col;
    unmatched left drops (stages/joins.asof_join)."""
    import pandas as pd
    import ray.data

    from gdal_drivers_ray.stages.joins import asof_join

    left = ray.data.from_items([
        {"event_id": 100, "ts": 50, "user_id": 1},
        {"event_id": 101, "ts": 5, "user_id": 1},   # before any right -> drop
        {"event_id": 102, "ts": 30, "user_id": 2},
        {"event_id": 103, "ts": 10, "user_id": 3},  # user 3 has no rights
    ])
    right = ray.data.from_items([
        {"event_id": 1, "ts": 10, "user_id": 1},
        {"event_id": 2, "ts": 50, "user_id": 1},   # equal ts -> matches
        {"event_id": 3, "ts": 50, "user_id": 1},   # tie: higher id wins
        {"event_id": 4, "ts": 30, "user_id": 2},
    ])
    out = asof_join(left, right, key="user_id", time_col="ts",
                    tie_col="event_id").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert out["event_id"].tolist() == [100, 102]
    assert out["event_id_r"].tolist() == [3, 4]    # tie broke to id 3
    assert out["ts_r"].tolist() == [50, 30]


def test_asof_join_mixed_schemas_and_bucket_split(ray_session):
    """Left/right with different columns; the bucketed hot-key plan must
    equal the single-reducer plan exactly (carry rows across borders)."""
    import pandas as pd
    import ray.data

    from gdal_drivers_ray.stages.joins import asof_join

    rng = np.random.default_rng(17)
    nl, nr = 400, 120
    lt = pd.DataFrame({"user_id": rng.integers(0, 3, nl),
                       "ts": rng.integers(0, 1000, nl),
                       "event_id": np.arange(nl),
                       "payload": rng.standard_normal(nl)})
    rtb = pd.DataFrame({"user_id": rng.integers(0, 3, nr),
                        "ts": rng.integers(0, 1000, nr),
                        "event_id": np.arange(nr),
                        "price": rng.integers(0, 100, nr)})  # extra col
    l, r = ray.data.from_pandas(lt), ray.data.from_pandas(rtb)

    def norm(ds):
        return ds.to_pandas().sort_values(["event_id"]) \
            .reset_index(drop=True)[["event_id", "ts", "ts_r", "event_id_r"]]

    plain = norm(asof_join(l, r, key="user_id", time_col="ts",
                           tie_col="event_id"))
    bucketed = norm(asof_join(l, r, key="user_id", time_col="ts",
                              tie_col="event_id", bucket_width=50.0))
    pd.testing.assert_frame_equal(plain, bucketed)
    assert len(plain) > 100
    # oracle spot check on one user
    u = lt[lt.user_id == 1]
    ru = rtb[rtb.user_id == 1].sort_values(["ts", "event_id"])
    for _, row in u.iloc[:20].iterrows():
        elig = ru[ru.ts <= row.ts]
        got = plain[plain.event_id == row.event_id]
        if elig.empty:
            assert got.empty
        else:
            assert got["event_id_r"].iloc[0] == elig.iloc[-1]["event_id"]


def test_range_join_semantics(ray_session):
    """Half-open [lo, hi) containment; intervals spanning many buckets;
    points matching multiple overlapping intervals."""
    import pandas as pd
    import ray.data

    from gdal_drivers_ray.stages.joins import range_join

    pts = ray.data.from_items([{"pid": i, "v": float(x)}
                               for i, x in enumerate([0.0, 5.0, 10.0, 99.0,
                                                      150.0, 250.0])])
    iv = pd.DataFrame({"iid": [0, 1, 2],
                       "lo": [0.0, 5.0, 100.0],
                       "hi": [10.0, 200.0, 200.0]})  # 1 spans many buckets
    out = range_join(pts, iv, "v", "lo", "hi", bucket_width=10.0) \
        .to_pandas().sort_values(["pid", "iid"]).reset_index(drop=True)
    got = set(zip(out["pid"], out["iid"]))
    assert got == {(0, 0), (1, 0), (1, 1), (2, 1), (3, 1), (4, 1), (4, 2)}
    # hi is exclusive: v=10 not in [0,10); v=250 matches nothing


def test_zonal_stats_vs_numpy_oracle(ray_session):
    """Raster<->vector join: per-polygon pixel stats match a full-raster
    NumPy computation exactly."""
    import ray.data

    from gdal_drivers_ray.grid import Extents
    from gdal_drivers_ray.stages.spatial import point_in_polygon, zonal_stats

    rng = np.random.default_rng(9)
    world = Extents(0.0, 0.0, 1024.0, 1024.0)
    lod = 2  # 4x4 tiles over 1024 px (1 unit/px)
    full = rng.uniform(0, 100, (1024, 1024))
    rows = []
    for ty in range(4):
        for tx in range(4):
            block = full[ty*256:(ty+1)*256, tx*256:(tx+1)*256]
            rows.append({"lod": lod, "band": 0, "tile_x": tx, "tile_y": ty,
                         "valid_w": 256, "valid_h": 256, "dtype": "float64",
                         "px": block.tobytes()})
    tiles = ray.data.from_items(rows)

    tri = [np.array([[100.0, 100.0], [700.0, 150.0], [300.0, 800.0]])]
    hole_poly = [np.array([[500.0, 500.0], [1000.0, 500.0],
                           [1000.0, 1000.0], [500.0, 1000.0]]),
                 np.array([[600.0, 600.0], [800.0, 600.0],
                           [800.0, 800.0], [600.0, 800.0]])]
    polys = [(1, tri), (2, hole_poly)]

    got = zonal_stats(tiles, polys, world, lod).to_pandas() \
        .set_index("poly_id").sort_index()

    # oracle: pixel centers of the full raster (note y axis: row 0 = top)
    jy, jx = np.mgrid[0:1024, 0:1024]
    wx = (jx + 0.5).ravel()
    wy = (1024.0 - (jy + 0.5)).ravel()
    vals = full.ravel()
    for pid, rings in polys:
        m = point_in_polygon(wx, wy, rings)
        assert int(got.loc[pid, "n_px"]) == int(m.sum())
        np.testing.assert_allclose(got.loc[pid, "px_sum"], vals[m].sum(),
                                   rtol=1e-12)
        assert got.loc[pid, "px_min"] == vals[m].min()
        assert got.loc[pid, "px_max"] == vals[m].max()

    # both-sides-large plan: polygons as a Dataset through the cell
    # cogroup — identical stats
    import ray.data as rd

    from gdal_drivers_ray.stages.spatial import (pack_rings,
                                                 zonal_stats_shuffle)
    poly_ds = rd.from_arrow(pa.table({
        "poly_id": pa.array([p for p, _ in polys], pa.int64()),
        "rings": pa.array([pack_rings(r) for _, r in polys],
                          pa.large_binary())}))
    got_s = zonal_stats_shuffle(tiles, poly_ds, world, lod,
                                num_partitions=8).to_pandas() \
        .set_index("poly_id").sort_index()
    for col in ("n_px", "px_min", "px_max"):
        assert (got_s[col] == got[col]).all()
    np.testing.assert_allclose(got_s["px_sum"], got["px_sum"], rtol=1e-12)


def test_pip_shuffle_salted_hot_cell(ray_session):
    """50% of points in ONE cell: forced salting (hot_threshold=100,
    n_salts=4) must (a) return exactly the broadcast plan's matches and
    (b) bound every cogroup sub-key to ~|hot cell| / n_salts point rows."""
    import ray.data
    rng = np.random.default_rng(77)
    n = 2000
    # half the points inside one lod-4 cell (cell width 100/16 = 6.25)
    xs = np.concatenate([rng.uniform(50.0, 56.2, n // 2),
                         rng.uniform(0, 100, n - n // 2)])
    ys = np.concatenate([rng.uniform(50.0, 56.2, n // 2),
                         rng.uniform(0, 100, n - n // 2)])
    polys = []
    for pid in range(4):
        cx, cy = rng.uniform(30, 70, 2)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 8))
        rad = rng.uniform(5, 15, 8)
        ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)],
                        axis=1)
        polys.append((pid, [ring]))
    pts = ray.data.from_arrow(pa.table({
        "point_id": pa.array(range(n), pa.int64()),
        "x": pa.array(xs), "y": pa.array(ys)}))
    poly_ds = ray.data.from_arrow(pa.table({
        "poly_id": pa.array([p for p, _ in polys], pa.int64()),
        "rings": pa.array([spatial.pack_rings(r) for _, r in polys],
                          pa.large_binary())}))
    want = {(r["point_id"], r["poly_id"]) for r in
            spatial.pip_join(pts, polys, WORLD, lod=4).take_all()}
    got = {(r["point_id"], r["poly_id"]) for r in
           spatial.pip_join_shuffle(pts, poly_ds, WORLD, lod=4,
                                    num_partitions=8, n_salts=4,
                                    hot_threshold=100).take_all()}
    assert got == want and len(want) > 20

    # boundedness of the salted keys, on the same inputs the plan uses
    from gdal_drivers_ray.grid import tile_of_points
    tx, ty = tile_of_points(xs, ys, WORLD, 4)
    cells = tx * 16 + ty
    uc, cnt = np.unique(cells, return_counts=True)
    hot = uc[cnt > 100]
    assert len(hot) >= 1
    keys = spatial.salted_cell_keys(cells, hot, 4)
    _, kc = np.unique(keys, return_counts=True)
    assert kc.max() <= max(cnt[cnt <= 100].max(initial=0),
                           int(np.ceil(cnt.max() / 4)) + 4)


def test_zonal_shuffle_salted_hot_cell(ray_session):
    """Many polygons covering one cell: forced salting keeps the shuffle
    plan's stats identical to the broadcast plan."""
    import pandas as pd
    import ray.data

    from gdal_drivers_ray.grid import Extents
    from gdal_drivers_ray.sources import solid
    from gdal_drivers_ray.stages.spatial import (pack_rings, zonal_stats,
                                                 zonal_stats_shuffle)

    world = Extents(0.0, 0.0, 1024.0, 1024.0)
    lod = 2
    spec = solid.SolidSpec(srs="local", size=(1024, 1024), extents=world,
                           bands=[solid.Band(9.0, "Byte")])
    tiles = solid.solid_dataset(spec, include_overviews=False)
    rng = np.random.default_rng(5)
    polys = []
    for pid in range(30):
        # all polygons inside ONE lod-2 cell (cell width 256)
        cx, cy = rng.uniform(300, 460, 2)
        s = rng.uniform(10, 40)
        ring = np.array([[cx, cy], [cx + s, cy], [cx + s, cy + s],
                         [cx, cy + s], [cx, cy]])
        polys.append((pid, [ring]))
    poly_ds = ray.data.from_arrow(pa.table({
        "poly_id": pa.array([p for p, _ in polys], pa.int64()),
        "rings": pa.array([pack_rings(r) for _, r in polys],
                          pa.large_binary())}))
    want = zonal_stats(tiles, polys, world, lod).to_pandas() \
        .sort_values("poly_id").reset_index(drop=True)
    got = zonal_stats_shuffle(tiles, poly_ds, world, lod,
                              num_partitions=8, n_salts=4,
                              hot_threshold=5).to_pandas() \
        .sort_values("poly_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(want) == 30


def test_hot_cells_distributed_cap(ray_session):
    """The hot-cell detector never returns more than `cap` cells and picks
    the largest ones; the per-cell histogram stays off the driver."""
    import ray

    from gdal_drivers_ray.stages.spatial import _hot_cells_of

    counts = ray.data.from_arrow(pa.table({
        "cell": pa.array(np.arange(100, dtype=np.int64)),
        "n": pa.array(np.arange(1, 101, dtype=np.int64) * 10)}))
    # explicit low threshold: every cell qualifies; cap must bite
    hot = _hot_cells_of(counts, num_partitions=4, hot_threshold=0,
                        what="test", cap=7)
    assert len(hot) == 7
    assert set(hot.tolist()) == set(range(93, 100))  # the 7 largest n
    # default threshold (4x mean share) bounds the count by construction
    hot2 = _hot_cells_of(counts, num_partitions=4, hot_threshold=None,
                         what="test")
    assert set(hot2.tolist()) == \
        {c for c, n in zip(range(100), range(10, 1010, 10))
         if n > max(4 * 50500 // 4, 1024)}


def test_knn_kring_lod_capped(ray_session):
    """A huge requested lod is capped to the bounded pruning grid and the
    result is still the exact kNN (identical to the uncapped small-lod
    run — lod only affects pruning, never results)."""
    import ray

    from gdal_drivers_ray.stages import spatial as S

    rng = np.random.default_rng(11)
    world = Extents(0.0, 0.0, 1024.0, 1024.0)
    pts = pa.table({
        "point_id": pa.array(np.arange(400, dtype=np.int64)),
        "x": pa.array(rng.uniform(0, 1024, 400)),
        "y": pa.array(rng.uniform(0, 1024, 400))})
    qs = pd.DataFrame({"query_id": np.arange(5, dtype=np.int64),
                       "x": rng.uniform(0, 1024, 5),
                       "y": rng.uniform(0, 1024, 5)})
    base = S.knn_kring(ray.data.from_arrow(pts), qs, k=3, world=world,
                       lod=4)
    capped = S.knn_kring(ray.data.from_arrow(pts), qs, k=3, world=world,
                         lod=25)  # would be 4^25 cells uncapped
    pd.testing.assert_frame_equal(
        capped.reset_index(drop=True), base.reset_index(drop=True))


def test_hex_bin_matches_brute_force_nearest_center():
    """hex_bin == brute-force nearest center over BOTH lattices under the
    anisotropic metric (the construction's definition), including the
    d1 <= d2 tie rule; centers self-assign."""
    import numpy as np

    from gdal_drivers_ray.stages.spatial import hex_bin

    dx, dy = 40, 60
    rng = np.random.default_rng(11)
    x = rng.integers(0, 1000, 4000)
    y = rng.integers(0, 900, 4000)
    lat, i, j = hex_bin(x, y, dx=dx, dy=dy)

    # brute force: all candidate centers in range, weighted sq distance
    ii = np.arange(-1, 1000 // (2 * dx) + 2)
    jj = np.arange(-1, 900 // (2 * dy) + 2)
    cents = []
    for a in ii:
        for b in jj:
            cents.append((0, a, b, 2 * dx * a, 2 * dy * b))
            cents.append((1, a, b, 2 * dx * a + dx, 2 * dy * b + dy))
    carr = np.array([(cx, cy) for _, _, _, cx, cy in cents])
    meta = np.array([(l_, a, b) for l_, a, b, _, _ in cents])
    d = ((x[:, None] - carr[None, :, 0]) * dy) ** 2 \
        + ((y[:, None] - carr[None, :, 1]) * dx) ** 2
    # tie rules: cross-lattice ties -> lattice A (d1 <= d2); within a
    # lattice the componentwise half-up rounding picks the HIGHER index
    # on an exact midpoint — so order candidates (lattice asc, i desc,
    # j desc) and take the first minimum
    order = np.lexsort((-meta[:, 2], -meta[:, 1], meta[:, 0]))
    d = d[:, order]
    meta = meta[order]
    best = np.argmin(d, axis=1)   # first minimum in (lattice, i, j) order
    exp = meta[best]
    assert (lat == exp[:, 0]).all()
    assert (i == exp[:, 1]).all()
    assert (j == exp[:, 2]).all()

    # centers self-assign
    lat0, i0, j0 = hex_bin(np.array([0, 80, 40]), np.array([0, 120, 60]),
                           dx=dx, dy=dy)
    assert lat0.tolist() == [0, 0, 1]
    assert i0.tolist() == [0, 1, 0] and j0.tolist() == [0, 1, 0]
