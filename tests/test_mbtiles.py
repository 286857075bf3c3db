"""Real sqlite .mbtiles archive reading (sources/mbtiles.py): key parse,
TMS flip, gzip sniff, not_found, and parity with the parquet tile store."""

import gzip
import sqlite3

import pyarrow as pa
import pytest

from gdal_drivers_ray.sources import mbtiles, tilestore


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("mb") / "tiles.mbtiles")
    rows = []
    for z in (2, 3):
        for c in range(1 << z):
            for r in range(1 << z):
                rows.append((z, c, r, f"blob-{z}-{c}-{r}".encode()))
    return mbtiles.write_mbtiles(p, rows)


def paths_ds(paths):
    import ray.data
    return ray.data.from_arrow(pa.table({"path": pa.array(paths)}))


def test_archive_is_real_sqlite(archive):
    con = sqlite3.connect(archive)
    n = con.execute("SELECT count(*) FROM tiles").fetchone()[0]
    assert n == 16 + 64
    # half the blobs gzip-wrapped (gzip_every=2)
    blobs = [r[0] for r in
             con.execute("SELECT tile_data FROM tiles").fetchall()]
    assert sum(1 for b in blobs if b[:1] == b"\x1f") == n // 2
    con.close()


def test_lookup_statuses_and_flip(ray_session, archive):
    out = mbtiles.lookup_mbtiles(paths_ds([
        "a.mbtiles/2-1-0",   # ok -> TMS row 3
        "x/3-7-7",           # ok -> TMS row 0
        "x/3-8-0",           # out of bounds
        "x/3-07-1",          # leading zero -> bad key
        "x/5-1-1",           # zoom absent -> not_found
    ]), archive).take_all()
    by = {r["path"]: r for r in out}
    assert by["a.mbtiles/2-1-0"]["status"] == "ok"
    assert bytes(by["a.mbtiles/2-1-0"]["tile_data"]) == b"blob-2-1-3"
    assert by["x/3-7-7"]["status"] == "ok"
    assert bytes(by["x/3-7-7"]["tile_data"]) == b"blob-3-7-0"
    assert by["x/3-8-0"]["status"] == "out_of_bounds"
    assert by["x/3-07-1"]["status"] == "bad_key"
    assert by["x/5-1-1"]["status"] == "not_found"


def test_point_query_path_matches_preload(ray_session, archive):
    """preload_limit=0 forces per-key SELECTs (the big-archive path);
    results must equal the preloaded dict path."""
    paths = ["a.mbtiles/2-1-0", "x/3-7-7", "x/5-1-1", "x/3-07-1"]

    def norm(rows):
        return sorted((r["path"], r["status"],
                       bytes(r["tile_data"])
                       if isinstance(r["tile_data"], (bytes, bytearray))
                       else r["tile_data"]) for r in rows)

    pre = norm(mbtiles.lookup_mbtiles(paths_ds(paths), archive).take_all())
    pt = norm(mbtiles.lookup_mbtiles(paths_ds(paths), archive,
                                     preload_limit=0).take_all())
    assert pre == pt


def test_duplicate_key_first_wins(ray_session, tmp_path):
    p = str(tmp_path / "dup.mbtiles")
    mbtiles.write_mbtiles(p, [(1, 0, 0, b"first"), (1, 0, 0, b"second")],
                          gzip_every=0)
    out = mbtiles.lookup_mbtiles(paths_ds(["t/1-0-1"]), p).take_all()
    assert bytes(out[0]["tile_data"]) == b"first"


def test_parity_with_parquet_store(ray_session, archive, tmp_path):
    """Same logical store through sqlite and parquet paths -> identical
    lookup rows (the archive format is an I/O detail, not semantics)."""
    rows = []
    for z in (2, 3):
        for c in range(1 << z):
            for r in range(1 << z):
                rows.append((z, c, r, f"blob-{z}-{c}-{r}".encode()))
    pq_store = tilestore.write_store(str(tmp_path / "s.parquet"), rows)
    paths = ["a.mbtiles/2-1-0", "x/3-7-7", "x/3-8-0", "x/3-07-1",
             "x/5-1-1", "t/2-0-0"]
    cols = ["path", "status", "zoom", "col", "row", "skey", "tile_data"]

    def norm(rows_):
        return sorted(
            tuple(bytes(r[c]) if isinstance(r[c], (bytes, bytearray))
                  else r[c] for c in cols) for r in rows_)

    got_sql = norm(mbtiles.lookup_mbtiles(paths_ds(paths), archive)
                   .take_all())
    got_pq = norm(tilestore.lookup(paths_ds(paths), pq_store).take_all())
    assert got_sql == got_pq


def _tile_rows_table(n=300, seed=3):
    import numpy as np
    rng = np.random.default_rng(seed)
    z = rng.integers(2, 5, n).astype(np.int64)
    side = 1 << z
    c = rng.integers(0, 64, n) % side
    r = rng.integers(0, 64, n) % side
    blobs = [f"pix-{zz}-{cc}-{rr}".encode() for zz, cc, rr in zip(z, c, r)]
    return pa.table({"zoom": pa.array(z, pa.int64()),
                     "col": pa.array(c, pa.int64()),
                     "row": pa.array(r, pa.int64()),
                     "tile_data": pa.array(blobs, pa.large_binary())})


def test_sharded_sink_roundtrip(ray_session, tmp_path):
    """Distributed sink: Dataset -> shard archives (one writer per shard,
    real sqlite), merge -> single archive, read back through the lookup
    actor — content identical to the input's first-wins key map."""
    import ray.data
    import numpy as np

    t = _tile_rows_table()
    out = str(tmp_path / "shards")
    manifest = mbtiles.write_mbtiles_shards(
        ray.data.from_arrow(t).repartition(6), out, num_shards=4).to_pandas()
    assert set(manifest["shard"]) <= set(range(4))
    # every shard is a REAL sqlite mbtiles file
    total = 0
    for p in manifest["path"]:
        con = sqlite3.connect(p)
        total += con.execute("SELECT count(*) FROM tiles").fetchone()[0]
        assert con.execute(
            "SELECT value FROM metadata WHERE name='format'").fetchone()
        con.close()
    # distinct keys only (INSERT OR IGNORE dedupe)
    keys = {(z, c, r) for z, c, r in
            zip(t["zoom"].to_pylist(), t["col"].to_pylist(),
                t["row"].to_pylist())}
    assert total == len(keys) == manifest["n_tiles"].sum()

    merged = mbtiles.merge_mbtiles(list(manifest["path"]),
                                   str(tmp_path / "all.mbtiles"))
    con = sqlite3.connect(merged)
    got = {(z, c, r): bytes(d) for z, c, r, d in
           con.execute("SELECT zoom_level, tile_column, tile_row, tile_data"
                       " FROM tiles")}
    con.close()
    # expected: sorted-(z,c,r,blob) first-wins per key
    df = t.to_pandas().sort_values(["zoom", "col", "row", "tile_data"],
                                   kind="stable")
    first = {}
    for k, v in zip(zip(df["zoom"], df["col"], df["row"]), df["tile_data"]):
        first.setdefault((int(k[0]), int(k[1]), int(k[2])), bytes(v))
    assert got == first


def test_sharded_sink_deterministic(ray_session, tmp_path):
    """Byte-identical shard files for identical input, regardless of
    upstream block order."""
    import ray.data

    t = _tile_rows_table(120, seed=9)
    outs = []
    for rep, nblocks in ((1, 3), (2, 11)):
        out = str(tmp_path / f"run{rep}")
        m = mbtiles.write_mbtiles_shards(
            ray.data.from_arrow(t).repartition(nblocks), out,
            num_shards=3).to_pandas()
        outs.append({p.split("/")[-1]: open(p, "rb").read()
                     for p in m["path"]})
    assert outs[0].keys() == outs[1].keys()
    for name in outs[0]:
        assert outs[0][name] == outs[1][name], name


def test_tile_archive_blobs_decode(ray_session):
    """End-to-end archive: a blob read back from a shard sqlite file
    decodes to the 2x box-filtered source image."""
    import numpy as np
    from gdal_drivers_ray import codecs, fixtures
    from gdal_drivers_ray.pipelines.queries import q_tile_archive

    sf = "/root/testdata/sf0.001"
    q_tile_archive(sf).to_pandas()          # builds the shard archives
    import glob
    import hashlib
    tag = hashlib.blake2b(sf.encode(), digest_size=6).hexdigest()
    shards = sorted(glob.glob(f"/tmp/graft_out/tile_archive_{tag}/*.mbtiles"))
    assert shards
    path = fixtures.images_path_for(sf)
    lod = fixtures.lod_for_count(fixtures.count_rows(path))
    side = 1 << lod
    checked = 0
    for sp in shards[:2]:
        con = sqlite3.connect(sp)
        for z, c, r, d in con.execute(
                "SELECT zoom_level, tile_column, tile_row, tile_data "
                "FROM tiles LIMIT 3"):
            assert z == lod
            i = r * side + c                  # fixture addressing inverse
            # expected = resize of the DECODED fixture payload (jpeg rows
            # are lossy: compare against the round-tripped pixels)
            src = codecs.decode_image(fixtures.image_row(i, lod)["bytes"])
            want = src[:256, :256].astype(np.float64) \
                .reshape(128, 2, 128, 2).mean(axis=(1, 3)).astype(np.uint8)
            got = codecs.decode_image(bytes(d))
            assert got.shape == (128, 128)
            np.testing.assert_array_equal(got, want)
            checked += 1
        con.close()
    assert checked >= 3


def test_not_found_in_all_ok_batch(ray_session, archive):
    """Regression: a batch where every path PARSES ok but one key is
    absent must report the full 'not_found' string (a fixed-width numpy
    string array truncated it to the widest initial status, 'ok')."""
    out = mbtiles.lookup_mbtiles(
        paths_ds(["a/2-1-0", "a/5-1-1"]), archive).take_all()
    by = {r["path"]: r["status"] for r in out}
    assert by["a/2-1-0"] == "ok"
    assert by["a/5-1-1"] == "not_found"


def test_sharded_lookup_matches_merged(ray_session, tmp_path):
    """Direct lookup against the shard DIRECTORY (hash routing, no merge)
    returns exactly the merged-archive lookup rows, including not_found
    and bad-key statuses."""
    import ray.data

    t = _tile_rows_table(200, seed=5)
    out = str(tmp_path / "shards")
    manifest = mbtiles.write_mbtiles_shards(
        ray.data.from_arrow(t), out, num_shards=4).to_pandas()
    merged = mbtiles.merge_mbtiles(list(manifest["path"]),
                                   str(tmp_path / "all.mbtiles"))

    # requests: every stored tile (top-down row = flip) + misses + bad keys
    import numpy as np
    zs = t["zoom"].to_numpy(); cs = t["col"].to_numpy()
    rs = t["row"].to_numpy()
    paths = [f"s/{z}-{c}-{(1 << z) - 1 - r}"
             for z, c, r in zip(zs, cs, rs)]
    paths += ["s/2-3-9", "s/9-1-1", "bad", "s/2-01-0"]

    def norm(rows):
        return [(r["path"], r["status"],
                 bytes(r["tile_data"]) if isinstance(
                     r["tile_data"], (bytes, bytearray)) else None)
                for r in sorted(rows, key=lambda r: r["path"])]

    got_sharded = norm(mbtiles.lookup_mbtiles_sharded(
        paths_ds(paths), out, num_shards=4).take_all())
    got_merged = norm(mbtiles.lookup_mbtiles(
        paths_ds(paths), merged).take_all())
    assert got_sharded == got_merged
    assert any(s == "not_found" for _, s, _ in got_sharded)
    assert any(s == "bad_key" for _, s, _ in got_sharded)


def test_sharded_lookup_rejects_wrong_num_shards(ray_session, tmp_path):
    """A num_shards that disagrees with the writer's must raise — with a
    mismatched modulus, present tiles silently come back not_found."""
    import numpy as np
    import pytest
    import ray.data

    t = _tile_rows_table(50, seed=9)
    out = str(tmp_path / "shards")
    mbtiles.write_mbtiles_shards(ray.data.from_arrow(t), out,
                                 num_shards=4).to_pandas()
    with pytest.raises(ValueError, match="num_shards"):
        mbtiles.MbtilesShardedLookup(out, num_shards=8)
    with pytest.raises(FileNotFoundError):
        mbtiles.MbtilesShardedLookup(str(tmp_path / "nothing"),
                                     num_shards=4)
    # the matching modulus still works
    lk = mbtiles.MbtilesShardedLookup(out, num_shards=4)
    zs = t["zoom"].to_numpy(); cs = t["col"].to_numpy()
    rs = t["row"].to_numpy()
    paths = [f"s/{z}-{c}-{(1 << z) - 1 - r}"
             for z, c, r in zip(zs[:5], cs[:5], rs[:5])]
    import pyarrow as pa
    res = lk(pa.table({"path": paths}))
    assert all(s == "ok" for s in res["status"].to_pylist())
