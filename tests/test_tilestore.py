"""Keyed tile-store lookup: strict key parse, TMS flip, gzip sniff, error
rows (detail/mbtiles.cpp:63-224 semantics; FIXTURES.md F6)."""

import gzip

import pyarrow as pa
import pytest

from gdal_drivers_ray.sources import tilestore


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    p = tmp_path_factory.mktemp("store") / "tiles.parquet"
    rows = []
    for z in (2, 3):
        for c in range(1 << z):
            for r in range(1 << z):
                rows.append((z, c, r, f"blob-{z}-{c}-{r}".encode()))
    return tilestore.write_store(str(p), rows)


def paths_ds(paths):
    import ray.data
    return ray.data.from_arrow(pa.table({"path": pa.array(paths)}))


def test_lookup_hit_flip_and_gunzip(ray_session, store):
    # request 2-1-0 (top-down) -> store row (2^2-1)-0 = 3 (TMS)
    out = tilestore.lookup(paths_ds(["a.mbtiles/2-1-0"]), store).take_all()
    r = out[0]
    assert r["status"] == "ok"
    assert bytes(r["tile_data"]) == b"blob-2-1-3"


def test_lookup_all_statuses(ray_session, store):
    out = tilestore.lookup(paths_ds([
        "x/3-7-7",        # ok -> store row 0
        "x/3-8-0",        # out of bounds (col > 7)
        "x/3-07-1",       # leading zero -> bad key
        "x/3--1-1",       # sign -> bad key
        "x/2-3-3",        # ok
        "x/5-1-1",        # zoom 5 not in store -> not_found
    ]), store).take_all()
    by_path = {r["path"]: r for r in out}
    assert by_path["x/3-7-7"]["status"] == "ok"
    assert bytes(by_path["x/3-7-7"]["tile_data"]) == b"blob-3-7-0"
    assert by_path["x/3-8-0"]["status"] == "out_of_bounds"
    assert by_path["x/3-07-1"]["status"] == "bad_key"
    assert by_path["x/3--1-1"]["status"] == "bad_key"
    assert by_path["x/2-3-3"]["status"] == "ok"
    assert by_path["x/5-1-1"]["status"] == "not_found"


def test_gzip_round_trip(ray_session, tmp_path):
    # gzip_every=1 -> every blob wrapped; decode must sniff and unwrap
    p = str(tmp_path / "gz.parquet")
    tilestore.write_store(p, [(1, 0, 0, b"payload")], gzip_every=1)
    import pyarrow.parquet as pq
    raw = pq.read_table(p)["tile_data"][0].as_py()
    assert raw[0] == 0x1F
    out = tilestore.lookup(paths_ds(["t/1-0-1"]), p).take_all()
    assert bytes(out[0]["tile_data"]) == b"payload"


def test_lookup_shuffle_matches_broadcast(ray_session, store):
    """The both-sides-large cogroup plan returns exactly the broadcast
    plan's rows (all statuses, gunzip, not_found) — at num_cpus=4, where
    the native Dataset.join deadlocks."""
    paths = ["x/3-7-7", "x/3-8-0", "x/3-07-1", "x/3--1-1", "x/2-3-3",
             "x/5-1-1", "a.mbtiles/2-1-0", "t/2-0-0"]
    cols = ["path", "status", "zoom", "col", "row", "skey", "tile_data"]

    def norm(rows):
        return sorted(
            (tuple(bytes(r[c]) if isinstance(r[c], (bytes, bytearray))
                   else r[c] for c in cols) for r in rows))

    want = norm(tilestore.lookup(paths_ds(paths), store).take_all())
    got = norm(tilestore.lookup_shuffle(paths_ds(paths), store,
                                        num_partitions=8).take_all())
    assert got == want


def test_zero_key_accepted(ray_session, store):
    # '0' is a legal single-digit zero (parsePart minWidth=1)
    out = tilestore.lookup(paths_ds(["t/2-0-0"]), store).take_all()
    assert out[0]["status"] == "ok"
    assert bytes(out[0]["tile_data"]) == b"blob-2-0-3"


# --- property: vectorized parse == scalar reference grammar ---------------

from hypothesis import given, settings, strategies as st

_key_part = st.one_of(
    st.integers(0, 10).map(str),
    st.integers(0, 10 ** 12).map(str),
    st.sampled_from(["0", "00", "01", "7", "+3", "-2", "", "a", "1e3",
                     "007", "999999999999999999999"]),
)
_path = st.one_of(
    st.tuples(_key_part, _key_part, _key_part).map("-".join),
    st.text(alphabet="0123456789-/x", max_size=20),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_path, min_size=1, max_size=40))
def test_parse_requests_matches_scalar_grammar(paths):
    from gdal_drivers_ray.grid import pack_zxy, parse_tile_key

    b = pa.table({"path": pa.array([f"s/{p}" for p in paths])})
    out = tilestore.parse_requests(b)
    st_col = out["status"].to_pylist()
    sk_col = out["skey"].to_pylist()
    for i, p in enumerate(paths):
        # the key is the path BASENAME (mbtiles.cpp takes the filename
        # component), so the scalar model splits at the last '/' exactly
        # like parse_requests does
        parsed = parse_tile_key(p.rsplit("/", 1)[-1])
        if parsed is None:
            assert st_col[i] == "bad_key", p
            assert sk_col[i] == -1
            continue
        z, c, r = parsed
        m = (1 << z) - 1 if z < 30 else 0
        if z >= 30 or c > m or r > m:
            # z >= 30 exceeds the packed key's 2^29 grid capacity ->
            # out_of_bounds by contract (parse_requests docstring)
            assert st_col[i] == "out_of_bounds", p
            assert sk_col[i] == -1
        else:
            assert st_col[i] == "ok", p
            assert sk_col[i] == int(pack_zxy(z, c, m - r))


def test_gunzip_arrow_edges():
    """Selective Arrow gunzip: all-plain (zero boxing), all-gzip, nulls,
    empty input, and order preservation under mixed flags."""
    import gzip

    import pyarrow as pa

    from gdal_drivers_ray.sources.tilestore import _gunzip_arrow

    # mixed, with nulls and an empty payload
    vals = [b"plain0", gzip.compress(b"z1"), None, b"", gzip.compress(b"z2"),
            b"\x1e not gzip", None]
    out = _gunzip_arrow(pa.array(vals, pa.large_binary())).to_pylist()
    assert out == [b"plain0", b"z1", None, b"", b"z2", b"\x1e not gzip", None]
    # all plain: fast path returns the column unchanged
    plain = pa.array([b"a", b"b"], pa.large_binary())
    assert _gunzip_arrow(plain).to_pylist() == [b"a", b"b"]
    # all gzip
    allgz = pa.array([gzip.compress(b"x"), gzip.compress(b"y")],
                     pa.large_binary())
    assert _gunzip_arrow(allgz).to_pylist() == [b"x", b"y"]
    # empty
    assert _gunzip_arrow(pa.array([], pa.large_binary())).to_pylist() == []
    # chunked input + binary (not large_binary) dtype normalizes
    ch = pa.chunked_array([pa.array([b"p"]),
                           pa.array([gzip.compress(b"q")])])
    assert _gunzip_arrow(ch).to_pylist() == [b"p", b"q"]
