"""Keyed tile store: (zoom, col, row) -> blob, the mbtiles analog.

Re-expression of /root/reference/gdal-drivers/detail/mbtiles.cpp as a
parquet-backed table + Ray Data lookup join:

- request paths end in strict 'zoom-col-row' (parse rules of
  detail/mbtiles.cpp:63-110 via grid.parse_tile_key);
- bounds check vs 2^zoom - 1 (mbtiles.cpp:146-151);
- the store holds rows TMS (bottom-up); lookups are top-down, so the
  request row flips: row' = (2^zoom - 1) - row (mbtiles.cpp:155);
- blobs may be gzip-wrapped — first byte 0x1f sniff + gunzip
  (mbtiles.cpp:214-224);
- a missing tile is an ERROR row, not silence (mbtiles.cpp:188-192) —
  failed requests come back with status != "ok" (the dead-letter pattern
  of SURVEY.md §4);
- unlike the reference (one SQLite connection per lookup,
  mbtiles.cpp:160-163), lookups batch: requests stream through a
  broadcast- or shuffle-join on the packed key.
"""

from __future__ import annotations

import gzip
from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..grid import parse_tile_key, pack_zxy

STORE_SCHEMA = pa.schema([
    ("zoom", pa.int32()),
    ("col", pa.int32()),
    ("row", pa.int32()),       # TMS, bottom-up
    ("tile_data", pa.large_binary()),
])


def write_store(path: str, rows: list[tuple[int, int, int, bytes]],
                gzip_every: int = 2) -> str:
    """Fixture/store writer; every `gzip_every`-th blob is gzip-wrapped
    (FIXTURES.md F6: ~half compressed)."""
    import pyarrow.parquet as pq
    z, c, r, d = [], [], [], []
    for i, (zz, cc, rr, data) in enumerate(rows):
        z.append(zz); c.append(cc); r.append(rr)
        d.append(gzip.compress(data) if (gzip_every and i % gzip_every == 0)
                 else data)
    pq.write_table(pa.table({"zoom": pa.array(z, pa.int32()),
                             "col": pa.array(c, pa.int32()),
                             "row": pa.array(r, pa.int32()),
                             "tile_data": pa.array(d, pa.large_binary())}),
                   path)
    return path


# strict 'zoom-col-row' tail (rules of detail/mbtiles.cpp:63-110 =
# grid._parse_part: no signs, ASCII digits only, no excess leading zeros).
# 15-digit cap keeps every captured value < 2^50, so int64 casts are safe;
# longer (pathological) parts fall back to the scalar parser.
_KEY_RE = (r"^(?P<z>0|[1-9][0-9]{0,14})-"
           r"(?P<c>0|[1-9][0-9]{0,14})-"
           r"(?P<r>0|[1-9][0-9]{0,14})$")


def parse_requests(batch: pa.Table, path_col: str = "path") -> pa.Table:
    """Request paths -> parsed/validated keys, vectorized (Arrow regex +
    int64 kernels — the per-row loop was the measured hot cost of every
    lookup pipeline). Emits status 'ok' | 'bad_key' | 'out_of_bounds' and
    the TMS-flipped packed key for the ok rows (mbtiles.cpp:128-155)."""
    import pyarrow.compute as pc

    paths = pc.cast(batch[path_col], pa.string())
    tails = pc.struct_field(
        pc.extract_regex(paths, r"(?P<t>[^/]*)$"), "t")
    m = pc.extract_regex(tails, _KEY_RE)
    bad = pc.is_null(m).to_numpy(zero_copy_only=False)

    n = batch.num_rows
    zs = np.zeros(n, dtype=np.int64)
    cs = np.zeros(n, dtype=np.int64)
    rs = np.zeros(n, dtype=np.int64)
    if not bad.all():
        for name, arr in (("z", zs), ("c", cs), ("r", rs)):
            col = pc.fill_null(pc.struct_field(m, name), "0")
            arr[:] = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)

    # scalar fallback for >15-digit parts the regex rejected but the strict
    # grammar accepts: such values are astronomically past any real tile
    # bounds (or overflow the packed key), so they classify out_of_bounds
    # (the round-1 scalar path crashed on them instead)
    maybe_long = bad & np.asarray(
        pc.greater_equal(pc.binary_length(pc.fill_null(tails, "")), 18
                         ).to_numpy(zero_copy_only=False))
    long_status: dict[int, str] = {}
    if maybe_long.any():
        for i in np.nonzero(maybe_long)[0]:
            if parse_tile_key(tails[int(i)].as_py()) is not None:
                long_status[int(i)] = "out_of_bounds"

    # bounds vs 2^zoom - 1 (mbtiles.cpp:146-151). zoom >= 30 exceeds the
    # packed key's 2^29 grid capacity (grid.pack_zxy) and is out of bounds
    # by contract — the scalar round-1 path silently wrapped there
    zcap = np.minimum(zs, 29)
    mask = (np.int64(1) << zcap) - 1
    oob = ~bad & ((zs >= 30) | (cs > mask) | (rs > mask))

    ok = ~bad & ~oob
    status = np.where(ok, "ok", np.where(bad, "bad_key", "out_of_bounds"))
    for i, s in long_status.items():
        status[i] = s
    flipped = mask - rs                                  # the TMS flip
    keys = np.where(ok, pack_zxy(zs, cs, np.where(ok, flipped, 0)),
                    np.int64(-1))   # sentinel: cannot collide with a key
    i32 = np.int64(2 ** 31 - 1)     # key columns are int32; clamp the rare
    return batch.append_column("status", pa.array(status.tolist())) \
                .append_column("zoom", pa.array(
                    np.minimum(zs, i32).astype(np.int32))) \
                .append_column("col", pa.array(
                    np.minimum(cs, i32).astype(np.int32))) \
                .append_column("row", pa.array(
                    np.minimum(rs, i32).astype(np.int32))) \
                .append_column("skey", pa.array(keys, pa.int64()))


def _gunzip_col(data: list[Optional[bytes]]) -> list[Optional[bytes]]:
    out = []
    for b in data:
        if not isinstance(b, (bytes, bytearray)):
            out.append(None)           # missing tile (pandas NaN after merge)
            continue
        if len(b) and b[0] == 0x1F:    # sniff (mbtiles.cpp:214)
            b = gzip.decompress(b)
        out.append(bytes(b))
    return out


def _gunzip_arrow(blobs) -> pa.Array:
    """Arrow-native gzip handling: sniff the 0x1f magic with compute
    kernels (mbtiles.cpp:214-224), box and decompress ONLY the flagged
    rows, reassemble in order with take. Plain / missing payloads never
    cross into Python objects — this is the hot path of the engine's
    most-benched join family, where the old full-column pandas
    round-trip was the measured cost."""
    import pyarrow.compute as pc

    if isinstance(blobs, pa.ChunkedArray):
        blobs = blobs.combine_chunks()
    blobs = blobs.cast(pa.large_binary())
    first = pc.binary_slice(pc.fill_null(blobs, b""), 0, 1)
    gz = (pc.equal(first, b"\x1f").to_numpy(zero_copy_only=False)
          & pc.is_valid(blobs).to_numpy(zero_copy_only=False))
    if not gz.any():
        return blobs
    keep = blobs.filter(pa.array(~gz))
    dec = pa.array([gzip.decompress(v) for v in
                    blobs.filter(pa.array(gz)).to_pylist()],
                   pa.large_binary())
    combined = pa.concat_arrays([keep, dec])
    pos = np.empty(len(blobs), dtype=np.int64)
    pos[~gz] = np.arange(len(keep), dtype=np.int64)
    pos[gz] = len(keep) + np.arange(len(dec), dtype=np.int64)
    return combined.take(pa.array(pos))


def _finalize_lookup(b: pa.Table, data: pa.Array) -> pa.Table:
    """Shared Arrow-native tail of both lookup plans: ok-but-missing rows
    become status='not_found' (mbtiles.cpp:188-192), blobs gunzip via
    the selective path; no pandas, no object boxing of plain blobs."""
    import pyarrow.compute as pc

    miss = pc.and_(pc.equal(b["status"], "ok"), pc.is_null(data))
    status = pc.if_else(miss, pa.scalar("not_found"), b["status"])
    i = b.schema.get_field_index("status")
    out = b.set_column(i, "status", status)
    return out.append_column("tile_data", _gunzip_arrow(data))


def _load_store_arrow(store_path: str):
    """Read the store and build the sorted (skey -> tile_data) index:
    int64 key array + aligned Arrow large_binary blob array (blobs stay
    Arrow buffers end-to-end). First occurrence wins on duplicate keys
    (primary key in the reference's sqlite schema). Runs as a Ray TASK
    (never on the driver): the driver only holds the ObjectRef."""
    import pyarrow.parquet as pq

    st = pq.read_table(store_path)
    skey = pack_zxy(st["zoom"].to_numpy().astype(np.int64),
                    st["col"].to_numpy().astype(np.int64),
                    st["row"].to_numpy().astype(np.int64))
    order = np.argsort(skey, kind="stable")   # stable: ties keep file order
    sk = skey[order]
    firsts = np.ones(len(sk), dtype=bool)
    firsts[1:] = sk[1:] != sk[:-1]
    keys = sk[firsts]
    blobs = st["tile_data"].combine_chunks().cast(pa.large_binary()) \
        .take(pa.array(order[firsts]))
    return keys, blobs


def lookup(requests: ray.data.Dataset, store_path: str,
           path_col: str = "path") -> ray.data.Dataset:
    """Request paths ⋈ store, broadcast plan: the store index is built by a
    Ray task (the driver never reads the store), its ObjectRef is shared by
    every lookup task; the probe is a searchsorted + Arrow take, so blob
    payloads never round-trip through pandas/Python. Missing tiles get
    status='not_found' (mbtiles.cpp:188-192).

    For stores beyond worker memory use ``lookup_shuffle`` — same request
    parse/flip and gunzip stages around a cogroup join."""
    import pyarrow.compute as pc  # noqa: F401  (used via _finalize_lookup)

    sref = ray.remote(num_cpus=1)(_load_store_arrow).remote(store_path)

    def join(batch: pa.Table) -> pa.Table:
        b = parse_requests(batch, path_col)
        keys, blobs = ray.get(sref)
        k = b["skey"].to_numpy()
        if len(keys) == 0:
            # empty store: every request is not_found (keys[posc] below
            # would IndexError on a zero-length array)
            return _finalize_lookup(
                b, pa.nulls(b.num_rows, pa.large_binary()))
        pos = np.searchsorted(keys, k)
        inb = pos < len(keys)
        posc = np.where(inb, pos, 0)
        matched = inb & (keys[posc] == k)
        idx = pa.array(np.where(matched, posc, 0), pa.int64(),
                       mask=~matched)          # null index -> null blob
        return _finalize_lookup(b, blobs.take(idx))

    return requests.map_batches(join, batch_format="pyarrow")


def keyed_store(store_path: str) -> ray.data.Dataset:
    """Store parquet -> Dataset with the packed key column (computed in the
    read tasks, never on the driver)."""
    st = ray.data.read_parquet(store_path)

    def add_key(b: pa.Table) -> pa.Table:
        skey = pack_zxy(b["zoom"].to_numpy().astype(np.int64),
                        b["col"].to_numpy().astype(np.int64),
                        b["row"].to_numpy().astype(np.int64))
        return pa.table({"skey": pa.array(skey), "tile_data": b["tile_data"]})

    return st.map_batches(add_key, batch_format="pyarrow")


def lookup_shuffle(requests: ray.data.Dataset, store_path: str,
                   path_col: str = "path",
                   num_partitions: Optional[int] = None) -> ray.data.Dataset:
    """Both-sides-large plan: requests and store hash-cogroup on the packed
    key (stages.joins.cogroup_join — every row moves once; safe at any
    num_cpus). Identical output semantics to ``lookup``: bad/out-of-bounds
    rows pass through (their skey sentinel -1 never matches), ok rows with
    no store tile become status='not_found', blobs gunzip after the join.

    Store keys must be UNIQUE (true of real archives — the reference's
    sqlite tiles table is primary-keyed on (zoom, col, row),
    mbtiles.cpp:166-197); ``lookup`` additionally tolerates duplicates by
    first-wins, which has no order-stable distributed equivalent."""
    from ..config import path_bytes
    from ..stages.joins import cogroup_join

    parsed = requests.map_batches(lambda b: parse_requests(b, path_col),
                                  batch_format="pyarrow")
    joined = cogroup_join(parsed, keyed_store(store_path), on="skey",
                          how="left", num_partitions=num_partitions,
                          input_bytes=path_bytes(store_path))

    def post(b: pa.Table) -> pa.Table:
        data = b["tile_data"]
        if isinstance(data, pa.ChunkedArray):
            data = data.combine_chunks()
        return _finalize_lookup(b.drop_columns(["tile_data"]), data)

    return joined.map_batches(post, batch_format="pyarrow",
                              batch_size=None)
