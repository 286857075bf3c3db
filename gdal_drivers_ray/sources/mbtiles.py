"""Real SQLite mbtiles archives (stdlib sqlite3 — no optional dependency).

Re-expression of /root/reference/gdal-drivers/detail/mbtiles.cpp against an
ACTUAL .mbtiles file (the public MBTiles layout: a `tiles` table keyed on
(zoom_level, tile_column, tile_row) holding TMS bottom-up rows):

- request paths end in strict 'zoom-col-row' (mbtiles.cpp:63-110 parse
  rules, via tilestore.parse_requests);
- TMS row flip on the request key (mbtiles.cpp:155);
- `SELECT tile_data FROM tiles WHERE zoom_level=? AND tile_column=? AND
  tile_row=?` per key (mbtiles.cpp:166-197);
- gzip sniff on the first blob byte 0x1f (mbtiles.cpp:214-224);
- missing tile -> status='not_found' row (mbtiles.cpp:188-192).

Deliberate improvement over the reference: the sqlite CONNECTION IS CACHED
PER ACTOR (the reference opens one per lookup, mbtiles.cpp:160-163 — noted
in SURVEY §2.3 T5). Lookups run in an actor pool: one open handle per
worker, batches of requests stream through it.
"""

from __future__ import annotations

import os
import sqlite3
from functools import lru_cache

import numpy as np
import pyarrow as pa
import ray.data

from ..grid import pack_zxy
from .tilestore import _gunzip_col, parse_requests

def shard_of(z, c, r, num_shards: int):
    """The sink's shard CONTRACT in one place (overflow-free mix —
    coords < 2^29 keep products < 2^61): resumers, routed lookups and SQL
    oracles all recompute exactly this."""
    return (np.asarray(c, np.int64) * np.int64(2654435761)
            + np.asarray(r, np.int64) * np.int64(40503)
            + np.asarray(z, np.int64)) % np.int64(num_shards)


MBTILES_SCHEMA = """
CREATE TABLE IF NOT EXISTS metadata (name TEXT, value TEXT);
CREATE TABLE IF NOT EXISTS tiles (
    zoom_level INTEGER, tile_column INTEGER, tile_row INTEGER,
    tile_data BLOB);
CREATE UNIQUE INDEX IF NOT EXISTS tile_index
    ON tiles (zoom_level, tile_column, tile_row);
"""


def write_mbtiles(path: str, rows: list[tuple[int, int, int, bytes]],
                  gzip_every: int = 2,
                  metadata: dict[str, str] | None = None) -> str:
    """Write a real .mbtiles sqlite archive. Every `gzip_every`-th blob is
    gzip-wrapped (mirrors tilestore.write_store). Duplicate keys: first
    occurrence wins (INSERT OR IGNORE on the unique index — the analog of
    the primary-key store)."""
    import gzip

    if os.path.exists(path):
        os.unlink(path)
    con = sqlite3.connect(path)
    try:
        con.executescript(MBTILES_SCHEMA)
        for k, v in (metadata or {"format": "bin"}).items():
            con.execute("INSERT INTO metadata VALUES (?, ?)", (k, v))
        data = []
        for i, (z, c, r, blob) in enumerate(rows):
            if gzip_every and i % gzip_every == 0:
                blob = gzip.compress(blob)
            data.append((z, c, r, sqlite3.Binary(blob)))
        con.executemany(
            "INSERT OR IGNORE INTO tiles VALUES (?, ?, ?, ?)", data)
        con.commit()
    finally:
        con.close()
    return path


class MbtilesLookup:
    """Actor-pool stage: request paths -> (status, key cols, tile_data).

    State: ONE read-only sqlite connection per actor, opened in __init__
    and reused for every batch (T5 done right; the reference reconnects
    per tile)."""

    PRELOAD_LIMIT = 1_000_000        # tiles (secondary cap)
    PRELOAD_BYTES = 256 * 1024 * 1024  # payload bytes; the REAL budget —
    # 1M tiles at the typical 64-512 KiB payload would be tens of GB per
    # actor, so the preload decision keys on sum(length(tile_data))

    def __init__(self, db_path: str, preload_limit: int | None = None,
                 preload_bytes: int | None = None):
        self.con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True,
                                   check_same_thread=False)
        self.q = ("SELECT tile_data FROM tiles WHERE zoom_level=? "
                  "AND tile_column=? AND tile_row=?")
        # small archives preload to one in-memory dict per actor (one full
        # scan replaces millions of point SELECTs); big archives stay on
        # the point-query path — the per-lookup cost model of the
        # reference, minus its reconnect
        limit = self.PRELOAD_LIMIT if preload_limit is None else preload_limit
        budget = self.PRELOAD_BYTES if preload_bytes is None else preload_bytes
        # file size is a free upper bound on total blob bytes: an archive
        # bigger than the budget can never preload, so skip the full-table
        # sum(length(tile_data)) scan exactly on the big archives where it
        # would cost seconds per cold worker
        fsize = os.path.getsize(db_path)
        if fsize > budget:
            n, nbytes = limit + 1, budget + 1
        else:
            n, nbytes = self.con.execute(
                "SELECT count(*), coalesce(sum(length(tile_data)), 0) "
                "FROM tiles").fetchone()
        # keyed by the same packed int64 as parse_requests' skey column, so
        # batch lookups are dict gets on DISTINCT keys only, no per-row
        # tuple building
        self.store: dict[int, bytes] | None = None
        if n <= limit and nbytes <= budget:
            rows = self.con.execute(
                "SELECT zoom_level, tile_column, tile_row, tile_data "
                "FROM tiles").fetchall()
            if rows:
                z, c, r, d = zip(*rows)
                keys = pack_zxy(np.asarray(z, np.int64),
                                np.asarray(c, np.int64),
                                np.asarray(r, np.int64))
                self.store = dict(zip(keys.tolist(), d))
            else:
                self.store = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._lookup_parsed(parse_requests(batch))

    def _lookup_parsed(self, b: pa.Table) -> pa.Table:
        """Resolve an ALREADY-PARSED request table (parse_requests
        output) — lets routed lookups parse once, not per shard."""
        # object dtype: a fixed-width numpy string array would TRUNCATE
        # 'not_found' to the width of the longest initial status
        status = np.asarray(b["status"].to_pylist(), dtype=object)
        if b.num_rows == 0:
            return b.append_column("tile_data",
                                   pa.array([], pa.large_binary()))
        ok = status == "ok"
        # parse_requests' skey already carries the TMS flip (skey of the
        # stored, bottom-up row); -1 sentinel rows are never ok
        skey = b["skey"].to_numpy()
        uniq, inv = np.unique(skey[ok], return_inverse=True)
        if self.store is not None:
            hits = [self.store.get(int(k)) for k in uniq]
        else:
            from ..grid import unpack_zxy
            # unpack_zxy returns (z, y, x) — the pack layout is
            # (z<<58)|(y<<29)|x, so the middle word is the ROW
            zs, rs, cs = unpack_zxy(uniq)
            hits = []
            for z, c, r in zip(zs.tolist(), cs.tolist(), rs.tolist()):
                hit = self.con.execute(self.q, (z, c, r)).fetchone()
                hits.append(None if hit is None else bytes(hit[0]))
        # gunzip at UNIQUE-key granularity (the request stream repeats
        # keys), then fan out to rows with one Arrow take — the per-row
        # Python scatter loop was the measured hot cost of this stage
        found = np.fromiter((h is not None for h in hits), dtype=bool,
                            count=len(hits))
        hits_arr = pa.array(_gunzip_col(hits), type=pa.large_binary())
        ok_idx = np.nonzero(ok)[0]
        status[ok_idx[~found[inv]]] = "not_found"
        idx = np.zeros(b.num_rows, dtype=np.int64)
        valid = np.zeros(b.num_rows, dtype=bool)
        idx[ok_idx] = inv
        valid[ok_idx] = found[inv]
        tile = hits_arr.take(pa.array(idx, mask=~valid))
        i = b.schema.get_field_index("status")
        return b.set_column(i, "status", pa.array(status.tolist())) \
                .append_column("tile_data", tile)


def _file_sig(path: str) -> tuple[int, int]:
    """(mtime_ns, size) — the staleness key for warm-process caches: a
    rebuilt archive at the same path must not be served from the old
    connection/preload dict."""
    st = os.stat(path)
    return (st.st_mtime_ns, st.st_size)


# maxsize bounds the per-process memory pin: each entry may hold a
# PRELOAD_BYTES dict plus an open connection, so 2 entries cap the warm
# state at ~2x the documented per-actor budget (8 entries could pin 2 GiB
# and kept evicted/stale sqlite connections alive until GC)
@lru_cache(maxsize=2)
def _warm_lookup_sig(db_path: str, preload_limit: int | None,
                     sig: tuple[int, int]) -> "MbtilesLookup":
    return MbtilesLookup(db_path, preload_limit)


def _warm_lookup(db_path: str, preload_limit: int | None) -> "MbtilesLookup":
    """Per-WORKER-PROCESS warm state (connection + preload dict), the T5
    discipline realized as a task pool: Ray reuses warm worker processes
    across tasks, so the cache hits after the first batch per process.
    An actor pool holds the same state but pays a cold fork + import per
    actor per query — measured 36 s of billed UDF time at sf0.1 (12
    actors) vs ~0.8 s of actual lookup work; the task pool inherits
    already-imported workers and skips that entirely. The cache key
    includes the file's (mtime, size), so a rebuilt archive at a reused
    path is re-opened, never served stale (one os.stat per batch)."""
    return _warm_lookup_sig(db_path, preload_limit, _file_sig(db_path))


def lookup_mbtiles(requests: ray.data.Dataset, db_path: str,
                   path_col: str = "path",
                   concurrency: int | None = None,
                   batch_size: int | None = None,
                   preload_limit: int | None = None) -> ray.data.Dataset:
    """Request paths ⋈ a real .mbtiles archive via cached-connection
    warm-process tasks. Output schema matches tilestore.lookup
    (parse/status/flip columns + tile_data)."""
    if path_col != "path":
        requests = requests.map_batches(
            lambda b: b.rename_columns(
                [("path" if c == path_col else c) for c in b.column_names]),
            batch_format="pyarrow")

    def fn(b: pa.Table) -> pa.Table:
        return _warm_lookup(db_path, preload_limit)(b)

    return requests.map_batches(fn, batch_format="pyarrow",
                                batch_size=batch_size,
                                concurrency=concurrency)


def write_mbtiles_shards(tiles: ray.data.Dataset, out_dir: str,
                         num_shards: int = 8,
                         metadata: dict[str, str] | None = None,
                         num_partitions: int | None = None
                         ) -> ray.data.Dataset:
    """Distributed mbtiles SINK: a tile Dataset (zoom, col, row [TMS],
    tile_data) -> a directory of real .mbtiles shard archives.

    SQLite is inherently single-writer, so the scale design is SHARDED
    archives (what production tile pipelines do — one archive per region/
    key range): tiles hash-partition by their packed key, each shard is
    written by exactly ONE reducer task (never the driver), atomically
    (tmp file + rename) so a re-run can skip or safely overwrite finished
    shards. Deterministic: rows insert in sorted (zoom, col, row,
    tile_data) order, first-wins on duplicate keys — byte-identical shard
    files for identical input regardless of upstream block order.

    Returns a small Dataset (shard, path, n_tiles) — the shard manifest.
    ``merge_mbtiles`` collapses shards into one archive when a single
    file is required (single-writer by nature; use only for small final
    archives)."""
    from ..stages.joins import partitioned_groups

    os.makedirs(out_dir, exist_ok=True)
    # sidecar records the ROUTING MODULUS: the reader must hash with the
    # same num_shards or lookups silently route to the wrong (or absent)
    # shard and return not_found for tiles that exist. Atomic, idempotent.
    sc = os.path.join(out_dir, "num_shards.txt")
    tmp = sc + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(str(int(num_shards)))
    os.replace(tmp, sc)

    def add_shard(b: pa.Table) -> pa.Table:
        shard = shard_of(b["zoom"].to_numpy(), b["col"].to_numpy(),
                         b["row"].to_numpy(), num_shards)
        return b.append_column("shard", pa.array(shard))

    def write_shard(g):
        import pandas as pd
        if "shard" not in g.columns or not len(g):
            return pd.DataFrame({"shard": np.asarray([], np.int64),
                                 "path": np.asarray([], object),
                                 "n_tiles": np.asarray([], np.int64)})
        out = []
        for shard, df in g.groupby("shard"):
            df = df.sort_values(["zoom", "col", "row", "tile_data"],
                                kind="stable")
            path = os.path.join(out_dir, f"shard-{int(shard):05d}.mbtiles")
            tmp = path + ".tmp"
            if os.path.exists(tmp):
                os.unlink(tmp)
            con = sqlite3.connect(tmp)
            try:
                con.executescript(MBTILES_SCHEMA)
                for k, v in (metadata or {"format": "bin"}).items():
                    con.execute("INSERT INTO metadata VALUES (?, ?)", (k, v))
                con.executemany(
                    "INSERT OR IGNORE INTO tiles VALUES (?, ?, ?, ?)",
                    [(int(z), int(c), int(r), sqlite3.Binary(d))
                     for z, c, r, d in zip(df["zoom"], df["col"],
                                           df["row"], df["tile_data"])])
                con.commit()
                n = con.execute("SELECT count(*) FROM tiles").fetchone()[0]
            finally:
                con.close()
            os.replace(tmp, path)
            out.append((int(shard), path, int(n)))
        return pd.DataFrame({"shard": [o[0] for o in out],
                             "path": [o[1] for o in out],
                             "n_tiles": [o[2] for o in out]})

    parted = partitioned_groups(
        tiles.map_batches(add_shard, batch_format="pyarrow"),
        ["shard"], num_partitions or num_shards)
    return parted.map_groups(write_shard, batch_format="pandas")


def merge_mbtiles(shard_paths: list[str], out_path: str) -> str:
    """Collapse shard archives into ONE .mbtiles via sqlite ATTACH
    (single-writer by nature — for small final archives; keep shards at
    scale). Shards merge in sorted-path order, INSERT OR IGNORE keeps the
    first key seen."""
    tmp = out_path + ".tmp"
    if os.path.exists(tmp):
        os.unlink(tmp)
    con = sqlite3.connect(tmp)
    try:
        con.executescript(MBTILES_SCHEMA)
        seen_meta = set()
        for i, p in enumerate(sorted(shard_paths)):
            con.execute("ATTACH DATABASE ? AS s", (p,))
            con.execute("INSERT OR IGNORE INTO tiles "
                        "SELECT * FROM s.tiles "
                        "ORDER BY zoom_level, tile_column, tile_row")
            for k, v in con.execute("SELECT name, value FROM s.metadata"):
                if k not in seen_meta:
                    con.execute("INSERT INTO metadata VALUES (?, ?)", (k, v))
                    seen_meta.add(k)
            con.commit()
            con.execute("DETACH DATABASE s")
        con.commit()
    finally:
        con.close()
    os.replace(tmp, out_path)
    return out_path


class MbtilesShardedLookup:
    """Actor-pool stage: lookups against a write_mbtiles_shards DIRECTORY
    without merging — each request routes to its shard by the sink's
    (overflow-free) shard hash and resolves through that shard's cached
    connection/preload. The sharded archive is therefore directly
    queryable at scale; merge_mbtiles is only for exporting a single
    file."""

    def __init__(self, shard_dir: str, num_shards: int,
                 preload_limit: int | None = None,
                 preload_bytes: int | None = None):
        self.num_shards = num_shards
        # validate the routing modulus: a num_shards that disagrees with
        # the writer's silently routes existing tiles to the wrong (or
        # absent) shard -> 'not_found' with no error. The writer's
        # sidecar is authoritative; without one (pre-sidecar archive)
        # at least require the directory to hold plausible shard files.
        import glob as _glob
        sc = os.path.join(shard_dir, "num_shards.txt")
        files = _glob.glob(os.path.join(shard_dir, "shard-*.mbtiles"))
        if os.path.exists(sc):
            with open(sc) as f:
                written = int(f.read().strip())
            if written != num_shards:
                raise ValueError(
                    f"mbtiles shard dir {shard_dir!r} was written with "
                    f"num_shards={written}, lookup requested "
                    f"{num_shards} — keys would route to wrong shards")
        elif not files:
            raise FileNotFoundError(
                f"no shard-*.mbtiles in {shard_dir!r}")
        else:
            top = max(int(os.path.basename(p)[6:11]) for p in files)
            if top >= num_shards:
                raise ValueError(
                    f"shard dir holds shard-{top:05d} but lookup "
                    f"num_shards={num_shards} cannot route to it")
        # the preload budget is PER ACTOR, not per shard: divide it so
        # opening all shards cannot multiply resident memory by the
        # shard count (the big-archive point-query guard stays effective)
        total = (MbtilesLookup.PRELOAD_LIMIT if preload_limit is None
                 else preload_limit)
        total_bytes = (MbtilesLookup.PRELOAD_BYTES if preload_bytes is None
                       else preload_bytes)
        per_shard = total // max(num_shards, 1)
        per_shard_bytes = total_bytes // max(num_shards, 1)
        self.lookups: dict[int, MbtilesLookup] = {}
        for k in range(num_shards):
            p = os.path.join(shard_dir, f"shard-{k:05d}.mbtiles")
            if os.path.exists(p):
                self.lookups[k] = MbtilesLookup(p, per_shard,
                                                per_shard_bytes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parsed = parse_requests(batch)           # parse ONCE; route below
        from ..grid import unpack_zxy
        skey = parsed["skey"].to_numpy()
        z, r, c = unpack_zxy(skey)     # pack layout (z<<58)|(row<<29)|col
        shard = shard_of(z, c, r, self.num_shards)
        shard[skey < 0] = -1                      # bad/oob rows route nowhere
        pieces, order = [], []
        for s in np.unique(shard):
            idx = np.nonzero(shard == s)[0]
            sub = parsed.take(pa.array(idx, pa.int64()))
            lk = self.lookups.get(int(s))
            if lk is None:                        # absent shard / bad keys
                status = [("not_found" if st == "ok" else st)
                          for st in sub["status"].to_pylist()]
                i = sub.schema.get_field_index("status")
                out = sub.set_column(i, "status", pa.array(status)) \
                    .append_column("tile_data",
                                   pa.nulls(sub.num_rows, pa.large_binary()))
            else:
                out = lk._lookup_parsed(sub)
            pieces.append(out)
            order.append(idx)
        if not pieces:
            return parsed.append_column(
                "tile_data", pa.nulls(0, pa.large_binary()))
        combined = pa.concat_tables(pieces)
        back = np.empty(batch.num_rows, dtype=np.int64)
        back[np.concatenate(order)] = np.arange(batch.num_rows)
        return combined.take(pa.array(back, pa.int64()))


@lru_cache(maxsize=8)
def _warm_sharded_sig(shard_dir: str, num_shards: int,
                      preload_limit: int | None,
                      sig: tuple) -> "MbtilesShardedLookup":
    return MbtilesShardedLookup(shard_dir, num_shards, preload_limit)


def _warm_sharded_lookup(shard_dir: str, num_shards: int,
                         preload_limit: int | None) -> "MbtilesShardedLookup":
    """Per-worker-process warm sharded router (see _warm_lookup); the
    staleness key is the tuple of every present shard's (mtime, size)."""
    sig = tuple((k,) + _file_sig(os.path.join(shard_dir,
                                              f"shard-{k:05d}.mbtiles"))
                for k in range(num_shards)
                if os.path.exists(os.path.join(shard_dir,
                                               f"shard-{k:05d}.mbtiles")))
    return _warm_sharded_sig(shard_dir, num_shards, preload_limit, sig)


def lookup_mbtiles_sharded(requests: ray.data.Dataset, shard_dir: str,
                           num_shards: int, path_col: str = "path",
                           concurrency: int | None = None,
                           batch_size: int | None = None,
                           preload_limit: int | None = None
                           ) -> ray.data.Dataset:
    """Request paths ⋈ a sharded archive directory (see write_mbtiles_shards).
    Same output contract as lookup_mbtiles."""
    if path_col != "path":
        requests = requests.map_batches(
            lambda b: b.rename_columns(
                [("path" if c == path_col else c) for c in b.column_names]),
            batch_format="pyarrow")

    def fn(b: pa.Table) -> pa.Table:
        return _warm_sharded_lookup(shard_dir, num_shards, preload_limit)(b)

    return requests.map_batches(fn, batch_format="pyarrow",
                                batch_size=batch_size,
                                concurrency=concurrency)
