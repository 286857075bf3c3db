"""Driver-checkable query pipelines over the testdata tables.

Each function here is one `queries()` entry in `__ray_entry__.py`; most have
an exact ANSI-SQL twin in `oracle_sql()` that DuckDB runs on the same
parquet. Conventions for bit-exact parity with the SQL oracle:

- grouped sums are computed over INTEGERS (cents / basis points) so the sum
  is order-independent; a final single division (if any) is the only float op;
- min/max/count are order-independent by construction;
- column names match the SQL aliases exactly.

The reference operator each query exercises is cited per function
(file:line under /root/reference/gdal-drivers).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..grid import Extents, tile_of_points

WORLD = Extents(0.0, 0.0, 1024.0, 1024.0)
PACK_Z = 1 << 58
PACK_Y = 1 << 29


def _read(sf_dir: str, table: str, columns: list[str]) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# tile assignment + LOD rollup (grid math of blender.cpp:449-463,
# solid.cpp:352-369; cell key of detail/mbtiles.cpp:128-225)
# ---------------------------------------------------------------------------

def _assign_tiles_batch(batch: pa.Table) -> pa.Table:
    """lineitem rows -> synthetic points -> (lod, tile_x, tile_y) partial
    counts. Pre-aggregated per batch so the groupby shuffles one row per
    distinct tile per batch."""
    pk = batch["l_partkey"].to_numpy()
    sk = batch["l_suppkey"].to_numpy()
    ln = batch["l_linenumber"].to_numpy().astype(np.int64)
    x = (pk % 1024).astype(np.float64)
    y = ((sk * 7) % 1024).astype(np.float64)
    z = 1 + (ln % 4)
    tx, ty = tile_of_points(x, y, WORLD, z)
    key = z * PACK_Z + ty * PACK_Y + tx  # packed cell key
    keys, counts = np.unique(key, return_counts=True)
    return pa.table({"cell_packed": pa.array(keys),
                     "n": pa.array(counts.astype(np.int64))})


def q_tile_assign(sf_dir: str) -> ray.data.Dataset:
    """Point->tile assignment over the synthetic 1024-unit world, counts per
    cell. The y axis flips (north-up grid, solid.cpp:334-347)."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_linenumber"])
    partials = li.map_batches(_assign_tiles_batch, batch_format="pyarrow")
    agg = partials.groupby("cell_packed").aggregate(Sum("n", alias_name="n"))

    def unpack(b: pa.Table) -> pa.Table:
        key = b["cell_packed"].to_numpy()
        return pa.table({
            "cell_packed": b["cell_packed"],
            "lod": pa.array(key // PACK_Z),
            "tile_x": pa.array(key % PACK_Y),
            "tile_y": pa.array((key % PACK_Z) // PACK_Y),
            "n": b["n"],
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


SQL_TILE_ASSIGN = """
WITH pts AS (
  SELECT (l_partkey % 1024) AS x,
         ((l_suppkey * 7) % 1024) AS y,
         (1 + (l_linenumber % 4)) AS z
  FROM lineitem
), t AS (
  SELECT CAST(z AS BIGINT) AS z,
         GREATEST(0, LEAST(CAST(floor(x * (1 << z) / 1024.0) AS BIGINT), (1 << z) - 1)) AS tile_x,
         GREATEST(0, LEAST(CAST(floor((1024.0 - y) * (1 << z) / 1024.0) AS BIGINT), (1 << z) - 1)) AS tile_y
  FROM pts
)
SELECT z * 288230376151711744 + tile_y * 536870912 + tile_x AS cell_packed,
       z AS lod, tile_x, tile_y, CAST(count(*) AS BIGINT) AS n
FROM t GROUP BY 1, 2, 3, 4
"""


def q_lod_rollup(sf_dir: str) -> ray.data.Dataset:
    """One-level LOD rollup of q_tile_assign: counts per parent tile
    (groupby(parent) — solid.cpp:352-369 halving, mask.cpp:199-211)."""
    tiles = q_tile_assign(sf_dir)

    def to_parent(b: pa.Table) -> pa.Table:
        z = b["lod"].to_numpy()
        px = b["tile_x"].to_numpy() // 2
        py = b["tile_y"].to_numpy() // 2
        key = (z - 1) * PACK_Z + py * PACK_Y + px
        return pa.table({"parent_packed": pa.array(key), "n": b["n"]})

    parents = tiles.map_batches(to_parent, batch_format="pyarrow")
    agg = parents.groupby("parent_packed").aggregate(Sum("n", alias_name="n_tiles"))

    def unpack(b: pa.Table) -> pa.Table:
        key = b["parent_packed"].to_numpy()
        return pa.table({
            "parent_packed": b["parent_packed"],
            "plod": pa.array(key // PACK_Z),
            "px": pa.array(key % PACK_Y),
            "py": pa.array((key % PACK_Z) // PACK_Y),
            "n_tiles": b["n_tiles"],
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


SQL_LOD_ROLLUP = f"""
WITH t AS ({SQL_TILE_ASSIGN})
SELECT (lod - 1) * 288230376151711744 + (tile_y // 2) * 536870912 + (tile_x // 2) AS parent_packed,
       lod - 1 AS plod, tile_x // 2 AS px, tile_y // 2 AS py,
       CAST(sum(n) AS BIGINT) AS n_tiles
FROM t GROUP BY 1, 2, 3, 4
"""


# ---------------------------------------------------------------------------
# scalar codecs (zigzag mvt.cpp:241-244; TMS flip detail/mbtiles.cpp:146-155)
# ---------------------------------------------------------------------------

def q_zigzag(sf_dir: str) -> ray.data.Dataset:
    """Per-row zigzag encode/decode round-trip on signed deltas."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def f(b: pa.Table) -> pa.Table:
        k = b["l_orderkey"].to_numpy() - 3000
        zz = (k << 1) ^ (k >> 63)          # int64 zigzag
        back = (zz >> 1) ^ -(zz & 1)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_linenumber": b["l_linenumber"],
            "k": pa.array(k),
            "zz": pa.array(zz),
            "back": pa.array(back),
        })

    return li.map_batches(f, batch_format="pyarrow")


SQL_ZIGZAG = """
SELECT l_orderkey, l_linenumber,
       (l_orderkey - 3000) AS k,
       xor((l_orderkey - 3000) * 2, CASE WHEN l_orderkey - 3000 < 0 THEN -1 ELSE 0 END) AS zz,
       (l_orderkey - 3000) AS back
FROM lineitem
"""


def q_tms_join(sf_dir: str) -> ray.data.Dataset:
    """Keyed tile lookup with the TMS row flip on the request side
    (detail/mbtiles.cpp:146-197: flip then exact-key SELECT). The store side
    (from orders) is the small side and is broadcast once via ray.put —
    requests stream and merge per batch, no shuffle; when both sides are
    large use stages.joins.shuffle_join instead (tested separately)."""
    import pyarrow.parquet as pq

    ot = pq.read_table(f"{sf_dir}/orders.parquet",
                       columns=["o_orderkey", "o_custkey", "o_totalprice"])
    z = 3 + (ot["o_orderkey"].to_numpy() % 3)
    side = np.int64(1) << z
    col = ot["o_custkey"].to_numpy() % side
    row_tms = np.floor(ot["o_totalprice"].to_numpy()).astype(np.int64) % side
    import pandas as pd
    store_df = pd.DataFrame({"skey": z * PACK_Z + row_tms * PACK_Y + col,
                             "payload": ot["o_orderkey"].to_numpy()})
    # the store is PRIMARY-KEYED on (zoom,col,row) like the reference's
    # sqlite tiles table (mbtiles.cpp:166-197): deterministic first-wins =
    # min payload per key. Also kills the n_req x n_store join blowup.
    store_df = store_df.groupby("skey", as_index=False)["payload"].min()

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])

    def requests(b: pa.Table) -> pa.Table:
        z = 3 + (b["l_orderkey"].to_numpy() % 3)
        side = np.int64(1) << z
        col = b["l_partkey"].to_numpy() % side
        row_td = b["l_suppkey"].to_numpy() % side
        row_tms = (side - 1) - row_td          # the flip
        key = z * PACK_Z + row_tms * PACK_Y + col
        return pa.table({"rkey": pa.array(key),
                         "req_order": pa.array(b["l_orderkey"].to_numpy())})

    from ..stages.joins import broadcast_join
    r = li.map_batches(requests, batch_format="pyarrow")
    joined = broadcast_join(r, store_df, left_on="rkey", right_on="skey")

    # combiner: collapse each batch to one row per key BEFORE the shuffle —
    # the exchange then carries ~n_keys rows per batch instead of every
    # joined row (the partial-aggregate pattern of SURVEY §4)
    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby("rkey", as_index=False).agg(
            n_hits=("rkey", "size"), min_payload=("payload", "min"),
            max_req=("req_order", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    # coalesce the tiny per-batch partials before the sort-based aggregate:
    # its scheduling cost scales with input-block count
    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .repartition(8).groupby("rkey").aggregate(
            Sum("n_hits", alias_name="n_hits"),
            Min("min_payload", alias_name="min_payload"),
            Max("max_req", alias_name="max_req"),
    )
    return agg.rename_columns({"rkey": "key"})


def q_tms_join_big(sf_dir: str) -> ray.data.Dataset:
    """Same keyed lookup as q_tms_join but BOTH sides large and
    dataset-native: the store is built distributed (never a driver frame)
    and the whole store-dedupe + join + per-key aggregate runs in ONE
    hash exchange of MAP-SIDE PARTIALS — every per-key aggregate here is
    associative, so each block collapses to one row per (key, side)
    before the exchange and the partition reducer merges partials and
    joins the sides. (The round-2 row-level single-exchange plan profiled
    56 of 70 CPU-seconds sorting rows the reducer immediately
    re-aggregated; the round-2 three-exchange plan before it measured 3x
    slower again on pure barrier overhead.) Shares q_tms_join's SQL
    oracle by construction."""
    return tms_join_big_from(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]),
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]))


def tms_join_big_from(o: ray.data.Dataset,
                      li: ray.data.Dataset) -> ray.data.Dataset:
    """Dataset-parameterized core of q_tms_join_big (bench.py's scaling
    workloads feed replicated inputs through the same plan).

    MAP-SIDE COMBINER plan: every per-key aggregate here is associative
    (store-side min, request-side count/max), so each input block first
    collapses to one partial row per (key, side) and only PARTIALS cross
    the exchange. Profiled on the 96x bench input, the row-level plan
    spent 56 of 70 CPU-seconds sorting 72M rows the reducer then threw
    away; partials cap the exchange at blocks x live keys regardless of
    input scale."""
    from ..stages.joins import partitioned_groups

    def store_partials(b: pa.Table) -> pa.Table:
        import pandas as pd
        z = 3 + (b["o_orderkey"].to_numpy() % 3)
        side = np.int64(1) << z
        col = b["o_custkey"].to_numpy() % side
        row_tms = np.floor(b["o_totalprice"].to_numpy()).astype(np.int64) \
            % side
        k = z * PACK_Z + row_tms * PACK_Y + col
        g = pd.DataFrame({"k": k, "val": b["o_orderkey"].to_numpy()}) \
            .groupby("k", as_index=False)["val"].min()
        n = len(g)
        return pa.table({
            "k": pa.array(g["k"].to_numpy()),
            "side": pa.array(np.zeros(n, dtype=np.int64)),
            "cnt": pa.array(np.zeros(n, dtype=np.int64)),
            "mn": pa.array(g["val"].to_numpy().astype(np.int64)),
            "mx": pa.array(np.zeros(n, dtype=np.int64))})

    def request_partials(b: pa.Table) -> pa.Table:
        import pandas as pd
        z = 3 + (b["l_orderkey"].to_numpy() % 3)
        side = np.int64(1) << z
        col = b["l_partkey"].to_numpy() % side
        row_tms = (side - 1) - (b["l_suppkey"].to_numpy() % side)
        k = z * PACK_Z + row_tms * PACK_Y + col
        g = pd.DataFrame({"k": k, "val": b["l_orderkey"].to_numpy()}) \
            .groupby("k", as_index=False).agg(
                cnt=("k", "size"), mx=("val", "max"))
        n = len(g)
        return pa.table({
            "k": pa.array(g["k"].to_numpy()),
            "side": pa.array(np.ones(n, dtype=np.int64)),
            "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64)),
            "mn": pa.array(np.zeros(n, dtype=np.int64)),
            "mx": pa.array(g["mx"].to_numpy().astype(np.int64))})

    # coalesce the union's many tiny partial blocks before the exchange,
    # but never below cluster parallelism (a fixed repartition(16) measured
    # 2x wall at 32 cpus: 16 add_part/sort tasks cap the whole downstream)
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 16))
    except Exception:
        ncpu = 16
    rows = o.map_batches(store_partials, batch_format="pyarrow",
                         batch_size=None) \
        .union(li.map_batches(request_partials, batch_format="pyarrow",
                              batch_size=None)) \
        .repartition(max(16, 2 * ncpu))

    def reduce_part(t: pa.Table) -> pa.Table:
        import pandas as pd
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "n_hits": pa.array([], pa.int64()),
                          "min_payload": pa.array([], pa.int64()),
                          "max_req": pa.array([], pa.int64())})
        if "k" not in t.column_names or t.num_rows == 0:
            return empty
        df = t.to_pandas()
        sdf = df[df["side"] == 0]
        rdf = df[df["side"] == 1]
        s = sdf.groupby("k", as_index=False)["mn"].min() \
            .rename(columns={"k": "key", "mn": "payload"})
        r = rdf.groupby("k", as_index=False).agg(
            n_hits=("cnt", "sum"), max_req=("mx", "max")) \
            .rename(columns={"k": "key"})
        g = r.merge(s, on="key", how="inner")
        if not len(g):
            return empty
        return pa.table({"key": pa.array(g["key"].to_numpy()),
                         "n_hits": pa.array(g["n_hits"].to_numpy()
                                            .astype(np.int64)),
                         "min_payload": pa.array(g["payload"].to_numpy()),
                         "max_req": pa.array(g["max_req"].to_numpy())})

    return partitioned_groups(rows, ["k"], num_partitions=64).map_groups(
        reduce_part, batch_format="pyarrow")


def _mbtiles_fixture(sf_dir: str) -> str:
    """Deterministic REAL .mbtiles archive derived from orders with the
    q_tms_join key scheme (first-wins per key, blob = ascii payload,
    half the blobs gzipped). Built once per sf_dir under /tmp."""
    import hashlib
    import pyarrow.parquet as pq

    from ..sources.mbtiles import write_mbtiles

    tag = hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    path = f"/tmp/graft_fixtures/store_{tag}.mbtiles"
    if os.path.exists(path):
        return path
    os.makedirs("/tmp/graft_fixtures", exist_ok=True)
    ot = pq.read_table(f"{sf_dir}/orders.parquet",
                       columns=["o_orderkey", "o_custkey", "o_totalprice"])
    z = 3 + (ot["o_orderkey"].to_numpy() % 3)
    side = np.int64(1) << z
    col = ot["o_custkey"].to_numpy() % side
    row_tms = np.floor(ot["o_totalprice"].to_numpy()).astype(np.int64) % side
    payload = ot["o_orderkey"].to_numpy()
    # first-wins = min payload per key: insert in ascending payload order,
    # INSERT OR IGNORE keeps the first
    order = np.argsort(payload, kind="stable")
    rows = [(int(z[i]), int(col[i]), int(row_tms[i]),
             str(int(payload[i])).encode()) for i in order]
    # tmp + atomic rename: an interrupted build must never leave a partial
    # archive that os.path.exists() would reuse forever (the
    # write_mbtiles_shards / _cached_table pattern)
    write_mbtiles(path + ".tmp", rows)
    os.replace(path + ".tmp", path)
    return path


def q_mbtiles_sink(sf_dir: str) -> ray.data.Dataset:
    """Distributed mbtiles WRITE: orders-derived tiles (the q_tms_join key
    scheme) stream into sharded REAL sqlite archives — one single-writer
    reducer per shard, atomic rename (sources.mbtiles.write_mbtiles_shards).
    Result = the shard manifest (shard, n_tiles); the shard hash is
    overflow-free so the SQL oracle recomputes it exactly."""
    import hashlib

    from ..sources.mbtiles import write_mbtiles_shards

    o = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def tiles(b: pa.Table) -> pa.Table:
        z = 3 + (b["o_orderkey"].to_numpy() % 3)
        side = np.int64(1) << z
        col = b["o_custkey"].to_numpy() % side
        row_tms = np.floor(b["o_totalprice"].to_numpy()).astype(np.int64) \
            % side
        blobs = [str(int(k)).encode() for k in b["o_orderkey"].to_numpy()]
        return pa.table({"zoom": pa.array(z), "col": pa.array(col),
                         "row": pa.array(row_tms),
                         "tile_data": pa.array(blobs, pa.large_binary())})

    tag = hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    out_dir = f"/tmp/graft_out/mbtiles_shards_{tag}"
    manifest = write_mbtiles_shards(
        o.map_batches(tiles, batch_format="pyarrow"), out_dir, num_shards=8)
    return manifest.select_columns(["shard", "n_tiles"]).sort("shard")


SQL_MBTILES_SINK = """
SELECT (col * 2654435761 + row_tms * 40503 + z) % 8 AS shard,
       CAST(count(*) AS BIGINT) AS n_tiles
FROM (
  SELECT DISTINCT
         3 + (o_orderkey % 3) AS z,
         o_custkey % (1 << (3 + (o_orderkey % 3))) AS col,
         CAST(floor(o_totalprice) AS BIGINT)
             % (1 << (3 + (o_orderkey % 3))) AS row_tms
  FROM orders)
GROUP BY 1 ORDER BY 1
"""


def q_tile_archive(sf_dir: str) -> ray.data.Dataset:
    """END-TO-END archive build: input_hint images -> REAL decode + 2x
    box-filter resize + re-encode (stages.multimodal.ResizeImages, task
    pool) -> tile rows at the fixture's deterministic addresses -> sharded
    real .mbtiles archives (single-writer reducers). Result = shard
    manifest; the SQL oracle recomputes shard counts from the same image
    table (addressing + shard hash are overflow-free closed forms)."""
    import hashlib

    from .. import fixtures
    from ..sources.mbtiles import write_mbtiles_shards
    from ..stages.multimodal import ResizeImages

    path = fixtures.images_path_for(sf_dir)
    lod = fixtures.lod_for_count(fixtures.count_rows(path))
    side = np.int64(1) << lod

    small = ray.data.read_parquet(
        path, columns=["image_id", "bytes", "w", "h", "fmt"]) \
        .map_batches(ResizeImages(factor=2), batch_size=64,
                     batch_format="pyarrow")

    def tile_rows(b: pa.Table) -> pa.Table:
        idx = pc.cast(pc.utf8_slice_codeunits(b["image_id"], 4, 99),
                      pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "zoom": pa.array(np.full(b.num_rows, lod, np.int64)),
            "col": pa.array(idx % side),
            "row": pa.array((idx // side) % side),
            "tile_data": b["bytes"]})

    tag = hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    out_dir = f"/tmp/graft_out/tile_archive_{tag}"
    manifest = write_mbtiles_shards(
        small.map_batches(tile_rows, batch_format="pyarrow"),
        out_dir, num_shards=8)
    return manifest.select_columns(["shard", "n_tiles"]).sort("shard")


# oracle is pinned to the gate's sf0.01 fixture (4000 images -> lod 6,
# 64x64 grid); the Ray side materializes the fixture first
SQL_TILE_ARCHIVE = """
SELECT (col * 2654435761 + row * 40503 + 6) % 8 AS shard,
       CAST(count(*) AS BIGINT) AS n_tiles
FROM (
  SELECT CAST(substring(image_id, 5) AS BIGINT) % 64 AS col,
         (CAST(substring(image_id, 5) AS BIGINT) // 64) % 64 AS row
  FROM read_parquet('/tmp/graft_fixtures/sf0.01/images_4000/part-*.parquet'))
GROUP BY 1 ORDER BY 1
"""


def q_mbtiles_join(sf_dir: str) -> ray.data.Dataset:
    """The tms_join lookup against a REAL sqlite .mbtiles archive
    (sources.mbtiles: cached-connection actor pool, strict key parse, TMS
    flip, gzip sniff). Requests come from lineitem exactly as in
    q_tms_join; payloads parse back to ints so the aggregate — and the SQL
    oracle — are shared with q_tms_join."""
    from ..sources.mbtiles import lookup_mbtiles

    db = _mbtiles_fixture(sf_dir)
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])

    def requests(b: pa.Table) -> pa.Table:
        z = 3 + (b["l_orderkey"].to_numpy() % 3)
        side = np.int64(1) << z
        col = b["l_partkey"].to_numpy() % side
        row_td = b["l_suppkey"].to_numpy() % side
        paths = [f"s.mbtiles/{int(zz)}-{int(cc)}-{int(rr)}"
                 for zz, cc, rr in zip(z, col, row_td)]
        return pa.table({"path": pa.array(paths),
                         "req_order": pa.array(b["l_orderkey"].to_numpy())})

    looked = lookup_mbtiles(
        li.map_batches(requests, batch_format="pyarrow"), db)

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        ok = pc.equal(b["status"], "ok")
        t = b.filter(ok)
        if t.num_rows == 0:
            return pa.table({"rkey": pa.array([], pa.int64()),
                             "n_hits": pa.array([], pa.int64()),
                             "min_payload": pa.array([], pa.int64()),
                             "max_req": pa.array([], pa.int64())})
        payload = pc.cast(pc.cast(t["tile_data"], pa.large_string()),
                          pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"rkey": t["skey"].to_numpy(),
                           "payload": payload,
                           "req_order": t["req_order"].to_numpy()})
        g = df.groupby("rkey", as_index=False).agg(
            n_hits=("rkey", "size"), min_payload=("payload", "min"),
            max_req=("req_order", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = looked.map_batches(partial, batch_format="pyarrow") \
        .repartition(8).groupby("rkey").aggregate(
            Sum("n_hits", alias_name="n_hits"),
            Min("min_payload", alias_name="min_payload"),
            Max("max_req", alias_name="max_req"))
    return agg.rename_columns({"rkey": "key"})


SQL_TMS_JOIN = """
WITH store AS (
  -- primary-keyed store: first-wins (= min payload) per (zoom,col,row) key
  SELECT skey, min(payload) AS payload FROM (
    SELECT (3 + (o_orderkey % 3)) * 288230376151711744
           + (CAST(floor(o_totalprice) AS BIGINT) % (1 << (3 + (o_orderkey % 3)))) * 536870912
           + (o_custkey % (1 << (3 + (o_orderkey % 3)))) AS skey,
           o_orderkey AS payload
    FROM orders
  ) GROUP BY skey
), req AS (
  SELECT (3 + (l_orderkey % 3)) * 288230376151711744
         + (((1 << (3 + (l_orderkey % 3))) - 1) - (l_suppkey % (1 << (3 + (l_orderkey % 3))))) * 536870912
         + (l_partkey % (1 << (3 + (l_orderkey % 3)))) AS rkey,
         l_orderkey AS req_order
  FROM lineitem
)
SELECT rkey AS key, count(*) AS n_hits, min(payload) AS min_payload,
       max(req_order) AS max_req
FROM req JOIN store ON rkey = skey
GROUP BY rkey
"""


# ---------------------------------------------------------------------------
# aggregation semantics (weighted blend A1, blender.cpp:626-646)
# ---------------------------------------------------------------------------

def q_weighted_blend(sf_dir: str) -> ray.data.Dataset:
    """Weighted-mean with zero-weight guard, the scalar shape of the blend
    accumulator (acc = sum(v*w), wacc = sum(w), out = acc/max(wacc,1);
    blender.cpp:626-646). Integer cents/basis-points keep sums exact."""
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        cents = np.round(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        bp = np.round(b["l_discount"].to_numpy() * 100).astype(np.int64)
        flags = b["l_returnflag"]
        t = pa.table({"l_returnflag": flags,
                      "wv": pa.array(cents * bp),
                      "w": pa.array(bp)})
        return t

    p = li.map_batches(partial, batch_format="pyarrow")
    agg = p.groupby("l_returnflag").aggregate(
        Sum("wv", alias_name="wsum"),
        Sum("w", alias_name="wtot"),
        Count(alias_name="n"),
    )

    def finish(b: pa.Table) -> pa.Table:
        wtot = b["wtot"].to_numpy()
        wsum = b["wsum"].to_numpy()
        blended = wsum / np.where(wtot == 0, 1, wtot).astype(np.float64)
        return b.append_column("blended", pa.array(blended))

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_WEIGHTED_BLEND = """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS wsum,
       CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS wtot,
       count(*) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
       / CAST(CASE WHEN sum(CAST(round(l_discount * 100) AS BIGINT)) = 0
              THEN 1 ELSE sum(CAST(round(l_discount * 100) AS BIGINT)) END AS DOUBLE)
       AS blended
FROM lineitem GROUP BY l_returnflag
"""


def q_solid_agg(sf_dir: str) -> ray.data.Dataset:
    """TPC-H-Q1-shaped flagship aggregate (count + exact integer sums) —
    the 'constant generator smoke' analog of solid.cpp:443-448 applied to a
    real table: per group, all-rows reduction with fixed dtype."""
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "qty": pa.array(b["l_quantity"].to_numpy().astype(np.int64)),
            "cents": pa.array(np.round(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)),
        })

    p = li.map_batches(partial, batch_format="pyarrow")
    return p.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty", alias_name="sum_qty"),
        Sum("cents", alias_name="sum_cents"),
        Count(alias_name="n"),
    )


SQL_SOLID_AGG = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# dedup + text analysis over documents (engine-side training-data ops)
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup: group by a content key, keep first (min doc_id) —
    hash-partition + first-per-group (SURVEY.md §2.6 engine addition)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def key(b: pa.Table) -> pa.Table:
        return pa.table({"content_key": pc.utf8_slice_codeunits(b["text"], 0, 40),
                         "doc_id": b["doc_id"]})

    k = docs.map_batches(key, batch_format="pyarrow")
    return k.groupby("content_key").aggregate(
        Min("doc_id", alias_name="keeper_id"),
        Count(alias_name="n_copies"),
    )


SQL_DEDUP_EXACT = """
SELECT substr(text, 1, 40) AS content_key,
       min(doc_id) AS keeper_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_token_count(sf_dir: str) -> ray.data.Dataset:
    """Whitespace token counting (text-analysis op)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        # RE2 kernel (one C++ pass per batch) — the same engine the
        # DuckDB twin runs, so the count semantics are pinned once
        n = pc.count_substring_regex(b["text"], r"\S+")
        return pa.table({"doc_id": b["doc_id"],
                         "n_tokens": n.cast(pa.int64())})

    return docs.map_batches(f, batch_format="pyarrow")


# GPT-2-style pre-tokenizer, simplified to the lookahead-free subset both
# Python re and DuckDB's RE2 evaluate identically (leftmost-first
# alternation): contractions, space-prefixed letter/digit/punct runs,
# whitespace runs. Whitespace is the EXPLICIT ASCII class, not \s —
# Python's \s additionally matches \x0b and unicode spaces while RE2's
# does not, which would silently diverge the two engines.
_WS = r" \t\n\f\r"
_BPE_PAT = ("'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+"
            "| ?[^" + _WS + "A-Za-z0-9]+|[" + _WS + "]+")


def q_bpe_token_count(sf_dir: str) -> ray.data.Dataset:
    """BPE-ish sub-token counting (the pre-tokenization pass of byte-pair
    tokenizers): compiled once per worker, vectorized over the batch."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        # Arrow's count_substring_regex is RE2 — identical alternation
        # behavior to the DuckDB twin on this lookahead-free subset
        n = pc.count_substring_regex(b["text"], _BPE_PAT)
        return pa.table({"doc_id": b["doc_id"],
                         "n_bpe_tokens": n.cast(pa.int64())})

    return docs.map_batches(f, batch_format="pyarrow")


SQL_BPE_TOKEN_COUNT = (
    "SELECT doc_id, CAST(length(regexp_extract_all(text, '"
    + _BPE_PAT.replace("'", "''")
    + "')) AS BIGINT) AS n_bpe_tokens FROM documents"
)


SQL_TOKEN_COUNT = r"""
SELECT doc_id, CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
FROM documents
"""


def q_quality(sf_dir: str) -> ray.data.Dataset:
    """Quality scoring: length, punctuation count, uppercase ratio."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        n_chars = pc.utf8_length(b["text"]).to_numpy().astype(np.int64)
        n_upper = pc.count_substring_regex(b["text"], "[A-Z]") \
            .to_numpy().astype(np.int64)
        n_punct = pc.count_substring_regex(b["text"], "[.,!?;:]") \
            .to_numpy().astype(np.int64)
        score = n_upper / np.maximum(n_chars, 1).astype(np.float64)
        return pa.table({"doc_id": b["doc_id"],
                         "n_chars_calc": pa.array(n_chars),
                         "n_punct": pa.array(n_punct),
                         "n_upper": pa.array(n_upper),
                         "upper_ratio": pa.array(score)})

    return docs.map_batches(f, batch_format="pyarrow")


SQL_QUALITY = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_calc,
       CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
       CAST(length(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper,
       CAST(length(regexp_extract_all(text, '[A-Z]')) AS DOUBLE)
       / CAST(GREATEST(length(text), 1) AS DOUBLE) AS upper_ratio
FROM documents
"""


# ---------------------------------------------------------------------------
# events: tumbling-window aggregate (streaming-shaped; SURVEY.md §2.8)
# ---------------------------------------------------------------------------

def q_events_window(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-hour windows per event_type: count + order-independent
    min/max. Window id from integer microsecond arithmetic (exact)."""
    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def f(b: pa.Table) -> pa.Table:
        us = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        win = us // (3600 * 1_000_000)
        return pa.table({"event_type": b["event_type"],
                         "window_id": pa.array(win),
                         "value": b["value"]})

    w = ev.map_batches(f, batch_format="pyarrow")
    return w.groupby(["event_type", "window_id"]).aggregate(
        Count(alias_name="n"),
        Min("value", alias_name="vmin"),
        Max("value", alias_name="vmax"),
    )


SQL_EVENTS_WINDOW = """
SELECT event_type, epoch_us(ts) // 3600000000 AS window_id,
       count(*) AS n, min(value) AS vmin, max(value) AS vmax
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# kNN brute-force (engine baseline for ANN; k-ring variant lives in stages/)
# ---------------------------------------------------------------------------

def q_knn_brute(sf_dir: str, k: int = 10, n_queries: int = 5) -> ray.data.Dataset:
    """Exact top-k cosine neighbors: queries = vec_id < n_queries, broadcast
    as a dense matrix via ray.put; candidates stream through map_batches
    computing a matmul per batch; per-batch top-k partials then one small
    groupby finalize (no full shuffle of similarities)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    # query side is tiny by definition: read it directly and broadcast once
    import pyarrow.parquet as pq
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", n_queries)]).sort_by("vec_id")
    qids = qt["vec_id"].to_numpy()
    qmat = np.stack([np.asarray(e, dtype=np.float64)
                     for e in qt["embedding"].to_pylist()])
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qref = ray.put((qids, qmat))

    def partial_topk(b: pa.Table) -> pa.Table:
        ids_q, mat_q = ray.get(qref)
        vid = b["vec_id"].to_numpy()
        keep = vid >= n_queries
        if not keep.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        vid = vid[keep]
        cand = np.stack(b["embedding"].to_numpy(zero_copy_only=False)[keep]).astype(np.float64)
        cand = cand / np.linalg.norm(cand, axis=1, keepdims=True)
        sims = mat_q @ cand.T                     # (Q, C)
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            out_q.append(np.full(kk, ids_q[qi]))
            out_n.append(vid[top[qi]])
            out_s.append(sims[qi, top[qi]])
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "neighbor_id": pa.array(np.concatenate(out_n)),
                         "sim": pa.array(np.concatenate(out_s))})

    partials = emb.map_batches(partial_topk, batch_format="pyarrow",
                               batch_size=2048)

    def finalize(g):
        import pandas as pd
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(finalize, batch_format="pandas")


SQL_KNN_BRUTE = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
     c AS (SELECT vec_id AS nid, embedding AS ne FROM embeddings WHERE vec_id >= 5),
     s AS (SELECT qid, nid, list_cosine_similarity(qe, ne) AS sim FROM q CROSS JOIN c),
     r AS (SELECT qid, nid,
                  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
           FROM s)
SELECT qid AS query_id, nid AS neighbor_id, rk AS rank FROM r WHERE rk <= 10
"""


# ---------------------------------------------------------------------------
# point-in-polygon, rectangle fast path (J-extensions, SURVEY.md §2.4;
# broadcast small side + vectorized containment like blender's valid-rect
# test, blender.cpp:590-600)
# ---------------------------------------------------------------------------

def q_pip_rect(sf_dir: str) -> ray.data.Dataset:
    """Points (from customer) vs 5 axis-aligned rects (from region keys):
    count per rect, half-open [x0,x1) × [y0,y1) containment."""
    cust = _read(sf_dir, "customer", ["c_custkey"])
    rects = [(r, r * 150.0, r * 100.0, r * 150.0 + 200.0, r * 100.0 + 180.0)
             for r in range(5)]
    rref = ray.put(rects)

    def partial(b: pa.Table) -> pa.Table:
        rs = ray.get(rref)
        ck = b["c_custkey"].to_numpy()
        x = ((ck * 13) % 1000).astype(np.float64)
        y = ((ck * 29) % 900).astype(np.float64)
        ids, cnt = [], []
        for rid, x0, y0, x1, y1 in rs:
            inside = (x >= x0) & (x < x1) & (y >= y0) & (y < y1)
            ids.append(rid)
            cnt.append(int(inside.sum()))
        return pa.table({"rect_id": pa.array(np.asarray(ids, dtype=np.int64)),
                         "n_points": pa.array(np.asarray(cnt, dtype=np.int64))})

    p = cust.map_batches(partial, batch_format="pyarrow")
    agg = p.groupby("rect_id").aggregate(Sum("n_points", alias_name="n_points"))
    # SQL's inner join emits no row for an empty rect — mirror that
    return agg.map_batches(
        lambda b: b.filter(pc.greater(b["n_points"], 0)), batch_format="pyarrow")


SQL_PIP_RECT = """
WITH rects AS (
  SELECT CAST(r_regionkey AS BIGINT) AS rect_id,
         r_regionkey * 150.0 AS x0, r_regionkey * 100.0 AS y0,
         r_regionkey * 150.0 + 200.0 AS x1, r_regionkey * 100.0 + 180.0 AS y1
  FROM region
), pts AS (
  SELECT CAST((c_custkey * 13) % 1000 AS DOUBLE) AS x,
         CAST((c_custkey * 29) % 900 AS DOUBLE) AS y
  FROM customer
)
SELECT rect_id, count(*) AS n_points
FROM rects JOIN pts ON x >= x0 AND x < x1 AND y >= y0 AND y < y1
GROUP BY rect_id
"""


def q_asof_join(sf_dir: str) -> ray.data.Dataset:
    """AS-OF join (engine custom op): each purchase event matched to the
    latest click <= its timestamp by the same user; gap reported in integer
    microseconds. DuckDB twin uses a windowed join."""
    from ..stages.joins import asof_join

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
    purchases = ev.filter(expr="event_type == 'purchase'") \
                  .select_columns(["event_id", "ts", "user_id"])
    clicks = ev.filter(expr="event_type == 'click'") \
               .select_columns(["event_id", "ts", "user_id"])
    j = asof_join(purchases, clicks, key="user_id", time_col="ts",
                  tie_col="event_id")

    def finish(b: pa.Table) -> pa.Table:
        gap = pc.cast(pc.subtract(pc.cast(b["ts"], pa.int64()),
                                  pc.cast(b["ts_r"], pa.int64())), pa.int64())
        return pa.table({
            "purchase_id": b["event_id"],
            "user_id": b["user_id"],
            "click_id": b["event_id_r"],
            "gap_us": gap,
        })

    return j.map_batches(finish, batch_format="pyarrow")


SQL_ASOF_JOIN = """
WITH p AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS pts,
         c.event_id AS click_id, c.ts AS cts,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
)
SELECT purchase_id, user_id, click_id,
       CAST(epoch_us(pts) - epoch_us(cts) AS BIGINT) AS gap_us
FROM j WHERE rn = 1
"""


def q_range_join(sf_dir: str) -> ray.data.Dataset:
    """RANGE join (engine custom op): lineitem extendedprice against price
    bands derived from region keys [1000*r^2, 1000*(r+1)^2); count + integer
    cent-sum per band. Bands broadcast; containment refined vectorized."""
    import pandas as pd

    from ..stages.joins import range_join

    bands = pd.DataFrame({
        "band_id": np.arange(8, dtype=np.int64),
        "lo": (1000.0 * np.arange(8) ** 2),
        "hi": (1000.0 * (np.arange(8) + 1) ** 2),
    })
    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    j = range_join(li, bands, "l_extendedprice", "lo", "hi",
                   bucket_width=1000.0)

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        cents = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        g = pd.DataFrame({"band_id": df["band_id"], "c": cents}) \
            .groupby("band_id", as_index=False) \
            .agg(n=("c", "size"), sum_cents=("c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return j.map_batches(partial, batch_format="pyarrow") \
        .groupby("band_id").aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_cents", alias_name="sum_cents"))


SQL_RANGE_JOIN = """
WITH bands AS (
  SELECT CAST(r AS BIGINT) AS band_id,
         1000.0 * r * r AS lo, 1000.0 * (r + 1) * (r + 1) AS hi
  FROM (SELECT unnest(range(0, 8)) AS r)
)
SELECT band_id, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM lineitem JOIN bands
  ON l_extendedprice >= lo AND l_extendedprice < hi
GROUP BY band_id
"""


GAP_US = 1_800_000_000  # 30 min session gap


def _events_us(sf_dir: str) -> ray.data.Dataset:
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def to_us(b: pa.Table) -> pa.Table:
        us = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table({"user_id": b["user_id"], "us": pa.array(us)})

    return ev.map_batches(to_us, batch_format="pyarrow")


def q_sessionize(sf_dir: str) -> ray.data.Dataset:
    """Session windows: per-user event runs split where the gap to the
    previous event exceeds 30 minutes (classic log sessionization — the
    gap-window streaming op, computed batch-style; stages.windows).
    Integer-µs arithmetic throughout so the hash compare is exact."""
    from ..stages.windows import sessionize
    return sessionize(_events_us(sf_dir), GAP_US)


def q_sessionize_bucketed(sf_dir: str) -> ray.data.Dataset:
    """The hot-user-BOUNDED sessionize plan (stages.windows
    sessionize_bucketed): events group by (user, 6h time bucket), boundary
    sessions stitch from per-bucket summaries — no reducer ever holds one
    user's whole history. Row-identical to q_sessionize; shares its SQL
    oracle."""
    from ..stages.windows import sessionize_bucketed
    return sessionize_bucketed(_events_us(sf_dir), GAP_US,
                               bucket_us=6 * 3_600_000_000)


def q_hopping_window(sf_dir: str) -> ray.data.Dataset:
    """HOPPING (sliding) windows: size 30 min, hop 15 min — every event
    lands in exactly two overlapping windows. Per-batch the two window
    assignments pre-aggregate (combiner) so the exchange carries one row
    per (window) per batch, not one per event-copy. Integer-µs + cents."""
    ev = _read(sf_dir, "events", ["ts", "value"])
    HOP_US = 900_000_000  # 15 min; window = 2 hops

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        us = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.round(b["value"].to_numpy() * 100).astype(np.int64)
        h = us // HOP_US
        wstart = np.concatenate([h * HOP_US, (h - 1) * HOP_US])
        c2 = np.concatenate([cents, cents])
        g = pd.DataFrame({"window_start_us": wstart, "c": c2}) \
            .groupby("window_start_us", as_index=False) \
            .agg(n_events=("c", "size"), sum_value_cents=("c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("window_start_us").aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_cents", alias_name="sum_value_cents"))


SQL_HOPPING_WINDOW = """
WITH e AS (
  SELECT epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), w AS (
  SELECT (us // 900000000) * 900000000 AS wstart, c FROM e
  UNION ALL
  SELECT ((us // 900000000) - 1) * 900000000 AS wstart, c FROM e
)
SELECT CAST(wstart AS BIGINT) AS window_start_us,
       count(*) AS n_events,
       CAST(sum(c) AS BIGINT) AS sum_value_cents
FROM w GROUP BY wstart
"""


SQL_SESSIONIZE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
), d AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
), s AS (
  SELECT user_id, us,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM d
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       CAST(min(us) AS BIGINT) AS start_us,
       CAST(max(us) AS BIGINT) AS end_us
FROM s GROUP BY user_id, session_id
"""


def q_topk_orders(sf_dir: str) -> ray.data.Dataset:
    """Distributed top-k WITHOUT a global sort: each batch keeps only its
    local top 100 (the exchange moves <= 100 rows per block instead of the
    whole table), one tiny final head finishes. Ties break on orderkey;
    price in integer cents for exact compare."""
    o = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def partial_top(b: pa.Table) -> pa.Table:
        c = np.round(b["o_totalprice"].to_numpy() * 100).astype(np.int64)
        k = b["o_orderkey"].to_numpy()
        take = np.lexsort((k, -c))[:100]
        return pa.table({"o_orderkey": pa.array(k[take]),
                         "price_cents": pa.array(c[take])})

    def final_top(b: pa.Table) -> pa.Table:
        c = b["price_cents"].to_numpy()
        k = b["o_orderkey"].to_numpy()
        take = np.lexsort((k, -c))[:100]
        return pa.table({"o_orderkey": pa.array(k[take]),
                         "price_cents": pa.array(c[take])})

    # funnel finalize: the <=100-rows-per-block partials merge in ONE
    # reducer TASK (repartition(1)), not on the driver — the collected
    # result is exactly 100 rows regardless of block count
    return o.map_batches(partial_top, batch_format="pyarrow") \
        .repartition(1).map_batches(final_top, batch_format="pyarrow",
                                    batch_size=None)


def q_group_topk(sf_dir: str) -> ray.data.Dataset:
    """Per-GROUP top-k without a global sort: each batch keeps its local
    top-k PER GROUP (exchange carries <= k x n_groups rows per block), a
    tiny final pass ranks. Low-cardinality groups (5 priorities) finish in
    one reducer; for high-cardinality groups the same partial feeds
    stages.joins.partitioned_groups instead — the funnel shape is
    identical."""
    import pandas as pd

    o = _read(sf_dir, "orders",
              ["o_orderkey", "o_totalprice", "o_orderpriority"])
    K = 5

    def topk_df(df: pd.DataFrame, k: int) -> pd.DataFrame:
        df = df.sort_values(["grp", "cents", "o_orderkey"],
                            ascending=[True, False, True], kind="stable")
        return df.groupby("grp", as_index=False, sort=False).head(k)

    def partial(b: pa.Table) -> pa.Table:
        grp = pc.cast(pc.utf8_slice_codeunits(b["o_orderpriority"], 0, 1),
                      pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.round(b["o_totalprice"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"grp": grp, "cents": cents,
                           "o_orderkey": b["o_orderkey"].to_numpy()})
        return pa.Table.from_pandas(topk_df(df, K), preserve_index=False)

    def final(b: pa.Table) -> pa.Table:
        df = topk_df(b.to_pandas(), K)
        df["rank"] = df.groupby("grp", sort=False).cumcount() + 1
        return pa.Table.from_pandas(
            df[["grp", "rank", "o_orderkey", "cents"]].astype(np.int64),
            preserve_index=False)

    return o.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(final, batch_format="pyarrow")


SQL_GROUP_TOPK = """
SELECT grp, rank, o_orderkey, cents FROM (
  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS grp,
         o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (
             PARTITION BY substring(o_orderpriority, 1, 1)
             ORDER BY round(o_totalprice * 100) DESC, o_orderkey) AS rank
  FROM orders)
WHERE rank <= 5
"""


def q_topk_fullsort(sf_dir: str) -> ray.data.Dataset:
    """Same result through a FULL distributed sort + limit — kept as the
    §2.6 global-sort coverage surface (the scale-safe plan above is the
    default implementation)."""
    o = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.round(b["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "price_cents": pa.array(c)})

    return o.map_batches(cents, batch_format="pyarrow") \
            .sort(["price_cents", "o_orderkey"], descending=[True, False]) \
            .limit(100)


SQL_TOPK_ORDERS = """
SELECT o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders
ORDER BY price_cents DESC, o_orderkey ASC
LIMIT 100
"""


# KMV (k-minimum-values) distinct sketch: deterministic universal hash ->
# keep the k smallest distinct hashes -> estimate = (k-1) * M / h_k.
# The sketch union (merge partials, keep k smallest) is associative and
# commutative, so per-batch partials reduce without a key shuffle.
_KMV_A = 6364136223846793005 % 2147483647
_KMV_B = 1442695040888963407 % 2147483647
_KMV_M = 2147483647
_KMV_K = 256


def q_distinct_sketch(sf_dir: str) -> ray.data.Dataset:
    """Approximate COUNT DISTINCT of lineitem part keys via a KMV sketch
    with an integer hash the SQL twin reproduces exactly: row = (k, h_k,
    estimate). Exact-deterministic, so fully oracle-checked."""
    li = _read(sf_dir, "lineitem", ["l_partkey"])

    def partial(b: pa.Table) -> pa.Table:
        v = b["l_partkey"].to_numpy().astype(np.int64)
        h = (_KMV_A * v + _KMV_B) % _KMV_M
        h = np.unique(h)[:_KMV_K]
        return pa.table({"h": pa.array(h)})

    def merge(b: pa.Table) -> pa.Table:
        hs = np.unique(b["h"].to_numpy())[:_KMV_K]
        k = len(hs)
        hk = int(hs[-1]) if k else 0
        est = int((k - 1) * _KMV_M // hk) if hk > 0 else 0
        return pa.table({"k": pa.array([k], pa.int64()),
                         "h_k": pa.array([hk], pa.int64()),
                         "estimate": pa.array([est], pa.int64())})

    # sketch union in one reducer TASK (<=256 rows per block funnel);
    # the driver never concatenates per-block partials
    return li.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(merge, batch_format="pyarrow",
                                    batch_size=None)


SQL_DISTINCT_SKETCH = f"""
WITH h AS (
  SELECT DISTINCT ({_KMV_A} * l_partkey + {_KMV_B}) % {_KMV_M} AS h
  FROM lineitem
), kmv_top AS (
  SELECT h FROM h ORDER BY h LIMIT {_KMV_K}
)
SELECT CAST(count(*) AS BIGINT) AS k,
       CAST(max(h) AS BIGINT) AS h_k,
       CAST((count(*) - 1) * {_KMV_M} // max(h) AS BIGINT) AS estimate
FROM kmv_top
"""


def q_sample_mod(sf_dir: str) -> ray.data.Dataset:
    """Deterministic 10% sample (hash-mod on the key — reproducible across
    runs and engines, unlike RNG sampling): count + integer sum of the
    sampled orders."""
    o = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def f(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy()
        keep = ((k * 2654435761) % 10) == 0
        c = np.round(b["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table({
            "n": pa.array([np.int64(keep.sum())]),
            "sum_cents": pa.array([np.int64(c[keep].sum())]),
        })

    from ray.data.aggregate import Sum as _Sum
    agg = o.map_batches(f, batch_format="pyarrow")
    out = agg.groupby(None).aggregate(_Sum("n", alias_name="n"),
                                      _Sum("sum_cents",
                                           alias_name="sum_cents"))
    return out


SQL_SAMPLE_MOD = """
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM orders WHERE (o_orderkey * 2654435761) % 10 = 0
"""


def q_set_ops(sf_dir: str) -> ray.data.Dataset:
    """INTERSECT / EXCEPT / UNION counts over customer keys, fully dataset-
    native: per-batch distinct (key, side-bit) rows are hash-PARTITIONED
    (all copies of a key land in one partition), each partition reduces
    with one vectorized np.unique/intersect pass, and the 64 partial rows
    sum in a tiny final aggregate. Key sets never land on the driver (the
    round-1 driver-merge was the §2.6 scale gap); one exchange total,
    reducer calls = num_partitions, not num_keys."""
    from gdal_drivers_ray.stages.joins import partitioned_groups

    o = _read(sf_dir, "orders", ["o_custkey"])
    c = _read(sf_dir, "customer", ["c_custkey"])

    def dk(col, side):
        def f(b: pa.Table) -> pa.Table:
            u = np.unique(b[col].to_numpy())
            return pa.table({
                "k": pa.array(u.astype(np.int64)),
                "side": pa.array(np.full(len(u), side, dtype=np.int64))})
        return f

    rows = o.map_batches(dk("o_custkey", 0), batch_format="pyarrow") \
        .union(c.map_batches(dk("c_custkey", 1), batch_format="pyarrow")) \
        .repartition(8)

    def reduce_part(t: pa.Table) -> pa.Table:
        if "k" not in t.column_names or t.num_rows == 0:
            return pa.table({"n_with_orders": pa.array([], pa.int64()),
                             "n_without_orders": pa.array([], pa.int64()),
                             "n_union": pa.array([], pa.int64())})
        k = t["k"].to_numpy()
        side = t["side"].to_numpy()
        ok = np.unique(k[side == 0])
        ck = np.unique(k[side == 1])
        n_both = np.intersect1d(ok, ck, assume_unique=True).size
        return pa.table({
            "n_with_orders": pa.array([np.int64(n_both)]),
            "n_without_orders": pa.array([np.int64(ck.size - n_both)]),
            "n_union": pa.array([np.int64(ok.size + ck.size - n_both)]),
        })

    partials = partitioned_groups(rows, ["k"]).map_groups(
        reduce_part, batch_format="pyarrow")
    return partials.groupby(None).aggregate(
        Sum("n_with_orders", alias_name="n_with_orders"),
        Sum("n_without_orders", alias_name="n_without_orders"),
        Sum("n_union", alias_name="n_union"))


SQL_SET_OPS = """
SELECT
  (SELECT count(*) FROM (SELECT DISTINCT c_custkey FROM customer
                         INTERSECT SELECT DISTINCT o_custkey FROM orders))
      AS n_with_orders,
  (SELECT count(*) FROM (SELECT DISTINCT c_custkey FROM customer
                         EXCEPT SELECT DISTINCT o_custkey FROM orders))
      AS n_without_orders,
  (SELECT count(*) FROM (SELECT DISTINCT c_custkey FROM customer
                         UNION SELECT DISTINCT o_custkey FROM orders))
      AS n_union
"""


def q_group_quantile(sf_dir: str) -> ray.data.Dataset:
    """Exact discrete per-group quantiles (p50/p90 of quantity in cents per
    returnflag) — lower-nearest rule, reproduced by DuckDB quantile_disc."""
    import pandas as pd

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def to_cents(b: pa.Table) -> pa.Table:
        c = np.round(b["l_quantity"].to_numpy() * 100).astype(np.int64)
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "qty_c": pa.array(c)})

    def quant(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["qty_c"].to_numpy())
        n = len(v)
        # quantile_disc: value at ceil(p*n)-1 (1-based ceil rank)
        def qd(p: float) -> int:
            return int(v[max(int(np.ceil(p * n)) - 1, 0)])
        return pd.DataFrame({"l_returnflag": [g["l_returnflag"].iloc[0]],
                             "p50": [qd(0.5)], "p90": [qd(0.9)],
                             "n": [np.int64(n)]})

    return li.map_batches(to_cents, batch_format="pyarrow") \
             .groupby("l_returnflag") \
             .map_groups(quant, batch_format="pandas")


SQL_GROUP_QUANTILE = """
SELECT l_returnflag,
       CAST(quantile_disc(CAST(round(l_quantity * 100) AS BIGINT), 0.5)
            AS BIGINT) AS p50,
       CAST(quantile_disc(CAST(round(l_quantity * 100) AS BIGINT), 0.9)
            AS BIGINT) AS p90,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def q_semi_join(sf_dir: str) -> ray.data.Dataset:
    """Allowlist membership filter: lineitem rows of URGENT orders via the
    broadcast semi-join (key set ray.put once, searchsorted per block)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_semi_join

    ot = pq.read_table(f"{sf_dir}/orders.parquet",
                       columns=["o_orderkey", "o_orderpriority"])
    keys = ot.filter(pc.equal(ot["o_orderpriority"], "1-URGENT"))["o_orderkey"]
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    return broadcast_semi_join(li, keys.to_numpy(), "l_orderkey")


def q_anti_join(sf_dir: str) -> ray.data.Dataset:
    """Blocklist filter: lineitem rows whose order is NOT urgent — the
    dedup-against-blocklist shape of training-data pipelines."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_semi_join

    ot = pq.read_table(f"{sf_dir}/orders.parquet",
                       columns=["o_orderkey", "o_orderpriority"])
    keys = ot.filter(pc.equal(ot["o_orderpriority"], "1-URGENT"))["o_orderkey"]
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    return broadcast_semi_join(li, keys.to_numpy(), "l_orderkey", anti=True)


SQL_SEMI_JOIN = """
SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
"""

SQL_ANTI_JOIN = """
SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders
                         WHERE o_orderpriority = '1-URGENT')
"""


def q_string_join(sf_dir: str) -> ray.data.Dataset:
    """Both-sides-large equi-join on a STRING key: per-type price stats
    (distributed partial aggregate) joined back to every part row
    through the string cogroup exchange (pandas-siphash partitioning +
    exact-value merge, stages/joins.py). In production a key this
    low-cardinality would broadcast; this query pins the string-key
    exchange path end-to-end against the DuckDB twin. All-integer
    payloads keep the hash float-free."""
    from ray.data.aggregate import Sum

    from ..stages.joins import cogroup_join

    p = _read(sf_dir, "part", ["p_partkey", "p_type", "p_retailprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.round(b["p_retailprice"].to_numpy() * 100).astype(np.int64)
        return pa.table({"p_partkey": b["p_partkey"],
                         "p_type": b["p_type"],
                         "price_cents": pa.array(c)})

    parts = p.map_batches(cents, batch_format="pyarrow", batch_size=None)

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({"p_type": b["p_type"].to_pylist(),
                           "c": b["price_cents"].to_numpy()})
        g = df.groupby("p_type", as_index=False) \
            .agg(type_sum_cents=("c", "sum"), type_n=("c", "size"))
        g["type_sum_cents"] = g["type_sum_cents"].astype(np.int64)
        g["type_n"] = g["type_n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = parts.map_batches(partial, batch_format="pyarrow") \
        .groupby("p_type").aggregate(
            Sum("type_sum_cents", alias_name="type_sum_cents"),
            Sum("type_n", alias_name="type_n"))

    return cogroup_join(parts, stats, on="p_type", how="inner")


SQL_STRING_JOIN = """
WITH c AS (
  SELECT p_partkey, p_type,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
  FROM part
), s AS (
  SELECT p_type, CAST(SUM(price_cents) AS BIGINT) AS type_sum_cents,
         CAST(count(*) AS BIGINT) AS type_n
  FROM c GROUP BY 1
)
SELECT c.p_partkey, c.p_type, c.price_cents, s.type_sum_cents, s.type_n
FROM c JOIN s USING (p_type)
"""


def q_bloom_semi_join(sf_dir: str) -> ray.data.Dataset:
    """Both-sides-large semi-join through the Bloom prefilter + exact
    verify (stages/joins.bloom_semi_join): keep lineitems whose order is
    high-value. The bloom bitmap (1 MiB) replaces an exact broadcast of
    the right key set; the surviving stream (matches + false positives)
    routes through the exact cogroup, so the result equals the plain
    IN-subquery row-for-row."""
    from ..stages.joins import bloom_semi_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey",
                                    "l_suppkey"])
    o = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def high(b: pa.Table) -> pa.Table:
        keep = b["o_totalprice"].to_numpy() > 150000.0
        return b.filter(pa.array(keep)).select(["o_orderkey"])

    rich = o.map_batches(high, batch_format="pyarrow", batch_size=None)
    out = bloom_semi_join(li, rich, on="l_orderkey",
                          right_on="o_orderkey")
    return out.select_columns(["l_orderkey", "l_partkey", "l_suppkey"])


SQL_BLOOM_SEMI_JOIN = """
SELECT l_orderkey, l_partkey, l_suppkey
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0)
"""
