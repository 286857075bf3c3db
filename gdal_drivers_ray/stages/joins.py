"""Join strategies (SURVEY.md §2.4).

Two physical plans for the same logical equi-join, chosen by side size —
the engine equivalent of the reference's keyed tile lookup
(detail/mbtiles.cpp:160-197, one SQLite point query per tile):

- ``broadcast_join``: the small side is shipped to the object store ONCE
  (`ray.put`) and every map task merges against it per batch. No shuffle.
  Right for dimension tables / tile stores that fit in worker memory
  (× one copy per node at cluster scale).
- ``shuffle_join``: Ray Data's native hash-partitioned `Dataset.join` for
  two large sides. `num_partitions` should be ~ the cluster's total CPU
  count; every row moves once.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _csr_expand_local(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """concat(arange(s, s+l)) — flat gather indices for CSR ranges."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    shift = np.repeat(starts - np.concatenate(([0], np.cumsum(lens)[:-1])),
                      lens)
    return shift + np.arange(total, dtype=np.int64)


def broadcast_join(left: ray.data.Dataset, small_df: pd.DataFrame,
                   left_on: str, right_on: str,
                   how: str = "inner") -> ray.data.Dataset:
    """Hash-join `left` (a Dataset) against a small side, broadcast once
    via ray.put and probed per batch WITHOUT leaving Arrow: the small
    side is key-sorted once on the driver (unique keys + CSR ranges for
    duplicates); each batch does one searchsorted + two takes. `how` is
    'inner' or 'left'. Right-side name collisions get a '_y' suffix; when
    the key columns share a name only the left copy is kept (pandas-merge
    `on=` semantics)."""
    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join supports inner/left, got {how!r}")
    small = pa.Table.from_pandas(small_df, preserve_index=False) \
        if isinstance(small_df, pd.DataFrame) else small_df
    if not pa.types.is_integer(small.schema.field(right_on).type):
        raise TypeError(
            f"broadcast_join key {right_on!r} must be integer-typed "
            f"(got {small.schema.field(right_on).type}); the searchsorted "
            "probe coerces to int64 — string keys would raise and float "
            "keys would silently truncate")
    keys = small[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys, kind="stable")
    uk, starts, lens = np.unique(keys[order], return_index=True,
                                 return_counts=True)
    ref = ray.put((uk, starts.astype(np.int64), lens.astype(np.int64),
                   small.take(pa.array(order))))
    drop_rkey = right_on == left_on

    def merge(batch: pa.Table) -> pa.Table:
        ks, st, ln, s = ray.get(ref)
        if not pa.types.is_integer(batch.schema.field(left_on).type):
            raise TypeError(
                f"broadcast_join key {left_on!r} must be integer-typed "
                f"(got {batch.schema.field(left_on).type})")
        bk = batch[left_on].to_numpy().astype(np.int64)
        if len(ks) == 0:
            # empty small side: ks[pos_c] below would index an empty
            # array. No key can match — inner keeps nothing, left keeps
            # everything with null right columns.
            ok = np.zeros(len(bk), dtype=bool)
            pos = np.zeros(len(bk), dtype=np.int64)
        else:
            pos = np.searchsorted(ks, bk)
            ok = pos < len(ks)
            pos_c = np.where(ok, pos, 0)
            ok &= ks[pos_c] == bk
        rows = np.nonzero(ok)[0]
        n_m = ln[pos[rows]]
        li = np.repeat(rows, n_m)
        ri = _csr_expand_local(st[pos[rows]], n_m)
        if how == "left":
            miss = np.nonzero(~ok)[0]
            li = np.concatenate([li, miss])
            ri = np.concatenate([ri, np.zeros(len(miss), np.int64)])
            valid = np.concatenate([np.ones(len(ri) - len(miss), bool),
                                    np.zeros(len(miss), bool)])
            o = np.argsort(li, kind="stable")   # preserve left row order
            li, ri, valid = li[o], ri[o], valid[o]
            r_idx = pa.array(ri, mask=~valid)   # null idx -> null right row
        else:
            r_idx = pa.array(ri)
        out = batch.take(pa.array(li, pa.int64()))
        for c in s.column_names:
            if drop_rkey and c == right_on:
                continue
            name = c + "_y" if c in batch.column_names else c
            out = out.append_column(name, pc_take(s[c], r_idx))
        return out

    return left.map_batches(merge, batch_format="pyarrow",
                            batch_size=None)


def pc_take(col, idx):
    import pyarrow.compute as pc
    return pc.take(col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                   else col, idx)


def shuffle_join(left: ray.data.Dataset, right: ray.data.Dataset,
                 on: tuple[str, ...], right_on: Optional[tuple[str, ...]] = None,
                 how: str = "inner",
                 num_partitions: int = 32) -> ray.data.Dataset:
    """Both-sides-large hash join via Ray Data's native ``Dataset.join``.

    WARNING: the native hash-shuffle join starves its aggregator actors at
    small ``num_cpus`` (observed deadlock at num_cpus=4). ``cogroup_join``
    below is the portable both-sides-large plan this engine uses; this
    wrapper remains for clusters where the native operator is sized
    correctly (aggregator actors + map tasks <= total CPUs)."""
    return left.join(right, join_type=how, num_partitions=num_partitions,
                     on=on, right_on=right_on)


def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
    """Dataset schema as pyarrow (pandas-block datasets expose numpy
    dtypes; map them over, defaulting unmappable object columns to string)."""
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, t in zip(base.names, base.types):
        try:
            fields.append((name, pa.from_numpy_dtype(t)))
        except (pa.ArrowNotImplementedError, TypeError):
            fields.append((name, pa.string()))
    return pa.schema(fields)


_KNUTH = np.int64(2654435761)


def _part_of(key: np.ndarray, num_partitions: int) -> np.ndarray:
    """Deterministic partition of an int64 key (multiplicative hash;
    numpy wraparound is part of the function). Non-negative."""
    with np.errstate(over="ignore"):
        return (key.astype(np.int64) * _KNUTH) % np.int64(num_partitions)


def _part_of_str(vals: np.ndarray, num_partitions: int) -> np.ndarray:
    """Deterministic partition of a STRING key: pandas' vectorized
    siphash (fixed default hash key, stable across processes — both
    sides of an exchange must agree) mod the partition count."""
    import pandas as pd
    h = pd.util.hash_array(np.asarray(vals, dtype=object))
    return (h % np.uint64(num_partitions)).astype(np.int64)


def partitioned_groups(rows: ray.data.Dataset, keys: list[str],
                       num_partitions: int = 64):
    """groupby a hash PARTITION of integer key columns: all rows of one key
    land in one group, but the reducer runs once per partition instead of
    once per key (per-group map_groups dispatch was the measured cost of
    fine-grained groupbys at scale — reducers iterate key boundaries
    in-process with NumPy/pandas)."""
    def add_part(b: pa.Table) -> pa.Table:
        combo = b[keys[0]].to_numpy().astype(np.int64)
        with np.errstate(over="ignore"):
            for k in keys[1:]:
                combo = combo * np.int64(1_000_003) + \
                    b[k].to_numpy().astype(np.int64)
            part = ((combo * _KNUTH)
                    % np.int64(num_partitions)).astype(np.int32)
        return b.append_column("_part", pa.array(part))

    # batch_size=None = one UDF call per block: the hash is O(rows) numpy,
    # so per-call overhead (slice + append per 1024-row default batch)
    # would dominate it ~4x on large blocks
    return rows.map_batches(add_part, batch_format="pyarrow",
                            batch_size=None) \
        .groupby("_part")


def cogroup_join(left: ray.data.Dataset, right: ray.data.Dataset,
                 on: str, right_on: Optional[str] = None,
                 how: str = "inner",
                 num_partitions: Optional[int] = None,
                 input_bytes: Optional[int] = None,
                 suffix: str = "_r",
                 dedupe_right: bool = False) -> ray.data.Dataset:
    """Both-sides-large equi-join that cannot deadlock: hash-partition both
    sides on the key, union them with side tags, and merge per PARTITION
    (`groupby(_part).map_groups` = one vectorized pandas merge per
    partition — ``num_partitions`` Python calls total, not one per key).

    This is the engine's scale path for the keyed tile lookup
    (detail/mbtiles.cpp:160-197 generalized to two large sides): every row
    moves exactly once, partition count sizes the reducers, and a hot key
    is bounded by its partition (salt the key upstream if one key exceeds
    a partition — stages/skew.py).

    Constraints: the key must be integer- or string-typed and non-null
    (strings partition via the deterministic vectorized siphash and merge
    on the exact values — hash collisions only co-locate, never equate);
    ``how`` is 'inner' or 'left' (right columns must be null-tolerant
    types for 'left'). Name collisions on non-key right columns get
    ``suffix``.

    ``num_partitions`` defaults to the engine config's derivation
    (config.partitions_for_bytes): ~128 MB of exchanged data per
    partition when the caller passes ``input_bytes`` (both sides
    summed), else 2x cluster parallelism — the cluster switch that was a
    fixed 64 in round 3. See BASELINE.md for the partition-count
    sensitivity sweep.
    """
    if num_partitions is None:
        from ..config import partitions_for_bytes
        num_partitions = partitions_for_bytes(input_bytes)
    rk = right_on or on
    lsch, rsch = _arrow_schema(left), _arrow_schema(right)
    lcols, rcols = list(lsch.names), list(rsch.names)
    same_key = rk == on

    # output schema, fixed driver-side so every partition's merge result
    # casts to it (pandas round-trips would otherwise drift types on empty
    # or all-null groups)
    out_fields = [(c, lsch.field(c).type) for c in lcols]
    for c in rcols:
        if same_key and c == rk:
            continue
        name = c + suffix if c in lcols else c
        out_fields.append((name, rsch.field(c).type))
    out_schema = pa.schema(out_fields)
    out_names = [f[0] for f in out_fields]

    def tagger(side: int, key_col: str, cols: list[str], prefix: str,
               other_prefix: str, other_fields: list):
        def tag(b: pa.Table) -> pa.Table:
            kc = b[key_col]
            if pa.types.is_integer(kc.type):
                part = _part_of(kc.to_numpy().astype(np.int64),
                                num_partitions)
            elif pa.types.is_string(kc.type) or \
                    pa.types.is_large_string(kc.type):
                part = _part_of_str(kc.to_numpy(zero_copy_only=False),
                                    num_partitions)
            else:
                raise TypeError(
                    f"cogroup_join key {key_col!r} must be integer or "
                    f"string, got {kc.type}")
            arrays = [pa.array(part, pa.int32()),
                      pa.array(np.full(b.num_rows, side, dtype=np.int8))]
            names = ["_part", "_side"]
            for c in cols:
                arrays.append(b[c])
                names.append(prefix + c)
            for c, t in other_fields:
                arrays.append(pa.nulls(b.num_rows, type=t))
                names.append(other_prefix + c)
            return pa.table(dict(zip(names, arrays)))
        return tag

    lfields = [(c, lsch.field(c).type) for c in lcols]
    rfields = [(c, rsch.field(c).type) for c in rcols]
    # batch_size=None = one tag call per block: the tag is O(rows) numpy +
    # zero-copy column passthrough, so the default 1024-row slicing would
    # add ~1ms of Python per slice (70k slices at 72M rows, measured)
    lt = left.map_batches(tagger(0, on, lcols, "l__", "r__", rfields),
                          batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(tagger(1, rk, rcols, "r__", "l__", lfields),
                           batch_format="pyarrow", batch_size=None)

    def join_part(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        # split sides IN ARROW and merge IN ARROW (Acero hash join): the
        # former pandas merge forced a full columnar->object round-trip
        # per partition and was the measured superlinear term in the
        # partition-size sweep; it also upcast int64 keys to float64 via
        # the union's other-side nulls unless split first. use_threads
        # stays off so one reducer task costs one CPU, as scheduled.
        l = g.filter(pc.equal(g["_side"], 0)) \
            .select(["l__" + c for c in lcols]).rename_columns(lcols)
        r = g.filter(pc.equal(g["_side"], 1)) \
            .select(["r__" + c for c in rcols]).rename_columns(rcols)
        if dedupe_right and r.num_rows:
            # every copy of a key co-locates in this partition, so a
            # per-partition dedup IS a global dedup — this is how
            # bloom_semi_join avoids a whole pre-dedup exchange. Keeps
            # one arbitrary (first-in-partition) row per key: meant for
            # keys-only right sides (semi-join), where all copies are
            # identical and the choice cannot matter.
            kc = r[rk]
            if pa.types.is_integer(kc.type):
                kv = kc.to_numpy()
            else:
                kv = pc.dictionary_encode(
                    kc.combine_chunks() if isinstance(kc, pa.ChunkedArray)
                    else kc).indices.to_numpy()
            _, first = np.unique(kv, return_index=True)
            if len(first) < r.num_rows:
                r = r.take(pa.array(np.sort(first)))
        m = l.join(r, keys=[on], right_keys=[rk],
                   join_type="inner" if how == "inner" else "left outer",
                   right_suffix=suffix, coalesce_keys=same_key,
                   use_threads=False)
        return m.select(out_names).cast(out_schema)

    # Ray Data quirk outside this operator's control: empty partitions
    # emit SCHEMALESS empty blocks and Ray SKIPS map UDFs on empty
    # blocks entirely (verified), so an ALL-EMPTY result's to_pandas()
    # may render zero columns. Every non-empty result carries the
    # declared out_schema (join_part casts each block). A typed seed
    # block was tried and reverted: it fires a schema-mismatch warning
    # on every downstream execution and forces an eager ray.put at plan
    # construction.
    #
    # Coalesce the tagged union to O(cluster parallelism) blocks before
    # the exchange: the pull-based sort does n_map_blocks x n_reduce_blocks
    # object fetches, so block count following input FILE count is
    # quadratic poison — 512 tagged blocks measured 54s for the same join
    # that runs in ~13s from 64. (repartition(target_num_rows_per_block=)
    # was tried: it only SPLITS oversized blocks, never merges small ones,
    # so it left 512 blocks untouched.)
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 16))
    except Exception:
        ncpu = 16
    rows = lt.union(rt).repartition(max(16, 2 * ncpu))
    return rows.groupby("_part").map_groups(
        join_part, batch_format="pyarrow")


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset,
              key: str, time_col: str, *, tie_col: str,
              suffix: str = "_r",
              bucket_width: Optional[float] = None,
              payload_cols: Optional[list[str]] = None) -> ray.data.Dataset:
    """AS-OF join: each left row matches the latest right row with
    right.time <= left.time within the same key (inner: unmatched left rows
    drop). A custom operator Ray Data lacks; composed as
    union(schema-aligned tagged sides) -> groupby.map_groups(vectorized
    searchsorted). Left/right may have DIFFERENT schemas; output = left
    columns + right's time/tie columns suffixed + any ``payload_cols``
    (arbitrary-typed right columns, carried through BOTH the plain and the
    bucketed plan and suffixed likewise — the enrichment-join shape).

    Hot keys: with ``bucket_width`` set, rows group by (key, time bucket)
    instead of key alone, so one key's history splits across reducers.
    Correctness across bucket borders uses CARRY rows: per (key, bucket)
    the latest right row is reduced to a narrow summary, a per-key pass
    over the summaries injects the latest-earlier right row into every
    bucket the left side occupies, and the per-bucket match is then exact.
    Without ``bucket_width`` one key's history must fit one reducer.

    Ties on time resolve to the largest `tie_col` (deterministic).
    """
    lsch = _arrow_schema(left)
    rsch = _arrow_schema(right)
    lcols = list(lsch.names)
    rt_t, rk_t = rsch.field(time_col).type, rsch.field(tie_col).type
    RT, RK = "__rt", "__rk"        # right time/tie carried through the union
    pcols = list(payload_cols or [])
    ptypes = [rsch.field(c).type for c in pcols]
    PNAMES = [f"__rp_{c}" for c in pcols]

    def bucket_of(times: np.ndarray) -> np.ndarray:
        if bucket_width is None:
            return np.zeros(len(times), dtype=np.int64)
        return np.floor(times / bucket_width).astype(np.int64)

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in lcols}
        cols["_side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        cols["_bucket"] = pa.array(bucket_of(b[time_col].to_numpy()))
        cols[RT] = pa.nulls(b.num_rows, rt_t)
        cols[RK] = pa.nulls(b.num_rows, rk_t)
        for pn, pt in zip(PNAMES, ptypes):
            cols[pn] = pa.nulls(b.num_rows, pt)
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {}
        for c in lcols:
            cols[c] = b[c] if c == key else pa.nulls(b.num_rows,
                                                     lsch.field(c).type)
        cols["_side"] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        cols["_bucket"] = pa.array(bucket_of(b[time_col].to_numpy()))
        cols[RT] = b[time_col]
        cols[RK] = b[tie_col]
        for pn, pc_, pt in zip(PNAMES, pcols, ptypes):
            cols[pn] = b[pc_].cast(pt)
        return pa.table(cols)

    l = left.map_batches(tag_left, batch_format="pyarrow",
                         batch_size=None)
    r = right.map_batches(tag_right, batch_format="pyarrow",
                          batch_size=None)
    tagged = l.union(r)

    if bucket_width is not None:
        tagged = tagged.union(
            _asof_carry_rows(left, right, key, time_col, tie_col,
                             bucket_of, lsch, lcols, RT, RK, rt_t, rk_t,
                             pcols, PNAMES, ptypes))

    out_schema = pa.schema(
        [(c, lsch.field(c).type) for c in lcols]
        + [(time_col + suffix, rt_t), (tie_col + suffix, rk_t)]
        + [(c + suffix, t) for c, t in zip(pcols, ptypes)])

    # ARROW-native match: a pandas group view would upcast the int64
    # time/tie columns (they hold the union's cross-side nulls) to
    # float64, silently rounding values above 2^53 (epoch-nanosecond
    # timestamps, 64-bit hash ids) BEFORE any cast-back could help.
    # Filtering sides in Arrow first keeps every value exact.
    def match(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        lmask = pc.equal(g["_side"], 0)
        lg = g.filter(lmask)
        rg = g.filter(pc.invert(lmask))
        if lg.num_rows == 0 or rg.num_rows == 0:
            return out_schema.empty_table()
        rt = rg[RT].to_numpy(zero_copy_only=False)
        rk = rg[RK].to_numpy(zero_copy_only=False)
        order = np.lexsort((rk, rt))
        rts, rks = rt[order], rk[order]
        pos = np.searchsorted(rts, lg[time_col].to_numpy(),
                              side="right") - 1
        ok = pos >= 0
        sel = np.nonzero(ok)[0]
        out = lg.take(pa.array(sel, pa.int64())).select(lcols)
        out = out.append_column(time_col + suffix,
                                pa.array(rts[pos[sel]]).cast(rt_t))
        out = out.append_column(tie_col + suffix,
                                pa.array(rks[pos[sel]]).cast(rk_t))
        if PNAMES:
            # matched right rows by POSITION (Arrow take, no numpy round
            # trip — payloads keep their type, binary/list included)
            ridx = pa.array(order[pos[sel]], pa.int64())
            for pn, pc_, pt in zip(PNAMES, pcols, ptypes):
                out = out.append_column(pc_ + suffix,
                                        pc_take(rg[pn], ridx).cast(pt))
        return out

    def cast_out(b: pa.Table) -> pa.Table:
        if any(n not in b.column_names for n in out_schema.names):
            return out_schema.empty_table()
        return pa.table({n: b[n].cast(out_schema.field(n).type)
                         for n in out_schema.names})

    # coalesce the tagged union (2-3 sources x 64 blocks of narrow rows)
    # before the sort-based groupby — scheduling cost scales with blocks
    return tagged.repartition(16).groupby([key, "_bucket"]).map_groups(
        match, batch_format="pyarrow").map_batches(
        cast_out, batch_format="pyarrow", batch_size=None)


def _asof_carry_rows(left, right, key, time_col, tie_col, bucket_of,
                     lsch, lcols, RT, RK, rt_t, rk_t,
                     pcols=(), PNAMES=(), ptypes=()) -> ray.data.Dataset:
    """Narrow carry-row builder for the bucketed as-of join: per (key,
    bucket) reduce the rights to their latest (time, tie) row, then per key
    walk the bucket summaries and emit, for every bucket the LEFT side
    occupies, one synthetic right row holding the latest right from any
    earlier bucket. Everything here is key/time/tie columns only — no
    payload moves twice."""
    key_t = lsch.field(key).type

    # NaN markers would force RT/RK through float64 (rounding int64 times
    # above 2^53); instead carry an explicit _m marker column and keep
    # RT/RK in their declared Arrow types end-to-end, with typed zero
    # placeholders on marker rows.
    def _summary_empty() -> pa.Table:
        return pa.schema([(key, key_t), ("_bucket", pa.int64()),
                          (RT, rt_t), (RK, rk_t),
                          ("_m", pa.int8())]
                         + list(zip(PNAMES, ptypes))).empty_table()

    def right_summary(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _summary_empty()
        kv = b[key].to_numpy()
        bk = bucket_of(b[time_col].to_numpy())
        rt = b[time_col].to_numpy()
        rk = b[tie_col].to_numpy()
        # latest (rt, rk) per (key, bucket): lexsort + last-of-group
        order = np.lexsort((rk, rt, bk, kv))
        kv, bk, rt, rk = kv[order], bk[order], rt[order], rk[order]
        grp = (kv[1:] != kv[:-1]) | (bk[1:] != bk[:-1])
        last = np.concatenate((np.nonzero(grp)[0], [len(kv) - 1]))
        t = pa.table({
            key: pa.array(kv[last]).cast(key_t),
            "_bucket": pa.array(bk[last], pa.int64()),
            RT: pa.array(rt[last]).cast(rt_t),
            RK: pa.array(rk[last]).cast(rk_t),
            "_m": pa.array(np.zeros(len(last), dtype=np.int8))})
        # payload of the latest row, by POSITION (typed Arrow take)
        lidx = pa.array(order[last], pa.int64())
        for pn, pc_, pt in zip(PNAMES, pcols, ptypes):
            t = t.append_column(pn, pc_take(b[pc_], lidx).cast(pt))
        return t

    def left_buckets(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _summary_empty()
        kv = b[key].to_numpy()
        bk = bucket_of(b[time_col].to_numpy())
        order = np.lexsort((bk, kv))
        kv, bk = kv[order], bk[order]
        first = np.concatenate(
            ([True], (kv[1:] != kv[:-1]) | (bk[1:] != bk[:-1])))
        kv, bk = kv[first], bk[first]
        n = len(kv)
        t = pa.table({
            key: pa.array(kv).cast(key_t),
            "_bucket": pa.array(bk, pa.int64()),
            RT: pa.array(np.zeros(n, np.int64)).cast(rt_t),
            RK: pa.array(np.zeros(n, np.int64)).cast(rk_t),
            "_m": pa.array(np.ones(n, dtype=np.int8))})
        for pn, pt in zip(PNAMES, ptypes):
            t = t.append_column(pn, pa.nulls(n, pt))
        return t

    rsum = right.map_batches(right_summary, batch_format="pyarrow",
                             batch_size=None)
    lbuk = left.map_batches(left_buckets, batch_format="pyarrow",
                            batch_size=None)

    def carry(g: pa.Table) -> pa.Table:
        kv = g[key].to_numpy()
        bk = g["_bucket"].to_numpy()
        rt = g[RT].to_numpy(zero_copy_only=False)
        rk = g[RK].to_numpy(zero_copy_only=False)
        mk = g["_m"].to_numpy()
        # markers first within a bucket: a bucket's marker sees only
        # rights of strictly EARLIER buckets
        order = np.lexsort((-mk, bk, kv))
        out_k, out_b, out_t, out_tie, out_src = [], [], [], [], []
        best: tuple | None = None
        best_i = -1
        prev_key = None
        for i in order:
            if kv[i] != prev_key:
                prev_key = kv[i]
                best = None
            if mk[i]:
                if best is not None:
                    out_k.append(kv[i])
                    out_b.append(int(bk[i]))
                    out_t.append(best[0])
                    out_tie.append(best[1])
                    out_src.append(best_i)
            else:
                cand = (rt[i], rk[i])
                if best is None or cand >= best:
                    best = cand
                    best_i = int(i)
        t = pa.table({
            key: pa.array(out_k, key_t),
            "_bucket": pa.array(out_b, pa.int64()),
            RT: pa.array(out_t).cast(rt_t) if out_t
            else pa.nulls(0, rt_t),
            RK: pa.array(out_tie).cast(rk_t) if out_tie
            else pa.nulls(0, rk_t)})
        sidx = pa.array(out_src, pa.int64())
        for pn, pt in zip(PNAMES, ptypes):
            t = t.append_column(pn, pc_take(g[pn], sidx).cast(pt))
        return t

    # groupby(key) keeps non-integer keys working; carry() itself walks
    # multiple keys per group, so a partition-level groupby would also do
    carries = rsum.union(lbuk).groupby(key).map_groups(
        carry, batch_format="pyarrow")

    def expand(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {}
        for c in lcols:
            cols[c] = b[c] if c == key else pa.nulls(n, lsch.field(c).type)
        cols["_side"] = pa.array(np.ones(n, dtype=np.int8))
        cols["_bucket"] = b["_bucket"].cast(pa.int64())
        cols[RT] = b[RT].cast(rt_t)
        cols[RK] = b[RK].cast(rk_t)
        for pn, pt in zip(PNAMES, ptypes):
            cols[pn] = b[pn].cast(pt)
        return pa.table(cols)

    return carries.map_batches(expand, batch_format="pyarrow",
                               batch_size=None)


def range_join(points: ray.data.Dataset, intervals,
               value_col: str, lo_col: str, hi_col: str,
               bucket_width: float) -> ray.data.Dataset:
    """RANGE join: point row x interval row where lo <= value < hi.

    The interval side (small) is bucketed by `bucket_width` on the driver:
    each interval lands in every bucket it overlaps, and the bucket table is
    broadcast once via ray.put. Point batches compute their bucket and
    refine the containment vectorized — the 1-D version of the PIP
    cell-prefilter (quad constraint, mask.cpp:229-233).

    PARTITIONING ASSUMPTION: the interval side fits in one broadcast object
    (typical dimension-table case). For two large sides, flat_map BOTH to
    bucket keys and use a shuffle join on the bucket instead.

    `intervals` is a pandas DataFrame with lo_col/hi_col (+payload cols).
    Output = point columns + the matched interval's columns.
    """
    import collections

    import numpy as np
    import pandas as pd

    buckets: dict[int, list[int]] = collections.defaultdict(list)
    lo = intervals[lo_col].to_numpy()
    hi = intervals[hi_col].to_numpy()
    for i in range(len(intervals)):
        b0 = int(np.floor(lo[i] / bucket_width))
        b1 = int(np.ceil(hi[i] / bucket_width))
        for b in range(b0, max(b1, b0 + 1)):
            buckets[b].append(i)
    # the broadcast carries the interval table as ARROW so the probe's
    # fan-out is two zero-copy takes, not a pandas round-trip per batch
    iv_tab = pa.Table.from_pandas(intervals, preserve_index=False)
    overlap = set(_arrow_schema(points).names) & set(iv_tab.column_names)
    if overlap:
        # the probe assembles output as {point cols} | {interval cols};
        # a shared name would silently REPLACE point values with
        # interval values — refuse instead
        raise ValueError(
            f"range_join: column name(s) {sorted(overlap)} exist on both "
            "sides; rename the interval columns before joining")
    ref = ray.put((dict(buckets), iv_tab, lo, hi))

    def probe(batch: pa.Table) -> pa.Table:
        bks, iv, ilo, ihi = ray.get(ref)
        v = batch[value_col].to_numpy()
        pb = np.floor(v / bucket_width).astype(np.int64)
        # candidate intervals = union over buckets present in this batch;
        # then one vectorized containment mask per candidate interval
        cand = sorted({i for b in np.unique(pb) for i in bks.get(int(b), ())})
        out_p: list[np.ndarray] = []
        out_i: list[np.ndarray] = []
        for i in cand:
            m = (v >= ilo[i]) & (v < ihi[i])
            if m.any():
                idx = np.nonzero(m)[0]
                out_p.append(idx)
                out_i.append(np.full(len(idx), i, dtype=np.int64))
        empty = np.array([], dtype=np.int64)
        pi = np.concatenate(out_p) if out_p else empty
        ii = np.concatenate(out_i) if out_i else empty
        left = batch.take(pa.array(pi))
        right = iv.take(pa.array(ii))
        cols = dict(zip(left.column_names, left.columns))
        cols.update(zip(right.column_names, right.columns))
        return pa.table(cols)

    return points.map_batches(probe, batch_format="pyarrow",
                              batch_size=None)


def broadcast_semi_join(left: ray.data.Dataset, keys, left_on: str,
                        *, anti: bool = False) -> ray.data.Dataset:
    """Semi-join (membership filter) / anti-join (blocklist filter)
    against a broadcast key set: the classic training-data ops "keep rows
    matching an allowlist" and "drop rows hitting a blocklist".

    ``keys`` (1-D integer array-like) is deduped + sorted ONCE on the
    driver and shipped via ``ray.put``; every map task probes it with one
    vectorized searchsorted per block. No shuffle, no row movement —
    right for key sets that fit in worker memory (x one object-store copy
    per node at cluster scale). For a both-sides-large semi-join, project
    the key side to its key column and use ``cogroup_join`` instead."""
    ks = np.unique(np.asarray(keys, dtype=np.int64))
    ref = ray.put(ks)

    def fil(b: pa.Table) -> pa.Table:
        s = ray.get(ref)
        v = b[left_on].to_numpy().astype(np.int64)
        if len(s) == 0:
            hit = np.zeros(len(v), dtype=bool)
        else:
            pos = np.searchsorted(s, v)
            pos_c = np.minimum(pos, len(s) - 1)
            hit = s[pos_c] == v
        return b.filter(pa.array(hit ^ anti))

    return left.map_batches(fil, batch_format="pyarrow", batch_size=None)


def _bloom_positions(keys: np.ndarray, m_bits: int, n_hashes: int):
    """k double-hash probe positions per key (Kirsch–Mitzenmacher:
    pos_i = h1 + i*h2 mod m), vectorized. Both hash lanes are
    multiplicative mixes of the int64 key — deterministic everywhere."""
    with np.errstate(over="ignore"):
        x = keys.astype(np.uint64)
        h1 = (x * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        h2 = ((x ^ (x >> np.uint64(31))) * np.uint64(0xC2B2AE3D27D4EB4F)) \
            >> np.uint64(29) | np.uint64(1)
    m = np.uint64(m_bits)
    return [((h1 + np.uint64(i) * h2) % m).astype(np.int64)
            for i in range(n_hashes)]


def bloom_semi_join(left: ray.data.Dataset, right: ray.data.Dataset,
                    on: str, right_on: str | None = None, *,
                    m_bits: int = 1 << 23, n_hashes: int = 4,
                    num_partitions: int | None = None) -> ray.data.Dataset:
    """Both-sides-large semi-join through a Bloom prefilter + exact
    verify — the scale path when the right side's key set is too big to
    broadcast exactly but a bitmap of it is not (m_bits=2^23 = 1 MiB).

    Phase 1 builds the filter DISTRIBUTED: each right block sets its
    keys' bits in a local bitmap; the partial bitmaps OR together in a
    tree (``ray.put`` ships only bitmaps, never keys). Phase 2 drops
    every left row the filter rejects — definitely absent (no false
    negatives). Phase 3 routes ONLY the surviving rows (true matches +
    the filter's false-positive fraction, ~ (1-e^{-kn/m})^k) through the
    exact cogroup semi-join, so the RESULT is exact; the bloom only
    shrinks the exchange. Output == ``cogroup_join(left, distinct right
    keys)`` row-for-row.
    """
    rk = right_on or on
    import ray as _ray

    def uniq_keys(b: pa.Table) -> pa.Table:
        return pa.table({rk: pa.array(np.unique(
            b[rk].to_numpy().astype(np.int64)))})

    # ONE scan of the (potentially wide) right side: project each block to
    # its distinct keys and materialize the narrow int64 stream; BOTH the
    # bitmap funnel and the exact verify's distinct-key side derive from
    # it, so the right input is read once (it used to be scanned twice).
    rkeys = right.map_batches(uniq_keys, batch_format="pyarrow",
                              batch_size=None).materialize()

    def partial_bitmap(b: pa.Table) -> pa.Table:
        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        keys = np.unique(b[rk].to_numpy().astype(np.int64))
        for pos in _bloom_positions(keys, m_bits, n_hashes):
            # bitwise_or.at, NOT fancy-index |=: the latter buffers
            # duplicate byte indices and keeps only ONE key's bit when
            # two keys land in the same byte — a bloom FALSE NEGATIVE
            # that silently deletes matching rows
            np.bitwise_or.at(bm, pos >> 3,
                             (1 << (pos & 7)).astype(np.uint8))
        return pa.table({"bm": pa.array([bm.tobytes()],
                                        pa.large_binary())})

    def or_bitmaps(b: pa.Table) -> pa.Table:
        out = np.zeros(m_bits // 8, dtype=np.uint8)
        for blob in b["bm"].to_pylist():
            np.bitwise_or(out, np.frombuffer(blob, dtype=np.uint8),
                          out=out)
        return pa.table({"bm": pa.array([out.tobytes()],
                                        pa.large_binary())})

    # per-BLOCK bitmaps OR-reduce through a two-level funnel (64-way
    # fan-in, then 1): bitmaps are m_bits/8 bytes each, so the last task
    # sees at most 64 of them no matter how many input blocks exist; the
    # driver receives only the final one. Blocks never move.
    final = rkeys.map_batches(partial_bitmap, batch_format="pyarrow",
                              batch_size=None) \
        .repartition(64) \
        .map_batches(or_bitmaps, batch_format="pyarrow",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(or_bitmaps, batch_format="pyarrow",
                     batch_size=None).take_all()
    if not final:
        # empty right side (or all blocks emptied upstream): Ray skips
        # map UDFs on empty blocks, so the funnel yields nothing — and a
        # semi-join against an empty right keeps nothing. Return an empty
        # dataset with the cogroup output schema instead of crashing.
        lsch = _arrow_schema(left)
        fields = [(c, lsch.field(c).type) for c in lsch.names]
        if rk != on:
            name = rk + "_r" if rk in lsch.names else rk
            fields.append((name, pa.int64()))
        return ray.data.from_arrow(pa.table(
            {n: pa.array([], t) for n, t in fields}))
    bref = _ray.put(np.frombuffer(final[0]["bm"], dtype=np.uint8))

    def prefilter(b: pa.Table) -> pa.Table:
        bm = _ray.get(bref)
        v = b[on].to_numpy().astype(np.int64)
        hit = np.ones(len(v), dtype=bool)
        for pos in _bloom_positions(v, m_bits, n_hashes):
            hit &= (bm[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return b.filter(pa.array(hit))

    survivors = left.map_batches(prefilter, batch_format="pyarrow",
                                 batch_size=None)

    # exact verify on the (small) surviving stream: the per-block-unique
    # key stream goes STRAIGHT into the cogroup, which dedupes per
    # partition inside the reducer (the exchange partitions by the key,
    # so per-partition dedup is globally exact) — one exchange instead of
    # a pre-dedup exchange plus the join's. Distinctness matters: a
    # duplicated right key would duplicate left rows in the inner merge.
    return cogroup_join(survivors, rkeys, on=on, right_on=rk,
                        how="inner", num_partitions=num_partitions,
                        dedupe_right=True)
