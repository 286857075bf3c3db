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


def broadcast_join(left: ray.data.Dataset, small_df: pd.DataFrame,
                   left_on: str, right_on: str,
                   how: str = "inner") -> ray.data.Dataset:
    """Hash-join `left` (a Dataset) against a small pandas side, broadcast
    once via ray.put and merged per batch inside map_batches."""
    ref = ray.put(small_df)

    def merge(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        df = batch.to_pandas()
        m = df.merge(s, left_on=left_on, right_on=right_on, how=how)
        return pa.Table.from_pandas(m, preserve_index=False)

    return left.map_batches(merge, batch_format="pyarrow")


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


_KNUTH = np.int64(2654435761)


def _part_of(key: np.ndarray, num_partitions: int) -> np.ndarray:
    """Deterministic partition of an int64 key (multiplicative hash;
    numpy wraparound is part of the function). Non-negative."""
    with np.errstate(over="ignore"):
        return (key.astype(np.int64) * _KNUTH) % np.int64(num_partitions)


def cogroup_join(left: ray.data.Dataset, right: ray.data.Dataset,
                 on: str, right_on: Optional[str] = None,
                 how: str = "inner", num_partitions: int = 64,
                 suffix: str = "_r") -> ray.data.Dataset:
    """Both-sides-large equi-join that cannot deadlock: hash-partition both
    sides on the key, union them with side tags, and merge per PARTITION
    (`groupby(_part).map_groups` = one vectorized pandas merge per
    partition — ``num_partitions`` Python calls total, not one per key).

    This is the engine's scale path for the keyed tile lookup
    (detail/mbtiles.cpp:160-197 generalized to two large sides): every row
    moves exactly once, partition count sizes the reducers, and a hot key
    is bounded by its partition (salt the key upstream if one key exceeds
    a partition — stages/skew.py).

    Constraints: the key must be integer-valued and non-null; ``how`` is
    'inner' or 'left' (right columns must be null-tolerant types for
    'left'). Name collisions on non-key right columns get ``suffix``.
    """
    def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
        base = ds.schema().base_schema
        if isinstance(base, pa.Schema):
            return base
        # pandas-block datasets expose numpy dtypes; map them over
        fields = []
        for name, t in zip(base.names, base.types):
            try:
                fields.append((name, pa.from_numpy_dtype(t)))
            except (pa.ArrowNotImplementedError, TypeError):
                fields.append((name, pa.string()))
        return pa.schema(fields)

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
            key = b[key_col].to_numpy().astype(np.int64)
            arrays = [pa.array(_part_of(key, num_partitions), pa.int32()),
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
    lt = left.map_batches(tagger(0, on, lcols, "l__", "r__", rfields),
                          batch_format="pyarrow")
    rt = right.map_batches(tagger(1, rk, rcols, "r__", "l__", lfields),
                           batch_format="pyarrow")

    def join_part(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        # split sides IN ARROW before pandas: converting the union with its
        # other-side nulls would upcast int64 keys to float64 and corrupt
        # keys above 2^53
        l = g.filter(pc.equal(g["_side"], 0)) \
            .select(["l__" + c for c in lcols]) \
            .rename_columns(lcols).to_pandas()
        r = g.filter(pc.equal(g["_side"], 1)) \
            .select(["r__" + c for c in rcols]) \
            .rename_columns(rcols).to_pandas()
        if same_key:
            m = l.merge(r, on=on, how=how, suffixes=("", suffix))
        else:
            m = l.merge(r, left_on=on, right_on=rk, how=how,
                        suffixes=("", suffix))
        m = m[out_names]
        return pa.Table.from_pandas(m, schema=out_schema,
                                    preserve_index=False)

    return lt.union(rt).groupby("_part").map_groups(
        join_part, batch_format="pyarrow")


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset,
              key: str, time_col: str, *, tie_col: str,
              suffix: str = "_r") -> ray.data.Dataset:
    """AS-OF join: each left row matches the latest right row with
    right.time <= left.time within the same key (inner: unmatched left rows
    drop). A custom operator Ray Data lacks; composed as
    union(tagged sides) -> groupby(key).map_groups(vectorized searchsorted).

    PARTITIONING ASSUMPTION: one key's full history must fit one reducer
    (the match needs the whole right-side timeline of that key). For keys
    too hot for that, pre-split by coarse time bucket and carry the last
    right row of bucket i into bucket i+1 — not needed at current scales.

    Ties on time resolve to the largest `tie_col` (deterministic).
    Output = left columns + right's time/tie columns suffixed.
    """
    import numpy as np
    import pandas as pd

    lcols = left.schema().names
    l = left.map_batches(
        lambda b: b.append_column("_side", pa.array([0] * b.num_rows,
                                                    pa.int8())),
        batch_format="pyarrow")
    r = right.map_batches(
        lambda b: b.append_column("_side", pa.array([1] * b.num_rows,
                                                    pa.int8())),
        batch_format="pyarrow")

    def match(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0]
        rg = g[g["_side"] == 1].sort_values([time_col, tie_col],
                                           kind="stable")
        if lg.empty or rg.empty:
            cols = {c: pd.Series([], dtype=g[c].dtype) for c in lcols}
            cols[time_col + suffix] = pd.Series([], dtype=g[time_col].dtype)
            cols[tie_col + suffix] = pd.Series([], dtype=g[tie_col].dtype)
            return pd.DataFrame(cols)
        rt = rg[time_col].to_numpy()
        pos = np.searchsorted(rt, lg[time_col].to_numpy(), side="right") - 1
        ok = pos >= 0
        out = lg.loc[ok, lcols].reset_index(drop=True)
        out[time_col + suffix] = rg[time_col].to_numpy()[pos[ok]]
        out[tie_col + suffix] = rg[tie_col].to_numpy()[pos[ok]]
        return out

    return l.union(r).groupby(key).map_groups(match, batch_format="pandas")


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
    ref = ray.put((dict(buckets), intervals))

    def probe(batch: pa.Table) -> pa.Table:
        bks, iv = ray.get(ref)
        df = batch.to_pandas()
        v = df[value_col].to_numpy()
        pb = np.floor(v / bucket_width).astype(np.int64)
        ilo = iv[lo_col].to_numpy()
        ihi = iv[hi_col].to_numpy()
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
        if not out_p:
            return pa.Table.from_pandas(
                pd.concat([df.iloc[:0].reset_index(drop=True),
                           iv.iloc[:0].reset_index(drop=True)], axis=1),
                preserve_index=False)
        pi = np.concatenate(out_p)
        ii = np.concatenate(out_i)
        left = df.iloc[pi].reset_index(drop=True)
        right = iv.iloc[ii].reset_index(drop=True)
        return pa.Table.from_pandas(pd.concat([left, right], axis=1),
                                    preserve_index=False)

    return points.map_batches(probe, batch_format="pyarrow")
