"""Data-mixing ops for training pipelines: deterministic weighted source
interleaving and stratified sampling.

No counterpart exists in the reference; these are the engine-side
additions between "a deduplicated corpus" and "a training token stream":
LLM training mixes sources at explicit weights (papers publish the
mixture table), and ablation runs need per-stratum down/up-sampling that
is reproducible run-to-run — so both ops are hash-deterministic, no RNG.

- ``distributed_rank``: the shared primitive — each row's 0-based rank
  inside its partition key, ordered by an int64 order column, computed as
  a two-pass prefix sum (range-bucket the order key, count per
  (part, range) group, driver-prefix the bounded count table, per-group
  local ranks). Same discipline as stages/pack.py; the driver table is
  O(n_parts * n_range_buckets) regardless of corpus size.

- ``interleave_schedule``: weighted round-robin by virtual time — source
  s with weight w emits its r-th document at position (2r+1)/(2w), the
  standard stride-scheduling / WFQ virtual-finish-time rule, scaled to
  exact integers so the global order is total and SQL-reproducible.

- ``stratified_sample``: keep a row iff a multiplicative hash of its id
  lands under the stratum's per-mille rate. One vectorized filter map, no
  shuffle; the hash (Knuth 2654435761 mod 2^32) is closed-form in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def distributed_rank(ds: ray.data.Dataset, *, part_col: str,
                     order_col: str,
                     n_range_buckets: int | None = None,
                     out_col: str = "rank") -> ray.data.Dataset:
    """Append `out_col`: the row's 0-based rank within its `part_col`
    group in ascending `order_col` order (which must be int64-like and
    unique per row for a total order)."""
    from ray.data.aggregate import Count

    if n_range_buckets is None:
        from ..config import cluster_parallelism
        n_range_buckets = max(64, 8 * cluster_parallelism())
    max_order = ds.max(order_col)
    if max_order is None:   # empty input: rank of nothing is nothing.
        # Build the empty result EXPLICITLY (schema + out_col): Ray skips
        # map UDFs on empty blocks, so an append_column map would return
        # an empty dataset WITHOUT the rank column and downstream
        # sort/select on out_col would still crash (the pack_sequences
        # empty-path pattern).
        sch = ds.schema()
        fields = list(zip(sch.names, sch.types)) + [(out_col, pa.int64())]
        return ray.data.from_arrow(pa.table(
            {n: pa.array([], type=t) for n, t in fields}))
    width = max(1, (int(max_order) + n_range_buckets) // n_range_buckets)

    def add_rb(b: pa.Table) -> pa.Table:
        o = b[order_col].to_numpy().astype(np.int64)
        return b.append_column("_rb", pa.array(o // width))

    keyed = ds.map_batches(add_rb, batch_format="pyarrow",
                           batch_size=None).materialize()

    counts = keyed.groupby([part_col, "_rb"]) \
        .aggregate(Count(alias_name="n")).to_pandas() \
        .sort_values([part_col, "_rb"])
    bases: dict[tuple, int] = {}
    run: dict = {}
    for part, rb, n in counts.itertuples(index=False):
        bases[(part, int(rb))] = run.get(part, 0)
        run[part] = run.get(part, 0) + int(n)
    bref = ray.put(bases)

    def finish(g: pa.Table) -> pa.Table:
        base = ray.get(bref)[(g[part_col][0].as_py(),
                              int(g["_rb"][0].as_py()))]
        order = np.argsort(g[order_col].to_numpy(), kind="stable")
        rank = np.empty(g.num_rows, dtype=np.int64)
        rank[order] = base + np.arange(g.num_rows, dtype=np.int64)
        return g.drop_columns(["_rb"]).append_column(out_col,
                                                     pa.array(rank))

    return keyed.groupby([part_col, "_rb"]).map_groups(
        finish, batch_format="pyarrow")


def interleave_schedule(ds: ray.data.Dataset, *, part_col: str,
                        order_col: str,
                        weight_of,
                        weight_lcm: int,
                        n_range_buckets: int | None = None
                        ) -> ray.data.Dataset:
    """Append `vpos`: the row's exact-integer virtual position in the
    weighted interleave of its partitions. Source s (weight w) emits its
    r-th row at virtual time (2r+1)/(2w); `vpos` = (2r+1) * (lcm/w), so
    integer order == rational order as long as every weight divides
    `weight_lcm`. Consumers sort by (vpos, part, order) — a total,
    deterministic order — and stream the head.

    `weight_of(part_values: list) -> np.ndarray[int64]` must be a pure
    vectorizable function (it runs inside map_batches on every block).
    """
    ranked = distributed_rank(ds, part_col=part_col, order_col=order_col,
                              n_range_buckets=n_range_buckets)

    def add_vpos(b: pa.Table) -> pa.Table:
        w = np.asarray(weight_of(b[part_col].to_pylist()), dtype=np.int64)
        if ((weight_lcm % w) != 0).any():
            raise ValueError("every weight must divide weight_lcm")
        r = b["rank"].to_numpy().astype(np.int64)
        return b.append_column(
            "vpos", pa.array((2 * r + 1) * (weight_lcm // w)))

    return ranked.map_batches(add_vpos, batch_format="pyarrow",
                              batch_size=None)


def stratified_sample(ds: ray.data.Dataset, *, stratum_col: str,
                      id_col: str, rates_permille: dict,
                      default_permille: int = 0) -> ray.data.Dataset:
    """Keep a row iff hash(id) % 1000 < rate(stratum). The hash is the
    Knuth multiplicative step (id * 2654435761 mod 2^32): deterministic,
    uncorrelated with id ranges, and exactly reproducible in SQL. Strata
    absent from `rates_permille` default to `default_permille` (0 =
    drop). One streaming filter map — no shuffle, no driver state."""
    rref = ray.put(dict(rates_permille))

    def filt(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        rates = ray.get(rref)
        ids = b[id_col].to_numpy().astype(np.int64)
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32) % np.uint64(1000)
        # rate lookup once per DISTINCT stratum, fanned out by the
        # dictionary indices (strata are few, rows are many); a NULL
        # stratum samples at the default rate (index -1 -> appended
        # default slot), matching the old per-row rates.get(None, ...)
        enc = pc.dictionary_encode(b[stratum_col].combine_chunks()
                                   if isinstance(b[stratum_col],
                                                 pa.ChunkedArray)
                                   else b[stratum_col])
        per = np.fromiter((rates.get(s, default_permille)
                           for s in enc.dictionary.to_pylist()),
                          dtype=np.int64, count=len(enc.dictionary))
        per = np.append(per, np.int64(default_permille))
        idx = enc.indices.fill_null(-1).to_numpy().astype(np.int64)
        return b.filter(pa.array(h.astype(np.int64) < per[idx]))

    return ds.map_batches(filt, batch_format="pyarrow", batch_size=None)


def epoch_shuffle(ds: ray.data.Dataset, *, id_col: str,
                  epoch: int) -> ray.data.Dataset:
    """Deterministic per-epoch global shuffle: sort by a seeded
    multiplicative hash of the id — the reshuffle-each-epoch discipline
    of a training data loader made reproducible across runs, engines and
    resume points (an RNG shuffle is not). Ray's range-partitioned sort
    is the distributed exchange; the 8-byte hash column is the only
    added payload. hash = (id * (2654435761 * (2*epoch+1) mod 2^32))
    mod 2^32 — the epoch SCALES the multiplier (odd x odd stays odd, so
    the map remains a bijection mod 2^32, and the per-epoch multipliers
    are far apart, so orders genuinely differ; an additive seed — or a
    small additive multiplier perturbation — would preserve the order of
    any small id set almost everywhere). Closed-form in SQL; the
    (shuffle_key, id) composite sort key keeps the order total under
    hash collisions."""
    mult = np.uint64((2654435761 * (2 * epoch + 1)) % (1 << 32))

    def add_hash(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.uint64)
        h = (ids * mult) % np.uint64(1 << 32)
        return b.append_column("shuffle_key", pa.array(h.astype(np.int64)))

    return ds.map_batches(add_hash, batch_format="pyarrow",
                          batch_size=None).sort(["shuffle_key", id_col])


def quantile_cut(ds: ray.data.Dataset, *, stratum_col: str,
                 value_col: str, q: float = 0.5,
                 keep: str = "ge") -> ray.data.Dataset:
    """Adaptive threshold filter: keep rows whose `value_col` clears
    their stratum's exact discrete q-quantile — the two-phase corpus-
    adaptive cut ("drop the bottom half by length, per language") that a
    fixed threshold can't express.

    Phase 1 aggregates (stratum, value) COUNTS — bounded by the number
    of distinct values per stratum, not by rows (for continuous values,
    quantize first; this engine's quality signals are all integer by
    design). The driver computes sorted[floor(q*(n-1))] per stratum
    (DuckDB quantile_disc semantics, pinned numerically) from the count
    table and broadcasts the tiny threshold map; phase 2 is one
    streaming filter. Appends `threshold` so the verdict is auditable.
    """
    from ray.data.aggregate import Count

    counts = ds.groupby([stratum_col, value_col]) \
        .aggregate(Count(alias_name="n")).to_pandas() \
        .sort_values([stratum_col, value_col])
    thresholds: dict = {}
    for s, g in counts.groupby(stratum_col):
        n = int(g["n"].sum())
        pos = int(np.floor(q * (n - 1)))
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        thresholds[s] = g[value_col].to_numpy()[
            int(np.searchsorted(cum, pos + 1))]
    tref = ray.put(thresholds)

    def filt(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        thr = ray.get(tref)
        vals = b[value_col].to_numpy()
        enc = pc.dictionary_encode(b[stratum_col].combine_chunks()
                                   if isinstance(b[stratum_col],
                                                 pa.ChunkedArray)
                                   else b[stratum_col])
        if enc.indices.null_count:
            # phase 1's groupby drops null strata, so no threshold
            # exists for them — fail loudly, never look up a wrong slot
            raise ValueError("quantile_cut: null stratum value has no "
                             "computed threshold; filter or fill nulls "
                             "upstream")
        per = np.fromiter((thr[s] for s in enc.dictionary.to_pylist()),
                          dtype=np.int64, count=len(enc.dictionary))
        t = per[enc.indices.to_numpy().astype(np.int64)] \
            if len(per) else np.empty(0, np.int64)
        mask = vals >= t if keep == "ge" else vals <= t
        return b.append_column("threshold", pa.array(t)) \
                .filter(pa.array(mask))

    return ds.map_batches(filt, batch_format="pyarrow", batch_size=None)
