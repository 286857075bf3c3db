"""Skew handling: salted two-phase aggregation with partition-size accounting.

The reference has a uniform tile grid and no shuffles, so no skew handling
exists there (SURVEY §4); at 100 TB scale the north rule requires dense-cell
skew to be handled by salted repartitioning with explicit partition-size
accounting. Pattern:

    phase 0 (accounting): count rows per key over the KEY COLUMN ONLY —
        a column-pruned pre-pass whose result is tiny and broadcast;
    phase 1: rows of hot keys get salt = row_hash % n_salts, cold keys
        salt 0; `groupby([key, salt]).map_groups(partial)` bounds every
        group to ~|hot key| / n_salts rows;
    phase 2: `groupby(key).map_groups(combine)` over the (few) partials.

`partial` and `combine` must form an associative decomposition of the full
aggregate (e.g. (sum, count) partials for mean; (acc, wacc) for the blend
A1 kernel). Cold keys take the exact same path with one salt, so
correctness is uniform.
"""

from __future__ import annotations

import sys
from functools import partial as _partial
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

# size accounting goes to stderr: stdout is reserved for result contracts
# (bench.py prints exactly one JSON line)
_log_stderr = _partial(print, file=sys.stderr)


def partition_sizes(ds: ray.data.Dataset, key: str) -> pd.DataFrame:
    """Per-key row counts (the explicit partition-size accounting).

    Column-pruned: only `key` is shuffled, and batches pre-aggregate to
    per-batch counts before the groupby, so the exchange carries one row
    per (batch, key) — not per input row."""

    def batch_counts(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vc = pc.value_counts(b[key])
        return pa.table({key: vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    from ray.data.aggregate import Sum
    out = (ds.select_columns([key])
             .map_batches(batch_counts, batch_format="pyarrow")
             .groupby(key).aggregate(Sum("n", alias_name="n")))
    return out.to_pandas()


def salted_map_groups(
    ds: ray.data.Dataset,
    key: str,
    partial: Callable[[pd.DataFrame], pd.DataFrame],
    combine: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    n_salts: int = 16,
    hot_threshold: int = 100_000,
    sizes: pd.DataFrame | None = None,
    log: Callable[[str], None] = _log_stderr,
) -> ray.data.Dataset:
    """Two-phase salted groupby. `partial` maps one (key, salt) group of raw
    rows to partial-aggregate rows (must include `key`); `combine` reduces
    all partials of one key to the final row(s).

    `sizes`: pass a precomputed `partition_sizes` frame to skip phase 0.
    Keys with count > hot_threshold are salted across `n_salts` groups.
    """
    if sizes is None:
        sizes = partition_sizes(ds, key)
    hot = set(sizes.loc[sizes["n"] > hot_threshold, key])
    total = int(sizes["n"].sum())
    log(f"[skew] {len(sizes)} keys, {total} rows; "
        f"{len(hot)} hot (> {hot_threshold}): "
        f"{sorted(list(hot))[:8]}{'...' if len(hot) > 8 else ''}; "
        f"max group {int(sizes['n'].max()) if len(sizes) else 0} -> "
        f"~{int(sizes['n'].max() / n_salts) if len(hot) else int(sizes['n'].max()) if len(sizes) else 0} after salting")
    hot_ref = ray.put(hot)

    def add_salt(b: pa.Table) -> pa.Table:
        hot_keys = ray.get(hot_ref)
        ks = b[key].to_pylist()
        idx = np.arange(b.num_rows, dtype=np.int64)
        # deterministic per-row salt: stable under retries (row content
        # independent ordering not required — salt only balances size)
        salt = np.where(
            np.fromiter((k in hot_keys for k in ks), dtype=bool,
                        count=b.num_rows),
            idx % n_salts, 0).astype(np.int32)
        return b.append_column("_salt", pa.array(salt))

    salted = ds.map_batches(add_salt, batch_format="pyarrow")

    def partial_drop_salt(g: pd.DataFrame) -> pd.DataFrame:
        return partial(g.drop(columns=["_salt"]))

    partials = salted.groupby([key, "_salt"]).map_groups(
        partial_drop_salt, batch_format="pandas")
    return partials.groupby(key).map_groups(combine, batch_format="pandas")
