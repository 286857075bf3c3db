"""Salted-aggregation query (SQL-checked).

Demonstrates the skew path on a worst-case key: `l_returnflag` has ~3
distinct values, so an unsalted groupby funnels the whole table through 3
groups; the salted two-phase plan bounds every group to ~|key|/n_salts rows
and reduces tiny partials. The DuckDB twin is the plain GROUP BY — identical
results prove the decomposition."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from ..stages.skew import salted_map_groups


def q_salted_agg(sf_dir: str) -> ray.data.Dataset:
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_returnflag": [g["l_returnflag"].iloc[0]],
            "sum_qty_c": [int(np.round(g["l_quantity"].to_numpy() * 100)
                              .astype(np.int64).sum())],
            "sum_price_c": [int(np.round(g["l_extendedprice"].to_numpy() * 100)
                                .astype(np.int64).sum())],
            "n": [np.int64(len(g))],
        })

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_returnflag": [g["l_returnflag"].iloc[0]],
            "sum_qty_c": [np.int64(g["sum_qty_c"].sum())],
            "sum_price_c": [np.int64(g["sum_price_c"].sum())],
            "n": [np.int64(g["n"].sum())],
        })

    # hot_threshold low so the salting path actually engages at small sf
    return salted_map_groups(li, "l_returnflag", partial, combine,
                             n_salts=16, hot_threshold=1000)


SQL_SALTED_AGG = """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS sum_qty_c,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_c,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""
