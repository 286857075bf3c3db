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
    """Both-sides-large hash join (all-to-all exchange)."""
    return left.join(right, join_type=how, num_partitions=num_partitions,
                     on=on, right_on=right_on)
