"""Engine execution-config knobs (the multi-node cluster switch)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gdal_drivers_ray import config as C


def test_partitions_for_bytes_sizing():
    par = C.cluster_parallelism()
    floor = max(min(max(2 * par, C.MIN_PARTITIONS), C.MAX_PARTITIONS), 1)
    # unknown size -> parallelism floor
    assert C.partitions_for_bytes(None) == floor
    # small input never drops below the floor
    assert C.partitions_for_bytes(1 << 20) == floor
    # big input: ~128 MB per partition
    big = 1 << 40  # 1 TiB
    p = C.partitions_for_bytes(big)
    assert p == min(-(-big // C.TARGET_PARTITION_BYTES), C.MAX_PARTITIONS)
    # cap holds
    assert C.partitions_for_bytes(1 << 50) == C.MAX_PARTITIONS


def test_path_bytes(tmp_path):
    f = tmp_path / "x.parquet"
    pq.write_table(pa.table({"a": np.arange(10)}), f)
    n = C.path_bytes(str(f))
    assert n and n > 0
    # directory: sum of files
    d = tmp_path / "d"
    d.mkdir()
    pq.write_table(pa.table({"a": np.arange(10)}), d / "p1.parquet")
    pq.write_table(pa.table({"a": np.arange(10)}), d / "p2.parquet")
    nd = C.path_bytes(str(d))
    assert nd and nd > n
    assert C.path_bytes(str(tmp_path / "missing")) is None


def test_push_based_shuffle_toggle():
    prev = C.set_push_based_shuffle(True)
    try:
        from ray.data import DataContext
        from ray.data.context import ShuffleStrategy
        ctx = DataContext.get_current()
        assert ctx.shuffle_strategy == ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
        # returns the RAW previous strategy (restorable), not a bool
        assert C.set_push_based_shuffle(False) \
            == ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
        assert ctx.shuffle_strategy == ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
    finally:
        C.set_push_based_shuffle(prev)


def test_cogroup_join_derived_partitions(ray_session):
    """cogroup_join with the derived default still joins correctly."""
    import ray.data

    from gdal_drivers_ray.stages.joins import cogroup_join

    left = ray.data.from_arrow(pa.table({
        "k": np.arange(100, dtype=np.int64),
        "v": np.arange(100, dtype=np.int64) * 2}))
    right = ray.data.from_arrow(pa.table({
        "k": np.arange(0, 200, 2, dtype=np.int64),
        "w": np.arange(0, 200, 2, dtype=np.int64) * 3}))
    out = cogroup_join(left, right, on="k").to_pandas()
    assert len(out) == 50
    assert (out["w"] == out["k"] * 3).all()


def test_set_push_based_shuffle_restores_third_state(ray_session):
    """save/flip/restore must preserve a non-sort strategy exactly."""
    from ray.data import DataContext

    from gdal_drivers_ray.config import set_push_based_shuffle

    try:
        from ray.data.context import ShuffleStrategy
    except ImportError:
        return  # legacy Ray: only the bool flag exists
    ctx = DataContext.get_current()
    if not hasattr(ctx, "shuffle_strategy"):
        return
    orig = ctx.shuffle_strategy
    try:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        prev = set_push_based_shuffle(True)
        assert prev == ShuffleStrategy.HASH_SHUFFLE
        set_push_based_shuffle(prev)
        assert ctx.shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE
    finally:
        ctx.shuffle_strategy = orig
