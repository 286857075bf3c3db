"""Compaction + checkpoint-adjacent storage-maintenance tests
(resume/lineage coverage lives in tests/test_flagship.py)."""


def test_compact_parquet_roundtrip(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    import ray.data

    from gdal_drivers_ray.state.checkpoint import compact_parquet

    src = str(tmp_path / "many")
    os.makedirs(src)
    for i in range(32):
        pq.write_table(pa.table({"k": list(range(i * 10, i * 10 + 10)),
                                 "v": [i] * 10}),
                       f"{src}/part-{i:04d}.parquet")
    out = str(tmp_path / "compacted")
    stats = compact_parquet(src, out, rows_per_file=100)
    assert stats["rows"] == 320 and stats["files_in"] == 32
    assert stats["files_out"] <= 8                 # 320/100 -> 4 + slack
    a = ray.data.read_parquet(src).to_pandas().sort_values("k") \
        .reset_index(drop=True)
    b = ray.data.read_parquet(out).to_pandas().sort_values("k") \
        .reset_index(drop=True)
    assert a.equals(b)                             # content preserved
    with pytest.raises(ValueError, match="src_dir == out_dir"):
        compact_parquet(src, src)


def test_compact_parquet_over_existing_out_dir(ray_session, tmp_path):
    """ADVICE fix: compacting onto an existing out_dir rotates (old dir ->
    .compact-old -> removed) instead of rmtree-then-rename, so a crash
    between the two steps can never leave the destination missing."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from gdal_drivers_ray.state.checkpoint import compact_parquet

    src = str(tmp_path / "many")
    os.makedirs(src)
    for i in range(4):
        pq.write_table(pa.table({"k": [i]}), f"{src}/p-{i}.parquet")
    out = str(tmp_path / "dst")
    os.makedirs(out)
    pq.write_table(pa.table({"stale": [99]}), f"{out}/old.parquet")

    stats = compact_parquet(src, out, rows_per_file=10)
    assert stats["rows"] == 4
    got = ray.data.read_parquet(out).to_pandas()
    assert sorted(got["k"]) == [0, 1, 2, 3] and "stale" not in got
    assert not os.path.exists(out + ".compact-old")


def test_compact_parquet_recovers_interrupted_rotation(ray_session,
                                                       tmp_path):
    """If a previous compaction crashed between its two os.replace calls
    (out_dir gone, contents surviving under .compact-old), the next call
    restores the old contents before compacting — the data is never lost."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from gdal_drivers_ray.state.checkpoint import compact_parquet

    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()
    t = pa.table({"x": pa.array(range(10), pa.int64())})
    pq.write_table(t, src / "a.parquet")
    # simulate the crash window: out_dir missing, old contents rotated away
    old = str(out) + ".compact-old"
    os.makedirs(old)
    pq.write_table(t, os.path.join(old, "survivor.parquet"))
    assert not out.exists()
    res = compact_parquet(str(src), str(out), rows_per_file=100)
    assert res["rows"] == 10 and out.exists()
    assert not os.path.exists(old)   # consumed by the rotation


def test_write_partitioned_rerun_never_doubles(ray_session, tmp_path):
    """An unfiltered re-run over the same out_dir must not append
    duplicate files into already-manifested partitions."""
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray.state import checkpoint as C

    out = str(tmp_path / "out")
    t = pa.table({"part": pa.array([0, 0, 1, 1], pa.int64()),
                  "v": pa.array([1, 2, 3, 4], pa.int64())})
    e1 = C.write_partitioned(ray.data.from_arrow(t), out)
    assert sorted(x["part"] for x in e1) == [0, 1]
    # re-run WITHOUT pre-filtering: manifested partitions are authoritative
    e2 = C.write_partitioned(ray.data.from_arrow(t), out)
    assert e2 == []
    got = ray.data.read_parquet(out).to_pandas()
    assert len(got) == 4


def test_compact_parquet_hive_layout(ray_session, tmp_path):
    """compact_parquet handles write_partitioned's part=k/ layout (its
    advertised input) and skips the _manifest dir."""
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray.state import checkpoint as C

    out = str(tmp_path / "out")
    t = pa.table({"part": pa.array([0, 0, 1], pa.int64()),
                  "v": pa.array([1, 2, 3], pa.int64())})
    C.write_partitioned(ray.data.from_arrow(t), out)
    res = C.compact_parquet(out, str(tmp_path / "compact"))
    assert res["rows"] == 3
