"""Property tests for the custom join operators (stages/joins.py):
cogroup_join vs a pandas-merge oracle on randomized tables, including
empty sides, hot keys, and int64 extremes; asof_join dtype stability."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import given, settings, strategies as st

from gdal_drivers_ray.stages.joins import asof_join, cogroup_join

_keys = st.lists(
    st.one_of(st.integers(0, 5),                  # hot, colliding
              st.integers(-2**62, 2**62),         # int64 extremes
              st.integers(0, 1000)),
    min_size=0, max_size=30)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="stable") \
             .reset_index(drop=True)


@settings(max_examples=25, deadline=None)
@given(_keys, _keys, st.sampled_from(["inner", "left"]))
def test_cogroup_join_matches_pandas(ray_session, lk, rk, how):
    left = pd.DataFrame({"k": np.asarray(lk, np.int64),
                         "lv": np.arange(len(lk), dtype=np.int64)})
    right = pd.DataFrame({"k": np.asarray(rk, np.int64),
                          "rv": np.arange(len(rk), dtype=np.int64) * 10})
    got = cogroup_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="k", how=how, num_partitions=4).to_pandas()
    want = left.merge(right, on="k", how=how)
    if len(want) == 0:
        # empty-result quirk: Ray skips map UDFs on empty blocks, so an
        # all-empty join may render with no columns (documented in
        # cogroup_join); rows are what the oracle checks here
        assert len(got) == 0
        return
    if how == "left":
        # nullable int comes back as pandas nullable / float — compare
        # values with NaN-tolerant float view
        got["rv"] = got["rv"].astype("float64")
        want["rv"] = want["rv"].astype("float64")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)


def test_asof_join_output_dtypes_are_input_dtypes(ray_session):
    """Regression: the pandas group view upcast int columns to float64
    through the union's null markers; output must carry input types."""
    left = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                     "t": pa.array([10.0, 20.0, 15.0], pa.float64()),
                     "lid": pa.array([100, 101, 102], pa.int64())})
    right = pa.table({"k": pa.array([1, 2], pa.int64()),
                      "t": pa.array([5.0, 14.0], pa.float64()),
                      "rid": pa.array([7, 8], pa.int64())})
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    key="k", time_col="t", tie_col="rid")
    sch = {f.name: str(f.type)
           for f in out.schema().base_schema}
    assert sch["lid"] == "int64" and sch["rid_r"] == "int64"
    df = out.to_pandas().sort_values("lid").reset_index(drop=True)
    assert df["rid_r"].tolist() == [7, 7, 8]


def test_asof_join_int64_above_2_53_exact(ray_session):
    """Regression (round-3 advice): bucketed carry rows used to round-trip
    int64 times/ties through float64 NaN markers, silently rounding values
    above 2^53 (epoch-ns timestamps, 64-bit hash ids). Exactness must hold
    on BOTH plans — plain and bucketed — and the carry path must actually
    fire (right row in an earlier bucket than its left match)."""
    BIG = (1 << 60) + 12345            # not representable in float64
    lt = np.array([BIG + 5_000, BIG + 9_000, BIG + 10], np.int64)
    left = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                     "t": pa.array(lt, pa.int64()),
                     "lid": pa.array([0, 1, 2], pa.int64())})
    rt = np.array([BIG + 1, BIG + 7_000, BIG + 3], np.int64)
    rid = np.array([BIG + 11, BIG + 13, BIG + 17], np.int64)
    right = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                      "t": pa.array(rt, pa.int64()),
                      "rid": pa.array(rid, pa.int64())})
    for bw in (None, 1000.0):          # bucket 1000 splits k=1's history
        out = asof_join(ray.data.from_arrow(left),
                        ray.data.from_arrow(right),
                        key="k", time_col="t", tie_col="rid",
                        bucket_width=bw) \
            .to_pandas().sort_values("lid").reset_index(drop=True)
        assert out["t_r"].tolist() == [BIG + 1, BIG + 7_000, BIG + 3], bw
        assert out["rid_r"].tolist() == [BIG + 11, BIG + 13, BIG + 17], bw
        assert out["t"].tolist() == lt.tolist(), bw


def test_broadcast_join_left_and_duplicate_keys(ray_session):
    """Arrow-native probe: duplicate right keys expand, left join keeps
    unmatched rows with null right columns, left row order preserved."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray.stages.joins import broadcast_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([3, 1, 2, 9], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d"])}))
    small = pd.DataFrame({"rk": [1, 2, 2, 3],
                          "rv": ["x", "y1", "y2", "z"]})

    inner = broadcast_join(left, small, "k", "rk").to_pandas()
    assert list(zip(inner["k"], inner["rv"])) == [
        (3, "z"), (1, "x"), (2, "y1"), (2, "y2")]

    lj = broadcast_join(left, small, "k", "rk", how="left").to_pandas()
    assert list(lj["k"]) == [3, 1, 2, 2, 9]
    assert lj["rv"].isna().tolist() == [False, False, False, False, True]


def test_asof_payload_carry_plain_and_bucketed(ray_session):
    """Arbitrary right payload columns (string + float) survive the as-of
    join on BOTH plans, including a match carried across bucket borders."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    left = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([100, 950, 500], pa.int64())}))
    # user 1: rights at 90 and 120 -> ts=100 matches 90, ts=950 matches
    # 120 (carried across buckets of width 200); user 2: right at 499
    right = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([90, 120, 499], pa.int64()),
        "click_id": pa.array([7, 8, 9], pa.int64()),
        "page": pa.array(["home", "cart", "promo"]),
        "score": pa.array([0.5, 1.25, -2.0], pa.float64())}))

    from gdal_drivers_ray.stages.joins import asof_join

    want = pd.DataFrame({
        "user_id": [1, 1, 2], "ts": [100, 950, 500],
        "ts_r": [90, 120, 499], "click_id_r": [7, 8, 9],
        "page_r": ["home", "cart", "promo"],
        "score_r": [0.5, 1.25, -2.0]})

    for bw in (None, 200.0):
        out = asof_join(left, right, key="user_id", time_col="ts",
                        tie_col="click_id",
                        payload_cols=["page", "score"],
                        bucket_width=bw).to_pandas() \
            .sort_values(["user_id", "ts"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            out[list(want.columns)], want, check_dtype=False)


def test_broadcast_join_rejects_non_integer_keys(ray_session):
    """ADVICE fix: the int64 searchsorted probe must refuse string keys
    (would raise deep inside numpy) and float keys (silent truncation
    toward zero could mis-join 1.9 against 1.1)."""
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data

    from gdal_drivers_ray.stages.joins import broadcast_join

    left_f = ray.data.from_arrow(pa.table({
        "k": pa.array([1.9, 2.0], pa.float64())}))
    left_i = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64())}))

    with pytest.raises(TypeError, match="integer-typed"):
        broadcast_join(left_i, pd.DataFrame({"rk": [1.1], "rv": ["x"]}),
                       "k", "rk")
    with pytest.raises(TypeError, match="integer-typed"):
        broadcast_join(left_i, pd.DataFrame({"rk": ["a"], "rv": ["x"]}),
                       "k", "rk")
    # left-side violation surfaces when the pipeline executes
    ds = broadcast_join(left_f, pd.DataFrame({"rk": [1], "rv": ["x"]}),
                        "k", "rk")
    with pytest.raises(Exception, match="integer-typed"):
        ds.materialize()


def test_cogroup_join_string_keys(ray_session):
    """String-key cogroup: siphash partitioning co-locates, the merge
    equates on exact values; parity with pandas merge."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray.stages.joins import cogroup_join

    lk = [f"key-{i % 37}" for i in range(500)]
    rk = [f"key-{i}" for i in range(0, 74, 2)]   # half match, half absent
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(lk), "v": pa.array(range(500), pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(rk), "w": pa.array(range(len(rk)), pa.int64())}))
    got = cogroup_join(left, right, on="k", num_partitions=8) \
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    want = pd.DataFrame({"k": lk, "v": range(500)}).merge(
        pd.DataFrame({"k": rk, "w": range(len(rk))}), on="k") \
        .sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # left join keeps unmatched rows with null w
    lj = cogroup_join(left, right, on="k", how="left",
                      num_partitions=8).to_pandas()
    assert len(lj) == 500 and lj["w"].isna().sum() > 0


def test_cogroup_join_rejects_other_key_types(ray_session):
    import pytest
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray.stages.joins import cogroup_join

    f = ray.data.from_arrow(pa.table({
        "k": pa.array([1.5, 2.5]), "v": pa.array([1, 2], pa.int64())}))
    with pytest.raises(Exception, match="integer or string"):
        cogroup_join(f, f, on="k", num_partitions=2).count()


def test_broadcast_join_empty_small_side(ray_session):
    """An empty small side must not crash the probe (ks[pos_c] on an
    empty key array): inner keeps nothing, left keeps every row with
    null right columns."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray.stages.joins import broadcast_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([3, 1, 2], pa.int64()),
        "lv": pa.array(["a", "b", "c"])}))
    empty = pd.DataFrame({"rk": pd.array([], dtype="int64"),
                          "rv": pd.array([], dtype="string")})

    inner = broadcast_join(left, empty, "k", "rk").to_pandas()
    assert len(inner) == 0

    lj = broadcast_join(left, empty, "k", "rk", how="left").to_pandas()
    assert list(lj["k"]) == [3, 1, 2]
    assert lj["rv"].isna().all()
