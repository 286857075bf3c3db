"""Property tests for the round-4b primitives: block-layout invariance
and straight-line parity under randomized inputs (hypothesis)."""

import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gdal_drivers_ray.stages import warp as W
from gdal_drivers_ray.grid import Extents

_SETTINGS = dict(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


@settings(**_SETTINGS)
@given(st.data())
def test_fused_term_topk_layout_invariant_and_exact(ray_session, data):
    """_fused_term_topk (top_terms mode): any block layout produces the
    straight-line pandas answer, including tf ties."""
    import pandas as pd

    from gdal_drivers_ray.stages.text import top_terms

    rng_seed = data.draw(st.integers(0, 2**16))
    n_parts = data.draw(st.integers(1, 7))
    rng = np.random.default_rng(rng_seed)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    docs = []
    for i in range(30):
        words = rng.choice(vocab, size=rng.integers(1, 12))
        docs.append({"doc_id": i, "source": f"s{i % 3}",
                     "text": " ".join(words)})
    ds = ray.data.from_items(docs).repartition(n_parts)
    got = top_terms(ds, k=3).to_pandas() \
        .sort_values(["source", "rank"]).reset_index(drop=True)

    tf: dict = {}
    df: dict = {}
    for d in docs:
        ws = d["text"].split(" ")
        for w in ws:
            tf[(d["source"], w)] = tf.get((d["source"], w), 0) + 1
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    rows = [{"source": s, "term": w, "tf": c, "df": df[w]}
            for (s, w), c in tf.items()]
    want = pd.DataFrame(rows).sort_values(
        ["source", "tf", "term"], ascending=[True, False, True],
        kind="stable").groupby("source").head(3).reset_index(drop=True)
    want["rank"] = want.groupby("source").cumcount() + 1
    want = want[["source", "rank", "term", "tf", "df"]]
    pd.testing.assert_frame_equal(
        got.astype({"tf": "int64", "df": "int64"}),
        want.astype({"tf": "int64", "df": "int64"}))


@settings(**_SETTINGS)
@given(st.data())
def test_distributed_rank_random(ray_session, data):
    from gdal_drivers_ray.stages.mix import distributed_rank

    seed = data.draw(st.integers(0, 2**16))
    n_rb = data.draw(st.integers(1, 9))
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 200))
    ids = rng.permutation(10 * n)[:n].astype(np.int64)
    parts = np.array([f"p{int(x)}" for x in rng.integers(0, 4, n)])
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "p": pa.array(parts)})).repartition(5)
    out = distributed_rank(ds, part_col="p", order_col="id",
                           n_range_buckets=n_rb).to_pandas()
    for p, g in out.groupby("p"):
        g = g.sort_values("id")
        assert g["rank"].tolist() == list(range(len(g)))


@settings(**_SETTINGS)
@given(st.data())
def test_footprint_kernels_random_downsample(data):
    """min/max/mode oracle vs brute-force block reductions on random
    integer rasters at random integer downsample factors."""
    seed = data.draw(st.integers(0, 2**16))
    f = data.draw(st.sampled_from([2, 4]))
    rng = np.random.default_rng(seed)
    ny = nx = 32
    src = rng.integers(0, 7, (ny, nx)).astype(np.float64)  # small range:
    # repeated values make mode ties real
    e = Extents(0.0, 0.0, float(nx), float(ny))
    sg = W.RasterGrid(e, "local", nx, ny)
    dg = W.RasterGrid(e, "local", nx // f, ny // f)
    blocks = src.reshape(ny // f, f, nx // f, f).transpose(0, 2, 1, 3) \
                .reshape(ny // f, nx // f, f * f)
    got_min = W.warp_oracle(src, sg, dg, "minimum", nodata=-1.0)
    got_max = W.warp_oracle(src, sg, dg, "maximum", nodata=-1.0)
    got_mode = W.warp_oracle(src, sg, dg, "mode", nodata=-1.0)
    np.testing.assert_array_equal(got_min, blocks.min(axis=2))
    np.testing.assert_array_equal(got_max, blocks.max(axis=2))
    for i in range(ny // f):
        for j in range(nx // f):
            v, c = np.unique(blocks[i, j], return_counts=True)
            assert got_mode[i, j] == v[c.argmax()]   # smallest wins ties
