"""gram_matrix: funnel-summed integer Gram matrix vs the straight-line
oracle, block-layout invariance, closed forms, empty input."""

import numpy as np
import pyarrow as pa
import ray.data

from gdal_drivers_ray.stages.linalg import (gram_matrix,
                                            gram_matrix_oracle)


def _ds_from(vecs: np.ndarray, n_blocks: int) -> ray.data.Dataset:
    tables = []
    for chunk in np.array_split(vecs, n_blocks):
        tables.append(pa.table({
            "embedding": pa.array([list(map(float, r)) for r in chunk],
                                  pa.list_(pa.float32()))}))
    return ray.data.from_arrow(tables)


def test_gram_matrix_closed_form(ray_session):
    # identity-ish: rows e0, e1 scaled — gram entries are known products
    vecs = np.array([[1.0, 0.0], [0.0, 2.0], [1.0, 2.0]], np.float32)
    out = gram_matrix(_ds_from(vecs, 1), quant=10).to_pandas() \
        .sort_values(["i", "j"]).reset_index(drop=True)
    # q = floor(v*10): rows (10,0), (0,20), (10,20)
    # G = [[200, 200], [200, 800]]
    assert list(out["i"]) == [0, 0, 1]
    assert list(out["j"]) == [0, 1, 1]
    assert list(out["gram"]) == [200, 200, 800]


def test_gram_matrix_block_layout_invariant(ray_session):
    rng = np.random.default_rng(7)
    vecs = (rng.standard_normal((101, 16)) * 0.3).astype(np.float32)
    iu, ju, g = gram_matrix_oracle(vecs)
    for n_blocks in (1, 3, 10):
        out = gram_matrix(_ds_from(vecs, n_blocks)).to_pandas() \
            .sort_values(["i", "j"]).reset_index(drop=True)
        assert (out["i"].to_numpy() == iu).all()
        assert (out["j"].to_numpy() == ju).all()
        assert (out["gram"].to_numpy() == g).all(), f"blocks={n_blocks}"


def test_gram_matrix_negative_values_floor(ray_session):
    # floor on negatives: -0.15 * 10 -> floor(-1.5) = -2, not -1
    vecs = np.array([[-0.15, 0.15]], np.float32)
    out = gram_matrix(_ds_from(vecs, 1), quant=10).to_pandas() \
        .sort_values(["i", "j"]).reset_index(drop=True)
    # float32(0.15)*10 = 1.5000000596... -> floor 1; -0.15 -> floor -2
    assert list(out["gram"]) == [4, -2, 1]


def test_gram_matrix_empty(ray_session):
    empty = ray.data.from_arrow(pa.table({
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    out = gram_matrix(empty)
    assert out.count() == 0
    # .to_pandas() on an all-empty dataset renders zero columns (Ray's
    # empty-block quirk, documented at joins.cogroup_join); the DATASET
    # schema is the contract here
    assert out.schema().names == ["i", "j", "gram"]


def test_gram_matrix_mixed_dims_rejected(ray_session):
    import pytest
    ds = ray.data.from_arrow([
        pa.table({"embedding": pa.array([[1.0, 2.0]],
                                        pa.list_(pa.float32()))}),
        pa.table({"embedding": pa.array([[1.0, 2.0, 3.0]],
                                        pa.list_(pa.float32()))})])
    with pytest.raises(Exception, match="mixed embedding dims"):
        gram_matrix(ds).to_pandas()
