"""SemDeDup-style semantic dedup: planted paraphrases + oracle parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from gdal_drivers_ray.stages.semdedup import (semantic_dedup,
                                              semantic_dedup_oracle)


def _planted(n_base=60, n_dups=8, dim=16, seed=7):
    """n_base random unit-ish vectors (ids 0..n_base-1) + n_dups planted
    paraphrases: id n_base+j is vector j with tiny noise (cosine ~1)."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, dim))
    dups = base[:n_dups] + rng.normal(scale=1e-3, size=(n_dups, dim))
    vecs = np.concatenate([base, dups])
    ids = np.arange(len(vecs), dtype=np.int64)
    return ids, vecs


def _to_ds(ids, vecs, blocks=1):
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array([list(map(float, v)) for v in vecs],
                                        pa.list_(pa.float64()))})
    return ray.data.from_arrow(t).repartition(blocks)


def test_planted_paraphrases_pruned(ray_session):
    ids, vecs = _planted()
    out = semantic_dedup(_to_ds(ids, vecs, blocks=4), k=4, n_iter=3,
                         threshold=0.95).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert len(out) == len(ids)
    # every planted dup joins its source's component and is NOT a keeper
    for j in range(8):
        dup = out[out.vec_id == 60 + j].iloc[0]
        src = out[out.vec_id == j].iloc[0]
        assert dup.sem_cluster_id == src.sem_cluster_id == j
        assert bool(src.is_keeper) and not bool(dup.is_keeper)
    # non-planted vectors keep themselves (random cosines stay < 0.95)
    others = out[(out.vec_id >= 8) & (out.vec_id < 60)]
    assert (others.sem_cluster_id == others.vec_id).all()
    assert others.is_keeper.all()


def test_oracle_parity_any_block_layout(ray_session):
    """Distributed output == straight-line oracle bit-for-bit, on 1-block
    and many-block layouts (the kmeans hash-stability discipline)."""
    ids, vecs = _planted(n_base=40, n_dups=5, dim=8, seed=3)
    vid, cell, lab, keep = semantic_dedup_oracle(ids, vecs, k=4, n_iter=3,
                                                 threshold=0.9)
    want = pd.DataFrame({"vec_id": vid, "cell": cell,
                         "sem_cluster_id": lab, "is_keeper": keep}) \
        .sort_values("vec_id").reset_index(drop=True)
    for blocks in (1, 7):
        got = semantic_dedup(_to_ds(ids, vecs, blocks=blocks), k=4,
                             n_iter=3, threshold=0.9).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_oversized_cluster_chunking(ray_session):
    """A cell bigger than max_cluster splits into id-ordered chunks; dups
    that share a chunk are still pruned and output stays full-length."""
    ids, vecs = _planted(n_base=30, n_dups=4, dim=8, seed=5)
    out = semantic_dedup(_to_ds(ids, vecs, blocks=3), k=1, n_iter=1,
                         threshold=0.95, max_cluster=34).to_pandas()
    assert len(out) == len(ids)
    # chunk 1 holds ids 0..33, so sources 0..3 and dups 30..33 co-reside
    for j in range(4):
        dup = out[out.vec_id == 30 + j].iloc[0]
        assert dup.sem_cluster_id == j and not bool(dup.is_keeper)


def test_empty_input(ray_session):
    """Empty embeddings -> typed empty output, not a stack crash; the
    underlying kmeans raises a clear error when seeds are missing."""
    import pytest

    from gdal_drivers_ray.stages.kmeans import kmeans_fit

    empty = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64()))}))
    out = semantic_dedup(empty, k=2, n_iter=1)
    assert out.count() == 0
    assert set(out.schema().names) == \
        {"vec_id", "cell", "sem_cluster_id", "is_keeper"}
    with pytest.raises(ValueError, match="seed"):
        kmeans_fit(empty, k=2, n_iter=1)
