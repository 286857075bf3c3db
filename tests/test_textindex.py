"""Persisted inverted text index: pruning, conjunctive retrieval, resume."""

import os

import numpy as np
import pyarrow as pa
import ray.data

from gdal_drivers_ray.stages.textindex import (build_text_index,
                                               search_text_index)


def _docs():
    texts = ["a b c", "b c d", "c d e", "a a c e", "x y z", ""]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })).repartition(3)


def test_build_and_conjunctive_search(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    man = build_text_index(_docs(), idx, num_shards=4)
    assert set(man["shard"]) <= set(range(4))
    assert man["n_postings"].sum() == sum(
        len(set(t.split(" "))) for t in
        ["a b c", "b c d", "c d e", "a a c e", "x y z", ""])
    # docs containing BOTH 'a' and 'c': 0 and 3; relevance = tf sums
    out = search_text_index(idx, ["a", "c"], num_shards=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [0, 3]
    assert out["relevance"].tolist() == [2, 3]   # doc3: a,a,c -> 2+1


def test_search_prunes_missing_and_unknown(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    build_text_index(_docs(), idx, num_shards=4)
    # a term absent from the corpus -> conjunction is empty
    out = search_text_index(idx, ["a", "nosuchterm"], num_shards=4) \
        .to_pandas()
    assert len(out) == 0
    # empty index dir -> empty result, correct schema
    # (schema of an all-empty Dataset is dropped by Ray's empty-block
    # pandas rendering — the documented engine-wide quirk — so only
    # emptiness is asserted)
    out2 = search_text_index(str(tmp_path / "empty"), ["a"],
                             num_shards=4).to_pandas()
    assert len(out2) == 0


def test_build_resume_keeps_shards(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    man1 = build_text_index(_docs(), idx, num_shards=4)
    assert os.path.exists(os.path.join(idx, "_SUCCESS"))
    mtimes = {f: os.path.getmtime(os.path.join(idx, f))
              for f in os.listdir(idx) if f.endswith(".parquet")}
    man2 = build_text_index(_docs(), idx, num_shards=4)
    assert man1["shard"].tolist() == man2["shard"].tolist()
    # manifest counts come from the persisted files on both runs
    assert man1["n_postings"].tolist() == man2["n_postings"].tolist()
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(idx, f)) == m   # untouched
