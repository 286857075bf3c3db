"""WebDataset-style tar sink/reader: round-trip, determinism, resume."""

import os
import tarfile

import numpy as np
import pyarrow as pa
import ray.data

from gdal_drivers_ray.sources.wds import read_wds_shards, write_wds_shards


def _images(n=40):
    rng = np.random.default_rng(9)
    return pa.table({
        "image_id": pa.array([f"img-{i:08d}" for i in range(n)]),
        "idx": pa.array(np.arange(n, dtype=np.int64)),
        "bytes": pa.array([rng.bytes(50 + i) for i in range(n)],
                          type=pa.large_binary()),
        "fmt": pa.array(["png" if i % 2 == 0 else "jpeg"
                         for i in range(n)]),
        "caption": pa.array([f"caption {i} of image" for i in range(n)]),
    })


def test_wds_round_trip(ray_session, tmp_path):
    t = _images()
    ds = ray.data.from_arrow(t).repartition(5)
    out = str(tmp_path / "wds")
    man = write_wds_shards(ds, out, samples_per_shard=16).to_pandas() \
        .sort_values("shard").reset_index(drop=True)
    assert man["shard"].tolist() == [0, 1, 2]
    assert man["n_samples"].tolist() == [16, 16, 8]
    want_payload = [sum(50 + i for i in range(s * 16, min((s + 1) * 16, 40)))
                    for s in range(3)]
    assert man["payload_bytes"].tolist() == want_payload

    back = read_wds_shards(out).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    orig = t.to_pandas().drop(columns=["idx"]) \
        .sort_values("image_id").reset_index(drop=True)
    assert back["image_id"].tolist() == orig["image_id"].tolist()
    assert back["fmt"].tolist() == orig["fmt"].tolist()
    assert back["caption"].tolist() == orig["caption"].tolist()
    assert [bytes(b) for b in back["bytes"]] == \
        [bytes(b) for b in orig["bytes"]]


def test_wds_shards_byte_deterministic(ray_session, tmp_path):
    """Identical input -> bit-identical shard files regardless of block
    layout (zeroed tar metadata + order-key-sorted members)."""
    t = _images(24)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_wds_shards(ray.data.from_arrow(t).repartition(2), a,
                     samples_per_shard=10).materialize()
    write_wds_shards(ray.data.from_arrow(t).repartition(7), b,
                     samples_per_shard=10).materialize()
    for f in sorted(os.listdir(a)):
        with open(os.path.join(a, f), "rb") as fa, \
                open(os.path.join(b, f), "rb") as fb:
            assert fa.read() == fb.read(), f


def test_wds_resume_keeps_existing(ray_session, tmp_path):
    """A pre-existing shard file is kept (resume), and the manifest
    reports the EXISTING file's stats."""
    t = _images(10)
    out = str(tmp_path / "wds")
    os.makedirs(out)
    stale = os.path.join(out, "shard-000000.tar")
    with tarfile.open(stale, "w") as tf:
        data = b"x" * 7
        ti = tarfile.TarInfo("old.png")
        ti.size = 7
        import io
        tf.addfile(ti, io.BytesIO(data))
    man = write_wds_shards(ray.data.from_arrow(t), out,
                           samples_per_shard=100).to_pandas()
    assert man["n_samples"].tolist() == [1]       # the stale tar's stats
    assert man["payload_bytes"].tolist() == [7]
