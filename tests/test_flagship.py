"""End-to-end flagship pipeline + checkpoint/resume (SURVEY.md §7.3, §7.9)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from gdal_drivers_ray import fixtures
from gdal_drivers_ray.grid import cell_id
from gdal_drivers_ray.pipelines import flagship as fp
from gdal_drivers_ray.state import checkpoint

N = 300


@pytest.fixture(scope="module")
def images_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("imgs") / "images.parquet"
    return fixtures.write_images_parquet(str(p), N)


def test_flagship_invariants_hold(ray_session, images_path):
    lod = fixtures.lod_for_count(N)
    out = fp.flagship(images_path, lod).take_all()
    assert len(out) == N
    assert all(r["caption_ok"] for r in out)
    assert all(r["phash_ok"] for r in out)
    # tile assignment matches the fixture ground truth exactly
    for r in out[:20]:
        i = int(r["image_id"].rsplit("-", 1)[-1])
        z, x, y = fixtures.tile_addr_of(i, lod)
        assert (r["lod"], r["tile_x"], r["tile_y"]) == (z, x, y)
        assert r["cell"] == cell_id(z, x, y)


def test_lod_rollup_counts(ray_session, images_path):
    lod = fixtures.lod_for_count(N)
    tiles = fp.tile_index(images_path, lod)
    roll = fp.lod_rollup(tiles).take_all()
    assert sum(r["n_tiles"] for r in roll) == N
    # oracle: group fixture addresses by parent cell in-process
    import collections
    want = collections.Counter()
    for i in range(N):
        z, x, y = fixtures.tile_addr_of(i, lod)
        want[int(cell_id(z - 1, x // 2, y // 2))] += 1
    got = {r["parent_cell"]: r["n_tiles"] for r in roll}
    assert got == dict(want)
    # mean brightness is a true mean (spot check one parent)
    some = roll[0]
    assert 0.0 <= some["mean_px"] <= 255.0


def test_checkpoint_write_resume(ray_session, images_path, tmp_path):
    import ray.data

    lod = fixtures.lod_for_count(N)
    tiles = fp.tile_index(images_path, lod)
    # partition by coarse cell (top 2 bits of x) — small, deterministic
    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column("part", pa.array((b["tile_x"].to_numpy() % 4).astype(np.int64)))
    tiles = tiles.map_batches(add_part, batch_format="pyarrow")

    out_dir = str(tmp_path / "out")
    entries = checkpoint.write_partitioned(tiles, out_dir, "part")
    assert sum(e["rows"] for e in entries) == N
    assert checkpoint.done_partitions(out_dir) == {0, 1, 2, 3}

    # resume: everything finished -> filter removes all rows before work
    remaining = checkpoint.filter_done(tiles, out_dir, "part")
    assert remaining.count() == 0

    # partial resume: forget partition 2's manifest -> only its rows remain
    os.remove(os.path.join(checkpoint.manifest_dir(out_dir), "part-2.json"))
    remaining = checkpoint.filter_done(tiles, out_dir, "part")
    rows = remaining.take_all()
    assert rows and all(r["part"] == 2 for r in rows)

    # written data is readable and complete
    back = ray.data.read_parquet(out_dir)
    assert back.count() == N


def test_decode_poison_row_quarantine(ray_session):
    """Corrupt payloads become dead-letter rows, not task failures."""
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray import codecs, fixtures
    from gdal_drivers_ray.stages.decode import DecodeImages

    good = fixtures.image_row(3, 5)
    t = pa.table({
        "image_id": ["img-00000003", "img-00000004"],
        "bytes": pa.array([good["bytes"], b"\x00garbage"], pa.binary()),
        "w": pa.array([256, 256], pa.int32()),
        "h": pa.array([256, 256], pa.int32()),
        "fmt": ["png", "png"],
        "caption": [good["caption"], "tile 5/4/0 broken row"],
        "phash": pa.array([good["phash"], 0], pa.int64()),
    })
    out = ray.data.from_arrow(t).map_batches(
        DecodeImages(lod=5), batch_format="pyarrow").to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    assert out["status"].tolist() == ["ok", "decode_error"]
    assert out.loc[0, "phash"] == good["phash"]
    assert out.loc[1, "phash"] == 0  # zeroed features on the dead-letter row
