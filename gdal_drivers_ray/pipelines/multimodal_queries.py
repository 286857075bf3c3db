"""Multimodal queries (rows-only): actor-pool stages over synthetic payload
tables and the input_hint image fixture. Decode is stubbed (no codec libs in
this container) but deterministic, so row counts and schemas are stable; the
Ray plumbing (actor pools, batch sizing, binary columns) is the real path.
"""

from __future__ import annotations

import ray
import ray.data

from .. import fixtures
from ..stages import multimodal as MM


def _scaled_n(sf_dir: str, base: int = 200) -> int:
    import os
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    try:
        return max(int(base * float(sf) * 100), 20)
    except ValueError:
        return base


def q_audio_features(sf_dir: str) -> ray.data.Dataset:
    """Audio decode stub -> per-clip rms/peak/duration features."""
    t = MM.synth_audio_table(_scaled_n(sf_dir))
    return ray.data.from_arrow(t).map_batches(
        MM.DecodeAudio, concurrency=2, batch_size=64, batch_format="pyarrow")


def q_video_frames(sf_dir: str) -> ray.data.Dataset:
    """Video frame sampling -> every 30th frame as an image-tile row,
    reduced to per-video frame counts (keeps the result narrow). Y4M rows
    decode the real container; opaque mp4 rows run the stub path."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    t = MM.synth_video_table(_scaled_n(sf_dir, 100))
    frames = ray.data.from_arrow(t).map_batches(
        MM.SampleVideoFrames(every_k=30), concurrency=2, batch_size=16,
        batch_format="pyarrow")

    def ones(b: pa.Table) -> pa.Table:
        import numpy as np
        return pa.table({"video_id": b["video_id"],
                         "n": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    return frames.map_batches(ones, batch_format="pyarrow") \
                 .groupby("video_id").aggregate(Sum("n", alias_name="n_frames"))


def q_image_resize(sf_dir: str) -> ray.data.Dataset:
    """Real 2x box-filter resize over the input_hint image fixture."""
    path = fixtures.images_path_for(sf_dir)
    ds = ray.data.read_parquet(path,
                               columns=["image_id", "bytes", "w", "h", "fmt"])
    return ds.map_batches(MM.ResizeImages,
                          fn_constructor_kwargs={"factor": 2},
                          concurrency=(2, 16), batch_size=64,
                          batch_format="pyarrow") \
             .select_columns(["image_id", "w", "h", "fmt"])
