"""Multimodal actor-pool stages (stubbed decode, real plumbing) + salted
two-phase aggregation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from gdal_drivers_ray import codecs
from gdal_drivers_ray.stages import multimodal as MM
from gdal_drivers_ray.stages.skew import partition_sizes, salted_map_groups


def test_audio_stage_actor_pool(ray_session):
    t = MM.synth_audio_table(50)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(MM.DecodeAudio, concurrency=2, batch_size=16,
                         batch_format="pyarrow").to_pandas()
    assert len(out) == 50
    assert set(out.columns) == {"clip_id", "duration_s", "rms", "peak",
                                "zero_cross_rate", "n_frames"}
    assert (out["rms"] > 0).all() and (out["peak"] <= 1.0).all()
    # deterministic (real wav decode + deterministic fake): re-run equal
    out2 = ray.data.from_arrow(t).map_batches(
        MM.DecodeAudio, concurrency=2, batch_size=16,
        batch_format="pyarrow").to_pandas()
    pd.testing.assert_frame_equal(out.sort_values("clip_id").reset_index(drop=True),
                                  out2.sort_values("clip_id").reset_index(drop=True))


def test_audio_wav_decode_is_real():
    """A pure sine WAV must yield rms = amp/sqrt(2), exact duration, and
    zero-crossing rate ~ 2*freq/sr — features of the DECODED SIGNAL, not
    of the payload hash (the old stub would fail all three)."""
    import numpy as np

    from gdal_drivers_ray import codecs

    sr, freq, amp, ns = 16000, 440.0, 0.5, 16000
    t = np.arange(ns) / sr
    wav = codecs.encode_wav(amp * np.sin(2 * np.pi * freq * t), sr)
    samples, sr2 = codecs.decode_wav(wav)
    assert sr2 == sr and len(samples) == ns
    st = MM.DecodeAudio()
    import pyarrow as pa
    out = st(pa.table({
        "clip_id": ["c"], "bytes": pa.array([wav], pa.large_binary()),
        "sample_rate": pa.array([sr], pa.int32()),
        "n_samples": pa.array([ns], pa.int32()), "fmt": ["wav"]}))
    assert abs(out["duration_s"][0].as_py() - 1.0) < 1e-9
    assert abs(out["rms"][0].as_py() - amp / np.sqrt(2)) < 1e-3
    assert abs(out["zero_cross_rate"][0].as_py() - 2 * freq / sr) < 1e-3


def test_audio_nonwav_decode_is_marked_unimplemented():
    st = MM.DecodeAudio(fake=False)
    with pytest.raises(NotImplementedError):
        st._decode(b"xx", "flac", 100, 16000)


def test_video_frame_sampling(ray_session):
    t = MM.synth_video_table(10)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(MM.SampleVideoFrames(every_k=30),
                         batch_size=4, batch_format="pyarrow").to_pandas()
    nf = t["n_frames"].to_numpy()
    want = int(sum(-(-int(x) // 30) for x in nf))
    assert len(out) == want
    assert (out["frame_idx"] % 30 == 0).all()
    a = np.frombuffer(out["px"].iloc[0], dtype=np.uint8)
    assert a.size == 64 * 48


def test_resize_images_real(ray_session):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (64, 64), dtype=np.uint8)
    t = pa.table({
        "image_id": ["a"],
        "bytes": pa.array([codecs.encode_image(img, "png")],
                          type=pa.large_binary()),
        "w": pa.array([64], type=pa.int32()),
        "h": pa.array([64], type=pa.int32()),
        "fmt": ["png"],
    })
    out = ray.data.from_arrow(t).map_batches(
        MM.ResizeImages(factor=2), batch_format="pyarrow").take_all()
    assert out[0]["w"] == 32 and out[0]["h"] == 32
    got = codecs.decode_image(out[0]["bytes"])
    want = img.astype(np.float64).reshape(32, 2, 32, 2).mean(axis=(1, 3)) \
              .astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_partition_sizes_and_salted_agg(ray_session):
    # skewed: key 0 has 9000 rows, keys 1..9 have 100 each
    ks = np.concatenate([np.zeros(9000, dtype=np.int64),
                         np.repeat(np.arange(1, 10), 100)])
    vs = np.arange(len(ks), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": ks, "v": vs}))

    sizes = partition_sizes(ds, "k")
    assert int(sizes.loc[sizes["k"] == 0, "n"].iloc[0]) == 9000
    assert len(sizes) == 10

    logs = []

    def partial(g):
        return pd.DataFrame({"k": [g["k"].iloc[0]],
                             "s": [np.int64(g["v"].sum())],
                             "n": [np.int64(len(g))]})

    def combine(g):
        return pd.DataFrame({"k": [g["k"].iloc[0]],
                             "s": [np.int64(g["s"].sum())],
                             "n": [np.int64(g["n"].sum())]})

    out = salted_map_groups(ds, "k", partial, combine, n_salts=8,
                            hot_threshold=500, sizes=sizes,
                            log=logs.append).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    want = pd.DataFrame({"k": np.arange(10)}).assign(
        s=[int(vs[ks == k].sum()) for k in range(10)],
        n=[int((ks == k).sum()) for k in range(10)])
    assert (out["s"].to_numpy() == want["s"].to_numpy()).all()
    assert (out["n"].to_numpy() == want["n"].to_numpy()).all()
    assert logs and "hot" in logs[0]  # size accounting emitted


def test_video_y4m_real_decode(ray_session):
    """Y4M rows decode the REAL container: sampled pixels equal the
    generator's ground truth, and w/h come from the stream header."""
    t = MM.synth_video_table(6)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(MM.SampleVideoFrames(every_k=10),
                         batch_size=4, batch_format="pyarrow").to_pandas()
    fmts = t["fmt"].to_pylist()
    for i, vid in enumerate(t["video_id"].to_pylist()):
        if fmts[i] != "y4m":
            continue
        mine = out[out["video_id"] == vid]
        assert (mine["frame_idx"] % 10 == 0).all()
        for _, row in mine.iterrows():
            got = np.frombuffer(row["px"], dtype=np.uint8).reshape(48, 64)
            want = MM.video_frame_pixels(i, int(row["frame_idx"]))
            np.testing.assert_array_equal(got, want)


def test_y4m_codec_roundtrip_and_stride():
    frames = np.stack([MM.video_frame_pixels(2, j, 16, 20)
                       for j in range(7)])
    for chroma in ("mono", "420jpeg"):
        buf = codecs.encode_y4m(frames, (24, 1), chroma)
        w, h, n, fps = codecs.y4m_info(buf)
        assert (w, h, n, fps) == (20, 16, 7, 24.0)
        got = dict(codecs.decode_y4m_frames(buf, every_k=3))
        assert sorted(got) == [0, 3, 6]
        for j, luma in got.items():
            np.testing.assert_array_equal(luma, frames[j])
