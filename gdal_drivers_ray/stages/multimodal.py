"""Multimodal columns: opaque binary payloads + typed metadata, processed by
actor-pool `map_batches` stages.

Per the brief, image/audio/video payloads are `large_binary` columns with
typed metadata. The image path is fully real (gdal_drivers_ray.codecs);
audio decodes WAV/PCM for real (stdlib wave) and video decodes Y4M
(YUV4MPEG2) for real (codecs.decode_y4m_frames, offset-stride sampling).
Only formats whose codec libraries are absent from this container
(flac/mp3, mp4/h264) fall back to a deterministic fake (`fake=True`,
default) or `NotImplementedError` (`fake=False`); their Ray-side plumbing
— schema, actor signature, batch sizing, output layout — is identical to
the real paths.

Scale notes: payloads are large (tiles 64-512 KiB, audio/video more), so
stages run with explicit small `batch_size` and the decoded output is
reduced to features before any shuffle. Stages are callable CLASSES —
`map_batches(Cls, concurrency=N, batch_size=B)` — with per-actor state in
`__init__` (T3/T6 warm-state pattern; ref blender.cpp:354-384 open-handle
reuse)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .. import codecs
from ..grid import TILE

AUDIO_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("bytes", pa.large_binary()),     # opaque encoded audio
    ("sample_rate", pa.int32()),
    ("n_samples", pa.int32()),
    ("fmt", pa.string()),             # e.g. "wav", "flac"
])

VIDEO_SCHEMA = pa.schema([
    ("video_id", pa.string()),
    ("bytes", pa.large_binary()),     # opaque encoded video
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("n_frames", pa.int32()),
    ("fps", pa.float32()),
    ("fmt", pa.string()),             # e.g. "mp4"
])


def _det_floats(payload: bytes, n: int, lo: float, hi: float) -> np.ndarray:
    """Deterministic fake sample stream from a payload digest."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(),
                          "little")
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, n)


class DecodeAudio:
    """Actor-pool stage: encoded audio -> per-clip features.

    WAV/PCM rows decode FOR REAL (codecs.decode_wav, stdlib container
    parse — sample rate and length come from the file, not the metadata
    columns). Other formats (flac/mp3/...) need codec libraries absent
    from this container: with fake=True (default) their samples are a
    deterministic function of the payload bytes so the pipeline plumbing
    still runs end-to-end; fake=False raises NotImplementedError where a
    real decoder (e.g. soundfile/ffmpeg) would be called."""

    def __init__(self, fake: bool = True, frame_ms: int = 25):
        self.fake = fake
        self.frame_ms = frame_ms  # analysis window for the rms framing

    def _decode(self, payload: bytes, fmt: str,
                n_samples: int, sr: int) -> tuple[np.ndarray, int]:
        if fmt == "wav" and payload[:4] == b"RIFF":
            return codecs.decode_wav(payload)        # REAL decode
        if not self.fake:
            raise NotImplementedError(
                f"decoding {fmt!r} requires an audio codec library "
                "(not present in this environment); run with fake=True")
        return _det_floats(payload, n_samples, -1.0, 1.0), sr

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        rms = np.empty(n)
        peak = np.empty(n)
        n_frames = np.empty(n, dtype=np.int32)
        dur = np.empty(n)
        zcr = np.empty(n)
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        metas = batch["n_samples"].to_numpy()
        srs = batch["sample_rate"].to_numpy()
        for i in range(n):
            samples, sr = self._decode(blobs[i], fmts[i], int(metas[i]),
                                       int(srs[i]))
            m = len(samples)
            rms[i] = float(np.sqrt(np.mean(samples ** 2))) if m else 0.0
            peak[i] = float(np.abs(samples).max()) if m else 0.0
            zcr[i] = float((np.diff(np.signbit(samples)) != 0).mean()) \
                if m > 1 else 0.0
            frame = max(int(sr * self.frame_ms / 1000), 1)
            n_frames[i] = -(-m // frame)
            dur[i] = m / sr if sr else 0.0
        return pa.table({
            "clip_id": batch["clip_id"],
            "duration_s": pa.array(dur),
            "rms": pa.array(rms),
            "peak": pa.array(peak),
            "zero_cross_rate": pa.array(zcr),
            "n_frames": pa.array(n_frames, type=pa.int32()),
        })


class SampleVideoFrames:
    """Actor-pool stage: encoded video -> every k-th frame as an image row.

    Y4M (YUV4MPEG2) rows decode FOR REAL — codecs.decode_y4m_frames parses
    the container and strides to every k-th frame by offset arithmetic
    (w/h/n_frames come from the stream header, not the metadata columns).
    Compressed formats (mp4/...) need ffmpeg/PyAV, absent from this
    container: fake=True (default) synthesizes deterministic frames so the
    plumbing runs end-to-end; fake=False raises NotImplementedError.
    Output rows use the image tile layout (`px` large_binary + dtype tag)
    so sampled frames flow directly into the existing image stages
    (decode features, LOD rollup, blend)."""

    def __init__(self, every_k: int = 30, fake: bool = True):
        self.every_k = every_k
        self.fake = fake

    def _fake_frame(self, payload: bytes, idx: int,
                    w: int, h: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real decode of compressed video requires ffmpeg/PyAV "
                "(not present in this environment); run with fake=True")
        base = _det_floats(payload + idx.to_bytes(4, "little"), w * h, 0, 256)
        return base.astype(np.uint8).reshape(h, w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, fidx, pxs, ws, hs = [], [], [], [], []
        blobs = batch["bytes"].to_pylist()
        for i in range(batch.num_rows):
            payload = blobs[i]
            vid = batch["video_id"][i].as_py()
            if payload[:9] == b"YUV4MPEG2":
                # header parse only (w/h): y4m_info would walk every
                # frame to compute a count this loop never uses, doubling
                # container traversal per video
                hdr, _ = codecs._y4m_header(payload)
                w, h = hdr["W"], hdr["H"]
                for j, luma in codecs.decode_y4m_frames(payload,
                                                        self.every_k):
                    vids.append(vid); fidx.append(j)
                    pxs.append(luma.tobytes()); ws.append(w); hs.append(h)
                continue
            w = int(batch["w"][i].as_py())
            h = int(batch["h"][i].as_py())
            nf = int(batch["n_frames"][i].as_py())
            for j in range(0, nf, self.every_k):
                vids.append(vid)
                fidx.append(j)
                pxs.append(self._fake_frame(payload, j, w, h).tobytes())
                ws.append(w)
                hs.append(h)
        # explicit string types: a zero-frame batch (empty input block OR
        # all-empty clips) would otherwise infer null-typed video_id /
        # dtype columns and break downstream schema unification (the
        # imageprep.py:97 hazard)
        return pa.table({
            "video_id": pa.array(vids, type=pa.string()),
            "frame_idx": pa.array(fidx, type=pa.int32()),
            "w": pa.array(ws, type=pa.int32()),
            "h": pa.array(hs, type=pa.int32()),
            "dtype": pa.array(["uint8"] * len(vids), type=pa.string()),
            "px": pa.array(pxs, type=pa.large_binary()),
        })


class ResizeImages:
    """Actor-pool stage: REAL image resize (no stub) on decoded/encoded
    tiles: decode via gdal_drivers_ray.codecs, box-filter (area) downsample
    by integer factor, re-encode. Mirrors the reference's overview halving
    (solid.cpp:352-369) generalized to any integer factor."""

    def __init__(self, factor: int = 2, out_fmt: str = "png"):
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self.factor = factor
        self.out_fmt = out_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        f = self.factor
        out_bytes, ws, hs = [], [], []
        for i in range(batch.num_rows):
            px = codecs.decode_image(batch["bytes"][i].as_py())
            h, w = px.shape[:2]
            hh, ww = h // f * f, w // f * f
            a = px[:hh, :ww].astype(np.float64)
            if a.ndim == 2:
                small = a.reshape(hh // f, f, ww // f, f).mean(axis=(1, 3))
            else:
                small = a.reshape(hh // f, f, ww // f, f, -1).mean(axis=(1, 3))
            small = small.astype(px.dtype)
            out_bytes.append(codecs.encode_image(small, self.out_fmt))
            hs.append(small.shape[0])
            ws.append(small.shape[1])
        return pa.table({
            "image_id": batch["image_id"],
            "bytes": pa.array(out_bytes, type=pa.large_binary()),
            "w": pa.array(ws, type=pa.int32()),
            "h": pa.array(hs, type=pa.int32()),
            "fmt": pa.array([self.out_fmt] * batch.num_rows,
                            type=pa.string()),
        })


def synth_audio_rows(idx: np.ndarray, seed: int = 7) -> pa.Table:
    """Deterministic audio rows (AUDIO_SCHEMA) for arbitrary row indices —
    PER-INDEX seeded, so fixture construction parallelizes across Ray
    tasks and any slice is reproducible independently. Most rows carry
    REAL 16-bit PCM WAV payloads (sine + noise, stdlib wave container);
    every 5th row is an opaque 'flac' payload exercising the stub path."""
    sr = 16000
    ids, blobs, srs, lens, fmts = [], [], [], [], []
    for i in np.asarray(idx, dtype=np.int64):
        i = int(i)
        rng = np.random.default_rng([seed, i])
        ns = int(rng.integers(1600, 24000))
        ids.append(f"clip-{i:06d}")
        if i % 5 == 4:
            blobs.append(rng.bytes(64))
            fmts.append("flac")
        else:
            t = np.arange(ns) / sr
            freq = float(rng.uniform(100, 2000))
            amp = float(rng.uniform(0.2, 0.9))
            samples = amp * np.sin(2 * np.pi * freq * t) \
                + 0.02 * rng.standard_normal(ns)
            blobs.append(codecs.encode_wav(samples, sr))
            fmts.append("wav")
        srs.append(sr)
        lens.append(ns)
    return pa.table({
        "clip_id": ids,
        "bytes": blobs,
        "sample_rate": np.asarray(srs, dtype=np.int32),
        "n_samples": np.asarray(lens, dtype=np.int32),
        "fmt": fmts,
    }, schema=AUDIO_SCHEMA)


def synth_audio_table(n: int, seed: int = 7) -> pa.Table:
    return synth_audio_rows(np.arange(n), seed)


def video_frame_pixels(i: int, j: int, h: int = 48, w: int = 64) -> np.ndarray:
    """Ground-truth luma for fixture video i, frame j (moving gradient +
    frame-index stripe — lets tests pin exact decoded pixels)."""
    yy, xx = np.mgrid[0:h, 0:w]
    return ((xx * (3 + i % 5) + yy * 2 + j * 7) % 256).astype(np.uint8)


def synth_video_rows(idx: np.ndarray, seed: int = 11) -> pa.Table:
    """Deterministic video rows (VIDEO_SCHEMA) for arbitrary row indices —
    PER-INDEX seeded (parallel fixture construction, see
    synth_audio_rows). Most rows carry REAL Y4M payloads (mono or 4:2:0
    flat-chroma, codecs.encode_y4m); every 5th row is an opaque 'mp4'
    payload exercising the stub path."""
    w, h = 64, 48
    idx = np.asarray(idx, dtype=np.int64)
    nfs, blobs, fmts = [], [], []
    for i in idx:
        i = int(i)
        rng = np.random.default_rng([seed, i])
        nf = int(rng.integers(30, 120))
        nfs.append(nf)
        if i % 5 == 4:
            blobs.append(rng.bytes(128))
            fmts.append("mp4")
        else:
            frames = np.stack([video_frame_pixels(i, j, h, w)
                               for j in range(nf)])
            chroma = "mono" if i % 2 == 0 else "420jpeg"
            blobs.append(codecs.encode_y4m(frames, (30, 1), chroma))
            fmts.append("y4m")
    n = len(idx)
    return pa.table({
        "video_id": [f"vid-{int(i):06d}" for i in idx],
        "bytes": blobs,
        "w": np.full(n, w, dtype=np.int32),
        "h": np.full(n, h, dtype=np.int32),
        "n_frames": np.asarray(nfs, dtype=np.int32),
        "fps": np.full(n, 30.0, dtype=np.float32),
        "fmt": fmts,
    }, schema=VIDEO_SCHEMA)


def synth_video_table(n: int, seed: int = 11) -> pa.Table:
    return synth_video_rows(np.arange(n), seed)
