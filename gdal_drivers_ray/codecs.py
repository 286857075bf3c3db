"""Deterministic image codecs + perceptual hash.

The container has no PIL / OpenCV, so real PNG/JPEG codecs are replaced by
deterministic stand-ins with the same *shape* of behavior:

- ``png``  — lossless: zlib over raw pixels.
- ``jpeg`` — lossy: uniform quantization (step 4 -> PSNR ≈ 46 dB, above the
  40 dB gate of BASELINE.json) + zlib. Deterministic, vectorized.

Both carry a small self-describing header so decode needs no side channel.
A gzip-wrapped payload is sniffed by its 0x1f magic byte and unwrapped first,
mirroring the reference's mbtiles blob handling
(/root/reference/gdal-drivers/detail/mbtiles.cpp:214-224).

Swapping in real codecs later = replacing ``encode``/``decode`` bodies; the
Ray plumbing (binary column in, binary/tensor column out, actor-pool decode
stage) is unchanged.
"""

from __future__ import annotations

import gzip
import struct
import zlib

import numpy as np

_MAGIC_PNG = b"GRPN"
_MAGIC_JPG = b"GRJP"

_DTYPES = {0: np.uint8, 1: np.uint16, 2: np.int16, 3: np.uint32,
           4: np.int32, 5: np.float32, 6: np.float64}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}

_JPEG_SHIFT = 2  # quantization: drop 2 LSBs -> max abs error 3, PSNR ~46 dB


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """Encode an (H, W) or (H, W, C) array. fmt in {"png", "jpeg"}."""
    arr = np.ascontiguousarray(arr)
    if arr.ndim == 2:
        h, w, c = arr.shape[0], arr.shape[1], 1
    elif arr.ndim == 3:
        h, w, c = arr.shape
    else:
        raise ValueError(f"bad image ndim {arr.ndim}")
    if h > 0xFFFF or w > 0xFFFF or c > 0xFF:
        # the header packs <HHBB — fail clearly at the API boundary, not
        # with a bare struct.error inside the packer
        raise ValueError(f"image {h}x{w}x{c} exceeds the codec header "
                         "limits (65535 x 65535 x 255)")
    code = _DTYPE_CODES[arr.dtype]
    if fmt == "png":
        payload = zlib.compress(arr.tobytes(), 6)
        magic = _MAGIC_PNG
    elif fmt == "jpeg":
        if arr.dtype != np.uint8:
            raise ValueError("jpeg stand-in supports uint8 only")
        q = (arr >> _JPEG_SHIFT).astype(np.uint8)
        payload = zlib.compress(q.tobytes(), 6)
        magic = _MAGIC_JPG
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    return magic + struct.pack("<HHBB", h, w, c, code) + payload


def decode_image(buf: bytes) -> np.ndarray:
    """Decode bytes -> ndarray; gunzips first when gzip-magic (0x1f) is seen
    (ref: detail/mbtiles.cpp:214-224 sniff-and-decompress)."""
    if buf[:1] == b"\x1f":
        buf = gzip.decompress(buf)
    magic, header, payload = buf[:4], buf[4:10], buf[10:]
    # validate magic + header BEFORE decompressing: a foreign buffer must
    # fail with the documented ValueError, not a zlib.error from blindly
    # inflating attacker-shaped bytes
    if magic not in (_MAGIC_PNG, _MAGIC_JPG):
        raise ValueError(f"bad magic {magic!r}")
    if len(header) < 6:
        raise ValueError("truncated image header")
    h, w, c, code = struct.unpack("<HHBB", header)
    dtype = _DTYPES[code]
    raw = np.frombuffer(zlib.decompress(payload), dtype=dtype)
    if magic == _MAGIC_JPG:
        raw = (raw.astype(np.uint8) << _JPEG_SHIFT)
        # mid-rise reconstruction: +2 centers each 4-wide bin, halving error
        raw = (raw + (1 << (_JPEG_SHIFT - 1))).astype(np.uint8)
    arr = raw.reshape((h, w) if c == 1 else (h, w, c))
    return arr


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual hash: grayscale -> 8×8 block means -> bits above the
    median. Deterministic; robust to the jpeg stand-in's quantization."""
    a = arr.astype(np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
    h, w = a.shape
    # crop to a multiple of 8 then 8x8 block-mean
    hh, ww = (h // 8) * 8, (w // 8) * 8
    a = a[:hh, :ww].reshape(8, hh // 8, 8, ww // 8).mean(axis=(1, 3))
    bits = (a > np.median(a)).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v  # signed int64 range


def hamming64(a, b):
    """Vectorized Hamming distance between int64 hash arrays: xor, view the
    8 bytes, popcount via unpackbits."""
    x = np.asarray(a, dtype=np.int64) ^ np.asarray(b, dtype=np.int64)
    by = np.ascontiguousarray(x).view(np.uint8).reshape(*x.shape, 8)
    return np.unpackbits(by, axis=-1).sum(axis=-1).astype(np.int64)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """float64 samples in [-1, 1] -> 16-bit PCM WAV bytes (stdlib wave —
    a REAL container format, no external codec library needed)."""
    import io
    import wave

    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = np.round(pcm * 32767.0).astype("<i2")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm16.tobytes())
    return bio.getvalue()


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 mono samples in [-1, 1], sample_rate).
    Supports 8-bit unsigned and 16/32-bit signed PCM; multi-channel input
    averages to mono."""
    import io
    import wave

    with wave.open(io.BytesIO(buf), "rb") as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2) video container — the uncompressed interchange format
# ffmpeg/mjpegtools read and write. Pure-stdlib parse: a text stream header
# ('YUV4MPEG2 W.. H.. F<num>:<den> .. C<space>\n') followed by raw
# 'FRAME[ params]\n' + planar pixel data per frame. Implemented from the
# public format description (mjpegtools yuv4mpeg(5)); supports mono
# (Cmono, Y plane only) and 4:2:0 (C420*, Y + quarter-size U,V planes).
# ---------------------------------------------------------------------------

def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (30, 1),
               chroma: str = "mono") -> bytes:
    """(n, h, w) uint8 luma frames -> Y4M bytes. chroma='mono' writes Y
    only; '420jpeg' appends flat U=V=128 quarter planes (gray)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise ValueError("frames must be (n, h, w) uint8")
    n, h, w = frames.shape
    if chroma not in ("mono", "420jpeg"):
        raise ValueError(f"unsupported chroma {chroma!r}")
    if chroma == "420jpeg" and (h % 2 or w % 2):
        raise ValueError("420 chroma needs even dimensions")
    head = (f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 "
            f"C{chroma}\n").encode("ascii")
    parts = [head]
    uv = (np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
          if chroma == "420jpeg" else b"")
    for i in range(n):
        parts.append(b"FRAME\n")
        parts.append(frames[i].tobytes())
        if uv:
            parts.append(uv); parts.append(uv)
    return b"".join(parts)


def _y4m_header(buf: bytes) -> tuple[dict, int]:
    end = buf.index(b"\n")
    fields = buf[:end].split(b" ")
    if fields[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    p: dict = {"C": "420jpeg"}             # spec default chroma
    for f in fields[1:]:
        if not f:
            continue
        tag, val = chr(f[0]), f[1:].decode("ascii")
        if tag in "WH":
            p[tag] = int(val)
        elif tag == "F":
            num, den = val.split(":")
            p["F"] = (int(num), int(den))
        elif tag == "C":
            p["C"] = val
    if "W" not in p or "H" not in p:
        raise ValueError("Y4M header missing W/H")
    return p, end + 1


def y4m_info(buf: bytes) -> tuple[int, int, int, float]:
    """(w, h, n_frames, fps) from the container, without copying frames."""
    p, off = _y4m_header(buf)
    w, h = p["W"], p["H"]
    fsz = _y4m_frame_size(p)
    n = 0
    while off < len(buf):
        off = buf.index(b"\n", off) + 1 + fsz   # FRAME[ params]\n + planes
        if off > len(buf):
            break   # truncated trailing frame: not decodable, not counted
        n += 1
    num, den = p.get("F", (30, 1))
    return w, h, n, num / max(den, 1)


def _y4m_frame_size(p: dict) -> int:
    w, h = p["W"], p["H"]
    c = p["C"]
    if c == "mono":
        return w * h
    if c.startswith("420"):
        return w * h + 2 * ((w // 2) * (h // 2))
    raise ValueError(f"unsupported Y4M chroma {c!r}")


def decode_y4m_frames(buf: bytes, every_k: int = 1):
    """Yield (frame_idx, luma (h, w) uint8) for every k-th frame. Frames
    between samples are SKIPPED by offset arithmetic, not decoded — the
    raw container makes stride sampling O(sampled), not O(total)."""
    p, off = _y4m_header(buf)
    w, h = p["W"], p["H"]
    fsz = _y4m_frame_size(p)
    mv = memoryview(buf)
    idx = 0
    while off < len(buf):
        data_at = buf.index(b"\n", off) + 1
        if idx % every_k == 0:
            luma = np.frombuffer(mv[data_at:data_at + w * h],
                                 dtype=np.uint8).reshape(h, w)
            yield idx, luma
        off = data_at + fsz
        idx += 1
