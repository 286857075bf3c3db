"""Codec round-trips + fixture determinism (FIXTURES.md F1; BASELINE.json
invariants: png exact, jpeg PSNR >= 40 dB, caption equality)."""

import numpy as np
import pyarrow.parquet as pq

from gdal_drivers_ray import codecs, fixtures


def test_png_roundtrip_exact():
    px = fixtures.make_tile_pixels(7)
    out = codecs.decode_image(codecs.encode_image(px, "png"))
    assert (out == px).all()


def test_jpeg_roundtrip_psnr():
    px = fixtures.make_tile_pixels(13)
    out = codecs.decode_image(codecs.encode_image(px, "jpeg"))
    assert out.shape == px.shape
    assert codecs.psnr(px, out) >= 40.0


def test_gzip_sniff_unwrap():
    import gzip
    px = fixtures.make_tile_pixels(3)
    buf = gzip.compress(codecs.encode_image(px, "png"))
    assert buf[0] == 0x1F
    assert (codecs.decode_image(buf) == px).all()


def test_multichannel_roundtrip():
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    out = codecs.decode_image(codecs.encode_image(px, "png"))
    assert (out == px).all()


def test_phash_duplicates_and_hamming():
    a = fixtures.make_tile_pixels(1)
    b = fixtures.make_tile_pixels(2)
    assert codecs.phash64(a) == codecs.phash64(a.copy())
    ha, hb = codecs.phash64(a), codecs.phash64(b)
    d = codecs.hamming64([ha], [hb])
    assert d[0] >= 0
    assert codecs.hamming64([ha], [ha])[0] == 0
    # jpeg quantization must not move the phash (near-dup robustness)
    aq = codecs.decode_image(codecs.encode_image(a, "jpeg"))
    assert codecs.hamming64([codecs.phash64(aq)], [ha])[0] <= 4


def test_images_table_schema_and_dups(tmp_path):
    t = fixtures.make_images_table(200)
    assert t.column_names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert t.num_rows == 200
    ph = t["phash"].to_pylist()
    assert ph[97] == ph[0]          # injected duplicate
    cap = t["caption"].to_pylist()
    lod = fixtures.lod_for_count(200)
    z, x, y = fixtures.tile_addr_of(5, lod)
    assert cap[5].startswith(f"tile {z}/{x}/{y} ")
    # determinism
    t2 = fixtures.make_images_table(200)
    assert t.equals(t2)
    # idempotent writer
    p = str(tmp_path / "img.parquet")
    fixtures.write_images_parquet(p, 200)
    fixtures.write_images_parquet(p, 200)
    assert fixtures.count_rows(p) == 200
