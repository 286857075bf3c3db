"""Image training-prep ops: normalization stats + AR bucketing."""

import numpy as np
import pyarrow as pa
import ray.data

from gdal_drivers_ray import codecs
from gdal_drivers_ray.stages import imageprep as IP


def test_ar_cost_integer_exact_and_ties():
    # exact rung match -> cost 0
    assert IP.ar_cost(512, 512, 256, 256) == 0
    assert IP.ar_cost(448, 576, 448, 576) == 0
    # tie between two rungs resolves to the LOWEST bucket id
    lad = [(256, 256), (512, 512)]
    ab = IP.assign_ar_bucket(np.array([100]), np.array([100]), lad)
    assert ab[0] == 0


def test_assign_ar_bucket_vectorized_matches_scalar():
    lad = IP.default_ladder()
    rng = np.random.default_rng(3)
    w = rng.integers(160, 1025, 200)
    h = rng.integers(160, 897, 200)
    got = IP.assign_ar_bucket(w, h, lad)
    for i in range(200):
        costs = [int(IP.ar_cost(w[i], h[i], bw, bh)) for bw, bh in lad]
        assert got[i] == int(np.argmin(costs))


def test_batch_capacity():
    assert IP.batch_capacity(256, 256, 1 << 20) == 16
    assert IP.batch_capacity(512, 512, 1 << 20) == 4
    assert IP.batch_capacity(4096, 4096, 1 << 20) == 1  # floor at 1


def test_ar_bucket_assign_ranks(ray_session):
    """Distributed rank/batch == single-pass in-memory computation,
    across range-bucket boundaries (n_range_buckets=4 forces multiple
    prefix segments)."""
    n = 500
    idx = np.arange(n, dtype=np.int64)
    w = 160 + (idx * 37) % 865
    h = 160 + (idx * 91) % 737
    meta = ray.data.from_arrow(pa.table({
        "image_id": pa.array([f"img-{i:08d}" for i in idx]),
        "idx": pa.array(idx), "w": pa.array(w), "h": pa.array(h),
    })).repartition(7)
    out = IP.ar_bucket_assign(meta, n_range_buckets=4).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)

    lad = IP.default_ladder()
    ab = IP.assign_ar_bucket(w, h, lad)
    want_rank = np.empty(n, dtype=np.int64)
    for b in np.unique(ab):
        members = np.flatnonzero(ab == b)          # idx-ascending already
        want_rank[members] = np.arange(members.size)
    got = out.set_index("image_id")
    for i in idx:
        key = f"img-{i:08d}"
        assert got.loc[key, "ar_bucket"] == ab[i]
        assert got.loc[key, "rank"] == want_rank[i]
        cap = IP.batch_capacity(*lad[ab[i]], 1 << 20)
        assert got.loc[key, "batch_id"] == want_rank[i] // cap


def test_image_norm_stats_exact(ray_session):
    """Distributed per-fmt moments == straight-line decode loop."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(40):
        px = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        fmt = "png" if i % 2 == 0 else "jpeg"
        rows.append({"bytes": codecs.encode_image(px, fmt), "fmt": fmt})
    ds = ray.data.from_items(rows).repartition(5)
    got = IP.image_norm_stats(ds).to_pandas().set_index("fmt")

    acc = {}
    for r in rows:
        a = codecs.decode_image(r["bytes"]).astype(np.int64)
        st = acc.setdefault(r["fmt"], [0, 0, 0])
        st[0] += a.size
        st[1] += int(a.sum())
        st[2] += int((a * a).sum())
    for fmt, (n, s, s2) in acc.items():
        assert got.loc[fmt, "n_px"] == n
        assert got.loc[fmt, "px_sum"] == s
        assert got.loc[fmt, "px_sumsq"] == s2
        assert got.loc[fmt, "mean_milli"] == s * 1000 // n


def test_psnr_audit_integer_verdict(ray_session):
    """Lossless rows audit sse=0; a synthetic high-error payload counts
    below the 40 dB bar via the integer comparison."""
    from gdal_drivers_ray.stages.imageprep import psnr_audit

    rng = np.random.default_rng(21)
    orig = {}
    rows = []
    for i in range(12):
        px = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        orig[f"im-{i}"] = px
        if i == 5:   # corrupt one: encode different pixels under same id
            enc = codecs.encode_image((px ^ 0x80).astype(np.uint8), "png")
        else:
            enc = codecs.encode_image(px, "png")
        rows.append({"image_id": f"im-{i}", "bytes": enc, "fmt": "png"})
    ds = ray.data.from_items(rows).repartition(3)
    out = psnr_audit(ds, original_of=lambda k: orig[k]).to_pandas()
    assert out.loc[0, "fmt"] == "png"
    assert out.loc[0, "n_images"] == 12
    assert out.loc[0, "n_below_bar"] == 1
    # sse exactly equals the corrupted image's squared error
    d = (orig["im-5"].astype(np.int64) ^ 0x80) - orig["im-5"]
    assert out.loc[0, "sse"] == int((d * d).sum())


def test_ar_cost_rung_invariant_denominator():
    """The comparator is monotone in the TRUE AR distance: identical-AR
    rungs cost the same, and argmin picks the genuinely nearest AR (the
    old bw*bh denominator biased toward wide-bw rungs)."""
    # identical aspect ratios -> identical cost for any image
    assert IP.ar_cost(500, 400, 256, 256) == IP.ar_cost(500, 400, 512, 512)
    # 1142x1000 (AR 1.142): nearest rung is 1:1 (dist .142), not
    # 576x448 (dist .1437) — the old formula picked 576x448
    lad = IP.default_ladder()
    ab = int(IP.assign_ar_bucket(np.array([1142]), np.array([1000]), lad))
    bw, bh = lad[ab]
    assert bw == bh
