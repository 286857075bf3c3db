"""Image training-data preparation ops: corpus normalization statistics
and aspect-ratio bucketing with fixed-size batch assignment.

No counterpart exists in the reference (its rasters are single-dataset);
these are the engine-side additions an image-training pipeline needs
between "a table of encoded images" and "model batches":

- ``image_norm_stats``: the classic per-channel dataset-normalization
  pass (mean/std over every decoded pixel). One decode per image in a
  task-pool ``map_batches``, per-batch PARTIAL sums keyed by format, then
  a groupby over a table with one row per (fmt, batch) — the full
  3*10^12-pixel reduction at 10^12 images moves only a metadata-scale
  exchange. Sums are int64-exact for uint8 pixels (< 2^63 up to ~10^14
  pixels per partial; the groupby Sum overflows only past ~10^5 TB of
  pixels per format, at which point the partials switch to per-key
  sharding for free because the groupby is already keyed).

- ``ar_bucket_assign``: aspect-ratio bucketing (the SDXL-style training
  discipline: group images by nearest aspect-ratio rung of a resolution
  ladder, feed fixed-size batches per rung). Bucket choice is
  integer-exact (see ``_ar_cost``), so the distributed plan and any SQL
  re-derivation agree bit-for-bit. The batch index needs each image's
  RANK inside its bucket in a global deterministic order — a distributed
  prefix sum, same discipline as stages/pack.py: range-bucket the order
  key, count per (ar, range) group, driver-prefix the bounded count
  table, then per-group local ranks. Nothing driver-side grows with the
  corpus; the prefix table is O(n_ladder * n_range_buckets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .. import codecs

# cost scale for the integer-exact nearest-aspect-ratio criterion
_AR_COST_SCALE = 1_000_000


def default_ladder() -> list[tuple[int, int]]:
    """A small SDXL-style resolution ladder: (bucket_w, bucket_h)."""
    return [(256, 256), (512, 512), (448, 576), (576, 448),
            (384, 640), (640, 384)]


def ar_cost(w, h, bw: int, bh: int):
    """Integer distance between an image's aspect ratio w/h and a ladder
    rung bw/bh: |w*bh - h*bw| * SCALE // bh. The true distance is
    |w/h - bw/bh| = |w*bh - h*bw| / (h*bh); h is constant per image, so
    the rung-correct denominator is bh ALONE — dividing by bw*bh (the
    old formula) biased argmin toward wide-bw rungs and gave two
    identical-AR rungs different costs. Integer division makes the SAME
    formula reproducible in SQL (no float ulp ties); int64-safe for
    dimensions up to ~10^6 px per side."""
    w = np.asarray(w, dtype=np.int64)
    h = np.asarray(h, dtype=np.int64)
    return np.abs(w * bh - h * bw) * _AR_COST_SCALE // bh


def assign_ar_bucket(w, h, ladder: list[tuple[int, int]]) -> np.ndarray:
    """Vectorized nearest-rung assignment; ties break to the LOWEST
    bucket id (argmin over the stacked cost matrix)."""
    costs = np.stack([ar_cost(w, h, bw, bh) for bw, bh in ladder], axis=0)
    return costs.argmin(axis=0).astype(np.int64)


def batch_capacity(bw: int, bh: int, budget_px: int) -> int:
    """Images per training batch for a rung: the largest count whose
    total pixels fit the budget (>= 1 so every rung is schedulable)."""
    return max(1, budget_px // (bw * bh))


def image_norm_stats(images: ray.data.Dataset, *,
                     bytes_col: str = "bytes",
                     fmt_col: str = "fmt") -> ray.data.Dataset:
    """-> one row per format: (fmt, n_px, px_sum, px_sumsq, mean_milli).

    Decodes every image (gdal_drivers_ray.codecs: real PNG-class lossless
    and quantized-JPEG-class lossy payloads) and reduces to exact integer
    pixel-population moments, the inputs of the dataset normalization
    transform (mean/std). `mean_milli` = floor(1000 * mean) keeps the
    output hash-stable.
    """
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        acc: dict[str, list[int]] = {}
        fmts = b[fmt_col].to_pylist()
        for i in range(b.num_rows):
            px = codecs.decode_image(b[bytes_col][i].as_py())
            a = px.astype(np.int64, copy=False)
            st = acc.setdefault(fmts[i], [0, 0, 0])
            st[0] += int(a.size)
            st[1] += int(a.sum())
            st[2] += int((a * a).sum())
        keys = sorted(acc)
        # explicit string type: an EMPTY batch would otherwise infer a
        # null-typed column and break downstream schema unification
        return pa.table({
            "fmt": pa.array(keys, type=pa.string()),
            "n_px": pa.array([acc[k][0] for k in keys], type=pa.int64()),
            "px_sum": pa.array([acc[k][1] for k in keys], type=pa.int64()),
            "px_sumsq": pa.array([acc[k][2] for k in keys],
                                 type=pa.int64()),
        })

    totals = images.map_batches(partial, batch_format="pyarrow") \
        .groupby("fmt").aggregate(Sum("n_px", alias_name="n_px"),
                                  Sum("px_sum", alias_name="px_sum"),
                                  Sum("px_sumsq", alias_name="px_sumsq"))

    def finish(b: pa.Table) -> pa.Table:
        n = b["n_px"].to_numpy().astype(np.int64)
        s = b["px_sum"].to_numpy().astype(np.int64)
        return b.append_column(
            "mean_milli", pa.array(s * 1000 // np.maximum(n, 1),
                                   type=pa.int64()))

    return totals.map_batches(finish, batch_format="pyarrow",
                              batch_size=None)


def ar_bucket_assign(meta: ray.data.Dataset, *,
                     ladder: list[tuple[int, int]] | None = None,
                     budget_px: int = 1 << 20,
                     id_col: str = "image_id",
                     order_col: str = "idx",
                     w_col: str = "w", h_col: str = "h",
                     n_range_buckets: int | None = None
                     ) -> ray.data.Dataset:
    """-> (image_id, ar_bucket, bucket_w, bucket_h, rank, batch_id).

    `rank` is the image's 0-based position inside its aspect-ratio bucket
    in ascending `order_col` order; `batch_id` = rank // capacity(rung).
    meta must be the NARROW metadata table (id, order, w, h) — pixels
    never enter this op. The rank comes from the shared two-pass
    prefix-sum primitive (stages/mix.distributed_rank) keyed on the
    assigned bucket.
    """
    from .mix import distributed_rank

    lad = ladder if ladder is not None else default_ladder()
    caps = np.array([batch_capacity(bw, bh, budget_px)
                     for bw, bh in lad], dtype=np.int64)
    bws = np.array([bw for bw, _ in lad], dtype=np.int64)
    bhs = np.array([bh for _, bh in lad], dtype=np.int64)

    def keyed(b: pa.Table) -> pa.Table:
        ab = assign_ar_bucket(b[w_col].to_numpy(), b[h_col].to_numpy(), lad)
        return pa.table({
            "image_id": b[id_col],
            "ord": pa.array(b[order_col].to_numpy().astype(np.int64)),
            "ar_bucket": pa.array(ab),
        })

    narrow = meta.map_batches(keyed, batch_format="pyarrow",
                              batch_size=None)
    ranked = distributed_rank(narrow, part_col="ar_bucket",
                              order_col="ord",
                              n_range_buckets=n_range_buckets)

    def finish(b: pa.Table) -> pa.Table:
        ab = b["ar_bucket"].to_numpy().astype(np.int64)
        rank = b["rank"].to_numpy().astype(np.int64)
        return pa.table({
            "image_id": b["image_id"],
            "ar_bucket": pa.array(ab),
            "bucket_w": pa.array(bws[ab]),
            "bucket_h": pa.array(bhs[ab]),
            "rank": pa.array(rank),
            "batch_id": pa.array(rank // caps[ab]),
        })

    return ranked.map_batches(finish, batch_format="pyarrow",
                              batch_size=None)


def psnr_audit(images: ray.data.Dataset, *, original_of,
               id_col: str = "image_id", bytes_col: str = "bytes",
               fmt_col: str = "fmt",
               min_db: float = 40.0) -> ray.data.Dataset:
    """Decoded-pixel fidelity audit (the north rule's PSNR>=40dB bar for
    lossy formats): decode every payload, compare against the ground
    truth `original_of(image_id) -> ndarray`, and aggregate per format as
    EXACT integers — n_px, the summed squared error, and the count of
    images below the bar. PSNR >= min_db is evaluated without floats:
    sse * 10^(min_db/10) <= peak^2 * n_px, precomputed as an integer
    scale (exact for the default 40 dB / uint8 peak: sse*10000 <=
    65025*n). A float log10 never enters the comparison, so the verdict
    hashes identically everywhere.
    """
    from ray.data.aggregate import Sum

    scale = int(round(10 ** (min_db / 10.0)))   # 40 dB -> 10000
    peak2 = 255 * 255

    def partial(b: pa.Table) -> pa.Table:
        acc: dict[str, list[int]] = {}
        fmts = b[fmt_col].to_pylist()
        for i in range(b.num_rows):
            px = codecs.decode_image(b[bytes_col][i].as_py())
            ref = original_of(b[id_col][i].as_py())
            d = px.astype(np.int64) - ref.astype(np.int64)
            sse = int((d * d).sum())
            n = int(d.size)
            st = acc.setdefault(fmts[i], [0, 0, 0, 0])
            st[0] += 1
            st[1] += n
            st[2] += sse
            st[3] += int(sse * scale > peak2 * n)   # below the dB bar
        keys = sorted(acc)
        return pa.table({
            "fmt": pa.array(keys, type=pa.string()),
            "n_images": pa.array([acc[k][0] for k in keys], pa.int64()),
            "n_px": pa.array([acc[k][1] for k in keys], pa.int64()),
            "sse": pa.array([acc[k][2] for k in keys], pa.int64()),
            "n_below_bar": pa.array([acc[k][3] for k in keys],
                                    pa.int64()),
        })

    return images.map_batches(partial, batch_format="pyarrow") \
        .groupby("fmt").aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("n_px", alias_name="n_px"),
            Sum("sse", alias_name="sse"),
            Sum("n_below_bar", alias_name="n_below_bar"))
