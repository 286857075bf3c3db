"""WebDataset-style sharded tar sink + reader for image+caption training
corpora.

The de-facto exchange format for image training data is a directory of
tar shards, each member pair `<key>.<fmt>` (payload) + `<key>.txt`
(caption), consumed sequentially by the training loader (Aizman et al.,
"High Performance I/O For Large Scale Deep Learning" — the WebDataset
convention; implemented here from the convention, stdlib tarfile only).

Scale design mirrors sources/mbtiles.write_mbtiles_shards:
- shard assignment is a deterministic function of the sample's order key
  (`order // samples_per_shard`), so a re-run reproduces byte-identical
  shards and a failed run resumes by skipping existing files;
- each shard is written by exactly ONE reducer task (groupby(shard) ->
  map_groups), atomically (tmp + rename); the driver never sees pixels;
- tar members are emitted in sorted order-key order with zeroed
  mtime/uid/gid, so shard bytes are reproducible bit-for-bit;
- the returned manifest (one row per shard: counts + byte totals READ
  BACK from the written tar) is metadata-scale and is what the SQL
  oracle cross-checks against the source parquet.
"""

from __future__ import annotations

import io
import os
import tarfile

import numpy as np
import pyarrow as pa
import ray
import ray.data

_TAR_SUFFIX = ".tar"


def _tar_member(name: str, payload: bytes) -> tarfile.TarInfo:
    ti = tarfile.TarInfo(name=name)
    ti.size = len(payload)
    ti.mtime = 0
    ti.uid = ti.gid = 0
    ti.uname = ti.gname = ""
    return ti


def write_wds_shards(images: ray.data.Dataset, out_dir: str, *,
                     samples_per_shard: int = 512,
                     id_col: str = "image_id",
                     order_col: str = "idx",
                     bytes_col: str = "bytes",
                     fmt_col: str = "fmt",
                     caption_col: str = "caption") -> ray.data.Dataset:
    """-> manifest Dataset (shard, path, n_samples, payload_bytes,
    caption_bytes), the byte totals read back from the written tars.

    `order_col` must be an int64 sample index (unique, dense-ish): the
    shard key is `order // samples_per_shard`, members sort by it.
    Existing shard files are kept (resume semantics) — delete the
    directory for a clean rebuild.
    """
    os.makedirs(out_dir, exist_ok=True)

    def add_shard(b: pa.Table) -> pa.Table:
        o = b[order_col].to_numpy().astype(np.int64)
        return b.append_column("_shard", pa.array(o // samples_per_shard))

    def write_shard(g: pa.Table) -> pa.Table:
        if "_shard" not in g.column_names or g.num_rows == 0:
            # empty/column-less probe block (the write_cells guard in
            # stages/ann.py): a typed empty manifest, not an IndexError
            return pa.table({"shard": pa.array([], pa.int64()),
                             "path": pa.array([], pa.string()),
                             "n_samples": pa.array([], pa.int64()),
                             "payload_bytes": pa.array([], pa.int64()),
                             "caption_bytes": pa.array([], pa.int64())})
        shard = int(g["_shard"][0].as_py())
        path = os.path.join(out_dir, f"shard-{shard:06d}{_TAR_SUFFIX}")
        if not os.path.exists(path):
            order = np.argsort(g[order_col].to_numpy(), kind="stable")
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w") as tf:
                for i in order.tolist():
                    key = g[id_col][i].as_py()
                    payload = g[bytes_col][i].as_py()
                    fmt = g[fmt_col][i].as_py()
                    cap = g[caption_col][i].as_py().encode("utf-8")
                    tf.addfile(_tar_member(f"{key}.{fmt}", payload),
                               io.BytesIO(payload))
                    tf.addfile(_tar_member(f"{key}.txt", cap),
                               io.BytesIO(cap))
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(buf.getvalue())
            os.replace(tmp, path)
        # manifest from the WRITTEN file, not the inputs: a sink bug
        # (truncated member, wrong encoding) fails the oracle compare
        n = 0
        pbytes = 0
        cbytes = 0
        with tarfile.open(path, mode="r") as tf:
            for m in tf.getmembers():
                if m.name.endswith(".txt"):
                    cbytes += m.size
                else:
                    pbytes += m.size
                    n += 1
        return pa.table({
            "shard": pa.array([shard], type=pa.int64()),
            "path": pa.array([path]),
            "n_samples": pa.array([n], type=pa.int64()),
            "payload_bytes": pa.array([pbytes], type=pa.int64()),
            "caption_bytes": pa.array([cbytes], type=pa.int64()),
        })

    return images.map_batches(add_shard, batch_format="pyarrow",
                              batch_size=None) \
        .groupby("_shard").map_groups(write_shard, batch_format="pyarrow")


def read_wds_shards(shard_dir: str,
                    concurrency: int | None = None) -> ray.data.Dataset:
    """Read a write_wds_shards directory back as (image_id, bytes, fmt,
    caption) rows — one task per shard (the training-loader access
    pattern: shards stream independently)."""
    paths = sorted(os.path.join(shard_dir, f)
                   for f in os.listdir(shard_dir)
                   if f.endswith(_TAR_SUFFIX))

    def load(b: pa.Table) -> pa.Table:
        ids, blobs, fmts, caps = [], [], [], []
        for p in b["path"].to_pylist():
            samples: dict[str, dict] = {}
            with tarfile.open(p, mode="r") as tf:
                for m in tf.getmembers():
                    key, ext = m.name.rsplit(".", 1)
                    data = tf.extractfile(m).read()
                    d = samples.setdefault(key, {})
                    if ext == "txt":
                        d["caption"] = data.decode("utf-8")
                    else:
                        d["bytes"] = data
                        d["fmt"] = ext
            for key in sorted(samples):
                d = samples[key]
                ids.append(key)
                blobs.append(d["bytes"])
                fmts.append(d["fmt"])
                caps.append(d["caption"])
        return pa.table({
            "image_id": pa.array(ids),
            "bytes": pa.array(blobs, type=pa.large_binary()),
            "fmt": pa.array(fmts),
            "caption": pa.array(caps),
        })

    return ray.data.from_arrow(pa.table({"path": pa.array(paths)})) \
        .repartition(max(len(paths), 1)) \
        .map_batches(load, batch_format="pyarrow", batch_size=None,
                     concurrency=concurrency)
