"""Resumable partitioned output with per-partition lineage.

The reference has nothing to resume (stateless virtual datasets); for a
100 TB batch job the north rule requires per-partition checkpoints. Layout:

    out_dir/
      part=<k>/...parquet        (written by write_parquet(partition_cols))
      _manifest/part-<k>.json    (atomic rename; presence == partition done)

Resume = list the manifest dir (tiny), broadcast the done-set, and filter
finished partitions out of the *input* before any decode/shuffle work runs,
so a restarted job only pays for unfinished partitions.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import ray


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def done_partitions(out_dir: str) -> set[int]:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for f in os.listdir(d):
        if f.startswith("part-") and f.endswith(".json"):
            out.add(int(f[5:-5]))
    return out


def mark_done(out_dir: str, part: int, meta: dict) -> None:
    """Atomic write-then-rename, fsync'd (file + directory): the entry is
    durable once this returns, so a crash never leaves a half manifest.
    Scope honestly stated: the PARQUET data is written by Ray's writer
    and is not fsynced here, so a power loss can still lose data a
    journaled rename already advertised — on local filesystems pair this
    with mount-level barriers, and on object stores (the 100 TB target)
    PUT visibility already implies durability."""
    d = manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".part-{part}.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"part": part, "ts": time.time(), **meta}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(d, f"part-{part}.json"))
    dfd = os.open(d, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def filter_done(ds: "ray.data.Dataset", out_dir: str,
                part_col: str = "part") -> "ray.data.Dataset":
    """Drop rows whose partition already has a manifest entry. The done-set
    is broadcast once via ray.put and read inside each filter task (no
    per-batch reshipping)."""
    done = done_partitions(out_dir)
    if not done:
        return ds
    ref = ray.put(sorted(done))  # small; shipped once into the object store

    def drop(batch: pa.Table) -> pa.Table:
        import numpy as np
        done_arr = np.asarray(ray.get(ref), dtype=np.int64)
        parts = batch[part_col].to_numpy()
        keep = ~np.isin(parts, done_arr)
        return batch.filter(pa.array(keep))

    return ds.map_batches(drop, batch_format="pyarrow")


def write_partitioned(ds: "ray.data.Dataset", out_dir: str,
                      part_col: str = "part") -> list[dict]:
    """Write `ds` partitioned by `part_col`, then record one manifest entry
    per partition with row-count lineage.

    Single pipeline execution: row counts come from the written parquet
    FOOTERS (metadata-only, no data re-read, no second pass), so the 100 TB
    stream is consumed exactly once. Only partitions without an existing
    manifest entry are (re)counted and marked."""
    import glob

    import pyarrow.parquet as pq

    import shutil

    already = done_partitions(out_dir)
    # crash hygiene: a prior run that died mid-write leaves part=k data
    # WITHOUT a manifest entry; appending to it would double rows and the
    # footer count would bless the inflated partition. Remove every
    # un-manifested partition dir before writing.
    for d in glob.glob(os.path.join(out_dir, f"{part_col}=*")):
        try:
            p = int(os.path.basename(d).split("=", 1)[1])
        except ValueError:
            continue
        if p not in already:
            shutil.rmtree(d, ignore_errors=True)
    # manifested partitions are AUTHORITATIVE: filter their rows out of
    # the input here (not only in the caller's filter_done) — otherwise
    # an unfiltered re-run appends duplicate files into finished dirs
    # and the stale manifest blesses the doubled rows
    if already:
        ds = filter_done(ds, out_dir, part_col)
    ds.write_parquet(out_dir, partition_cols=[part_col])
    entries = []
    for d in sorted(glob.glob(os.path.join(out_dir, f"{part_col}=*"))):
        try:
            p = int(os.path.basename(d).split("=", 1)[1])
        except ValueError:
            continue
        if p in already:
            continue
        rows = sum(pq.read_metadata(f).num_rows
                   for f in glob.glob(os.path.join(d, "*.parquet")))
        meta = {"rows": rows}
        mark_done(out_dir, p, meta)
        entries.append({"part": p, **meta})
    return entries


def compact_parquet(src_dir: str, out_dir: str, *,
                    rows_per_file: int = 1_000_000) -> dict:
    """Small-file compaction: rewrite a parquet directory (e.g. the output
    of many checkpointed partitions or a long streaming run) into
    ~rows_per_file-sized files. Storage maintenance the reference never
    needed (virtual datasets) but a 100 TB resumable job produces —
    thousands of small part files slow every later read's task fan-out
    (measured this round: block count following file count made a join 4x
    slower purely on exchange overhead).

    File count is sized from parquet METADATA (a driver-side footer scan,
    no data read); the rewrite is one streaming read -> repartition ->
    write; the swap is atomic (tmp dir + os.replace), so a crashed
    compaction never destroys the source contract at ``out_dir``.
    Compacting in place (src_dir == out_dir) is refused: the atomic swap
    would race the files being read."""
    import math

    import pyarrow.parquet as pq
    import ray.data

    if os.path.abspath(src_dir) == os.path.abspath(out_dir):
        raise ValueError("compact_parquet: src_dir == out_dir (the atomic "
                         "swap would race the streaming read); write to a "
                         "sibling dir and rotate")
    # Recover from a crash inside a previous rotation: if out_dir vanished
    # between its os.replace(out_dir, .compact-old) and the promotion of
    # .compact-tmp, the old contents still live under .compact-old —
    # restore them before compacting so out_dir is never silently lost.
    _old = out_dir + ".compact-old"
    if not os.path.exists(out_dir) and os.path.exists(_old):
        os.replace(_old, out_dir)
    # recurse: write_partitioned's hive layout (part=k/ subdirs) is the
    # advertised input, and its files are never at the top level. The
    # _manifest dir and rotation scratch dirs are not data.
    files = []
    for root, dirs, names in os.walk(src_dir):
        dirs[:] = [d for d in dirs
                   if d != "_manifest" and not d.startswith(".")]
        files += [os.path.join(root, f) for f in names
                  if f.endswith(".parquet")]
    files.sort()
    if not files:
        raise ValueError(f"no parquet files under {src_dir!r}")
    total_rows = sum(pq.read_metadata(f).num_rows for f in files)
    n_out = max(1, math.ceil(total_rows / rows_per_file))

    tmp = out_dir + ".compact-tmp"
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    ray.data.read_parquet(files).repartition(n_out).write_parquet(tmp)
    # Rotate, don't delete-then-rename: a crash between rmtree and the
    # rename would leave the old contents unrecoverable. There is still a
    # window between the two os.replace calls where out_dir is missing,
    # but the contents survive in .compact-old and the entry guard above
    # restores them on the next call.
    old = out_dir + ".compact-old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(out_dir):
        os.replace(out_dir, old)
    os.replace(tmp, out_dir)
    shutil.rmtree(old, ignore_errors=True)
    return {"files_in": len(files), "files_out": len(os.listdir(out_dir)),
            "rows": total_rows}
