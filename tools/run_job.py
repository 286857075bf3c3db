"""Batch job entry point — the `ray job submit` surface.

    ray job submit --working-dir /root/repo -- \
        python tools/run_job.py --input <images.parquet> --out /tmp/out \
        [--lod N] [--resume]

Runs the flagship pipeline (decode -> invariants -> cell assignment) with
resumable partitioned output: tiles are bucketed by cell-id prefix into
`--parts` partitions, finished partitions carry a manifest entry with
row-count lineage, and `--resume` drops already-done partitions from the
*input* before any decode work runs. A job summary JSON (throughput,
per-partition lineage, config) is written next to the output.

Owns a Ray session only when standalone (guarded init, per the driver
contract); under `ray job submit` the cluster connection already exists.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def code_version() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=10).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="images parquet path")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--lod", type=int, default=None)
    ap.add_argument("--parts", type=int, default=64,
                    help="number of output partitions (cell-id buckets)")
    ap.add_argument("--resume", action="store_true",
                    help="skip partitions already marked done in the manifest")
    ap.add_argument("--batch-size", type=int, default=256)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from gdal_drivers_ray import fixtures
    from gdal_drivers_ray.pipelines import flagship
    from gdal_drivers_ray.state import checkpoint as ckpt

    lod = args.lod
    if lod is None:
        lod = fixtures.lod_for_count(fixtures.count_rows(args.input))

    from gdal_drivers_ray.grid import cell_id
    from gdal_drivers_ray.stages.decode import DecodeImages

    t0 = time.perf_counter()
    n_parts = args.parts

    def add_part(b: pa.Table) -> pa.Table:
        # partition = cell-id bucket, derived from the INPUT row (image_id
        # index -> tile address -> Morton cell) so `--resume` prunes
        # finished partitions BEFORE any decode work runs. Cell ids are
        # Morton-interleaved: contiguous buckets keep spatial locality.
        idx = np.asarray([int(s.rsplit("-", 1)[1])
                          for s in b["image_id"].to_pylist()], dtype=np.int64)
        side = 1 << lod
        cid = cell_id(lod, idx % side, (idx // side) % side)
        part = (cid % n_parts).astype(np.int64)
        return b.append_column("part", pa.array(part))

    ds = ray.data.read_parquet(args.input) \
                 .map_batches(add_part, batch_format="pyarrow")

    done_before = sorted(ckpt.done_partitions(args.out))
    if args.resume and done_before:
        ds = ckpt.filter_done(ds, args.out)

    def re_part(b: pa.Table) -> pa.Table:
        # DecodeImages emits a fresh feature table; re-derive the identical
        # partition id from its cell column (cell % n_parts == input part)
        part = (b["cell"].to_numpy() % n_parts).astype(np.int64)
        return b.append_column("part", pa.array(part))

    tiles = flagship.check_invariants(
        ds.map_batches(DecodeImages(lod=lod), batch_format="pyarrow",
                       batch_size=args.batch_size)) \
        .map_batches(re_part, batch_format="pyarrow")

    entries = ckpt.write_partitioned(tiles, args.out)
    wall = time.perf_counter() - t0
    rows = sum(e["rows"] for e in entries)

    # per-stage throughput metrics (north-rule: lineage + throughput):
    # operator wall/cpu totals from Ray Data's own stats
    stage_stats = []
    try:
        for line in tiles.stats().splitlines():
            line = line.strip()
            if line.startswith("Operator ") and " in " in line:
                stage_stats.append(line[:200])
    except Exception:
        pass

    # explicit partition-size accounting (north-rule): skew is visible in
    # the summary; a salted re-split (stages/skew.py) is warranted when
    # max/mean diverges
    sizes = sorted((e["rows"] for e in entries), reverse=True)
    summary = {
        "input": args.input,
        "out": args.out,
        "lod": lod,
        "partition_rows": {"max": sizes[0] if sizes else 0,
                           "min": sizes[-1] if sizes else 0,
                           "mean": round(sum(sizes) / len(sizes), 1)
                                   if sizes else 0,
                           "top8": sizes[:8]},
        "code_version": code_version(),
        "resumed": bool(args.resume),
        "parts_done_before": done_before,
        "parts_written": [e["part"] for e in entries],
        "rows_written": rows,
        "wall_s": round(wall, 3),
        "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
        "stage_stats": stage_stats,
        "ts": time.time(),
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "_job_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
