"""Job entry: checkpointed partitioned output + resume pruning.

Runs tools/run_job.py in subprocesses (each owns its Ray session, like a
real `ray job submit` invocation)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "run_job.py"), *args],
        capture_output=True, text=True, timeout=300, cwd=ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_job_write_then_partial_resume(tmp_path):
    from gdal_drivers_ray import fixtures

    inp = fixtures.images_path_for("/root/testdata/sf0.001")
    out_dir = str(tmp_path / "job_out")

    s1 = _run(["--input", inp, "--out", out_dir, "--parts", "8"])
    assert s1["rows_written"] == 1000
    assert s1["parts_written"] == list(range(8))
    assert os.path.exists(os.path.join(out_dir, "_job_summary.json"))

    # full resume: nothing recomputed
    s2 = _run(["--input", inp, "--out", out_dir, "--parts", "8", "--resume"])
    assert s2["rows_written"] == 0 and s2["parts_written"] == []

    # simulate a failed partition: drop its manifest + data
    os.unlink(os.path.join(out_dir, "_manifest", "part-3.json"))
    shutil.rmtree(os.path.join(out_dir, "part=3"))
    s3 = _run(["--input", inp, "--out", out_dir, "--parts", "8", "--resume"])
    assert s3["parts_written"] == [3]
    assert 0 < s3["rows_written"] < 1000

    # lineage: manifest row counts sum to the input size
    total = 0
    mdir = os.path.join(out_dir, "_manifest")
    for f in os.listdir(mdir):
        with open(os.path.join(mdir, f)) as fh:
            total += json.load(fh)["rows"]
    assert total == 1000

    # crash mid-write: manifest gone but STALE DATA remains in part=5 —
    # resume must replace it, not append (no duplicate rows, counts exact)
    os.unlink(os.path.join(out_dir, "_manifest", "part-5.json"))
    s4 = _run(["--input", inp, "--out", out_dir, "--parts", "8", "--resume"])
    assert s4["parts_written"] == [5]
    import pyarrow.parquet as pq
    import glob as _glob
    part5_rows = sum(pq.read_metadata(f).num_rows for f in
                     _glob.glob(os.path.join(out_dir, "part=5", "*.parquet")))
    with open(os.path.join(out_dir, "_manifest", "part-5.json")) as fh:
        assert json.load(fh)["rows"] == part5_rows
    total = sum(json.load(open(os.path.join(mdir, f)))["rows"]
                for f in os.listdir(mdir))
    assert total == 1000
