"""Fault tolerance: a flaky stage recovers through Ray's task retry
knobs, and the checkpointed job output is unaffected by retries."""

import os

import numpy as np
import pyarrow as pa
import ray.data


def test_flaky_stage_recovers_with_retry(ray_session, tmp_path):
    """A stage whose tasks fail ONCE per (worker, marker) recovers with
    retry_exceptions=True and produces exactly the right output — the
    configuration a 100 TB run ships so one bad node doesn't kill the
    job. The failure marker lives on disk, so the retried attempt (same
    or different worker) passes."""
    marker_dir = str(tmp_path / "markers")
    os.makedirs(marker_dir)

    def flaky(b: pa.Table) -> pa.Table:
        key = int(b["id"][0].as_py()) // 100
        m = os.path.join(marker_dir, f"seen-{key}")
        if not os.path.exists(m):
            with open(m, "w") as f:
                f.write("")
            raise RuntimeError(f"transient failure on block {key}")
        return pa.table({"id": b["id"],
                         "double": pa.array(b["id"].to_numpy() * 2)})

    # max_retries comfortably above the worst case (all five 100-row
    # ranges bundled into ONE task would fail five times before passing
    # — block bundling is a Ray scheduling detail, not under test here)
    ds = ray.data.range(500, override_num_blocks=5).map_batches(
        flaky, batch_format="pyarrow", batch_size=None,
        retry_exceptions=True, max_retries=8)
    out = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert out["id"].tolist() == list(range(500))
    assert (out["double"].to_numpy() == np.arange(500) * 2).all()
    # the flaky path genuinely fired and was retried through
    assert len(os.listdir(marker_dir)) >= 1
