"""Session-window plans: plain vs hot-user-bounded bucketed stitching."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from gdal_drivers_ray.stages.windows import sessionize, sessionize_bucketed

GAP = 1_800_000_000          # 30 min
BUCKET = 6 * 3_600_000_000   # 6 h


def _ref_sessions(users, times, gap=GAP):
    """NumPy reference: per-user sorted gap split."""
    df = pd.DataFrame({"u": users, "t": times}).sort_values(["u", "t"])
    out = []
    for u, g in df.groupby("u"):
        t = g["t"].to_numpy()
        brk = np.concatenate(([True], np.diff(t) > gap))
        sid = np.cumsum(brk)
        for s in range(1, sid[-1] + 1):
            tt = t[sid == s]
            out.append((u, s, len(tt), tt[0], tt[-1]))
    return pd.DataFrame(out, columns=["user_id", "session_id", "n_events",
                                      "start_us", "end_us"])


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _run(ds_fn, users, times):
    t = pa.table({"user_id": pa.array(users, pa.int64()),
                  "us": pa.array(times, pa.int64())})
    return _canon(ds_fn(ray.data.from_arrow(t)).to_pandas())


def test_bucketed_matches_plain_and_reference(ray_session):
    rng = np.random.default_rng(0)
    users, times = [], []
    # user 1: one giant session marching straight through many buckets
    # (10-min steps for 3 days) — the s==1 chain-continuation path
    t = np.arange(0, 3 * 86_400_000_000, 600_000_000)
    users += [1] * len(t); times += list(t + 17)
    # user 2: sessions that end/start EXACTLY at the gap across a bucket
    # edge (merge, <=) and just past it (split)
    users += [2, 2, 2, 2]
    times += [BUCKET - 10, BUCKET + GAP - 10,        # gap == GAP -> merge
              3 * BUCKET - 10, 3 * BUCKET + GAP + 1]  # gap > GAP -> split
    # user 3: many sessions inside one bucket (interiors, s >= 3)
    for k in range(5):
        base = 7 * BUCKET + k * (GAP + 60_000_000) * 2
        users += [3, 3]; times += [base, base + 1000]
    # user 4: single event; user 5: random noise
    users += [4]; times += [11 * BUCKET + 5]
    t5 = np.sort(rng.integers(0, 12 * BUCKET, 400))
    users += [5] * len(t5); times += list(t5)

    plain = _run(lambda ev: sessionize(ev, GAP), users, times)
    bucketed = _run(lambda ev: sessionize_bucketed(ev, GAP, BUCKET),
                    users, times)
    ref = _canon(_ref_sessions(users, times))

    pd.testing.assert_frame_equal(plain, ref, check_dtype=False)
    pd.testing.assert_frame_equal(bucketed, ref, check_dtype=False)
    # user 1 collapsed to ONE session despite spanning ~12 buckets
    assert (ref[ref["user_id"] == 1]["session_id"] == 1).all()


def test_bucketed_hot_user_parity(ray_session):
    """A hot user whose history would dominate a single reducer: the
    bucketed plan (per-bucket groups only) still produces identical
    sessions."""
    rng = np.random.default_rng(7)
    n = 60_000
    # bursts with occasional > GAP gaps
    gaps = rng.choice([60_000_000, 120_000_000, GAP + 1_000],
                      n, p=[0.6, 0.39, 0.01]).astype(np.int64)
    t_hot = np.cumsum(gaps)
    users = np.concatenate([np.full(n, 99, np.int64),
                            np.full(50, 7, np.int64)])
    times = np.concatenate([t_hot,
                            np.sort(rng.integers(0, t_hot[-1], 50))])
    plain = _run(lambda ev: sessionize(ev, GAP), users, times)
    bucketed = _run(lambda ev: sessionize_bucketed(ev, GAP, BUCKET),
                    users, times)
    pd.testing.assert_frame_equal(plain, bucketed, check_dtype=False)
    assert plain["n_events"].sum() == n + 50


def test_bucketed_cogroup_fallback_parity(ray_session):
    """broadcast_fix_limit=0 forces the third-exchange cogroup path; rows
    must be identical to the broadcast fast path."""
    rng = np.random.default_rng(3)
    users = np.repeat(np.arange(1, 20, dtype=np.int64), 60)
    times = np.sort(rng.integers(0, 10 * BUCKET, len(users)))
    fast = _run(lambda ev: sessionize_bucketed(ev, GAP, BUCKET),
                users, times)
    slow = _run(lambda ev: sessionize_bucketed(ev, GAP, BUCKET,
                                               broadcast_fix_limit=0),
                users, times)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
