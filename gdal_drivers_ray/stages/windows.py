"""Session (gap) windows as Ray Data ops.

Two plans over (user_id, us) event rows:

- ``sessionize``: hash-partition by user (stages.joins.partitioned_groups)
  and split each user's sorted stream where the gap exceeds ``gap_us``.
  One vectorized reducer call per partition; a user's WHOLE history must
  fit its reducer — exact, but a pathologically hot user is unbounded.

- ``sessionize_bucketed``: the scale plan. Events group by
  (user, time-bucket) so no reducer ever sees more than one bucket of one
  user. Sessions that span bucket edges are stitched from per-bucket
  SUMMARIES (first/last session per bucket — one row per non-empty
  (user, bucket), O(#buckets) per user, independent of event count), and
  interior sessions renumber by a cogrouped fix-up. Three exchanges, all
  bounded; output is row-identical to ``sessionize``.

The same hot-key bucketing idea as the as-of join's ``bucket_width``
(stages/joins.py) — there the carry is the last row per bucket, here it
is the boundary session pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .joins import partitioned_groups

_EMPTY_OUT = pd.DataFrame({c: np.asarray([], np.int64) for c in
                           ("user_id", "session_id", "n_events",
                            "start_us", "end_us")})

OUT_SCHEMA = pa.schema([
    ("user_id", pa.int64()),
    ("session_id", pa.int64()),
    ("n_events", pa.int64()),
    ("start_us", pa.int64()),
    ("end_us", pa.int64()),
])


def _new_user_flags(u: np.ndarray) -> np.ndarray:
    """True where a (user-sorted) stream switches to a new user."""
    newu = np.ones(len(u), dtype=bool)
    newu[1:] = u[1:] != u[:-1]
    return newu


def sessionize(ev: ray.data.Dataset, gap_us: int,
               num_partitions: int = 64) -> ray.data.Dataset:
    """Exact sessionization, one reducer call per hash partition."""
    def sessions_part(g: pd.DataFrame) -> pd.DataFrame:
        if "user_id" not in g.columns or not len(g):
            return _EMPTY_OUT.copy()
        u = g["user_id"].to_numpy()
        us = g["us"].to_numpy()
        order = np.lexsort((us, u))
        u, us = u[order], us[order]
        newu = _new_user_flags(u)
        news = newu.copy()
        news[1:] |= np.diff(us) > gap_us
        sidg = np.cumsum(news)
        ustart = np.nonzero(newu)[0]
        ulen = np.diff(np.concatenate((ustart, [len(u)])))
        sid = sidg - np.repeat(sidg[ustart], ulen) + 1
        gstart = np.nonzero(news)[0]
        glen = np.diff(np.concatenate((gstart, [len(u)])))
        return pd.DataFrame({
            "user_id": u[gstart],
            "session_id": sid[gstart].astype(np.int64),
            "n_events": glen.astype(np.int64),
            "start_us": us[gstart],
            "end_us": us[gstart + glen - 1]})

    return partitioned_groups(ev, ["user_id"], num_partitions) \
        .map_groups(sessions_part, batch_format="pandas")


def sessionize_bucketed(ev: ray.data.Dataset, gap_us: int, bucket_us: int,
                        num_partitions: int = 64,
                        broadcast_fix_limit: int = 2_000_000
                        ) -> ray.data.Dataset:
    """Hot-user-bounded sessionization; identical rows to ``sessionize``.

    bucket_us must exceed gap_us (a session gap never spans a whole
    empty bucket undetected — times are compared directly, bucket size
    only bounds reducer memory). The interior-session renumber uses a
    broadcast of the per-(user, bucket) fix table when it has at most
    ``broadcast_fix_limit`` rows (no third exchange), else a cogrouped
    fix-up — both paths produce identical rows."""
    if bucket_us <= gap_us:
        raise ValueError("bucket_us must be greater than gap_us")

    def add_bucket(b: pa.Table) -> pa.Table:
        us = b["us"].to_numpy()
        return b.append_column("bucket", pa.array(us // bucket_us))

    # --- pass 1: sessions within each (user, bucket) ---------------------
    def bucket_sessions(g: pd.DataFrame) -> pd.DataFrame:
        if "user_id" not in g.columns or not len(g):
            return pd.DataFrame({c: np.asarray([], np.int64) for c in
                                 ("user_id", "bucket", "lsid", "s",
                                  "n_events", "start_us", "end_us")})
        u = g["user_id"].to_numpy()
        bk = g["bucket"].to_numpy()
        us = g["us"].to_numpy()
        order = np.lexsort((us, bk, u))
        u, bk, us = u[order], bk[order], us[order]
        newg = np.ones(len(u), dtype=bool)
        newg[1:] = (u[1:] != u[:-1]) | (bk[1:] != bk[:-1])
        news = newg.copy()
        news[1:] |= np.diff(us) > gap_us
        sidg = np.cumsum(news)
        gstart_u = np.nonzero(newg)[0]
        glen_u = np.diff(np.concatenate((gstart_u, [len(u)])))
        lsid = sidg - np.repeat(sidg[gstart_u], glen_u) + 1
        sstart = np.nonzero(news)[0]
        slen = np.diff(np.concatenate((sstart, [len(u)])))
        s_per = np.repeat(
            np.add.reduceat(news, gstart_u), glen_u)[sstart]  # s of bucket
        return pd.DataFrame({
            "user_id": u[sstart],
            "bucket": bk[sstart],
            "lsid": lsid[sstart].astype(np.int64),
            "s": s_per.astype(np.int64),
            "n_events": slen.astype(np.int64),
            "start_us": us[sstart],
            "end_us": us[sstart + slen - 1]})

    sess = partitioned_groups(
        ev.map_batches(add_bucket, batch_format="pyarrow",
                       batch_size=None),
        ["user_id", "bucket"], num_partitions) \
        .map_groups(bucket_sessions, batch_format="pandas") \
        .materialize()

    # --- pass 2: stitch boundary sessions from per-bucket summaries ------
    def summarize(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = b.filter(pc.or_(
            pc.equal(b["lsid"], 1),
            pc.equal(b["lsid"], b["s"])))
        return t

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        """Per partition; loops USERS x their BUCKET SUMMARIES (first/last
        session rows only) — O(non-empty buckets) per user, never
        O(events)."""
        if "user_id" not in g.columns or not len(g):
            return pd.DataFrame({c: np.asarray([], np.int64) for c in
                                 ("user_id", "session_id", "n_events",
                                  "start_us", "end_us", "kind")})
        g = g.sort_values(["user_id", "bucket", "lsid"], kind="stable")
        users = g["user_id"].to_numpy()
        buckets = g["bucket"].to_numpy()
        lsids = g["lsid"].to_numpy()
        ss = g["s"].to_numpy()
        ns = g["n_events"].to_numpy()
        starts = g["start_us"].to_numpy()
        ends = g["end_us"].to_numpy()

        m_user, m_sid, m_n, m_start, m_end = [], [], [], [], []
        f_user, f_bucket, f_base = [], [], []

        i, total = 0, len(g)
        while i < total:
            user = users[i]
            # chain state: final id + accumulated (n, start, end)
            fid = 0
            open_fid = open_n = open_start = open_end = None
            while i < total and users[i] == user:
                bucket = buckets[i]
                s = int(ss[i])
                fn, fs, fe = int(ns[i]), int(starts[i]), int(ends[i])
                if s >= 2:          # rows are (first, last) for this bucket
                    ln, ls, le = int(ns[i + 1]), int(starts[i + 1]), \
                        int(ends[i + 1])
                    i += 2
                else:
                    ln, ls, le = fn, fs, fe
                    i += 1
                merge = open_fid is not None and fs - open_end <= gap_us
                if merge:
                    open_n += fn
                    open_end = fe
                    fid_f = open_fid
                else:
                    if open_fid is not None:
                        m_user.append(user); m_sid.append(open_fid)
                        m_n.append(open_n); m_start.append(open_start)
                        m_end.append(open_end)
                    fid_f = fid + 1
                    open_fid, open_n = fid_f, fn
                    open_start, open_end = fs, fe
                f_user.append(user); f_bucket.append(bucket)
                f_base.append(fid_f)
                if s >= 2:
                    # interiors break the chain: close F's group, open L's
                    m_user.append(user); m_sid.append(open_fid)
                    m_n.append(open_n); m_start.append(open_start)
                    m_end.append(open_end)
                    fid = fid_f + s - 1
                    open_fid, open_n = fid, ln
                    open_start, open_end = ls, le
                else:
                    fid = fid_f
            if open_fid is not None:
                m_user.append(user); m_sid.append(open_fid)
                m_n.append(open_n); m_start.append(open_start)
                m_end.append(open_end)

        merged = pd.DataFrame({
            "user_id": np.asarray(m_user, np.int64),
            "session_id": np.asarray(m_sid, np.int64),
            "n_events": np.asarray(m_n, np.int64),
            "start_us": np.asarray(m_start, np.int64),
            "end_us": np.asarray(m_end, np.int64),
            "kind": np.zeros(len(m_user), np.int64)})
        fixes = pd.DataFrame({
            "user_id": np.asarray(f_user, np.int64),
            "session_id": np.asarray(f_bucket, np.int64),  # bucket, reused
            "n_events": np.asarray(f_base, np.int64),      # base fid
            "start_us": np.zeros(len(f_user), np.int64),
            "end_us": np.zeros(len(f_user), np.int64),
            "kind": np.ones(len(f_user), np.int64)})
        return pd.concat([merged, fixes], ignore_index=True)

    stitched = partitioned_groups(
        sess.map_batches(summarize, batch_format="pyarrow",
                         batch_size=None),
        ["user_id"], num_partitions) \
        .map_groups(stitch, batch_format="pandas") \
        .materialize()

    def keep_kind(k: int, drop: bool):
        def f(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            t = b.filter(pc.equal(b["kind"], k))
            return t.drop_columns(["kind"]) if drop else t
        return f

    merged_rows = stitched.map_batches(keep_kind(0, True), batch_size=None,
                                       batch_format="pyarrow")
    fixes_rows = stitched.map_batches(keep_kind(1, False), batch_size=None,
                                      batch_format="pyarrow")

    # --- pass 3, broadcast fast path: the fix table has ONE row per
    # (user, non-empty bucket) — usually tiny next to the session rows.
    # When it fits the broadcast budget, renumber interiors per batch
    # against a shared ObjectRef instead of a third full exchange.
    n_fix = fixes_rows.count()
    if n_fix <= broadcast_fix_limit:
        fix_df = fixes_rows.to_pandas()       # bounded by the limit
        fix_df = pd.DataFrame({"user_id": fix_df["user_id"],
                               "bucket": fix_df["session_id"],
                               "base": fix_df["n_events"]})
        fref = ray.put(fix_df)

        def renumber_b(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            if "lsid" not in df.columns or not len(df):
                return pa.Table.from_pandas(_EMPTY_OUT.copy(),
                                            preserve_index=False)
            lsid = df["lsid"].to_numpy()
            df = df[(lsid > 1) & (lsid < df["s"].to_numpy())]
            if not len(df):
                return pa.Table.from_pandas(_EMPTY_OUT.copy(),
                                            preserve_index=False)
            m = df.merge(ray.get(fref), on=["user_id", "bucket"],
                         how="left")
            m["session_id"] = m["base"].to_numpy().astype(np.int64) \
                + m["lsid"].to_numpy() - 1
            return pa.Table.from_pandas(
                m[["user_id", "session_id", "n_events", "start_us",
                   "end_us"]], preserve_index=False)

        return merged_rows.union(
            sess.map_batches(renumber_b, batch_format="pyarrow",
                             batch_size=None))

    def sess_tag(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"], "bucket": b["bucket"],
            "lsid": b["lsid"], "s": b["s"], "n_events": b["n_events"],
            "start_us": b["start_us"], "end_us": b["end_us"],
            "base": pa.array(np.full(b.num_rows, -1, np.int64))})

    def fix_tag(b: pa.Table) -> pa.Table:
        n = b.num_rows
        z = pa.array(np.zeros(n, np.int64))
        return pa.table({
            "user_id": b["user_id"], "bucket": b["session_id"],
            "lsid": z, "s": z, "n_events": z,
            "start_us": z, "end_us": z, "base": b["n_events"]})

    both = sess.map_batches(sess_tag, batch_format="pyarrow",
                            batch_size=None).union(
        fixes_rows.map_batches(fix_tag, batch_format="pyarrow",
                               batch_size=None))

    def renumber(g: pd.DataFrame) -> pd.DataFrame:
        if "base" not in g.columns or not len(g):
            return _EMPTY_OUT.copy()
        is_fix = g["base"].to_numpy() >= 0
        f = g[is_fix]
        s = g[~is_fix].drop(columns=["base"])
        lsid = s["lsid"].to_numpy()
        interior = (lsid > 1) & (lsid < s["s"].to_numpy())
        s = s[interior]
        if not len(s):
            return pd.DataFrame({
                "user_id": np.asarray([], np.int64),
                "session_id": np.asarray([], np.int64),
                "n_events": np.asarray([], np.int64),
                "start_us": np.asarray([], np.int64),
                "end_us": np.asarray([], np.int64)})
        m = s.merge(f[["user_id", "bucket", "base"]],
                    on=["user_id", "bucket"], how="left")
        sid = m["base"].to_numpy().astype(np.int64) \
            + m["lsid"].to_numpy() - 1
        return pd.DataFrame({
            "user_id": m["user_id"].to_numpy(),
            "session_id": sid,
            "n_events": m["n_events"].to_numpy(),
            "start_us": m["start_us"].to_numpy(),
            "end_us": m["end_us"].to_numpy()})

    interiors = partitioned_groups(both, ["user_id", "bucket"],
                                   num_partitions) \
        .map_groups(renumber, batch_format="pandas")

    return merged_rows.union(interiors)
