"""Douglas–Peucker polyline simplification, integer-exact.

Vector-tile pipelines simplify geometry before encoding (every
production tile stack runs DP or Visvalingam at each zoom); the
reference encodes geometry as-is, so this is an engine-side addition on
the vector path. The split criterion is evaluated WITHOUT division:
keep the point maximizing |cross(p - a, b - a)|, and split iff

    cross^2 > tol^2 * |b - a|^2

— exact in int64 for integer coordinates and integer tolerance (the
classic perpendicular-distance test cleared of the sqrt/divide), so the
distributed map and any re-derivation agree bit-for-bit. Degenerate
closed segments (a == b) fall back to point-to-point distance. Ties
resolve to the LOWEST index. Per-row pure map — no shuffle; the
per-feature stack loop is over SEGMENTS (vectorized cross products per
split), not points.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def dp_keep_mask(xs: np.ndarray, ys: np.ndarray, tol: int) -> np.ndarray:
    """Boolean keep-mask of Douglas–Peucker at integer tolerance `tol`
    over integer coordinates. EXACT for the full int64 coordinate range:
    the split test escalates to Python-int (object-dtype) math whenever
    the span could overflow the vectorized int64 path (from
    |coord| ~ 2^15 the squared cross product wraps — the old claimed
    ~2^15 'safe' bound was exactly where it broke)."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    xs = xs.astype(np.int64)
    ys = ys.astype(np.int64)
    tol2 = int(tol) * int(tol)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        ax, ay, bx, by = xs[i], ys[i], xs[j], ys[j]
        dx, dy = int(bx - ax), int(by - ay)
        px = xs[i + 1:j] - ax
        py = ys[i + 1:j] - ay
        # overflow discipline: cross ~ span^2 and c2 ~ span^4, so int64
        # silently wraps from |span| ~ 2^15.25 up — the wrapped compare
        # DROPPED far-off vertices and argmax picked wrong split points.
        # Escalate to exact Python-int (object-dtype) math when the span
        # can overflow; the fast vector path covers the common case.
        span = max(int(np.abs(px).max(initial=0)),
                   int(np.abs(py).max(initial=0)), abs(dx), abs(dy))
        if dx == 0 and dy == 0:
            # closed segment: plain squared distance to the endpoint
            if span >= 1 << 31:
                d2 = np.array([int(a) ** 2 + int(c) ** 2
                               for a, c in zip(px.tolist(), py.tolist())],
                              dtype=object)
            else:
                d2 = px * px + py * py
            k = int(np.argmax(d2))
            if int(d2[k]) > tol2:
                keep[i + 1 + k] = True
                stack.append((i, i + 1 + k))
                stack.append((i + 1 + k, j))
            continue
        if span >= 1 << 31:
            c2 = np.array([(int(a) * dy - int(c) * dx) ** 2
                           for a, c in zip(px.tolist(), py.tolist())],
                          dtype=object)
        else:
            cross = px * dy - py * dx
            if int(np.abs(cross).max(initial=0)) >= 1 << 31:
                c2 = np.array([int(c) * int(c) for c in cross.tolist()],
                              dtype=object)
            else:
                c2 = cross * cross
        k = int(np.argmax(c2))
        if int(c2[k]) > tol2 * (dx * dx + dy * dy):
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep


def simplify_lines(features: ray.data.Dataset, *, tol: int,
                   id_col: str = "feature_id",
                   xs_col: str = "xs", ys_col: str = "ys"
                   ) -> ray.data.Dataset:
    """Per-feature DP simplification of list<int64> coordinate columns:
    -> (feature_id, n_before, n_after, kept_xs, kept_ys,
    kept_idx_checksum). The checksum is sum((i+1) * (i+7)) over the kept
    vertex indices i — an exact integer that pins WHICH vertices
    survived (not just how many)."""

    def f(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        xs_l = b[xs_col].to_pylist()
        ys_l = b[ys_col].to_pylist()
        n_b, n_a, ck = [], [], []
        kxs, kys = [], []
        for i in range(b.num_rows):
            xs = np.asarray(xs_l[i], dtype=np.int64)
            ys = np.asarray(ys_l[i], dtype=np.int64)
            keep = dp_keep_mask(xs, ys, tol)
            idx = np.flatnonzero(keep).astype(np.int64)
            n_b.append(len(xs))
            n_a.append(int(keep.sum()))
            ck.append(int(((idx + 1) * (idx + 7)).sum()))
            kxs.append(xs[keep].tolist())
            kys.append(ys[keep].tolist())
        return pa.table({
            "feature_id": pa.array(ids),
            "n_before": pa.array(n_b, pa.int64()),
            "n_after": pa.array(n_a, pa.int64()),
            "kept_idx_checksum": pa.array(ck, pa.int64()),
            "kept_xs": pa.array(kxs, pa.list_(pa.int64())),
            "kept_ys": pa.array(kys, pa.list_(pa.int64())),
        })

    return features.map_batches(f, batch_format="pyarrow",
                                batch_size=None)
