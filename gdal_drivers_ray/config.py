"""Engine-level execution knobs — the multi-node "cluster switch" surface.

The reference has no execution configuration at all (single-threaded pull,
SURVEY.md §4); at 100 TB the two knobs that decide whether an exchange
survives are (a) how many partitions a wide op shuffles into and (b)
whether the exchange runs pull-based (sort fetches n_map x n_reduce
objects) or push-based (merge-on-the-fly). Both were fixed literals in
round 3 (`num_partitions=64`, default pull); this module derives them
from input size and cluster shape so the same pipeline code runs at
sf0.01 and at 256 nodes.

Sizing rule (measured, BASELINE.md round-4 sweep): one partition ~
TARGET_PARTITION_BYTES of ON-DISK input (4 MiB ~ 15-60 MB exchanged
after tagging + pandas inflation). The 96x cogroup_join at 16 cpus
measured 34 s at 32 partitions vs a flat 10-15 s plateau from 128
through 1024 — the reducer's per-partition pandas merge is the
superlinear term, so partitions err SMALL. Floored at 2x the cluster's
CPU parallelism so every core gets reduce work even on tiny inputs, and
capped at MAX_PARTITIONS so the pull-based sort's n_map x n_reduce
fetch matrix stays bounded (the round-3 finding: block count following
input FILE count turned a 13 s join into 54 s). An input so large the
cap binds (> ~16 GB on disk per exchange) should not go through one
flat exchange anyway: bucket the key first (stages/skew.py) or flip
set_push_based_shuffle(True) on a real cluster.
"""

from __future__ import annotations

import math
import os

TARGET_PARTITION_BYTES = 4 << 20
MIN_PARTITIONS = 16
MAX_PARTITIONS = 4096


def cluster_parallelism() -> int:
    """Total CPUs Ray sees (falls back to the host's count pre-init)."""
    import ray
    if ray.is_initialized():
        return max(1, int(ray.cluster_resources().get("CPU", 1)))
    return os.cpu_count() or 8


def partitions_for_bytes(nbytes: int | None,
                         *, target_bytes: int = TARGET_PARTITION_BYTES,
                         lo: int = MIN_PARTITIONS,
                         hi: int = MAX_PARTITIONS) -> int:
    """Exchange partition count for a wide op moving ~`nbytes`.

    None (unknown size) -> 2x cluster parallelism, clamped: the safe
    default when the caller cannot estimate its exchanged bytes."""
    base = 2 * cluster_parallelism()
    if nbytes is not None:
        base = max(base, math.ceil(max(nbytes, 1) / target_bytes))
    return int(min(max(base, lo), hi))


def path_bytes(path: str) -> int | None:
    """On-disk size of a file or single-level parquet directory — the
    byte hint callers pass to partitions_for_bytes. (Dataset.size_bytes()
    is NOT used anywhere: on a transformed lazy Dataset it EXECUTES the
    plan — measured — which would defeat streaming.)"""
    try:
        if os.path.isdir(path):
            return sum(e.stat().st_size for e in os.scandir(path)
                       if e.is_file())
        return os.path.getsize(path)
    except OSError:
        return None


def set_push_based_shuffle(on=True):
    """Toggle Ray Data's push-based shuffle for subsequent executions and
    return the previous value — the raw ``shuffle_strategy`` on current
    Ray (pass it back to restore exactly, including non-sort strategies
    like HASH_SHUFFLE), a bool on the legacy-flag fallback. Pull-based is the single-box default (the
    round-3 A/B measured no local advantage for push; on a real cluster
    push-based avoids the n_map x n_reduce fetch matrix crossing the
    network, so flip this ON when nodes > 1). Uses the current
    ``shuffle_strategy`` API when present (``use_push_based_shuffle`` is
    deprecated and may become a no-op on a Ray upgrade), falling back to
    the legacy flag on older Ray."""
    from ray.data import DataContext
    ctx = DataContext.get_current()
    try:
        from ray.data.context import ShuffleStrategy
    except ImportError:
        ShuffleStrategy = None
    if ShuffleStrategy is not None and hasattr(ctx, "shuffle_strategy"):
        # return (and accept) the RAW previous strategy, not a bool: a
        # context configured with a third state (e.g. HASH_SHUFFLE) must
        # survive a save/flip/restore cycle intact
        prev = ctx.shuffle_strategy
        if isinstance(on, bool):
            ctx.shuffle_strategy = (
                ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED if on
                else ShuffleStrategy.SORT_SHUFFLE_PULL_BASED)
        else:
            ctx.shuffle_strategy = on
        return prev
    prev = bool(getattr(ctx, "use_push_based_shuffle", False))
    ctx.use_push_based_shuffle = on
    return prev
