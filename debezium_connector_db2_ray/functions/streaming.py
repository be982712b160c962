"""Streaming-shaped operators over the events log.

Ray Data has no event-time windows; these reproduce the standard shapes the
way the guide prescribes: treat the log as a partitioned, sortable table —
tumbling windows become a groupby on (key, bucket); session windows become a
per-key sorted gap-cut (LAG + cumulative sum) inside map_groups. Both are
pre-aggregated per batch before the small final groupby (combiner pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

HOUR_US = 3_600_000_000


def tumbling_counts(ds, *, width_hours: int = 24):
    """Per (user_id, tumbling time bucket): event count and value sum."""
    from ray.data.aggregate import Count, Sum

    width = np.int64(width_hours * HOUR_US)

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "bucket": (ts // width).astype(np.int64),
                "value": batch["value"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["user_id", "bucket"], as_index=False).agg(
            n=("value", "size"), value_sum=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=400_000)
        .groupby(["user_id", "bucket"])
        .aggregate(Sum("n", alias_name="n"), Sum("value_sum", alias_name="value_sum"))
    )


def sessionize(ds, *, gap_minutes: int = 120):
    """Session windows per user: a gap greater than ``gap_minutes`` starts a
    new session. Emits one row per session: (user_id, session_idx, n_events,
    start_ts, end_ts).

    Scale shape — NO raw-event shuffle: each batch gap-cuts its own events
    into maximal partial sessions (a vectorized Arrow/numpy combiner), and
    only those per-batch session SUMMARIES shuffle to a per-user merge that
    folds overlapping/adjacent intervals under the same gap tolerance. The
    fold is exact for ANY split of events into batches (a chain of events
    with consecutive gaps <= gap always appears as intervals within gap of
    each other), so a mega-user costs O(their sessions) at the merge, not
    O(their events) on one worker — the round-1 hot-user hazard is gone."""
    gap_us = np.int64(gap_minutes) * np.int64(60_000_000)

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], batch["user_id"].type),
                    "start_ts": pa.array([], pa.int64()),
                    "end_ts": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        order = np.lexsort((ts, uid))
        u, t = uid[order], ts[order]
        new = np.ones(n, dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > gap_us)
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "start_ts": pa.array(t[starts], pa.int64()),
                "end_ts": pa.array(t[starts + counts - 1], pa.int64()),
                "n_events": pa.array(counts.astype(np.int64)),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        uid = group["user_id"][0]
        s = group["start_ts"].to_numpy(zero_copy_only=False)
        e = group["end_ts"].to_numpy(zero_copy_only=False)
        c = group["n_events"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, s))
        s, e, c = s[order], e[order], c[order]
        m = len(s)
        reach = np.maximum.accumulate(e)  # furthest end seen in the sweep
        new = np.ones(m, dtype=bool)
        new[1:] = s[1:] > reach[:-1] + gap_us
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, m))
        sid = np.arange(len(starts), dtype=np.int64)
        seg_end = np.maximum.reduceat(e, starts)
        seg_n = np.add.reduceat(c, starts)
        return pa.table(
            {
                "user_id": pa.array([uid.as_py()] * len(starts), group["user_id"].type),
                "session_idx": pa.array(sid),
                "n_events": pa.array(seg_n.astype(np.int64)),
                "start_ts": pa.array(s[starts], pa.int64()).cast(pa.timestamp("us")),
                "end_ts": pa.array(seg_end, pa.int64()).cast(pa.timestamp("us")),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=400_000)
        .groupby("user_id")
        .map_groups(merge, batch_format="pyarrow")
    )
