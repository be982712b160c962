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
    start_ts, end_ts). Per-user work happens inside map_groups on the sorted
    group — the documented partitioning assumption is events-per-user fits a
    worker (salt by time range if a user exceeds it)."""
    gap_us = np.int64(gap_minutes) * np.int64(60_000_000)

    def per_user(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts = g["ts"].astype("int64").to_numpy()
        new_session = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new_session) - 1
        out = (
            pd.DataFrame(
                {"session_idx": sid, "ts": g["ts"], "event_id": g["event_id"]}
            )
            .groupby("session_idx")
            .agg(n_events=("event_id", "size"), start_ts=("ts", "min"), end_ts=("ts", "max"))
            .reset_index()
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
