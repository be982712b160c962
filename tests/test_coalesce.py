"""Partial-update column coalescing (reselect-columns analog)."""

import pyarrow as pa

from debezium_connector_db2_ray.ops import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_SINGLE,
)
from debezium_connector_db2_ray.schema import changelog_schema
from debezium_connector_db2_ray.stages.apply import coalesce_collapse


def mklog_partial(rows):
    """rows: (lsn, op, conv, turn, text_or_None, tool_or_None)"""
    n = len(rows)
    return pa.table(
        {
            "commit_lsn_hi": pa.array([0] * n, pa.uint64()),
            "commit_lsn_lo": pa.array([r[0] for r in rows], pa.uint64()),
            "intent_lsn_hi": pa.array([0] * n, pa.uint64()),
            "intent_lsn_lo": pa.array([r[0] for r in rows], pa.uint64()),
            "op": pa.array([r[1] for r in rows], pa.int8()),
            "conv_id": pa.array([r[2] for r in rows], pa.string()),
            "turn_idx": pa.array([r[3] for r in rows], pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array([r[4] for r in rows], pa.string()),
            "tool": pa.array([r[5] for r in rows], pa.string()),
            "ts": pa.array([0] * n, pa.timestamp("us")),
        },
        schema=changelog_schema(),
    )


def result(t):
    return {
        (c, i): (x, tl)
        for c, i, x, tl in zip(
            t["conv_id"].to_pylist(),
            t["turn_idx"].to_pylist(),
            t["text"].to_pylist(),
            t["tool"].to_pylist(),
        )
    }


def test_latest_non_null_per_column():
    log = mklog_partial(
        [
            (1, OP_INSERT, "a", 0, "t1", "tool1"),
            (2, OP_UPDATE_SINGLE, "a", 0, None, "tool2"),  # partial: text absent
            (3, OP_UPDATE_SINGLE, "a", 0, "t3", None),  # partial: tool absent
        ]
    )
    out = coalesce_collapse(log)
    assert result(out) == {("a", 0): ("t3", "tool2")}


def test_delete_resets_coalesce_window():
    log = mklog_partial(
        [
            (1, OP_INSERT, "a", 0, "old", "oldtool"),
            (2, OP_DELETE, "a", 0, None, None),
            (3, OP_INSERT, "a", 0, "new", None),
            (4, OP_UPDATE_SINGLE, "a", 0, None, "newtool"),
        ]
    )
    out = coalesce_collapse(log)
    # 'old'/'oldtool' must NOT leak across the tombstone
    assert result(out) == {("a", 0): ("new", "newtool")}


def test_tombstoned_key_dropped_and_others_kept():
    log = mklog_partial(
        [
            (1, OP_INSERT, "a", 0, "x", None),
            (2, OP_DELETE, "a", 0, None, None),
            (3, OP_INSERT, "b", 1, "y", "t"),
        ]
    )
    out = coalesce_collapse(log)
    assert result(out) == {("b", 1): ("y", "t")}


def test_order_insensitive():
    import numpy as np

    rows = [
        (1, OP_INSERT, "a", 0, "t1", "tool1"),
        (2, OP_UPDATE_SINGLE, "a", 0, None, "tool2"),
        (3, OP_UPDATE_SINGLE, "a", 0, "t3", None),
        (4, OP_INSERT, "b", 2, None, "only-tool"),
    ]
    expect = {("a", 0): ("t3", "tool2"), ("b", 2): (None, "only-tool")}
    rng = np.random.default_rng(1)
    for _ in range(5):
        perm = rng.permutation(len(rows))
        out = coalesce_collapse(mklog_partial([rows[i] for i in perm]))
        assert result(out) == expect
