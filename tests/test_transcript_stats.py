"""Unit tests for the per-conversation transcript-analytics kernels
(pipelines/queries.py conv_* family) and the apply_dataset post_kernel
hook they ride on (pipelines/replay.py).

Reference analog: the final-state table assertions in the reference's
SnapshotIT / StreamingIT suites (Db2ConnectorIT.java) — here extended to
conversation-level QA folds, which the 100 TB design runs inside the
apply exchange itself (post_kernel), never as a second shuffle."""

import numpy as np
import pyarrow as pa

from debezium_connector_db2_ray.pipelines.queries import (
    _CONV_ALT_SCHEMA,
    _CONV_STATS_SCHEMA,
    conv_role_alternation_kernel,
    conv_turn_stats_kernel,
)


def _state(rows):
    """rows: (conv_id, turn_idx, role, text, tool)."""
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "tool": pa.array([r[4] for r in rows], pa.string()),
        "ts": pa.array(
            np.arange(len(rows)).astype("datetime64[us]"),
            pa.timestamp("us"),
        ),
    })


def test_turn_stats_basic():
    out = conv_turn_stats_kernel(_state([
        ("a", 0, "user", "hi", None),
        ("a", 1, "assistant", "hello!", "updater"),
        ("a", 2, "user", None, None),       # null text counts 0 chars
        ("b", 5, "user", "solo", None),
    ])).to_pydict()
    assert out["conv_id"] == ["a", "b"]
    assert out["n_turns"] == [3, 1]
    assert out["n_roles"] == [2, 1]
    assert out["n_tool_turns"] == [1, 0]
    assert out["total_chars"] == [8, 4]
    assert out["max_turn_idx"] == [2, 5]


def test_turn_stats_empty():
    empty = conv_turn_stats_kernel(_CONV_STATS_SCHEMA.empty_table()
                                   if False else _state([]))
    assert empty.num_rows == 0
    assert empty.schema.equals(_CONV_STATS_SCHEMA)


def test_alternation_flags():
    out = conv_role_alternation_kernel(_state([
        # alternates
        ("a", 0, "user", "x", None),
        ("a", 1, "assistant", "x", None),
        ("a", 2, "user", "x", None),
        # violation: two consecutive assistant turns (by turn_idx order,
        # delivered shuffled to prove the kernel sorts)
        ("b", 2, "assistant", "x", None),
        ("b", 0, "user", "x", None),
        ("b", 1, "assistant", "x", None),
        # single turn alternates trivially
        ("c", 7, "assistant", "x", None),
    ])).to_pydict()
    assert out["conv_id"] == ["a", "b", "c"]
    assert out["alternates"] == [True, False, True]


def test_alternation_same_role_different_conv_is_not_violation():
    out = conv_role_alternation_kernel(_state([
        ("a", 0, "user", "x", None),
        ("b", 0, "user", "x", None),
    ])).to_pydict()
    assert out["alternates"] == [True, True]


def test_alternation_empty():
    empty = conv_role_alternation_kernel(_state([]))
    assert empty.num_rows == 0
    assert empty.schema.equals(_CONV_ALT_SCHEMA)


def test_prefix_fingerprint_kernel():
    from debezium_connector_db2_ray.pipelines.queries import (
        conv_prefix_kernel,
    )

    out = conv_prefix_kernel(_state([
        ("a", 0, "user", "x", None),
        ("a", 1, "assistant", None, None),   # null text -> '' slot
        ("a", 2, "user", "z", None),
        ("a", 3, "user", "beyond-prefix", None),  # 4th turn ignored
        ("b", 7, "user", "only", None),      # short conv: 1 slot, no seps
    ])).to_pydict()
    assert out["prefix"] == ["x\x1f\x1fz", "only"]
    empty = conv_prefix_kernel(_state([]))
    assert empty.num_rows == 0 and empty.column_names == ["prefix"]


def test_post_kernel_rides_apply_exchange(ray_session):
    """post_kernel sees each conversation whole: LWW collapse applies
    first (duplicate turn rewritten, delete removed), then the fold."""
    import ray.data as rd

    from debezium_connector_db2_ray.ops import OP_DELETE, OP_INSERT
    from debezium_connector_db2_ray.pipelines.replay import apply_dataset
    from debezium_connector_db2_ray.schema import changelog_schema

    def cl(lsn, op, conv, turn, role, text):
        return {
            "commit_lsn_hi": 0, "commit_lsn_lo": lsn,
            "intent_lsn_hi": 0, "intent_lsn_lo": lsn,
            "op": op, "conv_id": conv, "turn_idx": turn,
            "role": role, "text": text, "tool": None,
            "ts": np.datetime64(lsn, "us"),
        }

    rows = [
        cl(1, OP_INSERT, "a", 0, "user", "v1"),
        cl(2, OP_INSERT, "a", 0, "user", "v2 wins"),   # LWW rewrite
        cl(3, OP_INSERT, "a", 1, "assistant", "kept"),
        cl(4, OP_INSERT, "a", 2, "user", "doomed"),
        cl(5, OP_DELETE, "a", 2, "user", None),         # tombstone
    ]
    ds = rd.from_arrow(
        pa.Table.from_pylist(rows, schema=changelog_schema())
    )
    out = apply_dataset(
        ds, num_partitions=4, post_kernel=conv_turn_stats_kernel
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["conv_id"] == "a" and r["n_turns"] == 2
    assert r["total_chars"] == len("v2 wins") + len("kept")
    assert r["max_turn_idx"] == 1
