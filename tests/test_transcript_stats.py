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


def _state_ts(rows):
    """rows: (conv_id, turn_idx, role, text, ts_us)."""
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "tool": pa.array([None] * len(rows), pa.string()),
        "ts": pa.array(
            np.array([r[4] for r in rows], "datetime64[us]")
            if rows else np.array([], "datetime64[us]"),
            pa.timestamp("us"),
        ),
    })


def test_first_last_role_kernel():
    from debezium_connector_db2_ray.pipelines.queries import (
        _CONV_FL_SCHEMA,
        conv_first_last_role_kernel,
    )

    out = conv_first_last_role_kernel(_state([
        ("a", 2, "assistant", "x", None),  # shuffled: kernel must sort
        ("a", 0, "user", "x", None),
        ("a", 1, "assistant", "x", None),
        ("b", 7, "system", "x", None),     # single turn: first == last
    ])).to_pydict()
    assert out["conv_id"] == ["a", "b"]
    assert out["first_role"] == ["user", "system"]
    assert out["last_role"] == ["assistant", "system"]
    empty = conv_first_last_role_kernel(_state([]))
    assert empty.num_rows == 0 and empty.schema.equals(_CONV_FL_SCHEMA)


def test_turn_gaps_kernel():
    from debezium_connector_db2_ray.pipelines.queries import (
        _CONV_GAPS_SCHEMA,
        conv_turn_gaps_kernel,
    )

    out = conv_turn_gaps_kernel(_state([
        ("a", 0, "u", "x", None),
        ("a", 1, "u", "x", None),
        ("a", 5, "u", "x", None),   # hole of 3 turns (2,3,4), gap 4
        ("b", 9, "u", "x", None),   # single turn: gap 0, missing 0
    ])).to_pydict()
    assert out["conv_id"] == ["a", "b"]
    assert out["max_gap"] == [4, 0]
    assert out["n_missing"] == [3, 0]
    empty = conv_turn_gaps_kernel(_state([]))
    assert empty.num_rows == 0 and empty.schema.equals(_CONV_GAPS_SCHEMA)


def test_time_span_kernel():
    from debezium_connector_db2_ray.pipelines.queries import (
        _CONV_SPAN_SCHEMA,
        conv_time_span_kernel,
    )

    out = conv_time_span_kernel(_state_ts([
        ("a", 0, "u", "x", 100),
        ("a", 1, "u", "x", 50),    # ts NOT monotonic in turn order
        ("a", 2, "u", "x", 400),
        ("b", 0, "u", "x", 7),
    ])).to_pydict()
    assert out["conv_id"] == ["a", "b"]
    assert out["span_us"] == [350, 0]
    assert out["n_turns"] == [3, 1]
    empty = conv_time_span_kernel(_state_ts([]))
    assert empty.num_rows == 0 and empty.schema.equals(_CONV_SPAN_SCHEMA)


def test_sessionize_kernel():
    from debezium_connector_db2_ray.pipelines.queries import (
        _CONV_SESS_SCHEMA,
        SESSION_GAP_US,
        conv_sessionize_kernel,
    )

    g = SESSION_GAP_US
    out = conv_sessionize_kernel(_state_ts([
        ("a", 0, "u", "x", 0),
        ("a", 1, "u", "x", g),          # delta == gap: NOT a break
        ("a", 2, "u", "x", 2 * g + 1),  # delta g+1: break
        ("a", 3, "u", "x", 1),          # negative delta: not a break
        ("b", 0, "u", "x", 0),
    ])).to_pydict()
    assert out["conv_id"] == ["a", "b"]
    assert out["n_sessions"] == [2, 1]
    empty = conv_sessionize_kernel(_state_ts([]))
    assert empty.num_rows == 0 and empty.schema.equals(_CONV_SESS_SCHEMA)


def test_role_char_share_kernel():
    from debezium_connector_db2_ray.pipelines.queries import (
        _CONV_SHARE_SCHEMA,
        conv_role_char_share_kernel,
    )

    out = conv_role_char_share_kernel(_state([
        ("a", 0, "user", "xx", None),       # user: 2+4=6 of 8
        ("a", 1, "assistant", "yy", None),  # assistant: 2 of 8
        ("a", 2, "user", "zzzz", None),
        ("b", 0, "user", None, None),       # all-null conv: 0/0 -> NaN
    ]))
    d = out.to_pydict()
    assert d["conv_id"] == ["a", "a", "b"]
    assert d["role"] == ["assistant", "user", "user"]
    assert d["chars"] == [2, 6, 0]
    assert d["frac"][0] == 0.25 and d["frac"][1] == 0.75
    assert np.isnan(d["frac"][2])
    empty = conv_role_char_share_kernel(_state([]))
    assert empty.num_rows == 0 and empty.schema.equals(_CONV_SHARE_SCHEMA)


def test_role_bigrams_kernel():
    from debezium_connector_db2_ray.pipelines.queries import (
        conv_role_bigrams_kernel,
    )

    out = conv_role_bigrams_kernel(_state([
        ("a", 0, "user", "x", None),
        ("a", 1, "assistant", "x", None),
        ("a", 2, "user", "x", None),
        ("b", 0, "user", "x", None),       # conv boundary: no (user,user)
        ("b", 1, "user", "x", None),       # same-role transition counts
    ])).to_pydict()
    pairs = dict(zip(zip(out["prev_role"], out["role"]), out["n"]))
    assert pairs == {
        ("user", "assistant"): 1,
        ("assistant", "user"): 1,
        ("user", "user"): 1,
    }
    empty = conv_role_bigrams_kernel(_state([]))
    assert empty.num_rows == 0
    single = conv_role_bigrams_kernel(_state([("a", 0, "u", "x", None)]))
    assert single.num_rows == 0


def test_longest_monologue_kernel():
    from debezium_connector_db2_ray.pipelines.queries import (
        _CONV_MONO_SCHEMA,
        conv_longest_monologue_kernel,
    )

    out = conv_longest_monologue_kernel(_state([
        ("a", 0, "user", "x", None),
        ("a", 1, "assistant", "x", None),
        ("a", 2, "assistant", "x", None),
        ("a", 3, "assistant", "x", None),
        ("a", 4, "user", "x", None),
        ("b", 0, "user", "x", None),
        # same role as conv a's tail but different conv: run must reset
        ("b", 1, "user", "x", None),
    ])).to_pydict()
    assert out["conv_id"] == ["a", "b"]
    assert out["longest_run"] == [3, 2]
    empty = conv_longest_monologue_kernel(_state([]))
    assert empty.num_rows == 0 and empty.schema.equals(_CONV_MONO_SCHEMA)


def test_render_kernel():
    from debezium_connector_db2_ray.pipelines.queries import (
        _CONV_RENDER_SCHEMA,
        conv_render_kernel,
    )

    out = conv_render_kernel(_state([
        ("a", 1, "assistant", "hi there", None),  # shuffled: sorts first
        ("a", 0, "user", None, None),             # null text -> ''
        ("b", 0, "user", "solo", None),
    ])).to_pydict()
    assert out["conv_id"] == ["a", "b"]
    assert out["transcript"] == [
        "user: \nassistant: hi there", "user: solo",
    ]
    empty = conv_render_kernel(_state([]))
    assert empty.num_rows == 0 and empty.schema.equals(_CONV_RENDER_SCHEMA)


def test_sft_pairs_kernel():
    from debezium_connector_db2_ray.pipelines.queries import (
        _CONV_SFT_SCHEMA,
        conv_sft_pairs_kernel,
    )

    out = conv_sft_pairs_kernel(_state([
        ("a", 0, "click", "q1", None),
        ("a", 1, "purchase", "a1", None),     # pair
        ("a", 2, "click", "q2", None),
        ("a", 3, "view", "skip", None),       # wrong response role
        ("b", 0, "purchase", "orphan", None),  # conv boundary: no pair
        ("b", 1, "click", "q3", None),
        ("b", 2, "purchase", "a3", None),     # pair
    ])).to_pydict()
    assert out["conv_id"] == ["a", "b"]
    assert out["turn_idx"] == [1, 2]
    assert out["prompt"] == ["q1", "q3"]
    assert out["response"] == ["a1", "a3"]
    empty = conv_sft_pairs_kernel(_state([]))
    assert empty.num_rows == 0 and empty.schema.equals(_CONV_SFT_SCHEMA)


def test_sft_pairs_never_cross_conv_boundary():
    from debezium_connector_db2_ray.pipelines.queries import (
        conv_sft_pairs_kernel,
    )

    out = conv_sft_pairs_kernel(_state([
        ("a", 9, "click", "tail", None),
        ("b", 0, "purchase", "head", None),
    ]))
    assert out.num_rows == 0


def test_turn_length_hist_kernel():
    from debezium_connector_db2_ray.pipelines.queries import (
        conv_length_hist_kernel,
    )

    out = conv_length_hist_kernel(_state([
        ("a", 0, "u", "one", None),       # 3 chars
        ("a", 1, "u", "abc", None),       # 3 chars
        ("a", 2, "u", "ab", None),        # 2 chars
        ("b", 0, "u", "", None),          # 0 chars
        ("b", 1, "u", None, None),        # null -> 0 chars
    ])).to_pydict()
    hist = dict(zip(out["n_chars"], out["n_turns"]))
    assert hist == {0: 2, 2: 1, 3: 2}
    empty = conv_length_hist_kernel(_state([]))
    assert empty.num_rows == 0
