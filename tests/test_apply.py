"""Apply-stage semantics vs the single-threaded oracle (SURVEY.md §5 matrix)."""

import numpy as np
import pyarrow as pa
import pytest

from debezium_connector_db2_ray.lsn import Lsn
from debezium_connector_db2_ray.ops import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_AFTER,
    OP_UPDATE_BEFORE,
    OP_UPDATE_SINGLE,
)
from debezium_connector_db2_ray.pipelines.oracle import (
    OrphanBeforeImageError,
    oracle_apply,
)
from debezium_connector_db2_ray.schema import changelog_schema
from debezium_connector_db2_ray.sources.genlog import generate_scenario
from debezium_connector_db2_ray.stages.apply import (
    apply_partition,
    fence_filter,
    final_state,
    lww_collapse,
    offset_skip,
    partition_ids,
)

SNAP = Lsn(0, 1000)


def mklog(rows):
    """rows: (commit_lo, intent_lo, op, conv, turn, text)"""
    return pa.table(
        {
            "commit_lsn_hi": pa.array([0] * len(rows), pa.uint64()),
            "commit_lsn_lo": pa.array([r[0] for r in rows], pa.uint64()),
            "intent_lsn_hi": pa.array([0] * len(rows), pa.uint64()),
            "intent_lsn_lo": pa.array([r[1] for r in rows], pa.uint64()),
            "op": pa.array([r[2] for r in rows], pa.int8()),
            "conv_id": pa.array([r[3] for r in rows], pa.string()),
            "turn_idx": pa.array([r[4] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[5] for r in rows], pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
        },
        schema=changelog_schema(),
    )


def finals(collapsed):
    t = final_state(collapsed)
    return {
        (c, i): x
        for c, i, x in zip(
            t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(), t["text"].to_pylist()
        )
    }


def test_insert_update_delete_lww():
    log = mklog(
        [
            (1001, 1, OP_INSERT, "a", 0, "v1"),
            (1002, 2, OP_UPDATE_SINGLE, "a", 0, "v2"),
            (1003, 3, OP_INSERT, "b", 1, "b1"),
            (1004, 4, OP_DELETE, "b", 1, "b1"),
            (1005, 5, OP_INSERT, "c", 2, "c1"),
        ]
    )
    out = finals(lww_collapse(log))
    assert out == {("a", 0): "v2", ("c", 2): "c1"}


def test_update_pair_after_wins_over_before():
    log = mklog(
        [
            (1001, 1, OP_INSERT, "a", 0, "old"),
            (1002, 2, OP_UPDATE_BEFORE, "a", 0, "old"),
            (1002, 3, OP_UPDATE_AFTER, "a", 0, "new"),
        ]
    )
    assert finals(lww_collapse(log)) == {("a", 0): "new"}


def test_orphan_before_image_raises():
    log = mklog(
        [
            (1001, 1, OP_INSERT, "a", 0, "old"),
            (1002, 2, OP_UPDATE_BEFORE, "a", 0, "old"),  # no after follows
        ]
    )
    with pytest.raises(OrphanBeforeImageError):
        lww_collapse(log, validate_pairs=True)
    # orphan that also WINS is caught even without validation
    with pytest.raises(OrphanBeforeImageError):
        lww_collapse(log, validate_pairs=False)
    # partial (combiner) pass tolerates it — partner may be in another batch
    lww_collapse(log, validate_pairs=False, partial=True)


def test_orphan_after_image_raises_with_validation():
    log = mklog(
        [
            (1001, 1, OP_INSERT, "a", 0, "old"),
            (1002, 2, OP_UPDATE_AFTER, "a", 0, "new"),  # no before precedes
        ]
    )
    with pytest.raises(OrphanBeforeImageError):
        lww_collapse(log, validate_pairs=True)


def test_delivery_order_insensitive():
    rows = [
        (1001, 1, OP_INSERT, "a", 0, "v1"),
        (1002, 2, OP_UPDATE_BEFORE, "a", 0, "v1"),
        (1002, 3, OP_UPDATE_AFTER, "a", 0, "v2"),
        (1003, 4, OP_DELETE, "a", 0, "v2"),
        (1004, 5, OP_INSERT, "a", 0, "v3"),
    ]
    expect = {("a", 0): "v3"}
    rng = np.random.default_rng(0)
    for _ in range(5):
        perm = rng.permutation(len(rows))
        log = mklog([rows[i] for i in perm])
        assert finals(lww_collapse(log)) == expect


def test_pk_move_is_delete_plus_insert():
    # reference: PK update becomes DELETE old key + INSERT new key
    # (Db2ConnectorIT.java:161-257)
    log = mklog(
        [
            (1001, 1, OP_INSERT, "a", 0, "x"),
            (1002, 2, OP_DELETE, "a", 0, "x"),
            (1002, 3, OP_INSERT, "a", 100, "x"),
        ]
    )
    assert finals(lww_collapse(log)) == {("a", 100): "x"}


def test_fence_filter_snapshot_completed_semantics():
    log = mklog(
        [
            (999, 1, OP_INSERT, "a", 0, "below"),
            (1000, 2, OP_INSERT, "b", 0, "at"),
            (1001, 3, OP_INSERT, "c", 0, "above"),
        ]
    )
    done = fence_filter(log, SNAP, snapshot_completed=True)
    assert done["text"].to_pylist() == ["above"]
    # incomplete snapshot: replay from the un-incremented watermark
    notdone = fence_filter(log, SNAP, snapshot_completed=False)
    assert notdone.num_rows == 3


def test_offset_skip_restart_rule():
    log = mklog(
        [
            (1001, 1, OP_INSERT, "a", 0, "old1"),
            (1002, 2, OP_INSERT, "a", 1, "mid1"),
            (1002, 3, OP_INSERT, "a", 2, "mid2"),
            (1003, 4, OP_INSERT, "a", 3, "new1"),
        ]
    )
    # offset at commit 1002 / intent 2: strictly-below and at-with-intent<=2 skip
    out = offset_skip(log, Lsn(0, 1002), Lsn(0, 2))
    assert out["text"].to_pylist() == ["mid2", "new1"]
    # serial variant: saved serial 2 within commit 1002 skips both rows
    out2 = offset_skip(log, Lsn(0, 1002), Lsn(0, 0), offset_serial=2)
    assert out2["text"].to_pylist() == ["new1"]


def test_apply_partition_snapshot_union_and_schema_evolution():
    snap = pa.table(
        {
            "conv_id": ["a", "b"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": ["user", "user"],
            "text": ["s_a", "s_b"],
            "tool": pa.array([None, None], pa.string()),
            "ts": pa.array([0, 0], pa.timestamp("us")),
        }
    )
    log = mklog(
        [
            (1001, 1, OP_UPDATE_SINGLE, "a", 0, "updated"),
            (1000, 2, OP_UPDATE_SINGLE, "b", 0, "must-be-fenced"),
        ]
    )
    # widen: changelog gains a lang column (additive evolution)
    log = log.append_column("lang", pa.array(["en", "fr"], pa.string()))
    out = apply_partition(log, snap, snapshot_lsn=SNAP)
    st = final_state(out)
    d = {
        (c, t): (x, lg)
        for c, t, x, lg in zip(
            st["conv_id"].to_pylist(),
            st["turn_idx"].to_pylist(),
            st["text"].to_pylist(),
            st["lang"].to_pylist(),
        )
    }
    # a updated (and carries lang), b keeps snapshot text with lang null-backfilled
    assert d == {("a", 0): ("updated", "en"), ("b", 0): ("s_b", None)}


def test_partition_ids_stable_and_salted():
    conv = pa.array(["a", "b", "a", "c"])
    turn = np.array([0, 1, 5, 2])
    p1 = partition_ids(conv, turn, 8, salt=1)
    p2 = partition_ids(conv, turn, 8, salt=1)
    assert (p1 == p2).all()
    assert p1[0] == p1[2]  # same conv -> same partition
    ps = partition_ids(conv, turn, 8, salt=4)
    assert (ps == partition_ids(conv, turn, 8, salt=4)).all()


@pytest.mark.parametrize("shuffle", [False, True])
def test_scenario_matches_oracle(shuffle):
    sc = generate_scenario(
        n_convs=20, turns_per_conv=5, n_commits=300, seed=7, shuffle_delivery=shuffle
    )
    expected = oracle_apply(sc.lake, sc.ordered_changelog, sc.snapshot_lsn)
    got = final_state(
        apply_partition(sc.changelog, sc.lake, snapshot_lsn=sc.snapshot_lsn)
    )
    got = got.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.select(expected.column_names).equals(expected)


def test_scenario_with_skew_and_fence_events_matches_oracle():
    sc = generate_scenario(
        n_convs=10,
        turns_per_conv=4,
        n_commits=400,
        seed=11,
        hot_fraction=0.5,
        events_at_fence=20,
    )
    expected = oracle_apply(sc.lake, sc.ordered_changelog, sc.snapshot_lsn)
    got = final_state(
        apply_partition(sc.changelog, sc.lake, snapshot_lsn=sc.snapshot_lsn)
    )
    got = got.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.select(expected.column_names).equals(expected)


def test_schema_evolution_scenario_matches_oracle():
    sc = generate_scenario(
        n_convs=15, turns_per_conv=4, n_commits=300, seed=13, add_column_after=0.5
    )
    assert "lang" in sc.changelog.column_names
    expected = oracle_apply(sc.lake, sc.ordered_changelog, sc.snapshot_lsn)
    got = final_state(
        apply_partition(sc.changelog, sc.lake, snapshot_lsn=sc.snapshot_lsn)
    )
    got = got.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.select(expected.column_names).equals(expected)
