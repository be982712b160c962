"""Durable offset parity: the manifest persists the reference's offset
triplet {commit_lsn, change_lsn, event_serial_no} (Db2OffsetContext.java:66-80)
and offset_skip resumes at serial granularity against it."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from debezium_connector_db2_ray.lsn import Lsn, lsn_from_hex
from debezium_connector_db2_ray.ops import (
    OP_INSERT,
    OP_UPDATE_AFTER,
    OP_UPDATE_BEFORE,
)
from debezium_connector_db2_ray.pipelines.replay import CdcEngine
from debezium_connector_db2_ray.schema import changelog_schema
from debezium_connector_db2_ray.stages.apply import offset_skip
from debezium_connector_db2_ray.state.manifest import (
    load_manifests,
    resume_offset,
)


def _changelog(rows):
    """rows: (commit_lo, intent_lo, op, conv_id, text)."""
    n = len(rows)
    return pa.table(
        {
            "commit_lsn_hi": pa.array([0] * n, pa.uint64()),
            "commit_lsn_lo": pa.array([r[0] for r in rows], pa.uint64()),
            "intent_lsn_hi": pa.array([0] * n, pa.uint64()),
            "intent_lsn_lo": pa.array([r[1] for r in rows], pa.uint64()),
            "op": pa.array([r[2] for r in rows], pa.int8()),
            "conv_id": pa.array([r[3] for r in rows], pa.string()),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array([r[4] for r in rows], pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array([0] * n, pa.timestamp("us")),
        },
        schema=changelog_schema(),
    )


LOG = [
    (110, 1, OP_INSERT, "c1", "one"),
    (120, 1, OP_INSERT, "c2", "two"),
    # final commit 130: insert + update pair = 3 rows (update serials count
    # per ROW, an update consumes two — Db2OffsetContext.java:95-104)
    (130, 1, OP_INSERT, "c3", "three"),
    (130, 2, OP_UPDATE_BEFORE, "c1", "one"),
    (130, 3, OP_UPDATE_AFTER, "c1", "one-v2"),
]


def test_manifest_persists_offset_triplet(ray_session, tmp_path):
    log = _changelog(LOG)
    path = str(tmp_path / "log.parquet")
    pq.write_table(log, path)
    out = str(tmp_path / "lake")
    eng = CdcEngine(out_dir=out, num_partitions=2, validate_pairs=True)
    eng.replay_from_parquet(path, Lsn(0, 100), Lsn(0, 130), 2)
    ms = [m for m in load_manifests(out) if m.kind == "stream"]
    last = max(ms, key=lambda m: m.window_id)
    rp = last.resume_position
    assert rp is not None
    assert rp["commit_lsn"] == Lsn(0, 130).hex()
    assert rp["change_lsn"] == Lsn(0, 3).hex()  # max intent within the commit
    assert rp["event_serial_no"] == 3
    assert resume_offset(out) == rp


def test_offset_skip_resumes_at_serial_granularity(ray_session, tmp_path):
    log = _changelog(LOG)
    path = str(tmp_path / "log.parquet")
    pq.write_table(log, path)
    out = str(tmp_path / "lake")
    eng = CdcEngine(out_dir=out, num_partitions=2)
    eng.replay_from_parquet(path, Lsn(0, 100), Lsn(0, 130), 1)
    rp = resume_offset(out)
    commit = lsn_from_hex(rp["commit_lsn"])
    change = lsn_from_hex(rp["change_lsn"])
    # the persisted offset dedups the whole stream on a reference-style
    # restart: nothing at or below (commit, serial) replays
    remaining = offset_skip(log, commit, change, rp["event_serial_no"])
    assert remaining.num_rows == 0
    # a mid-commit offset (serial 2 of 3) replays exactly the commit's tail
    remaining = offset_skip(log, commit, Lsn(0, 2), 2)
    assert remaining.num_rows == 1
    assert remaining["intent_lsn_lo"][0].as_py() == 3


def test_resume_position_spans_partitioned_commit(ray_session, tmp_path):
    """A commit whose rows scatter across hash partitions still reports the
    full serial count (events of one commit touch many keys)."""
    rows = [(200, i, OP_INSERT, f"c{i}", f"t{i}") for i in range(1, 6)]
    log = _changelog([(150, 1, OP_INSERT, "c0", "zero")] + rows)
    path = str(tmp_path / "log.parquet")
    pq.write_table(log, path)
    out = str(tmp_path / "lake")
    eng = CdcEngine(out_dir=out, num_partitions=4)
    eng.replay_from_parquet(path, Lsn(0, 100), Lsn(0, 200), 1)
    rp = resume_offset(out)
    assert rp["commit_lsn"] == Lsn(0, 200).hex()
    assert rp["event_serial_no"] == 5
    assert rp["change_lsn"] == Lsn(0, 5).hex()
