"""Event-metadata provider + snapshot isolation/locking config surface.

Reference: Db2EventMetadataProvider.java:19-59 (event timestamp, source
position map, transaction id == commit LSN) and the snapshot.isolation.mode
/ snapshot.locking.mode enums (Db2ConnectorConfig.java:160-300), applied by
Db2SnapshotChangeEventSource.java:61-103 — documented no-ops over an
immutable parquet lake, but validated and echoed for config parity.
"""

import json
import os

import pyarrow as pa
import pytest

from debezium_connector_db2_ray.stages.envelope import (
    to_envelopes,
    with_source_info,
)
from debezium_connector_db2_ray.stages.metadata import (
    append_event_metadata,
    event_metadata,
    with_event_metadata,
)


def _changelog(rows):
    """rows: (commit_lo, intent_lo, op, conv, turn, text)"""
    return pa.table(
        {
            "commit_lsn_hi": pa.array([0] * len(rows), pa.uint64()),
            "commit_lsn_lo": pa.array([r[0] for r in rows], pa.uint64()),
            "intent_lsn_hi": pa.array([0] * len(rows), pa.uint64()),
            "intent_lsn_lo": pa.array([r[1] for r in rows], pa.uint64()),
            "op": pa.array([r[2] for r in rows], pa.int8()),
            "conv_id": pa.array([r[3] for r in rows]),
            "turn_idx": pa.array([r[4] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows)),
            "text": pa.array([r[5] for r in rows]),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(len(rows))],
                           pa.timestamp("us")),
        }
    )


def _envelopes(rows):
    env = to_envelopes(_changelog(rows), image_columns=("text", "ts"))
    return with_source_info(
        env, name="testdb-server", db="TESTDB", schema="DB2INST1",
        table="TRANSCRIPTS",
    )


class TestEventMetadata:
    def test_columns_and_values(self):
        env = _envelopes([(10, 0, 2, "c1", 0, "hi"), (11, 0, 1, "c1", 0, "hi")])
        meta = event_metadata(env)
        assert meta.column_names == [
            "event_ts_ms", "commit_lsn", "change_lsn", "transaction_id",
        ]
        # transaction id IS the commit LSN (Db2EventMetadataProvider.java:49-58)
        assert meta["transaction_id"].to_pylist() == meta["commit_lsn"].to_pylist()
        assert meta["commit_lsn"].to_pylist() == [
            "00000000:00000000:000000000000000a",
            "00000000:00000000:000000000000000b",
        ]
        # timestamp comes from the source block's ts_ms (epoch millis)
        assert meta["event_ts_ms"].to_pylist() == env["source_ts_ms"].to_pylist()

    def test_requires_source_info(self):
        env = to_envelopes(_changelog([(10, 0, 2, "c1", 0, "x")]),
                           image_columns=("text",))
        with pytest.raises(ValueError, match="source-info"):
            event_metadata(env)

    def test_append_preserves_envelope(self):
        env = _envelopes([(10, 0, 2, "c1", 0, "hi")])
        out = append_event_metadata(env)
        for c in env.column_names:
            assert c in out.column_names
        assert out["transaction_id"].to_pylist() == out["commit_lsn"].to_pylist()

    def test_dataset_stage(self, ray_session):
        import ray.data as rd

        env = _envelopes(
            [(10 + i, 0, 2, f"c{i}", 0, f"t{i}") for i in range(8)]
        )
        ds = with_event_metadata(rd.from_arrow(env))
        got = ds.take_batch(100, batch_format="pyarrow")
        assert "event_ts_ms" in got.column_names
        assert got["transaction_id"].to_pylist() == got["commit_lsn"].to_pylist()


class TestSnapshotIsolationConfig:
    def test_enum_values_match_reference(self):
        from debezium_connector_db2_ray.snapshotter import (
            SNAPSHOT_ISOLATION_MODES,
            SNAPSHOT_LOCKING_MODES,
            resolve_isolation_mode,
            resolve_locking_mode,
        )

        assert set(SNAPSHOT_ISOLATION_MODES) == {
            "exclusive", "repeatable_read", "read_committed",
            "read_uncommitted",
        }
        assert set(SNAPSHOT_LOCKING_MODES) == {"exclusive", "none", "custom"}
        assert resolve_isolation_mode(None) == "repeatable_read"
        assert resolve_locking_mode(None) == "exclusive"
        with pytest.raises(ValueError, match="isolation"):
            resolve_isolation_mode("serializable")
        with pytest.raises(ValueError, match="locking"):
            resolve_locking_mode("tablockx")

    def test_validate_config_rejects_unknown_isolation(self):
        from debezium_connector_db2_ray.config import validate_config

        errs = validate_config(snapshot_isolation_mode="serializable",
                               snapshot_locking_mode="none")
        assert list(errs) == ["snapshot_isolation_mode"]
        assert not validate_config(
            snapshot_isolation_mode="read_committed",
            snapshot_locking_mode="custom",
        )

    def test_snapshot_echoes_modes_in_notification(self, ray_session, tmp_path):
        import ray.data as rd

        from debezium_connector_db2_ray.lsn import Lsn
        from debezium_connector_db2_ray.pipelines.replay import CdcEngine

        lake = pa.table(
            {
                "conv_id": pa.array(["c1", "c2"]),
                "turn_idx": pa.array([0, 0], pa.int32()),
                "role": pa.array(["user", "user"]),
                "text": pa.array(["a", "b"]),
                "tool": pa.array([None, None], pa.string()),
                "ts": pa.array([0, 0], pa.timestamp("us")),
            }
        )
        out = str(tmp_path / "lake")
        eng = CdcEngine(out_dir=out, num_partitions=2)
        eng.snapshot(rd.from_arrow(lake), Lsn(0, 100),
                     isolation_mode="read_uncommitted", locking_mode="none")
        notif_path = os.path.join(out, "_notifications.jsonl")
        lines = [json.loads(x) for x in open(notif_path)]
        started = [n for n in lines
                   if n["aggregate_type"] == "Initial Snapshot"
                   and n["type"] == "STARTED"]
        assert started, lines
        assert started[0]["additional_data"]["isolation_mode"] == "read_uncommitted"
        assert started[0]["additional_data"]["locking_mode"] == "none"

    def test_snapshot_rejects_bad_mode(self, ray_session, tmp_path):
        import ray.data as rd

        from debezium_connector_db2_ray.lsn import Lsn
        from debezium_connector_db2_ray.pipelines.replay import CdcEngine

        lake = pa.table(
            {
                "conv_id": pa.array(["c1"]),
                "turn_idx": pa.array([0], pa.int32()),
                "role": pa.array(["user"]),
                "text": pa.array(["a"]),
                "tool": pa.array([None], pa.string()),
                "ts": pa.array([0], pa.timestamp("us")),
            }
        )
        eng = CdcEngine(out_dir=str(tmp_path / "lake2"), num_partitions=2)
        with pytest.raises(ValueError, match="isolation"):
            eng.snapshot(rd.from_arrow(lake), Lsn(0, 100),
                         isolation_mode="dirty_read")
