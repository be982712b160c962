"""Snapshotter SPI tests: mode registry, schema_only, custom injection
(reference: snapshot.mode enum Db2ConnectorConfig.java:64-109; injectable
Snapshotter CustomTestSnapshot.java:26-81)."""

import pyarrow as pa
import pytest

from debezium_connector_db2_ray.lsn import Lsn
from debezium_connector_db2_ray.ops import OP_INSERT
from debezium_connector_db2_ray.pipelines.replay import CdcEngine
from debezium_connector_db2_ray.schema import changelog_schema
from debezium_connector_db2_ray.snapshotter import (
    AlwaysSnapshotter,
    NoDataSnapshotter,
    Snapshotter,
    resolve_snapshotter,
)
from debezium_connector_db2_ray.state.manifest import (
    committed_watermark,
    load_manifests,
)

LAKE = pa.table(
    {
        "conv_id": ["c1", "c2"],
        "turn_idx": pa.array([0, 0], pa.int32()),
        "role": ["user", "user"],
        "text": ["one", "two"],
        "tool": pa.array([None, None], pa.string()),
        "ts": pa.array([0, 0], pa.timestamp("us")),
    }
)


def _stream_one(eng, commit_lo, conv, text):
    import ray.data as rd

    log = pa.table(
        {
            "commit_lsn_hi": pa.array([0], pa.uint64()),
            "commit_lsn_lo": pa.array([commit_lo], pa.uint64()),
            "intent_lsn_hi": pa.array([0], pa.uint64()),
            "intent_lsn_lo": pa.array([commit_lo], pa.uint64()),
            "op": pa.array([OP_INSERT], pa.int8()),
            "conv_id": pa.array([conv], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"], pa.string()),
            "text": pa.array([text], pa.string()),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([0], pa.timestamp("us")),
        },
        schema=changelog_schema(),
    )
    return eng.replay_window(rd.from_arrow(log), Lsn(0, 100), Lsn(0, commit_lo))


def test_mode_registry_and_custom_passthrough():
    assert resolve_snapshotter("initial").name == "initial"
    assert resolve_snapshotter("always").replace
    assert resolve_snapshotter("schema_only").name == "no_data"
    assert not resolve_snapshotter("initial_only").should_stream()
    custom = AlwaysSnapshotter()
    assert resolve_snapshotter(custom) is custom
    with pytest.raises(ValueError, match="unknown snapshot mode"):
        resolve_snapshotter("bogus")
    wn = resolve_snapshotter("when_needed")
    assert wn.should_snapshot_data(False, False)
    assert wn.should_snapshot_data(True, True)  # prior snapshot incomplete
    assert not wn.should_snapshot_data(True, False)
    from debezium_connector_db2_ray.snapshotter import (
        ConfigurationBasedSnapshotter,
    )

    cb = ConfigurationBasedSnapshotter(snapshot_data=False, stream=False)
    assert not cb.should_snapshot_data(False, False)
    assert cb.should_snapshot_schema(False, False)
    assert not cb.should_stream()


def test_initial_mode_skips_data_when_offset_exists(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "initial")
    eng = CdcEngine(out_dir=out, num_partitions=2)
    m1 = eng.run_snapshot(rd.from_arrow(LAKE), Lsn(0, 100), mode="initial")
    assert m1 is not None and m1.kind == "snapshot"
    # second start with an offset: INITIAL reads nothing, resumes
    m2 = eng.run_snapshot(rd.from_arrow(LAKE), Lsn(0, 100), mode="initial")
    assert m2 is None
    assert sum(m.kind == "snapshot" for m in load_manifests(out)) == 1


def test_schema_only_mode_streams_over_empty_base(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "schema_only")
    eng = CdcEngine(out_dir=out, num_partitions=2)
    m = eng.run_snapshot(rd.from_arrow(LAKE), Lsn(0, 100), mode="schema_only")
    assert m.kind == "schema_only" and m.partitions == {}
    assert committed_watermark(out) == Lsn(0, 100)
    # schema recorded even without data (reference schema_only semantics)
    assert eng.schema_history.boundaries("transcripts")
    _stream_one(eng, 150, "c9", "nine")
    got = eng.state_dataset().to_pandas()
    assert set(got["conv_id"]) == {"c9"}  # streamed rows only, no base rows


def test_always_mode_replaces_via_run_snapshot(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "always")
    eng = CdcEngine(out_dir=out, num_partitions=2)
    eng.run_snapshot(rd.from_arrow(LAKE), Lsn(0, 100), mode="always")
    _stream_one(eng, 150, "c9", "nine")
    lake_v2 = LAKE.set_column(
        LAKE.column_names.index("text"), "text", pa.array(["one-v2", "two-v2"])
    )
    m = eng.run_snapshot(rd.from_arrow(lake_v2), Lsn(0, 200), mode="always")
    assert m.kind == "snapshot_replace"
    got = eng.state_dataset().to_pandas()
    assert set(got["text"]) == {"one-v2", "two-v2"}  # c9 superseded


def test_custom_snapshotter_projection_and_table_skip(ray_session, tmp_path):
    import ray.data as rd

    class ProjectingSnapshot(Snapshotter):
        """CustomTestSnapshot analog: skip table 'tableb' without prior
        state; project a column subset elsewhere."""

        name = "custom-test"

        def __init__(self, has_state: bool):
            self.has_state = has_state

        def should_snapshot_data(self, offset_exists, snapshot_in_progress):
            return True

        def snapshot_projection(self, table, columns):
            if not self.has_state and table == "tableb":
                return None
            return [c for c in columns if c != "tool"]

    out = str(tmp_path / "custom_skip")
    eng = CdcEngine(out_dir=out, num_partitions=2, table_name="tableb")
    m = eng.run_snapshot(
        rd.from_arrow(LAKE), Lsn(0, 100), mode=ProjectingSnapshot(False)
    )
    assert m.kind == "schema_only"  # table skipped, watermark still set
    out2 = str(tmp_path / "custom_proj")
    eng2 = CdcEngine(out_dir=out2, num_partitions=2, table_name="tablea")
    m2 = eng2.run_snapshot(
        rd.from_arrow(LAKE), Lsn(0, 100), mode=ProjectingSnapshot(False)
    )
    assert m2.kind == "snapshot"
    got = eng2.state_dataset().to_pandas()
    # projection applied at the SELECT: the column exists in the table
    # schema (recorded at CREATE) but its values were never read — nulls,
    # exactly like the reference's snapshot.select.statement.overrides
    assert got["tool"].isna().all()
    assert set(got["conv_id"]) == {"c1", "c2"}


def test_when_needed_resnapshots_incomplete_chunked(ray_session, tmp_path):
    """when_needed: an interrupted chunked snapshot (no final chunk) counts
    as snapshot-in-progress, so the next start re-snapshots even though a
    watermark exists (Db2ConnectorConfig.java:95-98)."""
    import ray.data as rd

    out = str(tmp_path / "when_needed")
    eng = CdcEngine(out_dir=out, num_partitions=4)
    # 1 of 3 chunks, then "die"
    eng.incremental_snapshot(
        rd.from_arrow(LAKE), Lsn(0, 100), n_chunks=3, max_chunks_per_call=1
    )
    assert eng.snapshot_in_progress()
    m = eng.run_snapshot(rd.from_arrow(LAKE), Lsn(0, 100), mode="when_needed")
    assert m is not None and m.kind == "snapshot"
    assert not eng.snapshot_in_progress()
    # INITIAL in the same state would have skipped data
    out2 = str(tmp_path / "initial_skips")
    eng2 = CdcEngine(out_dir=out2, num_partitions=4)
    eng2.incremental_snapshot(
        rd.from_arrow(LAKE), Lsn(0, 100), n_chunks=3, max_chunks_per_call=1
    )
    # initial: offset exists (chunk watermark) but in_progress ALSO triggers
    # the base policy, matching the reference's shouldSnapshotData contract
    m2 = eng2.run_snapshot(rd.from_arrow(LAKE), Lsn(0, 100), mode="initial")
    assert m2 is not None


def test_chunks_wiped_by_replace_barrier_rerun(ray_session, tmp_path):
    """Chunk manifests superseded by a snapshot_replace barrier must not
    satisfy a later backfill's resume check (live-manifests rule)."""
    import ray.data as rd

    out = str(tmp_path / "wiped")
    eng = CdcEngine(out_dir=out, num_partitions=2)
    ms1 = eng.incremental_snapshot(rd.from_arrow(LAKE), Lsn(0, 100), n_chunks=2)
    assert len(ms1) == 2
    eng.snapshot(rd.from_arrow(LAKE), Lsn(0, 150), replace=True)
    # same chunk identities again: the barrier killed the old ones, so the
    # backfill must actually re-run them
    ms2 = eng.incremental_snapshot(rd.from_arrow(LAKE), Lsn(0, 150), n_chunks=2)
    assert len(ms2) == 2


def test_connector_run_respects_should_stream(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.connector import CdcConnector

    conn = CdcConnector(root_dir=str(tmp_path / "lh"), num_partitions=2)
    stream = rd.from_arrow(
        pa.table(
            {
                "commit_lsn_hi": pa.array([0], pa.uint64()),
                "commit_lsn_lo": pa.array([150], pa.uint64()),
                "intent_lsn_hi": pa.array([0], pa.uint64()),
                "intent_lsn_lo": pa.array([150], pa.uint64()),
                "op": pa.array([2], pa.int8()),
                "conv_id": ["c9"],
                "turn_idx": pa.array([0], pa.int32()),
                "role": ["user"],
                "text": ["nine"],
                "tool": pa.array([None], pa.string()),
                "ts": pa.array([0], pa.timestamp("us")),
                "src_table": ["T1"],
            }
        )
    )
    res = conn.run(
        {"T1": rd.from_arrow(LAKE)}, stream, Lsn(0, 100), Lsn(0, 200), 1,
        mode="initial_only",
    )
    assert res["streams"] == {}  # policy said don't stream
    got = conn.state("T1").to_pandas()
    assert set(got["conv_id"]) == {"c1", "c2"}  # snapshot only, no c9


def test_configuration_based_raw_flags_and_data_error(ray_session, tmp_path):
    """Configuration-based decisions come from the RAW flags (reference
    semantics): data=True re-snapshots on every start (and therefore
    replaces); data=False + snapshot_on_data_error=True re-snapshots only
    when offsets exist but a prior snapshot never completed."""
    import ray.data as rd

    from debezium_connector_db2_ray.snapshotter import (
        ConfigurationBasedSnapshotter,
    )

    cb = ConfigurationBasedSnapshotter(snapshot_data=True)
    assert cb.should_snapshot_data(True, False)  # raw flag, offset ignored
    assert cb.replace
    assert not cb.should_snapshot_on_data_error()
    err = ConfigurationBasedSnapshotter(
        snapshot_data=False, snapshot_on_data_error=True
    )
    assert not err.should_snapshot_data(True, True)
    assert err.should_snapshot_on_data_error()

    out = str(tmp_path / "cb")
    eng = CdcEngine(out_dir=out, num_partitions=2)
    eng.run_snapshot(rd.from_arrow(LAKE), Lsn(0, 100), mode=cb)
    # restart with data=True: re-snapshots AND supersedes prior state
    lake_v2 = LAKE.set_column(
        LAKE.column_names.index("text"), "text", pa.array(["one-v2", "two-v2"])
    )
    m = eng.run_snapshot(rd.from_arrow(lake_v2), Lsn(0, 200), mode=cb)
    assert m is not None and m.kind == "snapshot_replace"
    got = eng.state_dataset().to_pandas()
    assert set(got["text"]) == {"one-v2", "two-v2"}
    # data=False never snapshots, even on first start
    out2 = str(tmp_path / "cb2")
    eng2 = CdcEngine(out_dir=out2, num_partitions=2)
    m2 = eng2.run_snapshot(
        rd.from_arrow(LAKE), Lsn(0, 100),
        mode=ConfigurationBasedSnapshotter(snapshot_data=False),
    )
    assert m2 is not None and m2.kind == "schema_only"
