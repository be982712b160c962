"""Signal-channel tests: signal-triggered chunked backfill and blocking
snapshot interleaved with streaming windows, durable ack, kill/resume
(reference: SignalProcessor wiring Db2ConnectorTask.java:142-161,
IncrementalSnapshotIT.java:186-209, BlockingSnapshotIT.java:132-138)."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from debezium_connector_db2_ray.lsn import Lsn
from debezium_connector_db2_ray.pipelines.oracle import oracle_apply
from debezium_connector_db2_ray.pipelines.replay import CdcEngine
from debezium_connector_db2_ray.sources.genlog import generate_scenario
from debezium_connector_db2_ray.state.manifest import load_manifests
from debezium_connector_db2_ray.state.signals import (
    mark_processed,
    pending_signals,
    send_signal,
)


def sorted_pdf(t: pa.Table):
    return (
        t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        .to_pandas()
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def scenario(tmp_path_factory):
    sc = generate_scenario(
        n_convs=30, turns_per_conv=5, n_commits=400, seed=33, hot_fraction=0.2
    )
    d = tmp_path_factory.mktemp("cdc_signals")
    pq.write_table(sc.lake, str(d / "lake.parquet"))
    pq.write_table(sc.changelog, str(d / "changelog.parquet"))
    expected = oracle_apply(sc.lake, sc.ordered_changelog, sc.snapshot_lsn)
    return sc, str(d), expected


def test_signal_queue_roundtrip(tmp_path):
    out = str(tmp_path / "q")
    sid = send_signal(out, "execute-snapshot", {"type": "INCREMENTAL", "chunks": 2})
    send_signal(out, "log", {"message": "hello"})
    sigs = pending_signals(out)
    assert [s.type for s in sigs] == ["execute-snapshot", "log"]
    assert sigs[0].data["chunks"] == 2
    mark_processed(out, sid)
    assert [s.type for s in pending_signals(out)] == ["log"]
    mark_processed(out, sigs[1].id)
    assert pending_signals(out) == []


def test_signal_backfill_interleaves_with_stream(ray_session, scenario, tmp_path):
    import ray.data as rd

    sc, data_dir, expected = scenario
    out = str(tmp_path / "interleave")
    eng = CdcEngine(out_dir=out, num_partitions=4)
    lake = lambda: rd.read_parquet(os.path.join(data_dir, "lake.parquet"))  # noqa: E731
    eng.snapshot(lake(), sc.snapshot_lsn)
    # signal queued BEFORE streaming: the first between-window drain runs it
    sid = send_signal(out, "execute-snapshot", {"type": "INCREMENTAL", "chunks": 3})
    eng.replay_from_parquet(
        os.path.join(data_dir, "changelog.parquet"),
        sc.snapshot_lsn, sc.max_lsn, 3, signal_lake=lake,
    )
    ms = load_manifests(out)
    chunk_ids = [m.window_id for m in ms if m.kind.startswith(f"snapshot_chunk:{sid}")]
    stream_ids = [m.window_id for m in ms if m.kind == "stream"]
    assert len(chunk_ids) == 3
    assert len(stream_ids) == 3
    # chunks ran between windows: all chunk manifests precede the last stream
    assert max(chunk_ids) < max(stream_ids)
    assert pending_signals(out) == []  # durably acked
    got = pa.Table.from_pandas(
        eng.state_dataset().to_pandas(), preserve_index=False
    ).select(expected.column_names)
    assert sorted_pdf(got).equals(sorted_pdf(expected))


def test_signal_survives_kill_and_resumes(ray_session, scenario, tmp_path):
    import ray.data as rd

    sc, data_dir, expected = scenario
    out = str(tmp_path / "resume")
    eng = CdcEngine(out_dir=out, num_partitions=4)
    lake = lambda: rd.read_parquet(os.path.join(data_dir, "lake.parquet"))  # noqa: E731
    eng.snapshot(lake(), sc.snapshot_lsn)
    mid = Lsn(0, (sc.snapshot_lsn.to_int() + sc.max_lsn.to_int()) // 2)
    eng.replay_from_parquet(
        os.path.join(data_dir, "changelog.parquet"), sc.snapshot_lsn, mid, 2
    )
    # a backfill signal arrives, then the process "dies" before draining it
    sid = send_signal(out, "execute-snapshot", {"type": "INCREMENTAL", "chunks": 2})
    assert len(pending_signals(out)) == 1
    # resume in a fresh engine: drain happens before the remaining windows.
    # The backfill reads the source table's CURRENT state (at the watermark),
    # exactly as the reference's chunked SELECT does — not a stale snapshot.
    upto_mid = sc.ordered_changelog.filter(
        pc.less_equal(sc.ordered_changelog["commit_lsn_lo"], mid.lo)
    )
    lake_at_mid = oracle_apply(sc.lake, upto_mid, sc.snapshot_lsn)
    eng2 = CdcEngine(out_dir=out, num_partitions=4)
    eng2.replay_from_parquet(
        os.path.join(data_dir, "changelog.parquet"), mid, sc.max_lsn, 2,
        signal_lake=lambda: rd.from_arrow(lake_at_mid),
    )
    assert pending_signals(out) == []
    ms = load_manifests(out)
    assert sum(m.kind.startswith(f"snapshot_chunk:{sid}") for m in ms) == 2
    got = pa.Table.from_pandas(
        eng2.state_dataset().to_pandas(), preserve_index=False
    ).select(expected.column_names)
    assert sorted_pdf(got).equals(sorted_pdf(expected))


def test_blocking_snapshot_signal_supersedes_and_stream_resumes(
    ray_session, scenario, tmp_path
):
    import ray.data as rd

    sc, data_dir, expected = scenario
    out = str(tmp_path / "blocking")
    eng = CdcEngine(out_dir=out, num_partitions=4)
    eng.snapshot(
        rd.read_parquet(os.path.join(data_dir, "lake.parquet")), sc.snapshot_lsn
    )
    mid = Lsn(0, (sc.snapshot_lsn.to_int() + sc.max_lsn.to_int()) // 2)
    eng.replay_from_parquet(
        os.path.join(data_dir, "changelog.parquet"), sc.snapshot_lsn, mid, 2
    )
    # blocking snapshot mid-stream: the source "lake" at the watermark is the
    # oracle state at mid — the re-snapshot must supersede and streaming must
    # continue to the same final state
    upto_mid = sc.ordered_changelog.filter(
        pc.less_equal(sc.ordered_changelog["commit_lsn_lo"], mid.lo)
    )
    lake_at_mid = oracle_apply(sc.lake, upto_mid, sc.snapshot_lsn)
    send_signal(out, "execute-snapshot", {"type": "BLOCKING"})
    eng.replay_from_parquet(
        os.path.join(data_dir, "changelog.parquet"), mid, sc.max_lsn, 2,
        signal_lake=lambda: rd.from_arrow(lake_at_mid),
    )
    ms = load_manifests(out)
    assert any(m.kind == "snapshot_replace" for m in ms)
    assert pending_signals(out) == []
    got = pa.Table.from_pandas(
        eng.state_dataset().to_pandas(), preserve_index=False
    ).select(expected.column_names)
    assert sorted_pdf(got).equals(sorted_pdf(expected))


def test_unknown_and_log_signals_are_acked(ray_session, scenario, tmp_path):
    sc, data_dir, _ = scenario
    out = str(tmp_path / "unknown")
    eng = CdcEngine(out_dir=out, num_partitions=2)
    send_signal(out, "log", {"message": "note"})
    send_signal(out, "no-such-action", {"x": 1})
    ms = eng.drain_signals(lambda: (_ for _ in ()).throw(AssertionError("no lake read")))
    assert ms == []
    assert pending_signals(out) == []


def test_notification_channel_records_progress(ray_session, scenario, tmp_path):
    """The notification channel (reference NotificationsIT semantics) logs
    snapshot STARTED/COMPLETED, per-chunk incremental progress, signal
    processing, and compaction."""
    import ray.data as rd

    sc, data_dir, _ = scenario
    out = str(tmp_path / "notif")
    eng = CdcEngine(out_dir=out, num_partitions=2, validate_pairs=False)
    lake = lambda: rd.read_parquet(os.path.join(data_dir, "lake.parquet"))  # noqa: E731
    eng.snapshot(lake(), sc.snapshot_lsn)
    send_signal(out, "execute-snapshot", {"type": "INCREMENTAL", "chunks": 2})
    eng.drain_signals(lake)
    eng.compact()
    kinds = [(n.aggregate_type, n.type) for n in eng.notifications.read()]
    assert ("Initial Snapshot", "STARTED") in kinds
    assert ("Initial Snapshot", "COMPLETED") in kinds
    assert ("Incremental Snapshot", "IN_PROGRESS") in kinds
    assert ("Incremental Snapshot", "COMPLETED") in kinds
    assert ("Signal", "PROCESSED") in kinds
    assert ("Compaction", "COMPLETED") in kinds
    # ordering: snapshot STARTED precedes its COMPLETED
    assert kinds.index(("Initial Snapshot", "STARTED")) < kinds.index(
        ("Initial Snapshot", "COMPLETED")
    )


def test_stop_snapshot_cancels_pending(ray_session, scenario, tmp_path):
    """A stop-snapshot signal cancels a pending execute-snapshot (by tag
    and by 'all') without running its chunks — the StopSnapshotAction
    shape on a killed-mid-flight snapshot."""
    import ray.data as rd

    sc, data_dir, _ = scenario
    out = str(tmp_path / "stop")
    eng = CdcEngine(out_dir=out, num_partitions=4)
    lake = lambda: rd.read_parquet(os.path.join(data_dir, "lake.parquet"))  # noqa: E731
    eng.snapshot(lake(), sc.snapshot_lsn)
    sid = send_signal(out, "execute-snapshot",
                      {"type": "INCREMENTAL", "chunks": 3})
    send_signal(out, "stop-snapshot", {"tag": sid})
    ms = eng.drain_signals(lake)
    assert ms == []  # nothing ran
    assert pending_signals(out) == []  # both signals durably acked
    kinds = [m.kind for m in load_manifests(out)]
    assert not any(k.startswith("snapshot_chunk") for k in kinds)
    from debezium_connector_db2_ray.state.notifications import (
        NotificationLog,
    )

    notes = NotificationLog(out).read()
    assert any(n.type == "ABORTED" for n in notes)


def test_pause_resume_snapshot_latch(ray_session, scenario, tmp_path):
    """pause-snapshot leaves execute-snapshot signals PENDING un-acked;
    after resume-snapshot the next drain runs them to completion."""
    import ray.data as rd

    sc, data_dir, _ = scenario
    out = str(tmp_path / "pause")
    eng = CdcEngine(out_dir=out, num_partitions=4)
    lake = lambda: rd.read_parquet(os.path.join(data_dir, "lake.parquet"))  # noqa: E731
    eng.snapshot(lake(), sc.snapshot_lsn)
    send_signal(out, "pause-snapshot")
    sid = send_signal(out, "execute-snapshot",
                      {"type": "INCREMENTAL", "chunks": 2})
    assert eng.drain_signals(lake) == []
    # the execute signal is still pending (paused), the pause is acked
    assert [s.id for s in pending_signals(out)] == [sid]
    send_signal(out, "resume-snapshot")
    ms = eng.drain_signals(lake)
    assert len(ms) == 2  # both chunks ran after resume
    assert pending_signals(out) == []
    kinds = [m.kind for m in load_manifests(out)]
    assert sum(k.startswith(f"snapshot_chunk:{sid}") for k in kinds) == 2
