"""Metrics/catalog, stop-LSN fence, system-table predicate, datatype
propagation, case-sensitive names."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from debezium_connector_db2_ray.lsn import Lsn
from debezium_connector_db2_ray.ops import OP_INSERT, OP_UPDATE_SINGLE
from debezium_connector_db2_ray.schema import propagate_source_types
from debezium_connector_db2_ray.stages.apply import (
    is_system_table,
    lww_collapse,
    stop_lsn_fence,
)

from .test_apply import finals, mklog


def test_stop_lsn_fence_drops_at_and_above():
    log = mklog(
        [
            (1001, 1, OP_INSERT, "a", 0, "keep"),
            (1002, 2, OP_INSERT, "b", 0, "at-stop"),
            (1003, 3, OP_INSERT, "c", 0, "above"),
        ]
    )
    out = stop_lsn_fence(log, Lsn(0, 1002))
    assert out["text"].to_pylist() == ["keep"]


def test_dual_capture_instance_switch():
    """Old instance fenced at stopLsn; new instance carries the overlap —
    union replays without duplicates (J4 semantics)."""
    old = mklog(
        [
            (1001, 1, OP_INSERT, "a", 0, "v1"),
            (1002, 2, OP_UPDATE_SINGLE, "a", 0, "dup-from-old"),  # >= stop
        ]
    )
    new = mklog(
        [
            (1002, 2, OP_UPDATE_SINGLE, "a", 0, "v2"),
            (1003, 3, OP_INSERT, "b", 1, "v3"),
        ]
    )
    merged = pa.concat_tables([stop_lsn_fence(old, Lsn(0, 1002)), new])
    assert finals(lww_collapse(merged)) == {("a", 0): "v2", ("b", 1): "v3"}


def test_system_table_predicate():
    assert is_system_table("IBMSNAP_REGISTER")
    assert is_system_table("ibmqrep_foo")
    assert is_system_table("ASNCDC.CDC_X")
    assert is_system_table("SYSTOOLS.T")
    assert not is_system_table("DB2INST1.TABLEA")
    assert not is_system_table("transcripts")


def test_propagate_source_types_metadata():
    s = pa.schema([("text", pa.string()), ("turn_idx", pa.int32())])
    out = propagate_source_types(
        s, {"text": {"type": "VARCHAR", "length": 512}}
    )
    md = out.field("text").metadata
    assert md[b"__debezium.source.column.type"] == b"VARCHAR"
    assert md[b"__debezium.source.column.length"] == b"512"
    assert out.field("turn_idx").metadata is None


def test_case_sensitive_keys_preserved():
    # reference: Db2CaseSensitiveObjectIT — names verbatim, case distinct
    log = mklog(
        [
            (1001, 1, OP_INSERT, "Conv_A", 0, "upper"),
            (1002, 2, OP_INSERT, "conv_a", 0, "lower"),
        ]
    )
    out = finals(lww_collapse(log))
    assert out == {("Conv_A", 0): "upper", ("conv_a", 0): "lower"}


def test_metrics_and_catalog(ray_session, tmp_path):
    import ray.data as rd

    from debezium_connector_db2_ray.metrics import catalog, collect_metrics
    from debezium_connector_db2_ray.pipelines.oracle import oracle_apply
    from debezium_connector_db2_ray.pipelines.replay import CdcEngine
    from debezium_connector_db2_ray.sources.genlog import generate_scenario

    sc = generate_scenario(n_convs=10, turns_per_conv=3, n_commits=100, seed=5)
    d = tmp_path / "data"
    d.mkdir()
    pq.write_table(sc.lake, str(d / "lake.parquet"))
    pq.write_table(sc.changelog, str(d / "changelog.parquet"))
    out = str(tmp_path / "out")
    eng = CdcEngine(out_dir=out, num_partitions=4)
    eng.snapshot(rd.read_parquet(str(d / "lake.parquet")), sc.snapshot_lsn)
    eng.replay_from_parquet(
        str(d / "changelog.parquet"), sc.snapshot_lsn, sc.max_lsn, 2
    )
    m = collect_metrics(out)
    assert m.snapshot_completed
    assert m.windows_committed == 2
    assert m.watermark == sc.max_lsn.hex()
    assert m.op_counts.get("read") == sc.lake.num_rows
    stream_ops = sum(
        v for k, v in m.op_counts.items() if k not in ("read",)
    )
    assert stream_ops > 0
    assert m.live_file_count > 0
    assert m.max_partition_skew >= 1.0
    cat = catalog(out)
    assert cat[0]["table"] == "transcripts"
    assert cat[0]["state"] == "active"
    assert "conv_id" in cat[0]["columns"]


def test_vanished_changelog_skip(ray_session, tmp_path):
    from debezium_connector_db2_ray.lsn import Lsn
    from debezium_connector_db2_ray.pipelines.replay import CdcEngine

    eng = CdcEngine(out_dir=str(tmp_path / "o"), num_partitions=2)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        eng.replay_from_parquet("/nonexistent/log", Lsn(0, 1), Lsn(0, 10), 1)
    assert (
        eng.replay_from_parquet(
            "/nonexistent/log", Lsn(0, 1), Lsn(0, 10), 1, on_missing="skip"
        )
        == []
    )


def test_suggest_salt(ray_session, tmp_path):
    import pyarrow.parquet as pq_
    import ray.data as rd

    from debezium_connector_db2_ray.metrics import suggest_salt
    from debezium_connector_db2_ray.pipelines.replay import CdcEngine
    from debezium_connector_db2_ray.sources.genlog import generate_scenario

    # extreme skew: 90% of events hit one conversation
    sc = generate_scenario(
        n_convs=20, turns_per_conv=3, n_commits=300, seed=77, hot_fraction=0.9
    )
    d = tmp_path / "d"
    d.mkdir()
    pq_.write_table(sc.changelog, str(d / "cl.parquet"))
    out = str(tmp_path / "o")
    eng = CdcEngine(out_dir=out, num_partitions=8)
    eng.replay_from_parquet(str(d / "cl.parquet"), sc.snapshot_lsn, sc.max_lsn, 1)
    assert suggest_salt(out) > 1
    # balanced load -> no salt
    sc2 = generate_scenario(
        n_convs=50, turns_per_conv=3, n_commits=300, seed=78, hot_fraction=0.0
    )
    pq_.write_table(sc2.changelog, str(d / "cl2.parquet"))
    out2 = str(tmp_path / "o2")
    eng2 = CdcEngine(out_dir=out2, num_partitions=4)
    eng2.replay_from_parquet(str(d / "cl2.parquet"), sc2.snapshot_lsn, sc2.max_lsn, 1)
    assert suggest_salt(out2, skew_threshold=3.0) == 1
