"""Schema system, schema history, envelope, CloudEvents, defaults, key
rewrite — unit tests mirroring the reference's schema/emitter suites
(SchemaHistoryTopicIT, SourceInfoTest, Db2DefaultValueConverterTest shapes)."""

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
from debezium_connector_db2_ray.schema import (
    PAYLOAD_SCHEMA,
    changelog_schema,
    conform_table,
    unify_payload_schemas,
)
from debezium_connector_db2_ray.stages.apply import lww_collapse
from debezium_connector_db2_ray.stages.cloudevents import to_cloudevents
from debezium_connector_db2_ray.stages.envelope import to_envelopes
from debezium_connector_db2_ray.state.schema_log import SchemaHistory

from .test_apply import mklog


# --- schema unification ----------------------------------------------------

def test_unify_additive_and_widening():
    old = pa.schema([("a", pa.int32()), ("b", pa.string())])
    new = pa.schema([("a", pa.int64()), ("b", pa.string()), ("c", pa.float32())])
    u = unify_payload_schemas(old, new)
    assert u.field("a").type == pa.int64()  # widened
    assert u.field("c").type == pa.float32()  # added
    assert [f.name for f in u] == ["a", "b", "c"]  # old first, additions after


def test_unify_rejects_non_additive_change():
    old = pa.schema([("a", pa.string())])
    new = pa.schema([("a", pa.int32())])
    with pytest.raises(TypeError):
        unify_payload_schemas(old, new)


def test_unify_int_to_float_widens_to_double():
    old = pa.schema([("a", pa.int32())])
    new = pa.schema([("a", pa.float32())])
    assert unify_payload_schemas(old, new).field("a").type == pa.float64()


def test_conform_backfills_null_and_defaults():
    t = pa.table({"a": pa.array([1, 2], pa.int32())})
    target = pa.schema([("a", pa.int64()), ("b", pa.string()), ("c", pa.int32())])
    out = conform_table(t, target, defaults={"c": 7})
    assert out["a"].type == pa.int64()
    assert out["b"].to_pylist() == [None, None]  # Debezium additive rule
    assert out["c"].to_pylist() == [7, 7]  # M12 default application


# --- schema history --------------------------------------------------------

def test_schema_history_record_recover(tmp_path):
    h = SchemaHistory(str(tmp_path))
    s1 = PAYLOAD_SCHEMA
    s2 = PAYLOAD_SCHEMA.append(pa.field("lang", pa.string()))
    h.record("CREATE", "transcripts", Lsn(0, 100), s1)
    h.record("ALTER", "transcripts", Lsn(0, 500), s2)
    h.record("ALTER", "transcripts", Lsn(0, 500), s2)  # idempotent replay
    # recovery in a "new process"
    h2 = SchemaHistory(str(tmp_path))
    assert h2.tables() == ["transcripts"]
    assert h2.schema_at("transcripts", Lsn(0, 100)).equals(s1)
    assert h2.schema_at("transcripts", Lsn(0, 499)).equals(s1)
    assert h2.schema_at("transcripts", Lsn(0, 500)).equals(s2)  # at-or-before
    assert h2.schema_at("transcripts", Lsn(1, 0)).equals(s2)
    assert h2.schema_at("transcripts", Lsn(0, 99)) is None
    bounds = h2.boundaries("transcripts")
    assert [b[0] for b in bounds] == [Lsn(0, 100), Lsn(0, 500)]
    assert len(SchemaHistory(str(tmp_path))._records) == 2


# --- envelopes -------------------------------------------------------------

def env_log():
    return mklog(
        [
            (1001, 1, OP_INSERT, "a", 0, "i1"),
            (1002, 2, OP_UPDATE_BEFORE, "a", 0, "i1"),
            (1002, 3, OP_UPDATE_AFTER, "a", 0, "u1"),
            (1003, 4, OP_DELETE, "a", 0, "u1"),
            (1004, 5, OP_UPDATE_SINGLE, "b", 1, "s1"),
        ]
    )


def test_envelope_zip_images_and_serials():
    env = to_envelopes(env_log(), image_columns=("text",))
    rows = env.to_pylist()
    assert [r["op_char"] for r in rows] == ["c", "u", "d", "u"]
    # before/after selection (Db2ChangeRecordEmitter.java:56-78)
    assert rows[0]["before_text"] is None and rows[0]["after_text"] == "i1"
    assert rows[1]["before_text"] == "i1" and rows[1]["after_text"] == "u1"
    assert rows[2]["before_text"] == "u1" and rows[2]["after_text"] is None
    assert rows[3]["before_text"] is None and rows[3]["after_text"] == "s1"
    # serials: update pair counts 2 (Db2OffsetContext.java:95-104)
    assert [r["serial"] for r in rows] == [1, 2, 1, 1]


def test_envelope_tombstones_follow_deletes():
    env = to_envelopes(env_log(), tombstones_on_delete=True, image_columns=("text",))
    rows = env.to_pylist()
    ops = [r["op_char"] for r in rows]
    assert ops == ["c", "u", "d", "t", "u"]
    t = rows[3]
    assert t["before_text"] is None and t["after_text"] is None
    assert t["conv_id"] == "a" and t["turn_idx"] == 0  # same key as the delete


def test_envelope_orphan_raises():
    from debezium_connector_db2_ray.pipelines.oracle import OrphanBeforeImageError

    bad = mklog(
        [
            (1001, 1, OP_INSERT, "a", 0, "i1"),
            (1002, 2, OP_UPDATE_BEFORE, "a", 0, "i1"),
        ]
    )
    with pytest.raises(OrphanBeforeImageError):
        to_envelopes(bad, image_columns=("text",))


def test_cloudevents_id_layout():
    env = to_envelopes(env_log(), image_columns=("text",))
    ce = to_cloudevents(env, logical_name="server1")
    r = ce.to_pylist()[0]
    assert r["ce_id"] == (
        "name:server1;change_lsn:00000000:00000000:0000000000000001"
        ";commit_lsn:00000000:00000000:00000000000003e9"
    )
    assert r["ce_source"] == "/debezium/db2ray/server1"
    import json

    j = json.loads(r["ce_json"])
    assert j["specversion"] == "1.0" and j["data"]["op_char"] == "c"
    # deterministic serialization
    ce2 = to_cloudevents(env, logical_name="server1")
    assert ce["ce_json"].to_pylist() == ce2["ce_json"].to_pylist()


# --- key rewrite -----------------------------------------------------------

def test_lww_with_alternate_key_columns():
    log = mklog(
        [
            (1001, 1, OP_INSERT, "a", 0, "t0"),
            (1002, 2, OP_INSERT, "a", 1, "t1"),
            (1003, 3, OP_UPDATE_SINGLE, "a", 2, "t2"),
        ]
    )
    # default key: 3 rows survive; conv-only key: just the newest
    assert lww_collapse(log).num_rows == 3
    out = lww_collapse(log, key_columns=("conv_id",))
    assert out.num_rows == 1
    assert out["text"].to_pylist() == ["t2"]
