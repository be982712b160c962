"""Unit tests for the two SMT-parity transforms: ExtractNewRecordState
(event flattening / unwrap) and the outbox event router — edge semantics
the gate row cannot see (delete modes, tombstone handling, op skipping)."""

import pyarrow as pa

from debezium_connector_db2_ray.ops import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_AFTER,
    OP_UPDATE_BEFORE,
)
from debezium_connector_db2_ray.stages.envelope import (
    outbox_route,
    to_envelopes,
    unwrap_new_record_state,
)

from .test_apply import mklog


def _env(tombstones=True):
    log = mklog(
        [
            (1001, 1, OP_INSERT, "a", 0, "v1"),
            (1002, 0, OP_UPDATE_BEFORE, "a", 0, "old:v1"),
            (1002, 1, OP_UPDATE_AFTER, "a", 0, "v2"),
            (1003, 3, OP_DELETE, "a", 0, "v2"),
            (1004, 4, OP_INSERT, "b", 1, "b1"),
        ]
    )
    return to_envelopes(
        log, tombstones_on_delete=tombstones, image_columns=("text", "role")
    )


def _rows(t: pa.Table):
    return {(r["conv_id"], r["__lsn"]): r for r in t.to_pylist()}


def test_unwrap_rewrite_keeps_deletes_with_before_image():
    flat = unwrap_new_record_state(
        _env(), image_columns=("text", "role"), delete_mode="rewrite"
    )
    rows = _rows(flat)
    # tombstone ('t') row dropped: 4 events survive, not 5
    assert flat.num_rows == 4
    ins = rows[("a", 1001)]
    assert ins["text"] == "v1" and ins["__op"] == "c"
    assert ins["__deleted"] == "false"
    upd = rows[("a", 1002)]
    assert upd["text"] == "v2" and upd["__op"] == "u"  # AFTER image wins
    del_ = rows[("a", 1003)]
    assert del_["text"] == "v2" and del_["__deleted"] == "true"
    assert del_["__op"] == "d"
    # key columns promoted verbatim
    assert rows[("b", 1004)]["turn_idx"] == 1


def test_unwrap_drop_and_none_modes():
    drop = unwrap_new_record_state(
        _env(), image_columns=("text",), delete_mode="drop"
    )
    assert set(drop["__op"].to_pylist()) == {"c", "u"}
    assert drop.num_rows == 3

    none = unwrap_new_record_state(
        _env(), image_columns=("text",), delete_mode="none"
    )
    rows = _rows(none)
    assert none.num_rows == 4
    assert rows[("a", 1003)]["text"] is None  # AFTER image of a delete
    assert rows[("a", 1003)]["__deleted"] == "true"


def test_unwrap_rejects_unknown_mode():
    import pytest

    with pytest.raises(ValueError):
        unwrap_new_record_state(
            _env(), image_columns=("text",), delete_mode="bogus"
        )


def test_outbox_routes_only_inserts():
    out = outbox_route(
        _env(),
        aggregate_type_col="role",
        aggregate_id_col="conv_id",
        payload_col="text",
    )
    # 2 inserts; the update, delete and tombstone are housekeeping
    assert out.num_rows == 2
    rows = {r["event_id"]: r for r in out.to_pylist()}
    assert rows[1001]["topic"] == "outbox.event.user"
    assert rows[1001]["event_key"] == "a"
    assert rows[1001]["payload"] == "v1"
    assert rows[1004]["event_key"] == "b" and rows[1004]["payload"] == "b1"
    assert rows[1004]["event_type"] == "user"


def test_changed_record_state_null_safe(ray_session):
    """NULL->value counts as changed, NULL->NULL and equal values do not,
    non-update ops carry a NULL header, and the header preserves
    image-column order."""
    import numpy as np
    import pyarrow as pa

    from debezium_connector_db2_ray.stages.envelope import (
        changed_record_state,
    )

    env = pa.table({
        "op_char": pa.array(["u", "u", "c", "u", "d"]),
        "before_text": pa.array(["a", "x", None, None, "z"]),
        "after_text": pa.array(["b", "x", "z", None, "z"]),
        "before_tool": pa.array([None, "t", "q", "p", "r"]),
        "after_tool": pa.array(["t", "t", "q", "p", "s"]),
    })
    out = changed_record_state(env, image_columns=("text", "tool"))
    assert out["__changed"].to_pylist() == [
        "text,tool", "", None, "", None,
    ]
    empty = changed_record_state(
        env.slice(0, 0), image_columns=("text", "tool")
    )
    assert empty.num_rows == 0 and "__changed" in empty.column_names


def test_timezone_convert_nulls_and_offset():
    """+330 min shifts by exactly 5h30m; NULL timestamps stay NULL; the
    original column is preserved."""
    import pyarrow as pa

    from debezium_connector_db2_ray.stages.envelope import timezone_convert

    env = pa.table({
        "ts": pa.array([0, 60_000_000, None], pa.timestamp("us")),
    })
    out = timezone_convert(env, ts_columns=("ts",), offset_minutes=330)
    assert out["ts_local"].to_pylist()[0].hour == 5
    assert out["ts_local"].to_pylist()[0].minute == 30
    assert out["ts_local"].to_pylist()[2] is None
    assert out["ts"].to_pylist()[1].minute == 1


def test_content_based_route_null_and_default():
    """Mapped values route, unmapped fall to the default, NULL column
    values fall to the default (the SMT's null-keeps-original rule)."""
    import pyarrow as pa

    from debezium_connector_db2_ray.stages.envelope import (
        content_based_route,
    )

    env = pa.table({"role": pa.array(["purchase", "view", None, "error"])})
    out = content_based_route(
        env, column="role",
        routes={"purchase": "hot", "error": "dlq"}, default_topic="dft",
    )
    assert out["topic"].to_pylist() == ["hot", "dft", "dft", "dlq"]
    none_default = content_based_route(
        env, column="role", routes={"purchase": "hot"},
    )
    assert none_default["topic"].to_pylist() == ["hot", None, None, None]


def test_logical_table_route_regex():
    import pyarrow as pa

    from debezium_connector_db2_ray.stages.envelope import (
        logical_table_route,
    )

    t = pa.array(["cdc.S.CONV_0", "cdc.S.CONV_15", "cdc.S.OTHER"])
    out = logical_table_route(t, pattern="_[0-9]+$", replacement="")
    assert out["topic"].to_pylist() == ["cdc.S.CONV", "cdc.S.CONV",
                                        "cdc.S.OTHER"]
    assert out["__dbz__physicalTableIdentifier"].to_pylist() == t.to_pylist()


def test_partition_route_md5_and_nulls():
    """Partition matches the md5-60-bit mod; equal keys agree; NULL fields
    hash via the NULL marker rather than crashing; multi-field join uses
    the unit separator."""
    import hashlib

    import pyarrow as pa

    from debezium_connector_db2_ray.stages.envelope import partition_route

    env = pa.table({
        "k": pa.array(["a", "a", None]),
        "j": pa.array([1, 2, 3], pa.int64()),
    })
    out = partition_route(env, payload_fields=("k",), num_partitions=12)
    want = int(hashlib.md5(b"a").hexdigest()[:15], 16) % 12
    assert out["partition"].to_pylist()[:2] == [want, want]
    assert 0 <= out["partition"].to_pylist()[2] < 12
    multi = partition_route(
        env, payload_fields=("k", "j"), num_partitions=7
    )
    want2 = int(hashlib.md5("a\x1f1".encode()).hexdigest()[:15], 16) % 7
    assert multi["partition"].to_pylist()[0] == want2


def test_cast_fields_java_semantics():
    """Cast SMT: float->int truncates toward zero (Java cast), int->string
    renders canonically, numeric->boolean is value != 0, NULLs propagate."""
    import pyarrow as pa

    from debezium_connector_db2_ray.stages.envelope import cast_fields

    env = pa.table({
        "f": pa.array([1.9, -2.9, 0.0, None], pa.float64()),
        "i": pa.array([7, -3, 0, None], pa.int64()),
        "g": pa.array([2.5, 0.0, -0.1, None], pa.float64()),
    })
    out = cast_fields(
        env, spec={"f": "int32", "i": "string", "g": "boolean"}
    )
    assert out["f"].to_pylist() == [1, -2, 0, None]
    assert out["f"].type == pa.int32()
    assert out["i"].to_pylist() == ["7", "-3", "0", None]
    assert out["g"].to_pylist() == [True, False, True, None]


def test_replace_and_insert_fields():
    """ReplaceField include-wins/exclude/rename; InsertField static +
    metadata copies append in order."""
    import pyarrow as pa

    from debezium_connector_db2_ray.stages.envelope import (
        insert_fields,
        replace_fields,
    )

    env = pa.table({"a": [1], "b": [2], "c": [3]})
    assert replace_fields(env, exclude=("b",)).column_names == ["a", "c"]
    assert replace_fields(
        env, include=("c", "a"), exclude=("a",)
    ).column_names == ["a", "c"]
    ren = replace_fields(env, renames={"a": "alpha"}, exclude=("c",))
    assert ren.column_names == ["alpha", "b"]
    ins = insert_fields(env, static={"tag": "x"}, copies={"b2": "b"})
    assert ins.column_names == ["a", "b", "c", "tag", "b2"]
    assert ins["tag"].to_pylist() == ["x"]
    assert ins["b2"].to_pylist() == [2]


def test_convert_timestamp_truncates_not_rounds():
    """TimestampConverter: unix target truncates 999999us to the prior
    millisecond (Connect Timestamp semantics); string target renders whole
    seconds with no fractional tail; NULLs propagate through all targets."""
    import pyarrow as pa

    from debezium_connector_db2_ray.stages.envelope import convert_timestamp

    env = pa.table({
        "ts": pa.array(
            [1_700_000_001_999_999, 1_700_000_000_000_001, None],
            pa.timestamp("us"),
        ),
    })
    u = convert_timestamp(env, column="ts", target="unix", out_col="ms")
    assert u["ms"].to_pylist() == [1_700_000_001_999, 1_700_000_000_000,
                                   None]
    s = convert_timestamp(env, column="ts", target="string", out_col="st")
    assert s["st"].to_pylist()[0] == "2023-11-14 22:13:21"
    assert "." not in s["st"].to_pylist()[0]
    assert s["st"].to_pylist()[2] is None
    t = convert_timestamp(
        env, column="ts", target="timestamp_ms", out_col="t3"
    )
    assert t["t3"].type == pa.timestamp("ms")


def test_flatten_struct_recursive_zero_copy():
    """Flatten SMT: nested structs flatten depth-first with the delimiter;
    non-struct columns pass through unchanged."""
    import pyarrow as pa

    from debezium_connector_db2_ray.stages.envelope import flatten_struct

    inner = pa.struct([("z", pa.string())])
    s = pa.array(
        [{"x": 1, "y": {"z": "q"}}, {"x": 2, "y": {"z": None}}],
        pa.struct([("x", pa.int64()), ("y", inner)]),
    )
    env = pa.table({"op": pa.array(["c", "u"]), "s": s})
    out = flatten_struct(env, delimiter="_")
    assert out.column_names == ["op", "s_x", "s_y_z"]
    assert out["s_y_z"].to_pylist() == ["q", None]


def test_binary_encode_modes():
    """binary.handling.mode: hex is lowercase, base64 is padded standard
    alphabet, bytes passes through, NULLs propagate."""
    import pyarrow as pa

    from debezium_connector_db2_ray.stages.envelope import binary_encode

    env = pa.table({"b": pa.array([b"\x00\xff", b"x", None], pa.binary())})
    h = binary_encode(env, column="b", mode="hex", out_col="h")
    assert h["h"].to_pylist() == ["00ff", "78", None]
    b64 = binary_encode(env, column="b", mode="base64", out_col="e")
    assert b64["e"].to_pylist() == ["AP8=", "eA==", None]
    raw = binary_encode(env, column="b", mode="bytes", out_col="r")
    assert raw["r"].to_pylist() == [b"\x00\xff", b"x", None]


def test_handle_event_errors_modes():
    """fail raises on the first poison event; warn/skip drop and count;
    NULL keys are malformed; a clean batch is untouched under fail."""
    import pyarrow as pa
    import pytest

    from debezium_connector_db2_ray.stages.envelope import (
        handle_event_errors,
    )

    env = pa.table({
        "op": pa.array([1, 9, 2, 5], pa.int8()),
        "conv_id": pa.array(["a", "b", None, "d"]),
    })
    kept, n_bad = handle_event_errors(
        env, mode="skip", valid_ops=(1, 2, 5), key_columns=("conv_id",)
    )
    assert n_bad == 2
    assert kept["conv_id"].to_pylist() == ["a", "d"]
    kept_w, n_w = handle_event_errors(
        env, mode="warn", valid_ops=(1, 2, 5), key_columns=("conv_id",)
    )
    assert n_w == 2 and kept_w.num_rows == 2
    with pytest.raises(ValueError, match="malformed change event"):
        handle_event_errors(
            env, mode="fail", valid_ops=(1, 2, 5),
            key_columns=("conv_id",),
        )
    clean = pa.table({
        "op": pa.array([1, 2], pa.int8()),
        "conv_id": pa.array(["a", "b"]),
    })
    ok, zero = handle_event_errors(
        clean, mode="fail", valid_ops=(1, 2, 5), key_columns=("conv_id",)
    )
    assert zero == 0 and ok.num_rows == 2


def test_column_filter_and_avro_sanitize():
    """Include/exclude are mutually exclusive, protected keys always
    survive, and Avro sanitization handles unicode + leading digits."""
    import pyarrow as pa
    import pytest

    from debezium_connector_db2_ray.stages.envelope import (
        avro_sanitize_names,
        column_filter,
    )

    env = pa.table({"k": [1], "text": ["a"], "tool": ["b"], "ts": [2]})
    out = column_filter(env, include=r"te.*", protected=("k",))
    assert out.column_names == ["k", "text"]
    out2 = column_filter(env, exclude=r"t.*", protected=("ts",))
    assert out2.column_names == ["k", "ts"]
    with pytest.raises(ValueError):
        column_filter(env, include="a", exclude="b")
    with pytest.raises(ValueError):
        column_filter(env)
    names = pa.array(["cdc.MY-DB.conv#log", "1table", "ok_name", None])
    got = avro_sanitize_names(names).to_pylist()
    assert got == ["cdc_MY_DB_conv_log", "_1table", "ok_name", None]


def test_partition_route_xx_vectorized():
    """The production xx hash path: equal key tuples agree, range is
    [0, n), NULL fields route deterministically, and the routing differs
    from a trivial modulo (i.e. it actually hashes)."""
    import pyarrow as pa

    from debezium_connector_db2_ray.stages.envelope import partition_route

    env = pa.table({
        "k": pa.array(["a", "a", None, "b"]),
        "j": pa.array([1, 1, 3, 4], pa.int64()),
    })
    out = partition_route(
        env, payload_fields=("k", "j"), num_partitions=16, hash_impl="xx"
    )
    p = out["partition"].to_pylist()
    assert p[0] == p[1]
    assert all(0 <= x < 16 for x in p)
    again = partition_route(
        env, payload_fields=("k", "j"), num_partitions=16, hash_impl="xx"
    )
    assert again["partition"].to_pylist() == p
