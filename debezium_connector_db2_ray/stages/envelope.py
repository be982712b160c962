"""Change-event envelope emission: zip update pairs, serial numbers, tombstones.

Reproduces the reference's record-emission semantics as a vectorized batch
transform:

- before/after image selection per op (Db2ChangeRecordEmitter.java:56-78):
  CREATE/READ -> after only; DELETE -> before only; UPDATE pair -> before =
  first row, after = second row; op 5 -> after only (z/OS single update,
  Db2StreamingChangeEventSource.java:266-274);
- an UPDATE consumes two rows and counts 2 toward the event serial number
  within its source position (eventCount=2 at
  Db2StreamingChangeEventSource.java:254-264; serial arithmetic
  Db2OffsetContext.java:95-104);
- optional DELETE tombstones: a follow-up record with the same key and null
  images, for log compaction (tombstones.on.delete,
  Db2ConnectorIT.java:104-257).

Input contract: a classified changelog fragment containing every row of each
commit it covers (partition by hash(commit_lsn), or by key — update pairs
share both). Sorting happens inside.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from debezium_connector_db2_ray.ops import (
    OP_DELETE,
    OP_INSERT,
    OP_READ,
    OP_UPDATE_AFTER,
    OP_UPDATE_BEFORE,
    OP_UPDATE_SINGLE,
)
from debezium_connector_db2_ray.pipelines.oracle import OrphanBeforeImageError
from debezium_connector_db2_ray.schema import CHANGELOG_META_COLUMNS
from debezium_connector_db2_ray.stages.decode import sort_by_position

META = set(CHANGELOG_META_COLUMNS)


def to_envelopes(
    fragment: pa.Table,
    *,
    tombstones_on_delete: bool = False,
    image_columns: tuple[str, ...] | None = None,
) -> pa.Table:
    """Turn a classified changelog fragment into envelope rows.

    Output columns: commit/intent LSN columns of the event (an update pair
    keeps the AFTER row's intent), ``serial`` (1-based within the commit,
    updates count 2), ``op_char`` ('r'/'c'/'u'/'d', plus 't' for tombstones),
    key columns, and ``before_<col>`` / ``after_<col>`` for each image
    column (default: every payload column except the key)."""
    t = sort_by_position(fragment)
    op = t["op"].to_numpy(zero_copy_only=False)
    n = len(op)
    chi = t["commit_lsn_hi"].to_numpy(zero_copy_only=False)
    clo = t["commit_lsn_lo"].to_numpy(zero_copy_only=False)

    is_before = op == OP_UPDATE_BEFORE
    is_after = op == OP_UPDATE_AFTER
    prev_before = np.zeros(n, dtype=bool)
    prev_before[1:] = is_before[:-1] & (chi[1:] == chi[:-1]) & (clo[1:] == clo[:-1])
    if (is_after & ~prev_before).any() or (is_before & ~np.roll(is_after & prev_before, -1)).any():
        raise OrphanBeforeImageError("unpaired update images in envelope fragment")

    # one envelope row per event: drop the before rows, remember their index
    event_idx = np.flatnonzero(~is_before)
    before_src = np.full(n, -1, dtype=np.int64)
    before_src[1:][is_before[:-1]] = np.flatnonzero(is_before)  # after row <- its before row
    # serial: events per commit counted in order; update counts 2
    weight = np.where(is_after, 2, 1)[event_idx]
    e_chi, e_clo = chi[event_idx], clo[event_idx]
    new_commit = np.ones(len(event_idx), dtype=bool)
    new_commit[1:] = (e_chi[1:] != e_chi[:-1]) | (e_clo[1:] != e_clo[:-1])
    serial = np.empty(len(event_idx), dtype=np.int64)
    run_start = np.maximum.accumulate(np.where(new_commit, np.arange(len(event_idx)), 0))
    csum = np.cumsum(weight)
    base = np.where(run_start > 0, csum[run_start - 1], 0)
    serial = csum - base

    keys = ("conv_id", "turn_idx")
    payload = [c for c in t.column_names if c not in META]
    image_cols = list(image_columns or [c for c in payload if c not in keys])

    ev = t.take(event_idx)
    eop = op[event_idx]
    has_before = np.isin(eop, (OP_DELETE, OP_UPDATE_AFTER))
    has_after = np.isin(eop, (OP_READ, OP_INSERT, OP_UPDATE_AFTER, OP_UPDATE_SINGLE))
    lut = np.full(6, "", dtype="U1")
    for k, v in {OP_READ: "r", OP_INSERT: "c", OP_DELETE: "d",
                 OP_UPDATE_AFTER: "u", OP_UPDATE_SINGLE: "u"}.items():
        lut[k] = v

    cols: dict[str, pa.Array] = {
        "commit_lsn_hi": ev["commit_lsn_hi"].combine_chunks(),
        "commit_lsn_lo": ev["commit_lsn_lo"].combine_chunks(),
        "intent_lsn_hi": ev["intent_lsn_hi"].combine_chunks(),
        "intent_lsn_lo": ev["intent_lsn_lo"].combine_chunks(),
        "serial": pa.array(serial, pa.int64()),
        "op_char": pa.array(lut[eop], pa.string()),
        "conv_id": ev["conv_id"].combine_chunks(),
        "turn_idx": ev["turn_idx"].combine_chunks(),
    }
    # image selection, vectorized: for updates the before image comes from the
    # paired before row; for deletes from the event row itself
    bsrc = np.where(eop == OP_UPDATE_AFTER, before_src[event_idx], event_idx)
    for c in image_cols:
        col = t[c]
        before_vals = col.take(pa.array(bsrc))
        cols[f"before_{c}"] = _mask(before_vals, has_before)
        after_vals = col.take(pa.array(event_idx))
        cols[f"after_{c}"] = _mask(after_vals, has_after)

    out = pa.table(cols)
    if tombstones_on_delete:
        dmask = eop == OP_DELETE
        if dmask.any():
            tomb = out.filter(pa.array(dmask))
            tcols = {}
            for name in tomb.column_names:
                if name == "op_char":
                    tcols[name] = pa.array(["t"] * tomb.num_rows, pa.string())
                elif name.startswith(("before_", "after_")):
                    tcols[name] = pa.nulls(tomb.num_rows, tomb[name].type)
                else:
                    tcols[name] = tomb[name]
            out = pa.concat_tables([out, pa.table(tcols)])
            out = sort_by_position(out)
    return out


#: connector identity constants for the source-info block
#: (Db2SourceInfoStructMaker.java:21-27 — version/connector are Module
#: constants in the reference; ours name this engine)
SOURCE_VERSION = "ray-1.0"
SOURCE_CONNECTOR = "db2"


def with_source_info(
    env: pa.Table,
    *,
    name: str,
    db: str,
    schema: str,
    table: str,
    ts_before: str = "before_ts",
    ts_after: str = "after_ts",
) -> pa.Table:
    """Append the reference's source-info fields to an envelope table:
    ``version, connector, name, ts_ms, snapshot, db, schema, table,
    change_lsn, commit_lsn`` (Db2SourceInfoStructMaker.java:21-27; schema
    asserted SourceInfoTest.java:85-105). Emitted as flat ``source_*``
    columns rather than one nested struct — an Arrow-native engine keeps
    envelopes columnar; nesting is a concern of the output serializer.

    ``ts_ms`` is the event's payload timestamp in epoch-millis (after image
    when present, else before — the engine's LSN->ts design keeps time as a
    column, SURVEY §2.3); ``snapshot`` is 'true' on READ envelopes, 'false'
    otherwise; ``change_lsn``/``commit_lsn`` are the colon-hex forms
    (Lsn.java:65-86)."""
    import pyarrow.compute as pc

    from debezium_connector_db2_ray.lsn import lsn_hex_array

    n = env.num_rows
    commit_hex = lsn_hex_array(
        env["commit_lsn_hi"].to_numpy(zero_copy_only=False),
        env["commit_lsn_lo"].to_numpy(zero_copy_only=False),
    )
    change_hex = lsn_hex_array(
        env["intent_lsn_hi"].to_numpy(zero_copy_only=False),
        env["intent_lsn_lo"].to_numpy(zero_copy_only=False),
    )
    names = env.column_names
    ts = None
    if ts_after in names and ts_before in names:
        ts = pc.coalesce(env[ts_after], env[ts_before])
    elif ts_after in names:
        ts = env[ts_after]
    elif ts_before in names:
        ts = env[ts_before]
    if ts is not None:
        # normalize by the column's unit — a cast to int64 yields ticks in
        # the SOURCE unit, not microseconds
        unit = getattr(ts.type, "unit", "us")
        divisor = {"s": None, "ms": 1, "us": 1000, "ns": 1_000_000}[unit]
        ticks = pc.cast(ts, pa.int64())
        if unit == "s":
            ts_ms = pc.multiply(ticks, pa.scalar(1000, pa.int64()))
        elif divisor == 1:
            ts_ms = ticks
        else:
            ts_ms = pc.divide(ticks, pa.scalar(divisor, pa.int64()))
    else:
        ts_ms = pa.nulls(n, pa.int64())
    snapshot = pc.if_else(
        pc.equal(env["op_char"], "r"),
        pa.scalar("true", pa.string()),
        pa.scalar("false", pa.string()),
    )
    const = lambda v: pa.array(np.full(n, v), pa.string())  # noqa: E731
    for col, val in (
        ("source_version", const(SOURCE_VERSION)),
        ("source_connector", const(SOURCE_CONNECTOR)),
        ("source_name", const(name)),
        ("source_ts_ms", ts_ms),
        ("source_snapshot", snapshot),
        ("source_db", const(db)),
        ("source_schema", const(schema)),
        ("source_table", const(table)),
        ("source_change_lsn", pa.array(change_hex, pa.string())),
        ("source_commit_lsn", pa.array(commit_hex, pa.string())),
    ):
        env = env.append_column(col, val)
    return env


def _mask(values, keep: np.ndarray) -> pa.Array:
    import pyarrow.compute as pc

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if keep.all():
        return values
    return pc.if_else(pa.array(keep), values, pa.nulls(len(values), values.type))


def filter_operations(ds, *, skipped: frozenset[str] | set[str],
                      op_col: str = "op_char"):
    """``skipped.operations`` parity (Db2ConnectorConfig inherits
    CommonConnectorConfig.SKIPPED_OPERATIONS): drop envelope events whose
    operation character is in ``skipped`` — 'c' (create), 'u' (update),
    'd' (delete), 'r' (snapshot read) — before they reach a sink. A pure
    map-side filter: no exchange, streams with backpressure. Rows with a
    NULL op are kept (the reference only skips explicitly configured
    ops)."""
    import pyarrow.compute as pc

    bad = sorted(skipped)
    for s in bad:
        if s not in ("c", "u", "d", "r", "t"):
            raise ValueError(f"unknown operation {s!r}")

    def fn(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.fill_null(
            pc.is_in(batch[op_col], value_set=pa.array(bad, pa.string())),
            False,
        ))
        return batch.filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow")


def unwrap_new_record_state(
    env: pa.Table,
    *,
    image_columns: tuple[str, ...],
    key_columns: tuple[str, ...] = ("conv_id", "turn_idx"),
    delete_mode: str = "rewrite",
    lsn_col: str = "commit_lsn_lo",
) -> pa.Table:
    """Event-flattening SMT (Debezium's ExtractNewRecordState, the
    `unwrap` transform of the public event-flattening docs): collapse a
    change-event envelope into one flat row per event — key columns plus
    the AFTER image promoted to top-level columns, with the routing
    metadata the SMT adds (``__op``, ``__lsn``, ``__deleted``).

    ``delete_mode`` mirrors `delete.handling.mode`:
      - "rewrite": keep delete events, payload taken from the BEFORE
        image, ``__deleted`` = 'true' (the log-compaction-friendly form);
      - "drop": remove delete events entirely;
      - "none": keep delete events with NULL payload columns.
    Tombstone rows (op 't') are always dropped, as the SMT does.

    Pure per-batch projection — map-only, no exchange; callers run it via
    ``map_batches``. Reference analog: the flattening contract is defined
    by Debezium's public SMT semantics (event-flattening transform);
    the db2 connector emits the envelopes it consumes
    (Db2ChangeRecordEmitter.java:56-78)."""
    import pyarrow.compute as pc

    if delete_mode not in ("rewrite", "drop", "none"):
        raise ValueError(f"unknown delete.handling.mode {delete_mode!r}")

    op = env["op_char"]
    keep = pc.not_equal(op, "t")
    if delete_mode == "drop":
        keep = pc.and_(keep, pc.not_equal(op, "d"))
    env = env.filter(keep)
    op = env["op_char"]
    is_del = pc.equal(op, "d")

    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    for k in key_columns:
        cols[k] = env[k]
    for c in image_columns:
        after = env[f"after_{c}"]
        if isinstance(after, pa.ChunkedArray):
            after = after.combine_chunks()
        if delete_mode == "rewrite":
            before = env[f"before_{c}"]
            if isinstance(before, pa.ChunkedArray):
                before = before.combine_chunks()
            cols[c] = pc.if_else(is_del, before, after)
        else:
            cols[c] = after
    cols["__op"] = op
    cols["__lsn"] = env[lsn_col].cast(pa.int64())
    cols["__deleted"] = pc.if_else(is_del, "true", "false")
    return pa.table(cols)


def outbox_route(
    env: pa.Table,
    *,
    aggregate_type_col: str,
    aggregate_id_col: str,
    payload_col: str,
    topic_prefix: str = "outbox.event",
    lsn_col: str = "commit_lsn_lo",
) -> pa.Table:
    """Outbox event router SMT (Debezium's public outbox-event-router
    transform over the transactional-outbox pattern): consume only the
    INSERT events of the outbox table (the pattern appends one row per
    domain event; updates/deletes on the outbox are housekeeping and are
    skipped), re-key each event by its aggregate id, route it to
    ``<topic_prefix>.<aggregate_type>``, and carry the payload through
    verbatim with the event id for idempotent consumers.

    Output: (topic, event_key, event_type, payload, event_id) — map-only,
    no exchange. The aggregate type/id/payload column names mirror the
    SMT's `table.field.event.*` knobs."""
    import pyarrow.compute as pc

    ins = env.filter(pc.equal(env["op_char"], "c"))
    atype = ins[f"after_{aggregate_type_col}"]
    if isinstance(atype, pa.ChunkedArray):
        atype = atype.combine_chunks()
    topic = pc.binary_join_element_wise(
        pa.scalar(topic_prefix, pa.string()),
        pc.cast(atype, pa.string()),
        ".",
    )
    return pa.table({
        "topic": topic,
        "event_key": ins[aggregate_id_col],
        "event_type": pc.cast(atype, pa.string()),
        "payload": ins[f"after_{payload_col}"],
        "event_id": ins[lsn_col].cast(pa.int64()),
    })


def changed_record_state(
    env: pa.Table,
    *,
    image_columns: tuple[str, ...],
    out_col: str = "__changed",
) -> pa.Table:
    """Changed-field extraction SMT (Debezium's public
    ExtractChangedRecordState transform): for every UPDATE envelope,
    compare the BEFORE and AFTER images column by column and record the
    names of the fields whose value actually changed, comma-joined in
    image-column order (the SMT emits them as a record header; a columnar
    sink gets one string column). Non-update events carry NULL — the SMT
    adds no header when there is no image pair to diff, matching the
    upstream transform's update-only behavior.

    The per-column comparison is NULL-safe (IS DISTINCT FROM): a NULL ->
    value or value -> NULL transition counts as changed, NULL -> NULL does
    not. Fully vectorized — per-column pyarrow equality kernels plus one
    integer bit-code -> precomputed-string lookup, so the cost is
    O(columns) Arrow kernels per batch, never a per-row loop. Map-only:
    callers run it inside ``map_batches`` with no exchange at any scale."""
    import pyarrow.compute as pc

    n = env.num_rows
    if n == 0:
        return env.append_column(out_col, pa.array([], pa.string()))
    code = np.zeros(n, dtype=np.int64)
    for bit, c in enumerate(image_columns):
        b, a = env[f"before_{c}"], env[f"after_{c}"]
        # same = equal OR both-null; NULL result means exactly one side
        # was NULL -> distinct.
        same = pc.or_kleene(
            pc.equal(b, a), pc.and_(pc.is_null(b), pc.is_null(a))
        )
        changed = pc.fill_null(pc.invert(same), True)
        code |= changed.to_numpy(zero_copy_only=False).astype(np.int64) << bit
    lut = np.array([
        ",".join(c for bit, c in enumerate(image_columns) if mask >> bit & 1)
        for mask in range(1 << len(image_columns))
    ])
    is_update = pc.equal(env["op_char"], "u").to_numpy(zero_copy_only=False)
    header = pa.array(
        np.where(is_update, lut[code], None), pa.string(),
        mask=~np.asarray(is_update),
    )
    return env.append_column(out_col, header)


def timezone_convert(
    env: pa.Table,
    *,
    ts_columns: tuple[str, ...],
    offset_minutes: int,
    suffix: str = "_local",
) -> pa.Table:
    """Timezone-conversion SMT (Debezium's public TimezoneConverter
    transform, `converted.timezone` as a fixed offset): shift every listed
    timestamp column by the target offset and emit it alongside the
    original under ``<col><suffix>``. The SMT rewrites temporal fields in
    place on the wire; a columnar sink keeps both so downstream stages can
    pick either representation without re-reading.

    Map-only — one Arrow add-scalar kernel per column per batch, NULLs
    propagate, no exchange at any scale."""
    import pyarrow.compute as pc

    out = env
    delta = pa.scalar(offset_minutes * 60_000_000, pa.duration("us"))
    for c in ts_columns:
        col = env[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out = out.append_column(f"{c}{suffix}", pc.add(col, delta))
    return out


def content_based_route(
    env: pa.Table,
    *,
    column: str,
    routes: dict[str, str],
    default_topic: str | None = None,
) -> pa.Table:
    """Content-based routing SMT (Debezium's public ContentBasedRouter):
    re-route each event to a topic chosen from a payload field's value.
    The upstream transform evaluates a routing expression per record and a
    null result keeps the original topic; this columnar form takes the
    deterministic subset — a value -> topic map over one payload column —
    and emits ``topic`` (NULL = keep the default / original topic, unless
    ``default_topic`` is given).

    Map-only: one dictionary-encode + integer take per batch; the route
    table is O(distinct values), never shipped per row."""
    import pyarrow.compute as pc

    col = env[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = pc.dictionary_encode(col)
    dic = enc.dictionary.to_pylist()
    lut = np.array(
        [routes.get(v if v is not None else "", default_topic) for v in dic],
        dtype=object,
    )
    idx = enc.indices.to_numpy(zero_copy_only=False)
    valid = ~np.isnan(idx.astype(np.float64)) if idx.dtype.kind == "f" else (
        np.ones(len(idx), bool)
    )
    topics = np.full(len(idx), default_topic, dtype=object)
    ii = idx[valid].astype(np.int64)
    topics[valid] = lut[ii]
    return env.append_column("topic", pa.array(topics, pa.string()))


def logical_table_route(
    topics: pa.Array | pa.ChunkedArray,
    *,
    pattern: str,
    replacement: str,
) -> pa.Table:
    """Logical-table routing SMT (Debezium's public ByLogicalTableRouter):
    when one logical table is physically sharded (CONV_00 .. CONV_15, one
    topic each), rewrite every physical topic to the single logical topic
    via regex and keep the physical identity as the
    ``__dbz__physicalTableIdentifier`` field the upstream transform adds
    to the key, so consumers can still disambiguate shard origin.

    Map-only — one RE2 replace kernel per batch."""
    import pyarrow.compute as pc

    if isinstance(topics, pa.ChunkedArray):
        topics = topics.combine_chunks()
    logical = pc.replace_substring_regex(
        topics, pattern=pattern, replacement=replacement
    )
    return pa.table({
        "topic": logical,
        "__dbz__physicalTableIdentifier": topics,
    })


def partition_route(
    env: pa.Table,
    *,
    payload_fields: tuple[str, ...],
    num_partitions: int,
    out_col: str = "partition",
    hash_impl: str = "md5",
) -> pa.Table:
    """Partition-routing SMT (Debezium's public PartitionRouting):
    compute the target topic partition from the configured payload fields
    — hash of the concatenated field values, modulo
    ``partition.topic.num`` — so every event of one entity lands in one
    partition regardless of the table it came from.

    Hash = md5 of the NULL-marked '\\x1f'-joined field values, top 60 bits
    (15 hex chars -> non-negative int64), mod num_partitions. md5 is the
    cross-engine semantic (a DuckDB oracle mirrors it bit-for-bit via
    ('0x' || substr(md5(..), 1, 15))::BIGINT); a production deployment
    that needs no SQL twin swaps in the vectorized house xxhash64.
    Map-only, no exchange."""
    import hashlib

    import pyarrow.compute as pc

    parts = []
    for f in payload_fields:
        col = env[f]
        if not pa.types.is_string(col.type):
            col = pc.cast(col, pa.string())
        parts.append(pc.fill_null(col, "\x00"))
    joined = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(
        *parts, "\x1f"
    )
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    if hash_impl == "xx":
        from debezium_connector_db2_ray.polars_compat import import_polars
        pl = import_polars()

        h = pl.from_arrow(joined).hash(seed=7).to_numpy().astype(np.uint64)
        pid = ((h >> np.uint64(4)).astype(np.int64)) % num_partitions
        return env.append_column(out_col, pa.array(pid, pa.int64()))
    if hash_impl != "md5":  # pragma: no cover - config error
        raise ValueError(f"unknown hash_impl {hash_impl!r}")
    pid = np.fromiter(
        (
            int(hashlib.md5(v.encode()).hexdigest()[:15], 16) % num_partitions
            for v in joined.to_pylist()
        ),
        dtype=np.int64,
        count=len(joined),
    )
    return env.append_column(out_col, pa.array(pid, pa.int64()))


def cast_fields(env: pa.Table, *, spec: dict[str, str]) -> pa.Table:
    """Cast SMT (Kafka Connect's public ``Cast$Value``, the stock transform
    Debezium pipelines chain after the connector): re-type the listed
    payload fields in place. Kafka Connect casts with Java semantics —
    floating -> integer truncates toward zero (not banker's rounding), any
    numeric -> boolean is ``value != 0``, boolean -> numeric is 1/0, and
    anything -> string uses the canonical decimal rendering.

    Map-only: one Arrow cast kernel per listed column per batch, NULLs
    propagate, no exchange at any scale. Target names follow the Connect
    config grammar: int8/int16/int32/int64/float32/float64/boolean/string.
    """
    import pyarrow.compute as pc

    _TARGETS = {
        "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(),
        "int64": pa.int64(), "float32": pa.float32(),
        "float64": pa.float64(), "boolean": pa.bool_(),
        "string": pa.string(),
    }
    out = env
    for name, target in spec.items():
        t = _TARGETS[target]
        col = out[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        src = col.type
        if pa.types.is_boolean(t):
            cast = pc.not_equal(col, pa.scalar(0).cast(src)) if not (
                pa.types.is_boolean(src)
            ) else col
        elif pa.types.is_integer(t) and pa.types.is_floating(src):
            # Java (long)/(int) cast: truncation toward zero.
            cast = pc.cast(pc.trunc(col), t, safe=False)
        else:
            cast = pc.cast(col, t, safe=False)
        out = out.set_column(
            out.column_names.index(name), name, cast
        )
    return out


def replace_fields(
    env: pa.Table,
    *,
    renames: dict[str, str] | None = None,
    exclude: tuple[str, ...] = (),
    include: tuple[str, ...] | None = None,
) -> pa.Table:
    """ReplaceField SMT (Kafka Connect's public ``ReplaceField$Value``):
    drop the ``exclude`` fields, keep only ``include`` when given (include
    wins over exclude, matching the Connect transform), and rename via the
    ``renames`` map — all as a zero-copy column projection, no kernels."""
    names = list(env.column_names)
    if include is not None:
        keep = [n for n in names if n in set(include)]
    else:
        drop = set(exclude)
        keep = [n for n in names if n not in drop]
    out = env.select(keep)
    if renames:
        out = out.rename_columns([renames.get(n, n) for n in keep])
    return out


def insert_fields(
    env: pa.Table,
    *,
    static: dict[str, str] | None = None,
    copies: dict[str, str] | None = None,
) -> pa.Table:
    """InsertField SMT (Kafka Connect's public ``InsertField$Value``):
    append constant metadata fields (``static.field``/``static.value`` —
    connector name, environment tags) and/or copies of record metadata
    under new names (``copies`` maps new-name -> existing column, covering
    the transform's topic/partition/timestamp passthroughs in columnar
    form). Zero-copy for copies, one repeated scalar per static field."""
    out = env
    n = env.num_rows
    for name, value in (static or {}).items():
        out = out.append_column(
            name, pa.array(np.full(n, value, dtype=object), pa.string())
        )
    for name, src in (copies or {}).items():
        col = env[src]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out = out.append_column(name, col)
    return out


def convert_timestamp(
    env: pa.Table,
    *,
    column: str,
    target: str,
    fmt: str = "%Y-%m-%d %H:%M:%S",
    out_col: str | None = None,
) -> pa.Table:
    """TimestampConverter SMT (Kafka Connect's public
    ``TimestampConverter$Value``): re-represent a timestamp field as
    ``unix`` (epoch milliseconds, the Connect ``Timestamp`` wire type —
    microseconds truncate), ``string`` (SimpleDateFormat-style pattern,
    here strftime), or ``timestamp_ms`` (typed timestamp at Connect's
    millisecond precision, the ``time.precision.mode=connect`` shape from
    the reference connector's temporal defaults). Map-only, one kernel."""
    import pyarrow.compute as pc

    col = env[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    name = out_col or column
    if target == "unix":
        conv = pc.floor_temporal(col, unit="millisecond").cast(
            pa.timestamp("ms")
        ).cast(pa.int64())
    elif target == "string":
        # SimpleDateFormat's %S is whole seconds; Arrow's %S renders the
        # fractional part for sub-second units, so floor to seconds first.
        conv = pc.strftime(
            col.cast(pa.timestamp("s"), safe=False), format=fmt
        )
    elif target == "timestamp_ms":
        conv = pc.floor_temporal(col, unit="millisecond").cast(
            pa.timestamp("ms")
        )
    else:  # pragma: no cover - config error
        raise ValueError(f"unknown TimestampConverter target {target!r}")
    return env.append_column(name, conv)


def flatten_struct(env: pa.Table, *, delimiter: str = ".") -> pa.Table:
    """Flatten SMT (Kafka Connect's public ``Flatten$Value``): recursively
    flatten struct fields into top-level columns named
    ``parent<delimiter>child`` — the standard move before sinking a
    Debezium envelope (source/before/after structs) to a flat columnar
    store. Zero-copy: struct fields are reference slices in Arrow."""
    cols: list[tuple[str, pa.Array]] = []

    def walk(name: str, arr) -> None:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_struct(arr.type):
            for f in arr.type:
                walk(f"{name}{delimiter}{f.name}", arr.field(f.name))
        else:
            cols.append((name, arr))

    for n in env.column_names:
        walk(n, env[n])
    return pa.table(dict(cols))


def binary_encode(
    env: pa.Table,
    *,
    column: str,
    mode: str,
    out_col: str | None = None,
) -> pa.Table:
    """binary.handling.mode converter (reference
    ``Db2ConnectorConfig.BINARY_HANDLING_MODE``,
    io/debezium/connector/db2/Db2ConnectorConfig.java — inherited
    RelationalDatabaseConnectorConfig semantics): BLOB payload columns are
    emitted as raw ``bytes``, ``hex`` strings, or ``base64`` strings.
    Vectorized via polars' binary encode kernels — one pass, no Python
    per-row loop, map-only."""
    from debezium_connector_db2_ray.polars_compat import import_polars
    pl = import_polars()

    col = env[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if mode == "bytes":
        return env.append_column(out_col or column, col)
    if mode not in ("hex", "base64"):  # pragma: no cover - config error
        raise ValueError(f"unknown binary.handling.mode {mode!r}")
    s = pl.from_arrow(col)
    if s.dtype == pl.Utf8:
        s = s.cast(pl.Binary)
    enc = s.bin.encode(mode)
    return env.append_column(
        out_col or column, enc.to_arrow().cast(pa.string())
    )


def handle_event_errors(
    env: pa.Table,
    *,
    mode: str,
    valid_ops: tuple[int, ...],
    key_columns: tuple[str, ...],
    op_col: str = "op",
) -> tuple[pa.Table, int]:
    """event.processing.failure.handling.mode (reference
    CommonConnectorConfig semantics inherited by Db2ConnectorConfig): a
    change event is malformed when its opcode is outside the known set or
    any key column is NULL. ``fail`` raises on the first malformed event
    (the reference's default — the task stops and the offset never
    advances past the poison event); ``warn`` and ``skip`` drop malformed
    rows and return how many were dropped (warn is skip + the caller
    logging the count). Vectorized: one mask per batch, map-only."""
    import pyarrow.compute as pc

    ops = env[op_col]
    ok = pc.is_in(
        ops, value_set=pa.array(list(valid_ops), ops.type
                                if not isinstance(ops, pa.ChunkedArray)
                                else ops.combine_chunks().type)
    )
    for k in key_columns:
        ok = pc.and_(ok, pc.is_valid(env[k]))
    n_bad = env.num_rows - pc.sum(ok).as_py()
    if n_bad and mode == "fail":
        first = pc.index(ok, False).as_py()
        raise ValueError(
            f"malformed change event at batch row {first} "
            f"({n_bad} malformed in batch); "
            "event.processing.failure.handling.mode=fail"
        )
    if mode not in ("fail", "warn", "skip"):  # pragma: no cover
        raise ValueError(f"unknown failure handling mode {mode!r}")
    return env.filter(ok), int(n_bad)


def column_filter(
    env: pa.Table,
    *,
    include: str | None = None,
    exclude: str | None = None,
    protected: tuple[str, ...] = (),
) -> pa.Table:
    """column.include.list / column.exclude.list (reference
    RelationalDatabaseConnectorConfig, inherited by Db2ConnectorConfig):
    project the payload to the columns whose fully-qualified names match
    the include regex (or don't match the exclude regex — the two options
    are mutually exclusive upstream, enforced here). ``protected`` columns
    (keys, LSN meta) always survive, matching the reference's rule that
    key columns cannot be filtered away. Pure projection — zero-copy."""
    import re

    if (include is None) == (exclude is None):
        raise ValueError(
            "exactly one of column.include.list / column.exclude.list"
        )
    pat = re.compile(include or exclude)
    keep = []
    for n in env.column_names:
        if n in protected:
            keep.append(n)
        elif include is not None and pat.fullmatch(n):
            keep.append(n)
        elif exclude is not None and not pat.fullmatch(n):
            keep.append(n)
    return env.select(keep)


def avro_sanitize_names(
    values: pa.Array | pa.ChunkedArray,
) -> pa.Array:
    """schema.name.adjustment.mode=avro (reference CommonConnectorConfig,
    the SchemaNameAdjuster.AVRO rule): every character outside Avro's
    [A-Za-z0-9_] name alphabet becomes '_', and a leading digit gets a
    '_' prefix — so `cdc.MY-DB.conv#log` -> `cdc_MY_DB_conv_log` and
    `1table` -> `_1table`. One RE2 replace kernel + one prefix fix-up per
    batch, map-only."""
    import pyarrow.compute as pc

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    clean = pc.replace_substring_regex(
        values, pattern=r"[^A-Za-z0-9_]", replacement="_"
    )
    needs_prefix = pc.match_substring_regex(clean, r"^[0-9]")
    return pc.if_else(
        needs_prefix,
        pc.binary_join_element_wise("_", clean, ""),
        clean,
    )


def ivm_signed_deltas(
    env: pa.Table,
    *,
    group_cols: tuple[str, ...],
    before_col: str,
    after_col: str,
    measure: str = "length",
) -> pa.Table:
    """Incremental-view-maintenance projection: turn each change envelope
    into its SIGNED contribution to a grouped SUM/COUNT view — insert/read
    contribute +f(after), delete contributes -f(before), update
    contributes f(after) - f(before) — so a downstream grouped sum of the
    deltas IS the maintained view, with no join back to base state and no
    re-aggregation of untouched groups (the change-propagation shape:
    aggregate views are self-maintainable from before/after images).
    ``measure`` = 'length' (character count, NULL -> 0) or 'count'
    (row-existence count). Map-only, one kernel per batch."""
    import pyarrow.compute as pc

    op = env["op_char"]
    if isinstance(op, pa.ChunkedArray):
        op = op.combine_chunks()

    def f(col_name: str) -> np.ndarray:
        col = env[col_name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if measure == "length":
            v = pc.fill_null(pc.utf8_length(col), 0)
            return v.to_numpy(zero_copy_only=False).astype(np.int64)
        if measure == "count":
            return pc.is_valid(col).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
        raise ValueError(f"unknown measure {measure!r}")

    after = f(after_col)
    before = f(before_col)
    opn = np.asarray(op.to_numpy(zero_copy_only=False))
    delta = np.where(
        (opn == "c") | (opn == "r"), after,
        np.where(opn == "d", -before,
                 np.where(opn == "u", after - before, 0)),
    ).astype(np.int64)
    cols = {c: env[c] for c in group_cols}
    cols["delta"] = pa.array(delta, pa.int64())
    return pa.table(cols)


def message_filter(
    env: pa.Table,
    *,
    predicate: str,
    negate: bool = False,
    topic_col: str = "topic",
    pattern: str | None = None,
    tombstone_cols: tuple[str, ...] = (),
) -> pa.Table:
    """Kafka Connect Filter SMT with its predicate surface (the
    transform Debezium's docs pair with ``predicates=...``): drop every
    record the predicate matches, or — with ``negate`` — every record it
    does NOT match (``predicate.<name>.negate=true``).

    Predicates implemented, mirroring the upstream trio:
    - ``topic_matches`` (TopicNameMatches): RE2 full-match of ``pattern``
      against ``topic_col``, vectorized via Arrow's match_substring_regex
      with explicit ^...$ anchoring. NULL topics never match.
    - ``is_tombstone`` (RecordIsTombstone): true when every column in
      ``tombstone_cols`` is NULL (the engine's tombstone triplet carries a
      NULL payload; HasHeaderKey is n/a — headers are columns here).

    Map-only: one boolean kernel per batch, no exchange, streams with
    backpressure at any corpus size."""
    import pyarrow.compute as pc

    if predicate == "topic_matches":
        if pattern is None:
            raise ValueError("topic_matches needs a pattern")
        anchored = pattern
        if not anchored.startswith("^"):
            anchored = "^" + anchored
        if not anchored.endswith("$"):
            anchored = anchored + "$"
        m = pc.fill_null(
            pc.match_substring_regex(
                env[topic_col].cast(pa.string()), anchored
            ),
            False,
        )
    elif predicate == "is_tombstone":
        if not tombstone_cols:
            raise ValueError("is_tombstone needs tombstone_cols")
        m = None
        for c in tombstone_cols:
            nn = pc.is_null(env[c])
            m = nn if m is None else pc.and_(m, nn)
    else:
        raise ValueError(f"unknown predicate {predicate!r}")
    # Filter drops matching records; negate inverts the predicate first.
    drop = pc.invert(m) if negate else m
    return env.filter(pc.invert(drop))


def hoist_field(env: pa.Table, *, fields: tuple[str, ...],
                into: str = "payload") -> pa.Table:
    """HoistField SMT (Kafka Connect core, applied by Debezium users to
    re-nest a flat value): wrap the named columns into ONE real Arrow
    struct column and drop the flat originals. Map-only, zero-copy — the
    struct references the same child buffers."""
    arrs = []
    for f in fields:
        c = env[f]
        arrs.append(c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                    else c)
    struct = pa.StructArray.from_arrays(arrs, names=list(fields))
    out = env.drop_columns(list(fields))
    return out.append_column(into, struct)


def extract_field(env: pa.Table, *, source: str, field: str,
                  out_col: str | None = None) -> pa.Table:
    """ExtractField SMT: pull one field out of a struct column into a
    top-level column (the inverse of hoist_field). Map-only via Arrow's
    struct_field kernel; NULL structs yield NULL fields."""
    import pyarrow.compute as pc

    col = env[source]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return env.append_column(out_col or field,
                             pc.struct_field(col, field))

