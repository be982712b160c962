"""Payload / changelog schemas + Debezium-style additive schema evolution.

The target lake table (BASELINE.json input_hint) is a Parquet table of agent
transcripts keyed by ``(conv_id, turn_idx)``. The change log mirrors the Db2
CD-table layout — capture metadata columns prepended to the payload image
(reference: src/test/docker/db2-cdc-docker/asncdcaddremove.sql:77-99;
metadata-column stripping CHANGE_TABLE_DATA_COLUMN_OFFSET
Db2Connection.java:70,385-424).

Schema evolution follows the reference's additive protocol: Db2 has no DDL in
the log, so a schema change creates a second capture instance and the
connector switches at a boundary LSN, re-reading the schema and emitting ALTER
(reference: Db2StreamingChangeEventSource.java:51-56,324-336,374-409). Our
equivalent: change-log batches may carry a WIDER schema; apply unifies with
``unify_payload_schemas`` — new columns null-backfilled, types widened
(int32->int64, float32->float64), never dropped or narrowed.
"""

from __future__ import annotations

import pyarrow as pa

#: primary key of the transcript lake
KEY_COLUMNS = ("conv_id", "turn_idx")

#: authoritative payload schema (BASELINE.json input_hint). Timestamps are
#: tz-naive to match the driver-generated parquet fixtures (DuckDB semantics).
PAYLOAD_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

#: change-log metadata columns (prepended, like IBMSNAP_* in the reference)
CHANGELOG_META_FIELDS = [
    ("commit_lsn_hi", pa.uint64()),
    ("commit_lsn_lo", pa.uint64()),
    ("intent_lsn_hi", pa.uint64()),
    ("intent_lsn_lo", pa.uint64()),
    ("op", pa.int8()),
]
CHANGELOG_META_COLUMNS = tuple(n for n, _ in CHANGELOG_META_FIELDS)


def changelog_schema(payload: pa.Schema = PAYLOAD_SCHEMA) -> pa.Schema:
    return pa.schema(list(CHANGELOG_META_FIELDS) + list(payload))


_WIDENINGS: dict[tuple[str, str], pa.DataType] = {}


def _widened(a: pa.DataType, b: pa.DataType) -> pa.DataType | None:
    """Smallest common type under the additive-widening rule, or None."""
    if a.equals(b):
        return a
    ints = [pa.int8(), pa.int16(), pa.int32(), pa.int64()]
    floats = [pa.float32(), pa.float64()]
    for fam in (ints, floats):
        ids = [t.id for t in fam]
        if a.id in ids and b.id in ids:
            return fam[max(ids.index(a.id), ids.index(b.id))]
    # int -> float widening
    if a.id in [t.id for t in ints] and b.id in [t.id for t in floats]:
        return pa.float64()
    if b.id in [t.id for t in ints] and a.id in [t.id for t in floats]:
        return pa.float64()
    return None


def unify_payload_schemas(old: pa.Schema, new: pa.Schema) -> pa.Schema:
    """Additive unification: every column of either schema survives; common
    columns take the widened type; column order = old columns first, then new
    columns in their order of appearance (Debezium additive ALTER)."""
    fields: list[pa.Field] = []
    new_names = {f.name: f for f in new}
    for f in old:
        g = new_names.get(f.name)
        if g is None:
            fields.append(f)
        else:
            t = _widened(f.type, g.type)
            if t is None:
                raise TypeError(
                    f"illegal (non-additive) schema change on column {f.name!r}: "
                    f"{f.type} -> {g.type}"
                )
            fields.append(pa.field(f.name, t))
    old_names = {f.name for f in old}
    for g in new:
        if g.name not in old_names:
            fields.append(g)
    return pa.schema(fields)


def propagate_source_types(schema: pa.Schema, source_types: dict[str, dict]) -> pa.Schema:
    """Datatype-propagation hook (reference M9: emits
    ``__debezium.source.column.type/length/scale`` schema parameters when
    enabled, Db2ConnectorIT.java:820-871, keys util/TestHelper.java:50-63):
    attach the source column type metadata to the Arrow fields so it rides
    with every output file."""
    fields = []
    for f in schema:
        info = source_types.get(f.name)
        if info:
            md = dict(f.metadata or {})
            for k, v in info.items():
                md[f"__debezium.source.column.{k}".encode()] = str(v).encode()
            f = f.with_metadata(md)
        fields.append(f)
    return pa.schema(fields)


DEFAULT_EXPR_KEY = b"__db2.default.expr"
DEFAULT_TYPE_KEY = b"__db2.default.type"


def attach_column_defaults(
    schema: pa.Schema, defaults: dict[str, str | tuple[str, str]]
) -> pa.Schema:
    """Annotate schema fields with their catalog DEFAULT expression (and
    optionally the source type name) as field metadata — the channel that
    rides with the schema through the durable history, so an ALTER that
    adds a defaulted column can backfill old rows with the TYPED value
    instead of null (AbstractDb2DefaultValueIT semantics). ``defaults``
    maps column -> raw expression, or -> (raw expression, source type
    name)."""
    fields = []
    for f in schema:
        d = defaults.get(f.name)
        if d is not None:
            md = dict(f.metadata or {})
            if isinstance(d, tuple):
                raw, type_name = d
                md[DEFAULT_TYPE_KEY] = type_name.encode()
            else:
                raw = d
            md[DEFAULT_EXPR_KEY] = raw.encode()
            f = f.with_metadata(md)
        fields.append(f)
    return pa.schema(fields)


def _source_type_name(t: pa.DataType) -> str:
    """Best-effort source type name for a bare Arrow type (used when the
    catalog name wasn't recorded)."""
    if pa.types.is_boolean(t):
        return "BOOLEAN"
    if pa.types.is_int16(t) or pa.types.is_int8(t):
        return "SMALLINT"
    if pa.types.is_int32(t):
        return "INTEGER"
    if pa.types.is_integer(t):
        return "BIGINT"
    if pa.types.is_float32(t):
        return "REAL"
    if pa.types.is_floating(t):
        return "DOUBLE"
    if pa.types.is_decimal(t):
        return "DECIMAL"
    if pa.types.is_date(t):
        return "DATE"
    if pa.types.is_time(t):
        return "TIME"
    if pa.types.is_timestamp(t):
        return "TIMESTAMP"
    return "VARCHAR"


def defaults_from_schema(schema: pa.Schema) -> dict[str, object]:
    """Parse every field's recorded DEFAULT expression into a typed value
    (converters.DefaultValueConverter) — the dict conform_table consumes."""
    from debezium_connector_db2_ray.converters import (
        ColumnSpec,
        DefaultValueConverter,
    )

    dv = DefaultValueConverter()
    out: dict[str, object] = {}
    for f in schema:
        md = f.metadata or {}
        raw = md.get(DEFAULT_EXPR_KEY)
        if raw is None:
            continue
        type_name = md.get(DEFAULT_TYPE_KEY, b"").decode() or _source_type_name(
            f.type
        )
        spec = ColumnSpec(
            f.name, type_name,
            length=getattr(f.type, "precision", None),
            scale=getattr(f.type, "scale", None),
            optional=f.nullable,
        )
        val = dv.parse(spec, raw.decode())
        if val is not None:
            out[f.name] = val
    return out


def conform_table(
    table: pa.Table, target: pa.Schema, defaults: dict[str, object] | None = None
) -> pa.Table:
    """Cast/backfill a table to ``target``: missing columns become all-null
    (the Debezium additive rule), existing columns are cast (widening only).
    ``defaults`` optionally backfills a missing column with a typed default
    value instead of null — the reference's column-DEFAULT application hook
    (Db2DefaultValueConverter.java:49-107; defaults-on-ALTER golden tests
    AbstractDb2DefaultValueIT.java). Column order = target order. Extra
    columns not in ``target`` are dropped (caller unifies first if it wants
    to keep them)."""
    n = table.num_rows
    cols = []
    names = set(table.column_names)
    defaults = defaults or {}
    for f in target:
        if f.name in names:
            cols.append(table.column(f.name).cast(f.type))
        elif f.name in defaults:
            cols.append(pa.nulls(n, f.type).fill_null(pa.scalar(defaults[f.name], f.type)))
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(cols, schema=target)
