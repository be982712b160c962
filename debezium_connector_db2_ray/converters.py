"""Value-converter type system + DEFAULT-expression parsing.

Mirrors the reference's two converter layers, re-expressed for Arrow batches:

- ``Db2ValueConverters`` (Db2ValueConverters.java:59-151): a pluggable
  per-column-type table mapping a Db2 column spec to an Arrow type and a
  vectorized batch kernel, with the user-selectable DECIMAL/DECFLOAT
  trichotomy ``decimal.handling.mode`` = PRECISE (fixed-scale decimal128;
  DECFLOAT becomes a VariableScaleDecimal-like struct{scale, unscaled
  bytes}, Db2ValueConverters.java:84-116,146-151) | DOUBLE (float64) |
  STRING (full-scale decimal rendering). TINYINT widens to int16 — Db2's
  8-bit type is unsigned (Db2ValueConverters.java:59-62). Temporal
  precision derives from the column's scale (Db2ValueConverters.java:119-124).

- ``DefaultValueConverter`` (Db2DefaultValueConverter.java:109-229): parses
  the raw DEFAULT expression text the catalog stores — ``NULL`` sentinel,
  boolean 0/1, numeric literals, ``CURRENT DATE/TIME/TIMESTAMP`` sentinels
  (optional column -> ignored/None; required -> epoch values), CHAR
  space-padding to the declared length, string unquoting of ``'v'`` and
  ``('v')`` forms, and decimal scale adjustment to the column's declared
  scale with HALF_EVEN rounding (pinned by
  Db2DefaultValueConverterTest.java:39-260).

Parsed defaults feed ``schema.conform_table(defaults=...)`` so an ALTER
backfill materializes typed values, not nulls
(AbstractDb2DefaultValueIT.java).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from decimal import ROUND_HALF_EVEN, Decimal

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PRECISE = "precise"
DOUBLE = "double"
STRING = "string"

#: Arrow analog of the reference's VariableScaleDecimal (unbounded-precision
#: DECFLOAT in PRECISE mode): scale + big-endian twos-complement unscaled value
VARIABLE_SCALE_DECIMAL = pa.struct(
    [("scale", pa.int32()), ("value", pa.binary())]
)


@dataclass(frozen=True)
class ColumnSpec:
    """A source column as the catalog describes it (name, type text,
    length/precision, scale, nullability)."""

    name: str
    type_name: str  # e.g. "DECIMAL", "VARCHAR", "TIMESTAMP", "DECFLOAT"
    length: int | None = None
    scale: int | None = None
    optional: bool = True

    @property
    def base_type(self) -> str:
        t = self.type_name.upper()
        return t.split("(", 1)[0].strip()

    def _parenthesized(self) -> tuple[int | None, int | None]:
        """(length, scale) parsed from a ``TYPE(l[,s])`` type name."""
        t = self.type_name
        if "(" not in t or not t.rstrip().endswith(")"):
            return None, None
        inner = t[t.index("(") + 1 : t.rindex(")")]
        parts = [p.strip() for p in inner.split(",")]
        try:
            ln = int(parts[0])
            sc = int(parts[1]) if len(parts) > 1 else None
            return ln, sc
        except ValueError:
            return None, None

    @property
    def effective_length(self) -> int | None:
        if self.length is not None:
            return self.length
        ln, sc = self._parenthesized()
        # TIMESTAMP(9)/TIME(3): the single parenthesized value is the
        # fractional-second SCALE, not a length
        if sc is None and self.base_type in ("TIMESTAMP", "TIME"):
            return None
        return ln

    @property
    def effective_scale(self) -> int | None:
        if self.scale is not None:
            return self.scale
        ln, sc = self._parenthesized()
        if sc is None and self.base_type in ("TIMESTAMP", "TIME"):
            return ln
        return sc


class Db2ValueConverters:
    """The pluggable converter table: column spec -> (Arrow type, vectorized
    kernel). ``decimal_mode`` selects the DECIMAL/DECFLOAT representation;
    ``register(type_name, arrow_type_fn, convert_fn)`` plugs custom types."""

    def __init__(self, decimal_mode: str = PRECISE):
        if decimal_mode not in (PRECISE, DOUBLE, STRING):
            raise ValueError(f"unknown decimal mode: {decimal_mode}")
        self.decimal_mode = decimal_mode
        self._custom: dict[str, tuple] = {}

    def register(self, type_name: str, arrow_type_fn, convert_fn) -> None:
        self._custom[type_name.upper()] = (arrow_type_fn, convert_fn)

    # -- type mapping -------------------------------------------------------

    def arrow_type(self, col: ColumnSpec) -> pa.DataType:
        t = col.base_type
        if t in self._custom:
            return self._custom[t][0](col)
        if t == "BOOLEAN":
            return pa.bool_()
        if t == "TINYINT":
            return pa.int16()  # unsigned 8-bit source range needs 16 bits
        if t == "SMALLINT":
            return pa.int16()
        if t in ("INTEGER", "INT"):
            return pa.int32()
        if t == "BIGINT":
            return pa.int64()
        if t == "REAL":
            return pa.float32()
        if t in ("DOUBLE", "FLOAT"):
            return pa.float64()
        if t in ("DECIMAL", "NUMERIC"):
            if self.decimal_mode == PRECISE:
                return pa.decimal128(
                    col.effective_length or 31, col.effective_scale or 0
                )
            return pa.float64() if self.decimal_mode == DOUBLE else pa.string()
        if t == "DECFLOAT":
            if self.decimal_mode == PRECISE:
                return VARIABLE_SCALE_DECIMAL
            return pa.float64() if self.decimal_mode == DOUBLE else pa.string()
        if t == "DATE":
            return pa.date32()
        if t == "TIME":
            return pa.time64("us")
        if t == "TIMESTAMP":
            # temporal precision follows the column scale — including a
            # TIMESTAMP(9)-style type name, whose parenthesized value binds
            # to scale (Db2ValueConverters.java:119-124); Arrow s/ms/us/ns
            s = col.effective_scale if col.effective_scale is not None else 6
            unit = "s" if s == 0 else ("ms" if s <= 3 else ("us" if s <= 6 else "ns"))
            return pa.timestamp(unit)
        if t in ("CHAR", "NCHAR", "VARCHAR", "NVARCHAR", "CLOB"):
            return pa.string()
        if t in ("BINARY", "VARBINARY", "BLOB"):
            return pa.binary()
        raise KeyError(f"no converter registered for type {col.type_name}")

    # -- batch kernels ------------------------------------------------------

    def convert(self, arr, col: ColumnSpec) -> pa.Array:
        """Vectorized conversion of one column's batch to its target type.
        DECIMAL source data may arrive as strings or numerics; DECFLOAT in
        PRECISE mode is the only per-value path (unbounded precision has no
        fixed-width vector form)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        t = col.base_type
        if t in self._custom:
            return self._custom[t][1](arr, col)
        target = self.arrow_type(col)
        if t in ("DECIMAL", "NUMERIC"):
            if self.decimal_mode == PRECISE:
                return pc.cast(arr, target)
            if self.decimal_mode == DOUBLE:
                return pc.cast(arr, pa.float64())
            # STRING: full-scale rendering via the fixed-scale decimal
            dec = pc.cast(
                arr,
                pa.decimal128(col.effective_length or 31,
                              col.effective_scale or 0),
            )
            return pc.cast(dec, pa.string())
        if t == "DECFLOAT":
            if self.decimal_mode == DOUBLE:
                return pc.cast(arr, pa.float64())
            if self.decimal_mode == STRING:
                return pc.cast(arr, pa.string())
            vals = arr.to_pylist()
            out = []
            for v in vals:
                if v is None:
                    out.append(None)
                    continue
                d = Decimal(str(v)).normalize()
                if d.as_tuple().exponent > 0:  # strip-zeros gave 1E+2 form
                    d = d.quantize(Decimal(1))
                scale = -d.as_tuple().exponent
                unscaled = int(d.scaleb(scale))
                nbytes = max(1, (unscaled.bit_length() + 8) // 8)
                out.append(
                    {"scale": scale,
                     "value": unscaled.to_bytes(nbytes, "big", signed=True)}
                )
            return pa.array(out, VARIABLE_SCALE_DECIMAL)
        return pc.cast(arr, target)


class DefaultValueConverter:
    """Parses catalog DEFAULT expression text into a typed Python value
    usable as a ``conform_table`` default (Db2DefaultValueConverter.java)."""

    def __init__(self, converters: Db2ValueConverters | None = None):
        self.converters = converters or Db2ValueConverters()

    def parse(self, col: ColumnSpec, raw: str | None):
        if raw is None:
            return None
        if raw.strip().upper() == "NULL":
            return None
        t = col.base_type
        v = raw.strip()
        if t == "BOOLEAN":
            if v == "1":
                return True
            if v == "0":
                return False
            return v.lower() == "true"
        if t in ("TINYINT", "SMALLINT", "INTEGER", "INT", "BIGINT"):
            return int(v)
        if t in ("DOUBLE", "FLOAT", "REAL"):
            return float(v)
        if t in ("DECIMAL", "NUMERIC", "DECFLOAT"):
            d = Decimal(_unquote(v))
            scale = col.effective_scale
            if scale is not None and -d.as_tuple().exponent != scale:
                # adjust to the declared scale, HALF_EVEN
                # (Db2DefaultValueConverterTest.java:39-160)
                d = d.quantize(Decimal(1).scaleb(-scale), ROUND_HALF_EVEN)
            return d
        if t == "DATE":
            if v.upper() == "CURRENT DATE":
                return None if col.optional else _dt.date(1970, 1, 1)
            return _dt.date.fromisoformat(_unquote(v))
        if t == "TIME":
            if v.upper() == "CURRENT TIME":
                return None if col.optional else _dt.time(0, 0, 0)
            return _dt.time.fromisoformat(_unquote(v).replace(".", ":"))
        if t == "TIMESTAMP":
            if v.upper() == "CURRENT TIMESTAMP":
                return None if col.optional else _dt.datetime(1970, 1, 1)
            return _dt.datetime.fromisoformat(_unquote(v))
        if t in ("CHAR", "NCHAR"):
            s = _unquote(v)
            ln = col.effective_length
            return s.ljust(ln, " ") if ln else s
        if t in ("VARCHAR", "NVARCHAR", "CLOB"):
            return _unquote(v)
        return v

    def typed_defaults(self, specs_with_raw: dict[ColumnSpec, str | None]):
        """{column name -> typed default} for conform_table(defaults=...)."""
        out = {}
        for col, raw in specs_with_raw.items():
            val = self.parse(col, raw)
            if val is not None:
                out[col.name] = val
        return out


def _unquote(value: str) -> str:
    """``('v')`` and ``'v'`` forms shed their wrapping
    (Db2DefaultValueConverter.java:221-229)."""
    if value.startswith("('") and value.endswith("')"):
        return value[2:-2]
    if value.startswith("'") and value.endswith("'"):
        return value[1:-1]
    return value
