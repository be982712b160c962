"""Converter-table + DEFAULT-parsing tests mirroring the reference goldens
(Db2DefaultValueConverterTest.java:39-260, Db2ValueConverters.java:59-151,
AbstractDb2DefaultValueIT.java)."""

import datetime as dt
from decimal import Decimal

import pyarrow as pa
import pytest

from debezium_connector_db2_ray.converters import (
    DOUBLE,
    PRECISE,
    STRING,
    VARIABLE_SCALE_DECIMAL,
    ColumnSpec,
    Db2ValueConverters,
    DefaultValueConverter,
)

DV = DefaultValueConverter()


# ---- decimal scale adjustment (Db2DefaultValueConverterTest.java:39-160) ----

@pytest.mark.parametrize(
    "type_name,length,scale,raw,expected",
    [
        ("DECIMAL", 18, 8, "0", Decimal("0.00000000")),
        ("DECIMAL", 5, 2, "3.1", Decimal("3.10")),
        ("DECIMAL", 18, 8, "0.00000000", Decimal("0.00000000")),
        ("DECIMAL", 10, 0, "100", Decimal("100")),
        ("NUMERIC", 18, 8, "0", Decimal("0.00000000")),  # NUMERIC aliases
        ("DECIMAL", 5, 2, "1.005", Decimal("1.00")),  # HALF_EVEN
        ("DECIMAL", 5, 2, "1.015", Decimal("1.02")),  # HALF_EVEN
    ],
)
def test_decimal_default_scale_adjustment(type_name, length, scale, raw, expected):
    col = ColumnSpec("amount", type_name, length, scale, optional=True)
    got = DV.parse(col, raw)
    assert isinstance(got, Decimal)
    assert got == expected
    assert -got.as_tuple().exponent == scale


# ---- sentinels, padding, unquoting (Db2DefaultValueConverter.java:109-229) --

def test_null_sentinel_any_case():
    col = ColumnSpec("c", "INTEGER")
    assert DV.parse(col, "NULL") is None
    assert DV.parse(col, "null") is None
    assert DV.parse(col, None) is None


def test_boolean_zero_one_and_text():
    col = ColumnSpec("flag", "BOOLEAN")
    assert DV.parse(col, "1") is True
    assert DV.parse(col, "0") is False
    assert DV.parse(col, "true") is True
    assert DV.parse(col, "anything") is False


def test_current_temporal_sentinels_optional_ignored():
    for t in ("DATE", "TIME", "TIMESTAMP"):
        col = ColumnSpec("c", t, optional=True)
        assert DV.parse(col, f"CURRENT {t}") is None


def test_current_temporal_sentinels_required_epoch():
    assert DV.parse(ColumnSpec("c", "DATE", optional=False), "CURRENT DATE") == dt.date(1970, 1, 1)
    assert DV.parse(ColumnSpec("c", "TIME", optional=False), "CURRENT TIME") == dt.time(0, 0, 0)
    assert DV.parse(
        ColumnSpec("c", "TIMESTAMP", optional=False), "CURRENT TIMESTAMP"
    ) == dt.datetime(1970, 1, 1)


def test_temporal_literals():
    assert DV.parse(ColumnSpec("c", "DATE"), "'2020-03-04'") == dt.date(2020, 3, 4)
    assert DV.parse(ColumnSpec("c", "TIMESTAMP"), "'2020-03-04 05:06:07'") == dt.datetime(2020, 3, 4, 5, 6, 7)


def test_char_padding_to_declared_length():
    col = ColumnSpec("code", "CHAR", length=5)
    assert DV.parse(col, "'ab'") == "ab   "
    assert DV.parse(ColumnSpec("code", "NCHAR", length=3), "'x'") == "x  "


def test_varchar_unquote_both_forms():
    col = ColumnSpec("s", "VARCHAR", length=20)
    assert DV.parse(col, "'hello'") == "hello"
    assert DV.parse(col, "('hello')") == "hello"
    assert DV.parse(col, "bare") == "bare"


def test_numeric_literal_parses():
    assert DV.parse(ColumnSpec("n", "INTEGER"), "42") == 42
    assert DV.parse(ColumnSpec("n", "SMALLINT"), "-3") == -3
    assert DV.parse(ColumnSpec("n", "DOUBLE"), "2.5") == 2.5


# ---- value-converter table (Db2ValueConverters.java) ------------------------

def test_arrow_type_trichotomy():
    col = ColumnSpec("amount", "DECIMAL", 18, 4)
    assert Db2ValueConverters(PRECISE).arrow_type(col) == pa.decimal128(18, 4)
    assert Db2ValueConverters(DOUBLE).arrow_type(col) == pa.float64()
    assert Db2ValueConverters(STRING).arrow_type(col) == pa.string()
    df = ColumnSpec("d", "DECFLOAT", 34)
    assert Db2ValueConverters(PRECISE).arrow_type(df) == VARIABLE_SCALE_DECIMAL
    assert Db2ValueConverters(DOUBLE).arrow_type(df) == pa.float64()


def test_tinyint_widens_to_int16():
    # Db2 8-bit is unsigned 0..255 — int8 can't hold it
    assert Db2ValueConverters().arrow_type(ColumnSpec("t", "TINYINT")) == pa.int16()


def test_timestamp_unit_follows_scale():
    vc = Db2ValueConverters()
    assert vc.arrow_type(ColumnSpec("t", "TIMESTAMP", scale=0)) == pa.timestamp("s")
    assert vc.arrow_type(ColumnSpec("t", "TIMESTAMP", scale=3)) == pa.timestamp("ms")
    assert vc.arrow_type(ColumnSpec("t", "TIMESTAMP", scale=6)) == pa.timestamp("us")
    assert vc.arrow_type(ColumnSpec("t", "TIMESTAMP", scale=9)) == pa.timestamp("ns")


def test_decimal_batch_conversion_three_modes():
    col = ColumnSpec("amount", "DECIMAL", 18, 4)
    raw = pa.array(["0", "3.1", "12.3456", None], pa.string())
    precise = Db2ValueConverters(PRECISE).convert(raw, col)
    assert precise.type == pa.decimal128(18, 4)
    assert precise.to_pylist() == [
        Decimal("0.0000"), Decimal("3.1000"), Decimal("12.3456"), None
    ]
    dbl = Db2ValueConverters(DOUBLE).convert(raw, col)
    assert dbl.to_pylist() == [0.0, 3.1, 12.3456, None]
    s = Db2ValueConverters(STRING).convert(raw, col)
    assert s.to_pylist() == ["0.0000", "3.1000", "12.3456", None]


def test_decfloat_precise_variable_scale_struct():
    col = ColumnSpec("d", "DECFLOAT", 34)
    raw = pa.array(["1.50", "200", None], pa.string())
    out = Db2ValueConverters(PRECISE).convert(raw, col)
    vals = out.to_pylist()
    # 1.50 strips to 1.5 (scale 1, unscaled 15); 200 keeps scale 0
    assert vals[0] == {"scale": 1, "value": (15).to_bytes(1, "big", signed=True)}
    assert vals[1]["scale"] == 0
    assert int.from_bytes(vals[1]["value"], "big", signed=True) == 200
    assert vals[2] is None


def test_custom_type_registration():
    vc = Db2ValueConverters()
    vc.register("XML", lambda c: pa.string(), lambda a, c: a.cast(pa.string()))
    assert vc.arrow_type(ColumnSpec("x", "XML")) == pa.string()
    with pytest.raises(KeyError):
        vc.arrow_type(ColumnSpec("x", "GEOMETRY"))


def test_typed_defaults_feed_conform_table():
    from debezium_connector_db2_ray.schema import conform_table

    dv = DefaultValueConverter()
    defaults = dv.typed_defaults(
        {
            ColumnSpec("code", "CHAR", length=4): "'ab'",
            ColumnSpec("n", "INTEGER"): "7",
            ColumnSpec("skip", "VARCHAR", length=5): "NULL",
        }
    )
    assert defaults == {"code": "ab  ", "n": 7}
    t = pa.table({"conv_id": ["x"]})
    target = pa.schema(
        [("conv_id", pa.string()), ("code", pa.string()), ("n", pa.int32()),
         ("skip", pa.string())]
    )
    out = conform_table(t, target, defaults=defaults)
    assert out["code"].to_pylist() == ["ab  "]
    assert out["n"].to_pylist() == [7]
    assert out["skip"].to_pylist() == [None]


def test_string_mode_with_parenthesized_type_name():
    """Review regression: STRING mode must honor TYPE(l,s) names like the
    PRECISE path does (decimal128(31,0) would reject '123.45')."""
    col = ColumnSpec("amount", "DECIMAL(18,2)")
    raw = pa.array(["123.45", "7"], pa.string())
    s = Db2ValueConverters(STRING).convert(raw, col)
    assert s.to_pylist() == ["123.45", "7.00"]
    p = Db2ValueConverters(PRECISE).convert(raw, col)
    assert p.type == pa.decimal128(18, 2)


def test_source_ts_ms_respects_timestamp_unit():
    from debezium_connector_db2_ray.stages.envelope import with_source_info

    def env_with(unit, val):
        return pa.table(
            {
                "commit_lsn_hi": pa.array([0], pa.uint64()),
                "commit_lsn_lo": pa.array([1], pa.uint64()),
                "intent_lsn_hi": pa.array([0], pa.uint64()),
                "intent_lsn_lo": pa.array([1], pa.uint64()),
                "op_char": pa.array(["c"], pa.string()),
                "after_ts": pa.array([val], pa.int64()).cast(pa.timestamp(unit)),
            }
        )

    for unit, ticks in (("s", 12), ("ms", 12_000), ("us", 12_000_000),
                        ("ns", 12_000_000_000)):
        out = with_source_info(
            env_with(unit, ticks), name="n", db="d", schema="s", table="t",
            ts_before="nope",
        )
        assert out["source_ts_ms"][0].as_py() == 12_000, unit


def test_timestamp_paren_value_binds_to_scale():
    """TIMESTAMP(9) parses the 9 as the fractional-second SCALE, not a
    length, so nanosecond precision survives (reference derives temporal
    precision from column scale, Db2ValueConverters.java:119-124)."""
    conv = Db2ValueConverters()
    assert conv.arrow_type(ColumnSpec("t", "TIMESTAMP(9)")) == pa.timestamp("ns")
    assert conv.arrow_type(ColumnSpec("t", "TIMESTAMP(3)")) == pa.timestamp("ms")
    assert conv.arrow_type(ColumnSpec("t", "TIMESTAMP(0)")) == pa.timestamp("s")
    assert conv.arrow_type(ColumnSpec("t", "TIMESTAMP")) == pa.timestamp("us")
    assert ColumnSpec("t", "TIMESTAMP(9)").effective_scale == 9
    assert ColumnSpec("t", "TIMESTAMP(9)").effective_length is None
    # an explicit scale attribute still wins over the type-name suffix
    assert ColumnSpec("t", "TIMESTAMP(9)", scale=3).effective_scale == 3
    # DECIMAL keeps (length, scale) binding
    spec = ColumnSpec("d", "DECIMAL(10,2)")
    assert spec.effective_length == 10 and spec.effective_scale == 2
