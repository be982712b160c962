"""Local replica of the driver's correctness gate: run every queries() entry
through Ray AND its oracle_sql() through DuckDB on the same parquet tables,
compare row count, column names/types, and order-insensitive values."""

import glob
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), na_position="first", kind="mergesort")
    return df.reset_index(drop=True)


def _gate_names():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    names = sorted(e.queries().keys())
    return names


@pytest.mark.parametrize("name", _gate_names())
def test_query_matches_oracle(ray_session, name):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    got = _normalize(_to_pandas(qs[name](SF_DIR)))
    if name not in os_:
        assert len(got) >= 0  # rows-only check (driver's weak mode)
        return
    con = _duck(SF_DIR)
    want = _normalize(con.execute(os_[name]).fetchdf())
    con.close()
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    # The driver's value-hash is dtype-sensitive (e.g. DuckDB HUGEINT vs
    # engine int64 serialize differently even when integer-equal) — require
    # exact dtype agreement on numeric columns so drift fails HERE, not at
    # the round gate.
    # Width differences within a kind (int32 vs int64) hash identically
    # (r02 evidence: cdc_lineage_counts was hash-green with int32 oracle);
    # kind differences (int vs float/object, e.g. HUGEINT) do not.
    for c in got.columns:
        gd, wd = got[c].dtype, want[c].dtype
        if pd.api.types.is_numeric_dtype(gd) or pd.api.types.is_numeric_dtype(wd):
            assert gd.kind == wd.kind, (
                f"{name}.{c}: engine dtype {gd} != oracle dtype {wd} "
                "(driver hash is dtype-sensitive — CAST the oracle or fix the engine)"
            )
    # check_exact: the driver hashes VALUES — a float off by one ulp
    # passes rtol but fails the driver, so the replica must be exact
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


def test_entry_smoke(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    df = _to_pandas(e.entry())
    assert len(df) > 0
    assert "conv_id" in df.columns and "text" in df.columns
