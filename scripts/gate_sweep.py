"""Local replica of the driver's correctness gate: run every queries()
entry that has an oracle_sql() twin at a given sf dir, compare sorted
columns + rows + values (pandas exact compare, same spirit as the
driver's value hash).
Usage: python scripts/gate_sweep.py [sf_dir] [query_name ...]"""

import sys

import duckdb
import pandas as pd

import ray

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf}/{t}.parquet')"
        )
    Q, O = e.queries(), e.oracle_sql()
    only = set(sys.argv[2:])
    bad = 0
    for name, fn in Q.items():
        if name not in O or (only and name not in only):
            continue
        try:
            got = fn(sf)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
            elif hasattr(got, "to_pydict"):
                got = got.to_pandas()
            exp = con.execute(O[name]).fetchdf()
            gc, ec = sorted(got.columns), sorted(exp.columns)
            if gc != ec:
                print(f"{name}: COLS {gc} vs {ec}")
                bad += 1
                continue
            g = got[gc].sort_values(gc).reset_index(drop=True)
            x = exp[ec].sort_values(ec).reset_index(drop=True)
            if len(g) != len(x):
                print(f"{name}: ROWS {len(g)} vs {len(x)}")
                bad += 1
                continue
            try:
                # dtype-width tolerant, like the driver's value hash
                # (int32 vs int64 normalizes; Decimal-vs-int still fails)
                pd.testing.assert_frame_equal(g, x, check_dtype=False,
                                              check_exact=True)
                print(f"{name}: ok ({len(g)})")
            except AssertionError as err:
                print(f"{name}: VALUES {str(err).splitlines()[0]}")
                bad += 1
        except Exception as err:  # noqa: BLE001
            print(f"{name}: ERROR {type(err).__name__} {str(err)[:200]}")
            bad += 1
    print(f"SWEEP {'FAIL' if bad else 'PASS'} bad={bad}")
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
