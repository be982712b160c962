"""Unit tests for the round-5 continuation batch: grouped running-max
drawdown (prefix-max doubling kernel) and the integer-exact unigram
surprisal LM-quality score."""

import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _brute_drawdown(vals):
    """Reference peak / max drawdown over one ordered series."""
    peak = -1 << 62
    dd = -1 << 62
    run = -1 << 62
    for v in vals:
        run = max(run, v)
        peak = max(peak, run)
        dd = max(dd, run - v)
    return peak, dd


def test_grouped_drawdown_matches_bruteforce(ray_session):
    """Prefix-max doubling == sequential running max on every group,
    including single-row groups and a group long enough to need several
    doubling steps (length 37 > 2^5)."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_drawdown,
    )

    rng = np.random.default_rng(7)
    groups, orders, vals = [], [], []
    for g, size in enumerate([1, 2, 37, 5, 16]):
        v = rng.integers(-1000, 1000, size=size)
        groups += [g] * size
        orders += list(range(size))
        vals += list(v)
    t = pa.table({
        "g": pa.array(groups, pa.int64()),
        "o": pa.array(orders, pa.int64()),
        "v": pa.array(vals, pa.int64()),
    })
    out = grouped_drawdown(
        rd.from_arrow(t), keys=["g"], order_by=[("o", "ascending")],
        col="v", schema=t.schema,
    ).to_pandas().set_index("g").sort_index()

    i = 0
    for g, size in enumerate([1, 2, 37, 5, 16]):
        peak, dd = _brute_drawdown(vals[i:i + size])
        assert out.loc[g, "peak"] == peak
        assert out.loc[g, "max_drawdown"] == dd
        assert out.loc[g, "n"] == size
        i += size


def test_grouped_drawdown_partition_invariance(ray_session):
    """The result is identical at 1 and 5 partitions — the hash exchange
    co-locates each group, so partition count can't change any group's
    ordered scan."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_drawdown,
    )

    rng = np.random.default_rng(11)
    n = 500
    t = pa.table({
        "g": pa.array(rng.integers(0, 23, n), pa.int64()),
        "o": pa.array(rng.permutation(n), pa.int64()),
        "v": pa.array(rng.integers(-10**6, 10**6, n), pa.int64()),
    })
    outs = []
    for parts in (1, 5):
        df = grouped_drawdown(
            rd.from_arrow(t), keys=["g"], order_by=[("o", "ascending")],
            col="v", num_partitions=parts, schema=t.schema,
        ).to_pandas().sort_values("g").reset_index(drop=True)
        outs.append(df)
    assert outs[0].equals(outs[1])


def test_grouped_drawdown_monotone_series_has_zero_drawdown(ray_session):
    """A non-decreasing series never drops below its running max."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_drawdown,
    )

    t = pa.table({
        "g": pa.array([0] * 6, pa.int64()),
        "o": pa.array(range(6), pa.int64()),
        "v": pa.array([1, 1, 3, 5, 5, 9], pa.int64()),
    })
    out = grouped_drawdown(
        rd.from_arrow(t), keys=["g"], order_by=[("o", "ascending")],
        col="v", schema=t.schema,
    ).take_all()
    assert out == [{"g": 0, "peak": 9, "max_drawdown": 0, "n": 6}]


def test_unigram_surprisal_bruteforce_and_dropout(ray_session):
    """Engine score == brute-force N//cnt mean per doc; token-less docs
    drop out exactly like the SQL unnest; the min_count=2 broadcast trim
    is invisible (absent means count==1 exactly)."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.text import (
        unigram_surprisal,
    )

    texts = [
        "the cat sat on the mat",
        "the dog\tsat",
        "   ",               # whitespace-only: no tokens -> dropped
        "Zephyr quartz the",  # singletons + one common term
        "",
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = unigram_surprisal(
        rd.from_arrow(t), min_count=2
    ).to_pandas().set_index("doc_id").sort_index()

    # brute force over lowercased \S+ tokens
    toks = [tx.lower().split() for tx in texts]
    allt = [w for ws in toks for w in ws]
    n_total = len(allt)
    cnt = {}
    for w in allt:
        cnt[w] = cnt.get(w, 0) + 1
    expect = {}
    for i, ws in enumerate(toks):
        if not ws:
            continue
        s = sum(n_total // cnt[w] for w in ws)
        expect[i] = (len(ws), s // len(ws))
    assert set(out.index) == set(expect)
    for i, (n_tok, score) in expect.items():
        assert out.loc[i, "n_tokens"] == n_tok
        assert out.loc[i, "mean_inv_freq"] == score


def test_insert_and_cast_fields():
    """The Connect-core SMT trio keeps its contract: InsertField appends
    constants and metadata copies, Cast rewrites in place with Java
    float->int truncation-toward-zero, and envelope exports exactly ONE
    cast_fields (a duplicate definition once shadowed the string-spec
    original and broke cdc_smt_chain)."""
    from debezium_connector_db2_ray.stages import envelope
    from debezium_connector_db2_ray.stages.envelope import (
        cast_fields,
        insert_fields,
    )

    # the string-typed Connect config grammar is the one true signature
    import inspect

    sig = inspect.signature(cast_fields)
    assert sig.parameters["spec"].annotation == "dict[str, str]"
    assert envelope.cast_fields is cast_fields

    t = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "op": pa.array([1, 5], pa.int8()),
        "f": pa.array([-1.7, 2.9], pa.float64()),
    })
    out = insert_fields(
        t, static={"tag": "x"}, copies={"k2": "k"}
    )
    assert out["tag"].to_pylist() == ["x", "x"]
    assert out["k2"].to_pylist() == [1, 2]
    cast = cast_fields(
        out, spec={"k": "string", "op": "int64", "f": "int32"}
    )
    # in place: same column order, new types
    assert cast.column_names == out.column_names
    assert cast["k"].to_pylist() == ["1", "2"]
    assert cast.schema.field("op").type == pa.int64()
    # Java (int) cast: truncation toward zero, not rounding
    assert cast["f"].to_pylist() == [-1, 2]


def test_longest_streak_islands(ray_session):
    """Gaps-and-islands: multi-event days collapse, a one-day gap breaks
    the streak, and active_days counts distinct days."""
    import ray.data as rd

    import __ray_entry__ as e

    # fabricate a tiny events parquet: user 1 active on days 1,2,3,5;
    # user 2 active twice on one day only
    import os
    import tempfile

    days = [1, 1, 2, 3, 5]
    ts = pa.array(
        [np.datetime64("2024-01-01", "us") + np.timedelta64(d, "D")
         for d in days + [10, 10]]
    )
    t = pa.table({
        "user_id": pa.array([1] * 5 + [2, 2], pa.int64()),
        "ts": ts,
        "event_id": pa.array(range(7), pa.int64()),
        "event_type": pa.array(["click"] * 7),
        "value": pa.array([1.0] * 7),
        "props": pa.array(["{}"] * 7),
    })
    with tempfile.TemporaryDirectory() as d:
        import pyarrow.parquet as pq

        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = (
            e.queries()["user_longest_streak"](d)
            .to_pandas().set_index("user_id").sort_index()
        )
    assert out.loc[1, "longest_streak"] == 3   # days 1-2-3
    assert out.loc[1, "active_days"] == 4      # {1,2,3,5}
    assert out.loc[2, "longest_streak"] == 1
    assert out.loc[2, "active_days"] == 1


def test_rolling_minmax_matches_bruteforce(ray_session):
    """Block-decomposition sliding extrema == per-row brute force across
    window sizes incl. w=1 (identity) and w >= group length (running
    extrema), at multiple partition counts."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_rolling_minmax,
    )

    rng = np.random.default_rng(3)
    n = 120
    g = rng.integers(0, 4, n)
    o = rng.permutation(n)
    v = rng.integers(-1000, 1000, n)
    t = pa.table({
        "g": pa.array(g, pa.int64()), "o": pa.array(o, pa.int64()),
        "v": pa.array(v, pa.int64()),
    })
    import pandas as pd

    df = pd.DataFrame({"g": g, "o": o, "v": v}).sort_values(
        ["g", "o"]).reset_index(drop=True)
    for w in (1, 4, 7, 200):
        out = grouped_rolling_minmax(
            rd.from_arrow(t), keys=["g"], order_by=[("o", "ascending")],
            col="v", window_rows=w, schema=t.schema, num_partitions=3,
        ).to_pandas().sort_values(["g", "o"]).reset_index(drop=True)
        exp_max, exp_min = [], []
        for _, sub in df.groupby("g"):
            vv = sub["v"].to_numpy()
            for i in range(len(vv)):
                lo = max(0, i - w + 1)
                exp_max.append(vv[lo:i + 1].max())
                exp_min.append(vv[lo:i + 1].min())
        assert (out["roll_max"].to_numpy() == np.array(exp_max)).all()
        assert (out["roll_min"].to_numpy() == np.array(exp_min)).all()


def test_weighted_median_equals_repeat_expansion(ray_session):
    """A weight-w row behaves exactly like w copies: the weighted median
    from the distributed kernel equals numpy's median-by-expansion rule
    (first value whose cumulative weight reaches half the total)."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    import __ray_entry__ as e

    rng = np.random.default_rng(5)
    n = 300
    flags = rng.choice(["A", "N", "R"], n)
    price = rng.integers(100, 10_000, n) / 100.0
    qty = rng.integers(1, 9, n).astype(np.float64)
    t = pa.table({
        "l_returnflag": pa.array(flags),
        "l_extendedprice": pa.array(price, pa.float64()),
        "l_quantity": pa.array(qty, pa.float64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "lineitem.parquet"))
        out = (
            e.queries()["lineitem_weighted_median"](d)
            .to_pandas().set_index("flag").sort_index()
        )
    cents = np.round(price * 100).astype(np.int64)
    w = np.round(qty).astype(np.int64)
    for f in ("A", "N", "R"):
        m = flags == f
        expanded = np.sort(np.repeat(cents[m], w[m]))
        tot = len(expanded)
        # first value whose cumulative count doubles past the total ==
        # element at ceil(tot/2) - 1 of the expansion
        exp = expanded[(tot + 1) // 2 - 1]
        assert out.loc[f, "weighted_median_cents"] == exp


def test_import_polars_race_safe_fresh_process():
    """polars_compat.import_polars must yield a fully-bound module even
    when many threads race the FIRST polars import (the Ray-worker race
    that produced `polars._reexport has no attribute 'Series'`). Run in a
    fresh subprocess so polars is genuinely unimported, hammer it from 8
    threads, and exercise the exact call that died (pl.from_arrow)."""
    import subprocess
    import sys

    code = (
        "import threading, sys\n"
        "sys.path.insert(0, '/root/repo')\n"
        "from debezium_connector_db2_ray.polars_compat import import_polars\n"
        "import pyarrow as pa\n"
        "errs = []\n"
        "def go():\n"
        "    try:\n"
        "        pl = import_polars()\n"
        "        s = pl.from_arrow(pa.array(['a', 'b']))\n"
        "        assert s.to_list() == ['a', 'b']\n"
        "    except Exception as e:\n"
        "        errs.append(repr(e))\n"
        "ts = [threading.Thread(target=go) for _ in range(8)]\n"
        "[t.start() for t in ts]; [t.join() for t in ts]\n"
        "assert not errs, errs\n"
        "print('OK')\n"
    )
    p = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=120)
    assert p.returncode == 0 and "OK" in p.stdout, p.stderr[-500:]
