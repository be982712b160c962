"""Regression tests for the round-3 advisor/judge findings:

1. broadcast_join: NULL right-side join keys must never match (SQL
   equi-join), and an empty right side must keep its TYPED schema —
   inner yields empty, left_outer null-fills (advisor r3, relational.py).
2. tfidf_topk must survive a batch where every document tokenizes to zero
   tokens (whitespace/NULL text) and emit the typed empty table.
3. approx_count_distinct must exclude NULLs (SQL COUNT(DISTINCT)) and
   hll_register_rows must return an empty partial for 0-row input.
4. dedup_apply (judge r3 "weak" fix): no driver Python-set broadcast —
   sorted-array searchsorted path and the over-budget hash-exchange
   anti-join path must agree; NULL corpus keys are kept.
5. fingerprint_batch default is the vectorized xxhash64 pass with the
   distinct-per-distinct-text invariant; md5 stays as the compat option.
6. Incremental-snapshot signals honor additional-conditions, and the
   snapshot SELECT override no longer leaks into signal-driven chunks
   (upstream: overrides shape only the initial snapshot).
7. polars explode sites pin empty_as_null=True (no DeprecationWarning).
"""

import warnings

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest


def _ds(tbl):
    import ray.data as rd

    return rd.from_arrow(tbl)


# ---------------------------------------------------------------------------
# 1. broadcast_join null keys / empty right side
# ---------------------------------------------------------------------------

def test_broadcast_join_null_right_key_never_matches(ray_session):
    from debezium_connector_db2_ray.functions.relational import broadcast_join

    left = _ds(pa.table({
        "k": pa.array([0, 1, 2], pa.int64()),
        "v": pa.array(["a", "b", "c"]),
    }))
    right = _ds(pa.table({
        "k": pa.array([None, 1], pa.int64()),
        "name": pa.array(["NULLROW", "one"]),
    }))
    inner = broadcast_join(left, right, on="k", how="inner").to_pandas()
    # key 0 must NOT match the NULL-key dim row
    assert sorted(inner["k"].tolist()) == [1]
    assert inner["name"].tolist() == ["one"]

    lo = broadcast_join(left, right, on="k", how="left_outer").to_pandas()
    lo = lo.sort_values("k").reset_index(drop=True)
    assert lo["k"].tolist() == [0, 1, 2]
    assert lo["name"].tolist()[0] is None or lo["name"].isna().tolist() == [
        True, False, True
    ]


def test_broadcast_join_empty_right_side(ray_session):
    from debezium_connector_db2_ray.functions.relational import broadcast_join

    left = _ds(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "v": pa.array(["a", "b"]),
    }))
    empty_right = _ds(pa.table({
        "k": pa.array([], pa.int64()),
        "name": pa.array([], pa.string()),
    }))
    inner = broadcast_join(left, empty_right, on="k", how="inner")
    import ray

    blocks = ray.get(inner.to_arrow_refs())
    assert sum(t.num_rows for t in blocks) == 0
    # the empty result keeps the TYPED joined schema (left + right cols)
    assert set(blocks[0].schema.names) == {"k", "v", "name"}

    lo = broadcast_join(left, empty_right, on="k", how="left_outer").to_pandas()
    assert len(lo) == 2
    assert lo["name"].isna().all()


# ---------------------------------------------------------------------------
# 2. tfidf on whitespace-only corpus
# ---------------------------------------------------------------------------

def test_tfidf_topk_all_whitespace_batch(ray_session):
    from debezium_connector_db2_ray.functions.text import tfidf_topk

    docs = _ds(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["   ", None, "\t\n"]),
    }))
    import ray

    blocks = ray.get(tfidf_topk(docs, k=3).to_arrow_refs())
    assert sum(t.num_rows for t in blocks) == 0
    assert {"doc_id", "term", "tf", "df", "score"} <= set(
        blocks[0].schema.names
    )


def test_tfidf_topk_mixed_empty_and_real(ray_session):
    from debezium_connector_db2_ray.functions.text import tfidf_topk

    docs = _ds(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["  ", "apple apple banana", "apple banana"]),
    }))
    out = tfidf_topk(docs, k=2, min_df=1).to_pandas()
    assert set(out["doc_id"]) == {2, 3}


# ---------------------------------------------------------------------------
# 3. HLL null handling
# ---------------------------------------------------------------------------

def test_hll_register_rows_empty_and_null_only():
    from debezium_connector_db2_ray.functions.sketch import hll_register_rows

    empty = hll_register_rows(pa.array([], pa.int64()), 12)
    assert empty.num_rows == 0
    assert empty.schema.names == ["reg", "rank"]
    nulls = hll_register_rows(pa.array([None, None], pa.int64()), 12)
    assert nulls.num_rows == 0


def test_approx_count_distinct_excludes_nulls(ray_session):
    from debezium_connector_db2_ray.functions.sketch import approx_count_distinct

    vals = list(range(200)) + [None] * 500
    t = approx_count_distinct(
        _ds(pa.table({"x": pa.array(vals, pa.int64())})), col="x", b=12
    )
    n = t["n_distinct_approx"][0].as_py()
    # 200 distinct non-NULLs; NULLs must not register (they'd alias 0 and
    # could only show up as spurious extra registers)
    assert abs(n - 200) <= 20


# ---------------------------------------------------------------------------
# 4. dedup_apply both routes
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("budget", [1_000_000, 2])  # broadcast vs exchange
def test_dedup_apply_routes_agree(ray_session, budget):
    from debezium_connector_db2_ray.functions.dedup import dedup_apply

    corpus = _ds(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, None], pa.int64()),
        "lang": pa.array(["en", "fr", "en", "de", "en", "xx"]),
    }))
    drops = _ds(pa.table({"doc_id": pa.array([2, 4, 4, 9], pa.int64())}))
    out = dedup_apply(
        corpus, drops, on="doc_id", max_broadcast_keys=budget
    ).to_pandas()
    kept = sorted(out["doc_id"].dropna().astype(int).tolist())
    assert kept == [1, 3, 5]
    # NULL corpus key is kept (NOT EXISTS semantics)
    assert out["doc_id"].isna().sum() == 1
    assert set(out.columns) == {"doc_id", "lang"}


def test_dedup_apply_empty_drop_set(ray_session):
    from debezium_connector_db2_ray.functions.dedup import dedup_apply

    corpus = _ds(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "lang": pa.array(["en", "fr"]),
    }))
    drops = _ds(pa.table({"doc_id": pa.array([], pa.int64())}))
    out = dedup_apply(corpus, drops, on="doc_id").to_pandas()
    assert sorted(out["doc_id"].tolist()) == [1, 2]


# ---------------------------------------------------------------------------
# 5. fingerprint: vectorized default + md5 compat
# ---------------------------------------------------------------------------

def test_fingerprint_xxhash_default_and_md5_compat():
    import hashlib

    from debezium_connector_db2_ray.functions.text import fingerprint_batch

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a", "b", "a", None]),
    })
    xx = fingerprint_batch(batch)
    assert xx["fingerprint"].type == pa.uint64()
    f = xx["fingerprint"].to_pylist()
    assert f[0] == f[2] and f[0] != f[1]          # same text -> same fp
    assert f[3] == fingerprint_batch(
        pa.table({"doc_id": pa.array([9], pa.int64()),
                  "text": pa.array([""])})
    )["fingerprint"][0].as_py()                    # NULL == "" (compat)

    md5 = fingerprint_batch(batch, algo="md5")
    assert md5["fingerprint"][0].as_py() == hashlib.md5(b"a").hexdigest()
    with pytest.raises(ValueError):
        fingerprint_batch(batch, algo="sha999")


# ---------------------------------------------------------------------------
# 6. signal additional-conditions + override containment
# ---------------------------------------------------------------------------

def test_incremental_snapshot_additional_conditions(ray_session, tmp_path):
    import ray.data as rd

    from debezium_connector_db2_ray.pipelines.replay import CdcEngine
    from debezium_connector_db2_ray.state.signals import send_signal

    lake = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(8)]),
        "turn_idx": pa.array([0] * 8, pa.int32()),
        "role": pa.array(["user"] * 8),
        "text": pa.array([f"t{i}" for i in range(8)]),
        "tool": pa.array([None] * 8, pa.string()),
        "ts": pa.array([0] * 8, pa.timestamp("us")),
    })
    out = str(tmp_path / "lake")
    eng = CdcEngine(out_dir=out, num_partitions=2)
    send_signal(out, "execute-snapshot", {
        "type": "INCREMENTAL", "chunks": 2,
        "additional-conditions": [
            {"data-collection": "transcripts",
             "filter": {"column": "conv_id", "op": "<", "value": "c4"}},
        ],
    })
    ms = eng.drain_signals(lambda: rd.from_arrow(lake))
    assert ms
    got = eng.state_dataset().to_pandas()
    assert sorted(got["conv_id"]) == ["c0", "c1", "c2", "c3"]


def test_connector_override_not_applied_to_signal_chunks(ray_session, tmp_path):
    """snapshot.select.statement.overrides narrows ONLY the initial
    snapshot; a later signal-driven incremental snapshot reads the full
    lake (upstream semantics — chunks filter via additional-conditions)."""
    import ray.data as rd

    from debezium_connector_db2_ray.connector import CdcConnector
    from debezium_connector_db2_ray.lsn import Lsn
    from debezium_connector_db2_ray.state.signals import send_signal

    lake = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(6)]),
        "turn_idx": pa.array([0] * 6, pa.int32()),
        "role": pa.array(["user"] * 6),
        "text": pa.array([f"t{i}" for i in range(6)]),
        "tool": pa.array([None] * 6, pa.string()),
        "ts": pa.array([0] * 6, pa.timestamp("us")),
    })

    def only_low(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch["conv_id"], "c3"))

    root = str(tmp_path / "lh")
    conn = CdcConnector(root_dir=root, num_partitions=2,
                        snapshot_override={"TABLEA": only_low})
    lakes = {"TABLEA": rd.from_arrow(lake)}
    conn.snapshot_all(lakes, Lsn(0, 10))
    got = conn.state("TABLEA").to_pandas()
    assert sorted(got["conv_id"]) == ["c0", "c1", "c2"]  # override bit

    # signal-driven incremental snapshot: override must NOT apply
    send_signal(root, "execute-snapshot", {"type": "INCREMENTAL", "chunks": 2})
    conn.drain_signals(lakes)
    got2 = conn.state("TABLEA").to_pandas()
    assert sorted(got2["conv_id"]) == [f"c{i}" for i in range(6)]


# ---------------------------------------------------------------------------
# 7. polars deprecation pins
# ---------------------------------------------------------------------------

def test_no_polars_deprecation_on_tokenize_paths():
    from debezium_connector_db2_ray.functions.dedup import _token_hashes
    from debezium_connector_db2_ray.functions.text import chunk_documents_batch

    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        h, counts = _token_hashes(pa.array(["a b", "", None, "c d e"]))
        assert counts.tolist() == [2, 0, 0, 3]
        fn = chunk_documents_batch(2, 1)
        out = fn(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b c", "   "]),
        }))
        assert out.num_rows > 0


# ---------------------------------------------------------------------------
# 8. cross-file overlapped classification
# ---------------------------------------------------------------------------

def test_classify_parquet_stream_pairs_straddle_files(ray_session, tmp_path):
    """Multi-file changelog: a directory of position-sorted shards must
    classify exactly like one file, with update pairs PLANTED on every
    shard boundary (the D ends shard i, its I opens shard i+1) — the
    multi-file analog of the reference's single ordered CD cursor."""
    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.stages.decode import (
        classify_ops,
        classify_parquet_stream,
        sort_by_position,
    )

    rows, lsn = [], 100
    rng = np.random.default_rng(11)
    for _ in range(400):
        kind = rng.choice(["ins", "del", "upd"])
        if kind == "ins":
            rows.append((lsn, 1, "I"))
        elif kind == "del":
            rows.append((lsn, 1, "D"))
        else:
            rows.append((lsn, 1, "D"))
            rows.append((lsn, 2, "I"))
        lsn += 1
    n = len(rows)
    raw = pa.table({
        "commit_lsn_hi": pa.array([0] * n, pa.uint64()),
        "commit_lsn_lo": pa.array([r[0] for r in rows], pa.uint64()),
        "intent_lsn_hi": pa.array([0] * n, pa.uint64()),
        "intent_lsn_lo": pa.array([r[1] for r in rows], pa.uint64()),
        "op_raw": pa.array([r[2] for r in rows], pa.string()),
    })

    # cut exactly between the D and I of update pairs: every shard boundary
    # splits a commit
    pair_cuts = [
        i + 1 for i in range(n - 1)
        if rows[i][2] == "D" and rows[i + 1][2] == "I"
        and rows[i][0] == rows[i + 1][0]
    ]
    cuts = [0] + pair_cuts[:: max(1, len(pair_cuts) // 5)][1:6] + [n]
    cuts = sorted(set(cuts))
    assert len(cuts) >= 4  # at least 3 shards
    d = tmp_path / "shards"
    d.mkdir()
    for si, (a, b) in enumerate(zip(cuts, cuts[1:])):
        pq.write_table(
            raw.slice(a, b - a), str(d / f"shard_{si:04d}.parquet"),
            row_group_size=23,
        )

    got = (
        classify_parquet_stream(str(d), groups_per_task=2)
        .to_pandas()
        .sort_values(["commit_lsn_lo", "intent_lsn_lo"])
        .reset_index(drop=True)
    )
    want = (
        classify_ops(sort_by_position(raw))
        .to_pandas()
        .sort_values(["commit_lsn_lo", "intent_lsn_lo"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == n
    assert (got["op"].to_numpy() == want["op"].to_numpy()).all()
    # the boundary pairs really are pairs: ops 3,4 straddle every cut
    for c in cuts[1:-1]:
        assert want["op"][c - 1] == 3 and want["op"][c] == 4


def test_classify_parquet_stream_single_file_still_works(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.stages.decode import (
        classify_parquet_stream,
    )

    raw = pa.table({
        "commit_lsn_hi": pa.array([0, 0], pa.uint64()),
        "commit_lsn_lo": pa.array([1, 1], pa.uint64()),
        "intent_lsn_hi": pa.array([0, 0], pa.uint64()),
        "intent_lsn_lo": pa.array([1, 2], pa.uint64()),
        "op_raw": pa.array(["D", "I"]),
    })
    p = str(tmp_path / "one.parquet")
    pq.write_table(raw, p)
    got = classify_parquet_stream(p).to_pandas()
    assert sorted(got["op"].tolist()) == [3, 4]


# ---------------------------------------------------------------------------
# 9. TPC-H Q5 supplier-side auto-routing
# ---------------------------------------------------------------------------

def test_tpch_q5_join_path_matches_broadcast(ray_session):
    """Forcing the supplier side over the broadcast byte budget must route
    it through the third repartition_join with identical results."""
    import duckdb

    from debezium_connector_db2_ray.functions.queries import (
        DATA_ORACLES,
        q_tpch_q5,
    )

    sf = "/root/testdata/sf0.001"
    bc = q_tpch_q5(sf).to_pandas().sort_values("n_name").reset_index(drop=True)
    jn = (
        q_tpch_q5(sf, supplier_broadcast_bytes=0)
        .to_pandas().sort_values("n_name").reset_index(drop=True)
    )
    assert bc.equals(jn)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "orders",
              "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    exp = (
        con.execute(DATA_ORACLES["tpch_q5_local_revenue"]).fetchdf()
        .sort_values("n_name").reset_index(drop=True)
    )
    assert jn["n_name"].tolist() == exp["n_name"].tolist()
    assert jn["revenue_e4"].tolist() == exp["revenue_e4"].tolist()


# ---------------------------------------------------------------------------
# 10. SQL-parity LSH
# ---------------------------------------------------------------------------

def test_sqlparity_lsh_candidates_share_query_bucket(ray_session):
    """Every result of the parity LSH must live in its query's bucket, and
    within-bucket ranking must equal brute force restricted to the bucket."""
    import ray
    import ray.data as rd

    from debezium_connector_db2_ray.functions.similarity import (
        lsh_sqlparity_topk,
        sqlparity_bucket,
        sqlparity_planes,
    )

    rng = np.random.default_rng(3)
    n, dim = 300, 16
    m = rng.standard_normal((n, dim))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(m), pa.list_(pa.float64())),
    }))
    q = {"qids": np.arange(3), "matrix": m[:3]}
    out = lsh_sqlparity_topk(ds, ray.put(q), k=4, nbits=6).to_pandas()
    planes = sqlparity_planes(dim, 6)
    buckets = sqlparity_bucket(m, planes)
    qb = sqlparity_bucket(m[:3], planes)
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qi in range(3):
        rows = out[out["query_id"] == qi].sort_values("rank")
        ids = rows["vec_id"].to_numpy()
        assert (buckets[ids] == qb[qi]).all()  # in-bucket only
        cand = np.flatnonzero(buckets == qb[qi])
        sims = norm[cand] @ norm[qi]
        order = np.lexsort((cand, -sims))[:4]
        assert ids.tolist() == cand[order].tolist()  # exact in-bucket rerank


# ---------------------------------------------------------------------------
# 11. z.stop.lsn.ignore connector flag
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ignore", [False, True])
def test_connector_stop_lsn_fence_flag(ray_session, tmp_path, ignore):
    """stop_lsns fences streamed events at/above the capture instance's
    stop LSN; z_stop_lsn_ignore=True (the reference's z.stop.lsn.ignore)
    disables the fence."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from debezium_connector_db2_ray.connector import CdcConnector
    from debezium_connector_db2_ray.lsn import Lsn

    def changelog(rows):
        n = len(rows)
        return pa.table({
            "commit_lsn_hi": pa.array([0] * n, pa.uint64()),
            "commit_lsn_lo": pa.array([r[0] for r in rows], pa.uint64()),
            "intent_lsn_hi": pa.array([0] * n, pa.uint64()),
            "intent_lsn_lo": pa.array([r[0] for r in rows], pa.uint64()),
            "op": pa.array([2] * n, pa.int8()),
            "conv_id": pa.array([r[1] for r in rows]),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array([r[2] for r in rows]),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array([0] * n, pa.timestamp("us")),
            "src_table": pa.array(["TABLEA"] * n),
        })

    log = changelog([(150, "c1", "a"), (180, "c2", "b"), (220, "c3", "c")])
    p = str(tmp_path / "log.parquet")
    pq.write_table(log, p)
    conn = CdcConnector(
        root_dir=str(tmp_path / "lh"), num_partitions=2,
        stop_lsns={"TABLEA": Lsn(0, 200)}, z_stop_lsn_ignore=ignore,
    )
    conn.replay(rd.read_parquet(p), Lsn(0, 100), Lsn(0, 300), 1)
    got = sorted(conn.state("TABLEA").to_pandas()["conv_id"])
    # commit 220 >= stop 200 is fenced unless the z/OS ignore flag is set
    assert got == (["c1", "c2", "c3"] if ignore else ["c1", "c2"])


# ---------------------------------------------------------------------------
# 12. distributed prefix sum
# ---------------------------------------------------------------------------

def test_prefix_sum_matches_numpy(ray_session):
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import prefix_sum

    rng = np.random.default_rng(5)
    n = 5000
    order = rng.permutation(n)  # arbitrary block order
    vals = rng.integers(0, 50, n)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(order, pa.int64()),
        "v": pa.array(vals[order], pa.int64()),
    })).repartition(7)
    out = prefix_sum(ds, order_col="k", val_col="v", out_col="cum",
                     num_partitions=5).to_pandas().sort_values("k")
    want = np.cumsum(vals)
    assert (out["cum"].to_numpy() == want).all()
    assert (out["k"].to_numpy() == np.arange(n)).all()


def test_prefix_sum_nulls_and_empty(ray_session):
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import prefix_sum

    ds = rd.from_arrow(pa.table({
        "k": pa.array([3, 1, 2], pa.int64()),
        "v": pa.array([10, None, 5], pa.int64()),
    }))
    out = prefix_sum(ds, order_col="k", val_col="v").to_pandas().sort_values("k")
    assert out["cumsum"].tolist() == [0, 5, 15]  # NULL adds 0

    empty = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
    }))
    got = prefix_sum(empty, order_col="k", val_col="v")
    assert got.count() == 0


# ---------------------------------------------------------------------------
# 13. two-pass exact heavy hitters (MG truncation forced)
# ---------------------------------------------------------------------------

def test_heavy_hitters_exact_with_forced_truncation(ray_session):
    """m far below the vocabulary forces MG compression in every batch; the
    two-pass scheme must still be EXACT (candidate superset + recount)."""
    import polars as pl
    import ray.data as rd

    from debezium_connector_db2_ray.functions.sketch import heavy_hitters_exact

    rng = np.random.default_rng(17)
    # zipf-ish: few heavy terms + a large distinct tail
    heavy = [f"h{i}" for i in range(5)]
    docs = []
    for d in range(400):
        toks = [heavy[rng.integers(5)] for _ in range(rng.integers(3, 9))]
        toks += [f"tail{rng.integers(20000)}" for _ in range(10)]
        docs.append(" ".join(toks))
    tbl = pa.table({"text": pa.array(docs)})
    ds = rd.from_arrow(tbl).repartition(8)

    def list_tokens(batch: pa.Table) -> "pl.Series":
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pl.from_arrow(col).str.extract_all(r"[^\t\n\f\r ]+")

    phi = 0.01
    out = heavy_hitters_exact(
        ds, list_tokens=list_tokens, phi=phi, m=128
    ).to_pandas()

    all_toks = " ".join(docs).split()
    import collections
    cnt = collections.Counter(all_toks)
    n = len(all_toks)
    want = sorted(t for t, c in cnt.items() if c > phi * n)
    assert sorted(out["term"]) == want
    got = dict(zip(out["term"], out["n"]))
    for t in want:
        assert got[t] == cnt[t]  # counts exact, not MG lower bounds
