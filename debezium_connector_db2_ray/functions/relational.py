"""Relational / pipeline operators beyond plain maps: as-of join,
connected-components dedup, stratified sampling, global top-k terms.

Each documents its partitioning assumption and its 100 TB shape; each has a
DuckDB oracle (ASOF JOIN / recursive CTE / deterministic hash sampling /
ordered LIMIT) wired in functions/queries.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

def asof_join(
    left,
    right,
    *,
    key: str,
    ts: str,
    value_cols: tuple[str, ...],
    num_partitions: int = 16,
):
    """As-of join: every left row gets the value columns of the LATEST right
    row with the same key and right.ts <= left.ts (inclusive) — the operator
    Ray Data lacks, composed as hash-partition-by-key + one vectorized
    sorted-merge per partition.

    Scale shape: both sides tag ``hash(key) % num_partitions`` and union —
    ONE sort exchange moves each row once; the per-partition kernel is a
    lexsort + segment forward-fill (no Python loop). Partitioning
    assumption: one key's rows fit a worker (same contract as every grouped
    operator here; salt by time range if a key exceeds it).

    ``right`` must be unique per (key, ts) — pre-collapse duplicates or the
    match is ambiguous (DuckDB's ASOF has the same requirement). The join
    key must be integer-typed (exact in-partition ordering; string keys
    would order by hash and risk a 2^-64 collision merging two keys)."""
    lschema = left.schema()
    rschema = right.schema()
    left_types = dict(zip(lschema.names, lschema.types))
    right_types = dict(zip(rschema.names, rschema.types))
    lcols = list(lschema.names)

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {
                "__part": pa.array((k % num_partitions).astype(np.int32)),
                "__side": pa.array(np.full(batch.num_rows, side, np.int8)),
                key: batch[key],
                ts: batch[ts],
            }
            for c in value_cols:
                cols[c] = (
                    batch[c] if side == 1
                    else pa.nulls(batch.num_rows, right_types[c])
                )
            for c in lcols:
                if c in (key, ts):
                    continue
                cols[f"__l_{c}"] = (
                    batch[c] if side == 0
                    else pa.nulls(batch.num_rows, left_types[c])
                )
            return pa.table(cols)

        return fn

    u = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    def empty_out() -> pa.Table:
        cols = {}
        for c in lcols:
            cols[c] = pa.array([], left_types[c])
        for c in value_cols:
            cols[f"asof_{c}"] = pa.array([], right_types[c])
        return pa.table(cols)

    def merge(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "__side" not in group.column_names:
            return empty_out()
        kv = group[key].to_numpy(zero_copy_only=False).astype(np.int64)
        t_ = group[ts].to_numpy(zero_copy_only=False).astype("int64")
        side = group["__side"].to_numpy(zero_copy_only=False)
        # sort key-major, then ts, right rows BEFORE left at equal ts
        # (inclusive match: a right row at the same instant applies)
        order = np.lexsort((1 - side, t_, kv))
        kv_s, side_s = kv[order], side[order]
        n = len(order)
        new_key = np.ones(n, bool)
        new_key[1:] = kv_s[1:] != kv_s[:-1]
        run_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
        m = np.where(side_s == 1, np.arange(n), -1)
        cm = np.maximum.accumulate(m)
        valid = cm >= run_start  # the latest right row is within this key's run
        li = np.flatnonzero(side_s == 0)
        src, ok = cm[li], valid[li]
        sorted_g = group.take(pa.array(order))
        out_cols = {}
        for c in lcols:
            col = sorted_g[f"__l_{c}"] if c not in (key, ts) else sorted_g[c]
            out_cols[c] = col.take(pa.array(li))
        take_idx = pa.array(np.where(ok, src, 0).astype(np.int64))
        for c in value_cols:
            vals = sorted_g[c].take(take_idx)
            out_cols[f"asof_{c}"] = pc.if_else(
                pa.array(ok), vals, pa.nulls(len(li), right_types[c])
            )
        return pa.table(out_cols)

    return u.groupby("__part").map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# interval (range) join
# ---------------------------------------------------------------------------

def interval_join(
    points,
    intervals,
    *,
    key: str,
    ts: str,
    start: str,
    end: str,
    value_cols: tuple[str, ...],
    num_partitions: int = 16,
):
    """Range join: every point row gets the value columns of the interval
    row with the same key whose [start, end] contains its timestamp
    (intervals per key assumed NON-OVERLAPPING, e.g. sessionize output —
    the at-most-one-match contract that keeps output size = input size).

    Scale shape: like asof_join — both sides tag hash(key) % P and union
    (one sort exchange, each row moves once); per partition a lexsort +
    segment forward-fill finds each point's most recent interval START, and
    one vectorized end-check decides containment. Integer keys only."""
    pschema = points.schema()
    ischema = intervals.schema()
    p_types = dict(zip(pschema.names, pschema.types))
    i_types = dict(zip(ischema.names, ischema.types))
    pcols = list(pschema.names)

    def tag_points(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "__part": pa.array((k % num_partitions).astype(np.int32)),
            "__side": pa.array(np.full(batch.num_rows, 0, np.int8)),
            key: batch[key],
            "__t": pc.cast(batch[ts], pa.int64()),
            "__end": pa.nulls(batch.num_rows, pa.int64()),
        }
        for c in value_cols:
            cols[c] = pa.nulls(batch.num_rows, i_types[c])
        for c in pcols:
            if c != key:
                cols[f"__p_{c}"] = batch[c]
        return pa.table(cols)

    def tag_intervals(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "__part": pa.array((k % num_partitions).astype(np.int32)),
            "__side": pa.array(np.full(batch.num_rows, 1, np.int8)),
            key: batch[key],
            "__t": pc.cast(batch[start], pa.int64()),
            "__end": pc.cast(batch[end], pa.int64()),
        }
        for c in value_cols:
            cols[c] = batch[c]
        for c in pcols:
            if c != key:
                cols[f"__p_{c}"] = pa.nulls(batch.num_rows, p_types[c])
        return pa.table(cols)

    u = points.map_batches(tag_points, batch_format="pyarrow").union(
        intervals.map_batches(tag_intervals, batch_format="pyarrow")
    )

    def empty_out() -> pa.Table:
        cols = {key: pa.array([], p_types[key])}
        for c in pcols:
            if c != key:
                cols[c] = pa.array([], p_types[c])
        for c in value_cols:
            cols[f"iv_{c}"] = pa.array([], i_types[c])
        return pa.table(cols)

    def merge(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "__side" not in group.column_names:
            return empty_out()
        kv = group[key].to_numpy(zero_copy_only=False).astype(np.int64)
        t_ = group["__t"].to_numpy(zero_copy_only=False)
        side = group["__side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((1 - side, t_, kv))  # interval starts before points
        kv_s, side_s = kv[order], side[order]
        n = len(order)
        new_key = np.ones(n, bool)
        new_key[1:] = kv_s[1:] != kv_s[:-1]
        run_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
        m = np.where(side_s == 1, np.arange(n), -1)
        cm = np.maximum.accumulate(m)
        in_run = cm >= run_start
        sorted_g = group.take(pa.array(order))
        ends = sorted_g["__end"].to_numpy(zero_copy_only=False)
        li = np.flatnonzero(side_s == 0)
        src = cm[li]
        safe = np.where(in_run[li], src, 0).astype(np.int64)
        contained = in_run[li] & (
            t_[order][li] <= np.where(
                in_run[li], ends[safe].astype("float64"), -np.inf
            )
        )
        out_cols = {key: sorted_g[key].take(pa.array(li))}
        for c in pcols:
            if c != key:
                out_cols[c] = sorted_g[f"__p_{c}"].take(pa.array(li))
        take_idx = pa.array(safe)
        for c in value_cols:
            vals = sorted_g[c].take(take_idx)
            out_cols[f"iv_{c}"] = pc.if_else(
                pa.array(contained), vals, pa.nulls(len(li), i_types[c])
            )
        return pa.table(out_cols)

    return u.groupby("__part").map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# connected-components dedup
# ---------------------------------------------------------------------------

def duplicate_components(pairs_ds, *, max_edges: int = 50_000_000):
    """Connected components over near-duplicate PAIRS: each doc in a
    component is labeled with the component's minimum doc id (the canonical
    keeper). Returns a pyarrow Table (doc_id, canonical_id) covering every
    doc that appears in a pair.

    Scale shape: the edge list is the near-dup GRAPH, orders of magnitude
    smaller than the corpus (it is the output of the LSH pipeline, not the
    input), so union-find runs driver-side on numpy arrays; ``max_edges``
    makes the bound explicit instead of silent. The label map it produces
    is the small side of a broadcast application over the corpus."""
    edges = pairs_ds.select_columns(["a", "b"]).take_all()
    if len(edges) > max_edges:
        raise ValueError(
            f"{len(edges)} duplicate edges exceed max_edges={max_edges}; "
            "partition the graph (label propagation) before union-find"
        )
    if not edges:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "canonical_id": pa.array([], pa.int64())}
        )
    a = np.array([e["a"] for e in edges], np.int64)
    b = np.array([e["b"] for e in edges], np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    parent = np.arange(len(nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ia, ib = inv[: len(a)], inv[len(a):]
    for x, y in zip(ia, ib):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)  # min-root = min doc id wins
    roots = np.array([find(int(i)) for i in range(len(nodes))])
    return pa.table(
        {
            "doc_id": pa.array(nodes, pa.int64()),
            "canonical_id": pa.array(nodes[roots], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# generic repartition equi-join
# ---------------------------------------------------------------------------

def repartition_join(
    left,
    right,
    *,
    on: str,
    how: str = "inner",
    num_partitions: int = 16,
    right_suffix: str = "_r",
):
    """Generic equi-join on an integer key, built on the proven sort
    exchange: both sides tag ``hash(on) % num_partitions`` and union (each
    row moves exactly once), then each partition runs an in-process Arrow
    hash join. Ray's own Dataset.join is deliberately avoided — its
    hash-shuffle backend deadlocks under constrained schedulers (measured
    here); the sort exchange + partition-local Acero join is the same
    algorithm with the exchange this engine already trusts.

    Supported ``how``: inner, left_outer. Right columns colliding with left
    names get ``right_suffix``."""
    if how not in ("inner", "left_outer"):
        raise ValueError(how)
    lschema = left.schema()
    rschema = right.schema()
    l_types = dict(zip(lschema.names, lschema.types))
    r_types = dict(zip(rschema.names, rschema.types))
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c != on]
    rename = {
        c: (c + right_suffix if c in l_types else c) for c in rcols
    }

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {
                "__part": pa.array((k % num_partitions).astype(np.int32)),
                "__side": pa.array(np.full(batch.num_rows, side, np.int8)),
                on: batch[on],
            }
            for c in lcols:
                if c == on:
                    continue
                cols[c] = (
                    batch[c] if side == 0
                    else pa.nulls(batch.num_rows, l_types[c])
                )
            for c in rcols:
                cols[rename[c]] = (
                    batch[c] if side == 1
                    else pa.nulls(batch.num_rows, r_types[c])
                )
            return pa.table(cols)

        return fn

    u = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )
    out_names = [c for c in lcols] + [rename[c] for c in rcols]

    def empty_out() -> pa.Table:
        cols = {}
        for c in lcols:
            cols[c] = pa.array([], l_types[c])
        for c in rcols:
            cols[rename[c]] = pa.array([], r_types[c])
        return pa.table(cols)

    def join_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "__side" not in group.column_names:
            return empty_out()
        side = group["__side"].to_numpy(zero_copy_only=False)
        lt = group.filter(pa.array(side == 0)).select([on] + [
            c for c in lcols if c != on
        ])
        rt = group.filter(pa.array(side == 1)).select([on] + [
            rename[c] for c in rcols
        ])
        j = lt.join(
            rt, keys=[on],
            join_type="inner" if how == "inner" else "left outer",
        )
        return j.select(out_names)

    return u.groupby("__part").map_groups(join_part, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------

def stratified_sample(ds, *, stratum_col: str, id_col: str,
                      rates: dict[str, float], default_rate: float = 1.0):
    """Deterministic per-stratum sampling: a row survives iff the first
    byte of md5(str(id)) is below rate*256 — reproducible across runs and
    engines (the DuckDB oracle computes the identical predicate), no
    shuffle, no RNG state."""
    import hashlib

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        strata = batch[stratum_col].to_pylist()
        h = np.fromiter(
            (hashlib.md5(str(i).encode()).digest()[0] for i in ids),
            dtype=np.int64, count=len(ids),
        )
        cut = np.array(
            [int(rates.get(s, default_rate) * 256) for s in strata], np.int64
        )
        return batch.filter(pa.array(h < cut))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# global top-k terms
# ---------------------------------------------------------------------------

def topk_terms(ds, *, text_col: str = "text", k: int = 20):
    """Corpus-wide top-k terms by frequency: per-batch partial term counts
    (one vectorized tokenize + value_counts — the combiner bounds the
    shuffle to distinct terms per batch, not tokens), a small
    groupby(term).sum, then an ordered limit with a deterministic (count
    desc, term asc) tiebreak."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s = pl.from_arrow(pc.coalesce(col, pa.scalar("", pa.string())))
        toks = (
            s.str.to_lowercase().str.extract_all(r"\S+").explode().drop_nulls()
        )
        vc = toks.value_counts()
        cols = vc.columns  # [token_col, 'count']
        return pa.table(
            {
                "term": vc[cols[0]].to_arrow().cast(pa.string()),
                "cnt": vc["count"].to_arrow().cast(pa.int64()),
            }
        )

    totals = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return totals.sort(["cnt", "term"], descending=[True, False]).limit(k)
