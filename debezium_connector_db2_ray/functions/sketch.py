"""Sketch operators: approximate distinct counting at 100 TB scale.

Exact distinct counts need a by-value exchange (grouped_count_distinct,
functions/relational.py); a HyperLogLog sketch answers the same question
with ONE map-only pass and a combiner exchange bounded by 2^b rows per
batch — the right trade for monitoring-grade cardinality over a corpus
(how many distinct users/URLs/shingles) where ~1% error is acceptable.

Standard HLL (Flajolet et al. 2007): register j = top-b bits of a 64-bit
hash; rank = leading-zero count of the remaining bits + 1; registers
combine by max (associative — safe under any batch/partition split);
estimate = alpha_m * m^2 / sum(2^-M_j) with the usual small-range linear
counting correction. No copy of any reference implementation — written
from the published formulas.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (exact — no float log)."""
    n = np.zeros(x.shape, np.int64)
    x = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        n[big] += s
        x[big] >>= np.uint64(s)
    return n + (x > 0)


def _hash_u64(col) -> np.ndarray:
    """64-bit hashes for any column: mix64 for fixed-width types, polars
    xxhash for strings — same kernels the partitioners use."""
    from debezium_connector_db2_ray.functions.relational import mix64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if (pa.types.is_integer(t) or pa.types.is_boolean(t)
            or pa.types.is_temporal(t)):
        v = pc.fill_null(col.cast(pa.int64()), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.uint64)
        # double-mix: the single pass's 32-bit multiplicands (kept small
        # for SQL-parity elsewhere) under-diffuse the HIGH bits the HLL
        # register comes from; a second avalanche restores uniformity
        # (measured: top-12-bit occupancy 839 vs expected 887 on 1k
        # sequential ints single-mixed, 891 double-mixed)
        return mix64(mix64(v))
    import polars as pl

    return pl.from_arrow(col).hash(seed=0).to_numpy().astype(np.uint64)


def hll_register_rows(col, b: int) -> pa.Table:
    """Per-batch HLL partial: sparse (register, max rank) rows — at most
    2^b rows regardless of batch size. NULLs are dropped first so the
    sketch approximates SQL COUNT(DISTINCT col), which excludes NULLs
    (hashing a filled NULL would conflate it with a genuine 0)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    empty = pa.table({
        "reg": pa.array([], pa.int64()),
        "rank": pa.array([], pa.int64()),
    })
    if len(col) == 0:
        return empty
    h = _hash_u64(col)
    m_bits = np.uint64(64 - b)
    reg = (h >> m_bits).astype(np.int64)
    w = h & ((np.uint64(1) << m_bits) - np.uint64(1))
    rank = (64 - b) - _bit_length_u64(w) + 1
    order = np.lexsort((rank, reg))
    reg_s, rank_s = reg[order], rank[order]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(reg_s)) + 1))
    ends = np.concatenate((starts[1:], [len(reg_s)])) - 1
    return pa.table({
        "reg": pa.array(reg_s[starts]),
        "rank": pa.array(rank_s[ends].astype(np.int64)),
    })


def hll_estimate(registers: np.ndarray, b: int) -> float:
    """HLL estimate from a dense register array of size 2^b (zeros where
    no value hashed), with linear-counting small-range correction."""
    m = 1 << b
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(b, 0.7213 / (1 + 1.079 / m))
    e = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int(np.sum(registers == 0))
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    return float(e)


def approx_count_distinct(ds, *, col: str, b: int = 12) -> pa.Table:
    """Approximate COUNT(DISTINCT col) over a Dataset: one map-only pass
    emitting sparse per-batch register maxes, a combiner exchange over at
    most 2^b register keys, and a driver-side fold of <= 2^b rows.
    Standard error ~ 1.04/sqrt(2^b) (~1.6% at b=12). Returns a 1-row
    table {n_distinct_approx int64, b int64}."""
    from debezium_connector_db2_ray.functions.relational import (
        grouped_aggregate,
    )

    def partial(batch: pa.Table) -> pa.Table:
        return hll_register_rows(batch[col], b)

    rows = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["reg"], aggs={"rank": ("rank", "max")},
        num_partitions=16,
        schema=pa.schema([("reg", pa.int64()), ("rank", pa.int64())]),
    ).take_all()
    registers = np.zeros(1 << b, np.int64)
    for r in rows:
        registers[r["reg"]] = r["rank"]
    est = hll_estimate(registers, b)
    return pa.table({
        "n_distinct_approx": pa.array([int(round(est))], pa.int64()),
        "b": pa.array([b], pa.int64()),
    })


def heavy_hitters_exact(ds, *, list_tokens, phi: float, m: int = 4096,
                        num_partitions: int = 16):
    """EXACT frequency-> phi*N heavy hitters over an unbounded token stream
    in two bounded passes (the classic Misra-Gries + recount scheme):

    1. Candidates: each batch tokenizes once, value-counts, and MG-compresses
       to <= ``m`` counters (subtract the (m+1)-th largest count, keep
       positives) — per-item undercount <= batch_tokens/m, so across the
       whole stream lb(term) >= true(term) - N/m. One combiner exchange over
       <= m rows/batch folds the partials; every term with
       lb > phi*N - N/m is a candidate (a GUARANTEED superset of the true
       heavy hitters when m > 1/phi). The batch token total rides along as
       the sentinel term '' (the tokenizer never emits empty strings), so N
       needs no second aggregate.
    2. Recount: the candidate list (small by construction) broadcasts via
       ray.put; one more map pass counts ONLY candidates exactly; a tiny
       combiner exchange + HAVING count > phi*N finishes — exact output,
       bounded memory at any corpus size, no full-vocabulary shuffle.

    ``list_tokens(batch) -> polars Series[list[str]]`` supplies
    tokenization (shared with the text oracles)."""
    import polars as pl
    import ray

    from debezium_connector_db2_ray.functions.relational import (
        grouped_aggregate,
    )

    assert m > 1.0 / phi, "m must exceed 1/phi for the superset guarantee"

    def mg_partial(batch: pa.Table) -> pa.Table:
        toks = list_tokens(batch)
        flat = toks.explode(empty_as_null=True).drop_nulls()
        n_batch = len(flat)
        if n_batch == 0:
            return pa.table({
                "term": pa.array([""], pa.string()),
                "lb": pa.array([0], pa.int64()),
            })
        vc = flat.value_counts()
        cols = vc.columns  # [term, 'count']
        terms = vc[cols[0]].to_numpy()
        counts = vc["count"].to_numpy().astype(np.int64)
        if len(counts) > m:
            order = np.argsort(-counts, kind="stable")
            sub = counts[order[m]]
            keep = counts - sub > 0
            terms, counts = terms[keep], counts[keep] - sub
        return pa.table({
            "term": pa.array(
                np.concatenate((terms.astype(object), np.array([""], object))),
                pa.string(),
            ),
            "lb": pa.array(
                np.concatenate((counts, np.array([n_batch], np.int64))),
                pa.int64(),
            ),
        })

    merged = grouped_aggregate(
        ds.map_batches(mg_partial, batch_format="pyarrow"),
        keys=["term"], aggs={"lb": ("lb", "sum")},
        num_partitions=num_partitions,
        schema=pa.schema([("term", pa.string()), ("lb", pa.int64())]),
    ).take_all()  # <= m * batches partials fold to <= vocabulary rows; the
    # MG truncation keeps this far below the vocabulary in practice
    n_total = sum(r["lb"] for r in merged if r["term"] == "")
    thresh = phi * n_total
    cands = sorted(
        r["term"] for r in merged
        if r["term"] != "" and r["lb"] > thresh - n_total / m
    )
    if not cands:
        return pa.table({
            "term": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        })
    cand_ref = ray.put(pl.Series(cands))

    def recount(batch: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        toks = list_tokens(batch)
        flat = toks.explode(empty_as_null=True).drop_nulls()
        hits = flat.filter(flat.is_in(cs))
        vc = hits.value_counts()
        cols = vc.columns
        return pa.table({
            "term": vc[cols[0]].to_arrow().cast(pa.string()),
            "n": vc["count"].to_arrow().cast(pa.int64()),
        })

    exact = grouped_aggregate(
        ds.map_batches(recount, batch_format="pyarrow"),
        keys=["term"], aggs={"n": ("n", "sum")},
        num_partitions=num_partitions,
        schema=pa.schema([("term", pa.string()), ("n", pa.int64())]),
    ).to_pandas()
    out = exact[exact["n"] > thresh].sort_values("term")
    return pa.table({
        "term": pa.array(out["term"].to_numpy(), pa.string()),
        "n": pa.array(out["n"].to_numpy(), pa.int64()),
    })
