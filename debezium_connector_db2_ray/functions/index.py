"""Persisted inverted (term -> posting) index over a document corpus.

The build is one tokenize + explode pass and ONE partitioned parquet
write: postings land in ``bucket=<hash(term) % B>/`` directories, so a
later term lookup reads ONLY the bucket directories its probe terms hash
into — directory-level byte pruning exactly like the persisted IVF/LSH
ANN indexes (similarity.py). No driver-side posting lists at any corpus
size; lookups cost ~probed_buckets/B of the index bytes.

Reference analog: none (the reference streams change events; a text
index is part of this engine's training-data family). Tokenization is
the engine-wide TOKEN_PATTERN (lowercased \\S+ runs, text.py).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _term_bucket(terms, num_buckets: int) -> np.ndarray:
    """Vectorized polars xxhash of a string Series/array -> bucket ids
    (the same seeded hash family the dedup exchanges use)."""
    from debezium_connector_db2_ray.polars_compat import import_polars
    pl = import_polars()

    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    s = terms if isinstance(terms, pl.Series) else pl.from_arrow(terms)
    h = s.hash(seed=17).to_numpy().astype(np.uint64)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def build_inverted_index(ds, index_dir: str, *, text_col: str = "text",
                         id_col: str = "doc_id", num_buckets: int = 64,
                         concurrency: int | None = None) -> None:
    """Build the index: per-doc DISTINCT terms (posting semantics — one
    row per (term, doc); vectorized polars extract_all + list.unique +
    zipped explode), bucket by hash(term) % num_buckets, one partitioned
    parquet write. Streaming end to end; nothing materializes."""
    from debezium_connector_db2_ray.polars_compat import import_polars
    pl = import_polars()

    from debezium_connector_db2_ray.functions.text import TOKEN_PATTERN

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s = pl.from_arrow(pc.coalesce(col, pa.scalar("", pa.string())))
        df = pl.DataFrame({
            "doc": pl.from_arrow(ids),
            "term": s.str.to_lowercase().str.extract_all(TOKEN_PATTERN)
            .list.unique(),
        }).explode("term").drop_nulls("term")
        t = df.to_arrow()
        term = t["term"].combine_chunks().cast(pa.string())
        return pa.table({
            "term": term,
            id_col: t["doc"].combine_chunks().cast(pa.int64()),
            "bucket": pa.array(_term_bucket(term, num_buckets)),
        })

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(
        explode, batch_format="pyarrow", concurrency=concurrency
    ).write_parquet(
        os.path.join(index_dir, "postings"), partition_cols=["bucket"]
    )
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"num_buckets": num_buckets, "id_col": id_col}, f)


def inverted_index_paths(index_dir: str, terms: list[str]) -> list[str]:
    """The parquet files a lookup for ``terms`` touches — only the bucket
    directories the probe terms hash into (exposed separately so tests can
    assert byte pruning)."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    buckets = np.unique(
        _term_bucket(pa.array(terms, pa.string()), meta["num_buckets"])
    )
    return [
        f
        for b in buckets
        for f in sorted(glob.glob(os.path.join(
            index_dir, "postings", f"bucket={b}", "*.parquet"
        )))
    ]


def inverted_index_lookup(index_dir: str, terms: list[str]):
    """Posting lookup: read ONLY the probe terms' bucket directories, then
    an exact map-side term filter (bucket membership is a superset — hash
    buckets hold other terms too). Returns a Dataset of (term, id)."""
    import ray.data as rd

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    id_col = meta["id_col"]
    paths = inverted_index_paths(index_dir, terms)
    if not paths:
        return rd.from_arrow(pa.schema(
            [("term", pa.string()), (id_col, pa.int64())]
        ).empty_table())
    want = pa.array(sorted(set(terms)), pa.string())

    def filt(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["term"], value_set=want)
        return batch.filter(keep).select(["term", id_col])

    return rd.read_parquet(
        paths, columns=["term", id_col]
    ).map_batches(filt, batch_format="pyarrow")
