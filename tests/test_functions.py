"""Pytest oracles for the training-data operators that have no SQL oracle:
MinHash/SimHash near-dup (vs brute-force Jaccard), LSH ANN recall (vs exact),
multimodal decode determinism."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def brute_force_jaccard_pairs(texts: dict[int, str], k: int, threshold: float):
    from debezium_connector_db2_ray.functions.dedup import shingle_hashes

    sh = {i: set(shingle_hashes(t, k).tolist()) for i, t in texts.items()}
    ids = sorted(texts)
    out = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b]) or 1
            if inter / union >= threshold:
                out.add((a, b))
    return out


@pytest.fixture(scope="module")
def near_dup_docs():
    """Corpus with planted near-duplicates: base docs + lightly edited copies."""
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(50)]
    docs = {}
    for i in range(40):
        docs[i] = " ".join(rng.choice(vocab, 30))
    # planted near-dups: copy with one word changed
    for j in range(10):
        base = docs[j].split()
        base[5] = "CHANGED"
        docs[100 + j] = " ".join(base)
    return docs


def test_minhash_finds_planted_near_dups(ray_session, near_dup_docs):
    import ray.data as rd

    from debezium_connector_db2_ray.functions.dedup import minhash_duplicate_pairs

    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in near_dup_docs.items()]
    )
    got = minhash_duplicate_pairs(ds, threshold=0.5, num_perm=64, bands=16)
    pairs = {(r["a"], r["b"]) for r in got.take_all()}
    want = brute_force_jaccard_pairs(near_dup_docs, 3, 0.5)
    # every found pair is a true pair (verification is exact)
    assert pairs <= want
    # recall of planted duplicates is high (LSH with 16 bands @ j>=0.8 planted)
    planted = {(j, 100 + j) for j in range(10)} & want
    assert len(pairs & planted) >= 9


def test_simhash_finds_planted_near_dups(ray_session, near_dup_docs):
    import ray.data as rd

    from debezium_connector_db2_ray.functions.dedup import simhash_duplicate_pairs

    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in near_dup_docs.items()]
    )
    got = simhash_duplicate_pairs(ds, max_hamming=6)
    pairs = {(r["a"], r["b"]) for r in got.take_all()}
    planted = {(j, 100 + j) for j in range(10)}
    assert len(pairs & planted) >= 8  # one-word edits perturb few bits


def test_lsh_ann_recall_against_exact(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    from debezium_connector_db2_ray.functions.queries import (
        q_ann_bruteforce,
        q_ann_lsh,
    )

    exact = {
        (r["query_id"], r["vec_id"])
        for r in q_ann_bruteforce(SF).take_all()
    }
    approx = {
        (r["query_id"], r["vec_id"]) for r in q_ann_lsh(SF).take_all()
    }
    # approximate results are a subset of the corpus and include each query
    # vector itself (its own bucket always matches)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2  # 6-bit LSH on 64-dim gaussian data is coarse
    for q in {q for q, _ in exact}:
        assert (q, q) in approx


def test_fake_decoder_deterministic_and_real_decoder_stubbed(ray_session):
    import ray.data as rd

    from debezium_connector_db2_ray.functions.multimodal import (
        FakeDecoder,
        RealDecoder,
        decode_media,
        pack_text_as_media,
    )

    items = [{"doc_id": i, "text": f"payload {i} " * (i + 1)} for i in range(20)]
    ds = rd.from_items(items).map_batches(
        pack_text_as_media, batch_format="pyarrow", batch_size=8
    )
    out1 = decode_media(ds, concurrency=2).to_pandas().sort_values("media_id")
    out2 = decode_media(ds, concurrency=2).to_pandas().sort_values("media_id")
    assert (out1["payload_md5"].to_numpy() == out2["payload_md5"].to_numpy()).all()
    assert set(out1["kind"]) == {"image", "audio", "video"}
    assert (out1["n_bytes"] > 0).all()
    with pytest.raises(ValueError):  # not a known container format
        RealDecoder()._parse(b"\x89PNG not supported here")


def test_real_decoder_parses_actual_container_bytes(ray_session):
    """RealDecoder reads true header bytes — including foreign-encoder
    quirks our synthesizer never writes (PPM comment lines, top-down BMP
    with negative height, a WAV with an extra chunk before data)."""
    import struct

    import ray.data as rd

    from debezium_connector_db2_ray.functions.multimodal import (
        RealDecoder,
        decode_media,
        synthesize_media_batch,
    )

    parse = RealDecoder()._parse
    ppm = b"P6\n# a comment\n640 480\n255\n" + bytes(640 * 480 * 3)
    assert parse(ppm) == {
        "format": "ppm", "width": 640, "height": 480, "channels": 3,
    }
    assert parse(b"P5\n8 4\n255\n" + bytes(32))["channels"] == 1
    bmp = struct.pack(
        "<2sIHHIIiiHHIIiiII", b"BM", 54, 0, 0, 54, 40, 13, -7, 1, 32,
        0, 0, 0, 0, 0, 0,
    )
    assert parse(bmp) == {
        "format": "bmp", "width": 13, "height": 7, "channels": 4,
    }
    data = bytes(16000)  # 1 s of 8 kHz mono 16-bit
    wav = (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + 16 + 8 + 4 + 8 + len(data),
                    b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
        + struct.pack("<4sI", b"LIST", 4) + b"INFO"
        + struct.pack("<4sI", b"data", len(data)) + data
    )
    assert parse(wav) == {
        "format": "wav", "channels": 1, "sample_rate": 8000,
        "duration_ms": 1000,
    }
    # PNG: CRC-valid grayscale IHDR parses; corrupted CRC raises
    import zlib

    ihdr = struct.pack(">IIBBBBB", 320, 200, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    assert parse(png) == {
        "format": "png", "width": 320, "height": 200, "channels": 1,
    }
    bad = bytearray(png)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError):
        parse(bytes(bad))
    # GIF87a logical screen descriptor
    gif = b"GIF87a" + struct.pack("<HH", 99, 44) + b"\x00\x00\x00\x3b"
    assert parse(gif) == {
        "format": "gif", "width": 99, "height": 44, "channels": 3,
    }
    # end-to-end through the actor pool: decode inverts encode
    items = [{"doc_id": i} for i in range(30)]
    ds = rd.from_items(items).map_batches(
        synthesize_media_batch, batch_format="pyarrow", batch_size=8
    )
    out = decode_media(ds, decoder=RealDecoder, concurrency=2).to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)
    for _, r in out.iterrows():
        i = int(r["media_id"])
        m = i % 5
        if m == 0:
            assert r["format"] == "ppm" and r["width"] == i % 32 + 1
            assert r["height"] == i % 24 + 1 and r["channels"] == 3
        elif m == 1:
            assert r["format"] == "bmp" and r["width"] == i % 64 + 1
            assert r["height"] == i % 48 + 1
        elif m == 2:
            assert r["format"] == "wav" and r["channels"] == 1 + i % 2
            assert r["duration_ms"] == (i % 500 + 1) * 1000 // 8000
        elif m == 3:
            assert r["format"] == "png" and r["width"] == i % 40 + 1
            assert r["height"] == i % 30 + 1
            assert r["channels"] == 3 + i % 2
        else:
            assert r["format"] == "gif" and r["width"] == i % 20 + 1
            assert r["height"] == i % 15 + 1 and r["channels"] == 3


def test_rolling_hash_prefilter_stability():
    from debezium_connector_db2_ray.functions.text import rolling_hash_batch

    t = pa.table({"doc_id": [1, 2], "text": ["abcdef" * 10, "abcdef" * 10 + "x"]})
    a = rolling_hash_batch(t)
    b = rolling_hash_batch(t)
    assert a.equals(b)
    # a small suffix edit keeps the min-window hash (content-defined anchor)
    assert a["rolling_min_hash"][0] == a["rolling_min_hash"][1]


def test_ivf_ann_recall_against_exact(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    from debezium_connector_db2_ray.functions.queries import (
        q_ann_bruteforce,
        q_ann_ivf,
    )

    exact = {
        (r["query_id"], r["vec_id"]) for r in q_ann_bruteforce(SF).take_all()
    }
    approx = {(r["query_id"], r["vec_id"]) for r in q_ann_ivf(SF).take_all()}
    recall = len(exact & approx) / len(exact)
    # probing 6/16 lists on unclustered gaussians: recall well above the
    # 6/16=0.375 random-probe floor because neighbors share the query's lists
    assert recall >= 0.5
    for q in {q for q, _ in exact}:
        assert (q, q) in approx  # a query's own vector is always in its list


def test_lsh_indexed_matches_inmemory_lsh(ray_session):
    """The persisted LSH bucket index returns the same results as the
    in-memory prefilter variant (same planes, same buckets), without
    re-hashing the corpus at query time."""
    import shutil
    import sys

    sys.path.insert(0, "/root/repo")
    from debezium_connector_db2_ray.functions.queries import (
        _lsh_index_dir,
        q_ann_lsh,
        q_ann_lsh_indexed,
    )

    shutil.rmtree(_lsh_index_dir(SF, 6), ignore_errors=True)
    mem = {(r["query_id"], r["vec_id"], r["rank"]) for r in q_ann_lsh(SF).take_all()}
    idx = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in q_ann_lsh_indexed(SF).take_all()
    }
    assert idx == mem
    # second call reuses the on-disk index (build-once contract)
    idx2 = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in q_ann_lsh_indexed(SF).take_all()
    }
    assert idx2 == mem


def test_ivf_indexed_recall_and_probe_pruning(ray_session, tmp_path):
    """The persisted IVF index matches the in-memory IVF's recall bar, and
    probing fewer lists reads strictly fewer bytes (the build-once index
    prunes at the directory level)."""
    import glob
    import os
    import shutil
    import sys

    sys.path.insert(0, "/root/repo")
    from debezium_connector_db2_ray.functions.queries import (
        _ivf_index_dir,
        _query_matrix,
        q_ann_bruteforce,
        q_ann_ivf_indexed,
    )
    from debezium_connector_db2_ray.functions.similarity import ivf_indexed_topk

    shutil.rmtree(_ivf_index_dir(SF, 16), ignore_errors=True)
    exact = {
        (r["query_id"], r["vec_id"]) for r in q_ann_bruteforce(SF).take_all()
    }
    approx = {
        (r["query_id"], r["vec_id"]) for r in q_ann_ivf_indexed(SF).take_all()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5
    for q in {q for q, _ in exact}:
        assert (q, q) in approx  # a query's own vector is always in its list
    # the index persisted: list-partitioned parquet + centroids on disk
    idx = _ivf_index_dir(SF, 16)
    dirs = glob.glob(os.path.join(idx, "lists", "list=*"))
    assert len(dirs) > 4 and os.path.exists(os.path.join(idx, "centroids.npy"))

    def probed_bytes(n_probe):
        import numpy as np

        cent = np.load(os.path.join(idx, "centroids.npy"))
        qm = _query_matrix(SF)
        from debezium_connector_db2_ray.functions.similarity import _normalize_rows

        m = _normalize_rows(qm["matrix"].astype(np.float64))
        probe = np.unique(np.argsort(-(m @ cent.T), axis=1)[:, :n_probe].reshape(-1))
        return sum(
            os.path.getsize(f)
            for i in probe
            for f in glob.glob(os.path.join(idx, "lists", f"list={i}", "*"))
        )

    assert probed_bytes(2) < probed_bytes(8)  # probe cost ∝ lists touched


def test_sessionize_mega_user_and_batch_split_invariance(ray_session):
    """Sessionize is exact under ANY batching (the per-batch combiner emits
    maximal partial sessions; the per-user merge folds them), and a planted
    mega-user flows through as session summaries, not raw events."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.streaming import sessionize

    rng = np.random.default_rng(5)
    rows = []
    # mega-user 1: 20k events in 200 bursts (100 events 1min apart, then a
    # 5h gap) -> exactly 200 sessions
    t0 = np.int64(1_700_000_000_000_000)
    t = t0
    for burst in range(200):
        for i in range(100):
            rows.append({"user_id": 1, "ts": t, "event_id": len(rows)})
            t += 60_000_000
        t += 5 * 3_600_000_000
    # small users with jittered gaps around the 120-min threshold
    for u in range(2, 12):
        t = t0 + int(rng.integers(0, 10**9))
        for i in range(50):
            rows.append({"user_id": u, "ts": t, "event_id": len(rows)})
            t += int(rng.integers(1, 200)) * 60_000_000  # 1..199 min gaps
    tbl = pa.table(
        {
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "ts": pa.array([r["ts"] for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        }
    )
    # oracle: single-pass global gap cut
    def oracle(tbl):
        uid = tbl["user_id"].to_numpy()
        ts = tbl["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, uid))
        u, t_ = uid[order], ts[order]
        new = np.ones(len(u), bool)
        new[1:] = (u[1:] != u[:-1]) | ((t_[1:] - t_[:-1]) > 120 * 60_000_000)
        sid = np.cumsum(new) - 1
        out = {}
        for i in range(len(u)):
            key = sid[i]
            if key not in out:
                out[key] = [u[i], 0, t_[i], t_[i]]
            out[key][1] += 1
            out[key][3] = t_[i]
        per_user = {}
        res = set()
        for _, (uu, n, st, en) in sorted(out.items()):
            idx = per_user.get(uu, 0)
            per_user[uu] = idx + 1
            res.add((int(uu), idx, int(n), int(st), int(en)))
        return res

    want = oracle(tbl)
    # shuffle row order and force many small blocks: batching must not matter
    perm = rng.permutation(tbl.num_rows)
    shuffled = tbl.take(pa.array(perm))
    ds = rd.from_arrow(shuffled).repartition(16)
    got = {
        (
            int(r["user_id"]), int(r["session_idx"]), int(r["n_events"]),
            int(np.datetime64(r["start_ts"], "us").astype(np.int64)),
            int(np.datetime64(r["end_ts"], "us").astype(np.int64)),
        )
        for r in sessionize(ds, gap_minutes=120).take_all()
    }
    assert got == want
    assert sum(1 for g in got if g[0] == 1) == 200  # the mega-user's sessions


def test_generator_determinism():
    """Seeded generators are bit-stable across calls (bench fairness across
    parallelism levels depends on identical input)."""
    import pyarrow as pa

    from debezium_connector_db2_ray.sources.genlog import (
        generate_changelog_fast,
        generate_scenario,
    )

    a, _ = generate_changelog_fast(20_000, 500, 8, seed=5)
    b, _ = generate_changelog_fast(20_000, 500, 8, seed=5)
    assert a.equals(b)
    sa = generate_scenario(n_convs=10, turns_per_conv=3, n_commits=50, seed=5)
    sb = generate_scenario(n_convs=10, turns_per_conv=3, n_commits=50, seed=5)
    assert sa.changelog.equals(sb.changelog) and sa.lake.equals(sb.lake)


def _reference_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Test-local union-find oracle (the engine no longer has a driver path)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in list(parent)}


def test_components_high_diameter_path(ray_session):
    """A 400-node path graph has diameter 399 — far beyond what per-round
    neighbor propagation alone could finish in max_rounds=64; convergence
    proves the pointer-halving edges cut rounds to O(log diameter). Labels
    must all collapse to the path's minimum id."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        duplicate_components,
    )

    n = 400
    ids = np.arange(n, dtype=np.int64) * 7 + 3  # non-contiguous ids
    pairs = rd.from_arrow(pa.table({"a": ids[:-1], "b": ids[1:]}))
    got = duplicate_components(pairs, num_partitions=8).to_pandas()
    assert len(got) == n
    assert set(got["canonical_id"]) == {3}
    assert sorted(got["doc_id"]) == sorted(ids.tolist())


def test_components_random_graph_matches_union_find(ray_session):
    """Random multi-component graph vs a test-local union-find, including
    self-loops and duplicate edges."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        duplicate_components,
    )

    rng = np.random.default_rng(11)
    a = rng.integers(0, 5_000, 4_000).astype(np.int64)
    b = rng.integers(0, 5_000, 4_000).astype(np.int64)
    pairs = rd.from_arrow(pa.table({"a": a, "b": b}))
    got = duplicate_components(pairs, num_partitions=8).to_pandas()
    want = _reference_components(list(zip(a.tolist(), b.tolist())))
    assert dict(zip(got["doc_id"], got["canonical_id"])) == want


def test_components_empty_pairs(ray_session):
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        duplicate_components,
    )

    pairs = rd.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    )
    got = duplicate_components(pairs, num_partitions=4)
    assert got.count() == 0
    assert got.schema().names == ["doc_id", "canonical_id"]


def test_stratified_sample_null_stratum_gets_default_rate(ray_session):
    """factorize maps NULL strata to code -1; those rows must take the
    DEFAULT rate (the SQL oracle's CASE ... ELSE branch), never the last
    stratum's cut via fancy-indexing cuts[-1]."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        stratified_sample,
    )

    n = 4000
    ids = np.arange(n, dtype=np.int64)
    # 'zh' (rate 0) is factorized LAST, nulls interleaved: with the bug the
    # null rows would all take zh's zero cut and be dropped
    langs = [("en", "fr", None, "zh")[i % 4] for i in range(n)]
    t = pa.table({"doc_id": ids, "lang": pa.array(langs, pa.string())})
    got = (
        stratified_sample(
            rd.from_arrow(t), stratum_col="lang", id_col="doc_id",
            rates={"en": 0.5, "fr": 0.25, "zh": 0.0}, default_rate=1.0,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute("""
      WITH s1 AS (
        SELECT doc_id, lang,
               CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485)
                    % 18446744073709551616 AS UBIGINT) AS z0 FROM documents
      ), s2 AS (
        SELECT doc_id, lang,
               CAST((CAST(xor(z0, z0 >> 33) AS HUGEINT) * 2246822507)
                    % 18446744073709551616 AS UBIGINT) AS z1 FROM s1
      ), s3 AS (
        SELECT doc_id, lang,
               CAST((CAST(xor(z1, z1 >> 29) AS HUGEINT) * 3266489909)
                    % 18446744073709551616 AS UBIGINT) AS z2 FROM s2
      ), h AS (
        SELECT doc_id, lang, CAST(xor(z2, z2 >> 32) >> 56 AS BIGINT) AS b0
        FROM s3
      )
      SELECT doc_id, lang FROM h
      WHERE b0 < CASE lang WHEN 'en' THEN 128 WHEN 'fr' THEN 64
                           WHEN 'zh' THEN 0 ELSE 256 END
      ORDER BY doc_id
    """).fetchdf().reset_index(drop=True)
    # every null-lang row survives (default 1.0), every zh row is gone
    assert (got["lang"].isna().sum()) == n // 4
    assert not (got["lang"] == "zh").any()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()


def test_grouped_aggregate_matches_duckdb_with_null_keys(ray_session):
    """High-cardinality grouped_aggregate vs DuckDB GROUP BY: string+int
    compound key, NULLs in both the key and the value column, every
    supported fn. Also a regression for the pyarrow multi-key group_by
    quirk (16.1.0 emits several rows for one (null, k) key tuple) that the
    operator's null-free key encoding works around."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_aggregate,
    )

    rng = np.random.default_rng(7)
    n = 30_000
    k = rng.integers(0, 2000, n)
    t = pa.table({
        "user": pa.array([f"u{x}" if x % 97 else None for x in k]),
        "kid": pa.array(k.astype(np.int64)),
        "v": pa.array(
            [None if (x % 53 == 1) else int(x)
             for x in rng.integers(0, 1000, n)],
            pa.int64(),
        ),
    })
    # multiple blocks so partials really combine across batches
    ds = rd.from_arrow(t).repartition(6)
    res = grouped_aggregate(
        ds, keys=["user", "kid"],
        aggs={
            "n": ("v", "count_all"),
            "nv": ("v", "count"),
            "sv": ("v", "sum"),
            "mx": ("v", "max"),
            "mn": ("v", "min"),
            "avg_v": ("v", "mean"),
        },
        num_partitions=8,
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
      SELECT user, kid, CAST(count(*) AS BIGINT) n,
             CAST(count(v) AS BIGINT) nv, CAST(sum(v) AS BIGINT) sv,
             max(v) mx, min(v) mn, CAST(sum(v) AS DOUBLE)/count(v) avg_v
      FROM t GROUP BY user, kid
    """).fetchdf()
    a = res.sort_values(["kid", "user"], na_position="first").reset_index(
        drop=True
    )[want.columns.tolist()]
    b = want.sort_values(["kid", "user"], na_position="first").reset_index(
        drop=True
    )
    assert len(a) == len(b)  # one output row per distinct key tuple
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_grouped_aggregate_all_null_group_and_empty(ray_session):
    """sum/mean of an all-null group are NULL (SQL semantics), and an empty
    input yields an empty result with the full output schema."""
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_aggregate,
    )

    t = pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "v": pa.array([None, None, 3], pa.int64()),
    })
    r = (
        grouped_aggregate(
            rd.from_arrow(t), keys=["k"],
            aggs={"m": ("v", "mean"), "s": ("v", "sum"),
                  "nv": ("v", "count")},
            num_partitions=4,
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert r.loc[0, "k"] == 1 and r.loc[0, "nv"] == 0  # group k=1 exists
    assert r.loc[0].isna()["m"] and r.loc[0].isna()["s"]
    assert r.loc[1, "s"] == 3 and r.loc[1, "m"] == 3.0

    empty = grouped_aggregate(
        rd.from_arrow(t.slice(0, 0)), keys=["k"],
        aggs={"s": ("v", "sum")}, num_partitions=4,
    )
    # dataset-level schema is pinned even for empty input (Ray's to_pandas
    # drops columns on any empty dataset, so assert on schema())
    assert empty.schema().names == ["k", "s"] and empty.count() == 0


def test_grouped_count_distinct_matches_duckdb(ray_session):
    """count(DISTINCT col) semantics: per-group distinct count excludes
    null values but keeps null group keys; exact vs DuckDB on a key space
    wide enough that partials combine across batches and partitions."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_count_distinct,
    )

    rng = np.random.default_rng(11)
    n = 20_000
    k = rng.integers(0, 1500, n)
    t = pa.table({
        "k": pa.array(
            [None if x % 101 == 5 else int(x) for x in k], pa.int64()
        ),
        "v": pa.array(
            [None if x % 7 == 3 else int(x)
             for x in rng.integers(0, 40, n)],
            pa.int64(),
        ),
    })
    res = grouped_count_distinct(
        rd.from_arrow(t).repartition(5), keys=["k"], col="v",
        out_col="nd", num_partitions=8,
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT k, CAST(count(DISTINCT v) AS BIGINT) nd FROM t GROUP BY k"
    ).fetchdf()
    a = res.sort_values("k", na_position="first").reset_index(drop=True)
    b = want.sort_values("k", na_position="first").reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a[["k", "nd"]], b, check_dtype=False)


def test_decontaminate_flags_benchmark_overlap(ray_session):
    """Exact copies of a benchmark doc are contaminated with n_hits equal
    to their full distinct-shingle count; partial overlaps count only the
    shared shingles; disjoint and empty docs are clean. Also pins the
    ObjectRef-reuse path (one benchmark set scored against two corpora)."""
    import ray
    import ray.data as rd

    from debezium_connector_db2_ray.functions.dedup import (
        benchmark_shingle_ref,
        decontaminate,
        shingle_hashes,
    )

    bench_txt = "the quick brown fox jumps over the lazy dog"
    partial_txt = "quick brown fox swims under a bright red sky tonight"
    clean_txt = "completely different words appear in this sentence here"
    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([1000], pa.int64()),
        "text": pa.array([bench_txt]),
    }))
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([bench_txt, partial_txt, clean_txt, None]),
    }))
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(corpus, bench, k=3).take_all()
    }
    full = len(shingle_hashes(bench_txt, 3))
    shared = len(
        np.intersect1d(
            shingle_hashes(bench_txt, 3), shingle_hashes(partial_txt, 3)
        )
    )
    assert got[1] == (full, True)
    assert shared > 0 and got[2] == (shared, True)
    assert got[3] == (0, False)
    assert got[4] == (0, False)

    ref = benchmark_shingle_ref(bench, k=3)
    assert isinstance(ref, ray.ObjectRef)
    again = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(corpus, ref, k=3).take_all()
    }
    assert again == {k: v[0] for k, v in got.items()}

    # graded variant: score = n_hits / distinct shingles; 0-shingle docs
    # (empty/None text) score 0.0, exact copies score 1.0
    frac = {
        r["doc_id"]: (r["n_grams"], r["score"])
        for r in decontaminate(
            corpus, ref, k=3, with_fraction=True
        ).take_all()
    }
    assert frac[1] == (full, 1.0)
    assert frac[2] == (
        len(shingle_hashes(partial_txt, 3)),
        shared / len(shingle_hashes(partial_txt, 3)),
    )
    assert frac[3][1] == 0.0
    assert frac[4] == (0, 0.0)


def test_exact_percentiles_match_duckdb_quantile_disc(ray_session):
    """Distributed kth-element selection == DuckDB quantile_disc: float and
    int columns, nulls ignored, heavy duplicates (single-key range path),
    q=0/1 edges, and an all-null column."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        exact_percentiles,
    )

    rng = np.random.default_rng(23)
    v = rng.normal(0, 1e6, 5000)
    v[::7] = 42.5  # heavy duplicate mass
    t = pa.table({"v": pa.array(
        [None if i % 11 == 3 else float(x) for i, x in enumerate(v)],
        pa.float64(),
    )})
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    got = exact_percentiles(
        rd.from_arrow(t).repartition(4), col="v", qs=qs,
        hist_bits=6, collect_limit=50,  # force several narrowing rounds
    )
    con = duckdb.connect()
    con.register("t", t)
    for q, val in zip(qs, got["value"].to_pylist()):
        want = con.execute(
            f"SELECT quantile_disc(v, {q}) FROM t"
        ).fetchone()[0]
        assert val == want, (q, val, want)

    ti = pa.table({"v": pa.array([5, 1, None, 3, 3, 3, None, 9, 2, 8])})
    con.register("ti", ti)
    goti = exact_percentiles(rd.from_arrow(ti), col="v", qs=[0.1, 0.5, 1.0])
    for q, val in zip([0.1, 0.5, 1.0], goti["value"].to_pylist()):
        want = con.execute(
            f"SELECT quantile_disc(v, {q}) FROM ti"
        ).fetchone()[0]
        assert val == want, (q, val, want)

    nul = exact_percentiles(
        rd.from_arrow(pa.table({"v": pa.array([None, None], pa.float64())})),
        col="v", qs=[0.5],
    )
    assert nul["value"].to_pylist() == [None]


def test_grouped_aggregate_signed_zero_and_key_column_agg(ray_session):
    """Regressions from review: (1) -0.0 and 0.0 float keys are ONE SQL
    group (bit-pattern hashing split them); (2) aggregating a column that
    is also a group key (SELECT k, count(k) GROUP BY k) works via the
    raw-value alias instead of a duplicate-schema crash."""
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_aggregate,
    )

    t = pa.table({
        "k": pa.array([0.0, -0.0, 0.0, -0.0, 1.0], pa.float64()),
        "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    r = (
        grouped_aggregate(
            rd.from_arrow(t), keys=["k"], aggs={"s": ("v", "sum")},
            num_partitions=8,
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert len(r) == 2  # one row for zero, one for 1.0
    assert r.loc[0, "k"] == 0.0 and r.loc[0, "s"] == 10
    assert r.loc[1, "k"] == 1.0 and r.loc[1, "s"] == 5

    t2 = pa.table({"k": pa.array([1, 1, None, 2], pa.int64())})
    r2 = (
        grouped_aggregate(
            rd.from_arrow(t2), keys=["k"],
            aggs={"n": ("k", "count"), "mx": ("k", "max")},
            num_partitions=4,
        )
        .to_pandas().sort_values("k", na_position="first")
        .reset_index(drop=True)
    )
    # null key group: count(k) over it is 0 (nulls excluded), max NULL
    assert r2["k"].isna()[0] and r2.loc[0, "n"] == 0
    assert r2.loc[1, "k"] == 1 and r2.loc[1, "n"] == 2 and r2.loc[1, "mx"] == 1
    assert r2.loc[2, "k"] == 2 and r2.loc[2, "n"] == 1


def test_sessionize_string_user_ids(ray_session):
    """String user ids survive the hash-partition exchange and the
    empty-partition schema fallback."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.streaming import sessionize

    rows = [
        {"user_id": "alice", "ts": 0},
        {"user_id": "alice", "ts": 60_000_000},
        {"user_id": "alice", "ts": 10**13},
        {"user_id": "bob", "ts": 5},
    ]
    t = pa.table({
        "user_id": pa.array([r["user_id"] for r in rows]),
        "ts": pa.array(
            [r["ts"] for r in rows], pa.int64()
        ).cast(pa.timestamp("us")),
    })
    out = sessionize(rd.from_arrow(t), gap_minutes=120).take_all()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r)
    assert len(per_user["alice"]) == 2  # big gap splits a session
    assert sum(s["n_events"] for s in per_user["alice"]) == 3
    assert len(per_user["bob"]) == 1


def test_grouped_percentiles_match_duckdb(ray_session):
    """Per-group quantile_disc: null group keys, null values excluded from
    ranks, all-null-value groups yield NULL — exact vs DuckDB."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_percentiles,
    )

    rng = np.random.default_rng(31)
    n = 30_000
    t = pa.table({
        "k": pa.array(
            [None if x % 89 == 7 else int(x)
             for x in rng.integers(0, 900, n)], pa.int64(),
        ),
        "v": pa.array(
            [None if x % 13 == 5 else float(x)
             for x in rng.normal(0, 100, n)], pa.float64(),
        ),
    })
    res = grouped_percentiles(
        rd.from_arrow(t).repartition(5), keys=["k"], col="v",
        qs={"p50": 0.5, "p90": 0.9}, num_partitions=8,
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT k, quantile_disc(v, 0.5) p50, quantile_disc(v, 0.9) p90 "
        "FROM t GROUP BY k"
    ).fetchdf()
    a = res.sort_values("k", na_position="first").reset_index(drop=True)
    b = want.sort_values("k", na_position="first").reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a[["k", "p50", "p90"]], b, check_dtype=False)

    t2 = pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "v": pa.array([None, None, 5.0], pa.float64()),
    })
    r2 = (
        grouped_percentiles(
            rd.from_arrow(t2), keys=["k"], col="v", qs={"p50": 0.5},
            num_partitions=4,
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert np.isnan(r2.loc[0, "p50"]) and r2.loc[1, "p50"] == 5.0


def test_top_n_per_group_matches_duckdb(ray_session):
    """row_number()-top-n: null group keys group together, null order
    values sort last (Arrow at_end == DuckDB default NULLS LAST), rank is
    1-based and deterministic under the unique tiebreak."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        top_n_per_group,
    )

    rng = np.random.default_rng(47)
    n = 20_000
    t = pa.table({
        "k": pa.array(
            [None if x % 97 == 3 else int(x)
             for x in rng.integers(0, 700, n)], pa.int64(),
        ),
        "v": pa.array(
            [None if x % 11 == 4 else float(x)
             for x in rng.normal(0, 50, n)], pa.float64(),
        ),
        "id": pa.array(np.arange(n), pa.int64()),
    })
    res = top_n_per_group(
        rd.from_arrow(t).repartition(6), keys=["k"],
        order_by=[("v", "descending"), ("id", "ascending")], n=4,
        num_partitions=8,
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT k, v, id, CAST(rn AS BIGINT) rn FROM ("
        "  SELECT *, row_number() OVER ("
        "    PARTITION BY k ORDER BY v DESC NULLS LAST, id) rn FROM t"
        ") WHERE rn <= 4"
    ).fetchdf()
    cols = ["k", "v", "id", "rn"]
    a = res[cols].sort_values(cols, na_position="first").reset_index(drop=True)
    b = want[cols].sort_values(cols, na_position="first").reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_grouped_lag_delta_matches_pandas_shift(ray_session):
    """lag() deltas: per-key first row NULL, timestamps diff to int64 us,
    result invariant to input block layout (the exchange re-co-locates)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_lag_delta,
    )

    rng = np.random.default_rng(53)
    n = 10_000
    base = np.int64(1_700_000_000_000_000)
    ts = base + rng.integers(0, 10**9, n).astype(np.int64)
    t = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "u": pa.array(rng.integers(0, 300, n), pa.int64()),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
    })
    res = grouped_lag_delta(
        rd.from_arrow(t).repartition(7), keys=["u"],
        order_by=[("ts", "ascending"), ("id", "ascending")],
        col="ts", out_col="gap", num_partitions=8,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    df = t.to_pandas().sort_values(["u", "ts", "id"])
    df["gap"] = (
        df.groupby("u")["ts"].diff().dt.total_seconds() * 1_000_000
    )
    want = df.sort_values("id").reset_index(drop=True)["gap"]
    got = res["gap"].astype("float64")
    assert np.allclose(got.fillna(-1), want.fillna(-1))
    # exactly one NULL per user (its first event)
    assert res["gap"].isna().sum() == df["u"].nunique()


def test_sliding_counts_brute_force(ray_session):
    """Sliding windows: every reported (key, window) count equals the
    brute-force containment count, and the windows covering each event
    are exactly width/stride many."""
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.streaming import (
        HOUR_US,
        sliding_counts,
    )

    rng = np.random.default_rng(61)
    n = 5_000
    base = np.int64(1_700_000_000_000_000)
    ts = base + rng.integers(0, 5 * 24 * HOUR_US, n).astype(np.int64)
    keys = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    t = pa.table({
        "event_type": pa.array(keys),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
    })
    W, S = 12, 4
    res = sliding_counts(
        rd.from_arrow(t).repartition(5), key_col="event_type",
        width_hours=W, stride_hours=S,
    ).to_pandas()
    w_us, s_us = W * HOUR_US, S * HOUR_US
    total = 0
    for _, row in res.iterrows():
        lo = row["win_start_us"]
        m = (keys == row["event_type"]) & (ts >= lo) & (ts < lo + w_us)
        assert row["n"] == m.sum(), (row, m.sum())
        total += row["n"]
        assert lo % s_us == 0
    assert total == n * (W // S)  # each event in exactly k windows


def test_grouped_rolling_sum_matches_pandas(ray_session):
    """Window-frame rolling sum: frame clamps at each group's head, groups
    smaller than the window sum everything, block layout irrelevant."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_rolling_sum,
    )

    rng = np.random.default_rng(71)
    n = 8_000
    t = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "k": pa.array(rng.integers(0, 500, n), pa.int64()),
        "v": pa.array(rng.integers(-100, 100, n), pa.int64()),
    })
    res = grouped_rolling_sum(
        rd.from_arrow(t).repartition(6), keys=["k"],
        order_by=[("id", "ascending")], col="v", window_rows=3,
        out_col="r", num_partitions=8,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    df = t.to_pandas().sort_values(["k", "id"])
    df["r"] = (
        df.groupby("k")["v"].rolling(3, min_periods=1).sum()
        .reset_index(level=0, drop=True)
    )
    want = df.sort_values("id").reset_index(drop=True)
    assert (res["r"].values == want["r"].astype(np.int64).values).all()


def test_incremental_dedup_append_loop(ray_session, tmp_path):
    """The cross-run ingest loop: increment 2 must drop texts that
    increment 1 appended into state, plus state-vs-increment and
    within-increment dups; null texts dedup like values."""
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.dedup import (
        build_dedup_state,
        incremental_dedup,
    )

    state = str(tmp_path / "state")
    corpus = pa.table({
        "doc_id": pa.array([0, 2, 4], pa.int64()),
        "text": pa.array(["alpha", "beta", None], pa.string()),
    })
    build_dedup_state(rd.from_arrow(corpus), state, num_buckets=8)

    inc1 = pa.table({
        "doc_id": pa.array([1, 3, 5, 7], pa.int64()),
        "text": pa.array(["alpha", "gamma", "gamma", None], pa.string()),
    })
    out1 = (
        incremental_dedup(state, rd.from_arrow(inc1), append=True)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # 'alpha' dup-of-state, None dup-of-state, 'gamma' keep-first (id 3)
    assert list(out1["doc_id"]) == [3]
    assert list(out1["text"]) == ["gamma"]

    inc2 = pa.table({
        "doc_id": pa.array([9, 11], pa.int64()),
        "text": pa.array(["gamma", "delta"], pa.string()),
    })
    out2 = (
        incremental_dedup(state, rd.from_arrow(inc2))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # 'gamma' was appended by run 1 -> dropped now; 'delta' is new
    assert list(out2["doc_id"]) == [11]
    assert list(out2["text"]) == ["delta"]


def test_hll_approx_count_distinct_error_bounds(ray_session):
    """HLL sketch: within ~3x the theoretical standard error on int and
    string columns at two true cardinalities, and exact-ish under heavy
    duplication (distinct << rows)."""
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.sketch import (
        approx_count_distinct,
    )

    rng = np.random.default_rng(83)
    b = 12
    se = 1.04 / np.sqrt(1 << b)
    for true_n, n_rows in [(50_000, 200_000), (1_000, 100_000)]:
        vals = rng.integers(0, true_n, n_rows).astype(np.int64)
        exact = len(np.unique(vals))
        t = pa.table({"v": pa.array(vals)})
        est = approx_count_distinct(
            rd.from_arrow(t).repartition(6), col="v", b=b
        )["n_distinct_approx"][0].as_py()
        assert abs(est - exact) / exact < 3 * se, (true_n, est, exact)

    svals = np.array([f"user-{i}" for i in rng.integers(0, 7_000, 50_000)])
    exact = len(np.unique(svals))
    t = pa.table({"v": pa.array(svals)})
    est = approx_count_distinct(
        rd.from_arrow(t).repartition(4), col="v", b=b
    )["n_distinct_approx"][0].as_py()
    assert abs(est - exact) / exact < 3 * se


def test_grouped_string_agg_null_semantics(ray_session):
    """string_agg parity: NULL values skipped inside groups, all-NULL
    groups yield NULL, ordering honored, vs DuckDB."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_string_agg,
    )

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "o": pa.array([2, 1, 3, 1, 2, 1], pa.int64()),
        "v": pa.array(["b", "a", None, None, None, "z"], pa.string()),
    })
    res = (
        grouped_string_agg(
            rd.from_arrow(t).repartition(3), keys=["k"],
            order_by=[("o", "ascending")], col="v", sep="|",
            out_col="s", num_partitions=4,
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(
            "SELECT k, string_agg(v, '|' ORDER BY o) s FROM t GROUP BY k"
        )
        .fetchdf().sort_values("k").reset_index(drop=True)
    )
    assert list(res["k"]) == list(want["k"])
    assert res["s"].fillna("<N>").tolist() == want["s"].fillna("<N>").tolist()


def test_top_n_per_group_mega_group_combiner(ray_session):
    """Skew: one key owning ~all rows must still return the exact global
    top-n with correct ranks (the per-batch combiner bounds what the
    exchange ships; survivors' ranks equal global ranks)."""
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        top_n_per_group,
    )

    rng = np.random.default_rng(97)
    n = 50_000
    k = np.zeros(n, np.int64)  # one mega-group
    k[:100] = rng.integers(1, 10, 100)  # few small groups
    v = rng.permutation(n).astype(np.int64)
    t = pa.table({
        "k": pa.array(k), "v": pa.array(v),
        "id": pa.array(np.arange(n), pa.int64()),
    })
    res = top_n_per_group(
        rd.from_arrow(t).repartition(8), keys=["k"],
        order_by=[("v", "descending"), ("id", "ascending")], n=3,
        num_partitions=4,
    ).to_pandas().sort_values(["k", "rn"]).reset_index(drop=True)
    df = t.to_pandas().sort_values(["k", "v", "id"],
                                   ascending=[True, False, True])
    want = df.groupby("k").head(3)
    assert len(res) == len(want)
    for kk, grp in want.groupby("k"):
        got = res[res["k"] == kk]
        assert list(got["v"]) == list(grp["v"])
        assert list(got["rn"]) == list(range(1, len(grp) + 1))


# ---------------------------------------------------------------------------
# broadcast / semi join family + rollup / unpivot / rank
# ---------------------------------------------------------------------------

def test_broadcast_join_left_outer_and_contracts(ray_session):
    """Left-outer null-fill on misses, inner drops misses, duplicate dim
    keys rejected, oversized dim rejected."""
    import pyarrow as pa
    import pytest as pt
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        broadcast_join,
    )

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, None, 2], pa.int64()),
        "x": pa.array([10, 20, 30, 40, 50], pa.int64()),
    }))
    dim = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "name": pa.array(["a", "b"]),
        "x": pa.array([100, 200], pa.int64()),  # collides with left.x
    }))
    lo = broadcast_join(left, dim, on="k", how="left_outer").to_pandas()
    lo = lo.sort_values("x").reset_index(drop=True)
    assert list(lo["name"]) == ["a", "b", None, None, "b"]
    assert list(lo["x_r"].fillna(-1).astype(int)) == [100, 200, -1, -1, 200]
    inner = broadcast_join(left, dim, on="k", how="inner").to_pandas()
    assert sorted(inner["x"]) == [10, 20, 50]

    dup = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()), "v": pa.array([1, 2], pa.int64()),
    }))
    with pt.raises(Exception, match="unique"):
        broadcast_join(left, dup, on="k").to_pandas()
    with pt.raises(ValueError, match="max_right_rows"):
        broadcast_join(left, dim, on="k", max_right_rows=1)


def test_semi_join_filter_exists_semantics(ray_session):
    """EXISTS/NOT EXISTS: null left keys never match (dropped by semi,
    kept by anti), null right keys ignored — NOT the NOT-IN poisoning."""
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        semi_join_filter,
    )

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, None], pa.int64()),
        "x": pa.array([10, 20, 30, 40], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "r": pa.array([2, 2, None, 9], pa.int64()),
    }))
    semi = semi_join_filter(left, right, on="k", right_on="r").to_pandas()
    assert sorted(semi["x"]) == [20]
    anti = semi_join_filter(
        left, right, on="k", right_on="r", anti=True
    ).to_pandas()
    assert sorted(anti["x"]) == [10, 30, 40]


def test_rollup_grouping_bitmask_disambiguates_real_nulls(ray_session):
    """A genuine NULL key value stays a finest-level group (gid=0),
    distinct from the rolled-up subtotal rows (gid>0) with the same NULL
    column — the SQL GROUPING() contract."""
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        rollup_aggregate,
    )

    t = pa.table({
        "a": pa.array(["x", "x", None], pa.string()),
        "b": pa.array(["p", "q", "p"], pa.string()),
        "v": pa.array([1, 2, 4], pa.int64()),
    })
    out = rollup_aggregate(
        rd.from_arrow(t), keys=["a", "b"],
        aggs={"s": ("v", "sum"), "n": ("v", "count_all")},
        schema=t.schema,
    ).to_pandas()
    fin = out[out["gid"] == 0]
    assert len(fin) == 3  # (x,p) (x,q) (NULL,p) all finest
    null_fin = fin[fin["a"].isna()]
    assert list(null_fin["s"]) == [4]
    lvl1 = out[out["gid"] == 1].sort_values("a", na_position="first")
    assert list(lvl1["s"]) == [4, 3]  # NULL-subtotal, x-subtotal
    total = out[out["gid"] == 3]
    assert list(total["s"]) == [7] and list(total["n"]) == [3]


def test_grouped_rank_gaps_vs_dense(ray_session):
    """RANK leaves gaps after ties; DENSE_RANK does not."""
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import grouped_rank

    t = pa.table({
        "g": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "v": pa.array([5, 5, 7, 9, 1], pa.int64()),
        "id": pa.array([0, 1, 2, 3, 4], pa.int64()),
    })
    dense = grouped_rank(
        rd.from_arrow(t), keys=["g"], order_by=[("v", "ascending")],
        method="dense", schema=t.schema,
    ).to_pandas().sort_values("id")
    assert list(dense["rnk"]) == [1, 1, 2, 3, 1]
    gaps = grouped_rank(
        rd.from_arrow(t), keys=["g"], order_by=[("v", "ascending")],
        method="rank", schema=t.schema,
    ).to_pandas().sort_values("id")
    assert list(gaps["rnk"]) == [1, 1, 3, 4, 1]


def test_grouped_ntile_matches_duckdb(ray_session):
    """NTILE distribution rule (first s%n tiles get the extra row) vs
    DuckDB, covering groups smaller than n, equal to n, and a multiple
    plus remainder; ties impossible (unique order key)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import grouped_ntile

    rng = np.random.default_rng(7)
    g = rng.integers(0, 12, 400)          # skewed sizes incl. tiny groups
    t = pa.table({
        "g": pa.array(g, pa.int64()),
        "id": pa.array(np.arange(400), pa.int64()),
    })
    for n in (1, 3, 4, 7):
        got = grouped_ntile(
            rd.from_arrow(t), keys=["g"], order_by=[("id", "ascending")],
            n=n, schema=t.schema,
        ).to_pandas().sort_values("id").reset_index(drop=True)
        exp = duckdb.sql(
            f"SELECT g, id, CAST(NTILE({n}) OVER "
            "(PARTITION BY g ORDER BY id) AS BIGINT) AS nt "
            "FROM t ORDER BY id"
        ).df()
        assert list(got["nt"]) == list(exp["nt"]), f"n={n}"
    # single-row group -> tile 1
    one = pa.table({"g": pa.array([9], pa.int64()),
                    "id": pa.array([0], pa.int64())})
    got1 = grouped_ntile(
        rd.from_arrow(one), keys=["g"], order_by=[("id", "ascending")],
        n=5, schema=one.schema,
    ).to_pandas()
    assert list(got1["nt"]) == [1]


def test_percent_rank_cume_dist_vs_duckdb(ray_session):
    """Tie runs share the statistic; 1-row group -> pr 0.0, cd 1.0;
    bit-exact doubles vs DuckDB (same int division)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import grouped_rank

    t = pa.table({
        "g": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
        "v": pa.array([5.0, 5.0, 7.0, 9.0, 9.0, 3.0], pa.float64()),
        "id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
    })
    pr = grouped_rank(
        rd.from_arrow(t), keys=["g"], order_by=[("v", "ascending")],
        method="percent_rank", out_col="pr", schema=t.schema,
    )
    out = grouped_rank(
        pr, keys=["g"], order_by=[("v", "ascending")],
        method="cume_dist", out_col="cd",
        schema=pa.schema(list(t.schema) + [pa.field("pr", pa.float64())]),
    ).to_pandas().sort_values("id").reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT id, PERCENT_RANK() OVER (PARTITION BY g ORDER BY v) pr,"
        " CUME_DIST() OVER (PARTITION BY g ORDER BY v) cd"
        " FROM t ORDER BY id"
    ).df()
    assert list(out["pr"]) == list(exp["pr"])
    assert list(out["cd"]) == list(exp["cd"])
    assert out.loc[5, "pr"] == 0.0 and out.loc[5, "cd"] == 1.0


def test_distinct_set_op_intersect_except(ray_session):
    """DISTINCT set semantics incl. null tuples grouping as equal and
    duplicates collapsing on both sides."""
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        distinct_set_op,
    )

    l = pa.table({"k": pa.array([1, 1, 2, 3, None], pa.int64())})
    r = pa.table({"k": pa.array([2, 2, None, 9], pa.int64())})
    inter = distinct_set_op(
        rd.from_arrow(l), rd.from_arrow(r), cols=["k"], op="intersect",
        schema=l.schema,
    ).to_pandas()
    vals = set(inter["k"].tolist())
    assert 2 in vals and len(inter) == 2  # {2, NULL}
    exc = distinct_set_op(
        rd.from_arrow(l), rd.from_arrow(r), cols=["k"], op="except",
        schema=l.schema,
    ).to_pandas()
    assert set(exc["k"].dropna().tolist()) == {1, 3} and len(exc) == 2


def test_repartition_join_full_outer(ray_session):
    """Unmatched keys from BOTH sides survive with nulls on the other
    side; key column is coalesced."""
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        repartition_join,
    )

    l = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "a": pa.array([10, 20], pa.int64()),
    })
    r = pa.table({
        "k": pa.array([2, 3], pa.int64()),
        "b": pa.array([200, 300], pa.int64()),
    })
    out = (
        repartition_join(
            rd.from_arrow(l), rd.from_arrow(r), on="k", how="full_outer",
            num_partitions=4,
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert list(out["k"]) == [1, 2, 3]
    assert out.loc[0, "b"] != out.loc[0, "b"]  # NaN for unmatched left
    assert out.loc[1, "a"] == 20 and out.loc[1, "b"] == 200
    assert out.loc[2, "a"] != out.loc[2, "a"]  # NaN for unmatched right


def test_semi_join_filter_anti_null_keys(ray_session):
    """NOT EXISTS semantics: a NULL left key never matches, so it is
    dropped by semi and KEPT by anti (unlike NOT IN null-poisoning)."""
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        semi_join_filter,
    )

    l = pa.table({"k": pa.array([1, 2, None], pa.int64())})
    r = pa.table({"k": pa.array([2, 9], pa.int64())})
    semi = semi_join_filter(
        rd.from_arrow(l), rd.from_arrow(r), on="k"
    ).to_pandas()
    assert semi["k"].tolist() == [2]
    anti = semi_join_filter(
        rd.from_arrow(l), rd.from_arrow(r), on="k", anti=True
    ).to_pandas()
    assert sorted(anti["k"].dropna().tolist()) == [1]
    assert anti["k"].isna().sum() == 1


def test_chunk_documents_boundaries():
    """Chunk windows: stride overlap, ragged tail, whitespace-only doc
    yields nothing, token class is the RE2-pinned \\S+."""
    import pyarrow as pa

    from debezium_connector_db2_ray.functions.text import (
        chunk_documents_batch,
    )

    fn = chunk_documents_batch(5, 3)
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["a b c d e f g h", " \t\n ", "x\ty\nz"],
    })
    out = fn(t).to_pydict()
    assert out["doc_id"] == [1, 1, 1, 3]
    assert out["chunk_text"] == ["a b c d e", "d e f g h", "g h", "x y z"]
    assert out["n_tokens"] == [5, 5, 2, 3]
    assert out["chunk_idx"] == [0, 1, 2, 0]


def test_global_top_k_no_full_sort(ray_session):
    """Top-k across many blocks: result equals a full sort's head, ties
    broken by the unique tiebreak column."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import global_top_k

    rng = np.random.default_rng(3)
    v = rng.integers(0, 50, 5000)
    t = pa.table({
        "id": pa.array(np.arange(5000), pa.int64()),
        "v": pa.array(v, pa.int64()),
    })
    got = global_top_k(
        rd.from_arrow(t).repartition(16),
        order_by=[("v", "descending"), ("id", "ascending")], k=25,
        schema=t.schema,
    ).to_pandas()
    exp = (
        t.to_pandas().sort_values(["v", "id"], ascending=[False, True])
        .head(25).reset_index(drop=True)
    )
    assert got[["id", "v"]].values.tolist() == exp[["id", "v"]].values.tolist()


def test_vocab_coverage_empty_doc_and_oov(ray_session):
    """Token-free doc -> coverage NULL, counts 0; OOV tokens counted."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.text import vocab_coverage

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["the the cat", "  ", "the zzz"],
    })
    out = (
        vocab_coverage(rd.from_arrow(t), vocab_k=1)  # vocab == {"the"}
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [3, 0, 2]
    assert out["n_in_vocab"].tolist() == [2, 0, 1]
    assert out.loc[0, "coverage"] == 2 / 3
    assert pd.isna(out.loc[1, "coverage"])
    assert out.loc[2, "coverage"] == 0.5


def test_curation_pipeline_vs_duckdb_composition(ray_session, tmp_path):
    """The composed curation pipeline equals its composed SQL oracle on a
    crafted corpus with low-quality, duplicate and multi-lang docs."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.functions.queries import (
        SQL_CURATION,
        q_curation_pipeline,
    )

    long_ok = "Good clean text " * 20          # passes quality floor
    dup_a = "Repeated! Body " * 20             # normalizes same as dup_b
    dup_b = "repeated  body " * 20
    t = pa.table({
        "doc_id": pa.array(list(range(1, 7)), pa.int64()),
        "text": [long_ok, dup_a, dup_b, "#@!$%", long_ok + "tail", None],
        "lang": ["en", "de", "de", "en", "de", "fr"],
        "source": ["s"] * 6,
        "n_chars": pa.array([len(x or "") for x in
                             [long_ok, dup_a, dup_b, "#@!$%",
                              long_ok + "tail", None]], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = (
        q_curation_pipeline(str(tmp_path))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = (
        con.execute(SQL_CURATION).fetchdf()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["lang"].tolist() == exp["lang"].tolist()
    # the de duplicate pair collapsed to the min doc_id before sampling
    assert 3 not in got["doc_id"].tolist()


def test_unpivot_types_and_fanout(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import unpivot

    t = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "a": pa.array([1.5, 2.5], pa.float64()),
        "b": pa.array([10, 20], pa.int64()),  # cast to float64 on melt
    })
    out = unpivot(
        rd.from_arrow(t), id_cols=["id"], value_cols=["a", "b"],
    ).to_pandas().sort_values(["id", "name"]).reset_index(drop=True)
    assert len(out) == 4
    assert list(out["value"]) == [1.5, 10.0, 2.5, 20.0]
    assert out["value"].dtype.kind == "f"
