"""Unit tests for the round-5 operator batch: grouping sets / CUBE,
RANGE-frame rolling sums, paragraph dedup, bloom semi join, inverted
index, radius search."""

import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def test_grouping_sets_subset_and_gid(ray_session):
    """An explicit grouping-set list (not full CUBE) emits exactly the
    requested sets with DuckDB-convention GROUPING bitmasks."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouping_sets_aggregate,
    )

    t = pa.table({
        "a": pa.array(["x", "x", "y", "y"]),
        "b": pa.array(["p", "q", "p", "q"]),
        "v": pa.array([1, 2, 3, 4], pa.int64()),
    })
    out = grouping_sets_aggregate(
        rd.from_arrow(t), keys=["a", "b"], sets=[["a", "b"], ["b"], []],
        aggs={"s": ("v", "sum")},
        schema=t.schema,
    )
    rows = {(r["a"], r["b"], r["gid"], r["s"])
            for r in out.to_pylist()}
    assert ("x", "p", 0, 1) in rows and ("y", "q", 0, 4) in rows
    assert (None, "p", 2, 4) in rows and (None, "q", 2, 6) in rows
    assert (None, None, 3, 10) in rows
    # set ["a"] was NOT requested -> no gid=1 rows
    assert not any(g == 1 for _, _, g, _ in rows)


def test_range_rolling_peers_and_window_edge(ray_session):
    """RANGE frames include ts-peers (unlike ROWS) and the window bound is
    inclusive at exactly range_preceding."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_rolling_range_sum,
    )

    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "t": pa.array([0, 10, 10, 21, 10], pa.int64()),
        "v": pa.array([1, 2, 4, 8, 100], pa.int64()),
    })
    out = grouped_rolling_range_sum(
        rd.from_arrow(t), keys=["k"], order_col="t", col="v",
        range_preceding=10, schema=t.schema,
    )
    got = {(r["k"], r["t"], r["v"]): r["rolling"] for r in out.take_all()}
    assert got[(1, 0, 1)] == 1
    # both t=10 rows see each other (peers) AND t=0 (10 - 10 = 0 inclusive)
    assert got[(1, 10, 2)] == 7 and got[(1, 10, 4)] == 7
    # t=21: window [11, 21] -> only itself (t=10 is outside)
    assert got[(1, 21, 8)] == 8
    assert got[(2, 10, 100)] == 100  # separate key segment


def test_paragraph_dedup_semantics(ray_session):
    """First global occurrence wins, empties are structure (always kept),
    docs reassemble in order; a fully-duplicate doc vanishes."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.dedup import paragraph_dedup

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "alpha\n\nbeta",     # defines alpha, beta; middle empty kept
            "beta\ngamma\n",     # beta dropped; trailing '' kept
            "alpha",             # fully duplicate -> vanishes
        ]),
    })
    out = {r["doc_id"]: r["clean_text"]
           for r in paragraph_dedup(rd.from_arrow(docs)).take_all()}
    assert out == {1: "alpha\n\nbeta", 2: "gamma\n"}


def test_bloom_semi_join_exact_and_null_semantics(ray_session):
    """bloom_semi_join is exact (bitmap false positives removed by the
    verify) and anti keeps NULL left keys — NOT EXISTS, matching
    semi_join_filter's convention."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.sketch import bloom_semi_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5, None, 7, 8], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 4, 4, 8, 100], pa.int64()),
    }))
    semi = sorted(
        r["k"]
        for r in bloom_semi_join(left, right, on="k",
                                 m_bits=1 << 10).take_all()
    )
    assert semi == [2, 4, 8]
    anti = [
        r["k"]
        for r in bloom_semi_join(left, right, on="k", m_bits=1 << 10,
                                 anti=True).take_all()
    ]
    assert sorted(x for x in anti if x is not None) == [1, 3, 5, 7]
    assert None in anti


def test_bloom_bitmap_prunes_disjoint_probe(ray_session):
    """With disjoint key sets the bitmap alone rejects ~everything: the
    exact verify then runs over a negligible survivor fraction."""
    import ray
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import mix64
    from debezium_connector_db2_ray.functions.sketch import bloom_bitmap

    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 4, 8, 16, 32], pa.int64()),
    }))
    bits_ref, mb = bloom_bitmap(right, col="k", m_bits=1 << 16)
    bits = ray.get(bits_ref)
    probe = np.arange(10_000, 30_000, dtype=np.int64)
    h = mix64(probe).astype(np.uint64)
    m = np.uint64(mb)
    hit = np.ones(len(probe), bool)
    for hh in (h % m, (h >> np.uint64(32) | h << np.uint64(32)) % m):
        hit &= (
            bits[(hh >> np.uint64(3)).astype(np.int64)]
            >> (hh & np.uint64(7)).astype(np.uint8)
        ) & 1 == 1
    assert hit.mean() < 0.01


def test_inverted_index_lookup_and_bucket_pruning(ray_session, tmp_path):
    """Persisted inverted index returns exactly the brute-force postings;
    probing fewer terms reads strictly fewer bytes (dir-level pruning)."""
    import os

    import polars as pl
    import ray.data as rd

    from debezium_connector_db2_ray.functions.index import (
        build_inverted_index,
        inverted_index_lookup,
        inverted_index_paths,
    )
    from debezium_connector_db2_ray.functions.text import TOKEN_PATTERN

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    idx = str(tmp_path / "inv")
    build_inverted_index(ds, idx, num_buckets=16)

    got = {
        (r["term"], r["doc_id"])
        for r in inverted_index_lookup(idx, ["merge", "vector"]).take_all()
    }
    df = pl.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    toks = df.with_columns(
        pl.col("text").fill_null("").str.to_lowercase()
        .str.extract_all(TOKEN_PATTERN).list.unique().alias("t")
    ).explode("t")
    ref = {
        (t, d) for d, t in zip(toks["doc_id"], toks["t"])
        if t in ("merge", "vector")
    }
    assert got == ref and len(got) > 0

    one = sum(os.path.getsize(f)
              for f in inverted_index_paths(idx, ["merge"]))
    many = sum(
        os.path.getsize(f)
        for f in inverted_index_paths(
            idx, ["merge", "vector", "customer", "join", "sort", "table"]
        )
    )
    assert 0 < one < many
    assert inverted_index_lookup(idx, ["zzz_not_a_word"]).count() == 0


def test_radius_search_matches_bruteforce(ray_session):
    """radius_search == brute-force cosine filter (excluding self)."""
    import ray
    import ray.data as rd

    from debezium_connector_db2_ray.functions.similarity import (
        _batch_matrix,
        _normalize_rows,
        radius_search,
    )

    rng = np.random.default_rng(3)
    n, d = 300, 8
    mat = rng.standard_normal((n, d))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(
            [row.astype(np.float32) for row in mat],
            pa.list_(pa.float32()),
        ),
    })
    q = {"qids": np.arange(3, dtype=np.int64),
         "matrix": _batch_matrix(tbl.slice(0, 3))}
    out = {
        (r["query_id"], r["vec_id"])
        for r in radius_search(
            rd.from_arrow(tbl), ray.put(q), threshold=0.5
        ).take_all()
    }
    m = _normalize_rows(_batch_matrix(tbl))
    sims = m[:3] @ m.T
    ref = {
        (qi, vi)
        for qi in range(3)
        for vi in range(n)
        if sims[qi, vi] >= 0.5 and vi != qi
    }
    assert out == ref and len(ref) > 3


def test_gopher_repetition_signals():
    """gopher_repetition_batch: hand-computed stats on crafted docs."""
    from debezium_connector_db2_ray.functions.text import (
        gopher_repetition_batch,
    )

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            # 21 distinct-ish words, no repetition -> keep
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi",
            # dominant word: "spam" 10/12 occurrences -> top*10 > n
            "spam spam spam spam spam spam spam spam spam spam ham egg",
            # heavy 2-gram repetition: "go go" repeated
            " ".join(["go"] * 30),
            None,  # NULL text -> all zeros, keep=False
        ]),
    })
    out = gopher_repetition_batch(docs).to_pydict()
    i = {d: j for j, d in enumerate(out["doc_id"])}
    # doc 1: 21 words, all distinct, keep
    assert out["n_words"][i[1]] == 21
    assert out["distinct_words"][i[1]] == 21
    assert out["top_word_n"][i[1]] == 1
    assert out["dup_2gram_permille"][i[1]] == 0
    assert out["keep"][i[1]] is True
    # doc 2: 12 words, top word 10 -> fails dominance test
    assert out["n_words"][i[2]] == 12
    assert out["top_word_n"][i[2]] == 10
    assert out["keep"][i[2]] is False
    # doc 3: 30 words, 29 bigrams all "go go" -> dup fraction 28/29
    assert out["n_words"][i[3]] == 30
    assert out["dup_2gram_permille"][i[3]] == int(1000 * 28 / 29)
    assert out["keep"][i[3]] is False
    # doc 4: NULL text -> zeros, mean_word_len floor(0/1)=0
    assert out["n_words"][i[4]] == 0
    assert out["mean_word_len_x100"][i[4]] == 0
    assert out["keep"][i[4]] is False


def test_dup_span_grams_pairs_and_count():
    """dup_span_grams: distinct per-doc 8-gram pairs; repeated in-doc
    spans collapse; shared spans across docs surface exactly once each."""
    from debezium_connector_db2_ray.functions.text import dup_span_grams

    span = "one two three four five six seven eight"
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            f"A {span} tail",
            f"prefix {span}",
            f"{span} {span}",          # in-doc repeat -> still one pair
        ]),
    })
    out = dup_span_grams(docs).to_pydict()
    pairs = set(zip(out["gram"], out["doc_id"]))
    key = span.lower()
    shared = {d for g, d in pairs if g == key}
    assert shared == {1, 2, 3}
    # doc 3 (16 tokens, all windows) contributes 9 windows but the
    # repeated central span dedupes: 9 distinct grams at most
    assert len({g for g, d in pairs if d == 3}) <= 9
    # short doc: no grams at all
    short = pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array(["too few tokens"]),
    })
    assert dup_span_grams(short).num_rows == 0


def _emb_table(n=120, d=6, seed=11):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(
            [r.astype(np.float32) for r in m], pa.list_(pa.float32())
        ),
    }), m.astype(np.float32).astype(np.float64)


def test_kmeans_fit_matches_numpy_lloyd(ray_session):
    """Distributed kmeans_fit == single-process Lloyd with the same
    init / tie / empty-cluster rules, regardless of batching."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.similarity import kmeans_fit

    tbl, m = _emb_table()
    k, iters = 5, 3
    cent = m[:k].copy()
    for _ in range(iters):
        d2 = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for c in range(k):
            if (a == c).any():
                cent[c] = m[a == c].mean(axis=0)
    got = kmeans_fit(
        rd.from_arrow(tbl).repartition(7), k=k, iters=iters,
    )
    assert np.allclose(got, cent, atol=1e-9)


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    """An init centroid that captures nothing survives unchanged."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.similarity import kmeans_fit

    m = np.array([[0.0, 0.0], [0.1, 0.0], [10.0, 10.0], [10.1, 10.0]])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(4), pa.int64()),
        "embedding": pa.array(
            [r.astype(np.float32) for r in m], pa.list_(pa.float32())
        ),
    })
    far = np.array([[100.0, 100.0]])
    init = np.vstack([m[0], m[2], far[0]])
    got = kmeans_fit(rd.from_arrow(tbl), iters=2, init=init)
    assert np.allclose(got[2], far[0])  # never assigned -> unchanged
    assert np.allclose(got[0], m[:2].mean(axis=0))
    assert np.allclose(got[1], m[2:].mean(axis=0))


def test_semantic_dedup_min_id_keeper(ray_session):
    """Within a cluster every vector with a lower-id neighbor above tau
    drops; the lowest id of each near-dup group survives."""
    import ray
    import ray.data as rd

    from debezium_connector_db2_ray.functions.similarity import (
        semantic_dedup_drops,
    )

    base = np.array([1.0, 0.0, 0.0])
    rot = np.array([0.0, 1.0, 0.0])
    vecs = np.stack([
        base, base * 2.0,          # same direction -> cosine 1
        rot, rot + 1e-3 * base,    # near-identical pair
        np.array([0.0, 0.0, 1.0]),  # lone vector
    ])
    tbl = pa.table({
        "vec_id": pa.array([10, 11, 20, 21, 30], pa.int64()),
        "embedding": pa.array(
            [r.astype(np.float32) for r in vecs], pa.list_(pa.float32())
        ),
    })
    cent = np.zeros((1, 3))  # single cluster: pure pairwise semantics
    out = semantic_dedup_drops(
        rd.from_arrow(tbl).repartition(3), ray.put(cent), threshold=0.99,
    ).take_all()
    assert sorted(r["vec_id"] for r in out) == [11, 21]


def test_label_centroids_quantized(ray_session, tmp_path):
    """Per-label centroid rows: quantized means match numpy per label."""
    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.functions.queries import (
        q_emb_label_centroids,
    )

    rng = np.random.default_rng(5)
    n, d = 200, 4
    m = rng.standard_normal((n, d)).astype(np.float32)
    labels = (np.arange(n) % 3).astype(np.int32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([r for r in m], pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = q_emb_label_centroids(str(tmp_path)).to_pandas()
    assert len(out) == 3 * d
    for lb in range(3):
        sel = m.astype(np.float64)[labels == lb]
        for idx in range(d):
            row = out[(out.label == lb) & (out.idx == idx + 1)].iloc[0]
            assert row.n == len(sel)
            want = int(np.floor(1e6 * sel[:, idx].sum() / len(sel)))
            assert row.c_x1e6 == want


def test_knn_classify_vote_and_self_exclusion(ray_session):
    """knn_classify: majority vote with min-label tiebreak; a query
    vector never votes for itself."""
    import ray
    import ray.data as rd

    from debezium_connector_db2_ray.functions.similarity import (
        knn_classify,
    )

    # two tight direction groups: queries 0 (group A) and 3 (group B)
    a = np.array([1.0, 0.0]); b = np.array([0.0, 1.0])
    vecs = np.stack([a, a * 2, a * 3, b, b * 2, b * 3])
    labels = np.array([7, 7, 7, 2, 2, 2])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(6), pa.int64()),
        "embedding": pa.array(
            [r.astype(np.float32) for r in vecs], pa.list_(pa.float32())
        ),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })
    q = {"qids": np.array([0, 3], dtype=np.int64),
         "matrix": vecs[[0, 3]].astype(np.float64)}
    out = {r["query_id"]: (r["pred_label"], r["votes"])
           for r in knn_classify(
               rd.from_arrow(tbl).repartition(3), ray.put(q), k=2
           ).take_all()}
    # query 0's own row is excluded; its 2 nearest are the other two A's
    assert out[0] == (7, 2)
    assert out[3] == (2, 2)


def test_pagerank_star_graph(ray_session):
    """pagerank on a 4-node star (undirected): hand-computed ranks after
    2 iterations; total mass stays 1 on a dangling-free graph."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import pagerank

    # center 0, leaves 1..3; both directions
    src = [0, 0, 0, 1, 2, 3]
    dst = [1, 2, 3, 0, 0, 0]
    edges = pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
    })
    out = {r["node"]: r["r"]
           for r in pagerank(
               rd.from_arrow(edges).repartition(2), iters=2
           ).take_all()}
    # iteration 1: center = 0.0375 + 0.85*(3*0.25) = 0.675
    #              leaf   = 0.0375 + 0.85*(0.25/3)
    # iteration 2: center = 0.0375 + 0.85*(3*leaf1)
    leaf1 = 0.0375 + 0.85 * (0.25 / 3)
    center2 = 0.0375 + 0.85 * (3 * leaf1)
    leaf2 = 0.0375 + 0.85 * (0.675 / 3)
    assert abs(out[0] - center2) < 1e-12
    for v in (1, 2, 3):
        assert abs(out[v] - leaf2) < 1e-12
    assert abs(sum(out.values()) - 1.0) < 1e-9


def test_within_edit1_kernel():
    """Exact ed<=1 predicate: substitution, insert, delete yes;
    transposition and distance-2 no."""
    from debezium_connector_db2_ray.functions.dedup import _within_edit1

    assert _within_edit1("abc", "abc")
    assert _within_edit1("abc", "abd")          # substitution
    assert _within_edit1("abc", "abxc")         # insertion
    assert _within_edit1("abc", "ac")           # deletion
    assert not _within_edit1("abc", "acb")      # transposition = ed 2
    assert not _within_edit1("abc", "xyc")      # two substitutions
    assert not _within_edit1("abc", "abcde")    # length diff 2
    assert _within_edit1("", "a")
    assert not _within_edit1("", "ab")


def test_edit_distance_pairs_bruteforce(ray_session):
    """FastSS blocking + verify equals the brute-force Levenshtein<=1
    self-join on a fixture with dup ids across partitions, NULLs and
    empty strings."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.dedup import (
        _within_edit1,
        edit_distance_pairs,
    )

    names = ["kitten", "sitten", "sittin", "kitte", "kittens",
             "", "a", None, "zebra", "zebr", "kit ten"]
    ids = list(range(len(names)))
    tbl = pa.table({
        "id": pa.array(ids, pa.int64()),
        "name": pa.array(names, pa.string()),
    })
    got = sorted(
        (r["a"], r["b"])
        for r in edit_distance_pairs(
            rd.from_arrow(tbl).repartition(4), col="name", id_col="id",
        ).take_all()
    )
    norm = ["" if n is None else n for n in names]
    want = sorted(
        (i, j)
        for i in ids for j in ids
        if i < j and _within_edit1(norm[i], norm[j])
    )
    assert got == want
    assert (5, 7) in got  # NULL coalesces to "" and pairs with ""
    assert (0, 1) in got and (1, 2) in got and (0, 2) not in got


def test_edit_distance_pairs_max_len_guard(ray_session):
    """Strings longer than max_len hard-fail (no silent missed pairs)."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.dedup import (
        edit_distance_pairs,
    )

    tbl = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "name": pa.array(["x" * 80, "y"], pa.string()),
    })
    with pytest.raises(Exception):
        edit_distance_pairs(
            rd.from_arrow(tbl), col="name", id_col="id", max_len=64,
        ).take_all()


def test_simhash32_md5_hand_check(ray_session):
    """simhash32_md5 equals a hand-rolled reference on a tiny batch;
    empty/NULL docs emit no row; repeated tokens weight by multiplicity."""
    import hashlib

    import ray.data as rd

    from debezium_connector_db2_ray.functions.dedup import simhash32_md5

    def ref_sig(text):
        toks = [t for t in text.split() if t]
        if not toks:
            return None
        sums = [0] * 32
        for t in toks:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            for b in range(32):
                sums[b] += 1 if (h >> b) & 1 else -1
        return sum(1 << b for b in range(32) if sums[b] > 0)

    texts = ["the quick fox", "the the the", "", None, "quick"]
    tbl = pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = {r["doc_id"]: r["simhash32"]
           for r in simhash32_md5(rd.from_arrow(tbl).repartition(2))
           .take_all()}
    assert set(got) == {0, 1, 4}
    for i in (0, 1, 4):
        assert got[i] == ref_sig(texts[i])


def test_funnel_stages_strict_order(ray_session):
    """Funnel depth uses the EARLIEST stage-0 ts and strictly-after
    matching: a click before the first view doesn't count; ties on ts
    don't advance the funnel."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        funnel_stages,
    )

    rows = [
        # user 1: full funnel
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2: click BEFORE view -> depth 1
        (2, 10, "click"), (2, 20, "view"),
        # user 3: click at the SAME ts as view (not strictly after) -> 1
        (3, 10, "view"), (3, 10, "click"),
        # user 4: no view at all -> no row
        (4, 10, "click"), (4, 20, "purchase"),
        # user 5: view then purchase (skipping click) -> depth 1
        (5, 10, "view"), (5, 20, "purchase"),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    got = {r["user_id"]: (r["stages_reached"], r["last_ts_us"])
           for r in funnel_stages(
               rd.from_arrow(tbl).repartition(3),
               key="user_id", ts_col="ts", type_col="event_type",
               stages=["view", "click", "purchase"],
           ).take_all()}
    assert got == {1: (3, 30), 2: (1, 20), 3: (1, 10), 5: (1, 10)}


def test_triangle_count_known_graphs(ray_session):
    """K4 has 4 triangles; a star has 0; duplicate/reversed/self-loop
    edges don't change the count."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        triangle_count,
    )

    def count(edges):
        t = pa.table({
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        })
        out = triangle_count(rd.from_arrow(t).repartition(2)).take_all()
        return out[0]["n_triangles"]

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert count(k4) == 4
    # noise: duplicates, reversed copies, self loops
    assert count(k4 + [(1, 0), (2, 2), (0, 1), (3, 2)]) == 4
    star = [(0, i) for i in range(1, 6)]
    assert count(star) == 0
    # two triangles sharing an edge
    assert count([(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]) == 2


def test_collocation_counts_hand_check(ray_session):
    """Bigram + unigram counts on a tiny corpus; min_count prunes; NULL
    and empty docs contribute nothing; adjacency never crosses docs."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.text import (
        collocation_counts,
    )

    tbl = pa.table({"text": pa.array([
        "the cat sat on the mat", "the cat ran", "a cat sat here",
        "the cat sat", None, "", "cat sat mats the cat sat",
    ])})
    out = {(r["w1"], r["w2"]): (r["n_xy"], r["n_x"], r["n_y"])
           for r in collocation_counts(
               rd.from_arrow(tbl).repartition(3), min_count=2
           ).take_all()}
    assert out == {("cat", "sat"): (5, 6, 5), ("the", "cat"): (4, 5, 6)}


def test_skyline_2d_bruteforce(ray_session):
    """skyline_2d equals the O(n^2) strict-dominance filter on a fixture
    with duplicate points, dominance ties on each axis, and a clear
    frontier."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import skyline_2d

    pts = [(1, 5), (1, 5), (2, 9), (2, 7), (3, 9), (4, 12), (4, 3),
           (5, 12), (0, 1), (6, 13), (6, 13), (7, 2)]
    tbl = pa.table({
        "x": pa.array([p[0] for p in pts], pa.int64()),
        "y": pa.array([p[1] for p in pts], pa.int64()),
    })
    got = sorted(
        (r["x"], r["y"])
        for r in skyline_2d(
            rd.from_arrow(tbl).repartition(4), x_col="x", y_col="y"
        ).take_all()
    )
    uniq = set(pts)
    want = sorted(
        p for p in uniq
        if not any(
            q[0] <= p[0] and q[1] >= p[1] and q != p for q in uniq
        )
    )
    assert got == want


def test_pq_encode_bruteforce(ray_session):
    """pq_encode's integer-exact assignment equals a numpy brute-force
    nearest-centroid per subspace (ties to the smallest id)."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.similarity import (
        pq_encode,
        sqlparity_codebook,
    )

    rng = np.random.default_rng(3)
    vecs = rng.normal(0, 0.3, (40, 8)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(40), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })
    got = {r["vec_id"]: (r["c0"], r["c1"])
           for r in pq_encode(
               rd.from_arrow(tbl).repartition(3), dim=8, m_sub=2, k=4
           ).take_all()}
    cb = sqlparity_codebook(2, 4, 4)
    q = np.floor(vecs.astype(np.float64) * 1000.0 + 0.5).astype(np.int64)
    for i in range(40):
        want = tuple(
            int(np.argmin(((q[i, s * 4:(s + 1) * 4] - cb[s]) ** 2)
                          .sum(axis=1)))
            for s in range(2)
        )
        assert got[i] == want


def test_profile_nulls(ray_session):
    """Null counts per column across blocks."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        profile_nulls,
    )

    tbl = pa.table({
        "a": pa.array([1, None, 3, None], pa.int64()),
        "b": pa.array(["x", None, None, None], pa.string()),
    })
    got = {r["column"]: (r["n_rows"], r["n_null"])
           for r in profile_nulls(
               rd.from_arrow(tbl).repartition(2), columns=["a", "b"]
           ).take_all()}
    assert got == {"a": (4, 2), "b": (4, 3)}


def _mini_events(rows):
    """(event_id, user_id, event_type) -> events-shaped table; ts walks
    one second per event."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(
            [base + dt.timedelta(seconds=r[0]) for r in rows],
            pa.timestamp("us"),
        ),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })


def test_scd2_intervals_and_current_null(ray_session, tmp_path):
    """Each version's valid_to is the next version's LSN; the current
    version carries NULL."""
    import pyarrow.parquet as pq2

    from debezium_connector_db2_ray.pipelines.queries import q_scd2_history

    # one key (user 1, turn = event_id % 20): events 1, 21, 41 hit turn 1
    rows = [(1, 1, "view"), (21, 1, "purchase"), (41, 1, "error"),
            (2, 1, "click")]
    pq2.write_table(_mini_events(rows), str(tmp_path / "events.parquet"))
    got = {(r["conv_id"], r["turn_idx"], r["valid_from_lsn"]):
           (r["valid_to_lsn"], r["op"])
           for r in q_scd2_history(str(tmp_path)).take_all()}
    assert got[("conv_1", 1, 1)] == (21, 2)     # superseded by lsn 21
    assert got[("conv_1", 1, 21)] == (41, 5)    # superseded by delete
    assert got[("conv_1", 1, 41)] == (None, 1)  # current (a tombstone)
    assert got[("conv_1", 2, 2)] == (None, 2)   # single-version key


def test_state_diff_kinds(ray_session, tmp_path):
    """inserted / updated / deleted / transient classification between
    watermarks A = max/3 and B = 2*max/3."""
    import pyarrow.parquet as pq2

    from debezium_connector_db2_ray.pipelines.queries import q_state_diff

    # max event_id 90 -> A=30, B=60. turn = id % 20.
    rows = [
        (10, 1, "view"),      # key (1,10): alive before A
        (50, 1, "view"),      #   updated in window      -> updated
        (35, 2, "view"),      # key (2,15): born in window -> inserted
        (12, 3, "view"),      # key (3,12): alive before A
        (52, 3, "error"),     #   deleted in window      -> deleted
        (31, 4, "view"),      # key (4,11): born then
        (51, 4, "error"),     #   killed inside window   -> transient
        (15, 5, "view"),      # key (5,15): untouched in window -> no row
        (90, 6, "view"),      # beyond B: invisible
    ]
    pq2.write_table(_mini_events(rows), str(tmp_path / "events.parquet"))
    got = {(r["conv_id"], r["turn_idx"]): r["kind"]
           for r in q_state_diff(str(tmp_path)).take_all()}
    assert got == {
        ("conv_1", 10): "updated",
        ("conv_2", 15): "inserted",
        ("conv_3", 12): "deleted",
        ("conv_4", 11): "transient",
    }


def test_attach_grouped_count_inner_semantics(ray_session):
    """String-keyed attach: counts repeat across payload rows; keys with
    no count row drop (inner); count-only keys emit nothing."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.text import (
        attach_grouped_count,
    )

    rows = pa.table({
        "k": pa.array(["a", "a", "b", "c"], pa.string()),
        "v": pa.array([1, 2, 3, 4], pa.int64()),
    })
    counts = pa.table({
        "k": pa.array(["a", "b", "z"], pa.string()),
        "n": pa.array([10, 20, 99], pa.int64()),
    })
    got = sorted(
        (r["k"], r["v"], r["cnt"])
        for r in attach_grouped_count(
            rd.from_arrow(rows).repartition(2),
            rd.from_arrow(counts).repartition(2),
            key_col="k", count_col="n", out_col="cnt",
        ).take_all()
    )
    assert got == [("a", 1, 10), ("a", 2, 10), ("b", 3, 20)]


def test_grouped_adjacent_pairs_segments_and_delta(ray_session):
    """Pairs never cross group boundaries, single-row groups emit
    nothing, and the order-col delta is int64 microseconds for
    timestamps."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_adjacent_pairs,
    )

    t = pa.table({
        "u": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "ts": pa.array([100, 300, 200, 50, 9], pa.timestamp("us")),
        "i": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "s": pa.array(["a", "b", "c", "d", "e"]),
    })
    out = grouped_adjacent_pairs(
        rd.from_arrow(t), keys=["u"],
        order_by=[("ts", "ascending"), ("i", "ascending")],
        from_cols=["s"], to_cols=["s"],
        order_col="ts", delta_col="dt",
        schema=t.schema,
    ).to_arrow_refs()
    import ray as _ray
    got = pa.concat_tables([_ray.get(r) for r in out]).to_pylist()
    rows = {(r["u"], r["from_s"], r["to_s"], r["dt"]) for r in got}
    # user 1 sorted by ts: a(100) -> c(200) -> b(300)
    assert rows == {(1, "a", "c", 100), (1, "c", "b", 100)}


def test_grouped_adjacent_pairs_tie_break_and_empty(ray_session):
    """Equal order keys fall back to the tiebreak column; an all-single
    input yields a typed empty result."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_adjacent_pairs,
    )

    t = pa.table({
        "u": pa.array([7, 7], pa.int64()),
        "ts": pa.array([5, 5], pa.int64()),
        "i": pa.array([2, 1], pa.int64()),
        "s": pa.array(["late", "early"]),
    })
    out = grouped_adjacent_pairs(
        rd.from_arrow(t), keys=["u"],
        order_by=[("ts", "ascending"), ("i", "ascending")],
        from_cols=["s"], to_cols=["s"], schema=t.schema,
    ).take_all()
    assert [(r["from_s"], r["to_s"]) for r in out] == [("early", "late")]

    single = pa.table({
        "u": pa.array([1, 2], pa.int64()),
        "ts": pa.array([0, 0], pa.int64()),
        "i": pa.array([0, 1], pa.int64()),
        "s": pa.array(["x", "y"]),
    })
    empty = grouped_adjacent_pairs(
        rd.from_arrow(single), keys=["u"],
        order_by=[("ts", "ascending"), ("i", "ascending")],
        from_cols=["s"], to_cols=["s"], schema=single.schema,
    )
    assert empty.count() == 0


def test_retention_cohorts_tiny(ray_session, tmp_path):
    """Gap weeks produce the right offsets, a user active twice in the
    same week counts once, and the cohort cell count is a plain count
    (the kernel dedups user-weeks before emission)."""
    import datetime as dt

    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.functions.queries import (
        WEEK_US,
        q_retention_cohorts,
    )

    base = dt.datetime(2024, 1, 1)
    wk = dt.timedelta(microseconds=WEEK_US)
    rows = {
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        # u1: week w0 twice + w0+2; u2: w0+1
        "ts": pa.array(
            [base, base + dt.timedelta(days=1), base + 2 * wk, base + wk],
            pa.timestamp("us"),
        ),
    }
    pq.write_table(pa.table(rows), tmp_path / "events.parquet")
    got = {
        (r["cohort_week"], r["week_offset"]): r["users"]
        for r in q_retention_cohorts(str(tmp_path)).take_all()
    }
    w0 = (base - dt.datetime(1970, 1, 1)) // wk
    assert got == {(w0, 0): 1, (w0, 2): 1, (w0 + 1, 0): 1}


def test_emb_gram_matrix_tiny(ray_session, tmp_path):
    """X^T X over two hand-built 64-dim vectors: the three nonzero
    upper-triangle cells carry the exact integer quantized products and
    every other cell is zero (batch-order-independent by construction)."""
    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.functions.queries import (
        EMB_DIM,
        q_emb_gram,
    )

    v0 = [0.0] * EMB_DIM
    v0[0], v0[1] = 1.0, 2.0
    v1 = [0.0] * EMB_DIM
    v1[1] = 3.0
    t = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([v0, v1], pa.list_(pa.float32())),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = {
        (r["i"], r["j"]): r["s"]
        for r in q_emb_gram(str(tmp_path)).take_all()
    }
    assert len(got) == EMB_DIM * (EMB_DIM + 1) // 2
    assert got[(0, 0)] == 1000 * 1000
    assert got[(0, 1)] == 1000 * 2000
    assert got[(1, 1)] == 2000 * 2000 + 3000 * 3000
    assert sum(v for k, v in got.items()
               if k not in {(0, 0), (0, 1), (1, 1)}) == 0


def test_emb_random_projection_tiny(ray_session, tmp_path):
    """The map-only JL projection reproduces q @ R exactly for a basis
    vector: row k of the LCG matrix times the quantized coordinate."""
    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.functions.queries import (
        EMB_DIM,
        RP_OUT,
        _rp_matrix,
        q_emb_randproj,
    )

    v = [0.0] * EMB_DIM
    v[5] = 2.5  # quantizes to 2500
    t = pa.table({
        "vec_id": pa.array([42], pa.int64()),
        "embedding": pa.array([v], pa.list_(pa.float32())),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    (row,) = q_emb_randproj(str(tmp_path)).take_all()
    R = _rp_matrix()
    assert row["vec_id"] == 42
    for j in range(RP_OUT):
        assert row[f"y{j}"] == 2500 * int(R[5, j])


def test_docs_lang_sample_md5_order(ray_session, tmp_path):
    """The stratified sample keeps exactly the k docs with the smallest
    md5(doc_id) per language, and a stratum smaller than k survives
    whole."""
    import hashlib

    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.functions.queries import (
        SAMPLE_PER_LANG,
        q_lang_sample,
    )

    ids = list(range(1, 8))
    t = pa.table({
        "doc_id": pa.array(ids + [100, 101], pa.int64()),
        "lang": pa.array(["en"] * len(ids) + ["fr", "fr"]),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    got = {}
    for r in q_lang_sample(str(tmp_path)).take_all():
        got.setdefault(r["lang"], set()).add(r["doc_id"])
    want_en = set(sorted(
        ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
    )[:SAMPLE_PER_LANG])
    assert got["en"] == want_en
    assert got["fr"] == {100, 101}


def test_emb_covariance_tiny(ray_session, tmp_path):
    """cov_num matches n*Sxy - Sx*Sy computed by hand for three 64-dim
    vectors varying in two dims (and is 0 for constant dims)."""
    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.functions.queries import (
        EMB_DIM,
        q_emb_cov,
    )

    vals0 = [1.0, 2.0, 3.0]   # dim 0
    vals1 = [4.0, 6.0, 5.0]   # dim 1
    vecs = []
    for a, b in zip(vals0, vals1):
        v = [0.0] * EMB_DIM
        v[0], v[1] = a, b
        vecs.append(v)
    t = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = {
        (r["i"], r["j"]): (r["cov_num"], r["n"])
        for r in q_emb_cov(str(tmp_path)).take_all()
    }
    q0 = [int(a * 1000) for a in vals0]
    q1 = [int(b * 1000) for b in vals1]
    n = 3
    want01 = n * sum(a * b for a, b in zip(q0, q1)) - sum(q0) * sum(q1)
    want00 = n * sum(a * a for a in q0) - sum(q0) ** 2
    assert got[(0, 1)] == (want01, n)
    assert got[(0, 0)] == (want00, n)
    assert got[(5, 9)] == (0, n)
    assert len(got) == EMB_DIM * (EMB_DIM + 1) // 2


def test_daily_gapfill_kernel(ray_session, tmp_path):
    """A user with a 3-day hole gets zero-filled rows inside [min, max]
    only; a single-day user emits exactly one row; same-day repeats sum."""
    import datetime as dt

    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.functions.queries import (
        q_daily_gapfill,
    )

    base = dt.datetime(2024, 3, 1)
    day0 = (base - dt.datetime(1970, 1, 1)).days
    rows = {
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array(
            [base, base + dt.timedelta(hours=3),
             base + dt.timedelta(days=4), base],
            pa.timestamp("us"),
        ),
    }
    pq.write_table(pa.table(rows), tmp_path / "events.parquet")
    got = {
        (r["user_id"], r["day"]): r["cnt"]
        for r in q_daily_gapfill(str(tmp_path)).take_all()
    }
    assert got == {
        (1, day0): 2, (1, day0 + 1): 0, (1, day0 + 2): 0,
        (1, day0 + 3): 0, (1, day0 + 4): 1, (2, day0): 1,
    }


def test_last_touch_segment_isolation(ray_session, tmp_path):
    """A previous user's purchase must not leak into the next user's
    first/last-touch fill (regression: a min-accumulate fill kept the
    earlier user's smaller index forever); strictly-preceding semantics:
    a purchase never attributes to itself."""
    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.functions.queries import q_last_touch

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([1, 1, 2, 2, 2, 2], pa.int64()),
        "ts": pa.array([10, 20, 10, 20, 30, 40], pa.timestamp("us")),
        "event_type": pa.array([
            "purchase", "view", "view", "purchase", "view", "purchase",
        ]),
        "value": pa.array([7.0, 0.0, 0.0, 9.0, 0.0, 11.0], pa.float64()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = {
        r["event_id"]: (r["last_purchase_value"], r["first_purchase_value"])
        for r in q_last_touch(str(tmp_path)).take_all()
    }
    assert got[1] == (None, None)          # own purchase not attributed
    assert got[2] == (7.0, 7.0)
    assert got[3] == (None, None)          # no bleed from user 1
    assert got[4] == (None, None)          # purchase row: strictly before
    assert got[5] == (9.0, 9.0)
    assert got[6] == (9.0, 9.0)


def test_hour_dow_profile_epoch_math(ray_session, tmp_path):
    """dow matches DuckDB dayofweek (0=Sunday; 1970-01-01 was Thursday=4)
    and the milli-quantized sum is exact."""
    import datetime as dt

    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.functions.queries import (
        q_hour_dow_profile,
    )

    t = pa.table({
        "ts": pa.array([
            dt.datetime(1970, 1, 1, 5),      # Thursday -> dow 4
            dt.datetime(2024, 3, 3, 23),     # Sunday  -> dow 0
            dt.datetime(2024, 3, 3, 23, 59),
        ], pa.timestamp("us")),
        "value": pa.array([1.0015, 2.0, 3.0], pa.float64()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = {
        (r["dow"], r["hod"]): (r["n_events"], r["value_milli"])
        for r in q_hour_dow_profile(str(tmp_path)).take_all()
    }
    assert got[(4, 5)] == (1, 1002)   # round-half-up at the milli edge
    assert got[(0, 23)] == (2, 5000)


def test_signup_to_purchase_milestones(ray_session, tmp_path):
    """FIRST signup to FIRST purchase; users missing either milestone drop
    out; a purchase before signup yields a negative exact delta."""
    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.functions.queries import (
        q_signup_to_purchase,
    )

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
        "event_type": pa.array([
            "signup", "purchase", "purchase", "signup", "purchase",
            "signup",
        ]),
        "ts": pa.array([100, 250, 400, 10, 50, 90], pa.timestamp("us")),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = {
        r["user_id"]: r["us_to_purchase"]
        for r in q_signup_to_purchase(str(tmp_path)).take_all()
    }
    assert got == {1: 150, 3: -40}


def test_active_backlog_sweep(ray_session, tmp_path):
    """Two overlapping user spans produce the stepped running count with
    deltas only at endpoint days."""
    import datetime as dt

    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.functions.queries import (
        q_active_backlog,
    )

    d = lambda day: dt.datetime(2024, 1, day)
    day1 = (d(1) - dt.datetime(1970, 1, 1)).days
    t = pa.table({
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "ts": pa.array([d(1), d(5), d(3), d(4)], pa.timestamp("us")),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = {
        r["day"]: r["active_users"]
        for r in q_active_backlog(str(tmp_path)).take_all()
    }
    assert got == {day1: 1, day1 + 2: 2, day1 + 4: 1, day1 + 5: 0}


def test_label_cohesion_identity(ray_session, tmp_path):
    """pair_dot_sum equals the brute-force sum over unordered pairs."""
    import itertools

    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.functions.queries import (
        EMB_DIM,
        q_label_cohesion,
    )

    vecs = [
        ([1.0, 2.0], 0), ([3.0, 4.0], 0), ([5.0, 6.0], 0),
        ([1.0, 1.0], 1),
    ]
    rows = []
    for v, lab in vecs:
        full = [0.0] * EMB_DIM
        full[0], full[1] = v
        rows.append((full, lab))
    t = pa.table({
        "vec_id": pa.array(range(len(rows)), pa.int64()),
        "embedding": pa.array([r[0] for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([r[1] for r in rows], pa.int32()),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = {
        r["label"]: (r["n"], r["pair_dot_sum"])
        for r in q_label_cohesion(str(tmp_path)).take_all()
    }
    q = [[int(x * 1000) for x in r[0][:2]] for r in rows[:3]]
    want = sum(
        a[0] * b[0] + a[1] * b[1]
        for a, b in itertools.combinations(q, 2)
    )
    assert got[0] == (3, want)
    assert got[1] == (1, 0)


def test_debounce_segments_and_gaps(ray_session, tmp_path):
    """First event of each (user, type) always kept; an event exactly at
    the cooldown boundary is dropped (strict >); different types don't
    suppress each other."""
    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.functions.queries import (
        DEBOUNCE_US,
        q_debounce,
    )

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["a", "a", "a", "b", "a"]),
        "ts": pa.array(
            [0, DEBOUNCE_US, 2 * DEBOUNCE_US + 1, 1, 2],
            pa.timestamp("us"),
        ),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    kept = sorted(
        r["event_id"] for r in q_debounce(str(tmp_path)).take_all()
    )
    assert kept == [1, 3, 4, 5]


def test_value_buckets_quartiles(ray_session, tmp_path):
    """Eight distinct values split 2/2/2/2 across the four buckets with
    quantile_disc boundary semantics."""
    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.functions.queries import (
        q_value_buckets,
    )

    t = pa.table({
        "event_id": pa.array(range(8), pa.int64()),
        "value": pa.array([1.0, 2, 3, 4, 5, 6, 7, 8], pa.float64()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = {
        r["event_id"]: r["bucket"]
        for r in q_value_buckets(str(tmp_path)).take_all()
    }
    assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3, 5: 3, 6: 4, 7: 4}


def test_mixture_downsample_quota_and_order(ray_session, tmp_path):
    """Quota = ceil(n * ratio) per source; selection follows md5 order of
    doc_id; a one-doc source keeps its doc."""
    import hashlib

    import pyarrow.parquet as pq

    from debezium_connector_db2_ray.functions.queries import (
        q_mixture_downsample,
    )

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "source": pa.array(["a", "a", "a", "b", "c"]),
        "text": pa.array(["x"] * 5),
        "lang": pa.array(["en"] * 5),
        "n_chars": pa.array([1] * 5, pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    got = sorted(
        (r["source"], r["doc_id"])
        for r in q_mixture_downsample(str(tmp_path)).take_all()
    )
    a_keep = sorted(
        [0, 1, 2], key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
    )[:2]  # ceil(3*0.5)=2
    assert got == sorted(
        [("a", i) for i in a_keep] + [("b", 3), ("c", 4)]
    )


def test_cumulative_users_first_touch_only(ray_session):
    """A user active on many days contributes once, at its first day;
    the running total is over per-day NEW users."""
    import ray.data as rd

    import debezium_connector_db2_ray.functions.queries as q

    # reuse the gate pipeline over the fixture, check invariants
    out = q.q_cumulative_users(SF).to_pandas().sort_values("day")
    assert (out["new_users"] > 0).all()
    assert (out["cum_users"].diff().dropna() == out["new_users"][1:]
            .to_numpy()).all()
    import duckdb
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert out["cum_users"].iloc[-1] == n_users


def test_zscore_outliers_matches_manual(ray_session):
    """The broadcast-partials z filter keeps exactly the rows a direct
    NumPy z-score computation keeps."""
    import duckdb

    import debezium_connector_db2_ray.functions.queries as q

    got = q.q_zscore_outliers(SF).to_pandas()
    ev = duckdb.sql(
        f"SELECT event_id, event_type, value FROM "
        f"read_parquet('{SF}/events.parquet')"
    ).fetchdf()
    cents = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    want = set()
    for et in ev["event_type"].unique():
        m = (ev["event_type"] == et).to_numpy()
        x = cents[m].astype(np.float64)
        n, s, ssq = float(m.sum()), float(cents[m].sum()), float(
            (cents[m] * cents[m]).sum()
        )
        keep = (n * x - s) ** 2 > 9.0 * (n * ssq - s * s)
        want |= set(ev["event_id"].to_numpy()[m][keep].tolist())
    assert set(got["event_id"].tolist()) == want
    assert len(want) > 0  # the fixture actually has tails


def test_sliding_distinct_window_membership(ray_session):
    """Every event lands in exactly width/hop = 4 windows and a user seen
    twice inside one window counts once."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_count_distinct,
    )

    import debezium_connector_db2_ray.functions.queries as q

    HOP = 21_600_000_000
    ts = pa.array(
        [1_000 * HOP + 5, 1_000 * HOP + 7, 1_003 * HOP + 1],
        pa.timestamp("us"),
    )
    t = pa.table({
        "user_id": pa.array([42, 42, 42], pa.int64()), "ts": ts,
    })
    import tempfile, os
    import pyarrow.parquet as pq_

    with tempfile.TemporaryDirectory() as d:
        pq_.write_table(
            pa.table({
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": ts,
                "user_id": t["user_id"],
                "event_type": pa.array(["a"] * 3),
                "value": pa.array([1.0] * 3),
                "props": pa.array(["x"] * 3),
            }),
            os.path.join(d, "events.parquet"),
        )
        out = q.q_sliding_distinct(d).to_pandas()
    # event pair at 1000*HOP shares 4 windows; third event at 1003*HOP
    # shares window 1000*HOP (within 24h) and adds 3 of its own.
    got = dict(zip(out["w_start"], out["n_users"]))
    assert len(got) == 7
    assert all(v == 1 for v in got.values())
    assert set(got) == {(1_000 - i) * HOP for i in range(4)} | {
        (1_003 - i) * HOP for i in range(3)
    }


def test_mad_outliers_matches_manual(ray_session):
    """The two-pass median/MAD broadcast filter keeps exactly the rows a
    direct NumPy computation with quantile_disc semantics keeps."""
    import duckdb

    import debezium_connector_db2_ray.functions.queries as q

    got = q.q_mad_outliers(SF).to_pandas()
    ev = duckdb.sql(
        f"SELECT event_id, event_type, value FROM "
        f"read_parquet('{SF}/events.parquet')"
    ).fetchdf()
    cents = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)

    def qdisc(a):
        a = np.sort(a)
        return a[int(np.ceil(0.5 * len(a))) - 1]

    want = set()
    for et in ev["event_type"].unique():
        m = (ev["event_type"] == et).to_numpy()
        med = qdisc(cents[m])
        mad = qdisc(np.abs(cents[m] - med))
        keep = np.abs(cents[m] - med) > 3 * mad
        want |= set(ev["event_id"].to_numpy()[m][keep].tolist())
    assert set(got["event_id"].tolist()) == want and len(want) > 0


def test_type_affinity_closed_form(ray_session):
    """Bitmask-histogram affinity equals the quadratic self-join: inter /
    union per type pair, zero-intersection pairs omitted, users counted
    once no matter how many events."""
    import os
    import tempfile

    import pyarrow.parquet as pq_

    import debezium_connector_db2_ray.functions.queries as q

    t = pa.table({
        "event_id": pa.array(range(7), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000] * 7, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2, 3, 4], pa.int64()),
        "event_type": pa.array(
            ["a", "a", "b", "a", "c", "b", "d"]  # d shares no users
        ),
        "value": pa.array([1.0] * 7),
        "props": pa.array(["x"] * 7),
    })
    with tempfile.TemporaryDirectory() as d:
        pq_.write_table(t, os.path.join(d, "events.parquet"))
        out = q.q_type_affinity(d).to_pandas()
    got = {
        (r.type_a, r.type_b): (r.inter, r.uni)
        for r in out.itertuples()
    }
    # audiences: a={1,2}, b={1,3}, c={2}, d={4}
    assert got == {("a", "b"): (1, 3), ("a", "c"): (1, 2)}
    assert out[(out.type_a == "a") & (out.type_b == "b")][
        "jaccard"
    ].iloc[0] == 1.0 / 3.0


def test_pq_adc_matches_manual(ray_session):
    """ADC distances equal the manual LUT-sum over PQ codes, ranks order
    by (d2, vec_id) with deterministic ties."""
    import ray
    import ray.data as rd

    from debezium_connector_db2_ray.functions.similarity import (
        pq_adc_topk,
        pq_encode,
        sqlparity_codebook,
    )

    rng = np.random.RandomState(7)
    dim, m_sub, kc, sub = 8, 2, 4, 4
    vecs = rng.rand(6, dim) * 2 - 1
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array(
            [list(map(float, v)) for v in vecs],
            pa.list_(pa.float32()),
        ),
    }))
    cb = sqlparity_codebook(m_sub, kc, sub)
    codes_tbl = pq_encode(
        emb, dim=dim, m_sub=m_sub, k=kc, codebook=cb
    ).to_pandas().sort_values("vec_id")
    queries = {"qids": np.array([0, 1]), "matrix": vecs[:2]}
    out = pq_adc_topk(
        rd.from_arrow(pa.Table.from_pandas(codes_tbl)), queries,
        codebook=cb, m_sub=m_sub, sub_dim=sub, k=3,
    ).to_pandas()

    # manual: float32-read vectors quantize identically via the same path
    vq = np.stack([
        np.floor(np.asarray(v, np.float64) * 1000 + 0.5)
        for v in emb.to_pandas()["embedding"]
    ]).astype(np.int64)
    for qx, qid in enumerate([0, 1]):
        lut = np.empty((m_sub, kc), np.int64)
        for s in range(m_sub):
            diff = vq[qid, s * sub:(s + 1) * sub][None, :] - cb[s]
            lut[s] = (diff * diff).sum(axis=1)
        codes = codes_tbl[["c0", "c1"]].to_numpy()
        d2 = lut[0][codes[:, 0]] + lut[1][codes[:, 1]]
        order = np.lexsort((codes_tbl["vec_id"].to_numpy(), d2))[:3]
        want = codes_tbl["vec_id"].to_numpy()[order].tolist()
        got = out[out.query_id == qid].sort_values("rank")[
            "vec_id"
        ].tolist()
        assert got == want


def test_rfm_scores_invariants(ray_session):
    """RFM scores lie in 1..4, the 3-digit segment recomposes from its
    digits, and each dimension's quartile-1 bucket is non-empty (the
    boundary element itself always scores 1)."""
    import debezium_connector_db2_ray.functions.queries as q

    out = q.q_rfm_scores(SF).to_pandas()
    for c in ("r_score", "f_score", "m_score"):
        assert out[c].between(1, 4).all()
        assert (out[c] == 1).any()
    assert (
        out["rfm"]
        == out["r_score"] * 100 + out["f_score"] * 10 + out["m_score"]
    ).all()


def test_whitening_from_gram_identity_covariance(ray_session):
    """The whitening transform built from the distributed Gram op's
    output leaves the (whitened) sample covariance ~ identity, and
    whiten_apply's map-only projection matches driver-side math."""
    import duckdb

    import debezium_connector_db2_ray.functions.queries as q
    from debezium_connector_db2_ray.functions.similarity import (
        whiten_apply,
        whitening_from_gram,
    )

    tri = q.q_emb_gram(SF).to_pandas()
    d = 64
    g = np.zeros((d, d))
    g[tri["i"], tri["j"]] = tri["s"]
    g[tri["j"], tri["i"]] = tri["s"]
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).fetchdf()
    x = np.stack([
        np.floor(np.asarray(v, np.float64) * 1000 + 0.5)
        for v in emb["embedding"]
    ])
    n = len(x)
    w, mean = whitening_from_gram(g, n, sum_vec=x.sum(axis=0), eps=1e-9)
    y = (x - mean) @ w
    cov = (y.T @ y) / n
    assert np.allclose(cov, np.eye(d), atol=1e-3)

    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/embeddings.parquet")

    def to_milli(b: pa.Table) -> pa.Table:
        m = np.stack([np.asarray(v, np.float64)
                      for v in b["embedding"].to_pylist()])
        qm = np.floor(m * 1000 + 0.5)
        return pa.table({
            "vec_id": b["vec_id"],
            "embedding": pa.array(
                [r.tolist() for r in qm.astype(np.float32)],
                pa.list_(pa.float32()),
            ),
        })

    out = whiten_apply(
        ds.map_batches(to_milli, batch_format="pyarrow"), w, mean
    ).to_pandas().sort_values("vec_id")
    got = np.stack([np.asarray(v, np.float64)
                    for v in out["whitened"]])
    assert np.allclose(got, y, atol=1e-2)


def test_weighted_sample_exact_k_and_upsampling(ray_session):
    """Total picks equal exactly k, and a doc heavier than W/k is picked
    with multiplicity (systematic-sampling semantics)."""
    import os
    import tempfile

    import pyarrow.parquet as pq_

    import debezium_connector_db2_ray.functions.queries as q

    out = q.q_weighted_sample(SF).to_pandas()
    assert out["n_picks"].sum() == q.WSAMPLE_K
    assert (out["n_picks"] >= 1).all()

    # synthetic: one doc holds ~half the mass -> multiplicity >= 2
    t = pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(["x"] * 10),
        "lang": pa.array(["en"] * 10),
        "source": pa.array(["s"] * 10),
        "n_chars": pa.array([1000] + [20] * 9, pa.int64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq_.write_table(t, os.path.join(d, "documents.parquet"))
        heavy = q.q_weighted_sample(d).to_pandas()
    assert heavy["n_picks"].sum() == q.WSAMPLE_K
    assert heavy.loc[heavy.doc_id == 0, "n_picks"].iloc[0] >= 2


def test_ivm_deltas_equal_recomputed_view(ray_session):
    """The IVM identity: snapshot-time view + sum of signed envelope
    deltas == the view recomputed from the replayed final state, on a
    generated scenario whose before-images are true prior values
    (update pairs only — single-image op-5 updates are not
    self-maintainable without a state lookup, which is exactly why the
    reference emits full before images for captured tables)."""
    import pandas as pd

    from debezium_connector_db2_ray.ops import OP_DELETE, OP_UPDATE_BEFORE
    from debezium_connector_db2_ray.pipelines.oracle import oracle_apply
    from debezium_connector_db2_ray.sources.genlog import generate_scenario
    from debezium_connector_db2_ray.stages.envelope import (
        ivm_signed_deltas,
        to_envelopes,
    )

    # update/delete weights: the generator then only INSERTs into a
    # conversation whose keys are all deleted, so every 'c' is a true
    # insert — an upsert-style insert onto a live key (which the LWW
    # engine tolerates) is NOT self-maintainable without a state lookup,
    # same as op-5 single-image updates.
    sc = generate_scenario(
        n_convs=25, turns_per_conv=5, n_commits=400, seed=11,
        op_weights={OP_UPDATE_BEFORE: 0.55, OP_DELETE: 0.45},
    )
    env = to_envelopes(sc.ordered_changelog, image_columns=("text",))
    chars = ivm_signed_deltas(
        env, group_cols=("conv_id",), before_col="before_text",
        after_col="after_text", measure="length",
    ).to_pandas().groupby("conv_id")["delta"].sum()
    rows = ivm_signed_deltas(
        env, group_cols=("conv_id",), before_col="before_text",
        after_col="after_text", measure="count",
    ).to_pandas().groupby("conv_id")["delta"].sum()

    lake = sc.lake.to_pandas()
    base_chars = lake.assign(
        n=lake["text"].fillna("").str.len()
    ).groupby("conv_id")["n"].sum()
    base_rows = lake.groupby("conv_id").size()

    final = oracle_apply(
        sc.lake, sc.ordered_changelog, sc.snapshot_lsn
    ).to_pandas()
    want_chars = final.assign(
        n=final["text"].fillna("").str.len()
    ).groupby("conv_id")["n"].sum()
    want_rows = final.groupby("conv_id").size()

    got_chars = base_chars.add(chars, fill_value=0)
    got_rows = base_rows.add(rows, fill_value=0)
    # conversations whose rows all deleted drop out of `final`
    got_chars = got_chars[got_chars.index.isin(want_chars.index) |
                          (got_rows > 0)]
    for conv in want_chars.index:
        assert got_chars.get(conv, 0) == want_chars[conv], conv
        assert got_rows.get(conv, 0) == want_rows[conv], conv
    # and nothing extra survives with rows > 0
    extra = got_rows[(got_rows > 0) & ~got_rows.index.isin(
        want_rows.index
    )]
    assert extra.empty


def test_message_filter_predicates():
    """Filter SMT: topic regex is anchored and NULL-safe; negate inverts;
    is_tombstone requires EVERY listed column NULL."""
    from debezium_connector_db2_ray.stages.envelope import message_filter

    t = pa.table({
        "topic": pa.array(["cdc.a", "cdc.ab", "audit.a", None]),
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "p1": pa.array(["x", None, None, None]),
        "p2": pa.array([None, "y", None, "z"]),
    })
    # drop records whose topic matches cdc\..* (anchored full match)
    kept = message_filter(t, predicate="topic_matches",
                          pattern="cdc\\..*")
    assert kept["k"].to_pylist() == [3, 4]  # NULL topic never matches
    # negate: keep ONLY the matching topics (NULL still dropped)
    kept = message_filter(t, predicate="topic_matches",
                          pattern="cdc\\..*", negate=True)
    assert kept["k"].to_pylist() == [1, 2]
    # anchoring: 'cdc.a' as a bare pattern must not match 'cdc.ab'
    kept = message_filter(t, predicate="topic_matches",
                          pattern="cdc\\.a", negate=True)
    assert kept["k"].to_pylist() == [1]
    # tombstone: all listed payload columns NULL (row 3 only)
    kept = message_filter(t, predicate="is_tombstone",
                          tombstone_cols=("p1", "p2"))
    assert kept["k"].to_pylist() == [1, 2, 4]


def test_basket_pair_kernel_edges(ray_session):
    """Basket pair mining: single-item baskets emit nothing, duplicate
    (order, part) rows dedupe before pairing, pairs are p1 < p2."""
    import ray.data as rd

    import debezium_connector_db2_ray.functions.queries as q

    t = pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
        "l_partkey": pa.array([10, 20, 10, 30, 10, 20], pa.int64()),
    })
    import os
    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "lineitem.parquet"))
        out = q.DATA_QUERIES["orders_basket_pairs"](d).to_pandas()
    # baskets: {10,20} (order 1, dup 10 deduped), {30} (nothing),
    # {10,20} (order 3) -> pair (10,20) support 2 >= threshold
    assert out.to_dict("records") == [
        {"p1": 10, "p2": 20, "support": 2}
    ]


def test_session_gap_boundary(ray_session):
    """Sessionize: a gap of exactly the threshold stays in-session
    (> semantics, mirroring the oracle's INTERVAL compare)."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    import debezium_connector_db2_ray.functions.queries as q

    gap = q.SESSION_GAP_MIN * 60_000_000
    ts = pa.array(
        np.array([0, gap, 2 * gap, 3 * gap + 1], np.int64),
        pa.timestamp("us"),
    )
    t = pa.table({
        "user_id": pa.array([7, 7, 7, 7], pa.int64()),
        "ts": ts,
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "event_type": pa.array(
            ["click", "click", "purchase", "view"]
        ),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = q.DATA_QUERIES["events_session_paths"](d).to_pandas()
    rows = {(r["path"], r["n_sessions"])
            for r in out.to_dict("records")}
    # first three events chain with exact-gap spacing -> one session
    # 'ccp'; the fourth arrives gap+1 after -> its own session 'v'
    assert rows == {("ccp", 1), ("v", 1)}


def test_ltv_decay_shift_cap():
    """The decay shift k caps at LTV_MAX_SHIFT so ancient events cannot
    produce an invalid >63-bit shift."""
    import debezium_connector_db2_ray.functions.queries as q

    md = 1000
    day = np.array([1000, 1000 - 70 * q.LTV_HALFLIFE_DAYS], np.int64)
    k = np.minimum((md - day) // q.LTV_HALFLIFE_DAYS, q.LTV_MAX_SHIFT)
    assert k.tolist() == [0, q.LTV_MAX_SHIFT]
    vc = np.array([12345, np.int64(2) ** 62], np.int64)
    assert (vc >> k).tolist() == [12345, 1]


def test_grouped_nth_value_short_groups(ray_session):
    """nth_value: groups shorter than nth yield NULL for every row;
    order ties break on the secondary key."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_nth_value,
    )

    t = pa.table({
        "g": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
        "o": pa.array([2, 1, 3, 1, 1, 1], pa.int64()),
        "tie": pa.array([0, 0, 0, 0, 5, 4], pa.int64()),
        "v": pa.array([20, 10, 30, 99, 7, 8], pa.int64()),
    })
    out = grouped_nth_value(
        rd.from_arrow(t), keys=["g"],
        order_by=[("o", "ascending"), ("tie", "ascending")],
        col="v", nth=2, out_col="nv", schema=t.schema,
    ).to_pandas().sort_values(["g", "o", "tie"]).reset_index(drop=True)
    got = list(out["nv"].astype("Int64"))
    # g=1 ordered values [10,20,30] -> 2nd = 20 for all rows
    # g=2 has one row -> NULL; g=3 tie-ordered [8,7] -> 2nd = 7
    assert got == [20, 20, 20] + [pd_na()] + [7, 7]


def pd_na():
    import pandas as pd

    return pd.NA


def test_hoist_extract_roundtrip_null_safety():
    """HoistField then ExtractField is the identity on the field,
    including NULL values inside the struct."""
    from debezium_connector_db2_ray.stages.envelope import (
        extract_field,
        hoist_field,
    )

    t = pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "a": pa.array(["x", None, "z"]),
        "b": pa.array([10, 20, None], pa.int64()),
    })
    h = hoist_field(t, fields=("a", "b"), into="payload")
    assert h.column_names == ["k", "payload"]
    assert pa.types.is_struct(h["payload"].type)
    e = extract_field(h, source="payload", field="a", out_col="a2")
    e = extract_field(e, source="payload", field="b", out_col="b2")
    assert e["a2"].to_pylist() == ["x", None, "z"]
    assert e["b2"].to_pylist() == [10, 20, None]


def test_session_stats_fold_matches_recompute(ray_session):
    """The single-kernel session fold (reduceat per user) agrees with a
    naive per-user recompute on a crafted multi-user, multi-session
    fixture."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    import debezium_connector_db2_ray.functions.queries as q

    gap = q.SESSION_GAP_MIN * 60_000_000
    # user 1: sessions of sizes 2, 1; user 2: one session of 3
    ts = np.array([
        0, 10, 10 + gap + 1,          # user 1
        5, 6, 7,                      # user 2
    ], np.int64)
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = (
            q.DATA_QUERIES["user_session_stats"](d)
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
    assert out.to_dict("records") == [
        {"user_id": 1, "n_sessions": 2, "n_events": 3,
         "longest_session": 2},
        {"user_id": 2, "n_sessions": 1, "n_events": 3,
         "longest_session": 3},
    ]


def test_pagerank_broadcast_matches_repartition(ray_session):
    """pagerank's auto-switched broadcast-rank path (small node count)
    agrees with the repartition-join scale path on quantized ranks."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import pagerank

    # undirected triangle + pendant: both directions per edge
    e = [(1, 2), (2, 3), (3, 1), (3, 4)]
    edges = pa.table({
        "src": pa.array([a for a, b in e] + [b for a, b in e], pa.int64()),
        "dst": pa.array([b for a, b in e] + [a for a, b in e], pa.int64()),
    })
    def run(budget):
        out = pagerank(
            rd.from_arrow(edges), iters=3, num_partitions=2,
            broadcast_nodes_budget=budget,
        ).to_pandas().sort_values("node").reset_index(drop=True)
        return out

    bc = run(1_000_000)   # broadcast path (4 nodes << budget)
    rp = run(0)           # forced repartition path
    assert list(bc["node"]) == list(rp["node"]) == [1, 2, 3, 4]
    assert np.allclose(bc["r"], rp["r"], rtol=0, atol=1e-12)
    # sanity: the high-degree node outranks the pendant
    r = dict(zip(bc["node"], bc["r"]))
    assert r[3] > r[4] and abs(sum(r.values()) - 1.0) < 1e-9


def test_mg_batched_decrement_superset():
    """The batched Misra-Gries step (subtract the (k+1)-th largest
    count) keeps every key whose batch count exceeds n_batch/(k+1) —
    the mergeable-summaries guarantee the two-pass heavy-hitter op
    relies on."""
    import debezium_connector_db2_ray.functions.queries as q

    rng_keys = np.concatenate([
        np.repeat(np.int64(7), 500),          # heavy
        np.repeat(np.int64(11), 200),         # heavy
        np.arange(1000, 1000 + 400),          # 400 singletons
    ])
    t = pa.table({"user_id": pa.array(rng_keys, pa.int64())})
    # call the per-batch partial through the registered query's closure:
    # rebuild it directly — the kernel is deterministic numpy
    uniq, cnt = np.unique(rng_keys, return_counts=True)
    k = q.MG_CAPACITY
    if len(uniq) > k:
        kth = np.partition(cnt, len(cnt) - k - 1)[len(cnt) - k - 1]
        keep = cnt > kth
        uniq2, cnt2 = uniq[keep], cnt[keep] - kth
    n = len(rng_keys)
    bound = n / (k + 1)
    for key, c in zip(uniq, cnt):
        if c > bound:
            assert key in uniq2, f"heavy key {key} lost by MG step"
    assert len(uniq2) <= k
    # survivors' weights are undercounts, never overcounts
    surv = dict(zip(uniq2, cnt2))
    for key, w in surv.items():
        true = int(cnt[np.searchsorted(uniq, key)])
        assert 0 < w <= true


def test_grouped_percentiles_interpolate_edges(ray_session):
    """interpolate mode: single-value groups return that value, even
    splits blend halfway, all-null groups stay NULL."""
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import (
        grouped_percentiles,
    )

    t = pa.table({
        "g": pa.array([1, 2, 2, 3], pa.int64()),
        "v": pa.array([10, 10, 20, None], pa.int64()),
    })
    out = grouped_percentiles(
        rd.from_arrow(t), keys=["g"], col="v", qs={"p50": 0.5},
        interpolate=True, schema=t.schema,
    ).to_pandas().sort_values("g").reset_index(drop=True)
    assert out["p50"][0] == 10.0          # m=1 -> the value itself
    assert out["p50"][1] == 15.0          # blend of 10 and 20 at f=0.5
    assert np.isnan(out["p50"][2])        # all-null group -> NULL


def test_dedup_by_source_join_path_matches_broadcast(ray_session):
    """Forcing the over-budget repartition-join path produces the same
    per-source survivorship report as the broadcast path."""
    import debezium_connector_db2_ray.functions.queries as q

    sf = "/root/testdata/sf0.001"
    a = q.DATA_QUERIES["dedup_by_source"](sf)
    a = (a.to_pandas() if hasattr(a, "to_pandas") else a)
    a = a.sort_values("source").reset_index(drop=True)
    old = q.DEDUP_REPORT_BROADCAST_CAP
    q.DEDUP_REPORT_BROADCAST_CAP = 0
    try:
        b = q.DATA_QUERIES["dedup_by_source"](sf)
        b = (b.to_pandas() if hasattr(b, "to_pandas") else b)
        b = b.sort_values("source").reset_index(drop=True)
    finally:
        q.DEDUP_REPORT_BROADCAST_CAP = old
    import pandas as pd

    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_compression_ratio_pytest_oracle(ray_session):
    """The compression-ratio stage matches a direct zlib recompute and
    flags a planted highly-repetitive document."""
    import zlib

    import debezium_connector_db2_ray.functions.queries as q

    sf = "/root/testdata/sf0.001"
    out = (
        q.DATA_QUERIES["docs_compression_ratio"](sf)
        .to_pandas().set_index("doc_id")
    )
    import pyarrow.parquet as pq_

    docs = pq_.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().set_index("doc_id")
    for did in list(docs.index[:50]):
        t = docs.loc[did, "text"]
        exp = (
            1.0 if not t else
            len(zlib.compress(t.encode("utf-8"), 6))
            / len(t.encode("utf-8"))
        )
        assert out.loc[did, "compressed_ratio"] == exp
    # planted repetition compresses under the flag threshold
    rep = "spam ham " * 500
    from debezium_connector_db2_ray.functions.text import (
        compression_ratio_batch,
    )

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([rep])})
    r = compression_ratio_batch(t)
    assert bool(r["too_repetitive"][0].as_py())
