"""Property-based conformance: randomized scenarios must match the
single-threaded oracle under any partitioning/salting (hypothesis over the
generator's parameter space; the reference has no property tests — this is
the graft's stronger replacement for its golden-envelope ITs)."""

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from debezium_connector_db2_ray.ops import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_BEFORE,
    OP_UPDATE_SINGLE,
)
from debezium_connector_db2_ray.pipelines.oracle import oracle_apply
from debezium_connector_db2_ray.sources.genlog import generate_scenario
from debezium_connector_db2_ray.stages.apply import apply_partition, final_state


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    seed=st.integers(0, 10_000),
    n_convs=st.integers(2, 25),
    turns=st.integers(1, 6),
    n_commits=st.integers(10, 250),
    hot=st.floats(0.0, 0.9),
    w_ins=st.floats(0.05, 1.0),
    w_pair=st.floats(0.0, 1.0),
    w_single=st.floats(0.0, 1.0),
    w_del=st.floats(0.0, 1.0),
    fence_events=st.integers(0, 10),
)
def test_random_scenarios_match_oracle(
    seed, n_convs, turns, n_commits, hot, w_ins, w_pair, w_single, w_del,
    fence_events,
):
    sc = generate_scenario(
        n_convs=n_convs,
        turns_per_conv=turns,
        n_commits=n_commits,
        seed=seed,
        hot_fraction=hot,
        op_weights={
            OP_INSERT: w_ins,
            OP_UPDATE_BEFORE: w_pair,
            OP_UPDATE_SINGLE: w_single,
            OP_DELETE: w_del,
        },
        events_at_fence=min(fence_events, n_commits),
        shuffle_delivery=True,
    )
    expected = oracle_apply(sc.lake, sc.ordered_changelog, sc.snapshot_lsn)
    got = final_state(
        apply_partition(sc.changelog, sc.lake, snapshot_lsn=sc.snapshot_lsn)
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.select(expected.column_names).equals(expected)


def test_composite_key_extension():
    """Incremental-snapshot composite-key analog (FIXTURES: 4-column key):
    LWW under an EXTENDED key (conv_id, turn_idx, role) still partitions
    correctly by the (conv_id, turn_idx) prefix."""
    from debezium_connector_db2_ray.stages.apply import lww_collapse

    from .test_apply import mklog

    log = mklog(
        [
            (1001, 1, OP_INSERT, "a", 0, "u-text"),
            (1002, 2, OP_INSERT, "a", 0, "u-text2"),
        ]
    )
    # same (conv, turn) but distinct role values -> both survive under the
    # extended key; under the default key only the latest survives
    roles = pa.array(["user", "assistant"], pa.string())
    log = log.set_column(log.column_names.index("role"), "role", roles)
    assert lww_collapse(log).num_rows == 1
    out = lww_collapse(log, key_columns=("conv_id", "turn_idx", "role"))
    assert out.num_rows == 2


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000), n_keys=st.integers(1, 6),
       n_left=st.integers(1, 60), n_right=st.integers(0, 40))
def test_asof_join_matches_bruteforce(ray_session, seed, n_keys, n_left, n_right):
    """asof_join == per-row brute force under random keys/timestamps
    (including duplicate timestamps and keys with no right rows)."""
    import numpy as np
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import asof_join

    rng = np.random.default_rng(seed)
    lk = rng.integers(0, n_keys, n_left)
    lt = rng.integers(0, 50, n_left)
    rk = rng.integers(0, n_keys, n_right)
    rt = rng.integers(0, 50, n_right)
    # right unique per (key, ts): keep max rid
    seen = {}
    for i, (k, t) in enumerate(zip(rk, rt)):
        seen[(int(k), int(t))] = i
    rrows = sorted(seen.items())
    left = pa.table(
        {
            "lid": pa.array(range(n_left), pa.int64()),
            "k": pa.array(lk, pa.int64()),
            "t": pa.array(lt, pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([k for (k, _), _ in rrows], pa.int64()),
            "t": pa.array([t for (_, t), _ in rrows], pa.int64()),
            "rid": pa.array([i for _, i in rrows], pa.int64()),
        }
    )
    got = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            rd.from_arrow(left), rd.from_arrow(right),
            key="k", ts="t", value_cols=("rid",), num_partitions=3,
        ).take_all()
    }
    for i in range(n_left):
        cands = [
            rid for (k, t), rid in rrows if k == lk[i] and t <= lt[i]
        ]
        # latest ts wins (unique per (key, ts) so the max-ts candidate is it)
        want = None
        if cands:
            best_t = max(t for (k, t), rid in rrows
                         if k == lk[i] and t <= lt[i])
            want = seen[(int(lk[i]), int(best_t))]
        assert got[i] == want, (i, got[i], want)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000), n_keys=st.integers(1, 5),
       n_points=st.integers(1, 50), n_iv=st.integers(0, 8))
def test_interval_join_matches_bruteforce(ray_session, seed, n_keys, n_points, n_iv):
    """interval_join == per-row brute force for non-overlapping intervals."""
    import numpy as np
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import interval_join

    rng = np.random.default_rng(seed)
    # non-overlapping intervals per key
    ivs = []
    for k in range(n_keys):
        cur = 0
        for j in range(n_iv):
            start = cur + int(rng.integers(1, 5))
            end = start + int(rng.integers(0, 6))
            ivs.append((k, start, end, len(ivs)))
            cur = end + 1
    pk = rng.integers(0, n_keys, n_points)
    pt = rng.integers(0, 60, n_points)
    points = pa.table(
        {
            "pid": pa.array(range(n_points), pa.int64()),
            "k": pa.array(pk, pa.int64()),
            "t": pa.array(pt, pa.int64()),
        }
    )
    intervals = pa.table(
        {
            "k": pa.array([k for k, _, _, _ in ivs], pa.int64()),
            "s": pa.array([s for _, s, _, _ in ivs], pa.int64()),
            "e": pa.array([e for _, _, e, _ in ivs], pa.int64()),
            "ivid": pa.array([i for _, _, _, i in ivs], pa.int64()),
        }
    )
    got = {
        r["pid"]: r["iv_ivid"]
        for r in interval_join(
            rd.from_arrow(points), rd.from_arrow(intervals),
            key="k", ts="t", start="s", end="e", value_cols=("ivid",),
            num_partitions=3,
        ).take_all()
    }
    for i in range(n_points):
        want = None
        for k, s, e, ivid in ivs:
            if k == pk[i] and s <= pt[i] <= e:
                want = ivid
        assert got[i] == want, (i, got[i], want)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000), n_keys=st.integers(1, 8),
       n_left=st.integers(0, 50), n_right=st.integers(0, 30),
       how=st.sampled_from(["inner", "left_outer"]))
def test_repartition_join_matches_bruteforce(ray_session, seed, n_keys,
                                             n_left, n_right, how):
    import numpy as np
    import ray.data as rd

    from debezium_connector_db2_ray.functions.relational import repartition_join

    rng = np.random.default_rng(seed)
    lk = rng.integers(0, n_keys, n_left)
    rk = rng.integers(0, n_keys, n_right)
    left = pa.table(
        {"k": pa.array(lk, pa.int64()), "lv": pa.array(range(n_left), pa.int64())}
    )
    right = pa.table(
        {"k": pa.array(rk, pa.int64()), "rv": pa.array(range(n_right), pa.int64())}
    )
    got = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in repartition_join(
            rd.from_arrow(left), rd.from_arrow(right), on="k", how=how,
            num_partitions=3,
        ).take_all()
    )
    want = []
    for i in range(n_left):
        matches = [j for j in range(n_right) if rk[j] == lk[i]]
        if matches:
            want += [(int(lk[i]), i, j) for j in matches]
        elif how == "left_outer":
            want.append((int(lk[i]), i, None))
    assert got == sorted(want)
