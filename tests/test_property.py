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
