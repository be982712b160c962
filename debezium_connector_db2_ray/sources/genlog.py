"""Deterministic synthetic transcript lake + CDC change log.

Mirrors the reference test fixtures' shape (small tables + DML bursts,
e.g. Db2ConnectorIT.java:70-75 tablea/tableb inserts, :104-158 deletes,
:161-257 PK move) transposed onto the transcript payload
``(conv_id, turn_idx, role, text, tool, ts)``.

Generator invariants (FIXTURES.md §2):
- ``(commit_lsn, intent_lsn)`` strictly increasing at generation time;
  delivery order can be SHUFFLED to exercise order-insensitivity of the
  last-writer-wins apply.
- every op=3 (UPDATE_BEFORE) row is immediately followed in LSN order by an
  op=4 (UPDATE_AFTER) row for the same key within the same commit_lsn
  (reference pairing rule: Db2StreamingChangeEventSource.java:254-264);
  op=5 rows stand alone (z/OS single-image update, :266-274).
- snapshot fence: the lake represents state at ``snapshot_lsn``; streaming
  events all carry commit_lsn > snapshot_lsn unless a fence-test asks
  otherwise.
- skew knob: a fraction of events concentrated on few hot conv_ids.

Everything is seeded numpy — no external data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from debezium_connector_db2_ray.lsn import Lsn
from debezium_connector_db2_ray.ops import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_AFTER,
    OP_UPDATE_BEFORE,
    OP_UPDATE_SINGLE,
)
from debezium_connector_db2_ray.schema import PAYLOAD_SCHEMA, changelog_schema

EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00 in microseconds

ROLES = ("user", "assistant", "tool")
TOOLS = (None, "search", "python", "browser")


def conv_name(i: int) -> str:
    return f"conv_{i:06d}"


def generate_lake(n_convs: int, turns_per_conv: int, seed: int = 42) -> pa.Table:
    """Initial snapshot state: every conv has turns 0..turns_per_conv-1."""
    rng = np.random.default_rng(seed)
    n = n_convs * turns_per_conv
    conv_idx = np.repeat(np.arange(n_convs), turns_per_conv)
    turn = np.tile(np.arange(turns_per_conv, dtype=np.int32), n_convs)
    role = np.array(ROLES)[turn % len(ROLES)]
    tool_pick = rng.integers(0, len(TOOLS), n)
    text = np.char.add(
        np.char.add("snap text ", conv_idx.astype("U10")), np.char.add(" t", turn.astype("U6"))
    )
    ts = (EPOCH_US + np.arange(n, dtype=np.int64) * 1_000_000).astype("datetime64[us]")
    return pa.table(
        {
            "conv_id": np.char.add("conv_", np.char.zfill(conv_idx.astype("U10"), 6)),
            "turn_idx": turn,
            "role": role,
            "text": text,
            "tool": pa.array([TOOLS[i] for i in tool_pick], pa.string()),
            "ts": ts,
        },
        schema=PAYLOAD_SCHEMA,
    )


@dataclass
class Scenario:
    """A generated replay scenario: lake + change log + fence."""

    lake: pa.Table
    changelog: pa.Table  # delivery order (possibly shuffled)
    snapshot_lsn: Lsn
    max_lsn: Lsn
    ordered_changelog: pa.Table = field(repr=False, default=None)  # generation (LSN) order


def generate_scenario(
    n_convs: int = 50,
    turns_per_conv: int = 8,
    n_commits: int = 500,
    seed: int = 42,
    *,
    op_weights: dict[int, float] | None = None,
    hot_fraction: float = 0.0,  # fraction of commits hitting the single hot conv
    shuffle_delivery: bool = True,
    snapshot_lsn: Lsn = Lsn(0, 1000),
    add_column_after: float | None = None,  # fraction of commits after which 'lang' appears
    events_at_fence: int = 0,  # commits placed AT snapshot_lsn (fence test: must be skipped)
) -> Scenario:
    """Stateful generation: before-images are the TRUE old row values, as the
    reference's capture process would produce. Test scale (<= ~1e6 events)."""
    rng = np.random.default_rng(seed)
    lake = generate_lake(n_convs, turns_per_conv, seed)
    # current state mirror for true before-images
    state: dict[tuple[str, int], tuple] = {}
    for r in lake.to_pylist():
        state[(r["conv_id"], r["turn_idx"])] = (r["role"], r["text"], r["tool"], r["ts"])

    weights = op_weights or {
        OP_INSERT: 0.35,
        OP_UPDATE_BEFORE: 0.25,  # emitted as a 3+4 pair
        OP_UPDATE_SINGLE: 0.2,
        OP_DELETE: 0.2,
    }
    ops_pool = np.array(list(weights))
    probs = np.array(list(weights.values()), dtype=float)
    probs /= probs.sum()

    rows: list[tuple] = []  # (chi, clo, ihi, ilo, op, conv, turn, role, text, tool, ts)
    lsn = snapshot_lsn
    boundary_commit = (
        int(n_commits * add_column_after) if add_column_after is not None else None
    )
    intent_counter = 0
    max_turn = turns_per_conv + max(4, n_commits // max(1, n_convs))

    for c in range(n_commits):
        at_fence = c < events_at_fence
        if not at_fence:
            lsn = lsn.increment()
        commit = snapshot_lsn if at_fence else lsn
        if hot_fraction and rng.random() < hot_fraction:
            ci = 0  # hot conversation
        else:
            ci = int(rng.integers(0, n_convs))
        conv = conv_name(ci)
        op = int(rng.choice(ops_pool, p=probs))
        ts_val = np.datetime64(EPOCH_US + (10_000_000 + c) * 1_000_000, "us")
        lang = None
        if boundary_commit is not None and c >= boundary_commit:
            lang = "en" if c % 3 else "fr"

        def emit(op_, turn_, role_, text_, tool_):
            nonlocal intent_counter
            intent_counter += 1
            rows.append(
                (
                    commit.hi,
                    commit.lo,
                    0,
                    intent_counter,
                    op_,
                    conv,
                    turn_,
                    role_,
                    text_,
                    tool_,
                    ts_val,
                    lang,
                )
            )

        existing = [k for k in state if k[0] == conv]
        if op == OP_INSERT or not existing:
            turn = int(rng.integers(0, max_turn))
            role = ROLES[turn % 3]
            text = f"ins {conv} t{turn} c{c}"
            tool = TOOLS[c % 4]
            emit(OP_INSERT, turn, role, text, tool)
            state[(conv, turn)] = (role, text, tool, ts_val)
        elif op == OP_DELETE:
            key = existing[int(rng.integers(0, len(existing)))]
            role, text, tool, _ = state.pop(key)
            emit(OP_DELETE, key[1], role, text, tool)  # before image
        elif op == OP_UPDATE_SINGLE:
            key = existing[int(rng.integers(0, len(existing)))]
            role = ROLES[c % 3]
            text = f"upd5 {conv} t{key[1]} c{c}"
            tool = TOOLS[(c + 1) % 4]
            emit(OP_UPDATE_SINGLE, key[1], role, text, tool)
            state[key] = (role, text, tool, ts_val)
        else:  # paired update 3 then 4, same commit, consecutive intents
            key = existing[int(rng.integers(0, len(existing)))]
            old_role, old_text, old_tool, _ = state[key]
            emit(OP_UPDATE_BEFORE, key[1], old_role, old_text, old_tool)
            role = ROLES[(c + 1) % 3]
            text = f"upd {conv} t{key[1]} c{c}"
            tool = TOOLS[(c + 2) % 4]
            emit(OP_UPDATE_AFTER, key[1], role, text, tool)
            state[key] = (role, text, tool, ts_val)

    payload = PAYLOAD_SCHEMA
    if boundary_commit is not None:
        payload = payload.append(pa.field("lang", pa.string()))
    schema = changelog_schema(payload)
    cols = list(zip(*rows)) if rows else [[] for _ in schema.names]
    arrays = [
        pa.array(cols[0], pa.uint64()),
        pa.array(cols[1], pa.uint64()),
        pa.array(cols[2], pa.uint64()),
        pa.array(cols[3], pa.uint64()),
        pa.array(cols[4], pa.int8()),
        pa.array(cols[5], pa.string()),
        pa.array(cols[6], pa.int32()),
        pa.array(cols[7], pa.string()),
        pa.array(cols[8], pa.string()),
        pa.array(cols[9], pa.string()),
        pa.array(cols[10], pa.timestamp("us")),
    ]
    if boundary_commit is not None:
        arrays.append(pa.array(cols[11], pa.string()))
    else:
        schema = changelog_schema(PAYLOAD_SCHEMA)
    ordered = pa.Table.from_arrays(arrays, schema=schema)

    delivered = ordered
    if shuffle_delivery and ordered.num_rows:
        perm = np.random.default_rng(seed + 1).permutation(ordered.num_rows)
        delivered = ordered.take(perm)
    return Scenario(
        lake=lake,
        changelog=delivered,
        snapshot_lsn=snapshot_lsn,
        max_lsn=lsn,
        ordered_changelog=ordered,
    )


def generate_changelog_fast(
    n_events: int,
    n_convs: int,
    turns_per_conv: int,
    seed: int = 42,
    *,
    snapshot_lsn: Lsn = Lsn(0, 1000),
    hot_fraction: float = 0.05,
    update_pair_fraction: float = 0.3,
) -> tuple[pa.Table, Lsn]:
    """Fully-vectorized generator for benchmark scale (1e7+ events). Before
    images carry synthetic text (they never win last-writer-wins, so apply
    output is unaffected); pairing invariants (3 immediately before 4, same
    commit/key) still hold. Returns (changelog in shuffled delivery order,
    max_lsn)."""
    rng = np.random.default_rng(seed)
    n_pairs = int(n_events * update_pair_fraction / 2.0)
    n_single = n_events - 2 * n_pairs
    n_commits = n_single + n_pairs

    # per-commit key choice with skew: hot conv 0 gets hot_fraction of commits
    hot = rng.random(n_commits) < hot_fraction
    conv_idx = rng.integers(0, n_convs, n_commits)
    conv_idx[hot] = 0
    turn = rng.integers(0, turns_per_conv, n_commits).astype(np.int32)

    # ops for single-row commits: insert 50% / update_single 30% / delete 20%
    u = rng.random(n_commits)
    single_op = np.where(u < 0.5, OP_INSERT, np.where(u < 0.8, OP_UPDATE_SINGLE, OP_DELETE))
    is_pair = np.zeros(n_commits, dtype=bool)
    is_pair[rng.choice(n_commits, n_pairs, replace=False)] = True

    commit_lo = snapshot_lsn.lo + 1 + np.arange(n_commits, dtype=np.uint64)
    rows_per_commit = np.where(is_pair, 2, 1)
    n_rows = int(rows_per_commit.sum())
    ridx = np.repeat(np.arange(n_commits), rows_per_commit)  # row -> commit
    # intent: global strictly-increasing counter in generation order
    intent_lo = np.arange(1, n_rows + 1, dtype=np.uint64)
    # op per row: pairs expand to (3, 4); singles keep their op
    first_of_commit = np.ones(n_rows, dtype=bool)
    first_of_commit[1:] = ridx[1:] != ridx[:-1]
    op = np.where(
        is_pair[ridx],
        np.where(first_of_commit, OP_UPDATE_BEFORE, OP_UPDATE_AFTER),
        single_op[ridx],
    ).astype(np.int8)

    conv_r = conv_idx[ridx]
    turn_r = turn[ridx]
    # string building via Arrow kernels: numpy U-dtype concatenation
    # allocates full-width unicode temporaries (O(rows * max_width * 4B) per
    # op) and goes superlinear at 5e7 rows; Arrow string joins are flat utf-8
    import pyarrow.compute as pc

    conv_str = pc.binary_join_element_wise(
        "conv_", pc.utf8_lpad(pc.cast(pa.array(conv_r), pa.string()), 6, "0"), ""
    )
    prefix = pa.array(np.where(op == OP_UPDATE_BEFORE, "before ", "text "))
    text = pc.binary_join_element_wise(
        prefix,
        conv_str,
        " t",
        pc.cast(pa.array(turn_r), pa.string()),
        " c",
        pc.cast(pa.array(ridx), pa.string()),
        "",
    )
    role = np.array(ROLES)[(ridx % 3)]
    ts = (EPOCH_US + (10_000_000 + ridx.astype(np.int64)) * 1_000_000).astype("datetime64[us]")

    table = pa.table(
        {
            "commit_lsn_hi": np.zeros(n_rows, np.uint64),
            "commit_lsn_lo": commit_lo[ridx],
            "intent_lsn_hi": np.zeros(n_rows, np.uint64),
            "intent_lsn_lo": intent_lo,
            "op": op,
            "conv_id": conv_str,
            "turn_idx": turn_r,
            "role": role,
            "text": text,
            "tool": pa.nulls(n_rows, pa.string()),
            "ts": ts,
        },
        schema=changelog_schema(),
    )
    # chunk-local delivery shuffle: rows are out of order (exercises the
    # engine's order-insensitivity) but each ~1M-row span stays within a
    # bounded LSN range, like a real log with interleaved transactions — so
    # parquet row-group statistics still enable window predicate pushdown
    rng2 = np.random.default_rng(seed + 1)
    chunk = 1_000_000
    perm = np.arange(n_rows)
    for s in range(0, n_rows, chunk):
        e = min(s + chunk, n_rows)
        perm[s:e] = s + rng2.permutation(e - s)
    return table.take(perm), Lsn(0, int(commit_lo[-1]))
