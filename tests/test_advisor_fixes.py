"""Regression tests for the round-1 advisor findings:

1. replay_from_parquet with snapshot_completed=False must not prune the event
   AT the un-incremented watermark at the parquet read (reference
   shouldIncreaseFromLsn semantics: the fence event itself replays once).
2. committed_watermark must ignore manifests superseded by a
   snapshot_replace barrier (snapshot mode ALWAYS resets the resume point,
   Db2ConnectorIT.java:912-970).
3. _lineage must union min/max LSN across salted groups of one partition.
4. transaction_feed must distinguish transactions differing only in
   commit_lsn_hi and emit tx_id as the colon-hex LSN string (Lsn.java:65-86).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from debezium_connector_db2_ray.lsn import Lsn
from debezium_connector_db2_ray.ops import OP_INSERT
from debezium_connector_db2_ray.pipelines.replay import CdcEngine
from debezium_connector_db2_ray.schema import changelog_schema
from debezium_connector_db2_ray.state.manifest import committed_watermark


def _changelog(rows):
    """rows: list of (commit_lo, conv_id, text)."""
    n = len(rows)
    return pa.table(
        {
            "commit_lsn_hi": pa.array([0] * n, pa.uint64()),
            "commit_lsn_lo": pa.array([r[0] for r in rows], pa.uint64()),
            "intent_lsn_hi": pa.array([0] * n, pa.uint64()),
            "intent_lsn_lo": pa.array([r[0] for r in rows], pa.uint64()),
            "op": pa.array([OP_INSERT] * n, pa.int8()),
            "conv_id": pa.array([r[1] for r in rows], pa.string()),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array([0] * n, pa.timestamp("us")),
        },
        schema=changelog_schema(),
    )


@pytest.mark.parametrize("n_windows", [1, 3])
def test_fence_event_replayed_when_snapshot_incomplete(
    ray_session, tmp_path, n_windows
):
    log = _changelog([(100, "cF", "fence"), (150, "cA", "a"), (200, "cB", "b")])
    path = str(tmp_path / "log.parquet")
    pq.write_table(log, path)
    out = str(tmp_path / "lake")
    eng = CdcEngine(out_dir=out, num_partitions=2, salt=1)
    ms = eng.replay_from_parquet(
        path, Lsn(0, 100), Lsn(0, 200), n_windows, snapshot_completed=False
    )
    assert ms
    got = eng.state_dataset().to_pandas()
    # the event AT the un-incremented watermark (lsn=100) must survive the
    # parquet pushdown and land in state
    assert set(got["conv_id"]) == {"cF", "cA", "cB"}


def test_fence_event_skipped_when_snapshot_completed(ray_session, tmp_path):
    log = _changelog([(100, "cF", "fence"), (150, "cA", "a")])
    path = str(tmp_path / "log.parquet")
    pq.write_table(log, path)
    out = str(tmp_path / "lake")
    eng = CdcEngine(out_dir=out, num_partitions=2, salt=1)
    eng.replay_from_parquet(path, Lsn(0, 100), Lsn(0, 150), 1)
    got = eng.state_dataset().to_pandas()
    assert set(got["conv_id"]) == {"cA"}  # watermark event already applied


def test_resnapshot_resets_committed_watermark(ray_session, tmp_path):
    import ray.data as rd

    lake_v1 = _changelog([]).drop_columns(
        ["commit_lsn_hi", "commit_lsn_lo", "intent_lsn_hi", "intent_lsn_lo", "op"]
    )
    lake_v1 = pa.table(
        {
            "conv_id": ["c1"],
            "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"],
            "text": ["one"],
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    out = str(tmp_path / "lake")
    eng = CdcEngine(out_dir=out, num_partitions=2)
    eng.snapshot(rd.from_arrow(lake_v1), Lsn(0, 100))
    # stream up to lsn 300
    log = _changelog([(250, "c2", "two")])
    eng.replay_window(rd.from_arrow(log), Lsn(0, 100), Lsn(0, 300))
    assert committed_watermark(out) == Lsn(0, 300)
    # snapshot mode ALWAYS at a LOWER fence supersedes everything
    eng.snapshot(rd.from_arrow(lake_v1), Lsn(0, 150), replace=True)
    assert committed_watermark(out) == Lsn(0, 150)
    # a post-resnapshot window below the STALE watermark must still apply
    log2 = _changelog([(200, "c9", "nine")])
    m = eng.replay_window(rd.from_arrow(log2), Lsn(0, 150), Lsn(0, 250))
    assert m is not None
    got = eng.state_dataset().to_pandas()
    assert set(got["conv_id"]) == {"c1", "c9"}


def test_lineage_merges_lsn_range_across_salted_groups():
    rows = [
        {"partition": 3, "rows": 5, "file": "a.parquet",
         "op_counts": '{"2": 5}',
         "min_lsn": Lsn(0, 20).hex(), "max_lsn": Lsn(0, 50).hex()},
        {"partition": 3, "rows": 2, "file": "b.parquet",
         "op_counts": '{"1": 2}',
         "min_lsn": Lsn(0, 10).hex(), "max_lsn": Lsn(0, 90).hex()},
    ]
    out = CdcEngine._lineage(rows)
    p = out["3"]
    assert p["rows"] == 7
    assert p["min_lsn"] == Lsn(0, 10).hex()
    assert p["max_lsn"] == Lsn(0, 90).hex()
    assert p["op_counts"] == {"2": 5, "1": 2}


def test_transaction_feed_distinguishes_hi_halves():
    from debezium_connector_db2_ray.stages.transactions import transaction_feed

    frag = pa.table(
        {
            "commit_lsn_hi": pa.array([0, 0, 1], pa.uint64()),
            "commit_lsn_lo": pa.array([7, 7, 7], pa.uint64()),
            "intent_lsn_hi": pa.array([0, 0, 1], pa.uint64()),
            "intent_lsn_lo": pa.array([1, 2, 1], pa.uint64()),
            "conv_id": ["a", "b", "c"],
            "turn_idx": pa.array([0, 0, 0], pa.int32()),
        }
    )
    feed = transaction_feed(frag)
    begins = feed.filter(pa.compute.equal(feed["kind"], "BEGIN"))
    # two transactions, not one merged by the shared low half
    assert begins.num_rows == 2
    ids = set(begins["tx_id"].to_pylist())
    assert ids == {Lsn(0, 7).hex(), Lsn(1, 7).hex()}
    ends = feed.filter(pa.compute.equal(feed["kind"], "END"))
    counts = {r["tx_id"]: r["event_count"] for r in ends.to_pylist()}
    assert counts == {Lsn(0, 7).hex(): 2, Lsn(1, 7).hex(): 1}


def test_lsn_hex_array_matches_scalar():
    import numpy as np

    from debezium_connector_db2_ray.lsn import lsn_hex, lsn_hex_array

    hi = np.array([0, 1, 2**64 - 1], dtype=np.uint64)
    lo = np.array([0, 2**63 + 5, 2**64 - 1], dtype=np.uint64)
    got = lsn_hex_array(hi, lo)
    assert list(got) == [lsn_hex(int(h), int(l)) for h, l in zip(hi, lo)]


def test_classify_parquet_stream_pairs_straddle_row_groups(ray_session, tmp_path):
    """The overlapped row-group scan classifies a file-resident raw stream
    with NO shuffle, even when update pairs straddle row-group boundaries."""
    import numpy as np
    import pyarrow.compute as pc

    from debezium_connector_db2_ray.stages.decode import (
        classify_ops,
        classify_parquet_stream,
        sort_by_position,
    )

    rows = []
    lsn = 100
    rng = __import__("numpy").random.default_rng(7)
    for i in range(500):
        kind = rng.choice(["ins", "del", "upd"])
        if kind == "ins":
            rows.append((lsn, 1, "I"))
        elif kind == "del":
            rows.append((lsn, 1, "D"))
        else:  # update pair: D then I, same commit
            rows.append((lsn, 1, "D"))
            rows.append((lsn, 2, "I"))
        lsn += 1
    n = len(rows)
    raw = pa.table(
        {
            "commit_lsn_hi": pa.array([0] * n, pa.uint64()),
            "commit_lsn_lo": pa.array([r[0] for r in rows], pa.uint64()),
            "intent_lsn_hi": pa.array([0] * n, pa.uint64()),
            "intent_lsn_lo": pa.array([r[1] for r in rows], pa.uint64()),
            "op_raw": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    path = str(tmp_path / "raw.parquet")
    # tiny row groups (37 rows) force many pairs onto group boundaries
    pq.write_table(raw, path, row_group_size=37)
    got = (
        classify_parquet_stream(path, groups_per_task=2)
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
