"""Auto-compaction policy: long replays keep merge-on-read cost bounded —
read_amplification (max live files one partition must open) stays under the
trigger instead of growing linearly with windows."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from debezium_connector_db2_ray.lsn import Lsn
from debezium_connector_db2_ray.metrics import read_amplification
from debezium_connector_db2_ray.ops import OP_INSERT
from debezium_connector_db2_ray.pipelines.replay import CdcEngine
from debezium_connector_db2_ray.schema import changelog_schema
from debezium_connector_db2_ray.state.manifest import load_manifests


def _bulk_changelog(n_events: int, n_keys: int) -> pa.Table:
    lsn = np.arange(1000, 1000 + n_events, dtype=np.uint64)
    conv = np.array([f"c{int(i) % n_keys}" for i in lsn], dtype=object)
    n = n_events
    return pa.table(
        {
            "commit_lsn_hi": pa.array(np.zeros(n, np.uint64)),
            "commit_lsn_lo": pa.array(lsn),
            "intent_lsn_hi": pa.array(np.zeros(n, np.uint64)),
            "intent_lsn_lo": pa.array(lsn),
            "op": pa.array(np.full(n, OP_INSERT, np.int8)),
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(np.zeros(n, np.int32)),
            "role": pa.array(np.full(n, "user"), pa.string()),
            "text": pa.array([f"t{i}" for i in range(n)], pa.string()),
            "tool": pa.nulls(n, pa.string()),
            "ts": pa.array(np.zeros(n, np.int64), pa.timestamp("us")),
        },
        schema=changelog_schema(),
    )


def test_many_window_replay_bounds_read_amplification(ray_session, tmp_path):
    log = _bulk_changelog(2000, 50)
    path = str(tmp_path / "log.parquet")
    pq.write_table(log, path)
    out = str(tmp_path / "lake")
    eng = CdcEngine(
        out_dir=out, num_partitions=4, validate_pairs=False,
        auto_compact=True, compact_trigger=4,
    )
    eng.replay_from_parquet(path, Lsn(0, 1000), Lsn(0, 2999), 20)
    ms = load_manifests(out)
    assert sum(m.kind == "compaction" for m in ms) >= 2  # policy fired
    # amplification bounded by the trigger (+ deltas since the last fold)
    assert read_amplification(out) <= 5
    # and state is complete: every key's last write won
    got = eng.state_dataset().to_pandas()
    assert len(got) == 50
    expect_last = {f"c{(1000 + i) % 50}": None for i in range(2000)}
    assert set(got["conv_id"]) == set(expect_last)


def test_auto_compact_off_grows_unbounded(ray_session, tmp_path):
    log = _bulk_changelog(1000, 20)
    path = str(tmp_path / "log.parquet")
    pq.write_table(log, path)
    out = str(tmp_path / "lake")
    eng = CdcEngine(
        out_dir=out, num_partitions=4, validate_pairs=False, auto_compact=False
    )
    eng.replay_from_parquet(path, Lsn(0, 1000), Lsn(0, 1999), 10)
    assert read_amplification(out) >= 10  # one delta per window, never folded
