"""Durable-path schema evolution: a later window carries a WIDER payload
(added column + widened int type); merge-on-read unifies, old winners are
null-backfilled, and the schema history records the ALTER."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from debezium_connector_db2_ray.lsn import Lsn
from debezium_connector_db2_ray.ops import OP_INSERT, OP_UPDATE_SINGLE
from debezium_connector_db2_ray.pipelines.replay import CdcEngine
from debezium_connector_db2_ray.schema import PAYLOAD_SCHEMA, changelog_schema
from debezium_connector_db2_ray.sources.genlog import generate_lake


def _mk_window(rows, payload_schema):
    cols = {
        "commit_lsn_hi": pa.array([0] * len(rows), pa.uint64()),
        "commit_lsn_lo": pa.array([r[0] for r in rows], pa.uint64()),
        "intent_lsn_hi": pa.array([0] * len(rows), pa.uint64()),
        "intent_lsn_lo": pa.array([r[0] for r in rows], pa.uint64()),
        "op": pa.array([r[1] for r in rows], pa.int8()),
    }
    for i, f in enumerate(payload_schema):
        cols[f.name] = pa.array([r[2 + i] for r in rows], f.type)
    return pa.table(cols, schema=changelog_schema(payload_schema))


def test_durable_widened_window(ray_session, tmp_path):
    import ray.data as rd

    lake = generate_lake(6, 3, seed=71)
    d = tmp_path / "data"
    d.mkdir()
    pq.write_table(lake, str(d / "lake.parquet"))

    # window 1: original payload
    w1 = _mk_window(
        [
            (1001, OP_UPDATE_SINGLE, "conv_000000", 0, "user", "w1-upd", None, 0),
        ],
        PAYLOAD_SCHEMA,  # conv, turn(int32), role, text, tool, ts
    )
    # window 2: turn_idx widened to int64, lang added
    wide = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int64()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
            ("lang", pa.string()),
        ]
    )
    w2 = _mk_window(
        [
            (1002, OP_INSERT, "conv_000001", 9_000_000_000, "user", "w2-big-turn",
             None, 0, "en"),
            (1003, OP_UPDATE_SINGLE, "conv_000002", 1, "user", "w2-upd", None, 0,
             "fr"),
        ],
        wide,
    )
    pq.write_table(w1, str(d / "w1.parquet"))
    pq.write_table(w2, str(d / "w2.parquet"))

    out = str(tmp_path / "target")
    eng = CdcEngine(out_dir=out, num_partitions=4)
    snap = Lsn(0, 1000)
    eng.snapshot(rd.read_parquet(str(d / "lake.parquet")), snap)
    eng.replay_window(rd.read_parquet(str(d / "w1.parquet")), snap, Lsn(0, 1001))
    eng.replay_window(
        rd.read_parquet(str(d / "w2.parquet")), Lsn(0, 1001), Lsn(0, 1003)
    )

    df = eng.state_dataset().to_pandas()
    assert "lang" in df.columns
    by_key = {
        (r.conv_id, int(r.turn_idx)): r for r in df.itertuples()
    }
    assert by_key[("conv_000000", 0)].text == "w1-upd"
    assert by_key[("conv_000000", 0)].lang is None  # null-backfilled
    assert by_key[("conv_000001", 9_000_000_000)].lang == "en"  # widened key value
    assert by_key[("conv_000002", 1)].text == "w2-upd"
    # untouched snapshot rows survive with lang null
    assert by_key[("conv_000003", 2)].lang is None
    # ALTER recorded at the widening window's from_lsn
    hist = eng.schema_history
    kinds = [r["kind"] for r in hist._records]
    assert kinds == ["CREATE", "ALTER"]
    latest = hist.boundaries("transcripts")[-1][1]
    assert latest.field("turn_idx").type == pa.int64()
    assert "lang" in latest.names
