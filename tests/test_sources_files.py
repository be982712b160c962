"""CSV/JSONL source readers: pinned-schema ingest is lossless."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_csv_jsonl_roundtrip(ray_session, tmp_path):
    from debezium_connector_db2_ray.sources.files import (
        csv_copy_of_parquet,
        jsonl_copy_of_parquet,
        read_csv_source,
        read_jsonl_source,
    )

    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([10, 20, 30], pa.int64()),
        "event_type": pa.array(["a", "b", "a"], pa.string()),
        "value": pa.array([1.5, 0.1 + 0.2, -3.25], pa.float64()),
    })
    src = str(tmp_path / "ev.parquet")
    pq.write_table(t, src)
    schema = t.schema

    csv_path = csv_copy_of_parquet(src, columns=list(schema.names))
    got_csv = (
        read_csv_source(csv_path, schema)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    jl_path = jsonl_copy_of_parquet(src, columns=list(schema.names))
    got_jl = (
        read_jsonl_source(jl_path, schema)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    exp = t.to_pandas()
    for got in (got_csv, got_jl):
        assert got["event_id"].tolist() == exp["event_id"].tolist()
        assert got["event_type"].tolist() == exp["event_type"].tolist()
        # float64 round-trips bit-exactly (shortest-roundtrip formatting)
        assert got["value"].tolist() == exp["value"].tolist()

    # fixture conversion is cached: same mtime -> same path, no rewrite
    assert csv_copy_of_parquet(src, columns=list(schema.names)) == csv_path


def test_filter_operations_validates_and_filters(ray_session):
    import pytest
    import ray.data as rd

    from debezium_connector_db2_ray.stages.envelope import filter_operations

    t = pa.table({
        "op_char": pa.array(["c", "u", "d", None, "r"], pa.string()),
        "x": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = (
        filter_operations(rd.from_arrow(t), skipped={"d", "u"})
        .to_pandas()
    )
    assert out["x"].tolist() == [1, 4, 5]  # NULL op kept
    with pytest.raises(ValueError):
        filter_operations(rd.from_arrow(t), skipped={"z"})
