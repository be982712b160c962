"""Config-validation surface — parity with the reference's pre-start
validation (Db2Connector.java:55-91, Db2ConnectorConfigDefTest)."""

from __future__ import annotations

import pytest

from debezium_connector_db2_ray.config import (
    ConfigurationError,
    ensure_valid,
    validate_config,
)


def test_valid_config_is_empty():
    assert validate_config(
        tasks_max=1,
        snapshot_mode="initial",
        num_partitions=32,
        salt=2,
        key_columns=("conv_id", "turn"),
        n_windows=4,
        batch_size=400_000,
        exchange="shuffle",
        validate_pairs=True,
    ) == {}


def test_single_task_rule():
    """maxTasks > 1 is rejected with the reference's exact message
    (Db2Connector.java:56-58)."""
    errs = validate_config(tasks_max=2)
    assert errs["tasks_max"] == ["Only a single connector task may be started"]


def test_unknown_snapshot_mode():
    errs = validate_config(snapshot_mode="bogus")
    assert "snapshot_mode" in errs
    assert "bogus" in errs["snapshot_mode"][0]
    # a Snapshotter instance is the CUSTOM injection point — always legal
    from debezium_connector_db2_ray.snapshotter import AlwaysSnapshotter

    assert validate_config(snapshot_mode=AlwaysSnapshotter()) == {}


def test_include_exclude_mutual_exclusion():
    errs = validate_config(table_include=("A",), table_exclude=("B",))
    assert "table_exclude" in errs
    # either alone is fine
    assert validate_config(table_include=("A",)) == {}
    assert validate_config(table_exclude=("B",)) == {}


def test_negative_windows_and_partitions():
    errs = validate_config(n_windows=-1, num_partitions=0, batch_size=-5)
    assert set(errs) == {"n_windows", "num_partitions", "batch_size"}


def test_salt_requires_second_key_column():
    errs = validate_config(salt=4, key_columns=("conv_id",))
    assert "salt" in errs
    assert validate_config(salt=4, key_columns=("conv_id", "turn")) == {}


def test_key_column_cannot_be_excluded():
    errs = validate_config(
        key_columns=("conv_id", "turn"),
        column_exclude={"T1": ("conv_id", "payload")},
    )
    assert "column_exclude" in errs and "conv_id" in errs["column_exclude"][0]


def test_write_exchange_rejects_strict_pairs():
    errs = validate_config(exchange="write", validate_pairs=True)
    assert "validate_pairs" in errs
    assert validate_config(exchange="write", validate_pairs=False) == {}


def test_unknown_field_and_aggregated_raise():
    """ensure_valid raises ONE error carrying the whole report, like
    Connect's validation round trip."""
    with pytest.raises(ConfigurationError) as ei:
        ensure_valid(tasks_max=3, snapshot_mode="nope", bogus_knob=1)
    errs = ei.value.errors
    assert set(errs) == {"tasks_max", "snapshot_mode", "bogus_knob"}
    msg = str(ei.value)
    assert "Only a single connector task" in msg and "bogus_knob" in msg


def test_stop_lsns_typed():
    from debezium_connector_db2_ray.lsn import Lsn

    errs = validate_config(stop_lsns={"T1": "not-an-lsn"})
    assert "stop_lsns" in errs
    assert validate_config(stop_lsns={"T1": Lsn(0, 5)}) == {}
