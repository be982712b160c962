"""Central connector-configuration validation.

The reference validates its whole config surface before a task starts:
``Db2Connector.taskConfigs`` rejects ``maxTasks > 1`` outright
("Only a single connector task may be started", Db2Connector.java:55-61),
``validateAllFields`` runs every field validator
(Db2Connector.java:86-89, exercised by Db2ConnectorConfigDefTest), and the
relational base config rejects contradictory list knobs (an include list
and an exclude list for the same namespace cannot both be set).

Ray-side analog: ``validate_config(**knobs)`` returns a ``{field: [error,
...]}`` map — the shape of Kafka Connect's ``ConfigValue.errorMessages`` —
and ``ensure_valid(**knobs)`` raises :class:`ConfigurationError` with every
message at once (NOT first-failure, matching how Connect surfaces the whole
validation report in one round trip).
"""

from __future__ import annotations

from typing import Any


class ConfigurationError(ValueError):
    """Raised by :func:`ensure_valid`; ``errors`` holds the full field ->
    messages map so callers can render a Connect-style report."""

    def __init__(self, errors: dict[str, list[str]]):
        self.errors = errors
        lines = [
            f"  {field}: {msg}"
            for field, msgs in sorted(errors.items())
            for msg in msgs
        ]
        super().__init__(
            "invalid connector configuration:\n" + "\n".join(lines)
        )


#: knobs validate_config knows about; unknown keys are themselves an error
#: (Connect rejects unknown property names at parse time)
_KNOWN = {
    "tasks_max", "snapshot_mode", "table_include", "table_exclude",
    "column_exclude", "key_columns", "num_partitions", "salt",
    "n_windows", "batch_size", "exchange", "validate_pairs",
    "compact_trigger", "stop_lsns", "z_stop_lsn_ignore",
    "snapshot_isolation_mode", "snapshot_locking_mode",
}


def validate_config(**knobs: Any) -> dict[str, list[str]]:
    """Validate a connector/engine knob set; returns ``{field: [error
    message, ...]}`` — empty when the configuration is valid."""
    errors: dict[str, list[str]] = {}

    def err(field: str, msg: str) -> None:
        errors.setdefault(field, []).append(msg)

    for k in knobs:
        if k not in _KNOWN:
            err(k, f"unknown configuration field {k!r}")

    # -- single-task rule (Db2Connector.java:55-61) --------------------------
    tasks = knobs.get("tasks_max", 1)
    if not isinstance(tasks, int) or tasks < 1:
        err("tasks_max", f"a positive integer is required, got {tasks!r}")
    elif tasks > 1:
        err("tasks_max", "Only a single connector task may be started")

    # -- snapshot.mode enum (Db2ConnectorConfig.java:64-109) -----------------
    if "snapshot_mode" in knobs:
        from debezium_connector_db2_ray.snapshotter import (
            Snapshotter,
            resolve_snapshotter,
        )

        mode = knobs["snapshot_mode"]
        if not isinstance(mode, Snapshotter):
            try:
                resolve_snapshotter(mode)
            except ValueError as e:
                err("snapshot_mode", str(e))

    # -- snapshot.isolation.mode / snapshot.locking.mode enums ----------------
    # (Db2ConnectorConfig.java:160-300; documented no-ops over an immutable
    # parquet lake, SURVEY.md §3.2 — validated + echoed for config parity)
    if "snapshot_isolation_mode" in knobs:
        from debezium_connector_db2_ray.snapshotter import (
            resolve_isolation_mode,
        )

        try:
            resolve_isolation_mode(knobs["snapshot_isolation_mode"])
        except ValueError as e:
            err("snapshot_isolation_mode", str(e))
    if "snapshot_locking_mode" in knobs:
        from debezium_connector_db2_ray.snapshotter import (
            resolve_locking_mode,
        )

        try:
            resolve_locking_mode(knobs["snapshot_locking_mode"])
        except ValueError as e:
            err("snapshot_locking_mode", str(e))

    # -- include/exclude mutual exclusion (relational base config) ----------
    inc, exc = knobs.get("table_include"), knobs.get("table_exclude")
    if inc is not None and exc:
        err(
            "table_exclude",
            '"table_exclude" is invalid: "table_include" is already '
            "specified",
        )

    # -- excluded columns must not cover the key ----------------------------
    key_cols = tuple(knobs.get("key_columns") or ())
    col_exc = knobs.get("column_exclude") or {}
    if isinstance(col_exc, dict) and key_cols:
        for table, cols in col_exc.items():
            hit = sorted(set(key_cols) & set(cols or ()))
            if hit:
                err(
                    "column_exclude",
                    f"table {table!r}: key column(s) {hit} cannot be "
                    "excluded — the LWW identity would be destroyed",
                )

    # -- positive-integer knobs ---------------------------------------------
    for field, minimum in (("num_partitions", 1), ("salt", 1),
                           ("n_windows", 1), ("batch_size", 1),
                           ("compact_trigger", 1)):
        if field in knobs:
            v = knobs[field]
            if not isinstance(v, int) or v < minimum:
                err(field, f"an integer >= {minimum} is required, got {v!r}")

    # -- salting needs a sub-partition column (tag_partitions contract) -----
    salt = knobs.get("salt", 1)
    if isinstance(salt, int) and salt > 1 and key_cols and len(key_cols) < 2:
        err(
            "salt",
            f"salt={salt} sub-partitions by the SECOND key column, but "
            f"key_columns={key_cols!r} has only one — salting a "
            "single-column key would split one key's rows across "
            "partitions and break per-partition LWW",
        )

    # -- exchange policy ------------------------------------------------------
    exchange = knobs.get("exchange")
    if exchange is not None and exchange not in ("shuffle", "write"):
        err("exchange",
            f"expected 'shuffle' or 'write', got {exchange!r}")
    if exchange == "write" and knobs.get("validate_pairs"):
        err(
            "validate_pairs",
            "exchange='write' skips the per-partition sort; strict "
            "update-pair validation requires exchange='shuffle'",
        )

    # -- stop-LSN fence map ---------------------------------------------------
    stop = knobs.get("stop_lsns")
    if stop is not None:
        from debezium_connector_db2_ray.lsn import Lsn

        if not isinstance(stop, dict):
            err("stop_lsns", f"a {{table: Lsn}} map is required, got "
                             f"{type(stop).__name__}")
        else:
            for table, lsn in stop.items():
                if not isinstance(lsn, Lsn):
                    err("stop_lsns",
                        f"table {table!r}: expected an Lsn, got {lsn!r}")

    return errors


def ensure_valid(**knobs: Any) -> None:
    """Raise :class:`ConfigurationError` carrying EVERY message when any
    knob is invalid; no-op otherwise."""
    errors = validate_config(**knobs)
    if errors:
        raise ConfigurationError(errors)
