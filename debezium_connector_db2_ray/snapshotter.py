"""Snapshotter SPI — the user-selectable / injectable snapshot policy.

Mirrors the reference's ``snapshot.mode`` enum (initial, always,
initial_only, no_data a.k.a. schema_only, custom —
Db2ConnectorConfig.java:64-109) and the injectable ``Snapshotter``
interface the CUSTOM mode loads (CustomTestSnapshot.java:26-81:
shouldSnapshotData / shouldSnapshotSchema / shouldStream + a per-table
snapshot query hook that can skip a table or project a column subset).

The engine consumes it through ``CdcEngine.run_snapshot``: the policy
decides whether data is read, whether the schema is recorded, whether the
watermark manifest is committed so streaming can begin, and what
projection each table's snapshot SELECT uses.
"""

from __future__ import annotations


class Snapshotter:
    """Base policy = the reference's INITIAL mode: snapshot data only when
    no offset exists yet, always record schema, then stream."""

    name = "initial"
    replace = False  # True supersedes all prior state (snapshot mode ALWAYS)

    def should_snapshot_data(self, offset_exists: bool,
                             snapshot_in_progress: bool) -> bool:
        return not offset_exists or snapshot_in_progress

    def should_snapshot_schema(self, offset_exists: bool,
                               snapshot_in_progress: bool) -> bool:
        return True

    def should_stream(self) -> bool:
        return True

    def should_snapshot_on_data_error(self) -> bool:
        """Re-snapshot when offsets exist but the data state is damaged
        (an incomplete prior snapshot) — the reference's
        snapshot.mode.configuration.based.snapshot.on.data.error flag."""
        return False

    def snapshot_projection(self, table: str,
                            columns: list[str]) -> list[str] | None:
        """Columns the table's snapshot SELECT reads; None skips the table
        entirely (the analog of returning an empty snapshot query)."""
        return columns


class InitialSnapshotter(Snapshotter):
    name = "initial"


class AlwaysSnapshotter(Snapshotter):
    """Re-snapshot on every start, ignoring prior offsets/state
    (Db2ConnectorIT.java:912-970 shouldNotUseOffsetWhenSnapshotIsAlways)."""

    name = "always"
    replace = True

    def should_snapshot_data(self, offset_exists, snapshot_in_progress):
        return True


class InitialOnlySnapshotter(Snapshotter):
    """Snapshot once, never stream."""

    name = "initial_only"

    def should_stream(self) -> bool:
        return False


class NoDataSnapshotter(Snapshotter):
    """schema_only: record the schema and the starting watermark, read no
    rows; streaming begins at the current LSN over an empty base."""

    name = "no_data"

    def should_snapshot_data(self, offset_exists, snapshot_in_progress):
        return False


class WhenNeededSnapshotter(Snapshotter):
    """Snapshot when the offset is missing OR a prior snapshot never
    completed (Db2ConnectorConfig.java:95-98)."""

    name = "when_needed"

    def should_snapshot_data(self, offset_exists, snapshot_in_progress):
        return not offset_exists or snapshot_in_progress


class ConfigurationBasedSnapshotter(Snapshotter):
    """Every decision driven purely by the configured flags — the
    reference's snapshot.mode.configuration.based.* properties
    (Db2ConnectorConfig.java:100-103). ``snapshot_data=True`` therefore
    re-snapshots on EVERY start (so it replaces, like ALWAYS);
    ``snapshot_on_data_error=True`` additionally re-snapshots when offsets
    exist but a prior snapshot never completed (the data-error analog)."""

    name = "configuration_based"

    def __init__(self, *, snapshot_data: bool = True,
                 snapshot_schema: bool = True, stream: bool = True,
                 snapshot_on_data_error: bool = False):
        self._data = snapshot_data
        self._schema = snapshot_schema
        self._stream = stream
        self._on_data_error = snapshot_on_data_error
        # a flag-driven re-snapshot over existing state must supersede it
        self.replace = snapshot_data or snapshot_on_data_error

    def should_snapshot_data(self, offset_exists, snapshot_in_progress):
        return self._data

    def should_snapshot_schema(self, offset_exists, snapshot_in_progress):
        return self._schema

    def should_stream(self) -> bool:
        return self._stream

    def should_snapshot_on_data_error(self) -> bool:
        return self._on_data_error


_MODES = {
    "initial": InitialSnapshotter,
    "always": AlwaysSnapshotter,
    "initial_only": InitialOnlySnapshotter,
    "no_data": NoDataSnapshotter,
    "schema_only": NoDataSnapshotter,  # legacy alias
    "when_needed": WhenNeededSnapshotter,
    "configuration_based": ConfigurationBasedSnapshotter,
}


def resolve_snapshotter(mode) -> Snapshotter:
    """A mode string resolves from the registry; a Snapshotter instance
    passes through — the CUSTOM injection point."""
    if isinstance(mode, Snapshotter):
        return mode
    try:
        return _MODES[mode]()
    except KeyError:
        raise ValueError(
            f"unknown snapshot mode {mode!r}; expected one of "
            f"{sorted(_MODES)} or a Snapshotter instance"
        ) from None


# -- snapshot isolation / locking modes --------------------------------------
#
# The reference offers snapshot.isolation.mode (SnapshotIsolationMode:
# exclusive | repeatable_read [default] | read_committed | read_uncommitted,
# Db2ConnectorConfig.java:226-300) and snapshot.locking.mode
# (SnapshotLockingMode: exclusive | none | custom, :160-215), applied by
# Db2SnapshotChangeEventSource.java:61-103 as JDBC transaction-isolation +
# TABLOCKX statements around the snapshot SELECTs.
#
# Over an immutable Parquet lake every isolation level reads the SAME bytes
# — there are no concurrent writers inside the snapshot source, so the knobs
# are semantically no-ops here BY DESIGN (SURVEY.md §3.2). They are still
# accepted, validated against the reference's enums and echoed into the
# snapshot-STARTED notification so config parity is observable, a config
# typo still fails fast, and an operator reading the notification stream
# sees the same fields a Debezium deployment logs.

SNAPSHOT_ISOLATION_MODES = (
    "exclusive", "repeatable_read", "read_committed", "read_uncommitted",
)
DEFAULT_ISOLATION_MODE = "repeatable_read"

SNAPSHOT_LOCKING_MODES = ("exclusive", "none", "custom")
DEFAULT_LOCKING_MODE = "exclusive"


def resolve_isolation_mode(mode=None) -> str:
    """Validate/default a snapshot.isolation.mode value (parse semantics of
    SnapshotIsolationMode.parse: None -> default, unknown -> error)."""
    if mode is None:
        return DEFAULT_ISOLATION_MODE
    m = str(mode).strip().lower()
    if m not in SNAPSHOT_ISOLATION_MODES:
        raise ValueError(
            f"unknown snapshot isolation mode {mode!r}; expected one of "
            f"{list(SNAPSHOT_ISOLATION_MODES)}"
        )
    return m


def resolve_locking_mode(mode=None) -> str:
    """Validate/default a snapshot.locking.mode value."""
    if mode is None:
        return DEFAULT_LOCKING_MODE
    m = str(mode).strip().lower()
    if m not in SNAPSHOT_LOCKING_MODES:
        raise ValueError(
            f"unknown snapshot locking mode {mode!r}; expected one of "
            f"{list(SNAPSHOT_LOCKING_MODES)}"
        )
    return m
