"""Snapshot-then-stream CDC replay — the Ray-Data pipeline orchestration.

Lifecycle mirrors the reference coordinator (snapshot phase then streaming
loop over bounded LSN windows — Db2ConnectorTask.java:163-176,
Db2StreamingChangeEventSource.java:132-302) reshaped for Ray Data:

  snapshot:  read_parquet(lake) --map_batches(partition tag)-->
             groupby(part) --map_groups(collapse + staged write)--> manifest
  window w:  read_parquet(changelog, filter lsn in (from, to]) -->
             map_batches(null-LSN drop, partition tag [, partial combiner]) -->
             groupby(part) shuffle -->
             map_groups(sort, pair-validate, LWW apply, staged write) -->
             commit manifest (watermark = to_lsn)

Each window is one bounded Dataset execution (the reference's poll iteration,
which drains a closed interval [fromLsn, currentMaxLsn] completely). State
between windows lives ONLY in committed manifests + their parquet files —
merge-on-read deltas with periodic compaction — so a kill at any point resumes
cleanly: committed windows are skipped by watermark, the interrupted window
re-runs idempotently (LWW) and its orphaned staged files stay invisible.

Scale notes (100 TB design):
- the changelog read prunes columns and pushes the LSN-range filter to parquet
  row groups;
- the only all-to-all exchange per window is the groupby on the int32 ``part``
  column; with the per-batch combiner on, shuffle volume is bounded by
  (#distinct keys touched) not (#events);
- hot conv_ids are split by salted sub-partitioning (``salt`` > 1) — legal
  because the LWW key is (conv_id, turn_idx);
- outputs are per-partition files, so downstream reads and re-runs are
  partition-parallel and resumable.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from debezium_connector_db2_ray.lsn import Lsn, lsn_hex
from debezium_connector_db2_ray.ops import OP_DELETE
from debezium_connector_db2_ray.schema import (
    CHANGELOG_META_COLUMNS,
    KEY_COLUMNS,
    conform_table,
)

META_SET = set(CHANGELOG_META_COLUMNS)


def _arrow_schema(ds: "ray.data.Dataset") -> pa.Schema:
    """Arrow schema of a Dataset (executes at most a tiny sample)."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(s.names, s.types)))
from debezium_connector_db2_ray.stages.apply import (
    apply_partition,
    final_state,
    lww_collapse,
    partition_ids,
    snapshot_as_events,
)
from debezium_connector_db2_ray.stages.decode import drop_null_lsn
from debezium_connector_db2_ray.state.manifest import (
    PartitionLineage,
    WindowManifest,
    commit_manifest,
    committed_watermark,
    live_files,
    next_window_id,
    partition_files,
)

PART_COL = "__part"

_MANIFEST_ROW_SCHEMA = pa.schema(
    [
        ("partition", pa.int32()),
        ("rows", pa.int64()),
        ("file", pa.string()),
        ("op_counts", pa.string()),  # json
        ("min_lsn", pa.string()),
        ("max_lsn", pa.string()),
    ]
)


def tag_partitions(num_partitions: int, salt: int = 1,
                   key_columns: tuple[str, ...] = KEY_COLUMNS):
    """map_batches fn: drop NULL-LSN rows and add the hash-partition column.
    Partitions by hash of the FIRST key column; ``salt`` sub-partitions by
    the second (requires a composite key)."""
    sub_col = key_columns[1] if len(key_columns) > 1 else None
    if salt > 1 and sub_col is None:
        raise ValueError(
            "salting requires a second key column to sub-partition by"
        )

    def fn(batch: pa.Table) -> pa.Table:
        batch = drop_null_lsn(batch)
        pid = partition_ids(
            batch[key_columns[0]],
            batch[sub_col].to_numpy(zero_copy_only=False)
            if sub_col is not None else None,
            num_partitions,
            salt,
        )
        return batch.append_column(PART_COL, pa.array(pid, pa.int32()))

    return fn


def _op_counts(table: pa.Table) -> dict[str, int]:
    if table.num_rows == 0:
        return {}
    vc = table["op"].to_pandas().value_counts()
    return {str(int(k)): int(v) for k, v in vc.items()}


def _lsn_range(table: pa.Table) -> tuple[str | None, str | None]:
    if table.num_rows == 0:
        return None, None
    chi = table["commit_lsn_hi"].to_numpy(zero_copy_only=False).astype(np.uint64)
    clo = table["commit_lsn_lo"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.lexsort((clo, chi))
    lo, hi = int(order[0]), int(order[-1])
    return lsn_hex(int(chi[lo]), int(clo[lo])), lsn_hex(int(chi[hi]), int(clo[hi]))


def staged_writer(delta_dir: str, *, validate_pairs: bool, drop_tombstones: bool = False,
                  compression: str = "zstd",
                  key_columns: tuple[str, ...] = KEY_COLUMNS):
    """map_groups fn over one hash partition: LWW-collapse the partition and
    stage its parquet file; emit one manifest row. The file only becomes
    visible when the driver commits the window manifest (two-phase sink)."""

    def fn(group: pa.Table) -> pa.Table:
        part = int(group[PART_COL][0].as_py())
        collapsed = lww_collapse(
            group.drop_columns([PART_COL]), validate_pairs=validate_pairs,
            key_columns=key_columns,
        )
        if drop_tombstones and collapsed.num_rows:
            collapsed = collapsed.filter(pc.not_equal(collapsed["op"], OP_DELETE))
        pdir = os.path.join(delta_dir, f"part={part:05d}")
        os.makedirs(pdir, exist_ok=True)
        path = os.path.join(pdir, f"part-{uuid.uuid4().hex}.parquet")
        collapsed = collapsed.append_column(
            PART_COL, pa.array(np.full(collapsed.num_rows, part, np.int32))
        )
        pq.write_table(collapsed, path, compression=compression)
        mn, mx = _lsn_range(collapsed)
        return pa.Table.from_pylist(
            [
                {
                    "partition": part,
                    "rows": collapsed.num_rows,
                    "file": path,
                    "op_counts": json.dumps(_op_counts(collapsed)),
                    "min_lsn": mn,
                    "max_lsn": mx,
                }
            ],
            schema=_MANIFEST_ROW_SCHEMA,
        )

    return fn


def fragment_writer(delta_dir: str, *, compression: str = "zstd",
                    key_columns: tuple[str, ...] = KEY_COLUMNS):
    """map_batches fn for the WRITE-EXCHANGE sink: partial-collapse the batch,
    cluster it by hash partition, and write ONE fragment parquet whose row
    groups are partition-aligned — then emit one manifest row per partition
    present. No Ray all-to-all at all: the 'shuffle' happens at read time via
    ``__part`` row-group pruning (merge-on-read, write-optimized — the
    Hudi/Delta MOR shape). Per-window plasma traffic collapses from
    O(events) to O(manifest rows)."""

    def fn(batch: pa.Table) -> pa.Table:
        batch = lww_collapse(batch, validate_pairs=False, partial=True,
                             key_columns=key_columns)
        if batch.num_rows == 0:
            return _MANIFEST_ROW_SCHEMA.empty_table()
        parts = batch[PART_COL].to_numpy(zero_copy_only=False)
        order = np.argsort(parts, kind="stable")
        batch = batch.take(order)
        parts = parts[order]
        os.makedirs(delta_dir, exist_ok=True)
        path = os.path.join(delta_dir, f"frag-{uuid.uuid4().hex}.parquet")
        uniq, starts, counts = np.unique(parts, return_index=True, return_counts=True)
        # row groups sized so one partition spans few groups (pruning works)
        rg = max(16_384, batch.num_rows // max(1, len(uniq)))
        pq.write_table(batch, path, row_group_size=rg, compression=compression)
        op = batch["op"].to_numpy(zero_copy_only=False)
        rows = []
        for p, s, c in zip(uniq, starts, counts):
            ops, opc = np.unique(op[s : s + c], return_counts=True)
            sl = batch.slice(s, c)
            mn, mx = _lsn_range(sl)
            rows.append(
                {
                    "partition": int(p),
                    "rows": int(c),
                    "file": path,
                    "op_counts": json.dumps(
                        {str(int(k)): int(v) for k, v in zip(ops, opc)}
                    ),
                    "min_lsn": mn,
                    "max_lsn": mx,
                }
            )
        return pa.Table.from_pylist(rows, schema=_MANIFEST_ROW_SCHEMA)

    return fn


def read_partition_table(
    files: list[str], partition: int,
    default_fill: dict | None = None,
) -> pa.Table:
    """Read one hash partition's rows from its live files: per-partition
    delta files load whole; fragment files prune to the partition's row
    groups via the ``__part`` statistics.

    ``default_fill`` maps column -> (arrow type, typed default): a column
    an ALTER added WITH a DEFAULT is materialized PER FILE before the
    concat, so pre-ALTER rows carry the typed default even when the
    partition mixes file generations (a permissive concat would null-fill
    them and the default would be unrecoverable downstream —
    AbstractDb2DefaultValueIT semantics)."""
    tables = []
    for f in files:
        t = pq.read_table(f, filters=[(PART_COL, "=", partition)])
        if t.num_rows:
            if default_fill:
                for c, (typ, val) in default_fill.items():
                    if c not in t.column_names:
                        t = t.append_column(
                            c,
                            pa.nulls(t.num_rows, typ).fill_null(
                                pa.scalar(val, typ)
                            ),
                        )
            tables.append(t)
    if not tables:
        return None
    return pa.concat_tables(tables, promote_options="permissive")


@dataclass
class CdcEngine:
    """A CDC target lake: output directory + partitioning/exchange policy.

    ``exchange``:
    - "shuffle": groupby hash shuffle + per-partition LWW collapse before the
      staged write (read-optimized deltas; required for strict
      ``validate_pairs``);
    - "write": no all-to-all — map tasks write partition-clustered fragment
      files directly; collapse happens at read/compaction (write-optimized,
      5x+ faster per window on plasma-bound hosts; fast path only).
    """

    out_dir: str
    num_partitions: int = 32
    salt: int = 1
    validate_pairs: bool = True
    combiner: bool = True  # per-batch partial LWW before the shuffle
    table_name: str = "transcripts"
    #: the table's primary key — last-writer-wins identity, hash-partition
    #: key (first column; the second sub-partitions under salt). The
    #: reference reads each table's PK from the catalog (Db2Connection
    #: schema read); here the caller supplies it per engine.
    key_columns: tuple[str, ...] = KEY_COLUMNS
    exchange: str = "shuffle"  # "shuffle" | "write"
    batch_size: int = 400_000  # rows per map batch (reader emits ~8k-row
    # record batches; mapping per tiny batch multiplies per-call overhead)
    #: auto-compaction policy: after a window commits, if any partition's
    #: merge-on-read must open more than ``compact_trigger`` live files,
    #: fold base+deltas (read-amplification reset). Long replays keep
    #: state-read cost flat instead of degrading linearly with windows. The
    #: trigger is sized so short replays (a handful of windows) never pay a
    #: mid-replay fold — compaction amortizes over tens of windows.
    auto_compact: bool = True
    compact_trigger: int = 64

    def __post_init__(self) -> None:
        # central pre-start validation — the reference validates every
        # config field before the task runs (Db2Connector.java:86-89)
        from debezium_connector_db2_ray.config import ensure_valid

        ensure_valid(
            num_partitions=self.num_partitions,
            salt=self.salt,
            key_columns=self.key_columns,
            batch_size=self.batch_size,
            exchange=self.exchange,
            validate_pairs=self.validate_pairs,
            compact_trigger=self.compact_trigger,
        )

    @property
    def notifications(self):
        """Durable notification channel (reference NotificationService /
        NotificationsIT) — snapshot/backfill/compaction progress events."""
        from debezium_connector_db2_ray.state.notifications import (
            NotificationLog,
        )

        return NotificationLog(self.out_dir)

    @property
    def schema_history(self):
        """Durable CREATE/ALTER log (reference Db2DatabaseSchema.java:51-71);
        rebuilt lazily from disk — recovery after restart is just re-reading
        the log (SchemaHistoryTopicIT semantics)."""
        from debezium_connector_db2_ray.state.schema_log import SchemaHistory

        return SchemaHistory(self.out_dir)

    def _record_schema(self, kind: str, lsn: Lsn, arrow_schema: pa.Schema) -> None:
        payload = pa.schema([f for f in arrow_schema if f.name not in META_SET])
        hist = self.schema_history
        if kind == "ALTER":
            prev = hist.schema_at(self.table_name, lsn)
            if prev is not None and prev.equals(payload):
                return  # no structural change
        hist.record(kind, self.table_name, lsn, payload)

    def _partitioning(self) -> dict:
        return {
            "num_partitions": self.num_partitions,
            "salt": self.salt,
            "key": list(self.key_columns),
        }

    def _check_partitioning(self) -> None:
        """A key must map to ONE partition across all live files, or the
        per-partition merge-on-read misses cross-window last-writer-wins.
        Changing num_partitions/salt therefore requires a compact() barrier,
        which re-tags every live row under the new partitioning."""
        from debezium_connector_db2_ray.state.manifest import live_partitioning

        committed = live_partitioning(self.out_dir)
        if committed is not None and "key" not in committed:
            # manifests written before key tracking: physical layout is the
            # default key's — compare tolerantly instead of forcing a rewrite
            committed = {**committed, "key": list(KEY_COLUMNS)}
        if committed is not None and committed != self._partitioning():
            raise ValueError(
                f"committed state uses partitioning {committed} but this "
                f"engine is configured with {self._partitioning()}; run "
                "compact() with the new settings (a repartitioning barrier) "
                "before replaying further windows"
            )

    # ---- phases -----------------------------------------------------------

    def snapshot(
        self,
        lake: "ray.data.Dataset",
        snapshot_lsn: Lsn,
        *,
        replace: bool = False,
        isolation_mode: str | None = None,
        locking_mode: str | None = None,
    ) -> WindowManifest:
        """Initial-snapshot phase (reference:
        Db2SnapshotChangeEventSource.java:125-175): materialize the lake as
        op=READ rows at the snapshot watermark into hash-partitioned base
        files, then commit a manifest with snapshot_completed=True.

        ``replace=True`` is snapshot mode ALWAYS: the new snapshot supersedes
        all previously committed state (offsets are NOT used; the lake is
        re-read as-is — Db2ConnectorIT.java:912-970).

        ``isolation_mode`` / ``locking_mode`` accept the reference's
        snapshot.isolation.mode / snapshot.locking.mode enums
        (Db2ConnectorConfig.java:160-300) — validated and echoed into the
        STARTED notification; over an immutable parquet lake every level
        reads identical bytes, so no lock/isolation statement is issued
        (documented no-op, SURVEY.md §3.2 / snapshotter.py)."""
        from debezium_connector_db2_ray.snapshotter import (
            resolve_isolation_mode,
            resolve_locking_mode,
        )

        isolation = resolve_isolation_mode(isolation_mode)
        locking = resolve_locking_mode(locking_mode)
        if not replace:
            self._check_partitioning()
        wid = next_window_id(self.out_dir)
        delta_dir = os.path.join(self.out_dir, f"delta/w={wid:06d}")
        fence = snapshot_lsn
        self.notifications.emit(
            "Initial Snapshot", "STARTED",
            {"table": self.table_name, "snapshot_lsn": snapshot_lsn.hex(),
             "replace": replace, "isolation_mode": isolation,
             "locking_mode": locking},
        )

        tagger = tag_partitions(self.num_partitions, self.salt, self.key_columns)

        def to_events(batch: pa.Table) -> pa.Table:
            return tagger(snapshot_as_events(batch, fence))

        ds = (
            lake.map_batches(to_events, batch_format="pyarrow", batch_size=self.batch_size)
            .groupby(PART_COL)
            .map_groups(
                staged_writer(delta_dir, validate_pairs=False,
                              key_columns=self.key_columns),
                batch_format="pyarrow"
            )
        )
        rows = ds.take_all()
        m = WindowManifest(
            window_id=wid,
            kind="snapshot_replace" if replace else "snapshot",
            from_lsn=None,
            to_lsn=snapshot_lsn.hex(),
            snapshot_completed=True,
            partitions=self._lineage(rows),
            partitioning=self._partitioning(),
        )
        commit_manifest(self.out_dir, m)
        self.notifications.emit(
            "Initial Snapshot", "COMPLETED",
            {"table": self.table_name, "window_id": wid,
             "rows": sum(p["rows"] for p in m.partitions.values())},
        )
        # CREATE schema event at snapshot, as the reference emits one DDL
        # record per captured table (SchemaHistoryTopicIT.java:96-111)
        self._record_schema("CREATE", snapshot_lsn, _arrow_schema(lake))
        return m

    def snapshot_in_progress(self) -> bool:
        """True when live manifests contain snapshot work whose final chunk
        never committed — the ``snapshotInProgress`` flag the snapshotter
        policy consults (when_needed re-snapshots in that state)."""
        from debezium_connector_db2_ray.state.manifest import _live_manifests

        ms = [m for m in _live_manifests(self.out_dir)
              if m.kind.startswith("snapshot") or m.kind == "schema_only"]
        return bool(ms) and not any(m.snapshot_completed for m in ms)

    def run_snapshot(
        self,
        lake: "ray.data.Dataset",
        snapshot_lsn: Lsn,
        *,
        mode="initial",
    ) -> WindowManifest | None:
        """Policy-driven snapshot phase: ``mode`` is a snapshot-mode string
        (initial / always / initial_only / no_data / schema_only) or an
        injected Snapshotter instance — the reference's snapshot.mode +
        custom-snapshotter SPI (Db2ConnectorConfig.java:64-109,
        CustomTestSnapshot.java:26-81). Returns the committed manifest, or
        None when the policy reads no data AND records no watermark (e.g.
        INITIAL with an existing offset: streaming just resumes).

        schema_only/no_data commits a data-less ``schema_only`` manifest
        carrying the watermark so streaming can begin at the current LSN
        over an empty base."""
        from debezium_connector_db2_ray.snapshotter import resolve_snapshotter

        snap = resolve_snapshotter(mode)
        offset_exists = committed_watermark(self.out_dir) is not None
        in_progress = self.snapshot_in_progress()
        if snap.should_snapshot_schema(offset_exists, in_progress):
            try:
                self._record_schema("CREATE", snapshot_lsn, _arrow_schema(lake))
            except Exception:
                pass  # schema introspection is best-effort lineage
        take_data = snap.should_snapshot_data(offset_exists, in_progress)
        if not take_data and offset_exists and in_progress:
            # offsets exist but the prior snapshot never completed — the
            # data-error condition the snapshot.on.data.error flag governs
            take_data = snap.should_snapshot_on_data_error()
        if take_data:
            cols = snap.snapshot_projection(
                self.table_name, list(_arrow_schema(lake).names)
            )
            if cols is not None:
                ds = lake
                if list(cols) != list(_arrow_schema(lake).names):
                    ds = lake.select_columns(list(cols))
                return self.snapshot(ds, snapshot_lsn, replace=snap.replace)
        if offset_exists:
            return None  # nothing to do — resume from the existing offset
        # no data read: commit the watermark-only manifest (schema_only)
        wid = next_window_id(self.out_dir)
        m = WindowManifest(
            window_id=wid,
            kind="schema_only",
            from_lsn=None,
            to_lsn=snapshot_lsn.hex(),
            snapshot_completed=True,
            partitions={},
            partitioning=self._partitioning(),
        )
        commit_manifest(self.out_dir, m)
        return m

    def incremental_snapshot(
        self,
        lake: "ray.data.Dataset",
        snapshot_lsn: Lsn,
        *,
        n_chunks: int = 4,
        max_chunks_per_call: int | None = None,
        tag: str = "",
    ) -> list[WindowManifest]:
        """Chunked snapshot — the incremental-snapshot analog (reference:
        signal-driven chunked PK-range snapshot interleaved with streaming,
        Db2ChangeEventSourceFactory.java:71-91, IncrementalSnapshotIT chunk
        size 250). Our chunk key is a hash-partition range, so each chunk is
        an independently committed, resumable unit; a kill mid-backfill
        resumes at the first chunk without a manifest. Interleaving with
        streaming is safe because snapshot rows carry the fence LSN and lose
        last-writer-wins to any later change (watermark dedup for free).
        ``tag`` namespaces the chunk identity so distinct backfill requests
        (e.g. separate signals) don't satisfy each other's resume check."""
        from debezium_connector_db2_ray.state.manifest import _live_manifests

        self._check_partitioning()
        # LIVE manifests only: chunks superseded by a snapshot_replace
        # barrier are dead and must NOT satisfy a later backfill's resume
        # check (same rule committed_watermark follows)
        done_kinds = {m.kind for m in _live_manifests(self.out_dir)}
        tagger = tag_partitions(self.num_partitions, self.salt, self.key_columns)
        fence = snapshot_lsn
        out = []
        prefix = f"snapshot_chunk:{tag}:" if tag else "snapshot_chunk:"
        for c in range(n_chunks):
            kind = f"{prefix}{c}/{n_chunks}"
            if kind in done_kinds:
                continue  # resume: chunk already committed
            if max_chunks_per_call is not None and len(out) >= max_chunks_per_call:
                break  # interleave with streaming windows; resume later
            lo_p = c * self.num_partitions // n_chunks
            hi_p = (c + 1) * self.num_partitions // n_chunks
            wid = next_window_id(self.out_dir)
            delta_dir = os.path.join(self.out_dir, f"delta/w={wid:06d}")

            def chunk_prep(batch: pa.Table, lo_p=lo_p, hi_p=hi_p) -> pa.Table:
                t = tagger(snapshot_as_events(batch, fence))
                pid = t[PART_COL].to_numpy(zero_copy_only=False)
                return t.filter(pa.array((pid >= lo_p) & (pid < hi_p)))

            rows = (
                lake.map_batches(chunk_prep, batch_format="pyarrow", batch_size=self.batch_size)
                .groupby(PART_COL)
                .map_groups(
                    staged_writer(delta_dir, validate_pairs=False,
                                  key_columns=self.key_columns),
                    batch_format="pyarrow",
                )
                .take_all()
            )
            m = WindowManifest(
                window_id=wid,
                kind=kind,
                from_lsn=None,
                to_lsn=snapshot_lsn.hex(),
                snapshot_completed=(c == n_chunks - 1),
                partitions=self._lineage(rows),
                partitioning=self._partitioning(),
            )
            commit_manifest(self.out_dir, m)
            self.notifications.emit(
                "Incremental Snapshot",
                "COMPLETED" if c == n_chunks - 1 else "IN_PROGRESS",
                {"table": self.table_name, "chunk": c, "n_chunks": n_chunks,
                 "tag": tag, "window_id": wid},
            )
            out.append(m)
        return out

    @staticmethod
    def _conditions_filter(conds):
        """Compile a signal's ``additional-conditions`` into a vectorized
        batch filter. Upstream (AbstractIncrementalSnapshotChangeEventSource)
        appends the signal's condition text to every chunk SELECT; this
        engine has no SQL parser, so a condition is a structured triple
        ``{"column": c, "op": one of == != < <= > >=, "value": v}`` compiled
        to a pyarrow.compute kernel. NULLs never satisfy a condition (SQL
        WHERE semantics)."""
        ops = {
            "==": pc.equal, "!=": pc.not_equal,
            "<": pc.less, "<=": pc.less_equal,
            ">": pc.greater, ">=": pc.greater_equal,
        }
        triples = [
            (c["column"], ops[c.get("op", "==")], c["value"]) for c in conds
        ]

        def flt(batch: pa.Table) -> pa.Table:
            mask = None
            for col, op, val in triples:
                m = op(batch[col],
                       pa.scalar(val, batch.schema.field(col).type))
                mask = m if mask is None else pc.and_(mask, m)
            if mask is None:
                return batch
            return batch.filter(pc.fill_null(mask, False))

        return flt

    def drain_signals(self, lake_source) -> list[WindowManifest]:
        """Process every pending signal — the reference's SignalProcessor
        poll between streaming iterations (Db2ConnectorTask.java:142-161).
        ``lake_source`` is a zero-arg callable returning the current source
        lake Dataset (called only if a snapshot signal arrives).

        A signal is acked durably only AFTER all manifests its action
        produced have committed; a kill mid-action leaves it pending and the
        re-run is idempotent (chunk-resume + LWW)."""
        import logging

        from debezium_connector_db2_ray.state.signals import (
            is_paused,
            mark_processed,
            pending_signals,
            set_paused,
        )

        log = logging.getLogger(__name__)
        out: list[WindowManifest] = []
        sigs = pending_signals(self.out_dir)
        # stop-snapshot cancels a pending/incomplete execute-snapshot by
        # tag (data {"tag": <signal id>} or {"tag": "all"}) — collected
        # up-front so a stop enqueued AFTER a killed-mid-chunks snapshot
        # cancels its resumption, matching the reference's
        # StopSnapshotAction on in-flight incremental snapshots
        stop_tags = {
            (s.data or {}).get("tag", "all")
            for s in sigs if s.type == "stop-snapshot"
        }
        stop_all = "all" in stop_tags
        # control-plane signals (stop/pause/resume) apply BEFORE the
        # data-plane pass, in enqueue order — so a resume enqueued after a
        # paused execute lets THIS drain run it (the reference's signal
        # actions mutate coordinator state before the next poll acts)
        control = [s for s in sigs if s.type in (
            "stop-snapshot", "pause-snapshot", "resume-snapshot")]
        for sig in control:
            if sig.type == "stop-snapshot":
                log.info("stop-snapshot: cancelling %s", stop_tags)
            elif sig.type == "pause-snapshot":
                set_paused(self.out_dir, True)
            else:
                set_paused(self.out_dir, False)
            mark_processed(self.out_dir, sig.id)
            self.notifications.emit(
                "Signal", "PROCESSED",
                {"signal_id": sig.id, "type": sig.type},
            )
        for sig in sigs:
            if sig in control:
                continue
            if sig.type == "execute-snapshot":
                if stop_all or sig.id in stop_tags:
                    self.notifications.emit(
                        "Incremental Snapshot", "ABORTED",
                        {"signal_id": sig.id},
                    )
                    mark_processed(self.out_dir, sig.id)
                    continue
                if is_paused(self.out_dir):
                    # paused: leave the signal PENDING (not acked) so a
                    # later resume-snapshot drain picks it up — the
                    # reference's PauseIncrementalSnapshot semantics
                    self.notifications.emit(
                        "Incremental Snapshot", "PAUSED",
                        {"signal_id": sig.id},
                    )
                    continue
            if sig.type == "execute-snapshot":
                mode = (sig.data or {}).get("type", "INCREMENTAL").upper()
                wm = committed_watermark(self.out_dir)
                fence = wm if wm is not None else Lsn(0, 0)
                conds = [
                    c.get("filter", c)
                    for c in (sig.data or {}).get(
                        "additional-conditions", []
                    )
                ]
                src = lake_source
                if conds:
                    # the signal's additional-conditions narrow THIS
                    # snapshot's chunk reads only — the upstream mechanism
                    # for filtered incremental snapshots (snapshot SELECT
                    # overrides never apply here)
                    flt = self._conditions_filter(conds)
                    src = (lambda base=lake_source, flt=flt:
                           base().map_batches(flt, batch_format="pyarrow"))
                if mode == "BLOCKING":
                    # stop-the-stream re-snapshot; streaming resumes at the
                    # same watermark after (BlockingSnapshotIT.java:132-138)
                    out.append(self.snapshot(src(), fence, replace=True))
                else:
                    n = int((sig.data or {}).get("chunks", 4))
                    out.extend(
                        self.incremental_snapshot(
                            src(), fence, n_chunks=n, tag=sig.id
                        )
                    )
            elif sig.type == "log":
                log.info("signal log: %s", (sig.data or {}).get("message", ""))
            else:
                log.warning("unknown signal type %r — skipped", sig.type)
            mark_processed(self.out_dir, sig.id)
            self.notifications.emit(
                "Signal", "PROCESSED", {"signal_id": sig.id, "type": sig.type}
            )
        return out

    def replay_window(
        self,
        changelog: "ray.data.Dataset",
        from_lsn: Lsn,
        to_lsn: Lsn,
        *,
        snapshot_completed: bool = True,
        resume_position: dict | None = None,
    ) -> WindowManifest | None:
        """Apply one closed LSN window (fromLsn, toLsn]. Skipped wholesale if
        the committed watermark already covers it (resume semantics). The
        changelog dataset should already be filtered to the window at the
        read (predicate pushdown); a defensive in-pipeline fence filter is
        applied too."""
        wm = committed_watermark(self.out_dir)
        if wm is not None and to_lsn <= wm:
            return None  # already applied — resume skip
        self._check_partitioning()
        wid = next_window_id(self.out_dir)
        delta_dir = os.path.join(self.out_dir, f"delta/w={wid:06d}")

        lo, hi = from_lsn, to_lsn
        inclusive_low = not snapshot_completed  # un-incremented first window
        tagger = tag_partitions(self.num_partitions, self.salt, self.key_columns)
        use_combiner = (self.combiner and not self.validate_pairs) or (
            self.exchange == "write"
        )

        def window_prep(batch: pa.Table) -> pa.Table:
            """Fused window filter + partition tag + optional partial LWW
            collapse — one pass per (large) batch."""
            chi = batch["commit_lsn_hi"].to_numpy(zero_copy_only=False)
            clo = batch["commit_lsn_lo"].to_numpy(zero_copy_only=False)
            above = (chi > lo.hi) | ((chi == lo.hi) & (clo > lo.lo))
            if inclusive_low:
                above |= (chi == lo.hi) & (clo == lo.lo)
            below = (chi < hi.hi) | ((chi == hi.hi) & (clo <= hi.lo))
            if not (above & below).all():
                batch = batch.filter(pa.array(above & below))
            batch = tagger(batch)
            if use_combiner and self.exchange != "write":
                # partial collapse bounds shuffle volume by touched keys
                # (fragment_writer does its own collapse in write mode)
                batch = lww_collapse(batch, validate_pairs=False, partial=True,
                                     key_columns=self.key_columns)
            return batch

        if self.exchange == "write":
            writer = fragment_writer(delta_dir, key_columns=self.key_columns)

            def prep_write(batch: pa.Table) -> pa.Table:
                return writer(window_prep(batch))

            rows = changelog.map_batches(
                prep_write, batch_format="pyarrow", batch_size=self.batch_size
            ).take_all()
        else:
            ds = changelog.map_batches(
                window_prep, batch_format="pyarrow", batch_size=self.batch_size
            )
            ds = ds.groupby(PART_COL).map_groups(
                staged_writer(delta_dir, validate_pairs=self.validate_pairs,
                              key_columns=self.key_columns),
                batch_format="pyarrow",
            )
            rows = ds.take_all()
        m = WindowManifest(
            window_id=wid,
            kind="stream",
            from_lsn=from_lsn.hex(),
            to_lsn=to_lsn.hex(),
            snapshot_completed=snapshot_completed,
            partitions=self._lineage(rows),
            partitioning=self._partitioning(),
            resume_position=resume_position,
        )
        commit_manifest(self.out_dir, m)
        # ALTER schema event when this window's payload schema differs from
        # the governing one (capture-instance switch,
        # Db2StreamingChangeEventSource.java:324-336)
        try:
            self._record_schema("ALTER", from_lsn, _arrow_schema(changelog))
        except Exception:
            pass  # schema introspection is best-effort lineage, never fatal
        if self.auto_compact:
            from debezium_connector_db2_ray.metrics import read_amplification

            if read_amplification(self.out_dir) > self.compact_trigger:
                self.compact()
        return m

    def replay_from_parquet(
        self,
        changelog_path: str,
        from_lsn: Lsn,
        to_lsn: Lsn,
        n_windows: int,
        *,
        snapshot_completed: bool = True,
        on_missing: str = "raise",  # "raise" | "skip"
        signal_lake=None,  # zero-arg callable -> lake Dataset; enables signals
    ) -> list[WindowManifest]:
        """Windowed replay of a changelog parquet with LSN predicate PUSHDOWN:
        each window reads only the row groups whose commit-LSN stats intersect
        it (prune at the read — a real log is roughly LSN-ordered, so row
        groups have tight LSN ranges). Assumes single-segment LSNs
        (commit_lsn_hi constant per file) for the pushdown expression; the
        in-pipeline fence filter remains authoritative.

        The read is bounded to ~num_partitions blocks: Ray's sort-based
        shuffle schedules O(blocks^2) map/merge work, so letting the read
        default to hundreds of small blocks makes the per-window shuffle
        ANTI-scale with cluster size (measured 26s -> 3.6s per 2.2M-event
        window at 32 cpus by bounding blocks)."""
        import logging

        import pyarrow.dataset as pads

        if not os.path.exists(changelog_path):
            # vanished change table: the reference logs and drops the table,
            # continuing with the rest of the stream
            # (Db2StreamingChangeEventSource.java:338-348)
            if on_missing == "skip":
                logging.getLogger(__name__).error(
                    "changelog %s vanished — skipping (reference behavior: "
                    "drop table, continue)", changelog_path
                )
                return []
            raise FileNotFoundError(changelog_path)

        nb = max(16, min(128, self.num_partitions))
        out = []
        first = True
        for lo, hi in plan_windows(from_lsn.increment(), to_lsn, n_windows):
            if signal_lake is not None:
                # drain the signal channel between windows — backfill chunks
                # and blocking snapshots interleave with streaming
                out.extend(self.drain_signals(signal_lake))
            # With snapshot_completed=False the FIRST window replays the
            # un-incremented watermark event itself (reference
            # shouldIncreaseFromLsn semantics), so its pushdown lower bound
            # must be inclusive or the fence-LSN event is pruned at the read
            # before replay_window's inclusive_low branch ever sees it.
            incl = first and not snapshot_completed
            if lo.hi == hi.hi:
                lo_expr = (
                    pads.field("commit_lsn_lo") >= lo.lo
                    if incl
                    else pads.field("commit_lsn_lo") > lo.lo
                )
                flt = lo_expr & (pads.field("commit_lsn_lo") <= hi.lo)
            else:
                flt = None
            wm = committed_watermark(self.out_dir)
            if wm is not None and hi <= wm:
                first = False
                continue  # already applied — skip BEFORE paying the
                # driver-side offset-stats read (replay_window re-checks)
            ds = ray.data.read_parquet(
                changelog_path, filter=flt, override_num_blocks=nb
            )
            m = self.replay_window(
                ds, lo, hi,
                snapshot_completed=snapshot_completed if first else True,
                resume_position=_window_resume_position(
                    changelog_path, lo, hi, incl
                ),
            )
            first = False
            if m is not None:
                out.append(m)
        return out

    # ---- reads ------------------------------------------------------------

    def _default_fill(self) -> dict:
        """{column -> (arrow type, typed default)} for columns the governing
        schema records a DEFAULT expression for — materialized per FILE at
        every merge-on-read so pre-ALTER rows carry the typed value."""
        from debezium_connector_db2_ray.schema import defaults_from_schema

        bounds = self.schema_history.boundaries(self.table_name)
        if not bounds:
            return {}
        payload = bounds[-1][1]
        vals = defaults_from_schema(payload)
        return {c: (payload.field(c).type, v) for c, v in vals.items()}

    def state_dataset(self, *, keep_meta: bool = False) -> "ray.data.Dataset":
        """Current lake state, merge-on-read: one task per hash partition
        reads ONLY that partition's committed files and collapses them — no
        shuffle (files are already partitioned by key hash)."""
        by_part = partition_files(self.out_dir)
        items = [{"partition": k, "files": v} for k, v in sorted(by_part.items())]
        if not items:
            return ray.data.from_items([])
        # governing payload schema from the durable history: partitions whose
        # winners predate an ALTER are conformed (null-backfill + widening)
        # so the output Dataset is schema-homogeneous across blocks
        hist = self.schema_history
        bounds = hist.boundaries(self.table_name)
        latest_payload = bounds[-1][1] if bounds else None
        keys = self.key_columns
        fill = self._default_fill()

        def read_partition(batch: pa.Table) -> pa.Table:
            outs = []
            for row in batch.to_pylist():
                t = read_partition_table(
                    row["files"], row["partition"], default_fill=fill
                )
                if t is None:
                    continue
                collapsed = lww_collapse(
                    t.drop_columns([PART_COL]), validate_pairs=False,
                    key_columns=keys,
                )
                st = final_state(collapsed, keep_meta=keep_meta)
                if latest_payload is not None and not keep_meta:
                    from debezium_connector_db2_ray.schema import (
                        defaults_from_schema,
                        unify_payload_schemas,
                    )

                    target = unify_payload_schemas(latest_payload, st.schema)
                    # columns an ALTER added WITH a DEFAULT backfill typed
                    # values into pre-ALTER rows, not nulls
                    # (AbstractDb2DefaultValueIT)
                    st = conform_table(
                        st, target, defaults=defaults_from_schema(target)
                    )
                outs.append(st)
            if not outs:
                return pa.table({})
            return pa.concat_tables(outs, promote_options="permissive")

        return ray.data.from_items(items).map_batches(
            read_partition, batch_format="pyarrow", batch_size=1
        )

    def compact(self) -> WindowManifest:
        """Fold base + deltas into fresh per-partition base files and commit a
        compaction manifest; older files become dead (merge-on-read cost
        reset). Tombstones are dropped — nothing older remains to shadow.

        Compaction RE-TAGS every surviving row under the engine's CURRENT
        (num_partitions, salt), so it doubles as the repartitioning barrier:
        to change partitioning (e.g. after metrics.suggest_salt), construct
        the engine with the new settings and run compact() before replaying
        further windows."""
        wid = next_window_id(self.out_dir)
        delta_dir = os.path.join(self.out_dir, f"delta/w={wid:06d}")
        wm = committed_watermark(self.out_dir)
        by_part = partition_files(self.out_dir)
        items = [{"partition": k, "files": v} for k, v in sorted(by_part.items())]
        tagger = tag_partitions(self.num_partitions, self.salt, self.key_columns)

        keys = self.key_columns
        fill = self._default_fill()

        def compact_partition(batch: pa.Table) -> pa.Table:
            out = []
            writer = fragment_writer(delta_dir, key_columns=self.key_columns)
            for row in batch.to_pylist():
                t = read_partition_table(
                    row["files"], row["partition"], default_fill=fill
                )
                if t is None:
                    continue
                collapsed = lww_collapse(
                    t.drop_columns([PART_COL]), validate_pairs=False,
                    key_columns=keys,
                )
                if collapsed.num_rows:
                    collapsed = collapsed.filter(
                        pc.not_equal(collapsed["op"], OP_DELETE)
                    )
                if collapsed.num_rows == 0:
                    continue
                out.append(writer(tagger(collapsed)))
            if not out:
                return _MANIFEST_ROW_SCHEMA.empty_table()
            return pa.concat_tables(out)

        rows = (
            ray.data.from_items(items)
            .map_batches(compact_partition, batch_format="pyarrow", batch_size=1)
            .take_all()
        )
        m = WindowManifest(
            window_id=wid,
            kind="compaction",
            from_lsn=None,
            to_lsn=wm.hex() if wm else None,
            snapshot_completed=True,
            partitions=self._lineage(rows),
            partitioning=self._partitioning(),
        )
        commit_manifest(self.out_dir, m)
        self.notifications.emit(
            "Compaction", "COMPLETED",
            {"table": self.table_name, "window_id": wid},
        )
        return m

    # ---- helpers ----------------------------------------------------------

    @staticmethod
    def _lineage(rows: list[dict]) -> dict[str, dict]:
        out = {}
        for r in rows:
            pl = PartitionLineage(
                partition=int(r["partition"]),
                rows=int(r["rows"]),
                files=[r["file"]],
                op_counts=json.loads(r["op_counts"]),
                min_lsn=r["min_lsn"],
                max_lsn=r["max_lsn"],
            )
            key = str(pl.partition)
            if key in out:  # same partition from multiple groups (salting)
                prev = out[key]
                prev["rows"] += pl.rows
                prev["files"].extend(pl.files)
                for k, v in pl.op_counts.items():
                    prev["op_counts"][k] = prev["op_counts"].get(k, 0) + v
                # lsn range = union over the salted groups (min of mins /
                # max of maxes), not first-group-wins
                for attr, pick in (("min_lsn", min), ("max_lsn", max)):
                    a, b = prev.get(attr), getattr(pl, attr)
                    prev[attr] = pick(a, b) if a and b else (a or b)
            else:
                out[key] = pl.__dict__
        return out


def apply_dataset(
    changelog: "ray.data.Dataset",
    *,
    num_partitions: int = 32,
    salt: int = 1,
    snapshot: "ray.data.Dataset | None" = None,
    snapshot_lsn: Lsn | None = None,
    validate_pairs: bool = True,
    combiner: bool = False,
    keep_meta: bool = False,
    key_columns: tuple[str, ...] | None = None,
    batch_size: int = 400_000,
    post_kernel=None,
) -> "ray.data.Dataset":
    """One-shot in-memory replay (no sink/manifest): decode -> hash shuffle ->
    per-partition LWW apply -> final state Dataset. The building block for
    ad-hoc queries; the durable path is CdcEngine. ``combiner`` adds the
    per-batch partial collapse before the shuffle (requires
    validate_pairs=False).

    ``post_kernel`` (optional, ``pa.Table -> pa.Table``) runs on each
    partition's APPLIED state inside the same map_groups task — the hook
    for per-conversation analytics that need every row of a key
    co-located: because the shuffle hash-partitions on the key prefix
    (conv_id), a conversation is always entirely inside one kernel call,
    so conversation-level folds ride the apply exchange with ZERO
    additional shuffle at any corpus size."""
    from debezium_connector_db2_ray.stages.apply import fence_filter

    fence = snapshot_lsn

    target: pa.Schema | None = None
    if snapshot is not None:
        # additive schema unification up front so the unioned stream is
        # homogeneous through the shuffle (snapshot payload first, changelog
        # additions appended — Debezium additive ALTER order)
        from debezium_connector_db2_ray.schema import (
            CHANGELOG_META_FIELDS,
            unify_payload_schemas,
        )

        cl_schema = pa.schema(
            [f for f in _arrow_schema(changelog) if f.name not in META_SET]
        )
        payload = unify_payload_schemas(_arrow_schema(snapshot), cl_schema)
        target = pa.schema(list(CHANGELOG_META_FIELDS) + list(payload))

    if combiner and validate_pairs:
        raise ValueError("combiner requires validate_pairs=False")
    tagger = tag_partitions(num_partitions, salt)
    from debezium_connector_db2_ray.schema import KEY_COLUMNS

    keys = tuple(key_columns) if key_columns else KEY_COLUMNS

    def prep(batch: pa.Table) -> pa.Table:
        if fence is not None:
            batch = fence_filter(batch, fence)
        if target is not None:
            batch = conform_table(batch, target)
        batch = tagger(batch)
        if combiner:
            batch = lww_collapse(
                batch, validate_pairs=False, partial=True, key_columns=keys
            )
        return batch

    ds = changelog.map_batches(prep, batch_format="pyarrow", batch_size=batch_size)
    if snapshot is not None:
        if fence is None:
            raise ValueError("snapshot requires snapshot_lsn")

        def snap_prep(batch: pa.Table) -> pa.Table:
            batch = snapshot_as_events(batch, fence)
            if target is not None:
                batch = conform_table(batch, target)
            return tagger(batch)

        ds = ds.union(
            snapshot.map_batches(snap_prep, batch_format="pyarrow", batch_size=batch_size)
        )

    def apply_group(group: pa.Table) -> pa.Table:
        collapsed = lww_collapse(
            group.drop_columns([PART_COL]),
            validate_pairs=validate_pairs,
            key_columns=keys,
        )
        state = final_state(collapsed, keep_meta=keep_meta)
        if post_kernel is not None:
            return post_kernel(state)
        return state

    return ds.groupby(PART_COL).map_groups(apply_group, batch_format="pyarrow")


_LSN_COLS = ["commit_lsn_hi", "commit_lsn_lo", "intent_lsn_hi", "intent_lsn_lo"]


def _window_resume_position(
    changelog_path: str, lo: Lsn, hi: Lsn, inclusive_low: bool
) -> dict | None:
    """The offset triplet of a window's LAST event ({commit_lsn, change_lsn,
    event_serial_no}, Db2OffsetContext.java:66-80), computed DRIVER-SIDE
    from parquet row-group statistics: only the group(s) whose commit-LSN
    stats can still contain the window's max commit are read, and only the
    four LSN columns of those groups — for an LSN-clustered log that is one
    row group per window, with no Ray job launch at all (the earlier
    cluster-pass version added seconds of fixed overhead per window).
    serial = the final commit's total row count (windows align to commit
    boundaries). Single-segment LSNs assumed (like the read pushdown);
    multi-segment windows return None."""
    if lo.hi != hi.hi:
        return None
    lo_v, hi_v = lo.lo, hi.lo

    import pyarrow.dataset as pads

    try:
        dset = pads.dataset(changelog_path)
        groups = []  # (known_max | None, path, rg_index, known_min | None)
        for frag in dset.get_fragments():
            for rg in frag.row_groups:
                st = rg.statistics or {}
                s = st.get("commit_lsn_lo") or {}
                groups.append((s.get("max"), frag.path, rg.id, s.get("min")))
    except Exception:
        return None  # not introspectable (e.g. non-parquet source)
    # visit groups in descending order of their max stat (unknown first —
    # they could contain anything)
    groups.sort(key=lambda g: (g[0] is not None, -(g[0] or 0)))
    best = None  # (chi, clo) of the max in-window commit found so far
    serial = 0
    imax = (0, 0)
    readers: dict[str, pq.ParquetFile] = {}
    for gmax, path, rg_idx, gmin in groups:
        if gmin is not None and gmin > hi_v:
            continue  # whole group above the window
        if best is not None and gmax is not None and gmax < best[1]:
            break  # no later group can contain the best commit
        f = readers.get(path)
        if f is None:
            f = readers[path] = pq.ParquetFile(path)
        t = f.read_row_group(rg_idx, columns=_LSN_COLS)
        chi = t["commit_lsn_hi"].to_numpy(zero_copy_only=False).astype(np.uint64)
        clo = t["commit_lsn_lo"].to_numpy(zero_copy_only=False).astype(np.uint64)
        in_w = (chi == lo.hi) & (
            (clo >= lo_v) if inclusive_low else (clo > lo_v)
        ) & (clo <= hi_v)
        if not in_w.any():
            continue
        order = np.lexsort((clo[in_w], chi[in_w]))
        mhi, mlo = int(chi[in_w][order[-1]]), int(clo[in_w][order[-1]])
        if best is None or (mhi, mlo) > best:
            best, serial, imax = (mhi, mlo), 0, (0, 0)
        if (mhi, mlo) == best:
            at = in_w & (chi == np.uint64(mhi)) & (clo == np.uint64(mlo))
            serial += int(at.sum())
            ihi = t["intent_lsn_hi"].to_numpy(zero_copy_only=False).astype(np.uint64)[at]
            ilo = t["intent_lsn_lo"].to_numpy(zero_copy_only=False).astype(np.uint64)[at]
            io = np.lexsort((ilo, ihi))
            imax = max(imax, (int(ihi[io[-1]]), int(ilo[io[-1]])))
    if best is None:
        return None
    return {
        "commit_lsn": lsn_hex(best[0], best[1]),
        "change_lsn": lsn_hex(imax[0], imax[1]),
        "event_serial_no": int(serial),
    }


def plan_windows(min_lsn: Lsn, max_lsn: Lsn, n_windows: int) -> list[tuple[Lsn, Lsn]]:
    """Slice (min_lsn-1, max_lsn] into n contiguous closed windows — the batch
    equivalent of the reference's timespan-bounded polling
    (Db2Connection.java:118-170). Bounds are (exclusive, inclusive]."""
    lo = min_lsn.to_int() - 1
    hi = max_lsn.to_int()
    if hi <= lo or n_windows <= 1:
        return [(Lsn.from_int(max(lo, 0)), max_lsn)]
    edges = np.linspace(lo, hi, n_windows + 1).astype(object)
    out = []
    prev = lo
    for e in edges[1:]:
        e = int(e)
        if e <= prev:
            continue
        out.append((Lsn.from_int(prev), Lsn.from_int(e)))
        prev = e
    if out and out[-1][1].to_int() != hi:
        out[-1] = (out[-1][0], Lsn.from_int(hi))
    return out
