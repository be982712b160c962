"""Event-metadata provider — the tracing/telemetry view of an envelope feed.

Reference: ``Db2EventMetadataProvider.java:19-59`` exposes, per change
event, (a) the event timestamp read from the source block's ``ts_ms``,
(b) the source position as a ``{commit_lsn, change_lsn}`` map, and (c) the
transaction id, which for this connector IS the commit LSN (the reference
returns ``sourceInfo.getString(COMMIT_LSN_KEY)`` for both the position's
commit entry and the transaction id).

Ray-side analog: instead of a per-event callback object, the same three
facts are derived as COLUMNS over an envelope table that already carries
the flat ``source_*`` block (:func:`stages.envelope.with_source_info`) —
one vectorized projection per batch, no per-row hook. ActivateTracing /
MDC-style consumers read the columns; nothing is computed per row in
Python.
"""

from __future__ import annotations

import pyarrow as pa

#: the source-block columns the provider consumes (flat layout emitted by
#: with_source_info — Db2SourceInfoStructMaker.java:21-27)
_REQUIRED = ("source_ts_ms", "source_commit_lsn", "source_change_lsn")


def event_metadata(env: pa.Table) -> pa.Table:
    """Project the reference's three metadata facts from an envelope batch:

    - ``event_ts_ms``: the source-block timestamp (epoch millis, null when
      the source block carries none — ``getEventTimestamp`` returns null
      for a null timestamp, Db2EventMetadataProvider.java:22-32),
    - ``commit_lsn`` / ``change_lsn``: the source position map entries
      (``getEventSourcePosition``, :40-46), colon-hex strings,
    - ``transaction_id``: the commit LSN verbatim (``getTransactionId``
      returns COMMIT_LSN_KEY, :49-58).

    Identity/event-key columns present in ``env`` are NOT carried — this is
    the provider view, not the envelope; zip the result back column-wise
    (same row order) or use :func:`with_event_metadata` to append in place.
    """
    missing = [c for c in _REQUIRED if c not in env.column_names]
    if missing:
        raise ValueError(
            f"envelope batch lacks source-info columns {missing}; run "
            "stages.envelope.with_source_info first"
        )
    return pa.table(
        {
            "event_ts_ms": env["source_ts_ms"],
            "commit_lsn": env["source_commit_lsn"],
            "change_lsn": env["source_change_lsn"],
            "transaction_id": env["source_commit_lsn"],
        }
    )


def append_event_metadata(env: pa.Table) -> pa.Table:
    """``env`` with the four provider columns appended — the batch kernel
    for :func:`with_event_metadata`."""
    meta = event_metadata(env)
    out = env
    for name in meta.column_names:
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, meta[name])
    return out


def with_event_metadata(ds):
    """Dataset form: append ``event_ts_ms / commit_lsn / change_lsn /
    transaction_id`` to every envelope — a zero-shuffle map stage."""
    return ds.map_batches(append_event_metadata, batch_format="pyarrow")
