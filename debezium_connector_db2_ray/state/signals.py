"""Durable signal channel — the reference's signal-table/SignalProcessor
analog (Db2ConnectorTask.java:142-161: signal + notification channels are
wired into the coordinator; signals arrive out-of-band and are polled
between streaming iterations).

Batch-shaped equivalent: a signal is one JSON file under
``<lake>/_signals/``, written atomically (temp + rename). The replay loop
drains pending signals between windows; a signal is acknowledged by MOVING
its file to ``_signals/done/`` only after every manifest its action
produced has committed — so a kill mid-action leaves the signal pending
and the action re-runs idempotently on resume (chunked snapshots skip
already-committed chunks; LWW makes re-applies no-ops).

Supported types mirror the reference's actions:
- ``execute-snapshot`` data ``{"type": "INCREMENTAL", "chunks": N}`` —
  signal-triggered chunked backfill interleaved with streaming
  (IncrementalSnapshotIT.java:186-209);
- ``execute-snapshot`` data ``{"type": "BLOCKING"}`` — full re-snapshot
  superseding prior state, streaming resumes after
  (BlockingSnapshotIT.java:132-138);
- ``log`` — write the message to the engine log (the reference's Log
  action);
- ``stop-snapshot`` data ``{"tag": <signal id> | "all"}`` — cancel a
  pending / killed-mid-chunks incremental snapshot before it (re)runs
  (the reference's StopSnapshotAction);
- ``pause-snapshot`` / ``resume-snapshot`` — durable pause latch: while
  paused, execute-snapshot signals stay PENDING un-acked and are picked
  up by the first drain after resume (PauseIncrementalSnapshot /
  ResumeIncrementalSnapshot).
Unknown types are logged and acknowledged (the reference warns and skips).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

SIGNAL_DIR = "_signals"
DONE_DIR = "done"


@dataclass
class Signal:
    id: str
    type: str
    data: dict[str, Any] = field(default_factory=dict)


def _sdir(out_dir: str) -> str:
    return os.path.join(out_dir, SIGNAL_DIR)


def send_signal(
    out_dir: str, type: str, data: dict | None = None, *, id: str | None = None
) -> str:
    """Durably enqueue a signal (atomic temp-write + rename, like manifest
    commits). Returns the signal id. File names order by enqueue time."""
    sid = id or uuid.uuid4().hex
    d = _sdir(out_dir)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"signal-{time.time_ns():020d}-{sid}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"id": sid, "type": type, "data": data or {}}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)
    return sid


def pending_signals(out_dir: str) -> list[Signal]:
    """Unacknowledged signals in enqueue order."""
    d = _sdir(out_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if not (name.startswith("signal-") and name.endswith(".json")):
            continue
        with open(os.path.join(d, name)) as f:
            raw = json.load(f)
        out.append(Signal(id=raw["id"], type=raw["type"], data=raw.get("data", {})))
    return out


def mark_processed(out_dir: str, signal_id: str) -> None:
    """Durable ack: move the signal file into done/ (idempotent)."""
    d = _sdir(out_dir)
    done = os.path.join(d, DONE_DIR)
    os.makedirs(done, exist_ok=True)
    for name in os.listdir(d):
        if name.endswith(f"-{signal_id}.json"):
            os.replace(os.path.join(d, name), os.path.join(done, name))


PAUSE_MARKER = "_paused"


def set_paused(out_dir: str, paused: bool) -> None:
    """Durable pause latch for incremental snapshots (the reference's
    pause-snapshot / resume-snapshot signal pair persists the paused
    state in the offsets; here it is a marker file under _signals/)."""
    p = os.path.join(_sdir(out_dir), PAUSE_MARKER)
    os.makedirs(_sdir(out_dir), exist_ok=True)
    if paused:
        with open(p + ".tmp", "w") as f:
            f.write("paused")
        os.replace(p + ".tmp", p)
    elif os.path.exists(p):
        os.remove(p)


def is_paused(out_dir: str) -> bool:
    return os.path.exists(os.path.join(_sdir(out_dir), PAUSE_MARKER))
