"""Notification channel — the reference's NotificationService analog
(wired alongside the signal channel in Db2ConnectorTask.java:142-161;
behavior pinned by NotificationsIT via Debezium core's
AbstractNotificationsIT: each notification is {id, aggregate_type, type,
additional_data, timestamp} and snapshot progress emits
STARTED / IN_PROGRESS / COMPLETED).

Batch-shaped equivalent: an append-only JSONL file under
``<lake>/_notifications.jsonl``. Appends are single atomic writes of one
line; readers tail the file. The engine emits on snapshot phases,
incremental-snapshot chunks, compactions and signal processing."""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass, field
from typing import Any

NOTIFICATIONS_FILE = "_notifications.jsonl"


@dataclass
class Notification:
    id: str
    aggregate_type: str  # e.g. "Initial Snapshot", "Incremental Snapshot"
    type: str  # STARTED | IN_PROGRESS | TABLE_SCAN_COMPLETED | COMPLETED | ...
    additional_data: dict[str, Any] = field(default_factory=dict)
    timestamp: int = 0  # epoch millis


class NotificationLog:
    def __init__(self, out_dir: str):
        self.path = os.path.join(out_dir, NOTIFICATIONS_FILE)

    def emit(self, aggregate_type: str, type: str,
             additional_data: dict | None = None) -> Notification:
        n = Notification(
            id=uuid.uuid4().hex,
            aggregate_type=aggregate_type,
            type=type,
            additional_data=additional_data or {},
            timestamp=int(time.time() * 1000),
        )
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        line = json.dumps(asdict(n), sort_keys=True)
        with open(self.path, "a") as f:
            f.write(line + "\n")
            f.flush()
            os.fsync(f.fileno())
        return n

    def read(self) -> list[Notification]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(Notification(**json.loads(line)))
        return out
