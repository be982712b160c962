"""Single-threaded reference apply — the test oracle.

Replays a change log in strict ``(commit_lsn, intent_lsn)`` order against the
snapshot state, exactly as the reference's serial k-way merge consumer would
(reference: Db2StreamingChangeEventSource.java:176-292):

- rows at or below the snapshot fence are skipped once the snapshot completed
  (shouldIncreaseFromLsn semantics, :129-131,157-160);
- NULL-LSN rows are skipped (:203-207);
- op=3 (UPDATE_BEFORE) must be immediately followed by op=4 (UPDATE_AFTER)
  with the same commit_lsn — otherwise ``OrphanBeforeImageError``
  (IllegalStateException at :254-264);
- op semantics: 1 delete, 2 insert, 4/5 update-after image, 0 snapshot read.

Intentionally slow, row-at-a-time Python — it exists to pin the semantics the
parallel Ray engine must reproduce, never for production data.
"""

from __future__ import annotations

import pyarrow as pa

from debezium_connector_db2_ray.lsn import Lsn
from debezium_connector_db2_ray.ops import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_AFTER,
    OP_UPDATE_BEFORE,
    OP_UPDATE_SINGLE,
)
from debezium_connector_db2_ray.schema import KEY_COLUMNS


class OrphanBeforeImageError(RuntimeError):
    """An UPDATE_BEFORE row without its immediately-following UPDATE_AFTER
    (reference: Db2StreamingChangeEventSource.java:254-264)."""


def oracle_apply(
    lake: pa.Table,
    changelog: pa.Table,
    snapshot_lsn: Lsn,
    *,
    snapshot_completed: bool = True,
) -> pa.Table:
    """Return the final lake state as a pyarrow Table sorted by
    (conv_id, turn_idx). Payload columns = union of lake + changelog payload
    columns (additive evolution; missing values null)."""
    meta = {"commit_lsn_hi", "commit_lsn_lo", "intent_lsn_hi", "intent_lsn_lo", "op"}
    payload_cols = [c for c in changelog.column_names if c not in meta]
    lake_cols = list(lake.column_names)
    out_cols = lake_cols + [c for c in payload_cols if c not in lake_cols]

    state: dict[tuple, dict] = {}
    for r in lake.to_pylist():
        key = tuple(r[k] for k in KEY_COLUMNS)
        state[key] = {c: r.get(c) for c in out_cols}

    rows = changelog.to_pylist()
    rows.sort(
        key=lambda r: (
            r["commit_lsn_hi"],
            r["commit_lsn_lo"],
            r["intent_lsn_hi"],
            r["intent_lsn_lo"],
        )
    )
    fence = (snapshot_lsn.hi, snapshot_lsn.lo)
    pending_before: dict | None = None
    for r in rows:
        if r["commit_lsn_hi"] is None or r["commit_lsn_lo"] is None:
            continue  # NULL LSN: skipped with error log in the reference
        pos = (r["commit_lsn_hi"], r["commit_lsn_lo"])
        if snapshot_completed and pos <= fence:
            continue  # snapshot fence: already reflected in the snapshot
        op = r["op"]
        if pending_before is not None:
            if op != OP_UPDATE_AFTER or (
                pending_before["commit_lsn_hi"],
                pending_before["commit_lsn_lo"],
            ) != pos:
                raise OrphanBeforeImageError(
                    f"update before-image at {pending_before} not followed by "
                    f"after-image (next op={op} at {pos})"
                )
            pending_before = None
        if op == OP_UPDATE_BEFORE:
            pending_before = r
            continue
        key = tuple(r[k] for k in KEY_COLUMNS)
        if op == OP_DELETE:
            state.pop(key, None)
        elif op in (OP_INSERT, OP_UPDATE_AFTER, OP_UPDATE_SINGLE):
            state[key] = {c: r.get(c) for c in out_cols}
        else:
            raise ValueError(f"unexpected op {op}")
    if pending_before is not None:
        raise OrphanBeforeImageError(f"trailing before-image {pending_before}")

    out = sorted(state.values(), key=lambda d: tuple(d[k] for k in KEY_COLUMNS))
    if not out:
        return lake.schema.empty_table()
    # build with lake schema for shared columns; new columns inferred
    arrays, fields = [], []
    lake_types = {f.name: f.type for f in lake.schema}
    cl_types = {f.name: f.type for f in changelog.schema}
    for c in out_cols:
        t = lake_types.get(c) or cl_types.get(c)
        arrays.append(pa.array([d[c] for d in out], t))
        fields.append(pa.field(c, t))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))
