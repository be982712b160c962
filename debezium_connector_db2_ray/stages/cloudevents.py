"""CloudEvents serialization of change events.

Mirrors the reference's CloudEvents converter: event id is composed from the
logical name and the change/commit LSNs
(reference: converters/Db2CloudEventsMaker.java:36-46 —
``name:<logical>;change_lsn:<lsn>;commit_lsn:<lsn>`` — provider
converters/Db2CloudEventsProvider.java:19-28, exercised
Db2ConnectorIT.java:873-909).

Vectorized batch stage over envelope rows (see stages/envelope.py): emits the
structured attribute columns plus one serialized JSON string per event.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from debezium_connector_db2_ray.lsn import lsn_hex

CE_SPECVERSION = "1.0"
CE_TYPE = "dev.raycdc.transcripts.DataChangeEvent"


def _hex_col(hi: pa.ChunkedArray | pa.Array, lo) -> pa.Array:
    """'xxxxxxxx:xxxxxxxx:xxxxxxxxxxxxxxxx' per row (Lsn.java:65-86 layout)."""
    h = np.asarray(hi.to_numpy(zero_copy_only=False), dtype=np.uint64)
    l = np.asarray(lo.to_numpy(zero_copy_only=False), dtype=np.uint64)
    full = [lsn_hex(int(a), int(b)) for a, b in zip(h, l)]
    return pa.array(full, pa.string())


def to_cloudevents(envelopes: pa.Table, *, logical_name: str = "server1") -> pa.Table:
    """Envelope rows -> CloudEvents attribute columns + serialized JSON.

    ce_id = 'name:<logical>;change_lsn:<intent hex>;commit_lsn:<commit hex>'
    (the reference uses the streamed change LSN as change_lsn)."""
    commit_hex = _hex_col(envelopes["commit_lsn_hi"], envelopes["commit_lsn_lo"])
    change_hex = _hex_col(envelopes["intent_lsn_hi"], envelopes["intent_lsn_lo"])
    ce_id = pc.binary_join_element_wise(
        f"name:{logical_name};change_lsn:",
        change_hex,
        ";commit_lsn:",
        commit_hex,
        "",
    )
    n = envelopes.num_rows
    ce_source = pa.array([f"/debezium/db2ray/{logical_name}"] * n, pa.string())
    ce_type = pa.array([CE_TYPE] * n, pa.string())

    data_cols = [
        c for c in envelopes.column_names
        if c in ("op_char", "conv_id", "turn_idx", "serial")
        or c.startswith(("before_", "after_"))
    ]
    rows = envelopes.select(data_cols).to_pylist()
    ids = ce_id.to_pylist() if hasattr(ce_id, "to_pylist") else list(ce_id)
    payload = pa.array(
        [
            json.dumps(
                {
                    "specversion": CE_SPECVERSION,
                    "id": i,
                    "source": f"/debezium/db2ray/{logical_name}",
                    "type": CE_TYPE,
                    "data": r,
                },
                sort_keys=True,
                default=str,
            )
            for i, r in zip(ids, rows)
        ],
        pa.string(),
    )
    out = envelopes.append_column("ce_id", ce_id)
    out = out.append_column("ce_source", ce_source)
    out = out.append_column("ce_type", ce_type)
    out = out.append_column("ce_json", payload)
    return out
