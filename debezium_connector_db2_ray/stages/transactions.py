"""Transaction-metadata feed: BEGIN / data / END event streams.

Mirrors the reference's transaction-metadata topic: a BEGIN record per
transaction, each data record carrying ``{id, total_order,
data_collection_order}``, and an END record with the total event count and
per-collection counts (reference: TransactionMetadataIT.java:63-119; serial
arithmetic Db2OffsetContext.java:95-104).

Vectorized kernel over a fragment that contains every row of each transaction
it covers — partition by hash(tx id), which is commit-local like opcode
classification.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from debezium_connector_db2_ray.lsn import lsn_hex_array, position_order


def transaction_feed(
    fragment: pa.Table,
    *,
    tx_hi_col: str = "commit_lsn_hi",
    tx_lo_col: str = "commit_lsn_lo",
    collection_col: str | None = None,
) -> pa.Table:
    """Emit the BEGIN/data/END feed for the transactions in ``fragment``.

    Output columns: ``kind`` ('BEGIN'|'DATA'|'END'), ``tx_id`` (the commit
    LSN as its colon-grouped hex string — the reference's transaction id is
    the full Lsn string, Lsn.java:65-86, so two transactions sharing a low
    half but differing in the high half stay distinct and values above 2^63
    can't wrap), ``total_order`` (1-based position of a data event within its
    tx; null on BEGIN/END), ``event_count`` (END only), plus the key columns
    on data rows."""
    t = fragment.take(
        position_order(
            fragment[tx_hi_col].to_numpy(zero_copy_only=False),
            fragment[tx_lo_col].to_numpy(zero_copy_only=False),
            fragment["intent_lsn_hi"].to_numpy(zero_copy_only=False),
            fragment["intent_lsn_lo"].to_numpy(zero_copy_only=False),
        )
    )
    n = t.num_rows
    if n == 0:
        return pa.table(
            {
                "kind": pa.array([], pa.string()),
                "tx_id": pa.array([], pa.string()),
                "total_order": pa.array([], pa.int64()),
                "event_count": pa.array([], pa.int64()),
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
            }
        )
    tx_hi = t[tx_hi_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    tx_lo = t[tx_lo_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    new_tx = np.ones(n, dtype=bool)
    new_tx[1:] = (tx_hi[1:] != tx_hi[:-1]) | (tx_lo[1:] != tx_lo[:-1])
    starts = np.flatnonzero(new_tx)
    counts = np.diff(np.append(starts, n))
    # total_order: 1-based index within each tx
    total_order = np.arange(n, dtype=np.int64) - np.repeat(starts, counts) + 1
    # tx_id hex: vectorized '%08x:%08x:%016x' over the (hi, lo) halves
    uniq_hex = lsn_hex_array(tx_hi[starts], tx_lo[starts])
    tx_hex = np.repeat(uniq_hex, counts)
    uniq_tx = uniq_hex

    conv = t["conv_id"]
    turn = t["turn_idx"]
    data = pa.table(
        {
            "kind": pa.array(np.full(n, "DATA"), pa.string()),
            "tx_id": pa.array(tx_hex, pa.string()),
            "total_order": pa.array(total_order, pa.int64()),
            "event_count": pa.nulls(n, pa.int64()),
            "conv_id": conv.combine_chunks() if isinstance(conv, pa.ChunkedArray) else conv,
            "turn_idx": turn.combine_chunks() if isinstance(turn, pa.ChunkedArray) else turn,
        }
    )
    m = len(uniq_tx)
    begin = pa.table(
        {
            "kind": pa.array(np.full(m, "BEGIN"), pa.string()),
            "tx_id": pa.array(uniq_tx, pa.string()),
            "total_order": pa.nulls(m, pa.int64()),
            "event_count": pa.nulls(m, pa.int64()),
            "conv_id": pa.nulls(m, pa.string()),
            "turn_idx": pa.nulls(m, pa.int32()),
        }
    )
    end = pa.table(
        {
            "kind": pa.array(np.full(m, "END"), pa.string()),
            "tx_id": pa.array(uniq_tx, pa.string()),
            "total_order": pa.nulls(m, pa.int64()),
            "event_count": pa.array(counts.astype(np.int64), pa.int64()),
            "conv_id": pa.nulls(m, pa.string()),
            "turn_idx": pa.nulls(m, pa.int32()),
        }
    )
    return pa.concat_tables([begin, data, end])
