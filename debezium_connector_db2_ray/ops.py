"""Operation codes for change events.

Codes 1-5 mirror the raw opcodes the reference classifies in SQL
(reference: Db2ChangeRecordEmitter.java:20-24; classification SQL
platform/LuwPlatform.java:29-39, platform/ZOsPlatform.java:29-49).
Code 0 (READ) is the snapshot-row op — the reference emits snapshot rows as
envelope op 'r' (Db2ConnectorIT.java:1043,1081-1084); we give it a raw code so
snapshot and stream rows can flow through one last-writer-wins apply.

Envelope mapping (reference: Db2ChangeRecordEmitter.java:39-54):
  1 -> 'd' (DELETE), 2 -> 'c' (CREATE), 3+4 -> 'u' (UPDATE pair),
  5 -> 'u' (single-image UPDATE, z/OS), 0 -> 'r' (READ).
"""

from __future__ import annotations

OP_READ = 0  # snapshot row ('r')
OP_DELETE = 1
OP_INSERT = 2
OP_UPDATE_BEFORE = 3
OP_UPDATE_AFTER = 4
OP_UPDATE_SINGLE = 5  # z/OS single-record update: after image only

#: ops that carry the row's surviving (after) image
AFTER_IMAGE_OPS = (OP_READ, OP_INSERT, OP_UPDATE_AFTER, OP_UPDATE_SINGLE)

#: raw opcode -> Debezium envelope op char
ENVELOPE_OP = {
    OP_READ: "r",
    OP_DELETE: "d",
    OP_INSERT: "c",
    OP_UPDATE_BEFORE: "u",
    OP_UPDATE_AFTER: "u",
    OP_UPDATE_SINGLE: "u",
}
