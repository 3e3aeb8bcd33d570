"""Declared schemas — never inferred (replay determinism, SURVEY.md §1.4).

The transcript-table shape is exactly BASELINE.json:15's ``input_hint``:
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp). The change-event envelope adds the CDC fields required
by BASELINE.json:6: op kind, lsn (total log order), and — for additive
schema-evolution events — the column being added. ``extra`` is a JSON
object carrying values for evolved columns on post-evolution events.
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Target / lake table: BASELINE.json:15 input_hint, verbatim.
TRANSCRIPT_FIELDS = [
    StructField("conv_id", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
    StructField("role", StringType(), True),
    StructField("text", StringType(), True),
    StructField("tool", StringType(), True),
    StructField("ts", TimestampType(), True),
]
TRANSCRIPT_SCHEMA = StructType(TRANSCRIPT_FIELDS)

# System columns persisted in the lake table so that cross-batch
# last-writer-wins is decidable on MERGE: the stored row remembers the
# (ts, lsn) AND op of the event that produced it — BASELINE.json:6 LWW
# window is over (conv_id, turn_idx, ts, lsn), and deletes must persist
# as tombstones so redelivered older inserts cannot resurrect them.
SYSTEM_LSN = "_lsn"
SYSTEM_OP = "_op"

# Change-event envelope: FIXTURES.md §A2.
EVENT_SCHEMA = StructType(
    [
        StructField("lsn", LongType(), False),
        StructField("op", StringType(), False),  # I / U / D / S
        StructField("conv_id", StringType(), True),  # null only for S
        StructField("turn_idx", IntegerType(), True),  # null only for S
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
        StructField("evo_column", StringType(), True),  # S events only
        StructField("evo_type", StringType(), True),  # S events only
        StructField("extra", StringType(), True),  # JSON: evolved-col values
    ]
)

# Merge keys (BASELINE.json:6: table keyed on (conv_id, turn_idx)).
MERGE_KEYS = ["conv_id", "turn_idx"]
# LWW ordering within a key (BASELINE.json:6): lexicographic (ts, lsn);
# lsn is unique so a deterministic winner always exists.
LWW_ORDER = ["ts", "lsn"]

# Payload columns carried from an event into the table.
PAYLOAD_COLS = ["role", "text", "tool", "ts"]

OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"
OP_SCHEMA = "S"
