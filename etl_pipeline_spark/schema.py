"""Schemas for the CDC engine.

The logical data model (authoritative per BASELINE.json:input_hint):

- ``transcripts`` lake table: multi-turn conversation/agent transcripts,
  primary key ``(conv_id, turn_idx)``.
- ``change_events`` stream: one row per I/U/D change, totally ordered by
  ``lsn`` (the binlog/WAL position — the analog of the reference's page
  order, /root/reference/utils/extract.py:206).

``tool`` is the additive-evolution column: pre-evolution changelog files
lack it entirely; the engine propagates it to the table schema in-flight.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- logical transcript table schema (v1 = post-evolution) ---------------

KEY_COLS = ["conv_id", "turn_idx"]
PAYLOAD_COLS = ["role", "text", "tool", "ts"]
PAYLOAD_COLS_V0 = ["role", "text", "ts"]  # before `tool` exists

TRANSCRIPT_FIELDS = [
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
]
TRANSCRIPT_SCHEMA = T.StructType(TRANSCRIPT_FIELDS)
TRANSCRIPT_SCHEMA_V0 = T.StructType(
    [f for f in TRANSCRIPT_FIELDS if f.name != "tool"]
)

# --- change-event stream schema ------------------------------------------

OPS = ("I", "U", "D")

CHANGE_EVENT_FIELDS = [
    T.StructField("lsn", T.LongType(), False),
    T.StructField("op", T.StringType(), False),
    T.StructField("conv_id", T.StringType(), True),  # null => dead-letter
    T.StructField("turn_idx", T.IntegerType(), True),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("source_part", T.IntegerType(), True),
]
CHANGE_EVENT_SCHEMA = T.StructType(CHANGE_EVENT_FIELDS)
CHANGE_EVENT_SCHEMA_V0 = T.StructType(
    [f for f in CHANGE_EVENT_FIELDS if f.name != "tool"]
)

# --- engine-internal bookkeeping columns ----------------------------------
# Kept in the physical table, filtered from the read view. `_deleted`
# retains tombstones with their LSN so a late stale update (lower LSN)
# can never resurrect a deleted key (SURVEY.md §7 hard parts).

LSN_COL = "_lsn"
DELETED_COL = "_deleted"
BUCKET_COL = "_bucket"
INTERNAL_COLS = [LSN_COL, DELETED_COL, BUCKET_COL]

# Row-lineage bookkeeping (opt-in per table, Iceberg v3 row-lineage
# analog: `_row_id` / `_last_updated_sequence_number`). `_birth_lsn` is
# the LSN of the event that created the key's CURRENT live incarnation
# (min live LSN above the last tombstone — survives updates, resets on
# delete + re-insert); `_tomb_lsn` is the highest delete LSN folded into
# the row, carried so lineage summaries stay associative across delta
# pre-reduces, compactions and rescales.
BIRTH_COL = "_birth_lsn"
TOMB_COL = "_tomb_lsn"


def physical_fields(logical_fields: list[T.StructField]) -> list[T.StructField]:
    """Logical fields + engine bookkeeping columns (in stable order)."""
    return list(logical_fields) + [
        T.StructField(LSN_COL, T.LongType(), False),
        T.StructField(DELETED_COL, T.BooleanType(), False),
        T.StructField(BUCKET_COL, T.IntegerType(), False),
    ]


def schema_to_manifest(schema: T.StructType) -> dict:
    """Manifest-serializable schema (Spark's own JSON representation —
    field metadata, incl. the ``physical`` on-disk name, round-trips)."""
    return schema.jsonValue()


def schema_from_manifest(obj: dict) -> T.StructType:
    return T.StructType.fromJson(obj)


def initial_default(field: T.StructField):
    """The column's ``initial-default`` (Iceberg v3 default-value
    semantics): the value rows written BEFORE the column was added read
    as, instead of null. Stored in StructField metadata so it rides the
    manifest schema JSON and survives renames (the metadata follows the
    field). Returns None when the field has no default — a null default
    is not representable, matching Iceberg (null IS the absence of a
    default)."""
    return (field.metadata or {}).get("initial_default")


def write_default(field: T.StructField):
    """The column's ``write-default`` (Iceberg v3): the value a merge
    fills in when the WRITER's source omits the column entirely — an
    explicit null is still a null (the writer said so); only a missing
    column takes the default. Same metadata transport as
    :func:`initial_default`."""
    return (field.metadata or {}).get("write_default")


def physical_name(field: T.StructField) -> str:
    """The column's on-disk (Parquet) name — the Iceberg field-id analog
    kept in StructField metadata. Equal to the logical name unless the
    column was renamed (metadata-only: files keep their original column
    name forever; readers alias physical → logical) or re-added after a
    drop (a fresh physical name so old files' values never resurrect)."""
    return (field.metadata or {}).get("physical", field.name)
