"""Deterministic BlockMapper analog: events -> change-log rows.

The reference's single extension point is `BlockMapper.Map: Block ->
WriteRequest` (types.go:40-42) — a user function that turns a source record
into versioned rows. Here the driver-generated `events` table plays the block
stream (FIXTURES.md §B): each event becomes one change-log row,
deterministically, with a DuckDB-SQL twin of the exact same mapping so every
temporal operator gets an independent oracle.

Mapping (tablet form):
    collection   = 'evt'
    tablet_id    = event_type           (a tablet per event family)
    height       = event_id             (monotonic, unique)
    primary_key  = CAST(user_id AS STRING)
    value        = props
    is_deletion  = value < 10.0         (low-value events are tombstones)
    block_id     = printf('%08x', event_id)
    block_num    = event_id

Singlet form: one singlet per user (`user#<id>`, primary_key = '').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELETION_THRESHOLD = 10.0


def changelog_from_events(events: DataFrame) -> DataFrame:
    """Tablet-form change-log: one tablet per event_type, one row per event."""
    return events.select(
        F.lit("evt").alias("collection"),
        F.col("event_type").alias("tablet_id"),
        F.col("event_id").alias("height"),
        F.col("user_id").cast("string").alias("primary_key"),
        F.col("props").alias("value"),
        (F.col("value") < F.lit(DELETION_THRESHOLD)).alias("is_deletion"),
        F.format_string("%08x", F.col("event_id")).alias("block_id"),
        F.col("event_id").alias("block_num"),
    )


def singlet_log_from_events(events: DataFrame) -> DataFrame:
    """Singlet-form change-log: one singlet per user, versioned by event_id."""
    return events.select(
        F.lit("sgl").alias("collection"),
        F.concat(F.lit("user#"), F.col("user_id").cast("string")).alias(
            "tablet_id"
        ),
        F.col("event_id").alias("height"),
        F.lit("").alias("primary_key"),
        F.col("props").alias("value"),
        (F.col("value") < F.lit(DELETION_THRESHOLD)).alias("is_deletion"),
        F.format_string("%08x", F.col("event_id")).alias("block_id"),
        F.col("event_id").alias("block_num"),
    )


# DuckDB twins of the mappings above (the `events` view is pre-registered by
# the driver). Any change here must mirror the Spark functions exactly.
CHANGELOG_CTE = """
changelog AS (
  SELECT 'evt'                        AS collection,
         event_type                   AS tablet_id,
         event_id                     AS height,
         CAST(user_id AS VARCHAR)     AS primary_key,
         props                        AS value,
         (value < 10.0)               AS is_deletion,
         printf('%08x', event_id)     AS block_id,
         event_id                     AS block_num
  FROM events
)
"""

SINGLET_CTE = """
changelog AS (
  SELECT 'sgl'                                    AS collection,
         concat('user#', CAST(user_id AS VARCHAR)) AS tablet_id,
         event_id                                 AS height,
         ''                                       AS primary_key,
         props                                    AS value,
         (value < 10.0)                           AS is_deletion,
         printf('%08x', event_id)                 AS block_id,
         event_id                                 AS block_num
  FROM events
)
"""
