"""Parallel backfill — the Spark form of the reference's scatter/gather
"reproc" (SURVEY.md §2.5, reference sharder.go + shardinject.go).

The reference needs two phases and an object store because it has no shuffle:
phase A hashes every entity to a shard and uploads per-shard segment files
(sharder.go:107-238); phase B runs one injector process per shard, walking
segments in order with hole detection (shardinject.go:48-109). In Spark the
shuffle IS that transport: `repartition(N, entity_key)` co-locates each
entity's full history, and the per-shard ordered apply is a partition-local
plan. What we keep from the reference is the *accounting*: per-shard
checkpoints, hole detection, and final reconciliation (write.go:82-194).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fluxdb_spark.functions.hashing import shard_of


def assign_shards(changelog: DataFrame, num_shards: int) -> DataFrame:
    """P1/P2 — tag each change-log row with its deterministic shard. All
    versions of (tablet_id, primary_key) land in the same shard, as in the
    reference (singlets by singlet key, tablet rows by tablet key,
    sharder.go:129-141)."""
    entity = F.concat_ws("\x1f", F.col("collection"), F.col("tablet_id"))
    return changelog.withColumn("shard", shard_of(entity, num_shards))


def scatter(changelog: DataFrame, num_shards: int) -> DataFrame:
    """Physically co-locate each shard's rows (the reference's phase A upload
    + phase B download collapse into this one shuffle)."""
    return assign_shards(changelog, num_shards).repartition(
        num_shards, F.col("shard")
    )


def shard_progress(sharded: DataFrame) -> DataFrame:
    """W4 — per-shard checkpoint stats (reference VerifyAllShardsWritten,
    write.go:82-181): highest height + block per shard."""
    return sharded.groupBy("shard").agg(
        F.max("height").alias("height"),
        F.max_by("block_id", F.col("height")).alias("block_id"),
        F.count(F.lit(1)).alias("row_count"),
    )


def missing_shards(sharded: DataFrame, num_shards: int) -> list[int]:
    """Shards with no progress at all (reference write.go:152-170 set
    difference vs expected shard ids)."""
    present = {
        r.shard for r in sharded.select("shard").distinct().collect()
    }
    return sorted(set(range(num_shards)) - present)


def reconcile_checkpoint(sharded: DataFrame, num_shards: int) -> DataFrame:
    """Final checkpoint after all shards injected: the minimum of the
    per-shard maxima is the height to which *every* entity is complete
    (the reference requires all shards at the same height and errors on
    holes; min-of-max is the safe generalization)."""
    progress = shard_progress(sharded)
    return progress.agg(
        F.min("height").alias("height"),
        F.min_by("block_id", F.col("height")).alias("block_id"),
        F.lit(num_shards).alias("num_shards"),
        F.count(F.lit(1)).alias("shards_seen"),
    )


def detect_holes(
    df: DataFrame, partition_cols: list[str] | None = None
) -> DataFrame:
    """P4 — sequence-gap detection (reference hole check,
    shardinject.go:75-77: next segment must start <= checkpoint+1).

    Returns one row per gap: partition cols + prev_height + height where
    height > prev_height + 1. Heights are block heights; per-partition order
    comes from a window, not file order."""
    partition_cols = partition_cols or []
    heights = df.select(*partition_cols, "height").distinct()
    w = Window.partitionBy(*partition_cols).orderBy("height")
    return (
        heights.withColumn("prev_height", F.lag("height").over(w))
        .filter(
            F.col("prev_height").isNotNull()
            & (F.col("height") > F.col("prev_height") + 1)
        )
        .select(
            *partition_cols,
            "prev_height",
            "height",
            (F.col("height") - F.col("prev_height") - 1).alias("missing"),
        )
    )
