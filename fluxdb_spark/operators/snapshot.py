"""Snapshot indexing — incremental materialized-view maintenance.

The reference periodically materializes, per tablet, a `primary_key -> height`
map of the rows live at a height (TabletIndex, reference indexing.go:32-302),
so a snapshot read costs |live rows| + |delta since snapshot| instead of
|full history|. Here the index is a plain columnar relation
(TABLET_INDEX_SCHEMA) and both build and read are declarative plans:

- build = the same last-write-wins fold as `state_at`, projected to
  (pk, height), with map-side combine via max_by;
- incremental build folds only the rows in (prev_snapshot_height, H] on top
  of the previous index — the squelching that makes 100 TB histories
  readable;
- indexed read = fetch the indexed row versions with a semi-join on
  (pk, height) + apply the delta above the snapshot.

The adaptive cadence thresholds (reference indexing.go:533-575) are plain
driver-side logic in `should_index`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluxdb_spark.schema import CHANGELOG_COLUMNS


def _fold_latest(df: DataFrame) -> DataFrame:
    """Last-write-wins fold to (primary_key, height, is_deletion)."""
    return df.groupBy("primary_key").agg(
        F.max_by(
            F.struct(F.col("height"), F.col("is_deletion")), F.col("height")
        ).alias("_v")
    ).select(
        "primary_key",
        F.col("_v.height").alias("height"),
        F.col("_v.is_deletion").alias("is_deletion"),
    )


def build_tablet_index(
    changelog: DataFrame,
    tablet_id: str,
    at_height: int,
    collection: str = "evt",
    prev_index: DataFrame | None = None,
    prev_height: int | None = None,
) -> DataFrame:
    """Build the pk -> height live-row map for one tablet at `at_height`
    (reference indexTablet, indexing.go:225-302).

    With `prev_index`/`prev_height`, folds only the delta
    (prev_height, at_height] on top of the previous index — the incremental
    path the scheduler drives. squelch_count mirrors the reference's
    SquelchCount: number of change-log rows the index lets later reads skip.
    """
    scoped = changelog.filter(
        (F.col("collection") == collection)
        & (F.col("tablet_id") == tablet_id)
        & (F.col("height") <= F.lit(at_height))
    )
    if prev_index is not None and prev_height is not None:
        delta = scoped.filter(F.col("height") > F.lit(prev_height))
        base = prev_index.select(
            "primary_key", "height", F.lit(False).alias("is_deletion")
        )
        folded = _fold_latest(
            base.unionByName(delta.select("primary_key", "height", "is_deletion"))
        )
    else:
        folded = _fold_latest(
            scoped.select("primary_key", "height", "is_deletion")
        )
    live = folded.filter(~F.col("is_deletion"))
    # rows a reader can now skip (reference SquelchCount) — computed as a
    # lazy 1-row agg broadcast into the plan, NOT an eager .count() job
    squelch = scoped.agg(
        F.count(F.lit(1)).cast("long").alias("squelch_count")
    )
    return live.crossJoin(F.broadcast(squelch)).select(
        F.lit(collection).alias("collection"),
        F.lit(tablet_id).alias("tablet_id"),
        F.lit(at_height).cast("long").alias("snapshot_height"),
        "primary_key",
        "height",
        "squelch_count",
    )


def state_at_with_index(
    changelog: DataFrame,
    index: DataFrame,
    tablet_id: str,
    height: int,
    collection: str = "evt",
    ignore_range: tuple[int, int] | None = None,
) -> DataFrame:
    """R1 via snapshot-union-delta (reference ReadTabletAt with an index,
    read.go:47-142): pick the single best snapshot — the greatest
    snapshot_height at-or-below the read height — fetch its versions (a
    join on (pk, height), the declarative form of the reference's 5,000-key
    multi-gets), then last-write-wins-fold the delta rows in
    (snapshot_height, height] on top.

    Restricting to ONE snapshot matters when the stored index relation
    holds several (its durable form): joining across all of them would
    resurrect keys deleted between two snapshots and could pull versions
    newer than `height` from a snapshot above the read height.

    `ignore_range` (I7, reference indexing.go:304-327 / fluxdb.go:179-182)
    declares a [lo, hi] height range whose snapshots are corrupt: they are
    skipped and the read falls back to the newest OLDER snapshot, or to the
    plain full fold when none survives — the reference's recurse-to-an-
    older-index behavior.

    Must be result-equivalent to plain `state_at` — property-checked in
    tests/test_snapshot.py.
    """
    scoped = changelog.filter(
        (F.col("collection") == collection) & (F.col("tablet_id") == tablet_id)
    )
    eligible = index.filter(
        (F.col("collection") == collection)
        & (F.col("tablet_id") == tablet_id)
        & (F.col("snapshot_height") <= F.lit(height))
    )
    if ignore_range is not None:
        lo, hi = ignore_range
        eligible = eligible.filter(
            ~F.col("snapshot_height").between(F.lit(lo), F.lit(hi))
        )
    # The delta lower bound must survive an EMPTY eligible set (no snapshot
    # at-or-below the read height, all snapshots ignored, or a tablet whose
    # keys are all tombstoned at the index height): a 1-row agg with a -1
    # fallback makes the read degrade to the full scan, exactly the
    # reference's no-index path (read.go:47-53).
    best_h = eligible.agg(
        F.coalesce(F.max("snapshot_height"), F.lit(-1).cast("long")).alias(
            "snapshot_height"
        )
    )
    idx = (
        eligible.join(F.broadcast(best_h), on="snapshot_height", how="inner")
        .select("primary_key", "height")
    )
    # Indexed base rows: the exact (pk, height) versions the best snapshot
    # points at. The index side is small (|live keys|) => broadcast.
    base = scoped.join(
        F.broadcast(idx), on=["primary_key", "height"], how="inner"
    )
    delta = scoped.join(F.broadcast(best_h), how="cross").filter(
        (F.col("height") > F.col("snapshot_height"))
        & (F.col("height") <= F.lit(height))
    )
    unioned = base.unionByName(delta.drop("snapshot_height"))
    latest = unioned.groupBy("primary_key").agg(
        F.max_by(
            F.struct(*[F.col(c) for c in CHANGELOG_COLUMNS]), F.col("height")
        ).alias("_row")
    )
    return (
        latest.select(*[F.col(f"_row.{c}").alias(c) for c in CHANGELOG_COLUMNS])
        .filter(~F.col("is_deletion"))
        .orderBy("primary_key")
    )


# --- adaptive index cadence (reference indexing.go:533-575) ----------------


def should_index(mutation_count: int, prev_index_rows: int | None) -> bool:
    """Decide whether a tablet has accumulated enough mutations to warrant a
    new snapshot (reference shouldIndex, indexing.go:545-575):

    - < 25K mutations: never;
    - >= 25K and no previous index: yes;
    - previous index <= 50K rows: yes;
    - 50K < rows (half <= 100K): yes iff mutations > rows/2;
    - rows > 200K: yes iff mutations >= 100K.
    """
    if mutation_count < 25_000:
        return False
    if prev_index_rows is None:
        return True
    if prev_index_rows > 50_000:
        half = prev_index_rows // 2
        if half <= 100_000:
            return mutation_count > half
        return mutation_count >= 100_000
    return True


@dataclass
class IndexScheduler:
    """Driver-side mutation accounting + scheduling (reference indexCache,
    indexing.go:486-525). Feed it per-micro-batch mutation counts (a cheap
    `groupBy(tablet_id).count()` on each batch) and it yields the tablets
    whose snapshot should be rebuilt."""

    counters: dict[str, int] = field(default_factory=dict)
    last_index_rows: dict[str, int] = field(default_factory=dict)
    scheduled: dict[str, int] = field(default_factory=dict)

    def record_mutations(self, tablet_id: str, count: int, height: int) -> None:
        self.counters[tablet_id] = self.counters.get(tablet_id, 0) + count
        if should_index(
            self.counters[tablet_id], self.last_index_rows.get(tablet_id)
        ):
            self.scheduled[tablet_id] = height

    def pop_scheduled(self) -> dict[str, int]:
        out, self.scheduled = self.scheduled, {}
        return out

    def mark_indexed(self, tablet_id: str, index_rows: int) -> None:
        self.counters[tablet_id] = 0
        self.last_index_rows[tablet_id] = index_rows


def prune_indexes(
    index: DataFrame, prune_frequency: int
) -> DataFrame:
    """I6 — retention selection matching reference PruneTabletIndexes
    (indexing.go:329-398): per tablet, always keep the oldest and newest
    snapshot; sort the middle ones newest-first and DELETE every
    `prune_frequency`-th of them; tablets with <= prune_frequency + 2
    snapshots are untouched. Each run reclaims ~1/frequency of the middle
    snapshots, so repeated maintenance runs converge to frequency + 2
    snapshots per tablet. Returns the retained index rows.
    """
    if prune_frequency <= 1:
        raise ValueError(
            f"prune frequency must be greater than 1, got {prune_frequency}"
        )
    from pyspark.sql import Window as W

    part = W.partitionBy("collection", "tablet_id")
    heights = (
        index.select("collection", "tablet_id", "snapshot_height")
        .distinct()
        .withColumn(
            # rank 1 = newest snapshot; middles sit at ranks 2..n-1 and the
            # reference's desc position (i+1) for a middle is rank - 1
            "_rank",
            F.row_number().over(part.orderBy(F.desc("snapshot_height"))),
        )
        .withColumn("_n", F.count(F.lit(1)).over(part))
    )
    keep = heights.filter(
        (F.col("_n") <= prune_frequency + 2)
        | (F.col("_rank") == 1)
        | (F.col("_rank") == F.col("_n"))
        | ((F.col("_rank") - 1) % prune_frequency != 0)
    ).select("collection", "tablet_id", "snapshot_height")
    return index.join(
        F.broadcast(keep), on=["collection", "tablet_id", "snapshot_height"]
    )
