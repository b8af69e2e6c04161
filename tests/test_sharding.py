"""Sharded backfill semantics — mirrors the reference's sharding end-to-end
test (sharding_test.go:26-148): entities hash-stable across shards, per-shard
progress reconciles to a global checkpoint, temporal reads after injection
match direct writes."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluxdb_spark.operators import state_at, singlet_at
from fluxdb_spark.operators.sharding import (
    assign_shards,
    detect_holes,
    missing_shards,
    reconcile_checkpoint,
    scatter,
    shard_progress,
)
from tests.conftest import make_changelog

# sharding_test.go fixture: 3 blocks, 2 tablets (tb1, tb2), 2 singlets.
ROWS = [
    ("tst", "tb1", 1, "001", "t1 r1 #1"),
    ("tst", "tb1", 1, "002", "t1 r2 #1"),
    ("tst", "tb2", 1, "001", "t2 r1 #1"),
    ("tst", "tb1", 2, "002", "t1 r2 #2"),
    ("tst", "tb2", 2, "002", "t2 r2 #2"),
    ("tst", "tb2", 3, "001", "t2 r1 #3"),
    ("tst", "tb1", 3, "002", "t1 r2 #3"),
    ("sgl", "sg1", 1, "", "sg1 #1"),
    ("sgl", "sg2", 2, "", "sg2 #2"),
    ("sgl", "sg1", 3, "", "sg1 #3"),
]


class TestSharding:
    def test_entity_stability(self, spark):
        log = make_changelog(spark, ROWS)
        sharded = assign_shards(log, 2)
        per_entity = (
            sharded.groupBy("collection", "tablet_id")
            .agg(F.countDistinct("shard").alias("n"))
            .collect()
        )
        assert all(r.n == 1 for r in per_entity)

    def test_all_rows_survive_scatter(self, spark):
        log = make_changelog(spark, ROWS)
        assert scatter(log, 2).count() == len(ROWS)

    def test_reads_after_scatter_match(self, spark):
        # sharding_test.go:137-147 expectations
        log = scatter(make_changelog(spark, ROWS), 2).drop("shard")
        t1 = [
            (r.primary_key, r.height, r.value)
            for r in state_at(log, "tb1", 3, collection="tst").collect()
        ]
        assert t1 == [("001", 1, "t1 r1 #1"), ("002", 3, "t1 r2 #3")]
        t2 = [
            (r.primary_key, r.height, r.value)
            for r in state_at(log, "tb2", 3, collection="tst").collect()
        ]
        assert t2 == [("001", 3, "t2 r1 #3"), ("002", 2, "t2 r2 #2")]
        s1 = [(r.height, r.value) for r in singlet_at(log, "sg1", 3).collect()]
        assert s1 == [(3, "sg1 #3")]
        s2 = [(r.height, r.value) for r in singlet_at(log, "sg2", 1).collect()]
        assert s2 == []  # sg2 first written at height 2

    def test_progress_and_reconcile(self, spark):
        log = make_changelog(spark, ROWS)
        sharded = assign_shards(log, 2)
        prog = {r.shard: r.height for r in shard_progress(sharded).collect()}
        assert set(prog) <= {0, 1}
        global_ckpt = reconcile_checkpoint(sharded, 2).collect()[0]
        assert global_ckpt.height == min(prog.values())
        assert missing_shards(sharded, 2) == sorted(
            set(range(2)) - set(prog)
        )

    def test_missing_shard_detected(self, spark):
        log = make_changelog(spark, ROWS)
        sharded = assign_shards(log, 64)
        missing = missing_shards(sharded, 64)
        present = 64 - len(missing)
        assert present == sharded.select("shard").distinct().count()


class TestHoleDetection:
    def test_gap_found(self, spark):
        rows = [("tst", "tbl", h, "a", f"v{h}") for h in (1, 2, 3, 7, 8)]
        log = make_changelog(spark, rows)
        holes = detect_holes(log, ["tablet_id"]).collect()
        assert [(h.prev_height, h.height, h.missing) for h in holes] == [
            (3, 7, 3)
        ]

    def test_no_gap(self, spark):
        rows = [("tst", "tbl", h, "a", f"v{h}") for h in (1, 2, 3)]
        log = make_changelog(spark, rows)
        assert detect_holes(log, ["tablet_id"]).count() == 0
