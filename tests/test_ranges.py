"""Range-join operator: bucketed equi-join equivalence with the naive
non-equi join, bucket-width invariance, boundary semantics, and the plan
invariant that makes it matter (no nested-loop/cartesian node)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from fluxdb_spark.operators.ranges import range_join


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(60)], "pid long, x long"
    )


@pytest.fixture(scope="module")
def intervals(spark):
    rows = [
        (0, 0, 10),
        (1, 5, 25),  # overlaps interval 0
        (2, 25, 25),  # empty: end == start
        (3, 30, 31),  # single-point window
        (4, 90, 200),  # runs past the point domain
        (5, 40, 39),  # inverted: must vanish, not explode
    ]
    return spark.createDataFrame(rows, "iid long, s long, e long")


def naive(points, intervals):
    return (
        points.crossJoin(intervals.filter(F.col("e") > F.col("s")))
        .filter((F.col("x") >= F.col("s")) & (F.col("x") < F.col("e")))
        .select("pid", "x", "iid", "s", "e")
    )


def as_set(df):
    return {tuple(r) for r in df.collect()}


class TestEquivalence:
    @pytest.mark.parametrize("width", [1, 3, 8, 64, 1000])
    @pytest.mark.sweep
    def test_matches_naive_at_any_bucket_width(
        self, points, intervals, width
    ):
        got = range_join(points, intervals, "x", "s", "e", width).select(
            "pid", "x", "iid", "s", "e"
        )
        assert as_set(got) == as_set(naive(points, intervals))

    def test_closed_open_boundaries(self, spark):
        p = spark.createDataFrame([(1, 10), (2, 20)], "pid long, x long")
        i = spark.createDataFrame([(1, 10, 20)], "iid long, s long, e long")
        got = as_set(range_join(p, i, "x", "s", "e", 7).select("pid"))
        assert got == {(1,)}  # start inclusive, end exclusive

    def test_negative_domain(self, spark):
        """floor-division bucketing must stay consistent below zero."""
        p = spark.createDataFrame(
            [(1, -15), (2, -10), (3, -1), (4, 0)], "pid long, x long"
        )
        i = spark.createDataFrame([(1, -12, 0)], "iid long, s long, e long")
        got = as_set(range_join(p, i, "x", "s", "e", 10).select("pid"))
        assert got == {(2,), (3,)}

    def test_rejects_bad_width(self, points, intervals):
        with pytest.raises(ValueError):
            range_join(points, intervals, "x", "s", "e", 0)


class TestPlan:
    def test_no_nested_loop(self, points, intervals):
        df = range_join(points, intervals, "x", "s", "e", 8)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestIntervalOverlapJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, 0, 100), (2, 50, 60), (3, 500, 600), (4, 90, 90)],
            "lid long, s1 long, e1 long",
        )
        right = spark.createDataFrame(
            [(10, 90, 110), (11, 55, 58), (12, 100, 200), (13, 700, 800)],
            "rid long, s2 long, e2 long",
        )
        return left, right

    def _pairs(self, spark, width):
        from fluxdb_spark.operators.ranges import interval_overlap_join

        left, right = self._frames(spark)
        return sorted(
            (r.lid, r.rid)
            for r in interval_overlap_join(
                left, right, "s1", "e1", "s2", "e2", width
            ).collect()
        )

    def test_overlap_semantics(self, spark):
        # [0,100) x [90,110) overlap; [0,100) x [100,200) do NOT
        # (closed-open); [50,60) x [55,58) nested counts; empty interval
        # (4) vanishes
        assert self._pairs(spark, 64) == [(1, 10), (1, 11), (2, 11)]

    def test_no_duplicates_across_shared_buckets(self, spark):
        # width 16: [0,100) and [90,110) share buckets 5 and 6 — the
        # canonical-bucket rule must emit the pair exactly once
        assert self._pairs(spark, 16) == [(1, 10), (1, 11), (2, 11)]
        assert self._pairs(spark, 1) == [(1, 10), (1, 11), (2, 11)]

    def test_no_nested_loop_in_plan(self, spark):
        from fluxdb_spark.operators.ranges import interval_overlap_join

        left, right = self._frames(spark)
        plan = (
            interval_overlap_join(left, right, "s1", "e1", "s2", "e2", 64)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
