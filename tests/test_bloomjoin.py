"""Bloom semi-join: exactness, no-false-negative guarantee, pruning power,
and the plan shape that matters at scale (expression-only probe)."""

import pytest
from pyspark.sql import functions as F

from fluxdb_spark.operators.bloomjoin import (
    bloom_might_contain,
    bloom_semi_join,
    build_bloom,
)


@pytest.fixture(scope="module")
def universe(spark):
    # 2000 fact rows over keys 0..499; dim keeps the multiples of 7
    fact = spark.range(2000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(500).filter(F.col("id") % 7 == 0).select(
        F.col("id").alias("dk")
    )
    return fact, dim


class TestBloomSemiJoin:
    def test_no_false_negatives(self, spark, universe):
        """Every dim key must pass its own bloom — the exactness of the
        whole operator rests on this."""
        _, dim = universe
        bloom = build_bloom(dim, "dk", m=1 << 10, h=3)
        missed = dim.filter(
            ~bloom_might_contain(F.col("dk"), bloom, h=3)
        ).count()
        assert missed == 0

    def test_exactly_the_semi_join(self, spark, universe):
        fact, dim = universe
        got = sorted(
            (r.k, r.payload)
            for r in bloom_semi_join(fact, dim, "k", "dk").collect()
        )
        want = sorted(
            (r.k, r.payload)
            for r in fact.join(
                dim.select(F.col("dk").alias("k")), on="k", how="left_semi"
            ).collect()
        )
        assert got == want and len(got) > 0

    def test_tiny_bloom_still_exact(self, spark, universe):
        """A deliberately undersized bitmap (64 bits for 72 keys — FP rate
        near 1) must still yield the exact semi-join: false positives die
        in the verify join."""
        fact, dim = universe
        got = bloom_semi_join(fact, dim, "k", "dk", m=64, h=2).count()
        want = fact.join(
            dim.select(F.col("dk").alias("k")), on="k", how="left_semi"
        ).count()
        assert got == want

    def test_prunes_most_non_members(self, spark, universe):
        """At ~14 bits/key the map-side probe must reject almost every
        non-matching key — the property that shrinks the shuffle at
        100 TB. (72 member keys, m=1024, h=3 => fp ~= 2%.)"""
        fact, dim = universe
        bloom = build_bloom(dim, "dk", m=1 << 10, h=3)
        survivors = fact.filter(
            bloom_might_contain(F.col("k"), bloom, h=3)
        ).count()
        members = fact.join(
            dim.select(F.col("dk").alias("k")), on="k", how="left_semi"
        ).count()
        non_members = 2000 - members
        # all members survive; false positives well under 10% of the rest
        assert members <= survivors <= members + 0.10 * non_members

    def test_probe_is_expression_only(self, spark, universe):
        """The bloom probe must be plan-literal expression work — no extra
        join, no Python — so it runs inside the scan's codegen stage."""
        fact, dim = universe
        bloom = build_bloom(dim, "dk", m=1 << 10, h=3)
        pruned = fact.filter(bloom_might_contain(F.col("k"), bloom, h=3))
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_bitmap_is_bounded(self, spark, universe):
        _, dim = universe
        bloom = build_bloom(dim, "dk", m=1 << 10, h=3)
        assert len(bloom) == (1 << 10) // 64
        assert all(isinstance(w, int) for w in bloom)
        assert any(w != 0 for w in bloom)
