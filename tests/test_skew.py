"""Salting operators (operators/skew.py): result-equivalence with the plain
forms on a deliberately skewed dataset (one key owning ~90% of rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluxdb_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("cold"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(cold).persist()


class TestSaltedAgg:
    def test_matches_plain_groupby(self, skewed):
        plain = {
            (r.k): (r.n, r.s, r.mx)
            for r in skewed.groupBy("k")
            .agg(
                F.count("v").alias("n"),
                F.sum("v").alias("s"),
                F.max("v").alias("mx"),
            )
            .collect()
        }
        salted = {
            (r.k): (r.n, r.s, r.mx)
            for r in salted_agg(
                skewed,
                ["k"],
                {"n": ("v", "count"), "s": ("v", "sum"), "mx": ("v", "max")},
            ).collect()
        }
        assert salted == plain

    def test_rejects_non_algebraic(self, skewed):
        with pytest.raises(ValueError):
            salted_agg(skewed, ["k"], {"a": ("v", "avg")})


class TestSaltedJoin:
    def test_matches_plain_join(self, spark, skewed):
        dim = spark.createDataFrame(
            [("hot", 1.5)] + [(f"cold{i}", float(i)) for i in range(50)],
            "k string, w double",
        )
        plain = sorted(
            map(
                tuple,
                skewed.join(dim, on="k").select("k", "v", "w").collect(),
            )
        )
        salted = sorted(
            map(
                tuple,
                salted_join(skewed, dim, on=["k"], n_salts=8)
                .select("k", "v", "w")
                .collect(),
            )
        )
        assert salted == plain

    def test_left_join_preserves_unmatched(self, spark, skewed):
        dim = spark.createDataFrame([("hot", 1.0)], "k string, w double")
        out = salted_join(skewed, dim, on=["k"], how="left", n_salts=4)
        assert out.filter(F.col("w").isNull()).count() == 1000
        assert out.count() == 10000

    def test_rejects_right_and_full(self, spark, skewed):
        # an unmatched right row would appear once per salt replica
        dim = spark.createDataFrame([("hot", 1.0)], "k string, w double")
        for how in ("right", "full", "outer", "right_outer", "full_outer"):
            with pytest.raises(ValueError):
                salted_join(skewed, dim, on=["k"], how=how)
