"""Bucketed co-located joins: pre-bucketing two tables on the join key at
the same bucket count removes the shuffle from their join — the storage-side
technique (alongside broadcast and salting) for repeated big joins at scale.

Asserted on explain() output: the bucketed sort-merge join plans ZERO
Exchange nodes, while the same join over unbucketed data shuffles both
sides."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("buckets")
    left = spark.range(10_000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(5_000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("rv")
    )
    names = (f"lb_{uuid.uuid4().hex[:6]}", f"rb_{uuid.uuid4().hex[:6]}")
    for df, name in zip((left, right), names):
        (
            df.write.bucketBy(8, "k")
            .sortBy("k")
            .option("path", str(root / name))
            .format("parquet")
            .saveAsTable(name)
        )
    yield names
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tables):
    ln, rn = tables
    joined = spark.table(ln).hint("merge").join(spark.table(rn), on="k")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: neither side shuffles
    # and it still computes the right answer
    assert joined.count() == spark.table(ln).join(spark.table(rn), on="k").count()


def test_unbucketed_join_shuffles(spark, tables):
    left = spark.range(10_000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(5_000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("rv")
    )
    plan = _plan(left.hint("merge").join(right, on="k"))
    assert "Exchange" in plan
