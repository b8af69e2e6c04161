"""Approximate/sketch aggregates — the scale path for distinct counts and
quantiles (exact forms are oracle-checked in `distinct_counts` /
`percentiles`; the approximate forms can't hash-match a different engine, so
their gates are error bounds and the algebraic property that makes them
scale: mergeability across partitions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluxdb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF, "orders").persist()


@pytest.fixture(scope="module")
def lineitem(spark):
    return load_table(spark, SF, "lineitem").persist()


def test_approx_count_distinct_error_bound(orders):
    exact = orders.select("o_custkey").distinct().count()
    approx = orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("a")
    ).first().a
    assert abs(approx - exact) / exact < 0.05


def test_percentile_approx_error_bound(lineitem):
    exact = lineitem.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p")
    ).first().p
    approx = lineitem.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("p")
    ).first().p
    assert abs(approx - exact) / exact < 0.01


def test_hll_sketches_merge_across_partitions(spark, orders):
    """The property that makes sketch counts work on 1000 executors:
    per-partition sketches merge into an estimate equivalent to sketching
    globally. (Not bit-identical: DataSketches HLL tracks sparse/dense modes,
    so the union path can land a register or two apart — bounded, not
    drifting.)"""
    whole = orders.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("n")
    ).first().n
    halves = orders.withColumn(
        "half", (F.col("o_orderkey") % 2).cast("int")
    )
    per_half = halves.groupBy("half").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = per_half.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n")
    ).first().n
    assert abs(merged - whole) / whole < 0.01
    exact = orders.select("o_custkey").distinct().count()
    assert abs(merged - exact) / exact < 0.05
