"""Catalog entries: the relational / SQL layer (SURVEY §2.6) — joins,
aggs, windows, set ops, grouping sets, scalar functions, TPC-H."""

from __future__ import annotations

from __future__ import annotations
from collections.abc import Callable
from dataclasses import dataclass
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from fluxdb_spark.functions import baskets as bk
from fluxdb_spark.functions import bpe
from fluxdb_spark.functions import curation as cu
from fluxdb_spark.functions import dedup as dd
from fluxdb_spark.functions import similarity as sim
from fluxdb_spark.functions import text as tx
from fluxdb_spark.functions.hashing import hash60, hash60_sql
from fluxdb_spark.operators import bloomjoin as bj
from fluxdb_spark.operators import layout as ly
from fluxdb_spark.operators import temporal as tp
from fluxdb_spark.operators import sharding as sh
from fluxdb_spark.operators import snapshot as sn
from fluxdb_spark.sources.changelog import (
    CHANGELOG_CTE,
    SINGLET_CTE,
    changelog_from_events,
    singlet_log_from_events,
)
from fluxdb_spark.sources.tables import load_table, normalize_event_ts
from fluxdb_spark.session import spread

from fluxdb_spark.catalog._core import _q, _t
from fluxdb_spark.catalog._shared import (
    _RFM_SQL,
    _SESSIONIZE_SQL,
    _rfm_per_user,
    _rfm_rollup,
)



# =========================================================================
# 2. Relational / SQL layer (the general query surface the reference lacks;
#    SURVEY §2.6 — joins, aggs, windows, set ops, scalar fns — all native)
# =========================================================================


@_q(
    "tpch_q1",
    "relational",
    """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary: the canonical scan+agg; stays entirely in
    whole-stage codegen with map-side partial aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_q(
    "tpch_q3",
    "relational",
    """
SELECT o.o_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-03-15'
  AND l.l_shipdate > TIMESTAMP '1997-03-15'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey ASC
LIMIT 10
""",
)
def tpch_q3(spark, sf_dir):
    """TPC-H Q3 shipping priority: selective join + agg + top-k. The customer
    dim is broadcast; top-k compiles to TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@_q(
    "tpch_q5",
    "relational",
    """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
""",
)
def tpch_q5(spark, sf_dir):
    """TPC-H Q5 local-supplier revenue: 6-way join; dims broadcast, fact
    tables shuffle once on orderkey."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@_q(
    "tpch_q4",
    "relational",
    """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
""",
)
def tpch_q4(spark, sf_dir):
    """TPC-H Q4 order-priority checking (adapted: the reduced schema has no
    commit/receipt dates, so 'late' = any line shipped after the order
    date). The EXISTS compiles to a left-semi join."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_q(
    "tpch_q12",
    "relational",
    """
SELECT l.l_returnflag AS shipmode,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_returnflag
""",
)
def tpch_q12(spark, sf_dir):
    """TPC-H Q12 shipping modes vs priority (adapted: return flag plays the
    ship-mode column): conditional counts over the fact join."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("shipmode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@_q(
    "tpch_q6",
    "relational",
    """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def tpch_q6(spark, sf_dir):
    """TPC-H Q6 forecasting revenue change: pure scan+filter+agg — all three
    predicates push down to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


@_q(
    "tpch_q7",
    "relational",
    """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY 1, 2, 3
""",
)
def tpch_q7(spark, sf_dir):
    """TPC-H Q7 volume shipping between two nations; both nation lookups are
    broadcast, the disjunctive nation filter prunes before the fact shuffle."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@_q(
    "tpch_q8",
    "relational",
    """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM (
  SELECT year(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
GROUP BY o_year
""",
)
def tpch_q8(spark, sf_dir):
    """TPC-H Q8 national market share (adapted: part filter on p_type — the
    reduced schema has no partsupp). Conditional aggregation over an 8-way
    join; every dimension broadcasts."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_3", volume).otherwise(0.0)
                )
                / F.sum(volume),
                4,
            ).alias("mkt_share")
        )
    )


@_q(
    "tpch_q9",
    "relational",
    """
SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
FROM (
  SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%red%')
GROUP BY nation, o_year
""",
)
def tpch_q9(spark, sf_dir):
    """TPC-H Q9 product-type profit (adapted: profit = discounted revenue —
    no partsupp cost column in the reduced schema)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_profit")
        )
    )


@_q(
    "tpch_q10",
    "relational",
    """
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       round(c.c_acctbal, 2) AS acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
""",
)
def tpch_q10(spark, sf_dir):
    """TPC-H Q10 returned-item reporting: quarter of orders, returned lines
    only, top-20 customers by lost revenue."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@_q(
    "tpch_q13",
    "relational",
    """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey)
GROUP BY c_count
""",
)
def tpch_q13(spark, sf_dir):
    """TPC-H Q13 customer order-count distribution: left outer join with an
    ON-clause predicate (kept in the join, not a post-filter), double agg."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey)
        & (o.o_orderpriority != "1-URGENT"),
        "left",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@_q(
    "tpch_q14",
    "relational",
    """
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
  AND l.l_shipdate < TIMESTAMP '1996-10-01'
""",
)
def tpch_q14(spark, sf_dir):
    """TPC-H Q14 promotion effect: conditional aggregation over a broadcast
    part join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                4,
            ).alias("promo_revenue")
        )
    )


@_q(
    "tpch_q15",
    "relational",
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def tpch_q15(spark, sf_dir):
    """TPC-H Q15 top supplier: quarterly revenue per supplier, scalar-subquery
    max (a broadcast of one row). Revenue is rounded before the max compare
    so the equality is stable across engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    ).localCheckpoint()  # materialize once for both consumers, no session cache
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@_q(
    "tpch_q17",
    "relational",
    """
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
      FROM lineitem GROUP BY l_partkey) t ON t.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23' AND p.p_size < 5
  AND l.l_quantity < t.half_avg_qty
""",
)
def tpch_q17(spark, sf_dir):
    """TPC-H Q17 small-quantity-order revenue (adapted: p_size filter — no
    p_container). The correlated avg subquery is decorrelated into a per-part
    aggregate joined back, which is exactly how it should run at scale.
    The per-part average only matters for parts that survive the
    brand/size filter (~1/1000 of parts), so lineitem is left-semi-joined
    against the broadcast filtered part set BEFORE the groupBy (VERDICT
    r13 task 3): the aggregate's input shrinks by the part selectivity
    instead of carrying one partial per distinct part of ALL of lineitem
    through the shuffle. The semi-join is map-side (broadcast), so this
    costs one extra scan-side hash probe and removes ~99.9% of the
    aggregate input at 100×."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 5)
    )
    half_avg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "leftsemi")
        .groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((0.5 * F.avg("l_quantity")).alias("half_avg_qty"))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(half_avg, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@_q(
    "tpch_q18",
    "relational",
    """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o.o_totalprice, 2) AS totalprice,
       round(sum(l.l_quantity), 2) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 150)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice DESC, o.o_orderkey ASC
LIMIT 100
""",
)
def tpch_q18(spark, sf_dir):
    """TPC-H Q18 large-volume customers. The IN-subquery (orders whose line
    quantities sum > 150) is a plain groupBy over lineitem: the shuffle is
    partial-aggregated map-side, so one row per orderkey crosses the wire,
    and the per-order sum IS the output's sum_qty — no second lineitem
    pass, no window. The >150 survivor set is tiny (top ~0.01% of
    orders); its join into orders is deliberately left to AQE, which
    converts it to a broadcast at runtime (verified in the executed
    plan) but can fall back to a shuffle join if the survivor set is
    ever large — unlike a hard broadcast hint, this cannot OOM the
    driver at extreme scale. A/B at sf0.1 on local[32], median of 5:
    this form 0.63 s vs 0.76 s for the previous window-sum form (which
    shuffled FULL lineitem rows through the window partition — the
    shape that loses at 100×; quantities are integral doubles, so the
    sum stays exact either way)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tot_qty"))
        .filter(F.col("tot_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == F.col("l_orderkey"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("tot_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@_q(
    "tpch_q19",
    "relational",
    """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19(spark, sf_dir):
    """TPC-H Q19 discounted revenue (adapted: p_size ranges — no p_container):
    disjunction of conjunctive range predicates across the join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")

    def clause(brand, size_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= size_hi)
            & (F.col("l_quantity") >= q_lo)
            & (F.col("l_quantity") <= q_hi)
        )

    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(
            clause("Brand#12", 5, 1, 11)
            | clause("Brand#23", 10, 10, 20)
            | clause("Brand#34", 15, 20, 30)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@_q(
    "tpch_q22",
    "relational",
    """
SELECT n.n_name AS cntry, count(*) AS numcust,
       round(sum(c.c_acctbal), 2) AS totacctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY n.n_name
""",
)
def tpch_q22(spark, sf_dir):
    """TPC-H Q22 global sales opportunity (adapted: nation instead of phone
    country code; dormancy = no orders since 1999). The NOT EXISTS is a
    left-anti join; the scalar avg broadcasts."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@_q(
    "tpch_q2",
    "relational",
    """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         round(min(l_extendedprice / l_quantity), 2) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
eur AS (
  SELECT ps.l_partkey, ps.supply_cost, s.s_acctbal, s.s_name, n.n_name
  FROM ps
  JOIN supplier s ON s.s_suppkey = ps.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'),
mincost AS (SELECT l_partkey, min(supply_cost) AS min_cost
            FROM eur GROUP BY l_partkey)
SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name, e.supply_cost
FROM eur e
JOIN mincost m ON m.l_partkey = e.l_partkey AND e.supply_cost = m.min_cost
JOIN part p ON p.p_partkey = e.l_partkey
WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
""",
)
def tpch_q2(spark, sf_dir):
    """TPC-H Q2 minimum-cost supplier (adapted: testdata has no partsupp, so
    the supplier-part catalog is derived from lineitem — supply cost is the
    min unit price each supplier ever charged for the part; p_type equality
    instead of the '%BRASS' suffix match).

    The correlated min-cost subquery becomes a min-over-partition window on
    the one shared `eur` relation — lineitem is scanned and aggregated
    exactly ONCE (the decorrelated join-back alternative would compute the
    whole ps+dims subtree twice). The derived ps relation aggregates
    lineitem on (partkey, suppkey) with map-side combine; dims broadcast.
    The broadcast part join sits BELOW the window: the min is per partkey
    and p_partkey is unique, so restricting first is result-identical while
    the window exchange carries only the filtered parts' suppliers instead
    of every European (partkey, supplier) row."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 2).alias(
            "supply_cost"
        )
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        ps.join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "supply_cost", "s_acctbal", "s_name", "n_name")
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    w = Window.partitionBy("l_partkey")
    return (
        eur.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
    )


@_q(
    "tpch_q11",
    "relational",
    """
WITH val AS (
  SELECT l.l_partkey, round(sum(l.l_extendedprice * l.l_quantity), 2) AS part_value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name IN ('NATION_7', 'NATION_8')
  GROUP BY l.l_partkey)
SELECT l_partkey AS partkey, part_value FROM val
WHERE part_value > (SELECT sum(part_value) * 0.001 FROM val)
""",
)
def tpch_q11(spark, sf_dir):
    """TPC-H Q11 important stock (adapted: no partsupp, so per-part "value"
    is shipped extendedprice*quantity from suppliers of two nations).

    Shape preserved: group-agg + scalar-aggregate subquery threshold. The
    grouped relation is materialized once (eager localCheckpoint — no
    session-cache residue) and reused for both the total and the filter,
    so lineitem is scanned and shuffled exactly once; the 1-row total
    broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_7", "NATION_8")
    )
    val = (
        li.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2
            ).alias("part_value")
        )
        .localCheckpoint()
    )
    total = val.agg((F.sum("part_value") * 0.001).alias("threshold"))
    return val.join(
        F.broadcast(total), F.col("part_value") > F.col("threshold")
    ).select("partkey", "part_value")


@_q(
    "tpch_q16",
    "relational",
    """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#23' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def tpch_q16(spark, sf_dir):
    """TPC-H Q16 parts/supplier relationship (adapted: supplier-part pairs
    from lineitem; the 'customer complaints' exclusion becomes negative
    account balance).

    NOT IN over a provably non-null key column is a left-anti join here (the
    null-semantics trap doesn't apply); the part filter broadcasts; distinct
    supplier count shuffles once on the group key."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "tpch_q20",
    "relational",
    """
WITH shipped AS (
  SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS qty
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'small%'
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l.l_suppkey, l.l_partkey),
totals AS (SELECT l_partkey, sum(qty) AS total_qty FROM shipped GROUP BY l_partkey),
dominant AS (
  SELECT DISTINCT sh.l_suppkey FROM shipped sh
  JOIN totals t ON t.l_partkey = sh.l_partkey
  WHERE sh.qty > 0.3 * t.total_qty)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name IN ('NATION_3', 'NATION_4', 'NATION_5')
  AND s.s_suppkey IN (SELECT l_suppkey FROM dominant)
""",
)
def tpch_q20(spark, sf_dir):
    """TPC-H Q20 potential part promotion (adapted: no partsupp/availqty, so
    'excess stock' becomes 'dominant supplier' — shipped >30% of a small-part's
    1996 volume; nation filter widened to three nations for signal).

    The nested IN-subquery chain is two stacked left-semi joins. `shipped`
    is aggregated once and reused for per-part totals (eager
    localCheckpoint — materialized, no session-cache residue); the
    dominant-supplier set is tiny and broadcast into the semi-join."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .localCheckpoint()
    )
    totals = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    dominant = (
        shipped.join(totals, shipped.l_partkey == totals.t_partkey)
        .filter(F.col("qty") > 0.3 * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_4", "NATION_5")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(dominant), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@_q(
    "tpch_q21",
    "relational",
    """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F' AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
SELECT s.s_name, count(*) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
""",
)
def tpch_q21(spark, sf_dir):
    """TPC-H Q21 suppliers who kept orders waiting (adapted: testdata has no
    l_commitdate/l_receiptdate, so 'late' = shipped >90 days after the order
    date; same EXISTS + NOT EXISTS correlation shape).

    The two correlated subqueries become a left-semi join (another supplier
    touched the order) and a left-anti join (no OTHER supplier was late on
    it) — both non-equi on the supplier inequality, expressed as equi-joins
    on orderkey with the <> predicate in the join condition so Spark still
    hash-shuffles on orderkey instead of falling back to a nested loop.
    `late` is materialized once (eager localCheckpoint): it is both the
    driving relation and the anti-join probe side."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
        )
        .select("l_orderkey", "l_suppkey")
        .localCheckpoint()
    )
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    s = _t(spark, sf_dir, "supplier")
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@_q(
    "region_revenue",
    "relational",
    """
SELECT r.r_name, round(sum(o.o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def region_revenue(spark, sf_dir):
    """Broadcast-chain star join: all three dims broadcast, zero fact
    shuffles before the final 5-group agg."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@_q(
    "running_total",
    "relational",
    """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders WHERE o_custkey < 20
""",
)
def running_total(spark, sf_dir):
    """Window running aggregate per customer."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@_q(
    "rollup_pricing",
    "relational",
    """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_pricing(spark, sf_dir):
    """Hierarchical ROLLUP aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@_q(
    "cube_orders",
    "relational",
    """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n, round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_orders(spark, sf_dir):
    """CUBE aggregation: all 2^k grouping combinations in one pass."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "revenue",
        )
    )


_Y95 = "SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'"
_Y96 = "SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'"


@_q(
    "set_ops",
    "relational",
    f"""
SELECT 'both' AS tag, o_custkey FROM ({_Y95} INTERSECT {_Y96})
UNION ALL
SELECT 'only_1995' AS tag, o_custkey FROM ({_Y95} EXCEPT {_Y96})
UNION ALL
SELECT 'only_1996' AS tag, o_custkey FROM ({_Y96} EXCEPT {_Y95})
""",
)
def set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT / UNION ALL over yearly customer cohorts."""
    o = _t(spark, sf_dir, "orders")

    def year(y):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = year(1995), year(1996)
    tag = lambda df, t: df.select(F.lit(t).alias("tag"), "o_custkey")  # noqa: E731
    return (
        tag(y95.intersect(y96), "both")
        .unionAll(tag(y95.exceptAll(y96), "only_1995"))
        .unionAll(tag(y96.exceptAll(y95), "only_1996"))
    )


@_q(
    "distinct_counts",
    "relational",
    """
SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
)
def distinct_counts(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_q(
    "topk_orders",
    "relational",
    """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
""",
)
def topk_orders(spark, sf_dir):
    """Global top-k — TakeOrderedAndProject, no full sort."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@_q(
    "scalar_showcase",
    "relational",
    """
SELECT p_partkey,
       upper(substr(p_name, 1, 10)) AS name_prefix,
       length(p_name) AS name_len,
       regexp_extract(p_name, '^[a-z]+') AS first_word,
       round(p_retailprice * 1.1, 2) AS marked_up,
       (p_size % 7) AS size_mod,
       concat(p_brand, ':', p_type) AS brand_type
FROM part
""",
)
def scalar_showcase(spark, sf_dir):
    """Scalar function surface: string / regex / math / concat."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 10)).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_name", "^[a-z]+", 0).alias("first_word"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("marked_up"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
    )


@_q(
    "date_funcs",
    "relational",
    """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
FROM orders WHERE o_orderkey < 100
""",
)
def date_funcs(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
    )


@_q(
    "asof_join",
    "relational",
    """
WITH tagged AS (
  SELECT event_id, user_id, ts, value, event_type FROM events
  WHERE event_type IN ('click', 'purchase')),
w AS (
  SELECT *,
         last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_value
  FROM tagged)
SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       round(value, 2) AS purchase_value,
       round(last_click_value, 2) AS last_click_value
FROM w WHERE event_type = 'purchase'
""",
)
def asof_join(spark, sf_dir):
    """As-of join (purchase -> latest strictly-prior click per user) via the
    union+window pattern — the shuffle-once scalable form (no per-key merge
    loop, no range explosion)."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lastc = F.last(
        F.when(F.col("event_type") == "click", F.col("value")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("last_click_value", lastc)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.round("value", 2).alias("purchase_value"),
            F.round("last_click_value", 2).alias("last_click_value"),
        )
    )


_ATTR_TOL_US = 24 * 3600 * 1_000_000  # attribution lookback window

_ATTRIBUTION_SQL = f"""
WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us, value
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'click'),
sel AS (SELECT p.event_id, p.user_id, p.us, p.value, c.us AS cus
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.us >= c.us),
lab AS (SELECT us // {24 * 3600 * 1_000_000} AS day_idx, value,
               CASE WHEN cus IS NOT NULL
                         AND us - cus <= {_ATTR_TOL_US}
                    THEN us - cus END AS lag_us
        FROM sel)
SELECT strftime(DATE '1970-01-01' + INTERVAL (day_idx) DAY, '%Y-%m-%d')
         AS day,
       CASE WHEN lag_us IS NOT NULL
            THEN 'attributed' ELSE 'organic' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_purchases,
       round(sum(value), 2) AS total_value,
       CAST(sum(lag_us) AS DOUBLE)
         / CAST(count(lag_us) * 60000000 AS DOUBLE) AS avg_lag_min
FROM lab GROUP BY 1, 2
"""


@_q("purchase_attribution", "relational", _ATTRIBUTION_SQL)
def purchase_attribution(spark, sf_dir):
    """Last-touch revenue attribution: each purchase attaches to the
    user's latest click within a 24 h lookback (the `asof_join` operator
    with its tolerance bound — composition receipt for the generic
    as-of machinery, operators/asof.py), then daily revenue splits into
    attributed vs organic with the mean click-to-purchase lag.

    Determinism: the only payload the as-of carries is the click
    timestamp itself, so equal-timestamp click duplicates are
    pick-invariant on both engines — no dedup pre-pass, and the click
    relation moves through exactly ONE shuffle (the as-of window
    partitioning). Lag sums are exact int64 microseconds and avg_lag_min
    is ONE double division; total_value follows the catalog's
    round(sum, 2) convention. Rollup output is |days| x 2 rows."""
    from fluxdb_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", us.alias("us"), "value"
    )
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", us.alias("c_us"), us.alias("click_us")
    )
    sel = asof_join(
        p,
        c,
        on=["user_id"],
        left_time="us",
        right_time="c_us",
        payload_cols=["click_us"],
        direction="backward",
        allow_exact_matches=True,
        tolerance=_ATTR_TOL_US,
    )
    lab = sel.select(
        F.expr(f"us div {24 * 3600 * 1_000_000}").alias("day_idx"),
        "value",
        (F.col("us") - F.col("click_us")).alias("lag_us"),
    )
    return (
        lab.groupBy(
            "day_idx",
            F.when(F.col("lag_us").isNotNull(), F.lit("attributed"))
            .otherwise(F.lit("organic"))
            .alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("total_value"),
            (
                F.sum("lag_us").cast("double")
                / (F.count("lag_us") * F.lit(60_000_000)).cast("double")
            ).alias("avg_lag_min"),
        )
        .select(
            F.date_format(
                F.date_add(
                    F.lit("1970-01-01").cast("date"),
                    F.col("day_idx").cast("int"),
                ),
                "yyyy-MM-dd",
            ).alias("day"),
            "bucket",
            "n_purchases",
            "total_value",
            "avg_lag_min",
        )
    )


@_q(
    # -- r11-green block --
    "asof_join_generic",
    "relational",
    """
SELECT p.event_id, p.user_id,
       round(p.value, 2) AS purchase_value,
       round(c.value, 2) AS click_value,
       c.event_id AS click_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
""",
)
def asof_join_generic(spark, sf_dir):
    """The general as-of join operator (operators/asof.py), oracle-checked
    against DuckDB's NATIVE `ASOF LEFT JOIN` — exact-match backward mode:
    each purchase gets the latest click at ts <= purchase ts."""
    from fluxdb_spark.operators.asof import asof_join as asof_op

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("value").alias("click_value_raw"),
        F.col("event_id").alias("click_event_id"),
    )
    out = asof_op(
        purchases,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        payload_cols=["click_value_raw", "click_event_id"],
        direction="backward",
        allow_exact_matches=True,
        tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("click_value_raw", 2).alias("click_value"),
        "click_event_id",
    )


@_q(
    "asof_join_tolerance",
    "relational",
    """
SELECT p.event_id, p.user_id,
       CASE WHEN p.event_id - c.event_id <= 50
            THEN round(c.value, 2) END AS click_value,
       CASE WHEN p.event_id - c.event_id <= 50
            THEN c.event_id END AS click_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.event_id <= p.event_id
""",
)
def asof_join_tolerance(spark, sf_dir):
    """As-of join with a TOLERANCE bound (pandas merge_asof semantics): a
    match further than 50 event-ids behind is nulled — a stale quote must
    not attach to today's trade. Oracle = DuckDB's native ASOF JOIN with
    the gap nulled in SQL; the operator applies the bound map-side after
    the single window pick, no extra shuffle."""
    from fluxdb_spark.operators.asof import asof_join as asof_op

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("value").alias("click_value_raw"),
    )
    out = asof_op(
        purchases,
        clicks,
        on=["user_id"],
        left_time="event_id",
        right_time="click_event_id",
        payload_cols=["click_value_raw", "click_event_id"],
        direction="backward",
        allow_exact_matches=True,
        tolerance=50,
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("click_value_raw", 2).alias("click_value"),
        "click_event_id",
    )


@_q(
    "interval_overlap_join",
    "relational",
    """
WITH us AS (
  SELECT event_id, event_type, value,
         epoch_us(ts) AS u
  FROM events),
inc AS (
  SELECT event_id AS incident_id, u AS s1, u + 3600000000 AS e1
  FROM us WHERE event_type = 'error' AND value > 100),
pur AS (
  SELECT event_id AS purchase_id, u AS s2, u + 1800000000 AS e2
  FROM us WHERE event_type = 'purchase' AND value > 50)
SELECT incident_id, purchase_id,
       CAST(least(e1, e2) - greatest(s1, s2) AS BIGINT) AS overlap_us
FROM inc JOIN pur ON s1 < e2 AND s2 < e1
""",
)
def interval_overlap_join(spark, sf_dir):
    """Interval x interval overlap join — the range-join family's other
    member (range_join_incidents covers point-in-interval): 1-hour error
    incident windows overlapped with 30-minute high-value purchase
    windows, with the exact overlap length. The oracle is DuckDB's
    native non-equi join; the Spark side explodes BOTH sides to their
    covered buckets and keeps a pair only in the overlap-start bucket —
    every pair meets exactly once, so the plan is an equi-join +
    residual filter with no distinct pass and no nested loop (pinned in
    test_ranges)."""
    from fluxdb_spark.operators.ranges import interval_overlap_join as ioj

    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    inc = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") > 100)
    ).select(
        F.col("event_id").alias("incident_id"),
        us.alias("s1"),
        (us + F.lit(3_600_000_000)).alias("e1"),
    )
    pur = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 50)
    ).select(
        F.col("event_id").alias("purchase_id"),
        us.alias("s2"),
        (us + F.lit(1_800_000_000)).alias("e2"),
    )
    return ioj(inc, pur, "s1", "e1", "s2", "e2", 3_600_000_000).select(
        "incident_id",
        "purchase_id",
        (F.least("e1", "e2") - F.greatest("s1", "s2"))
        .cast("long")
        .alias("overlap_us"),
    )


@_q(
    "range_join_incidents",
    "relational",
    """
WITH inc AS (
  SELECT event_id AS incident_id, epoch_us(ts) AS w_start,
         epoch_us(ts) + 3600000000 AS w_end
  FROM events WHERE event_type = 'error' AND value > 100),
clicks AS (SELECT epoch_us(ts) AS us, value FROM events
           WHERE event_type = 'click')
SELECT i.incident_id, count(*) AS n_clicks,
       round(sum(c.value), 2) AS click_value
FROM inc i JOIN clicks c ON c.us >= i.w_start AND c.us < i.w_end
GROUP BY i.incident_id
""",
)
def range_join_incidents(spark, sf_dir):
    """General range join (operators/ranges.py): clicks landing inside
    1-hour 'incident' windows opened by high-value errors. The oracle is
    DuckDB's native non-equi join; the Spark side bin-buckets the windows so
    the plan is an equi-join on bucket + residual filter — never a
    nested-loop (asserted in tests/test_ranges.py)."""
    from fluxdb_spark.operators.ranges import range_join

    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    inc = ev.filter((F.col("event_type") == "error") & (F.col("value") > 100)).select(
        F.col("event_id").alias("incident_id"),
        us.alias("w_start"),
        (us + F.lit(3_600_000_000)).alias("w_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        us.alias("us"), F.col("value").alias("click_val")
    )
    return (
        range_join(clicks, inc, "us", "w_start", "w_end", 3_600_000_000)
        .groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.round(F.sum("click_val"), 2).alias("click_value"),
        )
    )


@_q(
    "tumbling_hourly",
    "relational",
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
""",
)
def tumbling_hourly(spark, sf_dir):
    """Tumbling event-time window aggregate (batch form)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@_q(
    "sliding_windows",
    "relational",
    """
WITH offsets AS (SELECT unnest([0, 1]) AS off),
win AS (
  SELECT date_trunc('hour', e.ts) - to_hours(o.off) AS w_start, e.value
  FROM events e, offsets o)
SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM win GROUP BY 1
""",
)
def sliding_windows(spark, sf_dir):
    """Sliding window (2h window, 1h slide) via Spark's native window()."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n",
            "total_value",
        )
    )


@_q("sessionization", "relational", _SESSIONIZE_SQL)
def sessionization(spark, sf_dir):
    """Sessionization: 30-min-gap sessions via lag + running-sum windows."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        us.alias("us"),
        F.when(
            F.lag(us).over(w).isNull()
            | ((us - F.lag(us).over(w)) > 30 * 60 * 1_000_000),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.select(
        "user_id", F.sum("is_new").over(w2).alias("session_idx")
    )
    per = sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.round(F.avg("n_events"), 4).alias("avg_session_events"),
    )


_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WINDOW_US = 48 * 3600 * 1_000_000  # conversion window from entry

_FUNNEL_SQL = f"""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
lists AS (
  SELECT user_id,
         list(us) FILTER (WHERE event_type = '{_FUNNEL_STEPS[0]}') AS l1,
         list(us) FILTER (WHERE event_type = '{_FUNNEL_STEPS[1]}') AS l2,
         list(us) FILTER (WHERE event_type = '{_FUNNEL_STEPS[2]}') AS l3
  FROM ev GROUP BY user_id),
s1 AS (SELECT user_id, list_min(l1) AS t1, l2, l3 FROM lists),
s2 AS (SELECT user_id, t1,
              list_min(list_filter(l2,
                x -> x > t1 AND x <= t1 + {_FUNNEL_WINDOW_US})) AS t2,
              l3 FROM s1),
s3 AS (SELECT user_id, t1, t2,
              list_min(list_filter(l3,
                x -> x > t2 AND x <= t1 + {_FUNNEL_WINDOW_US})) AS t3
       FROM s2),
c AS (SELECT count(t1) AS u1, count(t2) AS u2, count(t3) AS u3,
             sum(t2 - t1) AS d2, sum(t3 - t1) AS d3 FROM s3)
SELECT CAST(1 AS BIGINT) AS step, '{_FUNNEL_STEPS[0]}' AS step_name,
       CAST(u1 AS BIGINT) AS users,
       CAST(u1 AS DOUBLE) / CAST(u1 AS DOUBLE) AS conv_pct,
       CAST(NULL AS DOUBLE) AS avg_s_from_start FROM c
UNION ALL
SELECT CAST(2 AS BIGINT), '{_FUNNEL_STEPS[1]}', CAST(u2 AS BIGINT),
       CAST(u2 AS DOUBLE) / CAST(u1 AS DOUBLE),
       CAST(d2 AS DOUBLE) / CAST(u2 * 1000000 AS DOUBLE) FROM c
UNION ALL
SELECT CAST(3 AS BIGINT), '{_FUNNEL_STEPS[2]}', CAST(u3 AS BIGINT),
       CAST(u3 AS DOUBLE) / CAST(u1 AS DOUBLE),
       CAST(d3 AS DOUBLE) / CAST(u3 * 1000000 AS DOUBLE) FROM c
"""


@_q("event_funnel", "relational", _FUNNEL_SQL)
def event_funnel(spark, sf_dir):
    """Ordered-funnel analysis (view -> click -> purchase): per user the
    earliest step-1 time, then the earliest step-2 event STRICTLY after
    it, then the earliest step-3 after that, all within a 48 h
    conversion window anchored at funnel entry — the min-cascade
    semantics every product-analytics funnel uses (reference parity:
    this is an events-model analytic its tablet scans feed,
    fluxdb.go:104-154; the operator itself is beyond-ref surface).
    Non-vacuous at every SF: the window splits users into ~100% /
    ~60% / ~25% per-step conversion.

    Scale shape: one shuffle on user_id into per-user per-step timestamp
    arrays (state bounded by a user's own step events — no corpus-wide
    window sort), then the cascade is JVM higher-order array_min/filter;
    the per-step rollup is a 1-row aggregate. Portability: timestamps
    stay integer microseconds end-to-end; conversion % and latency are
    each ONE double division of exact ints (multi-op float expressions
    are not cross-engine portable — FMA contraction). Latency sums are
    int64-exact to ~9e18 us-seconds of aggregate lag; a 100 TB run with
    ~1e9 converting users x year-scale lags should bump `d2`/`d3` to
    decimal(38,0)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    lists = ev.groupBy("user_id").agg(
        *[
            F.collect_list(
                F.when(F.col("event_type") == s, F.col("us"))
            ).alias(f"l{i + 1}")
            for i, s in enumerate(_FUNNEL_STEPS)
        ]
    )
    s1 = lists.select(
        "user_id", F.array_min("l1").alias("t1"), "l2", "l3"
    )
    horizon = F.col("t1") + F.lit(_FUNNEL_WINDOW_US)
    s2 = s1.select(
        "user_id",
        "t1",
        F.array_min(
            F.filter("l2", lambda x: (x > F.col("t1")) & (x <= horizon))
        ).alias("t2"),
        "l3",
    )
    s3 = s2.select(
        "user_id",
        "t1",
        "t2",
        F.array_min(
            F.filter("l3", lambda x: (x > F.col("t2")) & (x <= horizon))
        ).alias("t3"),
    )
    c = s3.agg(
        F.count("t1").alias("u1"),
        F.count("t2").alias("u2"),
        F.count("t3").alias("u3"),
        F.sum(F.col("t2") - F.col("t1")).alias("d2"),
        F.sum(F.col("t3") - F.col("t1")).alias("d3"),
    )
    steps = [
        F.struct(
            F.lit(i + 1).cast("long").alias("step"),
            F.lit(s).alias("step_name"),
            F.col(f"u{i + 1}").cast("long").alias("users"),
            (
                F.col(f"u{i + 1}").cast("double")
                / F.col("u1").cast("double")
            ).alias("conv_pct"),
            (
                F.lit(None).cast("double")
                if i == 0
                else F.col(f"d{i + 1}").cast("double")
                / (F.col(f"u{i + 1}") * F.lit(1_000_000)).cast("double")
            ).alias("avg_s_from_start"),
        )
        for i, s in enumerate(_FUNNEL_STEPS)
    ]
    return c.select(F.explode(F.array(*steps)).alias("r")).select("r.*")


_DAY_US = 24 * 3600 * 1_000_000
_RETENTION_EVENT = "purchase"

_RETENTION_SQL = f"""
WITH ev AS (SELECT user_id, epoch_us(ts) // {_DAY_US} AS w FROM events
            WHERE event_type = '{_RETENTION_EVENT}'),
first_w AS (SELECT user_id, min(w) AS fw FROM ev GROUP BY user_id),
active AS (SELECT DISTINCT e.user_id, f.fw, e.w - f.fw AS offs
           FROM ev e JOIN first_w f USING (user_id)),
cohorts AS (SELECT fw, count(*) AS cohort_size FROM first_w GROUP BY fw),
cells AS (SELECT fw, offs, count(*) AS active_users
          FROM active GROUP BY fw, offs)
SELECT strftime(DATE '1970-01-01' + INTERVAL (c.fw) DAY, '%Y-%m-%d')
         AS cohort_day,
       CAST(c.offs AS BIGINT) AS day_offset,
       CAST(c.active_users AS BIGINT) AS active_users,
       CAST(co.cohort_size AS BIGINT) AS cohort_size,
       CAST(c.active_users AS DOUBLE) / CAST(co.cohort_size AS DOUBLE)
         AS retention_pct
FROM cells c JOIN cohorts co USING (fw)
"""


@_q("cohort_retention", "relational", _RETENTION_SQL)
def cohort_retention(spark, sf_dir):
    """Daily purchase-retention cohorts: users cohorted by the epoch-day
    of their FIRST purchase, each later day they purchased again counted
    against the cohort size — the third classic events analytic beside
    `event_funnel` and `sessionization`. Days are pure integer
    floor(epoch_us / day) indices (no engine date_trunc / timezone
    semantics in the keys; the cohort label is rebuilt from the index as
    epoch + fw days at the end), and retention_pct is ONE double
    division of exact counts, so the relation hash-matches cross-engine.
    Discriminative at every SF: 5-16 cohorts, retention 0.08-1.0.

    Scale shape: the event-type filter pushes to the scan; first-purchase
    day is a combine-friendly min per user; (user, day) activity dedups
    map-side before the (cohort, offset) count; the cohort-size relation
    is |days| rows and broadcasts. Output is |days|^2 / 2 cells
    regardless of corpus size."""
    wk = F.expr(f"unix_micros(ts) div {_DAY_US}")  # integral, no doubles
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == _RETENTION_EVENT)
        .select("user_id", wk.alias("w"))
    )
    first_w = ev.groupBy("user_id").agg(F.min("w").alias("fw"))
    active = (
        ev.join(first_w, "user_id")
        .select("user_id", "fw", (F.col("w") - F.col("fw")).alias("offs"))
        .distinct()
    )
    cohorts = first_w.groupBy("fw").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = active.groupBy("fw", "offs").agg(
        F.count(F.lit(1)).alias("active_users")
    )
    return (
        cells.join(F.broadcast(cohorts), "fw")
        .select(
            F.date_format(
                F.date_add(
                    F.lit("1970-01-01").cast("date"),
                    F.col("fw").cast("int"),
                ),
                "yyyy-MM-dd",
            ).alias("cohort_day"),
            F.col("offs").cast("long").alias("day_offset"),
            F.col("active_users").cast("long").alias("active_users"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            (
                F.col("active_users").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention_pct"),
        )
    )


@_q("rfm_segments", "relational", _RFM_SQL)
def rfm_segments(spark, sf_dir):
    """RFM user segmentation (recency / frequency / monetary quintiles),
    the fourth classic events analytic beside sessionization, funnel and
    retention. Quintiles are RANK-based through the HDR bucket sketch
    (score = users-in-strictly-better-buckets * 5 div n + 1, every user
    in a bucket shares its score) — deterministic and engine-portable,
    unlike ntile whose tie placement depends on input order. Money is
    exact integer cents (floor(value*100)), recency exact age in epoch
    microseconds from the corpus max, so every bucket id, cumulative
    count and sum is bit-identical cross-engine; avg_value is ONE double
    division.

    Scale shape: one combine-friendly groupBy(user) over the events
    scan; the per-dimension histograms are combine-friendly groupBys
    over the <= ~64*2^HDR_B bucket space, the cumulative quintile scan
    orders only those sketch relations, scores join back by broadcast,
    and the output is at most 5^3 cells. No unpartitioned sort anywhere
    (the previous version's three global rank windows were one-task
    sorts at 10^9 users)."""
    per_user = _rfm_per_user(_t(spark, sf_dir, "events"))
    return _rfm_rollup(per_user)


_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
t AS (SELECT prev_type, event_type AS next_type FROM seq
      WHERE prev_type IS NOT NULL),
n AS (SELECT count(*) AS n_total FROM t)
SELECT prev_type, next_type,
       CAST(count(*) AS BIGINT) AS n_transitions,
       CAST(count(*) AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
FROM t, n GROUP BY prev_type, next_type, n_total
"""


_EVENT_PATHS_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS t3,
         lag(event_type, 1) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS t2,
         lag(event_type, 2) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS t1
  FROM events),
tri AS (SELECT t1, t2, t3 FROM seq WHERE t1 IS NOT NULL),
n AS (SELECT count(*) AS n_total FROM tri),
ranked AS (
  SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n_paths,
         round(CAST(count(*) AS DOUBLE) / CAST(max(n_total) AS DOUBLE), 4)
           AS share
  FROM tri, n GROUP BY t1, t2, t3)
SELECT t1, t2, t3, n_paths, share FROM ranked
ORDER BY n_paths DESC, t1, t2, t3 LIMIT 20
"""


@_q("event_paths", "relational", _EVENT_PATHS_SQL)
def event_paths(spark, sf_dir):
    """Frequent-path mining over user event streams: the top-20 3-step
    event-type journeys (the k-gram generalization of
    `event_transitions`' Markov matrix — transitions say what follows
    one step, paths surface the multi-step flows a funnel designer reads
    before hand-picking funnel stages). One per-user window shuffle
    ordered by the (ts, event_id) total order produces both lags, the
    trigram rollup is |types|^3 at most, the 1-row total rides a
    broadcast, and the top-20 compiles to TakeOrdered — never a global
    sort. share is ONE double division of exact counts."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t3"),
        F.lag("event_type", 1).over(w).alias("t2"),
        F.lag("event_type", 2).over(w).alias("t1"),
    ).where(F.col("t1").isNotNull())
    n = seq.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        seq.crossJoin(F.broadcast(n))
        .groupBy("t1", "t2", "t3", "n_total")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .select(
            "t1",
            "t2",
            "t3",
            "n_paths",
            F.round(
                F.col("n_paths").cast("double")
                / F.col("n_total").cast("double"),
                4,
            ).alias("share"),
        )
        .orderBy(F.desc("n_paths"), "t1", "t2", "t3")
        .limit(20)
    )


@_q("event_transitions", "relational", _TRANSITIONS_SQL)
def event_transitions(spark, sf_dir):
    """Event-type transition matrix (user-path flow analysis): for every
    consecutive pair of events within a user's timeline, count
    prev_type -> next_type — the Markov view of product flows that
    funnel/retention/sessionization don't give. One user_id window
    shuffle ordered by (ts, event_id) — a total order, so the lag is
    deterministic — into a |types|^2-row rollup; share is ONE double
    division of exact counts against a 1-row broadcast total."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    n = seq.agg(F.count(F.lit(1)).alias("n_total")).alias("__r")
    return (
        seq.alias("__l")
        .crossJoin(F.broadcast(n))
        .groupBy("prev_type", "next_type", "n_total")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
        .select(
            "prev_type",
            "next_type",
            "n_transitions",
            (
                F.col("n_transitions").cast("double")
                / F.col("n_total").cast("double")
            ).alias("share"),
        )
    )


@_q(
    "session_windows",
    "relational",
    """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM sess GROUP BY user_id, sid
""",
)
def session_windows(spark, sf_dir):
    """Native `session_window` (30-min gap) — the built-in dynamic-gap
    session operator (vs `sessionization`/`stream_sessionize`, which build
    the same thing by hand). A session closes when the NEXT event is >= gap
    after the previous one; the oracle replays that with lag + running sum."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n",
            "total_value",
        )
    )


@_q(
    "pivot_status",
    "relational",
    """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_open,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_finished
FROM lineitem GROUP BY l_returnflag
""",
)
def pivot_status(spark, sf_dir):
    """Pivot (linestatus -> columns)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0)),
            2,
        ).alias("qty_open"),
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0)),
            2,
        ).alias("qty_finished"),
    )


@_q(
    "skew_salted_agg",
    "relational",
    """
SELECT o_orderstatus, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue,
       round(max(o_totalprice), 2) AS max_price
FROM orders GROUP BY o_orderstatus
""",
)
def skew_salted_agg(spark, sf_dir):
    """Two-phase salted aggregation (operators/skew.py) on a deliberately
    hot key (3 order statuses over the whole table): partials per
    (key, salt) bound any single reducer, the merge folds the partials.
    Must equal the plain one-phase GROUP BY — the oracle."""
    from fluxdb_spark.operators.skew import salted_agg

    o = _t(spark, sf_dir, "orders")
    out = salted_agg(
        o,
        ["o_orderstatus"],
        {
            "n_orders": ("o_orderkey", "count"),
            "revenue": ("o_totalprice", "sum"),
            "max_price": ("o_totalprice", "max"),
        },
    )
    return out.select(
        "o_orderstatus",
        "n_orders",
        F.round("revenue", 2).alias("revenue"),
        F.round("max_price", 2).alias("max_price"),
    )


@_q(
    "skew_salted_join",
    "relational",
    """
SELECT p.p_type,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_type
""",
)
def skew_salted_join(spark, sf_dir):
    """Skew-safe salted equi-join (operators/skew.py): the fact side is
    salted, the dim side replicated across salts, so one hot part key
    can't pin a single reducer. Must equal the plain join — the oracle."""
    from fluxdb_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"),
        "l_extendedprice",
        "l_discount",
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = salted_join(li, p, on=["p_partkey"], n_salts=8)
    return joined.groupBy("p_type").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@_q(
    "unpivot_pricing",
    "relational",
    """
WITH agg AS (
  SELECT l_returnflag,
         round(sum(l_extendedprice), 2) AS gross,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS discounted,
         round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS charged
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, metric, amount FROM agg
UNPIVOT (amount FOR metric IN (gross, discounted, charged))
""",
)
def unpivot_pricing(spark, sf_dir):
    """Unpivot (wide metric columns -> long (metric, amount) rows) via the
    native `DataFrame.unpivot` — the inverse of `pivot_status`, a map-only
    expression expansion (no shuffle beyond the feeding aggregate)."""
    li = _t(spark, sf_dir, "lineitem")
    gross = F.col("l_extendedprice")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum(gross), 2).alias("gross"),
        F.round(F.sum(disc), 2).alias("discounted"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("charged"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["gross", "discounted", "charged"],
        variableColumnName="metric",
        valueColumnName="amount",
    )


@_q(
    "zorder_layout",
    "relational",
    ly.sql_zorder_cells("lineitem", "l_orderkey", "l_partkey"),
)
def zorder_layout(spark, sf_dir):
    """Z-ORDER multi-dimensional clustering, audited: bucket
    (l_orderkey, l_partkey) into 256 equal-width bins each, interleave
    the bits (Morton shift-or-mask chain — exact integer, both
    engines), and report per coarse z-cell the row count and min/max of
    BOTH dimensions. The point at 100 TB: a single-column sort gives
    file-level min/max pruning on that column only; after
    repartitionByRange on the z-value every file bounds both columns
    tightly, so a predicate on EITHER dimension skips files. The cell
    relation is the audit of what that layout buys — tight per-cell
    ranges on both dims (pinned in test_plans/test_corpus). One min/max
    aggregate broadcast, one map-side projection, one bounded-cell
    rollup (operators/layout.zorder_cells; reference §1.2's one-
    dimensional key order is the problem this solves)."""
    li = _t(spark, sf_dir, "lineitem")
    return ly.zorder_cells(li, "l_orderkey", "l_partkey")


@_q(
    "funnel_latency",
    "relational",
    """
WITH fc AS (
  SELECT user_id, min(ts) AS c_ts FROM events
  WHERE event_type = 'click' GROUP BY 1),
lat AS (
  SELECT e.user_id,
         min(epoch_ms(e.ts)) - min(epoch_ms(f.c_ts)) AS lat_ms
  FROM events e JOIN fc f USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= f.c_ts
  GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       round(quantile_cont(lat_ms, 0.5), 4) AS p50_ms,
       round(quantile_cont(lat_ms, 0.9), 4) AS p90_ms
FROM lat
""",
)
def funnel_latency(spark, sf_dir):
    """Conversion LATENCY distribution — the time-to-convert complement
    to `event_funnel`'s conversion counts: per user, first click to the
    first purchase at-or-after it, in integer milliseconds (timestamp
    diffs cancel any timezone convention, unix_millis <-> epoch_ms),
    then exact interpolated percentiles over the converted-user
    relation. Two groupBys on the same user key (the exchange is
    reused) and a final single-row rollup; the percentile's input is
    |converted users|, never raw events."""
    ev = normalize_event_ts(_t(spark, sf_dir, "events"))
    fc = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    lat = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(
            (
                F.min(F.unix_millis("ts")) - F.min(F.unix_millis("c_ts"))
            ).alias("lat_ms")
        )
    )
    return lat.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.percentile("lat_ms", F.lit(0.5)), 4).alias("p50_ms"),
        F.round(F.percentile("lat_ms", F.lit(0.9)), 4).alias("p90_ms"),
    )


@_q(
    "weekly_growth",
    "relational",
    """
WITH daily AS (
  SELECT CAST(strftime(o_orderdate, '%Y-%m-%d') AS VARCHAR) AS day,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders GROUP BY 1)
SELECT day, n_orders, revenue_cents,
       lag(revenue_cents) OVER (ORDER BY day) AS prev_cents,
       CASE WHEN lag(revenue_cents) OVER (ORDER BY day) IS NULL THEN NULL
            ELSE ((revenue_cents - lag(revenue_cents) OVER (ORDER BY day))
                  * 1000000) // lag(revenue_cents) OVER (ORDER BY day)
       END AS growth_ppm
FROM daily
""",
)
def weekly_growth(spark, sf_dir):
    """Period-over-period growth reporting: daily revenue (exact integer
    cents) with the previous period's value and the growth rate in
    integer ppm — the standard reporting rollup, spelled so the only
    sort is over the |days| relation (the window's input is the DAILY
    aggregate, never order rows: at 100 TB the lag window sees
    365 rows/year regardless of volume). Date bucketing via formatted
    strings so both engines group identically."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
    )
    w = Window.orderBy("day")
    prev = F.lag("revenue_cents").over(w)
    return daily.select(
        "day",
        "n_orders",
        "revenue_cents",
        prev.alias("prev_cents"),
        F.when(prev.isNull(), F.lit(None).cast("long"))
        .otherwise(
            F.expr(
                "((revenue_cents - lag(revenue_cents) over (order by day))"
                " * 1000000) div lag(revenue_cents) over (order by day)"
            )
        )
        .alias("growth_ppm"),
    )


_BASKETS_SQL = """
SELECT l.l_orderkey AS bk, p.p_name AS item
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"""


@_q("basket_rules", "relational", bk.sql_basket_rules(_BASKETS_SQL))
def basket_rules(spark, sf_dir):
    """Market-basket association rules (Agrawal & Srikant 1994, pair
    form): which parts co-occur in the same order beyond chance —
    support / directional confidence / lift over per-order item sets,
    top-20 by lift. Exact-integer ppm scoring (the two-step integral
    division of `collocations`); within-basket pair explode bounded by
    basket size^2 per order, then everything runs on vocabulary-bounded
    relations with item supports broadcast back
    (functions/baskets.basket_rules)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    b = li.join(
        F.broadcast(p.select("p_partkey", "p_name")),
        li.l_partkey == p.p_partkey,
    ).select(F.col("l_orderkey").alias("bk"), F.col("p_name").alias("item"))
    return bk.basket_rules(b, "bk", "item")


@_q(
    "join_size_estimate",
    "relational",
    tx.sql_cms_join_size("events", "orders", "user_id", "o_custkey"),
)
def join_size_estimate(spark, sf_dir):
    """Sketch-based JOIN-SIZE estimation (Cormode & Muthukrishnan 2005
    §4.2): the inner product of two frequency vectors — exactly the row
    count of events JOIN orders ON user_id = o_custkey, both sides
    non-unique — estimated by the bucket-wise product of two count-min
    sketches, min over hash rows. The query-planner primitive: at
    100 TB the join strategy decision reads two depth x width counter
    tables built by one map-side-combined pass per input, never the
    join. Guaranteed overestimate within e/width * |A|*|B|; width is
    the documented accuracy knob (sized ~O(distinct keys): 4096 here
    gives 1.3x at sf0.01's 1.5K keys, 4.6x at sf0.1's 15K — a planner
    sizes width to its key-domain estimate, still KBs at 100 TB).
    Exact twin computed as the inner product of the per-key count
    relations (no join materialized); all-integer, hash-identical in
    both engines (functions/text.cms_join_size)."""
    ev = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    return tx.cms_join_size(ev, o, "user_id", "o_custkey")


def _robust_stats_sql() -> str:
    """DuckDB twin of `robust_stats` (shared HDR bucket arithmetic; the
    winsorized mean's division chain in the same textual order)."""
    idx = tx._hdr_idx_sql("cents")
    lo1 = tx._hdr_lower_sql("b01")
    lo99 = tx._hdr_lower_sql("b99")
    return f"""
WITH v AS MATERIALIZED (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem),
hist AS MATERIALIZED (
  SELECT flag, {idx} AS bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM v GROUP BY 1, 2),
n AS (SELECT flag, CAST(sum(cnt) AS BIGINT) AS n_rows FROM hist GROUP BY 1),
cum AS (SELECT flag, bucket,
               sum(cnt) OVER (PARTITION BY flag ORDER BY bucket) AS c
        FROM hist),
cuts AS (
  SELECT n.flag,
         (SELECT min(bucket) FROM cum
          WHERE cum.flag = n.flag AND c >= ceil(0.01 * n_rows)) AS b01,
         (SELECT min(bucket) FROM cum
          WHERE cum.flag = n.flag AND c >= ceil(0.99 * n_rows)) AS b99
  FROM n),
th AS (SELECT flag, CAST({lo1} AS BIGINT) AS lo,
              CAST({lo99} AS BIGINT) AS hi FROM cuts)
SELECT v.flag AS l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(max(th.lo) AS BIGINT) AS p01_cents,
       CAST(max(th.hi) AS BIGINT) AS p99_cents,
       CAST(sum(v.cents) AS DOUBLE) / CAST(count(*) * 100 AS DOUBLE)
         AS mean_raw,
       CAST(sum(least(greatest(v.cents, th.lo), th.hi)) AS DOUBLE)
         / CAST(count(*) * 100 AS DOUBLE) AS mean_winsorized
FROM v JOIN th USING (flag)
GROUP BY 1
"""


@_q("robust_stats", "relational", _robust_stats_sql())
def robust_stats(spark, sf_dir):
    """Outlier-robust (winsorized) aggregation WITHOUT sorting: per
    return flag, the mean of l_extendedprice with values clamped to the
    [p1, p99] thresholds read off the mergeable HDR bucket sketch — the
    robust metric a 100 TB job cannot get from exact percentiles
    (Spark's exact `percentile` buffers every value of a group in one
    task; the sketch histogram is a combine-friendly groupBy over the
    bounded bucket space). Thresholds are bucket lower bounds (exact
    integer arithmetic, ~3% relative error — winsorization only needs a
    stable cut, not an exact order statistic), clamping is map-side
    against the broadcast per-flag thresholds, and every sum is exact
    integer cents; the two emitted means are single double divisions
    spelled identically in the SQL twin."""
    li = _t(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.expr(
            "CAST(round(l_extendedprice * 100) AS BIGINT)"
        ).alias("cents"),
    ).localCheckpoint(eager=False)
    hist = v.groupBy(
        "flag", F.expr(tx._hdr_idx_expr("cents")).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    n = hist.groupBy("flag").agg(F.sum("cnt").cast("long").alias("n_rows"))
    wc = (
        Window.partitionBy("flag")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("c", F.sum("cnt").over(wc)).join(
        F.broadcast(n), "flag"
    )
    th = cum.groupBy("flag").agg(
        F.expr(
            "CAST("
            + tx._hdr_lower_sql(
                "min(CASE WHEN c >= ceil(0.01 * n_rows)"
                " THEN bucket END)"
            )
            + " AS BIGINT)"
        ).alias("lo"),
        F.expr(
            "CAST("
            + tx._hdr_lower_sql(
                "min(CASE WHEN c >= ceil(0.99 * n_rows)"
                " THEN bucket END)"
            )
            + " AS BIGINT)"
        ).alias("hi"),
    )
    return (
        v.join(F.broadcast(th), "flag")
        .groupBy(F.col("flag").alias("l_returnflag"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.max("lo").cast("long").alias("p01_cents"),
            F.max("hi").cast("long").alias("p99_cents"),
            (
                F.sum("cents").cast("double")
                / (F.count(F.lit(1)) * F.lit(100)).cast("double")
            ).alias("mean_raw"),
            (
                F.sum(F.least(F.greatest(F.col("cents"), F.col("lo")),
                              F.col("hi"))).cast("double")
                / (F.count(F.lit(1)) * F.lit(100)).cast("double")
            ).alias("mean_winsorized"),
        )
    )


# =========================================================================
# 5. Extended relational coverage (grouping sets, semi/anti joins, stats,
#    ranking windows, percentiles, subqueries, typed-view decoding)
# =========================================================================


@_q(
    "grouping_sets",
    "relational",
    """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_extendedprice), 2) AS total
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (flag-only, status-only, grand total)."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               round(sum(l_extendedprice), 2) AS total
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@_q(
    "bloom_semi_join",
    "relational",
    """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l.l_orderkey
                AND o.o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
""",
)
def bloom_semi_join(spark, sf_dir):
    """Bloom-pruned EXACT semi-join (the user-space runtime filter /
    sideways-information-passing pattern): urgent-order keys fold into an
    8 KB bitmap via one bit_or aggregate (partial blooms merge by OR),
    the fact scan is pruned by a plan-literal bloom probe inside
    WholeStageCodegen BEFORE any shuffle, and an exact left-semi join
    over the survivors removes false positives — exactly the semi-join,
    with the shuffle carrying match+fp rows instead of the whole table
    (operators/bloomjoin.bloom_semi_join). The oracle is the plain
    EXISTS form; bloom parameters cannot change the result."""
    li = _t(spark, sf_dir, "lineitem")
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    kept = bj.bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    return kept.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").cast("bigint").alias("sum_qty"),
    )


@_q(
    "semi_anti_join",
    "relational",
    """
SELECT 'with_orders' AS tag, count(*) AS n FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT 'without_orders' AS tag, count(*) AS n FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def semi_anti_join(spark, sf_dir):
    """Left-semi (EXISTS) and left-anti (NOT EXISTS) joins, combined into
    ONE distributed plan (union of the two counts) — no driver-side
    `.count()` round-trips, so the whole thing is a single job."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    return semi.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("with_orders").alias("tag"), "n"
    ).unionAll(
        anti.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("without_orders").alias("tag"), "n"
        )
    )


_PROFILE_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_totalprice", "num"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
    ("o_orderdate", "ts"),
]

_PROFILE_SQL = """
SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
  CAST(min(o_orderkey) AS DOUBLE) AS min_num, CAST(max(o_orderkey) AS DOUBLE) AS max_num
FROM orders
UNION ALL
SELECT 'o_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
  CAST(min(o_custkey) AS DOUBLE) AS min_num, CAST(max(o_custkey) AS DOUBLE) AS max_num
FROM orders
UNION ALL
SELECT 'o_totalprice' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  CAST(count(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
  CAST(min(o_totalprice) AS DOUBLE) AS min_num, CAST(max(o_totalprice) AS DOUBLE) AS max_num
FROM orders
UNION ALL
SELECT 'o_orderstatus' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
  min(o_orderstatus) AS min_str, max(o_orderstatus) AS max_str,
  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num
FROM orders
UNION ALL
SELECT 'o_orderpriority' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_distinct,
  min(o_orderpriority) AS min_str, max(o_orderpriority) AS max_str,
  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num
FROM orders
UNION ALL
SELECT 'o_orderdate' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  CAST(count(DISTINCT o_orderdate) AS BIGINT) AS n_distinct,
  strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_str, strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_str,
  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num
FROM orders
"""


@_q("table_profile", "relational", _PROFILE_SQL)
def table_profile(spark, sf_dir):
    """ANALYZE-style table profile: per column, row/null/exact-distinct
    counts plus min/max (numeric columns as doubles — data values, so
    bit-identical; string columns binary-collated; timestamps formatted)
    — the stats pass a query planner or a data-quality monitor runs
    before anything else. ONE scan: all columns' counts and extrema fold
    in a single aggregation (the multi-distinct EXPAND multiplies rows
    by |profiled columns| map-side — the standard profiling trade; at
    extreme widths you swap the distinct counts for the HLL estimator
    this catalog also ships); the long form is an explode of the 1-row
    aggregate, |cols| output rows."""
    o = _t(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c, kind in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
        ]
    one = o.agg(*aggs)

    def row(c, kind):
        null_s = F.lit(None).cast("string")
        null_d = F.lit(None).cast("double")
        if kind == "num":
            ms, xs = null_s, null_s
            mn = F.col(f"mn_{c}").cast("double")
            mx = F.col(f"mx_{c}").cast("double")
        elif kind == "str":
            ms, xs = F.col(f"mn_{c}"), F.col(f"mx_{c}")
            mn, mx = null_d, null_d
        else:
            fmt = "yyyy-MM-dd HH:mm:ss"
            ms = F.date_format(F.col(f"mn_{c}"), fmt)
            xs = F.date_format(F.col(f"mx_{c}"), fmt)
            mn, mx = null_d, null_d
        return F.struct(
            F.lit(c).alias("col_name"),
            F.col("n").cast("long").alias("n_rows"),
            F.col(f"null_{c}").cast("long").alias("n_null"),
            F.col(f"nd_{c}").cast("long").alias("n_distinct"),
            ms.alias("min_str"),
            xs.alias("max_str"),
            mn.alias("min_num"),
            mx.alias("max_num"),
        )

    return one.select(
        F.explode(
            F.array(*[row(c, k) for c, k in _PROFILE_COLS])
        ).alias("s")
    ).select("s.*")



@_q(
    "stats_aggs",
    "relational",
    """
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS sd_qty,
       round(var_samp(l_quantity), 4) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem GROUP BY l_returnflag
""",
)
def stats_aggs(spark, sf_dir):
    """Statistical aggregates (sample stddev/variance, corr, covar)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@_q(
    "window_ranks",
    "relational",
    """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       lag(o_orderkey) OVER w AS prev_order,
       lead(o_orderkey) OVER w AS next_order
FROM orders
WHERE o_custkey < 10
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def window_ranks(spark, sf_dir):
    """Ranking / navigation window functions."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 10)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


@_q(
    "percentiles",
    "relational",
    """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
FROM lineitem GROUP BY l_returnflag
""",
)
def percentiles(spark, sf_dir):
    """Exact continuous percentiles (interpolated, both engines)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
    )


@_q(
    "scalar_subquery",
    "relational",
    """
SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
""",
)
def scalar_subquery(spark, sf_dir):
    """Scalar subquery in a predicate."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
        FROM orders_sq
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders_sq)
        """
    )


@_q(
    "asof_join_nearest",
    "relational",
    """
WITH p AS (SELECT event_id, user_id FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, event_id AS click_event_id, value
      FROM events WHERE event_type = 'click'),
b AS (SELECT p.event_id, p.user_id, c.click_event_id AS b_id,
             round(c.value, 2) AS b_val
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND c.click_event_id <= p.event_id),
f AS (SELECT p.event_id, c.click_event_id AS f_id, round(c.value, 2) AS f_val
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND c.click_event_id >= p.event_id)
SELECT b.event_id, b.user_id,
       CASE WHEN b_id IS NULL THEN f_val
            WHEN f_id IS NULL THEN b_val
            WHEN (f_id - b.event_id) < (b.event_id - b_id) THEN f_val
            ELSE b_val END AS click_value,
       CASE WHEN b_id IS NULL THEN f_id
            WHEN f_id IS NULL THEN b_id
            WHEN (f_id - b.event_id) < (b.event_id - b_id) THEN f_id
            ELSE b_id END AS click_event_id
FROM b JOIN f USING (event_id)
""",
)
def asof_join_nearest(spark, sf_dir):
    """As-of join, NEAREST direction (pandas merge_asof 'nearest', pinned
    against it in test_asof): each purchase attaches the click closest by
    absolute event-id gap, ties to the backward side. One shuffle: both
    frame picks (last-before, first-after) evaluate in a single Window
    pass, then a map-side gap choice. Oracle = two native DuckDB ASOF
    joins (backward + forward) combined by the same gap rule."""
    from fluxdb_spark.operators.asof import asof_join as asof_op

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("value").alias("click_value_raw"),
    )
    out = asof_op(
        purchases,
        clicks,
        on=["user_id"],
        left_time="event_id",
        right_time="click_event_id",
        payload_cols=["click_value_raw", "click_event_id"],
        direction="nearest",
        allow_exact_matches=True,
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("click_value_raw", 2).alias("click_value"),
        "click_event_id",
    )


@_q(
    "window_frames",
    "relational",
    """
SELECT o_custkey, o_orderkey,
       floor(cume_dist() OVER w * 10000) / 10000.0 AS cdist,
       floor(percent_rank() OVER w * 10000) / 10000.0 AS prank,
       first_value(o_orderkey) OVER w AS priciest,
       last_value(o_orderkey) OVER (PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING
           AND UNBOUNDED FOLLOWING) AS cheapest,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING
           AND UNBOUNDED FOLLOWING) AS runner_up,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS moving_sum3
FROM orders
WHERE o_custkey < 10
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def window_frames(spark, sf_dir):
    """Analytic window functions with explicit frames: distribution
    functions (cume_dist / percent_rank), positional frame picks
    (first / last / nth over the full frame), and a 3-row moving
    sum (computed in DECIMAL so the window arithmetic is exact to the
    cent across engines) — the frame-semantics half of the window surface that
    `window_ranks` (ranking / navigation) does not touch."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 10)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wmov = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.floor(F.cume_dist().over(w) * 10000) / 10000.0).alias("cdist"),
        (F.floor(F.percent_rank().over(w) * 10000) / 10000.0).alias("prank"),
        F.first("o_orderkey").over(wfull).alias("priciest"),
        F.last("o_orderkey").over(wfull).alias("cheapest"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("runner_up"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(wmov)
        .cast("double")
        .alias("moving_sum3"),
    )


@_q(
    "interval_merge",
    "relational",
    """
WITH iv AS (
  SELECT l_suppkey,
         CAST(datediff('day', TIMESTAMP '1992-01-01', l_shipdate) AS BIGINT)
           AS s,
         CAST(datediff('day', TIMESTAMP '1992-01-01', l_shipdate) AS BIGINT)
           + CAST(floor(l_quantity) AS BIGINT) AS e
  FROM lineitem),
o AS (
  SELECT l_suppkey, s, e,
         max(e) OVER (PARTITION BY l_suppkey ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM iv),
f AS (
  SELECT l_suppkey, s, e,
         CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END
           AS is_new
  FROM o),
g AS (
  SELECT l_suppkey, s, e,
         sum(is_new) OVER (PARTITION BY l_suppkey ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM f),
isl AS (
  SELECT l_suppkey, island,
         min(s) AS island_start, max(e) AS island_end,
         CAST(count(*) AS BIGINT) AS n_merged
  FROM g GROUP BY 1, 2)
SELECT l_suppkey,
       CAST(sum(n_merged) AS BIGINT) AS n_intervals,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(island_end - island_start + 1) AS BIGINT) AS covered_days,
       CAST(max(n_merged) AS BIGINT) AS max_merged
FROM isl GROUP BY 1
""",
)
def interval_merge(spark, sf_dir):
    """Gaps-and-islands interval MERGE — the missing set-union of the
    interval family (`interval_overlap_join` pairs intervals,
    `range_join_incidents` bands them; this COALESCES them): per
    supplier, each shipment occupies [shipdate, shipdate + quantity
    days], and overlapping occupations merge into islands — islands
    per key, total covered days, and the largest pile-up.  The classic
    uptime / contract-coverage / occupancy operator, done the only way
    that scales: a prefix-max window (is a new island starting?) plus a
    running flag-sum (which island is this row in?) — two windows on
    ONE (key, start) in-partition sort, where the naive formulation is
    an interval self-join that goes quadratic per hot key.  Integer
    day arithmetic end-to-end (floor() pins the double->int cast, which
    truncates in Spark but rounds in DuckDB).  Scale shape: one shuffle
    on l_suppkey, both windows and both rollups ride it map-side."""
    li = _t(spark, sf_dir, "lineitem")
    epoch = F.lit("1992-01-01").cast("timestamp")
    iv = li.select(
        "l_suppkey",
        F.datediff(F.col("l_shipdate"), epoch).cast("long").alias("s"),
        (
            F.datediff(F.col("l_shipdate"), epoch).cast("long")
            + F.floor("l_quantity").cast("long")
        ).alias("e"),
    )
    w_prev = Window.partitionBy("l_suppkey").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_run = Window.partitionBy("l_suppkey").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = iv.select(
        "l_suppkey",
        "s",
        "e",
        F.when(
            F.max("e").over(w_prev).isNull()
            | (F.col("s") > F.max("e").over(w_prev)),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    islands = (
        flagged.withColumn("island", F.sum("is_new").over(w_run))
        .groupBy("l_suppkey", "island")
        .agg(
            F.min("s").alias("island_start"),
            F.max("e").alias("island_end"),
            F.count(F.lit(1)).cast("long").alias("n_merged"),
        )
    )
    return islands.groupBy("l_suppkey").agg(
        F.sum("n_merged").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("island_end") - F.col("island_start") + 1)
        .cast("long")
        .alias("covered_days"),
        F.max("n_merged").cast("long").alias("max_merged"),
    )


# Session-gap sweep constants (round 14).  The sweep prices the gap
# threshold the way flux_snapshot_cadence_sweep prices the index
# cadence: every candidate from ONE pass.
_SESSION_GAPS_S = (300, 1800, 7200)

# Engine-common integer ratios ({div} -> `div` in Spark, `//` in DuckDB;
# both truncate-floor for the nonnegative operands here).
_SESS_MEAN_EVENTS = (
    "CASE WHEN n_sessions = 0 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(n_events * 100 {div} n_sessions AS BIGINT) END"
)
_SESS_MEAN_DUR = (
    "CASE WHEN n_sessions = 0 THEN CAST(0 AS BIGINT)"
    " ELSE CAST((in_session_us {div} n_sessions) {div} 1000000"
    " AS BIGINT) END"
)


def _session_sweep_sql() -> str:
    """Oracle derived from the SAME _SESSION_GAPS_S constants the Spark
    plan explodes (a hardcoded threshold list would silently
    desynchronize on retune)."""
    rows = ", ".join(
        f"(CAST({t} AS BIGINT),"
        f" CAST(sum(CASE WHEN gap_us > CAST({t} AS BIGINT) * 1000000 THEN 1 ELSE 0 END)"
        f" AS BIGINT),"
        f" CAST(sum(CASE WHEN gap_us > CAST({t} AS BIGINT) * 1000000 THEN gap_us"
        f" ELSE 0 END) AS BIGINT))"
        for t in _SESSION_GAPS_S
    )
    sel = "SELECT unnest([" + ", ".join(
        f"{{'threshold_s': s{i}[1], 'n_boundaries': s{i}[2],"
        f" 'cut_us': s{i}[3]}}"
        for i in range(len(_SESSION_GAPS_S))
    ) + "], recursive := true), n_users, n_events, span_us FROM g"
    structs = ", ".join(f"{r} AS s{i}" for i, r in enumerate([
        f"(CAST({t} AS BIGINT),"
        f" CAST(sum(CASE WHEN gap_us > CAST({t} AS BIGINT) * 1000000 THEN 1 ELSE 0 END)"
        f" AS BIGINT),"
        f" CAST(sum(CASE WHEN gap_us > CAST({t} AS BIGINT) * 1000000 THEN gap_us"
        f" ELSE 0 END) AS BIGINT))"
        for t in _SESSION_GAPS_S
    ]))
    return f"""
WITH o AS (
  SELECT user_id, epoch_us(ts) AS us,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events),
pu AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         CAST(max(us) - min(us) AS BIGINT) AS span_us
  FROM o GROUP BY 1),
g AS (
  SELECT CAST((SELECT count(*) FROM pu) AS BIGINT) AS n_users,
         CAST((SELECT sum(n_events) FROM pu) AS BIGINT) AS n_events,
         CAST((SELECT sum(span_us) FROM pu) AS BIGINT) AS span_us,
         {structs}
  FROM o WHERE gap_us IS NOT NULL),
st AS ({sel}),
fin AS (
  SELECT threshold_s, n_users, n_events,
         n_users + n_boundaries AS n_sessions,
         span_us - cut_us AS in_session_us
  FROM st)
SELECT threshold_s, n_users, n_events, n_sessions,
       {_SESS_MEAN_EVENTS.format(div='//')} AS mean_events_x100,
       {_SESS_MEAN_DUR.format(div='//')} AS mean_session_s
FROM fin
"""


@_q("session_gap_sweep", "relational", _session_sweep_sql())
def session_gap_sweep(spark, sf_dir):
    """Session-GAP pricing sweep: the 30-minute constant `sessionization`
    hardcodes, priced across every candidate threshold from ONE pass —
    per threshold, global session count, mean events per session and
    mean session duration (a gap > t splits exactly one session, so
    sessions = users + split boundaries and in-session time = total
    span minus the cut gaps; both are conditional sums over the SAME
    lag relation, no per-threshold re-segmentation).  The knee of this
    curve is how a 30-minute default is justified instead of assumed.
    Scale shape: one lag window riding the per-user partitioning the
    sessionizers already shuffle by, one map-side-combined rollup;
    thresholds are conditional aggregates, and the 3-row explode
    happens on the single global-rollup row."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        us.alias("us"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )
    pu = o.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("us") - F.min("us")).cast("long").alias("span_us"),
    )
    gl = pu.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("span_us").cast("long").alias("span_us"),
    )
    cuts = o.filter(F.col("gap_us").isNotNull()).agg(
        *[
            x
            for t in _SESSION_GAPS_S
            for x in (
                F.sum(
                    F.when(F.col("gap_us") > t * 1_000_000, 1).otherwise(0)
                )
                .cast("long")
                .alias(f"nb{t}"),
                F.sum(
                    F.when(
                        F.col("gap_us") > t * 1_000_000, F.col("gap_us")
                    ).otherwise(0)
                )
                .cast("long")
                .alias(f"cut{t}"),
            )
        ]
    )
    one = gl.crossJoin(F.broadcast(cuts))
    stacked = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).cast("long").alias("threshold_s"),
                        F.col(f"nb{t}").alias("n_boundaries"),
                        F.col(f"cut{t}").alias("cut_us"),
                    )
                    for t in _SESSION_GAPS_S
                ]
            )
        ).alias("s"),
        "n_users",
        "n_events",
        "span_us",
    ).select(
        "s.threshold_s",
        "n_users",
        "n_events",
        (F.col("n_users") + F.col("s.n_boundaries")).alias("n_sessions"),
        (F.col("span_us") - F.col("s.cut_us")).alias("in_session_us"),
    )
    return stacked.select(
        "threshold_s",
        "n_users",
        "n_events",
        "n_sessions",
        F.expr(_SESS_MEAN_EVENTS.format(div="div")).alias(
            "mean_events_x100"
        ),
        F.expr(_SESS_MEAN_DUR.format(div="div")).alias("mean_session_s"),
    )
