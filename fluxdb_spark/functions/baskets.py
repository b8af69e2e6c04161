"""Market-basket association rules (Agrawal & Srikant 1994, pair form).

Which items co-occur in the same order beyond chance, and with what
directional confidence — support / confidence / lift over per-order item
sets, the retail-analytics classic and the same co-occurrence shape a
prompt/tool-usage log analysis needs. Pairs only (the 2-itemset level of
Apriori): at corpus scale the within-basket pair explode is bounded by
max-basket-size^2 per order (baskets are small by domain — a cart, a
session), and everything after the pair groupBy runs on
vocabulary-bounded relations.

All scores are EXACT-INTEGER ppm via the two-step integral division of
`text.collocations` (first quotient <= 10^6 because s_ab <= s_a), so the
ranking is bit-identical to the DuckDB oracle with no libm anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MIN_SUPPORT = 5
_PPM = 1_000_000


def basket_rules(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    min_support: int = MIN_SUPPORT,
    top_k: int = 20,
) -> DataFrame:
    """Top-k directional rules (antecedent -> consequent) by lift.

    `baskets`: one row per (basket, item) — duplicates tolerated (the
    per-basket collect_set makes items distinct). support = baskets
    containing both items; confidence_ppm = 10^6 * s_ab / s_a;
    lift_ppm = 10^6 * s_ab*N / (s_a*s_b). Both directions of every
    qualifying pair are emitted (confidence is asymmetric). Scale: ONE
    exchange of the (basket, item) rows folds each basket to its sorted
    distinct item array; within-basket pairs are a per-row array
    expression over that fold (sort_array uses the same string ordering
    the old x.item < y.item self-join filtered on, so pairs i < j are
    the identical set) — no distinct pre-shuffle and no self-join, and
    everything after runs on vocabulary-sized relations; item supports
    join back broadcast; N on a 1-row broadcast; top-k via sort+limit.

    Returns (antecedent, consequent, support, confidence_ppm, lift_ppm,
    rank).
    """
    b = (
        baskets.select(
            F.col(basket_col).alias("bk"), F.col(item_col).alias("item")
        )
        .groupBy("bk")
        .agg(F.sort_array(F.collect_set("item")).alias("items"))
        .localCheckpoint()  # feeds three branches below
    )
    n = b.agg(F.count(F.lit(1)).alias("n"))
    item_sup = (
        b.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    pair_structs = F.flatten(
        F.transform(
            "items",
            lambda x, i: F.transform(
                F.slice(F.col("items"), i + 2, F.size("items")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        b.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("s_ab"))
        .filter(F.col("s_ab") >= min_support)
    )
    rules = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a").alias("antecedent"),
                    F.col("b").alias("consequent"),
                ),
                F.struct(
                    F.col("b").alias("antecedent"),
                    F.col("a").alias("consequent"),
                ),
            )
        ).alias("r"),
        "s_ab",
    ).select("r.antecedent", "r.consequent", "s_ab")
    scored = (
        rules.join(
            F.broadcast(
                item_sup.select(
                    F.col("item").alias("antecedent"),
                    F.col("s").alias("s_a"),
                )
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                item_sup.select(
                    F.col("item").alias("consequent"),
                    F.col("s").alias("s_b"),
                )
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            F.col("s_ab").alias("support"),
            F.expr(f"(s_ab * {_PPM}) div s_a").alias("confidence_ppm"),
            F.expr(f"(((s_ab * {_PPM}) div s_a) * n) div s_b").alias(
                "lift_ppm"
            ),
        )
    )
    order = [
        F.desc("lift_ppm"),
        F.asc("antecedent"),
        F.asc("consequent"),
    ]
    top = scored.orderBy(*order).limit(top_k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def sql_basket_rules(
    baskets_sql: str,
    min_support: int = MIN_SUPPORT,
    top_k: int = 20,
) -> str:
    """DuckDB twin of `basket_rules` over a (bk, item) SELECT."""
    return f"""
WITH b AS MATERIALIZED (SELECT DISTINCT bk, item FROM ({baskets_sql})),
n AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n FROM b),
item_sup AS (SELECT item, CAST(count(*) AS BIGINT) AS s FROM b GROUP BY 1),
pairs AS (
  SELECT x.item AS a, y.item AS b, CAST(count(*) AS BIGINT) AS s_ab
  FROM b x JOIN b y ON x.bk = y.bk AND x.item < y.item
  GROUP BY 1, 2 HAVING count(*) >= {min_support}),
rules AS (
  SELECT a AS antecedent, b AS consequent, s_ab FROM pairs
  UNION ALL SELECT b, a, s_ab FROM pairs),
scored AS (
  SELECT antecedent, consequent, s_ab AS support,
         (s_ab * {_PPM}) // sa.s AS confidence_ppm,
         (((s_ab * {_PPM}) // sa.s) * n) // sb.s AS lift_ppm
  FROM rules
  JOIN item_sup sa ON sa.item = antecedent
  JOIN item_sup sb ON sb.item = consequent, n),
top AS (
  SELECT * FROM scored
  ORDER BY lift_ppm DESC, antecedent ASC, consequent ASC LIMIT {top_k})
SELECT antecedent, consequent, support, confidence_ppm, lift_ppm,
       CAST(row_number() OVER (
         ORDER BY lift_ppm DESC, antecedent ASC, consequent ASC)
         AS BIGINT) AS rank
FROM top
"""
