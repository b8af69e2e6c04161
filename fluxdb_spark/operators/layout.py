"""Physical-layout operators: multi-dimensional clustering (Z-order).

The reference's physical layout is a single composite key order
(SURVEY §1.2: collection/tablet/height/primary_key — range scans along
ONE dimension are contiguous, every other access pattern is a full
scan).  At 100 TB on a lakehouse the same problem appears as file-level
data skipping: sorting by one column gives min/max pruning on that
column only.  Z-ORDER clustering interleaves the bits of two dimensions
so that rows close in (x, y) space land close in the linear order —
after range-partitioning by the z-value, EVERY file bounds BOTH columns
tightly and a predicate on either dimension prunes files.

Everything here is exact integer arithmetic (equal-width bucketing +
Morton bit-spreading via shift/mask chains), so the layout decision is
bit-deterministic and the whole relation hash-matches a DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 8 bits per dimension -> 16-bit z-value, 256 coarse cells at prefix 8.
ZBITS = 8

# Morton spread of an 8-bit value into the even bit positions of 16 bits:
# classic shift-or-mask chain, expressible identically in Spark SQL and
# DuckDB (BIGINT & | << only).
_SPREAD_STEPS = [(4, 0x0F0F), (2, 0x3333), (1, 0x5555)]


def _bucket_expr(col: str, mn: str, mx: str) -> str:
    """Equal-width bucket index in [0, 2^ZBITS): ((v-min) << ZBITS) div
    (max-min+1).  Integer-exact; the +1 keeps the top value in range."""
    return (
        f"CAST(((CAST({col} AS BIGINT) - {mn}) * {1 << ZBITS})"
        f" div ({mx} - {mn} + 1) AS BIGINT)"
    )


def _spread_sql(e: str) -> str:
    """Spread ZBITS low bits into even positions (shift-or-mask chain).
    Text grows 2x per step; at 3 steps the expression stays small."""
    for s, m in _SPREAD_STEPS:
        e = f"((({e}) | (({e}) << {s})) & {m})"
    return e


def zorder_cells(
    df: DataFrame,
    x_col: str,
    y_col: str,
    prefix_bits: int = ZBITS,
) -> DataFrame:
    """The measurable data-skipping claim as a relation: bucket both
    dimensions into 2^ZBITS equal-width bins (bounds from one min/max
    aggregate, broadcast), interleave into a z-value, and report per
    coarse z-cell (top `prefix_bits` bits): row count and the min/max
    of BOTH dimensions.  Tight per-cell ranges on both columns are
    exactly what lets a scan planner skip cells for a predicate on
    either one — the property a single-column sort only gives its own
    column.

    Scale shape: one min/max aggregate (1 row, broadcast), one map-side
    z-value projection, one combine-friendly groupBy over at most
    2^prefix_bits cells.  To actually LAY OUT data at scale you'd
    `repartitionByRange(zval)` and write — the cell relation here is
    the audit of what that layout buys."""
    bounds = df.agg(
        F.min(x_col).cast("long").alias("mnx"),
        F.max(x_col).cast("long").alias("mxx"),
        F.min(y_col).cast("long").alias("mny"),
        F.max(y_col).cast("long").alias("mxy"),
    )
    bx = _bucket_expr(x_col, "mnx", "mxx")
    by = _bucket_expr(y_col, "mny", "mxy")
    z = f"(({_spread_sql(bx)} << 1) | {_spread_sql(by)})"
    cell = f"CAST(({z}) >> {2 * ZBITS - prefix_bits} AS BIGINT)"
    return (
        df.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(cell).alias("zcell"),
            F.col(x_col).cast("long").alias("x"),
            F.col(y_col).cast("long").alias("y"),
        )
        .groupBy("zcell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )


def sql_zorder_cells(
    table: str,
    x_col: str,
    y_col: str,
    prefix_bits: int = ZBITS,
) -> str:
    """DuckDB twin of `zorder_cells` (same bucket arithmetic, same
    spread chain, same cell prefix)."""
    bx = _bucket_expr(x_col, "mnx", "mxx")
    by = _bucket_expr(y_col, "mny", "mxy")
    # DuckDB integer division: div -> //
    bx = bx.replace(" div ", " // ")
    by = by.replace(" div ", " // ")
    z = f"(({_spread_sql(bx)} << 1) | {_spread_sql(by)})"
    cell = f"CAST(({z}) >> {2 * ZBITS - prefix_bits} AS BIGINT)"
    return f"""
WITH bounds AS (
  SELECT CAST(min({x_col}) AS BIGINT) AS mnx,
         CAST(max({x_col}) AS BIGINT) AS mxx,
         CAST(min({y_col}) AS BIGINT) AS mny,
         CAST(max({y_col}) AS BIGINT) AS mxy
  FROM {table}),
zv AS (
  SELECT {cell} AS zcell,
         CAST({x_col} AS BIGINT) AS x, CAST({y_col} AS BIGINT) AS y
  FROM {table}, bounds)
SELECT zcell, CAST(count(*) AS BIGINT) AS n,
       min(x) AS min_x, max(x) AS max_x,
       min(y) AS min_y, max(y) AS max_y
FROM zv GROUP BY zcell
"""
