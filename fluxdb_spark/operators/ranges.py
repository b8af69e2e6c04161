"""General range (interval) join: points into [start, end) intervals.

Spark has no native range-join strategy — a plain non-equi condition
compiles to BroadcastNestedLoopJoin / CartesianProduct, which is O(|points|
x |intervals|) work no matter the selectivity and the classic 100-TB
cliff. This operator turns the range predicate into an equi-join by
bin-bucketing the domain (the same trick DuckDB's IEJoin and Databricks'
range-join hints exist to avoid hand-writing):

- each point lands in exactly ONE bucket: floor(point / width);
- each interval is exploded to the buckets it overlaps:
  [floor(start / width), floor((end - 1) / width)];
- candidates come from an equi-join on the bucket id (hash shuffle, AQE
  handles skew), and the exact [start, end) predicate filters residually.

A (point, interval) pair can meet in only the point's bucket, so no
dedup pass is needed. Work is O(candidates) after one shuffle keyed by
bucket; choose `bucket_width` near the typical interval width so each
interval explodes to O(1) buckets (a width 10x under the typical interval
multiplies the interval side's shuffle volume 10x; a width 10x over it
inflates candidate fan-in per bucket).

Interval semantics are closed-open [start, end) over a LONG domain;
timestamp callers convert with `unix_micros` first (as the catalog's
incident-window query does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join each row of `points` to every interval row whose
    [start_col, end_col) contains `point_col`. Column sets must be disjoint
    (rename before calling, as with any join)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be a positive integer")
    p = points.withColumn(
        _BUCKET, F.floor(F.col(point_col) / F.lit(bucket_width))
    )
    # empty intervals (end <= start) must vanish, not explode backwards
    i = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)),
                F.floor((F.col(end_col) - 1) / F.lit(bucket_width)),
            )
        ),
    )
    return (
        p.join(i, on=_BUCKET)
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop(_BUCKET)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """INTERVAL x INTERVAL overlap join: each left [s1, e1) row joined to
    every right [s2, e2) row with a non-empty intersection — the other
    member of the range-join family (range_join covers point-in-interval;
    this covers session-vs-incident, downtime-vs-deploy, any
    two-interval-relation overlap). Same bin-bucketing escape from the
    nested-loop cliff, with one extra idea: BOTH sides explode to their
    covered buckets, and a candidate pair — which can now share many
    buckets — is kept only in the bucket of greatest(s1, s2), the
    overlap's first bucket. Every overlapping pair meets there exactly
    once, so no distinct pass and no duplicate-row shuffle; work is
    O(candidates) after one equi-join shuffle keyed by bucket."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be a positive integer")

    def _exploded(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.filter(F.col(e) > F.col(s)).withColumn(
            _BUCKET,
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / F.lit(bucket_width)),
                    F.floor((F.col(e) - 1) / F.lit(bucket_width)),
                )
            ),
        )

    joined = _exploded(left, left_start, left_end).join(
        _exploded(right, right_start, right_end), on=_BUCKET
    )
    overlap = (F.col(left_start) < F.col(right_end)) & (
        F.col(right_start) < F.col(left_end)
    )
    canonical = F.floor(
        F.greatest(F.col(left_start), F.col(right_start))
        / F.lit(bucket_width)
    )
    return (
        joined.filter(overlap)
        .filter(F.col(_BUCKET) == canonical)
        .drop(_BUCKET)
    )
