"""General as-of join — the temporal-lookup primitive (the reference's
"latest value ≤ height" singlet read, read.go:300-349, generalized to any
left/right relation pair on event time).

Implementation is the union+window form, the shuffle-once scalable shape:

    tag right rows, union with left, one window per partition key ordered by
    (time, tag), pick the last right payload in the frame.

One shuffle total (the window partitioning), no per-key merge loops, no
range-condition join (which Spark would execute as a broadcast-nested-loop
or an exploding range join). Tie semantics are encoded purely in the sort
tag order:

- strict (right.ts <  left.ts): left sorts BEFORE right at equal ts, so an
  equal-ts right row falls outside the [start, current-1] frame;
- exact  (right.ts <= left.ts): right sorts before left, so it falls inside.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    payload_cols: list[str] | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = False,
    tiebreak: str | None = None,
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the payload of the latest (backward),
    earliest (forward), or closest-by-absolute-gap (nearest, ties to the
    backward side) right row within the same `on` group whose time is
    before/after (or equal, with `allow_exact_matches`) the left row's time.

    Returns all left columns plus `payload_cols` (null when no match).
    `tiebreak` names a column (used on whichever side has it) that makes
    ordering total when times repeat within one side: backward picks the
    LARGEST tiebreak among equal-time matches, forward the smallest.
    `tolerance` (pandas merge_asof's bound, in the time columns' own
    numeric units) nulls the match when the gap |left - right| exceeds
    it — a stale quote must not attach to today's trade. Applied AFTER
    the pick, so it costs a map-side comparison, never a second window.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}"
        )
    payload_cols = payload_cols or [
        c for c in right.columns if c not in on and c != right_time
    ]
    overlap = [c for c in payload_cols if c in left.columns]
    if overlap:
        raise ValueError(f"payload columns collide with left side: {overlap}")

    # Tag order encodes the exact-match rule PER FRAME (see module
    # docstring). The two frames need OPPOSITE tie rules: for the
    # backward frame [-inf, -1] an equal-ts right row participates iff
    # it sorts BEFORE the left row, for the forward frame [1, +inf] iff
    # it sorts AFTER — so each frame gets its own tag column and its own
    # ordering. (A single shared tagging cannot exclude an equal-ts row
    # from both frames at once: with exact matches disallowed it would
    # surface through the other frame at gap zero and, worse, SHADOW the
    # genuine next candidate behind it — the window's first/last pick
    # cannot skip past a row the frame admits.)
    rb, lb = (0, 1) if allow_exact_matches else (1, 0)  # backward rule
    rf, lf = (1, 0) if allow_exact_matches else (0, 1)  # forward rule

    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(rb).alias("__tag_b"),
        F.lit(rf).alias("__tag_f"),
        F.struct(
            F.col(right_time).alias("__rt"),
            *[F.col(c) for c in payload_cols],
        ).alias(_PAYLOAD),
        (
            F.col(tiebreak)
            if tiebreak and tiebreak in right.columns
            else F.lit(0)
        ).alias("__tb"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_time).alias("__t"),
        F.lit(lb).alias("__tag_b"),
        F.lit(lf).alias("__tag_f"),
        F.lit(None)
        .cast(r.schema[_PAYLOAD].dataType)
        .alias(_PAYLOAD),
        (
            F.col(tiebreak)
            if tiebreak and tiebreak in left.columns
            else F.lit(0)
        ).alias("__tb"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    wb = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.col("__tag_b"), F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.col("__tag_f"), F.col("__tb"))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    pick_back = F.last(_PAYLOAD, ignorenulls=True).over(wb)
    pick_fwd = F.first(_PAYLOAD, ignorenulls=True).over(wf)

    def bound(match, gap):
        """Null the match beyond the tolerance bound (map-side, after the
        window pick — never a second shuffle)."""
        if tolerance is None:
            return match
        return F.when(match.isNotNull() & (gap <= F.lit(tolerance)), match)

    unioned = r.unionByName(l)
    if direction == "backward":
        out = unioned.withColumn(
            "__match",
            bound(pick_back, F.col("__t") - pick_back["__rt"]),
        )
    elif direction == "forward":
        out = unioned.withColumn(
            "__match",
            bound(pick_fwd, pick_fwd["__rt"] - F.col("__t")),
        )
    else:
        # nearest: both frame picks over ONE shuffle (same partitioning;
        # the two orderings differ only in the tie tag, costing a second
        # in-partition sort, not a second exchange), then a map-side
        # choice by absolute gap — ties prefer the backward match
        # (pandas merge_asof nearest semantics, pinned in tests). Each
        # frame's own tag rule already excludes disallowed exact-ts
        # rows, so no gap-zero special case exists here.
        bgap = F.col("__t") - F.col("__b")["__rt"]
        fgap = F.col("__f")["__rt"] - F.col("__t")
        out = (
            unioned.withColumn("__b", pick_back)
            .withColumn("__f", pick_fwd)
            .withColumn("__b", bound(F.col("__b"), bgap))
            .withColumn("__f", bound(F.col("__f"), fgap))
            .withColumn(
                "__match",
                F.when(F.col("__b").isNull(), F.col("__f"))
                .when(F.col("__f").isNull(), F.col("__b"))
                .when(fgap < bgap, F.col("__f"))
                .otherwise(F.col("__b")),
            )
        )
    out = out.filter(F.col("__tag_b") == F.lit(lb))
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col("__match")[c].alias(c) for c in payload_cols],
    )
