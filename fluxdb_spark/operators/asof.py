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

_TAG = "__asof_tag"
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

    # tag order encodes the tie rule (see module docstring); forward flips
    # it; nearest uses the backward tagging (an exact-ts match, when
    # allowed, is a zero-gap BACKWARD match and wins outright)
    right_first = (
        allow_exact_matches
        if direction in ("backward", "nearest")
        else not allow_exact_matches
    )
    right_tag, left_tag = (0, 1) if right_first else (1, 0)

    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(right_tag).alias(_TAG),
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
        F.lit(left_tag).alias(_TAG),
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
    order = [F.col("__t"), F.col(_TAG), F.col("__tb")]
    wb = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(*order)
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
        # nearest: BOTH candidates from the same sorted partition pass
        # (same partitioning + ordering => Spark evaluates the two frames
        # in one Window over one shuffle), then a map-side choice by
        # absolute gap — ties prefer the backward match (pandas
        # merge_asof nearest semantics, pinned in tests)
        bgap = F.col("__t") - F.col("__b")["__rt"]
        fgap = F.col("__f")["__rt"] - F.col("__t")
        fwd_eligible = (
            F.col("__f")
            if allow_exact_matches
            # an exact-ts right row sorts after left when exact matches
            # are disallowed, so it lands in the forward frame with gap
            # 0 — it must not re-enter as a "nearest" match
            else F.when(fgap > 0, F.col("__f"))
        )
        out = (
            unioned.withColumn("__b", pick_back)
            .withColumn("__f", pick_fwd)
            .withColumn("__b", bound(F.col("__b"), bgap))
            .withColumn("__f", bound(fwd_eligible, fgap))
            .withColumn(
                "__match",
                F.when(F.col("__b").isNull(), F.col("__f"))
                .when(F.col("__f").isNull(), F.col("__b"))
                .when(fgap < bgap, F.col("__f"))
                .otherwise(F.col("__b")),
            )
        )
    out = out.filter(F.col(_TAG) == F.lit(left_tag))
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col("__match")[c].alias(c) for c in payload_cols],
    )
