"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`, on in session.py)
handles most skew at runtime; these helpers cover the two cases it does not:

- `salted_agg`: a high-cardinality aggregate where one key holds a large
  fraction of all rows (a hot tablet, a viral document). Two-phase: salt the
  key into `n_salts` subkeys, partial-aggregate per (key, salt), then merge
  the partials — the classic two-round combiner that bounds any single
  reducer at |hot key| / n_salts rows.
- `salted_join`: a shuffle join whose LEFT side has hot keys and whose right
  side is too large to broadcast: salt the left, explode the right
  `n_salts`-fold (right rows replicate; pick the smaller side as `right`).

Both are pure DataFrame transforms — the salt is `pmod(hash(...), n)` over
stable columns, so results are deterministic and the shuffles stay equi-key.
The fold relies on the aggregate being algebraic (sum/count/min/max/...),
exactly the condition Spark's own partial aggregation needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16
_SALT = "__salt"


def _salt_col(cols: Sequence[str], n: int) -> Column:
    # hash of the non-key columns spreads a hot key's rows across salts
    # deterministically (no rand(): plans stay reproducible & retry-safe)
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n)).cast("int")


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = DEFAULT_SALTS,
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    `aggs` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}; the partial/merge pair is derived (count merges
    with sum). `salt_source` defaults to all non-key columns.
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for _, (_, fn) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    salt_source = salt_source or [
        c for c in df.columns if c not in key_cols
    ]
    salted = df.withColumn(_SALT, _salt_col(salt_source, n_salts))
    partial = salted.groupBy(*key_cols, _SALT).agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            getattr(F, merge_fn[fn])(out).alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (hot) left side, replicate the right
    side across all salts, join on key+salt. For the supported join types
    (inner / left / left_semi / left_anti) row multiplicity is preserved
    exactly; only the shuffle distribution changes. right/full joins are
    rejected: an unmatched right row appears once per salt replica, so
    those types cannot be salted by left-side salting.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; got {how!r} "
            "(right/full would multiply unmatched right rows n_salts times)"
        )
    non_key = [c for c in left.columns if c not in on]
    l_salted = left.withColumn(
        _SALT, _salt_col(non_key or on, n_salts)
    )
    r_replicated = right.withColumn(
        _SALT,
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return l_salted.join(r_replicated, on=[*on, _SALT], how=how).drop(_SALT)
