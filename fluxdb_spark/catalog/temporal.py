"""Catalog entries: temporal engine operators (SURVEY §2.1/§2.4/§2.5)."""

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
    _CADENCE_SQL,
    _KEY_SKEW_SQL,
    _cadence_finish,
    _cadence_profile,
    _key_skew_finish,
    _log2_bucket_sql,
)



# =========================================================================
# 1. Temporal engine operators (SURVEY §2.1/§2.4/§2.5)
# =========================================================================

_STATE_COLS = ["tablet_id", "primary_key", "height", "value", "block_num"]


def _dedup_sql(tablet: str, height: int, cols: str = "tablet_id, primary_key, height, value, block_num") -> str:
    return f"""
WITH {CHANGELOG_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY primary_key ORDER BY height DESC) AS rn
  FROM changelog WHERE tablet_id = '{tablet}' AND height <= {height})
SELECT {cols} FROM ranked WHERE rn = 1 AND NOT is_deletion
"""


@_q("flux_state_at", "temporal", _dedup_sql("click", 700))
def flux_state_at(spark, sf_dir):
    """R1 — snapshot-at-height read (reference ReadTabletAt, read.go:35-178)."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    return tp.state_at(log, "click", 700).select(*_STATE_COLS)


@_q("flux_state_at_indexed", "temporal", _dedup_sql("click", 800))
def flux_state_at_indexed(spark, sf_dir):
    """R1 via snapshot-index: build the index at 500, read at 800 as
    snapshot-union-delta; must equal the plain window answer (the oracle).

    The index is materialized via an eager localCheckpoint before the
    read — the in-session stand-in for what is a durable materialized
    table in a real deployment (reference stores it as a singlet entry,
    indexing.go:621-643); without it the read's two index consumers would
    each re-run the build job. localCheckpoint (not persist) so nothing
    lingers in the session cache after the query's consumers finish —
    the blocks free with the DataFrame reference."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    idx = sn.build_tablet_index(log, "click", 500).localCheckpoint()
    return sn.state_at_with_index(log, idx, "click", 800).select(*_STATE_COLS)


@_q(
    "flux_collection_state",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY tablet_id, primary_key
                               ORDER BY height DESC) AS rn
  FROM changelog WHERE height <= 700)
SELECT tablet_id, primary_key, height, value, block_num
FROM ranked WHERE rn = 1 AND NOT is_deletion
""",
)
def flux_collection_state(spark, sf_dir):
    """Whole-collection snapshot at height 700 (bulk state export): every
    tablet's last-write-wins state in ONE grouped aggregation — the read
    the reference would serve as one ReadTabletAt per tablet."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    return tp.collection_state_at(log, 700).select(*_STATE_COLS)


_STATE_JOIN_SQL = f"""
WITH {CHANGELOG_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY tablet_id, primary_key
                               ORDER BY height DESC) AS rn
  FROM changelog WHERE tablet_id IN ('click', 'view') AND height <= 700),
live AS (SELECT * FROM ranked WHERE rn = 1 AND NOT is_deletion)
SELECT c.primary_key,
       c.height AS click_height, c.value AS click_value,
       v.height AS view_height,  v.value AS view_value
FROM (SELECT * FROM live WHERE tablet_id = 'click') c
JOIN (SELECT * FROM live WHERE tablet_id = 'view') v USING (primary_key)
"""


@_q(
    "flux_index_coverage",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
ranked8 AS (
  SELECT *, row_number() OVER (PARTITION BY primary_key
                               ORDER BY height DESC) AS rn
  FROM changelog WHERE tablet_id = 'click' AND height <= 800),
live8 AS (SELECT * FROM ranked8 WHERE rn = 1 AND NOT is_deletion),
ranked5 AS (
  SELECT *, row_number() OVER (PARTITION BY primary_key
                               ORDER BY height DESC) AS rn
  FROM changelog WHERE tablet_id = 'click' AND height <= 500),
live5 AS (SELECT * FROM ranked5 WHERE rn = 1 AND NOT is_deletion)
SELECT CAST(500 AS BIGINT) AS snapshot_height,
       (SELECT CAST(count(*) AS BIGINT) FROM live8) AS live_keys,
       (SELECT CAST(count(*) FILTER (WHERE height <= 500) AS BIGINT)
        FROM live8) AS from_snapshot,
       (SELECT CAST(count(*) FILTER (WHERE height > 500) AS BIGINT)
        FROM live8) AS from_delta,
       (SELECT CAST(count(*) AS BIGINT) FROM changelog
        WHERE tablet_id = 'click' AND height > 500 AND height <= 800)
         AS delta_rows_scanned,
       (SELECT CAST(count(*) AS BIGINT) FROM live5) AS index_rows
""",
)
def flux_index_coverage(spark, sf_dir):
    """Snapshot-index COVERAGE observability: for the indexed read at
    800 over the snapshot at 500, how much of the answer the index
    actually served — live keys answered from the snapshot vs re-folded
    from the delta, the raw delta row count the read must scan, and the
    index's own size. The report that tells the adaptive scheduler
    (I3's 25K/50K/100K/200K cadence) whether its snapshots land where
    reads need them: a from_delta share creeping up means the cadence
    lags the write rate. Two LWW folds + one filter count over the
    same pruned scan; 1-row output."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    live8 = tp.state_at(log, "click", 800).localCheckpoint()
    live5_n = tp.state_at(log, "click", 500).count()
    delta_n = log.filter(
        (F.col("tablet_id") == "click")
        & (F.col("height") > 500)
        & (F.col("height") <= 800)
    ).count()
    return live8.agg(
        F.lit(500).cast("long").alias("snapshot_height"),
        F.count(F.lit(1)).cast("long").alias("live_keys"),
        F.sum(F.when(F.col("height") <= 500, 1).otherwise(0))
        .cast("long")
        .alias("from_snapshot"),
        F.sum(F.when(F.col("height") > 500, 1).otherwise(0))
        .cast("long")
        .alias("from_delta"),
        F.lit(delta_n).cast("long").alias("delta_rows_scanned"),
        F.lit(live5_n).cast("long").alias("index_rows"),
    )


@_q(
    "flux_mutation_profile",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
scoped AS (
  SELECT * FROM changelog WHERE tablet_id = 'click' AND height <= 900),
kinds AS (
  SELECT height // 100 AS band, primary_key,
         CASE WHEN is_deletion THEN 'delete'
              WHEN height = min(height) OVER (PARTITION BY primary_key)
                THEN 'insert'
              ELSE 'update' END AS kind
  FROM scoped)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_mutations,
       CAST(count(*) FILTER (WHERE kind = 'insert') AS BIGINT)
         AS n_inserts,
       CAST(count(*) FILTER (WHERE kind = 'update') AS BIGINT)
         AS n_updates,
       CAST(count(*) FILTER (WHERE kind = 'delete') AS BIGINT)
         AS n_deletes,
       CAST(count(DISTINCT primary_key) AS BIGINT) AS keys_touched
FROM kinds GROUP BY band
""",
)
def flux_mutation_profile(spark, sf_dir):
    """Ingest-ops MUTATION PROFILE per height band: the write-mix
    dashboard of a temporal store — inserts (a key's first version)
    vs updates vs tombstones plus distinct keys touched, per 100-height
    band. One per-key window min classifies every mutation, then a
    per-band conditional rollup; the reference exposes only raw
    per-block write counters (W2) — this is the classified relation an
    operator actually watches for update-storm or delete-storm
    anomalies. \\|bands\\|-row output at any scale."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    scoped = log.filter(
        (F.col("tablet_id") == "click") & (F.col("height") <= 900)
    )
    first_h = F.min("height").over(Window.partitionBy("primary_key"))
    kinds = scoped.select(
        F.expr("height div 100").alias("band"),
        "primary_key",
        F.when(F.col("is_deletion"), F.lit("delete"))
        .when(F.col("height") == first_h, F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("kind"),
    )
    cnt = lambda k: F.sum(F.when(F.col("kind") == k, 1).otherwise(0)).cast("long")  # noqa: E731
    return kinds.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_mutations"),
        cnt("insert").alias("n_inserts"),
        cnt("update").alias("n_updates"),
        cnt("delete").alias("n_deletes"),
        F.countDistinct("primary_key").cast("long").alias("keys_touched"),
    )


@_q(
    "flux_tablet_reconcile",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY tablet_id, primary_key
                               ORDER BY height DESC) AS rn
  FROM changelog WHERE tablet_id IN ('click', 'view') AND height <= 700),
live AS (SELECT * FROM ranked WHERE rn = 1 AND NOT is_deletion),
sides AS (
  SELECT primary_key,
         max(CASE WHEN tablet_id = 'click' THEN value END) AS a_val,
         max(CASE WHEN tablet_id = 'view' THEN value END) AS b_val
  FROM live GROUP BY 1)
SELECT
  CAST(count(*) FILTER (WHERE a_val IS NOT NULL AND b_val IS NULL)
       AS BIGINT) AS only_a,
  CAST(count(*) FILTER (WHERE a_val IS NULL AND b_val IS NOT NULL)
       AS BIGINT) AS only_b,
  CAST(count(*) FILTER (WHERE a_val = b_val) AS BIGINT) AS both_equal,
  CAST(count(*) FILTER (WHERE a_val IS NOT NULL AND b_val IS NOT NULL
                          AND a_val != b_val) AS BIGINT) AS both_diff,
  CAST(count(*) AS BIGINT) AS total_keys
FROM sides
""",
)
def flux_tablet_reconcile(spark, sf_dir):
    """Cross-tablet RECONCILIATION at a height — the replication /
    migration verification read: of every key live in either tablet at
    height 700, how many exist only in A, only in B, in both with equal
    values, in both with different values. Built on the same single
    conditional-max_by fold as `flux_state_join` (how='outer': one
    shuffle, no join operator) with a one-row conditional rollup on top
    — at 100 TB the whole audit is one pass over the pruned history,
    the exact check a `replicate` deployment runs after catch-up
    (store.replicate's content check is this query's store-level
    sibling)."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    sj = tp.state_join(log, ["click", "view"], 700, how="outer")
    a, b = F.col("click_value"), F.col("view_value")
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return sj.agg(
        flag(a.isNotNull() & b.isNull()).alias("only_a"),
        flag(a.isNull() & b.isNotNull()).alias("only_b"),
        flag(a == b).alias("both_equal"),
        flag(a.isNotNull() & b.isNotNull() & (a != b)).alias("both_diff"),
        F.count(F.lit(1)).cast("long").alias("total_keys"),
    )


@_q("flux_state_join", "temporal", _STATE_JOIN_SQL)
def flux_state_join(spark, sf_dir):
    """Cross-tablet state join at height 700: each key's live click AND
    view state side by side (operators/temporal.py `state_join`). The
    reference reads tablets singly (read.go:35-178) and merges
    client-side; here one conditional-max_by aggregation folds both
    tablets' latest versions in a SINGLE shuffle — no join operator in
    the plan (the oracle spells out the naive two-snapshot join it
    replaces)."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    return tp.state_join(log, ["click", "view"], 700)


@_q(
    "flux_state_series",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
scoped AS (
  SELECT * FROM changelog WHERE tablet_id = 'click' AND height <= 900
), v AS (
  SELECT *, lead(height, 1, 901) OVER (
              PARTITION BY primary_key ORDER BY height) AS next_h
  FROM scoped
), iv AS (
  SELECT *,
         100 + ((greatest(height - 100, 0) + 99) // 100) * 100 AS g_lo,
         least(next_h - 1, 900) AS g_hi
  FROM v WHERE NOT is_deletion
)
SELECT CAST(g AS BIGINT) AS as_of_height, primary_key, height, value
FROM iv, unnest(generate_series(g_lo, g_hi, 100)) AS t(g)
WHERE g_lo <= g_hi
""",
)
def flux_state_series(spark, sf_dir):
    """Snapshot time series: the tablet's full state at heights
    100..900 step 100 in ONE scan — per version, the grid interval it is
    live for ([height, next version) ∩ grid) exploded, instead of the
    reference's one ReadTabletAt per grid point (read.go:35-178) or N
    state_at shuffles of the same history. One per-key window shuffle +
    a map-side explode, at any N."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    return tp.state_series(log, "click", 100, 900, 100)


@_q(
    "flux_series_ewma",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
scoped AS (
  SELECT * FROM changelog WHERE tablet_id = 'click' AND height <= 900
), v AS (
  SELECT *, lead(height, 1, 901) OVER (
              PARTITION BY primary_key ORDER BY height) AS next_h
  FROM scoped
), iv AS (
  SELECT *,
         100 + ((greatest(height - 100, 0) + 49) // 50) * 50 AS g_lo,
         least(next_h - 1, 900) AS g_hi
  FROM v WHERE NOT is_deletion
), grid AS (
  SELECT CAST(g AS BIGINT) AS as_of_height, primary_key,
         CAST(json_extract_string(value, '$.k') AS BIGINT) AS x
  FROM iv, unnest(generate_series(g_lo, g_hi, 50)) AS t(g)
  WHERE g_lo <= g_hi
), lagged AS (
  SELECT primary_key, as_of_height, x,
         lag(x, 1) OVER w AS x1,
         lag(x, 2) OVER w AS x2,
         lag(x, 3) OVER w AS x3
  FROM grid
  WINDOW w AS (PARTITION BY primary_key ORDER BY as_of_height)
), weighted AS (
  SELECT primary_key, as_of_height, x,
         coalesce(8 * x, 0) + coalesce(4 * x1, 0) + coalesce(2 * x2, 0)
           + coalesce(1 * x3, 0) AS num,
         CASE WHEN x IS NULL THEN 0 ELSE 8 END
           + CASE WHEN x1 IS NULL THEN 0 ELSE 4 END
           + CASE WHEN x2 IS NULL THEN 0 ELSE 2 END
           + CASE WHEN x3 IS NULL THEN 0 ELSE 1 END AS den
  FROM lagged)
SELECT primary_key, as_of_height, x,
       CASE WHEN den = 0 THEN NULL
            ELSE round(num * 1.0 / den, 4) END AS ewma
FROM weighted
""",
)
def flux_series_ewma(spark, sf_dir):
    """EWMA smoothing over state histories at heights 100..900 step 50 —
    the denoised-trajectory complement to `flux_series_anomalies`,
    built on the same ONE-SCAN state_series grid. Bounded-horizon
    power-of-two weights (8,4,2,1) over the key's last 4 observed grid
    points, renormalized over the points that exist: integer numerator
    and denominator, a single rounded division, bit-identical in both
    engines (operators/temporal.series_ewma). The lag window reuses the
    grid's per-key partitioning — one shuffle serves both."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    return tp.series_ewma(log, "click", 100, 900, 50)


@_q(
    "flux_series_trend",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
scoped AS (
  SELECT * FROM changelog WHERE tablet_id = 'click' AND height <= 900
), v AS (
  SELECT *, lead(height, 1, 901) OVER (
              PARTITION BY primary_key ORDER BY height) AS next_h
  FROM scoped
), iv AS (
  SELECT *,
         100 + ((greatest(height - 100, 0) + 49) // 50) * 50 AS g_lo,
         least(next_h - 1, 900) AS g_hi
  FROM v WHERE NOT is_deletion
), grid AS (
  SELECT CAST(g AS BIGINT) AS x, primary_key,
         CAST(json_extract_string(value, '$.k') AS BIGINT) AS y
  FROM iv, unnest(generate_series(g_lo, g_hi, 50)) AS t(g)
  WHERE g_lo <= g_hi
), stats AS (
  SELECT primary_key,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM grid GROUP BY 1 HAVING count(*) >= 3)
SELECT primary_key, n,
       (n * sxy - sx * sy) AS slope_num,
       (n * sxx - sx * sx) AS slope_den,
       ((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
         AS slope_ppm,
       CASE WHEN (n * sxy - sx * sy) > 0 THEN 'rising'
            WHEN (n * sxy - sx * sy) < 0 THEN 'falling'
            ELSE 'flat' END AS trend
FROM stats
""",
)
def flux_series_trend(spark, sf_dir):
    """Per-key TREND over state histories: the least-squares slope of
    each key's value trajectory on the state_series grid, kept as an
    exact integer ratio (n·Σxy − ΣxΣy over n·Σx² − (Σx)², emitted with
    a scaled integer quotient and a sign classification) — no floats,
    no libm, bit-identical in both engines. Rising/falling/flat per key
    is the screening read before `flux_series_anomalies`' spike test.
    One grid scan + one combine-friendly per-key aggregate; output is
    one row per live key. Heights are exact integers, so the grid x
    values need no centering for exactness (the ratio is
    translation-covariant)."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    grid = tp.state_series(
        log, "click", 100, 900, 50, ordered=False
    ).select(
        F.col("as_of_height").alias("x"),
        "primary_key",
        F.get_json_object("value", "$.k").cast("long").alias("y"),
    )
    stats = (
        grid.groupBy("primary_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        )
        .filter(F.col("n") >= 3)
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return stats.select(
        "primary_key",
        "n",
        num.alias("slope_num"),
        den.alias("slope_den"),
        F.expr(
            "((n * sxy - sx * sy) * 1000000) div (n * sxx - sx * sx)"
        ).alias("slope_ppm"),
        F.when(num > 0, F.lit("rising"))
        .when(num < 0, F.lit("falling"))
        .otherwise(F.lit("flat"))
        .alias("trend"),
    )


@_q(
    "flux_series_backtest",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
scoped AS (
  SELECT * FROM changelog WHERE tablet_id = 'click' AND height <= 900
), v AS (
  SELECT *, lead(height, 1, 901) OVER (
              PARTITION BY primary_key ORDER BY height) AS next_h
  FROM scoped
), iv AS (
  SELECT *,
         100 + ((greatest(height - 100, 0) + 49) // 50) * 50 AS g_lo,
         least(next_h - 1, 900) AS g_hi
  FROM v WHERE NOT is_deletion
), grid AS (
  SELECT CAST(g AS BIGINT) AS as_of_height, primary_key,
         CAST(json_extract_string(value, '$.k') AS BIGINT) AS y
  FROM iv, unnest(generate_series(g_lo, g_hi, 50)) AS t(g)
  WHERE g_lo <= g_hi
), lagged AS (
  SELECT primary_key, y,
         lag(y, 1) OVER w AS y1,
         lag(y, 2) OVER w AS y2
  FROM grid
  WINDOW w AS (PARTITION BY primary_key ORDER BY as_of_height)
), evals AS (
  SELECT * FROM lagged
  WHERE y IS NOT NULL AND y1 IS NOT NULL AND y2 IS NOT NULL
), per_key AS (
  SELECT primary_key,
         CAST(count(*) AS BIGINT) AS n_evals,
         CAST(sum(abs(y - y1)) AS BIGINT) AS naive_abs_err,
         CAST(sum(abs(y - (2 * y1 - y2))) AS BIGINT) AS drift_abs_err
  FROM evals GROUP BY 1)
SELECT primary_key, n_evals, naive_abs_err, drift_abs_err,
       CASE WHEN naive_abs_err = 0 THEN NULL
            ELSE (drift_abs_err * 1000000) // naive_abs_err END
         AS drift_vs_naive_ppm
FROM per_key
""",
)
def flux_series_backtest(spark, sf_dir):
    """One-step-ahead FORECAST BACKTEST over state histories: at every
    grid point with two prior observations, score the two zero-parameter
    forecasters made from the previous point — naive (last value) and
    drift (last value + last step) — against the realized value, per
    key. The read that tells an operator whether trend-following beats
    last-value on THEIR data before wiring a model: drift_vs_naive_ppm
    < 1e6 means the trajectories reward extrapolation, above it they
    mean-revert and naive wins (the classic M-competition result).
    Exact integer absolute errors; the lag window rides the grid's
    per-key partitioning — one shuffle serves both, the
    `flux_series_ewma` pattern (operators/temporal.series_backtest)."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    return tp.series_backtest(log, "click", 100, 900, 50)


@_q(
    "flux_key_survival",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
scoped AS (
  SELECT * FROM changelog WHERE tablet_id = 'click' AND height <= 900),
per_key AS (
  SELECT primary_key,
         min(height) AS created_h,
         arg_max(is_deletion, height) AS dead
  FROM scoped GROUP BY 1)
SELECT created_h // 100 AS band,
       CAST(count(*) AS BIGINT) AS created,
       CAST(count(*) FILTER (WHERE NOT dead) AS BIGINT) AS live,
       (CAST(count(*) FILTER (WHERE NOT dead) AS BIGINT) * 1000000)
         // CAST(count(*) AS BIGINT) AS survival_ppm
FROM per_key GROUP BY 1
""",
)
def flux_key_survival(spark, sf_dir):
    """Key SURVIVAL curve — the churn analytic of a temporal store: of
    the keys first created in each height band, how many are still live
    at the read height (latest version not a tombstone)? One per-key
    aggregate over the scoped changelog (min height + max_by liveness —
    the LWW fold as an aggregate, no window), then a |bands|-row
    rollup with integer-ppm survival. The reference would need a full
    ReadTabletAt plus a client-side diff against creation records; here
    it is one combine-friendly groupBy at any scale."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    scoped = log.filter(
        (F.col("tablet_id") == "click") & (F.col("height") <= 900)
    )
    per_key = scoped.groupBy("primary_key").agg(
        F.min("height").alias("created_h"),
        F.expr("max_by(is_deletion, height)").alias("dead"),
    )
    live = F.sum(F.when(~F.col("dead"), 1).otherwise(0)).cast("long")
    return per_key.groupBy(
        F.expr("created_h div 100").alias("band")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("created"),
        live.alias("live"),
        F.expr(
            "(cast(sum(case when not dead then 1 else 0 end) as bigint)"
            " * 1000000) div count(1)"
        ).alias("survival_ppm"),
    )


@_q(
    "flux_state_drift",
    "temporal",
    tx.sql_divergence_chain(
        f"""{CHANGELOG_CTE},
scoped AS (
  SELECT * FROM changelog WHERE tablet_id = 'click' AND height <= 900
), v AS (
  SELECT *, lead(height, 1, 901) OVER (
              PARTITION BY primary_key ORDER BY height) AS next_h
  FROM scoped
), iv AS (
  SELECT *,
         300 + ((greatest(height - 300, 0) + 599) // 600) * 600 AS g_lo,
         least(next_h - 1, 900) AS g_hi
  FROM v WHERE NOT is_deletion
), grid AS (
  SELECT CAST(g AS BIGINT) AS as_of_height,
         CAST(json_extract_string(value, '$.k') AS BIGINT) // 10
           AS bucket
  FROM iv, unnest(generate_series(g_lo, g_hi, 600)) AS t(g)
  WHERE g_lo <= g_hi
), counts AS MATERIALIZED (
  SELECT CAST(as_of_height AS VARCHAR) AS source,
         CAST(bucket AS VARCHAR) AS term,
         CAST(count(*) AS BIGINT) AS obs
  FROM grid GROUP BY 1, 2)"""
    ),
)
def flux_state_drift(spark, sf_dir):
    """Temporal DISTRIBUTION DRIFT: did the tablet's value distribution
    shift between two points in history? The state at heights 300 and
    900 comes from ONE state_series scan (two grid points, never two
    reads), values bucket into deciles, and the per-(snapshot, bucket)
    counts run through the same exact chi-square divergence chain as
    the corpus source audit — the buckets with the largest chi-square
    contribution ARE the drift report. The ops answer to 'what changed
    in this table since yesterday' at any scale: one per-key window
    shuffle + a |snapshots| x |buckets| relation."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    grid = tp.state_series(log, "click", 300, 900, 600, ordered=False)
    counts = (
        grid.select(
            F.col("as_of_height").cast("string").alias("source"),
            F.expr(
                "cast(get_json_object(value, '$.k') as bigint) div 10"
            )
            .cast("string")
            .alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("obs"))
    )
    return tx.source_divergence_from_counts(counts)


@_q(
    "flux_series_similarity",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
scoped AS (
  SELECT * FROM changelog WHERE tablet_id = 'click' AND height <= 900
), v AS (
  SELECT *, lead(height, 1, 901) OVER (
              PARTITION BY primary_key ORDER BY height) AS next_h
  FROM scoped
), iv AS (
  SELECT *,
         100 + ((greatest(height - 100, 0) + 49) // 50) * 50 AS g_lo,
         least(next_h - 1, 900) AS g_hi
  FROM v WHERE NOT is_deletion
), grid AS (
  SELECT CAST(g AS BIGINT) AS as_of_height, primary_key,
         CAST(json_extract_string(value, '$.k') AS BIGINT) AS x
  FROM iv, unnest(generate_series(g_lo, g_hi, 50)) AS t(g)
  WHERE g_lo <= g_hi
), probe AS (
  SELECT as_of_height, x AS px FROM grid WHERE primary_key = '3'
), scored AS (
  SELECT g.primary_key, CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum((g.x - p.px) * (g.x - p.px)) AS BIGINT) AS dist
  FROM grid g JOIN probe p USING (as_of_height)
  WHERE g.primary_key != '3'
  GROUP BY 1 HAVING count(*) >= 2
), ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY dist ASC, primary_key ASC)
                 AS BIGINT) AS rank
  FROM scored)
SELECT primary_key, n_common, dist, rank FROM ranked WHERE rank <= 10
""",
)
def flux_series_similarity(spark, sf_dir):
    """Series-similarity search over state histories — the temporal
    engine meets the similarity family: which keys' value trajectories
    evolved most like key '3' of the click tablet over heights 100..900
    step 50? Built on state_series' one-scan interval construction (one
    per-key window + map-side explode), probe series broadcast, exact
    integer squared-distance over co-live grid points, TakeOrdered-size
    top-k. A read the reference cannot express (N ReadTabletAt passes +
    a client-side join per candidate)."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    return tp.series_similarity(log, "click", "3", 100, 900, 50, k=10)


@_q(
    "flux_series_anomalies",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
scoped AS (
  SELECT * FROM changelog WHERE tablet_id = 'click' AND height <= 900
), v AS (
  SELECT *, lead(height, 1, 901) OVER (
              PARTITION BY primary_key ORDER BY height) AS next_h
  FROM scoped
), iv AS (
  SELECT *,
         100 + ((greatest(height - 100, 0) + 49) // 50) * 50 AS g_lo,
         least(next_h - 1, 900) AS g_hi
  FROM v WHERE NOT is_deletion
), grid AS (
  SELECT CAST(g AS BIGINT) AS as_of_height, primary_key,
         CAST(json_extract_string(value, '$.k') AS BIGINT) AS x
  FROM iv, unnest(generate_series(g_lo, g_hi, 50)) AS t(g)
  WHERE g_lo <= g_hi
), stats AS (
  SELECT primary_key, as_of_height, x,
         CAST(count(*) OVER w AS BIGINT) AS n_points,
         CAST(sum(x) OVER w AS BIGINT) AS s,
         CAST(sum(x * x) OVER w AS BIGINT) AS ss
  FROM grid WINDOW w AS (PARTITION BY primary_key))
SELECT primary_key, as_of_height, x, n_points,
       (n_points * x - s) * (n_points * x - s) AS dev_sq_n2,
       4 * (n_points * ss - s * s) AS var_bound_n2
FROM stats
WHERE n_points >= 3
  AND (n_points * x - s) * (n_points * x - s)
      > 4 * (n_points * ss - s * s)
""",
)
def flux_series_anomalies(spark, sf_dir):
    """Temporal anomaly detection: grid points in a key's own state
    history more than 2 sigma from that key's series mean, over the
    click tablet's heights 100..900 step 50. The sigma test is the
    EQUIVALENT exact-integer inequality (n*x - sum)^2 > 4*(n*sumsq -
    sum^2) — no sqrt, no float accumulation, bit-identical flags on
    both engines (operators/temporal.series_anomalies). One scan: the
    state_series grid window and the per-key stats window share the
    same partitioning."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    return tp.series_anomalies(log, "click", 100, 900, 50)


@_q(
    "flux_time_weighted",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
scoped AS (
  SELECT * FROM changelog WHERE tablet_id = 'click' AND height <= 900
), v AS (
  SELECT *, lead(height, 1, 901) OVER (
              PARTITION BY primary_key ORDER BY height) AS next_h
  FROM scoped
), iv AS (
  SELECT primary_key,
         least(next_h - 1, 900) - greatest(height, 100) + 1 AS w,
         CAST(json_extract_string(value, '$.k') AS DOUBLE) AS x
  FROM v
  WHERE NOT is_deletion
    AND least(next_h - 1, 900) - greatest(height, 100) + 1 > 0
)
SELECT primary_key,
       CAST(sum(w) AS BIGINT) AS live_heights,
       floor(sum(w * x) / sum(w) * 10000) / 10000 AS twa
FROM iv GROUP BY primary_key
""",
)
def flux_time_weighted(spark, sf_dir):
    """Duration-weighted temporal aggregate (TWA) over heights [100, 900]:
    each version of a key weighted by how long it was live, tombstone
    gaps contributing nothing — "the average decoded metric over the
    period". Single scan: one per-key window + a combine-friendly
    grouped agg, vs walking every version client-side against the
    reference."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    metric = F.get_json_object(F.col("value"), "$.k").cast("double")
    return tp.time_weighted_avg(log, "click", 100, 900, metric)


@_q("flux_state_at_ignore_range", "temporal", _dedup_sql("click", 800))
def flux_state_at_ignore_range(spark, sf_dir):
    """I7 — indexed read with a corrupt-height ignore range (reference
    indexing.go:304-327, fluxdb.go:179-182): two snapshots exist (400 and
    600); the read at 800 declares [500, 700] corrupt, so the 600 snapshot
    is skipped and the read recurses to the 400 snapshot + a wider delta
    fold. The oracle is the plain window answer — the fallback must be
    invisible in the result."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    # the two-snapshot index union is broadcast-sized at any SF (live keys
    # of one tablet); no persist — a cached relation here leaked across
    # bench/parity repeat runs and the eager count skewed timings
    idx = sn.build_tablet_index(log, "click", 400).unionByName(
        sn.build_tablet_index(log, "click", 600)
    )
    return sn.state_at_with_index(
        log, idx, "click", 800, ignore_range=(500, 700)
    ).select(*_STATE_COLS)


@_q(
    "flux_state_diff",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
s1 AS (
  SELECT primary_key, value, height FROM (
    SELECT *, row_number() OVER (PARTITION BY primary_key ORDER BY height DESC) rn
    FROM changelog WHERE tablet_id = 'click' AND height <= 600)
  WHERE rn = 1 AND NOT is_deletion),
s2 AS (
  SELECT primary_key, value, height FROM (
    SELECT *, row_number() OVER (PARTITION BY primary_key ORDER BY height DESC) rn
    FROM changelog WHERE tablet_id = 'click' AND height <= 800)
  WHERE rn = 1 AND NOT is_deletion)
SELECT coalesce(s1.primary_key, s2.primary_key) AS primary_key,
       CASE WHEN s1.height IS NULL THEN 'added'
            WHEN s2.height IS NULL THEN 'deleted'
            ELSE 'updated' END AS change,
       s1.value AS old_value, s2.value AS new_value,
       s1.height AS old_height, s2.height AS new_height
FROM s1 FULL OUTER JOIN s2 ON s1.primary_key = s2.primary_key
WHERE s1.height IS NULL OR s2.height IS NULL OR s1.height != s2.height
""",
)
def flux_state_diff(spark, sf_dir):
    """Beyond-reference temporal diff: keys added/updated/deleted between
    two snapshot heights (full-outer join of two R1 reads)."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    return tp.state_diff(log, "click", 600, 800)


_SPEC_ROWS = [
    # (primary_key, value, is_deletion) at heights H-2, H-1, H
    ("42", '{"spec": 1}', False),
    ("7", '{"spec": 2}', False),
    ("3", "", True),  # tombstone: key 3 must vanish from the snapshot
]
_SPEC_H = 10_000_000  # far above any durable height at every scale factor


@_q(
    "flux_state_at_speculative",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
spec AS (
  SELECT * FROM (VALUES
    ('evt', 'click', {_SPEC_H - 2}, '42', '{{"spec": 1}}', FALSE, 'spec0', {_SPEC_H - 2}),
    ('evt', 'click', {_SPEC_H - 1}, '7',  '{{"spec": 2}}', FALSE, 'spec1', {_SPEC_H - 1}),
    ('evt', 'click', {_SPEC_H},     '3',  '',              TRUE,  'spec2', {_SPEC_H})
  ) AS t(collection, tablet_id, height, primary_key, value, is_deletion,
         block_id, block_num)),
merged AS (SELECT * FROM changelog UNION ALL SELECT * FROM spec),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY primary_key ORDER BY height DESC) AS rn
  FROM merged WHERE tablet_id = 'click' AND height <= {_SPEC_H})
SELECT tablet_id, primary_key, height, value, block_num
FROM ranked WHERE rn = 1 AND NOT is_deletion
""",
)
def flux_state_at_speculative(spark, sf_dir):
    """R1 with the fork-aware speculative overlay (reference ReadTabletAt
    step 4, read.go:155-169): not-yet-final writes — here a deterministic
    3-row head segment carrying an upsert of a new key, an update of an
    existing key, and a tombstone — union into the change-log BEFORE the
    last-write-wins window, so the overlay needs no special-case logic at
    all; higher speculative heights win and tombstones delete. The oracle
    replays the identical union in SQL."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    spec = spark.createDataFrame(
        [
            (
                "evt",
                "click",
                _SPEC_H - 2 + i,
                pk,
                val,
                is_del,
                f"spec{i}",
                _SPEC_H - 2 + i,
            )
            for i, (pk, val, is_del) in enumerate(_SPEC_ROWS)
        ],
        schema=log.schema,
    )
    merged = log.unionByName(spec)
    return tp.state_at(merged, "click", _SPEC_H).select(*_STATE_COLS)


@_q(
    "flux_row_at",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
ranked AS (
  SELECT *, row_number() OVER (ORDER BY height DESC) AS rn
  FROM changelog
  WHERE tablet_id = 'view' AND primary_key = '3' AND height <= 900)
SELECT tablet_id, primary_key, height, value, block_num
FROM ranked WHERE rn = 1 AND NOT is_deletion
""",
)
def flux_row_at(spark, sf_dir):
    """R2 — single-row point read (reference ReadTabletRowAt)."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    return tp.row_at(log, "view", 900, "3").select(*_STATE_COLS)


@_q(
    "flux_singlet_asof",
    "temporal",
    f"""
WITH {SINGLET_CTE},
ranked AS (
  SELECT *, row_number() OVER (ORDER BY height DESC) AS rn
  FROM changelog WHERE tablet_id = 'user#3' AND height <= 850)
SELECT tablet_id, height, value FROM ranked WHERE rn = 1 AND NOT is_deletion
""",
)
def flux_singlet_asof(spark, sf_dir):
    """R3 — latest-<=-height singlet read (reference ReadSingletEntryAt)."""
    log = singlet_log_from_events(_t(spark, sf_dir, "events"))
    return tp.singlet_at(log, "user#3", 850).select(
        "tablet_id", "height", "value"
    )


@_q(
    "flux_singlet_history",
    "temporal",
    f"""
WITH {SINGLET_CTE}
SELECT height, value, is_deletion FROM changelog WHERE tablet_id = 'user#5'
""",
)
def flux_singlet_history(spark, sf_dir):
    """R4 — full version history (reference ReadSingletEntries)."""
    log = singlet_log_from_events(_t(spark, sf_dir, "events"))
    return tp.singlet_history(log, "user#5").select(
        "height", "value", "is_deletion"
    )


@_q(
    "flux_has_rows",
    "temporal",
    f"""
WITH {CHANGELOG_CTE}
SELECT (count(*) > 0) AS has_rows FROM changelog WHERE tablet_id = 'purchase'
""",
)
def flux_has_rows(spark, sf_dir):
    """R5 — existence probe, as a 1-row relation for the oracle check."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    exists = tp.has_rows(log, "purchase")
    return spark.createDataFrame([(exists,)], "has_rows boolean")


@_q(
    "flux_checkpoint",
    "temporal",
    f"""
WITH {CHANGELOG_CTE}
SELECT max(height) AS height, arg_max(block_id, height) AS block_id,
       max(block_num) AS block_num
FROM changelog
""",
)
def flux_checkpoint(spark, sf_dir):
    """R6 — last written (height, block) marker."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    return tp.latest_checkpoint(log)


@_q(
    "flux_tablet_index",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY primary_key ORDER BY height DESC) AS rn
  FROM changelog WHERE tablet_id = 'click' AND height <= 500)
SELECT primary_key, height FROM ranked WHERE rn = 1 AND NOT is_deletion
""",
)
def flux_tablet_index(spark, sf_dir):
    """I1/I2 — snapshot index build: the live pk -> height map at height 500."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    return sn.build_tablet_index(log, "click", 500).select(
        "primary_key", "height"
    )


_ENTITY_SQL = "concat(collection, chr(31), tablet_id)"


@_q(
    "flux_shard_assignment",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
singlet_log AS (
  SELECT 'sgl' AS collection,
         concat('user#', CAST(user_id AS VARCHAR)) AS tablet_id
  FROM events),
entities AS (
  SELECT DISTINCT collection, tablet_id FROM changelog
  UNION
  SELECT DISTINCT collection, tablet_id FROM singlet_log)
SELECT collection, tablet_id,
       ({hash60_sql(_ENTITY_SQL)} % 8) AS shard
FROM entities
""",
)
def flux_shard_assignment(spark, sf_dir):
    """P1 — deterministic entity -> shard map (reference goesToShard)."""
    ev = _t(spark, sf_dir, "events")
    log = changelog_from_events(ev)
    slog = singlet_log_from_events(ev)
    entities = (
        log.select("collection", "tablet_id")
        .union(slog.select("collection", "tablet_id"))
        .distinct()
    )
    return sh.assign_shards(entities, 8).select(
        "collection", "tablet_id", "shard"
    )


@_q(
    "flux_shard_progress",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
sharded AS (
  SELECT *, ({hash60_sql(_ENTITY_SQL)} % 4) AS shard FROM changelog)
SELECT shard, max(height) AS height, arg_max(block_id, height) AS block_id,
       count(*) AS row_count
FROM sharded GROUP BY shard
""",
)
def flux_shard_progress(spark, sf_dir):
    """W4 — per-shard checkpoint stats (reference VerifyAllShardsWritten)."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    return sh.shard_progress(sh.assign_shards(log, 4))


@_q(
    "flux_gap_check",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
heights AS (SELECT DISTINCT tablet_id, height FROM changelog),
seq AS (
  SELECT tablet_id, height,
         lag(height) OVER (PARTITION BY tablet_id ORDER BY height) AS prev_height
  FROM heights)
SELECT tablet_id, prev_height, height, (height - prev_height - 1) AS missing
FROM seq WHERE prev_height IS NOT NULL AND height > prev_height + 1
""",
)
def flux_gap_check(spark, sf_dir):
    """P4 — hole detection over per-tablet height sequences."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    return sh.detect_holes(log, ["tablet_id"])


@_q(
    "flux_tablet_stats",
    "temporal",
    f"""
WITH {CHANGELOG_CTE}
SELECT tablet_id, count(*) AS n_rows,
       count(DISTINCT primary_key) AS n_keys,
       max(height) AS max_height,
       CAST(sum(CASE WHEN is_deletion THEN 1 ELSE 0 END) AS BIGINT) AS n_tombstones
FROM changelog GROUP BY tablet_id
""",
)
def flux_tablet_stats(spark, sf_dir):
    """W2 — per-tablet write statistics (reference size-stats logging)."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    return log.groupBy("tablet_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("primary_key").alias("n_keys"),
        F.max("height").alias("max_height"),
        F.sum(F.when(F.col("is_deletion"), 1).otherwise(0))
        .cast("long")
        .alias("n_tombstones"),
    )


@_q(
    "typed_view_decode",
    "temporal",
    f"""
WITH {CHANGELOG_CTE}
SELECT tablet_id, height,
       CAST(json_extract_string(value, '$.k') AS BIGINT) AS k
FROM changelog WHERE tablet_id = 'signup' AND height <= 300
""",
)
def typed_view_decode(spark, sf_dir):
    """Typed-view layer: a registered collection decoder turns the opaque
    `value` into typed columns (registry.typed_view; the point where this
    engine exceeds the reference, which never looks inside values)."""
    from pyspark.sql import types as T

    from fluxdb_spark.registry import Collection, default_registry

    reg = default_registry()
    reg.register(
        Collection(
            0x0001,
            "evt",
            decoder=lambda v: F.from_json(
                v, T.StructType([T.StructField("k", T.LongType())])
            ),
        )
    )
    log = changelog_from_events(_t(spark, sf_dir, "events")).filter(
        (F.col("tablet_id") == "signup") & (F.col("height") <= 300)
    )
    return reg.typed_view(log, "evt").select(
        "tablet_id", "height", F.col("decoded.k").alias("k")
    )


@_q(
    "typed_view_protobuf",
    "temporal",
    f"""
WITH {CHANGELOG_CTE}
SELECT tablet_id, height,
       CAST(json_extract_string(value, '$.k') AS BIGINT) AS k,
       tablet_id AS src,
       CAST(json_extract_string(value, '$.k') AS BIGINT) - height AS delta,
       (height * 2654435761) % 4294967296 AS crc
FROM changelog
WHERE tablet_id = 'signup' AND height <= 300 AND NOT is_deletion
  AND json_extract_string(value, '$.k') IS NOT NULL
""",
)
def typed_view_protobuf(spark, sf_dir):
    """Typed view over PROTOBUF-encoded values — the reference's actual
    value encoding (types.go:44-50). Values are serialized to proto3 wire
    bytes (varint / zigzag / length-delimited / fixed32) and decoded back
    through the registry's tiered protobuf decoder: JVM `from_protobuf`
    when the spark-protobuf jar is loaded, else an Arrow-batched wire
    parser (functions/protowire.py — encoder and decoder are independent
    implementations pinned to spec byte vectors, so the oracle computing
    the fields directly from JSON is a real inversion check: a varint or
    zigzag bug would hash-mismatch on multi-byte / negative values)."""
    from fluxdb_spark.functions import protowire as pw
    from fluxdb_spark.registry import Collection, default_registry

    log = changelog_from_events(_t(spark, sf_dir, "events")).filter(
        (F.col("tablet_id") == "signup")
        & (F.col("height") <= 300)
        & (~F.col("is_deletion"))
    )
    k = F.get_json_object("value", "$.k").cast("long")
    wire = log.filter(k.isNotNull()).withColumn(
        "value",
        pw.encode_demo_udf()(
            k,
            F.col("tablet_id"),
            k - F.col("height"),
            (F.col("height") * F.lit(2654435761)) % F.lit(4294967296),
        ),
    )
    reg = default_registry()
    reg.register(
        Collection(
            0x0002,
            "evt",
            decoder=lambda v: pw.decode_protobuf_col(spark, v),
        )
    )
    return reg.typed_view(wire, "evt").select(
        "tablet_id",
        "height",
        F.col("decoded.k").alias("k"),
        F.col("decoded.src").alias("src"),
        F.col("decoded.delta").alias("delta"),
        F.col("decoded.crc").alias("crc"),
    )


@_q(
    "typed_view_protobuf_nested",
    "temporal",
    f"""
WITH {CHANGELOG_CTE}
SELECT tablet_id, height,
       CAST(json_extract_string(value, '$.k') AS BIGINT) AS k,
       CAST(2 AS BIGINT) AS n_deltas,
       (CAST(json_extract_string(value, '$.k') AS BIGINT) - height)
         + (3 - height % 7) AS sum_deltas,
       concat(tablet_id, ',', 'x2') AS tag_keys,
       height + CAST(json_extract_string(value, '$.k') AS BIGINT)
         AS sum_tag_n
FROM changelog
WHERE tablet_id = 'signup' AND height <= 300 AND NOT is_deletion
  AND json_extract_string(value, '$.k') IS NOT NULL
""",
)
def typed_view_protobuf_nested(spark, sf_dir):
    """Typed protobuf view, NESTED/REPEATED tier: values carry a packed
    repeated sint64 field and repeated submessages (proto3's composite
    shapes, beyond `typed_view_protobuf`'s scalars). Encoded to wire
    bytes (packed zigzag varints, length-delimited submessages) and
    decoded back by the independent Arrow wire parser — which also
    accepts the expanded unpacked form, as the spec requires of proto3
    parsers — then flattened with JVM higher-order functions. The oracle
    computes every field directly from JSON, so a packed-encoding or
    submessage-framing bug hash-mismatches."""
    from fluxdb_spark.functions import protowire as pw

    log = changelog_from_events(_t(spark, sf_dir, "events")).filter(
        (F.col("tablet_id") == "signup")
        & (F.col("height") <= 300)
        & (~F.col("is_deletion"))
    )
    k = F.get_json_object("value", "$.k").cast("long")
    wire = log.filter(k.isNotNull()).select(
        "tablet_id",
        "height",
        pw.encode_event_udf()(
            k,
            F.array(k - F.col("height"), F.lit(3) - F.col("height") % 7),
            F.array(
                F.struct(
                    F.col("tablet_id").alias("key"),
                    F.col("height").alias("n"),
                ),
                F.struct(F.lit("x2").alias("key"), k.alias("n")),
            ),
        ).alias("wire"),
    )
    dec = wire.withColumn("v", pw.decode_event_udf()(F.col("wire")))
    return dec.select(
        "tablet_id",
        "height",
        F.col("v.k").alias("k"),
        F.size("v.deltas").cast("long").alias("n_deltas"),
        F.aggregate(
            "v.deltas", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("sum_deltas"),
        F.concat_ws(",", F.transform("v.tags", lambda t: t["key"])).alias(
            "tag_keys"
        ),
        F.aggregate(
            F.transform("v.tags", lambda t: t["n"]),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sum_tag_n"),
    )


@_q(
    "flux_state_fingerprint",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY tablet_id, primary_key
                               ORDER BY height DESC) AS rn
  FROM changelog WHERE height <= 700),
live AS (
  SELECT tablet_id,
         {hash60_sql("concat(primary_key, '|', coalesce(value, ''))")} AS h
  FROM ranked WHERE rn = 1 AND NOT is_deletion),
per_tablet AS (
  SELECT tablet_id, CAST(count(*) AS BIGINT) AS n_live,
         CAST(bit_xor(h) AS BIGINT) AS fingerprint
  FROM live GROUP BY tablet_id)
SELECT tablet_id, n_live, fingerprint FROM per_tablet
UNION ALL
SELECT '__all__', CAST(sum(n_live) AS BIGINT),
       CAST(bit_xor(fingerprint) AS BIGINT)
FROM per_tablet
""",
)
def flux_state_fingerprint(spark, sf_dir):
    """Order-invariant STATE fingerprint at a height — replica
    verification in O(1) exchange: two replicas (or a replica and its
    reprocessed rebuild) each fingerprint their own `state_at(H)` with
    one local scan and compare |tablets|+1 longs, instead of shipping
    both states through `flux_tablet_reconcile`'s full outer join; only
    on a mismatch does the row-level reconcile run, scoped to the
    tablets whose fingerprints differ (the Merkle-tree argument,
    flattened to one level). Same XOR-fold algebra as
    `corpus_fingerprint` — commutative, map-side combinable, collection
    level merged from tablet level with no rescan — applied to the LWW
    state relation (pk|value of live rows at the height)."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    live = tp.collection_state_at(log, 700).select(
        "tablet_id",
        hash60(
            F.concat(
                F.col("primary_key"),
                F.lit("|"),
                F.coalesce(F.col("value"), F.lit("")),
            )
        ).alias("h"),
    )
    per_tablet = live.groupBy("tablet_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_live"),
        F.bit_xor("h").cast("long").alias("fingerprint"),
    )
    allrow = per_tablet.agg(
        F.lit("__all__").alias("tablet_id"),
        F.sum("n_live").cast("long").alias("n_live"),
        F.bit_xor("fingerprint").cast("long").alias("fingerprint"),
    ).select("tablet_id", "n_live", "fingerprint")
    return per_tablet.unionByName(allrow)


# Engine-common integer ratios for the write-path audits, in the
# overflow-proof double-floor form (version counts at 100 TB pass the
# ~9e12 int64 `* 1000000` ceiling long before the corpus does).  The
# hot-key share/oracle/finisher live in _shared — the streaming twin
# (stream_key_skew) drains into the same finisher.
_WRITE_AMP_X100 = (
    "CAST(floor(CAST(n_versions AS DOUBLE) * 100"
    " / CAST(n_keys AS DOUBLE)) AS BIGINT)"
)
_LIVE_PPM = (
    "CAST(floor(CAST(n_live AS DOUBLE) * 1000000"
    " / CAST(n_keys AS DOUBLE)) AS BIGINT)"
)


@_q("flux_key_skew", "temporal", _KEY_SKEW_SQL)
def flux_key_skew(spark, sf_dir):
    """Write-path hot-key audit: per tablet, the top-5 keys by version
    count with their share of the tablet's writes — the WRITE-side
    twin of `ivf_balance_audit`'s read-side cell skew. At 100 TB the
    hash partitioner (P1, sharding.py) is only as good as the key
    distribution under it: a key owning a large share_ppm of a
    tablet's mutations is a shard hotspot the scatter step can't fix
    (same shard every time), so this table is what decides salting /
    key-splitting BEFORE a backfill, not after it stalls. Scale shape:
    per-(tablet,key) counts fold map-side; both windows (partition
    total + rank) share ONE hash partition by tablet_id, and the
    rank<=5 filter compiles to WindowGroupLimit — the full key relation
    is never sorted globally or collected."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    per = log.groupBy("tablet_id", "primary_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_versions")
    )
    return _key_skew_finish(per)


@_q(
    "flux_write_amplification",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
latest AS (
  SELECT tablet_id, primary_key, is_deletion,
         row_number() OVER (PARTITION BY tablet_id, primary_key
                            ORDER BY height DESC) AS rn
  FROM changelog),
heads AS (SELECT * FROM latest WHERE rn = 1),
per AS (
  SELECT c.tablet_id,
         CAST(count(*) AS BIGINT) AS n_versions,
         CAST(count(DISTINCT c.primary_key) AS BIGINT) AS n_keys
  FROM changelog c GROUP BY 1),
live AS (
  SELECT tablet_id,
         CAST(count(*) FILTER (WHERE NOT is_deletion) AS BIGINT) AS n_live
  FROM heads GROUP BY 1)
SELECT per.tablet_id, n_versions, n_keys, live.n_live,
       {_WRITE_AMP_X100} AS write_amp_x100,
       {_LIVE_PPM} AS live_ppm
FROM per JOIN live ON per.tablet_id = live.tablet_id
""",
)
def flux_write_amplification(spark, sf_dir):
    """Storage write-amplification audit: per tablet, total versions
    written vs distinct keys (write_amp_x100 = mean versions per key,
    x100 integer) and the live fraction of keys after tombstones —
    the two numbers that price the snapshot/index cadence (I3): a
    tablet writing 40 versions per live key is exactly where the
    25K-height index threshold pays for itself, and a low live_ppm
    says compaction reclaims more than indexing accelerates. The
    reference logs raw per-block counters (W2); this classifies them
    into the ratio an operator actually budgets against. Scale shape:
    one per-(tablet,key) head window (same partitioning the state_at
    read path already uses) plus two map-side-combined rollups joined
    on the |tablets|-row relation."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    rn = Window.partitionBy("tablet_id", "primary_key").orderBy(
        F.desc("height")
    )
    heads = log.withColumn("rn", F.row_number().over(rn)).filter(
        F.col("rn") == 1
    )
    per = log.groupBy("tablet_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_versions"),
        F.countDistinct("primary_key").cast("long").alias("n_keys"),
    )
    live = heads.groupBy("tablet_id").agg(
        F.sum(F.when(~F.col("is_deletion"), 1).otherwise(0))
        .cast("long")
        .alias("n_live")
    )
    return (
        per.join(live, "tablet_id")
        .select(
            "tablet_id",
            "n_versions",
            "n_keys",
            "n_live",
            F.expr(_WRITE_AMP_X100).alias("write_amp_x100"),
            F.expr(_LIVE_PPM).alias("live_ppm"),
        )
    )


@_q(
    "flux_version_gap_histogram",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
g AS (
  SELECT tablet_id,
         height - lag(height) OVER (PARTITION BY tablet_id, primary_key
                                    ORDER BY height) AS gap
  FROM changelog),
f AS (SELECT tablet_id, CAST(gap AS BIGINT) AS gap FROM g
      WHERE gap IS NOT NULL)
SELECT tablet_id, {_log2_bucket_sql('gap')} AS bucket,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap) AS BIGINT) AS min_gap,
       CAST(max(gap) AS BIGINT) AS max_gap
FROM f GROUP BY 1, 2
""",
)
def flux_version_gap_histogram(spark, sf_dir):
    """Write-CADENCE audit: per tablet, the log2 histogram of height
    gaps between consecutive versions of the same key.  The adaptive
    index cadence (I3, indexing_test.go:79-218 thresholds) and the
    snapshot-prune horizon both assume a typical re-write interval;
    this table is the measured distribution that assumption has to
    survive.  A heavy LOW tail (gap ~ 1: keys rewritten every block)
    means snapshots churn dead versions and the tablet wants
    write-buffer coalescing; a heavy HIGH tail (gaps >> cadence) means
    indexes carry long-idle keys and the prune horizon (I6) is what
    bounds state.  Heights are globally unique (the W1 monotonic
    guard), so lag over (tablet, key) is deterministic.  Scale shape:
    the per-key window rides the SAME (tablet, key) hash partitioning
    every read-path operator already shuffles by — one sort within
    partitions, no second shuffle; the 62-compare ladder + rollup fold
    map-side to <= 63 rows per tablet."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    w = Window.partitionBy("tablet_id", "primary_key").orderBy("height")
    g = log.select(
        "tablet_id",
        (F.col("height") - F.lag("height").over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    return (
        g.select(
            "tablet_id",
            F.expr(_log2_bucket_sql("gap")).alias("bucket"),
            "gap",
        )
        .groupBy("tablet_id", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.min("gap").cast("long").alias("min_gap"),
            F.max("gap").cast("long").alias("max_gap"),
        )
    )


@_q(
    "flux_tombstone_audit",
    "temporal",
    f"""
WITH {CHANGELOG_CTE},
o AS (
  SELECT tablet_id, primary_key, is_deletion,
         row_number() OVER (PARTITION BY tablet_id, primary_key
                            ORDER BY height) AS rn,
         row_number() OVER (PARTITION BY tablet_id, primary_key
                            ORDER BY height DESC) AS rrn,
         lag(is_deletion) OVER (PARTITION BY tablet_id, primary_key
                                ORDER BY height) AS prev_del
  FROM changelog),
per AS (
  SELECT tablet_id, primary_key,
         CAST(max(CASE WHEN rn = 1 AND is_deletion THEN 1 ELSE 0 END)
              AS BIGINT) AS orphan,
         CAST(max(CASE WHEN rrn = 1 AND is_deletion THEN 1 ELSE 0 END)
              AS BIGINT) AS dead,
         CAST(sum(CASE WHEN prev_del AND NOT is_deletion THEN 1 ELSE 0
              END) AS BIGINT) AS resurrections
  FROM o GROUP BY 1, 2)
SELECT tablet_id,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(orphan) AS BIGINT) AS orphan_keys,
       CAST(sum(CASE WHEN resurrections > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS resurrected_keys,
       CAST(sum(dead) AS BIGINT) AS dead_keys,
       CAST(sum(resurrections) AS BIGINT) AS n_resurrections
FROM per GROUP BY 1
""",
)
def flux_tombstone_audit(spark, sf_dir):
    """Tombstone-hygiene audit: per tablet, the delete-lifecycle
    classification of every key — ORPHAN deletes (first event is a
    deletion: the upstream ordering breach the W1 monotonic guard
    exists to reject), RESURRECTED keys (any delete -> insert
    transition: these defeat last-writer-wins tombstone GC, so the
    prune horizon (I6) must outlast the longest resurrection cycle, not
    just the newest snapshot), DEAD keys (last event is a deletion: the
    standing tombstones a snapshot retains), and the total resurrection
    count.  The table that prices tombstone retention BEFORE a prune is
    scheduled.  Scale shape: all three windows (first / last / lag)
    ride ONE (tablet, key) hash partition — the same partitioning every
    read-path operator shuffles by — and the two rollups fold map-side
    to |keys| then |tablets| rows."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    asc = Window.partitionBy("tablet_id", "primary_key").orderBy("height")
    desc = Window.partitionBy("tablet_id", "primary_key").orderBy(
        F.desc("height")
    )
    o = log.select(
        "tablet_id",
        "primary_key",
        "is_deletion",
        F.row_number().over(asc).alias("rn"),
        F.row_number().over(desc).alias("rrn"),
        F.lag("is_deletion").over(asc).alias("prev_del"),
    )
    per = o.groupBy("tablet_id", "primary_key").agg(
        F.max(
            F.when((F.col("rn") == 1) & F.col("is_deletion"), 1).otherwise(0)
        )
        .cast("long")
        .alias("orphan"),
        F.max(
            F.when((F.col("rrn") == 1) & F.col("is_deletion"), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("dead"),
        F.sum(
            F.when(F.col("prev_del") & ~F.col("is_deletion"), 1).otherwise(0)
        )
        .cast("long")
        .alias("resurrections"),
    )
    return per.groupBy("tablet_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("orphan").cast("long").alias("orphan_keys"),
        F.sum(F.when(F.col("resurrections") > 0, 1).otherwise(0))
        .cast("long")
        .alias("resurrected_keys"),
        F.sum("dead").cast("long").alias("dead_keys"),
        F.sum("resurrections").cast("long").alias("n_resurrections"),
    )


@_q("flux_snapshot_cadence_sweep", "temporal", _CADENCE_SQL)
def flux_snapshot_cadence_sweep(spark, sf_dir):
    """Snapshot-CADENCE pricing sweep: for every candidate index cadence
    (the I3 decision, indexing.go's threshold ladder re-expressed as a
    priced table), per tablet — index rows WRITTEN across all snapshots
    (cumulative distinct keys per snapshot, in closed form), rows READ
    at the chain head through that index (last-snapshot keys + delta),
    and the raw index-less scan, with the savings/overhead ratios an
    operator actually budgets against.  `flux_write_amplification` says
    whether to index; this says at WHICH cadence: the cadence whose
    read_savings_ppm has flattened while index_write_x100 keeps
    climbing is the knee.  Scale shape: ONE pass builds per-(tablet,
    key, 128-height-bucket) counters (map-side combine); every cadence
    is a multiple of the bucket width so the bucket arithmetic is exact
    (no rounding at snapshot boundaries); the per-key membership count
    is the closed form `ks - k_min + 1` — no per-snapshot explode, no
    window, nothing downstream of the profile touches the changelog."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    return _cadence_finish(_cadence_profile(log))


# Retention-policy sweep constants (round 14): candidate keep-last-N
# policies priced from one pass, the cadence-sweep discipline applied
# to version GC.
_RETENTION_NS = (1, 2, 4)

_RECLAIM_PPM = (
    "CASE WHEN n_rows = 0 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(floor(CAST(reclaimed_rows AS DOUBLE) * 1000000"
    " / CAST(n_rows AS DOUBLE)) AS BIGINT) END"
)


def _retention_sql() -> str:
    """Oracle derived from the SAME _RETENTION_NS constants the Spark
    plan aggregates over."""
    aggs = ", ".join(
        f"CAST(sum(greatest(nv - {n}, 0)) AS BIGINT) AS rec{n}"
        for n in _RETENTION_NS
    )
    arms = ", ".join(
        f"{{'keep_n': CAST({n} AS BIGINT), 'reclaimed_rows': rec{n}}}"
        for n in _RETENTION_NS
    )
    return f"""
WITH {CHANGELOG_CTE},
pk AS (
  SELECT tablet_id, primary_key, CAST(count(*) AS BIGINT) AS nv
  FROM changelog GROUP BY 1, 2),
pt AS (
  SELECT tablet_id,
         CAST(sum(nv) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         {aggs}
  FROM pk GROUP BY 1),
st AS (
  SELECT tablet_id, n_rows, n_keys,
         unnest([{arms}], recursive := true)
  FROM pt)
SELECT tablet_id, keep_n, n_rows, n_keys, reclaimed_rows,
       n_rows - reclaimed_rows AS survivor_rows,
       {_RECLAIM_PPM} AS reclaim_ppm
FROM st
"""


@_q("flux_retention_sweep", "temporal", _retention_sql())
def flux_retention_sweep(spark, sf_dir):
    """Version-RETENTION pricing sweep: the cadence-sweep discipline
    applied to GC — for every candidate keep-last-N-versions policy,
    per tablet, the rows a retention pass would reclaim vs keep
    (reclaimed = sum over keys of max(nv - N, 0); exact, since
    retention truncates each key's history independently).  Where
    `flux_write_amplification` says how redundant the log IS and
    `flux_tombstone_audit` says which keys are safely prunable, this
    prices what each POLICY would actually recover — the number a
    storage budget negotiates against before scheduling the I6 prune.
    Scale shape: ONE per-(tablet, key) count (map-side combine — the
    same relation every write-path audit folds), one |keys|-row
    rollup; policies are conditional sums and the 3-row explode
    happens on the |tablets|-row relation."""
    log = changelog_from_events(_t(spark, sf_dir, "events"))
    pk = log.groupBy("tablet_id", "primary_key").agg(
        F.count(F.lit(1)).cast("long").alias("nv")
    )
    pt = pk.groupBy("tablet_id").agg(
        F.sum("nv").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        *[
            F.sum(F.greatest(F.col("nv") - n, F.lit(0)))
            .cast("long")
            .alias(f"rec{n}")
            for n in _RETENTION_NS
        ],
    )
    stacked = pt.select(
        "tablet_id",
        "n_rows",
        "n_keys",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).cast("long").alias("keep_n"),
                        F.col(f"rec{n}").alias("reclaimed_rows"),
                    )
                    for n in _RETENTION_NS
                ]
            )
        ).alias("s"),
    )
    return stacked.select(
        "tablet_id",
        "s.keep_n",
        "n_rows",
        "n_keys",
        F.col("s.reclaimed_rows").alias("reclaimed_rows"),
        (F.col("n_rows") - F.col("s.reclaimed_rows")).alias(
            "survivor_rows"
        ),
        F.expr(_RECLAIM_PPM).alias("reclaim_ppm"),
    )
