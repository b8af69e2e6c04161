"""Catalog entries: Structured Streaming — the ingest path run as a
stream, plus the drained batch/streaming twin audits."""

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

import os
import uuid
from contextlib import contextmanager

from fluxdb_spark.catalog._core import _q, _t, _td
from fluxdb_spark.catalog._shared import (
    _BENFORD_PPM,
    _CADENCE_SQL,
    _DECONTAM_SQL,
    _FINGERPRINT_SQL,
    _IVF_BALANCE_SQL,
    _KEY_SKEW_SQL,
    _RFM_SQL,
    _SEASONALITY_SQL,
    _SHINGLE_DF_SQL,
    _SEASON_DOW,
    _SEASON_HOUR,
    _SESSIONIZE_SQL,
    _SPECTRUM_SQL,
    _fingerprint_all_row,
    _fingerprint_per_source,
    _gcent,
    _ivf_balance_finish,
    _kcents8,
    _key_skew_finish,
    _rfm_per_user,
    _rfm_rollup,
    _seasonality_finish,
    _shingle_df_finish,
    _spectrum_finish,
    _cadence_finish,
    _cadence_profile,
    _WINNOW_SQL,
    _winnow_finish,
    _winnow_profile,
)


# =========================================================================
# Drain plumbing.  Streaming stateful plans run under IncrementalExecution,
# which DISABLES AQE — so the post-shuffle / state-store partition count is
# whatever spark.sql.shuffle.partitions says, a number sized for the batch
# workload (one per core locally, thousands on a cluster), not for a drain
# whose standing state is sketch- or vocabulary-bounded.  Each surplus
# state partition costs a store instance, a per-commit delta file and a
# task per micro-batch: a trivial drain measured 3.3-4.6 s at 32 state
# partitions vs 1.6 s at 8 on this machine (batch equivalent 1.3 s).
# `_drain_shuffle` re-derives the count from the micro-batch input bytes —
# exactly the sizing AQE's coalescer would pick for a batch shuffle
# (target bytes per partition, floor 2) — capped at the session default so
# a cluster-tuned setting still rules at scale.  Env-tunable, not a local
# constant: FLUX_STREAM_SHUFFLE_TARGET_BYTES.
# =========================================================================

_DRAIN_TARGET_BYTES = int(
    os.environ.get("FLUX_STREAM_SHUFFLE_TARGET_BYTES", str(32 * 1024 * 1024))
)


@contextmanager
def _drain_shuffle(spark, sf_dir, *files):
    """Scope a drain to an input-derived state/shuffle partition count
    (the manual analogue of AQE coalescing, which streaming cannot use).
    The streaming query pins the count at .start(), so only the
    start/awaitTermination window needs to run inside this scope; batch
    model-building and serving-side finishers stay on the session
    default (where AQE does the sizing)."""
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f)) for f in files
    )
    n = max(2, min(default, -(-n_bytes // _DRAIN_TARGET_BYTES)))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(default))


def _drain(spark, sf_dir, df, files, mode="complete", prefix="drain"):
    """availableNow drain of `df` into a memory sink under
    `_drain_shuffle` sizing; returns the drained table."""
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    with _drain_shuffle(spark, sf_dir, *files):
        q = (
            df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def _sspread(raw):
    """Streaming analogue of `session.spread()`: fan the micro-batch
    across the cores BEFORE CPU-heavy per-row work.  A single small
    parquet file scans as one task (one row group — lowering
    maxPartitionBytes cannot split it), which serializes
    expression-heavy per-row operators onto one core; the explicit
    repartition costs one exchange of the RAW input rows — bytes
    bounded per micro-batch by the source's maxFilesPerTrigger — and
    buys a cores-wide map stage.  On a cluster whose micro-batches
    already arrive in many splits the exchange is balanced-cost noise
    next to the per-row work it parallelizes; apply it only where that
    work dominates (the `spread()` contract)."""
    return raw.repartition(raw.sparkSession.sparkContext.defaultParallelism)


@_q("stream_rfm", "streaming", _RFM_SQL)
def stream_rfm(spark, sf_dir):
    """STREAMING RFM: the per-user (recency, frequency, monetary)
    profile maintained by Structured Streaming — all three aggregates
    are algebraic (max / count / sum of exact integers), so the
    micro-batch merge IS the profile update and state is one row per
    user forever: the standing profile-store shape, vs re-scanning the
    event history per report. Quintile scoring + segment rollup run
    serving-side on the standing table, exactly as `rfm_segments`
    computes them on a batch scan — and the streaming-maintained result
    hash-matches the same SQL twin."""
    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    per_user = _rfm_per_user(normalize_event_ts(raw))
    return _rfm_rollup(
        _drain(
            spark, sf_dir, per_user, ["events.parquet"], prefix="stream_rfm"
        )
    )


@_q("stream_decontaminate", "streaming", _DECONTAM_SQL)
def stream_decontaminate(spark, sf_dir):
    """STANDING benchmark decontamination — the deployment shape of
    `decontaminate` at ingest time: the eval pool's 8-gram shingle set
    is frozen batch-side (eval sets are static by definition — the
    stream_lm_score frozen-model precedent), then the document stream
    explodes to its distinct shingles and stream-static-joins the
    broadcast pool; the standing per-doc hit counter is the aggregation
    state. A contaminated doc is flagged the moment it ARRIVES instead
    of at the next epoch-boundary batch sweep — at 100 TB, the
    difference between quarantining a leak before and after it enters a
    training mix. State is bounded by the FLAGGED docs only (the join
    drops clean docs before the fold), and the shingle arrays are
    already distinct per doc, so a plain count after the one-row-per-
    pool-shingle join equals the batch count(DISTINCT) — the drained
    table hash-matches the batch relation (same oracle constant)."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    d = _t(spark, sf_dir, "documents")
    # frozen eval pool: built batch-side ONCE, broadcast into every
    # micro-batch
    pool = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select(
            F.explode(
                dd.word_shingles(F.col("text"), 8)
            ).alias("shingle")
        )
        .distinct()
        .localCheckpoint()
    )
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    hits = (
        _sspread(raw.filter(F.col("doc_id") % 10 != 0))
        .select(
            "doc_id",
            F.explode(
                dd.word_shingles(F.col("text"), 8)
            ).alias("shingle"),
        )
        .join(F.broadcast(pool), "shingle")  # stream-static equi-join
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return _drain(
        spark, sf_dir, hits, ["documents.parquet"], prefix="stream_decontam"
    )


@_q("stream_source_divergence", "streaming", tx.sql_source_divergence())
def stream_source_divergence(spark, sf_dir):
    """STREAMING outlier-source audit: the (source, term) count table
    maintained by Structured Streaming — counts are additive, so the
    micro-batch merge IS the table update and state is bounded by
    |sources| * |vocab| rows (vocabulary-bounded, never corpus-bounded;
    Zipf growth), the profile-store shape of stream_rfm. The chi-square
    divergence rollup runs serving-side on the standing counts exactly
    as `source_divergence` computes it from a batch scan, and the
    streamed result hash-matches the same SQL twin."""
    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/documents.parquet").schema
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    counts = (
        _sspread(raw)
        .select(
            F.col("source"),
            F.explode(tx.tokens(F.lower(F.col("text")))).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("obs"))
    )
    return tx.source_divergence_from_counts(
        _drain(
            spark,
            sf_dir,
            counts,
            ["documents.parquet"],
            prefix="stream_srcdiv",
        )
    )


@_q("stream_collocations", "streaming", tx.sql_collocations())
def stream_collocations(spark, sf_dir):
    """STREAMING collocation mining: the bigram and unigram count tables
    maintained by Structured Streaming — counts are additive, so the
    micro-batch merge IS the table update and state is bounded by the
    Zipf-bounded bigram/unigram vocabularies, never the stream. The
    integer-lift finisher runs serving-side on the standing counts
    exactly as the batch `collocations` computes them from a scan, and
    the streamed result hash-matches the same SQL twin."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema

    def _stream():
        return _sspread(
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )

    tag = uuid.uuid4().hex[:8]
    bg_name, uni_name = f"stream_bgc_{tag}", f"stream_uni_{tag}"
    qs = []
    bgc = (
        tx.bigram_count_stream(_stream())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    uni = (
        tx.unigram_count_stream(_stream())
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    with _drain_shuffle(spark, sf_dir, "documents.parquet"):
        for df, name in ((bgc, bg_name), (uni, uni_name)):
            qs.append(
                df.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
        for q in qs:
            q.awaitTermination()
    return tx.collocations_from_counts(
        spark.table(bg_name), spark.table(uni_name)
    )


@_q(
    "stream_join_size",
    "streaming",
    tx.sql_cms_join_size("events", "orders", "user_id", "o_custkey"),
)
def stream_join_size(spark, sf_dir):
    """STREAMING join-size statistics: both CMS key sketches maintained
    by Structured Streaming — counter tables are additive, so the
    micro-batch merge IS the sketch merge and state is 2 x depth x width
    rows FOREVER, the live planner-statistics feed (re-estimate a join's
    size as streams grow without touching either input again). The
    inner-product finisher runs serving-side on the standing counters;
    the exact twin is computed batch-side for the parity check only.
    Hash-matches the same oracle as `join_size_estimate`."""
    from fluxdb_spark.functions.text import _cms_bucket, CMS_DEPTH

    width = 4096
    tag = uuid.uuid4().hex[:8]
    names = {}
    queries = []
    # start BOTH maintenance streams before awaiting either: the two
    # sketch lifecycles overlap instead of paying setup twice in series
    with _drain_shuffle(spark, sf_dir, "events.parquet", "orders.parquet"):
        for table, key in (("events", "user_id"), ("orders", "o_custkey")):
            schema = spark.read.parquet(f"{sf_dir}/{table}.parquet").schema
            raw = (
                spark.readStream.schema(schema)
                .option("pathGlobFilter", f"{table}.parquet")
                .parquet(sf_dir)
            )
            sk = (
                _sspread(raw.select(F.col(key).cast("string").alias("term")))
                .select(
                    F.explode(
                        F.array(*[F.lit(r) for r in range(CMS_DEPTH)])
                    ).alias("r"),
                    "term",
                )
                .select(
                    "r",
                    _cms_bucket(F.col("term"), F.col("r"), width).alias(
                        "bucket"
                    ),
                )
                .groupBy("r", "bucket")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            name = f"stream_cms_{table}_{tag}"
            queries.append(
                sk.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            names[table] = name
        for q in queries:
            q.awaitTermination()
    est = (
        spark.table(names["events"])
        .withColumnRenamed("cnt", "ca")
        .join(
            spark.table(names["orders"]).withColumnRenamed("cnt", "cb"),
            ["r", "bucket"],
        )
        .groupBy("r")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("prod"))
        .agg(F.min("prod").cast("long").alias("n_rows"))
        .select(F.lit("cms_estimate").alias("method"), "n_rows")
    )
    ca = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    cb = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    exact = (
        ca.join(cb, "k")
        .agg(
            F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0))
            .cast("long")
            .alias("n_rows")
        )
        .select(F.lit("exact").alias("method"), "n_rows")
    )
    return exact.unionByName(est)


@_q(
    "stream_benford",
    "streaming",
    f"""
WITH cents AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
  WHERE o_totalprice > 0),
digits AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM cents),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM digits),
obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS cnt
        FROM digits GROUP BY 1),
expected(digit, benford_ppm) AS (VALUES {", ".join(f"({d + 1}, {p})" for d, p in enumerate(_BENFORD_PPM))})
SELECT e.digit, coalesce(o.cnt, 0) AS cnt,
       (coalesce(o.cnt, 0) * 1000000) // n AS share_ppm,
       e.benford_ppm,
       abs((coalesce(o.cnt, 0) * 1000000) // n - e.benford_ppm)
         AS dev_ppm
FROM expected e LEFT JOIN obs o USING (digit), n
""",
)
def stream_benford(spark, sf_dir):
    """STREAMING Benford audit: the 9-counter digit table maintained by
    Structured Streaming — counts are additive (micro-batch merge IS the
    table update) and state is NINE rows forever, the cheapest standing
    audit in the engine; the expectation join and ppm math run
    serving-side on the standing counters and hash-match the batch
    twin's oracle. The shape a payments pipeline runs continuously."""
    schema = spark.read.parquet(f"{sf_dir}/orders.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "orders.parquet")
        .parquet(sf_dir)
    )
    digits = raw.filter(F.col("o_totalprice") > 0).select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    table = _drain(
        spark, sf_dir, obs, ["orders.parquet"], prefix="stream_benford"
    )
    n = table.agg(F.sum("cnt").cast("long").alias("n"))
    expected = spark.createDataFrame(
        [(d + 1, p) for d, p in enumerate(_BENFORD_PPM)],
        "digit long, benford_ppm long",
    )
    return (
        expected.join(table, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
            F.expr("(coalesce(cnt, 0) * 1000000) div n").alias("share_ppm"),
            "benford_ppm",
            F.abs(
                F.expr("(coalesce(cnt, 0) * 1000000) div n")
                - F.col("benford_ppm")
            ).alias("dev_ppm"),
        )
    )


@_q(
    "stream_data_expectations",
    "streaming",
    """
SELECT 'lineitem.l_quantity.in_range' AS rule,
       CAST(count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
            AS BIGINT) AS violations,
       CAST(count(*) AS BIGINT) AS checked
FROM lineitem
UNION ALL
SELECT 'lineitem.l_orderkey.not_null',
       CAST(count(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT),
       CAST(count(*) AS BIGINT)
FROM lineitem
""",
)
def stream_data_expectations(spark, sf_dir):
    """STREAMING data-quality expectations — the ADDITIVE subset of
    `data_expectations` (range bounds, not-null: per-row predicates
    whose violation counts merge by sum, so the micro-batch merge IS
    the audit update and state is one row per rule forever). The
    relational rules (key uniqueness, referential integrity) stay
    batch by design: their truth depends on cross-batch joins, the
    honest boundary every streaming audit has. Counters hash-match the
    batch twin's oracle rows for the same rules."""
    schema = spark.read.parquet(f"{sf_dir}/lineitem.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "lineitem.parquet")
        .parquet(sf_dir)
    )
    counters = raw.select(
        F.when(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
        )
        .otherwise(0)
        .alias("range_v"),
        F.when(F.col("l_orderkey").isNull(), 1).otherwise(0).alias(
            "null_v"
        ),
    ).agg(
        F.sum("range_v").cast("long").alias("range_violations"),
        F.sum("null_v").cast("long").alias("null_violations"),
        F.count(F.lit(1)).cast("long").alias("checked"),
    )
    return _drain(
        spark, sf_dir, counters, ["lineitem.parquet"], prefix="stream_expect"
    ).selectExpr(
        "stack(2, "
        "'lineitem.l_quantity.in_range', range_violations, checked, "
        "'lineitem.l_orderkey.not_null', null_violations, checked) "
        "as (rule, violations, checked)"
    )


@_q("stream_kmv_overlap", "streaming", tx.sql_kmv_set_overlap())
def stream_kmv_overlap(spark, sf_dir):
    """STREAMING KMV: the distinct-set-algebra sketch maintained as
    per-group GroupState (`stateful.kmv_stream`) — state is the sketch
    itself, k longs + a seen-counter per event type FOREVER, because a
    value cut from the k smallest can never re-enter (the trim is
    lossless), vs unbounded exact-distinct streaming state. Hashing is
    JVM-side in the prepared projection; the pandas fold merges sorted
    integer arrays. Drained sketches feed the same pair/union/estimate
    stage as the batch form and hash-match the same SQL twin — the
    fourth streaming sketch beside stream_cms / stream_hll /
    stream_simhash."""
    from fluxdb_spark.streaming.stateful import kmv_stream

    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    out = kmv_stream(_sspread(raw))
    # update-mode sink holds one row per group per micro-batch; the
    # seen-counter is monotone, so max-ver is each group's final sketch.
    t = _drain(
        spark,
        sf_dir,
        out,
        ["events.parquet"],
        mode="update",
        prefix="stream_kmv",
    )
    w = Window.partitionBy("g").orderBy(F.desc("ver"))
    sk = (
        t.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("g", F.posexplode("hs").alias("pos", "h"))
        .select("g", "h", (F.col("pos") + 1).alias("rn"))
    )
    return tx.kmv_overlap_from_sketches(
        sk, _t(spark, sf_dir, "events"), "event_type", "user_id"
    )


# =========================================================================
# 4. Structured Streaming (the ingest path run as a stream)
# =========================================================================


@_q(
    "stream_tumbling",
    "streaming",
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
""",
)
def stream_tumbling(spark, sf_dir):
    """The tumbling-hourly aggregate computed through Structured Streaming
    (file source -> availableNow trigger -> memory sink), oracle-checked
    against the batch SQL answer."""
    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = normalize_event_ts(raw)
    agg = ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return _drain(
        spark, sf_dir, agg, ["events.parquet"], prefix="stream_tumbling"
    )


@_q("stream_hll_distinct", "streaming", tx.sql_hll_distinct_grouped())
def stream_hll_distinct(spark, sf_dir):
    """STREAMING HyperLogLog: distinct users per event type with the
    register table maintained by Structured Streaming — the standing
    form of a sketch is exactly what streams are for (per micro-batch
    the register maxes merge associatively, so state is |groups| x 256
    rows forever, vs unbounded exact-distinct state). The stream
    maintains registers (groupBy(type, register).max(rho), a streaming-
    legal max agg); the serving-side estimate then reads the register
    table — the same split a production sketch pipeline uses. Register
    construction and the libm-free estimator are shared with the batch
    `hll_distinct`, and the whole thing — streaming registers included —
    hash-matches the batch SQL twin beside the exact distinct counts."""
    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    reg, rho = tx.hll_register_cols(F.col("user_id").cast("string"))
    agg = (
        _sspread(raw)
        .select(
            F.col("event_type"),
            reg.alias("register"),
            rho.alias("rho"),
        )
        .groupBy("event_type", "register")
        .agg(F.max("rho").alias("max_rho"))
    )
    est = tx.hll_estimate(
        _drain(
            spark, sf_dir, agg, ["events.parquet"], prefix="stream_hll"
        ),
        ["event_type"],
    )
    exact = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct(F.col("user_id").cast("string"))
            .cast("long")
            .alias("exact_distinct")
        )
    )
    return est.join(exact, "event_type")


@_q("stream_hll_rollup", "streaming", tx.sql_hll_rollup())
def stream_hll_rollup(spark, sf_dir):
    """STREAMING hierarchical distinct counts: the per-source HLL
    register table maintained by Structured Streaming (state is
    |sources| x 256 rows FOREVER — the bounded-state property that
    makes sketches the streaming answer to distinct counting), with the
    corpus-level `__all__` estimate merged serving-side from the
    standing per-source sketches by element-wise max. The register
    construction, merge, and libm-free estimator are all shared with
    the batch `hll_rollup` — and the streaming-maintained result
    hash-matches the same SQL twin."""
    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/documents.parquet").schema
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    base = _sspread(raw).select(
        F.col("source").alias("level"),
        F.explode(tx.tokens(F.lower(F.col("text")))).alias("term"),
    )
    reg, rho = tx.hll_register_cols(F.col("term"))
    agg = (
        base.select("level", reg.alias("register"), rho.alias("rho"))
        .groupBy("level", "register")
        .agg(F.max("rho").alias("max_rho"))
    )
    return tx.hll_rollup_from_registers(
        _drain(
            spark,
            sf_dir,
            agg,
            ["documents.parquet"],
            prefix="stream_hll_rollup",
        )
    )


@_q("stream_cms_heavy_hitters", "streaming", tx.sql_cms_heavy_hitters())
def stream_cms_heavy_hitters(spark, sf_dir):
    """STREAMING count-min sketch: the depth x width counter table
    maintained by Structured Streaming over the document stream — the
    counters are plain sums, so the per-micro-batch merge is the sketch
    merge (element-wise add) and state is depth*width rows FOREVER,
    regardless of vocabulary size; the companion stream_hll_distinct
    maintains max-merged registers the same way. The serving side then
    point-queries the standing counter table (min over hash rows) for
    the exact top-20 terms — identical output to the batch
    `cms_heavy_hitters`, whose SQL twin is the oracle, proving the
    streamed sketch is byte-equivalent to the batch-built one."""
    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/documents.parquet").schema
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    base = _sspread(raw).select(
        F.explode(tx.tokens(F.lower(F.col("text")))).alias("term")
    )
    keyed = base.select(
        F.explode(
            F.array(*[F.lit(r) for r in range(tx.CMS_DEPTH)])
        ).alias("r"),
        "term",
    ).select(
        "r",
        tx._cms_bucket(F.col("term"), F.col("r"), tx.CMS_WIDTH).alias(
            "bucket"
        ),
    )
    agg = keyed.groupBy("r", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    return tx.cms_heavy_hitters(
        _td(spark, sf_dir),
        k=20,
        sketch=_drain(
            spark, sf_dir, agg, ["documents.parquet"], prefix="stream_cms"
        ),
    )


@_q(
    "stream_dedup",
    "streaming",
    """
SELECT event_id, event_type FROM events
""",
)
def stream_dedup(spark, sf_dir):
    """Streaming exact dedup: the event stream unioned with ITSELF (so
    every event genuinely arrives twice) flows through a watermarked
    `dropDuplicates` on event_id; the memory sink must hold each event
    exactly once — the batch relation is the oracle. The watermark bounds
    the dedup state in a continuous deployment (keys older than the
    horizon are evicted), which is what makes exact stream dedup viable at
    100 TB/day; in this availableNow run the single batch sees all data,
    so the result is exactly DISTINCT."""
    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = normalize_event_ts(raw)
    doubled = ev.unionByName(ev)
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .select("event_id", "event_type")
    )
    return _drain(
        spark,
        sf_dir,
        deduped,
        ["events.parquet"],
        mode="append",
        prefix="stream_dedup",
    )


@_q(
    "stream_simhash_dedup",
    "streaming",
    f"SELECT DISTINCT simhash FROM ({dd.sql_simhash()})",
)
def stream_simhash_dedup(spark, sf_dir):
    """Streaming NEAR-dup dedup: documents flow through a map-only SimHash
    projection (`simhash_col` — no aggregation, so the fingerprint rides
    the stream statelessly) into `dropDuplicatesWithinWatermark` keyed on
    the fingerprint. Docs whose 32-bit SimHash collides exactly are
    near-identical token multisets; the watermark bounds the dedup state
    for a continuous deployment. The memory sink must hold each distinct
    fingerprint once — the oracle is DISTINCT over the batch SimHash
    relation (independently derived via the 32-sum form)."""
    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/documents.parquet").schema
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    fp = _sspread(raw).select(
        dd.simhash_col(F.col("text")).alias("simhash")
    ).select(
        "simhash",
        # deterministic PER-ROW event time derived from the data
        # (documents carry none): a day past the epoch (a row AT the
        # initial watermark would be discarded as late before any state
        # exists) plus simhash mod the watermark delay. Duplicates share
        # a fingerprint, hence a timestamp — so however the file source
        # batches the corpus, a duplicate is either deduped in state or
        # dropped as late, never re-emitted; and because the spread never
        # exceeds the delay, no FIRST occurrence can be late. The oracle
        # stays exactly DISTINCT while the watermark genuinely advances
        # with the data (state eviction across micro-batches is exercised
        # in tests/test_watermark.py with a wider time spread).
        F.timestamp_micros(
            (F.lit(86400) + F.pmod(F.col("simhash"), F.lit(3600)))
            * F.lit(1_000_000)
        ).alias("ts"),
    )
    deduped = (
        fp.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["simhash"])
        .select("simhash")
    )
    return _drain(
        spark,
        sf_dir,
        deduped,
        ["documents.parquet"],
        mode="append",
        prefix="stream_simhash_dedup",
    )


@_q(
    "stream_stream_join",
    "streaming",
    """
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       round(p.value, 2) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
""",
)
def stream_stream_join(spark, sf_dir):
    """Stream-stream inner join with event-time bounds: purchases within one
    hour of a click by the same user, both sides `readStream` with
    watermarks (file source -> availableNow -> append memory sink). The
    time-range condition is what lets Spark bound the join state — without
    it a stream-stream join buffers forever. Oracle is the equivalent batch
    SQL join."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def stream_side(event_type):
        raw = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return normalize_event_ts(raw).filter(
            F.col("event_type") == event_type
        )

    clicks = (
        stream_side("click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        stream_side("purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        F.round("p_value", 2).alias("purchase_value"),
    )
    return _drain(
        spark,
        sf_dir,
        joined,
        ["events.parquet"],
        mode="append",
        prefix="stream_join",
    )


@_q(
    "stream_sessionize",
    "streaming",
    _SESSIONIZE_SQL,
)
def stream_sessionize(spark, sf_dir):
    """Sessionization as a CUSTOM STATEFUL streaming operator: per-user
    GroupState via `applyInPandasWithState` (file source -> availableNow ->
    memory sink), oracle-checked against the same SQL as the batch
    `sessionization` query. This is the §2.6 'stateful ops' surface the
    built-in windowed aggregates can't express."""
    from fluxdb_spark.streaming.stateful import sessionize_stream

    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = normalize_event_ts(raw)
    out = sessionize_stream(ev)
    # update-mode sink may hold one row per user per micro-batch; keep the
    # last (cumulative) row per user.
    t = _drain(
        spark,
        sf_dir,
        out,
        ["events.parquet"],
        mode="update",
        prefix="stream_sessionize",
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_sessions"))
    return (
        t.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@_q(
    "stream_wor_sample",
    "streaming",
    cu.sql_wor_sample_grouped(10),
)
def stream_wor_sample(spark, sf_dir):
    """STREAMING weighted reservoir (ES 2006 A-Res): per-source
    exactly-10 WOR samples maintained as GroupState — state is EXACTLY
    the sample (10 priority/id/weight triples + a seen-counter per
    source, FOREVER), because a row cut from the top-k can never
    re-enter: its priority is fixed at ingest, the same lossless-trim
    argument as the streaming KMV sketch. Priorities are JVM-side in
    the prepared projection; the pandas fold sorts integers. The
    drained reservoirs hash-match the batch per-source top-k under the
    same key — the sampling twin of stream_kmv_overlap."""
    from fluxdb_spark.streaming.stateful import wor_stream

    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/documents.parquet").schema
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    # same k as the sql_wor_sample_grouped twin
    out = wor_stream(_sspread(raw), k=10)
    # update-mode sink holds one row per group per micro-batch; the
    # seen-counter is monotone, so max-ver is each group's final state.
    t = _drain(
        spark,
        sf_dir,
        out,
        ["documents.parquet"],
        mode="update",
        prefix="stream_wor",
    )
    w = Window.partitionBy("g").orderBy(F.desc("ver"))
    return (
        t.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("g").alias("source"),
            F.explode(F.arrays_zip("pris", "ids", "ws")).alias("z"),
        )
        .select(
            "source",
            F.col("z.ids").alias("doc_id"),
            F.col("z.ws").alias("weight"),
            F.col("z.pris").alias("pri_e9"),
        )
    )


@_q("stream_token_spectrum", "streaming", _SPECTRUM_SQL)
def stream_token_spectrum(spark, sf_dir):
    """STANDING type-frequency spectrum: the vocabulary counters
    maintained as Structured Streaming state (additive counts, the
    stream_benford/stream_seasonality shape; state is the vocabulary —
    Zipf-bounded, the same sublinear growth `vocab_growth` measures),
    bucketed and finished serving-side by the SAME ladder and
    coverage finisher the batch scan uses. The tokenizer-sizing
    dashboard stays current as the corpus ingests instead of re-scanning
    it per decision; drained counters finish to a table that
    hash-matches the batch entry (shared oracle constant)."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    c = (
        _sspread(raw)
        .select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return _spectrum_finish(
        _drain(
            spark,
            sf_dir,
            c,
            ["documents.parquet"],
            prefix="stream_spectrum",
        )
    )


@_q("stream_ivf_balance", "streaming", _IVF_BALANCE_SQL)
def stream_ivf_balance(spark, sf_dir):
    """STANDING IVF balance audit: the coarse quantizer's centroids are
    trained batch-side ONCE and frozen as plan literals (the codebook-
    sidecar precedent — `assign_to_centroids(corpus, cents)` provably
    reproduces `kmeans_clusters` on the training corpus), then the
    vector stream assigns map-side and the k occupancy counters live as
    additive streaming state. The index-health dashboard the ANN
    service watches BETWEEN retrains: when a cell's standing lift
    drifts past the latency budget, retraining is a decision made from
    k counters, not a corpus re-scan. Drained counters finish through
    the batch audit's shared finisher and hash-match its oracle."""
    cents = _kcents8(spark, sf_dir)  # frozen, batch-side, memoized
    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )
    cells = (
        sim.assign_to_centroids(raw, cents)
        .groupBy(F.col("cluster").cast("long").alias("cell"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    )
    return _ivf_balance_finish(
        _drain(
            spark, sf_dir, cells, ["embeddings.parquet"], prefix="stream_ivf"
        ),
        k=8,
    )


@_q("stream_seasonality", "streaming", _SEASONALITY_SQL)
def stream_seasonality(spark, sf_dir):
    """STANDING seasonality profile: the <= 168 dow x hour counters
    maintained as Structured Streaming state (counts are additive, so
    the micro-batch merge IS the table update — the stream_benford
    shape), with margins and the independence lift computed
    serving-side from the drained cells by the SAME finisher the batch
    scan uses. The capacity dashboard this feeds never re-scans
    history: at 100 TB of events the profile is already current when
    the on-call looks. Drained cells finish to a table that
    hash-matches the batch entry (shared oracle constant); the integer
    pmod calendar math is the shared expression too, so no engine (or
    stream/batch) dow() convention can disagree."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = normalize_event_ts(raw)
    cells = (
        ev.select(
            F.expr(_SEASON_DOW).alias("dow"),
            F.expr(_SEASON_HOUR).alias("hour"),
        )
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return _seasonality_finish(
        _drain(
            spark, sf_dir, cells, ["events.parquet"], prefix="stream_season"
        )
    )


@_q(
    "stream_embed_outliers",
    "streaming",
    sim.sql_embedding_outliers_grouped(10),
)
def stream_embed_outliers(spark, sf_dir):
    """STREAMING per-class anomaly watchlist: the 10 farthest-from-
    centroid vectors per label, maintained as GroupState — the standing
    form of `embed_outliers` an ingest pipeline keeps current so the
    odd rows are ALREADY identified when a curation pass starts. The
    centroid is frozen batch-side into plan literals (the PQ-codebook /
    k-means-sidecar precedent: scoring models do not drift with the
    stream), distances are exact integers computed JVM-side in the
    prepared projection, and the state fold is LITERALLY the weighted
    reservoir's (`stateful.wor_stream`'s top-k-by-fixed-priority trim,
    priority = distance): a vector cut from the watchlist can never
    re-enter, so the trim is lossless and the drained state hash-matches
    the batch per-label top-k."""
    from fluxdb_spark.streaming.stateful import topk_stream

    gcent = _gcent(spark, sf_dir)
    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )
    qvec = F.expr(
        "transform(embedding, "
        "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
    )
    dist = F.aggregate(
        F.zip_with(qvec, F.lit(gcent), lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    prepared = _sspread(raw).select(
        F.col("label").cast("string").alias("g"),
        F.col("vec_id").alias("id"),
        dist.alias("w"),
    ).withColumn("pri", F.col("w"))
    out = topk_stream(prepared, k=10)  # same k as the SQL twin's rn <= 10
    t = _drain(
        spark,
        sf_dir,
        out,
        ["embeddings.parquet"],
        mode="update",
        prefix="stream_outliers",
    )
    w = Window.partitionBy("g").orderBy(F.desc("ver"))
    return (
        t.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("g").cast("long").alias("label"),
            F.explode(F.arrays_zip("pris", "ids")).alias("z"),
        )
        .select(
            "label",
            F.col("z.ids").alias("vec_id"),
            F.col("z.pris").alias("dist_sq"),
        )
    )


@_q("stream_lm_score", "streaming", tx.SQL_BIGRAM_LM)
def stream_lm_score(spark, sf_dir):
    """STREAMING fluency scoring against a FROZEN model — the engine's
    stream-STATIC join demonstration, and CCNet's actual deployment
    shape: the LM is trained once batch-side and frozen (KenLM's role),
    then the document stream explodes to bigrams, joins the static
    model relation (Spark broadcasts the static side into each
    micro-batch — no stream-stream state, no watermark needed for the
    join), and folds per-doc sums/counts as standing aggregation state.
    The drained score table IS the batch `lm_score` relation — same
    oracle, hash-identical. At 100 TB the standing table is the
    pipeline's scores column, maintained as documents arrive instead of
    recomputed per epoch."""
    from fluxdb_spark.functions.text import bigram_structs, floor4

    d = _td(spark, sf_dir)
    # frozen model: built batch-side ONCE, the static side of the join
    bg_static = d.select(
        "doc_id", F.explode(bigram_structs(F.col("text"))).alias("bg")
    ).select(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    model = (
        bg_static.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .withColumn(
            "logp",
            F.ln(
                F.col("c12")
                / F.sum("c12").over(Window.partitionBy("w1"))
            ),
        )
        .localCheckpoint()
    )
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    bg_stream = _sspread(raw).select(
        "doc_id", F.explode(bigram_structs(F.col("text"))).alias("bg")
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    scored = (
        bg_stream.join(model, ["w1", "w2"])  # stream-static equi-join
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            floor4(F.avg("logp")).alias("avg_logp"),
        )
    )
    return _drain(
        spark, sf_dir, scored, ["documents.parquet"], prefix="stream_lm"
    )


@_q(
    "stream_corpus_fingerprint",
    "streaming",
    _FINGERPRINT_SQL,
)
def stream_corpus_fingerprint(spark, sf_dir):
    """STREAMING dataset fingerprint: the same-data check maintained as
    documents ARRIVE — XOR is algebraic, so the standing state is one
    (count, fingerprint) pair per source forever and the micro-batch
    merge IS the update; the collection row folds serving-side on the
    drained |sources|-row table. The version check is then always
    current instead of a pre-run scan (the `stream_benford` shape
    applied to data versioning); drained state hash-matches the batch
    `corpus_fingerprint` relation, same oracle."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    per_source = _fingerprint_per_source(raw)
    t = _drain(
        spark, sf_dir, per_source, ["documents.parquet"], prefix="stream_fp"
    )
    return t.unionByName(_fingerprint_all_row(t))


@_q("stream_key_skew", "streaming", _KEY_SKEW_SQL)
def stream_key_skew(spark, sf_dir):
    """STANDING hot-key audit: the per-(tablet, key) version counters of
    `flux_key_skew` maintained as Structured Streaming state (counts
    are additive — the micro-batch merge IS the update), so the shard-
    hotspot forecast is already current when a backfill is planned
    instead of a history re-scan. State is EXACT per-key counters —
    deliberately the same cardinality the batch groupBy shuffles
    (|tablet, key| longs); for cardinality-hostile keyspaces the
    sketch-bounded alternative is `stream_cms_heavy_hitters`, and this
    entry is the exact verifier you run where state fits. Drained
    counters finish serving-side through the SAME top-5/share finisher
    the batch audit uses and hash-match its oracle constant — the
    structural form of the twin claim."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    per = (
        changelog_from_events(_sspread(raw))
        .groupBy("tablet_id", "primary_key")
        .agg(F.count(F.lit(1)).cast("long").alias("n_versions"))
    )
    return _key_skew_finish(
        _drain(
            spark, sf_dir, per, ["events.parquet"], prefix="stream_keyskew"
        )
    )


@_q("stream_shingle_df", "streaming", _SHINGLE_DF_SQL)
def stream_shingle_df(spark, sf_dir):
    """STANDING shingle-df spectrum: the per-shingle document-frequency
    counters of `dedup_shingle_df_spectrum` maintained as Structured
    Streaming state (counts are additive — the micro-batch merge IS the
    update), so the dedup join-cost forecast is already current when a
    dedup job is planned instead of a corpus re-scan.  State is the
    distinct-shingle vocabulary — exactly the global df table PPJoin's
    prefix ordering needs anyway, so the standing counters double as
    that model's refresh path (the `stream_token_spectrum` shape, one
    n-gram order up).  Drained counters finish serving-side through the
    SAME ladder/pricing finisher the batch audit uses and hash-match its
    oracle constant — the structural form of the twin claim."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    df = (
        _sspread(raw)
        .select(
            F.explode(dd.word_shingles(F.col("text"))).alias("shingle")
        )
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    return _shingle_df_finish(
        _drain(
            spark,
            sf_dir,
            df,
            ["documents.parquet"],
            prefix="stream_shingledf",
        )
    )


@_q("stream_pq_distortion", "streaming", sim.sql_pq_distortion())
def stream_pq_distortion(spark, sf_dir):
    """STANDING PQ quantization-loss audit: the codebooks are trained
    batch-side and frozen as plan literals, then the vector stream
    assigns map-side and the
    per-(subspace, codeword) error partials (n / sum / max — all
    additive) live as streaming state: the CODE-health dashboard an ANN
    service watches BETWEEN retrains, next to the cell-balance one.  A
    drifting corpus shows up as rising standing error or dying
    codewords long before recall does.  Drained partials finish
    serving-side through the SAME rollup finisher the batch audit uses
    and hash-match its oracle — the structural form of the twin
    claim."""
    # train the codebooks unconditionally, batch-side, inside the timed
    # entry (the bpe_train rule: the declared audit's oracle includes
    # the trainer CTEs, so the entry pays the Lloyd loop per run)
    books = sim.pq_codebooks(
        _t(spark, sf_dir, "embeddings"), m=4, ks=8, iters=2
    )
    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )
    cells = sim.pq_cell_partials(_sspread(raw), books)
    return sim.pq_distortion_finish(
        _drain(
            spark,
            sf_dir,
            cells,
            ["embeddings.parquet"],
            prefix="stream_pqdist",
        )
    )


@_q("stream_snapshot_cadence", "streaming", _CADENCE_SQL)
def stream_snapshot_cadence(spark, sf_dir):
    """STANDING snapshot-cadence advisor: the per-(tablet, key,
    128-height-bucket) write counters of `flux_snapshot_cadence_sweep`
    maintained as Structured Streaming state (count and max are
    additive/mergeable — the micro-batch merge IS the update), so the
    cadence pricing table is already current when the indexer (I3)
    re-evaluates a tablet's threshold instead of a history re-scan.
    State is bounded by |tablet x key x height/128|, a 128x reduction
    over per-version state.  Drained counters finish serving-side
    through the SAME closed-form finisher the batch sweep uses and
    hash-match its oracle constant — the structural form of the twin
    claim."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    per = _cadence_profile(changelog_from_events(_sspread(raw)))
    return _cadence_finish(
        _drain(
            spark, sf_dir, per, ["events.parquet"], prefix="stream_cadence"
        )
    )


@_q("stream_winnow", "streaming", _WINNOW_SQL)
def stream_winnow(spark, sf_dir):
    """STANDING winnowed-fingerprint postings: the (doc, fingerprint)
    relation of `dedup_winnow` maintained as Structured Streaming state
    (fingerprints are distinct per doc by construction, so the
    micro-batch merge is idempotent counting), the copy-detection
    firewall a training-data intake runs as documents ARRIVE — the
    adaptive df cap re-evaluates against the standing corpus size at
    every drain, so boilerplate that only becomes common over time is
    retro-dropped.  Winnowing itself is per-doc map-side array work on
    the stream.  Standing state is ONE row per doc (the sorted distinct
    fingerprint set — per-doc sets merge by union, and fingerprints are
    distinct per doc by construction), not one row per (doc, fp): the
    posting-level key shape measured 110x more state-store entries for
    the same information and dominated the drain (state commit + the
    memory-sink driver roundtrip of the exploded relation).  Drained
    per-doc sets explode serving-side into the SAME df-cap + pair-join
    finisher the batch audit uses and hash-match its oracle constant —
    the structural form of the twin claim."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    per = (
        _winnow_profile(_sspread(raw))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("fp")).alias("fps"))
    )
    return _winnow_finish(
        _drain(
            spark, sf_dir, per, ["documents.parquet"], prefix="stream_winnow"
        ).select("doc_id", F.explode("fps").alias("fp"))
    )
