"""Cross-category shared constants and finishers for the catalog.

SQL constants and Spark-side finishers shared by batch/streaming twin
entries live here so the twin claim ("drained state hash-matches the
batch relation") stays structural: ONE oracle text, ONE finisher.
"""

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

from fluxdb_spark.catalog._core import _t



_SESSIONIZE_SQL = """
WITH ordered AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events),
flagged AS (
  SELECT user_id, event_id,
         CASE WHEN prev_us IS NULL OR us - prev_us > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS is_new, us
  FROM ordered),
sess AS (
  SELECT user_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged),
per_session AS (
  SELECT user_id, session_idx, count(*) AS n_events
  FROM sess GROUP BY user_id, session_idx)
SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events,
       round(avg(n_events), 4) AS avg_session_events
FROM per_session GROUP BY user_id
"""


def _rfm_sql() -> str:
    """DuckDB twin of `rfm_segments` / `stream_rfm`: the same HDR-bucket
    quintile scoring, spelled with the shared bucket arithmetic from
    functions/text (the proven-cross-engine `hdr_quantiles` mapping)."""
    rb = tx._hdr_idx_sql("mx_us - r_us")
    fb = tx._hdr_idx_sql("freq")
    mb = tx._hdr_idx_sql("greatest(cents, 0)")
    return f"""
WITH per_user AS MATERIALIZED (
  SELECT user_id,
         max(epoch_us(ts)) AS r_us,
         CAST(count(*) AS BIGINT) AS freq,
         sum(CAST(floor(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY user_id),
mx AS (SELECT max(r_us) AS mx_us FROM per_user),
n AS (SELECT count(*) AS n_users FROM per_user),
pb AS MATERIALIZED (
  SELECT cents, {rb} AS rb, {fb} AS fb, {mb} AS mb
  FROM per_user, mx),
rt AS (SELECT b, CAST((cb * 5) // n_users + 1 AS BIGINT) AS r_score FROM (
         SELECT rb AS b, sum(count(*)) OVER (ORDER BY rb) - count(*) AS cb
         FROM pb GROUP BY rb), n),
ft AS (SELECT b, CAST((cb * 5) // n_users + 1 AS BIGINT) AS f_score FROM (
         SELECT fb AS b, sum(count(*)) OVER (ORDER BY fb DESC) - count(*) AS cb
         FROM pb GROUP BY fb), n),
mt AS (SELECT b, CAST((cb * 5) // n_users + 1 AS BIGINT) AS m_score FROM (
         SELECT mb AS b, sum(count(*)) OVER (ORDER BY mb DESC) - count(*) AS cb
         FROM pb GROUP BY mb), n)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(cents) AS DOUBLE) / CAST(count(*) * 100 AS DOUBLE)
         AS avg_value
FROM pb
JOIN rt ON rt.b = pb.rb
JOIN ft ON ft.b = pb.fb
JOIN mt ON mt.b = pb.mb
GROUP BY 1, 2, 3
"""


_RFM_SQL = _rfm_sql()


def _rfm_per_user(ev):
    """The algebraic per-user profile (max / count / sum of exact ints) —
    shared by the batch entry and the streaming maintainer."""
    us = F.unix_micros(F.col("ts"))
    return ev.groupBy("user_id").agg(
        F.max(us).alias("r_us"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"),
    )


def _rfm_rollup(per_user):
    """Quintile scoring + segment rollup over the per-user relation,
    scored through the HDR bucket sketch (functions/text `_hdr_idx_expr`
    — the same proven-cross-engine mapping as `hdr_quantiles`):

    1. map per-user metrics to HDR buckets (recency as AGE from the
       corpus-max timestamp so the log-scale resolution applies to "how
       long ago", not to the epoch;  ~3% relative error per bucket);
    2. one combine-friendly groupBy per dimension over the bucket space
       (<= ~64*2^HDR_B rows however many users exist);
    3. the cumulative scan + quintile threshold runs on those sketch
       relations — `score = (users_in_strictly_better_buckets * 5)
       div n_users + 1`, every user in a bucket shares its score;
    4. scores join back by BROADCAST on the bucket id.

    No unpartitioned sort anywhere: the former version ranked every
    user through three `row_number() OVER (ORDER BY ...)` windows — a
    one-task sort per dimension at 10^9 users (the r9 verdict's named
    scale-killer).  The window below orders only the aggregated bucket
    histograms."""
    per_user = per_user.localCheckpoint(eager=False)
    mx = per_user.agg(F.max("r_us").alias("mx_us"))
    n = per_user.agg(F.count(F.lit(1)).alias("n_users"))
    # pb feeds three tier-histogram broadcasts AND the final scored
    # join — checkpoint it too, or each of the four consumers re-runs
    # the HDR projection over the per-user relation (measured 1.37 ->
    # 0.95 s warm at sf0.1; at 10^9 users it's three spare corpus scans)
    pb = per_user.crossJoin(F.broadcast(mx)).select(
        "cents",
        F.expr(tx._hdr_idx_expr("mx_us - r_us")).alias("rb"),
        F.expr(tx._hdr_idx_expr("freq")).alias("fb"),
        F.expr(tx._hdr_idx_expr("greatest(cents, 0)")).alias("mb"),
    ).localCheckpoint(eager=False)

    def _tiers(col, asc, score_name):
        hist = pb.groupBy(F.col(col).alias("b")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        w = Window.orderBy(F.asc("b") if asc else F.desc("b")).rowsBetween(
            Window.unboundedPreceding, 0
        )
        return (
            hist.withColumn("cb", F.sum("cnt").over(w) - F.col("cnt"))
            .crossJoin(F.broadcast(n))
            .select(
                F.col("b").alias(col),
                F.expr("(cb * 5) div n_users + 1").alias(score_name),
            )
        )

    rt = _tiers("rb", True, "r_score")
    ft = _tiers("fb", False, "f_score")
    mt = _tiers("mb", False, "m_score")
    scored = (
        pb.join(F.broadcast(rt), "rb")
        .join(F.broadcast(ft), "fb")
        .join(F.broadcast(mt), "mb")
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        (
            F.sum("cents").cast("double")
            / (F.count(F.lit(1)) * F.lit(100)).cast("double")
        ).alias("avg_value"),
    )


_DECONTAM_8GRAM = ", ".join(f"t[i+{j}]" for j in range(8))

# ONE oracle for the batch and streaming decontamination entries (the
# fingerprint-pair precedent: sharing the text makes the "drained state
# == batch relation" claim structural, not a copy that can drift).
_DECONTAM_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
sl AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 6),
                       i -> concat_ws(' ', {_DECONTAM_8GRAM}))) AS s
  FROM toks WHERE len(t) >= 8),
sh AS (SELECT doc_id, unnest(s) AS shingle FROM sl),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0)
SELECT s.doc_id, count(DISTINCT s.shingle) AS n_hits
FROM sh s JOIN bench USING (shingle)
WHERE s.doc_id % 10 != 0
GROUP BY 1
"""


_BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]


_GCENT_CACHE: dict[tuple, list] = {}


def _gcent(spark, sf_dir):
    """The corpus-wide embedding centroid for an sf_dir, computed once
    and memoized — the fold is deterministic exact integers (the
    `_bpe_merges` amortization pattern), and three entries
    (embed_class_separation / embed_outliers / stream_embed_outliers)
    score against the same centroid, so sharing it is pure
    amortization, not a semantic coupling. Keyed on the parquet file's
    (mtime, size), not just the path: the driver regenerates testdata
    between sessions, and a path-keyed cache would score a fresh corpus
    against a stale centroid in any process that outlives the swap."""
    import os

    st = os.stat(f"{sf_dir}/embeddings.parquet")
    key = (sf_dir, st.st_mtime_ns, st.st_size)
    if key not in _GCENT_CACHE:
        _GCENT_CACHE[key] = sim.global_centroid(
            _t(spark, sf_dir, "embeddings")
        )
    return _GCENT_CACHE[key]


def _log2_bucket_sql(expr: str) -> str:
    """Integer log2 bucket as a pure-comparison CASE ladder, identical
    text on both engines (the _POIS_T shared-literal pattern).  A libm
    log2/ln would misround exact powers of two (ln(8)/ln(2) floors to 2
    on some libms), so buckets come from 62 integer compares instead —
    constant-folded by both optimizers."""
    whens = " ".join(
        f"WHEN {expr} < {1 << (b + 1)} THEN {b}" for b in range(62)
    )
    return f"CAST(CASE {whens} ELSE 62 END AS BIGINT)"


_SPECTRUM_SHARE = (
    "CAST(floor(CAST(occ AS DOUBLE) * 1000000"
    " / CAST(total AS DOUBLE)) AS BIGINT)"
)
_SPECTRUM_TOP_MASS = (
    "CAST(floor(CAST(cum_occ AS DOUBLE) * 1000000"
    " / CAST(total AS DOUBLE)) AS BIGINT)"
)


# ONE oracle for the batch and streaming spectrum entries (the
# seasonality/decontaminate shared-constant precedent).
_SPECTRUM_SQL = f"""
WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS term
             FROM documents),
c AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
b AS (SELECT {_log2_bucket_sql('cnt')} AS bucket,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(cnt) AS BIGINT) AS occ
      FROM c GROUP BY 1),
t AS (SELECT CAST(sum(occ) AS BIGINT) AS total FROM b),
w AS (SELECT bucket, n_types, occ, total,
             CAST(sum(occ) OVER (ORDER BY bucket DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_occ
      FROM b, t)
SELECT bucket, n_types, occ,
       {_SPECTRUM_SHARE} AS occ_share_ppm,
       {_SPECTRUM_TOP_MASS} AS top_mass_ppm
FROM w
"""


def _spectrum_finish(c):
    """Bucket ladder -> <= 63-row rollup -> shares/coverage — the
    serving-side finisher both the batch scan and the drained streaming
    vocabulary counters run (seasonality-finisher precedent).  Input is
    any (term, cnt) relation."""
    b = (
        c.select(F.expr(_log2_bucket_sql("cnt")).alias("bucket"), "cnt")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("cnt").cast("long").alias("occ"),
        )
    )
    t = b.agg(F.sum("occ").cast("long").alias("total"))
    w = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        b.crossJoin(F.broadcast(t))
        .withColumn("cum_occ", F.sum("occ").over(w).cast("long"))
        .select(
            "bucket",
            "n_types",
            "occ",
            F.expr(_SPECTRUM_SHARE).alias("occ_share_ppm"),
            F.expr(_SPECTRUM_TOP_MASS).alias("top_mass_ppm"),
        )
    )


_IVF_BAL_SHARE = (
    "CAST(floor(CAST(n_vecs AS DOUBLE) * 1000000"
    " / CAST(total AS DOUBLE)) AS BIGINT)"
)
def _ivf_bal_lift(k: int) -> str:
    """Engine-common lift expression: cell share vs the 1/k uniform
    ideal, in ppm.  k is explicit so the shared finisher can never be
    reused with a different-k cell relation while silently keeping the
    k=8 constant (ADVICE r12)."""
    return (
        f"CAST(floor(CAST(n_vecs AS DOUBLE) * {int(k)} * 1000000"
        " / CAST(total AS DOUBLE)) AS BIGINT)"
    )


def _ivf_balance_sql(k: int = 8) -> str:
    body, a = sim._sql_kmeans_ctes(k, 3)
    return f"""{body},
cells AS (SELECT CAST(cluster AS BIGINT) AS cell,
                 CAST(count(*) AS BIGINT) AS n_vecs
          FROM {a} GROUP BY 1),
t AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS total FROM cells),
w AS (SELECT cell, n_vecs, total,
             CAST(sum(n_vecs) OVER (ORDER BY n_vecs DESC, cell
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS worst_probe_cum
      FROM cells, t)
SELECT cell, n_vecs,
       {_IVF_BAL_SHARE} AS share_ppm,
       {_ivf_bal_lift(k)} AS balance_lift_ppm,
       worst_probe_cum
FROM w
"""


# ONE oracle for the batch and streaming balance-audit entries.
_IVF_BALANCE_SQL = _ivf_balance_sql()

# keyed by sf_dir; value = ((mtime_ns, size), centroids).  One entry per
# sf_dir, replaced on generation mismatch, so a long-lived session that
# sees the driver regenerate testdata doesn't accumulate stale models
# (ADVICE r12).
_KCENTS8_CACHE: dict[str, tuple] = {}


def _kcents8(spark, sf_dir):
    """The frozen k=8 coarse-quantizer centroids for an sf_dir, trained
    once and memoized (the `_gcent` amortization pattern, same
    (mtime, size) key discipline) — both balance-audit entries assign
    against the SAME frozen model, which is exactly the semantics of a
    standing IVF index; `assign_to_centroids` over the training corpus
    provably reproduces `kmeans_clusters` (see kmeans_centroids)."""
    import os

    st = os.stat(f"{sf_dir}/embeddings.parquet")
    gen = (st.st_mtime_ns, st.st_size)
    hit = _KCENTS8_CACHE.get(sf_dir)
    if hit is None or hit[0] != gen:
        hit = (
            gen,
            sim.kmeans_centroids(
                _t(spark, sf_dir, "embeddings"), k=8, iters=3
            ),
        )
        _KCENTS8_CACHE[sf_dir] = hit
    return hit[1]


def _ivf_balance_finish(cells, k: int = 8):
    """share/lift/worst-probe windows over the k-row cell relation —
    shared by the batch audit and the drained streaming counters.  k
    must match the quantizer that produced `cells` (the lift compares
    each cell's share to the 1/k ideal)."""
    t = cells.agg(F.sum("n_vecs").cast("long").alias("total"))
    w = Window.orderBy(F.desc("n_vecs"), F.asc("cell")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        cells.crossJoin(F.broadcast(t))
        .withColumn(
            "worst_probe_cum", F.sum("n_vecs").over(w).cast("long")
        )
        .select(
            "cell",
            "n_vecs",
            F.expr(_IVF_BAL_SHARE).alias("share_ppm"),
            F.expr(_ivf_bal_lift(k)).alias("balance_lift_ppm"),
            "worst_probe_cum",
        )
    )


# ONE oracle for the batch and streaming seasonality entries (the
# fingerprint/decontaminate precedent: shared text makes "drained cells
# finish to the same table" structural).
_SEASONALITY_SQL = """
WITH p AS (
  SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
         (epoch_us(ts) % 86400000000) // 3600000000 AS hour
  FROM events),
cells AS (SELECT dow, hour, CAST(count(*) AS BIGINT) AS n
          FROM p GROUP BY 1, 2),
dmarg AS (SELECT dow, CAST(sum(n) AS BIGINT) AS n_dow FROM cells GROUP BY 1),
hmarg AS (SELECT hour, CAST(sum(n) AS BIGINT) AS n_hour FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cells)
SELECT c.dow, c.hour, c.n,
       (c.n * 1000000) // t.total AS share_ppm,
       CAST(floor(CAST(c.n AS DOUBLE) * t.total * 1000000
                  / (CAST(d.n_dow AS DOUBLE) * h.n_hour)) AS BIGINT)
         AS lift_ppm
FROM cells c JOIN dmarg d USING (dow) JOIN hmarg h USING (hour), tot t
"""

# FLOOR division via pmod, all-integer (ADVICE r11): a double divide
# truncated toward zero agrees with DuckDB's // only for post-1970
# timestamps; (a - pmod(a, b)) div b floors for every sign, and Spark's
# % matches DuckDB's C-style remainder, so both engines compute
# identical dow/hour for any epoch.  Shared by the batch and streaming
# seasonality entries.
_SEASON_US = "unix_micros(ts)"
_SEASON_DOW = (
    f"((({_SEASON_US} - pmod({_SEASON_US}, 86400000000))"
    f" div 86400000000) + 4) % 7"
)
_SEASON_HOUR = (
    f"(({_SEASON_US} % 86400000000)"
    f" - pmod(({_SEASON_US} % 86400000000), 3600000000)) div 3600000000"
)


def _seasonality_finish(cells):
    """Margins + independence lift over the <= 168-row cell relation —
    the serving-side finisher both the batch scan and the drained
    streaming state run (stream_collocations' finisher precedent).
    The margin grouping keys are ALIASED (fresh attribute ids) because
    the drained memory-table relation otherwise self-joins with
    conflicting attributes."""
    dmarg = cells.groupBy(F.col("dow").alias("d_dow")).agg(
        F.sum("n").cast("long").alias("n_dow")
    )
    hmarg = cells.groupBy(F.col("hour").alias("h_hour")).agg(
        F.sum("n").cast("long").alias("n_hour")
    )
    tot = cells.agg(F.sum("n").cast("long").alias("total"))
    return (
        cells.join(F.broadcast(dmarg), F.col("dow") == F.col("d_dow"))
        .join(F.broadcast(hmarg), F.col("hour") == F.col("h_hour"))
        .crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "hour",
            "n",
            F.expr("(n * 1000000) div total").alias("share_ppm"),
            # lift in DOUBLE then floor: the int64 form n*total*1e6
            # overflows around 1e7 events (Spark wraps silently, DuckDB
            # raises — the cross-engine divergence class this catalog
            # exists to prevent); identical IEEE op order on both
            # engines keeps the floored integer bit-portable
            F.expr(
                "CAST(floor(CAST(n AS DOUBLE) * total * 1000000"
                " / (CAST(n_dow AS DOUBLE) * n_hour)) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


# ONE fingerprint definition for both the batch and the streaming entry
# (their docstrings promise "same oracle" — sharing the text makes that
# structural, not a copy that can drift).
_FINGERPRINT_SQL = f"""
WITH per_doc AS (
  SELECT source,
         {hash60_sql("concat(CAST(doc_id AS VARCHAR), '|', text)")} AS h
  FROM documents),
per_source AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(bit_xor(h) AS BIGINT) AS fingerprint
  FROM per_doc GROUP BY source)
SELECT source, n_docs, fingerprint FROM per_source
UNION ALL
SELECT '__all__', CAST(sum(n_docs) AS BIGINT),
       CAST(bit_xor(fingerprint) AS BIGINT)
FROM per_source
"""


def _fingerprint_per_source(docs):
    """(source, n_docs, fingerprint) — the shared per-source XOR-fold of
    the batch and streaming fingerprint entries."""
    return (
        docs.select(
            "source",
            hash60(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit("|"), F.col("text")
                )
            ).alias("h"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.bit_xor("h").cast("long").alias("fingerprint"),
        )
    )


def _fingerprint_all_row(per_source):
    """The '__all__' collection row merged from per-source fingerprints."""
    return per_source.agg(
        F.lit("__all__").alias("source"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.bit_xor("fingerprint").cast("long").alias("fingerprint"),
    ).select("source", "n_docs", "fingerprint")


# Engine-common integer share for the hot-key audits (double-floor form:
# version counts at 100 TB pass the int64 `* 1000000` ceiling).
_KEY_SHARE_PPM = (
    "CAST(floor(CAST(n_versions AS DOUBLE) * 1000000"
    " / CAST(tablet_versions AS DOUBLE)) AS BIGINT)"
)

# ONE oracle for the batch and streaming hot-key audits.
_KEY_SKEW_SQL = f"""
WITH {CHANGELOG_CTE},
per AS (
  SELECT tablet_id, primary_key, CAST(count(*) AS BIGINT) AS n_versions
  FROM changelog GROUP BY 1, 2),
w AS (
  SELECT tablet_id, primary_key, n_versions,
         CAST(sum(n_versions) OVER (PARTITION BY tablet_id) AS BIGINT)
           AS tablet_versions,
         row_number() OVER (PARTITION BY tablet_id
                            ORDER BY n_versions DESC, primary_key ASC)
           AS rank
  FROM per)
SELECT tablet_id, primary_key, n_versions, CAST(rank AS BIGINT) AS rank,
       {_KEY_SHARE_PPM} AS share_ppm
FROM w WHERE rank <= 5
"""


def _key_skew_finish(per):
    """Top-5 + share windows over the per-(tablet, key) count relation —
    shared by the batch audit and the drained streaming counters.  Both
    windows ride ONE tablet_id hash partition; rank<=5 compiles to
    WindowGroupLimit."""
    tot = Window.partitionBy("tablet_id")
    rnk = Window.partitionBy("tablet_id").orderBy(
        F.desc("n_versions"), F.asc("primary_key")
    )
    w = per.select(
        "tablet_id",
        "primary_key",
        "n_versions",
        F.sum("n_versions").over(tot).cast("long").alias("tablet_versions"),
        F.row_number().over(rnk).alias("rank"),
    ).filter(F.col("rank") <= 5)
    return w.select(
        "tablet_id",
        "primary_key",
        "n_versions",
        F.col("rank").cast("long").alias("rank"),
        F.expr(_KEY_SHARE_PPM).alias("share_ppm"),
    )


# Engine-common candidate-pair share for the shingle-df audits (double-
# floor form: the priced pair volume at 100 TB passes the int64
# `* 1000000` ceiling long before the corpus does).
_DF_CAND_SHARE = (
    "CAST(floor(CAST(cand_pairs AS DOUBLE) * 1000000"
    " / CAST(total_pairs AS DOUBLE)) AS BIGINT)"
)

# ONE oracle for the batch and streaming shingle-df spectrum audits.
_SHINGLE_DF_SQL = f"""
WITH {dd.sql_shingles_ctes()},
df AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1),
b AS (SELECT {_log2_bucket_sql('df')} AS bucket,
             CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(df) AS BIGINT) AS n_postings,
             CAST(sum(df * (df - 1) // 2) AS BIGINT) AS cand_pairs
      FROM df GROUP BY 1),
t AS (SELECT CAST(sum(cand_pairs) AS BIGINT) AS total_pairs FROM b)
SELECT bucket, n_shingles, n_postings, cand_pairs,
       CASE WHEN total_pairs = 0 THEN CAST(0 AS BIGINT)
            ELSE {_DF_CAND_SHARE} END AS cand_share_ppm
FROM b, t
"""


def _shingle_df_finish(dfrel):
    """df-bucket ladder -> <=63-row rollup -> priced candidate volume —
    shared by the batch scan and the drained standing shingle counters.
    Input is any (shingle, df) relation.  `df*(df-1) div 2` is exact and
    engine-agreeing (nonnegative, always even before the halving); the
    pair space is priced, never materialized."""
    b = (
        dfrel.select(F.expr(_log2_bucket_sql("df")).alias("bucket"), "df")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum("df").cast("long").alias("n_postings"),
            F.sum(F.expr("df * (df - 1) div 2"))
            .cast("long")
            .alias("cand_pairs"),
        )
    )
    t = b.agg(F.sum("cand_pairs").cast("long").alias("total_pairs"))
    return b.crossJoin(F.broadcast(t)).select(
        "bucket",
        "n_shingles",
        "n_postings",
        "cand_pairs",
        F.expr(
            f"CASE WHEN total_pairs = 0 THEN CAST(0 AS BIGINT)"
            f" ELSE {_DF_CAND_SHARE} END"
        ).alias("cand_share_ppm"),
    )


# =========================================================================
# Snapshot-cadence sweep (round 14): the I3 pricing question answered as
# one relation.  The adaptive indexer (indexing.go thresholds, SURVEY
# §2.4 I3) has to pick a snapshot cadence per tablet; this audit prices
# every candidate cadence from ONE pass over the changelog — index rows
# WRITTEN (sum over snapshots of cumulative distinct keys) vs rows READ
# at the head (last-snapshot keys + delta) vs the raw index-less scan.
# The batch entry and the streaming twin share this profile/finisher:
# the profile is per-(tablet, key, 128-height-bucket) counters (count /
# max — additive and mergeable, so the micro-batch merge IS the update),
# and every cadence is a multiple of the bucket width, which makes the
# bucket arithmetic EXACT: snapshot heights are multiples of 128, so
# `h0 <= k*c  <=>  ceil(h0/128) <= k*c/128` and
# `height > k*c <=> ceil(height/128) > k*c/128` hold with no rounding.
# =========================================================================

_CADENCES = (128, 256, 512)
_CB_WIDTH = 128  # bucket width; every cadence is a multiple of it

# Engine-common guarded ratios (double-floor form per the house rule).
_READ_SAVINGS_PPM = (
    "CASE WHEN raw_rows = 0 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(floor((CAST(raw_rows AS DOUBLE)"
    " - CAST(read_rows AS DOUBLE)) * 1000000"
    " / CAST(raw_rows AS DOUBLE)) AS BIGINT) END"
)
_INDEX_WRITE_X100 = (
    "CASE WHEN raw_rows = 0 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(floor(CAST(index_rows AS DOUBLE) * 100"
    " / CAST(raw_rows AS DOUBLE)) AS BIGINT) END"
)


def _cadence_sql() -> str:
    """ONE oracle for the batch and streaming cadence sweeps, derived
    from the SAME _CADENCES/_CB_WIDTH constants the Spark finisher uses
    (a hardcoded cadence list would silently desynchronize on retune).
    The oracle works on raw heights — the bucket trick is a Spark-side
    state-size device, exact by the multiples-of-128 argument above."""
    cads = ", ".join(str(c) for c in _CADENCES)
    return f"""
WITH {CHANGELOG_CTE},
cad AS (SELECT CAST(unnest([{cads}]) AS BIGINT) AS cadence),
hd AS (SELECT max(height) AS h FROM changelog),
k AS (SELECT cadence, CAST(h // cadence AS BIGINT) AS ks FROM cad, hd),
per_key AS (
  SELECT tablet_id, primary_key, min(height) AS h0
  FROM changelog GROUP BY 1, 2),
idx AS (
  SELECT k.cadence, pk.tablet_id,
         CAST(sum(CASE WHEN greatest(1, (h0 + cadence - 1) // cadence) <= ks
                       THEN ks - greatest(1, (h0 + cadence - 1) // cadence) + 1
                       ELSE 0 END) AS BIGINT) AS index_rows,
         CAST(sum(CASE WHEN ks > 0 AND h0 <= ks * cadence
                       THEN 1 ELSE 0 END) AS BIGINT) AS snap_rows
  FROM per_key pk CROSS JOIN k GROUP BY 1, 2),
dl AS (
  SELECT k.cadence, c.tablet_id,
         CAST(count(*) AS BIGINT) AS raw_rows,
         CAST(sum(CASE WHEN ks = 0 OR c.height > ks * cadence
                       THEN 1 ELSE 0 END) AS BIGINT) AS delta_rows,
         CAST(max(ks) AS BIGINT) AS n_snapshots
  FROM changelog c CROSS JOIN k GROUP BY 1, 2),
j AS (
  SELECT dl.tablet_id, dl.cadence, n_snapshots, index_rows, snap_rows,
         delta_rows, snap_rows + delta_rows AS read_rows, raw_rows
  FROM dl JOIN idx ON dl.cadence = idx.cadence
                  AND dl.tablet_id = idx.tablet_id)
SELECT tablet_id, cadence, n_snapshots, index_rows, snap_rows, delta_rows,
       read_rows, raw_rows,
       {_READ_SAVINGS_PPM} AS read_savings_ppm,
       {_INDEX_WRITE_X100} AS index_write_x100
FROM j
"""


_CADENCE_SQL = _cadence_sql()


def _cadence_profile(log):
    """Per-(tablet, key, ceil-128-bucket) write counters — the shared
    state shape: count and max are additive/mergeable, so the SAME
    groupBy is the batch profile and the streaming state update."""
    return log.groupBy(
        "tablet_id",
        "primary_key",
        F.expr(f"(height + {_CB_WIDTH - 1}) div {_CB_WIDTH}").alias("cb"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("nv"),
        F.max("height").cast("long").alias("hmax"),
    )


def _cadence_finish(per):
    """Bucketed counters -> the |tablets| x |cadences| pricing table —
    shared by the batch scan and the drained standing counters.  All
    rank-free arithmetic: the per-key snapshot-membership count is the
    closed form `ks - k_min + 1` (no per-snapshot explode), and every
    branch below runs on the bounded profile relation, never the
    changelog."""
    per = per.localCheckpoint()  # head + firsts + delta all read it
    cadarr = F.array(*[F.lit(c).cast("long") for c in _CADENCES])
    k = (
        per.agg(F.max("hmax").alias("h"))
        .select(F.explode(cadarr).alias("cadence"), "h")
        .select(
            "cadence",
            F.expr("h div cadence").cast("long").alias("ks"),
            F.expr(f"cadence div {_CB_WIDTH}").cast("long").alias("cr"),
        )
    )
    firsts = per.groupBy("tablet_id", "primary_key").agg(
        F.min("cb").alias("cb0")
    )
    idx = (
        firsts.crossJoin(F.broadcast(k))
        .groupBy(
            F.col("cadence").alias("i_cadence"),
            F.col("tablet_id").alias("i_tablet"),
        )
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN greatest(1, (cb0 + cr - 1) div cr) <= ks"
                    " THEN ks - greatest(1, (cb0 + cr - 1) div cr) + 1"
                    " ELSE 0 END"
                )
            )
            .cast("long")
            .alias("index_rows"),
            F.sum(
                F.expr(
                    "CASE WHEN ks > 0 AND cb0 <= ks * cr THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("snap_rows"),
        )
    )
    dl = (
        per.crossJoin(F.broadcast(k))
        .groupBy("cadence", "tablet_id")
        .agg(
            F.sum("nv").cast("long").alias("raw_rows"),
            F.sum(
                F.expr(
                    "CASE WHEN ks = 0 OR cb > ks * cr THEN nv ELSE 0 END"
                )
            )
            .cast("long")
            .alias("delta_rows"),
            F.max("ks").cast("long").alias("n_snapshots"),
        )
    )
    j = dl.join(
        idx,
        (F.col("cadence") == F.col("i_cadence"))
        & (F.col("tablet_id") == F.col("i_tablet")),
    ).withColumn("read_rows", F.col("snap_rows") + F.col("delta_rows"))
    return j.select(
        "tablet_id",
        "cadence",
        "n_snapshots",
        "index_rows",
        "snap_rows",
        "delta_rows",
        "read_rows",
        "raw_rows",
        F.expr(_READ_SAVINGS_PPM).alias("read_savings_ppm"),
        F.expr(_INDEX_WRITE_X100).alias("index_write_x100"),
    )


# =========================================================================
# Winnowing pair audit (round 14).  The df cap is MOSS's common-code
# elimination AND the quadratic-blowup guard: a fingerprint present in
# more than 1/WINNOW_MAXDF_SHARE of the corpus identifies boilerplate,
# not copying, and is dropped BEFORE the pair join — so the join volume
# is bounded by sum(C(min(df, cap), 2)) instead of the corpus-quadratic
# hot-fingerprint blowup.  The floor keeps the audit populated at tiny
# SFs.  Constants/oracle/finisher live here because the batch audit
# (`dedup_winnow`) and the standing twin (`stream_winnow`) share them —
# the structural form of the drain-equals-batch claim.
# =========================================================================

WINNOW_MAXDF_FLOOR = 20
WINNOW_MAXDF_SHARE = 100
WINNOW_MIN_SHARED = 5

_WINNOW_SIM_PPM = (
    "CAST(floor(CAST(shared_fps AS DOUBLE) * 1000000"
    " / CAST(n_fps_1 + n_fps_2 - shared_fps AS DOUBLE)) AS BIGINT)"
)
_WINNOW_MAXDF = (
    f"greatest({WINNOW_MAXDF_FLOOR}, n_docs {{div}} {WINNOW_MAXDF_SHARE})"
)

# ONE oracle for the batch and streaming winnow audits.  n_docs comes
# from the fingerprint relation itself (docs long enough to fingerprint)
# so the streaming twin needs no second input.
_WINNOW_SQL = f"""
WITH {dd.sql_winnow_ctes()},
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM fp),
wdf AS (SELECT fp.fp, CAST(count(*) AS BIGINT) AS df FROM fp GROUP BY 1),
keep AS (SELECT wdf.fp FROM wdf, nd
         WHERE df <= {_WINNOW_MAXDF.format(div='//')}),
fk AS (SELECT f.doc_id, f.fp FROM fp f JOIN keep USING (fp)),
nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nf FROM fk GROUP BY 1),
p AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         CAST(count(*) AS BIGINT) AS shared_fps
  FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT d1, d2, shared_fps,
       n1.nf AS n_fps_1, n2.nf AS n_fps_2,
       {_WINNOW_SIM_PPM} AS sim_ppm
FROM p
JOIN nf n1 ON n1.doc_id = p.d1
JOIN nf n2 ON n2.doc_id = p.d2
WHERE shared_fps >= {WINNOW_MIN_SHARED}
"""


def _winnow_profile(docs):
    """The (doc_id, fp) distinct winnowed-fingerprint relation — per-doc
    JVM array work, map-only; the SAME select is the batch profile and
    the streaming state update (rows are distinct per doc by
    construction, so the streaming groupBy merge is idempotent)."""
    return docs.select(
        "doc_id",
        F.explode(dd.winnow_fingerprints(F.col("text"))).alias("fp"),
    )


def _winnow_finish(fps):
    """Fingerprint relation -> surviving copy-suspect pairs — shared by
    the batch audit and the drained standing postings."""
    fps = fps.localCheckpoint()  # n_docs + df counts + both join sides
    nd = fps.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    keep = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .crossJoin(F.broadcast(nd))
        .filter(F.expr(f"df <= {_WINNOW_MAXDF.format(div='div')}"))
        .select("fp")
    )
    fk = fps.join(keep, "fp").localCheckpoint()  # nf + both pair sides
    nf = fk.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("nf")
    )
    a = fk.select(F.col("doc_id").alias("d1"), "fp")
    b = fk.select(F.col("doc_id").alias("d2"), F.col("fp").alias("fp_b"))
    p = (
        a.join(
            b, (F.col("fp") == F.col("fp_b")) & (F.col("d1") < F.col("d2"))
        )
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= WINNOW_MIN_SHARED)
    )
    n1 = nf.select(F.col("doc_id").alias("j1"), F.col("nf").alias("n_fps_1"))
    n2 = nf.select(F.col("doc_id").alias("j2"), F.col("nf").alias("n_fps_2"))
    return (
        p.join(n1, F.col("d1") == F.col("j1"))
        .join(n2, F.col("d2") == F.col("j2"))
        .select(
            "d1",
            "d2",
            "shared_fps",
            "n_fps_1",
            "n_fps_2",
            F.expr(_WINNOW_SIM_PPM).alias("sim_ppm"),
        )
    )
