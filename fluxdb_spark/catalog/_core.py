"""The query catalog: every operator the engine claims, as a named
(spark_builder, oracle_sql) pair.

Each entry's Spark side is the engine's own operator plan; the oracle side is
independent ANSI SQL DuckDB runs over the same parquet tables. The driver
hashes both results (column names sorted, order-insensitive), so every
computed column is aliased identically on both sides, every float is rounded
identically, and every timestamp is emitted as a formatted string.

Heights/constants are fixed so results are deterministic at any scale factor.
"""

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


@dataclass(frozen=True)
class QuerySpec:
    name: str
    category: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, rows-only check


_SPECS: list[QuerySpec] = []


def _q(name: str, category: str, oracle: str | None):
    def deco(fn):
        _SPECS.append(QuerySpec(name, category, fn, oracle))
        return fn

    return deco


# The driver consumes the catalog in order and may budget-cap how many
# entries receive a correctness row per round, so ordering is coverage
# policy: unique operator surfaces (temporal engine, dedup/similarity/
# text/multimodal pipeline, streaming) come first, and the mutually
# redundant TPC-H scan/join/agg variants come last (q1/q9/q12/q21-class
# representatives are kept early).  Names not listed keep registration
# order after the listed ones.
_PRIORITY: list[str] = [
    # Round-15 window (driver checks exactly the first 50 entries per
    # round).  Composition (one reorder, per the rotation ritual the
    # test_catalog_parity tripwire enforces):
    #   1-13  the 13 entries with NO driver stamp in any
    #         CORRECTNESS_r*.json (round-14 additions; each locally
    #         oracle-matched at multiple SFs on landing) -- they include
    #         the entries this round's optimizations touched most
    #         (embed_knn_graph_audit, embed_ivfpq_topk/_materialized,
    #         stream_winnow);
    #   14-33 the r09-stamped block (the stalest remaining stamps);
    #   34-50 the head of the r10-stamped block.
    # The tail keeps staleness order (rest of r10, r11, r12, r13, the
    # r14-stamped former window LAST) so the next rotation is again one
    # reorder: move positions 51-100 to the front.
    # -- never driver-stamped (round-14 additions) --
    "flux_snapshot_cadence_sweep",
    "stream_snapshot_cadence",
    "dedup_winnow",
    "session_gap_sweep",
    "dedup_weighted_jaccard",
    "stream_winnow",
    "embed_knn_graph_audit",
    "embed_ivfpq_topk",
    "embed_ivfpq_materialized",
    "embed_mips_topk",
    "phrase_search_postings",
    "flux_retention_sweep",
    "embed_ann_ivf",
    # -- r09-stamped block (stalest stamps) --
    "tpch_q12",
    "dedup_exact",
    "dedup_ngram",
    "dedup_clusters",
    "dedup_survivors",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "embed_topk",
    "embed_neardup",
    "embed_ann_lsh",
    "embed_ann_ivf_exact",
    "text_stats",
    "text_quality",
    "quality_filter",
    "repetition_stats",
    "pii_scrub",
    "doc_fingerprint",
    "decontaminate",
    "seq_packing",
    # -- r10-stamped block head --
    "embed_topk_pq",
    "embed_topk_pq_materialized",
    "interval_overlap_join",
    "event_funnel",
    "cohort_retention",
    "purchase_attribution",
    "flux_state_join",
    "embed_label_noise",
    "rfm_segments",
    "blocklist_audit",
    "pps_sample",
    "event_transitions",
    "table_profile",
    "dedup_containment",
    "flux_series_anomalies",
    "stream_rfm",
    "stream_cms_heavy_hitters",
    # ---- end of the 50-entry r15 window ----
    "flux_key_skew",
    "flux_write_amplification",
    "packing_budget_sweep",
    "dedup_bucket_skew",
    "embed_matryoshka_eval",
    "embed_ann_recall_curve",
    "stream_key_skew",
    "dedup_minhash_k_sweep",
    "dedup_shingle_df_spectrum",
    "stream_shingle_df",
    "flux_version_gap_histogram",
    "embed_dim_variance_spectrum",
    "interval_merge",
    "dedup_prefix_filter_audit",
    "embed_pq_distortion",
    "stream_pq_distortion",
    "flux_tombstone_audit",
    "flux_tablet_stats",
    "typed_view_decode",
    "stream_tumbling",
    "stream_dedup",
    "stream_stream_join",
    "dsir_select",
    "perplexity_buckets",
    "cms_heavy_hitters",
    "embed_topk_binary",
    "decontaminate_fuzzy",
    "bpe_train",
    "bpe_encode",
    "embed_topk_binary_materialized",
    "hll_distinct",
    "embed_pca_project",
    "hdr_quantiles",
    "bpe_encode_materialized",
    "bpe_fertility",
    "flux_series_similarity",
    "embed_hard_negatives",
    "stream_hll_distinct",
    "epoch_shuffle",
    "stream_sessionize",
    "sessionization",
    "source_caps",
    "lm_score",
    "chunk_dedup",
    "heavy_hitters",
    "flux_state_at_ignore_range",
    "flux_collection_state",
    "token_budget_mix",
    "skew_salted_join",
    "tpch_q1",
    "unpivot_pricing",
    "session_windows",
    "flux_state_series",
    "flux_time_weighted",
    "asof_join_nearest",
    "asof_join_tolerance",
    "window_frames",
    "typed_view_protobuf_nested",
    "bm25_rank",
    "bm25_multi",
    "embed_kmeans",
    "embed_topk_quantized",
    "hybrid_rrf",
    "cluster_balanced_sample",
    "temperature_mix",
    "length_buckets",
    "curation_pipeline",
    "hash_split",
    "text_normalize",
    "doc_chunking",
    "multimodal_meta",
    "multimodal_decode",
    "dedup_minhash_lsh_materialized",
    "embed_ann_lsh_materialized",
    "embed_kmeans_materialized",
    "embed_topk_projected",
    "embed_covariance",
    "paragraph_dedup",
    "flux_row_at",
    "flux_singlet_asof",
    "flux_singlet_history",
    "flux_checkpoint",
    "asof_join",
    "asof_join_generic",
    "range_join_incidents",
    "multimodal_frames",
    "stratified_sample",
    "lang_distribution",
    "tumbling_hourly",
    "sliding_windows",
    "stats_aggs",
    "percentiles",
    "distinct_counts",
    "grouping_sets",
    "rollup_pricing",
    "cube_orders",
    "window_ranks",
    "running_total",
    "topk_orders",
    "set_ops",
    "dedup_spans",
    "kmv_set_overlap",
    "stream_kmv_overlap",
    "embed_kcenter_sample",
    "dedup_spans_cut",
    "event_paths",
    "quality_perceptron",
    "leakage_safe_split",
    "source_divergence",
    "robust_stats",
    "stream_source_divergence",
    "editdist_join",
    "bloom_semi_join",
    "k_anonymity",
    "flux_series_ewma",
    "dedup_pagerank",
    "collocations",
    "doc_keywords",
    "stream_collocations",
    "join_size_estimate",
    "collocations_materialized",
    "entity_resolution",
    "stream_join_size",
    "basket_rules",
    "path_regex_match",
    "data_expectations",
    "embed_recall_eval",
    "flux_state_drift",
    "benford_audit",
    "flux_key_survival",
    "dedup_recall_eval",
    "flux_series_trend",
    "weekly_growth",
    "funnel_latency",
    "flux_tablet_reconcile",
    "embed_norm_audit",
    "stream_benford",
    "flux_mutation_profile",
    "stream_data_expectations",
    "source_dedup_matrix",
    "vocab_growth",
    "flux_index_coverage",
    "embed_kcenter_refined",
    "doc_novelty",
    "doc_novelty_materialized",
    "dedup_survivors_quality",
    "dedup_cluster_stats",
    "hll_rollup",
    "stream_hll_rollup",
    "hdr_rollup",
    "lang_id_eval",
    "zorder_layout",
    "data_card",
    "flux_series_backtest",
    "quality_calibration",
    "wor_sample",
    "stream_wor_sample",
    "embed_class_separation",
    "embed_text_consistency",
    "dedup_threshold_sweep",
    "event_seasonality",
    "embed_outliers",
    "wor_sample_stratified",
    "token_budget_curve",
    "stream_embed_outliers",
    "dedup_lsh_tuning",
    "dedup_minhash_estimator",
    "temperature_budget_sweep",
    "stream_lm_score",
    "corpus_fingerprint",
    "quality_keep_bootstrap",
    "flux_state_fingerprint",
    "stream_corpus_fingerprint",
    "embed_quantize",
    "semi_anti_join",
    "scalar_subquery",
    "scalar_showcase",
    "date_funcs",
    "pivot_status",
    "skew_salted_agg",
    "tpch_q2",
    "tpch_q3",
    "tpch_q4",
    "dedup_threshold_sweep_lsh",
    "corpus_self_overlap",
    "token_freq_spectrum",
    "ivf_balance_audit",
    "stream_decontaminate",
    "packing_fragmentation",
    "cluster_quality_matrix",
    "embed_margin_pairs",
    "stream_seasonality",
    "dedup_chaining_audit",
    "corpus_drift_curve",
    "novelty_trend",
    "quality_rules_ablation",
    "stream_token_spectrum",
    "stream_ivf_balance",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q11",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "region_revenue",
    "stream_simhash_dedup",
    "bm25_rank_materialized",
    "embed_topk_quantized_materialized",
    "embed_ann_ivf_materialized",
    "neardup_probe_materialized",
    "semantic_dedup",
    "typed_view_protobuf",
    "embed_neardup_lsh",
    "flux_state_at",
    "flux_state_at_indexed",
    "flux_state_diff",
    "flux_state_at_speculative",
    "flux_has_rows",
    "flux_tablet_index",
    "flux_shard_assignment",
    "flux_shard_progress",
    "flux_gap_check",
]


def catalog() -> list[QuerySpec]:
    rank = {n: i for i, n in enumerate(_PRIORITY)}
    tail = len(_PRIORITY)
    return sorted(
        _SPECS,
        key=lambda s: rank.get(s.name, tail + _SPECS.index(s)),
    )


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _td(spark, sf_dir, name="documents"):
    """Reader for CPU-heavy pipeline inputs: `spread` splits a small
    single-row-group scan across cores (no-op when the scan is already
    parallel, i.e. at real scale)."""
    return spread(load_table(spark, sf_dir, name))
