"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fluxdb_spark import get_spark  # noqa: E402
from fluxdb_spark.catalog import catalog  # noqa: E402

# Headline set: temporal core, snapshot-indexed read, heavy relational,
# streaming-ish windows, and the pipeline operators that matter at scale.
HEADLINE = [
    "flux_state_at",
    "flux_state_at_indexed",
    "flux_tablet_stats",
    "tpch_q1",
    "tpch_q2",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    "tpch_q18",
    "tpch_q21",
    "region_revenue",
    "asof_join",
    "range_join_incidents",
    "sessionization",
    "tumbling_hourly",
    "dedup_ngram",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embed_topk",
    "text_stats",
    "skew_salted_join",
    "multimodal_decode",
    "stratified_sample",
    "decontaminate",
    "seq_packing",
    "quality_filter",
    "repetition_stats",
    "pii_scrub",
    "source_caps",
    "lm_score",
    "chunk_dedup",
    "heavy_hitters",
    # round-4 additions: whole-collection snapshot, curation mix, a REAL
    # streaming query (rate-limited file stream -> stateful dedup sink),
    # and the protobuf typed-view encode->decode round trip
    "flux_collection_state",
    "token_budget_mix",
    "stream_simhash_dedup",
    "typed_view_protobuf",
    "embed_neardup_lsh",
    # round-5 additions: RAG chunking (map-side explode, scan-speed) and
    # the one-scan temporal analytics pair (snapshot series, TWA)
    "doc_chunking",
    "flux_state_series",
    "flux_time_weighted",
    # hybrid-retrieval pair: sparse BM25 ranking and whole-corpus
    # fixed-point k-means (iterative clustering as DataFrame plans)
    "bm25_rank",
    "embed_kmeans",
    "embed_topk_quantized",
    # round-7 additions: batch multi-query BM25, cluster-balanced
    # sampling over the kmeans cells, and the snapshot diff read
    "bm25_multi",
    "cluster_balanced_sample",
    "flux_state_diff",
    # embedding-compression pair: JL random-projection ANN and the exact
    # fixed-point covariance relation (PCA building block)
    "embed_topk_projected",
    "embed_covariance",
    # C4-style sub-document dedup (corpus-wide span ownership)
    "paragraph_dedup",
    # round-8 additions: the standing-service read paths — maintainer
    # catch-up (commit-log follow + derived write) plus the
    # materialized-index query, the cost profile a standing retrieval
    # service actually pays
    "dedup_minhash_lsh_materialized",
    "embed_ann_lsh_materialized",
    "bm25_rank_materialized",
    "embed_topk_quantized_materialized",
    "embed_ann_ivf_materialized",
    "neardup_probe_materialized",
    "semantic_dedup",
    "epoch_shuffle",
    # round-9 additions: PQ ANN (train + encode + ADC) and its
    # standing-codes-table twin, DSIR data selection, CCNet-style
    # perplexity tiers, count-min sketch beside the exact profile
    "embed_topk_pq",
    "embed_topk_pq_materialized",
    "dsir_select",
    "perplexity_buckets",
    "cms_heavy_hitters",
    # 1-bit binary ANN (XOR+popcount scan + int8 rerank), fuzzy MinHash
    # decontamination, and the iterative BPE trainer (driver-loop merges
    # over the distinct-vocab relation)
    "embed_topk_binary",
    "embed_topk_binary_materialized",
    "decontaminate_fuzzy",
    "bpe_train",
    "hll_distinct",
    "embed_pca_project",
    "hdr_quantiles",
    "bpe_fertility",
    "flux_series_similarity",
    "embed_hard_negatives",
    "stream_hll_distinct",
    "interval_overlap_join",
    # events-analytics family: ordered funnel with conversion window,
    # daily first-purchase retention cohorts, and last-touch revenue
    # attribution (beside sessionization)
    "event_funnel",
    "cohort_retention",
    "purchase_attribution",
    # cross-tablet state join: one conditional-max_by aggregation
    "flux_state_join",
    # label-noise audit: nearest-class-centroid confusion matrix
    "embed_label_noise",
    # RFM quintile segmentation over the per-user aggregate
    "rfm_segments",
    # C4 blocklist screen, per-source audit rollup
    "blocklist_audit",
    # Poisson PPS sampling, map-side token-budgeted draw
    "pps_sample",
    # streaming-maintained per-user RFM profile + serving rollup
    "stream_rfm",
    # event-type transition matrix (path flows)
    "event_transitions",
    # ANALYZE-style per-column table profile in one scan
    "table_profile",
    # asymmetric containment near-dup (one-sided prefix filter)
    "dedup_containment",
    # k-sigma anomaly flags over state series (exact-integer test)
    "flux_series_anomalies",
    # round-10 additions: exact-substring duplicated spans (ExactSubstr,
    # span-level dedup) and KMV distinct-set algebra (audience overlap)
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
    # edit-distance similarity join (Ed-Join on the distinct-value
    # relation) and the bloom-pruned exact semi-join (runtime filter)
    "editdist_join",
    "bloom_semi_join",
    # k-anonymity generalization ladder (one rollup scan) and EWMA
    # smoothing over state histories (one-scan grid + shared lag window)
    "k_anonymity",
    "flux_series_ewma",
    # duplication-hub centrality: integer PageRank on the near-dup graph
    "dedup_pagerank",
    # PMI-lift collocation mining (exact-integer, Zipf-bounded groupBys)
    "collocations",
    # per-doc integer tf-idf keywords (broadcast df, WindowGroupLimit)
    "doc_keywords",
    # streaming-maintained collocation count tables + batch finisher
    "stream_collocations",
    # CMS inner-product join-size estimation (planner primitive)
    "join_size_estimate",
    # collocation count tables as transform-aggregate IVM (pre seam)
    "collocations_materialized",
    # entity resolution: editdist pairs -> components -> survivorship
    "entity_resolution",
    # CMS sketches as streaming state (live planner statistics)
    "stream_join_size",
    # market-basket association rules (integer support/confidence/lift)
    "basket_rules",
    # sequence-pattern matching over per-user event paths
    "path_regex_match",
    # declarative data-quality expectations in one pass
    "data_expectations",
    # temporal distribution drift between two snapshot heights
    "flux_state_drift",
    # Benford first-digit audit + key survival churn curve
    "benford_audit",
    "flux_key_survival",
    # per-key integer least-squares trend over state histories
    "flux_series_trend",
    # period-over-period growth over the calendar-bounded daily rollup
    "weekly_growth",
    # conversion-latency percentiles over the converted-user relation
    "funnel_latency",
    # cross-tablet reconciliation audit (replication verification)
    "flux_tablet_reconcile",
    # embedding-health audit over exact integer magnitudes
    "embed_norm_audit",
    # standing Benford audit + ingest mutation-mix profile
    "stream_benford",
    "flux_mutation_profile",
    # additive data-quality rules as standing streaming counters
    "stream_data_expectations",
    # cross-source duplication matrix (mirror detection)
    "source_dedup_matrix",
    # Heaps-law vocabulary growth curve (tokenizer sizing)
    "vocab_growth",
    # snapshot-index coverage observability (I3 cadence feedback)
    "flux_index_coverage",
    # round-11 additions: sample-then-refine k-center (2 corpus passes
    # for any k), first-occurrence novelty scoring (batch + owner-table
    # IVM), quality-aware survivorship, HLL hierarchy merge, and the
    # fluency-vs-rules calibration curve
    "embed_kcenter_refined",
    "doc_novelty",
    "doc_novelty_materialized",
    "dedup_survivors_quality",
    "hll_rollup",
    "quality_calibration",
    # late round-11: cluster-size observability, streaming HLL hierarchy,
    # and quantile rollup via histogram sum
    "dedup_cluster_stats",
    "stream_hll_rollup",
    "hdr_rollup",
    # language-ID eval harness and the z-order clustering audit
    "lang_id_eval",
    "zorder_layout",
    # the corpus datasheet as one query
    "data_card",
    # forecast backtest over state histories (trend vs naive)
    "flux_series_backtest",
    # weighted sampling without replacement, batch + streaming reservoir
    "wor_sample",
    "stream_wor_sample",
    # labeled-embedding Fisher separation and the cross-modal agreement screen
    "embed_class_separation",
    "embed_text_consistency",
    # dedup threshold tuning, seasonality profile, OOD screen, per-group WOR
    "dedup_threshold_sweep",
    "event_seasonality",
    "embed_outliers",
    "wor_sample_stratified",
    # token-budget planning curve and the streaming anomaly watchlist
    "token_budget_curve",
    "stream_embed_outliers",
    # MinHash-LSH S-curve: analytic vs empirical per Jaccard band
    "dedup_lsh_tuning",
    # MinHash estimator quality and the temperature-mix budget sweep
    "dedup_minhash_estimator",
    "temperature_budget_sweep",
    # streaming fluency scoring vs a frozen model (stream-static join)
    "stream_lm_score",
    # order-invariant dataset fingerprint (same-data check)
    "corpus_fingerprint",
    # Poisson-bootstrap CI on per-source keep rates
    "quality_keep_bootstrap",
    # state fingerprint (replica verification) + its streaming corpus twin
    "flux_state_fingerprint",
    "stream_corpus_fingerprint",
    # round-12 addition: the threshold-tuning table priced from the LSH
    # candidate path (the at-scale form of dedup_threshold_sweep)
    "dedup_threshold_sweep_lsh",
    # pairwise corpus diversity without pairs + the Zipf/tokenizer audit
    "corpus_self_overlap",
    "token_freq_spectrum",
    # ANN index skew audit and ingest-time decontamination
    "ivf_balance_audit",
    "stream_decontaminate",
    # packing fragmentation audit and the topic-x-quality matrix
    "packing_fragmentation",
    "cluster_quality_matrix",
    # margin-normalized alignment mining (bitext criterion)
    "embed_margin_pairs",
    # standing seasonality counters and the cluster chaining audit
    "stream_seasonality",
    "dedup_chaining_audit",
    # crawl-health curves: quality drift and content novelty by decile
    "corpus_drift_curve",
    "novelty_trend",
    # rule-ablation table and the standing spectrum / IVF-balance audits
    "quality_rules_ablation",
    "stream_token_spectrum",
    "stream_ivf_balance",
    # round-13 additions: write-path audits, packing budget sweep, LSH
    # bucket skew, and the two ANN tuning ladders
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
    # round-14 additions
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
]


# Queries per SparkSession. The round-9 run (85 queries, 5 streaming
# lifecycles, several store ingests in ONE session) showed ~1.3-1.5x
# uniform drag on untouched cheap queries vs round 8 — session-lifetime
# accumulation (block-manager storage from localCheckpoints, streaming
# state, shuffle dirs, heap pressure), not plan regressions.  Chunked
# sessions bound that accumulation: each chunk gets a fresh context (the
# per-chunk ~15s startup + sf0.001 plan warm-up happens OUTSIDE timing),
# while on-disk state that legitimately amortizes (ingested changelog
# stores, frozen model sidecars) survives across chunks via
# _MAT_STORE_CACHE's filesystem paths.
CHUNK = 20


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    warm_dir = "/root/testdata/sf0.001"
    times: dict[str, float] = {}
    data_fp: int | None = None
    chunks = [HEADLINE[i : i + CHUNK] for i in range(0, len(HEADLINE), CHUNK)]
    for ci, chunk in enumerate(chunks):
        spark = get_spark(app_name=f"fluxdb_spark_bench_{ci}")
        specs = {s.name: s for s in catalog()}

        # Warm the JVM + parquet footers so per-query numbers measure the
        # query, not session startup.
        specs["flux_checkpoint"].spark(spark, sf_dir).collect()

        if data_fp is None:
            # Stamp the testdata GENERATION into the bench record (the
            # driver regenerates /root/testdata per round, shifting
            # absolute timings ~15%): the engine's own order-invariant
            # corpus fingerprint, outside any timing loop.  Totals are
            # comparable across rounds only when data_fingerprint
            # matches.
            data_fp = next(
                (
                    int(r["fingerprint"])
                    for r in specs["corpus_fingerprint"]
                    .spark(spark, sf_dir)
                    .collect()
                    if r["source"] == "__all__"
                ),
                None,
            )
            if data_fp is None:
                raise RuntimeError(
                    "corpus_fingerprint returned no source='__all__' row; "
                    "cannot stamp data_fingerprint into the bench record"
                )

        # Warm each plan's generated code at the smallest SF: janino/JIT
        # compile of a plan is a per-plan constant (seconds for the big
        # expression trees) that amortizes to zero on a long-running
        # cluster — time steady state.
        for name in chunk:
            try:
                specs[name].spark(spark, warm_dir).count()
            except Exception:
                pass

        for name in chunk:
            fn = specs[name].spark
            best, n = float("inf"), 0
            # min of 2 runs: single-JVM timings carry multi-second
            # GC/scheduling noise; the minimum is the steady-state cost a
            # cluster would see. Cache is cleared per run so operators
            # that persist intermediates pay for them inside their own
            # timing. A query still slow after two runs gets a third:
            # shared-host CPU throttling has produced 10x+ one-off
            # swings, and one more sample usually recovers the steady
            # state.
            for run in range(3):
                if run == 2 and best < 2.0:
                    break
                spark.catalog.clearCache()
                t0 = time.time()
                df = fn(spark, sf_dir)
                n = (
                    df.count()
                    if name != "bench_collect"
                    else len(df.collect())
                )
                best = min(best, time.time() - t0)
                # Drop the py4j reference promptly so the ContextCleaner
                # can release localCheckpoint blocks before the next run.
                del df
                import gc

                gc.collect()
            times[name] = round(best, 3)
            print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)
        spark.stop()

    total = round(sum(times.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Persist the COMPLETE per-query map in-repo (VERDICT r13 task 2): the
    # driver's tail capture truncates the detailed stdout line past ~25
    # queries, so round-over-round per-query regression diffs read this
    # file instead of the driver artifact.
    try:
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
        with open(detail_path, "w") as f:
            json.dump(
                {
                    "metric": "headline_queries_total",
                    "value": total,
                    "unit": "sec",
                    "n_queries": len(times),
                    "queries": times,
                    "sf": sf_val,
                    "data_fingerprint": data_fp,
                },
                f,
                indent=1,
                sort_keys=True,
            )
            f.write("\n")
    except OSError as e:
        print(f"# BENCH_DETAIL.json not written: {e}", file=sys.stderr)
    # Detailed line first (full per-query breakdown for humans / archives),
    # then a short total-only line LAST on stdout: the driver tail-captures
    # a bounded window and the detailed line outgrew it at ~80 queries
    # (BENCH_r09 recorded parsed:null).  The last parseable JSON line is
    # what gets recorded, so the compact one must be final.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_val,
                "data_fingerprint": data_fp,
            }
        )
    )
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "n_queries": len(times),
                "sf": sf_val,
                "data_fingerprint": data_fp,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
