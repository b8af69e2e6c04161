"""Scaling evidence: wall-time of representative operators across the three
driver scale factors (10x input growth per step) on the same local[N]
session. Near-linear growth between sf0.01 and sf0.1 is the local proxy for
the shapes that matter at cluster scale (no superlinear candidate blowup in
the dedup family, no per-query full rescans in the temporal reads).

    python tools/scaling.py            # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluxdb_spark import get_spark  # noqa: E402
from fluxdb_spark.catalog import catalog  # noqa: E402

OPS = [
    "flux_state_at",
    "tpch_q1",
    "tpch_q9",
    "dedup_ngram",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "chunk_dedup",
    "lm_score",
    "text_stats",
    "seq_packing",
    "embed_neardup_lsh",
    "typed_view_protobuf",
    "flux_collection_state",
    "doc_chunking",
    "hash_split",
    "bm25_rank",
    "embed_kmeans",
    "hybrid_rrf",
    "temperature_mix",
    "asof_join_nearest",
    "flux_state_series",
    "flux_time_weighted",
    "bm25_multi",
    "embed_topk_quantized",
    "cluster_balanced_sample",
    "embed_topk_projected",
    "embed_covariance",
    "paragraph_dedup",
    # standing-service variants: each row pays ingest + maintainer
    # catch-up + the materialized-index read, the full cost profile of
    # a standing retrieval deployment
    "dedup_minhash_lsh_materialized",
    "embed_ann_lsh_materialized",
    "embed_kmeans_materialized",
    "bm25_rank_materialized",
    "embed_topk_quantized_materialized",
    "embed_ann_ivf_materialized",
    "neardup_probe_materialized",
    "semantic_dedup",
    "embed_topk_pq",
    "embed_topk_pq_materialized",
    "dsir_select",
    "perplexity_buckets",
    "cms_heavy_hitters",
    "embed_topk_binary",
    "embed_topk_binary_materialized",
    "decontaminate_fuzzy",
    "bpe_train",
    "bpe_encode",
    "hll_distinct",
    "embed_pca_project",
    "hdr_quantiles",
    "bpe_encode_materialized",
    "bpe_fertility",
    "flux_series_similarity",
    "embed_hard_negatives",
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
    # round-10 additions
    "dedup_spans",
    "kmv_set_overlap",
    "stream_kmv_overlap",
    "embed_kcenter_sample",
    "dedup_spans_cut",
    "quality_perceptron",
    "leakage_safe_split",
    "source_divergence",
    "robust_stats",
]

# sweep a subset: SPARK_GRAFT_SCALING_OPS=op1,op2 python tools/scaling.py
_ops_env = os.environ.get("SPARK_GRAFT_SCALING_OPS")
if _ops_env:
    OPS = [o for o in _ops_env.split(",") if o]

SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    spark = get_spark(app_name="fluxdb_spark_scaling")
    specs = {s.name: s for s in catalog()}
    # Warm plans at the smallest SF so JIT/janino constants drop out.
    for name in OPS:
        specs[name].spark(spark, "/root/testdata/sf0.001").count()

    out: dict[str, dict[str, float]] = {}
    for name in OPS:
        out[name] = {}
        for sf in SFS:
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                specs[name].spark(spark, f"/root/testdata/sf{sf}").count()
                best = min(best, time.time() - t0)
            out[name][sf] = round(best, 3)
        r = out[name]
        ratio = r["0.1"] / max(r["0.01"], 1e-9)
        print(
            f"# {name}: {r['0.001']}s / {r['0.01']}s / {r['0.1']}s"
            f"  (10x data -> {ratio:.1f}x time)",
            file=sys.stderr,
        )
    print(json.dumps({"metric": "scaling", "ops": out}))
    spark.stop()


if __name__ == "__main__":
    main()
