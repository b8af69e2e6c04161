"""Scale-credibility probe for the TOP-10 heavy bench entries (round 15).

The sf0.1 bench can no longer measure parallelism — 8 cores beats 32
(BENCH_r14_c8.json: 153.9 s vs 187.0 s) because per-entry times are
dominated by scheduling and driver latency, not data.  This probe grows
the corpus one step past the driver's largest SF (documents AND
embeddings replicated x4 => ~sf0.4, the same deterministic
word-tag-bijection / dimension-nudge growers as audit_scale_probe.py —
constant duplication rate, preserved cluster geometry, no randomness)
and times the heaviest entries there at the CURRENT process's core
count, so that two runs

    SPARK_GRAFT_CPUS=32 python tools/heavy_scale_probe.py
    SPARK_GRAFT_CPUS=8  python tools/heavy_scale_probe.py

give the cores-ratio table that decides which entries genuinely
parallelize at scale (ratio ~> 1.2: CPU-bound, more cores help) and
which are floor-bound machinery (ratio ~ 1).  Prints one JSON line;
the committed table lives in OPTIMIZATION_r15.md.

The grown corpus is rebuilt per run under /tmp and removed afterwards —
nothing persists across bench/oracle invocations.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluxdb_spark import get_spark  # noqa: E402
from fluxdb_spark.catalog import catalog  # noqa: E402
from tools.audit_scale_probe import build_docs, build_vecs  # noqa: E402

ROOT = "/tmp/fluxdb-heavy-scale"
REPLICAS = int(os.environ.get("FLUX_PROBE_REPLICAS", "4"))

# the top of the round-start sf0.1 profile (BENCH_DETAIL.json at the
# r15 baseline), minus the entries whose scale curves the audit probe
# already records (dedup_prefix_filter_audit, embed_pq_distortion)
ENTRIES = [
    "embed_ivfpq_topk",
    "embed_knn_graph_audit",
    "stream_winnow",
    "dedup_chaining_audit",
    "embed_topk_binary_materialized",
    "semantic_dedup",
    "embed_ann_lsh_materialized",
    "bm25_rank_materialized",
    "dedup_cluster_stats",
    "dedup_minhash_k_sweep",
]


def main() -> None:
    spark = get_spark(app_name="heavy_scale_probe")
    cpus = spark.sparkContext.defaultParallelism
    specs = {s.name: s for s in catalog()}
    shutil.rmtree(ROOT, ignore_errors=True)
    sf_dir = os.path.join(ROOT, f"x{REPLICAS}")
    n_docs = build_docs(spark, REPLICAS, sf_dir)
    n_vecs = build_vecs(spark, REPLICAS, sf_dir)
    print(
        f"# grown corpus: {n_docs} docs / {n_vecs} vecs (x{REPLICAS})",
        file=sys.stderr,
    )
    out: dict[str, float] = {}
    for name in ENTRIES:
        spec = specs[name]
        spark.sparkContext.setJobDescription(f"heavy_scale_probe {name}")
        try:
            spec.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # warm the plan + per-generation models
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                spec.spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            out[name] = round(best, 3)
        except Exception as e:  # pragma: no cover - report loudly
            out[name] = -1.0
            print(f"# {name} FAILED: {e}", file=sys.stderr)
        print(f"# {name}: {out.get(name)}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    shutil.rmtree(ROOT, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "heavy_scale_probe",
                "cpus": cpus,
                "replicas": REPLICAS,
                "docs": n_docs,
                "vecs": n_vecs,
                "queries": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
