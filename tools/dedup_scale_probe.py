"""Bound the "price of exactness" curve for the exact-dedup growers
(`dedup_ngram`, `dedup_containment`) one step past the largest driver SF.

The driver ships documents at sf0.001/0.01/0.1 (500/500/5,000 rows); the
scaling sweep in tools/scaling.py stops at sf0.1. This probe builds
sf0.3- and sf1-equivalent corpora in /tmp by replicating the sf0.1
documents table with a per-replica token suffix: each copy keeps the
original's internal near-dup structure (so the candidate-pair workload
grows realistically) while the suffix keeps cross-replica shingle sets
from being byte-identical (replication without perturbation would
manufacture a pathological 10x-clique duplicate graph no real corpus
has). Document ids are offset per replica to stay unique.

    python tools/dedup_scale_probe.py      # prints one JSON line

Interpretation: both operators are exact algorithms whose cost is driven
by the candidate-pair count after prefix/length filtering (PPJoin /
one-sided containment prefix). Growth between 5k -> 15k -> 50k docs
bounds the exponent locally; at corpus scale the documented positioning
holds — LSH (`dedup_minhash_lsh`) is the first pass, these are the exact
verifiers run on LSH's survivors, never on the raw corpus.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fluxdb_spark import get_spark  # noqa: E402
from fluxdb_spark.catalog import catalog  # noqa: E402

# doc_novelty joins the probe in round 11: unlike the pair growers its
# cost is the |distinct shingles| min-groupBy (no pair space), so its
# curve should stay near-linear in docs even as the pair workload blows
# up 1000x -- the probe demonstrates exactly that separation.
OPS = ["dedup_ngram", "dedup_containment", "doc_novelty"]
REPLICAS = {"sf0.1x1": 1, "sf0.1x3": 3, "sf0.1x10": 10}
BASE = "/root/testdata/sf0.1"


def build_corpus(spark, replicas: int, dest: str) -> None:
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n = docs.count()
    parts = []
    for r in range(replicas):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * n)).alias("doc_id"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
                (
                    F.col("text")
                    if r == 0
                    else F.concat(F.col("text"), F.lit(f" replica{r}tok"))
                ).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    os.makedirs(dest, exist_ok=True)
    out.coalesce(max(1, replicas)).write.mode("overwrite").parquet(
        os.path.join(dest, "documents.parquet")
    )


def main() -> None:
    spark = get_spark(app_name="dedup_scale_probe")
    specs = {s.name: s for s in catalog()}
    root = "/tmp/fluxdb-dedup-scale"
    shutil.rmtree(root, ignore_errors=True)
    out: dict[str, dict[str, float]] = {name: {} for name in OPS}
    rows: dict[str, dict[str, int]] = {name: {} for name in OPS}
    for label, reps in REPLICAS.items():
        sf_dir = os.path.join(root, label)
        build_corpus(spark, reps, sf_dir)
        for name in OPS:
            # warm plan once, then best-of-2
            specs[name].spark(spark, sf_dir).count()
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                n = specs[name].spark(spark, sf_dir).count()
                best = min(best, time.time() - t0)
            out[name][label] = round(best, 3)
            rows[name][label] = n
            print(f"# {name} @ {label} ({reps * 5000} docs): "
                  f"{out[name][label]}s, {n} rows", file=sys.stderr)
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"metric": "dedup_scale_probe", "times": out,
                      "rows_out": rows, "docs": {k: v * 5000 for k, v in
                                              REPLICAS.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
