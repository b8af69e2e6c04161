"""Scale-probe the round-12 audit entries one step past the largest
driver SF: `dedup_threshold_sweep_lsh` (candidate-pair growth) and
`ivf_balance_audit` (cell-occupancy stability).

These two entries exist to answer the 100x question — does the LSH
candidate volume stay bounded, and does IVF cell skew stay flat, as the
corpus grows?  The driver ships at most 5,000 documents / 2,000 vectors
(sf0.1), so this probe builds larger corpora in /tmp the same way
tools/dedup_scale_probe.py does (replicate sf0.1 with a per-replica
perturbation so replicas don't collapse into byte-identical clones) and
records the curves that decide 100 TB behavior:

- LSH sweep: `candidate_pairs` (banded-join output BEFORE verification)
  and `verified_pairs` per corpus size, plus candidates-per-doc.  The
  scale claim is that candidates/doc stays near-constant (the banded
  equi-join prices per-bucket collisions, never the n^2 pair space);
  all-pairs at the same sizes would grow as docs^2.
- IVF balance: `max_share_ppm` / `max_lift_ppm` and the 2-probe worst
  cumulative share per corpus size.  The scale claim is that occupancy
  SHARE is scale-invariant — doubling the corpus doubles every cell,
  so share/lift curves stay flat and probe cost grows linearly with
  corpus, not with skew.
- PQ distortion (round 14): per-subspace floor-mean squared error and
  codebook utilization per corpus size, batch AND drained-streaming.
  The scale claims are (a) the audit is a map-only scan, so wall time
  grows at most linearly while every RATIO holds flat (the nudge
  preserves cluster geometry — doubling the corpus doubles each
  (subspace, codeword) partial), and (b) the streaming twin's drained
  partials finish to the IDENTICAL row set at every size — the
  drain-equals-batch contract measured past the driver SFs.

    python tools/audit_scale_probe.py      # prints one JSON line

Replication realism: documents get a per-replica WORD-TAG BIJECTION
(every word of replica r is prefixed `r<r>x`, so each replica keeps the
original's internal near-dup structure EXACTLY while cross-replica
Jaccard is 0 — the corpus grows at CONSTANT duplication rate; see
build_docs for why a suffix-token perturbation would instead
manufacture a quadratic cross-replica clique); embeddings get one
dimension deterministically nudged per replica (keeps the cluster
geometry, prevents identical-vector collapse).  No randomness anywhere
— the probe is reproducible byte-for-byte.
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
from fluxdb_spark.functions import dedup as dd  # noqa: E402

BASE = "/root/testdata/sf0.1"
ROOT = "/tmp/fluxdb-audit-scale"
DOC_REPLICAS = {"x1": 1, "x3": 3, "x10": 10}
VEC_REPLICAS = {"x1": 1, "x2": 2, "x4": 4, "x8": 8}


def _write_single_file(df, dest_dir: str, name: str) -> None:
    """Write `df` as ONE parquet FILE named like the driver's testdata
    (sf_dir/<table>.parquet as a file, not a directory): the streaming
    twins read with pathGlobFilter on that exact leaf name, so a
    directory layout would silently stream zero rows (that artifact
    produced a false twin-mismatch in the first r14 probe run)."""
    import glob as _glob

    tmp = os.path.join(dest_dir, f"_{name}_tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.replace(part, os.path.join(dest_dir, f"{name}.parquet"))
    shutil.rmtree(tmp)


def build_docs(spark, replicas: int, dest: str) -> int:
    """Replicate the sf0.1 documents with a per-replica WORD-TAG
    bijection: every word of replica r gets the prefix `r<r>x`, so each
    replica keeps the original's internal near-dup structure EXACTLY
    (word mapping is a bijection, shingle equality is preserved) while
    cross-replica Jaccard is 0.  The grown corpus therefore carries a
    CONSTANT duplication rate — the realistic growth model — unlike a
    suffix-token perturbation, which leaves replicas mutual near-dups
    and manufactures a quadratic 10x-clique pair graph (that variant is
    what tools/dedup_scale_probe.py's exactness growers price)."""
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n = docs.count()
    parts = []
    for r in range(replicas):
        text = F.col("text")
        if r > 0:
            text = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(F.lit(f"r{r}x"), w),
                ),
                " ",
            )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * n)).alias("doc_id"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
                text.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    os.makedirs(dest, exist_ok=True)
    _write_single_file(out, dest, "documents")
    return n * replicas


def build_vecs(spark, replicas: int, dest: str) -> int:
    vecs = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n = vecs.count()
    parts = []
    for r in range(replicas):
        emb = F.col("embedding")
        if r > 0:
            # nudge dimension (r % dim) by a small deterministic offset:
            # cluster geometry survives, byte-identity doesn't.
            dim_idx = r % 64
            # keep element type float32: a double literal would upcast
            # the array and break the cross-replica unionByName
            emb = F.transform(
                emb,
                lambda x, i: F.when(
                    i == F.lit(dim_idx),
                    x + F.lit(0.001 * r).cast("float"),
                ).otherwise(x),
            )
        parts.append(
            vecs.select(
                (F.col("vec_id") + F.lit(r * n)).alias("vec_id"),
                *[
                    c
                    for c in vecs.columns
                    if c not in ("vec_id", "embedding")
                ],
                emb.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    os.makedirs(dest, exist_ok=True)
    _write_single_file(out, dest, "embeddings")
    return n * replicas


def main() -> None:
    spark = get_spark(app_name="audit_scale_probe")
    specs = {s.name: s for s in catalog()}
    shutil.rmtree(ROOT, ignore_errors=True)

    lsh: dict[str, dict] = {}
    funnel: dict[str, dict] = {}
    for label, reps in DOC_REPLICAS.items():
        sf_dir = os.path.join(ROOT, f"docs{label}")
        n_docs = build_docs(spark, reps, sf_dir)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_cand = dd.lsh_candidate_pairs(dd.minhash_signatures(docs)).count()
        spec = specs["dedup_threshold_sweep_lsh"]
        spec.spark(spark, sf_dir).count()  # warm the plan
        best, n_rows, verified = float("inf"), 0, 0
        for _ in range(2):
            t0 = time.time()
            rows = spec.spark(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        n_rows = len(rows)
        verified = max(r.surviving_pairs for r in rows) if rows else 0
        lsh[label] = {
            "docs": n_docs,
            "candidate_pairs": n_cand,
            "cand_per_doc_x100": round(100.0 * n_cand / n_docs, 1),
            "allpairs_space": n_docs * (n_docs - 1) // 2,
            "verified_pairs": int(verified),
            "bands_rows": n_rows,
            "sec": round(best, 3),
        }
        print(f"# lsh {label}: {lsh[label]}", file=sys.stderr)

        # PPJoin funnel on the same grown corpus: under a constant
        # duplication rate the naive volume, the admitted candidates,
        # and the verified pairs all grow LINEARLY with the corpus
        # (replica vocabularies are disjoint), so reduction_ppm and
        # candidates-per-doc stay flat — the feasibility invariant the
        # audit exists to certify before a 100x scale-up.
        fspec = specs["dedup_prefix_filter_audit"]
        fspec.spark(spark, sf_dir).count()  # warm the plan
        fbest, frows = float("inf"), []
        for _ in range(2):
            t0 = time.time()
            frows = fspec.spark(spark, sf_dir).collect()
            fbest = min(fbest, time.time() - t0)
        r60 = next(r for r in frows if r.threshold_ppm == 600000)
        funnel[label] = {
            "docs": n_docs,
            "naive_pairs": int(r60.naive_pairs),
            "candidates": int(r60.n_candidates),
            "cand_per_doc_x100": round(
                100.0 * r60.n_candidates / n_docs, 1
            ),
            "reduction_ppm": int(r60.cand_reduction_ppm),
            "verify_yield_ppm": int(r60.verify_yield_ppm),
            "sec": round(fbest, 3),
        }
        print(f"# funnel {label}: {funnel[label]}", file=sys.stderr)

    ivf: dict[str, dict] = {}
    pq: dict[str, dict] = {}
    for label, reps in VEC_REPLICAS.items():
        sf_dir = os.path.join(ROOT, f"vecs{label}")
        n_vecs = build_vecs(spark, reps, sf_dir)
        spec = specs["ivf_balance_audit"]
        spec.spark(spark, sf_dir).count()  # warm (trains + memoizes centroids)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            rows = spec.spark(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        by_cum = sorted(rows, key=lambda r: r.worst_probe_cum)
        two_probe_cum = by_cum[1].worst_probe_cum if len(by_cum) > 1 else 0
        ivf[label] = {
            "vecs": n_vecs,
            "cells": len(rows),
            "max_share_ppm": max(r.share_ppm for r in rows),
            "min_share_ppm": min(r.share_ppm for r in rows),
            "max_lift_ppm": max(r.balance_lift_ppm for r in rows),
            "two_probe_share_ppm": int(
                round(1_000_000.0 * two_probe_cum / n_vecs)
            ),
            "sec": round(best, 3),
        }
        print(f"# ivf {label}: {ivf[label]}", file=sys.stderr)

        # PQ distortion on the same grown corpus (VERDICT r13 task 4):
        # the audit is one map-only scan against plan-literal codebooks,
        # so wall time should grow linearly with vectors while the
        # RATIOS are scale-invariant — the per-replica nudge preserves
        # the cluster geometry, so doubling the corpus doubles every
        # (subspace, codeword) error partial and the floor-mean holds
        # flat.  The streaming twin drains the identical partials
        # through the shared finisher; collecting both and comparing
        # row sets certifies drain-equals-batch PAST sf0.1, not just at
        # the driver SFs.
        pspec = specs["embed_pq_distortion"]
        pspec.spark(spark, sf_dir).count()  # warm (trains + memoizes books)
        pbest, prows = float("inf"), []
        for _ in range(2):
            t0 = time.time()
            prows = pspec.spark(spark, sf_dir).collect()
            pbest = min(pbest, time.time() - t0)
        t0 = time.time()
        srows = specs["stream_pq_distortion"].spark(spark, sf_dir).collect()
        s_sec = time.time() - t0
        key = lambda r: r.subspace  # noqa: E731
        pq[label] = {
            "vecs": n_vecs,
            "mean_sq_err": [
                int(r.mean_sq_err) for r in sorted(prows, key=key)
            ],
            "total_sq_err": int(sum(r.total_sq_err for r in prows)),
            "min_live_codewords": min(
                int(r.n_live_codewords) for r in prows
            ),
            "stream_twin_match": sorted(map(tuple, prows))
            == sorted(map(tuple, srows)),
            "sec": round(pbest, 3),
            "stream_sec": round(s_sec, 3),
        }
        print(f"# pq {label}: {pq[label]}", file=sys.stderr)

    shutil.rmtree(ROOT, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "audit_scale_probe",
                "lsh_sweep": lsh,
                "prefix_funnel": funnel,
                "ivf_balance": ivf,
                "pq_distortion": pq,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
