"""Round-14 optimization profiler: per-phase wall timings for the heavy
catalog entries, plus bit-identity checks for restructured trainers.

Usage: python tools/r14_profile.py <what> [sf_dir]
  what: pqbooks | semdedup | matlsh | kcenter
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluxdb_spark import get_spark  # noqa: E402
from fluxdb_spark.functions import similarity as sim  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


class T:
    def __init__(self):
        self.t0 = time.time()
        self.last = self.t0

    def lap(self, label):
        now = time.time()
        print(f"  {label:40s} {now - self.last:7.3f}s", flush=True)
        self.last = now

    def total(self):
        print(f"  {'TOTAL':40s} {time.time() - self.t0:7.3f}s", flush=True)


def load_embeddings(spark, sf_dir):
    from fluxdb_spark.catalog._shared import _t

    return _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def main():
    what = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name=f"r14_profile_{what}")

    if what == "pqbooks":
        e = load_embeddings(spark, sf_dir)
        # bit-identity: fused trainer vs the m independent fits
        t = T()
        fused = sim.pq_codebooks(e, m=4, ks=8, iters=2)
        t.lap("fused _pq_books_fit")
        sub = 64 // 4
        seq = [
            sim.kmeans_centroids(
                e.select(
                    F.col("vec_id"),
                    F.slice(F.col("embedding"), s * sub + 1, sub).alias(
                        "embedding"
                    ),
                ),
                k=8,
                iters=2,
            )
            for s in range(4)
        ]
        t.lap("sequential m x kmeans_centroids")
        assert fused == seq, "fused codebooks differ from sequential!"
        print("  bit-identical: OK")
        t.total()

    elif what == "semdedup":
        from fluxdb_spark.catalog._shared import _planted_twins

        e = load_embeddings(spark, sf_dir)
        corpus = e.unionByName(_planted_twins(e))
        t = T()
        asg = sim.kmeans_clusters(corpus, k=16, iters=2)
        t.lap("kmeans_clusters build (collects)")
        asg.count()
        t.lap("assignment count")
        withv = (
            asg.select("vec_id", "cluster")
            .join(sim.spread(corpus).select("vec_id", "embedding"), "vec_id")
            .localCheckpoint()
        )
        t.lap("withv join + localCheckpoint")
        a = withv.select(
            F.col("vec_id").alias("a_id"), "cluster",
            F.col("embedding").alias("avec"),
        )
        b = withv.select(
            F.col("vec_id").alias("b_id"), "cluster",
            F.col("embedding").alias("bvec"),
        )
        drops = (
            a.join(b, "cluster")
            .filter(F.col("a_id") < F.col("b_id"))
            .filter(sim.cosine(F.col("avec"), F.col("bvec")) >= 0.99)
            .select(F.col("b_id").alias("vec_id"))
            .distinct()
        )
        drops.count()
        t.lap("pair join + cosine + distinct")
        withv.join(drops, "vec_id", "left_anti").select(
            "vec_id", "cluster"
        ).count()
        t.lap("anti join count")
        t.total()

    elif what == "matlsh":
        import tempfile

        from fluxdb_spark.catalog.pipeline import _mat_store_vecs
        from fluxdb_spark.streaming import retrieval as rt

        t = T()
        store = _mat_store_vecs(spark, sf_dir)
        t.lap("open/ingest store")
        qroot = tempfile.mkdtemp(prefix="fluxdb-matq-")
        dest, ck = os.path.join(qroot, "lsh"), os.path.join(qroot, "ck")
        rt.refresh(spark, str(store.root), dest, rt.lsh_bucket_transform(), ck)
        t.lap("rt.refresh (maintainer catch-up)")
        buckets = rt.lww_latest(rt.read_derived(spark, dest), ["vec_id", "tbl"])
        e = load_embeddings(spark, sf_dir)
        out = sim.lsh_topk_from_buckets(
            buckets, e.filter(F.col("vec_id") < 5), k=10
        )
        out.count()
        t.lap("lww + probe query count")
        t.total()

    elif what == "kcenter":
        e = load_embeddings(spark, sf_dir)
        t = T()
        sim.kcenter_sample_refined(e, k=8, m=64).count()
        t.lap("kcenter_sample_refined count")
        sim.kcenter_sample(e, k=8).count()
        t.lap("kcenter_sample count")
        t.total()

    spark.stop()


if __name__ == "__main__":
    main()
