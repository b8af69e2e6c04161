"""Approximate/sketch aggregates — the scale path for distinct counts and
quantiles (exact forms are oracle-checked in `distinct_counts` /
`percentiles`; the approximate forms can't hash-match a different engine, so
their gates are error bounds and the algebraic property that makes them
scale: mergeability across partitions)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from fluxdb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF, "orders").persist()


@pytest.fixture(scope="module")
def lineitem(spark):
    return load_table(spark, SF, "lineitem").persist()


def test_approx_count_distinct_error_bound(orders):
    exact = orders.select("o_custkey").distinct().count()
    approx = orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("a")
    ).first().a
    assert abs(approx - exact) / exact < 0.05


def test_percentile_approx_error_bound(lineitem):
    exact = lineitem.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p")
    ).first().p
    approx = lineitem.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("p")
    ).first().p
    assert abs(approx - exact) / exact < 0.01


def test_hll_sketches_merge_across_partitions(spark, orders):
    """The property that makes sketch counts work on 1000 executors:
    per-partition sketches merge into an estimate equivalent to sketching
    globally. (Not bit-identical: DataSketches HLL tracks sparse/dense modes,
    so the union path can land a register or two apart — bounded, not
    drifting.)"""
    whole = orders.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("n")
    ).first().n
    halves = orders.withColumn(
        "half", (F.col("o_orderkey") % 2).cast("int")
    )
    per_half = halves.groupBy("half").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = per_half.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n")
    ).first().n
    assert abs(merged - whole) / whole < 0.01
    exact = orders.select("o_custkey").distinct().count()
    assert abs(merged - exact) / exact < 0.05


class TestHllDistinct:
    """Our own portable HyperLogLog (text.hll_registers/hll_estimate):
    unlike approx_count_distinct its registers are engine-reproducible,
    so the catalog entry is fully hash-checked; these tests gate the
    properties the hash can't see — accuracy and mergeability."""

    def _docs(self, spark, words):
        return spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)],
            "doc_id long, text string",
        )

    def test_estimate_within_hll_error(self, spark):
        from fluxdb_spark.functions import text as tx

        # 500 distinct tokens: sigma = 1.04/sqrt(256) ~ 6.5%; assert 3x
        words = [f"tok{i}" for i in range(500)]
        est = tx.hll_estimate(
            tx.hll_registers(self._docs(spark, words))
        ).collect()[0]
        assert abs(est.est_distinct - 500) / 500 < 0.20

    def test_registers_merge_by_max(self, spark):
        from fluxdb_spark.functions import text as tx

        a = [f"a{i}" for i in range(200)]
        b = [f"b{i}" for i in range(200)] + a[:50]  # overlap
        ra = tx.hll_registers(self._docs(spark, a))
        rb = tx.hll_registers(self._docs(spark, b))
        merged = (
            ra.unionByName(rb)
            .groupBy("register")
            .agg(F.max("max_rho").alias("max_rho"))
        )
        whole = tx.hll_registers(self._docs(spark, a + b))
        got = sorted(map(tuple, merged.collect()))
        want = sorted(map(tuple, whole.collect()))
        assert got == want  # sketch(A) max-merge sketch(B) == sketch(A u B)

    def test_duplicates_do_not_move_the_estimate(self, spark):
        from fluxdb_spark.functions import text as tx

        words = [f"w{i}" for i in range(100)]
        once = tx.hll_estimate(
            tx.hll_registers(self._docs(spark, words))
        ).collect()[0]
        many = tx.hll_estimate(
            tx.hll_registers(self._docs(spark, words * 10))
        ).collect()[0]
        assert once.est_distinct == many.est_distinct

    def test_register_bounds(self, spark):
        from fluxdb_spark.functions import text as tx

        regs = tx.hll_registers(
            self._docs(spark, [f"x{i}" for i in range(300)])
        ).collect()
        for r in regs:
            assert 0 <= r.register < 256
            assert 1 <= r.max_rho <= 53


class TestHllRollup:
    """Hierarchical rollup: the `__all__` row must equal the sketch of
    the whole corpus — merged from per-group registers, never rescanned."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(
            [(i, t, s) for i, (t, s) in enumerate(rows)],
            "doc_id long, text string, source string",
        )

    def test_all_row_equals_whole_corpus_sketch(self, spark):
        from fluxdb_spark.functions import text as tx

        rows = [(f"a{i} shared{i % 40}", "s1") for i in range(120)] + [
            (f"b{i} shared{i % 40}", "s2") for i in range(80)
        ]
        docs = self._docs(spark, rows)
        out = {r.level: r for r in tx.hll_rollup(docs).collect()}
        assert set(out) == {"s1", "s2", "__all__"}
        whole = tx.hll_estimate(tx.hll_registers(docs)).collect()[0]
        merged = out["__all__"]
        assert merged.harmonic_sum_e52 == whole.harmonic_sum_e52
        assert merged.est_distinct == whole.est_distinct
        # per-group estimates see only their own vocabulary
        assert out["s1"].est_distinct > out["s2"].est_distinct


class TestHdrRollup:
    """Quantile rollup: the `__all__` estimates from summed per-group
    histograms must equal the whole-relation sketch's estimates."""

    def test_merged_quantiles_equal_whole_relation_sketch(self, spark):
        from fluxdb_spark.functions import text as tx

        rows = [(i, (i % 7) * 37 + 1, "s1" if i % 3 else "s2")
                for i in range(400)]
        docs = spark.createDataFrame(
            rows, "doc_id long, n_chars long, source string"
        )
        out = {(r.level, r.p): r.est
               for r in tx.hdr_rollup(docs, ps=(0.5, 0.99)).collect()}
        whole = (
            docs.select(
                F.expr(tx._hdr_idx_expr("n_chars")).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        want = {r.p: r.est
                for r in tx.hdr_quantiles(whole, [0.5, 0.99]).collect()}
        assert out[("__all__", 0.5)] == want[0.5]
        assert out[("__all__", 0.99)] == want[0.99]
        # every (level, p) present
        assert set(out) == {
            (lv, p) for lv in ("s1", "s2", "__all__") for p in (0.5, 0.99)
        }
        # estimates never exceed the true max and are >= 0
        assert all(0 <= v <= 223 for v in out.values())


class TestQualityCalibration:
    def test_band_counts_reconcile_with_rules(self, spark):
        from fluxdb_spark.catalog import catalog
        from fluxdb_spark.functions import text as tx
        from fluxdb_spark.sources.tables import load_table

        sf = "/root/testdata/sf0.001"
        spec = next(s for s in catalog() if s.name == "quality_calibration")
        rows = spec.spark(spark, sf).collect()
        assert all(0 <= r.keep_ppm <= 1_000_000 for r in rows)
        d = load_table(spark, sf, "documents")
        # n_keep summed over bands == rule keeps among docs with >= 2
        # tokens (the LM join drops docs with no bigram)
        lm_docs = tx.bigram_lm_scores(d).count()
        keep_total = (
            d.select(tx.quality_rules(F.col("text"))["keep"].alias("k"))
            .filter("k")
            .count()
        )
        assert sum(r.n_docs for r in rows) == lm_docs
        assert sum(r.n_keep for r in rows) <= keep_total
        # monotone-ish sanity: at least one band must carry keeps
        assert any(r.n_keep > 0 for r in rows)


class TestHdrQuantiles:
    """Base-2 exponential-histogram quantile sketch (text.hdr_buckets /
    hdr_quantiles): relative-error bound and exact mergeability — the
    properties that let it replace exact quantiles at scale."""

    def _docs(self, spark, lens):
        return spark.createDataFrame(
            [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)],
            "doc_id long, text string",
        )

    def test_relative_error_bound(self, spark):
        from fluxdb_spark.functions import text as tx

        lens = [((i * 197) % 997) + 1 for i in range(800)]
        rows = tx.hdr_quantiles_with_exact(
            self._docs(spark, lens), [0.5, 0.9, 0.99]
        ).collect()
        assert len(rows) == 3
        for r in rows:
            # est is the containing bucket's lower bound: est <= exact
            # and within one bucket width (2^-5 relative)
            assert r.est <= r.exact
            assert r.exact <= r.est * (1 + 2 ** -tx.HDR_B) + 1

    def test_small_values_are_exact(self, spark):
        from fluxdb_spark.functions import text as tx

        # every value < 2^(B+1) = 64 maps to its own bucket
        lens = list(range(1, 60)) * 5
        rows = tx.hdr_quantiles_with_exact(
            self._docs(spark, lens), [0.25, 0.5, 0.75]
        ).collect()
        for r in rows:
            assert r.est == r.exact

    def test_buckets_merge_by_sum(self, spark):
        from fluxdb_spark.functions import text as tx

        a = [((i * 31) % 500) + 1 for i in range(300)]
        b = [((i * 17) % 2000) + 1 for i in range(300)]
        sa = tx.hdr_buckets(self._docs(spark, a))
        sb = tx.hdr_buckets(self._docs(spark, b))
        merged = (
            sa.unionByName(sb)
            .groupBy("bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        whole = tx.hdr_buckets(self._docs(spark, a + b))
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_bucket_count_is_bounded(self, spark):
        from fluxdb_spark.functions import text as tx

        lens = [((i * 7919) % 100_000) + 1 for i in range(2000)]
        n_buckets = tx.hdr_buckets(self._docs(spark, lens)).count()
        # 17 octaves x 32 sub-buckets upper bound; far fewer occupied
        assert n_buckets <= 17 * 32


class TestStreamingHll:
    def test_stream_registers_equal_batch_registers(self, spark, tmp_path):
        """The streaming register table (max-merged across micro-batches)
        must equal the batch construction — associativity of the
        register max IS what makes the sketch streaming-legal."""
        from fluxdb_spark.functions import text as tx

        src = str(tmp_path / "src")
        df = spark.createDataFrame(
            [(i, f"u{i % 37}", "a" if i % 2 else "b") for i in range(300)],
            "event_id long, user_id string, event_type string",
        )
        df.repartition(4).write.parquet(src)
        raw = spark.readStream.schema(df.schema).parquet(src)
        reg, rho = tx.hll_register_cols(F.col("user_id"))
        agg = (
            raw.select("event_type", reg.alias("register"), rho.alias("rho"))
            .groupBy("event_type", "register")
            .agg(F.max("rho").alias("max_rho"))
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("hll_stream_test")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(map(tuple, spark.table("hll_stream_test").collect()))
        breg, brho = tx.hll_register_cols(F.col("user_id"))
        want = sorted(
            map(
                tuple,
                df.select(
                    "event_type", breg.alias("register"), brho.alias("rho")
                )
                .groupBy("event_type", "register")
                .agg(F.max("rho").alias("max_rho"))
                .collect(),
            )
        )
        assert got == want

    def test_grouped_estimate_accuracy(self, spark):
        from fluxdb_spark.functions import text as tx

        df = spark.createDataFrame(
            [(f"u{i}", "big") for i in range(400)]
            + [(f"v{i}", "small") for i in range(30)],
            "user_id string, event_type string",
        )
        reg, rho = tx.hll_register_cols(F.col("user_id"))
        regs = (
            df.select("event_type", reg.alias("register"), rho.alias("rho"))
            .groupBy("event_type", "register")
            .agg(F.max("rho").alias("max_rho"))
        )
        est = {
            r.event_type: r.est_distinct
            for r in tx.hll_estimate(regs, ["event_type"]).collect()
        }
        assert abs(est["big"] - 400) / 400 < 0.2
        assert abs(est["small"] - 30) / 30 < 0.2


class TestKmvOverlap:
    """KMV distinct-set algebra: the estimate columns ride beside the
    exact ones in the operator's own output, so accuracy gates read one
    result; hand-built micro cases pin the exact-when-not-full path."""

    def test_estimates_within_bounds_on_events(self, spark):
        from fluxdb_spark.functions.text import KMV_K, kmv_set_overlap
        from fluxdb_spark.sources.tables import load_table

        ev = load_table(spark, SF, "events")
        rows = kmv_set_overlap(ev).collect()
        assert rows, "expected at least one event-type pair"
        for r in rows:
            assert r.k_union <= KMV_K
            assert 0 <= r.matches <= r.k_union
            exact_union = r.exact_a + r.exact_b - r.exact_overlap
            # KMV relative error ~ 1/sqrt(k) ~ 8.8% at k=128; allow 4 sigma
            assert abs(r.est_union - exact_union) <= max(
                8, 0.36 * exact_union
            ), (r.type_a, r.type_b, r.est_union, exact_union)
            assert abs(r.est_intersection - r.exact_overlap) <= max(
                8, 0.5 * max(r.exact_overlap, exact_union / 10)
            ), (r.type_a, r.type_b, r.est_intersection, r.exact_overlap)

    def test_small_sets_are_exact(self, spark):
        """When the union sketch is not full the estimate IS the exact
        union size, and matches counts the true intersection."""
        from fluxdb_spark.functions.text import kmv_set_overlap

        rows_in = [("a", u) for u in range(20)] + [
            ("b", u) for u in range(10, 25)
        ]
        df = spark.createDataFrame(
            rows_in, "event_type string, user_id long"
        )
        (r,) = kmv_set_overlap(df).collect()
        assert (r.type_a, r.type_b) == ("a", "b")
        assert r.k_union == 25 and r.est_union == 25.0
        assert r.matches == 10 == r.exact_overlap
        assert r.est_intersection == 10.0
        assert (r.exact_a, r.exact_b) == (20, 15)

    def test_duplicate_events_do_not_inflate(self, spark):
        from fluxdb_spark.functions.text import kmv_set_overlap

        rows_in = [("a", u) for u in range(5)] * 7 + [("b", 0)] * 3
        df = spark.createDataFrame(
            rows_in, "event_type string, user_id long"
        )
        (r,) = kmv_set_overlap(df).collect()
        assert (r.exact_a, r.exact_b, r.exact_overlap) == (5, 1, 1)
        assert r.k_union == 5 and r.matches == 1

    def test_disjoint_pair_zero_overlap(self, spark):
        from fluxdb_spark.functions.text import kmv_set_overlap

        rows_in = [("a", u) for u in range(8)] + [
            ("b", u) for u in range(100, 108)
        ]
        df = spark.createDataFrame(
            rows_in, "event_type string, user_id long"
        )
        (r,) = kmv_set_overlap(df).collect()
        assert r.matches == 0 and r.exact_overlap == 0
        assert r.est_intersection == 0.0

    def test_deterministic(self, spark):
        from fluxdb_spark.functions.text import kmv_set_overlap
        from fluxdb_spark.sources.tables import load_table

        ev = load_table(spark, SF, "events")
        a = sorted(tuple(r) for r in kmv_set_overlap(ev).collect())
        b = sorted(tuple(r) for r in kmv_set_overlap(ev).collect())
        assert a == b


class TestStreamingKmv:
    def test_multi_batch_sketch_equals_batch_sketch(self, spark, tmp_path):
        """Feed the same rows in TWO micro-batches (maxFilesPerTrigger=1)
        and require the drained GroupState sketch to equal the batch
        window build — the trim-is-lossless property across batches, with
        more than k distinct keys so trimming actually happens."""
        import uuid

        from fluxdb_spark.functions import text as tx
        from fluxdb_spark.streaming.stateful import kmv_stream

        src = str(tmp_path / "src")
        df = spark.createDataFrame(
            [(i, i % 300, "a" if i % 2 else "b") for i in range(600)],
            "event_id long, user_id long, event_type string",
        )
        # two files -> two micro-batches under maxFilesPerTrigger=1
        df.filter(F.col("event_id") < 300).coalesce(1).write.parquet(
            src, mode="append"
        )
        df.filter(F.col("event_id") >= 300).coalesce(1).write.parquet(
            src, mode="append"
        )
        raw = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        name = f"kmv_stream_test_{uuid.uuid4().hex[:8]}"
        q = (
            kmv_stream(raw)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        t = spark.table(name)
        w = Window.partitionBy("g").orderBy(F.desc("ver"))
        got = sorted(
            tuple(r)
            for r in t.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("g", F.posexplode("hs").alias("pos", "h"))
            .select("g", "h", (F.col("pos") + 1).alias("rn"))
            .collect()
        )
        want = sorted(
            tuple(r) for r in tx.kmv_sketches(df).collect()
        )
        assert got == want and len(got) > 0
        # both types exceed k=128 distinct users -> sketches are full
        assert sum(1 for g, _, _ in got if g == "a") == tx.KMV_K
        assert sum(1 for g, _, _ in got if g == "b") == tx.KMV_K


class TestRobustStats:
    def test_winsorized_mean_resists_planted_outliers(self, spark):
        """Plant a handful of absurd outliers among many tame values in
        one group: the raw mean must move far, the winsorized mean must
        stay near the tame mean; an outlier-free group's two means agree
        almost exactly (clamping at p1/p99 touches only the tails)."""
        from fluxdb_spark.catalog import robust_stats as entry_fn  # noqa: F401
        from fluxdb_spark.catalog import catalog

        rows = []
        for i in range(1000):
            rows.append((i, "A", 100.00 + (i % 7)))     # tame: ~100-106
        for i in range(5):
            rows.append((2000 + i, "A", 9_000_000.00))  # absurd outliers
        for i in range(1000):
            rows.append((5000 + i, "N", 50.00 + (i % 3)))
        df = spark.createDataFrame(
            rows, "lid long, l_returnflag string, l_extendedprice double"
        )
        import os
        import tempfile

        d = tempfile.mkdtemp(prefix="robust-")
        df.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
        spec = {s.name: s for s in catalog()}["robust_stats"]
        out = {r.l_returnflag: r for r in spec.spark(spark, d).collect()}
        a = out["A"]
        assert a.mean_raw > 40_000  # outliers wreck the raw mean
        assert 95 < a.mean_winsorized < 115, a
        n = out["N"]
        assert abs(n.mean_raw - n.mean_winsorized) < 2.0, n


class TestCmsJoinSize:
    def test_overestimate_guarantee_and_exactness(self, spark):
        """The CMS inner product can only ADD mass (collisions), so the
        estimate must dominate the exact join size at any width; the
        exact side must equal a real join count."""
        from fluxdb_spark.functions.text import cms_join_size

        a = spark.range(300).select((F.col("id") % 40).alias("k"))
        b = spark.range(200).select((F.col("id") % 25).alias("j"))
        out = {r.method: r.n_rows for r in
               cms_join_size(a, b, "k", "j", width=64).collect()}
        true = a.join(b, a.k == b.j).count()
        assert out["exact"] == true
        assert out["cms_estimate"] >= true
        # a comfortably-wide sketch over few keys is near-exact
        wide = {r.method: r.n_rows for r in
                cms_join_size(a, b, "k", "j", width=4096).collect()}
        assert wide["exact"] == true
        assert true <= wide["cms_estimate"] <= int(true * 1.05)

    def test_disjoint_keys_estimate_small(self, spark):
        from fluxdb_spark.functions.text import cms_join_size

        a = spark.range(100).select(F.col("id").alias("k"))
        b = spark.range(100, 200).select(F.col("id").alias("j"))
        out = {r.method: r.n_rows for r in
               cms_join_size(a, b, "k", "j", width=4096).collect()}
        assert out["exact"] == 0
        # only collision mass remains
        assert out["cms_estimate"] <= 20
