"""Dataset-curation operators (functions/curation.py): deterministic
sampling, benchmark decontamination, sequence packing — semantics plus the
scale-critical plan shapes (no shuffle in sampling, broadcast in
decontamination)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluxdb_spark.functions import curation
from fluxdb_spark.functions.curation import (
    decontaminate,
    hash_sample,
    pack_sequences,
    stratified_sample,
)
from fluxdb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").persist()


class TestHashSample:
    def test_deterministic(self, docs):
        a = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 0.3).collect())
        b = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 0.3).collect())
        assert a == b and a  # non-empty and stable

    def test_nested_fractions(self, docs):
        # raising the fraction must only ADD rows (stable ablations)
        small = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2).collect()}
        big = {r.doc_id for r in hash_sample(docs, "doc_id", 0.6).collect()}
        assert small <= big

    def test_salt_changes_sample(self, docs):
        a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3, salt="x").collect()}
        b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3, salt="y").collect()}
        assert a != b

    def test_no_shuffle_in_plan(self, docs):
        plan = hash_sample(docs, "doc_id", 0.3)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure map-side filter


class TestStratifiedSample:
    def test_respects_per_stratum_rates(self, docs):
        out = stratified_sample(
            docs, "lang", {"en": 1.0, "de": 0.0}, key_col="doc_id"
        )
        langs = {r.lang for r in out.collect()}
        n_en = docs.filter(F.col("lang") == "en").count()
        assert langs == {"en"}
        assert out.count() == n_en  # fraction 1.0 keeps every en doc

    def test_nested_across_fraction_change(self, docs):
        lo = {r.doc_id for r in stratified_sample(
            docs, "lang", {"en": 0.2}, key_col="doc_id").collect()}
        hi = {r.doc_id for r in stratified_sample(
            docs, "lang", {"en": 0.7}, key_col="doc_id").collect()}
        assert lo <= hi


class TestDecontaminate:
    def test_flags_exact_overlap(self, spark):
        train = spark.createDataFrame(
            [
                (1, "a b c d e f g h i j"),   # shares 8-gram with bench
                (2, "totally different words with no overlap at all here"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, "x a b c d e f g h y")], "doc_id long, text string"
        )
        got = {r.doc_id: r.n_hits for r in decontaminate(train, bench).collect()}
        # train doc 1 contains 'a b c d e f g h' which bench also contains
        assert got == {1: 1}

    def test_short_docs_never_flagged(self, spark):
        train = spark.createDataFrame(
            [(1, "too short")], "doc_id long, text string"
        )
        bench = spark.createDataFrame(
            [(100, "too short")], "doc_id long, text string"
        )
        assert decontaminate(train, bench).count() == 0

    def test_pool_is_broadcast(self, docs):
        bench = docs.filter(F.col("doc_id") % 10 == 0)
        train = docs.filter(F.col("doc_id") % 10 != 0)
        plan = decontaminate(train, bench)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestPackSequences:
    def test_concat_then_chunk_semantics(self, spark):
        # shard A: docs of 100/100/100 tokens, budget 150:
        #   doc1 prev=0   -> seq 0
        #   doc2 prev=100 -> seq 0 (spillover past 150 allowed)
        #   doc3 prev=200 -> seq 1
        rows = [
            ("A", 1, " ".join(["w"] * 100)),
            ("A", 2, " ".join(["w"] * 100)),
            ("A", 3, " ".join(["w"] * 100)),
            ("B", 4, " ".join(["w"] * 10)),
        ]
        df = spark.createDataFrame(rows, "source string, doc_id long, text string")
        got = {
            (r.shard, r.seq_id): (r.n_docs, r.n_tokens)
            for r in pack_sequences(df, budget=150).collect()
        }
        assert got == {
            ("A", 0): (2, 200),
            ("A", 1): (1, 100),
            ("B", 0): (1, 10),
        }

    def test_total_tokens_conserved(self, docs):
        packed = pack_sequences(docs, budget=256)
        total = packed.agg(F.sum("n_tokens")).first()[0]
        want = docs.select(
            F.size(F.split("text", " ")).alias("n")
        ).agg(F.sum("n")).first()[0]
        assert total == want


class TestHashSplit:
    def test_split_fractions_and_stability(self, spark, docs):
        from pyspark.sql import functions as F

        from fluxdb_spark.functions import curation as cu

        out = cu.hash_split(docs, "doc_id", val_frac=0.1, test_frac=0.1)
        counts = {
            r.split: r.n
            for r in out.groupBy("split")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        total = sum(counts.values())
        assert set(counts) <= {"train", "val", "test"}
        # ~10% each for val/test at 500 docs (hash-uniform, loose bounds)
        assert 0.04 < counts.get("val", 0) / total < 0.18
        assert 0.04 < counts.get("test", 0) / total < 0.18
        # deterministic: same assignment on re-run
        again = {
            (r.doc_id, r.split)
            for r in cu.hash_split(docs, "doc_id", 0.1, 0.1)
            .select("doc_id", "split").collect()
        }
        first = {
            (r.doc_id, r.split)
            for r in out.select("doc_id", "split").collect()
        }
        assert first == again

    def test_growth_stability(self, spark, docs):
        """New docs must never move existing docs between splits: the
        assignment on a subset equals the assignment on the full set."""
        from pyspark.sql import functions as F

        from fluxdb_spark.functions import curation as cu

        full = {
            (r.doc_id, r.split)
            for r in cu.hash_split(docs, "doc_id", 0.1, 0.1)
            .select("doc_id", "split").collect()
        }
        subset = {
            (r.doc_id, r.split)
            for r in cu.hash_split(
                docs.filter(F.col("doc_id") < 100), "doc_id", 0.1, 0.1
            ).select("doc_id", "split").collect()
        }
        assert subset <= full

    def test_no_shuffle_in_plan(self, spark, docs):
        import contextlib
        import io

        from fluxdb_spark.functions import curation as cu

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            cu.hash_split(docs, "doc_id").explain()
        assert "Exchange" not in buf.getvalue()


class TestTemperatureMix:
    """n^tau mixture rebalancing semantics (oracle parity covered by
    test_catalog_parity: `temperature_mix`)."""

    @staticmethod
    def _skewed(spark, head=400, tail=100):
        rows = [(i, "head") for i in range(head)] + [
            (head + i, "tail") for i in range(tail)
        ]
        return spark.createDataFrame(rows, "doc_id long, src string")

    def _shares(self, spark, tau, target=250):
        from fluxdb_spark.functions.curation import temperature_mix

        out = temperature_mix(
            self._skewed(spark), "src", target, tau=tau, key_col="doc_id"
        ).collect()
        head = sum(1 for r in out if r.src == "head")
        return head, len(out) - head

    def test_tau_one_preserves_natural_proportions(self, spark):
        head, tail = self._shares(spark, tau=1.0)
        # natural 4:1 ratio survives (hash-sampling jitter aside)
        assert head / max(tail, 1) > 2.5

    def test_tau_half_flattens_toward_tail(self, spark):
        h1, t1 = self._shares(spark, tau=1.0)
        h5, t5 = self._shares(spark, tau=0.5)
        h0, t0 = self._shares(spark, tau=0.0)
        # monotone: lowering tau shifts share from head to tail
        assert h1 > h5 > h0 and t1 < t5 < t0
        # tau=0 apportions the target EQUALLY per group (125 each); the
        # tail group caps at its own size, the head keeps ~125 of 400
        assert t0 == 100
        assert 100 <= h0 <= 150

    def test_deterministic_and_nested(self, spark):
        from fluxdb_spark.functions.curation import temperature_mix

        d = self._skewed(spark)
        a = {r.doc_id for r in temperature_mix(d, "src", 100, key_col="doc_id").collect()}
        b = {r.doc_id for r in temperature_mix(d, "src", 100, key_col="doc_id").collect()}
        big = {r.doc_id for r in temperature_mix(d, "src", 300, key_col="doc_id").collect()}
        assert a == b
        assert a <= big  # raising the target only ADDS rows


class TestLengthBuckets:
    def test_bucketing_and_batch_numbering(self, spark):
        from fluxdb_spark.functions.curation import length_buckets

        rows = [(i, " ".join(["w"] * n), "s") for i, n in enumerate(
            [5, 20, 20, 40, 40, 40, 200]
        )]
        d = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = {r.doc_id: r for r in length_buckets(d, 2).collect()}
        assert out[0].bucket_lo == 0
        assert out[1].bucket_lo == out[2].bucket_lo == 16
        assert out[3].bucket_lo == 32 and out[6].bucket_lo == 128
        # batches of 2 within the 32-bucket: docs 3,4 -> batch 0; 5 -> 1
        assert (out[3].batch_id, out[3].pos_in_batch) == (0, 0)
        assert (out[4].batch_id, out[4].pos_in_batch) == (0, 1)
        assert (out[5].batch_id, out[5].pos_in_batch) == (1, 0)


class TestEpochShuffle:
    """Deterministic per-epoch shuffle order: pure function of
    (corpus, epoch), epochs decorrelated, no RNG state."""

    def test_deterministic_and_epochs_decorrelate(self, spark):
        from fluxdb_spark.functions.curation import epoch_shuffle

        d = spark.createDataFrame(
            [(i,) for i in range(200)], "doc_id long"
        )
        a = {r.doc_id: (r.epoch1_key, r.epoch2_key)
             for r in epoch_shuffle(d, [1, 2]).collect()}
        b = {r.doc_id: (r.epoch1_key, r.epoch2_key)
             for r in epoch_shuffle(d, [1, 2]).collect()}
        assert a == b  # pure function of (corpus, epoch)
        order1 = sorted(a, key=lambda i: a[i][0])
        order2 = sorted(a, key=lambda i: a[i][1])
        assert order1 != order2  # epochs decorrelate
        assert order1 != sorted(a)  # and neither is the natural order
        # keys are distinct (a total order, no ties to break nondeterministically)
        assert len({v[0] for v in a.values()}) == len(a)

    def test_growth_never_moves_old_rows(self, spark):
        from fluxdb_spark.functions.curation import epoch_shuffle

        d = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
        d2 = spark.createDataFrame([(i,) for i in range(80)], "doc_id long")
        a = {r.doc_id: r.epoch1_key for r in epoch_shuffle(d, [1]).collect()}
        b = {r.doc_id: r.epoch1_key for r in epoch_shuffle(d2, [1]).collect()}
        assert all(b[i] == k for i, k in a.items())


class TestDsirSelect:
    def test_selection_skews_toward_target(self, docs):
        sel = curation.dsir_select(docs, F.col("lang") == "en", n_take=100)
        ids = [r.doc_id for r in sel.collect()]
        langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
        sel_en = sum(1 for i in ids if langs[i] == "en") / len(ids)
        base_en = sum(1 for v in langs.values() if v == "en") / len(langs)
        assert sel_en > base_en * 1.3

    def test_deterministic_exact_integer_weights(self, docs):
        a = sorted(map(tuple, curation.dsir_weights(docs, F.col("lang") == "en").collect()))
        b = sorted(map(tuple, curation.dsir_weights(docs, F.col("lang") == "en").collect()))
        assert a == b
        assert all(isinstance(r[1], int) for r in a)  # w_e6 is exact long

    def test_rank_contiguous_and_bounded(self, docs):
        rows = curation.dsir_select(docs, F.col("lang") == "en", n_take=25).collect()
        assert sorted(r.rank for r in rows) == list(range(1, 26))
        ws = [r.w_e6 for r in sorted(rows, key=lambda r: r.rank)]
        assert ws == sorted(ws, reverse=True)

    def test_target_vocabulary_wins(self, spark):
        # docs 0-3 are the target slice sharing one vocabulary; doc 10 reuses
        # it, doc 11 uses a disjoint one — DSIR must prefer doc 10
        rows = [(i, "alpha beta gamma alpha beta", True) for i in range(4)]
        rows += [(10, "alpha beta gamma", False), (11, "zip zap zup", False)]
        df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
        w = {r.doc_id: r.w_e6 for r in curation.dsir_weights(df, F.col("is_t")).collect()}
        assert w[10] > w[11]


class TestDecontaminateFuzzy:
    def _frames(self, spark):
        base = (
            "the quick brown fox jumps over the lazy dog while seventeen "
            "bright students review the final exam answer key in silence"
        )
        paraphrased = (
            "a quick brown fox jumps over the lazy dog while seventeen "
            "bright students review the final exam answer key in peace"
        )
        train = spark.createDataFrame(
            [
                (1, paraphrased),  # near-dup of bench 100, no shared 8-gram run start
                (2, "completely unrelated prose about glacier hydrology and "
                    "sediment transport in alpine catchment basins measured hourly"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, base)], "doc_id long, text string"
        )
        return train, bench

    def test_flags_paraphrased_near_duplicate(self, spark):
        train, bench = self._frames(spark)
        got = {
            r.doc_id: (r.n_bench_matches, r.max_agree)
            for r in curation.decontaminate_fuzzy(train, bench).collect()
        }
        assert 1 in got and 2 not in got
        n, agree = got[1]
        assert n == 1 and agree >= 4

    def test_exact_duplicate_agrees_fully(self, spark):
        _, bench = self._frames(spark)
        train = bench.withColumn("doc_id", F.lit(7).cast("long"))
        rows = curation.decontaminate_fuzzy(train, bench).collect()
        assert len(rows) == 1 and rows[0].max_agree == 8

    def test_threshold_is_respected(self, spark):
        train, bench = self._frames(spark)
        strict = curation.decontaminate_fuzzy(train, bench, min_agree=8)
        assert strict.count() == 0  # paraphrase agrees on >=4 but not all 8

    def test_bench_side_is_broadcast(self, docs):
        bench = docs.filter(F.col("doc_id") % 10 == 0)
        train = docs.filter(F.col("doc_id") % 10 != 0)
        plan = (
            curation.decontaminate_fuzzy(train, bench)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


class TestPpsSample:
    def test_nested_and_clamped_and_deterministic(self, spark):
        from fluxdb_spark.functions.curation import pps_sample

        rows = [(i, " ".join(["w"] * (5 + i % 20))) for i in range(200)]
        # one giant doc: weight far above W/n -> probability clamps at 1
        rows.append((999, " ".join(["w"] * 100000)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        small = {r.doc_id for r in pps_sample(df, 10).collect()}
        big = {r.doc_id for r in pps_sample(df, 50).collect()}
        assert 999 in small  # clamped inclusion
        assert small <= big  # nested samples
        again = {r.doc_id for r in pps_sample(df, 10).collect()}
        assert small == again  # deterministic

    def test_weight_col_override(self, spark):
        from fluxdb_spark.functions.curation import pps_sample

        df = spark.createDataFrame(
            [(1, "x", 1), (2, "x", 1000000)],
            "doc_id long, text string, prio long",
        )
        out = {r.doc_id: r for r in
               pps_sample(df, 1, weight_col="prio").collect()}
        # doc 2 holds ~all the weight -> clamped in; doc 1 near-zero prob
        assert 2 in out and out[2].weight == 1000000


class TestLeakageSafeSplit:
    def test_no_near_dup_pair_straddles_the_split(self, spark):
        """The property the operator exists for: every near-dup pair's two
        documents carry the same group_key and therefore the same split."""
        from fluxdb_spark.catalog import catalog
        from fluxdb_spark.functions import dedup as dd
        from fluxdb_spark.sources.tables import load_table

        sf = "/root/testdata/sf0.001"
        spec = {s.name: s for s in catalog()}["leakage_safe_split"]
        split = {r.doc_id: (r.group_key, r.split)
                 for r in spec.spark(spark, sf).collect()}
        docs = load_table(spark, sf, "documents")
        pairs = [(r.d1, r.d2)
                 for r in dd.jaccard_pairs(docs, 0.8).collect()]
        assert pairs, "corpus has near-dup pairs by construction"
        for d1, d2 in pairs:
            assert split[d1] == split[d2], (d1, d2, split[d1], split[d2])
        # and a plain per-doc hash_split DOES straddle at least one pair
        # (the leakage this operator prevents is real on this corpus)
        from fluxdb_spark.functions import curation as cu

        plain = {r.doc_id: r.split
                 for r in cu.hash_split(
                     docs.select("doc_id"), "doc_id", 0.1, 0.1
                 ).collect()}
        assert any(plain[d1] != plain[d2] for d1, d2 in pairs)

    def test_every_doc_assigned_and_all_splits_present(self, spark):
        from fluxdb_spark.catalog import catalog

        sf = "/root/testdata/sf0.001"
        spec = {s.name: s for s in catalog()}["leakage_safe_split"]
        rows = spec.spark(spark, sf).collect()
        assert len(rows) == 500
        assert {r.split for r in rows} == {"train", "val", "test"}


class TestKAnonymity:
    def test_generalization_ladder_semantics(self, spark):
        """Coarsening the quasi-identifier can only merge groups, so the
        at-risk row mass is monotone non-increasing up the ladder, and the
        fully-suppressed level is one group holding every row."""
        from fluxdb_spark.catalog import catalog

        sf = "/root/testdata/sf0.001"
        spec = {s.name: s for s in catalog()}["k_anonymity"]
        rows = {r.level: r for r in spec.spark(spark, sf).collect()}
        assert set(rows) == {"nation_segment", "nation", "all"}
        assert (
            rows["nation_segment"].rows_at_risk
            >= rows["nation"].rows_at_risk
            >= rows["all"].rows_at_risk
        )
        total = rows["all"].min_group
        assert rows["all"].n_groups == 1 and rows["all"].rows_at_risk == 0
        assert rows["nation"].n_groups <= rows["nation_segment"].n_groups
        # group counts partition the same row mass at every level
        assert rows["nation_segment"].min_group >= 0 and total > 0


class TestWorSample:
    def test_exactly_k_and_deterministic(self, docs):
        a = curation.wor_sample(docs, 50).collect()
        b = curation.wor_sample(docs, 50).collect()
        assert len(a) == 50
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_nested_across_k(self, docs):
        # a larger draw must CONTAIN the smaller one (priorities are
        # fixed per row, so growing k only extends the prefix)
        small = {r.doc_id for r in curation.wor_sample(docs, 20).collect()}
        big = {r.doc_id for r in curation.wor_sample(docs, 80).collect()}
        assert small <= big

    def test_shard_topk_union_merges_to_global(self, docs):
        # the distributability property: top-k of the union of per-shard
        # top-k draws == the global draw (what makes WOR resumable)
        k = 30
        global_draw = [
            (r.pri_e9, r.doc_id)
            for r in curation.wor_sample(docs, k).collect()
        ]
        shards = [
            curation.wor_sample(
                docs.filter(F.col("doc_id") % 3 == i), k
            ).collect()
            for i in range(3)
        ]
        merged = sorted(
            ((r.pri_e9, r.doc_id) for rows in shards for r in rows),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        assert sorted(global_draw, key=lambda t: (-t[0], t[1])) == merged

    def test_takeordered_plan_no_corpus_shuffle(self, docs):
        plan = (
            curation.wor_sample(docs, 50)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "Exchange" not in plan  # per-partition heaps, no sort

    def test_weight_biases_inclusion(self, docs):
        # heavier docs must be over-represented vs the corpus average:
        # the sampled mean token count exceeds the corpus mean (the
        # whole point of weighted vs uniform draws)
        from fluxdb_spark.functions.text import token_count

        k = 100
        sample_mean = (
            curation.wor_sample(docs, k)
            .agg(F.avg("weight"))
            .collect()[0][0]
        )
        corpus_mean = (
            docs.select(token_count(F.col("text")).alias("w"))
            .agg(F.avg("w"))
            .collect()[0][0]
        )
        assert sample_mean > corpus_mean


class TestWorSampleGrouped:
    def test_exact_quota_per_group(self, docs):
        out = curation.wor_sample_grouped(docs, 3, "lang").collect()
        by_lang: dict[str, int] = {}
        for r in out:
            by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
        n_langs = docs.select("lang").distinct().count()
        assert len(by_lang) == n_langs
        assert all(v == 3 for v in by_lang.values())

    def test_grouped_draw_is_the_groupwise_global_draw(self, docs):
        # each language's quota must equal wor_sample run on that
        # language alone (the per-group key is the global key)
        out = curation.wor_sample_grouped(docs, 4, "lang")
        got = {
            (r.lang, r.doc_id) for r in out.collect()
        }
        want = set()
        for lang in [r.lang for r in docs.select("lang").distinct().collect()]:
            sub = curation.wor_sample(
                docs.filter(F.col("lang") == lang), 4
            )
            want |= {(lang, r.doc_id) for r in sub.collect()}
        assert got == want


class TestWorPriorityGuard:
    def test_nonpositive_weight_nulls_priority(self, spark):
        # ln(u)/0 is -inf: Spark's long cast saturates, DuckDB's refuses
        # — both engines must NULL instead (the ADVICE r10 div class)
        df = spark.createDataFrame(
            [(1, 0), (2, -3), (3, 10)], "doc_id long, w long"
        )
        out = {
            r.doc_id: r.p
            for r in df.select(
                "doc_id",
                curation.wor_priority(F.col("doc_id"), F.col("w")).alias("p"),
            ).collect()
        }
        assert out[1] is None and out[2] is None
        assert out[3] is not None

    def test_sql_twin_agrees_on_guard(self):
        import duckdb

        con = duckdb.connect(":memory:")
        expr = curation.sql_wor_priority("doc_id", "w")
        rows = con.execute(
            f"SELECT doc_id, {expr} AS p FROM (VALUES (1, 0), (2, -3),"
            " (3, 10)) t(doc_id, w) ORDER BY doc_id"
        ).fetchall()
        assert rows[0][1] is None and rows[1][1] is None
        assert rows[2][1] is not None


class TestTemperatureBudgetSweep:
    def test_sweep_equals_materialized_mix(self, spark, docs):
        from fluxdb_spark.catalog import catalog
        from fluxdb_spark.functions.text import token_count

        specs = {s.name: s for s in catalog()}
        sf = "/root/testdata/sf0.001"
        got = {
            r.tau_x100: (r.n_docs, r.n_tokens)
            for r in specs["temperature_budget_sweep"].spark(spark, sf).collect()
        }
        assert set(got) == {0, 50, 100}
        for tau_x100, tau in ((0, 0.0), (50, 0.5), (100, 1.0)):
            kept = curation.temperature_mix(docs, "lang", 200, tau)
            n = kept.count()
            toks = (
                kept.select(token_count(F.col("text")).alias("t"))
                .agg(F.sum("t"))
                .collect()[0][0]
                or 0
            )
            assert got[tau_x100] == (n, toks)


class TestCorpusFingerprint:
    def _run(self, spark, df):
        from fluxdb_spark.functions.hashing import hash60

        per = (
            df.select(
                "source",
                hash60(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("|"),
                        F.col("text"),
                    )
                ).alias("h"),
            )
            .groupBy("source")
            .agg(F.bit_xor("h").cast("long").alias("fp"))
        )
        return {r.source: r.fp for r in per.collect()}

    def test_single_doc_change_flips_only_its_source(self, spark):
        rows = [(i, f"src{i % 2}", f"text {i}") for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        base = self._run(spark, df)
        mutated = spark.createDataFrame(
            [(i, s, t if i != 3 else t + " edited") for i, s, t in rows],
            "doc_id long, source string, text string",
        )
        after = self._run(spark, mutated)
        assert after["src1"] != base["src1"]  # doc 3 lives in src1
        assert after["src0"] == base["src0"]

    def test_order_and_partitioning_invariant(self, spark):
        rows = [(i, f"src{i % 3}", f"doc {i}") for i in range(9)]
        df1 = spark.createDataFrame(rows, "doc_id long, source string, text string")
        df2 = spark.createDataFrame(
            list(reversed(rows)), "doc_id long, source string, text string"
        ).repartition(7)
        assert self._run(spark, df1) == self._run(spark, df2)

    def test_corpus_level_is_merge_of_sources(self, spark):
        from functools import reduce

        from fluxdb_spark.catalog import catalog

        specs = {s.name: s for s in catalog()}
        sf = "/root/testdata/sf0.001"
        rows = {
            r.source: (r.n_docs, r.fingerprint)
            for r in specs["corpus_fingerprint"].spark(spark, sf).collect()
        }
        n_all, fp_all = rows.pop("__all__")
        assert n_all == sum(n for n, _ in rows.values())
        assert fp_all == reduce(
            lambda a, b: a ^ b, (fp for _, fp in rows.values())
        )


class TestKeepBootstrap:
    def test_ci_brackets_point_and_replicates_disperse(self, spark):
        from fluxdb_spark.catalog import catalog

        specs = {s.name: s for s in catalog()}
        sf = "/root/testdata/sf0.001"
        rows = specs["quality_keep_bootstrap"].spark(spark, sf).collect()
        assert rows
        for r in rows:
            # the replicate envelope is ordered and contains its own
            # mean by construction; it USUALLY brackets the point
            # estimate but is not guaranteed to (32 replicates of a
            # small skewed source can all land on one side), so bound
            # the bootstrap mean's distance from the point estimate
            # instead of pinning strict containment
            assert r.boot_lo_ppm <= r.boot_mean_ppm <= r.boot_hi_ppm
            assert abs(r.boot_mean_ppm - r.keep_ppm) <= 300_000
        # with 25-doc sources and a non-degenerate rule, at least one
        # source must show genuine replicate dispersion (lo < hi) —
        # otherwise the bootstrap collapsed to a constant
        assert any(r.boot_lo_ppm < r.boot_hi_ppm for r in rows)
