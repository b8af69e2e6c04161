"""Behavioral tests for the round-3 corpus operators: per-group caps,
bigram-LM scoring, chunk-level exact-substring duplication, and vocabulary
heavy hitters. (Oracle parity at sf0.001 is covered for every catalog entry
by test_catalog_parity; these tests pin the SEMANTICS on hand-built inputs
where the right answer is known by construction.)"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fluxdb_spark.functions.curation import cap_per_group
from fluxdb_spark.functions.dedup import chunk_dup_stats
from fluxdb_spark.functions.text import bigram_lm_scores, heavy_hitters


def docs_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, source string",
    )


class TestCapPerGroup:
    def test_cap_bound_and_determinism(self, spark):
        df = docs_df(
            spark,
            [(f"doc {i}", f"src{i % 3}") for i in range(30)],
        )
        capped = cap_per_group(df, "source", 4, key_col="doc_id")
        per_group = (
            capped.groupBy("source").count().collect()
        )
        assert all(r["count"] == 4 for r in per_group)
        assert {r.source for r in per_group} == {"src0", "src1", "src2"}
        # deterministic: same subset on a re-run
        again = cap_per_group(df, "source", 4, key_col="doc_id")
        assert sorted(r.doc_id for r in capped.collect()) == sorted(
            r.doc_id for r in again.collect()
        )

    def test_groups_below_cap_pass_through(self, spark):
        df = docs_df(spark, [("a", "only"), ("b", "only")])
        out = cap_per_group(df, "source", 10, key_col="doc_id")
        assert out.count() == 2
        assert {r.rn for r in out.collect()} == {1, 2}


class TestBigramLM:
    def test_repeated_bigram_scores_higher(self, spark):
        # "a b" appears 3x as a context-'a' bigram; "a c" once. A doc made
        # of the frequent bigram must outscore one with the rare bigram.
        df = docs_df(
            spark,
            [("a b", "s"), ("a b", "s"), ("a b", "s"), ("a c", "s")],
        )
        out = {r.doc_id: r for r in bigram_lm_scores(df).collect()}
        assert out[0].avg_logp == out[1].avg_logp == out[2].avg_logp
        assert out[0].avg_logp > out[3].avg_logp
        # exact MLE values: P(b|a)=3/4, P(c|a)=1/4
        assert math.isclose(out[0].avg_logp, math.log(0.75), abs_tol=1e-4)
        assert math.isclose(out[3].avg_logp, math.log(0.25), abs_tol=1e-4)

    def test_single_token_doc_has_no_bigrams(self, spark):
        df = docs_df(spark, [("solo", "s"), ("a b", "s")])
        out = bigram_lm_scores(df)
        assert {r.doc_id for r in out.collect()} == {1}


class TestChunkDup:
    def test_duplicate_tiles_detected(self, spark):
        tile = " ".join(f"w{i}" for i in range(10))
        unique = " ".join(f"u{i}" for i in range(10))
        df = docs_df(
            spark,
            [
                (tile + " " + unique, "s"),  # doc0: 1 dup tile, 1 unique
                (tile, "s"),  # doc1: its only tile is shared
                ("totally different words here", "s"),  # doc2: clean
            ],
        )
        out = {r.doc_id: r for r in chunk_dup_stats(df).collect()}
        assert out[0].n_chunks == 2 and out[0].n_dup_chunks == 1
        assert out[0].dup_ratio == 0.5
        assert out[1].n_chunks == 1 and out[1].n_dup_chunks == 1
        assert out[2].n_dup_chunks == 0

    def test_intra_doc_repetition_counts(self, spark):
        # the same tile twice WITHIN one doc is corpus-occurrence 2
        tile = " ".join(f"w{i}" for i in range(10))
        df = docs_df(spark, [(tile + " " + tile, "s")])
        out = chunk_dup_stats(df).collect()[0]
        assert out.n_chunks == 2 and out.n_dup_chunks == 2


class TestParagraphDedup:
    """C4-style sub-document dedup (`paragraph_dedup`): duplicated spans
    survive only at their first (doc_id, pos) occurrence; docs rebuild
    from surviving spans in order."""

    def _run(self, spark, texts):
        from fluxdb_spark.functions.dedup import paragraph_dedup

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        return {
            r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
            for r in paragraph_dedup(df).collect()
        }

    def test_boilerplate_dies_corpus_wide(self, spark):
        got = self._run(
            spark,
            [
                "accept cookies. unique alpha text. all rights reserved",
                "accept cookies. unique beta text. all rights reserved",
                "accept cookies. unique gamma text",
            ],
        )
        # doc 0 owns both boilerplate spans (first occurrence)
        assert got[0] == (
            "accept cookies. unique alpha text. all rights reserved", 3, 0,
        )
        assert got[1] == ("unique beta text", 1, 2)
        assert got[2] == ("unique gamma text", 1, 1)

    def test_duplicate_within_one_doc_kept_once(self, spark):
        got = self._run(spark, ["same span. same span. tail"])
        assert got[0] == ("same span. tail", 2, 1)

    def test_fully_boilerplate_doc_survives_empty(self, spark):
        got = self._run(spark, ["only span", "only span"])
        assert got[0] == ("only span", 1, 0)
        assert got[1] == ("", 0, 1)

    def test_span_order_preserved_after_drops(self, spark):
        got = self._run(
            spark,
            ["dup. keep one. dup2. keep two", "dup. dup2"],
        )
        assert got[0][0] == "dup. keep one. dup2. keep two"
        assert got[1] == ("", 0, 2)
    def test_matches_batch_simhash(self, spark):
        """The stateless per-row form must produce bit-identical
        fingerprints to the explode+groupBy batch form on real data."""
        from fluxdb_spark.functions.dedup import simhash, simhash_col

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(200)
        batch = {r.doc_id: r.simhash for r in simhash(docs).collect()}
        streaming_form = {
            r.doc_id: r.fp
            for r in docs.select(
                "doc_id", simhash_col(F.col("text")).alias("fp")
            ).collect()
        }
        assert batch == streaming_form


class TestHeavyHitters:
    def test_rank_counts_and_share(self, spark):
        df = docs_df(spark, [("x x x y y z", "s")])
        out = {r.rank: r for r in heavy_hitters(df, k=2).collect()}
        assert len(out) == 2
        assert out[1].term == "x" and out[1].cnt == 3
        assert out[2].term == "y" and out[2].cnt == 2
        assert out[1].share == 0.5  # 3 of 6 tokens

    def test_tie_broken_by_term(self, spark):
        df = docs_df(spark, [("b a b a", "s")])
        out = heavy_hitters(df, k=2).collect()
        assert [r.term for r in sorted(out, key=lambda r: r.rank)] == [
            "a",
            "b",
        ]


class TestTokenBudgetMix:
    def test_budget_respected_with_spillover(self, spark):
        from fluxdb_spark.functions.curation import token_budget_mix

        # 6 docs of 10 tokens each per source
        rows = [
            (s * 10 + i, " ".join(["w"] * 10), f"s{s}")
            for s in range(2)
            for i in range(6)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        out = token_budget_mix(df, {"s0": 25, "s1": 1}).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.source, []).append(r)
        # s0: docs kept while cum_before < 25 -> 3 docs (0,10,20), 30 tokens
        assert len(by_src["s0"]) == 3
        assert sum(r.n_tok for r in by_src["s0"]) == 30
        # s1: minimum one doc even though budget < doc length
        assert len(by_src["s1"]) == 1

    def test_zero_default_excludes_unlisted_sources(self, spark):
        from fluxdb_spark.functions.curation import token_budget_mix

        df = spark.createDataFrame(
            [(0, "a b c", "s0"), (1, "a b c", "s1")],
            "doc_id long, text string, source string",
        )
        out = token_budget_mix(df, {"s0": 100}).collect()
        assert {r.source for r in out} == {"s0"}

    def test_deterministic_and_nested(self, spark):
        """Raising a budget only ADDS documents (stable ablations)."""
        from fluxdb_spark.functions.curation import token_budget_mix

        rows = [
            (i, " ".join(["w"] * (5 + i % 7)), "s0") for i in range(40)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        small = {r.doc_id for r in token_budget_mix(df, {"s0": 60}).collect()}
        big = {r.doc_id for r in token_budget_mix(df, {"s0": 120}).collect()}
        assert small <= big


class TestCollectionState:
    def test_matches_per_tablet_state_at(self, spark):
        """The one-shuffle whole-collection snapshot must equal the union
        of per-tablet state_at reads at the same height."""
        from fluxdb_spark.operators.temporal import (
            collection_state_at,
            state_at,
        )
        from fluxdb_spark.sources import changelog_from_events, load_table

        sf = "/root/testdata/sf0.001"
        log = changelog_from_events(load_table(spark, sf, "events"))
        h = 700
        whole = {
            (r.tablet_id, r.primary_key): (r.height, r.value)
            for r in collection_state_at(log, h).collect()
        }
        tablets = [
            r.tablet_id for r in log.select("tablet_id").distinct().collect()
        ]
        per_tablet = {}
        for t in tablets:
            for r in state_at(log, t, h).collect():
                per_tablet[(r.tablet_id, r.primary_key)] = (r.height, r.value)
        assert whole == per_tablet

    def test_state_join_matches_per_tablet_join(self, spark):
        """The join-free cross-tablet read must equal two state_at reads
        equi-joined on primary_key, on real corpus data."""
        from fluxdb_spark.operators.temporal import state_at, state_join
        from fluxdb_spark.sources import changelog_from_events, load_table

        sf = "/root/testdata/sf0.001"
        log = changelog_from_events(load_table(spark, sf, "events"))
        h = 700
        joined = {
            r.primary_key: (r.click_height, r.click_value,
                            r.view_height, r.view_value)
            for r in state_join(log, ["click", "view"], h).collect()
        }
        a = {r.primary_key: (r.height, r.value)
             for r in state_at(log, "click", h).collect()}
        b = {r.primary_key: (r.height, r.value)
             for r in state_at(log, "view", h).collect()}
        naive = {
            k: (a[k][0], a[k][1], b[k][0], b[k][1])
            for k in set(a) & set(b)
        }
        assert joined == naive and len(joined) > 0


class TestDocChunking:
    """chunk_documents: the RAG chunking rule — windows every `stride`
    words, generation stops once a window reaches the document end, so no
    window is fully contained in its predecessor."""

    def test_edge_cases_pinned(self, spark):
        from fluxdb_spark.functions.text import chunk_documents

        tiny = spark.createDataFrame(
            [
                (1, " ".join(f"w{i}" for i in range(10))),  # < chunk
                (2, " ".join(f"w{i}" for i in range(32))),  # == chunk
                (3, " ".join(f"w{i}" for i in range(33))),  # chunk + 1
                (4, " ".join(f"w{i}" for i in range(80))),
            ],
            "doc_id long, text string",
        )
        got = sorted(
            (r.doc_id, r.chunk_id, r.chunk_start, r.chunk_len)
            for r in chunk_documents(tiny, 32, 24).collect()
        )
        assert got == [
            (1, 0, 0, 10),   # short doc: one partial chunk
            (2, 0, 0, 32),   # exact fit: the window at 24 would add no
            (3, 0, 0, 32),   # new words for doc 2 but does for doc 3
            (3, 1, 24, 9),
            (4, 0, 0, 32),
            (4, 1, 24, 32),
            (4, 2, 48, 32),  # window at 72 is contained in 48's: dropped
        ]

    def test_overlap_reconstructs_document(self, spark):
        """Concatenating each chunk's non-overlapping tail re-yields the
        original document exactly — the property packers rely on."""
        from fluxdb_spark.functions.text import chunk_documents

        text = " ".join(f"t{i}" for i in range(70))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        chunks = sorted(
            (r.chunk_start, r.chunk_text)
            for r in chunk_documents(df, 32, 24).collect()
        )
        words = []
        for start, ctext in chunks:
            cw = ctext.split(" ")
            words.extend(cw if start == 0 else cw[len(words) - start:])
        assert words == text.split(" ")

    def test_plan_is_map_side_only(self, spark):
        from fluxdb_spark.functions.text import chunk_documents

        df = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id long, text string"
        )
        plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # chunking shuffles nothing


class TestBM25:
    """BM25 semantics on hand-built corpora (oracle parity at sf0.001/0.01
    is covered by test_catalog_parity for `bm25_rank`)."""

    def test_rarer_term_outranks_common_term(self, spark):
        from fluxdb_spark.functions.text import bm25_scores

        # "rare" appears in 1 of 4 docs, "common" in all 4; equal tf and
        # equal doc length -> the rare-term doc must rank first
        d = docs_df(
            spark,
            [
                ("rare alpha beta gamma", "a"),
                ("common alpha beta gamma", "a"),
                ("common delta beta gamma", "a"),
                ("common delta epsilon gamma", "a"),
            ],
        )
        got = bm25_scores(d, ["rare", "common"], k=4).collect()
        assert got[0].doc_id == 0 and got[0].n_terms == 1
        assert all(r.bm25 <= got[0].bm25 for r in got[1:])

    def test_term_saturation_and_length_norm(self, spark):
        from fluxdb_spark.functions.text import bm25_scores

        # doc 0: tf=2 in 4 tokens; doc 1: tf=2 in 8 tokens (longer doc is
        # length-penalized); doc 2: tf=4 but in 16 tokens
        d = docs_df(
            spark,
            [
                ("q q x x", "a"),
                ("q q x x x x x x", "a"),
                ("q q q q " + "x " * 11 + "x", "a"),
            ],
        )
        got = {r.doc_id: r.bm25 for r in bm25_scores(d, ["q"], k=3).collect()}
        # same tf, longer doc -> penalized (0 > 1); doubled tf doesn't
        # double the score and can't outrun the length penalty vs doc 0
        # (saturation: 0 > 2), but beats the same-tf longer doc (2 > 1)
        assert got[0] > got[2] > got[1]

    def test_no_match_no_row_and_k_bound(self, spark):
        from fluxdb_spark.functions.text import bm25_scores

        d = docs_df(spark, [("alpha beta", "a"), ("gamma delta", "a")])
        assert bm25_scores(d, ["zzz"], k=5).count() == 0
        assert bm25_scores(d, ["alpha", "gamma"], k=1).count() == 1


class TestBM25Multi:
    def test_single_query_matches_literal_form(self, spark):
        """The relation form restricted to one query must reproduce the
        literal-IN form's scores exactly."""
        from fluxdb_spark.functions.text import bm25_scores, bm25_scores_multi
        from fluxdb_spark.sources.tables import load_table

        d = load_table(spark, "/root/testdata/sf0.001", "documents")
        lit = {
            (r.doc_id, r.n_terms, r.bm25)
            for r in bm25_scores(d, ["hash", "join", "spark"], 10).collect()
        }
        q = spark.createDataFrame(
            [("q0", "hash"), ("q0", "join"), ("q0", "spark")],
            "query_id string, term string",
        )
        multi = {
            (r.doc_id, r.n_terms, r.bm25)
            for r in bm25_scores_multi(d, q, 10).collect()
        }
        assert lit == multi

    def test_queries_ranked_independently(self, spark):
        from fluxdb_spark.functions.text import bm25_scores_multi

        d = docs_df(
            spark,
            [("alpha alpha beta", "s"), ("gamma gamma beta", "s")],
        )
        q = spark.createDataFrame(
            [("qa", "alpha"), ("qg", "gamma")],
            "query_id string, term string",
        )
        got = {
            (r.query_id, r.doc_id): r.rank
            for r in bm25_scores_multi(d, q, 5).collect()
        }
        # each query only matches its own doc
        assert got == {("qa", 0): 1, ("qg", 1): 1}


class TestPerplexityBuckets:
    def test_tiers_near_balanced_per_language(self, spark):
        """Tier assignment is bucket-tied (every doc in an HDR bucket
        shares its tier), so exact ntile balance is not guaranteed —
        but with the key centered at the per-language best score the
        bucket resolution is ~3% of distance-from-best, so each tier
        must hold roughly a third of its language (the uncentered key
        collapsed whole languages into 2-3 buckets: tier 3 was empty)."""
        from fluxdb_spark.functions.text import perplexity_buckets
        from fluxdb_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        rows = perplexity_buckets(docs).collect()
        by_lang: dict[str, list] = {}
        for r in rows:
            by_lang.setdefault(r.lang, []).append(r)
        assert set(by_lang) == {"en", "es", "fr", "de", "zh"}
        for lang, rs in by_lang.items():
            sizes = [sum(1 for r in rs if r.tier == t) for t in (1, 2, 3)]
            assert sum(sizes) == len(rs), (lang, sizes)  # tiers exhaustive
            ideal = len(rs) / 3
            for t, n in enumerate(sizes, 1):
                assert abs(n - ideal) <= max(3, 0.25 * len(rs)), (
                    lang, t, sizes
                )
            # the most fluent doc of a language sits in tier 1
            best = max(rs, key=lambda r: (r.avg_logp, -r.doc_id))
            assert best.tier == 1

    def test_tier_boundary_is_score_ordered(self, spark):
        """Buckets are order-preserving in the integerized score, so a
        lower tier's WORST score can never beat a higher tier's best."""
        from fluxdb_spark.functions.text import perplexity_buckets
        from fluxdb_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        rows = perplexity_buckets(docs).collect()
        for lang in {"en", "zh"}:
            rs = [r for r in rows if r.lang == lang]
            t1_min = min(r.avg_logp for r in rs if r.tier == 1)
            t3_max = max(r.avg_logp for r in rs if r.tier == 3)
            assert t1_min >= t3_max


class TestCmsSketch:
    def test_estimate_never_underestimates(self, spark):
        from fluxdb_spark.functions.text import cms_heavy_hitters
        from fluxdb_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        rows = cms_heavy_hitters(docs, k=20).collect()
        assert len(rows) == 20
        for r in rows:
            assert r.est >= r.cnt, (r.term, r.cnt, r.est)

    def test_sketch_merges_like_counters(self, spark):
        # the sketch of the whole corpus must equal the element-wise sum
        # of the two half-corpus sketches — the mergeability that lets a
        # 1000-executor job build it with map-side partials
        from fluxdb_spark.functions.text import cms_sketch
        from fluxdb_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        whole = {
            (r.r, r.bucket): r.cnt for r in cms_sketch(docs).collect()
        }
        a = cms_sketch(docs.filter("doc_id % 2 = 0")).collect()
        b = cms_sketch(docs.filter("doc_id % 2 = 1")).collect()
        merged: dict[tuple, int] = {}
        for r in list(a) + list(b):
            merged[(r.r, r.bucket)] = merged.get((r.r, r.bucket), 0) + r.cnt
        assert merged == whole

    def test_absent_term_estimates_from_collisions_only(self, spark):
        from fluxdb_spark.functions.text import cms_estimate, cms_sketch

        docs = spark.createDataFrame(
            [(0, "a b c"), (1, "a b")], "doc_id long, text string"
        )
        sk = cms_sketch(docs, depth=4, width=1024)
        probes = spark.createDataFrame([("zzz-not-present",)], "term string")
        est = cms_estimate(sk, probes, depth=4, width=1024).collect()
        assert est[0].est == 0  # wide sketch, tiny corpus: no collision


class TestBlocklistScreen:
    def test_exact_token_no_substring_and_clean_drop(self, spark):
        from fluxdb_spark.functions.text import blocklist_screen

        docs = spark.createDataFrame(
            [
                (0, "a clean document", "s0"),
                (1, "this one is dup twice dup", "s0"),
                (2, "duplicate is not a hit", "s1"),  # substring, no hit
                (3, "slow at the end slow", "s1"),
            ],
            "doc_id long, text string, source string",
        )
        out = {r.doc_id: r for r in blocklist_screen(docs).collect()}
        assert out[0].blocklist_hits == 0 and not out[0].flagged
        assert out[1].blocklist_hits == 2 and out[1].flagged
        assert out[2].blocklist_hits == 0 and not out[2].flagged
        assert out[3].blocklist_hits == 2 and out[3].flagged
        kept = {
            r.doc_id
            for r in blocklist_screen(docs, keep="clean").collect()
        }
        assert kept == {0, 2}

    def test_custom_blocklist(self, spark):
        from fluxdb_spark.functions.text import blocklist_screen

        docs = spark.createDataFrame(
            [(0, "alpha beta", "s")],
            "doc_id long, text string, source string",
        )
        out = blocklist_screen(docs, blocklist=["beta"]).collect()[0]
        assert out.blocklist_hits == 1 and out.flagged


class TestDuplicatedSpans:
    """Exact-substring span dedup (Lee et al. 2021 shape): hand-built
    corpora with planted repeated substrings, checking span boundaries,
    within-doc repeats, interval merging, and the empty case."""

    def _spans(self, spark, texts):
        from fluxdb_spark.functions.dedup import duplicated_spans

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return sorted(
            tuple(r) for r in duplicated_spans(docs, width=4).collect()
        )

    def test_cross_doc_duplicate_span(self, spark):
        shared = "the quick brown fox jumps over the lazy dog"  # 9 tokens
        rows = self._spans(
            spark,
            [
                f"alpha beta {shared} gamma delta epsilon zeta",
                f"one two three four five {shared} six seven eight",
            ],
        )
        # doc 0: shared tokens at positions 3..11 -> dup starts 3..8,
        # span [3, 8+4-1=11]; doc 1: positions 6..14 -> span [6, 14]
        assert (0, 3, 11, 9, 6) in rows
        assert (1, 6, 14, 9, 6) in rows

    def test_within_doc_repeat_counts(self, spark):
        phrase = "lorem ipsum dolor sit"  # exactly width tokens
        rows = self._spans(
            spark, [f"{phrase} aaa bbb ccc ddd eee fff {phrase}"]
        )
        # the phrase occurs twice in ONE document: both occurrences are
        # duplicated spans (positions 1..4 and 11..14)
        assert rows == [(0, 1, 4, 4, 1), (0, 11, 14, 4, 1)]

    def test_overlapping_hits_merge_to_one_maximal_span(self, spark):
        shared = "a b c d e f g h i j"  # 10 tokens -> 7 dup starts
        rows = self._spans(spark, [f"x {shared} y", f"z w {shared} v"])
        assert len(rows) == 2  # ONE maximal span per doc, not 7
        assert rows[0][3] == 10 and rows[1][3] == 10

    def test_no_duplicates_no_rows(self, spark):
        rows = self._spans(
            spark,
            [
                "completely unique text with no repeats whatsoever here",
                "another entirely different sentence sharing nothing at all",
            ],
        )
        assert rows == []


class TestCutDuplicatedSpans:
    def _cut(self, spark, texts, width=4):
        from fluxdb_spark.functions.dedup import cut_duplicated_spans

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return {
            r.doc_id: (r.clean_text, r.n_tokens, r.n_cut)
            for r in cut_duplicated_spans(docs, width=width).collect()
        }

    def test_shared_span_cut_from_both_docs(self, spark):
        shared = "the quick brown fox jumps"
        got = self._cut(
            spark,
            [f"alpha beta {shared} gamma", f"one two three {shared} four"],
        )
        assert got[0] == ("alpha beta gamma", 8, 5)
        assert got[1] == ("one two three four", 9, 5)

    def test_untouched_doc_round_trips_byte_identical(self, spark):
        texts = [
            "Mixed CASE words survive exactly as written here",
            "totally different other sentence with no shared content",
        ]
        got = self._cut(spark, texts)
        assert got[0] == (texts[0], 8, 0)
        assert got[1] == (texts[1], 8, 0)

    def test_fully_duplicated_doc_cut_to_empty(self, spark):
        t = "a b c d"
        got = self._cut(spark, [t, t])
        assert got[0] == ("", 4, 4)
        assert got[1] == ("", 4, 4)

    def test_case_preserved_around_lowercased_detection(self, spark):
        # detection runs on lowercased shingles; the rebuild must keep
        # the ORIGINAL casing of surviving tokens
        got = self._cut(
            spark,
            ["KEEP Me lorem ipsum dolor sit", "lorem ipsum dolor sit tail"],
        )
        assert got[0][0] == "KEEP Me"
        assert got[1][0] == "tail"


class TestQualityPerceptron:
    def test_converges_to_zero_disagreement(self, spark):
        """In indicator space the Gopher keep-conjunction is linearly
        separable, so the batch perceptron must reach zero disagreement
        with the rule labels within the configured epochs — the learned
        filter reproduces the heuristic it distilled."""
        from fluxdb_spark.functions.text import quality_perceptron
        from fluxdb_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        rows = sorted(
            quality_perceptron(docs).collect(), key=lambda r: r.epoch
        )
        assert rows[0].n_wrong == docs.count()  # zero-weight baseline
        assert rows[-1].n_wrong == 0, [
            (r.epoch, r.n_wrong) for r in rows
        ]
        # once converged, weights freeze (no misclassified -> no update)
        zero_epochs = [r for r in rows if r.n_wrong == 0]
        ws = {(r.w0, r.w1, r.w2, r.w3, r.w4) for r in zero_epochs}
        assert len(ws) == 1

    def test_learned_weights_reproduce_labels(self, spark):
        """Score every document with the final weights and require exact
        agreement with quality_rules' keep decision."""
        from pyspark.sql import functions as F

        from fluxdb_spark.functions.text import (
            perceptron_features,
            quality_perceptron,
        )
        from fluxdb_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        final = sorted(
            quality_perceptron(docs).collect(), key=lambda r: r.epoch
        )[-1]
        w = [final.w0, final.w1, final.w2, final.w3, final.w4]
        feats = perceptron_features(docs)
        score = sum(
            (F.col(f"x{j}") * F.lit(w[j]) for j in range(5)),
            F.lit(0).cast("long"),
        )
        disagree = feats.filter(F.col("y") * score <= 0).count()
        assert disagree == 0


class TestSourceDivergence:
    def test_planted_outlier_source_dominates(self, spark):
        """A source whose vocabulary is saturated with one alien term
        must rank that term first with a contribution far above any
        term of the well-mixed sources."""
        from fluxdb_spark.functions.text import source_divergence

        rows = []
        for i in range(20):
            rows.append((i, "common words shared by every source here", "clean_a"))
            rows.append((100 + i, "common words shared by every source here", "clean_b"))
            rows.append((200 + i, "viagra viagra viagra casino casino spamspam", "spammy"))
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = source_divergence(df).collect()
        spam = [r for r in out if r.source == "spammy" and r.rank == 1]
        assert spam and spam[0].term in {"viagra", "casino", "spamspam"}
        spam_top = spam[0].chi2_contrib
        clean_top = max(
            r.chi2_contrib for r in out if r.source.startswith("clean")
        )
        assert spam_top > 5 * clean_top

    def test_rank_bounds_and_exact_counts(self, spark):
        from fluxdb_spark.functions.text import source_divergence
        from fluxdb_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        out = source_divergence(docs, top_terms=3).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.source, []).append(r)
        for src, rs in by_src.items():
            assert sorted(x.rank for x in rs) == list(range(1, len(rs) + 1))
            assert len(rs) <= 3
            assert all(x.obs <= x.src_n for x in rs)
            # contributions are emitted in rank order
            cs = [x.chi2_contrib for x in sorted(rs, key=lambda x: x.rank)]
            assert cs == sorted(cs, reverse=True)


class TestCollocations:
    def test_matches_python_model(self, spark):
        from collections import Counter

        from fluxdb_spark.functions.text import collocations

        docs = [
            "new york is a big city",
            "new york has new ideas",
            "big city big dreams",
            "york new city",
            "a city so big",
        ] * 3  # replicate so pairs clear min_count
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
        )
        got = [
            (r.w1, r.w2, r.c_ab, r.lift_ppm, r.rank)
            for r in collocations(df, min_count=3, top_k=10).collect()
        ]

        bg = Counter()
        uni = Counter()
        for t in docs:
            ws = t.lower().split(" ")
            uni.update(ws)
            bg.update(zip(ws, ws[1:]))
        nb = sum(bg.values())
        scored = [
            (a, b, c, ((c * 1_000_000) // uni[a] * nb) // uni[b])
            for (a, b), c in bg.items()
            if c >= 3
        ]
        scored.sort(key=lambda r: (-r[3], r[0], r[1]))
        want = [
            (a, b, c, l, i + 1) for i, (a, b, c, l) in enumerate(scored[:10])
        ]
        assert got == want
        # "new york" (3x adjacent) must outrank generic "a city"
        pairs_ranked = [(r[0], r[1]) for r in got]
        assert ("new", "york") in pairs_ranked

    def test_short_docs_yield_no_bigrams(self, spark):
        from fluxdb_spark.functions.text import collocations

        df = spark.createDataFrame(
            [(0, "one"), (1, ""), (2, "two words")], "doc_id long, text string"
        )
        rows = collocations(df, min_count=1, top_k=10).collect()
        assert [(r.w1, r.w2, r.c_ab) for r in rows] == [("two", "words", 1)]


class TestDocKeywords:
    def test_matches_python_model(self, spark):
        from collections import Counter

        from fluxdb_spark.functions.text import doc_keywords

        docs = [
            (0, "apple apple banana cherry"),
            (1, "banana banana banana date"),
            (2, "apple cherry cherry cherry"),
            (3, "date elderberry"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = sorted(
            (r.doc_id, r.term, r.tf, r.score, r.rank)
            for r in doc_keywords(df, top_k=2).collect()
        )

        tf = Counter()
        for i, t in docs:
            tf.update((i, w) for w in t.lower().split(" "))
        dfreq = Counter(term for _, term in tf)
        n = len(docs)
        want = []
        for i, _ in docs:
            terms = [
                (term, c, (c * n) // dfreq[term])
                for (d, term), c in tf.items()
                if d == i
            ]
            terms.sort(key=lambda r: (-r[2], r[0]))
            want += [
                (i, term, c, s, rank + 1)
                for rank, (term, c, s) in enumerate(terms[:2])
            ]
        assert got == sorted(want)
        # the rarest term in a doc dominates its common ones:
        # doc 3's elderberry (df=1) must rank over date (df=2)
        d3 = [r for r in got if r[0] == 3]
        assert d3[0][1] == "date" and [r for r in d3 if r[4] == 1][0][1] == "elderberry"


class TestBasketRules:
    def test_matches_python_model(self, spark):
        from collections import Counter
        from itertools import combinations

        from fluxdb_spark.functions.baskets import basket_rules

        baskets = {
            1: ["bread", "butter", "milk"],
            2: ["bread", "butter"],
            3: ["bread", "butter", "jam"],
            4: ["milk", "jam"],
            5: ["bread", "milk"],
            6: ["bread", "butter"],
        }
        rows = [(bk, i) for bk, items in baskets.items() for i in items]
        df = spark.createDataFrame(rows, "bk long, item string")
        got = [
            (r.antecedent, r.consequent, r.support,
             r.confidence_ppm, r.lift_ppm, r.rank)
            for r in basket_rules(df, "bk", "item",
                                  min_support=2, top_k=10).collect()
        ]

        sup = Counter()
        pair = Counter()
        for items in baskets.values():
            s = sorted(set(items))
            sup.update(s)
            pair.update(combinations(s, 2))
        n = len(baskets)
        rules = []
        for (a, b), s_ab in pair.items():
            if s_ab < 2:
                continue
            for x, y in ((a, b), (b, a)):
                conf = (s_ab * 1_000_000) // sup[x]
                lift = (conf * n) // sup[y]
                rules.append((x, y, s_ab, conf, lift))
        rules.sort(key=lambda r: (-r[4], r[0], r[1]))
        want = [r + (i + 1,) for i, r in enumerate(rules[:10])]
        assert got == want
        # bread->butter: 4/5 confidence; butter->bread: 4/4 = 1.0
        by_pair = {(r[0], r[1]): r for r in got}
        assert by_pair[("butter", "bread")][3] == 1_000_000
        assert by_pair[("bread", "butter")][3] == 800_000


class TestPathRegexMatch:
    def test_hand_built_paths(self, spark):
        from fluxdb_spark.catalog import catalog
        import datetime as dt

        # Build a tiny events table through the entry's own logic by
        # pointing it at a temp parquet dir shaped like the testdata.
        import tempfile, os

        rows = []
        t0 = dt.datetime(2024, 1, 1)
        # user 1: c p  -> matches 'cp', not 's.*p'
        # user 2: s v p -> matches 's.*p'
        # user 3: e e v -> matches 'e{2,}'
        # user 4: v -> matches '^v'
        seqs = {1: "cp", 2: "svp", 3: "eev", 4: "v"}
        names = {"c": "click", "p": "purchase", "s": "signup",
                 "e": "error", "v": "view"}
        eid = 0
        for u, seq in seqs.items():
            for i, ch in enumerate(seq):
                rows.append(
                    (eid, t0 + dt.timedelta(minutes=eid), u,
                     names[ch], 1.0, "{}")
                )
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
        d = tempfile.mkdtemp(prefix="fluxdb-pathre-")
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        spec = {s.name: s for s in catalog()}["path_regex_match"]
        got = {r.pattern: r.matched_users
               for r in spec.spark(spark, d).collect()}
        assert got == {"cp": 1, "s.*p": 1, "e{2,}": 1, "^v": 1}


class TestDataExpectations:
    def test_clean_data_zero_violations_and_planted_fk_break(self, spark):
        import os
        import tempfile

        from fluxdb_spark.catalog import catalog

        spec = {s.name: s for s in catalog()}["data_expectations"]
        rows = {r.rule: (r.violations, r.checked)
                for r in spec.spark(spark, "/root/testdata/sf0.001").collect()}
        assert len(rows) == 5
        assert all(v == 0 for v, _ in rows.values())

        # plant violations: an orphan lineitem, a dup orderkey, qty 99
        d = tempfile.mkdtemp(prefix="fluxdb-expect-")
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        bad_li = li.limit(1).withColumn("l_orderkey", F.lit(-1)).withColumn(
            "l_quantity", F.lit(99.0)
        )
        li.unionByName(bad_li).coalesce(1).write.parquet(
            os.path.join(d, "lineitem.parquet")
        )
        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        o.unionByName(o.limit(1)).coalesce(1).write.parquet(
            os.path.join(d, "orders.parquet")
        )
        got = {r.rule: r.violations for r in spec.spark(spark, d).collect()}
        assert got["lineitem.l_quantity.in_range"] == 1
        assert got["lineitem.l_orderkey.fk_orders"] == 1
        assert got["orders.o_orderkey.unique"] == 1
        assert got["lineitem.l_orderkey.not_null"] == 0


class TestBenfordAudit:
    def test_planted_uniform_digits_deviate(self, spark):
        import os
        import tempfile

        from fluxdb_spark.catalog import catalog

        spec = {s.name: s for s in catalog()}["benford_audit"]
        d = tempfile.mkdtemp(prefix="fluxdb-benford-")
        # uniform first digits 1..9 (anti-Benford): every digit share
        # ~111111 ppm, so digit 1's deviation is large and digit 4's
        # small (benford(4) = 96910)
        import datetime as dt

        rows = [
            (i, i % 9, "O", float(f"{(i % 9) + 1}00.00"),
             dt.datetime(2024, 1, 1), "P")
            for i in range(900)
        ]
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, "
            "o_orderpriority string",
        ).coalesce(1).write.parquet(os.path.join(d, "orders.parquet"))
        got = {r.digit: (r.cnt, r.share_ppm, r.dev_ppm)
               for r in spec.spark(spark, d).collect()}
        assert all(got[dd][0] == 100 for dd in range(1, 10))
        assert all(got[dd][1] == 111111 for dd in range(1, 10))
        # digit 1 under-represented vs Benford, digit 9 over-represented
        assert got[1][2] == 301030 - 111111
        assert got[9][2] == 111111 - 45757
        # real testdata: shares must sum to ~1e6
        real = spec.spark(spark, "/root/testdata/sf0.001").collect()
        assert abs(sum(r.share_ppm for r in real) - 1_000_000) < 10


class TestWeeklyGrowth:
    def test_hand_computed_growth(self, spark):
        import datetime as dt
        import os
        import tempfile

        from fluxdb_spark.catalog import catalog

        spec = {s.name: s for s in catalog()}["weekly_growth"]
        d = tempfile.mkdtemp(prefix="fluxdb-growth-")
        rows = [
            (1, 1, "O", 100.00, dt.datetime(2024, 1, 1), "P"),
            (2, 1, "O", 150.00, dt.datetime(2024, 1, 2), "P"),
            (3, 1, "O", 50.00, dt.datetime(2024, 1, 2), "P"),
            (4, 1, "O", 100.00, dt.datetime(2024, 1, 3), "P"),
        ]
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, "
            "o_orderpriority string",
        ).coalesce(1).write.parquet(os.path.join(d, "orders.parquet"))
        got = {r.day: (r.n_orders, r.revenue_cents, r.prev_cents,
                       r.growth_ppm)
               for r in spec.spark(spark, d).collect()}
        assert got["2024-01-01"] == (1, 10000, None, None)
        # day 2: 20000 cents, +100% = 1_000_000 ppm
        assert got["2024-01-02"] == (2, 20000, 10000, 1_000_000)
        # day 3: 10000 cents, -50% = -500_000 ppm
        assert got["2024-01-03"] == (1, 10000, 20000, -500_000)


class TestTokenBudgetCurve:
    """token_budget_curve semantics: the curve must conserve the scored
    corpus exactly, and the cumulative columns must be the top-down
    running totals a cut decision reads."""

    def test_curve_conserves_scored_corpus(self, spark):
        from pyspark.sql import functions as F

        from fluxdb_spark.catalog import catalog
        from fluxdb_spark.functions import text as tx
        from fluxdb_spark.sources.tables import load_table

        specs = {s.name: s for s in catalog()}
        sf = "/root/testdata/sf0.001"
        rows = sorted(
            specs["token_budget_curve"].spark(spark, sf).collect(),
            key=lambda r: -r.lp_band,
        )
        d = load_table(spark, sf, "documents")
        scored = tx.bigram_lm_scores(d).join(
            d.select(
                "doc_id",
                tx.token_count(F.col("text")).cast("long").alias("toks"),
            ),
            "doc_id",
        )
        n_scored, tok_scored = scored.agg(
            F.count(F.lit(1)), F.sum("toks")
        ).collect()[0]
        # totals: the last (least-fluent) row's cumulative == everything
        assert rows[-1].cum_docs == n_scored
        assert rows[-1].cum_tokens == tok_scored
        # running totals are exact partial sums, top-down
        run_d = run_t = 0
        for r in rows:
            run_d += r.n_docs
            run_t += r.band_tokens
            assert (r.cum_docs, r.cum_tokens) == (run_d, run_t)


class TestCorpusSelfOverlap:
    """corpus_self_overlap semantics on constructed data: the C(df,2)
    fold must equal the brute-force pairwise shared-shingle count."""

    def test_matches_bruteforce_pairwise(self, spark):
        from itertools import combinations

        from fluxdb_spark.functions import dedup as dd

        docs = [
            # source A: three docs, two identical (maximal overlap)
            (0, "a", "the quick brown fox jumps"),
            (1, "a", "the quick brown fox jumps"),
            (2, "a", "an entirely different text here"),
            # source B: two docs sharing exactly one 3-gram
            (3, "b", "one two three four"),
            (4, "b", "zero one two three"),
            # source C: two docs with zero overlap (one too short to
            # shingle at all) — a defined, zero mean
            (5, "c", "lonely document with words"),
            (6, "c", "too short"),
            # source D: a single doc — no pairs, mean undefined
            (7, "d", "only one document lives here"),
        ]
        df = spark.createDataFrame(
            docs, "doc_id long, source string, text string"
        )
        sh = df.select(
            "doc_id",
            "source",
            F.explode(dd.word_shingles(F.col("text"))).alias("s"),
        ).collect()
        by_doc: dict[int, set] = {}
        src_of: dict[int, str] = {}
        for r in sh:
            by_doc.setdefault(r.doc_id, set()).add(r.s)
            src_of[r.doc_id] = r.source
        want_pairs: dict[str, int] = {"a": 0, "b": 0, "c": 0, "d": 0}
        for d1, d2 in combinations(sorted(by_doc), 2):
            if src_of[d1] == src_of[d2]:
                want_pairs[src_of[d1]] += len(by_doc[d1] & by_doc[d2])

        import fluxdb_spark.catalog as cat

        spec = {s.name: s for s in cat.catalog()}["corpus_self_overlap"]
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            df.write.parquet(os.path.join(td, "documents.parquet"))
            got = {
                r.source: r
                for r in spec.spark(spark, td).collect()
            }
        # source a: docs 0,1 identical (3 shingles each) + doc 2 disjoint
        a = got["a"]
        assert a.n_docs == 3
        assert a.n_instances == 9 and a.n_distinct == 6
        # pair_events: C(2,2 shared shingles)=3 shingles with df=2 -> 3
        total_pairs_a = 3 * 2 // 2
        assert want_pairs["a"] == 3
        assert a.mean_pair_overlap_ppm == 3 * 1_000_000 // total_pairs_a
        assert a.dup_ppm == (9 - 6) * 1_000_000 // 9
        # source b: exactly one shared 3-gram across its single pair
        b = got["b"]
        assert want_pairs["b"] == 1
        assert b.mean_pair_overlap_ppm == 1_000_000
        # source c: one pair with zero shared shingles -> mean 0; the
        # short doc contributes no shingles but still counts in n_docs
        c = got["c"]
        assert c.n_docs == 2
        assert c.mean_pair_overlap_ppm == 0
        assert c.dup_ppm == 0
        # source d: a single doc has no pairs -> mean undefined (NULL)
        d = got["d"]
        assert d.n_docs == 1
        assert d.mean_pair_overlap_ppm is None


class TestTokenFreqSpectrum:
    """token_freq_spectrum semantics on constructed data: buckets are
    exact integer log2 of the term frequency and top_mass is the
    coverage of a frequency-floor vocabulary cut."""

    def test_buckets_and_top_mass(self, spark):
        import os
        import tempfile

        import fluxdb_spark.catalog as cat

        # term frequencies: x -> 8 (bucket 3), y -> 4 (bucket 2),
        # z -> 2, w -> 2 (bucket 1), h1/h2 -> 1 (bucket 0, hapax)
        text = " ".join(["x"] * 8 + ["y"] * 4 + ["z", "w"] * 2 + ["h1", "h2"])
        df = spark.createDataFrame(
            [(0, "s", text)], "doc_id long, source string, text string"
        )
        spec = {s.name: s for s in cat.catalog()}["token_freq_spectrum"]
        with tempfile.TemporaryDirectory() as td:
            df.write.parquet(os.path.join(td, "documents.parquet"))
            rows = {r.bucket: r for r in spec.spark(spark, td).collect()}
        assert set(rows) == {0, 1, 2, 3}
        assert (rows[3].n_types, rows[3].occ) == (1, 8)
        assert (rows[2].n_types, rows[2].occ) == (1, 4)
        assert (rows[1].n_types, rows[1].occ) == (2, 4)
        assert (rows[0].n_types, rows[0].occ) == (2, 2)
        total = 18
        # top-down coverage: freq>=8 cut covers 8/18, >=4 covers 12/18, ...
        assert rows[3].top_mass_ppm == 8 * 1_000_000 // total
        assert rows[2].top_mass_ppm == 12 * 1_000_000 // total
        assert rows[1].top_mass_ppm == 16 * 1_000_000 // total
        assert rows[0].top_mass_ppm == 1_000_000
        assert rows[0].occ_share_ppm == 2 * 1_000_000 // total


class TestPackingFragmentation:
    """packing_fragmentation semantics on constructed lengths: crossing
    and tail arithmetic must match a hand-simulated 256-token packer."""

    def test_crossing_and_tail(self, spark):
        import os
        import tempfile

        import fluxdb_spark.catalog as cat

        # shard s: docs of 100, 100, 100 tokens -> doc 2 (prev=200)
        # spans 200..299, crossing the 256 boundary; total 300 ->
        # 2 sequences, tail = 300 % 256 = 44 tokens.
        # shard t: 256 + 256 tokens -> no crossings, tail exactly full.
        rows = [
            (0, "s", " ".join(["w"] * 100)),
            (1, "s", " ".join(["w"] * 100)),
            (2, "s", " ".join(["w"] * 100)),
            (3, "t", " ".join(["w"] * 256)),
            (4, "t", " ".join(["w"] * 256)),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        spec = {s.name: s for s in cat.catalog()}["packing_fragmentation"]
        with tempfile.TemporaryDirectory() as td:
            df.write.parquet(os.path.join(td, "documents.parquet"))
            got = {r.shard: r for r in spec.spark(spark, td).collect()}
        s = got["s"]
        assert (s.n_docs, s.n_tokens, s.n_seqs, s.n_crossing) == (3, 300, 2, 1)
        assert s.crossing_ppm == 333_333
        assert s.tail_fill_ppm == 44 * 1_000_000 // 256
        t = got["t"]
        assert (t.n_docs, t.n_tokens, t.n_seqs, t.n_crossing) == (2, 512, 2, 0)
        assert t.crossing_ppm == 0
        assert t.tail_fill_ppm == 1_000_000


class TestIvfBalanceFinisherK:
    """_ivf_balance_finish computes balance_lift_ppm from its explicit k
    parameter (ADVICE r12: a hardcoded k=8 would silently mis-scale the
    lift for any other quantizer size)."""

    def test_lift_uses_k(self, spark):
        import fluxdb_spark.catalog as cat

        cells = spark.createDataFrame(
            [(0, 10), (1, 30), (2, 20), (3, 40)],
            "cell long, n_vecs long",
        )
        total = 100
        got4 = {r.cell: r for r in cat._ivf_balance_finish(cells, k=4).collect()}
        got8 = {r.cell: r for r in cat._ivf_balance_finish(cells, k=8).collect()}
        for c, n in [(0, 10), (1, 30), (2, 20), (3, 40)]:
            assert got4[c].share_ppm == n * 1_000_000 // total
            assert got4[c].balance_lift_ppm == n * 4 * 1_000_000 // total
            assert got8[c].balance_lift_ppm == n * 8 * 1_000_000 // total
        # worst-probe cumulative: cells ordered by n_vecs desc
        assert got4[3].worst_probe_cum == 40
        assert got4[1].worst_probe_cum == 70
        assert got4[2].worst_probe_cum == 90
        assert got4[0].worst_probe_cum == 100


class TestPackingBudgetSweep:
    """packing_budget_sweep on constructed lengths: crossing and waste
    arithmetic per budget must match a hand-simulated chunker."""

    def test_sweep_arithmetic(self, spark):
        import os
        import tempfile

        import fluxdb_spark.catalog as cat

        # one shard, docs of 100/100/100 tokens (total 300).
        rows = [
            (0, "s", " ".join(["w"] * 100)),
            (1, "s", " ".join(["w"] * 100)),
            (2, "s", " ".join(["w"] * 100)),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        spec = {s.name: s for s in cat.catalog()}["packing_budget_sweep"]
        with tempfile.TemporaryDirectory() as td:
            df.write.parquet(os.path.join(td, "documents.parquet"))
            got = {r.budget: r for r in spec.spark(spark, td).collect()}
        assert set(got) == {64, 128, 256, 512}
        # hand simulation: prev = 0, 100, 200
        expect = {
            64: (5, 3),   # ceil(300/64)=5 seqs; all three docs cross
            128: (3, 2),  # docs 1 and 2 cross
            256: (2, 1),  # doc 2 crosses (the fragmentation-test case)
            512: (1, 0),  # everything fits in one seq
        }
        for b, (n_seqs, n_cross) in expect.items():
            r = got[b]
            assert (r.n_seqs, r.n_crossing) == (n_seqs, n_cross), b
            assert r.n_docs == 3
            assert r.crossing_ppm == n_cross * 1_000_000 // 3
            waste = n_seqs * b - 300
            assert r.waste_ppm == waste * 1_000_000 // (n_seqs * b)
        # the decision-table property: waste falls, crossing rises
        assert got[64].waste_ppm < got[512].waste_ppm
        assert got[64].n_crossing > got[512].n_crossing


class TestPhraseSearch:
    """phrase_search_postings on a constructed corpus: the postings
    adjacency join must count exact phrase occurrences (overlaps
    included) and pick the top phrases deterministically."""

    def test_counts_and_pick(self, spark):
        import os
        import tempfile

        import fluxdb_spark.catalog as cat

        docs = [
            (0, "red fox red fox red"),     # "red fox" x2, "fox red" x2
            (1, "red fox jumps high"),      # "red fox" x1
            (2, "blue sky blue sky"),       # "blue sky" x2, "sky blue" x1
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        spec = {s.name: s for s in cat.catalog()}["phrase_search_postings"]
        with tempfile.TemporaryDirectory() as td:
            df.write.parquet(os.path.join(td, "documents.parquet"))
            got = {
                (r.phrase, r.doc_id): r.n_matches
                for r in spec.spark(spark, td).collect()
            }
        # counts: red fox=3, fox red=2, blue sky=2, sky blue=1, others 1
        # top-3 by (count desc, phrase asc): red fox(3), blue sky(2), fox red(2)
        phrases = {p for p, _d in got}
        assert phrases == {"red fox", "blue sky", "fox red"}
        assert got[("red fox", 0)] == 2
        assert got[("red fox", 1)] == 1
        assert got[("fox red", 0)] == 2
        assert got[("blue sky", 2)] == 2
