"""BPE trainer/encoder semantics: hand-computed merges on a known corpus,
greedy left-to-right overlap handling, encode/train consistency, and the
map-only encode plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluxdb_spark.functions import bpe


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [(0, "low low lower")], "doc_id long, text string"
    )


class TestTrain:
    def test_hand_computed_merges(self, spark, tiny):
        # freqs: low:2 lower:1.  Pair counts round 1: (l,o)=3 (o,w)=3
        # (w,</w>)=2 (w,e)=1 (e,r)=1 (r,</w>)=1 -> tie broken
        # lexicographically to (l,o); then (lo,w)=3; then (low,</w>)=2.
        got = bpe.train_merges(tiny, n_merges=3)
        assert got == [
            (0, "l", "o", 3),
            (1, "lo", "w", 3),
            (2, "low", "</w>", 2),
        ]

    def test_overlapping_pairs_counted_like_reference(self, spark):
        # 'aaaa' has THREE (a,a) occurrences (zip-adjacent, overlapping),
        # matching the published get_stats; the merge application is
        # greedy leftmost non-overlapping: aaaa -> (aa)(aa)
        docs = spark.createDataFrame(
            [(0, "aaaa")], "doc_id long, text string"
        )
        merges = bpe.train_merges(docs, n_merges=1)
        assert merges == [(0, "a", "a", 3)]
        enc = bpe.encode_documents(docs, merges).collect()[0]
        assert enc.tokens == "aa aa </w>"

    def test_stops_when_no_pairs_remain(self, spark):
        docs = spark.createDataFrame(
            [(0, "ab ab")], "doc_id long, text string"
        )
        # symbols a,b,</w> -> at most 2 productive merges, then the word
        # is a single symbol and the pair relation is empty
        merges = bpe.train_merges(docs, n_merges=10)
        assert len(merges) == 2
        assert merges[0][1:3] == ("a", "b")

    def test_deterministic_rerun(self, spark, tiny):
        assert bpe.train_merges(tiny, 5) == bpe.train_merges(tiny, 5)


class TestEncode:
    def test_tokens_reconstruct_words(self, spark, tiny):
        merges = bpe.train_merges(tiny, n_merges=3)
        row = bpe.encode_documents(tiny, merges).collect()[0]
        # stripping the end-of-word symbol and whitespace reconstructs
        # the original word stream — encoding is lossless segmentation
        rebuilt = row.tokens.replace(" ", "").replace("</w>", " ").strip()
        assert rebuilt == "low low lower"
        assert row.n_tokens == len(row.tokens.split(" "))

    def test_fully_merged_word_is_one_token(self, spark, tiny):
        merges = bpe.train_merges(tiny, n_merges=3)
        docs = spark.createDataFrame(
            [(1, "low")], "doc_id long, text string"
        )
        row = bpe.encode_documents(docs, merges).collect()[0]
        assert row.tokens == "low</w>"
        assert row.n_tokens == 1

    def test_unknown_chars_stay_char_level(self, spark, tiny):
        merges = bpe.train_merges(tiny, n_merges=3)
        docs = spark.createDataFrame(
            [(1, "xyz")], "doc_id long, text string"
        )
        row = bpe.encode_documents(docs, merges).collect()[0]
        assert row.tokens == "x y z </w>"

    def test_encode_plan_is_map_only_until_doc_rebuild(self, spark, tiny):
        merges = bpe.train_merges(tiny, n_merges=3)
        plan = (
            bpe.encode_documents(tiny, merges)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan
        assert "Exchange" in plan  # exactly the per-doc rebuild groupBy
        assert plan.count("Exchange") <= 2  # partial+final agg, no extra shuffle


class TestFertility:
    def test_fertility_reflects_fragmentation(self, spark, tiny):
        from fluxdb_spark.functions import bpe as bpe_mod

        merges = bpe_mod.train_merges(tiny, n_merges=3)
        # 'low' fully merges (1 token/word); an unseen-vocab doc stays
        # char-level (fertility ~ word_len + 1)
        docs = spark.createDataFrame(
            [(0, "the low low and low of low"),  # en markers + known words
             (1, "el xyzq la qzyx los de y que")],  # es markers + unseen
            "doc_id long, text string",
        )
        rows = {
            r.lang: r for r in bpe_mod.fertility_by_language(
                docs, merges
            ).collect()
        }
        assert set(rows) == {"en", "es"}
        assert rows["es"].fertility > rows["en"].fertility
        for r in rows.values():
            assert r.n_tokens >= r.n_words  # >= 1 token per word always

    def test_counts_are_exact(self, spark, tiny):
        from fluxdb_spark.functions import bpe as bpe_mod

        merges = bpe_mod.train_merges(tiny, n_merges=3)
        docs = spark.createDataFrame(
            [(0, "low low")], "doc_id long, text string"
        )
        r = bpe_mod.fertility_by_language(docs, merges).collect()[0]
        # both words merge to the single token low</w>
        assert (r.n_words, r.n_tokens, r.fertility) == (2, 2, 1.0)
