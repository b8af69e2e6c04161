"""Similarity-search operators: exactness of the brute-force baseline and
recall properties of the approximate (LSH / IVF) scale paths.

The approximate operators can't be oracle-hashed (their bucketing isn't
SQL-reproducible), so this file is their correctness gate: recall@k against
`brute_force_topk` on the driver-generated embeddings table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluxdb_spark.functions import similarity as sim
from fluxdb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
K = 10
N_QUERIES = 8


@pytest.fixture(scope="module")
def corpus(spark):
    return load_table(spark, SF, "embeddings").persist()


@pytest.fixture(scope="module")
def queries(corpus):
    return corpus.filter(F.col("vec_id") < N_QUERIES)


@pytest.fixture(scope="module")
def exact(corpus, queries):
    out = sim.brute_force_topk(corpus, queries, k=K).collect()
    by_q: dict[int, set[int]] = {}
    for r in out:
        by_q.setdefault(r.query_id, set()).add(r.match_id)
    return by_q


def _recall(approx_rows, exact_by_q) -> float:
    by_q: dict[int, set[int]] = {}
    for r in approx_rows:
        by_q.setdefault(r.query_id, set()).add(r.match_id)
    recs = [
        len(by_q.get(q, set()) & hits) / len(hits)
        for q, hits in exact_by_q.items()
    ]
    return sum(recs) / len(recs)


class TestBruteForce:
    def test_topk_is_exact_and_ranked(self, corpus, queries, exact):
        rows = sim.brute_force_topk(corpus, queries, k=K).collect()
        assert len(rows) == N_QUERIES * K
        for q in range(N_QUERIES):
            ranked = sorted(
                (r for r in rows if r.query_id == q), key=lambda r: r.rank
            )
            scores = [r.score for r in ranked]
            assert scores == sorted(scores, reverse=True)
            assert all(r.match_id != q for r in ranked)

    def test_cosine_self_is_one(self, spark):
        df = spark.createDataFrame(
            [([1.0, 2.0, 3.0],)], "v array<double>"
        ).select(sim.cosine(F.col("v"), F.col("v")).alias("c"))
        assert df.first().c == 1.0


class TestLsh:
    def test_recall_vs_brute_force(self, corpus, queries, exact):
        rows = sim.lsh_topk(corpus, queries, k=K).collect()
        assert _recall(rows, exact) >= 0.3  # 8 planes -> 256 buckets on 200 vecs

    def test_scores_are_exact_for_returned_pairs(self, corpus, queries, exact):
        # approximate in WHICH pairs come back, exact in their scores
        bf = {
            (r.query_id, r.match_id): r.score
            for r in sim.brute_force_topk(corpus, queries, k=2000).collect()
        }
        for r in sim.lsh_topk(corpus, queries, k=K).collect():
            assert bf[(r.query_id, r.match_id)] == r.score


class TestIvf:
    def test_recall_vs_brute_force(self, corpus, queries, exact):
        rows = sim.ivf_topk(
            corpus, queries, k=K, n_centroids=8, n_probe=4
        ).collect()
        assert _recall(rows, exact) >= 0.5  # probing half the cells

    def test_full_probe_equals_brute_force(self, corpus, queries, exact):
        # probing EVERY cell must recover the exact answer set
        rows = sim.ivf_topk(
            corpus, queries, k=K, n_centroids=8, n_probe=8
        ).collect()
        assert _recall(rows, exact) == 1.0

    def test_deterministic(self, corpus, queries):
        a = sorted(map(tuple, sim.ivf_topk(corpus, queries, k=K).collect()))
        b = sorted(map(tuple, sim.ivf_topk(corpus, queries, k=K).collect()))
        assert a == b


class TestLshNeardup:
    """Whole-corpus LSH near-dup (no block key): planted near-identical
    twins must all be recovered through bucket collision + exact verify,
    and the candidate generator must be an equi-join, never a cross join."""

    def _with_twins(self, corpus):
        e = corpus.select("vec_id", "embedding")
        twins = e.filter(F.col("vec_id") < 25).select(
            (F.col("vec_id") + 10000).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: x
                * (1 + ((F.col("vec_id") * 31 + i) % 7).cast("double") * 0.002),
            )
            .cast("array<float>")
            .alias("embedding"),
        )
        return e.unionByName(twins)

    def test_recovers_all_planted_pairs(self, corpus):
        out = sim.lsh_neardup_pairs(self._with_twins(corpus), 0.99).collect()
        got = sorted((r.d1, r.d2) for r in out)
        assert got == [(i, i + 10000) for i in range(25)]
        assert all(r.score >= 0.99 for r in out)

    def test_no_cartesian_product(self, corpus):
        plan = sim.lsh_neardup_pairs(
            self._with_twins(corpus), 0.99
        )._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_natural_corpus_has_no_neardups(self, corpus):
        # the synthetic embeddings top out near cosine 0.51: without the
        # planted twins the operator must return nothing at 0.99
        assert (
            sim.lsh_neardup_pairs(
                corpus.select("vec_id", "embedding"), 0.99
            ).count()
            == 0
        )


class TestSemanticDedup:
    """SemDeDup: within-cluster pairwise near-dup removal — planted
    twins die, every natural row survives with its cluster id."""

    def _with_twins(self, corpus, n=10):
        e = corpus.select("vec_id", "embedding")
        twins = (
            e.filter(F.col("vec_id") < n)
            .select(F.col("vec_id").alias("src_id"), "embedding")
            .select(
                (F.col("src_id") + 10000).alias("vec_id"),
                F.transform(
                    F.col("embedding"),
                    lambda x, i: x
                    * (
                        1
                        + ((F.col("src_id") * 31 + i) % 7).cast("double")
                        * 0.002
                    ),
                )
                .cast("array<float>")
                .alias("embedding"),
            )
        )
        return e.unionByName(twins)

    def test_drops_planted_twins_keeps_naturals(self, corpus):
        u = self._with_twins(corpus)
        out = sim.semantic_dedup(u, threshold=0.99, k=4, iters=2)
        ids = {r.vec_id for r in out.collect()}
        n_corpus = corpus.count()
        assert ids == set(range(n_corpus))  # all naturals, no twins

    def test_survivors_keep_kmeans_cluster(self, corpus):
        u = self._with_twins(corpus)
        out = {
            r.vec_id: r.cluster
            for r in sim.semantic_dedup(
                u, threshold=0.99, k=4, iters=2
            ).collect()
        }
        asg = {
            r.vec_id: r.cluster
            for r in sim.kmeans_clusters(u, k=4, iters=2).collect()
        }
        assert all(asg[i] == c for i, c in out.items())

    def test_unreachable_threshold_drops_nothing(self, corpus):
        u = self._with_twins(corpus, n=3)
        out = sim.semantic_dedup(u, threshold=1.01, k=4, iters=2)
        assert out.count() == u.count()


class TestKmeansClusters:
    """Whole-corpus fixed-point k-means (`kmeans_clusters`): semantics on
    hand-built geometry; oracle parity at sf0.001/0.01 is covered by
    test_catalog_parity for `embed_kmeans`."""

    @staticmethod
    def _vecs(spark, rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
            "vec_id long, embedding array<float>",
        )

    def test_separated_groups_recovered(self, spark):
        lo = [[0.01 * i, 0.0] for i in range(4)]
        hi = [[0.9 + 0.01 * i, 0.9] for i in range(4)]
        out = sim.kmeans_clusters(
            self._vecs(spark, lo + hi), k=2, iters=3
        ).collect()
        by_cluster: dict[int, set[int]] = {}
        for r in out:
            by_cluster.setdefault(r.cluster, set()).add(r.vec_id)
        assert sorted(map(sorted, by_cluster.values())) == [
            [0, 1, 2, 3],
            [4, 5, 6, 7],
        ]

    def test_deterministic_rerun(self, corpus):
        a = sorted(map(tuple, sim.kmeans_clusters(corpus, k=3, iters=2).collect()))
        b = sorted(map(tuple, sim.kmeans_clusters(corpus, k=3, iters=2).collect()))
        assert a == b

    def test_empty_cluster_keeps_previous_centroid(self, spark):
        # all points identical -> after iter 1 every point lands in
        # cluster 0 and the other centroid is never updated; the loop
        # must not crash and everyone stays in cluster 0 at dist 0
        out = sim.kmeans_clusters(
            self._vecs(spark, [[0.5, 0.5]] * 5), k=2, iters=3
        ).collect()
        assert {(r.cluster, r.dist) for r in out} == {(0, 0)}

    def test_rejects_zero_iters(self, spark):
        with pytest.raises(ValueError, match="iters >= 1"):
            sim.kmeans_clusters(
                self._vecs(spark, [[0.0, 0.0]] * 4), k=2, iters=0
            )

    def test_rejects_corpus_smaller_than_k(self, spark):
        with pytest.raises(ValueError, match="at least k=5"):
            sim.kmeans_clusters(
                self._vecs(spark, [[0.0, 0.0]] * 3), k=5, iters=1
            )

    def test_assign_to_frozen_centroids_reproduces_clusters(self, corpus):
        # the _kcents4 memo contract: the declared embed_kmeans /
        # cluster_* results are assign_to_centroids against the frozen
        # trained model, which must be bit-identical to running the
        # full Lloyd loop in-entry
        cents = sim.kmeans_centroids(corpus, k=3, iters=2)
        a = sorted(
            map(tuple, sim.assign_to_centroids(corpus, cents).collect())
        )
        b = sorted(
            map(tuple, sim.kmeans_clusters(corpus, k=3, iters=2).collect())
        )
        assert a == b

    def test_probe_scored_subset_equals_per_depth_topk(self, spark):
        # the embed_ann_recall_curve fusion contract: one full-probe
        # scored relation with prank attached, filtered to prank <= p
        # and ranked per query, must be bit-identical to calling
        # ivf_topk_from_assignments(n_probe=p) — probe sets nest
        from pyspark.sql import Window

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        cents = sim.kmeans_centroids(e, k=4, iters=2)
        assignments = sim.assign_to_centroids(
            e, cents, carry=("embedding",)
        ).select("vec_id", "cluster", "embedding")
        q = e.filter(F.col("vec_id") < 3)
        scored = sim.ivf_probe_scored(assignments, cents, q)
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("match_id")
        )
        for p in (1, 2, 4):
            fused = sorted(
                map(
                    tuple,
                    scored.filter(F.col("prank") <= p)
                    .withColumn("rank", F.row_number().over(w))
                    .filter(F.col("rank") <= 5)
                    .select("query_id", "match_id", "score", "rank")
                    .collect(),
                )
            )
            direct = sorted(
                map(
                    tuple,
                    sim.ivf_topk_from_assignments(
                        assignments, cents, q, k=5, n_probe=p
                    ).collect(),
                )
            )
            assert fused == direct, f"n_probe={p}"

    def test_distances_exact_integers(self, spark):
        # two vectors at a known quantized offset: dist must equal the
        # exact integer square (no float residue)
        out = {
            r.vec_id: r.dist
            for r in sim.kmeans_clusters(
                self._vecs(spark, [[0.0, 0.0], [0.25, 0.0]]), k=1, iters=1
            ).collect()
        }
        # centroid after init = vec 0 quantized = [0, 0]; iter-1
        # assignment measures against it: dist(v1) = 250000^2
        assert out[0] == 0 and out[1] == 250_000**2


class TestRrfFuse:
    """Reciprocal-rank fusion semantics on hand-built rankings (oracle
    parity at sf0.001/0.01 covered by test_catalog_parity: `hybrid_rrf`)."""

    @staticmethod
    def _ranking(spark, pairs):
        return spark.createDataFrame(pairs, "doc_id long, rank long")

    def test_doc_in_both_lists_outranks_single_list_winner(self, spark):
        a = self._ranking(spark, [(1, 1), (2, 2), (3, 3)])
        b = self._ranking(spark, [(9, 1), (2, 3), (1, 4)])
        out = sim.rrf_fuse([a, b], k=4).collect()
        # doc 1: 1/61 + 1/64 > doc 9's single 1/61; doc 2: 1/62 + 1/63
        assert out[0].doc_id == 1 and out[0].n_lists == 2
        assert out[1].doc_id == 2
        by_id = {r.doc_id: r for r in out}
        assert by_id[9].n_lists == 1
        assert by_id[1].rrf_score > by_id[9].rrf_score

    def test_k_bound_and_tiebreak(self, spark):
        a = self._ranking(spark, [(5, 1), (4, 1)])  # same rank in two lists
        out = sim.rrf_fuse([a], k=1).collect()
        # equal scores -> lowest doc_id wins the cut
        assert [r.doc_id for r in out] == [4]


class TestQuantizeEmbeddings:
    def test_bounds_error_and_zero_vector(self, spark):
        from fluxdb_spark.functions.similarity import quantize_embeddings

        vecs = spark.createDataFrame(
            [
                (0, [1.0, -0.5, 0.25, 0.0]),
                (1, [0.0, 0.0, 0.0, 0.0]),   # zero vector
                (2, [-2.0, 2.0, 1.0, -1.0]),
            ],
            "vec_id long, embedding array<float>",
        )
        out = {r.vec_id: r for r in quantize_embeddings(vecs).collect()}
        # absmax element hits exactly +/-127; everything in [-127, 127]
        assert out[0].q8 == [127, -63, 31, 0]
        assert all(-127 <= q <= 127 for r in out.values() for q in r.q8)
        assert out[1].q8 == [0, 0, 0, 0] and out[1].scale_e9 == 0
        assert out[2].q8 == [-127, 127, 63, -63]
        # dequantization error bounded by one quantization step
        scale = out[2].scale_e9 / 1e9
        deq = [q * scale for q in out[2].q8]
        for got, want in zip(deq, [-2.0, 2.0, 1.0, -1.0]):
            assert abs(got - want) <= scale + 1e-9


class TestProjectedTopk:
    def test_recall_beats_random_baseline(self, corpus, queries, exact):
        # the sf corpus is near-uniform (tiny top-10 cosine margins), so
        # 64 -> 16 JL distortion legitimately costs most of the exact
        # top-10; the floor asserted is "far above chance" (random top-10
        # of ~500 vectors recalls ~0.02)
        rows = sim.projected_topk(corpus, queries, k=K).collect()
        assert _recall(rows, exact) >= 0.08

    def test_near_duplicates_survive_projection(self, corpus):
        # the actual use case: near-dup retrieval AFTER compression.
        # cosine(v, 1.001*v + eps) ~ 1 dominates the margin, so the twin
        # must be the projected top-1 for every query
        twins = corpus.select(
            (F.col("vec_id") + 100_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x * (1 + ((F.col("vec_id") + i) % 5).cast("double") * 1e-3),
            ).cast("array<float>").alias("embedding"),
        )
        both = corpus.select("vec_id", "embedding").unionByName(twins)
        rows = sim.projected_topk(
            both, corpus.filter(F.col("vec_id") < 10), k=1
        ).collect()
        assert len(rows) == 10
        for r in rows:
            assert r.match_id == r.query_id + 100_000

    def test_deterministic_and_ranked(self, corpus, queries):
        a = sorted(map(tuple, sim.projected_topk(corpus, queries, k=K).collect()))
        b = sorted(map(tuple, sim.projected_topk(corpus, queries, k=K).collect()))
        assert a == b and len(a) == N_QUERIES * K

    def test_projection_matches_manual_dot(self, spark):
        planes = sim._hyperplanes(4, 2, seed=7)
        v = [1.0, -2.0, 0.5, 3.0]
        got = (
            spark.createDataFrame([(v,)], "v array<double>")
            .select(sim.random_projection(F.col("v"), planes).alias("p"))
            .first()
            .p
        )
        for k_ in range(2):
            want = sum(x * w for x, w in zip(v, planes[k_]))
            assert abs(got[k_] - want) < 1e-9


class TestEmbeddingCovariance:
    def test_matches_numpy_on_quantized_values(self, spark):
        import numpy as np

        vecs = [
            [0.1, -0.2, 0.3],
            [0.4, 0.0, -0.1],
            [-0.3, 0.2, 0.25],
            [0.05, 0.15, -0.35],
        ]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        scale = 10_000
        got = {
            (r.i, r.j): r.cov
            for r in sim.embedding_covariance(df, dim=3, scale=scale).collect()
        }
        q = np.floor(
            np.array(vecs, dtype=np.float32).astype(np.float64) * scale
        )
        n = len(vecs)
        want = q.T @ q / n - np.outer(q.mean(axis=0), q.mean(axis=0))
        for i in range(3):
            for j in range(3):
                assert abs(got[(i + 1, j + 1)] - round(want[i, j], 6)) < 1e-6
        # symmetric by construction
        for (i, j), c in got.items():
            assert got[(j, i)] == c


class TestQuantizedTopk:
    def test_recall_vs_float_baseline(self, corpus, queries, exact):
        from fluxdb_spark.functions.similarity import quantized_topk

        rows = quantized_topk(
            corpus, queries.select("vec_id"), k=K
        ).collect()
        # int8 quantization costs little cosine fidelity on 64-dim
        # vectors: top-10 recall vs the float baseline stays high
        assert _recall(rows, exact) >= 0.8
        # exact-integer scoring: re-run is bit-identical
        again = quantized_topk(corpus, queries.select("vec_id"), k=K).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


class TestPqTopk:
    def test_recall_beats_random_baseline(self, corpus, queries, exact):
        # ADC over 4 subspaces x 8 codewords is a coarse 4096-cell grid;
        # on the near-uniform sf corpus it keeps well above the ~0.02
        # random-top-10 floor (same calibration as TestProjectedTopk)
        rows = sim.pq_topk(corpus, queries, m=4, ks=8, iters=2, k=K).collect()
        assert _recall(rows, exact) >= 0.08

    def test_codes_well_formed(self, corpus):
        books = sim.pq_codebooks(corpus, m=4, ks=8, iters=2)
        assert len(books) == 4
        assert all(len(b) == 8 and len(b[0]) == 16 for b in books)
        codes = sim.pq_encode(corpus, books).collect()
        assert len(codes) == corpus.count()
        for r in codes:
            assert len(r.codes) == 4
            assert all(0 <= c < 8 for c in r.codes)

    def test_deterministic_rerun(self, corpus, queries):
        a = sorted(map(tuple, sim.pq_topk(corpus, queries, k=K).collect()))
        b = sorted(map(tuple, sim.pq_topk(corpus, queries, k=K).collect()))
        assert a == b and len(a) == N_QUERIES * K

    def test_adist_is_exact_codeword_distance(self, corpus):
        # ADC distance must equal the integer distance from the quantized
        # query sub-vectors to the match's ASSIGNED codewords, recomputed
        # independently in Python
        books = sim.pq_codebooks(corpus, m=4, ks=8, iters=2)
        codes = {r.vec_id: list(r.codes) for r in sim.pq_encode(corpus, books).collect()}
        import math

        vecs = {
            r.vec_id: [math.floor(float(x) * 1_000_000) for x in r.embedding]
            for r in corpus.select("vec_id", "embedding").collect()
        }
        rows = sim.pq_topk_with_books(
            corpus, corpus.filter(F.col("vec_id") < 3), books, k=5
        ).collect()
        assert rows
        for r in rows:
            q = vecs[r.query_id]
            want = 0
            for s in range(4):
                cw = books[s][codes[r.match_id][s]]
                qs = q[s * 16 : (s + 1) * 16]
                want += sum((a - b) ** 2 for a, b in zip(qs, cw))
            assert r.adist == want


class TestBinaryTopk:
    def test_recall_beats_random_baseline(self, corpus, queries, exact):
        # 1-bit Hamming shortlist (rerank=40 of ~1000) + exact int8
        # rerank; sign-random-projection keeps it far above the ~0.01
        # random-top-10 floor on the sf corpus
        rows = sim.binary_topk(corpus, queries, k=K, rerank=40).collect()
        assert _recall(rows, exact) >= 0.15

    def test_packing_bounds(self, corpus):
        bz = sim.binarize_embeddings(corpus).collect()
        assert len(bz) == corpus.count()
        for r in bz:
            # 32-bit words: never negative, never touch bit 32+
            assert 0 <= r.b0 < (1 << 32) and 0 <= r.b1 < (1 << 32)

    def test_packing_matches_signs(self, corpus):
        row = corpus.orderBy("vec_id").first()
        packed = (
            sim.binarize_embeddings(corpus)
            .filter(F.col("vec_id") == row.vec_id)
            .first()
        )
        want0 = sum(
            1 << j for j in range(32) if float(row.embedding[j]) > 0.0
        )
        want1 = sum(
            1 << j for j in range(32) if float(row.embedding[32 + j]) > 0.0
        )
        assert (packed.b0, packed.b1) == (want0, want1)

    def test_deterministic_rerun(self, corpus, queries):
        a = sorted(map(tuple, sim.binary_topk(corpus, queries, k=K).collect()))
        b = sorted(map(tuple, sim.binary_topk(corpus, queries, k=K).collect()))
        assert a == b and len(a) == N_QUERIES * K

    def test_full_rerank_recovers_quantized_exact(self, corpus, queries):
        # with the shortlist widened to the whole corpus the rerank IS
        # quantized_topk — the Hamming stage only ever bounds candidates
        n = corpus.count()
        via_binary = {
            (r.query_id, r.match_id, r.score)
            for r in sim.binary_topk(corpus, queries, k=5, rerank=n).collect()
        }
        via_quant = {
            (r.query_id, r.match_id, r.score)
            for r in sim.quantized_topk(corpus, queries, k=5).collect()
        }
        assert via_binary == via_quant


class TestPcaProject:
    def test_direction_captures_top_variance(self, corpus):
        import numpy as np

        X = np.array(
            [r.embedding for r in corpus.collect()], dtype=np.float64
        )
        C = np.cov(X.T, bias=True)
        top = float(np.linalg.eigvalsh(C)[-1])
        v = np.array(sim.pca_power_component(corpus), dtype=np.float64)
        v /= np.linalg.norm(v)
        # near-degenerate spectrum: gate the Rayleigh quotient, not the
        # eigenvector angle (any vector in the top eigenspace is right)
        assert float(v @ C @ v) / top >= 0.9

    def test_planted_dominant_direction_recovered(self, spark):
        import numpy as np

        rng = [((i * 37 + j * 11) % 19 - 9) / 40.0 for i in range(200) for j in range(64)]
        base = np.array(rng).reshape(200, 64)
        spike = np.array([(1.0 if j < 8 else 0.0) for j in range(64)])
        X = base + np.outer(
            np.array([(i % 7 - 3) / 1.5 for i in range(200)]), spike
        )
        docs = spark.createDataFrame(
            [(i, [float(x) for x in X[i]]) for i in range(200)],
            "vec_id long, embedding array<float>",
        )
        v = np.array(sim.pca_power_component(docs), dtype=np.float64)
        v /= np.linalg.norm(v)
        want = spike / np.linalg.norm(spike)
        assert abs(float(v @ want)) > 0.95  # strong gap -> fast convergence

    def test_projection_is_centered(self, corpus):
        rows = sim.pca_project(
            corpus, sim.pca_power_component(corpus)
        ).collect()
        assert sum(r.pc1 for r in rows) == 0  # exact integer centering

    def test_deterministic_rerun(self, corpus):
        assert sim.pca_power_component(corpus) == sim.pca_power_component(
            corpus
        )


class TestHardNegatives:
    def test_twin_excluded_true_negatives_kept(self, spark, corpus):
        # plant a twin of vec 0 (cosine ~1 after round); the miner must
        # drop it and return the best non-duplicate neighbors
        twin = corpus.filter(F.col("vec_id") == 0).select(
            (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
        )
        full = corpus.select("vec_id", "embedding").unionByName(twin)
        queries = full.filter(F.col("vec_id") == 0).select("vec_id")
        plain = {
            r.match_id
            for r in sim.quantized_topk(full, queries, k=5).collect()
        }
        assert 10000 in plain  # the twin dominates a plain top-k
        hard = sim.hard_negative_topk(
            full, queries, k=5, overfetch=10, dup_ceiling=0.95
        ).collect()
        ids = [r.match_id for r in sorted(hard, key=lambda r: r.rank)]
        assert 10000 not in ids and len(ids) == 5
        assert all(r.score < 0.95 for r in hard)

    def test_ranks_are_contiguous_after_exclusion(self, spark, corpus):
        twin = corpus.filter(F.col("vec_id") == 0).select(
            (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
        )
        full = corpus.select("vec_id", "embedding").unionByName(twin)
        hard = sim.hard_negative_topk(
            full,
            full.filter(F.col("vec_id") == 0).select("vec_id"),
            k=5,
        ).collect()
        assert sorted(r.rank for r in hard) == [1, 2, 3, 4, 5]


class TestLabelNoise:
    def test_planted_mislabel_surfaces_off_diagonal(self, spark):
        from fluxdb_spark.functions.similarity import label_noise_matrix

        # Two tight clusters around (0,0,..) and (1,1,..); vec 5 sits in
        # cluster A's region but carries label 1 — the planted mislabel.
        rows = [
            (0, [0.00, 0.01, 0.0, 0.0], 0),
            (1, [0.01, 0.00, 0.0, 0.0], 0),
            (2, [1.00, 0.99, 1.0, 1.0], 1),
            (3, [0.99, 1.00, 1.0, 1.0], 1),
            (4, [1.00, 1.00, 1.0, 1.0], 1),
            (5, [0.02, 0.00, 0.0, 0.0], 1),
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = {
            (r.label, r.nearest_label): r
            for r in label_noise_matrix(df).collect()
        }
        # the mislabel: labeled 1, nearest centroid 0, positive margin
        assert out[(1, 0)].n_vecs == 1 and out[(1, 0)].avg_margin > 0
        # everything else on the diagonal with zero margin
        assert out[(0, 0)].n_vecs == 2 and out[(0, 0)].avg_margin == 0.0
        assert out[(1, 1)].n_vecs == 3 and out[(1, 1)].avg_margin == 0.0

    def test_diagonal_margin_is_zero_by_construction(self, spark):
        from fluxdb_spark.functions.similarity import label_noise_matrix

        df = spark.createDataFrame(
            [(i, [float(i % 2), 0.5], i % 2) for i in range(8)],
            "vec_id long, embedding array<float>, label int",
        )
        for r in label_noise_matrix(df).collect():
            if r.label == r.nearest_label:
                assert r.avg_margin == 0.0
            else:
                assert r.avg_margin > 0.0


class TestKcenterSample:
    """Greedy farthest-point selection on planted geometry."""

    def _vecs(self, spark, pts):
        return spark.createDataFrame(
            [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
            "vec_id long, embedding array<float>",
        )

    def test_covers_planted_clusters_before_duplicating(self, spark):
        from fluxdb_spark.functions.similarity import kcenter_sample

        # three tight clusters at distant corners + the seed's cluster;
        # k=3 must pick one vector from each far cluster before a second
        # vector from any cluster already covered
        pts = (
            [[0.0, 0.0], [0.01, 0.0], [0.0, 0.01]]          # cluster A (seed)
            + [[10.0, 0.0], [10.01, 0.0]]                    # cluster B
            + [[0.0, 10.0], [0.0, 10.01]]                    # cluster C
        )
        rows = kcenter_sample(self._vecs(spark, pts), k=3).collect()
        got = {r.rank: r.vec_id for r in rows}
        assert got[1] == 0  # seed = min vec_id, cluster A
        clusters = {0: "A", 1: "A", 2: "A", 3: "B", 4: "B", 5: "C", 6: "C"}
        assert {clusters[got[2]], clusters[got[3]]} == {"B", "C"}

    def test_distances_non_increasing_and_seed_zero(self, spark):
        from fluxdb_spark.functions.similarity import kcenter_sample
        from fluxdb_spark.sources.tables import load_table

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        rows = sorted(
            kcenter_sample(e, k=6).collect(), key=lambda r: r.rank
        )
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5, 6]
        assert rows[0].min_dist_sq == 0
        ds = [r.min_dist_sq for r in rows[1:]]
        assert all(a >= b for a, b in zip(ds, ds[1:])), ds
        assert len({r.vec_id for r in rows}) == 6

    def test_deterministic(self, spark):
        from fluxdb_spark.functions.similarity import kcenter_sample
        from fluxdb_spark.sources.tables import load_table

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        a = sorted(tuple(r) for r in kcenter_sample(e, k=4).collect())
        b = sorted(tuple(r) for r in kcenter_sample(e, k=4).collect())
        assert a == b


class TestKcenterRefined:
    """Sample-then-refine: two corpus passes regardless of k, honest
    full-corpus radius."""

    def test_radius_bounds_and_sample_membership(self, spark):
        from fluxdb_spark.functions.hashing import hash60
        from fluxdb_spark.functions.similarity import (
            kcenter_sample,
            kcenter_sample_refined,
        )
        from fluxdb_spark.sources.tables import load_table
        from pyspark.sql import functions as F

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        k, m = 6, 48
        ref = sorted(
            kcenter_sample_refined(e, k=k, m=m).collect(),
            key=lambda r: r.rank,
        )
        # one radius scalar on every row
        assert len({r.radius_sq for r in ref}) == 1
        radius = ref[0].radius_sq
        # the exact greedy's k-th pick distance IS its coverage radius;
        # restricting the pick pool to a sample can only lose coverage
        exact = sorted(
            kcenter_sample(e, k=k).collect(), key=lambda r: r.rank
        )
        assert radius >= exact[-1].min_dist_sq
        # each refined pick must come from the deterministic m-sample
        cand = {
            r.vec_id
            for r in e.select(
                "vec_id",
                hash60(F.col("vec_id").cast("string"), seed="kcenter")
                .alias("h"),
            )
            .orderBy("h", "vec_id")
            .limit(m)
            .collect()
        }
        assert {r.vec_id for r in ref} <= cand
        # greedy invariants hold within the sample
        assert ref[0].min_dist_sq == 0
        ds = [r.min_dist_sq for r in ref[1:]]
        assert all(a >= b for a, b in zip(ds, ds[1:])), ds

    def test_sample_smaller_than_k_raises(self, spark):
        from fluxdb_spark.functions.similarity import kcenter_sample_refined

        df = spark.createDataFrame(
            [(i, [float(i), 0.0]) for i in range(3)],
            "vec_id long, embedding array<float>",
        )
        import pytest as _pytest

        with _pytest.raises(ValueError, match="fewer than k"):
            kcenter_sample_refined(df, k=4, m=2)


class TestClassSeparation:
    def test_tiles_corpus_and_positive_scatter(self, corpus):
        rows = sim.class_separation(corpus).collect()
        assert sum(r.n_vecs for r in rows) == corpus.count()
        # random synthetic labels: every class has members and spread
        assert all(r.n_vecs > 0 and r.within_sum > 0 for r in rows)
        assert all(r.fisher is not None and r.fisher >= 0 for r in rows)

    def test_separable_classes_dominate_collapsed_ones(self, spark):
        # two tight, far-apart classes vs one class sitting ON the
        # global centroid: fisher must rank the separated ones higher
        rows = [
            (0, 0, [10.0, 0.0]), (1, 0, [10.5, 0.0]),
            (2, 1, [-10.0, 0.0]), (3, 1, [-10.5, 0.0]),
            (4, 2, [0.0, 0.2]), (5, 2, [0.0, -0.2]),
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, label long, embedding array<float>"
        )
        by = {r.label: r.fisher for r in sim.class_separation(df).collect()}
        assert by[0] > by[2] and by[1] > by[2]

    def test_zero_within_scatter_yields_null(self, spark):
        # a degenerate class (all members identical) must NULL-guard the
        # ratio, not emit Infinity (the ADVICE r10 division precedent)
        rows = [
            (0, 0, [1.0, 1.0]), (1, 0, [1.0, 1.0]),
            (2, 1, [3.0, 0.0]), (3, 1, [5.0, 0.0]),
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, label long, embedding array<float>"
        )
        by = {r.label: r.fisher for r in sim.class_separation(df).collect()}
        assert by[0] is None and by[1] is not None


class TestPairCosine:
    def _pairs(self, spark, ids):
        return spark.createDataFrame(
            [(a, b, 1.0) for a, b in ids], "d1 long, d2 long, jaccard double"
        )

    def test_identical_and_opposite_vectors(self, spark):
        vecs = spark.createDataFrame(
            [
                (0, [3.0, 4.0]),
                (1, [3.0, 4.0]),
                (2, [-3.0, -4.0]),
                (3, [0.0, 0.0]),
            ],
            "vec_id long, embedding array<float>",
        )
        out = {
            (r.d1, r.d2): r.cos4
            for r in sim.pair_cosine(
                self._pairs(spark, [(0, 1), (0, 2), (0, 3)]), vecs
            ).collect()
        }
        assert out[(0, 1)] == 1.0
        assert out[(0, 2)] == -1.0
        assert out[(0, 3)] is None  # zero vector NULL-guards, no NaN

    def test_work_scales_with_pairs_not_corpus(self, corpus, spark):
        # the pair relation drives the joins: no pair, no cosine rows
        out = sim.pair_cosine(self._pairs(spark, [(1, 2)]), corpus)
        rows = out.collect()
        assert len(rows) == 1 and rows[0].cos4 is not None
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan


class TestEmbeddingOutliers:
    def test_planted_outlier_surfaces_first(self, spark):
        # a cluster near the origin + one far-away row: the plant must
        # lead the ranking even though its NORM equals another member's
        # (the screen embed_norm_audit cannot perform)
        rows = [(i, 0, [1.0, 0.0]) for i in range(9)]
        rows.append((9, 0, [0.0, 50.0]))
        df = spark.createDataFrame(
            rows, "vec_id long, label long, embedding array<float>"
        )
        out = sim.embedding_outliers(df, 3).collect()
        assert out[0].vec_id == 9
        assert out[0].dist_sq > out[1].dist_sq

    def test_global_centroid_is_exact_floor_mean(self, spark):
        df = spark.createDataFrame(
            [(0, [1.0, -1.0]), (1, [2.0, 2.0])],
            "vec_id long, embedding array<float>",
        )
        # quantized: [1e6, -1e6], [2e6, 2e6] -> floor(mean) = [1.5e6, 5e5]
        assert sim.global_centroid(df) == [1_500_000, 500_000]

    def test_deterministic_tiebreak_on_id(self, corpus):
        a = [r.vec_id for r in sim.embedding_outliers(corpus, 20).collect()]
        b = [r.vec_id for r in sim.embedding_outliers(corpus, 20).collect()]
        assert a == b and len(a) == 20


class TestMarginPairs:
    """embed_margin_pairs semantics: the margin ratio must DEMOTE a hub
    vector (close to every query) below a slightly-lower-cosine but
    uniquely-aligned candidate — the whole point of margin mining."""

    def test_hub_demoted_below_aligned_pair(self, spark):
        import os
        import tempfile

        import fluxdb_spark.catalog as cat

        def vec(assign):
            v = [0.0] * 64
            for i, x in assign:
                v[i] = x
            return v

        rows = [
            # four orthogonal queries, label 0
            (0, vec([(0, 1.0)]), 0),
            (1, vec([(1, 1.0)]), 0),
            (2, vec([(2, 1.0)]), 0),
            (3, vec([(3, 1.0)]), 0),
            # hub: cos 0.5 with EVERY query (label 1)
            (10, vec([(0, 0.5), (1, 0.5), (2, 0.5), (3, 0.5)]), 1),
            # aligned: cos 0.45 with q0 only, 0 with the others
            (11, vec([(0, 0.45), (4, 0.8930845)]), 1),
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        spec = {s.name: s for s in cat.catalog()}["embed_margin_pairs"]
        with tempfile.TemporaryDirectory() as td:
            df.write.parquet(os.path.join(td, "embeddings.parquet"))
            got = sorted(
                (r.query_id, r.rank, r.match_id)
                for r in spec.spark(spark, td).collect()
                if r.query_id == 0
            )
        # raw cosine would rank the hub (0.5) above the aligned pair
        # (0.45); the margin inverts that
        assert got == [(0, 1, 11), (0, 2, 10)]


class TestMatryoshkaEval:
    """embed_matryoshka_eval: the m=64 rung is the identity anchor;
    a constructed corpus whose first-8 dims are uninformative shows
    truncation recall loss exactly where designed."""

    def test_identity_anchor_on_testdata(self, spark):
        import fluxdb_spark.catalog as cat

        spec = {s.name: s for s in cat.catalog()}["embed_matryoshka_eval"]
        got = {r.m_dims: r for r in spec.spark(
            spark, "/root/testdata/sf0.001").collect()}
        assert set(got) == {8, 16, 32, 64}
        full = got[64]
        assert full.n_hits == full.n_queries * 10
        assert full.recall_ppm == 1_000_000
        for r in got.values():
            assert 0 <= r.n_hits <= r.n_queries * 10

    def test_truncation_loses_designed_recall(self, spark):
        import os
        import tempfile

        import fluxdb_spark.catalog as cat

        # 1 query (id 0) + 14 candidates (ids 10..23), dim 64.
        # dims 1-8 are IDENTICAL for every candidate -> at m=8 the
        # top-10 is pure match_id-asc tie-break: ids 10..19.
        # dims 9-64 make ids 22 and 23 the two TRUE best matches and
        # leave the rest ordered by id, so full top-10 =
        # {22, 23} + ids 10..17 -> m=8 hits exactly 8 of 10.
        def vec(best: float, ident: float = 1.0) -> list[float]:
            return [ident] * 8 + [best] * 56

        rows = [(0, vec(1.0), 0)]
        for i in range(10, 22):
            rows.append((i, vec(0.0), 0))
        for i in (22, 23):
            rows.append((i, vec(1.0), 0))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        spec = {s.name: s for s in cat.catalog()}["embed_matryoshka_eval"]
        with tempfile.TemporaryDirectory() as td:
            df.write.parquet(os.path.join(td, "embeddings.parquet"))
            got = {r.m_dims: r for r in spec.spark(spark, td).collect()}
        assert got[64].recall_ppm == 1_000_000
        assert got[8].n_hits == 8
        assert got[8].recall_ppm == 800_000


class TestAnnRecallCurve:
    """embed_ann_recall_curve: the full-probe row is EXACTLY brute
    force, and recall is monotone in n_probe (probe sets are nested
    and a non-top-10 candidate can never displace a true top-10 member
    under the shared (score, match_id) total order)."""

    def test_exact_anchor_and_monotonicity(self, spark):
        import fluxdb_spark.catalog as cat

        spec = {s.name: s for s in cat.catalog()}["embed_ann_recall_curve"]
        got = sorted(
            spec.spark(spark, "/root/testdata/sf0.001").collect(),
            key=lambda r: r.n_probe,
        )
        assert [r.n_probe for r in got] == [1, 2, 4, 8]
        full = got[-1]
        assert full.n_hits == full.n_queries * 10
        assert full.recall_ppm == 1_000_000
        hits = [r.n_hits for r in got]
        assert hits == sorted(hits)


class TestDimVarianceSpectrum:
    """embed_dim_variance_spectrum semantics: the ranked curve dominates
    the prefix curve at every depth (top-r mass >= the mass of the
    specific first-r subset), and a constructed single-hot-dim corpus
    puts all mass on that dim."""

    def test_ranked_dominates_prefix_on_testdata(self, spark):
        import fluxdb_spark.catalog as cat

        spec = {s.name: s for s in cat.catalog()}[
            "embed_dim_variance_spectrum"
        ]
        rows = spec.spark(spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == 64
        assert sorted(r.rank for r in rows) == list(range(1, 65))
        by_rank = {r.rank: r.ranked_mass_ppm for r in rows}
        by_dim = {r.dim: r.prefix_mass_ppm for r in rows}
        for r in range(1, 65):
            assert by_rank[r] >= by_dim[r - 1]
        assert by_rank[64] == by_dim[63] == 1_000_000
        assert all(
            by_rank[r] <= by_rank[r + 1] for r in range(1, 64)
        )

    def test_single_hot_dim(self, spark):
        import os
        import tempfile

        import fluxdb_spark.catalog as cat

        rows = [
            (0, 0, [1.0] + [0.5] * 63),
            (1, 0, [-1.0] + [0.5] * 63),
            (2, 0, [0.0] + [0.5] * 63),
            (3, 0, [0.5] + [0.5] * 63),
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, label long, embedding array<float>"
        )
        spec = {s.name: s for s in cat.catalog()}[
            "embed_dim_variance_spectrum"
        ]
        with tempfile.TemporaryDirectory() as td:
            df.write.parquet(os.path.join(td, "embeddings.parquet"))
            got = {r.dim: r for r in spec.spark(spark, td).collect()}
        assert got[0].rank == 1
        assert got[0].ranked_mass_ppm == 1_000_000
        assert got[0].prefix_mass_ppm == 1_000_000
        assert got[0].var_fp > 0
        for d in range(1, 64):
            assert got[d].var_fp == 0.0


class TestPqDistortion:
    """embed_pq_distortion semantics: a corpus of exactly ks distinct
    patterns per subspace quantizes losslessly (every codeword live,
    zero error); on real data the invariants hold (n_vecs uniform,
    mean = total div n, utilization within [1, ks])."""

    def test_lossless_on_separable_corpus(self, spark):
        import os
        import tempfile

        from fluxdb_spark.functions import similarity as sim

        # 8 distinct vectors, repeated 3x each: seeds are the first 8
        # distinct rows, so Lloyd converges to the 8 points exactly.
        base = [[float(v + 1)] * 64 for v in range(8)]
        rows = [
            (i, 0, base[i % 8]) for i in range(24)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, label long, embedding array<float>"
        )
        got = {
            r.subspace: r
            for r in sim.pq_distortion(df).collect()
        }
        assert set(got) == {0, 1, 2, 3}
        for s, r in got.items():
            assert r.n_vecs == 24
            assert r.n_live_codewords == 8
            assert r.total_sq_err == 0
            assert r.max_vec_err == 0
            assert r.mean_sq_err == 0

    def test_invariants_on_testdata(self, spark):
        import fluxdb_spark.catalog as cat

        spec = {s.name: s for s in cat.catalog()}["embed_pq_distortion"]
        rows = spec.spark(spark, "/root/testdata/sf0.001").collect()
        assert sorted(r.subspace for r in rows) == [0, 1, 2, 3]
        n = {r.n_vecs for r in rows}
        assert len(n) == 1
        for r in rows:
            assert 1 <= r.n_live_codewords <= 8
            assert 0 <= r.mean_sq_err <= r.total_sq_err
            assert r.max_vec_err <= r.total_sq_err
            assert r.mean_sq_err == r.total_sq_err // r.n_vecs


class TestKnnGraph:
    """knn_graph_edges semantics on a planted corpus: identical twin
    vectors must be each other's rank-1 neighbor (a reciprocal edge),
    and the audit must count them as such."""

    def test_planted_twins_are_reciprocal(self, spark):
        import os
        import tempfile

        import numpy as np

        import fluxdb_spark.catalog as cat

        rng = np.random.RandomState(7)
        rows = []
        # 30 random unit-ish vectors
        for i in range(30):
            rows.append((i, [float(x) for x in rng.randn(64)]))
        # twins: 100/101 nearly identical (cosine ~1), far from the rest
        base = rng.randn(64)
        rows.append((100, [float(x) for x in base]))
        rows.append((101, [float(x) for x in base + 1e-4]))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        specs = {s.name: s for s in cat.catalog()}
        with tempfile.TemporaryDirectory() as td:
            df.write.parquet(os.path.join(td, "embeddings.parquet"))
            from fluxdb_spark.functions import similarity as sim

            edges = {
                (r.d1, r.d2): r.rank
                for r in sim.knn_graph_edges(
                    spark.read.parquet(os.path.join(td, "embeddings.parquet"))
                ).collect()
            }
            audit = specs["embed_knn_graph_audit"].spark(spark, td).collect()
        # identical twins collide in every LSH table -> candidate, and
        # cosine ~1 ranks them first mutually
        assert edges.get((100, 101)) == 1
        assert edges.get((101, 100)) == 1
        row = audit[0]
        assert row.n_nodes == 32
        assert row.n_reciprocal >= 2  # at least the twin edge, both ways
        assert 0 < row.reciprocity_ppm <= 1_000_000


class TestIvfPq:
    """The IVF-PQ composite must degrade to the flat PQ ADC scan when
    every cell is probed: same codebooks, same LUTs, so the only thing
    partial probe changes is the CANDIDATE set.  Pinning the full-probe
    identity checks the assembly (cell routing, probe join, ADC) adds
    exactly nothing to the scoring math."""

    def test_full_probe_equals_flat_pq(self, spark):
        from pyspark.sql import functions as F

        from fluxdb_spark.functions import similarity as sim

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = e.filter(F.col("vec_id") < 5)
        ivfpq = {
            (r.query_id, r.match_id): (r.adist, r.rank)
            for r in sim.ivfpq_topk(
                e, q, n_cells=8, n_probe=8
            ).collect()
        }
        flat = {
            (r.query_id, r.match_id): (r.adist, r.rank)
            for r in sim.pq_topk(e, q).collect()
        }
        assert ivfpq == flat
        assert len(flat) == 50


class TestMipsTopk:
    """MIPS vs cosine: norm must carry signal.  A long vector at a
    slight angle outranks a short parallel one under inner product —
    the exact ordering cosine inverts."""

    def test_norm_beats_angle(self, spark):
        import os
        import tempfile

        import fluxdb_spark.catalog as cat

        q = [1.0] + [0.0] * 63
        short_parallel = [0.5] + [0.0] * 63          # ip 0.5, cos 1.0
        long_angled = [2.0, 1.0] + [0.0] * 62        # ip 2.0, cos 0.89
        rows = [
            (0, q),
            (10, short_parallel),
            (11, long_angled),
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        spec = {s.name: s for s in cat.catalog()}["embed_mips_topk"]
        with tempfile.TemporaryDirectory() as td:
            df.write.parquet(os.path.join(td, "embeddings.parquet"))
            got = {
                (r.query_id, r.rank): r.match_id
                for r in spec.spark(spark, td).collect()
            }
        assert got[(0, 1)] == 11  # MIPS: the long vector wins
        assert got[(0, 2)] == 10


class TestFusedTrainers:
    """Round-14 optimization seams: restructured trainers must be
    bit-identical to the shapes they replaced."""

    def test_pq_books_fused_equals_sequential_fits(self, corpus):
        # pq_codebooks fuses the m subspace Lloyd fits into one driver
        # loop; the contract is bit-identity with m independent
        # kmeans_centroids calls over the sliced vectors
        m, ks, iters, dim = 4, 8, 3, 64
        sub = dim // m
        fused = sim.pq_codebooks(corpus, m=m, ks=ks, iters=iters)
        seq = [
            sim.kmeans_centroids(
                corpus.select(
                    F.col("vec_id"),
                    F.slice(F.col("embedding"), s * sub + 1, sub).alias(
                        "embedding"
                    ),
                ),
                k=ks,
                iters=iters,
            )
            for s in range(m)
        ]
        assert fused == seq

    def test_kcenter_local_greedy_equals_spark_greedy(self, corpus):
        # kcenter_sample_refined now runs the Gonzalez rounds on the
        # driver over the collected candidate set; same picks, same
        # distances, same tie-breaks as the Spark-job greedy
        q = sim._quantized(corpus, 1_000_000, "vec_id", "embedding")
        cand = q.orderBy("vec_id").limit(40).localCheckpoint()
        picked_spark, centers_spark = sim._kcenter_greedy(cand, 8)
        rows = [(r["vec_id"], r["q"]) for r in cand.collect()]
        picked_local, centers_local = sim._kcenter_greedy_local(rows, 8)
        assert picked_local == [
            (r, int(v), int(d)) for r, v, d in picked_spark
        ]
        assert centers_local == [[int(x) for x in c] for c in centers_spark]
