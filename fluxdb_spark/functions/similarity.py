"""Similarity search over embedding columns (array<float>).

- `cosine(a, b)`: built-in higher-order functions (zip_with + aggregate),
  accumulating in DOUBLE so results are bit-comparable with the DuckDB
  oracle after round(4);
- `brute_force_topk`: the exact baseline — broadcast the (small) query set,
  score the corpus in one pass, per-query top-k via window. One shuffle of
  |queries| * k rows; corpus is never shuffled;
- `lsh_topk`: the scale path — random-hyperplane LSH. Planes are generated
  driver-side from a fixed seed and folded into the plan as literals; each
  vector gets a bucket signature, candidates equi-join on bucket, exact
  cosine re-ranks. At 100 TB the bucket join replaces the corpus-wide scan
  per query with |bucket| candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fluxdb_spark.functions.hashing import hash60, hash60_sql
from fluxdb_spark.session import spread


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return F.round(dot(a, b) / (norm(a) * norm(b)), 4)


def cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """`cosine(a, b)` with the two self-norms precomputed per ROW instead
    of per PAIR.  Callers must pass na == norm(a), nb == norm(b); the
    arithmetic is then bit-identical to `cosine` (same dot fold, the same
    sqrt over the same sum, same divide, same round-4) while the per-pair
    work drops from three zip_with folds to one — in every pair join each
    row's norm used to be recomputed once per candidate it met."""
    return F.round(dot(a, b) / (na * nb), 4)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of `corpus` for every row of `queries`."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    c = spread(corpus).select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn(
            "score",
            cosine_pre(
                F.col("qvec"), F.col("cvec"), F.col("_qn"), F.col("_cn")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )


def blocked_neardup_pairs(
    corpus: DataFrame,
    threshold: float,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs within equi-join blocks (here: `label`) —
    the blocked form of cosine dedup: the block key keeps the pair space
    linear-ish instead of O(n^2)."""
    a = spread(corpus).select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("d1"),
        F.col(vec_col).alias("v1"),
        norm(F.col(vec_col)).alias("_n1"),
    )
    b = corpus.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("d2"),
        F.col(vec_col).alias("v2"),
        norm(F.col(vec_col)).alias("_n2"),
    )
    return (
        a.join(b, on="blk")
        .filter(F.col("d1") < F.col("d2"))
        .withColumn(
            "score",
            cosine_pre(F.col("v1"), F.col("v2"), F.col("_n1"), F.col("_n2")),
        )
        .filter(F.col("score") >= threshold)
        .select("d1", "d2", "score")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket signature: bit p = 1 iff vec . plane_p > 0.

    All planes ride in ONE nested-array literal walked with higher-order
    functions — a single Literal node in the plan instead of n_planes * dim
    unrolled literals. That keeps codegen size (janino compile time) constant
    in the plane count, which is what lets a real deployment use wide
    signatures without paying minutes of plan compilation; evaluation is
    still JVM-side and map-only."""
    planes_lit = F.lit([[float(x) for x in p] for p in planes])
    return F.aggregate(
        F.transform(
            planes_lit,
            lambda p, i: F.when(
                dot(vec, p) > 0,
                F.pow(F.lit(2.0), i).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _lsh_buckets(
    vec: Column, tables: list[list[list[float]]]
) -> Column:
    """array<struct<tbl,bucket>> — one sign-bit bucket per hash table."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_signature(vec, planes).alias("bucket"),
            )
            for t, planes in enumerate(tables)
        ]
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via MULTI-TABLE random-hyperplane LSH: `n_tables` independent
    sign-bit hash tables; a corpus vector is a candidate if it collides with
    the query in ANY table (the standard OR-amplification — one table alone
    is too selective for useful recall). Candidates equi-join on
    (table, bucket), exact cosine re-ranks.

    Approximate by design, yet still oracle-hashed: the seeded planes are
    plan literals, so `sql_lsh_topk` reproduces the exact bucketing in
    DuckDB; recall vs `brute_force_topk` is additionally property-tested
    (tests/test_similarity.py)."""
    tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    c = (
        spread(corpus)
        .select(
            F.col(id_col).alias("match_id"),
            F.col(vec_col).alias("cvec"),
            norm(F.col(vec_col)).alias("_cn"),
            F.explode(_lsh_buckets(F.col(vec_col), tables)).alias("tb"),
        )
        .select("match_id", "cvec", "_cn", "tb.tbl", "tb.bucket")
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            norm(F.col(vec_col)).alias("_qn"),
            F.explode(_lsh_buckets(F.col(vec_col), tables)).alias("tb"),
        )
        .select("query_id", "qvec", "_qn", "tb.tbl", "tb.bucket")
    )
    return _lsh_bucket_join_rerank(c, q, k)


def _lsh_bucket_join_rerank(c: DataFrame, q: DataFrame, k: int) -> DataFrame:
    """Candidate equi-join on (table, bucket) + exact cosine re-rank —
    shared by the recompute path and the materialized-bucket path.  Both
    sides arrive with their self-norm precomputed per row (_qn / _cn), so
    the re-rank is one dot fold per surviving pair, not three."""
    # a pair colliding in several tables must score once: distinct first
    cand = (
        c.join(F.broadcast(q), on=["tbl", "bucket"])
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "qvec", "_qn", "match_id", "cvec", "_cn")
        .dropDuplicates(["query_id", "match_id"])
    )
    scored = cand.withColumn(
        "score",
        cosine_pre(F.col("qvec"), F.col("cvec"), F.col("_qn"), F.col("_cn")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )


def lsh_topk_from_buckets(
    buckets: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """`lsh_topk` with the corpus side read from a MATERIALIZED bucket
    table (id, embedding, tbl, bucket — streaming/retrieval.py) instead
    of re-bucketing the corpus per query: only the probe vectors are
    hashed at query time (same seeded hyperplanes, so collisions are
    identical to the recompute form). The 100 TB query cost drops from
    one corpus-wide map pass + join to the bucket equi-join alone."""
    tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    c = buckets.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("_cn"),
        "tbl",
        "bucket",
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            norm(F.col(vec_col)).alias("_qn"),
            F.explode(_lsh_buckets(F.col(vec_col), tables)).alias("tb"),
        )
        .select("query_id", "qvec", "_qn", "tb.tbl", "tb.bucket")
    )
    return _lsh_bucket_join_rerank(c, q, k)


def lsh_neardup_pairs(
    corpus: DataFrame,
    threshold: float,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """WHOLE-CORPUS embedding near-dup pairs — no block key required: the
    scale path for semantic dedup. Multi-table sign-bit LSH buckets
    generate candidates by self-equi-join (a pair qualifies if it collides
    in ANY table — OR-amplification), exact cosine verifies survivors at
    >= threshold. Pair space is sum over buckets of |bucket|^2 instead of
    n^2; for genuinely near-identical vectors (theta -> 0) the per-table
    collision probability (1 - theta/pi)^n_planes stays near 1, so recall
    at dedup-grade thresholds is essentially total while unrelated vectors
    land in disjoint buckets. Complements `blocked_neardup_pairs` (which
    needs a domain block key) the way `dedup_minhash_lsh` complements the
    exact n-gram path for text."""
    tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    # Candidate generation on (id, bucket) ONLY — the self-join and the
    # pair dedup shuffle ~16-byte id pairs, never the 64-float payloads
    # (same §8 decide-with-small-rows split as `knn_graph_edges`); the
    # vectors re-attach once, WITH their per-row norms, after the pair
    # space is distinct.
    sigs = (
        spread(corpus)
        .select(
            F.col(id_col).alias("vid"),
            F.explode(_lsh_buckets(F.col(vec_col), tables)).alias("tb"),
        )
        .select("vid", "tb.tbl", "tb.bucket")
        .localCheckpoint()  # both sides of the self-join read it
    )
    a = sigs.select(F.col("vid").alias("d1"), "tbl", "bucket")
    b = sigs.select(F.col("vid").alias("d2"), "tbl", "bucket")
    # The dedup exchange carries 16-byte id pairs, so AQE's byte-based
    # coalescing shrinks it to a couple of reducers — but every row
    # downstream costs a 64-dim dot product, so partition count must
    # follow COMPUTE, not bytes (guide §2.2/§2.5).  An explicit hash
    # repartition on the dedup keys pins the parallelism (AQE never
    # coalesces a user repartition) and dropDuplicates reuses the
    # partitioning instead of adding its own exchange: one shuffle
    # total, scoring runs one wave across the cluster.
    par = corpus.sparkSession.sparkContext.defaultParallelism
    pairs = (
        a.join(b, on=["tbl", "bucket"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .repartition(par, "d1", "d2")
        .dropDuplicates(["d1", "d2"])
    )
    v1 = corpus.select(
        F.col(id_col).alias("d1"),
        F.col(vec_col).alias("v1"),
        norm(F.col(vec_col)).alias("_n1"),
    )
    v2 = corpus.select(
        F.col(id_col).alias("d2"),
        F.col(vec_col).alias("v2"),
        norm(F.col(vec_col)).alias("_n2"),
    )
    return (
        pairs.join(v1, "d1")
        .join(v2, "d2")
        .withColumn(
            "score",
            cosine_pre(F.col("v1"), F.col("v2"), F.col("_n1"), F.col("_n2")),
        )
        .filter(F.col("score") >= threshold)
        .select("d1", "d2", "score")
    )


def sql_lsh_neardup(
    threshold: float,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    source_cte: str = "SELECT vec_id, embedding FROM embeddings",
) -> str:
    """DuckDB twin of `lsh_neardup_pairs` over an arbitrary vector CTE:
    seeded planes inlined as literals reproduce the exact bucketing (same
    construction as `sql_lsh_topk`)."""
    tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    planes_lit = (
        "["
        + ", ".join(
            "[" + ", ".join("[" + ", ".join(repr(w) for w in p) + "]" for p in tbl) + "]"
            for tbl in tables
        )
        + "]"
    )
    return f"""
WITH pl AS (SELECT {planes_lit} AS hp),
e AS ({source_cte}),
sig AS (
  SELECT e.vec_id, t.tbl,
         CAST(sum(CASE WHEN list_sum(list_transform(range(1, {dim + 1}),
                    i -> CAST(e.embedding[i] AS DOUBLE) * hp[t.tbl + 1][pr.p + 1][i])) > 0
                  THEN CAST(pow(2, pr.p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
  FROM e, pl, range(0, {n_tables}) t(tbl), range(0, {n_planes}) pr(p)
  GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
  FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id),
idx AS (SELECT unnest(range(1, {dim + 1})) AS i),
scored AS (
  SELECT cand.d1, cand.d2,
         round(sum(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))
           / (sqrt(sum(CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
            * sqrt(sum(CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))), 4) AS score
  FROM cand
  JOIN e q ON q.vec_id = cand.d1
  JOIN e c ON c.vec_id = cand.d2
  CROSS JOIN idx
  GROUP BY 1, 2)
SELECT d1, d2, score FROM scored WHERE score >= {threshold}
"""


def _kmeans_centroids(
    sample: list[list[float]], k: int, iters: int = 5, seed: int = 42
) -> list[list[float]]:
    """Tiny driver-side k-means over a bounded sample (numpy, fixed seed) —
    the coarse quantizer training step of IVF. The sample is O(k) rows no
    matter the corpus size, so collecting it is scale-safe."""
    import numpy as np

    x = np.asarray(sample, dtype=np.float64)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents.tolist()


def _centroid_scores(vec: Column, cents: list[list[float]]) -> Column:
    """array<struct<score,idx>> of -||v-c||^2 (up to a v-only constant):
    v.c - ||c||^2/2 per centroid.

    Centroids and their norm-biases ride in TWO literal nodes (one nested
    array, one flat) walked with a higher-order transform — plan/codegen
    size is constant in n_centroids, so an IVF with thousands of cells
    compiles as fast as one with 16. Evaluation stays JVM-side, map-only."""
    cents_lit = F.lit([[float(x) for x in c] for c in cents])
    biases_lit = F.lit([float(sum(x * x for x in c) / 2.0) for c in cents])
    return F.transform(
        cents_lit,
        lambda c, i: F.struct(
            (dot(vec, c) - F.element_at(biases_lit, i + 1)).alias("score"),
            i.alias("idx"),
        ),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_size: int = 512,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via IVF (inverted-file) coarse quantization: k-means centroids on
    a bounded sample, corpus partitioned into centroid cells in one map
    stage, each query probes its `n_probe` nearest cells, exact cosine
    re-ranks the cell candidates.

    The scale path: the corpus is scanned once to assign cells (centroids are
    plan literals — broadcast for free), and per-query work is
    |corpus| * n_probe / n_centroids instead of |corpus|. Approximate, so
    recall vs `brute_force_topk` is property-tested (tests/test_similarity.py)
    rather than oracle-hashed."""
    sample_rows = (
        corpus.select(vec_col).orderBy(id_col).limit(sample_size).collect()
    )
    cents = _kmeans_centroids([r[0] for r in sample_rows], n_centroids, seed=seed)

    best_cell = F.sort_array(
        _centroid_scores(F.col(vec_col), cents), False
    )[0]["idx"]
    c = spread(corpus).select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("_cn"),
        best_cell.alias("cell"),
    )
    probe_cells = F.transform(
        F.slice(
            F.sort_array(_centroid_scores(F.col(vec_col), cents), False),
            1,
            n_probe,
        ),
        lambda s: s["idx"],
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("_qn"),
        F.explode(probe_cells).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn(
            "score",
            cosine_pre(
                F.col("qvec"), F.col("cvec"), F.col("_qn"), F.col("_cn")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )


def sql_lsh_topk(
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    query_pred: str = "vec_id < 5",
) -> str:
    """DuckDB twin of `lsh_topk`: the hyperplanes are seeded literals, so
    the exact bucketing IS SQL-reproducible — the planes are inlined into
    the query as a nested list literal (repr round-trips every double).
    Both engines compute each dot product as an in-order double fold over
    identical operands, so the sign tests agree; candidate generation,
    dedup, exact re-rank, and tie-breaks mirror the Spark plan 1:1."""
    tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    planes_lit = (
        "["
        + ", ".join(
            "[" + ", ".join("[" + ", ".join(repr(w) for w in p) + "]" for p in tbl) + "]"
            for tbl in tables
        )
        + "]"
    )
    return f"""
WITH pl AS (SELECT {planes_lit} AS hp),
e AS (SELECT vec_id, embedding FROM embeddings),
sig AS (
  SELECT e.vec_id, t.tbl,
         CAST(sum(CASE WHEN list_sum(list_transform(range(1, {dim + 1}),
                    i -> CAST(e.embedding[i] AS DOUBLE) * hp[t.tbl + 1][pr.p + 1][i])) > 0
                  THEN CAST(pow(2, pr.p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
  FROM e, pl, range(0, {n_tables}) t(tbl), range(0, {n_planes}) pr(p)
  GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS match_id
  FROM sig c JOIN (SELECT * FROM sig WHERE {query_pred}) q
    ON c.tbl = q.tbl AND c.bucket = q.bucket
  WHERE c.vec_id != q.vec_id),
idx AS (SELECT unnest(range(1, {dim + 1})) AS i),
scored AS (
  SELECT cand.query_id, cand.match_id,
         round(sum(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))
           / (sqrt(sum(CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
            * sqrt(sum(CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))), 4) AS score
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings c ON c.vec_id = cand.match_id
  CROSS JOIN idx
  GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, match_id ASC) AS rank
  FROM scored)
SELECT query_id, match_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def random_projection(vec: Column, planes: list[list[float]]) -> Column:
    """Johnson-Lindenstrauss random projection: component k of the output
    is vec . plane_k over seeded Gaussian planes — the standard embedding
    COMPRESSION step of a training-data pipeline (store/search 16 dims
    instead of 64 with bounded distance distortion). Planes ride as one
    nested-array plan literal (constant codegen size, like
    `lsh_signature`); evaluation is a map-only JVM fold per row."""
    planes_lit = F.lit([[float(x) for x in p] for p in planes])
    return F.transform(planes_lit, lambda p: dot(vec, p))


def projected_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    out_dim: int = 16,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN by dimensionality reduction: project corpus and queries to
    `out_dim` with the SAME seeded planes, then exact cosine top-k in the
    reduced space — dim/out_dim fewer multiplies per candidate pair than
    `brute_force_topk`, with JL-bounded rank distortion (recall vs the
    full-dimension ranking is property-tested). Approximate by design yet
    oracle-hashed: the planes are plan literals and both engines fold
    each projection in array order (`sql_projected_topk`)."""
    planes = _hyperplanes(dim, out_dim, seed)
    c = spread(corpus).select(
        F.col(id_col).alias("match_id"),
        random_projection(F.col(vec_col), planes).alias("cvec"),
    ).select("match_id", "cvec", norm(F.col("cvec")).alias("_cn"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        random_projection(F.col(vec_col), planes).alias("qvec"),
    ).select("query_id", "qvec", norm(F.col("qvec")).alias("_qn"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn(
            "score",
            cosine_pre(
                F.col("qvec"), F.col("cvec"), F.col("_qn"), F.col("_cn")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )


def sql_projected_topk(
    k: int = 10,
    out_dim: int = 16,
    dim: int = 64,
    seed: int = 7,
    query_pred: str = "vec_id < 5",
) -> str:
    """DuckDB twin of `projected_topk`: planes inlined as literals; the
    projection and the cosine both fold in list order (list_sum over
    list_transform), mirroring Spark's sequential `aggregate` fold, so
    scores agree to the last bit before round(4)."""
    planes = _hyperplanes(dim, out_dim, seed)
    planes_lit = (
        "["
        + ", ".join(
            "[" + ", ".join(repr(w) for w in p) + "]" for p in planes
        )
        + "]"
    )
    proj = (
        f"list_transform(range(0, {out_dim}), kk -> "
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> CAST(embedding[i] AS DOUBLE) * pl[kk + 1][i])))"
    )
    dot16 = (
        f"list_sum(list_transform(range(1, {out_dim + 1}), "
        "i -> q.p[i] * c.p[i]))"
    )
    nq = (
        f"sqrt(list_sum(list_transform(range(1, {out_dim + 1}), "
        "i -> q.p[i] * q.p[i])))"
    )
    nc = (
        f"sqrt(list_sum(list_transform(range(1, {out_dim + 1}), "
        "i -> c.p[i] * c.p[i])))"
    )
    return f"""
WITH pl_t AS (SELECT {planes_lit} AS pl),
proj AS (SELECT vec_id, {proj} AS p FROM embeddings, pl_t),
q AS (SELECT * FROM proj WHERE {query_pred}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         round({dot16} / ({nq} * {nc}), 4) AS score
  FROM proj c, q WHERE c.vec_id != q.vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, match_id ASC) AS rank
  FROM scored)
SELECT query_id, match_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def embedding_covariance(
    corpus: DataFrame,
    dim: int = 64,
    scale: int = 10_000,
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus covariance matrix as an (i, j, cov) relation — the PCA /
    whitening / decorrelation building block of an embedding pipeline,
    computed EXACTLY: embeddings are fixed-point-quantized, so the
    co-moment sums are integer (order-independent across any partitioning
    — no float-summation ambiguity at any cluster size) and the final
    cov_ij = Sxy/n - (Sx/n)(Sy/n) is one fixed double expression both
    engines evaluate identically.

    Scale shape: one posexplode of the per-row outer product (dim^2 flat
    long multiplies — measured FASTER than a triangular-with-indices
    variant, whose per-element struct allocation costs more than the
    multiplies it saves) feeding a combine-friendly groupBy: after
    map-side partial aggregation the shuffle carries dim^2 rows per
    partition, never O(rows); the dim-row mean relation broadcasts.

    The final value is cov_ij = (n*Sxy - Sx*Sy) / n^2: the numerator and
    denominator are EXACT int64s and the quotient is ONE IEEE double
    division, which every engine rounds identically — no round(x, 6)
    step, because multi-op double expressions are not portable (DuckDB
    contracts a*b-c into FMA, so round-to-6 ties land on opposite sides;
    observed as 20/4096 off-by-1e-6 cells at sf0.1). `scale` bounds
    overflow: |n*Sxy - Sx*Sy| <= 2*(n*scale)^2 must stay within int64,
    i.e. n <= ~2.1e5 rows at the default scale 10^4; pass scale=100 for
    corpora up to ~2e9 rows."""
    q = spread(corpus).select(
        _quantize(F.col(vec_col), scale).alias("v")
    ).localCheckpoint()  # one source scan feeds both aggregations
    sums = (
        q.select(F.posexplode("v").alias("i0", "x"))
        .groupBy("i0")
        .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
    )
    prods = (
        q.select(
            F.posexplode(
                F.flatten(
                    F.transform(
                        "v",
                        lambda x: F.transform("v", lambda y: x * y),
                    )
                )
            ).alias("pos", "xy")
        )
        .groupBy("pos")
        .agg(F.sum("xy").alias("sxy"))
        .select(
            (F.col("pos") / dim).cast("long").alias("i0"),
            (F.col("pos") % dim).cast("long").alias("j0"),
            "sxy",
        )
    )
    si = sums.select(
        F.col("i0"), F.col("sx").alias("sx_i"), F.col("n")
    )
    sj = sums.select(F.col("i0").alias("j0"), F.col("sx").alias("sx_j"))
    num = F.col("n") * F.col("sxy") - F.col("sx_i") * F.col("sx_j")
    den = F.col("n") * F.col("n")
    return (
        prods.join(F.broadcast(si), on="i0")
        .join(F.broadcast(sj), on="j0")
        .select(
            (F.col("i0") + 1).alias("i"),
            (F.col("j0") + 1).alias("j"),
            (num.cast("double") / den.cast("double")).alias("cov"),
        )
    )


def sql_embedding_covariance(dim: int = 64, scale: int = 10_000) -> str:
    """DuckDB twin of `embedding_covariance`: identical quantization,
    exact BIGINT co-moment sums, and the same single-division final
    expression (n*Sxy - Sx*Sy)/n^2 — one IEEE divide of identical
    integers is bit-portable where a rounded multi-op expression is
    not (FMA contraction flips round-to-6 ties)."""
    return f"""
WITH q AS (SELECT vec_id,
            list_transform(embedding,
              x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS v
           FROM embeddings),
e AS (SELECT vec_id, CAST(i AS BIGINT) AS i, v[i] AS x
      FROM q, UNNEST(range(1, {dim + 1})) t(i)),
nn AS (SELECT count(*) AS n FROM q),
s AS (SELECT i, sum(x) AS sx FROM e GROUP BY i),
p AS (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
      FROM e a JOIN e b USING (vec_id) GROUP BY 1, 2)
SELECT p.i, p.j,
       CAST(nn.n * p.sxy - sa.sx * sb.sx AS DOUBLE)
         / CAST(nn.n * nn.n AS DOUBLE) AS cov
FROM p CROSS JOIN nn
JOIN s sa ON sa.i = p.i
JOIN s sb ON sb.i = p.j
"""


def _quantize(vec: Column, scale: int) -> Column:
    """Fixed-point quantization: float -> floor(x * scale) as long.
    float->double is exact and floor-of-double is engine-portable, so the
    quantized corpus is BIT-IDENTICAL across Spark and the SQL oracle —
    every later step is integer arithmetic with no float-summation-order
    ambiguity."""
    return F.transform(
        vec,
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast(
            "long"
        ),
    )


def _int_centroid_dists(q: Column, cents: list[list[int]]) -> Column:
    """array<struct<dist,idx>> of EXACT integer squared distances to every
    centroid, sorted nearest-first; ties break to the lowest centroid
    index (struct sort order). Centroids ride in one nested-array literal
    walked with a higher-order transform — plan/codegen size is constant
    in k."""
    cl = F.lit([[int(x) for x in c] for c in cents]).cast(
        "array<array<bigint>>"
    )
    dists = F.transform(
        cl,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(q, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("dist"),
            i.cast("long").alias("idx"),
        ),
    )
    return F.sort_array(dists, True)


def _nearest_int_centroid(q: Column, cents: list[list[int]]) -> Column:
    """struct<dist,idx> of the nearest centroid (see _int_centroid_dists)."""
    return _int_centroid_dists(q, cents)[0]


def kmeans_clusters(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 3,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Whole-corpus k-means assignment: `iters` Lloyd iterations over the
    ENTIRE embedding corpus (unlike `_kmeans_centroids`, the bounded-sample
    trainer that seeds IVF), the cluster backbone of curation jobs —
    cluster-balanced sampling, semantic bucketing, per-topic mix caps.

    Exactness: embeddings are fixed-point-quantized (`_quantize`), so
    assignment distances are exact integers and the centroid update is
    floor(sum/count) of integers — deterministic and bit-identical to the
    SQL oracle (`sql_kmeans`), which replays the same iterations; the one
    float op per update (the sum-to-double division) is exact below 2^53,
    i.e. up to ~10^9 rows per cluster at this scale factor.

    Scale shape: the quantized projection is materialized ONCE (eager
    localCheckpoint — no session-cache residue), so each iteration reads
    the checkpointed blocks instead of re-scanning the source corpus;
    per iteration, one map-only assignment pass (centroids are plan
    literals, distance is a JVM higher-order fold) plus one
    posexplode->groupBy whose shuffle carries k*dim rows after map-side
    combine; the driver collects exactly k*dim longs per iteration (same
    bounded-collect contract as ivf_topk's sample). Iterations are a
    driver loop over bounded state, never over data. Empty clusters keep
    their previous centroid."""
    cents, assigned = _kmeans_fit(
        corpus, k, iters, scale, id_col, vec_col
    )
    return assigned


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 3,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]]:
    """The quantized centroids `kmeans_clusters` measures its FINAL
    assignment against — the frozen model a standing retrieval service
    materializes once and assigns new vectors to incrementally
    (streaming/retrieval.py): `assign_to_centroids(corpus, cents)` over
    the training corpus reproduces `kmeans_clusters(corpus)` exactly."""
    cents, _assigned = _kmeans_fit(corpus, k, iters, scale, id_col, vec_col)
    return cents


def _pq_books_fit(
    corpus: DataFrame,
    m: int,
    ks: int,
    iters: int,
    dim: int,
    scale: int,
    id_col: str,
    vec_col: str,
) -> list[list[list[int]]]:
    """All m subspace Lloyd fits FUSED into one driver loop — arithmetic
    bit-identical to m independent `_kmeans_fit` calls over the sliced
    vectors (same seeds: the first ks rows by id slice the same way for
    every subspace; same per-(cluster, pos) integer sums; same
    floor-divided update; empty clusters keep their previous codeword),
    but the corpus is scanned ONCE per pass instead of once per subspace
    and the driver runs one job per pass instead of m: 1 checkpoint +
    1 seed collect + (iters-1) update collects total, vs m of each.  At
    100 TB the saved work is (m-1) full corpus scans per iteration."""
    if iters < 1:
        raise ValueError(f"kmeans needs iters >= 1, got {iters}")
    sub = dim // m
    base = (
        spread(corpus)
        .select(
            F.col(id_col),
            F.array(
                *[
                    _quantize(
                        F.slice(F.col(vec_col), s * sub + 1, sub), scale
                    )
                    for s in range(m)
                ]
            ).alias("qs"),
        )
        .localCheckpoint(eager=False)
        # lazy: the seed collect is the first action (see _kmeans_fit)
    )
    seeds = base.orderBy(id_col).limit(ks).collect()  # O(ks) rows
    if len(seeds) < ks:
        raise ValueError(
            f"kmeans needs at least k={ks} corpus rows, got {len(seeds)}"
        )
    books = [[list(r.qs[s]) for r in seeds] for s in range(m)]
    for i in range(iters - 1):
        assigned = [
            _nearest_int_centroid(F.col("qs")[s], books[s])["idx"]
            for s in range(m)
        ]
        upd = (
            base.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(s).alias("s"),
                                assigned[s].alias("cluster"),
                                F.col("qs")[s].alias("q"),
                            )
                            for s in range(m)
                        ]
                    )
                ).alias("z")
            )
            .select(
                F.col("z.s").alias("s"),
                F.col("z.cluster").alias("cluster"),
                F.posexplode("z.q").alias("pos", "val"),
            )
            .groupBy("s", "cluster", "pos")
            .agg(
                F.floor(F.sum("val").cast("double") / F.count(F.lit(1)))
                .cast("long")
                .alias("cv")
            )
            .collect()  # exactly m*ks*sub rows
        )
        new = {(r.s, r.cluster, r.pos): r.cv for r in upd}
        books = [
            [
                [
                    new.get((s, c, p), books[s][c][p])
                    for p in range(sub)
                ]
                for c in range(ks)
            ]
            for s in range(m)
        ]
    return books


def assign_to_centroids(
    vectors: DataFrame,
    cents: list[list[int]],
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Map-only assignment of vectors to FROZEN centroids (plan literals,
    exact integer distances) — the row-wise half of k-means that an
    incremental maintainer can apply per append batch.  `carry` names
    extra input columns to project through (e.g. the vector itself for
    a downstream candidate join) — cheaper than re-attaching them with
    an id equi-join after the fact."""
    near = _nearest_int_centroid(_quantize(F.col(vec_col), scale), cents)
    return vectors.select(
        F.col(id_col),
        near["idx"].alias("cluster"),
        near["dist"].alias("dist"),
        *[F.col(c) for c in carry],
    )


def ivf_topk_from_assignments(
    assignments: DataFrame,
    cents: list[list[int]],
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """`ivf_topk` with the corpus cell-assignment pass REPLACED by a
    MATERIALIZED assignment table (id, cluster, embedding —
    streaming/retrieval.py's centroid_assign_transform over the frozen
    model): each probe is assigned to its `n_probe` nearest frozen
    centroids with the SAME exact integer distance the maintainer used,
    candidates come from a broadcast equi-join on cluster, and exact
    cosine re-ranks them.

    This is the standing-service IVF shape: per query the engine reads
    ~|corpus| * n_probe / n_centroids rows from the index (cluster is a
    scan-prunable column), never a corpus map pass. At full probe
    (n_probe = len(cents)) the result is EXACTLY brute-force top-k —
    which is what lets the catalog entry oracle-hash the machinery
    instead of only recall-testing it."""
    c = assignments.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("_cn"),
        "cluster",
    )
    probe_cells = F.transform(
        F.slice(
            _int_centroid_dists(_quantize(F.col(vec_col), scale), cents),
            1,
            n_probe,
        ),
        lambda s: s["idx"],
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("_qn"),
        F.explode(probe_cells).alias("cluster"),
    )
    scored = (
        c.join(F.broadcast(q), on="cluster")
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn(
            "score",
            cosine_pre(
                F.col("qvec"), F.col("cvec"), F.col("_qn"), F.col("_cn")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )


def ivf_probe_scored(
    assignments: DataFrame,
    cents: list[list[int]],
    queries: DataFrame,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FULL-probe IVF candidate scoring with the probe DEPTH attached:
    one exact-cosine pass over the n_probe = len(cents) candidate set,
    where `prank` is the 1-based rank of the candidate's cell in the
    query's centroid-distance ordering (the same exact integer ordering
    `ivf_topk_from_assignments` slices).  Because probe sets NEST —
    depth p's candidates are exactly the prank <= p subset — a
    probe-depth sweep filters this one relation per depth instead of
    re-scoring per depth: sum(p_i)/max(p_i) of the cosine work removed,
    and the index is read once instead of once per depth.  Per-depth
    top-k over the filtered subset is bit-identical to calling
    `ivf_topk_from_assignments(n_probe=p)` (same scores, same
    tie-break), pinned by tests/test_similarity.py."""
    c = assignments.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("_cn"),
        "cluster",
    )
    ranked_cells = F.transform(
        _int_centroid_dists(_quantize(F.col(vec_col), scale), cents),
        lambda s: s["idx"],
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("_qn"),
        F.posexplode(ranked_cells).alias("_pos", "cluster"),
    )
    return (
        c.join(F.broadcast(q), on="cluster")
        .filter(F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            cosine_pre(
                F.col("qvec"), F.col("cvec"), F.col("_qn"), F.col("_cn")
            ).alias("score"),
            (F.col("_pos") + 1).cast("int").alias("prank"),
        )
    )


def _kmeans_fit(
    corpus: DataFrame,
    k: int,
    iters: int,
    scale: int,
    id_col: str,
    vec_col: str,
) -> tuple[list[list[int]], DataFrame]:
    """Lloyd loop shared by `kmeans_clusters` / `kmeans_centroids`:
    returns (centroids of the final assignment pass, that assignment).
    The centroid update is skipped after the last pass — it would train
    a model nobody reads."""
    if iters < 1:
        raise ValueError(f"kmeans needs iters >= 1, got {iters}")
    base = (
        spread(corpus)
        .select(F.col(id_col), _quantize(F.col(vec_col), scale).alias("q"))
        .localCheckpoint(eager=False)
        # lazy: the seed collect below is the first action and
        # materializes the blocks — an eager checkpoint here was one
        # whole extra job per training call (all consumers are
        # SEQUENTIAL jobs, so the multi-branch single-plan hazard that
        # forces eager checkpoints elsewhere does not apply)
    )
    seeds = base.orderBy(id_col).limit(k).collect()  # O(k) rows
    if len(seeds) < k:
        raise ValueError(
            f"kmeans needs at least k={k} corpus rows, got {len(seeds)}"
        )
    cents = [list(r.q) for r in seeds]
    dim = len(cents[0])
    for i in range(iters):
        near = _nearest_int_centroid(F.col("q"), cents)
        assigned = base.select(
            F.col(id_col),
            F.col("q"),
            near["idx"].alias("cluster"),
            near["dist"].alias("dist"),
        )
        if i == iters - 1:
            break
        upd = (
            assigned.select("cluster", F.posexplode("q").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(
                F.floor(
                    F.sum("val").cast("double") / F.count(F.lit(1))
                )
                .cast("long")
                .alias("cv")
            )
            .collect()  # exactly k*dim rows
        )
        new = {(r.cluster, r.pos): r.cv for r in upd}
        cents = [
            [new.get((c, p), cents[c][p]) for p in range(dim)]
            for c in range(k)
        ]
    return cents, assigned.select(id_col, "cluster", "dist")


def sql_kmeans(
    k: int = 4, iters: int = 3, scale: int = 1_000_000
) -> str:
    """DuckDB twin of `kmeans_clusters`: the same seeded init and Lloyd
    iterations unrolled as CTE chains over exact integers."""
    body, a = _sql_kmeans_ctes(k, iters, scale)
    return body + (
        f"\nSELECT vec_id, cluster, CAST(d AS BIGINT) AS dist"
        f" FROM {a} ORDER BY vec_id"
    )


def _sql_kmeans_ctes(
    k: int = 4,
    iters: int = 3,
    scale: int = 1_000_000,
    source_cte: str = "SELECT vec_id, embedding FROM embeddings",
    prefix: str = "",
) -> tuple[str, str]:
    """The kmeans CTE chain alone (so downstream oracles — e.g.
    sql_semantic_dedup — can keep composing): returns (WITH-chain, name
    of the final-assignment CTE). `{prefix}src` holds the corpus,
    available to appended CTEs. `prefix` namespaces every CTE so several
    chains (e.g. one per PQ subspace) compose in one statement."""
    p = prefix
    head = f"""
WITH {p}src AS ({source_cte}),
{p}qv AS (SELECT vec_id,
            list_transform(embedding,
              x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS q
            FROM {p}src),
{p}e AS (SELECT vec_id, i AS pos, q[i] AS val
      FROM {p}qv, UNNEST(range(1, len(q) + 1)) AS u(i)),
{p}seed AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cluster
         FROM {p}qv ORDER BY vec_id LIMIT {k}),
{p}cent0 AS (SELECT s.cluster, e.pos, e.val AS cv
          FROM {p}seed s JOIN {p}e e USING (vec_id))"""
    parts = [head]
    for i in range(1, iters + 1):
        prev = f"{p}cent{i - 1}"
        parts.append(f"""
{p}d{i} AS (SELECT e.vec_id, c.cluster,
         sum((e.val - c.cv) * (e.val - c.cv)) AS d
         FROM {p}e e JOIN {prev} c USING (pos) GROUP BY 1, 2),
{p}a{i} AS (SELECT vec_id, cluster, d FROM
         (SELECT vec_id, cluster, d,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY d, cluster) AS rn FROM {p}d{i})
         WHERE rn = 1),
{p}u{i} AS (SELECT a.cluster, e.pos,
         CAST(floor(CAST(sum(e.val) AS DOUBLE) / count(*)) AS BIGINT) AS cv
         FROM {p}a{i} a JOIN {p}e e USING (vec_id) GROUP BY 1, 2),
{p}cent{i} AS (SELECT p.cluster, p.pos, COALESCE(n.cv, p.cv) AS cv
            FROM {prev} p LEFT JOIN {p}u{i} n USING (cluster, pos))""")
    return ",".join(parts), f"{p}a{iters}"


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.99,
    k: int = 4,
    iters: int = 2,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: list[list[int]] | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate removal over an embedding corpus — cluster with the
    exact fixed-point k-means, compare pairs ONLY within a cluster, and
    drop every row that has a lower-id near-twin (cosine >= threshold)
    in its cell; survivors keep their cluster id.

    Clustering first IS the scale story (the paper's reason to cluster):
    the candidate space is per-cell pairs — quadratic in the CELL,
    controlled by raising k — never corpus-wide all-pairs; the self-join
    shuffles on cluster. Deterministic and oracle-hashable end to end:
    the backbone is the exact integer Lloyd model and the score is the
    shared round-4 cosine, both replayed by `sql_semantic_dedup`.

    `cents` (a `kmeans_centroids` result for the SAME corpus/k/iters)
    skips in-call training — the frozen-model amortization a caller
    uses when the model is memoized per data generation; assignment
    against frozen centroids reproduces `kmeans_clusters` bit-for-bit
    (pinned in test_similarity)."""
    if cents is None:
        cents = kmeans_centroids(
            corpus, k=k, iters=iters, scale=scale,
            id_col=id_col, vec_col=vec_col,
        )
    withv = (
        assign_to_centroids(
            spread(corpus), cents, scale=scale,
            id_col=id_col, vec_col=vec_col, carry=(vec_col,),
        )
        .select(
            id_col, "cluster", vec_col, norm(F.col(vec_col)).alias("_nrm")
        )
        .localCheckpoint()  # 3 consumer branches below; built map-only
        # (vector carried through the assignment — no join-back)
    )
    a = withv.select(
        F.col(id_col).alias("a_id"),
        "cluster",
        F.col(vec_col).alias("avec"),
        F.col("_nrm").alias("_an"),
    )
    b = withv.select(
        F.col(id_col).alias("b_id"),
        "cluster",
        F.col(vec_col).alias("bvec"),
        F.col("_nrm").alias("_bn"),
    )
    drops = (
        a.join(b, "cluster")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            cosine_pre(F.col("avec"), F.col("bvec"), F.col("_an"), F.col("_bn"))
            >= threshold
        )
        .select(F.col("b_id").alias(id_col))
        .distinct()
    )
    return withv.join(drops, id_col, "left_anti").select(id_col, "cluster")


def sql_semantic_dedup(
    threshold: float = 0.99,
    k: int = 4,
    iters: int = 2,
    scale: int = 1_000_000,
    dim: int = 64,
    source_cte: str = "SELECT vec_id, embedding FROM embeddings",
) -> str:
    """DuckDB twin of `semantic_dedup`: the unrolled kmeans chain, a
    within-cluster pair join with the round-4 cosine, and an anti-join
    of the drop set."""
    body, a = _sql_kmeans_ctes(k, iters, scale, source_cte)
    return body + f""",
idx AS (SELECT unnest(range(1, {dim + 1})) AS i),
sd_pairs AS (
  SELECT x.vec_id AS a_id, y.vec_id AS b_id
  FROM {a} x JOIN {a} y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
  JOIN src q ON q.vec_id = x.vec_id
  JOIN src c ON c.vec_id = y.vec_id
  CROSS JOIN idx
  GROUP BY 1, 2
  HAVING round(sum(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))
           / (sqrt(sum(CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
            * sqrt(sum(CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))), 4)
         >= {threshold})
SELECT s.vec_id, s.cluster FROM {a} s
WHERE s.vec_id NOT IN (SELECT b_id FROM sd_pairs)
ORDER BY s.vec_id
"""


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 20,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.): merge N ranked candidate
    lists into one by score(d) = sum over lists of 1 / (rrf_k + rank_d) —
    the standard way to combine a sparse (BM25) and a dense (ANN) ranker
    without calibrating their incomparable scores.

    Scale shape: every input is already a bounded top-N list, so the
    union is |lists| * N rows and the fusion groupBy is tiny — the
    expensive work lives in the rankers, which bound their own output
    (TakeOrdered / per-query windows); fusion never touches the corpus."""
    inv = lambda df: df.select(  # noqa: E731
        F.col(id_col),
        (
            F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(rank_col).cast("double"))
        ).alias("__rrf"),
    )
    u = inv(rankings[0])
    for df in rankings[1:]:
        u = u.unionByName(inv(df))
    return (
        u.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lists"),
            (F.floor(F.sum("__rrf") * 1e6) / 1e6).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.col(id_col))
        .limit(k)
    )


def quantize_embeddings(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column — the storage
    form a 100 TB vector table actually ships (4x smaller than float32,
    8x smaller than float64; dequantize is q * scale). Per-vector
    absmax scaling: scale = max|x| / 127, q_i = floor(x_i / max|x| * 127)
    with sign-symmetric flooring (toward zero), so every output is an
    exact integer in [-127, 127] and the whole operator is bit-portable
    across engines — element-wise expressions only, no sums, no shuffle,
    scan-speed on any corpus size. Zero vectors quantize to all-zero at
    scale 0."""
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    absmax = F.array_max(F.transform(x, lambda v: F.abs(v)))
    q = F.when(absmax == 0.0, F.transform(x, lambda v: F.lit(0).cast("long"))).otherwise(
        F.transform(
            x,
            lambda v: (
                F.signum(v)
                * F.floor(F.abs(v) / absmax * F.lit(127.0))
            ).cast("long"),
        )
    )
    return corpus.select(
        F.col(id_col),
        q.alias("q8"),
        F.floor(absmax / F.lit(127.0) * 1e9).cast("long").alias("scale_e9"),
    )


def sql_quantize_embeddings_flat() -> str:
    """DuckDB twin of the CATALOG-entry projection of
    `quantize_embeddings`: the q8 vector joined to a CSV string so every
    output column is scalar/hashable (the driver's pandas canonicalizer
    cannot factorize list cells — r07 red row)."""
    return f"""
SELECT vec_id, array_to_string(q8, ',') AS q8_csv, scale_e9
FROM ({sql_quantize_embeddings()})
"""


def sql_quantize_embeddings(source: str = "embeddings") -> str:
    """DuckDB twin of `quantize_embeddings` (same expression order)."""
    xm = "list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))))"
    return f"""
WITH e AS (SELECT vec_id, embedding, {xm} AS absmax FROM {source})
SELECT vec_id,
       CASE WHEN absmax = 0.0
            THEN list_transform(embedding, v -> CAST(0 AS BIGINT))
            ELSE list_transform(embedding,
                 v -> CAST(sign(CAST(v AS DOUBLE))
                      * floor(abs(CAST(v AS DOUBLE)) / absmax * 127.0)
                      AS BIGINT))
       END AS q8,
       CAST(floor(absmax / 127.0 * 1000000000) AS BIGINT) AS scale_e9
FROM e
"""


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine top-k over the int8-QUANTIZED vectors — proof the
    compressed storage form (quantize_embeddings) remains directly
    queryable: scoring runs on the quantized table, never dequantizing
    to floats. Cosine over q8 is scale-invariant (the per-vector scale
    cancels), and the dot/norms are sums of INTEGER products (exact in
    long: 127^2 * dim << 2^63), so unlike float ANN the whole ranking is
    bit-deterministic and fully hash-checkable. Same plan shape as
    brute_force_topk: queries broadcast, corpus scanned once, per-query
    top-k window."""
    qz = quantize_embeddings(corpus, id_col=id_col, vec_col=vec_col)
    return quantized_topk_from_table(qz, queries, k=k, id_col=id_col)


def quantized_topk_from_table(
    qz: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """`quantized_topk` with the corpus side read from a MATERIALIZED
    quantized table (id, q8, ... — streaming/retrieval.py's
    quantize_transform) instead of re-quantizing the float corpus per
    query: the standing table IS the compressed storage form, and
    because the whole ranking is integer-exact it reproduces the
    recompute form bit-for-bit. Queries that reference corpus ids fetch
    their q8 from the same table (one broadcast-size join)."""
    idot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    # int64 self-dots are per-ROW facts — once per row, not per pair
    q = queries.join(qz, id_col).select(
        F.col(id_col).alias("query_id"),
        F.col("q8").alias("qv"),
        idot(F.col("q8"), F.col("q8")).alias("_qn"),
    )
    c = qz.select(
        F.col(id_col).alias("match_id"),
        F.col("q8").alias("cv"),
        idot(F.col("q8"), F.col("q8")).alias("_cn"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn(
            "score",
            F.round(
                idot(F.col("qv"), F.col("cv"))
                / F.sqrt(
                    F.col("_qn").cast("double") * F.col("_cn").cast("double")
                ),
                4,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )


def sql_quantized_topk(
    k: int = 10, n_queries: int = 5, source: str = "embeddings"
) -> str:
    """DuckDB twin of `quantized_topk` over the same quantized relation
    (sql_quantize_embeddings inlined)."""
    return f"""
WITH qz AS ({sql_quantize_embeddings(source)}),
q AS (SELECT vec_id AS query_id, q8 AS qv FROM qz WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS match_id, q8 AS cv FROM qz),
idx AS (SELECT unnest(range(1, 65)) AS i),
scored AS (
  SELECT q.query_id, c.match_id,
         round(sum(qv[i] * cv[i])
               / sqrt(CAST(sum(qv[i] * qv[i]) AS DOUBLE)
                      * CAST(sum(cv[i] * cv[i]) AS DOUBLE)), 4) AS score
  FROM q, c, idx
  WHERE q.query_id != c.match_id
  GROUP BY q.query_id, c.match_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, match_id ASC) AS rank
  FROM scored)
SELECT query_id, match_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# --- product quantization (PQ) ----------------------------------------------


def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    ks: int = 8,
    iters: int = 2,
    dim: int = 64,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[int]]]:
    """Train one fixed-point k-means codebook per PQ subspace (Jegou,
    Douze, Schmid 2011, "Product Quantization for Nearest Neighbor
    Search"): the dim-dimensional space splits into `m` contiguous
    sub-vectors of dim/m dims, each clustered independently into `ks`
    codewords. Training is the exact integer Lloyd loop (`_pq_books_fit`
    — all m fits fused into one pass per iteration, bit-identical to m
    independent `_kmeans_fit` calls), so codebooks — and everything
    derived from them — are deterministic and oracle-checkable, unlike
    float PQ. Driver state is m*ks*(dim/m) = ks*dim longs, constant in
    corpus size; training is one-time model fitting, after which
    encode/search never rescan the float corpus."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    return _pq_books_fit(
        corpus, m, ks, iters, dim, scale, id_col, vec_col
    )


def pq_encode(
    vectors: DataFrame,
    books: list[list[list[int]]],
    dim: int = 64,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as `m` codeword ids — the 4-byte-per-subspace
    PQ code that replaces the dim*4-byte float vector in storage (m=4,
    dim=64 : 64x smaller than float32, 16x smaller than the int8 table).
    Map-only: codebooks ride as plan literals, the nearest-codeword pick
    is the same exact integer argmin the trainer used."""
    m = len(books)
    sub = dim // m
    cols = [
        _nearest_int_centroid(
            _quantize(F.slice(F.col(vec_col), s * sub + 1, sub), scale),
            books[s],
        )["idx"]
        for s in range(m)
    ]
    return vectors.select(F.col(id_col), F.array(*cols).alias("codes"))


def _codeword_dists(qsub: Column, book: list[list[int]]) -> Column:
    """array<bigint> of exact integer squared distances from a quantized
    query sub-vector to every codeword, ordered by codeword id — one row
    of the ADC lookup table."""
    bl = F.lit([[int(x) for x in c] for c in book]).cast(
        "array<array<bigint>>"
    )
    return F.transform(
        bl,
        lambda c: F.aggregate(
            F.zip_with(qsub, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    m: int = 4,
    ks: int = 8,
    iters: int = 2,
    k: int = 10,
    dim: int = 64,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance computation (ADC):
    train codebooks, encode the corpus once, then score each (query,
    code) pair as the sum of m lookup-table entries — the query's exact
    integer squared distance to each subspace's ASSIGNED codeword.

    Scale shape: the scan side is the CODES table (m small ints per
    vector — at 100 TB of float vectors, ~1/64th the bytes), queries
    broadcast with their m*ks-entry LUTs precomputed in-plan, per-row
    work is m array lookups instead of dim multiplies, and the per-query
    top-k is the same bounded window as brute_force_topk. Every
    quantity is an exact integer, so ranks (ties broken by match_id)
    hash-match the SQL oracle exactly — the recall/compression tradeoff
    is tested separately against the float brute force."""
    books = pq_codebooks(
        corpus, m, ks, iters, dim, scale, id_col, vec_col
    )
    return pq_topk_with_books(
        corpus, queries, books, k, dim, scale, id_col, vec_col
    )


def pq_topk_with_books(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[list[int]]],
    k: int = 10,
    dim: int = 64,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """`pq_topk` over FROZEN codebooks — the serving shape: a standing
    service trains once, materializes the codes table, and answers
    queries from codes + codebook literals without touching the float
    corpus."""
    return pq_topk_from_codes(
        pq_encode(spread(corpus), books, dim, scale, id_col, vec_col),
        queries,
        books,
        k,
        dim,
        scale,
        id_col,
        vec_col,
    )


def pq_topk_from_codes(
    codes: DataFrame,
    queries: DataFrame,
    books: list[list[list[int]]],
    k: int = 10,
    dim: int = 64,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k with the corpus side read from a MATERIALIZED codes
    table (id, codes — streaming/retrieval.py's pq_codes_transform over
    the frozen codebooks): the standing-service form never touches the
    float corpus at query time, it scans m small ints per vector.
    Bit-identical to the recompute form because encoding is the same
    exact integer argmin the maintainer applied."""
    m = len(books)
    sub = dim // m
    c = codes.select(F.col(id_col).alias("match_id"), "codes")
    luts = F.array(
        *[
            _codeword_dists(
                _quantize(
                    F.slice(F.col(vec_col), s * sub + 1, sub), scale
                ),
                books[s],
            )
            for s in range(m)
        ]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), luts.alias("lut")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn(
            "adist",
            F.aggregate(
                F.zip_with(
                    F.col("lut"),
                    F.col("codes"),
                    lambda l, cd: F.element_at(
                        l, (cd + F.lit(1)).cast("int")
                    ),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "adist", "rank")
    )


def sql_pq_topk(
    m: int = 4,
    ks: int = 8,
    iters: int = 2,
    k: int = 10,
    dim: int = 64,
    n_queries: int = 5,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of `pq_topk`: one prefixed kmeans CTE chain per
    subspace (same seeded init + Lloyd iterations over the sliced
    vectors), query LUT rows as per-(query, codeword) integer distance
    relations against the frozen codebook (`cent{iters-1}` — the
    centroids the final assignment pass measured against), ADC distance
    as the m-way sum over each vector's assigned codewords."""
    sub = dim // m
    chains, finals = [], []
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        body, a = _sql_kmeans_ctes(
            ks,
            iters,
            scale,
            source_cte=(
                f"SELECT vec_id, embedding[{lo}:{hi}] AS embedding"
                " FROM embeddings"
            ),
            prefix=f"s{s}",
        )
        chains.append(body if s == 0 else body.replace("\nWITH ", "\n", 1))
        finals.append((f"s{s}", a))
    qd = ",".join(
        f"""
{p}qd AS (SELECT e.vec_id AS query_id, c.cluster,
          sum((e.val - c.cv) * (e.val - c.cv)) AS d
          FROM {p}e e JOIN {p}cent{iters - 1} c USING (pos)
          WHERE e.vec_id < {n_queries} GROUP BY 1, 2)"""
        for p, _a in finals
    )
    code_joins = " ".join(
        f"JOIN {a} x{i} USING (vec_id)"
        for i, (_p, a) in enumerate(finals)
        if i > 0
    )
    lut_joins = " ".join(
        f"JOIN {p}qd q{i} ON q{i}.cluster = x{i}.cluster"
        + ("" if i == 0 else f" AND q{i}.query_id = q0.query_id")
        for i, (p, _a) in enumerate(finals)
    )
    adist = " + ".join(f"q{i}.d" for i in range(m))
    return (
        ",".join(chains)
        + ","
        + qd
        + f""",
ad AS (SELECT q0.query_id, x0.vec_id AS match_id, {adist} AS adist
       FROM {finals[0][1]} x0 {code_joins}
       {lut_joins}
       WHERE x0.vec_id != q0.query_id),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY adist, match_id) AS rank
           FROM ad)
SELECT query_id, match_id, CAST(adist AS BIGINT) AS adist,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""
    )


# --- binary (1-bit) quantization ---------------------------------------------
#
# The most aggressive point on the embedding-compression ladder the engine
# ships (float32 -> int8 `quantize_embeddings` -> PQ codes -> 1 bit/dim):
# keep only the SIGN of each dimension, packed into machine words.  A
# 64-dim float32 vector (256 B) becomes two 32-bit words in two BIGINTs
# (16 B logical, 2 x 8 B stored) — 16-32x smaller — and angular similarity
# is approximated by Hamming distance over the packed words
# (Charikar 2002's sign-random-projection bound with the identity planes:
# P[sign agree] = 1 - theta/pi).  The scan is pure JVM bit ops
# (XOR + popcount), the cheapest candidate generator possible at 100 TB;
# an exact int8 rerank (quantized_topk's integer cosine) restores ranking
# quality on the bounded candidate set.  Everything is integer arithmetic,
# so unlike float ANN the whole operator — packing, Hamming ranking, rerank
# scores — is bit-deterministic and fully hash-checkable against DuckDB.

BINARY_WORD_BITS = 32


def _n_words(dim: int) -> int:
    return -(-dim // BINARY_WORD_BITS)


def binarize_embeddings(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Pack the sign bits of an embedding into 32-bit words (b0, b1, ...):
    bit j of word w is set iff x[w*32 + j] > 0.  Element-wise expressions
    only — no sums across rows, no shuffle; scan-speed on any corpus size.
    32-bit words (not 64) so the packed value never touches the BIGINT
    sign bit and the same arithmetic is portable to every engine."""
    import functools
    import operator as op

    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    words = []
    for w in range(_n_words(dim)):
        terms = [
            F.when(
                F.element_at(x, w * BINARY_WORD_BITS + j + 1) > 0.0,
                F.lit(1 << j).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for j in range(BINARY_WORD_BITS)
            if w * BINARY_WORD_BITS + j < dim
        ]
        words.append(
            functools.reduce(op.add, terms).cast("long").alias(f"b{w}")
        )
    return corpus.select(F.col(id_col), *words)


def sql_binarize_embeddings(dim: int = 64) -> str:
    """DuckDB twin of `binarize_embeddings` (same bit layout)."""
    word_exprs = []
    for w in range(_n_words(dim)):
        terms = " + ".join(
            f"CASE WHEN CAST(embedding[{w * BINARY_WORD_BITS + j + 1}] AS DOUBLE) > 0.0"
            f" THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
            for j in range(BINARY_WORD_BITS)
            if w * BINARY_WORD_BITS + j < dim
        )
        word_exprs.append(f"({terms}) AS b{w}")
    return (
        "SELECT vec_id, " + ", ".join(word_exprs) + " FROM embeddings"
    )


def hamming_distance(n_words: int, left: str, right: str) -> Column:
    """Hamming distance between two packed sign-bit rows: XOR + popcount
    per word — whole-stage-codegen integer ops, no branching."""
    import functools
    import operator as op

    return functools.reduce(
        op.add,
        [
            F.bit_count(
                F.col(f"{left}.b{w}").bitwiseXOR(F.col(f"{right}.b{w}"))
            )
            for w in range(n_words)
        ],
    ).cast("long")


def binary_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Two-stage ANN over the 1-bit storage form: (1) Hamming scan of the
    packed sign bits keeps the `rerank` nearest candidates per query
    (deterministic cut: Hamming asc, id asc); (2) exact int8 cosine
    (quantized_topk's integer arithmetic) re-ranks the bounded candidate
    set to the final top-k.  Queries broadcast; the corpus is scanned once
    at 2 BIGINTs/row; the rerank join touches |queries| * rerank rows —
    never the corpus."""
    bz = binarize_embeddings(corpus, id_col=id_col, vec_col=vec_col, dim=dim)
    qz = quantize_embeddings(corpus, id_col=id_col, vec_col=vec_col)
    return binary_topk_from_tables(
        bz, qz, queries, k=k, rerank=rerank, id_col=id_col, dim=dim
    )


def binary_topk_from_tables(
    bz: DataFrame,
    qz: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank: int = 40,
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """`binary_topk` with both stages read from MATERIALIZED tables: the
    packed sign-bit table (streaming/retrieval.py's binarize_transform —
    2 BIGINTs/row, the candidate-scan form) and the int8 table
    (quantize_transform — the rerank form). The two standing indexes
    compose; the float corpus is never touched, and because every step
    is integer-exact the result is bit-identical to the recompute
    form."""
    n_words = _n_words(dim)
    q = (
        queries.join(bz, id_col)
        .select(
            F.col(id_col).alias("query_id"),
            *[F.col(f"b{w}").alias(f"b{w}") for w in range(n_words)],
        )
        .alias("q")
    )
    c = bz.select(
        F.col(id_col).alias("match_id"),
        *[F.col(f"b{w}") for w in range(n_words)],
    ).alias("c")
    cand = (
        c.join(F.broadcast(q))
        .filter(F.col("c.match_id") != F.col("q.query_id"))
        .select(
            F.col("q.query_id"),
            F.col("c.match_id"),
            hamming_distance(n_words, "c", "q").alias("hamming"),
        )
    )
    wh = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("match_id")
    )
    shortlist = (
        cand.withColumn("hrank", F.row_number().over(wh))
        .filter(F.col("hrank") <= rerank)
        .drop("hrank")
    )
    qz = qz.select(F.col(id_col), "q8")
    idot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        F.broadcast(shortlist)
        .join(
            qz.select(F.col(id_col).alias("query_id"), F.col("q8").alias("qv")),
            "query_id",
        )
        .join(
            qz.select(F.col(id_col).alias("match_id"), F.col("q8").alias("cv")),
            "match_id",
        )
        .withColumn(
            "score",
            F.round(
                idot(F.col("qv"), F.col("cv"))
                / F.sqrt(
                    idot(F.col("qv"), F.col("qv")).cast("double")
                    * idot(F.col("cv"), F.col("cv")).cast("double")
                ),
                4,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "match_id",
            "hamming",
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def sql_binary_topk(
    k: int = 10, n_queries: int = 5, rerank: int = 40, dim: int = 64
) -> str:
    """DuckDB twin of `binary_topk`: same packing, same Hamming cut, same
    integer-cosine rerank (sql_quantize_embeddings inlined)."""
    n_words = _n_words(dim)
    ham = " + ".join(
        f"bit_count(xor(c.b{w}, q.b{w}))" for w in range(n_words)
    )
    return f"""
WITH bz AS ({sql_binarize_embeddings(dim)}),
q AS (SELECT vec_id AS query_id, * EXCLUDE (vec_id) FROM bz
      WHERE vec_id < {n_queries}),
cand AS (
  SELECT q.query_id, c.vec_id AS match_id,
         CAST({ham} AS BIGINT) AS hamming
  FROM bz c, q WHERE c.vec_id != q.query_id),
shortlist AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY hamming ASC, match_id ASC) AS hrank
    FROM cand) WHERE hrank <= {rerank}),
qz AS ({sql_quantize_embeddings()}),
idx AS (SELECT unnest(range(1, {dim + 1})) AS i),
scored AS (
  SELECT s.query_id, s.match_id, s.hamming,
         round(sum(a.q8[i] * b.q8[i])
               / sqrt(CAST(sum(a.q8[i] * a.q8[i]) AS DOUBLE)
                      * CAST(sum(b.q8[i] * b.q8[i]) AS DOUBLE)), 4) AS score
  FROM shortlist s
  JOIN qz a ON a.vec_id = s.query_id
  JOIN qz b ON b.vec_id = s.match_id
  CROSS JOIN idx
  GROUP BY 1, 2, 3),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, match_id ASC) AS rank
  FROM scored)
SELECT query_id, match_id, hamming, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# --- PCA top component via fixed-point power iteration -----------------------
#
# Completes the PCA pipeline the exact covariance relation
# (embedding_covariance) exists for: the dominant principal direction by
# power iteration (von Mises & Pollaczek-Geiringer 1929) run ENTIRELY in
# integer arithmetic — the covariance ints are bounded driver state
# (dim^2 values), the iteration is pure-Python bigint-free int64 math
# mirrored exactly by an unrolled SQL chain, and the corpus projection is
# one map-only in-order integer fold per row. No numpy/libm anywhere, so
# unlike an eigh-based PCA the whole operator — direction AND projections
# — is bit-portable and hash-checkable cross-engine.

PCA_ITERS = 16
PCA_VNORM = 1 << 12  # iteration vector max-abs normalization target
PCA_A_SHRINK = 128  # pre-shrink covariance ints so A*v stays in int64


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (DuckDB's `//`, Spark's
    `div`) — Python's // floors, which differs on negatives."""
    q = abs(a) // b
    return q if a >= 0 else -q


def pca_power_component(
    corpus: DataFrame,
    iters: int = PCA_ITERS,
    dim: int = 64,
    scale: int = 10_000,
    vec_col: str = "embedding",
) -> list[int]:
    """The dominant covariance eigendirection as a fixed-point integer
    vector (max-abs = PCA_VNORM, sign fixed by the first nonzero entry):
    collect the exact dim^2 covariance relation (bounded driver state,
    like the kmeans centroids), then `iters` integer matvec + rescale
    rounds. Every op is trunc-division int64 arithmetic reproduced
    verbatim by the unrolled SQL twin."""
    import math

    rows = embedding_covariance(
        corpus, dim=dim, scale=scale, vec_col=vec_col
    ).collect()
    a = {(r.i, r.j): _tdiv(math.trunc(r.cov), PCA_A_SHRINK) for r in rows}
    v = [PCA_VNORM] * dim
    for _t in range(iters):
        w = [
            sum(a.get((i, j), 0) * v[j - 1] for j in range(1, dim + 1))
            for i in range(1, dim + 1)
        ]
        m = max(abs(x) for x in w)
        if m == 0:
            break
        v = [_tdiv(x * PCA_VNORM, m) for x in w]
    for x in v:
        if x != 0:
            if x < 0:
                v = [-y for y in v]
            break
    return v


def pca_project(
    corpus: DataFrame,
    component: list[int],
    scale: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project every vector onto the component, centered without floats:
    pc1 = n * (q . v) - sum_rows(q . v) (all int64; the subtraction IS
    mean-centering scaled by n). One map-only fold per row with the
    component as plan literals + a 1-row broadcast total."""
    vlits = F.array(*[F.lit(int(x)).cast("long") for x in component])
    q = spread(corpus).select(
        F.col(id_col), _quantize(F.col(vec_col), scale).alias("qv")
    )
    dots = q.select(
        F.col(id_col),
        F.aggregate(
            F.zip_with(F.col("qv"), vlits, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot"),
    )
    tot = dots.agg(
        F.sum("dot").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return dots.join(F.broadcast(tot)).select(
        F.col(id_col),
        (F.col("n") * F.col("dot") - F.col("s")).cast("long").alias("pc1"),
    )


def sql_pca_project(
    iters: int = PCA_ITERS, dim: int = 64, scale: int = 10_000
) -> str:
    """DuckDB twin: the same covariance ints, the same unrolled integer
    power iteration (trunc `//` division), the same centered integer
    projection."""
    parts = [
        f"""cv AS MATERIALIZED (
  SELECT i, j, CAST(trunc(cov) AS BIGINT) // {PCA_A_SHRINK} AS a
  FROM ({sql_embedding_covariance(dim, scale)}))""",
        f"""v0 AS MATERIALIZED (
  SELECT unnest(range(1, {dim + 1})) AS j,
         CAST({PCA_VNORM} AS BIGINT) AS x)""",
    ]
    for t in range(iters):
        parts.append(
            f"""w{t} AS MATERIALIZED (
  SELECT cv.i AS j, CAST(sum(cv.a * v{t}.x) AS BIGINT) AS x
  FROM cv JOIN v{t} ON cv.j = v{t}.j GROUP BY 1)"""
        )
        parts.append(
            f"""m{t} AS MATERIALIZED (SELECT max(abs(x)) AS m FROM w{t})"""
        )
        parts.append(
            f"""v{t + 1} AS MATERIALIZED (
  SELECT j, CASE WHEN (SELECT m FROM m{t}) = 0 THEN x
               ELSE (x * {PCA_VNORM}) // (SELECT m FROM m{t}) END AS x
  FROM w{t})"""
        )
    parts.append(
        f"""sgn AS MATERIALIZED (
  SELECT CASE WHEN (SELECT x FROM v{iters} WHERE x != 0 ORDER BY j LIMIT 1) < 0
              THEN -1 ELSE 1 END AS s)""",
    )
    parts.append(
        f"""comp AS MATERIALIZED (
  SELECT j, x * (SELECT s FROM sgn) AS x FROM v{iters})"""
    )
    qz = (
        "list_transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE)"
        f" * {scale}) AS BIGINT))"
    )
    parts.append(
        f"""dots AS MATERIALIZED (
  SELECT vec_id, CAST(sum(qv[j] * c.x) AS BIGINT) AS dot
  FROM (SELECT vec_id, {qz} AS qv FROM embeddings), comp c
  WHERE j BETWEEN 1 AND {dim}
  GROUP BY vec_id)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
tot AS (SELECT CAST(sum(dot) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n FROM dots)
SELECT vec_id, CAST(n * dot - s AS BIGINT) AS pc1
FROM dots, tot
"""
    )


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    overfetch: int = 15,
    dup_ceiling: float = 0.95,
    id_col: str = "vec_id",
) -> DataFrame:
    """HARD-NEGATIVE mining for contrastive training (the DPR recipe,
    Karpukhin et al. 2020): per anchor, the nearest neighbors that are
    NOT near-duplicates — close enough to be informative negatives,
    far enough to not be false negatives. Overfetch the exact int8
    top-`overfetch`, drop candidates at/above the near-dup ceiling
    (rounded integer-cosine comparison — exact), re-rank the rest.
    Same scale shape as quantized_topk: queries broadcast, corpus
    scanned once, per-query bounded window."""
    cand = quantized_topk(corpus, queries, k=overfetch, id_col=id_col)
    f = cand.filter(F.col("score") < F.lit(dup_ceiling)).drop("rank")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("match_id")
    )
    return (
        f.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def sql_hard_negative_topk(
    k: int = 10,
    n_queries: int = 5,
    overfetch: int = 15,
    dup_ceiling: float = 0.95,
    source: str = "embeddings",
    prefix_ctes: str = "",
) -> str:
    """DuckDB twin of `hard_negative_topk`. `prefix_ctes` lets the
    caller define `source` as a CTE (e.g. the planted-twin corpus)."""
    pre = f"{prefix_ctes}," if prefix_ctes else ""
    return f"""
WITH {pre}
base AS ({sql_quantized_topk(overfetch, n_queries, source)}),
f AS (SELECT query_id, match_id, score FROM base
      WHERE score < {dup_ceiling!r}),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, match_id ASC)
                AS rank
      FROM f)
SELECT query_id, match_id, score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def label_centroids(
    corpus: DataFrame,
    scale: int = 1_000_000,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> tuple[list[int], list[list[int]]]:
    """Per-label class centroids as EXACT integers: floor(sum/count) of
    the fixed-point corpus, element-wise. One posexplode -> groupBy whose
    shuffle carries |labels| * dim rows after map-side combine; the
    driver collects exactly that many longs (same bounded-collect
    contract as kmeans_centroids). Returns (labels sorted ascending,
    centroids in the same order)."""
    rows = (
        corpus.select(
            F.col(label_col).alias("lbl"),
            F.posexplode(_quantize(F.col(vec_col), scale)).alias(
                "pos", "val"
            ),
        )
        .groupBy("lbl", "pos")
        .agg(
            F.floor(
                F.sum("val").cast("double") / F.count(F.lit(1))
            )
            .cast("long")
            .alias("cv")
        )
        .collect()
    )
    by: dict[int, dict[int, int]] = {}
    for r in rows:
        by.setdefault(r.lbl, {})[r.pos] = r.cv
    labels = sorted(by)
    return labels, [
        [by[lbl][p] for p in range(len(by[lbl]))] for lbl in labels
    ]


def label_noise_matrix(
    corpus: DataFrame,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Label-noise detection (confident-learning-style): assign every
    vector to its nearest CLASS centroid; off-diagonal confusion cells
    are suspected mislabels. Output one row per (label, nearest_label):
    n_vecs and avg_margin = mean(own-centroid dist - nearest dist), the
    confidence of the disagreement (0 on the diagonal by construction).

    Exactness: centroids are floor(sum/count) integers (label_centroids)
    and distances exact int64 sums, so the argmin and the margin are
    bit-identical on both engines; avg_margin is ONE double division.
    Scale shape: after the |labels|*dim centroid fold, the scan is
    map-only (centroids are plan literals walked by a JVM higher-order
    fold, as in kmeans) into a |labels|^2-row groupBy."""
    labels, cents = label_centroids(corpus, scale, label_col, vec_col)
    lbl_lit = F.lit(labels)
    q = _quantize(F.col(vec_col), scale)
    dists = _int_centroid_dists(q, cents)
    near = dists[0]
    own_idx = F.array_position(lbl_lit, F.col(label_col)) - 1
    own_d = F.filter(dists, lambda d: d["idx"] == own_idx)[0]["dist"]
    scored = corpus.select(
        F.col(label_col).alias("label"),
        F.element_at(lbl_lit, (near["idx"] + 1).cast("int")).alias(
            "nearest_label"
        ),
        (own_d - near["dist"]).alias("margin"),
    )
    return scored.groupBy("label", "nearest_label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        (
            F.sum("margin").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_margin"),
    )


def sql_label_noise(scale: int = 1_000_000) -> str:
    """DuckDB twin of `label_noise_matrix` — the same floor(sum/count)
    centroids and exact integer distances, in long form."""
    return f"""
WITH qv AS (SELECT vec_id, label,
              list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))
                AS q
            FROM embeddings),
e AS (SELECT vec_id, label, i AS pos, q[i] AS val
      FROM qv, UNNEST(range(1, len(q) + 1)) AS u(i)),
cent AS (SELECT label AS clabel, pos,
           CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)) AS BIGINT)
             AS cv
         FROM e GROUP BY 1, 2),
d AS (SELECT e.vec_id, e.label, c.clabel,
        sum((e.val - c.cv) * (e.val - c.cv)) AS d
      FROM e JOIN cent c USING (pos) GROUP BY 1, 2, 3),
n AS (SELECT vec_id, label, clabel AS nearest_label, d,
        row_number() OVER (PARTITION BY vec_id ORDER BY d, clabel) AS rn
      FROM d),
own AS (SELECT vec_id, d AS own_d FROM d WHERE label = clabel),
pick AS (SELECT n.vec_id, n.label, n.nearest_label, n.d AS near_d,
                own.own_d
         FROM n JOIN own USING (vec_id) WHERE rn = 1)
SELECT label, nearest_label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(own_d - near_d) AS DOUBLE) / count(*) AS avg_margin
FROM pick GROUP BY 1, 2
"""


# --- k-center (farthest-point) diversity sampling ----------------------------
#
# Coreset selection for training-data curation (Sener & Savarese 2018,
# "Active Learning for CNNs: A Core-Set Approach"; the greedy 2-approx
# of Gonzalez 1985): iteratively pick the vector FARTHEST from everything
# picked so far, maximizing coverage of the embedding space — the
# opposite pull from semantic dedup (which removes the redundant middle,
# while k-center keeps the extremes that a random or cluster-balanced
# sample under-weights). Exact fixed-point integer distances, so the
# selection is bit-deterministic and oracle-checkable.


def kcenter_sample(
    vecs: DataFrame,
    k: int = 8,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center selection: (rank, vec_id, min_dist_sq) — the
    selection order, and each pick's squared distance to the set already
    chosen (the seed, the smallest id, carries 0; the LAST pick's
    distance is the k-center coverage radius).

    Scale shape: the quantized corpus is localCheckpointed once; each of
    the k-1 rounds is one MAP-ONLY constant-size pass (the running
    min-distance to the chosen set is carried incrementally — one
    1-center zip_with fold + least per round, O(n * dim) work instead of
    O(n * r * dim)) into a TakeOrdered(1) — no shuffle, no join; driver
    state is O(k * dim) center literals, the kmeans precedent. The k
    passes are the algorithm's nature: at corpus scale you run it on an
    already-reduced relation (kmeans centroids, a cluster-balanced
    sample), which is the paper's own deployment shape."""
    q = _quantized(vecs, scale, id_col, vec_col).localCheckpoint()
    picked, _ = _kcenter_greedy(q, k)
    spark = vecs.sparkSession
    return spark.createDataFrame(
        picked, "rank long, vec_id long, min_dist_sq long"
    )


def _quantized(vecs, scale, id_col, vec_col):
    return spread(vecs).select(
        F.col(id_col).alias("vec_id"),
        F.expr(
            f"transform({vec_col}, "
            f"x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))"
        ).alias("q"),
    )


def _min_dist_expr(centers):
    """min over plan-literal centers of the exact integer squared
    distance to column `q` (zip_with fold; map-side only)."""
    dists = [
        F.aggregate(
            F.zip_with(
                F.col("q"),
                F.array(*[F.lit(int(v)) for v in c]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        for c in centers
    ]
    return F.least(*dists) if len(dists) > 1 else dists[0]


def _kcenter_greedy(q, k):
    """The Gonzalez greedy rounds over a (vec_id, q) relation: seed =
    smallest id, then k-1 farthest-point picks.

    The running min-distance to the chosen set is carried INCREMENTALLY
    (d_r = least(d_{r-1}, dist to the newest center), materialized per
    round): each round is one constant-size map pass over the corpus —
    one 1-center distance + a least — instead of re-deriving min over
    all r centers (whose plan grows r*dim literals per round and whose
    work grows O(r * n * dim)).  Bit-identical picks and distances: min
    of mins equals min over all, and the pick's reported distance is the
    carried d BEFORE its own center joins the set, exactly as before."""
    seed = q.orderBy("vec_id").limit(1).collect()[0]
    picked = [(1, int(seed["vec_id"]), 0)]
    centers = [list(seed["q"])]
    cur = q.select(
        "vec_id", "q", _min_dist_expr(centers[:1]).alias("d")
    ).localCheckpoint()
    for rank in range(2, k + 1):
        chosen = [pid for _, pid, _ in picked]
        row = (
            cur.filter(~F.col("vec_id").isin(chosen))
            .orderBy(F.desc("d"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        picked.append((rank, int(row["vec_id"]), int(row["d"])))
        centers.append(list(row["q"]))
        if rank < k:
            cur = cur.select(
                "vec_id",
                "q",
                F.least(
                    F.col("d"), _min_dist_expr(centers[-1:])
                ).alias("d"),
            ).localCheckpoint()
    return picked, centers


def _kcenter_greedy_local(rows, k):
    """`_kcenter_greedy` over an ALREADY-COLLECTED candidate list of
    (vec_id, q) — the sample-then-refine path's inner loop runs on the
    driver instead of as k Spark jobs over an m-row relation (the
    candidate set is bounded driver state by contract, so collecting it
    once is strictly cheaper than scanning it k times as jobs).
    Bit-identical: exact integer squared distances (Python ints), the
    same farthest-point pick with ties to the smallest id, and each
    pick's reported distance is the min over the centers chosen so far
    (maintained incrementally — min of mins equals min over all)."""
    rows = [(int(v), [int(x) for x in q]) for v, q in rows]
    seed_id, seed_q = min(rows, key=lambda r: r[0])
    picked = [(1, seed_id, 0)]
    centers = [list(seed_q)]
    # running min squared distance to the chosen set, per candidate
    dist = {
        v: sum((a - b) * (a - b) for a, b in zip(q, seed_q))
        for v, q in rows
        if v != seed_id
    }
    qs = {v: q for v, q in rows}
    for rank in range(2, k + 1):
        far_id = max(dist, key=lambda v: (dist[v], -v))
        far_d = dist.pop(far_id)
        picked.append((rank, far_id, far_d))
        c = qs[far_id]
        centers.append(list(c))
        for v in dist:
            q = qs[v]
            d = sum((a - b) * (a - b) for a, b in zip(q, c))
            if d < dist[v]:
                dist[v] = d
    return picked, centers


def kcenter_sample_refined(
    vecs: DataFrame,
    k: int = 8,
    m: int = 64,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sample-then-refine k-center — the AT-SCALE form of
    `kcenter_sample` (the exact greedy's k corpus passes are inherent
    to farthest-point; this caps corpus passes at TWO regardless of k,
    the same first-pass/verifier split as the dedup family's
    LSH-first-exact-verify):

    1. ONE distributed pass draws m candidates deterministically — the
       m smallest portable-hash values (TakeOrdered over the quantized
       corpus; no rand(), so the draw is growth-stable and
       reproducible in the SQL twin);
    2. the Gonzalez greedy runs its k rounds over the m-row candidate
       relation only — bounded work independent of corpus size;
    3. ONE final map-only corpus pass computes the TRUE full-corpus
       coverage radius against the chosen centers, so the quality cost
       of sampling is measured and reported, never hidden: the 2-approx
       guarantee holds w.r.t. the sample, and an isolated outlier the
       hash draw missed shows up as a larger `radius_sq`.

    Returns (rank, vec_id, min_dist_sq, radius_sq): per-pick distances
    are within-sample; radius_sq is the same full-corpus scalar on
    every row.  Driver state is O(m * dim) candidate vectors."""
    q = _quantized(vecs, scale, id_col, vec_col).localCheckpoint()
    cand = (
        q.select(
            hash60(F.col("vec_id").cast("string"), seed="kcenter")
            .alias("h"),
            "vec_id",
            "q",
        )
        .orderBy("h", "vec_id")
        .limit(m)
        .select("vec_id", "q")
        .collect()  # O(m * dim) driver state by contract
    )
    if len(cand) < k:
        raise ValueError(f"sample of {m} yielded fewer than k={k} rows")
    picked, centers = _kcenter_greedy_local(
        [(r["vec_id"], r["q"]) for r in cand], k
    )
    radius = q.agg(
        F.max(_min_dist_expr(centers)).cast("long").alias("radius_sq")
    )
    spark = vecs.sparkSession
    return spark.createDataFrame(
        picked, "rank long, vec_id long, min_dist_sq long"
    ).crossJoin(F.broadcast(radius))


def sql_kcenter_sample(k: int = 8, scale: int = 1_000_000) -> str:
    """DuckDB twin of `kcenter_sample`: the greedy rounds unrolled as
    CTE chains over the same exact integers (the `sql_kmeans` style).
    The chain CTEs are MATERIALIZED: each round references the previous
    selection three times (distance join, NOT-IN screen, union), and
    DuckDB inlines plain CTEs — 3^k re-evaluations of the whole chain
    without the hint (measured 270 s at sf0.01; ~1 s materialized)."""
    head = f"""
WITH src AS (SELECT vec_id, embedding FROM embeddings),
qv AS (SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS q
       FROM src),
e AS MATERIALIZED (SELECT vec_id, i AS pos, q[i] AS val
      FROM qv, UNNEST(range(1, len(q) + 1)) AS u(i)),
sall1 AS MATERIALIZED (SELECT vec_id, 1 AS rank, CAST(0 AS BIGINT) AS d
          FROM (SELECT min(vec_id) AS vec_id FROM qv))"""
    parts = [head]
    for i in range(2, k + 1):
        prev = f"sall{i - 1}"
        parts.append(f"""
d{i} AS (SELECT a.vec_id, s.vec_id AS sid,
                sum((a.val - b.val) * (a.val - b.val)) AS d
         FROM e a
         JOIN {prev} s ON true
         JOIN e b ON b.vec_id = s.vec_id AND b.pos = a.pos
         WHERE a.vec_id NOT IN (SELECT vec_id FROM {prev})
         GROUP BY 1, 2),
m{i} AS MATERIALIZED (SELECT vec_id, min(d) AS d FROM d{i} GROUP BY 1),
n{i} AS (SELECT vec_id, {i} AS rank, d FROM
         (SELECT vec_id, d,
                 row_number() OVER (ORDER BY d DESC, vec_id) AS rn
          FROM m{i}) WHERE rn = 1),
sall{i} AS MATERIALIZED (SELECT * FROM {prev} UNION ALL
            SELECT * FROM n{i})""")
    return (
        ",".join(parts)
        + f"""
SELECT CAST(rank AS BIGINT) AS rank, vec_id,
       CAST(d AS BIGINT) AS min_dist_sq
FROM sall{k}
"""
    )


def sql_kcenter_sample_refined(
    k: int = 8, m: int = 64, scale: int = 1_000_000
) -> str:
    """DuckDB twin of `kcenter_sample_refined`: the same hash-ordered
    m-candidate draw (hash60 is portable), the greedy chain unrolled
    over the candidate relation only, and the full-corpus radius as a
    final aggregate over the unsampled exploded table."""
    hexpr = hash60_sql("CAST(vec_id AS VARCHAR)", seed="kcenter")
    head = f"""
WITH src AS (SELECT vec_id, embedding FROM embeddings),
qv AS (SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS q
       FROM src),
e AS MATERIALIZED (SELECT vec_id, i AS pos, q[i] AS val
      FROM qv, UNNEST(range(1, len(q) + 1)) AS u(i)),
cand AS MATERIALIZED (SELECT vec_id FROM qv
      ORDER BY {hexpr}, vec_id LIMIT {m}),
ec AS MATERIALIZED (SELECT e.* FROM e JOIN cand USING (vec_id)),
sall1 AS MATERIALIZED (SELECT vec_id, 1 AS rank, CAST(0 AS BIGINT) AS d
          FROM (SELECT min(vec_id) AS vec_id FROM cand))"""
    parts = [head]
    for i in range(2, k + 1):
        prev = f"sall{i - 1}"
        parts.append(f"""
d{i} AS (SELECT a.vec_id, s.vec_id AS sid,
                sum((a.val - b.val) * (a.val - b.val)) AS d
         FROM ec a
         JOIN {prev} s ON true
         JOIN ec b ON b.vec_id = s.vec_id AND b.pos = a.pos
         WHERE a.vec_id NOT IN (SELECT vec_id FROM {prev})
         GROUP BY 1, 2),
m{i} AS MATERIALIZED (SELECT vec_id, min(d) AS d FROM d{i} GROUP BY 1),
n{i} AS (SELECT vec_id, {i} AS rank, d FROM
         (SELECT vec_id, d,
                 row_number() OVER (ORDER BY d DESC, vec_id) AS rn
          FROM m{i}) WHERE rn = 1),
sall{i} AS MATERIALIZED (SELECT * FROM {prev} UNION ALL
            SELECT * FROM n{i})""")
    parts.append(f"""
rad AS MATERIALIZED (
  SELECT CAST(max(md) AS BIGINT) AS radius_sq FROM (
    SELECT dd.vec_id, min(dd.d) AS md FROM (
      SELECT a.vec_id, s.vec_id AS sid,
             sum((a.val - b.val) * (a.val - b.val)) AS d
      FROM e a
      JOIN sall{k} s ON true
      JOIN e b ON b.vec_id = s.vec_id AND b.pos = a.pos
      GROUP BY 1, 2) dd
    GROUP BY 1) mm)""")
    return (
        ",".join(parts)
        + f"""
SELECT CAST(rank AS BIGINT) AS rank, vec_id,
       CAST(d AS BIGINT) AS min_dist_sq, radius_sq
FROM sall{k}, rad
"""
    )


def class_separation(
    corpus: DataFrame,
    scale: int = 1_000_000,
    label_col: str = "label",
    vec_col: str = "embedding",
    gcent: list[int] | None = None,
) -> DataFrame:
    """Per-class Fisher separation over the embedding corpus — the
    labeled-data health screen beside `label_noise_matrix`: for every
    label, the between-class scatter (squared distance of the class
    centroid to the GLOBAL centroid) against the within-class scatter
    (mean squared distance of members to their own centroid). A class
    whose fisher ratio collapses toward 0 is indistinguishable from the
    corpus mean — mislabeled, duplicated, or an encoder failure —
    exactly what a training-mix owner checks before weighting classes.

    Exactness: centroids are the floor(sum/count) integers of
    `label_centroids` (the global centroid the same fold over all rows),
    distances exact int64 sums; `fisher` is between*n/within in IEEE
    doubles, one multiply + one divide, NULL-guarded when a class has
    zero within-scatter. Scale shape: one |labels|*dim centroid fold +
    one dim-row global fold, then a MAP-ONLY pass against plan-literal
    centroids (the label_noise/kmeans precedent) into a |labels|-row
    groupBy; between-distances are driver math on |labels|*dim longs."""
    labels, cents = label_centroids(corpus, scale, label_col, vec_col)
    if gcent is None:
        gcent = global_centroid(corpus, scale, vec_col)
    between = {
        lbl: sum((c - g) ** 2 for c, g in zip(cv, gcent))
        for lbl, cv in zip(labels, cents)
    }
    lbl_lit = F.lit(labels)
    dists = _int_centroid_dists(_quantize(F.col(vec_col), scale), cents)
    own_idx = F.array_position(lbl_lit, F.col(label_col)) - 1
    own_d = F.filter(dists, lambda d: d["idx"] == own_idx)[0]["dist"]
    per = (
        corpus.select(F.col(label_col).alias("label"), own_d.alias("own_d"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("own_d").cast("long").alias("within_sum"),
        )
    )
    bt = corpus.sparkSession.createDataFrame(
        [(int(lbl), int(between[lbl])) for lbl in labels],
        "label long, between_d long",
    )
    return per.join(F.broadcast(bt), "label").withColumn(
        "fisher",
        F.when(
            F.col("within_sum") > 0,
            F.col("between_d").cast("double")
            * F.col("n_vecs")
            / F.col("within_sum"),
        ),
    )


def sql_class_separation(scale: int = 1_000_000) -> str:
    """DuckDB twin of `class_separation` — the same floor(sum/count)
    centroids (per label and global) and exact integer scatters."""
    return f"""
WITH qv AS (SELECT vec_id, label,
              list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))
                AS q
            FROM embeddings),
e AS (SELECT vec_id, label, i AS pos, q[i] AS val
      FROM qv, UNNEST(range(1, len(q) + 1)) AS u(i)),
cent AS (SELECT label AS clabel, pos,
           CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)) AS BIGINT)
             AS cv
         FROM e GROUP BY 1, 2),
gcent AS (SELECT pos,
            CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)) AS BIGINT)
              AS gv
          FROM e GROUP BY 1),
btw AS (SELECT clabel AS label,
          CAST(sum((cv - gv) * (cv - gv)) AS BIGINT) AS between_d
        FROM cent JOIN gcent USING (pos) GROUP BY 1),
own AS (SELECT e.vec_id, e.label,
          sum((e.val - c.cv) * (e.val - c.cv)) AS own_d
        FROM e JOIN cent c ON c.pos = e.pos AND c.clabel = e.label
        GROUP BY 1, 2),
per AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
          CAST(sum(own_d) AS BIGINT) AS within_sum
        FROM own GROUP BY 1)
SELECT p.label, n_vecs, within_sum, between_d,
       CASE WHEN within_sum > 0
            THEN CAST(between_d AS DOUBLE) * n_vecs / within_sum
       END AS fisher
FROM per p JOIN btw USING (label)
"""


def pair_cosine(
    pairs: DataFrame,
    vecs: DataFrame,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Append the exact fixed-point cosine (`cos4`, floored to 1e-4) of
    each (d1, d2) pair's embeddings to an explicit pair relation — the
    cross-modal agreement primitive: the pair generator (text near-dup,
    entity match, label block) says two rows are the same thing; this
    says whether the embedding space agrees. dot and both norms are
    exact int64 sums over the fixed-point vectors, cos is one IEEE
    divide of a correctly-rounded sqrt, NULL when either side is the
    zero vector. Scale shape: two equi-joins of the pair relation
    against the quantized corpus — work scales with |pairs|, never
    all-pairs; the arithmetic is JVM higher-order folds, map-side."""
    q = _quantized(vecs, scale, id_col, vec_col)
    zero = F.lit(0).cast("long")

    def dot(x, y):
        return F.aggregate(
            F.zip_with(F.col(x), F.col(y), lambda u, v: u * v),
            zero,
            lambda acc, v: acc + v,
        )

    # The int64 self-dots are per-ROW facts: compute them once on the
    # quantized corpus, not once per pair (integer sums — bit-identical
    # wherever they are evaluated).
    a = q.select(
        F.col("vec_id").alias("d1"),
        F.col("q").alias("q1"),
        dot("q", "q").alias("n1"),
    )
    b = q.select(
        F.col("vec_id").alias("d2"),
        F.col("q").alias("q2"),
        dot("q", "q").alias("n2"),
    )

    cos4 = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0),
        F.floor(
            F.col("dot").cast("double")
            / F.sqrt(F.col("n1").cast("double") * F.col("n2").cast("double"))
            * F.lit(10000)
        )
        / F.lit(10000.0),
    )
    return (
        pairs.join(a, "d1")
        .join(b, "d2")
        .withColumn("dot", dot("q1", "q2"))
        .withColumn("cos4", cos4)
        .drop("q1", "q2", "dot", "n1", "n2")
    )


def sql_pair_cosine(pairs_sql: str, scale: int = 1_000_000) -> str:
    """DuckDB twin of `pair_cosine` over a (d1, d2, jaccard) pair query
    on the documents table, joined to the embeddings view by id.

    Edge parity (ADVICE r11): a zero-length embedding UNNESTs to no
    rows, so the aggregate CTE never sees that pair — the final
    projection therefore drives from the PAIRS relation (inner-joined
    to qv so both ids must exist, exactly Spark's equi-joins) with a
    LEFT JOIN to the aggregates, surfacing degenerate pairs with NULL
    cos4 on both engines."""
    return f"""
WITH pairs AS MATERIALIZED ({pairs_sql}),
qv AS (SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS q
       FROM embeddings),
e AS (SELECT vec_id, i AS pos, q[i] AS val
      FROM qv, UNNEST(range(1, len(q) + 1)) AS u(i)),
d AS (SELECT p.d1, p.d2,
        sum(e1.val * e2.val) AS dot,
        sum(e1.val * e1.val) AS n1,
        sum(e2.val * e2.val) AS n2
      FROM pairs p
      JOIN e e1 ON e1.vec_id = p.d1
      JOIN e e2 ON e2.vec_id = p.d2 AND e2.pos = e1.pos
      GROUP BY 1, 2)
SELECT p.d1, p.d2, p.jaccard,
       CASE WHEN d.n1 > 0 AND d.n2 > 0
            THEN floor(CAST(d.dot AS DOUBLE)
                       / sqrt(CAST(d.n1 AS DOUBLE) * CAST(d.n2 AS DOUBLE))
                       * 10000) / 10000.0
       END AS cos4
FROM pairs p
JOIN qv v1 ON v1.vec_id = p.d1
JOIN qv v2 ON v2.vec_id = p.d2
LEFT JOIN d ON d.d1 = p.d1 AND d.d2 = p.d2
"""


def global_centroid(
    corpus: DataFrame,
    scale: int = 1_000_000,
    vec_col: str = "embedding",
) -> list[int]:
    """The corpus-wide centroid as EXACT integers — the same
    floor(sum/count) fold as `label_centroids` over all rows; the
    driver collects exactly dim longs (bounded-collect contract)."""
    rows = (
        corpus.select(
            F.posexplode(_quantize(F.col(vec_col), scale)).alias(
                "pos", "val"
            )
        )
        .groupBy("pos")
        .agg(
            F.floor(F.sum("val").cast("double") / F.count(F.lit(1)))
            .cast("long")
            .alias("gv")
        )
        .collect()
    )
    return [gv for _, gv in sorted((r["pos"], r["gv"]) for r in rows)]


def embedding_outliers(
    corpus: DataFrame,
    k: int = 20,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    gcent: list[int] | None = None,
) -> DataFrame:
    """The k vectors FARTHEST from the global centroid — the
    out-of-distribution screen beside `embed_norm_audit`'s magnitude
    check: a vector can have a perfectly normal norm and still sit
    nowhere near the data (wrong modality, corrupted row, adversarial
    insert); those are exactly the rows a curation pass inspects by
    hand. Exact integer squared distances against the plan-literal
    centroid (one `global_centroid` fold first), so the ranking is
    bit-deterministic; the top-k is TakeOrdered — per-partition heaps,
    no corpus shuffle, the `wor_sample` scale contract."""
    if gcent is None:
        gcent = global_centroid(corpus, scale, vec_col)
    dist = F.aggregate(
        F.zip_with(
            _quantize(F.col(vec_col), scale),
            F.lit(gcent),
            lambda x, c: (x - c) * (x - c),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(label_col).alias("label"),
            dist.alias("dist_sq"),
        )
        .orderBy(F.desc("dist_sq"), F.col("vec_id"))
        .limit(k)
    )


def sql_embedding_outliers(k: int = 20, scale: int = 1_000_000) -> str:
    """DuckDB twin of `embedding_outliers` — same centroid fold, same
    exact integer distances, same (dist DESC, id) order."""
    return f"""
WITH qv AS (SELECT vec_id, label,
              list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))
                AS q
            FROM embeddings),
e AS (SELECT vec_id, label, i AS pos, q[i] AS val
      FROM qv, UNNEST(range(1, len(q) + 1)) AS u(i)),
gcent AS (SELECT pos,
            CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)) AS BIGINT)
              AS gv
          FROM e GROUP BY 1),
d AS (SELECT e.vec_id, e.label,
        CAST(sum((e.val - g.gv) * (e.val - g.gv)) AS BIGINT) AS dist_sq
      FROM e JOIN gcent g USING (pos) GROUP BY 1, 2)
SELECT vec_id, label, dist_sq FROM d
ORDER BY dist_sq DESC, vec_id LIMIT {k}
"""


def sql_embedding_outliers_grouped(k: int = 10, scale: int = 1_000_000) -> str:
    """DuckDB twin of the PER-LABEL outlier watchlist (the streaming
    `stream_embed_outliers` drained == batch per-label top-k by the same
    exact integer distance, ties on vec_id)."""
    return f"""
WITH qv AS (SELECT vec_id, label,
              list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))
                AS q
            FROM embeddings),
e AS (SELECT vec_id, label, i AS pos, q[i] AS val
      FROM qv, UNNEST(range(1, len(q) + 1)) AS u(i)),
gcent AS (SELECT pos,
            CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)) AS BIGINT)
              AS gv
          FROM e GROUP BY 1),
d AS (SELECT e.vec_id, e.label,
        CAST(sum((e.val - g.gv) * (e.val - g.gv)) AS BIGINT) AS dist_sq
      FROM e JOIN gcent g USING (pos) GROUP BY 1, 2),
r AS (SELECT *, row_number()
        OVER (PARTITION BY label ORDER BY dist_sq DESC, vec_id) AS rn
      FROM d)
SELECT label, vec_id, dist_sq FROM r WHERE rn <= {k}
"""


_DIM_MASS_RANKED = (
    "CAST(floor(CAST(cum_ranked AS DOUBLE) * 1000000"
    " / CAST(total AS DOUBLE)) AS BIGINT)"
)
_DIM_MASS_PREFIX = (
    "CAST(floor(CAST(cum_prefix AS DOUBLE) * 1000000"
    " / CAST(total AS DOUBLE)) AS BIGINT)"
)


def dim_variance_spectrum(
    corpus: DataFrame,
    dim: int = 64,
    scale: int = 10_000,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension variance spectrum of the embedding corpus — the
    table that prices BOTH truncation strategies before an index is
    built: `prefix_mass_ppm` at row m-1 is the variance mass the first
    m dimensions carry (what `embed_matryoshka_eval`'s rungs actually
    keep), and `ranked_mass_ppm` at rank r is the mass the best r
    dimensions would carry (the PCA upper bound `embed_pca_project`
    chases).  A corpus whose prefix curve hugs its ranked curve is
    matryoshka-truncatable without a rotation; a wide gap says pay for
    the PCA.

    Exactness: embeddings are fixed-point-quantized (the
    `embedding_covariance` discipline), so per-dim Sx/Sxx/n are exact
    integers, the variance NUMERATOR num = n*Sxx - Sx^2 is an exact
    int64, every rank/cumulative is integer arithmetic, and the one
    reported float (`var_fp` = num/n^2) is a single IEEE division both
    engines round identically.  Overflow: num <= (n*scale)^2 needs n <=
    ~3e5 at scale 1e4 (pass scale=100 for ~3e9-row corpora); cumulative
    sums stay under dim * num_max.

    Scale shape: one posexplode into a combine-friendly groupBy — after
    map-side partials the shuffle carries `dim` rows per partition,
    never O(rows); every window runs on the |dim|-row relation."""
    q = spread(corpus).select(_quantize(F.col(vec_col), scale).alias("v"))
    s = (
        q.select(F.posexplode("v").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.sum("x").alias("sx"),
            F.sum(F.expr("x * x")).alias("sxx"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    v = s.select(
        F.col("dim").cast("long").alias("dim"),
        F.expr("n * sxx - sx * sx").alias("num"),
        "n",
    )
    ranked = Window.orderBy(F.desc("num"), F.asc("dim")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prefix = Window.orderBy(F.asc("dim")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rnk = Window.orderBy(F.desc("num"), F.asc("dim"))
    w = v.select(
        "dim",
        "num",
        "n",
        F.sum("num").over(Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )).alias("total"),
        F.row_number().over(rnk).cast("long").alias("rank"),
        F.sum("num").over(ranked).alias("cum_ranked"),
        F.sum("num").over(prefix).alias("cum_prefix"),
    )
    return w.select(
        "dim",
        F.expr(
            "CAST(num AS DOUBLE) / CAST(n * n AS DOUBLE)"
        ).alias("var_fp"),
        "rank",
        F.expr(
            f"CASE WHEN total = 0 THEN CAST(0 AS BIGINT)"
            f" ELSE {_DIM_MASS_RANKED} END"
        ).alias("ranked_mass_ppm"),
        F.expr(
            f"CASE WHEN total = 0 THEN CAST(0 AS BIGINT)"
            f" ELSE {_DIM_MASS_PREFIX} END"
        ).alias("prefix_mass_ppm"),
    )


def sql_dim_variance_spectrum(dim: int = 64, scale: int = 10_000) -> str:
    """DuckDB twin of `dim_variance_spectrum`: identical quantization,
    exact BIGINT moments, integer rank/cumulative windows, the same
    double-floor mass shares, and the same single-division var_fp."""
    return f"""
WITH q AS (SELECT list_transform(embedding,
              x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS v
           FROM embeddings),
e AS (SELECT CAST(i AS BIGINT) AS dim, v[i + 1] AS x
      FROM q, UNNEST(range(0, {dim})) t(i)),
s AS (SELECT dim, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1),
v AS (SELECT dim, n * sxx - sx * sx AS num, n FROM s),
w AS (SELECT dim, num, n,
        CAST(sum(num) OVER () AS BIGINT) AS total,
        CAST(row_number() OVER (ORDER BY num DESC, dim ASC) AS BIGINT)
          AS rank,
        CAST(sum(num) OVER (ORDER BY num DESC, dim ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_ranked,
        CAST(sum(num) OVER (ORDER BY dim ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_prefix
      FROM v)
SELECT dim, CAST(num AS DOUBLE) / CAST(n * n AS DOUBLE) AS var_fp, rank,
       CASE WHEN total = 0 THEN CAST(0 AS BIGINT)
            ELSE {_DIM_MASS_RANKED} END AS ranked_mass_ppm,
       CASE WHEN total = 0 THEN CAST(0 AS BIGINT)
            ELSE {_DIM_MASS_PREFIX} END AS prefix_mass_ppm
FROM w
"""


def pq_distortion(
    corpus: DataFrame,
    m: int = 4,
    ks: int = 8,
    iters: int = 2,
    dim: int = 64,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[list[int]]] | None = None,
) -> DataFrame:
    """Per-subspace PQ quantization-loss audit — the third leg of the
    ANN tuning tripod (`ivf_balance_audit` prices probe COST,
    `embed_ann_recall_curve` prices probe QUALITY; this prices the
    CODE): for each of the m subspaces, the exact integer squared
    reconstruction error of assigning every vector to its nearest
    codeword (total / floor-mean / max), plus codebook UTILIZATION
    (live codewords out of ks — a subspace assigning to 3 of 8
    codewords wastes code bits that another subspace needs).  A
    lopsided error or utilization profile says re-cut the subspaces or
    raise ks BEFORE encoding the corpus.

    Exactness: codebooks come from the exact fixed-point Lloyd loop and
    the per-vector error is the same integer argmin distance the
    encoder uses, so every output cell is an exact int64 (the mean is
    floor-divided — both engines agree for nonnegative integers).

    Scale shape: training is the bounded kmeans contract; the audit
    pass is ONE map-only corpus scan — the m per-subspace errors ride a
    single explode of an m-literal struct array, folding map-side to m
    rows; codebooks are plan literals.  Pass `books` to audit FROZEN
    codebooks (e.g. a per-generation memoized model) — training is
    deterministic, so memoized books are bit-equal to retraining."""
    if books is None:
        books = pq_codebooks(
            corpus, m, ks, iters, dim, scale, id_col, vec_col
        )
    return pq_distortion_finish(
        pq_cell_partials(corpus, books, dim, scale, vec_col)
    )


def pq_cell_partials(
    corpus: DataFrame,
    books: list[list[list[int]]],
    dim: int = 64,
    scale: int = 1_000_000,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-(subspace, codeword) error partials (n, sum_d, max_d) over
    FROZEN codebooks — the additive form of the distortion audit: all
    three aggregates merge (count/sum/max of exact integers), so the
    same relation is a batch groupBy or standing streaming state.  The
    assignment is map-only (codebooks as plan literals); the m errors
    per row ride one m-literal struct explode."""
    m = len(books)
    sub = dim // m
    structs = []
    for s in range(m):
        near = _nearest_int_centroid(
            _quantize(F.slice(F.col(vec_col), s * sub + 1, sub), scale),
            books[s],
        )
        structs.append(
            F.struct(
                F.lit(s).cast("long").alias("subspace"),
                near["dist"].alias("d"),
                near["idx"].alias("cw"),
            )
        )
    # spread() inspects .rdd, which streaming DataFrames forbid — a
    # stream is already micro-batch-partitioned by its source anyway.
    src = corpus if corpus.isStreaming else spread(corpus)
    ex = src.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
    return ex.groupBy("subspace", "cw").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("long").alias("sum_d"),
        F.max("d").cast("long").alias("max_d"),
    )


def pq_distortion_finish(cells: DataFrame) -> DataFrame:
    """(subspace, cw) partials -> the m-row audit — shared by the batch
    scan and the drained standing counters (the batch/streaming twin
    finisher contract): utilization is the live-codeword row count,
    total/max re-merge, the floor-mean is engine-agreeing integer
    division."""
    return cells.groupBy("subspace").agg(
        F.sum("n").cast("long").alias("n_vecs"),
        F.count(F.lit(1)).cast("long").alias("n_live_codewords"),
        F.sum("sum_d").cast("long").alias("total_sq_err"),
        F.max("max_d").cast("long").alias("max_vec_err"),
        F.expr(
            "CAST(sum(sum_d) AS BIGINT) div CAST(sum(n) AS BIGINT)"
        ).alias("mean_sq_err"),
    )


def sql_pq_distortion(
    m: int = 4,
    ks: int = 8,
    iters: int = 2,
    dim: int = 64,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of `pq_distortion`: one prefixed kmeans chain per
    subspace (the sql_pq_topk composition); the final-assignment CTE
    already carries each vector's exact squared distance to its
    assigned codeword, so the audit is one rollup per chain."""
    sub = dim // m
    chains, rows = [], []
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        body, a = _sql_kmeans_ctes(
            ks,
            iters,
            scale,
            source_cte=(
                f"SELECT vec_id, embedding[{lo}:{hi}] AS embedding"
                " FROM embeddings"
            ),
            prefix=f"s{s}",
        )
        chains.append(body if s == 0 else body.replace("\nWITH ", "\n", 1))
        rows.append(
            f"SELECT CAST({s} AS BIGINT) AS subspace,"
            f" CAST(count(*) AS BIGINT) AS n_vecs,"
            f" CAST(count(DISTINCT cluster) AS BIGINT)"
            f" AS n_live_codewords,"
            f" CAST(sum(d) AS BIGINT) AS total_sq_err,"
            f" CAST(max(d) AS BIGINT) AS max_vec_err,"
            f" CAST(sum(d) AS BIGINT) // CAST(count(*) AS BIGINT)"
            f" AS mean_sq_err"
            f" FROM {a}"
        )
    return ",".join(chains) + "\n" + "\nUNION ALL\n".join(rows)


def knn_graph_edges(
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Directed k-nearest-neighbor GRAPH over the whole corpus, built the
    scale way: multi-table sign-bit LSH buckets generate candidates by
    SELF-equi-join (no query broadcast — both sides are the corpus, so
    this is the form that survives when the "query set" is the corpus
    itself), exact rounded cosine ranks within each node's candidate
    set, rank <= k keeps the edges (WindowGroupLimit — at most k rows
    per node leave each map task).  This is the construction step under
    graph ANN indexes (HNSW-family) and graph dedup (SemDeDup
    neighborhoods); `embed_knn_graph_audit` reads its health."""
    tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    # Candidate generation works on (id, bucket) ONLY — the self-join and
    # the pair dedup shuffle ~16-byte id pairs, never the vectors (the
    # §8-style decide-with-small-rows split: the same pair can fall out
    # of several tables, so shipping both payload vectors through the
    # dedup exchange multiplies the heavy bytes by the duplication
    # factor).  Vectors re-attach once, AFTER the pair space is distinct.
    sigs = (
        spread(corpus)
        .select(
            F.col(id_col).alias("vid"),
            F.explode(_lsh_buckets(F.col(vec_col), tables)).alias("tb"),
        )
        .select("vid", "tb.tbl", "tb.bucket")
        .localCheckpoint()  # both sides of the self-join read it
    )
    a = sigs.select(F.col("vid").alias("d1"), "tbl", "bucket")
    b = sigs.select(F.col("vid").alias("d2"), "tbl", "bucket")
    # Cosine is symmetric (bit-identical under operand swap: the dot
    # fold multiplies elementwise in index order and na*nb == nb*na)
    # and the bucket self-join emits BOTH directions of every
    # co-bucketed pair, so the pair space is deduped, vector-attached
    # and scored once per UNORDERED pair (d1 < d2) and mirrored by a
    # map-side explode afterwards: half the dedup-exchange rows, half
    # the attach-join rows, half the dot products, identical directed
    # edge relation into the per-node window.
    #
    # The dedup exchange carries 16-byte id pairs, so AQE's byte-based
    # coalescing shrinks it to a couple of reducers — but every row
    # downstream costs a 64-dim dot product, so partition count must
    # follow COMPUTE, not bytes (guide §2.2/§2.5).  An explicit hash
    # repartition on the dedup keys pins the parallelism (AQE never
    # coalesces a user repartition) and dropDuplicates reuses the
    # partitioning instead of adding its own exchange: one shuffle
    # total, scoring runs one wave across the cluster.
    par = corpus.sparkSession.sparkContext.defaultParallelism
    pairs = (
        a.join(b, on=["tbl", "bucket"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .repartition(par, "d1", "d2")
        .dropDuplicates(["d1", "d2"])
    )
    v1 = corpus.select(
        F.col(id_col).alias("d1"),
        F.col(vec_col).alias("v1"),
        norm(F.col(vec_col)).alias("_n1"),
    )
    v2 = corpus.select(
        F.col(id_col).alias("d2"),
        F.col(vec_col).alias("v2"),
        norm(F.col(vec_col)).alias("_n2"),
    )
    cand = pairs.join(v1, "d1").join(v2, "d2")
    scored = (
        cand.withColumn(
            "score",
            cosine_pre(F.col("v1"), F.col("v2"), F.col("_n1"), F.col("_n2")),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("d1").alias("s"), F.col("d2").alias("t")
                    ),
                    F.struct(
                        F.col("d2").alias("s"), F.col("d1").alias("t")
                    ),
                )
            ).alias("st"),
            "score",
        )
        .select(
            F.col("st.s").alias("d1"), F.col("st.t").alias("d2"), "score"
        )
    )
    w = Window.partitionBy("d1").orderBy(F.desc("score"), F.asc("d2"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("d1", "d2", "score", "rank")
    )


def sql_knn_graph_edges(
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    source_cte: str = "SELECT vec_id, embedding FROM embeddings",
) -> str:
    """DuckDB twin of `knn_graph_edges` as CTEs ending in
    `edges(d1, d2, score, rank)` (same seeded planes, same round-4
    cosine ranking, same id tiebreak)."""
    tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    planes_lit = (
        "["
        + ", ".join(
            "["
            + ", ".join(
                "[" + ", ".join(repr(w) for w in p) + "]" for p in tbl
            )
            + "]"
            for tbl in tables
        )
        + "]"
    )
    return f"""
pl AS (SELECT {planes_lit} AS hp),
e AS ({source_cte}),
sig AS (
  SELECT e.vec_id, t.tbl,
         CAST(sum(CASE WHEN list_sum(list_transform(range(1, {dim + 1}),
                    i -> CAST(e.embedding[i] AS DOUBLE) * hp[t.tbl + 1][pr.p + 1][i])) > 0
                  THEN CAST(pow(2, pr.p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
  FROM e, pl, range(0, {n_tables}) t(tbl), range(0, {n_planes}) pr(p)
  GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
  FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id <> b.vec_id),
kidx AS (SELECT unnest(range(1, {dim + 1})) AS i),
kscored AS (
  SELECT cand.d1, cand.d2,
         round(sum(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))
           / (sqrt(sum(CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
            * sqrt(sum(CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))), 4) AS score
  FROM cand
  JOIN e q ON q.vec_id = cand.d1
  JOIN e c ON c.vec_id = cand.d2
  CROSS JOIN kidx
  GROUP BY 1, 2),
edges AS (
  SELECT d1, d2, score, CAST(rn AS BIGINT) AS rank FROM (
    SELECT d1, d2, score,
           row_number() OVER (PARTITION BY d1
                              ORDER BY score DESC, d2 ASC) AS rn
    FROM kscored)
  WHERE rn <= {k})"""


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 4,
    ks: int = 8,
    iters: int = 2,
    dim: int = 64,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: list[list[int]] | None = None,
    books: list[list[list[int]]] | None = None,
) -> DataFrame:
    """IVF-PQ (the FAISS IVFADC layout, Jegou et al. 2011 §IV): a coarse
    quantizer routes each vector to one of `n_cells` inverted lists, a
    product quantizer stores it as m codeword ids, and a query probes
    its `n_probe` nearest cells scoring candidates by ADC lookup — the
    assembled architecture behind every billion-vector ANN deployment.

    Unlike `embed_ann_ivf` (numpy float coarse quantizer, rows-only by
    design), BOTH stages here are the exact fixed-point machinery: the
    coarse quantizer is `kmeans_centroids` (integer Lloyd) and the PQ
    stage is the integer codebook/ADC path — so the PARTIAL-probe
    result is deterministic and fully oracle-hashable, probe selection
    included.

    Scale shape: one map-only corpus pass emits (cell, codes) — m small
    ints plus a cell id per vector, the only thing the query path ever
    scans; queries broadcast with their m*ks-entry LUTs and probe-cell
    lists precomputed in-plan (centroids and codebooks are plan
    literals); the candidate join is an equi-join on cell, so per-query
    work is |corpus| * n_probe / n_cells ADC lookups, not dim
    multiplies over the corpus; top-k is the bounded per-query
    window."""
    if cents is None:
        cents = kmeans_centroids(
            corpus, k=n_cells, iters=iters, scale=scale,
            id_col=id_col, vec_col=vec_col,
        )
    if books is None:
        books = pq_codebooks(
            corpus, m, ks, iters, dim, scale, id_col, vec_col
        )
    sub = dim // m
    qz = _quantize(F.col(vec_col), scale)
    codes = F.array(
        *[
            _nearest_int_centroid(
                _quantize(
                    F.slice(F.col(vec_col), s * sub + 1, sub), scale
                ),
                books[s],
            )["idx"]
            for s in range(m)
        ]
    )
    c = spread(corpus).select(
        F.col(id_col).alias("match_id"),
        _nearest_int_centroid(qz, cents)["idx"].alias("cell"),
        codes.alias("codes"),
    )
    return _ivfpq_score(
        c, queries, cents, books, k, n_probe, dim, scale, id_col, vec_col
    )


def ivfpq_topk_from_tables(
    cells: DataFrame,
    codes: DataFrame,
    cents: list[list[int]],
    books: list[list[list[int]]],
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    dim: int = 64,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """`ivfpq_topk` with BOTH corpus-side relations read from
    MATERIALIZED tables — `cells` (id, cluster: the inverted file) and
    `codes` (id, codes: the compressed corpus) maintained by the
    row-wise IVM maintainers over the FROZEN models — the serving
    shape: query time never touches the float corpus, it scans m small
    ints + a cell id per vector.  Bit-identical to the recompute form
    (same frozen models, same exact integer assignment on both
    paths)."""
    c = codes.select(F.col(id_col), "codes").join(
        cells.select(F.col(id_col), F.col("cluster").alias("cell")),
        id_col,
    ).select(F.col(id_col).alias("match_id"), "cell", "codes")
    return _ivfpq_score(
        c, queries, cents, books, k, n_probe, dim, scale, id_col, vec_col
    )


def _ivfpq_score(
    c: DataFrame,
    queries: DataFrame,
    cents: list[list[int]],
    books: list[list[list[int]]],
    k: int,
    n_probe: int,
    dim: int,
    scale: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The IVFADC query path over a (match_id, cell, codes) relation —
    shared by the recompute and materialized forms: probe-cell lists
    and ADC LUTs ride in-plan with the broadcast queries; candidates
    equi-join on cell; top-k is the bounded per-query window."""
    m = len(books)
    sub = dim // m
    qz = _quantize(F.col(vec_col), scale)
    probe = F.transform(
        F.slice(_int_centroid_dists(qz, cents), 1, n_probe),
        lambda s: s["idx"],
    )
    luts = F.array(
        *[
            _codeword_dists(
                _quantize(
                    F.slice(F.col(vec_col), s * sub + 1, sub), scale
                ),
                books[s],
            )
            for s in range(m)
        ]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(probe).alias("cell"),
        luts.alias("lut"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn(
            "adist",
            F.aggregate(
                F.zip_with(
                    F.col("lut"),
                    F.col("codes"),
                    lambda l, cd: F.element_at(
                        l, (cd + F.lit(1)).cast("int")
                    ),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cell", "adist", "rank")
    )


def sql_ivfpq_topk(
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 4,
    ks: int = 8,
    iters: int = 2,
    dim: int = 64,
    n_queries: int = 5,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of `ivfpq_topk`: the coarse-quantizer kmeans chain
    (prefix `cq`, full-width vectors) gives cells + per-query probe
    lists; one prefixed chain per PQ subspace gives codes + LUTs (the
    sql_pq_topk composition); the ADC sum is joined through the probe
    relation so the PARTIAL-probe candidate set is reproduced
    exactly."""
    sub = dim // m
    cq_body, cq_a = _sql_kmeans_ctes(n_cells, iters, scale, prefix="cq")
    chains, finals = [cq_body], []
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        body, a = _sql_kmeans_ctes(
            ks,
            iters,
            scale,
            source_cte=(
                f"SELECT vec_id, embedding[{lo}:{hi}] AS embedding"
                " FROM embeddings"
            ),
            prefix=f"s{s}",
        )
        chains.append(body.replace("\nWITH ", "\n", 1))
        finals.append((f"s{s}", a))
    qd = ",".join(
        f"""
{p}qd AS (SELECT e.vec_id AS query_id, c.cluster,
          sum((e.val - c.cv) * (e.val - c.cv)) AS d
          FROM {p}e e JOIN {p}cent{iters - 1} c USING (pos)
          WHERE e.vec_id < {n_queries} GROUP BY 1, 2)"""
        for p, _a in finals
    )
    code_joins = " ".join(
        f"JOIN {a} x{i} USING (vec_id)"
        for i, (_p, a) in enumerate(finals)
        if i > 0
    )
    lut_joins = " ".join(
        f"JOIN {p}qd q{i} ON q{i}.cluster = x{i}.cluster"
        + ("" if i == 0 else f" AND q{i}.query_id = q0.query_id")
        for i, (p, _a) in enumerate(finals)
    )
    adist = " + ".join(f"q{i}.d" for i in range(m))
    return (
        ",".join(chains)
        + ","
        + qd
        + f""",
cqqd AS (SELECT e.vec_id AS query_id, c.cluster,
         sum((e.val - c.cv) * (e.val - c.cv)) AS d
         FROM cqe e JOIN cqcent{iters - 1} c USING (pos)
         WHERE e.vec_id < {n_queries} GROUP BY 1, 2),
cqprobe AS (SELECT query_id, cluster AS cell FROM (
    SELECT query_id, cluster,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY d, cluster) AS rn
    FROM cqqd) WHERE rn <= {n_probe}),
cqcell AS (SELECT vec_id, CAST(cluster AS BIGINT) AS cell FROM {cq_a}),
ad AS (SELECT q0.query_id, x0.vec_id AS match_id, ce.cell,
              {adist} AS adist
       FROM {finals[0][1]} x0 {code_joins}
       JOIN cqcell ce ON ce.vec_id = x0.vec_id
       {lut_joins}
       JOIN cqprobe pr ON pr.query_id = q0.query_id
                      AND pr.cell = ce.cell
       WHERE x0.vec_id != q0.query_id),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY adist, match_id) AS rank
           FROM ad)
SELECT query_id, match_id, cell, CAST(adist AS BIGINT) AS adist,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""
    )
