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


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of `corpus` for every row of `queries`."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = spread(corpus).select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("qvec"), F.col("cvec")))
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
    )
    b = corpus.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("d2"),
        F.col(vec_col).alias("v2"),
    )
    return (
        a.join(b, on="blk")
        .filter(F.col("d1") < F.col("d2"))
        .withColumn("score", cosine(F.col("v1"), F.col("v2")))
        .filter(F.col("score") >= threshold)
        .select("d1", "d2", "score")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket signature: bit p = 1 iff vec . plane_p > 0. Planes are
    literal arrays — evaluated JVM-side, no Python in the loop."""
    bits = None
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = dot(vec, lit_plane)
        bit = F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return bits.cast("long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via random-hyperplane LSH: bucket equi-join + exact re-rank.

    Approximate: recall vs `brute_force_topk` is property-tested, not
    oracle-hashed (the bucketing is not SQL-reproducible)."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = spread(corpus).select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("cvec"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )
