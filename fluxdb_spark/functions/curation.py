"""Dataset-curation operators for the training-data pipeline layer:
deterministic sampling, benchmark decontamination, and sequence packing.

Scale design:

- `hash_sample` / `stratified_sample`: pure map-side filters on a salted
  content-key hash — no shuffle, no rand() (stable under retries,
  repartitioning, and cluster resizing, which `DataFrame.sample` is not),
  and the acceptance predicate pushes down to the scan;
- `decontaminate`: training-vs-benchmark n-gram collision via an
  equi-join on the shingle — the benchmark side is the small one (eval
  sets are thousands of docs, the corpus is billions) so it broadcasts,
  and no all-pairs comparison ever forms;
- `pack_sequences`: greedy contiguous packing of documents into
  fixed-token-budget training sequences, computed per shard (window
  partitioned by the shard column) so the prefix sums parallelize —
  the standard "concat then chunk" packing, not a global sequential scan.

Everything is built-in JVM expressions with exact DuckDB twins via the
portable md5-based `hash60`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fluxdb_spark.functions.hashing import hash60, hash60_sql
from fluxdb_spark.functions.text import token_count

SAMPLE_BUCKETS = 10_000


def _bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, SAMPLE_BUCKETS) from a salted key hash."""
    return F.pmod(hash60(key.cast("string"), seed=salt), F.lit(SAMPLE_BUCKETS))


def sql_bucket(expr: str, salt: str) -> str:
    """DuckDB twin of `_bucket` (hash60 is non-negative, so % == pmod)."""
    return f"({hash60_sql(f'CAST({expr} AS VARCHAR)', salt)} % {SAMPLE_BUCKETS})"


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli sampling: keep a row iff its salted key hash
    falls in the first `fraction` of the bucket space. Same row set on
    every run, every cluster size, every retry."""
    return df.filter(
        _bucket(F.col(key_col), salt) < int(fraction * SAMPLE_BUCKETS)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing for a
    training mix): each stratum keeps its own fraction, keyed on the same
    salted hash so the samples are nested (raising a fraction only ADDS
    rows — stable ablations)."""
    rate = F.lit(int(default_fraction * SAMPLE_BUCKETS))
    for value, frac in sorted(fractions.items()):
        rate = F.when(
            F.col(strata_col) == value, F.lit(int(frac * SAMPLE_BUCKETS))
        ).otherwise(rate)
    return df.filter(_bucket(F.col(key_col), salt) < rate)


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag every training doc sharing at least
    one distinct n-word shingle with the benchmark pool. Returns one row
    per contaminated doc: (doc_id, n_hits = distinct shared shingles).

    The benchmark shingle pool is deduplicated then broadcast (eval sets
    are small relative to the corpus); training shingles stream through a
    broadcast-hash join with no shuffle of the training side.
    """
    from fluxdb_spark.functions.dedup import word_shingles

    def sh(docs: DataFrame) -> DataFrame:
        return docs.select(
            F.col(id_col),
            F.explode(word_shingles(F.col("text"), n)).alias("shingle"),
        )

    pool = sh(benchmark).select("shingle").distinct()
    return (
        sh(train)
        .join(F.broadcast(pool), on="shingle")
        .groupBy(id_col)
        .agg(F.countDistinct("shingle").alias("n_hits"))
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    shard_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy contiguous sequence packing: within each shard, documents in
    id order fill fixed-token-budget training sequences; a document joins
    the sequence its PRECEDING cumulative token count falls in (spillover
    allowed — the standard concat-then-chunk packing). Returns one row per
    packed sequence: (shard, seq_id, n_docs, n_tokens).

    Packing per shard keeps the prefix sum parallel (one window partition
    per shard); a global ordering would serialize the whole corpus through
    one partition.
    """
    toks = docs.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col),
        token_count(F.col("text")).alias("n_tok"),
    )
    assigned = toks.withColumn(
        "seq_id",
        F.floor(
            F.coalesce(
                F.sum("n_tok").over(
                    Window.partitionBy("shard")
                    .orderBy(id_col)
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            / budget
        ).cast("long"),
    )
    return assigned.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str,
    salt: str = "cap",
) -> DataFrame:
    """Per-group document cap (e.g. "at most K pages per domain", the
    standard web-corpus anti-domination rule): keep the K rows of each
    group with the smallest salted key hash — a deterministic uniform
    sample of the group, stable across runs and cluster sizes. Returns the
    input columns plus `rn` (the row's rank within its group).

    Scale shape: `row_number <= K` compiles to WindowGroupLimit, so each
    map task keeps only its local top-K per group BEFORE the shuffle —
    a billion-page domain ships K rows per input split, not a billion,
    and the post-shuffle state per group is bounded by K * num_splits.
    """
    w = Window.partitionBy(group_col).orderBy(
        hash60(F.col(key_col).cast("string"), seed=salt), F.col(key_col)
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def token_budget_mix(
    docs: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
    default_budget: int = 0,
) -> DataFrame:
    """Token-aware mix construction: each source contributes documents (in
    salted-hash order — a deterministic uniform sample of the source) until
    its TOKEN budget is exhausted. A document is kept iff the tokens
    preceding it in its source's order are still under budget (spillover
    allowed, mirroring `pack_sequences`), so every source with a positive
    budget contributes at least one document and the mix is stable across
    runs, retries, and cluster sizes.

    This is the step after `stratified_sample`-style doc-level weighting
    when the target is a TOKEN mix (the unit training actually consumes).
    Returns (source, doc_id, n_tok, cum_before).

    Scale shape: one running-sum window per source — prefix sums
    parallelize across sources exactly like `pack_sequences`; no shuffle
    beyond the per-source partition, no driver state."""
    budget = F.lit(int(default_budget))
    for src, b in sorted(budgets.items()):
        budget = F.when(F.col(source_col) == src, F.lit(int(b))).otherwise(
            budget
        )
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.col(key_col),
        token_count(F.col("text")).alias("n_tok"),
        budget.alias("_budget"),
        _bucket(F.col(key_col), salt).alias("_ord"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("_ord", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = toks.withColumn(
        "cum_before",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long"),
    )
    return cum.filter(F.col("cum_before") < F.col("_budget")).select(
        "source", key_col, "n_tok", "cum_before"
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    val_frac: float = 0.01,
    test_frac: float = 0.01,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — the split a training
    pipeline must be able to reproduce forever: each row's salted key
    hash picks its split, so membership is stable under retries, cluster
    resizing, corpus growth (new docs never move old ones), and is
    computable by any engine with md5. Pure map-side expression, no
    shuffle, no rand()."""
    b = _bucket(F.col(key_col), salt)
    val_hi = int(val_frac * SAMPLE_BUCKETS)
    test_hi = val_hi + int(test_frac * SAMPLE_BUCKETS)
    return df.withColumn(
        "split",
        F.when(b < val_hi, F.lit("val"))
        .when(b < test_hi, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def epoch_shuffle(
    df: DataFrame,
    epochs: list[int],
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch global shuffle ORDER — the training-data
    reproducibility primitive: the order a run consumes examples in must
    be a pure function of (corpus, epoch), identical across retries,
    cluster sizes, and engines, with different epochs decorrelated. Each
    epoch's order is specified by ONE salted portable hash per row
    (`hash60(key, "epoch<e>")`): sort by it and you have the epoch's
    sequence. Emitting the KEY rather than a dense position keeps the
    operator map-only (zero shuffle, no RNG state to checkpoint); the
    consumer pays the sort exactly once when writing the epoch manifest
    — a global dense row_number here would serialize through a single
    partition, the opposite of the point. Returns the id plus one
    `epoch<e>_key` column per requested epoch."""
    return df.select(
        F.col(key_col),
        *[
            hash60(
                F.col(key_col).cast("string"), seed=f"epoch{int(e)}"
            ).alias(f"epoch{int(e)}_key")
            for e in epochs
        ],
    )


def sql_epoch_shuffle(
    epochs: list[int], expr: str = "doc_id", source: str = "documents"
) -> str:
    """DuckDB twin of `epoch_shuffle`."""
    cols = ", ".join(
        f"{hash60_sql(f'CAST({expr} AS VARCHAR)', f'epoch{int(e)}')}"
        f" AS epoch{int(e)}_key"
        for e in epochs
    )
    return f"SELECT {expr}, {cols} FROM {source}"


def sql_hash_split(
    expr: str,
    val_frac: float = 0.01,
    test_frac: float = 0.01,
    salt: str = "split",
) -> str:
    """DuckDB twin of `hash_split`'s split expression."""
    val_hi = int(val_frac * SAMPLE_BUCKETS)
    test_hi = val_hi + int(test_frac * SAMPLE_BUCKETS)
    b = sql_bucket(expr, salt)
    return (
        f"CASE WHEN {b} < {val_hi} THEN 'val' "
        f"WHEN {b} < {test_hi} THEN 'test' ELSE 'train' END"
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    target_rows: int,
    tau: float = 0.5,
    key_col: str = "doc_id",
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-based mixture rebalancing — the n^tau re-weighting used
    to set LLM training-mix proportions: a group's share of the target is
    proportional to count^tau, so tau=1 preserves natural proportions,
    tau=0 is uniform, and intermediate values flatten head groups while
    boosting tails. Selection is the same salted-hash filter as
    `hash_sample`: deterministic, nested (raising the target only adds
    rows), and repartition/retry-stable.

    Scale shape: one combine-friendly groupBy builds the |groups|-row
    counts relation; the per-group keep-rate is computed over it (the
    normalizer sums in a single ordered window frame — |groups| rows
    through one task, with a DETERMINISTIC addition order so the float
    normalizer is reproducible across engines and runs) and broadcast
    back; the corpus itself is never shuffled. tau=0.5 evaluates as
    sqrt, which IEEE 754 requires correctly rounded (engine-portable
    bit-for-bit, unlike the general pow path)."""
    n = F.col("__n").cast("double")
    w = F.sqrt(n) if tau == 0.5 else F.pow(n, F.lit(float(tau)))
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    frame = Window.orderBy(group_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rates = counts.select(
        F.col(group_col),
        F.least(
            F.lit(SAMPLE_BUCKETS).cast("long"),
            F.floor(
                F.lit(float(target_rows))
                * w
                / F.sum(w).over(frame)
                / F.col("__n")
                * SAMPLE_BUCKETS
            ).cast("long"),
        ).alias("__rate"),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(_bucket(F.col(key_col), salt) < F.col("__rate"))
        .drop("__rate", "__n")
    )


def sql_temperature_mix(
    group_expr: str, target_rows: int, key_expr: str, salt: str = "tmix"
) -> str:
    """DuckDB twin of `temperature_mix` at tau=0.5 (same expression order,
    same single ordered window frame for the normalizer)."""
    return f"""
WITH c AS (SELECT {group_expr} AS grp, count(*) AS n FROM documents GROUP BY 1),
r AS (SELECT grp,
             least({SAMPLE_BUCKETS},
                   CAST(floor({float(target_rows)} * sqrt(CAST(n AS DOUBLE))
                        / sum(sqrt(CAST(n AS DOUBLE))) OVER (
                            ORDER BY grp ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)
                        / n * {SAMPLE_BUCKETS}) AS BIGINT)) AS rate
      FROM c)
SELECT d.doc_id, d.{group_expr} AS grp
FROM documents d JOIN r ON d.{group_expr} = r.grp
WHERE {sql_bucket(key_expr, salt)} < r.rate
"""


def length_buckets(
    df: DataFrame,
    batch_size: int,
    edges: list[int] | None = None,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batch assignment for inference/training serving:
    documents are grouped into token-length buckets (so a batch pads to
    its bucket ceiling, not the corpus maximum) and numbered into
    fixed-size batches within each bucket. The standard trick that cuts
    padding waste in batched model calls.

    Scale shape: bucket assignment is a map-side expression; the batch
    numbering is one window per bucket partitioned shuffle (rows carry
    (bucket, key) only), deterministic by key order. Output:
    (key, n_tokens, bucket_lo, batch_id, pos_in_batch)."""
    edges = edges or [16, 32, 64, 128]
    n = token_count(F.col(text_col))
    bucket = F.lit(0)
    for e in edges:
        bucket = F.when(n >= e, F.lit(e)).otherwise(bucket)
    w = Window.partitionBy("bucket_lo").orderBy(key_col)
    return (
        df.select(
            F.col(key_col),
            n.cast("long").alias("n_tokens"),
            bucket.cast("long").alias("bucket_lo"),
        )
        .withColumn("__rn", F.row_number().over(w) - 1)
        .select(
            key_col,
            "n_tokens",
            "bucket_lo",
            (F.col("__rn") / batch_size).cast("long").alias("batch_id"),
            F.pmod(F.col("__rn"), F.lit(batch_size))
            .cast("long")
            .alias("pos_in_batch"),
        )
    )


def sql_length_buckets(batch_size: int, edges: list[int] | None = None) -> str:
    edges = edges or [16, 32, 64, 128]
    case = "CASE "
    for e in reversed(edges):
        case += f"WHEN len(string_split(lower(text), ' ')) >= {e} THEN {e} "
    case += "ELSE 0 END"
    return f"""
WITH t AS (SELECT doc_id,
                  CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                    AS n_tokens,
                  CAST({case} AS BIGINT) AS bucket_lo
           FROM documents),
r AS (SELECT *, row_number() OVER (PARTITION BY bucket_lo
                                   ORDER BY doc_id) - 1 AS rn FROM t)
SELECT doc_id, n_tokens, bucket_lo,
       CAST(rn // {batch_size} AS BIGINT) AS batch_id,
       rn % {batch_size} AS pos_in_batch
FROM r
"""


# --- DSIR importance resampling ---------------------------------------------

DSIR_BUCKETS = 64


def _dsir_features(text: Column) -> Column:
    """Hashed-n-gram feature stream (Xie et al. 2023, DSIR): unigrams +
    bigrams of the lowercased whitespace tokens, later bucketed by the
    portable hash. Bigrams reuse text.bigram_structs' guarded pairing
    (empty for single-token docs)."""
    from fluxdb_spark.functions.text import bigram_structs

    toks = F.split(F.lower(text), " ")
    bis = F.transform(
        bigram_structs(text),
        lambda s: F.concat(s["w1"], F.lit(" "), s["w2"]),
    )
    return F.concat(toks, bis)


def dsir_weights(
    docs: DataFrame,
    target: Column,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document importance weights for Data Selection via Importance
    Resampling (Xie et al. 2023, arXiv:2302.03169): hashed unigram+bigram
    bag-of-buckets features, add-one-smoothed bucket distributions for the
    `target` slice vs the whole (raw) corpus, and per-doc weight
    = sum_b count_b * log(p_target(b) / p_raw(b)).

    Determinism: the log-ratio is fixed-pointed per BUCKET
    (floor(ln * 1e6) of an exactly-representable integer ratio), so the
    per-document sum is exact integer arithmetic — order-independent
    across any partitioning, no float-summation ambiguity.

    Scale shape: one explode -> two combine-friendly groupBys (the doc x
    bucket shuffle carries at most |docs| * n_buckets rows after map-side
    combine); the bucket table is n_buckets rows and broadcasts back; no
    all-pairs step, no Python, driver state zero."""
    fb = docs.select(
        F.col(id_col),
        target.alias("is_target"),
        F.explode(_dsir_features(F.col(text_col))).alias("feat"),
    ).select(
        id_col,
        "is_target",
        F.pmod(hash60(F.col("feat"), seed="dsir"), F.lit(n_buckets)).alias(
            "b"
        ),
    )
    # ONE evaluation of the feature explode: fold to (doc, bucket)
    # counters first (is_target is functional on the doc id, so adding
    # it to the key changes no group), then derive the bucket stats
    # from those counters — the old form ran the explode+hash twice,
    # once per groupBy key.  Exact integer sums either way.
    doc_b = (
        fb.groupBy(id_col, "is_target", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()  # consumed by stats AND the weight join
    )
    stats = doc_b.groupBy("b").agg(
        F.sum("cnt").alias("cr"),
        F.sum(F.when(F.col("is_target"), F.col("cnt")).otherwise(0)).alias(
            "ct"
        ),
    )
    tot = stats.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )
    lr = stats.join(F.broadcast(tot)).select(
        "b",
        F.floor(
            F.ln(
                ((F.col("ct") + 1) * (F.col("tr") + n_buckets)).cast(
                    "double"
                )
                / ((F.col("cr") + 1) * (F.col("tt") + n_buckets)).cast(
                    "double"
                )
            )
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("lr_e6"),
    )
    return doc_b.join(F.broadcast(lr), "b").groupBy(id_col).agg(
        F.sum(F.col("cnt") * F.col("lr_e6")).alias("w_e6"),
        F.sum("cnt").alias("n_feats"),
    )


def dsir_select(
    docs: DataFrame,
    target: Column,
    n_take: int = 100,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic DSIR selection: the `n_take` raw-corpus documents
    whose hashed-n-gram distribution best matches the target slice (the
    paper's Gumbel-noise resampling replaced by exact top-N so the
    selection is reproducible and oracle-checkable). The global sort is
    TakeOrdered (no single-partition shuffle of the corpus); the rank
    window runs over the already-limited n_take rows."""
    w = dsir_weights(docs, target, n_buckets, id_col, text_col)
    top = w.orderBy(F.desc("w_e6"), F.asc(id_col)).limit(n_take)
    rank_w = Window.orderBy(F.desc("w_e6"), F.asc(id_col))
    return top.withColumn(
        "rank", F.row_number().over(rank_w).cast("long")
    ).select(id_col, "n_feats", "w_e6", "rank")


def sql_dsir_select(
    target_expr: str = "lang = 'en'",
    n_take: int = 100,
    n_buckets: int = DSIR_BUCKETS,
) -> str:
    """DuckDB twin of `dsir_select` (documents table, same feature
    stream, same fixed-point log-ratio)."""
    bucket = hash60_sql("feat", "dsir")
    return f"""
WITH toks AS (SELECT doc_id, {target_expr} AS is_target,
                     string_split(lower(text), ' ') AS t FROM documents),
uni AS (SELECT doc_id, is_target, t[i] AS feat
        FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)),
bi AS (SELECT doc_id, is_target, t[i] || ' ' || t[i + 1] AS feat
       FROM toks, UNNEST(range(1, len(t))) AS u(i) WHERE len(t) >= 2),
fb AS (SELECT doc_id, is_target, {bucket} % {n_buckets} AS b
       FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
docb AS (SELECT doc_id, b, count(*) AS cnt FROM fb GROUP BY 1, 2),
stats AS (SELECT b, count(*) AS cr,
                 sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct
          FROM fb GROUP BY 1),
tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM stats),
lr AS (SELECT b, CAST(floor(ln(
           CAST((ct + 1) * (tr + {n_buckets}) AS DOUBLE)
         / CAST((cr + 1) * (tt + {n_buckets}) AS DOUBLE)) * 1000000)
         AS BIGINT) AS lr_e6
       FROM stats, tot),
w AS (SELECT doc_id, CAST(sum(cnt * lr_e6) AS BIGINT) AS w_e6,
             CAST(sum(cnt) AS BIGINT) AS n_feats
      FROM docb JOIN lr USING (b) GROUP BY 1),
ranked AS (SELECT doc_id, n_feats, w_e6,
                  row_number() OVER (ORDER BY w_e6 DESC, doc_id) AS rank
           FROM w)
SELECT doc_id, n_feats, w_e6, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {n_take}
"""


def decontaminate_fuzzy(
    train: DataFrame,
    benchmark: DataFrame,
    min_agree: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """NEAR-duplicate benchmark decontamination — the fuzzy sibling of
    `decontaminate`: exact 8-gram collision misses an eval item that was
    lightly paraphrased or truncated into the training set, the documented
    leakage mode the GPT-3 and Llama cleanups filter with fuzzy matching.
    Flags every training doc whose MinHash signature agrees with some
    benchmark doc on >= min_agree of the k=8 signature slots (agreement
    fraction is the standard unbiased Jaccard estimate; 4/8 ~ J >= 0.5).

    Scale shape: both sides reduce to |docs| x 8 integer signature rows
    (dedup.py's zero-shuffle signature map); the benchmark side is an eval
    pool — tiny relative to the corpus — so its banded buckets AND its
    signatures broadcast, and the training corpus streams through a
    broadcast-hash band join + a broadcast signature join with no shuffle
    of the training side; candidate space is per-bucket, never
    |train| x |bench|. Returns (doc_id, n_bench_matches, max_agree) —
    all-integer, fully hash-checkable.
    """
    from fluxdb_spark.functions import dedup as dd

    k, bands = dd.MINHASH_K, dd.LSH_BANDS
    ts = dd.minhash_signatures(train, k, id_col)
    bs = dd.minhash_signatures(benchmark, k, id_col)
    tb = dd._banded(ts, k, bands, id_col)
    bb = dd._banded(bs, k, bands, id_col).withColumnRenamed(
        id_col, "bench_id"
    )
    cand = (
        tb.join(F.broadcast(bb), "bucket")
        .select(F.col(id_col), F.col("bench_id"))
        .distinct()
    )
    bsig = F.broadcast(
        bs.select(
            F.col(id_col).alias("bench_id"),
            *[F.col(f"sig{i}").alias(f"bsig{i}") for i in range(k)],
        )
    )
    import functools
    import operator as op

    agree = functools.reduce(
        op.add,
        [
            F.when(F.col(f"sig{i}") == F.col(f"bsig{i}"), 1).otherwise(0)
            for i in range(k)
        ],
    ).cast("long")
    return (
        cand.join(ts, id_col)
        .join(bsig, "bench_id")
        .withColumn("agree", agree)
        .filter(F.col("agree") >= min_agree)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bench_matches"),
            F.max("agree").cast("long").alias("max_agree"),
        )
    )


def sql_decontaminate_fuzzy(min_agree: int = 4) -> str:
    """DuckDB twin of `decontaminate_fuzzy` over the documents table with
    the catalog's bench split (doc_id % 10 = 0 is the eval pool)."""
    from fluxdb_spark.functions import dedup as dd

    k, bands = dd.MINHASH_K, dd.LSH_BANDS
    chunks = dd.sql_shingle_hash_chunks("shingle", k)
    hash_cols = ", ".join(f"{c} AS h{i}" for i, c in enumerate(chunks))
    sig_cols = ", ".join(f"min(h{i}) AS sig{i}" for i in range(k))
    rpb = k // bands
    band_rows = "\nUNION ALL\n".join(
        "SELECT doc_id, {b} AS band, ".format(b=b)
        + ", ".join(f"sig{b * rpb + r} AS h{r}" for r in range(rpb))
        + " FROM sigs"
        for b in range(bands)
    )
    band_eq = " AND ".join(["a.band = b.band"] + [f"a.h{r} = b.h{r}" for r in range(rpb)])
    agree = " + ".join(
        f"CASE WHEN t.sig{i} = bn.sig{i} THEN 1 ELSE 0 END" for i in range(k)
    )
    return f"""
WITH {dd.sql_shingles_ctes()},
shingle_hashes AS (
  SELECT shingle, {hash_cols} FROM (SELECT DISTINCT shingle FROM sh)),
sigs AS (
  SELECT doc_id, {sig_cols}
  FROM sh JOIN shingle_hashes USING (shingle) GROUP BY doc_id),
bands AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id, b.doc_id AS bench_id
  FROM bands a JOIN bands b ON {band_eq}
  WHERE a.doc_id % 10 != 0 AND b.doc_id % 10 = 0),
agreed AS (
  SELECT c.doc_id, c.bench_id, CAST({agree} AS BIGINT) AS agree
  FROM cand c
  JOIN sigs t ON t.doc_id = c.doc_id
  JOIN sigs bn ON bn.doc_id = c.bench_id)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bench_matches,
       max(agree) AS max_agree
FROM agreed WHERE agree >= {min_agree}
GROUP BY 1
"""


def pps_sample(
    docs: DataFrame,
    n_target: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    weight_col: str | None = None,
    seed: str = "pps",
) -> DataFrame:
    """Poisson probability-proportional-to-size sampling: each document's
    inclusion probability is min(1, n_target * w / W_total), so longer
    documents (or any supplied weight) are proportionally likelier and
    the expected sample size is ~n_target tokens' worth of documents —
    the variance-reduced way to draw a token-budgeted subsample, versus
    uniform sampling that over-represents short docs per token.

    Deterministic and engine-portable with NO global sort (classic
    systematic PPS needs a corpus-wide cumulative-weight order; Poisson
    PPS is map-side): include iff hash60(id) < floor(min(1, p) * 2^60).
    The threshold math is (exact int) * (one IEEE division) * (a power
    of two, i.e. an exponent shift) -> floor, every step reproduced
    bit-identically by the SQL twin; W_total rides a 1-row broadcast.
    Re-running with a larger n_target only ADDS documents (nested
    samples, same property as stratified_sample)."""
    w = (
        F.col(weight_col)
        if weight_col
        else token_count(F.col(text_col))
    ).cast("long")
    # plan aliases qualify the refs: both crossJoin branches derive from
    # `docs`, and the self-derived join otherwise leaves `__w` ambiguous
    base = docs.select("*", w.alias("__w")).alias("__l")
    tot = (
        docs.select(w.alias("__wt"))
        .agg(F.sum("__wt").alias("__W"))
        .alias("__r")
    )
    thresh = F.floor(
        F.least(
            (
                F.lit(n_target).cast("double")
                * F.col("__l.__w").cast("double")
            )
            / F.col("__r.__W").cast("double"),
            F.lit(1.0),
        )
        * F.lit(float(2**60))
    ).cast("long")
    h = hash60(F.col(f"__l.{id_col}").cast("string"), seed)
    return (
        base.crossJoin(F.broadcast(tot))
        .filter(h < thresh)
        .select(
            F.col(f"__l.{id_col}").alias(id_col),
            F.col("__l.__w").alias("weight"),
            thresh.alias("threshold"),
        )
    )


def sql_pps_sample(
    n_target: int,
    seed: str = "pps",
    weight_expr: str | None = None,
    source: str = "documents",
) -> str:
    """DuckDB twin of `pps_sample` (token_count weight by default)."""
    w = weight_expr or "len(string_split(text, ' '))"
    h = hash60_sql("CAST(doc_id AS VARCHAR)", seed)
    return f"""
WITH b AS (SELECT doc_id, CAST({w} AS BIGINT) AS w FROM {source}),
t AS (SELECT sum(w) AS wtot FROM b),
s AS (SELECT doc_id, w,
        CAST(floor(least(CAST({n_target} AS DOUBLE) * CAST(w AS DOUBLE)
                           / CAST(wtot AS DOUBLE), 1.0)
                   * 1152921504606846976.0) AS BIGINT) AS threshold
      FROM b, t)
SELECT doc_id, w AS weight, threshold
FROM s WHERE {h} < threshold
"""


def wor_priority(key: Column, weight: Column, seed: str = "wor") -> Column:
    """The Efraimidis-Spirtakis sampling key as a portable BIGINT:
    floor(ln(u) / w * 1e9) with u = (hash60(key)+1)/2^60 in (0, 1].
    Ranking by u^(1/w) descending IS a weighted draw without
    replacement (ES 2006, "Weighted random sampling with a reservoir"),
    and ln(u)/w is its monotone twin. The hash->unit transform is
    exact IEEE (long add, long->double cast, power-of-two divide); ln
    is the one libm call, nano-floored so both engines emit the same
    integer (the bigram-LM avg_logp precedent), and ties — possible
    after flooring — break on the id, deterministically.

    A non-positive weight NULLs the priority on BOTH engines (ln(u)/0
    is -inf, which Spark's long cast saturates but DuckDB's refuses —
    the cross-engine divergence class ADVICE r10 flagged); the default
    token_count weight is always >= 1, so this only guards caller-
    supplied weight columns. Every draw (batch, grouped, streaming
    reservoir) EXCLUDES NULL-priority rows — an unsampleable row never
    pads a sample, even when a group has fewer than k valid rows
    (ADVICE r11: the streaming fold already dropped them; the batch and
    SQL forms filter explicitly so all three agree)."""
    u = (hash60(key.cast("string"), seed) + F.lit(1)).cast("double") / F.lit(
        float(2**60)
    )
    return F.when(
        weight > 0,
        F.floor(F.ln(u) / weight.cast("double") * F.lit(1e9)).cast("long"),
    )


def sql_wor_priority(key_expr: str, weight_expr: str, seed: str = "wor") -> str:
    """DuckDB twin of `wor_priority` (same bits, same op order, same
    non-positive-weight NULL guard)."""
    h = hash60_sql(f"CAST({key_expr} AS VARCHAR)", seed)
    return (
        f"CASE WHEN {weight_expr} > 0 THEN "
        f"CAST(floor(ln(CAST({h} + 1 AS DOUBLE) / 1152921504606846976.0)"
        f" / CAST({weight_expr} AS DOUBLE) * 1e9) AS BIGINT) END"
    )


def wor_sample(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    weight_col: str | None = None,
    seed: str = "wor",
) -> DataFrame:
    """EXACTLY-k weighted sampling without replacement (Efraimidis &
    Spirtakis 2006): the top-k documents under the `wor_priority` key,
    inclusion probability proportional to token count. The fixed-size
    complement of `pps_sample` (Poisson PPS draws an *expected* ~n; a
    token-budgeted training mix often needs exactly k rows).

    Scale shape: the priority is a pure map-side projection and the
    top-k is TakeOrdered — per-partition heaps of k rows, no global
    sort, no shuffle of the corpus; k rows reach the driver. The same
    key also merges across shards (the per-shard top-k union's top-k
    is the global sample), which is what makes the draw resumable and
    distributable."""
    w = (
        F.col(weight_col) if weight_col else token_count(F.col(text_col))
    ).cast("long")
    return (
        docs.select(
            F.col(id_col),
            w.alias("weight"),
        )
        .withColumn("pri_e9", wor_priority(F.col(id_col), F.col("weight"), seed))
        .filter(F.col("pri_e9").isNotNull())
        .orderBy(F.desc("pri_e9"), F.col(id_col))
        .limit(k)
    )


def sql_wor_sample(
    k: int,
    seed: str = "wor",
    weight_expr: str | None = None,
    source: str = "documents",
) -> str:
    """DuckDB twin of `wor_sample` (token_count weight by default)."""
    w = weight_expr or "len(string_split(text, ' '))"
    pri = sql_wor_priority("doc_id", "weight", seed)
    return f"""
WITH b AS (SELECT doc_id, CAST({w} AS BIGINT) AS weight FROM {source}),
p AS (SELECT doc_id, weight, {pri} AS pri_e9 FROM b)
SELECT doc_id, weight, pri_e9 FROM p WHERE pri_e9 IS NOT NULL
ORDER BY pri_e9 DESC, doc_id LIMIT {k}
"""


def sql_wor_sample_grouped(
    k: int,
    group_col: str = "source",
    seed: str = "wor",
    source: str = "documents",
) -> str:
    """DuckDB twin of the per-group weighted reservoir (streaming
    `wor_stream` drained == batch per-group top-k under the same key)."""
    pri = sql_wor_priority("doc_id", "weight", seed)
    return f"""
WITH b AS (SELECT {group_col} AS g, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS weight
           FROM {source}),
p AS (SELECT g, doc_id, weight, {pri} AS pri_e9 FROM b),
r AS (SELECT *, row_number()
        OVER (PARTITION BY g ORDER BY pri_e9 DESC, doc_id) AS rn
      FROM p WHERE pri_e9 IS NOT NULL)
SELECT g AS {group_col}, doc_id, weight, pri_e9 FROM r WHERE rn <= {k}
"""


def wor_sample_grouped(
    docs: DataFrame,
    k: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "wor",
) -> DataFrame:
    """Exactly-k-PER-GROUP weighted sampling without replacement: the
    same Efraimidis-Spirtakis key as `wor_sample`, quota'd per group —
    the weighted counterpart of `cap_per_group`'s uniform cap, and the
    draw a training mix with hard per-language quotas actually needs
    (stratified_sample fixes RATES, this fixes COUNTS; `wor_sample`
    draws globally and can starve a rare language).

    Scale shape: the rank window partitions by the group and compiles
    to WindowGroupLimit, so each map task forwards at most k rows per
    group into the shuffle — never a corpus sort (the kmv/cap_per_group
    precedent)."""
    w = token_count(F.col(text_col)).cast("long")
    base = docs.select(
        F.col(group_col),
        F.col(id_col),
        w.alias("weight"),
    ).withColumn("pri_e9", wor_priority(F.col(id_col), F.col("weight"), seed))
    base = base.filter(F.col("pri_e9").isNotNull())
    win = Window.partitionBy(group_col).orderBy(
        F.desc("pri_e9"), F.col(id_col)
    )
    return (
        base.withColumn("rn", F.row_number().over(win).cast("long"))
        .filter(F.col("rn") <= k)
    )
