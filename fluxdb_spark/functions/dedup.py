"""Deduplication operators for the training-data pipeline layer.

Scale design (the point of doing this on Spark):

- exact dedup: hash-groupBy — one shuffle on a 60-bit content hash, map-side
  combine keeps the shuffle at |distinct| rows;
- n-gram Jaccard: EXACT via PPJoin-style prefix filtering — only each
  doc's rarest `n - ceil(t*n) + 1` shingles (by global doc-frequency) join,
  so hot shingles never generate candidate pairs (the quadratic hot-key
  cliff of a naive shingle self-join); exact array_intersect verifies;
- MinHash + LSH: k independent 60-bit min-hashes per doc, banded into
  (band_idx, h1, h2) bucket keys; candidate pairs come from an equi-join on
  the bucket key (again: no cross join), then exact Jaccard verifies.

Everything is built-in expressions (higher-order array functions) — no
Python in the hot path — and every step is reproducible in DuckDB via the
portable md5-based `hash60` (functions/hashing.py), so the whole pipeline is
oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fluxdb_spark.functions.hashing import hash60, hash60_sql
from fluxdb_spark.session import spread

SHINGLE_WORDS = 3
MINHASH_K = 8
LSH_BANDS = 4  # rows-per-band = MINHASH_K // LSH_BANDS = 2


def word_shingles(text: Column, n: int = SHINGLE_WORDS) -> Column:
    """Distinct n-word shingles of lowercased text (JVM-side transform).

    The token array is bound ONCE per row as a lambda variable (transform
    over a singleton array): subexpressions inside a higher-order-function
    lambda are re-evaluated per element and invisible to Spark's
    common-subexpression elimination, so inlining `split(lower(text))` into
    the per-shingle lambda re-split the document once per shingle per
    referenced token — O(n * len^2) work per doc (measured 19x slower at
    sf0.1 for n=8). Shingles come from one `slice` of the bound array each.
    """

    def _shingles(toks: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(toks) - (n - 1), F.lit(1))
        body = F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
        )
        # guard docs shorter than n tokens (sequence would run backwards;
        # CaseWhen evaluates the branch lazily)
        return F.when(F.size(toks) >= n, body).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(
        F.transform(F.array(F.split(F.lower(text), " ")), _shingles), 1
    )


def sql_shingles_ctes(n: int = SHINGLE_WORDS, source: str = "documents") -> str:
    """DuckDB twin of `word_shingles`, as CTEs producing `sh(doc_id, shingle)`
    (one row per distinct shingle) and `shsize(doc_id, n)`."""
    parts = ", ".join(f"t[i+{j}]" for j in range(n))
    return f"""
    toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM {source}),
    shingle_lists AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t) - {n - 2}),
                           i -> concat_ws(' ', {parts}))) AS shingles
      FROM toks WHERE len(t) >= {n}),
    sh AS (SELECT doc_id, unnest(shingles) AS shingle FROM shingle_lists),
    shsize AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)"""


def exploded_shingles(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return docs.select(
        F.col(id_col), F.explode(word_shingles(F.col("text"))).alias("shingle")
    )


def exploded_shingle_hashes(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, xxhash64(shingle)) — the join-side relation of `jaccard_pairs`.

    Joining on an 8-byte hash instead of the shingle string shrinks the
    shuffle and speeds the probe; a 64-bit collision between two distinct
    shingles of the same corpus is ~1e-8 even at 1e5 distinct shingles, and
    would only perturb one intersection count by 1."""
    return exploded_shingles(docs, id_col).select(
        F.col(id_col), F.xxhash64("shingle").alias("shingle")
    )


def shingle_relation(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Checkpointed (id, shingles) relation — the shingle-assembly corpus
    pass, materialized ONCE so an entry that feeds several shingle
    consumers (exact pair pipeline + MinHash signatures + LSH verify)
    pays for tokenize/slice/concat a single time.  Pass the result as
    `shingles_rel` to `jaccard_pairs` / `minhash_signatures` /
    `minhash_lsh_dedup`."""
    return (
        spread(docs)
        .select(
            F.col(id_col), word_shingles(F.col("text")).alias("shingles")
        )
        .localCheckpoint()
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    shingles_rel: DataFrame | None = None,
) -> DataFrame:
    """All (d1 < d2) pairs with shingle-set Jaccard >= threshold — EXACT,
    via PPJoin-style prefix filtering (Bayardo et al. WWW'07 / Xiao et al.
    PPJoin), not a full shingle self-join.

    Why: a naive self-equi-join on shingle does O(sum_s freq(s)^2) work — a
    single stopword shingle appearing in 100k docs creates 10^10 candidate
    pairs, the hot-key cliff that kills corpus-scale dedup. Prefix
    filtering is the standard exact fix: order every doc's shingles by
    ascending global document frequency (rare first) and join only each
    doc's first `n - ceil(t*n) + 1` shingles. Two sets with Jaccard >= t
    must share at least one prefix token under a common total order, so no
    qualifying pair is lost (the dedup_ngram oracle — the naive SQL join —
    verifies exactly that at every scale factor), while hot shingles sort
    to the back of every prefix and stop generating candidates.

    Candidates are then verified with an exact `array_intersect` on the
    per-doc HASHED shingle arrays — O(|candidates|), and the verification
    dominates only when the candidate set is small, which is the point.
    Verifying on the 8-byte xxhash64 values instead of the shingle strings
    is the same collision contract the candidate join already carries
    (documented at `exploded_shingle_hashes`): a 64-bit collision between
    two distinct shingles of one corpus is ~1e-8 and would perturb one
    intersection count by 1 — and it makes the checkpointed relation and
    the two verify joins ship bigint arrays instead of string arrays
    (profiled 2.5x faster verification at the 0.6-threshold candidate
    volume).

    `shingles_rel` (a `shingle_relation` result) skips the shingle-
    assembly corpus pass when the caller already materialized one for
    another consumer; the hashed relation is checkpointed itself so the
    three consumer branches (prefix pipeline + two verify sides) hash
    each shingle once, exactly as in the self-built path."""
    if shingles_rel is not None:
        with_sh = shingles_rel.select(
            F.col(id_col),
            F.array_distinct(
                F.transform("shingles", lambda s: F.xxhash64(s))
            ).alias("hsh"),
        ).localCheckpoint()
    else:
        with_sh = (
            spread(docs)
            .select(
                F.col(id_col), word_shingles(F.col("text")).alias("shingles")
            )
            .select(
                F.col(id_col),
                F.array_distinct(
                    F.transform("shingles", lambda s: F.xxhash64(s))
                ).alias("hsh"),
            )
            .localCheckpoint()  # materialize BEFORE branching: AQE runs
            # independent stages as concurrent jobs, and branches racing to
            # fill an un-built cache each recompute it (observed 2-5x latency
            # swings); localCheckpoint, not persist, so nothing lingers in the
            # session cache after the consumers finish
        )
    # one pass over the exploded shingles: df as a count window over
    # `shingle` (same Exchange a groupBy would need, but no join-back —
    # the old df-aggregate + equi-join re-evaluated the whole
    # explode+hash branch a second time), and the per-doc set size from
    # size(hsh) (word_shingles output is array_distinct, so the explode
    # emits exactly that many rows — the second window the old form
    # computed it with is pure overhead)
    sh = with_sh.select(
        F.col(id_col),
        F.size("hsh").alias("n"),
        F.explode("hsh").alias("shingle"),
    )
    w_df = Window.partitionBy("shingle")
    w_ord = Window.partitionBy(id_col).orderBy("df", "shingle")
    prefix = (
        sh.withColumn("df", F.count(F.lit(1)).over(w_df))
        .select(
            F.col(id_col),
            "shingle",
            F.row_number().over(w_ord).alias("rn"),
            "n",
        )
        .filter(
            F.col("rn")
            <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
        )
        .select(F.col(id_col), "shingle", "n")
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    # length filter (also standard): J(x,y) >= t forces t*|x| <= |y| <= |x|/t,
    # so wildly different-sized sets never reach verification
    cand = (
        a.join(b, on="shingle")
        .filter(
            (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.col("b.n") >= F.ceil(F.lit(threshold) * F.col("a.n")))
            & (F.col("b.n") * F.lit(threshold) <= F.col("a.n"))
        )
        .select(
            F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2")
        )
        .distinct()
    )
    va = with_sh.select(
        F.col(id_col).alias("d1"), F.col("hsh").alias("sh1")
    )
    vb = with_sh.select(
        F.col(id_col).alias("d2"), F.col("hsh").alias("sh2")
    )
    inter = F.size(F.array_intersect(F.col("sh1"), F.col("sh2")))
    return (
        cand.join(va, on="d1")
        .join(vb, on="d2")
        .withColumn(
            "jaccard",
            F.round(
                inter / (F.size("sh1") + F.size("sh2") - inter),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def shingle_hash_chunks(shingle: Column, k: int = MINHASH_K) -> list[Column]:
    """k 32-bit hashes per shingle from ceil(k/4) md5 evaluations: each md5
    yields four 8-hex-char chunks. Hashing is the dominant cost of MinHash at
    scale — this computes 2 digests per shingle instead of k."""
    out: list[Column] = []
    for d in range((k + 3) // 4):
        digest = F.md5(
            shingle if d == 0 else F.concat(F.lit(f"{d}|"), shingle)
        )
        for c in range(4):
            if len(out) < k:
                out.append(
                    F.conv(F.substring(digest, 1 + 8 * c, 8), 16, 10).cast(
                        "long"
                    )
                )
    return out


def sql_shingle_hash_chunks(expr: str, k: int = MINHASH_K) -> list[str]:
    """DuckDB twin of `shingle_hash_chunks` (same bits)."""
    out: list[str] = []
    for d in range((k + 3) // 4):
        digest = f"md5({expr})" if d == 0 else f"md5(concat('{d}|', {expr}))"
        for c in range(4):
            if len(out) < k:
                out.append(
                    f"CAST(concat('0x', substr({digest}, {1 + 8 * c}, 8)) AS BIGINT)"
                )
    return out


def minhash_signatures(
    docs: DataFrame,
    k: int = MINHASH_K,
    id_col: str = "doc_id",
    shingles_rel: DataFrame | None = None,
) -> DataFrame:
    """k 32-bit min-hashes per doc as columns sig0..sig{k-1}.

    Entirely map-side (see _signatures_from_arrays).  `shingles_rel`
    (a `shingle_relation` result) reuses a shingle-assembly pass the
    caller already materialized for another consumer."""
    with_sh = (
        shingles_rel
        if shingles_rel is not None
        else spread(docs).select(
            F.col(id_col), word_shingles(F.col("text")).alias("shingles")
        )
    )
    return _signatures_from_arrays(with_sh, k, id_col)


def _chunk_extract(c: int):
    """Factory returning a one-arg lambda (PySpark would misread a two-arg
    lambda with a default as an (element, index) transform)."""
    return lambda dig: F.conv(F.substring(dig, 1 + 8 * c, 8), 16, 10).cast(
        "long"
    )


def _signatures_from_arrays(
    with_sh: DataFrame, k: int = MINHASH_K, id_col: str = "doc_id"
) -> DataFrame:
    """minhash_signatures over a pre-built (id, shingles array) relation.

    Entirely per-row: each digest array is computed once with a higher-order
    transform and each signature is an `array_min` over its chunk — ZERO
    shuffles and no join, so at 100 TB this is a single map stage whose cost
    is the md5s themselves (ceil(k/4) digests per shingle occurrence).
    Benchmarked ~35x faster than the explode->distinct->join->min formulation
    it replaces, with bit-identical output.
    """
    def _digest_fn(prefix: str | None):
        if prefix is None:
            return lambda s: F.md5(s)
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    n_digests = (k + 3) // 4
    digest_cols = [
        F.transform(
            "shingles", _digest_fn(None if d == 0 else f"{d}|")
        ).alias(f"d{d}")
        for d in range(n_digests)
    ]
    wd = with_sh.select(F.col(id_col), *digest_cols)
    return wd.select(
        F.col(id_col),
        *[
            F.array_min(F.transform(f"d{i // 4}", _chunk_extract(i % 4))).alias(
                f"sig{i}"
            )
            for i in range(k)
        ],
    )


def _banded(
    sigs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bucket) rows, one per LSH band: the bucket is the tuple
    (band_idx, sig values of the band) — an equi-join key, so collisions
    come out of a shuffle on bucket, never a cross join."""
    rows_per_band = k // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                *[
                    F.col(f"sig{b * rows_per_band + r}").alias(f"h{r}")
                    for r in range(rows_per_band)
                ],
            )
            for b in range(bands)
        ]
    )
    return sigs.select(F.col(id_col), F.explode(band_structs).alias("bucket"))


def lsh_candidate_pairs(
    sigs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct candidate pairs sharing at least one LSH band bucket
    (see _banded for the equi-join key construction)."""
    # |docs| x (k+1) — tiny; persist so the self-join doesn't recompute the
    # whole hash->min pipeline on both sides.
    banded = _banded(
        sigs, k, bands, id_col
    ).localCheckpoint()  # materialize before the self-join branches
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on="bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2")
        )
        .distinct()
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    threshold: float,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    id_col: str = "doc_id",
    shingles_rel: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup detection: LSH candidates, then exact-Jaccard
    verification of ONLY those candidates.

    Verification joins the candidate pairs back to the per-doc shingle
    *arrays* and scores with array_intersect/array_union — O(|candidates|)
    work, never the all-pairs shingle join. At scale this is the whole point
    of LSH: the shuffle carries |docs| signatures + |candidates| pairs.

    `shingles_rel` (a `shingle_relation` result, already checkpointed)
    reuses a caller-materialized shingle-assembly pass."""
    with_sh = (
        shingles_rel
        if shingles_rel is not None
        else spread(docs)
        .select(F.col(id_col), word_shingles(F.col("text")).alias("shingles"))
        .localCheckpoint()  # materialize before the 4 consumer branches (see
        # jaccard_pairs: concurrent AQE jobs race on an un-built cache)
    )
    sigs = _signatures_from_arrays(with_sh, k, id_col)
    cands = lsh_candidate_pairs(sigs, k, bands, id_col)
    return verify_jaccard_candidates(cands, with_sh, threshold)


def verify_jaccard_candidates(
    cands: DataFrame, with_sh: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate (d1, d2) pairs against a
    per-doc shingle-array relation — O(|candidates|) joins, shared by the
    recompute pipeline and the materialized-signature path."""
    id_col = [c for c in with_sh.columns if c != "shingles"][0]
    s1 = with_sh.select(
        F.col(id_col).alias("d1"), F.col("shingles").alias("sh1")
    )
    s2 = with_sh.select(
        F.col(id_col).alias("d2"), F.col("shingles").alias("sh2")
    )
    inter = F.size(F.array_intersect(F.col("sh1"), F.col("sh2")))
    union = F.size(F.array_union(F.col("sh1"), F.col("sh2")))
    return (
        cands.join(s1, on="d1")
        .join(s2, on="d2")
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style PARAGRAPH-level exact dedup: any sentence/paragraph span
    that occurs more than once in the corpus is kept only at its FIRST
    occurrence (smallest (doc_id, position)) and dropped everywhere else;
    each document is rebuilt from its surviving spans in order. This is
    the sub-document sibling of `exact` doc dedup — boilerplate (cookie
    banners, license headers, navigation chrome) dies corpus-wide while
    the unique prose survives.

    Spans are '. '-separated; ownership groups on the span's 60-bit hash
    (hash60 — the same corpus-wide fingerprinting discipline as
    `doc_fingerprint`; at 2^60 the collision expectation stays << 1 far
    beyond 100 TB of distinct spans). Scale shape: one explode feeding a
    combine-friendly min-aggregate (the shuffle carries distinct span
    hashes after map-side combine, never span text x occurrences), one
    equi-join back on the hash, and one per-doc rebuild groupBy — no
    all-pairs anything.

    Output: (doc_id, clean_text, n_kept, n_dropped); a document whose
    every span was boilerplate survives with clean_text = ''."""
    paras = (
        spread(docs)
        .select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), r"\. ")).alias(
                "pos", "para"
            ),
        )
        .filter(F.col("para") != "")
        .select(
            F.col(id_col),
            F.col("pos").cast("long").alias("pos"),
            "para",
            hash60(F.col("para")).alias("h"),
        )
    )
    owner = paras.groupBy("h").agg(
        F.min(
            F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
        ).alias("o")
    )
    kept = paras.join(owner, on="h").filter(
        (F.col(id_col) == F.col("o.d")) & (F.col("pos") == F.col("o.p"))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            ". ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = paras.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_total"))
    return (
        totals.join(rebuilt, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias(
                "n_kept"
            ),
            (
                F.col("n_total")
                - F.coalesce(F.col("n_kept"), F.lit(0))
            ).cast("long").alias("n_dropped"),
        )
    )


def sql_paragraph_dedup() -> str:
    """DuckDB twin of `paragraph_dedup`: same split, same hash60 grouping,
    same first-occurrence rule, same ordered rebuild."""
    return f"""
WITH paras AS (
  SELECT doc_id,
         CAST(generate_subscripts(string_split(text, '. '), 1) - 1
              AS BIGINT) AS pos,
         unnest(string_split(text, '. ')) AS para
  FROM documents),
hashed AS (
  SELECT doc_id, pos, para, {hash60_sql('para')} AS h
  FROM paras WHERE para <> ''),
owner AS (
  SELECT h, min(struct_pack(d := doc_id, p := pos)) AS o
  FROM hashed GROUP BY h),
kept AS (
  SELECT hashed.* FROM hashed JOIN owner USING (h)
  WHERE hashed.doc_id = owner.o.d AND hashed.pos = owner.o.p),
rebuilt AS (
  SELECT doc_id, string_agg(para, '. ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id),
totals AS (SELECT doc_id, count(*) AS n_total FROM hashed GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(t.n_total - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""


def minhash_lsh_dedup_from_sigs(
    sigs: DataFrame,
    docs: DataFrame,
    threshold: float,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    id_col: str = "doc_id",
) -> DataFrame:
    """`minhash_lsh_dedup` with the signature computation REPLACED by a
    precomputed signature relation (id, sig0..sig{k-1}) — the standing-
    service form reading a materialized signature table
    (streaming/retrieval.py) instead of re-hashing the corpus. Only the
    verified candidates touch document text, so the per-query cost is
    |candidates|, not |corpus|. Output is identical to the recompute
    form when `sigs` covers the same corpus."""
    cands = lsh_candidate_pairs(
        sigs.select(id_col, *[f"sig{i}" for i in range(k)]),
        k,
        bands,
        id_col,
    )
    with_sh = docs.select(
        F.col(id_col), word_shingles(F.col("text")).alias("shingles")
    ).localCheckpoint()
    return verify_jaccard_candidates(cands, with_sh, threshold)


def minhash_probe_candidates(
    sigs: DataFrame,
    probes: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Membership probe against a STANDING signature table — the
    ingestion-time question a corpus-dedup service answers: "is this NEW
    document a near-dup of anything already in the corpus?" (before the
    pipeline admits it). `probes` is a small (probe_id, sig0..sig{k-1})
    relation — typically `minhash_signatures` over the handful of
    incoming documents; `sigs` is the materialized corpus table
    (streaming/retrieval.py).

    Output: (probe_id, doc_id, est_jaccard) for every corpus doc sharing
    at least one LSH band with a probe, where est_jaccard is the MinHash
    estimate — the fraction of agreeing signature components (the
    standard unbiased estimator; exact-Jaccard verification of the
    candidates stays available via verify_jaccard_candidates when text
    is at hand). Scale shape: probes broadcast to the band equi-join, so
    the per-probe cost is O(banded collisions) against the standing
    table — never a corpus scan, never all-pairs."""
    probe_sigs = probes.select(
        F.col(id_col).alias("probe_id"),
        *[F.col(f"sig{i}").alias(f"p{i}") for i in range(k)],
    )
    banded_c = _banded(sigs.select(id_col, *[f"sig{i}" for i in range(k)]),
                       k, bands, id_col)
    banded_p = _banded(
        probe_sigs.select(
            "probe_id", *[F.col(f"p{i}").alias(f"sig{i}") for i in range(k)]
        ),
        k,
        bands,
        id_col="probe_id",
    )
    cands = (
        banded_c.join(F.broadcast(banded_p), on="bucket")
        .select("probe_id", id_col)
        .distinct()
    )
    agree = sum(
        F.when(F.col(f"sig{i}") == F.col(f"p{i}"), 1).otherwise(0)
        for i in range(k)
    )
    return (
        cands.join(sigs, id_col)
        .join(F.broadcast(probe_sigs), "probe_id")
        .select(
            "probe_id",
            F.col(id_col),
            (agree.cast("double") / F.lit(float(k))).alias("est_jaccard"),
        )
    )


_SIMHASH_FIELD_BITS = 21  # 3 packed ones-counters per long; a counter
# overflows only past 2^21 tokens in ONE document, far beyond any real doc


def simhash(docs: DataFrame, bits: int = 32, id_col: str = "doc_id") -> DataFrame:
    """SimHash fingerprint over tokens: bit b is set iff more token-hashes
    have bit b set than not (tie -> 0). Pure aggregation — map-side combine,
    one shuffle of the packed partial counts per doc.

    The per-bit ones-counts are PACKED three-per-long into 21-bit fields:
    a 32-bit simhash aggregates ceil(32/3)+1 = 12 buffers instead of 32
    scalar conditional sums (hash-agg update cost scales with the buffer
    count). Bit b is set iff 2*ones_b > n_tokens — algebraically identical
    to +/-1 counting; the DuckDB oracle keeps the 32-sum form, so the two
    independent derivations cross-check each other."""
    fields_per_long = 63 // _SIMHASH_FIELD_BITS
    n_groups = -(-bits // fields_per_long)
    tok = spread(docs).select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    ).withColumn("h", hash60(F.col("token")))
    packed_aggs = []
    for g in range(n_groups):
        term = None
        for j in range(fields_per_long):
            b = g * fields_per_long + j
            if b >= bits:
                break
            bit = F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))
            shifted = bit * F.lit(1 << (_SIMHASH_FIELD_BITS * j))
            term = shifted if term is None else term + shifted
        packed_aggs.append(F.sum(term).alias(f"s{g}"))
    counted = tok.groupBy(id_col).agg(
        *packed_aggs, F.count(F.lit(1)).alias("n_tok")
    )
    mask = (1 << _SIMHASH_FIELD_BITS) - 1
    fp = None
    for b in range(bits):
        g, j = divmod(b, fields_per_long)
        ones = F.shiftright(
            F.col(f"s{g}"), _SIMHASH_FIELD_BITS * j
        ).bitwiseAND(F.lit(mask))
        term = F.when(2 * ones > F.col("n_tok"), F.lit(1 << b)).otherwise(
            F.lit(0)
        )
        fp = term if fp is None else fp + term
    return counted.select(F.col(id_col), fp.cast("long").alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_distance: int = 3,
    bits: int = 32,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs at Hamming distance <= max_distance between SimHash
    fingerprints — EXACT, via the standard pigeonhole banding: split the
    b-bit fingerprint into (max_distance + 1) blocks; two fingerprints
    within distance d <= max_distance must agree exactly on at least one
    block, so candidates come from an equi-join on (block_idx, block_bits)
    — never an all-pairs XOR scan — and `bit_count(xor)` verifies.

    The same shape as LSH-banded MinHash but lossless: the block join finds
    every qualifying pair, the verify only removes false candidates."""
    n_blocks = max_distance + 1
    if bits % n_blocks:
        raise ValueError(
            f"bits={bits} must divide evenly into {n_blocks} blocks"
        )
    w = bits // n_blocks
    mask = (1 << w) - 1
    sigs = simhash(docs, bits, id_col).localCheckpoint()
    # (materialized before the self-join branches)
    blocks = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("simhash"), i * w)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("b"),
    ).select(id_col, "simhash", "b.blk", "b.val")
    a = blocks.alias("a")
    b = blocks.alias("b")
    return (
        a.join(b, on=["blk", "val"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("d1"),
            F.col(f"b.{id_col}").alias("d2"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
        .distinct()
    )


def sql_simhash(bits: int = 32) -> str:
    """DuckDB twin of `simhash` (FROM documents; doc_id/text columns)."""
    h = hash60_sql("token")
    sums = ", ".join(
        f"sum(CASE WHEN ({h} & {1 << b}) != 0 THEN 1 ELSE -1 END) AS c{b}"
        for b in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN c{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents),
    counted AS (SELECT doc_id, {sums} FROM tok GROUP BY doc_id)
    SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM counted
    """


def connected_components(
    pairs: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """(d1, d2) near-dup pairs -> (doc_id, component) via iterative
    min-label propagation — the step that turns pairwise matches into dedup
    clusters with one canonical survivor (min doc id) each.

    `pairs` is expected DISTINCT by construction (every catalog pair
    pipeline ends in a groupBy(d1, d2)); no defensive dedup happens
    here. Duplicate edges stay CORRECT (min-label is idempotent) but a
    caller shipping heavy duplication pays for it in every iteration's
    neighbor join — pre-distinct such inputs before calling.

    Each iteration is one join + one aggregate: every node adopts the
    smallest label among itself and its neighbors. Converges in
    O(diameter) iterations (near-dup clusters are small and dense, so
    usually 2-3); iteration happens driver-side but ALL data stays
    distributed — the loop only chains DataFrame ops and checks a scalar
    convergence count. localCheckpoint() truncates the growing lineage so
    plan size stays constant across iterations.
    """
    pairs = pairs.localCheckpoint()
    # materialized EAGERLY: the two union branches below and every
    # iteration's neighbor join consume it, and pairs is typically an
    # expensive similarity pipeline — lazy here would evaluate that
    # pipeline once per consumer inside the first job
    edges = (
        pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
        .unionByName(pairs.select(F.col("d2").alias("a"), F.col("d1").alias("b")))
        # no distinct: every shipped pair relation is distinct by
        # construction (pair formation ends in a groupBy(d1, d2)), and
        # min-label is idempotent under duplicate edges — a distinct
        # here paid a full shuffle of the edge list per call for pure
        # defensiveness
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=False)
        # edges/labels LAZY: iteration 1's convergence probe is the
        # first action over both, so one job materializes their blocks
        # (reading pairs' stored blocks, not the pair pipeline) —
        # the eager form ran one setup job per relation
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col("node").alias("b"), F.col("component").alias("nbr_label")
                ),
                on="b",
            )
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("nbr_label").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (
                    F.coalesce(F.col("nbr_min"), F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )
            # LAZY checkpoint: the convergence count below is the first
            # action, so ONE job materializes the iteration's label
            # blocks AND answers the convergence probe (the eager form
            # ran a separate materialization job per iteration); the
            # next iteration's two consumers then read the stored
            # blocks, lineage truncated as before
            .localCheckpoint(eager=False)
        )
        changed = updated.filter(F.col("_changed")).limit(1).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    else:
        # A silent early exit would split chain-shaped clusters longer than
        # max_iterations hops into wrong components with no signal.
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations; the pair graph has a path longer than that "
            "(raise max_iterations — cost is O(diameter) joins)"
        )
    return labels.select(F.col("node").alias("doc_id"), "component")


def dedup_survivors(pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Full dedup decision: cluster the near-dup pairs, keep the min-id doc
    of each cluster, pass through every unpaired doc. Returns (doc_id, keep,
    component)."""
    comp = connected_components(pairs)
    keep_flag = (F.col("component") == F.col(id_col)).alias("keep")
    clustered = comp.select(F.col("doc_id"), F.col("component")).withColumn(
        "keep", keep_flag
    )
    unpaired = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, on="doc_id", how="left_anti")
        .select(
            "doc_id",
            F.col("doc_id").alias("component"),
            F.lit(True).alias("keep"),
        )
    )
    return clustered.unionByName(unpaired)


# --- exact-substring duplication at chunk granularity -----------------------

CHUNK_WORDS = 10


def doc_chunks(text: Column, chunk: int = CHUNK_WORDS) -> Column:
    """Consecutive non-overlapping `chunk`-word windows of lowercased text
    (the last window may be shorter). Unlike shingles these tile the
    document, so corpus-wide chunk counting approximates the
    exact-substring-dedup signal (Lee et al., "Deduplicating Training Data
    Makes Language Models Better") at 1/chunk the explode factor — the
    property that makes it affordable at 100 TB. Token array bound once
    via the singleton-array transform (see word_shingles)."""

    def _chunks(toks: Column) -> Column:
        n_chunks = F.ceil(F.size(toks) / F.lit(float(chunk))).cast("int")
        idx = F.sequence(F.lit(0), n_chunks - 1, F.lit(1))
        return F.transform(
            idx,
            lambda i: F.array_join(F.slice(toks, i * chunk + 1, chunk), " "),
        )

    return F.element_at(
        F.transform(F.array(F.split(F.lower(text), " ")), _chunks), 1
    )


def chunk_dup_stats(
    docs: DataFrame, chunk: int = CHUNK_WORDS, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document exact-substring duplication profile: how many of the
    document's `chunk`-word tiles occur more than once corpus-wide.
    Returns (doc_id, n_chunks, n_dup_chunks, dup_ratio).

    Scale shape: tiles join on their portable 60-bit hash, not the string —
    the shuffle carries 8-byte keys; duplicate detection is one
    hash-groupBy with map-side combine (|distinct tiles| rows); the
    per-doc rollup is a second combine-friendly groupBy. No all-pairs
    comparison, no Python, no skew cliff (a viral tile inflates one
    count, not a candidate-pair blowup).
    """
    tiles = spread(docs).select(
        F.col(id_col),
        F.explode(doc_chunks(F.col("text"), chunk)).alias("tile"),
    ).select(F.col(id_col), hash60(F.col("tile"), seed="chunk").alias("h"))
    dup = (
        tiles.groupBy("h")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") > 1)
        .select("h")
    )
    flagged = tiles.join(dup.withColumn("_dup", F.lit(1)), on="h", how="left")
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("_dup").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_dup_chunks"),
        (
            F.floor(
                F.sum(F.when(F.col("_dup").isNotNull(), 1).otherwise(0))
                / F.count(F.lit(1))
                * 10000
            )
            / 10000.0
        ).alias("dup_ratio"),
    )


def sql_chunk_dup_stats(chunk: int = CHUNK_WORDS) -> str:
    """DuckDB twin of `chunk_dup_stats` (same tiling, same hash60 keys)."""
    h = hash60_sql("tile", "chunk")
    return f"""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
tiles AS (
  SELECT doc_id,
         {h.replace('tile', f"array_to_string(t[(i*{chunk}+1):(i*{chunk}+{chunk})], ' ')")} AS h
  FROM toks,
       UNNEST(range(0, CAST(ceil(len(t) / {chunk}.0) AS BIGINT))) AS u(i)),
dup AS (SELECT h FROM tiles GROUP BY h HAVING count(*) > 1),
flagged AS (SELECT t.doc_id, t.h, (d.h IS NOT NULL) AS is_dup
            FROM tiles t LEFT JOIN dup d USING (h))
SELECT doc_id, count(*) AS n_chunks,
       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       floor(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) * 1.0 / count(*) * 10000)
         / 10000.0 AS dup_ratio
FROM flagged GROUP BY doc_id
"""


def simhash_col(text: Column, bits: int = 32) -> Column:
    """Per-row SimHash fingerprint — the same value `simhash()` computes by
    explode+groupBy, as a pure stateless projection (higher-order functions
    over the token array). This is the STREAMING form: a fingerprint that
    needs no aggregation can ride any readStream as a map-only column and
    feed watermarked dedup state directly. Token hashes are bound once via
    the singleton-array transform (HOF lambdas get no common-subexpression
    elimination, see word_shingles); equivalence with the batch form is
    pinned in tests/test_corpus.py."""

    def _fp(hs: Column) -> Column:
        n = F.size(hs)
        fp = None
        for b in range(bits):
            ones = F.size(
                F.filter(
                    hs, lambda h: h.bitwiseAND(F.lit(1 << b)) != F.lit(0)
                )
            )
            term = F.when(2 * ones > n, F.lit(1 << b)).otherwise(F.lit(0))
            fp = term if fp is None else fp + term
        return fp.cast("long")

    hashes = F.transform(
        F.split(F.lower(text), " "), lambda t: hash60(t)
    )
    return F.element_at(F.transform(F.array(hashes), _fp), 1)


def containment_pairs(
    docs: DataFrame, threshold: float, id_col: str = "doc_id"
) -> DataFrame:
    """All pairs with shingle-set CONTAINMENT |A∩B| / min(|A|,|B|) >=
    threshold — the asymmetric near-dup measure: a short document pasted
    inside a long one scores containment ~1.0 while its Jaccard is tiny,
    so a Jaccard threshold (`jaccard_pairs`) never surfaces it. EXACT,
    like the Jaccard form, via one-sided prefix filtering: a qualifying
    pair must share >= ceil(t*|S|) shingles with S the smaller side, so
    if none of S's first |S| - ceil(t*|S|) + 1 rarest shingles hits the
    OTHER doc's full shingle set, the pair cannot qualify — the prefix
    of the SMALL side joins the FULL index (the larger side cannot be
    prefix-filtered without knowing its partner's size). Hot shingles
    sort to the back of every prefix, so the join's candidate space is
    sum_s freq_full(s) * freq_prefix(s), not freq^2.

    Output (d1, d2, containment) with d1 the smaller set (ties to the
    lower id). Verification is an exact array_intersect per candidate on
    the hashed shingle arrays (the `jaccard_pairs` collision contract:
    bigint arrays instead of strings through the checkpoint and the two
    verify joins).
    """
    with_sh = (
        spread(docs)
        .select(
            F.col(id_col), word_shingles(F.col("text")).alias("shingles")
        )
        .select(
            F.col(id_col),
            F.array_distinct(
                F.transform("shingles", lambda s: F.xxhash64(s))
            ).alias("hsh"),
        )
        .localCheckpoint()  # same branch-race note as jaccard_pairs
    )
    # single-evaluation df-as-window + size(hsh) as the set size — same
    # rewrite as jaccard_pairs (the old df-aggregate + join-back
    # re-evaluated the explode+hash branch twice; shingles are
    # array_distinct so size() IS the per-doc count)
    sh = with_sh.select(
        F.col(id_col),
        F.size("hsh").alias("n"),
        F.explode("hsh").alias("shingle"),
    )
    w_df = Window.partitionBy("shingle")
    w_ord = Window.partitionBy(id_col).orderBy("df", "shingle")
    sized = sh.withColumn("df", F.count(F.lit(1)).over(w_df)).select(
        F.col(id_col),
        "shingle",
        F.row_number().over(w_ord).alias("rn"),
        "n",
    )
    prefix = sized.filter(
        F.col("rn")
        <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    ).select(F.col(id_col), "shingle", "n")
    full = sized.select(F.col(id_col), "shingle", "n")
    a = prefix.alias("a")  # prefix side = the SMALLER set of the pair
    b = full.alias("b")
    cand = (
        a.join(b, on="shingle")
        .filter(
            (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
            & (
                (F.col("a.n") < F.col("b.n"))
                | (
                    (F.col("a.n") == F.col("b.n"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                )
            )
        )
        .select(
            F.col(f"a.{id_col}").alias("d1"),
            F.col(f"b.{id_col}").alias("d2"),
        )
        .distinct()
    )
    va = with_sh.select(
        F.col(id_col).alias("d1"), F.col("hsh").alias("sh1")
    )
    vb = with_sh.select(
        F.col(id_col).alias("d2"), F.col("hsh").alias("sh2")
    )
    inter = F.size(F.array_intersect(F.col("sh1"), F.col("sh2")))
    return (
        cand.join(va, on="d1")
        .join(vb, on="d2")
        .withColumn(
            "containment", F.round(inter / F.size("sh1"), 4)
        )
        .filter(F.col("containment") >= threshold)
        .select("d1", "d2", "containment")
    )


def sql_containment(threshold: float, n: int = SHINGLE_WORDS) -> str:
    """DuckDB twin of `containment_pairs`: the naive shingle equi-join
    normalized by the smaller set, d1 = smaller (ties to lower id)."""
    return f"""
WITH {sql_shingles_ctes(n)},
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
scored AS (
  SELECT CASE WHEN sa.n < sb.n OR (sa.n = sb.n AND da < db)
              THEN da ELSE db END AS d1,
         CASE WHEN sa.n < sb.n OR (sa.n = sb.n AND da < db)
              THEN db ELSE da END AS d2,
         round(inter * 1.0 / least(sa.n, sb.n), 4) AS containment
  FROM inter
  JOIN shsize sa ON sa.doc_id = da
  JOIN shsize sb ON sb.doc_id = db)
SELECT d1, d2, containment FROM scored WHERE containment >= {threshold}
"""


# --- exact-substring duplicated spans ----------------------------------------
#
# The span-level member of the dedup family (Lee et al. 2021,
# "Deduplicating Training Data Makes Language Models Better", ExactSubstr):
# instead of scoring documents as wholes (Jaccard / containment /
# MinHash / SimHash), find the maximal token RANGES whose content occurs
# at least twice anywhere in the corpus — boilerplate headers, license
# blocks, templated paragraphs — so a pipeline can cut the spans and keep
# the document. The suffix-array construction of the paper is replaced by
# the DataFrame-native equivalent: positional fixed-width shingles, a
# corpus-wide occurrence count on the shingle hash, and a per-document
# interval merge of the duplicated positions (gaps-and-islands).
# Reference parity note: fluxdb has no text analytics at all; this is
# part of the beyond-reference training-data layer (SURVEY §2.8).

SPAN_WIDTH = 8


def positional_shingles(text: Column, n: int = SPAN_WIDTH) -> Column:
    """ALL n-word shingles of lowercased text in position order (no
    array_distinct — positions matter here). Same one-bind token-array
    trick as `word_shingles` (binding `split()` once per row; inlining it
    into the lambda re-splits the doc per shingle per referenced token)."""

    def _shingles(toks: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(toks) - (n - 1), F.lit(1))
        body = F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i, n), " ")
        )
        return F.when(F.size(toks) >= n, body).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(
        F.transform(F.array(F.split(F.lower(text), " ")), _shingles), 1
    )


def duplicated_spans(
    docs: DataFrame,
    width: int = SPAN_WIDTH,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated token spans per document:
    (doc_id, span_start, span_end, span_tokens, n_hits).

    1. positional shingles -> (doc, pos, hash60(shingle)): map-side
       explode, like every shingle operator here;
    2. duplicated hashes = groupBy(hash) HAVING count > 1 — combine-
       friendly, the shuffle carries |distinct shingles| counts, never
       positions; a shingle repeated WITHIN one document counts too
       (the paper's definition: any second occurrence is a duplicate);
    3. occurrences of duplicated shingles = semi-join positions against
       the duplicated-hash relation (equi-join on the 8-byte hash);
    4. per-document interval merge: two duplicated starts p < p' belong
       to one span when p' - p <= width (their windows overlap or
       touch); island ids from one per-document window (partitionBy doc
       — never a global sort), span_end = max(start) + width - 1.

    All-integer, so spans are bit-deterministic cross-engine. Scale
    shape: the only data-proportional shuffles are the hash groupBy and
    the hash semi-join (both on the 8-byte key); the interval merge
    shuffles only duplicated positions, partitioned by document."""
    pos = spread(docs).select(
        F.col(id_col),
        F.posexplode(positional_shingles(F.col(text_col), width)).alias(
            "pos0", "shingle"
        ),
    ).select(
        F.col(id_col),
        (F.col("pos0") + 1).alias("pos"),
        hash60(F.col("shingle")).alias("h"),
    )
    dup = (
        pos.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") > 1)
        .select("h")
    )
    occ = pos.join(dup, "h", "left_semi")
    return merge_spans(occ, width, id_col)


def merge_spans(occ: DataFrame, width: int, id_col: str) -> DataFrame:
    """The gaps-and-islands interval merge shared by `duplicated_spans`
    (corpus-internal) and the serving-side contamination probe
    (retrieval.RetrievalService.spans): occ = (id, pos) duplicated
    shingle starts -> maximal spans per id. The window partitions by id
    — never a global sort."""
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = occ.select(
        F.col(id_col),
        "pos",
        F.sum(
            F.when(
                F.col("pos") - F.lag("pos").over(w) <= width, F.lit(0)
            ).otherwise(F.lit(1))
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(width - 1)).cast("long").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_hits"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_tokens"),
            "n_hits",
        )
    )


def sql_duplicated_spans(width: int = SPAN_WIDTH) -> str:
    """DuckDB twin of `duplicated_spans` (same hash, same interval
    merge)."""
    parts = ", ".join(f"t[i+{j}]" for j in range(width))
    return f"""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
              FROM documents),
pos AS (
  SELECT doc_id, i AS pos,
         {hash60_sql(f"concat_ws(' ', {parts})")} AS h
  FROM toks, UNNEST(range(1, len(t) - {width - 2})) AS u(i)
  WHERE len(t) >= {width}),
dup AS (SELECT h FROM pos GROUP BY h HAVING count(*) > 1),
occ AS (SELECT doc_id, pos FROM pos WHERE h IN (SELECT h FROM dup)),
marked AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                        ORDER BY pos) <= {width}
              THEN 0 ELSE 1 END AS is_new
  FROM occ),
islands AS (
  SELECT doc_id, pos,
         sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM marked)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {width - 1} AS BIGINT) AS span_end,
       CAST(max(pos) + {width - 1} - min(pos) + 1 AS BIGINT) AS span_tokens,
       CAST(count(*) AS BIGINT) AS n_hits
FROM islands GROUP BY doc_id, island
"""


def cut_duplicated_spans(
    docs: DataFrame,
    width: int = SPAN_WIDTH,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply `duplicated_spans` as a TRANSFORM: rebuild each document
    with its duplicated token ranges removed (the ExactSubstr remedy —
    cut the span, keep the document; all occurrences are cut, per the
    paper — `paragraph_dedup` is the keep-first-owner alternative at
    paragraph granularity): (doc_id, clean_text, n_tokens, n_cut).

    Scale shape: span detection is `duplicated_spans`; the cut itself is
    MAP-SIDE — per-document span lists (tiny: spans, not positions) join
    back to the text, and a higher-order filter drops covered token
    positions in one pass per row, no corpus-size explode/regroup.
    Original-case tokens rebuild the text (positions align with the
    lowercased shingle tokenization because splitting ignores case), so
    an un-cut document round-trips byte-identically."""
    spans = duplicated_spans(docs, width, id_col, text_col)
    sp = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("spans")
    )
    base = docs.select(id_col, text_col).join(sp, id_col, "left")
    toks = F.split(F.col(text_col), " ")
    spans_c = F.coalesce(
        F.col("spans"),
        F.array().cast("array<struct<s:bigint,e:bigint>>"),
    )
    indexed = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.size(toks)),
        lambda t, p: F.struct(t.alias("t"), p.alias("p")),
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            spans_c,
            lambda sp_: (s["p"] >= sp_["s"]) & (s["p"] <= sp_["e"]),
        ),
    )
    return base.select(
        F.col(id_col),
        F.array_join(
            F.transform(kept, lambda s: s["t"]), " "
        ).alias("clean_text"),
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_cut"),
    )


def sql_cut_duplicated_spans(width: int = SPAN_WIDTH) -> str:
    """DuckDB twin of `cut_duplicated_spans` — relational spelling: the
    span relation anti-screens token positions, string_agg rebuilds."""
    spans_sql = sql_duplicated_spans(width).strip()
    return f"""
WITH spans AS MATERIALIZED ({spans_sql}),
tk AS (SELECT doc_id, i AS pos, t[i] AS tok
       FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
            UNNEST(range(1, len(t) + 1)) AS u(i)),
kept AS (
  SELECT k.doc_id, k.pos, k.tok FROM tk k
  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = k.doc_id
                      AND k.pos BETWEEN s.span_start AND s.span_end)),
agg AS (
  SELECT doc_id,
         coalesce(string_agg(tok, ' ' ORDER BY pos), '') AS clean_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
        FROM tk GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       t.n_tokens,
       t.n_tokens - coalesce(a.n_kept, 0) AS n_cut
FROM tot t LEFT JOIN agg a USING (doc_id)
"""


# --- edit-distance similarity join (Ed-Join) ----------------------------------
#
# The string-attribute member of the dedup family: all value pairs within
# Levenshtein distance k — the entity-resolution primitive (misspelled
# names, OCR noise, near-identical titles). Candidate generation follows
# Ed-Join (Xiao, Wang, Lin 2008): character q-grams ordered by global
# document frequency, and a pair within k edits MUST share a gram inside
# each side's (q*k + 1)-prefix, because one edit destroys at most q
# distinct grams, so |set(s) ∩ set(t)| >= |set(s)| - q*k. Strings whose
# gram set is <= q*k (the bound is vacuous) are WILDCARDS and pair with
# everything inside the +-k length band — a set bounded by the short-string
# vocabulary, broadcast at scale.
# Reference parity note: fluxdb has no string-similarity operators; this is
# part of the beyond-reference training-data layer (SURVEY §2.8).

EDITDIST_Q = 2


def char_qgrams(s: Column, q: int = EDITDIST_Q) -> Column:
    """Distinct character q-grams of a string (JVM-side; [] if len < q).
    Same one-bind trick as `word_shingles` — bind the string once."""

    def _grams(v: Column) -> Column:
        idx = F.sequence(F.lit(1), F.length(v) - (q - 1), F.lit(1))
        body = F.array_distinct(F.transform(idx, lambda i: F.substring(v, i, q)))
        return F.when(F.length(v) >= q, body).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(F.transform(F.array(s), _grams), 1)


def editdist_pairs(
    df: DataFrame, col: str, k: int = 2, q: int = EDITDIST_Q
) -> DataFrame:
    """All DISTINCT-value pairs of `col` within Levenshtein distance k,
    with per-value row counts.

    Scale design: the pair search runs on the DISTINCT value relation —
    vocabulary-bounded, not corpus-bounded (TPC-H p_name: 64 distinct at
    every SF; a 100 TB attribute column still collapses to its vocabulary
    under one map-side-combined groupBy). On that relation, Ed-Join prefix
    filtering keeps the candidate join at prefix x prefix (rare-first, so
    hot grams never meet), the +-k length band prunes the rest, and the
    exact JVM `levenshtein` verifies — no false negatives: the count
    bound covers every string with > q*k distinct grams, and the shorter
    ones go through the wildcard band join.

    Output: (val_a, val_b, dist, cnt_a, cnt_b) with val_a < val_b.
    All-integer + strings, so the result hashes exactly vs the oracle.
    """
    prefix_len = q * k + 1
    vals = (
        df.groupBy(F.col(col).alias("val"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "val",
            "cnt",
            F.length("val").alias("len"),
            char_qgrams(F.col("val"), q).alias("grams"),
        )
        .localCheckpoint()  # cut the scan before the multi-branch fan-out
    )
    g = vals.select("val", F.explode("grams").alias("gram"))
    # df as a count window over `gram`: one evaluation of the explode,
    # no aggregate + join-back (the jaccard_pairs rewrite)
    w_df = Window.partitionBy("gram")
    w = Window.partitionBy("val").orderBy("df", "gram")
    prefix = (
        g.withColumn("df", F.count(F.lit(1)).over(w_df))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= prefix_len)
        .select("val", "gram")
    )
    meta_a = vals.select(
        F.col("val").alias("val_a"),
        F.col("len").alias("len_a"),
        F.col("cnt").alias("cnt_a"),
    )
    meta_b = vals.select(
        F.col("val").alias("val_b"),
        F.col("len").alias("len_b"),
        F.col("cnt").alias("cnt_b"),
    )
    cand_prefix = (
        prefix.alias("a")
        .join(prefix.alias("b"), on="gram")
        .filter(F.col("a.val") < F.col("b.val"))
        .select(
            F.col("a.val").alias("val_a"), F.col("b.val").alias("val_b")
        )
    )
    # wildcards: gram set too small for the count bound to bite — they
    # must meet EVERY value in the +-k length band (broadcast: bounded by
    # the short-string vocabulary)
    wc = vals.filter(F.size("grams") <= q * k).select(
        F.col("val").alias("wval"), F.col("len").alias("wlen")
    )
    allv = vals.select(F.col("val").alias("oval"), F.col("len").alias("olen"))
    cand_wc = (
        F.broadcast(wc)
        .join(
            allv,
            (F.abs(F.col("wlen") - F.col("olen")) <= k)
            & (F.col("wval") != F.col("oval")),
        )
        .select(
            F.least("wval", "oval").alias("val_a"),
            F.greatest("wval", "oval").alias("val_b"),
        )
    )
    cand = cand_prefix.unionByName(cand_wc).distinct()
    return (
        cand.join(meta_a, on="val_a")
        .join(meta_b, on="val_b")
        .filter(F.abs(F.col("len_a") - F.col("len_b")) <= k)
        .withColumn("dist", F.levenshtein("val_a", "val_b"))
        .filter(F.col("dist") <= k)
        .select("val_a", "val_b", "dist", "cnt_a", "cnt_b")
    )


def sql_editdist(col: str, table: str, k: int = 2) -> str:
    """DuckDB twin of `editdist_pairs`: the naive distinct-value band
    self-join with the same exact levenshtein verification."""
    return f"""
WITH vals AS (
  SELECT {col} AS val, CAST(count(*) AS BIGINT) AS cnt,
         length({col}) AS len
  FROM {table} GROUP BY 1)
SELECT a.val AS val_a, b.val AS val_b,
       CAST(levenshtein(a.val, b.val) AS INT) AS dist,
       a.cnt AS cnt_a, b.cnt AS cnt_b
FROM vals a JOIN vals b
  ON a.val < b.val AND abs(a.len - b.len) <= {k}
WHERE levenshtein(a.val, b.val) <= {k}
"""


# --- duplication-hub centrality (PageRank over the near-dup graph) -----------
#
# Document-level dedup yields PAIRS; the question a curation pipeline asks
# next is "which documents are the HUBS of duplication" — the templates,
# license blocks and boilerplate carriers that near-duplicate into many
# others. PageRank over the undirected near-dup graph answers it: a doc's
# score grows with how central it is to the duplication structure, not
# just its raw degree. All arithmetic is SCALED-INTEGER (scores sum to
# ~10^12), every division an integral `div` spelled identically in the
# DuckDB twin, so three unrolled power iterations are bit-deterministic —
# the same fixed-point discipline as the k-means/PQ codebook chains.

PR_SCALE = 10**12
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85


def duplication_pagerank(
    pairs: DataFrame, iters: int = 3, top_k: int = 20
) -> DataFrame:
    """Top-k duplication hubs by integer PageRank over the (d1, d2) pair
    relation.

    Scale design: the graph relation is |near-dup pairs| — already the
    output of the prefix-filtered exact join (or banded LSH at corpus
    scale), orders of magnitude below the corpus. Each iteration is one
    equi-join (edges x scores, shuffled on the node key) plus one
    combine-friendly groupBy — no driver-side adjacency, no collect; the
    node-count denominator rides a 1-row broadcast. Undirected edges mean
    every node receives mass, so there is no dangling-mass correction.
    The final top-k is sort+limit (TakeOrdered: per-partition top-k,
    k*partitions merge), with rank assigned on the k-row result.

    Returns (doc_id, degree, pr_scaled, rank), pr_scaled out of ~10^12.
    """
    edges = (
        pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
        .unionByName(
            pairs.select(F.col("d2").alias("src"), F.col("d1").alias("dst"))
        )
        .localCheckpoint()  # each iteration re-joins this relation
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nt = deg.agg(F.count(F.lit(1)).alias("n"))  # 1-row broadcast total
    pr = (
        deg.crossJoin(F.broadcast(nt))
        .select(
            F.col("src").alias("node"),
            F.expr(f"{PR_SCALE} div n").alias("pr"),
        )
    )
    for _ in range(iters):
        contrib = (
            edges.join(pr.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select("dst", F.expr("pr div deg").alias("share"))
        )
        pr = (
            contrib.groupBy("dst")
            .agg(F.sum("share").alias("insum"))
            .crossJoin(F.broadcast(nt))
            .select(
                F.col("dst").alias("node"),
                (
                    F.expr(f"(({PR_SCALE} div n) * {PR_DAMP_DEN - PR_DAMP_NUM}) div {PR_DAMP_DEN}")
                    + F.expr(f"(insum * {PR_DAMP_NUM}) div {PR_DAMP_DEN}")
                ).alias("pr"),
            )
        )
    scored = pr.join(
        deg.select(F.col("src").alias("node"), "deg"), "node"
    ).select(
        F.col("node").alias("doc_id"),
        F.col("deg").alias("degree"),
        F.col("pr").alias("pr_scaled"),
    )
    top = scored.orderBy(F.desc("pr_scaled"), F.asc("doc_id")).limit(top_k)
    w = Window.orderBy(F.desc("pr_scaled"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def sql_duplication_pagerank(
    pairs_sql: str, iters: int = 3, top_k: int = 20
) -> str:
    """DuckDB twin: the same unrolled integer power iterations over a
    MATERIALIZED pair relation. Every sum is cast back to BIGINT (DuckDB
    sum(BIGINT) -> HUGEINT -> pandas float64, the round-9 dtype lesson)."""
    s, dn, dd_ = PR_SCALE, PR_DAMP_NUM, PR_DAMP_DEN
    base = f"(({s} // n) * {dd_ - dn}) // {dd_}"
    ctes = [
        f"pairs AS MATERIALIZED ({pairs_sql})",
        "edges AS (SELECT d1 AS src, d2 AS dst FROM pairs"
        " UNION ALL SELECT d2, d1 FROM pairs)",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg"
        " FROM edges GROUP BY src)",
        "nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg)",
        f"pr0 AS (SELECT src AS node, {s} // n AS pr FROM deg, nt)",
    ]
    for i in range(iters):
        ctes.append(
            f"pr{i + 1} AS ("
            f"SELECT e.dst AS node, "
            f"{base} + (CAST(sum(p.pr // d.deg) AS BIGINT) * {dn}) // {dd_} AS pr "
            f"FROM edges e JOIN pr{i} p ON e.src = p.node "
            f"JOIN deg d ON e.src = d.src, nt "
            f"GROUP BY e.dst, n)"
        )
    ctes.append(
        f"top AS (SELECT p.node AS doc_id, d.deg AS degree, p.pr AS pr_scaled "
        f"FROM pr{iters} p JOIN deg d ON p.node = d.src "
        f"ORDER BY p.pr DESC, p.node ASC LIMIT {top_k})"
    )
    return (
        "WITH " + ",\n".join(ctes) + ",\nranked AS (SELECT *, "
        "CAST(row_number() OVER (ORDER BY pr_scaled DESC, doc_id ASC) "
        "AS BIGINT) AS rank FROM top)\n"
        "SELECT doc_id, degree, pr_scaled, rank FROM ranked"
    )


# --- entity resolution (editdist pairs -> clusters -> canonical form) --------


def resolve_entities(
    df: DataFrame, col: str, k: int = 2, q: int = EDITDIST_Q
) -> DataFrame:
    """End-to-end entity resolution on a string attribute: every distinct
    value mapped to its cluster's CANONICAL form — the variant with the
    most rows (survivorship by frequency, ties to the lexicographically
    smallest), clusters being the connected components of the
    Levenshtein-<=k pair graph from `editdist_pairs`. The full
    data-cleaning loop (match -> cluster -> survive) as one relation a
    MERGE/UPDATE can consume.

    Scale: everything after the distinct groupBy runs on the
    vocabulary-bounded value relation — pair search (Ed-Join prefix
    filter), min-label propagation (O(diameter) iterations), and the
    per-cluster rank window all see |distinct values| rows, never the
    corpus.

    Returns (name, n_rows, canonical, cluster_size) for EVERY distinct
    value (singletons map to themselves).
    """
    vals = df.groupBy(F.col(col).alias("name")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    pairs = editdist_pairs(df, col, k, q).select(
        F.col("val_a").alias("d1"), F.col("val_b").alias("d2")
    )
    comp = connected_components(pairs).select(
        F.col("doc_id").alias("name"), "component"
    )
    lab = vals.join(comp, "name", "left").select(
        "name",
        "n_rows",
        F.coalesce(F.col("component"), F.col("name")).alias("cluster"),
    )
    w_rank = Window.partitionBy("cluster").orderBy(
        F.desc("n_rows"), F.asc("name")
    )
    w_all = Window.partitionBy("cluster")
    ranked = lab.select(
        "name",
        "n_rows",
        "cluster",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("cluster_size"),
    )
    canon = ranked.filter(F.col("rn") == 1).select(
        "cluster", F.col("name").alias("canonical")
    )
    return ranked.join(canon, "cluster").select(
        "name", "n_rows", "canonical", "cluster_size"
    )


def sql_resolve_entities(col: str, table: str, k: int = 2) -> str:
    """DuckDB twin of `resolve_entities`: recursive-CTE transitive
    closure over the same naive editdist pair relation."""
    return f"""
WITH pairs0 AS MATERIALIZED (
  SELECT val_a, val_b FROM ({sql_editdist(col, table, k)})),
edges AS (
  SELECT val_a AS a, val_b AS b FROM pairs0
  UNION SELECT val_b, val_a FROM pairs0),
reach AS (
  WITH RECURSIVE r(node, reach) AS (
    SELECT a, a FROM edges
    UNION
    SELECT r.node, e.b FROM r JOIN edges e ON e.a = r.reach)
  SELECT node, min(reach) AS component FROM r GROUP BY node),
vals AS (
  SELECT {col} AS name, CAST(count(*) AS BIGINT) AS n_rows
  FROM {table} GROUP BY 1),
lab AS (
  SELECT v.name, v.n_rows, coalesce(rc.component, v.name) AS cluster
  FROM vals v LEFT JOIN reach rc ON rc.node = v.name),
ranked AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY cluster ORDER BY n_rows DESC, name) AS rn,
         CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT)
           AS cluster_size
  FROM lab),
canon AS (SELECT cluster, name AS canonical FROM ranked WHERE rn = 1)
SELECT r.name, r.n_rows, c.canonical, r.cluster_size
FROM ranked r JOIN canon c USING (cluster)
"""


# --- novelty scoring & quality-aware survivorship ----------------------------


def doc_novelty(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document NOVELTY share: the fraction of a doc's distinct
    shingles whose corpus-wide FIRST occurrence (min doc id — the
    deterministic "who wrote it first" order) is this document.  The
    memorization-risk / originality signal a training-data pipeline
    reads next to the dedup verdicts: a doc can evade every near-dup
    rule while contributing almost nothing the corpus didn't already
    have (novelty ~ 0), or be pure fresh text (novelty ~ 1e6 ppm).

    Scale shape: one shingle-hash explode (the dedup_ngram first
    stage), one combine-friendly min groupBy over the |distinct
    shingles| relation, one equi-join back on the same shingle key
    (Catalyst reuses the exchange), one per-doc rollup.  No pair space
    anywhere — cost tracks the shingle relation, not near-dup density.
    Returns (doc_id, n_shingles, n_novel, novelty_ppm)."""
    sh = exploded_shingle_hashes(docs, id_col).localCheckpoint(eager=False)
    owner = sh.groupBy("shingle").agg(F.min(id_col).alias("owner"))
    return (
        sh.join(owner, "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("owner") == F.col(id_col), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn(
            "novelty_ppm", F.expr("(n_novel * 1000000) div n_shingles")
        )
    )


def sql_doc_novelty() -> str:
    """DuckDB twin of `doc_novelty` (string shingles instead of the
    64-bit hash — identical min-owner semantics; a 64-bit collision is
    the same ~1e-8 caveat jaccard_pairs documents)."""
    return f"""
WITH {sql_shingles_ctes()},
owner AS (SELECT shingle, min(doc_id) AS owner FROM sh GROUP BY 1)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       (CAST(sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS BIGINT)
        * 1000000) // CAST(count(*) AS BIGINT) AS novelty_ppm
FROM sh JOIN owner USING (shingle)
GROUP BY doc_id
"""


def dedup_survivors_quality(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> DataFrame:
    """Quality-aware survivor selection: cluster the near-dup pairs and
    keep the HIGHEST-scoring member of each cluster (ties -> smallest
    id), passing every unpaired doc through — the realistic pipeline
    policy vs `dedup_survivors`' min-id canon: when five mirrors carry
    the same article, you keep the most complete copy, not the one with
    the smallest key.  Returns (doc_id, component, keep).

    Scale shape: connected components is the shared O(diameter)
    min-label loop; the winner rank windows only the CLUSTERED relation
    (bounded by the near-dup pair space, never the corpus), and the
    unpaired pass-through is one anti-join."""
    comp = connected_components(pairs)
    scored = comp.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(score_col)),
        "doc_id",
    )
    w = Window.partitionBy("component").orderBy(
        F.desc(score_col), F.asc("doc_id")
    )
    clustered = scored.select(
        "doc_id",
        "component",
        (F.row_number().over(w) == 1).alias("keep"),
    )
    unpaired = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, on="doc_id", how="left_anti")
        .select(
            "doc_id",
            F.col("doc_id").alias("component"),
            F.lit(True).alias("keep"),
        )
    )
    return clustered.unionByName(unpaired)


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken '03 — the MOSS
# algorithm).  Round 14.
# ---------------------------------------------------------------------------

WINNOW_K = 8  # k-char grams
WINNOW_W = 4  # window width over the gram-hash sequence


def winnow_fingerprints(
    text: Column, k: int = WINNOW_K, w: int = WINNOW_W
) -> Column:
    """Distinct winnowed fingerprints of a document: hash every k-char
    gram of the lowercased text, slide a w-window over the hash
    sequence, keep each window's MINIMUM, dedupe.  The winnowing
    guarantee: any substring shared between two documents of length
    >= w + k - 1 chars produces at least one shared fingerprint, while
    the expected selected density is only 2/(w+1) of the grams — the
    sublinear fingerprint family plagiarism/clone detection uses.

    All JVM-side array expressions — no shuffle, no Python: the text and
    the gram-hash array are each bound ONCE per row as lambda variables
    (the `word_shingles` singleton-transform idiom; inlining them would
    re-evaluate per element)."""

    def _minima(gg: Column) -> Column:
        widx = F.sequence(F.lit(1), F.size(gg) - (w - 1), F.lit(1))
        body = F.array_distinct(
            F.transform(widx, lambda j: F.array_min(F.slice(gg, j, w)))
        )
        return F.when(F.size(gg) >= w, body).otherwise(
            F.array().cast("array<bigint>")
        )

    def _grams(tt: Column) -> Column:
        gidx = F.sequence(F.lit(1), F.length(tt) - (k - 1), F.lit(1))
        g = F.transform(gidx, lambda i: hash60(tt.substr(i, F.lit(k))))
        guarded = F.when(F.length(tt) >= k, g).otherwise(
            F.array().cast("array<bigint>")
        )
        return F.element_at(F.transform(F.array(guarded), _minima), 1)

    return F.element_at(F.transform(F.array(F.lower(text)), _grams), 1)


def sql_winnow_ctes(
    k: int = WINNOW_K, w: int = WINNOW_W, source: str = "documents"
) -> str:
    """DuckDB twin of `winnow_fingerprints`, as CTEs producing
    `fp(doc_id, fp)` — one row per distinct winnowed fingerprint."""
    gh = hash60_sql(f"substr(t, i, {k})")
    return f"""
    wt AS (SELECT doc_id, lower(text) AS t FROM {source}),
    wg AS (SELECT doc_id,
                  list_transform(range(1, len(t) - {k - 2}), i -> {gh}) AS g
           FROM wt WHERE len(t) >= {k}),
    wf AS (SELECT doc_id,
                  list_distinct(list_transform(range(1, len(g) - {w - 2}),
                                j -> list_min(g[j:j+{w - 1}]))) AS f
           FROM wg WHERE len(g) >= {w}),
    fp AS (SELECT doc_id, unnest(f) AS fp FROM wf)"""
