"""Distributed BPE tokenizer training and encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
tokenizer-construction step of a training-data pipeline, run as a sequence
of Spark jobs.

Architecture (Spark-first, not a port of any single-node trainer):

- **Pre-tokenize once**: one corpus-wide `groupBy(word)` builds the distinct
  vocabulary with frequencies. Every later iteration works on this
  |vocab|-row relation — by Zipf's law orders of magnitude smaller than the
  corpus — so 100 TB of text funnels through ONE shuffle and the merge loop
  never rescans raw documents.
- **Words as delimited symbol strings**: a word's current segmentation is a
  single string with every symbol wrapped in \\x1f separators
  ("l" -> "\\x1fl\\x1f"). Applying merge (a, b) is then a built-in
  `replace` of "\\x1fa\\x1f\\x1fb\\x1f" with "\\x1fab\\x1f" — leftmost
  non-overlapping replace-all, exactly BPE's greedy left-to-right merge
  order, in whole-stage-codegen JVM string ops (no Python, no UDF).
  Separators make matches unambiguous (symbols never contain \\x1f), and
  the same literal semantics exist in every engine, so the whole trainer is
  hash-checkable against a DuckDB twin built from the same replace calls.
- **Pair statistics**: adjacent-pair counts (overlapping, like the
  published reference implementation's get_stats) come from one
  explode + freq-weighted groupBy per iteration over the vocab relation;
  the winning pair (count desc, then lexicographic — deterministic) is the
  only driver state: n_merges rows total.
- **Encoding is map-only**: the learned merge list folds into a chain of
  n_merges `replace` expressions applied per word — no join against a
  vocabulary table, no shuffle until the optional per-document
  re-aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SEP = "\x1f"  # unit separator: never appears in [a-z0-9]+ tokens
EOW = "</w>"  # end-of-word symbol (Sennrich's '</w>')
WORD_RE = "^[a-z0-9]+$"  # portable pre-token filter (identical in RE2/Java)


def _wrapped(word):
    """word -> the initial segmentation string: every character wrapped in
    SEP pairs, then the end-of-word symbol."""
    return F.concat(
        F.regexp_replace(word, "(.)", f"{SEP}$1{SEP}"),
        F.lit(f"{SEP}{EOW}{SEP}"),
    )


def _symbols(w):
    """Current symbol array of a segmentation string: strip the outer
    separators, split on the inner boundary."""
    inner = F.substring(w, 2, F.length(w) - 2)
    return F.split(inner, SEP + SEP)


def vocab_with_freq(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) for the corpus — the single corpus-wide shuffle of the
    whole trainer."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
        )
        .filter(F.col("word").rlike(WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Freq-weighted adjacent-pair counts over the current segmentations
    (overlapping occurrences counted, as in the reference get_stats)."""
    syms = _symbols(F.col("w"))
    n = F.size(syms)
    pairs = F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda l, r: F.struct(l.alias("lhs"), r.alias("rhs")),
    )
    return (
        words.select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )


def train_merges(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Learn the top `n_merges` BPE merges; returns
    [(merge_rank, lhs, rhs, pair_count)]. Driver state is exactly the
    merge list. Each iteration is one Spark job over the |vocab|-row
    relation: explode pairs -> freq-weighted groupBy -> 1-row argmax
    (count desc, lhs asc, rhs asc — fully deterministic)."""
    words = (
        vocab_with_freq(docs, text_col)
        .select(_wrapped(F.col("word")).alias("w"), "freq")
        .localCheckpoint()  # pin the corpus shuffle; the loop replays replaces only
    )
    merges: list[tuple[int, str, str, int]] = []
    for i in range(n_merges):
        win = (
            _pair_counts(words)
            .orderBy(
                F.desc("pair_count"), F.asc("lhs"), F.asc("rhs")
            )
            .first()
        )
        if win is None:
            break
        merges.append((i, win.lhs, win.rhs, win.pair_count))
        words = words.withColumn(
            "w",
            F.replace(
                F.col("w"),
                F.lit(f"{SEP}{win.lhs}{SEP}{SEP}{win.rhs}{SEP}"),
                F.lit(f"{SEP}{win.lhs}{win.rhs}{SEP}"),
            ),
        )
    return merges


def merges_df(
    spark: SparkSession, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    return spark.createDataFrame(
        merges, "merge_rank long, lhs string, rhs string, pair_count long"
    )


def apply_merges(word, merges: list[tuple[int, str, str, int]]):
    """The encoder: fold the learned merge list into a chain of replace
    expressions over the wrapped segmentation — map-only, no vocabulary
    join, constant plan size (n_merges nested builtin calls)."""
    w = _wrapped(word)
    for _i, lhs, rhs, _c in merges:
        w = F.replace(
            w,
            F.lit(f"{SEP}{lhs}{SEP}{SEP}{rhs}{SEP}"),
            F.lit(f"{SEP}{lhs}{rhs}{SEP}"),
        )
    return _symbols(w)


def encode_documents(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize documents with a learned merge list: (doc_id, n_tokens,
    tokens) where tokens is the space-joined subword stream in document
    order. Encoding itself is map-only; the per-document rebuild is one
    groupBy carrying (pos, encoded word) pairs."""
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias(
            "pos", "word"
        ),
    ).filter(F.col("word").rlike(WORD_RE))
    enc = toks.select(
        F.col(id_col),
        F.col("pos"),
        apply_merges(F.col("word"), merges).alias("syms"),
    ).select(
        F.col(id_col),
        F.col("pos"),
        F.size("syms").cast("long").alias("n"),
        F.array_join("syms", " ").alias("word_toks"),
    )
    gathered = enc.groupBy(id_col).agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "word_toks"))
                ),
                lambda s: s["word_toks"],
            ),
            " ",
        ).alias("tokens"),
    )
    return gathered


# --- DuckDB twins ------------------------------------------------------------


def _sql_wrapped(expr: str) -> str:
    return (
        f"regexp_replace({expr}, '(.)', '{SEP}\\1{SEP}', 'g')"
        f" || '{SEP}{EOW}{SEP}'"
    )


def _sql_syms(expr: str = "w") -> str:
    return (
        f"string_split(substring({expr}, 2, length({expr}) - 2),"
        f" '{SEP}{SEP}')"
    )


def _sql_train_ctes(n_merges: int) -> str:
    """CTE chain w0..w{n}, p0..p{n-1}, m0..m{n-1}: the unrolled trainer
    (same pattern as the kmeans oracle — each iteration's winner is a
    1-row CTE consumed by scalar subqueries in the next replace)."""
    parts = [
        f"""w0 AS MATERIALIZED (
  SELECT {_sql_wrapped('word')} AS w, freq FROM (
    SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
      SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
    WHERE regexp_full_match(word, '[a-z0-9]+') GROUP BY word))"""
    ]
    for i in range(n_merges):
        parts.append(
            f"""p{i} AS MATERIALIZED (
  SELECT lhs, rhs, CAST(sum(freq) AS BIGINT) AS pair_count FROM (
    SELECT freq, syms[ix] AS lhs, syms[ix + 1] AS rhs FROM (
      SELECT freq, {_sql_syms()} AS syms FROM w{i}),
      unnest(range(1, len(syms))) AS u(ix))
  GROUP BY 1, 2)"""
        )
        parts.append(
            f"""m{i} AS MATERIALIZED (
  SELECT lhs, rhs, pair_count FROM p{i}
  ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1)"""
        )
        parts.append(
            f"""w{i + 1} AS MATERIALIZED (
  SELECT replace(w,
                 '{SEP}' || (SELECT lhs FROM m{i}) || '{SEP}{SEP}'
                         || (SELECT rhs FROM m{i}) || '{SEP}',
                 '{SEP}' || (SELECT lhs FROM m{i})
                         || (SELECT rhs FROM m{i}) || '{SEP}') AS w,
         freq
  FROM w{i})"""
        )
    return ",\n".join(parts)


def sql_train_merges(n_merges: int = 10) -> str:
    """DuckDB twin of `train_merges` over the documents table."""
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_rank, lhs, rhs, pair_count FROM m{i}"
        for i in range(n_merges)
    )
    return f"WITH {_sql_train_ctes(n_merges)}\n{union}"


def sql_encode_documents(
    n_merges: int = 10, doc_filter: str = "doc_id % 20 = 0"
) -> str:
    """DuckDB twin of `encode_documents` with the merges derived by the
    same unrolled trainer chain."""
    repl = _sql_wrapped("word")
    for i in range(n_merges):
        repl = (
            f"replace({repl},\n"
            f"  '{SEP}' || (SELECT lhs FROM m{i}) || '{SEP}{SEP}'"
            f" || (SELECT rhs FROM m{i}) || '{SEP}',\n"
            f"  '{SEP}' || (SELECT lhs FROM m{i})"
            f" || (SELECT rhs FROM m{i}) || '{SEP}')"
        )
    return f"""
WITH {_sql_train_ctes(n_merges)},
dwords AS (
  SELECT doc_id, ix AS pos, t[ix] AS word FROM (
    SELECT doc_id, string_split(lower(text), ' ') AS t
    FROM documents WHERE {doc_filter}),
    unnest(range(1, len(t) + 1)) AS u(ix)
  WHERE regexp_full_match(t[ix], '[a-z0-9]+')),
enc AS (
  SELECT doc_id, pos, {_sql_syms("w2")} AS syms
  FROM (SELECT doc_id, pos, {repl} AS w2 FROM dwords)),
pertok AS (
  SELECT doc_id, pos, CAST(len(syms) AS BIGINT) AS n,
         array_to_string(syms, ' ') AS word_toks
  FROM enc)
SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
       string_agg(word_toks, ' ' ORDER BY pos) AS tokens
FROM pertok GROUP BY doc_id
"""


def fertility_by_language(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer FERTILITY (subword tokens per word) broken out by
    language — the standard tokenizer-evaluation metric: a tokenizer
    trained on skewed data over-fragments under-represented languages,
    and this relation is how a pipeline detects that before training.
    Map-only per doc (lang-ID heuristic + the encode replace chain),
    then one tiny groupBy(lang). fertility = floor(n_tokens * 1e4 /
    n_words) / 1e4 — exact integer division, engine-portable."""
    from fluxdb_spark.functions.text import lang_id

    toks = docs.select(
        lang_id(F.lower(F.col(text_col))).alias("lang"),
        F.filter(
            F.split(F.lower(F.col(text_col)), " "),
            lambda w: w.rlike(WORD_RE),
        ).alias("words"),
    )
    enc = toks.select(
        "lang",
        F.size("words").cast("long").alias("n_words"),
        F.size(
            F.flatten(
                F.transform("words", lambda w: apply_merges(w, merges))
            )
        ).cast("long").alias("n_tokens"),
    )
    return (
        enc.groupBy("lang")
        .agg(
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .select(
            "lang",
            "n_words",
            "n_tokens",
            (
                F.floor(
                    F.col("n_tokens") * F.lit(10_000) / F.col("n_words")
                ) / 10_000.0
            ).alias("fertility"),
        )
    )


def sql_fertility_by_language(n_merges: int = 10) -> str:
    """DuckDB twin: the same trained merge chain applied per word, the
    same lang-ID heuristic, the same exact fertility arithmetic."""
    from fluxdb_spark.functions.text import sql_lang_id

    repl = _sql_wrapped("word")
    for i in range(n_merges):
        repl = (
            f"replace({repl},"
            f" '{SEP}' || (SELECT lhs FROM m{i}) || '{SEP}{SEP}'"
            f" || (SELECT rhs FROM m{i}) || '{SEP}',"
            f" '{SEP}' || (SELECT lhs FROM m{i})"
            f" || (SELECT rhs FROM m{i}) || '{SEP}')"
        )
    return f"""
WITH {_sql_train_ctes(n_merges)},
dwords AS (
  SELECT doc_id, lang, t[ix] AS word FROM (
    SELECT doc_id, {sql_lang_id("lower(text)")} AS lang,
           string_split(lower(text), ' ') AS t
    FROM documents),
    unnest(range(1, len(t) + 1)) AS u(ix)
  WHERE regexp_full_match(t[ix], '[a-z0-9]+')),
enc AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(len({_sql_syms("w2")})) AS BIGINT) AS n_tokens
  FROM (SELECT lang, {repl} AS w2 FROM dwords)
  GROUP BY lang)
SELECT lang, n_words, n_tokens,
       floor(n_tokens * 10000 / n_words) / 10000.0 AS fertility
FROM enc
"""
