"""Bloom-filter semi-join: the user-space runtime filter.

The 100 TB semi-join dilemma: the key set of the filtering side is too
large to broadcast exactly (a literal IN-list or a broadcast hash join
both need every key in memory, exact), but shuffling the full fact side
into a SortMergeJoin moves the whole table for a join that keeps only a
fraction of it. The classic fix — what Spark's own AQE runtime bloom
filter (`spark.sql.optimizer.runtime.bloomFilter.enabled`) and every
distributed warehouse's "sideways information passing" do — is to ship a
BLOOM of the keys to the scan: a few-KB bitmap prunes most non-matching
rows map-side, BEFORE the shuffle, and an exact semi-join over the
survivors removes the bloom's false positives. The result is exactly the
semi-join (the bloom has no false negatives), but the shuffle carries
only `match_rate + fp_rate` of the fact table.

This module builds the bloom AS A DATAFRAME AGGREGATE — `h` positions per
key via seeded xxhash64, folded into `m/64` longs with `bit_or` (partial
aggregation makes every executor's contribution a partial bloom: the
bitmap OR is the sketch merge) — then collects the bounded bitmap
(`m/64` longs, ~8 KB at m=2^16; size m ≈ 10 bits/key at scale) and plants
it in the fact-side filter as a plan literal, so the probe is pure JVM
expression work inside WholeStageCodegen: two element_at lookups and a
bitwise AND per hash.

Determinism: false positives never reach the output (exact verify), so
the result is independent of m/h — only the pruning rate varies.

Reference parity note: fluxdb (store.go) attaches parquet bloom filters
to its key column for point reads; this operator is the join-time
generalization of the same idea (SURVEY §2.6 joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS = 1 << 16  # m: bitmap size (bits); 1024 longs, ~8 KB
BLOOM_HASHES = 3  # h: seeded hash functions per key

# 2^b as a signed 64-bit long for b = 0..63 (bit 63 wraps negative)
_POW2 = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def _positions(key: Column, m: int, h: int) -> list[Column]:
    """The h bloom bit-positions of a key: pmod(xxhash64(key, seed), m)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m)) for seed in range(h)
    ]


def build_bloom(
    keys: DataFrame,
    key_col: str,
    m: int = BLOOM_BITS,
    h: int = BLOOM_HASHES,
) -> list[int]:
    """Fold the key set into an m-bit bloom: one `bit_or` groupBy over
    (word, mask) pairs — executors emit partial blooms (map-side combine),
    the merge is the bitwise OR, and only the <= m/64 non-zero words cross
    to the driver. Returns the dense word array (length m/64)."""
    assert m % 64 == 0
    pow2 = F.lit(_POW2).cast("array<long>")
    pos = F.explode(F.array(*_positions(F.col(key_col), m, h))).alias("pos")
    words = (
        keys.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).alias("word"),
            F.element_at(pow2, (F.col("pos").bitwiseAND(F.lit(63)) + 1)
                         .cast("int")).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
        .collect()
    )
    dense = [0] * (m // 64)
    for r in words:
        dense[r["word"]] = r["mask"]
    return dense


def bloom_might_contain(
    key: Column, bloom: list[int], h: int = BLOOM_HASHES
) -> Column:
    """Pure-expression bloom probe against a plan-literal bitmap: for each
    seeded hash, test one bit with two array lookups and a bitwise AND —
    all inside WholeStageCodegen, no join, no Python."""
    m = len(bloom) * 64
    # single array literals (one plan node each), not m/64 expression
    # nodes — keeps plan construction O(1) as the bitmap grows
    words = F.lit(bloom).cast("array<long>")
    pow2 = F.lit(_POW2).cast("array<long>")
    cond = F.lit(True)
    for pos in _positions(key, m, h):
        word = F.element_at(words, (F.shiftright(pos, 6) + 1).cast("int"))
        mask = F.element_at(
            pow2, (pos.bitwiseAND(F.lit(63)) + 1).cast("int")
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = BLOOM_BITS,
    h: int = BLOOM_HASHES,
) -> DataFrame:
    """EXACT left-semi join of `fact` against `dim_keys`, bloom-pruned:

      1. fold dim keys into an m-bit bloom (one aggregate; bounded driver
         state: m/64 longs);
      2. filter the fact scan with the plan-literal bloom probe — this is
         the step that matters at 100 TB: the shuffle downstream sees only
         true matches + false positives instead of the whole table;
      3. exact `left_semi` join over the survivors removes the false
         positives, so the result is exactly `fact SEMI JOIN dim_keys`.

    At test scale the semi-join alone would do; the operator exists so the
    PLAN is the one you'd want at 1000 executors — size m ≈ 10 bits per
    distinct key and the bitmap stays a few MB while pruning ~98%."""
    bloom = build_bloom(dim_keys, dim_key, m, h)
    pruned = fact.filter(bloom_might_contain(F.col(fact_key), bloom, h))
    return pruned.join(
        dim_keys.select(F.col(dim_key).alias(fact_key)).distinct(),
        on=fact_key,
        how="left_semi",
    )
