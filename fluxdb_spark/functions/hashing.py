"""Deterministic, engine-portable hashing primitives.

Spark's builtin `hash()`/`xxhash64()` are not reproducible in other engines,
so every operator whose output embeds a hash (shard assignment, minhash
signatures, simhash fingerprints, content fingerprints) uses a 60-bit integer
derived from md5 — available and bit-identical in Spark, DuckDB, and Python.
60 bits (15 hex chars) keeps the value positive in a signed 64-bit LONG.

Each Spark expression has a `_sql` twin producing the identical DuckDB
expression, so oracle queries can reproduce results exactly.

The reference sharded backfill entities with highwayhash64(key) % shards
(sharder.go:186-192); `shard_of` is the same operator with a portable hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column | str, seed: str = "") -> Column:
    """60-bit integer hash of a string column (optionally salted)."""
    c = F.col(col) if isinstance(col, str) else col
    if seed:
        c = F.concat(F.lit(seed), F.lit("|"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str, seed: str = "") -> str:
    """DuckDB twin of `hash60` (same bits)."""
    inner = f"concat('{seed}', '|', {expr})" if seed else expr
    return f"CAST(concat('0x', substr(md5({inner}), 1, 15)) AS BIGINT)"


def shard_of(col: Column | str, num_shards: int) -> Column:
    """P1 — deterministic shard assignment: hash(entity key) % N, so every
    version of an entity lands in one shard (reference goesToShard,
    sharder.go:186-192)."""
    return F.pmod(hash60(col), F.lit(num_shards))


def shard_of_sql(expr: str, num_shards: int) -> str:
    return f"({hash60_sql(expr)} % {num_shards})"
