"""fluxdb_spark — a PySpark-native temporal analytics engine.

A brand-new engine with the query and data-processing capabilities of
streamingfast/fluxdb (a temporal, height-versioned blockchain-state store),
re-expressed Spark-first:

- one canonical *change-log* DataFrame schema (collection, tablet_id, height,
  primary_key, value, is_deletion, block_id, block_num) instead of a sorted KV
  keyspace;
- temporal reads (snapshot-at-height, as-of, history) as declarative
  DataFrame plans that Catalyst can push down and Tungsten can codegen;
- snapshot indexing as an incremental materialized compaction table;
- hash-sharded backfill as plain Spark shuffle partitioning;
- fork-aware speculative overlay as a small union-able staging DataFrame;
- plus a full relational/SQL layer and large-scale training-data pipeline
  operators (dedup, similarity search, text analysis, multimodal plumbing)
  that the reference lacks but Spark gives us.

Nothing here is a port: the reference (Go, ~6.3k LoC) is cited in docstrings
only to pin down *semantics* (reference file:line), never implementation.
"""

from fluxdb_spark.session import get_spark, spread

__all__ = ["get_spark", "spread"]
__version__ = "0.1.0"
