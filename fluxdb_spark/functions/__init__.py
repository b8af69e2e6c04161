from fluxdb_spark.functions.hashing import hash60, hash60_sql, shard_of, shard_of_sql

__all__ = ["hash60", "hash60_sql", "shard_of", "shard_of_sql"]
