"""Measure the fixed cost of the availableNow memory-sink drain: a
trivial 10-row aggregate drained repeatedly, timed per drain."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluxdb_spark import get_spark  # noqa: E402
from fluxdb_spark.catalog import streaming as st  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="prof_drain_floor")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    for i in range(4):
        t0 = time.time()
        raw = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        agg = raw.groupBy((F.col("user_id") % 10).alias("b")).agg(
            F.count(F.lit(1)).alias("n")
        )
        t = st._drain(spark, sf_dir, agg, ["events.parquet"], prefix="floor")
        n = t.count()
        print(f"drain {i}: {time.time() - t0:.3f}s ({n} rows)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
