"""Ad-hoc phase profile of stream_winnow at sf0.1 (round 14)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluxdb_spark import get_spark  # noqa: E402
from fluxdb_spark.catalog import _shared as sh  # noqa: E402
from fluxdb_spark.catalog import streaming as st  # noqa: E402
from fluxdb_spark.catalog._core import _td  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def lap(label, t0):
    t = time.time()
    print(f"  {label:42s} {t - t0:7.3f}s", flush=True)
    return t


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="prof_stream_winnow")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm
    t0 = time.time()

    # phase A: batch winnow profile (map-only), noop-style count
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prof = sh._winnow_profile(st._sspread_batch(d) if hasattr(st, "_sspread_batch") else d.repartition(32))
    prof.write.format("noop").mode("overwrite").save()
    t0 = lap("batch profile (repartition 32, noop)", t0)

    # phase B: the streaming drain exactly as the entry does it
    schema = d.schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    per = sh._winnow_profile(st._sspread(raw)).groupBy("doc_id", "fp").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    drained = st._drain(
        spark, sf_dir, per, ["documents.parquet"], prefix="prof_winnow"
    ).select("doc_id", "fp")
    t0 = lap("streaming drain (state agg + memory sink)", t0)

    n = drained.count()
    t0 = lap(f"count drained ({n} rows)", t0)

    out = sh._winnow_finish(drained)
    n2 = out.count()
    t0 = lap(f"finisher ({n2} rows)", t0)

    # batch twin end-to-end for reference
    t0 = time.time()
    out2 = sh._winnow_finish(sh._winnow_profile(_td(spark, sf_dir)))
    n3 = out2.count()
    t0 = lap(f"batch twin total ({n3} rows)", t0)
    spark.stop()


if __name__ == "__main__":
    main()
