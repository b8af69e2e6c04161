"""Event-time watermark + windowed aggregation with late-data semantics
(SURVEY §2.6 streaming rows: the reference orders by height and has no
event-time windows; the Spark build exposes them natively).

Append mode + withWatermark: a window is emitted exactly once, when the
watermark (max event time - delay) passes its end; windows still open at
the end of the stream are withheld. The test streams the events table in
two micro-batches and checks the emitted set against the batch answer."""

from __future__ import annotations

import glob
import os
import shutil
import uuid
from datetime import timedelta

import pytest
from pyspark.sql import functions as F

from fluxdb_spark.sources.tables import normalize_event_ts

SF = "/root/testdata/sf0.001"
DELAY = timedelta(hours=1)
WINDOW = timedelta(hours=1)


@pytest.fixture(scope="module")
def events(spark):
    return (
        normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
        .persist()
    )


@pytest.fixture(scope="module")
def stream_dir(spark, events, tmp_path_factory):
    """The events table split into two parquet files = two micro-batches."""
    root = tmp_path_factory.mktemp("wm")
    mid = events.agg(F.expr("percentile_approx(event_id, 0.5)")).first()[0]
    events.filter(F.col("event_id") <= mid).coalesce(1).write.parquet(
        str(root / "b1")
    )
    events.filter(F.col("event_id") > mid).coalesce(1).write.parquet(
        str(root / "b2")
    )
    os.makedirs(root / "stream")
    for i, f in enumerate(sorted(glob.glob(str(root / "b*" / "part-*.parquet")))):
        shutil.copy(f, root / "stream" / f"{i:02d}.parquet")
    return str(root / "stream")


def test_append_mode_emits_only_finalized_windows(spark, events, stream_dir):
    raw = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    agg = (
        raw.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    name = "wm_" + uuid.uuid4().hex[:6]
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.window_start, r.n) for r in spark.table(name).collect()}

    batch = {
        (r.window_start, r.n)
        for r in events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
        .collect()
    }
    max_ts = events.agg(F.max("ts")).first()[0]
    watermark = max_ts - DELAY

    # every emitted window is final and bit-identical to the batch answer
    assert got <= batch
    # the withheld windows are exactly those not yet closed by the watermark
    withheld = {w for (w, _) in batch - got}
    assert withheld == {
        w for (w, _) in batch if w + WINDOW > watermark
    }
    assert len(withheld) >= 1  # the tail window is always still open
