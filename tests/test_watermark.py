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


def test_simhash_dedup_state_bounded_by_watermark(spark, tmp_path):
    """The streaming near-dup shape (map-only SimHash fingerprint ->
    dropDuplicatesWithinWatermark) with REAL per-row event times across
    micro-batches: in-horizon duplicates dedup, and fingerprints older
    than the watermark horizon are EVICTED from the state store — the
    property that makes continuous near-dup dedup viable at 100 TB/day
    (unbounded state would OOM any cluster). The catalog entry keeps its
    time spread within the delay so its DISTINCT oracle is exact; this
    test widens the spread to prove the eviction path."""
    from datetime import datetime

    from fluxdb_spark.functions import dedup as dd

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    t6 = datetime(2024, 1, 1, 6, 0, 0)  # 6h later >> 1h watermark delay
    batch1 = [(f"alpha document number {i} unique body", t0) for i in range(50)]
    fresh2 = [(f"beta document number {i} other body", t6) for i in range(50)]
    batch2 = fresh2 + fresh2[:5]  # 5 in-horizon duplicates
    sdir = tmp_path / "stream"
    sdir.mkdir()
    schema = "text string, ts timestamp"
    for i, rows in enumerate([batch1, batch2]):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / f"b{i}")
        )
        src = glob.glob(str(tmp_path / f"b{i}" / "part-*.parquet"))[0]
        shutil.copy(src, sdir / f"{i:02d}.parquet")

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(sdir))
    )
    deduped = (
        raw.select(dd.simhash_col(F.col("text")).alias("simhash"), "ts")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["simhash"])
        .select("simhash")
    )
    name = "simwm_" + uuid.uuid4().hex[:6]
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    all_texts = spark.createDataFrame(batch1 + batch2, schema)
    want = {
        r.simhash
        for r in all_texts.select(
            dd.simhash_col(F.col("text")).alias("simhash")
        ).collect()
    }
    got = [r.simhash for r in spark.table(name).collect()]
    # exact dedup: every distinct fingerprint once, duplicates suppressed
    assert sorted(got) == sorted(want)
    # state is BOUNDED: after batch 2 the watermark (t6 - 1h) has evicted
    # every batch-1 fingerprint; only batch-2 state remains
    import json as _json

    progs = [_json.loads(p.json) for p in q.recentProgress]
    totals = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in progs
        if p.get("stateOperators")
    ]
    assert totals, "no state operator progress recorded"
    n_batch1 = len(
        {
            r.simhash
            for r in spark.createDataFrame(batch1, schema)
            .select(dd.simhash_col(F.col("text")).alias("simhash"))
            .collect()
        }
    )
    # the final micro-batch's state holds only the fresh fingerprints —
    # strictly fewer than the full distinct set (eviction happened)
    assert totals[-1] < len(want)
    assert totals[-1] <= len(want) - n_batch1
