

class TestIntervalMerge:
    """interval_merge semantics on constructed data: overlapping
    intervals merge, touching intervals (s == prev_max) merge,
    gap-separated intervals don't."""

    def test_constructed_islands(self, spark):
        import os
        import tempfile

        import fluxdb_spark.catalog as cat

        # supplier 1: [0,5] + [3,8] overlap, [8,10] touches -> one
        # island [0,10]; [20,21] is its own island.
        # supplier 2: two disjoint singletons.
        rows = [
            (1, "1992-01-01", 5.0),
            (1, "1992-01-04", 5.0),
            (1, "1992-01-09", 2.0),
            (1, "1992-01-21", 1.0),
            (2, "1992-01-01", 1.0),
            (2, "1992-01-10", 1.0),
        ]
        df = spark.createDataFrame(
            rows, "l_suppkey long, ship string, l_quantity double"
        ).selectExpr(
            "l_suppkey",
            "CAST(ship AS TIMESTAMP) AS l_shipdate",
            "l_quantity",
        )
        spec = {s.name: s for s in cat.catalog()}["interval_merge"]
        with tempfile.TemporaryDirectory() as td:
            df.write.parquet(os.path.join(td, "lineitem.parquet"))
            got = {
                r.l_suppkey: r for r in spec.spark(spark, td).collect()
            }
        assert got[1].n_intervals == 4
        assert got[1].n_islands == 2
        # island [day0, day10] = 11 days + island [day20, day21] = 2
        assert got[1].covered_days == 13
        assert got[1].max_merged == 3
        assert got[2].n_islands == 2
        assert got[2].covered_days == 4  # two 2-day singletons
        assert got[2].max_merged == 1
