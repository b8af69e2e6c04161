

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


class TestSessionGapSweep:
    """session_gap_sweep semantics on constructed timelines, verified
    against a brute-force model that ACTUALLY segments each user's
    events per threshold — so the sessions = users + boundaries and
    in-session = span - cut identities are checked against first
    principles, not against themselves."""

    # user -> event times (seconds)
    TIMELINES = {
        1: [0, 100, 500, 4000, 4100, 20000],
        2: [50, 10000],
        3: [7],
    }

    def _naive(self, thresholds):
        out = {}
        for t in thresholds:
            n_sessions = 0
            in_session = 0
            n_events = 0
            for times in self.TIMELINES.values():
                times = sorted(times)
                n_events += len(times)
                sess = [[times[0]]]
                for a, b in zip(times, times[1:]):
                    if b - a > t:
                        sess.append([b])
                    else:
                        sess[-1].append(b)
                n_sessions += len(sess)
                in_session += sum(s[-1] - s[0] for s in sess)
            n_users = len(self.TIMELINES)
            out[t] = (
                n_users,
                n_events,
                n_sessions,
                n_events * 100 // n_sessions,
                in_session // n_sessions,  # already whole seconds
            )
        return out

    def test_matches_brute_force_segmentation(self, spark):
        import datetime
        import os
        import tempfile

        import fluxdb_spark.catalog as cat
        from fluxdb_spark.catalog.relational import _SESSION_GAPS_S

        rows, eid = [], 0
        base = datetime.datetime(2024, 1, 1)
        for uid, times in self.TIMELINES.items():
            for sec in times:
                rows.append(
                    (
                        eid,
                        base + datetime.timedelta(seconds=sec),
                        uid,
                        "click",
                        50.0,
                        f"p{eid}",
                    )
                )
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        )
        spec = {s.name: s for s in cat.catalog()}["session_gap_sweep"]
        want = self._naive(_SESSION_GAPS_S)
        with tempfile.TemporaryDirectory() as td:
            df.write.parquet(os.path.join(td, "events.parquet"))
            got = spec.spark(spark, td).collect()
        assert len(got) == len(want)
        for r in got:
            nu, ne, ns, mex, mds = want[r.threshold_s]
            assert (
                r.n_users,
                r.n_events,
                r.n_sessions,
                r.mean_events_x100,
                r.mean_session_s,
            ) == (nu, ne, ns, mex, mds), r.threshold_s
