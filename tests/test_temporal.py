"""Semantic spec for the temporal operators, ported scenario-by-scenario from
the reference's read_test.go (see FIXTURES.md §A3). Each test states the
reference case it mirrors."""

from __future__ import annotations

import pytest

from fluxdb_spark.operators import (
    has_rows,
    row_at,
    singlet_at,
    singlet_history,
    state_at,
)


def rows_of(df, *cols):
    cols = cols or ("primary_key", "height", "value")
    return [tuple(getattr(r, c) for c in cols) for r in df.collect()]


@pytest.mark.parametrize("strategy", ["agg", "window"])
class TestStateAt:
    def test_speculative_delete_wins(self, mk, mkspec, strategy):
        # read_test.go:29-48: durable (123, 002, abc); speculative delete at
        # 124 -> state_at(124) is empty.
        log = mk([("tbl", 123, "002", "abc")])
        spec = mkspec([("tbl", 124, "002", "")])
        assert rows_of(state_at(log, "tbl", 124, spec, strategy=strategy)) == []

    def test_speculative_only(self, mk, mkspec, strategy):
        # read_test.go:50-65: no durable rows; speculative insert visible.
        log = mk([]) if False else mk([("other", 1, "001", "x")])
        spec = mkspec([("tbl", 124, "002", "abc")])
        assert rows_of(state_at(log, "tbl", 124, spec, strategy=strategy)) == [
            ("002", 124, "abc")
        ]

    def test_plain_snapshot(self, mk, strategy):
        # read_test.go:67-87 (index-hit case reduces to this without index).
        log = mk([("tbl", 123, "002", "abc")])
        assert rows_of(state_at(log, "tbl", 124, strategy=strategy)) == [
            ("002", 123, "abc")
        ]

    def test_delete_then_read_above(self, mk, strategy):
        # read_test.go:89-113: row deleted at 124 -> state_at(125) empty.
        log = mk([("tbl", 123, "002", "abc"), ("tbl", 124, "002", "")])
        assert rows_of(state_at(log, "tbl", 125, strategy=strategy)) == []

    def test_delete_then_speculative_reinsert(self, mk, mkspec, strategy):
        # read_test.go:115-144: delete at 124, speculative insert "def" at
        # 125 -> state_at(125) sees the reinserted row.
        log = mk([("tbl", 123, "002", "abc"), ("tbl", 124, "002", "")])
        spec = mkspec([("tbl", 125, "002", "def")])
        assert rows_of(state_at(log, "tbl", 125, spec, strategy=strategy)) == [
            ("002", 125, "def")
        ]

    def test_last_write_wins_and_sort(self, mk, strategy):
        log = mk(
            [
                ("tbl", 1, "b", "b1"),
                ("tbl", 3, "b", "b3"),
                ("tbl", 2, "a", "a2"),
                ("tbl", 5, "a", "a5"),  # above read height
            ]
        )
        assert rows_of(state_at(log, "tbl", 4, strategy=strategy)) == [
            ("a", 2, "a2"),
            ("b", 3, "b3"),
        ]

    def test_same_height_speculative_wins(self, mk, mkspec, strategy):
        # reference applies speculative writes after durable (read.go:155-169)
        log = mk([("tbl", 10, "001", "durable")])
        spec = mkspec([("tbl", 10, "001", "spec")])
        assert rows_of(state_at(log, "tbl", 10, spec, strategy=strategy)) == [
            ("001", 10, "spec")
        ]

    def test_height_zero(self, mk, strategy):
        # read_test.go:168-182: reads at height 0 work.
        log = mk([("tbl", 0, "001", "zero"), ("tbl", 1, "001", "one")])
        assert rows_of(state_at(log, "tbl", 0, strategy=strategy)) == [
            ("001", 0, "zero")
        ]


class TestRowAt:
    def test_point_read(self, mk):
        # read_test.go:146-166: index maps 002->100, row stored at 100.
        log = mk([("tbl", 100, "002", "abc"), ("tbl", 101, "001", "zzz")])
        assert rows_of(row_at(log, "tbl", 124, "002")) == [("002", 100, "abc")]

    def test_deleted_row_empty(self, mk):
        log = mk([("tbl", 100, "002", "abc"), ("tbl", 110, "002", "")])
        assert rows_of(row_at(log, "tbl", 124, "002")) == []
        # but reading below the delete still sees it
        assert rows_of(row_at(log, "tbl", 105, "002")) == [("002", 100, "abc")]

    def test_missing_key(self, mk):
        log = mk([("tbl", 100, "002", "abc")])
        assert rows_of(row_at(log, "tbl", 124, "404")) == []


class TestSingletAt:
    # read_test.go:184-282 as-of matrix: versions at {3,5}; query heights
    # {0,2,3,4,5,6} expect: none, none, v3, v3, v5, v5.
    @pytest.mark.parametrize(
        "h,expect",
        [
            (0, []),
            (2, []),
            (3, [("", 3, "v3")]),
            (4, [("", 3, "v3")]),
            (5, [("", 5, "v5")]),
            (6, [("", 5, "v5")]),
        ],
    )
    def test_asof_matrix(self, mk, h, expect):
        log = mk([("sg1", 3, "", "v3"), ("sg1", 5, "", "v5")])
        assert rows_of(singlet_at(log, "sg1", h)) == expect

    def test_asof_with_height_zero_version(self, mk):
        # read_test.go variant {0,1,5}
        log = mk([("sg1", 0, "", "v0"), ("sg1", 1, "", "v1"), ("sg1", 5, "", "v5")])
        assert rows_of(singlet_at(log, "sg1", 0)) == [("", 0, "v0")]
        assert rows_of(singlet_at(log, "sg1", 4)) == [("", 1, "v1")]

    def test_tombstone_asof(self, mk):
        log = mk([("sg1", 3, "", "v3"), ("sg1", 5, "", "")])
        assert rows_of(singlet_at(log, "sg1", 6)) == []
        assert rows_of(singlet_at(log, "sg1", 4)) == [("", 3, "v3")]

    def test_speculative_replaces(self, mk, mkspec):
        # read_test.go:284-338: speculative write overrides durable as-of.
        log = mk([("sg1", 3, "", "v3")])
        spec = mkspec([("sg1", 4, "", "v4spec")])
        assert rows_of(singlet_at(log, "sg1", 5, spec)) == [("", 4, "v4spec")]


class TestSingletHistory:
    def test_newest_first_speculative_first(self, mk, mkspec):
        # read_test.go:339-365: durable {0,1,2} + speculative {3} ->
        # newest-first with speculative entries before durable ones.
        log = mk([("sg1", 0, "", "v0"), ("sg1", 1, "", "v1"), ("sg1", 2, "", "v2")])
        spec = mkspec([("sg1", 3, "", "v3")])
        assert rows_of(singlet_history(log, "sg1", spec)) == [
            ("", 3, "v3"),
            ("", 2, "v2"),
            ("", 1, "v1"),
            ("", 0, "v0"),
        ]

    def test_speculative_only_history(self, mk, mkspec):
        # read_test.go:367-388
        log = mk([("other", 1, "", "x")])
        spec = mkspec([("sg1", 5, "", "a"), ("sg1", 7, "", "b")])
        assert rows_of(singlet_history(log, "sg1", spec)) == [
            ("", 7, "b"),
            ("", 5, "a"),
        ]

    def test_speculative_prepend_survives_height_ties(self, mk, mkspec):
        # reference CHANGELOG.md:29 ordering fix (read.go:380-393): ALL
        # speculative entries are PREPENDED — before every durable entry,
        # even durable ones at a higher height, and stably first when a
        # speculative and a durable entry share the same height.
        log = mk([("sg1", 2, "", "dur2"), ("sg1", 5, "", "dur5")])
        spec = mkspec([("sg1", 2, "", "spec2")])
        assert rows_of(singlet_history(log, "sg1", spec)) == [
            ("", 2, "spec2"),  # speculative block first, despite dur5 > 2
            ("", 5, "dur5"),
            ("", 2, "dur2"),
        ]

    def test_history_includes_tombstones(self, mk):
        # history is the raw version log — deletions are visible entries
        log = mk([("sg1", 1, "", "v1"), ("sg1", 2, "", "")])
        assert rows_of(singlet_history(log, "sg1"), "height", "is_deletion") == [
            (2, True),
            (1, False),
        ]


class TestHasRows:
    def test_probe(self, mk):
        log = mk([("tbl", 1, "001", "x")])
        assert has_rows(log, "tbl") is True
        assert has_rows(log, "nope") is False


class TestStateSeries:
    def test_series_equals_per_grid_state_at(self, spark):
        """state_series ≡ one state_at per grid point — including a
        tombstone dropping the key for later grid points and a
        re-insert bringing it back."""
        from fluxdb_spark.operators import state_at, state_series
        from tests.conftest import make_changelog

        log = make_changelog(
            spark,
            [
                ("tbl", 5, "a", "a5"),
                ("tbl", 12, "a", "a12"),
                ("tbl", 23, "a", ""),     # tombstone: gone from 30 on
                ("tbl", 38, "a", "a38"),  # re-insert: back at 40
                ("tbl", 8, "b", "b8"),
                ("tbl", 40, "c", "c40"),  # lands exactly on a grid point
            ],
        )
        series = {
            (r.as_of_height, r.primary_key): (r.height, r.value)
            for r in state_series(log, "tbl", 10, 50, 10).collect()
        }
        naive = {}
        for g in range(10, 51, 10):
            for r in state_at(log, "tbl", g).collect():
                naive[(g, r.primary_key)] = (r.height, r.value)
        assert series == naive
        assert (20, "a") in series and (30, "a") not in series
        assert series[(40, "a")] == (38, "a38")
        assert series[(40, "c")] == (40, "c40")

    def test_single_shuffle_plan(self, spark):
        """The whole series costs ONE exchange (the per-key window), not
        one per grid point."""
        from fluxdb_spark.operators import state_series
        from tests.conftest import make_changelog

        log = make_changelog(spark, [("tbl", h, "k", f"v{h}") for h in range(1, 9)])
        plan = (
            state_series(log, "tbl", 2, 8, 2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # exchanges: the window partitioning + the final presentation sort
        assert plan.count("Exchange hashpartitioning") == 1


class TestTimeWeightedAvg:
    def test_matches_hand_model_with_tombstone_gap(self, spark):
        """TWA over [10, 30]: weights are live-interval lengths clipped to
        the window; a tombstone opens a zero-weight gap."""
        from pyspark.sql import functions as F

        from fluxdb_spark.operators import time_weighted_avg
        from tests.conftest import make_changelog

        log = make_changelog(
            spark,
            [
                ("tbl", 5, "a", "2"),    # live [10, 14] in-window -> w=5
                ("tbl", 15, "a", "4"),   # live [15, 19]          -> w=5
                ("tbl", 20, "a", ""),    # tombstone: gap [20, 24]
                ("tbl", 25, "a", "10"),  # live [25, 30]          -> w=6
                ("tbl", 40, "b", "7"),   # enters after the window: absent
            ],
        )
        got = {
            r.primary_key: (r.live_heights, r.twa)
            for r in time_weighted_avg(
                log, "tbl", 10, 30, F.col("value").cast("double")
            ).collect()
        }
        # a: (5*2 + 5*4 + 6*10) / 16 = 90/16 = 5.625
        assert got == {"a": (16, 5.625)}


class TestEngineSeriesOverlay:
    def test_engine_series_and_twa_see_the_overlay(self, spark, tmp_path):
        """Engine-level state_series/TWA ≡ per-grid engine.state_at with
        the speculative head fork participating."""
        from pyspark.sql import functions as F

        from fluxdb_spark.streaming.ingest import FluxEngine
        from tests.conftest import make_changelog

        eng = FluxEngine(spark, str(tmp_path / "sdb"))
        eng.store.write_batch(
            make_changelog(
                spark,
                [("tst", "tbl", 5, "a", "3"), ("tst", "tbl", 12, "b", "7")],
            )
        )
        # speculative head: a new version of 'a' at height 18
        eng.pipeline.process_new_block(
            "f1", 18, "", [("tst", "tbl", 18, "a", "9", False, "f1", 18)]
        )
        series = {
            (r.as_of_height, r.primary_key): r.value
            for r in eng.state_series("tbl", 10, 20, 5).collect()
        }
        naive = {}
        for g in (10, 15, 20):
            for r in eng.state_at("tbl", g, collection="tst").collect():
                naive[(g, r.primary_key)] = r.value
        assert series == naive
        assert series[(20, "a")] == "9"  # the fork row is live at 20
        twa = {
            r.primary_key: (r.live_heights, r.twa)
            for r in eng.time_weighted_avg(
                "tbl", 10, 20, F.col("value").cast("double")
            ).collect()
        }
        # a: v3 live [10,17] w=8, v9 live [18,20] w=3 -> (24+27)/11
        assert twa["a"] == (11, 4.6363)
        assert twa["b"] == (9, 7.0)


class TestSeriesSimilarity:
    def _log(self, spark):
        # three keys on a 10-step grid: 'a' and 'b' track each other,
        # 'c' diverges, 'd' exists only before the grid start
        from tests.conftest import make_changelog

        rows = []
        for i, h in enumerate(range(10, 101, 10)):
            rows.append(("tst", "tbl", h, "a", '{"k": %d}' % (i * 2)))
            rows.append(("tst", "tbl", h, "b", '{"k": %d}' % (i * 2 + 1)))
            rows.append(("tst", "tbl", h, "c", '{"k": %d}' % (i * i * 3)))
        rows.append(("tst", "tbl", 1, "d", '{"k": 0}'))
        return make_changelog(spark, rows)

    def test_nearest_trajectory_wins(self, spark):
        from fluxdb_spark.operators.temporal import series_similarity

        out = series_similarity(
            self._log(spark), "tbl", "a", 10, 100, 10, k=5
        ).collect()
        ranked = [r.primary_key for r in sorted(out, key=lambda r: r.rank)]
        assert ranked[0] == "b"  # constant offset 1 -> dist = 10
        by_key = {r.primary_key: r for r in out}
        assert by_key["b"].dist == 10  # 10 grid points x 1^2
        assert by_key["b"].n_common == 10
        assert by_key["c"].dist > by_key["b"].dist
        # 'd' never overlaps the probe's grid points... but its value
        # persists into the grid (state semantics), so it IS comparable
        assert "d" in by_key and by_key["d"].n_common == 10

    def test_probe_excluded_and_coverage_filter(self, spark):
        from fluxdb_spark.operators.temporal import series_similarity

        out = series_similarity(
            self._log(spark), "tbl", "a", 10, 100, 10, k=5,
            min_common=11,
        ).collect()
        assert out == []  # nobody has 11 common grid points
        out = series_similarity(
            self._log(spark), "tbl", "a", 10, 100, 10, k=5
        ).collect()
        assert all(r.primary_key != "a" for r in out)

    def test_tombstone_truncates_series(self, spark):
        from tests.conftest import make_changelog
        from fluxdb_spark.operators.temporal import series_similarity

        rows = [
            ("tst", "tbl", h, "a", '{"k": 5}') for h in range(10, 101, 10)
        ] + [
            ("tst", "tbl", 10, "e", '{"k": 5}'),
            ("tst", "tbl", 55, "e", None),  # deletion at 55
        ]
        log = make_changelog(spark, rows)
        out = {
            r.primary_key: r
            for r in series_similarity(
                log, "tbl", "a", 10, 100, 10, k=5
            ).collect()
        }
        # e matches exactly while live (grid 10..50), then drops out
        assert out["e"].n_common == 5 and out["e"].dist == 0


class TestStateJoin:
    # The reference has no cross-tablet read; semantics are pinned to
    # "state_at per tablet + equi-join on primary_key" (the oracle form).

    def _log(self, mk):
        return mk([
            ("a", 10, "k1", "a1"),
            ("a", 20, "k1", "a2"),   # latest a for k1
            ("b", 15, "k1", "b1"),   # latest b for k1
            ("a", 10, "k2", "a1"),   # k2 lives only in a
            ("b", 10, "k3", "b1"),
            ("b", 30, "k3", ""),     # k3 tombstoned in b
            ("a", 99, "k4", "hi"),   # above read height
        ])

    def test_inner_matches_per_tablet_state_join(self, mk):
        from fluxdb_spark.operators.temporal import state_join

        out = rows_of(
            state_join(self._log(mk), ["a", "b"], 50),
            "primary_key", "a_height", "a_value", "b_height", "b_value",
        )
        assert out == [("k1", 20, "a2", 15, "b1")]

    def test_outer_keeps_half_live_keys(self, mk):
        from fluxdb_spark.operators.temporal import state_join

        out = rows_of(
            state_join(self._log(mk), ["a", "b"], 50, how="outer"),
            "primary_key", "a_height", "a_value", "b_height", "b_value",
        )
        # k3's latest b version is a tombstone -> absent everywhere
        assert out == [
            ("k1", 20, "a2", 15, "b1"),
            ("k2", 10, "a1", None, None),
        ]

    def test_speculative_overlay_wins(self, mk, mkspec):
        from fluxdb_spark.operators.temporal import state_join

        spec = mkspec([("b", 50, "k2", "spec")])
        out = rows_of(
            state_join(self._log(mk), ["a", "b"], 50, speculative=spec),
            "primary_key", "a_height", "a_value", "b_height", "b_value",
        )
        assert ("k2", 10, "a1", 50, "spec") in out

    def test_no_join_single_agg_plan(self, mk):
        from fluxdb_spark.operators.temporal import state_join

        plan = state_join(self._log(mk), ["a", "b"], 50)._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan


class TestSeriesAnomalies:
    def test_spike_flagged_constants_not(self, spark):
        from tests.conftest import make_changelog
        from fluxdb_spark.operators.temporal import series_anomalies

        # key a: constant 5 -> zero variance, nothing flagged
        # key b: five 10s then 100 -> spike at sqrt(5) sigma, flagged
        # (with n-1 constants + 1 outlier the outlier sits at exactly
        # sqrt(n-1) sigma, so n=5 would land ON the 2-sigma boundary
        # and the strict > correctly leaves it unflagged)
        rows = [("tst", "tbl", h, "a", '{"k": 5}') for h in
                range(10, 61, 10)]
        rows += [("tst", "tbl", h, "b", '{"k": 10}') for h in
                 range(10, 51, 10)]
        rows += [("tst", "tbl", 60, "b", '{"k": 100}')]
        log = make_changelog(spark, rows)
        out = series_anomalies(log, "tbl", 10, 60, 10).collect()
        flagged = {(r.primary_key, r.as_of_height, r.x) for r in out}
        assert flagged == {("b", 60, 100)}
        # exact integers: n=6, s=150, ss=10500
        r = out[0]
        assert r.n_points == 6
        assert r.dev_sq_n2 == (6 * 100 - 150) ** 2
        assert r.var_bound_n2 == 4 * (6 * 10500 - 150 * 150)

    def test_exact_two_sigma_boundary_unflagged(self, spark):
        from tests.conftest import make_changelog
        from fluxdb_spark.operators.temporal import series_anomalies

        # 4 constants + 1 outlier: the outlier sits at exactly
        # sqrt(n-1) = 2 sigma, and the strict > must NOT flag it —
        # the integer test has no epsilon to blur the boundary.
        rows = [("tst", "tbl", h, "b", '{"k": 10}') for h in
                range(10, 41, 10)]
        rows += [("tst", "tbl", 50, "b", '{"k": 100}')]
        log = make_changelog(spark, rows)
        assert series_anomalies(log, "tbl", 10, 50, 10).count() == 0

    def test_min_points_guard(self, spark):
        from tests.conftest import make_changelog
        from fluxdb_spark.operators.temporal import series_anomalies

        # 2 grid points only -> below min_points, never flagged
        rows = [("tst", "tbl", 10, "a", '{"k": 1}'),
                ("tst", "tbl", 20, "a", '{"k": 1000}')]
        log = make_changelog(spark, rows)
        assert series_anomalies(log, "tbl", 10, 20, 10).count() == 0


class TestSeriesEwma:
    def test_hand_computed_with_gap_and_tombstone(self, spark):
        from tests.conftest import make_changelog
        from fluxdb_spark.operators.temporal import series_ewma

        # key a: created at 10 (k=4), updated at 30 (k=8); lives on grid
        #   10,20 with x=4 and 30,40 with x=8
        # key b: created at 10 (k=6), DELETED at 25 -> grid 10,20 only;
        #   the tombstone truncates, so no zero-contributions after 20
        rows = [
            ("tst", "tbl", 10, "a", '{"k": 4}'),
            ("tst", "tbl", 30, "a", '{"k": 8}'),
            ("tst", "tbl", 10, "b", '{"k": 6}'),
            ("tst", "tbl", 25, "b", ""),
        ]
        log = make_changelog(spark, rows)
        out = {
            (r.primary_key, r.as_of_height): (r.x, r.ewma)
            for r in series_ewma(log, "tbl", 10, 40, 10).collect()
        }
        # a@10: 8*4/8=4; a@20: (8*4+4*4)/12=4; a@30: (8*8+4*4+2*4)/14
        # a@40: (8*8+4*8+2*4+1*4)/15
        assert out[("a", 10)] == (4, 4.0)
        assert out[("a", 20)] == (4, 4.0)
        assert out[("a", 30)] == (8, round((8 * 8 + 4 * 4 + 2 * 4) / 14, 4))
        assert out[("a", 40)] == (
            8, round((8 * 8 + 4 * 8 + 2 * 4 + 1 * 4) / 15, 4)
        )
        # b stops at 20: the tombstone removes it from grid >= 30
        assert out[("b", 10)] == (6, 6.0)
        assert out[("b", 20)] == (6, 6.0)
        assert ("b", 30) not in out and ("b", 40) not in out
        assert len(out) == 6

    def test_null_metric_renormalizes_on_both_engines(self, spark):
        """A version whose value JSON lacks the metric key puts x=NULL
        on the grid.  Both engines must renormalize identically: the
        lag-0 term drops out (weight 8 not counted), and a point whose
        whole window is NULL yields ewma NULL — ADVICE r10 flagged the
        oracle SQL diverging here (uncoalesced 8*x)."""
        import duckdb

        from tests.conftest import make_changelog
        from fluxdb_spark.catalog import catalog
        from fluxdb_spark.operators.temporal import series_ewma

        # user 7: k missing for its entire first version -> all-NULL
        #   window at grids 100..250, then k=12 from 300 on.
        # user 8: k at 100, missing at 160 (grid 200), k=20 at 220 ->
        #   exercises NULL at lag 0 AND NULL at lag 1.
        events = [
            ("click", 100, 7, '{"j": 1}', 50.0),
            ("click", 260, 7, '{"k": 12}', 50.0),
            ("click", 100, 8, '{"k": 10}', 50.0),
            ("click", 160, 8, '{"j": 1}', 50.0),
            ("click", 220, 8, '{"k": 20}', 50.0),
        ]
        rows = [
            ("evt", et, h, str(u), props) for (et, h, u, props, _) in events
        ]
        log = make_changelog(spark, rows)
        got = {
            (r.primary_key, r.as_of_height): (r.x, r.ewma)
            for r in series_ewma(log, "click", 100, 900, 50).collect()
        }
        # hand-checked anchors
        assert got[("7", 100)] == (None, None)      # den = 0
        assert got[("7", 250)] == (None, None)      # whole window NULL
        assert got[("7", 300)] == (12, 12.0)
        assert got[("8", 200)] == (None, 10.0)      # (4*10+2*10)/6
        assert got[("8", 250)] == (20, round(190 / 11, 4))  # x1 NULL

        # oracle twin over the identical events relation
        con = duckdb.connect(":memory:")
        con.execute(
            "CREATE TABLE events (event_type VARCHAR, event_id BIGINT,"
            " user_id BIGINT, props VARCHAR, value DOUBLE)"
        )
        con.executemany("INSERT INTO events VALUES (?,?,?,?,?)", events)
        sql = next(
            s.oracle for s in catalog() if s.name == "flux_series_ewma"
        )
        want = {
            (pk, h): (x, ew)
            for pk, h, x, ew in con.execute(sql).fetchall()
        }
        norm = {
            k: (x, float(ew) if ew is not None else None)
            for k, (x, ew) in want.items()
        }
        assert norm == got


class TestStateDrift:
    def test_planted_shift_dominates(self, spark):
        from tests.conftest import make_changelog
        from fluxdb_spark.catalog import catalog  # noqa: F401
        from fluxdb_spark.functions.text import (
            source_divergence_from_counts,
        )
        from fluxdb_spark.operators.temporal import state_series
        from pyspark.sql import functions as F

        # 10 keys at value bucket 0 before height 500; after, five of
        # them move to bucket 9 -> bucket 9's chi2 contribution at the
        # later snapshot must rank first.
        rows = [("tst", "tbl", 10, f"k{i}", '{"k": 5}') for i in range(10)]
        rows += [("tst", "tbl", 600, f"k{i}", '{"k": 95}') for i in range(5)]
        log = make_changelog(spark, rows)
        grid = state_series(log, "tbl", 300, 900, 600, ordered=False)
        counts = (
            grid.select(
                F.col("as_of_height").cast("string").alias("source"),
                F.expr("cast(get_json_object(value, '$.k') as bigint) div 10")
                .cast("string")
                .alias("term"),
            )
            .groupBy("source", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("obs"))
        )
        out = source_divergence_from_counts(counts).collect()
        top_late = [r for r in out if r.source == "900" and r.rank == 1][0]
        assert top_late.term == "9" and top_late.obs == 5
        # the early snapshot is all one bucket
        early = {r.term for r in out if r.source == "300"}
        assert early == {"0"}


class TestKeySurvival:
    def test_tombstone_and_revival_semantics(self, spark):
        from tests.conftest import make_changelog
        from fluxdb_spark.catalog import catalog  # noqa: F401
        from pyspark.sql import functions as F

        # band 0: a lives, b deleted; band 1 (height 150): c deleted
        # then REVIVED at 400 -> counts as live (latest version wins)
        rows = [
            ("tst", "click", 10, "a", '{"k": 1}'),
            ("tst", "click", 20, "b", '{"k": 2}'),
            ("tst", "click", 500, "b", ""),
            ("tst", "click", 150, "c", '{"k": 3}'),
            ("tst", "click", 200, "c", ""),
            ("tst", "click", 400, "c", '{"k": 4}'),
        ]
        log = make_changelog(spark, rows)
        scoped = log.filter(
            (F.col("tablet_id") == "click") & (F.col("height") <= 900)
        )
        per_key = scoped.groupBy("primary_key").agg(
            F.min("height").alias("created_h"),
            F.expr("max_by(is_deletion, height)").alias("dead"),
        )
        got = {
            r.band: (r.created, r.live)
            for r in per_key.groupBy(
                F.expr("created_h div 100").alias("band")
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("created"),
                F.sum(F.when(~F.col("dead"), 1).otherwise(0))
                .cast("long")
                .alias("live"),
            )
            .collect()
        }
        assert got == {0: (2, 1), 1: (1, 1)}


class TestSeriesTrend:
    def test_exact_slope_on_crafted_series(self, spark):
        from tests.conftest import make_changelog
        from fluxdb_spark.catalog import catalog

        # key a: y = 2 + x/10 on grid 10..50 -> slope 0.1 = 100000 ppm
        # key b: constant -> flat; key c: 2 points -> filtered (n<3)
        rows = [("tst", "click", h, "a", '{"k": %d}' % (2 + h // 10))
                for h in (10, 20, 30, 40, 50)]
        rows += [("tst", "click", h, "b", '{"k": 7}') for h in (10, 20, 30)]
        rows += [("tst", "click", 10, "c", '{"k": 1}')]
        log = make_changelog(spark, rows)
        from fluxdb_spark.operators.temporal import state_series
        from pyspark.sql import functions as F

        grid = state_series(log, "click", 10, 50, 10, ordered=False).select(
            F.col("as_of_height").alias("x"),
            "primary_key",
            F.get_json_object("value", "$.k").cast("long").alias("y"),
        )
        stats = (
            grid.groupBy("primary_key")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("x").cast("long").alias("sx"),
                F.sum("y").cast("long").alias("sy"),
                F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
                F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            )
            .filter(F.col("n") >= 3)
        )
        out = {
            r.primary_key: (r.n, r.slope_ppm)
            for r in stats.select(
                "primary_key",
                "n",
                F.expr(
                    "((n * sxy - sx * sy) * 1000000)"
                    " div (n * sxx - sx * sx)"
                ).alias("slope_ppm"),
            ).collect()
        }
        # c created at 10 lives on the whole grid with constant value,
        # so it has 5 grid points and slope 0 (state series semantics:
        # a version persists until superseded)
        assert out["a"] == (5, 100000)
        assert out["b"] == (5, 0)
        assert out["c"] == (5, 0)


class TestTabletReconcile:
    def test_venn_counts(self, spark):
        from tests.conftest import make_changelog
        from fluxdb_spark.operators.temporal import state_join
        from pyspark.sql import functions as F

        rows = [
            ("tst", "A", 10, "k1", '{"k": 1}'),   # both equal
            ("tst", "B", 20, "k1", '{"k": 1}'),
            ("tst", "A", 10, "k2", '{"k": 2}'),   # both different
            ("tst", "B", 20, "k2", '{"k": 3}'),
            ("tst", "A", 10, "k3", '{"k": 4}'),   # only A
            ("tst", "A", 10, "k4", '{"k": 5}'),   # A then deleted in A,
            ("tst", "A", 30, "k4", ""),           #   live in B -> only B
            ("tst", "B", 20, "k4", '{"k": 6}'),
        ]
        log = make_changelog(spark, rows)
        sj = state_join(log, ["A", "B"], 700, how="outer")
        a, b = F.col("A_value"), F.col("B_value")
        flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
        r = sj.agg(
            flag(a.isNotNull() & b.isNull()).alias("only_a"),
            flag(a.isNull() & b.isNotNull()).alias("only_b"),
            flag(a == b).alias("both_equal"),
            flag(a.isNotNull() & b.isNotNull() & (a != b)).alias("both_diff"),
            F.count(F.lit(1)).cast("long").alias("total_keys"),
        ).collect()[0]
        assert (r.only_a, r.only_b, r.both_equal, r.both_diff,
                r.total_keys) == (1, 1, 1, 1, 4)


class TestMutationProfile:
    def test_insert_update_delete_classification(self, spark):
        from tests.conftest import make_changelog
        from pyspark.sql import Window, functions as F

        rows = [
            ("tst", "click", 10, "a", '{"k": 1}'),    # insert (band 0)
            ("tst", "click", 150, "a", '{"k": 2}'),   # update (band 1)
            ("tst", "click", 160, "a", ""),           # delete (band 1)
            ("tst", "click", 20, "b", ""),            # first event IS a
                                                      # delete -> delete
        ]
        log = make_changelog(spark, rows)
        scoped = log.filter(
            (F.col("tablet_id") == "click") & (F.col("height") <= 900)
        )
        first_h = F.min("height").over(Window.partitionBy("primary_key"))
        kinds = scoped.select(
            F.expr("height div 100").alias("band"),
            "primary_key",
            F.when(F.col("is_deletion"), F.lit("delete"))
            .when(F.col("height") == first_h, F.lit("insert"))
            .otherwise(F.lit("update"))
            .alias("kind"),
        )
        got = {
            (r.band, r.kind): 1
            for r in kinds.collect()
        }
        assert got == {
            (0, "insert"): 1, (1, "update"): 1,
            (1, "delete"): 1, (0, "delete"): 1,
        }


class TestSeriesBacktest:
    def test_linear_rewards_drift_alternating_rewards_naive(self, spark):
        from tests.conftest import make_changelog
        from fluxdb_spark.operators.temporal import series_backtest

        # key a: perfectly linear (k = height) -> drift forecast exact,
        #   naive off by one step every time -> ratio 0 ppm
        # key b: alternating 10,20,10,20,10 -> naive off by 10 per
        #   eval, drift off by 20 (extrapolates the flip) -> 2e6 ppm
        rows = [("tst", "tbl", h, "a", f'{{"k": {h}}}') for h in
                range(10, 51, 10)]
        vals = {10: 10, 20: 20, 30: 10, 40: 20, 50: 10}
        rows += [("tst", "tbl", h, "b", f'{{"k": {v}}}') for h, v in
                 vals.items()]
        log = make_changelog(spark, rows)
        out = {r.primary_key: r for r in
               series_backtest(log, "tbl", 10, 50, 10).collect()}
        a, b = out["a"], out["b"]
        assert a.n_evals == 3 and b.n_evals == 3
        assert a.drift_abs_err == 0 and a.naive_abs_err == 30
        assert a.drift_vs_naive_ppm == 0
        assert b.naive_abs_err == 30 and b.drift_abs_err == 60
        assert b.drift_vs_naive_ppm == 2_000_000

    def test_constant_series_yields_null_ratio(self, spark):
        from tests.conftest import make_changelog
        from fluxdb_spark.operators.temporal import series_backtest

        rows = [("tst", "tbl", h, "c", '{"k": 7}') for h in
                range(10, 41, 10)]
        log = make_changelog(spark, rows)
        r = series_backtest(log, "tbl", 10, 40, 10).collect()[0]
        assert r.naive_abs_err == 0 and r.drift_abs_err == 0
        assert r.drift_vs_naive_ppm is None


class TestStateFingerprint:
    """flux_state_fingerprint: the O(1)-exchange replica check must
    agree with the state relation it summarizes, and differ when the
    state differs."""

    def test_fingerprint_detects_a_divergent_replica(self, spark):
        from fluxdb_spark.catalog import catalog
        from fluxdb_spark.functions.hashing import hash60
        from fluxdb_spark.operators import temporal as tp
        from fluxdb_spark.sources.changelog import changelog_from_events
        from fluxdb_spark.sources.tables import load_table
        from pyspark.sql import functions as F

        specs = {s.name: s for s in catalog()}
        sf = "/root/testdata/sf0.001"
        rows = {
            r.tablet_id: (r.n_live, r.fingerprint)
            for r in specs["flux_state_fingerprint"].spark(spark, sf).collect()
        }
        n_all, fp_all = rows.pop("__all__")
        assert n_all == sum(n for n, _ in rows.values())
        from functools import reduce

        assert fp_all == reduce(
            lambda a, b: a ^ b, (fp for _, fp in rows.values())
        )
        # a replica whose state diverges by ONE row must fingerprint
        # differently in exactly the affected tablet
        log = changelog_from_events(load_table(spark, sf, "events"))
        state = tp.collection_state_at(log, 700)
        some = state.limit(1).collect()[0]
        mutated = state.withColumn(
            "value",
            F.when(
                (F.col("tablet_id") == some.tablet_id)
                & (F.col("primary_key") == some.primary_key),
                F.concat(F.coalesce(F.col("value"), F.lit("")), F.lit("X")),
            ).otherwise(F.col("value")),
        )
        fp2 = {
            r.tablet_id: r.fingerprint
            for r in mutated.select(
                "tablet_id",
                hash60(
                    F.concat(
                        F.col("primary_key"),
                        F.lit("|"),
                        F.coalesce(F.col("value"), F.lit("")),
                    )
                ).alias("h"),
            )
            .groupBy("tablet_id")
            .agg(F.bit_xor("h").cast("long").alias("fingerprint"))
            .collect()
        }
        assert fp2[some.tablet_id] != rows[some.tablet_id][1]
        for t, (n, fp) in rows.items():
            if t != some.tablet_id:
                assert fp2[t] == fp


def _write_events(spark, td, rows):
    """rows: (event_id, user_id, event_type, value). props = 'p<id>'."""
    import os

    df = spark.createDataFrame(
        [
            (eid, None, uid, et, val, f"p{eid}")
            for eid, uid, et, val in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(os.path.join(td, "events.parquet"))


class TestFluxKeySkew:
    """flux_key_skew semantics on a constructed log: rank ordering,
    top-5 cap, and exact share arithmetic."""

    def test_hot_key_share(self, spark):
        import tempfile

        import fluxdb_spark.catalog as cat

        rows = []
        eid = 0
        # tablet 'a': user 1 x6, user 2 x3, users 3..8 x1 -> 15 writes
        for _ in range(6):
            rows.append((eid, 1, "a", 50.0)); eid += 1
        for _ in range(3):
            rows.append((eid, 2, "a", 50.0)); eid += 1
        for u in range(3, 9):
            rows.append((eid, u, "a", 50.0)); eid += 1
        spec = {s.name: s for s in cat.catalog()}["flux_key_skew"]
        with tempfile.TemporaryDirectory() as td:
            _write_events(spark, td, rows)
            got = sorted(
                ((r.primary_key, r.n_versions, r.rank, r.share_ppm)
                 for r in spec.spark(spark, td).collect()),
                key=lambda t: t[2],
            )
        assert len(got) == 5  # top-5 cap despite 8 keys
        assert got[0] == ("1", 6, 1, 6 * 1_000_000 // 15)
        assert got[1] == ("2", 3, 2, 3 * 1_000_000 // 15)
        # singles tie-break by key asc
        assert [g[0] for g in got[2:]] == ["3", "4", "5"]
        assert all(g[3] == 1_000_000 // 15 for g in got[2:])


class TestWriteAmplification:
    """flux_write_amplification on a constructed log: head-version
    liveness, tombstone handling, exact ratio arithmetic."""

    def test_versions_live_ratio(self, spark):
        import tempfile

        import fluxdb_spark.catalog as cat

        # tablet 'a': key 1 -> 3 versions, head live (50.0);
        #             key 2 -> 2 versions, head a tombstone (5.0 < 10).
        rows = [
            (1, 1, "a", 50.0),
            (2, 1, "a", 50.0),
            (3, 2, "a", 50.0),
            (4, 1, "a", 50.0),
            (5, 2, "a", 5.0),
        ]
        spec = {s.name: s for s in cat.catalog()}[
            "flux_write_amplification"
        ]
        with tempfile.TemporaryDirectory() as td:
            _write_events(spark, td, rows)
            [r] = spec.spark(spark, td).collect()
        assert (r.tablet_id, r.n_versions, r.n_keys, r.n_live) == (
            "a", 5, 2, 1,
        )
        assert r.write_amp_x100 == 5 * 100 // 2
        assert r.live_ppm == 1 * 1_000_000 // 2


class TestVersionGapHistogram:
    """flux_version_gap_histogram semantics: gap counts reconcile with
    the changelog (every non-first version of a key contributes exactly
    one gap) and min/max sit inside their bucket's [2^b, 2^(b+1))
    range."""

    def test_reconciles_and_buckets_bound(self, spark):
        import fluxdb_spark.catalog as cat
        from pyspark.sql import functions as F
        from fluxdb_spark.sources import changelog_from_events, load_table

        sf = "/root/testdata/sf0.001"
        spec = {s.name: s for s in cat.catalog()}[
            "flux_version_gap_histogram"
        ]
        rows = spec.spark(spark, sf).collect()
        assert rows
        log = changelog_from_events(load_table(spark, sf, "events"))
        per_tablet = {
            r.tablet_id: r.n
            for r in log.groupBy("tablet_id")
            .agg(
                (
                    F.count(F.lit(1))
                    - F.countDistinct("primary_key")
                ).alias("n")
            )
            .collect()
        }
        got = {}
        for r in rows:
            got[r.tablet_id] = got.get(r.tablet_id, 0) + r.n_gaps
            lo, hi = 1 << r.bucket, 1 << (r.bucket + 1)
            if r.bucket == 0:
                lo = 0  # bucket 0 holds every gap < 2
            assert lo <= r.min_gap <= r.max_gap < hi
        assert got == per_tablet


class TestTombstoneAudit:
    """flux_tombstone_audit semantics on a constructed log: orphan
    deletes, resurrection cycles, and dead keys classify exactly
    (is_deletion is value < 10 in the changelog mapping)."""

    def test_lifecycle_classification(self, spark):
        import tempfile

        import fluxdb_spark.catalog as cat

        rows = [
            # key 1: insert, delete, insert, delete -> resurrected once,
            # dead, not orphan
            (100, 1, "click", 50.0),
            (200, 1, "click", 5.0),
            (300, 1, "click", 60.0),
            (400, 1, "click", 5.0),
            # key 2: delete first (orphan), then insert -> resurrected,
            # not dead
            (150, 2, "click", 5.0),
            (250, 2, "click", 70.0),
            # key 3: plain live key
            (175, 3, "click", 80.0),
        ]
        spec = {s.name: s for s in cat.catalog()}["flux_tombstone_audit"]
        with tempfile.TemporaryDirectory() as td:
            _write_events(spark, td, rows)
            got = {r.tablet_id: r for r in spec.spark(spark, td).collect()}
        r = got["click"]
        assert r.n_keys == 3
        assert r.orphan_keys == 1       # key 2
        assert r.resurrected_keys == 2  # keys 1 and 2
        assert r.dead_keys == 1         # key 1
        assert r.n_resurrections == 2   # one cycle each


class TestCadenceSweep:
    """flux_snapshot_cadence_sweep semantics on a constructed log,
    verified against a naive per-snapshot model (literally materialize
    every snapshot's key set and count), so the closed-form
    `ks - k_min + 1` membership arithmetic and the 128-bucket state
    trick are checked against first principles, not against themselves.
    The streaming twin must drain to the identical relation."""

    ROWS = [
        # (event_id/height, user_id/key, tablet, value)
        (0, 1, "click", 50.0),     # key 1 first at height 0
        (600, 1, "click", 60.0),
        (1290, 1, "click", 5.0),
        (200, 2, "click", 70.0),   # key 2 first at 200
        (1000, 2, "click", 80.0),
        (1100, 3, "click", 90.0),  # key 3 first at 1100
        (520, 4, "view", 40.0),    # second tablet
        (530, 4, "view", 41.0),
    ]

    def _naive(self):
        from collections import defaultdict

        heights = defaultdict(list)   # (tablet, key) -> heights
        for h, k, t, _v in self.ROWS:
            heights[(t, k)].append(h)
        H = max(h for h, *_ in self.ROWS)
        out = {}
        tablets = {t for _h, _k, t, _v in self.ROWS}
        for c in (128, 256, 512):
            K = H // c
            snaps = [k * c for k in range(1, K + 1)]
            for t in tablets:
                keys = {k: min(hs) for (tt, k), hs in heights.items()
                        if tt == t}
                rows = [h for (tt, _k), hs in heights.items()
                        if tt == t for h in hs]
                index_rows = sum(
                    sum(1 for h0 in keys.values() if h0 <= s)
                    for s in snaps
                )
                last = snaps[-1] if snaps else 0
                snap_rows = (
                    sum(1 for h0 in keys.values() if h0 <= last)
                    if snaps else 0
                )
                delta = (
                    sum(1 for h in rows if h > last)
                    if snaps else len(rows)
                )
                raw = len(rows)
                read = snap_rows + delta
                out[(t, c)] = (
                    K, index_rows, snap_rows, delta, read, raw,
                    int((raw - read) * 1_000_000 / raw) if raw else 0,
                    int(index_rows * 100 / raw) if raw else 0,
                )
        return out

    def test_matches_naive_model(self, spark):
        import tempfile

        import fluxdb_spark.catalog as cat

        specs = {s.name: s for s in cat.catalog()}
        want = self._naive()
        with tempfile.TemporaryDirectory() as td:
            _write_events(spark, td, self.ROWS)
            got = specs["flux_snapshot_cadence_sweep"].spark(
                spark, td
            ).collect()
        assert len(got) == len(want)
        for r in got:
            k, ir, sr, dr, rr, raw, sav, wx = want[(r.tablet_id, r.cadence)]
            assert (
                r.n_snapshots, r.index_rows, r.snap_rows, r.delta_rows,
                r.read_rows, r.raw_rows, r.read_savings_ppm,
                r.index_write_x100,
            ) == (k, ir, sr, dr, rr, raw, sav, wx), (r.tablet_id, r.cadence)

    def test_stream_twin_drains_equal(self, spark):
        """Drained standing counters finish to a table EQUAL to the
        batch sweep (shared finisher + shared oracle constant make the
        claim structural; this pins it end-to-end on real data — the
        streaming source needs the single-file sf layout)."""
        import fluxdb_spark.catalog as cat

        specs = {s.name: s for s in cat.catalog()}
        sf = "/root/testdata/sf0.001"
        batch = sorted(
            tuple(r)
            for r in specs["flux_snapshot_cadence_sweep"]
            .spark(spark, sf)
            .collect()
        )
        stream = sorted(
            tuple(r)
            for r in specs["stream_snapshot_cadence"]
            .spark(spark, sf)
            .collect()
        )
        assert stream == batch
        assert len(batch) > 0


class TestRetentionSweep:
    """flux_retention_sweep on a constructed log, verified against a
    model that ACTUALLY truncates each key's history to its newest N
    versions and counts the difference."""

    def test_matches_truncation_model(self, spark):
        import tempfile
        from collections import Counter

        import fluxdb_spark.catalog as cat

        rows, eid = [], 0
        # click: key 1 -> 5 versions, key 2 -> 2, key 3 -> 1
        for k, n in [(1, 5), (2, 2), (3, 1)]:
            for _ in range(n):
                rows.append((eid, k, "click", 50.0))
                eid += 1
        # view: key 4 -> 3 versions
        for _ in range(3):
            rows.append((eid, 4, "view", 60.0))
            eid += 1
        spec = {s.name: s for s in cat.catalog()}["flux_retention_sweep"]
        with tempfile.TemporaryDirectory() as td:
            _write_events(spark, td, rows)
            got = {
                (r.tablet_id, r.keep_n): r
                for r in spec.spark(spark, td).collect()
            }
        per = {"click": Counter({1: 5, 2: 2, 3: 1}), "view": Counter({4: 3})}
        for (t, n), r in got.items():
            nv = per[t]
            reclaimed = sum(max(c - n, 0) for c in nv.values())
            total = sum(nv.values())
            assert r.n_rows == total and r.n_keys == len(nv)
            assert r.reclaimed_rows == reclaimed, (t, n)
            assert r.survivor_rows == total - reclaimed
            assert r.reclaim_ppm == int(reclaimed * 1_000_000 / total)
        assert len(got) == 6  # 2 tablets x 3 policies
