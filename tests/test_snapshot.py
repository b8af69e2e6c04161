"""Snapshot index build / indexed read / cadence thresholds.

Threshold matrix mirrors the reference's indexing tests (indexing_test.go:
79-218); indexed-read equivalence is the property the reference guarantees
by construction (read.go:47-142)."""

from __future__ import annotations

import pytest

from fluxdb_spark.operators.snapshot import (
    IndexScheduler,
    build_tablet_index,
    prune_indexes,
    should_index,
    state_at_with_index,
)
from fluxdb_spark.operators import state_at


def mk_log(spark, rows):
    from tests.conftest import make_changelog

    return make_changelog(spark, rows)


LOG_ROWS = [
    ("tst", "tbl", 1, "a", "a1"),
    ("tst", "tbl", 2, "b", "b2"),
    ("tst", "tbl", 3, "a", "a3"),
    ("tst", "tbl", 4, "c", "c4"),
    ("tst", "tbl", 5, "b", ""),  # tombstone
    ("tst", "tbl", 6, "d", "d6"),
    ("tst", "tbl", 7, "a", "a7"),
]


class TestIndexBuild:
    def test_full_build(self, spark):
        log = mk_log(spark, LOG_ROWS)
        idx = build_tablet_index(log, "tbl", 5, collection="tst")
        got = sorted((r.primary_key, r.height) for r in idx.collect())
        # live at h=5: a@3, c@4 (b deleted at 5)
        assert got == [("a", 3), ("c", 4)]
        assert idx.first().squelch_count == 5

    def test_incremental_build_equals_full(self, spark):
        log = mk_log(spark, LOG_ROWS)
        idx5 = build_tablet_index(log, "tbl", 5, collection="tst")
        inc = build_tablet_index(
            log, "tbl", 7, collection="tst", prev_index=idx5, prev_height=5
        )
        full = build_tablet_index(log, "tbl", 7, collection="tst")
        assert sorted((r.primary_key, r.height) for r in inc.collect()) == sorted(
            (r.primary_key, r.height) for r in full.collect()
        )

    def test_indexed_read_equals_plain_read(self, spark):
        log = mk_log(spark, LOG_ROWS)
        idx = build_tablet_index(log, "tbl", 4, collection="tst")
        via_idx = state_at_with_index(log, idx, "tbl", 7, collection="tst")
        plain = state_at(log, "tbl", 7, collection="tst")
        assert sorted(
            (r.primary_key, r.height, r.value) for r in via_idx.collect()
        ) == sorted((r.primary_key, r.height, r.value) for r in plain.collect())

    def test_indexed_read_sees_delta_delete(self, spark):
        rows = LOG_ROWS + [("tst", "tbl", 8, "a", "")]
        log = mk_log(spark, rows)
        idx = build_tablet_index(log, "tbl", 5, collection="tst")
        got = sorted(
            (r.primary_key, r.height)
            for r in state_at_with_index(log, idx, "tbl", 8, collection="tst").collect()
        )
        assert got == [("c", 4), ("d", 6)]

    def _multi_snapshot_index(self, spark, log):
        """Stored-form index: several snapshot heights in one relation."""
        idx = build_tablet_index(log, "tbl", 2, collection="tst")
        for h in (5, 7):
            idx = idx.unionByName(
                build_tablet_index(log, "tbl", h, collection="tst")
            )
        return idx

    def test_multi_snapshot_no_resurrection(self, spark):
        # b is live in the h=2 snapshot but tombstoned at 5: a read at 6
        # over the MULTI-snapshot relation must use only the h=5 snapshot,
        # not resurrect b@2 from the older one.
        log = mk_log(spark, LOG_ROWS)
        idx = self._multi_snapshot_index(spark, log)
        got = sorted(
            (r.primary_key, r.height)
            for r in state_at_with_index(
                log, idx, "tbl", 6, collection="tst"
            ).collect()
        )
        plain = sorted(
            (r.primary_key, r.height)
            for r in state_at(log, "tbl", 6, collection="tst").collect()
        )
        assert got == plain == [("a", 3), ("c", 4), ("d", 6)]

    def test_snapshot_above_read_height_ignored(self, spark):
        # Read at 3 with snapshots at 2/5/7 available: only h=2 is eligible;
        # the h=5/7 snapshots must not leak versions newer than the read.
        log = mk_log(spark, LOG_ROWS)
        idx = self._multi_snapshot_index(spark, log)
        got = sorted(
            (r.primary_key, r.height)
            for r in state_at_with_index(
                log, idx, "tbl", 3, collection="tst"
            ).collect()
        )
        plain = sorted(
            (r.primary_key, r.height)
            for r in state_at(log, "tbl", 3, collection="tst").collect()
        )
        assert got == plain == [("a", 3), ("b", 2)]

    def test_ignore_range_falls_back_to_older_snapshot(self, spark):
        # I7 (reference indexing.go:304-327): snapshots inside the corrupt
        # range [4, 6] are skipped; the read at 7 falls back to the h=2
        # snapshot and still matches the plain fold.
        log = mk_log(spark, LOG_ROWS)
        idx = self._multi_snapshot_index(spark, log)
        got = sorted(
            (r.primary_key, r.height)
            for r in state_at_with_index(
                log, idx, "tbl", 7, collection="tst", ignore_range=(4, 6)
            ).collect()
        )
        plain = sorted(
            (r.primary_key, r.height)
            for r in state_at(log, "tbl", 7, collection="tst").collect()
        )
        assert got == plain

    def test_ignore_range_covering_all_degrades_to_full_scan(self, spark):
        log = mk_log(spark, LOG_ROWS)
        idx = self._multi_snapshot_index(spark, log)
        got = sorted(
            (r.primary_key, r.height)
            for r in state_at_with_index(
                log, idx, "tbl", 7, collection="tst", ignore_range=(0, 100)
            ).collect()
        )
        plain = sorted(
            (r.primary_key, r.height)
            for r in state_at(log, "tbl", 7, collection="tst").collect()
        )
        assert got == plain


class TestShouldIndex:
    # reference indexing_test.go:79-218 matrix
    @pytest.mark.parametrize(
        "mutations,prev_rows,expect",
        [
            (0, None, False),
            (24_999, None, False),
            (25_000, None, True),
            (25_000, 1_000, True),       # small prev index
            (25_000, 50_000, True),      # boundary: <=50K rows -> index
            (25_000, 50_001, False),     # big table: need > rows/2
            (25_001, 50_001, True),      # just above half (50_001//2=25_000)
            (60_000, 100_000, True),     # > half of 100K
            (50_000, 100_000, False),    # = half, needs strictly greater
            (99_999, 200_001, False),    # rows/2 = 100_000: needs > half
            (100_000, 200_001, False),   # exactly half — strictly-greater
            (100_001, 200_001, True),
            (100_000, 200_002, True),    # half > 100K: cap kicks in (>=100K)
            (99_999, 200_002, False),
            (100_000, 1_000_000, True),
        ],
    )
    def test_matrix(self, mutations, prev_rows, expect):
        assert should_index(mutations, prev_rows) is expect

    def test_scheduler_flow(self):
        s = IndexScheduler()
        s.record_mutations("tbl", 10_000, height=10)
        assert s.pop_scheduled() == {}
        s.record_mutations("tbl", 20_000, height=20)  # cumulative 30K
        assert s.pop_scheduled() == {"tbl": 20}
        s.mark_indexed("tbl", index_rows=60_000)
        s.record_mutations("tbl", 26_000, height=30)  # 26K < 30K half
        assert s.pop_scheduled() == {}
        s.record_mutations("tbl", 10_000, height=40)  # 36K > 30K half
        assert s.pop_scheduled() == {"tbl": 40}


class TestPrune:
    def test_keeps_first_last_and_every_nth(self, spark):
        import itertools

        rows = [
            ("tst", "tbl", h, "a", f"v{h}") for h in range(1, 8)
        ]
        log = mk_log(spark, rows)
        parts = [
            build_tablet_index(log, "tbl", h, collection="tst")
            for h in range(1, 8)
        ]
        idx = parts[0]
        for p in parts[1:]:
            idx = idx.unionByName(p)
        kept = prune_indexes(idx, prune_frequency=3)
        heights = sorted(
            r.snapshot_height
            for r in kept.select("snapshot_height").distinct().collect()
        )
        # reference semantics (indexing.go:366-381): keep oldest (1) and
        # newest (7); middles desc [6,5,4,3,2] at positions 1..5, delete
        # every 3rd position -> h=4 only
        assert heights == [1, 2, 3, 5, 6, 7]

    def test_small_tablet_untouched(self, spark):
        rows = [("tst", "tbl", h, "a", f"v{h}") for h in range(1, 6)]
        log = mk_log(spark, rows)
        idx = build_tablet_index(log, "tbl", 1, collection="tst")
        for h in range(2, 6):
            idx = idx.unionByName(
                build_tablet_index(log, "tbl", h, collection="tst")
            )
        # 5 snapshots <= prune_frequency + 2 -> nothing to do
        kept = prune_indexes(idx, prune_frequency=3)
        assert kept.select("snapshot_height").distinct().count() == 5

    def test_rejects_frequency_one(self, spark):
        import pytest as _pytest

        rows = [("tst", "tbl", 1, "a", "v1")]
        idx = build_tablet_index(mk_log(spark, rows), "tbl", 1, collection="tst")
        with _pytest.raises(ValueError):
            prune_indexes(idx, prune_frequency=1)
