"""General as-of join operator (operators/asof.py): strict/exact tie rules
and backward/forward directions against a naive local model, including
equal-timestamp adversarial cases."""

from __future__ import annotations

import pytest

from fluxdb_spark.operators.asof import asof_join

# (key, t, rv) right rows / (key, t) left rows — t ints for clarity
RIGHT = [("a", 1, 10.0), ("a", 3, 30.0), ("a", 3, 31.0), ("a", 7, 70.0),
         ("b", 5, 50.0)]
LEFT = [("a", 0), ("a", 3), ("a", 4), ("a", 9), ("b", 5), ("c", 2)]


def model(direction: str, exact: bool):
    out = {}
    for key, t in LEFT:
        cands = []
        for rk, rt, rv in RIGHT:
            if rk != key:
                continue
            if direction == "backward":
                ok = rt <= t if exact else rt < t
            else:
                ok = rt >= t if exact else rt > t
            if ok:
                cands.append((rt, rv))
        if not cands:
            out[(key, t)] = None
        elif direction == "backward":
            best_t = max(c[0] for c in cands)
            # operator picks the last row in (t, tiebreak) order
            out[(key, t)] = max(c for c in cands if c[0] == best_t)[1]
        else:
            best_t = min(c[0] for c in cands)
            # forward picks the FIRST row in (t, tiebreak) order
            out[(key, t)] = min(c for c in cands if c[0] == best_t)[1]
    return out


@pytest.fixture(scope="module")
def frames(spark):
    right = spark.createDataFrame(RIGHT, "k string, t long, rv double")
    left = spark.createDataFrame(LEFT, "k string, t long")
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("exact", [False, True])
def test_matches_model(frames, direction, exact):
    left, right = frames
    got = {
        (r.k, r.t): r.rv
        for r in asof_join(
            left,
            right,
            on=["k"],
            left_time="t",
            right_time="t",
            payload_cols=["rv"],
            direction=direction,
            allow_exact_matches=exact,
            tiebreak="rv",  # orders the two t=3 right rows deterministically
        ).collect()
    }
    assert got == model(direction, exact)


def test_preserves_left_row_count(frames):
    left, right = frames
    out = asof_join(left, right, ["k"], "t", "t", ["rv"])
    assert out.count() == len(LEFT)


def test_payload_collision_rejected(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], "t", "t", payload_cols=["t"])


def test_tolerance_nulls_stale_matches(spark):
    """merge_asof-style tolerance: a match further than the bound is
    nulled (payload entirely), an in-bound match survives, and the
    boundary gap is inclusive."""
    from fluxdb_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u", 100), ("u", 210), ("u", 305)], "k string, t long"
    )
    right = spark.createDataFrame(
        [("u", 95, "fresh"), ("u", 200, "boundary")],
        "k string, rt long, q string",
    )
    out = {
        r.t: r.q
        for r in asof_join(
            left, right, on=["k"], left_time="t", right_time="rt",
            payload_cols=["q"], tolerance=10,
        ).collect()
    }
    # 100-95=5 <= 10 keeps; 210-200=10 == bound keeps; 305-200=105 nulls
    assert out == {100: "fresh", 210: "boundary", 305: None}


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tol", [0, 2, 4, 100])
def test_tolerance_matches_pandas_merge_asof(spark, frames, direction, tol):
    """Tolerance semantics pinned against pandas.merge_asof — the de facto
    reference implementation — across both directions and bounds from
    degenerate (0) to unbounded-in-practice (100). Right times are
    deduplicated first (merge_asof needs a total order; the operator's
    tiebreak covers duplicates separately in test_matches_model)."""
    import pandas as pd

    left, right = frames
    r_dedup = right.orderBy("k", "t", "rv").dropDuplicates(["k", "t"])
    got = {
        (r.k, r.t): r.rv
        for r in asof_join(
            left, r_dedup, on=["k"], left_time="t", right_time="t",
            payload_cols=["rv"], direction=direction,
            allow_exact_matches=True, tolerance=tol,
        ).collect()
    }
    lp = pd.DataFrame(LEFT, columns=["k", "t"]).sort_values("t")
    rp = (
        pd.DataFrame(RIGHT, columns=["k", "t", "rv"])
        .sort_values(["t", "rv"])
        .drop_duplicates(["k", "t"], keep="first")
        .sort_values("t")
    )
    m = pd.merge_asof(
        lp, rp, on="t", by="k", direction=direction,
        allow_exact_matches=True, tolerance=tol,
    )
    want = {
        (row.k, row.t): (None if pd.isna(row.rv) else row.rv)
        for row in m.itertuples()
    }
    assert got == want


@pytest.mark.parametrize("exact", [False, True])
@pytest.mark.parametrize("tol", [None, 0, 2, 100])
def test_nearest_matches_pandas_merge_asof(spark, frames, exact, tol):
    """direction='nearest' pinned against pandas.merge_asof across
    exact-match handling and tolerance bounds: closest-by-absolute-gap
    wins, ties prefer the backward side, an exact-ts right row is
    excluded entirely when exact matches are disallowed (it must not
    re-enter through the forward frame at gap 0)."""
    import pandas as pd

    left, right = frames
    r_dedup = right.orderBy("k", "t", "rv").dropDuplicates(["k", "t"])
    got = {
        (r.k, r.t): r.rv
        for r in asof_join(
            left, r_dedup, on=["k"], left_time="t", right_time="t",
            payload_cols=["rv"], direction="nearest",
            allow_exact_matches=exact, tolerance=tol,
        ).collect()
    }
    lp = pd.DataFrame(LEFT, columns=["k", "t"]).sort_values("t")
    rp = (
        pd.DataFrame(RIGHT, columns=["k", "t", "rv"])
        .sort_values(["t", "rv"])
        .drop_duplicates(["k", "t"], keep="first")
        .sort_values("t")
    )
    m = pd.merge_asof(
        lp, rp, on="t", by="k", direction="nearest",
        allow_exact_matches=exact, tolerance=tol,
    )
    want = {
        (row.k, row.t): (None if pd.isna(row.rv) else row.rv)
        for row in m.itertuples()
    }
    assert got == want


def test_nearest_strict_does_not_shadow_next_candidate(spark):
    """Regression (caught by the randomized pandas pin): with exact
    matches disallowed, an equal-ts right row must not only be excluded
    itself — it must not SHADOW the genuine forward candidate behind it.
    Requires per-frame tie tagging; a shared tagging plus a gap-zero
    guard returns None here instead of the t=1 row."""
    left = spark.createDataFrame([("k1", 0)], "k string, t long")
    right = spark.createDataFrame(
        [("k1", 0, 1.0), ("k1", 1, 101.0)], "k string, t long, rv double"
    )
    got = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        payload_cols=["rv"], direction="nearest",
        allow_exact_matches=False,
    ).collect()
    assert [(r.k, r.t, r.rv) for r in got] == [("k1", 0, 101.0)]


@pytest.mark.parametrize("exact", [False, True])
def test_nearest_matches_model_with_duplicate_times(frames, exact):
    """Nearest against a naive model on the ADVERSARIAL table (duplicate
    right times at t=3) — merge_asof cannot model duplicates, so this
    pins the within-side tie rule: closest |gap| wins, backward beats
    forward on equal gaps, and within a side the frame's own rule picks
    (backward: largest (t, tiebreak); forward: smallest)."""
    left, right = frames
    got = {
        (r.k, r.t): r.rv
        for r in asof_join(
            left, right, on=["k"], left_time="t", right_time="t",
            payload_cols=["rv"], direction="nearest",
            allow_exact_matches=exact, tiebreak="rv",
        ).collect()
    }
    want = {}
    for key, t in LEFT:
        back = [
            (rt, rv) for rk, rt, rv in RIGHT
            if rk == key and (rt <= t if exact else rt < t)
        ]
        fwd = [
            (rt, rv) for rk, rt, rv in RIGHT
            if rk == key and (rt >= t if exact else rt > t)
        ]
        b = max(back) if back else None          # largest (t, tiebreak)
        f = min(fwd) if fwd else None            # smallest (t, tiebreak)
        if b is None and f is None:
            want[(key, t)] = None
        elif b is None:
            want[(key, t)] = f[1]
        elif f is None:
            want[(key, t)] = b[1]
        else:
            bgap, fgap = t - b[0], f[0] - t
            want[(key, t)] = f[1] if fgap < bgap else b[1]
    assert got == want
