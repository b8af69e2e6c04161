"""Temporal read operators (reference read.go — R1..R7 in SURVEY.md §2.1).

All operators are pure DataFrame -> DataFrame plans:

- equality/range predicates on (collection, tablet_id, height) sit at the top
  of the plan so Catalyst pushes them into the parquet scan (partition
  pruning + min/max skipping replace the reference's key-range scans);
- "latest version per key" uses `max_by(struct(...), ord)` aggregation, not a
  row_number window: aggregation gets map-side partial combine, so at 100 TB
  the shuffle carries one row per (tablet, pk) per partition instead of the
  full version history. `strategy="window"` keeps the window formulation for
  cross-checking the two plans against each other;
- the speculative overlay (reference read.go:155-169: in-memory fork writes
  win over durable rows at the same height) is a `unionByName` with a source
  precedence column folded into the same max_by ordering.

Semantics pinned by the reference tests (read_test.go:29-388) and re-asserted
in tests/test_temporal.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fluxdb_spark.schema import CHANGELOG_COLUMNS

def _ord():
    # Ordering: higher height wins; at equal height, speculative (overlay)
    # wins (the reference applies speculative writes after durable rows,
    # read.go:155-169).
    return F.struct(F.col("height").alias("h"), F.col("_src").alias("s"))


def _tag(df: DataFrame, src: int) -> DataFrame:
    return df.select(*CHANGELOG_COLUMNS).withColumn("_src", F.lit(src))


def _scoped(
    changelog: DataFrame,
    tablet_id: str,
    height: int | None,
    speculative: DataFrame | None,
    collection: str | None,
) -> DataFrame:
    """Filtered union of durable + speculative rows for one tablet."""
    df = changelog.filter(F.col("tablet_id") == tablet_id)
    if collection is not None:
        df = df.filter(F.col("collection") == collection)
    out = _tag(df, 0)
    if speculative is not None:
        sp = speculative.filter(F.col("tablet_id") == tablet_id)
        if collection is not None:
            sp = sp.filter(F.col("collection") == collection)
        out = out.unionByName(_tag(sp, 1))
    if height is not None:
        out = out.filter(F.col("height") <= F.lit(height))
    return out


def _latest_per_key(df: DataFrame, strategy: str = "agg") -> DataFrame:
    """One row per primary_key: the highest-(height, _src) version."""
    if strategy == "window":
        w = Window.partitionBy("primary_key").orderBy(
            F.desc("height"), F.desc("_src")
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    # Default: aggregation — benefits from map-side partial combine, which a
    # row_number window never gets. At scale this is the difference between
    # shuffling the full history and shuffling ~|live keys| rows.
    payload = F.struct(*[F.col(c) for c in CHANGELOG_COLUMNS], F.col("_src"))
    agg = df.groupBy("primary_key").agg(
        F.max_by(payload, _ord()).alias("_row")
    )
    return agg.select(
        *[F.col(f"_row.{c}").alias(c) for c in CHANGELOG_COLUMNS],
        F.col("_row._src").alias("_src"),
    )


def state_at(
    changelog: DataFrame,
    tablet_id: str,
    height: int,
    speculative: DataFrame | None = None,
    collection: str | None = None,
    strategy: str = "agg",
) -> DataFrame:
    """R1 — full tablet snapshot as of `height` (reference ReadTabletAt,
    read.go:35-178).

    Last-write-wins per primary_key up to `height`, tombstones removed,
    speculative rows overlaid, result ordered by primary_key
    (read.go:173-174).
    """
    scoped = _scoped(changelog, tablet_id, height, speculative, collection)
    latest = _latest_per_key(scoped, strategy)
    return (
        latest.filter(~F.col("is_deletion"))
        .select(*CHANGELOG_COLUMNS)
        .orderBy("primary_key")
    )


def row_at(
    changelog: DataFrame,
    tablet_id: str,
    height: int,
    primary_key: str,
    speculative: DataFrame | None = None,
    collection: str | None = None,
) -> DataFrame:
    """R2 — single row as of `height` (reference ReadTabletRowAt,
    read.go:180-293). The pk equality predicate is part of the plan, so it
    reaches the scan; empty result if the latest version is a tombstone."""
    scoped = _scoped(changelog, tablet_id, height, speculative, collection).filter(
        F.col("primary_key") == primary_key
    )
    # Single key: ORDER BY ... LIMIT 1 compiles to TakeOrderedAndProject —
    # no full sort, no window state.
    latest = scoped.orderBy(F.desc("height"), F.desc("_src")).limit(1)
    return latest.filter(~F.col("is_deletion")).select(*CHANGELOG_COLUMNS)


def singlet_at(
    changelog: DataFrame,
    singlet_id: str,
    height: int,
    speculative: DataFrame | None = None,
    collection: str | None = None,
) -> DataFrame:
    """R3 — latest value <= height for a single-valued container (reference
    ReadSingletEntryAt, read.go:300-349). The reference's reversed-height key
    trick becomes ORDER BY height DESC LIMIT 1 (TakeOrdered, early-out)."""
    scoped = _scoped(changelog, singlet_id, height, speculative, collection)
    latest = scoped.orderBy(F.desc("height"), F.desc("_src")).limit(1)
    return latest.filter(~F.col("is_deletion")).select(*CHANGELOG_COLUMNS)


def singlet_history(
    changelog: DataFrame,
    singlet_id: str,
    speculative: DataFrame | None = None,
    collection: str | None = None,
) -> DataFrame:
    """R4 — full version history, newest first, speculative entries first
    (reference ReadSingletEntries, read.go:356-408; ordering fix noted in its
    CHANGELOG)."""
    scoped = _scoped(changelog, singlet_id, None, speculative, collection)
    return scoped.orderBy(F.desc("_src"), F.desc("height")).select(
        *CHANGELOG_COLUMNS
    )


def has_rows(
    changelog: DataFrame, tablet_id: str, collection: str | None = None
) -> bool:
    """R5 — existence probe (reference HasSeenAnyRowForTablet,
    read.go:410-415): LIMIT 1 plan, early-terminating like the reference's
    BreakScan."""
    df = changelog.filter(F.col("tablet_id") == tablet_id)
    if collection is not None:
        df = df.filter(F.col("collection") == collection)
    return df.select("tablet_id").limit(1).count() > 0


def latest_checkpoint(changelog: DataFrame) -> DataFrame:
    """R6 — last written (height, block) marker derived from the log itself
    (reference FetchLastWrittenCheckpoint, read.go:417-437). With a real
    store the `_checkpoint` table is used instead (store.py)."""
    return changelog.agg(
        F.max("height").alias("height"),
        F.max_by("block_id", F.col("height")).alias("block_id"),
        F.max("block_num").alias("block_num"),
    )


def state_diff(
    changelog: DataFrame,
    tablet_id: str,
    from_height: int,
    to_height: int,
    collection: str | None = None,
) -> DataFrame:
    """Beyond-reference temporal operator: which keys changed between two
    snapshot heights, and how.

    A full-outer join of the two snapshots on primary_key, classified into
    added / deleted / updated (value change). Both snapshots share one scan
    of the change-log (the filter differs only in the height bound, so the
    source scan is read once per side but prunes identically); output is one
    row per changed key.
    """
    before = state_at(changelog, tablet_id, from_height, collection=collection)
    after = state_at(changelog, tablet_id, to_height, collection=collection)
    b = before.select(
        F.col("primary_key"),
        F.col("value").alias("old_value"),
        F.col("height").alias("old_height"),
    )
    a = after.select(
        F.col("primary_key"),
        F.col("value").alias("new_value"),
        F.col("height").alias("new_height"),
    )
    joined = b.join(a, on="primary_key", how="full_outer")
    change = (
        F.when(F.col("old_height").isNull(), F.lit("added"))
        .when(F.col("new_height").isNull(), F.lit("deleted"))
        .otherwise(F.lit("updated"))
    )
    return (
        joined.withColumn("change", change)
        .filter(
            F.col("old_height").isNull()
            | F.col("new_height").isNull()
            | (F.col("old_height") != F.col("new_height"))
        )
        .select(
            "primary_key", "change", "old_value", "new_value",
            "old_height", "new_height",
        )
        .orderBy("primary_key")
    )


def collection_state_at(
    changelog: DataFrame,
    height: int,
    collection: str = "evt",
    speculative: DataFrame | None = None,
) -> DataFrame:
    """Whole-collection snapshot at `height`: last-write-wins per
    (tablet_id, primary_key) across EVERY tablet, tombstones removed —
    the bulk-export read (state dump at a block height) the reference
    serves one ReadTabletAt call per tablet for (read.go:35-178); one
    grouped aggregation serves all tablets in a single shuffle here.

    Same map-side-combine shape as `state_at`, keyed on the compound key:
    at 100 TB the shuffle carries one row per live (tablet, pk) per map
    partition, not the version history."""
    df = changelog.filter(F.col("collection") == collection)
    out = _tag(df, 0)
    if speculative is not None:
        sp = speculative.filter(F.col("collection") == collection)
        out = out.unionByName(_tag(sp, 1))
    out = out.filter(F.col("height") <= F.lit(height))
    payload = F.struct(*[F.col(c) for c in CHANGELOG_COLUMNS], F.col("_src"))
    agg = out.groupBy("tablet_id", "primary_key").agg(
        F.max_by(payload, _ord()).alias("_row")
    )
    return (
        agg.select(*[F.col(f"_row.{c}").alias(c) for c in CHANGELOG_COLUMNS])
        .filter(~F.col("is_deletion"))
        .orderBy("tablet_id", "primary_key")
    )


def state_series(
    changelog: DataFrame,
    tablet_id: str,
    start: int,
    stop: int,
    step: int,
    collection: str | None = None,
    ordered: bool = True,
) -> DataFrame:
    """Snapshot TIME SERIES: the tablet's full state at every grid height
    start, start+step, ..., stop — in ONE scan of the changelog.

    The reference answers this with one ReadTabletAt per grid point
    (read.go:35-178, N independent index+scan+merge passes); the naive
    Spark translation is N `state_at` calls = N shuffles of the same
    history. This computes instead, per VERSION, the half-open interval
    it is live for — [height, next version's height) — intersects it
    with the grid, and explodes the covered grid points: one per-key
    window (the single shuffle) plus a map-side explode bounded by
    versions x grid-points-covered. Tombstone versions emit nothing but
    still truncate their predecessor's interval, so deletions drop the
    key from later grid points exactly as N separate reads would.

    Returns (as_of_height, primary_key, height, value): for each grid
    height, the live keys with the version that was current there.
    """
    df = changelog
    if collection is not None:
        df = df.filter(F.col("collection") == collection)
    df = df.filter(
        (F.col("tablet_id") == tablet_id) & (F.col("height") <= F.lit(stop))
    )
    w = Window.partitionBy("primary_key").orderBy("height")
    v = df.withColumn(
        "_next_h", F.lead("height", 1, stop + 1).over(w)
    ).filter(~F.col("is_deletion"))
    # grid points covered by [height, _next_h): integer arithmetic only,
    # so Spark and the DuckDB oracle agree bit-for-bit
    v = v.withColumn(
        "_g_lo",
        F.expr(
            f"{start} + CAST((greatest(height - {start}, 0) + {step - 1}) "
            f"DIV {step} AS BIGINT) * {step}"
        ),
    ).withColumn("_g_hi", F.least(F.col("_next_h") - 1, F.lit(stop)))
    out = (
        v.filter(F.col("_g_lo") <= F.col("_g_hi"))
        .select(
            F.explode(
                F.sequence("_g_lo", "_g_hi", F.lit(step))
            ).alias("as_of_height"),
            "primary_key",
            "height",
            "value",
        )
    )
    # ordered=False keeps the per-key hash partitioning for composers
    # (series_anomalies' stats window, series_similarity's groupBy): the
    # presentation sort is a range-partitioning Exchange that would force
    # the downstream operator to reshuffle what is already co-located.
    return out.orderBy("as_of_height", "primary_key") if ordered else out


def time_weighted_avg(
    changelog: DataFrame,
    tablet_id: str,
    start: int,
    stop: int,
    metric: Column,
    collection: str | None = None,
) -> DataFrame:
    """Duration-weighted temporal aggregate (TWA) — "the average value
    over the period", weighting each VERSION by how long it was live:
    for every version, weight = the number of heights in [start, stop]
    during which it was the current value ([height, next version) ∩
    [start, stop]); tombstone intervals contribute nothing, so a deleted
    key simply has no weight while absent.

    The reference can only answer this by walking every version
    client-side; here it is the same single-scan interval construction
    as `state_series` — one per-key window (the only shuffle) and a
    combine-friendly grouped aggregation, so a 100 TB history costs one
    pass regardless of the period length.

    Returns (primary_key, live_heights, twa): total heights the key was
    live in the window, and the duration-weighted mean of `metric`.
    """
    df = changelog
    if collection is not None:
        df = df.filter(F.col("collection") == collection)
    df = df.filter(
        (F.col("tablet_id") == tablet_id) & (F.col("height") <= F.lit(stop))
    )
    w = Window.partitionBy("primary_key").orderBy("height")
    v = (
        df.withColumn("_next_h", F.lead("height", 1, stop + 1).over(w))
        .filter(~F.col("is_deletion"))
        .withColumn("_lo", F.greatest(F.col("height"), F.lit(start)))
        .withColumn("_hi", F.least(F.col("_next_h") - 1, F.lit(stop)))
        .withColumn("_w", F.col("_hi") - F.col("_lo") + 1)
        .filter(F.col("_w") > 0)
        .withColumn("_x", metric)
    )
    return (
        v.groupBy("primary_key")
        .agg(
            F.sum("_w").cast("long").alias("live_heights"),
            (
                F.floor(
                    F.sum(F.col("_w") * F.col("_x")) / F.sum("_w") * 10000
                )
                / 10000
            ).alias("twa"),
        )
        .orderBy("primary_key")
    )


def series_similarity(
    changelog: DataFrame,
    tablet_id: str,
    probe_key: str,
    start: int,
    stop: int,
    step: int,
    k: int = 10,
    metric_json_field: str = "k",
    min_common: int = 2,
    collection: str | None = None,
) -> DataFrame:
    """Series-similarity search over STATE HISTORIES: which keys' value
    trajectories evolved most like the probe key's? The temporal engine
    meets the similarity family — a read the reference cannot express at
    all (it would need N ReadTabletAt passes plus a client-side join per
    candidate key).

    Built on `state_series`' one-scan interval construction: the grid
    relation (as_of_height, key, metric) comes from a single per-key
    window + map-side explode; the probe's series (<= n_grid rows)
    broadcasts; the distance is a sum of squared INTEGER differences
    over the grid points where both keys are live (n_common tracks the
    overlap, keys below `min_common` are dropped as incomparable) — so
    ranking is exact, engine-portable arithmetic end to end. One
    combine-friendly groupBy(key) after the broadcast join; top-k by
    (distance asc, key asc) via TakeOrdered-size window.

    Returns (primary_key, n_common, dist, rank).
    """
    grid = state_series(
        changelog, tablet_id, start, stop, step, collection=collection,
        ordered=False,
    ).select(
        "as_of_height",
        "primary_key",
        F.get_json_object("value", f"$.{metric_json_field}")
        .cast("long")
        .alias("x"),
    )
    probe = grid.filter(F.col("primary_key") == probe_key).select(
        F.col("as_of_height"), F.col("x").alias("px")
    )
    d = F.col("x") - F.col("px")
    scored = (
        grid.filter(F.col("primary_key") != probe_key)
        .join(F.broadcast(probe), "as_of_height")
        .groupBy("primary_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum(d * d).cast("long").alias("dist"),
        )
        .filter(F.col("n_common") >= min_common)
    )
    w = Window.orderBy(F.asc("dist"), F.asc("primary_key"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("primary_key", "n_common", "dist", "rank")
    )


def state_join(
    changelog: DataFrame,
    tablets: list[str],
    height: int,
    how: str = "inner",
    speculative: DataFrame | None = None,
    collection: str | None = None,
) -> DataFrame:
    """Cross-tablet state JOIN at one height: for each primary_key, the
    live value of EVERY requested tablet as of `height`, side by side.

    The reference reads tablets singly (ReadTabletAt, read.go:35-178) and
    leaves cross-tablet enrichment to the client; the naive Spark
    translation is |tablets| snapshot aggregations plus an equi-join.
    This is ONE grouped aggregation instead: the scan is filtered to the
    requested tablets, and per primary_key a conditional max_by folds
    each tablet's latest version inside the same shuffle — no join
    operator anywhere in the plan. At 100 TB that is one pass over the
    pruned history and a shuffle of ~|live keys| rows after map-side
    combine, versus 2N shuffles + a shuffle join for the naive form.

    `how="inner"` keeps keys live in every tablet, `how="outer"` keys
    live in any (the others null). A tombstone latest version counts as
    absent. Output: primary_key, then `{t}_height`, `{t}_value` per
    tablet.
    """
    if how not in ("inner", "outer"):
        raise ValueError(f"how must be inner|outer: {how}")
    if len(tablets) < 2 or len(set(tablets)) != len(tablets):
        raise ValueError(f"need >= 2 distinct tablets: {tablets}")
    df = changelog.filter(F.col("tablet_id").isin(tablets))
    if collection is not None:
        df = df.filter(F.col("collection") == collection)
    out = _tag(df, 0)
    if speculative is not None:
        sp = speculative.filter(F.col("tablet_id").isin(tablets))
        if collection is not None:
            sp = sp.filter(F.col("collection") == collection)
        out = out.unionByName(_tag(sp, 1))
    out = out.filter(F.col("height") <= F.lit(height))
    # One conditional max_by per tablet: the ordering expression is NULL
    # for other tablets' rows and max_by skips null-ordered rows, so all
    # folds ride the same partial-aggregate shuffle.
    payload = F.struct(
        F.col("height"), F.col("value"), F.col("is_deletion")
    )
    agg = out.groupBy("primary_key").agg(
        *[
            F.max_by(
                payload, F.when(F.col("tablet_id") == t, _ord())
            ).alias(f"_s_{i}")
            for i in range(len(tablets))
            for t in [tablets[i]]
        ]
    )
    live = [
        F.col(f"_s_{i}").isNotNull() & ~F.col(f"_s_{i}.is_deletion")
        for i in range(len(tablets))
    ]
    keep = live[0]
    for c in live[1:]:
        keep = (keep & c) if how == "inner" else (keep | c)
    cols: list[Column] = [F.col("primary_key")]
    for i, t in enumerate(tablets):
        cols.append(F.when(live[i], F.col(f"_s_{i}.height")).alias(f"{t}_height"))
        cols.append(F.when(live[i], F.col(f"_s_{i}.value")).alias(f"{t}_value"))
    return agg.filter(keep).select(*cols).orderBy("primary_key")


def series_anomalies(
    changelog: DataFrame,
    tablet_id: str,
    start: int,
    stop: int,
    step: int,
    k_sigma: int = 2,
    metric_json_field: str = "k",
    min_points: int = 3,
    collection: str | None = None,
) -> DataFrame:
    """Anomalous grid points in every key's own state history: flag
    (key, as_of_height) where the metric deviates more than k_sigma
    standard deviations from that key's series mean — temporal
    monitoring over the same one-scan grid as `state_series`.

    Exactness: |x - mean| > k*sigma is evaluated as the EQUIVALENT
    integer inequality (n*x - sum)^2 > k^2 * (n*sumsq - sum^2) — both
    sides exact int64 (multiply through by n^2), so there is no sqrt,
    no float accumulation, and the flag set is bit-identical on any
    engine and any partitioning. Keys with fewer than `min_points`
    grid points are skipped (a 1-point series has zero variance and
    everything would pass).

    Scale shape: one per-key window shuffle builds the grid
    (state_series) and a second analytic window over the same
    partitioning computes (n, sum, sumsq) — Catalyst reuses the
    partitioning, so the history shuffles once; the flag itself is
    map-side arithmetic.
    """
    grid = state_series(
        changelog, tablet_id, start, stop, step, collection=collection,
        ordered=False,
    ).select(
        "as_of_height",
        "primary_key",
        F.get_json_object("value", f"$.{metric_json_field}")
        .cast("long")
        .alias("x"),
    )
    w = Window.partitionBy("primary_key")
    stats = grid.select(
        "primary_key",
        "as_of_height",
        "x",
        F.count(F.lit(1)).over(w).cast("long").alias("n_points"),
        F.sum("x").over(w).cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("long").alias("ss"),
    )
    dev = F.col("n_points") * F.col("x") - F.col("s")
    lhs = dev * dev
    rhs = F.lit(int(k_sigma * k_sigma)) * (
        F.col("n_points") * F.col("ss") - F.col("s") * F.col("s")
    )
    return (
        stats.filter(
            (F.col("n_points") >= min_points) & (lhs > rhs)
        )
        .select(
            "primary_key",
            "as_of_height",
            "x",
            "n_points",
            lhs.alias("dev_sq_n2"),
            rhs.alias("var_bound_n2"),
        )
    )


def series_ewma(
    changelog: DataFrame,
    tablet_id: str,
    start: int,
    stop: int,
    step: int,
    metric_json_field: str = "k",
    weights: tuple[int, ...] = (8, 4, 2, 1),
    collection: str | None = None,
) -> DataFrame:
    """Exponentially-weighted moving average over STATE HISTORIES: the
    smoothing read the anomaly detector's complement — `series_anomalies`
    flags spikes, this yields the denoised trajectory a dashboard or a
    downstream forecast consumes.

    Built on `state_series`' one-scan grid (per version, its live grid
    interval exploded — never one read per grid point, the shape the
    reference would be forced into via N ReadTabletAt passes,
    read.go:35-178). The EWMA is the bounded-horizon, power-of-two form:
    weights (8,4,2,1) over the key's last 4 OBSERVED grid points (decay
    1/2 per step), renormalized over the points that exist — so the
    numerator and denominator are exact INTEGER sums (no float decay
    chain), the single rounding happens at the final division, and the
    result is engine-portable bit-for-bit. Row-lag semantics: "previous"
    means the key's previous live grid point; gaps (key absent at a grid
    height) do not contribute zeros, they just aren't in the window.

    One per-key window shuffle for the grid + one for the lags (same
    partitioning: Catalyst reuses the exchange). Returns
    (primary_key, as_of_height, x, ewma).
    """
    grid = state_series(
        changelog, tablet_id, start, stop, step, collection=collection,
        ordered=False,
    ).select(
        "as_of_height",
        "primary_key",
        F.get_json_object("value", f"$.{metric_json_field}")
        .cast("long")
        .alias("x"),
    )
    w = Window.partitionBy("primary_key").orderBy("as_of_height")
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for lag, wt in enumerate(weights):
        xl = F.lag("x", lag).over(w) if lag else F.col("x")
        num = num + F.coalesce(xl * wt, F.lit(0))
        den = den + F.when(xl.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
    # den = 0 <=> every point in the window is NULL (metric key absent
    # from the JSON): emit NULL, not an ANSI DIVIDE_BY_ZERO.  The oracle
    # twin spells the same CASE WHEN den = 0 guard.
    return grid.select(
        "primary_key",
        "as_of_height",
        "x",
        F.when(den > 0, F.round(num / den, 4)).alias("ewma"),
    )


def series_backtest(
    changelog: DataFrame,
    tablet_id: str,
    start: int,
    stop: int,
    step: int,
    metric_json_field: str = "k",
    collection: str | None = None,
) -> DataFrame:
    """One-step-ahead FORECAST BACKTEST over state histories: at every
    grid point where a key has two prior observations, score the two
    standard zero-parameter forecasters made from the PREVIOUS point —
    naive (y-hat = y1) and drift (y-hat = 2*y1 - y2, last value plus
    last step) — against the realized value.  The read that tells an
    operator whether trend-following beats last-value on THEIR data
    before anyone wires a fancier model: if drift_vs_naive_ppm < 1e6,
    the trajectories reward extrapolation; above it they mean-revert
    and naive wins (the classic M-competition result).

    Exact integers end to end: absolute errors are BIGINT, only the
    final ppm ratio divides (NULL when a key's naive error sum is 0 —
    constant series, nothing to beat).  One state_series grid scan; the
    two lags ride the grid's per-key partitioning (one shuffle serves
    both, the `series_ewma` pattern).  Returns (primary_key, n_evals,
    naive_abs_err, drift_abs_err, drift_vs_naive_ppm)."""
    grid = state_series(
        changelog, tablet_id, start, stop, step, collection=collection,
        ordered=False,
    ).select(
        "as_of_height",
        "primary_key",
        F.get_json_object("value", f"$.{metric_json_field}")
        .cast("long")
        .alias("y"),
    )
    w = Window.partitionBy("primary_key").orderBy("as_of_height")
    lagged = grid.select(
        "primary_key",
        "y",
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", 2).over(w).alias("y2"),
    ).filter(
        F.col("y").isNotNull()
        & F.col("y1").isNotNull()
        & F.col("y2").isNotNull()
    )
    per_key = lagged.groupBy("primary_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_evals"),
        F.sum(F.abs(F.col("y") - F.col("y1")))
        .cast("long")
        .alias("naive_abs_err"),
        F.sum(F.abs(F.col("y") - (2 * F.col("y1") - F.col("y2"))))
        .cast("long")
        .alias("drift_abs_err"),
    )
    return per_key.select(
        "primary_key",
        "n_evals",
        "naive_abs_err",
        "drift_abs_err",
        F.expr(
            "CASE WHEN naive_abs_err = 0 THEN NULL"
            " ELSE (drift_abs_err * 1000000) div naive_abs_err END"
        ).alias("drift_vs_naive_ppm"),
    )
