"""Physical-plan invariants: the properties that make the operators hold up
at 100 TB, asserted on `.explain("formatted")` output so a regression that
silently de-optimizes a plan (lost pushdown, lost broadcast, Python in a hot
path) fails CI rather than only showing up as a slow cluster.

What is asserted and why it matters at scale:

- PushedFilters reaching the parquet scan => row-group skipping does the
  pruning, not Spark;
- ReadSchema pruned to used columns => a 100-TB scan reads only the bytes
  the query needs;
- BroadcastHashJoin on dimension joins => no shuffle of the fact table
  against small sides;
- no BatchEvalPython / ArrowEvalPython in expression-only operators => the
  hot path stays in whole-stage codegen.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from fluxdb_spark.catalog import catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def specs():
    return {s.name: s for s in catalog()}


def plan_of(spark, specs, name: str) -> str:
    df = specs[name].spark(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestPushdownAndPruning:
    def test_q6_predicates_reach_scan(self, spark, specs):
        p = plan_of(spark, specs, "tpch_q6")
        pushed = [l for l in p.splitlines() if "PushedFilters" in l]
        assert pushed and "l_shipdate" in pushed[0]
        assert "GreaterThanOrEqual(l_discount,0.05)" in pushed[0]

    def test_q6_column_pruning(self, spark, specs):
        p = plan_of(spark, specs, "tpch_q6")
        read = [l for l in p.splitlines() if "ReadSchema" in l][0]
        assert "l_extendedprice" in read
        # untouched wide columns must NOT be read
        assert "l_returnflag" not in read and "l_orderkey" not in read

    def test_q17_semi_join_prefilters_aggregate(self, spark, specs):
        """Q17's per-part average must aggregate only lineitem rows whose
        part survives the brand/size filter (VERDICT r13 task 3): the
        plan must contain a broadcast LeftSemi join BELOW the partial
        aggregate, so at 100x the groupBy's input shrinks by part
        selectivity instead of carrying every distinct part."""
        p = plan_of(spark, specs, "tpch_q17")
        lines = p.splitlines()
        # in the tree section the semi-join's PARENT prints directly above
        # it one indent out: that parent must be the partial HashAggregate
        semi = next(
            (i for i, l in enumerate(lines)
             if "BroadcastHashJoin LeftSemi" in l),
            None,
        )
        assert semi is not None, "semi-join pre-filter missing from Q17 plan"
        assert "HashAggregate" in lines[semi - 1], (
            "semi-join is not the direct child of the per-part aggregate:\n"
            + "\n".join(lines[: semi + 2])
        )
        assert "partial_avg" in p, "per-part avg lost its map-side partial"

    def test_temporal_read_pushes_through_changelog_view(self, spark, specs):
        """state_at's (tablet, height) predicates must reach the raw events
        scan even though the query is written against the derived changelog
        view — this is what replaces the reference's key-range scans
        (read.go:52-53) with data skipping."""
        p = plan_of(spark, specs, "flux_state_at")
        pushed = [l for l in p.splitlines() if "PushedFilters" in l][0]
        assert "EqualTo(event_type,click)" in pushed
        assert "LessThanOrEqual(event_id,700)" in pushed


class TestJoinStrategy:
    @pytest.mark.parametrize("name", ["tpch_q3", "tpch_q5", "tpch_q10"])
    def test_dimension_joins_broadcast(self, spark, specs, name):
        assert "BroadcastHashJoin" in plan_of(spark, specs, name)

    def test_semi_join_for_exists(self, spark, specs):
        p = plan_of(spark, specs, "tpch_q4")
        assert "LeftSemi" in p

    def test_anti_join_for_not_exists(self, spark, specs):
        p = plan_of(spark, specs, "tpch_q22")
        assert "LeftAnti" in p

    @pytest.mark.parametrize("name", ["tpch_q2", "tpch_q16", "tpch_q20"])
    def test_new_tpch_dimension_joins_broadcast(self, spark, specs, name):
        assert "BroadcastHashJoin" in plan_of(spark, specs, name)

    def test_q21_semi_and_anti_no_nested_loop(self, spark, specs):
        """Q21's EXISTS/NOT EXISTS with the supplier inequality must still
        hash-partition on orderkey (inequality as residual condition), not
        fall back to a nested-loop/cartesian plan."""
        p = plan_of(spark, specs, "tpch_q21")
        assert "LeftSemi" in p and "LeftAnti" in p
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    @pytest.mark.parametrize(
        "name", ["tpch_q2", "tpch_q11", "tpch_q16", "tpch_q20", "tpch_q21"]
    )
    def test_new_tpch_no_python_no_cartesian(self, spark, specs, name):
        p = plan_of(spark, specs, name)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "CartesianProduct" not in p


class TestNoPythonInHotPath:
    @pytest.mark.parametrize(
        "name",
        [
            "tpch_q1",
            "flux_state_at",
            "text_stats",
            "text_quality",
            "dedup_simhash",
            "dedup_exact",
            "embed_topk",
            "doc_fingerprint",
        ],
    )
    def test_expression_only(self, spark, specs, name):
        p = plan_of(spark, specs, name)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    def test_codegen_covers_q1(self, spark, specs):
        df = specs["tpch_q1"].spark(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("codegen")
        assert "WholeStageCodegen" in buf.getvalue()


class TestCorpusOpPlans:
    """Round-3 corpus operators: the plan properties that keep them viable
    when one domain holds a billion pages or the vocabulary is huge."""

    def test_source_caps_group_limit_before_shuffle(self, spark, specs):
        """row_number <= K must compile to a Partial WindowGroupLimit below
        the exchange — each map task ships at most K rows per group, so a
        mega-domain cannot flood a reducer."""
        p = plan_of(spark, specs, "source_caps")
        assert "WindowGroupLimit" in p and "Partial" in p

    def test_heavy_hitters_takeordered_not_global_window(self, spark, specs):
        """Top-k must be TakeOrdered (per-partition top-k + k*partitions
        merge); a global single-partition Window over the vocabulary would
        serialize |vocab| rows through one task."""
        p = plan_of(spark, specs, "heavy_hitters")
        assert "TakeOrderedAndProject" in p

    @pytest.mark.parametrize(
        "name", ["source_caps", "lm_score", "chunk_dedup", "heavy_hitters"]
    )
    def test_corpus_ops_no_python_no_cartesian(self, spark, specs, name):
        p = plan_of(spark, specs, name)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "CartesianProduct" not in p


class TestEditdistShape:
    def test_editdist_no_cartesian_wildcard_broadcast(self, spark, specs):
        """The Ed-Join candidate join must be a hash join on the gram key
        (never a cartesian pair scan), and the wildcard length-band join
        must BUILD the bounded wildcard side (BroadcastNestedLoopJoin is
        the correct physical op for a non-equi band join whose small side
        is vocabulary-bounded)."""
        p = plan_of(spark, specs, "editdist_join")
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "BroadcastHashJoin" in p
        # keyed on the gram column, not a pair scan
        assert "[gram" in p


class TestRound10Shapes:
    """Batch plan gate for the round-10 additions: no pair scans, no
    Python on the executors, and every top-k that claims sort+limit
    really is a TakeOrdered (per-partition top-k + bounded merge)."""

    @pytest.mark.parametrize(
        "name",
        [
            "k_anonymity",
            "flux_series_ewma",
            "dedup_pagerank",
            "collocations",
            "doc_keywords",
            "join_size_estimate",
            "entity_resolution",
            "basket_rules",
            "path_regex_match",
            "data_expectations",
            "flux_state_drift",
            "benford_audit",
            "flux_key_survival",
            "flux_series_trend",
            "weekly_growth",
            "funnel_latency",
            "flux_tablet_reconcile",
            "embed_norm_audit",
            "flux_mutation_profile",
            "source_dedup_matrix",
        ],
    )
    def test_no_cartesian_no_python(self, spark, specs, name):
        p = plan_of(spark, specs, name)
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    @pytest.mark.parametrize(
        "name", ["dedup_pagerank", "collocations", "basket_rules"]
    )
    def test_topk_is_takeordered(self, spark, specs, name):
        p = plan_of(spark, specs, name)
        assert "TakeOrderedAndProject" in p


class TestQ18Shape:
    def test_q18_partial_agg_no_window(self, spark, specs):
        """Q18's big-order subquery must be a partial-aggregated groupBy
        (one row per orderkey crosses the shuffle), NOT a window sum that
        carries full lineitem rows through the shuffle — the shape that
        loses at 100x (A/B in the entry's docstring)."""
        p = plan_of(spark, specs, "tpch_q18")
        assert "Window" not in p
        # map-side partial aggregation on the lineitem groupBy
        assert "partial_sum" in p or "HashAggregate" in p
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


class TestRetrievalPairPlans:
    """Round-5 retrieval pair: the plan properties that keep BM25 and
    whole-corpus k-means viable on a 100 TB corpus."""

    def test_bm25_filters_terms_before_shuffle(self, spark, specs):
        """The query-term IN filter must sit below the tf groupBy's
        exchange — the shuffle carries only matched (doc, term) pairs,
        never the exploded vocabulary — and the top-k must be
        TakeOrdered, not a global sort."""
        import re

        p = plan_of(spark, specs, "bm25_rank")
        assert "TakeOrderedAndProject" in p
        # detail blocks are numbered bottom-up: the term filter must sit
        # DIRECTLY on the explode (generate_id + 1), i.e. below the tf
        # groupBy's exchange, which therefore has a larger id
        gen_id = int(re.search(r"\((\d+)\) Generate", p).group(1))
        filt = re.search(
            r"\((\d+)\) Filter\nInput.*\nCondition : term#\d+ IN", p
        )
        assert filt and int(filt.group(1)) == gen_id + 1
        tf_exchange = re.search(
            r"\((\d+)\) Exchange\nInput.*\nArguments: hashpartitioning"
            r"\(doc_id#\d+L, dl#\d+, term#\d+",
            p,
        )
        assert tf_exchange and int(tf_exchange.group(1)) > int(filt.group(1))
        assert "BroadcastHashJoin" in p or "BroadcastExchange" in p

    def test_kmeans_assignment_is_map_only(self, spark, specs):
        """Per-iteration assignment must not shuffle: centroids are plan
        literals, distance is a JVM higher-order fold — the only
        exchanges in the final pass belong to the k*dim centroid
        groupBys already executed; the returned plan (assignment over
        the quantized scan) has no join at all."""
        p = plan_of(spark, specs, "embed_kmeans")
        assert "Join" not in p and "CartesianProduct" not in p

    @pytest.mark.parametrize("name", ["bm25_rank", "embed_kmeans"])
    def test_retrieval_pair_no_python(self, spark, specs, name):
        p = plan_of(spark, specs, name)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


class TestEmbeddingCompressionPlans:
    """Round-7 embedding-compression pair: the plan properties that keep
    JL projection and the covariance relation viable at 100 TB."""

    def test_projected_topk_broadcasts_queries(self, spark, specs):
        """The projection is per-row (no shuffle); the query side must
        broadcast, so the corpus is scanned once with no corpus-side
        exchange before the per-query top-k window."""
        p = plan_of(spark, specs, "embed_topk_projected")
        assert "BroadcastExchange" in p
        assert "CartesianProduct" not in p

    def test_covariance_is_two_combine_friendly_aggs(self, spark, specs):
        """Both the dim-row mean relation and the dim^2-row co-moment
        relation must partial-aggregate map-side (the shuffle carries
        dim^2 rows per partition, never O(rows)), and the final join of
        the two tiny relations must broadcast."""
        p = plan_of(spark, specs, "embed_covariance")
        assert "partial" in p.lower()  # map-side combine on the groupBys
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p


class TestWholeCatalogAntiPatterns:
    """Blanket gate over EVERY catalog entry's physical plan: no
    row-at-a-time or Arrow-batched Python in any hot path (the enumerated
    exceptions are the operators whose semantics genuinely need Python —
    opaque binary decode, arbitrary streaming state, the UDTF tier), and
    no cartesian product anywhere (broadcast 1-row scalar joins compile
    to BroadcastNestedLoopJoin, which is fine; CartesianProduct — a
    shuffled n*m join — is not). A new catalog entry that silently
    de-optimizes fails here without needing its own pin."""

    # Python is the POINT of these entries (Arrow-batched, documented):
    PYTHON_OK = {
        "multimodal_meta",      # mapInPandas binary header parse
        "multimodal_decode",    # mapInPandas payload decode
        "multimodal_frames",    # mapInPandas frame sampling
        "typed_view_protobuf",  # Arrow wire parser (no protobuf jar)
        "typed_view_protobuf_nested",  # packed/nested wire parser
        "stream_sessionize",    # applyInPandasWithState
    }
    # real StreamingQuery entries build their plan inside the stream
    STREAMING = {
        "stream_tumbling", "stream_dedup", "stream_stream_join",
        "stream_sessionize", "stream_simhash_dedup",
        "stream_hll_distinct", "stream_cms_heavy_hitters",
        "stream_rfm", "stream_kmv_overlap", "stream_source_divergence",
        "stream_hll_rollup", "stream_wor_sample", "stream_embed_outliers",
        "stream_lm_score", "stream_corpus_fingerprint",
        "stream_decontaminate", "stream_seasonality",
        "stream_token_spectrum", "stream_ivf_balance",
        "stream_key_skew",
        "stream_shingle_df",
        "stream_pq_distortion",
        "stream_snapshot_cadence",
        "stream_winnow",
    }

    @pytest.mark.sweep
    def test_no_python_and_no_cartesian_anywhere(self, spark, specs):
        offenders: dict[str, list[str]] = {}
        for name, spec in specs.items():
            if name in self.STREAMING:
                continue
            try:
                p = plan_of(spark, specs, name)
            except Exception as e:  # pragma: no cover - fail loudly
                offenders[name] = [f"plan build failed: {e}"]
                continue
            bad = []
            if name not in self.PYTHON_OK and (
                "BatchEvalPython" in p or "ArrowEvalPython" in p
                or "MapInPandas" in p or "FlatMapGroupsInPandas" in p
            ):
                bad.append("python-in-plan")
            if "CartesianProduct" in p:
                bad.append("cartesian-product")
            if bad:
                offenders[name] = bad
        assert not offenders, offenders


class TestCadenceSweepPlan:
    """The cadence sweep's 100 TB claim is that NOTHING downstream of the
    one bucket-counter groupBy touches the changelog: no per-snapshot
    explode, no rank window, cadence table broadcast.  Pin the rank-free
    shape — a regression to a per-snapshot generate/explode or a window
    would show up here before it shows up as a slow cluster."""

    def test_rank_free_closed_form(self, spark, specs):
        p = plan_of(spark, specs, "flux_snapshot_cadence_sweep")
        assert "Window" not in p, "closed form regressed to a rank window"
        # the only Generate allowed is the cadence-literal explode on the
        # 1-row head scalar — never on the profile relation (a profile-
        # side explode would be the per-snapshot blowup the closed form
        # exists to avoid)
        # (it appears once per consumer branch — idx and delta each
        # rebuild the 3-row cadence table from the checkpointed profile)
        gen = [l for l in p.splitlines() if l.lstrip().startswith("(")
               and "Generate" in l]
        assert len(gen) <= 2, f"unexpected Generate nodes: {gen}"
        assert "CartesianProduct" not in p


class TestSketchTieredScoringPlans:
    """rfm_segments and perplexity_buckets were the r9 verdict's two named
    scale-killers: data-proportional rank windows with no (or skewed)
    partitioning — one task sorts 10^9 users / the dominant language.
    Both now score through the HDR bucket sketch; the ONLY rank machinery
    allowed in their plans is the cumulative sum over the bounded bucket
    histograms.  Pin that: no row_number/ntile anywhere in the physical
    plan (the old shapes), and the tier relations join back by broadcast."""

    @pytest.mark.parametrize("name", ["rfm_segments", "perplexity_buckets"])
    def test_no_per_row_rank_window(self, spark, specs, name):
        p = plan_of(spark, specs, name)
        assert "row_number" not in p, f"{name}: per-row rank window came back"
        assert "ntile" not in p, f"{name}: ntile came back"

    @pytest.mark.parametrize("name", ["rfm_segments", "perplexity_buckets"])
    def test_tiers_join_back_by_broadcast(self, spark, specs, name):
        p = plan_of(spark, specs, name)
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p, (
            f"{name}: tier join fell back to a shuffle join"
        )


class TestRound11AdditionPlans:
    """Shape pins for the round-11 additions (the global python/cartesian
    sweep already covers them)."""

    @pytest.mark.parametrize(
        "name", ["doc_novelty", "hll_rollup", "quality_calibration"]
    )
    def test_rollups_have_no_rank_machinery(self, spark, specs, name):
        # these are groupBy-only shapes: a rank window appearing here
        # would mean a data-proportional sort crept into a sketch/rollup
        p = plan_of(spark, specs, name)
        assert "row_number" not in p and "ntile" not in p

    def test_survivor_rank_is_per_component(self, spark, specs):
        """The quality-survivor rank must window BY COMPONENT (bounded by
        the near-dup pair space) — an empty partition spec would be a
        one-task corpus sort."""
        p = plan_of(spark, specs, "dedup_survivors_quality")
        assert "windowspecdefinition(component" in p

    def test_kcenter_refined_radius_pass_is_map_only(self, spark, specs):
        """The full-corpus radius pass of the refined k-center must stay
        expression-only: plan-literal centers, no join against a center
        relation, no Python."""
        p = plan_of(spark, specs, "embed_kcenter_refined")
        assert "CartesianProduct" not in p
        assert "SortMergeJoin" not in p


class TestRound12AdditionPlans:
    """Shape pins for the round-12 additions (the global python/cartesian
    sweep already covers them)."""

    def test_self_overlap_is_windowless_map_fold(self, spark, specs):
        """The whole point of corpus_self_overlap is pairwise statistics
        WITHOUT pairs: no window and no sort-merge join may appear — the
        C(df,2) fold is groupBys plus one broadcast join-back."""
        p = plan_of(spark, specs, "corpus_self_overlap")
        assert "row_number" not in p and "Window" not in p
        assert "SortMergeJoin" not in p

    def test_spectrum_windows_only_buckets(self, spark, specs):
        """token_freq_spectrum's cumulative window must order by the
        <= 63-row bucket relation, never a corpus/vocab-sized one."""
        p = plan_of(spark, specs, "token_freq_spectrum")
        assert "windowspecdefinition(bucket" in p

    def test_packing_audit_windows_per_shard(self, spark, specs):
        """The fragmentation audit rides the packer's own per-shard
        prefix sum: the window must partition by shard."""
        p = plan_of(spark, specs, "packing_fragmentation")
        assert "windowspecdefinition(shard" in p

    def test_margin_query_batch_broadcasts(self, spark, specs):
        """embed_margin_pairs' scoring pass must broadcast the bounded
        query batch — a sort-merge join of the candidate pool against
        the batch would shuffle the corpus side."""
        p = plan_of(spark, specs, "embed_margin_pairs")
        assert "BroadcastExchange" in p
        assert "CartesianProduct" not in p

    def test_ivf_audit_assignment_is_map_only(self, spark, specs):
        """Cell assignment must score against plan-literal centroids —
        no join of the corpus against a centroid relation."""
        p = plan_of(spark, specs, "ivf_balance_audit")
        assert "CartesianProduct" not in p


class TestRound11LateAdditionPlans:
    """Shape pins for the late round-11 additions (the global
    python/cartesian sweep already covers them)."""

    def test_wor_sample_is_takeordered_no_shuffle(self, spark, specs):
        """The WOR draw must stay per-partition heaps + map-side
        priority: an Exchange here would mean the corpus is being
        sorted to pick k rows."""
        p = plan_of(spark, specs, "wor_sample")
        assert "TakeOrderedAndProject" in p
        assert "Exchange" not in p

    def test_class_separation_joins_broadcast(self, spark, specs):
        """The |labels|-row between-scatter relation must ride a
        broadcast back onto the per-label rollup, and both folds must
        partial-aggregate map-side."""
        p = plan_of(spark, specs, "embed_class_separation")
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p
        assert "partial" in p.lower()
        assert "row_number" not in p and "ntile" not in p

    def test_embed_outliers_is_takeordered(self, spark, specs):
        """The OOD top-k must be per-partition heaps against the
        plan-literal centroid — no corpus sort, no join against a
        centroid relation."""
        p = plan_of(spark, specs, "embed_outliers")
        assert "TakeOrderedAndProject" in p
        assert "SortMergeJoin" not in p
        assert "row_number" not in p

    def test_stratified_wor_rank_is_group_limited(self, spark, specs):
        """The per-language quota must compile to WindowGroupLimit so
        each map task forwards at most k rows per group (the
        kmv/cap_per_group contract)."""
        p = plan_of(spark, specs, "wor_sample_stratified")
        assert "WindowGroupLimit" in p

    def test_seasonality_margins_ride_broadcasts(self, spark, specs):
        """The <= 168-cell rollup must take its margins and total by
        broadcast — a shuffle join here would mean the bounded cell
        relation is being treated as data-proportional."""
        p = plan_of(spark, specs, "event_seasonality")
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p
        assert "CartesianProduct" not in p

    def test_token_budget_curve_windows_only_bands(self, spark, specs):
        """Both cumulative windows must run over the bounded lp_band
        relation — a rank or ntile would mean a data-proportional
        sort crept back into the quality-cut machinery."""
        p = plan_of(spark, specs, "token_budget_curve")
        assert "row_number" not in p and "ntile" not in p
        assert "windowspecdefinition(lp_band" in p


class TestRound10AdditionPlans:
    def test_kmv_sketch_rank_is_group_limited(self, spark, specs):
        """The per-group k-smallest cut must compile to WindowGroupLimit
        so each map task forwards at most k rows per group into the
        shuffle — the property that keeps the sketch build safe when one
        event type holds most of the corpus."""
        p = plan_of(spark, specs, "kmv_set_overlap")
        assert "WindowGroupLimit" in p

    def test_dedup_spans_occurrence_filter_is_semi_join(self, spark, specs):
        """Duplicated-shingle occurrences must reach the interval merge
        through a LeftSemi join on the 8-byte hash (never a full join
        materializing counts per position)."""
        p = plan_of(spark, specs, "dedup_spans")
        assert "LeftSemi" in p
        assert "CartesianProduct" not in p


class TestZorderLayout:
    """The data-skipping claim itself: after z-order clustering, cells
    bound BOTH dimensions tightly; a single-column order bounds only
    its own column."""

    def test_cells_bound_both_dimensions(self, spark):
        from fluxdb_spark.operators.layout import zorder_cells
        import pyspark.sql.functions as F

        # deterministic uniform grid: 64x64 points
        df = spark.range(4096).select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
        cells = zorder_cells(df, "x", "y").collect()
        assert sum(r.n for r in cells) == 4096
        # 256 coarse cells over a 64x64 grid -> each cell is a 4x4 tile:
        # BOTH dimension ranges must be tiny vs the global 0..63
        mean_xr = sum(r.max_x - r.min_x for r in cells) / len(cells)
        mean_yr = sum(r.max_y - r.min_y for r in cells) / len(cells)
        assert mean_xr <= 4 and mean_yr <= 4, (mean_xr, mean_yr)
        # the single-column-sort counterfactual: bucket by x only into
        # the same number of cells -> y stays unbounded (~global range)
        xsort = (
            df.groupBy((F.col("x") * 256 / 64).cast("long").alias("c"))
            .agg(
                (F.max("y") - F.min("y")).alias("yr"),
            )
            .collect()
        )
        mean_yr_xsort = sum(r.yr for r in xsort) / len(xsort)
        assert mean_yr_xsort >= 60  # y range is the whole domain
        assert mean_yr * 4 < mean_yr_xsort

    def test_entry_plan_is_one_pass(self, spark, specs):
        p = plan_of(spark, specs, "zorder_layout")
        assert "CartesianProduct" not in p
        assert "SortMergeJoin" not in p  # bounds ride a broadcast
        assert "row_number" not in p


class TestRound13AdditionPlans:
    """Shape pins for the round-13 additions (the global python/
    cartesian sweep already covers them)."""

    def test_key_skew_windows_share_tablet_partition(self, spark, specs):
        """Both windows (tablet total + rank) must partition by
        tablet_id, and the rank<=5 filter must compile to
        WindowGroupLimit so the key relation is never globally
        sorted."""
        p = plan_of(spark, specs, "flux_key_skew")
        assert "windowspecdefinition(tablet_id" in p
        assert "WindowGroupLimit" in p

    def test_write_amp_head_window_is_per_key(self, spark, specs):
        """The head pick must ride the state_at partitioning
        (tablet_id, primary_key) and the rn=1 filter must group-limit."""
        p = plan_of(spark, specs, "flux_write_amplification")
        assert "windowspecdefinition(tablet_id" in p
        assert "primary_key" in p.split("windowspecdefinition(tablet_id", 1)[1][:80]
        assert "WindowGroupLimit" in p

    def test_budget_sweep_single_window_then_explode(self, spark, specs):
        """ONE budget-independent prefix-sum window per shard; the
        4-way budget fan-out is a map-side Generate AFTER it — a plan
        with one window per budget (4 shuffles) fails here."""
        p = plan_of(spark, specs, "packing_budget_sweep")
        assert p.count("windowspecdefinition(shard") >= 1
        assert p.count("Window") - p.count("WindowGroupLimit") <= 4
        assert "Generate" in p and "explode" in p

    def test_bucket_skew_is_pure_rollup(self, spark, specs):
        """Occupancy and the per-band stats are combine-friendly
        aggregates — no window machinery, no pair materialization
        (the candidate volume is sum C(sz,2) over bucket sizes)."""
        p = plan_of(spark, specs, "dedup_bucket_skew")
        assert "windowspecdefinition" not in p
        assert "SortMergeJoin" not in p
        assert "CartesianProduct" not in p

    def test_matryoshka_rungs_group_limit(self, spark, specs):
        """Every rung's top-10 must compile to WindowGroupLimit (per-
        query heaps), not a global sort of the scored corpus."""
        p = plan_of(spark, specs, "embed_matryoshka_eval")
        assert "WindowGroupLimit" in p
        assert "windowspecdefinition(query_id" in p

    def test_ann_recall_probe_join_broadcasts(self, spark, specs):
        """The probe join must broadcast the bounded query side into
        the cell-pruned corpus scan.  Since the round-14 fusion the
        entry scores the full-probe candidate set ONCE (checkpointed;
        see sim.ivf_probe_scored), so the broadcast lives in the scored
        relation's own plan and the declared plan is the per-depth
        prank-filtered windows over the checkpoint."""
        from fluxdb_spark.functions import similarity as sim
        from fluxdb_spark.sources.tables import load_table
        from pyspark.sql import functions as F

        e = load_table(spark, SF, "embeddings")
        cents = sim.kmeans_centroids(e, k=4, iters=1)
        assignments = sim.assign_to_centroids(
            e, cents, carry=("embedding",)
        ).select("vec_id", "cluster", "embedding")
        scored = sim.ivf_probe_scored(
            assignments, cents, e.filter(F.col("vec_id") < 5)
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            scored.explain("formatted")
        sp = buf.getvalue()
        assert "BroadcastExchange" in sp
        assert "CartesianProduct" not in sp
        # the declared plan: one window per probe depth over the shared
        # scored checkpoint, never a re-scored candidate space
        p = plan_of(spark, specs, "embed_ann_recall_curve")
        assert p.count("windowspecdefinition(query_id") >= 4
        assert "CartesianProduct" not in p
