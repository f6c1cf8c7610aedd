"""Physical-plan shape tests (SURVEY.md §4): the scale-critical Catalyst
behaviors, asserted so plan regressions fail loudly. These are the 100 TB
checks — a result-correct plan that stopped pushing filters or broadcasting
dims would pass every oracle and still melt a real cluster."""

from __future__ import annotations

import pytest

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.plans.explain import (
    assert_in_plan,
    assert_not_in_plan,
    assert_pushed_filter,
    assert_read_schema_only,
    formatted_plan,
)
from mongodb_cdc_spark.registry import QUERIES, load_all_operators

load_all_operators()


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = QUERIES["filter_optype_isin"](spark, sf_dir)
    assert_pushed_filter(df, "In(event_type")


def test_time_range_pushdown(spark, sf_dir):
    df = QUERIES["filter_time_range"](spark, sf_dir)
    # ts is rewritten at load (ns->µs), so pushdown lands on the raw long
    # column — what matters is a range predicate reaching the scan.
    plan = formatted_plan(df)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual" in plan or "IsNotNull(ts)" in plan


def test_column_pruning_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    assert_read_schema_only(df, "l_orderkey", "l_quantity")


def test_dim_joins_broadcast(spark, sf_dir):
    df = QUERIES["join_broadcast_dims"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    df = QUERIES["topk_orders"](spark, sf_dir)
    assert_in_plan(df, "TakeOrderedAndProject")


def test_flagship_stays_in_codegen(spark, sf_dir):
    """The flagship aggregate must be pure JVM: whole-stage codegen (the
    ``*(n)`` stage markers in the executed plan), map-side partial
    aggregation, and no Python evaluation anywhere. Executed first so AQE
    finalizes — the pre-execution formatted plan hides codegen stages."""
    df = QUERIES["agg_hash_groupby"](spark, sf_dir)
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "*(" in plan, f"no WholeStageCodegen stages:\n{plan}"
    assert "partial_sum" in plan or "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semi_anti_join_operators(spark, sf_dir):
    assert_in_plan(QUERIES["join_left_semi"](spark, sf_dir), "LeftSemi")
    assert_in_plan(QUERIES["join_left_anti"](spark, sf_dir), "LeftAnti")


def test_theta_join_is_not_cartesian(spark, sf_dir):
    """The equi conjunct must key the join; only the pure cross op may be
    a nested-loop product."""
    assert_not_in_plan(
        QUERIES["join_theta_self"](spark, sf_dir), "CartesianProduct"
    )


def test_collocations_topk_is_take_ordered(spark, sf_dir):
    """The bigram top-20 must be per-partition heaps, never a global
    sort of the whole vocabulary-squared pair table."""
    df = QUERIES["ext_collocations"](spark, sf_dir)
    assert_in_plan(df, "TakeOrderedAndProject")


def test_zorder_key_is_single_aggregation_no_python(spark, sf_dir):
    """The 64-term Morton interleave must run as codegen expressions in
    the scan stage: no Python eval, no join beyond the broadcast 1-row
    stats, exactly one shuffle (the zbucket rollup)."""
    plan = formatted_plan(QUERIES["maintenance_zorder_key"](spark, sf_dir))
    assert "EvalPython" not in plan
    # the 1-row stats frame attaches via broadcast — the fact table is
    # never shuffled for the join, only for the final zbucket rollup
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_text_ops_have_no_python(spark, sf_dir):
    for key in (
        "ext_text_wordcount",
        "ext_text_quality",
        "ext_dedup_exact",
        "ext_token_histogram",
        "ext_pack_sequences",
        "agg_stats_moments",
        "agg_funnel_steps",
        "agg_mode_disc",
        "win_session_gap",
        "ext_heavy_hitters",
        "ext_sample_weighted",
        "cdc_scd2_history",
        "cdc_point_in_time",
    ):
        plan = formatted_plan(QUERIES[key](spark, sf_dir))
        assert "EvalPython" not in plan, f"{key} fell off the JVM path:\n{plan}"


def test_cosine_topk_broadcasts_probe(spark, sf_dir):
    df = QUERIES["ext_sim_cosine_topk"](spark, sf_dir)
    assert_in_plan(df, "BroadcastNestedLoopJoin")


def test_cosine_topk_uses_partial_topk_not_global_window(spark, sf_dir):
    """The top-10 must come from per-partition heaps
    (TakeOrderedAndProject), never a global unpartitioned WindowExec over
    every scored row — the single-task plan that dies at corpus scale."""
    df = QUERIES["ext_sim_cosine_topk"](spark, sf_dir)
    assert_in_plan(df, "TakeOrderedAndProject")


def test_ivm_topk_rank_is_take_ordered(spark, sf_dir):
    """The IVM leaderboard ranker (shared by cdc_ivm_topk and
    cdc_ivm_topk_tombstone, BOTH arms) must heap-select the top K
    first (TakeOrderedAndProject) and only then rank — the window may
    exist, but as a PARENT of the K-row limit, never directly over the
    user-cardinality view (the single-task sort that dies at 100 TB)."""
    from pyspark.sql import functions as F

    from mongodb_cdc_spark.operators.cdc import ivm_rank_top

    view = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.lit(0).cast("bigint").alias("value_cents"),
        )
    )
    df = ivm_rank_top(view)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    lines = plan.splitlines()
    w_at = next(i for i, l in enumerate(lines) if "Window" in l)
    t_at = next(
        i for i, l in enumerate(lines) if "TakeOrderedAndProject" in l
    )
    # parents print above children: the window consumes the limited
    # frame, not the view
    assert w_at < t_at, plan


def test_ntile_pctrank_has_no_global_window(spark, sf_dir):
    """The global-quartile operator must never plan an UNPARTITIONED
    WindowExec over the fact-sized input (the single-task sort that dies
    at 100 TB) — every window in its plan must be partitioned by the
    range-bucket column; rank parallelism is the bucket count."""
    df = QUERIES["win_ntile_pctrank"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "_bkt" in line, f"unpartitioned window:\n{line}\n\n{plan}"
    assert "windowspecdefinition" in plan  # the bucket-local rank exists


def test_range_binned_join_avoids_nested_loop(spark, sf_dir):
    """The binned interval join must be an equi-join on the time bin —
    never BroadcastNestedLoopJoin/CartesianProduct over probes x events
    (the quadratic plan binning exists to prevent)."""
    df = QUERIES["join_range_binned"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_topk_rank_is_group_limited_and_partitioned(spark, sf_dir):
    """The LSH ANN rank must (a) partition its window by probe_id (never
    a global unpartitioned WindowExec over all scored candidates) and
    (b) get Spark's WindowGroupLimit pushdown so each task keeps only
    rank<=3 rows before the probe_id exchange."""
    df = QUERIES["ext_sim_lsh_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan


def test_textpipe_ops_have_no_python(spark, sf_dir):
    """The corpus-prep tier (contamination, sampling, heavy-hitters,
    TF-IDF, scrubbing) is pure codegen — any EvalPython is a regression
    off the JVM path."""
    for key in (
        "ext_split_contamination",
        "ext_sample_stratified",
        "ext_topk_tokens",
        "ext_tfidf_topterms",
        "ext_pii_scrub",
    ):
        plan = formatted_plan(QUERIES[key](spark, sf_dir))
        assert "EvalPython" not in plan, f"{key} fell off the JVM path:\n{plan}"


def test_stratified_sample_broadcasts_rate_dim(spark, sf_dir):
    df = QUERIES["ext_sample_stratified"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_tfidf_broadcasts_df_and_group_limits_rank(spark, sf_dir):
    """The document-frequency side must broadcast (vocabulary-sized), and
    the per-doc rank must get WindowGroupLimit pushdown so each task
    keeps only rk<=3 rows before the doc_id exchange."""
    df = QUERIES["ext_tfidf_topterms"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_topk_tokens_aggregates_before_window(spark, sf_dir):
    """Heavy-hitters must rank the (lang, token) aggregate, not raw
    tokens: partial aggregation plus WindowGroupLimit, and no global
    unpartitioned window."""
    df = QUERIES["ext_topk_tokens"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "HashAggregate" in plan, plan


def test_contamination_join_is_hash_equi(spark, sf_dir):
    """The train x test shingle overlap must be an equi-join on the gram
    hash — never a nested-loop/cartesian over document pairs."""
    df = QUERIES["ext_split_contamination"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_multimodal_passes_have_no_shuffle(spark, sf_dir):
    """Decode and frame-sample are per-partition mapInPandas passes: any
    Exchange in their plans means blob bytes are crossing the wire —
    scan-bandwidth-bound is the contract."""
    for key in ("mm_decode_features", "mm_frame_sample"):
        plan = formatted_plan(QUERIES[key](spark, sf_dir))
        assert "Exchange" not in plan, f"{key} shuffles blobs:\n{plan}"


def test_doc_chunks_is_shuffle_free_map_pass(spark, sf_dir):
    """Chunking is scan -> tokenize -> explode -> hash, all map-side: an
    Exchange would mean token arrays crossing the wire for no reason."""
    plan = formatted_plan(QUERIES["ext_doc_chunks"](spark, sf_dir))
    assert "Exchange" not in plan, f"chunking shuffles:\n{plan}"
    assert "Generate" in plan, plan  # the explode stays in the scan stage


def test_repetition_stats_shuffles_only_aggregates(spark, sf_dir):
    """Repetition signals are computed map-side with array_distinct (no
    explode): exactly one exchange — the final per-language partial agg —
    and no Generate node (exploding bigrams would shuffle-amplify the
    corpus ~54x at the observed mean document length)."""
    plan = formatted_plan(QUERIES["ext_repetition_stats"](spark, sf_dir))
    # formatted plans name each node twice (tree + detail) — count tree nodes
    assert plan.count("+- Exchange") == 1, plan
    assert "Generate" not in plan, plan


def test_knn_join_prunes_before_shuffle(spark, sf_dir):
    """The batch k-NN join must plan a partial WindowGroupLimit BEFORE the
    probe_id exchange — each input partition forwards at most k rows per
    probe, so the shuffle never carries the corpus x probes product. The
    probe side must be the broadcast build side."""
    plan = formatted_plan(QUERIES["ext_sim_knn_join"](spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan
    # Partial (pre-shuffle) AND Final (post-shuffle) passes both present
    assert "Partial" in plan and "Final" in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_sketch_ops_stay_jvm_and_broadcast(spark, sf_dir):
    """The CMS counter matrix (<= D*W rows) and the HLL per-type totals
    must broadcast to their probe/merge joins; both sketch tiers are pure
    JVM (DataSketches/codegen) — EvalPython would mean the sketch left
    the executor."""
    for key in ("agg_countmin_sketch", "agg_hll_partial_merge", "cdc_schema_drift"):
        plan = formatted_plan(QUERIES[key](spark, sf_dir))
        assert "EvalPython" not in plan, f"{key} fell off the JVM path:\n{plan}"
    assert "BroadcastHashJoin" in formatted_plan(
        QUERIES["agg_countmin_sketch"](spark, sf_dir)
    )


def test_statistics_tier_stays_in_codegen(spark, sf_dir):
    """The profile aggregates (histogram, exact-moment regression, op-ratio
    guard) must be single-shuffle map-side-combinable JVM plans: partial
    aggregation before the exchange, no Python eval, no join at all."""
    for key in ("agg_histogram_bins", "agg_corr_regression", "cdc_op_ratio_guard"):
        df = QUERIES[key](spark, sf_dir)
        plan = formatted_plan(df)
        assert "EvalPython" not in plan, f"{key} fell off the JVM path:\n{plan}"
        assert "Join" not in plan, f"{key} grew a join:\n{plan}"
        assert plan.count("+- Exchange") == 1, f"{key} shuffle count:\n{plan}"
        df.collect()
        executed = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        assert "partial_" in executed, f"{key} has no map-side combine:\n{executed}"


def test_embed_centroids_partial_aggregates_the_explode(spark, sf_dir):
    """The centroid pass explodes 64 rows/vector in the scan stage
    (Generate) and must partial-aggregate them map-side — the exchange
    carries (label x dim) sums, never the exploded element stream."""
    df = QUERIES["ext_embed_centroids"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Generate" in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("+- Exchange") == 1, plan
    df.collect()
    executed = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "partial_" in executed, f"no map-side combine:\n{executed}"


def test_bigram_novelty_topk_is_take_ordered(spark, sf_dir):
    """The novelty top-50 must plan as per-partition heaps, and the
    df-join must be an equi join on the bigram key, never a product."""
    df = QUERIES["ext_bigram_novelty"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_retention_cohort_joins_on_keys(spark, sf_dir):
    """The cohort self-join must key on user_id (equi join); the
    first-touch aggregate and the join share that partitioning."""
    plan = formatted_plan(QUERIES["agg_retention_cohort"](spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_pq_encoding_is_codegen_with_broadcast_probe(spark, sf_dir):
    """PQ encoding (32 distance exprs + 8 argmin CASEs) must stay in the
    scan stage's codegen; the probe's 32-entry ADC table joins as a
    broadcast 1-row frame; the top-k is per-partition heaps."""
    df = QUERIES["ext_sim_ann_pq"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_tpch_shapes_broadcast_dims_and_take_ordered(spark, sf_dir):
    """The TPC-H composites must plan as star joins: dimension sides
    broadcast (never a sort-merge of a dim against the fact at this
    scale), no Cartesian products, and the two top-k queries as
    per-partition heaps."""
    for key in ("sql_tpch_q3", "sql_tpch_q10"):
        plan = formatted_plan(QUERIES[key](spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, f"{key}:\n{plan}"
        assert "CartesianProduct" not in plan, f"{key}:\n{plan}"
    q5 = formatted_plan(QUERIES["sql_tpch_q5"](spark, sf_dir))
    assert "BroadcastHashJoin" in q5, q5
    assert "CartesianProduct" not in q5, q5


def test_fixed_size_sample_prunes_before_shuffle(spark, sf_dir):
    """The k-per-stratum sample must plan a partial WindowGroupLimit
    before the lang exchange — the shuffle carries at most k rows per
    (lang, input partition), never the corpus."""
    plan = formatted_plan(QUERIES["ext_sample_topk_hash"](spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan, plan
    assert "EvalPython" not in plan, plan


def test_kmeans_iterations_broadcast_centroids(spark, sf_dir):
    """Each Lloyd iteration must broadcast the K x dims centroid table
    against the exploded vectors — never shuffle the corpus for the
    join — and stay pure JVM."""
    plan = formatted_plan(QUERIES["ml_kmeans_refine"](spark, sf_dir))
    assert "EvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_partition_pruned_scan_opens_only_matching_dirs(spark, sf_dir):
    """The date predicate on the Hive-partition column must resolve
    against the directory listing (PartitionFilters), never as a row
    filter — and the scan must report fewer partition dirs than the
    table has days (7 of 30)."""
    df = QUERIES["scan_partitioned_pruned"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan, plan
    assert "event_date" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]


def test_q6_predicates_push_to_scan_and_aggregate_partially(spark, sf_dir):
    """Q6 is the pushdown showcase: all predicates reach the parquet
    reader and the one-row aggregate partials map-side."""
    df = QUERIES["sql_tpch_q6"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "PushedFilters" in plan, plan
    pushed = plan.split("PushedFilters", 1)[1].split("]", 1)[0]
    assert "l_discount" in pushed and "l_quantity" in pushed, pushed
    assert "partial_sum" in plan or "Partial" in plan, plan


def test_q4_exists_plans_as_semi_join(spark, sf_dir):
    """Catalyst must decorrelate the EXISTS into a semi join keyed on
    l_orderkey — never a nested-loop per-order probe."""
    plan = formatted_plan(QUERIES["sql_tpch_q4"](spark, sf_dir))
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q14_broadcasts_part_q18_scans_lineitem_once(spark, sf_dir):
    q14 = formatted_plan(QUERIES["sql_tpch_q14"](spark, sf_dir))
    assert "BroadcastHashJoin" in q14, q14
    # The round-5 aggregate-once rewrite: the textbook IN/HAVING form
    # scans lineitem twice (semi-join key set + post-join re-aggregation);
    # the CTE form computes per-order qty once and joins the ~1%
    # survivors. The plan-level proof is a SINGLE lineitem scan.
    q18 = formatted_plan(QUERIES["sql_tpch_q18"](spark, sf_dir))
    assert "TakeOrderedAndProject" in q18, q18
    lineitem_scans = sum(
        1
        for ln in q18.splitlines()
        if ln.lstrip().startswith("Location") and "lineitem.parquet" in ln
    )
    assert lineitem_scans == 1, q18


def test_shuffle_shards_is_one_aggregation_no_sort(spark, sf_dir):
    """Shard assignment + permutation endpoints must plan as one
    hash aggregate over seeded hashes — no global Sort anywhere (the
    whole point is shuffling WITHOUT ordering the corpus)."""
    plan = formatted_plan(QUERIES["ext_shuffle_shards"](spark, sf_dir))
    assert "HashAggregate" in plan, plan  # Object/HashAggregate, not Sort
    assert "SortAggregate" not in plan, plan
    assert "+- Sort" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_bitmap_distinct_is_two_hash_aggregates_no_expand(spark, sf_dir):
    """The bitmap path must NOT plan like COUNT(DISTINCT): no Expand
    node, no per-user shuffle rows — two plain hash aggregates over
    64-bit words, both map-side combinable."""
    plan = formatted_plan(QUERIES["agg_bitmap_distinct"](spark, sf_dir))
    assert "Expand" not in plan, plan
    assert plan.count("HashAggregate") >= 4, plan  # partial+final x 2 levels
    assert "EvalPython" not in plan, plan


def test_schema_merge_scan_keeps_pushdown(spark, sf_dir):
    """mergeSchema reconciliation must not cost pushdown: the merged
    relation still prunes columns at the reader."""
    df = QUERIES["scan_schema_merge"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "ReadSchema" in plan, plan
    assert "event_id" not in plan.split("ReadSchema", 1)[1].split("\n", 1)[0], (
        "unused event_id column not pruned from merged-schema scan"
    )


def test_pydatasource_pushdown_consumes_filter(spark, sf_dir):
    """The isin predicate on operationType must be consumed by the
    Python data source's pushFilters (the server-side $match analog) —
    no Filter node may remain above the BatchScan."""
    df = QUERIES["source_pydatasource_pushdown"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan mongo_changefeed_py" in plan, plan
    assert "Filter " not in plan and "+- Filter" not in plan, plan


def test_q19_disjunction_pushes_implied_predicates_both_sides(spark, sf_dir):
    """Catalyst must derive per-side filters from the OR-of-conjunctions:
    a quantity predicate must reach the lineitem scan and a brand/size
    predicate the part scan — without this, a disjunctive filter reads
    both relations in full."""
    df = QUERIES["sql_tpch_q19"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    li = next(ln for ln in scans if "l_partkey" in ln)
    pt = next(ln for ln in scans if "p_partkey" in ln)
    assert "l_quantity" in li.split("DataFilters", 1)[1][:200], li
    assert "p_brand" in pt.split("DataFilters", 1)[1][:200], pt
    assert "BroadcastHashJoin" in plan, plan


def test_tpch_completion_tier_plan_shapes(spark, sf_dir):
    """The 13 round-3 TPC-H completion queries must keep the star
    discipline: no Cartesian products anywhere, EXISTS/NOT-EXISTS pairs
    as semi/anti joins, and dimension sides broadcast."""
    for key in ("sql_tpch_q2", "sql_tpch_q7", "sql_tpch_q8", "sql_tpch_q9",
                "sql_tpch_q11", "sql_tpch_q12", "sql_tpch_q13",
                "sql_tpch_q15", "sql_tpch_q16", "sql_tpch_q17",
                "sql_tpch_q20", "sql_tpch_q21", "sql_tpch_q22"):
        plan = formatted_plan(QUERIES[key](spark, sf_dir))
        assert "CartesianProduct" not in plan, f"{key}:\n{plan}"
        assert "BroadcastNestedLoopJoin" not in plan, f"{key}:\n{plan}"

    # Q21 was rewritten (commit 416e4de) from EXISTS/NOT-EXISTS
    # semi/anti self-joins to per-order supplier-set windows over a
    # single lineitem pass — the plan must show the window form, not
    # the old self-join form (single-scan pin lives in
    # test_q11_q15_q17_q21_single_lineitem_scan).
    q21 = formatted_plan(QUERIES["sql_tpch_q21"](spark, sf_dir))
    assert "LeftSemi" not in q21, q21
    assert "LeftAnti" not in q21, q21
    assert "Window" in q21, q21
    assert "TakeOrderedAndProject" in q21, q21

    q22 = formatted_plan(QUERIES["sql_tpch_q22"](spark, sf_dir))
    assert "LeftAnti" in q22, q22

    # Q20's nested INs both become semi joins (part list + supplier set).
    q20 = formatted_plan(QUERIES["sql_tpch_q20"](spark, sf_dir))
    assert q20.count("LeftSemi") >= 2, q20

    # Q13's filtered join condition must keep the outer join outer —
    # the zero-order bucket exists only if no Inner conversion happened.
    q13 = formatted_plan(QUERIES["sql_tpch_q13"](spark, sf_dir))
    assert "LeftOuter" in q13, q13

    # Q17's decorrelated per-part average joins broadcast against the
    # brand-pruned part dimension.
    q17 = formatted_plan(QUERIES["sql_tpch_q17"](spark, sf_dir))
    assert "BroadcastHashJoin" in q17, q17


def test_gapfill_reuses_user_partitioning_no_python(spark, sf_dir):
    """Daily gap-fill must stay JVM-side, window per user_id (never a
    global window), and the grid explode must not add a Cartesian."""
    plan = formatted_plan(QUERIES["ts_gapfill_daily"](spark, sf_dir))
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "explode(sequence" in plan, plan


def test_fuzzy_block_match_joins_on_block_key(spark, sf_dir):
    """The ER candidate join must be an equi-join on the blocking key
    with the name inequality as a residual — never a nested-loop
    all-pairs product."""
    plan = formatted_plan(QUERIES["ext_fuzzy_block_match"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_triangle_count_equi_joins_only(spark, sf_dir):
    """Triangle enumeration is two equi-joins over oriented edges —
    no Cartesian products, all-JVM."""
    plan = formatted_plan(QUERIES["graph_triangle_count"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_growth_curve_windows_run_over_day_sized_relations(spark, sf_dir):
    """ts_cumulative_users / ts_wow_growth: the unpartitioned running
    windows must sit ABOVE the day/week-sized aggregate (bounded input),
    and everything stays JVM-side."""
    for key in ("ts_cumulative_users", "ts_wow_growth"):
        plan = formatted_plan(QUERIES[key](spark, sf_dir))
        assert "EvalPython" not in plan, f"{key}:\n{plan}"
        # the window's child must contain the HashAggregate that
        # collapses the fact to calendar cardinality
        win_at = plan.index("Window")
        assert "HashAggregate" in plan[win_at:], f"{key}:\n{plan}"


def test_null_safe_join_is_hashable_not_nested_loop(spark, sf_dir):
    """The null-safe equality condition must plan as a hashable
    equi-join (Catalyst hashes <=> keys); nested-loop would mean the
    null-aware rewrite was lost."""
    plan = formatted_plan(QUERIES["sql_null_semantics"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_winsorize_broadcasts_thresholds(spark, sf_dir):
    """The per-flag clamp-bound table must broadcast back onto the fact
    — never shuffle the fact for the threshold join."""
    plan = formatted_plan(QUERIES["ext_winsorize"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "EvalPython" not in plan, plan


def _scan_count(plan: str, table: str) -> int:
    return sum(
        1
        for ln in plan.splitlines()
        if ln.lstrip().startswith("Location") and f"{table}.parquet" in ln
    )


def test_q13_q22_aggregate_fact_before_join(spark, sf_dir):
    """The round-5 rewrites: q13 counts orders per custkey BELOW the
    outer join (the join input is count rows, not the fact) and q22
    DISTINCTs recent custkeys below the anti-join. Plan proof for both:
    one orders scan whose ReadSchema carries ONLY the two columns the
    pre-aggregate needs — a wide read or a second scan means the
    eager-aggregation shape regressed."""
    q13 = formatted_plan(QUERIES["sql_tpch_q13"](spark, sf_dir))
    assert _scan_count(q13, "orders") == 1, q13
    ord_schema = next(
        ln for ln in q13.splitlines()
        if "ReadSchema" in ln and "o_custkey" in ln
    )
    assert "o_orderpriority" in ord_schema, ord_schema
    assert "o_totalprice" not in ord_schema, ord_schema

    q22 = formatted_plan(QUERIES["sql_tpch_q22"](spark, sf_dir))
    assert _scan_count(q22, "orders") == 1, q22
    assert "LeftAnti" in q22, q22
    ord22 = next(
        ln for ln in q22.splitlines()
        if "ReadSchema" in ln and "o_custkey" in ln
    )
    assert "o_orderdate" in ord22 and "o_orderpriority" not in ord22, ord22


def test_q2_computes_supply_once_pruned(spark, sf_dir):
    """The round-5 q2 rewrite: the canonical correlated-MIN inlined the
    supply CTE into both branches (two full lineitem scan+aggregates);
    the engine form prunes lineitem by the qualifying part / EUROPE
    supplier key sets and aggregates ONCE. Plan proof: exactly one
    lineitem scan Location."""
    q2 = formatted_plan(QUERIES["sql_tpch_q2"](spark, sf_dir))
    assert _scan_count(q2, "lineitem") == 1, q2


def test_round5_additions_plan_shapes(spark, sf_dir):
    """Scale-critical shapes of the round-5 operator additions."""
    # basket lift: equi-join on okey (never cartesian), broadcast freq
    # dims, TakeOrdered top-100 (no global sort)
    lift = formatted_plan(QUERIES["agg_basket_lift"](spark, sf_dir))
    assert "CartesianProduct" not in lift, lift
    assert "TakeOrderedAndProject" in lift, lift
    assert "BroadcastHashJoin" in lift, lift
    # interval overlap: incidents side broadcasts (bounded probe set)
    ovl = formatted_plan(QUERIES["join_interval_overlap"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in ovl or "BroadcastHashJoin" in ovl, ovl
    # embed norm stats / token diversity / seasonal index: pure JVM
    for key in ("ext_embed_norm_stats", "ext_token_diversity",
                "ts_seasonal_index", "ts_ewma_halflife",
                "win_distinct_count_frame"):
        plan = formatted_plan(QUERIES[key](spark, sf_dir))
        assert "EvalPython" not in plan, f"{key}:\n{plan}"


def test_q11_q15_q17_q21_single_lineitem_scan(spark, sf_dir):
    """The round-5 window rewrites: scalar-subquery / self-aggregate /
    EXISTS-self-join forms that made Spark consume the fact two or
    three times (CTE inlining; q21's semi+anti self-joins) now compute
    the extra relations as windows over one pass — plan proof: exactly
    one lineitem scan each."""
    for key in ("sql_tpch_q11", "sql_tpch_q15", "sql_tpch_q17",
                "sql_tpch_q21"):
        plan = formatted_plan(QUERIES[key](spark, sf_dir))
        assert _scan_count(plan, "lineitem") == 1, f"{key}:\n{plan}"


def test_pagerank_from_store_no_fact_scan(spark, sf_dir):
    """The store-fed PageRank must never touch lineitem: its edge
    source is the persisted pair-support aggregate (pushed support
    filter), so the plan has zero lineitem scans, no Python eval, and
    a TakeOrderedAndProject selection. This is the pin that keeps the
    flagged fact x fact edge build out of the steady-state query path."""
    plan = formatted_plan(QUERIES["graph_pagerank_from_store"](spark, sf_dir))
    assert _scan_count(plan, "lineitem") == 0, plan
    assert "EvalPython" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_ann_from_store_partition_pruned(spark, sf_dir):
    """The from-store ANN probe must read ONLY its nprobe bucket
    directories: the literal bucket IN-list lands in the store scan's
    PartitionFilters (I/O = nprobe/K of the index at any scale), the
    only embeddings-table scans are the broadcast centroid/probe dims,
    and the top-10 is TakeOrderedAndProject, never a global sort."""
    plan = formatted_plan(QUERIES["ext_sim_ann_from_store"](spark, sf_dir))
    store_scans = [
        ln for ln in plan.splitlines() if "Location" in ln and "ivf_store_" in ln
    ]
    assert store_scans, f"no ivf store scan in plan:\n{plan}"
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln and "bucket" in ln]
    assert any("IN" in ln for ln in pf), f"bucket IN-list not pruned:\n{plan}"
    assert "TakeOrderedAndProject" in plan, plan
    assert "EvalPython" not in plan, plan


def test_ivfpq_rerank_partition_pruned(spark, sf_dir):
    """The composed IVFPQ path must stay compressed and pruned: BOTH
    store scans (packed codes for ADC, IVF vectors for re-rank) carry
    the literal bucket IN-list in PartitionFilters, the code scan's
    ReadSchema is the 12-byte (vec_id, packed) projection — never a
    vector column — and selection is TakeOrderedAndProject with no
    Python eval anywhere."""
    plan = formatted_plan(QUERIES["ext_sim_ivfpq_rerank"](spark, sf_dir))
    lines = plan.splitlines()
    pq_scan = [ln for ln in lines if "Location" in ln and "pq_store_" in ln]
    ivf_scan = [ln for ln in lines if "Location" in ln and "ivf_store_" in ln]
    assert pq_scan, f"no pq store scan:\n{plan}"
    assert ivf_scan, f"no ivf store scan:\n{plan}"
    pf = [ln for ln in lines if "PartitionFilters" in ln and "bucket" in ln]
    assert sum("IN" in ln for ln in pf) >= 2, f"bucket IN-lists not pruned:\n{plan}"
    # the ADC scan reads codes, not vectors: its ReadSchema must not
    # mention the embedding column
    sched = [ln for ln in lines if "ReadSchema" in ln and "packed" in ln]
    assert sched and all("embedding" not in ln for ln in sched), plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "EvalPython" not in plan, plan


def test_hard_negatives_block_join_not_cartesian(spark, sf_dir):
    """The rank-banded pair stage must stay a fully equi-keyed block
    join: the naive bucket-only form planned each bucket as a filtered
    cartesian (measured 12x time for 10x data at the 100x rehearsal).
    Pin: no cartesian/broadcast-nested-loop anywhere in the plan."""
    plan = formatted_plan(QUERIES["ext_embed_hard_negatives"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    # the only nested loops allowed are the K=8-row broadcast centroid
    # attaches (Cross BuildRight on a bounded frame); the PAIR join
    # itself must be a real equi join whose keys include the block id
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    key_lines = [
        ln for ln in plan.splitlines() if "keys" in ln and "blk" in ln
    ]
    assert key_lines, f"pair join is not equi-keyed on blk:\n{plan}"
    assert "TakeOrderedAndProject" in plan, plan


def test_bm25_from_store_pruned_no_text_scan(spark, sf_dir):
    """The store-served BM25 query must never touch the documents table
    (the store exists so queries stop paying the corpus text scan), must
    prune the postings scan to the query terms' bucket directories
    (PartitionFilters IN-list — I/O is O(matching postings) at any
    corpus size), and must select via TakeOrderedAndProject with no
    Python eval."""
    plan = formatted_plan(QUERIES["ext_rank_bm25_from_store"](spark, sf_dir))
    assert _scan_count(plan, "documents") == 0, plan
    store_scans = [
        ln
        for ln in plan.splitlines()
        if "Location" in ln and "postings_store_" in ln
    ]
    assert store_scans, f"no postings store scan in plan:\n{plan}"
    pf = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln and "bucket" in ln
    ]
    assert any("IN" in ln for ln in pf), f"bucket IN-list not pruned:\n{plan}"
    assert "TakeOrderedAndProject" in plan, plan
    assert "EvalPython" not in plan, plan


def test_dedup_gate_store_serves_zero_base_text(spark, sf_dir):
    """The streaming dedup gate's base-side inputs (md5 set, rep shingle
    index, rep sizes) must come from the persisted gate store, never the
    documents table — the round-9 fix for the one per-run base TEXT
    rebuild the round-8 gate carried. Once the store exists, every setup
    frame's plan scans gatestore_ directories only."""
    from pyspark.sql import functions as F

    from mongodb_cdc_spark.operators.curation import (
        _gate_setup_frames,
        dedup_gate_store_path,
    )

    d = load_table(spark, sf_dir, "documents")
    cut = int(d.agg(F.expr("(MAX(doc_id) * 9) div 10")).collect()[0][0])
    gate = dedup_gate_store_path(spark, sf_dir, cut)
    for frame in _gate_setup_frames(spark, gate):
        plan = formatted_plan(frame)
        assert _scan_count(plan, "documents") == 0, plan
        assert "gatestore_" in plan, plan
        assert "text" not in plan.split("ReadSchema")[-1], plan


def test_bm25_from_store_lists_only_query_buckets(spark, sf_dir):
    """The round-9 overhead shave: the from-store scan's file index must
    be built from the <= |terms| target bucket directories (basePath
    read), so the store's other ~60 directories are never listed — and
    the first call's cache must leave the served rows identical on a
    warm second call."""
    plan = formatted_plan(QUERIES["ext_rank_bm25_from_store"](spark, sf_dir))
    loc = [ln for ln in plan.splitlines() if "Location" in ln and "postings_base" not in ln and "postings_store_" in ln]
    assert loc, plan
    # the Location line enumerates the explicit bucket=N roots
    assert "bucket=" in loc[0], loc[0]
    cold = [tuple(r) for r in QUERIES["ext_rank_bm25_from_store"](spark, sf_dir).collect()]
    warm = [tuple(r) for r in QUERIES["ext_rank_bm25_from_store"](spark, sf_dir).collect()]
    assert cold == warm and len(cold) == 10


def test_url_canonical_no_text_read_no_python(spark, sf_dir):
    """URL-canonical dedup must be pure codegen string expressions over
    ONE documents scan whose ReadSchema excludes text entirely — the
    whole point of URL dedup is deciding duplicates without reading a
    byte of content."""
    plan = formatted_plan(QUERIES["ext_dedup_url_canonical"](spark, sf_dir))
    assert _scan_count(plan, "documents") == 1, plan
    assert "EvalPython" not in plan, plan
    # single scan -> single ReadSchema line (Location/ReadSchema print on
    # separate lines in formatted mode)
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and all("text" not in ln for ln in rs), rs


def test_hard_pair_mine_bounded_scans(spark, sf_dir):
    """The probe-panel miner must share ONE corpus token scan across all
    probes (plus one for the probe-token derivation) and touch
    embeddings only for candidates + probes — a per-probe corpus rescan
    would show up as extra scans here."""
    plan = formatted_plan(QUERIES["ext_rerank_hard_pair_mine"](spark, sf_dir))
    assert _scan_count(plan, "documents") <= 2, plan
    assert _scan_count(plan, "embeddings") <= 2, plan
    assert "EvalPython" not in plan, plan


def test_matryoshka_bounded_scans(spark, sf_dir):
    """Two rankings x (corpus + probe panel) = at most 4 embeddings
    scans and zero documents scans; both rankings stay in codegen."""
    plan = formatted_plan(QUERIES["ext_embed_matryoshka_eval"](spark, sf_dir))
    assert _scan_count(plan, "embeddings") <= 4, plan
    assert _scan_count(plan, "documents") == 0, plan
    assert "EvalPython" not in plan, plan


def test_phash_from_store_zero_blob_reads(spark, sf_dir):
    """The pHash serving path must read ONLY the persisted signature
    store: zero documents-table scans (no blob/text bytes) and zero
    Python evaluation (the DCT ran once at ingest) — the 100 TB media
    contract where every post-ingest dedup query touches 16 bytes/blob.
    The from-store pair set must equal the from-blobs set exactly
    (same banded algebra over the same persisted signatures)."""
    from mongodb_cdc_spark.operators.multimodal import phash_store_path

    phash_store_path(spark, sf_dir)  # ensure built (outside the pin)
    q = QUERIES["mm_blob_dedup_phash_from_store"](spark, sf_dir)
    plan = formatted_plan(q)
    assert _scan_count(plan, "documents") == 0, plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan, plan
    loc = [
        ln
        for ln in plan.splitlines()
        if ln.lstrip().startswith("Location")
    ]
    assert loc and all("phash_store_" in ln for ln in loc), loc
    from_store = [tuple(r) for r in q.collect()]
    from_blobs = [
        tuple(r)
        for r in QUERIES["mm_blob_dedup_phash"](spark, sf_dir).collect()
    ]
    assert from_store == from_blobs


def test_sort_multikey_input_is_dimension_scale(spark, sf_dir):
    """sort_multikey's global (unpartitioned) rank window is acceptable
    ONLY because its input is the supplier DIMENSION (docstring
    contract). Pin that contract in the plan: the scan under the window
    must read supplier, and no fact-table scan (lineitem / orders /
    events / documents) may appear anywhere in the plan — a refactor
    pointing this operator at a fact table would reintroduce the
    single-task global sort the docstring forbids."""
    df = QUERIES["sort_multikey"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "supplier" in plan, plan
    for fact in ("lineitem", "orders", "events", "documents"):
        assert fact not in plan, f"fact scan {fact} under a global window"
