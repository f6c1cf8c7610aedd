"""sf1 scale rehearsal (VERDICT r1 item 8).

No /root/testdata/sf1 exists, so synthesize a 10x replica of sf0.1
into the gitignored .scratch/ — each copy's keys shifted by a large
stride so key cardinality scales 10x too (dedup/join semantics stay
non-degenerate: text/embedding payloads repeat, which if anything
STRESSES the dedup paths with 10x more true duplicate groups). Then
run the heavy operators end-to-end and print per-query timings.

Dimension tables (region/nation/customer/supplier/part) are copied
1x unchanged — at 100 TB the facts grow, the dims don't; fact FK
columns are left in-range so joins keep matching.

Run:  python tools/sf1_rehearsal.py            # build + run (10x)
      python tools/sf1_rehearsal.py --reuse    # skip rebuild
      python tools/sf1_rehearsal.py --copies=100 --only=a,b  # 100x slice
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mongodb_cdc_spark.session import get_spark  # noqa: E402
from mongodb_cdc_spark.sources.changefeed import scratch_root  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10  # override with --copies N (e.g. 100 for the sf10-ish run)
STRIDE = 10_000_000  # far above any sf0.1 key

# fact table -> columns to shift per copy (payload columns repeat)
FACTS = {
    "events": ["event_id"],  # user_id kept: 10x events per user (realistic)
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey"],  # o_custkey kept in-range for joins
    "lineitem": ["l_orderkey"],  # same stride as orders: FK stays consistent
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

HEAVY = [
    "agg_hash_groupby",
    "join_asof_latest",
    "win_latest_per_key",
    "cdc_apply_upsert",
    "ext_dedup_exact",
    "ext_dedup_near_minhash",
    "ext_dedup_simhash",
    "ext_sim_cosine_topk",
    "ext_sim_ann_ivf",
    "ext_text_wordcount",
    "topk_orders",
    "ext_repetition_stats",
    "ext_doc_chunks",
    "ext_sim_knn_join",
    "join_bucketed",
    # round-2 tier (VERDICT r2 item 6): the scale-mechanism and
    # CDC-evolution operators at 10x
    "ext_sim_lsh_topk",
    "ext_dedup_cluster",
    "join_skew_salted",
    "agg_countmin_sketch",
    "agg_hll_partial_merge",
    "cdc_schema_drift",
    "cdc_apply_tombstone",
    "ext_split_contamination",
    "ext_pack_sequences",
    # round-3 tier: SCD2/time-travel CDC, corpus analysis, statistics
    # and corpus-quality operators
    "cdc_scd2_history",
    "cdc_point_in_time",
    "ext_collocations",
    "ext_heavy_hitters",
    "ext_sample_weighted",
    "maintenance_zorder_key",
    "agg_histogram_bins",
    "agg_corr_regression",
    "agg_retention_cohort",
    "maintenance_table_stats",
    "cdc_op_ratio_guard",
    "ext_embed_centroids",
    "ext_dedup_incremental",
    "ext_bigram_novelty",
    "ext_sim_ann_pq",
    "join_bloom_pruned",
    "agg_segment_overlap",
    "sql_tpch_q3",
    "sql_tpch_q5",
    "sql_tpch_q10",
    "ml_kmeans_refine",
    "cdc_idempotency_audit",
    "ext_sample_topk_hash",
    "udtf_table_args",
    # late round-3 tier: layout pruning + remaining TPC-H shapes
    "scan_partitioned_pruned",
    "sql_tpch_q4",
    "sql_tpch_q6",
    "sql_tpch_q14",
    "sql_tpch_q18",
    "ext_shuffle_shards",
    "ext_dedup_containment",
    "agg_bitmap_distinct",
    "scan_schema_merge",
    "source_pydatasource_pushdown",
    "agg_bitmap_range_merge",
    "agg_bitmap_audience_ops",
    "sql_tpch_q19",
    "cdc_resume_gap_detect",
    "cdc_bootstrap_sync",
    # TPC-H completion + time-series/graph/ER tier at 10x
    "sql_tpch_q2",
    "sql_tpch_q7",
    "sql_tpch_q8",
    "sql_tpch_q9",
    "sql_tpch_q13",
    "sql_tpch_q17",
    "sql_tpch_q21",
    "sql_tpch_q22",
    "ts_gapfill_daily",
    "win_streak_days",
    "graph_triangle_count",
    "win_ntile_pctrank",
    # round-4 curation tier
    "ext_ngram_dup_coverage",
    "ext_semantic_dedup",
    "ext_dsir_select",
    "graph_pagerank",
    "ext_fuzzy_block_match",
    "ts_rolling_wau",
    "ts_anomaly_zscore",
    "cdc_dbhash_buckets",
    "win_pattern_triples",
    "ts_cumulative_users",
    "ts_wow_growth",
    "sql_null_semantics",
    "ext_winsorize",
    "fn_array_hof",
    "win_ratio_to_report",
    "agg_filtered_distinct",
    # final round-3 tier at 10x
    "cdc_snapshot_time_travel",
    "cdc_ivm_aggregate",
    "agg_string_agg",
    "fn_try_arith",
    "ext_bpe_vocab_merges",
    "ext_bpe_tokenize_apply",
    "scan_corrupt_records",
    "win_rolling_median",
    "fn_url",
    "ext_bitext_mine_margin",
    "udf_arrow_optimized",
    "api_pandas_on_spark",
    "win_lag_ignore_nulls",
    "ext_dedup_segments",
    "mm_scan_binary_files",
    "ext_lm_predictability",
    "agg_markov_transitions",
    # late round-4 additions at 10x
    "join_asof_tolerance",
    "ts_downsample_m4",
    "ext_dedup_from_store",
    "ext_temperature_mix",
    "ext_token_budget_fill",
    "ext_source_cap",
    "ext_embed_knn_eval",
    "stat_ab_ttest",
    "ts_changepoint_cusum",
    "stat_benford_digits",
    "join_asof_nearest",
    "stat_ks_drift",
    "agg_skyline_pareto",
    # round-5 additions at 10x
    "ext_dedup_cluster_from_store",
    "stream_stateful_upsert_jvm",
    "ts_seasonal_index",
    "ts_ewma_halflife",
    "ext_embed_norm_stats",
    "ext_token_diversity",
    "agg_basket_lift",
    "win_distinct_count_frame",
    "join_interval_overlap",
    "sink_dynamic_partition_overwrite",
    "ext_sim_ivf_recall_eval",
    "cdc_ivm_join",
    "maintenance_vacuum",
    "ext_bpe_coverage_eval",
    "maintenance_projection_store",
    "maintenance_edge_store",
    "graph_pagerank_from_store",
    "maintenance_edge_refresh",
    "graph_triangle_from_store",
    "maintenance_signature_refresh",
    "ext_semantic_dedup_from_store",
    "ext_sim_ivf_multiprobe_recall",
    "maintenance_ivf_store",
    "ext_sim_ann_from_store",
    "maintenance_ivf_refresh",
    "stream_ivf_ingest",
    # round-6 overflow tier (round-7 window)
    "maintenance_pq_store",
    "ext_sim_ivfpq_rerank",
    "ext_sim_ivfpq_recall_eval",
    "ext_dedup_span_remove",
    "stat_chi_square",
    "stat_mann_whitney",
    "ts_interpolate_linear",
    "stream_upsert_dlq",
    "ext_embed_outlier_filter",
    "ext_embed_hard_negatives",
    "maintenance_pq_refresh",
    "stat_mad_robust",
    "ml_linear_regression_normal",
    "cdc_referential_audit",
    "ts_autocorrelation",
    "win_hampel_outliers",
    "sql_group_by_all",
    "fn_edit_distance",
    "agg_simpson_diversity",
    "ml_logistic_newton_step",
    "ts_theil_sen_trend",
    "stat_bootstrap_ci",
    "ext_rank_bm25",
    # round-8 additions: the BM25 postings store build (one-time cost,
    # expected ~linear in corpus) and the store-served query (expected
    # ~flat: work is O(matching postings), text never read)
    "maintenance_postings_store",
    "ext_rank_bm25_from_store",
    "stream_dedup_minhash",
    "agg_quantile_partial_merge",
    "ext_rerank_crossmodal_eval",
    "maintenance_postings_refresh",
    "ext_rank_rrf_fusion",
    "ml_nb_text_classify",
    "stream_quantile_partials",
    "ext_embed_quantize_int8",
    "mm_audio_window_features",
    "cdc_ivm_topk",
    "maintenance_rebucket",
    "graph_link_predict_from_store",
    "win_time_range_frame",
    "stat_permutation_test",
    # round-9 tier
    "maintenance_dedup_gate_store",
    "stream_dedup_minhash",
    "stream_postings_ingest",
    "cdc_ivm_topk_tombstone",
    "mm_image_window_features",
    "ext_dedup_url_canonical",
    "ext_rerank_hard_pair_mine",
    "ext_rank_bm25_from_store",
    "maintenance_dedup_gate_refresh",
    "mm_video_scene_cut",
    "ext_embed_matryoshka_eval",
    "mm_blob_dedup_phash",
    "cdc_ivm_distinct",
    "stream_url_dedup_ingest",
    # round-11 tier
    "stream_corpus_pipeline_xwave",
    "ext_dedup_skew_stress",
    "maintenance_evalgram_store",
    "maintenance_evalgram_refresh",
    "stream_decontam_ingest",
    "cdc_ivm_topk",
    # round-11 extended-session tier (bloom membership)
    "ext_dedup_bloom",
    "maintenance_bloom_store",
    "maintenance_bloom_refresh",
    "stream_bloom_dedup_ingest",
    # round-11 forget tier (refcounted deletion, batch + streaming)
    "maintenance_refcount_store",
    "maintenance_forget_purge",
    "ext_forget_readmit_audit",
    "maintenance_wave_rollback",
    "stream_refcount_ingest",
    "maintenance_refcount_refresh",
    "maintenance_sem_rank_forget",
    "maintenance_url_forget",
]


def build(spark, out: str, copies: int = COPIES) -> None:
    for t, keys in FACTS.items():
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        shifted = None
        for i in range(copies):
            c = src
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * STRIDE))
            shifted = c if shifted is None else shifted.unionByName(c)
        shifted.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"  built {t}: {spark.read.parquet(f'{out}/{t}.parquet').count()} rows")
    for t in DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )


def main() -> None:
    copies = COPIES
    for a in sys.argv[1:]:
        if a.startswith("--copies="):
            copies = int(a.split("=", 1)[1])
    name = "sf1ish" if copies == 10 else f"sf{copies//10}ish"
    out = os.path.join(scratch_root(), name)
    spark = get_spark(app_name="sf-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    if "--reuse" not in sys.argv or not os.path.isdir(out):
        t0 = time.time()
        build(spark, out, copies)
        print(f"build: {time.time() - t0:.1f}s")

    import __spark_entry__ as e

    qs = e.queries()
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = {s.strip() for s in a.split("=", 1)[1].split(",")}
    names = [n for n in HEAVY if only is None or n in only]
    if only is not None:
        unknown = only - set(HEAVY)
        if unknown:
            # no silent caps: an --only key outside HEAVY is a typo or a
            # missing HEAVY entry, never a quiet skip
            sys.exit(f"--only keys not in HEAVY (add them first): {sorted(unknown)}")
    # Warm the JVM/codegen/Python-worker pool per selected query at
    # sf0.001 BEFORE any timed run: the baseline loop runs first and was
    # billing first-execution JIT + localCheckpoint setup to whichever
    # query came first (measured: a 2.4x phantom 'regression' on
    # ext_sim_lsh_topk cold vs warm).
    warm_sf = SRC.replace("sf0.1", "sf0.001")
    for name in names:
        try:
            # warm through the NOOP SINK, same as the timed pass: count()
            # would let Catalyst prune exactly the plan arms (unreferenced
            # outer joins) whose first-execution JIT the warmup exists to
            # absorb — the ext_semantic_dedup count()-elimination lesson
            qs[name](spark, warm_sf).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass  # a key that can't run at sf0.001 still gets JVM warmth
    def _materialize(df) -> int:
        # Full noop-sink materialization, NOT count(): count() lets
        # Catalyst prune unreferenced columns and ELIMINATE whole joins
        # (a distinct-keyed outer join vanished under count() and made a
        # quadratic pair stage look O(1) — the ext_semantic_dedup 100x
        # false-green, SCALING.md round-4). The noop write consumes every
        # output column, so nothing silently drops out of the timing.
        df.write.format("noop").mode("overwrite").save()
        return -1  # row count intentionally not recomputed (extra job)

    # The signature store is an ingest-time maintenance artifact: build it
    # for every dir a from-store key will read BEFORE the timed loops, so
    # those rows measure the amortized query path (same rule as bench.py).
    if any(n.endswith("_from_store") for n in names):
        from mongodb_cdc_spark.operators.curation import signature_store_path

        signature_store_path(spark, out)
        if "--baseline" in sys.argv:
            signature_store_path(spark, SRC)

    baseline = {}
    if "--baseline" in sys.argv:
        for name in names:
            t0 = time.time()
            _materialize(qs[name](spark, SRC))
            baseline[name] = round(time.time() - t0, 2)
            print(f"  [sf0.1] {name}: {baseline[name]}s")
    timings = {}
    for name in names:
        t0 = time.time()
        _materialize(qs[name](spark, out))
        timings[name] = round(time.time() - t0, 2)
        print(f"  {name}: {timings[name]}s")
    rec = {"sf": f"{copies}x sf0.1", "queries": timings}
    if baseline:
        rec["sf0.1_baseline"] = baseline
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
