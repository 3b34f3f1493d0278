"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -- flagship query (TPC-H Q1-style) on sf0.001.
queries()      -- every implemented operator, name -> (spark, sf_dir) -> DataFrame.
oracle_sql()   -- matching DuckDB-runnable ANSI SQL per query (omitted
                  only for genuinely non-SQL-expressible operators).

All real logic lives in parquet_to_sql_spark/; this file is glue.

Driver-window rotation: the driver's correctness gate checks the
FIRST 50 entries of ``queries()`` in dict INSERTION order
(established by VERDICT r02 and re-confirmed every round since:
CORRECTNESS_rNN's key set equals ``list(queries())[:50]``).  So no
alias layer is needed — ``queries()`` emits the 50-slot priority
window first, then every remaining query in least-recently-verified
order.  Exactly one registry entry per query.

Window 6 composition (installed per VERDICT r05 "Next round" #1):

  1. the 17 round-5-new queries — the only names with ZERO driver
     evidence across CORRECTNESS_r01..r05 (``_NEVER_VERIFIED``);
  2. the 15 stale-evidence names whose build source changed after
     their last driver-green round (``_REVERIFY`` — formerly
     ``_REVERIFY_QUEUED``, now spending real slots);
  3. 18 least-recently-verified spares (``_LRV_SPARES``) — the
     oldest oracle-backed evidence in the ledger (all r01 rows),
     refreshed under the standing LRV-rotation policy.

Green across the board => all 229 queries that existed at the freeze
get driver evidence with zero stale rows (the registry has since
grown to 255 — round-6 additions queue in ``_QUEUED_POST_WINDOW`` and
front window 7 with the ``_REVERIFY_QUEUED`` operator-rewrite names;
recipe in ROUND_NOTES R6-25).  From window 7 on, every window is pure
LRV rotation, front-loading any query whose implementing source
changed since its last green row (``_REVERIFY`` declares those so the
parity test can tell a deliberate re-check from a wasted slot).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parquet_to_sql_spark.queries.registry import all_queries  # noqa: E402
from parquet_to_sql_spark.session import apply_runtime_confs  # noqa: E402

# Canonical names with >=1 CORRECTNESS_r01..r05 row (hash-green, or
# the rows-only self-verifying sketch queries).  Derived from the
# recorded artifacts; tests/test_oracle_parity.py re-derives and
# asserts it.
_DRIVER_VERIFIED = frozenset(
    {
        # --- r05 window (CORRECTNESS_r05.json, 50/50 green) ---
        "agg_argmax_per_group", "agg_bitmap_distinct",
        "agg_group_ols_price_qty", "agg_heavy_hitters_mg",
        "agg_listagg_within_group",
        "dedup_containment_ngram", "dedup_segment_blocks",
        "dedup_simhash_incremental", "dedup_winnow_overlap",
        "embedding_gram_matrix", "simsearch_filtered_topk",
        "simsearch_ivfpq_adc_topk", "simsearch_knn_classify",
        "simsearch_pq_adc_topk", "simsearch_recall_audit",
        "simsearch_rrf_fusion", "text_bm25_rational",
        "ev_bitmap_rollup_weekly_users", "ev_cohort_retention_matrix",
        "ev_ewma_user_value", "ev_funnel_three_step", "ev_gapfill_linear",
        "ev_hourly_anomaly_mad", "ev_peak_concurrency",
        "ev_sliding_distinct_users", "ev_time_weighted_avg",
        "ev_value_log2_histogram",
        "fn_bitwise", "fn_collated_match", "fn_edit_distance",
        "fn_higher_order_arrays", "fn_inline_generators",
        "fn_interval_arithmetic", "fn_try_arithmetic", "fn_url_parse",
        "fn_variant_json", "fn_xml_roundtrip", "fn_zorder_key",
        "join_asof_forward", "join_lateral_top_order", "join_null_safe",
        "join_range_binned", "join_semi", "join_skew_salted",
        "sub_relational_division", "udf_arrow_grouped_stats",
        "window_pareto_abc", "window_running_distinct",
        "window_running_median",
        # (q1_pricing_summary was the r05 re-verify slot; listed in r03 block)
        # --- r04 window (CORRECTNESS_r04.json, 50/50 green) ---
        "pipeline_corpus_clean", "pipeline_corpus_curation",
        "pipeline_cdc_upsert", "pipeline_train_split_manifest",
        "pipeline_pack_sequences", "pipeline_mixture_sample",
        "pipeline_curriculum_bins", "pipeline_merge_into_semantics",
        "pipeline_incremental_distinct_bitmap", "pipeline_dataset_card",
        "sql_engine_nation_revenue", "sql_engine_window_qualify",
        "sql_engine_recursive_reach", "sql_engine_group_by_all",
        "sql_engine_pivot_syntax", "sql_engine_distribute_by",
        "sql_engine_pipe_syntax", "sql_engine_parameterized",
        "sql_engine_star_except",
        "text_simhash", "text_lang_distribution",
        "text_word_counts_top20", "text_gopher_rules",
        "text_top_terms_per_doc", "text_contamination_check",
        "text_repetition_ratios", "text_winnowing_fingerprints",
        "text_pii_redaction", "text_vocab_coverage",
        "text_keyword_search", "text_bpe_pair_merges",
        "text_rarity_score", "text_cooccurrence_pmi",
        "text_source_divergence_l1", "text_lang_confusion",
        "multimodal_decode_features", "multimodal_audio_features",
        "multimodal_frame_samples", "multimodal_resize_thumbnail",
        "multimodal_ahash_neardup",
        "sample_deterministic", "sample_stratified_hash",
        "sample_bottom_k", "profile_constraints",
        "profile_orders_columns", "groupedmap_spend_share",
        "dedup_graph_triangles", "dedup_cc_star",
        "dedup_graph_pagerank", "setop_intersect",
        # --- r03 window (CORRECTNESS_r03.json, 50/50 green) ---
        "q1_pricing_summary", "q2_min_per_group", "q3_shipping_priority",
        "q4_order_priority", "q5_local_supplier_volume",
        "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
        "q9_product_profit", "q10_returned_items",
        "q11_value_concentration", "q12_priority_shipping",
        "q13_customer_distribution", "q14_promo_effect",
        "q15_top_supplier", "q16_supplier_cnt", "q17_small_quantity",
        "q18_large_orders", "q19_disjunctive", "q20_excess_shippers",
        "q21_waiting_suppliers", "q22_global_sales",
        "window_first_last", "window_ignore_nulls",
        "window_lag_lead_events", "window_moving_avg",
        "window_pct_cume_nth", "window_range_frame",
        "window_rank_dense_ntile", "window_running_sum",
        "window_time_range_frame", "window_topn_per_customer",
        "setop_except", "setop_intersect_except_all", "setop_union_all",
        "setop_union_by_name", "sub_in_top_nations",
        "sub_scalar_above_avg_price", "simsearch_cosine_topk",
        "simsearch_hyperplane_lsh", "simsearch_ivf_kmeans_topk",
        "simsearch_ivf_topk", "udtf_chunk_documents",
        "udaf_pandas_weighted_avg", "udf_iter_quantized_norm",
        "import_job_spec_roundtrip", "sort_nulls_explicit",
        "topk_expensive_orders", "text_profile_documents",
        "multimodal_pack_metadata",
        # --- r01/r02 rows ---
        "agg_approx_sketches", "agg_boolean_filtered", "agg_cube_orders",
        "agg_distinct_suppliers", "agg_grouping_id", "agg_grouping_sets",
        "agg_having", "agg_percentiles", "agg_pivot_status",
        "agg_price_histogram", "agg_rollup_geo", "agg_salted_two_phase",
        "agg_sketch_rollup_union", "agg_stats_dispersion",
        "agg_string_collect", "agg_unpivot_part_measures",
        "cogroup_customer_orders", "dedup_canonical_by_priority",
        "dedup_connected_components", "dedup_embedding_cosine",
        "dedup_embedding_ivf_blocked", "dedup_embedding_lsh_verified",
        "dedup_exact_sha256", "dedup_minhash_lsh",
        "dedup_minhash_signatures", "dedup_ngram_jaccard",
        "dedup_ngram_jaccard_hashed", "dedup_simhash_buckets",
        "dedup_simhash_hamming", "embedding_norm_stats",
        "embedding_quantize_int8", "ev_dedup_first_per_key",
        "ev_funnel_signup_purchase", "ev_gapfill_daily",
        "ev_gaps_and_islands", "ev_retention_day1", "ev_scd2_intervals",
        "ev_session_windows", "ev_sliding_windows", "ev_tumbling_hourly",
        "fn_array_documents", "fn_conditional", "fn_date_orders",
        "fn_epoch_seconds", "fn_from_json_struct", "fn_json_events",
        "fn_map_expressions", "fn_math_customer", "fn_posexplode_words",
        "fn_regexp_replace_backref", "fn_string_part", "fn_try_cast",
        "import_bool_null_render", "import_copy_wire_format",
        "import_rename_projection", "import_timestamp_render",
        "join_anti", "join_asof_purchases", "join_asof_tolerance",
        "join_cross", "join_full_outer", "join_left_outer",
        "join_range_bands",
    }
)

# The 17 names with zero driver evidence across CORRECTNESS_r01..r05
# (all round-5 additions; each already passes the local oracle at
# sf0.01 AND sf0.1 — tests/test_oracle_parity.py).  Window slots 1-17.
_NEVER_VERIFIED = (
    "dedup_kcore_3", "dedup_minhash_error_audit", "dedup_prefix_jaccard",
    "dedup_repeated_spans", "dedup_snm_recall_audit",
    "dedup_sorted_neighborhood", "join_asof_nearest",
    "pipeline_bloom_screen_orders", "profile_gini_concentration",
    "sample_weighted_pps", "simsearch_int_matmul_topk",
    "simsearch_mmr_rerank", "sql_engine_execute_immediate",
    "sql_engine_identifier_clause", "sql_engine_sql_table_udf",
    "sql_engine_sql_udf", "window_global_prefix_sum",
)

# Deliberate re-verification slots: driver-green under an OLDER
# formulation; build source changed since (detected by
# tests/test_oracle_parity.py::test_changed_queries_have_a_reverify_plan).
# All re-proven locally at sf0.1.  Window slots 18-32.
_REVERIFY = (
    # r4 integer-cents rewrites (green r3)
    "q3_shipping_priority", "q5_local_supplier_volume",
    "q10_returned_items",
    # r5 assume_unique parameter (green r4)
    "dedup_graph_triangles", "dedup_graph_pagerank",
    # r3/r4 edits after r1/r2 green rows (historical blind spot,
    # surfaced when the change detector landed in r5)
    "agg_grouping_id", "agg_sketch_rollup_union",
    "join_asof_purchases", "join_asof_tolerance",
    "ev_gaps_and_islands", "ev_scd2_intervals",
    "dedup_embedding_cosine", "dedup_embedding_lsh_verified",
    "dedup_embedding_ivf_blocked", "simsearch_ivf_topk",
)

# Least-recently-verified spares: the 18 oracle-backed names with the
# oldest driver evidence (all r01 rows) not already in this window —
# the head of the standing LRV ordering, re-derived and asserted by
# the parity test.  Window slots 33-50.
_LRV_SPARES = (
    "ev_session_windows", "ev_sliding_windows", "ev_tumbling_hourly",
    "fn_array_documents", "fn_conditional", "fn_date_orders",
    "fn_epoch_seconds", "fn_from_json_struct", "fn_json_events",
    "fn_map_expressions", "fn_math_customer", "fn_posexplode_words",
    "fn_regexp_replace_backref", "fn_string_part", "fn_try_cast",
    "import_bool_null_render", "import_copy_wire_format",
    "import_rename_projection",
)

# Round-6 window: 17 never-verified + 15 stale re-verifies + 18 LRV
# spares, in the insertion order the driver will check them.  Green
# across the board => 229/229 with driver evidence, zero stale rows.
_PRIORITY_R06 = _NEVER_VERIFIED + _REVERIFY + _LRV_SPARES

# Queries added AFTER this round's window was frozen.  They queue at
# the head of the least-recently-verified tail and front window 7.
_QUEUED_POST_WINDOW: tuple[str, ...] = (
    "dedup_span_excision",    # round-6 new: keep-first excision offsets
    "agg_exact_quantiles_histogram",  # round-6 new: exact quantiles, no sort
    "dedup_span_excision_apply",  # round-6 new: apply the cuts row-locally
    "text_decontamination_offsets",  # round-6 new: eval-set decontamination
    "pipeline_decontamination_report",  # round-6 new: per-source cut stats
    "ev_rfm_segments",  # round-6 new: scale-safe quintile segmentation
    "simsearch_hard_negatives",  # round-6 new: contrastive negative mining
    "pipeline_token_budget_select",  # round-6 new: budget-capped selection
    "agg_weighted_quantiles_tokens",  # round-6 new: token-mass percentiles
    "pipeline_mix_rebalance_report",  # round-6 new: mixture rebalance factors
    "text_ngram_novelty",  # round-6 new: corpus-order shingle novelty
    "agg_mode_per_group",  # round-6 new: skew-safe exact mode
    "pipeline_quality_ablation_report",  # round-6 new: per-rule attribution
    "text_hash_feature_classify",  # round-6 new: hashing-trick linear model
    "join_interval_overlap",  # round-6 new: binned interval-overlap join
    "pipeline_epoch_shuffle",  # round-6 new: distributed epoch permutation
    "text_bpe_encode",  # round-6 new: apply learned BPE merges, row-local
    "ev_event_transitions",  # round-6 new: Markov transition matrix
    "ev_time_to_convert",  # round-6 new: two-event funnel latency
    "text_zipf_histogram",  # round-6 new: log-log type/token curve
    "pipeline_shard_manifest",  # round-6 new: sharded-export manifest
    "dedup_cluster_size_profile",  # round-6 new: dup-cluster histogram
    "ev_wau_mau_stickiness",  # round-6 new: WAU/MAU engagement ratio
    "simsearch_mrr_eval",  # round-6 new: rank-aware retrieval eval
    "sql_engine_session_variables",  # round-6 new: DECLARE/SET VAR handoff
    "source_binaryfile_manifest",  # round-6 new: blob-source manifest
    "ev_interarrival_histogram",  # round-6 new: gap distribution
    "ev_dow_hour_heatmap",  # round-6 new: load-shape heatmap
    "profile_sequence_gaps",  # round-6 new: distributed global lead
)

# Verified queries whose build source OR implementing operator
# changed after their last driver-green round but could not get a
# slot this round (window full).  Each must pass sf0.1 oracle parity
# while it waits; they front window 7 alongside _QUEUED_POST_WINDOW.
_REVERIFY_QUEUED: tuple[str, ...] = (
    # r6 simhash single-fold rewrite (operators/text.py: simhash_col /
    # simhash_sketch / new simhash_from_hashes) — bit-identical on the
    # full sf0.1 corpus, but the shipped code differs from what the
    # driver last saw
    "dedup_simhash_buckets", "dedup_simhash_hamming",
    "dedup_canonical_by_priority", "text_simhash",
    "dedup_simhash_incremental",
    # r6 ADC map-lookup rewrite (operators/simsearch.py)
    "simsearch_pq_adc_topk", "simsearch_ivfpq_adc_topk",
)


def _last_verified_round() -> dict[str, int]:
    """name -> latest round with a green (or rows-only no_oracle)
    CORRECTNESS row, derived from the recorded artifacts on disk.
    Names never verified are absent."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for key, row in rows.items():
            canon = key
            for prefix in ("a2_", "a9_"):  # r1/r2 alias-era prefixes
                if canon.startswith(prefix):
                    canon = canon[len(prefix):]
            if row.get("hash_match") or row.get("err") == "no_oracle":
                last[canon] = max(last.get(canon, 0), rnd)
    return last


def _ordered_names() -> list[str]:
    """Priority batch first (driver checks queries()[:50]); the tail
    in least-recently-verified order (standing policy: stalest driver
    evidence first, never-verified newest additions ahead of that),
    ties broken by name.  So if the driver ever widens its window, it
    reaches the names whose evidence is oldest before re-treading
    fresh green rows — and future rounds build their priority batch by
    taking the head of this same ordering."""
    last = _last_verified_round()
    in_window = set(_PRIORITY_R06)
    rest = sorted(
        (n for n in all_queries() if n not in in_window),
        key=lambda n: (last.get(n, 0), n),
    )
    return list(_PRIORITY_R06) + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_confs(spark)
    q = all_queries()["q1_pricing_summary"]
    return q.build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    qs = all_queries()
    return {name: qs[name].build for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query that is SQL-expressible."""
    qs = all_queries()
    return {
        name: qs[name].oracle
        for name in _ordered_names()
        if qs[name].oracle is not None
    }
