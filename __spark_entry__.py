"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``sql_engine_spark/``; the query matrix
(Spark callables + oracle SQL, one entry per implemented operator from
SURVEY.md §2) is registered in ``sql_engine_spark/matrix/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql_engine_spark import matrix  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-style revenue
    by nation (6-table join → broadcast dims → grouped exact-cents
    aggregation). Exercises scan, filter pushdown, equi-join, broadcast,
    and grouped aggregation in one plan (SURVEY.md §7 phase 1)."""
    return matrix.QUERIES["q5_local_supplier_volume"](spark, "/root/testdata/sf0.001")


# The driver's budgeted CORRECTNESS run records rows for the FIRST ~50
# registered entries — the iteration order of this dict decides which
# entries get a hard correctness signal each round. Permanent policy
# (VERDICT r4 item #1): order = (last-official-row round ASCENDING,
# changed-files first) — an entry whose implementation file was
# rewritten AFTER its last official row goes stale and must re-run
# before anything that merely has an old row on unchanged code. Names
# missing from the list (future additions) sort first of all.
_DRIVER_ORDER = [
    # -- r16 rotation (VERDICT r15 #3): changed-files first — the r16
    # diff touched operators/dedup.py (scaled_join_partitions' Spark
    # Connect degradation, ADVICE r15), so the dedup family and the
    # pipeline/multimodal consumers of that helper (x38/x54/x56/x63/s08)
    # jump the queue. Then pure staleness ascending, mechanically
    # computed from CORRECTNESS_r01-r15 latest rows: all 14 r12-latest
    # entries (e06-e10, g01-g05, x11, x22, x30, x58), then the 49-entry
    # r13 cohort (similarity block, g06-g31, q-family) to the ~50
    # budget, then the r14 and r15 cohorts (freshest rows last). ----
    "x05_dedup_simhash", "x02_dedup_ngram_jaccard", "x04_dedup_minhash_lsh",
    "x20_dedup_components", "x01_dedup_exact", "x03_dedup_survivors",
    "x53_dup_cluster_stats", "x57_component_splits", "x38_containment",
    "x54_incremental_dedup", "x56_chunk_dedup", "x63_image_dup_pairs",
    "s08_stream_ingest_dedup", "x30_mergeable_distinct", "x11_text_langid",
    "x22_text_sentiment", "x58_weighted_sample", "e06_cross_join",
    "e07_implicit_equi_join", "e08_distinct", "e09_aggregates",
    "e10_agg_after_where", "g01_order_by_limit", "g02_limit_offset",
    "g03_group_by_having", "g04_union_all", "g05_union_distinct",
    "x18_sim_ivf", "x59_semantic_dedup", "x60_kmeans_refine",
    "x06_sim_topk_brute", "x07_sim_ann_lsh", "x08_sim_dup_pairs",
    "x48_multi_query_topk", "x49_knn_classify", "g06_intersect",
    "g07_except", "g08_join_explicit_agg", "g09_join_left",
    "g10_natural_join", "g11_between_in", "g12_in_subquery",
    "g13_not_exists", "g14_like", "g15_case_cast", "g16_arithmetic",
    "g17_string_funcs", "g18_null_handling", "x33_contamination",
    "g19_window_topn", "g20_scalar_subquery", "g21_count_distinct",
    "g22_rollup", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "g23_exists", "g24_derived_table",
    "g25_regexp", "g26_bit_shift", "g27_date_funcs", "g28_math_funcs",
    "g29_cube", "q4_order_priority", "q12_priority_class",
    "q14_promo_revenue", "q18_large_orders", "q19_disjunctive",
    "g30_stats_exact", "q10_returned_revenue", "g31_correlated_scalar",
    "q6_forecast_revenue", "q7_nation_volume", "q13_customer_distribution",
    "q17_small_quantity_revenue", "q8_market_share", "q15_top_supplier",
    "q22_sales_opportunity", "s01_stream_tumbling", "s03_stream_sliding",
    "s04_stream_dedup", "s05_stream_session_window",
    "s02_stream_sessionize", "s06_stream_interval_join",
    "x34_tfidf_topterms", "x35_sequence_packing", "x36_regex_scrub",
    "x37_repetition", "x39_vocab_oov", "x40_curation_pipeline",
    "x41_domain_mix", "x42_length_histogram", "x43_bigram_rarity",
    "x45_split_assignment", "s07_stream_static_enrich",
    "x09_text_token_stats", "x10_text_quality", "x12_text_fingerprint",
    "x13_events_json", "x14_sessionize_batch", "x15_window_tumbling_batch",
    "x17_text_bpe_tokens", "x21_salted_agg", "x23_hierarchical_rollup",
    "x24_asof_join", "x25_range_join", "x27_skyline",
    "x44_cross_source_dups", "x46_source_cap", "x47_token_budget",
    "x51_span_dups", "x55_crossmodal_agreement", "x64_source_divergence",
    "x65_quality_dedup", "x66_event_funnel", "x67_retention_cohorts",
    "x68_event_anomalies", "s09_stream_late_accounting",
    "x16_multimodal_features", "x19_multimodal_frames",
    "x26_multimodal_resize", "x32_multimodal_decode",
    "x69_quarantine_classes", "x61_epoch_upsample", "x62_phrase_mining",
    "x28_stratified_sample", "x31_embedding_centroid", "g32_array_funcs",
    "g33_window_frames", "g34_grouping_sets", "g35_pivot",
    "g36_not_in_subquery", "g37_intersect_except_all", "g38_cte_reuse",
    "q21_waiting_supplier", "g39_lateral_explode", "g40_qualify_topn",
    "g41_string_agg", "g42_values_inline", "g43_percentiles", "g44_ntile",
    "g45_recursive_cte", "g46_full_outer", "g47_quantified_all",
    "g48_semi_anti_join", "g49_grouping_id", "g50_rank_family",
    "x50_stopword_stats", "x52_quality_stratified", "e01_scan_project",
    "e02_star", "e03_filter_comparisons", "e04_filter_andor_tree",
    "e05_negative_literal", "x29_sketch_profile"
]

def _driver_sorted(d: dict) -> dict:
    rank = {n: i for i, n in enumerate(_DRIVER_ORDER)}
    return {k: d[k] for k in sorted(d, key=lambda n: rank.get(n, -1))}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _driver_sorted(dict(matrix.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for EVERY entry (the rows-only
    class has been empty since r9). The once-engine-internal families
    became hard oracle rows via portable reformulations — md5-prefix
    hash families, hex-domain byte replay, literal-centroid retrains
    regenerated per sf via matrix.ORACLE_BUILDERS (the driver's static
    strings target its sf0.01 contract), and an integer HDR histogram
    in place of the GK sketch; BASELINE.md r6–r9 has the history."""
    return _driver_sorted(dict(matrix.ORACLE))
