"""Driver-contract invariants of __spark_entry__ that need no
SparkSession: registry/oracle key parity, and the round-5 rotation that
keeps the high-risk families inside the external correctness gate's
first-50-key sampling window."""

from __future__ import annotations

import __spark_entry__ as entry

# The families where cross-engine drift would hide (hash idioms,
# iterative fixpoints, fusion composites, heavy shared-SQL TPC-H) —
# rotated into the driver's window by plans/queries.py's registry order.
HIGH_RISK = {
    "q66_semantic_dedup",
    "q71_dup_components",
    "q78_minhash_accuracy",
    "q82_ann_rrf_fusion",
    "q83_pagerank",
    "q84_pq_adc_audit",
    "q87_funnel",
    "q92_interval_join",
    "q92b_interval_join_bounds",
    "tpch_q1",
    "tpch_q18",
    "tpch_q21",
}

# Round-6 rotation: the q48–q93 tier had never been externally
# oracle-checked in rounds 1–5 (CORRECTNESS_r01–r05 union); it fills
# the window slots the 1x–5x-green q01–q47 keys vacated.
ROUND6_FRESH = {
    "q48_sketch_stats", "q49_bpe_token_count", "q50_window_battery",
    "q51_string_battery", "q52_null_datetime_battery",
    "q53_in_null_semantics", "q54_hash_split", "q55_per_source_cap",
    "q56_mixture_downsample", "q57_sequence_pack", "q58_moments_battery",
    "q59_kmv_distinct", "q60_repetition_stats", "q61_quality_flags",
    "q62_duplicate_spans", "q63_decontamination", "q64_tfidf_top_terms",
    "q65_kmeans_assign", "q67_doc_chunking", "q68_vocab_coverage",
    "q69_temperature_mixture", "q70_bigram_typicality",
    "q72_length_histogram", "q73_dsir_weights", "q74_typicality_buckets",
    "q75_line_dedup", "q76_weighted_sample", "q77_lateral_topk",
    "q79_token_diversity", "q80_length_zscore", "q81_bm25_search",
    "q85_collocations", "q86_asof_nearest", "q88_cohort_retention",
    "q89_scd2_intervals", "q90_bloom_fp_audit", "q91_salted_join",
    "q93_array_battery",
}


def test_every_query_key_has_an_oracle():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(q) == set(o), (
        f"queries-only: {set(q) - set(o)}; oracles-only: {set(o) - set(q)}"
    )
    assert len(q) >= 133


def test_high_risk_keys_stay_inside_the_driver_window():
    first50 = list(entry.queries())[:50]
    missing = HIGH_RISK - set(first50)
    assert not missing, (
        f"rotated out of the first-50 correctness window: {missing}"
    )


def test_round6_window_is_exactly_pins_plus_fresh_rotation():
    first50 = set(list(entry.queries())[:50])
    assert first50 == HIGH_RISK | ROUND6_FRESH, (
        f"window drift — extra: {first50 - (HIGH_RISK | ROUND6_FRESH)}; "
        f"missing: {(HIGH_RISK | ROUND6_FRESH) - first50}"
    )


def test_q92_leads_the_window_until_driver_green():
    assert list(entry.queries())[:2] == [
        "q92_interval_join",
        "q92b_interval_join_bounds",
    ]


def test_oracle_order_mirrors_registry_order():
    assert list(entry.oracle_sql()) == list(entry.queries()), (
        "a driver sampling the first N keys of either dict must see the "
        "same window"
    )
