"""Driver-contract invariants of __spark_entry__ that need no
SparkSession: registry/oracle key parity, and the round-10 rotation —
the r10-new keys (q130/q131) in front for first external driver
contact, the r10-changed-code sentinels (q73 widen/engine tiering,
q123 width_observation, q40/q116 vectorized decode stats, q128 drain
gate, q65/q66 per ADVICE-r9 #4 — the r9 clustering reroute's first
driver contact), the q126 bench-watch re-contact, then the
longest-unvisited breadth tier (the hash-mechanism and LLM-pipeline
families none of which were sampled in the r9 first-50), plus the
standing q92b retirement (window + bench sweep only; oracle and
pytest parity coverage remain via RETIRED)."""

from __future__ import annotations

import __spark_entry__ as entry

# First-contact tier: r10-new keys the driver has never checked.
ROUND10_FRESH = [
    "q130_chunk_decontam",
    "q131_ngram_novelty",
]

# Keys whose code paths CHANGED in round 10 — regression sentinels —
# plus the q126 bench-watch re-contact.
ROUND10_SENTINELS = [
    "q73_dsir_weights",
    "q123_prefix_filter_join",
    "q40_multimodal_features",
    "q116_media_headers",
    "q128_streaming_rollup",
    "q65_kmeans_assign",
    "q66_semantic_dedup",
    "q126_multipass_linkage",
]

# Longest-unvisited breadth: the dedup/ANN/text/selection families —
# none were in the r9 first-50.
ROUND10_BREADTH = {
    "q29_token_topk", "q30_cosine_topk", "q31_token_stats",
    "q32_quality_score", "q33_lang_id", "q34_fingerprint",
    "q35_embedding_neardup", "q36_ann_multi_query",
    "q37_minhash_lsh_neardup", "q38_simhash_neardup",
    "q39_ann_lsh_topk", "q41_winnow_fingerprint", "q48_sketch_stats",
    "q49_bpe_token_count", "q54_hash_split", "q55_per_source_cap",
    "q56_mixture_downsample", "q57_sequence_pack",
    "q58_moments_battery", "q59_kmv_distinct", "q60_repetition_stats",
    "q61_quality_flags", "q62_duplicate_spans", "q63_decontamination",
    "q64_tfidf_top_terms", "q67_doc_chunking", "q68_vocab_coverage",
    "q69_temperature_mixture", "q70_bigram_typicality",
    "q71_dup_components", "q72_length_histogram",
    "q74_typicality_buckets", "q75_line_dedup", "q76_weighted_sample",
    "q109_pii_audit", "q110_incremental_minhash",
    "q112_url_canonical_dedup", "q114_index_retention",
    "q115_split_leakage", "q117_index_expiry",
}

# The r9 window, kept verbatim to measure rotation distance.
ROUND9_WINDOW = {
    "q128_streaming_rollup", "q129_linkage_recall",
    "q118_ivf_join_path", "q111_canonical_selection",
    "q113_format_roundtrip", "q47_ngram_jaccard",
    "q124_incremental_rollup", "q42_ann_ivf_topk",
    "q01_scan_project", "q04_inner_join", "q06_left_outer_join_agg",
    "q08_anti_join", "q09_range_theta_join", "q10_asof_join",
    "q12_distinct_agg", "q14_cube", "q15_grouping_sets",
    "q17_window_lag", "q20a_intersect", "q22_conditional_counts",
    "q24_scalar_battery", "q25_json_extract", "q27_session_window",
    "q43_pivot", "q44_unpivot", "q45_scalar_subquery",
    "q46_correlated_exists", "q50_window_battery",
    "q51_string_battery", "q52_null_datetime_battery",
    "q53_in_null_semantics",
    "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7",
    "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q12",
    "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17",
    "tpch_q19", "tpch_q20", "tpch_q22",
}


def test_every_query_key_has_an_oracle():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(q) == set(o), (
        f"queries-only: {set(q) - set(o)}; oracles-only: {set(o) - set(q)}"
    )
    assert len(q) >= 150


def test_fresh_tier_leads_the_window_for_first_driver_contact():
    lead = ROUND10_FRESH + ROUND10_SENTINELS
    assert list(entry.queries())[: len(lead)] == lead


def test_round10_window_is_exactly_fresh_plus_sentinels_plus_breadth():
    first50 = set(list(entry.queries())[:50])
    want = set(ROUND10_FRESH) | set(ROUND10_SENTINELS) | ROUND10_BREADTH
    assert first50 == want, (
        f"window drift — extra: {first50 - want}; "
        f"missing: {want - first50}"
    )


def test_round10_window_rotates_at_least_35_keys_off_round9():
    """The established rotation done-criterion: >= 35 of the 50 window
    keys were NOT in the r9 window."""
    first50 = set(list(entry.queries())[:50])
    fresh = first50 - ROUND9_WINDOW
    assert len(fresh) >= 35, f"only {len(fresh)} keys rotated"


def test_q92b_is_retired_from_window_and_sweep_but_not_from_parity():
    """The r6 rule (retire the debug twin after q92 stays green two
    consecutive external rounds) fired: r6+r7 both green.  Retirement
    means out of the driver window AND the bench sweep; the oracle and
    the pytest parity test still cover it."""
    from golang_cassandra_kafka_feed_spark.plans.oracles import ORACLES
    from golang_cassandra_kafka_feed_spark.plans.queries import (
        QUERIES,
        RETIRED,
    )

    assert "q92b_interval_join_bounds" in RETIRED
    assert "q92b_interval_join_bounds" not in QUERIES
    assert "q92b_interval_join_bounds" not in entry.queries()
    assert "q92b_interval_join_bounds" not in entry.oracle_sql()
    assert "q92b_interval_join_bounds" in ORACLES  # parity kept


def test_oracle_order_mirrors_registry_order():
    assert list(entry.oracle_sql()) == list(entry.queries()), (
        "a driver sampling the first N keys of either dict must see the "
        "same window"
    )


def test_explains_snapshot_covers_every_registry_key():
    """EXPLAINS.md must hold exactly one plan section per registry key
    (round-6 lesson: a late-landing key left the audit trail one
    section short).  gen_explains.py asserts this at write time; this
    guard catches a key added WITHOUT regenerating."""
    import re
    from pathlib import Path

    text = Path(__file__).resolve().parent.parent.joinpath(
        "EXPLAINS.md"
    ).read_text()
    sections = set(re.findall(r"^## (\S+)$", text, re.MULTILINE))
    assert sections == set(entry.queries()), (
        f"missing plans: {set(entry.queries()) - sections}; "
        f"stale plans: {sections - set(entry.queries())}"
    )
