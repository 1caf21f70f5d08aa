"""Driver-contract invariants of __spark_entry__ that need no
SparkSession: registry/oracle key parity, and the round-11 rotation —
changed-code sentinels in front (q123 PPJoin positional/length
filters, the q73/q112/q113/q119 auto_widen call sites, q128 for the
streaming-pipeline epoch work, q27 for the sessionizer fold shared
with the newly mock-tested StatefulProcessor twin, q47 as the
same-file dedup.py neighbor), then the verdict-named longest-unvisited
breadth tier (the q77-q108 analytics block + q120-q127 infrastructure
keys, last driver contact r8-r9), then longest-unvisited fillers,
plus the standing q92b retirement (window + bench sweep only; oracle
and pytest parity coverage remain via RETIRED)."""

from __future__ import annotations

import __spark_entry__ as entry

# Changed-code sentinels lead the r11 window (no r11-new keys yet;
# if one lands it goes in front of these).
ROUND11_SENTINELS = [
    "q123_prefix_filter_join",
    "q73_dsir_weights",
    "q112_url_canonical_dedup",
    "q113_format_roundtrip",
    "q119_classifier_score",
    "q128_streaming_rollup",
    "q27_session_window",
    "q47_ngram_jaccard",
]

# Verdict-named longest-unvisited breadth: the q77-q108 analytics
# block + the q120-q127 infrastructure keys (last contact r8-r9).
ROUND11_BREADTH = {
    "q77_lateral_topk", "q78_minhash_accuracy", "q79_token_diversity",
    "q80_length_zscore", "q81_bm25_search", "q82_ann_rrf_fusion",
    "q83_pagerank", "q84_pq_adc_audit", "q85_collocations",
    "q86_asof_nearest", "q87_funnel", "q88_cohort_retention",
    "q89_scd2_intervals", "q90_bloom_fp_audit", "q91_salted_join",
    "q92_interval_join", "q93_array_battery", "q94_multiset_ops",
    "q95_regex_battery", "q96_table_profile", "q97_quality_checks",
    "q98_share_of_total", "q99_mad_outliers",
    "q100_markov_transitions", "q101_rolling_median", "q102_drawdown",
    "q103_triangles", "q104_time_to_convert", "q105_interevent_gaps",
    "q106_trailing_wau", "q107_wow_growth", "q108_topk_with_ties",
    "q120_domain_blocklist", "q121_fuzzy_blocking",
    "q122_bucketed_join", "q124_incremental_rollup",
    "q125_basket_affinity", "q127_cms_audit",
}

# Longest-unvisited fillers outside the named blocks.
ROUND11_FILLERS = {
    "q16_topk_per_key", "q28b_dup_groups",
    "q111_canonical_selection", "q129_linkage_recall",
}

# The r10 window, kept verbatim to measure rotation distance.
ROUND10_WINDOW = {
    "q130_chunk_decontam", "q131_ngram_novelty", "q73_dsir_weights",
    "q123_prefix_filter_join", "q40_multimodal_features",
    "q116_media_headers", "q128_streaming_rollup", "q65_kmeans_assign",
    "q66_semantic_dedup", "q126_multipass_linkage", "q29_token_topk",
    "q30_cosine_topk", "q31_token_stats", "q32_quality_score",
    "q33_lang_id", "q34_fingerprint", "q35_embedding_neardup",
    "q36_ann_multi_query", "q37_minhash_lsh_neardup",
    "q38_simhash_neardup", "q39_ann_lsh_topk",
    "q41_winnow_fingerprint", "q48_sketch_stats",
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


def test_every_query_key_has_an_oracle():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(q) == set(o), (
        f"queries-only: {set(q) - set(o)}; oracles-only: {set(o) - set(q)}"
    )
    assert len(q) >= 150


def test_sentinel_tier_leads_the_window():
    lead = ROUND11_SENTINELS
    assert list(entry.queries())[: len(lead)] == lead


def test_round11_window_is_exactly_sentinels_plus_breadth_plus_fillers():
    first50 = set(list(entry.queries())[:50])
    want = set(ROUND11_SENTINELS) | ROUND11_BREADTH | ROUND11_FILLERS
    assert first50 == want, (
        f"window drift — extra: {first50 - want}; "
        f"missing: {want - first50}"
    )


def test_round11_window_rotates_at_least_35_keys_off_round10():
    """The established rotation done-criterion: >= 35 of the 50 window
    keys were NOT in the r10 window."""
    first50 = set(list(entry.queries())[:50])
    fresh = first50 - ROUND10_WINDOW
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
