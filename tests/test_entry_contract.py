"""Driver-contract invariants of __spark_entry__ that need no
SparkSession: registry/oracle key parity, and the round-8 rotation —
q111-q127 in front for first external driver contact, the verdict-named
hash-mechanism re-pins, and the q92b retirement (window + bench sweep
only; oracle and pytest parity coverage remain via RETIRED)."""

from __future__ import annotations

import __spark_entry__ as entry

# First-contact tier: never externally driver-checked before round 8
# (q111-q115 landed after the r7 driver window closed; q116-q127 are
# r8-new).
ROUND8_FRESH = [
    "q111_canonical_selection",
    "q112_url_canonical_dedup",
    "q113_format_roundtrip",
    "q114_index_retention",
    "q115_split_leakage",
    "q116_media_headers",
    "q117_index_expiry",
    "q118_ivf_join_path",
    "q119_classifier_score",
    "q120_domain_blocklist",
    "q121_fuzzy_blocking",
    "q122_bucketed_join",
    "q123_prefix_filter_join",
    "q124_incremental_rollup",
    "q125_basket_affinity",
    "q126_multipass_linkage",
    "q127_cms_audit",
]

# The verdict-named hash-mechanism re-pin sentinels plus the standing
# high-risk families (iterative fixpoints, fusion composites, heavy
# shared-SQL TPC-H).
HIGH_RISK = {
    "q110_incremental_minhash",
    "q37_minhash_lsh_neardup",
    "q38_simhash_neardup",
    "q42_ann_ivf_topk",
    "q65_kmeans_assign",
    "q66_semantic_dedup",
    "q71_dup_components",
    "q78_minhash_accuracy",
    "q82_ann_rrf_fusion",
    "q83_pagerank",
    "q84_pq_adc_audit",
    "q87_funnel",
    "q92_interval_join",
    "tpch_q1",
    "tpch_q18",
    "tpch_q21",
}

# Breadth rotation filling the rest of the 50-key window.
ROUND8_BREADTH = {
    "q30_cosine_topk", "q35_embedding_neardup", "q36_ann_multi_query",
    "q39_ann_lsh_topk", "q41_winnow_fingerprint", "q47_ngram_jaccard",
    "q48_sketch_stats", "q59_kmv_distinct",
    "q90_bloom_fp_audit", "q54_hash_split", "q73_dsir_weights",
    "q62_duplicate_spans", "q63_decontamination", "q75_line_dedup",
    "q109_pii_audit", "q103_triangles",
    "q89_scd2_intervals",
}


def test_every_query_key_has_an_oracle():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(q) == set(o), (
        f"queries-only: {set(q) - set(o)}; oracles-only: {set(o) - set(q)}"
    )
    assert len(q) >= 142


def test_fresh_tier_leads_the_window_for_first_driver_contact():
    assert list(entry.queries())[: len(ROUND8_FRESH)] == ROUND8_FRESH


def test_round8_window_is_exactly_pins_plus_rotation():
    first50 = set(list(entry.queries())[:50])
    want = set(ROUND8_FRESH) | HIGH_RISK | ROUND8_BREADTH
    assert first50 == want, (
        f"window drift — extra: {first50 - want}; "
        f"missing: {want - first50}"
    )


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

    text = (Path(__file__).resolve().parents[1] / "EXPLAINS.md").read_text()
    sections = set(re.findall(r"(?m)^## (\S+)", text))
    registry = set(entry.queries())
    assert sections == registry, (
        f"EXPLAINS.md stale — missing: {sorted(registry - sections)[:5]}; "
        f"orphaned: {sorted(sections - registry)[:5]} "
        "(run scripts/gen_explains.py)"
    )
