"""Driver-contract invariants of __spark_entry__ that need no
SparkSession: registry/oracle key parity, and the round-7 rotation that
keeps the high-risk families inside the external correctness gate's
first-50-key sampling window while the final never-checked tier gets
its first external contact."""

from __future__ import annotations

import __spark_entry__ as entry

# The families where cross-engine drift would hide (hash idioms,
# iterative fixpoints, fusion composites, heavy shared-SQL TPC-H, the
# minhash/kmeans/bloom hash mechanisms) — rotated into the driver's
# window by plans/queries.py's registry order.
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
    "q37_minhash_lsh_neardup",
    "q65_kmeans_assign",
}

# Round-7 rotation: the final tier that had never been externally
# driver-checked in rounds 1-6 (CORRECTNESS_r01-r06 union) — q94-q109
# plus the 19 TPC-H twins beyond q1/q18/q21, plus the r7-new q110.
# After round 7 every
# registry key has been driver-verified at least once.
ROUND7_FRESH = {
    "q94_multiset_ops", "q95_regex_battery", "q96_table_profile",
    "q97_quality_checks", "q98_share_of_total", "q99_mad_outliers",
    "q100_markov_transitions", "q101_rolling_median", "q102_drawdown",
    "q103_triangles", "q104_time_to_convert", "q105_interevent_gaps",
    "q106_trailing_wau", "q107_wow_growth", "q108_topk_with_ties",
    "q109_pii_audit",
    "q110_incremental_minhash",
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
    assert len(q) >= 136


def test_high_risk_keys_stay_inside_the_driver_window():
    first50 = list(entry.queries())[:50]
    missing = HIGH_RISK - set(first50)
    assert not missing, (
        f"rotated out of the first-50 correctness window: {missing}"
    )


def test_round7_window_is_exactly_pins_plus_fresh_rotation():
    first50 = set(list(entry.queries())[:50])
    assert first50 == HIGH_RISK | ROUND7_FRESH, (
        f"window drift — extra: {first50 - (HIGH_RISK | ROUND7_FRESH)}; "
        f"missing: {(HIGH_RISK | ROUND7_FRESH) - first50}"
    )


def test_q92_leads_the_window_until_retired():
    assert list(entry.queries())[:2] == [
        "q92_interval_join",
        "q92b_interval_join_bounds",
    ]


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
