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
    "tpch_q1",
    "tpch_q18",
    "tpch_q21",
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


def test_oracle_order_mirrors_registry_order():
    assert list(entry.oracle_sql()) == list(entry.queries()), (
        "a driver sampling the first N keys of either dict must see the "
        "same window"
    )
