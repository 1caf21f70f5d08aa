"""The bench stdout protocol, pinned.

The external driver tail-captures only the last ~2,000 chars of
bench.py's stdout and parses the final line as JSON.  BENCH_r04 AND
BENCH_r05 both came back ``parsed: null`` because the final line
carried a per-query map that pushed it past the window, truncating the
head (including ``"metric"``/``"value"``) off.  This test regenerates
the line from a worst-case full-size record so the regression cannot
land a third time.
"""

from __future__ import annotations

import json

import bench

DRIVER_TAIL_WINDOW = 2000
SAFETY_MARGIN = 100


def _worst_case_record() -> dict:
    # 200 registered queries (headroom over today's 135), worst-case
    # key lengths and full-precision floats in every scalar field.
    queries = {
        f"q{i:03d}_{'x' * 30}": 123.456 for i in range(200)
    }
    return {
        "metric": "declared_query_sweep_plus_fanout",
        "value": 12345.678,
        "unit": "sec",
        "queries": queries,
        "queries_cold": queries,
        "query_rel_spread": queries,
        "deltas_vs_prev_bench": queries,
        "sf": 0.1,
        "n_queries": len(queries),
        "query_sec_p50": 0.123456789,
        "query_sec_p90": 1.123456789,
        "query_sec_p99": 2.123456789,
        "value_cold": 23456.789,
        "fanout_posts": 100000,
        "fanout_sec": 0.123456,
        "fanout_events_per_sec": 522947.9,
        "fanout_rel_spread": 0.123456,
        "pipeline_sec": 3.123456,
        "pipeline_feed_rows": 1000000,
        "pipeline_events_per_sec": 26847.5,
        "pipeline_rel_spread": 0.123456,
        "steady_runs_per_query": 3,
        "load_1m_at_start": 3.18,
        "machine_idle_at_start": True,
        "query_rel_spread_p50": 0.152,
        "query_rel_spread_p90": 0.314,
        "fanout_runs_sec": [0.1, 0.2, 0.3],
        "pipeline_runs_sec": [1.0, 2.0, 3.0],
        "prev_bench_sf": 0.1,
        "retries": {
            f"q{i:03d}_{'x' * 30}": {
                "sweep_sec": 12.345, "retry_sec": 1.234,
                "ref_sec": 1.111, "resolved": True,
            } for i in range(24)
        },
        "n_retried": 24,
        "n_retry_unresolved": 24,
    }


def test_stdout_line_fits_driver_tail_window():
    line = json.dumps(
        bench.compact_summary(_worst_case_record()), separators=(",", ":")
    )
    assert len(line) < DRIVER_TAIL_WINDOW - SAFETY_MARGIN, (
        f"stdout line is {len(line)} chars — the driver tail-captures "
        f"~{DRIVER_TAIL_WINDOW}; BENCH_r04/r05 were both lost to this"
    )


def test_no_per_query_map_on_the_stdout_line():
    compact = bench.compact_summary(_worst_case_record())
    mapped = [k for k, v in compact.items() if isinstance(v, (dict, list))]
    assert not mapped, (
        f"per-query maps belong in BENCH_LOCAL.json, not stdout: {mapped}"
    )


def test_contract_fields_present():
    compact = bench.compact_summary(_worst_case_record())
    for k in ("metric", "value", "unit", "sf"):
        assert k in compact


# --- weather-defense retry pass (round-11 verdict ask #1) -------------
#
# The driver reads ONE bench run; r9 (q126) and r10 (11 keys at load
# 11.16) both lost their external perf signal to host IO bursts that
# outlasted the 3 in-sweep steady reps but reproduced in zero isolated
# probes.  flag_keys_for_retry selects the keys bench.py re-measures in
# isolation after the sweep; these tests pin its threshold semantics
# and the artifact fields that report the reconciliation.


def test_retry_flags_only_keys_over_factor_and_excess():
    ref = {"qa": 1.0, "qb": 0.2, "qc": 0.05, "qd": 2.0}
    timings = {
        "qa": 1.9,   # 1.9x ref, excess 0.9 -> flagged
        "qb": 0.34,  # 1.7x ref -> under factor, not flagged
        "qc": 0.12,  # 2.4x ref but excess 0.07 < floor, not flagged
        "qd": 1.8,   # faster than ref, not flagged
        "qe": 99.0,  # no reference entry, not flagged
    }
    assert bench.flag_keys_for_retry(timings, ref) == ["qa"]


def test_retry_orders_worst_ratio_first_and_caps():
    ref = {f"q{i}": 1.0 for i in range(40)}
    timings = {f"q{i}": 2.0 + i * 0.1 for i in range(40)}
    flagged = bench.flag_keys_for_retry(timings, ref, cap=5)
    assert flagged == ["q39", "q38", "q37", "q36", "q35"]


def test_retry_ignores_zero_or_missing_reference():
    assert bench.flag_keys_for_retry({"qa": 9.9}, {}) == []
    assert bench.flag_keys_for_retry({"qa": 9.9}, {"qa": 0.0}) == []


def test_retry_scalars_on_stdout_line_but_not_the_map():
    record = _worst_case_record()
    record["retries"] = {"qa": {"sweep_sec": 2.0, "retry_sec": 0.5,
                                "ref_sec": 1.0, "resolved": True}}
    record["n_retried"] = 1
    record["n_retry_unresolved"] = 0
    compact = bench.compact_summary(record)
    assert compact["n_retried"] == 1
    assert compact["n_retry_unresolved"] == 0
    assert "retries" not in compact  # per-key map stays in BENCH_LOCAL


# --- per-run store scoping (round-12, verdict-r11 ask #1) -------------
#
# The /tmp/gckfs_* materialize_once stores survive process exit, so
# before r12 every bench run — cold included — measured a parquet read
# for the store-served keys (q47/q71/q103/q111/q115 family and the
# index/rollup/bucketed keys), never the build.  bench.py now deletes
# the namespace before the sweep so COLD measures build+serve while
# steady keeps measuring serve-only.


def test_scope_stores_removes_only_gckfs_namespace(tmp_path):
    import os

    keep = tmp_path / "bench_pipeline_x"
    keep.mkdir()
    victims = [tmp_path / "gckfs_pairs_abc", tmp_path / "gckfs_q110_index_d"]
    for v in victims:
        v.mkdir()
        (v / "_STAGE_COMMITTED").write_text("")
    removed = bench.scope_stores_for_run(str(tmp_path))
    assert sorted(removed) == sorted(str(v) for v in victims)
    assert keep.exists()
    assert not any(os.path.exists(str(v)) for v in victims)
