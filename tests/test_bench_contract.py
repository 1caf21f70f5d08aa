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
