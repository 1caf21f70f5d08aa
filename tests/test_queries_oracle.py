"""Oracle parity tests: every declared query (SURVEY.md §2.6) must produce
value-identical results in Spark and DuckDB — the same contract the driver's
CORRECTNESS gate checks at sf0.01 (here at sf0.001 by default for speed;
set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full gate).

Comparison is deliberately strict: rows are stringified (after column-name
sort) and compared as multisets — the analog of the driver's
order-insensitive value hash.
"""

from __future__ import annotations

from collections import Counter
from datetime import date, datetime

import pytest

from golang_cassandra_kafka_feed_spark.plans.oracles import ORACLES
from golang_cassandra_kafka_feed_spark.plans.queries import QUERIES, RETIRED

# Retired keys left the driver window/bench sweep but keep full oracle
# parity coverage here.
_ALL_QUERIES = {**QUERIES, **RETIRED}


def _norm_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        # repr() keeps full precision: bit-identical doubles stringify
        # identically, anything else is a real mismatch.
        return repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def _rows_multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )


@pytest.mark.parametrize(
    "name", sorted(_ALL_QUERIES.keys() & ORACLES.keys())
)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    sdf = _ALL_QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(ORACLES[name])
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={s_cols} duckdb={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_ms = _rows_multiset(s_cols, s_rows)
    d_ms = _rows_multiset(d_cols, d_rows)
    if s_ms != d_ms:
        only_s = list((s_ms - d_ms).items())[:5]
        only_d = list((d_ms - s_ms).items())[:5]
        raise AssertionError(
            f"{name}: value mismatch\n  spark-only: {only_s}\n"
            f"  duckdb-only: {only_d}"
        )


def test_all_queries_have_oracles():
    """Every declared query is oracle-checked (SQL-expressible surface)."""
    missing = sorted(set(_ALL_QUERIES) - set(ORACLES))
    # Extension ops may legitimately be rows-only; the core Q01-Q30 may not.
    core_missing = [m for m in missing if m[1:3].isdigit() and int(m[1:3]) <= 30]
    assert not core_missing, f"core queries without oracle: {core_missing}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    # ORACLES may carry retired keys (pytest-parity only); the driver
    # surface must cover every NON-retired oracle.
    assert set(e.queries()) >= set(ORACLES) - set(RETIRED)
