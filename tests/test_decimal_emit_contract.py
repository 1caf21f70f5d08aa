"""Executable contract for the r10 money-emit rule (PERFORMANCE.md
round-10): a DECIMAL sum may only be CAST to DOUBLE after rounding to
CENTS, because DuckDB's DECIMAL(38,s)->DOUBLE conversion is not
correctly rounded once the unscaled value exceeds 2^53, while Spark's
BigDecimal.doubleValue is — the tpch_q1 sum_charge divergence the
sf1.0 parity sweep caught (1 ulp at 6M rows).

These tests pin BOTH halves of the contract engine-for-engine:
1. the hazard is real (DuckDB's scale-6 cast diverges from the
   correctly-rounded double on the recorded sf1.0 value);
2. the cents emit is safe (scale-2 unscaled below 2^53 -> both
   engines' casts agree with the correctly-rounded double);
3. no tpch.py money sum is emitted without the cents round.
"""

from __future__ import annotations

import re
from decimal import Decimal

import duckdb

# the exact decimal both engines computed for tpch_q1 (A, O) sum_charge
# at sf1.0 — identical cross-engine BEFORE the double cast
_SF1_SUM_CHARGE = "50210651187.129010"


def test_duckdb_scale6_double_cast_hazard_is_real():
    con = duckdb.connect()
    got = con.sql(
        f"SELECT CAST(CAST('{_SF1_SUM_CHARGE}' AS DECIMAL(38,6)) AS DOUBLE)"
    ).fetchone()[0]
    correct = float(Decimal(_SF1_SUM_CHARGE))
    # If DuckDB ever fixes its conversion, this xfails loudly so the
    # PERFORMANCE.md note (and possibly the emit rule) can be revisited.
    assert got != correct, (
        "DuckDB's DECIMAL(38,6)->DOUBLE cast became correctly rounded — "
        "revisit the r10 cents-emit note"
    )


def test_cents_emit_is_exact_in_both_engines(spark):
    con = duckdb.connect()
    expr = (
        f"CAST(ROUND(CAST('{_SF1_SUM_CHARGE}' AS DECIMAL(38,6)), 2) "
        "AS DOUBLE)"
    )
    duck = con.sql(f"SELECT {expr}").fetchone()[0]
    sp = spark.sql(f"SELECT {expr}").collect()[0][0]
    correct = float(Decimal(_SF1_SUM_CHARGE).quantize(Decimal("0.01")))
    assert duck == sp == correct


def test_tpch_money_sums_always_round_before_double_emit():
    """Every ``CAST(sum(...) AS DOUBLE)`` whose summand is a decimal
    PRODUCT (scale > 2 — the hazard class) must be spelled
    ``CAST(ROUND(sum(...), 2) AS DOUBLE)``."""
    import inspect

    from golang_cassandra_kafka_feed_spark.plans import tpch

    src = inspect.getsource(tpch)
    # find CAST(sum( ... ) AS DOUBLE) occurrences NOT preceded by ROUND(
    bad = []
    for m in re.finditer(r"CAST\((ROUND\()?sum\(", src):
        if m.group(1):
            continue  # rounded — fine
        tail = src[m.end():m.end() + 200]
        # scale-2 summands (plain DECIMAL(18,2) casts of one column) are
        # exempt: their unscaled cents fit 2^53 at any declared scale
        if re.match(
            r"CAST\(\w+ AS DECIMAL\(\d+,2\)\)\)\s*\n?\s*AS DOUBLE\)", tail
        ):
            continue
        bad.append(src[max(0, m.start() - 40):m.end() + 80])
    assert not bad, f"unrounded decimal-product sums emitted as double: {bad}"
