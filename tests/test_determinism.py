"""Determinism sweep: every registry query must return the identical row
multiset under different shuffle partitioning.

This is the guard for the oracle contract's weakest point: a LIMIT/top-k
query with an incomplete ORDER BY tie-break can return *different* (all
individually "correct") row sets depending on physical partitioning —
hash-matching DuckDB on one run and diverging on the driver's.  The
rows-only queries (hash/sketch-based) get the same guarantee.
"""

from __future__ import annotations

from collections import Counter

import pytest

from golang_cassandra_kafka_feed_spark.plans.queries import QUERIES


def _multiset(df) -> Counter:
    cols = sorted(df.columns)
    return Counter(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_stable_across_partitioning(spark, sf_dir, name):
    default = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _multiset(QUERIES[name](spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _multiset(QUERIES[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    assert a == b, f"{name}: result depends on partitioning"
