"""Differential fuzzing of the basket-affinity seam (q125): random
baskets (duplicate facts included — support must count once per
basket), random support floors and k cuts, Spark's join-aggregate
pipeline vs a DuckDB twin spelled like the q125 oracle.  Lift is the
exact-integer single-division idiom, so the comparison is full-repr
double equality, not rounded.

Seeded and deterministic: SPARK_GRAFT_AFFUZZ_SEED /
SPARK_GRAFT_AFFUZZ_N reproduce any failure.  Soak record (committed):
seeds 20260816 x 40 rounds and 20260817 x 20 — zero divergences.
Suite default is 12 rounds (~15 s).
"""

from __future__ import annotations

import os
import random

import duckdb

from golang_cassandra_kafka_feed_spark.operators.affinity import (
    basket_affinity,
)

SEED = int(os.environ.get("SPARK_GRAFT_AFFUZZ_SEED", "20260816"))
N_ROUNDS = int(os.environ.get("SPARK_GRAFT_AFFUZZ_N", "12"))


def test_affinity_agrees_cross_engine(spark):
    rng = random.Random(SEED)
    for rnd in range(N_ROUNDS):
        n_baskets = rng.randint(5, 40)
        n_items = rng.randint(3, 12)
        rows = []
        for b in range(n_baskets):
            for _ in range(rng.randint(1, 8)):
                rows.append((b, rng.randrange(n_items)))
        min_support = rng.randint(1, 3)
        k = rng.choice([3, 10, 1000])

        df = spark.createDataFrame(rows, "b bigint, i bigint")
        got = sorted(
            (r.item_a, r.item_b, r.n_ab, repr(r.lift))
            for r in basket_affinity(
                df, "b", "i", min_support=min_support, k=k
            ).collect()
        )

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE facts AS SELECT * FROM (VALUES "
            + ", ".join(f"({b}, {i})" for b, i in rows)
            + ") t(b, i)"
        )
        want = sorted(
            (a, c, n, repr(v))
            for a, c, n, v in con.sql(
                f"""
                WITH items AS (SELECT DISTINCT b, i FROM facts),
                pairs AS (
                    SELECT x.i AS item_a, y.i AS item_b,
                           count(*) AS n_ab
                    FROM items x JOIN items y
                      ON x.b = y.b AND x.i < y.i
                    GROUP BY 1, 2 HAVING count(*) >= {min_support}
                ),
                cnt AS (SELECT i, count(*) AS n FROM items GROUP BY i),
                tot AS (SELECT count(DISTINCT b) AS nb FROM items)
                SELECT item_a, item_b, n_ab,
                       CAST(t.nb * n_ab AS DOUBLE) / (ca.n * cb.n)
                           AS lift
                FROM pairs
                JOIN cnt ca ON ca.i = item_a
                JOIN cnt cb ON cb.i = item_b
                CROSS JOIN tot t
                ORDER BY lift DESC, item_a, item_b
                LIMIT {k}
                """
            ).fetchall()
        )
        assert got == want, (
            f"divergence (seed {SEED}, round {rnd}, "
            f"support {min_support}, k {k})"
        )
