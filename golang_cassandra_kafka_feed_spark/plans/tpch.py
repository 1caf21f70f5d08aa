"""TPC-H subset on the testdata star schema — the classic OLAP suite
restricted to the columns the generator provides (no l_commitdate /
l_shipmode / o_shippriority / p_retailprice-joins, so Q1, Q3*, Q5, Q6,
Q10, Q14 are expressible; Q3* substitutes o_orderpriority for the absent
o_shippriority).

Each query is ONE ANSI-SQL string executed verbatim by Spark (over temp
views) AND by the DuckDB oracle — dialect drift is impossible by
construction.  Determinism follows the engine conventions
(plans/queries.py): money sums accumulate in DECIMAL (exact,
order-independent) and emit as DOUBLE; averages/ratios round via the
portable cents idiom; every ORDER BY ends in a unique tiebreak.

Date predicates are shifted into the generator's 1995-2001 span
(TESTDATA.md; TPC-H spec dates 1992-1998 would select nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from golang_cassandra_kafka_feed_spark.sources.testdata import register_views

_DISC = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"

TPCH_SQL: dict[str, str] = {
    # Q1: pricing summary report (the reference op #34/#36 aggregation
    # shape at full width)
    "tpch_q1": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_base_price,
               CAST(sum({_DISC}) AS DOUBLE) AS sum_disc_price,
               CAST(sum({_DISC} * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
                   AS sum_charge,
               ROUND((CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                      / count(*)) * 100) / 100 AS avg_qty,
               ROUND((CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                      / count(*)) * 100) / 100 AS avg_price,
               ROUND((CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
                      / count(*)) * 100) / 100 AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    # Q3: shipping-priority candidates (o_orderpriority substituted)
    "tpch_q3": f"""
        SELECT l_orderkey,
               CAST(sum({_DISC}) AS DOUBLE) AS revenue,
               CAST(o_orderdate AS DATE) AS o_orderdate,
               o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    # Q5: local supplier volume (6-table join; supplier and customer in
    # the same nation)
    "tpch_q5": f"""
        SELECT n_name, CAST(sum({_DISC}) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    # Q6: forecasting revenue change (pure scan + filter + agg)
    "tpch_q6": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.04 AND l_discount <= 0.06
          AND l_quantity < 24
    """,
    # Q10: returned-item reporting (top-20 customers by lost revenue)
    "tpch_q10": f"""
        SELECT c_custkey, c_name,
               CAST(sum({_DISC}) AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    # Q14: promotion effect (conditional / total revenue ratio)
    "tpch_q14": f"""
        SELECT ROUND(((CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                                     THEN {_DISC}
                                     ELSE CAST(0 AS DECIMAL(18,2)) END)
                            AS DOUBLE)
                       / CAST(sum({_DISC}) AS DOUBLE)) * 100) * 100) / 100
                   AS promo_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
}


def _make(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


TPCH_QUERIES = {name: _make(sql) for name, sql in TPCH_SQL.items()}
