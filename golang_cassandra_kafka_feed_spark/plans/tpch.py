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
    # Q7: volume shipping between two nations (double nation join, year
    # extraction; nation names per the generator's NATION_k scheme)
    "tpch_q7": f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(sum(volume) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                   {_DISC} AS volume
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_11')
                OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_9'))
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    # Q8: national market share inside one region for one part type
    "tpch_q8": f"""
        SELECT o_year,
               ROUND((CAST(sum(CASE WHEN nation = 'NATION_9' THEN volume
                                    ELSE CAST(0 AS DECIMAL(18,2)) END)
                           AS DOUBLE)
                      / CAST(sum(volume) AS DOUBLE)) * 100) / 100
                   AS mkt_share
        FROM (
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                   {_DISC} AS volume,
                   n2.n_name AS nation
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        ) all_nations
        GROUP BY o_year
        ORDER BY o_year
    """,
    # Q15: top supplier by quarterly revenue (CTE + scalar-max filter;
    # the double equality is safe because both sides come from the same
    # exact decimal sum)
    "tpch_q15": f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(sum({_DISC}) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    # Q17: small-quantity-order revenue (correlated scalar subquery; the
    # per-part avg(l_quantity) is integral-valued -> exact in double
    # regardless of summation order)
    "tpch_q17": """
        SELECT ROUND(((CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                            AS DOUBLE) / 7.0)) * 100) / 100 AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (
              SELECT 0.2 * avg(l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = part.p_partkey
          )
    """,
    # Q18: large-volume customers (IN over a grouped HAVING; threshold
    # tuned to the generator's quantity distribution, p99 ~ 262)
    "tpch_q18": """
        SELECT c_name, c_custkey, o_orderkey,
               CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
        )
        GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE),
                 o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
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
