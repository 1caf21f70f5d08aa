"""Data profiling and declarative quality checks (the Deequ/dbt-test
surface): per-column statistics and dataset-level constraint validation
— what a 100 TB ingest runs before and after every pipeline stage.

Both are single-pass aggregations: profiling computes every column's
metrics in ONE scan (no per-column jobs), and each constraint compiles
to an aggregate expression on the same pass.  Outputs are exact
integers/strings, so DuckDB oracles hash-match.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Per-column profile: row count, null count, exact distinct count,
    min and max (stringified — type-uniform output schema).

    ONE scan: all metrics for all columns are aggregate expressions in
    a single groupBy-less agg (count/min/max are map-side partial;
    count(DISTINCT col) per column plans as Spark's expand+aggregate —
    n_cols expansions of one scan, still one job).  Output long format:
    (column, n_rows, n_null, n_distinct, min_val, max_val).

    The input is auto-widened first (session.auto_widen, r11): the
    expand multiplies every row (n_cols + 1)x BEFORE the partial
    aggregate, so a single-file local source would run the whole
    multiplied scan on ONE task (measured: q96's 150k-row profile was
    a 1-task, 1.4 s stage).  At cluster scale inputs arrive pre-split
    and the widen is structurally a no-op.
    """
    from golang_cassandra_kafka_feed_spark.session import auto_widen

    df = auto_widen(df)
    cols = list(columns or df.columns)
    # positional internal aliases + F.lit(name) in the stack, and
    # backtick-quoted (escaped) column references instead of raw
    # F.col(c) (which dot-parses a.b as struct access): column names are
    # data — quotes, dots, or backticks in a name must not break or
    # re-route the query.

    def _c(name: str) -> Column:
        return F.col("`" + name.replace("`", "``") + "`")

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(_c(c).isNull().cast("long")).alias(f"__null_{i}"),
            F.countDistinct(_c(c)).alias(f"__dist_{i}"),
            # min/max on the NATIVE type (casting first would make them
            # lexicographic), stringified afterwards for the uniform
            # output schema
            F.min(_c(c)).cast("string").alias(f"__min_{i}"),
            F.max(_c(c)).cast("string").alias(f"__max_{i}"),
        ]
    wide = df.agg(*aggs)
    stack_args: list[Column] = [F.lit(len(cols))]
    for i, c in enumerate(cols):
        stack_args += [
            F.lit(c),
            F.col(f"__null_{i}"),
            F.col(f"__dist_{i}"),
            F.col(f"__min_{i}"),
            F.col(f"__max_{i}"),
        ]
    return wide.select(
        F.col("__n").alias("n_rows"),
        F.stack(*stack_args).alias(
            "column", "n_null", "n_distinct", "min_val", "max_val"
        ),
    ).select("column", "n_rows", "n_null", "n_distinct", "min_val", "max_val")


def quality_checks(
    df: DataFrame, checks: Sequence[tuple[str, Column, Column]]
) -> DataFrame:
    """Declarative dataset checks: each check is (name, measure,
    threshold_ok) where ``measure`` is an aggregate Column over ``df``
    and ``threshold_ok`` a boolean Column over the measures' aliases.
    All measures evaluate in ONE aggregation pass; the verdicts are a
    row-local projection.  Output: (check, measure, passed).

    Example::

        quality_checks(orders, [
            ("pk_unique",
             (F.count("*") - F.countDistinct("o_orderkey")).cast("double"),
             F.col("measure") == 0),
            ("price_positive",
             F.sum((F.col("o_totalprice") <= 0).cast("long")).cast("double"),
             F.col("measure") == 0),
        ])
    """
    wide = df.agg(
        *[
            m.cast("double").alias(f"__m{i}")
            for i, (_, m, _) in enumerate(checks)
        ]
    )
    # stack to long form FIRST (one evaluation of the aggregate row —
    # unioning N per-check selects would re-reference the agg subtree N
    # times), then apply each verdict via a check-name dispatch.
    stack_args: list[Column] = [F.lit(len(checks))]
    for i, (name, _, _) in enumerate(checks):
        stack_args += [F.lit(name), F.col(f"__m{i}")]
    long = wide.select(F.stack(*stack_args).alias("check", "measure"))
    passed = None
    for name, _, ok in checks:
        branch = F.when(F.col("check") == name, ok)
        passed = branch if passed is None else passed.when(
            F.col("check") == name, ok
        )
    return long.select("check", "measure", passed.alias("passed"))
