"""Aggregate helpers mirroring the reference bench math (SURVEY.md §2.4):
exact linear-interpolation percentiles (e2e_bench.go:292-305), count-based
trimmed mean (e2e_bench.go:260-275), throughput (kafka_producer.go:116-120),
and status-class conditional counts (http_load.go:123-130).

All results follow the portable cents-rounding convention so they remain
oracle-comparable (see plans/queries._round2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _round2(col):
    return F.round(col * 100) / 100


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    ps: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact percentiles with linear interpolation — identical math to the
    reference's percentile() (sorted slice, idx = p*(n-1), interpolate).
    Spark's exact ``percentile`` aggregate; use percentile_approx only for
    dashboards, never for the oracle-checked surface.

    Column naming: round(p*100) with any non-integer remainder kept as
    a ``_``-separated fraction — int() truncation named p=0.29's column
    "p28" (0.29*100 binary-rounds just below 29) and collided 0.99 with
    0.995; now p29 / p99 / p99_5, and duplicate labels raise."""

    def _label(p: float) -> str:
        scaled = round(p * 100, 6)
        if scaled == int(scaled):
            return f"p{int(scaled)}"
        return "p" + repr(scaled).replace(".", "_")

    labels = [_label(p) for p in ps]
    if len(set(labels)) != len(labels):
        raise ValueError(f"percentile labels collide: {labels}")
    aggs = [
        _round2(F.expr(f"percentile({value_col}, {p})")).alias(lab)
        for p, lab in zip(ps, labels)
    ]
    return df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)


def trimmed_mean(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    trim: float = 0.01,
    tiebreak: Sequence[str] = (),
    out_col: str = "trimmed_mean",
) -> DataFrame:
    """Count-based trimmed mean: sort, drop floor(n*trim) rows from each
    end, mean of the rest — the e2e_bench.go:260-275 definition (not a
    quantile-winsorized mean).  Deterministic rank order via ``tiebreak``;
    the mean accumulates in DECIMAL so aggregation order can't move the
    rounded result."""
    w = Window.partitionBy(*by).orderBy(value_col, *tiebreak)
    ranked = df.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count("*").over(Window.partitionBy(*by))
    )
    kept = ranked.filter(
        (F.col("__rn") > F.floor(F.col("__n") * trim))
        & (F.col("__rn") <= F.col("__n") - F.floor(F.col("__n") * trim))
    )
    agg = _round2(
        F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double")
        / F.count("*")
    ).alias(out_col)
    return kept.groupBy(*by).agg(agg) if by else kept.agg(agg)


def throughput_per_bucket(
    df: DataFrame,
    ts_col: str,
    bucket: str = "day",
    by: Sequence[str] = (),
) -> DataFrame:
    """Events per time bucket (rate = count/elapsed made exact per bucket)."""
    return (
        df.groupBy(
            *by, F.date_trunc(bucket, ts_col).cast("date").alias(bucket)
        )
        .agg(F.count("*").alias("n"))
        .orderBy(*by, bucket)
    )


def status_class_counts(
    df: DataFrame,
    value_col: str,
    thresholds: dict[str, tuple[float, float]],
    by: Sequence[str] = (),
) -> DataFrame:
    """Conditional counts per class window — the 2xx/4xx/5xx breakdown
    (``thresholds``: class name -> [lo, hi) value window)."""
    aggs = [F.count("*").alias("n_total")] + [
        F.count_if(
            (F.col(value_col) >= lo) & (F.col(value_col) < hi)
        ).alias(f"n_{name}")
        for name, (lo, hi) in thresholds.items()
    ]
    return df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)
