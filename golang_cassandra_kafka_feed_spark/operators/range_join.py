"""Range (interval) join via bucketing — the scalable non-equi join.

A naive theta join on ``r.ts BETWEEN l.ts AND l.ts + W`` with only a key
equi-condition degrades when keys are hot.  Bucketing by time quantizes the
range into an extra equi column: the left side joins each of the
ceil(W/bucket)+1 buckets its window covers, so the join is fully equi
(key, bucket) with a residual range filter — hash-joinable, AQE-skew-
splittable, and prunable at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Pairs where ``right_ts`` in ``[left_ts, left_ts + window_seconds]``
    and the ``on`` keys match.  Columns of both inputs survive (prefix-free;
    callers select/alias before the join when names collide).
    """
    bucket_seconds = bucket_seconds or window_seconds
    n_buckets = window_seconds // bucket_seconds + 1

    # floor division, NOT float-divide + cast: cast truncates toward zero,
    # which mis-buckets pre-1970 (negative epoch) timestamps.
    l_b = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(left_ts) / bucket_seconds).cast("long"),
                F.floor(
                    (F.unix_timestamp(left_ts) + window_seconds)
                    / bucket_seconds
                ).cast("long"),
            )
        ),
    )
    r_b = right.withColumn(
        "__bucket",
        F.floor(F.unix_timestamp(right_ts) / bucket_seconds).cast("long"),
    )
    cond = (
        (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.unix_timestamp(F.col(f"r.{right_ts}"))
            <= F.unix_timestamp(F.col(f"l.{left_ts}")) + window_seconds
        )
    )
    joined = l_b.alias("l").join(
        r_b.alias("r"),
        [*(F.col(f"l.{k}") == F.col(f"r.{k}") for k in on),
         F.col("l.__bucket") == F.col("r.__bucket")],
        "inner",
    )
    assert n_buckets >= 1
    return joined.filter(cond).drop("__bucket")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int = 7 * 86400,
) -> DataFrame:
    """Overlap join of two INTERVAL tables (closed intervals:
    ``l_start <= r_end AND r_start <= l_end``), keys equi-matched —
    the general temporal join that `range_join` (point-in-window) and
    `asof_join` (latest-at-or-before) are special cases of; joins
    session tables, SCD2 histories, maintenance windows.

    Scale shape: both sides explode each interval to the coarse time
    buckets it covers, so the join is fully equi (keys, bucket) with a
    residual overlap filter — hash-joinable and AQE-skew-splittable.
    Each overlapping pair is emitted EXACTLY ONCE without a distinct:
    the pair only fires in the bucket containing ``max(l_start,
    r_start)`` (the first bucket both cover), the standard
    dedup-free interval-join trick.  ``bucket_seconds`` trades explode
    fan-out (long intervals cover many buckets) against join
    selectivity; size it near the typical interval length.

    Both inputs' columns survive; non-key names must be disjoint
    (select/alias before joining on collision).
    """

    def _buckets(start: str, end: str):
        return F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(start) / bucket_seconds).cast(
                    "long"
                ),
                F.floor(F.unix_timestamp(end) / bucket_seconds).cast(
                    "long"
                ),
            )
        )

    l_b = left.withColumn("__bucket", _buckets(l_start, l_end))
    r_b = right.withColumn("__bucket", _buckets(r_start, r_end))
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in on] + [
        F.col("l.__bucket") == F.col("r.__bucket")
    ]
    overlap = (
        F.col(f"l.{l_start}") <= F.col(f"r.{r_end}")
    ) & (F.col(f"r.{r_start}") <= F.col(f"l.{l_end}"))
    first_bucket = F.floor(
        F.unix_timestamp(
            F.greatest(F.col(f"l.{l_start}"), F.col(f"r.{r_start}"))
        )
        / bucket_seconds
    ).cast("long")
    joined = (
        l_b.alias("l")
        .join(r_b.alias("r"), cond)
        .filter(overlap & (F.col("l.__bucket") == first_bucket))
    )
    return joined.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in right.columns if c not in on],
    )
