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
