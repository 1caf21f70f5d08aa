"""As-of join (latest right row at-or-before each left row's timestamp).

Spark has no native as-of join; the scalable formulation here is the
union-and-carry-forward trick: tag both sides, union on the key, sort by
(ts, side) within key, and carry the last seen right-side values forward
with ``last(..., ignorenulls=True)``.  Cost: ONE shuffle of |L|+|R| rows —
no join blowup (the naive join+filter+row_number materializes |L|x|R_key|
intermediates; see plans/queries.q10 for that form, kept because it is the
SQL-oracle-checkable shape).

At 100 TB: both inputs shuffle-partition on the key; AQE handles skewed
keys.  For a time-bucketed variant that also prunes history, compose with
range_join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
    right_tie_cols: Sequence[str] = (),
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` (per ``on`` key); ties at equal ts prefer the
    right row (inclusive <=).  Right value columns come back suffixed.

    ``right_tie_cols`` makes ties among right rows at the SAME timestamp
    deterministic: the carried row is the one with the greatest
    (right_ts, *right_tie_cols) tuple.  Without it, equal-timestamp right
    rows are carried in arbitrary shuffle order (fine for true event
    streams, wrong for date-granular history like orders-per-day).
    """
    value_cols = list(
        value_cols
        if value_cols is not None
        else [c for c in right.columns if c not in (*on, right_ts)]
    )

    # Carry ONE struct of all right value columns so the carried row stays
    # atomic: last(struct, ignorenulls=True) skips left-side rows (whole
    # struct NULL) but never skips a right row whose individual value
    # columns contain NULLs — those NULLs are preserved, and multi-column
    # results can't mix fields from different right rows.
    struct_type = T.StructType([right.schema[c] for c in value_cols])
    lhs = (
        left.withColumn("__side", F.lit(1))
        .withColumn("__ts", F.col(left_ts))
        .withColumn("__r", F.lit(None).cast(struct_type))
    )
    tie_names = [f"__tie{i}" for i in range(len(right_tie_cols))]
    lhs = lhs.select(
        "*", *[F.lit(None).cast(right.schema[c].dataType).alias(n)
               for c, n in zip(right_tie_cols, tie_names)]
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__r"),
        *[F.col(c).alias(n) for c, n in zip(right_tie_cols, tie_names)],
    )
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = lhs.unionByName(rhs.select(*lhs.columns))
    # right (side=0) sorts before left (side=1) at equal ts -> inclusive;
    # ascending tie columns make the LAST carried right row the greatest
    # (ts, *ties) — left rows order among themselves by NULL ties, which
    # is harmless (their __r is NULL and ignored by last()).
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", *tie_names)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__carried")
    )
    return carried.filter(F.col("__side") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"__carried.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
