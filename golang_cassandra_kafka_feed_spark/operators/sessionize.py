"""Gap-and-island sessionization (batch form of session windows).

Assigns a session id per (key, row): a new session starts when the gap to
the previous event exceeds ``gap_seconds``.  Equivalent to
``F.session_window`` grouping (asserted in tests); this form additionally
yields a stable per-row session id usable for downstream joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.functions import scalars


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """One shuffle on ``keys``; two window passes (lag + running count)."""
    w = Window.partitionBy(*keys).orderBy(ts, *order_tiebreak)
    flagged = df.withColumn(
        "__new",
        F.when(
            F.lag(ts).over(w).isNull()
            | (
                scalars.ts_diff_ms(F.lag(ts).over(w), F.col(ts))
                > gap_seconds * 1000
            ),
            1,
        ).otherwise(0),
    )
    return flagged.withColumn(
        session_col,
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new")
