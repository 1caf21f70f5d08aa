"""Event-time windowed aggregations (streaming twins of Q26/Q27).

The reference has no event-time windows (late data is inserted where it
lands, worker.go:149, ordering restored at read time by the clustering
key).  These are the extension-surface streaming forms; their batch
equivalents (date_trunc bucket / LAG gap-and-island) are the oracle-checked
Q26/Q27, and tests assert the two forms agree on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Events per user per tumbling window, late data bounded by the
    watermark.  Batch-equivalent: Q26 (date_trunc('hour') groupBy)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.window("ts", window).alias("win"))
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "n",
        )
    )


def session_counts_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-based merge).  Batch-equivalent: Q27's
    LAG gap-and-island formulation; equality of the two is asserted in
    tests (SURVEY.md §7.3.7)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sess"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", "sess.start", "sess.end", "n_events")
    )
