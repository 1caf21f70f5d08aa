"""Top-k operators — the GetFeed read shape (reference
internal/store/feed.go:143-171: pre-sorted clustering + LIMIT)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Newest/largest-k rows per key via window row_number.

    ``order`` must be a *total* order within each key (include a unique
    tie-break column) or results are nondeterministic across runs — the
    reference pins ties on post_id (cql:36-37).

    Scale: one shuffle on ``keys``; Spark's WindowGroupLimit pushes the
    rank filter below the sort at the partition level (no full
    materialization of non-top rows).
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def top_k_global(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k: ``orderBy().limit()`` compiles to
    TakeOrderedAndProject — per-partition heaps + driver merge, never a
    full sort (reference op #7/#8: LIMIT pushed into the store,
    feed.go:146)."""
    return df.orderBy(*order).limit(k)
