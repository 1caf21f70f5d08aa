"""Market-basket affinity — co-occurrence lift over grouped facts.

The association-rules primitive (Agrawal et al. 1993's support/lift
core, minus the apriori candidate ladder nobody runs at 2-itemset
grain): which item pairs appear together in a basket more often than
independence predicts?  The same computational shape serves
recommender co-visitation, tag co-occurrence, and corpus-level
"documents citing both sources" analyses.

Scale shape: pair enumeration is a self-equi-join on the basket key,
so work per basket is C(items, 2) — NATURALLY bounded when baskets
are (orders run ~tens of items), and explicitly bounded by
``max_basket_items`` for the pathological mega-basket (a crawler tag
bucket, a bot cart): the cap keeps the smallest item ids via the
rank-filter WindowGroupLimit idiom (map-side truncation, the dedup
mega-bucket guard).  Everything after the pair aggregate is
dimension-sized: per-item counts join back onto the pair frame (AQE
broadcasts them when they fit), the basket total rides one broadcast
row.

Lift is an exact-integer ratio evaluated in ONE double division
(``CAST(n_baskets * n_ab AS DOUBLE) / (n_a * n_b)``) — bit-identical
cross-engine, the q70/q85 idiom.

Reference tie: the fan-out join's per-key bounded work contract
(cmd/worker/worker.go:134-156, fanoutLimit semaphore) at pair
grain; q85's token
collocations are the same mathematics over adjacency instead of
basket membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def basket_affinity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
    k: int = 20,
    max_basket_items: int | None = 256,
) -> DataFrame:
    """Top-``k`` item pairs by lift: ``(item_a, item_b, n_ab, lift)``
    with ``n_ab >= min_support``, ordered by (lift desc, item_a,
    item_b) — fully deterministic at the cut boundary."""
    items = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    if max_basket_items is not None:
        w = Window.partitionBy("b").orderBy("i")
        items = (
            items.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_basket_items)
            .drop("__rn")
        )
    pairs = (
        items.alias("a")
        .join(
            items.alias("c"),
            (F.col("a.b") == F.col("c.b"))
            & (F.col("a.i") < F.col("c.i")),
        )
        .groupBy(
            F.col("a.i").alias("item_a"), F.col("c.i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    counts = items.groupBy("i").agg(F.count(F.lit(1)).alias("n"))
    total = F.broadcast(
        items.agg(F.countDistinct("b").alias("n_baskets"))
    )
    ca = counts.select(
        F.col("i").alias("item_a"), F.col("n").alias("n_a")
    )
    cb = counts.select(
        F.col("i").alias("item_b"), F.col("n").alias("n_b")
    )
    lift = (F.col("n_baskets") * F.col("n_ab")).cast("double") / (
        F.col("n_a") * F.col("n_b")
    )
    # the count joins are left to the optimizer: item cardinality is
    # data-dependent (AQE broadcasts a dimension-sized side on its
    # own; forcing it would break at 10^8-item scale), while the
    # one-row total is always broadcast
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(total)
        .withColumn("lift", lift)
        .select("item_a", "item_b", "n_ab", "lift")
        .orderBy(F.desc("lift"), "item_a", "item_b")
        .limit(k)
    )
