"""Market-basket affinity — co-occurrence lift over grouped facts.

The association-rules primitive (Agrawal et al. 1993's support/lift
core, minus the apriori candidate ladder nobody runs at 2-itemset
grain): which item pairs appear together in a basket more often than
independence predicts?  The same computational shape serves
recommender co-visitation, tag co-occurrence, and corpus-level
"documents citing both sources" analyses.

Scale shape: ONE shuffle groups each basket into its sorted distinct
item array (map-side set merge), and pairs explode in-task from the
array, so work per basket is C(items, 2) — NATURALLY bounded when
baskets are (orders run ~tens of items), and explicitly bounded by
``max_basket_items`` for the pathological mega-basket (a crawler tag
bucket, a bot cart): the cap keeps the smallest item ids via an
array slice (the dedup mega-bucket guard's kept set, without its
window shuffle).  Everything after the pair aggregate is
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

from pyspark.sql import DataFrame
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
    # r11 shape (guide §2.3/§2.4): ONE shuffle groups each basket into
    # its sorted distinct item array (collect_set merges map-side, so
    # raw fact rows never cross the exchange un-deduped), the mega-
    # basket cap is an array slice of the smallest ids (replacing the
    # row_number window — same kept set, no window shuffle), and pairs
    # explode in-task from the capped array (replacing the basket-key
    # SELF-JOIN, whose two aliased branches re-ran the distinct and
    # shuffled both sides — 37 MB shuffle write at sf0.1 for a 10.8 MB
    # input).  The localCheckpoint materializes the basket arrays once
    # for the three consumers (pairs, item counts, basket total) —
    # the ReuseExchange aliasing trap, as everywhere in this repo.
    # Null items vanish from collect_set exactly as the old pair join
    # and count join dropped them; only-null baskets still count in
    # n_baskets (the groupBy keeps their empty array row).
    sets = df.groupBy(F.col(basket_col).alias("b")).agg(
        F.sort_array(F.collect_set(F.col(item_col))).alias("ids")
    )
    if max_basket_items is not None:
        sets = sets.select(
            "b", F.slice("ids", 1, max_basket_items).alias("ids")
        )
    sets = sets.localCheckpoint(eager=False)
    pairs = (
        sets.select(F.explode("ids").alias("ia"), "ids")
        .select("ia", F.explode("ids").alias("ib"))
        .filter(F.col("ia") < F.col("ib"))
        .groupBy(
            F.col("ia").alias("item_a"), F.col("ib").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    counts = (
        sets.select(F.explode("ids").alias("i"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.broadcast(
        sets.agg(F.count(F.lit(1)).alias("n_baskets"))
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
