"""Market-basket affinity (operators/affinity.py) — lift math,
support floor, determinism at the cut, and the mega-basket cap."""

from __future__ import annotations

from golang_cassandra_kafka_feed_spark.operators.affinity import (
    basket_affinity,
)


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "b bigint, i bigint")


def test_lift_is_exact_on_a_hand_computed_case(spark):
    # 4 baskets; items 1,2 co-occur twice; n_1 = 3, n_2 = 2
    rows = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (13, 3)]
    out = basket_affinity(
        _baskets(spark, rows), "b", "i", min_support=2, k=5
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.n_ab) == (1, 2, 2)
    assert r.lift == 4 * 2 / (3 * 2)


def test_support_floor_drops_rare_pairs(spark):
    rows = [(10, 1), (10, 2), (11, 3), (11, 4)]
    assert basket_affinity(
        _baskets(spark, rows), "b", "i", min_support=2
    ).count() == 0


def test_duplicate_fact_rows_count_once_per_basket(spark):
    # the same (basket, item) appearing twice (two lineitems of the
    # same part) must not double-count support
    rows = [(10, 1), (10, 1), (10, 2), (11, 1), (11, 2)]
    out = basket_affinity(
        _baskets(spark, rows), "b", "i", min_support=2, k=5
    ).collect()
    assert [(r.item_a, r.item_b, r.n_ab) for r in out] == [(1, 2, 2)]


def test_mega_basket_cap_truncates_to_smallest_items(spark):
    """A pathological basket wider than the cap keeps only its
    smallest item ids (WindowGroupLimit truncation) — pairs involving
    truncated items vanish, bounding the quadratic."""
    rows = [(10, i) for i in range(50)] + [(11, 0), (11, 1)]
    out = basket_affinity(
        _baskets(spark, rows), "b", "i",
        min_support=1, k=1000, max_basket_items=5,
    ).collect()
    items_seen = {r.item_a for r in out} | {r.item_b for r in out}
    assert items_seen <= set(range(5))
    # C(5,2) pairs from the capped basket; (0,1) supported twice
    assert len(out) == 10
    top = [r for r in out if (r.item_a, r.item_b) == (0, 1)]
    assert top and top[0].n_ab == 2
