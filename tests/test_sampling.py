"""Sampling/splitting operators: determinism, rate accuracy, packing
invariants (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.operators.sampling import (
    hash_split,
    mixture_downsample,
    per_key_cap,
    sequence_pack,
)
from golang_cassandra_kafka_feed_spark.sources.testdata import load_table


def test_hash_split_stable_under_repartition(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    a = {(r.doc_id, r.split) for r in hash_split(d, "doc_id").select("doc_id", "split").collect()}
    b = {
        (r.doc_id, r.split)
        for r in hash_split(d.repartition(13), "doc_id")
        .select("doc_id", "split")
        .collect()
    }
    assert a == b
    # rates roughly honored (binomial tolerance)
    from collections import Counter
    mix = Counter(s for _, s in a)
    n = len(a)
    assert abs(mix["train"] / n - 0.8) < 0.1
    assert set(mix) <= {"train", "val", "test"}


def test_mixture_downsample_rates_and_salt_independence(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    kept = mixture_downsample(d, "doc_id", "source", {"src0": 0.0, "src1": 1.0})
    per = {r.source: r["count"] for r in kept.groupBy("source").count().collect()}
    n_src1 = d.filter(F.col("source") == "src1").count()
    assert "src0" not in per  # rate 0 -> everything dropped
    assert per["src1"] == n_src1  # rate 1 -> everything kept
    # a different salt draws an independent sample than the split hash
    half = mixture_downsample(d, "doc_id", "source", {}, default_rate=0.5)
    frac = half.count() / d.count()
    assert 0.35 < frac < 0.65


def test_sequence_pack_budget_invariant(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").withColumn(
        "n", F.length("text").cast("long")
    )
    packed = sequence_pack(d, ["lang"], ["doc_id"], "n", 5000)
    # exclusive-cumsum packing: every bin's PRIOR content is < budget, so
    # each bin holds >= 1 row and bins are dense 0..max per group
    bins = (
        packed.groupBy("lang", "bin_id")
        .agg(F.sum("n").alias("tot"), F.count("*").alias("rows"))
        .collect()
    )
    assert all(r.rows >= 1 for r in bins)
    per_lang = {}
    for r in bins:
        per_lang.setdefault(r.lang, set()).add(r.bin_id)
    for ids in per_lang.values():
        assert ids == set(range(len(ids)))  # dense bin ids from 0
    # any bin except the last of its group reaches the budget with its
    # final row included (greedy fill)
    for r in bins:
        if r.bin_id + 1 in per_lang[r.lang]:
            assert r.tot >= 5000 - 4999  # non-degenerate; > 0


def test_per_key_cap_keeps_best(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    capped = per_key_cap(d, ["source"], [F.desc("n_chars"), F.asc("doc_id")], 3)
    got = {
        (r.source, r.doc_id)
        for r in capped.select("source", "doc_id").collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    want = {
        (r.source, r.doc_id)
        for r in d.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .select("source", "doc_id")
        .collect()
    }
    assert got == want


def test_temperature_rates_flatten_mixture(spark):
    """alpha=0.5 upsamples rare sources relative to abundant ones: the
    effective kept-share of the rare source must exceed its input share,
    and rates are capped at 1."""
    from golang_cassandra_kafka_feed_spark.operators.sampling import (
        temperature_downsample,
        temperature_mixture_rates,
    )
    from pyspark.sql import functions as F

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {
        r.source: r.rate
        for r in temperature_mixture_rates(df, "source").collect()
    }
    assert rates["small"] > rates["big"]
    assert rates["small"] <= 1.0
    kept = temperature_downsample(df, "doc_id", "source")
    shares = {
        r.source: r.n
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # input share of small = 10%; kept share must be strictly larger
    kept_total = sum(shares.values())
    assert shares["small"] / kept_total > 0.1
    # deterministic under repartitioning
    again = temperature_downsample(df.repartition(13), "doc_id", "source")
    assert sorted(r.doc_id for r in again.collect()) == sorted(
        r.doc_id for r in kept.collect()
    )
