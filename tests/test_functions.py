"""Scalar/aggregate helper tests (functions/ — reference ops #24-35)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.functions import (
    anonymize,
    exact_percentiles,
    latency_ms,
    parse_int_with_default,
    status_class_counts,
    trimmed_mean,
    valid_length,
)


def test_anonymize_redacts_all_classes(spark):
    df = spark.createDataFrame(
        [
            (
                "mail a@b.com token eyJhbGciOi.eyJzdWIi.SflKxwRJ id "
                "123e4567-e89b-12d3-a456-426614174000 done",
            )
        ],
        "line string",
    )
    out = df.select(anonymize("line").alias("clean")).first().clean
    assert out == "mail [email] token [token] id [id] done"


def test_valid_length_window(spark):
    df = spark.createDataFrame(
        [("",), ("ok",), ("x" * 51,)], "username string"
    )
    kept = df.filter(valid_length("username", 1, 50)).collect()
    assert [r.username for r in kept] == ["ok"]


def test_latency_ms(spark):
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [(t0, t0 + dt.timedelta(milliseconds=1500))],
        "created timestamp, seen timestamp",
    )
    assert df.select(latency_ms("created", "seen").alias("l")).first().l == 1500


def test_parse_int_with_default(spark):
    df = spark.createDataFrame([("7",), ("abc",), (None,)], "lim string")
    got = [
        r.v
        for r in df.select(
            parse_int_with_default("lim", 50).alias("v")
        ).collect()
    ]
    assert got == [7, 50, 50]


def test_percentiles_linear_interpolation(spark):
    # [1, 2, 3, 4]: p50 = 2.5 (interpolated), matching the reference
    # formula idx = p*(n-1) (e2e_bench.go:292-305)
    df = spark.createDataFrame([(float(i),) for i in range(1, 5)], "v double")
    row = exact_percentiles(df, "v", ps=[0.5]).first()
    assert row.p50 == 2.5


def test_trimmed_mean_drops_ends(spark):
    # 100 values 1..100 with trim 2%: drop {1,2} and {99,100} -> mean 50.5
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    row = trimmed_mean(df, "v", trim=0.02).first()
    assert row.trimmed_mean == 50.5


def test_status_class_counts(spark):
    df = spark.createDataFrame(
        [(200.0,), (201.0,), (404.0,), (500.0,)], "code double"
    )
    row = status_class_counts(
        df,
        "code",
        {"2xx": (200, 300), "4xx": (400, 500), "5xx": (500, 600)},
    ).first()
    assert (row.n_total, row.n_2xx, row.n_4xx, row.n_5xx) == (4, 2, 1, 1)
