"""Kafka connector capability gating: without the spark-sql-kafka jar the
wrappers must fail with a clear NotImplementedError pointing at the
file-based double — never a raw ClassNotFoundException mid-query."""

from __future__ import annotations

import pytest

from golang_cassandra_kafka_feed_spark.sources.kafka import (
    kafka_available,
    read_stream_kafka,
    write_kafka,
)


def test_kafka_wrappers_are_gated(spark):
    if kafka_available(spark):
        pytest.skip("kafka connector present in this environment")
    with pytest.raises(NotImplementedError, match="envelope"):
        read_stream_kafka(spark, "localhost:9092", "feed-topic")
    df = spark.createDataFrame([("k", "v")], "key string, value string")
    with pytest.raises(NotImplementedError):
        write_kafka(df, "localhost:9092", "feed-topic")


def test_cassandra_wrappers_are_gated(spark):
    from golang_cassandra_kafka_feed_spark.sources.cassandra import (
        cassandra_available,
        read_table,
        write_table,
    )

    if cassandra_available(spark):
        pytest.skip("cassandra connector present in this environment")
    with pytest.raises(NotImplementedError, match="FeedStore"):
        read_table(spark, "feed", "feed_by_user")
    df = spark.createDataFrame([("u", "p")], "user_id string, post_id string")
    with pytest.raises(NotImplementedError, match="FeedStore"):
        write_table(df, "feed", "feed_by_user")
