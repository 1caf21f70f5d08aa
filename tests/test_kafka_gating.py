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


def test_kafka_option_maps():
    """The option plumbing is a pure function — assert the exact config
    contract the connector would receive (reference consumer/producer
    semantics, internal/broker/kafka.go:81-99, 33-73).  This is the CI
    marker for the connector-less sandbox: only .load()/.save() remain
    unexercised."""
    from golang_cassandra_kafka_feed_spark.sources.kafka import (
        kafka_sink_options,
        kafka_source_options,
    )

    assert kafka_source_options("b:9092", "feed-topic") == {
        "kafka.bootstrap.servers": "b:9092",
        "subscribe": "feed-topic",
        "kafka.group.id": "worker-group",
        "startingOffsets": "earliest",
    }
    assert (
        kafka_source_options(
            "b:9092", "t", "g2", "latest", max_offsets_per_trigger=5000
        )["maxOffsetsPerTrigger"]
        == "5000"
    )
    assert kafka_sink_options("b:9092", "t") == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "t",
    }


def test_cassandra_option_maps():
    from golang_cassandra_kafka_feed_spark.sources.cassandra import (
        cassandra_options,
    )

    assert cassandra_options("feed", "feed_by_user") == {
        "keyspace": "feed",
        "table": "feed_by_user",
        "spark.cassandra.input.consistency.level": "QUORUM",
    }
    assert cassandra_options("feed", "posts", "ONE", write=True) == {
        "keyspace": "feed",
        "table": "posts",
        "spark.cassandra.output.consistency.level": "ONE",
    }


def test_delta_cas_gated_or_unique(spark, tmp_path):
    """Gated Delta MERGE CAS: raises without delta-spark; with it, two
    sequential merges of overlapping username batches leave exactly one
    row per username."""
    from golang_cassandra_kafka_feed_spark.feed.api import (
        delta_available,
        merge_create_users,
    )

    users1 = spark.createDataFrame([("alice",), ("bob",)], "username string")
    users2 = spark.createDataFrame([("bob",), ("carol",)], "username string")
    path = str(tmp_path / "users_delta")
    if not delta_available(spark):
        with pytest.raises(NotImplementedError, match="delta"):
            merge_create_users(spark, path, users1)
        return
    merge_create_users(spark, path, users1)
    merge_create_users(spark, path, users2)
    rows = spark.read.format("delta").load(path).collect()
    assert sorted(r.username for r in rows) == ["alice", "bob", "carol"]
    assert len({r.username for r in rows}) == len(rows)


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
