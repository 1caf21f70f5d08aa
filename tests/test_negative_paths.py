"""Negative-path robustness (SURVEY.md §5.4: schema-violating records,
null keys, oversized fields — the reference's failure-injection tests
worker_test.go:83-178 / server_test.go:147-207, batch-native)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.feed import FeedStore
from golang_cassandra_kafka_feed_spark.sources.kafka import ENVELOPE_SCHEMA
from golang_cassandra_kafka_feed_spark.streaming import decode_post_events

TS = dt.datetime(2026, 1, 1, 12, 0, 0)


@pytest.fixture()
def store(spark, tmp_path):
    return FeedStore(spark, str(tmp_path / "s"), feed_buckets=4)


def test_null_username_rejected(spark, store):
    created = store.create_users(
        spark.createDataFrame([(None,), ("ok",)], "username string")
    )
    assert [r.username for r in created.collect()] == ["ok"]


def test_null_author_post_fans_out_nowhere(spark, store):
    store.create_follows(
        spark.createDataFrame([("u1", "a")], "user_id string, followee_id string")
    )
    store.add_posts(
        spark.createDataFrame(
            [(None, None, "body", TS), ("p1", "a", "body", TS)],
            "post_id string, author_id string, body string, created_at timestamp",
        )
    )
    # null author joins nothing; only the valid post lands in the feed
    assert store.table("feed_by_user").count() == 1


def test_decode_handles_null_envelope_fields(spark):
    env = spark.createDataFrame(
        [
            # null key
            (None, b'{"id":"p0","author_id":"a","body":"b",'
                   b'"created":"2026-01-01T00:00:00Z"}', TS),
            (b"post_created", None, TS),  # null value
            (b"post_created",
             b'{"id":"p1","author_id":"a","body":"b",'
             b'"created":"2026-01-01T00:00:00Z"}', TS),
            # missing created: required (a NULL event time would violate
            # the non-nullable post/feed schemas and leave dedup state
            # unexpirable) -> dropped as malformed
            (b"post_created", b'{"id":"p2","author_id":"a","body":"b"}', TS),
        ],
        ENVELOPE_SCHEMA,
    )
    out = decode_post_events(env).collect()
    assert [r.post_id for r in out] == ["p1"]


def test_decode_tolerates_extra_and_wrong_typed_json_fields(spark):
    rows = [
        # extra unknown field: ignored
        (b"post_created",
         b'{"id":"p1","author_id":"a","body":"b","extra":42,'
         b'"created":"2026-01-01T00:00:00Z"}', TS),
        # wrong type for body (object) -> PERMISSIVE null struct -> kept
        # only if required fields survive; Spark nulls the whole struct
        (b"post_created",
         b'{"id":"p2","author_id":"a","body":{"x":1},'
         b'"created":"2026-01-01T00:00:00Z"}', TS),
    ]
    out = decode_post_events(
        spark.createDataFrame(rows, ENVELOPE_SCHEMA)
    ).collect()
    ids = {r.post_id for r in out}
    assert "p1" in ids  # extra fields never kill a record
    # p2's fate is PERMISSIVE-mode defined: either dropped (null struct)
    # or body=None — both acceptable "skip bad data" outcomes; it must
    # not raise.


def test_follow_null_edge_rejected(spark, store):
    store.create_follows(
        spark.createDataFrame(
            [(None, "a"), ("u1", None), ("u1", "a")],
            "user_id string, followee_id string",
        )
    )
    rows = store.table("follows").collect()
    assert [(r.user_id, r.followee_id) for r in rows] == [("u1", "a")]


def test_get_feed_limit_zero_and_negative(spark, store):
    store.create_follows(
        spark.createDataFrame([("u1", "a")], "user_id string, followee_id string")
    )
    store.add_posts(
        spark.createDataFrame(
            [("p1", "a", "b", TS)],
            "post_id string, author_id string, body string, created_at timestamp",
        )
    )
    assert store.get_feed("u1", 0).count() == 0
    with pytest.raises(Exception):
        store.get_feed("u1", -1).count()  # Spark rejects negative limits
