"""Stream-stream interval join (fanout_stream_stream): live follow graph
fan-out with watermark-bounded state on both sides."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.streaming import fanout_stream_stream

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)

POST_SCHEMA = "post_id string, author_id string, body string, created_at timestamp"
FOLLOW_SCHEMA = "user_id string, followee_id string, followed_at timestamp"


def _mins(m: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=m)


def _run(spark, tmp_path, posts, follows, lookback="1 hour"):
    pdir, fdir = str(tmp_path / "posts"), str(tmp_path / "follows")
    spark.createDataFrame(posts, POST_SCHEMA).write.parquet(pdir)
    spark.createDataFrame(follows, FOLLOW_SCHEMA).write.parquet(fdir)
    ps = spark.readStream.schema(POST_SCHEMA).parquet(pdir)
    fs = spark.readStream.schema(FOLLOW_SCHEMA).parquet(fdir)
    out = fanout_stream_stream(ps, fs, lookback=lookback)
    q = (
        out.writeStream.format("memory")
        .queryName("ss_join_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql("SELECT * FROM ss_join_out").collect()
    finally:
        q.stop()


def test_join_respects_interval(spark, tmp_path):
    """A post reaches followers whose edge is within [t - lookback, t]:
    future followers and stale edges are excluded."""
    posts = [("p1", "alice", "hi", _mins(0))]
    follows = [
        ("bob", "alice", _mins(-10)),     # recent -> match
        ("carol", "alice", _mins(-59)),   # inside lookback -> match
        ("dan", "alice", _mins(-120)),    # older than lookback -> drop
        ("erin", "alice", _mins(5)),      # followed after the post -> drop
        ("frank", "zoe", _mins(-10)),     # different author -> drop
    ]
    rows = _run(spark, tmp_path, posts, follows)
    assert sorted(r.user_id for r in rows) == ["bob", "carol"]
    assert all(r.post_id == "p1" and r.author_id == "alice" for r in rows)


def test_join_matches_batch_twin(spark, tmp_path):
    """Streaming result == the same interval join run as a batch query
    (the oracle-style equivalence used for Q26/Q27 streaming twins)."""
    posts = [
        (f"p{i}", f"a{i % 3}", f"body{i}", _mins(i)) for i in range(12)
    ]
    follows = [
        (f"u{j}", f"a{j % 3}", _mins(j - 30)) for j in range(9)
    ]
    rows = _run(spark, tmp_path, posts, follows, lookback="45 minutes")
    got = sorted((r.user_id, r.post_id) for r in rows)

    p = spark.createDataFrame(posts, POST_SCHEMA)
    f = spark.createDataFrame(follows, FOLLOW_SCHEMA)
    batch = p.join(
        f,
        (p.author_id == f.followee_id)
        & (f.followed_at <= p.created_at)
        & (f.followed_at >= p.created_at - F.expr("INTERVAL 45 minutes")),
    ).select("user_id", "post_id")
    want = sorted((r.user_id, r.post_id) for r in batch.collect())
    assert got == want and len(want) > 0


def test_bad_lookback_rejected(spark):
    from golang_cassandra_kafka_feed_spark.streaming.fanout import _as_interval

    with pytest.raises(ValueError):
        _as_interval("1; DROP TABLE x")
    with pytest.raises(ValueError):
        _as_interval("soon")
    assert _as_interval(" 30  minutes ") == "30 minutes"


def test_late_follow_edges_within_watermark_join_later_posts(spark, tmp_path):
    """Two-batch run (maxFilesPerTrigger=1): a follow edge that ARRIVES
    late (second micro-batch) but whose event time is within the post's
    lookback window still joins posts from the first batch held in
    state — the stream-stream state actually buffers across batches."""
    pdir, fdir = str(tmp_path / "posts"), str(tmp_path / "follows")
    posts = [("p1", "alice", "hi", _mins(0))]
    spark.createDataFrame(posts, POST_SCHEMA).write.parquet(pdir)
    # batch 1: one unrelated edge so the first trigger has follow input
    spark.createDataFrame(
        [("frank", "zoe", _mins(-5))], FOLLOW_SCHEMA
    ).coalesce(1).write.parquet(fdir)
    # batch 2 (arrives later, event time still in window): bob->alice
    late = spark.createDataFrame(
        [("bob", "alice", _mins(-5))], FOLLOW_SCHEMA
    )
    late.coalesce(1).write.mode("append").parquet(fdir)

    ps = spark.readStream.schema(POST_SCHEMA).parquet(pdir)
    fs = (
        spark.readStream.schema(FOLLOW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(fdir)
    )
    from golang_cassandra_kafka_feed_spark.streaming import (
        fanout_stream_stream,
    )

    out = fanout_stream_stream(ps, fs, lookback="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("ss_late_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ss_late_out").collect()
    finally:
        q.stop()
    assert sorted(r.user_id for r in rows) == ["bob"]
