"""Checkpoint-resume semantics (reference ops #19/#21: restart-from-
checkpoint replaces retry/backoff and offset-commit management,
worker.go:75-90, kafka.go:92)."""

from __future__ import annotations

import datetime as dt

from golang_cassandra_kafka_feed_spark.feed import FeedStore
from golang_cassandra_kafka_feed_spark.sources.kafka import (
    ENVELOPE_SCHEMA,
    read_stream_envelope_files,
)
from golang_cassandra_kafka_feed_spark.streaming import run_fanout_pipeline

TS = dt.datetime(2026, 1, 1, 12, 0, 0)


def _value(pid: str) -> bytes:
    return (
        f'{{"id":"{pid}","author_id":"a","body":"b-{pid}",'
        f'"created":"2026-01-01T12:00:00"}}'
    ).encode()


def test_checkpoint_resume_processes_only_new_data(spark, tmp_path):
    """Same checkpoint across restarts: already-committed files are not
    reprocessed; new files are.  (The posts table would double without
    source-side offset tracking — the anti-join alone hides feed dups but
    not posts dups, so this asserts real checkpoint semantics.)"""
    store = FeedStore(spark, str(tmp_path / "store"), feed_buckets=4)
    store.create_follows(
        spark.createDataFrame([("u1", "a")], "user_id string, followee_id string")
    )
    in_dir = tmp_path / "env"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(b"post_created", _value("p1"), TS)], ENVELOPE_SCHEMA
    ).write.mode("append").parquet(str(in_dir))
    q = run_fanout_pipeline(
        read_stream_envelope_files(spark, str(in_dir)), store, ckpt
    )
    q.awaitTermination(120)
    assert store.table("posts").count() == 1

    # restart with the SAME checkpoint after a second delivery lands
    spark.createDataFrame(
        [(b"post_created", _value("p2"), TS)], ENVELOPE_SCHEMA
    ).write.mode("append").parquet(str(in_dir))
    q = run_fanout_pipeline(
        read_stream_envelope_files(spark, str(in_dir)), store, ckpt
    )
    q.awaitTermination(120)

    posts = {r.post_id for r in store.table("posts").collect()}
    assert posts == {"p1", "p2"}
    assert store.table("posts").count() == 2  # p1 NOT reprocessed
    feed = {(r.user_id, r.post_id) for r in store.table("feed_by_user").collect()}
    assert feed == {("u1", "p1"), ("u1", "p2")}


def test_continuous_trigger_midstream_stop_resume(spark, tmp_path):
    """Long-running-worker shape (reference cmd/worker/main.go:55-71):
    processing-time trigger, one file per micro-batch, stop() mid-stream
    while unprocessed files remain, then resume from the same checkpoint
    and drain — every post delivered exactly once (no loss from the
    stop, no duplication from the resume; drain semantics
    worker.go:66-70)."""
    import time

    store = FeedStore(spark, str(tmp_path / "store"), feed_buckets=4)
    store.create_follows(
        spark.createDataFrame(
            [("u1", "a")], "user_id string, followee_id string"
        )
    )
    in_dir = tmp_path / "env"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    n_posts = 8
    for i in range(n_posts):
        spark.createDataFrame(
            [(b"post_created", _value(f"p{i}"), TS)], ENVELOPE_SCHEMA
        ).write.mode("append").parquet(str(in_dir))

    q = run_fanout_pipeline(
        read_stream_envelope_files(spark, str(in_dir), max_files_per_trigger=1),
        store,
        ckpt,
        processing_time="50 milliseconds",
    )
    # stop mid-stream: wait until SOME but not necessarily all posts are
    # in, then stop regardless of progress (stop() must be safe at any
    # epoch boundary).
    deadline = time.time() + 120
    while time.time() < deadline and store.table("posts").count() < 2:
        time.sleep(0.2)
    seen_before_stop = store.table("posts").count()
    q.stop()
    q.awaitTermination(120)
    assert seen_before_stop >= 2

    # resume from the same checkpoint and drain the rest
    q = run_fanout_pipeline(
        read_stream_envelope_files(spark, str(in_dir)), store, ckpt
    )
    q.awaitTermination(120)

    posts = [r.post_id for r in store.table("posts").collect()]
    assert sorted(posts) == sorted(f"p{i}" for i in range(n_posts))  # no loss
    assert len(posts) == len(set(posts)) == n_posts  # no duplication
    feed = [
        (r.user_id, r.post_id) for r in store.table("feed_by_user").collect()
    ]
    assert sorted(feed) == sorted(("u1", f"p{i}") for i in range(n_posts))


def test_follow_graph_updates_apply_to_later_batches(spark, tmp_path):
    """GetFollowers runs at processing time (worker.go:128): the
    stream-static join re-plans per micro-batch, so a follow created
    between batches affects later posts only — already-delivered posts
    are NOT retroactively fanned out to the new follower."""
    store = FeedStore(spark, str(tmp_path / "store"), feed_buckets=4)
    store.create_follows(
        spark.createDataFrame(
            [("u1", "a")], "user_id string, followee_id string"
        )
    )
    in_dir = tmp_path / "env"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(b"post_created", _value("p1"), TS)], ENVELOPE_SCHEMA
    ).write.mode("append").parquet(str(in_dir))
    q = run_fanout_pipeline(
        read_stream_envelope_files(spark, str(in_dir)), store, ckpt
    )
    q.awaitTermination(120)

    # u2 follows a AFTER p1 was delivered
    store.create_follows(
        spark.createDataFrame(
            [("u2", "a")], "user_id string, followee_id string"
        )
    )
    spark.createDataFrame(
        [(b"post_created", _value("p2"), TS)], ENVELOPE_SCHEMA
    ).write.mode("append").parquet(str(in_dir))
    q = run_fanout_pipeline(
        read_stream_envelope_files(spark, str(in_dir)), store, ckpt
    )
    q.awaitTermination(120)

    feed = {
        (r.user_id, r.post_id) for r in store.table("feed_by_user").collect()
    }
    assert feed == {("u1", "p1"), ("u1", "p2"), ("u2", "p2")}
