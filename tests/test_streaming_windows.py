"""True streaming runs of the windowed aggregations (append mode +
watermark), beyond the batch-equivalence proofs in test_streaming.py.

Append-mode session windows only emit once the watermark passes the
session end, so the input arrives as two files processed as separate
micro-batches (maxFilesPerTrigger=1): the real events, then a far-future
sentinel that advances the watermark and flushes every real session.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.plans.queries import QUERIES
from golang_cassandra_kafka_feed_spark.sources.testdata import load_table
from golang_cassandra_kafka_feed_spark.streaming import session_counts_stream

_SENTINEL_USER = -1


def test_streaming_session_windows_match_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    src = tmp_path / "ev"
    ev.coalesce(1).write.parquet(str(src / "batch0"))
    far = ev.agg(F.max("ts")).first()[0] + dt.timedelta(days=30)
    spark.createDataFrame(
        [(_SENTINEL_USER, far)], "user_id long, ts timestamp"
    ).write.parquet(str(src / "batch1"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch*"))
    )
    q = (
        session_counts_stream(stream, gap="30 minutes", watermark="1 minute")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    emitted = (
        spark.sql("SELECT * FROM sess_out")
        .filter(F.col("user_id") != _SENTINEL_USER)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )
    got = {
        (r.user_id, r.n_sessions, r.n_events) for r in emitted.collect()
    }
    batch = QUERIES["q27_session_window"](spark, sf_dir)
    totals = ev.groupBy("user_id").count()
    want = {
        (r.user_id, r.n_sessions, r.n_events)
        for r in batch.join(totals, "user_id").select(
            "user_id", "n_sessions", F.col("count").alias("n_events")
        ).collect()
    }
    assert got == want


def test_tumbling_window_late_data_keep_drop_contract(spark, tmp_path):
    """Watermark contract, exercised with hours-out-of-order input:

    - a late row whose event time is still within the watermark when it
      arrives is merged into its (not-yet-emitted) window,
    - a late row older than the current watermark is dropped even though
      its window key exists,
    - emitted results never change after emission (append mode).
    """
    from golang_cassandra_kafka_feed_spark.streaming import (
        tumbling_counts_stream,
    )

    src = tmp_path / "ev"

    def _batch(name, rows):
        spark.createDataFrame(
            rows, "user_id long, ts timestamp"
        ).coalesce(1).write.parquet(str(src / name))

    t = lambda h, m=0: dt.datetime(2026, 1, 1, h, m)  # noqa: E731
    # b0: two events in the 12:00 window
    _batch("b0", [(1, t(12, 10)), (1, t(12, 20))])
    # b1: 13:40 event — advances watermark to 12:40 (1h delay); the 12:00
    # window (end 13:00) stays open, so this is "late but kept" territory
    _batch("b1", [(1, t(13, 40))])
    # b2: 12:30 event is 70 min behind the max seen (13:40) but within
    # the open 12:00 window -> merged; nothing emitted yet
    _batch("b2", [(1, t(12, 30))])
    # b3: 16:00 event pushes the watermark to 15:00 -> 12:00 and 13:00
    # windows emit and close
    _batch("b3", [(9, t(16, 0))])
    # b4: absorber batch — watermark advancement applies with one batch of
    # lag (the tracker folds batch N's event-time stats in at batch N+1
    # start), so give it a batch before the straggler arrives
    _batch("b4", [(9, t(16, 30))])
    # b5: 12:50 straggler is now older than the watermark -> dropped
    _batch("b5", [(1, t(12, 50))])
    # b6: far-future sentinel flushes everything still open
    _batch("b6", [(9, t(23, 0))])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    q = (
        tumbling_counts_stream(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.hour_start, r.n)
        for r in spark.sql(
            "SELECT * FROM late_out WHERE user_id = 1"
        ).collect()
    }
    assert got == {
        # 2 on-time + 1 within-watermark late; the post-emission
        # straggler (12:50) is NOT counted
        ("2026-01-01 12:00:00", 3),
        ("2026-01-01 13:00:00", 1),
    }
