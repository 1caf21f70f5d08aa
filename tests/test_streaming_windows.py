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
