"""Stream-stream join state boundedness: under sustained out-of-order
input the join's state store must PLATEAU at the watermark+lookback
window, not grow with total input — the Spark analog of the reference
worker's bounded-channel backpressure (internal/worker/worker.go:55,
100-106: a fixed-size buffer, never proportional to history).

Evidence is read from the engine's own accounting
(``lastProgress.stateOperators``: numRowsTotal / numRowsRemoved), not
inferred from timing.
"""

from __future__ import annotations

import datetime as dt


T0 = dt.datetime(2026, 1, 1, 12, 0, 0)
POST_SCHEMA = (
    "post_id string, author_id string, body string, created_at timestamp"
)
FOLLOW_SCHEMA = "user_id string, followee_id string, followed_at timestamp"


def _mins(m: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=m)


def test_stream_stream_state_plateaus_under_watermark(spark, tmp_path):
    from golang_cassandra_kafka_feed_spark.streaming import (
        fanout_stream_stream,
    )

    pdir, fdir = str(tmp_path / "posts"), str(tmp_path / "follows")
    n_batches, rows_per_batch = 8, 24
    total_rows = 0
    for b in range(n_batches):
        # batch b covers event-minutes [b*10, b*10+10) with +-4 min
        # jitter: each batch delivers rows OUT OF ORDER relative to event
        # time, but the batch max still advances the watermark ~10 min
        # per trigger, so old state becomes evictable every trigger.
        posts, follows = [], []
        for i in range(rows_per_batch):
            t = b * 10 + (i * 7) % 10 + ((i * 3) % 9 - 4) / 10.0
            posts.append((f"p{b}_{i}", f"a{i % 4}", "x", _mins(t)))
            follows.append((f"u{b}_{i}", f"a{i % 4}", _mins(t - 2)))
        spark.createDataFrame(posts, POST_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(pdir)
        spark.createDataFrame(follows, FOLLOW_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(fdir)
        total_rows += 2 * rows_per_batch

    ps = (
        spark.readStream.schema(POST_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(pdir)
    )
    fs = (
        spark.readStream.schema(FOLLOW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(fdir)
    )
    out = fanout_stream_stream(
        ps,
        fs,
        post_watermark="5 minutes",
        follow_watermark="5 minutes",
        lookback="10 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ss_state_bound")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    finally:
        q.stop()

    assert len(progresses) >= n_batches - 1, "expected one progress per batch"
    totals = [p["stateOperators"][0]["numRowsTotal"] for p in progresses]
    removed = sum(
        p["stateOperators"][0].get("numRowsRemoved", 0) for p in progresses
    )
    # 1. the watermark actually evicted state
    assert removed > 0, f"no state rows evicted; totals={totals}"
    # 2. state is bounded by the event-time window, not total input:
    #    steady-state keeps ~(watermark 5m + lookback 10m + in-flight
    #    10m batch) of both sides ~= 3.5 batches of rows; assert with
    #    2x slack against the 16-batch total.
    window_rows = int(3.5 * 2 * 24)
    assert max(totals[3:]) <= 2 * window_rows, (
        f"state grew past the watermark bound: totals={totals}"
    )
    assert max(totals) < total_rows, (
        f"state held ~all input ({max(totals)}/{total_rows}): unbounded"
    )
    # 3. plateau: the last batches' state is no larger than the peak of
    #    the early steady region (growth stopped)
    assert totals[-1] <= max(totals[2:5]) * 1.5, f"still growing: {totals}"
