"""sf1.0 streaming pipeline probe with a celebrity-skewed follow graph.

Extends the batch-query scale proof (PERFORMANCE.md) to the durable
streaming path: run_fanout_pipeline over 10x the per-round gate volume
(1M posts, 2,400 authors), twice —

- uniform:   every author has ``2 * celeb_followers / n_users + 10``-ish
             followers, sized so total feed output matches the skewed run
             (the fair control),
- celebrity: every author has 10 followers, plus ONE author with
             ``--celeb-followers`` followers (the skewed-key shape the
             reference's fan-out worker dreads: one post -> 25k feed rows).

What keeps the skewed run safe at scale (and what this probe verifies by
wall-clock parity with the control):

- the posts x follows join broadcasts the follow edges (or AQE skew-joins
  if they outgrow the broadcast threshold), so no reducer owns the
  celebrity key;
- the fan-out explosion is re-spread IMMEDIATELY by fan_out's
  repartition(feed_buckets, user_bucket): feed rows hash by *follower*,
  and the celebrity's followers are many distinct users — the skew
  dissolves at the first exchange after the join.

Usage: python scripts/streaming_scale_probe.py [--sf-dir /tmp/sf1.0]
       [--celeb-followers 25000]
Prints one JSON line per mode plus a summary comparison.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1.0")
    ap.add_argument("--celeb-followers", type=int, default=25_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--modes", default="uniform,celebrity")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("streaming-scale-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from golang_cassandra_kafka_feed_spark.feed import FeedStore
    from golang_cassandra_kafka_feed_spark.sources.kafka import (
        posts_to_envelopes,
        read_stream_envelope_files,
    )
    from golang_cassandra_kafka_feed_spark.sources.testdata import load_table
    from golang_cassandra_kafka_feed_spark.streaming import run_fanout_pipeline

    events = load_table(spark, args.sf_dir, "events")
    posts = events.select(
        F.col("event_id").cast("string").alias("post_id"),
        F.col("user_id").cast("string").alias("author_id"),
        F.col("props").alias("body"),
        F.col("ts").alias("created_at"),
    )
    users = events.select(F.col("user_id").cast("string")).distinct()
    n_users = users.count()
    n_posts = posts.count()
    # The celebrity is the MOST ACTIVE author — worst case for the
    # skewed key: every one of their posts fans out to celeb_followers.
    celeb, celeb_posts = (
        posts.groupBy("author_id")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "author_id")
        .first()
    )

    def follows_for(mode: str):
        if mode == "celebrity":
            base = users.crossJoin(F.broadcast(spark.range(1, 11)))
            extra = (
                spark.range(args.celeb_followers)
                .select(
                    F.concat(F.lit("celebfan"), F.col("id")).alias("user_id"),
                    F.lit(celeb).alias("followee_id"),
                )
            )
            return base.select(
                F.concat(
                    F.lit("f"), F.col("user_id"), F.lit("-"), F.col("id")
                ).alias("user_id"),
                F.col("user_id").alias("followee_id"),
            ).unionByName(extra)
        # uniform control sized to the same expected feed output:
        # celebrity mode emits 10*n_posts + celeb_posts*celeb_followers
        # feed rows, so degree*n_posts should match that total.
        degree = 10 + round(
            celeb_posts * args.celeb_followers / n_posts
        )
        return users.crossJoin(
            F.broadcast(spark.range(1, degree + 1))
        ).select(
            F.concat(
                F.lit("f"), F.col("user_id"), F.lit("-"), F.col("id")
            ).alias("user_id"),
            F.col("user_id").alias("followee_id"),
        )

    work = tempfile.mkdtemp(prefix="stream_scale_probe_")
    results = {}
    try:
        env_dir = f"{work}/envelopes"
        posts_to_envelopes(posts).write.parquet(env_dir)
        # Warmup epoch on 1% of the stream: JVM codegen, parquet
        # footers, and the streaming machinery all warm up outside the
        # timed runs, so the first timed mode is not penalized (a cold
        # first run measured ~6x its warm self).
        warm_dir = f"{work}/warm_envelopes"
        posts_to_envelopes(posts.limit(n_posts // 100)).write.parquet(
            warm_dir
        )
        wstore = FeedStore(spark, f"{work}/store_warm", feed_buckets=32)
        wstore.create_follows(follows_for("uniform"))
        run_fanout_pipeline(
            read_stream_envelope_files(spark, warm_dir),
            wstore,
            f"{work}/ckpt_warm",
        ).awaitTermination(600)
        for mode in args.modes.split(","):
            store = FeedStore(spark, f"{work}/store_{mode}", feed_buckets=32)
            store.create_follows(follows_for(mode))
            t0 = time.time()
            q = run_fanout_pipeline(
                read_stream_envelope_files(spark, env_dir),
                store,
                f"{work}/ckpt_{mode}",
            )
            q.awaitTermination(1200)
            sec = time.time() - t0
            feed_rows = store.table("feed_by_user").count()
            results[mode] = {
                "mode": mode,
                "sf_dir": args.sf_dir,
                "n_posts": n_posts,
                "n_users": n_users,
                "celeb_followers": (
                    args.celeb_followers if mode == "celebrity" else 0
                ),
                "feed_rows": feed_rows,
                "pipeline_sec": round(sec, 1),
                "posts_per_sec": round(n_posts / sec, 1),
                "feed_rows_per_sec": round(feed_rows / sec, 1),
            }
            print(json.dumps(results[mode]), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    ratio = (
        results["celebrity"]["pipeline_sec"]
        / results["uniform"]["pipeline_sec"]
    )
    print(
        json.dumps(
            {
                "summary": "celebrity_vs_uniform",
                "skew_time_ratio": round(ratio, 2),
                "straggler_free": ratio < 1.5,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
