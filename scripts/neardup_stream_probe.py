"""Throughput probe for the streaming NEAR-dup admission guard
(streaming/ingest.py::near_dedup_band_stream + admitted_documents).

Shape mirrors the round-6 exact-dedup probe (PERFORMANCE.md addendum):
a heavily near-duplicated corpus (every family of ``--dup-factor``
docs is one base text plus light tails — the re-crawl shape), parquet
source -> banding -> dropDuplicatesWithinWatermark(band, bucket) ->
foreachBatch admission -> parquet sink, availableNow, fresh checkpoint
per run, median of ``--runs``.

Usage: python scripts/neardup_stream_probe.py [--n-docs 200000]
       [--dup-factor 50] [--runs 3] [--cpus 32]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import statistics
import sys
import tempfile
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=200_000)
    ap.add_argument("--dup-factor", type=int, default=50)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from golang_cassandra_kafka_feed_spark.streaming.ingest import (
        admitted_documents,
        near_dedup_band_stream,
    )

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .appName("neardup-stream-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="neardup_probe_")
    src = f"{work}/src"
    n_fam = max(1, args.n_docs // args.dup_factor)
    (
        spark.range(args.n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("corpus family "),
                (F.col("id") % n_fam).cast("string"),
                F.lit(
                    " shares one long base text body with plenty of "
                    "shingle mass for banding across its members "
                ),
                (F.col("id") % n_fam).cast("string"),
                F.lit(" tail variant "),
                (F.col("id") % args.dup_factor).cast("string"),
            ).alias("text"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=F.col("id") / 1000.0)
            ).alias("ts"),
        )
        .write.mode("overwrite")
        .parquet(src)
    )

    times, n_admitted = [], None
    # one unmeasured warm-up run pays the one-time codegen (round-6
    # pipeline-bench lesson: run 0 inflates ~60% otherwise)
    for run in range(args.runs + 1):
        ck = f"{work}/ck_{run}"
        out = f"{work}/out_{run}"
        admitted = []

        def _sink(batch_df, _bid):
            admitted.append(
                admitted_documents(batch_df)
                .select("doc_id")
                .count()
            )

        stream = spark.readStream.schema(
            "doc_id long, text string, ts timestamp"
        ).parquet(src)
        t0 = time.monotonic()
        q = (
            near_dedup_band_stream(stream, watermark="24 hours")
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        el = time.monotonic() - t0
        if run > 0:
            times.append(el)
        n_admitted = sum(admitted)

    med = statistics.median(times)
    print(
        json.dumps(
            {
                "metric": "neardup_stream_docs_per_s",
                "value": round(args.n_docs / med, 1),
                "unit": "docs/s",
                "n_docs": args.n_docs,
                "dup_factor": args.dup_factor,
                "n_admitted": n_admitted,
                "median_s": round(med, 3),
                "runs_s": [round(t, 3) for t in times],
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
