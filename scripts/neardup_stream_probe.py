"""Throughput probe for the streaming NEAR-dup admission guard
(streaming/ingest.py::near_dedup_band_stream + admitted_documents).

Shape mirrors the round-6 exact-dedup probe (PERFORMANCE.md addendum):
a heavily near-duplicated corpus (every family of ``--dup-factor``
docs is one base text plus light tails — the re-crawl shape; families
mutually distinct), parquet source split into ``--n-files`` files read
``--files-per-trigger`` at a time (multi-batch, the operator's
granularity contract), banding ->
dropDuplicatesWithinWatermark(band, bucket) -> foreachBatch admission,
availableNow, fresh checkpoint per run, median of ``--runs``.  The
headline is docs/s; ``n_admitted`` is reported with the within-batch
granularity caveat from the operator docstring (families co-arriving
in one batch may split their bucket wins).

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
    ap.add_argument("--n-files", type=int, default=50)
    ap.add_argument("--files-per-trigger", type=int, default=1)
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
    # Re-crawl arrival order: ids 0..n_fam-1 are the mutually-distinct
    # ORIGINALS (8 family-specific derived words each, cross-family
    # Jaccard ~0), later ids are near-dup re-crawls of them (same words
    # + a tail variant).  Range-partitioned by doc_id so the file
    # source (ordered by path at equal mtimes) delivers the originals
    # in the first trigger and the duplicate tail afterwards — each
    # original wins all its own buckets uncontested, every re-crawl
    # finds its buckets in state and drops; n_admitted ~= n_fam.
    did = F.col("id")
    fam = F.when(did < n_fam, did).otherwise((did - n_fam) % n_fam)
    tail = F.when(did < n_fam, F.lit(0)).otherwise(
        (did - n_fam) / n_fam + 1
    ).cast("int")
    # the shingle tokenizer keeps [a-z]+ runs only, so family tokens
    # must differ in LETTERS — digits are stripped (the trap that made
    # an earlier probe corpus collapse to one document)
    def _w(col):
        return F.translate(col.cast("string"), "0123456789", "abcdefghij")

    fam_words = [
        F.concat(F.lit("w"), _w((fam * p + p) % 99991))
        for p in (3, 5, 7, 11, 13, 17, 19, 23)
    ]
    (
        spark.range(args.n_docs)
        .select(
            did.alias("doc_id"),
            F.concat_ws(
                " ",
                F.lit("corpus doc"),
                *fam_words,
                F.lit("tail"),
                _w(tail),
            ).alias("text"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=did / 1000.0)
            ).alias("ts"),
        )
        .repartitionByRange(args.n_files, "doc_id")
        .sortWithinPartitions("doc_id")
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

        stream = (
            spark.readStream.schema(
                "doc_id long, text string, ts timestamp"
            )
            .option("maxFilesPerTrigger", args.files_per_trigger)
            .parquet(src)
        )
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
