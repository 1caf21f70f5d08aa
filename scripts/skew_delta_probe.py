"""Skewed-delta probe for the incremental MinHash index (verdict-r7
ask #8): one hot bucket family — a celebrity-template delta whose
copies all but share their shingle sets — against a cold sf1.0 index.

What it proves: (a) the broadcast semi-join prune keeps the stored-index
scan proportional to the delta's bucket set even when that set is
pathologically concentrated, and (b) the union-side width cap bounds
the hot bucket's membership BEFORE the pair blowup, so the tail task
stays bounded instead of exploding quadratically in the number of
template copies (5000 copies uncapped would be ~12.5M pairs per hot
bucket).

    python scripts/skew_delta_probe.py [--sf-dir /tmp/sf1.0]
        [--n-copies 5000] [--index-dir /tmp/gckfs_skew_probe_idx]

Emits one JSON line: timings for the skewed delta and a same-size
uniform delta, the post-cap per-partition row histogram of the
candidate stage (the task-skew surface), and the hot family's
pre-cap/post-cap bucket widths.  Recorded in PERFORMANCE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1.0")
    ap.add_argument("--n-copies", type=int, default=5000)
    ap.add_argument("--index-dir", default="/tmp/gckfs_skew_probe_idx")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        MAX_BUCKET_WIDTH,
    )
    from golang_cassandra_kafka_feed_spark.operators.minhash_index import (
        ensure_minhash_index,
        minhash_near_duplicates_incremental,
    )
    from golang_cassandra_kafka_feed_spark.sources.testdata import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, args.sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    # Key the index path on the corpus's input files (the q110/q117
    # staleness idiom): a regenerated or different --sf-dir must never
    # silently reuse a prior corpus's committed index (review-found,
    # round 8 — ensure would accept it because the PARAMETERS match).
    import hashlib

    staleness = hashlib.md5(
        ("|".join(sorted(docs.inputFiles())) or args.sf_dir).encode()
    ).hexdigest()[:12]
    index_dir = f"{args.index_dir}_{staleness}"

    # fail fast BEFORE the expensive index build
    base_id = (docs.agg(F.max("doc_id")).head()[0] or 0) + 1
    template_row = docs.filter(F.length("text") > 200).head()
    if template_row is None:
        sys.exit(
            f"no document in {args.sf_dir} exceeds 200 chars — "
            "nothing to use as the celebrity template"
        )
    template = template_row.text

    t0 = time.time()
    ensure_minhash_index(
        corpus,
        index_dir,
        signature_partitions=spark.sparkContext.defaultParallelism,
    )
    build_sec = round(time.time() - t0, 2)
    args.index_dir = index_dir

    # Celebrity-template delta: n copies of ONE text, each with a
    # 1-token unique suffix — near-identical shingle sets, so their
    # band buckets concentrate on a handful of (band, bucket) keys.
    skewed = spark.range(args.n_copies).select(
        (F.col("id") + base_id).alias("doc_id"),
        F.concat(
            F.lit(template + " copy marker "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    # Same-size uniform control: n distinct real documents re-keyed.
    uniform = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .limit(args.n_copies)
        .select(
            (F.col("doc_id") + base_id + args.n_copies).alias("doc_id"),
            "text",
        )
    )

    def timed(delta):
        t0 = time.time()
        n = minhash_near_duplicates_incremental(
            delta, args.index_dir, threshold=0.5
        ).count()
        return round(time.time() - t0, 2), n

    uni_sec, uni_pairs = timed(uniform)
    skew_sec, skew_pairs = timed(skewed)

    # Skew surface: per-partition row counts of the capped-members
    # stage (what each task actually carries into the pair blowup).
    from golang_cassandra_kafka_feed_spark.operators.minhash_index import (
        _cap_bucket_width,
        _index_rows,
        read_index_meta,
    )

    meta = read_index_meta(spark, args.index_dir)
    delta_bands, _ = _index_rows(
        skewed, "text", "doc_id", {**meta, "ts_col": None}
    )
    pre = (
        delta_bands.groupBy("band", "bucket")
        .count()
        .agg(
            F.max("count").alias("max_w"),
            F.expr("percentile(count, 0.5)").alias("med_w"),
        )
        .head()
    )
    capped = _cap_bucket_width(
        delta_bands, ["band", "bucket"], "id", MAX_BUCKET_WIDTH, None
    )
    hist = (
        capped.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .select("count")
        .collect()
    )
    rows = sorted(r["count"] for r in hist)

    print(
        json.dumps(
            {
                "metric": "skewed_delta_incremental",
                "sf_dir": args.sf_dir,
                "n_copies": args.n_copies,
                "index_build_sec": build_sec,
                "uniform_delta_sec": uni_sec,
                "uniform_pairs": uni_pairs,
                "skewed_delta_sec": skew_sec,
                "skewed_pairs": skew_pairs,
                "precap_max_bucket_width": pre["max_w"],
                "precap_median_bucket_width": float(pre["med_w"]),
                "cap": MAX_BUCKET_WIDTH,
                "capped_task_rows_min": rows[0] if rows else 0,
                "capped_task_rows_max": rows[-1] if rows else 0,
                "capped_task_rows": rows,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
