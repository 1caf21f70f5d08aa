"""Hot-block probe for blocked fuzzy linkage (q121's operator): one
degenerate block key — every clean record sharing the same last-3
suffix, the boilerplate-default pathology — against a dirty stream
that also lands in that block.

What it proves: the clean-side width cap (max_block_width,
WindowGroupLimit truncation) bounds within-block pair enumeration at
|dirty_in_block| * cap regardless of how wide the hot block grows, so
the tail task stays bounded; the uncapped control at a SMALL width
shows the quadratic the cap is holding back (running the uncapped
100k-wide block would be |dirty| * 100k levenshteins — the point is
precisely not to).

    python scripts/linkage_skew_probe.py [--hot-width 100000]
        [--n-dirty 2000] [--cap 4096]

Emits one JSON line: capped timing at the full hot width, uncapped
timing at a 10x-smaller width (extrapolation base), and the matched
row count under each.  Recorded in PERFORMANCE.md.
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
    ap.add_argument("--hot-width", type=int, default=100_000)
    ap.add_argument("--n-dirty", type=int, default=2_000)
    ap.add_argument("--cap", type=int, default=4_096)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from golang_cassandra_kafka_feed_spark.operators.linkage import (
        blocked_fuzzy_matches,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # every clean name ends in the same 3 chars -> ONE block
    clean = spark.range(args.hot_width).select(
        F.col("id"),
        F.concat(
            F.lit("n"),
            F.md5(F.col("id").cast("string")).substr(1, 8),
            F.lit("xyz"),
        ).alias("name"),
    )
    dirty = spark.range(args.n_dirty).select(
        (F.col("id") + 10_000_000).alias("dirty_id"),
        F.concat(
            F.lit("n"),
            F.md5(F.col("id").cast("string")).substr(2, 7),
            F.lit("xyz"),
        ).alias("dirty_name"),
    )

    out: dict = {
        "hot_width": args.hot_width,
        "n_dirty": args.n_dirty,
        "cap": args.cap,
    }
    t = time.time()
    capped = blocked_fuzzy_matches(
        dirty, clean, max_dist=2, max_block_width=args.cap
    )
    out["capped_rows"] = capped.count()
    out["capped_sec"] = round(time.time() - t, 2)

    # uncapped control at a 10x-smaller block: the quadratic base the
    # cap is holding back at full width
    small = clean.filter(F.col("id") < args.hot_width // 10)
    t = time.time()
    unc = blocked_fuzzy_matches(
        dirty, small, max_dist=2, max_block_width=None
    )
    out["uncapped_small_rows"] = unc.count()
    out["uncapped_small_sec"] = round(time.time() - t, 2)
    out["uncapped_small_width"] = args.hot_width // 10

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
