"""Chunked sf1.0 scale probe: time every registry query at a scale dir.

One fresh JVM per chunk of queries (a single long-lived JVM degrades
progressively and poisons late timings — PERFORMANCE.md round-2
methodology note), emitting one JSON line per chunk to stdout and a
combined JSON at the end.

    python scripts/scale_probe.py [--sf-dir /tmp/sf1.0] [--chunk 8] \
        [--queries q37,q47]            # optional name filter

Spawns itself with --worker for each chunk.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def worker(sf_dir: str, names: list[str]) -> None:
    from pyspark.sql import SparkSession

    from golang_cassandra_kafka_feed_spark.plans.queries import QUERIES

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # absorb JVM/codegen warmup so chunk members are comparable
    QUERIES["q19_global_topk"](spark, sf_dir).count()
    out = {}
    for name in names:
        t0 = time.time()
        n = QUERIES[name](spark, sf_dir).count()
        out[name] = {"sec": round(time.time() - t0, 2), "rows": n}
    print("CHUNK_RESULT " + json.dumps(out), flush=True)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1.0")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--queries", default="")
    ap.add_argument("--worker", default="")
    args = ap.parse_args()

    if args.worker:
        worker(args.sf_dir, args.worker.split(","))
        return

    from golang_cassandra_kafka_feed_spark.plans.queries import QUERIES

    names = sorted(QUERIES)
    if args.queries:
        keys = args.queries.split(",")
        names = [n for n in names if any(k in n for k in keys)]
    combined: dict[str, dict] = {}
    for i in range(0, len(names), args.chunk):
        chunk = names[i : i + args.chunk]
        proc = subprocess.run(
            [
                sys.executable,
                __file__,
                "--sf-dir",
                args.sf_dir,
                "--worker",
                ",".join(chunk),
            ],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("CHUNK_RESULT "):
                part = json.loads(line[len("CHUNK_RESULT "):])
                combined.update(part)
                print(line, flush=True)
                break
        else:
            print(
                f"CHUNK_FAILED {chunk}: {proc.stderr[-500:]}",
                flush=True,
            )
    total = round(sum(v["sec"] for v in combined.values()), 1)
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "n_queries": len(combined),
                "total_sec": total,
                "queries": combined,
            }
        )
    )


if __name__ == "__main__":
    main()
