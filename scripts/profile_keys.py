"""Isolated per-key profiler for optimization work (guide §1).

Usage:
    python scripts/profile_keys.py q82_ann_rrf_fusion q123_prefix_filter_join \
        [--sf /root/testdata/sf0.1] [--reps 3] [--explain-dir plans/r11] \
        [--suffix before]

For each key: 1 unmeasured cold run + ``reps`` steady runs through the
noop sink (full plan execution, nothing crosses to the driver), median
reported.  With --explain-dir, writes ``<dir>/<key>_<suffix>.txt`` with
the ``explain("formatted")`` output of the exact DataFrame the bench
executes.  Jobs are labelled for the UI (guide §1.5).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from golang_cassandra_kafka_feed_spark.plans.queries import QUERIES
    from golang_cassandra_kafka_feed_spark.session import get_spark

    spark = get_spark(app_name="profile_keys")
    spark.sparkContext.setLogLevel("ERROR")

    try:
        load_1m = os.getloadavg()[0]
    except OSError:
        load_1m = -1.0
    out: dict[str, dict] = {"__load_1m": round(load_1m, 2)}

    for key in args.keys:
        if key not in QUERIES:
            print(f"UNKNOWN KEY: {key}", file=sys.stderr)
            continue
        fn = QUERIES[key]
        if args.explain_dir:
            d = Path(args.explain_dir)
            d.mkdir(parents=True, exist_ok=True)
            plan = fn(spark, args.sf)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, args.sf)._jdf.queryExecution(), "formatted"
            )
            (d / f"{key}_{args.suffix}.txt").write_text(plan)
        reps: list[float] = []
        for i in range(args.reps + 1):
            spark.sparkContext.setJobDescription(f"{key} rep {i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            if i > 0:
                reps.append(el)
            else:
                cold = el
        med = statistics.median(reps)
        out[key] = {
            "cold": round(cold, 3),
            "steady_med": round(med, 3),
            "reps": [round(r, 3) for r in reps],
        }
        print(f"{key}: cold={cold:.3f} steady={med:.3f} reps={[round(r,3) for r in reps]}", flush=True)

    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
