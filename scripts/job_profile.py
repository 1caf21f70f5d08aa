"""Job/stage/task composition probe for declared keys (guide §1/§7).

Counts are contention-insensitive (unlike wall time): for each key,
runs ONE steady noop-sink execution (after an unmeasured warm-up that
populates codebook/index memos exactly like the bench steady reps) and
reports how many Spark jobs / stages / tasks it schedules and the
shuffle bytes moved — the fixed-overhead decomposition that explains
why a 2,000-row key can cost seconds at sf0.1.

Usage:
    SPARK_UI=true python scripts/job_profile.py q82_ann_rrf_fusion ...
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _api(port: int, app_id: str, path: str):
    url = f"http://localhost:{port}/api/v1/applications/{app_id}{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    keys = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]

    from golang_cassandra_kafka_feed_spark.plans.queries import QUERIES
    from golang_cassandra_kafka_feed_spark.session import get_spark

    spark = get_spark(app_name="job_profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])

    out = {}
    for key in keys:
        if key not in QUERIES:
            print(f"UNKNOWN KEY: {key}", file=sys.stderr)
            continue
        fn = QUERIES[key]
        # warm-up rep (memos, codegen) — mirrors bench cold run
        spark.sparkContext.setJobDescription(f"{key} warmup")
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        jobs_before = {j["jobId"] for j in _api(port, app_id, "/jobs")}
        spark.sparkContext.setJobDescription(f"{key} measured")
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        jobs = [
            j for j in _api(port, app_id, "/jobs") if j["jobId"] not in jobs_before
        ]
        stages = _api(port, app_id, "/stages?status=complete")
        stage_ids = {s for j in jobs for s in j["stageIds"]}
        st = [s for s in stages if s["stageId"] in stage_ids]
        rec = {
            "wall": round(wall, 3),
            "n_jobs": len(jobs),
            "n_stages": len(st),
            "n_tasks": sum(s["numCompleteTasks"] for s in st),
            "shuffle_write_mb": round(
                sum(s["shuffleWriteBytes"] for s in st) / 1e6, 2
            ),
            "input_mb": round(sum(s["inputBytes"] for s in st) / 1e6, 2),
            "stage_ms_sum": sum(
                s.get("executorRunTime", 0) for s in st
            ),
        }
        out[key] = rec
        print(f"{key}: {json.dumps(rec)}", flush=True)

    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
