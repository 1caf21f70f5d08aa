"""Capture `.explain("formatted")` snapshots for optimization evidence.

    python scripts/capture_plans.py --out plans/r11 --suffix before q42_... q39_...

Plan-only (no jobs run), so it is safe alongside other work.  sf dir
defaults to the bench SF (sf0.1) so the snapshot matches the plans the
bench times.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r11")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from golang_cassandra_kafka_feed_spark.plans.queries import QUERIES
    from golang_cassandra_kafka_feed_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = Path(_REPO) / args.out
    out.mkdir(parents=True, exist_ok=True)
    for key in args.keys:
        df = QUERIES[key](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out / f"{key}_{args.suffix}.txt").write_text(plan)
        print(f"wrote {out}/{key}_{args.suffix}.txt")


if __name__ == "__main__":
    main()
