"""Driver simulation per .claude/skills/verify: vanilla session, smoke
entry(), then full oracle hash-compare at sf0.01.

Usage: python scripts/driver_sim.py [--queries k1,k2,...]
                                    [--sf DIR] [--master M] [--mem G]
(no flag = the whole registry at sf0.01; unknown keys fail fast rather
than silently checking nothing.  --sf points BOTH engines at another
testdata dir — e.g. /tmp/sf1.0 for the scale-parity sweep, r10
verdict ask #5)."""
import argparse
import hashlib
import sys
from collections import Counter
from datetime import date, datetime

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as e

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Parse + validate BEFORE the Spark/DuckDB startup: a typoed key or
# bad flag must fail in milliseconds, not after minutes of engine
# setup (the registry import is cheap, the sessions are not).
ap = argparse.ArgumentParser()
ap.add_argument("--queries", default="", help="comma-separated key subset")
ap.add_argument("--sf", default="/root/testdata/sf0.01")
ap.add_argument("--master", default="local[8]")
ap.add_argument("--mem", default="8g")
ap.add_argument("--exclude", default="", help="comma-separated keys to skip")
ap.add_argument(
    "--oracle-timeout", type=float, default=0.0,
    help="seconds before the DuckDB side of ONE key is interrupted "
         "(0 = unlimited); a timed-out key is reported ORACLE-TIMEOUT, "
         "not failed — used by the sf1.0 scale sweep where some "
         "oracle twins are compute-bound (r10)",
)
args = ap.parse_args()
SF = args.sf
wanted = [k for k in args.queries.split(",") if k]
excluded = {k for k in args.exclude.split(",") if k}
if wanted:
    unknown = sorted(set(wanted) - set(e.queries()))
    if unknown:
        sys.exit(f"unknown keys: {unknown}")


def norm(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


spark = (SparkSession.builder.master(args.master)
         .config("spark.driver.memory", args.mem)
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

df = e.entry(spark)
rows = df.collect()
print(f"entry: {len(rows)} rows, schema={[f.name for f in df.schema]}")
assert len(rows) >= 0

def fresh_con():
    c = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; scale-probe dirs (e.g.
        # the r9 /tmp/sf1.0) use Spark's directory-of-parts layout
        import os
        src = f"{SF}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        c.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{src}'")
    return c


con = fresh_con()

qs, osql = e.queries(), e.oracle_sql()
if wanted:
    qs = {k: qs[k] for k in wanted}
if excluded:
    qs = {k: v for k, v in qs.items() if k not in excluded}

failures = []
for name in sorted(qs):
    if name not in osql:
        print(f"{name}: rows-only (no oracle)")
        continue
    try:
        sdf = qs[name](spark, SF)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        timer = None
        if args.oracle_timeout > 0:
            import threading
            # The timer can fire AFTER fetchall() returns but BEFORE
            # cancel() runs; an unguarded con.interrupt() then lands
            # on the NEXT key's query and mislabels it ORACLE-TIMEOUT
            # (advice r10).  The `done` flag closes that window: the
            # callback re-checks it, and the flag is flipped before
            # leaving the protected region.
            done = threading.Event()

            def _interrupt():
                if not done.is_set():
                    con.interrupt()

            timer = threading.Timer(args.oracle_timeout, _interrupt)
            timer.start()
        try:
            rel = con.sql(osql[name])
            ocols = rel.columns
            orows = rel.fetchall()
        except duckdb.InterruptException:
            print(f"{name}: ORACLE-TIMEOUT after {args.oracle_timeout}s "
                  f"(spark side returned {len(srows)} rows)")
            # a pending interrupt must never leak into the next key's
            # query (advice r10) — drop the connection entirely
            con.close()
            con = fresh_con()
            continue
        finally:
            if timer is not None:
                done.set()
                timer.cancel()
        problems = []
        if set(scols) != set(ocols):
            problems.append(f"schema {sorted(scols)} vs {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if not problems and digest(scols, srows) != digest(ocols, orows):
            problems.append("hash mismatch")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"{name}: FAIL {problems}")
        else:
            print(f"{name}: ok ({len(srows)} rows)")
    except Exception as ex:
        failures.append((name, str(ex).split(chr(10))[0][:200]))
        print(f"{name}: ERROR {str(ex).splitlines()[0][:200]}")

print()
if failures:
    print(f"FAILURES: {len(failures)}")
    for n, p in failures:
        print(" ", n, "-", p)
    sys.exit(1)
print("FAILURES: none")
spark.stop()
