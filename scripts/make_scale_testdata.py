"""Synthesize a larger scale factor from an existing testdata directory.

Perf-only data for the sf1.0 scale proof (PERFORMANCE.md): each fact
table is replicated ``--factor`` times with key columns shifted by a
large stride so replicas never collide; dimension tables (region,
nation) are shared.  Correctness stays pinned to the driver-provided
/root/testdata SFs — this data exists to answer "does the plan still
behave at 10x the gate SF", not to check values.

Design choices that keep the scaled data *shaped* like real growth:

- referential integrity per replica: orders.o_custkey shifts with
  customer.c_custkey, lineitem.l_{order,part,supp}key shift with their
  parents, so join fan-outs scale linearly.
- documents get every word prefixed with a letters-only replica tag
  (q<tag>, e.g. 'qba' — never digit-bearing like 'r3', because the
  tokenizers split on [^a-z]+ and a digit tag would re-tokenize every
  replica back into the original word stream, collapsing all replicas
  into exact token-clones): shingle
  sets are DISJOINT across replicas, so near-dup pair counts grow
  linearly (10x planted pairs), not quadratically (every doc x its 9
  clones would be the mass-identical-corpus pathology the dedup
  operators tell users to drain with exact_dedup first).
- events keep their time range (density grows 10x) and shift user_id by
  100 per replica (10x the user cardinality, same per-user volume).
- embeddings keep their vectors (ANN candidate lists grow linearly per
  bucket; queries are replica-0 ids).

Usage: python scripts/make_scale_testdata.py [--src /root/testdata/sf0.1]
       [--dst /tmp/sf1.0] [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

STRIDE = 10_000_000

# table -> list of (column, per-replica shift expression template using {i})
SHIFTS: dict[str, dict[str, str]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "c_custkey + {i} * %d" % STRIDE},
    "supplier": {"s_suppkey": "s_suppkey + {i} * %d" % STRIDE},
    "part": {"p_partkey": "p_partkey + {i} * %d" % STRIDE},
    "orders": {
        "o_orderkey": "o_orderkey + {i} * %d" % STRIDE,
        "o_custkey": "o_custkey + {i} * %d" % STRIDE,
    },
    "lineitem": {
        "l_orderkey": "l_orderkey + {i} * %d" % STRIDE,
        "l_partkey": "l_partkey + {i} * %d" % STRIDE,
        "l_suppkey": "l_suppkey + {i} * %d" % STRIDE,
    },
    "events": {
        "event_id": "event_id + {i} * %d" % STRIDE,
        "user_id": "user_id + {i} * 100",
    },
    # Replica tag must be LETTERS ONLY: the engine's tokenizers split on
    # [^a-z]+, so a digit-bearing prefix ('r3hello') would split into
    # 'r' + 'hello' — every replica would tokenize identically and the
    # corpus becomes 10 exact clones of itself (quadratic near-dup
    # pathology, measured: 3.6M candidate pairs instead of ~2.6k).
    "documents": {
        "doc_id": "doc_id + {i} * %d" % STRIDE,
        "text": "CASE WHEN {i} = 0 THEN text ELSE "
        "regexp_replace(text, '([A-Za-z]+)', 'q{tag}\\1', 'g') END",
    },
    "embeddings": {"vec_id": "vec_id + {i} * %d" % STRIDE},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1.0")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    con = duckdb.connect()
    for table, shifts in SHIFTS.items():
        src = f"{args.src}/{table}.parquet"
        if table == "events":
            # pyarrow path: preserves the INT64 TIMESTAMP(NANOS) physical
            # type of the source (DuckDB COPY would rewrite it as us,
            # bypassing the engine's ns read path — the thing the scale
            # run must exercise).
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            t = pq.read_table(src)
            outdir = f"{args.dst}/{table}.parquet"
            os.makedirs(outdir, exist_ok=True)
            n = 0
            for i in range(args.factor):
                r = t.set_column(
                    t.schema.get_field_index("event_id"),
                    "event_id",
                    pc.add(t["event_id"], i * STRIDE),
                )
                r = r.set_column(
                    r.schema.get_field_index("user_id"),
                    "user_id",
                    pc.add(r["user_id"], i * 100),
                )
                pq.write_table(
                    r,
                    f"{outdir}/part-{i:03d}.parquet",
                    coerce_timestamps=None,
                    use_deprecated_int96_timestamps=False,
                )
                n += len(r)
            print(f"{table}: {n} rows (pyarrow, ns preserved, {args.factor} files)")
            continue
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        if not shifts:  # shared dimension
            con.execute(
                f"COPY (SELECT * FROM '{src}') TO '{args.dst}/{table}.parquet'"
            )
            continue
        # One file per replica: a single monolithic file caps the Spark
        # scan at 1-2 tasks (row-group granularity) and starves every
        # downstream stage — real large-scale inputs are many files.
        outdir = f"{args.dst}/{table}.parquet"
        os.makedirs(outdir, exist_ok=True)
        for i in range(args.factor):
            tag = chr(ord("a") + i % 26) + chr(ord("a") + (i // 26) % 26)
            exprs = ", ".join(
                f"{shifts[c].format(i=i, tag=tag)} AS {c}"
                if c in shifts
                else c
                for c in cols
            )
            con.execute(
                f"COPY (SELECT {exprs} FROM '{src}') "
                f"TO '{outdir}/part-{i:03d}.parquet'"
            )
        n = con.execute(
            f"SELECT count(*) FROM '{outdir}/*.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows ({args.factor} files)")


if __name__ == "__main__":
    main()
