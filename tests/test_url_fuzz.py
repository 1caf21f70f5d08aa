"""Differential fuzzing of the URL-canonicalization seam (q112).

Same rationale as tests/test_regex_fuzz.py: the only real failures
live on cross-engine seams, and q112 puts regexp parsing + list
sort/filter semantics on one.  Randomized URLs — hostile hosts, odd
ports (including string-unequal spellings like ``:080``), duplicate
and empty query params, utm variants, fragments, userinfo, garbage —
run through Spark's ``canonicalize_url`` and the DuckDB expression
from ``duckdb_canonicalize_sql`` (the SAME expression the q112 oracle
trusts), asserting identical canonical output per URL including the
garbage→NULL arm.

Plus an engine-independent property: canonicalization is IDEMPOTENT —
re-canonicalizing a non-NULL canonical spelling is a fixpoint (if it
were not, the dedup key space would depend on how many times a
pipeline stage ran).

Hosts stay ASCII by construction: RFC hostnames are ASCII (IDN is
punycoded before it reaches a crawl frontier), and Unicode case
folding is a DOCUMENTED engine divergence we do not paper over by
fuzzing around it.

Seeded and deterministic: SPARK_GRAFT_UFUZZ_SEED /
SPARK_GRAFT_UFUZZ_N reproduce any failure.  Soak record (committed):
seeds 20260815, 20260816, and 20260819 at 2000 URLs each — zero
divergences.
Suite default is 400 URLs (~10 s).
"""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.operators.urltools import (
    canonicalize_url,
    duckdb_canonicalize_sql,
)

SEED = int(os.environ.get("SPARK_GRAFT_UFUZZ_SEED", "20260815"))
N_URLS = int(os.environ.get("SPARK_GRAFT_UFUZZ_N", "400"))


def _url(rng: random.Random) -> str:
    scheme = rng.choice(
        ["http", "https", "HTTP", "HTTPS", "HtTp", "ftp", "ws"]
    )
    s = scheme + "://"
    if rng.random() < 0.15:
        s += rng.choice(
            ["user", "a.b+c", "x%40y", "alice:secret", "UPPER:Case"]
        ) + "@"
    host = rng.choice(
        ["Host.COM", "a.io", "sub.D-ash.org", "h", "123.45.67.89",
         "xn--bcher-kva.example", "trailing-dot.com.",
         "[::1]", "[2001:db8::1]"]
    )
    s += host
    if rng.random() < 0.4:
        s += rng.choice(
            [":80", ":443", ":8080", ":080", ":0443", ":1",
             ":65535", ":00080",
             # malformed suffixes — must quarantine, not merge
             ":8x", ":", ":1:2", ":0x50"]
        )
    if rng.random() < 0.7:
        segs = rng.randrange(0, 4)
        s += "/" + "/".join(
            rng.choice(["p", "Article.html", "x_1", "a%20b", "", ".."])
            for _ in range(segs)
        )
        if rng.random() < 0.4:
            s += "/"
    if rng.random() < 0.6:
        n = rng.randrange(0, 5)
        parts = [
            rng.choice(
                ["id=1", "id=2", "ref=rss", "a=b=c", "utm_source=x",
                 "utm_medium", "", "bare", "k=", "=v", "xutm_k=1",
                 "A=1", "a=%26"]
            )
            for _ in range(n)
        ]
        s += "?" + "&".join(parts)
    if rng.random() < 0.3:
        s += "#" + rng.choice(["frag", "sec/2", "?fake=q", ""])
    return s


def _garbage(rng: random.Random) -> str:
    return rng.choice(
        ["", "no scheme here", "://x.com/a", "http:/one-slash.com",
         "http//missing.colon", "mailto:a@b.c", "//protocol.relative",
         "http://", "https://?q=only", "http://#only", "   "]
    )


def test_url_canonicalization_differential_fuzz(spark, duck):
    rng = random.Random(SEED)
    rows = [
        (i, _garbage(rng) if rng.random() < 0.15 else _url(rng))
        for i in range(N_URLS)
    ]

    s_out = {
        r.i: r.c
        for r in spark.createDataFrame(rows, "i long, url string")
        .select("i", canonicalize_url("url").alias("c"))
        .collect()
    }

    duck.sql("DROP TABLE IF EXISTS uf")
    duck.sql("CREATE TABLE uf (i BIGINT, url VARCHAR)")
    duck.executemany("INSERT INTO uf VALUES (?, ?)", rows)
    d_out = dict(
        duck.sql(
            f"SELECT i, {duckdb_canonicalize_sql('url')} FROM uf"
        ).fetchall()
    )

    divergences = [
        (i, rows[i][1], s_out[i], d_out.get(i))
        for i, _ in rows
        if s_out[i] != d_out.get(i)
    ]
    assert not divergences, (
        f"{len(divergences)} canonicalization divergences (seed={SEED}); "
        f"first 3: {divergences[:3]}"
    )


def test_canonicalization_is_idempotent(spark):
    rng = random.Random(SEED + 1)
    rows = [(i, _url(rng)) for i in range(N_URLS)]
    once = spark.createDataFrame(rows, "i long, url string").select(
        "i", canonicalize_url("url").alias("c1")
    ).filter(F.col("c1").isNotNull())
    both = once.select(
        "i", "c1", canonicalize_url("c1").alias("c2")
    )
    bad = both.filter(F.col("c1") != F.col("c2")).collect()
    assert not bad, f"non-fixpoint canonicals (seed={SEED + 1}): {bad[:3]}"
    assert once.count() > 0
