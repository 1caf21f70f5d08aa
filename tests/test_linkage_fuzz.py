"""Differential fuzzing of the blocked-fuzzy-linkage seam (q121).

Spark scores with the threshold form ``levenshtein(l, r, 2)`` (early
abandon, -1 past the bound); DuckDB with plain ``levenshtein() <= 2``
— the fuzzer proves the two agree on the matched pair AND the distance
for every dirty record, across random registries and 0-2 random edits
(delete / substitute / insert at random positions, including edits
inside the last-3 block key, where BOTH engines must symmetrically
lose the candidate — blocking is part of the shared contract).

Seeded and deterministic: SPARK_GRAFT_LKFUZZ_SEED /
SPARK_GRAFT_LKFUZZ_N reproduce any failure.  Soak record (committed):
seeds 20260816 x 1500 and 20260817 x 800 dirty records — zero
divergences.  Suite default is 300 (~10 s).
"""

from __future__ import annotations

import os
import random
import string

import duckdb

from golang_cassandra_kafka_feed_spark.operators.linkage import (
    blocked_fuzzy_matches,
)

SEED = int(os.environ.get("SPARK_GRAFT_LKFUZZ_SEED", "20260816"))
N_DIRTY = int(os.environ.get("SPARK_GRAFT_LKFUZZ_N", "300"))

_ALPHA = string.ascii_lowercase + "-"


def _name(rng: random.Random) -> str:
    return "".join(rng.choice(_ALPHA) for _ in range(rng.randint(6, 12)))


def _edit(rng: random.Random, s: str) -> str:
    if len(s) <= 4:
        return s
    op = rng.choice(("del", "sub", "ins"))
    i = rng.randrange(len(s))
    c = rng.choice(_ALPHA)
    if op == "del":
        return s[:i] + s[i + 1:]
    if op == "sub":
        return s[:i] + c + s[i + 1:]
    return s[:i] + c + s[i:]


def test_linkage_semantics_agree_cross_engine(spark):
    rng = random.Random(SEED)
    clean = [(i, _name(rng)) for i in range(N_DIRTY)]
    dirty = []
    for j in range(N_DIRTY):
        base = rng.choice(clean)[1]
        d = base
        for _ in range(rng.randint(0, 2)):
            d = _edit(rng, d)
        dirty.append((1000 + j, d))

    cdf = spark.createDataFrame(clean, "id bigint, name string")
    ddf = spark.createDataFrame(dirty, "dirty_id bigint, dirty_name string")
    got = {
        r.dirty_id: (r.match_id, r.dist)
        for r in blocked_fuzzy_matches(ddf, cdf).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE clean AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{n}')" for i, n in clean)
        + ") t(id, name)"
    )
    con.execute(
        "CREATE TABLE dirty AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{n}')" for i, n in dirty)
        + ") t(dirty_id, dirty_name)"
    )
    want = {
        di: (mi, dist)
        for di, mi, dist in con.sql(
            """
            SELECT dirty_id, id, dist FROM (
                SELECT d.dirty_id, c.id,
                       levenshtein(d.dirty_name, c.name) AS dist
                FROM dirty d JOIN clean c
                  ON substr(d.dirty_name, length(d.dirty_name) - 2, 3)
                     = substr(c.name, length(c.name) - 2, 3)
                WHERE levenshtein(d.dirty_name, c.name) <= 2
            )
            QUALIFY row_number() OVER (
                PARTITION BY dirty_id ORDER BY dist, id
            ) = 1
            """
        ).fetchall()
    }
    diffs = {
        k: (got.get(k), want.get(k))
        for k in set(got) | set(want)
        if got.get(k) != want.get(k)
    }
    assert not diffs, f"divergence (seed {SEED}): {diffs}"
