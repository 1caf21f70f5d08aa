"""Randomized multi-batch equivalence fuzz for the stateful sessionizer.

Property (the operator's documented contract, streaming/stateful.py):
for TIME-ORDERED batch delivery — batches cut anywhere in the global
event-time order, rows arbitrarily SHUFFLED within each batch — the
closed-session stream must equal the batch gap-and-island oracle over
the union of all events, exactly (starts, ends, counts, sums).

This is the surface where round-4 advice found a real bug (a pre-session
chain orphaned by a mid-batch rollover); the fuzz walks random batch
cuts and in-batch reorderings so that family of interleavings stays
covered as the operator evolves.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.streaming.stateful import (
    sessionize_with_state,
)

_SENTINEL_USER = -1
_SCHEMA = "user_id long, ts timestamp, value double"
_BASE = dt.datetime(2026, 3, 1)
GAP_S = 600


def _oracle_sessions(events):
    """Plain gap-and-island sessionization (Q27 semantics) in Python:
    events = [(user_id, ts_dt, value)] -> set of session tuples."""
    out = []
    by_user: dict[int, list] = {}
    for u, ts, v in events:
        by_user.setdefault(u, []).append((ts, v))
    for u, evs in by_user.items():
        evs.sort()
        start, end, n, vsum = None, None, 0, 0.0
        for ts, v in evs:
            if start is None:
                start, end, n, vsum = ts, ts, 1, v
            elif (ts - end).total_seconds() > GAP_S:
                out.append((u, start, end, n, vsum))
                start, end, n, vsum = ts, ts, 1, v
            else:
                end, n, vsum = max(end, ts), n + 1, vsum + v
        if start is not None:
            out.append((u, start, end, n, vsum))
    return sorted(out)


def _run_case(spark, tmp_path, seed: int):
    rng = random.Random(seed)
    events = []
    for u in range(1, 4):
        t = 0
        for _ in range(rng.randrange(25, 45)):
            # mixture of in-gap steps and island-forming jumps
            t += rng.choice(
                [rng.randrange(1, GAP_S), rng.randrange(GAP_S + 1, 4 * GAP_S)]
            )
            events.append(
                (
                    u,
                    _BASE + dt.timedelta(seconds=t),
                    float(rng.randrange(1, 10)),
                )
            )

    # time-ordered batch cuts over the globally sorted stream...
    ordered = sorted(events, key=lambda e: e[1])
    n_batches = rng.randrange(3, 6)
    cuts = sorted(rng.sample(range(1, len(ordered)), n_batches - 1))
    batches = [
        ordered[lo:hi]
        for lo, hi in zip([0] + cuts, cuts + [len(ordered)])
    ]
    src = tmp_path / f"fuzz{seed}"
    for i, batch in enumerate(batches):
        rng.shuffle(batch)  # ...with arbitrary order WITHIN the batch
        spark.createDataFrame(batch, _SCHEMA).coalesce(1).write.parquet(
            str(src / f"batch{i:02d}")
        )
    far = max(e[1] for e in events) + dt.timedelta(days=30)
    for j, ts in enumerate([far, far + dt.timedelta(days=1)]):
        spark.createDataFrame(
            [(_SENTINEL_USER, ts, 0.0)], _SCHEMA
        ).write.parquet(str(src / f"batch{len(batches) + j:02d}"))

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch*"))
    )
    name = f"stateful_fuzz_{seed}"
    q = (
        sessionize_with_state(stream, gap_seconds=GAP_S, watermark="1 minute")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = sorted(
        (
            r.user_id,
            r.session_start,
            r.session_end,
            r.n_events,
            r.value_sum,
        )
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        if r.user_id != _SENTINEL_USER
    )
    want = _oracle_sessions(events)
    assert got == want, (
        f"seed {seed}: {len(got)} streamed vs {len(want)} oracle sessions; "
        f"streamed-only={[g for g in got if g not in want][:3]} "
        f"oracle-only={[w for w in want if w not in got][:3]}"
    )


def test_stateful_sessionizer_fuzz_batch_equivalence(spark, tmp_path):
    for seed in (11, 29, 47):
        _run_case(spark, tmp_path, seed)
