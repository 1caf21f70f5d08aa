"""applyInPandasWithState sessionizer: true streaming run must agree with
the batch gap-and-island oracle (Q27) on the real events table.

Same harness shape as test_streaming_windows.py: real events as one file,
then two far-future sentinel files — the first advances the watermark past
every real session's end+gap, the second gives the engine a batch in which
those event-time timeouts actually fire and flush the open sessions.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.plans.queries import QUERIES
from golang_cassandra_kafka_feed_spark.sources.testdata import load_table
from golang_cassandra_kafka_feed_spark.streaming.stateful import (
    sessionize_with_state,
)

_SENTINEL_USER = -1
_SCHEMA = "user_id long, ts timestamp, value double"


def test_stateful_sessionizer_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    src = tmp_path / "ev"
    ev.coalesce(1).write.parquet(str(src / "batch0"))
    far = ev.agg(F.max("ts")).first()[0] + dt.timedelta(days=30)
    for i, ts in enumerate([far, far + dt.timedelta(days=1)], start=1):
        spark.createDataFrame(
            [(_SENTINEL_USER, ts, 0.0)], _SCHEMA
        ).write.parquet(str(src / f"batch{i}"))

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch*"))
    )
    q = (
        sessionize_with_state(stream, gap_seconds=1800, watermark="1 minute")
        .writeStream.format("memory")
        .queryName("stateful_sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    emitted = (
        spark.sql("SELECT * FROM stateful_sess")
        .filter(F.col("user_id") != _SENTINEL_USER)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            (F.round(F.sum("value_sum") * 100) / 100).alias("value_sum"),
        )
    )
    got = {
        (r.user_id, r.n_sessions, r.n_events, r.value_sum)
        for r in emitted.collect()
    }

    batch_totals = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (F.round(F.sum("value") * 100) / 100).alias("value_sum"),
    )
    want = {
        (r.user_id, r.n_sessions, r.n_events, r.value_sum)
        for r in QUERIES["q27_session_window"](spark, sf_dir)
        .join(batch_totals, "user_id")
        .select("user_id", "n_sessions", "n_events", "value_sum")
        .collect()
    }
    assert got == want


def test_stateful_sessionizer_payload_and_gap_split(spark, tmp_path):
    """Unit semantics: strict-gap split, in-gap merge, custom payload."""
    base = dt.datetime(2025, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 10.0),
        (1, base + dt.timedelta(minutes=10), 5.0),
        (1, base + dt.timedelta(minutes=50), 1.0),  # 40 min gap -> split
        (2, base, 2.0),
    ]
    src = tmp_path / "u"
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
        str(src / "b0")
    )
    far = base + dt.timedelta(days=30)
    for i, ts in enumerate([far, far + dt.timedelta(days=1)], start=1):
        spark.createDataFrame(
            [(_SENTINEL_USER, ts, 0.0)], _SCHEMA
        ).write.parquet(str(src / f"b{i}"))

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    q = (
        sessionize_with_state(stream, gap_seconds=1800, watermark="1 minute")
        .writeStream.format("memory")
        .queryName("stateful_unit")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.value_sum)
        for r in spark.sql(
            "SELECT * FROM stateful_unit WHERE user_id >= 0"
        ).collect()
    }
    assert got == {
        (1, base, base + dt.timedelta(minutes=10), 2, 15.0),
        (
            1,
            base + dt.timedelta(minutes=50),
            base + dt.timedelta(minutes=50),
            1,
            1.0,
        ),
        (2, base, base, 1, 2.0),
    }


def test_early_chain_merges_when_session_rolls_over_in_batch(spark, tmp_path):
    """Round-4 advice (stateful.py): if the open session rolls over
    WITHIN a batch, a pending pre-session chain that reaches within the
    gap of the just-closed session must merge into it at close time —
    state [13:00,13:10] gap 10m, batch {12:45, 12:51, 18:00} is ONE
    oracle session [12:45,13:10] (12:51 widens the open start to 12:51,
    bringing 12:45 within the gap), plus the new [18:00] session — not
    the three islands the after-loop-only merge emitted."""
    base = dt.datetime(2026, 1, 1, 13, 0, 0)
    src = tmp_path / "roll_ev"
    # batch 0: open session [13:00, 13:10]
    spark.createDataFrame(
        [(9, base, 1.0), (9, base + dt.timedelta(minutes=10), 2.0)], _SCHEMA
    ).coalesce(1).write.parquet(str(src / "batch0"))
    # batch 1: early row (12:45), in-gap widen (12:51), rollover (18:00)
    spark.createDataFrame(
        [
            (9, base - dt.timedelta(minutes=15), 4.0),
            (9, base - dt.timedelta(minutes=9), 8.0),
            (9, base + dt.timedelta(hours=5), 16.0),
        ],
        _SCHEMA,
    ).coalesce(1).write.parquet(str(src / "batch1"))
    far = base + dt.timedelta(days=30)
    for i, ts in enumerate([far, far + dt.timedelta(days=1)], start=2):
        spark.createDataFrame(
            [(_SENTINEL_USER, ts, 0.0)], _SCHEMA
        ).write.parquet(str(src / f"batch{i}"))

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch*"))
    )
    q = (
        sessionize_with_state(stream, gap_seconds=600, watermark="100 hours")
        .writeStream.format("memory")
        .queryName("stateful_roll")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = sorted(
        (
            (r.session_start, r.session_end, r.n_events, r.value_sum)
            for r in spark.sql(
                "SELECT * FROM stateful_roll WHERE user_id = 9"
            ).collect()
        )
    )
    assert rows == [
        (
            base - dt.timedelta(minutes=15),
            base + dt.timedelta(minutes=10),
            4,
            15.0,
        ),
        (
            base + dt.timedelta(hours=5),
            base + dt.timedelta(hours=5),
            1,
            16.0,
        ),
    ], f"got {rows}"


def test_late_row_before_open_session_is_its_own_island(spark, tmp_path):
    """A late-but-within-watermark row preceding the open session by
    more than the gap must NOT be glued onto it: batch LAG semantics
    give two sessions ([10:00] and [12:00] at gap 30m), and the
    streaming result must agree."""
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    src = tmp_path / "late_ev"
    # batch 0: the on-time event opens [12:00]
    spark.createDataFrame([(7, base, 1.0)], _SCHEMA).write.parquet(
        str(src / "batch0")
    )
    # batch 1: a 2h-late row (well within the 100h watermark)
    spark.createDataFrame(
        [(7, base - dt.timedelta(hours=2), 2.0)], _SCHEMA
    ).write.parquet(str(src / "batch1"))
    far = base + dt.timedelta(days=30)
    for i, ts in enumerate([far, far + dt.timedelta(days=1)], start=2):
        spark.createDataFrame(
            [(_SENTINEL_USER, ts, 0.0)], _SCHEMA
        ).write.parquet(str(src / f"batch{i}"))

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch*"))
    )
    q = (
        sessionize_with_state(stream, gap_seconds=1800, watermark="100 hours")
        .writeStream.format("memory")
        .queryName("stateful_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = sorted(
        (
            (r.session_start, r.session_end, r.n_events, r.value_sum)
            for r in spark.sql(
                "SELECT * FROM stateful_late WHERE user_id = 7"
            ).collect()
        )
    )
    assert len(rows) == 2, f"expected two sessions, got {rows}"
    assert rows[0][2] == 1 and rows[0][3] == 2.0  # the 10:00 island
    assert rows[1][2] == 1 and rows[1][3] == 1.0  # the 12:00 session


def test_transform_with_state_twin_matches_group_state_api(
    spark, sf_dir, tmp_path
):
    """The Spark-4 transformWithStateInPandas sessionizer must emit the
    EXACT same closed sessions (full rows, not totals) as the
    applyInPandasWithState operator on the same stream — they share the
    _fold_session_batch implementation, and this pins the timer/state
    plumbing around it.

    Gated like the connector tests: the TWS python runner needs
    protobuf (absent in this image).  The gate probe ALWAYS runs — when
    protobuf is missing, the wrapper must raise the documented
    NotImplementedError up front instead of crashing the stream."""
    import pytest as _pt

    from golang_cassandra_kafka_feed_spark.streaming.stateful import (
        sessionize_transform_with_state,
    )

    try:
        import google.protobuf  # noqa: F401
        protobuf_ok = True
    except ImportError:
        protobuf_ok = False

    if not protobuf_ok:
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path))
        )
        with _pt.raises(NotImplementedError, match="protobuf"):
            sessionize_transform_with_state(stream)
        _pt.skip("protobuf absent: TWS runner cannot start in this image")

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    src = tmp_path / "ev"
    ev.coalesce(1).write.parquet(str(src / "batch0"))
    far = ev.agg(F.max("ts")).first()[0] + dt.timedelta(days=30)
    for i, ts in enumerate([far, far + dt.timedelta(days=1)], start=1):
        spark.createDataFrame(
            [(_SENTINEL_USER, ts, 0.0)], _SCHEMA
        ).write.parquet(str(src / f"batch{i}"))

    def run(op, name):
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "batch*"))
        )
        q = (
            op(stream, gap_seconds=1800, watermark="1 minute")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / ("ck_" + name)))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        return {
            tuple(r)
            for r in spark.sql(f"SELECT * FROM {name}")
            .filter(F.col("user_id") != _SENTINEL_USER)
            .collect()
        }

    v1 = run(sessionize_with_state, "sess_v1_api")
    v2 = run(sessionize_transform_with_state, "sess_v2_api")
    assert len(v2) > 0
    assert v1 == v2
