"""Custom stateful streaming operator: applyInPandasWithState sessionizer.

The built-in ``F.session_window`` (streaming/windows.py) covers gap-based
session *counts*; this operator is the escape hatch for session semantics
the built-in cannot express — per-session custom payloads (first/last
event ids, value sums) and explicit control over when a session closes.
It is the Spark-native analog of the reference worker's only stateful
behavior (the bounded in-flight queue + at-least-once redelivery horizon,
cmd/worker/worker.go:55-70, internal/broker/kafka.go:92): state lives in
the HDFS/RocksDB state store, bounded by the event-time watermark, not in
process memory.

Semantics (matches operators/sessionize.py and the Q27 gap-and-island
oracle): a new session starts when the gap to the previous event is
STRICTLY greater than ``gap_seconds``.  Sessions are emitted when a later
event closes them, or when the watermark passes ``session_end + gap``
(event-time timeout) — so every session eventually flushes and state per
key is one open session, independent of stream length.

Scale posture: state is partitioned by the group key (one shuffle on
user_id); Arrow-batched pandas transfer; per-key state is O(1) (three
longs), so 10^9 users is bounded by the state store, not the JVM heap.

Late data: rows later than the watermark are dropped by Spark before the
function runs; rows late-but-within-watermark merge into the open session
(start/end widen) when they fall inside the gap of it, form their own
pre-session gap-island chain when they precede the open session by more
than the gap (emitted closed, or merged if the chain reaches back within
the gap), and otherwise start a new session — cross-batch reordering
beyond that is not repaired, which mirrors the reference's "insert where
it lands" stance (worker.go:149).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

_OUT_SCHEMA = (
    "user_id long, start_ms long, end_ms long, n_events long, value_sum double"
)
_STATE_SCHEMA = "start_ms long, end_ms long, n_events long, value_sum double"


_COLS = ["user_id", "start_ms", "end_ms", "n_events", "value_sum"]


def _fold_session_batch(user_id, ts_ms, values, opened, gap_ms):
    """Pure per-batch session fold — the ONE implementation of the
    gap-and-island semantics, shared by the applyInPandasWithState
    operator (Spark 3 GroupState API) and the transformWithStateInPandas
    twin (Spark 4 StatefulProcessor API) so the two can never drift.

    ``opened`` is the open-session state ``(start_ms, end_ms, n, vsum)``
    or None; returns ``(closed_rows, opened')`` where closed_rows are
    ``(user_id, start, end, n, vsum)`` tuples and opened' is never None
    (the caller only folds non-empty batches)."""
    if opened is not None:
        start_ms, end_ms, n, vsum = opened
    else:
        start_ms = None
        end_ms = n = 0
        vsum = 0.0

    closed = []
    # late-but-within-watermark rows EARLIER than the open session by
    # more than the gap form their own pre-session island chain: the
    # previous widen-everything branch glued a 10:00 late row onto an
    # open [12:00] session across a 30-minute gap, diverging from the
    # batch gap-and-island oracle (two sessions, not one).
    early = None  # [start, end, n, vsum] of the pre-session chain
    for t, v in zip(ts_ms, values):
        t = int(t)
        if start_ms is None:
            start_ms, end_ms, n, vsum = t, t, 1, v
        elif t < start_ms - gap_ms:
            if early is None:
                early = [t, t, 1, v]
            elif t - early[1] > gap_ms:
                closed.append((user_id, *early))
                early = [t, t, 1, v]
            else:
                early[1] = max(early[1], t)
                early[2] += 1
                early[3] += v
        elif t - end_ms > gap_ms:
            # the open session closes NOW — resolve any pending
            # pre-session chain against it at this moment, not after
            # the loop: a later event that rolls the session over
            # must not orphan a chain that reaches within the gap of
            # the session being closed (state [100,110] gap 10,
            # batch {85,91,300} is one oracle session [85,110]).
            if early is not None:
                if early[1] >= start_ms - gap_ms:
                    start_ms = min(start_ms, early[0])
                    n += early[2]
                    vsum += early[3]
                else:
                    closed.append((user_id, *early))
                early = None
            closed.append((user_id, start_ms, end_ms, n, vsum))
            start_ms, end_ms, n, vsum = t, t, 1, v
        else:
            # in-gap (possibly late-within-watermark): widen the session
            start_ms = min(start_ms, t)
            end_ms = max(end_ms, t)
            n += 1
            vsum += v
    if early is not None:
        if early[1] >= start_ms - gap_ms:
            # chain reaches within the gap of the open session: merge
            start_ms = min(start_ms, early[0])
            n += early[2]
            vsum += early[3]
        else:
            closed.append((user_id, early[0], early[1], early[2], early[3]))

    return closed, (start_ms, end_ms, n, float(vsum))


def _batch_ts_values(pdfs):
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
    ts_ms = (rows["ts"].astype("int64") // 1_000_000).tolist()
    values = rows["value"].astype("float64").tolist()
    return ts_ms, values


def _make_session_fn(gap_ms: int):
    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])

        if state.hasTimedOut:
            start_ms, end_ms, n, vsum = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, start_ms, end_ms, n, vsum)], columns=_COLS
            )
            return

        ts_ms, values = _batch_ts_values(pdfs)
        opened = tuple(state.get) if state.exists else None
        closed, opened = _fold_session_batch(
            user_id, ts_ms, values, opened, gap_ms
        )

        state.update(opened)
        # flush the open session once the watermark passes end + gap; the
        # timestamp must sit beyond the current watermark or Spark rejects it
        state.setTimeoutTimestamp(
            max(opened[1] + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield pd.DataFrame(closed, columns=_COLS)

    return fn


def sessionize_with_state(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """events(user_id, ts, value) -> one row per closed session with a
    custom payload (n_events, value_sum) — applyInPandasWithState with
    EventTimeTimeout.  Output columns: user_id, session_start,
    session_end, n_events, value_sum.
    """
    sessions = (
        events.select("user_id", "ts", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_seconds * 1000),
            _OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    return sessions.select(
        "user_id",
        F.timestamp_millis("start_ms").alias("session_start"),
        F.timestamp_millis("end_ms").alias("session_end"),
        "n_events",
        (F.round(F.col("value_sum") * 100) / 100).alias("value_sum"),
    )


class _SessionProcessor(StatefulProcessor):
    """transformWithStateInPandas sessionizer — the Spark-4-native twin
    of ``_make_session_fn`` (same ``_fold_session_batch``, so the two
    APIs cannot drift semantically; parity asserted batch-for-batch in
    test_streaming_stateful.py).  State is ONE ValueState row per user
    (the open session); the event-time timer at ``end + gap`` flushes
    it exactly like the GroupState EventTimeTimeout."""

    def __init__(self, gap_ms: int):
        self._gap_ms = gap_ms

    def init(self, handle) -> None:
        self._handle = handle
        self._state = handle.getValueState("session", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        user_id = int(key[0])
        ts_ms, values = _batch_ts_values(rows)
        got = self._state.get() if self._state.exists() else None
        opened = tuple(got) if got is not None else None
        closed, opened = _fold_session_batch(
            user_id, ts_ms, values, opened, self._gap_ms
        )
        self._state.update(opened)
        # one live timer per key: re-arm at the new flush horizon
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        self._handle.registerTimer(
            max(
                opened[1] + self._gap_ms,
                timerValues.getCurrentWatermarkInMs() + 1,
            )
        )
        if closed:
            yield pd.DataFrame(closed, columns=_COLS)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        got = self._state.get() if self._state.exists() else None
        if got is None:
            return
        start_ms, end_ms, n, vsum = got
        self._state.clear()
        yield pd.DataFrame(
            [(int(key[0]), start_ms, end_ms, n, vsum)], columns=_COLS
        )

    def close(self) -> None:
        pass


def sessionize_transform_with_state(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """``sessionize_with_state`` on Spark 4's transformWithStateInPandas
    (StatefulProcessor + ValueState + event-time timers) — the
    successor API to applyInPandasWithState.  Identical output contract
    and semantics (the fold is literally shared); kept alongside the
    GroupState form so deployments can migrate API without a semantic
    audit.  Requires the RocksDB state store provider (Spark's
    transformWithState backend) — the wrapper sets it for the query via
    the session conf if unset.

    GATED like the Kafka/Cassandra connectors: transformWithState's
    Python runner speaks a protobuf state protocol, and this image has
    no ``google.protobuf`` (`pip install` is unavailable) — the runner
    crashes at query start with an opaque XXKST otherwise, so the
    wrapper raises the documented NotImplementedError up front.  The
    semantics carry zero gate risk: ``_fold_session_batch`` is the
    same code the fully-tested applyInPandasWithState operator runs,
    and test_streaming_stateful.py runs the full streaming parity
    whenever protobuf IS importable."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf python "
            "package for its state-server protocol (absent in this "
            "image); use sessionize_with_state (identical semantics, "
            "applyInPandasWithState API)"
        ) from e
    spark = events.sparkSession
    provider = "spark.sql.streaming.stateStore.providerClass"
    rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    if spark.conf.get(provider, "") != rocks:
        spark.conf.set(provider, rocks)
    sessions = (
        events.select("user_id", "ts", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_SessionProcessor(gap_seconds * 1000),
            outputStructType=_OUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
    return sessions.select(
        "user_id",
        F.timestamp_millis("start_ms").alias("session_start"),
        F.timestamp_millis("end_ms").alias("session_end"),
        "n_events",
        (F.round(F.col("value_sum") * 100) / 100).alias("value_sum"),
    )
