"""Streaming rollup maintenance (streaming/rollup.py): the continuous
aggregate equals the batch recompute after every micro-batch, survives
checkpoint restarts, and stays exactly-once through both crash windows
of the pointer-commit protocol."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.sources.fsutil import (
    path_exists,
    read_marker,
    write_marker,
)
from golang_cassandra_kafka_feed_spark.streaming.rollup import (
    read_rollup,
    rollup_foreach_batch,
    rollup_partials,
)

_SCHEMA = "event_id long, ts timestamp, event_type string, value double"
_T0 = dt.datetime(2024, 1, 1, 6, 0, 0)


def _rows(spark, rows):
    return spark.createDataFrame(
        [
            (i, _T0 + dt.timedelta(hours=h), t, v)
            for i, (h, t, v) in enumerate(rows)
        ],
        _SCHEMA,
    )


def _write_batch(spark, path, rows):
    _rows(spark, rows).coalesce(1).write.mode("append").parquet(path)


def _run(spark, src, path, ck):
    q = (
        spark.readStream.schema(_SCHEMA)
        .parquet(src)
        .writeStream.foreachBatch(rollup_foreach_batch(path))
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _expect(spark, src):
    return sorted(
        map(
            tuple,
            rollup_partials(spark.read.parquet(src)).collect(),
        )
    )


def _got(spark, path):
    return sorted(map(tuple, read_rollup(spark, path).collect()))


def test_rollup_equals_recompute_across_batches_and_restart(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    path = str(tmp_path / "roll")
    ck = str(tmp_path / "ck")
    _write_batch(
        spark, src, [(0, "view", 1.5), (1, "view", 2.0), (30, "buy", 9.9)]
    )
    _run(spark, src, path, ck)
    assert _got(spark, path) == _expect(spark, src)
    # second batch (same day + a new day), SAME checkpoint: incremental
    _write_batch(spark, src, [(2, "view", 0.5), (55, "buy", 1.0)])
    _run(spark, src, path, ck)
    assert _got(spark, path) == _expect(spark, src)


def test_post_commit_replay_is_skipped(spark, tmp_path):
    path = str(tmp_path / "roll2")
    fn = rollup_foreach_batch(path)
    b0 = _rows(spark, [(0, "view", 1.0), (26, "buy", 2.0)])
    fn(b0, 0)
    first = _got(spark, path)
    fn(b0, 0)  # replay after the pointer committed: must no-op
    assert _got(spark, path) == first


def test_pre_commit_crash_replay_redoes_from_pre_state(spark, tmp_path):
    """Crash window: v{b} written but _CURRENT not moved.  The replay
    must rebuild v{b} from the OLD pointer's state — no double count."""
    path = str(tmp_path / "roll3")
    fn = rollup_foreach_batch(path)
    fn(_rows(spark, [(0, "view", 1.0)]), 0)
    b1 = _rows(spark, [(1, "view", 3.0)])
    fn(b1, 1)
    done = _got(spark, path)
    # simulate the crash: rewind the pointer to v0 (the OLD pointer a
    # pre-commit crash leaves, full '{bid}:{run}' format), leaving the
    # orphaned v1 dir in place, then replay batch 1
    write_marker(spark, path + "/_CURRENT", "0:adhoc")
    assert path_exists(spark, path + "/v1")
    fn(b1, 1)
    assert read_marker(spark, path + "/_CURRENT") == "1:adhoc"
    assert _got(spark, path) == done


def test_mid_move_crash_recovers_pointer_from_version_dirs(
    spark, tmp_path
):
    """Crash window: the pointer truncate happened but the content
    write did not — _CURRENT exists EMPTY.  Resolution must recover
    current = the highest complete version dir (which already contains
    the batch the pointer was moving to), and a replay of that batch
    must skip — exactly-once preserved through the corruption."""
    path = str(tmp_path / "roll4")
    fn = rollup_foreach_batch(path)
    fn(_rows(spark, [(0, "view", 1.0)]), 0)
    b1 = _rows(spark, [(1, "buy", 3.0)])
    fn(b1, 1)
    done = _got(spark, path)
    write_marker(spark, path + "/_CURRENT", "")  # simulated mid-move
    assert _got(spark, path) == done  # reader recovers from dirs
    fn(b1, 1)  # replay: resolved current (1) >= batch_id -> skip
    assert _got(spark, path) == done


def test_truncated_pointer_with_valid_int_prefix_does_not_rewind(
    spark, tmp_path
):
    """Crash garble: a truncated pointer whose prefix still parses as
    an int ('1' surviving from e.g. '12:adhoc') must NOT resolve to
    the ancient version with the run guard skipped — that would merge
    the replay onto old state and overwrite newer complete versions, a
    silent rewind (review-found).  A pointer without a non-empty run
    suffix is garbled: resolution recovers from the version dirs."""
    path = str(tmp_path / "roll6")
    fn = rollup_foreach_batch(path)
    fn(_rows(spark, [(0, "view", 1.0)]), 0)
    fn(_rows(spark, [(1, "buy", 3.0)]), 1)
    b2 = _rows(spark, [(2, "view", 7.0)])
    fn(b2, 2)
    done = _got(spark, path)
    for garble in ("1", "1:", "0", "2"):
        write_marker(spark, path + "/_CURRENT", garble)
        assert _got(spark, path) == done  # recovered from dirs
        fn(b2, 2)  # replay: resolved current (2) >= batch_id -> skip
        assert _got(spark, path) == done


def test_stale_valid_format_pointer_distrusted(spark, tmp_path):
    """A well-formed pointer naming a version more than one behind the
    newest complete dir can only be corruption or an out-of-band
    rewind — versions are written before the pointer moves, so the
    legitimate lag is exactly one.  It must fall through to dir
    recovery, not silently merge onto ancient state."""
    path = str(tmp_path / "roll7")
    fn = rollup_foreach_batch(path)
    fn(_rows(spark, [(0, "view", 1.0)]), 0)
    fn(_rows(spark, [(1, "buy", 3.0)]), 1)
    b2 = _rows(spark, [(2, "view", 7.0)])
    fn(b2, 2)
    done = _got(spark, path)
    write_marker(spark, path + "/_CURRENT", "0:adhoc")
    assert _got(spark, path) == done  # recovered from dirs
    fn(b2, 2)
    assert _got(spark, path) == done


def test_unrelated_stream_does_not_flip_run_identity(spark, tmp_path):
    """An unrelated streaming query starting in the same session after
    the rollup's first commit must not change the rollup's run
    identity (review-found: the old single-active-stream inference
    flipped to 'adhoc' and hard-failed every subsequent batch)."""
    src = str(tmp_path / "src8")
    path = str(tmp_path / "roll8")
    ck = str(tmp_path / "ck8")
    _write_batch(spark, src, [(0, "view", 1.5), (30, "buy", 9.9)])
    _run(spark, src, path, ck)
    assert _got(spark, path) == _expect(spark, src)
    bystander = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "1")
        .load()
        .writeStream.format("noop")
        .option(
            "checkpointLocation", str(tmp_path / "ck8_bystander")
        )
        .start()
    )
    try:
        _write_batch(spark, src, [(1, "view", 0.5), (55, "buy", 1.0)])
        _run(spark, src, path, ck)  # same checkpoint, 2 streams active
        assert _got(spark, path) == _expect(spark, src)
    finally:
        bystander.stop()


def test_new_run_with_restarted_batch_ids_raises(spark, tmp_path):
    """A NEW checkpoint restarts batch ids at 0; the old monotone
    guard would silently drop that data — it must raise instead
    (review-found)."""
    import pytest

    from golang_cassandra_kafka_feed_spark.streaming.rollup import (
        RollupRunMismatch,
    )

    path = str(tmp_path / "roll5")
    fn_a = rollup_foreach_batch(path, run_id="run-a")
    fn_a(_rows(spark, [(0, "view", 1.0)]), 0)
    fn_b = rollup_foreach_batch(path, run_id="run-b")
    with pytest.raises(RollupRunMismatch):
        fn_b(_rows(spark, [(1, "buy", 2.0)]), 0)


def test_drain_or_raise_stops_and_raises_on_timeout():
    """awaitTermination(timeout) returning False means the stream is
    still mid-run; committing a completion marker then would cache a
    partial rollup forever (review-found r9).  The helper must stop
    the query and raise — and return silently on a real drain."""
    import pytest

    from golang_cassandra_kafka_feed_spark.streaming.rollup import (
        drain_or_raise,
    )

    class _Query:
        def __init__(self, drained):
            self.drained = drained
            self.stopped = False

        def awaitTermination(self, timeout):
            return self.drained

        def stop(self):
            self.stopped = True

    ok = _Query(True)
    drain_or_raise(ok, 1, "t")
    assert not ok.stopped

    hung = _Query(False)
    with pytest.raises(RuntimeError, match="did not drain"):
        drain_or_raise(hung, 1, "t")
    assert hung.stopped
