"""Cross-job CAS: the filesystem table lease (feed/lock.py) and
FeedStore.create_users(exclusive=True) — the LWT twin (reference
internal/store/feed.go:41-74) without delta-spark."""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from golang_cassandra_kafka_feed_spark.feed import FeedStore
from golang_cassandra_kafka_feed_spark.feed.lock import (
    LockLost,
    LockTimeout,
    _lock_path,
    table_lock,
)


def test_lock_mutual_exclusion(tmp_path):
    """Two threads contending for the lease never overlap their critical
    sections."""
    base = str(tmp_path)
    in_critical = []
    overlaps = []

    def worker(i):
        with table_lock(base, "users", timeout_seconds=10):
            overlaps.append(len(in_critical) > 0)
            in_critical.append(i)
            time.sleep(0.05)
            in_critical.remove(i)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert overlaps == [False, False, False, False]
    assert not os.path.exists(_lock_path(base, "users"))


def test_lock_timeout(tmp_path):
    base = str(tmp_path)
    with table_lock(base, "users"):
        with pytest.raises(LockTimeout):
            with table_lock(base, "users", timeout_seconds=0.3):
                pass


def test_stale_lease_takeover(tmp_path):
    """A lock whose lease has expired (crashed holder) is broken and
    re-acquired; the crashed holder's release raises LockLost instead of
    deleting the new holder's lock."""
    base = str(tmp_path)
    cm = table_lock(base, "users", lease_seconds=0.1)
    cm.__enter__()  # simulated crashed/slow holder
    time.sleep(0.15)
    with table_lock(base, "users", timeout_seconds=5) as _:
        # the new holder owns the lock file now
        with open(_lock_path(base, "users")) as f:
            new_token = json.load(f)["token"]
        with pytest.raises(LockLost):
            cm.__exit__(None, None, None)
        # LockLost must NOT have removed the new holder's lock
        with open(_lock_path(base, "users")) as f:
            assert json.load(f)["token"] == new_token
    assert not os.path.exists(_lock_path(base, "users"))


def test_takeover_single_winner(tmp_path):
    """Many waiters racing to break one expired lease: exactly one
    acquires at a time (the rename-aside break cannot double-fire)."""
    base = str(tmp_path)
    cm = table_lock(base, "users", lease_seconds=0.05)
    cm.__enter__()
    time.sleep(0.1)
    holders = []
    lock = threading.Lock()

    def waiter():
        with table_lock(base, "users", timeout_seconds=10):
            with lock:
                holders.append(threading.get_ident())
                assert len(holders) == 1
                time.sleep(0.01)
                holders.pop()

    ts = [threading.Thread(target=waiter) for _ in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not os.path.exists(_lock_path(base, "users"))


def test_unparseable_stale_lock_is_taken_over(tmp_path):
    """A holder that crashed between the O_EXCL create and the metadata
    write leaves an empty lock file.  Waiters must not wait on it
    forever: once its mtime is older than the waiter's lease (the grace
    period), it is treated as abandoned (round-5 advice)."""
    base = str(tmp_path)
    path = _lock_path(base, "users")
    with open(path, "w"):
        pass  # empty: exactly what the crash window leaves behind
    old = time.time() - 3600
    os.utime(path, (old, old))
    with table_lock(base, "users", lease_seconds=1.0, timeout_seconds=5):
        with open(path) as f:
            assert json.load(f)["token"]  # a real lock replaced the husk
    assert not os.path.exists(path)


def test_unparseable_fresh_lock_is_waited_on(tmp_path):
    """An empty lock file with a FRESH mtime is a holder mid-write, not
    a crash — takeover must NOT fire inside the grace period."""
    base = str(tmp_path)
    path = _lock_path(base, "users")
    with open(path, "w"):
        pass
    with pytest.raises(LockTimeout):
        with table_lock(
            base, "users", lease_seconds=60, timeout_seconds=0.3
        ):
            pass
    # the mid-write husk must still be there, untouched
    assert os.path.exists(path) and os.path.getsize(path) == 0


def test_release_of_vanished_lock_raises_lock_lost(tmp_path):
    base = str(tmp_path)
    cm = table_lock(base, "users")
    cm.__enter__()
    os.unlink(_lock_path(base, "users"))  # external breakage
    with pytest.raises(LockLost):
        cm.__exit__(None, None, None)


def test_critical_section_error_not_masked_by_lock_lost(tmp_path):
    """If the critical section itself raised, a LockLost from the
    release must not REPLACE it (round-5 advice): the primary error
    propagates, the lost lease rides along as a note."""
    base = str(tmp_path)
    path = _lock_path(base, "users")
    with pytest.raises(ValueError, match="primary failure") as exc_info:
        with table_lock(base, "users", lease_seconds=0.05):
            time.sleep(0.1)
            # simulate a takeover while held
            os.unlink(path)
            with open(path, "w") as f:
                json.dump({"token": "someone-else"}, f)
            raise ValueError("primary failure")
    notes = getattr(exc_info.value, "__notes__", [])
    assert any("taken over" in n for n in notes)
    os.unlink(path)


def test_concurrent_create_users_one_winner_per_username(spark, tmp_path):
    """The property the reference's LWT guarantees (feed.go:46-59):
    overlapping concurrent batches with colliding usernames yield
    EXACTLY ONE (user_id, username) row per username."""
    store = FeedStore(spark, str(tmp_path / "store"))
    batches = [
        ["alice", "bob", "carol"],
        ["bob", "carol", "dave"],
        ["carol", "dave", "alice", "erin"],
        ["erin", "alice", "bob"],
    ]
    errs = []

    def job(names):
        try:
            df = spark.createDataFrame([(n,) for n in names], "username string")
            store.create_users(df, exclusive=True)
        except Exception as ex:  # pragma: no cover
            errs.append(ex)

    ts = [threading.Thread(target=job, args=(b,)) for b in batches]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    rows = store.table("users").collect()
    names = sorted(r.username for r in rows)
    assert names == ["alice", "bob", "carol", "dave", "erin"], names
    assert len({r.user_id for r in rows}) == 5


def test_concurrent_fanout_no_duplicate_feed_rows(spark, tmp_path):
    """Two concurrent batch jobs fanning out OVERLAPPING posts under
    exclusive=True never double-write a (user_id, post_id) feed row —
    the Cassandra-PK-upsert property (cql:36) across jobs."""
    import datetime as dt

    store = FeedStore(spark, str(tmp_path / "store2"), feed_buckets=4)
    store.create_follows(
        spark.createDataFrame(
            [(f"u{i}", "author") for i in range(5)],
            "user_id string, followee_id string",
        )
    )
    base = dt.datetime(2026, 1, 1)
    mk = lambda ids: spark.createDataFrame(  # noqa: E731
        [(f"p{i}", "author", f"body {i}", base) for i in ids],
        "post_id string, author_id string, body string, created_at timestamp",
    )
    batches = [mk(range(0, 6)), mk(range(3, 9))]  # posts 3-5 overlap
    errs = []

    def job(posts):
        try:
            store.fan_out(posts, exclusive=True)
        except Exception as ex:  # pragma: no cover
            errs.append(ex)

    ts = [threading.Thread(target=job, args=(b,)) for b in batches]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    feed = store.table("feed_by_user")
    total = feed.count()
    distinct = feed.select("user_id", "post_id").distinct().count()
    assert total == distinct == 5 * 9, (total, distinct)


def test_compact_serializes_against_exclusive_writers(spark, tmp_path):
    """compact() holds the table lease, so a concurrent
    fan_out(exclusive=True) append cannot land between compact's staging
    read and its directory swap (where the .old drop would silently
    discard it) — every appended row survives the rewrite."""
    import datetime as dt

    store = FeedStore(spark, str(tmp_path / "store3"), feed_buckets=4)
    store.create_follows(
        spark.createDataFrame(
            [(f"u{i}", "author") for i in range(3)],
            "user_id string, followee_id string",
        )
    )
    base = dt.datetime(2026, 1, 1)

    def posts(ids):
        return spark.createDataFrame(
            [(f"p{i}", "author", f"b{i}", base) for i in ids],
            "post_id string, author_id string, body string, "
            "created_at timestamp",
        )

    store.fan_out(posts(range(4)), exclusive=True)
    errs = []

    def writer():
        try:
            for lo in range(4, 20, 4):
                store.fan_out(posts(range(lo, lo + 4)), exclusive=True)
        except Exception as ex:  # pragma: no cover
            errs.append(ex)

    def compactor():
        try:
            for _ in range(3):
                store.compact("feed_by_user")
        except Exception as ex:  # pragma: no cover
            errs.append(ex)

    ts = [threading.Thread(target=writer), threading.Thread(target=compactor)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    feed = store.table("feed_by_user")
    assert feed.count() == 3 * 20
    assert feed.select("user_id", "post_id").distinct().count() == 3 * 20
