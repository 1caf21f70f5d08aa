"""Streaming crawl-frontier URL dedup (streaming/ingest.py::
dedup_urls_stream): canonical-identity admission within the horizon,
batch q112 equivalence on the admitted set, garbage policy."""

from __future__ import annotations

import datetime as dt

from golang_cassandra_kafka_feed_spark.streaming import dedup_urls_stream

_SCHEMA = "req_id long, url string, ts timestamp"
_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, src, tmp_path, name, **kwargs):
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = (
        dedup_urls_stream(stream, **kwargs)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}").collect()


def _t(s):
    return _T0 + dt.timedelta(seconds=s)


def test_spelling_variants_admit_once_within_and_across_batches(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    # batch 1: three spellings of ONE resource + one distinct URL
    _write_batch(
        spark,
        src,
        [
            (1, "https://Site.com/a?id=1&ref=r", _t(0)),
            (2, "HTTPS://site.COM:443/a/?ref=r&id=1", _t(1)),
            (3, "http://other.com/b", _t(2)),
        ],
    )
    # batch 2: a refetch with tracking junk + a genuinely new URL
    _write_batch(
        spark,
        src,
        [
            (4, "https://site.com/a?utm_c=9&id=1&ref=r#top", _t(3)),
            (5, "http://other.com/c", _t(4)),
        ],
    )
    rows = _run(spark, src, tmp_path, "urls1")
    admitted = {r.req_id for r in rows}
    assert admitted == {1, 3, 5}
    canon = {r.canonical_url for r in rows}
    assert canon == {
        "https://site.com/a?id=1&ref=r",
        "http://other.com/b",
        "http://other.com/c",
    }


def test_unparseable_urls_are_dropped_by_default(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(
        spark,
        src,
        [
            (1, "not a url", _t(0)),
            (2, "http://good.com/x", _t(1)),
            (3, "", _t(2)),
        ],
    )
    rows = _run(spark, src, tmp_path, "urls2")
    assert {r.req_id for r in rows} == {2}


def test_unparseable_passthrough_mode_never_dedups_garbage(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    _write_batch(
        spark,
        src,
        [
            (1, "not a url", _t(0)),
            (2, "not a url", _t(1)),
            (3, "http://good.com/x", _t(2)),
            (4, "http://good.com/x/", _t(3)),
        ],
    )
    rows = _run(
        spark, src, tmp_path, "urls3", drop_unparseable=False
    )
    # both garbage rows pass through (NULL is never a dedup key);
    # the two good spellings still collapse to one admission
    assert {r.req_id for r in rows} == {1, 2, 3}


def test_admitted_set_matches_batch_canonical_groups(spark, tmp_path):
    """Single-horizon equivalence with the batch rule: admitted
    canonical set == the distinct canonical set, and per canonical
    the admitted row is the first arrival."""
    from golang_cassandra_kafka_feed_spark.operators.urltools import (
        canonicalize_url,
    )
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    rows = [
        (i, f"http://s{i % 7}.com:{80 if i % 2 else 8080}/p{i % 7}"
            + ("/" if i % 3 == 0 else "")
            + f"?id={i % 7}" + ("&utm_x=1" if i % 5 == 0 else ""),
         _t(i))
        for i in range(40)
    ]
    _write_batch(spark, src, rows)
    got = _run(spark, src, tmp_path, "urls4")

    batch = spark.createDataFrame(rows, _SCHEMA).select(
        "req_id", "ts", canonicalize_url("url").alias("c")
    )
    want = {
        (r.c, r.req_id)
        for r in batch.groupBy("c")
        .agg(F.min(F.struct("ts", "req_id")).alias("first"))
        .select("c", F.col("first.req_id").alias("req_id"))
        .collect()
    }
    assert {(r.canonical_url, r.req_id) for r in got} == want
    assert len(got) < len(rows)


def test_blocklist_drops_banned_domains_before_state(spark, tmp_path):
    """Blocked URLs never reach the frontier (q120 dot-boundary
    semantics inside the stream): subdomains of a banned domain drop,
    the partial-label trap keeps, garbage policy unchanged."""
    src = str(tmp_path / "src_bl")
    _write_batch(
        spark,
        src,
        [
            (1, "https://ads.example.org/x", _t(0)),    # blocked (sub)
            (2, "https://example.org/y", _t(1)),        # blocked (exact)
            (3, "https://keep.example.com/z", _t(2)),   # kept
            (4, "https://xample.org/w", _t(3)),         # trap: kept
            (5, "not a url", _t(4)),                    # garbage: kept
        ],
    )
    rows = _run(
        spark,
        src,
        tmp_path,
        "frontier_blocklist",
        blocklist=("example.org",),
        drop_unparseable=False,
    )
    assert sorted(r.req_id for r in rows) == [3, 4, 5]


def test_banned_domain_with_unparseable_url_is_still_blocked(
    spark, tmp_path
):
    """The blocklist must see the RAW url: a banned host with a
    malformed port canonicalizes to NULL, and filtering on the
    canonical string would let it bypass the blocklist through the
    garbage branch (review-found)."""
    src = str(tmp_path / "src_bl_raw")
    _write_batch(
        spark,
        src,
        [
            (1, "https://ads.example.org:0x1/t", _t(0)),  # banned+garbage
            (2, "%%% not a url", _t(1)),                  # garbage only
            (3, "https://keep.com/a", _t(2)),             # kept
        ],
    )
    rows = _run(
        spark,
        src,
        tmp_path,
        "frontier_blocklist_raw",
        blocklist=("example.org",),
        drop_unparseable=False,
    )
    assert sorted(r.req_id for r in rows) == [2, 3]
