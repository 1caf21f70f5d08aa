"""Streaming content-dedup at ingest (streaming/ingest.py): first-seen
admission per content hash, state bounded by the watermark, batch
exact_dedup equivalence on the admitted hash set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.streaming import (
    dedup_documents_stream,
)

_SCHEMA = "doc_id long, text string, ts timestamp"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, src, tmp_path, name, **kwargs):
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = (
        dedup_documents_stream(stream, **kwargs)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_duplicates_admitted_once_within_and_across_batches(
    spark, tmp_path
):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    src = str(tmp_path / "src")
    # batch 1: 'aaa' twice (in-batch dup), 'bbb' once
    _write_batch(
        spark,
        src,
        [
            (1, "aaa", t0),
            (2, "aaa", t0 + dt.timedelta(seconds=1)),
            (3, "bbb", t0 + dt.timedelta(seconds=2)),
        ],
    )
    # batch 2 (same availableNow run reads both files): 'bbb' again
    # (cross-file dup), 'ccc' new
    _write_batch(
        spark,
        src,
        [
            (4, "bbb", t0 + dt.timedelta(seconds=3)),
            (5, "ccc", t0 + dt.timedelta(seconds=4)),
        ],
    )
    out = _run(spark, src, tmp_path, "ingest_once")
    texts = sorted(r.text for r in out)
    assert texts == ["aaa", "bbb", "ccc"]
    # original columns preserved, hash column dropped
    assert set(out[0].asDict()) == {"doc_id", "text", "ts"}


def test_admitted_hash_set_matches_batch_exact_dedup(spark, tmp_path):
    """When every duplicate arrives within one horizon, the admitted
    CONTENT SET equals batch exact_dedup's (representatives may differ:
    first-arrived vs min-id)."""
    import datetime as dt

    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        exact_dedup,
    )
    from golang_cassandra_kafka_feed_spark.sources.testdata import (
        load_table,
    )

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .limit(200)
    )
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (r.doc_id, r.text, t0 + dt.timedelta(seconds=int(r.doc_id)))
        for r in docs.collect()
    ]
    src = str(tmp_path / "src")
    _write_batch(spark, src, rows)
    out = _run(spark, src, tmp_path, "ingest_equiv")
    stream_set = {r.text for r in out}
    batch_set = {
        r.text for r in exact_dedup(docs.sparkSession.createDataFrame(
            [(i, t) for i, t, _ in rows], "doc_id long, text string"
        )).collect()
    }
    assert stream_set == batch_set
    assert len(out) == len(stream_set)  # exactly one row per content


def test_normalize_collapses_case_and_whitespace(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "src")
    _write_batch(
        spark,
        src,
        [
            (1, "Hello  World", t0),
            (2, "hello world", t0 + dt.timedelta(seconds=1)),
            (3, " HELLO WORLD ", t0 + dt.timedelta(seconds=2)),
        ],
    )
    out_norm = _run(
        spark, src, tmp_path, "ingest_norm", normalize=True
    )
    assert len(out_norm) == 1
    out_raw = _run(spark, src, tmp_path, "ingest_raw", normalize=False)
    assert len(out_raw) == 3


def test_checkpoint_resume_does_not_readmit(spark, tmp_path):
    """A second availableNow run over NEW files with old content:
    the state store carries the seen hashes across restarts (within
    the horizon).  File sink — the memory sink cannot recover from a
    checkpoint."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck_ingest_resume")

    def run_once():
        stream = spark.readStream.schema(_SCHEMA).parquet(src)
        q = (
            dedup_documents_stream(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(sink).collect()

    _write_batch(spark, src, [(1, "aaa", t0)])
    out1 = run_once()
    assert [r.text for r in out1] == ["aaa"]
    # new file, duplicate content, still within the 1h horizon
    _write_batch(
        spark, src, [(2, "aaa", t0 + dt.timedelta(minutes=5))]
    )
    out2 = run_once()
    assert [r.text for r in out2] == ["aaa"]  # nothing new admitted
    assert [r.doc_id for r in out2] == [1]
