"""Streaming near-dup admission (streaming/ingest.py): bit-identity of
the per-row banding with the batch pipeline, and admitted-set
equivalence with the batch bucket-min rule on a single-horizon corpus
fed in arrival order."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.operators.dedup import banded_rows
from golang_cassandra_kafka_feed_spark.streaming.ingest import (
    admitted_documents,
    near_dedup_band_stream,
    stream_banded_rows,
)

_SCHEMA = "doc_id long, text string, ts timestamp"


def _w(n):
    """Letterify a number: the shingle tokenizer keeps [a-z]+ runs
    only, so distinguishing tokens must differ in letters, not
    digits."""
    return "".join("abcdefghij"[int(c)] for c in str(n))


def _corpus(n=18, dup_every=3):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for i in range(n):
        fam = i - (i % dup_every)
        base = (
            f"streaming family {_w(fam)} shares its phrasing on topic "
            f"{_w(fam % 4)} across members with enough shingle mass "
            f"{_w(fam * 13)}"
        )
        text = base if i % dup_every == 0 else base + f" tail {_w(i)}"
        rows.append((i, text, t0 + dt.timedelta(seconds=i)))
    return rows


def test_stream_banding_is_bit_identical_to_batch(spark):
    df = spark.createDataFrame(_corpus(), _SCHEMA).select("doc_id", "text")
    streamed = {
        (r.doc_id, r.band, str(r.bucket))
        for r in stream_banded_rows(df).select(
            "doc_id", "band", "bucket"
        ).collect()
    }
    batch = {
        (int(r.id), r.band, r.bucket) for r in banded_rows(df).collect()
    }
    assert streamed == batch


def _batch_admitted_rule(df):
    """The batch twin: admitted iff the doc is the min-id member of
    EVERY one of its (band, bucket) groups — over ALL docs, admitted or
    not (state remembers every bucket seen)."""
    b = banded_rows(df)
    mins = b.groupBy("band", "bucket").agg(F.min("id").alias("mn"))
    return {
        r.id
        for r in b.join(mins, ["band", "bucket"])
        .groupBy("id")
        .agg(F.max((F.col("mn") < F.col("id")).cast("int")).alias("dom"))
        .filter("dom = 0")
        .collect()
    }


def test_admitted_set_equals_batch_bucket_min_rule(spark, tmp_path):
    """One document per micro-batch, in id order (strictly increasing
    file mtimes + maxFilesPerTrigger=1), single horizon: the streamed
    admitted set must equal the batch rule exactly."""
    rows = _corpus()
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for i, row in enumerate(rows):
        f = str(tmp_path / f"stage_{i}")
        spark.createDataFrame([row], _SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f)
        part = next(
            p for p in os.listdir(f) if p.endswith(".parquet")
        )
        dst = os.path.join(src, f"{i:05d}.parquet")
        os.rename(os.path.join(f, part), dst)
        # strictly increasing mtimes pin the file-source processing order
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    admitted = []

    def _sink(batch_df, _bid):
        admitted.extend(
            r.doc_id for r in admitted_documents(batch_df).collect()
        )

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        near_dedup_band_stream(stream)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    expected = _batch_admitted_rule(
        spark.createDataFrame(rows, _SCHEMA).select("doc_id", "text")
    )
    assert set(admitted) == expected
    assert len(admitted) == len(set(admitted))
    # the planted families guarantee real drops AND real admissions
    assert 0 < len(expected) < len(rows)
