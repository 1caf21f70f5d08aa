"""Incremental corpus ingestion: dedup new batches against STORED state
instead of recomputing over the whole corpus.

At 100 TB you cannot re-run global dedup per arriving batch; the standard
architecture keeps two compact side tables next to the corpus —

- ``fingerprints``: one xxhash64 per accepted doc's normalized text
  (exact-dup identity),
- ``minhash_bands``: (band, bucket) keys of every accepted doc's LSH
  signature (near-dup candidate index),

so ingesting a batch costs: hash/signature build over the BATCH only, an
anti-join against ``fingerprints`` (broadcast- or shuffle-sized by the
batch), a bucket-equi-join against ``minhash_bands`` restricted to the
batch's buckets, and exact-Jaccard verification only for collided pairs.
Existing docs always win; within a batch the lower id wins — the same
CAS/first-wins rule as the feed store's create_users (feed.go:41-74),
applied to documents.

This is the FeedStore pattern (feed/api.py) for the corpus: parquet-backed
state, idempotent appends, anti-join idempotency.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from golang_cassandra_kafka_feed_spark.operators.dedup import (
    _shingles,
    minhash_signatures,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

FINGERPRINT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("fp", T.LongType(), False),
    ]
)

BANDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("bucket", T.LongType(), False),
        # physical partition column: the stored band index is laid out in
        # pmod(bucket, N) directories, and the candidate join includes this
        # key — at 100 TB a batch touching a subset of mods reads only
        # those partitions (dynamic partition pruning), instead of the
        # whole index
        T.StructField("bucket_mod", T.IntegerType(), True),
    ]
)

_BUCKET_MODS = 32

_EMPTY = {
    "docs": DOC_SCHEMA,
    "fingerprints": FINGERPRINT_SCHEMA,
    "minhash_bands": BANDS_SCHEMA,
}


def _norm_text(col: str) -> Column:
    return F.trim(F.regexp_replace(F.lower(F.col(col)), r"\s+", " "))


class CorpusStore:
    """Parquet-backed corpus with incremental exact + near dedup."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        num_hashes: int = 64,
        bands: int = 16,
        shingle_size: int = 3,
        jaccard_threshold: float = 0.8,
    ):
        assert num_hashes % bands == 0
        self.spark = spark
        self.base = base_dir
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self.shingle_size = shingle_size
        self.jaccard_threshold = jaccard_threshold

    # -- table plumbing (FeedStore pattern) --------------------------------

    def _path(self, table: str) -> str:
        return os.path.join(self.base, table)

    def table(self, name: str) -> DataFrame:
        from golang_cassandra_kafka_feed_spark.sources.fsutil import (
            path_exists,
        )

        path = self._path(name)
        # URI-aware probe: os.path.exists would read every HDFS/S3 state
        # table as absent and silently break replay idempotency
        if not path_exists(self.spark, path):
            return self.spark.createDataFrame([], _EMPTY[name])
        return self.spark.read.schema(_EMPTY[name]).parquet(path)

    def _append(self, df: DataFrame, name: str) -> None:
        df.write.mode("append").parquet(self._path(name))

    # -- signature builders (batch-only cost) ------------------------------

    def _band_rows(self, docs: DataFrame) -> DataFrame:
        sigs = minhash_signatures(
            docs,
            text_col="text",
            id_col="doc_id",
            num_hashes=self.num_hashes,
            shingle_size=self.shingle_size,
        )
        r = self.rows_per_band
        return (
            sigs.select(
                "id",
                F.posexplode(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(self.bands - 1)),
                        lambda b: F.xxhash64(
                            F.slice("sig", b * r + 1, r), b
                        ),
                    )
                ).alias("band", "bucket"),
            )
            .select(
                F.col("id").alias("doc_id"),
                F.col("band").cast("int").alias("band"),
                "bucket",
                F.pmod(F.col("bucket"), F.lit(_BUCKET_MODS))
                .cast("int")
                .alias("bucket_mod"),
            )
        )

    # -- ingest ------------------------------------------------------------

    def ingest(self, new_docs: DataFrame) -> dict[str, int]:
        """Accept the subset of ``new_docs`` that is neither an exact nor a
        near duplicate of the stored corpus (or of an earlier-id doc in the
        same batch).  Returns stage counts.  Idempotent: re-ingesting an
        already-accepted batch accepts nothing (every doc is its own exact
        duplicate in the fingerprint table).
        """
        batch = new_docs.select(*[f.name for f in DOC_SCHEMA.fields])
        n_in = batch.count()

        # 1. exact dedup: batch-internal first-wins, then anti-join state
        fp = batch.withColumn("fp", F.xxhash64(_norm_text("text")))
        w = Window.partitionBy("fp").orderBy("doc_id")
        fp = (
            fp.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        fp = fp.join(
            self.table("fingerprints").select("fp"), "fp", "left_anti"
        )
        fp = fp.localCheckpoint(eager=True)  # cut lineage before state writes
        n_exact = fp.count()

        # 2. near-dup vs STORE: batch band rows joined to the stored band
        #    index — only same-bucket candidates are verified
        bands = self._band_rows(fp).localCheckpoint(eager=True)
        cand_store = (
            bands.alias("b")
            .join(
                self.table("minhash_bands").alias("s"),
                ["bucket_mod", "band", "bucket"],
            )
            .select(
                F.col("b.doc_id").alias("new_id"),
                F.col("s.doc_id").alias("old_id"),
            )
            .distinct()
        )
        # 3. near-dup within the batch: lower id wins
        cand_batch = (
            bands.alias("x")
            .join(
                bands.alias("y"),
                ["band", "bucket"],
            )
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(
                F.col("y.doc_id").alias("new_id"),
                F.col("x.doc_id").alias("old_id"),
            )
            .distinct()
        )

        def _verified_losers(cands: DataFrame, old_docs: DataFrame) -> DataFrame:
            sh = F.array_distinct(_shingles("text", self.shingle_size))
            new_sets = fp.select(
                F.col("doc_id").alias("new_id"), sh.alias("sh_new")
            )
            old_sets = old_docs.select(
                F.col("doc_id").alias("old_id"), sh.alias("sh_old")
            )
            return (
                cands.join(new_sets, "new_id")
                .join(old_sets, "old_id")
                .withColumn(
                    "j",
                    F.size(F.array_intersect("sh_new", "sh_old"))
                    / F.size(F.array_union("sh_new", "sh_old")),
                )
                .filter(F.col("j") >= self.jaccard_threshold)
                .select("new_id")
                .distinct()
            )

        losers = _verified_losers(cand_store, self.table("docs")).union(
            _verified_losers(cand_batch, fp)
        ).distinct()
        accepted = fp.join(
            losers.withColumnRenamed("new_id", "doc_id"), "doc_id", "left_anti"
        ).localCheckpoint(eager=True)
        n_accepted = accepted.count()

        # 4. commit: docs + both state tables (restricted to accepted ids)
        self._append(
            accepted.select(*[f.name for f in DOC_SCHEMA.fields]), "docs"
        )
        self._append(accepted.select("doc_id", "fp"), "fingerprints")
        (
            bands.join(accepted.select("doc_id"), "doc_id", "left_semi")
            .write.mode("append")
            .partitionBy("bucket_mod")
            .parquet(self._path("minhash_bands"))
        )
        return {
            "n_in": n_in,
            "n_after_exact": n_exact,
            "n_accepted": n_accepted,
        }


def run_corpus_ingest_pipeline(
    docs_stream: DataFrame,
    store: CorpusStore,
    checkpoint_dir: str,
):
    """Streaming corpus ingestion: each micro-batch of documents is
    deduped against the store's accumulated state and committed — the
    fan-out pipeline pattern (streaming/fanout.py) applied to corpus
    building.  Checkpointing makes delivery at-least-once; ``ingest`` is
    idempotent on replay (re-delivered docs are exact dups of stored
    fingerprints), so the corpus is effectively-once."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        store.ingest(batch_df)

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
