"""Streaming corpus ingest: content-level dedup at admission time.

The batch dedup family (operators/dedup.py) assumes the corpus is
already on disk; a training-data pipeline also needs the INGEST-side
guard — the same document arriving twice from an at-least-once source
(re-crawl, broker redelivery, backfill overlap) must be admitted once.
This is the content-hash twin of ``deduped_post_stream``'s key-level
guard (streaming/fanout.py), composed from built-ins: Spark's
``dropDuplicatesWithinWatermark`` keeps its state in the checkpointed
state store, bounded by the watermark horizon, not the stream length —
exactly what a custom applyInPandasWithState dedup would rebuild, so
we don't.

Semantics and their batch relationship:
- admission keeps the FIRST-ARRIVED document per content hash within
  the horizon (offset order under replay, deterministic from a
  checkpoint).  Batch ``exact_dedup`` keeps the MIN-ID representative;
  the admitted hash SET is identical when all duplicates arrive within
  one horizon, which tests assert.
- a duplicate arriving LATER than the horizon after its original is
  re-admitted (state for the hash has been reclaimed).  That is the
  documented cost of bounded state at 100 TB: size the horizon to the
  redelivery window (hours), and let the periodic batch
  ``exact_dedup`` sweep own cross-horizon duplicates — the standard
  lambda split.
- the hash is ``md5`` of the raw text (one JVM expression, no Python
  in the stream).  128 bits, not xxhash64: at billions of documents a
  64-bit birthday collision is EXPECTED (~50% by ~5B distinct docs)
  and would silently drop a distinct document forever; at 128 bits the
  same risk needs ~2^64 documents.  Pass ``normalize=True`` to
  collapse case/whitespace first, the near-miss-tolerant admission
  used by line-level dedup (same normalization shape as textstats
  tokens).

Reference tie: the reference's only dedup is key-level PK idempotency
(internal/store/feed.go:46-59, cql:36); content-level admission is
part of the LLM-data-pipeline extension surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_documents_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    normalize: bool = False,
) -> DataFrame:
    """First-seen-only document stream, deduped on content hash.

    Input: a streaming DataFrame with at least (``text_col``,
    ``ts_col``).  Output: the input rows minus later same-content
    arrivals within the watermark horizon, original columns preserved.

    Scale shape: one shuffle on the 128-bit content hash (the dedup
    state is hash-partitioned); state per distinct document is one
    32-char store entry that the watermark reclaims.  The hash column
    is dropped from the output but computed scan-side, so column
    pruning still reaches the source for everything else.
    """
    h = F.col(text_col)
    if normalize:
        h = F.trim(F.regexp_replace(F.lower(h), r"\s+", " "))
    hashed = docs.withColumn("__content_hash", F.md5(h))
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__content_hash"])
        .drop("__content_hash")
    )
