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


def dedup_urls_stream(
    urls: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    drop_unparseable: bool = True,
    blocklist: tuple[str, ...] | list[str] | None = None,
) -> DataFrame:
    """Crawl-frontier admission: canonicalize each URL
    (operators/urltools.py — case, default ports, trailing slashes,
    utm_* params, fragments) and admit only the FIRST spelling of each
    canonical identity within the watermark horizon.  The frontier
    twin of ``dedup_documents_stream``: same one-stateful-op shape
    (``dropDuplicatesWithinWatermark`` on the canonical string), same
    bounded-state story (one entry per distinct canonical URL in the
    horizon), same lambda split (a periodic batch q112-style sweep
    owns cross-horizon refetches).

    Unparseable URLs canonicalize to NULL; by default they are DROPPED
    (a frontier must not fetch garbage), with ``drop_unparseable=
    False`` they pass through UNDEDUPED (NULL is never a dedup key —
    two broken strings are not the same resource).  Output keeps the
    input columns plus ``canonical_url``.

    ``blocklist`` (optional, a bounded curated sequence of domain
    entries) drops banned-domain URLs BEFORE canonicalization and the
    stateful dedup — the order matters twice: a blocklisted domain
    must not be able to bloat the frontier's state store, and the
    filter must see the RAW url, because a banned URL that fails
    canonicalization (malformed port on a banned host) would otherwise
    bypass the blocklist through the NULL branch (review-found).  The
    filter itself is a stateless per-row projection
    (urltools.blocklist_filter_urls, the q120 dot-boundary semantics)
    over the raw URL's host — including the scheme-less host-candidate
    fallback, so a banned host spelled without a scheme cannot ride
    the garbage branch past the blocklist (review-found) — and adds
    zero state and zero shuffle to the streaming plan.
    """
    from golang_cassandra_kafka_feed_spark.operators.urltools import (
        blocklist_filter_urls,
        canonicalize_url,
    )

    src = urls
    if blocklist:
        src = blocklist_filter_urls(src, blocklist, url_col=url_col)
    canon = src.withColumn("canonical_url", canonicalize_url(url_col))
    parseable = canon.filter(F.col("canonical_url").isNotNull())
    admitted = (
        parseable.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["canonical_url"])
    )
    if drop_unparseable:
        return admitted
    return admitted.unionByName(
        canon.filter(F.col("canonical_url").isNull())
    )


def near_dedup_band_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """Streaming NEAR-dup admission, phase 1: first-seen-only LSH band
    rows within the watermark horizon.

    Each document is signatured IN-STREAM — a pure per-row projection
    (nested higher-order functions, zero Python, no aggregation: a
    streaming-legal twin of operators/dedup.banded_rows, bit-identical
    bucket values) — then exploded into its ``bands`` (band, bucket)
    rows and run through ``dropDuplicatesWithinWatermark`` on the
    bucket key: the SAME single-stateful-op admission the exact-content
    guard above uses, at near-dup granularity.  A later document
    sharing a bucket with ANY earlier-arrived document (admitted or
    not — state remembers every bucket seen in the horizon, exactly
    like the batch family's bucket-min rule) loses that row.

    Output: the surviving band rows, original columns preserved plus
    (band, bucket).  A document's rows always land in the SAME
    micro-batch (explode of one input row), so doc-level admission is a
    stateless per-batch decision — compose with ``admitted_documents``
    in ``foreachBatch``.  Cross-horizon near-dups belong to the batch
    family (the same lambda split documented for the exact guard).

    GRANULARITY CONTRACT: admission is exact for documents arriving in
    DIFFERENT micro-batches (the tested ordered-feed equivalence).
    Within one micro-batch the per-bucket winner is arbitrary (state
    updates race across partitions), so a novel near-dup family
    arriving entirely inside one batch can split its bucket wins among
    members and end up partially or even wholly unadmitted — a data
    LOSS mode, not just duplicate leakage.  Size micro-batches small
    relative to the novelty rate (``maxOffsetsPerTrigger`` /
    ``maxFilesPerTrigger``), or use the deterministic batch-granular
    admission ``operators/corpus_store.py::CorpusStore.ingest`` (min-id
    wins within each batch by construction) when per-batch volumes are
    large; this operator is the low-latency state-store variant of that
    pattern.

    Scale shape: one shuffle of bands x docs rows on the bucket key;
    state is one entry per distinct bucket seen in the horizon,
    reclaimed by the watermark.  Per-row CPU is the honest minhash cost
    (num_hashes x shingles hashes); the shingle array is bound ONCE per
    row via the one-element-array lambda trick, so CollapseProject
    cannot re-inline the shingle construction into all 64 seed lambdas
    (the batch pipeline's measured 50x trap).
    """
    banded = stream_banded_rows(
        docs, text_col, num_hashes, bands, shingle_size
    )
    return (
        banded.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["band", "bucket"])
    )


def stream_banded_rows(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """Per-ROW LSH banding — a streaming-legal (aggregation-free) twin
    of operators/dedup.banded_rows's xxhash path, bit-identical bucket
    values (asserted in tests/test_streaming_neardup.py).  Works on
    batch frames too; the batch pipeline keeps the explode+groupBy form
    because map-side combine beats per-row HOF loops when the corpus is
    large and shuffles anyway."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into "
            f"bands ({bands})"
        )
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        _shingles,
    )

    r = num_hashes // bands
    sh_arr = F.array_distinct(_shingles(text_col, shingle_size))

    def _buckets(sh):
        def _band_bucket(b):
            sig_slice = F.transform(
                F.sequence(b * r, (b + 1) * r - 1),
                lambda s: F.array_min(
                    F.transform(sh, lambda x: F.xxhash64(x, s))
                ),
            )
            return F.xxhash64(sig_slice, b.cast("int"))

        return F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)), _band_bucket
        )

    # one-element-array let-binding: sh_arr is evaluated once per row
    return docs.withColumn(
        "__bb", F.transform(F.array(sh_arr), _buckets)[0]
    ).select(
        "*", F.posexplode("__bb").alias("band", "bucket")
    ).drop("__bb")


def admitted_documents(
    band_survivors: DataFrame, bands: int = 16
) -> DataFrame:
    """Phase 2 (stateless, per micro-batch inside ``foreachBatch``):
    a document is ADMITTED iff all ``bands`` of its band rows survived
    phase 1 — i.e. it shares no bucket with any earlier-arrived
    document in the horizon.  Batch-equivalence (asserted in
    tests/test_streaming_neardup.py): the admitted set equals the
    batch rule "doc_id == min(doc_id) in every one of its (band,
    bucket) groups" over a single-horizon corpus fed in id order."""
    keep = [c for c in band_survivors.columns if c not in ("band", "bucket")]
    return (
        band_survivors.groupBy(*[F.col(c) for c in keep])
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") == bands)
        .drop("__n")
    )
