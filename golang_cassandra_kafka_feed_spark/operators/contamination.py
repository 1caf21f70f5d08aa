"""Cross-document span duplication, benchmark decontamination, and
cross-split leakage.

Three corpus-hygiene operators a training-data pipeline runs between
near-dup removal and packing (no reference twin — the reference's data
surface stops at feed queries; this extends BASELINE.json's
LLM-pipeline mandate):

- :func:`duplicate_ngram_spans` — span-level exact duplication in the
  style of Lee et al., "Deduplicating Training Data Makes Language
  Models Better" (arXiv:2107.06499): find word n-grams occurring in
  two or more distinct documents and report, per document, how much of
  it is covered by such cross-duplicated spans.  Whole-doc dedup
  (exact_dedup / minhash) misses boilerplate shared across otherwise
  distinct pages; this catches it at the n-gram granularity without a
  suffix array, which does not map to a shared-nothing cluster.
- :func:`benchmark_overlap` — eval-set decontamination in the style of
  the GPT-3 appendix (arXiv:2005.14165 §C): fraction of a training
  document's n-grams that appear anywhere in a benchmark corpus, plus
  a contaminated verdict at a threshold.
- :func:`cross_split_leakage` — the same concern applied to a
  pipeline's OWN splits: near-dup pairs straddling a split boundary,
  each with a repair decision under a protection order.

Scale shape (both): the n-gram extraction is the shared codegen'd
lookahead regex (`dedup._shingles`, one pass per doc); the only wide
operations are a groupBy on the gram and an equi join back on the gram.
Gram-stat rows are one per distinct gram, so the join-back has no
amplification; partial aggregation absorbs hot grams map-side.  The
benchmark side of :func:`benchmark_overlap` is DISTINCT n-grams of an
eval corpus — small by nature (thousands of docs, not billions) — and
is broadcast so the training corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.operators.dedup import _shingles

__all__ = [
    "duplicate_ngram_spans",
    "benchmark_overlap",
    "cross_split_leakage",
    "chunk_decontaminate",
]


def _r6(c: Column) -> Column:
    """Micro-unit rounding — portable across Spark/DuckDB float paths."""
    return F.round(c * 1000000) / 1000000


def _distinct_grams(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """One row per (doc, distinct n-gram): ``(id, g)``."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(_shingles(text_col, n))).alias("g"),
    )


def duplicate_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document coverage by n-grams shared with other documents.

    Returns one row per input document:

    ``(id_col, n_distinct_grams, n_dup_grams, dup_span_frac)``

    where ``n_dup_grams`` counts this document's distinct n-grams that
    occur in at least ``min_docs`` distinct documents corpus-wide and
    ``dup_span_frac`` is the micro-rounded ratio.  A high fraction with
    a low whole-doc similarity is the shared-boilerplate signature that
    motivates span-level dedup (Lee et al. 2021).

    Plan: the gram extraction runs ONCE — document frequency is a
    count window over the exploded (doc, gram) rows on the same
    pipeline (one shuffle on the gram), then one shuffle on the doc for
    the rollup.  The previous aggregate-then-join-back form referenced
    the _shingles regexp pipeline from two branches, and Catalyst
    re-ran the extraction per branch (the lambda-exprId ReuseExchange
    trap the pre-rewrite ngram_jaccard_pairs paid 3x for).  No collect.
    """
    grams = _distinct_grams(df, text_col, id_col, n)
    flagged = grams.withColumn(
        "df_docs", F.count("*").over(Window.partitionBy("g"))
    ).select(
        "id", (F.col("df_docs") >= min_docs).cast("long").alias("is_dup")
    )
    return flagged.groupBy("id").agg(
        F.count("*").alias("n_distinct_grams"),
        F.sum("is_dup").alias("n_dup_grams"),
        _r6(F.sum("is_dup") / F.count("*")).alias("dup_span_frac"),
    ).select(
        F.col("id").alias(id_col),
        "n_distinct_grams",
        "n_dup_grams",
        "dup_span_frac",
    )


def benchmark_overlap(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    threshold: float = 0.1,
) -> DataFrame:
    """Per-training-document n-gram overlap with a benchmark corpus.

    Returns one row per ``train`` document:

    ``(id_col, n_distinct_grams, n_bench_grams, overlap_frac,
    contaminated)``

    ``n_bench_grams`` counts the document's distinct n-grams that occur
    anywhere in ``bench``; ``contaminated`` is
    ``overlap_frac >= threshold`` (GPT-3-style decontamination keeps
    only clean documents; the caller anti-joins on this flag).

    Plan: the benchmark gram set is globally DISTINCT and broadcast —
    the 100 TB training side is scanned once and aggregated per doc
    with NO shuffle of the training grams against the benchmark (the
    membership probe is a broadcast left-semi-shaped join expressed as
    a left join + flag so non-matching grams still count).
    """
    tg = _distinct_grams(train, text_col, id_col, n)
    bg = (
        _distinct_grams(bench, text_col, id_col, n)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1).cast("long"))
    )
    probed = tg.join(F.broadcast(bg), "g", "left").select(
        "id", F.coalesce(F.col("hit"), F.lit(0)).alias("hit")
    )
    return probed.groupBy("id").agg(
        F.count("*").alias("n_distinct_grams"),
        F.sum("hit").alias("n_bench_grams"),
        _r6(F.sum("hit") / F.count("*")).alias("overlap_frac"),
        (
            F.sum("hit") / F.count("*")
            >= F.lit(threshold)
        ).alias("contaminated"),
    ).select(
        F.col("id").alias(id_col),
        "n_distinct_grams",
        "n_bench_grams",
        "overlap_frac",
        "contaminated",
    )


def cross_split_leakage(
    split_docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
    protect_order: tuple[str, ...] = ("test", "val", "train"),
) -> DataFrame:
    """Cross-split near-dup leakage audit + repair decision.

    A train document that near-duplicates an eval document leaks the
    benchmark into training — the within-corpus twin of
    ``benchmark_overlap``, applied across a split assignment instead
    of against an external benchmark.  ``split_docs`` carries
    (id_col, split_col); ``pairs`` is any verified near-dup pair
    frame (id_a, id_b, jaccard) — e.g. ngram_jaccard_pairs or the
    banded minhash family.

    Emits the LEAKY pairs (members in different splits) with the
    repair decision: ``drop_id`` is the member in the LESS-protected
    split under ``protect_order`` (default: test is sacred, then val,
    then train — repairing a train/val leak drops the train member so
    eval integrity survives with its sample intact).  Dropping every
    ``drop_id`` from its split makes the split assignment leak-free
    by construction for the detected pairs.

    Label semantics (explicit, not accidental): a label absent from
    ``protect_order`` ranks LESS protected than every listed one; two
    unlisted labels tie and the tie breaks deterministically on the
    GREATER id (documented arbitrariness beats silent positional
    bias).  Rows whose split is NULL are excluded from the audit —
    an unassigned doc has no boundary to leak across; assign first,
    then audit.  Ids pass through untouched (long, string, ... —
    whatever key space the pair frame uses).

    Scale shape: two hash joins of the pair frame against the
    (id, split) projection — pair frames are near-dup-sized (tiny
    next to the corpus), and the split projection is two columns, so
    neither join touches document text.
    """
    ranks = {label: i for i, label in enumerate(protect_order)}

    def _rank(c):
        expr = F.lit(len(protect_order))
        for label, r in ranks.items():
            expr = F.when(c == label, F.lit(r)).otherwise(expr)
        return expr

    s = split_docs.filter(F.col(split_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        F.col(split_col).alias("__split"),
    )
    joined = (
        pairs.join(
            s.select(
                F.col("__id").alias("id_a"),
                F.col("__split").alias("split_a"),
            ),
            "id_a",
        )
        .join(
            s.select(
                F.col("__id").alias("id_b"),
                F.col("__split").alias("split_b"),
            ),
            "id_b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
    )
    return joined.select(
        "id_a",
        "id_b",
        "jaccard",
        "split_a",
        "split_b",
        F.when(
            _rank(F.col("split_a")) > _rank(F.col("split_b")),
            F.col("id_a"),
        )
        .when(
            _rank(F.col("split_b")) > _rank(F.col("split_a")),
            F.col("id_b"),
        )
        .otherwise(F.greatest("id_a", "id_b"))
        .alias("drop_id"),
    )


def chunk_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 16,
    n: int = 8,
) -> DataFrame:
    """CHUNK-grain decontamination: ``benchmark_overlap``'s n-gram
    membership probe applied to the q67 training windows instead of
    whole documents.  One row per training chunk:

    ``(id_col, chunk_idx, n_chunk_grams, n_bench_grams, keep)``

    ``keep`` is strict — ANY benchmark n-gram in the chunk kills the
    chunk (the Lee et al. 2021 span-exactness stance), versus q63's
    whole-doc 10%-threshold verdict.  The policy difference is the
    point: doc-grain decontamination throws away every clean window of
    a long document that quotes one benchmark item; chunk-grain keeps
    them and drops only the quoting window — at trillion-token scale
    that is real data back.  Composite of two oracle-proven mechanisms
    (q67 chunking + q63 membership probe), isolating the policy — the
    q115/q124 composite-key idiom.

    Plan shape: chunking is a zero-shuffle explode (chunk_documents);
    the benchmark gram set is globally distinct and BROADCAST; per-chunk
    rollup is one groupBy on (doc, chunk) — at 100 TB the training side
    is scanned once and never shuffled against the benchmark.  Every
    chunk carries >= 1 shingle (_shingles' short-text fallback), so the
    rollup covers every chunk — no join-back needed.

    Reference tie: the validate-then-reject insert gate
    (cmd/server/httphandlers.go:33-37) at window grain — reject the
    window, not the author."""
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        _parallelize,
    )
    from golang_cassandra_kafka_feed_spark.operators.textstats import (
        chunk_documents,
    )

    chunks = chunk_documents(
        _parallelize(train),
        text_col=text_col,
        id_col=id_col,
        chunk_size=chunk_size,
        overlap=overlap,
    )
    grams = chunks.select(
        F.col(id_col).alias("id"),
        "chunk_idx",
        F.explode(F.array_distinct(_shingles("chunk_text", n))).alias("g"),
    )
    bg = (
        _distinct_grams(bench, text_col, id_col, n)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1).cast("long"))
    )
    probed = grams.join(F.broadcast(bg), "g", "left").select(
        "id", "chunk_idx", F.coalesce(F.col("hit"), F.lit(0)).alias("hit")
    )
    return (
        probed.groupBy("id", "chunk_idx")
        .agg(
            F.count("*").alias("n_chunk_grams"),
            F.sum("hit").alias("n_bench_grams"),
        )
        .select(
            F.col("id").alias(id_col),
            "chunk_idx",
            "n_chunk_grams",
            "n_bench_grams",
            (F.col("n_bench_grams") == 0).alias("keep"),
        )
    )
