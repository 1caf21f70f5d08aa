"""End-to-end corpus curation: the operators of this package composed into
the standard training-data preparation pipeline.

    quality gate -> language gate -> diversity gate (optional) ->
    exact dedup -> near-dup removal (MinHash-LSH) -> per-source cap ->
    deterministic train/val/test split

Everything stays declarative DataFrame work: Catalyst sees the whole
pipeline as one plan, so filters merge into the scan, the dedup/cap
shuffles are the only exchanges, and the near-dup stage only pays for
LSH-bucket-collided pairs.  The output is reproducible end-to-end — every
stage is deterministic (hash-based split, tie-broken orderings, min-id
survivor rule), asserted in tests/test_curate.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.operators.dedup import (
    minhash_near_duplicates,
)
from golang_cassandra_kafka_feed_spark.operators.sampling import (
    hash_split,
    per_key_cap,
)
from golang_cassandra_kafka_feed_spark.operators.textstats import (
    alpha_ratio,
    lang_id,
    token_count,
)


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.6,
    langs: Sequence[str] | None = None,
    near_dup_threshold: float = 0.8,
    min_simpson: float | None = None,
    max_per_source: int | None = None,
    split_weights: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    chunk_size: int | None = None,
    chunk_overlap: int = 16,
    line_dedup_min_count: int | None = None,
    dsir_target: Column | None = None,
    dsir_keep: int | None = None,
    leak_threshold: float | None = None,
) -> DataFrame:
    """Returns the curated corpus: input columns + ``lang_detected``
    (named so it never shadows an input ``lang`` column), ``n_tokens``,
    and ``split``.

    With ``line_dedup_min_count`` set, a RefinedWeb/CCNet line-level
    dedup runs FIRST (before the quality gates, as RefinedWeb orders
    it): corpus-duplicated lines are stripped from every document, the
    text column is replaced by the surviving lines, and documents left
    empty are dropped — so boilerplate neither survives into training
    nor props up a document's token count through the quality gate.

    With ``dsir_target`` + ``dsir_keep`` set, a DSIR selection stage
    runs after dedup (select from the deduplicated pool, per the
    paper): documents are importance-weighted against the target
    predicate and ``dsir_keep`` are drawn weight-proportionally
    (operators/selection.py::dsir_resample), before the per-source cap
    and split.

    With ``leak_threshold`` set, a cross-split leakage repair runs
    AFTER the split (contamination.cross_split_leakage): near-dup
    pairs are re-detected at ``leak_threshold`` — typically LOWER than
    ``near_dup_threshold``, because eval-contamination standards are
    stricter than dedup (the 0.8-similar dup went to one split, but a
    0.5-similar paraphrase straddling train/test still leaks the
    benchmark) — and each leaky pair drops its less-protected member
    (test > val > train), so the emitted splits are leak-free by
    construction at that threshold (asserted in test_curate.py).

    With ``chunk_size`` set, a final doc→sample stage replaces each doc
    row by its overlapping token-window chunks (chunk_idx /
    n_chunk_tokens / chunk_text; the raw text column is dropped), with
    source/lang/split metadata carried THROUGH the zero-shuffle explode
    — chunking after split so all chunks of a doc land in the same
    split (no train/val leakage from shared overlap tokens).

    Near-dup survivor rule: duplicate GROUPS (connected components of
    the pair graph, operators/graph.py) keep exactly their min-id member
    — deterministic, transitive-safe (re-running the detector on the
    output finds no pair), and minimal (a chain a~b~c keeps a, dropping
    b and c; the old drop-greater-of-each-pair policy also dropped one
    of a pair's docs even when it was another pair's survivor).
    """
    if dsir_keep is not None and dsir_target is None:
        raise ValueError("dsir_keep requires dsir_target")
    if line_dedup_min_count is not None:
        from golang_cassandra_kafka_feed_spark.operators.dedup import (
            line_dedup,
        )

        ld = line_dedup(
            docs,
            text_col=text_col,
            id_col=id_col,
            min_count=line_dedup_min_count,
        )
        docs = docs.drop(text_col).join(
            ld.filter(F.col("n_kept") > 0).select(
                id_col, F.col("text_kept").alias(text_col)
            ),
            id_col,
        )
    d = docs.withColumn("n_tokens", token_count(text_col)).withColumn(
        "__alpha", alpha_ratio(text_col)
    )
    d = d.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("__alpha") >= min_alpha_ratio)
    ).drop("__alpha")
    d = d.withColumn("__lang", lang_id(text_col))
    if langs is not None:
        d = d.filter(F.col("__lang").isin(list(langs)))

    if min_simpson is not None:
        # Lexical-diversity gate (textstats.token_diversity): Simpson
        # diversity below the threshold means templated/repetitive text
        # (the Gopher-style repetition signal as a probability).  This
        # is a corpus-stat gate, not a row-local filter — it costs the
        # token_diversity aggregation plus a semi join, so it sits with
        # the other aggregation stages, after the cheap scan-merged
        # gates have shrunk the corpus.
        from golang_cassandra_kafka_feed_spark.operators.textstats import (
            token_diversity,
        )

        tdiv = token_diversity(d, text_col=text_col, id_col=id_col)
        keep = tdiv.filter(F.col("simpson") >= min_simpson).select(
            F.col("doc_id").alias(id_col)
        )
        d = d.join(keep, id_col, "left_semi")

    # exact dedup on normalized text, lowest id survives
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    d = (
        d.withColumn("__norm", norm)
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__norm").orderBy(id_col)
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__norm")
    )

    # near-dup removal: drop the greater id of every detected pair
    pairs = minhash_near_duplicates(
        d, text_col=text_col, id_col=id_col, threshold=near_dup_threshold
    )
    # Component-based survivors (operators/graph.py): label every doc in
    # the pair graph with its component's min id and keep only the
    # survivors.  Dropping "the greater id of each pair" is safe (no
    # remaining pair) but over-drops on chains a~b~c (b AND c go); the
    # component policy keeps exactly one doc per duplicate group — the
    # minimal transitive-safe drop set.
    from golang_cassandra_kafka_feed_spark.operators.graph import (
        duplicate_groups,
    )

    losers = (
        duplicate_groups(pairs, "id_a", "id_b")
        .filter(~F.col("is_survivor"))
        .select(F.col("id").alias(id_col))
    )
    d = d.join(losers, id_col, "left_anti")

    if dsir_keep is not None:
        from golang_cassandra_kafka_feed_spark.operators.selection import (
            dsir_resample,
        )

        keep_ids = dsir_resample(
            d, dsir_target, dsir_keep, text_col=text_col, id_col=id_col
        ).select(id_col)
        d = d.join(keep_ids, id_col, "left_semi")

    if max_per_source is not None:
        d = per_key_cap(
            d,
            [source_col],
            [F.desc("n_tokens"), F.asc(id_col)],
            max_per_source,
        )

    out = hash_split(d, id_col, weights=split_weights).withColumnRenamed(
        "__lang", "lang_detected"
    )
    if leak_threshold is not None:
        from golang_cassandra_kafka_feed_spark.operators.contamination import (
            cross_split_leakage,
        )

        # The leak stage references `out` from FOUR subtrees (pair
        # detection bands + shingle sets, the split projection, the
        # final anti-join base); separately-referenced HOF-bearing
        # subtrees never reuse exchanges, so without a materialization
        # the whole upstream pipeline (gates + dedup + components)
        # re-executes per reference (the multi-reference
        # localCheckpoint idiom — review-found, round 8).
        out = out.localCheckpoint(eager=True)
        leak_pairs = minhash_near_duplicates(
            out, text_col=text_col, id_col=id_col, threshold=leak_threshold
        )
        drops = (
            cross_split_leakage(
                out.select(id_col, "split"), leak_pairs, id_col=id_col
            )
            .select(F.col("drop_id").alias(id_col))
            .distinct()
        )
        out = out.join(drops, id_col, "left_anti")
    if chunk_size is not None:
        from golang_cassandra_kafka_feed_spark.operators.textstats import (
            chunk_documents,
        )

        carry = [
            c for c in out.columns if c not in (id_col, text_col)
        ]
        out = chunk_documents(
            out,
            text_col=text_col,
            id_col=id_col,
            chunk_size=chunk_size,
            overlap=chunk_overlap,
            carry_cols=carry,
        )
    return out
