"""Curation pipeline: determinism, gate monotonicity, and the no-near-dup
invariant of the composed corpus-preparation flow (operators/curate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.operators.curate import curate_corpus
from golang_cassandra_kafka_feed_spark.operators.dedup import (
    minhash_near_duplicates,
)
from golang_cassandra_kafka_feed_spark.sources.testdata import load_table


def _curate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return curate_corpus(
        docs, min_tokens=3, near_dup_threshold=0.8, max_per_source=200
    )


def test_curate_deterministic_and_monotone(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out1 = _curate(spark, sf_dir)
    rows1 = {(r.doc_id, r.split) for r in out1.select("doc_id", "split").collect()}
    rows2 = {
        (r.doc_id, r.split)
        for r in _curate(spark, sf_dir).select("doc_id", "split").collect()
    }
    assert rows1 == rows2  # end-to-end reproducible
    assert 0 < len(rows1) <= docs.count()
    # output carries the annotation columns
    assert {"n_tokens", "split", "lang_detected"} <= set(out1.columns)


def test_curate_no_near_dups_survive(spark, sf_dir):
    out = _curate(spark, sf_dir)
    remaining = minhash_near_duplicates(
        out, text_col="text", id_col="doc_id", threshold=0.8
    )
    assert remaining.count() == 0


def test_curate_respects_source_cap_and_split_labels(spark, sf_dir):
    out = _curate(spark, sf_dir)
    per_source = out.groupBy("source").count().collect()
    assert all(r["count"] <= 200 for r in per_source)
    labels = {r.split for r in out.select("split").distinct().collect()}
    assert labels <= {"train", "val", "test"}


def test_curate_with_chunking_stage(spark, sf_dir):
    from golang_cassandra_kafka_feed_spark.operators.curate import (
        curate_corpus,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = curate_corpus(docs, chunk_size=32, chunk_overlap=8)
    rows = out.collect()
    assert len(rows) > 0
    assert {"chunk_idx", "n_chunk_tokens", "chunk_text", "split",
            "lang_detected", "source"} <= set(out.columns)
    assert "text" not in out.columns
    # all chunks of one doc share its split (no leakage across splits)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_doc.values())
    # chunk size respected
    assert all(r.n_chunk_tokens <= 32 for r in rows)


def test_curate_line_dedup_stage_strips_boilerplate_first(spark):
    """RefinedWeb ordering: line dedup runs BEFORE the quality gates, so
    boilerplate lines neither survive nor pad a doc past min_tokens."""
    from golang_cassandra_kafka_feed_spark.operators.curate import (
        curate_corpus,
    )

    banner = "accept all cookies to continue reading this site"
    rows = [
        (1, banner + "\nthe first real article body with many fine words", "s1"),
        (2, banner + "\nthe second real article body with many fine words", "s1"),
        (3, banner + "\nthe third real article body with many fine words", "s2"),
        # doc 4 is ONLY boilerplate: line dedup must empty and drop it
        (4, banner, "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate_corpus(
        docs,
        min_tokens=3,
        near_dup_threshold=0.95,
        line_dedup_min_count=2,
    )
    kept = {r["doc_id"]: r for r in out.collect()}
    assert 4 not in kept
    for d in (1, 2, 3):
        assert d in kept
        assert "cookies" not in kept[d]["text"]
        assert "article body" in kept[d]["text"]


def test_curate_dsir_stage_selects_target_like_docs(spark):
    from golang_cassandra_kafka_feed_spark.operators.curate import (
        curate_corpus,
    )
    from pyspark.sql import functions as F

    # letters-only per-doc tags: digit-bearing tags re-tokenize into the
    # same word and the docs would collapse as near-dups before DSIR runs
    rows = []
    for i in range(20):
        tag = chr(97 + i) * 3
        rows.append((i, f"the quick brown fox {tag} jumps very high", "wiki"))
    for i in range(20, 40):
        tag = chr(97 + i - 20) * 4
        rows.append((i, f"goat cheese wheel dairy {tag} farm pasture barn", "web"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate_corpus(
        docs,
        min_tokens=3,
        near_dup_threshold=0.99,
        dsir_target=F.col("source") == "wiki",
        dsir_keep=10,
    )
    kept = [r["doc_id"] for r in out.collect()]
    assert len(kept) == 10
    assert sum(1 for d in kept if d < 20) >= 8


def test_curate_dsir_keep_requires_target(spark):
    import pytest as _pytest

    from golang_cassandra_kafka_feed_spark.operators.curate import (
        curate_corpus,
    )

    docs = spark.createDataFrame(
        [(1, "some text here", "s")], "doc_id long, text string, source string"
    )
    with _pytest.raises(ValueError, match="dsir_target"):
        curate_corpus(docs, dsir_keep=5)


def test_curate_diversity_gate_drops_repetitive_docs(spark):
    from golang_cassandra_kafka_feed_spark.operators.curate import (
        curate_corpus,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy sleeping dog", "a"),
            (2, "spam spam spam spam spam spam spam spam spam spam", "a"),
        ],
        "doc_id long, text string, source string",
    )
    out = curate_corpus(docs, min_tokens=5, min_alpha_ratio=0.0, min_simpson=0.5)
    ids = {r.doc_id for r in out.collect()}
    assert 1 in ids and 2 not in ids
    # without the gate both survive
    out2 = curate_corpus(docs, min_tokens=5, min_alpha_ratio=0.0)
    assert {r.doc_id for r in out2.collect()} == {1, 2}


def test_curate_leak_repair_makes_splits_leak_free(spark):
    """With leak_threshold set (LOWER than near_dup_threshold — eval
    contamination standards are stricter than dedup), the emitted
    splits carry ZERO cross-split near-dup pairs at that threshold,
    and the repair drops exactly the less-protected members the audit
    names (test > val > train).  Planted corpus: paraphrase families
    ~0.55 Jaccard — similar enough to leak at 0.4, distinct enough to
    both survive dedup at 0.8."""
    from golang_cassandra_kafka_feed_spark.operators.contamination import (
        cross_split_leakage,
    )

    def _w(n):
        return "".join("abcdefghij"[int(c)] for c in str(n))

    rows = []
    for fam in range(40):
        base = (
            f"shared news event {_w(fam)} reported with an identical lead "
            "paragraph whose tokens run alpha beta gamma delta epsilon "
            "zeta eta theta iota kappa before the rewrites diverge "
            f"{_w(fam * 13)}"
        )
        rows.append(
            (2 * fam, base + f" first tail unique closing words {_w(fam * 3 + 1)} end", "a")
        )
        rows.append(
            (2 * fam + 1, base + f" second rewrite different ending here {_w(fam * 7 + 2)} fin", "b")
        )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )

    base_out = curate_corpus(docs, min_tokens=3, near_dup_threshold=0.8)
    repaired = curate_corpus(
        docs, min_tokens=3, near_dup_threshold=0.8, leak_threshold=0.4
    )

    # post-repair audit at the SAME threshold finds nothing
    audit_pairs = minhash_near_duplicates(
        repaired, text_col="text", id_col="doc_id", threshold=0.4
    )
    leaks = cross_split_leakage(
        repaired.select("doc_id", "split"), audit_pairs
    )
    assert leaks.count() == 0

    # the repair is a pure subset of the unrepaired output, dropping
    # exactly the members the pre-repair audit names
    base_rows = {
        (r.doc_id, r.split)
        for r in base_out.select("doc_id", "split").collect()
    }
    rep_rows = {
        (r.doc_id, r.split)
        for r in repaired.select("doc_id", "split").collect()
    }
    assert rep_rows <= base_rows
    dropped = {d for d, _ in base_rows - rep_rows}
    assert dropped, "planted paraphrase families must straddle splits"
    pre_pairs = minhash_near_duplicates(
        base_out, text_col="text", id_col="doc_id", threshold=0.4
    )
    pre_leaks = cross_split_leakage(
        base_out.select("doc_id", "split"), pre_pairs
    ).collect()
    assert {r.drop_id for r in pre_leaks} == dropped
    # and the families DID survive dedup (the leak stage, not the
    # dedup stage, is what separated them)
    assert len(base_rows) == len(rows)
