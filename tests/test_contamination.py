"""Hand-computed contracts for the span-duplication / decontamination
operators (operators/contamination.py) and tf-idf top terms."""

from golang_cassandra_kafka_feed_spark.operators.contamination import (
    benchmark_overlap,
    duplicate_ngram_spans,
)
from golang_cassandra_kafka_feed_spark.operators.textstats import (
    tfidf_top_terms,
)


def test_duplicate_ngram_spans_hand_computed(spark):
    # distinct 2-grams: d1 {a b, b c}, d2 {b c, c d}, d3 {x y};
    # only "b c" crosses documents.
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d"), (3, "x y")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in duplicate_ngram_spans(df, n=2, min_docs=2).collect()
    }
    assert (got[1].n_distinct_grams, got[1].n_dup_grams) == (2, 1)
    assert got[1].dup_span_frac == 0.5
    assert (got[2].n_distinct_grams, got[2].n_dup_grams) == (2, 1)
    assert (got[3].n_distinct_grams, got[3].n_dup_grams) == (1, 0)
    assert got[3].dup_span_frac == 0.0


def test_duplicate_ngram_spans_short_doc_uses_fulltext_gram(spark):
    # Documents below n words contribute their full text as the single
    # gram (the _shingles fallback), so two identical short docs count
    # as fully duplicated spans.
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"), (3, "other words here")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in duplicate_ngram_spans(df, n=8, min_docs=2).collect()
    }
    assert got[1].dup_span_frac == 1.0
    assert got[2].dup_span_frac == 1.0
    assert got[3].dup_span_frac == 0.0


def test_benchmark_overlap_hand_computed(spark):
    train = spark.createDataFrame(
        [(1, "a b c"), (2, "p q r")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100, "b c z b")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r
        for r in benchmark_overlap(
            train, bench, n=2, threshold=0.5
        ).collect()
    }
    # d1 grams {a b, b c}; bench grams {b c, c z, z b} -> 1 hit of 2.
    assert (got[1].n_bench_grams, got[1].overlap_frac) == (1, 0.5)
    assert got[1].contaminated is True
    assert (got[2].n_bench_grams, got[2].overlap_frac) == (0, 0.0)
    assert got[2].contaminated is False


def test_tfidf_top_terms_hand_computed(spark):
    # N=2; idf(df=1) = (4-2+1)/3 = 1.0, idf(df=2) = (4-4+1)/5 = 0.2.
    df = spark.createDataFrame(
        [(1, "x x y"), (2, "y z")], "doc_id long, text string"
    )
    rows = tfidf_top_terms(df, k=2).collect()
    got = {(r.doc_id, r.rank): r for r in rows}
    assert (got[(1, 1)].term, got[(1, 1)].score) == ("x", 2.0)
    assert (got[(1, 2)].term, got[(1, 2)].score) == ("y", 0.2)
    assert (got[(2, 1)].term, got[(2, 1)].score) == ("z", 1.0)
    assert (got[(2, 2)].term, got[(2, 2)].score) == ("y", 0.2)
    assert got[(1, 1)].df_docs == 1 and got[(1, 2)].df_docs == 2


def test_tfidf_tie_breaks_on_term(spark):
    # Same tf and df for every term -> identical scores; ranking must
    # fall back to the term string deterministically.
    df = spark.createDataFrame(
        [(1, "bb aa cc")], "doc_id long, text string"
    )
    rows = tfidf_top_terms(df, k=3).orderBy("rank").collect()
    assert [r.term for r in rows] == ["aa", "bb", "cc"]


def test_cross_split_leakage_policy(spark):
    """Hand-built pairs + splits: only cross-split pairs emit, and the
    drop falls on the LESS-protected member (test > val > train)."""
    from golang_cassandra_kafka_feed_spark.operators.contamination import (
        cross_split_leakage,
    )

    splits = spark.createDataFrame(
        [
            (1, "train"), (2, "val"), (3, "test"),
            (4, "train"), (5, "train"), (6, "test"),
        ],
        "doc_id long, split string",
    )
    pairs = spark.createDataFrame(
        [
            (1, 2, 0.9),   # train-val leak -> drop train member 1
            (2, 3, 0.8),   # val-test leak  -> drop val member 2
            (1, 6, 0.7),   # train-test leak -> drop train member 1
            (4, 5, 0.95),  # train-train: NOT a leak
        ],
        "id_a long, id_b long, jaccard double",
    )
    rows = {
        (r.id_a, r.id_b): r
        for r in cross_split_leakage(splits, pairs).collect()
    }
    assert set(rows) == {(1, 2), (2, 3), (1, 6)}
    assert rows[(1, 2)].drop_id == 1
    assert rows[(2, 3)].drop_id == 2
    assert rows[(1, 6)].drop_id == 1
    assert rows[(1, 2)].split_a == "train" and rows[(1, 2)].split_b == "val"


def test_cross_split_leakage_generic_ids_and_labels(spark):
    """The generic-API contract the shipped q115 path never exercises:
    string ids pass through untouched, NULL splits are excluded,
    unlisted labels rank less protected than listed ones, and an
    unlisted-unlisted tie breaks on the greater id."""
    from golang_cassandra_kafka_feed_spark.operators.contamination import (
        cross_split_leakage,
    )

    splits = spark.createDataFrame(
        [
            ("u1", "test"), ("u2", "calib"), ("u3", "calib"),
            ("u4", "holdout"), ("u5", None), ("u6", "train"),
        ],
        "doc_id string, split string",
    )
    pairs = spark.createDataFrame(
        [
            ("u1", "u2", 0.9),  # listed vs unlisted -> drop unlisted u2
            ("u2", "u4", 0.8),  # unlisted tie -> drop greater id u4
            ("u5", "u6", 0.7),  # NULL split -> excluded entirely
        ],
        "id_a string, id_b string, jaccard double",
    )
    rows = {
        (r.id_a, r.id_b): r
        for r in cross_split_leakage(splits, pairs).collect()
    }
    assert set(rows) == {("u1", "u2"), ("u2", "u4")}
    assert rows[("u1", "u2")].drop_id == "u2"
    assert rows[("u2", "u4")].drop_id == "u4"


def test_chunk_decontaminate_keeps_clean_windows_of_quoting_doc(spark):
    """The policy grain q130 exists to prove: a long training document
    that quotes ONE benchmark item loses only the quoting window —
    doc-grain q63 at the same strictness would lose the whole doc."""
    from golang_cassandra_kafka_feed_spark.operators.contamination import (
        benchmark_overlap,
        chunk_decontaminate,
    )

    bench_text = "alpha bravo charlie delta echo foxtrot golf hotel"
    filler = " ".join(f"tok{i}" for i in range(40))   # 40 unique tokens
    quoting = filler + " " + bench_text + " " + " ".join(
        f"pad{i}" for i in range(40)
    )
    train = spark.createDataFrame(
        [(1, quoting), (2, "clean text only " * 10)],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, bench_text)], "doc_id bigint, text string"
    )
    out = chunk_decontaminate(
        train, bench, chunk_size=16, overlap=0, n=8
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: some windows dropped (the quote spans tokens 40-47), but
    # NOT all — the clean windows survive
    keeps1 = [r.keep for r in by_doc[1]]
    assert any(keeps1) and not all(keeps1)
    dropped = [r for r in by_doc[1] if not r.keep]
    assert all(r.n_bench_grams > 0 for r in dropped)
    # doc 2 untouched
    assert all(r.keep for r in by_doc[2])
    # contrast: strict doc-grain would kill doc 1 entirely
    doc_grain = {
        r.doc_id: r
        for r in benchmark_overlap(train, bench, n=8, threshold=1e-9)
        .collect()
    }
    assert doc_grain[1].contaminated and not doc_grain[2].contaminated
