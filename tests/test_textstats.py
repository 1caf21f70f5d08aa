"""Text-analytics operator tests (beyond the q31-q34 oracle parity):
winnowing guarantee, fingerprint normalization invariance, lang-id
determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.operators.textstats import (
    fingerprint,
    lang_id,
    winnowing_fingerprints,
)


def test_winnowing_identical_docs_share_all_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    fps = {r.doc_id: set(r.fingerprints) for r in
           winnowing_fingerprints(df).collect()}
    assert fps[1] == fps[2] and len(fps[1]) > 0


def test_winnowing_guarantee_on_shared_substring(spark):
    """Any shared substring of length >= k + window - 1 (= 8 chars
    normalized) must produce >= 1 common fingerprint."""
    shared = "commonsubstringblock"
    df = spark.createDataFrame(
        [(1, f"aaa unique prefix one {shared} tail alpha"),
         (2, f"zzz totally different start {shared} other end")],
        "doc_id long, text string",
    )
    fps = {r.doc_id: set(r.fingerprints) for r in
           winnowing_fingerprints(df).collect()}
    assert fps[1] & fps[2], "winnowing guarantee violated"


def test_winnowing_disjoint_docs_share_nothing(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz"), (2, "zyxop qrs tuvw abc")],
        "doc_id long, text string",
    )
    fps = {r.doc_id: set(r.fingerprints) for r in
           winnowing_fingerprints(df, k=6, window=3).collect()}
    # different char 6-gram sets -> overlap should be empty
    assert not (fps[1] & fps[2]) or len(fps[1] & fps[2]) < len(fps[1])


def test_fingerprint_ignores_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "helloworld"), (3, "other")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.fp for r in
            df.select("doc_id", fingerprint("text").alias("fp")).collect()}
    assert rows[1] == rows[2] != rows[3]


def test_lang_id_marker_argmax_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog"),       # en
         (2, "der hund und die katze"),    # de
         (3, "xxxx yyyy zzzz"),            # no markers
         (4, "the und")],                  # 1-1 tie -> en (fixed order)
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lp for r in
           df.select("doc_id", lang_id("text").alias("lp")).collect()}
    assert got == {1: "en", 2: "de", 3: "unknown", 4: "en"}


def test_bpe_tokens_pretokenizer_semantics(spark):
    from golang_cassandra_kafka_feed_spark.operators.textstats import (
        bpe_token_count,
        bpe_tokens,
        whitespace_token_count,
    )

    df = spark.createDataFrame(
        [(1, "Hello, world! 42 cats"), (2, "a.b"), (3, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.toks, r.n, r.nws)
        for r in df.select(
            "doc_id",
            bpe_tokens("text").alias("toks"),
            bpe_token_count("text").alias("n"),
            whitespace_token_count("text").alias("nws"),
        ).collect()
    }
    # letter runs, digit runs, punctuation runs; leading space attaches
    assert got[1] == (
        ["Hello", ",", " world", "!", " 42", " cats"], 6, 4,
    )
    assert got[2] == (["a", ".", "b"], 3, 1)
    assert got[3] == ([], 0, 0)


def test_repetition_stats_hand_computed(spark):
    from golang_cassandra_kafka_feed_spark.operators.textstats import (
        repetition_stats,
    )

    # "a b a b c": 2-grams = [a b, b a, a b, b c] -> n=4, distinct=3,
    # dup_frac=0.25, top multiplicity 2 (a b);
    # 3-grams = [a b a, b a b, a b c] -> all distinct, dup_frac=0
    df = spark.createDataFrame(
        [(1, "a b a b c")], "doc_id long, text string"
    )
    r = repetition_stats(df).collect()[0]
    assert r.n_2grams == 4
    assert r.dup_2gram_frac == 0.25
    assert r.top_2gram_n == 2
    assert r.dup_3gram_frac == 0.0


def test_chunk_documents_overlap_and_coverage(spark):
    from golang_cassandra_kafka_feed_spark.operators.textstats import (
        chunk_documents,
    )

    # letters-only words: the tokenizer splits on [^a-z]+, so a digit
    # suffix would re-tokenize every word back to the same token
    words = " ".join(
        "w" + chr(97 + i // 26) + chr(97 + i % 26) for i in range(150)
    )
    df = spark.createDataFrame(
        [(1, words), (2, "short doc"), (3, "")], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_size=64, overlap=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 150 tokens, stride 48 -> ceil(134/48) = 3 chunks
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_idx for r in c1] == [0, 1, 2]
    assert [r.n_chunk_tokens for r in c1] == [64, 64, 54]
    # consecutive chunks share exactly `overlap` tokens
    t0, t1 = c1[0].chunk_text.split(), c1[1].chunk_text.split()
    assert t0[-16:] == t1[:16]
    # every token position is covered
    covered = set(t0) | set(t1) | set(c1[2].chunk_text.split())
    assert len(covered) == 150
    # short and empty docs emit exactly one chunk
    assert [r.n_chunk_tokens for r in by_doc[2]] == [2]
    assert [r.n_chunk_tokens for r in by_doc[3]] == [0]
    assert by_doc[3][0].chunk_text == ""


def test_chunk_documents_rejects_bad_overlap(spark):
    from golang_cassandra_kafka_feed_spark.operators.textstats import (
        chunk_documents,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=16, overlap=16)


def test_vocab_coverage_known_answer(spark):
    from golang_cassandra_kafka_feed_spark.operators.textstats import (
        vocab_coverage,
    )

    df = spark.createDataFrame(
        [
            (1, "aa aa aa bb bb cc"),
            (2, "aa bb zz zz"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in vocab_coverage(df, vocab_size=2).collect()}
    # vocab = {aa (4), bb (3)}; zz (2) and cc (1) are OOV
    assert (out[1].n_tokens, out[1].n_oov) == (6, 1)
    assert (out[2].n_tokens, out[2].n_oov) == (4, 2)
    assert (out[3].n_tokens, out[3].n_oov, out[3].oov_rate) == (0, 0, 0.0)
    assert out[2].oov_rate == 0.5


def test_bigram_typicality_known_answer(spark):
    from golang_cassandra_kafka_feed_spark.operators.textstats import (
        bigram_typicality,
    )

    df = spark.createDataFrame(
        [
            (1, "the cat sat"),       # bigrams: "the cat", "cat sat"
            (2, "the cat ran"),       # bigrams: "the cat", "cat ran"
            (3, "zz qq"),             # bigram: "zz qq" (unique)
            (4, "single"),            # no bigram
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_typicality(df).collect()}
    # "the cat" occurs twice globally; "cat sat"/"cat ran" once each
    assert out[1].n_bigrams == 2 and out[1].mean_bigram_count == 1.5
    assert out[2].n_bigrams == 2 and out[2].mean_bigram_count == 1.5
    assert out[3].n_bigrams == 1 and out[3].mean_bigram_count == 1.0
    assert out[4].n_bigrams == 0 and out[4].mean_bigram_count == 0.0


def test_chunking_composes_with_sequence_packing(spark, sf_dir):
    """The doc→sample→batch pipeline: chunk_documents feeds
    sequence_pack, and every bin respects the token budget (except the
    mandatory single-oversize-chunk bins, which cannot exist here since
    chunk_size < budget)."""
    from pyspark.sql import functions as F

    from golang_cassandra_kafka_feed_spark.operators.sampling import (
        sequence_pack,
    )
    from golang_cassandra_kafka_feed_spark.operators.textstats import (
        chunk_documents,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    chunks = chunk_documents(docs, chunk_size=64, overlap=16)
    packed = sequence_pack(
        chunks.withColumn("__shard", F.pmod(F.col("doc_id"), F.lit(4))),
        ["__shard"],
        [F.asc("doc_id"), F.asc("chunk_idx")],
        "n_chunk_tokens",
        budget=256,
    )
    sizes = (
        packed.groupBy("__shard", "bin_id")
        .agg(F.sum("n_chunk_tokens").alias("total"))
        .collect()
    )
    assert len(sizes) > 1
    # greedy cumsum packing: a bin may exceed the budget only by the
    # final chunk that crossed it, i.e. total < budget + chunk_size
    assert all(r.total < 256 + 64 for r in sizes)


# ---------------------------------------------------------------------------
# typicality_buckets — CCNet-style head/middle/tail
# ---------------------------------------------------------------------------


def test_typicality_buckets_rank_repeated_text_as_head(spark):
    from golang_cassandra_kafka_feed_spark.operators.textstats import (
        typicality_buckets,
    )

    # Six docs, one language: three share the same bigrams (typical),
    # three are pairwise-disjoint word salads (atypical).
    rows = [
        (1, "the quick brown fox jumps", "en"),
        (2, "the quick brown fox sleeps", "en"),
        (3, "the quick brown fox eats", "en"),
        (4, "zebra xylophone quartz vortex", "en"),
        (5, "glacier nimbus oboe parsec", "en"),
        (6, "marmot keel dirge fathom", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in typicality_buckets(df).collect()}
    assert {out[d]["bucket"] for d in (1, 2, 3)} == {"head", "middle"}
    assert {out[d]["bucket"] for d in (4, 5, 6)} <= {"middle", "tail"}
    # Tertiles are balanced: 2 docs per bucket.
    from collections import Counter

    c = Counter(r["bucket"] for r in out.values())
    assert c == {"head": 2, "middle": 2, "tail": 2}


def test_typicality_buckets_partition_by_language(spark):
    from golang_cassandra_kafka_feed_spark.operators.textstats import (
        typicality_buckets,
    )

    rows = [(i, "shared common phrase here", "en") for i in range(3)] + [
        (10 + i, "frase comun compartida aqui", "es") for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = typicality_buckets(df).collect()
    for lang in ("en", "es"):
        labels = sorted(r["bucket"] for r in out if r["lang"] == lang)
        assert labels == ["head", "middle", "tail"]


def test_token_diversity_known_answer(spark):
    from golang_cassandra_kafka_feed_spark.operators.textstats import (
        token_diversity,
    )

    df = spark.createDataFrame(
        [
            (1, "a b a b c"),      # counts a:2 b:2 c:1
            (2, "x x x x"),        # single type, 4 tokens
            (3, "!!! 123"),        # no alpha tokens -> dropped
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in token_diversity(df).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    assert (r1.n_tokens, r1.n_types, r1.ttr) == (5, 3, 3 / 5)
    assert r1.hapax_ratio == 1 / 3
    assert r1.simpson == 1.0 - (4 + 4 + 1) / 25
    r2 = out[2]
    assert (r2.n_tokens, r2.n_types) == (4, 1)
    assert r2.hapax_ratio == 0.0 and r2.simpson == 0.0


def test_bm25_search_ranks_by_relevance(spark):
    from golang_cassandra_kafka_feed_spark.operators.textstats import (
        bm25_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),          # all three query terms
            (2, "apple banana banana plum"),     # two terms
            (3, "apple plum plum plum"),         # one (common) term
            (4, "plum fig grape kiwi melon"),    # zero terms
            (5, "apple apple apple apple"),      # common term, repeated
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(1, "apple banana cherry")], "query_id int, query_text string"
    )
    rows = bm25_search(docs, queries, k=10).collect()
    by_doc = {r.doc_id: r for r in rows}
    assert 4 not in by_doc, "doc with no query terms must not be retrieved"
    assert by_doc[1].rank == 1, "doc matching all terms (incl. rare) wins"
    assert by_doc[1].n_terms_matched == 3
    assert by_doc[2].score > by_doc[3].score
    # rank follows score desc with doc_id tiebreak
    ranked = sorted(rows, key=lambda r: r.rank)
    assert all(
        a.score > b.score or (a.score == b.score and a.doc_id < b.doc_id)
        for a, b in zip(ranked, ranked[1:])
    )


def test_bm25_shared_term_does_not_inflate_tf(spark):
    """Two queries sharing a term must not double-count tf: scoring a
    doc for query A is identical whether or not query B (sharing a
    term) is in the batch — regression for the pre-aggregation
    query_id fan-out bug."""
    from golang_cassandra_kafka_feed_spark.operators.textstats import (
        bm25_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry apple"),
            (2, "apple banana banana plum"),
            (3, "cherry plum plum apple"),
            (4, "fig grape kiwi melon"),
        ],
        "doc_id long, text string",
    )
    q_a = [(1, "apple banana")]
    q_b = [(2, "apple cherry")]  # shares "apple" with query 1
    solo = spark.createDataFrame(q_a, "query_id int, query_text string")
    both = spark.createDataFrame(
        q_a + q_b, "query_id int, query_text string"
    )
    solo_rows = {
        r.doc_id: r for r in bm25_search(docs, solo, k=10).collect()
    }
    both_rows = {
        r.doc_id: r
        for r in bm25_search(docs, both, k=10).collect()
        if r.query_id == 1
    }
    assert set(solo_rows) == set(both_rows)
    for doc_id, r in solo_rows.items():
        b = both_rows[doc_id]
        assert (r.score, r.rank, r.n_terms_matched) == (
            b.score,
            b.rank,
            b.n_terms_matched,
        ), f"doc {doc_id} scored differently with a co-batched query"


def test_collocations_lift_ranks_exclusive_pairs_first(spark):
    from golang_cassandra_kafka_feed_spark.operators.textstats import (
        collocations,
    )

    # "strong tea" appears 3x and its words appear nowhere else (lift =
    # N*3/(3*3)); "of the" appears 3x but both words are everywhere.
    docs = spark.createDataFrame(
        [
            (1, "strong tea of the day of the men strong tea"),
            (2, "strong tea of the rest the of men"),
        ],
        "doc_id long, text string",
    )
    rows = collocations(docs, min_count=3, k=5).collect()
    pairs = [(r.w1, r.w2) for r in rows]
    assert pairs[0] == ("strong", "tea")
    st = rows[0]
    n_tokens = 10 + 8
    assert st.c_bg == 3 and st.c1 == 3 and st.c2 == 3
    assert st.lift == round(3 * n_tokens / (3 * 3) * 1e6) / 1e6
    if ("of", "the") in pairs:
        assert pairs.index(("of", "the")) > 0


def test_ngram_novelty_first_writer_wins(spark):
    from golang_cassandra_kafka_feed_spark.operators.textstats import (
        ngram_novelty,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),   # bigrams: 'alpha beta','beta gamma'
            (2, "alpha beta gamma"),   # exact copy: zero novel
            (3, "alpha beta delta"),   # shares 'alpha beta' only
            (4, "solo"),               # < 2 tokens: no grams
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in ngram_novelty(docs).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert (out[1].n_distinct_grams, out[1].n_novel) == (2, 2)
    assert out[1].novelty == 1.0
    assert (out[2].n_distinct_grams, out[2].n_novel) == (2, 0)
    assert out[2].novelty == 0.0
    assert (out[3].n_distinct_grams, out[3].n_novel) == (2, 1)
    assert out[3].novelty == 0.5
    assert (out[4].n_distinct_grams, out[4].n_novel, out[4].novelty) == (
        0, 0, 0.0,
    )
