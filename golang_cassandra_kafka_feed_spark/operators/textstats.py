"""Text analytics for training-data curation — all built-in functions
(JVM-side, codegen'd; no UDFs), so every helper here is also expressible
as ANSI SQL for the DuckDB oracle (plans/queries q31-q34).

- tokens / token counting (whitespace + non-alpha splitting)
- quality scoring (length, alpha ratio, stopword ratio, mean token length)
- language ID (stopword-marker heuristic over a fixed marker table)
- document fingerprinting (md5 of alpha-normalized text; rolling-hash
  shingle fingerprints live in dedup.minhash_signatures)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Deterministic marker sets: a tiny, fixed per-language stopword inventory.
# (Heuristic quality is data-dependent; determinism is the contract here.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "with"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "les", "et"],
    "es": ["el", "los", "las", "y"],
}
_STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def tokens(col: str | Column) -> Column:
    """Lowercased alpha tokens (the Q29 tokenizer)."""
    return F.filter(
        F.split(F.lower(col), "[^a-z]+"), lambda t: F.length(t) > 0
    )


def _marker_count(col: str | Column, words: list[str]) -> Column:
    """Count tokens equal to any marker word via ONE codegen'd regex pass:
    a token is a maximal [a-z]+ run of the lowered text, so a marker
    occurrence bounded by non-letters (lookarounds) is exactly a matching
    token.  Value-identical to filtering the token array with
    array_contains, but that runs as an interpreted higher-order function
    per token per marker set — measured 17x superlinear drag on the sf1.0
    scale probe.  (Lookbehind is Java-regex-only — fine, the DuckDB
    oracle keeps its list_filter formulation.)"""
    pat = "(?<![a-z])(?:" + "|".join(words) + ")(?![a-z])"
    return F.regexp_count(F.lower(col), F.lit(pat))


def token_count(col: str | Column) -> Column:
    # regexp_count of letter runs == size(filter(split(...))) — one
    # codegen'd pass instead of split + interpreted HOF filter.
    return F.regexp_count(F.lower(col), F.lit("[a-z]+")).cast("long")


# GPT-2-style pre-tokenizer, simplified to be lookahead-free so the SAME
# pattern runs on the DuckDB (RE2) oracle: a token is an optional leading
# space followed by a letter run, a digit run, or a punctuation run.
BPE_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def bpe_tokens(col: str | Column) -> Column:
    """BPE-ish pre-tokenization (the unit a byte-pair encoder would merge
    within).  Group 0 extraction: the alternation has no capture groups."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)


def bpe_token_count(col: str | Column) -> Column:
    return F.size(bpe_tokens(col)).cast("long")


def whitespace_token_count(col: str | Column) -> Column:
    """Plain whitespace-split token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.filter(F.split(c, r"\s+"), lambda t: F.length(t) > 0)
    ).cast("long")


def alpha_ratio(col: str | Column) -> Column:
    """Fraction of characters that are ascii letters or space — a
    boilerplate/garbage signal."""
    return F.length(F.regexp_replace(col, "[^A-Za-z ]", "")) / F.length(col)


def stopword_ratio(col: str | Column) -> Column:
    n_stop = _marker_count(col, _STOPWORDS)
    return n_stop / F.greatest(token_count(col), F.lit(1))


def mean_token_len(col: str | Column) -> Column:
    # sum of token lengths == total count of letter characters.
    total = F.length(F.regexp_replace(F.lower(col), "[^a-z]", ""))
    return total / F.greatest(token_count(col), F.lit(1))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the quality-score feature columns (rounded via the portable
    cents idiom for oracle parity)."""
    r2 = lambda c: F.round(c * 100) / 100  # noqa: E731
    return df.withColumns(
        {
            "n_tokens": token_count(text_col),
            "alpha_ratio": r2(alpha_ratio(text_col)),
            "stopword_ratio": r2(stopword_ratio(text_col)),
            "mean_token_len": r2(mean_token_len(text_col)),
        }
    )


def token_diversity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document lexical-diversity profile with NO transcendental
    functions: type-token ratio, hapax fraction, and Simpson diversity
    ``1 - sum((cnt/n)^2)`` (the probability two random tokens differ —
    the log-free stand-in for Shannon entropy, same reason
    `bigram_typicality` avoids log: cross-engine log2 ulps drift, exact
    integer ratios do not).  Low diversity = templated/repetitive text;
    the Gopher-style quality-filter companion to `repetition_stats`.

    Shape: explode tokens -> (doc, token) count -> per-doc aggregate.
    Both aggregations are map-side-combinable; the token exchange is the
    only shuffle and is keyed on (doc_id, tok) so hot vocabulary words
    do not skew (unlike a token-global groupBy).  Docs with zero alpha
    tokens drop out (explode of an empty array), mirrored by the
    oracle's unnest.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("tok")
    )
    counts = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("cnt"))
    return counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("__sum_sq"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_types",
        (F.col("n_types") / F.col("n_tokens")).alias("ttr"),
        (F.col("n_hapax") / F.col("n_types")).alias("hapax_ratio"),
        (
            F.lit(1.0)
            - F.col("__sum_sq") / (F.col("n_tokens") * F.col("n_tokens"))
        ).alias("simpson"),
    )


def lang_id(col: str | Column) -> Column:
    """Deterministic marker-count argmax with fixed tie-break order
    (en > de > fr > es > unknown); a real system would use a trained
    n-gram model — the *shape* (pure column expression, one pass) is the
    scalable part."""
    counts = {
        lang: _marker_count(col, ws) for lang, ws in LANG_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    out = F.lit("unknown")
    # reversed() so earlier languages win ties via later .when overwrite
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when(
            (counts[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(out)
    return out


def fingerprint(col: str | Column) -> Column:
    """Content fingerprint: md5 of the lowercased alpha-only normalization
    (whitespace/punct-insensitive exact dedup key)."""
    return F.md5(F.regexp_replace(F.lower(col), "[^a-z]", ""))


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    hasher: str = "xxhash",
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme): hash every char
    k-gram of the normalized text, slide a window of ``window`` hashes,
    keep each window's minimum; the distinct minima are the fingerprint
    set.  Guarantee: any shared substring of length >= k + window - 1
    between two documents shares >= 1 fingerprint.

    Returns (id_col, fingerprints array<bigint>).  Built as *staged*
    projections — the normalized text and the gram-hash array are each
    referenced more than once downstream, which stops CollapseProject from
    re-inlining them (a single nested expression would recompute the
    regexp normalization per gram: O(n^2) per document).  Hashing is
    ``hasher="xxhash"`` (default, fast JVM path) or ``hasher="md5"`` (the
    32-bit md5-prefix hash a DuckDB oracle reproduces bit-for-bit) on the
    positioned gram — same selectivity as the classic polynomial rolling
    update at the same O(n) gram count, minus the sequential carry that
    SQL can't express.
    """
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        _parallelize,
    )

    gram_hash = (
        f"cast(conv(substring(md5(substring(__norm, i, {k})), 1, 8), 16, 10)"
        " as bigint)"
        if hasher == "md5"
        else f"xxhash64(substring(__norm, i, {k}))"
    )
    norm = _parallelize(df).select(
        id_col,
        F.regexp_replace(F.lower(text_col), "[^a-z]", "").alias("__norm"),
    )
    grams = norm.select(
        id_col,
        F.expr(
            f"transform(sequence(1, greatest(length(__norm) - {k - 1}, 1)), "
            f"i -> {gram_hash})"
        ).alias("__gh"),
    )
    return grams.select(
        id_col,
        F.expr(
            f"array_distinct(transform("
            f"sequence(1, greatest(size(__gh) - {window - 1}, 1)), "
            f"w -> array_min(slice(__gh, w, {window}))))"
        ).alias("fingerprints"),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition metrics per document: duplicate word
    n-gram fractions (n=2,3) and the peak 2-gram multiplicity — the
    repeated-boilerplate signals a training-data quality filter cuts on
    (the reference has no quality surface; this extends BASELINE.json's
    LLM-pipeline mandate alongside quality_features).

    Scale shape: the n-gram extraction is the codegen'd lookahead regex
    shared with the dedup family (one pass per n), then ONE shuffle per n
    on (doc, gram) with map-side partial counts; the per-doc rollup
    reuses that partitioning.  All outputs are integers or portable
    micro-rounded ratios, so a DuckDB oracle reproduces them exactly.
    """
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        _parallelize,
        _shingles,
    )

    r6 = lambda c: F.round(c * 1000000) / 1000000  # noqa: E731

    # r11: widen once; both n-gram branches read the same deterministic
    # repartition exchange (ReuseExchange-eligible), so the one-split
    # local source no longer serializes two regex passes on one task
    pre = _parallelize(df.select(F.col(id_col), F.col(text_col)))

    def _per_n(n: int, prefix: str) -> DataFrame:
        grams = pre.select(
            F.col(id_col).alias("id"),
            F.explode(_shingles(text_col, n)).alias("g"),
        )
        per_gram = grams.groupBy("id", "g").agg(F.count("*").alias("c"))
        return per_gram.groupBy("id").agg(
            F.sum("c").cast("long").alias(f"n_{prefix}grams"),
            F.count("*").cast("long").alias(f"d_{prefix}grams"),
            F.max("c").cast("long").alias(f"top_{prefix}gram_n"),
        )

    g2, g3 = _per_n(2, "2"), _per_n(3, "3")
    return (
        g2.join(g3, "id")
        .select(
            F.col("id").alias(id_col),
            "n_2grams",
            r6(
                (F.col("n_2grams") - F.col("d_2grams")) / F.col("n_2grams")
            ).alias("dup_2gram_frac"),
            "top_2gram_n",
            r6(
                (F.col("n_3grams") - F.col("d_3grams")) / F.col("n_3grams")
            ).alias("dup_3gram_frac"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf.

    The idf is the BM25 rational form ``(2N - 2df + 1) / (2df + 1)``
    (Robertson-Spärck Jones without the log): it preserves the idf
    ordering exactly while staying a ratio of small integers, so the
    double-precision score is BIT-IDENTICAL across engines — a
    transcendental ``ln`` idf would leave cross-engine ulp drift in the
    rank comparisons.  Output: ``(id_col, term, tf, df_docs, score,
    rank)`` with score micro-rounded for display (ranking uses the
    exact double, ties broken on the term string).

    Plan: the corpus tokenizes ONCE — tf and document frequency both
    come out of the same (id, t) aggregate (df as a count window over
    the small post-shuffle table, the bm25_search pattern; a separate
    ``terms.distinct()`` branch would re-reference the tokenize explode
    and Catalyst recomputes it per branch — the lambda-exprId
    ReuseExchange trap), the corpus size N joins in as a broadcast
    1-row aggregate (no driver ``.count()``), and WindowGroupLimit
    serves the per-doc top-k.
    """
    from golang_cassandra_kafka_feed_spark.operators.topk import (
        top_k_per_key,
    )

    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        _parallelize,
    )

    terms = _parallelize(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("t")
    )
    tf = terms.groupBy("id", "t").agg(F.count("*").alias("tf")).withColumn(
        "df_docs", F.count("*").over(Window.partitionBy("t"))
    )
    n_docs = df.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "t",
            "tf",
            "df_docs",
            (
                F.col("tf")
                * (
                    (
                        F.lit(2.0) * F.col("n_docs")
                        - F.lit(2.0) * F.col("df_docs")
                        + F.lit(1.0)
                    )
                    / (F.lit(2.0) * F.col("df_docs") + F.lit(1.0))
                )
            ).alias("score"),
        )
    )
    top = top_k_per_key(
        scored,
        ["id"],
        [F.col("score").desc(), F.col("t").asc()],
        k,
        rank_col="rank",
    )
    r6 = lambda c: F.round(c * 1000000) / 1000000  # noqa: E731
    return top.select(
        F.col("id").alias(id_col),
        F.col("t").alias("term"),
        "tf",
        "df_docs",
        r6(F.col("score")).alias("score"),
        "rank",
    )


# BM25 constants (Robertson et al.): k1 saturates term frequency, b
# scales the length normalization.  Exported so the DuckDB oracle embeds
# the same literals.
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_search(
    df: DataFrame,
    queries_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Full-text top-k retrieval: BM25 score of every query in
    ``queries_df`` (columns ``query_id``, ``query_text``) against the
    corpus, top ``k`` docs per query — the lexical half of a retrieval
    stack next to the embedding ANN family (similarity.py).

    Scoring uses the rational idf of `tfidf_top_terms` ((2N-2df+1) /
    (2df+1) — idf-order-preserving, no transcendental ln) and the
    standard BM25 tf saturation/length normalization; the per-(query,
    doc) sum over matched terms folds an ascending-sorted score array
    (the DSIR idiom), so the double is independent of aggregation
    arrival order and bit-identical cross-engine.

    Scale shape: the query-term broadcast join sits in the SAME stage as
    the token explode (scan-side filter), so only query-term occurrences
    ever reach a shuffle, and the corpus tokenizes ONCE: tf and document
    frequency come out of the same (id, t) aggregate — df as a count
    window over the tiny post-shuffle table, NOT a second aggregation
    from the explode subtree (Catalyst would recompute it: lambda
    expression ids defeat ReuseExchange); doc length is a second narrow
    scan (one codegen'd regexp_count, no explode, no shuffle); corpus
    stats ride in as a broadcast 1-row aggregate (no driver
    ``.count()``).  Final top-k is WindowGroupLimit.
    """
    from golang_cassandra_kafka_feed_spark.operators.topk import (
        top_k_per_key,
    )

    qterms = queries_df.select(
        "query_id", F.explode(tokens("query_text")).alias("t")
    ).distinct()
    # tf must be counted against the DISTINCT term set: joining the
    # corpus tokens to qterms (which still carries query_id) would emit
    # one row per (occurrence x query containing the term), inflating tf
    # by the query multiplicity whenever two queries share a term.
    # Query ids re-attach AFTER the (id, t) aggregate via a tiny
    # broadcast of term -> query_ids.
    #
    # NO input widen here (r12, verdict-r11 ask #2): ``pre`` feeds
    # three plan branches, so a _parallelize repartition appears three
    # times — measured a consistent loss in an interleaved 6-pair A/B
    # (widen 2.34 s vs no-widen 2.19 s median, no-widen won every
    # pair).  At cluster scale inputs arrive pre-split and the widen
    # was structurally a no-op anyway; locally the broadcast-pruned
    # explode is cheaper than three extra exchanges.
    pre = df.select(F.col(id_col), F.col(text_col))
    matched = pre.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("t")
    ).join(F.broadcast(qterms.select("t").distinct()), "t")
    tfq = matched.groupBy("id", "t").agg(F.count("*").alias("tf"))
    term_qids = qterms.groupBy("t").agg(
        F.collect_set("query_id").alias("qids")
    )
    tf = (
        tfq.withColumn(
            "df_docs", F.count("*").over(Window.partitionBy("t"))
        )
        .join(F.broadcast(term_qids), "t")
        .select(
            F.explode("qids").alias("query_id"), "id", "t", "tf", "df_docs"
        )
    )
    dl = pre.select(
        F.col(id_col).alias("id"), token_count(text_col).alias("dl")
    )
    stats = pre.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum(token_count(text_col)).cast("double").alias("tot_tokens"),
    )
    idf = (
        F.lit(2.0) * F.col("n_docs")
        - F.lit(2.0) * F.col("df_docs")
        + F.lit(1.0)
    ) / (F.lit(2.0) * F.col("df_docs") + F.lit(1.0))
    num = F.col("tf") * F.lit(k1 + 1.0)
    den = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / (F.col("tot_tokens") / F.col("n_docs"))
    )
    scored = (
        tf.join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id", "id", (idf * (num / den)).alias("s")
        )
    )
    agg = scored.groupBy("query_id", "id").agg(
        F.count("*").alias("n_terms_matched"),
        F.aggregate(
            F.array_sort(F.collect_list("s")),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("score"),
    )
    top = top_k_per_key(
        agg,
        ["query_id"],
        [F.col("score").desc(), F.col("id").asc()],
        k,
        rank_col="rank",
    )
    return top.select(
        "query_id",
        F.col("id").alias(id_col),
        "n_terms_matched",
        (F.round(F.col("score") * 1000000) / 1000000).alias("score"),
        "rank",
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 16,
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Fixed-token-window chunking with overlap — pretraining prep that
    turns long documents into model-sized pieces (the doc->sample step
    before sequence_pack bins samples into token budgets).

    Chunks start every ``stride = chunk_size - overlap`` tokens; a doc
    yields greatest(1, ceil((n - overlap) / stride)) chunks, so even an
    empty/short doc emits one (possibly short) chunk and consecutive
    chunks share ``overlap`` tokens.  All arithmetic is small-integer
    exact, and chunk text is rebuilt with single spaces from the shared
    tokenizer, so the SQL twin reproduces rows bit-identically.

    100 TB posture: one projection + one explode — no shuffle at all;
    chunk rows inherit the input partitioning (CHUNKS of a doc stay in
    its partition, which is what sequence packing wants downstream).
    ``carry_cols`` ride through the explode for exactly that reason: a
    join-back of metadata would reintroduce the shuffle this avoids.
    """
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError(
            f"chunk_size={chunk_size} must exceed overlap={overlap}"
        )
    carry = list(carry_cols)
    d = df.select(
        F.col(id_col),
        *carry,
        tokens(text_col).alias("__toks"),
        F.size(tokens(text_col)).alias("__n"),
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.floor((F.col("__n") - overlap + stride - 1) / stride).cast("long"),
    )
    return (
        d.select(
            id_col,
            *carry,
            "__toks",
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            *carry,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.slice(
                "__toks", F.col("chunk_idx") * stride + 1, chunk_size
            ).alias("__ct"),
        )
        .select(
            id_col,
            *carry,
            "chunk_idx",
            F.size("__ct").cast("long").alias("n_chunk_tokens"),
            F.array_join("__ct", " ").alias("chunk_text"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 500,
) -> DataFrame:
    """Corpus vocabulary + per-doc OOV rate: the tokenizer-training
    health check (which fraction of each doc falls outside the top-V
    corpus vocabulary).

    Vocabulary = top ``vocab_size`` tokens by exact global count,
    ties broken by token string — fully deterministic, so the SQL twin
    selects the identical set.  Returns (id, n_tokens, n_oov, oov_rate)
    with the cents rounding idiom.

    100 TB posture: token counts partial-aggregate map-side; the vocab
    (V rows) broadcasts back against the exploded corpus — the corpus
    shuffles once on the token key for the count and once on the doc id
    for the per-doc rollup; the vocab selection itself is a
    TakeOrdered-style top-V, never a full sort of the type frequency
    table.
    """
    from golang_cassandra_kafka_feed_spark.operators.topk import (
        top_k_per_key,
    )

    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        _parallelize,
    )

    # r11: one widened tokenization feeds the vocab count AND the
    # per-doc OOV rollup (both branches re-ran the regex, single-task
    # on a one-split local source)
    toks_doc = (
        _parallelize(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), tokens(text_col).alias("__ts"))
        .localCheckpoint(eager=False)
    )
    tok = toks_doc.select(F.col(id_col), F.explode("__ts").alias("__t"))
    counts = tok.groupBy("__t").agg(F.count(F.lit(1)).alias("__cnt"))
    vocab = top_k_per_key(
        counts.withColumn("__g", F.lit(1)),
        ["__g"],
        [F.col("__cnt").desc(), F.col("__t").asc()],
        vocab_size,
    ).select("__t", F.lit(1).alias("__inv"))
    per_doc = (
        tok.join(F.broadcast(vocab), "__t", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_if(F.col("__inv").isNull()).alias("n_oov"),
        )
    )
    return (
        toks_doc.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            (
                F.round(
                    F.coalesce("n_oov", F.lit(0))
                    / F.greatest(F.coalesce("n_tokens", F.lit(0)), F.lit(1))
                    * 100
                )
                / 100
            ).alias("oov_rate"),
        )
    )


def bigram_array_from_tokens(toks: Column) -> Column:
    """Word-bigram array from an already-tokenized array column.

    Built as zip_with over two shifted slices — NOT transform with an
    element_at(toks, i+2) inner lambda: higher-order functions run
    interpreted (no codegen, no common-subexpression elimination), so a
    lambda body that references the token array re-derives it PER
    ELEMENT — O(n^2) per document when the tokens come from a
    split+filter expression (the same interpreted-HOF trap as the
    round-2 marker-count finding).  zip_with evaluates each array
    argument once per row."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bigram_array(col: str | Column) -> Column:
    """Word-bigram array ("tok_i tok_i+1") of the Q29 tokenizer's output;
    empty array for texts with fewer than two tokens.  Shared by
    bigram_typicality (q70) and the DSIR feature hasher
    (operators/selection.py) so both score the identical feature stream."""
    return bigram_array_from_tokens(tokens(col))


def bigram_typicality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LM-free perplexity proxy: how typical each doc's word bigrams are
    of the corpus.  Returns (id, n_bigrams, mean_bigram_count) where
    mean_bigram_count averages, over the doc's bigrams, the GLOBAL corpus
    occurrence count of that bigram — garbled or out-of-domain text
    scores low, boilerplate scores high.  The classic quality-filter
    signal without a language model: all arithmetic is exact integer
    counts (sum of longs is order-independent), so the score — unlike a
    log-prob — is bit-identical cross-engine, keeping it inside the
    oracle contract (no transcendental log; same reasoning as the BM25
    rational idf in tfidf_top_terms).

    100 TB posture: one explode + one count shuffle on the bigram key +
    one join back (the count table is corpus-vocabulary-sized; Spark
    picks broadcast vs shuffle by stats) + one rollup on the doc id.
    """
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        _parallelize,
    )

    # r11: ONE widened bigram extraction feeds both the global count
    # and the per-doc rollup (the two branches each re-ran the regex on
    # the corpus, single-task on a one-split local source); doc-grain
    # lazy checkpoint, the shingle-sets idiom.
    docs_g = (
        _parallelize(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), bigram_array(text_col).alias("__gs"))
        .localCheckpoint(eager=False)
    )
    grams = docs_g.select(F.col(id_col), F.explode("__gs").alias("__g"))
    counts = grams.groupBy("__g").agg(F.count(F.lit(1)).alias("__cnt"))
    per_doc = (
        grams.join(counts, "__g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__cnt").alias("__total"),
        )
    )
    return (
        docs_g.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            (
                F.round(
                    F.coalesce("__total", F.lit(0))
                    / F.greatest(F.coalesce("n_bigrams", F.lit(0)), F.lit(1))
                    * 100
                )
                / 100
            ).alias("mean_bigram_count"),
        )
    )


TYPICALITY_BUCKETS = ("head", "middle", "tail")


def typicality_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
) -> DataFrame:
    """CCNet-style quality bucketing: within each language, rank documents
    by bigram typicality (the LM-free perplexity proxy of q70 —
    bigram_typicality) and split them into equal thirds: ``head`` (most
    typical ≈ lowest perplexity), ``middle``, ``tail``.  CCNet (Wenzek et
    al. 2020) buckets Common Crawl by per-language LM perplexity exactly
    this way and trains on head/middle; the proxy keeps the mechanism —
    per-group ranked tertiles — inside the exact-arithmetic oracle
    contract (no language model, no transcendental log).

    Determinism: the rank order is (score DESC, id ASC); the score is the
    q70 rounded mean (bit-identical cross-engine), so NTILE boundaries
    match DuckDB's exactly.

    100 TB posture: typicality costs one bigram-count shuffle + one doc
    rollup (see bigram_typicality); the bucketing itself is one window
    shuffle on the language key.  Per-language NTILE sorts within the
    language partition — at corpus scale swap the exact tertile for
    percentile thresholds (percent_rank is the same plan shape) if a
    single language dominates; boundaries drift only at ties.
    """
    scores = bigram_typicality(df, text_col=text_col, id_col=id_col)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("mean_bigram_count"), F.col(id_col)
    )
    labels = F.array(*[F.lit(b) for b in TYPICALITY_BUCKETS])
    return (
        df.select(id_col, group_col)
        .join(scores, id_col)
        .withColumn("__t", F.ntile(len(TYPICALITY_BUCKETS)).over(w))
        .select(
            id_col,
            group_col,
            "mean_bigram_count",
            F.element_at(labels, F.col("__t")).alias("bucket"),
        )
    )


def length_histogram(
    df: DataFrame,
    size_col: str = "n_chars",
    group_col: str = "source",
) -> DataFrame:
    """Log2-bucketed size histogram per group — the corpus length-
    distribution profile (what a curation run reads before choosing
    min/max length cutoffs).

    Bucket = floor(log2(max(size, 1))), computed EXACTLY as
    ``length(bin(n)) - 1`` (binary digit count): no transcendental log,
    so boundary values (1024 -> bucket 10, not 9.9999...) bucket
    identically in every engine.  Returns (group, bucket, lo, hi,
    n_docs, share) with share = docs in bucket / docs in group, cents
    idiom.

    100 TB posture: one map-side-combined groupBy on (group, bucket) —
    output is groups x ~40 rows no matter the corpus size — plus a tiny
    window for the per-group share.
    """
    from pyspark.sql import Window

    b = (
        F.length(F.bin(F.greatest(F.col(size_col), F.lit(1)))) - 1
    ).cast("long")
    hist = (
        df.groupBy(F.col(group_col), b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy(group_col)
    return hist.select(
        group_col,
        "bucket",
        F.expr("CAST(shiftleft(1, CAST(bucket AS INT)) AS BIGINT)").alias(
            "lo"
        ),
        F.expr(
            "CAST(shiftleft(1, CAST(bucket AS INT) + 1) - 1 AS BIGINT)"
        ).alias("hi"),
        "n_docs",
        (
            F.round(F.col("n_docs") / F.sum("n_docs").over(w) * 100) / 100
        ).alias("share"),
    )


def collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Collocation extraction: adjacent word pairs ranked by lift —
    ``N * c(w1 w2) / (c(w1) * c(w2))``, pointwise mutual information
    without the log (same ordering, and an exact-arithmetic expression:
    each operand is an exact integer-valued double and each of the
    three ops is one correctly-rounded IEEE operation, so the score is
    bit-identical cross-engine).  ``min_count`` keeps only bigrams with
    real support (lift is noisy at count 1).

    Scale shape: one tokenize pass exploded to bigrams (zero shuffle
    until the count), one (bigram) count shuffle + one (token) count
    shuffle, unigram counts joined back (vocabulary-sized — Zipf keeps
    it tiny relative to the corpus; AQE broadcasts it), total-token
    count as a second narrow regexp_count scan (no explode).  Top-k is
    TakeOrderedAndProject on the (tiny) surviving bigram set.
    """
    from golang_cassandra_kafka_feed_spark.operators.topk import (
        top_k_global,
    )

    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        _parallelize,
    )

    # r11: tokenize ONCE (widened, doc-grain lazy checkpoint) and
    # derive bigrams, unigram counts and the token total from the same
    # token arrays — the three branches each re-ran a regex pass over
    # the one-split local source (size(__ts) == token_count(text) and
    # bigram_array == bigram_array_from_tokens(tokens(.)) by
    # definition, so every count is unchanged)
    toks_doc = (
        _parallelize(df.select(F.col(text_col)))
        .select(tokens(text_col).alias("__ts"))
        .localCheckpoint(eager=False)
    )
    bg = (
        toks_doc.select(
            F.explode(bigram_array_from_tokens(F.col("__ts"))).alias("bg")
        )
        .groupBy("bg")
        .agg(F.count("*").alias("c_bg"))
        .filter(F.col("c_bg") >= min_count)
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
            "c_bg",
        )
    )
    uni = (
        toks_doc.select(F.explode("__ts").alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
    )
    n_tok = toks_doc.agg(
        F.sum(F.size("__ts")).cast("double").alias("n_tokens")
    )
    lift = (F.col("c_bg").cast("double") * F.col("n_tokens")) / (
        F.col("c1").cast("double") * F.col("c2")
    )
    scored = (
        bg.join(uni.select(F.col("t").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("t").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_tok))
        .select(
            "w1", "w2", "c_bg", "c1", "c2", lift.alias("__lift")
        )
    )
    top = top_k_global(
        scored, [F.desc("__lift"), F.asc("w1"), F.asc("w2")], k
    )
    return top.select(
        "w1", "w2", "c_bg", "c1", "c2",
        (F.round(F.col("__lift") * 1000000) / 1000000).alias("lift"),
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram novelty: what fraction of a document's
    DISTINCT word-bigrams appear for the FIRST time in the corpus
    (first = smallest ``id_col`` carrying the gram).  Returns
    ``(id, n_distinct_grams, n_novel, novelty)`` for EVERY document
    (featureless docs score 0) — the marginal-contribution signal a
    curation pipeline uses to rank near-boilerplate corpora: templated
    docs contribute ~0 novel grams, fresh content contributes many.

    Cross-engine determinism: counts are exact integers; novelty is ONE
    int/int double division then the x10000 rounding idiom, identical
    in the DuckDB twin.

    100 TB posture: explode distinct grams (map-side array_distinct
    bounds multiplicity), one combine-safe groupBy on the gram for
    first-seen (min), one join back on the gram (AQE handles celebrity
    grams — join output stays postings-sized), one groupBy on the doc
    id.  No window over the gram (a hot gram's postings would ship to
    one task).

    Reference tie: first-seen = min(doc_id) is the batch analogue of
    the CAS first-writer-wins insert (internal/store/feed.go:44-59 —
    later writers discover the existing row instead of creating)."""
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        _parallelize,
    )

    grams = _parallelize(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(bigram_array(text_col))).alias("__g"),
    )
    first = grams.groupBy("__g").agg(F.min(id_col).alias("__first"))
    per_doc = (
        grams.join(first, "__g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_distinct_grams"),
            F.count_if(F.col("__first") == F.col(id_col)).alias("n_novel"),
        )
    )
    zero = F.lit(0).cast("bigint")
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_distinct_grams", zero).alias("n_distinct_grams"),
            F.coalesce("n_novel", zero).alias("n_novel"),
            (
                F.round(
                    F.coalesce("n_novel", zero)
                    / F.greatest(
                        F.coalesce("n_distinct_grams", zero), F.lit(1)
                    )
                    * 10000
                )
                / 10000
            ).alias("novelty"),
        )
    )
