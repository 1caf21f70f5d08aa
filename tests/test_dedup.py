"""Dedup-family property tests: LSH candidates must recall true near-dups,
verification must be exact (SURVEY.md M6 / BASELINE.json extension ops)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from golang_cassandra_kafka_feed_spark.operators.dedup import (
    exact_dedup,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
    simhash_signatures,
)
from golang_cassandra_kafka_feed_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    """Real documents plus planted near-duplicates (doc_id >= 10_000):
    each planted doc mutates the tail of an original."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = (
        docs.filter(F.col("doc_id") < 20)
        .select(
            (F.col("doc_id") + 10_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzq mutated tail")).alias("text"),
        )
    )
    return docs.unionByName(planted)


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(3, "aaa"), (1, "aaa"), (2, "bbb")], "doc_id long, text string"
    )
    out = {(r.doc_id, r.text, r.n_dups) for r in exact_dedup(df).collect()}
    assert out == {(1, "aaa", 2), (2, "bbb", 1)}


def test_minhash_finds_planted_near_dups(corpus):
    pairs = minhash_near_duplicates(corpus, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(i, i + 10_000) for i in range(20)}
    recall = len(got & planted) / len(planted)
    # banding S-curve at J~0.8 for b=16,r=4: planted pairs (J>0.85) must
    # essentially all collide
    assert recall >= 0.9, f"LSH recall {recall} on planted near-dups"
    # verification step guarantees no below-threshold pair survives
    assert pairs.filter(F.col("jaccard") < 0.5).count() == 0


def test_minhash_md5_arrow_matches_explode_path(spark, sf_dir):
    """The r11 vectorized md5 signature path (JVM per-shingle md5
    array projection + one exact int64 Arrow pass for the k seeded
    minima) must emit signatures BIT-IDENTICAL to the explode/partial-
    aggregate path — all operands < 2^62, so NumPy int64 and JVM
    BIGINT arithmetic agree exactly.  banded_rows' md5 buckets (now
    sliced from the Arrow sig) must equal the band slices of the
    classic signatures, so every persisted band index stays valid."""
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        banded_rows,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    arrow = {
        r.id: list(r.sig)
        for r in minhash_signatures(docs, hasher="md5").collect()
    }
    classic = {
        r.id: list(r.sig)
        for r in minhash_signatures(
            docs, hasher="md5", use_arrow=False
        ).collect()
    }
    assert arrow == classic

    r = 64 // 16
    want = {
        (i, b, ",".join(str(v) for v in sig[b * r : (b + 1) * r]))
        for i, sig in classic.items()
        for b in range(16)
    }
    got = {
        (x.id, x.band, x.bucket)
        for x in banded_rows(docs, hasher="md5").collect()
    }
    assert got == want


def test_simhash_md5_arrow_matches_explode_path(spark, sf_dir):
    """The r11 vectorized SimHash (md5 hex array projection + exact
    int64 Arrow bit-vote fold) must emit (id, hi, lo) BIT-IDENTICAL to
    the explode/64-SUM-aggregate path, including dropping zero-token
    docs the same way."""
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        simhash_signatures_md5,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # plant a zero-token doc to pin the drop-empty contract
    docs = docs.unionByName(
        spark.createDataFrame(
            [(999_999, "12345 !!!")], "doc_id long, text string"
        )
    )
    arrow = {
        (r.id, r.hi, r.lo)
        for r in simhash_signatures_md5(docs).collect()
    }
    classic = {
        (r.id, r.hi, r.lo)
        for r in simhash_signatures_md5(docs, use_arrow=False).collect()
    }
    assert arrow == classic
    assert not any(i == 999_999 for i, _, _ in arrow)


def test_minhash_jaccard_values_are_exact(spark, sf_dir):
    """The testdata corpus contains planted near-dups; every returned
    pair's jaccard must equal the independently computed exact value
    (LSH prunes candidates, never distorts scores)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = minhash_near_duplicates(docs, threshold=0.95).collect()
    assert len(pairs) > 0  # the generator plants high-sim duplicates
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.9).collect()
    }
    for r in pairs:
        assert exact[(r.id_a, r.id_b)] == r.jaccard


def test_ngram_jaccard_exact_value(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox sleeps"),
            (3, "completely different words here"),
        ],
        "doc_id long, text string",
    )
    rows = ngram_jaccard_pairs(df, n=3, threshold=0.1).collect()
    got = {(r.id_a, r.id_b): round(r.jaccard, 4) for r in rows}
    # doc1: {tqb, qbf, bfj}; doc2: {tqb, qbf, bfs}; shared 2, union 4
    assert got == {(1, 2): 0.5}


def test_simhash_close_for_near_dups(corpus):
    sigs = simhash_signatures(corpus)
    a = sigs.alias("a")
    b = sigs.alias("b")
    dist = (
        a.join(b, F.col("a.id") + 10_000 == F.col("b.id"))
        .select(
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("d")
        )
        .agg(F.max("d").alias("max_d"), F.avg("d").alias("avg_d"))
        .collect()[0]
    )
    # a small tail mutation flips few simhash bits
    assert dist.avg_d <= 8, dist


def test_simhash_near_duplicates_threshold(corpus):
    out = simhash_near_duplicates(corpus, max_hamming=6)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    planted = {(i, i + 10_000) for i in range(20)}
    assert len(got & planted) >= 15  # most planted pairs within hamming 6
    assert out.filter(F.col("hamming") > 6).count() == 0


# ---------------------------------------------------------------------------
# bucket-width cap (mega-bucket guard)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def templated_corpus(spark):
    """~1k documents sharing one boilerplate template, each differing by a
    short unique tail — near-identical but NOT exact duplicates, so
    exact_dedup cannot drain them and every doc lands in the same LSH
    buckets (the templated-corpus mega-bucket pathology)."""
    template = " ".join(
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
        .split() * 12
    )
    # letters-only suffixes: the tokenizers split on [^a-z]+
    tags = [
        f"{chr(97 + i // 26 // 26)}{chr(97 + i // 26 % 26)}{chr(97 + i % 26)}"
        for i in range(1000)
    ]
    rows = [(i, f"{template} tail{t}") for i, t in enumerate(tags)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_mega_bucket_capped(templated_corpus):
    from pyspark.sql import Observation

    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    cap = 50
    obs = Observation()
    cands = minhash_lsh_candidates(
        templated_corpus,
        hasher="md5",
        max_bucket_width=cap,
        width_observation=obs,
    )
    n = cands.count()
    # each of the 16 bands can contribute at most C(cap, 2) pairs; without
    # the cap a single saturated bucket alone would yield C(1000, 2) =
    # 499_500 pairs
    assert 0 < n <= 16 * cap * (cap - 1) // 2
    assert obs.get["n_bucket_members_dropped"] > 0


def test_simhash_mega_bucket_capped(templated_corpus):
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        simhash_signatures_md5,
    )

    cap = 50
    out = simhash_near_duplicates(
        templated_corpus, max_hamming=6, hasher="md5", max_bucket_width=cap
    )
    n = out.count()
    # the structural guarantee: each (chunk, ckey) bucket contributes at
    # most C(cap, 2) pairs no matter how many docs collide into it —
    # uncapped, the saturated buckets alone would contribute up to
    # C(1000, 2) = 499_500
    sigs = simhash_signatures_md5(templated_corpus)
    n_buckets = (
        sigs.selectExpr(
            "explode(array((lo & 65535), (shiftright(lo, 16) & 65535), "
            "(hi & 65535), (shiftright(hi, 16) & 65535))) AS ckey"
        )
        .distinct()
        .count()
    )
    assert 0 < n <= n_buckets * cap * (cap - 1) // 2
    assert n < 499_500 // 10


def test_cap_keeps_smallest_ids_and_default_changes_nothing(corpus):
    """On the normal corpus no bucket approaches MAX_BUCKET_WIDTH, so the
    capped operator must return exactly the uncapped pair set (recall
    unchanged); and an artificially tiny cap must keep smallest-id bucket
    members (deterministic truncation, matching the oracle's ORDER BY)."""
    base = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(corpus, threshold=0.5).collect()
    }
    huge = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(
            corpus, threshold=0.5, max_bucket_width=10**6
        ).collect()
    }
    assert base == huge


# ---------------------------------------------------------------------------
# line_dedup — CCNet/RefinedWeb line-level dedup
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def lined(spark):
    """Three pages sharing a boilerplate header/footer, one unique page,
    and an exact-duplicate pair."""
    rows = [
        (1, "COOKIE BANNER\npage one body text\nfooter fine print"),
        (2, "COOKIE BANNER\npage two body text\nfooter fine print"),
        (3, "COOKIE BANNER\npage three body text\nfooter fine print"),
        (4, "a fully unique page\nwith only unique lines"),
        (5, "twin page body"),
        (6, "twin page body"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_strips_boilerplate_everywhere(lined):
    from golang_cassandra_kafka_feed_spark.operators.dedup import line_dedup

    out = {r["doc_id"]: r for r in line_dedup(lined).collect()}
    # CCNet keep='none': every copy of the banner and footer is gone.
    for d in (1, 2, 3):
        assert out[d]["n_lines"] == 3
        assert out[d]["n_kept"] == 1
        assert "body text" in out[d]["text_kept"]
        assert "COOKIE" not in out[d]["text_kept"]
        assert "footer" not in out[d]["text_kept"]
    # Unique lines untouched, original order and separator preserved.
    assert out[4]["text_kept"] == "a fully unique page\nwith only unique lines"
    # Exact-duplicate docs lose their only line entirely.
    assert out[5]["n_kept"] == 0 and out[5]["text_kept"] == ""
    assert out[6]["n_kept"] == 0


def test_line_dedup_keep_first_retains_canonical_copy(lined):
    from golang_cassandra_kafka_feed_spark.operators.dedup import line_dedup

    out = {
        r["doc_id"]: r
        for r in line_dedup(lined, keep="first").collect()
    }
    # The smallest (doc_id, line_idx) copy survives: doc 1 keeps all 3
    # lines, docs 2-3 keep only their unique body.
    assert out[1]["n_kept"] == 3
    assert out[1]["text_kept"].startswith("COOKIE BANNER\n")
    assert out[2]["n_kept"] == 1 and out[3]["n_kept"] == 1
    assert out[5]["n_kept"] == 1 and out[6]["n_kept"] == 0


def test_line_dedup_trims_before_hashing(spark):
    from golang_cassandra_kafka_feed_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [(1, "  padded line  \nunique a"), (2, "padded line\nunique b")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    # Whitespace-variant copies collapse to one identity and both drop.
    assert out[1]["n_kept"] == 1 and "unique a" in out[1]["text_kept"]
    assert out[2]["n_kept"] == 1 and "unique b" in out[2]["text_kept"]


def test_line_dedup_min_count_threshold(lined):
    from golang_cassandra_kafka_feed_spark.operators.dedup import line_dedup

    out = {
        r["doc_id"]: r
        for r in line_dedup(lined, min_count=4).collect()
    }
    # Banner/footer occur 3x < 4: everything survives.
    assert all(out[d]["n_kept"] == out[d]["n_lines"] for d in out)


def test_line_dedup_rejects_bad_keep(lined):
    from golang_cassandra_kafka_feed_spark.operators.dedup import line_dedup

    with pytest.raises(ValueError, match="keep"):
        line_dedup(lined, keep="last")


def test_line_dedup_stable_under_repartition(lined):
    from golang_cassandra_kafka_feed_spark.operators.dedup import line_dedup

    a = sorted(map(tuple, line_dedup(lined).collect()))
    b = sorted(map(tuple, line_dedup(lined.repartition(5)).collect()))
    assert a == b


def test_minhash_accuracy_audit_estimates_jaccard(corpus):
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        minhash_accuracy_audit,
    )

    rows = minhash_accuracy_audit(corpus).collect()
    assert rows, "audit found no candidate pairs on the planted corpus"
    planted = {(i, i + 10_000) for i in range(20)}
    got = {(r.id_a, r.id_b) for r in rows}
    assert len(got & planted) / len(planted) >= 0.9
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert abs(abs(r.est_jaccard - r.exact_jaccard) - r.abs_err) < 1e-6
    # E[est] = J: with k=64 hashes the mean absolute error over the
    # (high-J) planted pairs must be well inside one std (1/sqrt(64)).
    errs = [r.abs_err for r in rows if (r.id_a, r.id_b) in planted]
    assert sum(errs) / len(errs) <= 0.125


# ---- prefix-filtered set-similarity join (q123 mechanism) ----

def test_prefix_filter_equals_all_pairs_on_the_corpus(spark, sf_dir):
    """The prefix-filter index must reproduce the UNCAPPED inverted
    index's pairs exactly (candidate completeness) on real data."""
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )
    from golang_cassandra_kafka_feed_spark.sources.testdata import (
        load_table,
    )

    d = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, prefix_filter_jaccard_pairs(
        d, n=3, threshold=0.5).collect()))
    b = sorted(map(tuple, ngram_jaccard_pairs(
        d, n=3, threshold=0.5, max_shingle_freq=10**9).collect()))
    assert a == b and len(a) > 0


def test_prefix_filter_keeps_exact_threshold_boundary(spark):
    """A pair at exactly J = t must survive: the epsilon in
    ceil(size*t - 1e-9) may only LENGTHEN the prefix, never shorten
    it past the theorem's bound."""
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    # 3-gram shingles: "a b c d" -> {abc, bcd}; "a b c e" -> {abc, bce}
    # J = 1/3; with t = 1/3 the pair sits exactly on the boundary
    d = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id bigint, text string"
    )
    out = prefix_filter_jaccard_pairs(d, n=3, threshold=1 / 3).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]


def test_prefix_index_is_smaller_and_holds_the_rarest_shingles(spark):
    """Mechanism property: at t=0.5 the index holds about half the
    postings of the full inverted index — the low-frequency half."""
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        _shingles,
    )

    # digits are token separators under the corpus tokenizer, so the
    # per-doc unique words must be alphabetic
    d = spark.createDataFrame(
        [(i, "common words everywhere always seen in each doc plus "
             f"rare{chr(97 + i)} tail{chr(97 + i)} end{chr(97 + i)}")
         for i in range(20)],
        "doc_id bigint, text string",
    )
    full = d.select(
        F.explode(F.array_distinct(_shingles("text", 3))).alias("s")
    ).count()
    # reproduce the operator's prefix selection
    from pyspark.sql import Window

    sets = d.select(
        F.col("doc_id").alias("id"),
        F.array_distinct(_shingles("text", 3)).alias("sh"),
    ).withColumn("set_size", F.size("sh"))
    inv = sets.select(
        "id", "set_size", F.explode("sh").alias("shingle")
    )
    freq = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("id").orderBy("df", "shingle")
    plen = (
        F.col("set_size") - F.ceil(F.col("set_size") * 0.5 - 1e-9) + 1
    )
    pref = (
        inv.join(freq, "shingle")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= plen)
    )
    n_pref = pref.count()
    assert n_pref < full * 0.75, (n_pref, full)
    # rarest-first order: every doc's 3 unique (df=1) shingles — the
    # windows touching its rareX/tailX/endX tail — are ALL indexed
    # before any corpus-wide shared shingle fills the prefix
    assert pref.filter(F.col("df") == 1).count() == 20 * 3


def test_prefix_filter_template_corpus_metric_fires_and_recovers(spark):
    """The documented residual pathology made observable (verdict-r9
    ask #6): a mass-identical template corpus re-forms the quadratic in
    the candidate enumeration — completeness forbids capping it — and
    the new width_observation records exactly that mass.  The
    documented precondition (exact_dedup first) must then recover the
    cost on the SAME corpus: one survivor per template, enumeration
    collapses, and the pair answer over survivors is unchanged."""
    from pyspark.sql import Observation

    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        exact_dedup,
        prefix_filter_jaccard_pairs,
    )

    n_copies = 120
    template = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    rows = [(i, template) for i in range(n_copies)]
    # a handful of genuinely distinct docs riding along
    rows += [
        (1000, "alpha beta gamma delta epsilon zeta"),
        (1001, "alpha beta gamma delta epsilon eta"),
        (1002, "one two three four five six seven"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id bigint, text string")

    obs = Observation()
    pairs = prefix_filter_jaccard_pairs(
        corpus, n=3, threshold=0.5, width_observation=obs
    )
    n_template_pairs = pairs.filter("id_a < 1000 and id_b < 1000").count()
    # completeness: every template pair is found...
    assert n_template_pairs == n_copies * (n_copies - 1) // 2
    # ...and the metric shows the quadratic enumeration that produced it
    assert obs.get["n_enumerated_pairs"] >= n_copies * (n_copies - 1) // 2
    # r11 PPJoin positional filter: the 8-word template has s=6
    # shingles, prefix length 4; identical-pair matches at position p
    # survive iff 1 + (6-p) >= alpha = ceil((6+6)*0.5/1.5) = 4, i.e.
    # p <= 3 — the 4th prefix entry's matches are discarded inside the
    # join, so enumeration is EXACTLY 3*C(n,2) (plus 1 for the
    # 1000/1001 pair, whose pos-3 match is likewise pruned) instead of
    # the r10 value 4*C(n,2) + 2.
    assert (
        obs.get["n_enumerated_pairs"]
        == 3 * n_copies * (n_copies - 1) // 2 + 1
    )

    # precondition recovers the cost: exact-dedup first, re-run
    survivors = exact_dedup(corpus).select("doc_id", "text")
    obs2 = Observation()
    pairs2 = sorted(
        map(
            tuple,
            prefix_filter_jaccard_pairs(
                survivors, n=3, threshold=0.5, width_observation=obs2
            ).collect(),
        )
    )
    enum2 = obs2.get["n_enumerated_pairs"]
    assert enum2 < n_copies  # linear-ish, not quadratic
    # r11 positional filter on the survivor corpus: the 1000/1001 pair
    # shares shingles at positions 2 and 3 of each 4-shingle set; only
    # the pos-2 match satisfies 1 + (4-p) >= alpha = ceil(8*0.5/1.5)
    # = 3, so enumeration is exactly 1 (was 2 in r10).
    assert enum2 == 1
    # survivors' near-dup structure intact (the 1000/1001 pair)
    assert [(a, b) for a, b, _ in pairs2] == [(1000, 1001)]


def test_prefix_filter_positional_and_length_filters_prune(spark):
    """PPJoin candidate pruning (verdict r11 #3), planted closed-form:

    - doc 1 ("sa sb sc", ONE shingle) and doc 2 (same probe head +
      the filler tail) share their RAREST shingle (sa,sb,sc) at
      positions 1 and 3 of their frequency orders — both inside their
      prefixes, so r10 ENUMERATED the pair and paid verification to
      reject it (true J = 1/11 < 0.7).  The r11 length filter kills it
      in the join condition (min size 1 < 0.7 * 11) — and so does the
      positional bound (ubound 1 < alpha 5): enumerated ZERO times.
    - docs 10/11 are identical 10-shingle docs (a TRUE pair, J=1):
      their prefix has 4 entries, but matches survive the positional
      bound 1 + (10-p) >= alpha = ceil(20*0.7/1.7) = 9 only at
      p <= 2 — so the pair enumerates exactly twice (was 4), and
      STILL reaches verification (completeness: the first common
      shingle always survives).
    - doc 2 vs the fillers share the tail shingles at positions
      deep enough that ubound = 1 + min(11-4, 10-3) = 8 < alpha = 9
      prunes every match (true J = 8/13 < 0.7 — correctly no pair).
    """
    import string

    from pyspark.sql import Observation

    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    fw = [f"f{c}" for c in string.ascii_lowercase[:12]]  # fa..fl
    filler = " ".join(fw)
    rows = [
        (1, "sa sb sc"),
        (2, "sa sb sc " + " ".join(fw[2:])),
        (10, filler),
        (11, filler),
    ]
    corpus = spark.createDataFrame(rows, "doc_id bigint, text string")
    obs = Observation()
    pairs = sorted(
        map(
            tuple,
            prefix_filter_jaccard_pairs(
                corpus, n=3, threshold=0.7, width_observation=obs
            ).collect(),
        )
    )
    assert [(a, b, j) for a, b, j in pairs] == [(10, 11, 1.0)]
    assert obs.get["n_enumerated_pairs"] == 2
