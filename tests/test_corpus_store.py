"""Incremental corpus ingestion (operators/corpus_store.py): exact and
near dedup against stored state, idempotent re-ingest, no-near-dup
invariant of the accumulated corpus."""

from __future__ import annotations

from golang_cassandra_kafka_feed_spark.operators.corpus_store import (
    CorpusStore,
)
from golang_cassandra_kafka_feed_spark.operators.dedup import (
    minhash_near_duplicates,
)

_BASE = (
    "the quick brown fox jumps over the lazy dog while the rain "
    "falls softly on the quiet green meadow near the old stone bridge "
    "and the evening light settles gently across the distant rolling "
    "hills where tired travelers rest beside the winding river path "
    "listening to the wind move slowly through the tall ancient trees"
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "srcA", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_ingest_dedups_within_batch_and_is_idempotent(spark, tmp_path):
    store = CorpusStore(spark, str(tmp_path / "corpus"))
    near = _BASE.replace("lazy", "sleepy")  # high-jaccard near dup
    batch = _docs(
        spark,
        [
            (1, _BASE),
            (2, _BASE),          # exact dup of 1 -> dropped
            (3, near),           # near dup of 1 -> dropped
            (4, "completely different text about spark and parquet files"),
        ],
    )
    stats = store.ingest(batch)
    assert stats == {"n_in": 4, "n_after_exact": 3, "n_accepted": 2}
    assert {r.doc_id for r in store.table("docs").collect()} == {1, 4}

    # idempotent: everything is now an exact dup of stored state
    stats2 = store.ingest(batch)
    assert stats2["n_accepted"] == 0
    assert store.table("docs").count() == 2


def test_ingest_rejects_near_dups_of_stored_docs(spark, tmp_path):
    store = CorpusStore(spark, str(tmp_path / "corpus"))
    store.ingest(_docs(spark, [(1, _BASE)]))
    batch2 = _docs(
        spark,
        [
            (10, _BASE.replace("quick", "swift")),  # near dup of stored 1
            (11, "an entirely unrelated document describing database joins"),
        ],
    )
    stats = store.ingest(batch2)
    assert stats["n_accepted"] == 1
    docs = {r.doc_id for r in store.table("docs").collect()}
    assert docs == {1, 11}
    # state tables cover exactly the accepted docs
    assert {r.doc_id for r in store.table("fingerprints").collect()} == docs
    assert {
        r.doc_id for r in store.table("minhash_bands").collect()
    } == docs


def test_accumulated_corpus_has_no_near_dups(spark, sf_dir, tmp_path):
    from golang_cassandra_kafka_feed_spark.sources.testdata import load_table

    store = CorpusStore(spark, str(tmp_path / "corpus"))
    docs = load_table(spark, sf_dir, "documents")
    b1 = docs.filter("doc_id < 250")
    b2 = docs.filter("doc_id >= 250")
    s1 = store.ingest(b1)
    s2 = store.ingest(b2)
    total = store.table("docs").count()
    assert total == s1["n_accepted"] + s2["n_accepted"] > 0
    remaining = minhash_near_duplicates(
        store.table("docs"), text_col="text", id_col="doc_id", threshold=0.8
    )
    assert remaining.count() == 0


def test_streaming_corpus_ingest_pipeline(spark, sf_dir, tmp_path):
    """Documents arriving as a file stream are deduped incrementally; a
    replayed delivery (same docs again in a later batch) adds nothing."""
    from golang_cassandra_kafka_feed_spark.operators.corpus_store import (
        run_corpus_ingest_pipeline,
    )
    from golang_cassandra_kafka_feed_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    src = tmp_path / "docs"
    b1 = docs.filter("doc_id < 200")
    b1.coalesce(1).write.parquet(str(src / "b1"))
    docs.filter("doc_id >= 200 AND doc_id < 300").coalesce(1).write.parquet(
        str(src / "b2")
    )
    b1.coalesce(1).write.parquet(str(src / "b3"))  # replayed delivery

    store = CorpusStore(spark, str(tmp_path / "corpus"))
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    q = run_corpus_ingest_pipeline(stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    stored = store.table("docs")
    n = stored.count()
    assert 0 < n <= 300
    # the replay added nothing: every stored id is unique
    assert stored.select("doc_id").distinct().count() == n
    remaining = minhash_near_duplicates(
        stored, text_col="text", id_col="doc_id", threshold=0.8
    )
    assert remaining.count() == 0


def test_ingest_empty_batch_is_noop(spark, tmp_path):
    store = CorpusStore(spark, str(tmp_path / "corpus"))
    empty = _docs(spark, [])
    stats = store.ingest(empty)
    assert stats == {"n_in": 0, "n_after_exact": 0, "n_accepted": 0}
    # an empty first ingest must not corrupt state for later ones
    stats2 = store.ingest(_docs(spark, [(1, _BASE)]))
    assert stats2["n_accepted"] == 1
    assert store.table("docs").count() == 1
    # and another empty ingest after real state
    assert store.ingest(empty)["n_accepted"] == 0
    assert store.table("docs").count() == 1
