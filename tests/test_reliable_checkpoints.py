"""Durable-checkpoint option for the corpus-sized materialized frames
(round-5 verdict ask #4).

The minhash/simhash verify sets and the Lloyd quantized-points frame
are materialized via ``localCheckpoint`` by default — executor-memory
blocks that die with the executor.  Fine on local[n]; on a 1000-executor
cluster a multi-hour dedup job must survive executor loss, so each
operator threads ``reliable=True, checkpoint_dir=`` through
graph.py::_checkpointer (durable parquet rounds).  These tests mirror
tests/test_graph.py::test_reliable_checkpoint_roundtrip_identical:
the durable path must produce IDENTICAL results and actually write
part-files under the checkpoint dir.
"""

from __future__ import annotations

import os

import pytest

from golang_cassandra_kafka_feed_spark.operators.clustering import (
    kmeans_assign,
    semantic_dedup_pairs,
)
from golang_cassandra_kafka_feed_spark.operators.dedup import (
    minhash_accuracy_audit,
    minhash_near_duplicates,
)

SF_DIR = "/root/testdata/sf0.001"


def _part_files(ckdir: str) -> list[str]:
    return [
        f
        for root, _, fs in os.walk(ckdir)
        for f in fs
        if f.startswith("part")
    ]


def _docs(spark):
    from golang_cassandra_kafka_feed_spark.sources.testdata import load_table

    return load_table(spark, SF_DIR, "documents")


def _embs(spark):
    from golang_cassandra_kafka_feed_spark.sources.testdata import load_table

    return load_table(spark, SF_DIR, "embeddings")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "op",
    [minhash_near_duplicates, minhash_accuracy_audit],
    ids=["neardup", "audit"],
)
def test_minhash_reliable_matches_local(spark, tmp_path, op):
    docs = _docs(spark)
    ckdir = str(tmp_path / "ck")
    base = _rows(op(docs))
    durable = _rows(op(docs, reliable=True, checkpoint_dir=ckdir))
    assert durable == base
    assert _part_files(ckdir), "no durable checkpoint written"


def test_kmeans_reliable_matches_local(spark, tmp_path):
    embs = _embs(spark)
    ckdir = str(tmp_path / "ck")
    base = _rows(kmeans_assign(embs, k=4, iters=2))
    durable = _rows(
        kmeans_assign(
            embs, k=4, iters=2, reliable=True, checkpoint_dir=ckdir
        )
    )
    assert durable == base
    assert _part_files(ckdir), "no durable checkpoint written"


def test_semantic_dedup_reliable_matches_local(spark, tmp_path):
    embs = _embs(spark)
    base = _rows(semantic_dedup_pairs(embs, k=4, iters=1, threshold=0.5))

    # vectorized default (r9): the pair stage is one join +
    # applyInPandas, so only kmeans_assign's pts frame needs a durable
    # checkpoint — exactly ONE checkpointer base
    ckdir = str(tmp_path / "ck_vec")
    durable = _rows(
        semantic_dedup_pairs(
            embs, k=4, iters=1, threshold=0.5,
            reliable=True, checkpoint_dir=ckdir,
        )
    )
    assert durable == base
    bases = {
        d
        for root, ds, _ in os.walk(ckdir)
        for d in ds
        if d.startswith("gckfs-")
    }
    assert len(bases) == 1, f"expected 1 checkpointed frame, got {bases}"

    # HOF twin: both kmeans_assign's pts AND the pair-side pts frame
    # are durable — two separate checkpointer bases under the same dir
    ckdir2 = str(tmp_path / "ck_hof")
    durable2 = _rows(
        semantic_dedup_pairs(
            embs, k=4, iters=1, threshold=0.5,
            reliable=True, checkpoint_dir=ckdir2, vectorized=False,
        )
    )
    assert durable2 == base
    bases2 = {
        d
        for root, ds, _ in os.walk(ckdir2)
        for d in ds
        if d.startswith("gckfs-")
    }
    assert len(bases2) == 2, f"expected 2 checkpointed frames, got {bases2}"


def test_reliable_without_dir_fails_fast(spark):
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("session already has a checkpoint dir")
    with pytest.raises(ValueError, match="checkpoint directory"):
        minhash_near_duplicates(_docs(spark), reliable=True)
