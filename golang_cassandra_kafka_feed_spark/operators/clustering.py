"""Distributed k-means and SemDeDup-style semantic dedup over embeddings.

The training-data curation step the similarity family was missing:
cluster the corpus, then drop near-duplicate members *within* each
cluster (SemDeDup, Abbas et al. 2023) — the scale path that avoids the
all-pairs cosine join q35 runs on small inputs.

Cross-engine exactness (the md5-idiom philosophy from the dedup/ANN
families, applied to geometry): embeddings are floor-quantized onto an
integer grid (``GRID`` steps per unit).  Every subsequent operation —
squared distances via the dot-product identity, Lloyd centroid updates
as floor(sum/count) — is integer arithmetic whose magnitudes stay far
below 2^53, so double-precision engines (DuckDB's list_dot_product)
compute the *same exact integers* as Spark's BIGINT fold, and cluster
assignments reproduce bit-identically across engines.  floor() (not a
cast) everywhere: SQL casts truncate toward zero, floor is unambiguous
for negatives in both engines.

100 TB posture: Lloyd's iteration is (a) one narrow pass per point
against k broadcast centroids (no shuffle of the corpus), (b) a
posexplode to (cluster, dim) partial-aggregated map-side down to
k x dim rows per partition.  Points are never shuffled by cluster for
assignment; the only corpus-wide shuffle is the final SemDeDup
self-join on cluster_id, which the per-cluster width cap bounds (same
guard pattern as minhash_lsh_candidates' bucket cap).  For real runs
k scales as n / target_cluster_size, keeping intra-cluster pair
enumeration linear-ish.

Reference parity: the reference engine has no clustering surface; this
extends SURVEY.md §2's LLM-pipeline family (brief: "embedding-cosine
near-dup" scale path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Quantization grid: |x| <= ~1 embeddings land in [-GRID, GRID]; 64-dim
# dot products then peak around 64 * GRID^2 ~ 6.4e11 << 2^53, keeping
# double-engine arithmetic exact.
GRID = 100_000
DEFAULT_K = 8
DEFAULT_ITERS = 2
DEFAULT_SIM_THRESHOLD = 0.35
DEFAULT_CLUSTER_CAP = 2000

# Vectorized (Arrow/NumPy) stages are the DEFAULT at every k: unlike
# the IVF literal tier (pure codegen'd projections with a real
# crossover), the HOF folds here are interpreted even at k=8 — 8 x 64
# interpreted ops/row already costs more than the Arrow round trip
# (measured at sf0.1: q65 steady 2.1 s Arrow vs 2.4 s HOF at k=8; q66
# 3.4 s all-Arrow vs 4.3 s with HOF assignment).  vectorized=False
# keeps the pure-JVM twin for the bit-identity tests and for clusters
# without Python workers.


DEFAULT_TARGET_CLUSTER_SIZE = 250


def auto_k(
    df: DataFrame,
    target_cluster_size: int = DEFAULT_TARGET_CLUSTER_SIZE,
    n: int | None = None,
) -> int:
    """k sized to the corpus: ceil(n / target_cluster_size), min DEFAULT_K.

    SemDeDup pair enumeration is quadratic in min(cluster size, cap), so
    a FIXED k saturates the width cap as the corpus grows and the probe
    cost plateaus at cap^2 per cluster (measured: the sf1.0 replica
    corpus runs 62.9x the sf0.1 time at k=8, but 5.3x — linear tier —
    once k scales to n/250; PERFORMANCE.md round 3).

    Pass ``n`` when the corpus size is already known — e.g. from parquet
    footer metadata (``sources.testdata.table_row_count``, a driver-side
    footer read, no Spark job) — so sizing k costs nothing; without it
    this falls back to one distributed count() of the input (call once
    per corpus, not per query).
    """
    if n is None:
        n = df.count()
    return max(DEFAULT_K, -(-n // target_cluster_size))


def quantize(vec_col: str | Column) -> Column:
    """floor-quantize a float array onto the integer grid (BIGINT array)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(c, lambda x: F.floor(x.cast("double") * GRID).cast("long"))


def _dot(a: Column, b: Column) -> Column:
    """Exact BIGINT dot product (sequential fold, same order both engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kmeans_assign(
    df: DataFrame,
    k: int = DEFAULT_K,
    iters: int = DEFAULT_ITERS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    reliable: bool = False,
    checkpoint_dir: str | None = None,
    vectorized: bool = True,
    _with_q: bool = False,
) -> DataFrame:
    """Quantized Lloyd's k-means: returns (id, cluster_id, dist2).

    ``_with_q`` (internal, vectorized only): additionally return the
    quantized vector as ``__q`` — SemDeDup consumes the assignment
    next to the vector, and carrying it through the final Arrow
    projection is free where a join-back is a shuffle (r12).

    Deterministic by construction: init centroids are the quantized
    vectors of the k smallest ids; assignment ties break on cluster id
    (min over (dist2, cluster_id) structs); centroid updates are exact
    integer floor-averages.  A cluster that loses all members simply
    drops out (no re-seeding), identically in the SQL twin.

    ``vectorized=True`` (default, r9) runs each assignment pass as an
    int64 NumPy matmul per Arrow batch (clustering_vec.assign_arrow)
    against collected centroids (k x dim ints — the bounded-collect
    precedent) instead of the interpreted HOF folds — BIT-IDENTICAL
    by the module's integer-exactness contract (asserted against the
    HOF path in test_clustering.py) and faster at every measured k
    (see the module constant comment): the folds are not
    whole-stage-codegen'd and burn ~k x dim interpreted ops per point
    per pass.  The Lloyd UPDATE stays JVM-side (the posexplode partial
    agg is already scale-shaped)."""
    pts = df.select(F.col(id_col).alias("__id"), quantize(vec_col).alias("__q"))
    pts = pts.withColumn("__n2", _dot(F.col("__q"), F.col("__q")))
    # The iterative-algorithm persist idiom: every Lloyd pass (init scan,
    # iters x (assignment + per-dim join), final assignment) references
    # ``pts`` — without materialization each reference re-reads the
    # parquet AND re-runs the quantize/norm folds (6-8 scans in the q65/
    # q66 plans).  localCheckpoint stores the quantized ints once in
    # executor storage and truncates the lineage (measured: q65 steady
    # 1.83 -> 1.45 s, cold 8.4 -> 1.7 s at sf0.1).  Executor loss under
    # local checkpoint fails-and-retries the job; ``reliable=True``
    # swaps to durable parquet under ``checkpoint_dir``
    # (graph.py::_checkpointer) for cluster jobs where that tradeoff is
    # wrong.  Hashes are unchanged either way.
    from golang_cassandra_kafka_feed_spark.operators.graph import (
        _checkpointer,
    )

    pts = _checkpointer(pts, reliable, checkpoint_dir)(pts)

    # init = the k SMALLEST ids, selected by rank, not by `id < k`:
    # the filter form silently seeds fewer (or zero) centroids whenever
    # ids are not 0-based contiguous integers (e.g. a corpus whose
    # vec_ids start at 100 would cluster NOTHING).  orderBy+limit plans
    # as TakeOrderedAndProject — per-partition heaps, no global sort.
    cents = (
        pts.orderBy("__id")
        .limit(k)
        .select(F.col("__id").alias("__cid"), F.col("__q").alias("__cv"))
    )

    def _assign(centroids: DataFrame) -> DataFrame:
        scored = pts.crossJoin(
            F.broadcast(
                centroids.withColumn("__cn2", _dot(F.col("__cv"), F.col("__cv")))
            )
        ).withColumn(
            "__d2",
            F.col("__n2") + F.col("__cn2") - 2 * _dot(F.col("__q"), F.col("__cv")),
        )
        return (
            scored.groupBy("__id")
            .agg(F.min(F.struct("__d2", "__cid")).alias("__best"))
            .select(
                "__id",
                F.col("__best.__cid").alias("__cid"),
                F.col("__best.__d2").alias("__d2"),
            )
        )

    if vectorized:
        from golang_cassandra_kafka_feed_spark.operators.clustering_vec import (  # noqa: E501
            assemble_centroids,
            assign_arrow,
            collect_centroids,
        )

        # The centroid state lives driver-side between rounds anyway
        # (collect_centroids — the bounded k x dim collect the rounds
        # were already built on), so each Lloyd update collects the
        # per-(cluster, dim) floor-averages DIRECTLY and assembles the
        # matrix in NumPy (r12): the previous groupBy(cid) +
        # collect_list + array_sort aggregate existed only to build
        # arrays that collect_centroids immediately unpacked — one
        # whole shuffle/aggregation per round for a representation
        # change.  Values are the identical JVM floor(sum/count)
        # integers; ordering by (cid, pos) reproduces array_sort.
        cstate = collect_centroids(cents)
        for _ in range(iters):
            per_dim = assign_arrow(pts, *cstate, carry=("__q",)).select(
                "__cid", F.posexplode("__q").alias("__pos", "__v")
            )
            upd = (
                per_dim.groupBy("__cid", "__pos")
                .agg(
                    F.sum("__v").alias("__s"),
                    F.count(F.lit(1)).alias("__c"),
                )
                .select(
                    "__cid",
                    "__pos",
                    F.floor(F.col("__s").cast("double") / F.col("__c"))
                    .cast("long")
                    .alias("__cv_i"),
                )
            )
            cstate = assemble_centroids(upd.collect())
        # Final assignment against the last updated centroids, so the
        # returned dist2 matches the final geometry.
        final = assign_arrow(
            pts, *cstate, carry=("__q",) if _with_q else ()
        )
        cols = [
            F.col("__id").alias(id_col),
            F.col("__cid").alias("cluster_id"),
            F.col("__d2").alias("dist2"),
        ]
        return final.select(*cols, "__q") if _with_q else final.select(*cols)

    if _with_q:
        raise ValueError("_with_q requires vectorized=True")
    for _ in range(iters):
        # Lloyd update: per-(cluster, dim) exact integer floor-average.
        per_dim = (
            _assign(cents).join(pts, "__id")
            .select("__cid", F.posexplode("__q").alias("__pos", "__v"))
        )
        cents = (
            per_dim.groupBy("__cid", "__pos")
            .agg(F.sum("__v").alias("__s"), F.count(F.lit(1)).alias("__c"))
            .withColumn(
                "__cv_i",
                F.floor(F.col("__s").cast("double") / F.col("__c")).cast("long"),
            )
            .groupBy("__cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__cv_i"))),
                    lambda s: s["__cv_i"],
                ).alias("__cv")
            )
        )

    # Final assignment against the last updated centroids, so the
    # returned dist2 matches the final geometry.
    return _assign(cents).select(
        F.col("__id").alias(id_col),
        F.col("__cid").alias("cluster_id"),
        F.col("__d2").alias("dist2"),
    )


def semantic_dedup_pairs(
    df: DataFrame,
    k: int = DEFAULT_K,
    iters: int = DEFAULT_ITERS,
    threshold: float = DEFAULT_SIM_THRESHOLD,
    cluster_cap: int = DEFAULT_CLUSTER_CAP,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    reliable: bool = False,
    checkpoint_dir: str | None = None,
    vectorized: bool = True,
) -> DataFrame:
    """SemDeDup: near-duplicate pairs *within* k-means clusters.

    Returns (keep_id, drop_id, sim): pairs of same-cluster vectors with
    quantized-cosine similarity above ``threshold``; keep_id is the
    smaller id.  ``cluster_cap`` bounds pair enumeration per cluster
    (members ranked by id — the LSH bucket-cap guard), so a degenerate
    mega-cluster cannot go quadratic.

    Cosine runs on the quantized integers: dot and norms are exact, the
    final divide/sqrt is a deterministic IEEE op on identical inputs in
    both engines, so the >threshold cut reproduces exactly.

    Structure (the lesson from minhash_lsh_candidates' r2 rewrite): pair
    ids are enumerated by collecting ids per cluster and double-exploding
    — NOT a self-join of the assignment, which would reference the whole
    Lloyd pipeline twice with differently-aliased branches Catalyst
    cannot exchange-reuse (measured ~2x the stage cost here too).  The
    width cap is a slice of the sorted id array (same smallest-ids
    semantics as a row_number cap, minus the window shuffle).  Vectors
    are joined back per side from the raw quantized scan, with each
    side's norm computed once per id, not once per pair.
    """
    if vectorized:
        # One applyInPandas per cluster: members shuffle ONCE by
        # cluster_id (narrow id+vector rows) and the whole intra-
        # cluster similarity matrix comes from a single int64 matmul —
        # the join form below ships every vector once per PAIR.  The
        # shared rounding projection stays JVM-side, so pair set and
        # values are bit-identical (test_clustering.py).  The quantized
        # vector rides through the final assignment projection
        # (_with_q) instead of being re-quantized from the raw scan and
        # joined back by id (r12 — that join was a second corpus scan
        # plus a shuffle for rows the assignment already held).
        from golang_cassandra_kafka_feed_spark.operators.clustering_vec import (  # noqa: E501
            cluster_pairs_arrow,
        )

        members = kmeans_assign(
            df, k=k, iters=iters, vec_col=vec_col, id_col=id_col,
            reliable=reliable, checkpoint_dir=checkpoint_dir,
            vectorized=True, _with_q=True,
        ).select(F.col(id_col).alias("__id"), "cluster_id", "__q")
        return (
            cluster_pairs_arrow(members, threshold, cluster_cap)
            .select(
                "keep_id",
                "drop_id",
                (F.round(F.col("__sim") * 10000) / 10000).alias("sim"),
            )
            .orderBy("keep_id", "drop_id")
        )
    assigned = kmeans_assign(
        df, k=k, iters=iters, vec_col=vec_col, id_col=id_col,
        reliable=reliable, checkpoint_dir=checkpoint_dir,
        vectorized=False,
    )
    pair_ids = (
        assigned.groupBy("cluster_id")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.col(id_col))), 1, cluster_cap
            ).alias("__ids")
        )
        .filter(F.size("__ids") > 1)
        .select(F.explode("__ids").alias("keep_id"), "__ids")
        .select("keep_id", F.explode("__ids").alias("drop_id"))
        .filter(F.col("keep_id") < F.col("drop_id"))
    )
    pts = df.select(
        F.col(id_col).alias("__id"), quantize(vec_col).alias("__q")
    ).withColumn("__n", F.sqrt(_dot(F.col("__q"), F.col("__q")).cast("double")))
    # Both pair sides (a/b below) reference this frame; materialize once
    # (same idiom as kmeans_assign's pts) so the quantize/norm pass and
    # parquet scan don't run per side (q66 cold 11.9 -> 4.6 s at sf0.1).
    from golang_cassandra_kafka_feed_spark.operators.graph import (
        _checkpointer,
    )

    pts = _checkpointer(pts, reliable, checkpoint_dir)(pts)
    a = pts.select(
        F.col("__id").alias("keep_id"),
        F.col("__q").alias("__qa"),
        F.col("__n").alias("__na"),
    )
    b = pts.select(
        F.col("__id").alias("drop_id"),
        F.col("__q").alias("__qb"),
        F.col("__n").alias("__nb"),
    )
    sim = _dot(F.col("__qa"), F.col("__qb")).cast("double") / (
        F.col("__na") * F.col("__nb")
    )
    return (
        pair_ids.join(a, "keep_id")
        .join(b, "drop_id")
        .withColumn("__sim", sim)
        .filter(F.col("__sim") > threshold)
        .select(
            "keep_id",
            "drop_id",
            (F.round(F.col("__sim") * 10000) / 10000).alias("sim"),
        )
        .orderBy("keep_id", "drop_id")
    )
