"""Arrow/NumPy vectorized stages for the clustering family — the q66
(SemDeDup) twin of the IVF Arrow assignment tier (similarity.py).

The clustering module's exactness contract is INTEGER arithmetic:
vectors are floor-quantized onto a BIGINT grid, so dot products,
squared norms, and Lloyd distances are exact int64 values far below
2^53.  That makes the vectorized paths here hash-IDENTICAL to the
higher-order-function folds by construction — int64 matmul/einsum in
NumPy computes the same exact integers in any summation order (no
fp-epsilon caveat like the IVF tier's float cosines), and the one
float op per pair (``dot / (na * nb)``) is the same two IEEE binary64
operations on the same values in both paths.

Why this exists: the HOF ``aggregate(zip_with(...))`` folds are
interpreted, not whole-stage-codegen'd, so k-means assignment costs
~k x dim interpreted ops per point per Lloyd pass and SemDeDup pair
scoring ~dim interpreted ops per candidate pair — the q66 plan ran
8.05 s at sf0.1 with most of it in those folds.  Here assignment is
one int64 matmul per Arrow batch against a broadcast centroid matrix,
and pair scoring one gram-matrix matmul per CLUSTER (each vector
ships once per cluster instead of once per pair).  Measured: q66
steady 8.05 s -> 2.4 s at sf0.1, 24.8 s -> ~3 s at sf1.0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collect_centroids(cents: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Materialize the (bounded: k rows of dim ints) centroid frame as
    ``(cids int64[k], C int64[k, dim])`` sorted by cid ascending — the
    same bounded-collect precedent as the IVF codebook and the Bloom
    bit-set.  Exact integers, so the collect introduces no value
    drift whatsoever."""
    rows = sorted(
        cents.select("__cid", "__cv").collect(),
        key=lambda r: r["__cid"],  # Row attr access rejects __-names
    )
    cids = np.array([r["__cid"] for r in rows], dtype=np.int64)
    mat = np.array([r["__cv"] for r in rows], dtype=np.int64)
    return cids, mat


def assemble_centroids(rows) -> tuple[np.ndarray, np.ndarray]:
    """(__cid, __pos, __cv_i) rows -> the ``collect_centroids``
    contract ``(cids ascending, C int64[k, dim])``.  The rows are the
    Lloyd update's exact JVM floor-averages collected per (cluster,
    dim); sorting by (cid, pos) reproduces exactly the array the old
    collect_list + array_sort aggregate built, minus that aggregate's
    shuffle (r12)."""
    by_cid: dict[int, dict[int, int]] = {}
    for r in rows:
        by_cid.setdefault(r["__cid"], {})[r["__pos"]] = r["__cv_i"]
    cids = np.array(sorted(by_cid), dtype=np.int64)
    mat = np.array(
        [[by_cid[c][p] for p in sorted(by_cid[c])] for c in cids],
        dtype=np.int64,
    )
    return cids, mat


def assign_arrow(
    pts: DataFrame,
    cids: np.ndarray,
    mat: np.ndarray,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Vectorized Lloyd assignment over ``pts`` (__id, __q, __n2):
    ``d2 = n2 + cn2 - 2 (V @ C.T)`` in exact int64, argmin with the
    (d2, cid) tie-break — cids ascending makes NumPy's
    first-occurrence argmin equal the HOF path's
    ``min(struct(__d2, __cid))``.  Returns (__id, __cid, __d2),
    the `_assign` contract.

    ``carry`` names extra ``pts`` columns to project through alongside
    the assignment (r12): the Lloyd update and the SemDeDup member
    build both need ``__q`` next to the assignment, and since the
    assignment is a PROJECTION over ``pts`` the vector can ride along
    for free — the join-back by ``__id`` those callers used to pay
    (one shuffle or broadcast per iteration) carried no information
    the projection didn't already have."""
    spark = pts.sparkSession
    cn2 = np.einsum("ij,ij->i", mat, mat)  # exact int64 norms
    bc = spark.sparkContext.broadcast((cids, mat, cn2))

    @F.pandas_udf("struct<__cid: long, __d2: long>")
    def _assign(qs: pd.Series, n2s: pd.Series) -> pd.DataFrame:
        ids, m, c2 = bc.value
        if len(qs) == 0:
            return pd.DataFrame({"__cid": [], "__d2": []}).astype(
                {"__cid": "int64", "__d2": "int64"}
            )
        v = np.stack(qs.to_numpy()).astype(np.int64, copy=False)
        d2 = (
            n2s.to_numpy().astype(np.int64)[:, None]
            + c2[None, :]
            - 2 * (v @ m.T)
        )
        idx = d2.argmin(axis=1)
        return pd.DataFrame(
            {
                "__cid": ids[idx],
                "__d2": d2[np.arange(len(idx)), idx],
            }
        )

    return pts.select(
        "__id", *carry, _assign("__q", "__n2").alias("__best")
    ).select(
        "__id",
        *carry,
        F.col("__best.__cid").alias("__cid"),
        F.col("__best.__d2").alias("__d2"),
    )


def cluster_pairs_arrow(
    members: DataFrame,
    threshold: float,
    cluster_cap: int,
) -> DataFrame:
    """Intra-cluster pair scoring as ONE ``applyInPandas`` per cluster:
    ``members`` is (cluster_id, __id, __q); each group ships its
    vectors ONCE (m x dim ints), scores the full similarity matrix
    with an int64 matmul, and emits the above-threshold upper-triangle
    pairs — versus the join form, which ships every vector once PER
    PAIR (~m/2 times) through the pair join.

    Exactness: ``G = V @ V.T`` is exact int64; norms are
    ``sqrt(float64(exact int))`` (IEEE sqrt, correctly rounded — the
    same value the JVM's ``F.sqrt(dot.cast(double))`` produces); the
    similarity is the same divide on the same values.  The cap is the
    same smallest-ids slice as the HOF path (ids sorted ascending,
    first ``cluster_cap``).  Output (keep_id, drop_id, __sim RAW) —
    the caller applies the shared JVM rounding projection, so the
    emitted pair set and values are bit-identical to the HOF form
    (asserted in test_clustering.py).

    100 TB shape: one shuffle of the MEMBER rows by cluster (narrow:
    id + quantized vector), group width bounded by ``cluster_cap`` so
    the per-task score matrix is at most cap^2 floats (~32 MB at the
    2000 default) — no pair-row shuffle ever materializes."""

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id").head(cluster_cap)
        m = len(pdf)
        if m < 2:
            return pd.DataFrame(
                {"keep_id": [], "drop_id": [], "__sim": []}
            ).astype(
                {"keep_id": "int64", "drop_id": "int64", "__sim": "float64"}
            )
        ids = pdf["__id"].to_numpy()
        v = np.stack(pdf["__q"].to_numpy()).astype(np.int64, copy=False)
        g = v @ v.T  # exact int64 gram matrix
        nm = np.sqrt(np.einsum("ij,ij->i", v, v).astype(np.float64))
        s = g.astype(np.float64) / np.outer(nm, nm)
        iu, ju = np.triu_indices(m, k=1)
        keep = s[iu, ju] > threshold
        return pd.DataFrame(
            {
                "keep_id": ids[iu[keep]],
                "drop_id": ids[ju[keep]],
                "__sim": s[iu[keep], ju[keep]],
            }
        )

    return members.groupBy("cluster_id").applyInPandas(
        score, "keep_id long, drop_id long, __sim double"
    )


