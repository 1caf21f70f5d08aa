"""Deterministic sampling/splitting for training-data pipelines.

Core property: the split is a PURE FUNCTION of the row id (md5 of the id
string + salt), not of partitioning, row order, cluster size, or a seeded
RNG — so a 100 TB corpus re-splits identically after repartitioning,
compaction, or incremental append, and any engine (the DuckDB oracle
included) reproduces it bit-for-bit.  ``df.randomSplit``/``sampleBy`` by
contrast depend on partition layout and are not cross-engine checkable.

md5 (not xxhash64) because the oracle contract needs a hash both Spark and
DuckDB implement identically over the same UTF-8 bytes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO32 = float(1 << 32)


def hash_fraction(id_col: Column | str, salt: str = "split") -> Column:
    """Uniform [0, 1) fraction from the first 8 md5 hex digits of
    ``str(id) + ':' + salt``.  Change the salt to draw an independent
    split from the same ids."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.concat(c.cast("string"), F.lit(":" + salt))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") / _TWO32


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label by cumulative weight boundaries over
    the hash fraction.  Weights need not sum to exactly 1; the last label
    absorbs the remainder."""
    frac = hash_fraction(id_col, salt)
    expr = F.lit(weights[-1][0])
    cum = 0.0
    branches = []
    for label, w in weights[:-1]:
        cum += w
        branches.append((cum, label))
    for bound, label in reversed(branches):
        expr = F.when(frac < bound, F.lit(label)).otherwise(expr)
    return df.withColumn(split_col, expr)


def mixture_downsample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-group downsampling to target mixture rates: a row
    survives iff its hash fraction is below its group's rate.  The corpus
    mixture knob (e.g. keep 10% of crawl, 100% of curated sources) —
    stable under repartitioning and append, reproducible by the oracle."""
    rate = F.lit(default_rate)
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g, F.lit(r)).otherwise(rate)
    return df.filter(hash_fraction(id_col, salt) < rate)


def sequence_pack(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    size_col: str,
    budget: int,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Assign rows to fixed-budget bins by running size within each key
    group (token-budget sequence packing): ``bin = floor(cumsum_exclusive
    (size) / budget)``.  Greedy-by-order packing as one window cumsum —
    a single shuffle on the keys, no iteration; rows larger than the
    budget get a bin of their own plus spillover, matching greedy
    concatenation semantics.

    ``keys`` must be high-cardinality relative to the cluster: each key
    group is one window partition = one task.  For a corpus with few
    natural groups, add a deterministic shard key (e.g.
    ``pmod(xxhash64(id), n_shards)``) to the keys — packing is per-group
    greedy anyway, so sharding only changes which docs share a bin, not
    the budget guarantee."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.withColumn(
        bin_col, F.floor(prior / budget).cast("long")
    )


def per_key_cap(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    n: int,
) -> DataFrame:
    """Keep at most ``n`` rows per key group, best-first by ``order_by``
    (domain/source caps against over-represented slices).  One shuffle on
    the keys, and it is skew-safe even with FEW keys: Spark plans a
    Partial WindowGroupLimit before the exchange (each map task keeps at
    most ``n`` rows per key), so the shuffle moves <= n x keys x tasks
    rows — not the raw group — and the Final pass sees tiny input
    (asserted in tests/test_physical_plans.py)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def temperature_mixture_rates(
    df: DataFrame,
    group_col: str,
    target_frac: float = 0.5,
) -> DataFrame:
    """Per-source keep rates for alpha=0.5 temperature resampling
    (XLM-R-style: p_s ∝ sqrt(n_s), flattening the source distribution so
    rare sources are upsampled relative to their share).

    Returns (group, n_docs, rate): rate_s = min(1, target_frac * N *
    (sqrt(n_s)/S) / n_s) with S = sum of sqrt(n_s).  alpha is FIXED at
    0.5 because sqrt is IEEE-correctly-rounded — identical in every
    engine — while pow(x, alpha) is not guaranteed to be, which would
    put oracle parity at the mercy of libm ulps.  S is a sequential
    left-fold over the sources in sorted name order (F.aggregate here,
    list_reduce in the DuckDB twin), so even the double summation order
    is pinned.

    100 TB posture: one exact count per source (map-side partial agg),
    a driver-size fold over the handful of sources, and the rate table
    broadcasts back — the corpus itself is scanned once and never
    shuffled.
    """
    stats = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    folded = stats.select(
        F.array_sort(
            F.collect_list(F.struct(F.col(group_col), F.col("n_docs")))
        ).alias("gs"),
        F.sum("n_docs").alias("total"),
    ).select(
        "gs",
        "total",
        F.aggregate(
            F.transform("gs", lambda g: F.sqrt(g["n_docs"].cast("double"))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("s_sum"),
    )
    rates = folded.select(
        F.explode("gs").alias("g"), "total", "s_sum"
    ).select(
        F.col("g")[group_col].alias(group_col),
        F.col("g")["n_docs"].alias("n_docs"),
        F.least(
            F.lit(1.0),
            F.lit(target_frac)
            * F.col("total").cast("double")
            * (
                F.sqrt(F.col("g")["n_docs"].cast("double")) / F.col("s_sum")
            )
            / F.col("g")["n_docs"].cast("double"),
        ).alias("rate"),
    )
    return rates


def temperature_downsample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    target_frac: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """Deterministic alpha=0.5 temperature resampling: each row survives
    iff its md5 hash fraction is below its source's temperature rate
    (temperature_mixture_rates).  Reproducible under repartitioning and
    append — the same contract as hash_split / mixture_downsample."""
    rates = temperature_mixture_rates(df, group_col, target_frac)
    return (
        df.join(F.broadcast(rates.select(group_col, "rate")), group_col)
        .filter(hash_fraction(id_col, salt) < F.col("rate"))
        .drop("rate")
    )
