"""Loaders for the driver-generated testdata star schema.

Tables and dtypes are pinned from the parquet footers (FIXTURES.md §2) —
never ``inferSchema`` — mirroring the reference's migration-managed fixed
schemas (internal/store/cassandra.go:106-132).

``events.ts`` is physically INT64 TIMESTAMP(NANOS), which the Spark parquet
reader rejects outright ([PARQUET_TYPE_ILLEGAL]).  We read the physical int64
with an explicit schema and convert ns -> us with *integer* division
(``ts div 1000``): float division would round-to-nearest at the double
precision limit (~2^53) and drift by 1us from DuckDB's truncating cast,
breaking oracle hash parity (SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Physical read schema for the ns-timestamp table (see module docstring).
_EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def _parquet_parts(path: str) -> list[str]:
    """Resolve a table path to its parquet part files (a single .parquet
    file, or the sorted *.parquet parts of a directory table such as the
    synthesized scale SFs) — the shared resolver for every driver-side
    footer probe in this module."""
    import glob
    import os

    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return [path] if os.path.exists(path) else []


def _has_nanos_ts(path: str) -> bool:
    """Cheap driver-side footer probe (no Spark job) for TIMESTAMP(NANOS)."""
    try:
        import pyarrow.parquet as pq

        parts = _parquet_parts(path)
        if not parts:
            return False
        # all parts share one schema — probe the first
        field = pq.read_schema(parts[0]).field("ts")
        return getattr(field.type, "unit", None) == "ns"
    except Exception:
        return False


def table_row_count(sf_dir: str, name: str) -> int | None:
    """Exact row count from parquet footer metadata — a driver-side
    read of the file footers (no Spark job, no data scan).  Parquet
    footers store num_rows per file; summing them is exact for any
    non-filtered table.  Used to size corpus-dependent knobs (e.g.
    SemDeDup's auto_k) without paying a full count() pass over 100 TB.
    Returns None when the table cannot be footer-probed (caller falls
    back to a distributed count)."""
    try:
        import os

        import pyarrow.parquet as pq

        parts = _parquet_parts(os.path.join(sf_dir, f"{name}.parquet"))
        if not parts:
            return None
        return sum(pq.ParquetFile(p).metadata.num_rows for p in parts)
    except Exception:
        return None


# (appId, sf_dir, name) -> DataFrame.  Testdata is read-only, so the
# reader plan (and its file listing) can be built once per session and
# reused across the whole query sweep.  The key carries the Spark
# APPLICATION id, not id(spark): a stopped session's python object can
# be garbage-collected and its address recycled by a NEW session, which
# would then hit cached plans bound to the dead context ("SparkContext
# has been shut down").  applicationId is unique per context.
_READER_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with its pinned schema.

    The session timezone is pinned to UTC here so results are stable even
    when the caller (e.g. the verify driver) built the session without it.

    Plain ``spark.read.parquet`` everywhere except ``events`` (ns timestamp
    workaround).  All reads stay fully pushdown-capable: filters and column
    pruning reach the parquet scan because the conversion is a projection,
    not an opaque UDF.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Parquet timestamp columns written without isAdjustedToUTC (plain
    # `timestamp[us]`, how the driver-generated testdata is written) would
    # otherwise read as TIMESTAMP_NTZ under Spark 4's inference.  Pin the
    # legacy mapping so every table reads as plain TIMESTAMP: value-identical
    # under the UTC session pin above, schema-stable for the oracle compare,
    # and scan-native (no cast that would block predicate pushdown).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _READER_CACHE.get(key)
    if cached is not None:
        return cached
    path = f"{sf_dir}/{name}.parquet"
    if name == "events" and _has_nanos_ts(path):
        raw = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(path)
        df = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(path)
    _READER_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for the SQL surface)."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
