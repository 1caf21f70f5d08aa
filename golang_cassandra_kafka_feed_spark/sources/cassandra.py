"""Cassandra-shaped sink/source, connector-gated.

The reference's system of record is Cassandra (internal/store/cassandra.go;
tables migrations/cassandra/000001_init_tables.up.cql:1-37).  In the Spark
engine, Cassandra is a *serving sink* choice, not the compute store: all
correctness work runs against filesystem-backed tables (SURVEY.md §7.0) so
the DuckDB oracle can check results anywhere, and this module forwards to
the spark-cassandra-connector only when its jar is on the classpath (same
gating pattern as sources/kafka.py for the Kafka connector).

Mapping of the reference's write/read paths when the connector is present:

- ``AddToFeed`` / fan-out inserts (feed.go:129-141)  -> ``write_table`` of
  the feed DataFrame to ``feed_by_user`` — the connector turns each row
  into an upsert on the CQL primary key ((user_id), created_at, post_id),
  which IS the reference's idempotency mechanism (cql:30-37).
- ``GetFeed`` (feed.go:143-171) -> ``read_table`` + filter on user_id; the
  connector pushes partition-key predicates down to a single-partition CQL
  query, mirroring the reference's access path.

QUORUM consistency (cassandra.go:58) maps to the connector options
``spark.cassandra.{input,output}.consistency.level=QUORUM``, passed here by
default so write/read semantics match the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_PROVIDER = "org.apache.spark.sql.cassandra"
_PROVIDER_CLASS = "org.apache.spark.sql.cassandra.DefaultSource"


def cassandra_available(spark: SparkSession) -> bool:
    """True if the spark-cassandra-connector is on the classpath."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(_PROVIDER_CLASS)
        return True
    except Exception:
        return False


def cassandra_options(
    keyspace: str, table: str, consistency: str = "QUORUM", write: bool = False
) -> dict[str, str]:
    """The exact option map handed to the connector format — pure function
    so the plumbing is unit-testable without the jar (the sandbox has no
    connector jar or network; only the ``.load()``/``.save()`` line itself
    stays unexercised).  QUORUM default mirrors cassandra.go:58."""
    side = "output" if write else "input"
    return {
        "keyspace": keyspace,
        "table": table,
        f"spark.cassandra.{side}.consistency.level": consistency,
    }


def write_table(
    df: DataFrame,
    keyspace: str,
    table: str,
    consistency: str = "QUORUM",
) -> None:
    """Append a DataFrame to a Cassandra table (row upserts on the CQL
    primary key — the reference's idempotent insert, feed.go:129-141)."""
    if not cassandra_available(df.sparkSession):
        raise NotImplementedError(
            "spark-cassandra-connector jar not on classpath; the "
            "filesystem-backed FeedStore (feed/api.py) is the default sink"
        )
    (
        df.write.format(_PROVIDER)
        .options(**cassandra_options(keyspace, table, consistency, write=True))
        .mode("append")
        .save()
    )


def read_table(
    spark: SparkSession,
    keyspace: str,
    table: str,
    consistency: str = "QUORUM",
) -> DataFrame:
    """Read a Cassandra table; partition-key filters applied by the caller
    push down to single-partition CQL scans (feed.go:143-171)."""
    if not cassandra_available(spark):
        raise NotImplementedError(
            "spark-cassandra-connector jar not on classpath; the "
            "filesystem-backed FeedStore (feed/api.py) is the default source"
        )
    return (
        spark.read.format(_PROVIDER)
        .options(**cassandra_options(keyspace, table, consistency))
        .load()
    )
