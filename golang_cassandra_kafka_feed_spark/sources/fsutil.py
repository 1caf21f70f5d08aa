"""URI-aware filesystem helpers for table stores.

``os.path.exists`` is the wrong existence probe for a Spark table path:
it only understands the driver's local filesystem, so on the HDFS/S3
deployments these stores target it returns False for every URI and a
store would silently treat ALL of its state as empty — accepting every
duplicate and breaking replay idempotency without a single error.
These helpers go through the Hadoop FileSystem API bound to the
session's configuration (works for file://, hdfs://, s3a://, ...),
falling back to ``os.path`` only if the JVM gateway is unavailable.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def path_exists(spark: SparkSession, path: str) -> bool:
    try:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)  # type: ignore[union-attr]
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())  # type: ignore[union-attr]
    except Exception:
        # JVM gateway genuinely unavailable — local-path fallback only
        import os

        return os.path.exists(path)
    # NOT wrapped: a transient remote error (credential refresh, network
    # timeout) must PROPAGATE, not read as "missing" — a False here is
    # what lets a store treat its populated state as empty and commit
    # duplicates.
    return bool(fs.exists(p))


def write_marker(spark: SparkSession, path: str, content: str = "") -> None:
    """Write a tiny commit-marker file through the Hadoop FS API
    (file://, hdfs://, s3a://, ...).  Write the marker LAST, after
    every step it vouches for: ``path_exists(marker)`` then means the
    whole multi-step operation completed, and a crash anywhere before
    leaves no marker so the caller redoes the operation from scratch
    (the minhash-index meta pattern, reusable for composite steps like
    build-then-delete)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)  # type: ignore[union-attr]
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())  # type: ignore[union-attr]
    out = fs.create(p, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_marker(spark: SparkSession, path: str) -> str | None:
    """Read a marker's content back (None when absent) — the resolve
    side of ``write_marker``, for pointer markers whose CONTENT is the
    commit (e.g. the streaming rollup's _CURRENT version)."""
    if not path_exists(spark, path):
        return None
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)  # type: ignore[union-attr]
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())  # type: ignore[union-attr]
    stream = fs.open(p)
    try:
        # one JVM call (Java 11+ InputStream API) — the per-byte
        # read() loop costs one Py4J round trip PER BYTE (review-found)
        return bytes(stream.readAllBytes()).decode("utf-8")
    finally:
        stream.close()
