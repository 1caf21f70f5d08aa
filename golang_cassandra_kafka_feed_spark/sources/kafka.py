"""Kafka-shaped sources/sinks.

The wire contract mirrors the reference exactly (FIXTURES.md §1):
``key: binary`` (= b"post_created", httphandlers.go:155-158),
``value: binary`` (JSON-encoded post with fields id/author_id/body/created —
models.go:10-15 JSON tags), ``timestamp: timestamp``.

Real Kafka needs the spark-sql-kafka connector jar on the classpath; this
build gates it behind a capability check and provides a file-based
substitute with the identical schema, so the entire pipeline
(filters → from_json → fan-out join → idempotent sink) is exercised
without a broker — the same role MockKafka plays in the reference's tests
(internal/broker/mock_kafka.go:22-47).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# JSON layout of the Kafka message value (models.go:10-15 json tags).
POST_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("author_id", T.StringType(), True),
        T.StructField("body", T.StringType(), True),
        T.StructField("created", T.TimestampType(), True),
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
    ]
)


def kafka_available(spark: SparkSession) -> bool:
    """True if the spark-sql-kafka connector is on the classpath."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_source_options(
    brokers: str,
    topic: str,
    group_id: str = "worker-group",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The exact option map handed to ``.format("kafka")`` — a pure
    function so the plumbing is unit-testable without the connector jar
    (the sandbox has no Kafka jar or network; the only untested line left
    is the ``.load()`` itself).  Mirrors the worker's consumer config
    (internal/broker/kafka.go:81-99: group worker-group, topic
    feed-topic); MinBytes/MaxBytes batch sizing maps to
    maxOffsetsPerTrigger; the 1 s offset-commit interval (kafka.go:92) is
    superseded by checkpointing (stronger: replay-exact)."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "kafka.group.id": group_id,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_sink_options(brokers: str, topic: str) -> dict[str, str]:
    """Producer-side option map (kafka.go:33-73 / the async batched bench
    producer kafka_producer.go:34-39)."""
    return {"kafka.bootstrap.servers": brokers, "topic": topic}


def read_stream_kafka(
    spark: SparkSession,
    brokers: str,
    topic: str,
    group_id: str = "worker-group",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming Kafka source — see kafka_source_options for the config
    contract."""
    if not kafka_available(spark):
        raise NotImplementedError(
            "spark-sql-kafka connector jar not on classpath; use "
            "read_stream_envelope_files() for a broker-less pipeline"
        )
    return (
        spark.readStream.format("kafka")
        .options(
            **kafka_source_options(
                brokers,
                topic,
                group_id,
                max_offsets_per_trigger=max_offsets_per_trigger,
            )
        )
        .load()
        .select("key", "value", "timestamp")
    )


def write_kafka(df: DataFrame, brokers: str, topic: str) -> None:
    """Batch Kafka sink — see kafka_sink_options for the config contract."""
    if not kafka_available(df.sparkSession):
        raise NotImplementedError(
            "spark-sql-kafka connector jar not on classpath"
        )
    (
        df.write.format("kafka")
        .options(**kafka_sink_options(brokers, topic))
        .save()
    )


def read_stream_envelope_files(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based streaming source with the Kafka envelope schema — the
    broker-less test double (one parquet file per 'delivery').

    ``max_files_per_trigger`` is the file-source twin of the Kafka
    source's ``maxOffsetsPerTrigger`` rate limit — it bounds a
    micro-batch, which also makes mid-stream stop/resume exercisable."""
    reader = spark.readStream.schema(ENVELOPE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def posts_to_envelopes(posts: DataFrame) -> DataFrame:
    """Serialize posts into Kafka envelopes — the producer path
    (httphandlers.go:147-158: json.Marshal + key 'post_created')."""
    return posts.select(
        F.lit(b"post_created").alias("key"),
        F.to_json(
            F.struct(
                F.col("post_id").alias("id"),
                F.col("author_id").alias("author_id"),
                F.col("body").alias("body"),
                F.date_format(
                    F.col("created_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
                ).alias("created"),
            )
        )
        .cast("binary")
        .alias("value"),
        F.current_timestamp().alias("timestamp"),
    )
