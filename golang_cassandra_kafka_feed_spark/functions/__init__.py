from golang_cassandra_kafka_feed_spark.functions.scalars import (
    anonymize,
    latency_ms,
    parse_int_with_default,
    valid_length,
)
from golang_cassandra_kafka_feed_spark.functions.stats import (
    exact_percentiles,
    status_class_counts,
    throughput_per_bucket,
    trimmed_mean,
)

__all__ = [
    "anonymize",
    "latency_ms",
    "parse_int_with_default",
    "valid_length",
    "exact_percentiles",
    "trimmed_mean",
    "throughput_per_bucket",
    "status_class_counts",
]
