"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference feed pipeline (KadCode/golang-cassandra-kafka-feed).

Architecture (Spark-first, see SURVEY.md):

- ``sources``   — pinned-schema loaders for the testdata star schema and the
                  feed-domain tables; Kafka-shaped batch/streaming sources.
- ``plans``     — the declared query inventory (SURVEY.md §2.6 Q01-Q30 plus
                  extension queries), each as a DataFrame builder together
                  with its ANSI-SQL DuckDB oracle.
- ``operators`` — reusable composite operators: top-k per key, as-of join,
                  range join, sessionization, dedup family (exact / MinHash
                  LSH / SimHash / n-gram Jaccard / embedding cosine),
                  similarity search, text analytics, multimodal plumbing.
- ``functions`` — scalar helpers (validation filters, anonymization,
                  latency math) and aggregate helpers (exact percentile,
                  trimmed mean, throughput).
- ``streaming`` — the Structured Streaming fan-out pipeline mirroring the
                  reference worker (cmd/worker/worker.go) plus windowed
                  aggregations.
- ``feed``      — the StoreInterface-equivalent API
                  (internal/store/cassandra.go:27-36) as DataFrame-native
                  functions over Parquet-backed tables.

Everything is built on the public PySpark 4 DataFrame/SQL API; no RDD code,
no custom Catalyst rules (SURVEY.md §4: built-ins cover the declared surface).
"""

from golang_cassandra_kafka_feed_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
