from golang_cassandra_kafka_feed_spark.plans.queries import QUERIES
from golang_cassandra_kafka_feed_spark.plans.oracles import ORACLES

__all__ = ["QUERIES", "ORACLES"]
