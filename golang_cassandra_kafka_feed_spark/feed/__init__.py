from golang_cassandra_kafka_feed_spark.feed.api import (
    FEED_SCHEMA,
    FOLLOW_SCHEMA,
    POST_SCHEMA,
    USER_SCHEMA,
    FeedStore,
)

__all__ = [
    "FeedStore",
    "USER_SCHEMA",
    "FOLLOW_SCHEMA",
    "POST_SCHEMA",
    "FEED_SCHEMA",
]
