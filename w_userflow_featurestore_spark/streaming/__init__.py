from w_userflow_featurestore_spark.streaming.ingest import (
    bronze_ingest,
    parse_kafka_events,
    read_event_stream,
    streaming_sessionize,
)

__all__ = ["bronze_ingest", "parse_kafka_events", "read_event_stream",
           "streaming_sessionize"]
