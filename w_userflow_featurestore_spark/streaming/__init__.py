from w_userflow_featurestore_spark.streaming.ingest import (
    bronze_ingest,
    debug_sink,
    parse_kafka_events,
    parse_with_dead_letter,
    read_event_stream,
    stream_upsert,
    streaming_dedup,
    streaming_drift_monitor,
    streaming_attribution,
    streaming_scd2,
    streaming_sessionize,
    streaming_window_counts,
)
from w_userflow_featurestore_spark.streaming.stateful import (
    close_session,
    fold_events,
    stateful_sessionize,
)

__all__ = ["bronze_ingest", "debug_sink",
           "parse_kafka_events", "parse_with_dead_letter", "read_event_stream",
           "stream_upsert", "streaming_dedup", "streaming_drift_monitor",
           "streaming_attribution", "streaming_scd2", "streaming_sessionize",
           "streaming_window_counts",
           "stateful_sessionize", "fold_events",
           "close_session"]
