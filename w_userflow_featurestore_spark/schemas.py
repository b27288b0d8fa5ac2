"""Single source of truth for table schemas (SURVEY.md §1.2).

The reference declares each table's schema inline as SQL DDL strings in
seven separate job scripts (e.g. reference src/spark/bronze/
bronze_load_raw_data.py:41-63, src/spark/silver/silver_user_session_events.py:22-50).
Here one registry module owns every StructType so jobs, tests and the
streaming layer can never drift apart.

Two families:
- ``TESTDATA_*``  — the driver-generated fixture tables under /root/testdata
  (TPC-H-ish star schema + a generic `events` stream; see TESTDATA.md).
- ``SESSION_SCHEMA`` / ``*_DAILY`` — the engine's own derived layers
  (silver session grain, gold daily-feature grains).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Fixture (bronze-input) tables
# --------------------------------------------------------------------------

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),   # signup|click|view|purchase|error
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),        # JSON payload, e.g. {"k": 87}
])

# Schema for the JSON `props` payload — parsed JVM-side with from_json,
# mirroring the reference's schema-ful Kafka value decode
# (reference src/spark/bronze/bronze_load_raw_data.py:14-31,74-75).
PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

EMBEDDINGS_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.IntegerType()),
])

# --------------------------------------------------------------------------
# Derived layers (engine-owned)
# --------------------------------------------------------------------------

# Silver grain: one row per session (reference grain: one row per 9-key
# group, silver_user_session_events.py:111-113). Our sessions are derived
# by gap-based sessionization (no client session_id exists in the generic
# event stream), then classified by the same ordered state machine.
SESSION_SCHEMA = T.StructType([
    T.StructField("session_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("datetime", T.DateType()),        # partition column (days grain)
    T.StructField("start_time", T.TimestampType()),
    T.StructField("end_time", T.TimestampType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("entry_event_type", T.StringType()),
    T.StructField("sum_value", T.DoubleType()),
    T.StructField("max_value", T.DoubleType()),
    T.StructField("n_items", T.LongType()),
    T.StructField("seen_purchase", T.IntegerType()),
    T.StructField("seen_error", T.IntegerType()),
    T.StructField("seen_click", T.IntegerType()),
    T.StructField("seen_view", T.IntegerType()),
    T.StructField("session_state", T.StringType()),  # COMPLETE|EXIT|TIMEOUT_EXIT|IN_PROGRESS
    T.StructField("is_complete", T.IntegerType()),
    T.StructField("is_exit", T.IntegerType()),
])

# Multimodal asset table (extension surface; no fixture data ships in the
# container so the decode step is stubbed — see operators/multimodal.py).
MEDIA_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("media_type", T.StringType()),     # image|audio|video
    T.StructField("content", T.BinaryType()),        # opaque payload
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
