"""w_userflow_featurestore_spark — a PySpark-native analytics/feature-store engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``hbstella92/w-userflow-featurestore``
(a medallion feature-store: streaming ingest -> sessionization -> daily
feature aggregates), generalized into a composable library and extended
with the operators a large-scale (100 TB) training-data pipeline needs:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search, text analysis, and multimodal-column plumbing.

Design rules (see SURVEY.md §7):
- DataFrame/SQL declarative plans everywhere; Catalyst + AQE pick physical
  strategies. No RDDs. No row-at-a-time Python UDFs in hot paths.
- Every layer idempotent at its own grain (checkpoint / merge key /
  partition overwrite).
- "now" is an injected parameter wherever wall-clock would otherwise make
  results non-deterministic (reference quirk P9).
- All thresholds are keyword parameters with reference-compatible defaults.
"""

from w_userflow_featurestore_spark.conf import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
