"""Operator families (each module documents its reference citations and
100 TB scale design):

- cleanse     — keep-latest dedup, null-key filtering, dimension fills
- sessionize  — gaps-and-islands sessionization + ordered state machine
- metrics     — gold-layer daily feature aggregations (A3-A16 analogs)
- dedup       — exact / MinHash-LSH / n-gram Jaccard / SimHash documents
- text        — language-ID, quality, token counts, fingerprints
- similarity  — exact cosine top-k + multi-table hyperplane LSH
- multimodal  — binary payloads + Arrow mapInPandas decode plumbing
- skew        — salted two-phase aggregation for hot keys
- asof        — point-in-time-correct AS-OF join (feature serving)
- curate      — end-to-end corpus curation composition
"""

from w_userflow_featurestore_spark.operators import (  # noqa: F401
    asof,
    cleanse,
    curate,
    dedup,
    metrics,
    multimodal,
    sessionize,
    similarity,
    skew,
    text,
)
