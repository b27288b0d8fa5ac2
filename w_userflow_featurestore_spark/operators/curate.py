"""End-to-end corpus curation: the composition the dedup/text operators
exist for.

The canonical large-scale training-data pass:

    profile -> quality floor -> exact dedup (canonical survivor)
            -> near-dup removal (MinHash-LSH victims dropped)

Each stage is an already-oracled operator; this module only composes
them, so the composed driver query's oracle is literally the composition
of the stage oracles — any disagreement localizes to the glue.

Scale notes: the profile is row-local and fuses into the scan; the
quality filter runs BEFORE both dedup shuffles, shrinking them; exact
dedup shuffles on the 16-byte content hash; the LSH victim set joins
back as a left-anti on doc_id. Nothing is ever collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from w_userflow_featurestore_spark.operators.dedup import (
    exact_dedup, minhash_lsh_dedup,
)
from w_userflow_featurestore_spark.operators.text import text_profile


def curate_corpus(docs: DataFrame, min_quality: float = 0.5,
                  near_threshold: float = 0.5,
                  id_col: str = "doc_id") -> DataFrame:
    """Curated document set: one row per surviving doc with its profile.

    Drop order (deterministic):
    1. quality < min_quality
    2. exact duplicates — every doc except the lowest-id of its
       content-hash group
    3. near duplicates — the HIGHER id of every LSH candidate pair with
       estimated Jaccard >= near_threshold (the lower id survives,
       consistent with rule 2's lowest-id-wins)

    Near-dup candidates are computed on the full corpus (not the
    quality-filtered one) so the survivor set is stable under
    min_quality changes — a curation rerun with a laxer floor never
    flips which of two near-dups is canonical.
    """
    prof = text_profile(docs)
    keep = exact_dedup(docs).where(F.col("keep") == 1).select(id_col)
    victims = (minhash_lsh_dedup(docs, min_est_jaccard=near_threshold)
               .select(F.col("doc_b").alias(id_col)).distinct())
    return (prof
            .where(F.col("quality") >= min_quality)
            .join(keep, id_col, "left_semi")
            .join(victims, id_col, "left_anti")
            .select(id_col, "lang_pred", "quality", "n_tokens_ws",
                    "content_hash"))
