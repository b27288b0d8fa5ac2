"""Embedding similarity search: brute-force cosine top-k and a
random-hyperplane LSH bucketed variant.

The ANN members of the 100 TB extension family. Exactness strategy: the
float32 embeddings are quantized to 1e6-scaled BIGINTs once, so every
dot product is EXACT integer arithmetic — immune to summation-order
nondeterminism across engines/partitions (the same trick functions.
exact_sum uses for money columns). Cosine then divides by the exact
integer norms in double precision: bit-identical in Spark and DuckDB.

Scale design:
- brute force = broadcast(queries) x corpus with zip_with/aggregate dot
  products (JVM codegen, no Python): the correct baseline and still the
  best plan when the query set is small — one scan, zero shuffles.
- LSH = 1 projection pass + a bucket equi-join: candidates meet only
  inside a bucket, so compare count drops from |Q|x|N| to |Q|x|bucket|.
  Recall is tunable via planes/tables; verification re-ranks with the
  exact cosine. At 1000 executors both paths partition the corpus scan;
  neither collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

import hashlib

from w_userflow_featurestore_spark.functions import fround

SCALE = 1_000_000  # 1e6 quantization: 64-dim unit vectors -> |dot| <= 6.4e13


def plane_signs(plane: int, dims: int) -> list[int]:
    """Pseudo-random +-1 hyperplane components, derived from md5(p:d) —
    deterministic and engine-independent (precomputed driver-side, inlined
    as literals into both the Spark plan and the oracle SQL)."""
    return [1 if int(hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[:15],
                     16) % 2 == 1 else -1
            for d in range(dims)]


def quantize(vec: Column, scale: int = SCALE) -> Column:
    """float array -> exact 1e6-scaled BIGINT array (round half up)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


def cosine_q(a: Column, b: Column) -> Column:
    """Cosine from quantized vectors: exact int dot / double norms."""
    return dot_q(a, b) / (F.sqrt(dot_q(a, a)) * F.sqrt(dot_q(b, b)))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k per query vector.

    broadcast(queries) x corpus -> windowed rank. The window partitions
    by query id, so the rank shuffle is |Q|-way — small by construction.
    Tie-break on neighbor id keeps output deterministic.
    """
    q = queries.select(F.col(id_col).alias("q_id"),
                       quantize(F.col(vec_col)).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("n_id"),
                      quantize(F.col(vec_col)).alias("n_vec"))
    scored = (c.crossJoin(F.broadcast(q))
               .where(F.col("n_id") != F.col("q_id"))
               .select("q_id", "n_id",
                       fround(cosine_q(F.col("q_vec"), F.col("n_vec")), 4)
                        .alias("cosine")))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col("n_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .where(F.col("rank") <= k))


def hyperplane_bucket(vec: Column, planes: int = 8,
                      dims: int = 64, table: int = 0) -> Column:
    """Random-hyperplane LSH bucket id (SimHash for vectors).

    Plane p's component signs are pseudo-random +-1 derived from
    md5(p:d) — deterministic, engine-portable, no stored model. Bucket
    bit p = 1 iff the signed projection is positive. The projection is
    exact integer arithmetic over the quantized vector. ``table`` offsets
    the plane indices so multiple independent hash tables can be built
    (OR-amplification recovers recall; see lsh_topk).
    """
    qv = quantize(vec)
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        # one F.expr per plane, not dims x F.lit py4j round-trips —
        # building 16 planes x 64 literals column-by-column costs seconds
        # of driver time before the job even starts
        signs = F.expr("array({})".format(",".join(
            f"{s}L" for s in plane_signs(table * planes + p, dims))))
        proj = F.aggregate(F.zip_with(qv, signs, lambda x, s: x * s),
                           F.lit(0).cast("long"), lambda acc, v: acc + v)
        bucket = bucket + F.when(proj > 0, F.lit(2 ** p).cast("long")
                                 ).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_bucket_assignments(corpus: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding", planes: int = 8,
                           dims: int = 64) -> DataFrame:
    """Corpus -> (id, bucket): the index-build pass (one scan, no shuffle)."""
    return corpus.select(
        F.col(id_col),
        hyperplane_bucket(F.col(vec_col), planes, dims).alias("bucket"))


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             planes: int = 4, dims: int = 64, tables: int = 4) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket
    in ANY of ``tables`` independent hash tables, re-ranked by exact
    cosine (the standard AND/OR LSH amplification: ``planes`` per table
    sharpens precision, ``tables`` recovers recall).

    Each table is one equi-join on its bucket column; candidates are the
    distinct union — work stays proportional to bucket occupancy, never
    |Q| x |N|. The exploded (table, bucket) layout keeps it a single join
    instead of ``tables`` separate ones.
    """
    def with_buckets(df, nid):
        return df.select(
            F.col(id_col).alias(nid),
            quantize(F.col(vec_col)).alias(f"{nid}_vec"),
            F.explode(F.array(*[
                F.struct(F.lit(t).alias("tbl"),
                         hyperplane_bucket(F.col(vec_col), planes, dims, t)
                          .alias("bucket"))
                for t in range(tables)])).alias("tb"),
        ).select(nid, f"{nid}_vec", "tb.tbl", "tb.bucket")

    c = with_buckets(corpus, "n_id")
    q = with_buckets(queries, "q_id")
    scored = (c.join(F.broadcast(q), ["tbl", "bucket"])
               .where(F.col("n_id") != F.col("q_id"))
               .dropDuplicates(["q_id", "n_id"])
               .select("q_id", "n_id",
                       fround(cosine_q(F.col("q_id_vec"), F.col("n_id_vec")), 4)
                        .alias("cosine")))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col("n_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .where(F.col("rank") <= k))
