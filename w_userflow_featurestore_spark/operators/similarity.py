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
from w_userflow_featurestore_spark.sources import fan_out

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
    c = fan_out(corpus.select(F.col(id_col), F.col(vec_col))) \
        .select(F.col(id_col).alias("n_id"),
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
    return fan_out(corpus.select(F.col(id_col), F.col(vec_col))).select(
        F.col(id_col),
        hyperplane_bucket(F.col(vec_col), planes, dims).alias("bucket"))


def embedding_near_pairs(corpus: DataFrame, threshold: float = 0.9,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         planes: int = 4, dims: int = 64,
                         tables: int = 4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (doc_a < doc_b, cosine)
    for every candidate pair with exact cosine >= ``threshold``.

    The embedding member of the near-dup family (MinHash/SimHash work on
    token sets; this catches paraphrases those miss). Candidates meet in
    a hyperplane-LSH bucket of ANY of ``tables`` independent tables (the
    standard AND/OR amplification), then the EXACT integer-quantized
    cosine verifies — so precision is exact and only recall is
    approximate, tunable via planes/tables. Work is bucket-bounded
    (never |N|^2): a self-equi-join on (tbl, bucket), same shape as
    minhash_lsh_dedup's band join.
    """
    def with_buckets(df, nid):
        df = fan_out(df.select(F.col(id_col), F.col(vec_col)))
        return df.select(
            F.col(id_col).alias(nid),
            quantize(F.col(vec_col)).alias(f"{nid}_vec"),
            F.explode(F.array(*[
                F.struct(F.lit(t).alias("tbl"),
                         hyperplane_bucket(F.col(vec_col), planes, dims, t)
                          .alias("bucket"))
                for t in range(tables)])).alias("tb"),
        ).select(nid, f"{nid}_vec", "tb.tbl", "tb.bucket")

    a = with_buckets(corpus, "doc_a")
    b = with_buckets(corpus, "doc_b")
    return (a.join(b, ["tbl", "bucket"])
             .where(F.col("doc_a") < F.col("doc_b"))
             .dropDuplicates(["doc_a", "doc_b"])
             .select("doc_a", "doc_b",
                     fround(cosine_q(F.col("doc_a_vec"), F.col("doc_b_vec")), 4)
                      .alias("cosine"))
             .where(F.col("cosine") >= threshold))


def embedding_dedup(corpus: DataFrame, threshold: float = 0.9,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    planes: int = 4, dims: int = 64,
                    tables: int = 4) -> DataFrame:
    """Embedding near-dup survivor set: drop the HIGHER id of every
    near-pair (lowest-id-wins, consistent with curate_corpus rules).
    One row per surviving vector id."""
    pairs = embedding_near_pairs(corpus, threshold, id_col, vec_col,
                                 planes, dims, tables)
    victims = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return corpus.select(id_col).join(victims, id_col, "left_anti")


def l2_q(a: Column, b: Column) -> Column:
    """Exact integer squared-L2 distance of two quantized vectors
    (diffs <= 2e6, squared x 64 dims ~ 2.6e14 — comfortably BIGINT)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


def _lit_vec(vals: list[int]) -> Column:
    # one expression per centroid, not 64 py4j F.lit round-trips
    return F.expr("array({})".format(",".join(f"{v}L" for v in vals)))


def ivf_fit_centroids(corpus: DataFrame, n_centroids: int = 8,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> list[list[int]]:
    """IVF coarse quantizer "fit": a deterministic pseudo-random sample of
    ``n_centroids`` corpus vectors (smallest md5-derived hash of the id —
    engine-portable, so the oracle reproduces the exact same centroids).

    This is the ONLY driver collect in the module and it is the model,
    not the data: O(n_centroids x dims) longs, independent of corpus
    size. Production would k-means-refine these seeds; the index
    structure (and this engine's plumbing) is identical either way.
    """
    from w_userflow_featurestore_spark.operators.dedup import text_hash60
    h = text_hash60(F.concat(F.lit("ivf:"), F.col(id_col).cast("string")))
    rows = (corpus
            .select(F.col(id_col).alias("_id"),
                    quantize(F.col(vec_col)).alias("cv"), h.alias("h"))
            .orderBy("h", "_id").limit(n_centroids).collect())
    return [list(r["cv"]) for r in rows]


def _cell_dists(qvec: Column, centroids: list[list[int]]) -> list[Column]:
    return [l2_q(qvec, _lit_vec(cv)) for cv in centroids]


def ivf_cell(qvec: Column, centroids: list[list[int]]) -> Column:
    """Nearest-centroid cell id (0-based, lowest cell wins ties) as a
    PURE PROJECTION — the centroids are inlined literals, so index build
    is one scan with zero shuffles, same shape as lsh_bucket_assignments."""
    darr = F.array(*_cell_dists(qvec, centroids))
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("long")


def ivf_probe_cells(qvec: Column, centroids: list[list[int]],
                    nprobe: int) -> Column:
    """The ``nprobe`` nearest cell ids for a query vector (distance then
    cell-id order), via array_sort over (dist, cell) structs — struct
    comparison is lexicographic by field position in both engines."""
    order = F.array_sort(F.array(*[
        F.struct(d.alias("d"), F.lit(c).cast("long").alias("cell"))
        for c, d in enumerate(_cell_dists(qvec, centroids))]))
    return F.slice(F.transform(order, lambda s: s["cell"]), 1, nprobe)


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_centroids: int = 8, nprobe: int = 2) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    ``n_centroids`` Voronoi cells, probe only the query's ``nprobe``
    nearest cells, re-rank candidates by exact cosine.

    The scale path alongside lsh_topk: cell assignment is a zero-shuffle
    projection (centroid literals), the probe is a cell equi-join with
    the query side broadcast, so scanned work drops to ~nprobe/n_centroids
    of the corpus per query. A corpus row lives in exactly one cell, so
    no candidate dedup is needed (unlike multi-table LSH).
    """
    cents = ivf_fit_centroids(corpus, n_centroids, id_col, vec_col)
    c = (fan_out(corpus.select(F.col(id_col), F.col(vec_col)))
         .select(F.col(id_col).alias("n_id"),
                 quantize(F.col(vec_col)).alias("n_vec"))
         .withColumn("cell", ivf_cell(F.col("n_vec"), cents)))
    q = (queries.select(F.col(id_col).alias("q_id"),
                        quantize(F.col(vec_col)).alias("q_vec"))
                .withColumn("cell", F.explode(
                    ivf_probe_cells(F.col("q_vec"), cents, nprobe))))
    scored = (c.join(F.broadcast(q), "cell")
               .where(F.col("n_id") != F.col("q_id"))
               .select("q_id", "n_id",
                       fround(cosine_q(F.col("q_vec"), F.col("n_vec")), 4)
                        .alias("cosine")))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col("n_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .where(F.col("rank") <= k))


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
        df = fan_out(df.select(F.col(id_col), F.col(vec_col)))
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
