"""Embedding similarity search: brute-force cosine top-k, random-
hyperplane LSH, and IVF coarse-quantizer variants.

The ANN members of the 100 TB extension family. Exactness strategy: the
float32 embeddings are quantized to 1e6-scaled BIGINTs once, so every
dot product is EXACT integer arithmetic — immune to summation-order
nondeterminism across engines/partitions (the same trick functions.
exact_sum uses for money columns). Cosine then divides by the exact
integer norms in double precision: bit-identical in Spark and DuckDB.

Execution strategy — higher-order functions, measured: for 64-dim
vectors Spark 4's ``aggregate``/``zip_with`` over primitive long arrays
beat the "flat codegen" alternative (one ``qv[0]*nv[0] + qv[1]*nv[1] +
...`` SQL string) by 4-5x on the pair-verify and bucket hot paths —
the flat form's generated methods blow past the JVM JIT's
DontCompileHugeMethods limit and run bytecode-interpreted, while the
HOF loop body is small, hot, and JIT-friendly. (Benchmarked at sf0.1:
463k pair dots = 1.7s HOF vs 6.4s flat; 16-bucket assignment = 0.3s
vs 1.5s.) Per-vector norms are still computed once in the vector
projection, never per candidate pair.

Scale design:
- brute force = broadcast(queries) x corpus: the correct baseline and
  still the best plan when the query set is small — one scan, zero
  shuffles of the corpus.
- LSH / IVF candidate generation is ID-ONLY: band/cell joins and the
  pair dedup shuffle (tbl, bucket, id) rows, never the 64-long vectors;
  vectors + precomputed norms join back exactly once per side for the
  exact-cosine verify (AQE broadcasts that join at small scale; at
  100 TB it is one id-keyed shuffle of the corpus instead of ``tables``
  of them). Neither path ever collects data to the driver — the IVF
  "fit" collects only the O(k x dims) centroid model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

import hashlib
import os

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


# Helpers below accept a Column OR a SQL fragment string. The string
# path renders the WHOLE expression as one ``F.expr`` — a single py4j
# roundtrip instead of one per AST node. That matters because plan
# CONSTRUCTION is driver-side py4j traffic paid inside every timed
# query (guide §7.3): building bucket_q(planes=8) through the Column
# API costs ~1,500 roundtrips (measured), the same tree as a parsed
# string costs ~6. The parsed expressions are identical Catalyst
# nodes, so runtime plans (and the HOF-vs-flat-codegen trade discussed
# above) are unchanged.


def _quantize_sql(vec: str, scale: int = SCALE) -> str:
    return (f"transform({vec}, x -> CAST(floor((CAST(x AS DOUBLE)"
            f" * {scale}) + 0.5D) AS BIGINT))")


def _dot_sql(a: str, b: str) -> str:
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
            f" CAST(0 AS BIGINT), (acc, v) -> acc + v)")


def _l2_sql(a: str, b: str) -> str:
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
            f" CAST(0 AS BIGINT), (acc, v) -> acc + v)")


def quantize(vec: Column | str, scale: int = SCALE) -> Column:
    """float array -> exact 1e6-scaled BIGINT array (round half up)."""
    if isinstance(vec, str):
        return F.expr(_quantize_sql(vec, scale))
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"))


def dot_q(a: Column | str, b: Column | str) -> Column:
    """Exact integer dot product of two quantized vector Columns."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(a, b))
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


def norm_q(a: Column | str) -> Column:
    """Double L2 norm of a quantized vector Column (exact integer
    self-dot under the sqrt)."""
    if isinstance(a, str):
        return F.expr(f"sqrt({_dot_sql(a, a)})")
    return F.sqrt(dot_q(a, a))


def cosine_q(a: Column, b: Column) -> Column:
    """Cosine from quantized vectors: exact int dot / double norms."""
    return dot_q(a, b) / (norm_q(a) * norm_q(b))


def _bucket_sql(qv: str, planes: int, dims: int, table: int) -> str:
    terms = ["CAST(0 AS BIGINT)"]
    for p in range(planes):
        signs = ",".join(f"{s}L"
                         for s in plane_signs(table * planes + p, dims))
        proj = (f"aggregate(zip_with({qv}, array({signs}),"
                f" (x, s) -> x * s), CAST(0 AS BIGINT),"
                f" (acc, v) -> acc + v)")
        terms.append(f"(CASE WHEN ({proj}) > 0 THEN CAST({2 ** p} AS"
                     f" BIGINT) ELSE CAST(0 AS BIGINT) END)")
    return " + ".join(terms)


def bucket_q(qv: Column | str, planes: int = 8, dims: int = 64,
             table: int = 0) -> Column:
    """Random-hyperplane LSH bucket id (SimHash for vectors) from a
    PRE-QUANTIZED vector Column. Bucket bit p = 1 iff plane p's signed
    projection is positive; ``table`` offsets the plane indices so
    independent hash tables can be built (OR-amplification — lsh_topk).
    The sign vectors are inlined literal arrays; each projection is one
    zip_with/aggregate over the shared quantized array."""
    if isinstance(qv, str):
        return F.expr(_bucket_sql(qv, planes, dims, table))
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        signs = F.expr("array({})".format(",".join(
            f"{s}L" for s in plane_signs(table * planes + p, dims))))
        proj = F.aggregate(F.zip_with(qv, signs, lambda x, s: x * s),
                           F.lit(0).cast("long"), lambda acc, v: acc + v)
        bucket = bucket + F.when(proj > 0, F.lit(2 ** p).cast("long")
                                 ).otherwise(F.lit(0).cast("long"))
    return bucket


def hyperplane_bucket(vec: Column, planes: int = 8,
                      dims: int = 64, table: int = 0) -> Column:
    """bucket_q over a raw float vector Column (quantizes first)."""
    return bucket_q(quantize(vec), planes, dims, table)


def _quantized(df: DataFrame, id_col: str, vec_col: str, out_id: str,
               out_vec: str, dims: int, with_norm: str | None = None,
               spread: bool = True) -> DataFrame:
    """(id, quantized vec [, norm]) projection; fans out single-split
    inputs so the per-row quantize + norm arithmetic parallelizes."""
    base = df.select(F.col(id_col), F.col(vec_col))
    if spread:
        base = fan_out(base)
    out = base.select(F.col(id_col).alias(out_id),
                      quantize(f"`{vec_col}`").alias(out_vec))
    if with_norm:
        out = out.withColumn(with_norm, norm_q(f"`{out_vec}`"))
    return out


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     dims: int = 64) -> DataFrame:
    """Exact cosine top-k per query vector.

    broadcast(queries) x corpus -> windowed rank. Norms are computed once
    per vector on each side; the per-pair work is one codegen dot
    product. The rank window partitions by query id, so that shuffle is
    |Q|-way — small by construction. Tie-break on neighbor id keeps
    output deterministic.
    """
    q = _quantized(queries, id_col, vec_col, "q_id", "q_vec", dims,
                   with_norm="q_norm", spread=False)
    c = _quantized(corpus, id_col, vec_col, "n_id", "n_vec", dims,
                   with_norm="n_norm")
    cos = dot_q("q_vec", "n_vec") \
        / (F.col("q_norm") * F.col("n_norm"))
    scored = (c.crossJoin(F.broadcast(q))
               .where(F.col("n_id") != F.col("q_id"))
               .select("q_id", "n_id", fround(cos, 4).alias("cosine")))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col("n_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .where(F.col("rank") <= k))


def lsh_bucket_assignments(corpus: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding", planes: int = 8,
                           dims: int = 64) -> DataFrame:
    """Corpus -> (id, bucket): the index-build pass (one scan, no shuffle)."""
    return (_quantized(corpus, id_col, vec_col, id_col, "_qv", dims)
            .select(F.col(id_col),
                    bucket_q("_qv", planes, dims).alias("bucket")))


def _banded_ids(df: DataFrame, nid: str, id_col: str, vec_col: str,
                planes: int, dims: int, tables: int) -> DataFrame:
    """(id, tbl, bucket) rows — the ID-ONLY candidate-generation side
    (vectors never enter the band join or the pair-dedup shuffle)."""
    q = _quantized(df, id_col, vec_col, nid, "_qv", dims)
    return q.select(
        F.col(nid),
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("tbl"),
                     bucket_q("_qv", planes, dims, t).alias("bucket"))
            for t in range(tables)])).alias("tb"),
    ).select(nid, "tb.tbl", "tb.bucket")


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
    (never |N|^2): an id-only self-equi-join on (tbl, bucket), same
    shape as minhash_lsh_dedup's band join; vectors + norms join back
    once per side for the verify.
    """
    # one banded subplan, self-joined via aliases — the quantize + bucket
    # arithmetic runs ONCE and the probe side becomes a ReusedExchange,
    # instead of two independent quantization passes over the corpus
    banded = _banded_ids(corpus, "_nid", id_col, vec_col, planes, dims,
                         tables)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, (F.col("a.tbl") == F.col("b.tbl"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a._nid") < F.col("b._nid")))
             .select(F.col("a._nid").alias("doc_a"),
                     F.col("b._nid").alias("doc_b"))
             .dropDuplicates(["doc_a", "doc_b"]))
    vecs = _quantized(corpus, id_col, vec_col, "_vid", "_vec", dims,
                      with_norm="_norm")
    cos = dot_q("doc_a_vec", "doc_b_vec") \
        / (F.col("norm_a") * F.col("norm_b"))
    return (cand
            .join(vecs.select(F.col("_vid").alias("doc_a"),
                              F.col("_vec").alias("doc_a_vec"),
                              F.col("_norm").alias("norm_a")), "doc_a")
            .join(vecs.select(F.col("_vid").alias("doc_b"),
                              F.col("_vec").alias("doc_b_vec"),
                              F.col("_norm").alias("norm_b")), "doc_b")
            .select("doc_a", "doc_b", fround(cos, 4).alias("cosine"))
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


def l2_q(a: Column | str, b: Column | str) -> Column:
    """Exact integer squared-L2 distance of two quantized vectors
    (diffs <= 2e6, squared x 64 dims ~ 2.6e14 — comfortably BIGINT)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_l2_sql(a, b))
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


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
    h = text_hash60(f"concat('ivf:', CAST(`{id_col}` AS STRING))")
    rows = (corpus
            .select(F.col(id_col).alias("_id"),
                    quantize(f"`{vec_col}`").alias("cv"), h.alias("h"))
            .orderBy("h", "_id").limit(n_centroids).collect())
    return [list(r["cv"]) for r in rows]


def _vec_sql(vals: list[int]) -> str:
    return "array({})".format(",".join(f"{v}L" for v in vals))


def _lit_vec(vals: list[int]) -> Column:
    # one expression per centroid, not 64 py4j F.lit round-trips
    return F.expr(_vec_sql(vals))


def _cell_dists(q: Column | str, centroids: list[list[int]]) -> list[Column]:
    if isinstance(q, str):
        return [F.expr(_l2_sql(q, _vec_sql(cv))) for cv in centroids]
    return [l2_q(q, _lit_vec(cv)) for cv in centroids]


def ivf_cell(qcol: Column | str, centroids: list[list[int]]) -> Column:
    """Nearest-centroid cell id (0-based, lowest cell wins ties) from a
    quantized Column as a pure projection. Convenience/compat form for a
    handful of centroids; ivf_topk's hot path assigns cells through a
    broadcast centroid JOIN instead — inlining n_centroids x dims
    literal terms into the plan stops scaling past ~tens of centroids
    (megabyte task binaries), while a broadcast join takes thousands."""
    if isinstance(qcol, str):
        darr = "array({})".format(",".join(
            _l2_sql(qcol, _vec_sql(cv)) for cv in centroids))
        return F.expr(f"CAST((array_position({darr}, array_min({darr}))"
                      f" - 1) AS BIGINT)")
    darr = F.array(*_cell_dists(qcol, centroids))
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("long")


def ivf_probe_cells(qcol: Column | str, centroids: list[list[int]],
                    nprobe: int) -> Column:
    """The ``nprobe`` nearest cell ids for a query vector (distance then
    cell-id order), via array_sort over (dist, cell) structs — struct
    comparison is lexicographic by field position in both engines."""
    if isinstance(qcol, str):
        structs = ",".join(
            f"named_struct('d', {_l2_sql(qcol, _vec_sql(cv))},"
            f" 'cell', CAST({c} AS BIGINT))"
            for c, cv in enumerate(centroids))
        return F.expr(f"slice(transform(array_sort(array({structs})),"
                      f" s -> s.cell), 1, {int(nprobe)})")
    order = F.array_sort(F.array(*[
        F.struct(d.alias("d"), F.lit(c).cast("long").alias("cell"))
        for c, d in enumerate(_cell_dists(qcol, centroids))]))
    return F.slice(F.transform(order, lambda s: s["cell"]), 1, nprobe)


def _centroids_df(spark, centroids: list[list[int]]) -> DataFrame:
    """The fitted coarse quantizer as a (cell, cv) DataFrame — the
    broadcastable model representation."""
    rows = [(c, [int(v) for v in cv]) for c, cv in enumerate(centroids)]
    return spark.createDataFrame(rows, "cell long, cv array<bigint>")


def _assign_cells(vecs: DataFrame, id_col: str, vec_col: str,
                  cdf: DataFrame, n_cells: int,
                  carry: tuple[str, ...] = (),
                  dims: int = 64) -> DataFrame:
    """Nearest-cell id per quantized vector via the broadcast centroid
    join: (id, cell) with the lexicographic (distance, cell) min —
    lowest cell wins ties, ivf_cell's semantics.

    The (d, cell) min is ENCODED into one BIGINT, ``d * n_cells +
    cell`` (round 12): min over the encoding equals the lexicographic
    min because 0 <= cell < n_cells and d >= 0, and it is exact while
    ``d * n_cells + cell`` fits a BIGINT — d <= dims * (2 * SCALE)^2,
    so the gate is ``dims * (2*SCALE)^2 * (n_cells + 1) < 2^63``
    (round-13 ADVICE fix: a fixed n_cells <= 16384 gate silently
    overflowed for dims >~ 140, e.g. 1024-dim embeddings — dims is a
    public parameter on ivf_topk/semantic_dedup/ivf_recall_sweep).
    A plain ``min(BIGINT)`` hash-aggregates with map-side partial
    combine and ships 8 bytes per pre-combine row, where the
    ``min_by(cell, struct(d, cell))`` form planned as SortAggregate
    (a sort on every branch of every consumer). Oversized
    quantizer/dims combinations keep the struct form.

    ``carry`` columns (the quantized vector/norm) ride the aggregate
    as EXTRA GROUP KEYS — they are functionally dependent on the id
    (every row of an id's group holds the same value), so the groups
    are unchanged, and keying keeps the aggregate a HashAggregate
    (a ``first(array)`` aggregate would flip it to SortAggregate —
    arrays have no mutable buffer). This lets a consumer whose next
    hop is a BROADCAST join (the IVF probe) read vectors straight off
    the assignment instead of re-attaching them with an id-keyed
    shuffle join: the carried bytes cross exactly the one exchange the
    assignment already pays, and the (cand x n) join disappears
    (round 12, guide §2.4/§8 "move the heavy bytes once").
    """
    j = vecs.crossJoin(F.broadcast(cdf))
    keys = [id_col, *carry]
    d_max = dims * (2 * SCALE) ** 2          # max squared-L2 distance
    if d_max * (n_cells + 1) < 2 ** 63:
        return (j.select(F.col(id_col), *[F.col(c) for c in carry],
                         (l2_q(vec_col, "cv") * n_cells + F.col("cell"))
                          .alias("_dc"))
                 .groupBy(*keys)
                 .agg(F.min("_dc").alias("_dc"))
                 .select(F.col(id_col), *[F.col(c) for c in carry],
                         (F.col("_dc") % n_cells).alias("cell")))
    return (j.select(F.col(id_col), "cell", *[F.col(c) for c in carry],
                     l2_q(vec_col, "cv").alias("d"))
             .groupBy(*keys)
             .agg(F.min_by("cell", F.struct("d", "cell")).alias("cell")))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_centroids: int = 8, nprobe: int = 2,
             dims: int = 64) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    ``n_centroids`` Voronoi cells, probe only the query's ``nprobe``
    nearest cells, re-rank candidates by exact cosine.

    The scale path alongside lsh_topk: the fitted centroids live in a
    broadcast (cell, cv) DataFrame — NOT inlined literals, so the plan
    size is independent of n_centroids and the same code serves a
    4096-centroid production quantizer. Cell assignment is a broadcast
    cross join + min_by (per-vector distances computed map-side;
    the assignment shuffle carries only (id, cell, d) — map-side partial
    aggregation collapses the x n_centroids fan-out back to one row per
    vector before the exchange). The probe is a cell equi-join with the
    query side broadcast, so the verify work drops to
    ~nprobe/n_centroids of the corpus per query. A corpus row lives in
    exactly one cell, so no candidate dedup is needed (unlike
    multi-table LSH).
    """
    cents = ivf_fit_centroids(corpus, n_centroids, id_col, vec_col)
    cdf = _centroids_df(corpus.sparkSession, cents)
    n = _quantized(corpus, id_col, vec_col, "n_id", "n_vec", dims,
                   with_norm="n_norm")
    # nearest cell per corpus vector: min (distance, cell) — lowest cell
    # wins ties, matching ivf_cell's array_position semantics; the
    # quantized vector + norm RIDE the assignment (round 12) so the
    # verify reads them straight off the broadcast probe join instead
    # of re-attaching via an id-keyed shuffle join of the corpus
    assign = _assign_cells(n.select("n_id", "n_vec", "n_norm"),
                           "n_id", "n_vec", cdf, n_centroids,
                           carry=("n_vec", "n_norm"), dims=dims)
    q = _quantized(queries, id_col, vec_col, "q_id", "q_vec", dims,
                   with_norm="q_norm", spread=False)
    wq = Window.partitionBy("q_id").orderBy("d", "cell")
    probes = (q.select("q_id", "q_vec")
               .crossJoin(F.broadcast(cdf))
               .select("q_id", "cell",
                       l2_q("q_vec", "cv").alias("d"))
               .withColumn("_rn", F.row_number().over(wq))
               .where(F.col("_rn") <= nprobe)
               .select("q_id", "cell"))
    cand = (assign.join(F.broadcast(probes), "cell")
                  .where(F.col("n_id") != F.col("q_id"))
                  .select("q_id", "n_id", "n_vec", "n_norm"))
    cos = dot_q("q_vec", "n_vec") \
        / (F.col("q_norm") * F.col("n_norm"))
    scored = (cand.join(F.broadcast(q), "q_id")
                  .select("q_id", "n_id", fround(cos, 4).alias("cosine")))
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

    Each table is one id-only equi-join on its bucket column; candidates
    are the distinct union — work stays proportional to bucket occupancy,
    never |Q| x |N|. Vectors + norms rejoin once for the re-rank (query
    side broadcast — it is |Q| rows by construction).
    """
    c = _banded_ids(corpus, "n_id", id_col, vec_col, planes, dims, tables)
    q = _banded_ids(queries, "q_id", id_col, vec_col, planes, dims, tables)
    cand = (c.join(F.broadcast(q), ["tbl", "bucket"])
             .where(F.col("n_id") != F.col("q_id"))
             .select("q_id", "n_id")
             .dropDuplicates(["q_id", "n_id"]))
    qv = _quantized(queries, id_col, vec_col, "q_id", "q_vec", dims,
                    with_norm="q_norm", spread=False)
    nv = _quantized(corpus, id_col, vec_col, "n_id", "n_vec", dims,
                    with_norm="n_norm")
    cos = dot_q("q_vec", "n_vec") \
        / (F.col("q_norm") * F.col("n_norm"))
    scored = (cand.join(F.broadcast(qv), "q_id")
                  .join(nv, "n_id")
                  .select("q_id", "n_id", fround(cos, 4).alias("cosine")))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col("n_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .where(F.col("rank") <= k))


def semantic_dedup(corpus: DataFrame, threshold: float = 0.85,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   n_centroids: int = 8, dims: int = 64) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with the IVF coarse
    quantizer, compare pairs ONLY within a cluster, and drop every
    vector that has a lower-id cluster-mate with cosine >=
    ``threshold`` (lowest-id-wins, the same survivor rule as
    embedding_dedup / curate_corpus).

    Complements the LSH near-dup family: LSH targets a tight cosine
    band around near-identical vectors, while SemDeDup's cluster scope
    catches looser semantic redundancy at a threshold where LSH bucket
    collisions would be too sparse to enumerate.

    Returns one row per corpus vector: (``id_col``, cell, is_kept).

    Scale: pairwise work is sum(|cell|^2), bounded by raising
    ``n_centroids`` with the corpus so cells stay ~constant-sized (the
    paper's regime: 50k clusters over 5B embeddings). The centroid
    model is an O(n_centroids x dims) broadcast; assignment is one
    map-side broadcast join + min_by partial agg; the in-cell self-join
    shuffles (cell, id, vec, norm) once per side and never forms a
    corpus-wide cross product.
    """
    cents = ivf_fit_centroids(corpus, n_centroids, id_col, vec_col)
    cdf = _centroids_df(corpus.sparkSession, cents)
    n = _quantized(corpus, id_col, vec_col, "_sid", "_svec", dims,
                   with_norm="_snorm")
    # vector + norm ride the assignment aggregate (round 12): the
    # in-cell self-join reads them directly — no id-keyed shuffle join
    # re-attaching the corpus vectors to their cell labels
    assign = _assign_cells(n.select("_sid", "_svec", "_snorm"),
                           "_sid", "_svec", cdf, n_centroids,
                           carry=("_svec", "_snorm"), dims=dims)
    sided = assign
    a = sided.select(F.col("cell"), F.col("_sid").alias("a_id"),
                     F.col("_svec").alias("a_vec"),
                     F.col("_snorm").alias("a_norm"))
    b = sided.select(F.col("cell"), F.col("_sid").alias("b_id"),
                     F.col("_svec").alias("b_vec"),
                     F.col("_snorm").alias("b_norm"))
    cos = dot_q("a_vec", "b_vec") \
        / (F.col("a_norm") * F.col("b_norm"))
    victims = (a.join(b, "cell")
                .where(F.col("a_id") < F.col("b_id"))
                .where(fround(cos, 4) >= threshold)
                .select(F.col("b_id").alias("_sid"))
                .distinct())
    return (assign.join(victims.withColumn("_drop", F.lit(True)),
                        "_sid", "left")
                  .select(F.col("_sid").alias(id_col), "cell",
                          F.coalesce(~F.col("_drop"), F.lit(True))
                           .alias("is_kept")))


def cluster_balanced_sample(corpus: DataFrame, per_cluster: int = 5,
                            n_centroids: int = 8,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            dims: int = 64,
                            salt: str = "cbs") -> DataFrame:
    """Embedding-space-balanced sampling: assign every vector to its
    nearest coarse-quantizer cell, then keep a deterministic
    hash-ranked ``per_cluster`` representatives per cell. The
    cluster-coverage companion to the metadata-driven
    ``source_balanced_sample``: a corpus dominated by one semantic
    mode (boilerplate product pages, one language) still yields a
    sample that covers every occupied region of embedding space —
    the cluster-sampling step of SemDeDup-style curation and of
    diversity-stratified eval-set construction.

    Rank within a cell is the 60-bit md5 of ``salt:id`` (ties on id):
    pseudo-random but engine-portable and stable as the corpus grows —
    the same determinism contract as ``stratified_sample``. Returns
    one row per corpus vector: (``id_col``, cell, cluster_size,
    sampled) so callers can inspect occupancy, not just the survivors.

    Scale: centroid model is an O(n_centroids x dims) broadcast,
    assignment one map-side broadcast join + min_by partial agg, then
    ONE cell-keyed exchange shared by the rank window and the
    occupancy count. No pairwise work at all — cheaper than any dedup
    in this family; raise ``n_centroids`` with the corpus exactly as
    ivf_topk does.
    """
    from w_userflow_featurestore_spark.operators.dedup import text_hash60
    cents = ivf_fit_centroids(corpus, n_centroids, id_col, vec_col)
    cdf = _centroids_df(corpus.sparkSession, cents)
    n = _quantized(corpus, id_col, vec_col, "_sid", "_svec", dims)
    assign = _assign_cells(n.select("_sid", "_svec"), "_sid", "_svec",
                           cdf, n_centroids, dims=dims)
    h = text_hash60(f"concat('{salt}:', CAST(_sid AS STRING))")
    wrk = Window.partitionBy("cell").orderBy("_h", "_sid")
    wall = Window.partitionBy("cell")
    return (assign.withColumn("_h", h)
                  .withColumn("_rk", F.row_number().over(wrk))
                  .select(F.col("_sid").alias(id_col), "cell",
                          F.count(F.lit(1)).over(wall).cast("long")
                           .alias("cluster_size"),
                          (F.col("_rk") <= per_cluster).alias("sampled")))


# --------------------------------------------------------- persisted IVF

def ivf_index_build(corpus: DataFrame, table_path: str,
                    n_centroids: int = 8, id_col: str = "vec_id",
                    vec_col: str = "embedding", dims: int = 64) -> int:
    """Materialize an IVF index as two LogTables — build once, query
    many (the production ANN pattern; ivf_topk refits per call, which
    is right for one-shot analytics and wrong for a serving index):

    - ``<path>/centroids``: the fitted coarse quantizer (cell, cv) —
      model-sized, read whole at query time;
    - ``<path>/vectors``: (vec_id, qvec, norm) PARTITIONED BY cell, so
      a probe reads ONLY the probed cells' files via partition-dir
      pruning — IO proportional to nprobe/n_centroids of the corpus,
      enforced at the scan, not just the join.

    Quantized vectors and norms are precomputed at build time, so
    query-time work is probe + dot products — no per-query corpus
    re-quantization. Returns the vectors table's snapshot id.
    """
    from w_userflow_featurestore_spark.sources import LogTable
    spark = corpus.sparkSession
    ct = LogTable.create(spark, os.path.join(table_path, "centroids"), [])
    if ct.latest_snapshot_id() is not None:
        raise ValueError(f"IVF index already exists at {table_path}; "
                         f"use ivf_index_append or a fresh path")
    cents = ivf_fit_centroids(corpus, n_centroids, id_col, vec_col)
    cdf = _centroids_df(spark, cents)
    ct.append(cdf)
    vt = LogTable.create(spark, os.path.join(table_path, "vectors"),
                         ["cell"])
    return vt.append(_ivf_assign(corpus, cdf, id_col, vec_col, dims))


def _ivf_assign(vecs: DataFrame, cdf: DataFrame, id_col: str,
                vec_col: str, dims: int) -> DataFrame:
    """(vec_id, cell, qvec, norm): nearest-centroid assignment keeping
    the precomputed quantized vector + norm (min_by over a carrier
    struct — the x n_centroids fan-out collapses map-side)."""
    n = _quantized(vecs, id_col, vec_col, "vec_id", "qvec", dims,
                   with_norm="norm")
    return (n.crossJoin(F.broadcast(cdf))
             .select("vec_id",
                     F.struct("cell", "qvec", "norm").alias("_carry"),
                     F.struct(l2_q("qvec", "cv").alias("d"),
                              F.col("cell")).alias("_key"))
             .groupBy("vec_id")
             .agg(F.min_by("_carry", "_key").alias("s"))
             .select("vec_id", F.col("s.cell").alias("cell"),
                     F.col("s.qvec").alias("qvec"),
                     F.col("s.norm").alias("norm")))


def ivf_index_append(spark, table_path: str, new_vecs: DataFrame,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     dims: int = 64, txn: str | None = None) -> int:
    """Incrementally add vectors to a persisted IVF index: assign
    against the EXISTING centroids (no retrain — the standard serving
    tradeoff; if the data distribution drifts, cell sizes skew and
    recall sags, which ann_recall_gate-style monitoring catches) and
    append as one atomic commit. ``txn`` makes streaming replays
    exactly-once, so a foreachBatch can feed the index directly."""
    from w_userflow_featurestore_spark.sources import LogTable
    cdf = LogTable(spark, os.path.join(table_path, "centroids")).read()
    vt = LogTable(spark, os.path.join(table_path, "vectors"))
    return vt.append(_ivf_assign(new_vecs, cdf, id_col, vec_col, dims),
                     txn=txn)


def ivf_index_search(spark, table_path: str, queries: DataFrame,
                     k: int = 5, nprobe: int = 2,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     dims: int = 64) -> DataFrame:
    """Probe a persisted IVF index: nprobe nearest cells per query
    (broadcast centroid model), then ONE partition-pruned read of just
    the probed cells' files, exact-cosine re-rank. The only driver
    materialization is the probed cell-id list — model-sized
    (<= n_centroids), needed to push the cell predicate into the
    MANIFEST before Spark lists the scan."""
    from w_userflow_featurestore_spark.sources import LogTable
    cdf = LogTable(spark, os.path.join(table_path, "centroids")).read()
    q = _quantized(queries, id_col, vec_col, "q_id", "q_vec", dims,
                   with_norm="q_norm", spread=False)
    wq = Window.partitionBy("q_id").orderBy("d", "cell")
    probes = (q.select("q_id", "q_vec")
               .crossJoin(F.broadcast(cdf))
               .select("q_id", "cell",
                       l2_q("q_vec", "cv").alias("d"))
               .withColumn("_rn", F.row_number().over(wq))
               .where(F.col("_rn") <= nprobe)
               .select("q_id", "cell"))
    cells = sorted({r["cell"] for r in
                    probes.select("cell").distinct().collect()})
    vt = LogTable(spark, os.path.join(table_path, "vectors"))
    vecs = vt.read(filters=[("cell", "in", cells)])
    cand = (vecs.join(F.broadcast(probes), "cell")
                .where(F.col("vec_id") != F.col("q_id")))
    cos = dot_q("q_vec", "qvec") \
        / (F.col("q_norm") * F.col("norm"))
    scored = (cand.join(F.broadcast(q), "q_id")
                  .select("q_id", F.col("vec_id").alias("n_id"),
                          fround(cos, 4).alias("cosine")))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col("n_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .where(F.col("rank") <= k))


# ------------------------------------------------ label-aware neighbors

def _quantized_labeled(df: DataFrame, id_col: str, vec_col: str,
                       label_col: str, out_id: str, out_vec: str,
                       out_lab: str, dims: int, with_norm: str,
                       spread: bool = True) -> DataFrame:
    """:func:`_quantized` carrying the label column through the
    projection (the label rides the same row — never a separate
    corpus-grain join back by id)."""
    base = df.select(F.col(id_col), F.col(vec_col), F.col(label_col))
    if spread:
        base = fan_out(base)
    return (base.select(F.col(id_col).alias(out_id),
                        quantize(f"`{vec_col}`").alias(out_vec),
                        F.col(label_col).alias(out_lab))
                .withColumn(with_norm, norm_q(f"`{out_vec}`")))


def hard_negative_mining(corpus: DataFrame, queries: DataFrame,
                         k: int = 5, label_col: str = "label",
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         dims: int = 64) -> DataFrame:
    """Contrastive-training hard negatives: for each query (anchor)
    vector, the ``k`` NEAREST neighbors whose label DIFFERS from the
    anchor's — the negatives that sit closest to the decision boundary,
    which is what makes a triplet/InfoNCE batch informative (random
    negatives — :func:`~w_userflow_featurestore_spark.operators.sampling.negative_samples`
    — are mostly too easy; mining near-misses is the standard upgrade).
    "Different" is null-safe (a NULL label is distinct from every
    non-NULL label and equal to NULL), mirrored by the oracle's
    IS DISTINCT FROM.

    Returns (q_id, q_label, n_id, n_label, cosine, neg_rank) with
    neg_rank 1..k by (cosine DESC, n_id) among different-label
    neighbors only.

    Scale shape — linear in the corpus for a bounded anchor set, same
    as :func:`brute_force_topk`: the quantized+labeled anchors
    broadcast onto one corpus scan (labels ride the scan projection,
    never a join back by id), per-pair work is one codegen dot product,
    and the rank window partitions by anchor id (|Q|-way). For anchor
    sets too large to broadcast, mine per IVF cell
    (:func:`ivf_topk`'s probe path) and rank within probes instead.
    """
    q = _quantized_labeled(queries, id_col, vec_col, label_col,
                           "q_id", "q_vec", "q_label", dims,
                           with_norm="q_norm", spread=False)
    c = _quantized_labeled(corpus, id_col, vec_col, label_col,
                           "n_id", "n_vec", "n_label", dims,
                           with_norm="n_norm")
    cos = dot_q("q_vec", "n_vec") \
        / (F.col("q_norm") * F.col("n_norm"))
    scored = (c.crossJoin(F.broadcast(q))
               .where((F.col("n_id") != F.col("q_id"))
                      & ~F.col("n_label").eqNullSafe(F.col("q_label")))
               .select("q_id", "q_label", "n_id", "n_label",
                       fround(cos, 4).alias("cosine")))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col("n_id").asc())
    return (scored.withColumn("neg_rank",
                              F.row_number().over(w).cast("long"))
                  .where(F.col("neg_rank") <= k))


def knn_label_agreement(corpus: DataFrame, queries: DataFrame,
                        k: int = 10, label_col: str = "label",
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        dims: int = 64) -> DataFrame:
    """Label-agreement@k — the label-ERROR audit (Confident-Learning
    style): for each audited vector, the fraction of its k exact
    nearest neighbors sharing its label, in exact integer basis points.
    A low-agreement vector in a high-agreement class is the classic
    mislabeled-example signal; run over a hash-sampled audit set per
    ingest batch the way quality_rule_report runs over a crawl.
    Agreement is null-safe (NULL agrees with NULL), mirrored by the
    oracle's IS NOT DISTINCT FROM.

    Returns (q_id, q_label, n_neighbors, n_agree, agreement_bp);
    n_neighbors < k when the corpus is smaller than k+1.

    Scale shape: one broadcast-anchored corpus scan produces the
    top-k frame (linear for a bounded audit set, like
    :func:`brute_force_topk`); labels ride both sides' scan
    projections; the rollup is one |Q|-way aggregate. Nothing joins
    back to the corpus by id.
    """
    q = _quantized_labeled(queries, id_col, vec_col, label_col,
                           "q_id", "q_vec", "q_label", dims,
                           with_norm="q_norm", spread=False)
    c = _quantized_labeled(corpus, id_col, vec_col, label_col,
                           "n_id", "n_vec", "n_label", dims,
                           with_norm="n_norm")
    cos = dot_q("q_vec", "n_vec") \
        / (F.col("q_norm") * F.col("n_norm"))
    scored = (c.crossJoin(F.broadcast(q))
               .where(F.col("n_id") != F.col("q_id"))
               .select("q_id", "q_label", "n_label",
                       fround(cos, 4).alias("cosine"),
                       F.col("n_id")))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col("n_id").asc())
    topk = (scored.withColumn("_rk", F.row_number().over(w))
                  .where(F.col("_rk") <= k))
    agree = F.sum(F.when(F.col("n_label").eqNullSafe(F.col("q_label")),
                         1).otherwise(0)).cast("long")
    return (topk.groupBy("q_id", "q_label")
            .agg(F.count(F.lit(1)).cast("long").alias("n_neighbors"),
                 agree.alias("n_agree"))
            .select("q_id", "q_label", "n_neighbors", "n_agree",
                    F.expr("CAST((CAST(n_agree AS DECIMAL(38,0))"
                           " * 10000) DIV n_neighbors AS BIGINT)")
                     .alias("agreement_bp")))


def d4_select(corpus: DataFrame, threshold: float = 0.35,
              per_cluster: int = 5, sem_centroids: int = 16,
              sample_centroids: int = 8, id_col: str = "vec_id",
              vec_col: str = "embedding", dims: int = 64,
              salt: str = "cbs") -> DataFrame:
    """D4 data selection (Tirumala et al. 2023, arXiv:2308.12284):
    semantic DEDUPLICATION then embedding-space DIVERSIFICATION — drop
    SemDeDup victims first, then keep a cluster-balanced sample of the
    survivors, so the final selection neither repeats one semantic mode
    nor ignores a rare one. The paper's finding is that the two steps
    compose (dedup alone over-samples dense regions; diversification
    alone keeps duplicates): this operator is that composition as one
    auditable frame, the same consumer pattern as ``ccnet_curate`` over
    the text-side signals.

    Returns one row per corpus vector: (``id_col``, sem_cell, is_kept,
    cell, cluster_size, selected) — is_kept is the SemDeDup verdict
    (cell-mate with cosine >= ``threshold`` and lower id ⇒ dropped);
    cell / cluster_size describe the RE-FIT diversification clustering
    over the survivor set (NULL for dropped vectors, which are never
    re-clustered); selected is the final verdict (always False for
    dropped vectors).

    Scale shape: :func:`semantic_dedup`'s within-cell pair join is the
    only superlinear term (bounded by raising ``sem_centroids`` with
    the corpus); the survivor re-fit is another O(k x dims) driver
    model, the survivor filter one id-keyed semi join, and
    :func:`cluster_balanced_sample` adds exactly one cell-keyed
    exchange. Nothing re-reads the corpus beyond those two passes.
    """
    # Lineage cut: the SemDeDup verdict feeds BOTH the survivor filter
    # (via the re-clustering pipeline) and the final output join —
    # without it the within-cell pair join (D4's most expensive
    # subtree) runs twice. Three narrow columns per vector, the same
    # bounded trade perplexity_buckets makes for its scored frame.
    sd = semantic_dedup(corpus, threshold, id_col, vec_col,
                        n_centroids=sem_centroids, dims=dims) \
        .localCheckpoint(eager=True)
    kept_ids = sd.where(F.col("is_kept")).select(id_col)
    survivors = corpus.join(kept_ids, id_col)
    cbs = cluster_balanced_sample(survivors, per_cluster,
                                  sample_centroids, id_col, vec_col,
                                  dims, salt)
    return (sd.select(F.col(id_col), F.col("cell").alias("sem_cell"),
                      "is_kept")
            .join(cbs.select(F.col(id_col), "cell", "cluster_size",
                             F.col("sampled").alias("selected")),
                  id_col, "left")
            .select(F.col(id_col), "sem_cell", "is_kept", "cell",
                    "cluster_size",
                    F.coalesce("selected", F.lit(False))
                     .alias("selected")))


def ivf_recall_sweep(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     n_centroids: int = 8,
                     nprobes: tuple[int, ...] = (1, 2, 4),
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     dims: int = 64) -> DataFrame:
    """Recall@k vs nprobe tuning curve for the IVF index — the
    characterization a team runs BEFORE fixing the production nprobe:
    `ann_recall_gate` pins one operating point against a floor; this
    sweeps the knob and emits the whole curve, so the cost/recall
    trade (probing p of C cells scans ~p/C of the corpus) is chosen
    from data rather than folklore. Recall is measured against exact
    brute force on the same query set, floor(hits * 10000 / expected)
    in exact basis points.

    Returns one row per probed setting: (nprobe, recall_bp) — recall
    is non-decreasing in nprobe by construction (a superset of cells
    can only add candidates), which the unit test pins.

    Scale shape: probe sets NEST (the cells probed at nprobe=p are the
    first p of the max setting's list), so the whole sweep is ONE IVF
    candidate pipeline run at max(nprobes) with every scored candidate
    tagged by its cell's probe RANK, lineage-cut once — each sweep
    point is then a rank-filter + top-k window + 1-row aggregate over
    that candidate-pool-bounded frame. One centroid fit, one corpus
    assignment, one exact-cosine verify for the whole curve; the
    brute-force baseline (|Q|-bounded) is computed once and
    lineage-cut. Per-point cost is candidate-pool-sized, independent
    of the corpus.
    """
    if not nprobes:
        raise ValueError("nprobes must be non-empty")
    pmax = max(nprobes)
    cents = ivf_fit_centroids(corpus, n_centroids, id_col, vec_col)
    cdf = _centroids_df(corpus.sparkSession, cents)
    n = _quantized(corpus, id_col, vec_col, "n_id", "n_vec", dims,
                   with_norm="n_norm")
    # vector + norm ride the assignment (round 12) — see ivf_topk
    assign = _assign_cells(n.select("n_id", "n_vec", "n_norm"),
                           "n_id", "n_vec", cdf, n_centroids,
                           carry=("n_vec", "n_norm"), dims=dims)
    q = _quantized(queries, id_col, vec_col, "q_id", "q_vec", dims,
                   with_norm="q_norm", spread=False)
    wq = Window.partitionBy("q_id").orderBy("d", "cell")
    probes = (q.select("q_id", "q_vec")
               .crossJoin(F.broadcast(cdf))
               .select("q_id", "cell",
                       l2_q("q_vec", "cv").alias("d"))
               .withColumn("probe_rank", F.row_number().over(wq))
               .where(F.col("probe_rank") <= pmax)
               .select("q_id", "cell", "probe_rank"))
    cand = (assign.join(F.broadcast(probes), "cell")
                  .where(F.col("n_id") != F.col("q_id"))
                  .select("q_id", "n_id", "probe_rank", "n_vec",
                          "n_norm"))
    cos = dot_q("q_vec", "n_vec") \
        / (F.col("q_norm") * F.col("n_norm"))
    scored = (cand.join(F.broadcast(q), "q_id")
                  .select("q_id", "n_id", "probe_rank",
                          fround(cos, 4).alias("cosine"))
                  .localCheckpoint(eager=True))
    brute = (brute_force_topk(corpus, queries, k, id_col, vec_col, dims)
             .select("q_id", "n_id").localCheckpoint(eager=True))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col("n_id").asc())
    curve = None
    for p in nprobes:
        topk = (scored.where(F.col("probe_rank") <= p)
                .withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select("q_id", "n_id").withColumn("_h", F.lit(1)))
        point = (brute.join(topk, ["q_id", "n_id"], "left")
                 .agg(F.count(F.lit(1)).alias("_n"),
                      F.count("_h").alias("_hits"))
                 .select(F.lit(p).cast("int").alias("nprobe"),
                         F.floor(F.col("_hits") * 10000 / F.col("_n"))
                          .cast("long").alias("recall_bp")))
        curve = point if curve is None else curve.unionAll(point)
    return curve
