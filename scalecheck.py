"""Empirical scale-slope check: x8 synthetic inflation of the three
big tables, timing the slowest queries at both sizes (round-11
verdict, Next round #4).

The registry's plan pins assert the SHAPE that makes linear scaling
possible (no cartesian products, no global sorts on data, bounded
shuffles) — but no measurement above sf0.1 existed, because no larger
fixture is provided. This harness builds one: ``events`` /
``documents`` / ``embeddings`` unioned with 7 transformed copies (x8
rows), every other table symlinked unchanged, then the top-N slowest
queries from the newest committed bench snapshot are timed at sf0.1
and at x8 in the SAME session (min-of-2 each after an untimed warm-up
pass — the bench.py noise discipline).

The copies are id-shifted AND content-decorrelated — a verbatim copy
would be a 100%-duplicate corpus, and the dedup families would then
measure an O(dup^2) candidate-pair blowup that is a DATA pathology,
not an engine slope:

* ``events``: ``user_id``/``event_id`` shifted by the copy stride —
  8x the users with identical per-user activity (the realistic
  scale-up shape for sessionization/rollup/window families: group
  COUNT grows, group SIZE doesn't). ``ts`` stays the raw nano-epoch
  BIGINT the fixture uses; ``read_table`` converts it the same way
  either side.
* ``documents``: ``doc_id`` shifted, ``text`` word-shuffled per copy —
  preserves the token/char distribution (BPE, DSIR, perplexity,
  lang-ID see the same statistics) while decorrelating the
  shingle/gram structure, so MinHash/SimHash/ExactSubstr see 8x the
  corpus, not 8 copies of one corpus.
* ``embeddings``: ``vec_id`` shifted, vector DIMENSIONS rotated by
  the copy index — preserves norms and the coordinate distribution
  exactly while making copies geometrically unrelated (IVF cells /
  LSH buckets grow in COUNT, not in per-cell duplication).

Emits one JSON line and writes ``SCALECHECK.json`` (snapshot to
SCALECHECK_r{N}.json when a round records it). ``linear_ok`` = x8/base
ratio <= RATIO_BOUND (10): an x8 input with fixed per-query session
overhead should land WELL under 8x wall; 10 leaves headroom for timer
noise without letting a quadratic family (64x) or a broken-bucketing
family pass.

Queries with a documented scale lever (``LEVERS``) always get a second
x8 measurement with the lever applied: the registered queries pin
bucketing parameters to fixture-sized values, so their fixed-parameter
super-linearity is the in-cell / in-bucket quadratic term the operator
docstrings already name — the stated mitigation (scale ``n_centroids``
/ ``planes`` with the corpus) is what a 100TB deployment would do, and
the lever entry records empirically that it restores a
linear-or-better slope. Measuring unconditionally (not only on a
bound breach) keeps the artifact's content deterministic: the
quadratic term rides the boot's cache/load state, so the same query
reads 7.4x on one run and 10.5x on another — the lever evidence must
not flicker with it."""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from bench import _force, git_provenance, settle_gate  # noqa: E402
from w_userflow_featurestore_spark import get_spark  # noqa: E402
from w_userflow_featurestore_spark.operators import similarity as SIM  # noqa: E402
from w_userflow_featurestore_spark.sources import read_table  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

INFLATION = 8
RATIO_BOUND = 10.0
TOP_N = 10
_HERE = os.path.dirname(os.path.abspath(__file__))

# Documented scale levers for the quadratic-capable families. The
# registered queries pin their bucketing parameters to fixture-sized
# values (16 IVF cells, 4 LSH planes), so an x8 corpus at FIXED
# parameters grows in-cell/in-bucket pair work x64 — a parameter
# pathology the operator docstrings already name, not a plan defect.
# The harness re-times each registered top-N query at x8 with its
# docstring's lever applied
# (n_centroids scaled with the corpus for the IVF family — the
# SemDeDup paper's constant-cell-size regime; +log2(INFLATION) planes
# for the LSH family — bucket COUNT x8, bucket size constant) and
# records that the lever restores a linear-or-better slope. Levers
# are timed for every registered query in the top-N (see module
# docstring: unconditional, so artifact content is boot-invariant).
_LG2 = INFLATION.bit_length() - 1  # log2 of the inflation factor

LEVERS: dict = {
    "semantic_dedup": (
        f"n_centroids 16 -> {16 * INFLATION} (cells stay fixture-sized; "
        "in-cell pair work scales 1/n_centroids)",
        lambda spark, d: SIM.semantic_dedup(
            read_table(spark, d, "embeddings"),
            threshold=0.35, n_centroids=16 * INFLATION)),
    "d4_select": (
        f"sem_centroids 16 -> {16 * INFLATION} (the SemDeDup pass holds "
        "the only pairwise term; diversification is window-only)",
        lambda spark, d: SIM.d4_select(
            read_table(spark, d, "embeddings",
                       columns=["vec_id", "embedding"]),
            threshold=0.35, per_cluster=5,
            sem_centroids=16 * INFLATION, sample_centroids=8)),
    "embedding_near_pairs": (
        f"planes 4 -> {4 + _LG2} (bucket count x{INFLATION}, expected "
        "bucket size constant)",
        lambda spark, d: SIM.embedding_near_pairs(
            read_table(spark, d, "embeddings"),
            threshold=0.4, planes=4 + _LG2, tables=4)),
    "embedding_dedup": (
        f"planes 4 -> {4 + _LG2} (bucket count x{INFLATION}, expected "
        "bucket size constant)",
        lambda spark, d: SIM.embedding_dedup(
            read_table(spark, d, "embeddings"),
            threshold=0.4, planes=4 + _LG2, tables=4)),
}


def _union(dfs):
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def build_inflated(spark, base_dir: str, out_dir: str) -> None:
    """Materialize the x8 fixture (idempotent: a completed build is
    reused across runs — the fixture is deterministic up to the
    word-shuffle, which only affects which shingles exist, not how
    many)."""
    done = os.path.join(out_dir, "_SCALECHECK_COMPLETE")
    if os.path.exists(done):
        return
    os.makedirs(out_dir, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.lexists(dst):
            os.symlink(os.path.join(base_dir, f"{t}.parquet"), dst)

    ev = spark.read.parquet(os.path.join(base_dir, "events.parquet"))
    u_stride = ev.agg(F.max("user_id")).first()[0] + 1
    e_stride = ev.agg(F.max("event_id")).first()[0] + 1
    _union([ev] + [
        ev.withColumn("user_id", F.col("user_id") + F.lit(k * u_stride))
          .withColumn("event_id", F.col("event_id") + F.lit(k * e_stride))
        for k in range(1, INFLATION)]) \
        .repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, "events.parquet"))

    dc = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    d_stride = dc.agg(F.max("doc_id")).first()[0] + 1
    shuffled = F.concat_ws(" ", F.shuffle(F.split(F.col("text"), " ")))
    _union([dc] + [
        dc.withColumn("doc_id", F.col("doc_id") + F.lit(k * d_stride))
          .withColumn("text", shuffled)
          .withColumn("n_chars", F.length("text"))
        for k in range(1, INFLATION)]) \
        .repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, "documents.parquet"))

    em = spark.read.parquet(os.path.join(base_dir, "embeddings.parquet"))
    v_stride = em.agg(F.max("vec_id")).first()[0] + 1
    parts = [em]
    for k in range(1, INFLATION):
        rot = F.expr(
            f"concat(slice(embedding, {k + 1}, size(embedding) - {k}),"
            f" slice(embedding, 1, {k}))")
        parts.append(
            em.withColumn("vec_id", F.col("vec_id") + F.lit(k * v_stride))
              .withColumn("embedding", rot))
    _union(parts).repartition(8).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet"))
    with open(done, "w") as fh:
        fh.write("ok\n")


def slowest_queries(top_n: int = TOP_N) -> list[str]:
    """Top-N slowest from the newest committed bench snapshot
    (BASE or DETAIL, largest parsed round; DETAIL outranks BASE within
    a round) — the adjudicated ranking, not the volatile working
    BENCH_DETAIL.json."""
    snaps = []
    for f in os.listdir(_HERE):
        m = re.fullmatch(r"BENCH_(BASE|DETAIL)_r(\d+)\.json", f)
        if m:
            snaps.append((int(m.group(2)), m.group(1) == "DETAIL", f))
    if not snaps:
        raise SystemExit("no BENCH_BASE_r*/BENCH_DETAIL_r*.json "
                         "snapshot to rank by")
    with open(os.path.join(_HERE, max(snaps)[2])) as fh:
        detail = json.load(fh)
    times = {n: v for n, v in detail["queries"].items()
             if not isinstance(v, dict)}
    return sorted(times, key=times.get, reverse=True)[:top_n]


def _time(fn, spark, sf_dir: str, repeat: int = 2) -> float:
    _force(fn(spark, sf_dir))                     # warm-up, untimed
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get("SPARK_GRAFT_SCALECHECK_DIR",
                             "/tmp/scalecheck_x8")
    gate = settle_gate(
        round(os.getloadavg()[1], 2),
        float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD5", "1.5")),
        os.environ.get("SPARK_GRAFT_BENCH_STRICT", "0") == "1")
    spark = get_spark(app_name="scalecheck")
    build_inflated(spark, base_dir, out_dir)

    qs = entrymod.queries()
    results: dict = {}
    for name in slowest_queries():
        fn = qs[name]
        base_sec = _time(fn, spark, base_dir)
        x8_sec = _time(fn, spark, out_dir)
        ratio = round(x8_sec / base_sec, 2) if base_sec > 0 else None
        results[name] = {"base_sec": base_sec, "x8_sec": x8_sec,
                         "ratio": ratio,
                         "linear_ok": bool(ratio is not None
                                           and ratio <= RATIO_BOUND)}
        print(f"{name}: {base_sec}s -> {x8_sec}s (x{ratio})",
              file=sys.stderr)
        if ratio is not None and name in LEVERS:
            desc, lfn = LEVERS[name]
            lever_sec = _time(lfn, spark, out_dir)
            lratio = (round(lever_sec / base_sec, 2)
                      if base_sec > 0 else None)
            results[name]["lever"] = {
                "desc": desc, "x8_sec": lever_sec, "ratio": lratio,
                "linear_ok": bool(lratio is not None
                                  and lratio <= INFLATION)}
            print(f"  lever[{name}]: {lever_sec}s (x{lratio}) — {desc}",
                  file=sys.stderr)

    out = {"metric": "scale_slope_x8", "inflation": INFLATION,
           "ratio_bound": RATIO_BOUND, "base_dir": base_dir,
           "queries": results,
           # a query over the raw bound passes via its lever entry
           # when the documented mitigation restores a <= INFLATION
           # slope — the "documented bound" path the round-11 verdict
           # names (fixed-parameter quadratic growth is a parameter
           # pathology, and the lever measurement proves the
           # deployment-time fix works)
           "all_linear_ok": all(
               r["linear_ok"] or r.get("lever", {}).get("linear_ok",
                                                        False)
               for r in results.values()),
           "loadavg": [round(x, 2) for x in os.getloadavg()],
           "settle_gate": gate,
           **git_provenance()}
    line = json.dumps(out, separators=(",", ":"))
    with open(os.path.join(_HERE, "SCALECHECK.json"), "w") as fh:
        fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
