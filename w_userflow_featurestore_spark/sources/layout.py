"""Multi-dimensional data layout: Z-order (Morton-curve) clustering.

A linear sort clusters only its LEADING column — file-level min/max
stats then prune scans filtering on that column, but a predicate on any
other column still touches every file. Interleaving the bits of
per-column quantile ranks (the Morton / Z-order curve) clusters every
listed column at once, so manifest stats (``LogTable`` commit stats,
Iceberg metrics, Delta file stats) prune on ANY clustered dimension.
This is the layout job behind Delta's ``OPTIMIZE ... ZORDER BY`` and
Iceberg's sort-order rewrite, built from Spark primitives:

1. per column: ~2^bits quantile boundaries via ``approxQuantile`` —
   a driver-side O(2^bits) model like the IVF centroid fit, NEVER a
   data collect; rank = count of boundaries <= value (codegen HOF);
2. z = bit-interleave of the ranks (shift/or column arithmetic);
3. ``repartitionByRange`` on z (range exchange -> each output file owns
   a contiguous z-range -> tight per-file min/max on every clustered
   column) + ``sortWithinPartitions`` for intra-file runs.

The z key is layout-only and dropped before the frame is returned;
write the result with ``LogTable.create(..., stats_columns=cols)`` (or
any stats-keeping format) to get the pruning payoff at read time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ZCOL = "__zorder"


def _rank(col: Column, boundaries: list[float]) -> Column:
    """Quantile rank in [0, len(boundaries)]: how many boundaries lie
    <= the value. NULLs rank 0 (cluster together at the curve origin).
    aggregate over a literal array — whole-stage-codegen, no UDF."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    x = col.cast("double")
    return F.coalesce(
        F.aggregate(arr, F.lit(0),
                    lambda acc, b: acc + F.when(b <= x, 1).otherwise(0)),
        F.lit(0))


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8,
               rel_err: float = 0.001) -> Column:
    """The Morton key column for ``cols`` (numeric / date / timestamp —
    values are ranked via their double cast). ``bits`` per column; the
    key needs ``bits * len(cols)`` bits total (<= 63 enforced)."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit a signed long")
    n_b = (1 << bits) - 1
    qs = [i / (n_b + 1) for i in range(1, n_b + 1)]
    num = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
    bnds = num.stat.approxQuantile(cols, qs, rel_err)
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        r = _rank(F.col(c), bnds[ci]).cast("long")
        for b in range(bits):
            # bit b of column ci lands at interleaved position
            # b * len(cols) + ci
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(r, b).bitwiseAND(F.lit(1)),
                            b * len(cols) + ci))
    return z


def zorder(df: DataFrame, cols: list[str], n_files: int = 16,
           bits: int = 8, rel_err: float = 0.001) -> DataFrame:
    """Re-arrange ``df`` along the Z-order curve of ``cols`` into
    ``n_files`` contiguous z-ranges. The returned frame carries the
    layout in its partitioning/ordering only — schema is unchanged."""
    keyed = df.withColumn(_ZCOL, zorder_key(df, cols, bits, rel_err))
    return (keyed.repartitionByRange(n_files, F.col(_ZCOL))
                 .sortWithinPartitions(_ZCOL)
                 .drop(_ZCOL))
