"""Deterministic floating-point aggregation helpers.

Summing doubles is order-dependent in the last ULP, and Spark's partial
aggregation order differs from any single-threaded engine — so a raw
``SUM(double)`` can never hash-match an oracle exactly.  The fix:
scale each addend to an integer (money has 2 decimals; a
price*(1-disc) product has 4; *(1+tax) has 6), sum exactly as BIGINT
(associative), then divide the total back down in double.  The result
is bit-identical regardless of partitioning, in Spark and in DuckDB,
as long as the oracle SQL applies the same steps — and it runs at
long-arithmetic speed (~3x faster than decimal aggregation, which is
the classic alternative).

Determinism notes:
- ``x * 10^s`` and the final division are single IEEE ops — identical
  on both engines given identical input doubles.
- ``round(.., 0)`` only matters when the scaled value is not already
  integral; with source data carrying <= s true decimal digits the
  scaled value sits within 1e-9 of an integer, far from any .5
  boundary, so Spark's BigDecimal rounding and DuckDB's C rounding
  agree.  (Both round half away from zero anyway.)
- Overflow bound: |sum(x)| * 10^s must stay below 2^63 (~9.2e18).
  At true 100-TB scale swap these for DECIMAL aggregation — the
  plan shape is unchanged, only ~3x slower on the agg stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from wrds2pg_spark.session import lineage_cut

__all__ = ["dsum", "davg", "DSUM_SQL", "DAVG_SQL"]


def _scaled(col: Column, scale: int) -> Column:
    return F.round(col * F.lit(float(10 ** scale)), 0).cast("long")


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent sum of a double column, returned as double."""
    return F.sum(_scaled(col, scale)).cast("double") / F.lit(float(10 ** scale))


def davg(col: Column, scale: int = 2) -> Column:
    """Order-independent mean of a double column, returned as double."""
    return dsum(col, scale) / F.count(col).cast("double")


def DSUM_SQL(expr: str, scale: int = 2) -> str:
    """DuckDB-side equivalent of :func:`dsum` for oracle strings."""
    f = float(10 ** scale)
    return (
        f"(CAST(SUM(CAST(round(({expr}) * {f}, 0) AS BIGINT)) AS DOUBLE)"
        f" / {f})"
    )


def DAVG_SQL(expr: str, scale: int = 2) -> str:
    """DuckDB-side equivalent of :func:`davg`."""
    return f"({DSUM_SQL(expr, scale)} / CAST(COUNT({expr}) AS DOUBLE))"


def with_broadcast_scalars(df, *aggs):
    """Stamp whole-table aggregate scalar(s) onto every row of ``df``
    WITHOUT a single-partition window: returns
    ``ckpt.crossJoin(broadcast(ckpt.agg(*aggs)))`` where ``ckpt`` is a
    lazy ``localCheckpoint`` of ``df``.

    This is the repo's one doctrine for "compute a global total /
    count and join it back" (round-8 unification of three hand-rolled
    variants).  The two failure modes it closes:

    - ``F.sum(..).over(Window.partitionBy())`` funnels the ENTIRE
      input through one WindowExec task — AQE can never split a
      window partition, so at a 10^8-row vocabulary this is the
      unsplittable-skew class banned in round 6 (tfidf) and round 7
      (zipf).  The agg here is map-side combined: the single final
      task reduces #partitions partial rows, not the data.
    - A naive ``df.crossJoin(broadcast(df.agg(..)))`` RE-RUNS the
      whole upstream pipeline, because Spark 4.1 AQE never reuses
      exchanges across a broadcast boundary (round-6 finding,
      BASELINE.md).  The lazy localCheckpoint pins ONE
      materialization that both the agg and the main stream read.

    Cost note: the checkpoint persists ``df`` (memory-and-disk) — call
    this on the SMALLEST stream that carries the total (vocabulary
    grain, not instance grain)."""
    ckpt = df.transform(lineage_cut(eager=False))
    return ckpt.crossJoin(F.broadcast(ckpt.agg(*aggs)))


def weighted_median(
    df,
    group_cols: list[str],
    value_col: str,
    weight_col,
    tiebreak_cols: list[str],
):
    """Exact weighted median per group: the smallest value whose
    cumulative weight reaches half the group total (weights summed
    exactly as BIGINT, so the 2*cumw >= totw boundary is
    integer-exact).  One group exchange carries both window frames
    (running and total); the final min rides the same partitioning —
    a 2-stage plan.  ``weight_col`` may be a Column expression; it
    must already be integral (cast upstream).  Ordering among equal
    values cannot change the picked VALUE; ``tiebreak_cols`` make the
    running sum itself deterministic.

    Returns one row per group: group_cols + (weighted_median,
    total_weight)."""
    from pyspark.sql import Window as W

    wr = (
        W.partitionBy(*group_cols)
        .orderBy(value_col, *tiebreak_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wt = W.partitionBy(*group_cols)
    base = df.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.sum(weight_col).over(wr).alias("__cumw"),
        F.sum(weight_col).over(wt).alias("__totw"),
    )
    return (
        base.filter(2 * F.col("__cumw") >= F.col("__totw"))
        .groupBy(*group_cols)
        .agg(
            F.min("__v").alias("weighted_median"),
            F.min("__totw").cast("long").alias("total_weight"),
        )
    )
