"""Scalable as-of join (point-in-time lookup).

Spark has no native ASOF JOIN; the naive formulations (theta join +
per-row max, or a LATERAL-style correlated subquery) explode to N*M
pairs or serialize per row.  This implementation uses the classic
union + ordered-window trick:

1. tag left rows (is_left=1) and right rows (is_left=0), union them on
   a common (key, time) spine;
2. one window per key, ordered by (time, is_left, tiebreak), carries
   the right side's payload forward with ``last(ignorenulls=True)``;
3. keep only left rows — each now holds the payload of the most recent
   right row with time <= its own.

Cost: ONE shuffle on the join key for |L|+|R| rows — the same shape as
a sort-merge join, so it scales to 100 TB the way any keyed window
does.  Skewed keys can be salted upstream if a single key's history
exceeds a partition.

Right rows at the same timestamp as a left row sort *before* it
(is_left 0 < 1), giving inclusive <= semantics; ties between right
rows resolve by ``tiebreak`` ascending, so the largest tiebreak wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    right_cols: list[str],
    tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: for each left row, attach ``right_cols`` from the
    most recent right row with ``right_on <= left_on`` and matching key.
    Unmatched left rows keep nulls (left-outer semantics)."""
    l_tagged = left.select(
        F.col(left_by).alias("__k"),
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__is_l"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
          for c in right_cols],
    )
    tb = (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long")
    r_tagged = right.select(
        F.col(right_by).alias("__k"),
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__is_l"),
        tb.alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns],
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_l").asc(), F.col("__tb").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    for c in right_cols:
        u = u.withColumn(
            f"{prefix}{c}", F.last(f"{prefix}{c}", ignorenulls=True).over(w)
        )
    out_cols = list(left.columns) + [f"{prefix}{c}" for c in right_cols]
    return u.filter(F.col("__is_l") == 1).select(*out_cols)
