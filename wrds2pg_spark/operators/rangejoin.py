"""Banded interval join.

A raw non-equi join (``r.v BETWEEN l.v - w AND l.v + w``) has no equi
key, so Spark falls back to BroadcastNestedLoopJoin — O(N*M) compares,
a non-starter at 100 TB.  The standard scale-out fix is *banding*:
quantize both sides into buckets of the band width, explode one side
into its 3 candidate buckets, equi-join on the bucket id (hash
shuffle, co-located), then apply the exact range predicate as a
post-filter.  Each true pair is produced exactly once because the
left row owns a single bucket and the right row's 3 exploded buckets
are distinct.

Cost: one hash shuffle of each side + 3x duplication of the (smaller)
exploded side; compares drop from N*M to the pairs sharing a bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["band_join"]


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    width: float,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Inner join on ``abs(left.left_val - right.right_val) <= width``.

    Explodes the *right* side into its bucket neighborhood; pass the
    smaller side as ``right``.  Result columns: all of left + all of
    right (names must not collide).
    """
    lb = F.floor(F.col(left_val) / F.lit(width)).alias("__bucket")
    l_df = left.withColumn("__bucket", lb)
    r_df = right.withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.floor(F.col(right_val) / F.lit(width)) - 1,
                F.floor(F.col(right_val) / F.lit(width)),
                F.floor(F.col(right_val) / F.lit(width)) + 1,
            )
        ),
    )
    cond = (
        (F.col(right_val) >= F.col(left_val) - width)
        & (F.col(right_val) <= F.col(left_val) + width)
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return l_df.join(r_df, on="__bucket", how="inner").filter(cond).drop("__bucket")
