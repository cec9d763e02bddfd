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

__all__ = ["band_join", "interval_overlap_join"]


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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str, l_end: str,
    r_start: str, r_end: str,
    bin_width: int,
) -> DataFrame:
    """Inner join of two INTERVAL sets on overlap
    (``l.start <= r.end AND r.start <= l.end``) — the genomics /
    session-log / validity-window join Spark has no native operator
    for (a raw non-equi join nested-loops).

    Scale shape: both sides explode to the fixed-width bins their
    interval covers and equi-join on the bin id (hash shuffle,
    co-located).  A pair of overlapping intervals shares every bin in
    the overlap region, so the join would emit it once per shared bin;
    instead of a dropDuplicates shuffle, the pair is kept only in its
    FIRST common bin — ``max(floor(l.start/w), floor(r.start/w))`` —
    which the post-filter computes from the row itself.  Exactly-once
    without a second exchange.  ``bin_width`` ~ the typical interval
    length keeps duplication ~2 bins/interval; intervals much longer
    than the width fan out proportionally (cap them upstream or raise
    the width).
    """
    def binned(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(start) / F.lit(bin_width)),
                    F.floor(F.col(end) / F.lit(bin_width)),
                )
            ),
        )

    cond = (
        (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end))
        & (
            F.col("__bin")
            == F.greatest(
                F.floor(F.col(l_start) / F.lit(bin_width)),
                F.floor(F.col(r_start) / F.lit(bin_width)),
            )
        )
    )
    return (
        binned(left, l_start, l_end)
        .join(binned(right, r_start, r_end), on="__bin", how="inner")
        .filter(cond)
        .drop("__bin")
    )
