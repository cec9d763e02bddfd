"""Vector math over ``array<float>`` embedding columns — pure
``F.*`` higher-order-function compositions (zip_with / aggregate run
inside whole-stage codegen; no Python round-trips).

Elements are cast to double before any arithmetic so Spark and the
DuckDB oracle compute on identical IEEE doubles (float->double casts
are exact).  Final similarity values are O(1) magnitude, so a 6-decimal
round makes cross-engine summation-order differences vanish.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "l2_norm", "cosine_similarity"]


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    ad = _as_double(a)
    sq = F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt(sq)


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
