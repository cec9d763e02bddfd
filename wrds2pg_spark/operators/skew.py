"""Skew mitigation: salted two-phase aggregation and salted
broadcast-replicated joins.

AQE's skew-join splitting (enabled in session.py) handles sort-merge
join skew at runtime, but two hot spots remain at 100 TB:

- a groupBy where one key holds a large share of all rows (one reducer
  task runs forever): ``salted_agg`` splits every key across
  ``n_salts`` partial groups, aggregates, then merges — decomposable
  aggregates only, which is exactly what makes two-phase legal;
- a shuffled join with one hot key: ``salted_join`` salts the big
  side deterministically and replicates the small side once per salt,
  turning one hot partition into ``n_salts`` even ones.

Salts derive from ``xxhash64`` of a uniquifier column (not rand()) so
plans stay deterministic and re-executable (speculative tasks, stage
retries, and our oracle checks all require it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join"]

# (merge_fn, needs_count) per decomposable aggregate
_MERGEABLE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name -> (fn, column) with fn in
    sum/count/min/max (decomposable).  Phase 1 groups by
    (keys, salt) — the hot key's rows spread over ``n_salts``
    reducers; phase 2 merges partials by keys.  ``salt_col`` is any
    column that varies within a key (a row id, a timestamp)."""
    for name, (fn, _col) in aggs.items():
        if fn not in _MERGEABLE:
            raise ValueError(
                f"{name}: {fn} is not decomposable; use groupBy directly"
            )
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).alias("__salt")
    phase1 = df.groupBy(*keys, salt).agg(*[
        (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(c)).alias(name)
        for name, (fn, c) in aggs.items()
    ])
    return phase1.groupBy(*keys).agg(*[
        _MERGEABLE[fn](name).alias(name) for name, (fn, _c) in aggs.items()
    ])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt_uniquifier: str | Column | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join with the big side salted and the small side
    replicated ``n_salts`` times, so a hot join key spreads over
    ``n_salts`` tasks instead of melting one.

    Use when the small side is too big to broadcast outright but its
    ``n_salts``-fold replication still shuffles less than the hot
    key's row mass.  ``salt_uniquifier`` defaults to
    ``monotonically_increasing_id()`` on the big side (deterministic
    per partition layout)."""
    keys = [on] if isinstance(on, str) else list(on)
    uniq = (
        F.col(salt_uniquifier) if isinstance(salt_uniquifier, str)
        else salt_uniquifier
        if salt_uniquifier is not None
        else F.monotonically_increasing_id()
    )
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(uniq), F.lit(n_salts)).cast("int")
    )
    small_s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    out = big_s.join(small_s, on=keys + ["__salt"], how=how)
    return out.drop("__salt")
