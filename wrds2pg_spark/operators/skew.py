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

__all__ = ["salted_agg", "salted_join", "cap_block_rows"]


def cap_block_rows(
    df: DataFrame,
    block_col: str | Column,
    id_col: str,
    cap: int,
) -> DataFrame:
    """Keep at most ``cap`` rows per block — the hub-block safety
    valve for per-block quadratic pair generators (same contract as
    minhash_lsh_pairs' max_bucket_size, operators/dedup.py: the first
    ``cap`` ids in sorted order, deterministic).

    Built for the common case where NO block exceeds the cap: the
    hot path is untouched — no window, no shuffle of payload columns
    (a row_number cap would exchange+sort every row incl. wide
    vector payloads; measured 3x slower on embedding pairs).  Instead
    a narrow (block, id) projection aggregates per-block counts, the
    (rare, by definition) oversized blocks broadcast their allowed-id
    lists, and payload rows pass unless their block is oversized AND
    their id is outside the first ``cap``.  Broadcast size is bounded
    by n_hubs * cap ids — hubs are few or they wouldn't be hubs.
    ``block_col`` may be an expression (e.g. an LSH signature); it is
    evaluated once per row in the narrow projection and once in
    ``df`` itself.

    NULL block keys form a real (cappable) group: the hub probe joins
    null-safely, so a mega-block of nulls cannot bypass the valve.

    Memory note: the allowed-id list for one hub materializes in a
    single aggregation buffer before the slice — O(hub_rows) ids, not
    O(cap).  Ids are narrow scalars so this is fine for hubs up to
    ~10^8 rows; beyond that, pre-filter the pathological block by an
    approximate count before calling this (the valve protects pair
    generators whose blocks are orders of magnitude smaller)."""
    bcol = F.col(block_col) if isinstance(block_col, str) else block_col
    ids = df.select(bcol.alias("__blk"), F.col(id_col))
    hubs = ids.groupBy("__blk").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.slice(F.sort_array(F.collect_list(id_col)), 1, cap).alias("__ids"),
    ).filter(F.col("__cnt") > cap).select(
        F.col("__blk").alias("__hblk"), "__ids"
    )
    # one broadcast null-safe left join: non-hub rows see a null
    # allowed-list and pass; hub rows pay an O(cap) membership probe —
    # trivial next to the O(block) pair work the cap is preventing.
    return (
        df.withColumn("__blk", bcol)
        .join(
            F.broadcast(hubs),
            F.col("__blk").eqNullSafe(F.col("__hblk")),
            "left",
        )
        .filter(
            F.col("__ids").isNull()
            | F.array_contains(F.col("__ids"), F.col(id_col))
        )
        .drop("__blk", "__hblk", "__ids")
    )

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
