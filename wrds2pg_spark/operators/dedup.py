"""Deduplication operators for document corpora, each designed for the
100-TB regime:

- exact            hash-groupBy on content hash: one shuffle, fully
                   distributed, keeps deterministic representative
- ngram_jaccard    exact word-set Jaccard within blocking keys:
                   equi-join on the block, array_intersect in codegen
- minhash_lsh      MinHash signatures (zero-shuffle, per-row HOFs) +
                   banded LSH bucketing (shuffle on band hash) +
                   exact-Jaccard verification of candidates only —
                   the classic near-linear near-dup pipeline
- simhash          64-bit SimHash fingerprints per document (per-row
                   HOFs only; grouping exact-matching fingerprints)

All hashing uses Spark's built-in xxhash64 (JVM, codegen) — no Python
in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from wrds2pg_spark.functions.text import shingles, tokens

__all__ = [
    "dedup_exact", "ngram_jaccard_pairs", "minhash_lsh_pairs",
    "simhash_fingerprints",
]


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct text: deterministic representative
    (min id), duplicate count, and the content hash.

    Scale: groupBy on md5(text) — a single hash shuffle where only the
    hash + id travel, not the document bodies."""
    h = F.md5(F.col(text_col)).alias("text_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select(id_col, "text_hash", "n_dups")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    block_cols: list[str],
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact word-set Jaccard over all pairs sharing a blocking key.

    Blocking bounds the pair count (per-block quadratic, globally
    linear in block count); the set intersection runs as
    ``array_intersect`` inside whole-stage codegen.  For unblocked
    corpora use :func:`minhash_lsh_pairs` instead."""
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.array_distinct(tokens(F.col(text_col))).alias("__toks"),
    )
    a = base.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_a"), F.col("__toks").alias("toks_a"),
    )
    b = base.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_b"), F.col("__toks").alias("toks_b"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = (
        F.size("toks_a").cast("double") + F.size("toks_b").cast("double") - inter
    )
    jac = F.round(inter / union, 6)
    return (
        a.join(b, on=block_cols, how="inner")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            *block_cols, "id_a", "id_b", jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature(text_f, num_hashes: int = 64):
    """num_hashes MinHash values, each ``min(xxhash64(shingle, seed))``
    — computed per row with higher-order functions: NO shuffle, no
    explode, no Python."""
    # NB: lambdas passed to HOFs must stay single-argument — a second
    # (defaulted) parameter makes PySpark's arity sniffing pass the
    # element *index* into it.  A factory closure captures seeds safely.
    sh = shingles(text_f)

    def one_hash(i: int):
        return F.array_min(
            F.transform(sh, lambda s: F.xxhash64(s, F.lit(i)))
        ).alias(f"mh_{i}")

    return [one_hash(i) for i in range(num_hashes)]


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs, verified exactly.

    Stage 1 (map-only): 64 minhashes per doc via HOFs.
    Stage 2: band hashes -> explode to (band, hash) -> the ONLY
             shuffle groups docs by bucket.
    Stage 3: pairs within buckets, de-duplicated.
    Stage 4: candidates only are verified with exact shingle Jaccard.

    At 100 TB the candidate set is tiny relative to N^2 — cost is one
    shuffle of (band_hash, id) pairs plus the verification join."""
    rows_per_band = num_hashes // bands
    # Explode shingles once, then num_hashes tiny min-aggregates over a
    # plain column.  (Computing 64 array_min(transform(shingles(text)))
    # columns instead makes Catalyst inline the whole tokenize+shingle
    # subtree 64x — a multi-minute analysis/codegen blowup.)
    base = df.select(
        F.col(id_col),
        F.array_distinct(shingles(F.col(text_col))).alias("__sh"),
    )
    exploded = base.select(id_col, F.explode("__sh").alias("__s"))
    sigs = exploded.groupBy(id_col).agg(*[
        F.min(F.xxhash64(F.col("__s"), F.lit(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ])
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * rows_per_band + r}")
                     for r in range(rows_per_band)], F.lit(b)).alias(f"band_{b}")
        for b in range(bands)
    ]
    # Band/bucket join moves ONLY (band, bhash, id) — never the shingle
    # arrays (carrying them 16x through the shuffle dominates runtime).
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), band_cols[b].alias("bhash"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bhash")

    a = banded.select("band", "bhash", F.col(id_col).alias("id_a"))
    b = banded.select("band", "bhash", F.col(id_col).alias("id_b"))
    cand = (
        a.join(b, on=["band", "bhash"], how="inner")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # verification join pulls each side's shingle set exactly once
    sh_a = base.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a"))
    sh_b = base.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b"))
    cand = cand.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a").cast("double") + F.size("sh_b").cast("double") - inter
    jac = F.round(inter / F.greatest(union, F.lit(1.0)), 6)
    return (
        cand.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per document as a bit string (per-row HOFs only).

    bit_i = sign of sum over tokens of (2*bit_i(xxhash64(token)) - 1);
    near-dups have small Hamming distance.  Also emits the count of
    docs sharing the exact fingerprint (one groupBy-count shuffle)."""
    toks = F.array_distinct(tokens(F.col(text_col)))

    def bit_expr(i: int):
        # single-arg lambda only (see minhash_signature note)
        contrib = F.transform(
            toks,
            lambda t: F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) * 2 - 1,
        )
        s = F.aggregate(contrib, F.lit(0).cast("long"), lambda acc, x: acc + x)
        return F.when(s > 0, F.lit("1")).otherwise(F.lit("0"))

    bit_exprs = [bit_expr(i) for i in range(bits)]
    fp = F.concat(*bit_exprs).alias("simhash")
    out = df.select(F.col(id_col), fp)
    counts = out.groupBy("simhash").agg(F.count(F.lit(1)).alias("n_same"))
    return out.join(counts, on="simhash", how="inner").select(
        id_col, "simhash", "n_same"
    )
