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

from wrds2pg_spark.functions.expr import let_
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


def minhash_signature(shingle_arr, num_hashes: int = 64):
    """MinHash signature as ONE array column: for each seed i,
    ``min(xxhash64(shingle, i))`` — computed per row with nested
    higher-order functions.  NO shuffle, no explode, no Python; the
    shingle array is let_-bound so it is materialized once per row
    (not once per seed — Catalyst would otherwise inline the whole
    tokenize+shingle subtree ``num_hashes`` times)."""
    return let_(
        shingle_arr,
        lambda sh: F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(s, i))),
        ),
    )


def bucket_keys(shingle_hashes, num_hashes: int = 64, bands: int = 16):
    """LSH bucket keys as ONE array column, pure JVM expressions.

    MinHash signature (per seed i: ``min(xxhash64(h, i))`` over the
    shingle-hash set) -> per band, ``xxhash64`` of its signature slice
    salted with the band index, so keys never collide across bands —
    a single long join key instead of a (band, hash) pair halves the
    shuffle payload.  Everything is let_-bound: the shingle-hash array
    and the signature each evaluate exactly once per row (see
    functions/expr.py for the collapsed-projection trap).

    A vectorized numpy/Pandas-UDF variant of this kernel benchmarked
    *slower* end-to-end (Arrow transfer + Python-worker round-trips
    add seconds of jitter per stage); the nested-HOF form stays in the
    JVM and costs ~0.4s for 5k docs x 64 seeds x ~50 shingles."""
    rpb = num_hashes // bands
    return let_(
        minhash_signature(shingle_hashes, num_hashes),
        lambda sig: F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.xxhash64(F.slice(sig, b * rpb + 1, rpb), b),
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs, verified exactly.

    Stage 1 (map-only): shingle the text and xxhash64 each shingle
             JVM-side; nested-HOF MinHash turns the hash set into
             ``bands`` LSH bucket keys (see bucket_keys).
    Stage 2: explode keys -> groupBy(bucket) + sorted collect_list:
             the ONLY heavy shuffle moves (key, id) longs, and the
             expensive map work runs exactly ONCE (a banded self-join
             would re-execute the whole signature pipeline per side).
    Stage 3: pairs generated per bucket from the sorted id list,
             de-duplicated across bands.
    Stage 4: candidates only are verified with exact Jaccard over the
             shingle-hash sets (long intersects, not string).

    At 100 TB the candidate set is tiny relative to N^2 — cost is one
    shuffle of (bucket_key, id) pairs plus the verification joins.
    A pathological mega-bucket (all-identical corpus slice) generates
    its pairs inside one task; AQE skew handling plus the upstream
    exact-dedup pass (run dedup_exact first) keeps buckets small."""
    base = df.select(
        F.col(id_col),
        F.transform(shingles(F.col(text_col)), lambda s: F.xxhash64(s)).alias(
            "__shh"
        ),
    )
    keyed = base.select(
        F.col(id_col),
        F.explode(bucket_keys(F.col("__shh"), num_hashes, bands)).alias(
            "bucket"
        ),
    )
    buckets = (
        keyed.groupBy("bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    # (ids[j], ids[i]) for j < i — ids is a materialized agg output, so
    # element_at here is a cheap array access, not a recompute.
    pair_structs = let_(
        F.col("ids"),
        lambda ids: F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.size(ids) - 1),
                lambda i: F.transform(
                    F.slice(ids, 1, i),
                    lambda a: F.struct(
                        a.alias("id_a"),
                        F.element_at(ids, (i + 1).cast("int")).alias("id_b"),
                    ),
                ),
            )
        ),
    )
    cand = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # Verification: make the (tiny) candidate set the BROADCAST side of
    # both joins.  The broadcast exchange is built once and reused, so
    # the whole signature pipeline above executes exactly once — and
    # shingle-hashing for verification happens AFTER the join, i.e.
    # only for candidate rows, never a second full-corpus pass.
    hash_of = lambda c: F.transform(shingles(c), lambda s: F.xxhash64(s))
    side_a = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("__ta"))
    j = (
        side_a.join(F.broadcast(cand), "id_a")
        .select("id_a", "id_b", hash_of(F.col("__ta")).alias("sh_a"))
    )
    side_b = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("__tb"))
    j = (
        side_b.join(F.broadcast(j), "id_b")
        .select("id_a", "id_b", "sh_a", hash_of(F.col("__tb")).alias("sh_b"))
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a").cast("double") + F.size("sh_b").cast("double") - inter
    jac = F.round(inter / F.greatest(union, F.lit(1.0)), 6)
    return (
        j.select("id_a", "id_b", jac.alias("jaccard"))
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
    docs sharing the exact fingerprint (one groupBy-count shuffle).

    The token hashes are let_-bound: each token is xxhash64'd once per
    row, then all ``bits`` bit-sums fold over the hash array — not
    ``bits`` separate re-tokenizations (the collapsed-projection trap,
    see functions/expr.py)."""
    tok_hashes = F.transform(
        F.array_distinct(tokens(F.col(text_col))), lambda t: F.xxhash64(t)
    )

    def fp_of(hs):
        def bit_expr(i: int):
            contrib = F.transform(
                hs, lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1
            )
            s = F.aggregate(contrib, F.lit(0).cast("long"), lambda a, x: a + x)
            return F.when(s > 0, F.lit("1")).otherwise(F.lit("0"))

        return F.concat(*[bit_expr(i) for i in range(bits)])

    fp = let_(tok_hashes, fp_of).alias("simhash")
    out = df.select(F.col(id_col), fp)
    # window count, NOT a groupBy+self-join: the join re-executes the
    # whole 64-bit fold for its second input; the window shares one
    # evaluation and one shuffle on the fingerprint
    return out.select(
        id_col, "simhash",
        F.count(F.lit(1)).over(W.partitionBy("simhash")).alias("n_same"),
    )
