"""A/B text_bigram_logprob forms at SF_DIR (round 7, VERDICT item 3).

A = registered string-keyed form.
B = fingerprint-keyed: every join key is xxhash64 (bigram -> one
    long, w1 -> one long) so the dg exchange and both count joins
    carry 8-byte keys instead of 2 strings.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from wrds2pg_spark.corpus import _tokens  # noqa: E402
from wrds2pg_spark.queries import REGISTRY  # noqa: E402
from wrds2pg_spark.session import get_spark  # noqa: E402
from wrds2pg_spark.sources.testdata import load_table  # noqa: E402


def variant_b(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.col("text")), " ")
    pairs = F.zip_with(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = (
        docs.filter(F.size(t) >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select(
            "doc_id",
            F.xxhash64(F.col("p.w1"), F.col("p.w2")).alias("bg"),
            F.xxhash64(F.col("p.w1")).alias("h1"),
        )
    )
    dg = big.groupBy("doc_id", "bg", "h1").agg(
        F.count(F.lit(1)).alias("k")).localCheckpoint(eager=False)
    uni = (
        _tokens(docs).groupBy("token").agg(F.count(F.lit(1)).alias("c1"))
        .withColumn(
            "vocab",
            F.count(F.lit(1)).over(W.partitionBy()).cast("double"))
        .select(F.xxhash64("token").alias("h1"), "c1", "vocab")
    )
    bif = dg.groupBy("bg").agg(F.sum("k").alias("c12"))
    scored = (
        dg.join(bif, "bg")
        .join(uni, "h1")
        .select(
            "doc_id",
            "k",
            F.round(
                -F.log((F.col("c12") + F.lit(1))
                       / (F.col("c1") + F.col("vocab"))), 6
            ).alias("nll"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("k").cast("long").alias("c"),
        F.sum(F.col("k")
              * F.round(F.col("nll") * F.lit(1e6), 0).cast("long"))
        .alias("s"),
    )
    return agg.select(
        "doc_id",
        F.col("c").alias("n_bigrams"),
        (F.expr("CAST((2 * s + c) DIV (2 * c) AS DOUBLE)")
         / F.lit(1e6)).alias("avg_nll"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark(app_name="bigram_variants")
    forms = {
        "A_strings": lambda: REGISTRY["text_bigram_logprob"].fn(
            spark, sf_dir),
        "B_fingerprint": lambda: variant_b(spark, sf_dir),
    }

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    for f in forms.values():
        mat(f())
    best: dict[str, float] = {}
    for _ in range(4):
        for name, f in forms.items():
            t0 = time.perf_counter()
            mat(f())
            best[name] = min(best.get(name, 9e9), time.perf_counter() - t0)
    for name, t in best.items():
        print(f"{name}: {t:.3f}s")
    a = {tuple(r) for r in forms["A_strings"]().collect()}
    b = {tuple(r) for r in forms["B_fingerprint"]().collect()}
    print("rows equal:", a == b, len(a))


if __name__ == "__main__":
    main()
