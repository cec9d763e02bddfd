"""Round-11 bigram/BPE audit A/B (VERDICT item 4): does checkpointing
the BPE chain's round-1 seed string frame (2 consumers: round-1
best_pair + round-1 merge) beat re-evaluating the scan + lowercase +
separator-join twice?

Same-session interleaved min-of-N per the box-weather doctrine.

Usage: python tools/bpe_seed_variants.py [rounds]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from wrds2pg_spark.corpus import _bpe_chain  # noqa: E402
from wrds2pg_spark.session import FAN_OUT_2MB, fan_out, get_spark  # noqa: E402
from wrds2pg_spark.sources.testdata import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def merges(spark, sf_dir, seed_cut):
    docs = fan_out(load_table(spark, sf_dir, "documents"),
                   min_bytes=FAN_OUT_2MB)
    bests, _final = _bpe_chain(docs, seed_cut=seed_cut)
    outs = [
        b.select(
            F.lit(r).cast("long").alias("round"),
            "w1", "w2",
            F.concat("w1", "w2").alias("merged"),
            F.col("cnt").cast("long").alias("cnt"))
        for r, b in enumerate(bests, start=1)
    ]
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def compression(spark, sf_dir, seed_cut):
    docs = fan_out(load_table(spark, sf_dir, "documents"),
                   min_bytes=FAN_OUT_2MB)
    pre = docs.withColumn(
        "n0", F.size(F.split(F.lower(F.col("text")), " ")).cast("long"))
    _bests, final = _bpe_chain(pre, extra_cols=("source", "n0"),
                               seed_cut=seed_cut)
    return final.groupBy("source").agg(
        F.sum("n0").alias("n_tokens_before"),
        F.sum(F.size("t").cast("long")).alias("n_tokens_after"),
        F.round(
            F.lit(1.0)
            - F.sum(F.size("t").cast("long")).cast("double")
            / F.sum("n0").cast("double"), 6
        ).alias("saved_frac"),
    )


PAIRS = {
    "merges": (lambda s, d: merges(s, d, False),
               lambda s, d: merges(s, d, True)),
    "compress": (lambda s, d: compression(s, d, False),
                 lambda s, d: compression(s, d, True)),
}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(
        app_name="bpe_seed_variants",
        extra_conf={"spark.sql.files.maxPartitionBytes": "8m"},
    )

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    for name in PAIRS:
        for fn in PAIRS[name]:
            mat(fn(spark, SF))
    best: dict[str, float] = {}
    for r in range(rounds):
        for name in PAIRS:
            for tag, fn in zip(("v0", "v1"), PAIRS[name]):
                t0 = time.perf_counter()
                mat(fn(spark, SF))
                dt = time.perf_counter() - t0
                key = f"{name}:{tag}"
                if key not in best or dt < best[key]:
                    best[key] = dt
                print(f"round {r} {key:14s} {dt:6.3f}", flush=True)
    print("--- min over rounds ---")
    for k, v in sorted(best.items()):
        print(f"{k:14s} {v:6.3f}")


if __name__ == "__main__":
    main()
