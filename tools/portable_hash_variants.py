"""A/B the portable-md5 constant in agg_cms_topk / dq_table_checksum
(round 9, VERDICT directive 3).

Variants, all bit-portable to DuckDB:
  cms_current      — 3 string bucket keys '<i>:' || substr(md5,8i+1,3)
  cms_intbucket    — ONE conv(substr(md5,1,9),16,10) -> bigint, then
                     bucket_i = i*4096 + ((v >> 12i) & 4095): integer
                     group keys, bit ops instead of string concat
  chk_current      — md5 row digest, 2x conv(substr(h,..,8)) slices
  chk_singleconv   — ONE conv(substr(h,1,15),16,10) (60 bits), slices
                     via shift/mask: (v>>30) and (v & (2^30-1))

    python tools/portable_hash_variants.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from wrds2pg_spark.queries import REGISTRY, load_table  # noqa: E402
from wrds2pg_spark.session import get_spark  # noqa: E402

DEPTH, WIDTH = 3, 4096


def cms_intbucket(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")

    def buckets(key):
        v = F.conv(F.substring(F.md5(key), 1, 9), 16, 10).cast("long")
        return F.array(*[
            (F.lit(i * WIDTH)
             + F.shiftrightunsigned(v, 12 * i).bitwiseAND(F.lit(WIDTH - 1))
             ).cast("int")
            for i in range(DEPTH)])

    key = F.col("l_suppkey").cast("string")
    posting = li.select(F.explode(buckets(key)).alias("db"))
    counters = posting.groupBy("db").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    exact = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).cast("long").alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), "suppkey").limit(20)
    probes = top.select(
        "suppkey", "exact_n",
        F.explode(buckets(F.col("suppkey").cast("string"))).alias("db"))
    return (
        probes.join(counters, "db")
        .groupBy("suppkey", "exact_n")
        .agg(F.min("n").alias("cms_est"))
        .select("suppkey", "exact_n", "cms_est",
                (F.col("cms_est") - F.col("exact_n")).alias("cms_overcount")))


def cms_presum(spark, sf_dir):
    """Count-then-sketch: exact per-key counts FIRST (one scan), then
    buckets over the ~distinct-key-sized aggregate weighted by the
    count — counters are value-identical (bucket depends only on the
    key), md5 runs over |keys| rows instead of |items|."""
    from wrds2pg_spark.curation import _CMS_DEPTH, _cms_bucket_col

    li = load_table(spark, sf_dir, "lineitem")
    exact = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).cast("long").alias("exact_n"))
    exact = exact.localCheckpoint(eager=False)
    skey = F.col("suppkey").cast("string")
    posting = exact.select(
        F.col("exact_n"),
        F.explode(F.array(
            *[_cms_bucket_col(i, skey) for i in range(_CMS_DEPTH)]
        )).alias("db"))
    counters = posting.groupBy("db").agg(
        F.sum("exact_n").cast("long").alias("n"))
    top = exact.orderBy(F.desc("exact_n"), "suppkey").limit(20)
    probes = top.select(
        "suppkey", "exact_n",
        F.explode(F.array(
            *[_cms_bucket_col(i, skey) for i in range(_CMS_DEPTH)]
        )).alias("db"))
    return (
        probes.join(counters, "db")
        .groupBy("suppkey", "exact_n")
        .agg(F.min("n").alias("cms_est"))
        .select("suppkey", "exact_n", "cms_est",
                (F.col("cms_est") - F.col("exact_n")).alias("cms_overcount")))


def chk_singleconv(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    NULLM = "\x01"
    BS = "\\"

    def esc(c):
        c = F.replace(c, F.lit(BS), F.lit(BS + BS))
        c = F.replace(c, F.lit("|"), F.lit(BS + "|"))
        return F.replace(c, F.lit(NULLM), F.lit(BS + NULLM))

    def f(c, free_text=False):
        if free_text:
            c = esc(c)
        return F.when(c.isNull(), F.lit(NULLM)).otherwise(c)

    enc = F.md5(F.concat_ws(
        "|",
        f(F.col("o_orderkey").cast("string")),
        f(F.col("o_custkey").cast("string")),
        f(F.col("o_orderstatus"), free_text=True),
        f(F.expr("cast(round(o_totalprice * 100, 0) as bigint)")
          .cast("string")),
        f(F.col("o_orderdate").cast("timestamp").cast("long")
          .cast("string")),
        f(F.col("o_orderpriority"), free_text=True),
    ))
    v = F.conv(F.substring(enc, 1, 15), 16, 10).cast("long")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.shiftrightunsigned(v, 30) % F.lit(1000000007))
            .cast("long").alias("chk1"),
            F.sum(v.bitwiseAND(F.lit((1 << 30) - 1)) % F.lit(1000000007))
            .cast("long").alias("chk2"),
        ))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="portable_hash_ab",
        extra_conf={"spark.sql.files.maxPartitionBytes": "8m"},
    )
    variants = {
        "cms_current": REGISTRY["agg_cms_topk"].fn,
        "cms_intbucket": cms_intbucket,
        "cms_presum": cms_presum,
        "chk_current": REGISTRY["dq_table_checksum"].fn,
        "chk_singleconv": chk_singleconv,
    }

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    for fn in variants.values():
        mat(fn(spark, "/root/testdata/sf0.001"))
    for _ in range(2):
        for fn in variants.values():
            mat(fn(spark, sf_dir))
    times: dict[str, float] = {}
    for _ in range(3):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            mat(fn(spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
    for name, dt in times.items():
        print(f"{name:35s} {dt:7.3f}")

    # sanity: estimates must still dominate exact counts and the
    # variant's exact/est values must match the current key's
    cur = {(r["suppkey"], r["exact_n"])
           for r in REGISTRY["agg_cms_topk"].fn(spark, sf_dir).collect()}
    new = {(r["suppkey"], r["exact_n"])
           for r in cms_intbucket(spark, sf_dir).collect()}
    print("cms top-20 sets equal:", cur == new)


if __name__ == "__main__":
    main()
