"""Round-6 q5_bucketed variant probe at sf1 (throwaway measurement).

v0: r4 registered shape (broadcast full customer + 3 dim builds)
v1: bucket-SMJ first, consolidated Asian dim broadcast, customer
    2-col probe hint-free (planner decides)
v2: v1 + scaled-long pre-agg on (o_custkey, s_nationkey, n_name)
    below the customer join (the at-cluster-scale form)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from wrds2pg_spark.functions.numeric import dsum  # noqa: E402
from wrds2pg_spark.queries import _bucketed_fact  # noqa: E402
from wrds2pg_spark.session import get_spark  # noqa: E402
from wrds2pg_spark.sources.testdata import load_table  # noqa: E402


def dims(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asian = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name")
    sn = s.join(
        F.broadcast(asian), s.s_nationkey == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    return sn


def v0(spark, sf_dir):
    o = _bucketed_fact(spark, sf_dir, "orders", "o_orderkey")
    li = _bucketed_fact(spark, sf_dir, "lineitem", "l_orderkey")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(rev, 4).alias("revenue"))
    )


def v1(spark, sf_dir):
    o = _bucketed_fact(spark, sf_dir, "orders", "o_orderkey")
    li = _bucketed_fact(spark, sf_dir, "lineitem", "l_orderkey")
    sn = dims(spark, sf_dir)
    cd = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    lo = o.select("o_orderkey", "o_custkey").join(
        li.select("l_orderkey", "l_suppkey", "l_extendedprice",
                  "l_discount"),
        F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        lo.join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            cd,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(rev, 4).alias("revenue"))
    )


def v2(spark, sf_dir):
    o = _bucketed_fact(spark, sf_dir, "orders", "o_orderkey")
    li = _bucketed_fact(spark, sf_dir, "lineitem", "l_orderkey")
    sn = dims(spark, sf_dir)
    cd = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    lo = o.select("o_orderkey", "o_custkey").join(
        li.select("l_orderkey", "l_suppkey", "l_extendedprice",
                  "l_discount"),
        F.col("l_orderkey") == F.col("o_orderkey"))
    pre = (
        lo.join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("o_custkey", "s_nationkey", "n_name")
        .agg(F.sum(
            F.round(rev * 10000.0, 0).cast("long")).alias("__s"))
    )
    return (
        pre.join(
            cd,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg((F.sum("__s").cast("double") / 10000.0).alias("revenue"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    which = sys.argv[2].split(",") if len(sys.argv) > 2 else ["v0", "v1", "v2"]
    spark = get_spark(app_name="q5_variants")
    fns = {"v0": v0, "v1": v1, "v2": v2}

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    for name in which:  # warm + bucket build
        mat(fns[name](spark, sf_dir))
    out = {}
    for _ in range(2):
        for name in which:
            t0 = time.perf_counter()
            mat(fns[name](spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            if name not in out or dt < out[name]:
                out[name] = dt
    # sanity: same 5 rows
    rows = {n: sorted(map(tuple, fns[n](spark, sf_dir).collect()))
            for n in which}
    agree = all(rows[n] == rows[which[0]] for n in which)
    print(json.dumps({"times": out, "rows_agree": agree}))


if __name__ == "__main__":
    main()
