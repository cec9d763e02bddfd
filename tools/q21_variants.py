"""A/B q21 forms at a given SF_DIR (round 7, VERDICT item 2).

Usage: python tools/q21_variants.py [sf_dir]

A = registered window form (agg + per-order window: in-partition SORT
    of the agg output is the data-bound cost).
B = agg-agg form: second per-order hash aggregate with
    max(when(supp_late=1, suppkey)) extracting THE sole late supplier
    — no sort anywhere, same bucket partitioning, one row per
    qualifying order instead of a window + filter over every row.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wrds2pg_spark.queries import REGISTRY, _bucketed_fact  # noqa: E402
from wrds2pg_spark.session import get_spark  # noqa: E402
from wrds2pg_spark.sources.testdata import load_table  # noqa: E402


def variant_b(spark, sf_dir):
    li = _bucketed_fact(spark, sf_dir, "lineitem", "l_orderkey")
    o = _bucketed_fact(spark, sf_dir, "orders", "o_orderkey").filter(
        F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey",
        F.when(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
            1,
        ).otherwise(0).alias("late"),
    )
    per_os = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("supp_late"))
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("supp_late").alias("n_late"),
        F.max(F.when(F.col("supp_late") == 1, F.col("l_suppkey")))
        .alias("late_supp"),
    )
    return (
        per_o.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark(app_name="q21_variants")

    forms = {
        "A_window": lambda: REGISTRY["tpch_q21_bucketed"].fn(spark, sf_dir),
        "B_aggagg": lambda: variant_b(spark, sf_dir),
    }

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    for _ in range(2):
        for f in forms.values():
            mat(f())
    best: dict[str, float] = {}
    for _ in range(6):  # alternate to decorrelate box noise
        for name, f in forms.items():
            t0 = time.perf_counter()
            mat(f())
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, 9e9), dt)
    for name, t in best.items():
        print(f"{name}: {t:.3f}s")
    a = {tuple(r) for r in forms["A_window"]().collect()}
    b = {tuple(r) for r in forms["B_aggagg"]().collect()}
    print("rows equal:", a == b, len(a))


if __name__ == "__main__":
    main()
