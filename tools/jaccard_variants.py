"""Round-6 graph_jaccard_neighbors variant probe at sf1 (throwaway).

v0: registered form (4-column group key: s_a, s_b, d_a, d_b)
v1: packed (s_a<<32)|s_b single-long group key, degrees ride as
    first() agg buffers
v2: narrowest agg (pack + count only), degrees re-attached post-agg
    from the supplier-degree table (hint-free joins)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from wrds2pg_spark.operators.skew import cap_block_rows  # noqa: E402
from wrds2pg_spark.queries import _JACCARD_BLOCK_CAP  # noqa: E402
from wrds2pg_spark.session import get_spark  # noqa: E402
from wrds2pg_spark.sources.testdata import load_table  # noqa: E402


def edges(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct().withColumn(
        "d", F.count(F.lit(1)).over(W.partitionBy("s"))
    ).localCheckpoint()


def finish(com):
    return (
        com.select(
            "s_a", "s_b", "n_common",
            (F.col("n_common").cast("double")
             / (F.col("d_a") + F.col("d_b") - F.col("n_common")))
            .alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "s_a", "s_b")
        .limit(100)
    )


def v0(spark, sf_dir):
    capped = cap_block_rows(edges(spark, sf_dir), "p", "s",
                            _JACCARD_BLOCK_CAP)
    a = capped.alias("a")
    b = capped.alias("b").hint("shuffle_hash")
    com = (
        a.join(b, (F.col("a.p") == F.col("b.p"))
               & (F.col("a.s") < F.col("b.s")))
        .groupBy(
            F.col("a.s").alias("s_a"), F.col("b.s").alias("s_b"),
            F.col("a.d").alias("d_a"), F.col("b.d").alias("d_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return finish(com)


def v1(spark, sf_dir):
    capped = cap_block_rows(edges(spark, sf_dir), "p", "s",
                            _JACCARD_BLOCK_CAP)
    a = capped.alias("a")
    b = capped.alias("b").hint("shuffle_hash")
    com = (
        a.join(b, (F.col("a.p") == F.col("b.p"))
               & (F.col("a.s") < F.col("b.s")))
        .groupBy(
            (F.shiftleft(F.col("a.s"), 32) + F.col("b.s")).alias("pk"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first("a.d").alias("d_a"),
            F.first("b.d").alias("d_b"),
        )
        .select(
            F.shiftright("pk", 32).alias("s_a"),
            (F.col("pk") - F.shiftleft(F.shiftright("pk", 32), 32))
            .alias("s_b"),
            "n_common", "d_a", "d_b",
        )
    )
    return finish(com)


def v2(spark, sf_dir):
    e = edges(spark, sf_dir)
    capped = cap_block_rows(e, "p", "s", _JACCARD_BLOCK_CAP)
    deg = e.select("s", "d").distinct()
    a = capped.alias("a")
    b = capped.alias("b").hint("shuffle_hash")
    pairs = (
        a.join(b, (F.col("a.p") == F.col("b.p"))
               & (F.col("a.s") < F.col("b.s")))
        .groupBy(
            (F.shiftleft(F.col("a.s"), 32) + F.col("b.s")).alias("pk"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .select(
            F.shiftright("pk", 32).alias("s_a"),
            (F.col("pk") - F.shiftleft(F.shiftright("pk", 32), 32))
            .alias("s_b"),
            "n_common",
        )
    )
    com = (
        pairs.join(deg.select(F.col("s").alias("s_a"),
                              F.col("d").alias("d_a")), "s_a")
        .join(deg.select(F.col("s").alias("s_b"),
                         F.col("d").alias("d_b")), "s_b")
    )
    return finish(com)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    which = sys.argv[2].split(",") if len(sys.argv) > 2 else ["v0", "v1", "v2"]
    spark = get_spark(app_name="jaccard_variants")
    fns = {"v0": v0, "v1": v1, "v2": v2}

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    for name in which:
        mat(fns[name](spark, sf_dir))
    out = {}
    for _ in range(2):
        for name in which:
            t0 = time.perf_counter()
            mat(fns[name](spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            if name not in out or dt < out[name]:
                out[name] = dt
    rows = {n: sorted(map(tuple, fns[n](spark, sf_dir).collect()))
            for n in which}
    agree = all(rows[n] == rows[which[0]] for n in which)
    print(json.dumps({"times": out, "rows_agree": agree}))


if __name__ == "__main__":
    main()
