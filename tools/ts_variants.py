"""A/B ts_resample_ffill / ts_interpolate_linear forms (round 7,
VERDICT item 4).

A = registered spine form: users x broadcast(days) BNLJ -> left join
    daily -> big window over the dense grid.
B = generator form: ONE user-partitioned lead() window over daily,
    then each known day row EXPLODES its own gap days (sequence to
    next known day / global edge), carrying fill values row-locally.
    No spine join, no dense-grid shuffle, no ignorenulls frame scan.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from wrds2pg_spark.functions.numeric import dsum  # noqa: E402
from wrds2pg_spark.queries import REGISTRY  # noqa: E402
from wrds2pg_spark.session import get_spark  # noqa: E402
from wrds2pg_spark.sources.testdata import load_table  # noqa: E402

def _day():
    return F.expr("INTERVAL 1 DAY")


def _daily(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(dsum(F.col("value"), 2).alias("day_value")).localCheckpoint(
        eager=False)
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    return daily, bounds


def ffill_b(spark, sf_dir):
    daily, bounds = _daily(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("day")
    d2 = (
        daily
        .withColumn("next_day", F.lead("day").over(w))
        .withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(bounds))
    )
    # head rows: days before the user's first observation (null fill)
    head = d2.filter((F.col("rn") == 1) & (F.col("day") > F.col("d0"))).select(
        "user_id",
        F.explode(F.sequence(
            "d0", F.col("day") - _day(), _day())).alias("day"),
        F.lit(None).cast("double").alias("day_value"),
        F.lit(None).cast("double").alias("filled_value"),
    )
    # main rows: each known day emits itself + the gap up to the next
    # known day (exclusive) or the global end for the user's last row
    main = d2.select(
        "user_id",
        F.col("day").alias("kday"),
        "day_value",
        F.explode(F.sequence(
            "day",
            F.coalesce(F.col("next_day") - _day(), F.col("d1")),
            _day())).alias("day"),
    ).select(
        "user_id",
        "day",
        F.when(F.col("day") == F.col("kday"), F.col("day_value"))
        .alias("day_value"),
        F.col("day_value").alias("filled_value"),
    )
    return head.unionByName(main.select(*head.columns))


def interp_b(spark, sf_dir):
    daily, bounds = _daily(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("day")
    d2 = (
        daily
        .withColumn("next_day", F.lead("day").over(w))
        .withColumn("next_value", F.lead("day_value").over(w))
        .withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(bounds))
    )
    head = d2.filter((F.col("rn") == 1) & (F.col("day") > F.col("d0"))).select(
        "user_id",
        F.explode(F.sequence(
            "d0", F.col("day") - _day(), _day())).alias("day"),
        F.lit(None).cast("double").alias("day_value"),
        F.round(F.col("day_value"), 6).alias("interp_value"),
    )
    gap_frac = (
        F.datediff(F.col("day"), F.col("kday")).cast("double")
        / F.datediff(F.col("next_day"), F.col("kday")).cast("double")
    )
    interp = (
        F.when(F.col("day") == F.col("kday"), F.col("day_value"))
        .when(F.col("next_value").isNull(), F.col("day_value"))
        .otherwise(
            F.col("day_value")
            + (F.col("next_value") - F.col("day_value")) * gap_frac)
    )
    main = d2.select(
        "user_id",
        F.col("day").alias("kday"),
        "day_value",
        "next_day",
        "next_value",
        F.explode(F.sequence(
            "day",
            F.coalesce(F.col("next_day") - _day(), F.col("d1")),
            _day())).alias("day"),
    ).select(
        "user_id",
        "day",
        F.when(F.col("day") == F.col("kday"), F.col("day_value"))
        .alias("day_value"),
        F.round(interp, 6).alias("interp_value"),
    )
    return head.unionByName(main.select(*head.columns))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark(app_name="ts_variants")
    forms = {
        "ffill_A": lambda: REGISTRY["ts_resample_ffill"].fn(spark, sf_dir),
        "ffill_B": lambda: ffill_b(spark, sf_dir),
        "interp_A": lambda: REGISTRY["ts_interpolate_linear"].fn(
            spark, sf_dir),
        "interp_B": lambda: interp_b(spark, sf_dir),
    }

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    for f in forms.values():
        mat(f())
    best: dict[str, float] = {}
    for _ in range(5):
        for name, f in forms.items():
            t0 = time.perf_counter()
            mat(f())
            best[name] = min(best.get(name, 9e9), time.perf_counter() - t0)
    for name, t in best.items():
        print(f"{name}: {t:.3f}s")

    def key(r):
        return (r["user_id"], r["day"])

    for pair in (("ffill_A", "ffill_B"), ("interp_A", "interp_B")):
        a = {key(r): tuple(r) for r in forms[pair[0]]().collect()}
        b = {key(r): tuple(r) for r in forms[pair[1]]().collect()}
        same = set(a) == set(b) and all(
            a[k][2:] == b[k][2:] for k in a)
        print(pair, "equal:", same, len(a), len(b))


if __name__ == "__main__":
    main()
