"""Bucketed tables must eliminate the join/agg exchange — the pay-the-
shuffle-once-at-ingest contract of sinks/bucketed.py."""

import pytest

from pyspark.sql import functions as F

from wrds2pg_spark.sinks.bucketed import read_bucketed, write_bucketed
from wrds2pg_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture()
def bucketed_tables(spark):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", N_BUCKETS,
                   sort_cols="o_orderkey")
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", N_BUCKETS,
                   sort_cols="l_orderkey")
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    ot, lt = bucketed_tables
    o = read_bucketed(spark, ot)
    li = read_bucketed(spark, lt)
    joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    # at sf0.001 the planner would broadcast the tiny side and skip the
    # buckets entirely; disable auto-broadcast to exercise the path a
    # 100-TB fact-fact join takes (sort-merge over co-located buckets)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan       # co-located: no shuffle either side
    # row parity with the plain (shuffling) join
    plain = (
        load_table(spark, SF, "lineitem")
        .join(load_table(spark, SF, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
    )
    assert joined.count() == plain.count()


def test_bucketed_agg_no_exchange(spark, bucketed_tables):
    _, lt = bucketed_tables
    li = read_bucketed(spark, lt)
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan       # bucketing satisfies the grouping
    assert agg.count() == li.select("l_orderkey").distinct().count()
