"""The oracle-checked query registry.

Every operator claimed in SURVEY.md §2 registers here as a
``QuerySpec``: a builder ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an equivalent DuckDB oracle SQL string run by the
driver on the same parquet tables.  ``__spark_entry__.py`` re-exports
``queries()`` / ``oracle_sql()`` from this module.

Determinism contract with the oracle (see functions/numeric.py):
- every computed column is aliased identically on both sides;
- double sums go through exact-decimal casts (order-independent);
- O(1)-magnitude derived floats are rounded to 6 decimals on both
  sides;
- queries that limit rows always order by a unique key first.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from wrds2pg_spark.functions.numeric import DAVG_SQL, DSUM_SQL, davg, dsum
from wrds2pg_spark.plans.ingest import IngestOptions, apply_options
from wrds2pg_spark.sources.testdata import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(fn, oracle)
        return fn
    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


# ---------------------------------------------------------------------------
# Scans & the ingest composite (reference operators A4-A9, SURVEY §2 Part A)
# ---------------------------------------------------------------------------

@register(
    "scan_parquet",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity < 10
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate reaching the parquet scan (Catalyst pushdown
    replaces the reference's keep=/where= dataset options, codegen.py:52-65)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") < 10))
    )


_FLAGSHIP_ORACLE = f"""
    WITH src AS (
        SELECT l_returnflag AS returnflag,
               l_linestatus AS linestatus,
               l_quantity, l_extendedprice, l_discount, l_tax
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT returnflag, linestatus,
           {DSUM_SQL('l_quantity', 2)} AS sum_qty,
           {DSUM_SQL('l_extendedprice', 2)} AS sum_base_price,
           {DSUM_SQL('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {DSUM_SQL('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {DAVG_SQL('l_quantity', 2)} AS avg_qty,
           {DAVG_SQL('l_extendedprice', 2)} AS avg_price,
           {DAVG_SQL('l_discount', 2)} AS avg_disc,
           COUNT(*) AS count_order
    FROM src
    GROUP BY returnflag, linestatus
"""


@register("ingest_q1_composite", oracle=_FLAGSHIP_ORACLE)
def ingest_q1_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's full ingest-option chain (keep + rename +
    SAS-dialect where, A4-A8) feeding a TPC-H-Q1-shape aggregation.

    The where string exercises the SAS dialect translation
    (``le`` + ``'02SEP1998'd`` date literal -> ``<= DATE '1998-09-02'``).
    """
    li = load_table(spark, sf_dir, "lineitem")
    src = apply_options(
        li,
        IngestOptions(
            keep=("l_returnflag l_linestatus l_quantity l_extendedprice "
                  "l_discount l_tax l_shipdate"),
            rename="l_returnflag=returnflag l_linestatus=linestatus",
            where="l_shipdate le '02SEP1998'd",
        ),
    )
    return (
        src.groupBy("returnflag", "linestatus")
        .agg(
            dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            .alias("sum_disc_price"),
            dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                6,
            ).alias("sum_charge"),
            davg(F.col("l_quantity"), 2).alias("avg_qty"),
            davg(F.col("l_extendedprice"), 2).alias("avg_price"),
            davg(F.col("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2 Part B)
# ---------------------------------------------------------------------------

@register(
    "join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 150000
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; customer is the small dim -> broadcast hint so the
    100-TB plan is a broadcast-hash join, no shuffle of the fact side."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@register(
    "join_left",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           {DSUM_SQL('o.o_totalprice', 2)} AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + aggregate: customers keep a row even with no
    orders (n_orders=0, total_spend NULL on both engines)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("total_spend"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# Sort / top-k & windows
# ---------------------------------------------------------------------------

@register(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit -> Spark's TakeOrderedAndProject (no global sort
    materialization); unique-key tiebreak keeps it deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "window_rank",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via ranking window (single shuffle on the group key)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )
