"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in the ``wrds2pg_spark`` package; this module
only adapts it to the driver's entry-point shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wrds2pg_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (ingest-option composite -> TPC-H-Q1-shape agg)
    on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.ingest_q1_composite(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query key."""
    return _q.oracle_sql()
