"""Bucketed-table sink: pre-shuffled, co-located storage for the joins
and aggregations a lake runs repeatedly.

Writing a fact table bucketed (and sorted) by its join key pays the
shuffle ONCE at ingest; every later equi-join or groupBy on that key
reads bucket-aligned files and skips the exchange entirely — at 100 TB
the difference between a nightly pipeline that reshuffles the lake per
query and one that never moves the fact table again.  This is the
Spark-native analog of the reference's "do the heavy work once at
ingest" design (its SAS-side projection/filter pushdown,
wrds2pg/sas/codegen.py:52-69): the expensive part happens when the
table lands, not when it is queried.

Buckets only engage through the session catalog (``saveAsTable`` —
plain ``parquet(path)`` drops the bucket spec), so this module manages
catalog tables, not bare directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) parquet catalog
    table.  ``num_buckets`` should match downstream
    ``spark.sql.shuffle.partitions`` (or divide it evenly) so both
    sides of a co-located join agree on the bucketing.

    Sorting within buckets additionally enables exchange-AND-sort-free
    sort-merge joins and range-friendly row-group pruning."""
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed catalog table.  Joins/aggs keyed on the bucket
    columns plan with zero Exchange (verified in tests/test_bucketed.py)."""
    return spark.table(table)
