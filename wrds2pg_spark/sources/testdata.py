"""Loaders for the driver-generated parquet testdata
(/root/testdata/sf*/ per TESTDATA.md).

Columns come back exactly as stored; name canonicalization (the
reference lower-cases everywhere) is a no-op here because the testdata
is already lower-case, but we apply it anyway for parity with
wrds2pg/postgres/copy.py:33.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    lowered = [c.lower() for c in df.columns]
    return df.toDF(*lowered) if lowered != list(df.columns) else df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
