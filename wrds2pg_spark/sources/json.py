"""Typed JSON-lines source.

The reference moves exactly one wire format (CSV, wrds2pg/sas/
codegen.py:128-150); a modern lake also lands newline-delimited JSON
(API exports, event feeds).  Same design as sources/csv.py: an
explicit ``StructType`` built from PG type strings drives
``spark.read.json`` so parsing stays JVM-side, schema-checked
(FAILFAST — malformed records are a loud error, SURVEY §7 hard part
3), and splittable: uncompressed JSONL splits by line across tasks
exactly like CSV, so a 100-TB feed fans out without a repartition.

Timestamps arrive as ISO-8601 strings; ``timestampFormat`` pins the
parse instead of trusting inference, mirroring the reference's
explicit E8601DT19. export format (wrds2pg/sas/codegen.py:110).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from wrds2pg_spark.plans.types import spark_type_for_pg

__all__ = ["read_json_typed"]


def read_json_typed(
    spark: SparkSession,
    path: str,
    col_types: dict[str, str],
    *,
    timestamp_format: str = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    mode: str = "FAILFAST",
) -> DataFrame:
    """Read newline-delimited JSON with an explicit PG-typed schema
    (column -> PG type string, lower-cased like every engine surface).
    No schema inference pass: one scan, pushdown-friendly."""
    schema = T.StructType([
        T.StructField(name.lower(), spark_type_for_pg(pg), True)
        for name, pg in col_types.items()
    ])
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("timestampFormat", timestamp_format)
        .json(path)
    )
