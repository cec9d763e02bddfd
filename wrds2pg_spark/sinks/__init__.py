"""Sinks: Parquet, gzip CSV, and PostgreSQL writers with the
reference's incremental-stamp semantics (SURVEY §2 A19-A27)."""

from wrds2pg_spark.sinks.bucketed import read_bucketed, write_bucketed
from wrds2pg_spark.sinks.parquet import update_parquet
from wrds2pg_spark.sinks.csv import update_csv
from wrds2pg_spark.sinks.postgres import (
    create_table_sql,
    ddl_script,
    update_postgres,
)

__all__ = [
    "update_parquet", "update_csv", "update_postgres",
    "create_table_sql", "ddl_script", "write_bucketed", "read_bucketed",
]
