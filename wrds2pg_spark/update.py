"""Entry-point orchestrators — the Spark equivalents of the
reference's ``wrds_update`` / ``wrds_update_pq`` / ``wrds_update_csv``
(wrds2pg/api.py:37-236, :238-432, :434-584).

Shape per SURVEY §3: resolve source -> probe stamps -> gate -> one
declarative read+transform+write plan -> store stamp.  Where the
reference makes three SAS round-trips per update (stamp, data,
metadata), Spark needs a single job: schema comes with the read,
transforms ride the same plan, and the sink gates itself.

Sources are local files (parquet / csv / sas7bdat via
sources.*); there is no SAS server in this world, so the
``wrds_id``/SSH transport surface is intentionally absent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from wrds2pg_spark.catalog import get_modified_csv, modified_decode
from wrds2pg_spark.paths import get_csv_path, get_pq_path
from wrds2pg_spark.plans.ingest import IngestOptions, apply_options
from wrds2pg_spark.sinks.csv import update_csv
from wrds2pg_spark.sinks.parquet import update_parquet

__all__ = [
    "read_source", "source_modified",
    "wrds_update", "wrds_update_pq", "wrds_update_csv",
]


def source_modified(source_path: str) -> str:
    """Source stamp: file mtime rendered in the reference's
    'Last modified:' format (the local-file analog of the PROC
    CONTENTS scrape, wrds2pg/sas/metadata.py:79-113)."""
    if not os.path.exists(source_path):
        return ""
    return modified_decode(os.path.getmtime(source_path))


def read_source(spark: SparkSession, source_path: str) -> DataFrame:
    """Pick a reader from the file extension."""
    p = source_path.lower()
    if p.endswith((".parquet", ".pq")) or os.path.isdir(source_path):
        return spark.read.parquet(source_path)
    if p.endswith((".csv", ".csv.gz")):
        return spark.read.option("header", "true").csv(source_path)
    raise ValueError(f"Unsupported source: {source_path}")


def wrds_update_pq(
    spark: SparkSession,
    source_path: str,
    table_name: str,
    schema: str,
    *,
    data_dir: str | None = None,
    force: bool = False,
    **ingest_kwargs,
) -> bool:
    """Source file -> ingest options -> parquet lake table, gated on
    the source's modified stamp (wrds2pg/api.py:238-432)."""
    pq_path = get_pq_path(table_name, schema, data_dir)
    modified = source_modified(source_path)
    df = apply_options(
        read_source(spark, source_path), IngestOptions(**ingest_kwargs)
    )
    return update_parquet(df, pq_path, modified, force=force)


def wrds_update_csv(
    spark: SparkSession,
    source_path: str,
    table_name: str,
    schema: str,
    *,
    data_dir: str | None = None,
    force: bool = False,
    single_file: bool = False,
    **ingest_kwargs,
) -> bool:
    """Source file -> ingest options -> gzip CSV, stamp in mtime
    (wrds2pg/api.py:434-584)."""
    csv_path = get_csv_path(table_name, schema, data_dir)
    modified = source_modified(source_path)
    df = apply_options(
        read_source(spark, source_path), IngestOptions(**ingest_kwargs)
    )
    return update_csv(df, csv_path, modified, force=force, single_file=single_file)


def wrds_update(
    spark: SparkSession,
    source_path: str,
    table_name: str,
    schema: str,
    jdbc_url: str,
    *,
    force: bool = False,
    col_types: dict[str, str] | None = None,
    create_roles: bool = False,
    execute_sql=None,
    sink_modified: str = "",
    stage_and_rename: bool = False,
    **ingest_kwargs,
) -> bool:
    """Source file -> ingest options -> PostgreSQL table
    (wrds2pg/api.py:37-236).  ``sink_modified`` is the stamp read from
    the existing table comment (query it with the caller's PG
    connection; this engine only issues SQL through ``execute_sql``)."""
    from wrds2pg_spark.sinks.postgres import update_postgres

    modified = source_modified(source_path)
    df = apply_options(
        read_source(spark, source_path), IngestOptions(**ingest_kwargs)
    )
    return update_postgres(
        df, table_name, schema, jdbc_url,
        modified=modified, sink_modified=sink_modified, force=force,
        col_types=col_types, create_roles=create_roles,
        execute_sql=execute_sql, stage_and_rename=stage_and_rename,
    )
