"""API-parity helpers for the reference's remaining entry points
(SURVEY §2 A18, A28-A30).

- ``list_tables``    A18 ``get_wrds_tables`` (dictionary.tables scrape,
                     wrds2pg/sas/metadata.py:293-328) -> Spark catalog
                     listing, or a lake-directory listing for the
                     file-based layout paths.get_pq_path writes.
- ``sql_to_pandas``  A28 ``sas_to_pandas`` (arbitrary SAS program ->
                     pandas, wrds2pg/api.py:586-616) -> ``spark.sql``
                     -> Arrow-accelerated ``toPandas``, columns
                     lower-cased the same way (api.py:615).
- ``run_file_sql``   A29 (wrds2pg/api.py:618-627): execute a ``.sql``
                     script statement-by-statement.
- ``make_jdbc_url``  A30 ``make_engine`` (wrds2pg/postgres/
                     engine.py:8-40): env-var defaulted PostgreSQL
                     URL, no credentials embedded (the reference
                     relies on .pgpass; JDBC drivers read
                     user/password via properties instead).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

__all__ = ["list_tables", "sql_to_pandas", "run_file_sql", "make_jdbc_url"]

_MEMNAME_RE = re.compile(r"^[A-Za-z0-9_]+$")


def list_tables(
    spark: SparkSession,
    schema: str | None = None,
    data_dir: str | None = None,
) -> list[str]:
    """Table names in a catalog database, or — when ``data_dir`` is
    given — the ``schema/`` subdirectory of a file lake (stripping
    ``.parquet``/``.csv.gz`` suffixes).  Names are filtered to the
    reference's ``^[A-Z0-9_]+$`` memname shape
    (wrds2pg/sas/metadata.py:320-325) and lower-cased."""
    if data_dir is not None:
        d = os.path.join(data_dir, schema) if schema else data_dir
        if not os.path.isdir(d):
            return []
        names = set()
        for entry in os.listdir(d):
            base = entry
            for suf in (".parquet", ".csv.gz", ".csv"):
                if base.endswith(suf):
                    base = base[: -len(suf)]
                    break
            if _MEMNAME_RE.match(base):
                names.add(base.lower())
        return sorted(names)
    tables = spark.catalog.listTables(schema) if schema else spark.catalog.listTables()
    return sorted(
        t.name.lower() for t in tables if _MEMNAME_RE.match(t.name)
    )


def sql_to_pandas(spark: SparkSession, query: str):
    """Arbitrary SQL -> pandas with lower-cased columns
    (wrds2pg/api.py:586-616; Arrow transfer replaces the CSV pipe)."""
    pdf = spark.sql(query).toPandas()
    pdf.columns = [c.lower() for c in pdf.columns]
    return pdf


def run_file_sql(spark: SparkSession, path: str) -> None:
    """Execute each ``;``-separated non-empty statement of a script
    (wrds2pg/api.py:618-627; wrds2pg/postgres/ddl.py:40-48).  Spark SQL
    has no transactions, so statements apply one by one — same
    commit-per-statement behavior as the reference's executor."""
    with open(path) as f:
        script = f.read()
    for stmt in script.split(";"):
        if stmt.strip():
            spark.sql(stmt)


def make_jdbc_url(
    host: str | None = None,
    dbname: str | None = None,
    port: int | str | None = None,
) -> str:
    """PostgreSQL JDBC URL from args falling back to the reference's
    env vars PGHOST/PGDATABASE/PGPORT (wrds2pg/postgres/engine.py:8-40).
    Credentials never go in the URL."""
    host = host or os.environ.get("PGHOST", "localhost")
    dbname = dbname or os.environ.get("PGDATABASE")
    port = port or os.environ.get("PGPORT", 5432)
    if not dbname:
        raise ValueError("Provide dbname or set $PGDATABASE")
    return f"jdbc:postgresql://{host}:{port}/{dbname}"
