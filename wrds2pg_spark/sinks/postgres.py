"""PostgreSQL sink: JDBC bulk write + the reference's catalog
management (schema/role/grant/comment DDL).

Reference behavior (wrds2pg/postgres/copy.py:57-247 ``wrds_to_pg`` +
wrds2pg/api.py:37-236 ``wrds_update``): ensure schema and roles,
DROP TABLE CASCADE, CREATE TABLE with inferred PG types, stream rows
in via COPY, grant, and store the "Last modified" stamp as the table
comment (wrds2pg/postgres/ddl.py:26-38).

Spark mapping: ``df.write.jdbc(mode="overwrite")`` with
``createTableColumnTypes`` pinning the exact PG column types, and the
admin DDL issued as plain SQL.  The JDBC writer inserts per partition
in parallel — the distributed-friendly shape; the reference's
single-transaction COPY atomicity can be recovered with
``stage_and_rename=True`` (write to a staging table, then swap in one
transaction — SURVEY §7 hard part 5).

No PostgreSQL server or JDBC driver ships in this container, so
``update_postgres`` takes an ``execute_sql`` callable for the admin
statements (tests inject a recorder; production passes a psycopg or
JDBC runner).  All SQL generation is pure and unit-tested.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame

from wrds2pg_spark.catalog import needs_update

__all__ = [
    "create_table_sql", "comment_sql", "ddl_script", "update_postgres",
    "spark_to_pg_type",
]

# Spark SQL type -> PostgreSQL type, used for columns without an
# explicit col_types override.  Matches the reference's inference
# targets (wrds2pg/sas/metadata.py:256-291 emits text / float8 /
# integer / date / timestamp) plus the lossless extras Spark can carry.
_SPARK_TO_PG = {
    "string": "text",
    "int": "integer",
    "integer": "integer",
    "bigint": "bigint",
    "long": "bigint",
    "smallint": "smallint",
    "double": "float8",
    "float": "float4",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "bytea",
}


def spark_to_pg_type(spark_simple_name: str) -> str:
    t = spark_simple_name.lower()
    if t.startswith("decimal"):
        return t.replace("decimal", "numeric")
    return _SPARK_TO_PG.get(t, "text")


def pg_types_for(df: DataFrame, col_types: dict[str, str] | None = None) -> dict[str, str]:
    """Per-column PG types: inferred from the Spark schema, with
    user overrides (lower-cased keys) winning — the same merge rule as
    wrds2pg/sas/metadata.py:250-252."""
    overrides = {k.lower(): v for k, v in (col_types or {}).items()}
    out = {}
    for f in df.schema.fields:
        name = f.name.lower()
        out[name] = overrides.get(name, spark_to_pg_type(f.dataType.simpleString()))
    return out


def create_table_sql(
    schema: str, table_name: str, names: Sequence[str], col_types: dict[str, str]
) -> str:
    """Identical SQL shape to wrds2pg/postgres/ddl.py:57-59."""
    cols = ", ".join(f'"{n}" {col_types[n]}' for n in names)
    return f'CREATE TABLE "{schema}"."{table_name}" ({cols})'


def comment_sql(schema: str, table_name: str, comment: str) -> str:
    """COMMENT ON TABLE with quote doubling (wrds2pg/postgres/ddl.py:26-38)."""
    return (
        f'COMMENT ON TABLE "{schema}"."{table_name}" '
        f"IS '{comment.replace(chr(39), chr(39) * 2)}'"
    )


def table_comment_query(schema: str, table_name: str) -> str:
    """The stamp read-back query (wrds2pg/postgres/ddl.py:7-23):
    ``obj_description`` over ``to_regclass`` with ``quote_ident`` on
    both parts, so odd identifiers round-trip exactly as the write
    side's quoted DDL created them."""
    s = schema.replace("'", "''")
    t = table_name.replace("'", "''")
    return (
        "SELECT obj_description(to_regclass("
        f"quote_ident('{s}') || '.' || quote_ident('{t}')"
        "), 'pg_class')"
    )


def get_table_comment(
    schema: str,
    table_name: str,
    execute_query: Callable[[str], object],
) -> str:
    """Read the table's comment stamp, '' when the table or comment is
    absent (reference ddl.py:7-23 returns '' likewise).  The injected
    ``execute_query`` runs one SQL string and returns rows
    (list-of-tuples / cursor-like) — the read-side twin of the
    ``execute_sql`` seam, so this module still owns no connections."""
    rows = execute_query(table_comment_query(schema, table_name))
    try:
        rows = list(rows) if rows is not None else []
    except TypeError:
        rows = []
    if not rows:
        return ""
    first = rows[0]
    val = first[0] if isinstance(first, (tuple, list)) else first
    return val if isinstance(val, str) else ""


def ddl_script(
    schema: str,
    table_name: str,
    names: Sequence[str],
    col_types: dict[str, str],
    *,
    create_roles: bool = False,
    drop_existing: bool = True,
    modified: str = "",
) -> list[str]:
    """The full admin-DDL sequence the reference issues around a load
    (wrds2pg/postgres/copy.py:179-211,241-244; wrds2pg/api.py:217-234),
    as an ordered statement list."""
    stmts = [f'CREATE SCHEMA IF NOT EXISTS "{schema}"']
    if create_roles:
        access = f"{schema}_access"
        stmts += [
            f'CREATE ROLE "{schema}"',
            f'ALTER SCHEMA "{schema}" OWNER TO "{schema}"',
            f'CREATE ROLE "{access}"',
            f'GRANT USAGE ON SCHEMA "{schema}" TO "{access}"',
        ]
    if drop_existing:
        stmts.append(f'DROP TABLE IF EXISTS "{schema}"."{table_name}" CASCADE')
    stmts.append(create_table_sql(schema, table_name, names, col_types))
    if create_roles:
        access = f"{schema}_access"
        stmts += [
            f'ALTER TABLE "{schema}"."{table_name}" OWNER TO "{schema}"',
            f'GRANT SELECT ON "{schema}"."{table_name}" TO "{access}"',
        ]
    if modified:
        stmts.append(comment_sql(schema, table_name, modified))
    return stmts


def update_postgres(
    df: DataFrame,
    table_name: str,
    schema: str,
    jdbc_url: str,
    *,
    modified: str = "",
    sink_modified: str = "",
    force: bool = False,
    col_types: dict[str, str] | None = None,
    create_roles: bool = False,
    execute_sql: Callable[[str], None] | None = None,
    jdbc_options: dict[str, str] | None = None,
    stage_and_rename: bool = False,
    tz: str = "UTC",
) -> bool:
    """Gate + admin DDL + JDBC bulk write + stamp comment.

    ``tz`` mirrors the reference's per-connection
    ``SET TimeZone TO '{tz}'`` (wrds2pg/postgres/copy.py:42-43,
    api.py:49): issued via JDBC ``sessionInitStatement`` so every
    executor's write connection interprets timestamp literals in the
    same zone the reference would.

    ``sink_modified`` is the stamp read from the existing table's
    comment (caller queries it — this module issues, never reads,
    admin SQL).  Returns True when a write happened.

    ``stage_and_rename`` writes to ``{table}__staging`` and swaps with
    a DROP+RENAME in one transaction, recovering the reference's
    atomic-replace semantics (single COPY transaction,
    wrds2pg/postgres/copy.py:38-52) without holding a long lock.
    """
    if not needs_update(modified, sink_modified, force):
        print(f"{schema}.{table_name} already up to date")
        return False

    types = pg_types_for(df, col_types)
    names = [f.name.lower() for f in df.schema.fields]
    target = f"{table_name}__staging" if stage_and_rename else table_name

    if execute_sql is not None:
        for stmt in ddl_script(
            schema, target, names, types,
            create_roles=create_roles and not stage_and_rename,
        ):
            execute_sql(stmt)

    writer = (
        df.write.mode("append")  # table pre-created by ddl_script with exact types
        .format("jdbc")
        .option("url", jdbc_url)
        .option("dbtable", f'"{schema}"."{target}"')
        # per-partition batched inserts; reWriteBatchedInserts turns
        # them into multi-row statements server-side
        .option("batchsize", "10000")
        .option("reWriteBatchedInserts", "true")
    )
    if tz:
        writer = writer.option(
            "sessionInitStatement", f"SET TimeZone TO '{tz}'"
        )
    for k, v in (jdbc_options or {}).items():
        writer = writer.option(k, v)
    writer.save()

    if execute_sql is not None:
        if stage_and_rename:
            execute_sql("BEGIN")
            execute_sql(f'DROP TABLE IF EXISTS "{schema}"."{table_name}" CASCADE')
            execute_sql(
                f'ALTER TABLE "{schema}"."{target}" RENAME TO "{table_name}"'
            )
            execute_sql("COMMIT")
        if modified:
            execute_sql(comment_sql(schema, table_name, modified))
    return True
