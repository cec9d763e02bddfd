"""Type inference: SAS PROC CONTENTS metadata row -> PG type string ->
Spark DataType.

The decision procedure reproduces the reference's ``code_row_dict``
(wrds2pg/sas/metadata.py:256-291) **with identical rule order**,
including the documented quirk that only the exact format ``BEST``
matches the BEST rule — ``BEST12.`` falls through to the
formatl/formatd rules (metadata.py:282-287, SURVEY §1.2).

The PG-type -> Spark-type map follows the reference's Parquet sink map
(wrds2pg/files/parquet.py:12-26): text->string, integer->int32,
bigint->int64, float8->double, date->date32, time->string,
timestamp->timestamp(us, naive).  ``timestamptz`` (the half-landed
tz-notebook override) maps to session-tz TimestampType.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

__all__ = ["pg_type_for_sas_row", "spark_type_for_pg", "struct_type_for"]

_DATETIME_RE = re.compile(r"datetime", re.IGNORECASE)
_TIME_RE = re.compile(r"time", re.IGNORECASE)
_DATE_RE = re.compile(r"(date|yymmdd|mmddyy)", re.IGNORECASE)


def pg_type_for_sas_row(row: dict[str, str | int]) -> str:
    """SAS metadata row -> PG type string.

    ``row`` carries the PROC CONTENTS export columns
    ``name,type,format,formatl,formatd,length``
    (wrds2pg/sas/metadata.py:43-46).  Rule order matches
    metadata.py:256-291 exactly.
    """
    sas_type = int(row.get("type", 1) or 1)
    fmt = str(row.get("format", "") or "")
    formatl = int(row.get("formatl", 0) or 0)
    formatd = int(row.get("formatd", 0) or 0)

    if sas_type == 2:
        return "text"
    if _DATETIME_RE.search(fmt):
        return "timestamp"
    # upper() before the exact matches mirrors metadata.py:276-277
    # (``fmt.upper() == "TIME8." or fmt.upper() == "TOD"``) — a
    # lower-case 'tod' format string must still map to time.
    if fmt.upper() in ("TIME8.", "TOD") or _TIME_RE.search(fmt):
        return "time"
    if _DATE_RE.search(fmt):
        return "date"
    # upper() mirrors metadata.py:282 (``fmt.upper() == "BEST"``) — a
    # lower-case 'best' must map to float8; BEST12. still falls through.
    if fmt.upper() == "BEST":
        return "float8"
    if formatd != 0:
        return "float8"
    if formatd == 0 and formatl != 0:
        return "integer"
    if formatd == 0 and formatl == 0:
        return "float8"
    return "text"


_PG_TO_SPARK: dict[str, T.DataType] = {
    "text": T.StringType(),
    "varchar": T.StringType(),
    "char": T.StringType(),
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "int4": T.IntegerType(),
    "smallint": T.ShortType(),
    "int2": T.ShortType(),
    "bigint": T.LongType(),
    "int8": T.LongType(),
    "float8": T.DoubleType(),
    "double precision": T.DoubleType(),
    "real": T.FloatType(),
    "float4": T.FloatType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "date": T.DateType(),
    # the reference's own Parquet path stores SAS times as strings
    # (wrds2pg/files/parquet.py:19-22)
    "time": T.StringType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
}

_PAREN_RE = re.compile(r"\s*\(.*\)\s*$")
_DECIMAL_RE = re.compile(r"^(numeric|decimal)\s*\((\d+)\s*,\s*(\d+)\)$")


def spark_type_for_pg(pg_type: str) -> T.DataType:
    """PG type string (as accepted by the reference's ``col_types``
    overrides, wrds2pg/sas/ddl.py:57-59 splices them verbatim) -> Spark
    DataType.  Parenthesized lengths are stripped before lookup, as in
    wrds2pg/files/parquet.py:47; ``numeric(p,s)`` keeps its precision.
    """
    key = pg_type.strip().lower()
    m = _DECIMAL_RE.match(key)
    if m:
        return T.DecimalType(int(m.group(2)), int(m.group(3)))
    bare = _PAREN_RE.sub("", key)
    if bare in _PG_TO_SPARK:
        return _PG_TO_SPARK[bare]
    raise ValueError(f"unmapped PG type: {pg_type!r}")


def struct_type_for(
    rows: list[dict[str, str | int]],
    col_types: dict[str, str] | None = None,
) -> T.StructType:
    """Full-table inference: PROC-CONTENTS-style rows (+ user overrides,
    lower-cased keys win — wrds2pg/sas/metadata.py:250-252) -> StructType.
    Column names canonicalize to lower case (metadata.py:183,247)."""
    overrides = {k.lower(): v for k, v in (col_types or {}).items()}
    fields = []
    for row in rows:
        name = str(row["name"]).lower()
        pg = overrides.get(name, pg_type_for_sas_row(row))
        fields.append(T.StructField(name, spark_type_for_pg(pg), True))
    return T.StructType(fields)
