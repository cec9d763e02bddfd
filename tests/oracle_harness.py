"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
fixtures, then compares row count, column names, and an
order-insensitive value multiset (columns sorted by name, rows sorted,
floats rounded to a comparison precision).  Stricter in spirit than
the driver can be assumed to be, so passing here should imply passing
there.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from wrds2pg_spark.sources.testdata import TABLES

FLOAT_DECIMALS = 6


def run_oracle(sf_dir: str, sql: str) -> list[tuple]:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _norm_val(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, FLOAT_DECIMALS)
    if isinstance(v, bytes):
        return v.hex()
    return str(v) if not isinstance(v, (int, bool, type(None))) else v


def _normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_val(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare_query(spark, sf_dir: str, name: str) -> None:
    from wrds2pg_spark.queries import REGISTRY

    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    assert spec.oracle is not None, f"{name} has no oracle"
    o_cols, o_rows = run_oracle(sf_dir, spec.oracle)
    o_cols = [c.lower() for c in o_cols]

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    sn = _normalize(s_cols, s_rows)
    on = _normalize(o_cols, o_rows)
    if sn != on:
        diffs = [(a, b) for a, b in zip(sn, on) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
