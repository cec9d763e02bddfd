"""Synthesize a larger scale factor from sf0.1 by FK-consistent
replication — for overhead-vs-data scaling demos ONLY (the driver's
own testdata is read-only and authoritative for correctness).

Usage: python tools/scale_fixture.py [factor] [src_dir] [out_dir]
       (defaults: 10 /root/testdata/sf0.1 /tmp/sf1)

Each replica i shifts every surrogate key by i * max(key), so joins
fan out exactly as the original schema does (10x customers own 10x
orders own 10x lineitems; nation/region stay fixed like TPC-H).
Documents get a per-replica text suffix and source tag so replication
creates realistic near-dup clusters instead of pure exact dups;
embedding labels get a per-replica tag so block counts (not block
sizes) scale.
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    rep = f"(SELECT unnest(range({factor})) AS i)"

    def mx(table: str, col: str) -> int:
        return con.execute(
            f"SELECT max({col}) FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0]

    copies = {
        "region": None,  # fixed dimensions, copied once
        "nation": None,
        "customer": f"""
            SELECT c_custkey + i * {mx('customer', 'c_custkey')} AS c_custkey,
                   * EXCLUDE (c_custkey)
            FROM read_parquet('{src}/customer.parquet'), {rep}""",
        "supplier": f"""
            SELECT s_suppkey + i * {mx('supplier', 's_suppkey')} AS s_suppkey,
                   * EXCLUDE (s_suppkey)
            FROM read_parquet('{src}/supplier.parquet'), {rep}""",
        "part": f"""
            SELECT p_partkey + i * {mx('part', 'p_partkey')} AS p_partkey,
                   * EXCLUDE (p_partkey)
            FROM read_parquet('{src}/part.parquet'), {rep}""",
        "orders": f"""
            SELECT o_orderkey + i * {mx('orders', 'o_orderkey')} AS o_orderkey,
                   o_custkey + i * {mx('customer', 'c_custkey')} AS o_custkey,
                   * EXCLUDE (o_orderkey, o_custkey)
            FROM read_parquet('{src}/orders.parquet'), {rep}""",
        "lineitem": f"""
            SELECT l_orderkey + i * {mx('orders', 'o_orderkey')} AS l_orderkey,
                   l_partkey + i * {mx('part', 'p_partkey')} AS l_partkey,
                   l_suppkey + i * {mx('supplier', 's_suppkey')} AS l_suppkey,
                   * EXCLUDE (l_orderkey, l_partkey, l_suppkey)
            FROM read_parquet('{src}/lineitem.parquet'), {rep}""",
        "events": f"""
            SELECT event_id + i * {mx('events', 'event_id')} AS event_id,
                   user_id + i * {mx('events', 'user_id')} AS user_id,
                   * EXCLUDE (event_id, user_id)
            FROM read_parquet('{src}/events.parquet'), {rep}""",
        "documents": f"""
            SELECT doc_id + i * {mx('documents', 'doc_id')} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE text || ' r' || i END AS text,
                   lang,
                   CASE WHEN i = 0 THEN source
                        ELSE source || '_r' || i END AS source,
                   CAST(CASE WHEN i = 0 THEN n_chars
                        ELSE length(text || ' r' || i) END
                        AS BIGINT) AS n_chars
            FROM read_parquet('{src}/documents.parquet'), {rep}""",
        "embeddings": f"""
            SELECT vec_id + i * {mx('embeddings', 'vec_id')} AS vec_id,
                   embedding,
                   label + i * ({mx('embeddings', 'label')} + 1) AS label
            FROM read_parquet('{src}/embeddings.parquet'), {rep}""",
    }

    for table, sql in copies.items():
        dst = f"{out}/{table}.parquet"
        if sql is None:
            sql = f"SELECT * FROM read_parquet('{src}/{table}.parquet')"
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
