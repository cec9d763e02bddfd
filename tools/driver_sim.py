"""Simulate the driver's verify pass against __spark_entry__.py.

Usage: python tools/driver_sim.py [sf_dir]

Runs entry(spark) (smoke: rows>0, stable schema), then every
queries() entry at the given sf_dir, comparing against oracle_sql()
via DuckDB exactly in the spirit of CORRECTNESS_r{N}.json
(row count + sorted-column schema + order-insensitive value multiset).
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from wrds2pg_spark.session import get_spark  # noqa: E402
from wrds2pg_spark.sources.testdata import TABLES  # noqa: E402

FLOAT_DECIMALS = 6


def norm(v):
    # Type-tag every value: the round-1 driver hashed an int 613 and a
    # float 613.0 (DuckDB HUGEINT -> pandas float) DIFFERENTLY while the
    # old norm() let Python's cross-type equality hide it.  Being
    # type-strict here makes this harness at least as harsh as the
    # driver.
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        return "f:NaN" if math.isnan(v) else f"f:{round(v, FLOAT_DECIMALS)}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    if v is None:
        return "n:"
    return f"s:{v}"


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="driver_sim", driver_memory="16g")

    t0 = time.time()
    edf = entrymod.entry(spark)
    n = edf.count()
    print(f"entry(): rows={n} cols={edf.columns} ({time.time()-t0:.1f}s)")
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle keys must be subset of queries"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    if only:
        qs = {n: f for n, f in qs.items() if any(n.startswith(p) for p in only)}
    ok = bad = 0
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = [c.lower() for c in sdf.columns]
        status, detail = "rows-only", f"rows={len(srows)}"
        if name in oracles:
            cur = con.execute(oracles[name])
            ocols = [d[0].lower() for d in cur.description]
            orows = cur.fetchall()
            if sorted(scols) != sorted(ocols):
                status, detail = "SCHEMA-MISMATCH", f"{sorted(scols)} vs {sorted(ocols)}"
            elif len(srows) != len(orows):
                status, detail = "COUNT-MISMATCH", f"{len(srows)} vs {len(orows)}"
            elif normalize(scols, srows) != normalize(ocols, orows):
                sn, on = normalize(scols, srows), normalize(ocols, orows)
                diffs = [(a, b) for a, b in zip(sn, on) if a != b][:3]
                status, detail = "VALUE-MISMATCH", f"{diffs}"
            else:
                status, detail = "match", f"rows={len(srows)}"
        tag = "OK " if status in ("match", "rows-only") else "BAD"
        if tag == "OK ":
            ok += 1
        else:
            bad += 1
        print(f"[{tag}] {name:32s} {status:16s} {detail[:120]} ({time.time()-t0:.1f}s)")
    print(f"\n{ok} ok, {bad} bad, {len(qs)} total ({len(oracles)} with oracle)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
