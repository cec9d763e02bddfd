"""Time the DuckDB oracle side of every oracle-backed query — the
denominator of the bench acceptance ratio (BASELINE.md: "within 2x of
the DuckDB oracle wall-clock on the same queries").

Usage: python tools/oracle_bench.py [sf_dir]   (default sf0.1)

Prints one JSON line {"queries": {name: sec}, "total": sec, "sf_dir": ...}.
Compare against bench.py's per-query output on matching keys.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from wrds2pg_spark.queries import REGISTRY  # noqa: E402
from wrds2pg_spark.sources.testdata import TABLES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    # warm pass (page cache + duckdb's own compilation), then two timed
    # passes with per-query min — mirrors bench.py's noise handling.
    times: dict[str, float] = {}
    for timed in (False, True, True):
        for name, spec in sorted(REGISTRY.items()):
            if spec.oracle is None:
                continue
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            dt = round(time.perf_counter() - t0, 3)
            if timed and (name not in times or dt < times[name]):
                times[name] = dt
    print(json.dumps({
        "queries": times,
        "total": round(sum(times.values()), 3),
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
