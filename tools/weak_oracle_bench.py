"""Time the DuckDB oracle for a SELECTED key list only.

Usage: python tools/weak_oracle_bench.py SF_DIR k1,k2,...

Same methodology as oracle_bench.py (warm pass + two timed passes,
per-query min) but restricted to the given keys — used for the
overhead-vs-data scaling demo where the full oracle sweep is
impractical (some oracle SQL forms, e.g. the Levenshtein DP, are
pathological in DuckDB at larger SF).
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
    sf_dir = sys.argv[1]
    keys = sys.argv[2].split(",")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    times: dict[str, float] = {}
    for timed in (False, True, True):
        for name in keys:
            spec = REGISTRY.get(name)
            if spec is None or spec.oracle is None:
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
