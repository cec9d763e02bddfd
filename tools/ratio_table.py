"""Render a Spark-vs-DuckDB ratio table from bench JSON files.

Usage:
  python tools/ratio_table.py SPARK_BENCH.json ORACLE_BENCH.json \
      [--floor SECONDS] [--only k1,k2,...]

Joins per-query times on matching keys and prints a markdown table
(ratio desc). With --floor, adds a floor-adjusted ratio column:
(spark - floor) / duckdb — the data-cost ratio once the constant
per-job scheduling floor (tools/floor_probe.py) is removed.
"""

from __future__ import annotations

import json
import sys

from bench_diff import load_queries  # same dir


def main() -> None:
    spark = load_queries(sys.argv[1])
    oracle = load_queries(sys.argv[2])
    floor = 0.0
    if "--floor" in sys.argv:
        floor = float(sys.argv[sys.argv.index("--floor") + 1])
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    rows = []
    for k in sorted(set(spark) & set(oracle)):
        if only and k not in only:
            continue
        s, d = spark[k], oracle[k]
        if d <= 0:
            continue
        rows.append((k, s, d, s / d, max(0.0, s - floor) / d))
    rows.sort(key=lambda r: -r[3])

    hdr = "| query | spark s | duckdb s | ratio |"
    sep = "|---|---|---|---|"
    if floor:
        hdr += " floor-adj ratio |"
        sep += "---|"
    print(hdr)
    print(sep)
    for k, s, d, r, fr in rows:
        line = f"| {k} | {s:.3f} | {d:.3f} | {r:.2f}x |"
        if floor:
            line += f" {fr:.2f}x |"
        print(line)
    ts, td = (sum(r[1] for r in rows), sum(r[2] for r in rows))
    print(f"| **total ({len(rows)} keys)** | **{ts:.1f}** | **{td:.1f}** "
          f"| **{ts / td:.2f}x** |" + (" |" if floor else ""))


if __name__ == "__main__":
    main()
