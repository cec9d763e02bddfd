"""Per-query bench regression diff.

Usage: python tools/bench_diff.py OLD_BENCH.json NEW_BENCH.json [--pct 20]

Reads two driver bench records (the ``{"n":..,"tail": "..."}`` wrapper
or a raw ``{"queries": {...}}`` line) and prints per-query deltas,
flagging regressions above the threshold.  Exit code 0 always — this is
a reporting tool, the threshold is advisory (sub-second queries jitter
±30% run-to-run on a shared box; the flag is a prompt to re-measure,
not a gate).
"""

from __future__ import annotations

import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        rec = json.load(f)
    if "queries" in rec:
        return dict(rec["queries"])
    # Driver wrapper: the JSON line is embedded (possibly truncated) in
    # the "tail" field — recover every "name": seconds pair.
    tail = rec.get("tail", "")
    pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail)
    drop = {"value", "sf", "n", "rc", "cpus"}
    return {k: float(v) for k, v in pairs if k not in drop}


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    old_path, new_path = sys.argv[1], sys.argv[2]
    pct = 20.0
    if "--pct" in sys.argv:
        pct = float(sys.argv[sys.argv.index("--pct") + 1])

    old, new = load_queries(old_path), load_queries(new_path)
    regressions, improvements = [], []
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        if o <= 0:
            continue
        delta = 100.0 * (n - o) / o
        if delta > pct:
            regressions.append((name, o, n, delta))
        elif delta < -pct:
            improvements.append((name, o, n, delta))

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    tot_old = sum(old[k] for k in set(old) & set(new))
    tot_new = sum(new[k] for k in set(old) & set(new))

    print(f"common keys: {len(set(old) & set(new))}  "
          f"total {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({100.0 * (tot_new - tot_old) / tot_old:+.1f}% on shared keys)")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    for label, rows in (("REGRESSION", regressions),
                        ("improved", improvements)):
        for name, o, n, delta in sorted(rows, key=lambda r: -abs(r[3])):
            print(f"{label:>10}  {name:<32} {o:7.3f}s -> {n:7.3f}s "
                  f"({delta:+.1f}%)")
    if not regressions:
        print(f"no regressions > {pct:.0f}%")


if __name__ == "__main__":
    main()
