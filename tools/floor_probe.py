"""Measure the engine's fixed per-job/per-stage scheduling floor.

Usage: python tools/floor_probe.py

Times (a) an empty one-stage job, (b) a one-stage 32-task job over a
trivial in-memory range, (c) a two-stage shuffle job with 32+32 tasks
— all with ZERO data work. The medians are the irreducible Spark
local-mode overhead a query pays per stage regardless of data volume;
BASELINE.md uses them to decompose sub-second query times into
floor vs data cost (sub-second ratios vs an in-process C++ engine are
floor-dominated by construction — the floor is constant in data size,
so it vanishes at real scale).

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wrds2pg_spark.session import get_spark  # noqa: E402


def timed(fn, n: int = 15) -> float:
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    return round(statistics.median(xs), 4)


def main() -> None:
    spark = get_spark(app_name="floor_probe")

    one_task = spark.range(1)
    wide = spark.range(0, 32 * 1000, 1, 32)
    shuffled = wide.repartition(32, "id")

    # warm-up: JIT, codegen cache, executor thread pool
    for _ in range(5):
        one_task.write.mode("overwrite").format("noop").save()
        shuffled.write.mode("overwrite").format("noop").save()

    floor_1stage_1task = timed(
        lambda: one_task.write.mode("overwrite").format("noop").save())
    floor_1stage_32task = timed(
        lambda: wide.write.mode("overwrite").format("noop").save())
    floor_2stage_shuffle = timed(
        lambda: shuffled.write.mode("overwrite").format("noop").save())

    print(json.dumps({
        "floor_1stage_1task_s": floor_1stage_1task,
        "floor_1stage_32task_s": floor_1stage_32task,
        "floor_2stage_shuffle_s": floor_2stage_shuffle,
        "per_extra_stage_s": round(
            floor_2stage_shuffle - floor_1stage_32task, 4),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }))


if __name__ == "__main__":
    main()
