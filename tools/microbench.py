"""Micro-bench a subset of registered keys with bench.py's methodology
(8m splits, warm pass at sf0.001 + 2 target-SF warms, min of 3 timed
passes with plan construction inside the timer).

    python tools/microbench.py graph_pagerank sql_recursive_cte ...
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wrds2pg_spark.queries import REGISTRY  # noqa: E402
from wrds2pg_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="wrds2pg_spark_microbench",
        extra_conf={"spark.sql.files.maxPartitionBytes": "8m"},
    )

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    for name in names:
        mat(REGISTRY[name].fn(spark, "/root/testdata/sf0.001"))
    for _ in range(2):
        for name in names:
            mat(REGISTRY[name].fn(spark, sf_dir))
    times: dict[str, float] = {}
    for _ in range(3):
        for name in names:
            t0 = time.perf_counter()
            mat(REGISTRY[name].fn(spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
    for name, dt in times.items():
        print(f"{name:35s} {dt:7.3f}")


if __name__ == "__main__":
    main()
