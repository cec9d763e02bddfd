"""Time a SELECTED key list Spark-side, clean and sequential.

Usage: python tools/weak_spark_bench.py SF_DIR k1,k2,...

bench.py methodology (warm pass + two timed passes, per-query min,
noop sink) restricted to the given keys — paired with
weak_oracle_bench.py for the overhead-vs-data scaling demo.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wrds2pg_spark.queries import REGISTRY  # noqa: E402
from wrds2pg_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    keys = sys.argv[2].split(",")
    spark = get_spark(app_name="weak_spark_bench")

    def materialize(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    for _ in range(2):  # warm: codegen + C2 + page cache
        for name in keys:
            materialize(REGISTRY[name].fn(spark, sf_dir))

    times: dict[str, float] = {}
    for _ in range(2):
        for name in keys:
            t0 = time.perf_counter()
            materialize(REGISTRY[name].fn(spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
    print(json.dumps({
        "queries": times,
        "total": round(sum(times.values()), 3),
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
