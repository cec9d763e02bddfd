"""Dump .explain('formatted') for registered keys to files.

Usage: python tools/explain_dump.py OUT_DIR SUFFIX k1,k2,... [SF_DIR]
Writes OUT_DIR/<key>_<SUFFIX>.txt.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wrds2pg_spark.queries import REGISTRY  # noqa: E402
from wrds2pg_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, keys = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="explain_dump",
        extra_conf={"spark.sql.files.maxPartitionBytes": "8m"},
    )
    for name in keys:
        df = REGISTRY[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(name, "->", len(txt), "chars")


if __name__ == "__main__":
    main()
