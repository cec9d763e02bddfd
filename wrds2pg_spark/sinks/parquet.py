"""Parquet sink with incremental-stamp gating.

Reference behavior (wrds2pg/api.py:238-432 ``wrds_update_pq``): probe
the source's "Last modified" stamp, compare with the stamp stored in
the existing parquet output, skip when equal unless forced, else
rewrite and store the new stamp.  The reference streams CSV through a
pyarrow writer one batch at a time (wrds2pg/files/parquet.py:61-99);
Spark's native parquet writer already does columnar, row-grouped,
partition-parallel output, so the sink body is a plain
``df.write.parquet`` — the engine work here is the gate + stamp.

Scale note: the writer preserves the DataFrame's partitioning — at
100 TB the upstream plan controls file count/size via
``spark.sql.files.maxRecordsPerFile`` or an explicit ``repartition``;
this sink deliberately adds no coalesce (a single-file clamp is a
driver-side bottleneck at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from wrds2pg_spark.catalog import get_modified_pq, needs_update, set_modified_pq

__all__ = ["update_parquet"]


def update_parquet(
    df: DataFrame,
    path: str,
    modified: str,
    *,
    force: bool = False,
    compression: str = "snappy",
) -> bool:
    """Write ``df`` to ``path`` unless the stamp says it is current.

    Returns True when a write happened (mirrors the reference's
    entry-point boolean, wrds2pg/api.py:375-377 gate / :431 return).
    """
    if not needs_update(modified, get_modified_pq(path), force):
        print(f"{path} already up to date")
        return False
    df.write.mode("overwrite").option("compression", compression).parquet(path)
    if modified:
        set_modified_pq(path, modified)
    return True
