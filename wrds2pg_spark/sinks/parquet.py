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

__all__ = [
    "update_parquet", "write_sorted", "write_partitioned",
    "compact_small_files",
]


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


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    *,
    num_files: int | None = None,
    compression: str = "snappy",
) -> None:
    """Write parquet range-clustered on ``sort_cols`` for data skipping.

    ``repartitionByRange`` gives files DISJOINT key ranges (a sampled
    range partitioner — an explicit repartition, so AQE never
    coalesces it) and ``sortWithinPartitions`` orders rows inside each
    file, so every parquet row group carries tight, non-overlapping
    min/max statistics on the sort key.  A later filtered scan then
    prunes at three levels: partition files (Spark's file-level stats),
    row groups (parquet reader min/max), and pages — turning a
    full-table scan into a touch of the few files covering the
    predicate's range.  This is the scale answer to time-range queries
    over a 100 TB event log: cluster on event time at ingest, and
    every downstream time-window query reads only its slice.
    """
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    compression: str = "snappy",
) -> None:
    """Write a hive-layout partitioned parquet lake
    (``path/col=value/...``) — the directory-level complement to
    :func:`write_sorted`'s file-level clustering.

    A filtered read on the partition column then never LISTS, let
    alone reads, non-matching directories: the scan shows the
    predicate under ``PartitionFilters`` (not ``PushedFilters``) and
    prunes before any I/O is scheduled.  This is the canonical layout
    for a 100-TB lake keyed on low-cardinality columns (date, region,
    source): pruning cost is O(matching partitions), independent of
    total table size.

    The repartition on the partition columns avoids the classic
    small-file explosion: without it every upstream task writes one
    file per partition value it happens to hold (tasks x values
    files); with it each partition value's rows are co-located and
    produce one file per value.  Skewed partition values (one giant
    date) are re-split by AQE or `maxRecordsPerFile` downstream.
    """
    (
        df.repartition(*[df[c] for c in partition_cols])
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .option("compression", compression)
        .parquet(path)
    )


def compact_small_files(
    spark,
    src_dir: str,
    dst_dir: str,
    *,
    target_bytes: int = 128 * 1024 * 1024,
    compression: str = "snappy",
) -> str:
    """Bin-pack a small-file parquet directory into ~``target_bytes``
    outputs — the OPTIMIZE/rewrite-data-files maintenance pass every
    long-lived lake needs (streaming sinks, per-trigger micro-batches
    and over-parallel writers all accrete kilobyte files whose
    per-file open/footer cost eventually dominates scans).

    Spark-first design: the bin-packing itself IS the engine's
    FileSourceScan split packing — reading with
    ``spark.sql.files.maxPartitionBytes = target_bytes`` and a zero
    ``openCostInBytes`` makes the scan pack whole small files into
    ~target-sized splits (no shuffle, no driver-side file loop), and
    writing one output file per packed split rewrites the lake in a
    single narrow, embarrassingly-parallel stage.  At 100 TB this is
    the same plan Iceberg's binpack rewrite schedules: cost scales
    with the bytes rewritten, never with total table size, and the
    read side stays whole-stage-codegen columnar end to end.

    The two read confs are set on an isolated ``spark.newSession()``
    child (shared SparkContext, private SQLConf), so the caller's
    session conf — including the bench harness's own
    maxPartitionBytes tuning — is never mutated.

    Returns ``dst_dir``.  Stamps/catalog gating compose via
    :func:`update_parquet` on the destination if the caller wants
    incremental semantics.
    """
    child = spark.newSession()
    # newSession() starts from context DEFAULTS, not the caller's
    # runtime conf — timestamp semantics (session timezone, parquet
    # datetime rebase modes) must carry over or a compaction of
    # legacy-rebase data could rewrite values under different rules
    for k in (
        "spark.sql.session.timeZone",
        "spark.sql.parquet.datetimeRebaseModeInRead",
        "spark.sql.parquet.datetimeRebaseModeInWrite",
        "spark.sql.parquet.int96RebaseModeInRead",
        "spark.sql.parquet.int96RebaseModeInWrite",
    ):
        try:
            child.conf.set(k, spark.conf.get(k))
        except Exception:
            pass  # conf absent in this Spark build — keep default
    child.conf.set("spark.sql.files.maxPartitionBytes", str(target_bytes))
    # default openCostInBytes (4 MB) pads every file to 4 MB for
    # packing purposes — correct for scheduling fairness, wrong for a
    # compactor whose whole input is sub-4MB files: it would cap packs
    # at ~32 files regardless of size.  Zero makes packing purely
    # byte-driven.
    child.conf.set("spark.sql.files.openCostInBytes", "0")
    # split sizing is min(maxPartitionBytes, max(openCost,
    # totalBytes/minPartitionNum)) and minPartitionNum defaults to the
    # session parallelism — right for query latency, wrong for a
    # compactor, where it silently re-fragments small lakes into
    # ~core-count outputs (measured: 64 -> 48 files instead of 4).
    # One partition minimum lets target_bytes alone pick the width.
    child.conf.set("spark.sql.files.minPartitionNum", "1")
    (
        child.read.parquet(src_dir)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(dst_dir)
    )
    return dst_dir
