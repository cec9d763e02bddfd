"""Loaders for the driver-generated parquet testdata
(/root/testdata/sf*/ per TESTDATA.md).

Columns come back exactly as stored; name canonicalization (the
reference lower-cases everywhere) is a no-op here because the testdata
is already lower-case, but we apply it anyway for parity with
wrds2pg/postgres/copy.py:33.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Analyzed-DataFrame memo: (appId, sf_dir, table, file-identity) -> DataFrame.
# A DataFrame is an immutable logical plan over the file path — reusing it
# re-reads the DATA on every execution, so this caches only the metadata
# step (directory listing + parquet footer schema inference, ~75 ms per
# spark.read call locally, and a driver-side listing job on a real
# cluster).  This is exactly what a production deployment gets for free
# from a metastore catalog (saveAsTable: schema known, no per-query
# footer reads), and mirrors the DuckDB oracle harness, which registers
# each parquet file as a view once per connection.  The file's
# mtime+size is part of the key, so a regenerated fixture can never
# serve a stale schema.
_DF_MEMO: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(path)
        ident = (st.st_mtime_ns, st.st_size)
    except OSError:
        ident = None
    # id(spark) is in the key because DataFrames are session-bound:
    # applicationId is SHARED by spark.newSession() children, and
    # serving a memoized frame from a DIFFERENT session silently
    # re-binds the caller's plan to that session's conf (found when
    # join_bloom_filtered's isolated-session thresholds vanished
    # whenever another key had warmed the memo first).  The memo
    # holds the frame, the frame holds its session, so ids stay
    # unique among live entries.
    key = (spark.sparkContext.applicationId, id(spark), sf_dir, name, ident)
    df = _DF_MEMO.get(key)
    if df is None:
        df = _DF_MEMO[key] = _load_table_uncached(spark, sf_dir, name)
    return df


def _load_table_uncached(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    if name == "events":
        # events.ts is parquet timestamp[ns], which Spark's vectorized
        # reader rejects ([PARQUET_TYPE_ILLEGAL]); read the raw int64
        # nanos and truncate to microseconds — the same truncation
        # DuckDB applies when it surfaces ns as its us TIMESTAMP.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # integer DIV, not /1000: ns values exceed 2^53 so double
        # division would round the microsecond
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
        )
    lowered = [c.lower() for c in df.columns]
    return df.toDF(*lowered) if lowered != list(df.columns) else df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def ensure_dir_fixture(final_dir: str, build_fn, marker: str = "_SUCCESS") -> str:
    """Build a derived fixture directory exactly once, concurrency-safe.

    ``build_fn(tmp_dir)`` populates a PROCESS-UNIQUE staging dir;
    the marker file is created inside it and the whole dir is then
    ``os.rename``d into place — one atomic publish, so a reader can
    never observe a half-written fixture and two processes sharing
    the same /tmp tag can't interleave writes (the loser's rename
    fails against the winner's completed dir and its staging is
    discarded).  Same stage-and-rename doctrine as the PG sink's
    atomic overwrite (sinks/postgres.py)."""
    import shutil

    if os.path.exists(os.path.join(final_dir, marker)):
        return final_dir
    tmp = f"{final_dir}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    try:
        build_fn(tmp)
        if not os.path.exists(os.path.join(tmp, marker)):
            with open(os.path.join(tmp, marker), "w"):
                pass
        try:
            os.rename(tmp, final_dir)
        except OSError:
            if not os.path.exists(os.path.join(final_dir, marker)):
                # Not a concurrent winner: a stale, marker-less dir
                # (crash leftover from the pre-atomic writers) blocks
                # the rename with ENOTEMPTY forever.  Self-heal
                # race-safely: a marker-less final_dir is NEVER a
                # winner's copy (markers are written before publish),
                # so atomically rename it ASIDE — claiming it
                # exclusively — and delete the claimed copy, never
                # deleting in place under concurrent readers.  Losing
                # the claim (ENOENT: another healer won) is fine.
                stale = f"{final_dir}.stale.{os.getpid()}"
                try:
                    os.rename(final_dir, stale)
                except OSError:
                    pass
                else:
                    if os.path.exists(os.path.join(stale, marker)):
                        # raced a winner who published between our
                        # marker check and the claim: we hold their
                        # COMPLETE copy and final_dir is now absent
                        # (our own retry hasn't run), so put it back
                        # verbatim (round-6 review finding)
                        try:
                            os.rename(stale, final_dir)
                        except OSError:
                            shutil.rmtree(stale, ignore_errors=True)
                    else:
                        shutil.rmtree(stale, ignore_errors=True)
                try:
                    os.rename(tmp, final_dir)
                except OSError:
                    # a concurrent builder published between our heal
                    # and this retry: keep the winner's completed copy
                    if not os.path.exists(os.path.join(final_dir, marker)):
                        raise
            # else: another process published first — keep theirs
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return final_dir


def fixture_tag(sf_dir: str, table: str) -> str:
    """Cache tag for derived /tmp fixtures (indexes, re-encoded
    copies): keyed on the SOURCE parquet's identity (path + mtime +
    size), not just the path — if the testdata were ever regenerated
    in place, a stale index would otherwise silently poison
    correctness runs."""
    import hashlib

    p = os.path.join(sf_dir, f"{table}.parquet")
    try:
        st = os.stat(p)
        ident = f"{p}|{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        ident = p
    return hashlib.md5(ident.encode()).hexdigest()[:12]
