"""Event-time windowing: tumbling / sliding / session windows.

Each operator exists in a *batch* form (used by the oracle-checked
query registry — deterministic, DuckDB-expressible) and the tumbling
aggregation also in a *Structured Streaming* form (readStream +
watermark + window), smoke-tested against its batch twin.  The
reference has no streaming at all (its "streaming" is byte piping,
wrds2pg/postgres/copy.py:152-153) — this is north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from wrds2pg_spark.functions.numeric import dsum

__all__ = [
    "tumbling_counts", "sliding_counts", "sessionize",
    "streaming_tumbling_counts",
]


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows via the native window() operator —
    partial aggregation + one shuffle on (window, event_type)."""
    return (
        events.groupBy(
            F.window("ts", duration).alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, duration: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding windows: each event lands in duration/slide windows."""
    return (
        events.groupBy(F.window("ts", duration, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "n", "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch sessionization: a session breaks when the gap to the
    previous event of the same user exceeds ``gap_seconds``.  One
    shuffle on user_id; the cumulative-flag-sum trick assigns session
    ids without iteration."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ can't cast straight to BIGINT; route through session-tz
    # timestamp (pinned UTC) -> floor-seconds, matching the oracle's
    # CAST(floor(epoch(ts)) AS BIGINT)
    epoch = F.col("ts").cast("timestamp").cast("long")
    prev = F.lag(epoch).over(w)
    # two steps: the gap flag uses lag(), the session id a cumulative
    # sum — Spark (like SQL) forbids nesting one window fn in another.
    # Both windows share the same partitioning, so this is still ONE
    # shuffle on user_id.
    flagged = events.select(
        "user_id", "event_id", "ts", "value",
        F.when(prev.isNull() | ((epoch - prev) > gap_seconds), 1)
        .otherwise(0).alias("new_session"),
    )
    with_ids = flagged.select(
        "user_id", "event_id", "ts", "value",
        F.sum("new_session").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("session_id"),
    )
    return (
        with_ids.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("sum_value"),
        )
    )


def streaming_tumbling_counts(
    spark: SparkSession,
    parquet_path: str,
    schema,
    duration: str = "1 hour",
    watermark: str = "2 hours",
):
    """Structured Streaming twin of tumbling_counts: file source ->
    watermark (bounds state for late data) -> windowed agg.  Returns
    the streaming DataFrame; callers start it with
    foreachBatch/memory sink (see tests/test_streaming.py)."""
    stream = (
        spark.readStream.schema(schema).parquet(parquet_path)
        # watermarks require session-tz TIMESTAMP (not NTZ); session tz
        # is pinned UTC so the cast preserves wall-clock values
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    return (
        stream.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )
