"""Event-time processing over the ``events`` table: batch-equivalent
windowed aggregations (oracle-checkable) and their Structured
Streaming twins (watermarks, memory-sink tested)."""

from wrds2pg_spark.streaming.events import (  # noqa: F401
    dedup_first,
    sessionize,
    sliding_counts,
    streaming_dedup,
    streaming_session_windows,
    streaming_tumbling_counts,
    streaming_user_running_totals,
    tumbling_counts,
)
