"""Custom operators the reference / Spark lack natively: as-of joins,
banded interval joins, dedup families, similarity search, text
analysis, multimodal column plumbing.  All are compositions of built-in
DataFrame ops (single-shuffle patterns) — no row-at-a-time Python."""

from wrds2pg_spark.operators.asof import asof_join  # noqa: F401
from wrds2pg_spark.operators.rangejoin import band_join  # noqa: F401
