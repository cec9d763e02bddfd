"""wrds2pg_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``iangow/wrds2pg`` reference library,
re-expressed Spark-first.

The reference (see /root/reference, surveyed in SURVEY.md) is a SAS->CSV
streaming ETL tool: SAS-style ingest options (keep/drop/rename/where/obs,
fix_missing, col_types overrides), schema/type inference from SAS metadata,
incremental updates keyed on a "Last modified" stamp, and three sinks
(PostgreSQL, Parquet, gzip CSV).  This package rebuilds those capabilities
as Catalyst-friendly DataFrame transforms plus a standard relational query
surface and large-scale LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Layout
------
- ``session``     SparkSession factory tuned for local testing / cluster use
- ``plans``       SAS option parsing, type inference, ingest transform plans
- ``functions``   reusable column-expression builders (vector math, text stats)
- ``operators``   dedup / similarity / as-of join / text / multimodal
- ``sources``     parquet / typed-CSV (SAS wire format) / sas7bdat readers
- ``sinks``       parquet / gzip-CSV / PostgreSQL writers + stamp stores
- ``streaming``   event-time windowing (batch-equivalent + Structured Streaming)
- ``catalog``     modified-stamp codecs and the incremental-update gate
- ``queries``     the oracle-checked query registry exported via __spark_entry__
"""

__version__ = "0.1.0"
