"""Sources: parquet lake tables, typed CSV in the reference's SAS wire
format, and sas7bdat (gated on optional deps)."""

from wrds2pg_spark.sources.testdata import load_table, load_tables  # noqa: F401
