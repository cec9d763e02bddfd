"""Sources: parquet lake tables, typed CSV in the reference's SAS wire
format, and sas7bdat (gated on optional deps)."""

from wrds2pg_spark.sources.csv import read_csv_sas_meta, read_csv_typed  # noqa: F401
from wrds2pg_spark.sources.json import read_json_typed  # noqa: F401
from wrds2pg_spark.sources.sas7bdat import read_sas7bdat  # noqa: F401
from wrds2pg_spark.sources.testdata import load_table, load_tables  # noqa: F401
