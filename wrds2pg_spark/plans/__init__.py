"""Ingest planning: SAS-style option parsing, type inference, and the
DataFrame transform chain that replaces the reference's generated SAS
data step (wrds2pg/sas/codegen.py)."""

from wrds2pg_spark.plans.ingest import IngestOptions, apply_options  # noqa: F401
from wrds2pg_spark.plans.options import (  # noqa: F401
    expand_col_spec,
    parse_col_list,
    parse_rename,
    translate_where,
)
from wrds2pg_spark.plans.types import (  # noqa: F401
    pg_type_for_sas_row,
    spark_type_for_pg,
)
