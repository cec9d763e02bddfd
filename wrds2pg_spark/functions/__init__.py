"""Reusable column-expression builders (all JVM-side `F.*` compositions —
no Python UDFs in these hot paths)."""

from wrds2pg_spark.functions.numeric import dsum, davg  # noqa: F401
from wrds2pg_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
