"""Type-inference decision table (FIXTURES.md §2.5 drives every branch
of the reference's code_row_dict, wrds2pg/sas/metadata.py:256-291)."""

import pytest
from pyspark.sql import types as T

from wrds2pg_spark.plans.types import (
    pg_type_for_sas_row,
    spark_type_for_pg,
    struct_type_for,
)

CASES = [
    ("charcol", 2, "$20.", 20, 0, "text"),
    ("dtcol", 1, "DATETIME20.", 20, 0, "timestamp"),
    ("timecol", 1, "TIME8.", 8, 0, "time"),
    ("datecol", 1, "YYMMDD10.", 10, 0, "date"),
    ("mmddyy", 1, "MMDDYY10.", 10, 0, "date"),
    # case parity with metadata.py:276-277 (fmt.upper() before the
    # exact TOD/TIME8. checks): lower-case 'tod' is still a time
    ("todlow", 1, "tod", 0, 0, "time"),
    ("todup", 1, "TOD", 0, 0, "time"),
    ("bestcol", 1, "BEST", 0, 0, "float8"),
    # case parity with metadata.py:282 (fmt.upper() == "BEST"):
    # lower-case 'best' with formatl set is still float8, not integer
    ("bestlow", 1, "best", 12, 0, "float8"),
    # quirk: BEST12. != BEST exactly -> falls through to formatl rule
    ("best12", 1, "BEST12.", 12, 0, "integer"),
    ("deccol", 1, "8.2", 8, 2, "float8"),
    ("intcol", 1, "8.", 8, 0, "integer"),
    ("barenum", 1, "", 0, 0, "float8"),
]


@pytest.mark.parametrize("name,typ,fmt,fl,fd,expected", CASES)
def test_decision_table(name, typ, fmt, fl, fd, expected):
    row = {"name": name, "type": typ, "format": fmt, "formatl": fl, "formatd": fd}
    assert pg_type_for_sas_row(row) == expected


def test_spark_type_map():
    assert spark_type_for_pg("text") == T.StringType()
    assert spark_type_for_pg("integer") == T.IntegerType()
    assert spark_type_for_pg("bigint") == T.LongType()
    assert spark_type_for_pg("float8") == T.DoubleType()
    assert spark_type_for_pg("boolean") == T.BooleanType()
    assert spark_type_for_pg("date") == T.DateType()
    assert spark_type_for_pg("time") == T.StringType()  # parquet.py:19-22
    assert spark_type_for_pg("timestamp") == T.TimestampNTZType()
    assert spark_type_for_pg("timestamptz") == T.TimestampType()
    assert spark_type_for_pg("varchar(8)") == T.StringType()
    assert spark_type_for_pg("numeric(12,4)") == T.DecimalType(12, 4)


def test_spark_type_unknown_raises():
    with pytest.raises(ValueError):
        spark_type_for_pg("geography")


def test_struct_type_with_overrides():
    rows = [
        {"name": "IC_DC_KEY", "type": 1, "format": "", "formatl": 0, "formatd": 0},
        {"name": "company", "type": 2, "format": "$8.", "formatl": 8, "formatd": 0},
    ]
    st = struct_type_for(rows, col_types={"Ic_Dc_Key": "integer"})
    assert st == T.StructType([
        T.StructField("ic_dc_key", T.IntegerType(), True),
        T.StructField("company", T.StringType(), True),
    ])
