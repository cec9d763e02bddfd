"""API-parity helpers (SURVEY §2 A18, A28-A30)."""

import os

import pytest

from wrds2pg_spark.compat import (
    list_tables,
    make_jdbc_url,
    run_file_sql,
    sql_to_pandas,
)


def test_list_tables_lake_dir(tmp_path):
    d = tmp_path / "crsp"
    d.mkdir()
    (d / "dsf.parquet").mkdir()          # spark writes directories
    (d / "msf.csv.gz").mkdir()
    (d / "_meta.json").write_text("{}")  # sidecar filtered out
    (d / "bad-name!.parquet").mkdir()
    assert list_tables(None, "crsp", data_dir=str(tmp_path)) == ["dsf", "msf"]


def test_list_tables_missing_dir(tmp_path):
    assert list_tables(None, "nope", data_dir=str(tmp_path)) == []


def test_list_tables_catalog(spark):
    spark.range(3).createOrReplaceTempView("compat_probe")
    assert "compat_probe" in list_tables(spark)


def test_sql_to_pandas_lowercases(spark):
    pdf = sql_to_pandas(spark, "SELECT 1 AS UpperName, 2 AS lower_name")
    assert list(pdf.columns) == ["uppername", "lower_name"]
    assert pdf.iloc[0, 0] == 1


def test_run_file_sql(spark, tmp_path):
    script = tmp_path / "s.sql"
    script.write_text(
        "CREATE OR REPLACE TEMP VIEW compat_v AS SELECT 42 AS x;\n"
        "CREATE OR REPLACE TEMP VIEW compat_w AS SELECT x + 1 AS y FROM compat_v;\n"
    )
    run_file_sql(spark, str(script))
    assert spark.sql("SELECT y FROM compat_w").first()["y"] == 43


def test_make_jdbc_url_env(monkeypatch):
    monkeypatch.setenv("PGHOST", "h")
    monkeypatch.setenv("PGDATABASE", "d")
    monkeypatch.delenv("PGPORT", raising=False)
    assert make_jdbc_url() == "jdbc:postgresql://h:5432/d"
    assert make_jdbc_url("x", "y", 5444) == "jdbc:postgresql://x:5444/y"


def test_make_jdbc_url_requires_db(monkeypatch):
    monkeypatch.delenv("PGDATABASE", raising=False)
    with pytest.raises(ValueError):
        make_jdbc_url(host="h")
