"""Lake layout conventions (wrds2pg/files/paths.py:6-17 and
wrds2pg/api.py:537-540): ``DATA_DIR/schema/table.parquet`` and
``CSV_DIR/schema/table.csv.gz``.  Spark writes directories at those
paths rather than single files; the names are kept identical so a
user of the reference finds tables where they expect them."""

from __future__ import annotations

import os

__all__ = ["get_pq_path", "get_csv_path"]


def _resolve(base_dir: str | None, env_var: str) -> str:
    base = base_dir or os.environ.get(env_var)
    if not base:
        raise ValueError(f"Provide a data dir or set ${env_var}")
    return base


def get_pq_path(table_name: str, schema: str, data_dir: str | None = None) -> str:
    base = _resolve(data_dir, "DATA_DIR")
    d = os.path.join(base, schema)
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{table_name}.parquet")


def get_csv_path(table_name: str, schema: str, data_dir: str | None = None) -> str:
    base = _resolve(data_dir, "CSV_DIR")
    d = os.path.join(base, schema)
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{table_name}.csv.gz")
