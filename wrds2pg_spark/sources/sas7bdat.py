"""sas7bdat source — distributed over files via mapInArrow.

The reference never parses sas7bdat itself; it asks a SAS process to
stream CSV (wrds2pg/sas/stream.py:29-88).  With no SAS runtime in this
world, the public-knowledge options are the spark-sas7bdat package
(not bundled here) or pandas' builtin ``read_sas``.  This module fans
a file list out across executors and decodes each file with
``pandas.read_sas`` inside ``mapInArrow`` — one task per file, Arrow
batches out, no driver-side materialization.

A single .sas7bdat file is not splittable (same limitation as the
reference's single CSV stream, SURVEY §4 "unsplittable gzip" row), so
parallelism = file count; WRDS-style libraries with one file per
month/year parallelize naturally.  ``chunksize`` bounds per-task
memory for big single files.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_sas7bdat"]


def _decode_files(chunksize: int, read_fn=None):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pandas as pd

        read = read_fn or pd.read_sas
        for batch in batches:
            for path in batch.column("path").to_pylist():
                reader = read(
                    path, format="sas7bdat", chunksize=chunksize,
                    iterator=True,
                )
                for chunk in reader:
                    chunk.columns = [c.lower() for c in chunk.columns]
                    # SAS char columns decode as bytes; normalize
                    for c in chunk.columns:
                        if chunk[c].dtype == object:
                            chunk[c] = chunk[c].map(
                                lambda v: v.decode("utf-8", "replace")
                                if isinstance(v, bytes) else v
                            )
                    yield pa.RecordBatch.from_pandas(
                        chunk, preserve_index=False
                    )

    return fn


def read_sas7bdat(
    spark: SparkSession,
    path: str,
    *,
    chunksize: int = 262_144,
    schema=None,
    read_fn=None,
) -> DataFrame:
    """Read one file, a glob, or a directory of ``.sas7bdat`` files.

    ``schema`` (StructType or DDL string) is required for multi-file
    reads to be planned without touching data; when omitted, the first
    file's first chunk is sampled driver-side to infer it (one small
    read, mirroring the reference's PROC CONTENTS round-trip,
    wrds2pg/sas/metadata.py:8-48).

    ``read_fn`` substitutes the decoder (``pandas.read_sas``-shaped);
    it is cloudpickled to executors — tests inject a fake, and a
    faster public decoder could be slotted in the same way.
    """
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.sas7bdat")))
    else:
        files = sorted(glob.glob(path))
    if not files:
        raise FileNotFoundError(f"no sas7bdat files match {path!r}")

    if schema is None:
        import pandas as pd

        read = read_fn or pd.read_sas
        sample = next(
            iter(read(files[0], format="sas7bdat",
                      chunksize=1024, iterator=True))
        )
        sample.columns = [c.lower() for c in sample.columns]
        for c in sample.columns:
            if sample[c].dtype == object:
                sample[c] = sample[c].map(
                    lambda v: v.decode("utf-8", "replace")
                    if isinstance(v, bytes) else v
                )
        schema = spark.createDataFrame(sample).schema

    paths_df = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(len(files), "path")
    return paths_df.mapInArrow(_decode_files(chunksize, read_fn), schema)
