"""Typed-CSV and sas7bdat sources (SURVEY §7 Phase 4)."""

from __future__ import annotations

import datetime

import pytest

from wrds2pg_spark.sources.csv import read_csv_sas_meta, read_csv_typed


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(
        "permno,ret,caldt,comment\n"
        "10001,0.05,2024-01-02,ok\n"
        "10002,,2024-01-03,\n"
        "10003,0.07,2024-01-04,fine\n"
    )
    return str(p)


def test_read_csv_typed_schema_and_nulls(spark, csv_file):
    df = read_csv_typed(
        spark, csv_file,
        {"permno": "integer", "ret": "float8", "caldt": "date",
         "comment": "text"},
    )
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "int", "double", "date", "string"
    ]
    rows = {r["permno"]: r for r in df.collect()}
    assert rows[10002]["ret"] is None
    assert rows[10002]["comment"] is None  # empty string -> null
    assert rows[10001]["caldt"] == datetime.date(2024, 1, 2)


def test_read_csv_typed_special_missing_fix(spark, tmp_path):
    p = tmp_path / "m.csv"
    p.write_text("v,w\n1.5,x\nA,y\n.,z\n")  # SAS special missing .A -> 'A'
    df = read_csv_typed(
        spark, str(p), {"v": "float8", "w": "text"}, fix_missing=True
    )
    vals = [r["v"] for r in df.orderBy("w").collect()]
    assert vals[0] == 1.5 and vals[1] is None and vals[2] is None


def test_read_csv_typed_failfast_without_fix(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("v\nA\n")
    df = read_csv_typed(spark, str(p), {"v": "float8"})
    with pytest.raises(Exception):  # loud failure, SURVEY §7 hard part 3
        df.collect()


def test_read_csv_sas_meta_inference(spark, csv_file):
    rows = [
        {"name": "PERMNO", "type": 1, "format": "", "formatl": 8, "formatd": 0,
         "length": 8},
        {"name": "RET", "type": 1, "format": "", "formatl": 0, "formatd": 4,
         "length": 8},
        {"name": "CALDT", "type": 1, "format": "YYMMDD10.", "formatl": 0,
         "formatd": 0, "length": 8},
        {"name": "COMMENT", "type": 2, "format": "", "formatl": 0,
         "formatd": 0, "length": 20},
    ]
    df = read_csv_sas_meta(spark, csv_file, rows)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "int", "double", "date", "string"
    ]
    assert df.count() == 3


def test_read_sas7bdat_missing_file(spark, tmp_path):
    from wrds2pg_spark.sources.sas7bdat import read_sas7bdat

    with pytest.raises(FileNotFoundError):
        read_sas7bdat(spark, str(tmp_path / "nope*.sas7bdat"))


def test_read_sas7bdat_decodes_real_files(spark, tmp_path):
    """GENUINE end-to-end (round 7, VERDICT item 6): two hand-built
    binary sas7bdat files (sinks/sas7bdat.py writes the public
    Shotwell/Hobbs layout) decoded by the UN-MOCKED pandas.read_sas
    inside the mapInArrow fan-out — no read_fn injection anywhere.
    Exercises multi-file reads, the byte->str normalization and
    lower-casing on real SAS char columns, and float64 exactness."""
    import pandas as pd

    from wrds2pg_spark.sinks.sas7bdat import write_sas7bdat
    from wrds2pg_spark.sources.sas7bdat import read_sas7bdat

    write_sas7bdat(
        pd.DataFrame({"PERMNO": [10001.0], "NAME": ["alpha"]}),
        str(tmp_path / "a.sas7bdat"))
    write_sas7bdat(
        pd.DataFrame({"PERMNO": [10002.0, 10003.0],
                      "NAME": ["beta", "gamma corp"]}),
        str(tmp_path / "b.sas7bdat"))

    df = read_sas7bdat(
        spark, str(tmp_path / "*.sas7bdat"),
        schema="permno double, name string",
    )
    got = sorted((r["permno"], r["name"]) for r in df.collect())
    assert got == [(10001.0, "alpha"), (10002.0, "beta"),
                   (10003.0, "gamma corp")]


def test_read_sas7bdat_infers_schema_from_real_file(spark, tmp_path):
    """Schema inference samples the first real file driver-side —
    numeric -> double, char -> string, names lower-cased."""
    import pandas as pd

    from wrds2pg_spark.sinks.sas7bdat import write_sas7bdat
    from wrds2pg_spark.sources.sas7bdat import read_sas7bdat

    write_sas7bdat(
        pd.DataFrame({"RET": [0.05, -0.01, 0.125], "TIC": ["A", "BB", "C"]}),
        str(tmp_path / "x.sas7bdat"))
    df = read_sas7bdat(spark, str(tmp_path / "x.sas7bdat"))
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] \
        == [("ret", "double"), ("tic", "string")]
    assert sorted(r["ret"] for r in df.collect()) == [-0.01, 0.05, 0.125]


def test_sas7bdat_multipage_roundtrip(tmp_path):
    """Rows spanning several data pages decode completely and exactly
    (page_length=1024 forces ~45 rows/page here)."""
    import numpy as np
    import pandas as pd

    from wrds2pg_spark.sinks.sas7bdat import write_sas7bdat

    n = 500
    src = pd.DataFrame({
        "K": np.arange(n, dtype="float64"),
        "V": np.linspace(-1, 1, n),
    })
    path = str(tmp_path / "big.sas7bdat")
    write_sas7bdat(src, path, page_length=1024)
    out = pd.read_sas(path, format="sas7bdat")
    assert len(out) == n
    assert np.array_equal(out["K"].to_numpy(), src["K"].to_numpy())
    assert np.array_equal(out["V"].to_numpy(), src["V"].to_numpy())


def test_sas7bdat_header_modified_from_real_file(tmp_path):
    """The A16 content stamp parses from a REAL written header: the
    writer plants date_modified (seconds since 1960) and
    header_modified must read it back to the second."""
    from datetime import datetime, timedelta

    import pandas as pd

    from wrds2pg_spark.sinks.sas7bdat import write_sas7bdat
    from wrds2pg_spark.sources.sas7bdat import header_modified

    path = str(tmp_path / "stamp.sas7bdat")
    secs = 1_234_567_890.0
    write_sas7bdat(pd.DataFrame({"X": [1.0]}), path, modified_secs=secs)
    got = header_modified(path)
    assert got == datetime(1960, 1, 1) + timedelta(seconds=secs)


def test_sas7bdat_distributed_sink_roundtrip(spark, tmp_path):
    """write_sas7bdat_files writes one real sas7bdat per partition
    executor-side (mapInPandas); reading the directory back through
    read_sas7bdat recovers every row."""
    from pyspark.sql import functions as F

    from wrds2pg_spark.sinks.sas7bdat import write_sas7bdat_files
    from wrds2pg_spark.sources.sas7bdat import read_sas7bdat

    src = spark.range(100).select(
        F.col("id").cast("double").alias("permno"),
        F.concat(F.lit("tic"), F.col("id")).alias("ticker"),
    ).repartition(4)
    out = str(tmp_path / "lake")
    manifest = write_sas7bdat_files(src, out).collect()
    assert sum(r["rows"] for r in manifest) == 100
    back = read_sas7bdat(spark, out, schema="permno double, ticker string")
    got = sorted((r["permno"], r["ticker"]) for r in back.collect())
    assert got == sorted(
        (float(i), f"tic{i}") for i in range(100))


def test_read_json_typed_failfast_on_malformed(spark, tmp_path):
    """FAILFAST contract: a malformed JSONL record is a loud error,
    not a silent null row (SURVEY §7 hard part 3)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from wrds2pg_spark.sources.json import read_json_typed

    p = tmp_path / "bad.jsonl"
    p.write_text('{"a": 1}\n{"a": not-json}\n')
    df = read_json_typed(spark, str(p), {"a": "bigint"})
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)


def test_read_json_typed_lowercases_and_types(spark, tmp_path):
    from pyspark.sql import types as T

    from wrds2pg_spark.sources.json import read_json_typed

    p = tmp_path / "ok.jsonl"
    p.write_text('{"ID": 1, "Name": "x"}\n')
    df = read_json_typed(spark, str(p), {"ID": "bigint", "Name": "text"})
    assert [f.name for f in df.schema.fields] == ["id", "name"]
    assert isinstance(df.schema["id"].dataType, T.LongType)


def test_ensure_dir_fixture_atomic_publish(tmp_path):
    """Stage-and-rename fixture publish: a completed dir is reused
    (builder not re-run), a losing concurrent build is discarded in
    favor of the winner, and a builder crash leaves NO final dir."""
    import os

    import pytest

    from wrds2pg_spark.sources.testdata import ensure_dir_fixture

    final = str(tmp_path / "fix")
    calls = []

    def build(tmp):
        calls.append(tmp)
        with open(os.path.join(tmp, "data.txt"), "w") as f:
            f.write("v1")

    assert ensure_dir_fixture(final, build) == final
    assert open(os.path.join(final, "data.txt")).read() == "v1"
    assert os.path.exists(os.path.join(final, "_SUCCESS"))
    # second call: marker present -> builder not re-invoked
    ensure_dir_fixture(final, build)
    assert len(calls) == 1

    # simulated lost race: final dir appears (complete) mid-build;
    # the loser's rename must yield to the winner, not clobber it
    final2 = str(tmp_path / "fix2")

    def racing_build(tmp):
        os.makedirs(final2)
        with open(os.path.join(final2, "data.txt"), "w") as f:
            f.write("winner")
        with open(os.path.join(final2, "_SUCCESS"), "w"):
            pass
        with open(os.path.join(tmp, "data.txt"), "w") as f:
            f.write("loser")

    ensure_dir_fixture(final2, racing_build)
    assert open(os.path.join(final2, "data.txt")).read() == "winner"
    assert not os.path.exists(final2 + f".tmp.{os.getpid()}")

    # builder crash: no partial final dir may exist
    final3 = str(tmp_path / "fix3")
    with pytest.raises(RuntimeError):
        ensure_dir_fixture(final3, lambda t: (_ for _ in ()).throw(
            RuntimeError("boom")))
    assert not os.path.exists(final3)
    assert not os.path.exists(final3 + f".tmp.{os.getpid()}")


def _synthetic_sas7bdat(path, modified_secs, created_secs=0.0,
                        aligned=True, little=True):
    """Header-only sas7bdat per the public binary layout (enough for
    header_modified; NOT pandas-readable — no pages)."""
    import struct

    from wrds2pg_spark.sources.sas7bdat import _MAGIC

    align = 4 if aligned else 0
    order = "<" if little else ">"
    hdr = bytearray(400)
    hdr[:32] = _MAGIC
    if aligned:
        hdr[35] = 0x33
    hdr[37] = 0x01 if little else 0x00
    off = 164 + align
    hdr[off:off + 8] = struct.pack(order + "d", created_secs)
    hdr[off + 8:off + 16] = struct.pack(order + "d", modified_secs)
    path.write_bytes(bytes(hdr))
    return path


def test_sas7bdat_header_modified_parses_all_layouts(tmp_path):
    """date_modified comes from 172+align as float64 seconds since
    1960-01-01 wall time, honoring the alignment shim (byte 35) and
    the endianness flag (byte 37)."""
    from datetime import datetime

    from wrds2pg_spark.sources.sas7bdat import header_modified

    # 2021-07-04 12:34:56 in SAS seconds
    secs = (datetime(2021, 7, 4, 12, 34, 56)
            - datetime(1960, 1, 1)).total_seconds()
    for aligned in (True, False):
        for little in (True, False):
            p = _synthetic_sas7bdat(
                tmp_path / f"t_{aligned}_{little}.sas7bdat", secs,
                aligned=aligned, little=little)
            dt = header_modified(str(p))
            assert dt == datetime(2021, 7, 4, 12, 34, 56), (aligned, little)


def test_sas7bdat_header_modified_rejects_garbage(tmp_path):
    from wrds2pg_spark.sources.sas7bdat import header_modified

    bad = tmp_path / "bad.sas7bdat"
    bad.write_bytes(b"\x00" * 400)          # wrong magic
    assert header_modified(str(bad)) is None
    short = tmp_path / "short.sas7bdat"
    short.write_bytes(b"\x00" * 64)         # truncated
    assert header_modified(str(short)) is None
    assert header_modified(str(tmp_path / "absent.sas7bdat")) is None


def test_source_modified_uses_content_stamp_not_mtime(tmp_path):
    """A16 (r4/r5 verdict): the incremental gate keys on the dataset's
    own header stamp — touching or re-copying the file must NOT
    change the stamp (no spurious reload), while a content rewrite
    with a new header timestamp must."""
    import os
    from datetime import datetime

    from wrds2pg_spark.catalog import needs_update
    from wrds2pg_spark.update import source_modified

    secs = (datetime(2020, 1, 2, 3, 4, 5)
            - datetime(1960, 1, 1)).total_seconds()
    p = _synthetic_sas7bdat(tmp_path / "tbl.sas7bdat", secs)
    s1 = source_modified(str(p))
    assert s1 == "Last modified: 01/02/2020 03:04:05"

    os.utime(p, (1e9, 1.7e9))               # touched, content unchanged
    assert source_modified(str(p)) == s1
    assert needs_update(source_modified(str(p)), s1) is False

    _synthetic_sas7bdat(p, secs + 3600)     # SAS rewrote the dataset
    s2 = source_modified(str(p))
    assert s2 != s1 and needs_update(s2, s1) is True


def test_source_modified_falls_back_to_mtime(tmp_path):
    """Unparseable sas7bdat (e.g. exotic variant) and non-SAS sources
    keep the conservative fs-mtime stamp."""
    from wrds2pg_spark.catalog import modified_decode
    from wrds2pg_spark.update import source_modified

    odd = tmp_path / "odd.sas7bdat"
    odd.write_bytes(b"not sas at all" * 30)
    import os
    assert source_modified(str(odd)) == modified_decode(
        os.path.getmtime(odd))
    csv = tmp_path / "t.csv"
    csv.write_text("a,b\n1,2\n")
    assert source_modified(str(csv)) == modified_decode(
        os.path.getmtime(csv))


def test_ensure_dir_fixture_heal_loses_republish_race(tmp_path, monkeypatch):
    """TOCTOU fix (round 6, ADVICE): when a stale marker-less dir is
    healed but a concurrent builder publishes a COMPLETE fixture
    between the heal and our retry rename, the retry must yield to
    the winner's copy instead of raising — and the stale dir is
    renamed aside (claimed atomically), never rmtree'd in place."""
    import os

    from wrds2pg_spark.sources import testdata as td

    final = str(tmp_path / "fix")
    os.makedirs(final)                       # stale, marker-less
    with open(os.path.join(final, "junk.txt"), "w") as f:
        f.write("crash leftover")

    real_rename = os.rename
    state = {"healed": False}

    def racing_rename(src, dst):
        if dst == final and src.startswith(final + ".tmp"):
            if not state["healed"]:
                # first publish attempt: blocked by the stale dir
                state["healed"] = True
                raise OSError("ENOTEMPTY (stale dir)")
            # retry attempt: winner published in the gap
            os.makedirs(final)
            with open(os.path.join(final, "data.txt"), "w") as f:
                f.write("winner")
            with open(os.path.join(final, "_SUCCESS"), "w"):
                pass
            raise OSError("ENOTEMPTY (winner)")
        return real_rename(src, dst)

    monkeypatch.setattr(td.os, "rename", racing_rename)

    def build(tmp):
        with open(os.path.join(tmp, "data.txt"), "w") as f:
            f.write("loser")

    assert td.ensure_dir_fixture(final, build) == final
    # winner's copy kept, loser discarded, no exception escaped
    assert open(os.path.join(final, "data.txt")).read() == "winner"
    # the stale leftover was claimed aside and removed, not left
    assert not [p for p in os.listdir(tmp_path)
                if p.startswith("fix.stale")]


def test_bucket_sig_udf_guards(spark):
    """ADVICE (round 6): the Arrow signature kernel validates
    embedding width against the planes and rejects null vectors with
    a clear error instead of IndexError / silent truncation."""
    import pytest

    from wrds2pg_spark.operators.similarity import (
        _bucket_sig_udf, hyperplane,
    )

    planes = [hyperplane(j, 4) for j in range(3)]
    udf = _bucket_sig_udf(planes)

    good = spark.createDataFrame(
        [(1, [0.1, -0.2, 0.3, 0.4])], "id long, embedding array<double>")
    assert good.select(udf("embedding")).collect()[0][0] in {
        "000", "001", "010", "011", "100", "101", "110", "111"}

    wide = spark.createDataFrame(
        [(1, [0.1] * 6)], "id long, embedding array<double>")
    with pytest.raises(Exception, match="plane width"):
        wide.select(udf("embedding")).collect()

    nul = spark.createDataFrame(
        [(1, None)], "id long, embedding array<double>")
    with pytest.raises(Exception, match="null embedding"):
        nul.select(udf("embedding")).collect()


def test_sas7bdat_stamp_is_dst_gap_stable(tmp_path):
    """Round-6 review: a header wall time inside the America/Chicago
    spring-forward gap must normalize to a round-trip-stable stamp
    (encode(decode(s)) == s), or the CSV sink's mtime store would
    re-decode an hour later and reload forever."""
    from datetime import datetime

    from wrds2pg_spark.catalog import modified_decode, modified_encode
    from wrds2pg_spark.update import source_modified

    # 2020-03-08 02:30:00 does not exist in America/Chicago
    secs = (datetime(2020, 3, 8, 2, 30, 0)
            - datetime(1960, 1, 1)).total_seconds()
    p = _synthetic_sas7bdat(tmp_path / "gap.sas7bdat", secs)
    s = source_modified(str(p))
    assert modified_decode(modified_encode(s)) == s  # fixed point
    # and a valid wall time is untouched
    secs2 = (datetime(2020, 1, 2, 3, 4, 5)
             - datetime(1960, 1, 1)).total_seconds()
    p2 = _synthetic_sas7bdat(tmp_path / "ok.sas7bdat", secs2)
    assert source_modified(str(p2)) == "Last modified: 01/02/2020 03:04:05"


# --- sas7bdat as a registered Spark DataSource (round 8) --------------------

def test_sas7bdat_datasource_format_roundtrip(spark, tmp_path):
    """format("sas7bdat") must serve bit-identical values to the
    mapInArrow helper: declared-schema read, inferred-schema read,
    one InputPartition per file, no exchange below the scan."""
    import pandas as pd

    from wrds2pg_spark.sinks.sas7bdat import write_sas7bdat
    from wrds2pg_spark.sources.sas7bdat import read_sas7bdat
    from wrds2pg_spark.sources.sas7bdat_datasource import register_sas7bdat

    write_sas7bdat(
        pd.DataFrame({"PERMNO": [1.0, 2.0], "NAME": ["a", "b longer"]}),
        str(tmp_path / "x.sas7bdat"))
    write_sas7bdat(
        pd.DataFrame({"PERMNO": [3.0], "NAME": ["c"]}),
        str(tmp_path / "y.sas7bdat"))

    register_sas7bdat(spark)
    ddl = "permno double, name string"
    via_format = spark.read.format("sas7bdat").schema(ddl).load(
        str(tmp_path))
    via_helper = read_sas7bdat(spark, str(tmp_path), schema=ddl)
    assert via_format.exceptAll(via_helper).count() == 0
    assert via_helper.exceptAll(via_format).count() == 0
    # one partition per unsplittable file
    assert via_format.rdd.getNumPartitions() == 2

    inferred = spark.read.format("sas7bdat").load(str(tmp_path))
    assert dict(inferred.dtypes) == {"permno": "double", "name": "string"}
    assert inferred.count() == 3


def test_sas7bdat_datasource_missing_path_errors(spark):
    from wrds2pg_spark.sources.sas7bdat_datasource import register_sas7bdat

    register_sas7bdat(spark)
    import pytest as _pytest

    with _pytest.raises(Exception, match="no sas7bdat files|required"):
        spark.read.format("sas7bdat").schema("x double").load(
            "/tmp/definitely_missing_glob_*.sas7bdat").count()


def test_sas7bdat_datasource_write_roundtrip(spark, tmp_path):
    """df.write.format("sas7bdat") — two-phase commit (staged files
    publish only from commit), overwrite replaces prior files, and
    read-back through the same format is value-exact."""
    from pyspark.sql import functions as F

    from wrds2pg_spark.sources.sas7bdat_datasource import register_sas7bdat

    register_sas7bdat(spark)
    d = str(tmp_path / "lake")
    src = spark.range(200).select(
        F.col("id").cast("double").alias("k"),
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("nm"),
    ).repartition(3)
    src.write.format("sas7bdat").mode("overwrite").save(d)
    import glob as _glob
    import os
    assert len(_glob.glob(os.path.join(d, "*.sas7bdat"))) == 3
    # staging dirs are job-unique ("_staging-<uuid>"); none may leak
    assert _glob.glob(os.path.join(d, "_staging-*")) == []

    back = spark.read.format("sas7bdat").schema("k double, nm string").load(d)
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0

    # overwrite replaces, never appends
    src.limit(5).repartition(1).write.format("sas7bdat").mode(
        "overwrite").save(d)
    assert len(_glob.glob(os.path.join(d, "*.sas7bdat"))) == 1
    assert spark.read.format("sas7bdat").schema(
        "k double, nm string").load(d).count() == 5


def test_sas7bdat_datasource_chunked_write_bounded_memory(spark, tmp_path):
    """rows_per_file bounds per-task memory: one input partition stages
    multiple files (ceil(rows/rows_per_file)) and the round-trip is
    value-exact — the write side streams like the read side."""
    from pyspark.sql import functions as F

    from wrds2pg_spark.sources.sas7bdat_datasource import register_sas7bdat

    register_sas7bdat(spark)
    d = str(tmp_path / "chunked")
    src = spark.range(250).select(
        F.col("id").cast("double").alias("k")).repartition(1)
    src.write.format("sas7bdat").option("rows_per_file", "100").mode(
        "overwrite").save(d)
    import glob as _glob
    import os
    assert len(_glob.glob(os.path.join(d, "*.sas7bdat"))) == 3  # 100+100+50
    back = spark.read.format("sas7bdat").schema("k double").load(d)
    assert back.count() == 250
    assert back.exceptAll(src).count() == 0


def test_sas7bdat_datasource_overwrite_publish_before_delete(spark, tmp_path):
    """Overwrite commit publishes the new job's files first and only
    then retires prior jobs' files — filenames carry the job suffix, so
    after two overwrites exactly the second job's files remain."""
    from pyspark.sql import functions as F

    from wrds2pg_spark.sources.sas7bdat_datasource import register_sas7bdat

    register_sas7bdat(spark)
    import glob as _glob
    import os
    d = str(tmp_path / "atomic")
    df = spark.range(10).select(F.col("id").cast("double").alias("k"))
    df.repartition(2).write.format("sas7bdat").mode("overwrite").save(d)
    first = set(_glob.glob(os.path.join(d, "*.sas7bdat")))
    assert len(first) == 2
    df.repartition(1).write.format("sas7bdat").mode("overwrite").save(d)
    second = set(_glob.glob(os.path.join(d, "*.sas7bdat")))
    assert len(second) == 1
    assert second.isdisjoint(first)  # job-unique names, old ones retired
    assert spark.read.format("sas7bdat").schema("k double").load(
        d).count() == 10


def test_sas7bdat_datasource_infer_allnull_string(spark, tmp_path):
    """An object column that is all-null in the sampled first chunk
    infers as string (not arrow null), so reading files whose later
    rows carry real strings works without a declared schema."""
    import pandas as pd

    from wrds2pg_spark.sinks.sas7bdat import write_sas7bdat
    from wrds2pg_spark.sources.sas7bdat_datasource import register_sas7bdat

    register_sas7bdat(spark)
    d = tmp_path / "nulls"
    d.mkdir()
    write_sas7bdat(
        pd.DataFrame({"k": [1.0, 2.0], "nm": pd.Series([None, None],
                                                       dtype=object)}),
        str(d / "a.sas7bdat"))
    write_sas7bdat(
        pd.DataFrame({"k": [3.0], "nm": pd.Series(["real"], dtype=object)}),
        str(d / "b.sas7bdat"))
    df = spark.read.format("sas7bdat").load(str(d))
    assert dict(df.dtypes)["nm"] == "string"
    rows = {r["k"]: r["nm"] for r in df.collect()}
    assert rows == {1.0: None, 2.0: None, 3.0: "real"}
