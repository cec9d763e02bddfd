"""Scale demonstration for the similarity-search family: exact
brute-force vs the materialized IVF index at 1x / 10x / 1000x corpus
size (2k -> 2M vectors), answering "does the index's partition-pruned
probe actually buy sub-linear query cost, and what does the one-time
build cost?".

Replicated fixtures are built in /tmp by FK-shifted duplication with a
small deterministic per-replica perturbation (so replicas are near
neighbours, not exact dups — cells stay balanced instead of
degenerate).  The driver testdata itself is read-only and untouched.

Usage: python tools/scale_demo_ann.py
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from wrds2pg_spark.operators.similarity import (  # noqa: E402
    brute_force_topk, build_ivf_index, build_ivfpq_index,
    ivf_topk_indexed, ivfpq_topk_indexed, upsert_ivfpq_index,
)
from wrds2pg_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1/embeddings.parquet"
QUERY_SEED_ROW = 7  # use a fixture vector as the probe query
K = 20
NPROBE = 4


def build_fixture(factor: int, out: str) -> None:
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    con = duckdb.connect()
    mx = con.execute(
        f"SELECT max(vec_id) FROM read_parquet('{SRC}')").fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT vec_id + i * {mx + 1} AS vec_id,
                 list_transform(embedding,
                     x -> x + (i % 97) * 0.003) AS embedding,
                 label
          FROM read_parquet('{SRC}'),
               (SELECT unnest(range({factor})) AS i)
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    con.close()


def timed(fn, n: int = 2) -> float:
    fn()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark(app_name="scale_demo_ann")
    con = duckdb.connect()
    qvec = [float(x) for x in con.execute(
        f"SELECT embedding FROM read_parquet('{SRC}') "
        f"WHERE vec_id = {QUERY_SEED_ROW}").fetchone()[0]]
    con.close()

    rows = []
    for factor in (1, 10, 1000):
        fx = f"/tmp/ann_scale_x{factor}"
        if factor == 1:
            src_path = SRC
        else:
            build_fixture(factor, fx)
            src_path = f"{fx}/embeddings.parquet"
        corpus = spark.read.parquet(src_path)
        n = corpus.count()

        def mat(df):
            df.write.mode("overwrite").format("noop").save()

        t_brute = timed(lambda: mat(brute_force_topk(corpus, qvec, k=K)))

        idx = f"/tmp/ann_scale_idx_x{factor}"
        nlist = 16 if factor == 1 else 64
        fit = None if factor <= 10 else 0.05
        t0 = time.perf_counter()
        build_ivf_index(corpus, idx, nlist=nlist, fit_fraction=fit)
        t_build = round(time.perf_counter() - t0, 3)
        t_ivf = timed(lambda: mat(
            ivf_topk_indexed(spark, idx, qvec, k=K, nprobe=NPROBE)))

        # IVF-PQ: same pruning, but the scan reads 8-byte codes, not
        # 256-byte float vectors — the I/O claim measured
        pq_idx = f"/tmp/ann_scale_ivfpq_x{factor}"
        pq_nlist = 16
        t0 = time.perf_counter()
        build_ivfpq_index(corpus, pq_idx, nlist=pq_nlist)
        t_pq_build = round(time.perf_counter() - t0, 3)
        t_pq = timed(lambda: mat(ivfpq_topk_indexed(
            spark, pq_idx, qvec, k=K, nlist=pq_nlist, nprobe=NPROBE)))

        # incremental maintenance: a FIXED 2k-vector arrival batch
        # upserts into the index — cost must stay flat while the full
        # rebuild above grows with the corpus (arrival-bounded claim)
        from pyspark.sql import functions as F
        arrivals = spark.read.parquet(SRC).withColumn(
            "vec_id", F.col("vec_id") + F.lit(n * 10))
        t0 = time.perf_counter()
        upsert_ivfpq_index(arrivals, pq_idx, nlist=pq_nlist)
        t_upsert = round(time.perf_counter() - t0, 3)

        rows.append({
            "factor": factor, "vectors": n, "brute_s": t_brute,
            "ivf_build_s": t_build, "ivf_query_s": t_ivf, "nlist": nlist,
            "ivfpq_build_s": t_pq_build, "ivfpq_query_s": t_pq,
            "ivfpq_upsert_2k_s": t_upsert,
        })

    print("| corpus | vectors | brute-force top-k | IVF build (once) "
          "| IVF top-k (nprobe=4) | IVF-PQ build | IVF-PQ top-k "
          "| IVF-PQ upsert 2k |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| x{r['factor']} | {r['vectors']:,} | {r['brute_s']} s "
              f"| {r['ivf_build_s']} s | {r['ivf_query_s']} s "
              f"| {r['ivfpq_build_s']} s | {r['ivfpq_query_s']} s "
              f"| {r['ivfpq_upsert_2k_s']} s |")
    print(json.dumps({"metric": "ann_scale_demo", "rows": rows}))


if __name__ == "__main__":
    main()
