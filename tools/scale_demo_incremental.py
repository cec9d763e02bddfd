"""Scale demonstration for the dedup family: what a materialized LSH
signature index buys at 10x corpus growth.

Contrast, at corpus sizes 5k and 50k documents (10x via near-dup
replication — each replica differs by a suffix token, the realistic
crawl case), the cost of:
  (a) FULL re-dedup of corpus+arrivals (pay the whole signature +
      bucket + verify pipeline again — the no-index daily cost),
  (b) building the signature index ONCE (ingest-time cost), and
  (c) probing a fixed 500-document arrival batch against the index
      (the actual daily cost with the index).

All three use the md5-portable hash family (the oracle-checked one).
The point: (c) is bounded by the ARRIVAL batch, not the corpus —
(a) grows superlinearly with corpus size (near-dup clusters densify
bucket posting lists), (c) stays flat.

Usage: python tools/scale_demo_incremental.py
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

from pyspark.sql import functions as F  # noqa: E402

from wrds2pg_spark.operators.dedup import (  # noqa: E402
    build_minhash_bucket_index, dedup_incremental_portable,
    minhash_lsh_pairs_portable,
)
from wrds2pg_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1/documents.parquet"
N_ARRIVALS = 500


def build_docs(factor: int, out: str) -> str:
    """Replicated documents fixture with per-replica near-dup suffix."""
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    con = duckdb.connect()
    mx = con.execute(
        f"SELECT max(doc_id) FROM read_parquet('{SRC}')").fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT doc_id + i * {mx + 1} AS doc_id,
                 CASE WHEN i = 0 THEN text ELSE text || ' r' || i END AS text,
                 lang,
                 source
          FROM read_parquet('{SRC}'),
               (SELECT unnest(range({factor})) AS i)
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    con.close()
    return f"{out}/documents.parquet"


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark(app_name="scale_demo_incremental")

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    # Warm-up: the md5-HOF signature pipeline runs a wide codegen'd
    # expression tree whose C2 compilation dominates a cold first run
    # (bench.py warms the same family for the same reason).  Exercise
    # every measured code path once before any timing.
    warm_docs = spark.read.parquet(SRC).limit(500)
    warm_idx = "/tmp/dedup_scale_idx_warm"
    for _ in range(2):
        mat(minhash_lsh_pairs_portable(warm_docs.select("doc_id", "text")))
        build_minhash_bucket_index(warm_docs, warm_idx)
        mat(dedup_incremental_portable(spark, warm_idx, warm_docs,
                                       warm_docs.limit(50)))

    rows = []
    for factor in (1, 10):
        path = (SRC if factor == 1
                else build_docs(factor, f"/tmp/dedup_scale_x{factor}"))
        corpus = spark.read.parquet(path)
        n = corpus.count()
        # fixed-size arrival batch: near-dups of existing docs
        arrivals = (
            spark.read.parquet(SRC).limit(N_ARRIVALS)
            .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" new")).alias("text"))
        )
        full_input = corpus.select("doc_id", "text").unionByName(arrivals)

        # (a) full re-dedup, no index
        t_full = timed(lambda: mat(
            minhash_lsh_pairs_portable(full_input, threshold=0.5)))
        # (b) index build, once
        idx = f"/tmp/dedup_scale_idx_x{factor}"
        t_build = timed(lambda: build_minhash_bucket_index(corpus, idx))
        # (c) arrival probe against the index
        t_probe = timed(lambda: mat(dedup_incremental_portable(
            spark, idx, corpus, arrivals, threshold=0.5)))
        rows.append({"factor": factor, "docs": n, "full_rerun_s": t_full,
                     "index_build_s": t_build, "probe_s": t_probe})

    print("| corpus | docs | full re-dedup (no index) "
          "| index build (once) | 500-doc arrival probe |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| x{r['factor']} | {r['docs']:,} | {r['full_rerun_s']} s "
              f"| {r['index_build_s']} s | {r['probe_s']} s |")
    print(json.dumps({"metric": "incremental_dedup_scale_demo",
                      "rows": rows}))


if __name__ == "__main__":
    main()
