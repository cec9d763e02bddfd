"""Scale-evidence spot check (round-11, VERDICT r10 item 6): time a
key list at a larger scale factor and two core counts, with bench.py's
exact methodology (noop sink, warm-up at sf0.001, interleaved passes,
per-key minimum), so the 8-vs-32-core ratio measures CODE scaling
instead of the sf0.1 scheduler-quantum floor (235/244 keys showed no
core-scaling at sf0.1 — the bench could no longer certify
scale-safety).

The fixture is FK-consistent replication of the driver's sf0.1 data
(tools/scale_fixture.py — synthesis for scaling demos only; driver
testdata stays read-only and authoritative for correctness).

Usage:
  python tools/scale_fixture.py 10 /root/testdata/sf0.1 /tmp/sf1
  SPARK_GRAFT_CPUS=32 python tools/scale_bench.py /tmp/sf1 k1,k2,...
  SPARK_GRAFT_CPUS=8  python tools/scale_bench.py /tmp/sf1 k1,k2,...

Prints one JSON line {"metric": "scale_check_wall_clock", ...,
"queries": {key: min_sec}, "cpus": N}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wrds2pg_spark.queries import REGISTRY  # noqa: E402
from wrds2pg_spark.session import get_spark  # noqa: E402

# The 20 largest sf0.1 wall keys (BENCH_local_r11_pre.json), minus
# nothing — none of them needs a /tmp index fixture.
DEFAULT_KEYS = (
    "graph_jaccard_minhash_recall,graph_triangle_count,"
    "graph_jaccard_minhash,graph_jaccard_neighbors,graph_pagerank,"
    "sql_recursive_cte,quality_ccnet_buckets,dedup_cluster_minhash,"
    "dedup_minhash_lsh,dedup_semantic_cells,text_boilerplate_ngram,"
    "vocab_bpe_merges,vocab_bpe_compression,text_bigram_logprob,"
    "pipeline_curation_funnel,decontaminate_ngram,"
    "overlap_source_trigram,dedup_incremental_embedding,"
    "tpch_q21_bucketed,tpch_q11_shape"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    keys = (sys.argv[2] if len(sys.argv) > 2 else DEFAULT_KEYS).split(",")
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(
        app_name="wrds2pg_spark_scale_bench",
        # same local split-size tune as bench.py: the replicated fact
        # tables are still small enough that the 128 MB default packs
        # a scan into a handful of splits, which would starve the
        # 8-vs-32-core comparison at the scan stage
        extra_conf={"spark.sql.files.maxPartitionBytes": "8m"},
    )

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    warm_dir = "/root/testdata/sf0.001"
    for name in keys:
        spec = REGISTRY.get(name)
        if spec is not None:
            try:
                mat(spec.fn(spark, warm_dir))
            except Exception as exc:  # noqa: BLE001
                print(f"[warm] {name}: {type(exc).__name__}: {exc}",
                      file=sys.stderr)
    # one untimed target-SF pass: C2 compilation + page-cache fill +
    # any amortized fixture build (bucketed twins), mirroring bench.py
    for name in keys:
        spec = REGISTRY.get(name)
        if spec is not None:
            try:
                mat(spec.fn(spark, sf_dir))
            except Exception as exc:  # noqa: BLE001
                print(f"[warm-sf] {name}: {type(exc).__name__}: {exc}",
                      file=sys.stderr)

    times: dict[str, float] = {}
    for _ in range(passes):
        for name in keys:
            spec = REGISTRY.get(name)
            if spec is None:
                continue
            t0 = time.perf_counter()
            mat(spec.fn(spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
    print(json.dumps({
        "metric": "scale_check_wall_clock",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf_dir": sf_dir,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }))


if __name__ == "__main__":
    main()
