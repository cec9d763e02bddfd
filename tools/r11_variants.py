"""Round-11 same-session interleaved A/Bs for the three candidate
changes (throwaway probe, box-weather doctrine: min-of-N interleaved
in ONE session, never cross-run walls).

  recall   v0: r10 registered form — exact + minhash subtrees each
               re-derive the distinct (p,s) edge list from lineitem
           v1: round-11 form — one checkpointed _jaccard_edges frame
               shared by both subtrees (the registered code)
  triangle v0: r10 form — ps_d un-checkpointed ahead of the cap valve
               (lineitem distinct evaluates 3x)
           v1: round-11 form — ps_d checkpointed once (registered)
  cluster  v0: r10 connected_components — init labels frame + join in
               round 1, eager checkpoint + separate probe per round
           v1: round-11 form — round 1 folded to one groupBy, lazy
               checkpoint materialized by the probe (registered)

Usage: python tools/r11_variants.py [rounds] [which,...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from wrds2pg_spark.queries import (  # noqa: E402
    REGISTRY, _GJMH_HASHES, _JACCARD_BLOCK_CAP,
)
from wrds2pg_spark.session import get_spark  # noqa: E402
from wrds2pg_spark.sources.testdata import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# ---------------------------------------------------------------- recall v0
def _exact_pairs_old(spark, sf_dir):
    import wrds2pg_spark.queries as Q
    return Q._jaccard_exact_pairs(spark, sf_dir)  # own edge build


def recall_v0(spark, sf_dir):
    """r10 shape: exact subtree builds its own checkpointed edges;
    the minhash candidate subtree re-derives (p,s) from lineitem."""
    import wrds2pg_spark.queries as Q
    exact = (
        _exact_pairs_old(spark, sf_dir)
        .select(
            "s_a", "s_b", "n_common",
            (F.col("d_a") + F.col("d_b") - F.col("n_common")).alias("u"),
            (F.col("n_common").cast("double")
             / (F.col("d_a") + F.col("d_b") - F.col("n_common")))
            .alias("__j"),
        )
        .orderBy(F.desc("__j"), "s_a", "s_b")
        .limit(100)
        .drop("__j")
        .localCheckpoint()
    )
    cand = Q._jaccard_minhash_candidates(spark, sf_dir)  # no edges arg
    ov = exact.join(cand, ["s_a", "s_b"])
    stats = ov.agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap"),
        F.coalesce(
            F.sum(F.abs(F.lit(_GJMH_HASHES) * F.col("n_common")
                        - F.col("n_match") * F.col("u"))), F.lit(0),
        ).cast("long").alias("err_num"),
        F.coalesce(
            F.sum(F.lit(_GJMH_HASHES) * F.col("u")), F.lit(0)
        ).cast("long").alias("err_den"),
    )
    nex = exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    return stats.crossJoin(F.broadcast(nex)).select(
        "n_exact", "n_overlap",
        (F.col("n_overlap").cast("double") / F.col("n_exact"))
        .alias("recall_at_100"),
        F.when(F.col("err_den") > 0,
               F.col("err_num").cast("double") / F.col("err_den"))
        .otherwise(F.lit(0.0)).alias("wtd_abs_err"),
    )


def recall_v1(spark, sf_dir):
    return REGISTRY["graph_jaccard_minhash_recall"].fn(spark, sf_dir)


# -------------------------------------------------------------- triangle v0
def triangle_v0(spark, sf_dir):
    """r10 shape: ps_d NOT checkpointed before cap_block_rows."""
    from pyspark.sql import Window as W
    from wrds2pg_spark.operators.skew import cap_block_rows

    li = load_table(spark, sf_dir, "lineitem")
    ps_d = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    capped = cap_block_rows(ps_d, "p", "s", _JACCARD_BLOCK_CAP)
    a = capped.alias("a")
    b = capped.alias("b").hint("shuffle_hash")
    pairs = (
        a.join(b, (F.col("a.p") == F.col("b.p"))
               & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    directed = pairs.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "n_common"
    ).unionAll(pairs.select(
        F.col("v").alias("src"), F.col("u").alias("dst"), "n_common"))
    wk = W.partitionBy("src").orderBy(F.desc("n_common"), "dst")
    edges = (
        directed.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= 4)
        .select(F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e2 = edges.select(F.col("u").alias("b2"), F.col("v").alias("c2"))
    e3 = edges.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        edges.join(e2, F.col("v") == F.col("b2"))
        .join(e3, (F.col("u") == F.col("a3"))
              & (F.col("c2") == F.col("c3")))
        .select(F.col("u").alias("a"), F.col("v").alias("b"),
                F.col("c2").alias("c"))
    )
    pern = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return (
        pern.orderBy(F.desc("n_triangles"), "node").limit(20)
        .select("node", "n_triangles")
    )


def triangle_v1(spark, sf_dir):
    return REGISTRY["graph_triangle_count"].fn(spark, sf_dir)


# --------------------------------------------------------------- cluster v0
def _cc_old(edges, src="id_a", dst="id_b", max_iter=20):
    """r10 connected_components, verbatim."""
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("u").alias("id")).distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym.v == labels.id)
            .select(F.col("u").alias("id"), "comp",
                    F.lit(0).alias("is_old"))
        )
        new_labels = (
            labels.select("id", "comp", F.lit(1).alias("is_old"))
            .unionByName(nbr)
            .groupBy("id")
            .agg(
                F.min("comp").alias("comp"),
                (F.min("comp")
                 < F.min(F.when(F.col("is_old") == 1, F.col("comp")))
                 ).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("__changed").limit(1).count()
        labels = new_labels.select("id", "comp")
        if changed == 0:
            break
    return labels


def cluster_v0(spark, sf_dir):
    from wrds2pg_spark.curation import _minhash_posting
    from wrds2pg_spark.operators.dedup import pairs_from_posting

    docs = load_table(spark, sf_dir, "documents")
    posting = _minhash_posting(spark, sf_dir, docs)
    pairs = pairs_from_posting(docs, posting, threshold=0.5)
    comps = _cc_old(pairs.select("id_a", "id_b"))
    return (
        docs.select("doc_id")
        .join(comps, docs.doc_id == comps.id, "left")
        .select("doc_id",
                F.coalesce(F.col("comp"), F.col("doc_id")).alias("comp"))
    )


def cluster_v1(spark, sf_dir):
    return REGISTRY["dedup_cluster_minhash"].fn(spark, sf_dir)


PAIRS = {
    "recall": (recall_v0, recall_v1),
    "triangle": (triangle_v0, triangle_v1),
    "cluster": (cluster_v0, cluster_v1),
}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    which = (sys.argv[2].split(",") if len(sys.argv) > 2
             else list(PAIRS))
    spark = get_spark(
        app_name="r11_variants",
        extra_conf={"spark.sql.files.maxPartitionBytes": "8m"},
    )

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    # warm both variants (codegen caches, page cache)
    for name in which:
        for fn in PAIRS[name]:
            mat(fn(spark, SF))
    best: dict[str, float] = {}
    for r in range(rounds):
        for name in which:
            for tag, fn in zip(("v0", "v1"), PAIRS[name]):
                t0 = time.perf_counter()
                mat(fn(spark, SF))
                dt = time.perf_counter() - t0
                key = f"{name}:{tag}"
                if key not in best or dt < best[key]:
                    best[key] = dt
                print(f"round {r} {key:16s} {dt:6.3f}", flush=True)
    print("--- min over rounds ---")
    for k, v in sorted(best.items()):
        print(f"{k:16s} {v:6.3f}")


if __name__ == "__main__":
    main()
