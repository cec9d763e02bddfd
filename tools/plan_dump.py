"""Regenerate PLANS.md: formatted physical plans for representative
queries, with the scale-relevant property each plan demonstrates.
Run from the repo root: python tools/plan_dump.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wrds2pg_spark.queries import REGISTRY  # noqa: E402
from wrds2pg_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"

# query -> the plan property worth reading it for
SHOWCASE = {
    "scan_parquet": (
        "Predicate + projection pushdown: PushedFilters carries the "
        "row filter into the parquet reader; ReadSchema holds only the "
        "4 projected columns."
    ),
    "ingest_q1_composite": (
        "The whole SAS option chain (keep/rename/where) collapses into "
        "the scan node; aggregation is two-phase (partial HashAggregate "
        "before the exchange, final after)."
    ),
    "join_inner": (
        "Small dimension broadcasts (BroadcastHashJoin) — the fact side "
        "never shuffles."
    ),
    "join_asof": (
        "As-of join as union + ordered window: ONE exchange on the join "
        "key for |L|+|R| rows, no N*M theta join."
    ),
    "sort_topk": (
        "Top-k compiles to TakeOrderedAndProject — no global sort."
    ),
    "window_rank": (
        "Ranking window: a single hash-partition exchange, sort within "
        "partitions, rank, filter."
    ),
    "events_sessionize": (
        "Inactivity-gap sessionization: ONE user_id exchange feeds the "
        "lag window, the running session-index window and the "
        "(user, session) aggregate — the window's hash partitioning "
        "satisfies the superset grouping key, so no second shuffle."
    ),
    "agg_cms_topk": (
        "Portable count-min sketch: the posting explode triples rows "
        "but the counter aggregate is map-side combined, so the "
        "exchange carries at most depth x width (12,288) rows per task "
        "regardless of input size — the mergeable-sketch property in "
        "plan form."
    ),
    "dq_table_checksum": (
        "Order-independent content checksum: narrow md5 map fused into "
        "the scan stage, map-side-combined group aggregate — one scan "
        "plus a metadata-sized exchange at any table size."
    ),
    "dedup_minhash_lsh": (
        "MinHash LSH: the signature pipeline runs once (groupBy bucket "
        "pair generation, no banded self-join); candidate verification "
        "joins broadcast the tiny candidate set."
    ),
    "similarity_topk": (
        "Brute-force cosine: narrow map + TakeOrderedAndProject, zero "
        "corpus shuffle."
    ),
    "tpch_q3_shape": (
        "3-table join: the segment-filtered customer dim broadcasts "
        "into orders, lineitem joins on the order key, and the top-10 "
        "is TakeOrderedAndProject over the partial-aggregated revenue."
    ),
    "tpch_q5_shape": (
        "6-table join: supplier/nation/region all ride "
        "BroadcastHashJoins; the only repartition exchange is "
        "lineitem-orders.  Catalyst pushes the region filter through "
        "the nation join into the scan."
    ),
    "subquery_scalar": (
        "Uncorrelated scalar subquery: the 1-row global aggregate "
        "broadcasts into the filter — the fact table never shuffles "
        "against it."
    ),
    "subquery_correlated": (
        "Correlated scalar subquery, decorrelated: per-nation mean "
        "aggregates (~25 rows) broadcast back into the customer scan; "
        "the fact side never shuffles."
    ),
    "tpch_q14_shape": (
        "Conditional-aggregate join: part broadcasts, both CASE-WHEN "
        "sums ride one two-phase aggregate — a single SinglePartition "
        "exchange carries two longs per task."
    ),
    "window_range_frame": (
        "RANGE frame: one hash-partition exchange + in-partition sort; "
        "peers share a cumulative value, computed over exact scaled "
        "longs."
    ),
    "tpch_q9_shape": (
        "Manual push-through-aggregate: the part-name filter reaches "
        "BOTH lineitem passes as a broadcast semi-filter below the "
        "partsupp-surrogate aggregation, shrinking the composite-key "
        "shuffles ~8x; ps-side exchange is reused by the fact join."
    ),
    "join_asof_nearest": (
        "Backward+forward as-of carries over ONE keyed union shuffle: "
        "two Window nodes share a single Exchange (the second sorts "
        "in-partition only); the nearest arbiter is a row-local Project."
    ),
    "merge_upsert": (
        "MERGE as co-keyed full-outer SortMergeJoin; both sides hash on "
        "the merge key, update-wins coalesce and action tag are "
        "post-join projections (bucket both sides to make it "
        "exchange-free at scale)."
    ),
    "similarity_ann_indexed": (
        "Materialized ANN index: the probe-bucket IN-filter lands in "
        "PartitionFilters, so the scan lists only the 9 probe "
        "directories of 256 — index selectivity is paid at file "
        "listing, before any I/O."
    ),
    "shard_global_shuffle": (
        "Deterministic training shuffle: hash tagging is row-local "
        "(fused into the scan); ONE exchange on the 16-way shard key "
        "feeds the per-shard position window — no global sort."
    ),
    "multimodal_image_features": (
        "Binary decode pipeline: two Arrow-batched mapInPandas stages "
        "(synthesize -> parse) ride the scan partitioning with zero "
        "exchanges."
    ),
    "scan_partition_pruned": (
        "Directory-level pruning: the year predicate sits in "
        "PartitionFilters, so non-matching partition dirs are never "
        "listed; the aggregate on top still map-side combines."
    ),
    "join_dpp_pruned": (
        "Dynamic partition pruning: the dim's era filter cannot reach "
        "the fact statically, so the fact scan's PartitionFilters "
        "carries a dynamicpruning subquery that reuses the dim "
        "broadcast — only qualifying year directories are listed at "
        "runtime."
    ),
    "join_bloom_filtered": (
        "Runtime bloom-filter join pruning (isolated-session "
        "thresholds): bloom_filter_agg over the filtered dim's keys, "
        "might_contain planted on the fact below its exchange — ~96% "
        "of fact rows dropped before being hashed and shipped."
    ),
    "agg_hll_partial_union": (
        "Mergeable-sketch rollup: fine-grain hll_sketch_agg partials "
        "re-aggregated with hll_union_agg — the coarser rollup is a "
        "sketch merge, never a fact rescan; exact and sketch sides "
        "stay separate passes (no Expand)."
    ),
    "sql_recursive_cte": (
        "Recursive CTE (UnionLoop): depth-bounded BFS where each level "
        "is a distributed frontier-edges join over the checkpointed "
        "edge view — the recursion operator re-expands non-recursive "
        "CTEs per level, so the base table is materialized once "
        "outside it."
    ),
    "scan_zorder_pruned": (
        "Multi-dimensional data skipping: the date x price rectangle "
        "maps driver-side to 12 of 256 Morton cells (PartitionFilters "
        "INSET), while both exact predicates still reach the reader "
        "as PushedFilters — 2-D pruning a 1-D sort can't give."
    ),
    "join_interval_overlap": (
        "Interval x interval overlap as a binned hash equi-join: both "
        "sides explode to covered bins, join on the bin id, and the "
        "first-common-bin filter makes each pair exactly-once without "
        "a dedup exchange — no BroadcastNestedLoopJoin anywhere."
    ),
    "graph_pagerank": (
        "Iterative graph algorithm: the edge list is a checkpointed "
        "scan (lineage cut once), each of the 3 iterations is a "
        "BroadcastHashJoin of the node state onto stationary edges "
        "plus one map-side-combined agg — no per-iteration edge "
        "shuffle, no cartesian."
    ),
    "graph_jaccard_neighbors": (
        "Co-occurrence mining: candidate pairs via a SHUFFLE-HASH "
        "self-join blocked on the shared part (its output feeds a "
        "hash agg, so sort-merge's sorts would be pure overhead); "
        "degree re-attach broadcasts; top-100 is TakeOrdered."
    ),
    "graph_triangle_count": (
        "Ordered-edge-join triangles: the checkpointed u<v edge list "
        "feeds all three join legs (one materialization under the AQE "
        "exchange-reuse failure); the middle-vertex path join yields "
        "a<b<c for free and the closing-edge join is keyed, never a "
        "cartesian; top-20 is TakeOrdered."
    ),
    "join_asof_cogrouped": (
        "CoGroupedMap boundary: both sides shuffle ONCE on a hash "
        "BUCKET of the user key (FlatMapCoGroupsInPandas), and "
        "merge_asof's by= splits per-user inside each Arrow batch — "
        "Python invocations scale with the bucket knob, not user "
        "cardinality (per-user keying measured 13x slower)."
    ),
    "agg_weighted_median": (
        "Weighted median: ONE l_returnflag exchange carries both "
        "window frames (running cumulative weight and group total); "
        "the boundary filter and final min ride the same "
        "partitioning — no second shuffle."
    ),
    "profile_table": (
        "Union of five per-column profiling branches, each a pruned "
        "one-column scan + groupBy(value) hash collapse — no Expand, "
        "no multi-distinct SortAggregate; branches schedule as "
        "parallel stages of one job."
    ),
    "similarity_maxsim": (
        "Late-interaction MaxSim: 64 unrolled dot products + "
        "greatest() as ONE codegen'd projection over the scan, "
        "then TakeOrderedAndProject — no Exchange, no HOF lambdas "
        "(interpreted HOFs measured 18x slower), no Python."
    ),
    "cdc_apply_changelog": (
        "Changelog last-wins as a two-phase struct-max aggregate: "
        "partial_max before the exchange (keyset-only shuffle), "
        "tombstone filter after — never a row_number window sort "
        "over the log."
    ),
    "stream_late_drop_counts": (
        "Watermark late-drop, batch form: per-micro-batch max rides "
        "a metadata-sized window (one row per batch), the lagged "
        "late-event watermark broadcasts back onto the event scan; "
        "events never globally sort."
    ),
    "embedding_covariance_exact": (
        "Exact DxD covariance via map-side matrix partials: one "
        "mapInPandas stage folds each partition to a single "
        "(n, sums, outer-products) row, so the exchanges above it "
        "carry ~partitions x D^2 longs, never the corpus."
    ),
    "similarity_ivfpq_indexed": (
        "Materialized IVF-PQ serving scan: PartitionFilters prunes "
        "to the query's nprobe cell directories at listing time, "
        "ReadSchema carries only (vec_id, pq_code) — the raw float "
        "vectors are never read; scoring is m unpack-and-lookup "
        "codegen expressions on one BIGINT, then TakeOrdered."
    ),
    "tpch_q21_bucketed": (
        "Round 7: zero fact exchanges and zero sorts — the co-bucketed "
        "fact join is a ShuffledHashJoin (no 730k-row broadcast build), "
        "both aggregates ride the bucket partitioning, and the per-order "
        "window is replaced by a second hash aggregate extracting the "
        "sole late supplier via max(when(...))."
    ),
    "tpch_q17_bucketed": (
        "Round 7: the correlated per-part average window rides the "
        "partkey bucket layout — the only shuffle is the 1-row final "
        "aggregate (part dim broadcasts)."
    ),
    "ts_resample_ffill": (
        "Round 7 generator form: the dense per-user day grid is EMITTED "
        "(lead() window + sequence/explode carrying the fill value "
        "row-locally), never joined — no users x days BNLJ spine, no "
        "dense-grid shuffle, no ignorenulls frame scan."
    ),
    "vocab_bpe_merges": (
        "Iterative BPE training with zero driver collect: per round one "
        "map-side-combined pair count, a TakeOrderedAndProject(1) "
        "argmax, and the 1-row winner broadcast into a row-local "
        "aggregate() fold; rounds separated by lazy localCheckpoints."
    ),
    "tpch_q18_bucketed": (
        "Pre-bucketed facts: the HAVING aggregate and the "
        "lineitem<->orders SMJ both run exchange-free over "
        "orderkey-bucketed, sorted, single-file-per-bucket catalog "
        "tables; customer attaches as a semi join against the "
        "aggregated ~|big orders| rows, never widening fact rows."
    ),
    "decontaminate_embedding": (
        "Semantic decontamination: the benchmark slice is published "
        "to parquet once and each executor's Arrow kernel reads it "
        "as a side input (no driver collect, no JVM crossJoin); "
        "training vectors stream through a vectorized numpy "
        "max-cosine probe inside mapInPandas, and only the per-label "
        "rollup exchanges."
    ),
    "stats_ols_by_group": (
        "Per-group OLS as ONE map-side-combined moment aggregate: "
        "a single hash exchange carries 7 integers per group "
        "(overflow-prone squares ride hi/lo split-long sums — the "
        "DECIMAL-sum alternative measured a 39x codegen cliff); the "
        "slope/intercept/R-squared combination is per-group project "
        "work above the final aggregate."
    ),
    "stats_fama_macbeth": (
        "Fama-MacBeth two-pass: the characteristic attach is a "
        "hint-free equi-join (stats/AQE pick broadcast while the "
        "customer side fits), pass 1 is one month-keyed moment "
        "aggregate, and pass 2 reduces the rounded slopes to a "
        "single row — the fact table is scanned once and the driver "
        "never sees data."
    ),
}


def main() -> None:
    spark = get_spark(app_name="plan_dump")
    out = [
        "# PLANS — formatted physical plans for representative queries",
        "",
        "Auto-generated by `tools/plan_dump.py` (sf0.001 inputs; plan",
        "shape is scale-independent). `tests/test_plans.py` asserts the",
        "load-bearing properties so they cannot regress silently.",
        "",
    ]
    for name, why in SHOWCASE.items():
        df = REGISTRY[name].fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", why, "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
