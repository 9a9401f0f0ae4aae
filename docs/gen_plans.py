"""Regenerate docs/PLANS.md from live executed plans.

Usage: python docs/gen_plans.py  (from the repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ex_aws_firehose_spark.registry import REGISTRY, load_all_operators
from ex_aws_firehose_spark.session import get_spark

PICKS = {
    "q_sim_graph_ann_adc": (
        "ADC graph serving: every expansion round joins the candidates' "
        "M-byte PQ codes against the broadcast M*K-row LUT (the floats "
        "never load); the map-side-combinable groupBy(vec_id) sums "
        "int64 subspace distances; only the final RERANK-pool rows "
        "point-gather true vectors for the exact cosine top-k "
        "(TakeOrderedAndProject)."
    ),
    "q_layout_cluster_incremental": (
        "Incremental OPTIMIZE: the overlap decision is a |files|-row "
        "interval self-join on the z-range manifest (metadata grain); "
        "the rewrite reads ONLY the dirty partition dirs (clean files "
        "never open) and is one repartition+partitionBy write of the "
        "append fraction; the probe read plans from the pruned "
        "manifest's surviving dirs."
    ),
    "q_sim_graph_ann_batch": (
        "Multi-query beam serving: the degree-bounded edge table is "
        "probed by a broadcast of the <=Q*BEAM-row frontier each round; "
        "candidate gathers are semi-join point lookups; the query frame "
        "(<=4 rows) broadcasts into every scoring join - no shuffle "
        "scales with corpus size."
    ),
    "q_embed_opq_rotate": (
        "OPQ remap: the 64-row permutation broadcasts into the "
        "component-frame join (no extra shuffle vs plain PQ); both "
        "Lloyd arms are map-side-combined aggs to K*d centroid rows "
        "with broadcast E-steps."
    ),
    "q_sql_flagship": (
        "Five-table star join: three dimension joins broadcast, the "
        "lineitem⋈orders fact join shuffles on orderkey; aggregation is "
        "partial (map-side) then final."
    ),
    "q_join_broadcast": (
        "region/nation dims broadcast — no shuffle of the fact side."
    ),
    "q_dedup_minhash": (
        "Signature stage is a pure map (array folds, no explode/groupBy); "
        "candidates come from the (band, bsig) bucket equi-join — at test "
        "SF AQE broadcasts the small side, at scale both sides shuffle on "
        "the band key and the explicit exchange is reused (plan-gated: "
        "test_minhash_band_join_is_bucketed_equi)."
    ),
    "q_filter_predicate": (
        "Every conjunct reaches the parquet scan as a PushedFilter; scan "
        "reads only projected columns."
    ),
    "q_sort_limit_topk": "Top-k is TakeOrderedAndProject — no global sort.",
    "q_sim_cosine_topk": (
        "Query vector broadcast; cosine is a whole-stage-codegen fold; "
        "ranking keeps k rows per partition."
    ),
    "q_contamination_ngram": (
        "Eval shingle dictionary (int64 hashes) broadcast — the training "
        "corpus streams map-side through a LeftSemi broadcast join; no "
        "shuffle of the big side's shingles."
    ),
    "q_sim_centroid_assign": (
        "k-row codebook meets the vectors via BroadcastNestedLoopJoin; "
        "argmin is a map-side min(struct) combine, so only (vec_id, best) "
        "pairs shuffle."
    ),
    "q_join_anti_null_aware": (
        "NOT IN plans as a null-aware BroadcastHashJoin (LeftAnti) — the "
        "three-valued-logic case an ordinary anti join gets wrong."
    ),
    "q_join_bucketed": (
        "Fact-fact SMJ over bucketed+sorted tables: zero Exchange in the "
        "whole plan — the at-rest layout carries the co-location."
    ),
    "q_tpch_q3": (
        "Both date filters and the segment filter are PushedFilters; the "
        "top-10 is TakeOrderedAndProject, never a global sort."
    ),
    "q_join_bloom_prefilter": (
        "Three broadcast left-semi joins on bloom position sets prefilter "
        "the fact scan before the exact broadcast join — fact rows that "
        "miss the dim never reach a shuffle."
    ),
    "q_sketch_heavy_hitters": (
        "Misra–Gries partials via MapInPandas (64 rows per partition "
        "regardless of input), merged on a single-group ApplyInPandas — "
        "the raw table never shuffles."
    ),
    "q_sessionize_gap": (
        "lag + running-sum + session rollup share one (user_id) Exchange "
        "and a single Sort — the whole chain is one shuffle."
    ),
    "q_tpch_q21": (
        "EXISTS/NOT EXISTS decorrelated to left-semi + left-anti SMJs, "
        "all legs co-partitioned on l_orderkey."
    ),
    "q_tpch_q1": (
        "Eight aggregates in ONE partial+final HashAggregate pair over the "
        "pushed-filter scan; the exchange carries ≤6 rows per partition."
    ),
    "q_tpch_q19": (
        "Catalyst splits the 3-arm OR: the brand IN-list reaches the part "
        "scan, the quantity range reaches lineitem — both below the "
        "broadcast join."
    ),
    "q_tpch_q17": (
        "Correlated AVG decorrelated: per-part (sum, cnt) aggregate joined "
        "back on the same l_partkey partitioning; the 20%% test is exact "
        "int64 cross-multiplication."
    ),
    "q_dedup_prefix_filter": (
        "Rarest-first ranking and the per-doc window share one doc_id "
        "Exchange; only prefix shingles enter the candidate join; "
        "verification joins candidate pairs to token ARRAYS — one "
        "array_intersect per pair, no re-explosion."
    ),
    "q_sim_knn_graph": (
        "Norms projected per row BEFORE the label-bucket self-join (one "
        "dot fold per pair); join and per-vector top-k rank share the "
        "bucket exchange."
    ),
    "q_interval_merge": (
        "Running-max-of-ends, island running-sum, and the span aggregate "
        "all ride one (user_id) Exchange and one Sort."
    ),
    "q_tpch_q5": (
        "Region→nation prune and supplier broadcast; the year filter is a "
        "PushedFilter on the orders scan; the only fact-scale shuffle is "
        "lineitem⋈orders, and the nationkey equality is a post-join "
        "filter, never a BNLJ."
    ),
    "q_layout_zorder": (
        "Engine-neutral integer Morton code feeds two ntile bucketings; "
        "the audit is one bucket-grain HashAggregate — the z-write at "
        "scale is repartitionByRange on the same code."
    ),
    "q_graph_triangles": (
        "Pair-gen joins inside (hour, type) buckets; wedge + closure are "
        "hash equi-joins on vertex keys (left-semi closure) — no "
        "CartesianProduct anywhere (plan-gated)."
    ),
    "q_sketch_count_min": (
        "Sketch build collapses to 192 cells in one partial+final "
        "HashAggregate; point queries broadcast the cell table."
    ),
    "q_attribution_last_touch": (
        "Touch join is a user_id equi join with the 24 h band as an "
        "in-join filter; per-purchase argmax is a map-side max(struct) "
        "partial aggregate."
    ),
    "q_text_bigram_lm": (
        "Bigram stream generated per-row (zip_with, zero shuffle); "
        "scoring joins two count tables — AQE broadcasts the Zipf head."
    ),
    "q_recursive_cte": (
        "WITH RECURSIVE plans as the native UnionLoop operator "
        "(plan-gated) — per-step self-join to the empty-step fixpoint, "
        "no driver-side unrolling."
    ),
    "q_embed_norm_outliers": (
        "Milli-quantized ||e||^2 is a map-only fold; label stats join "
        "back broadcast; the 3-sigma flag is exact-integer "
        "cross-multiplication — zero fact-scale shuffles."
    ),
    "q_udf_sql_body": (
        "The SQL-body function inlines at analysis time: the plan is "
        "identical to writing the expression inline — one partial+final "
        "HashAggregate over the scan, no Python operator."
    ),
    "q_window_ewma": (
        "All 8 lag terms collapse into ONE Window operator — a single "
        "user_id Exchange and a single (ts, event_id) Sort serve the "
        "whole kernel (plan-gated: test_ewma_all_lags_share_one_window)."
    ),
    "q_sketch_kmv_distinct": (
        "The K smallest hashes compile to TakeOrderedAndProject — K rows "
        "per partition cross the wire, never a global Sort; sketch union "
        "is concat + re-take-K."
    ),
    "q_join_dpp": (
        "The fact scan carries a dynamicpruning PartitionFilter fed by "
        "the dim subquery (reusing the join's broadcast): only the ~12 "
        "matching month directories open, with no static predicate on "
        "the fact side."
    ),
    "q_subquery_decorrelated": (
        "Both correlated scalar subqueries decorrelate to one grouped "
        "aggregate joined back (no per-row Subquery node) — the engine, "
        "not the author, owns decorrelation."
    ),
    "q_embed_top_pc": (
        "One Arrow-batched MapInPandas computes per-partition int64 Gram "
        "partials (numpy matmul); everything after runs on d x d frames "
        "via broadcast joins — the data is scanned exactly once."
    ),
    "q_skyline_pareto": (
        "No dominance join: per-day max (map-side-combined agg) then one "
        "RANGE-frame running max over |days| rows — the 2-D total-order "
        "collapse of the skyline operator."
    ),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all_operators()
    spark = get_spark(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# Physical-plan evidence (sf0.1, local[32], AQE on)",
        "",
        "Generated from live `executedPlan` output — regenerate with "
        "`python docs/gen_plans.py`.",
        "",
    ]
    for key, note in PICKS.items():
        df = REGISTRY[key].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out += [f"## {key}", "", note, "", "```", plan.strip()[:2600], "```", ""]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
