"""10× scale probe (VERDICT r7 ask #7): time the heaviest batch keys
at sf0.1 and at a 10×-replicated sf1 and check seconds-per-row stays
~linear. The 4× linearity gates (tests/test_scale_shape.py) cover the
small end; this probe is the large end, run out-of-band and recorded
in docs/SCALE.md.

The sf1 probe data derives from sf0.1 by replication with SEMANTICS-
PRESERVING transforms — naive row duplication would be an invalid
probe (10 exact copies of every document inflates the near-duplicate
density quadratically and every dedup key would go superlinear by
construction, telling us nothing about real 10× corpora):

- all surrogate keys offset by replica × (max+1), FK-consistently
  (o_custkey follows customer, l_orderkey follows orders, …);
- document TEXT is token-salted per replica (every non-leading token
  prefixed ``r{i}x``) so cross-replica shingle overlap is ~zero and
  the duplication RATE — the thing dedup cost scales with — matches
  sf0.1 exactly; within-replica duplicate structure is preserved;
- embeddings are cyclically ROTATED per replica (norm-preserving, so
  cosine geometry per replica is identical but replicas don't stack
  on the same points);
- dimension tables (region, nation) stay fixed — 25 nations at any SF;
- event timestamps keep the same window (more events per unit time,
  the realistic shape of scale).

Usage: python tools/scale_probe.py [--factor 10] [--keep]
Writes the measured table to stdout; paste/append into docs/SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"

# top-10 heaviest batch keys by BENCH_DETAIL (round 7), spanning the
# documents / embeddings / events / orders-lineitem families
PROBE_KEYS = [
    "q_curate_span_cascade",
    "q_attribution_markov_removal",
    "q_filter_pattern_columns",
    "src_format_avro",
    "q_curate_dedup_keeper",
    "q_bpe_encode",
    "q_dbscan_clusters",
    "q_decode_chain",
    "q_curate_dedup_cascade",
    "q_assoc_brand_pairs",
]

# per-key dominant input table, for the s/row denominator
KEY_TABLE = {
    "q_curate_span_cascade": "documents",
    "q_attribution_markov_removal": "events",
    "q_filter_pattern_columns": "events",
    "src_format_avro": "events",
    "q_curate_dedup_keeper": "documents",
    "q_bpe_encode": "documents",
    "q_dbscan_clusters": "embeddings",
    "q_decode_chain": "events",
    "q_curate_dedup_cascade": "documents",
    "q_assoc_brand_pairs": "lineitem",
    # round-10 heavies (VERDICT r10 ask #4)
    "q_sim_graph_ann": "embeddings",
    "q_table_merge_into": "orders",
    "q_maintenance_expire_snapshots": "orders",
    "q_stream_exp_histogram": "events",
    "q_sim_ivf_incremental_add": "embeddings",
    # round-9 continuation keys
    "q_eval_pass_at_k": "events",
    "q_eval_bradley_terry": "events",
    "q_dq_outlier_iqr": "events",
    "q_timeseries_stl_additive": "events",
    "q_graph_two_hop_reach": "events",
    "q_sketch_theta_diff": "lineitem",
    "q_sim_mmr_rerank": "embeddings",
    "q_read_position_deletes": "orders",
    # round-12 keys (VERDICT r11 asks #2/#6/#7/#8)
    "q_sim_ivf_compact": "embeddings",
    "q_stream_ivm_join_delta": "orders",
    "q_timeseries_multi_changepoint": "events",
    "q_meta_snapshot_refs": "orders",
    # round-13 keys (VERDICT r12 asks #1/#2/#3/#5 + lifecycle closure)
    "q_sim_graph_ann_add": "embeddings",
    "q_sim_graph_ann_delete": "embeddings",
    "q_sim_graph_ann_compact": "embeddings",
    "q_maintenance_rewrite_manifests": "orders",
    "q_embed_opq_rotate": "embeddings",
    "q_table_branch_fast_forward": "orders",
    "q_eval_pref_bias_audit": "events",
    "q_sim_graph_ann_batch": "embeddings",
    "q_stream_graph_serve": "embeddings",
    "q_text_heaps_law": "documents",
    # round-14 keys (VERDICT r13 asks #1-#5 + stretch)
    "q_table_rollback": "orders",
    "q_table_cherry_pick": "orders",
    "q_sim_graph_ann_filtered": "embeddings",
    "q_sim_graph_ann_adc": "embeddings",
    "q_stream_graph_upsert": "embeddings",
    "q_layout_cluster_incremental": "orders",
}


# keys whose first run builds a session-cached index: probe both the
# cold (build+serve) and warm (serve-only) timings
SPLIT_CACHE_KEYS = {"q_sim_graph_ann"}


def build_probe_dir(out: str, factor: int) -> None:
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def mx(table: str, col: str) -> int:
        return con.execute(
            f"SELECT MAX({col}) + 1 FROM read_parquet('{SF01}/{table}.parquet')"
        ).fetchone()[0]

    D, V, E, U = (
        mx("documents", "doc_id"),
        mx("embeddings", "vec_id"),
        mx("events", "event_id"),
        mx("events", "user_id"),
    )
    OK, CK, SK, PK = (
        mx("orders", "o_orderkey"),
        mx("customer", "c_custkey"),
        mx("supplier", "s_suppkey"),
        mx("part", "p_partkey"),
    )

    def rep(table: str, select_fn) -> None:
        parts = " UNION ALL ".join(
            f"SELECT {select_fn(i)} "
            f"FROM read_parquet('{SF01}/{table}.parquet')"
            for i in range(factor)
        )
        con.execute(f"COPY ({parts}) TO '{out}/{table}.parquet'")

    for t in ("region", "nation"):
        shutil.copy(f"{SF01}/{t}.parquet", f"{out}/{t}.parquet")

    rep(
        "documents",
        lambda i: (
            f"doc_id + {i * D} AS doc_id, "
            + (
                "text, lang, source, n_chars"
                if i == 0
                else f"replace(text, ' ', ' r{i}x') AS text, lang, source,"
                f" length(replace(text, ' ', ' r{i}x')) AS n_chars"
            )
        ),
    )
    dim = 64
    rep(
        "embeddings",
        lambda i: (
            f"vec_id + {i * V} AS vec_id, label, "
            + (
                "embedding"
                if i % dim == 0
                else f"list_concat(embedding[{(i % dim) + 1}:{dim}],"
                f" embedding[1:{i % dim}]) AS embedding"
            )
        ),
    )
    rep(
        "events",
        lambda i: f"event_id + {i * E} AS event_id, ts,"
        f" user_id + {i * U} AS user_id, event_type, value, props",
    )
    rep(
        "customer",
        lambda i: f"c_custkey + {i * CK} AS c_custkey, c_name, c_nationkey,"
        " c_acctbal, c_mktsegment",
    )
    rep(
        "supplier",
        lambda i: f"s_suppkey + {i * SK} AS s_suppkey, s_name, s_nationkey,"
        " s_acctbal",
    )
    rep(
        "part",
        lambda i: f"p_partkey + {i * PK} AS p_partkey, p_name, p_brand,"
        " p_type, p_size, p_retailprice",
    )
    rep(
        "orders",
        lambda i: f"o_orderkey + {i * OK} AS o_orderkey,"
        f" o_custkey + {i * CK} AS o_custkey, o_orderstatus, o_totalprice,"
        " o_orderdate, o_orderpriority",
    )
    rep(
        "lineitem",
        lambda i: f"l_orderkey + {i * OK} AS l_orderkey,"
        f" l_partkey + {i * PK} AS l_partkey,"
        f" l_suppkey + {i * SK} AS l_suppkey, l_linenumber, l_quantity,"
        " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
        " l_shipdate",
    )
    con.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--keys", default=None, help="comma list override")
    args = ap.parse_args()

    probe_dir = tempfile.mkdtemp(prefix="scale_probe_") + "/sf1"
    print(f"staging {args.factor}x probe data at {probe_dir}", file=sys.stderr)
    t0 = time.time()
    build_probe_dir(probe_dir, args.factor)
    print(f"staged in {time.time() - t0:.1f}s", file=sys.stderr)

    from pyspark.sql import SparkSession

    from ex_aws_firehose_spark.registry import REGISTRY, load_all_operators

    load_all_operators()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("scale-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    keys = args.keys.split(",") if args.keys else PROBE_KEYS
    results = []
    for key in keys:
        fn = REGISTRY[key].fn
        row = {"key": key}
        for label, sf_dir, factor in (
            ("sf0.1", SF01, 1),
            (f"sf0.1x{args.factor}", probe_dir, args.factor),
        ):
            nrows = duckdb.execute(
                "SELECT COUNT(*) FROM read_parquet(?)",
                [f"{sf_dir}/{KEY_TABLE[key]}.parquet"],
            ).fetchone()[0]
            # bench protocol: time the FIRST run of each key in a warm
            # session (a second run would mostly hit the per-(session,
            # sf) fixture caches and measure nothing); session warmed
            # below by the table counts
            spark.read.parquet(f"{sf_dir}/{KEY_TABLE[key]}.parquet").count()
            t = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t
            row[label] = round(dt, 2)
            row[f"{label}_us_per_row"] = round(dt / nrows * 1e6, 3)
            if key in SPLIT_CACHE_KEYS:
                # second run hits the session-cached index: it times
                # SERVE alone; first-run minus second-run is the BUILD
                t = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                row[f"{label}_serve_s"] = round(time.time() - t, 2)
                row[f"{label}_build_s"] = round(
                    row[label] - row[f"{label}_serve_s"], 2
                )
        row["ratio"] = round(
            row[f"sf0.1x{args.factor}_us_per_row"] / row["sf0.1_us_per_row"], 2
        )
        results.append(row)
        print(json.dumps(row), flush=True)

    print("\n| key | sf0.1 s | x%d s | µs/row @0.1 | µs/row @x%d | ratio |"
          % (args.factor, args.factor))
    print("|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| `{r['key']}` | {r['sf0.1']} | {r[f'sf0.1x{args.factor}']} |"
            f" {r['sf0.1_us_per_row']} |"
            f" {r[f'sf0.1x{args.factor}_us_per_row']} | {r['ratio']} |"
        )
    if not args.keep:
        shutil.rmtree(os.path.dirname(probe_dir), ignore_errors=True)


if __name__ == "__main__":
    main()
