"""Measure 1x (sf0.1) vs 4x (/tmp/sf0.4x) wall-clock for representative
operators; report the scaling ratio (4 = perfectly linear)."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

from ex_aws_firehose_spark.registry import REGISTRY, load_all_operators

load_all_operators()
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

KEYS = sys.argv[1:] or [
    "q_tpch_q1",
    "q_tpch_q3",
    "q_sessionize_gap",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_prefix_filter",
    "q_graph_triangles",
    "q_sim_knn_graph",
    "q_assoc_brand_pairs",
    "q_window_ewma",
    "q_embed_top_pc",
    "q_text_boilerplate_lines",
]


def run(key, sf_dir):
    fn = REGISTRY[key].fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()


def timed(key, sf_dir, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        run(key, sf_dir)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


# warm
run("q_tpch_q1", "/root/testdata/sf0.1")
print(f"{'key':28s} {'1x':>7s} {'4x':>7s} {'ratio':>6s}")
for k in KEYS:
    try:
        t1 = timed(k, "/root/testdata/sf0.1")
        t4 = timed(k, "/tmp/sf0.4x")
        print(f"{k:28s} {t1:7.2f} {t4:7.2f} {t4 / t1:6.2f}")
    except Exception as exc:  # noqa: BLE001
        print(f"{k:28s} FAILED: {exc}")
