"""64x replica scaling probe for the dedup/similarity family
(SCALE.md §15): stage documents+embeddings at 4x/16x/64x, run
q_dedup_minhash / q_dedup_prefix_filter / q_sim_knn_graph at each
scale, and report wall-clock, result pairs, and (for minhash) raw
band-join candidates/sec.

Two replica models matter and answer different questions:

- INDEPENDENT (this probe): replica tokens are suffixed into every
  word and IVF labels are renumbered per replica, so cross-replica
  docs/vectors share no shingles, band signatures, or cells. This
  models "the corpus simply grew" — candidate volume should grow
  LINEARLY with rows, and any super-linear wall-clock growth is an
  engine defect, which is exactly what the probe hunts.
- CORRELATED (SCALE.md §14's 16x sweep): replicas are near-dups of the
  base, so in-bucket pairs grow ~R^2 BY SEMANTICS (the corpus really
  does contain quadratically more near-dup pairs). That cost is the
  declared candidate-set definition, not an engine property.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

from ex_aws_firehose_spark.registry import REGISTRY, load_all_operators
from ex_aws_firehose_spark.tables import load_table

load_all_operators()

SRC = "/root/testdata/sf0.1"
OUT_ROOT = "/tmp/dedup_scale_v3"
SHIFT = 100_000_000
SCALES = [int(s) for s in (sys.argv[1:] or ["4", "16", "64"])]
# Override with SPARK_GRAFT_PROBE_KEYS=k1,k2 to probe other family members.
KEYS = [
    k
    for k in os.environ.get(
        "SPARK_GRAFT_PROBE_KEYS",
        "q_dedup_minhash,q_dedup_prefix_filter,q_sim_knn_graph",
    ).split(",")
    if k
]

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def stage(r: int) -> str:
    out = f"{OUT_ROOT}/{r}x"
    if os.path.exists(f"{out}/_STAGED"):
        return out
    docs = load_table(spark, SRC, "documents")
    embs = load_table(spark, SRC, "embeddings")
    evts = load_table(spark, SRC, "events")
    dparts, eparts, vparts = [], [], []
    for i in range(r):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT))
        if i > 0:
            # suffix EVERY token -> no shared shingles across replicas
            d = d.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", rf"$1r{i}")
            ).withColumn("n_chars", F.length("text"))
        dparts.append(d)
        e = embs.withColumn("vec_id", F.col("vec_id") + F.lit(i * SHIFT))
        if i > 0:
            # renumber IVF cells -> bucket count scales, size stays flat
            e = e.withColumn("label", F.col("label") + F.lit(i * 100_000))
            # rotate components (norm-preserving) -> replicas stop sharing
            # value-derived buckets (RP-LSH planes, grid cells, eps-cells)
            rot = (i % 63) + 1
            e = e.withColumn(
                "embedding",
                F.concat(
                    F.slice(F.col("embedding"), rot + 1, 64 - rot),
                    F.slice(F.col("embedding"), 1, rot),
                ),
            )
        eparts.append(e)
        # events: disjoint users AND disjoint (hour, type) buckets per
        # replica (ts shifted by >20 years), so the co-occurrence pair
        # join can never produce a cross-replica pair — the graph grows
        # as R independent copies, the independence the probe needs.
        v = (
            evts.withColumn("user_id", F.col("user_id") + F.lit(i * SHIFT))
            .withColumn("event_id", F.col("event_id") + F.lit(i * SHIFT))
            .withColumn(
                "ts", F.col("ts") + F.expr(f"INTERVAL {i * 200000} HOURS")
            )
        )
        vparts.append(v)
    dall, eall, vall = dparts[0], eparts[0], vparts[0]
    for p in dparts[1:]:
        dall = dall.unionByName(p)
    for p in eparts[1:]:
        eall = eall.unionByName(p)
    for p in vparts[1:]:
        vall = vall.unionByName(p)
    dall.repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    eall.repartition(32).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )
    vall.repartition(32).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    open(f"{out}/_STAGED", "w").close()
    return out


def run_key(key: str, sf_dir: str) -> tuple[float, int, dict]:
    t0 = time.perf_counter()
    df = REGISTRY[key].fn(spark, sf_dir)
    rows = df.collect() if key.startswith("q_graph_") else None
    n = len(rows) if rows is not None else df.count()
    wall = time.perf_counter() - t0
    detail = {}
    if rows is not None and len(rows) == 1:
        # 1-row graph summaries (triangles: n_wedges etc.) carry the
        # candidate-volume numbers the linearity law is about.
        detail = rows[0].asDict()
    return wall, n, detail


def minhash_candidates(sf_dir: str) -> int:
    from ex_aws_firehose_spark.operators.llm import minhash_bands

    bands = minhash_bands(load_table(spark, sf_dir, "documents")).repartition(
        "band", "bsig"
    )
    a, b = bands.alias("a"), bands.alias("b")
    return a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bsig") == F.col("b.bsig"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).count()


results = []
for r in [1] + SCALES:
    sf_dir = SRC if r == 1 else stage(r)
    row = {"scale": r}
    if "q_dedup_minhash" in KEYS:
        cand_t0 = time.perf_counter()
        row["minhash_candidates"] = minhash_candidates(sf_dir)
        row["minhash_candidate_wall_s"] = round(
            time.perf_counter() - cand_t0, 2
        )
        row["minhash_candidates_per_s"] = round(
            row["minhash_candidates"]
            / max(row["minhash_candidate_wall_s"], 1e-9)
        )
    for key in KEYS:
        wall, n, detail = run_key(key, sf_dir)
        row[f"{key}_wall_s"] = round(wall, 2)
        row[f"{key}_pairs"] = n
        for dk, dv in detail.items():
            row[f"{key}_{dk}"] = dv
    results.append(row)
    print(json.dumps(row), flush=True)

print("\nscale  " + "  ".join(f"{k.split('q_')[-1]:>24s}" for k in KEYS))
base = results[0]
for row in results:
    ratios = "  ".join(
        f"{row[f'{k}_wall_s']:8.1f}s x{row[f'{k}_wall_s'] / max(base[f'{k}_wall_s'], 1e-9):5.1f}"
        for k in KEYS
    )
    print(f"{row['scale']:>4}x  {ratios}")
