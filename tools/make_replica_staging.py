"""Stage a 4x replica of sf0.1 under /tmp/sf0.4x: keys shifted per
replica so joins stay consistent and cardinalities scale; document text
perturbed per replica (appended replica token) so cross-replica docs are
near- but not exact duplicates."""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

from ex_aws_firehose_spark.tables import load_table

OUT = "/tmp/sf0.4x"
SRC = "/root/testdata/sf0.1"
R = 4
SHIFT = 100_000_000

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

key_cols = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}

for table, keys in key_cols.items():
    base = load_table(spark, SRC, table)
    if not keys:  # tiny dims: copy as-is
        base.write.mode("overwrite").parquet(f"{OUT}/{table}.parquet")
        continue
    parts = []
    for i in range(R):
        df = base
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.lit(i * SHIFT))
        if table == "documents":
            df = df.withColumn(
                "text",
                F.when(
                    F.lit(i) == 0, F.col("text")
                ).otherwise(F.concat(F.col("text"), F.lit(f" replica{i}"))),
            ).withColumn("n_chars", F.length("text"))
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{OUT}/{table}.parquet")
    print(f"{table}: {out.count()} rows", flush=True)
print("done")
