"""SparkSession factory with scale-appropriate defaults.

The same builder serves local testing (``local[N]``) and a real cluster
(where ``master`` is injected by spark-submit).  Settings chosen for the
100 TB design point:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast demotion) — the single most important knob when the
  same plans must run from sf0.001 to 100 TB.
- UTC session timezone — required for byte-identical timestamp semantics
  against the DuckDB oracle and for sane cross-cluster reproducibility.
- Arrow enabled — fast toPandas and pandas-UDF transport.
- shuffle partitions default to cores locally; on a cluster AQE coalesces
  from ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ex-aws-firehose-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is supplied — on a real deployment spark-submit
    owns the master and this argument stays ``None``.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Deterministic timestamp semantics (oracle parity + reproducibility).
        .config("spark.sql.session.timeZone", "UTC")
        # Adaptive execution: coalesce post-shuffle partitions, split skewed
        # joins, demote to broadcast at runtime. Essential at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalescing keeps its stock floor (minPartitionSize=1m).
        # A 64k floor was A/B'd this round: it parallelized a few
        # compute-dense small-byte stages but multiplied task counts
        # across every tiny stage (q_dedup_minhash_weighted 4.5 → 24 s,
        # trainer preludes ~2×) — the one place manual parallelism
        # pays is the broadcast-join pair stages (tables.spread there
        # only); stock coalescing wins everywhere else; see
        # OPTIMIZATION_r14.md.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas-UDF / toPandas transport.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Broadcast threshold: dims like region/nation/supplier always fit.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Keep partition files readable at local scale; at cluster scale the
        # default 128 MB target is right, so only the local default is set.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # The events table carries TIMESTAMP(NANOS) parquet, which Spark 4
        # rejects by default; read as long and normalize in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.legacy.createHiveTableByDefault", "false")
    )
    # Deployment-specific overrides without code changes: a JSON object of
    # conf key -> value (e.g. cluster advisory partition sizes). Applied
    # after the defaults above, before caller-supplied extra_conf.
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if env_conf:
        for k, v in json.loads(env_conf).items():
            builder = builder.config(k, str(v))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
