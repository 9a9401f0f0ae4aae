"""Ingest/egress format surface beyond parquet.

The reference's delivered S3 objects are newline-delimited transformed
JSON messages (delimiter appended per event, lambda/main.py:69;
concatenated without extra delimiters, lambda/main.py:42-44,92). This
module round-trips that wire format natively in Spark: JSON-lines text,
gzip-compressed by the JVM writer (no Python in the loop), read back
with an explicit schema so the scan stays schema-pruned.

At 100 TB: text+gzip is a *non-splittable* format — each .gz object
becomes one task, so object sizing (the reference's 60 s buffer ≈
object granularity) is the parallelism knob; the parquet primary sink
remains the analytics path.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_aws_firehose_spark.registry import query
from ex_aws_firehose_spark.tables import load_table

EVENTS_JSON_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

# Spark's default JSON timestamp pattern truncates to milliseconds;
# the events table carries microseconds — pin the format on both sides.
TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

_JSONL_CACHE: dict[tuple[int, str], str] = {}


def write_events_jsonl_gz(spark: SparkSession, sf_dir: str) -> str:
    """events → gzip'd JSON-lines directory (one object per partition),
    the reference's delivered-object format. Cached per (session, sf)."""
    key = (id(spark), sf_dir)
    if key not in _JSONL_CACHE:
        path = tempfile.mkdtemp(prefix="events_jsonl_") + "/data"
        e = load_table(spark, sf_dir, "events")
        (
            e.select(
                F.to_json(
                    F.struct(*e.columns), {"timestampFormat": TS_FORMAT}
                ).alias("value")
            )
            .write.option("compression", "gzip")
            .text(path)
        )
        _JSONL_CACHE[key] = path
    return _JSONL_CACHE[key]


def read_events_jsonl_gz(spark: SparkSession, path: str) -> DataFrame:
    """Read the wire format back with an explicit schema (no inference
    pass — at scale, schema inference is a full extra read)."""
    return (
        spark.read.schema(EVENTS_JSON_SCHEMA)
        .option("timestampFormat", TS_FORMAT)
        .json(path)
    )


@query(
    "src_format_jsonl_gz",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) AS value_cents,
           MAX(CAST(ts AS TIMESTAMP)) AS max_ts
    FROM events GROUP BY event_type
    """,
    tags=("firehose", "source", "format"),
)
def src_format_jsonl_gz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the delivered-object wire format (gzip JSON-lines):
    write events out, read them back, aggregate — byte-faithful iff the
    aggregate matches the oracle computed on the original table."""
    path = write_events_jsonl_gz(spark, sf_dir)
    e = read_events_jsonl_gz(spark, path)
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_cents"),
        F.max("ts").alias("max_ts"),
    )
