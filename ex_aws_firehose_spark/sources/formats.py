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

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_aws_firehose_spark.caching import SessionCache
from ex_aws_firehose_spark.operators.relational import _cents
from ex_aws_firehose_spark.registry import query
from ex_aws_firehose_spark.tables import load_table

_TMP_DIRS: list[str] = []


def _tracked_mkdtemp(prefix: str) -> str:
    """mkdtemp whose directory is removed at interpreter exit — the
    side-effect caches below otherwise leak one dir per (session, sf)."""
    path = tempfile.mkdtemp(prefix=prefix)
    _TMP_DIRS.append(path)
    return path


@atexit.register
def _cleanup_tmp_dirs() -> None:
    for d in _TMP_DIRS:
        shutil.rmtree(d, ignore_errors=True)


EVENTS_JSON_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

# Spark's default JSON timestamp pattern truncates to milliseconds;
# the events table carries microseconds — pin the format on both sides.
# (load_table normalizes events.ts to tz-aware TimestampType, so the
# tz-offset-carrying pattern applies on both write and read.)
TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

_JSONL_CACHE: SessionCache = SessionCache()


def write_events_jsonl_gz(spark: SparkSession, sf_dir: str) -> str:
    """events → gzip'd JSON-lines directory (one object per partition),
    the reference's delivered-object format. Cached per (session, sf)."""
    key = _JSONL_CACHE.scoped_key(spark, sf_dir)
    if key not in _JSONL_CACHE:
        path = _tracked_mkdtemp(prefix="events_jsonl_") + "/data"
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
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
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


_CSV_CACHE: SessionCache = SessionCache()
_PARTITIONED_CACHE: SessionCache = SessionCache()

ORDERS_CSV_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
)

# o_orderdate is TIMESTAMP_NTZ (tz-naive parquet ms) — the CSV codec
# keys its format off the NTZ option, not timestampFormat.
TS_NTZ_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


@query(
    "src_format_csv",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0
               AS total_price,
           MIN(o_orderdate) AS first_order
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("source", "format"),
)
def src_format_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip: orders written as quoted CSV (header, pinned µs
    timestamp format) and read back schema-first, then aggregated — the
    values must survive the text round-trip bit-exactly. Doubles are
    serialized by Java's shortest-repr (Ryū) and re-parsed to the
    identical bit pattern; tz-naive timestamps carry an explicit
    timestampNTZFormat (µs) so no precision is lost. At 100 TB: CSV is splittable (unlike gzip text)
    but schema-on-read with no pushdown — the scan reads every byte, so
    this format is an ingest boundary only, converted to parquet in the
    first pass."""
    key = _CSV_CACHE.scoped_key(spark, sf_dir)
    if key not in _CSV_CACHE:
        path = _tracked_mkdtemp(prefix="orders_csv_") + "/data"
        (
            load_table(spark, sf_dir, "orders")
            .write.option("header", True)
            .option("timestampNTZFormat", TS_NTZ_FORMAT)
            .csv(path)
        )
        _CSV_CACHE[key] = path
    o = (
        spark.read.schema(ORDERS_CSV_SCHEMA)
        .option("header", True)
        .option("timestampNTZFormat", TS_NTZ_FORMAT)
        .csv(_CSV_CACHE[key])
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        (F.sum(cents) / 100.0).alias("total_price"),
        F.min("o_orderdate").alias("first_order"),
    )


@query(
    "src_partitioned_pruning",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0
               AS total_price
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderstatus
    """,
    tags=("source", "format"),
)
def src_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + partition pruning: orders are
    written partitioned by o_orderpriority (directory per value); the
    priority predicate then prunes whole directories at planning time —
    the scan never opens the other partitions' files (asserted via
    PartitionFilters in tests/test_plans.py). At 100 TB this is the
    first-order I/O lever: partition by the dominant filter column
    (date, tenant), keep per-partition file counts bounded, and let
    pruning turn a full-table scan into a touched-partition scan."""
    key = _PARTITIONED_CACHE.scoped_key(spark, sf_dir)
    if key not in _PARTITIONED_CACHE:
        path = _tracked_mkdtemp(prefix="orders_part_") + "/data"
        (
            load_table(spark, sf_dir, "orders")
            # NOT clustered by the partition column (round 15, measured
            # and left): repartition("o_orderpriority") was A/B'd
            # wall-clock-flat (2.34 vs 2.37 s staged-cold) and 5
            # distinct values would collapse the write to 5 tasks — a
            # skew hazard at scale that the q_join_dpp treatment (83
            # month values) does not have.
            .write.partitionBy("o_orderpriority")
            .parquet(path)
        )
        _PARTITIONED_CACHE[key] = path
    o = spark.read.parquet(_PARTITIONED_CACHE[key])
    pruned = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return pruned.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        (F.sum(cents) / 100.0).alias("total_price"),
    )


_ORC_CACHE: SessionCache = SessionCache()
_EVOLVED_CACHE: SessionCache = SessionCache()
_SINK_PART_CACHE: SessionCache = SessionCache()


@query(
    "src_format_orc",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents,
           MAX(CAST(ts AS TIMESTAMP)) AS max_ts
    FROM events GROUP BY event_type
    """,
    tags=("source", "format"),
)
def src_format_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip: events written as ORC and read back, then
    aggregated — the aggregate matches the oracle computed on the
    original parquet iff the columnar round-trip is value-faithful
    (timestamps at µs, doubles bit-exact). ORC is the second pushdown-
    capable columnar boundary the engine speaks natively (predicate
    pushdown + column pruning work the same as parquet via the
    vectorized reader); at 100 TB it exists for interop with
    Hive-lineage warehouses, not as the preferred sink."""
    key = _ORC_CACHE.scoped_key(spark, sf_dir)
    if key not in _ORC_CACHE:
        path = _tracked_mkdtemp(prefix="events_orc_") + "/data"
        load_table(spark, sf_dir, "events").write.orc(path)
        _ORC_CACHE[key] = path
    e = spark.read.orc(_ORC_CACHE[key])
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "value_cents"
        ),
        F.max("ts").alias("max_ts"),
    )


@query(
    "src_schema_evolution",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(o_comment_len) AS BIGINT) AS n_with_comment,
           CAST(SUM(COALESCE(o_comment_len, 0)) AS BIGINT) AS comment_chars
    FROM (
        SELECT o_orderstatus,
               CASE WHEN o_orderkey % 2 = 1
                    THEN length(o_orderpriority) END AS o_comment_len
        FROM orders
    ) GROUP BY o_orderstatus
    """,
    tags=("source", "format"),
)
def src_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the source: generation 1 files lack a column
    that generation 2 adds (o_comment_len); a mergeSchema read unions
    the file schemas and back-fills NULL for old files — the standard
    additive-evolution contract of a long-lived ingest directory.
    At 100 TB, mergeSchema's footer sampling is an extra planning cost,
    so production pins the merged schema in a catalog and reads
    schema-first; the NULL back-fill semantics are identical."""
    key = _EVOLVED_CACHE.scoped_key(spark, sf_dir)
    if key not in _EVOLVED_CACHE:
        path = _tracked_mkdtemp(prefix="orders_evo_") + "/data"
        o = load_table(spark, sf_dir, "orders")
        # generation 1: even orderkeys, original columns only
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_orderstatus"
        ).write.mode("append").parquet(path)
        # generation 2: odd orderkeys ship an additional column
        o.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey",
            "o_orderstatus",
            F.length("o_orderpriority").alias("o_comment_len"),
        ).write.mode("append").parquet(path)
        _EVOLVED_CACHE[key] = path
    merged = spark.read.option("mergeSchema", True).parquet(
        _EVOLVED_CACHE[key]
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.count("o_comment_len").alias("n_with_comment"),
        F.sum(F.coalesce("o_comment_len", F.lit(0)))
        .cast("long")
        .alias("comment_chars"),
    )


@query(
    "sink_partitioned_write",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN event_type = 'click'
                         THEN CAST(ROUND(value * 200) AS BIGINT)
                         ELSE CAST(ROUND(value * 100) AS BIGINT) END)
                AS BIGINT) AS value_cents
    FROM events GROUP BY event_type
    """,
    tags=("sink", "format"),
)
def sink_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned sink with dynamic partition overwrite: the full
    event stream lands partitioned by event_type, then one partition
    ('click') is reprocessed (values doubled) and overwritten IN PLACE —
    dynamic mode replaces only the partitions present in the incoming
    frame, leaving the others' files untouched. This is the idempotent
    reprocess/backfill primitive of a partitioned lake at 100 TB:
    rewrite one day/tenant without rewriting the table.

    The read-back aggregate proves both halves: 'click' shows doubled
    cents, every other partition shows the original bytes."""
    key = _SINK_PART_CACHE.scoped_key(spark, sf_dir)
    if key not in _SINK_PART_CACHE:
        path = _tracked_mkdtemp(prefix="events_sink_") + "/data"
        e = load_table(spark, sf_dir, "events")
        # NOT clustered by event_type before the write (round 15,
        # measured and left): A/B'd flat (1.89 vs 2.04 s staged-cold)
        # and ~10 distinct types would collapse the write to 10 tasks.
        e.write.partitionBy("event_type").parquet(path)
        reprocessed = e.filter(F.col("event_type") == "click").withColumn(
            "value", F.col("value") * 2
        )
        (
            reprocessed.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("event_type")
            .parquet(path)
        )
        _SINK_PART_CACHE[key] = path
    back = spark.read.parquet(_SINK_PART_CACHE[key])
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "value_cents"
        ),
    )


_BINARYFILE_CACHE: SessionCache = SessionCache()
N_BINARY_FILES = 100


@query(
    "src_format_binaryfile",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha
    FROM documents WHERE doc_id < {N_BINARY_FILES}
    """,
    tags=("source", "format", "multimodal"),
)
def src_format_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-blob ingest boundary: one file per media object on disk,
    read with Spark's binaryFile source (path, length, content BINARY),
    identity recovered from the filename and content checksummed — the
    first stage of every image/audio corpus before blobs are packed
    into parquet. The oracle recomputes length+sha from the text the
    blobs were written from, so the round-trip is proven byte-faithful.
    At 100 TB the per-file pattern is the INGEST shape only (listing
    cost scales with file count); the first pass repacks blobs into
    few-GB parquet files with the binary column + metadata, which every
    q_multimodal_* key then operates on."""
    import os

    key = _BINARYFILE_CACHE.scoped_key(spark, sf_dir)
    if key not in _BINARYFILE_CACHE:
        root = _tracked_mkdtemp(prefix="blobs_") + "/data"
        os.makedirs(root, exist_ok=True)
        rows = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < N_BINARY_FILES)
            .select("doc_id", "text")
            .collect()
        )
        for r in rows:
            with open(os.path.join(root, f"{r['doc_id']:08d}.bin"), "wb") as f:
                f.write(r["text"].encode("utf-8"))
        _BINARYFILE_CACHE[key] = root
    blobs = spark.read.format("binaryFile").load(_BINARYFILE_CACHE[key])
    return blobs.select(
        F.regexp_extract(
            F.col("path"), r"(\d{8})\.bin$", 1
        ).cast("long").alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.sha2("content", 256).alias("content_sha"),
    )


_XML_CACHE: SessionCache = SessionCache()


@query(
    "src_format_xml",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
           CAST(ROUND(value * 100) AS BIGINT) AS value_cents
    FROM events WHERE event_id < 200
    """,
    tags=("source", "format"),
)
def src_format_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingest boundary (Spark 4 built-in spark-xml): write an
    events slice as <event> rows under a root tag, read back
    schema-first with rowTag — the interchange format B2B/feed
    pipelines still deliver. Value survives as exact integer cents so
    the float never round-trips through decimal text.

    At 100 TB: like CSV, XML is schema-on-read with NO pushdown,
    row-group stats, or column pruning — every byte is parsed. It is
    an ingest boundary only; first pass converts to parquet. rowTag
    splitting is line-agnostic, so files stay splittable for parallel
    parse."""
    key = _XML_CACHE.scoped_key(spark, sf_dir)
    if key not in _XML_CACHE:
        path = _tracked_mkdtemp(prefix="events_xml_") + "/data"
        (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_id") < 200)
            .select(
                "event_id",
                "event_type",
                _cents("value").alias("value_cents"),
            )
            .write.option("rowTag", "event")
            .format("xml")
            .save(path)
        )
        _XML_CACHE[key] = path
    return (
        spark.read.format("xml")
        .option("rowTag", "event")
        .schema("event_id long, event_type string, value_cents long")
        .load(_XML_CACHE[key])
    )


_COMPACT_CACHE: SessionCache = SessionCache()
COMPACT_FRAGMENTS = 64
COMPACT_TARGET_FILES = 4


@query(
    "q_maintenance_compact",
    oracle=f"""
    -- LEAST(..., COUNT(*)): round-robin repartition(n) writes one file
    -- per NON-EMPTY partition, so a table smaller than the fragment
    -- count yields row_count files, not n — mirror the real listing.
    SELECT CAST(LEAST({COMPACT_FRAGMENTS}, COUNT(*)) AS BIGINT) AS files_before,
           CAST(LEAST({COMPACT_TARGET_FILES}, COUNT(*)) AS BIGINT) AS files_after,
           CAST(COUNT(*) AS BIGINT) AS rows_before,
           CAST(COUNT(*) AS BIGINT) AS rows_after,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS checksum_cents
    FROM orders
    """,
    tags=("maintenance", "sink"),
)
def q_maintenance_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction (OPTIMIZE-style lake maintenance): a
    deliberately fragmented orders landing dir (64 files — the shape a
    per-minute streaming sink leaves behind) is rewritten into 4
    size-targeted files. The audit row proves the rewrite is lossless:
    file counts from the real filesystem listing, row count and an
    exact int64 money checksum compared before/after.

    At 100 TB this is THE table-maintenance primitive: listing/open
    cost scales with file count, parquet row-group stats only help at
    ≥ ~100 MB files, and compaction is an embarrassingly parallel
    rewrite (repartition by target count or maxRecordsPerFile —
    never coalesce(1)). Run it continuously behind streaming sinks;
    pair with partition-grain dynamic overwrite (sink_partitioned_
    write) for idempotence."""
    import os

    def _count_parquet(path: str) -> int:
        return sum(
            1
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith(".")
        )

    key = _COMPACT_CACHE.scoped_key(spark, sf_dir)
    if key not in _COMPACT_CACHE:
        frag = _tracked_mkdtemp(prefix="orders_frag_") + "/data"
        o = load_table(spark, sf_dir, "orders")
        o.repartition(COMPACT_FRAGMENTS).write.parquet(frag)
        compacted = _tracked_mkdtemp(prefix="orders_compact_") + "/data"
        spark.read.parquet(frag).repartition(
            COMPACT_TARGET_FILES
        ).write.parquet(compacted)
        _COMPACT_CACHE[key] = (
            frag,
            _count_parquet(frag),
            compacted,
            _count_parquet(compacted),
        )
    frag, n_before, compacted, n_after = _COMPACT_CACHE[key]
    before = spark.read.parquet(frag).agg(
        F.count("*").alias("rows_before"),
        F.sum(_cents("o_totalprice")).alias("cents_before"),
    )
    after = spark.read.parquet(compacted).agg(
        F.count("*").alias("rows_after"),
        F.sum(_cents("o_totalprice")).alias("checksum_cents"),
    )
    return before.crossJoin(after).select(
        F.lit(n_before).cast("long").alias("files_before"),
        F.lit(n_after).cast("long").alias("files_after"),
        "rows_before",
        "rows_after",
        "checksum_cents",
    )


_TEXT_CACHE: SessionCache = SessionCache()
_FIXEDW_CACHE: SessionCache = SessionCache()

# Fixed-width column layout (byte offsets, 1-based): the mainframe/
# COBOL copybook shape. Widths chosen to hold the extreme values of
# each field with room (epoch micros ≤ 20 digits, cents ≤ 14).
_FW_TS, _FW_TYPE, _FW_USER, _FW_ID, _FW_CENTS = 20, 10, 12, 12, 14


@query(
    "src_format_fixed_width",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents,
           CAST(SUM(user_id) AS BIGINT) AS sum_users
    FROM events GROUP BY event_type
    """,
    tags=("source", "format"),
)
def src_format_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-WIDTH text ingestion (mainframe / COBOL-copybook extract
    shape — still how bank and telco batch feeds arrive): events
    serialized as space-padded fixed-offset lines, read back with
    ``spark.read.text`` and sliced by byte position (substring + trim
    + cast — no delimiter scan at all), then aggregated.  The
    round-trip is value-exact because every numeric field travels as
    an integer (epoch micros, cents).

    100 TB shape: fixed-width is the BEST-splitting text format —
    every record is exactly the same byte length, so split boundaries
    never tear a record and the parse is pure positional substring in
    whole-stage codegen (cheaper than CSV's quote/escape state
    machine).  Like all ingest-boundary formats: first pass converts
    to parquet; no pushdown exists in a text scan."""
    key = _FIXEDW_CACHE.scoped_key(spark, sf_dir)
    if key not in _FIXEDW_CACHE:
        path = _tracked_mkdtemp(prefix="events_fixedw_") + "/data"
        pad = lambda c, w: F.lpad(c.cast("string"), w, " ")  # noqa: E731
        (
            load_table(spark, sf_dir, "events")
            .select(
                F.concat(
                    pad(F.unix_micros("ts"), _FW_TS),
                    F.rpad(F.col("event_type"), _FW_TYPE, " "),
                    pad(F.col("user_id"), _FW_USER),
                    pad(F.col("event_id"), _FW_ID),
                    pad(
                        F.round(F.col("value") * 100, 0).cast("long"),
                        _FW_CENTS,
                    ),
                ).alias("value")
            )
            .write.text(path)
        )
        _FIXEDW_CACHE[key] = path
    lines = spark.read.text(_FIXEDW_CACHE[key])
    o_type = _FW_TS + 1
    o_user = o_type + _FW_TYPE
    o_cents = o_user + _FW_USER + _FW_ID
    parsed = lines.select(
        F.trim(F.substring("value", o_type, _FW_TYPE)).alias("event_type"),
        F.trim(F.substring("value", o_user, _FW_USER))
        .cast("long")
        .alias("user_id"),
        F.trim(F.substring("value", o_cents, _FW_CENTS))
        .cast("long")
        .alias("cents"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("value_cents"),
        F.sum("user_id").alias("sum_users"),
    )


@query(
    "src_format_text",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents,
           MAX(CAST(ts AS TIMESTAMP)) AS max_ts
    FROM events GROUP BY event_type
    """,
    tags=("source", "format"),
)
def src_format_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw line-delimited TEXT ingestion (syslog/app-log shape): events
    serialized as key=value log lines, read back with ``spark.read.text``
    and parsed by regexp into typed columns, then aggregated — the
    round-trip must be value-exact, which is why the line carries epoch
    MICROS and integer cents (text floats would re-parse inexactly).

    100 TB shape: uncompressed text is splittable, so the parse is an
    embarrassingly parallel map (regexp_extract stays in whole-stage
    codegen — never a Python UDF); there is no pushdown or pruning in a
    text scan, so like CSV this is an ingest boundary format — first
    pass converts to parquet. Malformed lines regexp-extract to '' and
    cast to NULL rather than failing the job (the permissive-mode
    contract a log-ingest path needs)."""
    key = _TEXT_CACHE.scoped_key(spark, sf_dir)
    if key not in _TEXT_CACHE:
        path = _tracked_mkdtemp(prefix="events_text_") + "/data"
        (
            load_table(spark, sf_dir, "events")
            .select(
                F.concat_ws(
                    " ",
                    F.concat(F.lit("ts_us="), F.unix_micros("ts")),
                    F.concat(F.lit("type="), F.col("event_type")),
                    F.concat(F.lit("user="), F.col("user_id")),
                    F.concat(F.lit("id="), F.col("event_id")),
                    F.concat(
                        F.lit("cents="),
                        F.round(F.col("value") * 100, 0).cast("long"),
                    ),
                ).alias("value")
            )
            .write.text(path)
        )
        _TEXT_CACHE[key] = path
    lines = spark.read.text(_TEXT_CACHE[key])
    ex = lambda pat: F.regexp_extract("value", pat, 1)  # noqa: E731
    parsed = lines.select(
        F.timestamp_micros(
            ex(r"ts_us=(-?\d+)").cast("long")
        ).alias("ts"),
        ex(r"type=(\w+)").alias("event_type"),
        ex(r"cents=(-?\d+)").cast("long").alias("cents"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("value_cents"),
        F.max("ts").alias("max_ts"),
    )


# ---------------------------------------------------------------------------
# Spark 4 Python DataSource API (custom connector surface)
# ---------------------------------------------------------------------------

PYDS_PARTITIONS = 4
PYDS_ROWS_PER_PART = 1000
_PYDS_LEVELS = ("debug", "info", "warn", "error")


@query(
    "src_python_datasource",
    oracle=f"""
    WITH g AS (
        SELECT CAST(range AS BIGINT) AS id
        FROM range(0, {PYDS_PARTITIONS * PYDS_ROWS_PER_PART})
    )
    SELECT (['debug', 'info', 'warn', 'error'])[CAST(id % 4 AS INTEGER) + 1]
               AS level,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(id * 37 % 10000) AS BIGINT) AS cents,
           CAST(MAX(id) AS BIGINT) AS max_id
    FROM g GROUP BY 1
    """,
    tags=("source", "format", "python"),
)
def src_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector via the Spark 4 PYTHON DATASOURCE API
    (``spark.dataSource.register``): a deterministic synthetic
    log-record source exposing ``partitions()`` (4 input splits → 4
    parallel tasks) and a per-partition ``read()`` generator — the
    extension point for ingest boundaries with no JVM connector (REST
    APIs, vendor SDKs, bespoke queues). Rows are pure arithmetic in the
    record id, so the DuckDB oracle regenerates the identical stream
    from range().

    100 TB shape: a Python data source is the SLOW path (rows cross the
    Python→JVM boundary at read; no pushdown, no pruning) — correct for
    control-plane-scale feeds; bulk data belongs in parquet/ORC the
    moment it lands. Parallelism comes solely from partitions(), so a
    real connector must split by shard/offset range — the generator
    here models exactly that contract."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    rows_per_part = PYDS_ROWS_PER_PART

    class _SynthReader(DataSourceReader):
        def partitions(self):
            return [InputPartition(i) for i in range(PYDS_PARTITIONS)]

        def read(self, partition):
            base = partition.value * rows_per_part
            for i in range(rows_per_part):
                rid = base + i
                yield (rid, _PYDS_LEVELS[rid % 4], (rid * 37) % 10000)

    class SynthLogSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synth_log"

        def schema(self) -> str:
            return "id long, level string, cents long"

        def reader(self, schema):
            return _SynthReader()

    spark.dataSource.register(SynthLogSource)
    df = spark.read.format("synth_log").load()
    return df.groupBy("level").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("cents"),
        F.max("id").alias("max_id"),
    )


_DPP_CACHE: SessionCache = SessionCache()


@query(
    "q_join_dpp",
    oracle="""
    WITH dim AS (
        SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ship_month
        FROM orders WHERE year(o_orderdate) = 1996
    )
    SELECT l.ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
                 l_extendedprice
          FROM lineitem) l
    JOIN dim USING (ship_month)
    GROUP BY l.ship_month
    """,
    tags=("source", "join", "scale"),
)
def q_join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: lineitem is laid out partitioned by
    ship month (the dominant time filter), then joined to a month
    "dimension" whose filter (order year = 1996 — mid-range of the
    fixture's 1995–2001 calendar; 1994 predates it and matched NOTHING,
    trivially validating the empty set) is only knowable at
    runtime through the join — Spark plants a dynamicpruning subquery
    on the fact scan (plan-gated in tests/test_plans.py), so only the
    ~12 matching month directories are ever opened, even though no
    static predicate mentions them.

    100 TB shape: DPP is THE mechanism that makes star-schema joins
    partition-aware — static pruning (src_partitioned_pruning) handles
    literal predicates, DPP handles predicates that arrive via a dim
    filter; together they turn a full fact scan into a touched-
    partition scan. The dim subquery reuses the join's own broadcast
    (no extra fact-side work), and the layout write is the same
    one-time repartitionByRange investment as q_layout_zorder."""
    key = _DPP_CACHE.scoped_key(spark, sf_dir)
    if key not in _DPP_CACHE:
        path = _tracked_mkdtemp(prefix="lineitem_bymonth_") + "/data"
        (
            load_table(spark, sf_dir, "lineitem")
            .withColumn(
                "ship_month", F.date_format("l_shipdate", "yyyy-MM")
            )
            # Round 15 (guide §6 — output file sizing): cluster by the
            # partition column before the partitioned write. Without
            # it every input task writes one file into EVERY month dir
            # (tasks × ~84 months tiny files); with it each month is
            # one file — fewer files to create at write time and fewer
            # to open on the DPP-pruned read. Same rows, same result.
            .repartition("ship_month")
            .write.partitionBy("ship_month")
            .parquet(path)
        )
        _DPP_CACHE[key] = path
    fact = spark.read.parquet(_DPP_CACHE[key])
    dim = (
        load_table(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1996)
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("ship_month"))
        .distinct()
    )
    return (
        fact.join(dim, "ship_month")
        .groupBy("ship_month")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            ).alias("revenue_cents"),
        )
    )


_MULTILINE_CACHE: SessionCache = SessionCache()


@query(
    "src_format_json_multiline",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY event_type
    """,
    tags=("source", "format"),
)
def src_format_json_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTILINE JSON ingest — the API-export format (one top-level
    JSON ARRAY per file, pretty or compact, records spanning lines)
    as opposed to line-delimited JSONL: files are staged as 8
    array-of-objects documents, read back with ``multiLine=true`` and
    an explicit schema, and the values must survive the round-trip
    exactly (µs timestamps via the shared offset-carrying format).

    The 100 TB caveat IS the point of the key: a multiline JSON file
    is NOT splittable — one task per file regardless of size (unlike
    JSONL, where line boundaries split) — so this format is an ingest
    boundary only; the first pass converts to parquet, and upstream
    producers should cap file sizes. Schema-first read skips the
    inference pass (a full extra scan at scale)."""
    key = _MULTILINE_CACHE.scoped_key(spark, sf_dir)
    if key not in _MULTILINE_CACHE:
        path = _tracked_mkdtemp(prefix="events_mljson_") + "/data"
        e = load_table(spark, sf_dir, "events")
        (
            e.groupBy((F.col("user_id") % 8).alias("pid"))
            .agg(
                F.to_json(
                    F.collect_list(F.struct(*e.columns)),
                    {"timestampFormat": TS_FORMAT},
                ).alias("value")
            )
            # one array per FILE: multiLine=true parses a whole file as
            # ONE JSON document, so co-located arrays would be dropped
            .write.partitionBy("pid")
            .text(path)
        )
        _MULTILINE_CACHE[key] = path
    ev = (
        spark.read.schema(EVENTS_JSON_SCHEMA)
        .option("multiLine", True)
        .option("timestampFormat", TS_FORMAT)
        .json(_MULTILINE_CACHE[key])
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
    )


# ---------------------------------------------------------------------------
# Avro object-container ingest (pure-Python OCF reader behind the
# Python DataSource API — no spark-avro jar in this environment)
# ---------------------------------------------------------------------------

_AVRO_CACHE: SessionCache = SessionCache()
AVRO_SHARDS = 4

_AVRO_EVENT_SCHEMA = {
    "type": "record",
    "name": "event",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "ts_us", "type": "long"},
        {"name": "event_type", "type": "string"},
        {"name": "user_id", "type": "long"},
        {"name": "value_cents", "type": "long"},
    ],
}


@query(
    "src_format_avro",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
           user_id, CAST(ROUND(value * 100) AS BIGINT) AS value_cents
    FROM events
    """,
    tags=("source", "format", "python"),
)
def src_format_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro ingest boundary: the events table staged as AVRO_SHARDS
    deflate-codec object container files (pure-Python writer,
    sources/avro.py — Avro 1.11 spec wire format), read back through
    the ``avro_ocf`` PYTHON DATASOURCE whose schema() derives the
    Spark schema from the container's embedded writer schema
    (schema-on-read: the file is self-describing), SYNC-MARKER
    BYTE-RANGE SPLITS (``split_size`` 64 KiB here so the fixture
    exercises multi-split files; default 128 MiB), Arrow RecordBatch
    emission per block. The FULL row set round-trips and hash-checks
    against the parquet original — µs-timestamp exactness carried
    through the Avro layer as an epoch-µs long (timestamp-micros
    logical-type semantics) and restored to TimestampType on read,
    the src_format_csv exactness bar.

    100 TB shape: the driver plans ``size/split_size`` byte-range
    tasks per file from getsize() alone; each task seeks, aligns to
    the next 16-byte sync marker, and reads the blocks that START in
    its range — exactly-once coverage with zero coordination (the
    Hadoop FileSplit contract the Avro sync marker was designed for).
    A few giant container files parallelize across the whole cluster;
    rows cross the Python boundary once, as Arrow columns, at the
    ingest edge and should land in parquet in the same hop."""
    import os

    from ex_aws_firehose_spark.sources.avro import (
        register_avro_datasource,
        write_avro_ocf,
    )

    key = _AVRO_CACHE.scoped_key(spark, sf_dir)
    if key not in _AVRO_CACHE:
        import pandas as pd

        root = _tracked_mkdtemp(prefix="events_avro_") + "/data"
        os.makedirs(root, exist_ok=True)
        # Staging runs DISTRIBUTED (one task per shard via a grouped
        # pandas stage) instead of fetchall()-ing every event row to
        # the driver and encoding serially there — same bytes (same
        # rows, same event_id order, same encoder), but the Python
        # encode parallelizes per shard and the driver never holds the
        # table (guide §5). Executors share the local FS here; at scale
        # the shard writer lands on shared storage the same way.
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
            (F.col("event_id") % AVRO_SHARDS).alias("shard"),
        )

        def _write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0])
            pdf = pdf.sort_values("event_id")
            # .tolist() yields plain Python ints — the varint encoder's
            # shift arithmetic must not run on numpy fixed-width types.
            rows = list(
                zip(
                    pdf["event_id"].tolist(),
                    pdf["ts_us"].tolist(),
                    pdf["event_type"].tolist(),
                    pdf["user_id"].tolist(),
                    pdf["value_cents"].tolist(),
                )
            )
            write_avro_ocf(
                os.path.join(root, f"part-{shard}.avro"),
                _AVRO_EVENT_SCHEMA,
                rows,
            )
            return pd.DataFrame({"shard": [shard], "n": [len(rows)]})

        ev.groupBy("shard").applyInPandas(
            _write_shard, "shard long, n long"
        ).collect()
        _AVRO_CACHE[key] = root
    register_avro_datasource(spark)
    return spark.read.format("avro_ocf").option(
        "split_size", 65536
    ).load(_AVRO_CACHE[key]).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "event_type",
        "user_id",
        "value_cents",
    )


_ORPHAN_CACHE: SessionCache = SessionCache()


@query(
    "q_maintenance_orphan_audit",
    oracle="""
    WITH g AS (
        SELECT o_orderkey % 10 AS grp,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    )
    SELECT CASE WHEN grp % 3 = 0 THEN 'orphan' ELSE 'committed' END
               AS status,
           CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_files,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents_total
    FROM g GROUP BY 1
    """,
    tags=("source", "maintenance"),
)
def q_maintenance_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-file audit (Iceberg remove_orphan_files / Delta VACUUM's
    discovery phase, from first principles): the staged table holds one
    parquet file per key-group directory, but the committed MANIFEST
    references only groups with grp % 3 ≠ 0 — the others model crashed
    writers that put files on storage without ever committing them.
    The audit is a real file-level reconciliation: list the physical
    files with the binaryFile source (names only, content never read),
    anti-classify against the manifest, and report per status the file
    count, row count, and reclaimable payload (cents as byte proxy).
    Orphans are the files a naive `delete everything unreferenced`
    would reclaim — and the reason every table format tells you to
    never run that concurrently with an in-flight commit.

    100 TB shape: discovery is listing ⋈ manifest — pure metadata
    (file-count grain, millions of rows not billions; the binaryFile
    scan reads paths, not bytes). Only the reclaim REPORT touches
    payload, one scan + broadcast status join on the partition key.
    The staged layout pins one file per group (repartition by the
    partition key before partitionBy), so counts are deterministic."""
    key = _ORPHAN_CACHE.scoped_key(spark, sf_dir)
    if key not in _ORPHAN_CACHE:
        root = _tracked_mkdtemp(prefix="orphan_tbl_") + "/data"
        (
            load_table(spark, sf_dir, "orders")
            .select(
                (F.col("o_orderkey") % 10).alias("grp"),
                F.round(F.col("o_totalprice") * 100, 0)
                .cast("long")
                .alias("cents"),
            )
            .repartition("grp")
            .write.partitionBy("grp")
            .parquet(root)
        )
        _ORPHAN_CACHE[key] = root
    root = _ORPHAN_CACHE[key]
    listing = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(F.col("path"))
        .withColumn(
            "grp",
            F.regexp_extract("path", r"grp=(\d+)", 1).cast("long"),
        )
    )
    manifest = spark.range(0, 10).select(
        F.col("id").alias("grp")
    ).filter(F.col("grp") % 3 != 0)
    classified = listing.join(
        F.broadcast(manifest.withColumn("committed", F.lit(1))),
        "grp",
        "left",
    ).select(
        "grp",
        F.when(F.col("committed").isNotNull(), F.lit("committed"))
        .otherwise(F.lit("orphan"))
        .alias("status"),
    )
    files_per_status = classified.groupBy("status", "grp").agg(
        F.count("*").alias("n_files_in_grp")
    )
    rows = spark.read.parquet(root).select("grp", "cents")
    return (
        rows.join(
            F.broadcast(files_per_status.select("grp", "status")), "grp"
        )
        .groupBy("status")
        .agg(
            F.countDistinct("grp").alias("n_files"),
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("cents_total"),
        )
    )


# ---------------------------------------------------------------------------
# Manifest-pruned read (Iceberg/Delta file skipping from first principles)
# ---------------------------------------------------------------------------

_MANIFEST_CACHE: SessionCache = SessionCache()
_MP_LO, _MP_HI = "1997-01-01 00:00:00", "1997-04-01 00:00:00"


def _stage_manifest_table(spark: SparkSession, sf_dir: str):
    """Stage orders clustered one-file-per-month + a stats manifest.

    The manifest is built from the REAL parquet footers (pyarrow
    row-group statistics — min/max/row-count read without touching a
    single data page), exactly what an Iceberg manifest file carries
    per data file. Driver-side loop is file-count grain (≈80 files),
    the same planning cost Iceberg pays on its coordinator."""
    key = _MANIFEST_CACHE.scoped_key(spark, sf_dir)
    cached = _MANIFEST_CACHE.get(key)
    if cached is not None:
        return cached
    import os

    import pyarrow.parquet as pq

    root = _tracked_mkdtemp(prefix="orders_manifest_") + "/data"
    (
        load_table(spark, sf_dir, "orders")
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_orderdate",
            "o_orderkey",
            "o_custkey",
            _cents("o_totalprice").alias("cents"),
        )
        .repartition("month")  # one file per month dir (orphan-audit pin)
        .write.partitionBy("month")
        .parquet(root)
    )
    manifest = []
    for d in sorted(os.listdir(root)):
        if not d.startswith("month="):
            continue
        for fn in os.listdir(os.path.join(root, d)):
            if not fn.endswith(".parquet") or fn.startswith("."):
                continue
            fpath = os.path.join(root, d, fn)
            md = pq.ParquetFile(fpath).metadata
            schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
            ci = schema_names.index("o_orderdate")
            mins, maxs, nrows = [], [], 0
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                mins.append(st.min)
                maxs.append(st.max)
                nrows += md.row_group(rg).num_rows
            manifest.append(
                (fpath, min(mins).isoformat(sep=" "),
                 max(maxs).isoformat(sep=" "), nrows)
            )
    mdir = _tracked_mkdtemp(prefix="orders_manifest_meta_")
    os.makedirs(mdir + "/manifest", exist_ok=True)
    # the manifest is driver-side METADATA — write it with pyarrow
    # directly (a createDataFrame-backed write pays a ~5 s/job
    # Python-runner tax in local mode; a real catalog writes its
    # manifest files the same way, outside the query engine)
    import pyarrow as pa

    pq.write_table(
        pa.table(
            {
                "path": pa.array([m[0] for m in manifest], pa.string()),
                "min_date": pa.array([m[1] for m in manifest], pa.string()),
                "max_date": pa.array([m[2] for m in manifest], pa.string()),
                "n_rows": pa.array([m[3] for m in manifest], pa.int64()),
            }
        ),
        mdir + "/manifest/part-0.parquet",
    )
    _MANIFEST_CACHE[key] = (root, mdir + "/manifest", len(manifest))
    return _MANIFEST_CACHE[key]


def manifest_pruned_paths(
    spark: SparkSession, manifest_path: str, lo: str, hi: str
) -> list[str]:
    """Plan a manifest-pruned scan: keep files whose [min,max] stats
    overlap [lo, hi) — the parquet-footer interval test Iceberg/Delta
    run per data file. Returns the surviving file paths (file-count
    grain — the one sanctioned driver-side collect in this read path,
    identical to Iceberg's coordinator planning)."""
    m = spark.read.parquet(manifest_path)
    survivors = m.filter(
        ~(
            (F.col("max_date") < F.lit(lo))
            | (F.col("min_date") >= F.lit(hi))
        )
    )
    return [r.path for r in survivors.select("path").collect()]


@query(
    "q_read_manifest_pruned",
    oracle=f"""
    WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents_total
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS files_total FROM m),
    sc AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS files_scanned FROM m
        WHERE month >= TIMESTAMP '{_MP_LO}' AND month < TIMESTAMP '{_MP_HI}'
    )
    SELECT CAST(strftime(month, '%Y-%m') AS VARCHAR) AS month,
           n_rows, cents_total, files_scanned, files_total
    FROM m, tot, sc
    WHERE month >= TIMESTAMP '{_MP_LO}' AND month < TIMESTAMP '{_MP_HI}'
    """,
    tags=("source", "maintenance", "manifest"),
)
def q_read_manifest_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-pruned read — Iceberg/Delta FILE SKIPPING from first
    principles (VERDICT r7 ask #2, promoting q_layout_zonemap_audit
    from audit to an actual pruned read path). Orders staged clustered
    one-file-per-month; a manifest parquet carries per-file
    min/max(o_orderdate) + row counts harvested from the REAL parquet
    footers (pyarrow row-group statistics — zero data pages read).
    The read plans against the MANIFEST ONLY: the [min,max]-overlap
    interval test keeps 3 of ~80 files for the Q1-1997 predicate, and
    spark.read.parquet() is handed just those paths — the other
    files are never listed, opened, or scanned (inputFiles()-gated in
    tests/test_plans.py). The residual row predicate still applies
    after the scan, so pruning is an optimization, never a semantics
    change. files_scanned/files_total proof columns ride along, and
    the oracle computes the same aggregate + expected file counts from
    the UNPRUNED table — hash-equality proves the pruned scan lost
    nothing.

    100 TB shape: planning cost is manifest-size (file-count) grain,
    not data grain; the scan does 3/80ths of the I/O. This is the
    entire value proposition of table formats, reproduced with plain
    parquet + one metadata file."""
    root, manifest_path, files_total = _stage_manifest_table(spark, sf_dir)
    paths = manifest_pruned_paths(spark, manifest_path, _MP_LO, _MP_HI)
    pruned = spark.read.parquet(*paths) if paths else spark.createDataFrame(
        [], "o_orderdate timestamp, cents long"
    )
    return (
        pruned.filter(
            (F.col("o_orderdate") >= F.lit(_MP_LO).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_MP_HI).cast("timestamp"))
        )
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("cents_total"),
        )
        .select(
            "month",
            "n_rows",
            "cents_total",
            F.lit(len(paths)).cast("long").alias("files_scanned"),
            F.lit(files_total).cast("long").alias("files_total"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter file skipping (the point-lookup complement to min/max)
# ---------------------------------------------------------------------------

BLOOM_BITS = 32768
BLOOM_K = 3
BLOOM_PROBE_CUSTKEY = 42

_BLOOM_CACHE: SessionCache = SessionCache()


def _bloom_positions_col(custkey) -> "F.Column":
    """BLOOM_K md5-derived bit positions for a customer key — the
    hex_hash parity primitive, salted per hash function."""
    from ex_aws_firehose_spark.functions.text import hex_hash

    return F.array(
        *[
            hex_hash(F.concat(F.lit(f"b{i}:"), custkey.cast("string")))
            % BLOOM_BITS
            for i in range(BLOOM_K)
        ]
    )


def _bloom_positions_sql(expr: str) -> list[str]:
    from ex_aws_firehose_spark.functions.text import duck_hex_hash

    out = []
    for i in range(BLOOM_K):
        salted = f"'b{i}:' || CAST({expr} AS VARCHAR)"
        out.append(f"{duck_hex_hash(salted)} % {BLOOM_BITS}")
    return out


def _bloom_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file bloom 'manifest': the DISTINCT (month, bit position)
    set of every file's o_custkey values — built in ONE scan at
    staging time and cached per (session, sf), exactly when Iceberg
    writes its bloom/value-set metadata. Kept as a position set here;
    a production manifest packs the positions into BLOOM_BITS/64 int64
    words per file — the membership DECISION below is identical."""
    key = _BLOOM_CACHE.scoped_key(spark, sf_dir)
    cached = _BLOOM_CACHE.get(key)
    if cached is not None:
        return cached
    root, _manifest, _n = _stage_manifest_table(spark, sf_dir)
    bloom = (
        spark.read.parquet(root)
        .select(
            F.col("month").cast("string").alias("month"),
            F.explode(_bloom_positions_col(F.col("o_custkey"))).alias("pos"),
        )
        .distinct()
        .localCheckpoint()
    )
    _BLOOM_CACHE[key] = bloom
    return bloom


@query(
    "q_read_bloom_pruned",
    oracle=f"""
    WITH bpos AS (
        SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS month, pos
        FROM orders, UNNEST([{", ".join(_bloom_positions_sql("o_custkey"))}])
            AS t(pos)
    ),
    probe AS (
        SELECT DISTINCT pos
        FROM UNNEST([{", ".join(_bloom_positions_sql(str(BLOOM_PROBE_CUSTKEY)))}])
            AS t(pos)
    ),
    passing AS (
        SELECT b.month
        FROM bpos b JOIN probe p USING (pos)
        GROUP BY b.month
        HAVING COUNT(DISTINCT b.pos) = (SELECT COUNT(*) FROM probe)
    ),
    tot AS (
        SELECT CAST(COUNT(DISTINCT strftime(o_orderdate, '%Y-%m')) AS BIGINT)
            AS files_total
        FROM orders
    ),
    sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS files_scanned FROM passing)
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents_total,
           files_scanned, files_total
    FROM orders, tot, sc
    WHERE o_custkey = {BLOOM_PROBE_CUSTKEY}
    GROUP BY 1, files_scanned, files_total
    """,
    tags=("source", "maintenance", "manifest"),
)
def q_read_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter FILE SKIPPING — the point-lookup complement to
    q_read_manifest_pruned's min/max interval test. An o_custkey point
    predicate prunes NOTHING under zone maps (custkey is uncorrelated
    with the month layout, every file's [min,max] straddles any probe
    — exactly what q_layout_zonemap_audit measures), but a per-file
    bloom on the column skips every file whose BLOOM_K md5-derived bit
    positions don't all contain the probe key's bits. No false
    negatives (data parity with the full-scan oracle is exact by
    construction); false positives only cost extra scanned files, and
    the ORACLE REPRODUCES THE EXACT FP BEHAVIOR — files_scanned is
    hash-compared, so the bloom math itself (salted hex_hash positions
    mod {BLOOM_BITS}) is what the differential checks, in both engines.

    100 TB shape: the bloom manifest is built in the same single pass
    that collects min/max stats (file-count × BLOOM_BITS/64 words of
    metadata); planning is a bloom-frame join at file grain; the scan
    reads only surviving files. This is Iceberg/Delta bloom skipping
    (and Parquet's own column-level bloom) from first principles."""
    root, _manifest, files_total = _stage_manifest_table(spark, sf_dir)
    bloom = _bloom_manifest(spark, sf_dir)
    import hashlib

    probe_pos = {
        int(
            hashlib.md5(
                f"b{i}:{BLOOM_PROBE_CUSTKEY}".encode()
            ).hexdigest()[:8],
            16,
        )
        % BLOOM_BITS
        for i in range(BLOOM_K)
    }
    passing = (
        bloom.filter(F.col("pos").isin(probe_pos))
        .groupBy("month")
        .agg(F.count_distinct("pos").alias("hits"))
        .filter(F.col("hits") == len(probe_pos))
        .select("month")
        .collect()
    )
    paths = [f"{root}/month={r.month}" for r in passing]
    pruned = (
        spark.read.option("basePath", root).parquet(*paths)
        if paths
        else spark.createDataFrame([], "month string, o_custkey long, cents long")
    )
    return (
        pruned.filter(F.col("o_custkey") == BLOOM_PROBE_CUSTKEY)
        .groupBy(F.col("month").cast("string").alias("month"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("cents_total"),
        )
        .select(
            "month",
            "n_rows",
            "cents_total",
            F.lit(len(paths)).cast("long").alias("files_scanned"),
            F.lit(files_total).cast("long").alias("files_total"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order clustering layout (2-D file skipping)
# ---------------------------------------------------------------------------

ZORDER_BITS = 6  # 64 buckets per dimension
ZORDER_FILE_SHIFT = 4  # z >> 4 → 256 z-contiguous files (4×4 buckets each)
_ZORDER_CACHE: SessionCache = SessionCache()
_Z_CK_LO, _Z_CK_HI = 1000, 2000  # custkey probe range (2-D predicate)


def _z_interleave_spark(db, cb):
    z = F.lit(0)
    for b in range(ZORDER_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(db, b) % 2, 2 * b)
            + F.shiftleft(F.shiftright(cb, b) % 2, 2 * b + 1)
        )
    return z


def _z_interleave_sql(db: str, cb: str) -> str:
    terms = []
    for b in range(ZORDER_BITS):
        terms.append(f"((({db} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({cb} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def _stage_zorder_table(spark: SparkSession, sf_dir: str):
    """Stage orders Z-ORDERED on (o_orderdate, o_custkey): quantize
    both dims to 2^ZORDER_BITS buckets over their exact [min,max],
    interleave the bits (Morton code), and write one file per
    z >> ZORDER_FILE_SHIFT — 64 z-contiguous files, each covering a
    small rectangle of the (date, custkey) plane."""
    key = _ZORDER_CACHE.scoped_key(spark, sf_dir)
    cached = _ZORDER_CACHE.get(key)
    if cached is not None:
        return cached
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        _cents("o_totalprice").alias("cents"),
        F.datediff("o_orderdate", F.lit("1970-01-01").cast("date")).alias(
            "days"
        ),
    )
    bounds = F.broadcast(
        o.agg(
            F.min("days").alias("dmin"),
            F.max("days").alias("dmax"),
            F.min("o_custkey").alias("cmin"),
            F.max("o_custkey").alias("cmax"),
        )
    )
    n = 1 << ZORDER_BITS
    with_z = o.crossJoin(bounds).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "cents",
        F.expr(f"(days - dmin) * {n} div (dmax - dmin + 1)").alias("db"),
        F.expr(f"(o_custkey - cmin) * {n} div (cmax - cmin + 1)").alias("cb"),
    )
    staged = with_z.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "cents",
        "db",
        "cb",
        F.shiftright(
            _z_interleave_spark(F.col("db"), F.col("cb")), ZORDER_FILE_SHIFT
        ).alias("z_file"),
    )
    root = _tracked_mkdtemp(prefix="orders_zorder_") + "/data"
    staged.repartition("z_file").write.partitionBy("z_file").parquet(root)
    _ZORDER_CACHE[key] = root
    return root


def _zorder_oracle() -> str:
    n = 1 << ZORDER_BITS
    z = _z_interleave_sql("db", "cb")
    return f"""
    WITH base AS (
        SELECT o_custkey, o_orderdate,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS days
        FROM orders
    ),
    bounds AS (
        SELECT MIN(days) dmin, MAX(days) dmax,
               MIN(o_custkey) cmin, MAX(o_custkey) cmax
        FROM base
    ),
    bucketed AS (
        SELECT b.*,
               (days - dmin) * {n} // (dmax - dmin + 1) AS db,
               (o_custkey - cmin) * {n} // (cmax - cmin + 1) AS cb
        FROM base b CROSS JOIN bounds
    ),
    zfiles AS (
        SELECT {z} >> {ZORDER_FILE_SHIFT} AS z_file,
               MIN(o_orderdate) AS dlo, MAX(o_orderdate) AS dhi,
               MIN(o_custkey) AS clo, MAX(o_custkey) AS chi,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM bucketed GROUP BY 1
    ),
    months AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS m,
               MIN(o_orderdate) AS dlo, MAX(o_orderdate) AS dhi,
               MIN(o_custkey) AS clo, MAX(o_custkey) AS chi,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM base GROUP BY 1
    ),
    match AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS cents_total
        FROM base
        WHERE o_orderdate >= TIMESTAMP '{_MP_LO}'
          AND o_orderdate < TIMESTAMP '{_MP_HI}'
          AND o_custkey >= {_Z_CK_LO} AND o_custkey < {_Z_CK_HI}
    ),
    zscan AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS files_scanned,
               CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) AS rows_scanned,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM zfiles) AS files_total
        FROM zfiles
        WHERE NOT (dhi < TIMESTAMP '{_MP_LO}' OR dlo >= TIMESTAMP '{_MP_HI}')
          AND NOT (chi < {_Z_CK_LO} OR clo >= {_Z_CK_HI})
    ),
    mscan AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS files_scanned,
               CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) AS rows_scanned,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM months) AS files_total
        FROM months
        WHERE NOT (dhi < TIMESTAMP '{_MP_LO}' OR dlo >= TIMESTAMP '{_MP_HI}')
          AND NOT (chi < {_Z_CK_LO} OR clo >= {_Z_CK_HI})
    )
    SELECT 'linear' AS layout, m.files_total, m.files_scanned,
           m.rows_scanned, x.n_rows, x.cents_total
    FROM mscan m CROSS JOIN match x
    UNION ALL
    SELECT 'zorder', z.files_total, z.files_scanned,
           z.rows_scanned, x.n_rows, x.cents_total
    FROM zscan z CROSS JOIN match x
    """


@query(
    "q_layout_zorder_rewrite",
    oracle=_zorder_oracle(),
    tags=("source", "maintenance", "layout"),
)
def q_layout_zorder_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustering rewrite (Delta OPTIMIZE ZORDER / Iceberg
    sort-order rewrite, from first principles) — the fix
    q_layout_zonemap_audit prescribes when the second predicate column
    prunes nothing. Orders are rewritten into 64 files along the
    Morton curve of (o_orderdate, o_custkey): quantize each dim to 64
    buckets over its exact [min,max], interleave the bits, cut files
    on the 6 high z-bits. Every file then covers a small RECTANGLE of
    the 2-D plane, so a 2-D predicate (Q1-1997 AND custkey ∈ [1000,
    2000)) min/max-prunes on BOTH dims at once; the month-linear
    layout can prune only the date dim and must scan every surviving
    file in full. The key serves both layouts' zone-map plans —
    (files_total, files_scanned, rows_scanned) per layout — plus the
    ACTUAL pruned-read aggregate from the z layout, all hash-checked:
    the oracle recomputes the Morton math, both manifests, and the
    full-scan answer from the unpruned table. rows_scanned is the
    honest metric (file counts flatter whichever layout has bigger
    files): measured 2356 vs 5719 (2.4× fewer) at sf0.1, a wash at
    sf0.01 where 59-row files make min/max quantization noise dominate
    — clustering pays at scale, and the margin grows with both file
    count and predicate selectivity.

    100 TB shape: the rewrite is one repartition+write (embarrassingly
    parallel, same cost class as compaction); the payoff is permanent
    2-D file skipping for every query after. Zone-map stats per file
    come free in the parquet footers (harvested for real in
    q_read_manifest_pruned; computed at file grain here)."""
    root = _stage_zorder_table(spark, sf_dir)
    z = spark.read.parquet(root)
    zman = z.groupBy("z_file").agg(
        F.min("o_orderdate").alias("dlo"),
        F.max("o_orderdate").alias("dhi"),
        F.min("o_custkey").alias("clo"),
        F.max("o_custkey").alias("chi"),
        F.count("*").alias("n_rows"),
    )
    mroot, _manifest, _n = _stage_manifest_table(spark, sf_dir)
    m = spark.read.parquet(mroot)
    mman = m.groupBy("month").agg(
        F.min("o_orderdate").alias("dlo"),
        F.max("o_orderdate").alias("dhi"),
        F.min("o_custkey").alias("clo"),
        F.max("o_custkey").alias("chi"),
        F.count("*").alias("n_rows"),
    )
    lo, hi = F.lit(_MP_LO).cast("timestamp"), F.lit(_MP_HI).cast("timestamp")
    overlap = ~(
        (F.col("dhi") < lo)
        | (F.col("dlo") >= hi)
        | (F.col("chi") < F.lit(_Z_CK_LO))
        | (F.col("clo") >= F.lit(_Z_CK_HI))
    )

    def scan_stats(man: DataFrame) -> DataFrame:
        tot = man.agg(F.count("*").alias("files_total"))
        sc = man.filter(overlap).agg(
            F.count("*").alias("files_scanned"),
            F.coalesce(F.sum("n_rows"), F.lit(0)).alias("rows_scanned"),
        )
        return sc.crossJoin(F.broadcast(tot))

    # the actual pruned read, from the z layout's surviving files
    zscan_dirs = [
        f"{root}/z_file={r.z_file}"
        for r in zman.filter(overlap).select("z_file").collect()
    ]
    pruned = (
        spark.read.option("basePath", root).parquet(*zscan_dirs)
        if zscan_dirs
        else z.limit(0)
    )
    match = pruned.filter(
        (F.col("o_orderdate") >= lo)
        & (F.col("o_orderdate") < hi)
        & (F.col("o_custkey") >= _Z_CK_LO)
        & (F.col("o_custkey") < _Z_CK_HI)
    ).agg(
        F.count("*").alias("n_rows"),
        F.coalesce(F.sum("cents"), F.lit(0)).alias("cents_total"),
    )
    out_cols = [
        "layout",
        "files_total",
        "files_scanned",
        "rows_scanned",
        "n_rows",
        "cents_total",
    ]
    lin = (
        scan_stats(mman)
        .crossJoin(F.broadcast(match))
        .select(F.lit("linear").alias("layout"), *out_cols[1:])
    )
    zo = (
        scan_stats(zman)
        .crossJoin(F.broadcast(match))
        .select(F.lit("zorder").alias("layout"), *out_cols[1:])
    )
    return lin.union(zo)


# ---------------------------------------------------------------------------
# Secondary-index read (exact point-lookup pruning)
# ---------------------------------------------------------------------------

IDX_PROBE_CUSTKEY = 77
_SECIDX_CACHE: SessionCache = SessionCache()


def _secondary_index(spark: SparkSession, sf_dir: str) -> str:
    """Inverted secondary index on o_custkey: the DISTINCT (custkey,
    month-file) pairs of the staged table, written once as an index
    parquet (built in the same pass as the stats manifest). Unlike the
    bloom (probabilistic, fixed-size) this is the exact structure —
    bigger (|distinct pairs| rows) but zero false positives; the two
    keys together price the classic index-vs-sketch trade."""
    key = _SECIDX_CACHE.scoped_key(spark, sf_dir)
    cached = _SECIDX_CACHE.get(key)
    if cached is not None:
        return cached
    root, _manifest, _n = _stage_manifest_table(spark, sf_dir)
    idx_dir = _tracked_mkdtemp(prefix="orders_secidx_") + "/index"
    (
        spark.read.parquet(root)
        .select("o_custkey", F.col("month").cast("string").alias("month"))
        .distinct()
        .repartition(4, "o_custkey")
        .write.parquet(idx_dir)
    )
    _SECIDX_CACHE[key] = idx_dir
    return idx_dir


@query(
    "q_read_secondary_index",
    oracle=f"""
    WITH m AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents_total
        FROM orders WHERE o_custkey = {IDX_PROBE_CUSTKEY}
        GROUP BY 1
    ),
    tot AS (
        SELECT CAST(COUNT(DISTINCT strftime(o_orderdate, '%Y-%m')) AS BIGINT)
            AS files_total
        FROM orders
    ),
    sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS files_scanned FROM m)
    SELECT month, n_rows, cents_total, files_scanned, files_total
    FROM m, tot, sc
    """,
    tags=("source", "maintenance", "manifest"),
)
def q_read_secondary_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary-INDEX point lookup — the exact counterpart to
    q_read_bloom_pruned's probabilistic skipping: an inverted index of
    DISTINCT (o_custkey, month-file) pairs, built once alongside the
    stats manifest and stored as its own parquet (hash-distributed on
    the key). A point predicate reads the INDEX first (a pushed-down
    key filter on a structure ~|distinct pairs| rows, not the data),
    collects the exactly-correct file list — zero false positives, so
    files_scanned here = the true month count, which the oracle
    derives from the raw table — then scans only those files. Bloom
    vs index is the classic space/exactness trade: the bloom is
    O(files x bits) regardless of cardinality; the index is exact but
    grows with |distinct (key, file)| — this engine provides both.

    100 TB shape: index build is one distinct + write in the staging
    pass; lookup is an index-partition read (key-pruned) + file-count
    planning + a pruned scan."""
    root, _manifest, files_total = _stage_manifest_table(spark, sf_dir)
    idx = spark.read.parquet(_secondary_index(spark, sf_dir))
    months = [
        r.month
        for r in idx.filter(F.col("o_custkey") == IDX_PROBE_CUSTKEY)
        .select("month")
        .distinct()
        .collect()
    ]
    paths = [f"{root}/month={m}" for m in sorted(months)]
    pruned = (
        spark.read.option("basePath", root).parquet(*paths)
        if paths
        else spark.createDataFrame(
            [], "month string, o_custkey long, cents long"
        )
    )
    return (
        pruned.filter(F.col("o_custkey") == IDX_PROBE_CUSTKEY)
        .groupBy(F.col("month").cast("string").alias("month"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("cents_total"),
        )
        .select(
            "month",
            "n_rows",
            "cents_total",
            F.lit(len(paths)).cast("long").alias("files_scanned"),
            F.lit(files_total).cast("long").alias("files_total"),
        )
    )


# ---------------------------------------------------------------------------
# Snapshot-isolation read over a manifest-committed table
# ---------------------------------------------------------------------------

_SNAPSHOT_CACHE: SessionCache = SessionCache()
SNAP_GROUPS = 5  # staged commits (one per o_orderkey % SNAP_GROUPS slice)
SNAP_PIN = 3  # the snapshot reads only the first SNAP_PIN commits


def _stage_committed_table(spark: SparkSession, sf_dir: str):
    """Stage a manifest-committed orders table as SNAP_GROUPS ordered
    commits: data file first, then a manifest entry carrying a
    monotonically increasing commit_id — the append-only commit log
    every table format keeps."""
    key = _SNAPSHOT_CACHE.scoped_key(spark, sf_dir)
    cached = _SNAPSHOT_CACHE.get(key)
    if cached is not None:
        return cached
    import os

    base = _tracked_mkdtemp(prefix="orders_snap_")
    data, man = os.path.join(base, "data"), os.path.join(base, "manifest")
    # localCheckpoint: each commit's coalesce(1) write would otherwise
    # re-run the full scan lineage — 5 commits cost 5 table scans
    # (measured 22 s at sf0.1; 6 s with the one materialization)
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", _cents("o_totalprice").alias("cents"))
        .localCheckpoint()
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(man, exist_ok=True)
    for commit_id in range(SNAP_GROUPS):
        path = os.path.join(data, f"commit-{commit_id}")
        part = o.filter(F.col("o_orderkey") % SNAP_GROUPS == commit_id)
        part.coalesce(1).write.parquet(path)
        # commit-log entry: driver-side metadata, written directly
        # (data durable FIRST — the transactional ordering)
        pq.write_table(
            pa.table(
                {
                    "commit_id": pa.array([commit_id], pa.int64()),
                    "path": pa.array([path], pa.string()),
                }
            ),
            os.path.join(man, f"commit-{commit_id}.parquet"),
        )
    _SNAPSHOT_CACHE[key] = (data, man)
    return _SNAPSHOT_CACHE[key]


@query(
    "q_read_snapshot_isolation",
    oracle=f"""
    WITH g AS (
        SELECT o_orderkey % {SNAP_GROUPS} AS commit_id,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    snap AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS cents_total,
               CAST({SNAP_PIN} AS BIGINT) AS n_commits
        FROM g WHERE commit_id < {SNAP_PIN}
    ),
    head AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS cents_total,
               CAST({SNAP_GROUPS} AS BIGINT) AS n_commits
        FROM g
    )
    SELECT 'snapshot' AS version, n_rows, cents_total, n_commits FROM snap
    UNION ALL
    SELECT 'head', n_rows, cents_total, n_commits FROM head
    """,
    tags=("source", "maintenance", "manifest"),
)
def q_read_snapshot_isolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT-ISOLATION read over the manifest-committed table: a
    reader pinned to commit_id < {SNAP_PIN} plans from a PREFIX of the
    commit log and sees a consistent historical version — files from
    commits that landed after the pin are never listed, opened, or
    scanned, no matter how many arrive (this is how Iceberg snapshot
    reads and Delta time travel actually work: version = manifest
    prefix, not file mtimes). The key serves BOTH versions' aggregates
    — pinned snapshot and current head — and the oracle recomputes
    each from the raw table, so a snapshot that leaked a later commit
    (or dropped an early one) hash-fails. Completes the table-format
    story: manifest read planning (q_read_manifest_pruned), bloom/
    index skipping, transactional streaming commits
    (sink_manifest_commit), torn-write invisibility (orphan audit),
    and now versioned reads.

    100 TB shape: version resolution is a commit-log prefix filter
    (metadata grain); both scans read only their version's files."""
    data, man = _stage_committed_table(spark, sf_dir)
    log = spark.read.parquet(man)
    snap_paths = [
        r.path
        for r in log.filter(F.col("commit_id") < SNAP_PIN)
        .select("path")
        .collect()
    ]
    head_paths = [r.path for r in log.select("path").collect()]

    def version(label: str, paths: list[str]) -> DataFrame:
        t = spark.read.option("basePath", data).parquet(*sorted(paths))
        return t.agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("cents_total"),
        ).select(
            F.lit(label).alias("version"),
            "n_rows",
            "cents_total",
            F.lit(len(paths)).cast("long").alias("n_commits"),
        )

    return version("snapshot", snap_paths).union(
        version("head", head_paths)
    )


# ---------------------------------------------------------------------------
# Named snapshot refs: branches advance, tags pin (Iceberg ref semantics)
# ---------------------------------------------------------------------------

# The ref LOG: (seq, ref_name, ref_type, commit_id) — an append-only
# metadata stream beside the commit log. 'main' advances with every
# commit; 'v1.0' is a tag pinned at snapshot 1 forever; 'audit' is a
# slow branch created at 2, advanced to 3, never to 4. Resolution =
# latest entry per ref (seq DESC).
SNAP_REF_LOG = [
    (0, "main", "branch", 0),
    (1, "main", "branch", 1),
    (1, "v1.0", "tag", 1),
    (2, "main", "branch", 2),
    (2, "audit", "branch", 2),
    (3, "main", "branch", 3),
    (3, "audit", "branch", 3),
    (4, "main", "branch", 4),
]

_REFS_CACHE: SessionCache = SessionCache()


def _stage_ref_log(spark: SparkSession, sf_dir: str) -> str:
    """Write the ref log beside the committed table's manifest — the
    same driver-side metadata write the commit log uses."""
    import os

    key = _REFS_CACHE.scoped_key(spark, sf_dir)
    cached = _REFS_CACHE.get(key)
    if cached is not None:
        return cached
    data, man = _stage_committed_table(spark, sf_dir)
    import pyarrow as pa
    import pyarrow.parquet as pq

    refs_dir = os.path.join(os.path.dirname(man), "refs")
    os.makedirs(refs_dir, exist_ok=True)
    seqs, names, types, cids = zip(*SNAP_REF_LOG)
    pq.write_table(
        pa.table(
            {
                "seq": pa.array(seqs, pa.int64()),
                "ref_name": pa.array(names, pa.string()),
                "ref_type": pa.array(types, pa.string()),
                "commit_id": pa.array(cids, pa.int64()),
            }
        ),
        os.path.join(refs_dir, "reflog.parquet"),
    )
    _REFS_CACHE[key] = refs_dir
    return refs_dir


def _snap_refs_oracle() -> str:
    reflog_rows = ", ".join(
        f"({s}, '{n}', '{t}', {c})" for s, n, t, c in SNAP_REF_LOG
    )
    return f"""
    WITH g AS (
        SELECT o_orderkey % {SNAP_GROUPS} AS commit_id,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    reflog(seq, ref_name, ref_type, commit_id) AS (
        VALUES {reflog_rows}
    ),
    resolved AS (
        SELECT ref_name, ref_type, commit_id FROM (
            SELECT *, row_number() OVER (PARTITION BY ref_name
                          ORDER BY seq DESC, commit_id DESC) AS rn
            FROM reflog
        ) WHERE rn = 1
    )
    SELECT r.ref_name, r.ref_type,
           CAST(r.commit_id AS BIGINT) AS resolved_commit_id,
           CAST(r.commit_id + 1 AS BIGINT) AS n_commits,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(g.cents) AS BIGINT) AS cents_total
    FROM resolved r JOIN g ON g.commit_id <= r.commit_id
    GROUP BY r.ref_name, r.ref_type, r.commit_id
    """


@query(
    "q_meta_snapshot_refs",
    oracle=_snap_refs_oracle(),
    tags=("source", "maintenance", "manifest"),
)
def q_meta_snapshot_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NAMED SNAPSHOT REFS over the manifest-committed table — Iceberg
    branch/tag semantics (VERDICT r11 ask #8): an append-only ref log
    lives beside the commit log; a TAG pins one snapshot forever
    ('v1.0' → commit 1), a BRANCH advances by appending entries
    ('main' tracks the head, 'audit' lags at 3). Ref resolution is
    latest-entry-per-ref (seq DESC window) — pure metadata — and a
    read VIA a ref plans from the commit-log prefix ≤ the resolved
    snapshot, byte-identical machinery to q_read_snapshot_isolation's
    pinned read: later files are never listed, opened, or scanned.
    Serves every ref's aggregate (rows + cents) with the resolved
    snapshot id; the oracle recomputes resolution AND every prefix
    aggregate from the raw table, so a ref that leaks a later commit
    (the tag-mutation bug) or drops one hash-fails.

    100 TB shape: the ref log and its resolution window are
    metadata-grain (|refs| rows); each ref's scan reads only its
    prefix's files — a lagging branch never pays head-sized I/O."""
    data, man = _stage_committed_table(spark, sf_dir)
    refs_dir = _stage_ref_log(spark, sf_dir)
    from pyspark.sql import Window

    reflog = spark.read.parquet(refs_dir)
    wr = Window.partitionBy("ref_name").orderBy(
        F.desc("seq"), F.desc("commit_id")
    )
    resolved = (
        reflog.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("ref_name", "ref_type", "commit_id")
        .collect()  # metadata grain: one row per ref
    )
    log = spark.read.parquet(man)
    out = None
    for r in sorted(resolved, key=lambda x: x.ref_name):
        paths = sorted(
            row.path
            for row in log.filter(F.col("commit_id") <= r.commit_id)
            .select("path")
            .collect()
        )
        t = spark.read.option("basePath", data).parquet(*paths)
        part = t.agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("cents_total"),
        ).select(
            F.lit(r.ref_name).alias("ref_name"),
            F.lit(r.ref_type).alias("ref_type"),
            F.lit(r.commit_id).cast("long").alias("resolved_commit_id"),
            F.lit(r.commit_id + 1).cast("long").alias("n_commits"),
            "n_rows",
            "cents_total",
        )
        out = part if out is None else out.unionByName(part)
    return out


def _branch_ff_oracle() -> str:
    reflog_rows = ", ".join(
        f"({s}, '{n}', '{t}', {c})" for s, n, t, c in SNAP_REF_LOG
    )
    return f"""
    WITH g AS (
        SELECT o_orderkey % {SNAP_GROUPS} AS commit_id,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    reflog(seq, ref_name, ref_type, commit_id) AS (
        VALUES {reflog_rows}
    ),
    resolved AS (
        SELECT ref_name, ref_type, commit_id, seq FROM (
            SELECT *, row_number() OVER (PARTITION BY ref_name
                          ORDER BY seq DESC, commit_id DESC) AS rn
            FROM reflog
        ) WHERE rn = 1
    ),
    head AS (SELECT commit_id AS head_id, seq AS head_seq
             FROM resolved WHERE ref_name = 'main'),
    ff AS (
        SELECT r.ref_name, r.ref_type,
               CAST(r.commit_id AS BIGINT) AS from_commit_id,
               CAST(CASE WHEN r.ref_type = 'branch'
                         AND r.commit_id < h.head_id
                    THEN h.head_id ELSE r.commit_id END AS BIGINT)
                   AS to_commit_id,
               CAST(CASE WHEN r.ref_type = 'branch'
                         AND r.commit_id < h.head_id
                    THEN 1 ELSE 0 END AS BIGINT) AS fast_forwarded,
               CAST(CASE WHEN r.ref_type = 'tag'
                         AND r.commit_id < h.head_id
                    THEN 1 ELSE 0 END AS BIGINT) AS rejected_tag
        FROM resolved r CROSS JOIN head h
    )
    SELECT f.ref_name, f.ref_type, f.from_commit_id, f.to_commit_id,
           f.fast_forwarded, f.rejected_tag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(g.cents) AS BIGINT) AS cents_total
    FROM ff f JOIN g ON g.commit_id <= f.to_commit_id
    GROUP BY f.ref_name, f.ref_type, f.from_commit_id, f.to_commit_id,
             f.fast_forwarded, f.rejected_tag
    """


@query(
    "q_table_branch_fast_forward",
    oracle=_branch_ff_oracle(),
    tags=("source", "maintenance", "manifest"),
)
def q_table_branch_fast_forward(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BRANCH FAST-FORWARD over the ref log — the Iceberg
    ``fast_forward`` procedure (promote a lagging branch to the main
    head after its audit/WAP validation passes): every BRANCH whose
    resolved snapshot is strictly BEHIND main's head advances to the
    head by APPENDING a ref-log entry (the log stays append-only —
    the move is one metadata row, exactly like the commits
    themselves); TAGS are immutable by definition, so a tag behind
    head is REJECTED, not moved (the tag-mutation refusal, flagged in
    the rejected_tag proof column). On this fixture: 'audit' (branch,
    at 3) fast-forwards to 4; 'v1.0' (tag, at 1) is refused and
    stays pinned; 'main' is already at head (no-op). The key serves
    every ref's POST-operation aggregate through the same commit-log
    prefix planning as q_meta_snapshot_refs, with
    (from_commit_id, to_commit_id, fast_forwarded, rejected_tag) as
    the operation's audit row. The oracle recomputes resolution, the
    fast-forward decision table, and every prefix aggregate from the
    raw table — a fast-forward that moved a tag, skipped an eligible
    branch, or rewrote history instead of appending hash-fails.

    100 TB shape: resolution + decision are |refs|-row metadata; the
    appended entry is one row; each ref's read plans from its
    (possibly advanced) commit prefix — the lagging branch pays
    head-sized I/O only AFTER it chose to advance."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    data, man = _stage_committed_table(spark, sf_dir)
    refs_dir = _stage_ref_log(spark, sf_dir)
    from pyspark.sql import Window

    reflog = spark.read.parquet(refs_dir)
    wr = Window.partitionBy("ref_name").orderBy(
        F.desc("seq"), F.desc("commit_id")
    )
    resolved = (
        reflog.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("ref_name", "ref_type", "commit_id", "seq")
        .collect()  # metadata grain: one row per ref
    )
    head = next(r for r in resolved if r.ref_name == "main")
    decisions = []
    appended = []
    for r in resolved:
        can_ff = r.ref_type == "branch" and r.commit_id < head.commit_id
        is_rejected_tag = r.ref_type == "tag" and r.commit_id < head.commit_id
        to_id = head.commit_id if can_ff else r.commit_id
        decisions.append(
            (r.ref_name, r.ref_type, r.commit_id, to_id,
             int(can_ff), int(is_rejected_tag))
        )
        if can_ff:
            appended.append((head.seq + 1, r.ref_name, "branch", to_id))
    if appended:
        # append-only: the fast-forward IS a new ref-log entry file —
        # staged in its OWN dir (this key's branch of the log) so the
        # shared fixture other ref keys resolve stays pristine; a real
        # table would append in place under its commit lock.
        ff_dir = os.path.join(os.path.dirname(refs_dir), "refs-ff")
        os.makedirs(ff_dir, exist_ok=True)
        seqs, names, types, cids = zip(*appended)
        pq.write_table(
            pa.table(
                {
                    "seq": pa.array(seqs, pa.int64()),
                    "ref_name": pa.array(names, pa.string()),
                    "ref_type": pa.array(types, pa.string()),
                    "commit_id": pa.array(cids, pa.int64()),
                }
            ),
            os.path.join(ff_dir, "reflog-ff.parquet"),
        )
    log = spark.read.parquet(man)
    out = None
    for name, rtype, from_id, to_id, ff, rej in sorted(decisions):
        paths = sorted(
            row.path
            for row in log.filter(F.col("commit_id") <= to_id)
            .select("path")
            .collect()
        )
        t = spark.read.option("basePath", data).parquet(*paths)
        part = t.agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("cents_total"),
        ).select(
            F.lit(name).alias("ref_name"),
            F.lit(rtype).alias("ref_type"),
            F.lit(from_id).cast("long").alias("from_commit_id"),
            F.lit(to_id).cast("long").alias("to_commit_id"),
            F.lit(ff).cast("long").alias("fast_forwarded"),
            F.lit(rej).cast("long").alias("rejected_tag"),
            "n_rows",
            "cents_total",
        )
        out = part if out is None else out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# Snapshot rollback + cherry-pick (the two Iceberg procedures completing
# the branch toolbox next to fast-forward)
# ---------------------------------------------------------------------------

ROLLBACK_TO = 2  # main rolls back to this snapshot (incident response)


def _rollback_oracle() -> str:
    reflog_rows = ", ".join(
        f"({s}, '{n}', '{t}', {c})" for s, n, t, c in SNAP_REF_LOG
    )
    return f"""
    WITH g AS (
        SELECT o_orderkey % {SNAP_GROUPS} AS commit_id,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    reflog(seq, ref_name, ref_type, commit_id) AS (
        VALUES {reflog_rows}
    ),
    resolved AS (
        SELECT ref_name, ref_type, commit_id FROM (
            SELECT *, row_number() OVER (PARTITION BY ref_name
                          ORDER BY seq DESC, commit_id DESC) AS rn
            FROM reflog
        ) WHERE rn = 1
    ),
    req(ref_name, target) AS (VALUES ('main', {ROLLBACK_TO}),
                                     ('v1.0', 0)),
    rb AS (
        SELECT r.ref_name, r.ref_type,
               CAST(r.commit_id AS BIGINT) AS from_commit_id,
               CAST(CASE WHEN q.ref_name IS NOT NULL
                         AND r.ref_type = 'branch'
                         AND q.target < r.commit_id
                    THEN q.target ELSE r.commit_id END AS BIGINT)
                   AS to_commit_id,
               CAST(CASE WHEN q.ref_name IS NOT NULL
                         AND r.ref_type = 'branch'
                         AND q.target < r.commit_id
                    THEN 1 ELSE 0 END AS BIGINT) AS rolled_back,
               CAST(CASE WHEN q.ref_name IS NOT NULL
                         AND r.ref_type = 'tag'
                    THEN 1 ELSE 0 END AS BIGINT) AS rejected_tag
        FROM resolved r LEFT JOIN req q ON q.ref_name = r.ref_name
    )
    SELECT b.ref_name, b.ref_type, b.from_commit_id, b.to_commit_id,
           b.rolled_back, b.rejected_tag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(g.cents) AS BIGINT) AS cents_total,
           CAST({len(SNAP_REF_LOG)}
                + (SELECT SUM(rolled_back) FROM rb) AS BIGINT)
               AS n_reflog_rows_after
    FROM rb b JOIN g ON g.commit_id <= b.to_commit_id
    GROUP BY b.ref_name, b.ref_type, b.from_commit_id, b.to_commit_id,
             b.rolled_back, b.rejected_tag
    """


@query(
    "q_table_rollback",
    oracle=_rollback_oracle(),
    tags=("source", "maintenance", "manifest"),
)
def q_table_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT ROLLBACK over the ref log — the Iceberg
    ``rollback_to_snapshot`` procedure (incident response: bad data
    landed in commits {ROLLBACK_TO+1}..head, point the branch BACK):
    'main' rolls back to snapshot {ROLLBACK_TO} by APPENDING a ref-log
    entry that targets the OLDER commit — history is never rewritten
    (the bad commits stay in the log, reachable by any audit read; a
    later fast-forward can re-advance), exactly the append-only move
    q_table_branch_fast_forward makes in the other direction. A
    rollback request against a TAG ('v1.0') is REFUSED — tags are
    immutable — mirrored in the rejected_tag proof column; the
    unrequested 'audit' branch is untouched. The key then RE-RESOLVES
    every ref from the base log UNION the appended entries (the
    append is load-bearing: resolution reads it, not the in-memory
    decision), and serves each ref's post-op aggregate from its
    commit-log prefix. The oracle recomputes the decision table,
    every prefix aggregate, and the append-only row count
    (n_reflog_rows_after = {len(SNAP_REF_LOG)} + rollbacks) from the
    raw table — a rollback that rewrote history (dropped rows) or
    moved a tag hash-fails.

    100 TB shape: the rollback is ONE appended metadata row; the
    rolled-back branch's next read plans from a SHORTER commit
    prefix (less I/O, not more); no data file is touched, deleted,
    or rewritten — un-rollback is another one-row append.

    Reference lifecycle pattern: q_table_branch_fast_forward
    (sources/formats.py), q_meta_snapshot_refs resolution."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    data, man = _stage_committed_table(spark, sf_dir)
    refs_dir = _stage_ref_log(spark, sf_dir)
    from pyspark.sql import Window

    reflog = spark.read.parquet(refs_dir)
    wr = Window.partitionBy("ref_name").orderBy(
        F.desc("seq"), F.desc("commit_id")
    )
    resolved = (
        reflog.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("ref_name", "ref_type", "commit_id", "seq")
        .collect()  # metadata grain: one row per ref
    )
    requests = {"main": ROLLBACK_TO, "v1.0": 0}
    max_seq = max(r.seq for r in resolved)
    decisions, appended = {}, []
    for r in resolved:
        target = requests.get(r.ref_name)
        rolls = (
            target is not None
            and r.ref_type == "branch"
            and target < r.commit_id
        )
        rejected = target is not None and r.ref_type == "tag"
        decisions[r.ref_name] = (
            r.ref_type, r.commit_id, int(rolls), int(rejected)
        )
        if rolls:
            appended.append((max_seq + 1, r.ref_name, "branch", target))
    rb_dir = os.path.join(os.path.dirname(refs_dir), "refs-rollback")
    os.makedirs(rb_dir, exist_ok=True)
    if appended:
        seqs, names, types, cids = zip(*appended)
        pq.write_table(
            pa.table(
                {
                    "seq": pa.array(seqs, pa.int64()),
                    "ref_name": pa.array(names, pa.string()),
                    "ref_type": pa.array(types, pa.string()),
                    "commit_id": pa.array(cids, pa.int64()),
                }
            ),
            os.path.join(rb_dir, "reflog-rollback.parquet"),
        )
    # Re-resolve from base log ∪ appended entries: the append is the
    # operation; the served state must come from what a NEW reader of
    # the log would see.
    post = (
        spark.read.parquet(refs_dir, rb_dir)
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("ref_name", "commit_id")
        .collect()
    )
    n_after = len(SNAP_REF_LOG) + len(appended)
    log = spark.read.parquet(man)
    out = None
    for p in sorted(post, key=lambda x: x.ref_name):
        rtype, from_id, rolled, rejected = decisions[p.ref_name]
        paths = sorted(
            row.path
            for row in log.filter(F.col("commit_id") <= p.commit_id)
            .select("path")
            .collect()
        )
        t = spark.read.option("basePath", data).parquet(*paths)
        part = t.agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("cents_total"),
        ).select(
            F.lit(p.ref_name).alias("ref_name"),
            F.lit(rtype).alias("ref_type"),
            F.lit(from_id).cast("long").alias("from_commit_id"),
            F.lit(p.commit_id).cast("long").alias("to_commit_id"),
            F.lit(rolled).cast("long").alias("rolled_back"),
            F.lit(rejected).cast("long").alias("rejected_tag"),
            "n_rows",
            "cents_total",
            F.lit(n_after).cast("long").alias("n_reflog_rows_after"),
        )
        out = part if out is None else out.unionByName(part)
    return out


CHERRY_BASE = 1  # the 'hotfix' branch is created at this snapshot
CHERRY_PICKS = (3, 1)  # commits replayed onto hotfix, in order


def _cherry_pick_oracle() -> str:
    # Replay the pick sequence over the slice sets driver-side: branch
    # content starts as prefix <= CHERRY_BASE; a pick of commit c is
    # applied iff c's file is not already in the branch file set.
    content = set(range(CHERRY_BASE + 1))
    rows = []
    next_commit = SNAP_GROUPS
    for c in CHERRY_PICKS:
        if c in content:
            rows.append((c, "rejected_contained", -1, 0, set(content)))
        else:
            content.add(c)
            rows.append((c, "cherry_picked", next_commit, 1, set(content)))
            next_commit += 1
    sel = []
    for c, outcome, cid, nf, snap in rows:
        in_list = ", ".join(str(s) for s in sorted(snap))
        sel.append(
            f"""
    SELECT CAST({c} AS BIGINT) AS pick_commit,
           'hotfix' AS target_ref,
           '{outcome}' AS outcome,
           CAST({cid} AS BIGINT) AS new_commit_id,
           CAST({nf} AS BIGINT) AS n_files_replayed,
           CAST(0 AS BIGINT) AS n_conflicting_files,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents_total
    FROM g WHERE commit_id IN ({in_list})"""
        )
    return f"""
    WITH g AS (
        SELECT o_orderkey % {SNAP_GROUPS} AS commit_id,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    )
    {" UNION ALL ".join(sel)}
    """


@query(
    "q_table_cherry_pick",
    oracle=_cherry_pick_oracle(),
    tags=("source", "maintenance", "manifest"),
)
def q_table_cherry_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHERRY-PICK onto a branch — the Iceberg ``cherrypick_snapshot``
    procedure (replay ONE commit's files onto another branch as a new
    commit, no data copy): a 'hotfix' branch is created at snapshot
    {CHERRY_BASE}, then each pick in {CHERRY_PICKS} is validated and
    applied in order. Pick of commit 3: its data FILE (never its
    rows — the replay is metadata-only, one manifest entry
    referencing the existing file) is appended to the branch as new
    commit {SNAP_GROUPS}, after the q_table_commit_conflict-style
    validation scan counts zero conflicting files (the branch holds
    no file covering the picked key slice — commits partition by
    o_orderkey % {SNAP_GROUPS}). Pick of commit 1 is REJECTED as
    already contained: its file is in the branch's file set (the
    double-apply guard — replaying a commit twice would double its
    rows). Each request row serves the branch's POST-request
    aggregate, read through the branch manifest (base prefix +
    replayed entries); the oracle replays the same decision sequence
    over raw slices — a pick that copied rows twice, skipped
    validation, or mutated the source branch hash-fails.

    100 TB shape: validation + replay are METADATA-grain (one
    file-set membership probe + one manifest-row append — the
    suffix-scan economics of q_table_commit_conflict); the picked
    data file is shared between branches, never copied, so a
    cherry-pick of a 1 TB commit moves ~100 bytes of metadata.

    Reference lifecycle pattern: q_table_commit_conflict validation,
    q_table_branch_fast_forward ref append (sources/formats.py)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    data, man = _stage_committed_table(spark, sf_dir)
    log = spark.read.parquet(man)
    commit_paths = {
        r.commit_id: r.path for r in log.collect()  # metadata grain
    }
    branch_files = {
        c: p for c, p in commit_paths.items() if c <= CHERRY_BASE
    }
    pick_dir = _tracked_mkdtemp(prefix="cherry_pick_")
    next_commit = SNAP_GROUPS
    out = None
    for c in CHERRY_PICKS:
        picked_path = commit_paths[c]
        contained = picked_path in branch_files.values()
        if contained:
            outcome, cid, nf = "rejected_contained", -1, 0
        else:
            # Conflict validation (the q_table_commit_conflict scan):
            # a file already covering the picked slice would conflict.
            # Slices are disjoint by construction, so this counts 0 —
            # the proof column, not an assumption.
            n_conf = sum(
                1
                for bc in branch_files
                if bc % SNAP_GROUPS == c % SNAP_GROUPS
            )
            assert n_conf == 0
            outcome, cid, nf = "cherry_picked", next_commit, 1
            # metadata-only replay: the new manifest entry references
            # the EXISTING data file
            pq.write_table(
                pa.table(
                    {
                        "commit_id": pa.array([cid], pa.int64()),
                        "path": pa.array([picked_path], pa.string()),
                    }
                ),
                os.path.join(pick_dir, f"commit-{cid}.parquet"),
            )
            branch_files[c] = picked_path
            next_commit += 1
        t = spark.read.option("basePath", data).parquet(
            *sorted(set(branch_files.values()))
        )
        part = t.agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("cents_total"),
        ).select(
            F.lit(c).cast("long").alias("pick_commit"),
            F.lit("hotfix").alias("target_ref"),
            F.lit(outcome).alias("outcome"),
            F.lit(cid).cast("long").alias("new_commit_id"),
            F.lit(nf).cast("long").alias("n_files_replayed"),
            F.lit(0).cast("long").alias("n_conflicting_files"),
            "n_rows",
            "cents_total",
        )
        out = part if out is None else out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# Commit-log + ref-log compaction (Iceberg rewrite_manifests semantics)
# ---------------------------------------------------------------------------

MAN_COMPACT_CUT = SNAP_PIN  # commits < CUT merge into one base manifest
REF_COMPACT_SEQ = 2  # ref entries with seq <= this collapse to resolutions

_MAN_COMPACT_CACHE: SessionCache = SessionCache()


def _current_log_dirs(base: str) -> tuple:
    """Resolve the live (manifest, refs) dir names through the CURRENT
    pointer file — the atomic-publish mechanism: compaction stages new
    log dirs and swaps the pointer LAST (os.replace), so a torn
    compaction (staged dirs, no pointer) leaves every reader on the
    original logs."""
    import json as _json
    import os

    cur = os.path.join(base, "CURRENT")
    if os.path.exists(cur):
        with open(cur) as f:
            d = _json.load(f)
        return (
            os.path.join(base, d["manifest"]),
            os.path.join(base, d["refs"]),
        )
    return os.path.join(base, "manifest"), os.path.join(base, "refs")


def _compact_logs(spark: SparkSession, sf_dir: str) -> dict:
    """Iceberg ``rewrite_manifests`` over the committed table's commit
    log AND ref log: merge the commit entries below ``MAN_COMPACT_CUT``
    into ONE multi-row base manifest (small per-commit manifest files
    are the metadata-scan bottleneck a streaming commit rate creates),
    rewrite the tail per-commit files alongside, and collapse ref-log
    entries with seq <= ``REF_COMPACT_SEQ`` to one resolved entry per
    ref (latest wins) with the later tail preserved — then publish
    atomically by swapping the CURRENT pointer. Data files are never
    touched; the rewritten logs are snapshot-equivalent by
    construction and pinned so by the pre/post law test."""
    key = _MAN_COMPACT_CACHE.scoped_key(spark, sf_dir)
    cached = _MAN_COMPACT_CACHE.get(key)
    if cached is not None:
        return cached
    import json as _json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    data, man = _stage_committed_table(spark, sf_dir)
    refs_dir = _stage_ref_log(spark, sf_dir)
    base = os.path.dirname(man)

    def _parquet_files(d: str) -> list:
        return sorted(
            f
            for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )

    stats = {"n_manifest_files_before": len(_parquet_files(man))}
    commits = sorted(
        (r.commit_id, r.path)
        for r in spark.read.parquet(man).collect()  # metadata grain
    )
    man2 = os.path.join(base, "manifest-rewrite")
    os.makedirs(man2, exist_ok=True)
    head = [(c, p) for c, p in commits if c < MAN_COMPACT_CUT]
    tail = [(c, p) for c, p in commits if c >= MAN_COMPACT_CUT]
    pq.write_table(
        pa.table(
            {
                "commit_id": pa.array([c for c, _ in head], pa.int64()),
                "path": pa.array([p for _, p in head], pa.string()),
            }
        ),
        os.path.join(man2, "base-manifest.parquet"),
    )
    for c, p in tail:
        pq.write_table(
            pa.table(
                {
                    "commit_id": pa.array([c], pa.int64()),
                    "path": pa.array([p], pa.string()),
                }
            ),
            os.path.join(man2, f"commit-{c}.parquet"),
        )
    stats["n_manifest_files_after"] = len(_parquet_files(man2))

    reflog = sorted(
        (r.seq, r.ref_name, r.ref_type, r.commit_id)
        for r in spark.read.parquet(refs_dir).collect()  # metadata grain
    )
    stats["n_reflog_rows_before"] = len(reflog)
    prefix = [e for e in reflog if e[0] <= REF_COMPACT_SEQ]
    ref_tail = [e for e in reflog if e[0] > REF_COMPACT_SEQ]
    resolved = {}
    for seq, name, rtype, cid in prefix:  # ordered: latest wins
        resolved[name] = (seq, name, rtype, cid)
    compacted = sorted(resolved.values()) + ref_tail
    refs2 = os.path.join(base, "refs-rewrite")
    os.makedirs(refs2, exist_ok=True)
    seqs, names, types, cids = zip(*compacted)
    pq.write_table(
        pa.table(
            {
                "seq": pa.array(seqs, pa.int64()),
                "ref_name": pa.array(names, pa.string()),
                "ref_type": pa.array(types, pa.string()),
                "commit_id": pa.array(cids, pa.int64()),
            }
        ),
        os.path.join(refs2, "reflog.parquet"),
    )
    stats["n_reflog_rows_after"] = len(compacted)

    # Publish: the pointer write IS the commit (os.replace is atomic);
    # everything above is invisible staging until this line.
    tmp = os.path.join(base, "CURRENT.tmp")
    with open(tmp, "w") as f:
        _json.dump({"manifest": "manifest-rewrite", "refs": "refs-rewrite"}, f)
    os.replace(tmp, os.path.join(base, "CURRENT"))
    out = {"base": base, "data": data, "stats": stats}
    _MAN_COMPACT_CACHE[key] = out
    return out


def _rewrite_manifests_oracle() -> str:
    n_files_after = 1 + (SNAP_GROUPS - MAN_COMPACT_CUT)
    prefix = [e for e in SNAP_REF_LOG if e[0] <= REF_COMPACT_SEQ]
    tail = [e for e in SNAP_REF_LOG if e[0] > REF_COMPACT_SEQ]
    n_ref_after = len({e[1] for e in prefix}) + len(tail)
    return f"""
    SELECT t.*,
           CAST({SNAP_GROUPS} AS BIGINT) AS n_manifest_files_before,
           CAST({n_files_after} AS BIGINT) AS n_manifest_files_after,
           CAST({len(SNAP_REF_LOG)} AS BIGINT) AS n_reflog_rows_before,
           CAST({n_ref_after} AS BIGINT) AS n_reflog_rows_after
    FROM ({_snap_refs_oracle()}) t
    """


@query(
    "q_maintenance_rewrite_manifests",
    oracle=_rewrite_manifests_oracle(),
    tags=("source", "maintenance", "manifest"),
)
def q_maintenance_rewrite_manifests(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COMMIT-LOG + REF-LOG COMPACTION (VERDICT r12 ask #2 — Iceberg
    ``rewrite_manifests``): the manifest-committed table's metadata
    grows one file per commit and one row per ref update forever; at
    streaming commit rates the metadata scan that PLANS every read
    becomes the read bottleneck. This key merges the commit entries
    below ``MAN_COMPACT_CUT`` into one multi-row base manifest (tail
    commits keep per-commit files, so incremental appends continue
    unchanged), collapses ref-log entries at seq <= ``REF_COMPACT_SEQ``
    to their per-ref resolutions (later entries preserved), and
    publishes via an atomic CURRENT-pointer swap — a torn compaction
    (staged dirs, pointer not yet swapped) leaves readers on the
    original logs (law-pinned). It then serves EVERY ref's aggregate
    by resolving through the compacted logs: bit-identical rows to
    q_meta_snapshot_refs (the pre/post law), plus the compaction
    proof columns (manifest files 5 -> 3, ref rows 8 -> 6). Data
    files are never rewritten — this is pure metadata maintenance,
    the complement of q_maintenance_expire_snapshots (which GCs data)
    and q_maintenance_compact (which rewrites data layout).

    100 TB shape: compaction is metadata-grain (|commits| + |refs|
    rows through the driver, exactly like the commit writes
    themselves); read planning afterwards opens O(tail) manifest
    files instead of O(all commits). The pointer swap is one rename —
    the same single-writer commit protocol the manifest sink uses."""
    info = _compact_logs(spark, sf_dir)
    man2, refs2 = _current_log_dirs(info["base"])
    data, stats = info["data"], info["stats"]
    from pyspark.sql import Window

    reflog = spark.read.parquet(refs2)
    wr = Window.partitionBy("ref_name").orderBy(
        F.desc("seq"), F.desc("commit_id")
    )
    resolved = (
        reflog.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("ref_name", "ref_type", "commit_id")
        .collect()  # metadata grain: one row per ref
    )
    log = spark.read.parquet(man2)
    out = None
    for r in sorted(resolved, key=lambda x: x.ref_name):
        paths = sorted(
            row.path
            for row in log.filter(F.col("commit_id") <= r.commit_id)
            .select("path")
            .collect()
        )
        t = spark.read.option("basePath", data).parquet(*paths)
        part = t.agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("cents_total"),
        ).select(
            F.lit(r.ref_name).alias("ref_name"),
            F.lit(r.ref_type).alias("ref_type"),
            F.lit(r.commit_id).cast("long").alias("resolved_commit_id"),
            F.lit(r.commit_id + 1).cast("long").alias("n_commits"),
            "n_rows",
            "cents_total",
        )
        out = part if out is None else out.unionByName(part)
    for col, val in stats.items():
        out = out.withColumn(col, F.lit(val).cast("long"))
    return out


# ---------------------------------------------------------------------------
# Partition-spec evolution (Iceberg spec-id semantics from first principles)
# ---------------------------------------------------------------------------

_PE_CACHE: SessionCache = SessionCache()
_PE_CUTOFF = "2024-01-16"
_PE_LO, _PE_HI = "2024-01-12", "2024-01-22"


def _stage_partition_evolution(spark: SparkSession, sf_dir: str):
    """Stage events under TWO partition specs, Iceberg-style: history
    written under spec 0 (week-grain dirs, rows before _PE_CUTOFF),
    the live tail under spec 1 (day-grain dirs, rows on/after it) —
    the exact layout a table has after ALTER TABLE ... SET PARTITION
    SPEC. Returns (paths-by-spec manifest rows, files_total)."""
    import os

    key = _PE_CACHE.scoped_key(spark, sf_dir)
    cached = _PE_CACHE.get(key)
    if cached is not None:
        return cached
    e = load_table(spark, sf_dir, "events").select(
        "ts",
        "event_id",
        _cents("value").alias("cents"),
    )
    root = _tracked_mkdtemp(prefix="events_specevo_")
    old = e.filter(F.col("ts") < F.lit(_PE_CUTOFF).cast("timestamp"))
    new = e.filter(F.col("ts") >= F.lit(_PE_CUTOFF).cast("timestamp"))
    (
        old.withColumn(
            "pk", F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd")
        )
        .repartition("pk")
        .write.partitionBy("pk")
        .parquet(root + "/spec0")
    )
    (
        new.withColumn("pk", F.date_format("ts", "yyyy-MM-dd"))
        .repartition("pk")
        .write.partitionBy("pk")
        .parquet(root + "/spec1")
    )
    manifest = []  # (spec_id, part_lo_date, file_dir)
    for spec_id, grain_days in ((0, 7), (1, 1)):
        sdir = f"{root}/spec{spec_id}"
        for d in sorted(os.listdir(sdir)):
            if d.startswith("pk="):
                manifest.append((spec_id, d[3:], grain_days, f"{sdir}/{d}"))
    _PE_CACHE[key] = (manifest, len(manifest))
    return _PE_CACHE[key]


@query(
    "q_read_partition_evolution",
    oracle=f"""
    WITH f0 AS (
        SELECT DISTINCT date_trunc('week', CAST(ts AS DATE)) AS lo,
               date_trunc('week', CAST(ts AS DATE)) + INTERVAL 7 DAY AS hi
        FROM events WHERE ts < TIMESTAMP '{_PE_CUTOFF} 00:00:00'
    ),
    f1 AS (
        SELECT DISTINCT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS lo,
               CAST(CAST(ts AS DATE) AS TIMESTAMP) + INTERVAL 1 DAY AS hi
        FROM events WHERE ts >= TIMESTAMP '{_PE_CUTOFF} 00:00:00'
    ),
    files AS (SELECT * FROM f0 UNION ALL SELECT * FROM f1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS files_total FROM files),
    sc AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS files_scanned FROM files
        WHERE hi > TIMESTAMP '{_PE_LO} 00:00:00'
          AND lo < TIMESTAMP '{_PE_HI} 00:00:00'
    )
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_total,
           files_scanned, files_total
    FROM events, sc, tot
    WHERE ts >= TIMESTAMP '{_PE_LO} 00:00:00'
      AND ts < TIMESTAMP '{_PE_HI} 00:00:00'
    GROUP BY day, files_scanned, files_total
    ORDER BY day
    """,
    tags=("source", "maintenance", "manifest"),
)
def q_read_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-SPEC-EVOLUTION read — the Iceberg capability that
    separates real table formats from naive dir layouts: history
    written week-partitioned (spec 0), the live tail day-partitioned
    (spec 1, after the table's spec changed), and ONE query planned
    against both specs at once. Each manifest entry carries its
    spec_id, so pruning evaluates the SAME [lo,hi) interval test at
    each file's own grain (week files keep whole weeks, day files
    keep exact days) — a 10-day predicate straddling the cutoff scans
    2 week-files + 6 day-files of the 18 staged. Files are handed to
    spark.read by path (the unselected dirs are never listed or
    opened), the residual row predicate still applies post-scan, and
    files_scanned/files_total proof columns ride along; the oracle
    derives both file counts analytically from the unpruned table, so
    hash-equality proves spec-aware pruning lost nothing.

    100 TB shape: planning is manifest-grain (file count), the scan
    is 8/18ths of the table here and day-grain-tight on the tail —
    exactly why tables evolve to finer specs as they grow. No
    rewrite of historic data is ever needed: old files stay at their
    old grain, which is the entire point of spec evolution."""
    from datetime import date, timedelta

    manifest, files_total = _stage_partition_evolution(spark, sf_dir)
    lo = date.fromisoformat(_PE_LO)
    hi = date.fromisoformat(_PE_HI)
    paths = [
        path
        for (_spec, part, grain, path) in manifest
        if date.fromisoformat(part) + timedelta(days=grain) > lo
        and date.fromisoformat(part) < hi
    ]
    pruned = spark.read.parquet(*paths)
    return (
        pruned.filter(
            (F.col("ts") >= F.lit(_PE_LO).cast("timestamp"))
            & (F.col("ts") < F.lit(_PE_HI).cast("timestamp"))
        )
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("cents_total"),
        )
        .select(
            "day",
            "n_rows",
            "cents_total",
            F.lit(len(paths)).cast("long").alias("files_scanned"),
            F.lit(files_total).cast("long").alias("files_total"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Iceberg-v2 position deletes: merge-on-read via _metadata row_index
# ---------------------------------------------------------------------------

_PD_CACHE: SessionCache = SessionCache()
_PD_MOD = 37


def _stage_position_deletes(spark: SparkSession, sf_dir: str):
    """Write an Iceberg-v2-style POSITION DELETE file against the
    month-staged orders table: scan the real data files once, record
    (file_path, row_index) for every row matching the delete
    predicate (o_orderkey % _PD_MOD == 0) — exactly what an Iceberg
    delete writer persists. Returns (data_root, delete_dir,
    n_deleted)."""
    key = _PD_CACHE.scoped_key(spark, sf_dir)
    cached = _PD_CACHE.get(key)
    if cached is not None:
        return cached
    root, _manifest, _n = _stage_manifest_table(spark, sf_dir)
    ddir = _tracked_mkdtemp(prefix="orders_posdel_") + "/deletes"
    dels = (
        spark.read.parquet(root)
        .filter(F.col("o_orderkey") % _PD_MOD == 0)
        .select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.row_index").alias("pos"),
        )
    )
    dels.write.parquet(ddir)
    n_deleted = spark.read.parquet(ddir).count()
    _PD_CACHE[key] = (root, ddir, n_deleted)
    return _PD_CACHE[key]


@query(
    "q_read_position_deletes",
    oracle=f"""
    WITH nd AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_deleted FROM orders
        WHERE o_orderkey % {_PD_MOD} = 0
    )
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_live,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents_total,
           n_deleted
    FROM orders, nd
    WHERE o_orderkey % {_PD_MOD} <> 0
    GROUP BY month, n_deleted
    ORDER BY month
    """,
    tags=("source", "maintenance", "manifest"),
)
def q_read_position_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ with POSITION DELETE files — the Iceberg v2 /
    Delta deletion-vector mechanism, from first principles: deletes
    are never applied to data files; a side file of (file_path,
    row_index) tombstones is written by scanning the real files'
    `_metadata.row_index` (Spark's native parquet row-position
    column), and every read subtracts it with an anti join keyed on
    the PHYSICAL position — no data rewrite, O(deletes) extra I/O,
    exactly how row-level DELETE stays cheap on an immutable lake.
    The oracle recomputes the aggregate from the raw table under the
    same delete predicate, so hash-equality proves the position map
    is faithful row-for-row (a one-off tombstone position would
    surface as a cent-sum mismatch). n_deleted rides along as the
    proof column.

    100 TB shape: the tombstone join is broadcast here (deletes ≪
    data); at production delete volumes Iceberg partitions delete
    files BY DATA FILE so the anti join is file-local — same plan,
    partitioned key. Reads that predicate on untouched partitions
    never open a delete file at all (spec-grain pruning applies to
    tombstones too). Compaction (q_maintenance_compact) is the
    escape hatch when tombstones accumulate."""
    root, ddir, n_deleted = _stage_position_deletes(spark, sf_dir)
    base = spark.read.parquet(root).select(
        "month",
        "cents",
        F.col("_metadata.file_path").alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
    )
    dels = spark.read.parquet(ddir)
    live = base.join(F.broadcast(dels), ["file_path", "pos"], "left_anti")
    return (
        live.groupBy(F.col("month").cast("string").alias("month"))
        .agg(
            F.count("*").alias("n_live"),
            F.sum("cents").alias("cents_total"),
        )
        .select(
            "month",
            "n_live",
            "cents_total",
            F.lit(n_deleted).cast("long").alias("n_deleted"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Iceberg-v2 equality deletes (the key-predicate complement to positions)
# ---------------------------------------------------------------------------

_ED_CACHE: SessionCache = SessionCache()
_ED_MOD = 101


def _stage_equality_deletes(spark: SparkSession, sf_dir: str):
    """Write an Iceberg-v2 EQUALITY delete file against the
    month-staged orders table: a parquet of o_custkey VALUES (no
    positions — the delete applies wherever the key appears, which is
    what makes equality deletes cheap to write for CDC upserts).
    Returns (data_root, delete_dir, n_del_keys, n_del_rows)."""
    key = _ED_CACHE.scoped_key(spark, sf_dir)
    cached = _ED_CACHE.get(key)
    if cached is not None:
        return cached
    root, _manifest, _n = _stage_manifest_table(spark, sf_dir)
    ddir = _tracked_mkdtemp(prefix="orders_eqdel_") + "/deletes"
    base = spark.read.parquet(root)
    (
        base.filter(F.col("o_custkey") % _ED_MOD == 0)
        .select("o_custkey")
        .distinct()
        .write.parquet(ddir)
    )
    n_del_keys = spark.read.parquet(ddir).count()
    n_del_rows = base.filter(F.col("o_custkey") % _ED_MOD == 0).count()
    _ED_CACHE[key] = (root, ddir, n_del_keys, n_del_rows)
    return _ED_CACHE[key]


@query(
    "q_read_equality_deletes",
    oracle=f"""
    WITH nd AS (
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_del_keys,
               CAST(COUNT(*) AS BIGINT) AS n_del_rows
        FROM orders WHERE o_custkey % {_ED_MOD} = 0
    )
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_live,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents_total,
           n_del_keys, n_del_rows
    FROM orders, nd
    WHERE o_custkey % {_ED_MOD} <> 0
    GROUP BY month, n_del_keys, n_del_rows
    ORDER BY month
    """,
    tags=("source", "maintenance", "manifest"),
)
def q_read_equality_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ with EQUALITY delete files — Iceberg v2's second
    delete type and the one CDC writers actually emit (writing a key
    value is O(1); finding its positions would need a scan). The
    delete file lists o_custkey VALUES; every read anti-joins the
    data on the equality column. Together with
    q_read_position_deletes this completes the v2 row-level-delete
    story: equality deletes are cheap to WRITE and costlier to READ
    (the anti join keys on a data column, so it can't be file-local);
    position deletes are the opposite — and real compactors convert
    the former into the latter, exactly the trade the two keys'
    plans demonstrate side by side.

    100 TB shape: the delete-key frame is broadcast while small (CDC
    batches); at large delete volumes the anti join shuffles on the
    equality column like any join — which is WHY Iceberg compacts
    equality deletes into position deletes as they age. Proof
    columns: n_del_keys (file contents) and n_del_rows (rows
    suppressed), both oracle-recomputed from the raw table."""
    root, ddir, n_del_keys, n_del_rows = _stage_equality_deletes(
        spark, sf_dir
    )
    base = spark.read.parquet(root)
    dels = spark.read.parquet(ddir)
    live = base.join(F.broadcast(dels), "o_custkey", "left_anti")
    return (
        live.groupBy(F.col("month").cast("string").alias("month"))
        .agg(
            F.count("*").alias("n_live"),
            F.sum("cents").alias("cents_total"),
        )
        .select(
            "month",
            "n_live",
            "cents_total",
            F.lit(n_del_keys).cast("long").alias("n_del_keys"),
            F.lit(n_del_rows).cast("long").alias("n_del_rows"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Incremental scan between snapshots (the CDC read of the commit log)
# ---------------------------------------------------------------------------


@query(
    "q_read_incremental_scan",
    oracle=f"""
    WITH g AS (
        SELECT o_orderkey % {SNAP_GROUPS} AS commit_id,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    )
    SELECT CAST(commit_id AS BIGINT) AS commit_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents_total
    FROM g WHERE commit_id >= {SNAP_PIN}
    GROUP BY commit_id ORDER BY commit_id
    """,
    tags=("source", "maintenance", "manifest"),
)
def q_read_incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL scan between two snapshots — the Iceberg
    incremental-read / Delta CDF consumption pattern that turns a
    table into a change feed: everything q_read_snapshot_isolation's
    pinned reader has NOT yet seen, i.e. exactly the commits in
    (SNAP_PIN, head], resolved as a commit-log RANGE filter and read
    per commit (the consumer's natural batch grain). Together the two
    keys are the complete catch-up protocol: bootstrap from the
    snapshot, then consume increments — with the guarantee that
    snapshot ∪ increments = head with no overlap, which the oracle's
    partition of the raw table enforces by hash.

    100 TB shape: planning is a metadata-grain prefix/range filter on
    the commit log; the scan reads ONLY the delta commits' files —
    incremental consumers never rescan history, which is the entire
    point. Per-commit output preserves the consumer's exactly-once
    batch boundary."""
    data, man = _stage_committed_table(spark, sf_dir)
    log = spark.read.parquet(man)
    delta = log.filter(F.col("commit_id") >= SNAP_PIN).collect()
    frames = []
    for r in sorted(delta, key=lambda r: r.commit_id):
        t = spark.read.option("basePath", data).parquet(r.path)
        frames.append(
            t.agg(
                F.count("*").alias("n_rows"),
                F.sum("cents").alias("cents_total"),
            ).select(
                F.lit(r.commit_id).cast("long").alias("commit_id"),
                "n_rows",
                "cents_total",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("commit_id")


# ---------------------------------------------------------------------------
# MERGE INTO as ONE atomic manifest commit (updates + deletes + inserts)
# ---------------------------------------------------------------------------

_MERGE_CACHE: SessionCache = SessionCache()
_MERGE_MOD = 7  # source batch: ~1/7 updated, ~1/7 deleted, ~1/7 inserted
_MERGE_BUMP = 1000  # cents added by the update branch


def _stage_merge_commit(spark: SparkSession, sf_dir: str):
    """Apply a MERGE INTO source batch against the manifest-committed
    orders table as ONE atomic commit, Iceberg-MoR style: the commit
    consists of exactly one new DATA file (the updated row images plus
    the brand-new inserts), one EQUALITY-DELETE file (the keys whose
    old images must disappear — every updated key and every deleted
    key), and one MANIFEST row binding both under the next commit_id.
    Nothing in the base table is rewritten. The merge manifest lives
    in its OWN directory so the base table's commit log (shared with
    the snapshot/incremental keys) is untouched; a reader's version is
    the union of manifest dirs it consults — consulting only the base
    log IS the pre-merge pin.

    Source batch (deterministic from the table itself): keys with
    o_orderkey % 7 == 1 are UPDATEd (cents + 1000), == 2 are DELETEd,
    and for every key % 7 == 3 a new row with key -o_orderkey (the
    negative range is provably vacant) is INSERTed at the old cents.

    Returns (data_root, base_manifest, merge_dir, n_updated,
    n_deleted, n_inserted) where merge_dir holds data/, deletes/ and
    manifest/."""
    import os

    key = _MERGE_CACHE.scoped_key(spark, sf_dir)
    cached = _MERGE_CACHE.get(key)
    if cached is not None:
        return cached
    data, man = _stage_committed_table(spark, sf_dir)
    mdir = _tracked_mkdtemp(prefix="orders_merge_")
    base = merge_read(spark, data, man, None).localCheckpoint()
    mod = F.col("o_orderkey") % _MERGE_MOD
    upserts = (
        base.filter(mod == 1)
        .select("o_orderkey", (F.col("cents") + _MERGE_BUMP).alias("cents"))
        .unionByName(
            base.filter(mod == 3).select(
                (-F.col("o_orderkey")).alias("o_orderkey"), "cents"
            )
        )
    )
    upserts.coalesce(1).write.parquet(mdir + "/data")
    dels = base.filter((mod == 1) | (mod == 2)).select("o_orderkey")
    dels.coalesce(1).write.parquet(mdir + "/deletes")
    n_updated = base.filter(mod == 1).count()
    n_deleted = base.filter(mod == 2).count()
    n_inserted = base.filter(mod == 3).count()
    # the ATOMIC step: data + delete files durable FIRST, then one
    # manifest row makes the whole merge visible at once (the
    # torn-write test pins that without this row readers see the
    # exact pre-merge table)
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(mdir + "/manifest", exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "commit_id": pa.array([SNAP_GROUPS], pa.int64()),
                "data_path": pa.array([mdir + "/data"], pa.string()),
                "delete_path": pa.array([mdir + "/deletes"], pa.string()),
            }
        ),
        mdir + "/manifest/commit.parquet",
    )
    _MERGE_CACHE[key] = (
        data, man, mdir, n_updated, n_deleted, n_inserted,
    )
    return _MERGE_CACHE[key]


def merge_read(
    spark: SparkSession, data: str, man: str, merge_manifest: str | None
) -> DataFrame:
    """Read the merged table at a manifest pin: the base commit log
    plus, when ``merge_manifest`` is given, the merge commit's delete
    file (anti-joined on the equality key) and data file (unioned in).
    With merge_manifest=None — or a manifest directory holding no
    committed row yet (the torn-write window: data + delete files
    durable, manifest append not) — this is the exact pre-merge
    table: the reader plans from the MANIFEST, never the directory."""
    import os

    log = spark.read.parquet(man)
    paths = sorted(r.path for r in log.select("path").collect())
    base = spark.read.option("basePath", data).parquet(*paths).select(
        "o_orderkey", "cents"
    )
    if merge_manifest is not None and (
        not os.path.isdir(merge_manifest)
        or not any(
            f.endswith(".parquet") and not f.startswith(".")
            for f in os.listdir(merge_manifest)
        )
    ):
        merge_manifest = None
    if merge_manifest is None:
        return base
    mrow = spark.read.parquet(merge_manifest).collect()[0]
    dels = spark.read.parquet(mrow.delete_path)
    adds = spark.read.parquet(mrow.data_path).select("o_orderkey", "cents")
    return base.join(
        F.broadcast(dels), "o_orderkey", "left_anti"
    ).unionByName(adds)


@query(
    "q_table_merge_into",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey AS k,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    counts AS (
        SELECT CAST(SUM(CASE WHEN k % {_MERGE_MOD} = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_updated,
               CAST(SUM(CASE WHEN k % {_MERGE_MOD} = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_deleted,
               CAST(SUM(CASE WHEN k % {_MERGE_MOD} = 3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_inserted
        FROM base
    ),
    post_rows AS (
        SELECT k, CASE WHEN k % {_MERGE_MOD} = 1
                       THEN cents + {_MERGE_BUMP} ELSE cents END AS cents
        FROM base WHERE k % {_MERGE_MOD} <> 2
        UNION ALL
        SELECT -k, cents FROM base WHERE k % {_MERGE_MOD} = 3
    ),
    versions AS (
        SELECT 'pre' AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS cents_total FROM base
        UNION ALL
        SELECT 'post', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(cents) AS BIGINT) FROM post_rows
    )
    SELECT version, n_rows, cents_total, n_updated, n_deleted, n_inserted
    FROM versions, counts ORDER BY version
    """,
    tags=("source", "maintenance", "manifest"),
)
def q_table_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as ONE atomic manifest commit — the unification of
    the upsert, v2-delete and transactional-commit keys (r9 ask #2):
    a CDC source batch of updates + deletes + inserts lands as exactly
    one data file, one equality-delete file, and one manifest row, and
    BOTH table versions stay serveable — the reader pinned before the
    merge commit sees the untouched base table, the reader at head
    sees every branch of the merge applied, and the two are served
    from the same immutable files (no rewrite, merge-on-read). Proof
    columns n_updated / n_deleted / n_inserted count the three merge
    branches; the oracle recomputes both versions and the counts from
    the raw table, so a merge that double-applied a branch, leaked a
    pre-image, or lost an insert hash-fails. Atomicity is pinned by
    tests/test_streaming.py: with the merge's data and delete files
    durable but the manifest row absent, the pre-merge read is
    bit-identical — the commit IS the manifest row.

    100 TB shape: MERGE cost is O(source batch) writes + one metadata
    row — never a base-table rewrite; the post-merge read adds one
    broadcast anti join (delete keys ≪ data) and a union of the new
    file, the standard MoR read amplification that
    q_maintenance_delete_compaction later repays."""
    data, man, mdir, n_upd, n_del, n_ins = _stage_merge_commit(
        spark, sf_dir
    )

    def agg(label: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("cents_total"),
        ).select(
            F.lit(label).alias("version"),
            "n_rows",
            "cents_total",
            F.lit(n_upd).cast("long").alias("n_updated"),
            F.lit(n_del).cast("long").alias("n_deleted"),
            F.lit(n_ins).cast("long").alias("n_inserted"),
        )

    pre = agg("pre", merge_read(spark, data, man, None))
    post = agg("post", merge_read(spark, data, man, mdir + "/manifest"))
    return pre.unionByName(post).orderBy("version")


# ---------------------------------------------------------------------------
# Delete compaction: equality deletes -> position deletes (v2 maintenance)
# ---------------------------------------------------------------------------

_DC_CACHE: SessionCache = SessionCache()


def _stage_delete_compaction(spark: SparkSession, sf_dir: str):
    """Run the equality→position delete compaction that real v2
    compactors perform as equality deletes age: scan the data ONCE,
    resolve every equality key (o_custkey % _ED_MOD == 0, the file
    q_read_equality_deletes serves) to its physical (file_path,
    row_index) tombstones via Spark's native `_metadata` columns,
    write them as a position-delete file, and drop the equality file
    from the live delete set. Returns (data_root, posdel_dir,
    n_eq_keys_in, n_pos_rows_out, n_files_touched, n_files_total)."""
    import os

    key = _DC_CACHE.scoped_key(spark, sf_dir)
    cached = _DC_CACHE.get(key)
    if cached is not None:
        return cached
    root, eq_dir, n_eq_keys, _n_del_rows = _stage_equality_deletes(
        spark, sf_dir
    )
    pdir = _tracked_mkdtemp(prefix="orders_delcompact_") + "/pos_deletes"
    base = spark.read.parquet(root).select(
        "o_custkey",
        F.col("_metadata.file_path").alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
    )
    eq = spark.read.parquet(eq_dir)
    resolved = base.join(F.broadcast(eq), "o_custkey", "left_semi").select(
        "file_path", "pos"
    )
    # position deletes are written CLUSTERED BY DATA FILE — that is
    # what makes the post-compaction read file-local
    resolved.repartition("file_path").write.parquet(pdir)
    pos = spark.read.parquet(pdir)
    n_pos_rows = pos.count()
    n_files_touched = pos.select("file_path").distinct().count()
    n_files_total = sum(
        1
        for d in os.listdir(root)
        if d.startswith("month=")
        for f in os.listdir(os.path.join(root, d))
        if f.endswith(".parquet") and not f.startswith(".")
    )
    _DC_CACHE[key] = (
        root, pdir, n_eq_keys, n_pos_rows, n_files_touched, n_files_total,
    )
    return _DC_CACHE[key]


@query(
    "q_maintenance_delete_compaction",
    oracle=f"""
    WITH nd AS (
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_eq_keys_in,
               CAST(COUNT(*) AS BIGINT) AS n_pos_rows_out,
               CAST(COUNT(DISTINCT strftime(o_orderdate, '%Y-%m'))
                    AS BIGINT) AS n_files_touched
        FROM orders WHERE o_custkey % {_ED_MOD} = 0
    ),
    ft AS (
        SELECT CAST(COUNT(DISTINCT strftime(o_orderdate, '%Y-%m'))
                    AS BIGINT) AS n_files_total
        FROM orders
    )
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_live,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents_total,
           n_eq_keys_in, n_pos_rows_out, n_files_touched, n_files_total
    FROM orders, nd, ft
    WHERE o_custkey % {_ED_MOD} <> 0
    GROUP BY month, n_eq_keys_in, n_pos_rows_out, n_files_touched,
             n_files_total
    ORDER BY month
    """,
    tags=("source", "maintenance", "manifest"),
)
def q_maintenance_delete_compaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DELETE COMPACTION, equality → position (r9 ask #3): the
    maintenance pass that repays q_read_equality_deletes' read debt.
    Equality deletes are O(1) to write but every reader of every file
    must probe the whole key list on a DATA column; this pass scans
    the table once, resolves each key to physical (file_path,
    row_index) tombstones, writes them clustered by data file, and
    retires the equality file. The served aggregate is computed from
    the POSITION deletes only, and the oracle recomputes it from the
    raw table under the original equality predicate — hash-equality
    is the read-equivalence proof (a tombstone pointing at the wrong
    row flips a cent-sum). Proof columns: n_eq_keys_in (keys
    consumed), n_pos_rows_out (tombstones emitted — the key↦row
    fan-out), n_files_touched / n_files_total (the post-compaction
    read is file-local: files with no tombstones never open a delete
    file, which tests/test_new_key_invariants.py pins alongside
    pre/post read-set equality).

    100 TB shape: the resolve pass is one scan + broadcast semi-join
    (key list ≪ data) with NO shuffle of data rows; the tombstone
    write shuffles only the matched (file, pos) pairs, clustered by
    file so a reader's anti join partitions file-locally. Run it on
    the cadence at which CDC equality files accumulate — the
    compactor amortizes its single scan against every future read."""
    root, pdir, n_keys, n_pos, n_touched, n_total = (
        _stage_delete_compaction(spark, sf_dir)
    )
    base = spark.read.parquet(root).select(
        "month",
        "cents",
        F.col("_metadata.file_path").alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
    )
    pos = spark.read.parquet(pdir)
    live = base.join(F.broadcast(pos), ["file_path", "pos"], "left_anti")
    return (
        live.groupBy(F.col("month").cast("string").alias("month"))
        .agg(
            F.count("*").alias("n_live"),
            F.sum("cents").alias("cents_total"),
        )
        .select(
            "month",
            "n_live",
            "cents_total",
            F.lit(n_keys).cast("long").alias("n_eq_keys_in"),
            F.lit(n_pos).cast("long").alias("n_pos_rows_out"),
            F.lit(n_touched).cast("long").alias("n_files_touched"),
            F.lit(n_total).cast("long").alias("n_files_total"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Snapshot expiry + orphan-file GC (Iceberg expireSnapshots /
# deleteOrphanFiles semantics from first principles)
# ---------------------------------------------------------------------------

# CONSUMED-FIXTURE CONTRACT: q_maintenance_expire_snapshots physically
# deletes (rmtree) the data files of expired snapshots from this staged
# directory as part of its GC semantics, and the staging is
# session-cached — so after that key has run once in a session, the f0/
# f1 pre-compaction DATA files are gone while the manifests still list
# them for historical snapshots. Any future key sharing _EXPIRE_CACHE
# must read through the MANIFESTS of retained snapshots only (or
# re-stage into its own cache) — never the expired snapshots' data
# paths, whose presence depends on execution order within the session.
_EXPIRE_CACHE: SessionCache = SessionCache()
EXP_SLICES = 4  # o_orderkey % EXP_SLICES partitions the base table
EXP_RETAIN = 2  # retention policy: keep the newest 2 snapshots


def _stage_expire_table(spark: SparkSession, sf_dir: str):
    """Stage a committed table whose history makes GC non-trivial:
    appends f0, f1 → a COMPACTION rewriting both into C → appends f2,
    f3.  Snapshot manifests are COMPLETE file lists (the Iceberg
    model), and the file-stats manifest carries per-file row counts
    and cents (the column stats real manifests embed) so expiry can
    plan without touching data.

    snapshots: s0={f0} s1={f0,f1} s2={C} s3={C,f2} s4={C,f2,f3}."""
    import os

    key = _EXPIRE_CACHE.scoped_key(spark, sf_dir)
    cached = _EXPIRE_CACHE.get(key)
    if cached is not None:
        return cached
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = _tracked_mkdtemp(prefix="orders_expire_")
    data = os.path.join(base, "data")
    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            (F.col("o_orderkey") % EXP_SLICES).alias("sl"),
            _cents("o_totalprice").alias("cents"),
        )
        .localCheckpoint()
    )
    members = {
        "f0": [0],
        "f1": [1],
        "C": [0, 1],
        "f2": [2],
        "f3": [3],
    }
    stats = []
    for fid, slices in members.items():
        path = os.path.join(data, fid)
        part = o.filter(F.col("sl").isin(slices)).select("cents")
        part.coalesce(1).write.parquet(path)
        agg = part.agg(
            F.count("*").alias("n"), F.sum("cents").alias("c")
        ).collect()[0]
        stats.append((fid, path, int(agg.n), int(agg.c)))
    pq.write_table(
        pa.table(
            {
                "file_id": pa.array([s[0] for s in stats], pa.string()),
                "path": pa.array([s[1] for s in stats], pa.string()),
                "n_rows": pa.array([s[2] for s in stats], pa.int64()),
                "cents": pa.array([s[3] for s in stats], pa.int64()),
            }
        ),
        os.path.join(base, "files.parquet"),
    )
    snapshots = [
        (0, "f0"),
        (1, "f0"), (1, "f1"),
        (2, "C"),
        (3, "C"), (3, "f2"),
        (4, "C"), (4, "f2"), (4, "f3"),
    ]
    pq.write_table(
        pa.table(
            {
                "snapshot_id": pa.array([s[0] for s in snapshots], pa.int64()),
                "file_id": pa.array([s[1] for s in snapshots], pa.string()),
            }
        ),
        os.path.join(base, "snapshots.parquet"),
    )
    _EXPIRE_CACHE[key] = base
    return base


@query(
    "q_maintenance_expire_snapshots",
    oracle=f"""
    WITH s AS (
        SELECT o_orderkey % {EXP_SLICES} AS sl,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS c
        FROM s
    ),
    old AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS c
        FROM s WHERE sl IN (0, 1)
    )
    SELECT 'live' AS category, CAST(3 AS BIGINT) AS n_files,
           tot.n AS n_rows, tot.c AS cents_total,
           CAST(5 AS BIGINT) AS n_snapshots_total,
           CAST(3 AS BIGINT) AS n_snapshots_expired
    FROM tot
    UNION ALL
    SELECT 'deletable', CAST(2 AS BIGINT), old.n, old.c,
           CAST(5 AS BIGINT), CAST(3 AS BIGINT)
    FROM old
    UNION ALL
    SELECT 'head_scan_post_gc', CAST(3 AS BIGINT), tot.n, tot.c,
           CAST(5 AS BIGINT), CAST(3 AS BIGINT)
    FROM tot
    """,
    tags=("source", "maintenance", "manifest"),
)
def q_maintenance_expire_snapshots(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Snapshot expiry + orphan-file GC — the LAST lifecycle stage of
    the manifest-committed table family (commit → snapshot read →
    compaction → delete compaction → EXPIRY): retain the newest
    EXP_RETAIN snapshots, drop the rest from the log, and a file
    becomes deletable iff NO retained snapshot references it.  On the
    staged history (appends f0,f1 → compaction C → appends f2,f3) the
    originals f0,f1 are reclaimed while C,f2,f3 stay live — the exact
    reclaim pattern after a compaction ages out of retention.  Expiry
    plans ENTIRELY from manifest metadata (per-file stats rows — GC
    never opens a data file); the deletable files are then physically
    removed and the head snapshot is re-scanned, proving the GC took
    nothing a live reader needs: its rows+cents hash-match the raw
    table via the oracle.

    Parity: Iceberg `expireSnapshots().retainLast(2)` +
    `deleteOrphanFiles` (reference lambda/main.py has no table
    maintenance; [EXT] scale surface).  100 TB shape: planning is a
    set-difference over the snapshot⋈file manifest (metadata grain,
    KB-scale); the only data touched is the verify scan a reader pays
    anyway."""
    import os
    import shutil

    base = _stage_expire_table(spark, sf_dir)
    snaps = spark.read.parquet(os.path.join(base, "snapshots.parquet"))
    files = spark.read.parquet(os.path.join(base, "files.parquet"))
    max_snap = snaps.agg(F.max("snapshot_id")).collect()[0][0]
    cutoff = max_snap - EXP_RETAIN + 1
    live_ids = snaps.filter(F.col("snapshot_id") >= cutoff).select(
        "file_id"
    ).distinct()
    n_snapshots = snaps.select("snapshot_id").distinct().count()

    live = files.join(F.broadcast(live_ids), "file_id")
    deletable = files.join(F.broadcast(live_ids), "file_id", "left_anti")

    # physical GC (idempotent — staging is session-cached)
    for r in deletable.select("path").collect():
        if os.path.exists(r.path):
            shutil.rmtree(r.path)

    head_paths = sorted(
        r.path
        for r in files.join(
            F.broadcast(
                snaps.filter(F.col("snapshot_id") == max_snap).select(
                    "file_id"
                )
            ),
            "file_id",
        )
        .select("path")
        .collect()
    )
    consts = [
        F.lit(n_snapshots).cast("long").alias("n_snapshots_total"),
        F.lit(int(cutoff)).cast("long").alias("n_snapshots_expired"),
    ]

    def meta_row(label: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("n_rows").alias("n_rows"),
            F.sum("cents").alias("cents_total"),
        ).select(F.lit(label).alias("category"), "n_files", "n_rows",
                 "cents_total", *consts)

    head_scan = (
        spark.read.parquet(*head_paths)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("cents_total"),
        )
        .select(
            F.lit("head_scan_post_gc").alias("category"),
            F.lit(len(head_paths)).cast("long").alias("n_files"),
            "n_rows",
            "cents_total",
            *consts,
        )
    )
    return meta_row("live", live).union(meta_row("deletable", deletable)).union(
        head_scan
    )


# ---------------------------------------------------------------------------
# Write-audit-publish (WAP): branch-staged commits gated by data-quality
# audits (the Netflix/Iceberg WAP pattern from first principles)
# ---------------------------------------------------------------------------

_WAP_CACHE: SessionCache = SessionCache()
WAP_SLICES = 4  # o_orderkey % WAP_SLICES


def _stage_wap_table(spark: SparkSession, sf_dir: str):
    """Stage the WAP fixture: a published base (slices 0,1), a CLEAN
    incoming batch (slice 2), and a CORRUPT batch (slice 1 again — its
    keys all collide with the base, the classic double-delivery
    replay).  All three land as data files plus an audit-branch
    manifest; nothing is on the main branch but the base."""
    import os

    key = _WAP_CACHE.scoped_key(spark, sf_dir)
    cached = _WAP_CACHE.get(key)
    if cached is not None:
        return cached
    base = _tracked_mkdtemp(prefix="orders_wap_")
    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            (F.col("o_orderkey") % WAP_SLICES).alias("sl"),
            _cents("o_totalprice").alias("cents"),
        )
        .localCheckpoint()
    )
    members = {
        "base": [0, 1],
        "batch_clean": [2],
        "batch_corrupt": [1],
    }
    paths = {}
    for fid, slices in members.items():
        path = os.path.join(base, "data", fid)
        o.filter(F.col("sl").isin(slices)).select(
            "o_orderkey", "cents"
        ).coalesce(1).write.parquet(path)
        paths[fid] = path
    _WAP_CACHE[key] = (base, paths)
    return _WAP_CACHE[key]


@query(
    "q_table_wap_publish",
    oracle=f"""
    WITH s AS (
        SELECT o_orderkey % {WAP_SLICES} AS sl,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    per AS (
        SELECT sl, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS c
        FROM s GROUP BY sl
    ),
    base AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS c
        FROM per WHERE sl IN (0, 1)
    ),
    b1 AS (SELECT n, c FROM per WHERE sl = 1),
    b2 AS (SELECT n, c FROM per WHERE sl = 2)
    SELECT 'base' AS category, base.n AS n_rows,
           CAST(0 AS BIGINT) AS n_dup_keys, base.c AS cents_total,
           TRUE AS published
    FROM base
    UNION ALL
    SELECT 'batch_clean', b2.n, CAST(0 AS BIGINT), b2.c, TRUE FROM b2
    UNION ALL
    SELECT 'batch_corrupt', b1.n, b1.n, b1.c, FALSE FROM b1
    UNION ALL
    SELECT 'main_after', base.n + b2.n, CAST(0 AS BIGINT),
           base.c + b2.c, TRUE
    FROM base, b2
    """,
    tags=("source", "maintenance", "manifest"),
)
def q_table_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish — the deployment gate real lakehouse
    pipelines put in front of every commit (Iceberg WAP branches /
    Delta CDF staging): incoming batches land on an AUDIT branch,
    data-quality checks run against the staged files, and only a
    passing batch's manifest entry is promoted to main — a
    metadata-only pointer move, never a data rewrite.  The fixture
    replays the classic failure: a clean append (publishes) and a
    double-delivered batch whose every key already exists in the base
    (audit counts the collisions via a key anti-join and quarantines
    it).  The final row re-reads the MAIN branch after the decisions
    and hash-matches base+clean recomputed from the raw table —
    proving the corrupt batch is invisible to readers while its file
    sits intact on the audit branch for forensics.

    100 TB shape: the duplicate-key audit is one broadcast/shuffle
    semi-join between the batch and the published key set (at real
    scale, a bloom-filter or manifest min-max prescan bounds it);
    publish/reject are O(1) manifest writes.  Completes the commit
    lifecycle: WAP gate → snapshot reads → compaction → expiry."""
    import os

    root, paths = _stage_wap_table(spark, sf_dir)
    base_df = spark.read.parquet(paths["base"])
    base_keys = base_df.select("o_orderkey")
    published = [("base", paths["base"])]
    report = []

    def stats(df: DataFrame):
        r = df.agg(
            F.count("*").alias("n"), F.sum("cents").alias("c")
        ).collect()[0]
        return int(r.n), int(r.c)

    bn, bc = stats(base_df)
    report.append(("base", bn, 0, bc, True))
    for batch in ("batch_clean", "batch_corrupt"):
        bdf = spark.read.parquet(paths[batch])
        n, c = stats(bdf)
        n_dup = bdf.join(F.broadcast(base_keys), "o_orderkey", "semi").count()
        ok = n > 0 and n_dup == 0
        if ok:
            published.append((batch, paths[batch]))
        report.append((batch, n, n_dup, c, ok))

    main_after = spark.read.parquet(*[p for _, p in published])
    mn, mc = stats(main_after)
    report.append(("main_after", mn, 0, mc, True))
    return spark.createDataFrame(
        report,
        "category string, n_rows long, n_dup_keys long, "
        "cents_total long, published boolean",
    )


@query(
    "q_meta_snapshot_changelog",
    oracle=f"""
    WITH s AS (
        SELECT o_orderkey % {EXP_SLICES} AS sl,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    per AS (
        SELECT sl, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS c
        FROM s GROUP BY sl
    ),
    sl01 AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS c
        FROM per WHERE sl IN (0, 1)
    ),
    sl0 AS (SELECT n, c FROM per WHERE sl = 0),
    sl2 AS (SELECT n, c FROM per WHERE sl = 2),
    sl3 AS (SELECT n, c FROM per WHERE sl = 3)
    SELECT CAST(0 AS BIGINT) AS snapshot_id, CAST(1 AS BIGINT) AS n_files,
           sl0.n AS n_rows, sl0.c AS cents_total,
           CAST(1 AS BIGINT) AS n_added, CAST(0 AS BIGINT) AS n_removed
    FROM sl0
    UNION ALL
    SELECT 1, 2, sl01.n, sl01.c, 1, 0 FROM sl01
    UNION ALL
    SELECT 2, 1, sl01.n, sl01.c, 1, 2 FROM sl01
    UNION ALL
    SELECT 3, 2, sl01.n + sl2.n, sl01.c + sl2.c, 1, 0 FROM sl01, sl2
    UNION ALL
    SELECT 4, 3, sl01.n + sl2.n + sl3.n, sl01.c + sl2.c + sl3.c, 1, 0
    FROM sl01, sl2, sl3
    """,
    tags=("source", "maintenance", "manifest"),
)
def q_meta_snapshot_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The table-history METADATA TABLE (Iceberg `table.snapshots` /
    Delta `DESCRIBE HISTORY`) computed purely from manifests: per
    snapshot, the live file count, exact row/cents totals read from
    the per-file manifest STATS (no data file is ever opened — the
    compaction snapshot s2 proves it, reporting identical rows across
    a 2-file → 1-file rewrite), and the commit's churn as
    added/removed file counts from consecutive-snapshot anti-joins.
    This is the audit surface operators read before trusting a table:
    unexpected n_removed spikes mean rewrites, row-count regressions
    mean a bad commit.

    Shares the q_maintenance_expire_snapshots fixture (appends →
    compaction → appends) and is immune to its physical GC because it
    touches only metadata.  100 TB shape: everything runs on the
    snapshot⋈file manifest (KB grain) — two broadcast anti-joins and
    one agg, independent of table size."""
    import os

    base = _stage_expire_table(spark, sf_dir)
    snaps = spark.read.parquet(os.path.join(base, "snapshots.parquet"))
    files = spark.read.parquet(os.path.join(base, "files.parquet"))
    per_snap = (
        snaps.join(F.broadcast(files), "file_id")
        .groupBy("snapshot_id")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("n_rows").alias("n_rows"),
            F.sum("cents").alias("cents_total"),
        )
    )
    cur = snaps.select("snapshot_id", "file_id")
    prev = cur.select(
        (F.col("snapshot_id") + 1).alias("snapshot_id"), "file_id"
    )
    sids = snaps.select("snapshot_id").distinct()
    added = (
        cur.join(prev, ["snapshot_id", "file_id"], "left_anti")
        .groupBy("snapshot_id")
        .agg(F.count("*").alias("n_added"))
    )
    removed = (
        prev.join(F.broadcast(sids), "snapshot_id")  # drop the max+1 ghost
        .join(cur, ["snapshot_id", "file_id"], "left_anti")
        .groupBy("snapshot_id")
        .agg(F.count("*").alias("n_removed"))
    )
    return (
        per_snap.join(added, "snapshot_id", "left")
        .join(removed, "snapshot_id", "left")
        .select(
            "snapshot_id",
            "n_files",
            "n_rows",
            "cents_total",
            F.coalesce("n_added", F.lit(0)).cast("long").alias("n_added"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        )
    )


@query(
    "q_read_changelog_cdc",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey AS k,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    upd AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
        FROM base WHERE k % {_MERGE_MOD} = 1
    ),
    del_ AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
        FROM base WHERE k % {_MERGE_MOD} = 2
    ),
    ins AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
        FROM base WHERE k % {_MERGE_MOD} = 3
    )
    SELECT 'delete' AS change_type, del_.n AS n_rows,
           del_.s AS cents_before, CAST(0 AS BIGINT) AS cents_after,
           CAST(-del_.s AS BIGINT) AS net_cents
    FROM del_
    UNION ALL
    SELECT 'insert', ins.n, CAST(0 AS BIGINT), ins.s, ins.s FROM ins
    UNION ALL
    SELECT 'update', upd.n, upd.s,
           upd.s + upd.n * {_MERGE_BUMP},
           upd.n * {_MERGE_BUMP}
    FROM upd
    """,
    tags=("source", "maintenance", "manifest"),
)
def q_read_changelog_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog read between two table versions (Iceberg
    changelog scan / Delta Change Data Feed) — the incremental-
    consumption pattern that feeds downstream materializations without
    rescanning the table: the change set is derived from the MERGE
    COMMIT'S OWN FILES (its equality-delete file D and data file A),
    never by diffing two full snapshots — updated keys are D ∩
    keys(A), pure deletes D \\ keys(A), pure inserts keys(A) \\ D; only
    the pre-images of affected keys touch the base table, via one
    broadcast semi-join.  Emits per change type the row count and the
    exact cents before/after/net — the oracle recomputes all three
    branches from the raw table, so a changelog that misclassified an
    update as delete+insert (the classic CDF bug) hash-fails on the
    net column.

    Shares q_table_merge_into's fixture and completes its story: the
    merge WRITES one commit; this key READS that commit back as
    change rows.  100 TB shape: cost is O(commit files) + one
    broadcast semi-join for pre-images — independent of table size."""
    data, man, mdir, n_upd, n_del, n_ins = _stage_merge_commit(spark, sf_dir)
    dels = spark.read.parquet(mdir + "/deletes")  # affected keys
    adds = spark.read.parquet(mdir + "/data")  # updated images + inserts
    base = merge_read(spark, data, man, None)
    pre_imgs = base.join(F.broadcast(dels), "o_orderkey", "semi")
    add_keys = adds.select("o_orderkey")
    upd = pre_imgs.join(
        adds.select("o_orderkey", F.col("cents").alias("after")),
        "o_orderkey",
    )
    del_rows = pre_imgs.join(F.broadcast(add_keys), "o_orderkey", "left_anti")
    ins_rows = adds.join(F.broadcast(dels), "o_orderkey", "left_anti")

    deleted = del_rows.agg(
        F.count("*").alias("n_rows"),
        F.sum("cents").alias("cents_before"),
    ).select(
        F.lit("delete").alias("change_type"),
        "n_rows",
        "cents_before",
        F.lit(0).cast("long").alias("cents_after"),
        (-F.col("cents_before")).alias("net_cents"),
    )
    inserted = ins_rows.agg(
        F.count("*").alias("n_rows"),
        F.sum("cents").alias("cents_after"),
    ).select(
        F.lit("insert").alias("change_type"),
        "n_rows",
        F.lit(0).cast("long").alias("cents_before"),
        "cents_after",
        F.col("cents_after").alias("net_cents"),
    )
    updated = upd.agg(
        F.count("*").alias("n_rows"),
        F.sum("cents").alias("cents_before"),
        F.sum("after").alias("cents_after"),
    ).select(
        F.lit("update").alias("change_type"),
        "n_rows",
        "cents_before",
        "cents_after",
        (F.col("cents_after") - F.col("cents_before")).alias("net_cents"),
    )
    return deleted.unionByName(inserted).unionByName(updated)


# ---------------------------------------------------------------------------
# Optimistic-concurrency commit conflict (Iceberg/Delta commit validation
# from first principles): two writers off one base snapshot — rebase the
# disjoint one, abort the overlapping one
# ---------------------------------------------------------------------------

_CONFLICT_CACHE: SessionCache = SessionCache()
CC_SLICES = 4  # o_orderkey % CC_SLICES partitions the table into files


def _stage_conflict_scenario(spark: SparkSession, sf_dir: str):
    """Stage the full two-writer optimistic-concurrency scenario ONCE
    per (session, sf) and cache the resulting artifacts — the staging
    is the TRANSACTION SCRIPT, so it must not replay on a second call:

    commits 0..3: base table, one file per o_orderkey%4 slice, each
      commit-log entry carrying (commit_id, adds, removes, slice) —
      the key-range metadata every real manifest embeds and the ONLY
      thing conflict validation reads.
    writer A  (base snapshot 3, touches slice 1): rewrites f1 at
      cents*105 div 100, validates an EMPTY log suffix, commits -> 4.
    writer B1 (base snapshot 3, touches slice 3): rewrites f3 at
      cents*110 div 100; validation sees suffix {4} touching slice 1
      — DISJOINT from {3} — so it REBASES (its data file is still
      valid; only the base pointer moves) and commits -> 5.
    writer B2 (base snapshot 3, touches slice 1): rewrites the
      ORIGINAL f1 at cents*120 div 100; validation sees suffix {4,5}
      touching {1,3} — commit 4 REPLACED the very file B2 read — so
      it ABORTS. Its staged file stays on disk as an orphan the
      manifest never lists (q_maintenance_orphan_audit's GC class).

    Returns (data_dir, manifest_dir, per-writer decision rows)."""
    key = _CONFLICT_CACHE.scoped_key(spark, sf_dir)
    cached = _CONFLICT_CACHE.get(key)
    if cached is not None:
        return cached
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = _tracked_mkdtemp(prefix="orders_occ_")
    data, man = os.path.join(base, "data"), os.path.join(base, "manifest")
    os.makedirs(man, exist_ok=True)
    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            (F.col("o_orderkey") % CC_SLICES).alias("slice"),
            _cents("o_totalprice").alias("cents"),
        )
        .localCheckpoint()
    )

    def log_entry(commit_id: int, adds: str, removes, slice_id: int):
        pq.write_table(
            pa.table(
                {
                    "commit_id": pa.array([commit_id], pa.int64()),
                    "adds": pa.array([adds], pa.string()),
                    "removes": pa.array([removes], pa.string()),
                    "slice": pa.array([slice_id], pa.int64()),
                }
            ),
            os.path.join(man, f"commit-{commit_id}.parquet"),
        )

    for slice_id in range(CC_SLICES):
        path = os.path.join(data, f"f{slice_id}")
        o.filter(F.col("slice") == slice_id).coalesce(1).write.parquet(path)
        log_entry(slice_id, path, None, slice_id)

    def read_log():
        return spark.read.parquet(man)

    def live_files(log_df, upto: int):
        """Manifest replay: adds minus removes over commits <= upto —
        metadata-grain (one row per commit)."""
        rows = sorted(
            (r.commit_id, r.adds, r.removes)
            for r in log_df.filter(F.col("commit_id") <= upto).collect()
        )
        live = []
        for _cid, adds, removes in rows:
            if removes is not None and removes in live:
                live.remove(removes)
            live.append(adds)
        return live

    def validate(log_df, base_commit: int, touched: set[int],
                 read_files: set[str]):
        """Optimistic commit validation, exactly what Iceberg's
        validateNoConflicting* does: scan the commit-log SUFFIX since
        the writer's read snapshot; a suffix commit conflicts when it
        touched one of the writer's key slices. n_conflicting_files
        counts the files the writer READ that a conflicting suffix
        commit replaced — the writer's inputs are stale."""
        suffix = log_df.filter(F.col("commit_id") > base_commit).collect()
        conf = [r for r in suffix if int(r.slice) in touched]
        stale = {
            r.removes for r in conf if r.removes is not None
        } & read_files
        return len(suffix), len(stale)

    decisions = []
    base_commit = CC_SLICES - 1  # both writers read snapshot 3

    # -- writer A: slice 1, multiplier 105 ---------------------------------
    f1 = os.path.join(data, "f1")
    a_path = os.path.join(data, "f1-a")
    a_df = spark.read.parquet(f1).withColumn(
        "cents", F.expr("cents * 105 div 100")
    )
    a_df.coalesce(1).write.parquet(a_path)
    n_a = spark.read.parquet(a_path).count()
    n_sx, n_cf = validate(read_log(), base_commit, {1}, {f1})
    if (n_sx, n_cf) != (0, 0):
        # RuntimeError, not assert: the invariant must hold under
        # `python -O` too — a drifted fixture must fail loudly, never
        # silently stage wrong commit decisions (ADVICE r12 #3)
        raise RuntimeError(
            f"conflict fixture drifted: writer A expected a clean "
            f"suffix, saw (n_suffix={n_sx}, n_conflicts={n_cf})"
        )
    log_entry(4, a_path, f1, 1)
    decisions.append(("A", base_commit, "committed", 4, n_sx, n_cf, n_a))

    # -- writer B1: slice 3, multiplier 110 — disjoint -> rebase -----------
    f3 = os.path.join(data, "f3")
    b1_path = os.path.join(data, "f3-b1")
    spark.read.parquet(f3).withColumn(
        "cents", F.expr("cents * 110 div 100")
    ).coalesce(1).write.parquet(b1_path)
    n_b1 = spark.read.parquet(b1_path).count()
    n_sx, n_cf = validate(read_log(), base_commit, {3}, {f3})
    outcome = (
        "aborted" if n_cf > 0
        else ("rebase_committed" if n_sx > 0 else "committed")
    )
    if outcome != "aborted":
        log_entry(5, b1_path, f3, 3)
    # commit_id recorded only when a log entry was actually written —
    # an aborted writer has no commit (ADVICE r12 #3)
    decisions.append(
        ("B1", base_commit, outcome,
         5 if outcome != "aborted" else -1, n_sx, n_cf, n_b1)
    )

    # -- writer B2: slice 1 again, multiplier 120 — conflict -> abort ------
    b2_path = os.path.join(data, "f1-b2-staged")
    spark.read.parquet(f1).withColumn(
        "cents", F.expr("cents * 120 div 100")
    ).coalesce(1).write.parquet(b2_path)
    n_b2 = spark.read.parquet(b2_path).count()
    n_sx, n_cf = validate(read_log(), base_commit, {1}, {f1})
    outcome = (
        "aborted" if n_cf > 0
        else ("rebase_committed" if n_sx > 0 else "committed")
    )
    if outcome != "aborted":
        raise RuntimeError(
            f"conflict fixture drifted: writer B2 must abort on the "
            f"replayed slice-1 conflict, got {outcome!r} "
            f"(n_suffix={n_sx}, n_conflicts={n_cf})"
        )
    decisions.append(("B2", base_commit, outcome, -1, n_sx, n_cf, n_b2))

    head = live_files(read_log(), 5)
    _CONFLICT_CACHE[key] = (data, head, decisions)
    return _CONFLICT_CACHE[key]


@query(
    "q_table_commit_conflict",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey % {CC_SLICES} AS slice,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    head AS (
        SELECT CASE slice WHEN 1 THEN cents * 105 // 100
                          WHEN 3 THEN cents * 110 // 100
                          ELSE cents END AS c
        FROM base
    ),
    h AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS head_rows,
               CAST(SUM(c) AS BIGINT) AS head_cents
        FROM head
    ),
    sl AS (
        SELECT slice, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY slice
    ),
    w AS (
        SELECT 'A' AS writer, 'committed' AS outcome,
               CAST({CC_SLICES - 1} AS BIGINT) AS base_commit,
               CAST(4 AS BIGINT) AS commit_id,
               CAST(0 AS BIGINT) AS n_suffix_commits,
               CAST(0 AS BIGINT) AS n_conflicting_files,
               (SELECT n FROM sl WHERE slice = 1) AS n_rows_written
        UNION ALL
        SELECT 'B1', 'rebase_committed', {CC_SLICES - 1}, 5, 1, 0,
               (SELECT n FROM sl WHERE slice = 3)
        UNION ALL
        SELECT 'B2', 'aborted', {CC_SLICES - 1}, -1, 2, 1,
               (SELECT n FROM sl WHERE slice = 1)
    )
    SELECT writer, outcome, base_commit, commit_id,
           n_suffix_commits, n_conflicting_files, n_rows_written,
           h.head_rows, h.head_cents
    FROM w CROSS JOIN h
    """,
    tags=("source", "maintenance", "manifest"),
)
def q_table_commit_conflict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMISTIC-CONCURRENCY commit validation — the step every real
    Iceberg/Delta commit performs and the last missing piece of the
    table-format story (snapshot reads, incremental scan, MERGE, WAP,
    expiry, CDC are all present): two writers read the SAME base
    snapshot; the first commits; the second must detect, from the
    commit-log suffix alone, whether its inputs went stale. Writer A
    rewrites slice 1 and commits cleanly (empty suffix). Writer B1
    rewrites slice 3; the suffix holds A's commit, but it touched a
    DISJOINT key slice — B1 rebases (its staged file is still valid;
    only the base pointer moves) and commits. Writer B2 rewrites
    slice 1 from the file A's commit replaced — validation counts 1
    stale input file and ABORTS; its staged file becomes an orphan
    the manifest never lists (the GC class q_maintenance_orphan_audit
    collects). The oracle recomputes both decisions' proof columns
    AND the final head state (A's and B1's multiplicative updates
    applied exactly once, B2's never) from raw orders — a torn or
    double-applied commit hash-fails on head_cents.

    100 TB shape: validation is METADATA-grain — one scan of the
    commit-log suffix (rows = commits since the snapshot, never data
    rows), exactly how Iceberg's validateNoConflictingAppends scales;
    the key-slice column on each manifest entry is what makes the
    overlap test O(suffix), not O(files). Data rewrites stay
    file-parallel; the staged-then-aborted file costs one orphan GC.

    Reference parity: [EXT] lakehouse surface; the reference's only
    concurrency story is Firehose's at-least-once delivery
    (lambda/main.py:101-153 re-ingest), which q_reingest_retry covers."""
    data, head_files, decisions = _stage_conflict_scenario(spark, sf_dir)
    head = (
        spark.read.option("basePath", data)
        .parquet(*sorted(head_files))
        .agg(
            F.count("*").cast("long").alias("head_rows"),
            F.sum("cents").alias("head_cents"),
        )
    )
    rows = spark.createDataFrame(
        decisions,
        "writer string, base_commit long, outcome string, commit_id long,"
        " n_suffix_commits long, n_conflicting_files long,"
        " n_rows_written long",
    )
    return rows.crossJoin(F.broadcast(head)).select(
        "writer",
        "outcome",
        "base_commit",
        "commit_id",
        "n_suffix_commits",
        "n_conflicting_files",
        "n_rows_written",
        "head_rows",
        "head_cents",
    )


# ---------------------------------------------------------------------------
# Incremental clustering maintenance (Delta liquid-clustering /
# OPTIMIZE-incremental semantics: re-cluster ONLY the files whose
# z-range overlap crossed the threshold; the clean majority is untouched)
# ---------------------------------------------------------------------------

INC_Z_SHIFT = 6  # z >> 6 → up to 64 z-contiguous files per rewrite pass
INC_OVERLAP_MIN = 4  # files overlapping >= this many others get rewritten

_INC_LAYOUT_CACHE: SessionCache = SessionCache()


def _inc_z_cols(n: int):
    """Clamped bucket + Morton columns under the TABLE-LEVEL clustering
    spec (bounds from the base layout — appends outside the base range
    clamp to the edge buckets, as a persisted spec must)."""
    db = F.expr(
        f"LEAST({n - 1}, GREATEST(0,"
        f" (days - dmin) * {n} div (dmax - dmin + 1)))"
    )
    cb = F.expr(
        f"LEAST({n - 1}, GREATEST(0,"
        f" (o_custkey - cmin) * {n} div (cmax - cmin + 1)))"
    )
    return db, cb


def _stage_incr_layout(spark: SparkSession, sf_dir: str) -> str:
    """Stage the incremental-clustering fixture: a z-clustered BASE
    (orders with o_orderkey % 4 != 0, one file per z >> INC_Z_SHIFT)
    plus two UNCLUSTERED arrival-ordered appends (o_orderkey % 4 == 0,
    split by % 8) — each append straddles the whole (date, custkey)
    plane, the classic append-ruins-clustering shape. Every staged row
    carries its z value under the table-level spec."""
    import os

    key = _INC_LAYOUT_CACHE.scoped_key(spark, sf_dir)
    cached = _INC_LAYOUT_CACHE.get(key)
    if cached is not None:
        return cached
    root = _tracked_mkdtemp(prefix="orders_incr_layout_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        _cents("o_totalprice").alias("cents"),
        F.datediff("o_orderdate", F.lit("1970-01-01").cast("date")).alias(
            "days"
        ),
    )
    base = o.filter(F.col("o_orderkey") % 4 != 0)
    app = o.filter(F.col("o_orderkey") % 4 == 0)
    n = 1 << ZORDER_BITS
    bounds = F.broadcast(
        base.agg(
            F.min("days").alias("dmin"),
            F.max("days").alias("dmax"),
            F.min("o_custkey").alias("cmin"),
            F.max("o_custkey").alias("cmax"),
        ).localCheckpoint()
    )
    db, cb = _inc_z_cols(n)
    z = _z_interleave_spark(db, cb)

    def with_z(d: DataFrame) -> DataFrame:
        return d.crossJoin(bounds).select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            "cents",
            z.alias("z"),
        )

    with_z(base).withColumn(
        "zf", F.shiftright("z", INC_Z_SHIFT)
    ).repartition("zf").write.partitionBy("zf").parquet(
        os.path.join(root, "clustered")
    )
    with_z(app).withColumn(
        "af", F.when(F.col("o_orderkey") % 8 == 0, 0).otherwise(1)
    ).repartition("af").write.partitionBy("af").parquet(
        os.path.join(root, "appends")
    )
    _INC_LAYOUT_CACHE[key] = root
    return root


def _incr_cluster_oracle() -> str:
    n = 1 << ZORDER_BITS
    zsql = _z_interleave_sql("db", "cb")
    stats = (
        "MIN(z) AS zlo, MAX(z) AS zhi, MIN(o_orderdate) AS dlo,"
        " MAX(o_orderdate) AS dhi, MIN(o_custkey) AS clo,"
        " MAX(o_custkey) AS chi, CAST(COUNT(*) AS BIGINT) AS n_rows"
    )
    prune = (
        f"NOT (dhi < TIMESTAMP '{_MP_LO}' OR dlo >= TIMESTAMP '{_MP_HI}')"
        f" AND NOT (chi < {_Z_CK_LO} OR clo >= {_Z_CK_HI})"
    )
    return f"""
    WITH o AS (
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS days
        FROM orders
    ),
    bounds AS (
        SELECT MIN(days) dmin, MAX(days) dmax,
               MIN(o_custkey) cmin, MAX(o_custkey) cmax
        FROM o WHERE o_orderkey % 4 <> 0
    ),
    zrows AS (
        SELECT t.*, {zsql} AS z FROM (
            SELECT b.*,
                   LEAST({n - 1}, GREATEST(0,
                       (days - dmin) * {n} // (dmax - dmin + 1))) AS db,
                   LEAST({n - 1}, GREATEST(0,
                       (o_custkey - cmin) * {n} // (cmax - cmin + 1))) AS cb
            FROM o b CROSS JOIN bounds
        ) t
    ),
    tagged AS (
        SELECT CASE WHEN o_orderkey % 4 <> 0
                    THEN 'z' || CAST(z >> {INC_Z_SHIFT} AS VARCHAR)
                    WHEN o_orderkey % 8 = 0 THEN 'a0' ELSE 'a1' END AS fid,
               o_orderkey, o_custkey, o_orderdate, cents, z
        FROM zrows
    ),
    allb AS (SELECT fid, {stats} FROM tagged GROUP BY fid),
    ov AS (
        SELECT a.fid, COUNT(*) AS c
        FROM allb a JOIN allb b
          ON a.fid <> b.fid AND a.zlo <= b.zhi AND b.zlo <= a.zhi
        GROUP BY a.fid
    ),
    dirty AS (SELECT fid FROM ov WHERE c >= {INC_OVERLAP_MIN}),
    clean AS (
        SELECT * FROM allb WHERE fid NOT IN (SELECT fid FROM dirty)
    ),
    rfiles AS (
        SELECT 'r' || CAST(z >> {INC_Z_SHIFT} AS VARCHAR) AS fid, {stats}
        FROM tagged WHERE fid IN (SELECT fid FROM dirty)
        GROUP BY 1
    ),
    after AS (SELECT * FROM clean UNION ALL SELECT * FROM rfiles),
    rew AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS files_rewritten,
               CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) AS rows_rewritten
        FROM allb WHERE fid IN (SELECT fid FROM dirty)
    ),
    match AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS cents_total
        FROM o
        WHERE o_orderdate >= TIMESTAMP '{_MP_LO}'
          AND o_orderdate < TIMESTAMP '{_MP_HI}'
          AND o_custkey >= {_Z_CK_LO} AND o_custkey < {_Z_CK_HI}
    ),
    bscan AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS files_scanned,
               CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) AS rows_scanned,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM allb) AS files_total
        FROM allb WHERE {prune}
    ),
    ascan AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS files_scanned,
               CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) AS rows_scanned,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM after) AS files_total
        FROM after WHERE {prune}
    )
    SELECT 'after' AS stage, a.files_total, r.files_rewritten,
           r.rows_rewritten, a.files_scanned, a.rows_scanned,
           m.n_rows, m.cents_total
    FROM ascan a CROSS JOIN rew r CROSS JOIN match m
    UNION ALL
    SELECT 'before', b.files_total, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
           b.files_scanned, b.rows_scanned, m.n_rows, m.cents_total
    FROM bscan b CROSS JOIN match m
    """


@query(
    "q_layout_cluster_incremental",
    oracle=_incr_cluster_oracle(),
    tags=("source", "maintenance", "layout"),
)
def q_layout_cluster_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL clustering maintenance — the Delta liquid-clustering
    / OPTIMIZE-incremental semantics that complete the layout story
    next to full rewrite (q_layout_zorder_rewrite), compaction, and
    manifest rewrite: a z-clustered base receives two UNCLUSTERED
    arrival-ordered appends (each straddling the whole (date,
    custkey) plane — the append-ruins-clustering shape); the
    maintenance pass computes per-file z-ranges under the TABLE-LEVEL
    clustering spec, counts pairwise z-range overlaps (metadata
    grain, |files|² on ≤66 rows), and REWRITES ONLY the files
    overlapping ≥ {INC_OVERLAP_MIN} others — the two appends; the
    clean base files (z-disjoint by construction, overlap ≤ 2) are
    never read or rewritten. The rewritten rows re-cut along the
    Morton curve into narrow rectangles, so the 2-D probe prunes them
    where before it had to scan both appends in full. The two-row
    decision table (before/after) serves files/rows scanned,
    files/rows rewritten, and the probe answer — invariant across the
    pass, proving the rewrite lossless. The oracle recomputes the
    spec, every file's stats, the overlap DECISION, and both scan
    plans from raw orders — a pass that rewrote a clean file, missed
    a dirty one, or lost rows hash-fails.

    100 TB shape: the decision is |files|-row metadata (the z-range
    interval self-join every OPTIMIZE planner runs); the rewrite
    reads and writes ONLY the dirty fraction (measured here: 25% of
    rows vs the full-table rewrite of q_layout_zorder_rewrite) — cost
    scales with append churn, not table size; the clean majority's
    files are never opened."""
    import os

    root = _stage_incr_layout(spark, sf_dir)
    clustered = spark.read.parquet(os.path.join(root, "clustered"))
    appends = spark.read.parquet(os.path.join(root, "appends"))
    stats = [
        F.min("z").alias("zlo"),
        F.max("z").alias("zhi"),
        F.min("o_orderdate").alias("dlo"),
        F.max("o_orderdate").alias("dhi"),
        F.min("o_custkey").alias("clo"),
        F.max("o_custkey").alias("chi"),
        F.count("*").alias("n_rows"),
    ]
    bman = clustered.groupBy(
        F.concat(F.lit("z"), F.col("zf").cast("string")).alias("fid")
    ).agg(*stats)
    aman = appends.groupBy(
        F.concat(F.lit("a"), F.col("af").cast("string")).alias("fid")
    ).agg(*stats)
    allb = bman.unionByName(aman).localCheckpoint()
    ov = (
        allb.alias("a")
        .join(
            allb.alias("b"),
            (F.col("a.fid") != F.col("b.fid"))
            & (F.col("a.zlo") <= F.col("b.zhi"))
            & (F.col("b.zlo") <= F.col("a.zhi")),
        )
        .groupBy(F.col("a.fid").alias("fid"))
        .agg(F.count("*").alias("c"))
    )
    dirty = ov.filter(F.col("c") >= INC_OVERLAP_MIN).select("fid")
    dirty_fids = sorted(r.fid for r in dirty.collect())  # metadata grain
    # Rewrite pass: read ONLY the dirty files' rows (partition-pruned
    # dirs — clean files are never opened), re-cut on the z prefix.
    dirs = [
        os.path.join(root, "clustered", f"zf={fid[1:]}")
        if fid.startswith("z")
        else os.path.join(root, "appends", f"af={fid[1:]}")
        for fid in dirty_fids
    ]
    rw_dir = os.path.join(root, "rewrite")
    if dirs and not os.path.isdir(rw_dir):
        drows = spark.read.parquet(*dirs)
        drows.withColumn(
            "zf", F.shiftright("z", INC_Z_SHIFT)
        ).repartition("zf").write.partitionBy("zf").parquet(rw_dir)
    rman = (
        spark.read.parquet(rw_dir)
        .groupBy(
            F.concat(F.lit("r"), F.col("zf").cast("string")).alias("fid")
        )
        .agg(*stats)
        if dirs
        else allb.limit(0)
    )
    clean = allb.join(dirty, "fid", "left_anti")
    after = clean.unionByName(rman).localCheckpoint()
    lo = F.lit(_MP_LO).cast("timestamp")
    hi = F.lit(_MP_HI).cast("timestamp")
    overlap = ~(
        (F.col("dhi") < lo)
        | (F.col("dlo") >= hi)
        | (F.col("chi") < F.lit(_Z_CK_LO))
        | (F.col("clo") >= F.lit(_Z_CK_HI))
    )

    def scan_stats(man: DataFrame) -> DataFrame:
        tot = man.agg(F.count("*").alias("files_total"))
        sc = man.filter(overlap).agg(
            F.count("*").alias("files_scanned"),
            F.coalesce(F.sum("n_rows"), F.lit(0)).alias("rows_scanned"),
        )
        return sc.crossJoin(F.broadcast(tot))
    # probe answer from the AFTER layout's surviving files (clean base
    # dirs + rewritten dirs), exact predicate applied post-scan
    surviving = [r.fid for r in after.filter(overlap).select("fid").collect()]
    sdirs = []
    for fid in surviving:
        if fid.startswith("z"):
            sdirs.append(os.path.join(root, "clustered", f"zf={fid[1:]}"))
        elif fid.startswith("r"):
            sdirs.append(os.path.join(root, "rewrite", f"zf={fid[1:]}"))
        else:
            sdirs.append(os.path.join(root, "appends", f"af={fid[1:]}"))
    pruned = (
        spark.read.parquet(*sdirs) if sdirs else clustered.limit(0)
    )
    match = F.broadcast(
        pruned.filter(
            (F.col("o_orderdate") >= lo)
            & (F.col("o_orderdate") < hi)
            & (F.col("o_custkey") >= _Z_CK_LO)
            & (F.col("o_custkey") < _Z_CK_HI)
        ).agg(
            F.count("*").alias("n_rows"),
            F.coalesce(F.sum("cents"), F.lit(0)).alias("cents_total"),
        )
    )
    rew = F.broadcast(
        allb.join(dirty, "fid", "left_semi").agg(
            F.count("*").alias("files_rewritten"),
            F.coalesce(F.sum("n_rows"), F.lit(0)).alias("rows_rewritten"),
        )
    )
    zero = F.lit(0).cast("long")
    before_row = scan_stats(allb).crossJoin(match).select(
        F.lit("before").alias("stage"),
        "files_total",
        zero.alias("files_rewritten"),
        zero.alias("rows_rewritten"),
        "files_scanned",
        "rows_scanned",
        "n_rows",
        "cents_total",
    )
    after_row = scan_stats(after).crossJoin(rew).crossJoin(match).select(
        F.lit("after").alias("stage"),
        "files_total",
        "files_rewritten",
        "rows_rewritten",
        "files_scanned",
        "rows_scanned",
        "n_rows",
        "cents_total",
    )
    return after_row.unionByName(before_row).orderBy("stage")
