"""Registered streaming-surface queries (SURVEY.md §2.5) and the §2.1
source/sink contract queries.

Each query actually drives Structured Streaming machinery — file
sources with maxFilesPerTrigger, foreachBatch fan-out, checkpointed
restart, stateful dropDuplicates, windowed aggregation in complete
mode — then returns the materialized result as a DataFrame so the
driver's DuckDB oracle can diff it. Session windows run as a real
two-batch streaming query in COMPLETE mode (cross-batch gap merge in
the state store); their append-mode finalize-behind-watermark
mechanics are exercised separately in tests/test_streaming.py.
"""

from __future__ import annotations

import itertools
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ex_aws_firehose_spark.functions.filter_pattern import compile_pattern
from ex_aws_firehose_spark.operators.firehose import ORACLE_CTE
from ex_aws_firehose_spark.operators.llm import _minhash_cte
from ex_aws_firehose_spark.registry import query
from ex_aws_firehose_spark.sources.formats import _tracked_mkdtemp
from ex_aws_firehose_spark.streaming.pipeline import (
    run_stream,
    stream_shuffle,
    tri_sink_output,
)
from ex_aws_firehose_spark.tables import load_table

_MEM_SINK_COUNTER = itertools.count()

# Shared LSH band CTE (shingle → hash → signature → bands) for the
# streaming incremental-dedup oracle — same SQL the batch MinHash
# oracles build on, so signatures match bit-for-bit.
_MINHASH_BANDS_CTE = _minhash_cte()

# Schema of the RAW events parquet (ns timestamps surface as long).
EVENTS_STREAM_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)
# Schema of events re-staged by our own writers (ts already normalized).
EVENTS_TS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


_EVENTS_DIR_CACHE: dict[str, str] = {}


_REPLAY_DIR_CACHE = None  # lazily-created SessionCache


def _pin_new_mtimes(src: str, seen: set, stamp: float) -> set:
    """Stamp the parquet part files that appeared since ``seen`` with
    an explicit mtime (ADVICE r12): sequential coalesce(1) appends are
    drained by the file source in mtime order, but on a coarse-mtime
    filesystem two batches can share a timestamp and the random-UUID
    filename tie-break would swap batch identities. Call after each
    staged write with a strictly increasing ``stamp``; returns the
    updated seen-set."""
    import os

    files = {
        os.path.join(src, f)
        for f in os.listdir(src)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    }
    for f in sorted(files - seen):
        os.utime(f, (stamp, stamp))
    return files


_BATCH_EPOCH = 1_700_000_000  # fixed base for staged-batch mtimes


def _events_replay_dir(spark: SparkSession, sf_dir: str) -> str:
    """events staged ONCE per (session, sf) as two arrival-ordered
    micro-batch files — the full table, then a replayed 10% slice
    (event_id % 10 == 0, the reference's at-least-once retry profile).
    Shared by q_stream_dedup and q_stream_dedup_watermarked (r9 ask
    #6 continuation: the drains differ, the staged source need not)."""
    global _REPLAY_DIR_CACHE
    if _REPLAY_DIR_CACHE is None:
        from ex_aws_firehose_spark.caching import SessionCache

        _REPLAY_DIR_CACHE = SessionCache()
    key = _REPLAY_DIR_CACHE.scoped_key(spark, sf_dir)
    if key not in _REPLAY_DIR_CACHE:
        import os

        src = os.path.join(_tracked_mkdtemp(prefix="events_replay_"), "src")
        e = load_table(spark, sf_dir, "events")
        seen = set()
        e.coalesce(1).write.mode("append").parquet(src)
        seen = _pin_new_mtimes(src, seen, _BATCH_EPOCH)
        e.filter(F.col("event_id") % 10 == 0).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _pin_new_mtimes(src, seen, _BATCH_EPOCH + 10)
        _REPLAY_DIR_CACHE[key] = src
    return _REPLAY_DIR_CACHE[key]


def _latest_state_version(state_dir: str, key: str) -> int:
    """Highest v<N> directory under a versioned foreachBatch state dir,
    with an explicit error when the drain produced NO batches (empty
    staged source / sink never ran) — otherwise the bare max() raises
    an unhelpful ValueError / FileNotFoundError."""
    import os

    versions = (
        [d for d in os.listdir(state_dir) if d.startswith("v")]
        if os.path.isdir(state_dir)
        else []
    )
    if not versions:
        raise RuntimeError(
            f"{key}: the availableNow drain produced no state versions "
            f"under {state_dir} — the staged source was empty or the "
            "foreachBatch sink never ran"
        )
    return max(int(d[1:]) for d in versions)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a file-source stream. File sources need a *directory*,
    so the single events.parquet is staged into a temp dir once per
    sf_dir. The on-disk ``ts`` physical type varies by testdata
    generation (ns → long under nanosAsLong, or µs timestamp);
    detect it from the parquet footer and normalize to the same
    tz-aware TimestampType ``tables.load_table`` produces."""
    import os
    import shutil

    import pyarrow.parquet as pq
    import pyarrow.types as patypes

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if sf_dir not in _EVENTS_DIR_CACHE:
        d = _tracked_mkdtemp(prefix="events_stream_")
        shutil.copy(f"{sf_dir}/events.parquet", os.path.join(d, "events.parquet"))
        _EVENTS_DIR_CACHE[sf_dir] = d
    staged = os.path.join(_EVENTS_DIR_CACHE[sf_dir], "events.parquet")
    ts_type = pq.read_schema(staged).field("ts").type
    if patypes.is_timestamp(ts_type):
        # µs (or ms) parquet timestamp: read directly as TimestampType —
        # under the pinned UTC session zone the NTZ wall clocks become
        # the same UTC instants load_table's cast produces.
        return spark.readStream.schema(EVENTS_TS_SCHEMA).parquet(
            _EVENTS_DIR_CACHE[sf_dir]
        )
    raw = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(
        _EVENTS_DIR_CACHE[sf_dir]
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))



_PARITY_DIR_CACHE = None  # set lazily to a SessionCache


def _parity_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """events staged once per (session, sf) as two parity-split parquet
    files (even event_ids, then odd — write order pins mtime order, so
    the file source drains them as two micro-batches in that order).
    Shared by every stream key that replays events as a 2-batch stream
    (session windows, stateful count, upsert, append windows): one
    staging write instead of one per key. Read-only to consumers; each
    query keeps its own checkpoint, so sharing the source dir is safe."""
    global _PARITY_DIR_CACHE
    if _PARITY_DIR_CACHE is None:
        from ex_aws_firehose_spark.caching import SessionCache

        _PARITY_DIR_CACHE = SessionCache()
    key = _PARITY_DIR_CACHE.scoped_key(spark, sf_dir)
    if key not in _PARITY_DIR_CACHE:
        import os

        src = os.path.join(_tracked_mkdtemp(prefix="events_parity_"), "src")
        e = load_table(spark, sf_dir, "events")
        seen = set()
        e.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        seen = _pin_new_mtimes(src, seen, _BATCH_EPOCH)
        e.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _pin_new_mtimes(src, seen, _BATCH_EPOCH + 10)
        _PARITY_DIR_CACHE[key] = src
    return _PARITY_DIR_CACHE[key]


def _run_to_memory(
    stream_df: DataFrame, mode: str = "complete", n: int | None = None
) -> DataFrame:
    """Drain a streaming aggregation into a memory sink and return the
    final table. ``n`` overrides the stream's shuffle-partition count:
    stream-stream joins checkpoint FOUR state stores per partition per
    micro-batch (left/right x keyToNumValues/keyWithIndexToValue), so
    their commit I/O scales with partitions harder than any other
    stateful op — they run at 4 (measured ~1 s/key saving vs 8 across
    repeated A/B at sf0.1; key cardinality is far below either)."""
    name = f"mem_sink_{next(_MEM_SINK_COUNTER)}"
    sess = stream_df.sparkSession
    with (
        stream_shuffle(sess, n) if n is not None else stream_shuffle(sess)
    ):
        q = (
            stream_df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
    out = stream_df.sparkSession.table(name)
    q.stop()
    return out


# ---------------------------------------------------------------------------
# §2.5 streaming queries
# ---------------------------------------------------------------------------


@query(
    "q_stream_microbatch",
    oracle=ORACLE_CTE
    + """
    SELECT CAST(rec_no % 4 AS INTEGER) AS source_file,
           CAST(COUNT(*) AS BIGINT) AS n_delivered
    FROM routed WHERE result = 'Ok'
    GROUP BY rec_no % 4
    """,
    tags=("streaming", "ref"),
)
def q_stream_microbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time/size-based micro-batching (reference buffer_interval,
    main.tf:18): the record stream is consumed one file per trigger
    (4 micro-batches), each batch transformed and delivered by
    foreachBatch. Delivered counts per source file prove per-batch
    processing; batch ids are execution detail and excluded from the
    comparison."""
    paths = tri_sink_output(spark, sf_dir)
    primary = spark.read.parquet(paths.primary)
    return primary.groupBy(
        (F.col("idx") % 4).cast("int").alias("source_file")
    ).agg(F.count("*").alias("n_delivered"))


@query(
    "q_stream_dual_sink",
    oracle=ORACLE_CTE
    + """
    SELECT 'primary' AS sink, CAST(COUNT(*) AS BIGINT) AS n_records
    FROM routed WHERE result = 'Ok'
    UNION ALL
    SELECT 'backup' AS sink, CAST(COUNT(*) AS BIGINT) AS n_records FROM recs
    UNION ALL
    SELECT 'errors' AS sink, CAST(COUNT(*) AS BIGINT) AS n_records
    FROM routed WHERE result = 'ProcessingFailed'
    """,
    tags=("streaming", "ref"),
)
def q_stream_dual_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tri-sink fan-out from one source (primary transformed + full raw
    backup + error records), mirroring main.tf:15-41."""
    paths = tri_sink_output(spark, sf_dir)
    rows = []
    for sink in ("primary", "backup", "errors"):
        df = spark.read.parquet(getattr(paths, sink))
        rows.append((sink, df))
    out = None
    for sink, df in rows:
        part = df.select(
            F.lit(sink).alias("sink"), F.lit(1).alias("one")
        ).groupBy("sink").agg(F.count("*").alias("n_records"))
        out = part if out is None else out.unionByName(part)
    return out


@query(
    "q_stream_exactly_once",
    oracle=ORACLE_CTE
    + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT record_id) AS BIGINT) AS n_distinct
    FROM routed WHERE result = 'Ok'
    """,
    tags=("streaming", "ref"),
)
def q_stream_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed restart idempotence: the delivery stream is started
    a second time over the same source + checkpoint; the checkpoint
    shows everything committed, so no batch re-executes and the primary
    sink holds each record exactly once (n_rows == n_distinct)."""
    paths = tri_sink_output(spark, sf_dir)
    run_stream(spark, paths)  # restart; must be a no-op
    primary = spark.read.parquet(paths.primary)
    return primary.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("record_id").alias("n_distinct"),
    )


@query(
    "q_stream_tumbling_agg",
    oracle="""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
                      CAST(ROUND(value * 100) AS BIGINT) AS cents
               FROM events)
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(cents) / 100.0 AS total_value
    FROM e GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def q_stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregation, run as a real streaming
    query (file source → complete-mode memory sink)."""
    e = _events_stream(spark, sf_dir)
    agg = e.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias(
            "total_value"
        ),
    )
    out = _run_to_memory(agg)
    return out.select(
        F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
    )


@query(
    "q_stream_sliding",
    oracle="""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    assigned AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type FROM e
        UNION ALL
        SELECT time_bucket(INTERVAL 1 HOUR, ts) - INTERVAL 1 HOUR, event_type FROM e
    )
    SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM assigned GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2 h width, 1 h slide) as a streaming query —
    every event lands in two windows; the oracle assigns the same two
    shifted buckets relationally."""
    e = _events_stream(spark, sf_dir)
    agg = e.groupBy(
        F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
    ).agg(F.count("*").alias("n"))
    out = _run_to_memory(agg)
    return out.select(
        F.col("w.start").alias("window_start"), "event_type", "n"
    )


@query(
    "q_stream_session",
    oracle="""
    WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    marked AS (
        SELECT user_id, ts,
               CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1
                    ELSE 0 END AS is_new
        FROM e
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, session_no
    """,
    tags=("streaming",),
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30 min gap) per user via the native
    session_window operator, run as a REAL streaming query: the event
    stream arrives as two micro-batches (event_id parity split), so
    sessions opened by batch 1 MERGE with batch 2's adjacent events in
    the state store — the stateful gap-merge that distinguishes
    session windows from fixed windows. Complete output mode emits the
    final merged state (append mode would finalize sessions only
    behind a watermark; the append-mode mechanics are exercised in
    tests/test_streaming.py).

    100 TB shape: session state is per (user, open-session) in the
    state store, partitioned by the groupBy key; the gap parameter
    bounds merge lookups to adjacent windows. Complete mode here is
    test harness, not the scale path — production uses append +
    watermark so state drains."""
    import os

    src = _parity_events_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = stream.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    out = _run_to_memory(agg)
    return out.select(
        "user_id", F.col("w.start").alias("session_start"), "n_events"
    )


@query(
    "q_stream_watermark_late",
    oracle="""
    WITH wm AS (
        SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR AS cutoff
        FROM events WHERE event_id % 4 <> 3
    )
    SELECT e.event_id,
           CAST(e.event_id % 4 = 3
                AND CAST(e.ts AS TIMESTAMP) < wm.cutoff AS BOOLEAN) AS is_late
    FROM events e CROSS JOIN wm
    """,
    tags=("streaming", "ref"),
)
def q_stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data routing (the reference routes rejects to an error
    output instead of silently dropping, lambda/main.py:86-90): the
    event stream arrives as two micro-batches — on-time traffic, then a
    replayed slice (event_id % 4 == 3). Events older than the
    watermark established by batch 1 (max ts − 1 h) are flagged late
    for the dead-letter path. foreachBatch maintains the watermark in
    sink state, so the flag is deterministic given the batch order."""
    import os

    root = _tracked_mkdtemp(prefix="late_stream_")
    src, out = os.path.join(root, "src"), os.path.join(root, "out")
    e = load_table(spark, sf_dir, "events")
    # batch 1: on-time traffic; batch 2: the replayed (late) slice.
    # The file source orders batches by modification time, so force a
    # strictly earlier mtime on the batch-1 files — two writes landing
    # within the filesystem's mtime resolution could otherwise flip
    # the batch order and invert the watermark state.
    e.filter(F.col("event_id") % 4 != 3).coalesce(1).write.mode("append").parquet(src)
    first_files = {
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    }
    e.filter(F.col("event_id") % 4 == 3).coalesce(1).write.mode("append").parquet(src)
    earlier = time.time() - 60
    for f in first_files:
        os.utime(f, (earlier, earlier))

    state = {"cutoff": None}

    def classify(batch_df: DataFrame, batch_id: int) -> None:
        cutoff = state["cutoff"]
        flagged = batch_df.withColumn(
            "is_late",
            F.lit(False)
            if cutoff is None
            else F.col("ts") < F.lit(cutoff) - F.expr("INTERVAL 1 HOUR"),
        )
        flagged.select("event_id", "is_late").write.mode("append").parquet(out)
        batch_max = batch_df.agg(F.max("ts")).collect()[0][0]
        if batch_max is not None and (cutoff is None or batch_max > cutoff):
            state["cutoff"] = batch_max

    stream = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    with stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(classify)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.read.parquet(out)


@query(
    "q_stream_dedup",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_unique
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "ref"),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful exact dedup on event id across micro-batches (the
    reference's log-event ids are content-addressed and re-delivered on
    retry — lambda/main.py:17-24): the stream carries the full event
    set, then a replayed duplicate slice; dropDuplicates state absorbs
    the replay. Production streams bound the state with
    dropDuplicatesWithinWatermark."""
    import os

    root = _tracked_mkdtemp(prefix="dedup_stream_")
    out = os.path.join(root, "out")
    src = _events_replay_dir(spark, sf_dir)

    stream = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .dropDuplicates(["event_id"])
    )
    with stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: df.select("event_id", "event_type")
                .write.mode("append")
                .parquet(out)
            )
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    deduped = spark.read.parquet(out)
    return deduped.groupBy("event_type").agg(
        F.countDistinct("event_id").alias("n_unique")
    )


@query(
    "q_stream_stateful_count",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
    tags=("streaming",),
)
def q_stream_stateful_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: a per-user
    running event counter whose state survives across micro-batches (the
    stream arrives as two batches split by event_id parity). Each batch
    emits the updated running count per user seen in that batch; the
    final state — the maximum emitted count, since the counter is
    monotone — must equal the batch-relational COUNT(*).

    This is the harness for arbitrary keyed state machines (sessions
    with custom expiry, CEP patterns, dedup-with-TTL): swap the fold in
    ``update_fn``, keep the plumbing. State lives in the state store
    (per-key, partitioned by the groupBy), never on the driver."""
    import os

    from pyspark.sql.streaming.state import GroupStateTimeout

    src = _parity_events_dir(spark, sf_dir)

    def update_fn(key, pdfs, state):
        import pandas as pd

        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    stream = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    counted = stream.groupBy("user_id").applyInPandasWithState(
        update_fn,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(counted, mode="update")
    # Update-mode sink holds one row per (user, batch); the final state
    # is the monotone maximum.
    return out.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


# ---------------------------------------------------------------------------
# §2.1 source / sink contract queries
# ---------------------------------------------------------------------------


@query(
    "src_stream_ingest",
    oracle=ORACLE_CTE
    + """
    SELECT record_id, rec_no AS idx FROM recs
    """,
    tags=("firehose", "source"),
)
def src_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion contract (reference lambda/main.py:131-136): the
    delivery stream hands the processor a batch of (recordId, data)
    rows; this query materializes that batch from the source."""
    from ex_aws_firehose_spark.operators.firehose import synthesize_records

    return synthesize_records(spark, sf_dir).select("record_id", "idx")


_SUBSCRIPTION_PATTERN = "error"  # the first non-empty pattern users deploy
_SUBSCRIPTION_COMPILED = compile_pattern(_SUBSCRIPTION_PATTERN)


@query(
    "src_subscription_filter",
    oracle=ORACLE_CTE
    + f"""
    SELECT record_id, event_id_str, message FROM data_events
    WHERE {_SUBSCRIPTION_COMPILED.duckdb_sql(message="message")}
    """,
    tags=("firehose", "source"),
)
def src_subscription_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subscription-filter semantics (main.tf:284-290): the reference
    deploys filter_pattern = "" (match-all); this key exercises the
    non-trivial path with the REAL pattern compiler
    (functions/filter_pattern.py) — the term pattern 'error' compiled
    to a word-boundary predicate on the log message, applied before
    the stream exactly where the subscription filter sits. The
    q_filter_pattern_* family covers the rest of the DSL."""
    from ex_aws_firehose_spark.operators.firehose import (
        decode_chain,
        explode_events,
        synthesize_records,
    )

    ev = explode_events(decode_chain(synthesize_records(spark, sf_dir)))
    pred = _SUBSCRIPTION_COMPILED.column(message=F.col("message"))
    return ev.filter(pred).select("record_id", "event_id_str", "message")


@query(
    "src_test_producer",
    oracle="""
    SELECT 'Hello Firehose! 1704067200000' AS message,
           'Hell Yeah Firehose! 1704067200000' || chr(10) AS transformed,
           CAST(1704067200000 AS BIGINT) AS ts_millis
    """,
    tags=("firehose", "source"),
)
def src_test_producer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's test producer (put_test_log_to_log_stream.sh:14-21)
    injects one log event 'Hello Firehose! <epoch-ms>' — reproduced
    here with a pinned timestamp and pushed through the transform to
    show the golden Hello→Hell Yeah rewrite end-to-end."""
    one = spark.createDataFrame(
        [("Hello Firehose! 1704067200000", 1704067200000)],
        "message string, ts_millis long",
    )
    return one.select(
        "message",
        F.concat(
            F.regexp_replace("message", "Hello", "Hell Yeah"), F.lit("\n")
        ).alias("transformed"),
        "ts_millis",
    )


@query(
    "sink_s3_buffered",
    oracle=ORACLE_CTE
    + """
    SELECT record_id, payload FROM routed WHERE result = 'Ok'
    """,
    tags=("firehose", "sink"),
)
def sink_s3_buffered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary buffered sink (main.tf:15-19): transformed payloads of
    delivered records, read back from the stream's parquet output."""
    paths = tri_sink_output(spark, sf_dir)
    return spark.read.parquet(paths.primary).select("record_id", "payload")


@query(
    "sink_backup_raw",
    oracle=ORACLE_CTE
    + """
    SELECT record_id, rec_no AS idx FROM recs
    """,
    tags=("firehose", "sink"),
)
def sink_backup_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backup sink (main.tf:27-34): every *source* record lands raw in
    backup/ regardless of processing outcome."""
    paths = tri_sink_output(spark, sf_dir)
    return spark.read.parquet(paths.backup).select("record_id", "idx")


@query(
    "sink_error_log",
    oracle=ORACLE_CTE
    + """
    SELECT record_id, kind FROM routed WHERE result = 'ProcessingFailed'
    """,
    tags=("firehose", "sink"),
)
def sink_error_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error sink (main.tf:21-25, README 'Check the error log'):
    ProcessingFailed records with their failure kind."""
    paths = tri_sink_output(spark, sf_dir)
    return spark.read.parquet(paths.errors).select("record_id", "kind")


@query(
    "q_stream_join_static",
    oracle="""
    WITH tiers(event_type, tier) AS (
        VALUES ('click', 'interactive'), ('view', 'interactive'),
               ('purchase', 'transactional'), ('signup', 'transactional'),
               ('error', 'operational')
    )
    SELECT e.event_id, e.event_type,
           COALESCE(t.tier, 'other') AS tier,
           CAST(ROUND(e.value * 100) AS BIGINT) AS value_cents
    FROM events e LEFT JOIN tiers t USING (event_type)
    """,
    tags=("streaming",),
)
def q_stream_join_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the event
    stream is joined to a small static dimension (event-type → tier).
    The static side is broadcast once and reused by every micro-batch —
    the canonical pattern for enriching a 100 TB/day stream against
    reference data without shuffling the stream side. Run as a real
    streaming query into an append-mode memory sink."""
    tiers = spark.createDataFrame(
        [
            ("click", "interactive"),
            ("view", "interactive"),
            ("purchase", "transactional"),
            ("signup", "transactional"),
            ("error", "operational"),
        ],
        "event_type string, tier string",
    )
    e = _events_stream(spark, sf_dir)
    enriched = e.join(F.broadcast(tiers), "event_type", "left").select(
        "event_id",
        "event_type",
        F.coalesce("tier", F.lit("other")).alias("tier"),
        F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
    )
    return _run_to_memory(enriched, mode="append")


@query(
    "q_stream_stream_join",
    oracle="""
    WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                      event_type FROM events)
    SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
    FROM e v JOIN e c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
    """,
    tags=("streaming",),
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: the view stream joined to the click
    stream on user within a 30-minute event-time band, with watermarks
    on both sides so the join state is bounded (Spark evicts buffered
    rows once they age past watermark + band). Run as a real streaming
    query into an append-mode memory sink; with a full drain the output
    equals the batch interval join, which is the oracle. At 100 TB/day
    the state bound is (watermark + 30 min) of traffic per side,
    partitioned by user_id across the cluster."""
    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    joined = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        F.col("v_user").alias("user_id"), "view_id", "click_id"
    )
    return _run_to_memory(joined, mode="append", n=4)


@query(
    "q_stream_upsert",
    oracle="""
    WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                      event_type, value FROM events),
    ranked AS (
        SELECT user_id, ts, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM e
    )
    SELECT user_id, ts AS last_ts, event_type AS last_event_type,
           cents AS last_cents
    FROM ranked WHERE rn = 1
    """,
    tags=("streaming",),
)
def q_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC upsert via foreachBatch — the MERGE-INTO pattern on
    a plain-parquet keyed state table: each micro-batch unions the
    current state image with the batch's rows and keeps the
    last-writer-wins row per key (greatest (ts, event_id) — the same
    current-image semantics as the batch q_upsert_compact). State
    versions are written to fresh directories (copy-on-write commit,
    the way Delta/Iceberg snapshot under MERGE) so a failed batch never
    corrupts the readable image. Arrival order cannot change the
    result: last-writer-wins resolves by event time, not batch order —
    which is what makes the final image oracle-checkable.

    100 TB shape: with a transactional table format this foreachBatch
    body becomes one MERGE INTO keyed on user_id; state stays
    partitioned by key hash so each batch shuffles only batch-rows +
    touched-state, not the full image. The rewrite-the-image variant
    here is the correct shape only while |keys| is bounded (it is:
    state is one row per user)."""
    import os

    # Two source files -> two micro-batches with interleaved keys
    # (shared staged source; state/checkpoint dirs stay per-query).
    src = _parity_events_dir(spark, sf_dir)
    root = _tracked_mkdtemp(prefix="upsert_stream_")

    state: dict[str, str | None] = {"dir": None}

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        cur = (
            spark.read.parquet(state["dir"])
            if state["dir"] is not None
            else spark.createDataFrame(
                [],
                "user_id long, last_ts timestamp, last_event_type string, "
                "last_cents long, event_id long",
            )
        )
        incoming = batch_df.select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
            F.round(F.col("value") * 100, 0).cast("long").alias("last_cents"),
            "event_id",
        )
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(
            F.desc("last_ts"), F.desc("event_id")
        )
        merged = (
            cur.unionByName(incoming)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        new_dir = os.path.join(root, f"state_v{batch_id}")
        merged.write.mode("overwrite").parquet(new_dir)
        state["dir"] = new_dir

    stream = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    with stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(upsert)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.read.parquet(state["dir"]).select(
        "user_id", "last_ts", "last_event_type", "last_cents"
    )


@query(
    "q_stream_available_now",
    oracle="""
    WITH e AS (SELECT event_id, event_type FROM events)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT event_id % 3) AS BIGINT) AS n_source_slices
    FROM e GROUP BY event_type
    """,
    tags=("streaming",),
)
def q_stream_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigger.AvailableNow batch catch-up: the stream drains everything
    available in bounded micro-batches (maxFilesPerTrigger still
    applies, unlike the legacy Trigger.Once) and then terminates on its
    own — the scheduled-backfill mode that lets one streaming codebase
    serve both 24/7 and run-every-hour deployments with the same
    checkpoint. Three staged source files force three catch-up batches;
    the drained union must equal the batch view of the same data
    (counts per type + slice coverage proves every file landed exactly
    once).

    100 TB shape: AvailableNow is how you replay a large backlog
    without an unbounded first batch — the file source paces batches by
    maxFilesPerTrigger/maxBytesPerTrigger, so executor memory and
    shuffle sizing hold during catch-up, and the checkpoint advances
    incrementally (a crash mid-backfill resumes, not restarts)."""
    import os

    root = _tracked_mkdtemp(prefix="availnow_stream_")
    src, out = os.path.join(root, "src"), os.path.join(root, "out")
    e = load_table(spark, sf_dir, "events")
    seen = set()
    for slice_id in range(3):
        e.filter(F.col("event_id") % 3 == slice_id).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        seen = _pin_new_mtimes(src, seen, _BATCH_EPOCH + slice_id * 10)

    stream = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    with stream_shuffle(spark):
        # Idempotent landing: each micro-batch overwrites its own
        # batch-id-named subdirectory, so a replayed batch (failure
        # after write, before checkpoint commit) rewrites the same
        # files instead of appending duplicates — the "landed exactly
        # once" contract the count-sensitive oracle asserts.
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: df.select("event_id", "event_type")
                .write.mode("overwrite")
                .parquet(os.path.join(out, f"batch-{bid}"))
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .start()
        )
        q.awaitTermination()
    drained = spark.read.option("recursiveFileLookup", "true").parquet(out)
    return drained.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct(F.col("event_id") % 3).alias("n_source_slices"),
    )


@query(
    "q_stream_replay_heal",
    oracle="""
    WITH e AS (SELECT event_id, event_type FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
    FROM e GROUP BY event_type
    """,
    tags=("streaming", "fault"),
)
def q_stream_replay_heal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once under an INJECTED CRASH, as an oracle-checked query
    (tests/test_streaming.py exercises the same fault windows as unit
    tests; this key puts the proof in the differential artifacts): the
    stream drains three staged source files; micro-batch 1's
    foreachBatch raises AFTER its sink write but BEFORE Spark commits
    the batch to the checkpoint log — the torn-delivery window. A
    second start() over the SAME checkpoint replays the uncommitted
    batch; because each batch lands in an overwrite-mode ``batch-{id}``
    subdirectory, the replay rewrites the half-delivered output in
    place instead of appending. The final drained counts (total AND
    distinct event_ids per type) must equal the batch view — duplicates
    or losses from the crash would break both.

    Reference basis: the delivery retry contract (lambda/main.py:
    101-128) — retried records must not double-deliver. 100 TB shape:
    the idempotence comes from deterministic batch-keyed output paths
    (the poor-engine's transactional sink); with Delta/Iceberg the same
    guarantee is txn-log commit + batch-id dedup, and the crash window
    this key exercises is exactly the one those logs close."""
    import os

    root = _tracked_mkdtemp(prefix="replayheal_stream_")
    src, out = os.path.join(root, "src"), os.path.join(root, "out")
    e = load_table(spark, sf_dir, "events")
    seen = set()
    for slice_id in range(3):
        e.filter(F.col("event_id") % 3 == slice_id).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        seen = _pin_new_mtimes(src, seen, _BATCH_EPOCH + slice_id * 10)

    crash_flag = os.path.join(root, "crash_armed")
    open(crash_flag, "w").close()

    def land(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select("event_id", "event_type").write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"batch-{batch_id}"))
        if batch_id == 1 and os.path.exists(crash_flag):
            os.remove(crash_flag)
            raise RuntimeError(
                "injected crash: sink written, checkpoint commit pending"
            )

    def start():
        stream = (
            spark.readStream.schema(EVENTS_TS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        return (
            stream.writeStream.foreachBatch(land)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .start()
        )

    with stream_shuffle(spark):
        q = start()
        crashed = False
        try:
            q.awaitTermination()
        except Exception:  # noqa: BLE001 — the injected failure, by design
            crashed = True
        if not crashed:
            raise AssertionError("injected crash did not fire")
        q2 = start()  # same checkpoint: replays batch 1, drains the rest
        q2.awaitTermination()
    drained = spark.read.option("recursiveFileLookup", "true").parquet(out)
    return drained.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_id").alias("n_distinct"),
    )


_DOCS_BATCH_CACHE = None  # set lazily to a SessionCache


def _docs_range_batches_dir(spark: SparkSession, sf_dir: str) -> str:
    """documents staged ONCE per (session, sf) as three arrival-ordered
    doc_id-range parquet files (cuts at n//3 and 2*(n//3); strictly
    increasing mtimes pin the file-source drain order). Shared by every
    doc-stream key (minhash dedup, span dedup, quality monitor) — one
    staging write per session instead of one per key; consumers prune
    to the columns they need via their readStream schema."""
    global _DOCS_BATCH_CACHE
    if _DOCS_BATCH_CACHE is None:
        from ex_aws_firehose_spark.caching import SessionCache

        _DOCS_BATCH_CACHE = SessionCache()
    key = _DOCS_BATCH_CACHE.scoped_key(spark, sf_dir)
    if key not in _DOCS_BATCH_CACHE:
        import os

        root = _tracked_mkdtemp(prefix="docs_batches_")
        src = os.path.join(root, "src")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "source"
        )
        n = d.count()
        cuts = (n // 3, 2 * (n // 3))
        os.makedirs(src, exist_ok=True)
        for i, cond in enumerate(
            (
                F.col("doc_id") < cuts[0],
                (F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1]),
                F.col("doc_id") >= cuts[1],
            )
        ):
            scratch = os.path.join(root, f"scratch-{i}")
            d.filter(cond).coalesce(1).write.mode("overwrite").parquet(scratch)
            part = next(
                f
                for f in os.listdir(scratch)
                if f.endswith(".parquet") and not f.startswith(".")
            )
            staged = os.path.join(src, f"batch-{i}.parquet")
            os.rename(os.path.join(scratch, part), staged)
            t = 1_700_000_000 + i * 10
            os.utime(staged, (t, t))
        _DOCS_BATCH_CACHE[key] = src
    return _DOCS_BATCH_CACHE[key]



@query(
    "q_stream_dedup_minhash",
    oracle=_MINHASH_BANDS_CTE
    + """
    , dups AS (
        SELECT DISTINCT a.doc_id
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bsig = b.bsig AND b.doc_id < a.doc_id
    )
    SELECT d.doc_id,
           d.doc_id IN (SELECT doc_id FROM dups) AS is_dup
    FROM documents d
    """,
    tags=("streaming", "llm", "dedup"),
)
def q_stream_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental near-dup dedup — the crawl-ingest shape:
    each micro-batch of documents is checked against the accumulated
    MinHash band index of everything seen BEFORE it (plus earlier docs
    of its own batch), then its own bands are appended to the index.
    A doc is a duplicate iff any of its 4 LSH band signatures collides
    with a lower-doc_id doc. Batches are staged as three doc_id-range
    files drained in arrival order, so "seen before" ≡ "lower doc_id"
    and the batch oracle (one self-join over all bands) reproduces the
    incremental verdicts exactly.

    100 TB shape: the band index is the only state — 4 rows of
    (band, bsig, doc_id) per doc, parquet-partitioned by band at scale
    so each batch's probe join touches matching buckets; the batch side
    is micro-batch-sized. The probe is the same bucketed equi-join as
    the batch LSH (never crossJoin); appends are blind (no rewrite).
    With a transactional table format, probe+append become one
    transaction; here the index dir is append-only so a replayed batch
    re-appends identical bands — dedup verdicts are unchanged
    (collisions are set-membership, duplicates in the index are
    harmless) — and verdicts land in an overwrite-mode batch-{id}
    subdir, so replay rewrites rather than duplicates them."""
    import os

    from ex_aws_firehose_spark.operators.llm import minhash_bands

    root = _tracked_mkdtemp(prefix="dedup_stream_")
    src = _docs_range_batches_dir(spark, sf_dir)
    idx_dir = os.path.join(root, "band_index")
    out_dir = os.path.join(root, "verdicts")

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        bands_b = minhash_bands(batch_df).persist()
        try:
            if os.path.isdir(idx_dir) and any(
                f.endswith(".parquet") for f in os.listdir(idx_dir)
            ):
                index = spark.read.parquet(idx_dir)
                all_bands = index.unionByName(bands_b)
            else:
                all_bands = bands_b
            probe = all_bands.select(
                F.col("band").alias("p_band"),
                F.col("bsig").alias("p_bsig"),
                F.col("doc_id").alias("p_doc"),
            )
            dups = (
                bands_b.join(
                    probe,
                    (F.col("band") == F.col("p_band"))
                    & (F.col("bsig") == F.col("p_bsig"))
                    & (F.col("p_doc") < F.col("doc_id")),
                )
                .select("doc_id")
                .distinct()
                .withColumn("is_dup", F.lit(True))
            )
            verdicts = (
                batch_df.select("doc_id")
                .join(dups, "doc_id", "left")
                .select(
                    "doc_id", F.coalesce("is_dup", F.lit(False)).alias("is_dup")
                )
            )
            # Idempotent verdict sink: overwrite a batch-keyed subdir so a
            # replayed micro-batch (failure after write, before checkpoint
            # commit) rewrites rather than duplicates its verdicts — same
            # pattern as q_stream_available_now. The band index stays
            # blind-append: re-appended bands are harmless (set-membership).
            verdicts.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch-{batch_id}")
            )
            bands_b.write.mode("append").parquet(idx_dir)
        finally:
            bands_b.unpersist()

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    with stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(dedup_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.option("recursiveFileLookup", "true").parquet(out_dir)


@query(
    "q_stream_dedup_watermarked",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_unique,
           CAST(COUNT(*) AS BIGINT) AS n_emitted
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "ref"),
)
def q_stream_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-BOUNDED streaming dedup via dropDuplicatesWithinWatermark —
    the production form of q_stream_dedup: plain dropDuplicates keeps
    every id ever seen (state grows with the stream's lifetime);
    the watermarked variant evicts ids older than the watermark delay,
    bounding state to one delay-window of traffic. The guarantee
    weakens accordingly: only duplicates arriving WITHIN the delay of
    each other are merged — exactly the reference's retry profile
    (re-deliveries are near-immediate, lambda/main.py:101-128).

    Here the delay (30 days) exceeds the fixture's whole event-time
    span, so no state expires before the replayed slice lands and the
    drained output equals global dedup (n_emitted == n_unique) — which
    is what makes the run oracle-checkable while still exercising the
    watermark-eviction operator and its event-time plumbing.

    100 TB/day shape: state = delay-window × arrival rate per
    partition, evicted by the state store as the watermark advances —
    the knob that makes infinite-retention dedup finite."""
    import os

    root = _tracked_mkdtemp(prefix="dedup_wm_stream_")
    out = os.path.join(root, "out")
    src = _events_replay_dir(spark, sf_dir)

    stream = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    with stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: df.select("event_id", "event_type")
                .write.mode("overwrite")
                .parquet(os.path.join(out, f"batch-{bid}"))
            )
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    deduped = spark.read.option("recursiveFileLookup", "true").parquet(out)
    return deduped.groupBy("event_type").agg(
        F.countDistinct("event_id").alias("n_unique"),
        F.count("*").alias("n_emitted"),
    )


@query(
    "q_stream_window_append",
    oracle="""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    wm AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS cutoff FROM e)
    SELECT time_bucket(INTERVAL 1 HOUR, e.ts) AS window_start, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM e CROSS JOIN wm
    GROUP BY 1, 2, wm.cutoff
    -- Spark's exact finalization predicate (probed empirically): append
    -- mode emits a window once window_end <= watermark. (Watermark ms
    -- truncation can't flip a whole-second window boundary.)
    HAVING time_bucket(INTERVAL 1 HOUR, MIN(e.ts)) + INTERVAL 1 HOUR
           <= wm.cutoff
    """,
    tags=("streaming",),
)
def q_stream_window_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode windowed aggregation with watermark finalization —
    the production streaming-aggregation contract: a window row is
    emitted exactly once, only after the watermark (max event time −
    2 h) passes its end, so downstream consumers see immutable
    finalized rows (complete mode, used by the other window keys for
    oracle-ability, re-emits everything every batch — fine for a
    dashboard sink, wrong for a ledger). Windows newer than the final
    watermark stay open and are NOT in the output; the oracle derives
    the same cutoff relationally and applies Spark's exact finalization
    predicate (window_end <= watermark — probed empirically: a window
    whose end equals the watermark IS emitted), so the comparison holds
    even if a testdata generation aligns max event time to an hour.

    100 TB/day shape: state = open windows only (watermark evicts the
    rest); emission latency = watermark delay — the knob trading late
    tolerance against result availability. Two micro-batches force the
    watermark to advance across batches, proving cross-batch
    finalization rather than a single-batch flush."""
    import os

    src = _parity_events_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    name = f"mem_sink_{next(_MEM_SINK_COUNTER)}"
    with stream_shuffle(spark):
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        F.col("w.start").alias("window_start"), "event_type", "n"
    )


@query(
    "q_stream_incremental_agg",
    oracle="""
    WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                      CAST(ROUND(value * 100) AS BIGINT) AS cents
               FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           MAX(ts) AS last_ts
    FROM e GROUP BY user_id
    """,
    tags=("streaming", "incremental"),
)
def q_stream_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental VIEW MAINTENANCE via foreachBatch: a keyed
    aggregate table (per-user count / sum / max) is maintained across
    micro-batches by merging the batch's PARTIAL aggregate into the
    stored image — merge(state, agg(batch)) per distributive-aggregate
    algebra (count: +, sum: +, max: greatest) — with copy-on-write
    versioned commits like q_stream_upsert. The final image must equal
    the one-shot batch GROUP BY, which is exactly what the oracle
    checks (the streaming twin of q_incremental_agg).

    100 TB/day shape: each batch shuffles only |batch keys| partial
    rows, never the accumulated history (contrast recomputing the
    GROUP BY over all arrivals per batch); with a transactional table
    this body is MERGE INTO agg_table USING batch_agg. State size =
    |distinct keys|, independent of stream length."""
    import os

    src = _parity_events_dir(spark, sf_dir)
    root = _tracked_mkdtemp(prefix="incr_agg_stream_")
    state: dict[str, str | None] = {"dir": None}

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        part = batch_df.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "sum_cents"
            ),
            F.max("ts").alias("last_ts"),
        )
        cur = (
            spark.read.parquet(state["dir"])
            if state["dir"] is not None
            else spark.createDataFrame(
                [],
                "user_id long, n_events long, sum_cents long, "
                "last_ts timestamp",
            )
        )
        merged = (
            cur.unionByName(part)
            .groupBy("user_id")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_cents").alias("sum_cents"),
                F.max("last_ts").alias("last_ts"),
            )
        )
        new_dir = os.path.join(root, f"state_v{batch_id}")
        merged.write.mode("overwrite").parquet(new_dir)
        state["dir"] = new_dir

    stream = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    with stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .option(
                "checkpointLocation",
                _tracked_mkdtemp(prefix="incr_agg_ckpt_"),
            )
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.read.parquet(state["dir"])


# ---------------------------------------------------------------------------
# Streaming IVM for a JOIN view (the streaming twin of q_ivm_join_delta)
# ---------------------------------------------------------------------------

IVM_STREAM_MOD = 8  # key % 8: slots 6 / 7 arrive as delta batches 1 / 2
_IVM_STREAM_BATCH = (
    f"CASE {{k}} % {IVM_STREAM_MOD} WHEN 6 THEN 1 WHEN 7 THEN 2 ELSE 0 END"
)

_IVM_TWO_SIDED_CACHE = None  # lazily-created SessionCache

_IVM_SIDED_SCHEMA = (
    "side string, okey long, custkey long, cents long, seg string"
)


def _ivm_two_sided_dir(spark: SparkSession, sf_dir: str) -> str:
    """orders + customer staged ONCE per (session, sf) as three
    arrival-ordered micro-batch files of a UNIFIED two-sided envelope:
    batch 0 = the base load (both sides), batches 1 and 2 = mixed
    deltas (new orders AND new customers in the same batch — the
    simultaneous two-sided arrival q_ivm_join_delta's algebra is
    for). Staged mtimes are pinned explicitly (``_pin_new_mtimes``,
    ADVICE r12) so the file source drains the batches deterministically
    even on a coarse-mtime filesystem."""
    global _IVM_TWO_SIDED_CACHE
    if _IVM_TWO_SIDED_CACHE is None:
        from ex_aws_firehose_spark.caching import SessionCache

        _IVM_TWO_SIDED_CACHE = SessionCache()
    key = _IVM_TWO_SIDED_CACHE.scoped_key(spark, sf_dir)
    if key not in _IVM_TWO_SIDED_CACHE:
        import os

        from ex_aws_firehose_spark.operators.relational import _cents

        src = os.path.join(_tracked_mkdtemp(prefix="ivm_two_sided_"), "src")
        o = load_table(spark, sf_dir, "orders").select(
            F.lit("o").alias("side"),
            F.col("o_orderkey").alias("okey"),
            F.col("o_custkey").alias("custkey"),
            _cents("o_totalprice").alias("cents"),
            F.lit(None).cast("string").alias("seg"),
            F.expr(_IVM_STREAM_BATCH.format(k="o_orderkey")).alias("b"),
        )
        c = load_table(spark, sf_dir, "customer").select(
            F.lit("c").alias("side"),
            F.lit(None).cast("long").alias("okey"),
            F.col("c_custkey").alias("custkey"),
            F.lit(None).cast("long").alias("cents"),
            F.col("c_mktsegment").alias("seg"),
            F.expr(_IVM_STREAM_BATCH.format(k="c_custkey")).alias("b"),
        )
        both = o.unionByName(c)
        seen = set()
        for b in range(3):
            both.filter(F.col("b") == b).drop("b").coalesce(1).write.mode(
                "append"
            ).parquet(src)
            seen = _pin_new_mtimes(src, seen, _BATCH_EPOCH + b * 10)
        _IVM_TWO_SIDED_CACHE[key] = src
    return _IVM_TWO_SIDED_CACHE[key]


def _ivm_join_batch(
    spark: SparkSession,
    root: str,
    batch_df: DataFrame,
    batch_id: int,
    crash_flag: str | None = None,
) -> None:
    """One micro-batch of join-view maintenance: apply the three delta
    terms ΔR⋈S ∪ R⋈ΔS ∪ ΔR⋈ΔS against the PRIOR versioned state, then
    commit the new state copy-on-write. Prior state is discovered from
    DISK (highest state_v<i> with i < batch_id), so a replayed batch
    recomputes from the same pre-crash base and its overwrite commit
    is idempotent — the q_stream_upsert/q_stream_replay_heal contract.
    ``crash_flag``: fault-injection hook for the replay-heal test —
    raise AFTER the state write, BEFORE Spark commits the checkpoint."""
    import os

    versions = (
        [
            int(d[len("state_v"):])
            for d in os.listdir(root)
            if d.startswith("state_v")
        ]
        if os.path.isdir(root)
        else []
    )
    prior = [v for v in versions if v < batch_id]
    if prior:
        # one versioned file holds all four tables, tbl-tagged — the
        # whole state is metadata-grain, so ONE write/read job per
        # commit beats a file per table (job count is the cost here;
        # at scale each tbl is its own partitioned table)
        st = spark.read.parquet(
            os.path.join(root, f"state_v{max(prior)}")
        )
    else:
        st = spark.createDataFrame(
            [], "tbl string, custkey long, seg string, cents long"
        )
    s_old = st.filter(F.col("tbl") == "s").select("custkey", "seg")
    r_old = st.filter(F.col("tbl") == "r").select("custkey", "cents")
    v_old = st.filter(F.col("tbl") == "v").select(
        "seg", F.col("cents").alias("v_cents")
    )
    d_r = batch_df.filter(F.col("side") == "o").select("custkey", "cents")
    d_s = batch_df.filter(F.col("side") == "c").select("custkey", "seg")
    # the three delta terms — every one has at least one (broadcast)
    # delta side; the accumulated base never reshuffles
    t1 = F.broadcast(d_r.alias("dr")).join(s_old.alias("s"), "custkey")
    t2 = r_old.alias("r").join(F.broadcast(d_s.alias("ds")), "custkey")
    t3 = F.broadcast(d_r.alias("dr2")).join(
        F.broadcast(d_s.alias("ds2")), "custkey"
    )
    delta = (
        t1.select("seg", "cents")
        .unionByName(t2.select("seg", "cents"))
        .unionByName(t3.select("seg", "cents"))
        .groupBy("seg")
        .agg(F.sum("cents").alias("d_cents"))
    )
    new_view = (
        v_old.unionByName(
            delta.select("seg", F.col("d_cents").alias("v_cents"))
        )
        .groupBy("seg")
        .agg(F.sum("v_cents").alias("v_cents"))
    )
    new_s = s_old.unionByName(d_s)
    new_r = (
        r_old.unionByName(d_r)
        .groupBy("custkey")
        .agg(F.sum("cents").alias("cents"))
    )
    ndir = os.path.join(root, f"state_v{batch_id}")
    ns = F.lit(None).cast("string")
    nl = F.lit(None).cast("long")
    combined = (
        new_s.select(F.lit("s").alias("tbl"), "custkey", "seg", nl.alias("cents"))
        .unionByName(
            new_r.select(F.lit("r").alias("tbl"), "custkey", ns.alias("seg"), "cents")
        )
        .unionByName(
            new_view.select(
                F.lit("v").alias("tbl"), nl.alias("custkey"), "seg",
                F.col("v_cents").alias("cents"),
            )
        )
        .unionByName(
            delta.select(
                F.lit("d").alias("tbl"), nl.alias("custkey"), "seg",
                F.col("d_cents").alias("cents"),
            )
        )
    )
    combined.write.mode("overwrite").parquet(ndir)
    if crash_flag is not None and batch_id == 1 and os.path.exists(crash_flag):
        os.remove(crash_flag)
        raise RuntimeError("injected crash after state write, before commit")


def _ivm_join_stream_run(
    spark: SparkSession,
    sf_dir: str,
    root: str,
    crash_flag: str | None = None,
) -> None:
    import os

    src = _ivm_two_sided_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema(_IVM_SIDED_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    # n=4: each commit runs three metadata-grain groupBys + one state
    # write; fewer partitions measured ~1 s/drain faster than the
    # stream default (state is |segments|+|custkeys| rows, never big)
    with stream_shuffle(spark, 4):
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: _ivm_join_batch(
                    spark, root, df, bid, crash_flag
                )
            )
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()


@query(
    "q_stream_ivm_join_delta",
    oracle=f"""
    WITH o AS (
        SELECT o_custkey AS custkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               {_IVM_STREAM_BATCH.format(k="o_orderkey")} AS b
        FROM orders
    ),
    c AS (
        SELECT c_custkey AS custkey, c_mktsegment AS seg,
               {_IVM_STREAM_BATCH.format(k="c_custkey")} AS b
        FROM customer
    ),
    d0 AS (
        SELECT seg, CAST(SUM(cents) AS BIGINT) AS c FROM o JOIN c USING (custkey)
        WHERE o.b = 0 AND c.b = 0 GROUP BY seg
    ),
    d1 AS (
        SELECT seg, CAST(SUM(cents) AS BIGINT) AS c FROM o JOIN c USING (custkey)
        WHERE (o.b = 1 AND c.b < 1) OR (o.b < 1 AND c.b = 1)
           OR (o.b = 1 AND c.b = 1)
        GROUP BY seg
    ),
    d2 AS (
        SELECT seg, CAST(SUM(cents) AS BIGINT) AS c FROM o JOIN c USING (custkey)
        WHERE (o.b = 2 AND c.b < 2) OR (o.b < 2 AND c.b = 2)
           OR (o.b = 2 AND c.b = 2)
        GROUP BY seg
    ),
    oneshot AS (
        SELECT seg, CAST(SUM(cents) AS BIGINT) AS c
        FROM o JOIN c USING (custkey) GROUP BY seg
    )
    SELECT f.seg AS mktsegment,
           CAST(coalesce(d0.c, 0) AS BIGINT) AS v0_cents,
           CAST(coalesce(d1.c, 0) AS BIGINT) AS d1_cents,
           CAST(coalesce(d2.c, 0) AS BIGINT) AS d2_cents,
           CAST(coalesce(d0.c, 0) + coalesce(d1.c, 0) + coalesce(d2.c, 0)
                AS BIGINT) AS v_final_cents,
           f.c AS v_oneshot_cents,
           coalesce(d0.c, 0) + coalesce(d1.c, 0) + coalesce(d2.c, 0) = f.c
               AS consistent
    FROM oneshot f
    LEFT JOIN d0 USING (seg)
    LEFT JOIN d1 USING (seg)
    LEFT JOIN d2 USING (seg)
    """,
    tags=("streaming", "ivm"),
)
def q_stream_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING incremental maintenance of a JOIN view — the streaming
    twin of q_ivm_join_delta (VERDICT r11 ask #6): the revenue-by-
    segment view over orders⋈customer is maintained in ``foreachBatch``
    across three micro-batches of a TWO-SIDED stream (both relations
    arrive on one bus; batch 0 is the base load, batches 1–2 carry new
    orders AND new customers simultaneously). Each batch applies the
    delta rule Δ(R⋈S) = ΔR⋈S ∪ R⋈ΔS ∪ ΔR⋈ΔS against the prior
    versioned state — accumulated customer dim, per-custkey order
    sums, and the view image — then commits copy-on-write
    (state_v{batch}), the q_stream_upsert transactional pattern.
    Orders whose customer has not arrived yet wait in the r_cust state
    and join the view the moment the customer lands (through R⋈ΔS) —
    the out-of-order-referential-arrival case batch IVM never faces.
    Output: per-segment view after the base batch, the two delta
    contributions, the final maintained image, and the one-shot
    join-aggregate with a ``consistent`` proof column; the replay-heal
    contract (crash between state write and checkpoint commit →
    restart converges to the same image) is pinned in
    tests/test_streaming.py.

    100 TB/day shape: per batch, every join term carries a broadcast
    DELTA side — the accumulated base state never reshuffles; state
    size is |customers| + |active custkeys| + |segments| rows,
    independent of stream length; commits are atomic directory swaps
    (MERGE INTO on a transactional table in production)."""
    import os

    root = _tracked_mkdtemp(prefix="ivm_join_stream_")
    _ivm_join_stream_run(spark, sf_dir, root)
    last = _latest_state_version_prefixed(root, "q_stream_ivm_join_delta")

    def _state(b: int) -> DataFrame:
        return spark.read.parquet(os.path.join(root, f"state_v{b}"))

    view = _state(last).filter(F.col("tbl") == "v").select(
        "seg", F.col("cents").alias("v_cents")
    )
    d0, d1, d2 = (
        _state(b)
        .filter(F.col("tbl") == "d")
        .select("seg", F.col("cents").alias("d_cents"))
        for b in (0, 1, 2)
    )
    from ex_aws_firehose_spark.operators.relational import _cents

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        _cents("o_totalprice").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("seg")
    )
    oneshot = (
        o.join(c, "custkey")
        .groupBy("seg")
        .agg(F.sum("cents").alias("v_oneshot_cents"))
    )
    z = F.lit(0).cast("long")
    return (
        oneshot.join(
            F.broadcast(d0.select("seg", F.col("d_cents").alias("v0"))),
            "seg",
            "left",
        )
        .join(
            F.broadcast(d1.select("seg", F.col("d_cents").alias("d1"))),
            "seg",
            "left",
        )
        .join(
            F.broadcast(d2.select("seg", F.col("d_cents").alias("d2"))),
            "seg",
            "left",
        )
        .join(
            F.broadcast(view.select("seg", "v_cents")), "seg", "left"
        )
        .select(
            F.col("seg").alias("mktsegment"),
            F.coalesce(F.col("v0"), z).alias("v0_cents"),
            F.coalesce(F.col("d1"), z).alias("d1_cents"),
            F.coalesce(F.col("d2"), z).alias("d2_cents"),
            F.coalesce(F.col("v_cents"), z).alias("v_final_cents"),
            "v_oneshot_cents",
            (F.coalesce(F.col("v_cents"), z) == F.col("v_oneshot_cents")).alias(
                "consistent"
            ),
        )
    )


def _latest_state_version_prefixed(root: str, key: str) -> int:
    """Highest state_v<N> under a versioned foreachBatch root, with an
    explicit error when the drain produced no commits."""
    import os

    versions = (
        [
            int(d[len("state_v"):])
            for d in os.listdir(root)
            if d.startswith("state_v")
        ]
        if os.path.isdir(root)
        else []
    )
    if not versions:
        raise RuntimeError(
            f"{key}: the drain produced no state versions under {root}"
        )
    return max(versions)


@query(
    "q_stream_state_inspect",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "observability"),
)
def q_stream_state_inspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATE-STORE INTROSPECTION via the Spark 4 state data source:
    run a checkpointed per-user streaming count over two micro-batches,
    then read the aggregation's state store back as a DataFrame
    (``spark.read.format("statestore").load(checkpoint)``) and project
    (key, value) — the observability surface for debugging stuck
    stateful queries, auditing state growth, and seeding state
    migrations, without touching the running stream. The inspected
    state must equal the batch GROUP BY, which is what the oracle
    checks.

    100 TB/day shape: the state source reads the checkpoint's latest
    snapshot per shuffle partition in parallel — cost scales with
    |state|, not stream history; pair with state TTL/watermark eviction
    so |state| stays bounded (see q_stream_dedup_watermarked)."""
    import os

    src = _parity_events_dir(spark, sf_dir)
    root = _tracked_mkdtemp(prefix="state_inspect_")
    ckpt = os.path.join(root, "ckpt")
    stream = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    name = f"mem_sink_{next(_MEM_SINK_COUNTER)}"
    with stream_shuffle(spark):
        q = (
            stream.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    state = spark.read.format("statestore").load(ckpt)
    return state.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.count").alias("n_events"),
    )


@query(
    "q_stream_rocksdb_state",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_unique
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "stateful", "rocksdb"),
)
def q_stream_rocksdb_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming on the PRODUCTION state backend: the same
    exact-dedup + per-type count pipeline as q_stream_dedup, but with
    the RocksDB state-store provider and CHANGELOG CHECKPOINTING —
    state lives off-heap/on-disk per shuffle partition (bounded
    executor memory however many keys accumulate) and each commit
    uploads only the batch's delta instead of a full snapshot. This is
    the configuration a 100 TB/day deployment runs; the default
    HDFS-backed in-memory provider (every other stream key here) is
    the dev/small-state path. Results must be provider-independent —
    exactly what the oracle checks.

    State sizing at scale: |state| = |distinct ids inside the
    watermark|; RocksDB spills to local SSD, so the bound is disk, not
    heap — pair with dropDuplicatesWithinWatermark for eviction
    (q_stream_dedup_watermarked)."""
    src = _parity_events_dir(spark, sf_dir)
    confs = {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled": "true",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        stream = (
            spark.readStream.schema(EVENTS_TS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .dropDuplicates(["event_id"])
            .groupBy("event_type")
            .agg(F.count("*").alias("n_unique"))
        )
        out = _run_to_memory(stream, mode="complete")
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
    return out


# Gap for the timer-closed sessionizer — mirrors q_sessionize_gap.
SESSION_TIMEOUT_GAP_HOURS = 12

# DuckDB reads the raw ns-precision event timestamps; normalize to µs
# (same convention as operators/relational.py EVENTS_US).
ORACLE_EVENTS_US = (
    "WITH events_us AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, "
    "user_id, event_type, value, props FROM events)"
)

_TIME_SPLIT_DIR_CACHE = None  # lazy SessionCache


def _time_split_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """events staged as THREE time-ordered micro-batch files: first
    half by timestamp, second half, then a single watermark-driver row
    (reserved user −1, max ts + 100 h) whose only job is to push the
    watermark past every real user's last-event + gap so their timers
    fire. Sequential coalesce(1) writes pin mtime order, which is the
    file source's drain order."""
    global _TIME_SPLIT_DIR_CACHE
    if _TIME_SPLIT_DIR_CACHE is None:
        from ex_aws_firehose_spark.caching import SessionCache

        _TIME_SPLIT_DIR_CACHE = SessionCache()
    key = _TIME_SPLIT_DIR_CACHE.scoped_key(spark, sf_dir)
    if key not in _TIME_SPLIT_DIR_CACHE:
        import os

        src = os.path.join(_tracked_mkdtemp(prefix="events_tsplit_"), "src")
        e = load_table(spark, sf_dir, "events")
        split = e.agg(
            F.timestamp_micros(
                (
                    (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts")))
                    / 2
                ).cast("long")
            ).alias("s")
        )
        e1 = e.crossJoin(F.broadcast(split)).filter(F.col("ts") <= F.col("s"))
        e2 = e.crossJoin(F.broadcast(split)).filter(F.col("ts") > F.col("s"))
        cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
        seen = set()
        e1.select(cols).coalesce(1).write.mode("append").parquet(src)
        seen = _pin_new_mtimes(src, seen, _BATCH_EPOCH)
        e2.select(cols).coalesce(1).write.mode("append").parquet(src)
        seen = _pin_new_mtimes(src, seen, _BATCH_EPOCH + 10)
        flush = e.agg(F.max("ts").alias("m")).select(
            F.lit(-1).cast("long").alias("event_id"),
            F.expr("m + INTERVAL 100 HOURS").alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("flush").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("").alias("props"),
        )
        flush.coalesce(1).write.mode("append").parquet(src)
        _pin_new_mtimes(src, seen, _BATCH_EPOCH + 20)
        _TIME_SPLIT_DIR_CACHE[key] = src
    return _TIME_SPLIT_DIR_CACHE[key]


@query(
    "q_stream_session_timeout",
    oracle=ORACLE_EVENTS_US
    + f"""
    , ordered AS (
        SELECT user_id, ts, event_id,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events_us
    ),
    flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts
                            > INTERVAL {SESSION_TIMEOUT_GAP_HOURS} HOUR
                    THEN 1 ELSE 0 END AS brk
        FROM ordered
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    rolled AS (
        SELECT user_id, session_id,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id, session_start, session_end, n_events,
           CASE WHEN session_id = MAX(session_id)
                     OVER (PARTITION BY user_id)
                THEN 'timeout' ELSE 'gap' END AS closed_by
    FROM rolled
    """,
    tags=("streaming", "session"),
)
def q_stream_session_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization with TIMER-based expiry — the event-time-
    timeout surface of applyInPandasWithState (the piece
    q_stream_session's built-in session_window hides): each user's
    open session lives in keyed state with a timer at last_event +
    12 h; a later event inside the gap extends it, an event beyond the
    gap closes it (closed_by='gap'), and when the WATERMARK passes the
    timer with no new data the state store fires hasTimedOut and the
    session closes from the timer path (closed_by='timeout') — which
    is how a production sessionizer emits trailing sessions without
    waiting for traffic. The differential oracle covers BOTH paths:
    a user's last session must close by timeout, every earlier one by
    gap.

    Mechanics: 3 time-ordered micro-batches (first/second half by ts,
    then a reserved user −1 row at max+100 h that only advances the
    watermark); state per key is one (start, last, n) triple — the
    same O(1)-per-user bound as the batch window chain, but incremental.

    100 TB shape: state is hash-partitioned by user across the state
    store (RocksDB-backed in production, q_stream_rocksdb_state);
    timers are per-key entries the store scans once per batch — the
    1-row flush batch costs O(|timed-out keys|), not O(events)."""
    import os

    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = SESSION_TIMEOUT_GAP_HOURS * 3600 * 1_000_000
    gap_ms = gap_us // 1000
    src = _time_split_events_dir(spark, sf_dir)

    def sess_fn(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "start_us": [start],
                    "end_us": [last],
                    "n_events": [n],
                    "closed_by": ["timeout"],
                }
            )
            return
        cur = list(state.get) if state.exists else None
        out = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        for us in rows["ts"].astype("datetime64[us]").astype("int64"):
            us = int(us)
            if cur is None:
                cur = [us, us, 1]
            elif us - cur[1] > gap_us:
                out.append((key[0], cur[0], cur[1], cur[2], "gap"))
                cur = [us, us, 1]
            else:
                cur[1] = us
                cur[2] += 1
        state.update(tuple(cur))
        state.setTimeoutTimestamp(cur[1] // 1000 + gap_ms)
        yield pd.DataFrame(
            out,
            columns=["user_id", "start_us", "end_us", "n_events", "closed_by"],
        )

    stream = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 second")
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        sess_fn,
        outputStructType=(
            "user_id long, start_us long, end_us long,"
            " n_events long, closed_by string"
        ),
        stateStructType="start long, last long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    out = _run_to_memory(sessions, mode="append")
    return out.filter(F.col("user_id") >= 0).select(
        "user_id",
        F.timestamp_micros(F.col("start_us")).alias("session_start"),
        F.timestamp_micros(F.col("end_us")).alias("session_end"),
        "n_events",
        "closed_by",
    )


@query(
    "q_stream_observe_metrics",
    oracle=ORACLE_EVENTS_US
    + """
    SELECT CAST(event_id % 2 AS BIGINT) AS batch_idx,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum
    FROM events_us GROUP BY event_id % 2
    """,
    tags=("streaming", "observability"),
)
def q_stream_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming observability via Dataset.observe: per-micro-batch
    row count and exact money sum accumulate as OBSERVED METRICS on
    the stream itself (no second aggregation query, no sink coupling)
    and surface through each batch's QueryProgress — the mechanism a
    production pipeline feeds its metrics/alerting bus from, here
    pinned by the differential oracle (batch 0 = even event_ids,
    batch 1 = odd, from the shared parity staging).

    100 TB shape: observe() metrics are accumulator-style partial
    aggregates merged on the driver per batch — zero extra shuffle,
    zero extra pass; cost is O(metrics), not O(rows). This is the
    cheap end of the observability spectrum (the expensive end — full
    state introspection — is q_stream_state_inspect)."""
    src = _parity_events_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .observe(
            "audit",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.round(F.col("value") * 100, 0).cast("long")
            ).alias("cents_sum"),
        )
    )
    with stream_shuffle(spark):
        q = stream.writeStream.format("noop").start()
        q.processAllAvailable()
        progress = list(q.recentProgress)
        q.stop()
    rows = []
    idx = 0
    for p in progress:
        num = p["numInputRows"] if isinstance(p, dict) else p.numInputRows
        if not num:
            continue  # trailing empty batch
        om = p["observedMetrics"] if isinstance(p, dict) else p.observedMetrics
        audit = om["audit"]
        rows.append((idx, audit["n_rows"], audit["cents_sum"]))
        idx += 1
    return spark.createDataFrame(
        rows, "batch_idx long, n_rows long, cents_sum long"
    )


@query(
    "q_stream_stream_left_join",
    oracle=ORACLE_EVENTS_US
    + """
    , v AS (
        SELECT user_id AS v_user, event_id AS view_id, ts AS v_ts
        FROM events_us WHERE event_type = 'view'
    ),
    c AS (
        SELECT user_id AS c_user, event_id AS click_id, ts AS c_ts
        FROM events_us WHERE event_type = 'click'
    )
    SELECT v.v_user AS user_id, v.view_id, c.click_id
    FROM v LEFT JOIN c
      ON v.v_user = c.c_user
     AND c.c_ts > v.v_ts
     AND c.c_ts <= v.v_ts + INTERVAL 30 MINUTE
    """,
    tags=("streaming", "join"),
)
def q_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join — the semantic the inner
    variant (q_stream_stream_join) cannot express: views with NO click
    in the 30-minute band must still emit, with a NULL click, and in a
    stream they can only do so once the watermark PROVES no matching
    click can still arrive (state eviction = null emission). The
    mechanics that make the drain complete: a flush row (reserved user
    −1, max+100 h, in the staged final micro-batch) rides BOTH streams
    past their type filters so both watermarks jump and every buffered
    unmatched view evicts; flush rows join nothing (band excludes
    equal timestamps) and are filtered from the result. With the full
    drain, output equals the batch LEFT join — the oracle.

    100 TB shape: identical state bound to the inner join (watermark +
    band of traffic per side, hash-partitioned by user) PLUS the
    outer-emission rule every production pipeline must plan for:
    unmatched results are DELAYED by up to the watermark delay, and a
    quiet stream emits its tail only when something advances event
    time — the flush row here is the test-harness form of the
    heartbeat messages real deployments inject."""
    src = _time_split_events_dir(spark, sf_dir)
    raw = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    views = (
        raw.filter(F.col("event_type").isin("view", "flush"))
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 second")
    )
    clicks = (
        raw.filter(F.col("event_type").isin("click", "flush"))
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 second")
    )
    joined = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    ).select(F.col("v_user").alias("user_id"), "view_id", "click_id")
    out = _run_to_memory(joined, mode="append", n=4)
    return out.filter(F.col("user_id") >= 0)


@query(
    "q_stream_stream_full_outer_join",
    oracle=ORACLE_EVENTS_US
    + """
    , v AS (
        SELECT user_id AS v_user, event_id AS view_id, ts AS v_ts
        FROM events_us WHERE event_type = 'view'
    ),
    c AS (
        SELECT user_id AS c_user, event_id AS click_id, ts AS c_ts
        FROM events_us WHERE event_type = 'click'
    )
    SELECT COALESCE(v.v_user, c.c_user) AS user_id, v.view_id, c.click_id
    FROM v FULL JOIN c
      ON v.v_user = c.c_user
     AND c.c_ts > v.v_ts
     AND c.c_ts <= v.v_ts + INTERVAL 30 MINUTE
    """,
    tags=("streaming", "join"),
)
def q_stream_stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER stream-stream interval join — the last join mode after
    inner (q_stream_stream_join) and left (q_stream_stream_left_join):
    BOTH sides' unmatched rows must emit with a NULL opposite side, and
    in a stream each side can only do so once the watermark proves no
    in-band partner can still arrive — so this exercises state eviction
    on both join states simultaneously. A view with no click in its
    30-minute band emits (view_id, NULL); a click preceded by no view
    emits (NULL, click_id).

    Same staged-flush harness as the left join: the final micro-batch's
    flush row (reserved user −1, max+100 h) rides both streams past
    their type filters, jumping both watermarks so every buffered
    unmatched row — view AND click — evicts; flush rows join nothing
    (the band is strict) and filter out of the result. After the full
    drain, output equals the batch FULL join — the oracle.

    100 TB shape: state is still watermark + band of per-side traffic
    hash-partitioned by user; the full-outer form doubles the eviction
    bookkeeping, not the state bound. The production caveat the left
    join documents cuts both ways here: BOTH sides' unmatched results
    are delayed by up to the watermark gap, so a quiet side needs the
    heartbeat pattern or its tail stays buffered."""
    src = _time_split_events_dir(spark, sf_dir)
    raw = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    views = (
        raw.filter(F.col("event_type").isin("view", "flush"))
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 second")
    )
    clicks = (
        raw.filter(F.col("event_type").isin("click", "flush"))
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 second")
    )
    joined = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        "full_outer",
    ).select(
        F.coalesce(F.col("v_user"), F.col("c_user")).alias("user_id"),
        "view_id",
        "click_id",
    )
    out = _run_to_memory(joined, mode="append", n=4)
    return out.filter(F.col("user_id") >= 0)


def _span_dedup_batch(
    spark: SparkSession,
    idx_dir: str,
    out_dir: str,
    batch_df: DataFrame,
    batch_id: int,
) -> None:
    """One micro-batch of the incremental span dedup: probe the
    batch's positioned shingles against the accumulated index (plus
    the batch's own earlier docs), write batch-keyed verdicts
    (overwrite subdir = replay-idempotent), then blind-append the
    batch's shingles (re-appends are harmless set-members). Module-
    level so the crash-replay test can wrap it with a fault
    injector."""
    from ex_aws_firehose_spark.operators.llm import span_hash
    from ex_aws_firehose_spark.operators.llm import (
        SPAN_K,
        _positioned_shingle_col,
    )
    from pyspark.sql import Window
    import os

    sh_b = (
        batch_df.select(
            "doc_id", F.posexplode(_positioned_shingle_col(SPAN_K))
        )
        .select(
            "doc_id",
            (F.col("pos") + 1).alias("pos"),
            span_hash(F.col("col")).alias("h"),
        )
        .persist()
    )
    try:
        idx_b = sh_b.select("h", "doc_id").distinct()
        if os.path.isdir(idx_dir) and any(
            f.endswith(".parquet") for f in os.listdir(idx_dir)
        ):
            probe = spark.read.parquet(idx_dir).unionByName(idx_b)
        else:
            probe = idx_b
        probe = probe.select(
            F.col("h").alias("p_h"), F.col("doc_id").alias("p_doc")
        )
        hits = (
            sh_b.join(
                probe,
                (F.col("h") == F.col("p_h"))
                & (F.col("p_doc") < F.col("doc_id")),
            )
            .select("doc_id", "pos")
            .distinct()
        )
        w = Window.partitionBy("doc_id").orderBy("pos")
        brk = hits.withColumn(
            "b",
            F.when(
                (F.col("pos") - F.lag("pos").over(w) > SPAN_K)
                | F.lag("pos").over(w).isNull(),
                1,
            ).otherwise(0),
        )
        isl = brk.withColumn(
            "island",
            F.sum("b").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        per_doc = (
            isl.groupBy("doc_id", "island")
            .agg((F.max("pos") - F.min("pos") + SPAN_K).alias("st"))
            .groupBy("doc_id")
            .agg(F.sum("st").alias("dup_tokens"))
        )
        verdicts = (
            batch_df.select("doc_id")
            .join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("dup_tokens", F.lit(0))
                .cast("long")
                .alias("dup_tokens"),
            )
        )
        verdicts.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch-{batch_id}")
        )
        idx_b.write.mode("append").parquet(idx_dir)
    finally:
        sh_b.unpersist()


def _stream_span_oracle() -> str:
    from ex_aws_firehose_spark.operators.llm import SPAN_K, _span_prefix_cte

    return (
        _span_prefix_cte()
        + f""",
    firsts AS (
        SELECT h, MIN(doc_id) AS first_doc FROM hs GROUP BY h
    ),
    hits AS (
        SELECT DISTINCT s.doc_id, s.pos
        FROM hs s JOIN firsts f ON s.h = f.h AND s.doc_id > f.first_doc
    ),
    brk AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                              ORDER BY pos) > {SPAN_K}
                    OR lag(pos) OVER (PARTITION BY doc_id
                                      ORDER BY pos) IS NULL
                    THEN 1 ELSE 0 END AS b
        FROM hits
    ),
    isl AS (
        SELECT doc_id, pos,
               SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
        FROM brk
    ),
    per_doc AS (
        SELECT doc_id, SUM(span_tokens) AS dup_tokens FROM (
            SELECT doc_id, MAX(pos) - MIN(pos) + {SPAN_K} AS span_tokens
            FROM isl GROUP BY doc_id, island
        ) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """
    )


@query(
    "q_stream_dedup_spans",
    oracle=_stream_span_oracle(),
    tags=("streaming", "llm", "dedup"),
)
def q_stream_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental SPAN dedup — the crawl-ingest form of
    q_dedup_spans: each micro-batch of documents probes its positioned
    shingle hashes against the accumulated shingle index of everything
    seen BEFORE it (plus earlier docs of its own batch), reports per
    doc how many of its tokens sit inside spans already present in the
    corpus-so-far (the "novelty budget" a crawl pipeline uses to drop
    recycled pages on arrival), then appends its own shingles to the
    index. Arrival order = doc_id order (three staged doc_id-range
    batches), so the batch oracle — hit iff a strictly-earlier doc
    holds the shingle — reproduces every incremental verdict.

    100 TB shape: the index is (60-bit hash, doc_id) distinct rows,
    parquet-partitioned by hash prefix at scale so each batch's probe
    is a bucket-pruned equi-join; islands run per batch doc only.
    Append-only index + batch-keyed overwrite verdict sink = the same
    replay-idempotent contract as q_stream_dedup_minhash (re-appended
    shingles are harmless set-members)."""
    import os

    root = _tracked_mkdtemp(prefix="span_stream_")
    src = _docs_range_batches_dir(spark, sf_dir)
    idx_dir = os.path.join(root, "shingle_index")
    out_dir = os.path.join(root, "verdicts")

    def span_batch(batch_df: DataFrame, batch_id: int) -> None:
        _span_dedup_batch(spark, idx_dir, out_dir, batch_df, batch_id)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    with stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(span_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.option("recursiveFileLookup", "true").parquet(out_dir)


def _stream_kmv_oracle() -> str:
    from ex_aws_firehose_spark.operators.scale import (
        KMV_K,
        KMV_SPACE,
        _kmv_hash_sql,
    )

    return (
        ORACLE_EVENTS_US
        + f"""
    , h AS (
        SELECT DISTINCT event_type, user_id,
               {_kmv_hash_sql('user_id')} AS h
        FROM events_us
    ),
    r AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM h
    ),
    kth AS (
        SELECT event_type, h AS hk FROM r WHERE rn = {KMV_K}
    ),
    exact AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
        FROM events_us GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(k.hk AS BIGINT) AS kth_hash,
           CAST(({KMV_K} - 1) * {KMV_SPACE} // k.hk AS BIGINT) AS est_users,
           e.exact_users
    FROM exact e JOIN kth k USING (event_type)
    """
    )


@query(
    "q_stream_sketch_kmv",
    oracle=_stream_kmv_oracle(),
    tags=("streaming", "sketch"),
)
def q_stream_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGEABLE distinct-count sketch — KMV (k-minimum
    values) state maintained across micro-batches: each batch hashes
    its user ids (deterministic LCG, the q_sketch_kmv_distinct hash),
    merges them with the stored per-event_type state, and truncates
    back to the K smallest — the mergeability that makes sketches the
    streaming cardinality workhorse. Because KMV state is a pure ORDER
    STATISTIC of a deterministic hash, the drained estimate equals the
    batch sketch over all data exactly — the oracle recomputes it in
    one pass, plus the exact count it approximates.

    100 TB shape: state is K×|groups| rows forever; each batch's
    update is one hash agg + one rank-truncate on (event_type, h) —
    and the same merge works datacenter-to-datacenter (union the
    state tables, truncate). Replay safety: the merge is idempotent
    (re-merging a batch's hashes changes nothing — set semantics),
    state is rewritten per batch in an overwrite dir."""
    import os

    from pyspark.sql import Window as W

    from ex_aws_firehose_spark.operators.scale import (
        KMV_A,
        KMV_B,
        KMV_K,
        KMV_SPACE,
    )

    root = _tracked_mkdtemp(prefix="kmv_stream_")
    src = _time_split_events_dir(spark, sf_dir)
    state_dir = os.path.join(root, "state")

    def kmv_batch(batch_df: DataFrame, batch_id: int) -> None:
        hb = (
            batch_df.filter(F.col("event_type") != "flush")
            .select(
                "event_type",
                ((F.col("user_id") * KMV_A + KMV_B) % KMV_SPACE).alias("h"),
            )
            .distinct()
        )
        prev_dir = os.path.join(state_dir, f"v{batch_id - 1}")
        if os.path.isdir(prev_dir):
            hb = hb.unionByName(spark.read.parquet(prev_dir)).distinct()
        rn = F.row_number().over(
            W.partitionBy("event_type").orderBy("h")
        )
        trunc = (
            hb.withColumn("rn", rn)
            .filter(F.col("rn") <= KMV_K)
            .select("event_type", "h")
        )
        # versioned overwrite: a replayed batch rewrites ITS version from
        # the same predecessor — idempotent by construction
        trunc.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )

    stream = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    with stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(kmv_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    last = _latest_state_version(state_dir, "q_stream_sketch_kmv")
    state = spark.read.parquet(os.path.join(state_dir, f"v{last}"))
    w = W.partitionBy("event_type").orderBy("h")
    kth = (
        state.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == KMV_K)
        .select("event_type", F.col("h").alias("kth_hash"))
    )
    e = load_table(spark, sf_dir, "events")
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return exact.join(kth, "event_type").select(
        "event_type",
        F.col("kth_hash").cast("long"),
        F.expr(f"CAST(({KMV_K} - 1) * {KMV_SPACE} DIV kth_hash AS LONG)").alias(
            "est_users"
        ),
        "exact_users",
    )


@query(
    "q_stream_join_scd2",
    oracle=ORACLE_EVENTS_US
    + """
    , dim AS (
        SELECT user_id, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to,
               CAST(ROUND(value * 100) AS BIGINT) AS tier_cents
        FROM events_us WHERE event_type = 'signup'
    ),
    p AS (
        SELECT event_id, user_id, ts,
               CAST(ROUND(value * 100) AS BIGINT) AS purchase_cents
        FROM events_us WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.purchase_cents, d.tier_cents
    FROM p LEFT JOIN dim d
      ON d.user_id = p.user_id
     AND p.ts >= d.valid_from
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    """,
    tags=("streaming", "join"),
)
def q_stream_join_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static SCD2 (as-of) ENRICHMENT — the lookup
    q_stream_join_static cannot express: each streaming purchase picks
    up the dimension VERSION valid at its event time (signup events
    form the versioned dimension: valid_from = signup ts, valid_to =
    next signup), not the current row. The interval predicate rides a
    user-equi broadcast join, so the stream side stays STATELESS — no
    watermark, no state store; versioning lives entirely in the static
    side's interval columns, which is exactly how a warehouse serves
    SCD2 lookups to a streaming enricher.

    100 TB shape: the dimension is broadcast while it fits (per-key
    version chains are short); past that it becomes a stream-static
    hash join on user with the interval filter applied post-match —
    same plan Spark picks here. Purchases before any version emit with
    NULL attributes (left join), the SCD2 boundary convention
    [valid_from, valid_to)."""
    src = _time_split_events_dir(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    dim = (
        e.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("d_user"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(
                W.partitionBy("user_id").orderBy("ts", "event_id")
            ).alias("valid_to"),
            F.round(F.col("value") * 100).cast("long").alias("tier_cents"),
        )
    )
    raw = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    purchases = raw.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("purchase_cents"),
    )
    joined = purchases.join(
        F.broadcast(dim),
        (F.col("user_id") == F.col("d_user"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        "left",
    ).select("event_id", "user_id", "purchase_cents", "tier_cents")
    return _run_to_memory(joined, mode="append")


# ---------------------------------------------------------------------------
# Message-bus (Kafka-class) source via the Python DataSource STREAMING
# API (sources/bus.py) — offsets, chunked polls, commit/replay
# ---------------------------------------------------------------------------

_BUS_TOPIC_CACHE = None  # set lazily to a SessionCache


def bus_topic_dir(spark: SparkSession, sf_dir: str) -> str:
    """Topic dir: events staged once per (session, sf) as BUS_SHARDS
    ordered parquet shard logs."""
    global _BUS_TOPIC_CACHE
    if _BUS_TOPIC_CACHE is None:
        from ex_aws_firehose_spark.caching import SessionCache

        _BUS_TOPIC_CACHE = SessionCache()
    key = _BUS_TOPIC_CACHE.scoped_key(spark, sf_dir)
    if key not in _BUS_TOPIC_CACHE:
        import os

        import duckdb

        from ex_aws_firehose_spark.sources.bus import BUS_SHARDS

        root = os.path.join(_tracked_mkdtemp(prefix="bus_topic_"), "topic")
        os.makedirs(root, exist_ok=True)
        con = duckdb.connect()
        try:
            n = 0
            for shard in range(BUS_SHARDS):
                path = os.path.join(root, f"shard-{shard}.parquet")
                con.execute(
                    f"""
                    COPY (
                        SELECT event_id, user_id, event_type,
                               CAST(ROUND(value * 100) AS BIGINT) AS cents
                        FROM read_parquet('{sf_dir}/events.parquet')
                        WHERE event_id % {BUS_SHARDS} = {shard}
                        ORDER BY event_id
                    ) TO '{path}' (FORMAT PARQUET)
                    """
                )
                n += con.execute(
                    f"SELECT count(*) FROM read_parquet('{path}')"
                ).fetchone()[0]
        finally:
            con.close()
        _BUS_TOPIC_CACHE[key] = root
    return _BUS_TOPIC_CACHE[key]


@query(
    "src_stream_bus_topic",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
    """,
    tags=("streaming", "source", "python"),
)
def src_stream_bus_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Message-bus source semantics end-to-end through a REAL streaming
    connector implementation (sources/bus.py, Spark 4 Python DataSource
    streaming API): a 4-shard topic with per-shard record offsets,
    driver-side offset planning, executor-side partition reads of
    exactly the [start, end) slice, and commit-based replay (restart
    resumes at the committed offset; exactly-once and chunked
    per-poll admission control pinned in tests/test_bus_source.py).
    The drained stream must equal the events table row-for-row — the
    at-least-once-delivery ∧ no-duplicates check a bus consumer owes
    its sink.

    100 TB shape: O(shards) offset metadata per trigger on the driver;
    data crosses executor-side per-shard slices in parallel. The Python
    row path prices the extension point, not bulk throughput — a JVM
    connector owns that; THIS is the contract it implements."""
    from ex_aws_firehose_spark.sources.bus import register_bus_datasource

    root = bus_topic_dir(spark, sf_dir)
    register_bus_datasource(spark)
    stream = spark.readStream.format("bus_topic").option("path", root).load()
    return _run_to_memory(stream, mode="append")


# ---------------------------------------------------------------------------
# Subscription filter-pattern DSL applied INSIDE a streaming query
# ---------------------------------------------------------------------------

_STREAM_FP_PATTERN = "?error ?signup -Hello"
_STREAM_FP = compile_pattern(_STREAM_FP_PATTERN)
# the firehose fixture's log-message derivation (FIXTURES.md §B), also
# used by ORACLE_CTE's ev — kept textually tiny so both sides align
_MSG_EXPR = (
    "CASE WHEN event_id % 7 = 0"
    " THEN 'Hello ' || event_type || ' ' || props"
    " ELSE event_type || ' ' || props END"
)


@query(
    "q_stream_filter_pattern",
    oracle=f"""
    SELECT event_id, {_MSG_EXPR} AS message FROM events
    WHERE {_STREAM_FP.duckdb_sql(message=f"({_MSG_EXPR})")}
    """,
    tags=("streaming", "filter-pattern"),
)
def q_stream_filter_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The subscription filter WHERE IT ACTUALLY RUNS: the compiled
    CloudWatch pattern ('?error ?signup -Hello' — OR + NOT term forms)
    as a per-micro-batch predicate on the live log-event stream,
    exactly the placement of main.tf:284-290's filter between the log
    group and the delivery stream. The compiled predicate is pure
    codegen (word-boundary rlike), so it rides the stream with no
    state, no watermark, no Python — a stateless filter costs nothing
    at any scale. Batch keys q_filter_pattern_* prove the DSL; this
    key proves its streaming placement."""
    src = _parity_events_dir(spark, sf_dir)
    raw = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    msg = F.expr(_MSG_EXPR)
    flt = raw.select("event_id", msg.alias("message")).filter(
        _STREAM_FP.column(message=F.col("message"))
    )
    return _run_to_memory(flt, mode="append")


# ---------------------------------------------------------------------------
# Streaming ANN query serving against the persisted index
# ---------------------------------------------------------------------------


def _stream_serve_oracle() -> str:
    from ex_aws_firehose_spark.operators.llm import _adc_batch_oracle

    return _adc_batch_oracle()


@query(
    "q_stream_index_serve",
    oracle=_stream_serve_oracle(),
    tags=("streaming", "llm", "similarity"),
)
def q_stream_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ANN serving — the online half of the index lifecycle
    (train → persist → q_sim_index_persist proves the round-trip →
    THIS key serves a live query stream against it): query vectors
    arrive in micro-batches (two staged files, maxFilesPerTrigger=1),
    each batch routes/scores through the SAME _adc_serve_batch path as
    the batch key against the RELOADED parquet index, results append
    to the sink. Because per-query serving is independent of how
    queries are batched, the drained results must be bit-identical to
    q_sim_ivf_pq_adc_batch — that is this key's oracle, verbatim.

    100 TB / online shape: the index tables load once (inverted lists
    partition-pruned per probe), each micro-batch broadcasts only its
    query LUTs; state-free serving, so the stream scales by executor
    count alone."""
    import os

    from ex_aws_firehose_spark.operators.llm import (
        ADC_BATCH_Q,
        _adc_serve_batch,
        load_persisted_index,
    )

    cent, codes, cb, members = load_persisted_index(spark, sf_dir)
    root = _tracked_mkdtemp(prefix="ann_serve_")
    qdir = os.path.join(root, "queries")
    out_dir = os.path.join(root, "results")
    e = load_table(spark, sf_dir, "embeddings")
    bq = e.filter(F.col("vec_id") < ADC_BATCH_Q).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    # two single-file micro-batches, mtime-ordered
    half = ADC_BATCH_Q // 2
    for i, cond in enumerate(
        (F.col("qid") < half, F.col("qid") >= half)
    ):
        part = os.path.join(root, f"scratch-{i}")
        bq.filter(cond).coalesce(1).write.mode("overwrite").parquet(part)
        f = next(
            n
            for n in os.listdir(part)
            if n.endswith(".parquet") and not n.startswith(".")
        )
        os.makedirs(qdir, exist_ok=True)
        staged = os.path.join(qdir, f"batch-{i}.parquet")
        os.rename(os.path.join(part, f), staged)
        t = 1_700_000_000 + i * 10
        os.utime(staged, (t, t))

    def serve_batch(batch_df: DataFrame, batch_id: int) -> None:
        _adc_serve_batch(batch_df, cent, codes, cb, members).write.mode(
            "append"
        ).parquet(out_dir)

    stream = (
        spark.readStream.schema("qid long, qv array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(qdir)
    )
    with stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(serve_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out_dir)


# ---------------------------------------------------------------------------
# Streaming quality monitor (per-micro-batch Gopher-rule pass rates)
# ---------------------------------------------------------------------------


def _stream_quality_oracle() -> str:
    from ex_aws_firehose_spark.operators.llm import (
        GOPHER_MAX_MEAN_LEN,
        GOPHER_MAX_TOKENS,
        GOPHER_MIN_MEAN_LEN,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_TOKENS,
        _GOPHER_STOP_SQL,
    )

    return f"""
    WITH cuts AS (
        SELECT count(*) // 3 AS c0, 2 * (count(*) // 3) AS c1
        FROM documents
    ),
    t AS (
        SELECT CASE WHEN doc_id < c.c0 THEN 0
                    WHEN doc_id < c.c1 THEN 1 ELSE 2 END AS batch_id,
               str_split(lower(text), ' ') AS toks,
               length(replace(text, ' ', '')) AS n_chars_ns,
               len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_sym
        FROM documents CROSS JOIN cuts c
    ),
    r AS (
        SELECT batch_id,
               ((len(toks) BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS})
                AND n_chars_ns >= {GOPHER_MIN_MEAN_LEN} * len(toks)
                AND n_chars_ns <= {GOPHER_MAX_MEAN_LEN} * len(toks)
                AND 10 * n_sym < len(toks)
                AND 5 * len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                    >= 4 * len(toks)
                AND len(list_filter(toks,
                        x -> list_contains({_GOPHER_STOP_SQL}, x)))
                    >= {GOPHER_MIN_STOPWORDS}) AS ok
        FROM t
    )
    SELECT CAST(batch_id AS BIGINT) AS batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
                AS BIGINT) AS pass_ppm
    FROM r GROUP BY batch_id
    """


@query(
    "q_stream_quality_monitor",
    oracle=_stream_quality_oracle(),
    tags=("streaming", "quality"),
)
def q_stream_quality_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming QUALITY GATE — the per-tranche dashboard a crawl
    ingest watches: each arriving micro-batch of documents is scored
    against the full Gopher structural battery (the q_quality_gopher
    _rules flags, shared helper) and emits one row per batch —
    (batch_id, n_docs, n_pass, pass_ppm). A pass-rate cliff in one
    tranche = a bad crawl segment or a source gone rotten, caught at
    ingest time rather than at the next full-corpus audit. Arrival
    order = doc_id order (the shared 3-tranche staging), so the oracle
    reproduces each tranche's rate exactly.

    100 TB shape: rule evaluation is map-only codegen inside each
    micro-batch (text never shuffles); per batch only 3 counters
    aggregate. Stateless — monitoring adds nothing to the stream's
    state store."""
    import os

    from ex_aws_firehose_spark.operators.llm import gopher_ok_flags

    src = _docs_range_batches_dir(spark, sf_dir)
    out_dir = _tracked_mkdtemp(prefix="quality_monitor_") + "/out"

    def monitor_batch(batch_df: DataFrame, batch_id: int) -> None:
        flags = batch_df.select(*gopher_ok_flags())
        row = flags.agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(
                    F.col("ok_count")
                    & F.col("ok_mean_len")
                    & F.col("ok_symbol")
                    & F.col("ok_alpha")
                    & F.col("ok_stop"),
                    1,
                ).otherwise(0)
            ).alias("n_pass"),
        ).select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            "n_docs",
            "n_pass",
            F.expr("n_pass * 1000000 div n_docs").alias("pass_ppm"),
        )
        row.write.mode("append").parquet(out_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    with stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(monitor_batch)
            .option("checkpointLocation", _tracked_mkdtemp(prefix="qm_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out_dir)


@query(
    "q_stream_cdc_apply",
    oracle="""
    WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                      event_type, value FROM events),
    ranked AS (
        SELECT user_id, ts, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM e
    )
    SELECT user_id, ts AS last_ts, event_type AS last_event_type,
           cents AS last_cents
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
    tags=("streaming",),
)
def q_stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC changelog APPLY with delete tombstones — the
    Debezium-shaped pattern q_stream_upsert deliberately omits: the
    event stream is read as a changelog where 'error' rows are DELETE
    tombstones for their key and every other row is an upsert. Each
    micro-batch merges into a copy-on-write keyed state image by
    last-writer-wins on event time (ts, event_id); tombstones are
    RETAINED in state (so a delete survives compaction and still beats
    any older update replayed in a later batch) and filtered only at
    read time — exactly how Kafka-compacted topics and Delta CDF
    consumers materialize a current image. Arrival order cannot change
    the result, which is what makes the final image oracle-checkable.

    100 TB shape: with a transactional table format the foreachBatch
    body is one MERGE INTO ... WHEN MATCHED AND s.op = 'D' THEN DELETE;
    state stays hash-partitioned by key so each batch shuffles only
    batch-rows + touched-state. Tombstone retention is the part that
    must survive a rewrite at scale — dropping deletes on compaction
    resurrects older replayed rows."""
    import os

    src = _parity_events_dir(spark, sf_dir)
    root = _tracked_mkdtemp(prefix="cdc_apply_")

    state: dict[str, str | None] = {"dir": None}

    def apply_cdc(batch_df: DataFrame, batch_id: int) -> None:
        cur = (
            spark.read.parquet(state["dir"])
            if state["dir"] is not None
            else spark.createDataFrame(
                [],
                "user_id long, last_ts timestamp, last_event_type string, "
                "last_cents long, event_id long",
            )
        )
        incoming = batch_df.select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
            F.round(F.col("value") * 100, 0).cast("long").alias("last_cents"),
            "event_id",
        )
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(
            F.desc("last_ts"), F.desc("event_id")
        )
        merged = (
            cur.unionByName(incoming)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        new_dir = os.path.join(root, f"state_v{batch_id}")
        merged.write.mode("overwrite").parquet(new_dir)
        state["dir"] = new_dir

    stream = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    with stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(apply_cdc)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return (
        spark.read.parquet(state["dir"])
        .filter(F.col("last_event_type") != "error")
        .select("user_id", "last_ts", "last_event_type", "last_cents")
    )


# Token-bucket admission: records admitted per micro-batch before the
# remainder carries to the next batch's queue.
THROTTLE_R = 3000


@query(
    "q_stream_throttle_carryover",
    oracle=f"""
    WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                      CAST(ROUND(value * 100) AS BIGINT) AS cents
               FROM events),
    b0 AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn
        FROM e WHERE event_id % 2 = 0
    ),
    q1 AS (
        SELECT event_id, ts, user_id, cents FROM b0 WHERE rn > {THROTTLE_R}
        UNION ALL
        SELECT event_id, ts, user_id, cents FROM e WHERE event_id % 2 = 1
    ),
    b1 AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn FROM q1
    ),
    ledger AS (
        SELECT CAST(0 AS BIGINT) AS round, event_id, ts, user_id, cents
        FROM b0 WHERE rn <= {THROTTLE_R}
        UNION ALL
        SELECT CAST(1 AS BIGINT), event_id, ts, user_id, cents
        FROM b1 WHERE rn <= {THROTTLE_R}
        UNION ALL
        SELECT CAST(-1 AS BIGINT), event_id, ts, user_id, cents
        FROM b1 WHERE rn > {THROTTLE_R}
    )
    SELECT round,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(cents) AS BIGINT) AS cents_total,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM ledger GROUP BY round
    """,
    tags=("streaming",),
)
def q_stream_throttle_carryover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throttled admission with carry-over — the rate-limited-sink
    shape behind the reference's buffered delivery (buffer_size /
    buffer_interval, main.tf:24-25) made deterministic: each
    micro-batch unions its arrivals with the queued backlog, admits
    the THROTTLE_R earliest records by event time (ties on event_id),
    and carries the remainder as copy-on-write queue state for the
    next batch; whatever is still queued when input drains reports as
    round −1. Because admission order is (ts, event_id) — not arrival
    order — the per-round ledger is a pure function of the data and
    the arrival split, hence oracle-checkable.

    100 TB shape: the queue state is a keyed parquet frame merged once
    per batch (one ranked window over backlog+arrivals — at scale,
    partition the window by a shard key and give each shard its own
    R-quota so no single partition ranks the global queue); admitted
    records append-only to the ledger sink, so a slow downstream never
    rereads history. This is Firehose's buffering contract as an
    auditable operator instead of an opaque service knob."""
    import os

    src = _parity_events_dir(spark, sf_dir)
    root = _tracked_mkdtemp(prefix="throttle_stream_")
    admitted_dir = os.path.join(root, "admitted")
    state: dict[str, str | None] = {"dir": None}

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        backlog = (
            spark.read.parquet(state["dir"])
            if state["dir"] is not None
            else spark.createDataFrame(
                [], "event_id long, ts timestamp, user_id long, cents long"
            )
        )
        arrivals = batch_df.select(
            "event_id",
            "ts",
            "user_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        from pyspark.sql import Window

        queue = backlog.unionByName(arrivals)
        w = Window.orderBy("ts", "event_id")
        ranked = queue.withColumn("rn", F.row_number().over(w))
        (
            ranked.filter(F.col("rn") <= THROTTLE_R)
            .select(
                F.lit(batch_id).cast("long").alias("round"),
                "event_id",
                "ts",
                "user_id",
                "cents",
            )
            .write.mode("append")
            .parquet(admitted_dir)
        )
        new_dir = os.path.join(root, f"queue_v{batch_id}")
        ranked.filter(F.col("rn") > THROTTLE_R).drop("rn").write.mode(
            "overwrite"
        ).parquet(new_dir)
        state["dir"] = new_dir

    stream = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    with stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(admit)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    leftover = (
        spark.read.parquet(state["dir"])
        .select(
            F.lit(-1).cast("long").alias("round"),
            "event_id",
            "ts",
            "user_id",
            "cents",
        )
    )
    ledger = spark.read.parquet(admitted_dir).unionByName(leftover)
    return ledger.groupBy("round").agg(
        F.count("*").alias("n_records"),
        F.sum("cents").alias("cents_total"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "sink_manifest_commit",
    oracle="""
    WITH b AS (
        SELECT event_id, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    nf AS (
        SELECT CAST(COUNT(DISTINCT event_id % 3) AS BIGINT) AS n_files FROM b
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS value_cents,
           n_files
    FROM b CROSS JOIN nf
    GROUP BY event_type, n_files
    """,
    tags=("streaming", "sink", "manifest"),
)
def sink_manifest_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MANIFEST-COMMITTED sink — the write half of the
    table-format story (q_read_manifest_pruned is the read half, the
    orphan audit the failure half). Each micro-batch's foreachBatch
    writes its data file under a batch-keyed dir FIRST and only then
    appends a one-row manifest entry (path, n_rows, min/max event_id)
    — the transactional ordering every table format uses: a writer
    that dies between the two steps leaves an ORPHAN data file that
    readers never see, because the reader lists the MANIFEST, not the
    directory. This key stages exactly that torn write (a fourth data
    dir with no manifest entry, holding duplicate rows) and reads the
    table manifest-first: the duplicates MUST NOT appear in the
    aggregate, or the hash check against the clean events oracle
    fails. n_files (manifest cardinality = 3 micro-batches) rides
    along as the proof column.

    100 TB shape: the manifest append is one tiny file per commit
    (compact periodically, as Iceberg does its manifest lists);
    data-file writes stay embarrassingly parallel; reader planning is
    manifest-grain. Snapshot isolation falls out: a reader pinned to a
    manifest prefix sees a consistent table regardless of concurrent
    commits."""
    import os

    root = _tracked_mkdtemp(prefix="manifest_sink_")
    src = os.path.join(root, "src")
    data = os.path.join(root, "data")
    man = os.path.join(root, "manifest")
    e = load_table(spark, sf_dir, "events")
    seen = set()
    for slice_id in range(3):
        e.filter(F.col("event_id") % 3 == slice_id).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        seen = _pin_new_mtimes(src, seen, _BATCH_EPOCH + slice_id * 10)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        path = os.path.join(data, f"batch-{batch_id}")
        out = batch_df.select(
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        out.coalesce(1).write.mode("overwrite").parquet(path)
        entry = out.agg(
            F.count("*").alias("n_rows"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        ).select(
            F.lit(path).alias("path"),
            "n_rows",
            "min_id",
            "max_id",
        )
        # ordering is the transaction: data durable BEFORE the entry
        entry.coalesce(1).write.mode("append").parquet(man)

    with stream_shuffle(spark):
        stream = (
            spark.readStream.schema(EVENTS_TS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(commit_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .start()
        )
        q.awaitTermination()

    # the torn write: a data dir with DUPLICATE rows, no manifest entry
    spark.read.parquet(os.path.join(data, "batch-0")).write.mode(
        "overwrite"
    ).parquet(os.path.join(data, "orphan-never-committed"))

    manifest = spark.read.parquet(man)
    paths = [r.path for r in manifest.select("path").collect()]
    n_files = len(paths)
    table = spark.read.option("basePath", data).parquet(*paths)
    return table.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("cents").alias("value_cents"),
    ).select(
        "event_type",
        "n_events",
        "value_cents",
        F.lit(n_files).cast("long").alias("n_files"),
    )


_BUS_REBALANCE_CACHE = None  # lazily-created SessionCache


@query(
    "src_stream_bus_rebalance",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "source", "python", "fault"),
)
def src_stream_bus_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bus SHARD REBALANCE as an oracle-checked key (the Kafka
    add-partition event, promoted from tests/test_bus_source.py into
    the correctness artifacts): a 3-shard topic drains under one
    checkpoint; a FOURTH shard file then appears (repartitioning
    mid-consumption) and a second run over the SAME checkpoint drains
    it. The new shard starts at offset 0 (partitions() start.get
    default), the old shards resume their committed offsets, and the
    union must equal the events table exactly — n_events AND
    n_distinct per type hash-checked, so either a lost record or a
    double-delivery across the topology change breaks the key.

    100 TB shape: rebalance handling is pure offset-dict algebra on
    the driver (new keys appear in latestOffset, absent keys default
    to 0 in partitions()); no executor coordination, no state
    migration — the file-backed topic retains, a broker would trim."""
    import os

    from ex_aws_firehose_spark.caching import SessionCache
    from ex_aws_firehose_spark.sources.bus import (
        BUS_SHARDS,
        register_bus_datasource,
    )

    global _BUS_REBALANCE_CACHE
    if _BUS_REBALANCE_CACHE is None:
        _BUS_REBALANCE_CACHE = SessionCache()
    key = _BUS_REBALANCE_CACHE.scoped_key(spark, sf_dir)
    if key not in _BUS_REBALANCE_CACHE:
        import duckdb

        base = _tracked_mkdtemp(prefix="bus_rebalance_key_")
        root = os.path.join(base, "topic")
        os.makedirs(root, exist_ok=True)
        out = os.path.join(base, "out")
        ckpt = os.path.join(base, "ckpt")
        con = duckdb.connect()
        try:

            def write_shard(shard: int) -> None:
                con.execute(
                    f"""
                    COPY (
                        SELECT event_id, user_id, event_type,
                               CAST(ROUND(value * 100) AS BIGINT) AS cents
                        FROM read_parquet('{sf_dir}/events.parquet')
                        WHERE event_id % {BUS_SHARDS} = {shard}
                        ORDER BY event_id
                    ) TO '{root}/shard-{shard}.parquet'
                    """
                )

            for shard in range(BUS_SHARDS - 1):
                write_shard(shard)
            register_bus_datasource(spark)

            def drain() -> None:
                stream = (
                    spark.readStream.format("bus_topic")
                    .option("path", root)
                    .load()
                )
                q = (
                    stream.writeStream.format("parquet")
                    .option("path", out)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()

            with stream_shuffle(spark):
                drain()
                write_shard(BUS_SHARDS - 1)  # the rebalance event
                drain()
        finally:
            con.close()
        _BUS_REBALANCE_CACHE[key] = out
    return (
        spark.read.parquet(_BUS_REBALANCE_CACHE[key])
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_id").alias("n_distinct"),
            F.sum("cents").alias("cents"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming exponential-histogram sketch (count-mergeable state)
# ---------------------------------------------------------------------------

_SEXPH_PCTS = (50, 90)


def _stream_exph_oracle() -> str:
    ex_rows = " UNION ALL ".join(
        f"SELECT event_type, CAST({p} AS BIGINT) AS p, "
        f"CAST(quantile_disc(cents, {p / 100}) AS BIGINT) AS exact_c "
        "FROM e GROUP BY event_type"
        for p in _SEXPH_PCTS
    )
    pvals = ", ".join(f"({p})" for p in _SEXPH_PCTS)
    return """
    WITH e AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    hist AS (
        SELECT event_type, CAST(length(bin(cents)) AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS nb
        FROM e GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1
    ),
    cumh AS (
        SELECT event_type, bucket,
               CAST(SUM(nb) OVER (PARTITION BY event_type ORDER BY bucket
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM hist
    ),
    """ + f"""
    pcts AS (SELECT * FROM (VALUES {pvals}) AS t(p)),
    est AS (
        SELECT c.event_type, pcts.p, CAST(MIN(c.bucket) AS BIGINT) AS bucket
        FROM pcts, cumh c JOIN tot t ON c.event_type = t.event_type
        WHERE c.cum * 100 >= pcts.p * t.n GROUP BY 1, 2
    ),
    ex AS ({ex_rows})
    SELECT est.event_type, est.p, est.bucket,
           CAST(CASE WHEN est.bucket = 1 THEN 0
                ELSE (CAST(1 AS BIGINT)
                      << CAST(est.bucket - 1 AS INTEGER)) END AS BIGINT)
               AS lo_cents,
           CAST((CAST(1 AS BIGINT) << CAST(est.bucket AS INTEGER)) - 1
                AS BIGINT) AS hi_cents,
           ex.exact_c AS exact_cents
    FROM est JOIN ex ON est.event_type = ex.event_type AND est.p = ex.p
    """


@query(
    "q_stream_exp_histogram",
    oracle=_stream_exph_oracle(),
    tags=("streaming", "sketch"),
)
def q_stream_exp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exponential-histogram sketch — the COUNT-mergeable
    complement to q_stream_sketch_kmv's order-statistic merge: each
    micro-batch folds its per-(event_type, bit-length-bucket) counts
    into the stored state by pure ADDITION (the commutative-monoid
    merge that also fans across datacenters), and the drained state
    answers p50/p90 with the ≤2× relative-error guarantee of
    q_sketch_exp_histogram.  Because count-merge is exact, stream
    state ≡ the one-pass batch histogram, and the oracle recomputes
    the same quantile walk plus the exact order statistics from the
    raw table.  Replay safety: versioned state — a replayed batch
    rewrites ITS version from the same predecessor, so addition never
    double-applies.

    100 TB shape: state is ≤64 rows per group forever; each batch's
    update is one map-side-combined agg + a state-table add.  The
    same sketch serves tumbling windows by keeping one histogram per
    window — eviction is dropping rows, never rescaling."""
    import os

    from pyspark.sql import Window as W

    root = _tracked_mkdtemp(prefix="exph_stream_")
    src = _time_split_events_dir(spark, sf_dir)
    state_dir = os.path.join(root, "state")

    def exph_batch(batch_df: DataFrame, batch_id: int) -> None:
        hb = (
            batch_df.filter(F.col("event_type") != "flush")
            .select(
                "event_type",
                F.length(
                    F.bin(F.round(F.col("value") * 100, 0).cast("long"))
                )
                .cast("long")
                .alias("bucket"),
            )
            .groupBy("event_type", "bucket")
            .agg(F.count("*").alias("nb"))
        )
        prev_dir = os.path.join(state_dir, f"v{batch_id - 1}")
        if os.path.isdir(prev_dir):
            hb = hb.unionByName(spark.read.parquet(prev_dir))
        merged = hb.groupBy("event_type", "bucket").agg(
            F.sum("nb").alias("nb")
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )

    stream = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    with stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(exph_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    last = _latest_state_version(state_dir, "q_stream_exp_histogram")
    state = spark.read.parquet(os.path.join(state_dir, f"v{last}"))
    tot = state.groupBy("event_type").agg(F.sum("nb").alias("n"))
    wcum = W.partitionBy("event_type").orderBy("bucket").rowsBetween(
        W.unboundedPreceding, 0
    )
    cumh = state.select(
        "event_type", "bucket", F.sum("nb").over(wcum).alias("cum")
    )
    pcts = spark.createDataFrame([(p,) for p in _SEXPH_PCTS], "p long")
    est = (
        cumh.join(F.broadcast(tot), "event_type")
        .crossJoin(F.broadcast(pcts))
        .filter(F.col("cum") * 100 >= F.col("p") * F.col("n"))
        .groupBy("event_type", "p")
        .agg(F.min("bucket").alias("bucket"))
    )
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    wide = e.groupBy("event_type").agg(
        *[
            F.expr(
                f"CAST(percentile_disc({p / 100}) WITHIN GROUP "
                "(ORDER BY cents) AS LONG)"
            ).alias(f"e{p}")
            for p in _SEXPH_PCTS
        ]
    )
    stack_args = ", ".join(f"{p}L, e{p}" for p in _SEXPH_PCTS)
    ex = wide.select(
        "event_type",
        F.expr(
            f"stack({len(_SEXPH_PCTS)}, {stack_args}) AS (p, exact_c)"
        ),
    )
    lo = F.expr(
        "CASE WHEN bucket = 1 THEN CAST(0 AS LONG) "
        "ELSE shiftleft(CAST(1 AS LONG), CAST(bucket - 1 AS INT)) END"
    )
    hi = F.expr("shiftleft(CAST(1 AS LONG), CAST(bucket AS INT)) - 1")
    return est.join(ex, ["event_type", "p"]).select(
        "event_type",
        "p",
        "bucket",
        lo.alias("lo_cents"),
        hi.alias("hi_cents"),
        F.col("exact_c").alias("exact_cents"),
    )


# ---------------------------------------------------------------------------
# Streaming graph-ANN query serving (the graph-route twin of
# q_stream_index_serve)
# ---------------------------------------------------------------------------


def _stream_graph_serve_oracle() -> str:
    from ex_aws_firehose_spark.operators.llm import _graph_batch_oracle

    return _graph_batch_oracle()


@query(
    "q_stream_graph_serve",
    oracle=_stream_graph_serve_oracle(),
    tags=("streaming", "llm", "similarity"),
)
def q_stream_graph_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING graph-ANN serving — live query vectors beam-search
    the navigable graph index per micro-batch (the graph-route twin
    of q_stream_index_serve, which serves the IVF-PQ route): the
    session-built edge table loads once, each arriving batch of
    query vectors walks it through the SAME multi-query beam as
    q_sim_graph_ann_batch, results append to the sink. Per-query
    serving is independent of how queries are batched, so the
    drained results are bit-identical to the batch key — whose
    oracle this key replays verbatim (the q_stream_index_serve
    equivalence pattern).

    100 TB / online shape: the index is read-only and shared across
    batches (vec_id-bucketed at scale so each round's point-gather
    prunes to touched buckets); per batch the walk costs
    O(Q·ROUNDS·BEAM·degree) scores — state-free serving, scaling by
    executor count alone."""
    import os

    from ex_aws_firehose_spark.operators.llm import (
        ADC_BATCH_Q,
        TOPK,
        _graph_beam_serve_batch,
        graph_ann_build,
        norm,
    )

    edges = graph_ann_build(spark, sf_dir)
    e = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding", norm("embedding").alias("nrm"))
    )
    root = _tracked_mkdtemp(prefix="graph_serve_")
    qdir = os.path.join(root, "queries")
    out_dir = os.path.join(root, "results")
    bq = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < ADC_BATCH_Q
    ).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    half = ADC_BATCH_Q // 2
    for i, cond in enumerate((F.col("qid") < half, F.col("qid") >= half)):
        part = os.path.join(root, f"scratch-{i}")
        bq.filter(cond).coalesce(1).write.mode("overwrite").parquet(part)
        f = next(
            n
            for n in os.listdir(part)
            if n.endswith(".parquet") and not n.startswith(".")
        )
        os.makedirs(qdir, exist_ok=True)
        staged = os.path.join(qdir, f"batch-{i}.parquet")
        os.rename(os.path.join(part, f), staged)
        t = 1_700_000_000 + i * 10
        os.utime(staged, (t, t))

    from pyspark.sql import Window as W

    def serve_batch(batch_df: DataFrame, batch_id: int) -> None:
        qb = batch_df.select(
            "qid", "qv", norm("qv").alias("qnrm")
        )
        pool = _graph_beam_serve_batch(edges, e, qb)
        wq = W.partitionBy("qid").orderBy(F.desc("c"), "vec_id")
        ns = pool.groupBy("qid").agg(F.count("*").alias("n_scored"))
        (
            pool.withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= TOPK)
            .select("qid", "vec_id", F.col("c").alias("cos_sim"))
            .join(F.broadcast(ns), "qid")
            .write.mode("append")
            .parquet(out_dir)
        )

    stream = (
        spark.readStream.schema("qid long, qv array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(qdir)
    )
    with stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(serve_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out_dir)


# ---------------------------------------------------------------------------
# Streaming graph-ANN index INGEST loop (the last batch/stream asymmetry
# in the index lifecycle: live inserts + serving in one checkpointed
# stream)
# ---------------------------------------------------------------------------


def _stream_graph_upsert_oracle() -> str:
    from ex_aws_firehose_spark.operators.llm import _graph_add_oracle

    return _graph_add_oracle()


def _graph_upsert_batch(
    spark: SparkSession,
    sf_dir: str,
    root: str,
    parts: dict,
    base_w: str,
    batch_df: DataFrame,
    batch_id: int,
    crash_flag: str | None = None,
) -> None:
    """One micro-batch of index maintenance + serving: (1) the batch's
    vectors insert through the FROZEN-descent add path
    (``_graph_add_edges`` — the same machinery as the batch add key,
    so insert semantics are identical), their edge append and vec-id
    roster committed copy-on-write to ``delta_v{batch_id}`` /
    ``added_v{batch_id}``; (2) the SAME stream then serves the query
    over base edges ∪ every delta committed so far, scoring base ∪
    every vector added so far, and overwrites ``serve_v{batch_id}``.
    Accumulated state is discovered from DISK (versions ≤ batch_id),
    and every write is overwrite-mode — a replayed batch recomputes
    the identical delta (insertion is deterministic given the frozen
    base) and its commits are idempotent, the q_stream_ivm_join_delta
    replay-heal contract. ``crash_flag``: fault hook firing AFTER the
    index append, BEFORE serve/commit."""
    import os

    from ex_aws_firehose_spark.operators.llm import (
        TOPK,
        _graph_add_edges,
        _graph_beam_serve,
        norm,
    )

    nb = batch_df.select(
        "vec_id", "embedding", norm("embedding").alias("nrm")
    )
    appended = _graph_add_edges(spark, sf_dir, base_w, parts, batch=nb)
    appended.write.mode("overwrite").parquet(
        os.path.join(root, f"delta_v{batch_id}")
    )
    nb.select("vec_id").write.mode("overwrite").parquet(
        os.path.join(root, f"added_v{batch_id}")
    )
    if (
        crash_flag is not None
        and batch_id == 0
        and os.path.exists(crash_flag)
    ):
        os.remove(crash_flag)
        raise RuntimeError(
            "injected crash: index appended, serve/commit pending"
        )
    versions = sorted(
        int(d[len("delta_v"):])
        for d in os.listdir(root)
        if d.startswith("delta_v")
        and int(d[len("delta_v"):]) <= batch_id
    )
    delta = spark.read.parquet(
        *[os.path.join(root, f"delta_v{v}") for v in versions]
    )
    added = spark.read.parquet(
        *[os.path.join(root, f"added_v{v}") for v in versions]
    )
    edges2 = (
        parts["edges"].unionByName(delta).distinct().localCheckpoint()
    )
    e_added = (
        load_table(spark, sf_dir, "embeddings")
        .join(added, "vec_id", "left_semi")
        .select("vec_id", "embedding", norm("embedding").alias("nrm"))
    )
    score_e = parts["e"].unionByName(e_added)
    pool = _graph_beam_serve(spark, sf_dir, edges2, score_e, parts["e"])
    n_added = added.agg(F.count("*").alias("n_added"))
    n_app = delta.distinct().agg(F.count("*").alias("n_edges_appended"))
    total = pool.agg(F.count("*").alias("n_scored"))
    (
        pool.orderBy(F.desc("c"), "vec_id")
        .limit(TOPK)
        .select("vec_id", F.col("c").alias("cos_sim"))
        .crossJoin(F.broadcast(n_added))
        .crossJoin(F.broadcast(n_app))
        .crossJoin(F.broadcast(total))
        .write.mode("overwrite")
        .parquet(os.path.join(root, f"serve_v{batch_id}"))
    )


def _graph_upsert_stream_run(
    spark: SparkSession,
    sf_dir: str,
    root: str,
    crash_flag: str | None = None,
) -> None:
    """Stage the new-vector batches, build the frozen base index, and
    drain the checkpointed insert+serve stream."""
    import os

    from ex_aws_firehose_spark.operators.llm import (
        INC_ADD_MOD,
        _graph_ann_parts,
    )

    base_w = f"vec_id % {INC_ADD_MOD} != {INC_ADD_MOD - 1}"
    parts = _graph_ann_parts(spark, sf_dir, where=base_w)
    src = os.path.join(root, "src")
    if not os.path.isdir(src):
        nb_all = (
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") != 0)
            .filter(f"NOT ({base_w})")
            .select("vec_id", "embedding")
        )
        seen = set()
        for i, half in enumerate(
            (INC_ADD_MOD - 1, 2 * INC_ADD_MOD - 1)
        ):
            nb_all.filter(
                F.col("vec_id") % (2 * INC_ADD_MOD) == half
            ).coalesce(1).write.mode("append").parquet(src)
            seen = _pin_new_mtimes(src, seen, _BATCH_EPOCH + i * 10)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    with stream_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: _graph_upsert_batch(
                    spark, sf_dir, root, parts, base_w, df, bid,
                    crash_flag,
                )
            )
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


@query(
    "q_stream_graph_upsert",
    oracle=_stream_graph_upsert_oracle(),
    tags=("streaming", "llm", "similarity", "index", "maintenance"),
)
def q_stream_graph_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING graph-index INGEST loop — the production vector-store
    shape (continuous crawl ingest) and the last batch/stream
    asymmetry in the index lifecycle: micro-batches of NEW vectors
    INSERT into the frozen-base navigable graph via the exact
    frozen-descent add path of q_sim_graph_ann_add (ladder routing
    against frozen layers, candidate-bounded hub scoring,
    degree-bounded new→base edge append — batch members never join
    the layers), AND the same checkpointed stream SERVES the query
    after every insert, over base edges ∪ all committed deltas with
    base ∪ all added vectors scorable. Edge deltas and vec-id rosters
    commit copy-on-write per micro-batch (delta_v{i}/added_v{i},
    overwrite-mode), accumulated state is re-discovered from disk, so
    a crash between the index append and the checkpoint commit heals
    on replay — identical delta recomputed, idempotent overwrite —
    pinned in tests/test_streaming.py next to the ivm-join heal.
    Because inserts are ARRIVAL-ORDER-INDEPENDENT (new→base only, the
    q_sim_graph_ann_add law), the post-drain serve is bit-identical
    to the one-shot batch add — this key replays q_sim_graph_ann_add's
    oracle VERBATIM (the q_stream_graph_serve equivalence pattern).

    100 TB / online shape: per micro-batch the insert is O(batch) —
    layer-codebook broadcasts for routing, candidate-join hub
    scoring, one bounded-degree partition-local edge append; the base
    index is never rewritten; serving cost is unchanged
    (O(hubs + ROUNDS·BEAM·degree)). State on disk is the edge delta
    (≤ (K1+K2)·2·|added| rows) — the index IS the state, no
    state-store blowup with stream length."""
    import os

    root = _tracked_mkdtemp(prefix="graph_upsert_")
    _graph_upsert_stream_run(spark, sf_dir, root)
    last = _latest_state_version_prefixed_name(
        root, "serve_v", "q_stream_graph_upsert"
    )
    return spark.read.parquet(os.path.join(root, f"serve_v{last}"))


def _latest_state_version_prefixed_name(
    root: str, prefix: str, key: str
) -> int:
    """Highest ``{prefix}<N>`` under a versioned foreachBatch root."""
    import os

    versions = (
        [
            int(d[len(prefix):])
            for d in os.listdir(root)
            if d.startswith(prefix)
        ]
        if os.path.isdir(root)
        else []
    )
    if not versions:
        raise RuntimeError(
            f"{key}: the drain produced no {prefix}* commits under {root}"
        )
    return max(versions)
