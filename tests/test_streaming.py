"""Streaming mechanics tests (SURVEY.md §5.2(4)): native watermark
semantics, session windows, and checkpoint-restart idempotence — the
Structured-Streaming behaviors that the oracle-checked queries can't
capture deterministically."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from ex_aws_firehose_spark.streaming.pipeline import (
    prepare_source_files,
    run_stream,
)

TS_SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, TS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_native_watermark_drops_late_rows(spark):
    """withWatermark + append-mode windowed agg: a window is emitted
    once the watermark passes its end, and late rows behind the
    watermark do not resurrect it."""
    import datetime as dt

    root = tempfile.mkdtemp(prefix="wm_test_")
    src, out = os.path.join(root, "src"), "wm_out_table"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # batch 1: two events in window [00:00, 00:10), one at 00:25
    _write_batch(
        spark,
        src,
        [(1, ts(1), 1, 1.0), (2, ts(2), 1, 1.0), (3, ts(25), 1, 1.0)],
    )
    stream = (
        spark.readStream.schema(TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(out)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    # watermark after batch 1 = 00:25 - 5 min = 00:20 > 00:10 → the
    # first window finalizes; a late row at 00:03 must be dropped.
    _write_batch(spark, src, [(4, ts(3), 1, 1.0)])
    q.processAllAvailable()
    # advance watermark far enough to flush the remaining window too
    _write_batch(spark, src, [(5, ts(60), 1, 1.0)])
    q.processAllAvailable()
    q.stop()

    rows = {
        r["w"]["start"].minute: r["n"]
        for r in spark.table(out).collect()
    }
    assert rows[0] == 2  # late event 4 did NOT bump this to 3
    assert rows[20] == 1


def test_streaming_session_window_append(spark):
    """Stateful session windows under append mode: sessions close only
    when the watermark passes gap-end; a second batch within the gap
    extends the session instead of opening a new one."""
    import datetime as dt

    root = tempfile.mkdtemp(prefix="sess_test_")
    src, out = os.path.join(root, "src"), "sess_out_table"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    _write_batch(spark, src, [(1, ts(0), 7, 1.0), (2, ts(5), 7, 1.0)])
    stream = (
        spark.readStream.schema(TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 minute")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(out)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    # extends the open session (9 < 5+10), then a far event closes it
    _write_batch(spark, src, [(3, ts(9), 7, 1.0)])
    q.processAllAvailable()
    _write_batch(spark, src, [(4, ts(120), 7, 1.0)])
    q.processAllAvailable()
    q.stop()

    done = spark.table(out).collect()
    assert len(done) == 1  # only the closed session emitted
    assert done[0]["n"] == 3  # all three merged into one session


def test_checkpoint_restart_no_duplicates(spark, smoke_dir):
    """Restarting the tri-sink delivery stream over a committed
    checkpoint re-executes nothing (exactly-once sink contents)."""
    root = tempfile.mkdtemp(prefix="ckpt_test_")
    paths = prepare_source_files(spark, smoke_dir, root)
    n1 = run_stream(spark, paths)
    count1 = spark.read.parquet(paths.primary).count()
    n2 = run_stream(spark, paths)  # restart, no new files
    count2 = spark.read.parquet(paths.primary).count()
    assert n1 >= 1
    assert n2 == 0
    assert count1 == count2
    distinct = (
        spark.read.parquet(paths.primary).select("record_id").distinct().count()
    )
    assert distinct == count1
