"""bus_topic streaming source (sources/bus.py): offset planning,
chunked admission control, and commit-based replay. Row-level parity
with the events table is covered by tests/test_oracle_differential.py
(`src_stream_bus_topic`); here we pin the CONNECTOR contract — the
offset/commit semantics a bus consumer owes its sink.

Throttled mode (`chunk > 0`) is driven as a sequence of
Trigger.AvailableNow runs: each run captures latestOffset once (one
chunk per shard), processes it, commits, and stops — so drain
boundaries are deterministic, unlike a continuous trigger racing
processAllAvailable."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from ex_aws_firehose_spark.sources.bus import register_bus_datasource

N_SMOKE = 1000  # sf0.001 events rows


@pytest.fixture(scope="module")
def topic(spark, smoke_dir):
    from ex_aws_firehose_spark.streaming.queries import bus_topic_dir

    root = bus_topic_dir(spark, smoke_dir)
    register_bus_datasource(spark)
    return root


def _available_now_run(spark, root, chunk, out, ckpt) -> None:
    # consumer-group id derived from the checkpoint dir: each test's
    # checkpoint is its own consumer group (Kafka: fresh group.id =
    # fresh consumption; the group cursor lives topic-side)
    group = os.path.basename(os.path.dirname(ckpt))
    stream = (
        spark.readStream.format("bus_topic")
        .option("path", root)
        .option("chunk", str(chunk))
        .option("group", group)
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


def _count(spark, out) -> int:
    try:
        return spark.read.parquet(out).count()
    except Exception:
        return 0  # sink dir not created yet


def test_chunked_polls_drain_in_multiple_batches(spark, topic):
    """With chunk=100 a continuous-trigger consumer admits ≤ 400
    records per poll (4 shards), so the 1000-record topic MUST take ≥ 3
    micro-batches to drain — and land exactly once. (A fresh
    availableNow run captures latest once → one chunk per RUN; the
    per-poll advance lives within one query's lifetime, so this is the
    one test driven by a live query polled to completion.)"""
    import time

    base = tempfile.mkdtemp(prefix="bus_test_")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    stream = (
        spark.readStream.format("bus_topic")
        .option("path", topic)
        .option("chunk", "100")
        .option("group", os.path.basename(base))
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    deadline = time.time() + 120
    while _count(spark, out) < N_SMOKE and time.time() < deadline:
        time.sleep(0.5)
    n_batches = max(
        (p["batchId"] for p in (q.recentProgress or []) if p), default=-1
    ) + 1
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == N_SMOKE
    assert got.agg(F.count_distinct("event_id")).first()[0] == N_SMOKE
    assert n_batches >= 3, n_batches


def test_restart_after_full_drain_appends_nothing(spark, topic):
    """Exactly-once across restart: a consumer over a fully-committed
    checkpoint sees latest == committed and re-emits nothing."""
    base = tempfile.mkdtemp(prefix="bus_test_")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    _available_now_run(spark, topic, 0, out, ckpt)  # unthrottled drain
    assert _count(spark, out) == N_SMOKE
    _available_now_run(spark, topic, 0, out, ckpt)  # restart, no-op
    _available_now_run(spark, topic, 0, out, ckpt)  # and again
    got = spark.read.parquet(out)
    assert got.count() == N_SMOKE
    assert got.agg(F.count_distinct("event_id")).first()[0] == N_SMOKE


def test_mid_topic_stop_then_unthrottled_resume(spark, topic):
    """Stop a throttled consumer mid-topic, resume unthrottled over the
    same checkpoint: the committed offsets carry over — no loss, no
    duplicates, regardless of consumption mode."""
    base = tempfile.mkdtemp(prefix="bus_test_")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    _available_now_run(spark, topic, 100, out, ckpt)
    partial = _count(spark, out)
    assert 0 < partial < N_SMOKE, partial
    _available_now_run(spark, topic, 0, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == N_SMOKE
    assert got.agg(F.count_distinct("event_id")).first()[0] == N_SMOKE


def _write_shard(root: str, shard: int, lo: int, hi: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = list(range(lo, hi))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "user_id": pa.array([i % 50 for i in ids], pa.int64()),
                "event_type": pa.array(
                    ["view" if i % 2 else "click" for i in ids]
                ),
                "cents": pa.array([i * 7 for i in ids], pa.int64()),
            }
        ),
        os.path.join(root, f"shard-{shard}.parquet"),
    )


def test_shard_added_between_runs_no_loss_no_duplication(spark):
    """Shard REBALANCE (the Kafka add-partition event every consumer
    must survive): a new shard file appears between availableNow runs.
    The next run's latestOffset includes it; partitions() starts the
    unseen shard at offset 0 (start.get default) while resuming the
    old shards at their committed offsets — exactly-once across the
    topology change, in both unthrottled and throttled modes."""
    register_bus_datasource(spark)
    base = tempfile.mkdtemp(prefix="bus_rebalance_")
    root = os.path.join(base, "topic")
    os.makedirs(root)
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    _write_shard(root, 0, 0, 300)
    _write_shard(root, 1, 300, 600)
    _write_shard(root, 2, 600, 800)
    _available_now_run(spark, root, 0, out, ckpt)
    assert _count(spark, out) == 800
    _write_shard(root, 3, 800, 1000)  # rebalance: shard-3 appears
    _available_now_run(spark, root, 0, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 1000
    assert got.agg(F.count_distinct("event_id")).first()[0] == 1000
    # idempotence after the topology change
    _available_now_run(spark, root, 0, out, ckpt)
    assert _count(spark, out) == 1000


def test_shard_added_mid_throttled_drain(spark):
    """Rebalance while a THROTTLED consumer is mid-topic: committed
    offsets for old shards carry over, the new shard drains from 0 in
    chunked polls — total lands exactly once."""
    register_bus_datasource(spark)
    base = tempfile.mkdtemp(prefix="bus_rebalance_thr_")
    root = os.path.join(base, "topic")
    os.makedirs(root)
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    _write_shard(root, 0, 0, 500)
    _write_shard(root, 1, 500, 900)
    _available_now_run(spark, root, 150, out, ckpt)  # one chunk/shard
    partial = _count(spark, out)
    assert 0 < partial < 900, partial
    _write_shard(root, 2, 900, 1200)  # rebalance mid-drain
    for _ in range(8):  # chunked runs until drained
        _available_now_run(spark, root, 150, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 1200
    assert got.agg(F.count_distinct("event_id")).first()[0] == 1200
