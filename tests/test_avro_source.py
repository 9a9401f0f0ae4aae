"""Pure-Python Avro OCF writer/reader (sources/avro.py) — wire-format
unit tests. The registry key `src_format_avro` gets the full
rows+schema+hash differential in tests/test_oracle_differential.py;
these cover the format corners that one fixture shape doesn't reach."""

from __future__ import annotations

import io
import struct

import pytest

from ex_aws_firehose_spark.sources.avro import (
    SYNC_MARKER,
    _decode_long,
    _encode_long,
    _iter_ocf_rows,
    write_avro_ocf,
)

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
    ],
}

ROWS = [
    (0, "", 0.0, False),
    (-1, "héllo ⚡", -1.5, True),
    (2**62, "x" * 300, float("inf"), False),
    (-(2**62), "y", 2.2250738585072014e-308, True),
]


@pytest.mark.parametrize("n", [0, 1, -1, 63, -64, 2**31, -(2**31), 2**62, -(2**62)])
def test_zigzag_varint_roundtrip(n):
    assert _decode_long(io.BytesIO(_encode_long(n))) == n


@pytest.mark.parametrize("codec", ["deflate", "null"])
def test_ocf_roundtrip(tmp_path, codec):
    p = str(tmp_path / "t.avro")
    write_avro_ocf(p, SCHEMA, ROWS, codec=codec)
    assert list(_iter_ocf_rows(p)) == ROWS


def test_multi_block(tmp_path):
    p = str(tmp_path / "t.avro")
    rows = [(i, f"s{i}", i / 3.0, i % 2 == 0) for i in range(10_000)]
    write_avro_ocf(p, SCHEMA, rows, rows_per_block=512)
    assert list(_iter_ocf_rows(p)) == rows


def test_corrupt_sync_marker_detected(tmp_path):
    p = str(tmp_path / "t.avro")
    write_avro_ocf(p, SCHEMA, ROWS)
    raw = bytearray(open(p, "rb").read())
    # flip a byte of the LAST sync marker (trailing 16 bytes)
    raw[-1] ^= 0xFF
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="sync marker"):
        list(_iter_ocf_rows(p))


def test_not_avro_rejected(tmp_path):
    p = str(tmp_path / "t.avro")
    open(p, "wb").write(b"PAR1 definitely not avro")
    with pytest.raises(ValueError, match="not an Avro"):
        list(_iter_ocf_rows(p))


def test_unsupported_type_raises_at_schema_time(tmp_path, spark):
    from ex_aws_firehose_spark.sources.avro import register_avro_datasource

    bad = {
        "type": "record",
        "name": "t",
        # a THREE-way union — only ["null", T] unions are supported
        "fields": [{"name": "u", "type": ["null", "long", "string"]}],
    }
    p = str(tmp_path / "bad.avro")
    # hand-write header only (writer would reject the union encoder too)
    import json

    from ex_aws_firehose_spark.sources.avro import _encode_str

    with open(p, "wb") as f:
        f.write(b"Obj\x01")
        f.write(_encode_long(2))
        f.write(_encode_str("avro.schema"))
        f.write(_encode_str(json.dumps(bad)))
        f.write(_encode_str("avro.codec"))
        f.write(_encode_str("null"))
        f.write(_encode_long(0))
        f.write(SYNC_MARKER)
    register_avro_datasource(spark)
    with pytest.raises(Exception, match="unsupported avro type"):
        spark.read.format("avro_ocf").load(p).schema


def test_spark_reads_shards_in_parallel(tmp_path, spark):
    """Files below split_size: 3 files → 3 partitions (one each)."""
    from ex_aws_firehose_spark.sources.avro import register_avro_datasource

    for i in range(3):
        write_avro_ocf(
            str(tmp_path / f"part-{i}.avro"),
            SCHEMA,
            [(i * 10 + j, f"r{j}", float(j), True) for j in range(5)],
        )
    register_avro_datasource(spark)
    df = spark.read.format("avro_ocf").load(str(tmp_path))
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 15
    assert df.schema.simpleString() == (
        "struct<a:bigint,s:string,d:double,b:boolean>"
    )


# ---------------------------------------------------------------------------
# sync-marker byte-range splits (round 8): exactly-once block coverage
# ---------------------------------------------------------------------------


def _write_big(tmp_path, n=20_000, rows_per_block=256):
    p = str(tmp_path / "big.avro")
    rows = [(i, f"s{i}", i / 7.0, i % 3 == 0) for i in range(n)]
    write_avro_ocf(p, SCHEMA, rows, rows_per_block=rows_per_block)
    return p, rows


@pytest.mark.parametrize("split", [777, 4096, 30_000, 10**9])
def test_byte_range_splits_cover_exactly_once(tmp_path, split):
    """Every block is read by exactly one [start,end) range — the
    Hadoop FileSplit contract, at split sizes that land mid-block,
    mid-sync, and beyond-EOF."""
    import os

    p, rows = _write_big(tmp_path)
    size = os.path.getsize(p)
    got = []
    for off in range(0, size, split):
        got.extend(_iter_ocf_rows(p, off, min(off + split, size)))
    assert sorted(got) == rows


def test_split_boundary_at_exact_block_start(tmp_path):
    """A split starting exactly at a block start owns that block (its
    sync ends at `start`); the previous split must not re-read it."""
    from ex_aws_firehose_spark.sources.avro import _iter_ocf_blocks

    p, rows = _write_big(tmp_path, n=2_000, rows_per_block=100)
    # enumerate true block starts from a full scan
    starts = []
    pos = None
    with open(p, "rb") as f:
        from ex_aws_firehose_spark.sources.avro import (
            _decode_long,
            _read_header,
        )

        _schema, _codec, sync, data_start = _read_header(f)
        pos = data_start
        import os as _os
        import zlib as _zlib  # noqa: F401

        size = _os.fstat(f.fileno()).st_size
        while pos < size:
            starts.append(pos)
            f.seek(pos)
            _decode_long(f)
            nb = _decode_long(f)
            pos = f.tell() + nb + 16
    assert len(starts) >= 3
    cut = starts[2]  # a genuine block start
    left = list(_iter_ocf_rows(p, 0, cut))
    right = list(_iter_ocf_rows(p, cut, 10**9))
    assert left + right == rows
    # the cut block is in `right` only
    n_blocks_right = sum(1 for _ in _iter_ocf_blocks(p, cut, 10**9))
    assert n_blocks_right == len(starts) - 2


def test_spark_splits_one_big_file(tmp_path, spark):
    """A single multi-block container file with a small split_size
    yields >1 input partition AND the exact row set — the 100 TB
    few-giant-files shape."""
    from ex_aws_firehose_spark.sources.avro import register_avro_datasource

    p, rows = _write_big(tmp_path, n=30_000)
    register_avro_datasource(spark)
    df = (
        spark.read.format("avro_ocf")
        .option("split_size", 16384)
        .load(p)
    )
    nparts = df.rdd.getNumPartitions()
    assert nparts > 4, f"expected many byte-range splits, got {nparts}"
    got = sorted(
        (r.a, r.s, r.d, r.b) for r in df.collect()
    )
    assert got == rows


NULLABLE_SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": ["double", "null"]},  # either branch order
    ],
}

NULLABLE_ROWS = [
    (1, "x", 1.5),
    (2, None, None),
    (3, "", -0.0),
    (4, None, 2.25),
]


@pytest.mark.parametrize("codec", ["deflate", "null"])
def test_nullable_union_roundtrip(tmp_path, codec):
    p = str(tmp_path / "n.avro")
    write_avro_ocf(p, NULLABLE_SCHEMA, NULLABLE_ROWS, codec=codec)
    assert list(_iter_ocf_rows(p)) == NULLABLE_ROWS


def test_spark_reads_nullable_unions(tmp_path, spark):
    """["null", T] unions map to nullable Spark columns; Arrow batches
    carry the nulls through."""
    from ex_aws_firehose_spark.sources.avro import register_avro_datasource

    p = str(tmp_path / "n.avro")
    write_avro_ocf(p, NULLABLE_SCHEMA, NULLABLE_ROWS)
    register_avro_datasource(spark)
    df = spark.read.format("avro_ocf").load(p)
    assert df.schema.simpleString() == "struct<a:bigint,s:string,d:double>"
    got = sorted(
        (r.a, r.s, r.d) for r in df.collect()
    )
    assert got == NULLABLE_ROWS
