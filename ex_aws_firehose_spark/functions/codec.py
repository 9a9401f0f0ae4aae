"""Gzip codec as Arrow-vectorized pandas UDFs.

Spark SQL has no built-in gzip scalar function (SURVEY.md §4.3 item 1 —
the one genuinely custom piece of the reference's decode chain,
cf. reference lambda/main.py:74: ``json.loads(gzip.decompress(
base64.b64decode(record['data'])))``).  base64 and JSON parsing stay
JVM-side (`F.unbase64` / `F.from_json`); only the gzip hop crosses into
Python, Arrow-batched.

Determinism: compression pins mtime=0 and a fixed level so synthesized
fixture bytes are bit-stable across runs/machines.
"""

from __future__ import annotations

import gzip

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.BinaryType())
def gzip_compress(data: pd.Series) -> pd.Series:
    """bytes -> gzip bytes (deterministic: mtime=0, level 6)."""
    return data.map(
        lambda b: None if b is None else gzip.compress(bytes(b), 6, mtime=0)
    )


@F.pandas_udf(T.BinaryType())
def gzip_decompress(data: pd.Series) -> pd.Series:
    """gzip bytes -> bytes; nulls and *undecodable* inputs yield null so
    a corrupt record dead-letters (ProcessingFailed → error sink, the
    reference's error-log route) instead of failing the whole batch."""

    def _safe(b: object) -> bytes | None:
        if b is None:
            return None
        try:
            return gzip.decompress(bytes(b))
        except (OSError, EOFError, ValueError):
            return None

    return data.map(_safe)
