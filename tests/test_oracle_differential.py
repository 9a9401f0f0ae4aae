"""The correctness gate, run locally: every registered query with an
oracle must match DuckDB at sf0.01 (same check the driver performs).
Queries without an oracle must at least execute and return a stable
schema."""

from __future__ import annotations

import pytest

from ex_aws_firehose_spark.registry import REGISTRY, load_all_operators
from ex_aws_firehose_spark.testing import run_differential

load_all_operators()

WITH_ORACLE = sorted(k for k, q in REGISTRY.items() if q.oracle)
NO_ORACLE = sorted(k for k, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("key", WITH_ORACLE)
def test_oracle_match(spark, sf_dir, key):
    q = REGISTRY[key]
    res = run_differential(spark, sf_dir, key, q.fn, q.oracle)
    assert res.ok, f"{key}: {res.detail}"


@pytest.mark.parametrize("key", NO_ORACLE)
def test_rows_only(spark, sf_dir, key):
    q = REGISTRY[key]
    df = q.fn(spark, sf_dir)
    rows = df.count()
    assert rows >= 0
    assert len(df.schema.fields) > 0
