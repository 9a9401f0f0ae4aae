"""Differential-test harness: run a registered query on Spark and its
oracle SQL on DuckDB over the same parquet tables, and compare the way
the driver does — row count, schema (column names), and an
order-insensitive value comparison (exact, including floats — queries
are required to round any float whose bit-pattern could differ between
engines)."""

from __future__ import annotations

import math
import time
from dataclasses import dataclass

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ex_aws_firehose_spark.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh DuckDB connection with every table registered as a view —
    same contract as the driver's oracle runner."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, datetimes at µs precision,
    rows sorted by every column (nulls last), index dropped."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # arrays / lists (incl. DuckDB's numpy arrays) → tuple for
            # sortability & equality
            pdf[c] = s.map(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple, np.ndarray))
                else v
            )
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            pdf[c] = s.astype("boolean")
    pdf = pdf.sort_values(by=list(pdf.columns), na_position="last", kind="mergesort")
    return pdf.reset_index(drop=True)


@dataclass
class CompareResult:
    key: str
    ok: bool
    detail: str

    def __bool__(self) -> bool:
        return self.ok


def _has_unhashable(s: pd.Series) -> bool:
    if s.dtype != object:
        return False
    return bool(
        s.map(lambda v: isinstance(v, (list, tuple, np.ndarray, dict))).any()
    )


def compare_frames(key: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    if len(spark_pdf) != len(oracle_pdf):
        return CompareResult(key, False, f"row count {len(spark_pdf)} != {len(oracle_pdf)}")
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return CompareResult(
            key,
            False,
            f"columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}",
        )
    # The external driver's canonicalizer sort_values the raw frame and
    # hashes it — list/array/struct cells crash it ("unhashable type"),
    # so an oracle-checked query must emit only scalar columns.
    for side, pdf in (("spark", spark_pdf), ("oracle", oracle_pdf)):
        for c in pdf.columns:
            if _has_unhashable(pdf[c]):
                return CompareResult(
                    key,
                    False,
                    f"col {c} ({side}) carries array/struct values — the "
                    "driver canonicalizer cannot hash lists; emit scalars",
                )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for c in a.columns:
        sa, sb = a[c], b[c]
        fa_f, fb_f = (
            pd.api.types.is_float_dtype(sa),
            pd.api.types.is_float_dtype(sb),
        )
        # The driver's value hash is dtype-sensitive: DuckDB widening
        # SUM(BIGINT)→HUGEINT lands as float64 while Spark emits int64,
        # and the hashes differ even when values are equal. Treat any
        # float-vs-integer split as a failure so the local gate predicts
        # the driver's gate.
        if fa_f != fb_f:
            return CompareResult(
                key,
                False,
                f"col {c}: dtype mismatch spark={sa.dtype} oracle={sb.dtype} "
                "(driver hash is type-sensitive — CAST the oracle, e.g. "
                "CAST(SUM(...) AS BIGINT))",
            )
        if fa_f:
            fa = sa.astype(float).to_numpy()
            fb = sb.astype(float).to_numpy()
            for i, (x, y) in enumerate(zip(fa, fb)):
                both_nan = math.isnan(x) and math.isnan(y)
                if not both_nan and x != y:
                    return CompareResult(
                        key, False, f"col {c} row {i}: {x!r} != {y!r} (float mismatch)"
                    )
        else:
            neq = ~((sa == sb) | (sa.isna() & sb.isna()))
            if bool(neq.any()):
                i = int(neq.idxmax())
                return CompareResult(
                    key, False, f"col {c} row {i}: {sa[i]!r} != {sb[i]!r}"
                )
    return CompareResult(key, True, "match")


# Spark-side wall seconds per key, recorded by every run_differential
# call (build + toPandas only — DuckDB and the comparison are excluded).
# tests/test_perf_budget.py reads this after the oracle sweep to catch
# per-key cost creep at commit time (VERDICT r6 ask #3).
SPARK_TIMINGS: dict[str, float] = {}


def run_differential(
    spark: SparkSession, sf_dir: str, key: str, fn, oracle: str
) -> CompareResult:
    t0 = time.perf_counter()
    sdf: DataFrame = fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    SPARK_TIMINGS[key] = time.perf_counter() - t0
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle).df()
    finally:
        con.close()
    return compare_frames(key, spark_pdf, oracle_pdf)
