"""Property-based differential for the CloudWatch filter-pattern
compiler (functions/filter_pattern.py): random patterns from the DSL
grammar × random messages/JSON payloads, asserting the Spark backend
and the DuckDB backend select IDENTICAL row sets — the one AST, two
backends invariant the oracle-checked keys rely on.

Each example evaluates a BATCH of generated patterns as predicate
columns in one Spark collect and one DuckDB query, so hypothesis gets
many patterns per Spark round-trip."""

from __future__ import annotations

import json

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ex_aws_firehose_spark.functions.filter_pattern import compile_pattern

_WORDS = ["ERROR", "WARN", "info", "retry", "api", "x1", "a_b", "Err-2"]
_PHRASES = ["ERROR budget", "not a real error", "a  b", "-dash start"]

_term = st.builds(
    lambda mod, quoted, w, p: f'{mod}"{p}"' if quoted else f"{mod}{w}",
    st.sampled_from(["", "?", "-"]),
    st.booleans(),
    st.sampled_from(_WORDS),
    st.sampled_from(_PHRASES),
)
_term_pattern = st.lists(_term, min_size=1, max_size=4).map(" ".join)

_path = st.sampled_from(["$.k", "$.tag", "$.nested.a[0]", "$.nested.a[1]", "$.missing"])
_num = st.sampled_from(["0", "7", "40", "87", "-3", "100.5"])
_strv = st.sampled_from(["UpdateItem", "Update*", "*Item", "retry", "a b"])


@st.composite
def _comparison(draw):
    p = draw(_path)
    kind = draw(st.sampled_from(["num", "str", "exists", "not_exists", "null"]))
    if kind == "num":
        return f"{p} {draw(st.sampled_from(['=', '!=', '<', '<=', '>', '>=']))} {draw(_num)}"
    if kind == "str":
        return f'{p} {draw(st.sampled_from(["=", "!="]))} "{draw(_strv)}"'
    if kind == "exists":
        return f"{p} EXISTS"
    if kind == "not_exists":
        return f"{p} NOT EXISTS"
    return f"{p} IS NULL"


@st.composite
def _json_expr(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        return draw(_comparison())
    op = draw(st.sampled_from(["&&", "||"]))
    a = draw(_json_expr(depth=depth - 1))
    b = draw(_json_expr(depth=depth - 1))
    return f"({a} {op} {b})"


_json_pattern = _json_expr().map(lambda e: "{ " + e + " }")
_pattern = st.one_of(_term_pattern, _json_pattern)

_MESSAGES = [
    'ERROR budget exceeded for "api"',
    "WARN retry retry retry",
    "info ERRORs are not a real error",
    "x1 a_b Err-2 -dash start here",
    "plain text only",
    "",
]
_PROPS = [
    '{"k": 87, "tag": "UpdateItem"}',
    '{"k": 7, "tag": "retry"}',
    '{"k": null, "nested": {"a": [5, 6]}}',
    '{"k": -3.5, "tag": "a b"}',
    '{"tag": "Update"}',
    "not json at all",
    "",
]
_ROWS = [(i, m, p) for i, (m, p) in enumerate(
    (m, p) for m in _MESSAGES for p in _PROPS
)]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_pattern, min_size=1, max_size=8, unique=True))
def test_backends_select_identical_rows(spark, patterns):
    from pyspark.sql import functions as F

    compiled = [compile_pattern(p) for p in patterns]
    df = spark.createDataFrame(_ROWS, "rid long, message string, props string")
    cols = [
        cp.column(message=F.col("message"), json=F.col("props"))
        .alias(f"p{i}")
        for i, cp in enumerate(compiled)
    ]
    spark_rows = df.select("rid", *cols).collect()
    got = {
        i: {r.rid for r in spark_rows if r[f"p{i}"]}
        for i in range(len(compiled))
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?, ?)" for _ in _ROWS)
        + ") v(rid, message, props)",
        [x for row in _ROWS for x in row],
    )
    sels = ", ".join(
        f"COALESCE(({cp.duckdb_sql(message='message', json='props')}), FALSE)"
        f" AS p{i}"
        for i, cp in enumerate(compiled)
    )
    want_rows = con.execute(f"SELECT rid, {sels} FROM t").fetchall()
    for i, pat in enumerate(patterns):
        want = {r[0] for r in want_rows if r[i + 1]}
        assert got[i] == want, (
            f"pattern {pat!r}: spark={sorted(got[i])} duckdb={sorted(want)}"
        )
