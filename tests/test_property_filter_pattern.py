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


# ---------------------------------------------------------------------------
# space-delimited (column) pattern family
# ---------------------------------------------------------------------------

_COL_NUMS = ["0", "99", "404", "-3", "100.5"]
_COL_WORDS = ["GET", "alice", "a_b", "10.0.0.1", "12/May 10:00"]
_COL_WILD = ["4*", "*e", "G*T", "*", "1*.0.0.*"]


@st.composite
def _col_cmp(draw, name):
    kind = draw(st.sampled_from(["num", "word", "wild"]))
    if kind == "num":
        op = draw(st.sampled_from(["=", "!=", "<", "<=", ">", ">="]))
        return f"{name} {op} {draw(st.sampled_from(_COL_NUMS))}"
    if kind == "word":
        op = draw(st.sampled_from(["=", "!="]))
        w = draw(st.sampled_from(_COL_WORDS))
        return f'{name} {op} "{w}"' if (draw(st.booleans()) or " " in w) else f"{name} {op} {w}"
    op = draw(st.sampled_from(["=", "!="]))
    return f"{name} {op} {draw(st.sampled_from(_COL_WILD))}"


@st.composite
def _col_pattern(draw):
    n_fields = draw(st.integers(1, 6))
    names = [f"f{i+1}" for i in range(n_fields)]
    slots = []
    for i, name in enumerate(names):
        n_atoms = draw(st.integers(0, 2))
        if n_atoms == 0:
            slots.append(name)
            continue
        chain = [draw(_col_cmp(name))]
        for _ in range(n_atoms - 1):
            ref = draw(st.sampled_from(names[: i + 1]))
            glue = draw(st.sampled_from(["&&", "||"]))
            chain.append(f"{glue} {draw(_col_cmp(ref))}")
        slots.append(" ".join(chain))
    return "[" + ", ".join(slots) + "]"


# Field counts 0–6 so the exact-count gate is exercised; quoted and
# bracketed runs contain spaces so the grouping tokenizer is exercised.
_COL_MSGS = [
    '10.0.0.1 alice [12/May 10:00] "GET /api" 404 1532',
    "GET alice 404",
    "200 99 a_b -3 100.5",
    "10.0.0.1 alice",
    '"GET /api" [12/May 10:00] 404 404',
    "alice",
    "",
    '[] "x" 4* GET alice 200',
    '"12/May 10:00" [GET] -3 0 99 404',
]
_COL_ROWS = [(i, m) for i, m in enumerate(_COL_MSGS)]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_col_pattern(), min_size=1, max_size=8, unique=True))
def test_column_backends_select_identical_rows(spark, patterns):
    from pyspark.sql import functions as F

    compiled = [compile_pattern(p) for p in patterns]
    df = spark.createDataFrame(_COL_ROWS, "rid long, message string")
    cols = [
        cp.column(message=F.col("message")).alias(f"p{i}")
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
        + ", ".join("(?, ?)" for _ in _COL_ROWS)
        + ") v(rid, message)",
        [x for row in _COL_ROWS for x in row],
    )
    sels = ", ".join(
        f"COALESCE(({cp.duckdb_sql(message='message')}), FALSE) AS p{i}"
        for i, cp in enumerate(compiled)
    )
    want_rows = con.execute(f"SELECT rid, {sels} FROM t").fetchall()
    for i, pat in enumerate(patterns):
        want = {r[0] for r in want_rows if r[i + 1]}
        assert got[i] == want, (
            f"pattern {pat!r}: spark={sorted(got[i])} duckdb={sorted(want)}"
        )


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
