"""CloudWatch filter-pattern DSL compiler (functions/filter_pattern.py).

Parser unit tests (no Spark needed) + Spark↔DuckDB differential checks
for the compiled predicates.  The registry-level keys
(`q_filter_pattern_*`) get the full rows+schema+hash differential via
tests/test_oracle_differential.py; here we exercise the DSL corners that
the five registered patterns don't reach (error paths, literal types,
wildcards in both positions, nesting depth).
"""

from __future__ import annotations

import duckdb
import pytest

from ex_aws_firehose_spark.functions.filter_pattern import (
    BoolExpr,
    Comparison,
    FilterPatternError,
    Term,
    TermPattern,
    compile_pattern,
    parse,
)

# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def test_empty_pattern_is_match_all():
    # main.tf:288 — the reference's deployed filter_pattern = ""
    assert parse("") is None
    assert parse("   ") is None
    assert compile_pattern("").duckdb_sql() == "TRUE"


def test_terms_and():
    ast = parse("ERROR Exception")
    assert ast == TermPattern(
        (Term("and", "ERROR", False), Term("and", "Exception", False))
    )


def test_terms_or_not_quoted():
    ast = parse('?ERROR ?WARN -"not a real error" -Ignore')
    assert isinstance(ast, TermPattern)
    kinds = [(t.kind, t.text, t.quoted) for t in ast.terms]
    assert kinds == [
        ("or", "ERROR", False),
        ("or", "WARN", False),
        ("not", "not a real error", True),
        ("not", "Ignore", False),
    ]


def test_json_simple_equality():
    ast = parse('{ $.messageType = "DATA_MESSAGE" }')
    assert isinstance(ast, Comparison)
    assert ast.selector.path == "$.messageType"
    assert ast.op == "=" and ast.value == "DATA_MESSAGE" and not ast.wildcard


def test_json_precedence_and_parens():
    ast = parse("{ $.a = 1 && $.b = 2 || $.c = 3 }")
    # && binds tighter than ||
    assert isinstance(ast, BoolExpr) and ast.op == "or"
    assert isinstance(ast.operands[0], BoolExpr) and ast.operands[0].op == "and"
    nested = parse("{ $.a = 1 && ($.b = 2 || $.c = 3) }")
    assert isinstance(nested, BoolExpr) and nested.op == "and"


def test_json_selector_paths():
    ast = parse("{ $.logEvents[0].timestamp > 100 }")
    assert isinstance(ast, Comparison)
    assert ast.selector.path == "$.logEvents[0].timestamp"
    assert ast.value == 100.0


def test_json_exists_null():
    assert parse("{ $.err NOT EXISTS }") == Comparison(
        parse("{ $.err EXISTS }").selector, "not_exists"
    )
    # IS NULL ≡ NOT EXISTS (documented: Spark's get_json_object cannot
    # distinguish JSON null from missing)
    assert parse("{ $.err IS NULL }").op == "not_exists"
    assert parse("{ $.err EXISTS }").op == "exists"


def test_wildcard_only_on_equality():
    ok = parse('{ $.t = "Update*" }')
    assert isinstance(ok, Comparison) and ok.wildcard
    with pytest.raises(FilterPatternError):
        parse('{ $.t > "Update*" }')


@pytest.mark.parametrize(
    "bad",
    [
        "{ $.a = }",
        "{ $.a }",
        "{ $ = 1 }",
        "{ $.a = 1",
        "{ $.a = 1 } trailing",
        '"unterminated',
        "{ $.a == 1 }x",
        "{ $.a[x] = 1 }",
        "%unterminated regex",
        "%%",                      # empty regex body
        "{ $.a > %[0-9]% }",       # regex with ordering comparator
        "%(?=x)y%",                # lookahead: not in Java∩RE2 subset
        "%(?!x)y%",                # negative lookahead
        "%(?<=a)b%",               # lookbehind
        "%(?<name>x)%",            # Java-style named group (RE2 rejects)
        r"%(x)\1%",                # backreference
        r"{ $.a = %(ab)\2% }",     # backreference in JSON value position
    ],
)
def test_parse_errors(bad):
    with pytest.raises(FilterPatternError):
        parse(bad)


def test_regex_common_subset_still_accepted():
    """The rejection is surgical: alternation, classes, quantifiers,
    anchors, and non-capturing groups — the documented common subset —
    all still parse."""
    for ok in (
        "%Hel+o (purch|sign)[a-z]+%",
        "%^[0-4]$%",
        "%(?:ab)+c{2,3}%",
        r"%\d+\.\d+%",
        # Escape pairs must be neutralized before the backreference /
        # lookaround scan: `a\\1` is an escaped backslash + a literal
        # digit (valid in Java regex AND RE2) — the raw scan used to
        # see the pair's second backslash + `1` and falsely reject it
        # as a \1 backreference. Same for an escaped paren before `?=`.
        r"%a\\1%",
        r"%x\(?=y%",
        r"{ $.a = %b\\2c% }",
    ):
        parse(ok)


def test_columns_bare_fields():
    from ex_aws_firehose_spark.functions.filter_pattern import ColumnPattern

    ast = parse("[ip, user, status]")
    assert isinstance(ast, ColumnPattern)
    assert ast.fields == ("ip", "user", "status")
    assert ast.condition is None


def test_columns_conditions_and_precedence():
    from ex_aws_firehose_spark.functions.filter_pattern import (
        ColumnPattern,
        FieldComparison,
    )

    ast = parse("[w1 = ERROR || w1 = WARN, w2, size >= 1000]")
    assert isinstance(ast, ColumnPattern)
    assert ast.fields == ("w1", "w2", "size")
    # top level: AND of (w1-chain, size-cmp); w1-chain is an OR
    assert isinstance(ast.condition, BoolExpr) and ast.condition.op == "and"
    chain, size_cmp = ast.condition.operands
    assert isinstance(chain, BoolExpr) and chain.op == "or"
    assert size_cmp == FieldComparison("size", ">=", 1000.0)


def test_columns_wildcard_and_quoted():
    ast = parse('[req = "GET /api/*", status = 4*]')
    req, status = (
        ast.condition.operands
        if isinstance(ast.condition, BoolExpr)
        else (ast.condition,)
    )
    assert req.wildcard and req.value == "GET /api/*"
    assert status.wildcard and status.value == "4*"


@pytest.mark.parametrize(
    "bad",
    [
        "[w1, w1]",                 # duplicate field
        "[w1 = ERROR || w9 = WARN]",  # undeclared reference
        "[w1 > 4*]",                # wildcard with ordering comparator
        "[w1 = a, ]",               # dangling comma
        "[w1] trailing",
        "[..., w1, ..., w2]",       # two ellipses
        "[w1 > %re%, w2]",          # regex with ordering comparator
    ],
)
def test_columns_parse_errors(bad):
    with pytest.raises(FilterPatternError):
        parse(bad)


# ---------------------------------------------------------------------------
# non-triviality: every registered filter-pattern key selects rows
# ---------------------------------------------------------------------------


def _filter_pattern_keys():
    from ex_aws_firehose_spark.registry import REGISTRY, load_all_operators

    load_all_operators()
    return sorted(
        k for k, q in REGISTRY.items() if "filter-pattern" in q.tags
    )


@pytest.mark.parametrize("key", _filter_pattern_keys())
def test_registered_pattern_selects_rows(spark, sf_dir, key):
    """A filter-pattern key whose probe misses the fixture entirely
    validates nothing — both engines trivially agree on the empty set
    (the r8 q_filter_pattern_json_regex bug probed $.event_type, which
    events.props never contains). Pin every registered pattern key to
    a NON-EMPTY result so fixture drift can't re-trivialize an oracle."""
    from ex_aws_firehose_spark.registry import REGISTRY

    n = REGISTRY[key].fn(spark, sf_dir).count()
    assert n > 0, f"{key} selects 0 rows — its pattern misses the fixture"


# ---------------------------------------------------------------------------
# differential: same AST → same rows in Spark and DuckDB
# ---------------------------------------------------------------------------

ROWS = [
    ('ERROR budget exceeded for "api"', '{"k": 87, "tag": "UpdateItem"}'),
    ("WARN retrying request", '{"k": 7}'),
    ("INFO ERRORs are fine here", '{"k": null}'),
    ("ERROR Ignore this one", '{"k": 40, "tag": "Update"}'),
    ("hello ERROR-adjacent text", '{"nested": {"a": [5, 6]}}'),
    ("plain message", "not json at all"),
]

PATTERNS = [
    "ERROR",
    "?ERROR ?WARN",
    "ERROR -Ignore",
    '"ERROR budget"',
    '-"plain message" INFO',
    "{ $.k = 87 }",
    "{ $.k != 87 }",
    "{ $.k >= 40 && $.k < 90 }",
    "{ $.k = 7 || $.nested.a[1] = 6 }",
    "{ $.k NOT EXISTS }",
    "{ $.k EXISTS }",
    '{ $.tag = "Update*" }',
    '{ $.tag != "Update*" }',
    '{ $.tag = "*Item" }',
    "{ ($.k > 50 || $.k < 10) && $.tag EXISTS }",
    "{ $.k = null }",
    "{ $.k != null }",
    "",
    # %regex% forms (AWS, 2023+): terms and JSON values
    "%ERRORs? % -%Ignore%",
    "%^(ERROR|WARN)% %(exceed|retry)[a-z]+%",
    "{ $.tag = %Update(Item)?$% }",
    "{ $.tag != %Item% }",
    "{ $.k = %^[0-9]$% || $.tag = %^Up% }",
    r"%Err\(?or% %a\\1%",  # escape pairs: \(? optional paren, \\1 literal
]


@pytest.mark.parametrize("pattern", PATTERNS)
def test_spark_duckdb_agree(spark, pattern):
    from pyspark.sql import functions as F

    cp = compile_pattern(pattern)
    df = spark.createDataFrame(ROWS, "message string, props string")
    got = {
        r.message
        for r in df.filter(
            cp.column(message=F.col("message"), json=F.col("props"))
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?)" for _ in ROWS)
        + ") v(message, props)",
        [x for row in ROWS for x in row],
    )
    sql = cp.duckdb_sql(message="message", json="props")
    want = {r[0] for r in con.execute(f"SELECT message FROM t WHERE {sql}").fetchall()}
    assert got == want, f"pattern {pattern!r}: spark={got} duckdb={want}"


COL_ROWS = [
    ('10.0.0.1 alice [12/May 10:00] "GET /api/users" 200 1532',),
    ('10.0.0.2 bob [12/May 10:01] "GET /api/items" 404 320',),
    ('10.0.0.3 carol [12/May 10:02] "POST /login" 403 99',),
    ('10.0.0.4 dave [12/May 10:03] "GET /api/users" 500 450',),
    ("short line",),
    ('10.0.0.5 eve [12/May 10:04] "DELETE /x" 204 abc',),
]

COL_PATTERNS = [
    "[ip, user, ts, request, status, size]",
    "[ip, user, ts, request, status = 404, size]",
    "[ip, user, ts, request, status = 4*, size]",
    '[ip, user, ts, request = "GET /api/*", status, size]',
    "[ip, user, ts, request, status = 404 || status = 500, size]",
    "[ip, user, ts, request, status, size >= 100 && size < 500]",
    '[ip = 10.0.0.*, user != bob, ts, request, status, size]',
    "[ip, user, ts, request, status, size > 0]",  # non-numeric size → no match
    # '...' ellipsis: from-end indexing, relaxed count gate
    "[ip, ..., status = 404, size]",
    "[ip, ..., size >= 100]",
    "[..., status != 200, size]",
    "[ip, user, ...]",
    "[ip, ..., request = %GET /api/(users|items)%, status, size]",
    "[ip, user, ts, request != %POST%, status, size]",
]


@pytest.mark.parametrize("pattern", COL_PATTERNS)
def test_columns_spark_duckdb_agree(spark, pattern):
    from pyspark.sql import functions as F

    cp = compile_pattern(pattern)
    df = spark.createDataFrame(COL_ROWS, "message string")
    got = {
        r.message
        for r in df.filter(cp.column(message=F.col("message"))).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join("(?)" for _ in COL_ROWS)
        + ") v(message)",
        [x for row in COL_ROWS for x in row],
    )
    sql = cp.duckdb_sql(message="message")
    want = {r[0] for r in con.execute(f"SELECT message FROM t WHERE {sql}").fetchall()}
    assert got == want, f"pattern {pattern!r}: spark={got} duckdb={want}"
    # exact field-count gate: the 2-token and 6-token lines never
    # co-match — unless an ellipsis relaxed the gate to >=
    if "..." not in pattern:
        assert "short line" not in got or len(got) == 1


def test_bound_columns_match_unbound(spark):
    """A bound selector must produce the same rows as JSON extraction."""
    from pyspark.sql import functions as F

    from ex_aws_firehose_spark.functions.filter_pattern import Binding

    df = spark.createDataFrame(
        [("error", 150.0, '{"event_type": "error", "value": 150.0}'),
         ("signup", 99.0, '{"event_type": "signup", "value": 99.0}'),
         ("view", 100.0, '{"event_type": "view", "value": 100.0}')],
        "event_type string, value double, j string",
    )
    cp = compile_pattern('{ $.event_type = "s*" || $.value >= 150 }')
    bound = df.filter(
        cp.column(
            bindings={
                "$.event_type": Binding(column=F.col("event_type")),
                "$.value": Binding(column=F.col("value"), numeric=True),
            }
        )
    )
    unbound = df.filter(cp.column(json=F.col("j")))
    assert {r.event_type for r in bound.collect()} == {
        r.event_type for r in unbound.collect()
    } == {"signup", "error"}
