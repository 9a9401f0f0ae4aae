"""CloudWatch Logs subscription **filter-pattern DSL → Catalyst** compiler.

The reference deploys a subscription filter with the trivial pattern
(``filter_pattern = ""`` — ``main.tf:288``; resource at ``main.tf:284-290``),
i.e. match-all.  Real subscription filters are almost never empty; the
publicly-documented CloudWatch pattern language (AWS "Filter and pattern
syntax" docs) has two families:

**Term patterns** (plain text messages)::

    ERROR Exception          # both words must appear         (AND)
    ?ERROR ?WARN             # at least one must appear       (OR)
    ERROR -Ignore            # ERROR present, Ignore absent   (NOT)
    "browser error" -"404"   # quoted exact phrases

Matching is case-sensitive and token-oriented: an unquoted term matches
where it appears delimited by non-word characters (CloudWatch treats
``[A-Za-z0-9_]`` as word characters — exactly regex ``\\b`` semantics,
which both Java regex (Spark) and RE2 (DuckDB) implement identically).

**JSON patterns** (structured messages)::

    { $.messageType = "DATA_MESSAGE" }
    { ($.k >= 40 && $.k < 90) || $.user.id = 7 }
    { $.eventType = "Update*" }          # '*' wildcard, string values only
    { $.error NOT EXISTS }
    { $.error IS NULL }

Selectors are ``$``-rooted dotted paths with optional ``[n]`` array
indexing; comparators are ``= != < <= > >=`` plus ``IS NULL`` /
``EXISTS`` / ``NOT EXISTS``; ``&&`` / ``||`` / parentheses combine them.

Architecture — **one AST, two backends**:

- :func:`parse` produces a small AST (`TermPattern` | JSON expression
  tree).  It is a hand-written recursive-descent parser; errors raise
  :class:`FilterPatternError` with position info.
- :meth:`CompiledPattern.column` walks the AST into a single Catalyst
  :class:`~pyspark.sql.Column` predicate (pure built-ins — ``rlike``,
  ``like``, ``get_json_object``, comparisons; **no Python UDF**), so the
  filter participates in predicate pushdown, partition pruning and
  whole-stage codegen like any other expression.
- :meth:`CompiledPattern.duckdb_sql` walks the *same* AST into an ANSI
  SQL predicate for the DuckDB oracle, guaranteeing that the
  differential-correctness gate checks the compiler itself.

**Selector → column bindings.**  At 100 TB the difference between
``get_json_object(raw, '$.event_type') = 'error'`` and
``event_type = 'error'`` is the difference between reading+parsing every
byte and a parquet-footer row-group skip.  ``bindings`` maps selector
paths to real columns; bound comparisons compile to plain column
predicates that reach the scan as ``PushedFilters`` (gated in
``tests/test_plans.py``).  Unbound selectors fall back to JSON
extraction on the designated JSON column — schema-on-read, same
semantics, no silent behavior change.

Deliberate, documented semantics decisions (kept identical across both
backends):

- JSON ``null`` and *missing key* are both "absent": ``get_json_object``
  (Spark) returns SQL NULL for either, so ``IS NULL`` ≡ ``NOT EXISTS``
  and DuckDB mirrors via ``json_extract_string``.
- Numeric comparators coerce with TRY-CAST-to-double semantics
  (``CAST`` in Spark and ``TRY_CAST`` in DuckDB both yield NULL on
  non-numeric, excluding the row — CloudWatch likewise only matches
  numeric comparisons against numeric JSON values).
- ``*`` wildcards (string values, ``=`` / ``!=`` only, as documented by
  AWS) compile to ``LIKE`` with ``%``/``_`` escaped.
- ``%regex%`` patterns (AWS, 2023+) are accepted as terms
  (``%ERROR|WARN%``), JSON values (``$.type = %Up(date|grade)%``) and
  column values; the body must stay in the Java-regex ∩ RE2 common
  subset (no lookaround/backreferences — RE2 lacks them), matched
  unanchored by both backends (``rlike`` / ``regexp_matches``).
- ``...`` (ellipsis, column family): absorbs ≥0 unnamed fields; slots
  after it index from the END of the token list and the field-count
  gate relaxes to ``>=`` — ``[ip, ..., status = 404, size]`` matches
  any log line whose last-but-one field is 404.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Mapping, Union

from pyspark.sql import Column
from pyspark.sql import functions as F


class FilterPatternError(ValueError):
    """Raised on an unparsable filter pattern (with position context)."""


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Term:
    """One term of a term pattern: ``kind`` ∈ {'and', 'or', 'not'}.

    ``regex=True`` marks a ``%regex%`` term (AWS, 2023+): ``text`` is
    the raw regex between the percent signs, matched unanchored.
    """

    kind: str
    text: str
    quoted: bool
    regex: bool = False


@dataclass(frozen=True)
class TermPattern:
    terms: tuple[Term, ...]


@dataclass(frozen=True)
class Selector:
    """``$``-rooted path, stored in Spark/DuckDB-shared syntax ``$.a.b[0]``."""

    path: str


@dataclass(frozen=True)
class Comparison:
    selector: Selector
    op: str  # '=', '!=', '<', '<=', '>', '>=', 'exists', 'not_exists'
    value: Union[str, float, bool, None] = None
    wildcard: bool = False  # value is a string containing '*'
    regex: bool = False  # value is a %regex% body (= / != only)


@dataclass(frozen=True)
class BoolExpr:
    op: str  # 'and' | 'or'
    operands: tuple["JsonNode", ...]


JsonNode = Union[Comparison, BoolExpr]


@dataclass(frozen=True)
class FieldComparison:
    """One condition of a space-delimited pattern: ``w1 = ERROR``."""

    name: str
    op: str  # '=', '!=', '<', '<=', '>', '>='
    value: Union[str, float]
    wildcard: bool = False
    regex: bool = False  # value is a %regex% body (= / != only)


ColNode = Union[FieldComparison, BoolExpr]


@dataclass(frozen=True)
class ColumnPattern:
    """Space-delimited pattern ``[ip, user, status = 4*, size >= 1000]``.

    ``fields`` holds the slot names in positional order; ``condition``
    is the conjunction of every slot's condition chain (``None`` when
    all slots are bare names — then only the field COUNT must match).

    ``ellipsis_at`` (AWS's ``...`` slot, at most one): the index in
    ``fields`` where any number (≥0) of unnamed fields sit. Fields
    before it index from the START of the token list, fields at/after
    it index from the END; the count gate relaxes to ``>= len(fields)``.
    """

    fields: tuple[str, ...]
    condition: ColNode | None
    ellipsis_at: int | None = None


PatternAst = Union[TermPattern, JsonNode, ColumnPattern, None]  # None = ""


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"[^\s\"]+")
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_\-]*")
_NUM_RE = re.compile(r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?")


class _Cursor:
    def __init__(self, text: str) -> None:
        self.text = text
        self.pos = 0

    def skip_ws(self) -> None:
        while self.pos < len(self.text) and self.text[self.pos].isspace():
            self.pos += 1

    def peek(self) -> str:
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def startswith(self, s: str) -> bool:
        return self.text.startswith(s, self.pos)

    def expect(self, s: str) -> None:
        if not self.startswith(s):
            raise FilterPatternError(
                f"expected {s!r} at position {self.pos} in {self.text!r}"
            )
        self.pos += len(s)

    def match_re(self, rx: re.Pattern[str]) -> str | None:
        m = rx.match(self.text, self.pos)
        if m is None:
            return None
        self.pos = m.end()
        return m.group(0)


def parse(pattern: str) -> PatternAst:
    """Parse a CloudWatch filter pattern into an AST (``None`` = match-all)."""
    stripped = pattern.strip()
    if not stripped:
        return None  # main.tf:288 — the reference's deployed (empty) pattern
    if stripped.startswith("{"):
        cur = _Cursor(stripped)
        cur.expect("{")
        node = _parse_or(cur)
        cur.skip_ws()
        cur.expect("}")
        cur.skip_ws()
        if cur.pos != len(stripped):
            raise FilterPatternError(
                f"trailing input after '}}' at position {cur.pos} in {pattern!r}"
            )
        return node
    if stripped.startswith("["):
        return _parse_columns(stripped)
    return _parse_terms(stripped)


def _parse_terms(text: str) -> TermPattern:
    cur = _Cursor(text)
    terms: list[Term] = []
    while True:
        cur.skip_ws()
        if cur.pos >= len(text):
            break
        kind = "and"
        if cur.peek() == "-":
            kind = "not"
            cur.pos += 1
        elif cur.peek() == "?":
            kind = "or"
            cur.pos += 1
        if cur.peek() == '"':
            cur.pos += 1
            end = text.find('"', cur.pos)
            if end < 0:
                raise FilterPatternError(f"unterminated quote in {text!r}")
            term_text, quoted = text[cur.pos : end], True
            cur.pos = end + 1
        elif cur.peek() == "%":
            terms.append(Term(kind, _scan_regex(cur), False, regex=True))
            continue
        else:
            word = cur.match_re(_WORD_RE)
            if not word:
                raise FilterPatternError(
                    f"expected term at position {cur.pos} in {text!r}"
                )
            term_text, quoted = word, False
        if not term_text:
            raise FilterPatternError(f"empty term in {text!r}")
        terms.append(Term(kind, term_text, quoted))
    return TermPattern(tuple(terms))


# Constructs outside the Java-regex ∩ RE2 common subset: lookahead
# (?= (?!, lookbehind/Java named groups (?<, and \1–\9 backreferences.
# RE2 (DuckDB) rejects all of them at query time with an engine error,
# so accepting them here would defer a parse bug to a confusing
# downstream failure — or worse, to silent cross-engine divergence.
_REGEX_UNSUPPORTED = re.compile(r"\(\?=|\(\?!|\(\?<|\\[1-9]")


def _scan_regex(cur: _Cursor) -> str:
    """``%regex%`` body (AWS regex patterns, 2023+): cursor on the
    opening ``%``; returns the inner regex, cursor past the closer.
    The body is restricted to the syntax common to Java regex (Spark)
    and RE2 (DuckDB) — lookaround and backreferences are REJECTED at
    parse time (both engines match unanchored)."""
    assert cur.peek() == "%"
    end = cur.text.find("%", cur.pos + 1)
    if end < 0:
        raise FilterPatternError(
            f"unterminated %regex% at position {cur.pos} in {cur.text!r}"
        )
    body = cur.text[cur.pos + 1 : end]
    if not body:
        raise FilterPatternError(f"empty %regex% in {cur.text!r}")
    # Blank out escape pairs (length-preserving) before scanning: in
    # `a\\1` the `\\` is an escaped backslash and the `1` a literal
    # digit — valid in both engines — but a raw scan would see the
    # pair's second backslash + digit and falsely reject it as a
    # backreference. Likewise `\(?=` is an escaped paren, not a
    # lookahead. Pairs whose escaped char IS a digit 1-9 are kept:
    # left-to-right tokenization means a surviving `\1` is a genuine
    # backreference, exactly what the scan must flag.
    bad = _REGEX_UNSUPPORTED.search(re.sub(r"\\[^1-9]", "\x00\x00", body))
    if bad:
        raise FilterPatternError(
            f"unsupported regex construct {bad.group(0)!r} in %{body}%: "
            "the body must stay in the Java-regex ∩ RE2 common "
            "subset (no lookaround, no backreferences)"
        )
    cur.pos = end + 1
    return body


# Unquoted column-pattern value: anything up to a delimiter.
_COL_VALUE_RE = re.compile(r"[^\s,\]&|()]+")
_COL_OPS = ("!=", "<=", ">=", "=", "<", ">")


def _parse_columns(text: str) -> ColumnPattern:
    """Space-delimited pattern: ``[f1, f2 = ERROR || f2 = WARN, f3]``.

    Each comma-separated slot declares one positional field; a slot may
    carry a condition chain whose comparisons reference any
    already-declared field (AWS's documented examples always reference
    the slot's own name, which this accepts as the common case).
    ``||`` binds looser than ``&&``, as in the JSON family.
    """
    cur = _Cursor(text)
    cur.expect("[")
    fields: list[str] = []
    conds: list[ColNode] = []
    ellipsis_at: int | None = None
    while True:
        cur.skip_ws()
        if cur.startswith("..."):
            if ellipsis_at is not None:
                raise FilterPatternError(
                    f"at most one '...' allowed in {text!r}"
                )
            ellipsis_at = len(fields)
            cur.pos += 3
            cur.skip_ws()
            if cur.peek() == ",":
                cur.pos += 1
                continue
            cur.expect("]")
            break
        name = cur.match_re(_IDENT_RE)
        if name is None:
            raise FilterPatternError(
                f"expected field name at position {cur.pos} in {text!r}"
            )
        if name in fields:
            raise FilterPatternError(f"duplicate field {name!r} in {text!r}")
        fields.append(name)
        cur.skip_ws()
        if any(cur.startswith(sym) for sym in _COL_OPS):
            conds.append(_parse_col_chain(cur, name, fields))
        cur.skip_ws()
        if cur.peek() == ",":
            cur.pos += 1
            continue
        cur.expect("]")
        break
    cur.skip_ws()
    if cur.pos != len(text):
        raise FilterPatternError(
            f"trailing input after ']' at position {cur.pos} in {text!r}"
        )
    condition: ColNode | None
    if not conds:
        condition = None
    elif len(conds) == 1:
        condition = conds[0]
    else:
        condition = BoolExpr("and", tuple(conds))
    return ColumnPattern(tuple(fields), condition, ellipsis_at)


def _parse_col_chain(cur: _Cursor, first: str, declared: list[str]) -> ColNode:
    """Condition chain within one slot, first comparison's name already
    consumed. ``&&`` binds tighter than ``||`` (fold &&-runs first)."""
    atoms: list[ColNode] = [_parse_col_cmp(cur, first)]
    ops: list[str] = []
    while True:
        cur.skip_ws()
        if cur.startswith("&&") or cur.startswith("||"):
            ops.append("and" if cur.startswith("&&") else "or")
            cur.pos += 2
            cur.skip_ws()
            name = cur.match_re(_IDENT_RE)
            if name is None:
                raise FilterPatternError(
                    f"expected field name at position {cur.pos} in {cur.text!r}"
                )
            if name not in declared:
                raise FilterPatternError(
                    f"condition references undeclared field {name!r} "
                    f"at position {cur.pos} in {cur.text!r}"
                )
            cur.skip_ws()
            atoms.append(_parse_col_cmp(cur, name))
        else:
            break
    or_groups: list[ColNode] = []
    run: list[ColNode] = [atoms[0]]
    for op, atom in zip(ops, atoms[1:]):
        if op == "and":
            run.append(atom)
        else:
            or_groups.append(run[0] if len(run) == 1 else BoolExpr("and", tuple(run)))
            run = [atom]
    or_groups.append(run[0] if len(run) == 1 else BoolExpr("and", tuple(run)))
    if len(or_groups) == 1:
        return or_groups[0]
    return BoolExpr("or", tuple(or_groups))


def _parse_col_cmp(cur: _Cursor, name: str) -> FieldComparison:
    cur.skip_ws()
    for sym in _COL_OPS:
        if cur.startswith(sym):
            cur.pos += len(sym)
            break
    else:
        raise FilterPatternError(
            f"expected comparator at position {cur.pos} in {cur.text!r}"
        )
    cur.skip_ws()
    if cur.peek() == '"':
        cur.pos += 1
        end = cur.text.find('"', cur.pos)
        if end < 0:
            raise FilterPatternError(f"unterminated string in {cur.text!r}")
        raw = cur.text[cur.pos : end]
        cur.pos = end + 1
        wildcard = "*" in raw
        if wildcard and sym not in ("=", "!="):
            raise FilterPatternError(
                f"'*' wildcard only valid with = / != (got {sym!r})"
            )
        return FieldComparison(name, sym, raw, wildcard)
    if cur.peek() == "%":
        if sym not in ("=", "!="):
            raise FilterPatternError(
                f"%regex% only valid with = / != (got {sym!r})"
            )
        return FieldComparison(name, sym, _scan_regex(cur), regex=True)
    tok = cur.match_re(_COL_VALUE_RE)
    if tok is None:
        raise FilterPatternError(
            f"expected value at position {cur.pos} in {cur.text!r}"
        )
    if "*" in tok:
        if sym not in ("=", "!="):
            raise FilterPatternError(
                f"'*' wildcard only valid with = / != (got {sym!r})"
            )
        return FieldComparison(name, sym, tok, True)
    if _NUM_RE.fullmatch(tok):
        return FieldComparison(name, sym, float(tok))
    return FieldComparison(name, sym, tok)


def _parse_or(cur: _Cursor) -> JsonNode:
    operands = [_parse_and(cur)]
    while True:
        cur.skip_ws()
        if cur.startswith("||"):
            cur.pos += 2
            operands.append(_parse_and(cur))
        else:
            break
    return operands[0] if len(operands) == 1 else BoolExpr("or", tuple(operands))


def _parse_and(cur: _Cursor) -> JsonNode:
    operands = [_parse_unary(cur)]
    while True:
        cur.skip_ws()
        if cur.startswith("&&"):
            cur.pos += 2
            operands.append(_parse_unary(cur))
        else:
            break
    return operands[0] if len(operands) == 1 else BoolExpr("and", tuple(operands))


def _parse_unary(cur: _Cursor) -> JsonNode:
    cur.skip_ws()
    if cur.peek() == "(":
        cur.pos += 1
        node = _parse_or(cur)
        cur.skip_ws()
        cur.expect(")")
        return node
    return _parse_comparison(cur)


def _parse_selector(cur: _Cursor) -> Selector:
    cur.skip_ws()
    cur.expect("$")
    parts: list[str] = ["$"]
    while True:
        if cur.peek() == ".":
            cur.pos += 1
            ident = cur.match_re(_IDENT_RE)
            if ident is None:
                raise FilterPatternError(
                    f"expected identifier at position {cur.pos} in {cur.text!r}"
                )
            parts.append(f".{ident}")
        elif cur.peek() == "[":
            cur.pos += 1
            idx = cur.match_re(re.compile(r"\d+"))
            if idx is None:
                raise FilterPatternError(
                    f"expected array index at position {cur.pos} in {cur.text!r}"
                )
            cur.expect("]")
            parts.append(f"[{idx}]")
        else:
            break
    if len(parts) == 1:
        raise FilterPatternError(
            f"selector must have at least one step at position {cur.pos}"
        )
    return Selector("".join(parts))


def _parse_comparison(cur: _Cursor) -> Comparison:
    sel = _parse_selector(cur)
    cur.skip_ws()
    for kw, op in (
        ("NOT EXISTS", "not_exists"),
        ("IS NULL", "not_exists"),  # documented: null ≡ missing (module docstring)
        ("EXISTS", "exists"),
    ):
        if cur.startswith(kw):
            cur.pos += len(kw)
            return Comparison(sel, op)
    for sym in ("!=", "<=", ">=", "=", "<", ">"):
        if cur.startswith(sym):
            cur.pos += len(sym)
            return _parse_value(cur, sel, sym)
    raise FilterPatternError(
        f"expected comparator at position {cur.pos} in {cur.text!r}"
    )


def _parse_value(cur: _Cursor, sel: Selector, op: str) -> Comparison:
    cur.skip_ws()
    if cur.peek() == '"':
        cur.pos += 1
        end = cur.text.find('"', cur.pos)
        if end < 0:
            raise FilterPatternError(f"unterminated string in {cur.text!r}")
        raw = cur.text[cur.pos : end]
        cur.pos = end + 1
        wildcard = "*" in raw
        if wildcard and op not in ("=", "!="):
            raise FilterPatternError(
                f"'*' wildcard only valid with = / != (got {op!r})"
            )
        return Comparison(sel, op, raw, wildcard)
    if cur.peek() == "%":
        if op not in ("=", "!="):
            raise FilterPatternError(
                f"%regex% only valid with = / != (got {op!r})"
            )
        return Comparison(sel, op, _scan_regex(cur), regex=True)
    for kw, val in (("true", True), ("false", False), ("null", None)):
        if cur.startswith(kw):
            cur.pos += len(kw)
            return Comparison(sel, op, val)
    num = cur.match_re(_NUM_RE)
    if num is not None:
        return Comparison(sel, op, float(num))
    raise FilterPatternError(
        f"expected literal at position {cur.pos} in {cur.text!r}"
    )


# ---------------------------------------------------------------------------
# Backends
# ---------------------------------------------------------------------------

_WORD_CHAR = re.compile(r"[A-Za-z0-9_]")


def _term_regex(term: Term) -> str:
    """Regex for one term, identical under Java regex and RE2.

    ``\\b`` guards are applied only where the term edge is a word
    character (a ``\\b`` next to punctuation would invert its meaning).
    ``%regex%`` terms pass through verbatim (unanchored, both engines).
    """
    if term.regex:
        return term.text
    body = re.escape(term.text)
    pre = r"\b" if _WORD_CHAR.match(term.text[0]) else ""
    post = r"\b" if _WORD_CHAR.match(term.text[-1]) else ""
    return f"{pre}{body}{post}"


def _like_pattern(value: str) -> str:
    """CloudWatch ``*`` wildcard string → SQL LIKE pattern (\\-escaped)."""
    out = value.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    return out.replace("*", "%")


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


# Space-delimited tokenizer, identical under Java regex and RE2:
# a [bracketed] or "quoted" run groups into ONE field (the documented
# CloudWatch behavior for access-log timestamps and request strings),
# anything else splits on whitespace.
_COL_TOKEN_RX = r'\[[^\]]*\]|"[^"]*"|\S+'


@dataclass(frozen=True)
class Binding:
    """A selector bound to a materialized column. ``column`` feeds the
    Spark backend, ``sql`` the oracle backend; either may be omitted
    when only one backend will be asked for (e.g. oracle SQL generated
    at import time passes ``Binding(sql=...)`` alone)."""

    column: Column | None = None
    sql: str | None = None
    numeric: bool = False  # column is already numeric — no cast needed


class CompiledPattern:
    """A parsed pattern ready to emit either backend's predicate."""

    def __init__(self, ast: PatternAst, pattern: str) -> None:
        self.ast = ast
        self.pattern = pattern

    # -- Spark ---------------------------------------------------------------

    def column(
        self,
        message: Column | None = None,
        json: Column | None = None,
        bindings: Mapping[str, Binding] | None = None,
    ) -> Column:
        """Catalyst predicate. ``message`` feeds term patterns, ``json``
        feeds unbound selectors, ``bindings`` short-circuits selectors to
        real columns (the scan-pushdown path)."""
        if self.ast is None:
            return F.lit(True)
        if isinstance(self.ast, TermPattern):
            if message is None:
                raise FilterPatternError("term pattern needs a message column")
            return self._terms_column(self.ast, message)
        if isinstance(self.ast, ColumnPattern):
            if message is None:
                raise FilterPatternError("column pattern needs a message column")
            return self._columns_column(self.ast, message)
        return self._json_column(self.ast, json, bindings or {})

    def _terms_column(self, tp: TermPattern, message: Column) -> Column:
        ands = [t for t in tp.terms if t.kind == "and"]
        ors = [t for t in tp.terms if t.kind == "or"]
        nots = [t for t in tp.terms if t.kind == "not"]
        pred = F.lit(True)
        for t in ands:
            pred = pred & message.rlike(_term_regex(t))
        if ors:
            any_or = F.lit(False)
            for t in ors:
                any_or = any_or | message.rlike(_term_regex(t))
            pred = pred & any_or
        for t in nots:
            pred = pred & ~message.rlike(_term_regex(t))
        return pred

    def _json_column(
        self,
        node: JsonNode,
        json: Column | None,
        bindings: Mapping[str, Binding],
    ) -> Column:
        if isinstance(node, BoolExpr):
            subs = [self._json_column(n, json, bindings) for n in node.operands]
            out = subs[0]
            for s in subs[1:]:
                out = (out & s) if node.op == "and" else (out | s)
            return out
        sel, op, val = node.selector, node.op, node.value
        bound = bindings.get(sel.path)
        if bound is not None:
            if bound.column is None:
                raise FilterPatternError(
                    f"binding for {sel.path} has no Spark column"
                )
            raw, numeric = bound.column, bound.numeric
        else:
            if json is None:
                raise FilterPatternError(
                    f"unbound selector {sel.path} needs a json column"
                )
            raw, numeric = F.get_json_object(json, sel.path), False
        if op == "exists":
            return raw.isNotNull()
        if op == "not_exists":
            return raw.isNull()
        if isinstance(val, bool):
            lhs, rhs = raw.cast("string"), F.lit("true" if val else "false")
        elif val is None:
            # `= null` matches absent/null values; `!= null` matches present
            return raw.isNull() if op == "=" else raw.isNotNull()
        elif isinstance(val, float):
            # try_cast, not cast: under ANSI mode a plain cast THROWS on
            # non-numeric JSON values; the documented semantics (and
            # DuckDB's TRY_CAST) yield NULL → row excluded
            lhs = raw if numeric else raw.try_cast("double")
            rhs = F.lit(val)
        elif node.regex:
            m = raw.cast("string").rlike(val)
            return m if op == "=" else raw.isNotNull() & ~m
        elif node.wildcard:
            # Spark's LIKE escape char defaults to backslash; the oracle
            # side says ESCAPE '\' explicitly (DuckDB default is none).
            m = raw.cast("string").like(_like_pattern(val))
            return m if op == "=" else raw.isNotNull() & ~m
        else:
            lhs, rhs = raw.cast("string"), F.lit(val)
        return {
            "=": lhs == rhs,
            "!=": lhs != rhs,
            "<": lhs < rhs,
            "<=": lhs <= rhs,
            ">": lhs > rhs,
            ">=": lhs >= rhs,
        }[op]

    def _columns_column(self, cp: ColumnPattern, message: Column) -> Column:
        """Space-delimited backend: tokenize ONCE, gate on the exact
        field count (AWS: a message with a different number of fields
        does not match), then apply the condition tree over positional
        fields. Pure built-ins — regexp_extract_all / get / substr —
        so the whole predicate stays in codegen.

        The token array is LET-BOUND via ``exists(array(toks), λ)``:
        building the predicate over the raw ``regexp_extract_all``
        expression repeats the tokenize per slot reference — neither
        codegen subexpression elimination nor a pre-projected column
        shares it (Catalyst pushes the filter through the projection
        and re-inlines the alias; measured round 15:
        q_filter_pattern_columns 2.3 s with ~13 inlined tokenizes vs
        0.18 s for one). A higher-order-function lambda variable is
        evaluated once per row and every reference inside the lambda
        reads the bound value, so the regex runs once and the slot
        conditions are cheap array indexing. ``exists`` over the
        1-element array is exactly λ(toks) under three-valued logic
        (true→true, false→false, NULL→NULL), so row filtering is
        unchanged."""
        toks_expr = F.regexp_extract_all(message, F.lit(_COL_TOKEN_RX), F.lit(0))
        nf = len(cp.fields)

        def over(toks: Column) -> Column:
            if cp.ellipsis_at is None:
                pred = F.size(toks) == nf
            else:
                # '...' absorbs ≥0 unnamed fields: relax the gate and
                # index post-ellipsis slots from the END of the list
                pred = F.size(toks) >= nf
            if cp.condition is not None:
                pos = {n: i for i, n in enumerate(cp.fields)}

                def field(name: str) -> Column:
                    # F.get, not element_at: NULL (never a raise) when
                    # the message has fewer tokens than the referenced
                    # slot — ANSI mode makes element_at throw on
                    # out-of-bounds, and the count gate's AND does not
                    # short-circuit.
                    i = pos[name]
                    if cp.ellipsis_at is not None and i >= cp.ellipsis_at:
                        tok = F.get(toks, F.size(toks) - (nf - i))
                    else:
                        tok = F.get(toks, i)
                    grouped = (
                        (tok.startswith('"') & tok.endswith('"'))
                        | (tok.startswith("[") & tok.endswith("]"))
                    ) & (F.length(tok) >= 2)
                    inner = tok.substr(F.lit(2), F.length(tok) - 2)
                    return F.when(grouped, inner).otherwise(tok)

                pred = pred & self._col_node_column(cp.condition, field)
            return pred

        return F.exists(F.array(toks_expr), over)

    def _col_node_column(self, node: ColNode, field) -> Column:
        if isinstance(node, BoolExpr):
            subs = [self._col_node_column(n, field) for n in node.operands]
            out = subs[0]
            for s in subs[1:]:
                out = (out & s) if node.op == "and" else (out | s)
            return out
        raw = field(node.name)
        if isinstance(node.value, float):
            lhs: Column = raw.try_cast("double")
            rhs = F.lit(node.value)
        elif node.regex:
            m = raw.rlike(node.value)
            return m if node.op == "=" else ~m
        elif node.wildcard:
            m = raw.like(_like_pattern(node.value))
            return m if node.op == "=" else ~m
        else:
            lhs, rhs = raw, F.lit(node.value)
        return {
            "=": lhs == rhs,
            "!=": lhs != rhs,
            "<": lhs < rhs,
            "<=": lhs <= rhs,
            ">": lhs > rhs,
            ">=": lhs >= rhs,
        }[node.op]

    # -- DuckDB oracle ---------------------------------------------------------

    def duckdb_sql(
        self,
        message: str | None = None,
        json: str | None = None,
        bindings: Mapping[str, Binding] | None = None,
    ) -> str:
        """The same predicate as ANSI SQL for the DuckDB oracle."""
        if self.ast is None:
            return "TRUE"
        if isinstance(self.ast, TermPattern):
            if message is None:
                raise FilterPatternError("term pattern needs a message expr")
            return self._terms_sql(self.ast, message)
        if isinstance(self.ast, ColumnPattern):
            if message is None:
                raise FilterPatternError("column pattern needs a message expr")
            return self._columns_sql(self.ast, message)
        return self._json_sql(self.ast, json, bindings or {})

    def _terms_sql(self, tp: TermPattern, message: str) -> str:
        def rx(t: Term) -> str:
            return f"regexp_matches({message}, {_sql_quote(_term_regex(t))})"

        parts = [rx(t) for t in tp.terms if t.kind == "and"]
        ors = [rx(t) for t in tp.terms if t.kind == "or"]
        if ors:
            parts.append("(" + " OR ".join(ors) + ")")
        parts += [f"NOT {rx(t)}" for t in tp.terms if t.kind == "not"]
        return "(" + " AND ".join(parts) + ")"

    def _json_sql(
        self,
        node: JsonNode,
        json: str | None,
        bindings: Mapping[str, Binding],
    ) -> str:
        if isinstance(node, BoolExpr):
            glue = " AND " if node.op == "and" else " OR "
            return (
                "("
                + glue.join(self._json_sql(n, json, bindings) for n in node.operands)
                + ")"
            )
        sel, op, val = node.selector, node.op, node.value
        bound = bindings.get(sel.path)
        if bound is not None:
            if bound.sql is None:
                raise FilterPatternError(
                    f"binding for {sel.path} has no SQL expression"
                )
            raw, numeric = bound.sql, bound.numeric
        else:
            if json is None:
                raise FilterPatternError(
                    f"unbound selector {sel.path} needs a json expr"
                )
            # json_valid guard: Spark's get_json_object returns NULL on
            # malformed JSON, DuckDB's json_extract_string raises.
            raw = (
                f"(CASE WHEN json_valid({json}) THEN "
                f"json_extract_string({json}, {_sql_quote(sel.path)}) END)"
            )
            numeric = False
        if op == "exists":
            return f"{raw} IS NOT NULL"
        if op == "not_exists":
            return f"{raw} IS NULL"
        if isinstance(val, bool):
            lhs, rhs = f"CAST({raw} AS VARCHAR)", "'true'" if val else "'false'"
        elif val is None:
            return f"{raw} IS NULL" if op == "=" else f"{raw} IS NOT NULL"
        elif isinstance(val, float):
            lhs = raw if numeric else f"TRY_CAST({raw} AS DOUBLE)"
            rhs = repr(val)
        elif node.regex:
            m = f"regexp_matches(CAST({raw} AS VARCHAR), {_sql_quote(val)})"
            if op == "=":
                return m
            return f"({raw} IS NOT NULL AND NOT ({m}))"
        elif node.wildcard:
            like = _sql_quote(_like_pattern(val))
            m = f"CAST({raw} AS VARCHAR) LIKE {like} ESCAPE '\\'"
            if op == "=":
                return m
            return f"({raw} IS NOT NULL AND NOT ({m}))"
        else:
            lhs, rhs = f"CAST({raw} AS VARCHAR)", _sql_quote(val)
        sql_op = {"=": "=", "!=": "<>", "<": "<", "<=": "<=", ">": ">", ">=": ">="}[op]
        return f"{lhs} {sql_op} {rhs}"


    def _columns_sql(self, cp: ColumnPattern, message: str) -> str:
        toks = f"regexp_extract_all({message}, {_sql_quote(_COL_TOKEN_RX)})"
        nf = len(cp.fields)
        cmp_op = "=" if cp.ellipsis_at is None else ">="
        parts = [f"len({toks}) {cmp_op} {nf}"]
        if cp.condition is not None:
            pos = {n: i for i, n in enumerate(cp.fields)}

            def field(name: str) -> str:
                i = pos[name]
                if cp.ellipsis_at is not None and i >= cp.ellipsis_at:
                    idx = f"len({toks}) - {nf - i - 1}"
                else:
                    idx = str(i + 1)
                tok = f"list_extract({toks}, {idx})"
                grouped = (
                    f"((starts_with({tok}, '\"') AND ends_with({tok}, '\"'))"
                    f" OR (starts_with({tok}, '[') AND ends_with({tok}, ']')))"
                    f" AND length({tok}) >= 2"
                )
                inner = f"substring({tok}, 2, length({tok}) - 2)"
                return f"(CASE WHEN {grouped} THEN {inner} ELSE {tok} END)"

            parts.append(self._col_node_sql(cp.condition, field))
        return "(" + " AND ".join(parts) + ")"

    def _col_node_sql(self, node: ColNode, field) -> str:
        if isinstance(node, BoolExpr):
            glue = " AND " if node.op == "and" else " OR "
            return (
                "("
                + glue.join(self._col_node_sql(n, field) for n in node.operands)
                + ")"
            )
        raw = field(node.name)
        if isinstance(node.value, float):
            lhs, rhs = f"TRY_CAST({raw} AS DOUBLE)", repr(node.value)
        elif node.regex:
            m = f"regexp_matches({raw}, {_sql_quote(node.value)})"
            return m if node.op == "=" else f"NOT ({m})"
        elif node.wildcard:
            like = _sql_quote(_like_pattern(node.value))
            m = f"{raw} LIKE {like} ESCAPE '\\'"
            return m if node.op == "=" else f"NOT ({m})"
        else:
            lhs, rhs = raw, _sql_quote(node.value)
        sql_op = {"=": "=", "!=": "<>", "<": "<", "<=": "<=", ">": ">", ">=": ">="}[
            node.op
        ]
        return f"{lhs} {sql_op} {rhs}"


def compile_pattern(pattern: str) -> CompiledPattern:
    """Parse + wrap a CloudWatch filter pattern for either backend."""
    return CompiledPattern(parse(pattern), pattern)
