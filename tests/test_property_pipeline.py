"""Property-based golden test (SURVEY.md §5.2(2)+(3)): arbitrary record
batches — random unicode messages, random event counts (including
zero), all three routing kinds in random order — must route and
transform byte-identically to an independent pure-Python model of the
reference's documented semantics (lambda/main.py:55-98)."""

from __future__ import annotations

import base64
import gzip
import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ex_aws_firehose_spark.operators.firehose import decode_chain, route

RECORDS_SCHEMA = "idx long, record_id string, data string"

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
)

_event = st.fixed_dictionaries(
    {
        "id": _text,
        "timestamp": st.integers(min_value=0, max_value=2**40),
        "message": _text,
    }
)

_record_kind = st.one_of(
    st.tuples(st.just("data"), st.lists(_event, max_size=4)),
    st.tuples(st.just("control"), st.none()),
    st.tuples(st.just("bare"), _text),
)


def _encode(payload: object) -> str:
    return base64.b64encode(gzip.compress(json.dumps(payload).encode())).decode()


def _model(kind: str, detail) -> tuple[str, str | None]:
    """Pure-Python reference model: (result, payload)."""
    if kind == "bare":
        return "Ok", detail
    if kind == "control":
        return "ProcessingFailed", None
    return "Ok", "".join(
        ev["message"].replace("Hello", "Hell Yeah") + "\n" for ev in detail
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=st.lists(_record_kind, min_size=1, max_size=6))
def test_route_matches_python_model(spark, batch):
    rows, expected = [], {}
    for i, (kind, detail) in enumerate(batch):
        rid = f"rec-{i}"
        if kind == "data":
            env = {
                "messageType": "DATA_MESSAGE",
                "owner": "o",
                "logGroup": "g",
                "logStream": "s",
                "subscriptionFilters": [],
                "logEvents": detail,
            }
            rows.append((i, rid, _encode(env)))
        elif kind == "control":
            env = {
                "messageType": "CONTROL_MESSAGE",
                "owner": "o",
                "logGroup": "g",
                "logStream": "s",
                "subscriptionFilters": [],
                "logEvents": [],
            }
            rows.append((i, rid, _encode(env)))
        else:
            rows.append((i, rid, _encode(detail)))
        expected[rid] = _model(kind, detail)

    df = spark.createDataFrame(rows, RECORDS_SCHEMA)
    got = {
        r["record_id"]: (r["result"], r["payload"])
        for r in route(decode_chain(df)).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# Greedy-merge identity backing q_bpe_merge_round's oracle shortcut
# ---------------------------------------------------------------------------


def _greedy_merge_count(toks: list[str], a: str, b: str) -> int:
    """Reference model: left-to-right greedy non-overlapping merges."""
    n = 0
    i = 0
    while i < len(toks) - 1:
        if toks[i] == a and toks[i + 1] == b:
            n += 1
            i += 2
        else:
            i += 1
    return n


@given(
    st.lists(st.sampled_from(["x", "y", "z", "w"]), max_size=30),
)
@settings(deadline=None)
def test_adjacent_count_equals_greedy_merges_when_pair_differs(toks):
    """q_bpe_merge_round counts occurrences of the winning pair (a,b)
    with a != b as plain adjacent matches; that equals the greedy
    non-overlapping merge count BECAUSE a != b forbids overlap (an
    occurrence at i and i+1 would need t[i+1] = b = a). Self-pairs are
    excluded from the winner for exactly this reason."""
    for a in ("x", "y", "z", "w"):
        for b in ("x", "y", "z", "w"):
            if a == b:
                continue
            naive = sum(
                1
                for i in range(len(toks) - 1)
                if toks[i] == a and toks[i + 1] == b
            )
            assert naive == _greedy_merge_count(toks, a, b)


@given(st.lists(st.sampled_from(["x", "y"]), min_size=2, max_size=30))
@settings(deadline=None)
def test_self_pair_adjacent_count_can_exceed_greedy(toks):
    """Documents WHY self-pairs are excluded: for a == b the naive
    adjacent count over-counts runs (floor(run/2) merges vs run-1
    adjacencies) — the two models agree iff no run of length ≥ 3."""
    a = "x"
    naive = sum(
        1 for i in range(len(toks) - 1) if toks[i] == a and toks[i + 1] == a
    )
    greedy = _greedy_merge_count(toks, a, a)
    assert greedy <= naive
    runs = []
    run = 0
    for t in toks + ["!"]:
        if t == a:
            run += 1
        else:
            if run:
                runs.append(run)
            run = 0
    assert greedy == sum(r // 2 for r in runs)
    assert naive == sum(r - 1 for r in runs)


# ---------------------------------------------------------------------------
# Integer A-ES weighted sampling: scale-free priority model
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 30) - 1),
            st.integers(min_value=1, max_value=10_000),
        ),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[0],
    )
)
@settings(deadline=None)
def test_weighted_priority_monotone_in_weight(items):
    """q_sample_weighted's integer priority h*1000 div w is strictly
    non-increasing in weight for a fixed hash — heavier docs can only
    move TOWARD selection — and deterministic (no RNG to flip order
    between engines)."""
    for h, w in items:
        p1 = h * 1000 // w
        p2 = h * 1000 // (w + 1)
        assert p2 <= p1


# ---------------------------------------------------------------------------
# 2-D skyline: total-order collapse == brute-force dominance
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),   # day
            st.integers(min_value=0, max_value=100),  # price
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(deadline=None)
def test_skyline_window_collapse_equals_dominance(points):
    """q_skyline_pareto's formula (per-day max → keep if price beats
    every strictly-earlier day's best) must equal the brute-force
    non-dominated set under (day minimized, price maximized) dominance
    restricted to per-day maxima."""
    per_day: dict[int, int] = {}
    for d, p in points:
        per_day[d] = max(p, per_day.get(d, -1))
    pts = sorted(per_day.items())
    # window formula
    best = None
    window_result = set()
    for d, p in pts:
        if best is None or p > best:
            window_result.add((d, p))
        best = p if best is None else max(best, p)
    # brute force: q dominates p iff q.day <= p.day and q.price >= p.price
    # and strict in at least one coordinate
    brute = {
        (d, p)
        for d, p in pts
        if not any(
            (d2 <= d and p2 >= p and (d2 < d or p2 > p))
            for d2, p2 in pts
        )
    }
    assert window_result == brute


# ---------------------------------------------------------------------------
# CEP: replace-count identity for distinct-letter patterns
# ---------------------------------------------------------------------------


@given(st.text(alphabet="vcpx", max_size=40))
@settings(deadline=None)
def test_cep_replace_count_equals_greedy_scan(s):
    """q_cep_sequence_match counts matches as
    (len(s) - len(replace(s, pat, ''))) / len(pat); for a pattern with
    all-distinct characters this equals the greedy left-to-right
    non-overlapping scan (replace() IS that scan)."""
    pat = "vcp"
    by_replace = (len(s) - len(s.replace(pat, ""))) // len(pat)
    n = 0
    i = 0
    while i <= len(s) - len(pat):
        if s[i : i + len(pat)] == pat:
            n += 1
            i += len(pat)
        else:
            i += 1
    assert by_replace == n


# ---------------------------------------------------------------------------
# Time travel: window replay == dict fold
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10),      # key
            st.integers(min_value=1, max_value=3),       # version
            st.sampled_from(["U", "D"]),                 # op
            st.integers(min_value=0, max_value=1000),    # cents
        ),
        max_size=40,
    )
)
@settings(deadline=None)
def test_time_travel_window_replay_equals_fold(log):
    """q_time_travel_read reconstructs snapshot-at-k as 'latest
    version <= k wins, D drops the row'. The window formulation must
    equal a straight dict fold of the log. Ties on (key, version) are
    excluded — the operator's modeled log has at most one op per
    (key, version) by construction."""
    seen = set()
    clean = []
    for key, ver, op, cents in log:
        if (key, ver) in seen:
            continue
        seen.add((key, ver))
        clean.append((key, ver, op, cents))
    for k in (1, 2, 3):
        # fold model
        latest: dict[int, tuple[int, str, int]] = {}
        for key, ver, op, cents in clean:
            if ver <= k and (key not in latest or ver > latest[key][0]):
                latest[key] = (ver, op, cents)
        fold_rows = {
            (key, cents)
            for key, (ver, op, cents) in latest.items()
            if op != "D"
        }
        # window model: rank by version desc within key, rn=1, op != D
        window_rows = set()
        for key in {c[0] for c in clean}:
            versions = [c for c in clean if c[0] == key and c[1] <= k]
            if not versions:
                continue
            top = max(versions, key=lambda c: c[1])
            if top[2] != "D":
                window_rows.add((key, top[3]))
        assert fold_rows == window_rows


# ---------------------------------------------------------------------------
# Gini formula sanity: known distributions
# ---------------------------------------------------------------------------


def _gini_ppm(xs):
    xs = sorted(xs)
    n = len(xs)
    total = sum(xs)
    s = sum((i + 1) * x for i, x in enumerate(xs))
    return (2 * s - (n + 1) * total) * 1_000_000 // (n * total)


def test_gini_uniform_is_zero():
    assert _gini_ppm([100] * 50) == 0


def test_gini_single_whale_approaches_one():
    n = 100
    g = _gini_ppm([0] * 0 + [1] * (n - 1) + [10_000_000])
    # single dominant holder → G ≈ (n-1)/n
    assert abs(g - (n - 1) * 1_000_000 // n) < 20_000


@given(
    st.lists(st.integers(min_value=1, max_value=10_000), min_size=2, max_size=60)
)
@settings(deadline=None)
def test_gini_bounds_and_transfer_monotonicity(xs):
    """0 ≤ G < 1, and a rich-to-poor transfer (Pigou–Dalton) never
    increases G — the two defining properties of the index
    q_agg_gini computes."""
    g = _gini_ppm(xs)
    assert 0 <= g < 1_000_000
    ys = sorted(xs)
    if ys[0] + 2 <= ys[-1]:  # transfer 1 unit from richest to poorest
        ys[0] += 1
        ys[-1] -= 1
        assert _gini_ppm(ys) <= g
