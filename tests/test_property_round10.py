"""Property tests for the round-10 statistical operators: each pins the
operator's core algebra against an independent brute-force pure-Python
model on ARBITRARY inputs (hypothesis), not just the shipped testdata —
the doubled-rank Mann-Whitney tie algebra, the Nelson-Aalen risk-set
recurrence, the BH step-up rule, Shapley efficiency, and the dyadic SES
convexity."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


# --- Mann-Whitney doubled-rank algebra ------------------------------------


def _mw_doubled_rank_sums(vals: list[tuple[int, int]]) -> tuple[int, int]:
    """The operator's formula: per distinct metric value, doubled
    average rank = 2*prior + cnt + 1; R2_arm = sum over arm members."""
    cnt = Counter(m for m, _ in vals)
    r2 = {0: 0, 1: 0}
    prior = 0
    for m in sorted(cnt):
        avg2 = 2 * prior + cnt[m] + 1
        for mm, arm in vals:
            if mm == m:
                r2[arm] += avg2
        prior += cnt[m]
    return r2[0], r2[1]


@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 1)),
        min_size=2,
        max_size=60,
    ).filter(lambda v: {a for _, a in v} == {0, 1})
)
@settings(max_examples=200, deadline=None)
def test_mannwhitney_u_equals_pair_count(vals):
    """2*U1 from the rank-sum formula must equal the brute-force pair
    count 2*(#{treat>ctrl} + 0.5*#{ties}) on any tied multiset."""
    r2_0, r2_1 = _mw_doubled_rank_sums(vals)
    n0 = sum(1 for _, a in vals if a == 0)
    n1 = sum(1 for _, a in vals if a == 1)
    u2_1 = r2_1 - n1 * (n1 + 1)
    wins2 = 0
    for m1, a1 in vals:
        if a1 != 1:
            continue
        for m0, a0 in vals:
            if a0 != 0:
                continue
            wins2 += 2 if m1 > m0 else (1 if m1 == m0 else 0)
    assert u2_1 == wins2
    assert (r2_0 - n0 * (n0 + 1)) + u2_1 == 2 * n0 * n1  # identity


# --- Nelson-Aalen risk-set recurrence -------------------------------------


@given(
    st.lists(
        st.tuples(st.integers(0, 10), st.booleans()),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_nelson_aalen_risk_sets(durs):
    """n_risk(t) derived from the duration histogram (N - finished
    before t) must equal the brute-force risk set |{u: dur_u >= t}|;
    the cumulative hazard is nondecreasing."""
    n = len(durs)
    hist = Counter(t for t, _ in durs)
    prior, cum, prev_risk = 0, 0, None
    for t in sorted(hist):
        n_risk = n - prior
        assert n_risk == sum(1 for d, _ in durs if d >= t)
        d_events = sum(1 for d, ev in durs if d == t and ev)
        cum += d_events * 1_000_000 // n_risk
        assert cum >= 0
        if prev_risk is not None:
            assert n_risk < prev_risk
        prev_risk = n_risk
        prior += hist[t]


# --- Benjamini-Hochberg step-up -------------------------------------------


@given(
    st.lists(st.integers(0, 10_000_000), min_size=1, max_size=6),
)
@settings(max_examples=300, deadline=None)
def test_bh_prefix_equals_stepup_definition(chis):
    """rank <= max{k: chi_(k) >= crit(k)} (the operator's rule) must
    equal the textbook step-up: reject i iff EXISTS k >= i with
    chi_(k) >= crit(k)."""
    from ex_aws_firehose_spark.operators.analytics import _BH_CRIT_X1M

    m = len(chis)
    crit = _BH_CRIT_X1M[:m] if m <= 6 else None
    assert crit is not None
    ranked = sorted(chis, reverse=True)
    kmax = 0
    for i, c in enumerate(ranked, 1):
        if c >= crit[i - 1]:
            kmax = i
    for i in range(1, m + 1):
        textbook = any(
            ranked[k - 1] >= crit[k - 1] for k in range(i, m + 1)
        )
        assert (i <= kmax) == textbook


# --- Shapley efficiency over the x24 integer weights ----------------------


@given(st.lists(st.integers(0, 1_000_000), min_size=16, max_size=16))
@settings(max_examples=200, deadline=None)
def test_shapley_phi24_efficiency_exact(vs):
    """Over the x24 integer weights, sum of phi24 across the 4 channels
    telescopes EXACTLY to 24*(v(full) - v(empty)) for ANY v table —
    the efficiency axiom before the final /24 truncation."""
    from ex_aws_firehose_spark.operators.analytics import _shap_coalitions

    v = dict(enumerate(vs))
    phi24 = Counter()
    for ch, s0, s1, w in _shap_coalitions():
        phi24[ch] += w * (v[s1] - v[s0])
    assert sum(phi24.values()) == 24 * (v[15] - v[0])


# --- Dyadic SES closed form -----------------------------------------------


@given(st.lists(st.integers(0, 10**9), min_size=2, max_size=20))
@settings(max_examples=200, deadline=None)
def test_ses_dyadic_forecast_is_convex(series):
    """Sum of weights 2^(used-j) for j=1..used is 2^used - 1, so the
    truncated forecast lies in [min-1, max] of the window for any
    series — the convexity the fixture invariant relies on."""
    used = len(series)
    s = sum(c * (1 << (used - j)) for j, c in enumerate(series, 1))
    denom = (1 << used) - 1
    f = s // denom
    assert min(series) - 1 <= f <= max(series)
