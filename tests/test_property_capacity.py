"""Int64-capacity property sweep (round-11 ask #5, generalizing the
round-9 Fleiss-κ silent-wrap): every operator whose docstring claims an
int64 capacity bound gets its BINDING intermediate evaluated here in
plain (arbitrary-precision) Python at the documented safe operating
point and at a modestly larger scale.  The assertions pin two things:

1. SAFE:  at the documented capacity the binding term stays < 2^63 —
   the docstring's "safe to X" claim is arithmetically true.
2. BINDS: at the documented wrap scale the same term exceeds 2^63 —
   the claimed capacity is the real boundary, not slack; if a later
   refactor changes the arithmetic so the term no longer binds there,
   this test forces the docstring to move with it.

Keys whose bound is a data-independent CONSTANT (the formula is
scale-free) just assert the constant.  The specs mirror the exact
integer expressions in the operators — each entry cites its key and
the binding term's closed form.  No Spark session needed: the point is
that the bounds are checkable arithmetic, not measurements.
"""

from __future__ import annotations

import pytest

I64 = 2**63


def _balanced_auc_numerator(n: int) -> int:
    """(u2 ≤ 2·n0·n1) · 1e6 at a balanced split — binding term of
    q_eval_auc and q_ab_mannwhitney's auc_ppm."""
    n0, n1 = n // 2, n - n // 2
    return 2 * n0 * n1 * 10**6


# (key, binding-term description, f(scale), safe_scale, wrap_scale)
BOUNDED = [
    (
        "q_ab_srm_check",
        "chi2 OUTPUT n·1e6 (cross-multiply runs in DECIMAL(38))",
        lambda n: n * 10**6,
        9 * 10**12,
        10**13,
    ),
    (
        "q_ab_fdr_bh",
        "chi2 OUTPUT n·1e6 per test (cross-multiply in DECIMAL(38))",
        lambda n: n * 10**6,
        9 * 10**12,
        10**13,
    ),
    (
        "q_ab_mannwhitney",
        "AUC ppm numerator 2·n0·n1·1e6, balanced arms",
        _balanced_auc_numerator,
        4 * 10**6,
        5 * 10**6,
    ),
    (
        "q_eval_pref_bias_audit",
        "ppm numerator wins·1e6 (chi2 flag runs in DECIMAL(38))",
        lambda n: n * 10**6,
        9 * 10**12,
        10**13,
    ),
    (
        "q_eval_auc",
        "ppm numerator (sum_mr2_pos − P(P+1))·1e6 ≈ (N²/2)·1e6",
        _balanced_auc_numerator,
        4 * 10**6,
        5 * 10**6,
    ),
    (
        "q_timeseries_ses_forecast",
        "weighted sum ≤ cents_max·(2^K − 1), K=20",
        lambda cents: cents * (2**20 - 1),
        85 * 10**11,  # ~$85B/day in cents — the corrected docstring bound
        9 * 10**12,
    ),
    (
        "q_ab_cuped",
        "n·Σxy·1000 ≈ n²·(x̄·ȳ)·1000 at ~$100/user/period",
        lambda n: n * n * (100 * 100) * 1000,
        5 * 10**5,
        10**7,
    ),
    (
        "q_eval_krippendorff_alpha",
        "1e6·A·(n..−1) with A ≤ n.. = 3·units at 3 raters",
        lambda units: 10**6 * (3 * units) * (3 * units - 1),
        10**6,
        2 * 10**6,
    ),
    (
        "q_eval_fleiss_kappa",
        "1e6·((S−Nn)·Nn − T(n−1)) ≲ 1.8e7·N² at n=3",
        lambda n_items: 18_000_000 * n_items * n_items,
        7 * 10**5,
        8 * 10**5,
    ),
    (
        "q_eval_spearman_rho",
        "6e6·Σd² with Σd² < n³/3",
        lambda n: 6 * 10**6 * n**3 // 3,
        16_000,
        17_000,
    ),
    (
        "q_eval_brier",
        "1e6·brier_num ≤ 1e12·n per group",
        lambda n: 10**12 * n,
        9 * 10**6,
        10**7,
    ),
    (
        "q_anon_tcloseness",
        "cum_c·N ≤ n·N ≤ N²",
        lambda n: n * n,
        3 * 10**9,
        4 * 10**9,
    ),
    (
        "q_dq_ks_drift",
        "N1·N2 cross-multiply, ~equal halves",
        lambda n: n * n,
        3 * 10**9,
        4 * 10**9,
    ),
    (
        "q_graph_assortativity",
        "Σdx·dy ≤ 2E·deg_max² at deg_max=1e4",
        lambda edges: 2 * edges * (10**4) ** 2,
        10**9,  # documented operating point (true boundary ~4.6e10)
        5 * 10**10,
    ),
    (
        "q_dq_emd_drift",
        "n0·n1·B at B=100 bins, equal halves",
        lambda n_half: n_half * n_half * 100,
        10**8,
        4 * 10**8,
    ),
    (
        "q_feature_target_encode_loo",
        "(S − yᵢ)·1e6 with S ≤ category cents sum (~$90B)",
        lambda s_cents: s_cents * 10**6,
        9 * 10**12,
        10**13,
    ),
    (
        "q_timeseries_acf",
        "n·|sxy| ≤ n²·x_typ² at |x| ~ 3e3 cents typical",
        lambda n: n * n * (3 * 10**3) ** 2,
        10**6,
        2 * 10**6,
    ),
    (
        "q_timeseries_acf (value-cap worst case)",
        "n²·x_max² at the 1e6-cent cap — binds at ~3e3 events",
        lambda n: n * n * (10**6) ** 2,
        3 * 10**3,
        4 * 10**3,
    ),
    (
        "q_agg_corr_matrix",
        "n·Σx² ≤ n²·x_typ² at x ~ 30 (hundreds-of-dollars unit)",
        lambda n: n * n * 30**2,
        10**8,
        4 * 10**9,
    ),
    (
        "q_agg_corr_matrix (value-cap worst case)",
        "n²·x_max² at x_max ≈ 1e3 — binds at ~3e6 rows",
        lambda n: n * n * (10**3) ** 2,
        3 * 10**6,
        4 * 10**6,
    ),
    (
        "q_regression_ols",
        "r² denominator n·Σy² ≤ n²·y_max² — n·y_max < 3e9 jointly;"
        " spec at $100k/day (1e7 cents)",
        lambda n: n * n * (10**7) ** 2,
        300,
        400,
    ),
    (
        "q_regress_ols_daily",
        "slope numerator cov·1e6 = slope_cents·(n⁴/12)·1e6 at $1k/day",
        lambda n: 10**5 * (n**4 // 12) * 10**6,
        180,
        250,
    ),
]

# Scale-free formulas: the bound is one constant, safe at ANY data size.
CONSTANT = [
    (
        "q_ab_power_mde_sweep",
        "z²·2·p(1−p) ≤ 7.85e6·2·2.5e11",
        7_850_000 * 2 * 250_000_000_000,
    ),
    (
        "q_eval_pass_at_k",
        "20⁵·1e6 falling-factorial products",
        20**5 * 10**6,
    ),
    (
        "q_timeseries_mann_kendall",
        "_MK_SCALE × _MK_EDGE_SCALE",
        10**18,
    ),
    (
        "q_embed_top_pc",
        "Gram entries ≤ n·127² per partition at n ≤ 1e10 rows/part",
        10**10 * 127**2,
    ),
]


@pytest.mark.parametrize(
    "key,desc,f,safe,wrap", BOUNDED, ids=[b[0] for b in BOUNDED]
)
def test_documented_bound_is_safe_and_binding(key, desc, f, safe, wrap):
    at_safe = f(safe)
    at_wrap = f(wrap)
    assert at_safe < I64, (
        f"{key}: binding term [{desc}] already wraps at the documented "
        f"capacity {safe:,} ({at_safe:.3e} ≥ 2^63) — the docstring "
        "overstates the safe range"
    )
    assert at_wrap >= I64, (
        f"{key}: binding term [{desc}] still fits at {wrap:,} "
        f"({at_wrap:.3e} < 2^63) — the documented capacity is not the "
        "real boundary; tighten the docstring or this spec"
    )


@pytest.mark.parametrize(
    "key,desc,value", CONSTANT, ids=[c[0] for c in CONSTANT]
)
def test_scale_free_bound_constant(key, desc, value):
    assert value < I64, f"{key}: [{desc}] = {value:.3e} ≥ 2^63"


def test_krippendorff_marginal_headroom():
    """The Krippendorff bound at exactly 1e6 units × 3 raters sits at
    9.00e18 vs 2^63 = 9.22e18 — only 2.4% headroom. Pin the margin so
    a unit change (e.g. 4 raters) forces a docstring revisit."""
    n_tot = 3 * 10**6
    term = 10**6 * n_tot * (n_tot - 1)
    assert term < I64 < term * 103 // 100
