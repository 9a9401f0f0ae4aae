"""Property tests for the Poisson-bootstrap machinery
(q_eval_bootstrap_ci) and the exact-rank corpus partitions
(q_text_quality_tertiles): the frozen inverse-CDF ladder must BE the
Poisson(1) CDF, and both operators must reproduce an independent pure-
Python model on arbitrary inputs — not just on the shipped testdata.
"""

from __future__ import annotations

import hashlib
import math
import os
import tempfile

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ex_aws_firehose_spark.operators.llm import BOOT_B, _POIS_T
from ex_aws_firehose_spark.registry import REGISTRY, load_all_operators

load_all_operators()


def test_pois_thresholds_are_poisson1_cdf():
    """The frozen constants equal floor(CDF_Poisson(1)(k) * 2^32)."""
    cum, p = 0.0, math.exp(-1.0)
    for k, t in enumerate(_POIS_T):
        cum += p
        assert t == math.floor(cum * 2**32), f"threshold {k} drifted"
        p = p / (k + 1)
    # Ladder mean: sum over weights of w * P(w) must be ~1 (the Poisson
    # bootstrap's unbiasedness hinges on E[w] = 1).
    probs = []
    prev = 0
    for t in _POIS_T:
        probs.append((t - prev) / 2**32)
        prev = t
    probs.append(1 - prev / 2**32)  # weight 8 tail
    mean = sum(w * p for w, p in enumerate(probs))
    # Capping draws at 8 sheds the Σ_{k>8}(k−8)·p_k tail ≈ 1.1e-6 of
    # mean — the documented truncation bias, far below CI resolution.
    assert abs(mean - 1.0) < 1e-5


def _ladder_weight(u: int) -> int:
    for k, t in enumerate(_POIS_T):
        if u < t:
            return k
    return 8


@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_ladder_is_monotone_inverse_cdf(u):
    w = _ladder_weight(u)
    assert 0 <= w <= 8
    if w > 0:
        assert u >= _POIS_T[w - 1]
    if w < 8:
        assert u < _POIS_T[w]


def _hash_u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _model_bootstrap(docs: list[tuple[int, str, int]]):
    """Pure-Python q_eval_bootstrap_ci model: docs = (doc_id, source,
    n_chars) → {source: (n_docs, mean_milli, lo_milli, hi_milli)}."""
    out = {}
    sources = sorted({s for _, s, _ in docs})
    for src in sources:
        rows = [(d, n) for d, s, n in docs if s == src]
        means = []
        for b in range(BOOT_B):
            sw = sws = 0
            for doc_id, n_chars in rows:
                w = _ladder_weight(_hash_u32(f"{doc_id}:{b}"))
                sw += w
                sws += w * n_chars
            if sw > 0:
                means.append(sws * 1000 // sw)
        means.sort()
        lo = means[math.ceil(0.025 * len(means)) - 1]
        hi = means[math.ceil(0.975 * len(means)) - 1]
        total = sum(n for _, n in rows)
        out[src] = (len(rows), total * 1000 // len(rows), lo, hi)
    return out


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["web", "books"]),
            st.integers(min_value=1, max_value=9999),
        ),
        min_size=3,
        max_size=40,
    )
)
def test_bootstrap_ci_matches_python_model(spark, docs):
    rows = [(i, src, n) for i, (src, n) in enumerate(docs)]
    with tempfile.TemporaryDirectory() as td:
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": ["x" for _ in rows],
                "lang": ["en" for _ in rows],
                "source": [r[1] for r in rows],
                "n_chars": [r[2] for r in rows],
            }
        ).to_parquet(os.path.join(td, "documents.parquet"))
        got = {
            r["source"]: (
                r["n_docs"],
                r["mean_milli"],
                r["lo_milli"],
                r["hi_milli"],
            )
            for r in REGISTRY["q_eval_bootstrap_ci"]
            .fn(spark, td)
            .collect()
        }
    assert got == _model_bootstrap(rows)


def _model_tertiles(texts: list[tuple[int, str]]):
    """Pure-Python q_text_quality_tertiles model."""
    toks = [(d, t) for d, text in texts for t in text.lower().split(" ")]
    freq: dict[str, int] = {}
    for _, t in toks:
        freq[t] = freq.get(t, 0) + 1
    per_doc: dict[int, list[int]] = {}
    for d, t in toks:
        per_doc.setdefault(d, []).append(freq[t].bit_length() - 1)
    scores = {
        d: (sum(bs) * 1000 // len(bs), len(bs)) for d, bs in per_doc.items()
    }
    vals = sorted(s for s, _ in scores.values())
    n = len(vals)
    t1 = vals[math.ceil(n / 3) - 1]
    t2 = vals[math.ceil(2 * n / 3) - 1]
    out: dict[str, list[tuple[int, int]]] = {}
    for s, ntok in scores.values():
        b = "head" if s >= t2 else ("middle" if s >= t1 else "tail")
        out.setdefault(b, []).append((s, ntok))
    return {
        b: (
            len(v),
            sum(nt for _, nt in v),
            min(s for s, _ in v),
            max(s for s, _ in v),
        )
        for b, v in out.items()
    }


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=1, max_size=24).map(
            lambda s: " ".join(s.split()) or "a"
        ),
        min_size=2,
        max_size=25,
    )
)
def test_quality_tertiles_match_python_model(spark, texts):
    rows = list(enumerate(texts))
    with tempfile.TemporaryDirectory() as td:
        pd.DataFrame(
            {
                "doc_id": [d for d, _ in rows],
                "text": [t for _, t in rows],
                "lang": ["en" for _ in rows],
                "source": ["web" for _ in rows],
                "n_chars": [len(t) for _, t in rows],
            }
        ).to_parquet(os.path.join(td, "documents.parquet"))
        got = {
            r["bucket"]: (
                r["n_docs"],
                r["sum_tokens"],
                r["min_score_milli"],
                r["max_score_milli"],
            )
            for r in REGISTRY["q_text_quality_tertiles"]
            .fn(spark, td)
            .collect()
        }
    assert got == _model_tertiles(rows)


def _model_acf(series: list[int], lags=(1, 2, 3), min_pairs: int = 20):
    """Pure-Python q_timeseries_acf model over one user's cents series
    (already in event-time order): {lag: (n, acf_or_None)}."""
    out = {}
    for k in lags:
        pairs = list(zip(series, series[k:]))
        n = len(pairs)
        if n < min_pairs:
            continue
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        acf = None
        if d1 > 0 and d2 > 0:
            acf = round(
                float(n * sxy - sx * sy)
                / (math.sqrt(float(d1)) * math.sqrt(float(d2))),
                6,
            )
        out[k] = (n, acf)
    return out


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cents=st.lists(
        st.integers(min_value=0, max_value=50000), min_size=23, max_size=60
    )
)
def test_acf_matches_python_model(spark, cents):
    with tempfile.TemporaryDirectory() as td:
        pd.DataFrame(
            {
                "event_id": range(len(cents)),
                "ts": pd.to_datetime(
                    [1_700_000_000_000_000 + i * 60_000_000 for i in range(len(cents))],
                    unit="us",
                ),
                "user_id": [7] * len(cents),
                "event_type": ["view"] * len(cents),
                "value": [c / 100.0 for c in cents],
                "props": ["{}"] * len(cents),
            }
        ).to_parquet(os.path.join(td, "events.parquet"))
        got = {
            r["lag"]: (r["n"], r["acf"])
            for r in REGISTRY["q_timeseries_acf"].fn(spark, td).collect()
        }
    # The query quantizes value→cents with ROUND(value*100); c/100.0
    # round-trips exactly for integer cents (IEEE double holds c/100
    # to <0.5 ulp and Spark's HALF_UP round restores c).
    assert got == _model_acf(cents)
