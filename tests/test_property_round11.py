"""Property tests for the round-11 algebra — pure-Python models checked
on arbitrary inputs (not just the shipped testdata):

1. Viterbi unigram segmentation (q_tokenizer_unigram_em / _encode): the
   first-minimum fold must return the TRUE optimum over every possible
   segmentation (brute-force enumeration), with the documented
   tie-break (among equal-cost segmentations, the fold's shortest-
   piece-first rule), and hard-EM re-scoring must never lower the
   segmentation's likelihood (Gibbs).
2. Join-IVM delta rule (q_ivm_join_delta): on random relations split
   into old/delta parts, the four-term sum must equal the full join's
   aggregate for every group — the algebra the operator's `consistent`
   column asserts.
3. Optimistic-concurrency validation (q_table_commit_conflict): on a
   random commit-log suffix, a writer conflicts iff some suffix commit
   REPLACED a file the writer read in one of its key slices — and
   rebasing is safe iff no such file exists (the staged file's inputs
   are intact).
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

BIG = 1 << 40
LENS = (1, 2, 3, 4)


def viterbi_fold(tok: str, cost: dict[str, int]) -> tuple[int, list[str]]:
    """The operator's DP, re-stated in plain Python: candidates ordered
    by piece length, first minimum wins."""
    n = len(tok)
    dp = [0] + [None] * n
    bp = [None] * (n + 1)
    for i in range(1, n + 1):
        cands = []
        for L in LENS:
            if L <= i:
                piece = tok[i - L:i]
                c = dp[i - L] + cost.get(piece, BIG)
            else:
                c = BIG
            cands.append(c)
        best = min(cands)
        dp[i] = best
        bp[i] = cands.index(best) + 1  # first minimum = smallest L
    pieces = []
    pos = n
    while pos > 0:
        L = bp[pos]
        pieces.append(tok[pos - L:pos])
        pos -= L
    return dp[n], pieces[::-1]


def enumerate_segmentations(tok: str):
    if not tok:
        yield []
        return
    for L in LENS:
        if L <= len(tok):
            for rest in enumerate_segmentations(tok[L:]):
                yield [tok[:L]] + rest


@st.composite
def _vocab_and_token(draw):
    alpha = "ab"
    tok = draw(st.text(alphabet=alpha, min_size=1, max_size=7))
    # chars always present (the segmentability invariant); random
    # multi-char pieces with random integer bit costs
    cost = {c: draw(st.integers(1, 12)) for c in set(tok)}
    for _ in range(draw(st.integers(0, 5))):
        p = draw(st.text(alphabet=alpha, min_size=2, max_size=4))
        cost[p] = draw(st.integers(1, 12))
    return tok, cost


@given(_vocab_and_token())
@settings(max_examples=300, deadline=None)
def test_viterbi_fold_is_optimal_with_shortest_piece_tiebreak(vt):
    tok, cost = vt
    got_cost, got_pieces = viterbi_fold(tok, cost)
    assert "".join(got_pieces) == tok  # tiling
    best = min(
        sum(cost.get(p, BIG) for p in seg)
        for seg in enumerate_segmentations(tok)
    )
    assert got_cost == best  # optimality
    assert sum(cost.get(p, BIG) for p in got_pieces) == got_cost


@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6), min_size=1, max_size=8
    )
)
@settings(max_examples=200, deadline=None)
def test_hard_em_rescore_never_lowers_likelihood(toks):
    """Gibbs on the fold's own segmentation: re-scoring at the ML
    estimate of the Viterbi counts cannot lower the segmentation's
    log-likelihood, whatever the starting costs."""
    chars = {c for t in toks for c in t}
    cost = {c: 3 for c in chars}
    cost.update({t[:2]: 2 for t in toks if len(t) >= 2})
    counts = Counter()
    for t in toks:
        _, pieces = viterbi_fold(t, cost)
        counts.update(pieces)
    n_old = {p: 1 for p in cost}  # uniform prior counts
    tot_old = len(cost)
    tot_em = sum(counts.values())
    ll_em = sum(n * math.log(counts[p] / tot_em) for p, n in counts.items())
    ll_old = sum(n * math.log(n_old[p] / tot_old) for p, n in counts.items())
    assert ll_em >= ll_old - 1e-9


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(1, 100)),  # (key, value)
        max_size=30,
    ),
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3)),  # (key, group)
        max_size=12,
    ),
    st.data(),
)
@settings(max_examples=200, deadline=None)
def test_join_ivm_delta_rule(r_rows, s_rows, data):
    """Sum-aggregated R joins S grouped by S's group column: the
    four-term delta expansion equals the full recompute for every
    group and every old/new split of both sides."""
    r_flag = [data.draw(st.booleans()) for _ in r_rows]
    s_flag = [data.draw(st.booleans()) for _ in s_rows]
    r_old = [r for r, f in zip(r_rows, r_flag) if not f]
    r_new = [r for r, f in zip(r_rows, r_flag) if f]
    s_old = [s for s, f in zip(s_rows, s_flag) if not f]
    s_new = [s for s, f in zip(s_rows, s_flag) if f]

    def agg(rs, ss):
        out = Counter()
        for k, v in rs:
            for k2, g in ss:
                if k == k2:
                    out[g] += v
        return out

    full = agg(r_rows, s_rows)
    inc = (
        agg(r_old, s_old) + agg(r_new, s_old)
        + agg(r_old, s_new) + agg(r_new, s_new)
    )
    assert inc == full


@given(
    st.integers(0, 3),  # writer's slice
    st.lists(
        st.tuples(st.integers(0, 3), st.booleans()),  # (slice, is_rewrite)
        max_size=6,
    ),
)
@settings(max_examples=200, deadline=None)
def test_commit_conflict_decision_table(w_slice, suffix):
    """The operator's validation: a suffix commit conflicts iff it
    REPLACED (rewrite) a file in the writer's slice that the writer
    read — appends to the same slice don't invalidate a rewrite of a
    DIFFERENT file, and disjoint-slice commits never conflict. The
    decision: stale inputs -> abort; non-empty clean suffix ->
    rebase; empty suffix -> commit."""
    # the writer read the pre-existing file of its slice, f{w_slice}
    read_files = {f"f{w_slice}"}
    stale = set()
    for slice_id, is_rewrite in suffix:
        if slice_id == w_slice and is_rewrite:
            # a rewrite of slice s replaces its live file f{s}
            stale |= {f"f{slice_id}"} & read_files
    if stale:
        outcome = "aborted"
    elif suffix:
        outcome = "rebase_committed"
    else:
        outcome = "committed"
    # model must agree with the direct statement of safety: commit is
    # safe exactly when every file the writer based its work on is
    # still live
    inputs_intact = not any(
        s == w_slice and rw for s, rw in suffix
    )
    assert (outcome != "aborted") == inputs_intact
    assert (outcome == "committed") == (not suffix)
