"""Property tests for the r9 operator algebra (hypothesis): the
grid-prefiltered / fixed-point forms the SQL executes must equal the
textbook definitions exactly — proven over random inputs with Fraction
arithmetic where the identity is rational, and with explicit floor
bounds where the spec itself floors. (Engine parity is the oracle
gate's job; these pin the FORMULAS.)"""

from __future__ import annotations

from collections import Counter
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.ml_eval import (
    CONFORMAL_ALPHA_E3,
    NDCG_K,
    _NDCG_DISCOUNTS_E6,
    _NDCG_IDCG_E6,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.similarity import (
    SHAP_SCALE,
)

scored_rows = st.lists(
    st.tuples(st.integers(-30, 30), st.booleans()), min_size=1, max_size=120
)


@settings(max_examples=200, deadline=None)
@given(scored_rows)
def test_ndcg_histogram_prefilter_equals_full_sort(data):
    """ndcg_at_k's plan sorts only rows with s_fp ≥ the grid cut (the
    largest cell whose descending cumulative count reaches k); the
    top-k of that filtered set under (s_fp DESC, row_id ASC) must be
    IDENTICAL to the top-k of a full sort — the prefilter is exact,
    not approximate."""
    rows = [(s, i, p) for i, (s, p) in enumerate(data)]
    full = sorted(rows, key=lambda r: (-r[0], r[1]))[:NDCG_K]
    # grid cut
    cells = Counter(s for s, _, _ in rows)
    cum = 0
    cut = None
    for s in sorted(cells, reverse=True):
        cum += cells[s]
        if cum >= NDCG_K:
            cut = s
            break
    if cut is None:  # fewer than k rows total: keep everything
        cut = min(cells)
    survivors = [r for r in rows if r[0] >= cut]
    filtered = sorted(survivors, key=lambda r: (-r[0], r[1]))[:NDCG_K]
    assert filtered == full
    # dcg over the top-k with integer e6 discounts floors each
    # discount once, module-level — terms are exact integer products
    dcg = sum(
        _NDCG_DISCOUNTS_E6[i] * int(p) for i, (_, _, p) in enumerate(full)
    )
    exact = sum(
        Fraction(1_000_000) / _log2_fraction_bound(i + 2) * int(p)
        for i, (_, _, p) in enumerate(full)
    )
    # floor-per-discount: each term loses < 1 unit per relevant row
    n_rel = sum(1 for _, _, p in full if p)
    assert dcg <= exact and exact - dcg < n_rel + 1


def _log2_fraction_bound(n):
    """log2(n) is irrational for non-powers-of-two; the property only
    needs the floor bound, so compare against the true float value via
    a high-precision Fraction envelope."""
    import math

    return Fraction(math.log2(n)).limit_denominator(10**12)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2_000_000), st.booleans()),
        min_size=1,
        max_size=120,
    )
)
def test_ece_integer_form_equals_definition(rows):
    """calibration_ece's single-division integer form equals the
    textbook Σ_b (n_b/N)·|acc_b − conf̄_b| exactly in Fractions before
    the one final floor (loss < 1 e6-unit)."""
    B = 10
    bins: dict[int, list[tuple[int, bool]]] = {}
    for conf_h, pos in rows:
        b = min(B - 1, (conf_h * B) // 2_000_000)
        bins.setdefault(b, []).append((conf_h, pos))
    n = len(rows)
    exact = sum(
        Fraction(len(v), n)
        * abs(
            Fraction(sum(1 for _, p in v if p), len(v))
            - Fraction(sum(c for c, _ in v), 2_000_000 * len(v))
        )
        for v in bins.values()
    )
    gap_sum = sum(
        abs(
            2_000_000 * sum(1 for _, p in v if p)
            - sum(c for c, _ in v)
        )
        for v in bins.values()
    )
    ece_e6 = gap_sum // (2 * n)
    assert ece_e6 <= exact * 1_000_000 < ece_e6 + 1


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(-1_000_000, 1_000_000), min_size=1, max_size=150))
def test_conformal_grid_rule_equals_order_statistic(pos_scores):
    """conformal_threshold's grid rule (max s_fp with descending
    cum_pos ≥ need) must equal the need-th largest positive score —
    the ⌈(n+1)(1−α)⌉ split-conformal order statistic — and coverage at
    that threshold is ≥ need (boundary ties only add coverage)."""
    n_pos = len(pos_scores)
    need = -(-((n_pos + 1) * (1000 - CONFORMAL_ALPHA_E3)) // 1000)
    # the pinned all-positive ceil form
    need_spec = ((n_pos + 1) * (1000 - CONFORMAL_ALPHA_E3) + 999) // 1000
    assert need == need_spec
    if need > n_pos:  # tiny calibration sets can demand more than n
        return
    desc = sorted(pos_scores, reverse=True)
    order_stat = desc[need - 1]
    # grid walk
    cells = Counter(pos_scores)
    cum = 0
    thr = None
    for s in sorted(cells, reverse=True):
        cum += cells[s]
        if cum >= need:
            thr = s
            break
    assert thr == order_stat
    assert sum(1 for s in pos_scores if s >= thr) >= need


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)), max_size=40
    ),
    st.integers(1, 4),
)
def test_hyperanf_recurrence_equals_bfs_balls(edge_list, radius):
    """The neighborhood-function recurrence the sketch plan executes —
    c_0(v) = {v}; c_r(v) = c_{r-1}(v) ∪ ⋃_{u∈N(v)} c_{r-1}(u) — must
    equal the BFS ball B(v, r) exactly as SETS on every graph (the
    sketch only approximates the CARDINALITY). Pins the two accounting
    seams the plan handles explicitly: isolated nodes (own-sketch
    union keeps leaf members of N(v) that appear in nobody else's
    neighborhood — the bug the first implementation had) and the −1
    self-subtraction done at estimate time, not in the recurrence."""
    nodes = sorted(
        {v for e in edge_list for v in e} | set(range(0, 15, 5))
    )
    adj = {v: set() for v in nodes}
    for a, b in edge_list:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    c = {v: {v} for v in nodes}
    for _ in range(radius):
        c = {
            v: c[v] | set().union(*(c[u] for u in adj[v]), c[v])
            for v in nodes
        }
    for v in nodes:
        # BFS ball
        frontier, ball = {v}, {v}
        for _ in range(radius):
            frontier = {w for u in frontier for w in adj[u]} - ball
            ball |= frontier
        assert c[v] == ball
        # the plan's readout: |c_r(v)| − 1 = reach excluding self
        assert len(c[v]) - 1 == len(ball - {v})


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.booleans(), min_size=1, max_size=100),
    st.integers(1, 10),
)
def test_knn_shapley_efficiency_axiom_exact(matches, k):
    """Jia et al. Theorem 1 in exact Fractions: the backward
    recurrence s_i = s_{i+1} + (m_i − m_{i+1})·min(K,i)/(K·i) with
    s_N = m_N/N telescopes to Σᵢ sᵢ = (Σ_{i≤K} m_i)/K — the Shapley
    efficiency axiom for the K-NN utility. The plan's e9 suffix-sum
    floors each term once; per-point distance to the exact value is
    < the number of floored terms in its suffix."""
    n = len(matches)
    m = [int(x) for x in matches]
    s = [Fraction(0)] * n
    s[n - 1] = Fraction(m[n - 1], max(k, n))
    for i in range(n - 2, -1, -1):
        s[i] = s[i + 1] + Fraction(
            (m[i] - m[i + 1]) * min(k, i + 1), k * (i + 1)
        )
    total = sum(s)
    assert total == Fraction(sum(m[: min(k, n)]), k)
    # fixed-point twin: floor-then-sign signed terms, suffix sums
    terms = [0] * n
    terms[n - 1] = m[n - 1] * (SHAP_SCALE // max(k, n))
    for i in range(n - 2, -1, -1):
        qpos = (SHAP_SCALE * min(k, i + 1)) // (k * (i + 1))
        terms[i] = (m[i] - m[i + 1]) * qpos
    suffix = 0
    for i in range(n - 1, -1, -1):
        suffix += terms[i]
        exact_e9 = s[i] * SHAP_SCALE
        n_terms = n - i
        assert abs(Fraction(suffix) - exact_e9) < n_terms + 1
