"""Property tests for the late-r8 operator algebra (hypothesis): the
grouped / sparse / fixed-point forms the SQL executes must equal the
textbook definitions exactly — proven over random inputs with Fraction
arithmetic where the identity is rational, and with explicit floor
bounds where the spec itself floors. (Engine parity is the oracle
gate's job; these pin the FORMULAS.)"""

from __future__ import annotations

from collections import Counter
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

scored_rows = st.lists(
    st.tuples(st.integers(-30, 30), st.booleans()), min_size=1, max_size=120
)


@settings(max_examples=200, deadline=None)
@given(scored_rows)
def test_grouped_ap_equals_rowwise_threshold_sweep(data):
    """average_precision's cell form: walking DISTINCT score cells in
    descending order with (pos_at, cum_pos, cum_tot) equals the
    row-level threshold-sweep definition AP = Σ_t ΔR_t·P_t over
    distinct thresholds — exactly, in Fractions."""
    if not any(p for _, p in data):
        return
    n_pos = sum(1 for _, p in data if p)
    # row-level definition: thresholds are distinct scores descending;
    # at threshold t, predictions = rows with score >= t
    thresholds = sorted({s for s, _ in data}, reverse=True)
    ap_rowwise = Fraction(0)
    prev_recall = Fraction(0)
    for t in thresholds:
        sel = [(s, p) for s, p in data if s >= t]
        tp = sum(1 for _, p in sel if p)
        recall = Fraction(tp, n_pos)
        precision = Fraction(tp, len(sel))
        ap_rowwise += (recall - prev_recall) * precision
        prev_recall = recall
    # grouped (cell) form — the SQL shape
    cells_pos: Counter = Counter()
    cells_tot: Counter = Counter()
    for s, p in data:
        cells_tot[s] += 1
        cells_pos[s] += int(p)
    cum_pos = cum_tot = 0
    ap_grouped = Fraction(0)
    term_sum = 0  # the fixed-point spec
    n_cells = 0
    for s in sorted(cells_tot, reverse=True):
        cum_pos += cells_pos[s]
        cum_tot += cells_tot[s]
        ap_grouped += Fraction(cells_pos[s], n_pos) * Fraction(cum_pos, cum_tot)
        term_sum += (1_000_000_000 * cells_pos[s] * cum_pos) // cum_tot
        n_cells += 1
    assert ap_grouped == ap_rowwise
    # the fixed-point spec floors each cell's e9 term: the loss is
    # strictly less than one unit per cell
    exact_terms = sum(
        Fraction(1_000_000_000 * p_at * cp, ct)
        for p_at, cp, ct in _cells(data)
    )
    assert term_sum <= exact_terms < term_sum + n_cells


def _cells(data):
    cells_pos: Counter = Counter()
    cells_tot: Counter = Counter()
    for s, p in data:
        cells_tot[s] += 1
        cells_pos[s] += int(p)
    cum_pos = cum_tot = 0
    for s in sorted(cells_tot, reverse=True):
        cum_pos += cells_pos[s]
        cum_tot += cells_tot[s]
        yield cells_pos[s], cum_pos, cum_tot


dists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(1, 20)), min_size=1, max_size=40
)


@settings(max_examples=200, deadline=None)
@given(dists, dists)
def test_sparse_tvd_closed_form_equals_dense(cls_rows, rest_rows):
    """t_closeness_audit's sparse form: Σ_present |cnt·N_g − gcnt·N_c|
    + N_c·(N_g − Σ_present gcnt) equals the dense Σ over ALL global
    values — exactly, in integers (and the resulting TVD is in [0, 1])."""
    cls: Counter = Counter()
    for v, n in cls_rows:
        cls[v] += n
    gcnt: Counter = Counter(cls)
    for v, n in rest_rows:
        gcnt[v] += n
    n_c = sum(cls.values())
    n_g = sum(gcnt.values())
    sparse = sum(
        abs(cls[v] * n_g - gcnt[v] * n_c) for v in cls
    ) + n_c * (n_g - sum(gcnt[v] for v in cls))
    dense = sum(abs(cls.get(v, 0) * n_g - gcnt[v] * n_c) for v in gcnt)
    assert sparse == dense
    tvd = Fraction(dense, 2 * n_c * n_g)
    assert 0 <= tvd <= 1
    # identity: a class distributed exactly like the corpus has TVD 0
    scaled = {v: n * n_c for v, n in gcnt.items()}  # cls ∝ gcnt
    dense0 = sum(abs(scaled[v] * n_g - gcnt[v] * sum(scaled.values())) for v in gcnt)
    assert dense0 == 0


@settings(max_examples=200, deadline=None)
@given(dists, dists)
def test_jsd_absent_mass_identity(src_rows, rest_rows):
    """js_divergence_sources' closed form rests on the rational
    identity Σ_absent q = 1 − Σ_present q (the ln 2 factor is common
    to every absent term) — exact in Fractions."""
    src: Counter = Counter()
    for v, n in src_rows:
        src[v] += n
    rest: Counter = Counter()
    for v, n in rest_rows:
        rest[v] += n
    if not rest:
        return
    n_r = sum(rest.values())
    q_present = sum(Fraction(rest.get(v, 0), n_r) for v in src)
    q_absent = sum(
        Fraction(n, n_r) for v, n in rest.items() if v not in src
    )
    assert q_present + q_absent == 1


ranked = st.lists(
    st.tuples(st.integers(-20, 20), st.booleans()), min_size=1, max_size=100
)


@settings(max_examples=200, deadline=None)
@given(ranked)
def test_strictly_better_count_equals_sorted_rank(data):
    """knn_label_mrr's sort-free rank: for the argmax same-label row
    under (score desc, id asc), 1 + #strictly-better equals its
    position in the fully sorted order."""
    rows = [(s, i, p) for i, (s, p) in enumerate(data)]
    matches = [(s, i) for s, i, p in rows if p]
    if not matches:
        return
    best = max(matches, key=lambda t: (t[0], -t[1]))
    order = sorted(rows, key=lambda t: (-t[0], t[1]))
    rank_sorted = next(
        k + 1 for k, (s, i, _) in enumerate(order) if (s, i) == best
    )
    rank_counted = 1 + sum(
        1
        for s, i, _ in rows
        if s > best[0] or (s == best[0] and i < best[1])
    )
    assert rank_counted == rank_sorted


edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=0, max_size=40
)


@settings(max_examples=200, deadline=None)
@given(edge_lists)
def test_bounded_peel_with_early_exit_equals_fixpoint(pairs):
    """kcore_decomposition's contract: if peeling converges within the
    round budget, the bounded (early-exit) peel equals the true k-core;
    rounds past the fixpoint are no-ops (idempotence)."""
    k = 2
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def peel_once(g):
        drop = {n for n, s in g.items() if len(s) < k}
        if not drop:
            return g, False
        ng = {
            n: {m for m in s if m not in drop}
            for n, s in g.items()
            if n not in drop
        }
        return ng, True

    # true fixpoint
    g = {n: set(s) for n, s in adj.items()}
    while True:
        g, changed = peel_once(g)
        if not changed:
            break
    # bounded peel with early exit at stable size (the Spark loop)
    h = {n: set(s) for n, s in adj.items()}
    prev = sum(len(s) for s in h.values())
    for _ in range(8):
        h, _ = peel_once(h)
        cur = sum(len(s) for s in h.values())
        if cur == prev:
            break
        prev = cur
    assert {n: len(s) for n, s in h.items()} == {
        n: len(s) for n, s in g.items()
    }
    # idempotence at fixpoint
    g2, changed = peel_once(g)
    assert not changed and g2 == g
