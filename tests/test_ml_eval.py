"""ML evaluation primitives (plans/ml_eval.py): rank AUC, KS
separation, histogram split finding, out-of-fold target encoding.

Each query is independently recomputed here with plain Python over the
collected base tables — a second implementation, not a second run of
the same expressions — so the oracle SQL and the Spark plan can't share
a bug silently."""

from __future__ import annotations

import duckdb
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.ml_eval import (
    N_CLASSES,
    N_FOLDS,
    PRIOR_W,
    SCORE_SCALE,
    USER_MOD,
    VALUE_BIN_MAX,
    VALUE_BIN_W,
    auc_evaluation,
    ks_score_separation,
    target_encode_oof,
    tree_split_finder,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _auc_direct(pairs: list[tuple[int, int]]) -> tuple[int, int, int]:
    """(n_pos, n_neg, u2) from (score_fp, is_pos) pairs, O(n^2) honest."""
    pos = [s for s, p in pairs if p]
    neg = [s for s, p in pairs if not p]
    u2 = 0
    for sp in pos:
        for sn in neg:
            if sp > sn:
                u2 += 2
            elif sp == sn:
                u2 += 1
    return len(pos), len(neg), u2


def test_auc_matches_quadratic_reference(spark, duck):
    rows = {r["cls"]: r for r in auc_evaluation(spark, SF).collect()}
    assert set(rows) == set(range(N_CLASSES))
    base = duck.sql(
        "SELECT label, embedding FROM embeddings"
    ).fetchall()
    for cls in (0, 3, 9):  # three classes exercise the formula fully
        import math

        pairs = [
            (math.floor(float(emb[cls]) * SCORE_SCALE), label == cls)
            for label, emb in base
        ]
        n_pos, n_neg, u2 = _auc_direct(pairs)
        r = rows[cls]
        assert (r["n_pos"], r["n_neg"], r["u2"]) == (n_pos, n_neg, u2)
        assert r["auc_e6"] == (1_000_000 * u2) // (2 * n_pos * n_neg)
        assert 0 <= r["auc_e6"] <= 1_000_000


def test_ks_matches_direct_cdf_walk(spark, duck):
    rows = {r["event_type"]: r for r in ks_score_separation(spark, SF).collect()}
    base = duck.sql(
        "SELECT event_type, CAST(round(value * 100) AS BIGINT) FROM events"
    ).fetchall()
    grid = sorted({c for _, c in base})
    for etype in rows:
        this = sorted(c for t, c in base if t == etype)
        rest = sorted(c for t, c in base if t != etype)
        best, at = -1, None
        ti = ri = 0
        for g in grid:
            while ti < len(this) and this[ti] <= g:
                ti += 1
            while ri < len(rest) and rest[ri] <= g:
                ri += 1
            dev = abs(ti * len(rest) - ri * len(this))
            if dev > best:
                best, at = dev, g
        r = rows[etype]
        assert (r["n_this"], r["n_rest"]) == (len(this), len(rest))
        assert r["ks_num"] == best
        assert r["at_cents"] == at
        assert 0 <= r["ks_e6"] <= 1_000_000


def test_tree_split_matches_enumeration(spark, duck):
    rows = {r["feature"]: r for r in tree_split_finder(spark, SF).collect()}
    assert set(rows) == {"value_bin", "hour", "user_mod"}
    base = duck.sql(
        "SELECT CAST(least(?, floor(value / ?)) AS BIGINT), "
        "       CAST(extract(hour FROM ts) AS BIGINT), user_id % ?, "
        "       event_type = 'error' FROM events",
        params=[VALUE_BIN_MAX, VALUE_BIN_W, USER_MOD],
    ).fetchall()
    for fi, feat in ((0, "value_bin"), (1, "hour"), (2, "user_mod")):
        hist: dict[int, list[int]] = {}
        for row in base:
            b, pos = row[fi], row[3]
            hist.setdefault(b, [0, 0])
            hist[b][0] += 1
            hist[b][1] += int(pos)
        bins = sorted(hist)
        n_tot = sum(v[0] for v in hist.values())
        p_tot = sum(v[1] for v in hist.values())
        best = None
        nl = pl = 0
        for b in bins:
            nl += hist[b][0]
            pl += hist[b][1]
            nr, pr = n_tot - nl, p_tot - pl
            if nr == 0:
                continue
            score = (2 * pl * (nl - pl) * 1_000_000) // nl + (
                2 * pr * (nr - pr) * 1_000_000
            ) // nr
            if best is None or score < best[0]:
                best = (score, b, nl, pl, nr, pr)
        r = rows[feat]
        assert (
            r["gini_e6"],
            r["split_bin"],
            r["n_left"],
            r["pos_left"],
            r["n_right"],
            r["pos_right"],
        ) == best


def test_target_encode_out_of_fold_excludes_own_fold(spark, duck):
    rows = target_encode_oof(spark, SF).collect()
    base = duck.sql(
        f"SELECT event_type, user_id % {N_FOLDS}, "
        f"CAST(round(value * 100) AS BIGINT) FROM events"
    ).fetchall()
    total = sum(c for _, _, c in base)
    prior = total // len(base)
    for r in rows:
        other = [
            c
            for t, f, c in base
            if t == r["event_type"] and f != r["fold"]
        ]
        assert r["n_other"] == len(other)
        assert r["prior_cents"] == prior
        assert r["enc_e6"] == (
            1_000_000 * (sum(other) + PRIOR_W * prior)
        ) // (len(other) + PRIOR_W)
    # every (type, fold) cell present
    assert len(rows) == len({(t, f) for t, f, _ in base})


def test_average_precision_matches_threshold_sweep(spark, duck):
    """Second implementation: per class, walk distinct score cells in
    descending order accumulating (cum_pos, cum_tot) and apply the
    pinned integer term formula; also bound the fixed-point result
    against the float threshold-sweep AP (sklearn semantics) to prove
    the spec tracks the real quantity, not just itself."""
    import math
    from collections import Counter

    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.ml_eval import (
        average_precision,
    )

    rows = {r["cls"]: r for r in average_precision(spark, SF).collect()}
    assert set(rows) == set(range(N_CLASSES))
    base = duck.sql("SELECT label, embedding FROM embeddings").fetchall()
    for cls in (0, 4, 9):
        cells_pos: Counter = Counter()
        cells_tot: Counter = Counter()
        for label, emb in base:
            s_fp = math.floor(float(emb[cls]) * SCORE_SCALE)
            cells_tot[s_fp] += 1
            if label == cls:
                cells_pos[s_fp] += 1
        cum_pos = cum_tot = term_sum = 0
        ap_float = 0.0
        n_pos = sum(cells_pos.values())
        for s in sorted(cells_tot, reverse=True):
            cum_pos += cells_pos[s]
            cum_tot += cells_tot[s]
            term_sum += (1_000_000_000 * cells_pos[s] * cum_pos) // cum_tot
            ap_float += (cells_pos[s] / n_pos) * (cum_pos / cum_tot)
        r = rows[cls]
        assert r["n_pos"] == n_pos
        assert r["ap_e6"] == term_sum // (1000 * n_pos)
        # fixed-point floors lose < 1e-3 at this scale vs the float sweep
        assert abs(r["ap_e6"] / 1e6 - ap_float) < 1e-3
        assert 0 <= r["ap_e6"] <= 1_000_000
