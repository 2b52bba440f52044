"""Conformal threshold + fairness gaps vs direct Python references on
the same pinned integer specs. Oracle parity at sf0.01 is the
driver/check_oracle gate; these guard the semantics (conformal
coverage rank rule, signed already-floored gap arithmetic).
"""

from __future__ import annotations

import math

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.ml_eval import (
    CONFORMAL_ALPHA_E3,
    FAIRNESS_THRESHOLD_FP,
    N_CLASSES,
    SCORE_SCALE,
    conformal_threshold,
    fairness_gaps,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def _fp(x):
    return int(math.floor(float(x) * SCORE_SCALE))


def test_conformal_matches_rank_rule(spark, sf_dir):
    rows = load_table(spark, "embeddings", sf_dir).select(
        "label", "embedding"
    ).collect()
    got = {r["cls"]: r for r in conformal_threshold(spark, sf_dir).collect()}
    assert len(got) == N_CLASSES
    for cls in range(N_CLASSES):
        pos = sorted(
            (_fp(r.embedding[cls]) for r in rows if r.label == cls),
            reverse=True,
        )
        n_pos = len(pos)
        need = -(-((n_pos + 1) * (1000 - CONFORMAL_ALPHA_E3)) // 1000)
        g = got[cls]
        assert g["n_pos"] == n_pos and g["need"] == need
        # threshold = score of the need-th positive from the top
        # (grid max with cum_pos >= need); coverage counts boundary ties
        thr = pos[need - 1]
        assert g["threshold_fp"] == thr
        covered = sum(1 for p in pos if p >= thr)
        assert g["covered_pos"] == covered >= need
        admitted = sum(
            1
            for r in rows
            if r.label != cls and _fp(r.embedding[cls]) >= thr
        )
        assert g["admitted_neg"] == admitted
        assert g["coverage_e6"] == (1_000_000 * covered) // n_pos


def test_fairness_matches_reference(spark, sf_dir):
    rows = load_table(spark, "embeddings", sf_dir).select(
        "label", "embedding"
    ).collect()
    sel = [(r.label, _fp(r.embedding[0]) >= FAIRNESS_THRESHOLD_FP) for r in rows]
    n_all = len(sel)
    sel_all = sum(1 for _, s in sel if s)
    pos_all = sum(1 for g, _ in sel if g == 0)
    tp_all = sum(1 for g, s in sel if g == 0 and s)
    fp_all = sum(1 for g, s in sel if g != 0 and s)
    ref_sel = (1_000_000 * sel_all) // n_all
    ref_tpr = (1_000_000 * tp_all) // pos_all
    ref_fpr = (1_000_000 * fp_all) // (n_all - pos_all)
    got = {r["grp"]: r for r in fairness_gaps(spark, sf_dir).collect()}
    for grp in sorted({g for g, _ in sel}):
        n = sum(1 for g, _ in sel if g == grp)
        n_sel = sum(1 for g, s in sel if g == grp and s)
        n_pos = sum(1 for g, _ in sel if g == grp and grp == 0)
        tp = sum(1 for g, s in sel if g == grp and grp == 0 and s)
        n_neg = n - n_pos
        fp = n_sel - tp
        r = got[grp]
        assert r["n"] == n
        assert r["sel_rate_e6"] == (1_000_000 * n_sel) // n
        assert r["dp_gap_e6"] == (1_000_000 * n_sel) // n - ref_sel
        if n_pos:
            assert r["tpr_e6"] == (1_000_000 * tp) // n_pos
            assert r["tpr_gap_e6"] == (1_000_000 * tp) // n_pos - ref_tpr
        else:
            assert r["tpr_e6"] is None and r["tpr_gap_e6"] is None
        if n_neg:
            assert r["fpr_e6"] == (1_000_000 * fp) // n_neg
            assert r["fpr_gap_e6"] == (1_000_000 * fp) // n_neg - ref_fpr
        else:
            assert r["fpr_e6"] is None and r["fpr_gap_e6"] is None
    # the audit is non-vacuous: group 0 (the positive class) must
    # select at a different rate than the corpus
    assert any(r["dp_gap_e6"] != 0 for r in got.values())
