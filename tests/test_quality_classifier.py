"""Trained quality filter (operators/quality_classifier.py): the model
must actually learn the heuristic labels (AUC/accuracy floors on the
held-out split), refit identically (no hidden RNG), and score the
corpus without a shuffle (broadcast-coefficient map pass)."""

from __future__ import annotations

import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.quality_classifier import (
    HAS_MLLIB,
    fit_quality_classifier,
    score_documents,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)

pytestmark = pytest.mark.skipif(not HAS_MLLIB, reason="pyspark.ml missing")


@pytest.fixture(scope="module")
def fitted(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return fit_quality_classifier(docs), docs


def test_learns_heldout(fitted):
    clf, _ = fitted
    # weak labels are a deterministic function of token statistics the
    # hashed-tf features encode, so a linear model must separate them
    assert clf.test_rows > 0 and clf.train_rows > 0
    assert clf.test_auc >= 0.80, clf.test_auc
    assert clf.test_accuracy >= 0.75, clf.test_accuracy


def test_refit_is_deterministic(fitted, spark, sf_dir):
    clf, docs = fitted
    again = fit_quality_classifier(docs)
    assert again.test_auc == clf.test_auc
    assert again.test_accuracy == clf.test_accuracy
    a = {r["doc_id"]: r["p_keep"] for r in score_documents(clf, docs).collect()}
    b = {r["doc_id"]: r["p_keep"] for r in score_documents(again, docs).collect()}
    assert a == b


def test_scoring_is_map_only(fitted):
    clf, docs = fitted
    plan = (
        score_documents(clf, docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_empty_heldout_raises_cleanly(spark):
    # doc_ids 1..6 all hash below TRAIN_FRACTION, so nothing is held
    # out — the fit must fail loudly, not crash on a None metric
    docs = spark.createDataFrame(
        [(i, "some words here " * 30) for i in range(1, 7)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="held-out split is empty"):
        fit_quality_classifier(docs)


def test_scores_cover_corpus_and_agree_with_prediction(fitted):
    clf, docs = fitted
    rows = score_documents(clf, docs).collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0.0 <= r["p_keep"] <= 1.0
        assert r["keep"] == (r["p_keep"] >= 0.5) or abs(r["p_keep"] - 0.5) < 1e-6
