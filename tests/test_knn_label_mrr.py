"""knn_label_mrr: independent numpy full-sort reference — rank every
corpus vector per query by (rounded cosine desc, vec_id asc), find the
first same-label position, and compare rank + fixed-point reciprocal
rank against the sort-free aggregate plan.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.similarity import (
    KNN_BATCH_QUERIES,
    knn_label_mrr,
)

SF = "/root/testdata/sf0.001"


def test_mrr_matches_full_sort_reference(spark, sf_dir):
    con = duckdb.connect()
    base = con.sql(
        f"SELECT vec_id, label, embedding FROM read_parquet('{SF}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    qs = [(v, l, np.asarray(e, dtype="float64"))
          for v, l, e in base if v < KNN_BATCH_QUERIES]
    corpus = [(v, l, np.asarray(e, dtype="float64"))
              for v, l, e in base if v >= KNN_BATCH_QUERIES]
    cids = np.asarray([v for v, _, _ in corpus])
    clabels = np.asarray([l for _, l, _ in corpus])
    cmat = np.asarray([e for _, _, e in corpus])
    cnorm = np.linalg.norm(cmat, axis=1)

    rows = {r["qid"]: r for r in knn_label_mrr(spark, SF).collect()}
    assert set(rows) == {v for v, _, _ in qs}
    for qid, qlabel, qvec in qs:
        cos = np.round(cmat @ qvec / (cnorm * np.linalg.norm(qvec)), 6)
        order = np.lexsort((cids, -cos))
        match = np.nonzero(clabels[order] == qlabel)[0]
        r = rows[qid]
        assert r["qlabel"] == qlabel
        if len(match) == 0:
            assert r["first_rank"] is None and r["rr_e9"] is None
            continue
        rank = int(match[0]) + 1
        assert r["first_rank"] == rank
        assert r["best_vec_id"] == cids[order][match[0]]
        assert r["rr_e9"] == 1_000_000_000 // rank
