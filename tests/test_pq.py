"""Product quantization: full parity of the Spark PQ build against a
plain-numpy reference of the integer-exact spec (shifted milli-unit
quantization, vec_id % K seeding, one integer-mean k-means round,
nearest-code assignment with ties to the smaller index), plus
structural checks on the ADC search. Oracle parity at sf0.01 is the
driver/check_oracle gate; this pins the arithmetic itself.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.pq import (
    PQ_K,
    PQ_M,
    PQ_MILLS,
    PQ_QUERIES,
    PQ_SHIFT,
    PQ_SUBDIM,
    PQ_TOPK,
    pq_adc_knn,
    pq_encode,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def _load_quantized(spark, sf_dir):
    rows = load_table(spark, "embeddings", sf_dir).collect()
    rows.sort(key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    x = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    xq = np.floor(x * PQ_MILLS + 0.5).astype(np.int64) + PQ_SHIFT
    return ids, xq.reshape(len(ids), PQ_M, PQ_SUBDIM)


def _int_mean(vals):
    # integer mean via floor division — all values non-negative
    return np.sum(vals, axis=0, dtype=np.int64) // len(vals)


def _codebook(ids, xq):
    cb = {}
    for m in range(PQ_M):
        c0 = {
            j: _int_mean(xq[ids % PQ_K == j, m])
            for j in range(PQ_K)
            if np.any(ids % PQ_K == j)
        }
        # one refinement round: assign to nearest init, re-mean
        assign = {}
        for i in range(len(ids)):
            best = min(
                (int(np.sum((xq[i, m] - c) ** 2)), j)
                for j, c in c0.items()
            )
            assign.setdefault(best[1], []).append(i)
        cb[m] = {
            j: _int_mean(xq[rows_, m]) for j, rows_ in assign.items()
        }
    return cb


def _encode(ids, xq, cb):
    words, errs = {}, {}
    for i, vid in enumerate(ids):
        word = 0
        err = 0
        for m in range(PQ_M):
            d, j = min(
                (int(np.sum((xq[i, m] - c) ** 2)), j)
                for j, c in cb[m].items()
            )
            word += j << (4 * m)
            err += d
        words[int(vid)] = word
        errs[int(vid)] = err
    return words, errs


def test_pq_encode_matches_numpy_reference(spark, sf_dir):
    ids, xq = _load_quantized(spark, sf_dir)
    cb = _codebook(ids, xq)
    want_words, want_errs = _encode(ids, xq, cb)

    got = pq_encode(spark, sf_dir).collect()
    assert len(got) == len(ids)
    for r in got:
        assert r["pq_word"] == want_words[r["vec_id"]], r["vec_id"]
        assert r["recon_err"] == want_errs[r["vec_id"]], r["vec_id"]


def test_pq_adc_knn_matches_numpy_reference(spark, sf_dir):
    ids, xq = _load_quantized(spark, sf_dir)
    cb = _codebook(ids, xq)
    words, _ = _encode(ids, xq, cb)
    codes = {
        vid: [(w >> (4 * m)) & 0xF for m in range(PQ_M)]
        for vid, w in words.items()
    }

    got = pq_adc_knn(spark, sf_dir).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(r)

    assert set(by_query) == set(range(PQ_QUERIES))
    for qid, rows in by_query.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(
            range(1, PQ_TOPK + 1)
        )
        # reference ADC: distance table against the query subvectors
        qi = int(np.nonzero(ids == qid)[0][0])
        dt = {
            (m, j): int(np.sum((xq[qi, m] - c) ** 2))
            for m in range(PQ_M)
            for j, c in cb[m].items()
        }
        scored = sorted(
            (
                sum(dt[(m, codes[int(v)][m])] for m in range(PQ_M)),
                int(v),
            )
            for v in ids
            if int(v) != qid
        )
        want = scored[:PQ_TOPK]
        assert [
            (r["adc_dist"], r["neighbor_id"]) for r in rows
        ] == want, qid


def test_pq_compression_is_sane(spark, sf_dir):
    """The code word actually uses its nibbles and reconstruction error
    is far below the trivial all-one-code quantizer's (PQ must beat a
    single global centroid per subspace to be worth its codebook)."""
    rows = pq_encode(spark, sf_dir).collect()
    words = {r["vec_id"]: r["pq_word"] for r in rows}
    assert 0 <= min(words.values()) and max(words.values()) < 16**PQ_M
    assert len(set(words.values())) > 1

    ids, xq = _load_quantized(spark, sf_dir)
    flat = xq.reshape(len(ids), PQ_M, PQ_SUBDIM)
    global_cent = np.stack(
        [_int_mean(flat[:, m]) for m in range(PQ_M)]
    )
    trivial = int(
        sum(
            np.sum((flat[i, m] - global_cent[m]) ** 2)
            for i in range(len(ids))
            for m in range(PQ_M)
        )
    )
    total = sum(r["recon_err"] for r in rows)
    assert total < trivial * 0.8


def test_pq_incremental_encode_frozen_codebook(spark, sf_dir):
    """Increment rows are encoded against the BASE-trained codebook:
    parity with the numpy reference restricted to base-row training,
    and the word-collision counts match a direct recount."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.pq import (
        PQ_INC_MOD,
        pq_incremental_encode,
    )

    ids, xq = _load_quantized(spark, sf_dir)
    base = ids % PQ_INC_MOD != 0
    cb = _codebook(ids[base], xq[base])
    want_words, want_errs = _encode(ids, xq, cb)
    base_word_counts = Counter(
        want_words[int(v)] for v in ids[base]
    )

    got = pq_incremental_encode(spark, sf_dir).collect()
    assert {r["vec_id"] for r in got} == {
        int(v) for v in ids if v % PQ_INC_MOD == 0
    }
    for r in got:
        assert r["pq_word"] == want_words[r["vec_id"]]
        assert r["recon_err"] == want_errs[r["vec_id"]]
        assert r["n_base_same_word"] == base_word_counts.get(
            r["pq_word"], 0
        )
