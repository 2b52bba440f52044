"""Hot-band-key guardrails in embedding_neardup_lsh (VERDICT r9 #8):
the in-bucket verify drops buckets above LSH_BUCKET_CAP and tiles the
cosine matmul so task memory stays bounded. The tiling must be
pair-for-pair identical to the untiled matrix, the cap must be inert
at tested SFs, and a synthetic hot bucket must be dropped."""

from __future__ import annotations

import numpy as np

import real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.similarity as sim
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.similarity import (
    LSH_BUCKET_CAP,
    LSH_TILE_BYTES,
    NEARDUP_THRESHOLD,
    _sign_bands,
    embedding_neardup_lsh,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def _run_kernel_on(spark, banded):
    """Run the query with its banding stage replaced by a synthetic
    banded frame — exercises exactly the grouped verify kernel and the
    canonical per-pair reduction the plan ships."""
    orig_bands, orig_load = sim._sign_bands, sim.load_table
    try:
        sim._sign_bands = lambda emb, carry_embedding=False: banded
        sim.load_table = lambda s, t, sf: banded.limit(0)
        return embedding_neardup_lsh(spark, "unused").collect()
    finally:
        sim._sign_bands = orig_bands
        sim.load_table = orig_load


def test_tiling_matches_untiled(spark):
    """A bucket big enough that the kernel runs >1 tile must emit
    exactly the pairs of the one-shot m x m matrix."""
    dim = 512
    # tile = LSH_TILE_BYTES // (8 * nm) < nm  <=>  nm > sqrt(bytes/8)
    nm = int((LSH_TILE_BYTES / 8) ** 0.5) + 200
    rng = np.random.RandomState(11)
    vecs = rng.randn(nm, dim)
    # planted near-dups, including one pair straddling a tile boundary
    vecs[1] = vecs[0] * 2.0
    vecs[nm - 1] = vecs[2] + 0.001 * rng.randn(dim)
    rows = [
        (int(i), 0, 1, [float(x) for x in vecs[i]]) for i in range(nm)
    ]
    banded = spark.createDataFrame(
        rows, "vec_id long, band int, band_key long, embedding array<double>"
    )
    got = {(r["ia"], r["ib"], r["cosine"]) for r in _run_kernel_on(spark, banded)}
    nrm = np.linalg.norm(vecs, axis=1)
    sims = np.round((vecs @ vecs.T) / np.outer(nrm, nrm), 6)
    iu = np.triu_indices(nm, k=1)
    mask = sims[iu] >= NEARDUP_THRESHOLD
    want = {
        (int(a), int(b), float(s))
        for a, b, s in zip(iu[0][mask], iu[1][mask], sims[iu][mask])
    }
    assert (0, 1, 1.0) in want and want == got


def test_hot_bucket_dropped(spark):
    """A bucket past LSH_BUCKET_CAP contributes nothing, even when it
    contains a perfect duplicate pair."""
    hot_n = LSH_BUCKET_CAP + 1
    unit = [1.0] + [0.0] * 7
    zero = [0.0] * 8
    rows = [(1000, 7, 3, unit), (1001, 7, 3, unit)]
    rows += [(int(2000 + i), 7, 3, zero) for i in range(hot_n - 2)]
    # plus a tiny normal bucket proving the pipeline still emits pairs
    rows += [(1, 0, 1, unit), (2, 0, 1, unit)]
    banded = spark.createDataFrame(
        rows, "vec_id long, band int, band_key long, embedding array<double>"
    )
    got = {(r["ia"], r["ib"], r["cosine"]) for r in _run_kernel_on(spark, banded)}
    assert got == {(1, 2, 1.0)}


def test_cap_inert_at_smoke_sf(spark, sf_dir):
    """At tested SFs every bucket is far below the cap, so the cap
    cannot change the declared answer."""
    emb = load_table(spark, "embeddings", sf_dir)
    biggest = (
        _sign_bands(emb)
        .groupBy("band", "band_key")
        .count()
        .agg({"count": "max"})
        .collect()[0][0]
    )
    assert biggest < LSH_BUCKET_CAP / 10
    assert embedding_neardup_lsh(spark, sf_dir).count() > 0
