"""Streaming kNN enrichment (streaming/enrich_knn.py): the streamed
result over chunked micro-batches must equal the batch projection and
a numpy reference; self-matches excluded; restart-safe because the
operator is stateless."""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming.enrich_knn import (
    build_index,
    enrich_topk,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    return emb, build_index(emb)


def _as_map(rows):
    return {
        r["vec_id"]: (list(r["neighbor_ids"]), list(r["neighbor_cosines"]))
        for r in rows
    }


def test_batch_matches_numpy_reference(corpus):
    emb, index = corpus
    got = _as_map(enrich_topk(emb, index).collect())
    ids, unit = index
    sims = np.round(unit @ unit.T, 6)
    for i, qid in enumerate(ids):
        mask = ids != qid
        cand_ids, cand = ids[mask], sims[i][mask]
        top = np.lexsort((cand_ids, -cand))[:3]
        assert got[qid][0] == cand_ids[top].tolist()
        assert got[qid][1] == pytest.approx(cand[top].tolist())
        assert qid not in got[qid][0]


def test_stream_equals_batch(spark, tmp_path, corpus):
    emb, index = corpus
    src = str(tmp_path / "src")
    # several part files → maxFilesPerTrigger=1 forces multi-batch
    emb.select("vec_id", "embedding").repartition(4).write.parquet(src)
    for junk in glob.glob(f"{src}/_*"):
        (shutil.rmtree if os.path.isdir(junk) else os.remove)(junk)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        enrich_topk(stream, index)
        .writeStream.format("memory")
        .queryName("knn_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = _as_map(spark.sql("SELECT * FROM knn_stream").collect())
    batch = _as_map(enrich_topk(emb, index).collect())
    assert streamed == batch


def test_build_index_refuses_oversized_corpus(spark, sf_dir, monkeypatch):
    """Past the broadcast ceiling the dense index must fail loudly and
    point at the persisted IVF path, not OOM the driver."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.streaming import (
        enrich_knn,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    monkeypatch.setattr(enrich_knn, "INDEX_BROADCAST_CEILING_BYTES", 1024)
    with pytest.raises(ValueError, match="IVF"):
        enrich_knn.build_index(emb)
