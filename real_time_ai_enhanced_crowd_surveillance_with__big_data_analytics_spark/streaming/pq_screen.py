"""Streaming PQ near-duplicate screen — the UNBOUNDED-corpus tier of
streaming embedding enrichment, completing the ladder in
``enrich_knn.py``: dense broadcast (≤ the 512 MB ceiling) → persisted
IVF (probed cells) → THIS (no vector state at all: the corpus is
represented by its 8-byte PQ code words, and the stream meets it in a
stream-static equi-join on the code column, which Spark shuffles —
never broadcasts — so corpus size is bounded by the lake, not by
executor memory).

Semantics match ``plans/pq.py::pq_incremental_encode`` exactly (the
batch twin the tests pin): each arriving vector is encoded against the
FROZEN base-trained codebook (~1 KB, the only broadcast anywhere) and
reports its code word, its reconstruction error (drift over batches =
the retrain signal), and how many base vectors share the exact word —
the constant-cost near-duplicate screen that justifies keeping only
codes. Encoding is a STATELESS Arrow-batched projection, so
stream ≡ batch holds trivially and restart is exactly-once with no
state store.

At 100 TB: the static side is the (pq_code, count) rollup — bounded by
DISTINCT code words, ≪ corpus — optionally bucketed by pq_code so the
per-micro-batch join is shuffle-free on the static side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.pq import _encode_df


def build_code_stats(base_emb: DataFrame, cb) -> DataFrame:
    """(pq_code, n_base_same_word): the corpus-side state of the
    screen — one broadcast-codebook encode pass + a word rollup.
    Persist this (parquet, optionally bucketed by pq_code) and hand
    the read-back table to :func:`streaming_pq_screen`."""
    return (
        _encode_df(base_emb, cb)
        .groupBy("pq_code")
        .agg(F.count(F.lit(1)).alias("n_base_same_word"))
    )


def streaming_pq_screen(
    stream: DataFrame, cb, code_stats: DataFrame
) -> DataFrame:
    """(vec_id, pq_code, recon_err, n_base_same_word) per arriving
    vector: stateless encode against the frozen codebook, then the
    stream-static left join against the code rollup. Append-mode; no
    watermark needed (nothing is stateful)."""
    encoded = _encode_df(stream, cb)
    return encoded.join(code_stats, "pq_code", "left").select(
        "vec_id",
        "pq_code",
        "recon_err",
        F.coalesce("n_base_same_word", F.lit(0)).alias(
            "n_base_same_word"
        ),
    )
