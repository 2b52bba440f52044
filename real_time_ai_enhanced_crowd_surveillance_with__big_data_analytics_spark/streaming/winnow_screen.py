"""Streaming winnowing near-duplicate screen — ingest-time
exact-substring match evidence against a static corpus fingerprint
index, completing the text-dedup ladder the way ``pq_screen.py``
completes the embedding one: the corpus is represented only by its
winnowed fingerprint rollup (fp_hash, df — a ~2/(W+1) sample of gram
hashes, ≪ corpus), and each arriving document meets it in a
stream-static equi-join that Spark shuffles — never broadcasts — so
corpus size is bounded by the lake, not executor memory.

Semantics match ``plans/dedup.py::_winnow_selected`` exactly (the
guarantee carries over: an arriving doc sharing ANY span of
≥ WINNOW_K+WINNOW_W-1 chars with a corpus doc emits at least one
evidence row). The stream side cannot use the batch Column pipeline —
window functions are not allowed on streaming DataFrames — so
selection runs per-document inside a STATELESS Arrow-batched
``mapInPandas`` via :func:`winnow_positions`, a plain-Python kernel
the tests pin bit-equal to the batch Column version on the same
documents (the ``score_hour`` sharing pattern).

Output is fingerprint-level match EVIDENCE — (doc_id, pos, fp_hash,
corpus_df), one row per selected fingerprint of the arriving doc that
exists in the corpus index — not a per-doc verdict: a per-doc
aggregate would need keyed state and a watermark, while evidence rows
keep the whole screen stateless (append-mode, exactly-once restart for
free) and let downstream policy decide thresholds. At 100 TB the
static side is the index rollup, optionally bucketed by fp_hash for a
shuffle-free static side per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.dedup import (
    HASH_BASE,
    HASH_MOD,
    WINNOW_K,
    WINNOW_W,
    _winnow_selected,
)

_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("pos", T.LongType(), False),
        T.StructField("fp_hash", T.LongType(), False),
    ]
)


def winnow_positions(text: str) -> list[tuple[int, int]]:
    """The batch selection rule in plain Python: K-gram polynomial
    hashes, rightmost-min of every W-window (full windows at gram
    i ≥ W, plus the single partial window for docs shorter than W
    grams). Returns sorted distinct (pos, fp_hash), 1-based positions
    — pinned bit-equal to ``_winnow_selected`` by test_winnow_screen.

    Rolling evaluation: the polynomial hash of each gram is computed
    incrementally (subtract the leading char's base^(K-1) term, shift,
    add), so a document costs O(chars), not O(chars·K)."""
    n = len(text)
    n_grams = n - WINNOW_K + 1
    if n_grams <= 0:
        return []
    lead = pow(HASH_BASE, WINNOW_K - 1, HASH_MOD)
    h = 0
    for ch in text[:WINNOW_K]:
        h = (h * HASH_BASE + ord(ch)) % HASH_MOD
    hashes = [h]
    for i in range(1, n_grams):
        h = (
            (h - ord(text[i - 1]) * lead) * HASH_BASE + ord(text[i + WINNOW_K - 1])
        ) % HASH_MOD
        hashes.append(h)
    selected: set[tuple[int, int]] = set()
    first_end = min(WINNOW_W, n_grams)  # 1-based gram index of first window end
    for end in range(first_end, n_grams + 1):
        lo = max(0, end - WINNOW_W)
        # rightmost min of hashes[lo:end] (0-based slice; gram i = idx+1)
        best_idx, best_h = lo, hashes[lo]
        for j in range(lo + 1, end):
            if hashes[j] <= best_h:
                best_idx, best_h = j, hashes[j]
        selected.add((best_idx + 1, best_h))
    return sorted(selected)


def build_fingerprint_index(docs: DataFrame) -> DataFrame:
    """(fp_hash, df): the corpus-side state of the screen — one
    winnowing pass (the batch Column pipeline) + a hash-keyed distinct
    doc count. Persist this (parquet, optionally bucketed by fp_hash)
    and hand the read-back table to :func:`streaming_winnow_screen`."""
    return (
        _winnow_selected(docs.select("doc_id", "text"))
        .select("doc_id", "fp_hash")
        .distinct()
        .groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def _fp_rows(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    for pdf in batches:
        out_doc, out_pos, out_h = [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            for pos, h in winnow_positions(str(text)):
                out_doc.append(int(doc_id))
                out_pos.append(pos)
                out_h.append(h)
        yield pd.DataFrame(
            {"doc_id": out_doc, "pos": out_pos, "fp_hash": out_h}
        )


def streaming_winnow_screen(
    docs_stream: DataFrame, fp_index: DataFrame
) -> DataFrame:
    """(doc_id, pos, fp_hash, corpus_df) per arriving document
    fingerprint found in the corpus index: stateless per-doc winnowing
    (Arrow-batched), then the stream-static inner join. Append-mode;
    no watermark needed (nothing is stateful)."""
    fps = docs_stream.select("doc_id", "text").mapInPandas(
        _fp_rows, schema=_FP_SCHEMA
    )
    return fps.join(
        fp_index.select("fp_hash", F.col("df").alias("corpus_df")),
        "fp_hash",
    ).select("doc_id", "pos", "fp_hash", "corpus_df")
