"""Streaming kNN enrichment: attach each incoming embedding's top-k
nearest corpus neighbours inside the stream — the live form of the
reference's per-frame CLIP retrieval (main.py:70-88 scores every frame
against the prompt matrix; here the 'prompt matrix' is a corpus index
and the frames are an unbounded embedding stream).

Shape: the index is a driver-built broadcast (id vector + L2-normalized
matrix); scoring is a STATELESS mapInPandas projection — one BLAS
matmul per Arrow batch, local top-k per row, no state store, no
watermark, no shuffle. Stateless row-local transforms run identically
under Structured Streaming micro-batches and batch (the parity the
tests pin), and restart is trivially exactly-once because nothing is
remembered between batches.

At 100 TB-corpus scale the dense broadcast is the small-index case
(≤ a few GB); past that the same seam takes an IVF index (centroid
matrix + per-cell lists, plans/similarity.py::ivf_knn's layout) —
the stream side does centroid argmax then probes cells, still
stateless. Past even that — a corpus too large to hold ANY per-vector
float state — ``streaming/pq_screen.py`` is the unbounded tier: the
corpus is its 8-byte PQ code rollup and the stream meets it in a
stream-static equi-join (shuffled, never broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose filters)

TOP_K = 3

# Broadcast ceiling for the dense index: past this the collect (and the
# per-executor copy every task closure ships) stops being "the small
# side" and the operator must move to the persisted IVF layout. 512 MB
# ≈ 1M × 64-dim float64 — comfortably under typical 1-4 GB executor
# overhead headroom, and far under Spark's 8 GB hard broadcast limit.
INDEX_BROADCAST_CEILING_BYTES = 512 * 1024 * 1024


def build_index(corpus: DataFrame) -> tuple:
    """Collect (vec_id asc) and L2-normalize the corpus embedding
    matrix. Driver-bounded by design: the dense-broadcast index case,
    guarded by INDEX_BROADCAST_CEILING_BYTES — rather than silently
    OOM-ing the driver or swamping executors on an oversized corpus,
    refuse loudly and point at the persisted IVF path
    (operators/ivf_index.py), whose streaming probe is the same
    stateless seam. The pre-collect estimate is ONE aggregate job
    (count + a sample dimension in the same pass) — one extra scan of
    a derived corpus, cheap next to collecting it, and the only way to
    bound the collect before issuing it. Returns the plain python
    tuple a closure can ship."""
    import numpy as np

    probe = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.first(F.size("embedding")).alias("dim"),
    ).first()
    n = probe["n"]
    if n:
        est = n * probe["dim"] * 8  # float64 matrix, the dominant term
        if est > INDEX_BROADCAST_CEILING_BYTES:
            raise ValueError(
                f"dense kNN index would be ~{est / 1e6:.0f} MB "
                f"({n} vectors x {probe['dim']} dims) — past the "
                f"{INDEX_BROADCAST_CEILING_BYTES / 1e6:.0f} MB broadcast "
                "ceiling. Build a persisted IVF index instead "
                "(operators/ivf_index.py: build_ivf_index + ivf_probe) "
                "and enrich against probed cells."
            )
    rows = corpus.select("vec_id", "embedding").collect()
    if not rows:
        raise ValueError("cannot build a kNN index from an empty corpus")
    rows.sort(key=lambda r: r.vec_id)
    ids = np.asarray([r.vec_id for r in rows], dtype="int64")
    mat = np.asarray([list(r.embedding) for r in rows], dtype="float64")
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    return ids, mat / norms[:, None]


def enrich_topk(stream: DataFrame, index: tuple, k: int = TOP_K) -> DataFrame:
    """(vec_id, neighbor_ids array<long>, neighbor_cosines
    array<double>): cosine top-k against the broadcast index, excluding
    self-matches by vec_id. Works identically on a batch or streaming
    DataFrame — the operator is a stateless per-row projection."""
    import numpy as np
    import pandas as pd

    ids, unit = index
    id_to_row = {int(v): i for i, v in enumerate(ids)}

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.asarray(pdf["embedding"].tolist(), dtype="float64")
            qn = np.linalg.norm(q, axis=1)
            qn[qn == 0.0] = 1.0
            sims = np.round((q / qn[:, None]) @ unit.T, 6)
            qids = pdf["vec_id"].to_numpy()
            # mask self-matches in-place (cosine ∈ [-1, 1], so -2 can
            # never be selected), then take top-m via one vectorized
            # argpartition for the whole batch — no per-row corpus-size
            # allocations or full sorts on the hot path
            for i, qid in enumerate(qids):
                r = id_to_row.get(int(qid))
                if r is not None:
                    sims[i, r] = -2.0
            m = min(len(ids), k + 64)
            part = np.argpartition(-sims, m - 1, axis=1)[:, :m]
            out_ids, out_cos = [], []
            for i in range(len(q)):
                cand_ids = ids[part[i]]
                cand = sims[i][part[i]]
                # exact deterministic order within the m candidates:
                # cosine desc, then vec_id asc
                order = np.lexsort((cand_ids, -cand))[:k]
                kth = cand[order[-1]]
                # ties on the k-th value could extend past the m-slice;
                # fall back to the full sort for such (rare) rows
                if (sims[i] >= kth).sum() > m:
                    full = np.lexsort((ids, -sims[i]))[:k]
                    out_ids.append(ids[full].tolist())
                    out_cos.append(sims[i][full].tolist())
                else:
                    out_ids.append(cand_ids[order].tolist())
                    out_cos.append(cand[order].tolist())
            yield pd.DataFrame(
                {
                    "vec_id": qids,
                    "neighbor_ids": out_ids,
                    "neighbor_cosines": out_cos,
                }
            )

    return stream.select("vec_id", "embedding").mapInPandas(
        score,
        schema="vec_id long, neighbor_ids array<long>, "
        "neighbor_cosines array<double>",
    )
