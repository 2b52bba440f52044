"""Randomized (seeded) equivalence nets for the r9 lossless twins:
the prefix-filtered containment join and the spectrally-blocked
embedding near-dup must equal their exact anchors on corpora built to
stress exactly the seams where the filters could drop a true pair —
boilerplate shingles with corpus-wide df (containment's hot case),
short-doc-inside-long-doc pairs, EQUAL-size docs (the smaller-side
designation tie-break), duplicate and near-threshold-cosine vectors,
vec_id gaps straddling tile boundaries.

Deterministic LCG corpora (no hypothesis: Spark's per-example cost
makes shrinking pathological); seeds vary the mix. Equality is
full-row, sorted."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.dedup import (
    dedup_containment,
    dedup_containment_prefix,
    dedup_jaccard_prefix,
    dedup_ngram_jaccard,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.similarity import (
    NEARDUP_TILE_ROWS,
    embedding_neardup_blocked,
    embedding_neardup_exact,
)


def _lcg(seed: int):
    s = seed & 0x7FFFFFFF

    def nxt(mod: int) -> int:
        nonlocal s
        s = (1103515245 * s + 12345) % 2**31
        return s % mod

    return nxt


_WORDS = [f"w{i}" for i in range(40)]
_BOILER = "terms of service apply all rights reserved contact us today"


def _write_documents(path: str, seed: int, n: int) -> None:
    """Adversarial documents: every doc carries the same boilerplate
    sentence (hot shingles, df ≈ corpus — the quadratic case the
    prefix twin exists to collapse), some docs are strict substrings
    of longer ones (containment ≈ 1 with very different sizes), and
    doc-size ties are planted (equal token counts, the smaller-side
    designation tie-break seam)."""
    rng = _lcg(seed)
    rows = []
    bodies = []
    for i in range(n):
        k = 6 + rng(18)
        body = " ".join(_WORDS[rng(len(_WORDS))] for _ in range(k))
        bodies.append(body)
        rows.append((i, f"{_BOILER} {body}"))
    # strict containment: short doc = prefix slice of a longer body
    for j in range(n, n + max(2, n // 5)):
        src = bodies[rng(len(bodies))]
        cut = src.split(" ")
        short = " ".join(cut[: max(4, len(cut) // 2)])
        rows.append((j, f"{_BOILER} {short}"))
    # exact-size tie pair sharing most tokens
    tie_body = " ".join(_WORDS[:12])
    rows.append((n * 10 + 1, f"{_BOILER} {tie_body} w0"))
    rows.append((n * 10 + 2, f"{_BOILER} {tie_body} w1"))
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["synthetic"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, path)


def _write_embeddings(path: str, seed: int, n: int, dim: int = 16) -> None:
    """Adversarial embeddings: exact duplicates (cosine 1.0), scaled
    copies (cosine 1.0 at different norms), pairs engineered NEAR the
    0.4 threshold from both sides, orthogonal/antipodal vectors, and
    vec_ids spread across a tile boundary (ids straddle
    NEARDUP_TILE_ROWS so the blocked twin's per-tile loop is
    multi-tile even at test size)."""
    rng = _lcg(seed)
    rows = []
    base = []
    for i in range(n):
        v = [(rng(2001) - 1000) / 1000.0 for _ in range(dim)]
        if all(abs(x) < 1e-9 for x in v):
            v[0] = 1.0
        base.append(v)
        rows.append((i, v, rng(10)))
    # duplicates + scaled copies at ids past the tile boundary
    off = NEARDUP_TILE_ROWS + 7
    for j in range(max(3, n // 10)):
        src = base[rng(len(base))]
        rows.append((off + 2 * j, list(src), rng(10)))
        rows.append((off + 2 * j + 1, [2.5 * x for x in src], rng(10)))
    # near-threshold pair: u and (cosθ·u + sinθ·u⊥) with cosθ ≈ 0.4
    u = [1.0] + [0.0] * (dim - 1)
    u_perp = [0.0, 1.0] + [0.0] * (dim - 2)
    for k, c in enumerate((0.399, 0.4, 0.401, 0.3999995)):
        s = (1 - c * c) ** 0.5
        v = [c * a + s * b for a, b in zip(u, u_perp)]
        rows.append((2 * off + 2 * k, u, 1))
        rows.append((2 * off + 2 * k + 1, v, 2))
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize("seed", [13, 29, 61])
def test_containment_prefix_equals_anchor_on_random_corpus(
    spark, tmp_path, seed
):
    _write_documents(str(tmp_path / "documents.parquet"), seed, 60)
    sf = str(tmp_path)
    twin = sorted(
        tuple(r) for r in dedup_containment_prefix(spark, sf).collect()
    )
    anchor = sorted(tuple(r) for r in dedup_containment(spark, sf).collect())
    assert twin == anchor
    assert anchor  # the planted containment pairs must surface


@pytest.mark.parametrize("seed", [13, 29, 61])
def test_jaccard_prefix_equals_anchor_on_random_corpus(
    spark, tmp_path, seed
):
    """The r8 Jaccard prefix twin shares these seams (hot boilerplate
    df, size ties) — same net, symmetric-threshold flavor."""
    _write_documents(str(tmp_path / "documents.parquet"), seed, 60)
    sf = str(tmp_path)
    twin = sorted(
        tuple(r) for r in dedup_jaccard_prefix(spark, sf).collect()
    )
    anchor = sorted(
        tuple(r) for r in dedup_ngram_jaccard(spark, sf).collect()
    )
    assert twin == anchor
    assert anchor


@pytest.mark.parametrize("seed", [13, 29, 61])
def test_neardup_blocked_equals_anchor_on_random_corpus(
    spark, tmp_path, seed
):
    _write_embeddings(str(tmp_path / "embeddings.parquet"), seed, 50)
    sf = str(tmp_path)
    twin = sorted(
        tuple(r) for r in embedding_neardup_blocked(spark, sf).collect()
    )
    anchor = sorted(
        tuple(r) for r in embedding_neardup_exact(spark, sf).collect()
    )
    assert twin == anchor
    # duplicates guarantee hits; the threshold probes guarantee pairs
    # on BOTH sides of the cut exist in the corpus
    assert any(r[2] >= 0.999999 for r in anchor)
