"""RAG chunking properties: full token coverage, exact overlap, and
reconstruction against per-doc Python slicing. Oracle parity at
sf0.01 is the driver/check_oracle gate."""

from __future__ import annotations

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.training_data import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    document_chunks,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def test_chunks_match_python_slicing(spark, sf_dir):
    docs = {
        r.doc_id: r.text.strip().split(" ")
        for r in load_table(spark, "documents", sf_dir)
        .select("doc_id", "text")
        .collect()
    }
    got = {}
    for r in document_chunks(spark, sf_dir).collect():
        got[(r.doc_id, r.chunk_id)] = (
            r.start_tok,
            r.n_tok,
            r.chunk_text,
            r.n_chars,
        )
    w, s = CHUNK_TOKENS, CHUNK_STRIDE
    n_rows = 0
    for doc_id, toks in docs.items():
        n = len(toks)
        n_chunks = 1 if n <= w else 1 + -(-(n - w) // s)
        covered = set()
        for c in range(n_chunks):
            start = c * s
            body = toks[start : start + w]
            text = " ".join(body)
            assert got[(doc_id, c)] == (start, len(body), text, len(text))
            covered.update(range(start, start + len(body)))
            n_rows += 1
        # every token of the doc lands in at least one chunk
        assert covered == set(range(n))
    assert len(got) == n_rows
    # overlap property holds for at least one multi-chunk doc
    assert any(len(t) > w for t in docs.values()), "no multi-chunk docs"
