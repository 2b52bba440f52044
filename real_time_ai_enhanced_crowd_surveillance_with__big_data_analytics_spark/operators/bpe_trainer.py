"""Full BPE tokenizer training over a corpus — the iterated form of
``plans/indexing.py::bpe_merge_step`` (which reports one iteration's
statistic): learn ``n_merges`` merge rules exactly as the classic
subword-NMT recipe does (character symbols + end-of-word marker,
highest corpus-weighted adjacent-pair frequency per round, greedy
left-to-right non-overlapping application).

Scale design — the reason BPE training is feasible on a 100 TB corpus
at all: the corpus is scanned ONCE into a word histogram (word types ×
counts, a vocabulary-bounded shuffle); every merge iteration then runs
over DISTINCT word types only, with corpus size entering through the
weights. Per iteration: one explode/groupBy over the symbol-pair
vocabulary (bounded), one driver-side argmax of a SINGLE row
(orderBy + limit 1 — deterministic count-desc/pair-asc tiebreak), and
one codegen'd fold that rewrites each word's symbol array in place;
``localCheckpoint`` truncates the per-iteration lineage so round N's
plan does not replay rounds 1..N-1 (the pagerank/connected-components
convention). Merge application to NEW text goes through the same
per-word fold expression, so segmentation is pure Column code too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"  # end-of-word marker (word-final merges differ from inner)


def _word_histogram(docs: DataFrame, text_col: str) -> DataFrame:
    from ..functions.text import tokens

    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
    )


def _merge_pair_expr(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b)
    into ``a+b`` — a single codegen'd fold over the symbol array."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(
    docs: DataFrame, text_col: str = "text", n_merges: int = 20
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (merges, final vocab as
    a (w, syms, wf) DataFrame). Stops early when no pair remains."""
    wf = _word_histogram(docs, text_col)
    vocab = wf.select(
        "w",
        F.concat(F.split("w", ""), F.array(F.lit(EOW))).alias("syms"),
        "wf",
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = vocab.select(
            "wf",
            F.explode(
                # guard: sequence(1, 0) counts DOWN to [1, 0] for a
                # fully-merged single-symbol word -> element_at(_, 0)
                F.expr(
                    "CASE WHEN size(syms) >= 2 THEN"
                    " transform(sequence(1, size(syms) - 1),"
                    " i -> struct(element_at(syms, i) AS a,"
                    "             element_at(syms, i + 1) AS b))"
                    " ELSE array() END"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("wf").alias("c"))
            .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            "w", _merge_pair_expr(F.col("syms"), a, b).alias("syms"), "wf"
        ).localCheckpoint()
    return merges, vocab


def segment_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Symbol array for ``word`` under the learned merges — the same
    fold the trainer used, chained once per merge rule, all codegen'd
    (no Python on the hot path when segmenting a corpus)."""
    syms = F.concat(F.split(word, ""), F.array(F.lit(EOW)))
    for a, b in merges:
        syms = _merge_pair_expr(syms, a, b)
    return syms
