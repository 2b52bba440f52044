"""Text-analysis primitives for the LLM-data-pipeline surface
(BASELINE.json north-star: language-ID, quality scoring, token
counting, document fingerprinting).

Everything is a pure Column expression — tokenization, filtering,
hashing all run inside whole-stage codegen, no Python in the hot path.
The reference's only string processing is regex validation
(verify.py:6-50) and label formatting (main.py:244); these operators
are the designed extension of that surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31

# Stopword marker profiles for the language-ID heuristic. Real systems
# use char-n-gram models; the heuristic here is the classic
# stopword-profile score (argmax of marker-token hits per language,
# alphabetical tiebreak) — deterministic and oracle-expressible.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und"),
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "y"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("de", "le", "shi", "bu"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space split, matching the
    corpus layout; trim guards edge spaces)."""
    return F.split(F.trim(text), " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_count(text: Column, stopwords: tuple[str, ...] = ("the", "a")) -> Column:
    return F.size(F.filter(tokens(text), lambda t: t.isin(*stopwords)))


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over character codes,
    acc = (acc*31 + code) mod 1e9+7 — a portable document fingerprint
    (same arithmetic is expressible in ANSI SQL, unlike engine-native
    hash()). Left fold, init 0."""
    codes = F.transform(F.split(text, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FINGERPRINT_BASE + c) % FINGERPRINT_MOD,
    )


# DuckDB twin of quality_score below — ONE canonical fragment formatted
# into every oracle that scores quality (quality_weighted_sample,
# source_mixture_report, corpus_build_pipeline, semantic_keep_canonical)
# so a knob change can't silently diverge a subset of oracles from the
# Spark column. The {text} placeholder is the column/expression to score.
DUCK_QUALITY = (
    "round(least(len(string_split(trim({text}), ' ')) / 50.0, 1.0)"
    " * (1.0 - CAST(len(list_filter(string_split(trim({text}), ' '),"
    " x -> x = 'the' OR x = 'a')) AS DOUBLE)"
    " / len(string_split(trim({text}), ' '))), 6)"
)


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: rewards mid-length docs and
    penalizes stopword-heavy text — the shape of standard pretraining
    quality filters (length/stopword/punct ratios)."""
    n_tok = token_count(text).cast("double")
    sw_ratio = stopword_count(text).cast("double") / n_tok
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    return F.round(len_score * (1.0 - sw_ratio), 6)
