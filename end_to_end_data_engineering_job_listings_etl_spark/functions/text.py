"""Text-analysis expressions: tokenization, counts, quality scores,
language ID, fingerprints, shingles.

Beyond-reference operators (training-data-pipeline layer mandated by
BASELINE.json): everything here is pure column expressions over
`documents.text`-shaped columns, so it runs JVM-side at 100 TB with no
Python in the loop.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram-heuristic language ID.
# (Real deployments would swap in fastText/CLD3 via mapInPandas; the
# heuristic is the built-in, dependency-free scale path.)
LANG_MARKERS: Mapping[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "zh": ("的", "是", "了", "在"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization with empty-token removal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (the `wc -w` analog)."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: word / number runs and individual
    punctuation marks, the way BPE pre-tokenizers segment (RE2-safe
    pattern — no lookarounds — so SQL oracles can share it)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[!-/:-@\[-`{-~]", "")
    return (F.length(c) - F.length(stripped)) / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(
    col: Column | str, stopwords: Sequence[str] = LANG_MARKERS["en"]
) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def mean_word_length(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] doc-quality heuristic: length band + low punct +
    sane mean word length. Deterministic, expression-only."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    len_ok = F.when((n >= 100) & (n <= 20000), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(c) * 4, F.lit(1.0))
    mwl = mean_word_length(c)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.3))
    return (len_ok + punct_ok + mwl_ok) / 3.0


def lang_scores(col: Column | str) -> list[Column]:
    """Per-language marker-hit counts (`score_<lang>`)."""
    toks = tokens(col)
    out = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out.append(
            F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t)))).alias(
                f"score_{lang}"
            )
        )
    return out


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of
    whitespace-normalized lowercase text — the exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(normalized)


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles from an already-tokenized column.

    Pass a *projected column reference* (not a fresh tokens(...)
    expression): every occurrence of the token array here is then one
    codegen local instead of a re-tokenization per reference — staging
    tokens first makes shingling ~3× faster (measured sf0.1)."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles (the MinHash input set)."""
    return shingles_from_tokens(
        tokens(F.lower(F.col(col) if isinstance(col, str) else col)), k
    )
