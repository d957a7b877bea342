"""Text-analysis column expressions (tokenize, shingles, quality, lang-id).

All JVM-side (`pyspark.sql.functions` only — no Python UDFs in this module),
so every expression stays inside whole-stage codegen and scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenization: lowercase, split on whitespace runs. Matches the oracle's
# string_split_regex(trim(lower(text)), '\s+').
def tokens(col: Column | str) -> Column:
    return F.split(F.trim(F.lower(F.col(col) if isinstance(col, str) else col)), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>.

    Built from `sequence` + `transform` over the token array — pure Catalyst
    expressions, no UDF. Documents shorter than n tokens yield an empty array.
    """
    toks = tokens(col)
    # sequence(0, stop) defaults to step -1 when stop < 0 (it is NOT empty),
    # so short docs must be guarded explicitly or element_at throws.
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + k + 1).cast("int")) for k in range(n)]),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


# Punctuation class shared with the oracle SQL (explicit, locale-free).
PUNCT_RE = r"[.,!?;:]"

# Small deterministic stopword list used by quality scoring and lang-id.
STOPWORDS = ("a", "the", "and", "of", "to", "in", "is", "on")


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, PUNCT_RE, ""))


def stopword_count(col: Column | str) -> Column:
    toks = tokens(col)
    arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized token stream.

    Normalization (lower + whitespace collapse) makes the fingerprint robust
    to formatting-only edits — the cheap first pass of an exact-dedup pipeline.
    """
    return F.md5(F.concat_ws(" ", tokens(col)))
