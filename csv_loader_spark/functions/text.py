"""Text-analysis column expressions (tokenize, shingles, quality, lang-id).

All JVM-side (`pyspark.sql.functions` only — no Python UDFs in this module),
so every expression stays inside whole-stage codegen and scales linearly.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Plain-identifier column names take the single-`F.expr` construction fast
# path below. Every `F.<fn>(...)` Column call is 1-2 py4j round trips, and
# on a busy driver host a round trip has a multi-ms tail (r15 measured
# p50 0.27 ms / p90 4-14 ms on the bench sandbox), so a helper composed of
# a dozen Column ops costs 10-100 ms of pure driver latency PER USE — these
# helpers are used hundreds of times per composed query build (the
# minhash/ingest family builds issue ~2000-2700 round trips each). One
# F.expr parses the same expression tree JVM-side in a single round trip.
# The trees are IDENTICAL to the composed form (asserted by
# tests/test_text_expr_equiv.py via analyzed-plan sameResult), so plans,
# results and oracles are unchanged — this is a driver-side construction
# cost cut only (guide §7.3: planning/driver time as the bottleneck).
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _name(col: Column | str) -> str | None:
    return col if isinstance(col, str) and _IDENT.match(col) else None


def _tokens_sql(name: str) -> str:
    # matches the oracle's string_split_regex(trim(lower(text)), '\s+')
    return r"split(trim(lower(`%s`)), '\\s+')" % name


# Tokenization: lowercase, split on whitespace runs. Matches the oracle's
# string_split_regex(trim(lower(text)), '\s+').
def tokens(col: Column | str) -> Column:
    n = _name(col)
    if n is not None:
        return F.expr(_tokens_sql(n))
    return F.split(F.trim(F.lower(F.col(col) if isinstance(col, str) else col)), r"\s+")


def token_count(col: Column | str) -> Column:
    n = _name(col)
    if n is not None:
        return F.expr(f"size({_tokens_sql(n)})")
    return F.size(tokens(col))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>.

    Built as ``transform(arrays_zip(slice(toks,1,m), …, slice(toks,n,m)))``
    — pure Catalyst expressions, no UDF. The zip-of-shifted-slices shape
    matters for PERFORMANCE, not just style: higher-order lambdas are
    interpreted (no whole-stage codegen), and any outer expression the
    lambda references is RE-EVALUATED per element — the previous
    ``element_at(toks, i+k)`` formulation re-ran the whole ``split()`` n
    times per gram (~34 s to shingle 5k docs at sf0.1). Here the lambda
    touches only its own variable, the slices/zip evaluate once per row,
    and the same explode runs in ~1.7 s (20×).

    Documents shorter than n tokens yield an empty array.
    """
    return F.array_distinct(word_ngrams(col, n))


def word_ngrams(col: Column | str, n: int = 2) -> Column:
    """ALL word n-grams in order (duplicates kept) as an array<string> —
    the occurrence-counting form (pair-frequency/BPE statistics need every
    occurrence; shingling dedups on top of this). Same zip-of-shifted-
    slices construction as word_shingles and for the same 20× reason: the
    lambda touches only its own variable."""
    nm = _name(col)
    if nm is not None:
        t = _tokens_sql(nm)
        # gram count = len - n + 1; clamped at 0 because slice() errors on
        # a negative length (belt to the CASE guard's suspenders)
        m = f"greatest(size({t}) - {n - 1}, 0)"
        slices = ", ".join(f"slice({t}, {k + 1}, {m})" for k in range(n))
        fields = ", ".join(f"s.`{k}`" for k in range(n))
        return F.expr(
            f"CASE WHEN size({t}) >= {n} THEN "
            f"transform(arrays_zip({slices}), s -> concat_ws(' ', {fields})) "
            f"ELSE CAST(array() AS array<string>) END"
        )
    toks = tokens(col)
    # gram count = len - n + 1; clamped at 0 because slice() errors on a
    # negative length (belt to the when() guard's suspenders)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, k + 1, m) for k in range(n)])
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)])
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


# Punctuation class shared with the oracle SQL (explicit, locale-free).
PUNCT_RE = r"[.,!?;:]"

# Small deterministic stopword list used by quality scoring and lang-id.
STOPWORDS = ("a", "the", "and", "of", "to", "in", "is", "on")


def punct_count(col: Column | str) -> Column:
    n = _name(col)
    if n is not None:
        return F.expr(
            f"length(`{n}`) - length(regexp_replace(`{n}`, '{PUNCT_RE}', ''))"
        )
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, PUNCT_RE, ""))


def stopword_count(col: Column | str) -> Column:
    n = _name(col)
    if n is not None:
        arr_sql = ", ".join(f"'{s}'" for s in STOPWORDS)
        return F.expr(
            f"size(filter({_tokens_sql(n)}, "
            f"t -> array_contains(array({arr_sql}), t)))"
        )
    toks = tokens(col)
    arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized token stream.

    Normalization (lower + whitespace collapse) makes the fingerprint robust
    to formatting-only edits — the cheap first pass of an exact-dedup pipeline.
    """
    n = _name(col)
    if n is not None:
        return F.expr(f"md5(concat_ws(' ', {_tokens_sql(n)}))")
    return F.md5(F.concat_ws(" ", tokens(col)))


def bpe_symbols(col: Column | str) -> Column:
    """A word as its BPE symbol string: characters separated by DOUBLE
    spaces, single-space padded at both ends. On this encoding a literal
    replace-all of ``' a  b '`` with ``' ab '`` is EXACTLY leftmost-greedy
    BPE for the pair (a, b): matches cannot share characters (each takes
    one space from each side's double separator), cannot cross symbol
    boundaries (symbol interiors contain no spaces), and consecutive
    occurrences all merge in one pass. The naive single-space encoding
    fails both ways — r9 review caught it merging a symbol's suffix with
    the next symbol's prefix ('fast' -> ['f','ast'])."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(
        F.lit(" "), F.trim(F.regexp_replace(c, "(.)", "$1  ")), F.lit(" ")
    )


def bpe_encode(col: Column | str, merges) -> Column:
    """Apply a trained merge table (``[(left, right, ...), ...]`` in
    training order) to a word column — the ONE implementation shared by
    q139, tools/train_bpe.py, and the reference-equivalence test, so
    application can never drift from training."""
    enc = bpe_symbols(col)
    for a, b, *_ in merges:
        enc = F.replace(enc, F.lit(f" {a}  {b} "), F.lit(f" {a + b} "))
    return enc


def bpe_subwords(col: Column | str, merges) -> Column:
    """The word's subword array under the merge table."""
    return F.split(F.trim(bpe_encode(col, merges)), "  ")
