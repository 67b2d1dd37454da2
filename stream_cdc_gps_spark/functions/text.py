"""Text-analysis column expressions for the documents pipeline.

Tokenization, shingling, quality signals, fingerprints — all built-in
functions (split/transform/sequence/md5), so a 100 TB documents table
processes entirely inside codegen with only the final aggregation shuffling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization (corpus text is single-space separated)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Array of n-gram word shingles (space-joined) from a token-array column.

    Built as zip_with over shifted slices — NOT element_at per index: Catalyst
    CollapseProject inlines the toks expression (e.g. ``split(text)``) into
    every element_at, re-evaluating it O(tokens * n) times per row (measured
    ~100x slowdown); with slices it is evaluated only n times per row.
    zip_with pads the shorter side with null and concat null-propagates, so
    the trailing (n-1) incomplete shingles become null and are filtered.
    """
    shifted = [
        F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0)))
        for j in range(1, n)
    ]
    out = shifted[-1]
    for part in reversed([toks] + shifted[:-1]):
        out = F.zip_with(part, out, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(out, lambda s: s.isNotNull())


def normalized_text(text: Column) -> Column:
    """Lowercase + collapse whitespace: canonical form for fingerprinting."""
    return F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit document fingerprint (md5 of normalized text)."""
    return F.md5(normalized_text(text))
