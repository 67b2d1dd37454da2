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

    IMPORTANT: ``toks`` must be a materialized array column (e.g. via
    ``.withColumn("toks", tokens(col))``), NOT an inline ``split(...)``
    expression — Catalyst does not eliminate common subexpressions inside
    higher-order-function lambdas, so an inline split would be re-evaluated
    for every element_at (measured ~100x slowdown).
    """
    k = F.size(toks) - (n - 1)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )


def normalized_text(text: Column) -> Column:
    """Lowercase + collapse whitespace: canonical form for fingerprinting."""
    return F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit document fingerprint (md5 of normalized text)."""
    return F.md5(normalized_text(text))
