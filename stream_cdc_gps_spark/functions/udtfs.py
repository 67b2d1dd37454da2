"""Python UDTFs (Spark 4 user-defined table functions).

The extension surface for one-row-to-many-rows logic that users would
otherwise hand-roll with explode over a UDF-built array: a UDTF streams
rows out lazily and composes with LATERAL in SQL. Row-at-a-time Python is
the SLOW path (SURVEY.md §2C policy) — the engine's own shingling stays on
the zero-UDF `word_shingles` column expression (functions/text.py), and the
equivalence test pins both to the same output.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, ngram string")
class NGrams:
    """ngrams_py(text, n): emit (position, space-joined word n-gram) rows.

    Mirrors functions.text.word_shingles exactly (same tokenization, same
    joining) so the UDTF path is differential-testable against the
    codegen'd path."""

    def eval(self, text: str, n: int):  # noqa: D102 — contract method
        if text is None or n is None or n <= 0:
            return
        toks = text.split(" ")
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


def register(spark) -> None:
    """Idempotent registration of all engine UDTFs for SQL use."""
    spark.udtf.register("ngrams_py", NGrams)
