"""Vector math over ``array<float>`` embedding columns.

All higher-order functions (``transform``/``zip_with``/``aggregate``) —
JVM-side, no UDF, no data movement to Python. Elements are cast to double
FIRST so accumulation happens in float64 on both the engine and the oracle
side (DuckDB casts ``FLOAT[] -> DOUBLE[]`` identically), keeping differential
results bit-comparable after rounding.

Scale note: these are per-row O(dim) expressions — they pipeline inside
whole-stage codegen and add no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (same order as DuckDB list_reduce)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
