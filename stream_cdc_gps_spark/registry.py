"""Query registry: names -> (Spark callable, DuckDB oracle SQL).

Every operator the engine claims is registered here via the ``@query``
decorator; ``__spark_entry__.py`` exposes the registry to the driver harness,
which runs the Spark side and the oracle SQL side-by-side at sf0.01 and
compares row-count + schema + order-insensitive value hash.

Differential-testing ground rules (see SURVEY.md §5.2):

- column names must match exactly between the Spark result and the oracle —
  alias everything, lowercase;
- aggregates over doubles are rounded on BOTH sides (floating-point sums are
  order-dependent; rounding absorbs ulp-level divergence between Spark's and
  DuckDB's accumulation orders without weakening the check);
- every ORDER BY ... LIMIT has a total tiebreak key so top-k is deterministic;
- integer aggregates are cast to BIGINT on both sides (DuckDB sums to
  HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a named query with its DuckDB oracle SQL."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, SparkQuery]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }


_LOADED = False


def _ensure_loaded() -> None:
    """Import every operator module exactly once (registration side effects)."""
    global _LOADED
    if _LOADED:
        return
    # Imports deferred to avoid circular imports at package import time.
    from stream_cdc_gps_spark.operators import (  # noqa: F401
        asof,
        dedup,
        gps,
        multimodal,
        relational,
        similarity,
        skew,
        textops,
        windowed,
    )

    _LOADED = True
