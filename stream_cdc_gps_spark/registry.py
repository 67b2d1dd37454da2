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


# Driver-verification priority. The correctness harness checks registry
# entries in iteration order and (round 1) capped at the first 50, leaving
# whole families unverified. Names listed here are emitted FIRST, in this
# order; everything else follows in registration order. Round 2 front-loads:
# (a) the 30 queries with no round-1 driver row (windowed, relational tail,
# similarity, textops, skew families), (b) the round-1 failures after their
# fixes (q43, q35, q26), (c) queries new this round. Rotate per round until
# every query has a driver-green row.
_PRIORITY: list[str] = [
    # (a) never driver-checked in round 1
    "q30_topk_per_group",
    "q31_rank_dense_ntile",
    "q32_lag_lead",
    "q33_window_frames",
    "q37_set_ops_all",
    "q38_except_all",
    "q39_uncorrelated_subquery",
    "q47_hypertable_rollup",
    "q48_array_functions",
    "q49_unpivot",
    "q60_cosine_topk",
    "q61_ann_bucketed_topk",
    "q62_embedding_stats",
    "q63_ivf_topk",
    "q64_ann_recall",
    "q70_lang_stats",
    "q71_token_quality",
    "q72_top_terms",
    "q73_lang_id_heuristic",
    "q74_source_lang_matrix",
    "q75_bpe_token_estimate",
    "q76_rolling_hash",
    "q77_stopword_ratio",
    "q90_exists_subqueries",
    "q91_cross_join",
    "q92_right_join",
    "q93_posexplode",
    "q94_skew_salted_join",
    "q95_range_frame",
    "q96_date_spine_coverage",
    # (b) round-1 failures, fixed this round
    "q43_tumbling_hourly",
    "q35_collect_sorted",
    "q26_approx_stats",
    # (c) new this round
    "q58_simhash_pairs",
    "q97_sliding_window_rate",
    "q84_json_scan",
    "q85_csv_scan",
    "q59_dedup_keep_one",
    "q65_label_centroids",
    "q78_tfidf",
    "q86_cdc_snapshot_upsert",
    "q79_lev_verify_pairs",
    "q87_train_val_split",
    "q98_distribution_ranks",
    "q88_orc_roundtrip",
    "q89_cogroup_stats",
    "q99_value_windows",
]


def all_queries() -> dict[str, QuerySpec]:
    _ensure_loaded()
    rank = {name: i for i, name in enumerate(_PRIORITY)}
    ordered = sorted(
        enumerate(_REGISTRY.values()),
        key=lambda pair: (rank.get(pair[1].name, len(_PRIORITY) + pair[0]), pair[0]),
    )
    return {spec.name: spec for _, spec in ordered}


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
        scans,
        similarity,
        skew,
        textops,
        windowed,
    )

    _LOADED = True
