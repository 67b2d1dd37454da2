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


# Driver-verification priority. The correctness harness checks the FIRST ~50
# registry entries in iteration order; names listed here are emitted FIRST,
# in this order, everything else follows in registration order.
#
# STANDING RULE (round-2 judge): any query whose code OR oracle changed since
# its last driver-green row goes to the FRONT of the next round's list — a
# green row certifies the code that was checked, not the current code.
# Round 3 front-loads: (a) queries rewritten after their only (r1) driver
# check — their r1 rows are stale; (b) queries changed/added THIS round
# (64-bit SimHash q55/q58, 16-bit sign-LSH q56, new q83); (c) the remaining
# r1-only-checked queries, oldest rows first, to keep every row ≤2 rounds old.
_PRIORITY: list[str] = [
    # (a) rewritten after their last driver row (stale r1 rows)
    "q53_lsh_candidate_pairs",
    "q54_ngram_jaccard",
    "q81_media_features",
    "q78_tfidf",
    # (b) changed or new in round 3
    "q136_asof_tolerance",
    "q137_mutual_information",
    "q138_ks_test",
    "q134_incremental_agg",
    "q135_time_range_frame",
    "q131_hll_partition_merge",
    "q128_recursive_cte",
    "q129_collation_group",
    "q130_sql_scripting",
    "q127_variant_extract",
    "q126_pagerank",
    "q122_transition_matrix",
    "q123_value_outliers",
    "q124_ab_ttest",
    "q125_skew_diagnostics",
    "q119_ewma_smoothing",
    "q120_ohlc_bars",
    "q121_locf_gapfill",
    "q114_scd2_history",
    "q115_snapshot_diff",
    "q116_dq_checks",
    "q117_price_histogram",
    "q118_rolling_dau",
    "q110_exact_percentiles",
    "q111_event_funnel",
    "q112_retention_cohorts",
    "q113_heavy_hitters_cms",
    "q105_decontamination",
    "q106_shared_passages",
    "q107_zipf_fit",
    "q108_mixture_weights",
    "q109_lateral_topk",
    "q55_simhash",
    "q58_simhash_pairs",
    "q56_embedding_near_dup",
    "q83_gps_rejects",
    "q66_quality_filter",
    "q67_stratified_sample",
    "q68_embedding_quantize",
    "q69_token_pmi",
    "q100_geofence_join",
    "q101_spatial_grid",
    "q59_dedup_keep_one",  # composes q57, whose label seeding changed in r3
    "q102_media_resize",
    "q103_sequence_packing",
    "q104_repetition_stats",
    # (c) r1-only rows (unchanged, but oldest) in registration order
    "q52_minhash_signatures",
    "q57_neardup_components",
    "q40_wkt_points",
    "q41_derived_motion",
    "q42_trip_sessions",
    "q44_cdc_roundtrip",
    "q45_cdc_dedup",
    "q46_session_window_native",
    "q80_media_metadata",
    "q82_media_frames",
    "q01_pricing_summary",
    "q02_filter_predicates",
    "q03_top_revenue_orders",
    "q04_left_join_counts",
    "q05_semi_join",
    "q06_anti_join",
    "q07_full_outer_join",
    "q08_regional_revenue",
    "q09_range_join",
    "q10_agg_stats",
    "q11_count_distinct",
    "q12_rollup",
    "q13_cube",
    "q14_grouping_sets",
    "q15_percentiles",
    "q16_having",
    "q17_conditional_agg",
    "q18_intersect",
    "q19_except",
    "q20_union_all",
    "q21_distinct",
    "q22_string_funcs",
    "q23_date_funcs",
    "q24_json_funcs",
    "q25_hash_funcs",
    "q27_correlated_subquery",
    "q28_pivot",
    "q29_min_max_by",
    "q36_map_functions",
    # --- DRIVER-WINDOW OVERFLOW: the r3 front-load already fills the
    # driver's ~50-query window, so these four late additions have NO r3
    # driver row (driver-sim green at sf0.01; trivial plans). ROUND 4 MUST
    # put them at the FRONT of this list.
    "q132_fixed_k_sample",
    "q133_equidepth_histogram",
    "q139_token_entropy",
    "q140_mad_robust",
    "q141_bm25",
    "q142_bigram_lm_score",
    "q143_spatial_knn",
    "q144_corpus_pipeline",
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
        analytics,
        asof,
        corpus,
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
