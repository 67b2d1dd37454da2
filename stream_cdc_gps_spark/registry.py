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
# Round 12 front-loads, in order:
# (a) queries changed or added this round — the staleness gate forces
#     these: q133 (the last GLOBAL_WINDOW_OK entry, rewritten onto q225's
#     two-pass distributed rank), q227 (per-term 12-dp ln rounding, the
#     r11 advice), and the new rows q234/q235 (CDC-maintained
#     decontamination / shingle-novelty gates over CdcShingleDfView),
#     q236 (binned KS — the domain-cardinality-loophole companion),
#     q237 (truncation-loss curve), q239 (CDC-maintained mixture weights
#     composing CdcAggregateView), q240 (Kruskal-Wallis on the midrank
#     idiom), q241 (exact weighted median via crossing-bucket two-pass),
#     q238 (CDC-maintained KS drift monitor composing CdcAggregateView),
#     q242/q243 (Bloom filter + its CDC counting variant), q244
#     (prefix-filtered exact set-similarity join); the continuation
#     session added q245/q246 (one-way ANOVA + Brown-Forsythe on
#     decimal-exact sufficient statistics), q247/q248 (unigram-LM
#     perplexity quality gate + its CDC-maintained variant composing
#     the new CdcTokenTfView), q249 (JL random-projection recall,
#     q191's harness over a projected column), q250 (Welch's
#     unequal-variance t + Cohen's d), and q251 (CDC-maintained exact
#     weighted median — q241's order statistic on the support-set
#     recompute strategy), q252 (exact per-group MAD, the crossing
#     rule applied twice), q253 (Poisson bootstrap CI — the distributed
#     bootstrap with hash-deterministic weights), and q254 (the
#     bootstrap CI CDC-maintained: replicate means are ratios of linear
#     aggregates, composed CdcAggregateViews), q255 (Hill tail-index
#     diagnostic over top-k order statistics), q256 (GPS teleport
#     filter — the reference-domain outlier screen), and q257 (PSI
#     drift — the standard ML-monitoring metric, q236's binning);
# (b) the NINE rows the r11 slack cap deferred with a promise (r11
#     verdict task #1): q35, q36, q37, q105, q163, q169-q172 — their
#     newest driver rows were r4/r5-era, bridge-certified at r11 close;
# (c) the remaining r5-era rows (q38, q39, q43, q47-q51, q86, q90, q91,
#     q97 — twelve), then the OLDEST r6-era rows in query order up to
#     the slack cap (48 = window - 2) — the staleness rotation the r11
#     verdict's task #2 prescribes (no certificate older than ~6 rounds
#     of tree churn). Next-stalest after the cut (displaced one-for-one
#     by the round's new rows, bridge-certified at close): q63-q65,
#     q70, q71, q79,
#     q146, q147, q150, q153, plus q31, q32, q33 and q52-q62 (displaced
#     from this list one-for-one by the continuation session's q245-q257
#     under the slack cap, bridge-certified at close), then the rest of
#     the r6 cohort — r13's (c) tier.
_PRIORITY: list[str] = [
    # (a) changed or added in r12
    "q133_equidepth_histogram",
    "q227_km_survival",
    "q234_cdc_decontamination",
    "q235_cdc_shingle_novelty",
    "q236_binned_ks",
    "q237_truncation_loss",
    "q238_cdc_drift_monitor",
    "q239_cdc_mixture_weights",
    "q240_kruskal_wallis",
    "q241_weighted_median",
    "q242_bloom_filter",
    "q243_cdc_counting_bloom",
    "q244_prefix_filter_join",
    "q245_oneway_anova",
    "q246_brown_forsythe",
    "q247_lm_quality_gate",
    "q248_cdc_lm_gate",
    "q249_jl_projection_recall",
    "q250_welch_ttest",
    "q251_cdc_weighted_median",
    "q252_mad_robust_spread",
    "q253_poisson_bootstrap",
    "q254_cdc_bootstrap_ci",
    "q255_hill_tail_index",
    "q256_gps_teleport_filter",
    "q257_psi_drift",
    # (b) the nine promised r11 deferrals
    "q35_collect_sorted",
    "q36_map_functions",
    "q37_set_ops_all",
    "q105_decontamination",
    "q163_gps_pipeline",
    "q169_hourly_acf",
    "q170_cusum_changepoint",
    "q171_seasonal_anomaly",
    "q172_association_rules",
    # (c) remaining r5-era rows
    "q38_except_all",
    "q39_uncorrelated_subquery",
    "q43_tumbling_hourly",
    "q47_hypertable_rollup",
    "q48_array_functions",
    "q49_unpivot",
    "q50_dedup_exact",
    "q51_dedup_fingerprint",
    "q86_cdc_snapshot_upsert",
    "q90_exists_subqueries",
    "q91_cross_join",
    "q97_sliding_window_rate",
    # (c) oldest r6-era rows, query order, filling to the 50-row window
    "q30_topk_per_group",
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
