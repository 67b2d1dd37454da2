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
# Round 5 front-loads, in order (r4 judge mandate #1: rotate so every
# query's official driver row ends up <= 3 rounds old):
# (a) queries changed or ADDED in r5 (the staleness gate forces these):
#     q105 (gate cache rekeyed), q161/q162 (Lloyd-trained codebooks),
#     q163 (GPS composition canary), q164 (cap telemetry), q165/q166
#     (training self-eval), q167-q174 (semdedup, triangles, ACF, CUSUM,
#     seasonal anomaly, association rules, source JSD, TWAP — new this
#     round);
# (b) the 16 queries still carrying r1-era official rows;
# (c) oldest r2-era official rows, registration order, up to the window
#     minus slack (q89/q84/q85/q88/q60/q96/q92/q93 yielded their slots to
#     the eight new r5 queries and rotate in r6 with the q30-q33 family).
_PRIORITY: list[str] = [
    # (a) changed or added in r5
    "q105_decontamination",
    "q161_ivf_trained_topk",
    "q162_pq_trained_codes",
    "q163_gps_pipeline",
    "q164_cap_telemetry",
    "q165_ivf_training_recall",
    "q166_lloyd_inertia",
    "q167_semdedup",
    "q168_triangle_count",
    "q169_hourly_acf",
    "q170_cusum_changepoint",
    "q171_seasonal_anomaly",
    "q172_association_rules",
    "q173_source_divergence",
    "q174_twap",
    # (b) r1-era official rows
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
    # (c) oldest r2-era official rows, registration order
    "q34_asof_join",
    "q50_dedup_exact",
    "q51_dedup_fingerprint",
    "q79_lev_verify_pairs",
    "q43_tumbling_hourly",
    "q97_sliding_window_rate",
    "q86_cdc_snapshot_upsert",
    "q26_approx_stats",
    "q35_collect_sorted",
    "q37_set_ops_all",
    "q38_except_all",
    "q39_uncorrelated_subquery",
    "q47_hypertable_rollup",
    "q48_array_functions",
    "q49_unpivot",
    "q90_exists_subqueries",
    "q91_cross_join",
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
