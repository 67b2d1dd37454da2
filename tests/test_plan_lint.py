"""Plan lint: sweep EVERY registered query's physical plan for scale
hazards. This is the 100 TB smoke alarm — a new operator that sneaks in a
cartesian product or an accidental full-table re-shuffle fails here even if
its answers are correct at test scale."""

from __future__ import annotations

import pytest

from stream_cdc_gps_spark.plans import plan_string
from stream_cdc_gps_spark.plans.inspect import unpartitioned_windows_from_text
from stream_cdc_gps_spark.registry import all_queries
from tests.conftest import SF_SMOKE

# q91 is the intentional fixed-cardinality (5x5) cross join demo.
CARTESIAN_OK = {"q91_cross_join"}


@pytest.fixture(scope="module")
def plan_pair(spark):
    """(formatted, simple) plan text per query. The DataFrame is built
    once and BOTH render modes are taken from it (constructing the frame
    is the expensive part — some queries run eager localCheckpoints)."""
    out = {}
    for name, spec in all_queries().items():
        df = spec.fn(spark, SF_SMOKE)
        out[name] = (plan_string(df), plan_string(df, "simple"))
    return out


@pytest.fixture(scope="module")
def plans(plan_pair):
    return {name: pair[0] for name, pair in plan_pair.items()}


def test_no_unintended_cartesian_products(plans):
    bad = [
        n for n, p in plans.items()
        if "CartesianProduct" in p and n not in CARTESIAN_OK
    ]
    assert not bad, f"cartesian product leaked into: {bad}"


def test_broadcast_nested_loop_only_where_bounded(plans):
    """BNLJ is acceptable only when one side is a broadcast of bounded size
    (range join q09, centroid/query-side broadcasts). A BNLJ whose build
    side scales with the corpus would be a scale bug — keep the set pinned
    so additions are a conscious decision."""
    bnlj = sorted(n for n, p in plans.items() if "BroadcastNestedLoopJoin" in p)
    allowed = {
        "q09_range_join",        # broadcast small side + range predicate
        "q27_correlated_subquery",  # decorrelated scalar agg broadcast
        "q39_uncorrelated_subquery",
        "q60_cosine_topk",       # broadcast 20-query sample (documented)
        "q64_ann_recall",        # same sample, exact baseline
        "q165_ivf_training_recall",  # same sample, exact baseline (q64 shape)
        "q90_exists_subqueries",
        "q91_cross_join",
        "q78_tfidf",             # broadcast 1-row corpus-size aggregate
        "q69_token_pmi",         # broadcast 1-row corpus-size aggregate
        "q100_geofence_join",    # broadcast O(#fences) dim + containment pred
        "q117_price_histogram",  # broadcast 1-row global min/max extent
        "q118_rolling_dau",      # broadcast 1-row max-day bound
        "q121_locf_gapfill",     # broadcast day spine (bounded by calendar)
        "q126_pagerank",         # broadcast 1-row node-count N
        "q168_triangle_count",   # broadcast 1-row triangle-count combine
        "q175_triangle_estimate",  # broadcast 1-row sampled-count combine
        "q176_triangle_estimate_error",  # broadcast 1-row est-vs-exact combine
        "q172_association_rules",  # broadcast 1-row basket-count N
        "q131_hll_partition_merge",  # broadcast 1-row exact-count bound
        "q141_bm25",             # broadcast 1-row corpus N/avgdl stats
        "q142_bigram_lm_score",  # broadcast 1-row vocab size
        "q145_equidepth_histogram_approx",  # broadcast 1-row sketch bounds
        "q160_idf_weighted_jaccard",  # broadcast 1-row corpus doc count
        "q173_source_divergence",  # broadcast O(#sources) pair frame (< pred)
        "q180_chi2_independence",  # broadcast 1-row N/dof into the tiny grid
        "q183_pq_adc_topk",      # broadcast 20-query LUT side (q60's move)
        "q188_ivfpq_trained_recall",  # broadcast 20-query exact-L2 baseline
        "q191_truncated_dim_recall",  # broadcast 20-query sample, 3 slices
        "q211_hybrid_rrf_search",  # broadcast 1-row corpus N/avgdl (q141's move)
        "q214_dsir_importance",  # broadcast 1-row corpus bigram totals
        "q215_kmv_bottomk_sketch",  # broadcast O(#years) pair frame (< pred)
        "q219_retrieval_metrics",  # broadcast 20-query sample (q60's move)
        "q222_calibration_bins",  # broadcast 1-row global max extent
        "q224_benford_audit",  # broadcast 1-row total count
        "q225_gini_spend",  # broadcast 1-row range-boundary array (two-pass rank)
        "q133_equidepth_histogram",  # broadcast 1-row boundary array (two-pass rank)
        "q236_binned_ks",  # broadcast 1-row global [min,max] bin extent
        "q240_kruskal_wallis",  # broadcast 1-row N/tie-sum into the 5-group frame
        "q239_cdc_mixture_weights",  # broadcast 1-row sqrt-weight normalizer
        "q242_bloom_filter",  # broadcast 1-row n_bits_set combine
        "q243_cdc_counting_bloom",  # broadcast 1-row counter-stats combine
        "q125_skew_diagnostics",  # broadcast 1-row compressed rank-weighted sum
        "q227_km_survival",  # broadcast 1-row observation-end bound (q118's move)
        "q245_oneway_anova",  # broadcast 1-row N/k/grand-sum into the 5-group frame
        "q246_brown_forsythe",  # same readout over median-centered deviations
        "q247_lm_quality_gate",  # broadcast 1-row LM total-token normalizer
        "q248_cdc_lm_gate",  # same readout over the CDC-maintained LM
        "q249_jl_projection_recall",  # broadcast 20-query sample (q191's move)
        "q253_poisson_bootstrap",  # broadcast 1-row sorted-replicate-means combine
        "q254_cdc_bootstrap_ci",  # same 1-row combine over the maintained arms
        "q255_hill_tail_index",  # broadcast 1-row (x_k, k) into the 200-row top set
        "q259_cdc_km_survival",  # broadcast 1-row observation-end bound (q227's move)
        "q260_cdc_drift_suite",  # 1-row x 1-row x 1-row readout combine (boot/ks/psi)
        "q264_cdc_gini",  # broadcast 1-row boundary array (q225's two-pass rank)
    }
    unexpected = [n for n in bnlj if n not in allowed]
    assert not unexpected, f"unreviewed BroadcastNestedLoopJoin in: {unexpected}"


def test_no_row_at_a_time_python_udfs(plans):
    """SURVEY §2C policy: Python in the hot path is Arrow-batched only
    (MapInPandas / FlatMapGroupsInPandas / ArrowEvalPython). A
    BatchEvalPython node means a row-at-a-time UDF snuck in — the 10-100x
    slow path this engine bans."""
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not bad, f"row-at-a-time Python UDF in: {bad}"


# Global (un-partitioned) windows over a frame the parser cannot prove
# bounded: Spark executes these on ONE task ("No Partition Defined for
# Window operation") — the accidental-single-partition class the r10
# verdict flagged on q138/q223/q225. Windows whose child chain reaches an
# aggregate/limit/literal auto-pass (the q178 distinct-value-compression
# shape: cardinality = distinct keys, not rows — the key-cardinality
# argument lives in each query's docstring). Everything else must be
# pinned here with a justification, like the BNLJ list. The aggregate-fed
# auto-pass is itself guarded: tests/test_compression_cardinality.py
# MEASURES each compression query's distinct-count growth across a 10x
# scale step (and demonstrates a continuous column trips the guard) — the
# auto-pass alone would accept a continuous column whose "compression"
# compresses nothing. EMPTY since r12:
# the last entry (q133's one-shot exact ntile) was rewritten onto q225's
# two-pass distributed rank — keep it empty; a new entry needs a written
# case the two-pass rank genuinely cannot cover.
GLOBAL_WINDOW_OK: set[str] = set()


def test_no_unpartitioned_row_level_windows(plan_pair):
    """No query may run a global window over row-level input. Catches the
    class plan-lint missed in r10: an empty partition spec moves the whole
    input through a single WindowExec task, invisible at sf0.1 wall times
    but fatal at cluster scale."""
    bad = {}
    for name, (_, simple) in plan_pair.items():
        hits = [
            w for w in unpartitioned_windows_from_text(simple) if not w["bounded"]
        ]
        if hits and name not in GLOBAL_WINDOW_OK:
            bad[name] = [f"below={w['below']}: {w['node'][:80]}" for w in hits]
    assert not bad, f"un-partitioned row-level WindowExec in: {bad}"
