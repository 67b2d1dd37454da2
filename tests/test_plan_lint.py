"""Plan lint: sweep EVERY registered query's physical plan for scale
hazards. This is the 100 TB smoke alarm — a new operator that sneaks in a
cartesian product or an accidental full-table re-shuffle fails here even if
its answers are correct at test scale."""

from __future__ import annotations

import pytest

from stream_cdc_gps_spark.plans import plan_string
from stream_cdc_gps_spark.registry import all_queries
from tests.conftest import SF_SMOKE

# q91 is the intentional fixed-cardinality (5x5) cross join demo.
CARTESIAN_OK = {"q91_cross_join"}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, spec in all_queries().items():
        out[name] = plan_string(spec.fn(spark, SF_SMOKE))
    return out


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
        "q223_mann_whitney_u",  # broadcast 1-row tie-correction sum
        "q224_benford_audit",  # broadcast 1-row total count
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
