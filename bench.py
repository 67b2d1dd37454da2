"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}. The driver records this per-round
as BENCH_r{N}.json and grades against BASELINE.md (first full run self-sets
the baseline; later revisions must stay within 2x — BASELINE.md).

Methodology: one shared session (cluster-style reuse), one untimed warmup
query to JIT/codegen-prime the executors, then each headline query timed
end-to-end (plan + execute + write to a noop sink). The noop sink forces
EVERY projected expression to evaluate — under ``.count()`` Catalyst prunes
unreferenced projection columns, so projection-heavy queries (q41's
haversine chain) would time a bare scan instead of the real work.
Methodology changed r1→r2 (count → noop); compare like-for-like from r2 on
(BASELINE.md).

Since r3 each query runs REPS=3 times round-robin (full suite passes, not
back-to-back — spreads a co-tenant CPU-steal burst across queries instead
of concentrating it on one): ``queries``/``value`` carry the per-query MIN
(the best estimate of true cost under bursty steal, BASELINE.md variance
notes), ``queries_median`` the median, so run-to-run stability is visible
in the artifact itself without judge-side judgment calls. Headliners span
every operator family so a regression anywhere shows up here.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stream_cdc_gps_spark.registry import queries  # noqa: E402
from stream_cdc_gps_spark.session import get_spark  # noqa: E402

# One per operator family (SURVEY.md §2B): scan+agg, star join, window,
# GPS motion, CDC roundtrip, exact dedup, LSH candidates, jaccard,
# brute-force ANN, bucketed ANN, text quality, term frequency.
HEADLINE = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q08_regional_revenue",
    "q15_percentiles",
    "q30_topk_per_group",
    "q33_window_frames",
    "q41_derived_motion",
    "q44_cdc_roundtrip",
    "q50_dedup_exact",
    "q53_lsh_candidate_pairs",
    "q54_ngram_jaccard",
    "q57_neardup_components",
    "q60_cosine_topk",
    "q61_ann_bucketed_topk",
    "q64_ann_recall",
    "q71_token_quality",
    "q72_top_terms",
    "q78_tfidf",
    "q82_media_frames",
    "q86_cdc_snapshot_upsert",
    "q97_sliding_window_rate",
    # round-3 families: decontamination, funnel, sketch, gap-fill, iterative
    "q105_decontamination",
    "q111_event_funnel",
    "q113_heavy_hitters_cms",
    "q121_locf_gapfill",
    "q126_pagerank",
    # round-4 additions (r3 judge task #5): SCD2 history, tolerance as-of,
    # and the end-to-end corpus pipeline composition (best whole-engine canary)
    "q114_scd2_history",
    "q136_asof_tolerance",
    "q144_corpus_pipeline",
    # round-5 additions (r4 judge task #8): every family added in r4 gets a
    # tracked perf number — shingle novelty, cluster-safe split, Morton keys,
    # IDF-weighted Jaccard — plus r5's trained codebooks (training cost is
    # part of the timed query), the GPS composition canary, and cap telemetry
    "q152_shingle_novelty",
    "q153_cluster_safe_split",
    "q158_zorder_morton",
    "q160_idf_weighted_jaccard",
    "q161_ivf_trained_topk",
    "q162_pq_trained_codes",
    "q163_gps_pipeline",
    "q164_cap_telemetry",
    "q167_semdedup",
    "q169_hourly_acf",
    "q170_cusum_changepoint",
    "q171_seasonal_anomaly",
    "q173_source_divergence",
    "q174_twap",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    def run(name: str) -> None:
        # noop sink: full execution of every output column, zero write cost
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # untimed warmup: prime codegen/JIT + parquet footer caches
    run("q01_pricing_summary")

    REPS = 3
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(REPS):
        for name in HEADLINE:
            t0 = time.perf_counter()
            run(name)
            samples[name].append(time.perf_counter() - t0)

    mins = {n: round(min(s), 3) for n, s in samples.items()}
    medians = {n: round(sorted(s)[len(s) // 2], 3) for n, s in samples.items()}
    total = round(sum(mins.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": mins,
                "queries_median": medians,
                "reps": REPS,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
