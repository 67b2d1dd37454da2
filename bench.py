"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Output contract (r6, judge task #1 — r5's 4.6 KB single line overflowed the
driver's 2000-char stdout tail and shipped ``parsed: null``): per-query
detail prints FIRST (one line per query, plus the full min/median dump to
``artifacts/bench_detail.json``), and the run ENDS with ONE compact JSON
line — short query keys, 2-decimal values, < 1 KB — that always survives
the tail capture. That final line carries the numbers the contract is
judged on: ``value`` (permanent-suite min-sum), ``shared21_min_sum`` (the
2x-vs-BASELINE subset, comparable r2→now), and the rotating spotlight sum.

Suite structure (r6, judge task #3 — the one-flat-list suite grew ~8
queries/round and was heading past a minute of wall): PERMANENT is pinned
to the shared-21 r2 subset + one representative per family added since
(29 queries, stable across rounds for comparability); SPOTLIGHT rotates
per round (5-8 queries, recorded in BASELINE.md) to give new or changed
operators a tracked number without unbounded suite growth. Off-headline
heavyweights (q168, q172) keep isolated numbers in BASELINE.md.

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
of concentrating it on one): mins are the best estimate of true cost under
bursty steal, medians make run-to-run stability visible (BASELINE.md
variance notes). Headliners span every operator family so a regression
anywhere shows up here.

Since r15 (r13 verdict item 7): when the run's own spread flags co-tenant
pollution (shared21 median-sum > 1.5x min-sum), the bench waits for an
idle window (loadavg < 0.5, bounded at 10 min) and runs ONE more full
pass; mins absorb the retry samples and the final line carries a ``retry``
object recording what happened. All pre-existing keys keep their meaning.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stream_cdc_gps_spark.registry import queries  # noqa: E402
from stream_cdc_gps_spark.session import get_spark  # noqa: E402

# The r2 suite — the 2x contract is judged on this subset's min-sum,
# comparable across every round since the noop-sink re-baseline.
SHARED21 = [
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
]

# One representative per family added after r2 (stable — do not rotate):
# decontamination, funnel, sketch, gap-fill, iterative graph (r3); SCD2,
# tolerance as-of, corpus-pipeline composition (r4).
PERMANENT = SHARED21 + [
    "q105_decontamination",
    "q111_event_funnel",
    "q113_heavy_hitters_cms",
    "q121_locf_gapfill",
    "q126_pagerank",
    "q114_scd2_history",
    "q136_asof_tolerance",
    "q144_corpus_pipeline",
]

# Rotates each round (BASELINE.md records the per-round pick): queries
# added or materially changed this round get a tracked number here.
# r13: the advice-fixed rows (q236/q247/q248/q256/q257 — portable LM
# mean, degenerate-extent bin guards, quantized teleport speeds), the
# refactored-readout rows (q227 KM helpers, q238 _ks_tail, q254
# CdcBootstrapView suite params), and the round's new rows (q258 CDC
# PSI, q259 CDC Kaplan-Meier, q260 the composed drift suite, q261/q265
# vocabulary coverage batch+CDC, q262/q266 conformal calibration
# batch+CDC, q263 SPRT, q264 CDC Gini), plus the eight heaviest
# CDC/vector reps carried again for round-over-round comparability. The other r12 spotlight rows (q133/q234/q235/q237/
# q239-q246/q249-q253/q255) rotate off — each keeps an isolated
# BASELINE.md anchor (q251/q253/q254 re-probed at r13 round start) and
# correctness rides the driver window.
SPOTLIGHT = [
    "q227_km_survival",
    "q236_binned_ks",
    "q238_cdc_drift_monitor",
    "q247_lm_quality_gate",
    "q248_cdc_lm_gate",
    "q254_cdc_bootstrap_ci",
    "q256_gps_teleport_filter",
    "q257_psi_drift",
    "q258_cdc_psi_drift",
    "q259_cdc_km_survival",
    "q260_cdc_drift_suite",
    "q261_vocab_coverage",
    "q262_conformal_calibration",
    "q263_sprt_sequential",
    "q264_cdc_gini",
    "q265_cdc_vocab_coverage",
    "q266_cdc_conformal",
    "q267_cdc_sprt",
    # carried heavies (comparability anchors since r10)
    "q190_ivfpq_incremental_index",
    "q194_cdc_join_view",
    "q195_vector_index_retrain",
    "q198_cdc_left_join_view",
    "q200_cdc_topk_view",
    "q205_cdc_vector_index",
    "q206_cdc_lsh_index",
    "q209_cdc_join_agg_cascade",
]
# q201 (composed CDC view suite: 6 views x 2 merges per rep — ~10 s at
# sf0.1 after the late-r10 concurrent-wave rework, was 18.3 s after the
# shared-delta rework and ~30 s in r8) stays OFF-headline like
# q168/q172/q189 — isolated number in BASELINE.md; its correctness
# rides the driver window.

HEADLINE = PERMANENT + SPOTLIGHT


def _short(name: str) -> str:
    return name.split("_", 1)[0]


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

    # Idle-window retry (r13 verdict item 7, codified r15): when the run's
    # own spread says it was polluted by co-tenant steal (shared21 medians
    # ≫ mins), wait for an idle window and run ONE more full pass. Mins
    # absorb the retry samples (same meaning: best observed cost); the
    # medians of the ORIGINAL passes are kept untouched as the stability
    # record of the main run. Additions only — every pre-existing key of
    # the final JSON line keeps its meaning for cross-round comparison.
    s21_min = sum(mins[n] for n in SHARED21)
    s21_med = sum(medians[n] for n in SHARED21)
    retry: dict = {"ran": False}
    if s21_med > 1.5 * s21_min:
        waited = 0.0
        while os.getloadavg()[0] >= 0.5 and waited < 600.0:
            time.sleep(15.0)
            waited += 15.0
        retry = {
            "ran": True,
            "loadavg": round(os.getloadavg()[0], 2),
            "waited_s": int(waited),
            "s21_min_before": round(s21_min, 3),
        }
        for name in HEADLINE:
            t0 = time.perf_counter()
            run(name)
            samples[name].append(time.perf_counter() - t0)
        mins = {n: round(min(s), 3) for n, s in samples.items()}
        retry["s21_min_after"] = round(sum(mins[n] for n in SHARED21), 3)

    # Per-query detail FIRST: full names + min/median, one line per query
    # (head-truncation by the driver's tail capture loses nothing the
    # final line needs), plus the whole dump as an artifact.
    for n in HEADLINE:
        print(f"# {n}: min={mins[n]} median={medians[n]}")
    detail = {
        "queries_min": mins,
        "queries_median": medians,
        "permanent": PERMANENT,
        "spotlight": SPOTLIGHT,
        "reps": REPS,
        "sf": float(sf),
        "retry": retry,
        "samples": {n: [round(x, 3) for x in s] for n, s in samples.items()},
    }
    art_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
    os.makedirs(art_dir, exist_ok=True)
    with open(os.path.join(art_dir, "bench_detail.json"), "w") as f:
        json.dump(detail, f, indent=1)

    # Final line: compact (< 1 KB), short keys, 2-decimal values — this is
    # the line the driver parses from its bounded stdout tail.
    line = json.dumps(
        {
            "metric": "headline_suite_total",
            "value": round(sum(mins[n] for n in PERMANENT), 3),
            "unit": "sec",
            "sf": float(sf),
            "reps": REPS,
            "n_queries": len(HEADLINE),
            "shared21_min_sum": round(sum(mins[n] for n in SHARED21), 3),
            "shared21_median_sum": round(sum(medians[n] for n in SHARED21), 3),
            "spotlight_min_sum": round(sum(mins[n] for n in SPOTLIGHT), 3),
            "retry": retry,
            "queries": {_short(n): round(mins[n], 2) for n in HEADLINE},
            "detail": "artifacts/bench_detail.json",
        },
        separators=(",", ":"),
    )
    assert len(line) < 1900, f"final bench line {len(line)}B would overflow tail"
    print(line)


if __name__ == "__main__":
    main()
