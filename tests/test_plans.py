"""Physical-plan assertions (SURVEY.md §4.2 / 100 TB design contract).

These tests pin the PLAN, not the answer: filters pushed to the scan, columns
pruned, fixed-cardinality dims broadcast, map-only stages shuffle-free. A
regression here means a query silently got 10-100x more expensive at scale
even though its output is still correct.
"""

from __future__ import annotations

from stream_cdc_gps_spark.plans import (
    broadcast_join_count,
    exchange_count,
    plan_string,
    pushed_filters,
    read_schema_columns,
)
from stream_cdc_gps_spark.registry import queries
from tests.conftest import SF_SMOKE

Q = queries()


def test_q01_pushdown_pruning_single_shuffle(spark):
    df = Q["q01_pricing_summary"](spark, SF_SMOKE)
    # shipdate predicate reaches the parquet reader
    assert any("l_shipdate" in f for f in pushed_filters(df))
    # scan reads only the 8 needed columns of lineitem's 11
    (cols,) = read_schema_columns(df, "lineitem")
    assert set(cols) == {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }
    # exactly one shuffle: the 2-key final aggregation
    assert exchange_count(df) == 1


def test_q02_all_predicates_pushed(spark):
    df = Q["q02_filter_predicates"](spark, SF_SMOKE)
    fs = " ".join(pushed_filters(df))
    assert "l_quantity" in fs and "l_returnflag" in fs and "l_discount" in fs
    assert exchange_count(df) == 0  # pure scan+filter+project: map-only


def test_q08_star_join_broadcasts_dims(spark):
    df = Q["q08_regional_revenue"](spark, SF_SMOKE)
    # nation and region must be broadcast (fixed cardinality 25/5)
    assert broadcast_join_count(df) >= 2
    # lineitem scan pruned to join key + measures
    (cols,) = read_schema_columns(df, "lineitem")
    assert set(cols) == {"l_orderkey", "l_extendedprice", "l_discount"}


def _spread_exchange_count(df) -> int:
    """Exchanges added by the gated scan spread (dedup.shingle_arrays_of /
    similarity._spread_scan, r14): explicit REPARTITION_BY_NUM repartitions
    that fire only when the input has fewer partitions than
    defaultParallelism (single-row-group smoke fixture → fires; healthy
    multi-row-group layout → no-op). These are sanctioned; any OTHER
    exchange class appearing beyond a test's pinned count is a regression."""
    import re

    return len(re.findall(r"REPARTITION_BY_NUM", plan_string(df)))


def test_q52_minhash_is_map_only(spark):
    df = Q["q52_minhash_signatures"](spark, SF_SMOKE)
    # the whole signature stage is a map — the only permitted exchange is
    # the gated scan spread (at most one, and it IS the spread)
    spread = _spread_exchange_count(df)
    assert spread <= 1
    assert exchange_count(df) == spread


def test_q54_jaccard_two_exchanges_no_joins(spark):
    df = Q["q54_ngram_jaccard"](spark, SF_SMOKE)
    # sizes ride inside the bucket structs: bucket groupBy + pair groupBy
    # are the only shuffles beyond the gated scan spread, and there is no
    # join anywhere in the plan
    spread = _spread_exchange_count(df)
    assert spread <= 1
    assert exchange_count(df) == 2 + spread
    assert "Join" not in plan_string(df)


def test_q61_ann_broadcasts_query_side(spark):
    df = Q["q61_ann_bucketed_topk"](spark, SF_SMOKE)
    assert broadcast_join_count(df) >= 1


def test_q30_single_shuffle_topk(spark):
    df = Q["q30_topk_per_group"](spark, SF_SMOKE)
    # one shuffle on the window partition key; no global sort anywhere
    assert exchange_count(df) == 1
    assert "Sort [o_custkey" in plan_string(df) or "Sort" in plan_string(df)


def test_q63_ivf_assignment_is_map_only(spark):
    df = Q["q63_ivf_topk"](spark, SF_SMOKE)
    # centroid argmax is a literal-array per-row expression — assignment adds
    # no shuffle; the only exchange left is the per-query top-k window
    assert exchange_count(df) == 1
    assert broadcast_join_count(df) >= 1


def test_q86_snapshot_single_shuffle(spark):
    df = Q["q86_cdc_snapshot_upsert"](spark, SF_SMOKE)
    # changelog -> snapshot is ONE shuffle on the merge key (window partition)
    assert exchange_count(df) == 1


def test_q59_keep_one_broadcasts_drop_list(spark):
    df = Q["q59_dedup_keep_one"](spark, SF_SMOKE)
    # the corpus anti-joins a broadcast drop list — the big side never shuffles
    assert broadcast_join_count(df) >= 1


def test_q09_range_join_is_broadcast_nested_loop(spark):
    df = Q["q09_range_join"](spark, SF_SMOKE)
    plan = plan_string(df)
    assert "BroadcastNestedLoopJoin" in plan  # never a cartesian shuffle
    assert "CartesianProduct" not in plan


def test_multimodal_blob_pipeline_never_shuffles(spark):
    """The multimodal mandate's core scale claim: binary payloads are
    map-only — feature extraction (q81), frame sampling (q82), and resize
    (q102) must show ZERO Exchange nodes in their physical plans (the blob
    is projected away before anything downstream could shuffle it)."""
    from stream_cdc_gps_spark.plans import plan_string
    from stream_cdc_gps_spark.registry import all_queries

    qs = all_queries()
    for name in ("q81_media_features", "q82_media_frames", "q102_media_resize"):
        plan = plan_string(qs[name].fn(spark, SF_SMOKE))
        assert "Exchange" not in plan, f"{name} shuffles the blob pipeline:\n{plan}"


def test_q105_corpus_never_shuffles_on_decontam(spark):
    df = Q["q105_decontamination"](spark, SF_SMOKE)
    # bench shingle set, contaminated set, and the flag join are ALL
    # broadcast — the full corpus scan feeds only map-side semi/left joins
    assert broadcast_join_count(df) >= 3
    p = plan_string(df)
    assert "BroadcastNestedLoop" not in p and "Cartesian" not in p


def test_q109_lateral_decorrelates_to_window_topk(spark):
    df = Q["q109_lateral_topk"](spark, SF_SMOKE)
    p = plan_string(df)
    # the per-row LIMIT must become a rank-based group limit over ONE
    # equi-join, not a nested-loop re-execution of the subquery
    assert "WindowGroupLimit" in p or "Window" in p
    assert "BroadcastNestedLoop" not in p and "Cartesian" not in p
    assert broadcast_join_count(df) >= 1  # nation side broadcast


def test_q111_funnel_single_userkey_exchange(spark):
    df = Q["q111_event_funnel"](spark, SF_SMOKE)
    # one user_id hash exchange shared by all three window passes + the
    # per-user collapse, plus the single-row final aggregate: exactly 2
    assert exchange_count(df) == 2


def test_q113_cms_counter_shuffle_is_sketch_sized(spark):
    df = Q["q113_heavy_hitters_cms"](spark, SF_SMOKE)
    p = plan_string(df)
    # counters and candidates join via broadcast; no nested-loop anywhere
    assert broadcast_join_count(df) >= 1
    assert "BroadcastNestedLoop" not in p and "Cartesian" not in p


def test_q114_scd2_single_keyed_shuffle(spark):
    df = Q["q114_scd2_history"](spark, SF_SMOKE)
    # version, valid_to, is_current all ride ONE user-keyed window sort
    assert exchange_count(df) == 1


def test_q135_time_frame_single_keyed_shuffle(spark):
    df = Q["q135_time_range_frame"](spark, SF_SMOKE)
    # the RANGE frame is a per-partition sweep: one entity-keyed exchange
    assert exchange_count(df) == 1


def test_q134_incremental_merge_no_extra_scans(spark):
    df = Q["q134_incremental_agg"](spark, SF_SMOKE)
    p = plan_string(df)
    # history + delta partials, then the O(groups) merge: two exchanges,
    # and NO join anywhere (merge is a union + re-aggregate)
    assert exchange_count(df) == 2
    assert "Join" not in p


def test_q105_gate_falls_back_to_shuffle_semi_join(spark, monkeypatch):
    """The r3-flagged scale hazard: q105's benchmark shingle set is derived
    from the corpus, so the broadcast must be size-gated. Force the gate
    shut (threshold 0) and assert the SAME dataflow plans as shuffle
    semi/left joins on the shingle key — no broadcast of the bench side, no
    nested-loop anywhere."""
    from stream_cdc_gps_spark.operators import corpus as C

    monkeypatch.setattr(C, "_DECONTAM_BROADCAST_MAX", 0)
    # With the gate shut the FORCED hint is gone; emulate Catalyst also
    # judging the side too big (its stats say "small" at smoke scale) so the
    # plan must genuinely fall back to shuffle joins.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = Q["q105_decontamination"](spark, SF_SMOKE)
        p = plan_string(df)
        assert broadcast_join_count(df) == 0, p
        assert "BroadcastNestedLoop" not in p and "Cartesian" not in p
        gated = {tuple(r) for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    monkeypatch.undo()
    # the dataflow survives: same result as the broadcast path
    open_ = {tuple(r) for r in Q["q105_decontamination"](spark, SF_SMOKE).collect()}
    assert gated == open_


def test_q105_gate_cache_keys_on_corpus_state_not_session(spark, monkeypatch):
    """The broadcast size gate's cache must be keyed on (corpus file state,
    threshold) — NOT the SparkSession (which pinned stopped sessions
    forever) and NOT the bare path (which kept a stale verdict across
    in-place corpus regeneration) — and the second call must be a cache
    hit, not a recount (ADVICE r4)."""
    from stream_cdc_gps_spark.operators import corpus as C

    C._BENCH_GATE_CACHE.clear()
    verdict = C._bench_side_is_small(spark, SF_SMOKE, C._DECONTAM_BROADCAST_MAX)
    assert verdict is True
    (key,) = C._BENCH_GATE_CACHE
    assert key[0] == SF_SMOKE and all(isinstance(p, (str, int)) for p in key)
    # prove the second call never re-plans the count
    monkeypatch.setattr(
        C, "t", lambda *a, **k: (_ for _ in ()).throw(AssertionError("recounted"))
    )
    assert C._bench_side_is_small(spark, SF_SMOKE, C._DECONTAM_BROADCAST_MAX) is True


def test_q149_weighted_sample_is_takeordered_no_global_sort(spark):
    """A-ES weighted sampling must be per-partition top-k + driver merge
    (TakeOrdered), never a materialized global sort of the corpus."""
    df = Q["q149_weighted_sample"](spark, SF_SMOKE)
    p = plan_string(df)
    assert "TakeOrderedAndProject" in p, p
    assert exchange_count(df) == 0, p


def test_q150_leakage_check_broadcasts_component_side(spark):
    """The split-leakage audit joins edge-list-sized component labels to
    the corpus split buckets: the component side broadcasts, the corpus
    side must not shuffle for the join."""
    df = Q["q150_split_leakage_check"](spark, SF_SMOKE)
    assert broadcast_join_count(df) >= 1


def test_q151_centroid_drift_single_pass(spark):
    """128 conditional per-dim means ride ONE aggregation (no explode, no
    join): partial aggregates map-side, a single 1-row exchange."""
    df = Q["q151_split_centroid_drift"](spark, SF_SMOKE)
    assert exchange_count(df) == 1, plan_string(df)
    assert "Join" not in plan_string(df)


def test_q153_cluster_safe_split_broadcasts_labels(spark):
    """Component labels are the tiny (post-LSH) side: they broadcast into
    the corpus left join; the corpus never shuffles for the assignment."""
    df = Q["q153_cluster_safe_split"](spark, SF_SMOKE)
    p = plan_string(df)
    assert broadcast_join_count(df) >= 1
    assert "BroadcastNestedLoop" not in p and "Cartesian" not in p


def test_q156_stop_detection_single_device_shuffle(spark):
    """All three window passes (lag distance, lag flag, cumulative run id)
    and the run aggregation share ONE device-keyed exchange — partitioning
    by device_id already clusters (device_id, run_id) groups."""
    df = Q["q156_stop_detection"](spark, SF_SMOKE)
    assert exchange_count(df) == 1, plan_string(df)


def test_q157_od_matrix_two_keyed_shuffles(spark):
    """Trip windows + endpoint aggregation ride the device-keyed exchange;
    the only other shuffle is the O(cells^2)-key flow aggregation."""
    df = Q["q157_od_matrix"](spark, SF_SMOKE)
    assert exchange_count(df) == 2, plan_string(df)
    assert "Join" not in plan_string(df)


def test_q154_dup_matrix_broadcasts_pairs(spark):
    df = Q["q154_cross_source_dup_matrix"](spark, SF_SMOKE)
    p = plan_string(df)
    assert broadcast_join_count(df) >= 1
    assert "BroadcastNestedLoop" not in p and "Cartesian" not in p


def test_q158_morton_is_map_only(spark):
    """Z-order codes are pure bit arithmetic: the whole query must be one
    codegen stage — zero exchanges, zero joins."""
    df = Q["q158_zorder_morton"](spark, SF_SMOKE)
    p = plan_string(df)
    assert exchange_count(df) == 0, p
    assert "Join" not in p


def test_q159_pq_encoding_is_map_only(spark):
    """PQ encoding against a literal codebook must be pure per-row array
    math: zero exchanges, zero joins (q63's IVF-codebook contract)."""
    df = Q["q159_pq_codes"](spark, SF_SMOKE)
    p = plan_string(df)
    assert exchange_count(df) == 0, p
    assert "Join" not in p


def test_q161_trained_ivf_search_plan_matches_q63(spark):
    """Lloyd training happens at plan-build time (bounded k-row collects);
    the SEARCH plan the query returns must keep q63's shape — map-only
    literal-codebook assignment, broadcast cell join, one top-k exchange."""
    df = Q["q161_ivf_trained_topk"](spark, SF_SMOKE)
    assert exchange_count(df) == 1
    assert broadcast_join_count(df) >= 1


def test_q162_trained_pq_encode_is_map_only(spark):
    """Encoding against the TRAINED literal codebook keeps q159's contract:
    zero exchanges, zero joins in the returned plan."""
    df = Q["q162_pq_trained_codes"](spark, SF_SMOKE)
    p = plan_string(df)
    assert exchange_count(df) == 0, p
    assert "Join" not in p


def test_q163_gps_pipeline_two_exchanges_no_selfjoin(spark):
    """The GPS composition canary must cost NO more shuffles than q157
    alone: one device-keyed sort shared by all window passes + per-trip
    agg, one final flow rollup — and no join anywhere (endpoints ride
    min_by/max_by inside the trip aggregation)."""
    df = Q["q163_gps_pipeline"](spark, SF_SMOKE)
    p = plan_string(df)
    assert exchange_count(df) == 2, p
    assert "Join" not in p


def test_q167_semdedup_single_cell_shuffle(spark):
    """Assignment is map-only literal-codebook argmin (q161's contract), so
    every exchange in the plan is keyed on the cell id (rank window + pair
    self-join + ledger agg reuse that partitioning); no cartesian pair
    expansion anywhere."""
    df = Q["q167_semdedup"](spark, SF_SMOKE)
    p = plan_string(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q168_triangle_joins_are_all_equi(spark):
    """Wedge build and closing-edge check must be hash/sort equi-joins on
    the oriented edge keys — the only BNLJ allowed is the final 1-row
    size/triangle-count combine."""
    import re

    df = Q["q168_triangle_count"](spark, SF_SMOKE)
    p = plan_string(df)
    assert "CartesianProduct" not in p
    # exactly one BNLJ NODE (the formatted plan repeats each node in its
    # detail section, so count numbered tree entries, not substrings)
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)) == 1, p
    assert "SortMergeJoin LeftSemi" in p or "LeftSemi" in p


def test_q170_cusum_collapses_before_windows(spark):
    """The corpus must reduce to the daily series (one keyed aggregate)
    BEFORE any single-partition window pass — the plan contains the
    pre-aggregation under the window, and no join at all."""
    df = Q["q170_cusum_changepoint"](spark, SF_SMOKE)
    p = plan_string(df)
    assert "Join" not in p
    assert "HashAggregate" in p and "Window" in p


def test_q171_seasonal_baseline_is_broadcast(spark):
    """The (type x hour) baseline joins back as a broadcast hash join —
    the corpus side is never shuffled for the join."""
    df = Q["q171_seasonal_anomaly"](spark, SF_SMOKE)
    assert broadcast_join_count(df) >= 1
    p = plan_string(df)
    assert "BroadcastNestedLoopJoin" not in p


def test_q172_rules_topk_is_takeordered(spark):
    """The global top-20 by lift must be TakeOrdered (per-partition heads
    tree-reduced), never a single-partition global sort of all rules."""
    df = Q["q172_association_rules"](spark, SF_SMOKE)
    p = plan_string(df)
    assert "TakeOrderedAndProject" in p, p


def test_q175_sampled_triangle_plan_matches_q168_shape(spark):
    """The estimator must keep q168's plan discipline on the sampled
    subgraph: all equi-joins, the deterministic hash coin applied as a
    plain filter (no extra exchange), one BNLJ node for the final 1-row
    combine."""
    import re

    df = Q["q175_triangle_estimate"](spark, SF_SMOKE)
    p = plan_string(df)
    assert "CartesianProduct" not in p
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)) == 1, p


def test_q177_pairs_snapshot_is_single_aggregate(spark):
    """The incremental index's pairs() snapshot is ONE groupBy over the
    landed collision store — no join, no recompute of signatures."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.dedup_index import IncrementalLshIndex

    tmp = tempfile.mkdtemp(prefix="lsh_plan_")
    try:
        idx = IncrementalLshIndex(spark, tmp)
        docs = spark.createDataFrame(
            [(1, "one two three four"), (2, "one two three four")],
            "doc_id long, text string",
        )
        idx.merge(docs, 0)
        p = plan_string(idx.pairs())
        assert "Join" not in p
        assert "HashAggregate" in p
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_q178_auc_windows_distinct_scores_not_rows(spark):
    """The Mann-Whitney AUC must compress to per-distinct-score counts
    BEFORE any sort/window: the global window runs over |distinct scores|
    rows, so the only row-count-proportional exchange is the score-keyed
    aggregation. Two shuffles total (score agg + the single-partition
    window) plus the final 1-row combine."""
    df = Q["q178_score_auc"](spark, SF_SMOKE)
    p = plan_string(df)
    assert "CartesianProduct" not in p
    # the events scan is pruned to the two needed columns
    (cols,) = read_schema_columns(df, "events")
    assert set(cols) == {"event_type", "value"}


def test_q179_k_anonymity_single_shuffle(spark):
    """One quasi-identifier-keyed exchange; the distinct sensitive count
    partial-aggregates map-side (expand/distinct inside the same key)."""
    df = Q["q179_k_anonymity"](spark, SF_SMOKE)
    (cols,) = read_schema_columns(df, "customer")
    assert set(cols) == {"c_nationkey", "c_mktsegment", "c_acctbal"}
    assert exchange_count(df) <= 2  # groupBy + distinct-expand share the key


def test_q180_chi2_one_corpus_pass_broadcast_grid(spark):
    """The corpus is scanned ONCE (contingency table localCheckpoint-ed;
    its five consumers must not re-scan), the table pass is pruned to the
    two grouping columns, and the grid recombines via broadcast only."""
    from stream_cdc_gps_spark.operators.analytics import chi2_observed

    (cols,) = read_schema_columns(chi2_observed(spark, SF_SMOKE), "documents")
    assert set(cols) == {"source", "lang"}
    df = Q["q180_chi2_independence"](spark, SF_SMOKE)
    p = plan_string(df)
    assert "CartesianProduct" not in p
    assert broadcast_join_count(df) >= 2
    # everything downstream reads the checkpointed table, never parquet
    assert p.count("Scan parquet") == 0


def test_q181_corr_matrix_one_pass_one_row(spark):
    """All 14 moments compute in ONE aggregate over ONE pruned scan; the
    6-row long form explodes from the single moment row (no per-pair
    scans, no joins)."""
    df = Q["q181_feature_corr_matrix"](spark, SF_SMOKE)
    p = plan_string(df)
    assert "Join" not in p
    assert len(read_schema_columns(df)) == 1  # exactly one scan
    (cols,) = read_schema_columns(df, "lineitem")
    assert set(cols) == {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}
    # the single final 1-row combine, plus (at smoke scale only) the gated
    # spread of the single-row-group scan — never more
    assert exchange_count(df) <= 2


def test_q182_containment_two_exchanges_no_joins(spark):
    """Containment rides q54's inverted-index shape: sizes travel with the
    postings, so the measure is a plain expression — zero joins, two
    exchanges (posting buckets + pair aggregation)."""
    df = Q["q182_minhash_containment"](spark, SF_SMOKE)
    p = plan_string(df)
    assert "Join" not in p
    assert exchange_count(df) == 2


def test_q183_adc_scan_reads_codes_not_vectors(spark):
    """The ADC scored frame must be candidates ⋈ broadcast(queries) with
    per-pair work = LUT lookups: one broadcast join for the scoring pass,
    one more for the bounded re-rank; no cartesian, no shuffle of the
    candidate side before top-k."""
    df = Q["q183_pq_adc_topk"](spark, SF_SMOKE)
    p = plan_string(df)
    assert "CartesianProduct" not in p
    assert broadcast_join_count(df) >= 1


def test_q184_ols_two_keyed_aggregates_no_joins(spark):
    """Daily totals then per-type moments: two exchanges, no joins, scan
    pruned to the three needed event columns."""
    df = Q["q184_group_ols_trend"](spark, SF_SMOKE)
    p = plan_string(df)
    assert "Join" not in p
    assert exchange_count(df) == 2
    (cols,) = read_schema_columns(df, "events")
    assert set(cols) == {"event_type", "ts", "value"}


def test_q185_attribution_single_user_window_pass(spark):
    """Both touch models ride ONE user-keyed window sort (running struct
    extremes) — no purchase×history join anywhere in the engine plan."""
    df = Q["q185_touch_attribution"](spark, SF_SMOKE)
    p = plan_string(df)
    assert "Join" not in p
    assert p.count("Window") >= 1
    assert exchange_count(df) == 2  # user-keyed window + final (model, touch) agg


def test_q186_ivfpq_cell_join_is_broadcast_hash(spark):
    """The candidate meet must be an EQUI join on cell id with the tiny
    probe side broadcast — BroadcastHashJoin, not a nested loop: the
    inverted file is what prunes the base scan, so a BNLJ here would mean
    the pruning silently degraded to a full cross."""
    df = Q["q186_ivfpq_search"](spark, SF_SMOKE)
    p = plan_string(df)
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_q187_trained_ivfadc_cell_join_is_broadcast_hash(spark):
    """q186's contract must survive the trained-codebook composition: the
    candidate meet stays an EQUI join on cell id with the broadcast probe
    side — training changes the literals, never the plan."""
    df = Q["q187_ivfpq_trained_search"](spark, SF_SMOKE)
    p = plan_string(df)
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_q190_store_search_plan_matches_live_encode(spark, tmp_path):
    """Searching the incremental index's STORE keeps the same contract as
    searching a live encode: equi cell join, broadcast probes, and the
    base side arriving from a parquet scan (the store), not a recompute.
    Asserted on the search frame itself — the registered query returns a
    localCheckpoint (its state dir is temporary), which hides the plan."""
    from pyspark.sql import functions as F

    from stream_cdc_gps_spark.operators.similarity import _ivfadc_query
    from stream_cdc_gps_spark.streaming.vector_index import IncrementalVectorIndex

    dim, sub = 64, 16
    vecs = [
        (i, [float((i * 3 + j) % 9) for j in range(dim)]) for i in range(8)
    ]
    e = spark.createDataFrame(vecs, "vec_id long, emb array<double>")
    cents = [(cid, v) for cid, v in vecs[:2]]
    cbs = {
        m: [(cid, v[m * sub : (m + 1) * sub]) for cid, v in vecs[:3]]
        for m in range(4)
    }
    idx = IncrementalVectorIndex(spark, str(tmp_path / "vix"), cents, cbs)
    idx.merge(e, 0)
    qv = e.filter(F.col("vec_id") < 2)
    p = plan_string(_ivfadc_query(idx.base_table(), qv, cents, cbs))
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "Scan parquet" in p  # the base side IS the store, not a recompute


def test_cdc_view_delta_terms_are_equi_joins(spark, tmp_path):
    """q194/q196/q197's 100 TB contract: every delta-maintenance term is
    a KEY-EQUI join (hash-joinable, partition-prunable at scale) — no
    cartesian product, no non-equi join condition anywhere in the merge
    plan, and the per-batch work never re-joins history against history
    (both delta sides derive from the micro-batch, state enters only as
    one equi side per term)."""
    from stream_cdc_gps_spark.streaming.join_view import (
        CdcJoinView,
        cdc_delta,
        cdc_state,
    )

    a_schema = "op string, seq long, oid long, k long, a_val string"
    b_schema = "op string, seq long, k long, b_name string"
    view = CdcJoinView(
        spark, str(tmp_path / "jv"), key="k", a_pk="oid", b_pk="k"
    )
    view.merge(
        spark.createDataFrame([("c", 1, 10, 1, "a")], a_schema),
        spark.createDataFrame([("c", 1, 1, "Alice")], b_schema),
        0,
    )
    a1 = spark.createDataFrame([("u", 10, 10, 2, "a2")], a_schema)
    b1 = spark.createDataFrame([("d", 10, 1, "Alice")], b_schema)
    a_old = cdc_state(view.a_store, 1, "oid")
    b_old = cdc_state(view.b_store, 1, "k")
    da = cdc_delta(a1.localCheckpoint(), a_old, "oid", "_wa")
    db = cdc_delta(b1.localCheckpoint(), b_old, "k", "_wb")
    p = plan_string(view._view_delta(da, db, a_old, b_old))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # all three bilinear terms survive into the plan as joins
    assert p.count("Join") >= 3


def test_q192_mixture_rates_broadcast_corpus_map_only(spark):
    """The rate table must broadcast onto the corpus pass (equi join on
    source, no corpus-side shuffle before membership). Shuffle-exchange
    budget: exactly FIVE — the rates subtree (source-keyed token aggregate
    + the 1-row total window's SinglePartition exchange) is instantiated
    twice in the initial plan (once feeding the output, once inside the
    kept branch; AQE reuses it at runtime), plus the kept-side partial
    agg. Every one of them moves O(sources) aggregated rows, never corpus
    rows — a sixth exchange would mean the corpus itself started
    shuffling."""
    df = Q["q192_mixture_materialize"](spark, SF_SMOKE)
    p = plan_string(df)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert exchange_count(df) == 5, p


def test_cdc_two_level_views_stay_equi(spark, tmp_path):
    """q199/q200's 100 TB contract: the level-2 reads — the support meet
    deciding distinct-count transitions, and the touched-key net support
    feeding the top-k rerank — reach the support store through KEY-EQUI
    joins only (hash-joinable, partition-prunable); no cartesian product
    or nested-loop join anywhere in either derivation."""
    from stream_cdc_gps_spark.streaming.join_view import (
        CdcDistinctCountView,
        CdcTopKView,
        cdc_state,
        cdc_support_delta,
    )

    schema = "op string, seq long, oid long, k long, v string"
    dv = CdcDistinctCountView(
        spark, str(tmp_path / "d"), key="k", pk="oid", val="v"
    )
    tv = CdcTopKView(spark, str(tmp_path / "t"), key="k", pk="oid", val="v", k=2)
    b0 = spark.createDataFrame(
        [("c", 1, 10, 1, "a"), ("c", 2, 11, 2, "b")], schema
    )
    dv.merge(b0, 0)
    tv.merge(b0, 0)
    b1 = spark.createDataFrame([("u", 10, 10, 1, "b")], schema).localCheckpoint()
    ds = cdc_support_delta(
        b1, cdc_state(dv.a_store, 1, "oid"), "oid", "k", "v"
    ).localCheckpoint()
    p1 = plan_string(dv._transitions(ds, dv.s_store.rows_before(1)))
    touched = ds.select("k").distinct().localCheckpoint()
    p2 = plan_string(tv._topk(ds, touched, tv.s_store.rows_before(1)))
    for p in (p1, p2):
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "Join" in p  # the support store genuinely enters the plan


def test_runtime_bloom_filter_semi_reduces_fact_scan(spark):
    """100 TB runtime-filter story: when a selective dim filter feeds a
    SHUFFLE join, Catalyst injects a bloom filter built from the dim keys
    as a pre-shuffle predicate on the fact side (might_contain over
    xxhash64) — the fact scan is semi-reduced before any data moves. The
    thresholds are sized for clusters, so the test pins the MECHANISM by
    lowering them in-session; broadcast is disabled because a broadcast
    join already beats a runtime filter (and suppresses it)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .count()
        )
        p = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in p, "runtime bloom filter was not injected"
        assert "bloom_filter_agg" in p
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
