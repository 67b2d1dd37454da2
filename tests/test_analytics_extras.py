"""Semantic invariants for the r5 time-series / graph / semantic-dedup
operators — properties the oracle comparison cannot express (it only proves
Spark == DuckDB; these prove both engines compute the *intended* quantity).
"""

from __future__ import annotations

from stream_cdc_gps_spark.registry import all_queries
from tests.conftest import SF_SMOKE

QS = all_queries()


def test_semdedup_ledger_balances(spark):
    """Per-cell members = kept + dropped, every embedding appears in exactly
    one cell, and at least one cell actually deduplicates at the test
    threshold (the screen is exercised, not vacuous)."""
    rows = QS["q167_semdedup"].fn(spark, SF_SMOKE).collect()
    assert all(r["n_members"] == r["n_kept"] + r["n_dropped"] for r in rows)
    from stream_cdc_gps_spark.operators.common import t

    n_emb = t(spark, SF_SMOKE, "embeddings").count()
    assert sum(r["n_members"] for r in rows) == n_emb
    assert any(r["n_dropped"] > 0 for r in rows)
    assert all(r["n_kept"] >= 1 for r in rows if r["n_members"] >= 1)


def test_triangle_count_bounds(spark):
    """3 * triangles <= wedges (every triangle closes exactly 3 wedges), so
    the clustering coefficient lands in [0, 1]; edge/node counts positive."""
    row = QS["q168_triangle_count"].fn(spark, SF_SMOKE).collect()[0]
    assert row["n_nodes"] > 0 and row["n_edges"] > 0
    assert 0.0 <= row["clustering"] <= 1.0
    assert row["n_triangles"] >= 0


def test_acf_within_unit_interval(spark):
    """|acf(k)| <= 1 for every lag (Cauchy-Schwarz on the deviation
    series) and all requested lags are reported."""
    rows = QS["q169_hourly_acf"].fn(spark, SF_SMOKE).collect()
    assert sorted(r["lag"] for r in rows) == [1, 2, 3, 4, 5, 6]
    assert all(-1.0 <= r["acf"] <= 1.0 for r in rows)
    assert all(r["n_hours"] > 24 for r in rows)


def test_cusum_prefix_identity_nonnegative(spark):
    """The prefix-sum formulation must reproduce the clamped recursion's
    invariant: S+ and S- are nonnegative at every step (max(0, .) can never
    go below zero) and alarm agrees with the reported statistics."""
    rows = QS["q170_cusum_changepoint"].fn(spark, SF_SMOKE).collect()
    assert len(rows) >= 28  # a month of days
    for r in rows:
        assert r["cusum_pos"] >= 0.0 and r["cusum_neg"] >= 0.0
        assert r["alarm"] == (r["cusum_pos"] > 4.0 or r["cusum_neg"] > 4.0)


def test_cusum_matches_sequential_recursion(spark):
    """Drive the textbook sequential recursion over the same daily series
    and require the window-based prefix identity to match it exactly —
    the proof the algebraic rewrite is the same detector."""
    from pyspark.sql import functions as F

    from stream_cdc_gps_spark.operators.common import t

    e = t(spark, SF_SMOKE, "events")
    daily = sorted(
        e.groupBy(F.to_date("ts").alias("day")).agg(F.sum("value").alias("x")).collect(),
        key=lambda r: r["day"],
    )
    xs = [r["x"] for r in daily]
    mean = sum(xs) / len(xs)
    var = sum((v - mean) ** 2 for v in xs) / (len(xs) - 1)
    sd = var**0.5
    spos = sneg = 0.0
    expect = {}
    for r in daily:
        z = (r["x"] - mean) / sd
        spos = max(0.0, spos + z - 0.5)
        sneg = max(0.0, sneg - z - 0.5)
        expect[r["day"]] = (spos, sneg)
    got = QS["q170_cusum_changepoint"].fn(spark, SF_SMOKE).collect()
    for r in got:
        ep, en = expect[r["day"]]
        assert abs(r["cusum_pos"] - ep) < 1e-4, r["day"]
        assert abs(r["cusum_neg"] - en) < 1e-4, r["day"]


def test_seasonal_anomalies_exceed_threshold(spark):
    """Every flagged event is a genuine >3-sigma deviation within its
    (event_type, hour) cell, and the screen flags a small minority."""
    from stream_cdc_gps_spark.operators.common import t

    rows = QS["q171_seasonal_anomaly"].fn(spark, SF_SMOKE).collect()
    n_events = t(spark, SF_SMOKE, "events").count()
    assert all(abs(r["z"]) > 2.99 for r in rows)
    assert all(0 <= r["hod"] <= 23 for r in rows)
    assert len(rows) < n_events * 0.05


def test_association_rule_metric_identities(spark):
    """Lift symmetry and metric identities: for a rule pair (a->b, b->a),
    lift must be equal (it is symmetric), confidence(a->b) * P(a) =
    support(a,b), and all metrics positive with confidence <= 1."""
    rows = QS["q172_association_rules"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    lifts = {}
    for r in rows:
        assert r["n_both"] >= 2
        assert 0.0 < r["support"] <= 1.0
        assert 0.0 < r["confidence"] <= 1.0
        assert r["lift"] > 0.0
        lifts[(r["antecedent"], r["consequent"])] = r["lift"]
    for (a, b), lv in lifts.items():
        if (b, a) in lifts:
            assert abs(lifts[(b, a)] - lv) < 1e-9


def test_source_jsd_bounded_and_complete(spark):
    """JSD in bits lives in [0, 1]; every unordered source pair appears
    exactly once (the s1 < s2 join emits the full upper triangle)."""
    rows = QS["q173_source_divergence"].fn(spark, SF_SMOKE).collect()
    from stream_cdc_gps_spark.operators.common import t

    n_src = t(spark, SF_SMOKE, "documents").select("source").distinct().count()
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert 0.0 <= r["jsd_bits"] <= 1.0, r
        assert r["source_a"] < r["source_b"]
        assert r["n_shared"] > 0


def test_twap_is_convex_combination(spark):
    """TWAP is a weighted mean, so it must lie within the day's value
    range; weights must be exercised (twap != mean somewhere)."""
    from pyspark.sql import functions as F

    from stream_cdc_gps_spark.operators.common import t

    got = {
        (r["event_type"], r["day"]): r
        for r in QS["q174_twap"].fn(spark, SF_SMOKE).collect()
    }
    bounds = {
        (r["event_type"], r["day"]): r
        for r in t(spark, SF_SMOKE, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    assert set(got) == set(bounds)
    for k, r in got.items():
        assert bounds[k]["lo"] - 1e-4 <= r["twap"] <= bounds[k]["hi"] + 1e-4
    assert any(abs(r["twap"] - r["mean_value"]) > 1e-4 for r in got.values())


def test_triangle_helper_counts_k4(spark):
    """K4 has exactly 4 triangles and 6 edges; the degree-ordered
    orientation must count each triangle exactly once regardless of the
    (uniform-degree) tie-break path."""
    from stream_cdc_gps_spark.operators.analytics import _orient_count_triangles

    edges = [(u, v) for u in range(1, 5) for v in range(u + 1, 5)]
    pr = spark.createDataFrame(edges, "u long, v long")
    sizes, tri = _orient_count_triangles(pr)
    s, n = sizes.collect()[0], tri.collect()[0]
    assert (s.n_nodes, s.n_edges) == (4, 6)
    assert n.n_tri == 4


def test_triangle_sample_coin_matches_reference_hash(spark):
    """The DOULION edge coin is first-2-md5-bytes("u|v") % 9 == 0 — pin it
    against an independent hashlib computation so the Spark and DuckDB
    idioms can't silently drift from the documented semantics."""
    import hashlib

    from stream_cdc_gps_spark.operators.analytics import (
        _TRI_SAMPLE_MOD,
        _sampled_edges,
    )

    edges = [(u, v) for u in range(50) for v in range(u + 1, 52)]
    pr = spark.createDataFrame(edges, "u long, v long")
    got = sorted((r.u, r.v) for r in _sampled_edges(pr).collect())
    want = sorted(
        (u, v)
        for u, v in edges
        if int(hashlib.md5(f"{u}|{v}".encode()).hexdigest()[:4], 16)
        % _TRI_SAMPLE_MOD
        == 0
    )
    assert got == want and 0 < len(got) < len(edges)


def test_triangle_estimate_scales_sampled_count(spark):
    """est_triangles is exactly n_tri_sampled * 9^3 and the sampled count
    never exceeds the exact count (a subgraph cannot gain triangles)."""
    from stream_cdc_gps_spark.registry import queries

    qs = queries()
    est = qs["q175_triangle_estimate"](spark, SF_SMOKE).collect()[0]
    assert est.est_triangles == est.n_tri_sampled * 9**3
    exact = qs["q168_triangle_count"](spark, SF_SMOKE).collect()[0]
    assert est.n_tri_sampled <= exact.n_triangles


def test_auc_is_probability_and_matches_brute_force(spark):
    """q178's rank-sum AUC equals the brute-force P(score+ > score-) +
    ½P(=) computed pair-by-pair over the smoke corpus, and lands in
    [0, 1]."""
    row = QS["q178_score_auc"].fn(spark, SF_SMOKE).collect()[0]
    assert 0.0 <= row["auc"] <= 1.0
    from stream_cdc_gps_spark.operators.common import t

    ev = t(spark, SF_SMOKE, "events").select("event_type", "value").collect()
    pos = [r["value"] for r in ev if r["event_type"] == "purchase"]
    neg = [r["value"] for r in ev if r["event_type"] != "purchase"]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    brute = wins / (len(pos) * len(neg))
    assert abs(row["auc"] - brute) < 1e-6


def test_k_anonymity_accounts_for_every_record(spark):
    """Group sizes sum to the table's row count; k/l are consistent with
    the at_risk flag definition."""
    rows = QS["q179_k_anonymity"].fn(spark, SF_SMOKE).collect()
    from stream_cdc_gps_spark.operators.analytics import K_ANON_THRESHOLD
    from stream_cdc_gps_spark.operators.common import t

    assert sum(r["group_size"] for r in rows) == t(spark, SF_SMOKE, "customer").count()
    for r in rows:
        assert r["at_risk"] == (
            r["group_size"] < K_ANON_THRESHOLD or r["l_distinct"] < 2
        )
        assert 1 <= r["l_distinct"] <= 2  # sensitive domain is binary


def test_chi2_matches_scipy_free_formula(spark):
    """q180's quantized chi2 equals the textbook Σ(O-E)²/E over the full
    grid (recomputed driver-side from raw counts), and dof = (R-1)(C-1)."""
    row = QS["q180_chi2_independence"].fn(spark, SF_SMOKE).collect()[0]
    from stream_cdc_gps_spark.operators.common import t

    counts = {}
    for r in t(spark, SF_SMOKE, "documents").select("source", "lang").collect():
        counts[(r["source"], r["lang"])] = counts.get((r["source"], r["lang"]), 0) + 1
    sources = sorted({s for s, _ in counts})
    langs = sorted({l for _, l in counts})
    n = sum(counts.values())
    chi2 = 0.0
    for s in sources:
        rt = sum(v for (ss, _), v in counts.items() if ss == s)
        for l in langs:
            ct = sum(v for (_, ll), v in counts.items() if ll == l)
            e = rt * ct / n
            o = counts.get((s, l), 0)
            chi2 += (o - e) ** 2 / e
    assert row["n"] == n
    assert row["dof"] == (len(sources) - 1) * (len(langs) - 1)
    assert abs(row["chi2"] - chi2) < 1e-5
    assert row["chi2"] >= 0


def test_corr_matrix_matches_numpy(spark):
    """q181's one-pass decimal-moment correlations equal numpy's corrcoef
    on the same columns (to the 6-decimal quantization)."""
    import numpy as np

    from stream_cdc_gps_spark.operators.analytics import _CORR_COLS
    from stream_cdc_gps_spark.operators.common import t

    rows = QS["q181_feature_corr_matrix"].fn(spark, SF_SMOKE).collect()
    pdf = t(spark, SF_SMOKE, "lineitem").select(*_CORR_COLS).toPandas()
    m = np.corrcoef(pdf.to_numpy().T)
    idx = {c: i for i, c in enumerate(_CORR_COLS)}
    assert len(rows) == 6
    for r in rows:
        expect = m[idx[r["col_a"]], idx[r["col_b"]]]
        assert abs(r["corr"] - expect) < 1e-5
        assert -1.0 <= r["corr"] <= 1.0


def test_containment_dominates_jaccard(spark):
    """For any candidate pair, containment >= Jaccard (min(|A|,|B|) <=
    |A∪B|), and a true subset pair scores containment 1.0; q182's
    survivors all clear the 0.6 threshold."""
    rows = QS["q182_minhash_containment"].fn(spark, SF_SMOKE).collect()
    assert rows, "smoke corpus must produce at least one containment pair"
    for r in rows:
        assert 0.6 <= r["containment"] <= 1.0
    # cross-check one pair against exact set algebra driver-side
    from stream_cdc_gps_spark.operators.common import t

    texts = {
        r["doc_id"]: r["text"]
        for r in t(spark, SF_SMOKE, "documents").collect()
    }

    def sh3(s):
        toks = s.split(" ")
        return {
            " ".join(toks[i : i + 3])
            for i in range(len(toks) - 2)
            if "" not in toks[i : i + 3]
        }

    r0 = rows[0]
    a, b = sh3(texts[r0["doc_a"]]), sh3(texts[r0["doc_b"]])
    # the engine caps stop-shingles; exact containment is an upper bound
    exact = len(a & b) / min(len(a), len(b))
    assert r0["containment"] <= exact + 1e-9


def test_adc_topk_is_close_to_exact(spark):
    """ADC distance is an approximation of the true L2: for the returned
    top-3 the ADC and exact distances must be positively associated, and
    adc_l2 is the PQ lower-ish estimate — assert both columns present,
    positive, and the mean absolute gap bounded (codebook is 4 centroids,
    so the gap is loose but finite)."""
    rows = QS["q183_pq_adc_topk"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 60  # 20 queries x top-3
    by_q = {}
    for r in rows:
        assert r["adc_l2"] >= 0 and r["exact_l2"] > 0
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 20
    for q, rs in by_q.items():
        assert len(rs) == 3
        # the PQ estimate should track the true distance: for a 4-centroid
        # codebook the top-3 ADC picks must sit well inside the true-L2
        # distribution — bound the worst absolute gap loosely
        for r in rs:
            assert abs(r["adc_l2"] - r["exact_l2"]) < r["exact_l2"] + 1.0


def test_ols_trend_matches_numpy_polyfit(spark):
    """q184's moment-form slope/intercept equal numpy's least-squares fit
    on the same per-day totals; R² in [0, 1]."""
    import numpy as np

    from stream_cdc_gps_spark.operators.common import t

    rows = {r["event_type"]: r for r in QS["q184_group_ols_trend"].fn(spark, SF_SMOKE).collect()}
    ev = t(spark, SF_SMOKE, "events").select("event_type", "ts", "value").collect()
    daily = {}
    for r in ev:
        key = (r["event_type"], r["ts"].date())
        daily[key] = daily.get(key, 0.0) + r["value"]
    by_type = {}
    for (ty, day), y in daily.items():
        by_type.setdefault(ty, []).append(((day - __import__("datetime").date(1970, 1, 1)).days, y))
    for ty, pts in by_type.items():
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        got = rows[ty]
        assert got["n_days"] == len(pts)
        assert abs(got["slope"] - slope) < 1e-4
        assert abs(got["intercept"] - intercept) < max(1e-4, abs(intercept) * 1e-6)
        assert 0.0 <= got["r2"] <= 1.0


def test_attribution_conserves_purchases(spark):
    """Each model's n_purchases sums to the total purchase count, both
    models attribute identical total revenue, and touch types are drawn
    from the non-purchase event domain plus 'none'."""
    from stream_cdc_gps_spark.operators.common import t

    rows = QS["q185_touch_attribution"].fn(spark, SF_SMOKE).collect()
    n_purch = (
        t(spark, SF_SMOKE, "events").filter("event_type = 'purchase'").count()
    )
    for model in ("first", "last"):
        mrows = [r for r in rows if r["model"] == model]
        assert sum(r["n_purchases"] for r in mrows) == n_purch
        for r in mrows:
            assert r["touch_type"] in {"view", "click", "signup", "error", "none"}
    rev = {m: sum(r["revenue"] for r in rows if r["model"] == m) for m in ("first", "last")}
    assert abs(rev["first"] - rev["last"]) < 1e-6


def test_ivfpq_candidates_come_from_probed_cells(spark):
    """Recompute cells/codes driver-side with numpy: every returned
    candidate must live in one of its query's nprobe probed cells, and
    the reported ADC distance must match the LUT arithmetic."""
    import numpy as np

    from stream_cdc_gps_spark.operators.common import t
    from stream_cdc_gps_spark.operators.similarity import (
        _IVFPQ_NPROBE, _PQ_D, _PQ_K, _PQ_M, N_CENTROIDS,
    )

    rows = QS["q186_ivfpq_search"].fn(spark, SF_SMOKE).collect()
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in t(spark, SF_SMOKE, "embeddings").collect()
    }
    cents = {i: emb[i] for i in range(N_CENTROIDS)}

    def ranked_cells(v):
        return sorted(cents, key=lambda c: (-float(v @ cents[c]), -c))

    def code(v, m):
        sub = v[m * _PQ_D : (m + 1) * _PQ_D]
        errs = [
            (float(((sub - emb[k][m * _PQ_D : (m + 1) * _PQ_D]) ** 2).sum()), k)
            for k in range(_PQ_K)
        ]
        return min(errs)[1]

    assert len(rows) == 60
    for r in rows:
        probes = ranked_cells(emb[r["query_id"]])[:_IVFPQ_NPROBE]
        assert ranked_cells(emb[r["candidate_id"]])[0] in probes
        q = emb[r["query_id"]]
        s = 0.0
        for m in range(_PQ_M):
            k = code(emb[r["candidate_id"]], m)
            sub = q[m * _PQ_D : (m + 1) * _PQ_D]
            s += float(((sub - emb[k][m * _PQ_D : (m + 1) * _PQ_D]) ** 2).sum())
        assert abs(r["adc_l2"] - s ** 0.5) < 1e-5


def test_r6_additions_are_run_to_run_deterministic(spark):
    """The r5 advice round was triggered by a run-to-run nondeterminism
    vector (combine-order ulps flipping a rounded value between runs).
    Every r6 addition was designed order-proof — exact half-integer sums
    (q178), integer counts (q179), nano-unit quantized terms (q180),
    exact decimal moments (q181/q184/q185), fixed-order ADC folds
    (q183/q186), capped-bucket inverted index (q182). Pin it: two
    fresh evaluations in the same session must collect identical rows."""
    names = [
        "q178_score_auc",
        "q179_k_anonymity",
        "q180_chi2_independence",
        "q181_feature_corr_matrix",
        "q182_minhash_containment",
        "q183_pq_adc_topk",
        "q184_group_ols_trend",
        "q185_touch_attribution",
        "q186_ivfpq_search",
    ]
    for name in names:
        a = sorted(map(tuple, QS[name].fn(spark, SF_SMOKE).collect()))
        b = sorted(map(tuple, QS[name].fn(spark, SF_SMOKE).collect()))
        assert a == b, f"{name} differs between two identical runs"
