"""Property-based tests (hypothesis) — SURVEY.md §5 robustness model.

Two layers: pure-Python helpers fuzzed hard (hundreds of examples, no JVM),
and one Spark-level property (as-of join vs brute force) over a handful of
generated datasets (each example is a full Spark job, so examples are few
and the generator keeps keys/timestamps small)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from stream_cdc_gps_spark.sources.pysource import parse_gps_line


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_parse_gps_line_never_raises(s):
    """Arbitrary junk lines must route to corrupt, never crash the scan."""
    out = parse_gps_line(s)
    assert len(out) == 7
    # either a fully-parsed row (corrupt None) or the verbatim line routed
    assert out[6] is None or out[6] == s


@given(
    dev=st.text(min_size=1, max_size=10),
    ts=st.text(min_size=1, max_size=30),
    lat=st.floats(allow_nan=False, allow_infinity=False, width=32),
    lon=st.floats(allow_nan=False, allow_infinity=False, width=32),
)
@settings(max_examples=200, deadline=None)
def test_parse_gps_line_roundtrips_valid_payloads(dev, ts, lat, lon):
    line = json.dumps(
        {
            "location": {
                "timestamp": ts,
                "coords": {"latitude": lat, "longitude": lon},
            },
            "device_id": dev,
        }
    )
    out = parse_gps_line(line)
    assert out[6] is None
    assert out[0] == dev and out[1] == ts
    assert out[2] == float(lat) and out[3] == float(lon)
    # absent optional fields default, not null
    assert out[4] == 0.0 and out[5] == 0.0


# Spark-level property: asof_join == brute-force latest-at-or-before.
_asof_examples = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # key
        st.integers(min_value=0, max_value=20),  # ts
        st.booleans(),                            # side: right (quote) if True
    ),
    min_size=1,
    max_size=25,
)


@given(rows=_asof_examples)
@settings(max_examples=5, deadline=None)
def test_asof_join_matches_bruteforce(spark, rows):
    from stream_cdc_gps_spark.operators.asof import asof_join

    lefts = [(k, t) for (k, t, is_r) in rows if not is_r]
    rights = {}
    for k, t, is_r in rows:
        if is_r:
            # unique per (key, ts): keep max value like q34's pre-aggregate
            rights[(k, t)] = max(rights.get((k, t), float(-t)), float(t * 10))
    if not lefts:
        lefts = [(0, 0)]
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)], "id long, k long, ts long"
    )
    right = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rights.items()] or [(99, -1, 0.0)],
        "k long, ts long, v double",
    )
    got = {
        r.id: r.v
        for r in asof_join(left, right, on="k", ts="ts", value_cols=["v"]).collect()
    }
    for i, (k, t) in enumerate(lefts):
        cand = [(rt, v) for (rk, rt), v in rights.items() if rk == k and rt <= t]
        expect = max(cand)[1] if cand else None
        assert got[i] == expect, (i, k, t, cand, got[i])


# Spark-level property: Mann-Whitney AUC == brute-force pair counting, and
# AUC is invariant under any strictly-increasing score transform.
_auc_examples = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),  # quantized score (forces ties)
        st.booleans(),                           # label
    ),
    min_size=2,
    max_size=40,
).filter(lambda rows: any(p for _, p in rows) and any(not p for _, p in rows))


@given(rows=_auc_examples)
@settings(max_examples=12, deadline=None)
def test_auc_matches_brute_force_and_is_monotone_invariant(spark, rows):
    from stream_cdc_gps_spark.operators.analytics import auc_mann_whitney

    df = spark.createDataFrame(
        [(float(s), int(p)) for s, p in rows], "score double, pos int"
    )
    got = auc_mann_whitney(df).collect()[0]
    pos = [s for s, p in rows if p]
    neg = [s for s, p in rows if not p]
    brute = sum((a > b) + 0.5 * (a == b) for a in pos for b in neg) / (
        len(pos) * len(neg)
    )
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert abs(got["auc"] - brute) < 1e-6

    # strictly-increasing transform (2s + 1, and an exp-shaped one) must not
    # move a rank statistic
    for f in (lambda s: 2.0 * s + 1.0, lambda s: float(2.0**s)):
        df2 = spark.createDataFrame(
            [(f(s), int(p)) for s, p in rows], "score double, pos int"
        )
        got2 = auc_mann_whitney(df2).collect()[0]
        assert abs(got2["auc"] - got["auc"]) < 1e-9


# Spark-level property: inverted-index containment == brute-force set
# containment when the posting cap is out of the way.
_corpus_examples = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
        min_size=3,
        max_size=8,
    ),
    min_size=2,
    max_size=6,
)


@given(texts=_corpus_examples)
@settings(max_examples=10, deadline=None)
def test_containment_matches_brute_force_sets(spark, texts):
    from stream_cdc_gps_spark.operators.dedup import containment_pairs_of

    docs = [(i, " ".join(toks)) for i, toks in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs_of(df, threshold=0.0, max_posting=10**6).collect()
    }

    def sh3(s):
        toks = s.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for i, ta in docs:
        for j, tb in docs:
            if i >= j:
                continue
            a, b = sh3(ta), sh3(tb)
            inter = len(a & b)
            if inter == 0:
                assert (i, j) not in got  # no shared shingle -> no candidate
                continue
            expect = inter / min(len(a), len(b))
            assert (i, j) in got
            assert abs(got[(i, j)] - expect) < 5e-4  # round(.,4) in-engine


# Spark-level property: the grid chi-square == pure-Python Σ(O-E)²/E over
# generated contingency tables, zero-observed cells included.
_chi2_examples = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # row attr
        st.integers(min_value=0, max_value=2),    # col attr
        st.integers(min_value=1, max_value=30),   # observed count
    ),
    min_size=2,
    max_size=9,
    unique_by=lambda t: (t[0], t[1]),
).filter(
    lambda cells: len({r for r, _, _ in cells}) >= 2
    and len({c for _, c, _ in cells}) >= 2
)


@given(cells=_chi2_examples)
@settings(max_examples=10, deadline=None)
def test_chi2_matches_pure_python_on_generated_tables(spark, cells):
    from stream_cdc_gps_spark.operators.analytics import chi2_from_observed

    obs = spark.createDataFrame(
        [(f"r{r}", f"c{c}", n) for r, c, n in cells], "src string, dst string, o long"
    )
    got = chi2_from_observed(obs, "src", "dst").collect()[0]

    counts = {(f"r{r}", f"c{c}"): n for r, c, n in cells}
    rows = sorted({k for k, _ in counts})
    cols = sorted({k for _, k in counts})
    n = sum(counts.values())
    chi2 = 0.0
    for r in rows:
        rt = sum(v for (rr, _), v in counts.items() if rr == r)
        for c in cols:
            ct = sum(v for (_, cc), v in counts.items() if cc == c)
            e = rt * ct / n
            o = counts.get((r, c), 0)
            chi2 += (o - e) ** 2 / e
    assert got["n"] == n
    assert got["dof"] == (len(rows) - 1) * (len(cols) - 1)
    assert abs(got["chi2"] - chi2) < 1e-5


# Spark-level property: moment-form OLS == numpy least squares on generated
# per-key daily series; single-point keys are dropped, never NaN.
_ols_examples = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # key
        st.integers(min_value=0, max_value=40),     # x (day index)
        st.integers(min_value=-10000, max_value=10000),  # y in centi-units
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: (t[0], t[1]),
)


@given(rows=_ols_examples)
@settings(max_examples=10, deadline=None)
def test_ols_trend_matches_numpy_on_generated_series(spark, rows):
    import numpy as np

    from stream_cdc_gps_spark.operators.analytics import ols_trend_from_daily

    daily = spark.createDataFrame(
        [(f"k{k}", x, y / 100.0) for k, x, y in rows],
        "k string, x int, y double",
    ).selectExpr("k", "x", "CAST(y AS DECIMAL(18,6)) AS y")
    got = {r["k"]: r for r in ols_trend_from_daily(daily, "k").collect()}

    by_key = {}
    for k, x, y in rows:
        by_key.setdefault(f"k{k}", []).append((x, y / 100.0))
    for k, pts in by_key.items():
        if len(pts) < 2:
            assert k not in got  # degenerate series dropped, never NaN
            continue
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        # vertical series (all same y) are fine; R² may be 0/0 only when
        # y-variance is zero AND slope is zero — then r2 is NaN on both
        # paths; hypothesis will find it, so guard the comparison
        slope, intercept = np.polyfit(xs, ys, 1)
        r = got[k]
        assert r["n_days"] == len(pts)
        assert abs(r["slope"] - slope) < 1e-4
        assert abs(r["intercept"] - intercept) < max(1e-4, abs(intercept) * 1e-6)
        yvar = float(((ys - ys.mean()) ** 2).sum())
        if yvar > 1e-12:
            assert r["r2"] is not None and -1e-9 <= r["r2"] <= 1.0 + 1e-9


# Spark-level property: windowed first/last-touch attribution == brute
# force, with duplicate timestamps generated on purpose to hammer the
# (ts, event_id) tie-break.
_attr_examples = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),   # user
        st.integers(min_value=0, max_value=4),   # COARSE ts second (forces ties)
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=1,
    max_size=14,
)


@given(rows=_attr_examples)
@settings(max_examples=10, deadline=None)
def test_touch_attribution_matches_brute_force(spark, rows):
    import datetime as dt

    from stream_cdc_gps_spark.operators.analytics import touch_attribution_of

    events = [
        (i, u, dt.datetime(2024, 1, 1, 0, 0, s), ty, 1.0)
        for i, (u, s, ty) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        events, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    got = {
        (r["model"], r["touch_type"]): r["n_purchases"]
        for r in touch_attribution_of(df).collect()
    }

    expect: dict = {}
    for i, u, ts, ty, _v in events:
        if ty != "purchase":
            continue
        prior = [
            (pts, pi, pty)
            for pi, pu, pts, pty, _ in events
            if pu == u and pty != "purchase" and (pts, pi) < (ts, i)
        ]
        ft = min(prior)[2] if prior else "none"
        lt = max(prior)[2] if prior else "none"
        expect[("first", ft)] = expect.get(("first", ft), 0) + 1
        expect[("last", lt)] = expect.get(("last", lt), 0) + 1
    assert got == expect


# Incremental LSH vs batch on GENERATED corpora + arrival orders (r6 judge
# task #5): the fixed-corpus parity checks (q177, test_streaming) exercise
# the cap-crossing retraction only on the slices the corpus happens to
# produce; here hypothesis draws tiny corpora from a 3-text pool so shared
# buckets routinely cross a deliberately low cap (max_posting=2), in every
# split position — including empty first/second batches.
_LSH_TEXT_POOL = [
    "alpha beta gamma delta epsilon",
    "alpha beta gamma delta zeta",
    "one two three four five six",
]

_lsh_examples = st.tuples(
    st.lists(st.integers(min_value=0, max_value=2), min_size=2, max_size=9),
    st.integers(min_value=0, max_value=9),  # split point (mod corpus size)
)


@given(ex=_lsh_examples)
@settings(max_examples=6, deadline=None)
def test_incremental_lsh_retraction_matches_batch_on_generated(spark, ex):
    """incremental(2-batch arrival) == all-at-once batch under the SAME
    cap, retraction included, for generated corpora and split points."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from stream_cdc_gps_spark.operators.dedup import (
        band_tuples_of,
        bucket_pair_expand,
    )
    from stream_cdc_gps_spark.streaming.dedup_index import IncrementalLshIndex

    choices, split_raw = ex
    docs = [(i, _LSH_TEXT_POOL[c]) for i, c in enumerate(choices)]
    split = split_raw % (len(docs) + 1)
    schema = "doc_id long, text string"
    cap = 2

    buckets = (
        band_tuples_of(spark.createDataFrame(docs, schema))
        .groupBy("band", "band_key")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= cap))
    )
    golden = sorted(
        (r.doc_a, r.doc_b, r.n_shared_bands)
        for r in bucket_pair_expand(buckets)
        .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        .collect()
    )

    base = tempfile.mkdtemp(prefix="lsh_prop_")
    try:
        idx = IncrementalLshIndex(spark, base, max_posting=cap, n_state_buckets=8)
        idx.merge(spark.createDataFrame(docs[:split], schema), 0)
        idx.merge(spark.createDataFrame(docs[split:], schema), 1)
        got = sorted(
            (r.doc_a, r.doc_b, r.n_shared_bands) for r in idx.pairs().collect()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    assert got == golden


def test_chi2_survives_terms_past_int64_nano_units(spark):
    """r6 ADVICE: the old single-floor nano-unit quantization saturated
    int64 once one (O−E)²/E term passed ~9.2e9 — exactly the magnitude a
    100 TB corpus produces. A 2×2 table with billions-scale skew drives a
    term to ~2e10; the split-floor DECIMAL(38,0) path must stay within
    1e-4 relative of the pure-Python statistic instead of clamping."""
    from stream_cdc_gps_spark.operators.analytics import chi2_from_observed

    cells = [
        ("a", "x", 10_000_000_000),
        ("a", "y", 1_000),
        ("b", "x", 1_000),
        ("b", "y", 10_000_000_000),
    ]
    obs = spark.createDataFrame(cells, "src string, dst string, o long")
    got = chi2_from_observed(obs, "src", "dst").collect()[0]

    counts = dict((((r, c), n) for r, c, n in cells))
    n = sum(counts.values())
    chi2 = 0.0
    for r in ("a", "b"):
        rt = sum(v for (rr, _), v in counts.items() if rr == r)
        for c in ("x", "y"):
            ct = sum(v for (_, cc), v in counts.items() if cc == c)
            e = rt * ct / n
            o = counts[(r, c)]
            chi2 += (o - e) ** 2 / e
    assert chi2 > 9.2e9  # the statistic itself is past the old int64 cliff
    assert abs(got["chi2"] - chi2) / chi2 < 1e-4


# The hardened partial store (streaming/partial_store.py) under GENERATED
# op sequences: batches, replays of the last delivered batch (the crash
# re-delivery Structured Streaming actually performs), and compactions, in
# every interleaving — including the r6-advice killer, replay of a batch
# that compaction already folded. The snapshot must always equal the
# aggregate of each batch counted exactly once.
_store_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("batch"),
            st.lists(st.integers(min_value=0, max_value=5), max_size=4),
        ),
        st.tuples(st.just("replay"), st.none()),
        st.tuples(st.just("compact"), st.none()),
    ),
    min_size=1,
    max_size=6,
)


@given(ops=_store_ops)
@settings(max_examples=5, deadline=None)
def test_rollup_store_exactly_once_under_generated_op_sequences(spark, ops):
    """snapshot == batch-golden after any interleaving of merge / replay /
    compact, empty batches included."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.rollup_index import IncrementalRollup

    base = tempfile.mkdtemp(prefix="rollup_prop_")
    schema = "k string, v double"
    try:
        ru = IncrementalRollup(spark, base, "k", "v")
        landed: list[tuple[str, float]] = []
        last: tuple[int, list[tuple[str, float]]] | None = None
        bid = 0
        for op, payload in ops:
            if op == "batch":
                rows = [("a" if x % 2 == 0 else "b", float(x)) for x in payload]
                ru.merge(spark.createDataFrame(rows, schema), bid)
                landed += rows
                last = (bid, rows)
                bid += 1
            elif op == "replay" and last is not None:
                b, rows = last
                ru.merge(spark.createDataFrame(rows, schema), b)
            elif op == "compact":
                ru.compact()
        if not landed:
            return
        got = {
            (r["k"], r["n_rows"], r["total"], r["min_value"], r["max_value"])
            for r in ru.snapshot().collect()
        }
        exp: dict[str, list] = {}
        for k, v in landed:
            e = exp.setdefault(k, [0, 0.0, None, None])
            e[0] += 1
            e[1] += v
            e[2] = v if e[2] is None else min(e[2], v)
            e[3] = v if e[3] is None else max(e[3], v)
        expect = {(k, e[0], e[1], e[2], e[3]) for k, e in exp.items()}
        assert got == expect
    finally:
        shutil.rmtree(base, ignore_errors=True)


# CDC Z-set views under GENERATED changelogs: op sequences (c/u/d with
# colliding pks, key-moving updates, deletes of unseen pks, delete-then-
# recreate) on BOTH inputs, split at a generated point into two lock-step
# micro-batches. Golden state is replayed in plain Python (dict upsert),
# so the property is "weighted delta maintenance == last-writer-wins
# replay", for the JOIN view and the AGGREGATE view in one example.
_cdc_ops_a = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # 0=c 1=u 2=d
        st.integers(min_value=0, max_value=3),  # pk (oid)
        st.integers(min_value=0, max_value=2),  # join key
        st.integers(min_value=0, max_value=99),  # value in cents
    ),
    max_size=8,
)
_cdc_ops_b = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # 0=c 1=u 2=d
        st.integers(min_value=0, max_value=2),  # pk == join key
        st.integers(min_value=0, max_value=2),  # name choice
    ),
    max_size=6,
)
_cdc_examples = st.tuples(
    _cdc_ops_a, _cdc_ops_b, st.integers(min_value=0, max_value=9)
)


@given(ex=_cdc_examples)
@settings(max_examples=5, deadline=None)
def test_cdc_views_match_python_replay_on_generated(spark, ex):
    import shutil
    import tempfile
    from decimal import Decimal

    from stream_cdc_gps_spark.streaming.join_view import (
        CdcAggregateView,
        CdcDistinctCountView,
        CdcJoinView,
        CdcLeftJoinView,
        CdcMinMaxView,
        CdcTopKView,
        CdcViewSuite,
    )

    ops_a, ops_b, split_raw = ex
    opname = {0: "c", 1: "u", 2: "d"}
    a_rows = [
        (opname[t], i, pk, k, Decimal(v) / 100)
        for i, (t, pk, k, v) in enumerate(ops_a)
    ]
    b_rows = [
        (opname[t], i, bk, f"name{n}") for i, (t, bk, n) in enumerate(ops_b)
    ]
    sa = split_raw % (len(a_rows) + 1)
    sb = split_raw % (len(b_rows) + 1)

    # golden: last-writer-wins replay in plain Python
    a_state: dict[int, tuple[int, Decimal]] = {}
    for t, pk, k, v in ops_a:
        if t == 2:
            a_state.pop(pk, None)
        else:
            a_state[pk] = (k, Decimal(v) / 100)
    b_state: dict[int, str] = {}
    for t, bk, n in ops_b:
        if t == 2:
            b_state.pop(bk, None)
        else:
            b_state[bk] = f"name{n}"
    join_golden = sorted(
        (pk, k, v, b_state[k]) for pk, (k, v) in a_state.items() if k in b_state
    )
    lj_golden = sorted(
        (pk, k, v, b_state.get(k)) for pk, (k, v) in a_state.items()
    )
    agg: dict[int, list] = {}
    for pk, (k, v) in a_state.items():
        e = agg.setdefault(k, [0, Decimal(0)])
        e[0] += 1
        e[1] += v
    agg_golden = sorted((k, e[0], e[1]) for k, e in agg.items())
    mm: dict[int, list] = {}
    for pk, (k, v) in a_state.items():
        e = mm.setdefault(k, [0, None, None])
        e[0] += 1
        e[1] = v if e[1] is None else min(e[1], v)
        e[2] = v if e[2] is None else max(e[2], v)
    mm_golden = sorted((k, e[0], e[1], e[2]) for k, e in mm.items())
    dc: dict[int, set] = {}
    for pk, (k, v) in a_state.items():
        dc.setdefault(k, set()).add(v)
    dc_golden = sorted((k, len(s)) for k, s in dc.items())
    cnt: dict[tuple, int] = {}
    for pk, (k, v) in a_state.items():
        cnt[(k, v)] = cnt.get((k, v), 0) + 1
    by_key: dict[int, list] = {}
    for (k, v), n in cnt.items():
        by_key.setdefault(k, []).append((v, n))
    tk_golden = sorted(
        (k, v, n)
        for k, vs in by_key.items()
        for v, n in sorted(vs, key=lambda t: (-t[1], t[0]))[:2]
    )

    a_schema = "op string, seq long, oid long, k long, v decimal(18,2)"
    b_schema = "op string, seq long, k long, b_name string"
    base = tempfile.mkdtemp(prefix="cdc_prop_")
    try:
        jv = CdcJoinView(spark, f"{base}/j", key="k", a_pk="oid", b_pk="k")
        av = CdcAggregateView(spark, f"{base}/g", key="k", pk="oid", val="v")
        mv = CdcMinMaxView(spark, f"{base}/m", key="k", pk="oid", val="v")
        lv = CdcLeftJoinView(spark, f"{base}/l", key="k", a_pk="oid", b_pk="k")
        dv = CdcDistinctCountView(spark, f"{base}/d", key="k", pk="oid", val="v")
        tv = CdcTopKView(spark, f"{base}/t", key="k", pk="oid", val="v", k=2)
        # the composed suite over the SAME generated script: its members
        # (shared changelog/support stores) must match the standalone
        # views — catches shared-state divergence the unit test's one
        # handcrafted script could miss. num_val == cat_val == v is
        # legal: distinct/topk just run over the numeric column.
        sv = CdcViewSuite(
            spark, f"{base}/sv", key="k", a_pk="oid", b_pk="k",
            num_val="v", cat_val="v",
        )
        for bid, (alo, ahi, blo, bhi) in enumerate(
            [(0, sa, 0, sb), (sa, len(a_rows), sb, len(b_rows))]
        ):
            jv.merge(
                spark.createDataFrame(a_rows[alo:ahi], a_schema),
                spark.createDataFrame(b_rows[blo:bhi], b_schema),
                bid,
            )
            av.merge(spark.createDataFrame(a_rows[alo:ahi], a_schema), bid)
            mv.merge(spark.createDataFrame(a_rows[alo:ahi], a_schema), bid)
            dv.merge(spark.createDataFrame(a_rows[alo:ahi], a_schema), bid)
            tv.merge(spark.createDataFrame(a_rows[alo:ahi], a_schema), bid)
            sv.merge(
                spark.createDataFrame(a_rows[alo:ahi], a_schema),
                spark.createDataFrame(b_rows[blo:bhi], b_schema),
                bid,
            )
            lv.merge(
                spark.createDataFrame(a_rows[alo:ahi], a_schema),
                spark.createDataFrame(b_rows[blo:bhi], b_schema),
                bid,
            )
        try:
            got_join = sorted(
                (r.oid, r.k, r.v, r.b_name)
                for r in jv.snapshot().select("oid", "k", "v", "b_name").collect()
            )
        except ValueError:
            got_join = []  # nothing ever landed a view delta
        assert got_join == join_golden
        try:
            got_agg = sorted(
                (r.k, r.n, r.total) for r in av.snapshot().collect()
            )
        except ValueError:
            got_agg = []
        assert got_agg == agg_golden
        try:
            got_mm = sorted(
                (r.k, r.n, r.vmin, r.vmax) for r in mv.snapshot().collect()
            )
        except ValueError:
            got_mm = []
        assert got_mm == mm_golden
        try:
            got_lj = sorted(
                (r.oid, r.k, r.v, r.b_name)
                for r in lv.snapshot().select("oid", "k", "v", "b_name").collect()
            )
        except ValueError:
            got_lj = []
        assert got_lj == lj_golden
        try:
            got_dc = sorted(
                (r.k, r.n_distinct) for r in dv.snapshot().collect()
            )
        except ValueError:
            got_dc = []
        assert got_dc == dc_golden
        try:
            got_tk = sorted((r.k, r.v, r.n) for r in tv.snapshot().collect())
        except ValueError:
            got_tk = []
        assert got_tk == tk_golden
        # the suite's members (shared stores) match the standalone views
        def member(view, cols):
            try:
                return sorted(
                    map(tuple, view.snapshot().select(*cols).collect())
                )
            except ValueError:
                return []

        assert member(sv.join, ["oid", "k", "v", "b_name"]) == join_golden
        assert member(sv.left, ["oid", "k", "v", "b_name"]) == lj_golden
        assert member(sv.agg, ["k", "n", "total"]) == agg_golden
        assert member(sv.minmax, ["k", "n", "vmin", "vmax"]) == mm_golden
        assert member(sv.distinct, ["k", "n_distinct"]) == dc_golden
        assert member(sv.topk, ["k", "v", "n"]) == tk_golden
    finally:
        shutil.rmtree(base, ignore_errors=True)


# The quantile sketch under GENERATED value multisets (ties, skew, tiny
# keys) and split points: after any 2-batch arrival the merged summary's
# p50/p90 estimates must satisfy the tie-aware rank interval the q202
# ship-gate checks (within 3n/C of the target), and an identical rebuild
# must land an identical summary (the DECIMAL order-proof claim).
_quantile_examples = st.tuples(
    st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=40),
    st.integers(min_value=0, max_value=39),  # split point (mod n+1)
)


@given(ex=_quantile_examples)
@settings(max_examples=6, deadline=None)
def test_quantile_sketch_rank_bound_on_generated(spark, ex):
    import math
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.quantile_index import (
        N_STRATA,
        IncrementalQuantileSketch,
    )

    choices, split_raw = ex
    # map the small generated alphabet to a spread-out, tie-heavy domain
    vals = [c * c * 7 for c in choices]
    split = split_raw % (len(vals) + 1)
    rows = [("k", v) for v in vals]
    schema = "k string, v long"

    def build(base):
        idx = IncrementalQuantileSketch(spark, base)
        idx.merge(spark.createDataFrame(rows[:split], schema), "k", "v", 0)
        idx.merge(spark.createDataFrame(rows[split:], schema), "k", "v", 1)
        return idx

    base1 = tempfile.mkdtemp(prefix="qs_prop1_")
    base2 = tempfile.mkdtemp(prefix="qs_prop2_")
    try:
        idx = build(base1)
        est = {r.q: r.est for r in idx.quantiles([0.5, 0.9]).collect()}
        n = len(vals)
        tol = math.ceil(3.0 * n / N_STRATA)
        for q in (0.5, 0.9):
            target = math.ceil(q * n)
            lt = sum(1 for x in vals if x < est[q])
            le = sum(1 for x in vals if x <= est[q])
            assert lt <= target + tol and le >= target - tol, (
                vals, split, q, est[q], lt, le, target, tol,
            )
        # identical rebuild -> identical bytes
        summary = sorted(map(tuple, idx.summary().collect()))
        assert sorted(map(tuple, build(base2).summary().collect())) == summary
    finally:
        shutil.rmtree(base1, ignore_errors=True)
        shutil.rmtree(base2, ignore_errors=True)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),   # group
            st.integers(min_value=0, max_value=6),   # value (small grid -> ties)
            st.integers(min_value=1, max_value=5),   # weight
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=6, deadline=None)
def test_weighted_median_matches_bruteforce(spark, rows):
    """q241's crossing-bucket two-pass vs the definition: smallest v with
    2·cumweight(≤v) ≥ totalweight, per group — ties, single-row groups,
    and all-equal-value groups included by construction of the generator
    (sketch nondeterminism must not matter: the answer is a pure function
    of the weight distribution)."""
    from decimal import Decimal

    from stream_cdc_gps_spark.operators.analytics import weighted_median_by_group

    df = spark.createDataFrame(
        [(g, float(v), Decimal(wt)) for g, v, wt in rows],
        "g int, v double, wt decimal(18,2)",
    )
    got = {
        r["g"]: (r["n_rows"], float(r["tw"]), r["wmedian"])
        for r in weighted_median_by_group(df).collect()
    }

    want = {}
    for g in {g for g, _, _ in rows}:
        items = sorted((v, wt) for gg, v, wt in rows if gg == g)
        total = sum(wt for _, wt in items)
        cum = 0
        med = None
        for v, wt in items:
            cum += wt
            if 2 * cum >= total:
                med = float(v)
                break
        want[g] = (len(items), float(total), med)
    assert got == want
