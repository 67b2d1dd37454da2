"""Round-9 advice fixes, each pinned by the failure it closes:

1. (medium) compact() dependency order across the CDC view stores —
   view store first, then support, then changelogs. The old order
   (changelogs first) left a crash window where a replayed batch
   recomputed its delta against a pre-state that already CONTAINED the
   batch and dynamically overwrote the live, correct view partition.
2. (low) quantile compress()'s cumulative-weight window needs a ROWS
   frame: under RANGE, fully-tied rows are peers sharing one cumulative
   sum, collapsing k identical rows into one stratum of weight k.
3. (low) snapshot_dashboard() must LEFT-join the distinct-count view:
   an alive key whose cat_val rows are all NULL has no distinct row.
4. (low) BatchPartialStore.bootstrap() must refuse a watermark below
   the store's absorbed max batch id.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


A_SCHEMA = "op string, seq long, oid long, k long, a_val string"
B_SCHEMA = "op string, seq long, k long, b_name string"


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _snap(view):
    return sorted(
        map(tuple, view.snapshot().select("oid", "k", "a_val", "b_name").collect())
    )


def test_compact_crash_window_is_replay_safe(spark, tmp_path):
    """Crash between the two compact phases (view store folded, changelog
    not): the replayed batch must be REFUSED at the view store while the
    changelog re-land is a byte-identical overwrite — snapshot invariant
    at every crash point."""
    from stream_cdc_gps_spark.streaming.join_view import CdcJoinView

    view = CdcJoinView(spark, str(tmp_path / "v"), key="k", a_pk="oid", b_pk="k")
    a0 = [("c", 1, 10, 1, "a10"), ("c", 2, 11, 2, "a11")]
    b0 = [("c", 1, 1, "Alice"), ("c", 2, 2, "Bob")]
    a1 = [("u", 10, 10, 1, "a10x"), ("d", 11, 11, 2, "a11")]
    view.merge(_mk(spark, a0, A_SCHEMA), _mk(spark, b0, B_SCHEMA), 0)
    view.merge(_mk(spark, a1, A_SCHEMA), _mk(spark, [], B_SCHEMA), 1)
    golden = [(10, 1, "a10x", "Alice")]
    assert _snap(view) == golden

    # crash point: view store folded, changelogs still live partials
    view.compact_view_stores()
    assert view.m_store._meta()["max_compacted"] == 1
    assert view.a_store._meta()["max_compacted"] is None
    # Structured Streaming re-delivers batch 1 after the crash
    view.merge(_mk(spark, a1, A_SCHEMA), _mk(spark, [], B_SCHEMA), 1)
    assert _snap(view) == golden

    # recovery completes the fold; a further replay is still a no-op
    view.compact_source_stores()
    view.merge(_mk(spark, a1, A_SCHEMA), _mk(spark, [], B_SCHEMA), 1)
    assert _snap(view) == golden
    assert view.n_partials() == 1


def test_compact_old_order_was_corrupt(spark, tmp_path):
    """The failure the ordering fix closes, demonstrated: folding the
    CHANGELOG first and crashing leaves a state where replaying the
    folded batch computes a degenerate delta (the pre-state already
    includes the batch) and overwrites the live, correct view partition
    — the update is silently undone. This documents WHY compact() now
    folds the view store first."""
    from stream_cdc_gps_spark.streaming.join_view import CdcJoinView

    view = CdcJoinView(spark, str(tmp_path / "v"), key="k", a_pk="oid", b_pk="k")
    a0 = [("c", 1, 10, 1, "a10")]
    b0 = [("c", 1, 1, "Alice")]
    a1 = [("u", 10, 10, 1, "a10x")]
    view.merge(_mk(spark, a0, A_SCHEMA), _mk(spark, b0, B_SCHEMA), 0)
    view.merge(_mk(spark, a1, A_SCHEMA), _mk(spark, [], B_SCHEMA), 1)
    golden = [(10, 1, "a10x", "Alice")]
    assert _snap(view) == golden

    # the OLD order's crash prefix: changelogs folded, view store not
    view.compact_source_stores()
    view.merge(_mk(spark, a1, A_SCHEMA), _mk(spark, [], B_SCHEMA), 1)
    # the replay overwrote view partition 1 with a degenerate delta: the
    # −1 retraction of the pre-update row is gone, so it RESURRECTS
    assert _snap(view) != golden
    assert (10, 1, "a10", "Alice") in _snap(view)


def test_suite_compact_folds_all_views_before_shared_stores(spark, tmp_path):
    """Cross-member ordering: the suite's shared changelog must not fold
    before EVERY member's view store has — interleaved member compacts
    (join folds the shared changelog, then crash, left's view store
    still live) reintroduce the corruption across members. Pin: after
    the suite's full compact, every view-store watermark covers the
    changelog watermark, and a replayed batch leaves every snapshot
    invariant."""
    from stream_cdc_gps_spark.streaming.join_view import CdcViewSuite

    a_schema = "op string, seq long, oid long, k long, v decimal(18,2), c string"
    suite = CdcViewSuite(
        spark, str(tmp_path / "s"), key="k", a_pk="oid", b_pk="k",
        num_val="v", cat_val="c", k=2,
    )
    from decimal import Decimal as D

    a0 = [("c", 1, 10, 1, D("5.00"), "x"), ("c", 2, 11, 1, D("3.00"), "y")]
    b0 = [("c", 1, 1, "Alice")]
    a1 = [("u", 10, 10, 2, D("6.00"), "x"), ("d", 11, 11, 1, D("3.00"), "y")]
    suite.merge(_mk(spark, a0, a_schema), _mk(spark, b0, B_SCHEMA), 0)
    suite.merge(_mk(spark, a1, a_schema), _mk(spark, [], B_SCHEMA), 1)
    golden = sorted(map(tuple, suite.snapshot_dashboard().collect()))

    suite.compact()
    cl_mark = suite.a_store._meta()["max_compacted"]
    for member, store in [
        (suite.join, suite.join.m_store),
        (suite.left, suite.left.v_store),
        (suite.agg, suite.agg.v_store),
        (suite.minmax, suite.minmax.v_store),
        (suite.distinct, suite.distinct.v_store),
        (suite.topk, suite.topk.v_store),
    ]:
        assert store._meta()["max_compacted"] >= cl_mark, type(member).__name__

    suite.merge(_mk(spark, a1, a_schema), _mk(spark, [], B_SCHEMA), 1)
    assert sorted(map(tuple, suite.snapshot_dashboard().collect())) == golden


def test_quantile_compress_spreads_tied_rows(spark):
    """64 identical unit-weight rows, 8 strata: the ROWS frame spreads
    them into 8 strata of weight 8 each (RANGE collapsed them into one
    stratum of weight 64, violating the ≤ ⌈W/C⌉ + max-input bound)."""
    from stream_cdc_gps_spark.streaming.quantile_index import compress

    rows = spark.createDataFrame(
        [("k", 5, 1, 5, 5)] * 64, "key string, v long, w long, lo long, hi long"
    )
    out = compress(rows, n_strata=8).collect()
    assert len(out) == 8
    assert all(r.w == 8 for r in out)
    assert all(float(r.v) == 5.0 for r in out)


def test_dashboard_keeps_all_null_catval_keys(spark, tmp_path):
    """An alive key whose cat_val rows are ALL NULL must appear in the
    dashboard with n_distinct = 0 — SQL's COUNT(DISTINCT) over the
    final table keeps the group; the old inner join dropped it."""
    from stream_cdc_gps_spark.streaming.join_view import CdcViewSuite
    from decimal import Decimal as D

    a_schema = "op string, seq long, oid long, k long, v decimal(18,2), c string"
    suite = CdcViewSuite(
        spark, str(tmp_path / "s"), key="k", a_pk="oid", b_pk="k",
        num_val="v", cat_val="c", k=2,
    )
    a0 = [("c", 1, 10, 1, D("5.00"), None), ("c", 2, 11, 2, D("3.00"), "y")]
    b0 = [("c", 1, 2, "Bob")]
    suite.merge(_mk(spark, a0, a_schema), _mk(spark, b0, B_SCHEMA), 0)
    dash = {r.k: (r.n, r.n_distinct) for r in suite.snapshot_dashboard().collect()}
    assert dash[1] == (1, 0)
    assert dash[2] == (1, 1)


def test_bootstrap_refuses_stale_watermark(spark, tmp_path):
    """REPLACE semantics: a bootstrap watermark below the store's
    absorbed max batch id would leave newer live partials visible in
    the replaced store — refused loudly."""
    from stream_cdc_gps_spark.streaming.partial_store import BatchPartialStore

    store = BatchPartialStore(spark, str(tmp_path / "st"))
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    store.land(df, 0)
    store.land(df, 1)
    with pytest.raises(ValueError, match="watermark"):
        store.bootstrap(df, 0)
    with pytest.raises(ValueError, match="watermark"):
        store.bootstrap(df, None)
    store.bootstrap(df.select((F.col("a") + 1).alias("a"), "b"), 1)
    assert [tuple(r) for r in store.rows().collect()] == [(2, 2)]
