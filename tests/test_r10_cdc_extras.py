"""Late-r10 additions: the CDC-maintained CMS (linear sketch under
retraction, q207) and the time-travel read of a CDC view (q208), plus
the concurrent-merge rework's replay contract (torn subsets of a
concurrent landing wave heal exactly like the sequential ones did)."""

from __future__ import annotations

import shutil
from decimal import Decimal

from pyspark.sql import functions as F

from stream_cdc_gps_spark.streaming.cms_index import (
    CdcCmsSketch,
    IncrementalCmsSketch,
    batch_partial,
)
from stream_cdc_gps_spark.streaming.join_view import CdcAggregateView


def _docs(spark, rows):
    return spark.createDataFrame(rows, "op string, seq bigint, doc_id bigint, text string")


def _counters_dict(df):
    return {(r["i"], r["bucket"]): r["cnt"] for r in df.collect()}


def test_cdc_cms_equals_batch_sketch_of_final_corpus(spark, tmp_path):
    """Maintained signed counters == batch_partial over the upserted
    final corpus, exactly — re-crawl retracts old text's counts, delete
    retracts everything, duplicate re-delivery nets to zero."""
    base = str(tmp_path / "cms")
    sk = CdcCmsSketch(spark, base, n_doc_buckets=4)
    sk.merge(
        _docs(
            spark,
            [
                ("c", 1, 1, "alpha beta gamma"),
                ("c", 2, 2, "beta beta delta"),
                ("c", 3, 3, "epsilon zeta"),
            ],
        ),
        0,
    )
    sk.merge(
        _docs(
            spark,
            [
                ("u", 10, 1, "alpha REVISED"),  # re-crawl: beta/gamma retract
                ("d", 11, 3, "epsilon zeta"),  # delete: all counts retract
                ("u", 12, 2, "beta beta delta"),  # duplicate re-delivery: no-op
            ],
        ),
        1,
    )
    final = spark.createDataFrame(
        [(1, "alpha REVISED"), (2, "beta beta delta")], "doc_id bigint, text string"
    )
    want = _counters_dict(batch_partial(final))
    got = _counters_dict(sk.counters())
    assert got == want
    # point estimates stay admissible over the ALIVE corpus only
    est = sk.estimate(["beta", "epsilon"])
    assert est["beta"] >= 2
    assert est["epsilon"] == 0  # fully retracted — no dead-count drift


def test_cdc_cms_torn_write_heals_and_compaction_invariant(spark, tmp_path):
    base = str(tmp_path / "cms2")
    sk = CdcCmsSketch(spark, base, n_doc_buckets=4)
    b0 = _docs(spark, [("c", 1, 1, "x y z"), ("c", 2, 2, "x x")])
    b1 = _docs(spark, [("u", 10, 1, "x y w"), ("d", 11, 2, "x x")])
    sk.merge(b0, 0)
    sk.merge(b1, 1)
    want = _counters_dict(sk.counters())
    # torn write: the cms partial of batch 1 vanishes, changelog survived
    shutil.rmtree(f"{base}/cms/partials/batch_id=1")
    replay = CdcCmsSketch(spark, base, n_doc_buckets=4)
    replay.merge(b1, 1)
    assert _counters_dict(replay.counters()) == want
    # compaction preserves the merged sketch and refuses a folded replay
    replay.compact()
    assert _counters_dict(replay.counters()) == want
    assert not replay.cms_store.land(batch_partial(b0), 1)


def _agg_rows(view_snapshot):
    return {
        r["cust_key"]: (r["n"], float(r["total"])) for r in view_snapshot.collect()
    }


def _changelog(spark, rows):
    return spark.createDataFrame(
        rows, "op string, seq bigint, order_key bigint, cust_key bigint, v decimal(18,2)"
    )


def test_snapshot_at_reconstructs_every_prefix(spark, tmp_path):
    base = str(tmp_path / "tt")
    view = CdcAggregateView(spark, base, key="cust_key", pk="order_key", val="v")
    b0 = _changelog(spark, [("c", 1, 1, 10, Decimal("5.00")), ("c", 2, 2, 10, Decimal("7.00")), ("c", 3, 3, 20, Decimal("1.00"))])
    b1 = _changelog(spark, [("u", 10, 1, 10, Decimal("6.00")), ("d", 11, 3, 20, Decimal("1.00"))])
    b2 = _changelog(spark, [("u", 20, 2, 30, Decimal("7.00"))])  # key move 10 -> 30
    view.merge(b0, 0)
    view.merge(b1, 1)
    view.merge(b2, 2)
    assert _agg_rows(view.snapshot_at(0)) == {10: (2, 12.0), 20: (1, 1.0)}
    assert _agg_rows(view.snapshot_at(1)) == {10: (2, 13.0)}
    assert _agg_rows(view.snapshot_at(2)) == {10: (1, 6.0), 30: (1, 7.0)}
    # the latest travel read IS the current snapshot
    assert _agg_rows(view.snapshot_at(2)) == _agg_rows(view.snapshot())


def test_snapshot_at_refuses_below_compaction_horizon(spark, tmp_path):
    import pytest

    base = str(tmp_path / "tt2")
    view = CdcAggregateView(spark, base, key="cust_key", pk="order_key", val="v")
    view.merge(_changelog(spark, [("c", 1, 1, 10, Decimal("5.00"))]), 0)
    view.merge(_changelog(spark, [("u", 10, 1, 10, Decimal("6.00"))]), 1)
    current = _agg_rows(view.snapshot())
    view.compact()  # horizon moves to batch 1
    with pytest.raises(ValueError, match="compaction horizon"):
        view.snapshot_at(0)
    # at-or-above the horizon still answers (the folded base covers <= 1)
    assert _agg_rows(view.snapshot_at(1)) == current


def test_suite_concurrent_merge_heals_torn_subset(spark, tmp_path):
    """A torn SUBSET of the concurrent landing wave (one member's view
    partition + one shared store's partition lost, others landed) heals
    on replay — the crash state the concurrency rework makes possible."""
    from stream_cdc_gps_spark.streaming.join_view import CdcViewSuite

    base = str(tmp_path / "suite")
    a0 = spark.createDataFrame(
        [("c", 1, 1, 10, Decimal("5.00"), "red"), ("c", 2, 2, 10, Decimal("7.00"), "blue"),
         ("c", 3, 3, 20, Decimal("1.00"), "red")],
        "op string, seq bigint, order_key bigint, cust_key bigint, "
        "num_val decimal(18,2), cat_val string",
    )
    b0 = spark.createDataFrame(
        [("c", 1, 10, "acme"), ("c", 2, 20, "globex")],
        "op string, seq bigint, cust_key bigint, cust_name string",
    )
    a1 = spark.createDataFrame(
        [("u", 10, 1, 10, Decimal("6.00"), "blue"), ("d", 11, 3, 20, Decimal("1.00"), "red")],
        "op string, seq bigint, order_key bigint, cust_key bigint, "
        "num_val decimal(18,2), cat_val string",
    )
    b1 = spark.createDataFrame(
        [("u", 10, 20, "globex2")],
        "op string, seq bigint, cust_key bigint, cust_name string",
    )
    suite = CdcViewSuite(
        spark, base, key="cust_key", a_pk="order_key", b_pk="cust_key",
        num_val="num_val", cat_val="cat_val", k=2,
    )
    suite.merge(a0, b0, 0)
    suite.merge(a1, b1, 1)
    want = sorted(map(tuple, suite.snapshot_dashboard().collect()))
    # torn: the aggregate member's batch-1 view delta AND the shared
    # support store's batch-1 partition vanish; everything else landed
    shutil.rmtree(f"{base}/agg/v/partials/batch_id=1")
    shutil.rmtree(f"{base}/s/partials/batch_id=1")
    replay = CdcViewSuite(
        spark, base, key="cust_key", a_pk="order_key", b_pk="cust_key",
        num_val="num_val", cat_val="cat_val", k=2,
    )
    replay.merge(a1, b1, 1)
    assert sorted(map(tuple, replay.snapshot_dashboard().collect())) == want


def test_join_agg_cascade_mutations_and_no_join_store(spark, tmp_path):
    """The cascaded aggregate tracks key moves, renames (group moves via
    the join), and deletes on both sides; the intermediate join is never
    materialized (no m-store partition ever lands); torn writes heal."""
    import os

    from stream_cdc_gps_spark.streaming.join_view import CdcJoinAggView

    base = str(tmp_path / "cascade")
    a0 = spark.createDataFrame(
        [("c", 1, 1, 10, Decimal("5.00")), ("c", 2, 2, 10, Decimal("7.00")),
         ("c", 3, 3, 20, Decimal("1.00"))],
        "op string, seq bigint, order_key bigint, cust_key bigint, v decimal(18,2)",
    )
    b0 = spark.createDataFrame(
        [("c", 1, 10, "acme"), ("c", 2, 20, "globex")],
        "op string, seq bigint, cust_key bigint, cust_name string",
    )
    # rename acme -> acme2 (moves BOTH its orders' revenue between group
    # keys), move order 2 to cust 20, delete order 3
    a1 = spark.createDataFrame(
        [("u", 10, 2, 20, Decimal("7.00")), ("d", 11, 3, 20, Decimal("1.00"))],
        "op string, seq bigint, order_key bigint, cust_key bigint, v decimal(18,2)",
    )
    b1 = spark.createDataFrame(
        [("u", 10, 10, "acme2")],
        "op string, seq bigint, cust_key bigint, cust_name string",
    )
    view = CdcJoinAggView(
        spark, base, key="cust_key", a_pk="order_key", b_pk="cust_key",
        gkey="cust_name", val="v",
    )
    view.merge(a0, b0, 0)
    assert {
        r["cust_name"]: (r["n"], float(r["total"]))
        for r in view.snapshot().collect()
    } == {"acme": (2, 12.0), "globex": (1, 1.0)}
    view.merge(a1, b1, 1)
    want = {"acme2": (1, 5.0), "globex": (1, 7.0)}
    got = {
        r["cust_name"]: (r["n"], float(r["total"]))
        for r in view.snapshot().collect()
    }
    assert got == want
    # the intermediate join view was never stored
    assert not os.path.isdir(f"{base}/join/m/partials")
    # torn write: the batch-1 aggregate delta vanishes, sources landed
    shutil.rmtree(f"{base}/v/partials/batch_id=1")
    replay = CdcJoinAggView(
        spark, base, key="cust_key", a_pk="order_key", b_pk="cust_key",
        gkey="cust_name", val="v",
    )
    replay.merge(a1, b1, 1)
    assert {
        r["cust_name"]: (r["n"], float(r["total"]))
        for r in replay.snapshot().collect()
    } == want
    # compaction preserves the snapshot
    replay.compact()
    assert {
        r["cust_name"]: (r["n"], float(r["total"]))
        for r in replay.snapshot().collect()
    } == want
