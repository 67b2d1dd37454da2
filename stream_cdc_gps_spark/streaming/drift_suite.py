"""One foreachBatch handler driving the whole EVENTS-KEYED monitoring
family off a single delivered changelog — the ``CdcViewSuite`` economics
(streaming/join_view.py) applied to the statistics views (r12 verdict
task #3): the bootstrap-CI view (q254), the KS drift monitor's per-value
arm counts (q238), and the PSI monitor's per-(class, value) arm counts
(q258) all ride the SAME events changelog, and composed naively each
lands that changelog per view — 3× the write volume (the measured suite
win was 2.46× for six members, scripts/bench_streaming_stores.py §4) —
plus each re-derives the identical ±image delta per merge.

``CdcDriftSuite`` lands the changelog ONCE per batch (full images +
the derived monitoring columns, computed map-side once in ``prepare``),
computes ONE pk-pruned state read + ONE ±1-weighted image delta, and
hands every member the shared delta; per-member work is only its own
delta algebra and view-store landing.

Merge runs two waves like the parent suite: wave 1, the member merges —
each reads only the shared PRE-batch delta and writes only its own view
store, so they are mutually independent and run concurrently; wave 2,
the single shared changelog landing, deferred until no member is still
listing the store (replayed batches delete-and-rewrite their partition
directories). A crash after any subset of either wave is a torn
combination replay heals (pytest-pinned in tests/test_r13_drift_suite.py).
Compaction folds every member's view store first, then the shared
changelog — the cross-member dependency order (r8 advice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.streaming.bootstrap_index import CdcBootstrapView
from stream_cdc_gps_spark.streaming.join_view import (
    N_BUCKETS,
    CdcAggregateView,
    _concurrently,
    cdc_delta,
    cdc_latest,
    cdc_state,
)
from stream_cdc_gps_spark.streaming.partial_store import BatchPartialStore


class CdcDriftSuite:
    """Composed maintenance of the three events-keyed monitoring views:

    - ``boot``: per-replicate Poisson-bootstrap sums over ``v``
      (``CdcBootstrapView`` — point estimate rides as arm −1);
    - ``ks``: per-distinct-``pval`` hash-arm counts (``CdcAggregateView``
      keyed on the purchase value — q238's maintained table);
    - ``psi``: per-(event class, value) hash-arm counts
      (``CdcAggregateView`` keyed on the struct — q258's maintained
      table, extent-free so the PSI grid re-derives at readout).

    Input contract: ``prepare``-d batches — (op, seq, event_id,
    user_id, event_type, value) plus the derived columns. All three
    aggregates are linear or per-replicate-linear in the event multiset,
    so every member maintains exactly under corrections, re-types,
    deletes, and duplicate re-deliveries from the one shared delta."""

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        thresholds: tuple[int, ...],
        b: int = 64,
        *,
        n_buckets: int = N_BUCKETS,
    ):
        self.spark = spark
        self.pk = "event_id"
        self.a_store = BatchPartialStore(
            spark, f"{base}/a", bucket_cols=[self.pk], n_buckets=n_buckets
        )
        share = {"a_store": self.a_store, "land_inputs": False}
        self.boot = CdcBootstrapView(
            spark, f"{base}/boot", pk=self.pk, val="v",
            thresholds=thresholds, b=b, **share,
        )
        self.ks = CdcAggregateView(
            spark, f"{base}/ks", key="pval", pk=self.pk, val="ina", **share
        )
        self.psi = CdcAggregateView(
            spark, f"{base}/psi", key="k", pk=self.pk, val="ina", **share
        )

    @staticmethod
    def prepare(batch: DataFrame) -> DataFrame:
        """Derive every member's monitoring columns map-side, ONCE per
        row (they ride the changelog images so the shared delta already
        carries them): the DECIMAL value for the bootstrap arms, the
        purchase-value KS key, the (class, value) PSI key, and the
        hash-split arm indicator."""
        in_a = (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
            ).cast("bigint")
            % 2
            == 0
        )
        return batch.select(
            "op",
            "seq",
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.col("value").cast("decimal(18,2)").alias("v"),
            F.when(F.col("event_type") == "purchase", F.col("value")).alias(
                "pval"
            ),
            F.when(
                F.col("event_type").isin("click", "purchase"),
                F.struct(
                    F.col("event_type").alias("et"), F.col("value").alias("value")
                ),
            ).alias("k"),
            F.when(in_a, 1).otherwise(0).cast("bigint").alias("ina"),
        )

    def merge(self, batch: DataFrame, batch_id: int) -> None:
        cdc = batch.localCheckpoint()
        state = cdc_state(self.a_store, batch_id, self.pk, prune=cdc)
        delta = cdc_delta(cdc, state, self.pk, "_w").localCheckpoint()
        # Wave 1: member merges off the ONE shared delta (each writes
        # only its own view store). Wave 2: the single changelog
        # landing, after no member can still be listing the store.
        _concurrently(
            lambda: self.boot.merge(cdc, batch_id, delta=delta),
            lambda: self.ks.merge(cdc, batch_id, delta=delta),
            lambda: self.psi.merge(cdc, batch_id, delta=delta),
        )
        self.a_store.land(cdc, batch_id)

    def n_partials(self) -> int:
        return self.a_store.n_partials()

    def compact(self) -> None:
        """Every member's view store before the shared changelog (the
        cross-member dependency order — see CdcViewSuite.compact)."""
        for view in (self.boot, self.ks, self.psi):
            view.compact_view_stores()
        rows = self.a_store.rows()
        if rows is not None:
            self.a_store.compact(cdc_latest(rows, self.pk))
