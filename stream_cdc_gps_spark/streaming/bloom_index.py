"""CDC-maintained COUNTING BLOOM FILTER — set membership under retraction.

A plain Bloom filter (q242) cannot delete: clearing a bit would also clear
every other key hashing there, so under churn an append-only filter
accumulates dead keys' bits forever and its false-positive rate only ever
rises — the exact drift q207 rules out for CMS. The COUNTING variant is the
textbook fix (Fan et al., "Summary Cache", ToN 2000) and it is linear in
the tracked multiset: per-position counters

    cnt(pos) = Σ_rows [pos ∈ positions(key(row))]

so the q207 signed-partial algebra applies verbatim — each merge lands the
±1-weighted image delta's signed counter partial, a key-moving update
retracts the old key's k cells and asserts the new key's k in one merge, and
the running net sums equal the counters built from scratch over the
CDC-upserted final table EXACTLY. Membership(k) = all of k's positions have
net count > 0: no false negatives ever, false positives bounded by the fill
of the ALIVE set only.

Per-merge work: one pk-pruned latest-image read + one k-way position explode
over the ±images + one signed partial bounded by k·|Δ| cells (collapses
map-side). Storage/replay by the maintained-view family contract (per-batch
idempotent overwrite, torn writes heal on replay, compaction folds to net
sums then latest-per-pk, folded replays refused). Input contract:
(op string, seq bigint, <pk> bigint, <key> bigint), seq globally monotone.

Reference parity note: extends the sketch rows (q113/q131/q202/q215/q242)
to the reference's Debezium delivery semantics
(/root/reference/cmd/main.go:197-240, connector.json:4-17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.operators.relational import _BLOOM_K, _bloom_pos
from stream_cdc_gps_spark.streaming.partial_store import BatchPartialStore


class CdcCountingBloom:
    """Counting Bloom over a CDC changelog: ``pk`` identifies rows,
    ``key`` is the tracked membership key (a row update that moves the
    key shifts counters between both keys' cells)."""

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        *,
        pk: str,
        key: str,
        n_pk_buckets: int = 16,
    ):
        self.spark = spark
        self.pk = pk
        self.key = key
        self.row_store = BatchPartialStore(
            spark, f"{base}/rows", bucket_cols=[pk], n_buckets=n_pk_buckets
        )
        self.cnt_store = BatchPartialStore(spark, f"{base}/cnt")

    def _cells(self, delta: DataFrame) -> DataFrame:
        return delta.select(
            "_w",
            F.explode(
                F.array(*[_bloom_pos(F.col(self.key), i) for i in range(_BLOOM_K)])
            ).alias("pos"),
        )

    def merge(self, batch: DataFrame, batch_id: int) -> None:
        from stream_cdc_gps_spark.streaming.join_view import (
            _concurrently,
            cdc_delta,
            cdc_state,
        )

        cdc = batch.localCheckpoint()
        state = cdc_state(self.row_store, batch_id, self.pk, prune=cdc)
        delta = cdc_delta(cdc, state, self.pk, "_w")
        partial = (
            self._cells(delta)
            .groupBy("pos")
            .agg(F.sum("_w").cast("bigint").alias("cnt"))
            .filter(F.col("cnt") != 0)
        )
        _concurrently(
            lambda: self.cnt_store.land(partial, batch_id),
            lambda: self.row_store.land(cdc, batch_id),
        )

    def counters(self) -> DataFrame:
        """Net per-position counts over the ALIVE rows (fully-retracted
        positions net to zero and drop — the filter never carries dead
        keys' cells)."""
        rows = self.cnt_store.rows()
        if rows is None:
            return self.spark.createDataFrame([], "pos bigint, cnt bigint")
        return (
            rows.groupBy("pos")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
            .filter(F.col("cnt") > 0)
        )

    def n_partials(self) -> int:
        return self.cnt_store.n_partials()

    def compact(self) -> None:
        """Counters to net sums FIRST, then the changelog to
        latest-per-pk (d tombstones retained) — the family order."""
        from stream_cdc_gps_spark.streaming.join_view import cdc_latest

        rows = self.cnt_store.rows()
        if rows is not None:
            folded = (
                rows.groupBy("pos")
                .agg(F.sum("cnt").cast("bigint").alias("cnt"))
                .filter(F.col("cnt") != 0)
            )
            self.cnt_store.compact(folded)
        rows = self.row_store.rows()
        if rows is not None:
            self.row_store.compact(cdc_latest(rows, self.pk))
