"""Incremental keyed-aggregate rollup maintenance (streaming OLAP cube).

Third of the three mergeable-state families in streaming/: after CMS
(sum-merge counters, ``cms_index``) and HLL (max-merge registers,
``hll_index``), this maintains a KEYED algebraic aggregate — per-key
(count, sum, min, max) partials, from which count/sum/avg/min/max all
re-derive exactly. Partial aggregation is Spark's own map-side-combine
algebra lifted to the stream: each micro-batch lands its per-key partial,
the snapshot is one O(keys × pieces) re-combine, and history is never
rescanned. avg is DERIVED (sum/count) — storing it directly would make
the state non-mergeable, the classic incremental-view mistake.

Persistence is ``partial_store.BatchPartialStore`` (shared with the CMS
and HLL stores): batch-id-partitioned partials with dynamic partition
overwrite (replay-idempotent), pointer-committed compaction, and the
``max_compacted`` watermark that refuses replays of already-folded
batches — n and s are sums, so such a replay would double-count (the
r6-advice gap). Sums run through DECIMAL so merge order cannot move
them (the q174 idiom). Snapshot invariance under replay, compaction,
compact-then-replay, and crash-mid-compact is pytest-pinned.

Reference parity note: the reference (cmd/main.go) streams rows with no
aggregate surface; this extends SURVEY.md §2B's incremental-aggregation
row (q134) to the streaming column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.streaming.partial_store import BatchPartialStore


def keyed_partial(batch_df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-key mergeable partial for one micro-batch: (n, sum, min, max).
    The value sum is exact DECIMAL(18,6) so later re-combines are
    combine-order-proof."""
    v = F.col(value).cast("decimal(18,6)")
    return batch_df.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(v).cast("decimal(28,6)").alias("s"),
        F.min(F.col(value)).alias("lo"),
        F.max(F.col(value)).alias("hi"),
    )


class IncrementalRollup:
    """foreachBatch body maintaining per-key aggregate partials.
    ``merge`` is the batch handler; ``snapshot()`` the merged rollup with
    derived avg — byte-identical to the all-at-once batch aggregate."""

    def __init__(self, spark: SparkSession, base: str, key: str, value: str):
        self.spark = spark
        self.key = key
        self.value = value
        self.store = BatchPartialStore(spark, base)
        self.path = self.store.partials_path  # live-partials dir (crash tests)

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        self.store.land(keyed_partial(batch_df, self.key, self.value), batch_id)

    def _merged(self) -> DataFrame:
        rows = self.store.rows()
        if rows is None:
            raise ValueError("no batches have landed yet")
        return rows.groupBy("k").agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("s").cast("decimal(28,6)").alias("s"),
            F.min("lo").alias("lo"),
            F.max("hi").alias("hi"),
        )

    def n_partials(self) -> int:
        return self.store.n_partials()

    def snapshot(self) -> DataFrame:
        """The rollup a batch engine would compute over everything seen:
        count/sum/avg/min/max per key, avg derived from the exact pieces."""
        m = self._merged()
        return m.select(
            F.col("k").alias(self.key),
            F.col("n").alias("n_rows"),
            F.col("s").cast("double").alias("total"),
            (F.col("s").cast("double") / F.col("n")).alias("avg_value"),
            F.col("lo").alias("min_value"),
            F.col("hi").alias("max_value"),
        )

    def compact(self) -> None:
        """Fold all live partials into the next base generation; the merged
        snapshot is invariant (count/sum/min/max merges are associative);
        pointer-swap commit via the store. No-op before any batch lands."""
        if self.store.rows() is None:
            return
        self.store.compact(self._merged())
