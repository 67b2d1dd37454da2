"""Incremental keyed-aggregate rollup maintenance (streaming OLAP cube).

Third of the three mergeable-state families in streaming/: after CMS
(sum-merge counters, ``cms_index``) and HLL (max-merge registers,
``hll_index``), this maintains a KEYED algebraic aggregate — per-key
(count, sum, min, max) partials, from which count/sum/avg/min/max all
re-derive exactly. Partial aggregation is Spark's own map-side-combine
algebra lifted to the stream: each micro-batch lands its per-key partial,
the snapshot is one O(keys × batches) re-combine, and history is never
rescanned. avg is DERIVED (sum/count) — storing it directly would make
the state non-mergeable, the classic incremental-view mistake.

Same store contract as the siblings: partials partitioned by ``batch_id``
with dynamic partition overwrite (replayed batches overwrite their own
partition — idempotent without dedup bookkeeping), ``compact()`` folds
history into one base partition, snapshot invariant under both
(pytest-pinned). Sums run through DECIMAL so merge order cannot move
them (the q174 idiom). Plain parquet as the hermetic MERGE stand-in.

Reference parity note: the reference (cmd/main.go) streams rows with no
aggregate surface; this extends SURVEY.md §2B's incremental-aggregation
row (q134) to the streaming column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.streaming.pipeline import _read_parquet_or_none

_BASE_BATCH_ID = -1


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
        self.path = f"{base}/partials"

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        part = keyed_partial(batch_df, self.key, self.value).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        (
            part.write.format("parquet")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .save(self.path)
        )

    def _merged(self) -> DataFrame:
        parts = _read_parquet_or_none(self.spark, self.path)
        if parts is None:
            raise ValueError("no batches have landed yet")
        return parts.groupBy("k").agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("s").cast("decimal(28,6)").alias("s"),
            F.min("lo").alias("lo"),
            F.max("hi").alias("hi"),
        )

    def n_partials(self) -> int:
        parts = _read_parquet_or_none(self.spark, self.path)
        return 0 if parts is None else parts.select("batch_id").distinct().count()

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
        """Fold all partials into the reserved base partition; the merged
        snapshot is invariant (count/sum/min/max merges are associative)."""
        merged = self._merged().withColumn("batch_id", F.lit(_BASE_BATCH_ID))
        rows = merged.collect()  # O(keys) — the rollup is domain-bounded
        (
            self.spark.createDataFrame(rows, merged.schema)
            .write.format("parquet")
            .mode("overwrite")
            .partitionBy("batch_id")
            .save(self.path)
        )
