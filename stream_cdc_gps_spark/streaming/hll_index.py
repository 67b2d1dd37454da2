"""Incremental HLL distinct-count maintenance (streaming cardinality).

The max-merge companion to ``cms_index``'s sum-merge: HLL register state
is a semilattice (union = elementwise register max), so a document/event
stream can keep a corpus-lifetime distinct count current by storing ONE
fixed-size sketch per micro-batch and union-merging at read time — no
key-level state, no rescan, and re-merging the same batch is absorbed by
idempotence of max (belt) on top of the batch-id partition overwrite
(suspenders). This is q131's partition-merge pattern rotated from shards
to time: the sketches that merged across month shards there merge across
micro-batches here, unchanged algebra.

Store layout mirrors ``IncrementalCmsSketch``: per-batch partials
partitioned by ``batch_id`` with dynamic partition overwrite (replayed
batches overwrite their own partition), ``compact()`` folds history into
a reserved base partition, and the snapshot is invariant under both
replay and compaction (pytest-pinned). Plain parquet as the hermetic
stand-in for a transactional MERGE, as everywhere in streaming/.

Reference parity note: the reference (cmd/main.go) has no sketch surface;
this extends SURVEY.md §2B's HLL row (q131) to the streaming column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.streaming.pipeline import _read_parquet_or_none

_BASE_BATCH_ID = -1


class IncrementalHllCounter:
    """foreachBatch body maintaining streaming distinct-count sketches
    for one key column. ``merge`` is the batch handler; ``estimate()``
    the merged cardinality snapshot."""

    def __init__(self, spark: SparkSession, base: str, key: str):
        self.spark = spark
        self.key = key
        self.path = f"{base}/partials"

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        part = batch_df.agg(
            F.hll_sketch_agg(self.key).alias("sk"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        ).withColumn("batch_id", F.lit(int(batch_id)))
        (
            part.write.format("parquet")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .save(self.path)
        )

    def _parts(self) -> DataFrame | None:
        return _read_parquet_or_none(self.spark, self.path)

    def n_partials(self) -> int:
        parts = self._parts()
        return 0 if parts is None else parts.select("batch_id").distinct().count()

    def merged_sketch(self) -> DataFrame:
        """1-row (sk, n_rows): union-merged register state + total rows —
        the O(n_batches × sketch_bytes) read is independent of data size."""
        parts = self._parts()
        if parts is None:
            raise ValueError("no batches have landed yet")
        return parts.agg(
            F.hll_union_agg("sk").alias("sk"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )

    def estimate(self) -> tuple[int, int]:
        """(distinct estimate, exact rows-seen) after all landed batches."""
        row = self.merged_sketch().select(
            F.hll_sketch_estimate("sk").alias("est"), "n_rows"
        ).collect()[0]
        return int(row["est"]), int(row["n_rows"])

    def compact(self) -> None:
        """Fold all partials into the reserved base partition; the merged
        estimate is invariant (register max is associative/idempotent)."""
        merged = self.merged_sketch().withColumn("batch_id", F.lit(_BASE_BATCH_ID))
        rows = merged.collect()  # one sketch row — bounded
        (
            self.spark.createDataFrame(rows, merged.schema)
            .write.format("parquet")
            .mode("overwrite")
            .partitionBy("batch_id")
            .save(self.path)
        )
