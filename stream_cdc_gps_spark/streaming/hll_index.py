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

Persistence is ``partial_store.BatchPartialStore`` (shared with the CMS
and rollup stores): batch-id-partitioned partials, pointer-committed
compaction, and a ``max_compacted`` watermark refusing replays of folded
batches — the register max would absorb a double-landed sketch, but the
exact ``n_rows`` companion is a SUM and would not (the r6-advice gap).
An EMPTY micro-batch is skipped outright (r6 advice): ``hll_sketch_agg``
over zero rows yields a NULL sketch that would poison the union.

Reference parity note: the reference (cmd/main.go) has no sketch surface;
this extends SURVEY.md §2B's HLL row (q131) to the streaming column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.streaming.partial_store import BatchPartialStore


class IncrementalHllCounter:
    """foreachBatch body maintaining streaming distinct-count sketches
    for one key column. ``merge`` is the batch handler; ``estimate()``
    the merged cardinality snapshot."""

    def __init__(self, spark: SparkSession, base: str, key: str):
        self.spark = spark
        self.key = key
        self.store = BatchPartialStore(spark, base)
        self.path = self.store.partials_path  # live-partials dir (crash tests)

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            # hll_sketch_agg over zero rows is NULL; landing it would make
            # the union NULL and estimate() crash (r6 advice). An empty
            # batch changes neither the distinct count nor n_rows.
            return
        part = batch_df.agg(
            F.hll_sketch_agg(self.key).alias("sk"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        self.store.land(part, batch_id)

    def n_partials(self) -> int:
        return self.store.n_partials()

    def merged_sketch(self) -> DataFrame:
        """1-row (sk, n_rows): union-merged register state + total rows —
        the O(n_pieces × sketch_bytes) read is independent of data size."""
        rows = self.store.rows()
        if rows is None:
            raise ValueError("no batches have landed yet")
        return rows.agg(
            F.hll_union_agg("sk").alias("sk"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )

    def estimate(self) -> tuple[int, int]:
        """(distinct estimate, exact rows-seen) after all landed batches.
        (0, 0) when nothing has landed — an all-empty stream is a valid
        stream with zero distinct keys, not an error."""
        if self.store.rows() is None:
            return 0, 0
        row = self.merged_sketch().select(
            F.coalesce(F.hll_sketch_estimate("sk"), F.lit(0)).alias("est"),
            F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        ).collect()[0]
        return int(row["est"]), int(row["n_rows"])

    def compact(self) -> None:
        """Fold all live partials into the next base generation; the merged
        estimate is invariant (register max is associative/idempotent,
        n_rows sum is associative); pointer-swap commit via the store.
        No-op before any batch lands."""
        if self.store.rows() is None:
            return
        self.store.compact(self.merged_sketch())
