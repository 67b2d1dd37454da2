"""Incremental count-min-sketch maintenance (streaming heavy hitters).

The sketch-merge story q113 tells in one batch, made INCREMENTAL: CMS
counter matrices are linear (counters of a union = elementwise sum of the
parts' counters), so a document stream can maintain the corpus sketch by
folding each micro-batch's partial sketch into state — no token-level
state, no rescan of history. This is the property that makes sketches the
100 TB answer: a 1000-executor cluster builds per-partition partials
map-side and the merge is an O(depth × width) add, and the SAME algebra
lets a stream keep the sketch current forever.

Exactly-once under replay WITHOUT dedup state: partials land partitioned
by ``batch_id`` with dynamic partition overwrite, so a re-delivered
micro-batch (Structured Streaming re-runs the last batch after a crash)
overwrites its own partition instead of double-counting — the classic
idempotent-sink contract (same batch_id ⇒ same bytes ⇒ same state).

``compact()`` folds all landed partials into one base partition when the
partial count grows — the log-compaction move; the snapshot ``counters()``
is identical before and after (pytest-pinned). Like the other streaming
targets here (``ChangelogSnapshotTarget``, ``IncrementalLshIndex``) the
store is a plain-parquet hermetic stand-in for a transactional table
format's MERGE.

Reference parity note: the reference (cmd/main.go) has no sketch surface;
this extends SURVEY.md §2B's CMS row (q113) to the streaming column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.functions.text import tokens
from stream_cdc_gps_spark.operators.corpus import _CMS_DEPTH, _cms_bucket
from stream_cdc_gps_spark.streaming.pipeline import _read_parquet_or_none

# compact() folds history into this reserved partition; real batch ids are
# nonnegative, so the base can never collide with a replayed batch.
_BASE_BATCH_ID = -1


def batch_partial(batch_df: DataFrame) -> DataFrame:
    """(i, bucket, cnt) CMS partial for one micro-batch of documents —
    q113's counter construction verbatim: tokenize, hash into
    depth × width cells, count. Map-only until the O(depth × width)
    counter aggregate."""
    tok = batch_df.select(F.explode(tokens(F.col("text"))).alias("tok"))
    rows = tok.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cms_bucket(F.col("tok"), i).alias("bucket"),
                    )
                    for i in range(_CMS_DEPTH)
                ]
            )
        ).alias("rb")
    ).select("rb.i", "rb.bucket")
    return rows.groupBy("i", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


class IncrementalCmsSketch:
    """foreachBatch body maintaining a corpus CMS over a document stream.

    ``merge`` is the batch handler; ``counters()`` the merged snapshot;
    ``estimate`` the point query (min over rows, admissible: ≥ truth)."""

    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.path = f"{base}/partials"

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        part = batch_partial(batch_df).withColumn("batch_id", F.lit(int(batch_id)))
        (
            part.write.format("parquet")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .save(self.path)
        )

    def counters(self) -> DataFrame:
        """Merged sketch: elementwise sum of every landed partial — the
        linearity of CMS is the whole trick."""
        parts = _read_parquet_or_none(self.spark, self.path)
        if parts is None:
            return self.spark.createDataFrame([], "i int, bucket bigint, cnt bigint")
        return parts.groupBy("i", "bucket").agg(
            F.sum("cnt").cast("bigint").alias("cnt")
        )

    def n_partials(self) -> int:
        parts = _read_parquet_or_none(self.spark, self.path)
        if parts is None:
            return 0
        return parts.select("batch_id").distinct().count()

    def compact(self) -> None:
        """Fold all partials into the reserved base partition. The merged
        counters are invariant under compaction (sum is associative); the
        rewrite is the same overwrite-the-store move as the other hermetic
        targets — a transactional table format would make it atomic."""
        merged = self.counters().withColumn("batch_id", F.lit(_BASE_BATCH_ID))
        # materialize BEFORE overwriting the directory being read
        rows = merged.collect()  # O(depth × width) — bounded by sketch size
        (
            self.spark.createDataFrame(rows, merged.schema)
            .write.format("parquet")
            .mode("overwrite")
            .partitionBy("batch_id")
            .save(self.path)
        )

    def estimate(self, toks: list[str]) -> dict[str, int]:
        """Point estimates for the given tokens: min over the depth rows —
        the CMS admissible upper bound on each token's true count."""
        cand = self.spark.createDataFrame(
            [(t,) for t in toks], "tok string"
        ).select(
            "tok",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            _cms_bucket(F.col("tok"), i).alias("bucket"),
                        )
                        for i in range(_CMS_DEPTH)
                    ]
                )
            ).alias("rb"),
        ).select("tok", "rb.i", "rb.bucket")
        est = (
            cand.join(F.broadcast(self.counters()), ["i", "bucket"], "left")
            .groupBy("tok")
            .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("est"))
        )
        return {r["tok"]: r["est"] for r in est.collect()}
