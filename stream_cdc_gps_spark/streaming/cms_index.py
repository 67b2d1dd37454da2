"""Incremental count-min-sketch maintenance (streaming heavy hitters).

The sketch-merge story q113 tells in one batch, made INCREMENTAL: CMS
counter matrices are linear (counters of a union = elementwise sum of the
parts' counters), so a document stream can maintain the corpus sketch by
folding each micro-batch's partial sketch into state — no token-level
state, no rescan of history. This is the property that makes sketches the
100 TB answer: a 1000-executor cluster builds per-partition partials
map-side and the merge is an O(depth × width) add, and the SAME algebra
lets a stream keep the sketch current forever.

Persistence is ``partial_store.BatchPartialStore`` (shared with the HLL
and rollup stores): per-batch partials partitioned by ``batch_id`` with
dynamic partition overwrite (a replayed micro-batch overwrites its own
partition — the idempotent-sink contract), compaction folds history into
a pointer-committed base generation, and a replay of an ALREADY-COMPACTED
batch is refused by the store's ``max_compacted`` watermark — without it
the replay would double-count every counter (the r6-advice gap). The
merged snapshot ``counters()`` is identical before and after compaction
(pytest-pinned, including compact→replay and crash-mid-compact).

Reference parity note: the reference (cmd/main.go) has no sketch surface;
this extends SURVEY.md §2B's CMS row (q113) to the streaming column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.functions.text import tokens
from stream_cdc_gps_spark.operators.corpus import _CMS_DEPTH, _cms_bucket
from stream_cdc_gps_spark.streaming.partial_store import BatchPartialStore


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
        self.store = BatchPartialStore(spark, base)
        self.path = self.store.partials_path  # live-partials dir (crash tests)

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        self.store.land(batch_partial(batch_df), batch_id)

    def counters(self) -> DataFrame:
        """Merged sketch: elementwise sum of the compacted base and every
        live partial — the linearity of CMS is the whole trick."""
        rows = self.store.rows()
        if rows is None:
            return self.spark.createDataFrame([], "i int, bucket bigint, cnt bigint")
        return rows.groupBy("i", "bucket").agg(
            F.sum("cnt").cast("bigint").alias("cnt")
        )

    def n_partials(self) -> int:
        return self.store.n_partials()

    def compact(self) -> None:
        """Fold all live partials into the next base generation. The merged
        counters are invariant under compaction (sum is associative); the
        commit is the store's atomic meta-pointer swap, and replays of
        folded batches are refused thereafter."""
        self.store.compact(self.counters())

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
