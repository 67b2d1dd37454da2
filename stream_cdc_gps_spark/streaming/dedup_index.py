"""Incremental MinHash-LSH near-duplicate index (streaming dedup).

The one LLM-pipeline family that was batch-only through r5: maintain the
LSH band-posting state incrementally in a ``foreachBatch`` merge so NEW
documents dedup against the existing corpus without recomputing it — the
q86 changelog→snapshot pattern applied to the q52/q53 signature/banding
stages (``operators/dedup.py``).

Semantics contract (oracle-checked by q177): after any prefix of batches,
``pairs()`` equals q53's all-at-once batch result over the union of the
documents seen so far — INCLUDING the ``MAX_POSTING`` hot-bucket cap,
which incrementally requires RETRACTION: when a batch pushes a bucket
past the cap, the bucket's previously-emitted collisions are deleted in
the same merge and the bucket never emits again. Dead buckets stay dead
(bucket counts only grow), so retraction is a monotone one-way transition
— the same shape as a log-compacted store's tombstone.

State (two parquet directories, overwritten per merge — the hermetic
Delta-MERGE stand-in, same policy as ``ChangelogSnapshotTarget``):

- ``postings/``:   (band, band_key, doc_id) — the accumulated band index
- ``collisions/``: (band, band_key, doc_a, doc_b) — per-band collision
  edges; keeping the bucket key on every edge is what makes retraction a
  key-targeted anti join instead of a recompute

Per-batch work at scale: batch signatures are map-only (q52's
zero-shuffle array plan); the affected-bucket lookup is an equi semi join
on the band key (a key-partitioned store prunes it to touched buckets);
pair expansion re-runs only for AFFECTED buckets and is bounded by
MAX_POSTING² each. Replay idempotency: both stores merge by ``distinct``
on their full row, so a re-delivered micro-batch is a no-op — verified by
the fresh-checkpoint replay test in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.operators.dedup import (
    MAX_POSTING,
    band_tuples_of,
    bucket_pair_expand,
)
from stream_cdc_gps_spark.streaming.pipeline import _read_parquet_or_none


class IncrementalLshIndex:
    """foreachBatch body maintaining an incremental LSH candidate-pair
    index over a document stream. ``merge`` is the batch handler;
    ``pairs()`` is the q53-parity snapshot."""

    def __init__(self, spark: SparkSession, base: str, max_posting: int = MAX_POSTING):
        self.spark = spark
        self.postings_path = f"{base}/postings"
        self.collisions_path = f"{base}/collisions"
        self.max_posting = max_posting

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        # Map-only signature + banding over the micro-batch (q52's plan).
        nb = (
            band_tuples_of(batch_df)
            .select("band", "band_key", "doc_id")
            .distinct()
            .localCheckpoint()
        )
        old_post = _read_parquet_or_none(self.spark, self.postings_path)
        postings = (
            old_post.unionByName(nb).distinct() if old_post is not None else nb
        ).localCheckpoint()

        # Only buckets the batch touched can change state; everything else
        # keeps its existing collisions untouched.
        affected = nb.select("band", "band_key").distinct()
        buckets = (
            postings.join(affected, ["band", "band_key"], "left_semi")
            .groupBy("band", "band_key")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        )
        alive = buckets.filter(
            (F.size("ids") > 1) & (F.size("ids") <= self.max_posting)
        )
        dead = buckets.filter(F.size("ids") > self.max_posting).select(
            "band", "band_key"
        )
        # Re-expanding the FULL doc list of each affected alive bucket (not
        # just old×new) keeps the merge replay-idempotent by construction:
        # the distinct below absorbs previously-emitted pairs.
        new_coll = bucket_pair_expand(alive, keep=("band", "band_key")).select(
            "band",
            "band_key",
            F.col("a").alias("doc_a"),
            F.col("b").alias("doc_b"),
        )
        old_coll = _read_parquet_or_none(self.spark, self.collisions_path)
        if old_coll is not None:
            kept = old_coll.join(dead, ["band", "band_key"], "left_anti")
            collisions = kept.unionByName(new_coll).distinct()
        else:
            collisions = new_coll.distinct()
        collisions = collisions.localCheckpoint()

        postings.write.mode("overwrite").parquet(self.postings_path)
        collisions.write.mode("overwrite").parquet(self.collisions_path)

    def pairs(self) -> DataFrame:
        """q53-shaped candidate pairs over every document merged so far."""
        return (
            self.spark.read.parquet(self.collisions_path)
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        )
