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
        return _estimate(self.spark, self.counters(), toks)


def _estimate(spark: SparkSession, counters: DataFrame, toks: list[str]) -> dict[str, int]:
    """Point estimates from a merged counter frame: min over depth rows."""
    cand = spark.createDataFrame([(t,) for t in toks], "tok string").select(
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
        cand.join(F.broadcast(counters), ["i", "bucket"], "left")
        .groupBy("tok")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("est"))
    )
    return {r["tok"]: r["est"] for r in est.collect()}


class CdcCmsSketch:
    """CDC-aware count-min sketch: the corpus CMS maintained under
    UPDATES and DELETES — the retraction case the append-only
    ``IncrementalCmsSketch`` cannot express, and the cleanest
    demonstration that LINEAR sketches are Z-set morphisms: counters are
    linear in the input multiset, so applying the batch's ±1-weighted
    image delta (the join_view algebra) to the token multiset gives a
    SIGNED counter partial

        Δcnt(i, bucket) = Σ_images w(image) · |tokens(image) in bucket|

    whose running sum per cell equals the sketch built from scratch over
    the CDC-upserted final corpus — exactly (not approximately: the
    sketch of the net corpus IS the net of the sketches; driver-checked
    by q207 against q113's batch SQL over the upserted final table).
    A re-crawled document retracts its OLD text's token counts and
    asserts the new ones in one merge; a delete retracts exactly its
    contribution; approximation error stays the CMS ε over the ALIVE
    corpus, never accumulating from dead documents — the property an
    append-only sketch under churn silently loses.

    Per-merge work: one pk-pruned latest-image read + one tokenize over
    the ±images + one O(depth × width)-bounded signed partial — the
    landed partial never exceeds depth × width rows whatever |Δ| is.
    Storage/replay by the family contract (rows_before(t) reads, torn
    combinations heal); compaction folds counters to net sums (zero
    cells dropped). Input contract: (op string, seq bigint, doc_id
    bigint, text string), seq globally monotone.

    Reference parity note: extends the q113/q189 sketch rows to the
    reference's Debezium delivery semantics (cmd/main.go:197-230,
    connector.json:4-17)."""

    def __init__(self, spark: SparkSession, base: str, *, n_doc_buckets: int = 16):
        self.spark = spark
        self.doc_store = BatchPartialStore(
            spark, f"{base}/docs", bucket_cols=["doc_id"], n_buckets=n_doc_buckets
        )
        self.cms_store = BatchPartialStore(spark, f"{base}/cms")

    def merge(self, batch: DataFrame, batch_id: int) -> None:
        from stream_cdc_gps_spark.streaming.join_view import (
            _concurrently,
            cdc_delta,
            cdc_state,
        )

        cdc = batch.localCheckpoint()
        state = cdc_state(self.doc_store, batch_id, "doc_id", prune=cdc)
        delta = cdc_delta(cdc, state, "doc_id", "_w")
        # signed counter partial: each ±image's tokens hash into the
        # depth × width cells and carry the image's weight
        tok = delta.select(
            F.col("_w"), F.explode(tokens(F.col("text"))).alias("tok")
        )
        cells = tok.select(
            "_w",
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
        ).select("_w", "rb.i", "rb.bucket")
        partial = cells.groupBy("i", "bucket").agg(
            F.sum("_w").cast("bigint").alias("cnt")
        ).filter(F.col("cnt") != 0)
        _concurrently(
            lambda: self.cms_store.land(partial, batch_id),
            lambda: self.doc_store.land(cdc, batch_id),
        )

    def counters(self) -> DataFrame:
        """Merged sketch over the ALIVE corpus: net counter sums (cells
        whose every contribution was retracted net to zero and drop)."""
        rows = self.cms_store.rows()
        if rows is None:
            return self.spark.createDataFrame([], "i int, bucket bigint, cnt bigint")
        return (
            rows.groupBy("i", "bucket")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
            .filter(F.col("cnt") > 0)
        )

    def estimate(self, toks: list[str]) -> dict[str, int]:
        return _estimate(self.spark, self.counters(), toks)

    def n_partials(self) -> int:
        return self.cms_store.n_partials()

    def compact(self) -> None:
        """Counters to net sums FIRST, then the changelog to
        latest-per-pk (d tombstones retained) — the family order."""
        from stream_cdc_gps_spark.streaming.join_view import cdc_latest

        rows = self.cms_store.rows()
        if rows is not None:
            folded = (
                rows.groupBy("i", "bucket")
                .agg(F.sum("cnt").cast("bigint").alias("cnt"))
                .filter(F.col("cnt") != 0)
            )
            self.cms_store.compact(folded)
        rows = self.doc_store.rows()
        if rows is not None:
            self.doc_store.compact(cdc_latest(rows, "doc_id"))
