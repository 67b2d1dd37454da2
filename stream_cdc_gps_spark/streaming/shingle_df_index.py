"""CDC-maintained word-shingle DOCUMENT FREQUENCIES — the corpus-gate index.

Document frequency is LINEAR in the document multiset: DF(s) = Σ_docs
[s ∈ distinct-shingles(doc)], so the q207 signed-partial algebra applies
verbatim — each merge lands the ±1-weighted image delta's signed per-shingle
partial

    Δdf(s) = Σ_images w(image) · [s ∈ distinct-shingles(image)]

and the running net sum per shingle equals the DF table built from scratch
over the CDC-upserted final corpus, EXACTLY (DF of the net corpus == net of
the per-image DF contributions). That one maintained table powers BOTH
standing corpus gates, which were batch-only until r12:

- DECONTAMINATION (q105): "shingle occurs in the TRAIN split" is
  df_train(s) > 0 — scope the view with ``df_pred`` (the train-bucket
  predicate) and membership in the contamination screen reads the net
  counts instead of rescanning the train corpus;
- NOVELTY (q152): "shingle is shared across documents" is df(s) > 1 —
  the unscoped view.

A re-crawled document retracts its OLD text's distinct shingles and asserts
the new ones in one merge; a delete retracts exactly its contribution; a
duplicate re-delivery nets to a zero partial. The batch gates rescan every
document on any churn — the failure mode this class retires (the reference's
corpus churns under exactly these Debezium upsert semantics,
/root/reference/cmd/main.go:197-240, connector.json:4-17).

Per-merge work: one pk-pruned latest-image read (doc shards touched by the
batch only) + one shingling pass over the ±images only + one signed partial
bounded by |Δ's distinct shingles|, landed into only the shingle shards the
delta touches. Gate reads prune by shingle shard (``BatchPartialStore``
bucketing). Storage/replay by the maintained-view family contract: per-batch
dynamic-partition overwrite (idempotent replay), torn write combinations
heal on replay, compaction folds counts to net sums (zeros dropped) then the
changelog to latest-per-pk, and the ``max_compacted`` watermark refuses
replays of folded batches. Input contract: (op string, seq bigint, doc_id
bigint, text string), seq globally monotone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.functions.text import tokens, word_shingles
from stream_cdc_gps_spark.operators.corpus import _DECONTAM_N
from stream_cdc_gps_spark.streaming.partial_store import BatchPartialStore


class CdcShingleDfView:
    """CDC-aware shingle-DF view: per-shingle alive document frequencies
    maintained under updates and deletes via signed partials.

    ``df_pred`` (optional, an unresolved Column predicate over the image
    columns) scopes WHICH documents count toward the frequencies — the
    decontamination gate passes the train-bucket predicate; the changelog
    store always holds the full stream so ``alive_docs`` stays the whole
    corpus snapshot."""

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        *,
        n: int = _DECONTAM_N,
        df_pred: Column | None = None,
        n_doc_buckets: int = 16,
        n_shingle_buckets: int = 16,
    ):
        self.spark = spark
        self.n = n
        self.df_pred = df_pred
        self.doc_store = BatchPartialStore(
            spark, f"{base}/docs", bucket_cols=["doc_id"], n_buckets=n_doc_buckets
        )
        self.df_store = BatchPartialStore(
            spark, f"{base}/df", bucket_cols=["shingle"], n_buckets=n_shingle_buckets
        )

    def _signed_partial(self, delta: DataFrame) -> DataFrame:
        """Signed per-shingle DF partial of a ±1 image delta: each image's
        DISTINCT shingles carry the image's weight (DF counts documents,
        not occurrences — hence array_distinct before the explode)."""
        scoped = delta.filter(self.df_pred) if self.df_pred is not None else delta
        sh = scoped.select(
            "_w",
            F.explode(
                F.array_distinct(word_shingles(tokens(F.col("text")), self.n))
            ).alias("shingle"),
        )
        return (
            sh.groupBy("shingle")
            .agg(F.sum("_w").cast("bigint").alias("cnt"))
            .filter(F.col("cnt") != 0)
        )

    def merge(self, batch: DataFrame, batch_id: int) -> None:
        from stream_cdc_gps_spark.streaming.join_view import (
            _concurrently,
            cdc_delta,
            cdc_state,
        )

        cdc = batch.localCheckpoint()
        state = cdc_state(self.doc_store, batch_id, "doc_id", prune=cdc)
        delta = cdc_delta(cdc, state, "doc_id", "_w")
        partial = self._signed_partial(delta)
        _concurrently(
            lambda: self.df_store.land(partial, batch_id),
            lambda: self.doc_store.land(cdc, batch_id),
        )

    def df(self) -> DataFrame:
        """The maintained DF table over the ALIVE (scoped) corpus:
        (shingle, n_docs), net sums > 0 — shingles whose every contribution
        was retracted net to zero and drop."""
        rows = self.df_store.rows()
        if rows is None:
            return self.spark.createDataFrame([], "shingle string, n_docs bigint")
        return (
            rows.groupBy("shingle")
            .agg(F.sum("cnt").cast("bigint").alias("n_docs"))
            .filter(F.col("n_docs") > 0)
        )

    def alive_docs(self) -> DataFrame:
        """Latest alive image per doc_id — the corpus snapshot side the
        gate readouts join against."""
        from stream_cdc_gps_spark.streaming.join_view import cdc_latest

        rows = self.doc_store.rows()
        if rows is None:
            return self.spark.createDataFrame([], "doc_id bigint, text string")
        return cdc_latest(rows, "doc_id").filter(F.col("op") != "d").drop("op", "seq")

    def n_partials(self) -> int:
        return self.df_store.n_partials()

    def compact(self) -> None:
        """Counts to net sums FIRST, then the changelog to latest-per-pk
        (d tombstones retained) — the family order."""
        from stream_cdc_gps_spark.streaming.join_view import cdc_latest

        rows = self.df_store.rows()
        if rows is not None:
            folded = (
                rows.groupBy("shingle")
                .agg(F.sum("cnt").cast("bigint").alias("cnt"))
                .filter(F.col("cnt") != 0)
            )
            self.df_store.compact(folded)
        rows = self.doc_store.rows()
        if rows is not None:
            self.doc_store.compact(cdc_latest(rows, "doc_id"))


class CdcTokenTfView(CdcShingleDfView):
    """CDC-maintained unigram TERM FREQUENCIES — the corpus language-model
    index. TF(w) = Σ_docs count(w in doc) is linear in the document
    multiset exactly like DF, but weights each OCCURRENCE instead of each
    containing document, so the signed partial is the parent's without
    the ``array_distinct`` (and the "shingle" is the token itself, n=1):

        Δtf(w) = Σ_images w(image) · count(w in image)

    A re-crawl retracts the old text's full token multiset and asserts
    the new one; the running net per token equals the batch TF table
    over the CDC-upserted final corpus EXACTLY. This is the maintained
    state behind q248's unigram-LM perplexity gate: the quality filter a
    training pipeline applies tomorrow scores against today's corpus
    statistics without a rescan (the reference's corpus churns under
    these Debezium semantics, /root/reference/cmd/main.go:197-240).

    Storage, replay, compaction, and per-merge cost are the parent
    contract verbatim (the "shingle" store column now holds tokens)."""

    def __init__(self, spark: SparkSession, base: str, **kw):
        super().__init__(spark, base, n=1, **kw)

    def _signed_partial(self, delta: DataFrame) -> DataFrame:
        scoped = delta.filter(self.df_pred) if self.df_pred is not None else delta
        occ = scoped.select(
            "_w", F.explode(tokens(F.col("text"))).alias("shingle")
        )
        return (
            occ.groupBy("shingle")
            .agg(F.sum("_w").cast("bigint").alias("cnt"))
            .filter(F.col("cnt") != 0)
        )

    def tf(self) -> DataFrame:
        """The maintained term-frequency table over the alive (scoped)
        corpus: (w, tf), net occurrence sums > 0."""
        return self.df().select(
            F.col("shingle").alias("w"), F.col("n_docs").alias("tf")
        )
