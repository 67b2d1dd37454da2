"""Composed streaming corpus ingestion: one stream, every index current.

The capstone composition over streaming/'s incremental pieces — the shape
a real training-data ingest service runs (and the streaming analogue of
q144's batch corpus-pipeline composition): ONE document stream drives, in
a single ``foreachBatch`` handler,

1. the q66-style quality gate (map-only rule filter — documents that fail
   never reach any index),
2. the incremental MinHash-LSH near-dup index (``dedup_index``),
3. the CMS token heavy-hitter sketch (``cms_index``),
4. the HLL distinct-document counter (``hll_index``),
5. the per-source size rollup (``rollup_index``).

The micro-batch is persisted once and fed to all four stores, so the
source is read once per batch, not four times. Atomicity is PER STORE,
not across stores: a crash mid-handler leaves some stores a batch ahead,
and recovery is exactly the members' own replay idempotency (each store
either overwrites its batch partition or distinct-merges) — Structured
Streaming re-delivers the batch and every store converges, which the
composition parity test replays end-to-end.

Reference parity note: the reference IS an ingest pipeline (HTTP → Kafka
→ Postgres, cmd/main.go) with no indexes; this is the Spark-idiomatic
descendant with the LLM-pipeline indexes mandated by SURVEY.md §2B
attached to the same streaming backbone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.functions.text import tokens
from stream_cdc_gps_spark.streaming.cms_index import IncrementalCmsSketch
from stream_cdc_gps_spark.streaming.dedup_index import IncrementalLshIndex
from stream_cdc_gps_spark.streaming.hll_index import IncrementalHllCounter
from stream_cdc_gps_spark.streaming.rollup_index import IncrementalRollup

# q66's first gate rule (token-count bounds), restated as the ingest
# admission predicate. Deliberately NOT imported from q66: the batch query
# owns its full rule set; the ingest gate pins just the structural rule the
# parity test needs, and the composition works with any map-only predicate.
_MIN_TOKENS, _MAX_TOKENS = 5, 2000


def quality_gate(batch_df: DataFrame) -> DataFrame:
    """Admission filter: token-count bounds over the raw text — map-only,
    so the gate adds zero exchanges ahead of the index updates."""
    n_tok = F.size(tokens(F.col("text")))
    return batch_df.filter(n_tok.between(_MIN_TOKENS, _MAX_TOKENS))


class CorpusIngestPipeline:
    """foreachBatch body: gate the batch once, update every index."""

    def __init__(self, spark: SparkSession, base: str):
        self.lsh = IncrementalLshIndex(spark, f"{base}/lsh")
        self.cms = IncrementalCmsSketch(spark, f"{base}/cms")
        self.hll = IncrementalHllCounter(spark, f"{base}/hll", "doc_id")
        self.rollup = IncrementalRollup(spark, f"{base}/rollup", "source", "n_chars")

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        from stream_cdc_gps_spark.streaming.join_view import _concurrently

        kept = quality_gate(batch_df).persist()
        try:
            kept.count()  # materialize once; the four updates re-read cache
            # The four indexes write disjoint stores off the one cached
            # batch — update them concurrently; a crash after any subset
            # is the torn multi-store state replay already heals.
            _concurrently(
                lambda: self.lsh.merge(kept.select("doc_id", "text"), batch_id),
                lambda: self.cms.merge(kept.select("text"), batch_id),
                lambda: self.hll.merge(kept.select("doc_id"), batch_id),
                lambda: self.rollup.merge(
                    kept.select("source", "n_chars"), batch_id
                ),
            )
        finally:
            kept.unpersist()
