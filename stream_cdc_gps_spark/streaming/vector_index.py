"""Incremental IVFADC vector index (streaming embedding ingestion).

The fifth mergeable-state family in streaming/, closing the loop between
the two r6-r7 themes: the incremental indexes (LSH/CMS/HLL/rollup) and
the trained IVFADC search (q186/q187). A vector database does NOT
re-encode its corpus when new embeddings arrive — codebooks are TRAINED
once, then frozen, and ingestion is FAISS ``add()``: assign each new
vector its coarse cell and PQ code and append. Because the encode is
STATELESS per vector (one map-only projection over literal codebooks,
``operators/similarity._ivfadc_encode``), the incremental index is the
easiest merge of all: state is append-only, the "fold" is the identity,
and any batch arrival order lands byte-the-same base table as the
all-at-once batch encode — the parity q190 drives through the driver's
oracle (q187's own SQL).

Persistence is ``partial_store.BatchPartialStore`` like the siblings:
per-batch (vec_id, cell, code0..M-1) rows partitioned by ``batch_id``
with dynamic partition overwrite (replay-idempotent without dedup
state), pointer-committed compaction, folded-replay refusal. At serving
scale the base table is exactly the FAISS IVF layout: the searcher
(``_ivfadc_query``) meets it with an EQUI join on cell id, so a store
re-partitioned/bucketed by ``cell`` turns probes into partition-pruned
posting-list scans — the 10⁹-vector shape.

Reference parity note: the reference (cmd/main.go) has no vector
surface; this extends SURVEY.md §2B's IVFADC rows (q186, q187) to the
streaming column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stream_cdc_gps_spark.operators.similarity import _ivfadc_encode
from stream_cdc_gps_spark.streaming.partial_store import BatchPartialStore


class IncrementalVectorIndex:
    """foreachBatch body maintaining an IVFADC base table over an
    embedding stream, with codebooks frozen at construction. ``merge``
    is the batch handler; ``base_table()`` the searchable snapshot
    (feed it to ``operators/similarity._ivfadc_query``)."""

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        cents: list[tuple[int, list[float]]],
        cbs: dict[int, list[tuple[int, list[float]]]],
    ):
        self.spark = spark
        self.cents = cents
        self.cbs = cbs
        self.store = BatchPartialStore(spark, base)
        self.path = self.store.partials_path  # live-partials dir (crash tests)

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        """Encode the micro-batch (map-only, frozen codebooks) and land
        it as the batch's partition. No state is read: add is append."""
        self.store.land(_ivfadc_encode(batch_df, self.cents, self.cbs), batch_id)

    def base_table(self) -> DataFrame:
        """Every (vec_id, cell, code…) encoded so far — the IVF base the
        searcher equi-joins on cell id."""
        rows = self.store.rows()
        if rows is None:
            raise ValueError("no batches have landed yet")
        return rows

    def n_partials(self) -> int:
        return self.store.n_partials()

    def compact(self) -> None:
        """Fold the per-batch partitions into one base generation — for
        append-only state the fold is the identity over the rows; the
        point is file-count hygiene, committed by the pointer swap."""
        if self.store.rows() is None:
            return
        self.store.compact(self.store.rows())
