"""Incremental materialized JOIN view (delta-join maintenance).

The sixth mergeable-state family in streaming/, and the one the others
don't cover: CMS/HLL/rollup maintain AGGREGATES, the LSH/vector indexes
maintain per-row DERIVATIONS — this maintains a relation DERIVED FROM TWO
GROWING INPUTS, the classic incremental-view-maintenance problem. For an
insert-only equi join M = A ⋈ B, the standard delta algebra gives the
per-batch increment exactly:

    ΔM_t = ΔA_t ⋈ B_{<t}  ∪  A_{<t} ⋈ ΔB_t  ∪  ΔA_t ⋈ ΔB_t

so each micro-batch joins only its OWN rows against accumulated state
(plus the tiny ΔA⋈ΔB corner) — never re-joining history against history.
At 100 TB this is the whole point: batch work is O(|Δ| × matched state),
looked up by an equi join on the key, while a recompute would be
O(|A| × |B|) every trigger.

Replay safety WITHOUT cross-store transactions: all three stores (A rows,
B rows, M deltas) are ``partial_store.BatchPartialStore`` batch-id
partitions, and the merge reads state via ``rows_before(t)`` — which
EXCLUDES partition t by construction. A crash that lands some of the
three partitions and not others is healed by Structured Streaming's
re-delivery: the replayed merge recomputes ΔM_t against exactly the
pre-t state and overwrites all three t-partitions with the same bytes
(pytest-pinned, including the torn-write crash state). Compaction folds
each store independently (append-only: the fold is the identity);
``land``'s watermark then refuses folded-batch replays as everywhere.

Parity contract (driver-checked by q193): after any prefix of batches,
``snapshot()`` — the union of the ΔM partitions — equals the all-at-once
batch join of everything delivered so far.

Reference parity note: the reference (cmd/main.go) enriches rows against
nothing; this extends SURVEY.md §2B's join family to the streaming
column the way q86 extended upsert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stream_cdc_gps_spark.streaming.partial_store import BatchPartialStore


class IncrementalJoinView:
    """foreachBatch-style body maintaining M = A ⋈ B (inner equi join on
    ``key``) over two insert-only inputs delivered in lock-step batches.
    ``merge`` is the batch handler; ``snapshot()`` the materialized view."""

    def __init__(self, spark: SparkSession, base: str, key: str):
        self.spark = spark
        self.key = key
        self.a_store = BatchPartialStore(spark, f"{base}/a")
        self.b_store = BatchPartialStore(spark, f"{base}/b")
        self.m_store = BatchPartialStore(spark, f"{base}/m")

    def merge(self, a_batch: DataFrame, b_batch: DataFrame, batch_id: int) -> None:
        a_old = self.a_store.rows_before(batch_id)
        b_old = self.b_store.rows_before(batch_id)
        da = a_batch.localCheckpoint()
        db = b_batch.localCheckpoint()
        # ΔA⋈ΔB is always present; the two state-side terms only once the
        # other side has history. Every term is an EQUI join on the key.
        dm = da.join(db, self.key)
        if b_old is not None:
            dm = dm.unionByName(da.join(b_old, self.key))
        if a_old is not None:
            dm = dm.unionByName(a_old.join(db, self.key))
        # Land the DELTA first, then the inputs: any torn combination is
        # healed by replay, because rows_before(t) never sees partition t.
        self.m_store.land(dm, batch_id)
        self.a_store.land(da, batch_id)
        self.b_store.land(db, batch_id)

    def snapshot(self) -> DataFrame:
        """The materialized view: every delta landed so far — equal to
        the all-at-once batch join of every delivered row (q193)."""
        rows = self.m_store.rows()
        if rows is None:
            raise ValueError("no batches have landed yet")
        return rows

    def n_partials(self) -> int:
        return self.m_store.n_partials()

    def compact(self) -> None:
        """Fold each store's partitions (append-only state: identity
        fold), committed independently by each store's pointer swap."""
        for store in (self.a_store, self.b_store, self.m_store):
            if store.rows() is not None:
                store.compact(store.rows())
