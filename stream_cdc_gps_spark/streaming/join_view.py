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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

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
        fold), committed independently by each store's pointer swap —
        VIEW store first, then the changelogs. The order is load-bearing
        (r8 advice): each store's pointer commits independently, so a
        crash between them must leave a prefix that replay heals. If a
        changelog folded batch t while the view store had not, a replayed
        t would compute its delta against rows_before(t) = the folded
        base (which already CONTAINS t) — a degenerate delta dynamically
        overwriting the still-live, correct view partition t. Folding the
        view store first makes the replayed t refused at m_store.land
        (t ≤ max_compacted) while the changelog re-lands are byte-
        identical overwrites."""
        for store in (self.m_store, self.a_store, self.b_store):
            if store.rows() is not None:
                store.compact(store.rows())


def cdc_latest(rows: DataFrame, pk: str) -> DataFrame:
    """Last CDC row per pk in seq order (ties impossible: seq is monotone
    per side)."""
    w = Window.partitionBy(pk).orderBy(F.desc("seq"))
    return (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def cdc_state(store: BatchPartialStore, t: int, pk: str) -> DataFrame | None:
    """Pre-batch snapshot of a CDC changelog store: latest image per pk
    strictly before batch t, deletes excluded."""
    rows = store.rows_before(t)
    if rows is None:
        return None
    return cdc_latest(rows, pk).filter(F.col("op") != "d").drop("op", "seq")


def cdc_delta(
    batch: DataFrame, state: DataFrame | None, pk: str, wcol: str
) -> DataFrame:
    """The ±1-weighted Z-set delta of one CDC micro-batch: +1 · the
    batch's last image per pk (none when the last op is d — delete wins),
    −1 · the pre-batch snapshot image of every pk the batch touches."""
    last = cdc_latest(batch, pk)
    new = (
        last.filter(F.col("op") != "d").drop("op", "seq").withColumn(wcol, F.lit(1))
    )
    if state is None:
        return new
    old = state.join(batch.select(pk).distinct(), pk, "left_semi").withColumn(
        wcol, F.lit(-1)
    )
    return new.unionByName(old)


class CdcJoinView:
    """CDC-aware incremental materialized JOIN view: M = A ⋈ B where BOTH
    inputs are Debezium-style changelogs (op ∈ {c, u, d}) instead of
    insert-only streams — the reference's actual domain (cmd/main.go
    consumes Debezium CDC; connector.json:4-17 configures the source).

    The delta algebra is the weighted-relation (Z-set) form every IVM
    system reduces to (DBSP / differential dataflow; the bilinear rule):
    each side's micro-batch collapses to a ±1-weighted delta

        Δ̂A_t = (+1 · new images) ∪ (−1 · displaced old images)

    where "new image" is the batch's last op per primary key in ``seq``
    order (a trailing d means no new image — delete wins), and "displaced
    old image" is the pre-batch snapshot row of every pk the batch
    touches. The view delta is then the same three-term rule as the
    insert-only class, with weights MULTIPLYING through the joins:

        ΔM_t = Δ̂A ⋈ B_{<t}  ∪  A_{<t} ⋈ Δ̂B  ∪  Δ̂A ⋈ Δ̂B

    (state sides carry implicit weight +1), so an update that CHANGES the
    join key retracts the old match (−1 · old image ⋈ its old partner)
    and asserts the new one in a single merge, and a delete retracts
    exactly its contribution. ``snapshot()`` sums weights per row and
    keeps net-positive rows — equal to the plain batch join over the
    CDC-upserted final tables (driver-checked by q194).

    Input contract per side: columns (op string, seq bigint, pk, ...),
    ``seq`` globally monotone per side (Debezium's LSN/offset), non-key
    column names disjoint across sides, and both pks present in the
    joined output so a view row's identity is determined by its columns.
    Ops are upsert-lenient like q86: c and u both mean "image is now
    this"; a u/c for an unseen pk inserts, a d for an unseen pk is a
    no-op.

    Storage and replay safety are inherited wholesale: the two input
    changelogs and the weighted view deltas live in three
    ``BatchPartialStore``s; every merge reads state via ``rows_before(t)``
    (never its own partition) so a replayed batch recomputes the same
    ±1-weighted delta and overwrites the same three t-partitions — torn
    writes heal exactly as the insert-only class's pytest pins. Per-batch
    work is O(|Δ| × matched state) via key-equi joins; deletes and
    updates are the SAME cost as inserts (one −1 row each), never a view
    rescan. Compaction folds each changelog to its latest row per pk
    (d rows retained as tombstones — dropping one would resurrect a
    compacted older image) and the view store to net weights."""

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        key: str,
        a_pk: str,
        b_pk: str,
        *,
        a_store: BatchPartialStore | None = None,
        b_store: BatchPartialStore | None = None,
        land_inputs: bool = True,
    ):
        self.spark = spark
        self.key = key
        self.a_pk = a_pk
        self.b_pk = b_pk
        # Injectable changelog stores + a landing gate so a composed
        # handler (CdcViewSuite) can SHARE one changelog across the whole
        # view family and land it exactly once per batch.
        self.a_store = a_store or BatchPartialStore(spark, f"{base}/a")
        self.b_store = b_store or BatchPartialStore(spark, f"{base}/b")
        self.land_inputs = land_inputs
        self.m_store = BatchPartialStore(spark, f"{base}/m")

    @staticmethod
    def _latest(rows: DataFrame, pk: str) -> DataFrame:
        return cdc_latest(rows, pk)

    def _state(self, store: BatchPartialStore, t: int, pk: str) -> DataFrame | None:
        return cdc_state(store, t, pk)

    def _delta(
        self, batch: DataFrame, state: DataFrame | None, pk: str, wcol: str
    ) -> DataFrame:
        return cdc_delta(batch, state, pk, wcol)

    def _view_delta(
        self,
        da: DataFrame,
        db: DataFrame,
        a_old: DataFrame | None,
        b_old: DataFrame | None,
    ) -> DataFrame:
        """The three bilinear terms, every one an EQUI join on the view
        key; weights multiply through (state sides are implicitly +1).
        Exposed separately so tests/test_plans.py can pin the plan."""
        dm = da.join(db, self.key).withColumn("w", F.col("_wa") * F.col("_wb"))
        if b_old is not None:
            dm = dm.unionByName(
                da.join(b_old, self.key).withColumn("w", F.col("_wa")),
                allowMissingColumns=True,
            )
        if a_old is not None:
            dm = dm.unionByName(
                a_old.join(db, self.key).withColumn("w", F.col("_wb")),
                allowMissingColumns=True,
            )
        return dm.drop("_wa", "_wb")

    def merge(self, a_batch: DataFrame, b_batch: DataFrame, batch_id: int) -> None:
        da_cdc = a_batch.localCheckpoint()
        db_cdc = b_batch.localCheckpoint()
        a_old = self._state(self.a_store, batch_id, self.a_pk)
        b_old = self._state(self.b_store, batch_id, self.b_pk)
        da = self._delta(da_cdc, a_old, self.a_pk, "_wa")
        db = self._delta(db_cdc, b_old, self.b_pk, "_wb")
        dm = self._view_delta(da, db, a_old, b_old)
        # Land the view DELTA first, then the two changelogs: any torn
        # combination is healed by replay (rows_before(t) never sees t).
        self.m_store.land(dm, batch_id)
        if self.land_inputs:
            self.a_store.land(da_cdc, batch_id)
            self.b_store.land(db_cdc, batch_id)

    def snapshot(self) -> DataFrame:
        """Net-positive weighted rows — equal to the batch join of the
        CDC-upserted final tables (q194)."""
        rows = self.m_store.rows()
        if rows is None:
            raise ValueError("no batches have landed yet")
        cols = [c for c in rows.columns if c != "w"]
        return (
            rows.groupBy(*cols)
            .agg(F.sum("w").alias("_net"))
            .filter(F.col("_net") > 0)
            .select(*cols)
        )

    def n_partials(self) -> int:
        return self.m_store.n_partials()

    def compact_view_stores(self) -> None:
        """Fold the view store to net weights. Runs BEFORE the changelog
        folds (dependency order, r8 advice): once the view store's
        watermark covers batch t, a replayed t is refused at land — so a
        crash that then folds a changelog (making rows_before(t) include
        t and the recomputed delta degenerate) can no longer overwrite
        the live, correct view partition t."""
        rows = self.m_store.rows()
        if rows is not None:
            cols = [c for c in rows.columns if c != "w"]
            folded = (
                rows.groupBy(*cols)
                .agg(F.sum("w").cast("int").alias("w"))
                .filter(F.col("w") != 0)
            )
            self.m_store.compact(folded)

    def compact_source_stores(self) -> None:
        """Fold the changelogs to latest-per-pk (d tombstones retained —
        dropping one would resurrect a compacted older image)."""
        for store, pk in ((self.a_store, self.a_pk), (self.b_store, self.b_pk)):
            rows = store.rows()
            if rows is not None:
                store.compact(self._latest(rows, pk))

    def compact(self) -> None:
        """View store first, then changelogs — each store commits its own
        pointer swap independently, and this order is the one where every
        crash prefix heals on replay (see compact_view_stores)."""
        self.compact_view_stores()
        self.compact_source_stores()


class CdcAggregateView:
    """CDC-aware incremental GROUP-BY view: V = SELECT key, count(*),
    sum(val) FROM A GROUP BY key, maintained over a Debezium-style
    changelog (op ∈ {c,u,d}) — the aggregate face of the same Z-set
    algebra as ``CdcJoinView``. COUNT and SUM are linear in the weighted
    relation, so the per-batch view delta is ONE aggregate over the
    ±1-weighted image delta:

        ΔV_t = SELECT key, sum(w) AS Δn, sum(w · val) AS Δtotal
               FROM Δ̂A_t GROUP BY key

    — an update that moves a row between keys lands (−1, old key) and
    (+1, new key) partials in the same merge; a delete lands one −1.
    ``snapshot()`` sums the per-batch partials per key and keeps
    net-positive groups. No history is ever re-aggregated: per-batch
    work is O(|Δ|) map + one |Δ|-keyed partial aggregate (the
    rollup_index cost shape, retraction included).

    Exactness contract: pass ``val`` as a DECIMAL column (caller casts —
    e.g. DECIMAL(18,2) for money). Decimal sums are associative AND
    invertible exactly, so retract-then-assert leaves no floating-point
    residue and the maintained total equals the recompute bit-for-bit —
    the q174/q184 determinism idiom applied to state. Input contract per
    batch: (op string, seq bigint, pk, key, val, ...), seq globally
    monotone. Storage/replay: the changelog and the view partials live
    in two ``BatchPartialStore``s; merges read state via
    ``rows_before(t)`` so a replayed batch overwrites its own partitions
    with the same bytes (torn writes heal); compaction folds the
    changelog to latest-per-pk (d tombstones retained) and the view to
    per-key running sums (zero-count groups dropped — a later re-insert
    recreates them)."""

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        key: str,
        pk: str,
        val: str,
        *,
        a_store: BatchPartialStore | None = None,
        land_inputs: bool = True,
    ):
        self.spark = spark
        self.key = key
        self.pk = pk
        self.val = val
        self.a_store = a_store or BatchPartialStore(spark, f"{base}/a")
        self.land_inputs = land_inputs
        self.v_store = BatchPartialStore(spark, f"{base}/v")

    def merge(self, batch: DataFrame, batch_id: int) -> None:
        cdc = batch.localCheckpoint()
        state = cdc_state(self.a_store, batch_id, self.pk)
        delta = cdc_delta(cdc, state, self.pk, "_w")
        dv = delta.groupBy(self.key).agg(
            F.sum("_w").cast("bigint").alias("dn"),
            F.sum(F.col("_w") * F.col(self.val)).alias("dtotal"),
        )
        # View partials first, then the changelog: torn combinations heal
        # on replay because rows_before(t) never sees partition t.
        self.v_store.land(dv, batch_id)
        if self.land_inputs:
            self.a_store.land(cdc, batch_id)

    def snapshot(self) -> DataFrame:
        """(key, n, total) for every net-present group — equal to the
        batch GROUP BY over the CDC-upserted final table (q196)."""
        rows = self.v_store.rows()
        if rows is None:
            raise ValueError("no batches have landed yet")
        return (
            rows.groupBy(self.key)
            .agg(
                F.sum("dn").cast("bigint").alias("n"),
                F.sum("dtotal").alias("total"),
            )
            .filter(F.col("n") > 0)
        )

    def n_partials(self) -> int:
        return self.v_store.n_partials()

    def compact_view_stores(self) -> None:
        rows = self.v_store.rows()
        if rows is not None:
            folded = (
                rows.groupBy(self.key)
                .agg(
                    F.sum("dn").cast("bigint").alias("dn"),
                    F.sum("dtotal").alias("dtotal"),
                )
                .filter(F.col("dn") != 0)
            )
            self.v_store.compact(folded)

    def compact_source_stores(self) -> None:
        rows = self.a_store.rows()
        if rows is not None:
            self.a_store.compact(cdc_latest(rows, self.pk))

    def compact(self) -> None:
        # View store first, then the changelog (dependency order, r8
        # advice): a crash between the two pointer commits must leave a
        # prefix replay heals — see CdcJoinView.compact_view_stores.
        self.compact_view_stores()
        self.compact_source_stores()


class CdcLeftJoinView:
    """CDC-aware incremental LEFT OUTER join view: M = A ⟕ B on ``key``
    under op ∈ {c,u,d} on both sides — the outer-join face of the IVM
    family, and like MIN/MAX a NON-LINEAR case: whether an A row is
    null-padded depends on whether ANY B row shares its key (an
    existence indicator), so a B-side transition between zero and some
    matches must flip the padding of every A row on that key — there is
    no per-row ±1 retraction for that. The support-set answer again:
    per batch, recompute the left join ONLY for the touched keys from
    both sides' post-batch snapshots,

        touched = keys named by either batch's old ∪ new images
        ΔV_t    = (A_after ⋉ touched) ⟕ (B_after ⋉ touched)

    and version the view BY KEY: every touched key lands one MARKER row
    (bseq = batch id) plus its recomputed rows; ``snapshot()`` takes,
    per key, the rows of the latest batch that recomputed it — so a key
    whose recompute produced zero rows (all its A rows deleted) is
    superseded to empty rather than left stale. Work is O(touched keys'
    state on both sides); post-batch snapshots derive from the
    pre-batch state (never a history re-window); every join is
    key-equi. Torn view/changelog writes heal on replay (rows_before(t)
    never sees t); compaction folds the changelogs to latest-per-pk and
    the view to each key's latest recompute. Input contract as the
    siblings: (op string, seq bigint, pk, ...), seq globally monotone,
    non-key columns disjoint, join key present on both sides."""

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        key: str,
        a_pk: str,
        b_pk: str,
        *,
        a_store: BatchPartialStore | None = None,
        b_store: BatchPartialStore | None = None,
        land_inputs: bool = True,
    ):
        self.spark = spark
        self.key = key
        self.a_pk = a_pk
        self.b_pk = b_pk
        self.a_store = a_store or BatchPartialStore(spark, f"{base}/a")
        self.b_store = b_store or BatchPartialStore(spark, f"{base}/b")
        self.land_inputs = land_inputs
        self.v_store = BatchPartialStore(spark, f"{base}/v")

    @staticmethod
    def _after(
        cdc: DataFrame, state: DataFrame | None, pk: str
    ) -> tuple[DataFrame, DataFrame]:
        """(post-batch alive images, keys this batch touches on this
        side) — both derived from the pre-batch snapshot plus the
        batch's last image per pk."""
        new_alive = (
            cdc_latest(cdc, pk).filter(F.col("op") != "d").drop("op", "seq")
        )
        if state is None:
            return new_alive, new_alive
        batch_pks = cdc.select(pk).distinct()
        after = state.join(batch_pks, pk, "left_anti").unionByName(new_alive)
        touched = new_alive.unionByName(
            state.join(batch_pks, pk, "left_semi"), allowMissingColumns=True
        )
        return after, touched

    def merge(self, a_batch: DataFrame, b_batch: DataFrame, batch_id: int) -> None:
        da_cdc = a_batch.localCheckpoint()
        db_cdc = b_batch.localCheckpoint()
        a_after, a_touch = self._after(
            da_cdc, cdc_state(self.a_store, batch_id, self.a_pk), self.a_pk
        )
        b_after, b_touch = self._after(
            db_cdc, cdc_state(self.b_store, batch_id, self.b_pk), self.b_pk
        )
        touched = (
            a_touch.select(self.key)
            .unionByName(b_touch.select(self.key))
            .distinct()
            .localCheckpoint()
        )
        lj = a_after.join(touched, self.key, "left_semi").join(
            b_after.join(touched, self.key, "left_semi"), self.key, "left"
        )
        data = lj.select(
            F.lit(False).alias("is_marker"), F.lit(int(batch_id)).alias("bseq"), "*"
        )
        markers = touched.select(
            F.lit(True).alias("is_marker"),
            F.lit(int(batch_id)).alias("bseq"),
            self.key,
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in lj.schema.fields
                if f.name != self.key
            ],
        )
        self.v_store.land(data.unionByName(markers), batch_id)
        if self.land_inputs:
            self.a_store.land(da_cdc, batch_id)
            self.b_store.land(db_cdc, batch_id)

    def snapshot(self) -> DataFrame:
        """Per key, the rows of the LATEST batch that recomputed it —
        equal to the batch left join over the CDC-upserted final tables
        (q198)."""
        rows = self.v_store.rows()
        if rows is None:
            raise ValueError("no batches have landed yet")
        latest = (
            rows.filter("is_marker")
            .groupBy(self.key)
            .agg(F.max("bseq").alias("bseq"))
        )
        return (
            rows.filter(~F.col("is_marker"))
            .join(latest, [self.key, "bseq"], "inner")
            .drop("bseq", "is_marker")
        )

    def n_partials(self) -> int:
        return self.v_store.n_partials()

    def compact_view_stores(self) -> None:
        rows = self.v_store.rows()
        if rows is not None:
            latest = (
                rows.filter("is_marker")
                .groupBy(self.key)
                .agg(F.max("bseq").alias("bseq"))
            )
            folded = rows.join(latest, [self.key, "bseq"], "left_semi")
            self.v_store.compact(folded)

    def compact_source_stores(self) -> None:
        for store, pk in ((self.a_store, self.a_pk), (self.b_store, self.b_pk)):
            rows = store.rows()
            if rows is not None:
                store.compact(cdc_latest(rows, pk))

    def compact(self) -> None:
        # View store first, then changelogs (dependency order, r8 advice)
        # — see CdcJoinView.compact_view_stores for the crash argument.
        self.compact_view_stores()
        self.compact_source_stores()


class CdcMinMaxView:
    """CDC-aware incremental MIN/MAX view: V = SELECT key, count(*),
    min(val), max(val) FROM A GROUP BY key under op ∈ {c,u,d} — the
    NON-LINEAR aggregate case. MIN/MAX are not invertible: deleting the
    row that held a key's minimum cannot be retracted with a −1 partial
    (the new minimum is whatever survives — the "support set" problem
    every IVM paper treats separately from the linear aggregates). The
    standard answer, and this implementation: per batch, recompute the
    aggregate ONLY for the keys the batch touches, from those keys'
    post-batch state:

        touched = keys of the batch's old ∪ new images
        ΔV_t    = SELECT key, count(*), min(val), max(val)
                  FROM state_after SEMI JOIN touched GROUP BY key
                  (keys touched but left empty land an n = 0 row)

    and the view store keeps the LATEST row per key (``bseq`` =
    batch id; ``snapshot()`` is latest-per-key, n > 0). Aggregate work
    is O(touched keys' state): post-batch images derive from the
    pre-batch snapshot (state minus batch pks, plus the batch's alive
    images) — never a re-window of history — and only touched keys
    reach the GROUP BY; compacting the changelog to latest-per-pk makes
    the snapshot read itself the base-table scan, which a key-bucketed
    layout prunes at scale. Replay lands the same recomputed rows in
    the same batch partition (idempotent overwrite); a torn
    view/changelog write heals on replay like the siblings. Input
    contract: (op string, seq bigint, pk, key, val, ...), seq globally
    monotone."""

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        key: str,
        pk: str,
        val: str,
        *,
        a_store: BatchPartialStore | None = None,
        land_inputs: bool = True,
    ):
        self.spark = spark
        self.key = key
        self.pk = pk
        self.val = val
        self.a_store = a_store or BatchPartialStore(spark, f"{base}/a")
        self.land_inputs = land_inputs
        self.v_store = BatchPartialStore(spark, f"{base}/v")

    def merge(self, batch: DataFrame, batch_id: int) -> None:
        cdc = batch.localCheckpoint()
        state = cdc_state(self.a_store, batch_id, self.pk)
        # post-batch alive images: the batch's last image per pk wins
        # over the pre-batch snapshot (delete-wins within the batch)
        new_alive = (
            cdc_latest(cdc, self.pk).filter(F.col("op") != "d").drop("op", "seq")
        )
        batch_pks = cdc.select(self.pk).distinct()
        if state is None:
            after = new_alive
            touched = new_alive.select(self.key)
        else:
            after = state.join(batch_pks, self.pk, "left_anti").unionByName(
                new_alive
            )
            # touched keys: every key an old or new image of this batch
            # names (a key-moving update touches both)
            touched = new_alive.select(self.key).unionByName(
                state.join(batch_pks, self.pk, "left_semi").select(self.key)
            )
        touched = touched.distinct().localCheckpoint()
        recomputed = (
            after.join(touched, self.key, "left_semi")
            .groupBy(self.key)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.min(self.val).alias("vmin"),
                F.max(self.val).alias("vmax"),
            )
        )
        # keys touched but now EMPTY must land an n=0 row — the latest-
        # per-key read otherwise resurrects their previous aggregate
        emptied = touched.join(recomputed, self.key, "left_anti").select(
            self.key,
            F.lit(0).cast("bigint").alias("n"),
            F.lit(None).cast(recomputed.schema["vmin"].dataType).alias("vmin"),
            F.lit(None).cast(recomputed.schema["vmax"].dataType).alias("vmax"),
        )
        dv = recomputed.unionByName(emptied).withColumn(
            "bseq", F.lit(int(batch_id))
        )
        self.v_store.land(dv, batch_id)
        if self.land_inputs:
            self.a_store.land(cdc, batch_id)

    def snapshot(self) -> DataFrame:
        """(key, n, vmin, vmax) for every net-present group — equal to
        the batch GROUP BY over the CDC-upserted final table (q197)."""
        rows = self.v_store.rows()
        if rows is None:
            raise ValueError("no batches have landed yet")
        w = Window.partitionBy(self.key).orderBy(F.desc("bseq"))
        return (
            rows.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col("n") > 0))
            .drop("_rn", "bseq")
        )

    def n_partials(self) -> int:
        return self.v_store.n_partials()

    def compact_view_stores(self) -> None:
        rows = self.v_store.rows()
        if rows is not None:
            w = Window.partitionBy(self.key).orderBy(F.desc("bseq"))
            folded = (
                rows.withColumn("_rn", F.row_number().over(w))
                .filter((F.col("_rn") == 1) & (F.col("n") > 0))
                .drop("_rn")
            )
            self.v_store.compact(folded)

    def compact_source_stores(self) -> None:
        rows = self.a_store.rows()
        if rows is not None:
            self.a_store.compact(cdc_latest(rows, self.pk))

    def compact(self) -> None:
        # View store first, then the changelog (dependency order, r8
        # advice) — see CdcJoinView.compact_view_stores.
        self.compact_view_stores()
        self.compact_source_stores()


def cdc_support_delta(
    cdc: DataFrame, state: DataFrame | None, pk: str, key: str, val: str
) -> DataFrame:
    """±-weighted delta of the (key, val) SUPPORT projection: the net
    change in alive-row count per (key, val) pair contributed by one CDC
    micro-batch. NULL values are excluded (COUNT(DISTINCT) and top-k
    semantics both ignore them); pairs whose batch delta nets to zero
    (a row moves off a value while another moves on) are dropped — they
    can cause no transition. One |Δ|-keyed partial aggregate."""
    delta = cdc_delta(cdc, state, pk, "_w").filter(F.col(val).isNotNull())
    return (
        delta.groupBy(key, val)
        .agg(F.sum("_w").cast("bigint").alias("dw"))
        .filter(F.col("dw") != 0)
    )


class CdcDistinctCountView:
    """CDC-aware incremental COUNT(DISTINCT) view: V = SELECT key,
    count(DISTINCT val) FROM A GROUP BY key under op ∈ {c,u,d} — the
    TWO-LEVEL case every IVM system treats as the canonical non-trivial
    aggregate: distinct count is not linear in the row Z-set (two rows
    carrying the same value add once), but it IS linear in the SUPPORT
    of the (key, val) projection. The standard factoring is a view
    stacked on a view:

        level 1 (support store S): per (key, val), the net number of
        alive rows holding that pair — maintained LINEARLY, one
        |Δ|-keyed aggregate over the ±1-weighted image delta per batch;
        level 2 (view store V): the distinct count changes by +1 exactly
        when a pair's net weight transitions 0 → positive and by −1 on
        positive → 0, so the view delta needs each touched pair's
        PRE-BATCH net weight — an equi join of the batch's support
        delta against S (O(|Δ| × touched pairs' partials), never a
        rescan of the support).

    ``snapshot()`` sums the per-batch transition partials per key and
    keeps positive groups — equal to the plain COUNT(DISTINCT) over the
    CDC-upserted final table (driver-checked by q199). Input contract
    as the siblings: (op string, seq bigint, pk, key, val, ...), seq
    globally monotone per side. Storage/replay: changelog, support, and
    view partials live in three ``BatchPartialStore``s; every merge
    reads all three via ``rows_before(t)`` so a replayed batch lands
    identical bytes in its own partitions and torn writes heal;
    compaction folds the changelog to latest-per-pk (d tombstones
    retained), the support to net weights (zeros dropped), and the view
    to per-key running counts."""

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        key: str,
        pk: str,
        val: str,
        *,
        a_store: BatchPartialStore | None = None,
        s_store: BatchPartialStore | None = None,
        land_inputs: bool = True,
        land_support: bool = True,
    ):
        self.spark = spark
        self.key = key
        self.pk = pk
        self.val = val
        self.a_store = a_store or BatchPartialStore(spark, f"{base}/a")
        self.s_store = s_store or BatchPartialStore(spark, f"{base}/s")
        self.land_inputs = land_inputs
        self.land_support = land_support
        self.v_store = BatchPartialStore(spark, f"{base}/v")

    def _transitions(self, ds: DataFrame, s_pre: DataFrame | None) -> DataFrame:
        """Per-key distinct-count delta from the batch's support delta:
        each touched pair's pre-batch net weight (equi join against the
        support store, touched pairs only) decides a 0↔positive
        transition. Exposed so tests/test_plans.py can pin the plan."""
        if s_pre is None:
            joined = ds.withColumn("w_pre", F.lit(0).cast("bigint"))
        else:
            pre = (
                s_pre.join(
                    ds.select(self.key, self.val), [self.key, self.val], "left_semi"
                )
                .groupBy(self.key, self.val)
                .agg(F.sum("dw").cast("bigint").alias("w_pre"))
            )
            joined = ds.join(pre, [self.key, self.val], "left").withColumn(
                "w_pre", F.coalesce(F.col("w_pre"), F.lit(0)).cast("bigint")
            )
        up = (F.col("w_pre") <= 0) & (F.col("w_pre") + F.col("dw") > 0)
        down = (F.col("w_pre") > 0) & (F.col("w_pre") + F.col("dw") <= 0)
        return (
            joined.select(
                self.key,
                F.when(up, F.lit(1))
                .when(down, F.lit(-1))
                .otherwise(F.lit(0))
                .alias("dd"),
            )
            .filter(F.col("dd") != 0)
            .groupBy(self.key)
            .agg(F.sum("dd").cast("bigint").alias("ddc"))
        )

    def merge(self, batch: DataFrame, batch_id: int) -> None:
        cdc = batch.localCheckpoint()
        state = cdc_state(self.a_store, batch_id, self.pk)
        ds = cdc_support_delta(
            cdc, state, self.pk, self.key, self.val
        ).localCheckpoint()
        dv = self._transitions(ds, self.s_store.rows_before(batch_id))
        # View partials first, then support, then changelog: any torn
        # combination heals on replay (rows_before(t) never sees t).
        self.v_store.land(dv, batch_id)
        if self.land_support:
            self.s_store.land(ds, batch_id)
        if self.land_inputs:
            self.a_store.land(cdc, batch_id)

    def snapshot(self) -> DataFrame:
        """(key, n_distinct) for every net-present group — equal to the
        batch COUNT(DISTINCT) over the CDC-upserted final table (q199)."""
        rows = self.v_store.rows()
        if rows is None:
            raise ValueError("no batches have landed yet")
        return (
            rows.groupBy(self.key)
            .agg(F.sum("ddc").cast("bigint").alias("n_distinct"))
            .filter(F.col("n_distinct") > 0)
        )

    def n_partials(self) -> int:
        return self.v_store.n_partials()

    def compact_view_stores(self) -> None:
        rows = self.v_store.rows()
        if rows is not None:
            folded = (
                rows.groupBy(self.key)
                .agg(F.sum("ddc").cast("bigint").alias("ddc"))
                .filter(F.col("ddc") != 0)
            )
            self.v_store.compact(folded)

    def compact_source_stores(self) -> None:
        # Support store BEFORE the changelog: the view reads the support
        # via rows_before(t), so the support folding batch t while the
        # changelog had not is safe (a replayed t is refused at both the
        # view and support lands), while the reverse would feed the
        # transition join a pre-state that already includes t.
        rows = self.s_store.rows()
        if rows is not None:
            folded = (
                rows.groupBy(self.key, self.val)
                .agg(F.sum("dw").cast("bigint").alias("dw"))
                .filter(F.col("dw") != 0)
            )
            self.s_store.compact(folded)
        rows = self.a_store.rows()
        if rows is not None:
            self.a_store.compact(cdc_latest(rows, self.pk))

    def compact(self) -> None:
        # Dependency order (r8 advice): view store, then support, then
        # the changelog — see CdcJoinView.compact_view_stores.
        self.compact_view_stores()
        self.compact_source_stores()


class CdcTopKView:
    """CDC-aware incremental TOP-K-PER-GROUP view: V = the k most
    frequent values per key (count desc, value asc tie-break) under
    op ∈ {c,u,d} — the HYBRID case composing both maintenance
    strategies the family demonstrates:

        level 1 (support store S): per-(key, val) alive-row counts,
        maintained LINEARLY like ``CdcDistinctCountView`` — one
        |Δ|-keyed aggregate over the ±1-weighted image delta per batch;
        level 2: the top-k ranking is an ORDER STATISTIC over a key's
        support — not linear (evicting the current #k promotes whatever
        ranks next), so like MIN/MAX the merge recomputes it ONLY for
        the touched keys, reading those keys' post-batch net support
        from S (pre-batch partials ⋈ touched keys, plus the batch's
        own delta — an equi semi join, never a support rescan).

    The view store versions BY KEY with marker rows (the
    ``CdcLeftJoinView`` idiom, since a key's recompute is a row SET):
    ``snapshot()`` takes each key's latest recompute, so a key whose
    values all died supersedes to empty. Equal to the plain
    count/rank/filter over the CDC-upserted final table
    (driver-checked by q200). Contract/storage/replay/compaction as
    the siblings; ties broken (count desc, val asc) so the result is
    deterministic on both engines."""

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        key: str,
        pk: str,
        val: str,
        k: int,
        *,
        a_store: BatchPartialStore | None = None,
        s_store: BatchPartialStore | None = None,
        land_inputs: bool = True,
        land_support: bool = True,
    ):
        self.spark = spark
        self.key = key
        self.pk = pk
        self.val = val
        self.k = int(k)
        self.a_store = a_store or BatchPartialStore(spark, f"{base}/a")
        self.s_store = s_store or BatchPartialStore(spark, f"{base}/s")
        self.land_inputs = land_inputs
        self.land_support = land_support
        self.v_store = BatchPartialStore(spark, f"{base}/v")

    def _topk(
        self, ds: DataFrame, touched: DataFrame, s_pre: DataFrame | None
    ) -> DataFrame:
        """(key, val, n) top-k rows recomputed for the touched keys from
        their post-batch net support: the support store enters through
        one equi semi join on the key, the ranking window partitions by
        key over touched rows only. Exposed so tests/test_plans.py can
        pin the plan."""
        if s_pre is None:
            net_src = ds
        else:
            net_src = s_pre.join(touched, self.key, "left_semi").unionByName(ds)
        net = (
            net_src.groupBy(self.key, self.val)
            .agg(F.sum("dw").cast("bigint").alias("n"))
            .filter(F.col("n") > 0)
        )
        w = Window.partitionBy(self.key).orderBy(F.desc("n"), F.asc(self.val))
        return (
            net.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= self.k)
            .drop("_rn")
        )

    def merge(self, batch: DataFrame, batch_id: int) -> None:
        cdc = batch.localCheckpoint()
        state = cdc_state(self.a_store, batch_id, self.pk)
        ds = cdc_support_delta(
            cdc, state, self.pk, self.key, self.val
        ).localCheckpoint()
        touched = ds.select(self.key).distinct().localCheckpoint()
        topk = self._topk(ds, touched, self.s_store.rows_before(batch_id))
        data = topk.select(
            F.lit(False).alias("is_marker"),
            F.lit(int(batch_id)).alias("bseq"),
            self.key,
            self.val,
            "n",
        )
        markers = touched.select(
            F.lit(True).alias("is_marker"),
            F.lit(int(batch_id)).alias("bseq"),
            self.key,
            F.lit(None).cast(topk.schema[self.val].dataType).alias(self.val),
            F.lit(None).cast("bigint").alias("n"),
        )
        self.v_store.land(data.unionByName(markers), batch_id)
        if self.land_support:
            self.s_store.land(ds, batch_id)
        if self.land_inputs:
            self.a_store.land(cdc, batch_id)

    def snapshot(self) -> DataFrame:
        """(key, val, n) — each key's latest top-k recompute, equal to
        the batch count/rank/filter over the CDC-upserted final table
        (q200)."""
        rows = self.v_store.rows()
        if rows is None:
            raise ValueError("no batches have landed yet")
        latest = (
            rows.filter("is_marker").groupBy(self.key).agg(F.max("bseq").alias("bseq"))
        )
        return (
            rows.filter(~F.col("is_marker"))
            .join(latest, [self.key, "bseq"], "inner")
            .drop("bseq", "is_marker")
        )

    def n_partials(self) -> int:
        return self.v_store.n_partials()

    def compact_view_stores(self) -> None:
        rows = self.v_store.rows()
        if rows is not None:
            latest = (
                rows.filter("is_marker")
                .groupBy(self.key)
                .agg(F.max("bseq").alias("bseq"))
            )
            folded = rows.join(latest, [self.key, "bseq"], "left_semi")
            self.v_store.compact(folded)

    def compact_source_stores(self) -> None:
        # Support before changelog — same argument as the distinct view.
        rows = self.s_store.rows()
        if rows is not None:
            folded = (
                rows.groupBy(self.key, self.val)
                .agg(F.sum("dw").cast("bigint").alias("dw"))
                .filter(F.col("dw") != 0)
            )
            self.s_store.compact(folded)
        rows = self.a_store.rows()
        if rows is not None:
            self.a_store.compact(cdc_latest(rows, self.pk))

    def compact(self) -> None:
        # Dependency order (r8 advice): view store, then support, then
        # the changelog — see CdcJoinView.compact_view_stores.
        self.compact_view_stores()
        self.compact_source_stores()


class CdcViewSuite:
    """One foreachBatch handler driving the WHOLE CDC view family off a
    single delivered changelog pair — the composed-ingest pattern
    (streaming/corpus_ingest.py) applied to incremental view
    maintenance, with the state-sharing a 100 TB deployment requires:

        shared: one A changelog store, one B changelog store, one
        (key, cat_val) support store — landed ONCE per batch, however
        many views read them (the naive composition persists the same
        changelog per view: 6× the write volume and 6× the state);
        per view: only each view's own delta partitions.

    Members: the inner-join view M = A ⋈ B, the left-join view A ⟕ B,
    the linear aggregate (count + DECIMAL-exact sum of ``num_val``),
    min/max of ``num_val``, COUNT(DISTINCT ``cat_val``), and the top-k
    most frequent ``cat_val`` — every maintenance strategy the family
    implements, fed by one batch image-delta computation per store.

    ``merge`` runs every view's delta against the SHARED pre-batch
    state (each reads ``rows_before(t)``, so landing order within the
    batch is free), then lands the two changelogs last — the
    torn-write-safe direction for all six views at once: a crash
    leaving any prefix of the nine landings is healed by Structured
    Streaming's re-delivery exactly as for the single views
    (pytest-pinned). ``snapshot_dashboard()`` joins the per-key views
    into one row per key — equal to the single GROUP BY + join over
    the CDC-upserted final tables (driver-checked by q201).
    ``compact()`` folds the shared stores once and each view store by
    its own algebra (the per-view compacts skip stores another view
    already folded — a folded store has no live partials)."""

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        key: str,
        a_pk: str,
        b_pk: str,
        num_val: str,
        cat_val: str,
        k: int = 2,
    ):
        self.spark = spark
        self.key = key
        self.a_store = BatchPartialStore(spark, f"{base}/a")
        self.b_store = BatchPartialStore(spark, f"{base}/b")
        self.s_store = BatchPartialStore(spark, f"{base}/s")
        share = {"a_store": self.a_store, "land_inputs": False}
        self.join = CdcJoinView(
            spark, f"{base}/join", key, a_pk, b_pk, b_store=self.b_store, **share
        )
        self.left = CdcLeftJoinView(
            spark, f"{base}/left", key, a_pk, b_pk, b_store=self.b_store, **share
        )
        self.agg = CdcAggregateView(spark, f"{base}/agg", key, a_pk, num_val, **share)
        self.minmax = CdcMinMaxView(spark, f"{base}/mm", key, a_pk, num_val, **share)
        self.distinct = CdcDistinctCountView(
            spark, f"{base}/dc", key, a_pk, cat_val, s_store=self.s_store, **share
        )
        self.topk = CdcTopKView(
            spark,
            f"{base}/tk",
            key,
            a_pk,
            cat_val,
            k,
            s_store=self.s_store,
            land_support=False,  # the distinct view lands the shared support
            **share,
        )

    def merge(self, a_batch: DataFrame, b_batch: DataFrame, batch_id: int) -> None:
        da = a_batch.localCheckpoint()
        db = b_batch.localCheckpoint()
        self.join.merge(da, db, batch_id)
        self.left.merge(da, db, batch_id)
        self.agg.merge(da, batch_id)
        self.minmax.merge(da, batch_id)
        self.distinct.merge(da, batch_id)  # lands the shared support delta
        self.topk.merge(da, batch_id)
        # The shared changelogs land LAST — every view's delta for any
        # replayed batch recomputes against rows_before(t), so a crash
        # after any prefix of the landings re-lands identical bytes.
        self.a_store.land(da, batch_id)
        self.b_store.land(db, batch_id)

    def snapshot_dashboard(self) -> DataFrame:
        """One row per net-present key: (key, n, total, vmin, vmax,
        n_distinct, n_matched) — the linear aggregate, min/max,
        distinct-count, and inner-join-match-count views joined on the
        key. The aggregate and min/max key sets coincide (each is
        exactly the alive keys); the distinct view excludes NULL values
        and net-zero groups, so an alive key whose ``cat_val`` rows are
        all NULL is LEFT-joined and filled with 0 (r8 advice — the
        inner join silently dropped such keys; SQL's COUNT(DISTINCT)
        over the final table keeps them at 0), as is the match count
        for keys with no B-side partner."""
        g = self.agg.snapshot()
        x = self.minmax.snapshot().drop("n")
        d = self.distinct.snapshot()
        jm = (
            self.join.snapshot()
            .groupBy(self.key)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_matched"))
        )
        return (
            g.join(x, self.key)
            .join(d, self.key, "left")
            .join(jm, self.key, "left")
            .na.fill({"n_matched": 0, "n_distinct": 0})
        )

    def n_partials(self) -> int:
        return self.a_store.n_partials()

    def compact(self) -> None:
        """Dependency order ACROSS the whole suite (r8 advice): every
        member's VIEW store folds before any shared store — if a shared
        changelog folded batch t while any member's view store had not,
        a replayed t would compute that member's delta against a
        pre-state that already includes t and overwrite its live,
        correct view partition. The member compacts would each fold the
        shared stores in the right order individually, but interleaved
        (join folds the changelog before left folds its view) the
        cross-member prefix is unsafe — so the suite sequences all view
        folds first, then the shared support, then the changelogs."""
        members = (self.join, self.left, self.agg, self.minmax, self.distinct, self.topk)
        for view in members:
            view.compact_view_stores()
        rows = self.s_store.rows()
        if rows is not None:
            folded = (
                rows.groupBy(self.key, self.distinct.val)
                .agg(F.sum("dw").cast("bigint").alias("dw"))
                .filter(F.col("dw") != 0)
            )
            self.s_store.compact(folded)
        for store, pk in ((self.a_store, self.join.a_pk), (self.b_store, self.join.b_pk)):
            rows = store.rows()
            if rows is not None:
                store.compact(cdc_latest(rows, pk))
