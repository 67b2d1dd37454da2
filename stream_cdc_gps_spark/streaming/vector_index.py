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

GENERATIONS (r7 judge task #5): real FAISS deployments don't freeze
codebooks forever — when the distribution drifts they RETRAIN and
re-encode. ``retrain()`` is that operation as an atomic generation swap:
train fresh Lloyd codebooks on every raw vector ingested so far,
re-encode the whole corpus with them, write codebooks + encoded base
into a NEW generation directory, then swap one fsync'd pointer file.
A search captures the pointer once (``generation()``) and reads that
generation's codebooks and base throughout — it can never see new
codebooks with old codes or vice versa. A crash anywhere mid-retrain
leaves the pointer on the old generation, which remains complete; the
half-written new generation is overwritten by the next attempt. The raw
vectors are kept in their own append-only store — the retrain substrate
(FAISS likewise needs original vectors to re-encode), costing one extra
partition write per merge.

Persistence is ``partial_store.BatchPartialStore`` like the siblings:
per-batch (vec_id, cell, code0..M-1) rows partitioned by ``batch_id``
with dynamic partition overwrite (replay-idempotent without dedup
state), pointer-committed compaction, folded-replay refusal. The
generation created by ``retrain()`` adopts the vector store's batch
watermark, so a replay of an already-folded batch is refused by the new
generation's store exactly as compaction refuses it everywhere else. At
serving scale the base table is exactly the FAISS IVF layout: the
searcher (``_ivfadc_query``) meets it with an EQUI join on cell id, and
the code store is BUCKETED BY CELL (r10): ``base_table(cells=...)`` takes
the probed cell ids (a bounded literal collect —
``operators/similarity._probe_cells``) and reads only those cells'
shard directories, so a 2-probe search opens 2 posting lists, not the
corpus — the 10⁹-vector shape, now the actual layout.

Reference parity note: the reference (cmd/main.go) has no vector
surface; this extends SURVEY.md §2B's IVFADC rows (q186, q187) to the
streaming column.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from stream_cdc_gps_spark.operators.similarity import _ivfadc_encode
from stream_cdc_gps_spark.streaming.join_view import (
    IMG_W,
    _concurrently,
    cdc_delta,
    cdc_latest,
    cdc_state,
)
from stream_cdc_gps_spark.streaming.partial_store import BatchPartialStore

Cents = list[tuple[int, list[float]]]
Cbs = dict[int, list[tuple[int, list[float]]]]


class IncrementalVectorIndex:
    """foreachBatch body maintaining an IVFADC base table over an
    embedding stream. Codebooks are frozen per GENERATION: construction
    seeds generation 0; ``retrain()`` swaps in a new generation trained
    on the accumulated corpus. ``merge`` is the batch handler;
    ``base_table()`` the searchable snapshot of the current generation
    (feed it to ``operators/similarity._ivfadc_query`` together with
    ``generation()``'s codebooks)."""

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        cents: Cents,
        cbs: Cbs,
        *,
        n_cell_buckets: int = 64,
    ):
        self.spark = spark
        self.base = base
        # raw vectors stay unbucketed: their only reader is the retrain,
        # which is a deliberate full scan by definition
        self.vec_store = BatchPartialStore(spark, f"{base}/vecs")
        self.n_cell_buckets = int(n_cell_buckets)
        self._cb_cache: dict[int, tuple[Cents, Cbs]] = {0: (cents, cbs)}
        self.store = self._store_of(self.gen())  # current-gen code store
        self.path = self.store.partials_path  # live-partials dir (crash tests)

    # -- generation pointer --------------------------------------------------
    def _gen_meta_path(self) -> str:
        return f"{self.base}/meta.json"

    def gen(self) -> int:
        """Current generation id (0 until the first retrain commits)."""
        try:
            with open(self._gen_meta_path()) as f:
                return int(json.load(f)["gen"])
        except FileNotFoundError:
            return 0

    def _commit_gen(self, gen: int) -> None:
        """The atomic swap: everything the new generation needs is on
        disk before this pointer moves (fsync'd tmp + rename + dir fsync
        — the partial_store._commit_meta discipline)."""
        os.makedirs(self.base, exist_ok=True)
        tmp = f"{self._gen_meta_path()}.tmp"
        with open(tmp, "w") as f:
            json.dump({"gen": int(gen)}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._gen_meta_path())
        dfd = os.open(self.base, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def _store_of(self, gen: int) -> BatchPartialStore:
        # cell-bucketed: a search pruned by its probe cells reads only
        # those posting lists' shards (every generation, same layout)
        return BatchPartialStore(
            self.spark,
            f"{self.base}/gen/v{gen}/codes",
            bucket_cols=["cell"],
            n_buckets=self.n_cell_buckets,
        )

    def _codebooks_of(self, gen: int) -> tuple[Cents, Cbs]:
        if gen not in self._cb_cache:
            with open(f"{self.base}/gen/v{gen}/codebooks.json") as f:
                raw = json.load(f)
            cents = [(int(cid), v) for cid, v in raw["cents"]]
            cbs = {
                int(m): [(int(cid), v) for cid, v in rows]
                for m, rows in raw["cbs"].items()
            }
            self._cb_cache[gen] = (cents, cbs)
        return self._cb_cache[gen]

    def generation(self) -> tuple[int, Cents, Cbs]:
        """One consistent read of the pointer + that generation's
        codebooks — capture this ONCE per search and pair it with
        ``base_table(gen)`` so the whole search runs in one generation."""
        g = self.gen()
        cents, cbs = self._codebooks_of(g)
        return g, cents, cbs

    # -- ingestion -------------------------------------------------------------
    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        """Land the raw vectors (retrain substrate), then encode the
        micro-batch with the CURRENT generation's frozen codebooks
        (map-only) and land the codes. Both lands are batch-id partition
        overwrites; a torn write between them is healed by replay."""
        batch_df = batch_df.localCheckpoint()
        g = self.gen()
        cents, cbs = self._codebooks_of(g)
        # Both lands overwrite only their own t-partitions — concurrent
        # (a torn write between them is healed by replay either way).
        _concurrently(
            lambda: self.vec_store.land(batch_df, batch_id),
            lambda: self._store_of(g).land(
                _ivfadc_encode(batch_df, cents, cbs), batch_id
            ),
        )

    # -- retrain ---------------------------------------------------------------
    def retrain(self) -> int:
        """Generation swap: Lloyd-train fresh coarse cells and PQ
        codebooks on EVERY raw vector ingested so far, re-encode the
        corpus, and commit codebooks + base atomically via the pointer.
        Returns the new generation id. Crash-safe at every step: until
        ``_commit_gen`` the old generation stays authoritative, and a
        repeated attempt overwrites the orphaned half-written directory.
        Cost is one training run + one full map-only re-encode — the
        deliberate, occasional rebuild, not the per-batch path."""
        from stream_cdc_gps_spark.operators.similarity import (
            _lloyd_train_ivf,
            _lloyd_train_pq,
            _train_concurrently,
        )

        vecs = self.vec_store.rows()
        if vecs is None:
            raise ValueError("no batches have landed yet")
        vecs = vecs.localCheckpoint()
        cents, cbs = _train_concurrently(
            lambda: _lloyd_train_ivf(vecs), lambda: _lloyd_train_pq(vecs)
        )
        new_gen = self.gen() + 1
        gen_dir = f"{self.base}/gen/v{new_gen}"
        os.makedirs(gen_dir, exist_ok=True)
        tmp = f"{gen_dir}/codebooks.json.tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"cents": cents, "cbs": {str(m): v for m, v in cbs.items()}}, f
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, f"{gen_dir}/codebooks.json")
        # Re-encode the whole corpus into the new generation's store; its
        # watermark adopts the vector store's, so folded-batch replays are
        # refused in the new generation too.
        self._store_of(new_gen).bootstrap(
            _ivfadc_encode(vecs, cents, cbs), self.vec_store.max_batch_id()
        )
        self._commit_gen(new_gen)
        self._cb_cache[new_gen] = (cents, cbs)
        self.store = self._store_of(new_gen)
        self.path = self.store.partials_path
        return new_gen

    # -- reading ---------------------------------------------------------------
    def base_table(
        self, gen: int | None = None, cells: list[int] | None = None
    ) -> DataFrame:
        """Every (vec_id, cell, code…) of one generation (current when
        unspecified) — the IVF base the searcher equi-joins on cell id.
        With ``cells`` (the search's probe list), only those cells'
        shard directories are scanned — a PARTITION filter, so the
        search cost is the probed posting lists, not the corpus. The
        pruned read is a superset by bucket (co-resident cells appear);
        the searcher's cell equi join filters exactly, so results are
        identical to the unpruned read."""
        store = self._store_of(self.gen() if gen is None else gen)
        buckets = None
        if cells is not None and store.bucket_cols:
            # literal probe cells -> their shard ids; INT on both sides
            # (the encode's cell comes from an int literal struct)
            lit = self.spark.createDataFrame(
                [(int(c),) for c in cells], "cell int"
            )
            buckets = store.touched_buckets(lit)
        rows = store.rows(buckets=buckets)
        if rows is None:
            raise ValueError("no batches have landed yet")
        return rows

    def n_partials(self) -> int:
        return self._store_of(self.gen()).n_partials()

    def compact(self) -> None:
        """Fold the per-batch partitions into one base generation — for
        append-only state the fold is the identity over the rows; the
        point is file-count hygiene, committed by the pointer swap."""
        for store in (self._store_of(self.gen()), self.vec_store):
            if store.rows() is not None:
                store.compact(store.rows())


class CdcVectorIndex:
    """CDC-aware IVFADC index: the serving index under UPDATES and
    DELETES, which ``IncrementalVectorIndex``'s append-only contract
    cannot express — a re-embedded document must MOVE between posting
    lists and a deleted one must leave the index, exactly the vector-DB
    mutation path (FAISS ``remove_ids`` + re-``add``).

    The code store is a Z-SET ARRANGEMENT bucketed by coarse cell (the
    join_view image-arrangement idiom applied to the IVF layout): each
    merge collapses its changelog micro-batch to the ±1-weighted image
    delta (against the pk-bucketed raw-vector changelog, read pruned to
    the batch's pks), encodes the +1 and −1 images SEPARATELY with the
    frozen codebooks — the −1 row encodes the OLD embedding, so the
    retraction lands in the OLD cell's shard — and lands the weighted
    code rows. ``base_table()`` is the net-positive fold; with
    ``cells=...`` (the search's probe list) only the probed posting
    lists' shards are read, so a delete-heavy history never bloats the
    search I/O beyond the probed cells' live+retracted rows, and
    ``compact()`` folds retractions away entirely.

    Per-merge work: one pk-pruned latest-image read + two map-only
    encode projections + O(|Δ̂|) landings into the touched cell shards —
    never a corpus re-encode or a posting-list rewrite. Replay/torn
    writes heal by the family contract (all reads are rows_before(t));
    compaction folds the code store to net weights FIRST, then the
    changelog to latest-per-pk with d tombstones (dependency order).
    Input contract: (op string, seq bigint, vec_id, emb array<double>),
    seq globally monotone.

    Reference parity note: extends the q190/q195 streaming-ANN rows to
    the reference's actual delivery semantics — Debezium CDC with
    at-least-once replay (cmd/main.go:197-230)."""

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        cents: Cents,
        cbs: Cbs,
        *,
        n_cell_buckets: int = 64,
        n_vec_buckets: int = 16,
    ):
        self.spark = spark
        self.cents = cents
        self.cbs = cbs
        self.vec_store = BatchPartialStore(
            spark, f"{base}/vecs", bucket_cols=["vec_id"], n_buckets=n_vec_buckets
        )
        self.code_store = BatchPartialStore(
            spark, f"{base}/codes", bucket_cols=["cell"], n_buckets=n_cell_buckets
        )

    def merge(self, batch: DataFrame, batch_id: int) -> None:
        cdc = batch.localCheckpoint()
        state = cdc_state(self.vec_store, batch_id, "vec_id", prune=cdc)
        delta = cdc_delta(cdc, state, "vec_id", "_w").localCheckpoint()
        # encode ±1 images separately: a vec_id carries BOTH a new and an
        # old image in one delta, and each must land under ITS OWN cell
        pos = _ivfadc_encode(
            delta.filter(F.col("_w") == 1), self.cents, self.cbs
        ).withColumn(IMG_W, F.lit(1))
        neg = _ivfadc_encode(
            delta.filter(F.col("_w") == -1), self.cents, self.cbs
        ).withColumn(IMG_W, F.lit(-1))
        # concurrent landings: torn combinations heal on replay
        # (rows_before(t) never sees partition t)
        _concurrently(
            lambda: self.code_store.land(pos.unionByName(neg), batch_id),
            lambda: self.vec_store.land(cdc, batch_id),
        )

    def base_table(self, cells: list[int] | None = None) -> DataFrame:
        """Alive (vec_id, cell, code…) rows — the net-positive Z-fold of
        the landed code deltas, pruned to the probed cells' shards when
        ``cells`` is given (partition filter; the searcher's cell equi
        join filters exactly, so results match the unpruned read)."""
        buckets = None
        if cells is not None and self.code_store.bucket_cols:
            lit = self.spark.createDataFrame(
                [(int(c),) for c in cells], "cell int"
            )
            buckets = self.code_store.touched_buckets(lit)
        rows = self.code_store.rows(buckets=buckets)
        if rows is None:
            raise ValueError("no batches have landed yet")
        cols = [c for c in rows.columns if c != IMG_W]
        return (
            rows.groupBy(*cols)
            .agg(F.sum(IMG_W).alias("_n"))
            .filter(F.col("_n") > 0)
            .drop("_n")
        )

    def n_partials(self) -> int:
        return self.code_store.n_partials()

    def compact(self) -> None:
        """Code store to net weights FIRST (retractions fold away), then
        the changelog to latest-per-pk (d tombstones retained) — the
        family's dependency order."""
        rows = self.code_store.rows()
        if rows is not None:
            cols = [c for c in rows.columns if c != IMG_W]
            folded = (
                rows.groupBy(*cols)
                .agg(F.sum(IMG_W).cast("int").alias(IMG_W))
                .filter(F.col(IMG_W) != 0)
            )
            self.code_store.compact(folded)
        rows = self.vec_store.rows()
        if rows is not None:
            self.vec_store.compact(cdc_latest(rows, "vec_id"))
