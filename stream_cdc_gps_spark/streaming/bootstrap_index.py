"""CDC-maintained POISSON-BOOTSTRAP replicate statistics — uncertainty
quantification under churn.

A bootstrap replicate mean is a ratio of two LINEAR aggregates over the row
multiset — Σ w_r(row)·v and Σ w_r(row), with w_r the row's Poisson(1)
resample weight for replicate r, a pure deterministic hash of (pk, r) that
rides along every image. Linearity means the q207 signed-partial algebra
maintains ALL replicate arms at once: each merge lands, per replicate,

    Δ(r) = Σ_images w(image) · (1, weight_r, weight_r · v)

and the running net sums equal the from-scratch bootstrap over the
CDC-upserted final table EXACTLY — a value correction shifts every arm it
touches, a delete retracts its 64 weighted contributions, a duplicate
re-delivery nets to zero.

The critical cost decision (learned from a first draft that composed two
generic ``CdcAggregateView``s over a pre-exploded changelog and clocked
~49 s at sf0.1): the CHANGELOG stays at ROW granularity — the 64× replicate
expansion (and its md5 per (pk, r)) happens ONLY on the ±image delta, once
per merge, exactly like ``CdcShingleDfView`` explodes shingles from the
delta rather than landing a shingle-level changelog. State reads stay
O(batch's pk shards); the replicate store holds ≤ B rows per batch.

Storage/replay by the maintained-view family contract: per-batch
dynamic-partition overwrite (idempotent replay), torn write combinations
heal on replay, compaction folds the arm partials to net sums then the
changelog to latest-per-pk. Input contract: (op string, seq bigint, pk
bigint, val decimal), seq globally monotone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.streaming.partial_store import BatchPartialStore


class CdcBootstrapView:
    """CDC-aware incremental bootstrap-arm view: per-replicate
    (n, Σw, Σw·v) maintained under op ∈ {c,u,d} via signed partials.

    ``thresholds`` are the Poisson(1) CDF cut points on uint32 (the
    caller embeds the SAME literals in its oracle SQL); ``b`` replicate
    arms (multiple of 4); replicate i·4+j's uniform draw is hex chars
    [8j+1, 8j+8] of md5("pk:i") — four 32-bit draws per digest."""

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        pk: str,
        val: str,
        thresholds: tuple[int, ...],
        b: int = 64,
        n_buckets: int = 16,
        *,
        a_store: BatchPartialStore | None = None,
        land_inputs: bool = True,
    ):
        self.spark = spark
        self.pk = pk
        self.val = val
        self.thresholds = thresholds
        self.b = b
        # a_store/land_inputs: the CdcViewSuite sharing contract — a
        # composed handler (CdcDriftSuite) lands ONE changelog per batch
        # and hands every member the shared ±image delta (r12 verdict
        # task #3: the bootstrap view used to land its changelog apart
        # from every co-maintained events view).
        self.a_store = a_store or BatchPartialStore(
            spark, f"{base}/a", bucket_cols=[pk], n_buckets=n_buckets
        )
        self.land_inputs = land_inputs
        self.v_store = BatchPartialStore(spark, f"{base}/v")

    def _weight(self, u) -> F.Column:
        wgt = F.lit(len(self.thresholds))
        for k in range(len(self.thresholds) - 1, -1, -1):
            wgt = F.when(u < F.lit(self.thresholds[k]), F.lit(k)).otherwise(wgt)
        return wgt

    def _signed_partial(self, delta: DataFrame) -> DataFrame:
        """Per-replicate signed partial of a ±1 image delta: the 64×
        expansion and the md5 draws happen HERE, on |Δ| rows only — and
        each 128-bit digest is split into FOUR 32-bit draws (md5 of
        "pk:i" hashes b/4 times per row, not b: replicate i·4+j reads
        hex chars [8j+1, 8j+8]), which halved the md5-bound merge cost
        again after the delta-only move.

        r14 optimization, two moves (guide §2/§4-adjacent, measured):

        1. PARALLELISM. The b/4 md5 digests (and b conv+threshold folds)
           per row amplify compute ~16× past this point, but the delta
           reaching here is only a few MB — bytes-based AQE coalescing
           handed the whole expansion to 1-2 tasks (the v-store landing
           ran ~13 s/merge at sf0.1 on one core). One explicit exchange
           of |Δ| NARROW rows to the cluster's parallelism buys b-wide
           parallel hashing. The F.lit(1) salt is LOAD-BEARING: a bare
           repartition(n, pk) is semantically redundant above
           cdc_latest's pk-partitioned window, so
           RemoveRedundantRepartition deletes it and AQE re-coalesces
           the window exchange — hash(pk, 1) is a different
           partitioning, so the exchange survives with its pinned count.

        2. NATIVE-LONG ARITHMETIC. decimal(18,2) weight × value products
           exceed 18 digits of precision, kicking every one of the
           |Δ|·b sum updates off Spark's long-backed decimal fast path
           onto boxed BigDecimal (measured 6.4 s vs 1.5 s for the same
           aggregate at sf0.1). The per-batch partial therefore sums in
           integer CENTS (exact: val is decimal(*,2); weights are small
           ints): per-row terms ≤ 6·|v|·100 and a batch's arm sum is
           bounded by 6 × the batch's total |value| in cents — bigint
           overflows only past ~10^16 value-units per micro-batch.
           ``arms()`` converts the folded cents back to exact DECIMAL
           once, on ≤ b+1 rows. Values are bit-identical either way;
           combine order cannot matter (integer addition)."""
        assert self.b % 4 == 0
        delta = delta.repartition(
            self.spark.sparkContext.defaultParallelism, F.col(self.pk), F.lit(1)
        )
        # cents once per delta row, BEFORE the b/4-way explode (the cast
        # is exact; doing it here instead of post-explode saves b× casts)
        pre = delta.select(
            "_w",
            (F.col(self.val) * 100).cast("bigint").alias("_vc"),
            F.col(self.pk).cast("string").alias("_pks"),
        )
        i = F.explode(
            F.array(*[F.lit(x).cast("bigint") for x in range(self.b // 4)])
        ).alias("i")
        d = pre.select("_w", "_vc", "_pks", i).select(
            "_w",
            "_vc",
            "i",
            F.md5(F.concat_ws(":", F.col("_pks"), F.col("i").cast("string"))).alias(
                "_h"
            ),
        )
        j = F.explode(
            F.array(*[F.lit(x).cast("bigint") for x in range(4)])
        ).alias("j")
        x = d.select("_w", "_vc", "i", "_h", j).select(
            "_w",
            "_vc",
            (F.col("i") * 4 + F.col("j")).alias("r"),
            F.conv(
                F.expr("substring(_h, 1 + 8 * j, 8)"), 16, 10
            )
            .cast("bigint")
            .alias("u"),
        )
        wgt = self._weight(F.col("u")).cast("bigint")
        rep_rows = x.select("r", "_w", wgt.alias("_wt"), "_vc")
        # the POINT-estimate arm rides along as replicate -1 with weight 1
        # (Σv and n are linear too — one maintained table answers both the
        # estimate and its error bar)
        pt_rows = pre.select(
            F.lit(-1).cast("bigint").alias("r"),
            "_w",
            F.lit(1).cast("bigint").alias("_wt"),
            "_vc",
        )
        return (
            rep_rows.unionByName(pt_rows)
            .groupBy("r")
            .agg(
                F.sum("_w").cast("bigint").alias("dn"),
                F.sum(F.col("_w") * F.col("_wt")).cast("bigint").alias("dw"),
                F.sum(F.col("_w") * F.col("_wt") * F.col("_vc"))
                .cast("bigint")
                .alias("dwvc"),
            )
        )

    def merge(
        self, batch: DataFrame, batch_id: int, *, delta: DataFrame | None = None
    ) -> None:
        from stream_cdc_gps_spark.streaming.join_view import (
            _concurrently,
            cdc_delta,
            cdc_state,
        )

        cdc = batch
        if delta is None:
            cdc = batch.localCheckpoint()
            state = cdc_state(self.a_store, batch_id, self.pk, prune=cdc)
            delta = cdc_delta(cdc, state, self.pk, "_w")
        partial = self._signed_partial(delta)
        lands = [lambda: self.v_store.land(partial, batch_id)]
        if self.land_inputs:
            lands.append(lambda: self.a_store.land(cdc, batch_id))
        _concurrently(*lands)

    def arms(self) -> DataFrame:
        """(r, n, sw, swv) per replicate over the alive rows — equal to
        the from-scratch weighted sums over the upserted final table.
        The maintained partials carry integer cents (see
        ``_signed_partial``); the fold back to exact DECIMAL value-units
        happens here, once, on ≤ b+1 rows."""
        rows = self.v_store.rows()
        if rows is None:
            raise ValueError("no batches have landed yet")
        return (
            rows.groupBy("r")
            .agg(
                F.sum("dn").cast("bigint").alias("n"),
                F.sum("dw").cast("bigint").alias("sw"),
                (F.sum("dwvc").cast("decimal(38,2)") / 100).alias("swv"),
            )
            .filter(F.col("n") > 0)
        )

    def compact_view_stores(self) -> None:
        rows = self.v_store.rows()
        if rows is not None:
            folded = (
                rows.groupBy("r")
                .agg(
                    F.sum("dn").cast("bigint").alias("dn"),
                    F.sum("dw").cast("bigint").alias("dw"),
                    F.sum("dwvc").cast("bigint").alias("dwvc"),
                )
                .filter(
                    (F.col("dn") != 0) | (F.col("dw") != 0) | (F.col("dwvc") != 0)
                )
            )
            self.v_store.compact(folded)

    def compact_source_stores(self) -> None:
        from stream_cdc_gps_spark.streaming.join_view import cdc_latest

        rows = self.a_store.rows()
        if rows is not None:
            self.a_store.compact(cdc_latest(rows, self.pk))

    def compact(self) -> None:
        """Arm partials to net sums FIRST, then the changelog to
        latest-per-pk (d tombstones retained) — the family order."""
        self.compact_view_stores()
        self.compact_source_stores()
