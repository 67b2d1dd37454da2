"""Incremental mergeable QUANTILE sketch (streaming percentiles).

Completes the sketch triad the streaming indexes maintain: CMS answers
FREQUENCY (cms_index), HLL answers CARDINALITY (hll_index) — this
answers ORDER STATISTICS (medians / p90s per key) without keeping the
values. The summary is an equi-depth centroid set (the t-digest /
Greenwald-Khanna family reduced to its mergeable core): per key, at
most C strata of (centroid, weight, lo, hi), built by sorting weighted
rows and cutting at equal cumulative-weight boundaries. The same
compression is the MERGE: partials from any number of micro-batches
union as weighted rows and re-compress — one window + one aggregate per
key, all JVM-side.

Determinism (the q174/q184 idiom applied to a sketch): the weighted
centroid sums run in DECIMAL(28,8) — exact, associative, order-proof —
so the sketch bytes are a pure function of the multiset of inputs, not
of partition order; equal values may split across a stratum boundary
arbitrarily, but every such split yields identical stratum aggregates.

Accuracy contract: a stratum's weight after compression is ≤ ⌈W/C⌉ + the
largest input stratum, so the stratum covering a target rank bounds it
within a few W/C ranks even after repeated merging; queries surface the
covering stratum's [lo, hi] value range and the ship-gate (q202) checks
the TIE-AWARE rank interval of the estimate against the target ±3W/C —
the q131/q26 pattern: exact values plus an in-query accuracy bound the
estimate must satisfy.

Persistence is ``partial_store.BatchPartialStore`` exactly as the CMS /
HLL / rollup siblings: per-batch compressed partials land partitioned by
``batch_id`` (a replayed micro-batch overwrites its own partition),
compaction folds history into a pointer-committed base via the SAME
compression (the snapshot is invariant by the merge algebra), and
replays of already-compacted batches are refused by the watermark.

Reference parity note: the reference (cmd/main.go) has no sketch
surface; this extends SURVEY.md §2B's percentile row (q35/q145) to the
streaming column the way cms_index extended q113.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_cdc_gps_spark.streaming.partial_store import BatchPartialStore

# Strata per key: rank error is a few W/C, summary size is C rows per key.
N_STRATA = 64

_SUMMARY_SCHEMA = (
    "key string, v decimal(28,8), w bigint, lo bigint, hi bigint"
)


def compress(weighted: DataFrame, n_strata: int = N_STRATA) -> DataFrame:
    """Equi-depth compression of weighted rows (key, v, w, lo, hi) to at
    most ``n_strata`` strata per key. Sort by centroid value, cut at
    equal cumulative-weight boundaries, aggregate each stratum to
    (weighted-centroid, weight, min lo, max hi). DECIMAL sums keep the
    result order-proof; this one function is both the per-batch
    compressor and the merge."""
    # The ordering includes w so it is TOTAL up to fully-identical rows:
    # identical rows are interchangeable, so the cumulative-weight cuts
    # (and hence the sketch bytes) are partition-order-proof. The ROWS
    # frame is load-bearing (r8 advice): orderBy without a frame defaults
    # to RANGE, where rows tied on (v, lo, hi, w) are PEERS sharing one
    # cumulative sum — k identical unit-weight rows would all land in a
    # single stratum of weight k instead of spreading across equi-depth
    # cuts, violating the documented ≤ ⌈W/C⌉ + max-input-stratum bound
    # under heavy value duplication.
    ww = (
        Window.partitionBy("key")
        .orderBy("v", "lo", "hi", "w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("key")
    rows = weighted.select(
        "key",
        F.col("v").cast("decimal(28,8)").alias("v"),
        F.col("w").cast("bigint").alias("w"),
        F.col("lo").cast("bigint").alias("lo"),
        F.col("hi").cast("bigint").alias("hi"),
    ).withColumn(
        "_stratum",
        F.floor(
            (F.sum("w").over(ww) - F.col("w"))
            * F.lit(int(n_strata))
            / F.sum("w").over(tot)
        ),
    )
    return rows.groupBy("key", "_stratum").agg(
        (
            F.sum((F.col("v") * F.col("w")).cast("decimal(38,8)"))
            / F.sum("w")
        )
        .cast("decimal(28,8)")
        .alias("v"),
        F.sum("w").cast("bigint").alias("w"),
        F.min("lo").alias("lo"),
        F.max("hi").alias("hi"),
    ).drop("_stratum")


def batch_partial(batch_df: DataFrame, key: str, val: str) -> DataFrame:
    """One micro-batch's compressed summary: each row enters as its own
    unit-weight centroid (lo = hi = the value), then equi-depth
    compression per key. NULL values are excluded (percentile
    semantics)."""
    weighted = batch_df.filter(F.col(val).isNotNull()).select(
        F.col(key).cast("string").alias("key"),
        F.col(val).cast("bigint").alias("v"),
        F.lit(1).cast("bigint").alias("w"),
        F.col(val).cast("bigint").alias("lo"),
        F.col(val).cast("bigint").alias("hi"),
    )
    return compress(weighted)


class IncrementalQuantileSketch:
    """foreachBatch body maintaining per-key quantile summaries over a
    stream. ``merge`` is the batch handler; ``summary()`` the merged
    C-strata snapshot; ``quantiles(fractions)`` the covering-stratum
    estimates."""

    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.store = BatchPartialStore(spark, base)
        self.path = self.store.partials_path  # live-partials dir (crash tests)

    def merge(self, batch_df: DataFrame, key: str, val: str, batch_id: int) -> None:
        self.store.land(batch_partial(batch_df, key, val), batch_id)

    def summary(self) -> DataFrame:
        """Merged sketch: every landed stratum re-compressed to C per
        key — the union of equi-depth summaries is itself a weighted-row
        multiset, so the compressor IS the merge."""
        rows = self.store.rows()
        if rows is None:
            return self.spark.createDataFrame([], _SUMMARY_SCHEMA)
        return compress(rows)

    def quantiles(self, fractions: list[float]) -> DataFrame:
        """(key, q, n, est, lo, hi) per requested fraction: the summary
        stratum whose cumulative weight range covers rank ⌈q·n⌉ — est is
        its centroid (rounded to the bigint domain), [lo, hi] the true
        value bounds of that stratum's constituents."""
        s = self.summary()
        # ROWS frame for the same reason as compress(): tied strata must
        # accumulate individually, not share one peer-group sum.
        ww = (
            Window.partitionBy("key")
            .orderBy("v", "lo", "hi", "w")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        tot = Window.partitionBy("key")
        ranked = (
            s.withColumn("cum", F.sum("w").over(ww))
            .withColumn("n", F.sum("w").over(tot))
            .localCheckpoint()
        )
        out = None
        for q in fractions:
            target = F.ceil(F.lit(float(q)) * F.col("n"))
            covering = (
                ranked.filter(F.col("cum") >= target)
                .withColumn(
                    "_rn",
                    F.row_number().over(
                        Window.partitionBy("key").orderBy("cum", "v", "lo", "hi", "w")
                    ),
                )
                .filter(F.col("_rn") == 1)
                .select(
                    "key",
                    F.lit(float(q)).alias("q"),
                    "n",
                    F.round("v", 0).cast("bigint").alias("est"),
                    "lo",
                    "hi",
                )
            )
            out = covering if out is None else out.unionByName(covering)
        return out

    def n_partials(self) -> int:
        return self.store.n_partials()

    def compact(self) -> None:
        """Fold every landed stratum into one C-per-key base — the
        compressor is the fold, so the snapshot is invariant."""
        if self.store.rows() is not None:
            self.store.compact(compress(self.store.rows()))
