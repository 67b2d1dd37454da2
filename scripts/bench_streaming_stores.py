"""Off-headline benchmark: incremental-store merge/snapshot cost curves.

Measures the numbers BASELINE.md records for the streaming column (r6
judge task #6), isolated from the headline suite because the runs are
multi-second stateful pipelines:

1. IncrementalLshIndex per-merge wall across N equal document batches —
   the cost curve whose SHAPE the r7 partition-local rewrite changed:
   per-merge I/O now tracks touched-shard state, not whole-corpus state.
2. The tail-merge probe: ONE extra document merged into the full
   accumulated state, with n_state_buckets=64 (partition-local: touches
   ≤ 3 of 64 shards) vs n_state_buckets=1 (every merge rewrites the
   whole store — the pre-r7 layout's cost model, reproduced exactly by
   collapsing the partitioning). Both WALL and REWRITTEN BYTES are
   recorded: at toy state sizes the fixed per-partition overhead can win
   on wall, but rewritten bytes is the quantity that scales with the
   corpus — the bytes ratio IS the fix, as a number.
3. CorpusIngestPipeline end-to-end: per-batch composed-merge wall and
   the final all-stores snapshot read (the q189 read path).
4. CdcViewSuite vs six standalone CDC views over the SAME changelog
   script (r8): total bytes written per arrangement — the shared
   changelog/support stores land once per batch in the suite, while the
   standalone views each persist their own copy; the bytes ratio is the
   suite's storage claim as a number.
5. The CDC tail-merge probe (r10 — the bucketed-view wiring as a
   number): ONE order updated against the full accumulated CdcJoinView
   state, n_buckets=64 vs n_buckets=1 (the collapsed layout reproduces
   the pre-r10 whole-state read exactly). Records WALL and, for the
   bucketed layout, STATE BYTES ELIGIBLE FOR SCAN per store (sum of
   file sizes under the touched kbucket partitions — partition pruning
   means only those files are opened) vs the store's total bytes: the
   bytes ratio is the per-merge read cost the r9 verdict flagged,
   fixed, as a number.

Usage: python scripts/bench_streaming_stores.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def _snapshot_files(root: str) -> dict:
    """relpath -> (size, mtime_ns) for every data file under root."""
    import os

    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def _rewritten_bytes(root: str, before: dict) -> int:
    """Bytes of data files the merge created or replaced."""
    after = _snapshot_files(root)
    return sum(s for rel, (s, m) in after.items() if before.get(rel) != (s, m))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from stream_cdc_gps_spark.operators.common import t
    from stream_cdc_gps_spark.session import get_spark
    from stream_cdc_gps_spark.streaming.corpus_ingest import CorpusIngestPipeline
    from stream_cdc_gps_spark.streaming.dedup_index import IncrementalLshIndex

    spark = get_spark(app_name="bench_streaming_stores")
    spark.sparkContext.setLogLevel("ERROR")

    d = t(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars"
    ).localCheckpoint()
    n_docs = d.count()
    out: dict = {"sf_dir": sf_dir, "n_docs": n_docs, "n_batches": n_batches}

    # 1. LSH per-merge curve over N equal hash-sliced batches
    base = tempfile.mkdtemp(prefix="lshb_")
    try:
        idx = IncrementalLshIndex(spark, base)
        merges = []
        for b in range(n_batches):
            t0 = time.perf_counter()
            idx.merge(d.filter(F.col("doc_id") % n_batches == b).select("doc_id", "text"), b)
            merges.append(round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        n_pairs = idx.pairs().count()
        out["lsh_merge_sec_per_batch"] = merges
        out["lsh_pairs_snapshot_sec"] = round(time.perf_counter() - t0, 2)
        out["lsh_pairs"] = n_pairs

        # 2. tail merge: one extra doc vs the full state, both layouts
        one = d.orderBy("doc_id").limit(1).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        ).localCheckpoint()
        before = _snapshot_files(base)
        t0 = time.perf_counter()
        idx.merge(one, n_batches)
        out["lsh_tail_merge_sec_n64"] = round(time.perf_counter() - t0, 2)
        out["lsh_tail_rewritten_bytes_n64"] = _rewritten_bytes(base, before)
        out["lsh_state_bytes"] = sum(s for s, _ in _snapshot_files(base).values())
    finally:
        shutil.rmtree(base, ignore_errors=True)

    base = tempfile.mkdtemp(prefix="lsh1_")
    try:
        idx1 = IncrementalLshIndex(spark, base, n_state_buckets=1)
        for b in range(n_batches):
            idx1.merge(d.filter(F.col("doc_id") % n_batches == b).select("doc_id", "text"), b)
        one = d.orderBy("doc_id").limit(1).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        ).localCheckpoint()
        before = _snapshot_files(base)
        t0 = time.perf_counter()
        idx1.merge(one, n_batches)
        out["lsh_tail_merge_sec_n1"] = round(time.perf_counter() - t0, 2)
        out["lsh_tail_rewritten_bytes_n1"] = _rewritten_bytes(base, before)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    # 3. composed ingest: per-batch merge + full snapshot read
    base = tempfile.mkdtemp(prefix="ingest_")
    try:
        pipe = CorpusIngestPipeline(spark, base)
        merges = []
        for b in range(n_batches):
            t0 = time.perf_counter()
            pipe.merge(d.filter(F.col("doc_id") % n_batches == b), b)
            merges.append(round(time.perf_counter() - t0, 2))
        out["ingest_merge_sec_per_batch"] = merges
        t0 = time.perf_counter()
        pipe.lsh.pairs().count()
        pipe.cms.counters().count()
        pipe.hll.estimate()
        pipe.rollup.snapshot().count()
        out["ingest_snapshot_all_stores_sec"] = round(time.perf_counter() - t0, 2)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    # 4. shared-state CDC suite vs six standalone views: bytes written
    # for the same 2-batch changelog script (q201's storage claim)
    from stream_cdc_gps_spark.streaming.join_view import (
        CdcAggregateView,
        CdcDistinctCountView,
        CdcJoinView,
        CdcLeftJoinView,
        CdcMinMaxView,
        CdcTopKView,
        CdcViewSuite,
    )

    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("oid"),
        F.col("o_custkey").alias("k"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        F.col("o_orderpriority").alias("c"),
    )
    cst = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    ok = F.col("oid")
    a0 = o.select(F.lit("c").alias("op"), ok.alias("seq"), *o.columns).localCheckpoint()
    a1 = (
        o.filter(ok % 7 == 0)
        .select(
            F.lit("u").alias("op"),
            (F.lit(1_000_000_000) + ok).alias("seq"),
            ok,
            F.col("k"),
            (F.col("v") + F.lit(1.0e0)).cast("decimal(18,2)").alias("v"),
            F.lit("0-REVISED").alias("c"),
        )
        .unionByName(
            o.filter(ok % 5 == 0).select(
                F.lit("d").alias("op"),
                (F.lit(3_000_000_000) + ok).alias("seq"),
                *o.columns,
            )
        )
        .localCheckpoint()
    )
    b0 = cst.select(
        F.lit("c").alias("op"), F.col("k").alias("seq"), *cst.columns
    ).localCheckpoint()
    b1 = (
        cst.filter(F.col("k") % 11 == 0)
        .select(F.lit("d").alias("op"), (F.lit(2_000_000_000) + F.col("k")).alias("seq"), *cst.columns)
        .localCheckpoint()
    )

    base = tempfile.mkdtemp(prefix="cdc_suite_")
    try:
        suite = CdcViewSuite(
            spark, base, key="k", a_pk="oid", b_pk="k", num_val="v", cat_val="c"
        )
        t0 = time.perf_counter()
        suite.merge(a0, b0, 0)
        suite.merge(a1, b1, 1)
        out["suite_merge_sec_total"] = round(time.perf_counter() - t0, 2)
        out["suite_bytes_written"] = sum(
            s for s, _ in _snapshot_files(base).values()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)

    base = tempfile.mkdtemp(prefix="cdc_solo_")
    try:
        views = [
            CdcJoinView(spark, f"{base}/j", key="k", a_pk="oid", b_pk="k"),
            CdcLeftJoinView(spark, f"{base}/l", key="k", a_pk="oid", b_pk="k"),
            CdcAggregateView(spark, f"{base}/g", key="k", pk="oid", val="v"),
            CdcMinMaxView(spark, f"{base}/m", key="k", pk="oid", val="v"),
            CdcDistinctCountView(spark, f"{base}/d", key="k", pk="oid", val="c"),
            CdcTopKView(spark, f"{base}/t", key="k", pk="oid", val="c", k=2),
        ]
        t0 = time.perf_counter()
        for bid, (ab, bb) in enumerate(((a0, b0), (a1, b1))):
            for v in views[:2]:
                v.merge(ab, bb, bid)
            for v in views[2:]:
                v.merge(ab, bid)
        out["standalone_merge_sec_total"] = round(time.perf_counter() - t0, 2)
        out["standalone_bytes_written"] = sum(
            s for s, _ in _snapshot_files(base).values()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)

    # 5. CDC tail-merge probe: one updated order vs full accumulated state
    import os

    def _store_bytes(store, buckets=None):
        """Total data-file bytes of a store, or only the bytes under the
        named kbucket partitions (what a pruned scan can open at all).
        Files outside any kbucket dir (unpartitioned empty base) count
        fully in both modes."""
        total = 0
        for dirpath, _, files in os.walk(store.base_dir):
            parts = dirpath.split(os.sep)
            kb = next(
                (int(p.split("=", 1)[1]) for p in parts if p.startswith("kbucket=")),
                None,
            )
            if buckets is not None and kb is not None and kb not in buckets:
                continue
            for fname in files:
                if fname.startswith(("_", ".")):
                    continue
                total += os.stat(os.path.join(dirpath, fname)).st_size
        return total

    one_upd = (
        o.orderBy("oid")
        .limit(1)
        .select(
            F.lit("u").alias("op"),
            (F.lit(5_000_000_000) + ok).alias("seq"),
            ok,
            F.col("k"),
            (F.col("v") + F.lit(2.0e0)).cast("decimal(18,2)").alias("v"),
            F.lit("0-TAIL").alias("c"),
        )
        .localCheckpoint()
    )
    empty_b = b0.limit(0).localCheckpoint()
    from stream_cdc_gps_spark.streaming.join_view import cdc_state  # noqa: F401

    for nb, tag in ((64, "n64"), (1, "n1")):
        base = tempfile.mkdtemp(prefix=f"cdc_tail_{tag}_")
        try:
            jv = CdcJoinView(
                spark, base, key="k", a_pk="oid", b_pk="k", n_buckets=nb
            )
            jv.merge(a0, b0, 0)
            jv.merge(a1, b1, 1)
            t0 = time.perf_counter()
            jv.merge(one_upd, empty_b, 2)
            out[f"cdc_tail_merge_sec_{tag}"] = round(time.perf_counter() - t0, 2)
            if nb > 1:
                # the three state stores the tail merge reads, each with
                # the shards the probe batch actually touches
                a_kb = jv.a_store.touched_buckets(one_upd)
                ak_kb = jv.ak_store.touched_buckets(one_upd.select("k"))
                reads = {
                    "a": (_store_bytes(jv.a_store, a_kb), _store_bytes(jv.a_store)),
                    "ak": (
                        _store_bytes(jv.ak_store, ak_kb),
                        _store_bytes(jv.ak_store),
                    ),
                    # bk is pruned by the (empty) B delta's keys + the A
                    # delta's key for the bilinear term
                    "bk": (
                        _store_bytes(jv.bk_store, ak_kb),
                        _store_bytes(jv.bk_store),
                    ),
                }
                out["cdc_tail_state_read_bytes_n64"] = sum(
                    p for p, _ in reads.values()
                )
                out["cdc_tail_state_total_bytes_n64"] = sum(
                    t for _, t in reads.values()
                )
        finally:
            shutil.rmtree(base, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
