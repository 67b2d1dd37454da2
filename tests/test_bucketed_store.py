"""Key-hash sub-partitioned BatchPartialStore (r9 — the r8 verdict's one
scale-defect fix): state reads prune to the shards a micro-batch touches,
untouched shards are never rewritten, and compaction preserves the layout.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from stream_cdc_gps_spark.plans.inspect import plan_string
from stream_cdc_gps_spark.streaming.partial_store import BatchPartialStore


def _mk(spark, keys, tag):
    return spark.createDataFrame([(k, f"{tag}{k}") for k in keys], "k long, v string")


def _file_digests(root):
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = hashlib.md5(fh.read()).hexdigest()
    return out


def test_pruned_read_is_a_partition_filter(spark, tmp_path):
    """rows()/rows_before() with a buckets list must reach the scan as a
    PARTITION filter on kbucket — only the touched shard directories are
    read at all (the O(touched shards) per-merge state read)."""
    store = BatchPartialStore(
        spark, str(tmp_path / "s"), bucket_cols=["k"], n_buckets=8
    )
    store.land(_mk(spark, range(100), "a"), 0)
    store.land(_mk(spark, range(100, 140), "b"), 1)

    probe = _mk(spark, [5], "x")
    touched = store.touched_buckets(probe)
    assert len(touched) == 1

    pruned = store.rows(buckets=touched)
    assert "kbucket" not in pruned.columns
    got = {r.k for r in pruned.collect()}
    assert 5 in got
    # bucket-level pruning is a SUPERSET filter: co-resident keys appear,
    # but every returned key must hash into the touched shard
    all_rows = _mk(spark, range(140), "y")
    expected = {
        r.k
        for r in all_rows.withColumn(
            "b", F.pmod(F.hash("k"), F.lit(8)).cast("int")
        )
        .filter(F.col("b").isin(touched))
        .collect()
    }
    assert got == expected

    p = plan_string(pruned)
    assert "PartitionFilters" in p and "kbucket" in p.split("PartitionFilters", 1)[1][:200]

    # rows_before prunes the same way and excludes the newer batch
    before = store.rows_before(1, buckets=touched)
    assert {r.k for r in before.collect()} == {k for k in expected if k < 100}


def test_untouched_shards_byte_identical_across_merge(spark, tmp_path):
    """A later land must not rewrite ANY pre-existing file — per-merge
    write cost is the batch's own shards, nothing else (mirror of the
    LSH untouched-partitions pin at the store layer)."""
    store = BatchPartialStore(
        spark, str(tmp_path / "s"), bucket_cols=["k"], n_buckets=8
    )
    store.land(_mk(spark, range(50), "a"), 0)
    before = _file_digests(store.partials_path)
    store.land(_mk(spark, range(50, 60), "b"), 1)
    after = _file_digests(store.partials_path)
    for path, digest in before.items():
        assert after.get(path) == digest, f"pre-existing file rewritten: {path}"


def test_compact_preserves_bucketing_and_pruning(spark, tmp_path):
    """Folding into a base generation keeps the kbucket layout: pruned
    reads over the base stay partition filters, the snapshot is
    invariant, and folded-batch replays are refused."""
    store = BatchPartialStore(
        spark, str(tmp_path / "s"), bucket_cols=["k"], n_buckets=4
    )
    store.land(_mk(spark, range(40), "a"), 0)
    store.land(_mk(spark, range(40, 60), "b"), 1)
    golden = sorted((r.k, r.v) for r in store.rows().collect())

    store.compact(store.rows())
    assert store.n_partials() == 1
    assert sorted((r.k, r.v) for r in store.rows().collect()) == golden
    assert not store.land(_mk(spark, [999], "z"), 1)  # refused at watermark

    touched = store.touched_buckets(_mk(spark, [7], "x"))
    pruned = store.rows(buckets=touched)
    assert 7 in {r.k for r in pruned.collect()}
    p = plan_string(pruned)
    assert "PartitionFilters" in p and "kbucket" in p.split("PartitionFilters", 1)[1][:200]
    base_root = os.path.join(str(tmp_path / "s"), "base")
    gen = os.listdir(base_root)[0]
    assert any(
        d.startswith("kbucket=") for d in os.listdir(os.path.join(base_root, gen))
    )


def test_unbucketed_store_unchanged(spark, tmp_path):
    """The default (no bucket_cols) layout is byte-for-byte the r8 one:
    batch_id partitions only, no kbucket column anywhere."""
    store = BatchPartialStore(spark, str(tmp_path / "s"))
    store.land(_mk(spark, range(10), "a"), 0)
    rows = store.rows()
    assert "kbucket" not in rows.columns
    dirs = os.listdir(store.partials_path)
    assert any(d == "batch_id=0" for d in dirs)
    assert not any(
        d.startswith("kbucket=")
        for d in os.listdir(os.path.join(store.partials_path, "batch_id=0"))
    )
