"""Unit tests for dedup building blocks (hot-bucket cap, pair expansion)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_cdc_gps_spark.operators.dedup import MAX_POSTING, bucket_pair_expand


def test_bucket_pair_expand_orders_pairs(spark):
    df = spark.createDataFrame([(["a", "b", "c"],)], "ids array<string>")
    got = sorted(tuple(r) for r in bucket_pair_expand(df).collect())
    assert got == [("a", "b"), ("a", "c"), ("b", "c")]


def test_hot_bucket_cap_drops_stop_shingle_pairs(spark):
    """A posting list longer than MAX_POSTING (a stop-shingle) must be
    dropped BEFORE pair expansion — the guard that keeps expansion
    O(n * MAX_POSTING) instead of O(hot_bucket^2) at corpus scale."""
    hot = [(f"d{i:03d}", "the the the") for i in range(MAX_POSTING + 1)]
    cold = [("d900", "rare shingle x"), ("d901", "rare shingle x")]
    sh = spark.createDataFrame(hot + cold, "doc_id string, sh string")
    buckets = (
        sh.groupBy("sh")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= MAX_POSTING))
    )
    pairs = bucket_pair_expand(buckets).collect()
    # only the cold bucket survives: 1 pair, none from the hot shingle
    assert [tuple(r) for r in pairs] == [("d900", "d901")]
