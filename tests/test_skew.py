"""Skew mitigation: salted join semantics + bucketed join plan quality."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from stream_cdc_gps_spark.operators.skew import salted_join, write_bucketed
from stream_cdc_gps_spark.plans.inspect import exchange_count, plan_string


def _skewed_frames(spark):
    # 90% of fact rows hit key 1 (the hot key), plus keys with no dim match.
    fact = spark.createDataFrame(
        [Row(k=1, v=i) for i in range(90)]
        + [Row(k=2, v=i) for i in range(9)]
        + [Row(k=99, v=0)]  # no match on dim side
    )
    dim = spark.createDataFrame([Row(k=1, name="hot"), Row(k=2, name="cold")])
    return fact, dim


def test_salted_inner_join_matches_plain(spark):
    fact, dim = _skewed_frames(spark)
    plain = fact.join(dim, ["k"]).orderBy("k", "v").collect()
    salted = salted_join(fact, dim, ["k"], n_salt=4).orderBy("k", "v").collect()
    assert salted == plain
    assert len(salted) == 99


def test_salted_left_join_keeps_unmatched_once(spark):
    fact, dim = _skewed_frames(spark)
    plain = fact.join(dim, ["k"], "left").orderBy("k", "v").collect()
    salted = salted_join(fact, dim, ["k"], n_salt=4, how="left").orderBy("k", "v").collect()
    assert salted == plain  # the k=99 row appears exactly once, name=None


def test_salted_join_rejects_right_full(spark):
    fact, dim = _skewed_frames(spark)
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], how="full")


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts join
    with zero shuffle exchanges — the write was the shuffle."""
    o = spark.range(0, 1000).select(
        F.col("id").alias("custkey"), (F.col("id") % 7).alias("grp")
    )
    c = spark.range(0, 1000).select(
        F.col("id").alias("custkey"), F.concat(F.lit("c"), F.col("id")).alias("name")
    )
    write_bucketed(o, "bk_orders", ["custkey"], 4, str(tmp_path / "bk_orders"))
    write_bucketed(c, "bk_customer", ["custkey"], 4, str(tmp_path / "bk_customer"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        # disable broadcast so the co-location (not broadcast) avoids the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bk_orders").join(spark.table("bk_customer"), "custkey")
        assert exchange_count(j) == 0
        assert "SortMergeJoin" in plan_string(j)
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_orders")
        spark.sql("DROP TABLE IF EXISTS bk_customer")


def test_partitioned_write_prunes_directories(spark, tmp_path):
    """A filter on the partition column must show up as a PartitionFilter
    (directory pruning), not a data filter over all rows."""
    from stream_cdc_gps_spark.sources.writers import read_partitioned, write_partitioned
    from stream_cdc_gps_spark.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(ev, path, ["event_type"])

    back = read_partitioned(spark, path).filter(F.col("event_type") == "click")
    plan = plan_string(back)
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "event_type" in pf  # pruned at planning, whole directories skipped
    n_click = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == n_click
