"""Window-function operators (SURVEY.md §2B — window family, all EXT).

lag/lead over per-device event time is the core of the GPS derived signals
(see operators/gps.py); here the family is exercised on the relational corpus.

Determinism rules for differential testing: every ORDER BY inside a window
is a TOTAL order (unique tiebreak key) wherever the function is
order-sensitive (row_number, ntile, lag/lead, running frames); rank and
dense_rank are exercised on orderings with real ties, where they are
deterministic by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_cdc_gps_spark.operators.common import t
from stream_cdc_gps_spark.registry import query


@query(
    "q30_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 3
""",
)
def q30_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number over a total order.

    The scalable top-k pattern: one shuffle on the partition key, no global
    sort — survives any number of groups."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "q31_rank_dense_ntile",
    oracle="""
SELECT c_custkey, c_mktsegment, c_nationkey,
       rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS rnk,
       dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS drnk,
       ntile(4)     OVER (PARTITION BY c_mktsegment ORDER BY c_custkey)   AS quartile
FROM customer
""",
)
def q31_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank over a tied ordering + ntile over a total order."""
    c = t(spark, sf_dir, "customer")
    w_tied = Window.partitionBy("c_mktsegment").orderBy("c_nationkey")
    w_total = Window.partitionBy("c_mktsegment").orderBy("c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_nationkey",
        F.rank().over(w_tied).alias("rnk"),
        F.dense_rank().over(w_tied).alias("drnk"),
        F.ntile(4).over(w_total).alias("quartile"),
    )


@query(
    "q32_lag_lead",
    oracle="""
SELECT event_id, user_id, ts, value,
       lag(value)       OVER w AS prev_value,
       lead(event_type) OVER w AS next_type,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q32_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per user ordered by event time (µs-exact gap computation)."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


@query(
    "q33_window_frames",
    oracle="""
SELECT event_id, user_id, ts, value,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
           AS running_total,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
           AS moving_avg3,
       first(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS first_value
FROM events
""",
)
def q33_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frames: running total, 3-row moving average, first."""
    e = t(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_mov = Window.partitionBy("user_id").orderBy(*order).rowsBetween(-2, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(F.sum("value").over(w_run), 4).alias("running_total"),
        F.round(F.avg("value").over(w_mov), 4).alias("moving_avg3"),
        F.first("value").over(w_run).alias("first_value"),
    )


@query(
    "q95_range_frame",
    oracle="""
SELECT event_id, user_id,
       round(sum(value) OVER (
           PARTITION BY user_id
           ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4) AS trailing_1h
FROM events
""",
)
def q95_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frame: per-user trailing-hour sum ordered
    by event time in epoch seconds — the frame is defined by the ORDER BY
    VALUE distance, not row count (rows at the same second are peers).

    DuckDB's epoch() is fractional DOUBLE while Spark's unix_timestamp
    truncates; both sides floor to whole seconds so peer groups agree."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("trailing_1h"),
    )


@query(
    "q98_distribution_ranks",
    oracle="""
SELECT o_orderstatus, o_orderkey,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cume,
       ntile(4) OVER w                 AS quartile
FROM orders
WHERE o_orderkey < 2000
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
)
def q98_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist / ntile over
    a total order — the scoring primitives for percentile-based quality
    filtering (e.g. 'drop the bottom decile by quality score') done
    relationally instead of with a pre-computed histogram."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderstatus",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "q99_value_windows",
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_ord,
       last_value(o_orderkey)  OVER w AS latest_ord,
       nth_value(o_orderkey, 2) OVER w AS second_ord
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def q99_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit full-partition
    frame. The frame is spelled out because last_value's DEFAULT frame
    (unbounded preceding .. current row) returns the current row — the
    classic window gotcha; pinning the frame makes the semantics portable."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_ord"),
        F.last("o_orderkey").over(w).alias("latest_ord"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ord"),
    )
