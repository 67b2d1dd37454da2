"""Product-analytics operators over the events table.

Exact percentiles, ordered funnel conversion, and cohort retention — the
clickstream battery every analytics engine ships. All window passes share one
hash partitioning on user_id, so each query is a single user-keyed shuffle
plus a tiny final aggregate.

Reference parity note: the reference (cmd/main.go) streams rows to sinks and
has no analytics surface; these rows extend SURVEY.md §2B's aggregate/window
families with the standard event-analytics shapes built on them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_cdc_gps_spark.operators.common import t
from stream_cdc_gps_spark.registry import query


@query(
    "q110_exact_percentiles",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT)                 AS n,
       round(quantile_cont(value, 0.25e0), 4)   AS p25,
       round(quantile_cont(value, 0.5e0), 4)    AS median,
       round(quantile_cont(value, 0.75e0), 4)   AS p75
FROM events
GROUP BY event_type
""",
)
def q110_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles per group (vs q15's approx sketch): Spark's
    `percentile` aggregate == DuckDB's `quantile_cont` — both linearly
    interpolate over the sorted values, so the doubles agree bit-for-bit
    before rounding.

    Scale: exact percentiles materialize each group's values on one
    partition — correct for bounded group sizes (here: per-type event
    values); unbounded groups should use q15's percentile_approx instead.
    That trade IS the operator: engines need both."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.percentile("value", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("median"),
        F.round(F.percentile("value", F.lit(0.75)), 4).alias("p75"),
    )


@query(
    "q111_event_funnel",
    oracle="""
WITH s1 AS (
    SELECT user_id, event_type, ts,
           min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
    FROM events
),
s2 AS (
    SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                  OVER (PARTITION BY user_id) AS t2
    FROM s1
),
s3 AS (
    SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                  OVER (PARTITION BY user_id) AS t3
    FROM s2
),
u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
      FROM s3 GROUP BY user_id)
SELECT CAST(count(*) AS BIGINT)  AS n_users,
       CAST(count(t1) AS BIGINT) AS n_view,
       CAST(count(t2) AS BIGINT) AS n_click_after_view,
       CAST(count(t3) AS BIGINT) AS n_purchase_after_click,
       floor(count(t2) / CAST(count(t1) AS DOUBLE) * 10000 + 0.5e0) / 10000.0
                                 AS view_to_click,
       floor(count(t3) / CAST(count(t2) AS DOUBLE) * 10000 + 0.5e0) / 10000.0
                                 AS click_to_purchase
FROM u
""",
)
def q111_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: view -> first click AFTER the first view -> first
    purchase AFTER that click, per user; one row of stage counts and
    conversion rates. Order sensitivity (each stage must follow the prior
    stage's timestamp) is what separates a funnel from three filters.

    Scale: the three chained window passes all partition by user_id, so
    Catalyst plans ONE hash exchange reused across them; the per-user
    collapse reuses it too; only the single-row final aggregate moves data
    again. Rates use portable half-up rounding."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    s = (
        e.withColumn(
            "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    u = s.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    rate_vc = F.count("t2") / F.count("t1").cast("double")
    rate_cp = F.count("t3") / F.count("t2").cast("double")
    return u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count("t1").cast("bigint").alias("n_view"),
        F.count("t2").cast("bigint").alias("n_click_after_view"),
        F.count("t3").cast("bigint").alias("n_purchase_after_click"),
        (F.floor(rate_vc * 10000 + 0.5e0) / 10000.0).alias("view_to_click"),
        (F.floor(rate_cp * 10000 + 0.5e0) / 10000.0).alias("click_to_purchase"),
    )


@query(
    "q112_retention_cohorts",
    oracle="""
WITH cohort AS (
    SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
    FROM events WHERE event_type = 'signup' GROUP BY user_id
),
act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT c.cohort_day,
       CAST(date_diff('day', c.cohort_day, a.day) AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT)                              AS n_active
FROM act a JOIN cohort c ON a.user_id = c.user_id
WHERE date_diff('day', c.cohort_day, a.day) BETWEEN 0 AND 7
GROUP BY c.cohort_day, day_offset
""",
)
def q112_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-signup day, counted
    active on each of the following 0..7 day offsets (any event counts as
    activity).

    Scale: cohort extraction, the per-(user, day) distinct, and the join all
    key on user_id — co-partitioned, no extra exchanges; the final
    (cohort_day, offset) aggregate is bounded by days x offsets, not by
    event volume."""
    e = t(spark, sf_dir, "events")
    cohort = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("cohort_day"))
    )
    act = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    off = F.datediff(F.col("day"), F.col("cohort_day"))
    return (
        act.join(cohort, "user_id")
        .filter((off >= 0) & (off <= 7))
        .groupBy("cohort_day", off.cast("bigint").alias("day_offset"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
