"""As-of (temporal) join — enrich each row with the latest matching row at or
before its event time (SURVEY.md §2B joins table, ⚙ row).

Spark has no ASOF JOIN operator; the scalable formulation is the union +
running-`last(ignorenulls)` window trick: tag both sides, union them, and for
each left row take the most recent right value within the key partition. One
shuffle on the key, no range join, no state blowup — this is the plan that
survives 100 TB (a naive non-equi join is O(left x right) per key).

The DuckDB oracle uses its native ASOF JOIN, so the differential test checks
our composition against a first-class implementation of the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_cdc_gps_spark.operators.common import t
from stream_cdc_gps_spark.registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
) -> DataFrame:
    """left rows + latest right ``value_cols`` with right.ts <= left.ts.

    ``right`` must be unique per (on, ts) — pre-aggregate if not, or the
    match is nondeterministic (true of any ASOF implementation).
    """
    lhs = left.withColumn("__side", F.lit(1))
    rhs = right.select(
        on, ts, *value_cols
    ).withColumn("__side", F.lit(0))
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    # right rows sort before left rows at equal ts => ties match (ASOF >=).
    w = (
        Window.partitionBy(on)
        .orderBy(ts, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in value_cols
        ],
    )
    keep = [c for c in left.columns]
    return (
        filled.filter(F.col("__side") == 1)
        .select(*keep, *[F.col(f"__asof_{c}").alias(c) for c in value_cols])
    )


@query(
    "q34_asof_join",
    oracle="""
WITH signups AS (
    SELECT user_id, ts, max(value) AS signup_value
    FROM events WHERE event_type = 'signup'
    GROUP BY user_id, ts
)
SELECT e.event_id, e.user_id, e.ts, e.event_type,
       s.ts AS signup_ts, s.signup_value
FROM events e
ASOF LEFT JOIN signups s
  ON e.user_id = s.user_id AND e.ts >= s.ts
""",
)
def q34_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich every event with the user's most recent signup at-or-before it.

    The signup side is pre-aggregated to one row per (user_id, ts) so the
    match is deterministic on both engines."""
    e = t(spark, sf_dir, "events")
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("signup_value"))
        .withColumn("signup_ts", F.col("ts"))
    )
    left = e.select("event_id", "user_id", "ts", "event_type")
    return asof_join(
        left,
        signups.select("user_id", F.col("ts"), "signup_ts", "signup_value"),
        on="user_id",
        ts="ts",
        value_cols=["signup_ts", "signup_value"],
    )


@query(
    "q136_asof_tolerance",
    oracle="""
WITH signups AS (
    SELECT user_id, ts, max(value) AS signup_value
    FROM events WHERE event_type = 'signup'
    GROUP BY user_id, ts
)
SELECT e.event_id, e.user_id,
       s.ts IS NOT NULL
           AND CAST(floor(epoch(e.ts)) AS BIGINT)
             - CAST(floor(epoch(s.ts)) AS BIGINT) <= 21600   AS fresh,
       CASE WHEN CAST(floor(epoch(e.ts)) AS BIGINT)
               - CAST(floor(epoch(s.ts)) AS BIGINT) <= 21600
            THEN s.signup_value END                          AS signup_value
FROM events e
ASOF LEFT JOIN signups s
  ON e.user_id = s.user_id AND e.ts >= s.ts
""",
)
def q136_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-staleness TOLERANCE: the latest at-or-before
    match counts only if it is within 6 hours — the financial-data contract
    ("use the last quote unless it's stale") that plain as-of (q34) can't
    express. Matches older than the tolerance are nulled, not substituted.

    Same scalable union + running-last composition as q34 (one keyed
    shuffle); the tolerance is a pure post-predicate on the matched pair,
    so it adds zero data movement. Epoch-second arithmetic keeps the
    staleness check integer on both engines."""
    e = t(spark, sf_dir, "events")
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("signup_value"))
        .withColumn("signup_ts", F.col("ts"))
    )
    left = e.select("event_id", "user_id", "ts")
    matched = asof_join(
        left,
        signups.select("user_id", F.col("ts"), "signup_ts", "signup_value"),
        on="user_id",
        ts="ts",
        value_cols=["signup_ts", "signup_value"],
    )
    age = F.unix_timestamp("ts") - F.unix_timestamp("signup_ts")
    fresh = F.col("signup_ts").isNotNull() & (age <= 21600)
    return matched.select(
        "event_id",
        "user_id",
        fresh.alias("fresh"),
        F.when(age <= 21600, F.col("signup_value")).alias("signup_value"),
    )


@query(
    "q212_point_in_time_features",
    oracle="""
WITH purchases AS (
    SELECT user_id, ts, max(value) AS purchase_value
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id, ts
),
errors AS (
    SELECT user_id, ts, max(value) AS error_value
    FROM events WHERE event_type = 'error'
    GROUP BY user_id, ts
)
SELECT e.event_id, e.user_id,
       p.purchase_value,
       r.ts IS NOT NULL
           AND CAST(floor(epoch(e.ts)) AS BIGINT)
             - CAST(floor(epoch(r.ts)) AS BIGINT) <= 3600   AS error_fresh,
       CASE WHEN CAST(floor(epoch(e.ts)) AS BIGINT)
               - CAST(floor(epoch(r.ts)) AS BIGINT) <= 3600
            THEN r.error_value END                          AS error_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') e
ASOF LEFT JOIN purchases p ON e.user_id = p.user_id AND e.ts >= p.ts
ASOF LEFT JOIN errors    r ON e.user_id = r.user_id AND e.ts >= r.ts
""",
)
def q212_point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME FEATURE JOIN — the feature-store contract a training
    pipeline needs to avoid label leakage: each prediction point (here:
    click events) is enriched with N feature tables AS OF its own event
    time, never after it, each feature with its OWN staleness policy —
    the latest purchase value unboundedly (slowly-changing profile
    feature), the latest error value only if within 1 hour (a freshness-
    critical signal that must NULL out, not go stale silently). Composes
    the q34 as-of and the q136 tolerance rows across MULTIPLE right
    sides; the oracle is DuckDB's native chained ASOF LEFT JOINs.

    Scale: each feature table is one union + running-last window pass
    sharing the SAME user-key partitioning — k feature tables cost k
    keyed shuffles of (left + that feature) only, never a range join or
    O(left × right) expansion; this is the plan a 100 TB training-set
    materialization runs per feature group."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    errors = (
        e.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("error_value"))
        .withColumn("error_ts", F.col("ts"))
    )
    step1 = asof_join(
        clicks, purchases, on="user_id", ts="ts", value_cols=["purchase_value"]
    )
    step2 = asof_join(
        step1,
        errors.select("user_id", "ts", "error_ts", "error_value"),
        on="user_id",
        ts="ts",
        value_cols=["error_ts", "error_value"],
    )
    age = F.unix_timestamp("ts") - F.unix_timestamp("error_ts")
    fresh = F.col("error_ts").isNotNull() & (age <= 3600)
    return step2.select(
        "event_id",
        "user_id",
        "purchase_value",
        fresh.alias("error_fresh"),
        F.when(age <= 3600, F.col("error_value")).alias("error_value"),
    )
