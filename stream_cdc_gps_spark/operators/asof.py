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
