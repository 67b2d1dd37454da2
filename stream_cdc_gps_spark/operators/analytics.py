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


@query(
    "q114_scd2_history",
    oracle="""
SELECT user_id,
       CAST(row_number() OVER w AS BIGINT) AS version,
       value,
       ts                                  AS valid_from,
       lead(ts) OVER w                     AS valid_to,
       lead(ts) OVER w IS NULL             AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q114_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: each keyed change
    becomes a versioned validity interval [valid_from, valid_to), open-ended
    for the current row — the standard way a CDC changelog (the reference's
    domain, cmd/main.go:187-240) materializes into a queryable dimension.

    Scale: one window pass partitioned by the business key — a single
    user-keyed shuffle; version, valid_to, and is_current all ride the same
    sort. Ties broken by event_id for determinism."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("version"),
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@query(
    "q115_snapshot_diff",
    oracle="""
WITH old AS (
    SELECT o_orderkey AS k, o_totalprice AS v FROM orders WHERE o_orderkey % 10 < 9
),
new AS (
    SELECT o_orderkey AS k,
           CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1e0
                ELSE o_totalprice END AS v
    FROM orders WHERE o_orderkey % 10 > 0
)
SELECT CASE WHEN o.k IS NULL THEN 'inserted'
            WHEN n.k IS NULL THEN 'deleted'
            WHEN o.v <> n.v  THEN 'updated'
            ELSE 'unchanged' END            AS category,
       CAST(count(*) AS BIGINT)             AS n_keys,
       round(sum(CASE WHEN o.k IS NOT NULL AND n.k IS NOT NULL
                      THEN n.v - o.v ELSE 0.0e0 END), 2) AS value_drift
FROM old o FULL OUTER JOIN new n ON o.k = n.k
GROUP BY category
""",
)
def q115_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / audit: classify every key across two table versions as
    inserted / deleted / updated / unchanged, with the net value drift — the
    reconciliation check run after any CDC backfill or migration (the two
    versions here are deterministic transforms of orders so the oracle sees
    identical inputs).

    Scale: a full-outer self-join on the key — both sides hash-partition the
    same way, one shuffle each — then a 4-row aggregate."""
    o = t(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 10 < 9).select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("v_old")
    )
    new = o.filter(F.col("o_orderkey") % 10 > 0).select(
        F.col("o_orderkey").alias("k"),
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 1.1e0
        ).otherwise(F.col("o_totalprice")).alias("v_new"),
    )
    j = old.join(new, "k", "full_outer")
    category = (
        F.when(F.col("v_old").isNull(), "inserted")
        .when(F.col("v_new").isNull(), "deleted")
        .when(F.col("v_old") != F.col("v_new"), "updated")
        .otherwise("unchanged")
    )
    drift = F.when(
        F.col("v_old").isNotNull() & F.col("v_new").isNotNull(),
        F.col("v_new") - F.col("v_old"),
    ).otherwise(F.lit(0.0))
    return j.groupBy(category.alias("category")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.round(F.sum(drift), 2).alias("value_drift"),
    )


@query(
    "q116_dq_checks",
    oracle="""
SELECT 'orders_custkey_fk' AS check_name,
       CAST(count(*) AS BIGINT) AS n_violations, count(*) = 0 AS passed
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem_quantity_range',
       CAST(count(*) AS BIGINT), count(*) = 0
FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
UNION ALL
SELECT 'customer_pk_unique',
       CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT),
       count(*) = count(DISTINCT c_custkey)
FROM customer
UNION ALL
SELECT 'documents_nonempty',
       CAST(count(*) AS BIGINT), count(*) = 0
FROM documents WHERE text IS NULL OR len(text) = 0
""",
)
def q116_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint battery (dbt-test style): referential
    integrity, accepted range, primary-key uniqueness, and non-emptiness,
    each reported as (check, violation count, pass flag) in ONE result.

    Scale: each check is an independent scan+aggregate (the FK check an
    anti-join with the broadcastable dimension); Spark runs the union's
    branches as parallel stages, and a violation count never exceeds the
    driver by more than one row per check."""
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    lineitem = t(spark, sf_dir, "lineitem")
    docs = t(spark, sf_dir, "documents")

    def row(name: str, viol: DataFrame) -> DataFrame:
        return viol.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_violations"),
            (F.count(F.lit(1)) == 0).alias("passed"),
        )

    fk = orders.join(
        F.broadcast(customer.select(F.col("c_custkey").alias("o_custkey"))),
        "o_custkey",
        "left_anti",
    )
    rng = lineitem.filter((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50))
    uniq = customer.agg(
        F.lit("customer_pk_unique").alias("check_name"),
        (F.count(F.lit(1)) - F.countDistinct("c_custkey"))
        .cast("bigint")
        .alias("n_violations"),
        (F.count(F.lit(1)) == F.countDistinct("c_custkey")).alias("passed"),
    )
    empty = docs.filter(F.col("text").isNull() | (F.length("text") == 0))
    return (
        row("orders_custkey_fk", fk)
        .unionAll(row("lineitem_quantity_range", rng))
        .unionAll(uniq)
        .unionAll(row("documents_nonempty", empty))
    )


@query(
    "q117_price_histogram",
    oracle="""
WITH s AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders)
SELECT CAST(least(floor((o_totalprice - mn) * 20.0e0 / (mx - mn)), 19.0e0) AS BIGINT)
           AS bin_id,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders, s
GROUP BY bin_id
""",
)
def q117_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 bins over the global [min, max]): the
    profiling primitive behind query planners' column stats and data-viz
    binning. Both engines evaluate the identical double expression
    (x - mn) * 20 / (mx - mn), so bin edges agree bit-for-bit.

    Scale: the 1-row global extent broadcast-joins onto the scan (no
    driver collect); binning is map-side; one 20-group aggregate."""
    o = t(spark, sf_dir, "orders")
    s = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    binned = o.crossJoin(F.broadcast(s)).select(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("mn")) * 20.0 / (F.col("mx") - F.col("mn"))
            ),
            F.lit(19).cast("bigint"),
        ).alias("bin_id"),
        "o_totalprice",
    )
    return binned.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@query(
    "q118_rolling_dau",
    oracle="""
WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
ex AS (SELECT user_id, day + CAST(o AS INTEGER) AS day
       FROM act, UNNEST(range(0, 7)) AS u(o))
SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau_7d
FROM ex
WHERE day <= (SELECT max(CAST(ts AS DATE)) FROM events)
GROUP BY day
""",
)
def q118_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day. COUNT(DISTINCT) OVER a
    sliding range frame isn't supported by either engine's window path, so
    this uses the scalable rewrite: each (user, day) activity row is
    replicated to the 7 window endpoints it contributes to, then one
    distinct-count per target day.

    Scale: replication factor equals the window width (constant 7), the
    distinct aggregation keys on (day, user) — uniform — and the ghost tail
    past the last observed day is trimmed by a broadcast 1-row bound."""
    e = t(spark, sf_dir, "events")
    act = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    ex = act.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
        "day",
    ).select("user_id", F.date_add(F.col("day"), F.col("o")).alias("day"))
    bound = e.agg(F.max(F.to_date("ts")).alias("max_day"))
    return (
        ex.crossJoin(F.broadcast(bound))
        .filter(F.col("day") <= F.col("max_day"))
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("dau_7d"))
    )


def _ewma_terms() -> tuple[str, str]:
    """Build the (numerator, denominator) SQL for an 8-tap alpha=0.5 EWMA.

    Written once and shared VERBATIM by the oracle and (via expr) the Spark
    side: powers of 0.5 are exact binary fractions and the additions fold
    left-to-right identically in both engines, so the quotient matches
    bit-for-bit before rounding."""
    num = " + ".join(
        f"coalesce({0.5**k!r} * lag(value, {k}) OVER w, 0.0)" for k in range(8)
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {k}) OVER w IS NOT NULL THEN {0.5**k!r} ELSE 0.0 END"
        for k in range(8)
    )
    return num, den


_EWMA_NUM, _EWMA_DEN = _ewma_terms()


@query(
    "q119_ewma_smoothing",
    oracle=f"""
SELECT user_id, event_id, value,
       round(({_EWMA_NUM}) / ({_EWMA_DEN}), 4) AS ewma
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q119_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 0.5, 8-tap truncation)
    per user over the event-time sequence — the standard sensor/metric
    smoother. The recursive EWMA is not window-expressible, so this uses the
    8-tap truncated form (weights below 0.5^8 contribute < 0.4%); missing
    leading taps renormalize the denominator.

    alpha = 0.5 is chosen deliberately: its powers are exact binary
    fractions, so Spark and the oracle agree bit-for-bit (a 0.3 would
    accumulate representation error differently per engine). One user-keyed
    window pass; the 8 lags share a single sort."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = sum(
        (F.coalesce(F.lit(0.5**k) * F.lag("value", k).over(w), F.lit(0.0)) for k in range(8)),
        start=F.lit(0.0),
    )
    den = sum(
        (
            F.when(F.lag("value", k).over(w).isNotNull(), F.lit(0.5**k)).otherwise(
                F.lit(0.0)
            )
            for k in range(8)
        ),
        start=F.lit(0.0),
    )
    return e.select(
        "user_id", "event_id", "value", F.round(num / den, 4).alias("ewma")
    )


@query(
    "q120_ohlc_bars",
    oracle="""
WITH marked AS (
    SELECT user_id, CAST(ts AS DATE) AS day, value,
           first_value(value) OVER w AS open,
           last_value(value)  OVER w AS close
    FROM events
    WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day,
       max(open)                 AS open,
       max(value)                AS high,
       min(value)                AS low,
       max(close)                AS close,
       CAST(count(*) AS BIGINT)  AS n_ticks
FROM marked
GROUP BY user_id, day
""",
)
def q120_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling: per (entity, day) bar with open (first by event
    time), high, low, close (last by event time) and tick count — the
    canonical time-series downsample. first/last ride a full-frame window
    ordered by (ts, event_id) for deterministic ties.

    Scale: the window and the bar aggregation share the (user, day) hash
    partitioning — one shuffle; bars are bounded by entities x days, not by
    tick volume."""
    e = t(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    w = (
        Window.partitionBy("user_id", F.to_date("ts"))
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    marked = e.select(
        "user_id",
        day,
        "value",
        F.first("value").over(w).alias("open"),
        F.last("value").over(w).alias("close"),
    )
    return marked.groupBy("user_id", "day").agg(
        F.max("open").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max("close").alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
    )


@query(
    "q121_locf_gapfill",
    oracle="""
WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events),
spine AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
          FROM b),
users AS (SELECT DISTINCT user_id FROM events),
daily AS (
    SELECT user_id, day, v FROM (
        SELECT user_id, CAST(ts AS DATE) AS day, value AS v,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1
),
grid AS (SELECT u.user_id, s.day FROM users u, spine s)
SELECT g.user_id, g.day,
       last_value(d.v IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.day) AS value_filled,
       d.v IS NULL AS is_gap
FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
""",
)
def q121_locf_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF gap-fill: a dense (entity x day) grid where missing days carry
    the last observed value forward (null until the first observation) —
    the resampling step before any equal-spaced time-series model.

    Scale: the day spine is a broadcast 1-row sequence (bounded by calendar
    span); the entity dimension comes from the data; the daily-last
    collapse, the grid join, and the LOCF window all partition by entity —
    one keyed shuffle chain, no entity x day blowup beyond the grid that is
    the OUTPUT."""
    e = t(spark, sf_dir, "events")
    b = e.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = b.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    users = e.select("user_id").distinct()
    wday = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    daily = (
        e.select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.col("value").alias("v"),
            F.row_number().over(wday).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "v")
    )
    grid = users.crossJoin(F.broadcast(spine))
    locf = Window.partitionBy("user_id").orderBy("day")
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("v", ignorenulls=True).over(locf).alias("value_filled"),
            F.col("v").isNull().alias("is_gap"),
        )
    )
