"""Relational batch operators (SURVEY.md §2B — all EXT rows).

The reference has zero relational operators (SURVEY.md §2A: its whole surface
is ingest/flatten/produce/consume/insert, ``cmd/main.go``), so this module is
the standard suite any real query over the landed tables needs: scan, filter,
project, every join type, hash aggregation, rollup/cube/grouping sets,
percentiles, set ops, scalar function families.

Everything is declarative DataFrame / Spark SQL — Catalyst gets full freedom
for pushdown, pruning, join selection and AQE. Broadcast hints are placed
where a dimension is guaranteed small at ANY scale factor (region/nation:
fixed cardinality 5/25).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_cdc_gps_spark.operators.common import churn_script, prepare, t
from stream_cdc_gps_spark.registry import query
from stream_cdc_gps_spark.tables import register_views

# ---------------------------------------------------------------------------
# Scan + filter + hash aggregation
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 4)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary (scan→filter→hash-agg).

    Partial aggregation happens map-side (2 grouping keys x 6 states), so the
    shuffle carries O(|groups| x partitions) rows no matter the input size —
    the plan that survives 100 TB.
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q02_filter_predicates",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag,
       CASE WHEN l_quantity < 15 THEN 'low' ELSE 'high' END AS qty_band
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND l_returnflag IN ('A', 'R')
  AND NOT (l_discount < 0.02)
""",
)
def q02_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate suite: between / isin / boolean negation / conditional expr.

    All three predicates push down to the parquet scan (PushedFilters)."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & ~(F.col("l_discount") < 0.02)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_discount",
        "l_returnflag",
        F.when(F.col("l_quantity") < 15, "low").otherwise("high").alias("qty_band"),
    )


# ---------------------------------------------------------------------------
# Joins — every type
# ---------------------------------------------------------------------------


@query(
    "q03_top_revenue_orders",
    oracle="""
SELECT o_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way equi join → agg → deterministic top-k (TPC-H-Q3 shape).

    Catalyst broadcasts the filtered customer side under AQE at small SF and
    falls back to shuffled joins at scale; ORDER BY carries o_orderkey as a
    total tiebreak so LIMIT is well-defined."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "q04_left_join_counts",
    oracle="""
SELECT c_custkey, c_name,
       count(o_orderkey)                          AS order_cnt,
       round(coalesce(sum(o_totalprice), 0), 2)   AS total_spent
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
""",
)
def q04_left_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "q05_semi_join",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
""",
)
def q05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ≡ EXISTS: customers holding at least one open order."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q06_anti_join",
    oracle="""
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join ≡ NOT EXISTS: customers with no orders at all."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti").select(
        "c_custkey", "c_name", "c_nationkey"
    )


@query(
    "q07_full_outer_join",
    oracle="""
SELECT n_name,
       coalesce(cust_cnt, 0) AS cust_cnt,
       coalesce(supp_cnt, 0) AS supp_cnt
FROM (SELECT n_name, count(*) AS cust_cnt
      FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name) c
FULL OUTER JOIN
     (SELECT n_name, count(*) AS supp_cnt
      FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name) s
USING (n_name)
""",
)
def q07_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates (nations with customers vs suppliers)."""
    n = t(spark, sf_dir, "nation")
    cust = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cust_cnt"))
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("supp_cnt"))
    )
    return cust.join(supp, on="n_name", how="full_outer").select(
        "n_name",
        F.coalesce("cust_cnt", F.lit(0)).alias("cust_cnt"),
        F.coalesce("supp_cnt", F.lit(0)).alias("supp_cnt"),
    )


@query(
    "q08_regional_revenue",
    oracle="""
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def q08_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicit broadcast of the fixed-cardinality dims.

    nation (25 rows) and region (5 rows) are broadcast at ANY scale factor —
    the fact-side join never shuffles on the dim keys; only the final
    2-key aggregation shuffles."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    r = F.broadcast(t(spark, sf_dir, "region"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "q09_range_join",
    oracle="""
SELECT b.bucket, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders o JOIN (
    SELECT 'small' AS bucket, 0.0 AS lo, 50000.0 AS hi
    UNION ALL SELECT 'medium', 50000.0, 200000.0
    UNION ALL SELECT 'large', 200000.0, 1000000000.0
) b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.bucket
""",
)
def q09_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a tiny broadcast band table.

    The band side is 3 rows → broadcast nested-loop join, which is the right
    physical plan for banding at any scale (never a cartesian shuffle)."""
    o = t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("small", 0.0, 50000.0), ("medium", 50000.0, 200000.0), ("large", 200000.0, 1e9)],
        "bucket string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregation variants
# ---------------------------------------------------------------------------


@query(
    "q10_agg_stats",
    oracle="""
SELECT l_returnflag,
       count(*)                              AS n,
       min(l_quantity)                       AS min_qty,
       max(l_quantity)                       AS max_qty,
       round(avg(l_quantity), 6)             AS avg_qty,
       round(stddev_samp(l_quantity), 6)     AS std_qty,
       round(var_samp(l_quantity), 6)        AS var_qty,
       round(avg(l_discount), 6)             AS avg_disc
FROM lineitem
GROUP BY l_returnflag
""",
)
def q10_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate suite: count/min/max/avg/stddev/variance."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


@query(
    "q11_count_distinct",
    oracle="""
SELECT c_mktsegment,
       count(*)                   AS n_customers,
       count(DISTINCT c_nationkey) AS n_nations
FROM customer
GROUP BY c_mktsegment
""",
)
def q11_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg under the hood)."""
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


@query(
    "q12_rollup",
    oracle="""
SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def q12_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total)."""
    c = t(spark, sf_dir, "customer")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    r = F.broadcast(t(spark, sf_dir, "region"))
    return (
        c.join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


@query(
    "q13_cube",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q13_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions."""
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "q14_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def q14_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL."""
    prepare(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def _pct_sql(q: str) -> str:
    """quantile_cont as explicit rank/interpolation SQL (DuckDB side).

    Same arithmetic expression shape as the Spark side (a*(1-f)+b*f with
    f=(n-1)*q-floor((n-1)*q)) so the two engines produce bit-identical
    doubles — built-in percentile functions interpolate in engine-specific
    operation orders that diverge by an ulp and then round differently.
    """
    idx = f"(n - 1) * {q}"
    a = f"max(CASE WHEN rn = CAST(floor({idx}) AS BIGINT) + 1 THEN v END)"
    b = f"max(CASE WHEN rn = least(CAST(floor({idx}) AS BIGINT) + 2, n) THEN v END)"
    f_ = f"max({idx} - floor({idx}))"  # constant per group, but must aggregate
    # no round(): inputs are picked elements + identical-order arithmetic, so
    # both engines produce bit-identical doubles; round() itself is NOT
    # portable at exact-half values (HALF_UP on decimal vs x100 double trick).
    return f"{a} * (1 - {f_}) + {b} * {f_}"


@query(
    "q15_percentiles",
    oracle=f"""
WITH ranked AS (
    SELECT l_returnflag, l_extendedprice AS v,
           row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
           count(*)    OVER (PARTITION BY l_returnflag) AS n
    FROM lineitem
)
SELECT l_returnflag,
       {_pct_sql('0.25')} AS p25,
       {_pct_sql('0.50')} AS p50,
       {_pct_sql('0.75')} AS p75
FROM ranked
GROUP BY l_returnflag
""",
)
def q15_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (quantile_cont semantics) as an explicit
    rank + boundary-row + linear-interpolation plan.

    Scale shape: one shuffle on the group key, per-group sort for the window
    rank, then an ordinary hash agg — the standard exact-percentile plan for
    data too big to collect. Ties are safe: equal values make row_number
    order among them irrelevant."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").alias("v")
    )
    w = Window.partitionBy("l_returnflag").orderBy("v")
    ranked = li.select(
        "l_returnflag",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("l_returnflag")).alias("n"),
    )

    def pct(q: float):
        idx = (F.col("n") - 1) * q
        lo = F.floor(idx).cast("bigint") + 1
        hi = F.least(F.floor(idx).cast("bigint") + 2, F.col("n"))
        a = F.max(F.when(F.col("rn") == lo, F.col("v")))
        b = F.max(F.when(F.col("rn") == hi, F.col("v")))
        f_ = F.max(idx - F.floor(idx))  # constant per group, but must aggregate
        return a * (1 - f_) + b * f_

    return ranked.groupBy("l_returnflag").agg(
        pct(0.25).alias("p25"), pct(0.50).alias("p50"), pct(0.75).alias("p75")
    )


@query(
    "q16_having",
    oracle="""
SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 12
""",
)
def q16_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@query(
    "q17_conditional_agg",
    oracle="""
SELECT l_linestatus,
       round(sum(CASE WHEN l_returnflag = 'A' THEN l_extendedprice ELSE 0 END), 2) AS price_a,
       round(sum(CASE WHEN l_returnflag = 'N' THEN l_extendedprice ELSE 0 END), 2) AS price_n,
       round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END), 2) AS price_r,
       count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted
FROM lineitem
GROUP BY l_linestatus
""",
)
def q17_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation (sum/count over CASE)."""
    li = t(spark, sf_dir, "lineitem")

    def price_when(flag: str):
        return F.round(
            F.sum(F.when(F.col("l_returnflag") == flag, F.col("l_extendedprice")).otherwise(0.0)),
            2,
        )

    return li.groupBy("l_linestatus").agg(
        price_when("A").alias("price_a"),
        price_when("N").alias("price_n"),
        price_when("R").alias("price_r"),
        F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias("n_discounted"),
    )


# ---------------------------------------------------------------------------
# Set operations / distinct
# ---------------------------------------------------------------------------


@query(
    "q18_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
)
def q18_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations having both customers and suppliers."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q19_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
""",
)
def q19_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "q20_union_all",
    oracle="""
SELECT kind, nationkey, count(*) AS n FROM (
    SELECT 'customer' AS kind, c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT 'supplier' AS kind, s_nationkey AS nationkey FROM supplier
) GROUP BY kind, nationkey
""",
)
def q20_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by name + aggregation over the union."""
    c = t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"), F.col("c_nationkey").alias("nationkey")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).groupBy("kind", "nationkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q21_distinct",
    oracle="""
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
""",
)
def q21_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (dedup on the projected key set)."""
    return t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# ---------------------------------------------------------------------------
# Scalar function families
# ---------------------------------------------------------------------------


@query(
    "q22_string_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_name)                          AS name_upper,
       substr(p_name, 1, 5)                   AS name_pfx,
       length(p_name)                         AS name_len,
       concat_ws('|', p_brand, p_type)        AS brand_type,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
       split_part(p_name, ' ', 1)             AS first_word,
       replace(p_type, 'PROMO', 'PROMOTION')  AS type_full
FROM part
WHERE p_name LIKE '%bolt%'
""",
)
def q22_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family: case, substring, regex, split, replace, LIKE."""
    p = t(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%bolt%")).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.replace(F.col("p_type"), F.lit("PROMO"), F.lit("PROMOTION")).alias("type_full"),
    )


@query(
    "q23_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT)    AS order_year,
       CAST(month(o_orderdate) AS INT)   AS order_month,
       CAST(quarter(o_orderdate) AS INT) AS order_quarter,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS INT)
                                         AS days_to_98,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS ship_by
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
""",
)
def q23_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract, trunc, diff, arithmetic.

    The reference keeps timestamps as raw strings (``cmd/main.go:103``);
    the engine treats event time as a first-class TimestampType."""
    o = t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    ).select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate")).alias("days_to_98"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("ship_by"),
    )


@query(
    "q24_json_funcs",
    oracle="""
SELECT event_type,
       count(*) AS n,
       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS INT))           AS max_k
FROM events
GROUP BY event_type
""",
)
def q24_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the events.props payload column.

    Mirrors the reference's schema-on-read JSON handling
    (``cmd/main.go:203-208``) as a column expression."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "q25_hash_funcs",
    oracle="""
SELECT doc_id,
       md5(text)                 AS text_md5,
       substr(md5(text), 1, 8)   AS md5_pfx
FROM documents
WHERE doc_id < 100
""",
)
def q25_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hashing (md5) — the basis for dedup keys."""
    d = t(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.substring(F.md5("text"), 1, 8).alias("md5_pfx"),
    )


@query(
    "q26_approx_stats",
    oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       TRUE AS approx_within_5pct
FROM lineitem
GROUP BY l_returnflag
""",
)
def q26_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates (HLL++ distinct) checked against their exact twins.

    Approximate answers are implementation-defined, so the sketch value
    itself can't be oracled; instead the query emits the exact count (full
    hash check) plus an in-query assertion that the HLL++ estimate (rsd=0.01,
    so 5% is a ~5-sigma envelope) stays within 5% relative error — the oracle
    pins the flag to TRUE, so a drifting sketch fails the diff."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("exact_orders"),
        (
            F.abs(
                F.approx_count_distinct("l_orderkey", 0.01)
                - F.count_distinct("l_orderkey")
            )
            <= F.count_distinct("l_orderkey") * F.lit(0.05)
        ).alias("approx_within_5pct"),
    )


# ---------------------------------------------------------------------------
# Subqueries / pivot / arg-extremes
# ---------------------------------------------------------------------------


@query(
    "q27_correlated_subquery",
    oracle="""
SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                   WHERE c2.c_mktsegment = c.c_mktsegment)
""",
)
def q27_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (customers above their segment's average).

    Catalyst decorrelates this into an aggregate + join — same plan you'd
    write by hand, but expressed declaratively."""
    prepare(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                           WHERE c2.c_mktsegment = c.c_mktsegment)
        """
    )


@query(
    "q28_pivot",
    oracle="""
SELECT l_linestatus,
       round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS qty_a,
       round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS qty_n,
       round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS qty_r
FROM lineitem
GROUP BY l_linestatus
""",
)
def q28_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (explicit list = single-pass plan;
    without it Spark runs an extra distinct-values job)."""
    li = t(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return p.select(
        "l_linestatus",
        F.col("A").alias("qty_a"),
        F.col("N").alias("qty_n"),
        F.col("R").alias("qty_r"),
    )


@query(
    "q29_min_max_by",
    oracle="""
SELECT o_orderstatus,
       arg_min(o_orderkey, o_totalprice) AS cheapest_order,
       arg_max(o_orderkey, o_totalprice) AS priciest_order,
       round(min(o_totalprice), 2)       AS min_price,
       round(max(o_totalprice), 2)       AS max_price
FROM orders
GROUP BY o_orderstatus
""",
)
def q29_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-extreme aggregates (min_by/max_by ≡ DuckDB arg_min/arg_max).

    o_totalprice is unique per status group in this corpus, so the argmin is
    deterministic (both engines break ties arbitrarily otherwise)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "q35_collect_sorted",
    oracle="""
SELECT n_name,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
       count(*) AS n_cust
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def q35_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-valued aggregation (collect_set) with a deterministic sort —
    unsorted collect output order is engine-defined, so sort_array is the
    portability contract for array results. Emitted as a joined string:
    array-typed result columns crash pandas-side canonicalizers (lists are
    unhashable), and the join loses nothing since segments never contain
    commas."""
    c = t(spark, sf_dir, "customer")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    return (
        c.join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias("segments"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )


@query(
    "q36_map_functions",
    oracle="""
SELECT event_id, event_type,
       CAST(len(map_keys(m)) AS INT)  AS n_keys,
       map_keys(m)[1]                 AS first_key,
       CAST(m['k'][1] AS INT)         AS k_value
FROM (SELECT event_id, event_type,
             map(['k'], [json_extract_string(props, '$.k')]) AS m
      FROM events) t
WHERE m['k'][1] IS NOT NULL
""",
)
def q36_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns: build from JSON, map_keys, element access.

    The reference's dynamic ``map[string]interface{}`` payload
    (``cmd/main.go:65,97``) as a first-class MapType column."""
    e = t(spark, sf_dir, "events")
    m = F.create_map(F.lit("k"), F.get_json_object("props", "$.k"))
    return (
        e.select("event_id", "event_type", m.alias("m"))
        .filter(F.element_at("m", "k").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.size(F.map_keys("m")).alias("n_keys"),
            F.map_keys("m").getItem(0).alias("first_key"),
            F.element_at("m", "k").cast("int").alias("k_value"),
        )
    )


@query(
    "q37_set_ops_all",
    oracle="""
SELECT nationkey, count(*) AS n FROM (
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
) GROUP BY nationkey
""",
)
def q37_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics) — multiplicity = min of the two sides."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q38_except_all",
    oracle="""
SELECT nationkey, count(*) AS n FROM (
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
) GROUP BY nationkey
""",
)
def q38_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics) — multiplicity = left minus right, floor 0."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q39_uncorrelated_subquery",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
""",
)
def q39_uncorrelated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate (orders above 1.5x the
    global average) — Catalyst evaluates the subquery once and broadcasts
    the scalar into the filter."""
    prepare(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


@query(
    "q47_hypertable_rollup",
    oracle="""
SELECT event_type,
       CASE WHEN grouping(day) = 0 AND grouping(hour) = 0 THEN 'hour'
            WHEN grouping(day) = 0 THEN 'day' ELSE 'total' END AS resolution,
       day, hour,
       count(*)             AS n,
       round(sum(value), 4) AS sum_value
FROM (SELECT event_type, value,
             CAST(date_trunc('day', ts) AS TIMESTAMP)  AS day,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour
      FROM events) t
GROUP BY GROUPING SETS ((event_type, day, hour), (event_type, day), (event_type))
""",
)
def q47_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hour, day, and total rollups of
    the events stream computed in ONE pass via grouping sets (one shuffle for
    all three resolutions — the batch form of a multi-resolution materialized
    rollup; the streaming form is the same expression per micro-batch)."""
    prepare(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type,
               CASE WHEN grouping(day) = 0 AND grouping(hour) = 0 THEN 'hour'
                    WHEN grouping(day) = 0 THEN 'day' ELSE 'total' END AS resolution,
               day, hour,
               count(*)             AS n,
               round(sum(value), 4) AS sum_value
        FROM (SELECT event_type, value,
                     date_trunc('day', ts)  AS day,
                     date_trunc('hour', ts) AS hour
              FROM events) t
        GROUP BY GROUPING SETS ((event_type, day, hour), (event_type, day), (event_type))
        """
    )


# ---------------------------------------------------------------------------
# Coverage completions: array higher-order functions, unpivot, EXISTS,
# cross/right joins, generators (SURVEY.md §2B scalar/array + join rows)
# ---------------------------------------------------------------------------


@query(
    "q48_array_functions",
    oracle="""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
SELECT vec_id,
       CAST(len(emb) AS INT)                               AS dim,
       CAST(len(list_filter(emb, x -> x > 0.0)) AS INT)    AS n_pos,
       round(list_reduce(emb, (a, x) -> a + x), 6)         AS sum_all,
       round(list_sort(emb)[-1], 6)                        AS max_val,
       round(list_reduce(emb[1:8], (a, x) -> a + x), 6)    AS sum_head8
FROM e
""",
)
def q48_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: transform/filter/aggregate/array_sort/
    slice as pure column expressions (JVM-side, whole-stage codegen — the
    no-UDF path for array<float> columns at 100 TB).

    Fold order matters for float equality with the oracle: Spark's
    ``aggregate(emb, 0.0, (a,x) -> a+x)`` and DuckDB's ``list_reduce`` both
    fold left-to-right, and ``0.0 + x == x`` exactly, so the sums agree
    bit-for-bit before rounding."""
    from stream_cdc_gps_spark.functions.vector import as_double

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    fold = lambda col: F.aggregate(col, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return e.select(
        "vec_id",
        F.size("emb").alias("dim"),
        F.size(F.filter("emb", lambda x: x > F.lit(0.0))).alias("n_pos"),
        F.round(fold(F.col("emb")), 6).alias("sum_all"),
        F.round(F.element_at(F.array_sort("emb"), -1), 6).alias("max_val"),
        F.round(fold(F.slice("emb", 1, 8)), 6).alias("sum_head8"),
    )


@query(
    "q49_unpivot",
    oracle="""
SELECT measure, round(sum(value), 2) AS total, count(*) AS n
FROM (
    SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
    UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL SELECT 'l_discount', l_discount FROM lineitem
    UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
GROUP BY measure
""",
)
def q49_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide measures -> long (measure, value)) + re-aggregate.

    ``DataFrame.unpivot`` is a zero-shuffle narrow transform (each row
    expands locally); only the follow-up groupBy shuffles, and it carries
    just 4 groups x partial states."""
    li = t(spark, sf_dir, "lineitem")
    unp = li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return unp.groupBy("measure").agg(
        F.round(F.sum("value"), 2).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


_Q90_SQL = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey
                    AND o2.o_orderstatus = 'F')
"""


@query("q90_exists_subqueries", oracle=_Q90_SQL)
def q90_exists_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS correlated subqueries — Catalyst rewrites them to
    left-semi and left-anti joins (no per-row subquery execution; same plan
    shape as q05/q06 but reached through the SQL front door)."""
    prepare(spark)
    register_views(spark, sf_dir)
    return spark.sql(_Q90_SQL)


@query(
    "q91_cross_join",
    oracle="""
SELECT r_name, seg, r_name || '/' || seg AS cell
FROM region
CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer)
""",
)
def q91_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (5 regions x 5 segments = dense grid).

    Safe at any scale because BOTH sides are aggregates of bounded
    cardinality before the cross join — never cross-join raw fact tables."""
    r = t(spark, sf_dir, "region").select("r_name")
    seg = (
        t(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("seg"))
        .distinct()
    )
    return r.crossJoin(seg).select(
        "r_name", "seg", F.concat_ws("/", "r_name", "seg").alias("cell")
    )


@query(
    "q92_right_join",
    oracle="""
SELECT c_mktsegment, count(o_orderkey) AS n_orders, count(*) AS n_rows
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def q92_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join preserving customers with zero orders, then
    aggregate; count(o_orderkey) vs count(*) distinguishes matched rows
    from null-extended ones."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"], "right")
        .groupBy("c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q93_posexplode",
    oracle="""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
SELECT CAST(i AS INT) AS pos, count(*) AS n_pos, round(avg(emb[i]), 6) AS avg_val
FROM e, range(1, 9) r(i)
WHERE emb[i] > 0.0
GROUP BY i
""",
)
def q93_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator with ordinality: posexplode over the first 8 embedding
    dimensions -> per-position stats. The explode is a narrow transform;
    only the 8-group aggregate shuffles."""
    from stream_cdc_gps_spark.functions.vector import as_double

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    ex = e.select(F.posexplode(F.slice("emb", 1, 8)).alias("pos0", "val"))
    return (
        ex.filter(F.col("val") > 0.0)
        .select((F.col("pos0") + 1).cast("int").alias("pos"), "val")
        .groupBy("pos")
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.round(F.avg("val"), 6).alias("avg_val"),
        )
    )


@query(
    "q96_date_spine_coverage",
    oracle="""
WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events),
spine AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
          FROM b),
have AS (SELECT CAST(ts AS DATE) AS day,
                count(*)                    AS n_events,
                count(DISTINCT event_type)  AS n_types
         FROM events GROUP BY 1)
SELECT s.day,
       CAST(coalesce(h.n_events, 0) AS BIGINT) AS n_events,
       CAST(coalesce(h.n_types, 0) AS BIGINT)  AS n_types
FROM spine s LEFT JOIN have h ON h.day = s.day
""",
)
def q96_date_spine_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine coverage: generate every day in the stream's range
    (sequence + explode — no date can hide by having zero rows), left-join
    daily activity, zero-fill gaps. The monitoring query that catches silent
    ingestion outages; the spine side is O(days), so the join broadcasts it
    at any data scale."""
    e = t(spark, sf_dir, "events")
    b = e.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = b.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    have = (
        e.select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("h_events"),
            F.countDistinct("event_type").alias("h_types"),
        )
    )
    return spine.join(have, "day", "left").select(
        "day",
        F.coalesce("h_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce("h_types", F.lit(0)).cast("bigint").alias("n_types"),
    )


@query(
    "q89_cogroup_stats",
    oracle="""
WITH ev AS (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 4) AS total_value
            FROM events GROUP BY user_id),
oc AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_orders,
              round(sum(o_totalprice), 2) AS total_price
       FROM orders GROUP BY o_custkey)
SELECT coalesce(ev.k, oc.k)        AS k,
       coalesce(n_events, 0)       AS n_events,
       round(coalesce(total_value, 0.0), 4) AS total_value,
       coalesce(n_orders, 0)       AS n_orders,
       round(coalesce(total_price, 0.0), 2) AS total_price
FROM ev FULL OUTER JOIN oc ON ev.k = oc.k
""",
)
def q89_cogroup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: per-key fusion of TWO tables in one Arrow
    batch — the escape hatch for per-key logic that needs both sides at once
    (custom as-of merges, per-entity reconciliation). Here each (events[k],
    orders[k]) pair reduces to joint stats; the oracle is the equivalent
    full-outer join of two aggregates.

    Scale: cogroup shuffles each side once on the key — identical movement
    to the join it replaces; per-key pandas work is Arrow-batched. Keys
    missing on one side arrive with an empty frame (coalesced to 0)."""
    import pandas as pd

    prepare(spark)
    ev = t(spark, sf_dir, "events").select(F.col("user_id").alias("k"), "value")
    oc = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"), "o_totalprice")

    def fuse(key: tuple, e: pd.DataFrame, o: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [
                {
                    "k": key[0],
                    "n_events": len(e),
                    "total_value": round(float(e["value"].sum()), 4),
                    "n_orders": len(o),
                    "total_price": round(float(o["o_totalprice"].sum()), 2),
                }
            ]
        )

    return (
        ev.groupBy("k")
        .cogroup(oc.groupBy("k"))
        .applyInPandas(
            fuse,
            schema="k bigint, n_events bigint, total_value double, "
            "n_orders bigint, total_price double",
        )
    )


@query(
    "q109_lateral_topk",
    oracle="""
SELECT n.n_name, c.c_name, c.c_acctbal
FROM nation n, LATERAL (
    SELECT c_name, c_acctbal FROM customer
    WHERE c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_name LIMIT 3
) c
""",
)
def q109_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (SQL surface): top-3 customers by balance
    per nation, expressed as JOIN LATERAL with a correlated ORDER BY/LIMIT.

    Exercises Spark's lateral-join decorrelation: Catalyst rewrites the
    per-row LIMIT into a window/rank over a single equi-join — the same plan
    the DataFrame top-k-per-group (q30) builds by hand, so the SQL surface
    costs nothing extra at scale. Views are registered per-query from the
    given sf_dir (names prefixed to avoid cross-query collisions)."""
    t(spark, sf_dir, "nation").createOrReplaceTempView("q109_nation")
    t(spark, sf_dir, "customer").createOrReplaceTempView("q109_customer")
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM q109_nation n
        JOIN LATERAL (
            SELECT c_name, c_acctbal FROM q109_customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name LIMIT 3
        ) c
        """
    )


@query(
    "q127_variant_extract",
    oracle="""
SELECT CAST(props->>'$.k' AS INTEGER) % 10                  AS k_mod,
       CAST(count(*) AS BIGINT)                             AS n,
       round(avg(value), 4)                                 AS avg_value,
       min(CAST(props->>'$.k' AS INTEGER))                  AS min_k,
       max(CAST(props->>'$.k' AS INTEGER))                  AS max_k
FROM events
GROUP BY k_mod
""",
)
def q127_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured path (Spark 4): `parse_json` into the binary
    VARIANT encoding, typed extraction via `try_variant_get` — the
    shredded-JSON fast path that replaces per-query string re-parsing
    (q24 does the classic get_json_object form of the same field).

    Scale: parse + extract are map-side codegen'd expressions; one bounded
    aggregate. Against a VARIANT-shredded table the path access would skip
    parsing entirely; here the parse cost is per-row but single-pass."""
    e = t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return e.select(k.alias("k"), "value").groupBy(
        (F.col("k") % 10).alias("k_mod")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


@query(
    "q128_recursive_cte",
    oracle="""
WITH RECURSIVE reach(src, dst) AS (
    SELECT n_nationkey, n_nationkey FROM nation
    UNION ALL
    SELECT r.src, r.dst + 7 FROM reach r WHERE r.dst + 7 < 25
)
SELECT src, CAST(count(*) AS BIGINT) AS n_reachable, max(dst) AS max_dst
FROM reach GROUP BY src
""",
)
def q128_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 SQL surface): transitive closure over a
    bounded DAG (k -> k+7 while < 25) seeded from nation keys — the
    SQL-standard form of the iterative fixpoints the engine otherwise runs
    as driver loops (q57 components, q126 PageRank).

    Scale: each recursion level is one self-referential step bounded by the
    DAG depth (4 here); Spark enforces a recursion-depth guard, so an
    accidental cycle fails loudly instead of looping."""
    t(spark, sf_dir, "nation").createOrReplaceTempView("q128_nation")
    return spark.sql(
        """
        WITH RECURSIVE reach(src, dst) AS (
            SELECT n_nationkey, n_nationkey FROM q128_nation
            UNION ALL
            SELECT r.src, r.dst + 7 FROM reach r WHERE r.dst + 7 < 25
        )
        SELECT src, CAST(count(*) AS BIGINT) AS n_reachable, max(dst) AS max_dst
        FROM reach GROUP BY src
        """
    )


@query(
    "q129_collation_group",
    oracle="""
WITH mixed AS (
    SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS name
    FROM documents
)
SELECT min(name)                          AS min_variant,
       CAST(count(*) AS BIGINT)           AS n,
       CAST(count(DISTINCT name) AS BIGINT) AS n_variants
FROM mixed
GROUP BY lower(name)
""",
)
def q129_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4): case-insensitive GROUP BY via
    `COLLATE UTF8_LCASE` over a mixed-case column — collations make
    case/accent semantics a TYPE property instead of `lower()` sprinkled
    through every query. The oracle expresses the same partition with
    `GROUP BY lower(name)`; outputs use binary min/count so the group
    representative is deterministic.

    Scale: grouping on a collated key shuffles exactly like any other key
    (the collation key is computed map-side)."""
    d = t(spark, sf_dir, "documents")
    mixed = d.select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("source"))
        .otherwise(F.col("source"))
        .alias("name")
    )
    return mixed.groupBy(F.expr("name COLLATE UTF8_LCASE").alias("k")).agg(
        F.min("name").alias("min_variant"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("name").cast("bigint").alias("n_variants"),
    ).drop("k")


@query(
    "q130_sql_scripting",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_above,
       round((SELECT avg(o_totalprice) FROM orders), 4) AS cutoff
FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
""",
)
def q130_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4): BEGIN/DECLARE/SET procedural block — a
    session variable captures an aggregate once, then parameterizes the
    follow-up statement; the block's last SELECT is the result. The oracle
    is the equivalent scalar-subquery form.

    Scale: the variable assignment is one aggregate job whose 1-row result
    lives in the session — the same pattern as a broadcast scalar, with
    procedural sequencing instead of a nested plan."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("q130_orders")
    return spark.sql(
        """
        BEGIN
          DECLARE cutoff DOUBLE;
          SET cutoff = (SELECT avg(o_totalprice) FROM q130_orders);
          SELECT CAST(count(*) AS BIGINT) AS n_above,
                 round(cutoff, 4) AS cutoff
          FROM q130_orders WHERE o_totalprice > cutoff;
        END
        """
    )


@query(
    "q131_hll_partition_merge",
    oracle="""
SELECT CAST(count(DISTINCT date_trunc('month', o_orderdate)) AS BIGINT) AS n_shards,
       CAST(count(DISTINCT o_custkey) AS BIGINT)                        AS exact_customers,
       TRUE                                                             AS merged_within_5pct
FROM orders
""",
)
def q131_hll_partition_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch pattern (DataSketches HLL): build one HLL sketch PER
    PARTITION (month shard), then union-merge the sketches and estimate the
    global distinct — how incremental pipelines keep distinct counts
    without re-scanning history (customers recur across months, so the
    merge genuinely deduplicates; a sum of per-shard counts would
    overcount).

    The estimate itself is engine-specific, so the driver-checked contract
    is the q26 form: exact counts plus an in-query 5% accuracy bound the
    estimate must satisfy. Scale: sketches are fixed-size (KBs) regardless
    of shard cardinality — the merge moves n_shards sketches, not data."""
    o = t(spark, sf_dir, "orders")
    shards = o.groupBy(F.date_trunc("month", "o_orderdate").alias("shard")).agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = shards.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shards"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = o.agg(F.countDistinct("o_custkey").cast("bigint").alias("exact_customers"))
    return merged.crossJoin(F.broadcast(exact)).select(
        "n_shards",
        "exact_customers",
        (
            F.abs(F.col("est") - F.col("exact_customers"))
            <= 0.05 * F.col("exact_customers")
        ).alias("merged_within_5pct"),
    )


@query(
    "q193_incremental_join_view",
    oracle="""
SELECT o.o_orderkey AS order_key,
       o.o_custkey  AS cust_key,
       c.c_name     AS cust_name,
       o.o_totalprice AS total_price
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
""",
)
def q193_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL JOIN-VIEW PARITY (the q177/q190 pattern for the join
    family): maintain the materialized view orders ⋈ customer through
    streaming/join_view.IncrementalJoinView — per batch only the DELTA
    joins run (ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB, every term an equi join on
    the key) — over a 2-slice interleaved split of BOTH inputs, then the
    view snapshot. The oracle is the plain all-at-once batch join:
    "delta-maintained view == recompute" is itself the driver-checked
    claim, covering the cross-batch terms (even-batch orders matching
    odd-batch customers and vice versa).

    Scale: per-trigger work is O(|Δ| × matched state) via key-equi joins
    against batch-partitioned stores — never history×history; at 100 TB
    the alternative (recomputing the join each trigger) is O(|A|×|B|).
    Replay healing of torn three-store writes is pytest-pinned in
    tests/test_streaming.py."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.join_view import IncrementalJoinView

    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("total_price"),
    )
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("cust_name"),
    )
    base = tempfile.mkdtemp(prefix="join_view_")
    try:
        view = IncrementalJoinView(spark, base, "cust_key")
        view.merge(
            o.filter(F.col("order_key") % 2 == 0),
            c.filter(F.col("cust_key") % 2 == 0),
            0,
        )
        view.merge(
            o.filter(F.col("order_key") % 2 == 1),
            c.filter(F.col("cust_key") % 2 == 1),
            1,
        )
        out = view.snapshot().select(
            "order_key", "cust_key", "cust_name", "total_price"
        )
        # materialize before the temp state dir is removed
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q196_cdc_aggregate_view",
    oracle="""
WITH o_final AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1
                ELSE o_custkey END AS cust_key,
           CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0e0
                     ELSE o_totalprice END AS DECIMAL(18,2)) AS total_price
    FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT cust_key,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(total_price) AS DOUBLE) AS total_spend
FROM o_final GROUP BY cust_key
""",
)
def q196_cdc_aggregate_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-AWARE AGGREGATE-VIEW PARITY (the q194 algebra's aggregate
    face): maintain V = per-customer order count + DECIMAL(18,2)-exact
    spend through streaming/join_view.CdcAggregateView under the SAME
    changelog script as q194's order side — creates, price updates
    (% 7), key-changing updates (% 13 move an order's spend between
    customers: one −1 partial on the old key, one +1 on the new, same
    merge), and deletes (% 5) — then snapshot. The oracle is the plain
    GROUP BY over the CDC-upserted final table; the DECIMAL value column
    makes retract-then-assert leave zero arithmetic residue, so
    maintained == recomputed exactly, not within-epsilon.

    Scale: per-batch work is O(|Δ|) — one weighted-image projection and
    one |Δ|-keyed partial aggregate; history is NEVER re-aggregated (the
    alternative at 100 TB is a full re-scan per trigger). Torn-write
    replay healing and compaction are pytest-pinned alongside q194's."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.join_view import CdcAggregateView

    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("total_price"),
    )
    ok = F.col("order_key")
    ck = F.col("cust_key")
    raw_price = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("p_raw"),
    )
    a0 = o.select(F.lit("c").alias("op"), ok.alias("seq"), *o.columns)
    # updated images quantize AFTER the double bump, exactly as the oracle
    bump = lambda col: (col + F.lit(1.0e0)).cast("decimal(18,2)")
    with_raw = o.join(raw_price, "order_key")
    a_u1 = with_raw.filter(ok % 7 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000) + ok).alias("seq"),
        ok,
        ck,
        bump(F.col("p_raw")).alias("total_price"),
    )
    bumped = F.when(ok % 7 == 0, bump(F.col("p_raw"))).otherwise(
        F.col("total_price")
    )
    a_u2 = with_raw.filter(ok % 13 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(2_000_000_000) + ok).alias("seq"),
        ok,
        (ck + 1).alias("cust_key"),
        bumped.alias("total_price"),
    )
    a_d = o.filter(ok % 5 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(3_000_000_000) + ok).alias("seq"),
        *o.columns,
    )
    base = tempfile.mkdtemp(prefix="cdc_agg_view_")
    try:
        view = CdcAggregateView(
            spark, base, key="cust_key", pk="order_key", val="total_price"
        )
        view.merge(a0, 0)
        view.merge(a_u1.unionByName(a_u2).unionByName(a_d), 1)
        out = view.snapshot().select(
            "cust_key",
            F.col("n").alias("n_orders"),
            F.col("total").cast("double").alias("total_spend"),
        )
        # materialize before the temp state dir is removed
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q198_cdc_left_join_view",
    oracle="""
WITH o_final AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1
                ELSE o_custkey END AS cust_key,
           CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0e0
                ELSE o_totalprice END AS total_price
    FROM orders WHERE o_orderkey % 5 <> 0
),
c_final AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 3 = 0 THEN c_name || '*'
                ELSE c_name END AS cust_name
    FROM customer WHERE c_custkey % 11 <> 0
)
SELECT o.o_orderkey AS order_key, o.cust_key AS cust_key,
       c.cust_name AS cust_name, o.total_price AS total_price
FROM o_final o LEFT JOIN c_final c ON c.c_custkey = o.cust_key
""",
)
def q198_cdc_left_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-AWARE LEFT-JOIN-VIEW PARITY — the outer-join face of the IVM
    family (q194 covers inner): null-padding is an EXISTENCE indicator,
    so a customer delete (% 11) must flip every one of their orders to
    null-padded and a (re)insert must unflip them — no per-row ±1
    retraction expresses that; streaming/join_view.CdcLeftJoinView
    recomputes only the touched keys per merge and versions the view by
    key. Same changelog script as q194 on both sides; the key-moving
    updates (% 13 reassign to cust_key + 1, which may not exist) are
    what create unmatched orders mid-stream. Oracle is the plain batch
    LEFT JOIN over the CDC-upserted final tables — null padding
    included in the hash comparison.

    Scale: per-batch work is O(touched keys' state on both sides), all
    key-equi joins against latest-per-pk snapshots; torn-write healing
    and key-versioned supersession are pytest-pinned alongside the
    q194/q196/q197 siblings."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.join_view import CdcLeftJoinView

    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_totalprice").alias("total_price"),
    )
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_key"), F.col("c_name").alias("cust_name")
    )
    ok = F.col("order_key")
    ck = F.col("cust_key")
    a0 = o.select(F.lit("c").alias("op"), ok.alias("seq"), *o.columns)
    b0 = c.select(F.lit("c").alias("op"), ck.alias("seq"), *c.columns)
    bumped = F.when(ok % 7 == 0, F.col("total_price") + F.lit(1.0e0)).otherwise(
        F.col("total_price")
    )
    a_u1 = o.filter(ok % 7 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000) + ok).alias("seq"),
        ok,
        ck,
        (F.col("total_price") + F.lit(1.0e0)).alias("total_price"),
    )
    a_u2 = o.filter(ok % 13 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(2_000_000_000) + ok).alias("seq"),
        ok,
        (ck + 1).alias("cust_key"),
        bumped.alias("total_price"),
    )
    a_d = o.filter(ok % 5 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(3_000_000_000) + ok).alias("seq"),
        *o.columns,
    )
    b_u = c.filter(ck % 3 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000) + ck).alias("seq"),
        ck,
        F.concat(F.col("cust_name"), F.lit("*")).alias("cust_name"),
    )
    b_d = c.filter(ck % 11 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(2_000_000_000) + ck).alias("seq"),
        *c.columns,
    )
    base = tempfile.mkdtemp(prefix="cdc_lj_view_")
    try:
        view = CdcLeftJoinView(
            spark, base, key="cust_key", a_pk="order_key", b_pk="cust_key"
        )
        view.merge(a0, b0, 0)
        view.merge(
            a_u1.unionByName(a_u2).unionByName(a_d),
            b_u.unionByName(b_d),
            1,
        )
        out = view.snapshot().select(
            "order_key", "cust_key", "cust_name", "total_price"
        )
        # materialize before the temp state dir is removed
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q197_cdc_minmax_view",
    oracle="""
WITH o_final AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1
                ELSE o_custkey END AS cust_key,
           CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0e0
                     ELSE o_totalprice END AS DECIMAL(18,2)) AS total_price
    FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT cust_key,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(total_price) AS DOUBLE) AS min_spend,
       CAST(max(total_price) AS DOUBLE) AS max_spend
FROM o_final GROUP BY cust_key
""",
)
def q197_cdc_minmax_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-AWARE MIN/MAX-VIEW PARITY — the NON-LINEAR aggregate case
    q196's weighted partials cannot express: deleting the row that held
    a key's minimum has no −1 retraction (the new minimum is whatever
    survives — the support-set problem). streaming/join_view.CdcMinMaxView
    recomputes ONLY the touched keys from their post-batch state per
    merge; the view store keeps latest-per-key rows so an emptied key's
    n = 0 row supersedes its stale aggregate. Driven by the SAME
    changelog script as q196 (creates, price updates % 7, key-moving
    updates % 13, deletes % 5 — the deletes are what force new minima);
    oracle is the plain GROUP BY over the CDC-upserted final table.

    Scale: per-batch aggregate work is O(touched keys' state) against
    the latest-per-pk snapshot — never a full re-aggregate; torn-write
    healing, emptied-key supersession, and compaction are pytest-pinned
    alongside the q194/q196 siblings."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.join_view import CdcMinMaxView

    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("total_price"),
    )
    ok = F.col("order_key")
    ck = F.col("cust_key")
    raw_price = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("p_raw"),
    )
    a0 = o.select(F.lit("c").alias("op"), ok.alias("seq"), *o.columns)
    bump = lambda col: (col + F.lit(1.0e0)).cast("decimal(18,2)")
    with_raw = o.join(raw_price, "order_key")
    a_u1 = with_raw.filter(ok % 7 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000) + ok).alias("seq"),
        ok,
        ck,
        bump(F.col("p_raw")).alias("total_price"),
    )
    bumped = F.when(ok % 7 == 0, bump(F.col("p_raw"))).otherwise(
        F.col("total_price")
    )
    a_u2 = with_raw.filter(ok % 13 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(2_000_000_000) + ok).alias("seq"),
        ok,
        (ck + 1).alias("cust_key"),
        bumped.alias("total_price"),
    )
    a_d = o.filter(ok % 5 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(3_000_000_000) + ok).alias("seq"),
        *o.columns,
    )
    base = tempfile.mkdtemp(prefix="cdc_minmax_view_")
    try:
        view = CdcMinMaxView(
            spark, base, key="cust_key", pk="order_key", val="total_price"
        )
        view.merge(a0, 0)
        view.merge(a_u1.unionByName(a_u2).unionByName(a_d), 1)
        out = view.snapshot().select(
            "cust_key",
            F.col("n").alias("n_orders"),
            F.col("vmin").cast("double").alias("min_spend"),
            F.col("vmax").cast("double").alias("max_spend"),
        )
        # materialize before the temp state dir is removed
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q194_cdc_join_view",
    oracle="""
WITH o_final AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1
                ELSE o_custkey END AS cust_key,
           CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0e0
                ELSE o_totalprice END AS total_price
    FROM orders WHERE o_orderkey % 5 <> 0
),
c_final AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 3 = 0 THEN c_name || '*'
                ELSE c_name END AS cust_name
    FROM customer WHERE c_custkey % 11 <> 0
)
SELECT o.o_orderkey AS order_key, o.cust_key AS cust_key,
       c.cust_name AS cust_name, o.total_price AS total_price
FROM o_final o JOIN c_final c ON c.c_custkey = o.cust_key
""",
)
def q194_cdc_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-AWARE JOIN-VIEW PARITY (r7 judge task #4 — the reference IS a
    Debezium CDC pipeline, cmd/main.go:233-240 / connector.json:4-17;
    q193 covered only its insert-only shadow): maintain the materialized
    view orders ⋈ customer through streaming/join_view.CdcJoinView under
    a changelog that exercises every op on BOTH sides — batch 0 creates
    both full tables; batch 1 delivers price updates (order_key % 7),
    JOIN-KEY-CHANGING updates (order_key % 13 reassigns cust_key + 1 —
    the retract-old-match / assert-new-match case), order deletes
    (% 5), customer renames (% 3), and customer deletes (% 11), with
    delete-wins seq ordering where rules overlap. The oracle is the plain
    batch join over the CDC-upserted FINAL tables: "delta-maintained
    view == recompute over the net effect of the changelog" is the
    driver-checked claim, retractions included.

    Scale: per-trigger work is O(|Δ| × matched state) — a delete or
    update costs ONE −1-weighted row through the same equi joins as an
    insert, never a view rescan; the weighted-delta algebra is the
    DBSP/differential-dataflow bilinear rule, the published shape for
    incremental view maintenance. Torn-write replay healing and
    compaction (changelog → latest-per-pk with d tombstones, view → net
    weights) are pytest-pinned in tests/test_streaming.py."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.join_view import CdcJoinView

    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_totalprice").alias("total_price"),
    )
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_key"), F.col("c_name").alias("cust_name")
    )
    ok = F.col("order_key")
    ck = F.col("cust_key")
    # batch 0: create everything (seq = pk — globally monotone per side)
    a0 = o.select(F.lit("c").alias("op"), ok.alias("seq"), *o.columns)
    b0 = c.select(F.lit("c").alias("op"), ck.alias("seq"), *c.columns)
    # batch 1, A side: price updates, then key-changing updates (whose
    # image carries the already-applied price bump), then deletes — seq
    # tiers encode the delete-wins ordering the oracle's CASEs assume.
    bumped = F.when(ok % 7 == 0, F.col("total_price") + F.lit(1.0e0)).otherwise(
        F.col("total_price")
    )
    a_u1 = o.filter(ok % 7 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000) + ok).alias("seq"),
        ok,
        ck,
        (F.col("total_price") + F.lit(1.0e0)).alias("total_price"),
    )
    a_u2 = o.filter(ok % 13 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(2_000_000_000) + ok).alias("seq"),
        ok,
        (ck + 1).alias("cust_key"),
        bumped.alias("total_price"),
    )
    a_d = o.filter(ok % 5 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(3_000_000_000) + ok).alias("seq"),
        *o.columns,
    )
    b_u = c.filter(ck % 3 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000) + ck).alias("seq"),
        ck,
        F.concat(F.col("cust_name"), F.lit("*")).alias("cust_name"),
    )
    b_d = c.filter(ck % 11 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(2_000_000_000) + ck).alias("seq"),
        *c.columns,
    )
    base = tempfile.mkdtemp(prefix="cdc_join_view_")
    try:
        view = CdcJoinView(
            spark, base, key="cust_key", a_pk="order_key", b_pk="cust_key"
        )
        view.merge(a0, b0, 0)
        view.merge(
            a_u1.unionByName(a_u2).unionByName(a_d),
            b_u.unionByName(b_d),
            1,
        )
        out = view.snapshot().select(
            "order_key", "cust_key", "cust_name", "total_price"
        )
        # materialize before the temp state dir is removed
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)



@query(
    "q199_cdc_distinct_view",
    oracle="""
WITH o_final AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1
                ELSE o_custkey END AS cust_key,
           CASE WHEN o_orderkey % 7 = 0 THEN '0-REVISED'
                ELSE o_orderpriority END AS prio
    FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT cust_key,
       CAST(count(DISTINCT prio) AS BIGINT) AS n_prios
FROM o_final GROUP BY cust_key
""",
)
def q199_cdc_distinct_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-AWARE COUNT(DISTINCT)-VIEW PARITY — the TWO-LEVEL IVM case
    (neither q196's linear partials nor q197's touched-key recompute):
    distinct count is linear only in the SUPPORT of the (key, val)
    projection, so streaming/join_view.CdcDistinctCountView stacks a
    per-(customer, priority) alive-count store under the view and
    derives the view delta from 0↔positive transitions of that support
    — a delete only decrements the count when it kills a priority's
    LAST holder. Changelog script: creates, priority rewrites (% 7 →
    '0-REVISED', introducing a value the initial state never held),
    key-moving updates (% 13), deletes (% 5). Oracle is the plain
    COUNT(DISTINCT) over the CDC-upserted final table.

    Scale: level 1 is one |Δ|-keyed aggregate; level 2 touches only the
    batch's own (key, val) pairs via an equi semi join against the
    support store — history is never re-scanned (the 100 TB
    alternative re-runs a global COUNT DISTINCT per trigger).
    Transition algebra, torn-write healing, and compaction are
    pytest-pinned alongside the q194-q198 siblings."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.join_view import CdcDistinctCountView

    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderpriority").alias("prio"),
    )
    ok = F.col("order_key")
    ck = F.col("cust_key")
    a0 = o.select(F.lit("c").alias("op"), ok.alias("seq"), *o.columns)
    a_u1 = o.filter(ok % 7 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000) + ok).alias("seq"),
        ok,
        ck,
        F.lit("0-REVISED").alias("prio"),
    )
    revised = F.when(ok % 7 == 0, F.lit("0-REVISED")).otherwise(F.col("prio"))
    a_u2 = o.filter(ok % 13 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(2_000_000_000) + ok).alias("seq"),
        ok,
        (ck + 1).alias("cust_key"),
        revised.alias("prio"),
    )
    a_d = o.filter(ok % 5 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(3_000_000_000) + ok).alias("seq"),
        *o.columns,
    )
    base = tempfile.mkdtemp(prefix="cdc_distinct_view_")
    try:
        view = CdcDistinctCountView(
            spark, base, key="cust_key", pk="order_key", val="prio"
        )
        view.merge(a0, 0)
        view.merge(a_u1.unionByName(a_u2).unionByName(a_d), 1)
        out = view.snapshot().select(
            "cust_key", F.col("n_distinct").alias("n_prios")
        )
        # materialize before the temp state dir is removed
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q200_cdc_topk_view",
    oracle="""
WITH o_final AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1
                ELSE o_custkey END AS cust_key,
           CASE WHEN o_orderkey % 7 = 0 THEN '0-REVISED'
                ELSE o_orderpriority END AS prio
    FROM orders WHERE o_orderkey % 5 <> 0
),
counts AS (
    SELECT cust_key, prio, CAST(count(*) AS BIGINT) AS n
    FROM o_final GROUP BY cust_key, prio
),
ranked AS (
    SELECT cust_key, prio, n,
           row_number() OVER (PARTITION BY cust_key
                              ORDER BY n DESC, prio ASC) AS rn
    FROM counts
)
SELECT cust_key, prio, n FROM ranked WHERE rn <= 2
""",
)
def q200_cdc_topk_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-AWARE TOP-K-PER-GROUP VIEW PARITY — the hybrid IVM case
    composing both maintenance strategies: each customer's 2 most
    frequent order priorities (count desc, priority asc on ties),
    maintained by streaming/join_view.CdcTopKView — the per-(customer,
    priority) support counts update LINEARLY (q196's algebra one level
    down) while the ranking, an order statistic, recomputes per merge
    ONLY for touched customers from their post-batch support (q197's
    support-set algebra one level up). Same changelog script as q199;
    the deletes and priority rewrites are what reshuffle ranks mid-
    stream. Oracle is the plain count/rank/filter over the CDC-upserted
    final table.

    Scale: per-batch work is one |Δ|-keyed aggregate plus a top-k
    window over ONLY the touched keys' support rows (equi semi join —
    never a global re-rank); key-versioned supersession, torn-write
    healing, and compaction are pytest-pinned alongside the siblings."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.join_view import CdcTopKView

    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderpriority").alias("prio"),
    )
    ok = F.col("order_key")
    ck = F.col("cust_key")
    a0 = o.select(F.lit("c").alias("op"), ok.alias("seq"), *o.columns)
    a_u1 = o.filter(ok % 7 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000) + ok).alias("seq"),
        ok,
        ck,
        F.lit("0-REVISED").alias("prio"),
    )
    revised = F.when(ok % 7 == 0, F.lit("0-REVISED")).otherwise(F.col("prio"))
    a_u2 = o.filter(ok % 13 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(2_000_000_000) + ok).alias("seq"),
        ok,
        (ck + 1).alias("cust_key"),
        revised.alias("prio"),
    )
    a_d = o.filter(ok % 5 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(3_000_000_000) + ok).alias("seq"),
        *o.columns,
    )
    base = tempfile.mkdtemp(prefix="cdc_topk_view_")
    try:
        view = CdcTopKView(
            spark, base, key="cust_key", pk="order_key", val="prio", k=2
        )
        view.merge(a0, 0)
        view.merge(a_u1.unionByName(a_u2).unionByName(a_d), 1)
        out = view.snapshot().select("cust_key", "prio", "n")
        # materialize before the temp state dir is removed
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q201_cdc_view_suite",
    oracle="""
WITH o_final AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1
                ELSE o_custkey END AS cust_key,
           CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0e0
                     ELSE o_totalprice END AS DECIMAL(18,2)) AS total_price,
           CASE WHEN o_orderkey % 7 = 0 THEN '0-REVISED'
                ELSE o_orderpriority END AS prio
    FROM orders WHERE o_orderkey % 5 <> 0
),
c_final AS (
    SELECT c_custkey FROM customer WHERE c_custkey % 11 <> 0
),
base AS (
    SELECT cust_key,
           CAST(count(*) AS BIGINT)         AS n_orders,
           CAST(sum(total_price) AS DOUBLE) AS total_spend,
           CAST(min(total_price) AS DOUBLE) AS min_spend,
           CAST(max(total_price) AS DOUBLE) AS max_spend,
           CAST(count(DISTINCT prio) AS BIGINT) AS n_prios
    FROM o_final GROUP BY cust_key
),
m AS (
    SELECT o.cust_key, CAST(count(*) AS BIGINT) AS n_matched
    FROM o_final o JOIN c_final c ON c.c_custkey = o.cust_key
    GROUP BY o.cust_key
)
SELECT b.cust_key, b.n_orders, b.total_spend, b.min_spend, b.max_spend,
       b.n_prios, COALESCE(m.n_matched, CAST(0 AS BIGINT)) AS n_matched
FROM base b LEFT JOIN m ON m.cust_key = b.cust_key
""",
)
def q201_cdc_view_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSED CDC-VIEW-SUITE PARITY (the q189 pattern applied to IVM):
    ONE handler (streaming/join_view.CdcViewSuite) drives all six CDC
    views — inner join, left join, count/sum, min/max, distinct-count,
    top-k — off a single delivered changelog pair per batch, with the
    changelog and support stores SHARED across the family (landed once,
    not per view — at 100 TB the naive composition multiplies changelog
    storage and write volume by the view count). The dashboard snapshot
    joins the per-key views into one row per customer: order count,
    DECIMAL-exact spend, min/max spend, distinct priorities, and the
    inner-join match count (0 where the customer record is deleted).
    Oracle is ONE batch GROUP BY + join over the CDC-upserted final
    tables. Same changelog script as the q194-q200 siblings on both
    sides.

    Scale: per batch each view's delta runs against the shared
    pre-batch state via key-equi joins (the per-view cost shapes of
    q194-q200, unchanged); torn nine-landing crashes heal on replay
    exactly as for the single views (pytest-pinned)."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.join_view import CdcViewSuite

    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("total_price"),
        F.col("o_orderpriority").alias("prio"),
    )
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("cust_key"))
    ok = F.col("order_key")
    ck = F.col("cust_key")
    raw_price = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("p_raw"),
    )
    a0 = o.select(F.lit("c").alias("op"), ok.alias("seq"), *o.columns)
    b0 = c.select(F.lit("c").alias("op"), ck.alias("seq"), *c.columns)
    bump = lambda col: (col + F.lit(1.0e0)).cast("decimal(18,2)")
    with_raw = o.join(raw_price, "order_key")
    a_u1 = with_raw.filter(ok % 7 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000) + ok).alias("seq"),
        ok,
        ck,
        bump(F.col("p_raw")).alias("total_price"),
        F.lit("0-REVISED").alias("prio"),
    )
    bumped = F.when(ok % 7 == 0, bump(F.col("p_raw"))).otherwise(
        F.col("total_price")
    )
    revised = F.when(ok % 7 == 0, F.lit("0-REVISED")).otherwise(F.col("prio"))
    a_u2 = with_raw.filter(ok % 13 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(2_000_000_000) + ok).alias("seq"),
        ok,
        (ck + 1).alias("cust_key"),
        bumped.alias("total_price"),
        revised.alias("prio"),
    )
    a_d = o.filter(ok % 5 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(3_000_000_000) + ok).alias("seq"),
        *o.columns,
    )
    b_d = c.filter(ck % 11 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(2_000_000_000) + ck).alias("seq"),
        *c.columns,
    )
    base = tempfile.mkdtemp(prefix="cdc_suite_")
    try:
        suite = CdcViewSuite(
            spark,
            base,
            key="cust_key",
            a_pk="order_key",
            b_pk="cust_key",
            num_val="total_price",
            cat_val="prio",
        )
        suite.merge(a0, b0, 0)
        suite.merge(a_u1.unionByName(a_u2).unionByName(a_d), b_d, 1)
        out = suite.snapshot_dashboard().select(
            "cust_key",
            F.col("n").alias("n_orders"),
            F.col("total").cast("double").alias("total_spend"),
            F.col("vmin").cast("double").alias("min_spend"),
            F.col("vmax").cast("double").alias("max_spend"),
            F.col("n_distinct").alias("n_prios"),
            "n_matched",
        )
        # materialize before the temp state dir is removed
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q202_quantile_sketch",
    oracle="""
WITH lens AS (
    SELECT source, CAST(length(text) AS BIGINT) AS len, doc_id FROM documents
),
ranked AS (
    SELECT source, len,
           row_number() OVER (PARTITION BY source ORDER BY len, doc_id) AS rn,
           count(*) OVER (PARTITION BY source) AS n
    FROM lens
)
SELECT source,
       CAST(max(n) AS BIGINT) AS n_docs,
       CAST(max(CASE WHEN rn = CAST(ceil(0.5e0 * n) AS BIGINT) THEN len END) AS BIGINT) AS p50_len,
       CAST(max(CASE WHEN rn = CAST(ceil(0.9e0 * n) AS BIGINT) THEN len END) AS BIGINT) AS p90_len,
       TRUE AS p50_ok,
       TRUE AS p90_ok
FROM ranked GROUP BY source
""",
)
def q202_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING QUANTILE-SKETCH PARITY — completes the mergeable-sketch
    triad (CMS frequency q113, HLL cardinality q131, quantiles HERE):
    maintain per-source document-length summaries through
    streaming/quantile_index.IncrementalQuantileSketch over a 2-slice
    arrival, then ship-gate the merged sketch's p50/p90 estimates
    against the exact order statistics, the q131/q26 contract: the
    driver-checked output is the EXACT per-source rank statistics plus
    in-query booleans the sketch estimate must satisfy (tie-aware rank
    interval of the estimate overlaps target ± 3·n/C ranks, C = 64
    strata). The exact rank definition (row_number ordered by
    (len, doc_id), rank = ceil(q·n) in DOUBLE arithmetic) is spelled
    identically on both engines.

    Scale: the sketch is C rows per key however many rows stream in —
    per batch one window + one aggregate per key, DECIMAL-exact and
    partition-order-proof; merging summaries is the same compression
    over C·batches rows, never the raw values. The exact-side scan here
    is the gate's own verification cost, not the sketch's."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.quantile_index import (
        N_STRATA,
        IncrementalQuantileSketch,
    )

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.length("text").cast("bigint").alias("len")
    )
    base = tempfile.mkdtemp(prefix="quantile_sketch_")
    try:
        idx = IncrementalQuantileSketch(spark, base)
        idx.merge(docs.filter(F.col("doc_id") % 2 == 0), "source", "len", 0)
        idx.merge(docs.filter(F.col("doc_id") % 2 == 1), "source", "len", 1)
        est = (
            idx.quantiles([0.5, 0.9])
            .groupBy(F.col("key").alias("source"))
            .agg(
                F.max(F.when(F.col("q") == 0.5, F.col("est"))).alias("e50"),
                F.max(F.when(F.col("q") == 0.9, F.col("est"))).alias("e90"),
            )
            .localCheckpoint()  # materialize before the state dir is removed
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)

    wql = Window.partitionBy("source").orderBy("len", "doc_id")
    wn = Window.partitionBy("source")
    ranked = docs.withColumn("rn", F.row_number().over(wql)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    lt = lambda e: F.sum(F.when(F.col("len") < e, 1).otherwise(0)).cast("bigint")
    le = lambda e: F.sum(F.when(F.col("len") <= e, 1).otherwise(0)).cast("bigint")
    per_src = (
        ranked.join(F.broadcast(est), "source")
        .groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.lit(0.5) * F.col("n")), F.col("len")
                )
            )
            .cast("bigint")
            .alias("p50_len"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.lit(0.9) * F.col("n")), F.col("len")
                )
            )
            .cast("bigint")
            .alias("p90_len"),
            lt(F.col("e50")).alias("lt50"),
            le(F.col("e50")).alias("le50"),
            lt(F.col("e90")).alias("lt90"),
            le(F.col("e90")).alias("le90"),
        )
    )
    tol = F.ceil(F.lit(3.0) * F.col("n_docs") / F.lit(int(N_STRATA)))
    t50 = F.ceil(F.lit(0.5) * F.col("n_docs"))
    t90 = F.ceil(F.lit(0.9) * F.col("n_docs"))
    return per_src.select(
        "source",
        "n_docs",
        "p50_len",
        "p90_len",
        ((F.col("lt50") <= t50 + tol) & (F.col("le50") >= t50 - tol)).alias("p50_ok"),
        ((F.col("lt90") <= t90 + tol) & (F.col("le90") >= t90 - tol)).alias("p90_ok"),
    )


@query(
    "q203_cdc_window_rollup",
    oracle="""
WITH e_final AS (
    SELECT event_id, event_type,
           CASE WHEN event_id % 13 = 0 THEN ts + INTERVAL 1 HOUR
                ELSE ts END AS ts,
           CAST(CASE WHEN event_id % 7 = 0 THEN value + 1.0e0
                     ELSE value END AS DECIMAL(18,2)) AS value
    FROM events WHERE event_id % 5 <> 0
)
SELECT event_type,
       date_trunc('hour', ts) AS hour_ts,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(value) AS DOUBLE) AS total_value
FROM e_final GROUP BY event_type, date_trunc('hour', ts)
""",
)
def q203_cdc_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATE-CORRECTION WINDOWED ROLLUP — the q196 algebra applied to TIME
    WINDOWS: the maintained group key is (event_type, hour bucket), so a
    late correction that shifts an event's timestamp across an hour
    boundary (% 13 adds an hour) is exactly the key-moving update — one
    −1 partial on the old window, one +1 on the new, in the same merge —
    the case naive "append-only" incremental rollups silently get wrong
    when upstream data is revised. Value corrections (% 7) and
    retractions (% 5) reach back into ARBITRARILY OLD windows with
    O(|Δ|) work; no window is ever re-scanned. Composite key = the
    (type, hour) pair serialized into one column — query-level
    composition over streaming/join_view.CdcAggregateView, zero new
    maintenance code. Oracle is the plain GROUP BY over the upserted
    final events.

    Scale: identical to q196 — per batch one weighted-image projection
    and one |Δ|-keyed partial aggregate; DECIMAL values make
    retract-then-assert residue-free. The events table's hour buckets
    (~720/month × types) keep the view store tiny regardless of event
    volume."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.join_view import CdcAggregateView

    e = t(spark, sf_dir, "events").select("event_id", "event_type", "ts", "value")
    eid = F.col("event_id")
    hour_key = lambda ts_col: F.concat(
        F.col("event_type"),
        F.lit("|"),
        F.date_format(F.date_trunc("hour", ts_col), "yyyy-MM-dd HH:mm:ss"),
    )
    vdec = F.col("value").cast("decimal(18,2)")
    bump = (F.col("value") + F.lit(1.0e0)).cast("decimal(18,2)")
    a0 = e.select(
        F.lit("c").alias("op"),
        eid.alias("seq"),
        eid.alias("event_id"),
        hour_key(F.col("ts")).alias("k"),
        vdec.alias("v"),
    )
    a_u1 = e.filter(eid % 7 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000) + eid).alias("seq"),
        eid.alias("event_id"),
        hour_key(F.col("ts")).alias("k"),
        bump.alias("v"),
    )
    bumped = F.when(eid % 7 == 0, bump).otherwise(vdec)
    a_u2 = e.filter(eid % 13 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(2_000_000_000) + eid).alias("seq"),
        eid.alias("event_id"),
        hour_key(F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("k"),
        bumped.alias("v"),
    )
    a_d = e.filter(eid % 5 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(3_000_000_000) + eid).alias("seq"),
        eid.alias("event_id"),
        hour_key(F.col("ts")).alias("k"),
        vdec.alias("v"),
    )
    base = tempfile.mkdtemp(prefix="cdc_window_rollup_")
    try:
        view = CdcAggregateView(spark, base, key="k", pk="event_id", val="v")
        view.merge(a0, 0)
        view.merge(a_u1.unionByName(a_u2).unionByName(a_d), 1)
        out = view.snapshot().select(
            F.substring_index("k", "|", 1).alias("event_type"),
            F.to_timestamp(F.substring_index("k", "|", -1)).alias("hour_ts"),
            F.col("n").alias("n_events"),
            F.col("total").cast("double").alias("total_value"),
        )
        # materialize before the temp state dir is removed
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q208_cdc_view_time_travel",
    oracle="""
WITH o_prefix AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1
                ELSE o_custkey END AS cust_key,
           CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0e0
                     ELSE o_totalprice END AS DECIMAL(18,2)) AS total_price
    FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT cust_key,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(total_price) AS DOUBLE) AS total_spend
FROM o_prefix GROUP BY cust_key
""",
)
def q208_cdc_view_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TRAVEL READ of a CDC-maintained view (the Iceberg/Delta
    AS-OF-snapshot surface, for free): the per-batch view-delta
    partitions a CdcAggregateView lands ARE its version history, so
    ``snapshot_at(t)`` — the fold of deltas with batch_id ≤ t, a pure
    partition filter — reconstructs the view as of any batch inside the
    compaction horizon with ZERO extra state or bookkeeping. The script
    runs THREE batches (q196's creates; its update/delete wave; then a
    second wave of price bumps (% 2) and deletes (% 3)) and reads
    ``snapshot_at(1)``: the oracle is the GROUP BY over the changelog
    PREFIX ≤ 1 upserted — the result must be blind to everything batch 2
    changed, which is the whole claim. Below the horizon the read is
    REFUSED loudly (compaction folds history exactly like snapshot
    expiry; pytest-pinned), never silently answered from folded state.

    Scale: the travel read costs the same as a current snapshot (one
    fold over ≤ t partitions, batch-id partition-pruned at the scan);
    retention is the compaction cadence knob, trading version reach for
    snapshot-read fan-in — the same trade the table formats expose.

    Reference parity note: the reference's consume loop re-reads its
    JDBC table 'as of now' only (cmd/main.go:212-227); this row gives
    its CDC domain the audit/debug read every revision-bearing pipeline
    eventually needs ("what did the dashboard say before the restatement
    landed?")."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.join_view import CdcAggregateView

    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("total_price"),
    )
    ok = F.col("order_key")
    ck = F.col("cust_key")
    raw_price = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("p_raw"),
    )
    a0 = o.select(F.lit("c").alias("op"), ok.alias("seq"), *o.columns)
    bump = lambda col: (col + F.lit(1.0e0)).cast("decimal(18,2)")
    with_raw = o.join(raw_price, "order_key")
    a_u1 = with_raw.filter(ok % 7 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000) + ok).alias("seq"),
        ok,
        ck,
        bump(F.col("p_raw")).alias("total_price"),
    )
    bumped = F.when(ok % 7 == 0, bump(F.col("p_raw"))).otherwise(
        F.col("total_price")
    )
    a_u2 = with_raw.filter(ok % 13 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(2_000_000_000) + ok).alias("seq"),
        ok,
        (ck + 1).alias("cust_key"),
        bumped.alias("total_price"),
    )
    a_d = o.filter(ok % 5 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(3_000_000_000) + ok).alias("seq"),
        *o.columns,
    )
    # batch 2: a second revision wave the travel read must NOT see —
    # price bumps on even orders, deletes on % 3 (both against whatever
    # image batch 1 left; the exact images are irrelevant to the claim,
    # only that they CHANGE the current view).
    b2_u = with_raw.filter(ok % 2 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(4_000_000_000) + ok).alias("seq"),
        ok,
        ck,
        bump(bump(F.col("p_raw"))).alias("total_price"),
    )
    b2_d = o.filter(ok % 3 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(5_000_000_000) + ok).alias("seq"),
        *o.columns,
    )
    base = tempfile.mkdtemp(prefix="cdc_time_travel_")
    try:
        view = CdcAggregateView(
            spark, base, key="cust_key", pk="order_key", val="total_price"
        )
        view.merge(a0, 0)
        view.merge(a_u1.unionByName(a_u2).unionByName(a_d), 1)
        view.merge(b2_u.unionByName(b2_d), 2)
        out = view.snapshot_at(1).select(
            "cust_key",
            F.col("n").alias("n_orders"),
            F.col("total").cast("double").alias("total_spend"),
        )
        # materialize before the temp state dir is removed
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q209_cdc_join_agg_cascade",
    oracle="""
WITH o_final AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1
                ELSE o_custkey END AS cust_key,
           CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0e0
                     ELSE o_totalprice END AS DECIMAL(18,2)) AS total_price
    FROM orders WHERE o_orderkey % 5 <> 0
),
c_final AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 3 = 0 THEN c_name || '*'
                ELSE c_name END AS cust_name
    FROM customer WHERE c_custkey % 11 <> 0
)
SELECT c.cust_name AS cust_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(o.total_price) AS DOUBLE) AS total_spend
FROM o_final o JOIN c_final c ON c.c_custkey = o.cust_key
GROUP BY c.cust_name
""",
)
def q209_cdc_join_agg_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASCADED IVM PARITY — an aggregate maintained OVER a maintained
    join (streaming/join_view.CdcJoinAggView): V = revenue per CUSTOMER
    NAME from orders ⋈ customer with BOTH sides CDC changelogs — the
    composition property that makes the Z-set algebra worth having
    (DBSP circuits compose; Materialize stacks views on views): the
    join's ±w-weighted delta stream is itself a changelog, the
    downstream aggregate consumes it with q196's linear rule, and the
    JOIN IS NEVER MATERIALIZED — no view store holds the 10⁸-row join
    snapshot a dashboard only ever aggregates. The script composes
    q196's order wave (price updates % 7, cust_key moves % 13, deletes
    % 5) with q194's customer wave (renames % 3 — a rename MOVES every
    joined order's revenue between group keys in one merge; deletes
    % 11 — a customer delete retracts all its orders' revenue), and the
    group key lives on the OPPOSITE side from the measure, so every
    delta must flow THROUGH the join to reach its group. Oracle is ONE
    batch join + GROUP BY over the CDC-upserted final tables; DECIMAL
    values make retract-then-assert residue-free (maintained ==
    recomputed exactly).

    Scale: per merge the same O(touched-shards) arrangement reads as
    q194 plus one |ΔM|-keyed partial aggregate; storage is the two
    arrangements + the small per-group view — the intermediate join
    snapshot (the big object) is pure dataflow."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.join_view import CdcJoinAggView

    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("total_price"),
    )
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_key"), F.col("c_name").alias("cust_name")
    )
    ok = F.col("order_key")
    ck = F.col("cust_key")
    raw_price = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("p_raw"),
    )
    a0 = o.select(F.lit("c").alias("op"), ok.alias("seq"), *o.columns)
    b0 = c.select(F.lit("c").alias("op"), ck.alias("seq"), *c.columns)
    bump = lambda col: (col + F.lit(1.0e0)).cast("decimal(18,2)")
    with_raw = o.join(raw_price, "order_key")
    a_u1 = with_raw.filter(ok % 7 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000) + ok).alias("seq"),
        ok,
        ck,
        bump(F.col("p_raw")).alias("total_price"),
    )
    bumped = F.when(ok % 7 == 0, bump(F.col("p_raw"))).otherwise(
        F.col("total_price")
    )
    a_u2 = with_raw.filter(ok % 13 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(2_000_000_000) + ok).alias("seq"),
        ok,
        (ck + 1).alias("cust_key"),
        bumped.alias("total_price"),
    )
    a_d = o.filter(ok % 5 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(3_000_000_000) + ok).alias("seq"),
        *o.columns,
    )
    b_u = c.filter(ck % 3 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000) + ck).alias("seq"),
        ck,
        F.concat(F.col("cust_name"), F.lit("*")).alias("cust_name"),
    )
    b_d = c.filter(ck % 11 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(2_000_000_000) + ck).alias("seq"),
        *c.columns,
    )
    base = tempfile.mkdtemp(prefix="cdc_cascade_")
    try:
        view = CdcJoinAggView(
            spark, base, key="cust_key", a_pk="order_key", b_pk="cust_key",
            gkey="cust_name", val="total_price",
        )
        view.merge(a0, b0, 0)
        view.merge(
            a_u1.unionByName(a_u2).unionByName(a_d),
            b_u.unionByName(b_d),
            1,
        )
        out = view.snapshot().select(
            "cust_name",
            F.col("n").alias("n_orders"),
            F.col("total").cast("double").alias("total_spend"),
        )
        # materialize before the temp state dir is removed
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q226_cdc_cascade_topk",
    oracle="""
WITH o_final AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1
                ELSE o_custkey END AS cust_key,
           CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0e0
                     ELSE o_totalprice END AS DECIMAL(18,2)) AS total_price
    FROM orders WHERE o_orderkey % 5 <> 0
),
c_final AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 3 = 0 THEN c_name || '*'
                ELSE c_name END AS cust_name,
           CASE WHEN c_custkey % 17 = 0 THEN 'MACHINERY'
                ELSE c_mktsegment END AS segment
    FROM customer WHERE c_custkey % 11 <> 0
),
agg AS (
    SELECT c.segment, c.cust_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           sum(o.total_price)       AS total_d
    FROM o_final o JOIN c_final c ON c.c_custkey = o.cust_key
    GROUP BY c.segment, c.cust_name
)
SELECT segment, cust_name, n_orders, CAST(total_d AS DOUBLE) AS total_spend
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY segment ORDER BY total_d DESC, cust_name ASC
    ) AS rn FROM agg
)
WHERE rn <= 3
""",
)
def q226_cdc_cascade_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-LAYER CASCADED IVM PARITY — a maintained TOP-K over a
    maintained aggregate over a maintained join
    (streaming/join_view.CdcCascadeTopKView): V = the 3 highest-spend
    CUSTOMER NAMES per MARKET SEGMENT from orders ⋈ customer, BOTH
    sides CDC changelogs, with NEITHER intermediate materialized — the
    join delta flows through q196's linear aggregate rule into q200's
    order-statistic recompute in one merge, the depth-3 DBSP circuit
    (q209 proved depth 2). The script composes q209's order wave (price
    bumps % 7, cust_key moves % 13, deletes % 5) with a customer wave
    that exercises every rank transition: renames % 3 move a customer's
    whole revenue between GROUP keys through the join, segment moves
    % 17 move it between RANK PARTITIONS (retract from one segment's
    ranking, assert into another's, one merge), deletes % 11 retract it
    entirely (possibly promoting a new #3). Oracle is ONE batch join +
    GROUP BY + row_number ≤ 3 over the CDC-upserted final tables;
    DECIMAL sums make the ranking key exact on both engines, name-asc
    tie-break makes it total.

    Scale: per merge — O(|Δ| × matched state) arrangement reads for the
    join terms, one |ΔM|-keyed partial aggregate, then a rerank that
    reads only the TOUCHED segments' shards of the per-group partial
    store (per-GROUP rows, never source rows) and windows only those
    segments' groups. Stored state: changelogs + arrangements +
    per-group partials + the ≤ k·|segments| view — the join snapshot
    and the full ranking are pure dataflow.

    Reference parity: extends the reference's Debezium-changelog upsert
    domain (cmd/main.go:203-240, connector.json:4-17) to stacked
    maintained views, the composition Materialize/DBSP sell."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.join_view import CdcCascadeTopKView

    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("total_price"),
    )
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("cust_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    ok = F.col("order_key")
    ck = F.col("cust_key")
    raw_price = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("p_raw"),
    )
    a0 = o.select(F.lit("c").alias("op"), ok.alias("seq"), *o.columns)
    b0 = c.select(F.lit("c").alias("op"), ck.alias("seq"), *c.columns)
    bump = lambda col: (col + F.lit(1.0e0)).cast("decimal(18,2)")
    with_raw = o.join(raw_price, "order_key")
    a_u1 = with_raw.filter(ok % 7 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000) + ok).alias("seq"),
        ok,
        ck,
        bump(F.col("p_raw")).alias("total_price"),
    )
    bumped = F.when(ok % 7 == 0, bump(F.col("p_raw"))).otherwise(
        F.col("total_price")
    )
    a_u2 = with_raw.filter(ok % 13 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(2_000_000_000) + ok).alias("seq"),
        ok,
        (ck + 1).alias("cust_key"),
        bumped.alias("total_price"),
    )
    a_d = o.filter(ok % 5 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(3_000_000_000) + ok).alias("seq"),
        *o.columns,
    )
    # customer wave: the rename and the segment move COMPOSE on keys
    # divisible by both 3 and 17 (the upsert's image carries both), so
    # the update image applies both transforms, matching the oracle's
    # independent CASEs.
    b_u = c.filter((ck % 3 == 0) | (ck % 17 == 0)).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000) + ck).alias("seq"),
        ck,
        F.when(ck % 3 == 0, F.concat(F.col("cust_name"), F.lit("*")))
        .otherwise(F.col("cust_name"))
        .alias("cust_name"),
        F.when(ck % 17 == 0, F.lit("MACHINERY"))
        .otherwise(F.col("segment"))
        .alias("segment"),
    )
    b_d = c.filter(ck % 11 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(2_000_000_000) + ck).alias("seq"),
        *c.columns,
    )
    base = tempfile.mkdtemp(prefix="cdc_cascade_topk_")
    try:
        view = CdcCascadeTopKView(
            spark, base, key="cust_key", a_pk="order_key", b_pk="cust_key",
            pkey="segment", gkey="cust_name", val="total_price", k=3,
        )
        view.merge(a0, b0, 0)
        view.merge(
            a_u1.unionByName(a_u2).unionByName(a_d),
            b_u.unionByName(b_d),
            1,
        )
        out = view.snapshot().select(
            "segment",
            "cust_name",
            F.col("n").alias("n_orders"),
            F.col("total").cast("double").alias("total_spend"),
        )
        # materialize before the temp state dir is removed
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q213_cdc_hll_view",
    oracle="""
WITH e_final AS (
    SELECT event_id,
           CASE WHEN event_id % 13 = 0 THEN 'click' ELSE event_type END AS event_type,
           CASE WHEN event_id % 7 = 0 THEN user_id + 1 ELSE user_id END AS user_id
    FROM events WHERE event_id % 5 <> 0
)
SELECT event_type,
       CAST(count(*) AS BIGINT)                AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE                                    AS within_5pct
FROM e_final GROUP BY event_type
""",
)
def q213_cdc_hll_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-MAINTAINED HLL DISTINCT-COUNT — the APPROX sibling of q199's
    exact distinct view, completing the sketches-under-churn set (CMS is
    linear → signed partials, q207; quantiles recompute, q210; HLL is
    here): HLL registers are max-merged, so a delete CANNOT be retracted
    from a sketch — the only correct maintenance is the support-set
    recompute, streaming/join_view.CdcGroupedRecomputeView with
    `hll_sketch_agg` over each touched group's post-batch alive rows
    (read partition-pruned from the key-bucketed arrangement). The
    append-only alternative silently counts deleted users forever — the
    drift this row exists to rule out.

    Same composed churn script as q210 (creates; % 7 user-id corrections
    — the distinct SET changes, not just counts; % 13 key-moving type
    corrections; % 5 deletes; % 11 duplicate re-deliveries netting to
    no-op). The estimate is engine-specific, so the driver-checked
    contract is the q131 idiom: the maintained view's exact row count
    per group, the exact distinct over the CDC-upserted final table, and
    an in-query 5% accuracy bound the maintained estimate must satisfy.

    Scale: per-batch sketch work is O(touched groups' state); the stored
    row per group is one fixed-size estimate — at 10⁹ users per type the
    arrangement read prunes to the churned types' shards and the sketch
    never re-scans untouched groups."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.join_view import CdcGroupedRecomputeView

    e = t(spark, sf_dir, "events").select(
        F.col("event_id").alias("eid"),
        F.col("event_type").alias("etype"),
        F.col("user_id").alias("uid"),
    )
    eid = F.col("eid")
    bumped = F.when(eid % 7 == 0, F.col("uid") + 1).otherwise(F.col("uid"))
    a0, a1 = churn_script(
        e,
        "eid",
        u1_cols={"uid": F.col("uid") + 1},
        u2_cols={"etype": F.lit("click"), "uid": bumped},
    )

    def hll_recompute(after: DataFrame) -> DataFrame:
        return after.groupBy("etype").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.hll_sketch_estimate(F.hll_sketch_agg("uid")).alias("est"),
        )

    # exact side from the CDC-upserted final table (the estimate's
    # accuracy referee; the view itself never sees this)
    final_exact = (
        e.filter(eid % 5 != 0)
        .select(
            F.when(eid % 13 == 0, F.lit("click")).otherwise(F.col("etype")).alias(
                "etype"
            ),
            bumped.alias("uid"),
        )
        .groupBy("etype")
        .agg(F.countDistinct("uid").cast("bigint").alias("exact_users"))
    )
    base = tempfile.mkdtemp(prefix="cdc_hll_view_")
    try:
        view = CdcGroupedRecomputeView(
            spark, base, key="etype", pk="eid", recompute=hll_recompute
        )
        view.merge(a0, 0)
        view.merge(a1, 1)
        out = (
            view.snapshot()
            .join(F.broadcast(final_exact), "etype")
            .select(
                F.col("etype").alias("event_type"),
                F.col("n").alias("n_events"),
                "exact_users",
                (
                    F.abs(F.col("est") - F.col("exact_users"))
                    <= 0.05 * F.col("exact_users")
                ).alias("within_5pct"),
            )
        )
        # materialize before the temp state dir is removed
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


_KMV_K = 64
_KMV_SPACE = float(1 << 60)  # h ∈ [0, 2^60): 15 md5 hex digits


def _kmv_hash(c: F.Column) -> F.Column:
    """60-bit md5 hash of a key — the KMV sketch's uniform draw,
    engine-portable (DuckDB computes the identical value)."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")


@query(
    "q215_kmv_bottomk_sketch",
    oracle=f"""
WITH oc AS (SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS y, o_custkey AS c
            FROM orders),
hv AS (SELECT DISTINCT y,
              ('0x' || substr(md5(CAST(c AS VARCHAR)), 1, 15))::BIGINT AS h
       FROM oc),
sk AS (SELECT y, h FROM (
           SELECT y, h, row_number() OVER (PARTITION BY y ORDER BY h) AS rn FROM hv
       ) WHERE rn <= {_KMV_K}),
years AS (SELECT DISTINCT y FROM oc),
pairs AS (SELECT a.y AS ya, b.y AS yb FROM years a JOIN years b ON a.y < b.y),
pud AS (
    SELECT DISTINCT p.ya, p.yb, s.h
    FROM pairs p JOIN sk s ON s.y = p.ya
    UNION
    SELECT DISTINCT p.ya, p.yb, s.h
    FROM pairs p JOIN sk s ON s.y = p.yb
),
uk AS (SELECT ya, yb, h FROM (
           SELECT ya, yb, h,
                  row_number() OVER (PARTITION BY ya, yb ORDER BY h) AS rn
           FROM pud
       ) WHERE rn <= {_KMV_K}),
ustat AS (SELECT ya, yb, CAST(count(*) AS BIGINT) AS k_eff, max(h) AS h_k
          FROM uk GROUP BY ya, yb),
shared AS (
    SELECT u.ya, u.yb, CAST(count(*) AS BIGINT) AS n_shared
    FROM uk u
    JOIN sk sa ON sa.y = u.ya AND sa.h = u.h
    JOIN sk sb ON sb.y = u.yb AND sb.h = u.h
    GROUP BY u.ya, u.yb
),
au AS (
    SELECT p.ya, p.yb, o.c FROM pairs p JOIN oc o ON o.y = p.ya
    UNION
    SELECT p.ya, p.yb, o.c FROM pairs p JOIN oc o ON o.y = p.yb
),
exact_u AS (SELECT ya, yb, CAST(count(DISTINCT c) AS BIGINT) AS exact_union
            FROM au GROUP BY ya, yb),
exact_i AS (
    SELECT a.y AS ya, b.y AS yb, CAST(count(*) AS BIGINT) AS exact_inter
    FROM oc a JOIN oc b ON a.c = b.c AND a.y < b.y
    GROUP BY a.y, b.y
)
SELECT u.ya AS year_a, u.yb AS year_b,
       e.exact_union,
       CASE WHEN u.k_eff < {_KMV_K} THEN CAST(u.k_eff AS DOUBLE)
            ELSE round(({_KMV_K} - 1.0e0) * {_KMV_SPACE!r} / u.h_k, 2)
       END AS est_union,
       coalesce(i.exact_inter, 0) AS exact_inter,
       round((coalesce(s.n_shared, 0) / CAST(u.k_eff AS DOUBLE))
             * (CASE WHEN u.k_eff < {_KMV_K} THEN CAST(u.k_eff AS DOUBLE)
                     ELSE ({_KMV_K} - 1.0e0) * {_KMV_SPACE!r} / u.h_k END),
             2) AS est_inter
FROM ustat u
JOIN exact_u e ON e.ya = u.ya AND e.yb = u.yb
LEFT JOIN exact_i i ON i.ya = u.ya AND i.yb = u.yb
LEFT JOIN shared s ON s.ya = u.ya AND s.yb = u.yb
""",
)
def q215_kmv_bottomk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (BOTTOM-K) SKETCH with SET-OPERATION estimation — the
    mergeable sketch the HLL row cannot replace: HLL unions but never
    intersects; a KMV sketch (the K smallest uniform-hash values of a
    set, Beyer et al. SIGMOD'07) supports union (merge + re-truncate),
    DISTINCT estimation ((K−1)·H / h_K, H = hash space), and JACCARD /
    INTERSECTION estimation (the fraction of the union's bottom-K
    present in BOTH input sketches scales the union estimate) — the
    audience-overlap / cross-corpus-contamination estimator. Computed
    here over per-order-year distinct-customer sets, all 21 year pairs;
    sets smaller than K degrade to exact (the sketch holds the whole
    set), so the same expression is correct at every scale factor.

    The hash is a fixed 60-bit md5 prefix, so the sketch — and therefore
    every estimate — is bit-deterministic and the oracle reproduces it
    EXACTLY (full value parity, not a tolerance bound: the q113/q207 CMS
    standard, stronger than q131's 5%-band HLL contract).

    Scale: per-set state is K·8 bytes whatever the cardinality; building
    sketches is one groupBy(set) top-K (map-side partial: each partition
    keeps its own bottom-K before the shuffle); pair estimation touches
    only sketch rows (≤ 2K per pair), never the base data — the exact
    sides here are the test referee, not part of the operator."""
    o = t(spark, sf_dir, "orders")
    # oc and sk feed MANY downstream frames (pairs, union sketches,
    # shared counts, both exact referees); materialize each ONCE so the
    # base table is scanned once, not per reference — oc is |years x
    # customers| (the distinct projection), sk is K rows per year
    oc = (
        o.select(
            F.year("o_orderdate").cast("int").alias("y"),
            F.col("o_custkey").alias("c"),
        )
        .distinct()
        .localCheckpoint()
    )
    hv = oc.select("y", _kmv_hash(F.col("c")).alias("h")).distinct()
    wy = Window.partitionBy("y").orderBy("h")
    sk = (
        hv.withColumn("rn", F.row_number().over(wy))
        .filter(F.col("rn") <= _KMV_K)
        .select("y", "h")
        .localCheckpoint()
    )
    years = oc.select("y").distinct()
    pairs = years.select(F.col("y").alias("ya")).join(
        years.select(F.col("y").alias("yb")), F.col("ya") < F.col("yb")
    )
    # two equi joins + union, not an OR-join: keeps the meet hash-based
    pud = (
        pairs.join(sk, F.col("y") == F.col("ya")).select("ya", "yb", "h")
        .union(pairs.join(sk, F.col("y") == F.col("yb")).select("ya", "yb", "h"))
        .distinct()
    )
    wp = Window.partitionBy("ya", "yb").orderBy("h")
    uk = (
        pud.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= _KMV_K)
        .select("ya", "yb", "h")
    )
    ustat = uk.groupBy("ya", "yb").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_eff"), F.max("h").alias("h_k")
    )
    sa = sk.select(F.col("y").alias("ya"), "h")
    sb = sk.select(F.col("y").alias("yb"), "h")
    shared = (
        uk.join(sa, ["ya", "h"])
        .join(sb, ["yb", "h"])
        .groupBy("ya", "yb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    au = (
        pairs.join(oc, F.col("y") == F.col("ya")).select("ya", "yb", "c")
        .union(pairs.join(oc, F.col("y") == F.col("yb")).select("ya", "yb", "c"))
    )
    exact_u = au.groupBy("ya", "yb").agg(
        F.countDistinct("c").cast("bigint").alias("exact_union")
    )
    oa = oc.select(F.col("y").alias("ya"), "c")
    ob = oc.select(F.col("y").alias("yb"), "c")
    exact_i = (
        oa.join(ob, "c")
        .filter(F.col("ya") < F.col("yb"))
        .groupBy("ya", "yb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
    )
    k = float(_KMV_K)
    est_union = F.when(
        F.col("k_eff") < _KMV_K, F.col("k_eff").cast("double")
    ).otherwise((k - 1.0) * F.lit(_KMV_SPACE) / F.col("h_k"))
    return (
        ustat.join(exact_u, ["ya", "yb"])
        .join(exact_i, ["ya", "yb"], "left")
        .join(shared, ["ya", "yb"], "left")
        .select(
            F.col("ya").alias("year_a"),
            F.col("yb").alias("year_b"),
            "exact_union",
            F.round(est_union, 2).alias("est_union"),
            F.coalesce("exact_inter", F.lit(0).cast("bigint")).alias("exact_inter"),
            F.round(
                (
                    F.coalesce("n_shared", F.lit(0)) / F.col("k_eff").cast("double")
                )
                * est_union,
                2,
            ).alias("est_inter"),
        )
    )


def kmv_distinct_recompute(after: DataFrame) -> DataFrame:
    """Per-key KMV distinct estimate over (y, oid, c) rows: row count +
    the bottom-K estimate of distinct c — the pluggable recompute of the
    q218 maintained view. Sets under K degrade to exact."""
    n = after.groupBy("y").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    hv = after.select("y", _kmv_hash(F.col("c")).alias("h")).distinct()
    wy = Window.partitionBy("y").orderBy("h")
    stat = (
        hv.withColumn("rn", F.row_number().over(wy))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k_eff"), F.max("h").alias("h_k"))
    )
    est = F.when(F.col("k_eff") < _KMV_K, F.col("k_eff").cast("double")).otherwise(
        (float(_KMV_K) - 1.0) * F.lit(_KMV_SPACE) / F.col("h_k")
    )
    return n.join(stat, "y").select(
        "y", "n", F.round(est, 2).alias("est_customers")
    )


@query(
    "q218_cdc_kmv_view",
    oracle=f"""
WITH o_final AS (
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)
             + CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END AS y,
           CASE WHEN o_orderkey % 7 = 0 THEN o_custkey + 1
                ELSE o_custkey END AS c
    FROM orders WHERE o_orderkey % 5 <> 0
),
n AS (SELECT y, CAST(count(*) AS BIGINT) AS n FROM o_final GROUP BY y),
hv AS (SELECT DISTINCT y,
              ('0x' || substr(md5(CAST(c AS VARCHAR)), 1, 15))::BIGINT AS h
       FROM o_final),
stat AS (
    SELECT y, CAST(count(*) AS BIGINT) AS k_eff, max(h) AS h_k
    FROM (SELECT y, h, row_number() OVER (PARTITION BY y ORDER BY h) AS rn FROM hv)
    WHERE rn <= {_KMV_K} GROUP BY y
)
SELECT n.y AS order_year, n.n AS n_orders,
       CASE WHEN s.k_eff < {_KMV_K} THEN CAST(s.k_eff AS DOUBLE)
            ELSE round(({_KMV_K} - 1.0e0) * {_KMV_SPACE!r} / s.h_k, 2)
       END AS est_customers
FROM n JOIN stat s ON n.y = s.y
""",
)
def q218_cdc_kmv_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-MAINTAINED KMV DISTINCT ESTIMATE — the fourth and last
    sketch-under-churn strategy instance, and the one that closes the
    taxonomy: CMS is LINEAR (signed partials, q207), quantiles and HLL
    recompute because their state is order/max-merged (q210/q213), and
    KMV is MIN-merged — a delete can evict one of the K smallest hashes,
    and the (K+1)-th smallest is gone from the sketch, so the only
    correct maintenance is again the touched-key recompute from alive
    rows (streaming/join_view.CdcGroupedRecomputeView with the bottom-K
    estimator as the recompute). The estimate is hash-deterministic, so
    the oracle reproduces it bit-for-bit over the CDC-upserted final
    table (the q215 contract under churn).

    Changelog script over per-order-year distinct customers: creates;
    % 7 customer reassignments (the distinct SET churns); % 13
    year-shifting date corrections (key-moving: the order's customer
    leaves one year's sketch and enters another's); % 5 deletes
    (potential bottom-K evictions); % 11 duplicate re-delivery (no-op).

    Scale: per-batch work is O(touched years' orders) — arrangement-
    pruned; the stored row per key is (count, estimate), constant
    size."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.join_view import CdcGroupedRecomputeView

    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("oid"),
        F.year("o_orderdate").cast("int").alias("y"),
        F.col("o_custkey").alias("c"),
    )
    oid = F.col("oid")
    bumped_c = F.when(oid % 7 == 0, F.col("c") + 1).otherwise(F.col("c"))
    a0, a1 = churn_script(
        o,
        "oid",
        u1_cols={"c": F.col("c") + 1},
        u2_cols={"y": F.col("y") + 1, "c": bumped_c},
    )
    base = tempfile.mkdtemp(prefix="cdc_kmv_view_")
    try:
        view = CdcGroupedRecomputeView(
            spark, base, key="y", pk="oid", recompute=kmv_distinct_recompute
        )
        view.merge(a0, 0)
        view.merge(a1, 1)
        out = view.snapshot().select(
            F.col("y").alias("order_year"),
            F.col("n").alias("n_orders"),
            "est_customers",
        )
        # materialize before the temp state dir is removed
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q220_skyline_pareto",
    oracle="""
SELECT p.p_partkey, p.p_size, p.p_retailprice
FROM part p
WHERE NOT EXISTS (
    SELECT 1 FROM part o
    WHERE o.p_retailprice <= p.p_retailprice
      AND o.p_size >= p.p_size
      AND (o.p_retailprice < p.p_retailprice OR o.p_size > p.p_size)
)
""",
)
def q220_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto-frontier) QUERY — the preference operator
    (Börzsönyi et al., ICDE'01): parts no other part strictly dominates
    on (cheaper price, bigger size). The naive formulation is the
    oracle's NOT-EXISTS self-join — O(n²) and a cartesian at scale; the
    engine runs the SORT-BASED plan instead: order by price, and a row
    survives iff (a) its size equals its price-group's max (a same-price
    row with bigger size dominates it) and (b) that size strictly beats
    the best size among all STRICTLY cheaper rows (the running max over
    the ordered price groups, shifted by one). One shuffle, one window
    pass, no self-join — the classical skyline sweep, and the plan that
    survives 100 TB (per-partition local sweeps then a tiny merge of
    per-partition frontiers is the distributed refinement; the global
    sort here IS that plan under range partitioning).

    Ties: equal (price, size) rows neither dominate each other — all
    kept, matching the oracle's strict-dominance predicate."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_size", "p_retailprice")
    grp = p.groupBy("p_retailprice").agg(F.max("p_size").alias("gmax"))
    w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        grp.withColumn("best_cheaper", F.max("gmax").over(w))
        .filter(
            F.col("best_cheaper").isNull() | (F.col("gmax") > F.col("best_cheaper"))
        )
        .select("p_retailprice", "gmax")
    )
    fr = frontier.select(
        F.col("p_retailprice").alias("f_price"), F.col("gmax").alias("f_size")
    )
    return p.join(
        F.broadcast(fr),
        (F.col("p_retailprice") == F.col("f_price"))
        & (F.col("p_size") == F.col("f_size")),
    ).select("p_partkey", "p_size", "p_retailprice")


_BLOOM_M = 65536  # bit-array width
_BLOOM_K = 4  # hash functions


def _bloom_pos(key: "F.Column", i: int) -> "F.Column":
    """Row-i Bloom position: independent md5-derived hash (the CMS salt
    idiom, engine-portable)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bf{i}:"), key.cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % _BLOOM_M
    )


@query(
    "q242_bloom_filter",
    oracle=f"""
WITH keys AS (SELECT DISTINCT o_custkey AS k FROM orders),
bits AS (
    SELECT DISTINCT ('0x' || substr(md5('bf' || CAST(u.i AS VARCHAR) || ':'
               || CAST(k AS VARCHAR)), 1, 8))::BIGINT % {_BLOOM_M} AS pos
    FROM keys, UNNEST([0, 1, 2, 3]) AS u(i)
),
present AS (SELECT k FROM keys ORDER BY k LIMIT 10),
absent AS (SELECT k + 1000000000 AS k FROM keys ORDER BY k LIMIT 1000),
cand AS (
    SELECT k, TRUE AS is_present FROM present
    UNION ALL
    SELECT k, FALSE FROM absent
),
probe AS (
    SELECT c.k, c.is_present,
           ('0x' || substr(md5('bf' || CAST(u.i AS VARCHAR) || ':'
               || CAST(c.k AS VARCHAR)), 1, 8))::BIGINT % {_BLOOM_M} AS pos
    FROM cand c, UNNEST([0, 1, 2, 3]) AS u(i)
),
hit AS (
    SELECT k, is_present,
           CAST(min(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS found
    FROM probe p LEFT JOIN bits b ON p.pos = b.pos
    GROUP BY k, is_present
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM bits)           AS n_bits_set,
       CAST(sum(CASE WHEN is_present THEN 1 ELSE 0 END) AS BIGINT)
                                                             AS n_present_checked,
       CAST(min(CASE WHEN is_present THEN found ELSE 1 END) AS BOOLEAN)
                                                             AS no_false_negatives,
       CAST(sum(CASE WHEN is_present THEN 0 ELSE 1 END) AS BIGINT)
                                                             AS n_absent_checked,
       CAST(sum(CASE WHEN NOT is_present THEN found ELSE 0 END) AS BIGINT)
                                                             AS n_false_positives,
       floor(sum(CASE WHEN NOT is_present THEN found ELSE 0 END)
             / CAST(sum(CASE WHEN is_present THEN 0 ELSE 1 END) AS DOUBLE)
             * 10000 + 0.5e0) / 10000.0                      AS fp_rate
FROM hit
""",
)
def q242_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM FILTER membership sketch — the classic the sketch family
    (CMS q113, HLL q131, KMV q215, quantile q202) was missing: a
    {_BLOOM_K}-hash, {_BLOOM_M}-bit filter over the distinct order
    custkeys, built as a distinct-position table (the bit array as data —
    mergeable across partitions by set union, which is why a Bloom build
    is one distinct aggregate at any scale). The readout checks the two
    defining properties IN-QUERY: zero false negatives on 10 known-present
    keys (admissibility — a Bloom can only err toward presence), and the
    measured false-positive rate over 1000 derived definitely-absent keys
    (custkey + 1e9 — outside the key domain). With n≈10k keys the fill is
    ~0.45-ish and the FPR lands around (fill)^k — the measured rate is
    emitted as exact integers plus one rounded ratio; everything is
    md5-deterministic, so the oracle reproduces the filter bit-for-bit.

    Scale: build = one distinct + one {_BLOOM_K}-way explode + one
    distinct-position aggregate, output bounded by {_BLOOM_M} rows
    whatever the key count; probes join the bounded position table
    (broadcast at any corpus size). A production filter ships the
    position table as the compact bitmap; the relational form here is the
    engine-checkable equivalent."""
    o = t(spark, sf_dir, "orders")
    keys = o.select(F.col("o_custkey").alias("k")).distinct()
    bits = (
        keys.select(
            F.explode(
                F.array(*[_bloom_pos(F.col("k"), i) for i in range(_BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
    )
    present = keys.orderBy("k").limit(10).select("k", F.lit(True).alias("is_present"))
    absent = (
        keys.orderBy("k")
        .limit(1000)
        .select((F.col("k") + 1_000_000_000).alias("k"), F.lit(False).alias("is_present"))
    )
    cand = present.unionByName(absent)
    probe = cand.select(
        "k",
        "is_present",
        F.explode(
            F.array(*[_bloom_pos(F.col("k"), i) for i in range(_BLOOM_K)])
        ).alias("pos"),
    )
    hit = (
        probe.join(F.broadcast(bits.withColumn("b", F.lit(1))), "pos", "left")
        .groupBy("k", "is_present")
        .agg(F.min(F.when(F.col("b").isNull(), 0).otherwise(1)).cast("bigint").alias("found"))
    )
    nbits = bits.agg(F.count(F.lit(1)).cast("bigint").alias("n_bits_set"))
    fp = F.sum(F.when(~F.col("is_present"), F.col("found")).otherwise(0))
    na = F.sum(F.when(F.col("is_present"), 0).otherwise(1))
    return hit.agg(
        F.sum(F.when(F.col("is_present"), 1).otherwise(0)).cast("bigint").alias("n_present_checked"),
        F.min(F.when(F.col("is_present"), F.col("found")).otherwise(1))
        .cast("boolean")
        .alias("no_false_negatives"),
        na.cast("bigint").alias("n_absent_checked"),
        fp.cast("bigint").alias("n_false_positives"),
        (F.floor(fp / na.cast("double") * 10000 + 0.5e0) / 10000.0).alias("fp_rate"),
    ).crossJoin(F.broadcast(nbits)).select(
        "n_bits_set",
        "n_present_checked",
        "no_false_negatives",
        "n_absent_checked",
        "n_false_positives",
        "fp_rate",
    )


@query(
    "q243_cdc_counting_bloom",
    oracle=f"""
WITH final AS (
    SELECT CASE WHEN o_orderkey % 13 = 0 THEN 1
                WHEN o_orderkey % 7 = 0 THEN o_custkey + 200000
                ELSE o_custkey END AS k
    FROM orders WHERE o_orderkey % 5 != 0
),
counters AS (
    SELECT pos, CAST(count(*) AS BIGINT) AS cnt
    FROM (
        SELECT ('0x' || substr(md5('bf' || CAST(u.i AS VARCHAR) || ':'
                   || CAST(k AS VARCHAR)), 1, 8))::BIGINT % {_BLOOM_M} AS pos
        FROM final, UNNEST([0, 1, 2, 3]) AS u(i)
    ) GROUP BY pos
),
dk AS (SELECT DISTINCT k FROM final),
present AS (SELECT k FROM dk ORDER BY k LIMIT 10),
absent AS (SELECT k + 1000000000 AS k FROM dk ORDER BY k LIMIT 1000),
cand AS (
    SELECT k, TRUE AS is_present FROM present
    UNION ALL
    SELECT k, FALSE FROM absent
),
probe AS (
    SELECT c.k, c.is_present,
           ('0x' || substr(md5('bf' || CAST(u.i AS VARCHAR) || ':'
               || CAST(c.k AS VARCHAR)), 1, 8))::BIGINT % {_BLOOM_M} AS pos
    FROM cand c, UNNEST([0, 1, 2, 3]) AS u(i)
),
hit AS (
    SELECT k, is_present,
           CAST(min(CASE WHEN ct.pos IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS found
    FROM probe p LEFT JOIN counters ct ON p.pos = ct.pos
    GROUP BY k, is_present
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM counters)      AS n_positions_set,
       (SELECT CAST(sum(cnt) AS BIGINT) FROM counters)      AS total_count,
       CAST(sum(CASE WHEN is_present THEN 1 ELSE 0 END) AS BIGINT)
                                                            AS n_present_checked,
       CAST(min(CASE WHEN is_present THEN found ELSE 1 END) AS BOOLEAN)
                                                            AS no_false_negatives,
       CAST(sum(CASE WHEN NOT is_present THEN found ELSE 0 END) AS BIGINT)
                                                            AS n_false_positives
FROM hit
""",
)
def q243_cdc_counting_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-MAINTAINED COUNTING BLOOM FILTER — q242's membership sketch
    made retraction-safe (streaming/bloom_index.CdcCountingBloom): a
    plain Bloom cannot delete (clearing a bit clears every key hashing
    there), so under churn its FPR only rises as dead keys' bits
    accumulate; per-position COUNTERS are linear in the tracked multiset,
    so the q207 signed-partial algebra maintains the filter exactly — a
    key-moving order correction retracts the old custkey's 4 cells and
    asserts the new custkey's in one merge, a delete decrements exactly,
    and membership (all positions' net counts > 0) tests against the
    ALIVE order set only.

    Script: churn_script over orders (pk = o_orderkey; %7 reassigns the
    order to custkey+200000, %13 reassigns to custkey 1 — u2 overrides
    the same column u1 changes, so the final image is u2's outright;
    %5 deletes; %11 duplicate re-deliveries netting to zero), two
    merges, then q242's readout over the MAINTAINED counters: zero
    false negatives on the 10 smallest alive keys, false-positive count
    over 1000 derived absent keys, both against the identical counters
    DuckDB builds from scratch over the upserted final orders
    (counter-exactness: net of the partials == counters of the net).

    Scale: per merge the landed partial is ≤ 4·|Δ| cells collapsing
    map-side; the pre-image read is pk-pruned; the counter table is
    bounded by {_BLOOM_M} positions however many orders exist."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.operators.common import churn_script
    from stream_cdc_gps_spark.streaming.bloom_index import CdcCountingBloom

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    a0, a1 = churn_script(
        o,
        "o_orderkey",
        u1_cols={"o_custkey": F.col("o_custkey") + 200000},
        u2_cols={"o_custkey": F.lit(1).cast("bigint")},
    )
    base = tempfile.mkdtemp(prefix="cdc_bloom_")
    try:
        bloom = CdcCountingBloom(spark, base, pk="o_orderkey", key="o_custkey")
        bloom.merge(a0, 0)
        bloom.merge(a1, 1)
        counters = bloom.counters().localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    ok = F.col("o_orderkey")
    final_k = (
        o.filter(ok % 5 != 0)
        .select(
            F.when(ok % 13 == 0, F.lit(1).cast("bigint"))
            .when(ok % 7 == 0, F.col("o_custkey") + 200000)
            .otherwise(F.col("o_custkey"))
            .alias("k")
        )
        .distinct()
    )
    present = final_k.orderBy("k").limit(10).select("k", F.lit(True).alias("is_present"))
    absent = (
        final_k.orderBy("k")
        .limit(1000)
        .select((F.col("k") + 1_000_000_000).alias("k"), F.lit(False).alias("is_present"))
    )
    probe = present.unionByName(absent).select(
        "k",
        "is_present",
        F.explode(
            F.array(*[_bloom_pos(F.col("k"), i) for i in range(_BLOOM_K)])
        ).alias("pos"),
    )
    hit = (
        probe.join(F.broadcast(counters), "pos", "left")
        .groupBy("k", "is_present")
        .agg(
            F.min(F.when(F.col("cnt").isNull(), 0).otherwise(1))
            .cast("bigint")
            .alias("found")
        )
    )
    stats = counters.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_positions_set"),
        F.sum("cnt").cast("bigint").alias("total_count"),
    )
    return hit.agg(
        F.sum(F.when(F.col("is_present"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_present_checked"),
        F.min(F.when(F.col("is_present"), F.col("found")).otherwise(1))
        .cast("boolean")
        .alias("no_false_negatives"),
        F.sum(F.when(~F.col("is_present"), F.col("found")).otherwise(0))
        .cast("bigint")
        .alias("n_false_positives"),
    ).crossJoin(F.broadcast(stats)).select(
        "n_positions_set",
        "total_count",
        "n_present_checked",
        "no_false_negatives",
        "n_false_positives",
    )
