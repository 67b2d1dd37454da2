"""Skew mitigation utilities: salted joins and bucketed co-located joins.

Two of the levers SURVEY.md §2B's scale notes call for when a shuffle key is
pathological at 100 TB:

- **Salting** (``salted_join``): a hot key that lands an entire 100 TB join
  partition on one reducer is split across ``n_salt`` sub-partitions by
  appending a salt column; the small side is replicated once per salt value.
  AQE's skew-join split handles moderate skew automatically (session.py turns
  it on); salting is the explicit lever for the extreme case where one key
  alone exceeds an executor.
- **Bucketing** (``write_bucketed``): pre-shuffling a table into N buckets on
  its join key at write time makes every later join/aggregate on that key
  exchange-free — pay the shuffle once, reuse it forever. That is the right
  trade for the landed GPS/CDC tables, which are written once and joined
  constantly (the reference's `location_instances` table, `cmd/main.go:212-215`,
  plays this role — its consumers always look up by gps_id).

Both are semantically transparent: the salted join is oracle-checked against
the plain join SQL (q94), and the bucketed join is plan-asserted shuffle-free
in tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.operators.common import t
from stream_cdc_gps_spark.registry import query

_SALT = "_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salt: int = 16,
    how: str = "inner",
    salt_expr: Column | None = None,
) -> DataFrame:
    """Equi-join a skew-keyed large side against a replicable smaller side.

    The skewed side gets a deterministic salt in ``[0, n_salt)`` (by default
    a hash of the whole row, so identical rows co-locate but each distinct
    row spreads uniformly; pass ``salt_expr`` to spread on something finer,
    e.g. ``pmod(xxhash64(monotonically_increasing_id()), n_salt)``).
    The other side is replicated ``n_salt`` times via ``explode(sequence)``,
    and the join keys become ``on + [salt]`` — splitting each hot key's rows
    across ``n_salt`` reducers.

    Only ``inner`` and ``left`` are allowed: with ``right``/``full``, an
    unmatched replicated row would surface once per salt value.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if salt_expr is None:
        salt_expr = F.pmod(
            F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salt)
        )
    s = skewed.withColumn(_SALT, salt_expr.cast("int"))
    r = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return s.join(r, on + [_SALT], how).drop(_SALT)


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    path: str,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) parquet table.

    Joins and aggregations between tables bucketed on the same keys with the
    same bucket count run with ZERO exchanges — the write is the shuffle.
    At 100 TB, bucket count should be sized so one bucket ≈ one task's
    comfortable working set (e.g. 4096 buckets for a 100 TB fact table
    ≈ 25 GB/bucket of raw data, well under after column pruning)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .option("path", path)
        .saveAsTable(table)
    )


@query(
    "q94_skew_salted_join",
    oracle="""
SELECT p_brand, count(*) AS n, round(sum(l_extendedprice), 2) AS total
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
)
def q94_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⨝dim join — must be indistinguishable from the plain join
    (the oracle IS the plain join), proving salting changes the physical
    distribution only."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    p = (
        t(spark, sf_dir, "part")
        .select("p_partkey", "p_brand")
        .withColumnRenamed("p_partkey", "l_partkey")
    )
    return (
        salted_join(li, p, ["l_partkey"], n_salt=8)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
    )
