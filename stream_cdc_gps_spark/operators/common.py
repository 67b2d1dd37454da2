"""Shared helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stream_cdc_gps_spark.tables import load_table


def prepare(spark: SparkSession) -> SparkSession:
    """Pin session semantics every query depends on.

    The corpus parquet timestamps are naive (isAdjustedToUTC=false); with the
    session timezone pinned to UTC, Spark's TIMESTAMP_LTZ interpretation and
    DuckDB's naive TIMESTAMP agree on wall-clock values, literals, and
    date_trunc — regardless of which session the driver hands us.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a corpus table (shorthand used by every query)."""
    prepare(spark)
    return load_table(spark, sf_dir, name)


def churn_script(df: DataFrame, pk: str, u1_cols: dict, u2_cols: dict):
    """(batch 0, batch 1) of the maintained-view family's composed CDC
    churn over an image frame ``df`` (columns = the full image, ``pk``
    an integer key):

    - batch 0 creates every row (op 'c', seq = pk);
    - batch 1 delivers VALUE corrections at pk % 7 == 0 (``u1_cols``
      column overrides), KEY-MOVING corrections at pk % 13 == 0
      (``u2_cols`` — must already compose the % 7 override where both
      rules hit a row), deletes at % 5, and duplicate re-delivery of
      UNCHANGED rows at % 11 (excluding every mutated pk — a duplicate
      carrying the pre-mutation image would override the corrections,
      the subtle bug each hand-copied script had to avoid); seq bands
      1e9/2e9/3e9/4e9 + pk keep the CDC ordering total.

    Factored from the q204/q207-era hand-written scripts so the
    correctness-critical exclusion terms live in ONE place (q210, q213,
    q216, q218 use it; oracles state the same rules as SQL CASEs)."""
    from pyspark.sql import functions as F

    p = F.col(pk)

    def img(overrides: dict):
        return [
            (overrides[c] if c in overrides else F.col(c)).alias(c)
            for c in df.columns
        ]

    def b(op, band, cond, overrides):
        out = df.filter(cond) if cond is not None else df
        return out.select(
            F.lit(op).alias("op"), (F.lit(band) + p).alias("seq"), *img(overrides)
        )

    a0 = b("c", 0, None, {})
    a_u1 = b("u", 1_000_000_000, p % 7 == 0, u1_cols)
    a_u2 = b("u", 2_000_000_000, p % 13 == 0, u2_cols)
    a_d = b("d", 3_000_000_000, p % 5 == 0, {})
    a_dup = b(
        "u",
        4_000_000_000,
        (p % 11 == 0) & (p % 5 != 0) & (p % 7 != 0) & (p % 13 != 0),
        {},
    )
    return a0, a_u1.unionByName(a_u2).unionByName(a_d).unionByName(a_dup)
