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
