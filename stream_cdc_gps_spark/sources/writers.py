"""Landed-table writers: partition layout for the write-once/read-forever
tables the pipeline produces.

SURVEY.md §4.2's 100 TB layout: partition landed GPS/CDC tables by coarse
time (day) so every time-bounded query prunes whole directories before a
single row is read, and bucket by the hot join key (device/gps_id — see
``operators.skew.write_bucketed``) so later joins are exchange-free. Both
are write-time decisions; readers get the benefit through Catalyst's
partition pruning + bucketed scan with no query changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Write parquet hive-style partitioned by ``partition_cols``.

    Partition columns should be LOW cardinality per 100 TB of data (day,
    region, event_type) — thousands of directories, not millions; high-
    cardinality keys belong in bucketing, not partitioning."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table back (partition columns restored from the
    directory layout; filters on them prune directories at planning time)."""
    return spark.read.parquet(path)
