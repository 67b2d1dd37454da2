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


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a table whose batches were written with EVOLVING schemas.

    ``mergeSchema`` unions every footer's schema at planning time: columns
    absent from older files surface as nulls, so additive evolution (new
    telemetry fields, new metadata columns) never requires rewriting landed
    data. Column TYPE changes are not reconciled — the read fails loudly —
    which is the safe default for a landing zone."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def compact(
    spark: SparkSession, path: str, out: str, target_file_mb: int = 128
) -> int:
    """Compact a small-file table into ~target-sized parquet files.

    Streaming sinks land one file per micro-batch partition; thousands of
    KB-files later throttle every scan on footer/open overhead. Sizing by
    BYTES (not a fixed file count) keeps the policy valid at any scale:
    files = ceil(input_bytes / target). Returns the file count written."""
    df = spark.read.parquet(path)
    n_bytes = sum(
        int(r.length)
        for r in spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(path)
        .select("length")
        .collect()
    )
    n_files = max(1, -(-n_bytes // (target_file_mb * 1024 * 1024)))
    df.coalesce(n_files).write.mode("overwrite").parquet(out)
    return n_files
