"""Batch + streaming source readers (SURVEY.md §2B sources table).

Every reader pins an explicit schema (schema-on-read, like the reference's
partial-struct decode ``cmd/main.go:233-240``) — inference is a full extra
pass at 100 TB and produces unstable types. Malformed records are ROUTED to a
``_corrupt_record`` column (PERMISSIVE mode), the engine-wide upgrade over the
reference's skip/400 behavior (``cmd/main.go:92-95,205-207``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_json(
    spark: SparkSession, path: str, schema: T.StructType, streaming: bool = False
) -> DataFrame:
    """JSON-lines scan with corrupt-record routing.

    NB: rows failing to parse land with all data fields null and the raw text
    in ``_corrupt_record`` — filter on it to split good/dead-letter branches.
    """
    reader = spark.readStream if streaming else spark.read
    return (
        reader.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    streaming: bool = False,
) -> DataFrame:
    """CSV scan with the same corrupt-record contract as JSON."""
    reader = spark.readStream if streaming else spark.read
    return (
        reader.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_parquet(
    spark: SparkSession, path: str, schema: T.StructType | None = None,
    streaming: bool = False,
) -> DataFrame:
    """Parquet scan; schema optional (parquet is self-describing, but pinning
    keeps types stable across files and enables vectorized pruning)."""
    reader = spark.readStream if streaming else spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, dead_letter): good rows lose the corrupt column; dead-letter
    rows keep every column (Spark refuses a query referencing ONLY the
    internal corrupt column over a raw scan — SPARK-26108; keeping the full
    row also preserves any partially-parsed fields for triage)."""
    good = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = df.filter(df[CORRUPT_COL].isNotNull())
    return good, bad


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic load stream (stand-in for the HTTP edge, SURVEY.md §2A #1)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
