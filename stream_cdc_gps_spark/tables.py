"""Corpus table registry: schemas + loaders for /root/testdata/sf*/.

Schemas are pinned (not inferred) so queries fail fast on drift and so the
parquet reader can prune columns/row-groups against a known layout. At 100 TB
these tables would be partitioned (orders/lineitem by date, events by
date+bucket(user_id)); the loaders keep that concern in one place.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES = {"region", "nation", "supplier"}

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # ts has shipped as both INT64 TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    # across corpus regenerations; load_table probes the parquet footer and
    # picks the matching read path (see _events_ts_is_nanos), so the logical
    # schema here is always TimestampType (µs).
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


@lru_cache(maxsize=None)
def _events_ts_is_nanos_cached(path: str, mtime_ns: int, size: int) -> bool:
    import pyarrow.parquet as pq

    field_type = pq.ParquetFile(path).schema_arrow.field("ts").type
    # unit attribute, not exact-type equality: a tz-annotated nanos column
    # (timestamp[ns, tz=...]) must also take the raw-long path — Spark
    # errors on INT64 TIMESTAMP(NANOS) either way.
    return getattr(field_type, "unit", None) == "ns"


def _events_ts_is_nanos(path: str) -> bool:
    """Probe the parquet footer for events.ts's physical time unit.

    The driver corpus has shipped ts as TIMESTAMP(NANOS) in some
    generations and TIMESTAMP(MICROS) in others; assuming either silently
    lands values off by 1000x under the other, so the unit is read from the
    file metadata (one driver-side footer read — no data scan). Cached on
    (path, mtime, size), NOT path alone: the corpus is regenerated in place
    between rounds, and a stale cached unit decision would corrupt every
    event timestamp 1000x — the exact drift the probe exists to catch."""
    st = os.stat(path)
    return _events_ts_is_nanos_cached(path, st.st_mtime_ns, st.st_size)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table with its pinned schema.

    Passing the schema (rather than inferring) keeps the scan's ReadSchema
    minimal once the query projects columns, and guarantees type stability
    across scale factors.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    path = table_path(sf_dir, name)
    if name == "events" and _events_ts_is_nanos(path):
        # Nanos corpus: Spark's TimestampType (µs) cannot scan INT64 nanos
        # vectorized, so read ts as raw long and truncate with integer
        # division (`div`): the raw nanos (~1.7e18) exceed double's
        # exact-integer range, so float division would be off by up to a µs.
        # Truncation (not rounding) matches DuckDB's ns->µs read.
        raw = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in SCHEMAS[name].fields
            ]
        )
        return (
            spark.read.schema(raw)
            .parquet(path)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    # Micros corpus (and every other table): native vectorized scan with the
    # pinned logical schema — filters and pruning push straight to parquet.
    return spark.read.schema(SCHEMAS[name]).parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (same names DuckDB uses)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
