"""Streaming graph wiring: sources -> pure transforms -> checkpointed sinks.

Three graphs mirror the reference's three dataflows (SURVEY.md §3):

A. ingest_graph   — GPS JSON stream -> flatten -> Connect-envelope -> Kafka
                    (reference entry point A, ``cmd/main.go:87-139``)
B. landing_graph  — envelope stream -> flat table append
                    (reference entry point B, the Connect JDBC sink,
                    ``connector.json``)
C. cdc_graph      — Debezium stream -> after image -> dedup -> WKT landing
                    (reference entry point C, ``cmd/main.go:196-231``)

Every graph takes a source DataFrame (streaming or batch) so tests can feed
file sources with ``trigger(availableNow=True)`` and production can swap in
``readStream.format("kafka")`` — the transforms are identical (the whole
point of the pure-function factoring in transforms.py).

Delivery semantics: micro-batch + checkpoint + idempotent sink = exactly-once
observable output, vs the reference's crash-on-insert-error /
skip-on-parse-error undefined delivery (``cmd/main.go:199-226``).

Scale notes: the Kafka source parallelizes by topic partition; the landing
sink writes one file per partition per micro-batch (compact with a separate
OPTIMIZE-style job at 100 TB); dedup state is watermark-bounded and hash
partitioned on the record id.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamWriter

from stream_cdc_gps_spark.streaming import transforms as X


def read_json_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-based stream of raw JSON lines in a single ``value`` string
    column (test stand-in for the Kafka/HTTP edge, SURVEY.md §2A op #1: the
    HTTP hop is outside the engine). Parsing/typing happens downstream in
    ``transforms.parse_gps_json`` — this reader never applies a schema."""
    return spark.readStream.format("text").load(path)


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka source configured like the reference consumer
    (``cmd/main.go:31-51``): subscribe topic, start at latest; fetch tuning
    (MinBytes/MaxBytes/MaxWait) maps to maxOffsetsPerTrigger backpressure."""
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return r.load()


# ---------------------------------------------------------------------------
# Graphs (pure: DataFrame in -> DataFrame out; work on batch AND stream)
# ---------------------------------------------------------------------------


def ingest_graph(raw: DataFrame) -> DataFrame:
    """Entry point A: raw GPS JSON -> (key, value) Connect-envelope messages."""
    return X.keyed_for_kafka(X.flatten_fix(X.parse_gps_json(raw)))


def rejects_graph(raw: DataFrame) -> DataFrame:
    """Dead-letter branch of A: malformed payloads (reference returns HTTP 400
    and drops, ``cmd/main.go:92-95``; the engine keeps them observable)."""
    return X.parse_gps_json(raw).filter("corrupt").select("value")


def landing_graph(envelopes: DataFrame) -> DataFrame:
    """Entry point B: Connect envelopes -> flat relational rows (the
    auto-created table the JDBC sink would materialize)."""
    return X.parse_connect_envelope(envelopes)


def cdc_graph(
    cdc_raw: DataFrame,
    insert_only: bool = True,
    dedup: bool = True,
    dedup_delay: str = "10 minutes",
) -> DataFrame:
    """Entry point C: Debezium JSON -> deduped ``location_instances`` rows.

    When deduping, Debezium's ``ts_ms`` is carried through as the event-time
    column so the STREAMING branch of ``dedup_replays`` uses
    ``withWatermark + dropDuplicatesWithinWatermark`` — replay-dedup state is
    bounded by ``dedup_delay`` instead of growing without bound on a
    long-running Kafka deployment (batch inputs still use plain
    dropDuplicates; observable output is identical on finite data)."""
    parsed = X.parse_debezium(cdc_raw)
    after = X.after_image(parsed, insert_only=insert_only, keep_event_time=dedup)
    if dedup:
        after = X.dedup_replays(
            after, id_col="id", ts_col="_event_ts", delay=dedup_delay
        )
    return X.location_instances(after)


# ---------------------------------------------------------------------------
# Sinks
# ---------------------------------------------------------------------------


def parquet_sink(
    df: DataFrame, path: str, checkpoint: str, available_now: bool = True
) -> DataStreamWriter:
    """Append stream to parquet with checkpointing (exactly-once file sink)."""
    w = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    return w.trigger(availableNow=True) if available_now else w


def jdbc_batch_writer(url: str, table: str, properties: dict[str, Any] | None = None):
    """foreachBatch function writing each micro-batch via JDBC append —
    Spark's equivalent of the reference's per-message INSERT
    (``cmd/main.go:217-223``) and of the Connect JDBC sink
    (``connector.json:12-13``, auto-DDL on first append). Idempotence at
    restart comes from checkpoint + primary key upsert in the target
    (key: gps_id — the reference's natural id)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.jdbc(url=url, table=table, mode="append", properties=properties or {})

    return _write


def kafka_sink(
    df: DataFrame, brokers: str, topic: str, checkpoint: str
) -> DataStreamWriter:
    """Keyed Kafka produce (reference writer ``cmd/main.go:23-29,126-137``;
    LeastBytes balancing becomes Kafka's default partitioner on the key)."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
