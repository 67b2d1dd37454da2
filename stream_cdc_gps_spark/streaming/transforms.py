"""Pure DataFrame->DataFrame transforms for the CDC/GPS streaming graph.

Each stage of the reference pipeline (HTTP ingest -> flatten -> Connect
envelope -> Kafka -> Debezium CDC -> after-image -> PostGIS landing,
reference ``cmd/main.go``) is a pure function here, so the SAME code runs on
a batch DataFrame (unit/oracle tests) or a streaming DataFrame (production
graph) — the idiomatic Structured Streaming factoring.

Reference semantics preserved deliberately (SURVEY.md §7.3):
- flatten renames ``location.timestamp -> id`` and ``device_id -> deviceId``
  (``cmd/main.go:103-110``); the id stays a raw string, never parsed;
- the Connect envelope carries the schema in-band per message
  (``cmd/main.go:111-125``, required by the JDBC sink connector config);
- CDC default is insert-only after-image extraction, ignoring op/before
  (``cmd/main.go:233-240``); full-CDC mode is the explicit opt-in;
- WKT is ``POINT(lon lat)`` — longitude first (``cmd/main.go:210``).

Upgrades over the reference (its failure semantics are undefined —
``log.Fatalf`` on insert error, skip on parse error, ``cmd/main.go:199-226``):
malformed JSON is routed, not dropped silently; replays are deduplicated
within a watermark; sinks get exactly-once via checkpoint + idempotent write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stream_cdc_gps_spark.functions.geo import wkt_point

# Inbound GPS fix — the mobile-client shape (reference ``cmd/main.go:68-85``,
# FIXTURES.md A1).
GPS_SCHEMA = T.StructType(
    [
        T.StructField(
            "location",
            T.StructType(
                [
                    T.StructField("timestamp", T.StringType()),
                    T.StructField(
                        "coords",
                        T.StructType(
                            [
                                T.StructField("latitude", T.DoubleType()),
                                T.StructField("longitude", T.DoubleType()),
                                T.StructField("accuracy", T.DoubleType()),
                                T.StructField("speed", T.DoubleType()),
                                T.StructField("heading", T.DoubleType()),
                                T.StructField("altitude", T.DoubleType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField("device_id", T.StringType()),
    ]
)

# Debezium change-event envelope — the fields the engine consumes (reference
# models only ``after.{id,latitude,longitude}``, ``cmd/main.go:233-240``;
# op/before/source/ts_ms added for full-CDC mode, FIXTURES.md A3).
_GPS_ROW = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
    ]
)
DEBEZIUM_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("before", _GPS_ROW),
        T.StructField("after", _GPS_ROW),
        T.StructField("source", T.StructType([T.StructField("table", T.StringType())])),
        T.StructField("ts_ms", T.LongType()),
    ]
)

# Flat fields in envelope order (``cmd/main.go:111-120``: 2 strings, 6 floats).
FLAT_FIELDS = [
    ("id", "string"),
    ("deviceId", "string"),
    ("heading", "float"),
    ("speed", "float"),
    ("accuracy", "float"),
    ("altitude", "float"),
    ("latitude", "float"),
    ("longitude", "float"),
]


def parse_gps_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON bytes/string -> typed nested fix + ``corrupt`` flag.

    The reference rejects malformed bodies with HTTP 400 (``cmd/main.go:92-95``);
    here a failed parse yields a null struct, surfaced as ``corrupt = true`` so
    the caller can route rejects to a dead-letter sink instead of dropping.
    """
    parsed = df.withColumn(
        "fix", F.from_json(F.col(value_col).cast("string"), GPS_SCHEMA)
    )
    # from_json is PERMISSIVE: unparseable -> null struct; parseable-but-empty
    # objects keep nulls in required leaves, also treated as rejects.
    return parsed.withColumn(
        "corrupt",
        F.col("fix").isNull()
        | F.col("fix.location").isNull()
        | F.col("fix.device_id").isNull(),
    )


def flatten_fix(parsed: DataFrame) -> DataFrame:
    """Nested fix -> 8 flat columns with the reference's renames
    (``location.timestamp -> id``, ``device_id -> deviceId``,
    ``cmd/main.go:103-110``). Keeps only non-corrupt rows."""
    return parsed.filter(~F.col("corrupt")).select(
        F.col("fix.location.timestamp").alias("id"),
        F.col("fix.device_id").alias("deviceId"),
        F.col("fix.location.coords.heading").alias("heading"),
        F.col("fix.location.coords.speed").alias("speed"),
        F.col("fix.location.coords.accuracy").alias("accuracy"),
        F.col("fix.location.coords.altitude").alias("altitude"),
        F.col("fix.location.coords.latitude").alias("latitude"),
        F.col("fix.location.coords.longitude").alias("longitude"),
    )


def connect_envelope(flat: DataFrame) -> DataFrame:
    """Flat fix -> Kafka-Connect ``{schema, payload}`` JSON envelope string.

    The schema block is constant and carried in-band per message, exactly as
    the producer hand-builds it (``cmd/main.go:111-125``) and as the JDBC sink
    requires (``connector.json:16-17``). Output column: ``value`` (string).
    """
    schema_struct = F.struct(
        F.lit("struct").alias("type"),
        F.array(
            *[
                F.struct(F.lit(typ).alias("type"), F.lit(name).alias("field"))
                for name, typ in FLAT_FIELDS
            ]
        ).alias("fields"),
    )
    payload_struct = F.struct(*[F.col(name) for name, _ in FLAT_FIELDS])
    return flat.select(
        F.to_json(
            F.struct(schema_struct.alias("schema"), payload_struct.alias("payload"))
        ).alias("value")
    )


def keyed_for_kafka(flat: DataFrame, key: Column | None = None) -> DataFrame:
    """(key, value) columns for the Kafka sink. The reference keys by client
    address (``"address-" + req.RemoteAddr``, ``cmd/main.go:127``) — the engine
    keys by device (stable partitioning, same spirit: one producer ≈ one
    device), overridable via ``key``."""
    k = key if key is not None else F.concat(F.lit("address-"), F.col("deviceId"))
    schema_struct = F.struct(
        F.lit("struct").alias("type"),
        F.array(
            *[
                F.struct(F.lit(typ).alias("type"), F.lit(name).alias("field"))
                for name, typ in FLAT_FIELDS
            ]
        ).alias("fields"),
    )
    payload_struct = F.struct(*[F.col(name) for name, _ in FLAT_FIELDS])
    return flat.select(
        k.alias("key"),
        F.to_json(
            F.struct(schema_struct.alias("schema"), payload_struct.alias("payload"))
        ).alias("value"),
    )


def parse_connect_envelope(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Inverse of ``connect_envelope``: envelope JSON -> flat fix columns."""
    payload_schema = T.StructType(
        [
            T.StructField(name, T.StringType() if typ == "string" else T.DoubleType())
            for name, typ in FLAT_FIELDS
        ]
    )
    env_schema = T.StructType([T.StructField("payload", payload_schema)])
    return (
        df.withColumn("env", F.from_json(F.col(value_col).cast("string"), env_schema))
        .filter(F.col("env.payload").isNotNull())
        .select("env.payload.*")
    )


def parse_debezium(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Debezium change-event JSON -> typed envelope columns.

    Malformed messages -> null envelope, filtered like the reference's
    skip-on-error (``cmd/main.go:205-207``) but observable via the
    ``cdc`` null-ness upstream of the filter if a dead-letter tap is wanted.
    """
    return df.withColumn("cdc", F.from_json(F.col(value_col).cast("string"), DEBEZIUM_SCHEMA))


def after_image(
    cdc: DataFrame, insert_only: bool = True, keep_event_time: bool = False
) -> DataFrame:
    """Project the after image (``cmd/main.go:203-208``).

    ``insert_only=True`` reproduces the reference exactly: every event with a
    non-null after image is treated as an insert (op ignored). With
    ``insert_only=False``, deletes (op='d') are excluded and op is kept so a
    downstream merge can upsert — the full-CDC mode (SURVEY.md §7.3).

    ``keep_event_time=True`` carries Debezium's ``ts_ms`` along as an
    ``_event_ts`` timestamp column — required for watermark-bounded replay
    dedup on an unbounded stream (``dedup_replays``); without an event-time
    column the dedup state would grow forever.
    """
    base = cdc.filter(F.col("cdc").isNotNull() & F.col("cdc.after").isNotNull())
    event_ts = [F.timestamp_millis(F.col("cdc.ts_ms")).alias("_event_ts")] if keep_event_time else []
    if insert_only:
        return base.select("cdc.after.*", *event_ts)
    return base.filter(F.col("cdc.op") != "d").select(
        "cdc.op", "cdc.after.*", "cdc.ts_ms", *event_ts
    )


def location_instances(after: DataFrame) -> DataFrame:
    """After image -> the landed ``location_instances`` shape
    (``cmd/main.go:212-215``): gps_id, WKT geo_point (lon first,
    ``cmd/main.go:210``), redundant lat/lon doubles (``cmd/main.go:213``)."""
    return after.select(
        F.col("id").alias("gps_id"),
        wkt_point(F.col("longitude"), F.col("latitude")).alias("geo_point"),
        F.col("latitude").alias("latitude"),
        F.col("longitude").alias("longitude"),
    )


def dedup_replays(df: DataFrame, id_col: str = "id", ts_col: str | None = None,
                  delay: str = "10 minutes") -> DataFrame:
    """Collapse CDC replays on the record id.

    Streaming: watermark + dropDuplicatesWithinWatermark — state is bounded
    by the delay, which is what makes this viable on an unbounded stream at
    scale (the reference has no dedup; a crash-restart double-inserts,
    SURVEY.md §3.3). Batch: plain dropDuplicates (same observable result on
    a finite input).
    """
    if df.isStreaming and ts_col is not None:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark([id_col])
    return df.dropDuplicates([id_col])
