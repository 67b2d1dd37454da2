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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from pyspark.errors import AnalysisException

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


def merge_statements(table: str, stage: str, key: str) -> list[str]:
    """The keyed-upsert transaction body: delete target rows whose key
    appears in the staged batch, then insert the whole staged batch.

    DELETE+INSERT (rather than vendor MERGE syntax) is portable ANSI SQL and
    has identical observable semantics for a keyed upsert: after the
    transaction, exactly one row per staged key, carrying the staged values.
    Pure function so the statement algebra is unit-testable without a
    database."""
    return [
        f"DELETE FROM {table} WHERE {key} IN (SELECT {key} FROM {stage})",
        f"INSERT INTO {table} SELECT * FROM {stage}",
    ]


def _one_row_per_key(
    batch_df: DataFrame, key: str, order_cols: tuple[str, ...] | None
) -> DataFrame:
    """Reduce a micro-batch to exactly one row per key before a keyed merge.

    A CDC micro-batch routinely carries several changes for the same key;
    staging it as-is would make DELETE+INSERT land duplicate rows, breaking
    ``merge_statements``'s one-row-per-staged-key contract. With
    ``order_cols`` the latest change wins (deterministic ``latest_per_key``
    reduction, same policy as ChangelogSnapshotTarget); without an order
    there is no deterministic winner, so duplicate keys fail loudly instead
    of silently picking a row.

    Upsert mode requires NON-NULL keys: SQL's ``{key} IN (SELECT ...)``
    merge predicate never matches NULL, so a NULL-keyed row could neither
    replace nor be replaced — it is rejected here, explicitly (a
    count_distinct-based check would silently skip NULLs and mis-report
    the batch as carrying duplicates)."""
    if order_cols:
        return latest_per_key(batch_df, key, order_cols)
    # ONE validation pass: group on the key, keep only violating groups,
    # stop at the first (the previous count/count_distinct pair scanned the
    # batch twice per micro-batch just to validate).
    bad = (
        batch_df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col(key).isNull() | (F.col("n") > 1))
        .limit(1)
        .collect()
    )
    if bad:
        row = bad[0]
        if row[key] is None:
            raise ValueError(
                f"upsert batch carries NULL {key!r} keys ({row['n']} row(s)); "
                f"keyed upsert requires non-null keys"
            )
        raise ValueError(
            f"upsert batch has {row['n']} rows for {key}={row[key]!r}; pass "
            f"order_cols to pick the latest change per key"
        )
    return batch_df


def jdbc_batch_writer(
    url: str,
    table: str,
    properties: dict[str, Any] | None = None,
    key: str = "gps_id",
    mode: str = "upsert",
    order_cols: tuple[str, ...] | None = None,
):
    """foreachBatch function landing each micro-batch via JDBC — Spark's
    replacement for the reference's per-message INSERT (``cmd/main.go:217-223``)
    and the Connect JDBC sink (``connector.json:12-13``).

    ``mode="upsert"`` (default) is what makes the exactly-once claim TRUE
    rather than aspirational: the reference double-inserts when it crashes
    between offset commit and insert (``cmd/main.go:225``, SURVEY.md §3.3).
    Here a replayed micro-batch is idempotent because each batch is staged
    into ``{table}__stage`` (overwrite) and merged with a keyed
    DELETE+INSERT in ONE transaction on a driver-side JDBC connection —
    re-running the same batch deletes and re-inserts the same keys, landing
    the same rows. Key: ``gps_id`` (the reference's natural id).

    ``mode="append"`` reproduces the Connect sink's ``insert.mode: insert``
    (at-least-once on replay) for strict reference parity.

    Each upsert batch is first reduced to ONE row per key
    (``_one_row_per_key``: latest change wins under ``order_cols``, or a
    loud failure on unexpected duplicates) so the staged table honors the
    merge contract even when a CDC micro-batch carries several changes for
    the same key.

    The same keyed DELETE+INSERT algebra — including the per-key reduction —
    is exercised hermetically by ``ParquetUpsertTarget``
    (tests/test_streaming.py) — the sandbox has no JDBC endpoint, so the
    database-side path is broker-gated like the Kafka sources."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        props = properties or {}
        if mode == "append":
            batch_df.write.jdbc(url=url, table=table, mode="append", properties=props)
            return
        stage = f"{table}__stage"
        staged = _one_row_per_key(batch_df, key, order_cols)
        staged.write.jdbc(url=url, table=stage, mode="overwrite", properties=props)
        jvm = batch_df.sparkSession._jvm
        jprops = jvm.java.util.Properties()
        for k, v in props.items():
            jprops.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
        try:
            conn.setAutoCommit(False)
            st = conn.createStatement()
            for sql in merge_statements(table, stage, key):
                st.executeUpdate(sql)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    return _write


def _read_parquet_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a landed target, or None when NOTHING has landed yet.

    Only a genuinely missing path counts as first-batch; any other read
    failure (corrupt footer, permission, transient FS error) re-raises —
    treating those as "first batch" would make the next merge overwrite the
    target with only the current micro-batch, i.e. silent data loss."""
    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        cond = getattr(e, "getCondition", e.getErrorClass)()
        if cond == "PATH_NOT_FOUND":
            return None
        raise


class ParquetUpsertTarget:
    """Keyed-upsert semantics over a parquet directory — the hermetic
    stand-in proving the merge algebra ``jdbc_batch_writer`` runs against a
    real database: delete-matching-keys then insert, per batch — INCLUDING
    the same ``_one_row_per_key`` staging reduction, so the tested algebra
    is the shipped algebra.

    ``upsert`` is a drop-in foreachBatch body. The merged frame is
    materialized (localCheckpoint) BEFORE the overwrite so the write never
    reads the directory it is replacing. Parquet has no transactions, so
    unlike the JDBC path this stand-in is only crash-atomic per Spark's
    file-commit protocol — it exists to verify the key algebra (replay
    idempotence, update-wins), not the transaction mechanics."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str = "gps_id",
        order_cols: tuple[str, ...] | None = None,
    ):
        self.spark, self.path, self.key = spark, path, key
        self.order_cols = order_cols

    def _existing(self) -> DataFrame | None:
        return _read_parquet_or_none(self.spark, self.path)

    def upsert(self, batch_df: DataFrame, batch_id: int) -> None:
        batch = _one_row_per_key(batch_df, self.key, self.order_cols).localCheckpoint()
        existing = self._existing()
        if existing is not None:
            kept = existing.join(batch.select(self.key), self.key, "left_anti")
            merged = kept.unionByName(batch).localCheckpoint()
        else:
            merged = batch
        merged.write.mode("overwrite").parquet(self.path)


def latest_per_key(
    df: DataFrame, key: str, order_cols: tuple[str, ...]
) -> DataFrame:
    """Latest change per key under a total (desc) order — the reduction at
    the heart of changelog→snapshot materialization (q86's window, factored
    out so batch and streaming share it). One shuffle on the key."""
    w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


class ChangelogSnapshotTarget(ParquetUpsertTarget):
    """Streaming form of q86_cdc_snapshot_upsert: a foreachBatch body that
    maintains a keyed snapshot from a CDC changelog.

    The landed parquet holds the latest change per key INCLUDING delete
    tombstones (op='d'); ``snapshot()`` filters them out. Keeping tombstones
    makes the merge a pure latest-per-key reduction over
    (existing ∪ micro-batch) — idempotent under micro-batch replay and
    robust to out-of-order keys ACROSS batches, because a stale replayed
    change loses the (ts, tiebreak) ordering against the retained row
    instead of resurrecting a deleted key. This is the same tombstone
    retention a log-compacted topic or LSM store uses.

    At scale the rewrite-the-target stand-in becomes MERGE INTO on a
    key-partitioned table; the reduction itself stays one shuffle on the
    key with single-row per-key state."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str = "device_id",
        order_cols: tuple[str, ...] = ("ts", "gps_id"),
        op_col: str = "op",
    ):
        super().__init__(spark, path, key)
        self.order_cols, self.op_col = order_cols, op_col

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.localCheckpoint()
        existing = self._existing()
        union = existing.unionByName(batch) if existing is not None else batch
        latest = latest_per_key(union, self.key, self.order_cols).localCheckpoint()
        latest.write.mode("overwrite").parquet(self.path)

    def snapshot(self) -> DataFrame:
        """The upserted view: latest change per key, deletes removed."""
        return self.spark.read.parquet(self.path).filter(
            F.col(self.op_col) != "d"
        )


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


class Scd2Target:
    """Streaming form of q114_scd2_history: a foreachBatch body maintaining
    a type-2 (versioned validity intervals) dimension from a keyed change
    stream.

    The landed parquet retains the full CHANGE SET (SCD2 is by definition
    the whole history); each merge deduplicates (key, order) across
    existing ∪ micro-batch and re-derives version/valid_to with one lead
    window — so replayed micro-batches are no-ops and out-of-order changes
    ACROSS batches splice into the correct interval position instead of
    appending a wrong-order version.

    The overwrite-the-target parquet is the hermetic stand-in (same policy
    as ChangelogSnapshotTarget); against a warehouse the merge touches only
    affected keys' open intervals via MERGE, and the interval derivation
    stays one shuffle on the key."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str = "user_id",
        order_cols: tuple[str, ...] = ("ts", "event_id"),
        value_col: str = "value",
    ):
        self.spark, self.path = spark, path
        self.key, self.order_cols, self.value_col = key, order_cols, value_col

    def _changes(self) -> DataFrame | None:
        existing = _read_parquet_or_none(self.spark, self.path)
        if existing is None:
            return None
        return existing.select(self.key, *self.order_cols, self.value_col)

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select(
            self.key, *self.order_cols, self.value_col
        ).localCheckpoint()
        existing = self._changes()
        union = existing.unionByName(batch) if existing is not None else batch
        changes = union.dropDuplicates([self.key, *self.order_cols])
        w = Window.partitionBy(self.key).orderBy(*self.order_cols)
        ts0 = self.order_cols[0]
        hist = changes.select(
            self.key,
            *self.order_cols,
            self.value_col,
            F.row_number().over(w).cast("bigint").alias("version"),
            F.col(ts0).alias("valid_from"),
            F.lead(ts0).over(w).alias("valid_to"),
            F.lead(ts0).over(w).isNull().alias("is_current"),
        ).localCheckpoint()
        hist.write.mode("overwrite").parquet(self.path)

    def history(self) -> DataFrame:
        return self.spark.read.parquet(self.path)
