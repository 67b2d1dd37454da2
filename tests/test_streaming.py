"""Pipeline-semantics tests (SURVEY.md §5.2 items 2-3).

Feed synthetic GPS JSON and Debezium envelopes (FIXTURES.md A1/A3 shapes)
through the streaming graphs using file sources + availableNow triggers, and
assert the landed rows match what the reference's Go pipeline would insert —
including WKT lon-lat ordering and the id/deviceId renames. Failure paths:
malformed JSON routed (not crash), CDC replays deduped.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from stream_cdc_gps_spark.streaming import pipeline as P
from stream_cdc_gps_spark.streaming import transforms as X


def gps_fix(ts: str, dev: str, lat: float, lon: float) -> str:
    return json.dumps(
        {
            "location": {
                "timestamp": ts,
                "coords": {
                    "latitude": lat,
                    "longitude": lon,
                    "accuracy": 5.0,
                    "speed": 12.4,
                    "heading": 87.5,
                    "altitude": 1200.0,
                },
            },
            "device_id": dev,
        }
    )


def debezium_event(op: str, id_: str, lat: float, lon: float, ts_ms: int) -> str:
    return json.dumps(
        {
            "op": op,
            "before": None,
            "after": {"id": id_, "latitude": lat, "longitude": lon},
            "source": {"table": "gps-data"},
            "ts_ms": ts_ms,
        }
    )


@pytest.fixture()
def gps_lines(spark):
    rows = [
        gps_fix("2026-02-06T10:15:30.123Z", "dev-042", 35.6892, 51.3890),
        gps_fix("2026-02-06T10:15:31.000Z", "dev-007", 48.8566, 2.3522),
        "{not valid json",
        json.dumps({"unexpected": "shape"}),
    ]
    return spark.createDataFrame([(r,) for r in rows], "value string")


def test_ingest_graph_flatten_and_envelope(spark, gps_lines):
    """A: parse -> flatten (id/deviceId renames) -> in-band-schema envelope."""
    out = P.ingest_graph(gps_lines).collect()
    assert len(out) == 2  # two valid fixes
    by_key = {r["key"]: json.loads(r["value"]) for r in out}
    assert set(by_key) == {"address-dev-042", "address-dev-007"}
    env = by_key["address-dev-042"]
    # envelope schema block exactly as the reference builds it (cmd/main.go:111-124)
    assert env["schema"]["type"] == "struct"
    assert [f["field"] for f in env["schema"]["fields"]] == [
        "id", "deviceId", "heading", "speed", "accuracy", "altitude",
        "latitude", "longitude",
    ]
    assert [f["type"] for f in env["schema"]["fields"]] == ["string"] * 2 + ["float"] * 6
    # renames: location.timestamp -> id, device_id -> deviceId (cmd/main.go:103-104)
    assert env["payload"]["id"] == "2026-02-06T10:15:30.123Z"
    assert env["payload"]["deviceId"] == "dev-042"
    assert env["payload"]["latitude"] == 35.6892


def test_rejects_routed_not_dropped(spark, gps_lines):
    """Malformed payloads surface on the dead-letter branch (vs HTTP 400)."""
    rejects = P.rejects_graph(gps_lines).collect()
    assert len(rejects) == 2
    assert {r["value"] for r in rejects} == {
        "{not valid json",
        json.dumps({"unexpected": "shape"}),
    }


def test_envelope_roundtrip(spark, gps_lines):
    """B: envelope encode -> decode lands the exact flat row."""
    env = P.ingest_graph(gps_lines).select("value")
    flat = P.landing_graph(env).orderBy("deviceId").collect()
    assert [r["deviceId"] for r in flat] == ["dev-007", "dev-042"]
    r = flat[1]
    assert (r["id"], r["latitude"], r["longitude"]) == (
        "2026-02-06T10:15:30.123Z", 35.6892, 51.3890,
    )


def test_cdc_graph_insert_only_and_wkt(spark):
    """C: after-image extraction + WKT landing, insert-only semantics."""
    rows = [
        debezium_event("c", "2026-02-06T10:15:30.123Z", 35.6892, 51.3890, 1_000),
        debezium_event("u", "2026-02-06T10:15:31.000Z", 48.8566, 2.3522, 2_000),
        debezium_event("d", "2026-02-06T10:15:32.000Z", 1.0, 2.0, 3_000),
        "junk{",
    ]
    df = spark.createDataFrame([(r,) for r in rows], "value string")
    landed = P.cdc_graph(df).orderBy("gps_id").collect()
    # insert-only mode mirrors the reference: op ignored, all after-images land
    assert len(landed) == 3
    r = landed[0]
    assert r["gps_id"] == "2026-02-06T10:15:30.123Z"
    # WKT lon FIRST with %f (6 decimals), per cmd/main.go:210
    assert r["geo_point"] == "POINT(51.389000 35.689200)"
    assert (r["latitude"], r["longitude"]) == (35.6892, 51.3890)
    # full-CDC mode excludes deletes and keeps op
    full = P.cdc_graph(df, insert_only=False).collect()
    assert len(full) == 2


def test_cdc_replay_dedup(spark):
    """Replayed change events collapse on the record id."""
    e = debezium_event("c", "id-1", 10.0, 20.0, 1_000)
    df = spark.createDataFrame([(e,), (e,), (e,)], "value string")
    assert P.cdc_graph(df, dedup=True).count() == 1
    assert P.cdc_graph(df, dedup=False).count() == 3


def test_cdc_streaming_dedup_is_watermark_bounded(spark, tmp_path):
    """On a STREAMING source, cdc_graph's replay dedup must be
    dropDuplicatesWithinWatermark under an event-time watermark — plain
    dropDuplicates would hold unbounded state on a long-running deployment."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "b.jsonl").write_text(
        debezium_event("c", "id-1", 1.0, 2.0, 1_600_000_000_000)
    )
    stream = spark.readStream.schema("value string").format("text").load(str(src))
    plan = str(P.cdc_graph(stream)._jdf.queryExecution().analyzed())
    assert "DeduplicateWithinWatermark" in plan
    assert "EventTimeWatermark" in plan


def test_streaming_file_source_end_to_end(spark, tmp_path):
    """The SAME graph runs as a real stream: file source -> availableNow ->
    checkpointed parquet sink; output equals the batch run of the graph."""
    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    # realistic wall-clock ts_ms (Debezium semantics): an event at exactly
    # epoch 0 would equal the initial watermark and be dropped as late —
    # a boundary that real CDC streams never sit on
    base_ms = 1_600_000_000_000
    lines = [
        debezium_event("c", f"id-{i}", 30.0 + i, 50.0 + i, base_ms + 1_000 * i)
        for i in range(10)
    ] + [debezium_event("c", "id-3", 33.0, 53.0, base_ms + 3_000), "garbage["]
    (src / "batch0.jsonl").write_text("\n".join(lines))

    stream = spark.readStream.schema("value string").format("text").load(str(src))
    assert stream.isStreaming
    q = (
        P.cdc_graph(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not terminate"

    landed = spark.read.parquet(str(out))
    assert landed.count() == 10  # replayed id-3 deduped, garbage dropped
    assert set(landed.columns) == {"gps_id", "geo_point", "latitude", "longitude"}
    # restart with same checkpoint: no new input -> no duplicate output
    q2 = (
        P.cdc_graph(spark.readStream.schema("value string").format("text").load(str(src)))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(300), "stream did not terminate"
    assert spark.read.parquet(str(out)).count() == 10


def test_watermarked_dedup_streaming_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark path: duplicates across micro-batches
    within the delay are suppressed; state is watermark-bounded."""
    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ck"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        "\n".join(
            [
                json.dumps({"id": "a", "ts": "2026-02-06 10:00:00"}),
                json.dumps({"id": "a", "ts": "2026-02-06 10:00:01"}),
                json.dumps({"id": "b", "ts": "2026-02-06 10:00:02"}),
            ]
        )
    )
    stream = (
        spark.readStream.schema("value string").format("text").load(str(src))
        .select(F.from_json("value", "id string, ts string").alias("m"))
        .select("m.id", F.col("m.ts").cast("timestamp").alias("ts"))
    )
    deduped = X.dedup_replays(stream, id_col="id", ts_col="ts", delay="1 hour")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not terminate"
    got = {r["id"] for r in spark.read.parquet(str(out)).collect()}
    assert got == {"a", "b"}
    assert spark.read.parquet(str(out)).count() == 2


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Stream-stream inner join with watermarks + event-time range bound
    (SURVEY.md §2B joins table): fixes enriched by commands issued to the
    device within the preceding 10 minutes."""
    fixes_dir = tmp_path / "fixes"
    cmds_dir = tmp_path / "cmds"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    fixes_dir.mkdir()
    cmds_dir.mkdir()
    (fixes_dir / "f.jsonl").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"device_id": "A", "fix_ts": "2026-02-06 10:05:00", "lat": 1.0},
                {"device_id": "A", "fix_ts": "2026-02-06 10:30:00", "lat": 2.0},
                {"device_id": "B", "fix_ts": "2026-02-06 10:06:00", "lat": 3.0},
            ]
        )
    )
    (cmds_dir / "c.jsonl").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"device_id": "A", "cmd_ts": "2026-02-06 10:00:00", "cmd": "ping"},
                {"device_id": "B", "cmd_ts": "2026-02-06 09:00:00", "cmd": "old"},
            ]
        )
    )

    def src(path, schema):
        return (
            spark.readStream.schema("value string").format("text").load(str(path))
            .select(F.from_json("value", schema).alias("m")).select("m.*")
        )

    fixes = src(fixes_dir, "device_id string, fix_ts string, lat double").select(
        "device_id", F.col("fix_ts").cast("timestamp").alias("fix_ts"), "lat"
    ).withWatermark("fix_ts", "1 hour")
    cmds = src(cmds_dir, "device_id string, cmd_ts string, cmd string").select(
        F.col("device_id").alias("cmd_device"),
        F.col("cmd_ts").cast("timestamp").alias("cmd_ts"),
        "cmd",
    ).withWatermark("cmd_ts", "1 hour")

    joined = fixes.join(
        cmds,
        (F.col("device_id") == F.col("cmd_device"))
        & (F.col("cmd_ts") <= F.col("fix_ts"))
        & (F.col("cmd_ts") >= F.col("fix_ts") - F.expr("INTERVAL 10 MINUTES")),
    ).select("device_id", "fix_ts", "lat", "cmd", "cmd_ts")

    q = (
        joined.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ck))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not terminate"
    got = spark.read.parquet(str(out)).collect()
    # only A@10:05 is within 10 min of A's 10:00 ping; B's cmd is 66 min stale
    assert len(got) == 1
    assert (got[0]["device_id"], got[0]["lat"], got[0]["cmd"]) == ("A", 1.0, "ping")


def test_foreachbatch_sink_idempotent_shape(spark, tmp_path):
    """foreachBatch landing (the JDBC-sink shape, reference connector.json):
    each micro-batch lands atomically per batch_id; the same callable drives
    df.write.jdbc in production."""
    src = tmp_path / "in"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    src.mkdir()
    (src / "b.jsonl").write_text(
        "\n".join(
            json.dumps({"id": f"id-{i}", "latitude": 1.0 * i, "longitude": 2.0 * i})
            for i in range(4)
        )
    )
    stream = (
        spark.readStream.schema("value string").format("text").load(str(src))
        .select(F.from_json("value", "id string, latitude double, longitude double").alias("m"))
        .select("m.*")
    )
    landed = X.location_instances(stream)

    seen_batches = []

    def write_batch(batch_df, batch_id):
        seen_batches.append(batch_id)
        batch_df.write.mode("append").parquet(str(out))

    q = (
        landed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not terminate"
    assert len(seen_batches) >= 1
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 4
    assert {r["gps_id"] for r in rows} == {f"id-{i}" for i in range(4)}


def test_windowed_agg_drops_late_data(spark, tmp_path):
    """Tumbling-window agg with watermark: a record arriving after the
    watermark passed its window's end is dropped; finalized windows emit
    exactly once in append mode.

    Two availableNow runs over one checkpoint = two micro-batches with the
    watermark persisted between them (exactly how an incremental production
    job advances)."""
    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ck"
    src.mkdir()

    def run_batch():
        stream = (
            spark.readStream.schema("value string")
            .format("text")
            .load(str(src))
            .select(F.from_json("value", "dev string, ts string").alias("m"))
            .select("m.dev", F.col("m.ts").cast("timestamp").alias("ts"))
        )
        counts = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("win"), "dev")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            counts.writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not terminate"

    (src / "b0.jsonl").write_text(
        "\n".join(
            [
                json.dumps({"dev": "d1", "ts": "2026-02-06 10:00:10"}),
                json.dumps({"dev": "d1", "ts": "2026-02-06 10:04:50"}),
                json.dumps({"dev": "d1", "ts": "2026-02-06 10:20:00"}),  # advances wm
            ]
        )
    )
    run_batch()  # after this run the committed watermark is 10:10
    (src / "b1.jsonl").write_text(
        "\n".join(
            [
                # late: watermark 10:10 already passed window [10:00,10:05)
                json.dumps({"dev": "d1", "ts": "2026-02-06 10:01:00"}),
                json.dumps({"dev": "d1", "ts": "2026-02-06 10:21:00"}),
            ]
        )
    )
    run_batch()

    rows = spark.read.parquet(str(out)).collect()
    emitted = {(r["win"]["start"].strftime("%H:%M"), r["n"]) for r in rows}
    # only the [10:00,10:05) window finalized; late 10:01 record NOT counted
    assert emitted == {("10:00", 2)}


def test_sliding_window_streaming_matches_batch(spark, tmp_path):
    """Sliding window (1h width / 15m slide) under a watermark runs
    incrementally and lands the same windows a batch groupBy(window)
    produces — the streaming form of q97's operator."""
    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ck"
    src.mkdir()
    rows = [
        {"device_id": "dev-1", "ts": "2026-02-06 10:05:00"},
        {"device_id": "dev-1", "ts": "2026-02-06 10:20:00"},
        {"device_id": "dev-1", "ts": "2026-02-06 11:40:00"},
        {"device_id": "dev-2", "ts": "2026-02-06 10:50:00"},
    ]
    (src / "b0.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    # append mode only emits a window once the watermark passes its END, and
    # the watermark advances at batch boundaries — two late sentinel files
    # (one per trigger via maxFilesPerTrigger=1) push it past every real
    # window; the sentinels' own windows stay unemitted and are excluded
    (src / "b1.jsonl").write_text(
        json.dumps({"device_id": "flush", "ts": "2026-02-06 23:00:00"})
    )
    (src / "b2.jsonl").write_text(
        json.dumps({"device_id": "flush", "ts": "2026-02-06 23:01:00"})
    )

    def graph(df):
        typed = (
            df.select(F.from_json("value", "device_id string, ts string").alias("m"))
            .select("m.device_id", F.col("m.ts").cast("timestamp").alias("ts"))
        )
        return (
            typed.withWatermark("ts", "10 minutes")
            .groupBy("device_id", F.window("ts", "1 hour", "15 minutes").alias("win"))
            .agg(F.count(F.lit(1)).alias("n_fixes"))
            .select("device_id", F.col("win.start").alias("ws"), "n_fixes")
        )

    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .format("text")
        .load(str(src))
    )
    q = (
        graph(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not terminate"

    batch_src = spark.read.format("text").load(str(src))
    expected = sorted(
        (r["device_id"], r["ws"], r["n_fixes"])
        for r in graph(batch_src).collect()
        if r["device_id"] != "flush"
    )
    got = sorted(
        (r["device_id"], r["ws"], r["n_fixes"])
        for r in spark.read.parquet(str(out)).collect()
        if r["device_id"] != "flush"
    )
    # each fix falls into exactly width/slide = 4 windows
    assert len(expected) > 0
    assert got == expected


def test_upsert_writer_replay_is_idempotent(spark, tmp_path):
    """The keyed-upsert foreachBatch writer (jdbc_batch_writer's merge
    algebra, exercised through the hermetic ParquetUpsertTarget): replaying
    a micro-batch after a restart must NOT double-insert — the reference's
    crash failure mode (cmd/main.go:225) the engine claims to fix."""
    out = tmp_path / "tgt"
    target = P.ParquetUpsertTarget(spark, str(out), key="gps_id")

    b0 = spark.createDataFrame(
        [("id-1", 1.0, 2.0), ("id-2", 3.0, 4.0)],
        "gps_id string, latitude double, longitude double",
    )
    target.upsert(b0, 0)
    assert spark.read.parquet(str(out)).count() == 2

    # restart replays the SAME batch (offsets committed, work lost): the
    # keyed merge deletes-then-reinserts the same keys -> no duplicates
    target.upsert(b0, 0)
    landed = spark.read.parquet(str(out))
    assert landed.count() == 2
    assert {r["gps_id"] for r in landed.collect()} == {"id-1", "id-2"}

    # a later batch UPDATING id-2 and inserting id-3: update wins, no dup
    b1 = spark.createDataFrame(
        [("id-2", 30.0, 40.0), ("id-3", 5.0, 6.0)],
        "gps_id string, latitude double, longitude double",
    )
    target.upsert(b1, 1)
    rows = {r["gps_id"]: r["latitude"] for r in spark.read.parquet(str(out)).collect()}
    assert rows == {"id-1": 1.0, "id-2": 30.0, "id-3": 5.0}


def test_upsert_writer_streaming_restart_no_duplicates(spark, tmp_path):
    """End-to-end: cdc_graph -> foreachBatch(ParquetUpsertTarget.upsert)
    under availableNow, then a SECOND run with the checkpoint DELETED (the
    worst-case restart: all offsets replayed). Keyed upsert lands the same
    rows, not twice."""
    src = tmp_path / "in"
    out = tmp_path / "tgt"
    src.mkdir()
    base_ms = 1_600_000_000_000
    (src / "b.jsonl").write_text(
        "\n".join(
            debezium_event("c", f"id-{i}", 30.0 + i, 50.0 + i, base_ms + 1_000 * i)
            for i in range(6)
        )
    )
    target = P.ParquetUpsertTarget(spark, str(out), key="gps_id")

    def run(ck: str) -> None:
        stream = spark.readStream.schema("value string").format("text").load(str(src))
        q = (
            P.cdc_graph(stream)
            .writeStream.foreachBatch(target.upsert)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not terminate"

    run("ck1")
    assert spark.read.parquet(str(out)).count() == 6
    run("ck2")  # fresh checkpoint = full replay of the topic
    landed = spark.read.parquet(str(out))
    assert landed.count() == 6
    assert {r["gps_id"] for r in landed.collect()} == {f"id-{i}" for i in range(6)}


def test_merge_statements_algebra():
    """The DELETE+INSERT transaction body the JDBC path executes."""
    stmts = P.merge_statements("location_instances", "location_instances__stage", "gps_id")
    assert stmts == [
        "DELETE FROM location_instances WHERE gps_id IN "
        "(SELECT gps_id FROM location_instances__stage)",
        "INSERT INTO location_instances SELECT * FROM location_instances__stage",
    ]


def test_changelog_snapshot_streaming_matches_batch(spark, tmp_path):
    """Streaming form of q86 (changelog -> keyed snapshot upsert): the same
    changelog fed as two micro-batches through
    foreachBatch(ChangelogSnapshotTarget.merge) under availableNow lands the
    snapshot the batch latest-per-key reduction computes over the whole
    changelog — c/u rows upserted, keys whose latest op is 'd' gone — and a
    full replay (fresh checkpoint) is a no-op."""
    src = tmp_path / "in"
    tgt = tmp_path / "tgt"
    src.mkdir()
    schema = "device_id string, gps_id long, ts string, lat double, lon double, op string"
    b0 = [
        {"device_id": "A", "gps_id": 1, "ts": "2026-02-06 10:00:00", "lat": 1.0, "lon": 2.0, "op": "c"},
        {"device_id": "B", "gps_id": 2, "ts": "2026-02-06 10:00:05", "lat": 3.0, "lon": 4.0, "op": "c"},
        {"device_id": "A", "gps_id": 3, "ts": "2026-02-06 10:01:00", "lat": 1.5, "lon": 2.5, "op": "u"},
        {"device_id": "C", "gps_id": 4, "ts": "2026-02-06 10:01:30", "lat": 9.0, "lon": 9.0, "op": "c"},
    ]
    b1 = [
        {"device_id": "B", "gps_id": 5, "ts": "2026-02-06 10:02:00", "lat": 3.5, "lon": 4.5, "op": "u"},
        {"device_id": "C", "gps_id": 6, "ts": "2026-02-06 10:02:30", "lat": 0.0, "lon": 0.0, "op": "d"},
        {"device_id": "A", "gps_id": 7, "ts": "2026-02-06 10:03:00", "lat": 1.9, "lon": 2.9, "op": "u"},
    ]
    (src / "b0.jsonl").write_text("\n".join(json.dumps(r) for r in b0))
    (src / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in b1))

    target = P.ChangelogSnapshotTarget(spark, str(tgt))

    def run(ck: str) -> None:
        stream = (
            spark.readStream.schema("value string")
            .option("maxFilesPerTrigger", "1")  # two real micro-batches
            .format("text")
            .load(str(src))
            .select(F.from_json("value", schema).alias("m"))
            .select("m.*")
        )
        q = (
            stream.writeStream.foreachBatch(target.merge)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not terminate"

    run("ck1")

    # golden: batch latest-per-key over the WHOLE changelog, deletes dropped
    full = spark.createDataFrame(
        [tuple(r[c] for c in ["device_id", "gps_id", "ts", "lat", "lon", "op"]) for r in b0 + b1],
        schema,
    )
    golden = sorted(
        (r["device_id"], r["gps_id"], r["lat"], r["lon"])
        for r in P.latest_per_key(full, "device_id", ("ts", "gps_id"))
        .filter(F.col("op") != "d")
        .collect()
    )
    got = sorted(
        (r["device_id"], r["gps_id"], r["lat"], r["lon"])
        for r in target.snapshot().collect()
    )
    assert got == golden
    assert [g[0] for g in got] == ["A", "B"]  # C deleted by its tombstone

    # worst-case restart: fresh checkpoint replays the whole changelog;
    # tombstone retention makes the merge idempotent (C stays deleted)
    run("ck2")
    assert sorted(
        (r["device_id"], r["gps_id"], r["lat"], r["lon"])
        for r in target.snapshot().collect()
    ) == golden


def test_scd2_streaming_matches_batch(spark, tmp_path):
    """Streaming form of q114 (SCD2 history): changes fed as two
    micro-batches (with one out-of-order change in the second) land the
    same versioned validity intervals as the one-shot batch window over
    the whole change set, and a full replay (fresh checkpoint) is a
    no-op."""
    src = tmp_path / "in"
    tgt = str(tmp_path / "tgt")
    src.mkdir()
    schema = "user_id long, ts string, event_id long, value double"
    b0 = [
        {"user_id": 1, "ts": "2026-02-06 10:00:00", "event_id": 1, "value": 10.0},
        {"user_id": 1, "ts": "2026-02-06 11:00:00", "event_id": 2, "value": 20.0},
        {"user_id": 2, "ts": "2026-02-06 10:30:00", "event_id": 3, "value": 5.0},
    ]
    b1 = [
        # out-of-order: splices BETWEEN user 1's two existing versions
        {"user_id": 1, "ts": "2026-02-06 10:30:00", "event_id": 4, "value": 15.0},
        {"user_id": 2, "ts": "2026-02-06 12:00:00", "event_id": 5, "value": 6.0},
    ]
    (src / "b0.jsonl").write_text("\n".join(json.dumps(r) for r in b0))
    (src / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in b1))

    target = P.Scd2Target(spark, tgt)

    def run(ck: str) -> None:
        stream = (
            spark.readStream.schema("value string")
            .option("maxFilesPerTrigger", "1")
            .format("text")
            .load(str(src))
            .select(F.from_json("value", schema).alias("m"))
            .select("m.*")
        )
        q = (
            stream.writeStream.foreachBatch(target.merge)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not terminate"

    run("ck1")

    def canon(df):
        return sorted(
            (r.user_id, r.version, r.value, r.valid_from, r.valid_to, r.is_current)
            for r in df.collect()
        )

    from pyspark.sql import Window

    full = spark.createDataFrame(
        [tuple(r[c] for c in ["user_id", "ts", "event_id", "value"]) for r in b0 + b1],
        schema,
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    golden = full.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("version"),
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )
    got = target.history().select(
        "user_id", "version", "value", "valid_from", "valid_to", "is_current"
    )
    assert canon(got) == canon(golden)
    # the out-of-order change became version 2 of user 1, closing at 11:00
    v2 = [r for r in got.collect() if r.user_id == 1 and r.version == 2][0]
    assert v2.value == 15.0 and v2.valid_to == "2026-02-06 11:00:00"
    # replay from scratch: identical target (idempotent)
    run("ck2")
    assert canon(target.history().select(
        "user_id", "version", "value", "valid_from", "valid_to", "is_current"
    )) == canon(golden)


def test_upsert_batch_with_duplicate_keys_latest_wins(spark, tmp_path):
    """A CDC micro-batch routinely carries several changes per key; with
    order_cols the staged reduction keeps the LATEST change (ADVICE r3:
    previously the stand-in silently dropDuplicates'd while the JDBC path
    staged duplicates — now both run the same _one_row_per_key)."""
    out = tmp_path / "tgt"
    target = P.ParquetUpsertTarget(
        spark, str(out), key="gps_id", order_cols=("ts",)
    )
    b0 = spark.createDataFrame(
        [("id-1", 1, 10.0), ("id-1", 3, 30.0), ("id-1", 2, 20.0), ("id-2", 1, 5.0)],
        "gps_id string, ts bigint, latitude double",
    )
    target.upsert(b0, 0)
    rows = {r["gps_id"]: (r["ts"], r["latitude"])
            for r in spark.read.parquet(str(out)).collect()}
    assert rows == {"id-1": (3, 30.0), "id-2": (1, 5.0)}
    # replay: still one row per key, same values
    target.upsert(b0, 0)
    assert spark.read.parquet(str(out)).count() == 2


def test_upsert_duplicate_keys_without_order_fails_loudly(spark, tmp_path):
    """No order column -> no deterministic winner -> duplicate keys must
    raise, not silently pick a row."""
    target = P.ParquetUpsertTarget(spark, str(tmp_path / "tgt"), key="gps_id")
    dup = spark.createDataFrame(
        [("id-1", 10.0), ("id-1", 20.0)], "gps_id string, latitude double"
    )
    with pytest.raises(ValueError, match="2 rows for gps_id='id-1'"):
        target.upsert(dup, 0)


def test_upsert_null_keys_fail_loudly_even_when_distinct(spark, tmp_path):
    """NULL keys can neither match nor be matched by the keyed merge
    predicate, so they are rejected explicitly — and rows that are all
    distinct except for a NULL key must NOT be mis-reported as duplicates
    (the old count_distinct check ignored NULLs and did exactly that;
    ADVICE r4)."""
    target = P.ParquetUpsertTarget(spark, str(tmp_path / "tgt"), key="gps_id")
    nulled = spark.createDataFrame(
        [("id-1", 10.0), (None, 20.0)], "gps_id string, latitude double"
    )
    with pytest.raises(ValueError, match="NULL 'gps_id' keys"):
        target.upsert(nulled, 0)


def test_upsert_corrupt_target_raises_not_overwrites(spark, tmp_path):
    """Only PATH_NOT_FOUND means first-batch; a corrupt landed target must
    re-raise instead of being treated as empty — the 'treat any read error
    as first batch' behavior silently overwrote the table with one
    micro-batch (ADVICE r3)."""
    out = tmp_path / "tgt"
    out.mkdir()
    (out / "part-00000.parquet").write_text("this is not parquet")
    target = P.ParquetUpsertTarget(spark, str(out), key="gps_id")
    b0 = spark.createDataFrame([("id-1", 1.0)], "gps_id string, latitude double")
    with pytest.raises(Exception):
        target.upsert(b0, 0)
    # the garbage file must still be there — nothing overwrote the target
    assert (out / "part-00000.parquet").read_text() == "this is not parquet"


def test_incremental_lsh_streaming_matches_batch(spark, tmp_path):
    """Streaming form of q177 (incremental MinHash-LSH dedup): documents
    fed as two micro-batches through foreachBatch(IncrementalLshIndex.merge)
    under availableNow land the same candidate pairs as the all-at-once
    q53 batch plan over the full corpus, and a full replay (fresh
    checkpoint) is a no-op."""
    from stream_cdc_gps_spark.operators.dedup import (
        MAX_POSTING,
        band_tuples_of,
        bucket_pair_expand,
    )
    from stream_cdc_gps_spark.streaming.dedup_index import IncrementalLshIndex

    src = tmp_path / "in"
    src.mkdir()
    # near-dup family split ACROSS the two batches (docs 1/2 in b0, their
    # near-identical sibling 3 in b1) so cross-batch pairing is exercised
    b0 = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 2, "text": "the quick brown fox jumps over the lazy dog today"},
        {"doc_id": 4, "text": "completely different material about spark engines"},
    ]
    b1 = [
        {"doc_id": 3, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 5, "text": "completely different material about spark engines here"},
    ]
    (src / "b0.jsonl").write_text("\n".join(json.dumps(r) for r in b0))
    (src / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in b1))

    idx = IncrementalLshIndex(spark, str(tmp_path / "idx"))
    schema = "doc_id long, text string"

    def run(ck: str) -> None:
        stream = (
            spark.readStream.schema("value string")
            .option("maxFilesPerTrigger", "1")  # two real micro-batches
            .format("text")
            .load(str(src))
            .select(F.from_json("value", schema).alias("m"))
            .select("m.*")
        )
        q = (
            stream.writeStream.foreachBatch(idx.merge)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not terminate"

    run("ck1")

    # golden: the q53 batch plan over the WHOLE corpus
    full = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in b0 + b1], schema
    )
    bands = band_tuples_of(full)
    buckets = (
        bands.groupBy("band", "band_key")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= MAX_POSTING))
    )
    golden = sorted(
        (r.doc_a, r.doc_b, r.n_shared_bands)
        for r in bucket_pair_expand(buckets)
        .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        .collect()
    )
    got = sorted(
        (r.doc_a, r.doc_b, r.n_shared_bands) for r in idx.pairs().collect()
    )
    assert got == golden
    # docs 1 and 3 are byte-identical -> they must pair on every band
    assert (1, 3, 3) in got

    # worst-case restart: fresh checkpoint replays every micro-batch;
    # distinct-keyed merges make it a no-op
    run("ck2")
    assert sorted(
        (r.doc_a, r.doc_b, r.n_shared_bands) for r in idx.pairs().collect()
    ) == golden


def test_incremental_lsh_cap_crossing_retracts(spark, tmp_path):
    """The MAX_POSTING semantics q177's parity depends on: a bucket that
    crosses the cap when a later batch lands has its previously-emitted
    collisions RETRACTED (and never emits again), exactly matching the
    all-at-once plan's final-size cap."""
    from stream_cdc_gps_spark.streaming.dedup_index import IncrementalLshIndex

    schema = "doc_id long, text string"
    text = "identical bucket stuffing text repeated verbatim each time"
    mk = lambda ids: spark.createDataFrame([(i, text) for i in ids], schema)

    idx = IncrementalLshIndex(spark, str(tmp_path / "idx"), max_posting=2)
    idx.merge(mk([1, 2]), 0)
    # two identical docs share all 3 bands; bucket size 2 == cap -> alive
    assert sorted(
        (r.doc_a, r.doc_b, r.n_shared_bands) for r in idx.pairs().collect()
    ) == [(1, 2, 3)]
    # third identical doc pushes every shared bucket past the cap
    idx.merge(mk([3]), 1)
    assert idx.pairs().count() == 0
    # dead buckets stay dead: a fourth arrival emits nothing either
    idx.merge(mk([4]), 2)
    assert idx.pairs().count() == 0


def test_incremental_lsh_partial_write_crash_self_heals(spark, tmp_path):
    """merge() writes postings THEN collisions; a crash between the two
    leaves the index with updated postings but stale collisions. Because
    each merge re-expands the FULL contents of every affected bucket (not
    old-docs x new-docs), replaying the same micro-batch repairs the
    collision store — the property that makes the two-directory state
    safe without a cross-directory transaction."""
    import shutil

    from stream_cdc_gps_spark.streaming.dedup_index import IncrementalLshIndex

    schema = "doc_id long, text string"
    base = "alpha beta gamma delta epsilon zeta"
    b0 = spark.createDataFrame([(1, base), (2, base + " extra")], schema)
    b1 = spark.createDataFrame([(3, base)], schema)

    idx = IncrementalLshIndex(spark, str(tmp_path / "idx"))
    idx.merge(b0, 0)
    # snapshot the collision store, then land b1 and roll ONLY the
    # collision store back — the exact partial-write crash state
    shutil.copytree(idx.collisions_path, str(tmp_path / "coll_backup"))
    idx.merge(b1, 1)
    healthy = sorted(
        (r.doc_a, r.doc_b, r.n_shared_bands) for r in idx.pairs().collect()
    )
    shutil.rmtree(idx.collisions_path)
    shutil.copytree(str(tmp_path / "coll_backup"), idx.collisions_path)
    assert sorted(
        (r.doc_a, r.doc_b, r.n_shared_bands) for r in idx.pairs().collect()
    ) != healthy  # the crash state is genuinely inconsistent
    # checkpoint replay re-delivers b1: the merge must repair, not double
    idx.merge(b1, 1)
    assert sorted(
        (r.doc_a, r.doc_b, r.n_shared_bands) for r in idx.pairs().collect()
    ) == healthy


def test_incremental_lsh_merge_is_partition_local(spark, tmp_path):
    """r6 judge task #1: a merge rewrites ONLY the state partitions
    (pbucket= dirs) its batch's band keys hash into — every file in an
    untouched partition stays byte-identical, in BOTH stores. This is the
    property that makes per-merge I/O O(touched state) instead of
    O(corpus): at scale a micro-batch touches a bounded set of bucket
    shards, not the whole index."""
    import hashlib
    import os

    from stream_cdc_gps_spark.operators.dedup import band_tuples_of
    from stream_cdc_gps_spark.streaming.dedup_index import (
        IncrementalLshIndex,
        _pbucket,
    )

    schema = "doc_id long, text string"
    # 24 distinct docs spread band keys over many of the 16 partitions
    b0 = spark.createDataFrame(
        [
            (i, f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f common tail words")
            for i in range(24)
        ],
        schema,
    )
    # the second batch is ONE doc: its 3 band keys touch <= 3 partitions
    b1 = spark.createDataFrame(
        [(100, "w3a w3b w3c w3d w3e w3f common tail words")], schema
    )

    idx = IncrementalLshIndex(spark, str(tmp_path / "idx"), n_state_buckets=16)
    idx.merge(b0, 0)

    def digest(path: str) -> dict[str, str]:
        out = {}
        for root, _, files in os.walk(path):
            for f in files:
                if f.startswith(("_", ".")):
                    continue
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, path)] = hashlib.md5(
                        fh.read()
                    ).hexdigest()
        return out

    before = {s: digest(getattr(idx, s)) for s in ("postings_path", "collisions_path")}
    touched = {
        r["pbucket"]
        for r in band_tuples_of(b1)
        .withColumn("pbucket", _pbucket(16))
        .select("pbucket")
        .distinct()
        .collect()
    }
    assert len(touched) <= 3
    idx.merge(b1, 1)
    after = {s: digest(getattr(idx, s)) for s in ("postings_path", "collisions_path")}

    def pbucket_of(relpath: str) -> int:
        part = relpath.split(os.sep, 1)[0]
        assert part.startswith("pbucket=")
        return int(part.split("=", 1)[1])

    for store in ("postings_path", "collisions_path"):
        untouched = {
            k: v for k, v in before[store].items() if pbucket_of(k) not in touched
        }
        assert untouched, "test corpus failed to spread over >3 partitions"
        for k, v in untouched.items():
            assert after[store].get(k) == v, (
                f"{store} file {k} in an UNTOUCHED partition was rewritten"
            )
    # and the merge itself did its job: the new doc pairs with its twin
    assert (3, 100) in {
        (r.doc_a, r.doc_b) for r in idx.pairs().collect()
    }


def test_incremental_lsh_dead_bucket_state_is_bounded(spark, tmp_path):
    """r7 judge task #1: a bucket that crosses the cap is TOMBSTONED —
    its posting rows collapse to one tombstone and later arrivals in the
    same bucket land NOTHING, so a pathological boilerplate band_key holds
    O(1) state forever instead of accumulating every colliding doc_id in
    the corpus (the pre-r8 behavior: the cap gated emission, not
    accumulation)."""
    from stream_cdc_gps_spark.streaming.dedup_index import (
        _TOMBSTONE_DOC,
        IncrementalLshIndex,
    )

    schema = "doc_id long, text string"
    text = "identical bucket stuffing text repeated verbatim each time"
    mk = lambda ids: spark.createDataFrame([(i, text) for i in ids], schema)

    idx = IncrementalLshIndex(spark, str(tmp_path / "idx"), max_posting=2)
    idx.merge(mk([1, 2]), 0)
    posts = spark.read.parquet(idx.postings_path)
    # alive at the cap: 2 docs x 3 bands, no tombstones yet
    assert posts.count() == 6
    assert posts.filter(F.col("doc_id") == _TOMBSTONE_DOC).count() == 0

    # doc 3 pushes all 3 shared buckets past the cap -> each bucket's
    # postings are REPLACED by a single tombstone row
    idx.merge(mk([3]), 1)
    posts = spark.read.parquet(idx.postings_path)
    assert posts.count() == 3
    assert posts.filter(F.col("doc_id") == _TOMBSTONE_DOC).count() == 3

    # dead buckets refuse postings: many more identical docs change NOTHING
    for b, ids in enumerate([[4], [5, 6], [7, 8, 9]], start=2):
        idx.merge(mk(ids), b)
        posts = spark.read.parquet(idx.postings_path)
        assert posts.count() == 3, "dead-bucket postings grew"
        assert posts.filter(F.col("doc_id") == _TOMBSTONE_DOC).count() == 3
        assert idx.pairs().count() == 0

    # replaying the killing batch is also a no-op
    idx.merge(mk([3]), 1)
    assert spark.read.parquet(idx.postings_path).count() == 3
    assert idx.pairs().count() == 0

    # telemetry surfaces the tombstone state as numbers
    t = idx.telemetry().collect()[0]
    assert (t.posting_rows, t.live_buckets, t.dead_buckets) == (0, 0, 3)


def test_incremental_cms_streaming_matches_batch(spark, tmp_path):
    """Streaming CMS maintenance: documents fed as two micro-batches
    through foreachBatch(IncrementalCmsSketch.merge) produce EXACTLY the
    all-at-once batch counter matrix (CMS linearity), replay from a fresh
    checkpoint is a no-op (batch-id-partitioned idempotent sink), and
    point estimates stay admissible (>= true counts)."""
    from stream_cdc_gps_spark.streaming.cms_index import (
        IncrementalCmsSketch,
        batch_partial,
    )

    src = tmp_path / "in"
    src.mkdir()
    b0 = [
        {"doc_id": 1, "text": "spark counts tokens and tokens count spark"},
        {"doc_id": 2, "text": "a sketch of counts is a sketch of truth"},
    ]
    b1 = [
        {"doc_id": 3, "text": "tokens tokens tokens everywhere in spark"},
    ]
    (src / "b0.jsonl").write_text("\n".join(json.dumps(r) for r in b0))
    (src / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in b1))

    sk = IncrementalCmsSketch(spark, str(tmp_path / "cms"))
    schema = "doc_id long, text string"

    def run(ck: str) -> None:
        stream = (
            spark.readStream.schema("value string")
            .option("maxFilesPerTrigger", "1")
            .format("text")
            .load(str(src))
            .select(F.from_json("value", schema).alias("m"))
            .select("m.*")
        )
        q = (
            stream.writeStream.foreachBatch(sk.merge)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not terminate"

    run("ck1")
    assert sk.n_partials() == 2

    full = spark.createDataFrame([(r["doc_id"], r["text"]) for r in b0 + b1], schema)
    golden = sorted(
        (r.i, r.bucket, r.cnt) for r in batch_partial(full).collect()
    )
    got = sorted((r.i, r.bucket, r.cnt) for r in sk.counters().collect())
    assert got == golden

    # replay with a fresh checkpoint: partitions overwrite, counters fixed
    run("ck2")
    got2 = sorted((r.i, r.bucket, r.cnt) for r in sk.counters().collect())
    assert got2 == golden

    # admissibility: estimate >= truth for every queried token
    exact = {"tokens": 4, "spark": 3, "sketch": 2, "absent": 0}
    est = sk.estimate(list(exact))
    for tok, n in exact.items():
        assert est[tok] >= n, tok
    # an unseen token can still collide, but with 4 independent rows over
    # this tiny corpus at least one row must be clean
    assert est["absent"] == 0


def test_incremental_cms_compaction_preserves_counters(spark, tmp_path):
    """compact() folds all batch partials into one base partition without
    moving a single counter value, and further merges keep accumulating
    on top of the compacted base."""
    from stream_cdc_gps_spark.streaming.cms_index import IncrementalCmsSketch

    sk = IncrementalCmsSketch(spark, str(tmp_path / "cms"))
    schema = "doc_id long, text string"
    sk.merge(spark.createDataFrame([(1, "alpha beta beta")], schema), 0)
    sk.merge(spark.createDataFrame([(2, "beta gamma")], schema), 1)
    before = sorted((r.i, r.bucket, r.cnt) for r in sk.counters().collect())
    assert sk.n_partials() == 2

    sk.compact()
    assert sk.n_partials() == 1
    after = sorted((r.i, r.bucket, r.cnt) for r in sk.counters().collect())
    assert after == before

    sk.merge(spark.createDataFrame([(3, "gamma delta")], schema), 2)
    assert sk.n_partials() == 2
    est = sk.estimate(["beta", "gamma", "delta"])
    assert est["beta"] >= 3 and est["gamma"] >= 2 and est["delta"] >= 1


def test_incremental_hll_streaming_matches_batch(spark, tmp_path):
    """Streaming HLL maintenance: user ids split across two micro-batches
    (with cross-batch overlap, so a count-sum would overcount) estimate
    the same distinct cardinality as one all-at-once sketch; replay from
    a fresh checkpoint is a no-op; compaction preserves the estimate."""
    from stream_cdc_gps_spark.streaming.hll_index import IncrementalHllCounter

    src = tmp_path / "in"
    src.mkdir()
    # users 0..49 in b0, 25..74 in b1: 75 true distinct, 100 rows
    b0 = [{"event_id": i, "user_id": i} for i in range(50)]
    b1 = [{"event_id": 100 + i, "user_id": 25 + i} for i in range(50)]
    (src / "b0.jsonl").write_text("\n".join(json.dumps(r) for r in b0))
    (src / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in b1))

    hll = IncrementalHllCounter(spark, str(tmp_path / "hll"), "user_id")
    schema = "event_id long, user_id long"

    def run(ck: str) -> None:
        stream = (
            spark.readStream.schema("value string")
            .option("maxFilesPerTrigger", "1")
            .format("text")
            .load(str(src))
            .select(F.from_json("value", schema).alias("m"))
            .select("m.*")
        )
        q = (
            stream.writeStream.foreachBatch(hll.merge)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not terminate"

    run("ck1")
    assert hll.n_partials() == 2
    est, n_rows = hll.estimate()
    assert n_rows == 100

    # golden: one all-at-once sketch over the union
    golden = (
        spark.createDataFrame([(r["event_id"], r["user_id"]) for r in b0 + b1], schema)
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e"))
        .collect()[0]["e"]
    )
    assert est == int(golden)
    # ...and the union genuinely deduplicated the 25-user overlap
    assert abs(est - 75) <= 4  # HLL default accuracy is far tighter at n=75

    run("ck2")  # fresh-checkpoint replay: partitions overwrite, no drift
    assert hll.estimate() == (est, 100)

    hll.compact()
    assert hll.n_partials() == 1
    assert hll.estimate() == (est, 100)

    # a further batch accumulates on top of the compacted base
    hll.merge(
        spark.createDataFrame([(200 + i, 1000 + i) for i in range(10)], schema), 7
    )
    est2, n2 = hll.estimate()
    assert n2 == 110 and est2 > est


def test_incremental_rollup_streaming_matches_batch(spark, tmp_path):
    """Streaming keyed-aggregate maintenance: events split across two
    micro-batches (keys recur across the split) roll up to EXACTLY the
    all-at-once batch aggregate — count/sum/avg/min/max, with avg derived
    from the mergeable pieces; replay and compaction leave the snapshot
    untouched."""
    from stream_cdc_gps_spark.streaming.rollup_index import IncrementalRollup

    src = tmp_path / "in"
    src.mkdir()
    b0 = [
        {"event_id": 1, "event_type": "view", "value": 10.25},
        {"event_id": 2, "event_type": "click", "value": 3.5},
        {"event_id": 3, "event_type": "view", "value": 0.75},
    ]
    b1 = [
        {"event_id": 4, "event_type": "view", "value": 99.0},
        {"event_id": 5, "event_type": "click", "value": 0.01},
        {"event_id": 6, "event_type": "purchase", "value": 42.42},
    ]
    (src / "b0.jsonl").write_text("\n".join(json.dumps(r) for r in b0))
    (src / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in b1))

    ru = IncrementalRollup(spark, str(tmp_path / "ru"), "event_type", "value")
    schema = "event_id long, event_type string, value double"

    def run(ck: str) -> None:
        stream = (
            spark.readStream.schema("value string")
            .option("maxFilesPerTrigger", "1")
            .format("text")
            .load(str(src))
            .select(F.from_json("value", schema).alias("m"))
            .select("m.*")
        )
        q = (
            stream.writeStream.foreachBatch(ru.merge)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not terminate"

    run("ck1")
    assert ru.n_partials() == 2

    full = spark.createDataFrame(
        [(r["event_id"], r["event_type"], r["value"]) for r in b0 + b1], schema
    )
    golden = sorted(
        (
            r["event_type"], r["n_rows"], r["total"],
            round(r["avg_value"], 9), r["min_value"], r["max_value"],
        )
        for r in full.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    )

    def snap():
        return sorted(
            (
                r["event_type"], r["n_rows"], r["total"],
                round(r["avg_value"], 9), r["min_value"], r["max_value"],
            )
            for r in ru.snapshot().collect()
        )

    assert snap() == golden
    run("ck2")  # fresh-checkpoint replay
    assert snap() == golden
    ru.compact()
    assert ru.n_partials() == 1
    assert snap() == golden

    # further merges accumulate on top of the compacted base
    ru.merge(spark.createDataFrame([(7, "view", 1.0)], schema), 9)
    got = {r["event_type"]: r for r in ru.snapshot().collect()}
    assert got["view"]["n_rows"] == 4
    assert abs(got["view"]["total"] - 111.0) < 1e-9


def test_incremental_rollup_partial_write_crash_self_heals(spark, tmp_path):
    """A crash mid-overwrite of a batch partition leaves that batch's
    contribution missing (commit is per-partition: staged files move in
    at the end) and can strand a _temporary staging dir in the store.
    Replaying the batch must fully restore the snapshot — the batch-id
    partition IS the unit of recovery — and the stray staging dir must
    not poison reads."""
    import os
    import shutil

    from stream_cdc_gps_spark.streaming.rollup_index import IncrementalRollup

    schema = "event_id long, event_type string, value double"
    ru = IncrementalRollup(spark, str(tmp_path / "ru"), "event_type", "value")
    ru.merge(spark.createDataFrame([(1, "view", 5.0), (2, "click", 1.0)], schema), 0)
    ru.merge(spark.createDataFrame([(3, "view", 7.0)], schema), 1)
    healthy = sorted(map(tuple, ru.snapshot().collect()))

    # crash state: batch 1's partition vanished mid-commit; a staging dir
    # was left behind
    shutil.rmtree(os.path.join(ru.path, "batch_id=1"))
    os.makedirs(os.path.join(ru.path, "_temporary", "0"), exist_ok=True)
    assert sorted(map(tuple, ru.snapshot().collect())) != healthy

    # checkpoint replay re-delivers batch 1: partition overwrite repairs
    ru.merge(spark.createDataFrame([(3, "view", 7.0)], schema), 1)
    assert sorted(map(tuple, ru.snapshot().collect())) == healthy


def test_incremental_cms_and_hll_crash_replay_self_heal(spark, tmp_path):
    """Same recovery contract for the sketch stores: deleting a batch
    partition (the crash state) is repaired by replaying that batch —
    counters and estimates return to the healthy values exactly."""
    import os
    import shutil

    from stream_cdc_gps_spark.streaming.cms_index import IncrementalCmsSketch
    from stream_cdc_gps_spark.streaming.hll_index import IncrementalHllCounter

    dschema = "doc_id long, text string"
    sk = IncrementalCmsSketch(spark, str(tmp_path / "cms"))
    sk.merge(spark.createDataFrame([(1, "a b a")], dschema), 0)
    sk.merge(spark.createDataFrame([(2, "b c")], dschema), 1)
    healthy = sorted((r.i, r.bucket, r.cnt) for r in sk.counters().collect())
    shutil.rmtree(os.path.join(sk.path, "batch_id=1"))
    assert sorted((r.i, r.bucket, r.cnt) for r in sk.counters().collect()) != healthy
    sk.merge(spark.createDataFrame([(2, "b c")], dschema), 1)
    assert sorted((r.i, r.bucket, r.cnt) for r in sk.counters().collect()) == healthy

    eschema = "event_id long, user_id long"
    hll = IncrementalHllCounter(spark, str(tmp_path / "hll"), "user_id")
    hll.merge(spark.createDataFrame([(1, 10), (2, 11)], eschema), 0)
    hll.merge(spark.createDataFrame([(3, 11), (4, 12)], eschema), 1)
    healthy_est = hll.estimate()
    shutil.rmtree(os.path.join(hll.path, "batch_id=1"))
    assert hll.estimate() != healthy_est
    hll.merge(spark.createDataFrame([(3, 11), (4, 12)], eschema), 1)
    assert hll.estimate() == healthy_est


def test_compacted_batch_replay_is_refused_not_double_counted(spark, tmp_path):
    """r6 ADVICE (medium): compaction folds every landed partial into the
    base, so if Structured Streaming re-delivers a compacted batch (crash
    before its checkpoint commit), landing it AGAIN would double-count in
    the sum-merge stores. The store's max_compacted watermark must refuse
    the replay; genuinely new batches still land."""
    from stream_cdc_gps_spark.streaming.cms_index import IncrementalCmsSketch
    from stream_cdc_gps_spark.streaming.hll_index import IncrementalHllCounter
    from stream_cdc_gps_spark.streaming.rollup_index import IncrementalRollup

    dschema = "doc_id long, text string"
    sk = IncrementalCmsSketch(spark, str(tmp_path / "cms"))
    sk.merge(spark.createDataFrame([(1, "a b a")], dschema), 0)
    sk.merge(spark.createDataFrame([(2, "b c")], dschema), 1)
    sk.compact()
    healthy = sorted((r.i, r.bucket, r.cnt) for r in sk.counters().collect())
    # the crash-replay of an already-compacted batch: must be a no-op
    sk.merge(spark.createDataFrame([(2, "b c")], dschema), 1)
    assert sorted((r.i, r.bucket, r.cnt) for r in sk.counters().collect()) == healthy
    # a NEW batch still lands on top of the compacted base
    sk.merge(spark.createDataFrame([(3, "c d")], dschema), 2)
    assert sk.estimate(["c"])["c"] == 2

    eschema = "event_id long, event_type string, value double"
    ru = IncrementalRollup(spark, str(tmp_path / "ru"), "event_type", "value")
    ru.merge(spark.createDataFrame([(1, "view", 5.0), (2, "click", 1.0)], eschema), 0)
    ru.merge(spark.createDataFrame([(3, "view", 7.0)], eschema), 1)
    ru.compact()
    healthy_snap = sorted(map(tuple, ru.snapshot().collect()))
    ru.merge(spark.createDataFrame([(3, "view", 7.0)], eschema), 1)
    assert sorted(map(tuple, ru.snapshot().collect())) == healthy_snap

    hschema = "event_id long, user_id long"
    hll = IncrementalHllCounter(spark, str(tmp_path / "hll"), "user_id")
    hll.merge(spark.createDataFrame([(1, 10), (2, 11)], hschema), 0)
    hll.compact()
    est, n_rows = hll.estimate()
    # register max would absorb the replayed sketch, but n_rows is a SUM
    hll.merge(spark.createDataFrame([(1, 10), (2, 11)], hschema), 0)
    assert hll.estimate() == (est, n_rows)


def test_compact_crash_before_pointer_swap_loses_nothing(spark, tmp_path):
    """r6 ADVICE (low): the old compact deleted the whole store before
    rewriting it — a crash mid-compact lost all state. Now the folded base
    lands in a NEW generation dir and only the atomic meta-pointer rename
    commits it: a half-written next generation (crash before the swap) is
    invisible to reads, and a retried compact clobbers it and converges."""
    import os

    from stream_cdc_gps_spark.streaming.rollup_index import IncrementalRollup

    schema = "event_id long, event_type string, value double"
    ru = IncrementalRollup(spark, str(tmp_path / "ru"), "event_type", "value")
    ru.merge(spark.createDataFrame([(1, "view", 5.0), (2, "click", 1.0)], schema), 0)
    ru.merge(spark.createDataFrame([(3, "view", 7.0)], schema), 1)
    healthy = sorted(map(tuple, ru.snapshot().collect()))

    # crash state: a garbage half-written NEXT generation exists, but the
    # meta pointer was never swapped
    garbage = os.path.join(str(tmp_path / "ru"), "base", "v1")
    os.makedirs(garbage, exist_ok=True)
    with open(os.path.join(garbage, "part-00000.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    assert sorted(map(tuple, ru.snapshot().collect())) == healthy

    # the retried compact overwrites the garbage generation and commits
    ru.compact()
    assert ru.n_partials() == 1
    assert sorted(map(tuple, ru.snapshot().collect())) == healthy
    # and accumulation continues on the compacted base
    ru.merge(spark.createDataFrame([(4, "click", 3.0)], schema), 2)
    got = {r["event_type"]: r["n_rows"] for r in ru.snapshot().collect()}
    assert got == {"view": 2, "click": 2}


def test_incremental_hll_skips_empty_batches(spark, tmp_path):
    """r6 ADVICE (low): an empty micro-batch used to land a NULL sketch
    (hll_sketch_agg over zero rows) that poisoned the union and crashed
    estimate(). Empty batches are now skipped; an all-empty stream reads
    as (0, 0) rather than raising."""
    from stream_cdc_gps_spark.streaming.hll_index import IncrementalHllCounter

    schema = "event_id long, user_id long"
    empty = spark.createDataFrame([], schema)

    hll = IncrementalHllCounter(spark, str(tmp_path / "hll"), "user_id")
    hll.merge(empty, 0)
    assert hll.estimate() == (0, 0)  # all-empty stream: zero, not a crash
    assert hll.n_partials() == 0

    hll.merge(spark.createDataFrame([(1, 10), (2, 11)], schema), 1)
    hll.merge(empty, 2)  # interior empty batch is also a no-op
    est, n_rows = hll.estimate()
    assert (est, n_rows) == (2, 2)


def test_incremental_vector_index_matches_batch_encode(spark, tmp_path):
    """FAISS-add semantics: vectors ingested in batches with FROZEN
    codebooks land exactly the all-at-once batch encode (the encode is
    stateless per vector); replay is a no-op and compaction preserves the
    base table while folding the batch partitions."""
    from stream_cdc_gps_spark.operators.similarity import _ivfadc_encode
    from stream_cdc_gps_spark.streaming.vector_index import IncrementalVectorIndex

    dim, sub = 64, 16
    vecs = [
        (i, [float((i * 7 + j * 3) % 11) for j in range(dim)]) for i in range(12)
    ]
    e = spark.createDataFrame(vecs, "vec_id long, emb array<double>")
    cents = [(cid, v) for cid, v in vecs[:2]]
    cbs = {
        m: [(cid, v[m * sub : (m + 1) * sub]) for cid, v in vecs[:3]]
        for m in range(4)
    }

    def rows(df):
        return sorted(map(tuple, df.collect()))

    golden = rows(_ivfadc_encode(e, cents, cbs))

    idx = IncrementalVectorIndex(spark, str(tmp_path / "vix"), cents, cbs)
    idx.merge(e.filter(F.col("vec_id") % 2 == 0), 0)
    idx.merge(e.filter(F.col("vec_id") % 2 == 1), 1)
    assert rows(idx.base_table().select("vec_id", "cell", "code0", "code1", "code2", "code3")) == golden
    assert idx.n_partials() == 2

    # replay of a delivered batch is absorbed by the partition overwrite
    idx.merge(e.filter(F.col("vec_id") % 2 == 1), 1)
    assert rows(idx.base_table().select("vec_id", "cell", "code0", "code1", "code2", "code3")) == golden

    # compaction folds partitions, base table invariant; replay of a
    # folded batch is refused by the watermark instead of double-landing
    idx.compact()
    assert idx.n_partials() == 1
    assert rows(idx.base_table().select("vec_id", "cell", "code0", "code1", "code2", "code3")) == golden
    idx.merge(e.filter(F.col("vec_id") % 2 == 1), 1)
    assert rows(idx.base_table().select("vec_id", "cell", "code0", "code1", "code2", "code3")) == golden


def test_vector_index_retrain_generation_swap(spark, tmp_path):
    """r7 judge task #5: retrain() swaps in a generation trained on the
    accumulated raw vectors — the new base equals the all-at-once encode
    under the retrained codebooks, post-retrain merges encode with the
    NEW codebooks, and a replay of a pre-retrain batch is refused by the
    new generation's watermark."""
    from stream_cdc_gps_spark.operators.similarity import (
        _ivfadc_encode,
        _lloyd_train_ivf,
        _lloyd_train_pq,
    )
    from stream_cdc_gps_spark.streaming.vector_index import IncrementalVectorIndex

    dim, sub = 64, 16
    vecs = [
        (i, [float((i * 7 + j * 3) % 11) for j in range(dim)]) for i in range(12)
    ]
    schema = "vec_id long, emb array<double>"
    e = spark.createDataFrame(vecs, schema)
    seed_cents = [(cid, v) for cid, v in vecs[:2]]
    seed_cbs = {
        m: [(cid, v[m * sub : (m + 1) * sub]) for cid, v in vecs[:3]]
        for m in range(4)
    }
    cols = ["vec_id", "cell", "code0", "code1", "code2", "code3"]
    rows = lambda df: sorted(map(tuple, df.select(*cols).collect()))

    idx = IncrementalVectorIndex(spark, str(tmp_path / "vix"), seed_cents, seed_cbs)
    idx.merge(e.filter(F.col("vec_id") % 2 == 0), 0)
    idx.merge(e.filter(F.col("vec_id") % 2 == 1), 1)
    assert idx.gen() == 0

    assert idx.retrain() == 1
    assert idx.gen() == 1
    tr_cents, tr_cbs = _lloyd_train_ivf(e), _lloyd_train_pq(e)
    assert rows(idx.base_table()) == rows(_ivfadc_encode(e, tr_cents, tr_cbs))
    # generation() serves the retrained codebooks, not the seeds
    _, g_cents, g_cbs = idx.generation()
    assert g_cents == tr_cents and g_cbs == tr_cbs
    # the old generation remains readable (an in-flight search finishes)
    assert rows(idx.base_table(gen=0)) == rows(
        _ivfadc_encode(e, seed_cents, seed_cbs)
    )

    # replay of a folded pre-retrain batch is refused by the watermark
    idx.merge(e.filter(F.col("vec_id") % 2 == 1), 1)
    assert rows(idx.base_table()) == rows(_ivfadc_encode(e, tr_cents, tr_cbs))

    # a genuinely new batch encodes with the NEW generation's codebooks
    extra = [(100, [float((j * 5 + 1) % 9) for j in range(dim)])]
    idx.merge(spark.createDataFrame(extra, schema), 2)
    full = spark.createDataFrame(vecs + extra, schema)
    assert rows(idx.base_table()) == rows(_ivfadc_encode(full, tr_cents, tr_cbs))


def test_vector_index_crash_mid_retrain_keeps_old_generation(spark, tmp_path):
    """A crash ANYWHERE before the pointer swap leaves generation 0
    authoritative and fully consistent (codebooks AND codes), and a
    retry completes the swap over the orphaned half-written directory."""
    from stream_cdc_gps_spark.operators.similarity import (
        _ivfadc_encode,
        _lloyd_train_ivf,
        _lloyd_train_pq,
    )
    from stream_cdc_gps_spark.streaming.vector_index import IncrementalVectorIndex

    dim, sub = 64, 16
    vecs = [
        (i, [float((i * 5 + j * 7) % 13) for j in range(dim)]) for i in range(10)
    ]
    schema = "vec_id long, emb array<double>"
    e = spark.createDataFrame(vecs, schema)
    seed_cents = [(cid, v) for cid, v in vecs[:2]]
    seed_cbs = {
        m: [(cid, v[m * sub : (m + 1) * sub]) for cid, v in vecs[:3]]
        for m in range(4)
    }
    cols = ["vec_id", "cell", "code0", "code1", "code2", "code3"]
    rows = lambda df: sorted(map(tuple, df.select(*cols).collect()))

    idx = IncrementalVectorIndex(spark, str(tmp_path / "vix"), seed_cents, seed_cbs)
    idx.merge(e, 0)
    seed_rows = rows(idx.base_table())

    # crash: everything of generation 1 is written EXCEPT the pointer
    boom = RuntimeError("power loss before pointer swap")
    real_commit = idx._commit_gen
    idx._commit_gen = lambda gen: (_ for _ in ()).throw(boom)
    try:
        idx.retrain()
    except RuntimeError as err:
        assert err is boom
    else:
        raise AssertionError("crash injection did not fire")

    # a RE-OPENED index (fresh process) sees generation 0, intact
    idx2 = IncrementalVectorIndex(spark, str(tmp_path / "vix"), seed_cents, seed_cbs)
    assert idx2.gen() == 0
    assert rows(idx2.base_table()) == seed_rows
    _, g_cents, g_cbs = idx2.generation()
    assert g_cents == seed_cents and g_cbs == seed_cbs

    # the retry overwrites the orphaned v1 directory and completes
    assert idx2.retrain() == 1
    tr_cents, tr_cbs = _lloyd_train_ivf(e), _lloyd_train_pq(e)
    assert rows(idx2.base_table()) == rows(_ivfadc_encode(e, tr_cents, tr_cbs))


def test_incremental_vector_index_streaming_end_to_end(spark, tmp_path):
    """Streaming form of q190: embedding vectors fed as two real
    micro-batches through foreachBatch(IncrementalVectorIndex.merge)
    under availableNow land exactly the all-at-once batch encode, and a
    full replay from a fresh checkpoint is a no-op (batch-id partition
    overwrite)."""
    from stream_cdc_gps_spark.operators.similarity import _ivfadc_encode
    from stream_cdc_gps_spark.streaming.vector_index import IncrementalVectorIndex

    dim, sub = 64, 16
    vecs = [
        (i, [float((i * 5 + j * 7) % 13) for j in range(dim)]) for i in range(10)
    ]
    src = tmp_path / "in"
    src.mkdir()
    for b in range(2):
        (src / f"b{b}.jsonl").write_text(
            "\n".join(
                json.dumps({"vec_id": i, "emb": v}) for i, v in vecs if i % 2 == b
            )
        )
    cents = [(cid, v) for cid, v in vecs[:2]]
    cbs = {
        m: [(cid, v[m * sub : (m + 1) * sub]) for cid, v in vecs[:3]]
        for m in range(4)
    }
    idx = IncrementalVectorIndex(spark, str(tmp_path / "vix"), cents, cbs)
    schema = "vec_id long, emb array<double>"

    def run(ck: str) -> None:
        stream = (
            spark.readStream.schema("value string")
            .option("maxFilesPerTrigger", "1")  # two real micro-batches
            .format("text")
            .load(str(src))
            .select(F.from_json("value", schema).alias("m"))
            .select("m.*")
        )
        q = (
            stream.writeStream.foreachBatch(idx.merge)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not terminate"

    run("ck1")
    golden = sorted(
        map(tuple, _ivfadc_encode(spark.createDataFrame(vecs, schema), cents, cbs).collect())
    )
    cols = ["vec_id", "cell", "code0", "code1", "code2", "code3"]
    assert sorted(map(tuple, idx.base_table().select(*cols).collect())) == golden

    # worst-case restart: fresh checkpoint replays every micro-batch
    run("ck2")
    assert sorted(map(tuple, idx.base_table().select(*cols).collect())) == golden


def test_incremental_join_view_matches_batch_and_heals_torn_writes(spark, tmp_path):
    """Delta-join view maintenance: lock-step insert-only batches on both
    sides land exactly the all-at-once batch join (cross-batch match terms
    included); a torn three-store write (delta partition lost after the
    inputs landed — the worst crash, state ahead of the view) is healed by
    replaying the batch; compaction preserves the snapshot and folded
    batches are refused on replay."""
    import os
    import shutil

    from stream_cdc_gps_spark.streaming.join_view import IncrementalJoinView

    a_schema = "k long, a_val string"
    b_schema = "k long, b_name string"
    # keys 1..4; batch split so key 2's A-row (batch 0) must meet key 2's
    # B-row (batch 1) and vice versa for key 3 — the cross-batch terms
    a0 = [(1, "a1"), (2, "a2")]
    a1 = [(3, "a3"), (1, "a1x")]
    b0 = [(1, "Alice"), (3, "Carol")]
    b1 = [(2, "Bob"), (4, "Dave")]

    A = spark.createDataFrame(a0 + a1, a_schema)
    B = spark.createDataFrame(b0 + b1, b_schema)
    golden = sorted(map(tuple, A.join(B, "k").collect()))
    assert len(golden) == 4  # 1 matches twice, 2 and 3 once each, 4 never

    view = IncrementalJoinView(spark, str(tmp_path / "jv"), "k")
    view.merge(
        spark.createDataFrame(a0, a_schema), spark.createDataFrame(b0, b_schema), 0
    )
    view.merge(
        spark.createDataFrame(a1, a_schema), spark.createDataFrame(b1, b_schema), 1
    )
    assert sorted(map(tuple, view.snapshot().collect())) == golden

    # torn write: batch 1's DELTA vanishes while its inputs survived —
    # the replayed merge must recompute the delta against pre-1 state
    shutil.rmtree(os.path.join(view.m_store.partials_path, "batch_id=1"))
    assert sorted(map(tuple, view.snapshot().collect())) != golden
    view.merge(
        spark.createDataFrame(a1, a_schema), spark.createDataFrame(b1, b_schema), 1
    )
    assert sorted(map(tuple, view.snapshot().collect())) == golden

    # compaction folds, snapshot invariant; folded-batch replay is refused
    view.compact()
    assert view.n_partials() == 1
    assert sorted(map(tuple, view.snapshot().collect())) == golden
    view.merge(
        spark.createDataFrame(a1, a_schema), spark.createDataFrame(b1, b_schema), 1
    )
    assert sorted(map(tuple, view.snapshot().collect())) == golden

    # and growth continues on the compacted base, with cross-term matches
    view.merge(
        spark.createDataFrame([(4, "a4")], a_schema),
        spark.createDataFrame([], b_schema),
        2,
    )
    assert len(view.snapshot().collect()) == len(golden) + 1  # 4 meets Dave


def _cdc_view_rows(view):
    return sorted(
        map(tuple, view.snapshot().select("oid", "k", "a_val", "b_name").collect())
    )


def test_cdc_join_view_retracts_updates_and_deletes(spark, tmp_path):
    """r7 judge task #4: the CDC-aware view under op ∈ {c,u,d} on BOTH
    sides. Exercises the retraction algebra q193's insert-only class
    cannot express: a non-key update replaces the matched row, a
    JOIN-KEY-CHANGING update retracts the old match and asserts the new
    one, a delete on either side removes exactly its matches, a d for an
    unseen pk is a no-op, and a same-image update nets to zero."""
    from stream_cdc_gps_spark.streaming.join_view import CdcJoinView

    a_schema = "op string, seq long, oid long, k long, a_val string"
    b_schema = "op string, seq long, k long, b_name string"

    view = CdcJoinView(
        spark, str(tmp_path / "cdcjv"), key="k", a_pk="oid", b_pk="k"
    )
    # batch 0: orders 10/11/12 on keys 1/2/2; customers 1/2/3
    a0 = [("c", 1, 10, 1, "a10"), ("c", 2, 11, 2, "a11"), ("c", 3, 12, 2, "a12")]
    b0 = [("c", 1, 1, "Alice"), ("c", 2, 2, "Bob"), ("c", 3, 3, "Carol")]
    view.merge(
        spark.createDataFrame(a0, a_schema), spark.createDataFrame(b0, b_schema), 0
    )
    assert _cdc_view_rows(view) == [
        (10, 1, "a10", "Alice"),
        (11, 2, "a11", "Bob"),
        (12, 2, "a12", "Bob"),
    ]

    # batch 1: update order 10's value in place; MOVE order 11 from key 2
    # to key 3 (retract Bob match, assert Carol match); delete order 12;
    # rename customer 3 AFTER the move lands (seq order within the side);
    # delete an order that never existed (no-op); re-assert customer 1
    # with the identical image (nets to zero — no visible change).
    a1 = [
        ("u", 10, 10, 1, "a10x"),
        ("u", 11, 11, 3, "a11"),
        ("d", 12, 12, 2, "a12"),
        ("d", 13, 99, 9, "gone"),
    ]
    b1 = [("u", 10, 3, "Carol2"), ("u", 11, 1, "Alice")]
    view.merge(
        spark.createDataFrame(a1, a_schema), spark.createDataFrame(b1, b_schema), 1
    )
    golden = [(10, 1, "a10x", "Alice"), (11, 3, "a11", "Carol2")]
    assert _cdc_view_rows(view) == golden

    # batch 2: delete customer 3 — order 11 loses its partner entirely;
    # within ONE batch, delete order 10 then re-create it (seq decides:
    # the re-create wins) with a new value.
    a2 = [("d", 20, 10, 1, "a10x"), ("c", 21, 10, 1, "a10y")]
    b2 = [("d", 20, 3, "Carol2")]
    view.merge(
        spark.createDataFrame(a2, a_schema), spark.createDataFrame(b2, b_schema), 2
    )
    assert _cdc_view_rows(view) == [(10, 1, "a10y", "Alice")]


def test_cdc_join_view_heals_torn_writes_and_compacts(spark, tmp_path):
    """The q193 durability contract on the CDC class: a torn three-store
    write (view delta lost after the changelogs landed) is healed by
    replaying the batch; compaction folds the changelogs to latest-per-pk
    (d tombstones retained — a deleted key must NOT resurrect from its
    compacted create) and the view to net weights, the snapshot is
    invariant, folded batches are refused, and growth continues on the
    compacted base."""
    import os
    import shutil

    from stream_cdc_gps_spark.streaming.join_view import CdcJoinView

    a_schema = "op string, seq long, oid long, k long, a_val string"
    b_schema = "op string, seq long, k long, b_name string"
    view = CdcJoinView(
        spark, str(tmp_path / "cdcjv"), key="k", a_pk="oid", b_pk="k"
    )
    a0 = [("c", 1, 10, 1, "a10"), ("c", 2, 11, 2, "a11")]
    b0 = [("c", 1, 1, "Alice"), ("c", 2, 2, "Bob")]
    a1 = [("u", 10, 11, 1, "a11x"), ("d", 11, 10, 1, "a10")]
    b1 = [("u", 10, 2, "Bob2")]
    mk = lambda rows, s: spark.createDataFrame(rows, s)

    view.merge(mk(a0, a_schema), mk(b0, b_schema), 0)
    view.merge(mk(a1, a_schema), mk(b1, b_schema), 1)
    golden = [(11, 1, "a11x", "Alice")]
    assert _cdc_view_rows(view) == golden

    # torn write: batch 1's view delta vanishes, changelogs survived
    shutil.rmtree(os.path.join(view.m_store.partials_path, "batch_id=1"))
    assert _cdc_view_rows(view) != golden
    view.merge(mk(a1, a_schema), mk(b1, b_schema), 1)
    assert _cdc_view_rows(view) == golden

    # compaction: one piece per store, snapshot invariant, replay refused
    view.compact()
    assert view.n_partials() == 1
    assert _cdc_view_rows(view) == golden
    view.merge(mk(a1, a_schema), mk(b1, b_schema), 1)
    assert _cdc_view_rows(view) == golden
    # the folded A changelog holds exactly one row per pk, d included
    folded = view.a_store.rows()
    assert sorted(
        (r.oid, r.op) for r in folded.select("oid", "op").collect()
    ) == [(10, "d"), (11, "u")]

    # growth on the compacted base: re-create the deleted order 10 —
    # it must NOT resurrect the old image, only the new one
    view.merge(
        mk([("c", 20, 10, 2, "a10new")], a_schema), mk([], b_schema), 2
    )
    assert _cdc_view_rows(view) == [(10, 2, "a10new", "Bob2")] + golden


def test_cdc_aggregate_view_retracts_exactly(spark, tmp_path):
    """The aggregate face of the CDC Z-set algebra: count/sum maintained
    under c/u/d with DECIMAL exactness — a key-moving update lands −1 on
    the old key and +1 on the new in one merge, a delete retracts its
    exact contribution (no floating residue), zero-count groups vanish,
    torn view/changelog writes heal on replay, and compaction preserves
    the snapshot."""
    import os
    import shutil
    from decimal import Decimal

    from stream_cdc_gps_spark.streaming.join_view import CdcAggregateView

    schema = "op string, seq long, oid long, k long, v decimal(18,2)"
    D = Decimal
    view = CdcAggregateView(
        spark, str(tmp_path / "aggv"), key="k", pk="oid", val="v"
    )
    rows = lambda: sorted(
        (r.k, r.n, r.total) for r in view.snapshot().collect()
    )

    # batch 0: two orders on key 1, one on key 2
    b0 = [
        ("c", 1, 10, 1, D("10.10")),
        ("c", 2, 11, 1, D("0.20")),
        ("c", 3, 12, 2, D("5.00")),
    ]
    view.merge(spark.createDataFrame(b0, schema), 0)
    assert rows() == [(1, 2, D("10.30")), (2, 1, D("5.00"))]

    # batch 1: move order 10 from key 1 to key 2 with a new value;
    # delete order 12; update order 11 in place
    b1 = [
        ("u", 10, 10, 2, D("10.00")),
        ("d", 11, 12, 2, D("5.00")),
        ("u", 12, 11, 1, D("0.25")),
    ]
    view.merge(spark.createDataFrame(b1, schema), 1)
    golden = [(1, 1, D("0.25")), (2, 1, D("10.00"))]
    assert rows() == golden

    # batch 2: delete the last key-1 order — the group must VANISH
    view.merge(
        spark.createDataFrame([("d", 20, 11, 1, D("0.25"))], schema), 2
    )
    assert rows() == [(2, 1, D("10.00"))]

    # torn write: batch 2's view partial vanishes, changelog survived
    shutil.rmtree(os.path.join(view.v_store.partials_path, "batch_id=2"))
    assert rows() == golden  # the stale pre-2 state is visible again
    view.merge(
        spark.createDataFrame([("d", 20, 11, 1, D("0.25"))], schema), 2
    )
    assert rows() == [(2, 1, D("10.00"))]

    # compaction folds both stores, snapshot invariant, replay refused
    view.compact()
    assert view.n_partials() == 1
    assert rows() == [(2, 1, D("10.00"))]
    view.merge(
        spark.createDataFrame([("d", 20, 11, 1, D("0.25"))], schema), 2
    )
    assert rows() == [(2, 1, D("10.00"))]

    # growth on the compacted base: a re-insert recreates the dead group
    view.merge(
        spark.createDataFrame([("c", 30, 20, 1, D("7.77"))], schema), 3
    )
    assert rows() == [(1, 1, D("7.77")), (2, 1, D("10.00"))]


def test_cdc_left_join_view_flips_padding(spark, tmp_path):
    """The outer-join support-set semantics: deleting a key's LAST B row
    flips every A row on that key to null-padded in one merge,
    re-inserting flips them back, a key-move to a B-less key pads the
    mover, emptied keys supersede to empty (not stale), torn view
    writes heal on replay, and compaction preserves the snapshot."""
    import os
    import shutil

    from stream_cdc_gps_spark.streaming.join_view import CdcLeftJoinView

    a_schema = "op string, seq long, oid long, k long, a_val string"
    b_schema = "op string, seq long, k long, b_name string"
    view = CdcLeftJoinView(
        spark, str(tmp_path / "ljv"), key="k", a_pk="oid", b_pk="k"
    )
    rows = lambda: sorted(
        ((r.oid, r.k, r.a_val, r.b_name) for r in
         view.snapshot().select("oid", "k", "a_val", "b_name").collect()),
    )

    # batch 0: orders 10/11 on key 1 (matched), 12 on key 9 (B-less)
    view.merge(
        spark.createDataFrame(
            [("c", 1, 10, 1, "a10"), ("c", 2, 11, 1, "a11"),
             ("c", 3, 12, 9, "a12")], a_schema
        ),
        spark.createDataFrame([("c", 1, 1, "Alice")], b_schema),
        0,
    )
    assert rows() == [
        (10, 1, "a10", "Alice"),
        (11, 1, "a11", "Alice"),
        (12, 9, "a12", None),
    ]

    # batch 1: delete customer 1 -> BOTH its orders flip to padded in
    # one merge; move order 12 to key 2, which has no customer either
    view.merge(
        spark.createDataFrame([("u", 10, 12, 2, "a12")], a_schema),
        spark.createDataFrame([("d", 10, 1, "Alice")], b_schema),
        1,
    )
    golden = [(10, 1, "a10", None), (11, 1, "a11", None), (12, 2, "a12", None)]
    assert rows() == golden

    # batch 2: customer 1 returns under a new name -> orders unflip;
    # delete order 11 entirely
    view.merge(
        spark.createDataFrame([("d", 20, 11, 1, "a11")], a_schema),
        spark.createDataFrame([("c", 20, 1, "Alicia")], b_schema),
        2,
    )
    after2 = [(10, 1, "a10", "Alicia"), (12, 2, "a12", None)]
    assert rows() == after2

    # torn write: batch 2's view rows vanish, changelogs survived
    shutil.rmtree(os.path.join(view.v_store.partials_path, "batch_id=2"))
    assert rows() == golden
    view.merge(
        spark.createDataFrame([("d", 20, 11, 1, "a11")], a_schema),
        spark.createDataFrame([("c", 20, 1, "Alicia")], b_schema),
        2,
    )
    assert rows() == after2

    # compaction folds all three stores; snapshot invariant; replay refused
    view.compact()
    assert view.n_partials() == 1
    assert rows() == after2
    view.merge(
        spark.createDataFrame([("d", 20, 11, 1, "a11")], a_schema),
        spark.createDataFrame([("c", 20, 1, "Alicia")], b_schema),
        2,
    )
    assert rows() == after2

    # growth on the compacted base: key 2 gains a customer -> unpad
    view.merge(
        spark.createDataFrame([], a_schema),
        spark.createDataFrame([("c", 30, 2, "Bob")], b_schema),
        3,
    )
    assert rows() == [(10, 1, "a10", "Alicia"), (12, 2, "a12", "Bob")]


def test_cdc_minmax_view_recomputes_touched_keys(spark, tmp_path):
    """The non-linear (support-set) case: deleting the row that held a
    key's min/max yields the SURVIVOR's aggregate (no −1 retraction
    exists); a key-moving update recomputes both keys; an emptied key's
    n=0 row supersedes its stale aggregate (and a re-insert revives it);
    torn view writes heal on replay; compaction preserves the snapshot."""
    import os
    import shutil
    from decimal import Decimal

    from stream_cdc_gps_spark.streaming.join_view import CdcMinMaxView

    schema = "op string, seq long, oid long, k long, v decimal(18,2)"
    D = Decimal
    view = CdcMinMaxView(spark, str(tmp_path / "mmv"), key="k", pk="oid", val="v")
    rows = lambda: sorted(
        (r.k, r.n, r.vmin, r.vmax) for r in view.snapshot().collect()
    )

    b0 = [
        ("c", 1, 10, 1, D("1.00")),  # key 1's minimum
        ("c", 2, 11, 1, D("5.00")),
        ("c", 3, 12, 1, D("9.00")),  # key 1's maximum
        ("c", 4, 13, 2, D("4.00")),
    ]
    view.merge(spark.createDataFrame(b0, schema), 0)
    assert rows() == [(1, 3, D("1.00"), D("9.00")), (2, 1, D("4.00"), D("4.00"))]

    # delete the min-holder AND move the max-holder to key 2: key 1 must
    # re-derive BOTH extremes from its survivor, key 2 absorbs the mover
    b1 = [("d", 10, 10, 1, D("1.00")), ("u", 11, 12, 2, D("9.00"))]
    view.merge(spark.createDataFrame(b1, schema), 1)
    golden = [(1, 1, D("5.00"), D("5.00")), (2, 2, D("4.00"), D("9.00"))]
    assert rows() == golden

    # empty key 1 entirely — its group must vanish, not go stale
    view.merge(
        spark.createDataFrame([("d", 20, 11, 1, D("5.00"))], schema), 2
    )
    after_empty = [(2, 2, D("4.00"), D("9.00"))]
    assert rows() == after_empty

    # torn write: batch 2's view rows vanish, changelog survived
    shutil.rmtree(os.path.join(view.v_store.partials_path, "batch_id=2"))
    assert rows() == golden  # stale pre-2 state visible again
    view.merge(
        spark.createDataFrame([("d", 20, 11, 1, D("5.00"))], schema), 2
    )
    assert rows() == after_empty

    # compaction folds both stores; snapshot invariant; replay refused
    view.compact()
    assert view.n_partials() == 1
    assert rows() == after_empty
    view.merge(
        spark.createDataFrame([("d", 20, 11, 1, D("5.00"))], schema), 2
    )
    assert rows() == after_empty

    # revival on the compacted base: a new key-1 row recreates the group
    view.merge(
        spark.createDataFrame([("c", 30, 20, 1, D("2.50"))], schema), 3
    )
    assert rows() == [(1, 1, D("2.50"), D("2.50"))] + after_empty


def test_corpus_ingest_composition_matches_batch(spark, tmp_path):
    """The composed ingest handler: ONE two-batch document stream drives
    the quality gate plus all four incremental indexes, and every store
    lands exactly what the equivalent batch pipeline over the kept
    documents computes; a full fresh-checkpoint replay changes nothing."""
    from stream_cdc_gps_spark.operators.dedup import (
        MAX_POSTING,
        band_tuples_of,
        bucket_pair_expand,
    )
    from stream_cdc_gps_spark.streaming.cms_index import batch_partial
    from stream_cdc_gps_spark.streaming.corpus_ingest import (
        CorpusIngestPipeline,
        quality_gate,
    )

    src = tmp_path / "in"
    src.mkdir()
    base = "the quick brown fox jumps over the lazy dog"
    b0 = [
        {"doc_id": 1, "text": base, "source": "s0", "n_chars": len(base)},
        {"doc_id": 2, "text": "too short", "source": "s0", "n_chars": 9},  # gated out
        {"doc_id": 4, "text": "completely different material about spark engines",
         "source": "s1", "n_chars": 49},
    ]
    b1 = [
        {"doc_id": 3, "text": base + " again", "source": "s1",
         "n_chars": len(base) + 6},
    ]
    (src / "b0.jsonl").write_text("\n".join(json.dumps(r) for r in b0))
    (src / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in b1))

    pipe = CorpusIngestPipeline(spark, str(tmp_path / "ingest"))
    schema = "doc_id long, text string, source string, n_chars long"

    def run(ck: str) -> None:
        stream = (
            spark.readStream.schema("value string")
            .option("maxFilesPerTrigger", "1")
            .format("text")
            .load(str(src))
            .select(F.from_json("value", schema).alias("m"))
            .select("m.*")
        )
        q = (
            stream.writeStream.foreachBatch(pipe.merge)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not terminate"

    run("ck1")

    full = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["source"], r["n_chars"]) for r in b0 + b1], schema
    )
    kept = quality_gate(full)
    kept_rows = {r["doc_id"] for r in kept.collect()}
    assert kept_rows == {1, 3, 4}  # the gate dropped doc 2 before any index

    def states():
        lsh = sorted(
            (r.doc_a, r.doc_b) for r in pipe.lsh.pairs().select("doc_a", "doc_b").collect()
        )
        cms = sorted((r.i, r.bucket, r.cnt) for r in pipe.cms.counters().collect())
        est, n_rows = pipe.hll.estimate()
        roll = sorted(map(tuple, pipe.rollup.snapshot().collect()))
        return lsh, cms, est, n_rows, roll

    lsh, cms, est, n_rows, roll = states()

    # LSH == batch q53 plan over the kept docs
    bands = band_tuples_of(kept.select("doc_id", "text"))
    buckets = (
        bands.groupBy("band", "band_key")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= MAX_POSTING))
    )
    golden_pairs = sorted(
        set(
            (r.a, r.b)
            for r in bucket_pair_expand(buckets).select("a", "b").collect()
        )
    )
    assert lsh == golden_pairs and golden_pairs  # docs 1 and 3 must collide

    # CMS == batch partial over kept docs' text
    assert cms == sorted(
        (r.i, r.bucket, r.cnt)
        for r in batch_partial(kept.select("text")).collect()
    )

    # HLL: 3 kept docs, distinct estimate exact at this cardinality
    assert (est, n_rows) == (3, 3)

    # rollup == batch aggregate over kept docs
    golden_roll = sorted(
        map(
            tuple,
            kept.groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(F.col("n_chars").cast("decimal(18,6)")).cast("double").alias("total"),
                (
                    F.sum(F.col("n_chars").cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("avg_value"),
                F.min("n_chars").alias("min_value"),
                F.max("n_chars").alias("max_value"),
            )
            .collect(),
        )
    )
    assert roll == golden_roll

    # end-to-end replay: every store is idempotent, nothing drifts
    run("ck2")
    assert states() == (lsh, cms, est, n_rows, roll)



def test_cdc_distinct_count_view_transitions(spark, tmp_path):
    """The two-level case: the distinct count moves ONLY on 0<->positive
    transitions of a (key, val) pair's support — deleting one of two
    holders of a value changes nothing, deleting the last holder
    decrements, a within-batch value swap (a->b while b->a) nets to a
    zero support delta and an unchanged view, emptied keys vanish, torn
    view writes heal on replay, and compaction preserves the snapshot."""
    import os
    import shutil

    from stream_cdc_gps_spark.streaming.join_view import CdcDistinctCountView

    schema = "op string, seq long, oid long, k long, v string"
    view = CdcDistinctCountView(
        spark, str(tmp_path / "dcv"), key="k", pk="oid", val="v"
    )
    rows = lambda: sorted((r.k, r.n_distinct) for r in view.snapshot().collect())

    # batch 0: key 1 holds {a (x2), b}; key 2 holds {x}
    b0 = [
        ("c", 1, 10, 1, "a"),
        ("c", 2, 11, 1, "a"),
        ("c", 3, 12, 1, "b"),
        ("c", 4, 13, 2, "x"),
    ]
    view.merge(spark.createDataFrame(b0, schema), 0)
    assert rows() == [(1, 2), (2, 1)]

    # batch 1: delete one 'a' holder (no transition — 11 still holds it);
    # rewrite 12 from b to a ('b' dies, 'a' gains a duplicate — net −1);
    # MOVE 13 from key 2 to key 1 with a new value (key 2 empties, key 1
    # gains 'z')
    b1 = [
        ("d", 10, 10, 1, "a"),
        ("u", 11, 12, 1, "a"),
        ("u", 12, 13, 1, "z"),
    ]
    view.merge(spark.createDataFrame(b1, schema), 1)
    golden = [(1, 2)]  # key 1 = {a, z}; key 2 gone
    assert rows() == golden

    # batch 2: a pure value SWAP inside key 1 (11: a->z, 13: z->a) — the
    # support delta nets to zero pair-wise, so NO view partial changes
    b2 = [("u", 20, 11, 1, "z"), ("u", 21, 13, 1, "a")]
    view.merge(spark.createDataFrame(b2, schema), 2)
    assert rows() == golden

    # torn write: batch 1's view partial vanishes, support/changelog
    # survived — stale state visible, replay heals
    shutil.rmtree(os.path.join(view.v_store.partials_path, "batch_id=1"))
    assert rows() == [(1, 2), (2, 1)]
    view.merge(spark.createDataFrame(b1, schema), 1)
    assert rows() == golden

    # compaction folds all three stores; snapshot invariant; replay refused
    view.compact()
    assert view.n_partials() == 1
    assert rows() == golden
    view.merge(spark.createDataFrame(b1, schema), 1)
    assert rows() == golden

    # growth on the compacted base: key 2 revives with two fresh values
    view.merge(
        spark.createDataFrame([("c", 30, 20, 2, "p"), ("c", 31, 21, 2, "q")], schema),
        3,
    )
    assert rows() == [(1, 2), (2, 2)]


def test_cdc_topk_view_reranks_touched_keys(spark, tmp_path):
    """The hybrid case: support counts maintain linearly while the
    ranking recomputes per touched key — deleting holders of the #1
    value demotes it (ties break value-asc), a key-move empties one key
    (superseded, not stale) and reranks the other, torn view writes
    heal on replay, and compaction preserves the snapshot."""
    import os
    import shutil

    from stream_cdc_gps_spark.streaming.join_view import CdcTopKView

    schema = "op string, seq long, oid long, k long, v string"
    view = CdcTopKView(
        spark, str(tmp_path / "tkv"), key="k", pk="oid", val="v", k=2
    )
    rows = lambda: sorted((r.k, r.v, r.n) for r in view.snapshot().collect())

    # batch 0: key 1 counts a=3 b=2 c=1; key 2 counts x=1
    b0 = [
        ("c", 1, 10, 1, "a"),
        ("c", 2, 11, 1, "a"),
        ("c", 3, 12, 1, "a"),
        ("c", 4, 13, 1, "b"),
        ("c", 5, 14, 1, "b"),
        ("c", 6, 15, 1, "c"),
        ("c", 7, 16, 2, "x"),
    ]
    view.merge(spark.createDataFrame(b0, schema), 0)
    assert rows() == [(1, "a", 3), (1, "b", 2), (2, "x", 1)]

    # batch 1: delete two 'a' holders — counts a=1 b=2 c=1; top2 = b,
    # then the a/c tie breaks value-asc to a
    b1 = [("d", 10, 10, 1, "a"), ("d", 11, 11, 1, "a")]
    view.merge(spark.createDataFrame(b1, schema), 1)
    golden = [(1, "a", 1), (1, "b", 2), (2, "x", 1)]
    assert rows() == golden

    # batch 2: MOVE 16 from key 2 to key 1 as a 'c' — key 2 empties
    # (superseded to empty, not stale), key 1 counts a=1 b=2 c=2
    b2 = [("u", 20, 16, 1, "c")]
    view.merge(spark.createDataFrame(b2, schema), 2)
    after2 = [(1, "b", 2), (1, "c", 2)]
    assert rows() == after2

    # torn write: batch 2's view rows vanish — stale, replay heals
    shutil.rmtree(os.path.join(view.v_store.partials_path, "batch_id=2"))
    assert rows() == golden
    view.merge(spark.createDataFrame(b2, schema), 2)
    assert rows() == after2

    # compaction folds all three stores; snapshot invariant; replay refused
    view.compact()
    assert view.n_partials() == 1
    assert rows() == after2
    view.merge(spark.createDataFrame(b2, schema), 2)
    assert rows() == after2

    # growth on the compacted base: key 2 revives
    view.merge(spark.createDataFrame([("c", 30, 17, 2, "y")], schema), 3)
    assert rows() == after2 + [(2, "y", 1)]


def test_cdc_view_suite_composes_and_shares_state(spark, tmp_path):
    """The composed handler: one changelog pair drives all six CDC views
    with the changelog and support stores landed ONCE (shared — no
    per-view copy exists on disk); every member snapshot equals the
    same view maintained standalone over the same batches; a torn
    multi-landing crash (shared changelog + one view store lost) heals
    on replay; compaction preserves the dashboard."""
    import os
    import shutil

    from stream_cdc_gps_spark.streaming.join_view import (
        CdcAggregateView,
        CdcDistinctCountView,
        CdcMinMaxView,
        CdcTopKView,
        CdcViewSuite,
    )

    a_schema = "op string, seq long, oid long, k long, v decimal(18,2), c string"
    b_schema = "op string, seq long, k long"
    from decimal import Decimal as D

    a0 = [
        ("c", 1, 10, 1, D("1.00"), "p"),
        ("c", 2, 11, 1, D("5.00"), "p"),
        ("c", 3, 12, 2, D("9.00"), "q"),
    ]
    b0 = [("c", 1, 1)]
    a1 = [
        ("u", 10, 10, 2, D("2.00"), "r"),  # key move 1->2, new category
        ("d", 11, 12, 2, D("9.00"), "q"),  # delete key 2's only 'q'
    ]
    b1 = [("d", 10, 1)]  # customer 1 vanishes: key 1 loses its match
    mk = lambda rows, s: spark.createDataFrame(rows, s)

    base = str(tmp_path / "suite")
    suite = CdcViewSuite(
        spark, base, key="k", a_pk="oid", b_pk="k", num_val="v", cat_val="c"
    )
    suite.merge(mk(a0, a_schema), mk(b0, b_schema), 0)
    suite.merge(mk(a1, a_schema), mk(b1, b_schema), 1)

    # shared state on disk exactly once: the suite-level changelog and
    # support stores have partials, the per-view copies were never created
    assert os.path.isdir(os.path.join(base, "a", "partials"))
    assert os.path.isdir(os.path.join(base, "s", "partials"))
    for sub in ("join/a", "left/a", "agg/a", "mm/a", "dc/a", "dc/s", "tk/a", "tk/s"):
        assert not os.path.exists(os.path.join(base, sub))

    # member snapshots == the same views maintained standalone
    sa = CdcAggregateView(spark, str(tmp_path / "sa"), key="k", pk="oid", val="v")
    sm = CdcMinMaxView(spark, str(tmp_path / "sm"), key="k", pk="oid", val="v")
    sd = CdcDistinctCountView(spark, str(tmp_path / "sd"), key="k", pk="oid", val="c")
    st_ = CdcTopKView(spark, str(tmp_path / "st"), key="k", pk="oid", val="c", k=2)
    for bid, rows_ in ((0, a0), (1, a1)):
        for v in (sa, sm, sd, st_):
            v.merge(mk(rows_, a_schema), bid)
    snap = lambda df, cols: sorted(map(tuple, df.select(*cols).collect()))
    assert snap(suite.agg.snapshot(), ["k", "n", "total"]) == snap(
        sa.snapshot(), ["k", "n", "total"]
    )
    assert snap(suite.minmax.snapshot(), ["k", "n", "vmin", "vmax"]) == snap(
        sm.snapshot(), ["k", "n", "vmin", "vmax"]
    )
    assert snap(suite.distinct.snapshot(), ["k", "n_distinct"]) == snap(
        sd.snapshot(), ["k", "n_distinct"]
    )
    assert snap(suite.topk.snapshot(), ["k", "c", "n"]) == snap(
        st_.snapshot(), ["k", "c", "n"]
    )

    # dashboard: key 1 empty after the move? no — 11 stays on key 1
    dash = lambda: sorted(
        map(
            tuple,
            suite.snapshot_dashboard()
            .select("k", "n", "total", "vmin", "vmax", "n_distinct", "n_matched")
            .collect(),
        )
    )
    golden = [
        (1, 1, D("5.00"), D("5.00"), D("5.00"), 1, 0),  # b1 deleted its match
        (2, 1, D("2.00"), D("2.00"), D("2.00"), 1, 0),
    ]
    assert dash() == golden

    # torn write: batch 1 of the SHARED changelog and of one view store
    # vanish together — replay heals every member at once
    shutil.rmtree(os.path.join(base, "a", "partials", "batch_id=1"))
    shutil.rmtree(os.path.join(base, "agg", "v", "partials", "batch_id=1"))
    suite.merge(mk(a1, a_schema), mk(b1, b_schema), 1)
    assert dash() == golden

    # compaction: shared stores fold once, dashboard invariant, replay refused
    suite.compact()
    assert suite.n_partials() == 1
    assert dash() == golden
    suite.merge(mk(a1, a_schema), mk(b1, b_schema), 1)
    assert dash() == golden

    # growth on the compacted base: key 1 regains its customer
    suite.merge(mk([], a_schema), mk([("c", 20, 1)], b_schema), 2)
    assert dash() == [
        (1, 1, D("5.00"), D("5.00"), D("5.00"), 1, 1),
        (2, 1, D("2.00"), D("2.00"), D("2.00"), 1, 0),
    ]


def test_quantile_sketch_merges_replays_and_compacts(spark, tmp_path):
    """The quantile member of the sketch triad: per-key equi-depth
    summaries merge across micro-batches with bounded rank error (the
    tie-aware interval of every p50/p90 estimate stays within 3n/C of
    the target), heavy tie-blocks included; a replayed batch overwrites
    its own partition (snapshot invariant); compaction folds via the
    same compression (snapshot invariant, replay refused); two
    identical builds produce byte-identical summaries (the DECIMAL
    order-proof claim)."""
    from stream_cdc_gps_spark.streaming.quantile_index import (
        N_STRATA,
        IncrementalQuantileSketch,
    )

    # key a: skewed with a heavy tie-block (300 zeros + 0..699);
    # key b: quadratic spread, 500 values
    vals_a = [0] * 300 + list(range(700))
    vals_b = [i * i % 1000 for i in range(500)]
    rows = [("a", v) for v in vals_a] + [("b", v) for v in vals_b]
    schema = "k string, v long"

    def ok(vals, est, q):
        import math

        n = len(vals)
        target = math.ceil(q * n)
        tol = math.ceil(3.0 * n / N_STRATA)
        lt = sum(1 for x in vals if x < est)
        le = sum(1 for x in vals if x <= est)
        return lt <= target + tol and le >= target - tol

    def build(base):
        idx = IncrementalQuantileSketch(spark, base)
        for bid in range(3):
            sl = [r for i, r in enumerate(rows) if i % 3 == bid]
            idx.merge(spark.createDataFrame(sl, schema), "k", "v", bid)
        return idx

    idx = build(str(tmp_path / "qs1"))
    summary1 = sorted(map(tuple, idx.summary().collect()))
    assert {r[0] for r in summary1} == {"a", "b"}
    # bounded summary: at most C strata per key however many rows landed
    from collections import Counter

    per_key = Counter(r[0] for r in summary1)
    assert max(per_key.values()) <= N_STRATA

    est = {
        (r.key, r.q): r.est for r in idx.quantiles([0.5, 0.9]).collect()
    }
    for key, vals in (("a", vals_a), ("b", vals_b)):
        for q in (0.5, 0.9):
            assert ok(vals, est[(key, q)], q), (key, q, est[(key, q)])

    # determinism: an identical second build lands identical bytes
    idx2 = build(str(tmp_path / "qs2"))
    assert sorted(map(tuple, idx2.summary().collect())) == summary1

    # replay of the last batch: overwrites its own partition, invariant
    sl2 = [r for i, r in enumerate(rows) if i % 3 == 2]
    idx.merge(spark.createDataFrame(sl2, schema), "k", "v", 2)
    assert sorted(map(tuple, idx.summary().collect())) == summary1

    # compaction: same compression as the fold — snapshot invariant,
    # folded-batch replay refused
    idx.compact()
    assert idx.n_partials() == 1
    after = sorted(map(tuple, idx.summary().collect()))
    est2 = {(r.key, r.q): r.est for r in idx.quantiles([0.5, 0.9]).collect()}
    for key, vals in (("a", vals_a), ("b", vals_b)):
        for q in (0.5, 0.9):
            assert ok(vals, est2[(key, q)], q), (key, q, est2[(key, q)])
    idx.merge(spark.createDataFrame(sl2, schema), "k", "v", 2)
    assert sorted(map(tuple, idx.summary().collect())) == after

    # growth on the compacted base: new values shift the estimates
    idx.merge(
        spark.createDataFrame([("a", 10_000)] * 200, schema), "k", "v", 3
    )
    vals_a3 = vals_a + [10_000] * 200
    est3 = {(r.key, r.q): r.est for r in idx.quantiles([0.9]).collect()}
    assert ok(vals_a3, est3[("a", 0.9)], 0.9)


def test_cdc_view_suite_streaming_end_to_end(spark, tmp_path):
    """Streaming form of q201: ONE file stream carries BOTH tables'
    changelogs multiplexed with a ``side`` tag (the Debezium
    one-connector-many-tables shape, reference connector.json), split
    inside the foreachBatch handler; two availableNow micro-batches
    drive all six views and the dashboard equals the hand-computed
    final state; a worst-case full replay from a fresh checkpoint is a
    no-op."""
    from stream_cdc_gps_spark.streaming.join_view import CdcViewSuite

    src = tmp_path / "in"
    src.mkdir()
    b0 = [
        {"side": "a", "op": "c", "seq": 1, "oid": 10, "k": 1, "v": "1.00", "c": "p"},
        {"side": "a", "op": "c", "seq": 2, "oid": 11, "k": 1, "v": "5.00", "c": "p"},
        {"side": "a", "op": "c", "seq": 3, "oid": 12, "k": 2, "v": "9.00", "c": "q"},
        {"side": "b", "op": "c", "seq": 1, "k": 1},
    ]
    b1 = [
        {"side": "a", "op": "u", "seq": 10, "oid": 10, "k": 2, "v": "2.00", "c": "r"},
        {"side": "a", "op": "d", "seq": 11, "oid": 12, "k": 2, "v": "9.00", "c": "q"},
        {"side": "b", "op": "d", "seq": 10, "k": 1},
    ]
    (src / "b0.jsonl").write_text("\n".join(json.dumps(r) for r in b0))
    (src / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in b1))

    suite = CdcViewSuite(
        spark,
        str(tmp_path / "suite"),
        key="k",
        a_pk="oid",
        b_pk="k",
        num_val="v",
        cat_val="c",
    )
    schema = (
        "side string, op string, seq long, oid long, k long, v string, c string"
    )

    def handler(df, bid):
        a = df.filter(F.col("side") == "a").select(
            "op", "seq", "oid", "k", F.col("v").cast("decimal(18,2)").alias("v"), "c"
        )
        b = df.filter(F.col("side") == "b").select("op", "seq", "k")
        suite.merge(a, b, bid)

    def run(ck: str) -> None:
        stream = (
            spark.readStream.schema("value string")
            .option("maxFilesPerTrigger", "1")  # two real micro-batches
            .format("text")
            .load(str(src))
            .select(F.from_json("value", schema).alias("m"))
            .select("m.*")
        )
        q = (
            stream.writeStream.foreachBatch(handler)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not terminate"

    run("ck1")

    from decimal import Decimal as D

    dash = lambda: sorted(
        map(
            tuple,
            suite.snapshot_dashboard()
            .select("k", "n", "total", "vmin", "vmax", "n_distinct", "n_matched")
            .collect(),
        )
    )
    golden = [
        (1, 1, D("5.00"), D("5.00"), D("5.00"), 1, 0),
        (2, 1, D("2.00"), D("2.00"), D("2.00"), 1, 0),
    ]
    assert dash() == golden

    # worst-case restart: a fresh checkpoint replays every micro-batch;
    # rows_before(t) reads + idempotent partition overwrites make it a no-op
    run("ck2")
    assert dash() == golden
