"""Tests for source readers (corrupt routing) and stateful trip segmentation."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stream_cdc_gps_spark.sources import readers

try:  # transformWithStateInPandas speaks protobuf to its state server
    import google.protobuf  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False


def test_json_reader_routes_corrupt(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text(
        "\n".join(
            [
                json.dumps({"id": 1, "name": "ok"}),
                "not json at all",
                json.dumps({"id": 2, "name": "fine"}),
            ]
        )
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    df = readers.read_json(spark, str(p), schema)
    good, bad = readers.split_corrupt(df)
    assert sorted(r["id"] for r in good.collect()) == [1, 2]
    assert bad.collect()[0][readers.CORRUPT_COL] == "not json at all"
    assert readers.CORRUPT_COL not in good.columns


def test_csv_reader_schema_and_corrupt(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("id,qty\n1,10\n2,notanumber\n3,30\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("qty", T.LongType())]
    )
    good, bad = readers.split_corrupt(readers.read_csv(spark, str(p), schema))
    assert sorted(r["qty"] for r in good.collect()) == [10, 30]
    # collect, not count(): count() prunes the projection back down to the
    # corrupt column alone, which Spark refuses over a raw scan (SPARK-26108)
    assert len(bad.collect()) == 1


def test_trip_segmentation_batch(spark):
    """applyInPandas trip state machine: gaps > 30 min split trips."""
    M = 60_000_000  # one minute in µs
    rows = [
        # device A: two trips (gap of 40 min between us=2M and us=42M minutes)
        ("f1", "A", 0 * M, 10.0, 20.0),
        ("f2", "A", 1 * M, 10.1, 20.0),
        ("f3", "A", 2 * M, 10.3, 20.0),
        ("f4", "A", 42 * M, 11.0, 21.0),
        ("f5", "A", 43 * M, 11.2, 21.0),
        # device B: one trip
        ("f6", "B", 5 * M, 50.0, 60.0),
    ]
    fixes = spark.createDataFrame(
        rows, "gps_id string, device_id string, us long, lat double, lon double"
    )
    from stream_cdc_gps_spark.streaming.stateful import segment_trips_batch

    trips = {
        (r["device_id"], r["trip_seq"]): r
        for r in segment_trips_batch(fixes).collect()
    }
    assert set(trips) == {("A", 1), ("A", 2), ("B", 1)}
    a1 = trips[("A", 1)]
    assert a1["n_fixes"] == 3
    assert (a1["start_us"], a1["end_us"]) == (0, 2 * M)
    assert abs(a1["dist_deg"] - 0.3) < 1e-9  # |0.1| + |0.2| manhattan in degrees
    a2 = trips[("A", 2)]
    assert a2["n_fixes"] == 2
    assert abs(a2["dist_deg"] - 0.2) < 1e-9


def test_trip_segmentation_stream_closes_on_gap(spark, tmp_path):
    """Streaming state machine emits a trip when a later fix arrives past the
    gap; the still-open trip stays in state (closed later by timeout)."""
    M = 60_000_000
    src = tmp_path / "in"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    src.mkdir()
    rows = [
        {"gps_id": "f1", "device_id": "A", "us": 0, "lat": 10.0, "lon": 20.0},
        {"gps_id": "f2", "device_id": "A", "us": 2 * M, "lat": 10.5, "lon": 20.0},
        {"gps_id": "f3", "device_id": "A", "us": 60 * M, "lat": 12.0, "lon": 22.0},
    ]
    (src / "b0.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    schema = "gps_id string, device_id string, us long, lat double, lon double"
    stream = (
        spark.readStream.schema("value string").format("text").load(str(src))
        .select(F.from_json("value", schema).alias("m"))
        .select("m.*")
    )
    from stream_cdc_gps_spark.streaming.stateful import segment_trips_stream

    q = (
        segment_trips_stream(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ck))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(spark.read.parquet(str(out)).collect(), key=lambda r: r["trip_seq"])
    # trip 1 (f1,f2) closed by the 58-min gap before f3. The open trip 2 MAY
    # also flush: availableNow fires processing-time timeouts on shutdown.
    assert len(got) in (1, 2)
    r = got[0]
    assert (r["device_id"], r["trip_seq"], r["n_fixes"]) == ("A", 1, 2)
    assert (r["start_us"], r["end_us"]) == (0, 2 * M)
    if len(got) == 2:
        assert (got[1]["trip_seq"], got[1]["n_fixes"]) == (2, 1)


@pytest.mark.skipif(not _HAS_PROTOBUF, reason="transformWithStateInPandas needs protobuf (absent in sandbox)")
def test_trip_segmentation_tws_closes_on_gap(spark, tmp_path):
    """Spark 4 transformWithStateInPandas trip machine: same scenario as the
    v1 GroupState test — the in-data gap closes trip 1; the still-open trip
    may flush on shutdown via the idle timer."""
    M = 60_000_000
    src = tmp_path / "in"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    src.mkdir()
    rows = [
        {"gps_id": "f1", "device_id": "A", "us": 0, "lat": 10.0, "lon": 20.0},
        {"gps_id": "f2", "device_id": "A", "us": 2 * M, "lat": 10.5, "lon": 20.0},
        {"gps_id": "f3", "device_id": "A", "us": 60 * M, "lat": 12.0, "lon": 22.0},
    ]
    (src / "b0.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    schema = "gps_id string, device_id string, us long, lat double, lon double"
    stream = (
        spark.readStream.schema("value string").format("text").load(str(src))
        .select(F.from_json("value", schema).alias("m"))
        .select("m.*")
    )
    from stream_cdc_gps_spark.streaming.stateful import segment_trips_stream_tws

    q = (
        segment_trips_stream_tws(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ck))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(spark.read.parquet(str(out)).collect(), key=lambda r: r["trip_seq"])
    assert len(got) in (1, 2)
    r = got[0]
    assert (r["device_id"], r["trip_seq"], r["n_fixes"]) == ("A", 1, 2)
    assert (r["start_us"], r["end_us"]) == (0, 2 * M)
    assert abs(r["dist_deg"] - 0.5) < 1e-9
    if len(got) == 2:
        assert (got[1]["trip_seq"], got[1]["n_fixes"]) == (2, 1)


def test_trip_segmentation_tws_matches_v1_and_batch(spark, tmp_path):
    """Semantic equivalence across the implementations: batch applyInPandas,
    v1 applyInPandasWithState, and — when the sandbox has protobuf — v2
    transformWithStateInPandas produce identical CLOSED trips on a
    multi-device multi-gap feed (open trips may or may not flush on
    shutdown, so the comparison is on the common closed prefix per device).
    The v2 leg is environment-gated: its state-server protocol imports
    google.protobuf, which this sandbox lacks (same gating as the Kafka
    broker paths)."""
    M = 60_000_000
    rows = [
        {"gps_id": f"f{i}", "device_id": dev, "us": us * M, "lat": la, "lon": lo}
        for i, (dev, us, la, lo) in enumerate(
            [
                ("A", 0, 10.0, 20.0),
                ("A", 1, 10.1, 20.2),
                ("A", 45, 11.0, 21.0),   # gap: closes A trip 1
                ("A", 46, 11.3, 21.1),
                ("A", 100, 12.0, 22.0),  # gap: closes A trip 2
                ("B", 5, 50.0, 60.0),
                ("B", 90, 51.0, 61.0),   # gap: closes B trip 1
            ]
        )
    ]
    schema = "gps_id string, device_id string, us long, lat double, lon double"

    batch_df = spark.createDataFrame(
        [(r["gps_id"], r["device_id"], r["us"], r["lat"], r["lon"]) for r in rows],
        schema,
    )
    from stream_cdc_gps_spark.streaming.stateful import (
        segment_trips_batch,
        segment_trips_stream,
        segment_trips_stream_tws,
    )

    expected_closed = {
        (r["device_id"], r["trip_seq"]): (
            r["n_fixes"], r["start_us"], r["end_us"], round(r["dist_deg"], 9)
        )
        # batch closes ALL trips; streaming only guarantees gap-closed ones
        for r in segment_trips_batch(batch_df).collect()
    }

    def run_stream(factory, tag):
        src = tmp_path / f"in_{tag}"
        out = tmp_path / f"out_{tag}"
        ck = tmp_path / f"ck_{tag}"
        src.mkdir()
        (src / "b0.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
        stream = (
            spark.readStream.schema("value string").format("text").load(str(src))
            .select(F.from_json("value", schema).alias("m"))
            .select("m.*")
        )
        q = (
            factory(stream)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ck))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["device_id"], r["trip_seq"]): (
                r["n_fixes"], r["start_us"], r["end_us"], round(r["dist_deg"], 9)
            )
            for r in spark.read.parquet(str(out)).collect()
        }

    runs = [("v1", run_stream(segment_trips_stream, "v1"))]
    if _HAS_PROTOBUF:
        runs.append(("v2", run_stream(segment_trips_stream_tws, "v2")))
    # every trip a streaming impl emitted must match the batch answer exactly
    for tag, got in runs:
        assert got, f"{tag} emitted nothing"
        for k, v in got.items():
            assert expected_closed[k] == v, (tag, k, v, expected_closed[k])
    if len(runs) == 2:
        assert runs[0][1] == runs[1][1]
