"""Tests for source readers (corrupt routing) and stateful trip segmentation."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from stream_cdc_gps_spark.sources import readers


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
