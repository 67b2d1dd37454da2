"""Semantic invariants on edge-case inputs (SURVEY.md §5 robustness model).

One Spark job per test over a batch of adversarial strings — whitespace
variants, empties, unicode, repeated tokens — asserting the properties the
dedup/text operators depend on."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_cdc_gps_spark.functions.geo import haversine_m
from stream_cdc_gps_spark.functions.text import fingerprint, word_shingles

EDGE_TEXTS = [
    "plain text here",
    "plain  text   here",          # multi-space
    "  plain text here  ",         # leading/trailing
    "plain\ttext\there",           # tabs
    "PLAIN TEXT HERE",             # case
    "",                            # empty
    " ",                           # whitespace only
    "one",                         # single token
    "the the the the",             # repeated stop-token
    "naïve café déjà-vu",          # unicode
]


def test_fingerprint_whitespace_and_case_invariance(spark):
    """fingerprint() must collapse whitespace runs and case so that
    trivially-reformatted duplicates collide."""
    df = spark.createDataFrame([(t,) for t in EDGE_TEXTS], "text string")
    fps = [r["fp"] for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    # rows 0-4 are the same content reformatted -> one fingerprint
    assert len({fps[0], fps[1], fps[2], fps[4]}) == 1
    # tabs are whitespace too
    assert fps[3] == fps[0]
    # empty and whitespace-only collapse together, distinct from content
    assert fps[5] == fps[6] != fps[0]


def test_minhash_duplicate_invariance(spark):
    """min over a shingle MULTISET equals min over its distinct set — the
    property that lets signatures skip per-row array_distinct."""
    a = "alpha beta gamma delta epsilon"
    df = spark.createDataFrame([(a,), (a,)], "text string")
    toks = df.select(F.split("text", " ").alias(
        "toks"
    ))
    shs = toks.select(word_shingles(F.col("toks"), 3).alias("shs"))
    sig = shs.select(
        F.array_min(F.transform("shs", lambda s: F.md5(F.concat(F.lit("0|"), s)))).alias("h")
    )
    h1, h2 = [r["h"] for r in sig.collect()]
    assert h1 == h2
    # and explicitly: min over dupes == min over distinct
    dup = spark.createDataFrame([(["x y z", "x y z", "a b c"],)], "shs array<string>")
    dis = spark.createDataFrame([(["x y z", "a b c"],)], "shs array<string>")
    m = lambda d: d.select(
        F.array_min(F.transform("shs", lambda s: F.md5(s))).alias("h")
    ).collect()[0]["h"]
    assert m(dup) == m(dis)


def test_haversine_symmetry_and_zero(spark):
    df = spark.createDataFrame(
        [(35.7, 51.4, 48.85, 2.35), (10.0, 20.0, 10.0, 20.0)],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    out = df.select(
        haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d12"),
        haversine_m(F.col("lat2"), F.col("lon2"), F.col("lat1"), F.col("lon1")).alias("d21"),
    ).collect()
    assert abs(out[0]["d12"] - out[0]["d21"]) < 1e-9  # symmetric
    assert out[1]["d12"] == 0.0  # identical points
    # Tehran -> Paris is ~4200 km; sanity-bound the magnitude
    assert 4_000_000 < out[0]["d12"] < 4_500_000


def test_hash_split_is_repartition_stable(spark):
    """q87's split depends only on doc_id — identical under any partitioning."""
    from stream_cdc_gps_spark.operators.textops import q87_train_val_split

    sf = "/root/testdata/sf0.001"
    a = {(r["split"], r["lang"]): r["n_docs"] for r in q87_train_val_split(spark, sf).collect()}
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = {(r["split"], r["lang"]): r["n_docs"] for r in q87_train_val_split(spark, sf).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_events_loader_handles_both_ts_physical_units(spark, tmp_path):
    """The corpus has shipped events.ts as TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) across regenerations (it flipped between rounds 3 and
    4); the loader probes the parquet footer and must land the SAME
    wall-clock µs timestamps either way — under the wrong assumption every
    event time is silently off by 1000x."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stream_cdc_gps_spark.tables import load_table

    base_us = 1_704_067_207_179_575  # 2024-01-01T00:00:07.179575Z
    rows = {
        "event_id": [0, 1],
        "user_id": [10, 11],
        "event_type": ["a", "b"],
        "value": [1.0, 2.0],
        "props": ["{}", "{}"],
    }
    expected = None
    for unit in ("us", "ns"):
        d = tmp_path / unit
        d.mkdir()
        scale = 1 if unit == "us" else 1000
        table = pa.table(
            {
                "event_id": pa.array(rows["event_id"], pa.int64()),
                "ts": pa.array(
                    [(base_us + i) * scale for i in range(2)], pa.timestamp(unit)
                ),
                "user_id": pa.array(rows["user_id"], pa.int64()),
                "event_type": pa.array(rows["event_type"]),
                "value": pa.array(rows["value"], pa.float64()),
                "props": pa.array(rows["props"]),
            }
        )
        pq.write_table(table, str(d / "events.parquet"), store_schema=False)
        got = sorted(
            (r["event_id"], r["ts"].isoformat())
            for r in load_table(spark, str(d), "events").collect()
        )
        if expected is None:
            expected = got
        assert got == expected, f"unit {unit} diverged: {got} vs {expected}"
    assert expected[0][1].startswith("2024-01-01T00:00:07.179575")


def test_events_ts_probe_survives_in_place_regeneration(spark, tmp_path):
    """The footer probe's cache must not outlive the file it probed: the
    corpus is regenerated IN PLACE between rounds, and a unit verdict cached
    on path alone would corrupt every event timestamp 1000x after a
    micros<->nanos flip at the same path (ADVICE r4). Also: a tz-annotated
    nanos column (timestamp[ns, tz=...]) must take the raw-long path — only
    exact-type equality missed it, and Spark errors on INT64
    TIMESTAMP(NANOS) on the native path."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from stream_cdc_gps_spark.tables import load_table

    base_us = 1_704_067_207_179_575
    d = tmp_path / "corpus"
    d.mkdir()
    path = str(d / "events.parquet")

    def write(unit: str, tz: str | None = None) -> None:
        scale = 1 if unit == "us" else 1000
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([0, 1], pa.int64()),
                    "ts": pa.array(
                        [(base_us + i) * scale for i in range(2)],
                        pa.timestamp(unit, tz=tz),
                    ),
                    "user_id": pa.array([10, 11], pa.int64()),
                    "event_type": pa.array(["a", "b"]),
                    "value": pa.array([1.0, 2.0], pa.float64()),
                    "props": pa.array(["{}", "{}"]),
                }
            ),
            path,
            store_schema=False,
        )

    def load_times() -> list[str]:
        return sorted(
            r["ts"].isoformat() for r in load_table(spark, str(d), "events").collect()
        )

    write("us")
    expected = load_times()
    # regenerate IN PLACE as nanos; nudge mtime in case the fs clock is coarse
    write("ns")
    os.utime(path, ns=(time.time_ns(), time.time_ns() + 1))
    assert load_times() == expected, "stale cached unit verdict after in-place regen"
    # tz-annotated nanos must also route to the raw-long truncation path
    write("ns", tz="UTC")
    os.utime(path, ns=(time.time_ns(), time.time_ns() + 2))
    assert load_times() == expected, "tz-annotated nanos mis-routed"
