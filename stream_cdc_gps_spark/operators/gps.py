"""GPS / CDC operators in batch form (SURVEY.md §2A ops #2,#3,#4,#9,#10 and
§7.2 M3 analytics).

The streaming graph (stream_cdc_gps_spark.streaming) is built from pure
DataFrame->DataFrame functions; these queries exercise the SAME transforms on
a deterministic batch of GPS fixes derived from the events corpus table, so
the DuckDB oracle can check them. The derivation (lat/lon as arithmetic over
user_id/event_id/value) is replicated exactly in the oracle SQL.

Reference semantics preserved on purpose (SURVEY.md §7.3):
- WKT is ``POINT(lon lat)`` — longitude FIRST (``cmd/main.go:210``),
- record id is a string, not a parsed timestamp (``cmd/main.go:103``),
- CDC handling is insert-only after-image extraction (``cmd/main.go:233-240``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stream_cdc_gps_spark.functions.geo import HAVERSINE_SQL, haversine_m, wkt_point
from stream_cdc_gps_spark.operators.common import t
from stream_cdc_gps_spark.registry import query

# Deterministic synthetic GPS fixes derived from the events table — the SQL
# and DataFrame versions are the same arithmetic, term for term.
FIXES_SQL = """
SELECT CAST(event_id AS VARCHAR)                          AS gps_id,
       'dev-' || lpad(CAST(user_id AS VARCHAR), 3, '0')   AS device_id,
       ts,
       epoch_us(ts)                                       AS us,
       35.0 + (user_id % 100) * CAST(0.01 AS DOUBLE)
            + value * CAST(0.0001 AS DOUBLE)              AS lat,
       51.0 + (event_id % 1000) * CAST(0.001 AS DOUBLE)   AS lon
FROM events
"""


def fixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> deterministic GPS fixes (device_id, ts, lat, lon)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        F.col("event_id").cast("string").alias("gps_id"),
        F.concat(F.lit("dev-"), F.lpad(F.col("user_id").cast("string"), 3, "0")).alias(
            "device_id"
        ),
        "ts",
        F.unix_micros("ts").alias("us"),
        (35.0 + (F.col("user_id") % 100) * 0.01 + F.col("value") * 0.0001).alias("lat"),
        (51.0 + (F.col("event_id") % 1000) * 0.001).alias("lon"),
    )


@query(
    "q40_wkt_points",
    oracle=f"""
SELECT gps_id,
       printf('POINT(%f %f)', lon, lat) AS geo_point,
       lat AS latitude,
       lon AS longitude
FROM ({FIXES_SQL})
""",
)
def q40_wkt_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometry construction — the landed ``location_instances`` shape.

    WKT built with format_string exactly as the reference's
    ``fmt.Sprintf("POINT(%f %f)", lon, lat)`` (``cmd/main.go:210``): lon
    first, %f six decimals. Pure column expression, no UDF."""
    return fixes(spark, sf_dir).select(
        "gps_id",
        wkt_point(F.col("lon"), F.col("lat")).alias("geo_point"),
        F.col("lat").alias("latitude"),
        F.col("lon").alias("longitude"),
    )


_HAV = HAVERSINE_SQL.format(
    lat1="lag(lat) OVER w", lon1="lag(lon) OVER w", lat2="lat", lon2="lon"
)


@query(
    "q41_derived_motion",
    oracle=f"""
SELECT gps_id, device_id, ts, lat, lon,
       round({_HAV}, 3) AS dist_m,
       CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 0
            THEN round(({_HAV}) / ((epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1000000.0), 6)
       END AS speed_ms
FROM ({FIXES_SQL})
WINDOW w AS (PARTITION BY device_id ORDER BY ts, gps_id)
""",
)
def q41_derived_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-device derived motion: haversine distance + speed between
    consecutive fixes (lag over event time) — the analytics the reference's
    PostGIS table exists to serve, as pure column expressions."""
    fx = fixes(spark, sf_dir)
    w = Window.partitionBy("device_id").orderBy("ts", "gps_id")
    plat, plon = F.lag("lat").over(w), F.lag("lon").over(w)
    dist = haversine_m(plat, plon, F.col("lat"), F.col("lon"))
    gap_us = F.col("us") - F.lag("us").over(w)
    return fx.select(
        "gps_id",
        "device_id",
        "ts",
        "lat",
        "lon",
        F.round(dist, 3).alias("dist_m"),
        F.when(gap_us > 0, F.round(dist / (gap_us / 1_000_000.0), 6)).alias("speed_ms"),
    )


@query(
    "q42_trip_sessions",
    oracle=f"""
WITH flagged AS (
    SELECT device_id, gps_id, ts, us,
           CASE WHEN us - lag(us) OVER (PARTITION BY device_id ORDER BY ts, gps_id)
                     > 1800000000
                  OR lag(us) OVER (PARTITION BY device_id ORDER BY ts, gps_id) IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM ({FIXES_SQL})
), sessions AS (
    SELECT device_id, ts, us,
           CAST(sum(is_new) OVER (PARTITION BY device_id ORDER BY ts, gps_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_seq
    FROM flagged
)
SELECT device_id, session_seq, count(*) AS n_fixes,
       min(us) AS start_us, max(us) AS end_us
FROM sessions
GROUP BY device_id, session_seq
""",
)
def q42_trip_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trip segmentation: a >30 min gap starts a new session.

    Batch analogue of ``session_window`` (the streaming path in
    streaming/gps_pipeline.py uses the native session window); expressed as
    gap-flag + running-sum so the oracle can verify identical semantics."""
    fx = fixes(spark, sf_dir)
    w = Window.partitionBy("device_id").orderBy("ts", "gps_id")
    prev_us = F.lag("us").over(w)
    flagged = fx.withColumn(
        "is_new",
        F.when((F.col("us") - prev_us > 1_800_000_000) | prev_us.isNull(), 1).otherwise(0),
    )
    w_run = (
        Window.partitionBy("device_id")
        .orderBy("ts", "gps_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn("session_seq", F.sum("is_new").over(w_run))
    return sessions.groupBy("device_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_fixes"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
    )


@query(
    "q43_tumbling_hourly",
    oracle=f"""
SELECT device_id,
       date_trunc('hour', ts)         AS window_start,
       count(*)                       AS n_fixes,
       floor(avg(lat) * 1e6) / 1e6    AS avg_lat,
       floor(avg(lon) * 1e6) / 1e6    AS avg_lon
FROM ({FIXES_SQL})
GROUP BY device_id, date_trunc('hour', ts)
""",
)
def q43_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate per device (Spark ``window()``).

    Epoch-aligned 1h windows coincide with date_trunc('hour'), which is what
    the oracle checks; in the streaming graph the same expression runs
    incrementally with a watermark.

    avg(lat)/avg(lon) over ~singleton groups is effectively a raw picked
    value; round() at an exact-half double diverges between Spark (HALF_UP)
    and DuckDB (banker's-ish double rounding). floor(x*1e6)/1e6 is tie-free
    and bit-identical on both engines."""
    fx = fixes(spark, sf_dir)
    return (
        fx.groupBy("device_id", F.window("ts", "1 hour").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_fixes"),
            (F.floor(F.avg("lat") * F.lit(1e6)) / F.lit(1e6)).alias("avg_lat"),
            (F.floor(F.avg("lon") * F.lit(1e6)) / F.lit(1e6)).alias("avg_lon"),
        )
        .select("device_id", F.col("win.start").alias("window_start"), "n_fixes", "avg_lat", "avg_lon")
    )


# Debezium-style envelope schema: only the fields the engine consumes
# (reference models after.{id,latitude,longitude} only, ``cmd/main.go:233-240``;
# we add op/source/ts_us for the full-CDC mode, FIXTURES.md A3).
DEBEZIUM_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField(
            "after",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("latitude", T.DoubleType()),
                    T.StructField("longitude", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("source", T.StructType([T.StructField("table", T.StringType())])),
        T.StructField("ts_us", T.LongType()),
    ]
)


@query(
    "q44_cdc_roundtrip",
    oracle=f"""
SELECT gps_id, printf('POINT(%f %f)', lon, lat) AS geo_point,
       lat AS latitude, lon AS longitude
FROM ({FIXES_SQL})
""",
)
def q44_cdc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC envelope encode → decode → after-image extraction → geometry.

    Builds a Debezium-style change event per fix with to_json (the wire shape
    the reference consumes), parses it back with from_json, filters to
    inserts, projects ``after.*`` (``cmd/main.go:203-210``), and lands the
    ``location_instances`` shape. The oracle computes the same rows directly —
    any encode/decode infidelity (type coercion, precision loss) fails the
    diff. Doubles survive exactly: JSON encoding uses shortest round-trip
    representation."""
    fx = fixes(spark, sf_dir)
    envelope = fx.select(
        F.to_json(
            F.struct(
                F.lit("c").alias("op"),
                F.struct(
                    F.col("gps_id").alias("id"),
                    F.col("lat").alias("latitude"),
                    F.col("lon").alias("longitude"),
                ).alias("after"),
                F.struct(F.lit("gps-data").alias("table")).alias("source"),
                F.col("us").alias("ts_us"),
            )
        ).alias("value")
    )
    decoded = envelope.select(F.from_json("value", DEBEZIUM_SCHEMA).alias("m"))
    return (
        decoded.filter(F.col("m.op") == "c")
        .filter(F.col("m.after").isNotNull())
        .select(
            F.col("m.after.id").alias("gps_id"),
            wkt_point(F.col("m.after.longitude"), F.col("m.after.latitude")).alias("geo_point"),
            F.col("m.after.latitude").alias("latitude"),
            F.col("m.after.longitude").alias("longitude"),
        )
    )


@query(
    "q45_cdc_dedup",
    oracle=f"""
SELECT DISTINCT gps_id, lat, lon FROM (
    SELECT gps_id, lat, lon FROM ({FIXES_SQL})
    UNION ALL
    SELECT gps_id, lat, lon FROM ({FIXES_SQL}) WHERE CAST(gps_id AS BIGINT) % 3 = 0
)
""",
)
def q45_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC replay dedup: re-delivered change events collapse on the record id.

    Batch analogue of ``dropDuplicatesWithinWatermark([\"gps_id\"])`` — the
    reference's id (raw timestamp string, ``cmd/main.go:103``) is its natural
    dedup key; replays are identical rows so keep-first is deterministic."""
    fx = fixes(spark, sf_dir).select("gps_id", "lat", "lon")
    replayed = fx.filter(F.col("gps_id").cast("bigint") % 3 == 0)
    return fx.unionByName(replayed).dropDuplicates(["gps_id"])


@query(
    "q46_session_window_native",
    oracle=f"""
WITH flagged AS (
    SELECT device_id, gps_id, ts, us,
           CASE WHEN us - lag(us) OVER (PARTITION BY device_id ORDER BY ts, gps_id)
                     > 1800000000
                  OR lag(us) OVER (PARTITION BY device_id ORDER BY ts, gps_id) IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM ({FIXES_SQL})
), sessions AS (
    SELECT device_id, us,
           CAST(sum(is_new) OVER (PARTITION BY device_id ORDER BY ts, gps_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_seq
    FROM flagged
)
SELECT device_id,
       epoch_us(to_timestamp(min(us) / 1000000.0))            AS session_start_us,
       epoch_us(to_timestamp(max(us) / 1000000.0)) + 1800000000 AS session_end_us,
       count(*) AS n_fixes
FROM sessions
GROUP BY device_id, session_seq
""",
)
def q46_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window (30-min gap), checked against the
    manual gap-flag + running-sum sessionization (q42's formulation) — a
    differential test that the built-in operator and the from-first-principles
    SQL agree. Session end in Spark's definition = last event + gap."""
    fx = fixes(spark, sf_dir)
    return (
        fx.groupBy("device_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_fixes"))
        .select(
            "device_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_fixes",
        )
    )


@query(
    "q97_sliding_window_rate",
    oracle=f"""
WITH fx AS ({FIXES_SQL}),
expanded AS (
    SELECT device_id,
           time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
               AS window_start
    FROM fx, UNNEST([0, 1, 2, 3]) AS u(k)
)
SELECT device_id, window_start,
       window_start + INTERVAL '1 hour' AS window_end,
       count(*) AS n_fixes
FROM expanded
GROUP BY device_id, window_start
""",
)
def q97_sliding_window_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING window (width 1 h, slide 15 min): rolling per-device fix rate.

    ``window(ts, "1 hour", "15 minutes")`` assigns each fix to the 4
    overlapping hour windows that contain it — the §2B sliding-windows row
    (slide != width). The oracle reproduces Spark's assignment from first
    principles: a fix at time t belongs to windows starting at
    bucket15(t) - k*15min for k in 0..3 (both engines epoch-align sub-day
    buckets). In the streaming graph the identical expression runs
    incrementally under a watermark; state is bounded by
    (width / slide) * |devices| open windows."""
    fx = fixes(spark, sf_dir)
    return (
        fx.groupBy("device_id", F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_fixes"))
        .select(
            "device_id",
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_fixes",
        )
    )


@query(
    "q86_cdc_snapshot_upsert",
    oracle=f"""
WITH fx AS ({FIXES_SQL}),
chg AS (
    SELECT device_id, gps_id, ts, lat, lon,
           CASE WHEN CAST(gps_id AS BIGINT) % 11 = 0 THEN 'd'
                WHEN CAST(gps_id AS BIGINT) % 3  = 0 THEN 'u'
                ELSE 'c' END AS op
    FROM fx
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY device_id
                                 ORDER BY ts DESC, gps_id DESC) AS rn
    FROM chg
)
SELECT device_id, gps_id, op, lat, lon
FROM ranked WHERE rn = 1 AND op <> 'd'
""",
)
def q86_cdc_snapshot_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → snapshot materialization: the keyed upsert view a CDC
    consumer maintains (the table the reference's JDBC sink would converge
    to under full-CDC semantics, SURVEY.md §7.3 — c/u set the row, d removes
    it). Latest change per key wins; keys whose last op is a delete vanish.

    Ops are derived deterministically from the fix id so the oracle can
    reproduce the changelog. Plan: ONE shuffle on the key (the window
    partition); per-key state is a single row — exactly the merge a
    1000-executor foreachBatch MERGE INTO performs, expressed relationally.
    Tiebreak on (ts, gps_id) is total, so the snapshot is deterministic."""
    fx = fixes(spark, sf_dir)
    gid = F.col("gps_id").cast("bigint")
    chg = fx.select(
        "device_id", "gps_id", "ts", "lat", "lon",
        F.when(gid % 11 == 0, "d").when(gid % 3 == 0, "u").otherwise("c").alias("op"),
    )
    w = Window.partitionBy("device_id").orderBy(F.desc("ts"), F.desc("gps_id"))
    return (
        chg.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "d"))
        .select("device_id", "gps_id", "op", "lat", "lon")
    )


# Irregular, partially OVERLAPPING geofence boxes (lat/lon bounds): literal
# dim shared verbatim by the Spark literal DataFrame and the oracle VALUES.
GEOFENCES = [
    # (zone, lat_min, lat_max, lon_min, lon_max)
    ("downtown",  35.20, 35.45, 51.10, 51.40),
    ("airport",   35.40, 35.60, 51.30, 51.55),  # overlaps downtown corner
    ("port",      35.05, 35.15, 51.70, 51.95),
    ("suburb_n",  35.70, 35.99, 51.05, 51.60),
    ("corridor",  35.10, 35.90, 51.48, 51.52),  # tall thin strip, overlaps
    ("reserve",   35.55, 35.75, 51.75, 51.90),
]

_GEOFENCE_VALUES = ", ".join(
    f"('{z}', {a}, {b}, {c}, {d})" for z, a, b, c, d in GEOFENCES
)


@query(
    "q100_geofence_join",
    oracle=f"""
WITH fx AS ({FIXES_SQL}),
zones(zone, lat_min, lat_max, lon_min, lon_max) AS (VALUES {_GEOFENCE_VALUES})
SELECT z.zone,
       CAST(count(*) AS BIGINT)           AS n_fixes,
       CAST(count(DISTINCT fx.device_id) AS BIGINT) AS n_devices,
       round(sum(fx.lat), 4)              AS sum_lat
FROM fx JOIN zones z
  ON fx.lat >= z.lat_min AND fx.lat < z.lat_max
 AND fx.lon >= z.lon_min AND fx.lon < z.lon_max
GROUP BY z.zone
""",
)
def q100_geofence_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence containment join: every fix matched against a small dim of
    irregular, partially overlapping bounding boxes (a fix inside two
    fences counts in both) — the point-in-fence analytics the reference's
    PostGIS ``location_instances`` table exists to serve
    (``cmd/main.go:212-215``), expressed without a geo extension.

    Plan: the fence dim is broadcast (bytes, not rows, of build side) and
    the containment predicate runs as a BroadcastNestedLoopJoin — correct
    at 100 TB because the STREAM side never shuffles and the build side is
    O(#fences), not O(data). For axis-aligned REGULAR grids use
    q101_spatial_grid instead (pure arithmetic, no join at all)."""
    fx = fixes(spark, sf_dir)
    zones = spark.createDataFrame(
        GEOFENCES, "zone string, lat_min double, lat_max double, lon_min double, lon_max double"
    )
    cond = (
        (F.col("lat") >= F.col("lat_min"))
        & (F.col("lat") < F.col("lat_max"))
        & (F.col("lon") >= F.col("lon_min"))
        & (F.col("lon") < F.col("lon_max"))
    )
    return (
        fx.join(F.broadcast(zones), cond)
        .groupBy("zone")
        .agg(
            F.count(F.lit(1)).alias("n_fixes"),
            F.countDistinct("device_id").alias("n_devices"),
            F.round(F.sum("lat"), 4).alias("sum_lat"),
        )
    )


@query(
    "q101_spatial_grid",
    oracle=f"""
WITH fx AS ({FIXES_SQL})
SELECT CAST(floor((lat - 35.0) / 0.25) AS BIGINT) * 4
         + CAST(floor((lon - 51.0) / 0.25) AS BIGINT)  AS cell,
       CAST(count(*) AS BIGINT)                        AS n_fixes,
       CAST(count(DISTINCT device_id) AS BIGINT)       AS n_devices,
       round(avg(lat), 6)                              AS avg_lat,
       round(avg(lon), 6)                              AS avg_lon
FROM fx
WHERE lat >= 35.0 AND lat < 36.0 AND lon >= 51.0 AND lon < 52.0
GROUP BY 1
""",
)
def q101_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial grid aggregation (geohash-style binning): fixes bucketed into
    a regular 4x4 lat/lon grid by PURE ARITHMETIC — the scale-correct form
    of point-in-cell for regular grids: cell id is a map-side expression, so
    the only shuffle is the final per-cell aggregation on a bounded key
    space. This is what replaces a geo join whenever fences are a grid
    (heatmaps, density tiles, H3/geohash rollups)."""
    fx = fixes(spark, sf_dir).filter(
        (F.col("lat") >= 35.0) & (F.col("lat") < 36.0)
        & (F.col("lon") >= 51.0) & (F.col("lon") < 52.0)
    )
    cell = (
        F.floor((F.col("lat") - 35.0) / 0.25).cast("bigint") * 4
        + F.floor((F.col("lon") - 51.0) / 0.25).cast("bigint")
    )
    return fx.groupBy(cell.alias("cell")).agg(
        F.count(F.lit(1)).alias("n_fixes"),
        F.countDistinct("device_id").alias("n_devices"),
        F.round(F.avg("lat"), 6).alias("avg_lat"),
        F.round(F.avg("lon"), 6).alias("avg_lon"),
    )


_KNN_QUERY_POINTS = [
    (1, 35.2, 51.2),
    (2, 35.5, 51.5),
    (3, 35.8, 51.8),
    (4, 35.1, 51.9),
    (5, 35.9, 51.1),
]
_KNN_CELL = 0.25

_KNN_HAV = HAVERSINE_SQL.format(
    lat1="q.qlat", lon1="q.qlon", lat2="f.lat", lon2="f.lon"
)

_KNN_POINTS_SQL = " UNION ALL ".join(
    f"SELECT {qid} AS qid, CAST({qlat} AS DOUBLE) AS qlat, "
    f"CAST({qlon} AS DOUBLE) AS qlon"
    for qid, qlat, qlon in _KNN_QUERY_POINTS
)


@query(
    "q143_spatial_knn",
    oracle=f"""
WITH fx AS ({FIXES_SQL}),
f AS (
    SELECT gps_id, lat, lon,
           CAST(floor((lat - 35.0) / {_KNN_CELL}) AS BIGINT) AS cr,
           CAST(floor((lon - 51.0) / {_KNN_CELL}) AS BIGINT) AS cc
    FROM fx
),
q AS ({_KNN_POINTS_SQL}),
cand AS (
    SELECT q.qid, f.gps_id,
           CAST(floor(({_KNN_HAV}) * 1000 + 0.5e0) AS BIGINT) AS dist_mm
    FROM q JOIN f
      ON f.cr BETWEEN CAST(floor((q.qlat - 35.0) / {_KNN_CELL}) AS BIGINT) - 1
                  AND CAST(floor((q.qlat - 35.0) / {_KNN_CELL}) AS BIGINT) + 1
     AND f.cc BETWEEN CAST(floor((q.qlon - 51.0) / {_KNN_CELL}) AS BIGINT) - 1
                  AND CAST(floor((q.qlon - 51.0) / {_KNN_CELL}) AS BIGINT) + 1
),
ranked AS (
    SELECT qid, gps_id, dist_mm,
           row_number() OVER (PARTITION BY qid ORDER BY dist_mm, gps_id) AS rank
    FROM cand
)
SELECT qid, CAST(rank AS BIGINT) AS rank, gps_id,
       dist_mm / 1000.0 AS dist_m
FROM ranked WHERE rank <= 3
""",
)
def q143_spatial_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-pruned spatial KNN: 3 nearest GPS fixes to each query point by
    haversine, with candidates limited to the query's grid cell and its 8
    neighbors — the scalable nearest-station/geo-lookup plan (a full
    cross-distance scan is O(points x fixes); the grid join prunes to
    O(points x cell density)).

    The candidate CELL RADIUS bounds the semantics (documented: a true
    nearest beyond one cell width — {_KNN_CELL} deg — is out of scope,
    standard for grid ANN). Ranking keys on millimeter-quantized distance
    + gps_id so JVM-vs-C libm ulp differences in sin/cos can never flip a
    rank; both engines evaluate the same haversine formula
    (functions/geo.py:HAVERSINE_SQL)."""
    fx = fixes(spark, sf_dir)
    f = fx.select(
        "gps_id",
        "lat",
        "lon",
        F.floor((F.col("lat") - 35.0) / _KNN_CELL).cast("bigint").alias("cr"),
        F.floor((F.col("lon") - 51.0) / _KNN_CELL).cast("bigint").alias("cc"),
    )
    q = spark.createDataFrame(
        _KNN_QUERY_POINTS, "qid int, qlat double, qlon double"
    ).select(
        "qid",
        "qlat",
        "qlon",
        F.floor((F.col("qlat") - 35.0) / _KNN_CELL).cast("bigint").alias("qcr"),
        F.floor((F.col("qlon") - 51.0) / _KNN_CELL).cast("bigint").alias("qcc"),
    )
    neighbors = q.select(
        "qid",
        "qlat",
        "qlon",
        F.explode(
            F.array(*[F.lit(d) for d in (-1, 0, 1)])
        ).alias("dr"),
        "qcr",
        "qcc",
    ).select(
        "qid",
        "qlat",
        "qlon",
        (F.col("qcr") + F.col("dr")).alias("cr"),
        F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("dc"),
        "qcc",
    ).select(
        "qid", "qlat", "qlon", "cr", (F.col("qcc") + F.col("dc")).alias("cc")
    )
    dist_mm = F.floor(
        haversine_m(F.col("qlat"), F.col("qlon"), F.col("lat"), F.col("lon")) * 1000
        + 0.5e0
    ).cast("bigint")
    cand = f.join(F.broadcast(neighbors), ["cr", "cc"]).select(
        "qid", "gps_id", dist_mm.alias("dist_mm")
    )
    w = Window.partitionBy("qid").orderBy("dist_mm", "gps_id")
    return (
        cand.select("qid", "gps_id", "dist_mm", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= 3)
        .select(
            "qid",
            F.col("rank").cast("bigint").alias("rank"),
            "gps_id",
            (F.col("dist_mm") / 1000.0).alias("dist_m"),
        )
    )


# Dwell threshold, sized to the synthetic fix geometry (consecutive-fix
# distance quartiles at sf0.01 ≈ 1/4/10 km): ~25% of steps qualify, so
# >=3-fix runs exist but are selective. A real deployment would use
# 50-200 m; only the constant changes.
_STOP_DIST_M = 4000.0
_STOP_MIN_FIXES = 3

_STOP_HAV = HAVERSINE_SQL.format(
    lat1="lag(lat) OVER w", lon1="lag(lon) OVER w", lat2="lat", lon2="lon"
)


@query(
    "q156_stop_detection",
    oracle=f"""
WITH flagged AS (
    SELECT device_id, gps_id, ts, us,
           CASE WHEN ({_STOP_HAV}) < {_STOP_DIST_M} THEN 1 ELSE 0 END AS dwell
    FROM ({FIXES_SQL})
    WINDOW w AS (PARTITION BY device_id ORDER BY ts, gps_id)
),
runs AS (
    SELECT device_id, ts, us, dwell,
           CAST(sum(CASE WHEN dwell = pd THEN 0 ELSE 1 END)
                OVER (PARTITION BY device_id ORDER BY ts, gps_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS run_id
    FROM (SELECT *, coalesce(lag(dwell) OVER (PARTITION BY device_id
                                              ORDER BY ts, gps_id), -1) AS pd
          FROM flagged)
)
SELECT device_id,
       run_id                                    AS stop_seq,
       CAST(count(*) AS BIGINT)                  AS n_fixes,
       CAST(floor((max(us) - min(us)) / 1000000.0) AS BIGINT) AS duration_s
FROM runs
WHERE dwell = 1
GROUP BY device_id, run_id
HAVING count(*) >= {_STOP_MIN_FIXES}
""",
)
def q156_stop_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STOP DETECTION — maximal runs of consecutive low-movement fixes
    (< {_STOP_DIST_M:.0f} m from the previous fix, >= {_STOP_MIN_FIXES}
    fixes): the dwell/visit extraction step of every trajectory-mining
    pipeline, and the gaps-and-islands window pattern (run ids from a
    cumulative sum of change flags) the suite didn't yet exercise.

    Plan: ONE device-keyed sort serves all three window passes (lag
    distance, lag flag, cumulative run id) — Catalyst collapses same-spec
    windows; the run aggregation reuses the same partitioning. One shuffle
    total, the q41/q42 scale shape."""
    fx = fixes(spark, sf_dir)
    w = Window.partitionBy("device_id").orderBy("ts", "gps_id")
    dist = haversine_m(
        F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
    )
    flagged = fx.select(
        "device_id", "gps_id", "ts", "us",
        F.when(dist < _STOP_DIST_M, 1).otherwise(0).alias("dwell"),
    )
    prev = F.coalesce(F.lag("dwell").over(w), F.lit(-1))
    runs = flagged.select(
        "device_id", "ts", "us", "dwell",
        F.sum(F.when(F.col("dwell") == prev, 0).otherwise(1))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("run_id"),
    )
    return (
        runs.filter(F.col("dwell") == 1)
        .groupBy("device_id", F.col("run_id").alias("stop_seq"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_fixes"),
            F.floor((F.max("us") - F.min("us")) / 1_000_000.0)
            .cast("bigint")
            .alias("duration_s"),
        )
        .filter(F.col("n_fixes") >= _STOP_MIN_FIXES)
    )


@query(
    "q157_od_matrix",
    oracle=f"""
WITH flagged AS (
    SELECT device_id, gps_id, ts, us, lat, lon,
           CASE WHEN us - lag(us) OVER (PARTITION BY device_id ORDER BY ts, gps_id)
                     > 1800000000
                  OR lag(us) OVER (PARTITION BY device_id ORDER BY ts, gps_id) IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM ({FIXES_SQL})
),
trips AS (
    SELECT device_id, ts, gps_id, lat, lon,
           CAST(sum(is_new) OVER (PARTITION BY device_id ORDER BY ts, gps_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trip_id
    FROM flagged
),
ends AS (
    SELECT DISTINCT device_id, trip_id,
           first_value(lat) OVER wt AS o_lat, first_value(lon) OVER wt AS o_lon,
           last_value(lat)  OVER wt AS d_lat, last_value(lon)  OVER wt AS d_lon
    FROM trips
    WINDOW wt AS (PARTITION BY device_id, trip_id ORDER BY ts, gps_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT CAST(floor((o_lat - 35.0) / 0.25) AS BIGINT) * 4
         + CAST(floor((o_lon - 51.0) / 0.25) AS BIGINT) AS origin_cell,
       CAST(floor((d_lat - 35.0) / 0.25) AS BIGINT) * 4
         + CAST(floor((d_lon - 51.0) / 0.25) AS BIGINT) AS dest_cell,
       CAST(count(*) AS BIGINT)                         AS n_trips
FROM ends
WHERE o_lat >= 35.0 AND o_lat < 36.0 AND o_lon >= 51.0 AND o_lon < 52.0
  AND d_lat >= 35.0 AND d_lat < 36.0 AND d_lon >= 51.0 AND d_lon < 52.0
GROUP BY 1, 2
""",
)
def q157_od_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORIGIN-DESTINATION matrix: per trip (q42's >30 min-gap sessions),
    the first and last fix snapped to q101's regular grid, counted per
    (origin_cell, dest_cell) — the flow matrix urban-mobility analytics
    derives from exactly the table the reference lands.

    Plan: one device-keyed window pass builds trip ids; min_by/max_by under
    the composite (ts, gps_id) order pick the endpoints inside ONE
    per-trip aggregation (no self-join back for first/last rows); the O(
    cells²)-key flow aggregation ends the plan. Two keyed shuffles total."""
    fx = fixes(spark, sf_dir)
    w = Window.partitionBy("device_id").orderBy("ts", "gps_id")
    gap = F.col("us") - F.lag("us").over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    trips = fx.select(
        "device_id", "ts", "gps_id", "lat", "lon",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("trip_id"),
    )
    order = F.struct("ts", "gps_id")
    ends = trips.groupBy("device_id", "trip_id").agg(
        F.min_by("lat", order).alias("o_lat"),
        F.min_by("lon", order).alias("o_lon"),
        F.max_by("lat", order).alias("d_lat"),
        F.max_by("lon", order).alias("d_lon"),
    )
    def cell(lat: str, lon: str) -> F.Column:
        return (
            F.floor((F.col(lat) - 35.0) / 0.25).cast("bigint") * 4
            + F.floor((F.col(lon) - 51.0) / 0.25).cast("bigint")
        )
    bounded = ends.filter(
        (F.col("o_lat") >= 35.0) & (F.col("o_lat") < 36.0)
        & (F.col("o_lon") >= 51.0) & (F.col("o_lon") < 52.0)
        & (F.col("d_lat") >= 35.0) & (F.col("d_lat") < 36.0)
        & (F.col("d_lon") >= 51.0) & (F.col("d_lon") < 52.0)
    )
    return bounded.groupBy(
        cell("o_lat", "o_lon").alias("origin_cell"),
        cell("d_lat", "d_lon").alias("dest_cell"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_trips"))


_Z_BITS = 8  # 256x256 cells over the 1-degree window

_Z_INTERLEAVE_SQL = " + ".join(
    f"(((qlat >> {b}) & 1) << {2 * b + 1}) + (((qlon >> {b}) & 1) << {2 * b})"
    for b in range(_Z_BITS)
)


@query(
    "q158_zorder_morton",
    oracle=f"""
WITH fx AS ({FIXES_SQL}),
q AS (
    SELECT gps_id,
           CAST(floor((lat - 35.0) * 256.0) AS BIGINT) AS qlat,
           CAST(floor((lon - 51.0) * 256.0) AS BIGINT) AS qlon
    FROM fx
    WHERE lat >= 35.0 AND lat < 36.0 AND lon >= 51.0 AND lon < 52.0
      AND CAST(gps_id AS BIGINT) < 2000
)
SELECT gps_id, qlat, qlon,
       CAST({_Z_INTERLEAVE_SQL} AS BIGINT) AS morton
FROM q
""",
)
def q158_zorder_morton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton) codes: lat/lon quantized to a 256x256 grid and
    bit-interleaved into one locality-preserving sort key — the layout
    primitive behind multi-dimensional data clustering (Delta OPTIMIZE
    ZORDER, Iceberg sort orders): writing files sorted by this key makes
    min/max file statistics prune BOTH dimensions for range predicates.

    Plan: pure integer bit arithmetic, fully inside codegen — zero
    shuffles, zero joins; at 100 TB the code is computed on the fly during
    the write's local sort. The oracle runs the identical interleave term
    for term."""
    fx = fixes(spark, sf_dir).filter(
        (F.col("lat") >= 35.0) & (F.col("lat") < 36.0)
        & (F.col("lon") >= 51.0) & (F.col("lon") < 52.0)
        & (F.col("gps_id").cast("bigint") < 2000)
    )
    q = fx.select(
        "gps_id",
        F.floor((F.col("lat") - 35.0) * 256.0).cast("bigint").alias("qlat"),
        F.floor((F.col("lon") - 51.0) * 256.0).cast("bigint").alias("qlon"),
    )
    morton = sum(
        (
            F.shiftleft(F.shiftright("qlat", b).bitwiseAND(F.lit(1)), 2 * b + 1)
            + F.shiftleft(F.shiftright("qlon", b).bitwiseAND(F.lit(1)), 2 * b)
        )
        for b in range(_Z_BITS)
    )
    return q.select("gps_id", "qlat", "qlon", morton.cast("bigint").alias("morton"))


@query(
    "q163_gps_pipeline",
    oracle=f"""
WITH flagged AS (
    SELECT device_id, gps_id, ts, us, lat, lon,
           {_HAV} AS dist_m,
           CASE WHEN us - lag(us) OVER w > 1800000000
                  OR lag(us) OVER w IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM ({FIXES_SQL})
    WINDOW w AS (PARTITION BY device_id ORDER BY ts, gps_id)
),
trips AS (
    SELECT device_id, ts, gps_id, us, lat, lon,
           CASE WHEN is_new = 1 THEN NULL ELSE dist_m END AS leg_m,
           CAST(sum(is_new) OVER (PARTITION BY device_id ORDER BY ts, gps_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trip_id
    FROM flagged
),
stats AS (
    SELECT device_id, trip_id,
           CAST(count(*) AS BIGINT)       AS n_fixes,
           coalesce(sum(leg_m), 0.0)      AS trip_m,
           (max(us) - min(us)) / 1000000.0 AS dur_s
    FROM trips GROUP BY device_id, trip_id
),
ends AS (
    SELECT DISTINCT device_id, trip_id,
           first_value(lat) OVER wt AS o_lat, first_value(lon) OVER wt AS o_lon,
           last_value(lat)  OVER wt AS d_lat, last_value(lon)  OVER wt AS d_lon
    FROM trips
    WINDOW wt AS (PARTITION BY device_id, trip_id ORDER BY ts, gps_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
cells AS (
    SELECT CAST(floor((o_lat - 35.0) / 0.25) AS BIGINT) * 4
             + CAST(floor((o_lon - 51.0) / 0.25) AS BIGINT) AS origin_cell,
           CAST(floor((d_lat - 35.0) / 0.25) AS BIGINT) * 4
             + CAST(floor((d_lon - 51.0) / 0.25) AS BIGINT) AS dest_cell,
           s.n_fixes, s.trip_m, s.dur_s
    FROM ends JOIN stats s USING (device_id, trip_id)
    WHERE o_lat >= 35.0 AND o_lat < 36.0 AND o_lon >= 51.0 AND o_lon < 52.0
      AND d_lat >= 35.0 AND d_lat < 36.0 AND d_lon >= 51.0 AND d_lon < 52.0
)
SELECT origin_cell, dest_cell,
       CAST(count(*) AS BIGINT)            AS n_trips,
       CAST(sum(n_fixes) AS BIGINT)        AS n_fixes,
       round(sum(trip_m) / 1000.0, 3)      AS total_km,
       round(avg(dur_s), 3)                AS avg_duration_s
FROM cells
GROUP BY origin_cell, dest_cell
""",
)
def q163_gps_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPS END-TO-END COMPOSITION CANARY (the GPS analogue of q144's corpus
    pipeline): derived motion (q41's haversine legs) → trip segmentation
    (q42's >30 min-gap sessions) → per-trip stats (fix count, travelled
    distance, duration) + endpoints (q157's origin/destination cells) → the
    OD flow rollup — all FOUR stages declared as ONE plan so Catalyst sees
    the whole pipeline.

    Plan: ONE device-keyed sort serves every window pass (leg distance, gap
    flag, cumulative trip id — same window spec, collapsed); the per-trip
    aggregation reuses that partitioning (min_by/max_by pick endpoints
    inside the same agg as the sums — no self-join back); only the final
    O(cells²)-key flow rollup re-shuffles. Two keyed exchanges end to end —
    composing the stages costs NO more shuffles than q157 alone, which is
    the point of declaring pipelines as one plan. Legs that cross a trip
    boundary are excluded from trip distance (leg_m NULL when is_new=1).
    Sums of haversine doubles round at the final grain only (3 decimals ≈
    meter precision over ~100 km totals, far above ulp reorder noise)."""
    fx = fixes(spark, sf_dir)
    w = Window.partitionBy("device_id").orderBy("ts", "gps_id")
    dist = haversine_m(
        F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
    )
    gap = F.col("us") - F.lag("us").over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    flagged = fx.select(
        "device_id", "ts", "gps_id", "us", "lat", "lon",
        dist.alias("dist_m"), is_new.alias("is_new"),
    )
    trips = flagged.select(
        "device_id", "ts", "gps_id", "us", "lat", "lon",
        F.when(F.col("is_new") == 1, F.lit(None)).otherwise(F.col("dist_m")).alias("leg_m"),
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("trip_id"),
    )
    order = F.struct("ts", "gps_id")
    per_trip = trips.groupBy("device_id", "trip_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fixes"),
        F.coalesce(F.sum("leg_m"), F.lit(0.0)).alias("trip_m"),
        ((F.max("us") - F.min("us")) / 1_000_000.0).alias("dur_s"),
        F.min_by("lat", order).alias("o_lat"),
        F.min_by("lon", order).alias("o_lon"),
        F.max_by("lat", order).alias("d_lat"),
        F.max_by("lon", order).alias("d_lon"),
    )

    def cell(lat: str, lon: str) -> F.Column:
        return (
            F.floor((F.col(lat) - 35.0) / 0.25).cast("bigint") * 4
            + F.floor((F.col(lon) - 51.0) / 0.25).cast("bigint")
        )

    bounded = per_trip.filter(
        (F.col("o_lat") >= 35.0) & (F.col("o_lat") < 36.0)
        & (F.col("o_lon") >= 51.0) & (F.col("o_lon") < 52.0)
        & (F.col("d_lat") >= 35.0) & (F.col("d_lat") < 36.0)
        & (F.col("d_lon") >= 51.0) & (F.col("d_lon") < 52.0)
    )
    return bounded.groupBy(
        cell("o_lat", "o_lon").alias("origin_cell"),
        cell("d_lat", "d_lon").alias("dest_cell"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trips"),
        F.sum("n_fixes").cast("bigint").alias("n_fixes"),
        F.round(F.sum("trip_m") / 1000.0, 3).alias("total_km"),
        F.round(F.avg("dur_s"), 3).alias("avg_duration_s"),
    )


_HAV_LAG = HAVERSINE_SQL.format(
    lat1="lag(lat) OVER w", lon1="lag(lon) OVER w", lat2="lat", lon2="lon"
)


@query(
    "q204_gps_cdc_trip_rollup",
    oracle=f"""
WITH f0 AS (
    SELECT CAST(gps_id AS BIGINT) AS eid, device_id, us, lat, lon
    FROM ({FIXES_SQL})
),
f_final AS (
    SELECT eid, device_id,
           CASE WHEN eid % 13 = 0 THEN us + 86400000000 ELSE us END AS us,
           CASE WHEN eid % 7 = 0 THEN lat + 0.001 ELSE lat END AS lat,
           lon
    FROM f0 WHERE eid % 5 <> 0
),
stepped AS (
    SELECT device_id,
           CAST(make_timestamp(us) AS DATE) AS day,
           CAST(round({_HAV_LAG}, 3) AS DECIMAL(18,3)) AS step_m
    FROM f_final
    WINDOW w AS (PARTITION BY device_id, CAST(make_timestamp(us) AS DATE)
                 ORDER BY us, eid)
)
SELECT device_id, day,
       CAST(count(*) AS BIGINT) AS n_fixes,
       CAST(sum(step_m) AS DOUBLE) AS trip_m
FROM stepped GROUP BY device_id, day
""",
)
def q204_gps_cdc_trip_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPS × CDC COMPOSITION (r8/r9 judge task, the reference's ACTUAL
    table under its ACTUAL failure mode): maintain a per-(device, day)
    trip-distance rollup — n_fixes + the sum of consecutive-fix
    haversine legs ordered by (event time, fix id) — while the fix
    stream is a CDC changelog with late corrections, the
    location_instances domain (cmd/main.go:212-215) under the
    duplicate/late delivery its restartable consume loop
    (cmd/main.go:197-230) produces. Trip distance is SEQUENCE-DEPENDENT
    (a correction to one fix changes two legs; a retraction splices its
    neighbors together), so no per-row ±1 retraction exists —
    streaming/join_view.CdcGroupedRecomputeView recomputes ONLY the
    touched (device, day) keys from their post-batch alive fixes, read
    partition-pruned from the key-bucketed image arrangement.

    Changelog script: batch 0 creates every fix; batch 1 delivers lat
    corrections (eid % 7 — two legs re-derive), DAY-CROSSING timestamp
    corrections (eid % 13 shifts +24h — the key-moving case: the fix's
    legs leave one day's trip and enter another's, both recomputed in
    one merge), retractions (eid % 5 — the neighbors' legs splice), and
    DUPLICATE re-delivery of unchanged fixes (eid % 11, same image,
    higher seq — must be a net no-op, the reference consumer's at-least-
    once failure mode). Legs are quantized to DECIMAL(18,3) meters
    before summing (the q196 exactness idiom) so maintained == recomputed
    bit-for-bit. Oracle is the plain windowed recompute over the
    CDC-upserted final fixes.

    Scale: per-batch work is O(touched (device, day) keys' fixes) —
    one pruned arrangement read + one per-key window — never a corpus
    re-scan; a day-partitioned fleet rollup at 100 TB touches only the
    keys the late data names."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.join_view import CdcGroupedRecomputeView

    fx = fixes(spark, sf_dir).select(
        F.col("gps_id").cast("bigint").alias("eid"),
        "device_id",
        "us",
        "lat",
        "lon",
    )
    eid = F.col("eid")
    day_key = lambda us_col: F.concat(
        F.col("device_id"),
        F.lit("|"),
        F.date_format(F.timestamp_micros(us_col), "yyyy-MM-dd"),
    )
    img = lambda us_col, lat_col: [
        eid,
        day_key(us_col).alias("k"),
        F.col("device_id"),
        us_col.alias("us"),
        lat_col.alias("lat"),
        F.col("lon"),
    ]
    a0 = fx.select(F.lit("c").alias("op"), eid.alias("seq"), *img(F.col("us"), F.col("lat")))
    # corrections compose exactly as the oracle's CASEs: the day-shift
    # image carries the already-applied lat bump where both rules hit
    bumped = F.when(eid % 7 == 0, F.col("lat") + 0.001).otherwise(F.col("lat"))
    a_u1 = fx.filter(eid % 7 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000_000) + eid).alias("seq"),
        *img(F.col("us"), F.col("lat") + 0.001),
    )
    a_u2 = fx.filter(eid % 13 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(2_000_000_000_000) + eid).alias("seq"),
        *img(F.col("us") + 86_400_000_000, bumped),
    )
    a_d = fx.filter(eid % 5 == 0).select(
        F.lit("d").alias("op"),
        (F.lit(3_000_000_000_000) + eid).alias("seq"),
        *img(F.col("us"), F.col("lat")),
    )
    a_dup = fx.filter(
        (eid % 11 == 0) & (eid % 5 != 0) & (eid % 7 != 0) & (eid % 13 != 0)
    ).select(
        F.lit("u").alias("op"),
        (F.lit(4_000_000_000_000) + eid).alias("seq"),
        *img(F.col("us"), F.col("lat")),
    )

    def trip_recompute(after: DataFrame) -> DataFrame:
        w = Window.partitionBy("k").orderBy("us", "eid")
        leg = haversine_m(
            F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
        )
        return (
            after.withColumn("_leg", F.round(leg, 3).cast("decimal(18,3)"))
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("_leg").alias("trip"),
            )
        )

    base = tempfile.mkdtemp(prefix="gps_cdc_rollup_")
    try:
        view = CdcGroupedRecomputeView(
            spark, base, key="k", pk="eid", recompute=trip_recompute
        )
        view.merge(a0, 0)
        view.merge(
            a_u1.unionByName(a_u2).unionByName(a_d).unionByName(a_dup), 1
        )
        out = view.snapshot().select(
            F.substring_index("k", "|", 1).alias("device_id"),
            F.to_date(F.substring_index("k", "|", -1)).alias("day"),
            F.col("n").alias("n_fixes"),
            F.col("trip").cast("double").alias("trip_m"),
        )
        # materialize before the temp state dir is removed
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


_HAV_PREV = HAVERSINE_SQL.format(
    lat1="lag(lat) OVER w", lon1="lag(lon) OVER w", lat2="lat", lon2="lon"
)


@query(
    "q256_gps_teleport_filter",
    oracle=f"""
WITH s AS (
    SELECT device_id,
           ({_HAV_PREV}) AS dist_m,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 0
                THEN round(({_HAV_PREV})
                     / ((epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1000000.0),
                     12)
           END AS sp
    FROM ({FIXES_SQL})
    WINDOW w AS (PARTITION BY device_id ORDER BY ts, gps_id)
)
SELECT device_id,
       CAST(count(*) AS BIGINT)                       AS n_fixes,
       CAST(count(sp) AS BIGINT)                      AS n_moves,
       CAST(sum(CASE WHEN sp > 40.0 THEN 1 ELSE 0 END) AS BIGINT)
                                                      AS n_teleports,
       floor(max(sp) * 1000 + 0.5e0) / 1000.0         AS max_speed_ms,
       floor(sum(CASE WHEN sp <= 40.0 THEN dist_m END) * 100 + 0.5e0) / 100.0
                                                      AS clean_dist_m
FROM s GROUP BY device_id
""",
)
def q256_gps_teleport_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPS TELEPORT (implausible-jump) FILTER — the outlier screen every
    fleet pipeline runs before q163's trip math trusts a fix: a move
    whose implied speed between consecutive fixes exceeds 40 m/s
    (~144 km/h, generous for urban fleets) is flagged as a GPS glitch,
    and the per-device audit reports flagged moves plus the CLEAN
    distance (teleport legs excluded) the downstream rollup should use.
    Single-pass flagging (the iterative re-link variant re-runs this on
    the filtered frame); the reference's PostGIS landing (cmd/main.go:
    210-227) is exactly where this screen would sit.

    Plan: q41's audited shape — ONE device-keyed window pass computes
    lag-haversine distance and speed, then one map-side-combined
    per-device aggregate. The speed is QUANTIZED at 12 dp before any
    compare (r12 advice — haversine runs through sin/cos/asin, and Java
    Math vs C libm are not guaranteed ulp-identical, so a speed within
    ulps of the 40 m/s gate or a near-half max could otherwise flip
    n_teleports/max_speed/clean_dist cross-engine; the q214/q227
    per-term idiom applied to the predicate input); max_speed reads the
    quantized value through the portable floor idiom, as does the
    clean-distance sum (sum order differs cross-engine)."""
    fx = fixes(spark, sf_dir)
    w = Window.partitionBy("device_id").orderBy("ts", "gps_id")
    plat, plon = F.lag("lat").over(w), F.lag("lon").over(w)
    dist = haversine_m(plat, plon, F.col("lat"), F.col("lon"))
    gap_us = F.col("us") - F.lag("us").over(w)
    s = fx.select(
        "device_id",
        dist.alias("dist_m"),
        F.when(
            gap_us > 0, F.round(dist / (gap_us / 1_000_000.0), 12)
        ).alias("sp"),
    )
    return s.groupBy("device_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fixes"),
        F.count("sp").cast("bigint").alias("n_moves"),
        F.sum(F.when(F.col("sp") > 40.0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_teleports"),
        (F.floor(F.max("sp") * 1000 + F.lit(0.5e0)) / 1000.0).alias(
            "max_speed_ms"
        ),
        (
            F.floor(
                F.sum(F.when(F.col("sp") <= 40.0, F.col("dist_m"))) * 100
                + F.lit(0.5e0)
            )
            / 100.0
        ).alias("clean_dist_m"),
    )
