"""Schema-on-read scans: JSON / CSV with corrupt-record routing, under the
DuckDB oracle (SURVEY.md §2B source rows; reference behavior:
``cmd/main.go:203-208`` tolerates malformed change events by skipping them —
here they are ROUTED, not dropped, so bad input is observable).

The scanned files are generated deterministically by a pure function of the
row index (no corpus dependency, no randomness), so the oracle can
reconstruct the expected result from ``range()`` alone — the file itself
never has to be readable by DuckDB. That makes the check independent of the
reader under test: if Spark's schema projection, type coercion, or
PERMISSIVE-mode corrupt routing misbehaves, the aggregate diverges from the
arithmetic reconstruction and the diff fails.

Scale note: schema-on-read with explicit schemas is the 100 TB contract —
never ``inferSchema`` (a full extra pass over the data). Corrupt routing is
per-row map work; the aggregate shuffles only (cat, n, sum) partials.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.registry import query

# Scratch home for generated scan fixtures (inside the repo; gitignored).
_SCRATCH = Path(__file__).resolve().parents[2] / ".scratch"

N_JSON = 400  # rows in the JSON fixture; every 50th line is corrupt
N_CSV = 300  # rows in the CSV fixture; every 37th has a malformed double


def _write_once(path: Path, content: str) -> None:
    """Idempotent deterministic fixture write (atomic rename)."""
    if path.exists() and path.read_text() == content:
        return
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_text(content)
    os.replace(tmp, path)


def json_fixture() -> str:
    lines = []
    for i in range(N_JSON):
        if i % 50 == 0:
            lines.append('{"id": %d, broken' % i)  # malformed on purpose
        else:
            lines.append(
                json.dumps({"id": i, "cat": f"c{i % 7}", "v": i * 0.5})
            )
    path = _SCRATCH / "scan_json" / "data.jsonl"
    _write_once(path, "\n".join(lines) + "\n")
    return str(path)


def csv_fixture() -> str:
    rows = ["id,cat,v"]
    for i in range(N_CSV):
        v = "oops" if i % 37 == 0 else f"{i * 0.5}"  # type-malformed double
        rows.append(f"{i},c{i % 5},{v}")
    path = _SCRATCH / "scan_csv" / "data.csv"
    _write_once(path, "\n".join(rows) + "\n")
    return str(path)


@query(
    "q84_json_scan",
    oracle=f"""
SELECT CASE WHEN i % 50 = 0 THEN '_corrupt' ELSE 'c' || CAST(i % 7 AS VARCHAR) END AS cat,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(CASE WHEN i % 50 <> 0 THEN i * 0.5 END), 4) AS sum_v
FROM range(0, {N_JSON}) t(i)
GROUP BY 1
""",
)
def q84_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scan with explicit schema + PERMISSIVE corrupt-record routing.

    Malformed lines land in the ``_corrupt`` column (all schema fields null)
    and are counted under cat='_corrupt'; the oracle reconstructs the same
    aggregate from the generator arithmetic. A reader that silently DROPS
    bad records (the reference's behavior) would fail the row diff — routing
    makes data loss visible."""
    path = json_fixture()
    df = (
        spark.read.schema("id BIGINT, cat STRING, v DOUBLE, _corrupt STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    return (
        df.groupBy(
            F.when(F.col("_corrupt").isNotNull(), F.lit("_corrupt"))
            .otherwise(F.col("cat"))
            .alias("cat")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("v"), 4).alias("sum_v"),
        )
    )


@query(
    "q85_csv_scan",
    oracle=f"""
SELECT CASE WHEN i % 37 = 0 THEN '_corrupt' ELSE 'c' || CAST(i % 5 AS VARCHAR) END AS cat,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(CASE WHEN i % 37 <> 0 THEN i * 0.5 END), 4) AS sum_v,
       CAST(count(CASE WHEN i % 37 = 0 THEN 1 END) AS BIGINT) AS n_corrupt
FROM range(0, {N_CSV}) t(i)
GROUP BY 1
""",
)
def q85_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan (header, explicit schema) with type-failure corrupt routing.

    Every 37th row carries a non-numeric value in a DOUBLE column; univocity
    parses the other fields, nulls the bad one, and stores the raw line in
    ``_corrupt``. The aggregate separates corrupt rows and counts them
    explicitly, all checked against the range() reconstruction."""
    path = csv_fixture()
    df = (
        spark.read.schema("id BIGINT, cat STRING, v DOUBLE, _corrupt STRING")
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    corrupt = F.col("_corrupt").isNotNull()
    return (
        df.groupBy(
            F.when(corrupt, F.lit("_corrupt")).otherwise(F.col("cat")).alias("cat")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.when(~corrupt, F.col("v"))), 4).alias("sum_v"),
            F.count(F.when(corrupt, F.lit(1))).cast("bigint").alias("n_corrupt"),
        )
    )


N_GPS = 450  # GPS fixture rows: every 45th malformed JSON, every 31st lacks device_id


def gps_fixture() -> str:
    """Deterministic GPS-ingest payload mix (FIXTURES.md A1 shape):
    well-formed fixes, syntactically-broken JSON (the reference's HTTP-400
    path, ``cmd/main.go:92-95``), and parseable-but-invalid fixes missing
    ``device_id`` (null required leaf). Pure function of the row index so
    the oracle reconstructs the aggregate from range() arithmetic."""
    lines = []
    for i in range(N_GPS):
        if i % 45 == 0:
            lines.append('{"i": %d, broken' % i)
        elif i % 31 == 0:
            lines.append(
                json.dumps(
                    {
                        "location": {
                            "timestamp": f"2026-02-06T10:00:{i:03d}Z",
                            "coords": {"latitude": i * 0.25, "longitude": -i * 0.25},
                        }
                    }
                )
            )
        else:
            lines.append(
                json.dumps(
                    {
                        "location": {
                            "timestamp": f"2026-02-06T10:00:{i:03d}Z",
                            "coords": {"latitude": i * 0.25, "longitude": -i * 0.25},
                        },
                        "device_id": f"d{i % 9}",
                    }
                )
            )
    path = _SCRATCH / "scan_gps" / "fixes.jsonl"
    _write_once(path, "\n".join(lines) + "\n")
    return str(path)


@query(
    "q83_gps_rejects",
    oracle=f"""
SELECT CASE WHEN i % 45 = 0 OR i % 31 = 0 THEN '_rejected'
            ELSE 'd' || CAST(i % 9 AS VARCHAR) END AS device,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(CASE WHEN i % 45 <> 0 AND i % 31 <> 0 THEN i * 0.25e0 END), 4)
           AS sum_lat
FROM range(0, {N_GPS}) t(i)
GROUP BY 1
""",
)
def q83_gps_rejects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPS ingest reject routing under the DuckDB oracle (SURVEY.md §2A op
    #2: the reference answers malformed bodies with HTTP 400 and DROPS them,
    ``cmd/main.go:92-95`` — the engine routes them, and this query proves no
    payload is silently lost).

    Runs the REAL ingest parse (``transforms.parse_gps_json`` — the same
    pure function the streaming graphs A/B use) over a deterministic payload
    mix, then aggregates per device with rejects under '_rejected'. Both
    reject classes are exercised: unparseable JSON (null struct from
    from_json) and parseable fixes with a null required leaf (missing
    device_id). The oracle reconstructs the aggregate from the generator
    arithmetic, so a parser that dropped or mis-routed any row diverges."""
    from stream_cdc_gps_spark.streaming import transforms as X

    path = gps_fixture()
    raw = spark.read.text(path)
    parsed = X.parse_gps_json(raw)
    corrupt = F.col("corrupt")
    return (
        parsed.groupBy(
            F.when(corrupt, F.lit("_rejected"))
            .otherwise(F.col("fix.device_id"))
            .alias("device")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.when(~corrupt, F.col("fix.location.coords.latitude"))), 4
            ).alias("sum_lat"),
        )
    )


@query(
    "q88_orc_roundtrip",
    oracle="""
SELECT lang,
       CAST(count(*) AS BIGINT)      AS n,
       CAST(sum(n_chars) AS BIGINT)  AS total_chars
FROM documents
WHERE doc_id < 100
GROUP BY lang
""",
)
def q88_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write → read roundtrip (the second columnar format Spark ships
    in-box). A corpus slice is written to ORC and aggregated from the ORC
    scan; the oracle computes the same aggregate from the parquet source —
    any type/value infidelity in the ORC path breaks the diff. The write is
    keyed by sf_dir so different scale factors don't collide."""
    from stream_cdc_gps_spark.operators.common import t

    key = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = str(_SCRATCH / f"orc_docs_{key}")
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.select("doc_id", "lang", "n_chars").write.format("orc").mode(
        "overwrite"
    ).save(path)
    back = spark.read.orc(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@query(
    "q217_schema_evolution_scan",
    oracle="""
WITH v1 AS (
    SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
    FROM documents WHERE doc_id < 100
),
v2 AS (
    SELECT doc_id, lang, n_chars
    FROM documents WHERE doc_id >= 100 AND doc_id < 200
)
SELECT lang,
       CAST(count(*) AS BIGINT)           AS n,
       CAST(count(n_chars) AS BIGINT)     AS n_with_chars,
       CAST(sum(n_chars) AS BIGINT)       AS total_chars
FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
GROUP BY lang
""",
)
def q217_schema_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION on read — the long-lived-dataset contract: a
    table written over months gains columns, and a scan must read old
    and new files TOGETHER, null-filling the column the old files
    predate. Two parquet generations land in one directory (v1:
    doc_id/lang; v2: + n_chars) and are read back with
    ``mergeSchema=true``; the aggregate counts rows with and without the
    evolved column per language. The oracle reconstructs the same union
    from the source table with an explicit NULL for the v1 slice — if
    Spark's schema merge mis-typed, dropped, or back-filled the new
    column wrongly, the diff fails.

    Scale: schema merging reads FOOTERS, not data (one footer per file;
    at 100 TB set spark.sql.parquet.mergeSchema only on tables that
    genuinely evolved, or pin the merged schema explicitly — both paths
    are this same read). The write is keyed by sf_dir so scale factors
    don't collide."""
    from stream_cdc_gps_spark.operators.common import t

    key = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = str(_SCRATCH / f"evolved_docs_{key}")
    d = t(spark, sf_dir, "documents")
    d.filter(F.col("doc_id") < 100).select("doc_id", "lang").write.mode(
        "overwrite"
    ).parquet(f"{path}/gen=1")
    d.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)).select(
        "doc_id", "lang", "n_chars"
    ).write.mode("overwrite").parquet(f"{path}/gen=2")
    back = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/gen=1", f"{path}/gen=2"
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count("n_chars").cast("bigint").alias("n_with_chars"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
