"""Spark 4 Python extension surfaces: DataSource API + UDTF.

These are TEST-checked rows (no batch-SQL oracle form): the DataSource's
file-per-partition parallelism and corrupt routing, and the UDTF's
equivalence with the codegen'd shingle path.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from stream_cdc_gps_spark.functions.text import tokens, word_shingles
from stream_cdc_gps_spark.functions.udtfs import register as register_udtfs
from stream_cdc_gps_spark.sources.pysource import parse_gps_line, register
from tests.conftest import SF_SMOKE
from tests.test_streaming import gps_fix


def _write_files(tmp_path, n_files: int = 3) -> str:
    d = tmp_path / "gpslog"
    d.mkdir()
    for i in range(n_files):
        lines = [
            gps_fix(f"2026-02-06T10:0{i}:30.000Z", f"dev-{i:03d}", 35.0 + i, 51.0 + i),
            gps_fix(f"2026-02-06T10:0{i}:31.000Z", f"dev-{i:03d}", 35.1 + i, 51.1 + i),
            "{corrupt line %d" % i,
        ]
        (d / f"part-{i}.jsonl").write_text("\n".join(lines) + "\n")
    return str(d)


def test_python_datasource_file_parallelism_and_routing(spark, tmp_path):
    path = _write_files(tmp_path, n_files=3)
    register(spark)
    df = spark.read.format("gpsjsonl").option("path", path).load()
    # one partition per file — executor-side parallel scan
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 9
    good = [r for r in rows if r.corrupt is None]
    bad = [r for r in rows if r.corrupt is not None]
    assert len(good) == 6 and len(bad) == 3
    # corrupt lines carried verbatim, never dropped
    assert all(b.corrupt.startswith("{corrupt line") for b in bad)
    assert all(b.device_id is None for b in bad)
    # flattening matches the fixture values
    dev0 = sorted((r.lat, r.lon) for r in good if r.device_id == "dev-000")
    assert dev0 == [(35.0, 51.0), (35.1, 51.1)]


def test_python_datasource_composes_with_engine_ops(spark, tmp_path):
    """The source's output plugs straight into the relational layer."""
    path = _write_files(tmp_path, n_files=2)
    register(spark)
    df = spark.read.format("gpsjsonl").option("path", path).load()
    agg = (
        df.filter(F.col("corrupt").isNull())
        .groupBy("device_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("lat"), 4).alias("avg_lat"))
        .orderBy("device_id")
        .collect()
    )
    assert [(r.device_id, r.n) for r in agg] == [("dev-000", 2), ("dev-001", 2)]


def test_parse_gps_line_unit():
    good = parse_gps_line(gps_fix("2026-01-01T00:00:00Z", "d1", 1.5, 2.5))
    assert good[0] == "d1" and good[2] == 1.5 and good[6] is None
    bad = parse_gps_line("nope")
    assert bad[0] is None and bad[6] == "nope"


def test_udtf_ngrams_matches_codegen_shingles(spark):
    """ngrams_py (row-at-a-time Python UDTF) == word_shingles (zero-UDF
    column expression) on real corpus text — same tokens, same joining."""
    register_udtfs(spark)
    d = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.length("text") > 0)
        .limit(50)
    )
    d.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        "SELECT doc_id, s.ngram FROM udtf_docs, LATERAL ngrams_py(text, 3) s"
    )
    via_expr = d.select(
        "doc_id", F.explode(word_shingles(tokens(F.col("text")), 3)).alias("ngram")
    )
    assert via_udtf.exceptAll(via_expr).count() == 0
    assert via_expr.exceptAll(via_udtf).count() == 0
    assert via_udtf.count() > 0


def test_python_datasource_streaming_incremental_batches(spark, tmp_path):
    """Streaming form: files landing between micro-batches arrive
    incrementally (offset = file high-water mark), with corrupt routing
    preserved, under availableNow + checkpoint."""
    src = tmp_path / "gpslog"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    register(spark)

    def land(i: int) -> None:
        (src / f"part-{i:04d}.jsonl").write_text(
            gps_fix(f"2026-02-06T10:00:0{i}.000Z", f"dev-{i:03d}", 35.0 + i, 51.0)
            + "\n{bad line\n"
        )

    def drain() -> None:
        q = (
            spark.readStream.format("gpsjsonl")
            .option("path", str(src))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    land(0)
    land(1)
    drain()
    first = spark.read.parquet(out)
    assert first.count() == 4  # 2 good + 2 corrupt-routed
    land(2)
    drain()  # restart from checkpoint: only the new file is read
    df = spark.read.parquet(out)
    assert df.count() == 6
    good = df.filter(F.col("corrupt").isNull())
    assert sorted(r.device_id for r in good.collect()) == [
        "dev-000", "dev-001", "dev-002",
    ]


def test_schema_evolution_mergeschema(spark, tmp_path):
    """Additive schema evolution: later batches add columns; mergeSchema
    reads the union with nulls for pre-evolution files."""
    from stream_cdc_gps_spark.sources.writers import read_evolved

    p = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id bigint, payload string"
    ).write.mode("append").parquet(p)
    spark.createDataFrame(
        [(2, "b", 0.5)], "id bigint, payload string, quality double"
    ).write.mode("append").parquet(p)
    df = read_evolved(spark, p)
    assert set(df.columns) == {"id", "payload", "quality"}
    rows = {r.id: r.quality for r in df.collect()}
    assert rows[1] is None and rows[2] == 0.5


def test_compaction_reduces_file_count(spark, tmp_path):
    from stream_cdc_gps_spark.sources.writers import compact

    src = str(tmp_path / "small_files")
    out = str(tmp_path / "compacted")
    # 40 micro-batch-sized fragments
    spark.range(0, 4000).repartition(40).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/*.parquet")) == 40
    n = compact(spark, src, out, target_file_mb=128)
    assert n == 1  # tiny table -> single target-sized file
    assert len(glob.glob(f"{out}/*.parquet")) == 1
    assert (
        spark.read.parquet(out).agg(F.sum("id")).collect()[0][0]
        == 4000 * 3999 // 2
    )


def test_streaming_offsets_are_name_anchored_and_fail_on_prefix_change(tmp_path):
    """Offsets record the name high-water mark, not a positional index: a
    committed file deleted (or a new file sorting into committed territory)
    makes the next read fail loudly instead of silently skipping or
    double-reading rows (ADVICE r3). Pure unit test on the reader — no
    Spark session needed."""
    from stream_cdc_gps_spark.sources.pysource import GpsJsonlStreamReader

    src = tmp_path / "gpslog"
    src.mkdir()

    def land(name: str, dev: str) -> None:
        (src / name).write_text(
            gps_fix("2026-02-06T10:00:00.000Z", dev, 35.0, 51.0) + "\n"
        )

    reader = GpsJsonlStreamReader({"path": str(src)})
    land("part-0000.jsonl", "dev-000")
    land("part-0001.jsonl", "dev-001")
    rows, off1 = reader.read(reader.initialOffset())
    assert off1["files"] == 2 and off1["last"].endswith("part-0001.jsonl")
    assert sorted(r[0] for r in rows) == ["dev-000", "dev-001"]

    # incremental: only the new file is read; replay slices by name boundary
    land("part-0002.jsonl", "dev-002")
    rows2, off2 = reader.read(off1)
    assert [r[0] for r in rows2] == ["dev-002"]
    assert [r[0] for r in reader.readBetweenOffsets(off1, off2)] == ["dev-002"]

    # deleting a committed file breaks the prefix -> loud failure
    (src / "part-0001.jsonl").unlink()
    with pytest.raises(RuntimeError, match="committed listing prefix changed"):
        reader.read(off2)

    # a late file that sorts BEFORE the committed high-water mark also fails
    land("part-0001.jsonl", "dev-001")  # restore
    land("part-0000a.jsonl", "dev-00X")  # sorts into committed territory
    with pytest.raises(RuntimeError, match="committed listing prefix changed"):
        reader.read(off2)


def test_streaming_replay_guards_legacy_offsets_and_deletions(tmp_path):
    """readBetweenOffsets carries the same fail-loudly contract as read()
    (ADVICE r4): a legacy positional offset ({'files': n} with no 'last')
    must raise instead of replaying the tail as an empty batch, and a
    committed-range file deletion during replay must raise instead of
    silently shrinking the replayed slice."""
    from stream_cdc_gps_spark.sources.pysource import GpsJsonlStreamReader

    src = tmp_path / "gpslog"
    src.mkdir()

    def land(name: str, dev: str) -> None:
        (src / name).write_text(
            gps_fix("2026-02-06T10:00:00.000Z", dev, 35.0, 51.0) + "\n"
        )

    reader = GpsJsonlStreamReader({"path": str(src)})
    land("part-0000.jsonl", "dev-000")
    land("part-0001.jsonl", "dev-001")
    _, off1 = reader.read(reader.initialOffset())
    land("part-0002.jsonl", "dev-002")
    _, off2 = reader.read(off1)

    # legacy positional offsets (no 'last') on either end -> loud failure
    with pytest.raises(RuntimeError, match="legacy positional offset"):
        reader.readBetweenOffsets({"files": 2}, off2)
    with pytest.raises(RuntimeError, match="legacy positional offset"):
        reader.readBetweenOffsets(off1, {"files": 3})
    # a files==0 legacy start is unambiguous (nothing committed): allowed
    assert len(list(reader.readBetweenOffsets({"files": 0}, off2))) == 3

    # deleting a file INSIDE the committed replay range -> loud failure,
    # never a silently-shrunk batch
    (src / "part-0002.jsonl").unlink()
    with pytest.raises(RuntimeError, match="refusing to silently shrink"):
        reader.readBetweenOffsets(off1, off2)
