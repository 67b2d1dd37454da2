"""Python DataSource (Spark 4 API): a native-Python GPS JSON-lines reader.

The reference ingests GPS fixes as JSON over HTTP and rejects malformed
payloads with a 400 (cmd/main.go:87-139). This data source brings that
parse-and-route behavior INTO the scan: `spark.read.format("gpsjsonl")`
yields one flattened row per line with malformed lines routed to a
`corrupt` column (never dropped, never crashing the scan) — the same
routing convention as the engine's JSON/CSV readers (operators/scans.py).

Plumbing is the real Spark 4 `pyspark.sql.datasource` contract:

- `partitions()` returns one InputPartition per input file, so a directory
  of N files scans with N-way parallelism (executors each open only their
  file — no driver-side reading);
- `read(partition)` is a generator of tuples, streamed to Arrow batches by
  the runtime.

This is the extension surface a user would use for formats Spark lacks
(proprietary logs, instrument dumps); the GPS shape doubles as the test
fixture. Python-side parsing is the slow path by design — the built-in
JSON reader stays the hot path (q84) — the point is the API surface.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "device_id string, ts string, lat double, lon double, "
    "speed double, heading double, corrupt string"
)


def parse_gps_line(line: str) -> tuple:
    """One fix line -> flattened tuple; malformed -> all-null + corrupt."""
    try:
        obj = json.loads(line)
        loc = obj["location"]
        coords = loc["coords"]
        return (
            obj["device_id"],
            loc["timestamp"],
            float(coords["latitude"]),
            float(coords["longitude"]),
            float(coords.get("speed") or 0.0),
            float(coords.get("heading") or 0.0),
            None,
        )
    except (ValueError, KeyError, TypeError):
        return (None, None, None, None, None, None, line)


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class GpsJsonlReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("gpsjsonl: 'path' option is required")
        self._path = path

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per file: executor-side reads, file-level parallelism
        if os.path.isdir(self._path):
            files = sorted(
                os.path.join(self._path, f)
                for f in os.listdir(self._path)
                if not f.startswith(("_", "."))
            )
        else:
            files = [self._path]
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line:
                    yield parse_gps_line(line)


class GpsJsonlStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch tail of a growing gpsjsonl directory.

    Offset = name high-water mark ``{"files": n, "last": name}``: each
    micro-batch reads the files whose names sort AFTER the last committed
    name, so replay slices by name boundary — a later deletion or an
    out-of-name-order arrival can never silently shift the slice the way a
    positional index would. The append-only-by-name convention (new files
    sort after old — the standard part-NNNN landing pattern) is ENFORCED:
    if the committed prefix of the listing no longer matches the offset
    (file deleted, or a new file sorted into committed territory), the read
    fails loudly instead of skipping or double-reading rows. Exactly-once
    restart comes from Spark's checkpointed offset log replaying
    `readBetweenOffsets` for the uncommitted tail."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("gpsjsonl: 'path' option is required")
        self._path = path

    def _files(self) -> list[str]:
        if not os.path.isdir(self._path):
            return [self._path]
        return sorted(
            os.path.join(self._path, f)
            for f in os.listdir(self._path)
            if not f.startswith(("_", "."))
        )

    def initialOffset(self) -> dict:
        return {"files": 0, "last": ""}

    def read(self, start: dict) -> tuple:
        files = self._files()
        last = start.get("last", "")
        committed = [f for f in files if f <= last]
        if len(committed) != start.get("files", 0):
            raise RuntimeError(
                f"gpsjsonl: committed listing prefix changed: offset records "
                f"{start.get('files', 0)} file(s) up to {last!r} but the "
                f"directory now has {len(committed)} at or before that name "
                f"— a committed file was deleted or a new file violated "
                f"append-only-by-name ordering"
            )
        new = [f for f in files if f > last]
        end = {
            "files": len(committed) + len(new),
            "last": new[-1] if new else last,
        }
        return self._read_files(new), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Replay path on restart: the same fail-loudly contract as read().
        # A checkpoint written by the legacy positional offset format
        # ({"files": n} with no "last") would make lo == hi == "" and replay
        # the uncommitted tail as an EMPTY batch — silent data loss — so a
        # files>0 offset with no name boundary is rejected outright.
        for which, off in (("start", start), ("end", end)):
            if "last" not in off and off.get("files", 0) > 0:
                raise RuntimeError(
                    f"gpsjsonl: {which} offset {off!r} is a legacy positional "
                    f"offset (no 'last' name boundary); replaying it by name "
                    f"would silently slice wrong — restart from a fresh "
                    f"checkpoint or migrate the offset log"
                )
        lo, hi = start.get("last", ""), end.get("last", "")
        files = [f for f in self._files() if lo < f <= hi]
        expected = end.get("files", 0) - start.get("files", 0)
        if len(files) != expected:
            raise RuntimeError(
                f"gpsjsonl: replay range ({lo!r}, {hi!r}] lists {len(files)} "
                f"file(s) but the committed offsets span {expected} — a file "
                f"in the committed range was deleted or renamed since the "
                f"batch was planned; refusing to silently shrink the replay"
            )
        return self._read_files(files)

    def _read_files(self, files: list[str]) -> list[tuple]:
        out = []
        for path in files:
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    line = line.rstrip("\n")
                    if line:
                        out.append(parse_gps_line(line))
        return out


class GpsJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gpsjsonl"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> GpsJsonlReader:
        return GpsJsonlReader(self.options)

    def simpleStreamReader(self, schema) -> GpsJsonlStreamReader:
        return GpsJsonlStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration: spark.read.format('gpsjsonl') afterwards."""
    spark.dataSource.register(GpsJsonlDataSource)
