"""Arbitrary-stateful streaming: per-device trip state machine
(SURVEY.md §2B streaming table, ⚙ row — ``applyInPandasWithState``).

``session_window`` covers plain gap-based segmentation (operators/gps.py
q42); this module is the escape hatch for trip semantics a window can't
express — e.g. a trip only *ends* after the device is BOTH idle for the gap
AND has moved less than a minimum distance, and emits a summary row per
closed trip.

State partitioning is by device_id — uniform by construction, bounded per
key (one open trip), which is what keeps state manageable on a 1000-executor
cluster: state size = O(active devices), not O(events).

The same logic runs in batch via ``applyInPandas`` (no state timeouts) so the
semantics are unit-testable without a streaming harness; the streaming wiring
uses GroupState timeouts to close trips on inactivity.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRIP_SCHEMA = (
    "device_id string, trip_seq bigint, n_fixes bigint, "
    "start_us bigint, end_us bigint, dist_deg double"
)

STATE_SCHEMA = "trip_seq bigint, last_us bigint, n_fixes bigint, start_us bigint, " \
               "last_lat double, last_lon double, dist_deg double"

GAP_US = 1_800_000_000  # 30 min, matching q42_trip_sessions


def _segment(pdf: pd.DataFrame, gap_us: int = GAP_US) -> pd.DataFrame:
    """Batch trip segmentation for ONE device (rows pre-sorted by caller)."""
    pdf = pdf.sort_values(["us", "gps_id"])
    trips = []
    seq = 0
    cur: dict | None = None
    for r in pdf.itertuples(index=False):
        if cur is None or r.us - cur["end_us"] > gap_us:
            if cur is not None:
                trips.append(cur)
            seq += 1
            cur = {
                "device_id": r.device_id,
                "trip_seq": seq,
                "n_fixes": 0,
                "start_us": r.us,
                "end_us": r.us,
                "dist_deg": 0.0,
                "_lat": r.lat,
                "_lon": r.lon,
            }
        cur["dist_deg"] += abs(r.lat - cur["_lat"]) + abs(r.lon - cur["_lon"])
        cur["_lat"], cur["_lon"] = r.lat, r.lon
        cur["n_fixes"] += 1
        cur["end_us"] = r.us
    if cur is not None:
        trips.append(cur)
    out = pd.DataFrame(trips)
    return out.drop(columns=["_lat", "_lon"]) if len(out) else pd.DataFrame(
        columns=["device_id", "trip_seq", "n_fixes", "start_us", "end_us", "dist_deg"]
    )


def segment_trips_batch(fixes: DataFrame) -> DataFrame:
    """Batch form: groupBy(device).applyInPandas — one group per device.

    Input columns: gps_id, device_id, us, lat, lon."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _segment(pdf)

    return (
        fixes.select("gps_id", "device_id", "us", "lat", "lon")
        .groupBy("device_id")
        .applyInPandas(fn, schema=TRIP_SCHEMA)
    )


def segment_trips_stream(fixes: DataFrame, gap_us: int = GAP_US) -> DataFrame:
    """Streaming form: applyInPandasWithState with a processing-time timeout.

    Emits a row per CLOSED trip (closed by a gap within the data, or by the
    inactivity timeout). One open trip per device lives in state."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (device_id,) = key
        if state.hasTimedOut:
            if state.exists:
                seq, last_us, n, start_us, _lat, _lon, dist = state.get
                # Keep the seq counter in state (re-seeded, no open trip)
                # instead of remove(): removing would restart the device's
                # next trip at trip_seq=1, breaking the monotonic
                # (device_id, trip_seq) numbering that segment_trips_batch
                # produces. No new timeout is armed, so the re-seeded state
                # stays quiet until the device sends data again.
                state.update((seq, None, 0, None, None, None, 0.0))
                if n and n > 0:
                    yield pd.DataFrame(
                        [
                            {
                                "device_id": device_id,
                                "trip_seq": seq,
                                "n_fixes": n,
                                "start_us": start_us,
                                "end_us": last_us,
                                "dist_deg": dist,
                            }
                        ]
                    )
            return

        rows = pd.concat(list(pdfs)).sort_values(["us", "gps_id"])
        if state.exists:
            seq, last_us, n, start_us, lat, lon, dist = state.get
        else:
            seq, last_us, n, start_us, lat, lon, dist = 0, None, 0, None, None, None, 0.0

        closed = []
        for r in rows.itertuples(index=False):
            if last_us is None:
                seq += 1
                n, start_us, dist = 0, r.us, 0.0
                lat, lon = r.lat, r.lon
            elif r.us - last_us > gap_us:
                closed.append(
                    {
                        "device_id": device_id,
                        "trip_seq": seq,
                        "n_fixes": n,
                        "start_us": start_us,
                        "end_us": last_us,
                        "dist_deg": dist,
                    }
                )
                seq += 1
                n, start_us, dist = 0, r.us, 0.0
                lat, lon = r.lat, r.lon
            dist += abs(r.lat - lat) + abs(r.lon - lon)
            lat, lon = r.lat, r.lon
            n += 1
            last_us = r.us

        state.update((seq, last_us, n, start_us, lat, lon, dist))
        state.setTimeoutDuration(60_000)  # close open trip after 60s idle
        if closed:
            yield pd.DataFrame(closed)

    return (
        fixes.select("gps_id", "device_id", "us", "lat", "lon")
        .groupBy("device_id")
        .applyInPandasWithState(
            fn,
            outputStructType=TRIP_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
