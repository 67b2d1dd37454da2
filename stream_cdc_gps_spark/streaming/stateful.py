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

Both public state APIs are implemented: ``segment_trips_stream`` (v1,
``applyInPandasWithState``) and ``segment_trips_stream_tws`` (v2, Spark 4
``transformWithStateInPandas`` — ValueState + explicit timers). The v2
runtime speaks protobuf to its state server; in a sandbox without
``google.protobuf`` its tests skip (environment-gated like the Kafka broker
paths) while the v1 path runs everywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

TRIP_SCHEMA = (
    "device_id string, trip_seq bigint, n_fixes bigint, "
    "start_us bigint, end_us bigint, dist_deg double"
)

STATE_SCHEMA = "trip_seq bigint, last_us bigint, n_fixes bigint, start_us bigint, " \
               "last_lat double, last_lon double, dist_deg double"

GAP_US = 1_800_000_000  # 30 min, matching q42_trip_sessions

IDLE_TIMEOUT_MS = 60_000  # close the open trip after 60 s without input

# After an idle-closed trip, the device's state row is re-seeded (only the
# trip_seq counter survives, keeping (device_id, trip_seq) monotonic). A
# second, much longer timer then EVICTS the re-seeded row entirely: without
# it, one state row per ever-seen device lives forever — unbounded under
# device-id churn. A device silent past this horizon restarts at trip_seq=1,
# the documented trade for bounded state.
EVICT_TIMEOUT_MS = 3_600_000  # 1 h quiet -> drop the re-seeded state row


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
                if n and n > 0:
                    # Keep the seq counter in state (re-seeded, no open
                    # trip) instead of remove(): removing now would restart
                    # the device's next trip at trip_seq=1, breaking the
                    # monotonic (device_id, trip_seq) numbering that
                    # segment_trips_batch produces. A long secondary timer
                    # is armed so a device that stays quiet is EVICTED
                    # rather than retained forever (bounded state under
                    # device-id churn).
                    state.update((seq, None, 0, None, None, None, 0.0))
                    state.setTimeoutDuration(EVICT_TIMEOUT_MS)
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
                else:
                    # second (eviction) timeout on an already re-seeded row:
                    # the device has been silent past the eviction horizon
                    state.remove()
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
        state.setTimeoutDuration(IDLE_TIMEOUT_MS)
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


# ---------------------------------------------------------------------------
# Spark 4 state API: transformWithStateInPandas (SPARK-49564 / SIP "arbitrary
# stateful processing v2"). Same trip semantics as segment_trips_stream, but
# state lives in a named ValueState and inactivity is modeled with explicit
# timers — the API where new state features (TTL, multiple state variables,
# initial state) land; applyInPandasWithState above is the stable v1.
# ---------------------------------------------------------------------------


class TripStatefulProcessor(StatefulProcessor):
    """Per-device trip state machine on the transformWithState API.

    One ValueState row per device: (trip_seq, last_us, n_fixes, start_us,
    last_lat, last_lon, dist_deg) — identical layout to the v1
    implementation so the two are drop-in equivalents. Timers: every input
    batch re-arms a short idle timer (closes the open trip); after an
    idle-close the state is re-seeded (trip_seq survives — monotonic
    numbering) and a long EVICTION timer drops the row for devices that
    stay silent, bounding state under device-id churn."""

    def __init__(self, gap_us: int = GAP_US):
        self.gap_us = gap_us

    def init(self, handle) -> None:
        self.handle = handle
        self.state = handle.getValueState("trip", STATE_SCHEMA)

    def _rearm(self, timer_values, delay_ms: int) -> None:
        for ts in list(self.handle.listTimers()):
            self.handle.deleteTimer(ts)
        self.handle.registerTimer(
            timer_values.getCurrentProcessingTimeInMs() + delay_ms
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        (device_id,) = key
        pdf = pd.concat(list(rows)).sort_values(["us", "gps_id"])
        prior = self.state.get() if self.state.exists() else None
        if prior is not None:
            seq, last_us, n, start_us, lat, lon, dist = prior
        else:
            seq, last_us, n, start_us, lat, lon, dist = 0, None, 0, None, None, None, 0.0

        closed = []
        for r in pdf.itertuples(index=False):
            if last_us is None:
                seq += 1
                n, start_us, dist = 0, r.us, 0.0
                lat, lon = r.lat, r.lon
            elif r.us - last_us > self.gap_us:
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

        self.state.update((seq, last_us, n, start_us, lat, lon, dist))
        self._rearm(timer_values, IDLE_TIMEOUT_MS)
        if closed:
            yield pd.DataFrame(closed)

    def handleExpiredTimer(
        self, key: tuple, timer_values, expired_timer_info
    ) -> Iterator[pd.DataFrame]:
        (device_id,) = key
        if not self.state.exists():
            return
        seq, last_us, n, start_us, _lat, _lon, dist = self.state.get()
        if n and n > 0:
            # idle-close the open trip; keep trip_seq, arm eviction
            self.state.update((seq, None, 0, None, None, None, 0.0))
            self._rearm(timer_values, EVICT_TIMEOUT_MS)
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
        else:
            # eviction: quiet past the horizon — drop the re-seeded row
            self.state.clear()

    def close(self) -> None:
        pass


def segment_trips_stream_tws(fixes: DataFrame, gap_us: int = GAP_US) -> DataFrame:
    """Streaming trip segmentation on the Spark 4 transformWithState API —
    semantically equivalent to ``segment_trips_stream`` (v1 GroupState);
    both emit one row per CLOSED trip. Input columns: gps_id, device_id,
    us, lat, lon."""
    return (
        fixes.select("gps_id", "device_id", "us", "lat", "lon")
        .groupBy("device_id")
        .transformWithStateInPandas(
            statefulProcessor=TripStatefulProcessor(gap_us),
            outputStructType=TRIP_SCHEMA,
            outputMode="append",
            timeMode="processingTime",
        )
    )
