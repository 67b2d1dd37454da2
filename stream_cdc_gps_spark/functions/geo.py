"""Geospatial column expressions (no UDFs, no geo library).

The reference stores geometry as WKT ``POINT(lon lat)`` — longitude FIRST —
with SRID 4326 semantics, alongside redundant lat/lon double columns
(reference ``cmd/main.go:210-215``). We preserve that exact convention and add
the derived-signal math (haversine distance) the landed table exists to serve,
as pure column expressions that stay in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0


def wkt_point(lon: Column, lat: Column) -> Column:
    """WKT POINT string, longitude first (reference ``cmd/main.go:210``:
    ``fmt.Sprintf("POINT(%f %f)", lon, lat)`` — %f keeps 6 decimals)."""
    return F.format_string("POINT(%f %f)", lon, lat)


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters between two (lat, lon) degree pairs.

    Pure column expression: sin/cos/asin/sqrt are JVM intrinsics inside
    codegen, so this runs at full vectorized speed with zero Python cost.
    """
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / 2), 2)
    )
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


# The same formula as ANSI SQL, for oracle parity (kept adjacent so the two
# implementations can be reviewed together; {lat1} etc. are SQL expressions).
HAVERSINE_SQL = (
    "2 * 6371000.0 * asin(sqrt("
    "pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
)
