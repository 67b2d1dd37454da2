"""Local replica of the driver's DuckDB-oracle differential check.

Runs the Spark query and the oracle SQL on the same parquet tables and
compares row count, column names, and order-insensitive values — the same
contract the driver enforces at sf0.01 (see __spark_entry__.py docstring).
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from stream_cdc_gps_spark.tables import TABLE_NAMES, table_path


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and absorb final-ulp noise
        return round(v + 0.0, 9)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, int):
        return float(v) if -(2**52) < v < 2**52 else v
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    # repr-keyed sort: total order even when rows mix None with values
    # (the driver's hash-based compare is likewise order-insensitive).
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )


def compare(spark, sf_dir: str, fn, oracle: str, name: str = "?") -> None:
    sdf = fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_con(sf_dir)
    res = con.execute(oracle)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_canon = _canon(s_rows, s_cols)
    d_canon = _canon(d_rows, d_cols)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diffs}")
