"""Cardinality guard for the DISTINCT-VALUE-COMPRESSION idiom (r11 verdict
task #4 — the domain-cardinality loophole).

q125/q138/q223/q227/q228 (and q152's df side) run an un-partitioned window
AFTER compressing row-level input to per-distinct-value aggregates. The plan
lint auto-passes ANY aggregate-fed global window, which is sound only while
the compressed column's cardinality is bounded by its DOMAIN (a 2-dp
quantized measure, integer lifetimes inside a fixed observation span,
per-key row counts) rather than by data volume. A genuinely CONTINUOUS
column satisfies the lint and still pushes O(n) rows through one task —
silently.

This suite closes the loop with MEASUREMENT, not trust:

1. each query using the idiom pins (pre-compression row count, compressed
   distinct count) as SQL over the corpus; the guard compares growth across
   a 10x scale step and requires the distinct count to grow measurably
   sublinearly (ratio <= SUBLINEAR_FRAC x the row ratio);
2. the domain bounds the docstrings cite are asserted directly (value IS
   2-dp quantized; lifetimes ARE integer hours within the corpus span);
3. a synthetic continuous column (md5-uniform double, deterministic) is
   shown to TRIP the same guard — the "failing test for the continuous
   case" the verdict asked to exist. A new query that compresses a
   continuous column must either bin first (q236's move) or fail here
   when its column is added to PINNED.

DuckDB-only (no Spark session): the guard measures corpus facts, which is
why it stays fast enough to run in every suite invocation.
"""

from __future__ import annotations

import duckdb
import pytest

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"  # 10x the rows of SF_SMALL

# A compressed distinct count must grow at most this fraction of the row
# growth across the 10x step — domain-bounded columns come in far under
# (measured r12: value 0.54x, lifetime-hours 0.17x, per-user counts 0.14x);
# a continuous column tracks the row ratio (~1.0x).
SUBLINEAR_FRAC = 0.8

# query -> (pre-compression row count SQL, compressed distinct count SQL).
# Both return one BIGINT. The distinct SQL mirrors the column each query's
# global window actually walks (the docstring's cardinality claim, as SQL).
PINNED: dict[str, tuple[str, str]] = {
    # q138 KS + q223 Mann-Whitney + q236's exact sibling: distinct purchase
    # values (2-dp quantized measure domain)
    "q138_ks_test+q223_mann_whitney_u": (
        "SELECT count(*) FROM events WHERE event_type = 'purchase'",
        "SELECT count(DISTINCT value) FROM events WHERE event_type = 'purchase'",
    ),
    # q227 Kaplan-Meier: distinct user lifetimes in whole hours (bounded by
    # the observation span, not by users)
    "q227_km_survival": (
        "SELECT count(DISTINCT user_id) FROM events",
        """SELECT count(DISTINCT d) FROM (
               SELECT date_diff('hour', min(ts), max(ts)) AS d
               FROM events GROUP BY user_id)""",
    ),
    # q228 Spearman: distinct per-user event counts (x side; the y side is
    # a subset of the same domain)
    "q228_spearman_corr": (
        "SELECT count(DISTINCT user_id) FROM events",
        """SELECT count(DISTINCT c) FROM (
               SELECT count(*) AS c FROM events GROUP BY user_id)""",
    ),
    # q125 skew diagnostics: distinct per-key row counts
    "q125_skew_diagnostics": (
        "SELECT count(DISTINCT user_id) FROM events",
        """SELECT count(DISTINCT c) FROM (
               SELECT count(*) AS c FROM events GROUP BY user_id)""",
    ),
}

# The negative control: a deterministic continuous column (md5-uniform
# double per event row). Its distinct count tracks the row count.
CONTINUOUS_ROWS = "SELECT count(*) FROM events WHERE event_type = 'purchase'"
CONTINUOUS_DISTINCT = """
SELECT count(DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '-'
            || CAST(seq AS VARCHAR)), 1, 12))::BIGINT / 281474976710656.0)
FROM (SELECT user_id, row_number() OVER () AS seq
      FROM events WHERE event_type = 'purchase')
"""


def _con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con


def _one(con, sql: str) -> int:
    return int(con.execute(sql).fetchone()[0])


def _growth(rows_sql: str, distinct_sql: str) -> tuple[float, float]:
    small, big = _con(SF_SMALL), _con(SF_BIG)
    row_ratio = _one(big, rows_sql) / max(_one(small, rows_sql), 1)
    card_ratio = _one(big, distinct_sql) / max(_one(small, distinct_sql), 1)
    return row_ratio, card_ratio


@pytest.mark.parametrize("name", sorted(PINNED))
def test_compressed_cardinality_is_domain_bounded(name):
    rows_sql, distinct_sql = PINNED[name]
    row_ratio, card_ratio = _growth(rows_sql, distinct_sql)
    assert row_ratio > 5, f"scale step too small to measure ({row_ratio:.1f}x)"
    assert card_ratio <= SUBLINEAR_FRAC * row_ratio, (
        f"{name}: compressed cardinality grew {card_ratio:.2f}x across a "
        f"{row_ratio:.2f}x row step — the distinct-value compression no "
        f"longer bounds the global window; bin first (q236) or repartition"
    )


def test_continuous_column_trips_the_guard():
    """The loophole, demonstrated: a continuous column passes the plan
    lint's aggregate-fed auto-pass but FAILS this suite's growth guard —
    so adding such a query without binning cannot land silently."""
    row_ratio, card_ratio = _growth(CONTINUOUS_ROWS, CONTINUOUS_DISTINCT)
    assert card_ratio > SUBLINEAR_FRAC * row_ratio, (
        "the continuous control no longer trips the guard — "
        "SUBLINEAR_FRAC is too lax to catch a continuous column"
    )


def test_value_is_2dp_quantized():
    """The domain fact behind q138/q223/q236's docstrings: events.value is
    2-dp quantized, so its distinct count is bounded by the value RANGE x
    100 cells — constant in data volume once the range saturates."""
    con = _con(SF_BIG)
    off = _one(
        con, "SELECT count(*) FROM events WHERE value != round(value, 2)"
    )
    assert off == 0
    distinct, cells = con.execute(
        "SELECT count(DISTINCT value), "
        "CAST((max(value) - min(value)) * 100 + 1 AS BIGINT) FROM events"
    ).fetchone()
    assert distinct <= cells


def test_lifetimes_bounded_by_observation_span():
    """q227's domain fact: per-user lifetimes are integer hours inside the
    corpus observation span, so |distinct durations| <= span_hours + 1."""
    con = _con(SF_BIG)
    distinct, span = con.execute(
        """SELECT count(DISTINCT d),
                  (SELECT date_diff('hour', min(ts), max(ts)) FROM events)
           FROM (SELECT date_diff('hour', min(ts), max(ts)) AS d
                 FROM events GROUP BY user_id)"""
    ).fetchone()
    assert distinct <= span + 1
